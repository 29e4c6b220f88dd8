"""Maintained KMV cardinality sketches — the streaming member of the
deterministic-sketch family (operators/sketches.py).

``kmv_distinct`` is a batch rebuild: every run re-scans the stream
history into a (group, hash) DISTINCT. At 100 TB "distinct users per
event type, updated continuously" is served from MAINTAINED sketch
state — and KMV is the sketch BUILT for that: union-of-sketches ==
sketch-of-union (keep the k smallest distinct hashes of the
concatenation), so a batch folds in as an O(touched-groups × k) merge
and the standing state is #groups × k longs, never O(history).

State: ONE group-keyed SnapshotLog row per group, ``(group...,
sk array<long>)`` — the group's k smallest distinct member hashes,
latest-wins. A batch computes its own per-group bottom-k, array-merges
with the prior rows of the TOUCHED groups (read with
``before_batch_id`` so a crash replay never sees its own partial
delta; replay overwrites idempotently — with one log the write is the
commit, no separate guard needed), and writes only touched groups.

APPEND-ONLY by nature: a KMV sketch cannot forget a member, so this
maintains sketches over EVENT streams (facts that happened), not over
doc-keyed mutable tables — the opposite trade from the doc-keyed
count logs (MaintainedBigrams/MaintainedSourceTokens), which support
updates but pay a diff. NULL member ids are excluded (COUNT DISTINCT
convention); NULL group values are keyed under a sentinel (SnapshotLog
key joins drop NULL keys — the _group_dedup lesson) and surface as
NULL again at read time.

Members default to the hashed ``id_col``; the ``members`` hook swaps
in any (group, hash) extraction — shingle members give maintained
CROSS-SOURCE OVERLAP sketches, served by ``overlap_pairs()`` through
the same pair stage as the batch operator (the "sketches are mergeable
across days" claim in kmv_shingle_overlap's docstring, made real).

``distinct_counts()`` serves the EXACT ``kmv_distinct`` output —
(group..., n_sketch, kth_hash, est_distinct) — as a pure per-row
function of the stored integers (same (k−1)·P literal, same round6),
so maintained-over-batches equals batch-over-union bit-for-bit
(tested; the ``kmv_distinct_maintained`` driver gate routes the events
table through a single-batch instance against ``kmv_distinct_sql``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cuda_gis_smoothing_spark.operators.sketches import (
    KMV_K,
    kmv_hash_col,
)
from cuda_gis_smoothing_spark.operators.dedup import MH_PRIME
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog

#: non-data sentinel for NULL group values inside the state key
NULL_GROUP = "\x00"


class MaintainedKMV:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        group_cols: list[str],
        id_col: str | None = None,
        k: int = KMV_K,
        compact_every: int = 4,
        members=None,
    ):
        """``members``, when given, replaces the default id-hash member
        extraction: a callable (batch DataFrame) → DataFrame with
        ``group_cols`` + a ``_h`` long column of member hashes in
        [0, MH_PRIME) — e.g. the shingle members of
        ``operators/sketches.shingle_hash_members`` for maintained
        cross-source overlap sketches. Exactly one of ``id_col`` /
        ``members`` must be set."""
        if k < 2:
            raise ValueError("MaintainedKMV: k must be >= 2")
        if (id_col is None) == (members is None):
            raise ValueError("MaintainedKMV: set exactly one of id_col / members")
        self.spark = spark
        self.group_cols = list(group_cols)
        self.id_col = id_col
        self.members = members
        self.k = k
        self.compact_every = compact_every
        self.sk_log = SnapshotLog(
            spark, os.path.join(state_root, "sketches"), key=self.group_cols
        )

    def _member_hashes(self, df: DataFrame) -> DataFrame:
        """(group..., _h) member-hash rows, NULL groups sentinel-keyed."""
        if self.members is not None:
            raw = self.members(df)
        else:
            raw = df.where(F.col(self.id_col).isNotNull()).select(
                *self.group_cols, kmv_hash_col(self.id_col).alias("_h")
            )
        return raw.select(
            *[
                F.coalesce(F.col(g), F.lit(NULL_GROUP)).alias(g)
                for g in self.group_cols
            ],
            F.col("_h"),
        )

    def process_batch(self, events: DataFrame, batch_id: int) -> None:
        """Fold a batch of events into the sketches: per-group bottom-k
        over the batch, array-merge with prior state for the touched
        groups only — O(touched-groups × k) rows written."""
        if self.sk_log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        g = self.group_cols
        w = Window.partitionBy(*g).orderBy(F.col("_h").asc())
        batch_sk = (
            self._member_hashes(events)
            .distinct()
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= self.k)
            .groupBy(*g)
            .agg(F.sort_array(F.collect_list("_h")).alias("_new"))
        )
        prior = self.sk_log.read(before_batch_id=batch_id)
        if prior is None:
            merged = batch_sk.select(*g, F.col("_new").alias("sk"))
        else:
            merged = batch_sk.join(
                prior.select(*g, F.col("sk").alias("_old")), g, "left"
            ).select(
                *g,
                F.expr(
                    "slice(array_sort(array_union("
                    f"coalesce(_old, CAST(array() AS array<long>)), _new)), 1, {self.k})"
                ).alias("sk"),
            )
        self.sk_log.write_delta(merged, batch_id)
        if self.sk_log.delta_count() >= self.compact_every:
            self.sk_log.compact(batch_id)

    def distinct_counts(self) -> DataFrame:
        """The maintained ``kmv_distinct`` table — served from state
        alone as a pure per-row function of the stored hashes (nothing
        re-scans events). Reads state through an EAGER localCheckpoint
        — callers may delete the state directory once the plan is
        built (the MaintainedPostings.search contract)."""
        from cuda_gis_smoothing_spark.functions.numeric import round6

        t = self.sk_log.read()
        if t is None:
            raise ValueError("MaintainedKMV: empty state")
        t = t.localCheckpoint(eager=True)
        g = self.group_cols
        kp = float((self.k - 1) * MH_PRIME)
        n = F.size("sk").cast("long")
        kth = F.element_at("sk", F.size("sk")).cast("long")
        est = F.when(F.col("n_sketch") < self.k, F.col("n_sketch").cast("double")).otherwise(
            F.lit(kp) / (F.col("kth_hash") + 1)
        )
        return (
            t.select(
                *[
                    F.when(F.col(c) == NULL_GROUP, F.lit(None).cast("string"))
                    .otherwise(F.col(c))
                    .alias(c)
                    for c in g
                ],
                n.alias("n_sketch"),
                kth.alias("kth_hash"),
            )
            .select(*g, "n_sketch", "kth_hash", round6(est).alias("est_distinct"))
        )

    def overlap_pairs(self) -> DataFrame:
        """Pairwise set operations between the maintained sketches —
        |A|, |B|, |A∪B|, inclusion–exclusion |A∩B|, Jaccard — via the
        SAME pair stage as the batch overlap operator
        (``operators/sketches.kmv_overlap_pairs``), so a single-batch
        instance over shingle members equals ``kmv_shingle_overlap``
        bit-for-bit (gated as ``source_overlap_kmv_maintained``).
        Single string group column only (pair output shape). Reads
        state through an EAGER localCheckpoint — callers may delete
        the state directory once the plan is built."""
        from cuda_gis_smoothing_spark.operators.sketches import (
            kmv_overlap_pairs,
        )

        if len(self.group_cols) != 1:
            raise ValueError("overlap_pairs: exactly one group column")
        t = self.sk_log.read()
        if t is None:
            raise ValueError("MaintainedKMV: empty state")
        g = self.group_cols[0]
        t = (
            t.where(F.col(g) != NULL_GROUP)  # pairs over REAL groups only
            .localCheckpoint(eager=True)
        )
        return kmv_overlap_pairs(t, self.k, group_col=g)

    def start(
        self,
        source_dir: str,
        checkpoint_dir: str,
        available_now: bool = True,
        schema: str | None = None,
    ):
        """``schema`` defaults to the events DDL; a members-hook
        instance over documents must pass the matching schema (e.g.
        ``streaming.dedup.DOCS_SCHEMA``) or the hook's columns won't
        exist in the stream."""
        from cuda_gis_smoothing_spark.streaming.windows import EVENTS_SCHEMA

        stream = (
            self.spark.readStream.schema(schema or EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(source_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


_QSK_EMPTY = "CAST(array() AS array<struct<h:bigint,i:bigint,v:double>>)"


class MaintainedQuantiles:
    """Maintained bottom-k-by-hash quantile samples — the quantile
    member of the maintained-sketch family: the batch operator's
    (``operators/sketches.kmv_quantile_sketch``) sample is a bottom-k
    set under the portable hash, and bottom-k sets MERGE (the k
    (hash, id)-smallest of a union are the k smallest of concatenated
    per-part bottom-k's when the VALUE rides with the hash), so a
    batch folds in as an O(touched-groups × k) struct-array merge and
    the standing state is #groups × k (hash, id, value) triples.

    ``array_union`` dedups equal structs, so a row re-delivered across
    batches (same id, same value) enters once; a re-delivered id with
    a CHANGED value is append-only like every KMV sketch (both copies
    can rank — sketches can't forget; use the doc-keyed count logs for
    mutable tables). NULL values and NULL ids are excluded exactly as
    the batch operator excludes them; NULL group values sentinel-keyed
    and restored at read.

    ``quantiles()`` explodes the stored samples and routes through the
    SAME shared percentile kernel, so a single-batch instance equals
    ``kmv_quantile_sketch`` bit-for-bit (gated as
    ``value_quantiles_maintained`` against the batch twin) and
    multi-batch disjoint appends equal the batch operator over the
    union (tested)."""

    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        group_cols: list[str],
        id_col: str,
        value_col: str,
        k: int = 256,
        compact_every: int = 4,
    ):
        if k < 1:
            raise ValueError("MaintainedQuantiles: k must be >= 1")
        self.spark = spark
        self.group_cols = list(group_cols)
        self.id_col = id_col
        self.value_col = value_col
        self.k = k
        self.compact_every = compact_every
        self.sk_log = SnapshotLog(
            spark, os.path.join(state_root, "samples"), key=self.group_cols
        )

    def process_batch(self, events: DataFrame, batch_id: int) -> None:
        """Fold a batch into the samples: per-group bottom-k over the
        batch, struct-array merge with prior state for touched groups."""
        if self.sk_log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        g = self.group_cols
        w = Window.partitionBy(*g).orderBy(F.col("_h").asc(), F.col("_i").asc())
        batch_sk = (
            events.where(
                F.col(self.value_col).isNotNull()
                & F.col(self.id_col).isNotNull()
            )
            .select(
                *[
                    F.coalesce(F.col(c), F.lit(NULL_GROUP)).alias(c)
                    for c in g
                ],
                kmv_hash_col(self.id_col).alias("_h"),
                F.col(self.id_col).cast("long").alias("_i"),
                F.col(self.value_col).cast("double").alias("_v"),
            )
            # intra-batch dedup BEFORE ranking: array_union dedups
            # equal structs on every later merge, so the first batch
            # must apply the same once-per-(h,id,v) semantics or the
            # served sample depends on whether prior state existed
            .distinct()
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= self.k)
            .groupBy(*g)
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("_h").alias("h"),
                            F.col("_i").alias("i"),
                            F.col("_v").alias("v"),
                        )
                    )
                ).alias("_new")
            )
        )
        prior = self.sk_log.read(before_batch_id=batch_id)
        if prior is None:
            merged = batch_sk.select(*g, F.col("_new").alias("sk"))
        else:
            merged = batch_sk.join(
                prior.select(*g, F.col("sk").alias("_old")), g, "left"
            ).select(
                *g,
                F.expr(
                    "slice(array_sort(array_union("
                    f"coalesce(_old, {_QSK_EMPTY}), _new)), 1, {self.k})"
                ).alias("sk"),
            )
        self.sk_log.write_delta(merged, batch_id)
        if self.sk_log.delta_count() >= self.compact_every:
            self.sk_log.compact(batch_id)

    def quantiles(self, fractions: tuple[float, ...]) -> DataFrame:
        """The maintained ``kmv_quantile_sketch`` table — stored sample
        values through the shared percentile kernel; nothing re-scans
        events. Reads state through an EAGER localCheckpoint — callers
        may delete the state directory once the plan is built."""
        from cuda_gis_smoothing_spark.operators.events import (
            percentile_explode,
        )

        t = self.sk_log.read()
        if t is None:
            raise ValueError("MaintainedQuantiles: empty state")
        g = self.group_cols
        sample = (
            t.localCheckpoint(eager=True)
            .select(
                *[
                    F.when(F.col(c) == NULL_GROUP, F.lit(None).cast("string"))
                    .otherwise(F.col(c))
                    .alias(c)
                    for c in g
                ],
                F.explode("sk").alias("_p"),
            )
            .select(*g, F.col("_p.v").alias("_v"))
        )
        return percentile_explode(
            sample, "_v", fractions, group_cols=tuple(g), out_value="est_value"
        )

    def start(
        self,
        source_dir: str,
        checkpoint_dir: str,
        available_now: bool = True,
        schema: str | None = None,
    ):
        from cuda_gis_smoothing_spark.streaming.windows import EVENTS_SCHEMA

        stream = (
            self.spark.readStream.schema(schema or EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(source_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


# -- Maintained Count-Min sketch ------------------------------------------

_TOK_EMPTY = "CAST(array() AS array<string>)"


class MaintainedCMS:
    """Maintained Count-Min counters over a DOC-KEYED mutable corpus —
    the decrementable half of the sketch family: KMV (above) can never
    forget a member, but CMS counters live in an additive GROUP, so a
    re-ingested doc's old contributions subtract out exactly. This is
    the doc-slice diff pattern (MaintainedSourceTokens) applied to
    sketch state:

    * ``slices`` — one doc-keyed row per doc: its DISTINCT token list
      (the df convention of ``vocab_cms_estimates``); NULL/empty text
      → EMPTY list (the natural tombstone).
    * ``counters`` — (j, counter)-keyed ABSOLUTE counts, latest-wins,
      written LAST as the crash-replay guard: a batch diffs its doc
      ids' PRIOR slices (``before_batch_id``) against the new ones
      into net counter deltas — O(batch vocabulary · d) rows, never
      O(corpus) (tested).

    ``estimates(tokens)`` serves min-over-rows counts for any token
    list from state alone (the exact-df side of the audit card still
    comes from the corpus — pairing with a maintained df log is the
    MaintainedLines precedent, documented not duplicated here).
    """

    def __init__(self, spark: SparkSession, state_root: str, compact_every: int = 4):
        self.spark = spark
        self.compact_every = compact_every
        self.slices_log = SnapshotLog(
            spark, os.path.join(state_root, "slices"), key="doc_id"
        )
        self.counters_log = SnapshotLog(
            spark, os.path.join(state_root, "counters"), key=["j", "counter"]
        )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window as W

        from cuda_gis_smoothing_spark.operators.sketches import cms_hash_cols

        if self.counters_log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        # one deterministic representative per intra-batch duplicate id
        # (the packer dup-id class): greatest text wins
        w = W.partitionBy("doc_id").orderBy(
            F.coalesce(F.col("text"), F.lit("")).desc()
        )
        slices = (
            docs.select("doc_id", "text")
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                "doc_id",
                F.coalesce(
                    F.filter(
                        F.array_distinct(
                            F.split(F.lower(F.col("text")), " ")
                        ),
                        lambda t: t != "",
                    ),
                    F.expr(_TOK_EMPTY),
                ).alias("_toks"),
            )
        )
        self.slices_log.write_delta(slices, batch_id)
        delta = self.slices_log.read_delta(batch_id)
        prior = self.slices_log.read(before_batch_id=batch_id)
        old = (
            None
            if prior is None
            else prior.join(delta.select("doc_id"), "doc_id", "left_semi")
        )

        def contrib(rows: DataFrame, sign: int) -> DataFrame:
            return (
                rows.select(F.explode("_toks").alias("t"))
                .select(F.explode(cms_hash_cols("t")).alias("r"))
                .select("r.j", "r.counter", F.lit(sign).alias("_d"))
            )

        net = contrib(delta, 1)
        if old is not None:
            net = net.unionByName(contrib(old, -1))
        net = (
            net.groupBy("j", "counter")
            .agg(F.sum("_d").alias("_net"))
            .where(F.col("_net") != 0)
        )
        cur = self.counters_log.read(before_batch_id=batch_id)
        if cur is None:
            new_counts = net.select(
                "j", "counter", F.col("_net").cast("long").alias("cnt")
            )
        else:
            new_counts = net.join(cur, ["j", "counter"], "left").select(
                "j",
                "counter",
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.col("_net"))
                .cast("long")
                .alias("cnt"),
            )
        self.counters_log.write_delta(new_counts, batch_id)
        if self.slices_log.delta_count() >= self.compact_every:
            for log in (self.slices_log, self.counters_log):
                log.compact(batch_id)

    # ------------------------------------------------------------------
    def counters(self) -> DataFrame:
        """The maintained (j, counter, cnt) table (zero rows filtered —
        a counter whose docs all left), read through an EAGER
        localCheckpoint (the MaintainedPostings.search contract)."""
        t = self.counters_log.read()
        if t is None:
            raise ValueError("MaintainedCMS: empty state")
        return (
            t.where(F.col("cnt") > 0)
            .select("j", "counter", "cnt")
            .localCheckpoint(eager=True)
        )

    def estimates(self, tokens: DataFrame, token_col: str = "t") -> DataFrame:
        """CMS estimate per input token from state alone: explode the
        d probe rows, sketch-sized broadcast join, min over rows. A
        token absent from every counter row estimates 0 (coalesce —
        min over an empty group never materializes thanks to the left
        join)."""
        from cuda_gis_smoothing_spark.operators.sketches import cms_hash_cols

        ctr = self.counters()
        probes = tokens.select(
            F.col(token_col).alias("token"),
            F.explode(cms_hash_cols(token_col)).alias("r"),
        ).select("token", "r.j", "r.counter")
        return (
            probes.join(F.broadcast(ctr), ["j", "counter"], "left")
            .groupBy("token")
            .agg(
                F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                .cast("long")
                .alias("cms_estimate")
            )
        )

    def start(self, source_dir: str, checkpoint_dir: str, available_now: bool = True):
        from cuda_gis_smoothing_spark.streaming.dedup import DOCS_SCHEMA

        stream = (
            self.spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(source_dir)
        )
        writer = stream.writeStream.foreachBatch(
            lambda df, bid: self.process_batch(df, bid)
        ).option("checkpointLocation", checkpoint_dir)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
