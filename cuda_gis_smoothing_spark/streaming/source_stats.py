"""Maintained per-source token distributions → KL drift (CLAUDE.md r6
backlog: "per-source KL maintained").

``functions/text.source_kl_divergence`` is a batch rebuild: every run
re-tokenizes the corpus into a (source, token) count table. At 100 TB
the dataset-card drift statistic is served from MAINTAINED state — this
module is the dfreq-log pattern (MaintainedPostings/MaintainedBigrams)
applied to per-source unigram counts:

* ``doc_tokens`` — ONE doc-keyed row per document:
  ``(doc_id, source_k, _uni array<struct<t,_n>>, _nt)`` — the doc's
  unigram-count slice under the batch operator's tokenizer
  (``split(lower(text), ' ')``, empty tokens excluded —
  functions/text.py:397-444) plus its source and token total. A NULL /
  empty text yields an EMPTY slice (the natural tombstone). The source
  rides in the DOC log so a re-ingested doc that MOVES source
  decrements its old (source, token) cells and increments the new ones
  in one diff.
* ``counts`` — (source_k, token)-keyed ABSOLUTE counts, latest-wins:
  a batch diffs its doc ids' PRIOR slices (read with
  ``before_batch_id``) against the new slices into net deltas, joins
  only the TOUCHED cells against current state, writes absolute rows —
  O(batch vocabulary) deltas, never O(corpus) (tested). NULL sources
  are keyed under a sentinel (SnapshotLog key joins drop NULL keys —
  the _group_dedup NULL-class lesson) so their tokens still count
  toward the CORPUS distribution, exactly as the batch operator's
  inner joins keep them in ``ct``/``T`` while dropping them from the
  per-source output.
* ``stats`` — one row ``(k, n_tokens)``: the corpus total, decrement+
  increment-maintained; written LAST as the crash-replay guard (the
  three-log write-order contract).

``kl()`` serves KL(P_source ‖ P_corpus) from the counts table alone —
the corpus-distribution aggregates (``ct``, ``ns``, ``T``) are
vocabulary-sized integer sums over STATE, so nothing re-reads or
re-tokenizes documents, and because every input is an exact integer the
served doubles match the batch operator under round6 (tested
multi-batch, through updates and source moves; the
``source_kl_maintained`` driver gate routes the corpus through a
single-batch instance against the batch twin's SQL).

Reference parity note: the reference engine (CUDA grid smoothing) has
no corpus layer; this extends the graft's LLM-data-pipeline surface
(SURVEY.md §2), pairing with source_kl_divergence the way
MaintainedPostings pairs with bm25_search.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog

#: non-text sentinel for NULL sources inside the state key (tokens come
#: from text and can never collide with a control character either)
NULL_SOURCE = "\x00"

_UNI_EMPTY = "CAST(array() AS array<struct<t:string,_n:bigint>>)"


def _doc_source_slices(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """One row per distinct batch doc id: (doc_id, source_k, _uni
    slice, _nt total) under the batch operator's tokenizer.

    Intra-batch duplicate ids resolve to ONE deterministic
    representative (greatest (source, text)) BEFORE slicing: two rows
    sharing an id but differing in source would otherwise both survive
    the (doc_id, source) distinct while sharing a merged token slice —
    two log rows per key, latest-wins then drops one arbitrarily and
    the stranded source's counts never decrement (the packer's
    intra-batch dup-id class, ADVICE r4)."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("source_k").desc(), F.coalesce(F.col(text_col), F.lit("")).desc()
    )
    toks = F.split(F.lower(F.col(text_col)), " ")
    base = (
        docs.select(
            F.col(id_col),
            F.coalesce(F.col(source_col), F.lit(NULL_SOURCE)).alias("source_k"),
            F.col(text_col),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "source_k", toks.alias("_t"))
    )
    uni = (
        base.select(id_col, F.explode("_t").alias("t"))
        .where(F.col("t") != "")
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("t", "_n")).alias("_uni"),
            F.sum("_n").alias("_nt"),
        )
    )
    return (
        base.select(id_col, "source_k")
        .distinct()
        .join(uni, id_col, "left")
        .select(
            id_col,
            "source_k",
            F.coalesce("_uni", F.expr(_UNI_EMPTY)).alias("_uni"),
            F.coalesce("_nt", F.lit(0)).cast("long").alias("_nt"),
        )
    )


class MaintainedSourceTokens:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        id_col: str = "doc_id",
        compact_every: int = 4,
    ):
        self.spark = spark
        self.id_col = id_col
        self.compact_every = compact_every
        self.log = SnapshotLog(
            spark, os.path.join(state_root, "doc_tokens"), key=id_col
        )
        self.counts_log = SnapshotLog(
            spark, os.path.join(state_root, "counts"), key=["source_k", "t"]
        )
        self.stats_log = SnapshotLog(
            spark, os.path.join(state_root, "stats"), key="k"
        )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        """Fold a batch of (re)ingested docs into the per-source
        distribution: one doc-keyed slice delta of O(batch) rows, a
        (source, token) count delta of O(batch vocabulary) rows, one
        1-row stats delta (the replay guard, written LAST)."""
        if self.stats_log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        self.log.write_delta(
            _doc_source_slices(docs, id_col=self.id_col), batch_id
        )
        delta = self.log.read_delta(batch_id)
        prior = self.log.read(before_batch_id=batch_id)
        old_rows = (
            None
            if prior is None
            else prior.join(
                delta.select(self.id_col), self.id_col, "left_semi"
            ).localCheckpoint()  # feeds the count decrement AND stats
        )

        def contrib(rows: DataFrame, sign: int) -> DataFrame:
            return rows.select("source_k", F.explode("_uni").alias("_p")).select(
                "source_k",
                F.col("_p.t").alias("t"),
                (F.col("_p._n") * sign).alias("_d"),
            )

        net = contrib(delta, 1)
        if old_rows is not None:
            net = net.unionByName(contrib(old_rows, -1))
        net = (
            net.groupBy("source_k", "t")
            .agg(F.sum("_d").alias("_net"))
            .where(F.col("_net") != 0)
        )
        cur = self.counts_log.read(before_batch_id=batch_id)
        if cur is None:
            new_counts = net.select(
                "source_k", "t", F.col("_net").cast("long").alias("cnt")
            )
        else:
            new_counts = net.join(cur, ["source_k", "t"], "left").select(
                "source_k",
                "t",
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.col("_net"))
                .cast("long")
                .alias("cnt"),
            )

        def _total(rows: DataFrame) -> int:
            r = rows.agg(F.sum("_nt").alias("t")).collect()[0]
            return int(r["t"] or 0)

        add_t = _total(delta)
        rm_t = 0 if old_rows is None else _total(old_rows)
        old_stats = self.stats_log.read(before_batch_id=batch_id)
        base_t = (
            0 if old_stats is None else int(old_stats.collect()[0]["n_tokens"])
        )
        # write order is the crash contract: doc_tokens (above), the
        # count log, then the stats row LAST as the replay guard
        self.counts_log.write_delta(new_counts, batch_id)
        self.stats_log.write_delta(
            self.spark.createDataFrame(
                [("total", base_t - rm_t + add_t)], "k string, n_tokens long"
            ),
            batch_id,
        )
        if self.log.delta_count() >= self.compact_every:
            for log in (self.log, self.counts_log, self.stats_log):
                log.compact(batch_id)

    def total_tokens(self) -> int | None:
        t = self.stats_log.read()
        if t is None:
            return None
        return int(t.collect()[0]["n_tokens"])

    def counts(self) -> DataFrame | None:
        """The maintained (source_k, t, cnt) table — cnt = 0 rows (a
        token whose last doc left that source) filtered out."""
        t = self.counts_log.read()
        if t is None:
            return None
        return t.where(F.col("cnt") > 0)

    def kl(self) -> DataFrame:
        """KL(P_source ‖ P_corpus) over the CURRENT state — the
        maintained form of ``functions/text.source_kl_divergence``:
        the (source, token) counts come from the maintained table and
        the corpus marginals are vocabulary-sized integer sums over it;
        nothing re-tokenizes documents at read time. Same formula, same
        round6 — matches the batch operator (tested; gated as
        ``source_kl_maintained``). Sentinel-keyed NULL-source tokens
        stay in the corpus marginals and drop from the output, exactly
        like the batch operator's inner joins. Reads state through an
        EAGER localCheckpoint — callers may delete the state directory
        once the plan is built (the MaintainedPostings.search
        contract)."""
        from cuda_gis_smoothing_spark.functions.numeric import round6

        stc = self.counts()
        if stc is None:
            raise ValueError("MaintainedSourceTokens: empty state")
        stc = stc.select(
            "source_k", "t", F.col("cnt").alias("_c")
        ).localCheckpoint(eager=True)
        ct = stc.groupBy("t").agg(F.sum("_c").alias("_ct"))
        ns = stc.groupBy("source_k").agg(F.sum("_c").alias("_ns"))
        tot = stc.agg(F.sum("_c").cast("double").alias("_T"))
        ps = F.col("_c") / F.col("_ns")
        pc = F.col("_ct") / F.col("_T")
        return (
            stc.where(F.col("source_k") != NULL_SOURCE)
            .join(ct, "t")
            .join(ns, "source_k")
            .crossJoin(F.broadcast(tot))
            .select(
                F.col("source_k").alias("source"),
                "_ns",
                (ps * F.log(ps / pc)).alias("_kl"),
            )
            .groupBy("source")
            .agg(
                F.max("_ns").cast("long").alias("n_tokens"),
                round6(F.sum("_kl")).alias("kl_divergence"),
            )
        )

    def zipf(self) -> DataFrame:
        """Corpus Zipf-law fit served from the maintained counts —
        the second read-side statistic over the same state as
        :meth:`kl` (the MaintainedDailyCounts cusum/trend precedent):
        global token counts are integer sums of the (source, token)
        cells (sentinel-keyed NULL-source tokens INCLUDED — the batch
        operator has no source concept), fed to the SHARED
        ``zipf_fit_from_counts`` kernel. Nothing re-tokenizes
        documents at read time. Reads state through an EAGER
        localCheckpoint — callers may delete the state directory once
        the plan is built (the MaintainedPostings.search contract)."""
        from cuda_gis_smoothing_spark.functions.text import (
            zipf_fit_from_counts,
        )

        stc = self.counts()
        if stc is None:
            raise ValueError("MaintainedSourceTokens: empty state")
        counts = (
            stc.groupBy("t")
            .agg(F.sum("cnt").cast("long").alias("_c"))
            .localCheckpoint(eager=True)
        )
        return zipf_fit_from_counts(counts)

    def diversity(self) -> DataFrame:
        """Per-source Simpson + TTR served from the maintained counts —
        the third read-side statistic over the same state (the kl/zipf
        precedent), through the SHARED ``diversity_from_counts``
        kernel. Unlike :meth:`kl`, the batch operator KEEPS the NULL
        source as its own group, so the sentinel key is decoded back
        to NULL before the rollup. Reads state through an EAGER
        localCheckpoint (the MaintainedPostings.search contract)."""
        from cuda_gis_smoothing_spark.functions.text import (
            diversity_from_counts,
        )

        stc = self.counts()
        if stc is None:
            raise ValueError("MaintainedSourceTokens: empty state")
        decoded = stc.select(
            F.when(F.col("source_k") == NULL_SOURCE, F.lit(None))
            .otherwise(F.col("source_k"))
            .alias("source"),
            "t",
            F.col("cnt").alias("_c"),
        ).localCheckpoint(eager=True)
        return diversity_from_counts(decoded)

    def start(self, source_dir: str, checkpoint_dir: str, available_now: bool = True):
        from cuda_gis_smoothing_spark.streaming.dedup import DOCS_SCHEMA

        stream = (
            self.spark.readStream.schema(DOCS_SCHEMA)
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
