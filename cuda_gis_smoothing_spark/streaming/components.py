"""MaintainedComponents — incremental near-duplicate clustering.

The batch operator (``operators/dedup.neardup_components``) labels
every doc with the smallest doc_id transitively reachable through
simhash pairs within ``max_hamming``. This is its maintained form: an
APPEND-ONLY corpus (new doc_ids only — see the contract below) folds
in batch by batch, and the served labels always equal the batch CC
over everything ingested so far, exactly (integer labels, no float).

State (SnapshotLog base+delta parquet, the MaintainedLines substrate):

* ``fp`` — doc-keyed ``(doc_id, simhash)`` fingerprints; NULL-text /
  empty-token docs carry a NULL fingerprint (they can never pair — a
  NULL band key matches nothing in either engine — so they stay
  singleton components, matching the batch operator's nodes-left-join
  semantics). O(batch) delta.
* ``labels`` — doc-keyed ``(doc_id, component)``, latest-wins. A batch
  writes its own docs' labels plus the rows of every STORED doc whose
  component lost a merge — O(batch + merged members), never O(corpus)
  (tested). Component labels only ever DECREASE (min-id labeling is
  monotone under edge insertion), which is why append-only ingest
  needs no decrement machinery.
* ``stats`` — one row ``(n_docs, n_edges)``, written LAST as the
  replay guard (the MaintainedLines write-order contract).

Per batch, candidate pairs come from the same pigeonhole banding as
``simhash_pairs_banded``: the batch side explodes its band keys and
equi-joins the stored fingerprint table's band projection, so only
batch x (batch ∪ stored) candidates are generated — stored x stored
pairs already live inside the existing labels and are never re-paired.
New edges are then projected onto CURRENT component labels and the
tiny quotient graph (nodes = touched labels, edges = batch pairs'
label pairs) runs through the same ``star_components`` core as the
batch operator; losing labels relabel their members via one join.

APPEND-ONLY CONTRACT: re-ingesting an existing doc_id RAISES (and so
do intra-batch duplicate ids). Edge DELETION — a doc update that
changes its fingerprint — can split a component, which is the
decremental-connectivity problem; supporting it would force a full
re-cluster of affected components. Dedup corpora are append-only in
practice; updates must re-ingest under a fresh id.

Reference parity: the batch gate's semantics (dedup_components,
/root/reference has no streaming analog — this extends SURVEY.md §2's
maintained-state family to the clustering step).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.operators.dedup import (
    simhash,
    star_components,
)
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog


class MaintainedComponents:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        max_hamming: int = 1,
        bits: int = 16,
        id_col: str = "doc_id",
        text_col: str = "text",
        compact_every: int = 4,
    ):
        bands = max_hamming + 1
        if bits % bands:
            raise ValueError("bits must divide evenly into max_hamming+1 bands")
        self.spark = spark
        self.max_hamming = int(max_hamming)
        self.bits = int(bits)
        self.id_col = id_col
        self.text_col = text_col
        self.compact_every = compact_every
        self.fp_log = SnapshotLog(spark, os.path.join(state_root, "fp"), key=id_col)
        self.label_log = SnapshotLog(
            spark, os.path.join(state_root, "labels"), key=id_col
        )
        self.stats_log = SnapshotLog(spark, os.path.join(state_root, "stats"), key="k")

    # -- banding (the simhash_pairs_banded pigeonhole, over stored fps) -------
    def _band_rows(self, fp: DataFrame, side: str) -> DataFrame:
        bands = self.max_hamming + 1
        width = self.bits // bands
        mask = (1 << width) - 1
        structs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", b * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("bv"),
                )
                for b in range(bands)
            ]
        )
        return fp.where(F.col("simhash").isNotNull()).select(
            F.col(self.id_col).alias(f"id_{side}"),
            F.col("simhash").alias(f"h{side}"),
            F.explode(structs).alias("bb"),
        ).select(f"id_{side}", f"h{side}", "bb.band", "bb.bv")

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        """Fold one batch of NEW docs into the clustering. Write order:
        fp delta -> labels delta -> stats (LAST, the replay guard);
        every prior-state read uses ``before_batch_id`` so a crash
        replay never consumes its own partial output."""
        if self.stats_log.has(batch_id):
            return  # crash replay of a fully-applied batch
        sh = simhash(
            docs, text_col=self.text_col, id_col=self.id_col, bits=self.bits
        )
        batch_fp = (
            docs.select(self.id_col)
            .join(sh, self.id_col, "left")
            .select(self.id_col, "simhash")
        )
        self.fp_log.write_delta(batch_fp, batch_id)
        batch_fp = self.fp_log.read_delta(batch_id)  # materialized
        prior_fp = self.fp_log.read(before_batch_id=batch_id)

        # candidate edges: batch x (batch ∪ stored), never stored x stored
        left = self._band_rows(batch_fp, "a")
        all_fp = (
            batch_fp if prior_fp is None else prior_fp.unionByName(batch_fp)
        )
        right = self._band_rows(all_fp, "b")
        parts = self.spark.sparkContext.defaultParallelism
        left = left.repartition(parts, "band", "bv")
        right = right.repartition(parts, "band", "bv")
        cand = (
            left.join(right, ["band", "bv"])
            .where(F.col("id_a") != F.col("id_b"))
            .select(
                F.least("id_a", "id_b").alias("a"),
                F.greatest("id_a", "id_b").alias("b"),
                "ha",
                "hb",
            )
            .distinct()
        )

        # the contract checks (batch-sized aggregates) are independent
        # of the edge build — overlap them from a driver thread pool
        # (guide §2.6, the threshold-sweep precedent) instead of
        # serializing three cluster-idle actions ahead of it; the
        # checks still RAISE before any label/stats write below.
        def _dup_check() -> int:
            return (
                batch_fp.groupBy(self.id_col)
                .count()
                .where(F.col("count") > 1)
                .limit(1)
                .count()
            )

        def _seen_check() -> int:
            if prior_fp is None:
                return 0
            return (
                batch_fp.select(self.id_col)
                .join(prior_fp.select(self.id_col), self.id_col, "left_semi")
                .limit(1)
                .count()
            )

        def _edges() -> DataFrame:
            return (
                cand.where(
                    F.expr("bit_count(ha ^ hb)") <= F.lit(self.max_hamming)
                )
                .select("a", "b")
                .localCheckpoint()
            )

        with ThreadPoolExecutor(max_workers=3) as pool:
            dup_f = pool.submit(_dup_check)
            seen_f = pool.submit(_seen_check)
            edges_f = pool.submit(_edges)
            if dup_f.result():
                raise ValueError(
                    "MaintainedComponents: duplicate ids within the batch"
                )
            if seen_f.result():
                raise ValueError(
                    "MaintainedComponents is append-only: re-ingesting an "
                    "existing doc_id would require decremental connectivity "
                    "(re-ingest under a fresh id instead)"
                )
            edges = edges_f.result()

        # project edges onto current labels -> tiny quotient graph
        prior_labels = self.label_log.read(before_batch_id=batch_id)
        own = batch_fp.select(
            F.col(self.id_col).alias("_id"), F.col(self.id_col).alias("_lbl")
        )
        lab = (
            own
            if prior_labels is None
            else own.unionByName(
                prior_labels.select(
                    F.col(self.id_col).alias("_id"),
                    F.col("component").alias("_lbl"),
                )
            )
        )
        # q_edges feeds FOUR consumers (the count, both q_nodes sides,
        # and the star rounds) — canonicalize + distinct HERE and
        # checkpoint once, instead of re-executing the two label joins
        # per consumer (the multi-consumer derived-subplan class) and
        # letting star_components materialize the same stream a second
        # time for its canonical pass (``pre_canonicalized`` below).
        q_edges = (
            edges.join(
                lab.select(F.col("_id").alias("a"), F.col("_lbl").alias("la")), "a"
            )
            .join(lab.select(F.col("_id").alias("b"), F.col("_lbl").alias("lb")), "b")
            .where(F.col("la") != F.col("lb"))
            .select(
                F.greatest("la", "lb").alias("a"),
                F.least("la", "lb").alias("b"),
            )
            .distinct()
            .localCheckpoint()
        )
        q_nodes = q_edges.select(F.col("a").alias("lbl")).unionByName(
            q_edges.select(F.col("b").alias("lbl"))
        ).distinct()
        n_edges = q_edges.count()

        # the stats inputs (prior totals, batch size, edge count) are
        # independent of the CC fixpoint — overlap their three small
        # actions with the star rounds; the stats WRITE still happens
        # last, after the label delta (the replay-guard write order).
        def _stats_inputs() -> tuple[int, int, int]:
            prev = self.stats_log.read(before_batch_id=batch_id)
            base_n = base_e = 0
            if prev is not None:
                r = prev.collect()[0]
                base_n, base_e = int(r["n_docs"]), int(r["n_edges"])
            return base_n, base_e, batch_fp.count()

        with ThreadPoolExecutor(max_workers=2) as pool:
            stats_f = pool.submit(_stats_inputs)
            edge_count_f = pool.submit(edges.count)
            if n_edges:
                mapping = star_components(
                    q_edges, q_nodes, id_col="lbl", pre_canonicalized=True
                )
                losers = mapping.where(F.col("component") != F.col("lbl")).select(
                    F.col("lbl").alias("_old"), F.col("component").alias("_new")
                ).localCheckpoint()
            else:
                losers = None
            base_n, base_e, n_batch = stats_f.result()
            n_edge_rows = edge_count_f.result()

        batch_labels = own.select(
            F.col("_id").alias(self.id_col), F.col("_lbl").alias("component")
        )
        if losers is not None:
            batch_labels = batch_labels.join(
                losers, batch_labels["component"] == losers["_old"], "left"
            ).select(
                self.id_col,
                F.coalesce("_new", "component").alias("component"),
            )
            delta = batch_labels
            if prior_labels is not None:
                relabeled = prior_labels.join(
                    losers, prior_labels["component"] == losers["_old"]
                ).select(self.id_col, F.col("_new").alias("component"))
                delta = delta.unionByName(relabeled)
        else:
            delta = batch_labels
        self.label_log.write_delta(delta, batch_id)

        self.stats_log.write_delta(
            self.spark.createDataFrame(
                [("total", base_n + n_batch, base_e + n_edge_rows)],
                "k string, n_docs long, n_edges long",
            ),
            batch_id,
        )
        if self.fp_log.delta_count() >= self.compact_every:
            for log in (self.fp_log, self.label_log, self.stats_log):
                log.compact(batch_id)

    # -- serving ---------------------------------------------------------------
    def components(self) -> DataFrame:
        """The served (doc_id, component) table — identical to the
        batch operator over everything ingested. Reads state through an
        EAGER localCheckpoint (the MaintainedPostings.search contract:
        callers may delete the state directory once the plan is
        built)."""
        t = self.label_log.read()
        if t is None:
            raise ValueError(
                "MaintainedComponents: empty state (no batches applied)"
            )
        return t.localCheckpoint(eager=True).select(self.id_col, "component")

    def stats_row(self) -> tuple[int, int] | None:
        t = self.stats_log.read()
        if t is None:
            return None
        r = t.collect()[0]
        return int(r["n_docs"]), int(r["n_edges"])

    # -- stream wiring -----------------------------------------------------------
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
