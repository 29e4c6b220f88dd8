"""Maintained incremental IVF embedding index — the similarity twin of
streaming/retrieval.MaintainedPostings: embeddings arrive continuously
(a training pipeline embeds new documents forever), and the ANN index
must extend per batch without rebuilding the corpus assignment.

State shape: ONE vec-keyed SnapshotLog row per vector —
``(vec_id, bucket, c_emb, c_nrm)``, the same corpus row the persisted
``operators/similarity.IVFIndex`` stores — derived by the SAME
nearest-centroid assignment, against centroids FROZEN at construction
(the standard IVF contract: the coarse quantizer is trained once;
re-training is a rebuild, not an update):

* a batch writes O(batch vectors) rows, never O(corpus) (tested);
* a re-ingested vec_id REPLACES its old row via latest-wins — vector
  update is one delta row (tested: the query tracks the updated
  corpus exactly);
* crash replay is the standard SnapshotLog contract: one log, one
  write per batch, ``has(batch_id)`` short-circuits.

Query path: the SHARED probe/join/rank kernel
(``operators/similarity.probe_rows`` + ``probe_join_rank``) over the
log's latest-wins view — results are identical to ``ivf_knn`` over the
vectors the log currently represents (tested multi-batch and through a
vector update), so the maintained and batch paths cannot drift. The
centroid matrix is broadcast ONCE at construction ('build once, probe
many' must not leak one broadcast per query call).

Scale note: ``prune=True`` static-filters the log view on the probed
bucket set — row-group pruning at best here, since SnapshotLog deltas
are not bucket-partitioned (they are keyed by vec_id for latest-wins).
:meth:`MaintainedIVF.export_index` periodically EXPORTS the compacted
view into the bucket-partitioned ``IVFIndex`` layout (one
``write.partitionBy`` pass) to recover true partition pruning — the
log is the ingest tier, the export the serving tier (equality and
partition pruning tested).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.operators.similarity import (
    probe_join_rank,
    probe_rows,
)
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog


class MaintainedIVF:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        centroids,
        id_col: str = "vec_id",
        compact_every: int = 4,
    ):
        import numpy as np

        self.spark = spark
        self.id_col = id_col
        self.compact_every = compact_every
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self._bc = spark.sparkContext.broadcast(self.centroids)
        self.log = SnapshotLog(
            spark, os.path.join(state_root, "vectors"), key=id_col
        )

    def process_batch(self, embeddings: DataFrame, batch_id: int) -> None:
        """Assign a batch of (re)ingested vectors to their buckets and
        fold them in: one vec-keyed delta of O(batch) rows. A
        NULL-embedding row writes a NULL-bucket TOMBSTONE so
        latest-wins REMOVES the vector from the served index (the
        MaintainedPQ / MaintainedPostings NULL lesson, ADVICE r4: zero
        emitted rows silently keep stale state)."""
        if self.log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        # nearest bucket == first probe (probe_rows is stable-sorted,
        # so exact ties take the lowest cid — the SQL twins' order)
        rows = probe_rows(
            embeddings.where(F.col("embedding").isNotNull()),
            self._bc,
            n_probe=1,
            query_id_col=self.id_col,
        ).select(
            self.id_col,
            F.col("bucket"),
            F.col("q_emb").alias("c_emb"),
            F.col("q_nrm").alias("c_nrm"),
        )
        tombs = embeddings.where(F.col("embedding").isNull()).select(
            self.id_col,
            F.lit(None).cast("int").alias("bucket"),
            F.lit(None).cast("array<double>").alias("c_emb"),
            F.lit(None).cast("double").alias("c_nrm"),
        )
        self.log.write_delta(rows.unionByName(tombs), batch_id)
        if self.log.delta_count() >= self.compact_every:
            self.log.compact(batch_id)

    def corpus(self) -> DataFrame | None:
        """Latest (vec_id, bucket, c_emb, c_nrm) per vector;
        tombstoned (NULL-bucket) vectors excluded."""
        t = self.log.read()
        return None if t is None else t.where(F.col("bucket").isNotNull())

    def query(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 2,
        query_id_col: str = "query_id",
        prune: bool = True,
    ) -> DataFrame:
        """Top-k ANN per query over the CURRENT index state — the
        shared probe/join/rank kernel. Reads state through an EAGER
        localCheckpoint (same contract as MaintainedPostings.search:
        callers may delete the state directory once the plan is
        built)."""
        c = self.corpus()
        if c is None:
            raise ValueError("MaintainedIVF: empty index (no batches applied)")
        c = c.localCheckpoint(eager=True)
        q = probe_rows(queries, self._bc, n_probe, query_id_col)
        return probe_join_rank(c, q, k, query_id_col, prune)

    def export_index(self, path: str):
        """Write the CURRENT log view into the serving-tier
        ``operators/similarity.IVFIndex`` layout: corpus parquet
        PARTITIONED BY bucket (the partition dirs ARE the inverted
        lists — probes get true partition pruning, which the vec-keyed
        ingest log cannot give) plus the centroid table. Returns the
        loaded ``IVFIndex``; its queries equal this index's (tested).
        The standard two-tier ANN deployment: the log absorbs O(batch)
        ingest, the export is a periodic one-pass compaction."""
        import os

        from cuda_gis_smoothing_spark.operators.similarity import IVFIndex

        c = self.corpus()
        if c is None:
            raise ValueError("MaintainedIVF: empty index (no batches applied)")
        c.select("vec_id", "c_emb", "c_nrm", "bucket").write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(os.path.join(path, "corpus"))
        self.spark.createDataFrame(
            [(b, [float(x) for x in row]) for b, row in enumerate(self.centroids)],
            "bucket int, centroid array<double>",
        ).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
        return IVFIndex(self.spark, path, self.centroids)

    def start(self, source_dir: str, checkpoint_dir: str, available_now: bool = True):
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField(self.id_col, T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )
        stream = (
            self.spark.readStream.schema(schema)
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


class MaintainedLabeledVectors:
    """Vec-keyed latest-wins log of LABELED vectors — the maintained
    substrate for per-label embedding analytics (outlier screens,
    centroid audits) over a continuously labeled corpus: a batch
    writes O(batch) ``(vec_id, label, emb)`` rows; a re-ingested
    vec_id REPLACES its row; a NULL-label OR NULL-embedding row is an
    explicit TOMBSTONE (the MaintainedIVF / MaintainedPostings NULL
    lesson: zero emitted rows silently keep stale state) so
    latest-wins removes the vector from every served report.

    Serving: :meth:`outliers` runs the batch
    ``operators/similarity.embedding_outliers`` over the current view
    — single-batch state equals the batch operator exactly (the
    smooth_maintained precedent; tested, plus multi-batch
    update/tombstone equality vs a batch rebuild). State is read
    through an EAGER localCheckpoint so callers may delete the state
    directory once the plan is built (the MaintainedPostings.search
    contract)."""

    def __init__(self, spark: SparkSession, state_root: str, id_col: str = "vec_id"):
        self.spark = spark
        self.id_col = id_col
        self.log = SnapshotLog(
            spark, os.path.join(state_root, "labeled_vectors"), key=id_col
        )

    def process_batch(self, embeddings: DataFrame, batch_id: int) -> None:
        if self.log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        live = F.col("label").isNotNull() & F.col("embedding").isNotNull()
        rows = embeddings.select(
            self.id_col,
            F.when(live, F.col("label")).cast("int").alias("label"),
            F.when(live, F.col("embedding"))
            .cast("array<double>")
            .alias("emb"),
        )
        self.log.write_delta(rows, batch_id)

    def corpus(self) -> DataFrame | None:
        """Latest (vec_id, label, emb) per vector; tombstones excluded."""
        t = self.log.read()
        return None if t is None else t.where(F.col("label").isNotNull())

    def outliers(self, k: int | None = None) -> DataFrame:
        from cuda_gis_smoothing_spark.operators.similarity import (
            EMBEDDING_OUTLIERS_K,
            embedding_outliers,
        )

        c = self.corpus()
        if c is None:
            raise ValueError(
                "MaintainedLabeledVectors: empty state (no batches applied)"
            )
        c = c.localCheckpoint(eager=True)
        return embedding_outliers(
            c, k=EMBEDDING_OUTLIERS_K if k is None else k, emb_col="emb"
        )
