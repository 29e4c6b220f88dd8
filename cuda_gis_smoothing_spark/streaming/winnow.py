"""Maintained winnowing fingerprints — the streaming form of
``operators/dedup.winnow_fingerprints``.

The batch operator re-winnows the whole corpus per run; at 100 TB the
span-level near-dup candidate index is MAINTAINED: one doc-keyed
SnapshotLog row per document holding its sorted fingerprint ARRAY
(latest-wins, so a re-ingested doc replaces its selection wholesale —
fingerprints are a pure function of the doc's own text, which is what
makes the doc-keyed log sufficient: no cross-doc state to decrement,
unlike the count-keyed dfreq/bigram logs). A NULL-text or sub-gram doc
writes an explicit EMPTY-array tombstone (the MaintainedPostings
stale-postings lesson: emitting zero rows would leave the old
selection alive under latest-wins).

``cross_batch_candidates`` is the operational payoff: a batch's new
fingerprints equi-join against the PRIOR stored selection only — the
O(batch ∩ index) incremental candidate source for span-level near-dup
(the guarantee carries over: a batch doc sharing a
window+gram−1-token run with ANY indexed doc surfaces as a
candidate), feeding the same verified-jaccard kernel as the batch
path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.operators.dedup import winnow_fingerprints
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog

_FP_EMPTY = "CAST(array() AS array<bigint>)"


class MaintainedWinnow:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        gram_len: int = 4,
        window: int = 4,
        id_col: str = "doc_id",
        compact_every: int = 4,
    ):
        self.spark = spark
        self.gram_len = gram_len
        self.window = window
        self.id_col = id_col
        self.compact_every = compact_every
        self.log = SnapshotLog(
            spark, os.path.join(state_root, "fingerprints"), key=id_col
        )

    def _slices(self, docs: DataFrame) -> DataFrame:
        """One row per distinct batch doc id: (id, _fps sorted array).
        Intra-batch duplicate ids merge their selections (collect_set —
        a doc split across rows can only ADD fingerprints, and the
        sorted-set form is order-deterministic); docs yielding no
        fingerprints get the explicit empty-array tombstone."""
        fps = winnow_fingerprints(
            docs, self.gram_len, self.window, self.id_col
        )
        per_doc = fps.groupBy(self.id_col).agg(
            F.sort_array(F.collect_set("fingerprint")).alias("_fps")
        )
        return (
            docs.select(self.id_col)
            .distinct()
            .join(per_doc, self.id_col, "left")
            .select(
                self.id_col,
                F.coalesce("_fps", F.expr(_FP_EMPTY)).alias("_fps"),
            )
        )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        """O(batch) doc-keyed delta; single-log, so the ``has`` check
        IS the whole replay contract."""
        if self.log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        self.log.write_delta(self._slices(docs), batch_id)
        if self.log.delta_count() >= self.compact_every:
            self.log.compact(batch_id)

    def fingerprints(self) -> DataFrame:
        """The maintained (doc_id, fingerprint) set — tombstoned docs
        (empty arrays) drop out on the explode. Reads state through an
        EAGER localCheckpoint — callers may delete the state directory
        once the plan is built (the MaintainedPostings.search
        contract)."""
        cur = self.log.read()
        if cur is None:
            raise ValueError("MaintainedWinnow: empty state")
        cur = cur.localCheckpoint(eager=True)
        return cur.select(
            self.id_col, F.explode("_fps").alias("fingerprint")
        )

    def cross_batch_candidates(self, batch_id: int) -> DataFrame:
        """Candidate near-dup pairs between batch ``batch_id``'s docs
        and the PRIOR index (never the batch's own rows — intra-batch
        pairs are the batch operator's job): equi-join on fingerprint,
        distinct on the pair (one verify per pair, the
        first-shared-fingerprint contract). Output: (doc_a = stored id,
        doc_b = batch id)."""
        delta = self.log.read_delta(batch_id)
        prior = self.log.read(before_batch_id=batch_id)
        if prior is None:
            return delta.select(
                F.col(self.id_col).alias("doc_a"),
                F.col(self.id_col).alias("doc_b"),
            ).where(F.lit(False))
        parts = self.spark.sparkContext.defaultParallelism
        new_fps = delta.select(
            F.col(self.id_col).alias("doc_b"), F.explode("_fps").alias("fingerprint")
        ).repartition(parts, "fingerprint")
        old_fps = (
            prior.join(delta.select(self.id_col), self.id_col, "left_anti")
            .select(
                F.col(self.id_col).alias("doc_a"),
                F.explode("_fps").alias("fingerprint"),
            )
            .repartition(parts, "fingerprint")
        )
        return (
            old_fps.join(new_fps, "fingerprint")
            .select("doc_a", "doc_b")
            .distinct()
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
