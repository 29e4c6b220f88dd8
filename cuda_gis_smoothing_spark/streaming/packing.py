"""Incremental sequence packing: extend the packed training-sequence
stream as document batches arrive (the streaming twin of
operators/packing.py — a corpus build appends curated batches and
wants shard layout WITHOUT repacking history).

Semantics (documented, tested): docs are packed in BATCH ARRIVAL
order, doc_id order within a batch — the placement of everything
already packed is IMMUTABLE (repacking would invalidate written
shards). A single batch holding the whole corpus therefore equals
``pack_sequences`` exactly; a multi-batch run equals the batch
operator iff the batch split respects doc_id order (both tested).

State: two SnapshotLogs —
  * ``placed``: one row per packed doc (its placement) — O(batch)
    delta per batch, never rewritten;
  * ``totals``: a single-key running token count — the only value a
    new batch needs from history, so per-batch work is O(batch) with
    a 1-row state read (packing history is never re-scanned).
Crash contract (single direction, simpler than the curator's three
logs): the replay guard is ``has(batch_id)`` on the TOTALS log,
written LAST — a crash after the placed delta replays the batch and
overwrites it idempotently; the totals read needs no before-filter
because an in-flight totals delta implies the guard already passed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.operators.packing import (
    PACK_SEQ_LEN,
    _counts,
)
from cuda_gis_smoothing_spark.plans.partitioning import global_prefix_sums
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog


class IncrementalPacker:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        seq_len: int = PACK_SEQ_LEN,
        id_col: str = "doc_id",
        compact_every: int = 8,
        strict_unique: bool = True,
    ):
        self.spark = spark
        self.seq_len = int(seq_len)
        self.id_col = id_col
        self.compact_every = compact_every
        self.strict_unique = strict_unique
        self.placed_log = SnapshotLog(
            spark, os.path.join(state_root, "placed"), key=id_col
        )
        self.totals_log = SnapshotLog(
            spark, os.path.join(state_root, "totals"), key="k"
        )

    def _base(self) -> int:
        t = self.totals_log.read()
        if t is None:
            return 0
        return t.collect()[0]["total_tokens"]

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        if self.totals_log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        L = self.seq_len
        # accept either raw docs (tokenize) or pre-counted rows — the
        # incremental curator's curated output carries n_tokens but no
        # text, so a curate→pack streaming chain feeds counts directly
        if "n_tokens" in docs.columns and "text" not in docs.columns:
            counts = docs.select(F.col(self.id_col), F.col("n_tokens").cast("long").alias("n_tokens"))
        else:
            counts = _counts(docs, self.id_col)
        counts = counts.localCheckpoint()
        # unique-doc_id contract ENFORCED, not assumed (review-pass r4):
        # a re-ingested id would be latest-wins-overwritten in the
        # placed log while totals still advanced by its tokens — an
        # orphaned hole in already-written shards, silent layout
        # corruption. The probe is an id-keyed semi-join against the
        # doc-keyed state (ids only, columnar scan), bounded by state
        # size; disable via strict_unique=False when the caller proves
        # uniqueness upstream (the curator chain does) and the state
        # scan matters.
        if self.strict_unique:
            # the batch itself must be id-unique too: two rows sharing an
            # id would both receive placements and advance totals by both
            # token counts, yet latest-wins collapses them to one row in
            # the placed log — the same orphaned-hole corruption via the
            # intra-batch path (ADVICE r4)
            if (
                counts.groupBy(self.id_col)
                .count()
                .where(F.col("count") > 1)
                .limit(1)
                .count()
                > 0
            ):
                raise ValueError(
                    "IncrementalPacker: duplicate doc_id within the batch — "
                    "placements must be per unique id; dedup upstream or "
                    "use fresh ids"
                )
            # before_batch_id: a crash replay re-processes a batch
            # whose placed delta already landed — those ids are the
            # batch's OWN rows, not a re-ingest
            prior = self.placed_log.read(before_batch_id=batch_id)
            if prior is not None and (
                counts.join(
                    prior.select(self.id_col), self.id_col, "left_semi"
                )
                .limit(1)
                .count()
                > 0
            ):
                raise ValueError(
                    "IncrementalPacker: doc_id re-ingest detected — packed "
                    "placements are immutable (shards are already written); "
                    "dedup upstream or use fresh ids"
                )
        base = self._base()
        p = global_prefix_sums(counts, [self.id_col], "n_tokens", out_col="_p")
        placed = p.select(
            self.id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.expr(f"(_p + {base}) div {L}").cast("long").alias("start_seq"),
            ((F.col("_p") + base) % L).cast("long").alias("seq_offset"),
        )
        self.placed_log.write_delta(placed, batch_id)
        batch_tokens = counts.agg(F.sum("n_tokens")).collect()[0][0] or 0
        self.totals_log.write_delta(
            self.spark.createDataFrame(
                [("total", int(base + batch_tokens))], "k string, total_tokens long"
            ),
            batch_id,
        )
        if self.placed_log.delta_count() >= self.compact_every:
            self.placed_log.compact(batch_id)
            self.totals_log.compact(batch_id)

    def current_placed(self) -> DataFrame | None:
        return self.placed_log.read()

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
