"""Maintained Heaps'-law state — the streaming form of
``functions/text.heaps_fit``'s vocabulary-growth curve.

The batch operator re-tokenizes the full corpus per run; at 100 TB the
growth card is served from MAINTAINED state:

* ``perdoc`` — doc-keyed ``(doc_id, _tok, _new)`` rows, the exact
  per-doc table the shared :func:`heaps_from_per_doc` kernel consumes.
  O(batch docs) delta rows per batch. Written LAST = the replay guard
  (``has(batch_id)`` short-circuits a replayed batch).
* ``tokens`` — the seen-type set as token-keyed rows, append-only by
  nature (a type, once seen, stays seen). O(batch ∩ new vocab) delta
  rows. Written FIRST: a crash between the two writes leaves the guard
  absent, and the replay's anti-join reads tokens with
  ``before_batch_id`` so the crashed delta is excluded (the
  SnapshotLog crash-window contract).

APPEND-IN-ORDER contract: the curve is defined over doc_id order, so a
batch whose minimum doc_id does not exceed every stored doc_id would
RETROACTIVELY change which doc first saw a token — such batches RAISE
(the MaintainedTransitions out-of-order precedent), as do intra-batch
duplicate doc_ids (the IncrementalPacker guard). Zero-token docs
(NULL/empty text) write no row — exactly the batch operator's
no-point contract.

A single-batch instance equals :func:`heaps_fit` over the same corpus
bit-for-bit (identical integers into the identical kernel), so the
``heaps_fit_maintained`` gate SHARES the batch twin (the
smooth_maintained precedent).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.functions.text import (
    heaps_from_per_doc,
    tokens_col,
)
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog


class MaintainedHeaps:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        compact_every: int = 4,
    ):
        self.spark = spark
        self.compact_every = compact_every
        self.perdoc_log = SnapshotLog(
            spark, os.path.join(state_root, "perdoc"), key=["doc_id"]
        )
        self.tokens_log = SnapshotLog(
            spark, os.path.join(state_root, "tokens"), key=["t"]
        )

    # ------------------------------------------------------------------
    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        """Fold one batch of documents into the growth state: one
        per-doc delta + one new-type delta, both O(batch)."""
        if self.perdoc_log.has(batch_id):
            return  # crash replay of an applied batch: no-op

        if (
            docs.groupBy("doc_id")
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .count()
        ):
            raise ValueError("MaintainedHeaps: duplicate doc_id within batch")
        prior = self.perdoc_log.read(before_batch_id=batch_id)
        if prior is not None:
            lo = docs.agg(F.min("doc_id").alias("_lo")).collect()[0]["_lo"]
            hi = prior.agg(F.max("doc_id").alias("_hi")).collect()[0]["_hi"]
            if lo is not None and hi is not None and lo <= hi:
                raise ValueError(
                    "MaintainedHeaps: batch doc_ids must exceed all stored "
                    f"doc_ids (got min {lo} <= stored max {hi}) — "
                    "out-of-order ingest would rewrite first-occurrence "
                    "history"
                )

        occ = docs.select(
            "doc_id", F.explode(tokens_col("text")).alias("t")
        ).where(F.col("t") != "")
        dt = occ.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_tok"))
        firsts = occ.groupBy("t").agg(F.min("doc_id").alias("doc_id"))
        seen = self.tokens_log.read(before_batch_id=batch_id)
        if seen is not None:
            firsts = firsts.join(seen.select("t"), "t", "left_anti")
        firsts = firsts.localCheckpoint()  # token delta + per-doc new counts
        nt = firsts.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_new"))
        per = dt.join(nt, "doc_id", "left").select(
            "doc_id",
            F.col("_tok").cast("long").alias("_tok"),
            F.coalesce(F.col("_new"), F.lit(0)).cast("long").alias("_new"),
        )
        # tokens first, the per-doc guard log LAST (crash-window order)
        self.tokens_log.write_delta(firsts.select("t"), batch_id)
        self.perdoc_log.write_delta(per, batch_id)
        if self.perdoc_log.delta_count() >= self.compact_every:
            self.perdoc_log.compact(batch_id)
            self.tokens_log.compact(batch_id)

    # ------------------------------------------------------------------
    def heaps(self) -> DataFrame:
        """The growth fit served from state alone — nothing re-reads
        document text; the shared kernel runs over the #docs-row
        maintained table (which eager-checkpoints its input, so the
        state directory may be deleted once the plan is built)."""
        per = self.perdoc_log.read()
        if per is None:
            raise ValueError("MaintainedHeaps: empty state")
        return heaps_from_per_doc(per.select("doc_id", "_tok", "_new"))
