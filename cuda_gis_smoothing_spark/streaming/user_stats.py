"""Maintained per-(user, event_type) counts — the streaming form of
the count table behind ``operators/events.user_event_entropy``.

Events are immutable and append-only (the MaintainedDailyCounts /
MaintainedTransitions contract), so the count log is purely ADDITIVE —
no decrement machinery exists:

* ``counts`` — (user_id, event_type)-keyed ABSOLUTE counts,
  latest-wins: a batch's own aggregate (the SHARED
  ``user_type_counts`` fold — batch and incremental paths cannot
  drift) joins its TOUCHED keys against prior state (read with
  ``before_batch_id`` — the crash-window contract) and writes absolute
  rows. O(batch keys) delta rows per batch, never O(history) (tested).
  A single log is its own replay guard: ``has(batch_id)``
  short-circuits a replayed batch before any read or write.

NULL handling: NULL user_id / event_type rows are excluded from state,
matching the batch operator's contract exactly (a NULL key cannot
equi-join its twin row).

Serving routes through the shared ``user_entropy_from_counts`` kernel;
the driver gates the path via ``user_event_entropy_maintained``
(single-batch instance == the batch operator exactly, so the twin is
SHARED — the smooth_maintained precedent).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.operators.events import (
    user_entropy_from_counts,
    user_type_counts,
)
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog


class MaintainedUserTypes:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        compact_every: int = 4,
    ):
        self.spark = spark
        self.compact_every = compact_every
        self.counts_log = SnapshotLog(
            spark,
            os.path.join(state_root, "counts"),
            key=["user_id", "event_type"],
        )

    # ------------------------------------------------------------------
    def process_batch(self, events: DataFrame, batch_id: int) -> None:
        """Fold one batch into the per-user type counts: one
        (user, type)-keyed delta of O(batch keys) absolute rows."""
        if self.counts_log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        add = user_type_counts(events).select(
            "user_id", "event_type", F.col("_c").alias("_d")
        )
        cur = self.counts_log.read(before_batch_id=batch_id)
        if cur is None:
            new_counts = add.select(
                "user_id", "event_type", F.col("_d").cast("long").alias("_c")
            )
        else:
            new_counts = add.join(
                cur, ["user_id", "event_type"], "left"
            ).select(
                "user_id",
                "event_type",
                (F.coalesce(F.col("_c"), F.lit(0)) + F.col("_d"))
                .cast("long")
                .alias("_c"),
            )
        self.counts_log.write_delta(new_counts, batch_id)
        if self.counts_log.delta_count() >= self.compact_every:
            self.counts_log.compact(batch_id)

    # ------------------------------------------------------------------
    def counts(self) -> DataFrame:
        """The maintained (user_id, event_type, _c) table, read through
        an EAGER localCheckpoint — callers may delete the state
        directory once the plan is built (the MaintainedPostings.search
        contract)."""
        t = self.counts_log.read()
        if t is None:
            raise ValueError("MaintainedUserTypes: empty state")
        return t.select("user_id", "event_type", "_c").localCheckpoint(
            eager=True
        )

    def entropy(self) -> DataFrame:
        """The behavioral-diversity card served from state alone —
        nothing re-reads events; the SHARED user_entropy_from_counts
        kernel runs over the (users × types)-sized maintained table."""
        return user_entropy_from_counts(self.counts())

    def type_lift(self, min_support: int = 5) -> DataFrame:
        """Event-type basket lift served from state alone — the SHARED
        lift_from_user_types kernel over the maintained table: basket
        membership is the log's key set, and counts are additive with
        strictly positive deltas (events are immutable, no decrements),
        so a key exists in state iff the user ever emitted the type —
        exactly the batch operator's distinct basket."""
        from cuda_gis_smoothing_spark.operators.events import (
            lift_from_user_types,
        )

        return lift_from_user_types(self.counts(), min_support)
