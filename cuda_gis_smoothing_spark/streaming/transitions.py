"""Maintained event-type transition counts — the streaming form of
``operators/events.event_transitions``.

The batch operator lag-pairs each user's full event history per run; at
100 TB the clickstream transition matrix is served from MAINTAINED
state instead:

* ``state`` — ONE user-keyed row per user: the user's LAST event
  ``(user_k, last_us, last_eid, last_type)`` (latest-wins). This is the
  only cross-batch memory a first-order chain needs: a batch's
  transitions are its own intra-batch lag pairs plus one boundary pair
  per returning user (stored last → batch first).
* ``counts`` — (from_k, to_k)-keyed ABSOLUTE transition counts,
  latest-wins, written LAST as the crash-replay guard (the
  MaintainedSourceTokens write-order contract). Events are immutable,
  so deltas are increments only — O(batch pairs) per batch, never
  O(history) (tested).

Semantics trick: the stored last events are injected as PSEUDO-ROWS in
front of the batch and the SAME lag window runs over the union — the
boundary pair falls out of the identical expression the batch operator
uses, so edge semantics (a NULL-type predecessor drops the pair, a
user's true first event pairs with nothing) can never drift. Serving
routes through the shared ``transition_probabilities`` kernel.

Ordering contract: per-user event time (epoch_us, event_id) must be
monotone ACROSS batches (within a batch any order is fine — the window
sorts). A violating batch RAISES before any state is written (the CC
non-convergence precedent: loud, never silently-wrong counts);
watermark-buffered reordering is the documented extension, not a
silent fallback.

NULL keys: SnapshotLog key joins drop NULL keys (the _group_dedup
class), so NULL user ids key under an out-of-range bigint sentinel and
NULL event types under the ``\\x00`` text sentinel inside the counts
key, mapped back to NULL at read — the served table matches the batch
operator's NULL groups exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cuda_gis_smoothing_spark.operators.events import (
    event_micros,
    transition_probabilities,
)
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog

#: sentinel for NULL user ids inside the user-keyed state log (outside
#: any realistic id range; collides with nothing in the fixtures)
NULL_USER = -(2**62)
#: sentinel for NULL event types inside the counts key (control char —
#: can never collide with a real type string)
NULL_TYPE = "\x00"


class MaintainedTransitions:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        compact_every: int = 4,
    ):
        self.spark = spark
        self.compact_every = compact_every
        self.state_log = SnapshotLog(
            spark, os.path.join(state_root, "state"), key="user_k"
        )
        self.counts_log = SnapshotLog(
            spark, os.path.join(state_root, "counts"), key=["from_k", "to_k"]
        )

    # ------------------------------------------------------------------
    def process_batch(self, events: DataFrame, batch_id: int) -> None:
        """Fold one batch of events into the transition counts: one
        user-keyed last-event delta of O(batch users) rows, one count
        delta of O(batch pairs) rows (the replay guard, written LAST)."""
        if self.counts_log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        batch = events.select(
            F.coalesce(F.col("user_id"), F.lit(NULL_USER)).alias("user_k"),
            F.col("event_id"),
            F.col("event_type"),
            event_micros("ts").alias("us"),
        ).localCheckpoint()  # consumers: pairs, lasts, the order check

        prior = self.state_log.read(before_batch_id=batch_id)
        pseudo = None
        if prior is not None:
            pseudo = prior.join(
                batch.select("user_k").distinct(), "user_k", "left_semi"
            ).select(
                "user_k",
                F.col("last_eid").alias("event_id"),
                F.col("last_type").alias("event_type"),
                F.col("last_us").alias("us"),
            ).localCheckpoint()  # consumers: the union and the order check
            # ordering contract: every batch row must sort strictly
            # after the user's stored last event
            bad = (
                batch.groupBy("user_k")
                .agg(F.min(F.struct("us", "event_id")).alias("_f"))
                .join(pseudo, "user_k")
                .where(F.col("_f") <= F.struct(F.col("us"), F.col("event_id")))
                .limit(1)
                .count()
            )
            if bad:
                raise ValueError(
                    "MaintainedTransitions: batch violates per-user "
                    "event-time monotonicity across batches"
                )
            aug = batch.unionByName(pseudo)
        else:
            aug = batch

        w = Window.partitionBy("user_k").orderBy("us", "event_id")
        pairs = (
            aug.select(
                F.lag("event_type").over(w).alias("from_type"),
                F.col("event_type").alias("to_type"),
                # the pseudo row itself is first per user (checked
                # above), so it is never a "to" — no flag needed
            )
            .where(F.col("from_type").isNotNull())
            .groupBy(
                F.col("from_type").alias("from_k"),
                F.coalesce(F.col("to_type"), F.lit(NULL_TYPE)).alias("to_k"),
            )
            .agg(F.count(F.lit(1)).alias("_d"))
        )
        cur = self.counts_log.read(before_batch_id=batch_id)
        if cur is None:
            new_counts = pairs.select(
                "from_k", "to_k", F.col("_d").cast("long").alias("cnt")
            )
        else:
            new_counts = pairs.join(cur, ["from_k", "to_k"], "left").select(
                "from_k",
                "to_k",
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.col("_d"))
                .cast("long")
                .alias("cnt"),
            )
        lasts = batch.groupBy("user_k").agg(
            F.max(F.struct("us", "event_id", "event_type")).alias("_l")
        ).select(
            "user_k",
            F.col("_l.us").alias("last_us"),
            F.col("_l.event_id").alias("last_eid"),
            F.col("_l.event_type").alias("last_type"),
        )
        # write order is the crash contract: state first, counts LAST
        self.state_log.write_delta(lasts, batch_id)
        self.counts_log.write_delta(new_counts, batch_id)
        if self.state_log.delta_count() >= self.compact_every:
            for log in (self.state_log, self.counts_log):
                log.compact(batch_id)

    # ------------------------------------------------------------------
    def transitions(self) -> DataFrame:
        """The transition matrix served from the maintained counts via
        the SHARED ``transition_probabilities`` kernel — nothing
        re-reads events at serve time. Sentinel keys map back to NULL
        so the table matches the batch operator exactly (tested;
        driver-gated as ``event_transitions_maintained``). Reads state
        through an EAGER localCheckpoint — callers may delete the state
        directory once the plan is built (the MaintainedPostings.search
        contract)."""
        cur = self.counts_log.read()
        if cur is None:
            raise ValueError("MaintainedTransitions: empty state")
        # only to_k is sentinel-keyed: from_type is filtered non-NULL
        # before grouping, so no stored row ever carries the sentinel
        # in from_k (NULL-from pairs are dropped, per module docstring)
        counts = cur.select(
            F.col("from_k").alias("from_type"),
            F.when(F.col("to_k") == NULL_TYPE, F.lit(None))
            .otherwise(F.col("to_k"))
            .alias("to_type"),
            F.col("cnt").alias("n_transitions"),
        ).localCheckpoint(eager=True)
        return transition_probabilities(counts)

    def stationary(self, damping: float = 0.85, iters: int = 5) -> DataFrame:
        """Stationary distribution served from the maintained matrix —
        the second read-side statistic over the same state (the
        MaintainedSourceTokens.zipf precedent), through the SHARED
        ``stationary_from_matrix`` kernel: since :meth:`transitions`
        equals the batch matrix exactly, the power iteration consumes
        identical round6 probabilities and the batch twin is shared."""
        from cuda_gis_smoothing_spark.operators.events import (
            stationary_from_matrix,
        )

        return stationary_from_matrix(self.transitions(), damping, iters)

    # ------------------------------------------------------------------
    def start(self, source_dir: str, checkpoint_dir: str, available_now: bool = True):
        from cuda_gis_smoothing_spark.streaming.windows import EVENTS_SCHEMA

        stream = (
            self.spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(source_dir)
        )
        writer = stream.writeStream.foreachBatch(
            lambda df, bid: self.process_batch(df, bid)
        ).option("checkpointLocation", checkpoint_dir)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
