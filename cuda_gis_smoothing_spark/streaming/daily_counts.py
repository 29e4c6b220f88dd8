"""Maintained per-(event_type, day) volume counts — the streaming form
of the daily table behind ``operators/events.event_autocorrelation``
(and any other daily-volume card).

The batch operator re-aggregates the full event history per run; at
100 TB the seasonality card is served from MAINTAINED state. Events are
immutable and append-only (the MaintainedTransitions contract), so the
count log is purely ADDITIVE — no decrement machinery exists:

* ``counts`` — (event_type, day)-keyed ABSOLUTE counts, latest-wins:
  a batch's own (type, day) aggregate joins its TOUCHED keys against
  prior state (read with ``before_batch_id`` — the crash-window
  contract) and writes absolute rows. O(batch keys) delta rows per
  batch, never O(history) (tested). A single log is its own replay
  guard: ``has(batch_id)`` short-circuits a replayed batch before any
  read or write.

NULL handling: rows with a NULL ``ts`` or NULL ``event_type`` are
EXCLUDED from state — in the batch operator they survive as daily rows
but can never join a lag pair (NULL equality), so the served
autocorrelation is identical with or without them (pinned by the
multi-batch equality test, which feeds NULL rows).

Serving routes through the shared ``autocorr_from_daily`` kernel so the
batch gate and this path cannot drift; the driver gates the path via
``event_autocorrelation_maintained`` (single-batch instance vs the
batch twin's SQL — the source_kl_maintained precedent).

``key`` generalizes the grouping (the burstiness_from_daily precedent):
a ``key="user_id"`` instance serves ``user_burstiness`` from state
(gated as ``user_burstiness_maintained``). Only ``burstiness()`` is
key-generic — the other serves read event_type-keyed kernels and
assume the default key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.operators.events import (
    AUTOCORR_LAGS,
    autocorr_from_daily,
    daily_counts,
)
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog


class MaintainedDailyCounts:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        compact_every: int = 4,
        key: str = "event_type",
    ):
        self.spark = spark
        self.compact_every = compact_every
        self.key = key
        self.counts_log = SnapshotLog(
            spark, os.path.join(state_root, "counts"), key=[key, "day"]
        )

    # ------------------------------------------------------------------
    def process_batch(self, events: DataFrame, batch_id: int) -> None:
        """Fold one batch into the daily counts: one (type, day)-keyed
        delta of O(batch keys) absolute rows."""
        if self.counts_log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        add = (
            daily_counts(events, self.key)
            .where(F.col(self.key).isNotNull() & F.col("day").isNotNull())
            .select(self.key, "day", F.col("n").alias("_d"))
        )
        cur = self.counts_log.read(before_batch_id=batch_id)
        if cur is None:
            new_counts = add.select(
                self.key, "day", F.col("_d").cast("long").alias("n")
            )
        else:
            new_counts = add.join(cur, [self.key, "day"], "left").select(
                self.key,
                "day",
                (F.coalesce(F.col("n"), F.lit(0)) + F.col("_d"))
                .cast("long")
                .alias("n"),
            )
        self.counts_log.write_delta(new_counts, batch_id)
        if self.counts_log.delta_count() >= self.compact_every:
            self.counts_log.compact(batch_id)

    # ------------------------------------------------------------------
    def daily(self) -> DataFrame:
        """The maintained (event_type, day, n) table, read through an
        EAGER localCheckpoint — callers may delete the state directory
        once the plan is built (the MaintainedPostings.search
        contract)."""
        t = self.counts_log.read()
        if t is None:
            raise ValueError("MaintainedDailyCounts: empty state")
        return t.select(self.key, "day", "n").localCheckpoint(eager=True)

    def autocorrelation(
        self, lags: tuple[int, ...] = AUTOCORR_LAGS
    ) -> DataFrame:
        """Lag-k Pearson autocorrelation served from state alone —
        nothing re-reads events; the moment sums run over the
        day-cardinality maintained table through the SHARED kernel."""
        return autocorr_from_daily(self.daily(), lags)

    def cusum(self) -> DataFrame:
        """CUSUM changepoint curve served from state alone — the
        SHARED cusum_from_daily kernel over the maintained table (the
        autocorrelation precedent: the gate routes the incremental
        path against the batch twin)."""
        from cuda_gis_smoothing_spark.operators.events import cusum_from_daily

        return cusum_from_daily(self.daily())

    def trend(self) -> DataFrame:
        """Theil–Sen trend served from state alone — the SHARED
        trend_from_daily kernel over the maintained table."""
        from cuda_gis_smoothing_spark.operators.events import trend_from_daily

        return trend_from_daily(self.daily())

    def seasonality(self) -> DataFrame:
        """Weekday profile served from state alone — the SHARED
        seasonality_from_daily kernel over the maintained table
        (counts are additive, so the served profile equals the batch
        operator over the union of all ingested batches)."""
        from cuda_gis_smoothing_spark.operators.events import (
            seasonality_from_daily,
        )

        return seasonality_from_daily(self.daily())

    def burstiness(self) -> DataFrame:
        """Fano-factor dispersion card served from state alone — the
        SHARED burstiness_from_daily kernel over the maintained table
        (counts are additive, so the served card equals the batch
        operator over the union of all ingested batches)."""
        from cuda_gis_smoothing_spark.operators.events import (
            burstiness_from_daily,
        )

        return burstiness_from_daily(self.daily(), key=self.key)

    def kendall_tau(self) -> DataFrame:
        """Cross-series Kendall τ-b served from state alone — the
        SHARED kendall_from_daily kernel over the maintained table
        (counts are additive, so the served card equals the batch
        operator over the union of all ingested batches)."""
        from cuda_gis_smoothing_spark.operators.events import (
            kendall_from_daily,
        )

        return kendall_from_daily(self.daily())

    def runs_test(self) -> DataFrame:
        """Wald–Wolfowitz runs test served from state alone — the
        SHARED runs_from_daily kernel over the maintained table."""
        from cuda_gis_smoothing_spark.operators.events import runs_from_daily

        return runs_from_daily(self.daily())

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
