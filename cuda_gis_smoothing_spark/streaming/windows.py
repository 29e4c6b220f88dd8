"""Structured Streaming: watermarked windowed aggregation and a custom
stateful operator (applyInPandasWithState).

Batch twins of these live in operators/events.py (the driver's DuckDB
gate checks those); here the same semantics run as streams with late
data handled by watermarks, and with arbitrary per-key state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark, source_dir: str, max_files: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(source_dir)
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour counts per event type with late-data watermark.

    Append mode emits a window only once the watermark passes its end —
    the streaming twin of the batch ``events_hourly`` query. At scale
    the state store holds one row per (window, type): bounded by the
    watermark horizon, not by stream length.
    """
    ts = F.col("ts").cast("timestamp")
    return (
        events.select(ts.alias("ts"), "event_type", "value")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value") + 1e-9, 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum) kept in
    arbitrary GroupState across micro-batches (applyInPandasWithState).

    Emits the updated total for every user touched by the batch. State
    is one small tuple per user — the pattern for any incremental
    per-key accumulator the built-in aggs can't express.
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s = state.get
        else:
            n, s = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType="user_id long, n_events long, sum_value double",
            stateStructType="n long, s double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
