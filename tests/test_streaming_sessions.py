"""Streaming sessionization must equal the batch operator over the
same events once the watermark has closed every session — emission
driven by data timestamps only (no sleeps)."""

import datetime as dt

import pandas as pd

from cuda_gis_smoothing_spark.streaming.sessions import sessionize_stream

EVENTS_TS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)
T0 = dt.datetime(2026, 1, 1, 0, 0, 0)
SENTINEL = 999


def _write(spark, src, rows):
    spark.createDataFrame(rows, schema=EVENTS_TS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def test_stream_sessions_equal_batch_once_closed(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    eid = 0
    # files at minutes 0, 5, 10, 45, 50: the 10 -> 45 gap (35 min > 30)
    # splits sessions for every user present on both sides
    for i, minute in enumerate((0, 5, 10, 45, 50)):
        rows = []
        for u in range(12):
            if (u + i) % 3 == 0:
                continue
            eid += 1
            rows.append(
                (
                    eid,
                    T0 + dt.timedelta(minutes=minute, seconds=u),
                    u,
                    "click",
                    float(u) + 0.125 * i,
                )
            )
        _write(spark, src, rows)
    # sentinel far in the future: advances the watermark past every
    # real session's deadline, closing them all
    _write(
        spark,
        src,
        [(100000, T0 + dt.timedelta(hours=10), SENTINEL, "x", 0.0)],
    )

    emitted = []

    def sink(df, _bid):
        emitted.extend(df.collect())

    q = (
        sessionize_stream(
            spark.readStream.schema(EVENTS_TS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (
            r["user_id"],
            r["session_seq"],
            r["start_us"],
            r["n_events"],
            round(r["sum_value"] + 1e-9, 4),
        )
        for r in emitted
        if r["user_id"] != SENTINEL
    }

    from pyspark.sql import functions as F

    from cuda_gis_smoothing_spark.operators.events import sessionize

    batch = sessionize(
        spark.read.parquet(src).where(F.col("user_id") != SENTINEL)
    ).collect()

    def to_us(s: str) -> int:
        d = dt.datetime.fromisoformat(s)
        return int(d.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    want = {
        (
            r["user_id"],
            r["session_seq"],
            to_us(r["session_start"]),
            r["n_events"],
            round(float(r["sum_value"]) + 1e-9, 4),
        )
        for r in batch
    }
    assert got == want and len(want) >= 12
    # the 35-min gap really did split: some user has session_seq 2
    assert any(s[1] == 2 for s in want)
