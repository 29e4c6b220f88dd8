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


def test_session_marker_ttl_resets_seq_after_gc(spark, tmp_path):
    """marker_ttl_us GC: a closed user's seq marker is removed once the
    watermark passes last_event + TTL, so a user returning later starts
    at session_seq 1 again; without the TTL the marker lingers and the
    seq keeps counting. Both driven purely by data timestamps."""
    from cuda_gis_smoothing_spark.streaming.sessions import sessionize_stream

    def run(ttl_us):
        src = str(tmp_path / f"src_{ttl_us}")
        ckpt = str(tmp_path / f"ckpt_{ttl_us}")
        # a timeout fires only in a batch where the group has NO data
        # (the watermark contract): batch 3 closes the session and arms
        # the marker TTL; batch 4 is the GC tick (wm past the marker
        # deadline, no u7 data); u7 returns in batch 5
        rows = [
            [(1, T0, 7, "click", 1.0)],                                    # u7 session 1
            [(2, T0 + dt.timedelta(minutes=40), 50, "x", 0.0)],            # advances wm
            [(3, T0 + dt.timedelta(minutes=80), 51, "x", 0.0)],            # closes u7, arms TTL
            [(4, T0 + dt.timedelta(minutes=100), 53, "x", 0.0)],           # marker GC tick
            [(5, T0 + dt.timedelta(minutes=120), 7, "click", 1.0)],        # u7 returns
            [(6, T0 + dt.timedelta(minutes=200), 52, "x", 0.0)],           # closes it
        ]
        for batch in rows:
            spark.createDataFrame(batch, schema=EVENTS_TS_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(src)
        emitted = []

        def sink(df, _bid):
            emitted.extend(df.collect())

        q = (
            sessionize_stream(
                spark.readStream.schema(EVENTS_TS_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                marker_ttl_us=ttl_us,
            )
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return sorted(
            (r["session_seq"]) for r in emitted if r["user_id"] == 7
        )

    # TTL 60 min: marker (deadline T0+60m) GC'd by the T0+80m batch ->
    # the T0+120m return restarts at seq 1
    assert run(60 * 60 * 1_000_000) == [1, 1]
    # no TTL: marker lingers, seq keeps counting
    assert run(None) == [1, 2]
