"""Event-stream batch operators: windowed rollups and sessionization.

Batch twins of the streaming path (streaming/incremental.py) — the
driver's DuckDB gate can only check batch SQL, so these carry the
correctness story for time-based operators. Gap math uses integer
microseconds (``unix_micros``) so the session-break predicate is exact
in both engines (float epoch seconds would tie-break differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from cuda_gis_smoothing_spark.functions.numeric import round6

SESSION_GAP_US = 1800 * 1_000_000  # 30 min


def sessionize(events: DataFrame) -> DataFrame:
    """Assign session ids per user (new session when the gap from the
    previous event exceeds 30 min) and aggregate per session.

    Scale note: both windows partition by user_id — ONE shuffle, then
    per-user local sorts; the per-user event counts are small and
    bounded, so no skew lever is needed (a viral-user variant would
    sessionize within (user, day) buckets first).
    """
    # parquet naive timestamps read as TIMESTAMP_NTZ; unix_micros wants
    # TIMESTAMP. The NTZ→TZ cast adds a constant session-tz offset that
    # cancels in gap DIFFERENCES, so the session-break predicate matches
    # DuckDB's epoch_us on the naive value.
    us = F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = (
        events.select("user_id", "event_id", "ts", "value", us)
        .withColumn("prev_us", F.lag("us").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_us").isNull()
                | ((F.col("us") - F.col("prev_us")) > SESSION_GAP_US)
            ).cast("int"),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        flagged.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").cast("string").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            round6(F.sum("value")).alias("sum_value"),
        )
        .select("user_id", "session_seq", "session_start", "n_events", "sum_value")
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         SUM(CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_US} THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(MIN(ts) AS VARCHAR) AS session_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value) + 1e-09, 6) AS sum_value
FROM sess
GROUP BY user_id, session_seq
""".strip()


def top_event_types_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Window-ranking operator: each user's top-k event types by count
    (ties broken by type name for determinism)."""
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("user_id", "event_type", "n", "rank")
    )


def top_event_types_sql(k: int = 3) -> str:
    return f"""
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type, n, CAST(rank AS INT) AS rank FROM (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rank
  FROM counts
)
WHERE rank <= {k}
""".strip()
