"""Event-stream batch operators: windowed rollups and sessionization.

Batch twins of the streaming path (streaming/incremental.py) — the
driver's DuckDB gate can only check batch SQL, so these carry the
correctness story for time-based operators. Gap math uses integer
microseconds (``unix_micros``) so the session-break predicate is exact
in both engines (float epoch seconds would tie-break differently).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window, functions as F

from cuda_gis_smoothing_spark.functions.numeric import round6

SESSION_GAP_US = 1800 * 1_000_000  # 30 min


def event_micros(ts_col: str = "ts") -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column, timezone-FREE.

    ``unix_micros(ts.cast("timestamp"))`` interprets the naive value in
    the session timezone — a constant offset under a fixed-offset zone,
    but ±3600s drift across a DST transition, which would flip session
    breaks / as-of gaps vs DuckDB's ``epoch_us`` on the naive value.
    ``timestampdiff`` between two NTZ values never consults the session
    zone, so this matches ``epoch_us`` under ANY driver-supplied zone.
    """
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )


def floordiv(col: Column, divisor: int) -> Column:
    """Mathematical floor division on integers (Spark's ``DIV`` and
    ``CAST(x/y AS LONG)`` both truncate toward zero, which differs from
    floor for negative operands — pre-epoch timestamps would land in
    the wrong time bucket)."""
    return ((col - F.pmod(col, F.lit(divisor))) / divisor).cast("long")


def day_str(ts_col: str = "ts"):
    """Calendar-day bucket as DATE TEXT ('YYYY-MM-DD') — the ONLY
    day normalization gated operators may use: Spark's date_trunc
    stringifies WITH a time part and silently breaks the DuckDB twins
    (paid-for round-2 lesson); cast-to-date-to-string matches DuckDB's
    CAST(CAST(ts AS DATE) AS VARCHAR) byte-for-byte."""
    return F.col(ts_col).cast("date").cast("string")


def session_events(events: DataFrame) -> DataFrame:
    """Per-event session tagging — the gap-break windows
    :func:`sessionize` aggregates over, exposed so path/sequence
    analyses reuse the IDENTICAL session boundaries (one definition of
    SESSION_GAP_US and the (us, event_id) total order). Output: the
    event columns + ``us`` + ``session_seq`` (1-based per user)."""
    us = event_micros("ts").alias("us")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        events.select("user_id", "event_id", "event_type", "ts", "value", us)
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


def sessionize(events: DataFrame) -> DataFrame:
    """Assign session ids per user (new session when the gap from the
    previous event exceeds 30 min) and aggregate per session.

    Scale note: both windows partition by user_id — ONE shuffle, then
    per-user local sorts; the per-user event counts are small and
    bounded, so no skew lever is needed (a viral-user variant would
    sessionize within (user, day) buckets first).
    """
    flagged = session_events(events)
    return (
        flagged.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").cast("string").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            round6(F.sum("value")).alias("sum_value"),
        )
        .select("user_id", "session_seq", "session_start", "n_events", "sum_value")
    )


def _session_ctes(payload_cols: str) -> str:
    """DuckDB CTE pair ``flagged → sess`` tagging every event with its
    gap-break ``session_seq`` — the SQL twin of :func:`session_events`,
    shared by the sessionize and session_paths twins so the gap
    predicate and the (us, event_id) total order can never drift
    between them. ``payload_cols`` = extra event columns to carry
    through (beyond user_id/event_id/us)."""
    return f"""flagged AS (
  SELECT user_id, event_id, {payload_cols},
         epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
),
sess AS (
  SELECT user_id, event_id, {payload_cols}, us,
         SUM(CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_US} THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)"""


SESSIONIZE_SQL = f"""
WITH {_session_ctes("ts, value")}
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(MIN(ts) AS VARCHAR) AS session_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value) + 1e-09, 6) AS sum_value
FROM sess
GROUP BY user_id, session_seq
""".strip()


def session_stats(events: DataFrame) -> DataFrame:
    """Session-quality percentile card ``(metric, q, value)`` over the
    gap-break sessions — duration (seconds) and events-per-session
    distributions, the engagement summary read beside
    :func:`sessionize`'s per-session table (bounce share = the low
    quantiles of n_events; session depth = the high ones).

    Cross-engine: both metrics are exact per-session values — the
    duration is an INTEGER micros span divided by 1e6 (one correctly-
    rounded op over identical integers, the event_interarrival
    seconds contract) and n_events is an integer — so the shared
    exact-percentile kernel crosses the gate bit-for-bit. Session
    boundaries reuse :func:`session_events` / ``_session_ctes`` (ONE
    gap definition).

    Plan (100 TB): the sessionize shuffle + one per-session aggregate;
    the two metrics go long-format via ONE explode-of-two-structs pass
    (the span_coverage two-sided-union lesson) into a single
    percentile aggregate — one consumer end to end, nothing to
    checkpoint."""
    sess = (
        session_events(events)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            ((F.max("us") - F.min("us")) / F.lit(1e6)).alias("_dur"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("duration_s").alias("metric"),
                        F.col("_dur").alias("v"),
                    ),
                    F.struct(
                        F.lit("n_events").alias("metric"),
                        F.col("_n").cast("double").alias("v"),
                    ),
                )
            ).alias("_m")
        )
        .select(F.col("_m.metric").alias("metric"), F.col("_m.v").alias("v"))
    )
    return percentile_explode(sess, "v", PCT_QS, group_cols=("metric",))


def session_stats_sql() -> str:
    """DuckDB twin — the session CTEs nested inside the percentile
    twin builder's derived table (the zonal_quantiles precedent)."""
    src = f"""WITH {_session_ctes("ts")},
sagg AS (
  SELECT user_id, session_seq,
         CAST(COUNT(*) AS DOUBLE) AS n_events,
         (MAX(us) - MIN(us)) / 1e6 AS duration_s
  FROM sess GROUP BY 1, 2
)
SELECT 'duration_s' AS metric, duration_s AS v FROM sagg
UNION ALL
SELECT 'n_events' AS metric, n_events AS v FROM sagg"""
    return percentile_sql(src, "v", PCT_QS, group_cols=("metric",))


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


def funnel_conversion(
    events: DataFrame, steps: tuple[str, ...] = ("signup", "click", "purchase")
) -> DataFrame:
    """Ordered funnel: per step i, the users who performed step i at or
    after their step i-1 completion time (earliest-completion
    semantics — t_i = MIN time of step i among events >= t_{i-1}).
    Output: (step, event_type, n_users), one row per funnel stage.

    Plan shape: one filtered aggregation per step, each shuffled on
    user_id (the key every event operator shares), chained by an
    equi-join on user_id — no window over the event stream, no
    per-user sort; at 100 TB each stage is a hash aggregate over the
    step's OWN events only (filter pushed to the scan).

    The running per-user completion table is materialized per step
    (``localCheckpoint`` — swap for a staged table on a preemptible
    cluster): without it step i's plan embeds step i-1's aggregation
    and each per-step count re-executes the whole chain — O(S^2)
    passes over the (filtered) events for an S-step funnel. With it,
    events are scanned exactly once per step.
    """
    comps = _funnel_completions(events, steps)
    out: DataFrame | None = None
    for i, (s, c) in enumerate(zip(steps, comps)):
        row = c.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).alias("step"), F.lit(s).alias("event_type"), "n_users"
        )
        out = row if out is None else out.unionByName(row)
    return out


def _funnel_completions(
    events: DataFrame, steps: tuple[str, ...]
) -> list[DataFrame]:
    """The ONE earliest-completion funnel chain (drift prevention:
    :func:`funnel_conversion` counts it, :func:`funnel_step_latency`
    reads its timing columns). Per step i, a checkpointed
    ``(user_id, t, prev)`` table — t = MIN step-i time at/after the
    user's step i−1 completion, prev = that completion (NULL for step
    1). See funnel_conversion for the O(S) materialization argument."""
    us = event_micros("ts")
    ev = events.select("user_id", "event_type", us.alias("us"))
    cur: DataFrame | None = None
    out: list[DataFrame] = []
    for s in steps:
        e = ev.where(F.col("event_type") == s)
        if cur is None:
            cur = e.groupBy("user_id").agg(
                F.min("us").alias("t"),
                F.min(F.lit(None).cast("long")).alias("prev"),
            )
        else:
            cur = (
                e.join(cur.select("user_id", F.col("t").alias("_prev")), "user_id")
                .where(F.col("us") >= F.col("_prev"))
                .groupBy("user_id")
                .agg(F.min("us").alias("t"), F.min("_prev").alias("prev"))
            )
        cur = cur.localCheckpoint()
        out.append(cur)
    return out


def funnel_step_latency(
    events: DataFrame, steps: tuple[str, ...] = ("signup", "click", "purchase")
) -> DataFrame:
    """Step-transition latency percentiles for the funnel — how long
    converting users take between consecutive completions (the timing
    card read beside :func:`funnel_conversion`'s counts). Per step
    i ≥ 2, the per-user latency is ``(t_i − t_{i−1}) / 1e6`` seconds —
    an INTEGER micros difference divided once (the session_stats
    seconds contract), so the shared exact-percentile kernel crosses
    the gate bit-for-bit. Boundaries come from the SHARED
    :func:`_funnel_completions` chain — the latency card can never
    disagree with the conversion counts about who converted. Output
    ``(step, event_type, q, latency_s)``."""
    comps = _funnel_completions(events, steps)
    lat: DataFrame | None = None
    for i, (s, c) in enumerate(zip(steps, comps)):
        if i == 0:
            continue
        l = c.select(
            F.lit(i + 1).alias("step"),
            F.lit(s).alias("event_type"),
            ((F.col("t") - F.col("prev")) / F.lit(1e6)).alias("v"),
        )
        lat = l if lat is None else lat.unionByName(l)
    return percentile_explode(
        lat, "v", PCT_QS, group_cols=("step", "event_type"), out_value="latency_s"
    )


def funnel_latency_sql(
    steps: tuple[str, ...] = ("signup", "click", "purchase")
) -> str:
    """DuckDB twin — the funnel_sql chain carrying ``prev`` through
    each stage, nested inside the percentile twin builder."""
    ctes, selects = [], []
    for i, s in enumerate(steps):
        if i == 0:
            ctes.append(
                f"s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM events "
                f"WHERE event_type = '{s}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"s{i + 1} AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t, "
                f"MIN(p.t) AS prev "
                f"FROM events e JOIN s{i} p ON p.user_id = e.user_id "
                f"WHERE e.event_type = '{s}' AND epoch_us(e.ts) >= p.t GROUP BY 1)"
            )
            selects.append(
                f"SELECT {i + 1} AS step, '{s}' AS event_type, "
                f"(t - prev) / 1e6 AS v FROM s{i + 1}"
            )
    src = (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL ".join(selects)
    )
    return percentile_sql(
        src, "v", PCT_QS, group_cols=("step", "event_type"), out_value="latency_s"
    )


def funnel_sql(steps: tuple[str, ...] = ("signup", "click", "purchase")) -> str:
    ctes, selects = [], []
    for i, s in enumerate(steps):
        if i == 0:
            ctes.append(
                f"s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM events "
                f"WHERE event_type = '{s}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"s{i + 1} AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t "
                f"FROM events e JOIN s{i} p ON p.user_id = e.user_id "
                f"WHERE e.event_type = '{s}' AND epoch_us(e.ts) >= p.t GROUP BY 1)"
            )
        selects.append(
            f"SELECT {i + 1} AS step, '{s}' AS event_type, COUNT(*) AS n_users FROM s{i + 1}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


WEEK_US = 7 * 86_400 * 1_000_000


def cohort_retention(
    events: DataFrame, cohort_type: str = "signup"
) -> DataFrame:
    """Weekly cohort retention: users bucketed by their first
    ``cohort_type`` week (absolute weeks since epoch — no global-min
    aggregation, so the bucket id is a pure per-row function), counted
    in every later week they show ANY activity.
    Output: (cohort_week, week_offset, n_users).
    """
    us = event_micros("ts")
    wk = floordiv(us, WEEK_US)
    signup = (
        events.where(F.col("event_type") == cohort_type)
        .select("user_id", wk.alias("w"))
        .groupBy("user_id")
        .agg(F.min("w").alias("cohort_week"))
    )
    activity = events.select("user_id", wk.alias("aw")).distinct()
    return (
        activity.join(signup, "user_id")
        .where(F.col("aw") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            (F.col("aw") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def cohort_retention_sql(cohort_type: str = "signup") -> str:
    # DuckDB's integer // truncates toward zero while the Spark side
    # floordivs (true floor) — they diverge on PRE-EPOCH timestamps, so
    # bucket via float floor (exact: |epoch_us| < 2^53 until year 2255,
    # and the quotient is nowhere near a representability boundary)
    wk = f"CAST(floor(epoch_us(ts) / {WEEK_US}) AS BIGINT)"
    return f"""
WITH signup AS (
  SELECT user_id, MIN({wk}) AS cohort_week
  FROM events WHERE event_type = '{cohort_type}' GROUP BY 1
),
activity AS (SELECT DISTINCT user_id, {wk} AS aw FROM events)
SELECT cohort_week, (aw - cohort_week) AS week_offset, COUNT(*) AS n_users
FROM (
  SELECT DISTINCT a.user_id, s.cohort_week, a.aw
  FROM activity a JOIN signup s ON s.user_id = a.user_id
  WHERE a.aw >= s.cohort_week
)
GROUP BY 1, 2
""".strip()


def events_rollup(events: DataFrame) -> DataFrame:
    """Grouping-sets coverage: ROLLUP(event_type, day) — per-type-day,
    per-type, and grand-total rows in ONE pass (Catalyst expands the
    grouping sets into a single shuffle with a grouping id; null
    grouping columns mark the subtotal levels, same as ANSI ROLLUP)."""
    day = day_str("ts")
    return (
        events.select(F.col("event_type"), day.alias("day"), "value")
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round6(F.sum("value")).alias("sum_value"),
        )
    )


ROLLUP_SQL = """
SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       COUNT(*) AS n_events,
       ROUND(SUM(value) + 1e-09, 6) AS sum_value
FROM events
GROUP BY ROLLUP (event_type, CAST(CAST(ts AS DATE) AS VARCHAR))
""".strip()


def daily_anomaly(events: DataFrame) -> DataFrame:
    """Per-(event_type, day) volume anomaly: the z-score of each day's
    event count against that TYPE's own daily mean/stddev — the
    routine ops check on an ingest pipeline ("did clicks crater on
    Tuesday?").

    Plan: one (type, day) hash aggregate (map-side combining), one
    type-keyed aggregate over DAY-cardinality rows joined back
    (broadcast — #types rows), then pure arithmetic; no windows, no
    ordering, so tied timestamps cannot flake it. Sample stddev in
    both engines; a single-day type (stddev NULL) or a constant type
    (stddev 0) emits NULL z via NULLIF — identically cross-engine."""
    day = day_str("ts")
    daily = (
        events.select("event_type", day.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
        # daily feeds BOTH the stats aggregate and the final join —
        # differently pruned, so unmaterialized the events table is
        # scanned+aggregated twice (the CLAUDE.md multi-consumer
        # class; measured 2 FileScans). The table is #types × #days
        # rows — materialize it.
        .localCheckpoint()
    )
    stats = daily.groupBy("event_type").agg(
        F.avg("n_events").alias("_mu"),
        F.stddev("n_events").alias("_sd"),
    )
    z = (F.col("n_events") - F.col("_mu")) / F.expr("nullif(_sd, 0.0d)")
    return daily.join(F.broadcast(stats), "event_type").select(
        "event_type", "day", "n_events", round6(z).alias("z_score")
    )


DAILY_ANOMALY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, AVG(n_events) AS mu, STDDEV(n_events) AS sd
  FROM daily GROUP BY 1
)
SELECT d.event_type, d.day, CAST(d.n_events AS BIGINT) AS n_events,
       ROUND((d.n_events - st.mu) / NULLIF(st.sd, 0) + 1e-09, 6) AS z_score
FROM daily d JOIN st USING (event_type)
""".strip()


def cumulative_users(events: DataFrame) -> DataFrame:
    """Cumulative distinct users by day ("users ever seen, to date") —
    the scale-safe formulation of a cumulative COUNT(DISTINCT).

    The naive window (`COUNT(DISTINCT user_id) OVER (ORDER BY day)`)
    re-scans every user's whole history per day and needs a global
    ordering over EVENT rows. Instead: each user contributes exactly
    once, at their FIRST-SEEN day (one hash aggregate on user_id);
    first-touch counts collapse to one row per day; the running total
    is a prefix-sum window over DAY-cardinality rows — the only
    ordered window in the plan is bounded by #days, never user or
    event rows. Output: (day, new_users, cum_users).
    """
    day = day_str("ts")
    first = (
        events.select("user_id", day.alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("day"))  # ISO date text: lexicographic == chronological
    )
    daily = first.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


CUMULATIVE_USERS_SQL = """
WITH f AS (
  SELECT user_id, MIN(CAST(CAST(ts AS DATE) AS VARCHAR)) AS day
  FROM events GROUP BY 1
),
d AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY 1)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d
""".strip()


def user_moving_avg(events: DataFrame, frame_rows: int = 3) -> DataFrame:
    """Bounded-frame window aggregate: per user, the moving average of
    ``value`` over the last ``frame_rows`` events in time order —
    partitioned by user_id (per-user local sorts after ONE shuffle,
    never a global window)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-(frame_rows - 1), 0)
    )
    base = events.select(
        "user_id", "event_id", "value", event_micros("ts").alias("us")
    )
    return base.select(
        "user_id", "event_id", round6(F.avg("value").over(w)).alias("moving_avg")
    )


def user_moving_avg_sql(frame_rows: int = 3) -> str:
    return f"""
SELECT user_id, event_id,
       ROUND(AVG(value) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ROWS BETWEEN {frame_rows - 1} PRECEDING AND CURRENT ROW) + 1e-09, 6)
       AS moving_avg
FROM events
""".strip()


def user_sliding_avg(events: DataFrame, window_s: int = 3600) -> DataFrame:
    """TIME-based sliding window aggregate (ANSI RANGE frame): per
    user, the average of ``value`` over the trailing ``window_s``
    seconds INCLUDING the current event — the other half of the
    bounded-frame family (:func:`user_moving_avg` is the ROWS form).
    Same scale shape: one shuffle on user_id, per-user local sorts,
    never a global window. Ties at the same instant share a frame
    (RANGE semantics), so the output is order-independent and
    cross-engine gate-able.
    Output: (user_id, event_id, sliding_avg)."""
    span = window_s * 1_000_000  # microseconds
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-span, 0)
    )
    base = events.select(
        "user_id", "event_id", "value", event_micros("ts").alias("us")
    )
    return base.select(
        "user_id", "event_id", round6(F.avg("value").over(w)).alias("sliding_avg")
    )


def user_sliding_avg_sql(window_s: int = 3600) -> str:
    span = window_s * 1_000_000
    return f"""
SELECT user_id, event_id,
       ROUND(AVG(value) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN {span} PRECEDING AND CURRENT ROW) + 1e-09, 6)
       AS sliding_avg
FROM events
""".strip()


def events_cube(events: DataFrame) -> DataFrame:
    """CUBE(event_type, day): all four grouping sets — (type, day),
    (type), (day), () — in ONE shuffle with a grouping id. The ANSI
    CUBE companion to :func:`events_rollup`, whose ROLLUP lacks the
    day-only subtotal level."""
    day = day_str("ts")
    return (
        events.select("event_type", day.alias("day"), "value")
        .cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round6(F.sum("value")).alias("sum_value"),
        )
    )


CUBE_SQL = """
SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       COUNT(*) AS n_events,
       ROUND(SUM(value) + 1e-09, 6) AS sum_value
FROM events
GROUP BY CUBE (event_type, CAST(CAST(ts AS DATE) AS VARCHAR))
""".strip()


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(events: DataFrame) -> DataFrame:
    """Day × event-type crosstab via ``pivot`` with an EXPLICIT value
    list (an unlisted pivot would scan once just to enumerate values
    and produce non-deterministic output schemas — never do that at
    scale). One hash aggregate; missing combinations are 0.
    Output: (day, n_<type>...)."""
    day = day_str("ts")
    p = (
        events.select(day.alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", list(PIVOT_TYPES))
        .count()
    )
    return p.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in PIVOT_TYPES
        ],
    )


PIVOT_SQL = (
    "SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in PIVOT_TYPES
    )
    + " FROM events GROUP BY 1"
)


PCT_QS = (0.25, 0.5, 0.75, 0.9)


def percentile_array_expr(value_col: str, fractions: tuple[float, ...]):
    """THE Spark-side exact-percentile aggregate (paired with DuckDB
    ``quantile_cont`` — see :func:`percentile_explode` for the
    cross-engine contract). Every consumer of exact quantiles
    (:func:`percentile_explode`, :func:`value_outliers`) MUST build
    its aggregate here so the composition can never drift."""
    qs = ", ".join(str(q) for q in fractions)
    return F.expr(f"percentile({value_col}, array({qs}))")


def quantile_cont_scalar_sql(value_col: str, q: float) -> str:
    """DuckDB scalar twin of one :func:`percentile_array_expr` entry."""
    return f"quantile_cont({value_col}, {q})"


def percentile_explode(
    df: DataFrame,
    value_col: str,
    fractions: tuple[float, ...],
    group_cols: tuple[str, ...] = (),
    out_value: str = "value",
) -> DataFrame:
    """EXACT percentile table ``(*group_cols, q, <out_value>)`` —
    Spark ``percentile`` and DuckDB ``quantile_cont`` share
    linear-interpolation semantics (verified bit-identical on the
    fixture), so this is the ONE cross-engine-sensitive percentile
    kernel (:func:`value_percentiles` and the quality_deciles gate
    both route through it — two copies could drift independently).
    Exact percentiles sort each group — fine for bounded group counts;
    the 100 TB path for high-cardinality groups is
    ``approx_percentile`` (not cross-engine gate-able, its sketch is
    engine-private). A group whose values are all NULL (or an empty
    ungrouped input) yields NO rows — percentile returns NULL and
    posexplode(NULL) emits nothing; :func:`percentile_sql` guards the
    twin to match."""
    agg = percentile_array_expr(value_col, fractions).alias("_p")
    p = df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)
    pos = F.posexplode("_p")
    return p.select(*group_cols, pos).select(
        *group_cols,
        F.element_at(
            F.array(*[F.lit(q) for q in fractions]), F.col("pos") + 1
        ).alias("q"),
        round6("col").alias(out_value),
    )


def percentile_sql(
    source_sql: str,
    value_col: str,
    fractions: tuple[float, ...],
    group_cols: tuple[str, ...] = (),
    out_value: str = "value",
) -> str:
    """DuckDB twin builder for :func:`percentile_explode`. The
    ``u.v IS NOT NULL`` guard is load-bearing: with an empty (or
    all-NULL) input the aggregate still produces one row with p =
    NULL, and the LATERAL zip pads the fraction list against it —
    emitting len(fractions) NULL rows where Spark emits zero (found
    by the r4 review pass on the first UNGROUPED use, where the
    divergence is actually reachable)."""
    from cuda_gis_smoothing_spark.functions.numeric import flit

    qs = ", ".join(str(q) for q in fractions)
    qs_d = ", ".join(flit(q) for q in fractions)
    gsel = "".join(f"{g}, " for g in group_cols)
    gby = f" GROUP BY {', '.join(group_cols)}" if group_cols else ""
    return f"""
WITH src AS ({source_sql}),
g AS (
  SELECT {gsel}quantile_cont({value_col}, [{qs}]) AS p
  FROM src{gby}
)
SELECT {gsel}u.q, ROUND(u.v + 1e-09, 6) AS {out_value}
FROM g, LATERAL (
  SELECT unnest([{qs_d}]) AS q, unnest(p) AS v
) u
WHERE u.v IS NOT NULL
""".strip()


def value_percentiles(events: DataFrame) -> DataFrame:
    """Per-type exact percentiles of ``value`` — see
    :func:`percentile_explode` for the cross-engine contract."""
    return percentile_explode(
        events, "value", PCT_QS, group_cols=("event_type",)
    )


def value_percentiles_sql() -> str:
    return percentile_sql(
        "SELECT * FROM events", "value", PCT_QS, group_cols=("event_type",)
    )


def value_outliers(events: DataFrame) -> DataFrame:
    """Tukey IQR outlier report per event type: values outside
    [q1 − 1.5·IQR, q3 + 1.5·IQR] — the standard first-pass anomaly
    screen on a metric column. Composes the exact percentile kernel
    (q1/q3 bit-identical cross-engine, see :func:`percentile_explode`)
    with one broadcast join back to the events, so the boundary
    doubles both engines compare against are the SAME doubles and the
    comparison can never tie-break differently. Output per type:
    ``(event_type, n_values, q1, q3, n_low, n_high)`` — NULL values
    excluded from both the quantiles and the counts."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    ev = events.where(F.col("value").isNotNull()).select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        percentile_array_expr("value", (0.25, 0.75)).alias("_p")
    ).select(
        "event_type",
        F.element_at("_p", 1).alias("_q1"),
        F.element_at("_p", 2).alias("_q3"),
    )
    lo = F.col("_q1") - 1.5 * (F.col("_q3") - F.col("_q1"))
    hi = F.col("_q3") + 1.5 * (F.col("_q3") - F.col("_q1"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "_q1",
            "_q3",
            (F.col("value") < lo).cast("long").alias("_lo"),
            (F.col("value") > hi).cast("long").alias("_hi"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            round6(F.max("_q1")).alias("q1"),
            round6(F.max("_q3")).alias("q3"),
            F.sum("_lo").cast("long").alias("n_low"),
            F.sum("_hi").cast("long").alias("n_high"),
        )
    )


VALUE_OUTLIERS_SQL = f"""
WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
st AS (
  SELECT event_type,
         {quantile_cont_scalar_sql("value", 0.25)} AS q1,
         {quantile_cont_scalar_sql("value", 0.75)} AS q3
  FROM ev GROUP BY event_type
)
SELECT ev.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       ROUND(MAX(st.q1) + 1e-09, 6) AS q1,
       ROUND(MAX(st.q3) + 1e-09, 6) AS q3,
       CAST(SUM(CASE WHEN ev.value < st.q1 - 1.5 * (st.q3 - st.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN ev.value > st.q3 + 1.5 * (st.q3 - st.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM ev JOIN st USING (event_type)
GROUP BY ev.event_type
""".strip()


def asof_attribute(
    events: DataFrame, left_type: str = "purchase", right_type: str = "click"
) -> DataFrame:
    """As-of join, windowed: attach to each ``left_type`` event the most
    recent ``right_type`` event of the same user at-or-before it
    (inclusive backward match — DuckDB ``ASOF JOIN`` semantics).

    Spark has no ASOF JOIN node; the classic translations are a range
    join (quadratic blowup) or bucketed binary search. This instead
    does ONE shuffle and ZERO joins: union both sides, sort within user
    by (time, side), and carry the last-seen right row forward with
    ``last(..., ignorenulls=True)`` — O(n log n) per user, partition-
    parallel, and the shuffle key is the same user_id every other
    event operator uses. At equal timestamps the right row sorts first
    (inclusive); duplicate right timestamps resolve to the max
    event_id in both engines (the oracle dedupes identically).

    Output: (purchase_id, user_id, click_id, click_value, gap_us) with
    NULL click columns for lefts with no prior right — only time
    DIFFERENCES are emitted, so session-timezone offsets cancel.
    """
    us = event_micros("ts")
    side = (F.col("event_type") == left_type).cast("int")
    base = events.where(F.col("event_type").isin([left_type, right_type])).select(
        "event_id", "user_id", "value", us.alias("us"), side.alias("_side")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "_side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    right_val = lambda c: F.when(F.col("_side") == 0, F.col(c))  # noqa: E731
    carried = (
        base.withColumn("click_id", F.last(right_val("event_id"), True).over(w))
        .withColumn("click_value", F.last(right_val("value"), True).over(w))
        .withColumn("click_us", F.last(right_val("us"), True).over(w))
    )
    return carried.where(F.col("_side") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "click_id",
        "click_value",
        (F.col("us") - F.col("click_us")).alias("gap_us"),
    )


def asof_attribute_sql(left_type: str = "purchase", right_type: str = "click") -> str:
    """DuckDB twin of :func:`asof_attribute` via native ASOF LEFT JOIN
    (right side deduped per (user, ts) to max event_id, matching the
    window order's tie-break)."""
    return f"""
WITH r AS (
  SELECT user_id, ts, event_id AS click_id, value AS click_value
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = '{right_type}'
  ) WHERE rn = 1
),
l AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = '{left_type}'
)
SELECT l.purchase_id, l.user_id, r.click_id, r.click_value,
       CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT) AS gap_us
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
""".strip()


def range_join_followups(
    events: DataFrame,
    src_type: str = "signup",
    dst_type: str = "click",
    window_s: int = 3600,
) -> DataFrame:
    """Range (interval) join: every ``dst_type`` event within
    ``window_s`` seconds at-or-after a ``src_type`` event by the same
    user (bounds inclusive).

    A naive inequality join degenerates to a per-user cross product
    (BroadcastNestedLoop at best). This buckets time by the window
    width: a dst event lands in exactly one bucket, a src event's
    window spans at most two, so replicating the src side twice turns
    the range join into an EQUI join on (user_id, bucket) + a cheap
    residual range filter — shuffle keyed and linear in matches, the
    plan Catalyst can hash-partition (asserted in tests). At 100 TB the
    replication factor stays 2 regardless of data volume or skew.
    """
    width_us = window_s * 1_000_000
    us = event_micros("ts")
    # integer floor-div bucketing: double division + cast truncates
    # (wrong bucket for pre-epoch events) and loses ULPs at very large
    # widths — exact integer arithmetic sidesteps both
    bkt = floordiv(us, width_us)
    src = events.where(F.col("event_type") == src_type).select(
        F.col("event_id").alias("src_id"),
        "user_id",
        us.alias("src_us"),
        F.explode(F.array(bkt, bkt + 1)).alias("bucket"),
    )
    dst = events.where(F.col("event_type") == dst_type).select(
        F.col("event_id").alias("dst_id"),
        "user_id",
        us.alias("dst_us"),
        bkt.alias("bucket"),
    )
    joined = src.join(dst, ["user_id", "bucket"]).where(
        F.col("dst_us").between(F.col("src_us"), F.col("src_us") + width_us)
    )
    return joined.select(
        "src_id", "dst_id", "user_id", (F.col("dst_us") - F.col("src_us")).alias("gap_us")
    )


def range_join_sql(
    src_type: str = "signup", dst_type: str = "click", window_s: int = 3600
) -> str:
    """DuckDB twin as the straightforward inequality join."""
    return f"""
SELECT s.event_id AS src_id, c.event_id AS dst_id, s.user_id,
       CAST(epoch_us(c.ts) - epoch_us(s.ts) AS BIGINT) AS gap_us
FROM events s
JOIN events c
  ON s.user_id = c.user_id
 AND c.ts >= s.ts AND c.ts <= s.ts + INTERVAL {window_s} SECONDS
WHERE s.event_type = '{src_type}' AND c.event_type = '{dst_type}'
""".strip()


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences — the funnel-discovery / clickstream-model primitive
    (``funnel_conversion`` checks a GIVEN path; this surfaces the
    empirical paths). One row per observed (from_type, to_type) pair
    with its count and row-normalized transition probability.

    Determinism: the sequence order is (epoch_us, event_id) — a TOTAL
    order (event_id is unique), so tied timestamps cannot permute the
    lag pairing between engines (the span_coverage window lesson).

    Plan (100 TB): one user-keyed window (hash exchange on user_id +
    per-user sort — the sessionize shape) feeding a #types²-sized hash
    aggregate; the probability normalization is a window over the
    AGGREGATED table (whole-partition frame, O(#types²) rows). p =
    n/total is an integer-over-integer double division — exact and
    identical cross-engine before the round6.
    """
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = events.select(
        "user_id", "event_id", "event_type", event_micros("ts").alias("us")
    ).select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    )
    counts = (
        seq.where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    return transition_probabilities(counts)


def transition_probabilities(counts: DataFrame) -> DataFrame:
    """Row-normalize a (from_type, to_type, n_transitions) count table
    into the transition matrix — THE shared serving kernel: the batch
    operator and the maintained-state read both route here so the
    normalization can never drift (the bm25_score_postings precedent).
    p = n/total is integer-over-integer double division — exact and
    identical cross-engine before the round6."""
    tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        F.col("n_transitions").cast("long").alias("n_transitions"),
        round6(F.col("n_transitions") / F.sum("n_transitions").over(tot)).alias(
            "p_transition"
        ),
    )


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS from_type,
         event_type AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM seq WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type,
       CAST(n AS BIGINT) AS n_transitions,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type) + 1e-09, 6)
         AS p_transition
FROM c
""".strip()


def transition_stationary(
    events: DataFrame, damping: float = 0.85, iters: int = 5
) -> DataFrame:
    """Stationary distribution of the event-type Markov chain — the
    long-run "where does a user session settle" ranking over the
    :func:`event_transitions` matrix, via damped fixed-iteration power
    iteration (the cell_pagerank formulation applied to the events
    family):

        π⁰(t)   = 1 / k
        πᵗ⁺¹(j) = (1 − d) / k  +  d · Σ_i πᵗ(i) · P(i, j)

    State space = event types participating in ≥ 1 observed transition
    (from ∪ to, NULL types excluded — a NULL state can't equi-join its
    twin row); dangling states (no outgoing row) leak their mass, the
    standard simple formulation, identical in the twin.

    Cross-engine: P is the GATED event_transitions table — its round6
    p_transition values are bit-identical in both engines BEFORE the
    iteration (the ivf_silhouette round-first layering), so every
    iterate multiplies/sums identical doubles; per-iteration sums
    aggregate ≤ k ≈ #types doubles (fp-association noise absorbed by
    round6 — the cell_pagerank class). Damping constants flow through
    flit() of the same Python doubles.

    Plan (100 TB): the transition matrix is #types²-sized — tiny
    forever; materialized once (localCheckpoint, ``iters`` consumers)
    with the iteration running on #types-row tables. The one
    corpus-scale job is the event_transitions window+aggregate."""
    return stationary_from_matrix(event_transitions(events), damping, iters)


def stationary_from_matrix(
    tm: DataFrame, damping: float = 0.85, iters: int = 5
) -> DataFrame:
    """The power iteration over a PREPARED (from_type, to_type,
    p_transition) matrix — the shared kernel behind
    :func:`transition_stationary` and
    ``MaintainedTransitions.stationary`` (the
    transition_probabilities precedent: one iteration definition,
    batch and maintained paths cannot drift)."""
    tm = (
        tm.where(F.col("from_type").isNotNull() & F.col("to_type").isNotNull())
        .select("from_type", "to_type", "p_transition")
        .localCheckpoint()  # iters consumers
    )
    types = (
        tm.select(F.col("from_type").alias("t"))
        .union(tm.select("to_type"))
        .distinct()
        .localCheckpoint()  # iters + 1 consumers
    )
    nn = types.agg(F.count(F.lit(1)).alias("_k"))
    pi = types.crossJoin(F.broadcast(nn)).select(
        "t", (F.lit(1.0) / F.col("_k")).alias("_pi")
    )
    teleport = F.lit(1.0 - damping) / F.col("_k")
    for _ in range(iters):
        inb = (
            tm.join(pi.withColumnRenamed("t", "from_type"), "from_type")
            .groupBy("to_type")
            .agg(F.sum(F.col("_pi") * F.col("p_transition")).alias("_s"))
        )
        pi = (
            types.join(inb, types["t"] == inb["to_type"], "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "t",
                (
                    teleport
                    + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
                ).alias("_pi"),
            )
        )
    return pi.select(
        F.col("t").alias("event_type"), round6(F.col("_pi")).alias("stationary_p")
    )


def transition_stationary_sql(damping: float = 0.85, iters: int = 5) -> str:
    """Unrolled fixed-iteration twin of :func:`transition_stationary`,
    COMPOSED over the gated event_transitions SQL (the rrf_fusion
    nesting precedent — one transition-matrix definition) with the
    _pagerank_sql CTE-chain shape."""
    from cuda_gis_smoothing_spark.functions.numeric import flit

    d, omd = flit(damping), flit(1.0 - damping)
    ctes = [
        f"pi0 AS (SELECT t, {flit(1.0)} / nn.k AS pi FROM ty CROSS JOIN nn)"
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""pi{t} AS (
  SELECT ty.t, {omd} / nn.k + {d} * COALESCE(inb.s, {flit(0.0)}) AS pi
  FROM ty CROSS JOIN nn
  LEFT JOIN (
    SELECT tm.to_type AS t2, SUM(p.pi * tm.p_transition) AS s
    FROM tm JOIN pi{t - 1} p ON p.t = tm.from_type
    GROUP BY tm.to_type
  ) inb ON inb.t2 = ty.t
)"""
        )
    chain = ",\n".join(ctes)
    return f"""
WITH tm AS (
  SELECT from_type, to_type, p_transition FROM ({EVENT_TRANSITIONS_SQL})
  WHERE from_type IS NOT NULL AND to_type IS NOT NULL
),
ty AS (
  SELECT DISTINCT t FROM (
    SELECT from_type AS t FROM tm UNION ALL SELECT to_type FROM tm
  )
),
nn AS (SELECT COUNT(*) AS k FROM ty),
{chain}
SELECT t AS event_type, ROUND(pi + 1e-09, 6) AS stationary_p FROM pi{iters}
""".strip()


#: inter-arrival percentile fractions (median + tail)
INTERARRIVAL_QS = (0.5, 0.9)


def event_interarrival(events: DataFrame) -> DataFrame:
    """Per-type inter-arrival statistics: gaps between consecutive
    events of the SAME type for the SAME user (integer microseconds —
    the exact-gap contract shared with sessionize), summarized per
    event_type with count / min / max / mean and exact p50/p90 via
    :func:`percentile_array_expr` (the ONE cross-engine percentile
    kernel). The capacity-planning / bot-detection signal: near-zero
    tails = bursts or automation.

    Plan (100 TB): one (user, type)-keyed window (hash exchange +
    per-group sort), then a #types-sized sort aggregate (exact
    percentiles sort each group — bounded by the type cardinality;
    approx_percentile is the high-cardinality path, engine-private
    sketch, not gate-able). Types with no repeat visits produce no
    row (lag yields all NULLs → filtered).
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    gaps = (
        events.select(
            "user_id", "event_id", "event_type", event_micros("ts").alias("us")
        )
        .select(
            "event_type", (F.col("us") - F.lag("us").over(w)).alias("gap_us")
        )
        .where(F.col("gap_us").isNotNull())
    )
    # mean/percentiles are reported in SECONDS: at microsecond magnitude
    # (~1e11 on year-scale gaps) a 6-decimal round is BELOW one double
    # ulp and the two engines' round paths legally differ in the last
    # ulp; at second magnitude round6 is comfortably above ulp. min/max
    # stay exact integer micros. The /1e6 happens AFTER the division /
    # quantile on both sides, operand-for-operand, so the doubles agree.
    p = percentile_array_expr("gap_us", INTERARRIVAL_QS)
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        round6(F.sum("gap_us") / F.count(F.lit(1)) / F.lit(1e6)).alias("avg_gap_s"),
        round6(F.element_at(p, 1) / F.lit(1e6)).alias("p50_gap_s"),
        round6(F.element_at(p, 2) / F.lit(1e6)).alias("p90_gap_s"),
    )


EVENT_INTERARRIVAL_SQL = f"""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id
         ) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       ROUND(SUM(gap_us) * 1.0 / COUNT(*) / 1000000e0 + 1e-09, 6) AS avg_gap_s,
       ROUND({quantile_cont_scalar_sql("gap_us", INTERARRIVAL_QS[0])} / 1000000e0 + 1e-09, 6) AS p50_gap_s,
       ROUND({quantile_cont_scalar_sql("gap_us", INTERARRIVAL_QS[1])} / 1000000e0 + 1e-09, 6) AS p90_gap_s
FROM g WHERE gap_us IS NOT NULL
GROUP BY event_type
""".strip()


#: session path parameters: opening-path depth and top-k cut
SESSION_PATH_DEPTH = 3
SESSION_PATHS_K = 20
#: NULL event types inside a path render as this token on BOTH engines
#: (Spark array_join and DuckDB string_agg disagree on skipping NULL
#: elements — coalescing BEFORE aggregation sidesteps the divergence)
NULL_PATH_TOKEN = "(null)"


def session_paths(
    events: DataFrame,
    depth: int = SESSION_PATH_DEPTH,
    k: int = SESSION_PATHS_K,
) -> DataFrame:
    """Top-k session-opening paths: the first ``depth`` event types of
    each session (the :func:`session_events` boundaries — identical
    gap semantics to sessionize) joined with '>', counted across
    sessions — the empirical entry-funnel report
    (:func:`event_transitions` aggregates single hops; this keeps
    short sequences intact). Output: (path, n_sessions), top-k.

    Determinism: the per-session ordering is the (us, event_id) total
    order; the ordered concat sorts collected (rn, type) structs (rn
    unique per session — collect order never observable); the k-cut
    total-orders on (n_sessions DESC, path ASC).

    Plan (100 TB): the session windows' one user-keyed shuffle, a
    session-keyed aggregate, a path-keyed count, and a
    TakeOrderedAndProject k-cut (no global sort — the
    vocab_top_tokens shape)."""
    se = session_events(events)
    w = Window.partitionBy("user_id", "session_seq").orderBy("us", "event_id")
    firsts = (
        se.select(
            "user_id",
            "session_seq",
            "us",
            "event_id",
            F.coalesce("event_type", F.lit(NULL_PATH_TOKEN)).alias("_t"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= depth)
    )
    paths = firsts.groupBy("user_id", "session_seq").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(_rn, _t))),"
            " s -> s._t), '>')"
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    return counts.orderBy(F.col("n_sessions").desc(), "path").limit(k)


SESSION_PATHS_SQL = f"""
WITH {_session_ctes("event_type")},
rn AS (
  SELECT user_id, session_seq,
         COALESCE(event_type, '{NULL_PATH_TOKEN}') AS t,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_seq ORDER BY us, event_id) AS rn
  FROM sess
),
paths AS (
  SELECT string_agg(t, '>' ORDER BY rn) AS path
  FROM rn WHERE rn <= {SESSION_PATH_DEPTH}
  GROUP BY user_id, session_seq
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {SESSION_PATHS_K}
""".strip()


#: minimum co-occurring sessions for an affinity pair
AFFINITY_MIN_SUPPORT = 2


def session_event_affinity(
    events: DataFrame, min_support: int = AFFINITY_MIN_SUPPORT
) -> DataFrame:
    """Within-session event-type affinity: for every type pair
    (a < b), the number of sessions containing BOTH and the lift
    ``S·c(ab) / (c(a)·c(b))`` over distinct (session, type) rows —
    :func:`~cuda_gis_smoothing_spark.operators.analytics.basket_part_pairs`
    with sessions as baskets and the :func:`session_events` gap
    boundaries as the basket key (identical SESSION_GAP_US semantics
    to sessionize — the shared-CTE class). All counts exact integers,
    the int64 products bounded by sessions² < 2^62, ONE double
    division under round6. NULL event types drop out of the pair join
    identically in both engines (NULL < x is never true) — by
    construction, not by filter.

    Output: ``(event_a, event_b, n_both, lift)`` for every pair at
    ``min_support`` — the pair universe is #types², so no k-cut is
    needed (unlike the part-pair basket).

    Plan (100 TB): sessionizing is the one user-keyed shuffle; the
    distinct (session, type) table feeds FOUR differently-pruned
    consumers (both self-join sides, type counts, the session count)
    → localCheckpoint (the basket/bm25-postings class); the
    per-session self-join fans out ≤ #types² rows per session."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    min_support = int(min_support)
    st = (
        session_events(events)
        .select("user_id", "session_seq", "event_type")
        .distinct()
        .localCheckpoint()
    )
    n = (
        st.select("user_id", "session_seq")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("_N"))
    )
    tc = st.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    a = st.select("user_id", "session_seq", F.col("event_type").alias("event_a"))
    b = st.select(
        F.col("user_id").alias("_u"),
        F.col("session_seq").alias("_s"),
        F.col("event_type").alias("event_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("user_id") == F.col("_u"))
            & (F.col("session_seq") == F.col("_s"))
            & (F.col("event_a") < F.col("event_b")),
        )
        .groupBy("event_a", "event_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .where(F.col("n_both") >= min_support)
    )
    return (
        pairs.join(
            tc.select(F.col("event_type").alias("event_a"), F.col("_c").alias("_ca")),
            "event_a",
        )
        .join(
            tc.select(F.col("event_type").alias("event_b"), F.col("_c").alias("_cb")),
            "event_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "event_a",
            "event_b",
            "n_both",
            round6(
                (F.col("n_both") * F.col("_N")).cast("double")
                / (F.col("_ca") * F.col("_cb")).cast("double")
            ).alias("lift"),
        )
    )


def session_event_affinity_sql(
    min_support: int = AFFINITY_MIN_SUPPORT,
) -> str:
    """DuckDB twin of :func:`session_event_affinity` — baskets from
    the SHARED :func:`_session_ctes` builder."""
    min_support = int(min_support)
    return f"""
WITH {_session_ctes("event_type")},
st AS (SELECT DISTINCT user_id, session_seq, event_type FROM sess),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS N
      FROM (SELECT DISTINCT user_id, session_seq FROM st)),
tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM st GROUP BY 1),
pairs AS (
  SELECT a.event_type AS event_a, b.event_type AS event_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.session_seq = b.session_seq
   AND a.event_type < b.event_type
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}
)
SELECT event_a, event_b, n_both,
       ROUND(CAST(n_both * N AS DOUBLE) / CAST(ca.c * cb.c AS DOUBLE)
             + 1e-09, 6) AS lift
FROM pairs
JOIN tc ca ON ca.event_type = event_a
JOIN tc cb ON cb.event_type = event_b
CROSS JOIN n
""".strip()


#: RFM quartile fractions (shared by the operator and its twin)
RFM_QS = (0.25, 0.5, 0.75)


def user_rfm(events: DataFrame) -> DataFrame:
    """RFM segmentation: per-user Recency (µs since the user's last
    event, measured from the corpus max — integer differences, exact),
    Frequency (event count) and Monetary (round6 value sum), each
    scored 1–4 against the EXACT corpus quartiles of the per-user
    table, segment = ``r*100 + f*10 + m``. The classic marketing
    segmentation — and the house pattern for making a
    float-thresholded report gate-able: every compared quantity is
    either an integer or a round6 double, and the quartile boundaries
    come from :func:`percentile_array_expr` over those SAME rounded
    values, so both engines compare identical doubles (a raw-float
    threshold could legally flip a user at fp-association distance).
    Recency scores are inverted (most recent = 4).

    Plan (100 TB): one user-keyed hash aggregate, one 1-row quartile
    aggregate over the user table broadcast back — no windows, no
    sorts beyond the bounded percentile groups. NULL values sum to
    NULL monetary only for users with ALL-NULL values (SUM semantics);
    their m-comparison yields NULL > x = false → m_score 1, identical
    in both engines."""
    mx = events.agg(F.max(event_micros("ts")).alias("_mx"))
    m = (
        events.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.min(F.col("_mx") - event_micros("ts")).cast("long").alias("recency_us"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            round6(F.sum("value")).alias("monetary"),
        )
        .localCheckpoint()  # feeds the quartile aggregate AND the scoring
    )
    qs = m.agg(
        percentile_array_expr("recency_us", RFM_QS).alias("_qr"),
        percentile_array_expr("frequency", RFM_QS).alias("_qf"),
        percentile_array_expr("monetary", RFM_QS).alias("_qm"),
    )

    scored = m.crossJoin(F.broadcast(qs)).select(
        "user_id",
        "recency_us",
        "frequency",
        "monetary",
        (F.lit(5) - rfm_axis_score("recency_us", "_qr")).cast("int").alias("r_score"),
        rfm_axis_score("frequency", "_qf").cast("int").alias("f_score"),
        rfm_axis_score("monetary", "_qm").cast("int").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast(
            "int"
        ),
    )


def rfm_axis_score(col: str, q: str):
    """1–4 quartile score column: 1 + #(boundaries strictly exceeded).
    ONE scorer shared by user_rfm and the warehouse customer_rfm (the
    percentile_array_expr precedent — a copy diverged once, dropping
    the NULL guard). coalesce: a NULL axis (all-NULL monetary) must
    score 1 like DuckDB's CASE WHEN NULL THEN..ELSE 0, not NULL."""
    s = F.lit(1)
    for i in range(1, 4):
        s = s + F.coalesce(
            (F.col(col) > F.element_at(F.col(q), i)).cast("int"), F.lit(0)
        )
    return s


def rfm_axis_score_sql(col: str, q: str) -> str:
    """The DuckDB text of :func:`rfm_axis_score` (without the leading
    ``1 +`` — callers embed it as ``1 + {..}`` to mirror the twins'
    existing shape)."""
    return " + ".join(
        f"CASE WHEN {col} > {q}[{i}] THEN 1 ELSE 0 END" for i in (1, 2, 3)
    )


def user_rfm_sql() -> str:
    qs = ", ".join(str(q) for q in RFM_QS)
    cmp = rfm_axis_score_sql
    return f"""
WITH mx AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
m AS (
  SELECT user_id,
         CAST(MIN(mx.mx - epoch_us(ts)) AS BIGINT) AS recency_us,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         ROUND(SUM(value) + 1e-09, 6) AS monetary
  FROM events, mx
  GROUP BY user_id
),
q AS (
  SELECT quantile_cont(recency_us, [{qs}]) AS qr,
         quantile_cont(frequency, [{qs}]) AS qf,
         quantile_cont(monetary, [{qs}]) AS qm
  FROM m
),
s AS (
  SELECT user_id, recency_us, frequency, monetary,
         CAST(5 - (1 + {cmp("recency_us", "qr")}) AS INT) AS r_score,
         CAST(1 + {cmp("frequency", "qf")} AS INT) AS f_score,
         CAST(1 + {cmp("monetary", "qm")} AS INT) AS m_score
  FROM m, q
)
SELECT user_id, recency_us, frequency, monetary, r_score, f_score, m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment
FROM s
""".strip()


_PROPS_KEY_RE = re.compile(r"^[a-z0-9_]+$")
# \A..\z anchors, NOT ^..$ — Java's '$' (Spark rlike) matches before a
# trailing newline while RE2's (DuckDB) is end-of-text, so ^-anchored
# cross-engine gates diverge on newline-terminated values (probed; the
# ASCII_TEXT_RE lesson in operators/dedup.py). Python's re needs \Z —
# translate when using these in a Python oracle.
_PROPS_INT_RE = r"\A-?[0-9]+\z"

# The supported payload envelope: a FLAT JSON object of strictly-valid
# scalar members (strict string escapes, strict number grammar, no
# nesting, no trailing comma). The two engines' parsers disagree
# outside strict JSON — Spark's get_json_object tolerates trailing
# garbage and single-quoted keys that DuckDB's json_valid rejects,
# while DuckDB tolerates trailing commas that Spark rejects (all
# probed) — so BOTH sides gate extraction on this identical regex and
# anything outside the envelope is NULL in both. Nested-structure
# payloads are likewise out of contract BY THE SAME RULE (still NULL
# in both engines, never divergent).
_J_STR = r'"(?:[^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})*"'
_J_NUM = r"-?(?:0|[1-9][0-9]*)(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"
_J_SCALAR = rf"(?:{_J_STR}|{_J_NUM}|true|false|null)"
PROPS_FLAT_OBJECT_RE = (
    rf"\A\{{\s*(?:{_J_STR}\s*:\s*{_J_SCALAR}\s*"
    rf"(?:,\s*{_J_STR}\s*:\s*{_J_SCALAR}\s*)*)?\}}\z"
)


def props_field_stats(events: DataFrame, key: str = "k") -> DataFrame:
    """Per-event-type statistics of an INTEGER field extracted from the
    semi-structured JSON ``props`` column — the engine's semi-structured
    projection surface (schema-on-read over an opaque payload column).

    Cross-engine contract, two gates applied identically on both sides:
    (1) the raw payload must match ``PROPS_FLAT_OBJECT_RE`` — the
    strict flat-object envelope — because the engines' parsers diverge
    on every lenient edge (Spark's get_json_object tolerates trailing
    garbage and single quotes that DuckDB rejects; DuckDB tolerates
    trailing commas that Spark rejects; DuckDB's ``->>`` RAISES on
    malformed input where Spark NULLs — all probed); (2) the extracted
    UNQUOTED value must match an integer regex, because on float
    strings Spark's try_cast-to-long yields NULL while DuckDB's
    TRY_CAST rounds. Only strict-integer values of strict-envelope
    payloads survive; every aggregate is then integer-exact (avg = one
    division of exact integers). try_cast keeps int64-overflow values
    NULL in both engines rather than raising.

    Plan (100 TB): one scan + one hash aggregate keyed on event_type
    (map-side combined); the JSON path never leaves codegen."""
    if not _PROPS_KEY_RE.match(key):  # interpolated into expr + SQL
        raise ValueError(f"invalid props key: {key!r}")
    # project the JSON extraction to a NAMED column first — referencing
    # it twice (regex gate + cast) would parse every row's JSON twice
    # (the CollapseProject expensive-expression class)
    v = F.col("_v")
    kv = F.when(v.rlike(_PROPS_INT_RE), F.expr("try_cast(_v as bigint)"))
    per = events.select(
        "event_type",
        F.when(
            F.col("props").rlike(PROPS_FLAT_OBJECT_RE),
            F.get_json_object(F.col("props"), f"$.{key}"),
        ).alias("_v"),
    ).select("event_type", kv.alias("_kv"))
    return per.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("_kv").cast("long").alias("n_valid"),
        F.min("_kv").alias("k_min"),
        F.max("_kv").alias("k_max"),
        F.sum("_kv").alias("k_sum"),
        round6(
            F.sum("_kv").cast("double") / F.count("_kv").cast("double")
        ).alias("k_avg"),
    )


def props_field_stats_sql(key: str = "k") -> str:
    """DuckDB twin of :func:`props_field_stats` (same regex gate)."""
    if not _PROPS_KEY_RE.match(key):
        raise ValueError(f"invalid props key: {key!r}")
    return f"""
WITH e AS (
  SELECT event_type,
         CASE WHEN props IS NOT NULL
                   AND regexp_matches(props, '{PROPS_FLAT_OBJECT_RE}')
                   AND json_valid(props)
                   AND regexp_matches(props->>'$.{key}', '{_PROPS_INT_RE}')
              THEN TRY_CAST(props->>'$.{key}' AS BIGINT) END AS kv
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(kv) AS BIGINT) AS n_valid,
       CAST(MIN(kv) AS BIGINT) AS k_min,
       CAST(MAX(kv) AS BIGINT) AS k_max,
       CAST(SUM(kv) AS BIGINT) AS k_sum,
       ROUND(CAST(SUM(kv) AS DOUBLE) / CAST(COUNT(kv) AS DOUBLE) + 1e-09, 6) AS k_avg
FROM e
GROUP BY event_type
""".strip()


# -- lag-k autocorrelation of the daily volume series --------------------

AUTOCORR_LAGS = (1, 2, 7)


def event_autocorrelation(
    events: DataFrame, lags: tuple[int, ...] = AUTOCORR_LAGS
) -> DataFrame:
    """Lag-k Pearson autocorrelation of each event type's DAILY count
    series — the seasonality/trend card every ingest dashboard wants
    ("do clicks repeat weekly?" = the lag-7 coefficient). Pairs are
    CALENDAR-lagged: day d correlates with day d+k only when BOTH
    days were observed (absent days are gaps, not zeros — documented
    semantics; a zero-fill variant would need the day spine).

    Exactness: counts and all five moment sums stay BIGINT (Pearson's
    numerator n*Sxy − Sx*Sy is exact integer arithmetic), the
    denominator takes IEEE-exact SQRTs of integer-valued doubles, so
    the only float op is one division — round6 once. Zero-variance
    series (constant counts) yield NULL via NULLIF. Integer bound:
    n_pairs * max_daily_count^2 must stay < 2^62 — fine to ~1e9 days
    x 1e4/day or 1e3 days x 1e9/day; beyond that compute the moments
    in DOUBLE (exact while partial sums < 2^53) — documented, not
    needed at gate scale.

    Plan (100 TB): one (type, day) map-side-combining aggregate
    collapses the corpus to #types x #days rows; the tiny daily table
    is localCheckpoint'ed (TWO differently-projected consumers — the
    multi-consumer re-execute lesson), the lag explode x self equi-join
    and final aggregate all run over day-cardinality data.
    """
    return autocorr_from_daily(daily_counts(events), lags)


def daily_counts(events: DataFrame, key: str = "event_type") -> DataFrame:
    """(key, day DATE, n) — the daily volume table both the batch
    autocorrelation and MaintainedDailyCounts serve from; ``key``
    generalizes it to per-user cards (the burstiness_from_daily
    precedent — ONE daily-count definition)."""
    return events.groupBy(
        key, F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def autocorr_from_daily(
    daily: DataFrame, lags: tuple[int, ...] = AUTOCORR_LAGS
) -> DataFrame:
    """The Pearson kernel over a (event_type, day, n) table — ONE
    shared body so the batch gate and the maintained serving path can
    never drift (the transition_probabilities precedent). NULL days /
    NULL event types never pair (NULL equality) so they cannot affect
    the output whether or not the caller's table carries them."""
    daily = daily.localCheckpoint()  # TWO differently-projected consumers
    lag_arr = F.array(*[F.lit(int(k)) for k in lags])
    x = daily.select(
        "event_type",
        "day",
        F.col("n").alias("nx"),
        F.explode(lag_arr).alias("lag"),
    ).withColumn("jday", F.date_add(F.col("day"), F.col("lag")))
    y = daily.select(
        F.col("event_type").alias("_et"),
        F.col("day").alias("_yday"),
        F.col("n").alias("ny"),
    )
    pairs = x.join(
        y,
        (F.col("event_type") == F.col("_et")) & (F.col("jday") == F.col("_yday")),
        "inner",
    )
    agg = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("nx").alias("sx"),
        F.sum("ny").alias("sy"),
        F.sum(F.col("nx") * F.col("ny")).alias("sxy"),
        F.sum(F.col("nx") * F.col("nx")).alias("sxx"),
        F.sum(F.col("ny") * F.col("ny")).alias("syy"),
    )
    n = F.col("n_pairs")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")) * F.sqrt(
        (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return agg.select(
        "event_type",
        "lag",
        "n_pairs",
        round6(num / F.nullif(den, F.lit(0.0))).alias("autocorr"),
    )


def daily_cte(
    *, null_filter: bool, varchar_day: bool = False, bigint_n: bool = False
) -> str:
    """The ONE ``daily (event_type, day, n)`` CTE text for every
    events-family twin (review catch — six hand-written copies had
    accumulated; the band_union_sql drift-prevention class). Variants
    are explicit parameters: ``null_filter`` (the *_from_daily kernel
    contract drops NULL type/day; the autocorrelation family keeps
    them — NULLs never join a lag pair), ``varchar_day`` (the
    events_rollup date-vs-text normalization) and ``bigint_n``."""
    day = "CAST(CAST(ts AS DATE) AS VARCHAR)" if varchar_day else "CAST(ts AS DATE)"
    n = "CAST(COUNT(*) AS BIGINT)" if bigint_n else "COUNT(*)"
    where = (
        "WHERE ts IS NOT NULL AND event_type IS NOT NULL " if null_filter else ""
    )
    return f"""daily AS (
  SELECT event_type, {day} AS day, {n} AS n
  FROM events {where}GROUP BY 1, 2
)"""


def event_autocorrelation_sql(lags: tuple[int, ...] = AUTOCORR_LAGS) -> str:
    vals = ", ".join(f"({int(k)})" for k in lags)
    return f"""
WITH {daily_cte(null_filter=False, bigint_n=True)},
lags (lag) AS (VALUES {vals}),
pairs AS (
  SELECT x.event_type, l.lag, x.n AS nx, y.n AS ny
  FROM daily x CROSS JOIN lags l
  JOIN daily y ON y.event_type = x.event_type AND y.day = x.day + l.lag
),
m AS (
  SELECT event_type, lag,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(nx) AS BIGINT) AS sx, CAST(SUM(ny) AS BIGINT) AS sy,
         CAST(SUM(nx * ny) AS BIGINT) AS sxy,
         CAST(SUM(nx * nx) AS BIGINT) AS sxx,
         CAST(SUM(ny * ny) AS BIGINT) AS syy
  FROM pairs GROUP BY event_type, lag
)
SELECT event_type, lag, n_pairs,
       ROUND(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
             / NULLIF(SQRT(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                      * SQRT(CAST(n_pairs * syy - sy * sy AS DOUBLE)), 0)
             + 1e-09, 6) AS autocorr
FROM m
""".strip()


def daily_kendall_tau(events: DataFrame) -> DataFrame:
    """Kendall τ-b rank correlation between every pair of event types'
    daily count series — the monotone-association card ("do logins and
    purchases move together day-to-day?") that Pearson autocorrelation
    can't answer across SERIES. Rank statistics over integer counts are
    the twin-exact choice (the daily_trend Theil–Sen lesson: prefer
    rank/median statistics over moment statistics when twinning float
    analytics).

    Series are aligned on days where BOTH types occur (inner join —
    zero-filling the calendar would make absences dominate the rank
    signal; documented contract). For each aligned day pair (i < j):
    concordant when (na_i−na_j)·(nb_i−nb_j) > 0, discordant when < 0;
    τ-b = (C − D) / √((n0 − Tx)·(n0 − Ty)) with n0 the pair count and
    Tx/Ty the pairs tied in each series.

    Exactness: C, D, n0, Tx, Ty are integers; the products and the
    √ arguments are integer-valued doubles (< 2^53 for any daily series
    shorter than ~10^6 days — exact, association-free); ONE guarded
    division under round6. NULL types/days are dropped by the kernel
    contract (daily_counts' consumers all do).

    Plan (100 TB): corpus-scale work is the ONE map-side-combining
    (type, day) aggregate; everything after runs on day-cardinality
    rows (the alignment join fans out ≤ #type-pairs × days, the pair
    join ≤ × days²/2 — days are bounded by the calendar, not the
    corpus). Both joins are equi-joins; the pair join is pinned against
    AQE coalescing (tiny-bytes, superlinear-output — the blocked-dedup
    class)."""
    return kendall_from_daily(daily_counts(events))


def kendall_from_daily(daily: DataFrame) -> DataFrame:
    """The τ-b kernel over a ``(event_type, day, n)`` table — ONE
    shared body so the batch gate and the maintained serving path can
    never drift (the cusum_from_daily precedent). NULL type/day rows
    are dropped HERE (a NULL key can neither align nor order)."""
    daily = daily.where(
        F.col("event_type").isNotNull() & F.col("day").isNotNull()
    )
    daily = daily.localCheckpoint()  # both sides of the alignment join
    a = daily.select(
        F.col("event_type").alias("type_a"), "day", F.col("n").alias("na")
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("_bday"),
        F.col("n").alias("nb"),
    )
    aligned = a.join(
        b,
        (F.col("day") == F.col("_bday")) & (F.col("type_a") < F.col("type_b")),
        "inner",
    ).select("type_a", "type_b", "day", "na", "nb")
    parts = daily.sparkSession.sparkContext.defaultParallelism
    aligned = aligned.localCheckpoint()  # both sides of the pair join
    x = aligned.repartition(parts, "type_a", "type_b").alias("x")
    y = (
        aligned.select(
            "type_a",
            "type_b",
            F.col("day").alias("_yday"),
            F.col("na").alias("_yna"),
            F.col("nb").alias("_ynb"),
        )
        .repartition(parts, "type_a", "type_b")
        .alias("y")
    )
    pairs = x.join(y, ["type_a", "type_b"]).where(F.col("day") < F.col("_yday"))
    dx = F.col("na") - F.col("_yna")
    dy = F.col("nb") - F.col("_ynb")
    agg = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(dx * dy > 0, 1).otherwise(0)).cast("long").alias("n_conc"),
        F.sum(F.when(dx * dy < 0, 1).otherwise(0)).cast("long").alias("n_disc"),
        F.sum(F.when(dx == 0, 1).otherwise(0)).cast("long").alias("_tx"),
        F.sum(F.when(dy == 0, 1).otherwise(0)).cast("long").alias("_ty"),
    )
    den = F.sqrt(
        (F.col("n_pairs") - F.col("_tx")).cast("double")
        * (F.col("n_pairs") - F.col("_ty")).cast("double")
    )
    return agg.select(
        "type_a",
        "type_b",
        "n_pairs",
        "n_conc",
        "n_disc",
        round6(
            (F.col("n_conc") - F.col("n_disc")).cast("double")
            / F.nullif(den, F.lit(0.0))
        ).alias("tau_b"),
    )


def event_type_lift(events: DataFrame, min_support: int = 5) -> DataFrame:
    """Event-type association: lift between every pair of event types
    over USER baskets — "do users who search also purchase?", the
    events-table sibling of basket_part_pairs (same contract: distinct
    (user, type) rows, ``lift(a,b) = N·c(ab)/(c(a)·c(b))``, all exact
    integer counts, ONE double division under round6; int64 bound
    c(ab)·N < 2^62 ⇒ N < 2^31 users — beyond that pre-scale). No k-cut:
    the type alphabet is bounded (≤ dozens), every supported pair is
    reported. Baskets come from the SHARED user_type_counts aggregate
    (NULL user/type dropped there), so the maintained serving path
    (MaintainedUserTypes.type_lift) folds the identical input."""
    return lift_from_user_types(user_type_counts(events), min_support)


def lift_from_user_types(counts: DataFrame, min_support: int = 5) -> DataFrame:
    """The lift kernel over a PREPARED ``(user_id, event_type, _c)``
    count table — ONE shared body so the batch gate and the maintained
    serving path can never drift (the user_entropy_from_counts
    precedent). Basket membership is the table's KEY SET (counts are
    strictly positive by construction in both producers).

    Plan (100 TB): per-user self-join fans out ≤ (#types)² rows per
    user — bounded by the alphabet, never corpus-quadratic; the basket
    table feeds FOUR differently-pruned consumers so it is
    localCheckpoint'ed (the basket_part_pairs class)."""
    ut = counts.select("user_id", "event_type").localCheckpoint()
    a = ut.select(F.col("user_id").alias("_u"), F.col("event_type").alias("type_a"))
    b = ut.select(F.col("user_id").alias("_u2"), F.col("event_type").alias("type_b"))
    pairs = (
        a.join(
            b,
            (F.col("_u") == F.col("_u2")) & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .where(F.col("n_both") >= int(min_support))
    )
    tc = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    n = ut.agg(F.count_distinct(F.col("user_id")).cast("long").alias("_N"))
    return (
        pairs.join(
            F.broadcast(
                tc.select(F.col("event_type").alias("type_a"), F.col("_c").alias("n_a"))
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                tc.select(F.col("event_type").alias("type_b"), F.col("_c").alias("n_b"))
            ),
            "type_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            round6(
                (F.col("n_both") * F.col("_N")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


def event_type_lift_sql(min_support: int = 5) -> str:
    return f"""
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS N FROM ut),
tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM ut GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
  HAVING COUNT(*) >= {int(min_support)}
)
SELECT p.type_a, p.type_b, ca.c AS n_a, cb.c AS n_b, p.n_both,
       ROUND(CAST(p.n_both * n.N AS DOUBLE)
             / CAST(ca.c * cb.c AS DOUBLE) + 1e-09, 6) AS lift
FROM pairs p
JOIN tc ca ON ca.event_type = p.type_a
JOIN tc cb ON cb.event_type = p.type_b
CROSS JOIN n
""".strip()


def daily_runs_test(events: DataFrame) -> DataFrame:
    """Wald–Wolfowitz runs test per event type: is the daily count
    series random around its median, or does it trend/cluster? Days at
    the exact median are excluded (the classic treatment — a median
    day is neither above nor below); runs are counted over the
    remaining day-ordered sign sequence and compared to the
    expectation under exchangeability:

        μ_R = 2·n1·n2/n + 1,   σ²_R = 2·n1·n2·(2·n1·n2 − n) / (n²·(n−1))

    Exactness: daily counts are integers and their median is exact
    dyadic (the value_percentiles lesson), so the ≠/>-median compares
    are exact; R, n1, n2 are integers (the lag runs over the per-type
    DAY order — unique days, a total order); every float-tail operand
    is an integer-valued double (products < 2^53 for series shorter
    than ~10^6 days) in ONE fixed expression shape under round6, with
    GREATEST(·, 0) before the sqrt (the cancellation class) and NULLIF
    guards for degenerate series (n < 2 or a single-sided sequence).

    Plan (100 TB): one map-side (type, day) aggregate; the median, the
    lag window and the final reduce all run over day-cardinality rows
    per type."""
    return runs_from_daily(daily_counts(events))


def runs_from_daily(daily: DataFrame) -> DataFrame:
    """The runs-test kernel over a ``(event_type, day, n)`` table —
    ONE shared body so the batch gate and the maintained serving path
    can never drift (the cusum_from_daily precedent). NULL type/day
    rows are dropped HERE (a NULL ordering key diverges cross-engine —
    the events_cusum lesson)."""
    from pyspark.sql import Window

    daily = daily.where(
        F.col("event_type").isNotNull() & F.col("day").isNotNull()
    )
    daily = daily.localCheckpoint()  # two consumers: median + the series
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("_med")
    )
    s = (
        daily.join(F.broadcast(med), "event_type")
        .where(F.col("n").cast("double") != F.col("_med"))
        .select(
            "event_type",
            "day",
            (F.col("n").cast("double") > F.col("_med")).cast("int").alias("_s"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    runs = s.select(
        "event_type",
        "_s",
        F.when(F.lag("_s").over(w).isNull(), 1)
        .when(F.lag("_s").over(w) != F.col("_s"), 1)
        .otherwise(0)
        .alias("_brk"),
    )
    agg = runs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_used"),
        F.sum("_s").cast("long").alias("n_above"),
        (F.count(F.lit(1)) - F.sum("_s")).cast("long").alias("n_below"),
        F.sum("_brk").cast("long").alias("n_runs"),
    )
    nn = F.col("n_days_used").cast("double")
    p2 = F.lit(2.0) * F.col("n_above").cast("double") * F.col("n_below").cast("double")
    mu = p2 / F.nullif(nn, F.lit(0.0)) + F.lit(1.0)
    var = (
        p2
        * (p2 - nn)
        / F.nullif(nn * nn * (nn - F.lit(1.0)), F.lit(0.0))
    )
    return agg.select(
        "event_type",
        "n_days_used",
        "n_above",
        "n_below",
        "n_runs",
        round6(
            (F.col("n_runs").cast("double") - mu)
            / F.nullif(F.sqrt(F.greatest(var, F.lit(0.0))), F.lit(0.0))
        ).alias("z_score"),
    )


DAILY_RUNS_TEST_SQL = f"""
WITH {daily_cte(null_filter=True, bigint_n=True)},
med AS (
  SELECT event_type, quantile_cont(n, 0.5e0) AS med FROM daily GROUP BY 1
),
s AS (
  SELECT d.event_type, d.day,
         CAST(CAST(d.n AS DOUBLE) > m.med AS INT) AS s
  FROM daily d JOIN med m USING (event_type)
  WHERE CAST(d.n AS DOUBLE) <> m.med
),
r AS (
  SELECT event_type, s,
         CASE WHEN LAG(s) OVER (PARTITION BY event_type ORDER BY day) IS NULL
              THEN 1
              WHEN LAG(s) OVER (PARTITION BY event_type ORDER BY day) <> s
              THEN 1 ELSE 0 END AS brk
  FROM s
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days_used,
         CAST(SUM(s) AS BIGINT) AS n_above,
         CAST(COUNT(*) - SUM(s) AS BIGINT) AS n_below,
         CAST(SUM(brk) AS BIGINT) AS n_runs
  FROM r GROUP BY event_type
)
SELECT event_type, n_days_used, n_above, n_below, n_runs,
       ROUND((CAST(n_runs AS DOUBLE)
              - (2e0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                 / NULLIF(CAST(n_days_used AS DOUBLE), 0) + 1e0))
             / NULLIF(SQRT(GREATEST(
                 2e0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                 * (2e0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                    - CAST(n_days_used AS DOUBLE))
                 / NULLIF(CAST(n_days_used AS DOUBLE) * CAST(n_days_used AS DOUBLE)
                          * (CAST(n_days_used AS DOUBLE) - 1e0), 0), 0e0)), 0)
             + 1e-09, 6) AS z_score
FROM m
""".strip()


DAILY_KENDALL_TAU_SQL = f"""
WITH {daily_cte(null_filter=True, bigint_n=True)},
al AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.day, a.n AS na, b.n AS nb
  FROM daily a JOIN daily b
    ON b.day = a.day AND a.event_type < b.event_type
),
p AS (
  SELECT x.type_a, x.type_b,
         x.na - y.na AS dx, x.nb - y.nb AS dy
  FROM al x JOIN al y
    ON y.type_a = x.type_a AND y.type_b = x.type_b AND x.day < y.day
),
m AS (
  SELECT type_a, type_b,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
         CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
         CAST(SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM p GROUP BY type_a, type_b
)
SELECT type_a, type_b, n_pairs, n_conc, n_disc,
       ROUND(CAST(n_conc - n_disc AS DOUBLE)
             / NULLIF(SQRT(CAST(n_pairs - tx AS DOUBLE)
                           * CAST(n_pairs - ty AS DOUBLE)), 0) + 1e-09, 6)
         AS tau_b
FROM m
""".strip()


# -- robust (median/MAD) daily anomaly ------------------------------------

#: 1 / Phi^-1(3/4): scales MAD to a normal-consistent sigma estimate
ROBUST_Z_CONSISTENCY = 1.4826


def daily_anomaly_robust(events: DataFrame) -> DataFrame:
    """Median/MAD z-score of each (event_type, day) count — the
    outlier-RESISTANT form of :func:`daily_anomaly`: one crater day
    drags a mean/std baseline toward itself (masking), while the
    median/MAD baseline ignores it. robust_z = (n − median) /
    (1.4826 · MAD); an all-constant series (MAD 0) yields NULL.

    Exactness: daily counts are integers, a median of integers is
    integer or x.5 (exactly representable), absolute deviations and
    their median are therefore exact dyadic doubles, and Spark's exact
    percentile() matches DuckDB quantile_cont bit-for-bit (the
    value_percentiles lesson) — so the single round6 division is the
    only fp exposure. The consistency constant is folded ONCE here and
    flit()-ed into the twin.

    Plan (100 TB): one map-side-combining (type, day) aggregate, then
    everything runs over day-cardinality rows — two #types-sized exact
    percentile aggregates broadcast back. Counts never leave integers
    until the final division.
    """
    daily = daily_counts(events).localCheckpoint()
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("_med")
    )
    dev = daily.join(F.broadcast(med), "event_type").select(
        "event_type",
        "day",
        "n",
        "_med",
        F.abs(F.col("n") - F.col("_med")).alias("_ad"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(_ad, 0.5)").alias("_mad")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        F.col("n").alias("n_events"),
        round6(F.col("_med")).alias("median_n"),
        round6(
            (F.col("n") - F.col("_med"))
            / F.nullif(F.lit(ROBUST_Z_CONSISTENCY) * F.col("_mad"), F.lit(0.0))
        ).alias("robust_z"),
    )


def daily_anomaly_robust_sql() -> str:
    from cuda_gis_smoothing_spark.functions.numeric import flit

    c = flit(ROBUST_Z_CONSISTENCY)
    return f"""
WITH {daily_cte(null_filter=False, bigint_n=True)},
med AS (
  SELECT event_type, quantile_cont(n, 0.5) AS _med
  FROM daily GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.day, d.n, m._med,
         ABS(d.n - m._med) AS _ad
  FROM daily d JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(_ad, 0.5) AS _mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(d.day AS VARCHAR) AS day,
       d.n AS n_events,
       ROUND(d._med + 1e-09, 6) AS median_n,
       ROUND((d.n - d._med) / NULLIF({c} * m._mad, 0) + 1e-09, 6) AS robust_z
FROM dev d JOIN mad m USING (event_type)
""".strip()


def cusum_from_daily(daily: DataFrame) -> DataFrame:
    """The CUSUM kernel over a ``(event_type, day, n)`` table — ONE
    shared body so the batch gate and the maintained serving path can
    never drift (the autocorr_from_daily precedent). The running
    deviation sum S_t = Σ_{i≤t}(n_i − μ) is re-expressed as
    ``prefix_t − t·(total/n_days)`` so the CUMULATIVE part is an
    INTEGER window sum — exact under ANY aggregation association
    (DuckDB's segment-tree window combiner vs Spark's running
    accumulator cannot diverge on integers; a float running sum
    COULD, which is why the naive Σ(n−μ) form is banned here) —
    followed by ONE float mul/sub per row (correctly rounded, the
    axis_visibility identical-expression class). |S| peaks at the
    changepoint. NULL days/types are dropped (a NULL ordering key
    sorts NULLS FIRST in Spark, NULLS LAST in DuckDB — it would shift
    every t; the maintained log never stores them). Output
    ``(event_type, day, n_events, cusum)`` with day as DATE TEXT.

    Plan (100 TB): every window is partitioned by event_type over
    #days rows — never event rows (the cumulative_users shape)."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.functions.numeric import round6

    d = daily.where(
        F.col("event_type").isNotNull() & F.col("day").isNotNull()
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = Window.partitionBy("event_type")
    t = F.row_number().over(Window.partitionBy("event_type").orderBy("day"))
    prefix = F.sum("n").over(w)
    total = F.sum("n").over(p)
    nd = F.count(F.lit(1)).over(p)
    cusum = prefix.cast("double") - t * (total.cast("double") / nd)
    return d.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        F.col("n").alias("n_events"),
        round6(cusum).alias("cusum"),
    )


def events_cusum(events: DataFrame) -> DataFrame:
    """CUSUM changepoint curve per event type over the daily-count
    series — one hash aggregate to day cardinality, then the shared
    :func:`cusum_from_daily` kernel."""
    return cusum_from_daily(daily_counts(events))


EVENTS_CUSUM_SQL = f"""
WITH {daily_cte(null_filter=True, varchar_day=True)},
w AS (
  SELECT event_type, day, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS prefix,
         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total,
         COUNT(*) OVER (PARTITION BY event_type) AS nd
  FROM daily
)
SELECT event_type, day, CAST(n AS BIGINT) AS n_events,
       ROUND((CAST(prefix AS DOUBLE) - t * (CAST(total AS DOUBLE) / nd)) + 1e-09, 6) AS cusum
FROM w
""".strip()


#: multi-touch lookback window and the touch channels credited
ATTRIBUTION_WINDOW_S = 7 * 24 * 3600
TOUCH_TYPES = ("click", "view", "signup")


def multitouch_attribution(
    events: DataFrame,
    conv_type: str = "purchase",
    touch_types: tuple[str, ...] = TOUCH_TYPES,
    window_s: int = ATTRIBUTION_WINDOW_S,
) -> DataFrame:
    """Linear multi-touch attribution — the many-touch sibling of
    :func:`asof_attribute` (last-touch): each conversion splits
    1,000,000 micro-credits EQUALLY over its lookback touches (same
    user, strictly before, within ``window_s``) via INTEGER division
    (``1000000 DIV n`` — exact in both engines; a float 1/n credit
    SUMMED per channel is the events_cusum association hazard), and a
    conversion with no touch credits ``(direct)`` in full. Per-channel
    floor loss is < n_conversions/1e6 by construction (documented, not
    hidden). Output ``(channel, n_credited, credit)`` with credit in
    conversions (round6 of micro/1e6; exact doubles below 2^53).

    Plan (100 TB): the range_join_followups bucketing — conversions
    replicate into their window's ≤ 2 buckets, touches land in one, so
    the lookback match is an EQUI join on (user, bucket) + a residual
    integer filter; credits then flow through two hash aggregates."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    width_us = window_s * 1_000_000
    us = event_micros("ts")
    bkt = floordiv(us, width_us)
    conv = events.where(F.col("event_type") == conv_type).select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        us.alias("cus"),
        F.explode(F.array(bkt, bkt - 1)).alias("bucket"),
    )
    touch = events.where(F.col("event_type").isin(list(touch_types))).select(
        F.col("event_type").alias("channel"),
        "user_id",
        us.alias("tus"),
        bkt.alias("bucket"),
    )
    pairs = conv.join(touch, ["user_id", "bucket"]).where(
        (F.col("tus") >= F.col("cus") - width_us) & (F.col("tus") < F.col("cus"))
    )
    per_n = pairs.groupBy("conv_id").agg(F.count(F.lit(1)).alias("_n"))
    credit = pairs.join(per_n, "conv_id").select(
        "channel", F.expr("CAST(1000000 DIV _n AS BIGINT)").alias("_micro")
    )
    by_channel = credit.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_credited"),
        F.sum("_micro").alias("_ms"),
    )
    direct = (
        conv.select("conv_id")
        .distinct()
        .join(per_n.select("conv_id"), "conv_id", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_credited"))
        .select(
            F.lit("(direct)").alias("channel"),
            "n_credited",
            (F.col("n_credited") * 1_000_000).alias("_ms"),
        )
        .where(F.col("n_credited") > 0)
    )
    return by_channel.unionByName(direct).select(
        "channel",
        "n_credited",
        round6(F.col("_ms").cast("double") / 1_000_000).alias("credit"),
    )


def multitouch_attribution_sql(
    conv_type: str = "purchase",
    touch_types: tuple[str, ...] = TOUCH_TYPES,
    window_s: int = ATTRIBUTION_WINDOW_S,
) -> str:
    """DuckDB twin — the straightforward inequality join over the same
    integer micro-credits."""
    width_us = window_s * 1_000_000
    types = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, epoch_us(ts) AS cus
  FROM events WHERE event_type = '{conv_type}'
),
touch AS (
  SELECT event_type AS channel, user_id, epoch_us(ts) AS tus
  FROM events WHERE event_type IN ({types})
),
pairs AS (
  SELECT c.conv_id, t.channel
  FROM conv c JOIN touch t ON t.user_id = c.user_id
   AND t.tus >= c.cus - {width_us} AND t.tus < c.cus
),
pern AS (SELECT conv_id, COUNT(*) AS n FROM pairs GROUP BY 1),
credit AS (
  SELECT p.channel, 1000000 // n.n AS micro
  FROM pairs p JOIN pern n USING (conv_id)
),
bych AS (
  SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_credited, SUM(micro) AS ms
  FROM credit GROUP BY 1
),
direct AS (
  SELECT '(direct)' AS channel, CAST(COUNT(*) AS BIGINT) AS n_credited,
         COUNT(*) * 1000000 AS ms
  FROM conv c WHERE NOT EXISTS (SELECT 1 FROM pern p WHERE p.conv_id = c.conv_id)
  HAVING COUNT(*) > 0
)
SELECT channel, n_credited,
       ROUND(CAST(ms AS DOUBLE) / 1000000 + 1e-09, 6) AS credit
FROM (SELECT * FROM bych UNION ALL SELECT * FROM direct)
""".strip()


def trend_from_daily(daily_tbl: DataFrame) -> DataFrame:
    """The Theil–Sen kernel over a ``(event_type, day, n)`` table —
    ONE shared body for the batch gate and the maintained serving path
    (the cusum_from_daily shape): MEDIAN of all pairwise slopes
    (n_j − n_i)/(d_j − d_i) — the outlier-resistant alternative to OLS
    (whose sum-of-products accumulation is a cross-engine association
    hazard; a median of exact values is not). Each slope is an
    integer-over-integer double division (correctly rounded
    identically) and the exact percentile kernel is bit-identical
    cross-engine (value_percentiles precedent), including the
    even-count midpoint (a+b)/2. NULL days/types dropped (the
    maintained-log contract). Output ``(event_type, n_days, n_pairs,
    theil_sen_slope)`` in events/day per day.

    Plan (100 TB): the pair self-join is per-type over DAY-cardinality
    rows — bounded by the calendar span squared (~decades ⇒ ~10⁷ pairs
    per type), never event rows."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    daily = (
        daily_tbl.where(
            F.col("event_type").isNotNull() & F.col("day").isNotNull()
        )
        .select(
            "event_type",
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).alias("d"),
            "n",
        )
        .localCheckpoint()  # both sides of the pair join consume it
    )
    b = daily.select(
        F.col("event_type").alias("event_type"),
        F.col("d").alias("_db"),
        F.col("n").alias("_nb"),
    )
    pairs = daily.join(b, "event_type").where(F.col("_db") > F.col("d"))
    stats = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr(
            "percentile(CAST(_nb - n AS DOUBLE) / (_db - d), array(0.5))"
        )[0].alias("_med"),
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    return nd.join(stats, "event_type", "left").select(
        "event_type",
        "n_days",
        F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
        round6(F.col("_med")).alias("theil_sen_slope"),
    )


def daily_trend(events: DataFrame) -> DataFrame:
    """Theil–Sen robust trend per event type — one hash aggregate to
    day cardinality, then the shared :func:`trend_from_daily` kernel."""
    return trend_from_daily(daily_counts(events))


DAILY_TREND_SQL = f"""
WITH {daily_cte(null_filter=True)},
dix AS (
  SELECT event_type, (day - DATE '1970-01-01') AS d, n FROM daily
),
pairs AS (
  SELECT a.event_type,
         CAST(b.n - a.n AS DOUBLE) / (b.d - a.d) AS slope
  FROM dix a JOIN dix b ON b.event_type = a.event_type AND b.d > a.d
),
st AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         quantile_cont(slope, 0.5) AS med
  FROM pairs GROUP BY 1
),
nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM dix GROUP BY 1)
SELECT nd.event_type, nd.n_days,
       CAST(COALESCE(st.n_pairs, 0) AS BIGINT) AS n_pairs,
       ROUND(st.med + 1e-09, 6) AS theil_sen_slope
FROM nd LEFT JOIN st USING (event_type)
""".strip()


def seasonality_from_daily(daily: DataFrame) -> DataFrame:
    """The weekday-profile kernel over a (event_type, day, n) table —
    ONE shared body for the batch gate and the MaintainedDailyCounts
    serving path (the cusum_from_daily drift-prevention shape).
    ``dow`` is the EPOCH-ANCHORED weekday ``datediff(day, 1970-01-01)
    % 7`` (0 = Thursday): engine weekday functions disagree on week
    start and numbering (Spark dayofweek is 1=Sunday, DuckDB dayofweek
    0=Sunday with locale-shaped cousins), while integer day arithmetic
    is identical everywhere — the event_interarrival integerize lesson
    applied to calendars. NULL type/day rows are dropped (the
    *_from_daily kernel contract). The share window runs over the
    #types x 7 aggregate, never event rows. Output
    ``(event_type, dow, n_events, share)``."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.functions.numeric import round6

    d = daily.where(
        F.col("event_type").isNotNull() & F.col("day").isNotNull()
    )
    per = d.groupBy(
        "event_type",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 7
        )
        .cast("int")
        .alias("dow"),
    ).agg(F.sum("n").cast("long").alias("n_events"))
    w = Window.partitionBy("event_type")
    return per.select(
        "event_type",
        "dow",
        "n_events",
        round6(
            F.col("n_events").cast("double") / F.sum("n_events").over(w)
        ).alias("share"),
    )


def events_seasonality(events: DataFrame) -> DataFrame:
    """Day-of-week seasonality profile per event type — the batch
    gate: :func:`daily_counts` into the shared
    :func:`seasonality_from_daily` kernel."""
    return seasonality_from_daily(daily_counts(events))


def burstiness_from_daily(
    daily: DataFrame, key: str = "event_type"
) -> DataFrame:
    """Per-type burstiness (Fano factor / index of dispersion of the
    daily volume) over a (event_type, day, n) table — the
    dispersion-card sibling of the autocorrelation/seasonality
    kernels (Fano ≈ 1 → Poisson-like arrivals; ≫ 1 → bursty).

    The calendar span [min_day, max_day] is zero-filled FOR FREE: days
    without events contribute 0 to both Σn and Σn², so only the span
    length enters the moments — no day explode, no join. Population
    variance/mean collapses to ONE exact integer ratio:

        fano = (d·Σn² − (Σn)²) / (d·Σn),   d = span days

    all-integer until the single division under round6 (the
    quality_mannwhitney integerize-the-moments preference). Bound:
    d·Σn² must stay < 2^63 (the lang_source_chi2 class — at corpus
    scale widen to DECIMAL). NULL type/day rows are dropped (the
    *_from_daily kernel contract). Output ``(event_type, n_days,
    n_active_days, total_events, mean_daily, fano_factor)``."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    d = daily.where(F.col(key).isNotNull() & F.col("day").isNotNull())
    agg = d.groupBy(key).agg(
        (F.datediff(F.max("day"), F.min("day")) + 1)
        .cast("long")
        .alias("n_days"),
        F.count(F.lit(1)).cast("long").alias("n_active_days"),
        F.sum("n").cast("long").alias("total_events"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("_q"),
    )
    return agg.select(
        key,
        "n_days",
        "n_active_days",
        "total_events",
        round6(F.col("total_events") / F.col("n_days")).alias("mean_daily"),
        round6(
            (
                F.col("n_days") * F.col("_q")
                - F.col("total_events") * F.col("total_events")
            )
            / (F.col("n_days") * F.col("total_events"))
        ).alias("fano_factor"),
    )


def events_burstiness(events: DataFrame) -> DataFrame:
    """Per-type Fano-factor dispersion card — the batch gate:
    :func:`daily_counts` into the shared :func:`burstiness_from_daily`
    kernel."""
    return burstiness_from_daily(daily_counts(events))


EVENTS_BURSTINESS_SQL = f"""
WITH {daily_cte(null_filter=True)},
m AS (
  SELECT event_type,
         CAST(date_diff('day', MIN(day), MAX(day)) + 1 AS BIGINT) AS nd,
         CAST(COUNT(*) AS BIGINT) AS nad,
         CAST(SUM(n) AS BIGINT) AS s,
         CAST(SUM(n * n) AS BIGINT) AS q
  FROM daily GROUP BY event_type
)
SELECT event_type, nd AS n_days, nad AS n_active_days, s AS total_events,
       ROUND(s * 1.0 / nd + 1e-09, 6) AS mean_daily,
       ROUND((nd * q - s * s) * 1.0 / (nd * s) + 1e-09, 6) AS fano_factor
FROM m
""".strip()


def user_burstiness(events: DataFrame) -> DataFrame:
    """Per-USER Fano-factor dispersion card — the bot/regularity
    screen (scripted traffic posts metronome-regular daily volumes,
    fano << 1; organic humans are over-dispersed, fano >= 1): the
    shared :func:`burstiness_from_daily` kernel keyed by user over
    per-(user, day) counts, each user's calendar span zero-filled for
    free by the same only-the-span-enters argument. All-integer
    moments, one exact division under round6 — tie-proof. NULL
    user/day rows dropped (kernel contract). Output ``(user_id,
    n_days, n_active_days, total_events, mean_daily, fano_factor)``.

    Plan (100 TB): two user-keyed partial-agg shuffles (the second
    reuses the first's partitioning), no windows, no joins — the
    user_event_entropy shape."""
    return burstiness_from_daily(
        daily_counts(events, key="user_id"), key="user_id"
    )


USER_BURSTINESS_SQL = """
WITH udaily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2
),
m AS (
  SELECT user_id,
         CAST(date_diff('day', MIN(day), MAX(day)) + 1 AS BIGINT) AS nd,
         CAST(COUNT(*) AS BIGINT) AS nad,
         CAST(SUM(n) AS BIGINT) AS s,
         CAST(SUM(n * n) AS BIGINT) AS q
  FROM udaily GROUP BY user_id
)
SELECT user_id, nd AS n_days, nad AS n_active_days, s AS total_events,
       ROUND(s * 1.0 / nd + 1e-09, 6) AS mean_daily,
       ROUND((nd * q - s * s) * 1.0 / (nd * s) + 1e-09, 6) AS fano_factor
FROM m
""".strip()


EVENTS_SEASONALITY_SQL = f"""
WITH {daily_cte(null_filter=True)},
per AS (
  SELECT event_type,
         CAST(((day - DATE '1970-01-01') % 7) AS INT) AS dow,
         SUM(n) AS n_events
  FROM daily GROUP BY 1, 2
)
SELECT event_type, dow, CAST(n_events AS BIGINT) AS n_events,
       ROUND((CAST(n_events AS DOUBLE)
              / SUM(n_events) OVER (PARTITION BY event_type)) + 1e-09, 6) AS share
FROM per
""".strip()


def user_event_entropy(events: DataFrame) -> DataFrame:
    """Per-user behavioral diversity card: Shannon entropy (nats) of
    the user's event-type distribution plus totals — the events-table
    sibling of ``doc_token_entropy`` (low entropy = single-action bots
    / scripted traffic; high entropy = diverse organic usage). Entropy
    uses the same one-pass stable form ``ln(n) − Σ c·ln(c) / n`` over
    per-(user, type) counts; ln is the doc_logprob ≤1-ulp class under
    round6, and the Σ runs over ≤ |event types| terms per user. NULL
    user_id / event_type rows are excluded (a NULL key cannot equi-join
    its twin row — the kmv_error_report contract).

    Plan (100 TB): two partial-agg hash shuffles, both keyed by user
    so the second reuses the first's partitioning; no windows, no
    joins."""
    return user_entropy_from_counts(user_type_counts(events))


def user_type_counts(events: DataFrame) -> DataFrame:
    """The per-(user, type) count table ``(user_id, event_type, _c)``
    behind :func:`user_event_entropy` — shared with the maintained log
    (``streaming/user_stats.py``) so batch and incremental paths fold
    the identical aggregate."""
    return (
        events.where(
            F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
        )
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("_c"))
    )


def user_entropy_from_counts(counts: DataFrame) -> DataFrame:
    """The entropy rollup over a PREPARED ``(user_id, event_type, _c)``
    table — ONE kernel for the batch gate and the maintained serve
    (the *_from_daily precedent)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    return counts.groupBy("user_id").agg(
        F.sum("_c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        round6(
            F.log(F.sum("_c")) - F.sum(F.col("_c") * F.log("_c")) / F.sum("_c")
        ).alias("type_entropy"),
    )


USER_EVENT_ENTROPY_SQL = """
WITH uec AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT user_id,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c) + 1e-09, 6) AS type_entropy
FROM uec
GROUP BY user_id
""".strip()


def user_activity_zipf(events: DataFrame) -> DataFrame:
    """Power-law fit of the user-activity distribution: the corpus
    Zipf regression (`functions/text.py::zipf_fit_from_counts` — ONE
    rank/regression kernel) run over per-user event counts instead of
    token counts. Web activity is classically Zipf-like; the slope is
    the concentration diagnostic (steep = a few power users dominate —
    the measurement step before salting user-keyed jobs, beside
    key_skew_report's gini). One summary row:
    (n_users, n_events, activity_slope, activity_intercept). NULL
    user_id excluded (the entropy-gate contract).

    Plan (100 TB): one user-keyed partial-agg shuffle to the count
    table (users-sized, localCheckpoint'ed — it feeds the rank stage's
    differently-pruned subplans, the multi-consumer class), then the
    shared partition-parallel rank + 1-row regression."""
    from cuda_gis_smoothing_spark.functions.text import zipf_fit_from_counts

    counts = (
        events.where(F.col("user_id").isNotNull())
        .groupBy(F.col("user_id").alias("t"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()
    )
    return zipf_fit_from_counts(counts).select(
        F.col("n_vocab").alias("n_users"),
        F.col("n_occurrences").alias("n_events"),
        F.col("zipf_slope").alias("activity_slope"),
        F.col("zipf_intercept").alias("activity_intercept"),
    )


def user_activity_zipf_sql() -> str:
    """DuckDB twin of :func:`user_activity_zipf` — the shared zipf
    twin builder over the per-user count CTE, columns renamed to the
    activity domain."""
    from cuda_gis_smoothing_spark.functions.text import zipf_sql_from_counts

    inner = zipf_sql_from_counts(
        """c AS (
  SELECT user_id AS t, COUNT(*) AS c
  FROM events
  WHERE user_id IS NOT NULL
  GROUP BY 1
)"""
    )
    return f"""
SELECT n_vocab AS n_users,
       n_occurrences AS n_events,
       zipf_slope AS activity_slope,
       zipf_intercept AS activity_intercept
FROM ({inner})
""".strip()


def active_users_weekly(events: DataFrame) -> DataFrame:
    """DAU/WAU stickiness — the standard product-analytics engagement
    card: per epoch-anchored integer week (days-since-epoch DIV 7 —
    engine week functions disagree on week start/numbering, the
    events_seasonality lesson), weekly active users, the number of
    active days, mean daily active users (exact integer ratio) and
    stickiness = avg_dau / wau (division of a round6 double by an
    integer — one correctly-rounded op). NULL ts / user_id excluded.
    Output ``(week, n_active_days, wau, avg_dau, stickiness)``.

    Plan (100 TB): two distinct-aggregates keyed by (week[, day]) —
    both expand to partial-agg shuffles on bounded keys; no windows,
    one week-keyed join."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    base = events.where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("_days"),
        "user_id",
    )
    tagged = base.select(
        F.expr("_days div 7").cast("long").alias("week"), "_days", "user_id"
    )
    dau = (
        tagged.groupBy("week", "_days")
        .agg(F.countDistinct("user_id").alias("_dau"))
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active_days"),
            F.sum("_dau").cast("long").alias("_sdau"),
        )
    )
    wau = tagged.groupBy("week").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return dau.join(wau, "week").select(
        "week",
        "n_active_days",
        "wau",
        round6(F.col("_sdau").cast("double") / F.col("n_active_days")).alias(
            "avg_dau"
        ),
        round6(
            (F.col("_sdau").cast("double") / F.col("n_active_days"))
            / F.col("wau")
        ).alias("stickiness"),
    )


ACTIVE_USERS_WEEKLY_SQL = """
WITH au AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS days,
         user_id
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
au2 AS (SELECT days // 7 AS week, days, user_id FROM au),
dau AS (
  SELECT week, days, COUNT(DISTINCT user_id) AS d FROM au2 GROUP BY 1, 2
),
dwk AS (
  SELECT week, CAST(COUNT(*) AS BIGINT) AS n_active_days,
         CAST(SUM(d) AS BIGINT) AS sdau
  FROM dau GROUP BY week
),
wwk AS (
  SELECT week, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM au2 GROUP BY week
)
SELECT CAST(d.week AS BIGINT) AS week, d.n_active_days, w.wau,
       ROUND(CAST(d.sdau AS DOUBLE) / d.n_active_days + 1e-09, 6) AS avg_dau,
       ROUND((CAST(d.sdau AS DOUBLE) / d.n_active_days) / w.wau + 1e-09, 6) AS stickiness
FROM dwk d JOIN wwk w ON w.week = d.week
""".strip()


def session_bounce(events: DataFrame) -> DataFrame:
    """Bounce-rate card per session ENTRY type — "which landing event
    loses the user immediately": for each first-event-of-session type,
    the session count, single-event (bounce) count, bounce rate and
    mean session length. Output ``(entry_type, n_sessions, n_bounces,
    bounce_rate, avg_events)``.

    Shares :func:`session_events`' gap boundaries (one SESSION_GAP_US
    definition) and the (us, event_id) total order; the entry type is
    a struct-MIN argmin over that order (no second window sort), so
    ties cannot exist and the card is integer-exact — both rates are
    single exact integer ratios under round6. NULL entry types ride
    the shared NULL_PATH_TOKEN sentinel (the session_paths contract).

    Plan (100 TB): the session window's one user-keyed shuffle → a
    (user, session) aggregate → a type-keyed aggregate."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    se = session_events(events)
    per = (
        se.select(
            "user_id",
            "session_seq",
            "us",
            "event_id",
            F.coalesce("event_type", F.lit(NULL_PATH_TOKEN)).alias("_t"),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.min(F.struct("us", "event_id", "_t"))["_t"].alias("_entry"),
        )
    )
    n_sessions = F.count(F.lit(1))
    n_bounces = F.sum(F.when(F.col("_n") == 1, 1).otherwise(0))
    return per.groupBy(F.col("_entry").alias("entry_type")).agg(
        n_sessions.cast("long").alias("n_sessions"),
        n_bounces.cast("long").alias("n_bounces"),
        round6(
            n_bounces.cast("double") / n_sessions.cast("double")
        ).alias("bounce_rate"),
        round6(
            F.sum("_n").cast("double") / n_sessions.cast("double")
        ).alias("avg_events"),
    )


SESSION_BOUNCE_SQL = f"""
WITH {_session_ctes("event_type")},
rn AS (
  SELECT user_id, session_seq,
         COALESCE(event_type, '{NULL_PATH_TOKEN}') AS t,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_seq ORDER BY us, event_id) AS rn
  FROM sess
),
cnt AS (
  SELECT user_id, session_seq, CAST(COUNT(*) AS BIGINT) AS n
  FROM sess GROUP BY user_id, session_seq
),
per AS (
  SELECT r.t AS entry, c.n
  FROM rn r JOIN cnt c USING (user_id, session_seq)
  WHERE r.rn = 1
)
SELECT entry AS entry_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) + 1e-09, 6) AS bounce_rate,
       ROUND(CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 1e-09, 6)
         AS avg_events
FROM per GROUP BY entry
""".strip()
