"""As-of join semantics pinned on hand-built rows: inclusive backward
match, max-event_id tie-break on duplicate right timestamps, NULL for
no-prior-match — plus the plan contract (zero join nodes, one shuffle).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.events import asof_attribute

T0 = dt.datetime(2024, 1, 1)


def _ev(eid, sec, uid, etype, value):
    return (eid, T0 + dt.timedelta(seconds=sec), uid, etype, value, "{}")


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: click@10 (two rows, tie on ts), purchase@10 (inclusive),
        # purchase@5 (no prior click), click@20, purchase@25
        _ev(1, 10, 1, "click", 1.0),
        _ev(2, 10, 1, "click", 2.0),  # same ts, higher id must win
        _ev(3, 10, 1, "purchase", 9.0),
        _ev(4, 5, 1, "purchase", 9.0),
        _ev(5, 20, 1, "click", 3.0),
        _ev(6, 25, 1, "purchase", 9.0),
        # user 2: purchase only — never attributed
        _ev(7, 30, 2, "purchase", 9.0),
        # noise type is ignored entirely
        _ev(8, 1, 1, "view", 0.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_asof_semantics(spark, events):
    got = {
        r["purchase_id"]: r.asDict()
        for r in asof_attribute(events).collect()
    }
    assert set(got) == {3, 4, 6, 7}
    assert got[3]["click_id"] == 2 and got[3]["gap_us"] == 0  # inclusive + tie→max id
    assert got[3]["click_value"] == 2.0
    assert got[4]["click_id"] is None and got[4]["gap_us"] is None
    assert got[6]["click_id"] == 5 and got[6]["gap_us"] == 5_000_000
    assert got[7]["click_id"] is None


def test_asof_plan_has_no_join_and_one_shuffle(spark, events):
    plan = asof_attribute(events)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # windowed carry-forward, not a join
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_semantics_and_plan(spark, events):
    from cuda_gis_smoothing_spark.operators.events import range_join_followups

    ev = events.withColumn(
        "event_type",
        F.when(F.col("event_id") == 4, F.lit("signup")).otherwise(F.col("event_type")),
    )
    # event 4 is user 1 at t=5s: clicks at 10,10,20 fall in [5, 5+15]
    out = range_join_followups(ev, "signup", "click", window_s=15)
    got = sorted((r["src_id"], r["dst_id"], r["gap_us"]) for r in out.collect())
    assert got == [(4, 1, 5_000_000), (4, 2, 5_000_000), (4, 5, 15_000_000)]

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "hashpartitioning(user_id" in plan or "SortMergeJoin" in plan or "HashJoin" in plan


def test_approx_percentile_tracks_exact(spark):
    """The documented 100 TB path for high-cardinality percentile
    groups: approx_percentile (t-digest-style sketch, engine-private so
    never oracle-gated) must land within 1% accuracy of the exact
    per-group percentiles on the fixture."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    exact = {
        (r["event_type"], i): v
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.25, 0.5, 0.9))").alias("p"))
        .collect()
        for i, v in enumerate(r["p"])
    }
    approx = {
        (r["event_type"], i): v
        for r in ev.groupBy("event_type")
        .agg(
            F.expr(
                "approx_percentile(value, array(0.25, 0.5, 0.9), 10000)"
            ).alias("p")
        )
        .collect()
        for i, v in enumerate(r["p"])
    }
    assert approx.keys() == exact.keys()
    spread = max(exact.values()) - min(exact.values())
    for k, v in exact.items():
        assert abs(approx[k] - v) <= 0.01 * spread + 1e-9, (k, v, approx[k])


def test_cumulative_users_multiday_prefix_sum(spark):
    """The parity fixture spans too few days to exercise the running
    total (1-2 rows) — pin the prefix-sum window on a synthetic
    multi-day corpus vs a pure-Python recomputation."""
    import datetime as dt

    from cuda_gis_smoothing_spark.operators.events import cumulative_users

    T0 = dt.datetime(2026, 3, 1)
    rows = []
    eid = 0
    first_day = {}
    for u in range(40):
        for d in sorted({u % 7, (u * 3) % 11, 5 + u % 4}):
            eid += 1
            rows.append((eid, T0 + dt.timedelta(days=d, hours=u % 24), u, "click", 1.0))
            first_day.setdefault(u, d)
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {
        (r["day"], r["new_users"], r["cum_users"])
        for r in cumulative_users(ev).collect()
    }
    per_day = {}
    for u, d in first_day.items():
        per_day[d] = per_day.get(d, 0) + 1
    cum, want = 0, set()
    for d in sorted(per_day):
        cum += per_day[d]
        day = (T0 + dt.timedelta(days=d)).strftime("%Y-%m-%d")
        want.add((day, per_day[d], cum))
    assert got == want and len(want) >= 5


def test_event_autocorrelation_matches_numpy(spark):
    """Numpy differential: calendar-lag Pearson over an irregular day
    span (gaps excluded, not zero-filled), plus the zero-variance NULL
    branch (a constant-count type has autocorr NULL, not 0/0)."""
    import numpy as np

    from cuda_gis_smoothing_spark.operators.events import (
        event_autocorrelation,
    )

    # type 'a': counts over days 0..9 with day 4 missing; type 'b':
    # constant 2 events/day over days 0..5 (zero variance)
    a_counts = {0: 3, 1: 1, 2: 4, 3: 1, 5: 5, 6: 9, 7: 2, 8: 6, 9: 5}
    rows, eid = [], 0
    for d, c in a_counts.items():
        for _ in range(c):
            rows.append((eid, T0 + dt.timedelta(days=d), 1, "a", 0.0, "{}"))
            eid += 1
    for d in range(6):
        for _ in range(2):
            rows.append((eid, T0 + dt.timedelta(days=d), 1, "b", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r.event_type, r.lag): (r.n_pairs, r.autocorr)
        for r in event_autocorrelation(df, lags=(1, 2, 7)).collect()
    }
    for lag in (1, 2, 7):
        xs = [
            (a_counts[d], a_counts[d + lag])
            for d in a_counts
            if d + lag in a_counts
        ]
        n_pairs, r = got[("a", lag)]
        assert n_pairs == len(xs)
        x = np.array([p[0] for p in xs], dtype=float)
        y = np.array([p[1] for p in xs], dtype=float)
        want = np.corrcoef(x, y)[0, 1]
        assert abs(r - want) < 1e-6, (lag, r, want)
    # constant series: variance 0 -> NULL in every lag it appears at
    for lag in (1, 2):
        n_pairs, r = got[("b", lag)]
        assert n_pairs == 6 - lag and r is None
    assert ("b", 7) not in got  # span too short for lag 7: no pairs


def test_robust_anomaly_resists_masking(spark):
    """The operator's reason to exist: one extreme crater day inflates
    a mean/std baseline enough to mask itself (|classic z| stays
    small-ish) while the median/MAD z-score still flags it hard."""
    from cuda_gis_smoothing_spark.operators.events import (
        daily_anomaly,
        daily_anomaly_robust,
    )

    # 20 quiet days of ~100 events, one day with 2000
    counts = {d: 100 + (d % 3) for d in range(20)}
    counts[20] = 2000
    rows, eid = [], 0
    for d, c in counts.items():
        for _ in range(c):
            rows.append((eid, T0 + dt.timedelta(days=d), 1, "a", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    spike_day = (T0 + dt.timedelta(days=20)).date().isoformat()
    robust = {
        r.day: r.robust_z for r in daily_anomaly_robust(df).collect()
    }
    classic = {
        str(r.day): r.z_score for r in daily_anomaly(df).collect()
    }
    # the spike drags mean AND std toward itself: classic z < 4.5
    # always (for a single outlier z is bounded by ~sqrt(n)); robust z
    # uses the quiet-day scale and lands in the hundreds
    assert classic[spike_day] < 5
    assert robust[spike_day] > 100
    # quiet days stay quiet under the robust score
    assert all(abs(z) < 3 for d, z in robust.items() if d != spike_day)


def test_events_cusum_matches_python_and_peaks_at_changepoint(spark):
    """Python differential on an engineered level shift: 10 days at
    rate 2 then 10 days at rate 8 — |CUSUM| must peak exactly at the
    last low-rate day."""
    import datetime

    from pyspark.sql import functions as F

    from cuda_gis_smoothing_spark.operators.events import events_cusum

    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)
    for d in range(20):
        rate = 2 if d < 10 else 8
        for i in range(rate):
            rows.append((eid, base + datetime.timedelta(days=d, hours=i), "u", "click"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, event_type string"
    )
    got = sorted(
        ((r.day, r.n_events, r.cusum) for r in events_cusum(df).collect())
    )
    counts = [2] * 10 + [8] * 10
    mu = sum(counts) / 20
    prefix, want = 0, []
    for d, n in enumerate(counts):
        prefix += n
        day = (base + datetime.timedelta(days=d)).date().isoformat()
        want.append((day, n, prefix - (d + 1) * mu))
    assert [g[:2] for g in got] == [w[:2] for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=2e-6)
    peak = max(got, key=lambda g: abs(g[2]))
    assert peak[0] == (base + datetime.timedelta(days=9)).date().isoformat()


def test_multitouch_attribution_engineered(spark):
    """Engineered journeys: 2-touch conversion splits 500000 micro each,
    3-touch floors to 333333, no-touch credits (direct), out-of-window
    and after-conversion touches excluded."""
    import datetime

    from cuda_gis_smoothing_spark.operators.events import multitouch_attribution

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def ev(eid, user, etype, dt_s):
        return (eid, t0 + datetime.timedelta(seconds=dt_s), user, etype)

    rows = [
        # u1: click + view then purchase -> 500000 each
        ev(1, "u1", "click", 0),
        ev(2, "u1", "view", 10),
        ev(3, "u1", "purchase", 20),
        # u2: three clicks then purchase -> 333333 each (floor)
        ev(10, "u2", "click", 0),
        ev(11, "u2", "click", 1),
        ev(12, "u2", "click", 2),
        ev(13, "u2", "purchase", 60),
        # u3: no touches -> (direct)
        ev(20, "u3", "purchase", 0),
        # u4: touch OUTSIDE the 7d window + touch AFTER the purchase
        ev(30, "u4", "click", -8 * 24 * 3600),
        ev(31, "u4", "purchase", 0),
        ev(32, "u4", "view", 5),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, event_type string"
    )
    got = {
        r.channel: (r.n_credited, r.credit)
        for r in multitouch_attribution(df).collect()
    }
    assert got == {
        "click": (4, pytest.approx(0.5 + 3 * 0.333333, abs=1e-9)),
        "view": (1, pytest.approx(0.5, abs=1e-9)),
        "(direct)": (2, pytest.approx(2.0, abs=1e-9)),  # u3 and u4
    }


def test_daily_trend_matches_python_theil_sen(spark):
    """Python differential on an engineered series with one wild
    outlier day: the Theil–Sen median slope must stay near the true
    trend (robustness), and match the brute-force pairwise median."""
    import datetime
    import statistics

    from cuda_gis_smoothing_spark.operators.events import daily_trend

    t0 = datetime.datetime(2024, 5, 1)
    rows, eid = [], 0
    counts = [3 + d for d in range(12)]  # slope 1/day
    counts[6] = 400  # outlier
    for d, n in enumerate(counts):
        for i in range(n):
            rows.append((eid, t0 + datetime.timedelta(days=d, seconds=i), "u", "click"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, event_type string"
    )
    r = daily_trend(df).collect()[0]
    slopes = [
        (counts[j] - counts[i]) / (j - i)
        for i in range(len(counts))
        for j in range(i + 1, len(counts))
    ]
    want = statistics.median(slopes)
    assert r.n_days == 12 and r.n_pairs == len(slopes)
    assert r.theil_sen_slope == pytest.approx(want, abs=2e-6)
    assert abs(r.theil_sen_slope - 1.0) < 0.5  # robust to the outlier
