

def test_user_event_entropy_differential(spark):
    """Python differential: per-user Shannon entropy of event-type
    counts (stable form), NULL user/type excluded."""
    import math

    from cuda_gis_smoothing_spark.operators.events import user_event_entropy
    from cuda_gis_smoothing_spark.sources.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    rows = [
        (r.user_id, r.event_type)
        for r in ev.select("user_id", "event_type").collect()
        if r.user_id is not None and r.event_type is not None
    ]
    counts = {}
    for u, t in rows:
        counts.setdefault(u, {}).setdefault(t, 0)
        counts[u][t] += 1
    got = {r.user_id: r for r in user_event_entropy(ev).collect()}
    assert set(got) == set(counts) and len(counts) > 0
    import pytest as _pt

    for u, cs in counts.items():
        n = sum(cs.values())
        h = math.log(n) - sum(c * math.log(c) for c in cs.values()) / n
        r = got[u]
        assert r.n_events == n and r.n_types == len(cs)
        assert r.type_entropy == _pt.approx(h, abs=2e-6)
        # single-type users have exactly zero entropy
        if len(cs) == 1:
            assert r.type_entropy == 0.0


def test_user_activity_zipf_matches_kernel(spark):
    """user_activity_zipf == zipf_fit_from_counts over the same count
    table (column renames only) and the slope is finite/negative-ish
    on the skewed fixture."""
    from cuda_gis_smoothing_spark.functions.text import zipf_fit_from_counts
    from cuda_gis_smoothing_spark.operators.events import user_activity_zipf
    from cuda_gis_smoothing_spark.sources.tables import load
    from pyspark.sql import functions as F

    ev = load(spark, "/root/testdata/sf0.001", "events")
    got = user_activity_zipf(ev).collect()[0]
    counts = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy(F.col("user_id").alias("t"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()
    )
    want = zipf_fit_from_counts(counts).collect()[0]
    assert got.n_users == want.n_vocab
    assert got.n_events == want.n_occurrences
    assert got.activity_slope == want.zipf_slope
    assert got.activity_intercept == want.zipf_intercept
    assert got.n_users > 1


def test_active_users_weekly_differential(spark):
    """Python differential: epoch-anchored weeks, exact distinct
    counts, stickiness == avg_dau / wau."""
    import datetime as dt

    import pytest as _pt

    from cuda_gis_smoothing_spark.operators.events import active_users_weekly
    from cuda_gis_smoothing_spark.sources.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    rows = [
        (r.ts, r.user_id)
        for r in ev.select("ts", "user_id").collect()
        if r.ts is not None and r.user_id is not None
    ]
    epoch = dt.date(1970, 1, 1)
    weeks = {}
    for ts, u in rows:
        days = (ts.date() - epoch).days
        wk = days // 7
        weeks.setdefault(wk, {}).setdefault(days, set()).add(u)
    got = {r.week: r for r in active_users_weekly(ev).collect()}
    assert set(got) == set(weeks) and len(weeks) > 0
    for wk, by_day in weeks.items():
        r = got[wk]
        wau = len(set().union(*by_day.values()))
        sdau = sum(len(s) for s in by_day.values())
        assert r.n_active_days == len(by_day)
        assert r.wau == wau
        assert r.avg_dau == _pt.approx(sdau / len(by_day), abs=2e-6)
        assert r.stickiness == _pt.approx(sdau / len(by_day) / wau, abs=2e-6)
        assert r.stickiness <= 1.0 + 1e-9


def test_user_burstiness_matches_python(spark):
    """Per-user Fano == a pure-Python population var/mean over the
    zero-filled calendar span; regular (daily metronome) user < 1-ish
    bound checks the dispersion direction."""
    import datetime as dt

    import pytest

    from cuda_gis_smoothing_spark.operators.events import user_burstiness

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: one event every day for 10 days (regular, fano ~ 0)
    rows += [(i, base + dt.timedelta(days=i), 1, "a", 1.0, None) for i in range(10)]
    # user 2: 10 events on day 0, nothing for 9 days (bursty)
    rows += [(100 + i, base, 2, "a", 1.0, None) for i in range(10)]
    rows += [(110, base + dt.timedelta(days=9), 2, "a", 1.0, None)]
    rows += [(120, None, 3, "a", 1.0, None), (121, base, None, "a", 1.0, None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.user_id: r for r in user_burstiness(df).collect()}
    assert set(got) == {1, 2}

    def fano(counts, nd):
        xs = counts + [0] * (nd - len(counts))
        mean = sum(xs) / nd
        var = sum((x - mean) ** 2 for x in xs) / nd
        return var / mean

    r1 = got[1]
    assert (r1.n_days, r1.n_active_days, r1.total_events) == (10, 10, 10)
    assert r1.fano_factor == pytest.approx(fano([1] * 10, 10), abs=1e-6)
    r2 = got[2]
    assert (r2.n_days, r2.n_active_days, r2.total_events) == (10, 2, 11)
    assert r2.fano_factor == pytest.approx(fano([10, 1], 10), abs=1e-6)
    assert r2.fano_factor > 1 > r1.fano_factor


def test_session_stats_consistent_with_sessionize(spark):
    """The percentile card recomputes from sessionize's own session
    table (same boundaries): n_events quantiles match a Python
    interpolation over the per-session counts, and duration is the
    integer micros span in seconds."""
    import pytest

    from cuda_gis_smoothing_spark.operators.events import (
        PCT_QS,
        session_stats,
        sessionize,
    )
    from cuda_gis_smoothing_spark.sources.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    counts = sorted(r.n_events for r in sessionize(ev).collect())

    def quantile(xs, q):
        i = (len(xs) - 1) * q
        lo, hi = int(i), min(int(i) + 1, len(xs) - 1)
        return xs[lo] + (xs[hi] - xs[lo]) * (i - lo)

    from cuda_gis_smoothing_spark.operators.events import session_events

    spans = {}
    for r in session_events(ev).collect():
        key = (r.user_id, r.session_seq)
        lo, hi = spans.get(key, (r.us, r.us))
        spans[key] = (min(lo, r.us), max(hi, r.us))
    durs = sorted((hi - lo) / 1e6 for lo, hi in spans.values())
    assert len(durs) == len(counts)

    got = {(r.metric, r.q): r.value for r in session_stats(ev).collect()}
    for q in PCT_QS:
        assert got[("n_events", q)] == pytest.approx(
            quantile(counts, q), abs=2e-6
        )
        assert got[("duration_s", q)] == pytest.approx(
            quantile(durs, q), abs=2e-6
        )


def test_funnel_step_latency_matches_python(spark):
    """Latency quantiles == a Python replay of the earliest-completion
    chain on an engineered funnel (two converting users with known
    gaps, one non-converter)."""
    import datetime as dt

    import pytest

    from cuda_gis_smoothing_spark.operators.events import (
        PCT_QS,
        funnel_step_latency,
    )

    base = dt.datetime(2024, 1, 1)

    def ev(eid, sec, user, typ):
        return (eid, base + dt.timedelta(seconds=sec), user, typ, 1.0, None)

    rows = [
        ev(1, 0, 1, "signup"), ev(2, 10, 1, "click"), ev(3, 40, 1, "purchase"),
        ev(4, 0, 2, "signup"), ev(5, 30, 2, "click"), ev(6, 90, 2, "purchase"),
        # user 3 clicks BEFORE signup (doesn't count), never again
        ev(7, 100, 3, "click"), ev(8, 200, 3, "signup"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {
        (r.step, r.event_type, r.q): r.latency_s
        for r in funnel_step_latency(df).collect()
    }

    def quantile(xs, q):
        xs = sorted(xs)
        i = (len(xs) - 1) * q
        lo, hi = int(i), min(int(i) + 1, len(xs) - 1)
        return xs[lo] + (xs[hi] - xs[lo]) * (i - lo)

    click_lat = [10.0, 30.0]
    buy_lat = [30.0, 60.0]
    for q in PCT_QS:
        assert got[(2, "click", q)] == pytest.approx(quantile(click_lat, q), abs=2e-6)
        assert got[(3, "purchase", q)] == pytest.approx(quantile(buy_lat, q), abs=2e-6)
    assert not any(k[0] == 1 for k in got)


def test_session_bounce_engineered(spark):
    """Two users, engineered sessions: user 1 opens with 'land' then
    browses (no bounce), then 31 min later a single-event 'ad' session
    (bounce); user 2 bounces twice on 'land'. Entry attribution uses
    the first event of each gap-break session."""
    import datetime as dt

    import pytest

    from cuda_gis_smoothing_spark.operators.events import session_bounce

    base = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, base, 1, "land", 1.0, None),
        (2, base + m, 1, "click", 1.0, None),
        (3, base + 2 * m, 1, "buy", 1.0, None),
        (4, base + 40 * m, 1, "ad", 1.0, None),       # solo session
        (5, base, 2, "land", 1.0, None),               # bounce
        (6, base + 40 * m, 2, "land", 1.0, None),      # bounce again
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r.entry_type: r for r in session_bounce(df).collect()}
    assert set(got) == {"land", "ad"}
    land = got["land"]
    assert (land.n_sessions, land.n_bounces) == (3, 2)
    assert land.bounce_rate == pytest.approx(2 / 3, abs=1e-6)
    assert land.avg_events == pytest.approx(5 / 3, abs=1e-6)
    ad = got["ad"]
    assert (ad.n_sessions, ad.n_bounces) == (1, 1)
    assert ad.bounce_rate == 1.0 and ad.avg_events == 1.0


def test_daily_kendall_tau_matches_python(spark):
    """Pure-Python τ-b differential on an engineered two-type daily
    grid WITH ties (tied counts exercise the Tx/Ty corrections)."""
    import datetime as dt
    import itertools

    import pytest

    from cuda_gis_smoothing_spark.operators.events import daily_kendall_tau

    base = dt.datetime(2024, 3, 1)
    # daily counts by construction: type a: [1,2,2,3,1], type b: [2,2,1,4,4]
    na = [1, 2, 2, 3, 1]
    nb = [2, 2, 1, 4, 4]
    rows = []
    eid = 0
    for d, (ca, cb) in enumerate(zip(na, nb)):
        for _ in range(ca):
            rows.append((eid, base + dt.timedelta(days=d), 1, "a", 1.0, None))
            eid += 1
        for _ in range(cb):
            rows.append((eid, base + dt.timedelta(days=d), 1, "b", 1.0, None))
            eid += 1
    # a third type on DISJOINT days: aligns with nothing on some days
    rows.append((eid, base + dt.timedelta(days=0), 1, "c", 1.0, None))
    rows.append((eid + 1, base + dt.timedelta(days=1), 1, "c", 1.0, None))
    # NULL type / NULL ts rows must be ignored
    rows.append((eid + 2, base, 1, None, 1.0, None))
    rows.append((eid + 3, None, 1, "a", 1.0, None))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {(r.type_a, r.type_b): r for r in daily_kendall_tau(df).collect()}

    def tau_b(xs, ys):
        n0 = c = d = tx = ty = 0
        for i, j in itertools.combinations(range(len(xs)), 2):
            dx, dy = xs[i] - xs[j], ys[i] - ys[j]
            n0 += 1
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
        den = ((n0 - tx) * (n0 - ty)) ** 0.5
        return n0, c, d, (c - d) / den if den else None

    n0, c, d, tb = tau_b(na, nb)
    r = got[("a", "b")]
    assert (r.n_pairs, r.n_conc, r.n_disc) == (n0, c, d)
    assert r.tau_b == pytest.approx(tb, abs=1e-6)
    # c aligns with a and b on 2 days -> 1 pair each
    assert got[("a", "c")].n_pairs == 1
    assert got[("b", "c")].n_pairs == 1


def test_daily_runs_test_matches_python(spark):
    """Engineered alternating vs clustered daily series: the
    alternating series has the maximum run count (z > 0), the
    clustered one the minimum (z < 0); exact-median days drop."""
    import datetime as dt

    import pytest

    from cuda_gis_smoothing_spark.operators.events import daily_runs_test

    base = dt.datetime(2024, 3, 1)

    def mk(name, counts, start_eid):
        rows = []
        eid = start_eid
        for d, cnt in enumerate(counts):
            for _ in range(cnt):
                rows.append((eid, base + dt.timedelta(days=d), 1, name, 1.0, None))
                eid += 1
        return rows, eid

    # alternating around median 2 (days at exactly 2 are excluded)
    alt = [1, 3, 1, 3, 1, 3, 2, 1, 3]
    # clustered: lows then highs
    clu = [1, 1, 1, 1, 3, 3, 3, 3, 2]
    rows, eid = mk("alt", alt, 0)
    r2, _ = mk("clu", clu, eid)
    rows += r2
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r.event_type: r for r in daily_runs_test(df).collect()}

    def runs_z(counts):
        import statistics

        med = statistics.median(counts)
        s = [1 if c > med else 0 for c in counts if c != med]
        n1, n2, n = sum(s), len(s) - sum(s), len(s)
        r = 1 + sum(1 for i in range(1, len(s)) if s[i] != s[i - 1])
        mu = 2 * n1 * n2 / n + 1
        var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
        return n, n1, n2, r, (r - mu) / var**0.5

    for name, counts in (("alt", alt), ("clu", clu)):
        n, n1, n2, r, z = runs_z(counts)
        g = got[name]
        assert (g.n_days_used, g.n_above, g.n_below, g.n_runs) == (n, n1, n2, r)
        assert g.z_score == pytest.approx(z, abs=1e-6)
    assert got["alt"].z_score > 0 > got["clu"].z_score


def test_event_type_lift_matches_python(spark):
    """Engineered user baskets: perfectly co-occurring types have
    lift N/(c_a·c_b) > 1, disjoint supported pairs never appear (no
    co-occurrence -> no pair row); min_support prunes."""
    import datetime as dt

    import pytest

    from cuda_gis_smoothing_spark.operators.events import event_type_lift

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # users 1-4: {a, b} always together; users 5-8: {c} alone;
    # users 9-10: {a, c}
    baskets = {1: "ab", 2: "ab", 3: "ab", 4: "ab", 5: "c", 6: "c",
               7: "c", 8: "c", 9: "ac", 10: "ac"}
    for u, types in baskets.items():
        for t in types:
            # duplicate events of the same type must not inflate counts
            for _ in range(2):
                rows.append((eid, base, u, t, 1.0, None))
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {(r.type_a, r.type_b): r for r in event_type_lift(df, min_support=2).collect()}
    # N=10, c(a)=6, c(b)=4, c(c)=6; c(ab)=4, c(ac)=2, c(bc)=0
    assert set(got) == {("a", "b"), ("a", "c")}
    ab = got[("a", "b")]
    assert (ab.n_a, ab.n_b, ab.n_both) == (6, 4, 4)
    assert ab.lift == pytest.approx(10 * 4 / (6 * 4), abs=1e-6)
    ac = got[("a", "c")]
    assert (ac.n_a, ac.n_b, ac.n_both) == (6, 6, 2)
    assert ac.lift == pytest.approx(10 * 2 / (6 * 6), abs=1e-6)
