"""MaintainedDailyCounts: (a) single batch == the batch operator
exactly; (b) multi-batch (with NULL ts / NULL type rows) == the batch
operator over the concatenation; (c) crash replay is a no-op; (d)
deltas are O(batch keys), never O(history)."""

import datetime as dt
import shutil
import tempfile

import pytest

from cuda_gis_smoothing_spark.operators.events import event_autocorrelation
from cuda_gis_smoothing_spark.streaming.daily_counts import MaintainedDailyCounts

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
T0 = dt.datetime(2026, 1, 1)


def _rows(spec):
    """spec: list of (event_id, day, type) — type None = NULL."""
    return [
        (eid, T0 + dt.timedelta(days=d) if d is not None else None, 1, t, 0.0)
        for eid, d, t in spec
    ]


@pytest.fixture()
def state_dir():
    d = tempfile.mkdtemp(prefix="daily_state_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batches(spark):
    def mk(spec):
        return spark.createDataFrame(_rows(spec), SCHEMA)

    b0 = mk(
        [(1, 0, "a"), (2, 0, "a"), (3, 1, "a"), (4, 2, "a"),
         (5, 0, "b"), (6, None, "a"), (7, 3, None)]  # NULL ts / NULL type
    )
    b1 = mk(
        [(8, 1, "a"), (9, 3, "a"), (10, 4, "a"),  # day 1 count GROWS
         (11, 1, "b"), (12, 2, "b")]
    )
    b2 = mk([(13, 5, "a"), (14, 6, "a"), (15, 0, "b")])
    return b0, b1, b2


def _served(spark, m):
    return {
        (r.event_type, r.lag): (r.n_pairs, r.autocorr)
        for r in m.autocorrelation().collect()
    }


def _batch_ref(df):
    return {
        (r.event_type, r.lag): (r.n_pairs, r.autocorr)
        for r in event_autocorrelation(df).collect()
    }


def test_single_batch_equals_batch_operator(spark, state_dir):
    b0, _, _ = _batches(spark)
    m = MaintainedDailyCounts(spark, state_dir)
    m.process_batch(b0, 0)
    assert _served(spark, m) == _batch_ref(b0)


def test_multi_batch_equals_batch_over_concat(spark, state_dir):
    b0, b1, b2 = _batches(spark)
    m = MaintainedDailyCounts(spark, state_dir)
    for i, b in enumerate((b0, b1, b2)):
        m.process_batch(b, i)
    full = b0.unionByName(b1).unionByName(b2)
    assert _served(spark, m) == _batch_ref(full)


def test_crash_replay_is_noop(spark, state_dir):
    b0, b1, _ = _batches(spark)
    m = MaintainedDailyCounts(spark, state_dir)
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    before = _served(spark, m)
    m.process_batch(b1, 1)  # replayed batch: counts must not double
    assert _served(spark, m) == before


def test_deltas_are_o_batch_keys(spark, state_dir):
    b0, b1, b2 = _batches(spark)
    m = MaintainedDailyCounts(spark, state_dir)
    for i, b in enumerate((b0, b1, b2)):
        m.process_batch(b, i)
    # batch 2 touches exactly 3 (type, day) keys; state holds 10 keys
    # (a: days 0-6, b: days 0-2) — the delta carries touched keys only
    delta = m.counts_log.read_delta(2)
    assert delta.count() == 3
    assert m.daily().count() == 10


def test_cusum_served_equals_batch_multi_batch(spark, state_dir):
    """The shared cusum kernel over maintained state must equal the
    batch operator over the concatenated stream — additive day counts
    re-rank and re-mean correctly as later batches extend the series."""
    from cuda_gis_smoothing_spark.operators.events import events_cusum

    b0, b1, b2 = _batches(spark)
    m = MaintainedDailyCounts(spark, state_dir)
    for i, b in enumerate((b0, b1, b2)):
        m.process_batch(b, i)
    full = b0.unionByName(b1).unionByName(b2)
    served = {
        (r.event_type, r.day): (r.n_events, r.cusum)
        for r in m.cusum().collect()
    }
    want = {
        (r.event_type, r.day): (r.n_events, r.cusum)
        for r in events_cusum(full).collect()
    }
    assert served == want and served


def test_trend_served_equals_batch_multi_batch(spark, state_dir):
    from cuda_gis_smoothing_spark.operators.events import daily_trend

    b0, b1, b2 = _batches(spark)
    m = MaintainedDailyCounts(spark, state_dir)
    for i, b in enumerate((b0, b1, b2)):
        m.process_batch(b, i)
    full = b0.unionByName(b1).unionByName(b2)
    served = {
        r.event_type: (r.n_days, r.n_pairs, r.theil_sen_slope)
        for r in m.trend().collect()
    }
    want = {
        r.event_type: (r.n_days, r.n_pairs, r.theil_sen_slope)
        for r in daily_trend(full).collect()
    }
    assert served == want and served


def test_seasonality_served_equals_batch_multi_batch(spark, state_dir):
    """The shared seasonality kernel over maintained state must equal
    the batch operator over the concatenated stream (additive counts:
    weekday shares re-normalize as later batches grow the totals)."""
    from cuda_gis_smoothing_spark.operators.events import events_seasonality

    b0, b1, b2 = _batches(spark)
    m = MaintainedDailyCounts(spark, state_dir)
    for i, b in enumerate((b0, b1, b2)):
        m.process_batch(b, i)
    full = b0.unionByName(b1).unionByName(b2)
    got = {
        (r.event_type, r.dow): (r.n_events, r.share)
        for r in m.seasonality().collect()
    }
    want = {
        (r.event_type, r.dow): (r.n_events, r.share)
        for r in events_seasonality(full).collect()
    }
    assert got == want and len(got) > 2


def test_burstiness_served_equals_batch_multi_batch(spark, state_dir):
    """The shared burstiness kernel over maintained state must equal
    the batch operator over the concatenated stream (additive counts:
    spans and moments grow as later batches extend the calendar)."""
    from cuda_gis_smoothing_spark.operators.events import events_burstiness

    b0, b1, b2 = _batches(spark)
    m = MaintainedDailyCounts(spark, state_dir)
    for i, b in enumerate((b0, b1, b2)):
        m.process_batch(b, i)
    full = b0.unionByName(b1).unionByName(b2)
    cols = (
        "n_days", "n_active_days", "total_events", "mean_daily",
        "fano_factor",
    )
    got = {
        r.event_type: tuple(r[c] for c in cols)
        for r in m.burstiness().collect()
    }
    want = {
        r.event_type: tuple(r[c] for c in cols)
        for r in events_burstiness(full).collect()
    }
    assert got == want and len(got) > 1


def test_user_keyed_burstiness_served_equals_batch(spark, state_dir):
    """A key='user_id' instance serves user_burstiness from state:
    multi-batch == the batch operator over the concatenation."""
    from cuda_gis_smoothing_spark.operators.events import user_burstiness

    b0 = spark.createDataFrame(
        _rows([(1, 0, "a"), (2, 0, "a"), (3, 5, "b"), (4, None, "a")]), SCHEMA
    )
    b1 = spark.createDataFrame(
        _rows([(5, 1, "a"), (6, 9, "b"), (7, 9, "b")]), SCHEMA
    )
    m = MaintainedDailyCounts(spark, state_dir, key="user_id")
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    got = {r.user_id: r.asDict() for r in m.burstiness().collect()}
    want = {
        r.user_id: r.asDict()
        for r in user_burstiness(b0.unionByName(b1)).collect()
    }
    assert got == want and got


def test_kendall_served_equals_batch_multi_batch(spark, state_dir):
    """The shared τ-b kernel over maintained state must equal the
    batch operator over the concatenated stream (additive counts: a
    later batch growing a day's count re-ranks the pair grid)."""
    from cuda_gis_smoothing_spark.operators.events import daily_kendall_tau

    b0, b1, b2 = _batches(spark)
    m = MaintainedDailyCounts(spark, state_dir)
    for i, b in enumerate((b0, b1, b2)):
        m.process_batch(b, i)
    full = b0.unionByName(b1).unionByName(b2)
    got = {
        (r.type_a, r.type_b): (r.n_pairs, r.n_conc, r.n_disc, r.tau_b)
        for r in m.kendall_tau().collect()
    }
    want = {
        (r.type_a, r.type_b): (r.n_pairs, r.n_conc, r.n_disc, r.tau_b)
        for r in daily_kendall_tau(full).collect()
    }
    assert got == want and got


def test_runs_test_served_equals_batch_multi_batch(spark, state_dir):
    """The shared runs-test kernel over maintained state must equal
    the batch operator over the concatenated stream (the median and
    the sign sequence both shift as batches extend the series)."""
    from cuda_gis_smoothing_spark.operators.events import daily_runs_test

    b0, b1, b2 = _batches(spark)
    m = MaintainedDailyCounts(spark, state_dir)
    for i, b in enumerate((b0, b1, b2)):
        m.process_batch(b, i)
    full = b0.unionByName(b1).unionByName(b2)
    got = {
        r.event_type: (r.n_days_used, r.n_above, r.n_below, r.n_runs, r.z_score)
        for r in m.runs_test().collect()
    }
    want = {
        r.event_type: (r.n_days_used, r.n_above, r.n_below, r.n_runs, r.z_score)
        for r in daily_runs_test(full).collect()
    }
    assert got == want and got
