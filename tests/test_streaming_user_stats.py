"""MaintainedUserTypes: (a) single batch == the batch operator exactly;
(b) multi-batch (with NULL user / NULL type rows) == the batch operator
over the concatenation; (c) crash replay is a no-op; (d) deltas are
O(batch keys), never O(history)."""

import datetime as dt
import shutil
import tempfile

import pytest

from cuda_gis_smoothing_spark.operators.events import user_event_entropy
from cuda_gis_smoothing_spark.streaming.user_stats import MaintainedUserTypes

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
T0 = dt.datetime(2026, 1, 1)


def _rows(spec):
    """spec: list of (event_id, user, type) — user/type None = NULL."""
    return [(eid, T0, u, t, 0.0) for eid, u, t in spec]


@pytest.fixture()
def state_dir():
    d = tempfile.mkdtemp(prefix="usertypes_state_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batches(spark):
    def mk(spec):
        return spark.createDataFrame(_rows(spec), SCHEMA)

    b0 = mk(
        [(1, 1, "a"), (2, 1, "a"), (3, 1, "b"), (4, 2, "a"),
         (5, None, "a"), (6, 3, None)]  # NULL user / NULL type
    )
    b1 = mk(
        [(7, 1, "a"), (8, 1, "c"),  # user 1's 'a' count GROWS + new type
         (9, 2, "a"), (10, 4, "b")]  # existing key grows + new user
    )
    b2 = mk([(11, 4, "b"), (12, 5, "a")])
    return b0, b1, b2


def _served(m):
    return {
        r.user_id: (r.n_events, r.n_types, r.type_entropy)
        for r in m.entropy().collect()
    }


def _batch_ref(df):
    return {
        r.user_id: (r.n_events, r.n_types, r.type_entropy)
        for r in user_event_entropy(df).collect()
    }


def test_single_batch_equals_batch_operator(spark, state_dir):
    b0, _, _ = _batches(spark)
    m = MaintainedUserTypes(spark, state_dir)
    m.process_batch(b0, 0)
    assert _served(m) == _batch_ref(b0)


def test_multi_batch_equals_batch_over_concat(spark, state_dir):
    b0, b1, b2 = _batches(spark)
    m = MaintainedUserTypes(spark, state_dir)
    for i, b in enumerate((b0, b1, b2)):
        m.process_batch(b, i)
    full = b0.unionByName(b1).unionByName(b2)
    assert _served(m) == _batch_ref(full)


def test_crash_replay_is_noop(spark, state_dir):
    b0, b1, _ = _batches(spark)
    m = MaintainedUserTypes(spark, state_dir)
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    before = _served(m)
    m.process_batch(b1, 1)  # replayed batch: counts must not double
    assert _served(m) == before


def test_deltas_are_o_batch_keys(spark, state_dir):
    b0, b1, b2 = _batches(spark)
    m = MaintainedUserTypes(spark, state_dir)
    for i, b in enumerate((b0, b1, b2)):
        m.process_batch(b, i)
    # batch 2 touches exactly 2 (user, type) keys; state holds 6 keys
    # (1:a 1:b 1:c, 2:a, 4:b, 5:a) — the delta carries touched keys only
    delta = m.counts_log.read_delta(2)
    assert delta.count() == 2
    assert m.counts().count() == 6


def test_type_lift_served_equals_batch_multi_batch(spark, state_dir):
    """The shared lift kernel over maintained state must equal the
    batch operator over the concatenated stream — basket membership is
    the log's key set, so a user acquiring a NEW type in a later batch
    joins that type's baskets exactly once."""
    from cuda_gis_smoothing_spark.operators.events import event_type_lift

    b0, b1, b2 = _batches(spark)
    m = MaintainedUserTypes(spark, state_dir)
    for i, b in enumerate((b0, b1, b2)):
        m.process_batch(b, i)
    full = b0.unionByName(b1).unionByName(b2)
    got = {
        (r.type_a, r.type_b): (r.n_a, r.n_b, r.n_both, r.lift)
        for r in m.type_lift(min_support=1).collect()
    }
    want = {
        (r.type_a, r.type_b): (r.n_a, r.n_b, r.n_both, r.lift)
        for r in event_type_lift(full, min_support=1).collect()
    }
    assert got == want and got
