"""MaintainedTransitions: (a) single batch == the batch operator
exactly; (b) multi-batch over a per-user-monotone stream == the batch
operator over the concatenation (boundary pairs included); (c) an
out-of-order batch raises BEFORE writing state; (d) crash replay in
the two-log write window converges; (e) deltas are O(batch), never
O(history); (f) NULL user/type sentinels round-trip."""

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.events import event_transitions
from cuda_gis_smoothing_spark.streaming.transitions import MaintainedTransitions

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
T0 = dt.datetime(2026, 1, 1)


def _rows(spec):
    """spec: list of (event_id, minute, user, type)."""
    return [
        (eid, T0 + dt.timedelta(minutes=m), u, t, 0.0) for eid, m, u, t in spec
    ]


def _batches(spark):
    b0 = spark.createDataFrame(
        _rows(
            [
                (1, 0, 10, "view"),
                (2, 1, 10, "click"),
                (3, 0, 20, "view"),
                (4, 2, 30, None),  # NULL type: next pair drops, prior pair lands
                (5, 1, 30, "view"),  # within-batch out of order: window sorts
                (6, 3, None, "view"),  # NULL user
            ]
        ),
        SCHEMA,
    )
    b1 = spark.createDataFrame(
        _rows(
            [
                (7, 10, 10, "buy"),  # boundary: click -> buy
                (8, 11, 20, "click"),  # boundary: view -> click
                (9, 10, 30, "click"),  # boundary from NULL-type last: dropped
                (10, 12, 40, "view"),  # brand-new user: no boundary pair
                (11, 10, None, "click"),  # NULL user boundary: view -> click
            ]
        ),
        SCHEMA,
    )
    b2 = spark.createDataFrame(
        _rows([(12, 20, 10, "view"), (13, 21, 40, "buy"), (14, 22, 40, "buy")]),
        SCHEMA,
    )
    return b0, b1, b2


def _mat(df):
    return {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["p_transition"])
        for r in df.collect()
    }


def test_single_batch_equals_batch_operator(spark, tmp_path):
    b0, b1, b2 = _batches(spark)
    full = b0.unionByName(b1).unionByName(b2)
    mt = MaintainedTransitions(spark, str(tmp_path / "s"))
    mt.process_batch(full, 0)
    assert _mat(mt.transitions()) == _mat(event_transitions(full))


def test_multi_batch_equals_batch_over_concat(spark, tmp_path):
    b0, b1, b2 = _batches(spark)
    mt = MaintainedTransitions(spark, str(tmp_path / "s"), compact_every=2)
    for i, b in enumerate((b0, b1, b2)):
        mt.process_batch(b, i)
    expected = _mat(event_transitions(b0.unionByName(b1).unionByName(b2)))
    assert _mat(mt.transitions()) == expected
    # boundary pairs actually crossed batches (click->buy only exists
    # across b0/b1), and the NULL sentinels round-tripped
    assert ("click", "buy") in expected
    assert ("view", None) in expected  # pair INTO a NULL-type event kept
    assert all(k[0] is not None for k in expected)  # from NULL type drops


def test_multibatch_stationary_equals_batch(spark, tmp_path):
    """The second read-side statistic over the same state: the
    stationary distribution served from a multi-batch-built matrix
    equals the batch operator over the concatenation bit-for-bit (both
    consume the identical round6 matrix through the one shared
    kernel)."""
    from cuda_gis_smoothing_spark.operators.events import (
        transition_stationary,
    )

    b0, b1, b2 = _batches(spark)
    mt = MaintainedTransitions(spark, str(tmp_path / "s"))
    for i, b in enumerate((b0, b1, b2)):
        mt.process_batch(b, i)
    got = {
        r.event_type: r.stationary_p for r in mt.stationary().collect()
    }
    want = {
        r.event_type: r.stationary_p
        for r in transition_stationary(
            b0.unionByName(b1).unionByName(b2)
        ).collect()
    }
    assert got == want and len(want) > 1


def test_out_of_order_batch_raises_before_writing(spark, tmp_path):
    b0, b1, _ = _batches(spark)
    mt = MaintainedTransitions(spark, str(tmp_path / "s"))
    mt.process_batch(b0, 0)
    before = _mat(mt.transitions())
    late = spark.createDataFrame(
        _rows([(99, 0, 10, "stale")]), SCHEMA  # minute 0 <= user 10's last
    )
    with pytest.raises(ValueError, match="monotonicity"):
        mt.process_batch(late, 1)
    # nothing was written: batch 1 can still apply cleanly
    assert not mt.state_log.has(1) and not mt.counts_log.has(1)
    assert _mat(mt.transitions()) == before
    mt.process_batch(b1, 1)
    assert ("click", "buy") in _mat(mt.transitions())


def test_crash_between_state_and_counts_writes(spark, tmp_path):
    """Forged crash: batch 1's state delta landed, the counts guard did
    not. Replay must read PRIOR state only and converge to clean."""
    b0, b1, b2 = _batches(spark)
    mt = MaintainedTransitions(spark, str(tmp_path / "s"))
    for i, b in enumerate((b0, b1, b2)):
        mt.process_batch(b, i)
    clean = _mat(mt.transitions())

    mt2 = MaintainedTransitions(spark, str(tmp_path / "s2"))
    mt2.process_batch(b0, 0)
    mt2.process_batch(b1, 1)
    shutil.rmtree(str(tmp_path / "s2" / "counts" / "delta-b00000001"))
    assert mt2.state_log.has(1) and not mt2.counts_log.has(1)
    mt2.process_batch(b1, 1)  # replay
    mt2.process_batch(b2, 2)
    assert _mat(mt2.transitions()) == clean
    # replay of a fully applied batch: no-op even with changed input
    mt2.process_batch(b2.withColumn("event_type", F.lit("junk")), 2)
    assert _mat(mt2.transitions()) == clean


def test_deltas_are_o_batch(spark, tmp_path):
    b0, b1, _ = _batches(spark)
    mt = MaintainedTransitions(spark, str(tmp_path / "s"), compact_every=99)
    mt.process_batch(b0, 0)
    mt.process_batch(b1, 1)
    state_delta = mt.state_log.read_delta(1)
    # one row per batch-1 user, not per historical user
    assert state_delta.count() == 5
    counts_delta = mt.counts_log.read_delta(1)
    # only touched (from, to) cells, not the whole matrix
    assert counts_delta.count() <= 4


def test_stream_wiring_matches_direct_batches(spark, tmp_path):
    b0, b1, b2 = _batches(spark)
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    import time

    for b in (b0, b1, b2):
        b.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mtimes: file-source order == batch order
    mt = MaintainedTransitions(spark, str(tmp_path / "s"))
    q = mt.start(src, ckpt)
    q.awaitTermination(120)
    full = b0.unionByName(b1).unionByName(b2)
    assert _mat(mt.transitions()) == _mat(event_transitions(full))
