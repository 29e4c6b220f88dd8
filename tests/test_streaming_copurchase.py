"""MaintainedCopurchase (streaming/copurchase.py): (a) multi-batch
state serves neighbor lists IDENTICAL to the batch operator; (b) a
re-ingested order RAISES (append-only whole-order contract); (c) delta
writes are O(batch keys); (d) crash replay of an applied batch is a
no-op."""

import os

import pytest
from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.analytics import part_similarity
from cuda_gis_smoothing_spark.streaming.copurchase import MaintainedCopurchase

SF_DIR = "/root/testdata/sf0.001"


def _li(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def _sim_set(df):
    return {(r.part, r.neighbor, r.n_both, r.cosine, r.rank) for r in df.collect()}


def test_multibatch_state_equals_batch_similarity(spark, tmp_path):
    li = _li(spark)
    mc = MaintainedCopurchase(spark, str(tmp_path / "state"), compact_every=2)
    for bid, (lo, hi) in enumerate(((0, 500), (500, 1000), (1000, 10**9))):
        mc.process_batch(
            li.where((F.col("l_orderkey") >= lo) & (F.col("l_orderkey") < hi)),
            bid,
        )
    got = _sim_set(mc.similarity())
    want = _sim_set(part_similarity(li))
    assert got == want and want
    # compaction fired and the view survived it
    assert any(
        d.startswith("base-") for d in os.listdir(tmp_path / "state" / "pairs")
    )


def test_reingested_order_raises(spark, tmp_path):
    li = _li(spark)
    mc = MaintainedCopurchase(spark, str(tmp_path / "state"))
    mc.process_batch(li.where(F.col("l_orderkey") < 500), 0)
    with pytest.raises(ValueError, match="append-only"):
        mc.process_batch(li.where(F.col("l_orderkey") < 100), 1)


def test_delta_o_batch_and_replay_noop(spark, tmp_path):
    li = _li(spark)
    mc = MaintainedCopurchase(spark, str(tmp_path / "state"))
    mc.process_batch(li.where(F.col("l_orderkey") < 1000), 0)
    small = li.where(
        (F.col("l_orderkey") >= 1000) & (F.col("l_orderkey") < 1080)
    )
    mc.process_batch(small, 1)
    batch_pairs = (
        small.select("l_orderkey", "l_partkey").distinct().alias("a")
        .join(
            small.select("l_orderkey", "l_partkey").distinct().alias("b"),
            "l_orderkey",
        )
        .count()
    )
    delta = spark.read.parquet(
        str(tmp_path / "state" / "pairs" / "delta-b00000001")
    )
    # touched pairs only — bounded by the batch's own pair fan-out
    assert 0 < delta.count() <= batch_pairs
    clean = _sim_set(mc.similarity())
    mc.process_batch(small, 1)  # replay: guarded no-op (same batch id)
    assert _sim_set(mc.similarity()) == clean


def test_recommendations_from_state_and_unseen_queries(spark, tmp_path):
    """Scoring the ingested orders from multi-batch state == the batch
    part_recommendations composite; an UNSEEN query basket gets scored
    against state without being ingested (no state mutation)."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        part_recommendations,
    )

    li = _li(spark)
    mc = MaintainedCopurchase(spark, str(tmp_path / "state"))
    mc.process_batch(li.where(F.col("l_orderkey") < 700), 0)
    mc.process_batch(li.where(F.col("l_orderkey") >= 700), 1)
    got = {
        (r.l_orderkey, r.part, r.score, r.rank)
        for r in mc.recommendations(li).collect()
    }
    want = {
        (r.l_orderkey, r.part, r.score, r.rank)
        for r in part_recommendations(li).collect()
    }
    assert got == want and want
    # an unseen basket: two parts that co-occur in state
    pair = (
        mc.similarity(k=1)
        .orderBy("part")
        .limit(1)
        .collect()[0]
    )
    q = spark.createDataFrame(
        [(999999, pair.part), (999999, pair.neighbor)],
        "l_orderkey long, l_partkey long",
    )
    recs = mc.recommendations(q).collect()
    assert all(r.l_orderkey == 999999 for r in recs)
    basket = {pair.part, pair.neighbor}
    assert all(r.part not in basket for r in recs)
    # scoring did not ingest: the query order is absent from the guard
    assert (
        mc.orders_log.read().where(F.col("l_orderkey") == 999999).count() == 0
    )
