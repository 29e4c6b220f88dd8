"""MaintainedHeaps: (a) single batch == heaps_fit exactly; (b)
multi-batch == the batch operator over the concatenation (incl. NULL /
empty-text docs); (c) crash replay is a no-op and a forged crash
(tokens delta written, guard absent) replays correctly; (d) deltas are
O(batch); (e) out-of-order / intra-batch-duplicate ingest RAISES."""

import shutil
import tempfile

import pytest

from cuda_gis_smoothing_spark.functions.text import heaps_fit
from cuda_gis_smoothing_spark.streaming.heaps import MaintainedHeaps

SCHEMA = "doc_id long, source string, text string"


@pytest.fixture()
def state_dir():
    d = tempfile.mkdtemp(prefix="heaps_state_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batches(spark):
    b0 = spark.createDataFrame(
        [
            (1, "a", "the cat sat"),
            (2, "a", "the dog sat down"),
            (3, "b", None),
            (4, "b", ""),
            (5, "a", "cat dog bird"),
        ],
        SCHEMA,
    )
    b1 = spark.createDataFrame(
        [
            (6, "a", "the bird flew away"),
            (7, "b", "entirely novel words here"),
            (8, "a", None),
        ],
        SCHEMA,
    )
    return b0, b1


def _fit(df):
    return df.collect()[0].asDict()


def test_single_batch_equals_batch_operator(spark, state_dir):
    b0, _ = _batches(spark)
    m = MaintainedHeaps(spark, state_dir)
    m.process_batch(b0, 0)
    assert _fit(m.heaps()) == _fit(heaps_fit(b0))


def test_multi_batch_equals_batch_over_concat(spark, state_dir):
    b0, b1 = _batches(spark)
    m = MaintainedHeaps(spark, state_dir)
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    assert _fit(m.heaps()) == _fit(heaps_fit(b0.unionByName(b1)))


def test_crash_replay_and_forged_crash(spark, state_dir):
    b0, b1 = _batches(spark)
    m = MaintainedHeaps(spark, state_dir)
    m.process_batch(b0, 0)
    # applied-batch replay: no-op
    m.process_batch(b0, 0)
    # forged crash: tokens delta landed, per-doc guard did not
    occ_tokens = (
        b1.selectExpr("explode(split(lower(text), ' ')) AS t")
        .where("t <> ''")
        .join(m.tokens_log.read(), "t", "left_anti")
        .select("t")
        .distinct()
    )
    m.tokens_log.write_delta(occ_tokens, 1)
    assert not m.perdoc_log.has(1)
    m.process_batch(b1, 1)  # replay of the crashed batch
    assert _fit(m.heaps()) == _fit(heaps_fit(b0.unionByName(b1)))


def test_deltas_are_o_batch(spark, state_dir):
    b0, b1 = _batches(spark)
    m = MaintainedHeaps(spark, state_dir)
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    # the batch-1 per-doc delta holds only batch-1's token-bearing docs
    import pyspark.sql.functions as F

    d1 = m.perdoc_log.read().where(F.col("doc_id") >= 6)
    assert d1.count() == 2  # doc 8 is NULL-text: no row
    assert m.perdoc_log.read().count() == 5


def test_out_of_order_and_dup_raise(spark, state_dir):
    b0, b1 = _batches(spark)
    m = MaintainedHeaps(spark, state_dir)
    m.process_batch(b1, 0)
    with pytest.raises(ValueError, match="out-of-order"):
        m.process_batch(b0, 1)
    dup = spark.createDataFrame(
        [(100, "a", "x"), (100, "a", "y")], SCHEMA
    )
    with pytest.raises(ValueError, match="duplicate"):
        m.process_batch(dup, 1)
