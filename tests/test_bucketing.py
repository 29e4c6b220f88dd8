"""Bucketed-layout plan tests.

Write-once ``bucketBy(cell)`` is the cluster answer to the reference's
spatial reordering (createSpatialReordering,
/root/reference/src/cuda/hex_smooth_cuda_v4.cu:264-297): pay layout
cost once, then every join/aggregation keyed on ``cell`` reads the
table pre-hash-partitioned — the per-run Exchange on the bucketed side
disappears. These tests prove it structurally on the physical plan and
cross-check values against the plain-parquet path.
"""

import pytest
from pyspark.sql import functions as F

from cuda_gis_smoothing_spark import datagen
from cuda_gis_smoothing_spark.operators.smoothing import smooth
from cuda_gis_smoothing_spark.plans.config import SmoothingPlan
from cuda_gis_smoothing_spark.sources.sink import read_bucketed, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(df) -> int:
    return _plan(df).count("Exchange hashpartitioning")


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """Same cells, two layouts: plain parquet vs bucketed-by-cell."""
    cells = spark.createDataFrame(datagen.gen_cells(side=12))
    root = tmp_path_factory.mktemp("layouts")
    plain_path = str(root / "plain")
    cells.write.parquet(plain_path)
    write_bucketed(
        cells, "cells_bucketed_test", n_buckets=4, path=str(root / "bucketed")
    )
    return spark.read.parquet(plain_path), read_bucketed(spark, "cells_bucketed_test")


def test_bucketed_groupby_has_no_exchange(spark, layouts):
    plain, bucketed = layouts
    agg = lambda df: df.groupBy("cell").agg(F.sum("ndvi").alias("s"))  # noqa: E731
    assert _shuffles(agg(bucketed)) == 0
    assert _shuffles(agg(plain)) == 1


def test_bucketed_smoothing_saves_a_join_exchange(spark, layouts):
    """Gather smoothing joins ring-exploded edges against the cell
    value table on ``cell``: the bucketed value side must arrive
    pre-partitioned (one fewer hashpartitioning Exchange). Broadcast is
    disabled so the plan exposes the shuffle the layout removes."""
    plain, bucketed = layouts
    plan = SmoothingPlan(variant="gaussian_k2", variables=("ndvi",))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n_plain = _shuffles(smooth(plain, plan))
        n_bucketed = _shuffles(smooth(bucketed, plan))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert n_bucketed < n_plain


def test_bucketed_smoothing_values_match_plain(spark, layouts):
    plain, bucketed = layouts
    plan = SmoothingPlan(variant="gaussian_k2", variables=("ndvi",))
    a = smooth(plain, plan).toPandas().set_index("cell").sort_index()
    b = smooth(bucketed, plan).toPandas().set_index("cell").sort_index()
    assert (a.index == b.index).all()
    assert (a["smoothed_ndvi"] - b["smoothed_ndvi"]).abs().max() < 1e-12
