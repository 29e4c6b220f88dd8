"""Quantile sketch (operators/sketches.kmv_quantile_sketch): (a) with
k >= every group size the sketch IS exact — equals percentile_explode
on the full input; (b) at k=64 each estimated quantile q lands within
a rank-space band of the true quantile (the value at rank q·n is
estimated with rank error ~3/sqrt(k), so compare against the exact
values at ranks q ± 3/sqrt(k)); (c) merge property — the bottom-k of
a union equals the bottom-k of concatenated per-part bottom-k's, so
sketching two halves then merging reproduces the whole-input sample.
Cross-engine equality is the driver parity gate
(value_quantiles_sketch)."""

import pytest
from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.events import PCT_QS, percentile_explode
from cuda_gis_smoothing_spark.operators.sketches import (
    KMV_K,
    kmv_hash_col,
    kmv_quantile_sketch,
)

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_exact_when_k_covers_group(spark):
    ev = _events(spark)
    exact = {
        (r.event_type, r.q): r.value
        for r in percentile_explode(
            ev, "value", PCT_QS, group_cols=("event_type",)
        ).collect()
    }
    got = {
        (r.event_type, r.q): r.est_value
        for r in kmv_quantile_sketch(
            ev, "value", "event_id", PCT_QS, group_cols=("event_type",), k=10**6
        ).collect()
    }
    assert got == exact and len(got) == len(exact) > 0


def test_rank_space_error_band(spark):
    k = KMV_K
    ev = _events(spark)
    rows = ev.select("event_type", "value").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    got = {
        (r.event_type, r.q): r.est_value
        for r in kmv_quantile_sketch(
            ev, "value", "event_id", PCT_QS, group_cols=("event_type",), k=k
        ).collect()
    }
    band = 3.0 / k**0.5  # ~3 sigma of the sampled-quantile rank error
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        for q in PCT_QS:
            lo = vals[max(0, int((q - band) * (n - 1)))]
            hi = vals[min(n - 1, int((q + band) * (n - 1)) + 1)]
            assert lo - 1e-6 <= got[(t, q)] <= hi + 1e-6, (t, q)


def test_merge_property(spark):
    """Sketch-of-parts merges to sketch-of-whole: keeping the k
    hash-smallest of the union of two per-half bottom-k samples
    selects exactly the whole-input sample rows."""
    k = 16
    ev = _events(spark).where(F.col("value").isNotNull())
    whole = (
        ev.withColumn("_h", kmv_hash_col("event_id"))
        .orderBy("_h", "event_id")
        .limit(k)
        .select("event_id")
        .collect()
    )
    parts = []
    for half in (F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1):
        parts.extend(
            ev.where(half)
            .withColumn("_h", kmv_hash_col("event_id"))
            .orderBy("_h", "event_id")
            .limit(k)
            .select("event_id", "_h")
            .collect()
        )
    merged = sorted(parts, key=lambda r: (r._h, r.event_id))[:k]
    assert [r.event_id for r in merged] == [r.event_id for r in whole]


def test_sampling_is_real_at_gate_k(spark):
    """At the gate's k the sketch must actually sketch (some group
    larger than k) — otherwise the gate only tests the exact path."""
    n_max = (
        _events(spark).groupBy("event_type").count().agg(F.max("count")).first()[0]
    )
    assert n_max > KMV_K


def test_null_ids_excluded(spark):
    """A NULL id's NULL hash sorts first in Spark but last in DuckDB —
    the operator must exclude NULL-id rows before sampling (and NULL
    values regardless)."""
    rows = [(None, "a", 100.0), (1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0),
            (4, "a", None)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {
        (r.q): r.est_value
        for r in kmv_quantile_sketch(
            df, "value", "event_id", (0.5,), group_cols=("event_type",), k=2
        ).collect()
    }
    # sample drawn from ids {1,2,3} only: the NULL-id row's 100.0 and
    # the NULL value never enter
    assert all(v <= 3.0 for v in got.values())


def test_value_outliers_differential(spark):
    """Python differential for the IQR screen."""
    from cuda_gis_smoothing_spark.operators.events import value_outliers

    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    rows = [(i, "a", v) for i, v in enumerate(vals)] + [(9, "a", 7.0), (10, "a", None)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = value_outliers(df).collect()[0]
    assert (r.n_values, r.n_low, r.n_high) == (6, 0, 1)
    # over the 6 non-null values [1,2,3,4,7,100]: q1 at rank 1.25,
    # q3 at rank 3.75 -> 4 + 0.75*(7-4); hi fence = 6.25 + 1.5*4 = 12.25
    assert (r.q1, r.q3) == (2.25, 6.25)


def test_value_outliers_on_fence_is_inlier(spark):
    """A value exactly ON the fence is NOT an outlier (strict
    inequality): degenerate IQR=0 makes both fences equal q1=q3, so
    every median-valued row sits exactly on the fence — a regression
    flipping < to <= would count all five zeros as outliers."""
    from cuda_gis_smoothing_spark.operators.events import value_outliers

    rows = [(i, "a", 0.0) for i in range(5)] + [(9, "a", 5.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = value_outliers(df).collect()[0]
    assert (r.q1, r.q3) == (0.0, 0.0)  # fences collapse to 0
    assert (r.n_values, r.n_low, r.n_high) == (6, 0, 1)  # only the 5.0
