

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
