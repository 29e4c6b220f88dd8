"""KMV distinct-count sketch (operators/sketches.py): accuracy on a
full sketch, exactness on a non-full one, the sketch-merge property
(union of sketches == sketch of union), and NULL-id exclusion. The
cross-engine twin is driver-gated (kmv_distinct_users)."""

from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.dedup import MH_PRIME
from cuda_gis_smoothing_spark.operators.sketches import (
    KMV_A,
    KMV_B,
    kmv_distinct,
)


def _ids(spark, n, group="g", start=0):
    return spark.range(start, start + n).select(
        F.lit(group).alias("g"), F.col("id").alias("uid")
    )


def test_full_sketch_accuracy(spark):
    """10k distinct ids, k=64: the estimate must land within the
    ~3-sigma KMV band (rel err ~ 1/sqrt(k-2) ≈ 12.7%; the hash is
    deterministic so this is a fixed measurement, pinned loosely)."""
    df = _ids(spark, 10_000)
    [r] = kmv_distinct(df, ["g"], "uid", k=64).collect()
    assert r.n_sketch == 64
    assert abs(r.est_distinct - 10_000) / 10_000 < 0.38, r.est_distinct


def test_not_full_sketch_is_exact(spark):
    df = _ids(spark, 40)
    [r] = kmv_distinct(df, ["g"], "uid", k=64).collect()
    assert r.n_sketch == 40 and r.est_distinct == 40.0


def test_duplicates_do_not_inflate(spark):
    df = _ids(spark, 40).unionByName(_ids(spark, 40)).unionByName(_ids(spark, 40))
    [r] = kmv_distinct(df, ["g"], "uid", k=64).collect()
    assert r.n_sketch == 40 and r.est_distinct == 40.0


def test_merge_property(spark):
    """Union of per-shard sketches == sketch of the union: keep the k
    smallest of the concatenated sketches and the (n_sketch, kth_hash,
    est) triple is identical — the property that lets 100 TB pipelines
    merge per-partition/per-day sketches without re-reading events."""
    a = _ids(spark, 5_000, start=0)
    b = _ids(spark, 5_000, start=3_000)  # overlapping shards
    k = 64

    def sketch_hashes(df):
        h = [
            r[0]
            for r in df.select(
                ((F.pmod(F.col("uid"), F.lit(MH_PRIME)) * KMV_A + KMV_B) % MH_PRIME)
                .alias("h")
            )
            .distinct()
            .collect()
        ]
        return sorted(h)[:k]

    merged = sorted(set(sketch_hashes(a) + sketch_hashes(b)))[:k]
    [r] = kmv_distinct(a.unionByName(b), ["g"], "uid", k=k).collect()
    assert r.n_sketch == len(merged)
    assert r.kth_hash == merged[-1]
    true_n = 8_000
    assert abs(r.est_distinct - true_n) / true_n < 0.38


def test_null_ids_excluded_and_groups_independent(spark):
    df = _ids(spark, 30, group="a").unionByName(
        _ids(spark, 50, group="b")
    ).unionByName(
        spark.range(1).select(F.lit("a").alias("g"), F.lit(None).cast("long").alias("uid"))
    )
    rows = {r.g: r for r in kmv_distinct(df, ["g"], "uid", k=64).collect()}
    assert rows["a"].est_distinct == 30.0
    assert rows["b"].est_distinct == 50.0
