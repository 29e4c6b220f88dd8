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


def test_cms_matches_python_and_is_one_sided(spark):
    """Pure-Python CMS differential over the sf0.001 corpus: the
    counter table and every top-k estimate match a reference
    implementation exactly (the sketch is DETERMINISTIC over the
    portable hash — no tolerance), and estimates are one-sided
    (>= the true count, the CMS guarantee)."""
    import __spark_entry__ as entry_mod
    from cuda_gis_smoothing_spark.operators.dedup import MH_PRIME
    from cuda_gis_smoothing_spark.operators.sketches import (
        CMS_ROWS,
        CMS_WIDTH,
    )
    from cuda_gis_smoothing_spark.sources.tables import load

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents").select("doc_id", "text").collect()

    def token_hash(t):
        acc = 7
        for ch in t:
            acc = (acc * 131 + ord(ch)) % MH_PRIME
        return acc

    from collections import Counter

    df_counts = Counter()
    for r in docs:
        if r.text is None:
            continue
        for t in set(r.text.lower().split(" ")):
            if t:
                df_counts[t] += 1
    ctr = Counter()
    for t, c in df_counts.items():
        h = token_hash(t)
        for j, (a, b) in enumerate(CMS_ROWS):
            ctr[(j, (h * a + b) % MH_PRIME % CMS_WIDTH)] += c

    got = entry_mod.queries()["vocab_cms_estimates"](spark, sf).collect()
    assert len(got) == 20
    for r in got:
        assert r.df == df_counts[r.token]
        h = token_hash(r.token)
        want = min(
            ctr[(j, (h * a + b) % MH_PRIME % CMS_WIDTH)]
            for j, (a, b) in enumerate(CMS_ROWS)
        )
        assert r.cms_estimate == want
        assert r.cms_estimate >= r.df  # one-sided error, always


def test_heavy_hitters_is_lossless_and_plan_clean(spark):
    """heavy_hitters == the plain exact HAVING df >= threshold set
    (the lossless-prefilter contract: CMS one-sidedness means no
    false negatives, the exact verify removes every false positive);
    per-token estimates match the Python sketch; the plan carries no
    uncovered quadratic join (both BNLs are 1-row stats attaches)."""
    from collections import Counter

    from cuda_gis_smoothing_spark.operators.dedup import MH_PRIME
    from cuda_gis_smoothing_spark.operators.sketches import (
        CMS_ROWS,
        CMS_WIDTH,
        heavy_hitters,
    )
    from cuda_gis_smoothing_spark.plans.audit import assert_no_quadratic_join
    from cuda_gis_smoothing_spark.sources.tables import load

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    out = heavy_hitters(docs)
    assert_no_quadratic_join(out, "heavy_hitters", allow_stats_broadcasts=True)
    rows = {r.token: r for r in out.collect()}

    raw = docs.select("doc_id", "text").collect()
    df_counts = Counter()
    for r in raw:
        if r.text is None:
            continue
        for t in set(r.text.lower().split(" ")):
            if t:
                df_counts[t] += 1
    thr = max(2, len(raw) // 100)
    exact = {t for t, c in df_counts.items() if c >= thr}
    assert set(rows) == exact and exact  # lossless, and non-degenerate

    def token_hash(t):
        acc = 7
        for ch in t:
            acc = (acc * 131 + ord(ch)) % MH_PRIME
        return acc

    ctr = Counter()
    for t, c in df_counts.items():
        h = token_hash(t)
        for j, (a, b) in enumerate(CMS_ROWS):
            ctr[(j, (h * a + b) % MH_PRIME % CMS_WIDTH)] += c
    for t, r in rows.items():
        assert r.df == df_counts[t]
        assert r.threshold == thr
        h = token_hash(t)
        want = min(
            ctr[(j, (h * a + b) % MH_PRIME % CMS_WIDTH)]
            for j, (a, b) in enumerate(CMS_ROWS)
        )
        assert r.cms_estimate == want and r.cms_estimate >= r.df


def test_heavy_hitters_threshold_edge(spark):
    """Engineered corpus: a token at exactly the threshold df is kept,
    one at threshold-1 is dropped (the >= contract on BOTH filters)."""
    from cuda_gis_smoothing_spark.operators.sketches import heavy_hitters

    # 300 docs -> threshold = 3; 'at' in 3 docs, 'under' in 2
    rows = [
        (i, "filler%d common" % i + (" at" if i < 3 else "") + (" under" if i in (5, 6) else ""))
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.token: r for r in heavy_hitters(docs).collect()}
    assert "at" in got and got["at"].df == 3 and got["at"].threshold == 3
    assert "under" not in got
    assert "common" in got and got["common"].df == 300
