"""Persisted IVF index: build/load round-trip, result equivalence with
the in-session ivf_knn over identical centroids, and REAL partition
pruning (the probe must scan only the probed buckets' partitions)."""

from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.similarity import IVFIndex, ivf_knn


def _pairs(df):
    return {(r.query_id, r.neighbor_id, r.rank) for r in df.collect()}


def test_ivf_index_build_query_matches_ivf_knn_and_prunes(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    idx = IVFIndex.build(emb, str(tmp_path / "ivf"), n_centroids=8, iters=3)
    got = _pairs(idx.query(queries, k=5, n_probe=2))
    want = _pairs(
        ivf_knn(emb, queries, k=5, n_probe=2, centroids=idx.centroids)
    )
    assert got == want and got

    # load() round-trips the centroids exactly
    idx2 = IVFIndex.load(spark, str(tmp_path / "ivf"))
    assert (idx2.centroids == idx.centroids).all()
    assert _pairs(idx2.query(queries, k=5, n_probe=2)) == want

    # the large-query-set path (no driver collect, shuffle join, no
    # pruning) returns the identical result
    assert _pairs(idx.query(queries, k=5, n_probe=2, prune=False)) == want

    # the probe reads a strict subset of bucket partitions, and the
    # scan's PartitionFilters carry the bucket predicate
    q = idx.probe_buckets(queries, n_probe=2)
    probed = {r["bucket"] for r in q.select("bucket").distinct().collect()}
    all_buckets = {
        r["bucket"]
        for r in spark.read.parquet(str(tmp_path / "ivf" / "corpus"))
        .select("bucket")
        .distinct()
        .collect()
    }
    assert probed < all_buckets, (probed, all_buckets)

    pruned = spark.read.parquet(str(tmp_path / "ivf" / "corpus")).where(
        F.col("bucket").isin(sorted(probed))
    )
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0]
