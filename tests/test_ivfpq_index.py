"""IVF-PQ serving tier (operators/quantization.IVFPQIndex +
streaming/quantization.export_ivfpq): (a) a batch build's search
equals the ivfpq_search operator bit-for-bit over the same
vectors/centroids/codebook; (b) the maintained two-log export equals
the batch build; (c) the pruned probe plan carries bucket
PartitionFilters; (d) prune=False (no driver collect) returns the
same rows; (e) a vector update + NULL tombstone ingested into BOTH
tiers shows up in the next export; (f) load() round-trips the layout."""

import numpy as np
from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.quantization import (
    IVFPQIndex,
    ivfpq_search,
)
from cuda_gis_smoothing_spark.streaming.quantization import (
    MaintainedPQ,
    export_ivfpq,
)
from cuda_gis_smoothing_spark.streaming.similarity import MaintainedIVF

SF_DIR = "/root/testdata/sf0.001"
M, KSUB, NCENT = 8, 16, 8


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _queries(spark):
    return (
        _emb(spark)
        .where(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def _seed_params(emb):
    """The ivfpq_search gate's deterministic seeds: normalized coarse
    centroids and the raw PQ codebook, both from the smallest vec_ids."""
    crows = (
        emb.orderBy("vec_id")
        .limit(NCENT)
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    cents = np.asarray([r[0] for r in crows], dtype=np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12
    brows = (
        emb.orderBy("vec_id")
        .limit(KSUB)
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    book = np.asarray([r[0] for r in brows], dtype=np.float64)
    return cents, book


def _res(df):
    return {(r.query_id, r.neighbor_id, r.adc_dist, r.rank) for r in df.collect()}


def test_build_search_equals_batch_ivfpq(spark, tmp_path):
    emb = _emb(spark)
    cents, book = _seed_params(emb)
    idx = IVFPQIndex.build(emb, str(tmp_path / "idx"), cents, book, m=M)
    got = _res(idx.search(_queries(spark), k=5, n_probe=2))
    want = _res(
        ivfpq_search(
            emb, _queries(spark), k=5, m=M, ksub=KSUB, n_centroids=NCENT, n_probe=2
        )
    )
    assert got == want and len(want) > 0


def test_prune_false_identical_and_pruned_plan(spark, tmp_path):
    emb = _emb(spark)
    cents, book = _seed_params(emb)
    idx = IVFPQIndex.build(emb, str(tmp_path / "idx"), cents, book, m=M)
    q = _queries(spark)
    pruned = idx.search(q, k=5, n_probe=2, prune=True)
    assert _res(idx.search(q, k=5, n_probe=2, prune=False)) == _res(pruned)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:200]


def test_export_equals_build_and_updates(spark, tmp_path):
    emb = _emb(spark)
    cents, book = _seed_params(emb)
    ivf = MaintainedIVF(spark, str(tmp_path / "ivf"), cents)
    pq = MaintainedPQ(spark, str(tmp_path / "pq"), book, m=M)
    ivf.process_batch(emb, 0)
    pq.process_batch(emb, 0)
    served = export_ivfpq(ivf, pq, str(tmp_path / "exp0"))
    want = _res(
        IVFPQIndex.build(emb, str(tmp_path / "b0"), cents, book, m=M).search(
            _queries(spark), k=5, n_probe=2
        )
    )
    assert _res(served.search(_queries(spark), k=5, n_probe=2)) == want

    # batch 1 into BOTH tiers: vec 400 takes vec 0's embedding, vec 401
    # is tombstoned (NULL embedding)
    donor = emb.where(F.col("vec_id") == 0).select(
        F.lit(400).cast("long").alias("vec_id"), "embedding"
    )
    null_row = spark.createDataFrame(
        [(401, None)], "vec_id long, embedding array<float>"
    )
    delta = donor.unionByName(null_row)
    ivf.process_batch(delta, 1)
    pq.process_batch(delta, 1)
    served2 = export_ivfpq(ivf, pq, str(tmp_path / "exp1"))
    updated = emb.where(~F.col("vec_id").isin(400, 401)).unionByName(donor)
    want2 = _res(
        IVFPQIndex.build(updated, str(tmp_path / "b1"), cents, book, m=M).search(
            _queries(spark), k=5, n_probe=2
        )
    )
    got2 = _res(served2.search(_queries(spark), k=5, n_probe=2))
    assert got2 == want2
    corpus = spark.read.parquet(str(tmp_path / "exp1" / "corpus"))
    assert corpus.where(F.col("vec_id") == 401).count() == 0  # tombstoned


def test_load_round_trip(spark, tmp_path):
    emb = _emb(spark)
    cents, book = _seed_params(emb)
    built = IVFPQIndex.build(emb, str(tmp_path / "idx"), cents, book, m=M)
    loaded = IVFPQIndex.load(spark, str(tmp_path / "idx"))
    assert loaded.m == M
    assert np.array_equal(loaded.centroids, built.centroids)
    assert np.array_equal(loaded.codebook, built.codebook)
    q = _queries(spark)
    assert _res(loaded.search(q, k=5, n_probe=2)) == _res(
        built.search(q, k=5, n_probe=2)
    )
