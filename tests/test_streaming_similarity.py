"""Maintained incremental IVF index (streaming/similarity.py):
(a) a multi-batch-built index must query IDENTICALLY to ivf_knn over
the same vectors and centroids; (b) a delta write is O(batch vectors);
(c) a re-ingested vec_id REPLACES its row (vector update) and the
query tracks the updated corpus; (d) crash replay of an applied batch
is a no-op; (e) the streaming wiring feeds the same process_batch;
(f) prune=True and prune=False agree."""

from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.similarity import ivf_knn, train_centroids
from cuda_gis_smoothing_spark.streaming.similarity import MaintainedIVF

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _queries(spark):
    return (
        _emb(spark)
        .where(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def _res(df):
    return {(r.query_id, r.neighbor_id, r.rank) for r in df.collect()}


def test_multibatch_index_equals_ivf_knn(spark, tmp_path):
    emb = _emb(spark)
    cents = train_centroids(emb, n_centroids=8, iters=2)
    idx = MaintainedIVF(spark, str(tmp_path / "state"), cents, compact_every=2)
    for bid, (lo, hi) in enumerate(((0, 150), (150, 300), (300, 10**9))):
        idx.process_batch(
            emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), bid
        )
    got = _res(idx.query(_queries(spark), k=5, n_probe=2))
    want = _res(ivf_knn(emb, _queries(spark), k=5, n_probe=2, centroids=cents))
    assert got == want and len(want) > 0
    # prune=False (the large-query no-collect path) agrees
    assert _res(idx.query(_queries(spark), k=5, n_probe=2, prune=False)) == want


def test_delta_write_is_o_batch(spark, tmp_path):
    emb = _emb(spark)
    cents = train_centroids(emb, n_centroids=8, iters=2)
    idx = MaintainedIVF(spark, str(tmp_path / "state"), cents)
    idx.process_batch(emb, 0)
    two = emb.orderBy("vec_id").limit(2).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    idx.process_batch(two, 1)
    delta = spark.read.parquet(str(tmp_path / "state" / "vectors" / "delta-b00000001"))
    assert delta.count() == 2  # O(delta), not a corpus re-assignment


def test_vector_update_replaces_row(spark, tmp_path):
    emb = _emb(spark)
    cents = train_centroids(emb, n_centroids=8, iters=2)
    idx = MaintainedIVF(spark, str(tmp_path / "state"), cents)
    idx.process_batch(emb, 0)
    # move vector 20 onto a copy of vector 30's embedding
    donor = emb.where(F.col("vec_id") == 30).select(
        F.lit(20).cast("long").alias("vec_id"),
        F.col("embedding"),
    )
    idx.process_batch(donor, 1)
    updated = (
        emb.select("vec_id", "embedding")
        .where(F.col("vec_id") != 20)
        .unionByName(donor)
    )
    got = _res(idx.query(_queries(spark), k=5, n_probe=2))
    want = _res(ivf_knn(updated, _queries(spark), k=5, n_probe=2, centroids=cents))
    assert got == want
    # and the stored row really moved to the donor's bucket
    b20, b30 = [
        r.bucket
        for r in idx.corpus()
        .where(F.col("vec_id").isin(20, 30))
        .orderBy("vec_id")
        .collect()
    ]
    assert b20 == b30


def test_replay_of_applied_batch_is_noop(spark, tmp_path):
    emb = _emb(spark)
    cents = train_centroids(emb, n_centroids=8, iters=2)
    idx = MaintainedIVF(spark, str(tmp_path / "state"), cents)
    idx.process_batch(emb, 0)
    before = _res(idx.query(_queries(spark)))
    junk = emb.limit(3).withColumn(
        "embedding", F.expr("transform(embedding, x -> float(0.5))")
    )
    idx.process_batch(junk, 0)  # same batch id: must not apply
    assert _res(idx.query(_queries(spark))) == before


def test_export_index_equals_maintained(spark, tmp_path):
    """export_index writes the serving-tier bucket-partitioned layout:
    the exported IVFIndex answers queries identically to the log view,
    its probe plan prunes partitions (PartitionFilters carry the probed
    bucket set), and a vector update BEFORE export is reflected."""
    emb = _emb(spark)
    cents = train_centroids(emb, n_centroids=8, iters=2)
    idx = MaintainedIVF(spark, str(tmp_path / "state"), cents)
    idx.process_batch(emb, 0)
    donor = emb.where(F.col("vec_id") == 30).select(
        F.lit(20).cast("long").alias("vec_id"), F.col("embedding")
    )
    idx.process_batch(donor, 1)  # update folded before export
    served = idx.export_index(str(tmp_path / "ivf"))
    q = _queries(spark)
    assert _res(served.query(q, k=5, n_probe=2)) == _res(
        idx.query(q, k=5, n_probe=2)
    )
    plan = (
        served.query(q, k=5, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "bucket" in plan


def test_stream_wiring_builds_same_index(spark, tmp_path):
    emb = _emb(spark)
    cents = train_centroids(emb, n_centroids=8, iters=2)
    src = str(tmp_path / "src")
    for i, (lo, hi) in enumerate(((0, 250), (250, 10**9))):
        emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).coalesce(
            1
        ).write.parquet(f"{src}/part{i}")
    idx = MaintainedIVF(spark, str(tmp_path / "state"), cents)
    q = idx.start(f"{src}/part*", str(tmp_path / "ckpt"))
    assert q.awaitTermination(180), "availableNow query did not finish"
    got = _res(idx.query(_queries(spark), k=5, n_probe=2))
    want = _res(ivf_knn(emb, _queries(spark), k=5, n_probe=2, centroids=cents))
    assert got == want


def test_null_embedding_tombstone_removes_vector(spark, tmp_path):
    """A NULL-embedding re-ingest writes a NULL-bucket tombstone:
    latest-wins removes the vector from the served corpus and its
    queries equal ivf_knn over the corpus WITHOUT it (the
    MaintainedPQ / MaintainedPostings NULL lesson)."""
    emb = _emb(spark).select("vec_id", "embedding")
    cents = train_centroids(emb, n_centroids=8, iters=2)
    idx = MaintainedIVF(spark, str(tmp_path / "state"), cents)
    idx.process_batch(emb, 0)
    victim = int(
        idx.query(_queries(spark), k=1, n_probe=2)
        .where(F.col("query_id") == 0)
        .collect()[0]["neighbor_id"]
    )
    null_row = spark.createDataFrame(
        [(victim, None)], "vec_id long, embedding array<float>"
    )
    idx.process_batch(null_row, 1)
    assert idx.corpus().where(F.col("vec_id") == victim).count() == 0
    got = _res(idx.query(_queries(spark), k=5, n_probe=2))
    want = _res(
        ivf_knn(
            emb.where(F.col("vec_id") != victim),
            _queries(spark),
            k=5,
            n_probe=2,
            centroids=cents,
        )
    )
    assert got == want


# -- MaintainedLabeledVectors (embedding_outliers served from state) --


def _out_res(df):
    return {
        (r.label, r.vec_id): (r.centroid_cosine, r.rank) for r in df.collect()
    }


def test_labeled_vectors_multibatch_equals_batch_operator(spark, tmp_path):
    from cuda_gis_smoothing_spark.operators.similarity import (
        embedding_outliers,
    )
    from cuda_gis_smoothing_spark.streaming.similarity import (
        MaintainedLabeledVectors,
    )

    emb = _emb(spark)
    mv = MaintainedLabeledVectors(spark, str(tmp_path / "state"))
    for bid, (lo, hi) in enumerate(((0, 150), (150, 300), (300, 10**9))):
        mv.process_batch(
            emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), bid
        )
    assert _out_res(mv.outliers()) == _out_res(embedding_outliers(emb))
    # crash replay of an applied batch is a no-op
    before = mv.log.delta_count()
    mv.process_batch(emb.limit(3), 1)
    assert mv.log.delta_count() == before


def test_labeled_vectors_update_and_tombstone_track_batch_rebuild(
    spark, tmp_path
):
    from cuda_gis_smoothing_spark.operators.similarity import (
        embedding_outliers,
    )
    from cuda_gis_smoothing_spark.streaming.similarity import (
        MaintainedLabeledVectors,
    )

    emb = _emb(spark)
    mv = MaintainedLabeledVectors(spark, str(tmp_path / "state"))
    mv.process_batch(emb, 0)
    # pick the current worst outlier of label 0; relabel it to 1, and
    # tombstone (NULL embedding) the worst of label 1
    first = mv.outliers().where(
        (F.col("label") == 0) & (F.col("rank") == 1)
    ).collect()[0]["vec_id"]
    tomb = mv.outliers().where(
        (F.col("label") == 1) & (F.col("rank") == 1)
    ).collect()[0]["vec_id"]
    moved = emb.where(F.col("vec_id") == first).select(
        "vec_id", "embedding", F.lit(1).cast("int").alias("label")
    ).select("vec_id", "embedding", "label")
    nulled = spark.createDataFrame(
        [(tomb, None, 1)], "vec_id long, embedding array<float>, label int"
    )
    mv.process_batch(moved.unionByName(nulled), 1)
    rebuilt = emb.where(F.col("vec_id") != tomb).withColumn(
        "label",
        F.when(F.col("vec_id") == first, F.lit(1)).otherwise(F.col("label")),
    )
    assert _out_res(mv.outliers()) == _out_res(embedding_outliers(rebuilt))
