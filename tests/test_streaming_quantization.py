"""Maintained incremental PQ codes (streaming/quantization.py):
(a) a single-batch state equals pq_encode bit-for-bit, and its ADC
search equals pq_search (the driver gate's equality); (b) a multi-
batch build equals the batch encode over the same corpus; (c) a delta
write is O(batch vectors); (d) a re-ingested vec_id REPLACES its codes
and search tracks the update; (e) a NULL-embedding re-ingest is a
TOMBSTONE (vector leaves the served index — the stale-postings
lesson); (f) crash replay of an applied batch is a no-op; (g) the
streaming wiring feeds the same process_batch."""

from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.quantization import pq_encode, pq_search
from cuda_gis_smoothing_spark.streaming.quantization import MaintainedPQ

SF_DIR = "/root/testdata/sf0.001"
M, KSUB = 8, 16


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


def _codes(df):
    return {(r.vec_id, r.subspace, r.code) for r in df.collect()}


def _res(df):
    return {(r.query_id, r.neighbor_id, r.adc_dist, r.rank) for r in df.collect()}


def test_single_batch_equals_pq_encode_and_search(spark, tmp_path):
    emb = _emb(spark)
    mpq = MaintainedPQ.seeded(spark, str(tmp_path / "s"), emb, m=M, ksub=KSUB)
    mpq.process_batch(emb, 0)
    assert _codes(mpq.codes()) == _codes(pq_encode(emb, m=M, ksub=KSUB))
    got = _res(mpq.search(_queries(spark), k=5))
    want = _res(pq_search(emb, _queries(spark), k=5, m=M, ksub=KSUB))
    assert got == want and len(want) > 0


def test_multibatch_equals_batch_encode(spark, tmp_path):
    emb = _emb(spark)
    mpq = MaintainedPQ.seeded(
        spark, str(tmp_path / "s"), emb, m=M, ksub=KSUB, compact_every=2
    )
    for bid, (lo, hi) in enumerate(((0, 150), (150, 300), (300, 10**9))):
        mpq.process_batch(
            emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), bid
        )
    assert _codes(mpq.codes()) == _codes(pq_encode(emb, m=M, ksub=KSUB))


def test_delta_write_is_o_batch(spark, tmp_path):
    emb = _emb(spark)
    mpq = MaintainedPQ.seeded(spark, str(tmp_path / "s"), emb, m=M, ksub=KSUB)
    mpq.process_batch(emb, 0)
    two = emb.orderBy("vec_id").limit(2).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    mpq.process_batch(two, 1)
    delta = spark.read.parquet(str(tmp_path / "s" / "codes" / "delta-b00000001"))
    assert delta.count() == 2  # O(delta), not a corpus re-encode


def test_vector_update_replaces_codes(spark, tmp_path):
    """Re-ingest vec 400 with vec 0's embedding: its stored codes must
    become vec 0's, and equal a batch encode (against the SAME frozen
    codebook) over the updated corpus."""
    from cuda_gis_smoothing_spark.operators.quantization import pq_encode_against

    emb = _emb(spark)
    mpq = MaintainedPQ.seeded(spark, str(tmp_path / "s"), emb, m=M, ksub=KSUB)
    mpq.process_batch(emb, 0)
    donor = emb.where(F.col("vec_id") == 0).select(
        F.lit(400).cast("long").alias("vec_id"), "embedding"
    )
    mpq.process_batch(donor, 1)
    got = _codes(mpq.codes())
    updated = emb.where(F.col("vec_id") != 400).unionByName(donor)
    want = _codes(pq_encode_against(updated, mpq.codebook, M))
    assert got == want
    c0 = {(s, c) for v, s, c in got if v == 0}
    c400 = {(s, c) for v, s, c in got if v == 400}
    assert {(s, c) for s, c in c400} == c0


def test_null_embedding_tombstones(spark, tmp_path):
    emb = _emb(spark)
    mpq = MaintainedPQ.seeded(spark, str(tmp_path / "s"), emb, m=M, ksub=KSUB)
    mpq.process_batch(emb, 0)
    n0 = mpq.codes().select("vec_id").distinct().count()
    gone = spark.createDataFrame(
        [(450,)], "vec_id long"
    ).withColumn("embedding", F.lit(None).cast("array<float>"))
    mpq.process_batch(gone, 1)
    served = mpq.codes()
    assert served.where(F.col("vec_id") == 450).count() == 0
    assert served.select("vec_id").distinct().count() == n0 - 1
    assert all(r.neighbor_id != 450 for r in mpq.search(_queries(spark), k=5).collect())


def test_crash_replay_noop(spark, tmp_path):
    emb = _emb(spark)
    mpq = MaintainedPQ.seeded(spark, str(tmp_path / "s"), emb, m=M, ksub=KSUB)
    mpq.process_batch(emb.where(F.col("vec_id") < 100), 0)
    before = _codes(mpq.codes())
    # replay batch 0 with DIFFERENT content — must be ignored (applied)
    mpq.process_batch(emb.where(F.col("vec_id") < 5), 0)
    assert _codes(mpq.codes()) == before


def test_streaming_wiring(spark, tmp_path):
    emb = _emb(spark)
    src = str(tmp_path / "src")
    emb.where(F.col("vec_id") < 200).write.parquet(f"{src}/part0")
    emb.where(F.col("vec_id") >= 200).write.parquet(f"{src}/part1")
    mpq = MaintainedPQ.seeded(spark, str(tmp_path / "s"), emb, m=M, ksub=KSUB)
    q = mpq.start(f"{src}/part*", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _codes(mpq.codes()) == _codes(pq_encode(emb, m=M, ksub=KSUB))
