"""Streaming MinHash-LSH near-dup detection must (a) compute the exact
batch band keys as a pure projection and (b) emit, over a full stream,
exactly the batch operator's candidate pair set."""

import pandas as pd
from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.dedup import minhash_lsh_pairs
from cuda_gis_smoothing_spark.streaming.dedup import (
    DOCS_SCHEMA,
    _banded_keys,
    minhash_neardup_stream,
    read_docs_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_projection_band_keys_equal_batch_aggregation(spark):
    """The nested higher-order-expression signature (streaming-legal)
    must equal the batch explode→groupBy(min) signature bit-for-bit."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from cuda_gis_smoothing_spark.operators.dedup import MH_PRIME, minhash_signatures

    stream_keys = _banded_keys(docs, n_hashes=6, bands=3)
    sig = minhash_signatures(docs, n_hashes=6)
    batch_cols = []
    for b in range(3):
        expr = (F.col(f"mh_{2 * b}") * 8191 + F.col(f"mh_{2 * b + 1}")) % MH_PRIME
        batch_cols.append(
            F.struct(F.lit(b).alias("band"), expr.alias("bh"))
        )
    batch_keys = sig.select(
        "doc_id", F.explode(F.array(*batch_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    diff = stream_keys.exceptAll(batch_keys).union(
        batch_keys.exceptAll(stream_keys)
    )
    assert diff.count() == 0


def test_streaming_neardup_pairs_equal_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").orderBy("doc_id")
    pdf = docs.toPandas()
    mid = len(pdf) // 2
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    rows = []

    def sink(df, _bid):
        rows.extend(df.collect())

    def run():
        q = (
            minhash_neardup_stream(
                read_docs_stream(spark, src, max_files=1), max_bucket=100_000
            )
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    for lo, hi in ((0, mid), (mid, len(pdf))):
        spark.createDataFrame(pdf.iloc[lo:hi], schema=DOCS_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(src)
        run()

    got = {(r.doc_a, r.doc_b) for r in rows}
    want = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ).collect()
    }
    assert got == want and len(want) > 0
