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


def test_minhash_neardup_eventtime_ttl_prunes_aged_members(spark, tmp_path):
    """Event-time TTL on the near-dup stream: a bucket member whose
    last-seen event time has aged past the watermark horizon stops
    generating pairs — driven entirely by data timestamps (no sleeps).
      f1 (T0):      doc 1 "shared payload"
      f2 (T0+10m):  unrelated doc (advances the watermark past T0+ttl)
      f3 (T0+11m):  doc 5 "shared payload" -> NO pair (1 aged out)
    With ttl = 1h over the same files, the (1, 5) pair IS emitted."""
    import datetime as _dt

    import pandas as pd

    from cuda_gis_smoothing_spark.streaming.dedup import (
        DOCS_TS_SCHEMA,
        minhash_neardup_stream_eventtime,
    )

    T0 = _dt.datetime(2026, 1, 1, 0, 0, 0)

    def _write(src, doc_id, text, minutes):
        ts = T0 + _dt.timedelta(minutes=minutes)
        spark.createDataFrame(
            [(doc_id, text, "en", "synth", len(text), ts)], schema=DOCS_TS_SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)

    def _run(src, ckpt, ttl_ms):
        rows = []

        def sink(df, _bid):
            rows.extend(df.collect())

        stream = (
            spark.readStream.schema(DOCS_TS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            minhash_neardup_stream_eventtime(stream, ttl_ms=ttl_ms)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return pd.DataFrame(
            [r.asDict() for r in rows],
            columns=["doc_a", "doc_b", "band", "bh"],
        )

    for name, ttl_ms, expect_pair in (
        ("short", 60_000, False),
        ("long", 3_600_000, True),
    ):
        src = str(tmp_path / f"src_{name}")
        ckpt = str(tmp_path / f"ckpt_{name}")
        _write(src, 1, "shared payload text here", 0)
        _write(src, 3, "totally different words entirely", 10)
        _write(src, 5, "shared payload text here", 11)
        got = _run(src, ckpt, ttl_ms)
        pairs = {(r.doc_a, r.doc_b) for r in got.itertuples(index=False)}
        assert ((1, 5) in pairs) is expect_pair, (name, pairs)
