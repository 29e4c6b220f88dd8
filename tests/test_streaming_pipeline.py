"""End-to-end streaming corpus build: IncrementalCurator batches chain
into IncrementalPacker (each batch's curated DELTA — which carries
n_tokens but no text — becomes a packer batch), and the final shard
layout equals packing the concatenated curated outputs in batch
arrival order. This is the full pipeline a production corpus build
runs continuously: filter/dedup state + shard layout state advancing
together, both crash-safe per their own logs."""

from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.streaming.curate import IncrementalCurator
from cuda_gis_smoothing_spark.streaming.packing import IncrementalPacker

SF_DIR = "/root/testdata/sf0.001"
L = 128


def test_curate_then_pack_streaming_chain(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cur = IncrementalCurator(spark, str(tmp_path / "cur"))
    pk = IncrementalPacker(spark, str(tmp_path / "pk"), seq_len=L)

    curated_batches = []
    for bid, (lo, hi) in enumerate(((0, 250), (250, 10**9))):
        cur.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
        delta = spark.read.parquet(
            str(tmp_path / "cur" / "curated" / f"delta-b{bid:08d}")
        )
        pk.process_batch(delta, bid)
        curated_batches.append(
            sorted(
                (r.doc_id, r.n_tokens) for r in delta.select("doc_id", "n_tokens").collect()
            )
        )
    assert all(len(b) > 0 for b in curated_batches)

    # independent expectation: concat-and-chunk over the concatenated
    # curated outputs in batch arrival order
    acc, want = 0, {}
    for batch in curated_batches:
        for doc_id, n in batch:
            want[doc_id] = (n, acc // L, acc % L)
            acc += n
    got = {
        r.doc_id: (r.n_tokens, r.start_seq, r.seq_offset)
        for r in pk.current_placed().collect()
    }
    assert got == want
    # and the layouts really interleave batches (batch 1 continues
    # inside batch 0's trailing partial sequence, not at a fresh seq)
    b0_tokens = sum(n for _, n in curated_batches[0])
    first_b1 = curated_batches[1][0][0]
    assert want[first_b1][2] == b0_tokens % L
