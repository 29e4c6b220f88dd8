"""Incremental sequence packing: (a) one whole-corpus batch ==
pack_sequences exactly; (b) doc_id-ordered multi-batch == the batch
operator (placement of earlier batches immutable); (c) per-batch delta
is O(batch); (d) crash between the placed and totals writes replays to
the identical state; (e) replay of an applied batch is a no-op."""

from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.packing import pack_sequences
from cuda_gis_smoothing_spark.streaming.packing import IncrementalPacker

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _placed_set(df):
    return {
        (r.doc_id, r.n_tokens, r.start_seq, r.seq_offset) for r in df.collect()
    }


def test_single_batch_equals_batch_packing(spark, tmp_path):
    pk = IncrementalPacker(spark, str(tmp_path / "state"))
    pk.process_batch(_docs(spark), 0)
    assert _placed_set(pk.current_placed()) == _placed_set(
        pack_sequences(_docs(spark))
    )


def test_ordered_multibatch_equals_batch_packing(spark, tmp_path):
    docs = _docs(spark)
    pk = IncrementalPacker(spark, str(tmp_path / "state"), compact_every=2)
    for bid, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 10**9))):
        pk.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    assert _placed_set(pk.current_placed()) == _placed_set(pack_sequences(docs))


def test_delta_is_o_batch_and_earlier_placement_immutable(spark, tmp_path):
    docs = _docs(spark)
    pk = IncrementalPacker(spark, str(tmp_path / "state"))
    pk.process_batch(docs, 0)
    before = _placed_set(pk.current_placed())
    three = docs.orderBy("doc_id").limit(3).withColumn(
        "doc_id", F.col("doc_id") + 700000
    )
    pk.process_batch(three, 1)
    delta = spark.read.parquet(str(tmp_path / "state" / "placed" / "delta-b00000001"))
    assert delta.count() == 3  # O(batch), not a repack
    after = _placed_set(pk.current_placed())
    assert before <= after and len(after) == len(before) + 3


def test_reingested_doc_id_raises(spark, tmp_path):
    """Packed placements are immutable (shards already written): a
    doc_id reappearing in a later batch would be latest-wins-
    overwritten while totals advanced by its tokens — an orphaned
    hole. The strict_unique guard must refuse the batch; with the
    guard off the caller owns the contract."""
    import pytest

    docs = _docs(spark)
    pk = IncrementalPacker(spark, str(tmp_path / "state"))
    first = docs.orderBy("doc_id").limit(5)
    pk.process_batch(first, 0)
    with pytest.raises(ValueError, match="re-ingest"):
        pk.process_batch(first.limit(1), 1)
    # the refused batch left no state: replaying with fresh ids works
    assert not pk.totals_log.has(1)
    fresh = first.limit(1).withColumn("doc_id", F.col("doc_id") + 900000)
    pk.process_batch(fresh, 1)
    assert pk.totals_log.has(1)


def test_intra_batch_duplicate_doc_id_raises(spark, tmp_path):
    """Duplicate ids WITHIN a batch bypass the prior-state probe but
    corrupt the layout the same way (both rows get placements and
    advance totals, latest-wins keeps one placed row — an orphaned
    hole). The strict_unique guard must refuse the batch before any
    state is written (ADVICE r4)."""
    import pytest

    docs = _docs(spark)
    pk = IncrementalPacker(spark, str(tmp_path / "state"))
    one = docs.orderBy("doc_id").limit(1)
    dup_batch = one.unionByName(one)
    with pytest.raises(ValueError, match="within the batch"):
        pk.process_batch(dup_batch, 0)
    # the refused batch left no state on EITHER log
    assert not pk.totals_log.has(0) and not pk.placed_log.has(0)
    pk.process_batch(one, 0)  # the deduped batch proceeds normally
    assert pk.totals_log.has(0)


def test_crash_between_placed_and_totals_writes(spark, tmp_path):
    import shutil

    docs = _docs(spark)
    pk = IncrementalPacker(spark, str(tmp_path / "state"))
    half = docs.where(F.col("doc_id") < 250)
    rest = docs.where(F.col("doc_id") >= 250)
    pk.process_batch(half, 0)
    pk.process_batch(rest, 1)
    clean = _placed_set(pk.current_placed())

    # forge the crash: placed delta for batch 1 landed, totals did not
    shutil.rmtree(str(tmp_path / "state" / "totals" / "delta-b00000001"))
    assert not pk.totals_log.has(1) and pk.placed_log.has(1)
    pk.process_batch(rest, 1)  # replay — base must still be batch-0 totals
    assert _placed_set(pk.current_placed()) == clean

    # replay of a fully applied batch: no-op even with changed input
    pk.process_batch(half.withColumn("text", F.lit("x")), 1)
    assert _placed_set(pk.current_placed()) == clean
