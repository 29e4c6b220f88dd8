"""Maintained chunk-line dedup state (streaming/lines.py): (a) a
multi-batch-built state with ascending doc ids serves line_dedup
IDENTICALLY to the batch operator over the union; (b) a delta write is
O(batch chunk vocabulary), never O(corpus); (c) a re-ingested doc
replaces its df contributions exactly while first_key stays
append-only (the immutable-selection contract — including the
first-owner-left-the-corpus drop-everywhere consequence); (d) crash
replay in the multi-log write window converges; (e) the streaming
wiring feeds the same process_batch."""

import os

from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.dedup import boilerplate_chunks, line_dedup
from cuda_gis_smoothing_spark.streaming.lines import MaintainedLines

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _as_set(df):
    return {
        (r.doc_id, r.n_chunks, r.n_kept, r.n_dropped, r.new_text)
        for r in df.collect()
    }


def test_multibatch_append_equals_batch(spark, tmp_path):
    """Ascending-id batches: first-ever-observed == global min key, so
    the served table equals the batch rebuild exactly (incl. NULL-text
    docs and the compaction survival)."""
    docs = _docs(spark)
    ml = MaintainedLines(spark, str(tmp_path / "state"), compact_every=2)
    for bid, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 10**9))):
        ml.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    assert _as_set(ml.line_dedup()) == _as_set(line_dedup(docs))
    n_docs, n_occ = ml.stats_row()
    assert n_docs == docs.count()
    assert any(
        d.startswith("base-") for d in os.listdir(tmp_path / "state" / "doc_chunks")
    )


def test_multibatch_boilerplate_equals_batch(spark, tmp_path):
    """The maintained (df, occ, chunk-text) stats serve the
    boilerplate audit identically to the batch rebuild — ordered rows,
    not just sets (the cut is a total order on the served columns)."""
    docs = _docs(spark)
    ml = MaintainedLines(spark, str(tmp_path / "state"), compact_every=2)
    for bid, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 10**9))):
        ml.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    got = [tuple(r) for r in ml.boilerplate_chunks().collect()]
    want = [tuple(r) for r in boilerplate_chunks(docs).collect()]
    assert got == want and len(want) > 0


def test_doc_update_occurrences_exact(spark, tmp_path):
    """Re-ingesting a doc replaces its OCCURRENCE contributions (not
    just its distinct-doc df): doc 1 goes from 2 copies of the chunk
    to 0, doc 2 still holds 3 — served n_occurrences must be 3."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    ml = MaintainedLines(spark, str(tmp_path / "state"), width=4)
    ml.process_batch(
        mk([(1, "a b c d a b c d"), (2, "a b c d a b c d a b c d")]), 0
    )
    top0 = ml.boilerplate_chunks().collect()
    assert (top0[0].chunk, top0[0].n_docs, top0[0].n_occurrences) == (
        "a b c d", 2, 5,
    )
    ml.process_batch(mk([(1, "x y z w")]), 1)
    # df falls below min_dup_docs → filtered; lower the serve threshold
    top1 = {r.chunk: r for r in ml.boilerplate_chunks(min_df=1).collect()}
    assert top1["a b c d"].n_docs == 1 and top1["a b c d"].n_occurrences == 3
    assert top1["x y z w"].n_occurrences == 1


def test_delta_writes_are_o_batch(spark, tmp_path):
    docs = _docs(spark)
    ml = MaintainedLines(spark, str(tmp_path / "state"))
    ml.process_batch(docs, 0)
    corpus_chunks = spark.read.parquet(
        str(tmp_path / "state" / "chunk_stats" / "delta-b00000000")
    ).count()
    two = (
        docs.where(F.col("text").isNotNull())
        .orderBy("doc_id")
        .limit(2)
        .withColumn("doc_id", F.col("doc_id") + 100000)
    )
    ml.process_batch(two, 1)
    doc_delta = spark.read.parquet(
        str(tmp_path / "state" / "doc_chunks" / "delta-b00000001")
    )
    assert doc_delta.count() == 2
    ch_delta = spark.read.parquet(
        str(tmp_path / "state" / "chunk_stats" / "delta-b00000001")
    )
    touched = doc_delta.select(F.explode("_ch").alias("_p")).select(
        "_p.d"
    ).distinct().count()
    assert ch_delta.count() <= touched < corpus_chunks


def test_doc_update_df_exact_and_selection_append_only(spark, tmp_path):
    """Doc 1 and 2 share a chunk; doc 1 owns first_key. Updating doc 1
    to drop the chunk decrements df exactly — and because selection is
    append-only, the chunk (now df=1 for doc 2) is KEPT by the df
    threshold; a third doc re-raising df>=2 drops it EVERYWHERE (the
    documented first-owner-left consequence)."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    ml = MaintainedLines(spark, str(tmp_path / "state"), width=4)
    ml.process_batch(mk([(1, "a b c d"), (2, "a b c d"), (3, None)]), 0)
    out0 = {r.doc_id: r for r in ml.line_dedup().collect()}
    assert out0[1].new_text == "a b c d" and out0[2].new_text == ""
    assert out0[3].new_text is None and out0[3].n_chunks == 0
    # update doc 1: the shared chunk's df drops to 1 → doc 2 keeps it
    ml.process_batch(mk([(1, "x y z w")]), 1)
    out1 = {r.doc_id: r for r in ml.line_dedup().collect()}
    assert out1[1].new_text == "x y z w"
    assert out1[2].new_text == "a b c d"
    import hashlib

    stats = {r.d: r for r in ml.chunk_stats().collect()}
    # df tracked exactly; first_key still doc 1's original claim
    shared = stats[hashlib.md5(b"a b c d").hexdigest()]
    assert shared.df == 1 and shared.first_key == 1 * (1 << 30) + 0
    # doc 4 re-raises df to 2: no current occurrence matches the stale
    # first_key → the chunk drops everywhere
    ml.process_batch(mk([(4, "a b c d")]), 2)
    out2 = {r.doc_id: r for r in ml.line_dedup().collect()}
    assert out2[2].new_text == "" and out2[4].new_text == ""


def test_crash_replay_converges(spark, tmp_path):
    """Forged crash: the doc_chunks delta lands but the stats guard
    does not — replaying the batch must converge to the clean state
    (before_batch_id keeps the diff from seeing the crashed delta)."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    rows0 = [(1, "a b c d e f g h"), (2, "a b c d e f g h q r")]
    rows1 = [(5, "a b c d e f g h"), (6, "fresh text never repeated")]
    clean = MaintainedLines(spark, str(tmp_path / "clean"))
    clean.process_batch(mk(rows0), 0)
    clean.process_batch(mk(rows1), 1)
    crashed = MaintainedLines(spark, str(tmp_path / "crashed"))
    crashed.process_batch(mk(rows0), 0)
    # forge the crash window: only the doc-slice delta of batch 1 lands
    from cuda_gis_smoothing_spark.streaming.lines import _doc_chunk_slices

    crashed.log.write_delta(_doc_chunk_slices(mk(rows1), crashed.width), 1)
    assert not crashed.stats_log.has(1)
    crashed.process_batch(mk(rows1), 1)  # the replay
    assert _as_set(crashed.line_dedup()) == _as_set(clean.line_dedup())
    assert crashed.stats_row() == clean.stats_row()
    # an applied batch replayed again is a no-op
    crashed.process_batch(mk(rows1), 1)
    assert crashed.stats_row() == clean.stats_row()


def test_streaming_wiring(spark, tmp_path):
    docs = _docs(spark).limit(60).localCheckpoint()
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    ml = MaintainedLines(spark, str(tmp_path / "state"))
    q = ml.start(src, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _as_set(ml.line_dedup()) == _as_set(line_dedup(docs))
