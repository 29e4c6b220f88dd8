"""Maintained bigram/co-occurrence statistics (streaming/cooccur.py):
(a) a multi-batch-built state must serve bigram_pmi IDENTICALLY to the
batch operator over the same corpus; (b) a delta write is O(batch) /
O(batch vocabulary), never O(corpus); (c) a re-ingested doc REPLACES
its count contributions (old-slice decrements) and a NULL-text update
removes them; (d) crash replay in the multi-log write window converges;
(e) the streaming wiring feeds the same process_batch."""

import os

from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.functions.text import bigram_pmi
from cuda_gis_smoothing_spark.streaming.cooccur import MaintainedBigrams
from cuda_gis_smoothing_spark.streaming.dedup import DOCS_SCHEMA

SF_DIR = "/root/testdata/sf0.001"
K = 40


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _pmi_set(df):
    return {(r.t1, r.t2, r.n_pairs, r.pmi, r.rank) for r in df.collect()}


def test_multibatch_state_equals_batch_pmi(spark, tmp_path):
    docs = _docs(spark)
    mb = MaintainedBigrams(spark, str(tmp_path / "state"), compact_every=2)
    for bid, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 10**9))):
        mb.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    got = _pmi_set(mb.bigram_pmi(k=K))
    want = _pmi_set(bigram_pmi(docs, k=K))
    assert got == want and len(want) == K
    # maintained totals equal the batch rebuild's exact integer sums
    t_tot, b_tot = mb.stats_row()
    toks = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("t")).where(
        F.col("t") != ""
    )
    assert t_tot == toks.count()
    # compaction fired (compact_every=2) and the view survived it
    assert any(
        d.startswith("base-") for d in os.listdir(tmp_path / "state" / "doc_grams")
    )
    assert any(
        d.startswith("base-") for d in os.listdir(tmp_path / "state" / "bigrams")
    )


def test_delta_writes_are_o_batch(spark, tmp_path):
    docs = _docs(spark)
    mb = MaintainedBigrams(spark, str(tmp_path / "state"))
    mb.process_batch(docs, 0)  # big batch: the whole corpus
    corpus_bigrams = spark.read.parquet(
        str(tmp_path / "state" / "bigrams" / "delta-b00000000")
    ).count()
    two = docs.where(F.col("text").isNotNull()).orderBy("doc_id").limit(2).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    mb.process_batch(two, 1)
    doc_delta = spark.read.parquet(
        str(tmp_path / "state" / "doc_grams" / "delta-b00000001")
    )
    assert doc_delta.count() == 2  # O(batch docs), not a corpus rewrite
    big_delta = spark.read.parquet(
        str(tmp_path / "state" / "bigrams" / "delta-b00000001")
    )
    # only bigrams TOUCHED by the two docs, never the corpus table
    touched = doc_delta.select(F.explode("_big")).distinct().count()
    assert big_delta.count() <= touched < corpus_bigrams
    sdelta = spark.read.parquet(str(tmp_path / "state" / "stats" / "delta-b00000001"))
    assert sdelta.count() == 1


def test_doc_update_and_tombstone_track_batch(spark, tmp_path):
    """A re-ingest REPLACES the doc's count contributions (old slice
    decremented, new added); a NULL-text re-ingest removes them — each
    time the served PMI equals the batch operator over the corpus the
    state currently represents."""
    docs = _docs(spark)
    mb = MaintainedBigrams(spark, str(tmp_path / "state"))
    mb.process_batch(docs, 0)
    victim = (
        docs.where(F.col("text").isNotNull()).orderBy("doc_id").limit(1).collect()[0]
    )
    new_text = "the the the zzznew pair"
    update = spark.createDataFrame(
        [(victim.doc_id, new_text, victim.lang, victim.source, len(new_text))],
        DOCS_SCHEMA,
    )
    mb.process_batch(update, 1)
    corpus = docs.where(F.col("doc_id") != victim.doc_id).unionByName(update)
    assert _pmi_set(mb.bigram_pmi(k=K)) == _pmi_set(bigram_pmi(corpus, k=K))
    # and the new bigram really is in the maintained table
    assert (
        mb.bigram_counts()
        .where((F.col("t1") == "zzznew") & (F.col("t2") == "pair"))
        .collect()[0]
        .cnt
        == 1
    )

    kill = spark.createDataFrame(
        [(victim.doc_id, None, victim.lang, victim.source, 0)], DOCS_SCHEMA
    )
    mb.process_batch(kill, 2)
    corpus2 = docs.where(F.col("doc_id") != victim.doc_id).unionByName(kill)
    assert _pmi_set(mb.bigram_pmi(k=K)) == _pmi_set(bigram_pmi(corpus2, k=K))
    assert (
        mb.bigram_counts()
        .where((F.col("t1") == "zzznew") & (F.col("t2") == "pair"))
        .count()
        == 0
    )


def test_crash_between_count_and_stats_writes(spark, tmp_path):
    """Forged crash in the four-log write window: doc_grams + count
    deltas landed for a batch, the stats guard row did not. The replay
    must read PRIOR state only (before_batch_id) and converge to the
    clean-run state."""
    import shutil

    docs = _docs(spark)
    mb = MaintainedBigrams(spark, str(tmp_path / "state"))
    mb.process_batch(docs.where(F.col("doc_id") < 250), 0)
    mb.process_batch(docs.where(F.col("doc_id") >= 250), 1)
    clean = _pmi_set(mb.bigram_pmi(k=K))

    shutil.rmtree(str(tmp_path / "state" / "stats" / "delta-b00000001"))
    assert not mb.stats_log.has(1) and mb.log.has(1) and mb.big_log.has(1)
    mb.process_batch(docs.where(F.col("doc_id") >= 250), 1)  # replay
    assert _pmi_set(mb.bigram_pmi(k=K)) == clean

    # replay of a fully applied batch: no-op even with changed input
    mb.process_batch(
        docs.where(F.col("doc_id") >= 250).withColumn("text", F.lit("junk junk")), 1
    )
    assert _pmi_set(mb.bigram_pmi(k=K)) == clean


def test_stream_wiring_builds_same_state(spark, tmp_path):
    docs = _docs(spark)
    src = str(tmp_path / "src")
    for i, (lo, hi) in enumerate(((0, 250), (250, 10**9))):
        docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.parquet(f"{src}/part{i}")
    mb = MaintainedBigrams(spark, str(tmp_path / "state"))
    q = mb.start(f"{src}/part*", str(tmp_path / "ckpt"))
    assert q.awaitTermination(180), "availableNow query did not finish"
    assert _pmi_set(mb.bigram_pmi(k=K)) == _pmi_set(bigram_pmi(docs, k=K))


def test_windowed_multibatch_equals_batch_cooccurrence(spark, tmp_path):
    """window=3 instance: multi-batch state + a doc UPDATE serve the
    SAME top-k windowed pair table as the batch operator over the
    final corpus; bigram_pmi refuses on a windowed instance."""
    import pytest

    from cuda_gis_smoothing_spark.functions.text import cooccurrence_window

    docs = _docs(spark)
    mb = MaintainedBigrams(
        spark, str(tmp_path / "state"), compact_every=2, window=3
    )
    for bid, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 10**9))):
        mb.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    # update one doc's text: latest-wins, old pair contributions leave
    upd = spark.createDataFrame(
        [(5, "alpha beta alpha gamma")], "doc_id long, text string"
    )
    mb.process_batch(upd, 3)
    final = (
        docs.select("doc_id", "text")
        .where(F.col("doc_id") != 5)
        .unionByName(upd)
    )
    got = {
        (r.t1, r.t2, r.n_pairs, r.rank)
        for r in mb.cooccurrence(k=K).collect()
    }
    want = {
        (r.t1, r.t2, r.n_pairs, r.rank)
        for r in cooccurrence_window(final, window=3, k=K).collect()
    }
    assert got == want and len(want) == K
    with pytest.raises(ValueError, match="adjacent-bigram-only"):
        mb.bigram_pmi(k=5)


def test_windowed_textrank_from_state_equals_batch(spark, tmp_path):
    """Maintained TextRank (graph recovered from the pair log after
    multi-batch ingest + a doc update) == the batch operator over the
    final corpus."""
    from cuda_gis_smoothing_spark.functions.text import keyword_textrank

    docs = _docs(spark)
    mb = MaintainedBigrams(spark, str(tmp_path / "state"), window=3)
    mb.process_batch(docs.where(F.col("doc_id") < 200), 0)
    mb.process_batch(docs.where(F.col("doc_id") >= 200), 1)
    upd = spark.createDataFrame(
        [(7, "alpha beta gamma delta")], "doc_id long, text string"
    )
    mb.process_batch(upd, 2)
    final = (
        docs.select("doc_id", "text")
        .where(F.col("doc_id") != 7)
        .unionByName(upd)
    )
    got = [(r.token, r.pagerank, r.rank) for r in mb.textrank(k=25).collect()]
    want = [
        (r.token, r.pagerank, r.rank)
        for r in keyword_textrank(final, window=3, k=25).collect()
    ]
    assert got == want and len(want) == 25
