"""Maintained incremental BM25 postings (streaming/retrieval.py):
(a) a multi-batch-built index must search IDENTICALLY to batch
bm25_search over the same corpus; (b) a delta write is O(batch docs),
never O(corpus); (c) a re-ingested doc REPLACES its postings
(latest-wins document update) and the search tracks the updated
corpus exactly; (d) crash replay of an applied batch id is a no-op;
(e) the streaming wiring feeds the same process_batch."""

import os

from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.retrieval import bm25_search
from cuda_gis_smoothing_spark.streaming.dedup import DOCS_SCHEMA
from cuda_gis_smoothing_spark.streaming.retrieval import MaintainedPostings

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _search_set(df):
    return {(r.query_id, r.doc_id, r.bm25) for r in df.collect()}


def _queries(spark):
    return spark.createDataFrame(
        [(1, "spark"), (1, "join"), (2, "the"), (3, "filter")],
        "query_id long, term string",
    )


def test_multibatch_index_equals_batch_search(spark, tmp_path):
    docs = _docs(spark)
    idx = MaintainedPostings(spark, str(tmp_path / "state"), compact_every=2)
    cuts = ((0, 170), (170, 340), (340, 10**9))
    for bid, (lo, hi) in enumerate(cuts):
        idx.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    got = _search_set(idx.search(_queries(spark), k=25))
    want = _search_set(bm25_search(docs, _queries(spark), k=25))
    assert got == want and len(want) > 0
    # compaction fired (compact_every=2) and the view survived it
    assert any(
        d.startswith("base-") for d in os.listdir(tmp_path / "state" / "doc_postings")
    )


def test_delta_write_is_o_batch(spark, tmp_path):
    docs = _docs(spark)
    idx = MaintainedPostings(spark, str(tmp_path / "state"))
    idx.process_batch(docs, 0)  # big batch: the whole corpus
    two = docs.orderBy("doc_id").limit(2).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    idx.process_batch(two, 1)
    delta = spark.read.parquet(
        str(tmp_path / "state" / "doc_postings" / "delta-b00000001")
    )
    assert delta.count() == 2  # O(delta), not a corpus rewrite


def test_doc_update_replaces_postings(spark, tmp_path):
    docs = _docs(spark)
    idx = MaintainedPostings(spark, str(tmp_path / "state"))
    idx.process_batch(docs, 0)
    victim = docs.orderBy("doc_id").limit(1).collect()[0]
    new_text = "spark spark spark join"
    update = spark.createDataFrame(
        [(victim.doc_id, new_text, victim.lang, victim.source, len(new_text))],
        DOCS_SCHEMA,
    )
    idx.process_batch(update, 1)
    # the maintained index over (corpus with the doc's text replaced)
    updated_corpus = docs.where(F.col("doc_id") != victim.doc_id).unionByName(
        update
    )
    got = _search_set(idx.search(_queries(spark), k=25))
    want = _search_set(bm25_search(updated_corpus, _queries(spark), k=25))
    assert got == want
    # and the stored row really is the new posting slice
    row = (
        idx.postings()
        .where(F.col("doc_id") == victim.doc_id)
        .orderBy("term")
        .collect()
    )
    assert [(r.term, r._tf) for r in row] == [("join", 1.0), ("spark", 3.0)]


def test_null_text_update_tombstones_doc(spark, tmp_path):
    """A re-ingest that NULLs a doc's text must REMOVE it from the
    index (ADVICE r4): zero emitted postings rows would leave the old
    slice alive under latest-wins, so process_batch writes an explicit
    tombstone and search() excludes it from postings AND (N, avgdl)."""
    docs = _docs(spark)
    idx = MaintainedPostings(spark, str(tmp_path / "state"))
    idx.process_batch(docs, 0)
    victim = (
        docs.where(F.col("text").isNotNull()).orderBy("doc_id").limit(1).collect()[0]
    )
    update = spark.createDataFrame(
        [(victim.doc_id, None, victim.lang, victim.source, 0)], DOCS_SCHEMA
    )
    idx.process_batch(update, 1)
    # the stored postings no longer contain the doc
    assert (
        idx.postings().where(F.col("doc_id") == victim.doc_id).count() == 0
    )
    # search equals batch bm25_search over the corpus with the doc's
    # text nulled (which bm25_search drops from the index entirely)
    updated_corpus = docs.where(F.col("doc_id") != victim.doc_id).unionByName(update)
    got = _search_set(idx.search(_queries(spark), k=25))
    want = _search_set(bm25_search(updated_corpus, _queries(spark), k=25))
    assert got == want and len(want) > 0


def test_replay_of_applied_batch_is_noop(spark, tmp_path):
    docs = _docs(spark)
    idx = MaintainedPostings(spark, str(tmp_path / "state"))
    idx.process_batch(docs, 0)
    before = _search_set(idx.search(_queries(spark)))
    junk = docs.limit(3).withColumn("text", F.lit("zzz zzz"))
    idx.process_batch(junk, 0)  # same batch id: must not apply
    assert _search_set(idx.search(_queries(spark))) == before


def _batch_vocab(spark, docs, min_df=1):
    """The batch rebuild the maintained dfreq/stats logs must equal:
    distinct (doc, token) df + text-IS-NOT-NULL N (the vocab_df_idf
    gate's original one-shot form)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.dedup import _doc_tokens

    toks = _doc_tokens(docs, "text", "doc_id", None)
    df_tab = toks.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = docs.where(F.col("text").isNotNull()).agg(
        F.count(F.lit(1)).cast("double").alias("_N")
    )
    idf = F.log(
        F.lit(1.0) + (F.col("_N") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    return (
        df_tab.where(F.col("df") >= min_df)
        .crossJoin(F.broadcast(n))
        .select(F.col("t").alias("token"), "df", round6(idf).alias("idf"))
    )


def _vocab_set(df):
    return {(r.token, r.df, r.idf) for r in df.collect()}


def test_maintained_vocab_multibatch_and_update_equals_batch(spark, tmp_path):
    """The maintained dfreq/stats logs (VERDICT r4 #4): a multi-batch
    build, a doc UPDATE (old-row df decrements + new increments), and a
    NULL-text tombstone update must each leave vocab_df_idf equal to
    the batch rebuild over the corpus the log currently represents."""
    docs = _docs(spark)
    idx = MaintainedPostings(spark, str(tmp_path / "state"), compact_every=2)
    for bid, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 10**9))):
        idx.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    got = _vocab_set(idx.vocab_df_idf())
    want = _vocab_set(_batch_vocab(spark, docs))
    assert got == want and len(want) > 0

    # doc UPDATE: the victim's old tokens must DECREMENT df
    victim = docs.where(F.col("text").isNotNull()).orderBy("doc_id").limit(1).collect()[0]
    new_text = "zzznew zzznew spark"
    update = spark.createDataFrame(
        [(victim.doc_id, new_text, victim.lang, victim.source, len(new_text))],
        DOCS_SCHEMA,
    )
    idx.process_batch(update, 3)
    corpus = docs.where(F.col("doc_id") != victim.doc_id).unionByName(update)
    assert _vocab_set(idx.vocab_df_idf()) == _vocab_set(_batch_vocab(spark, corpus))

    # NULL-text tombstone update: df decrements AND N shrinks by one
    kill = spark.createDataFrame(
        [(victim.doc_id, None, victim.lang, victim.source, 0)], DOCS_SCHEMA
    )
    idx.process_batch(kill, 4)
    corpus2 = docs.where(F.col("doc_id") != victim.doc_id).unionByName(kill)
    assert _vocab_set(idx.vocab_df_idf()) == _vocab_set(_batch_vocab(spark, corpus2))
    n_docs, _ = idx.stats_row()
    assert n_docs == corpus2.where(F.col("text").isNotNull()).count()


def test_vocab_delta_is_o_batch_vocabulary(spark, tmp_path):
    """A small batch's dfreq delta holds only the terms TOUCHED by the
    batch (old union new term sets), never the corpus vocabulary."""
    docs = _docs(spark)
    idx = MaintainedPostings(spark, str(tmp_path / "state"))
    idx.process_batch(docs, 0)
    corpus_vocab = spark.read.parquet(
        str(tmp_path / "state" / "dfreq" / "delta-b00000000")
    ).count()
    victim = docs.where(F.col("text").isNotNull()).orderBy("doc_id").limit(1).collect()[0]
    update = spark.createDataFrame(
        [(victim.doc_id, "alpha beta alpha", victim.lang, victim.source, 16)],
        DOCS_SCHEMA,
    )
    idx.process_batch(update, 1)
    delta = spark.read.parquet(str(tmp_path / "state" / "dfreq" / "delta-b00000001"))
    touched = len(set(victim.text.lower().split(" ")) | {"alpha", "beta"})
    assert delta.count() <= touched < corpus_vocab
    # and the stats delta is exactly one row
    sdelta = spark.read.parquet(str(tmp_path / "state" / "stats" / "delta-b00000001"))
    assert sdelta.count() == 1


def test_maintained_doc_tfidf_equals_batch(spark, tmp_path):
    """The maintained TF-IDF vectorization (VERDICT r4 Missing #5):
    multi-batch build, a doc update, and a NULL-text tombstone must
    each leave doc_tfidf() equal to the batch operator over the corpus
    the log currently represents."""
    from cuda_gis_smoothing_spark.functions.text import doc_tfidf

    def vecs(df):
        return {(r.doc_id, r.token, r.tf, r.tfidf) for r in df.collect()}

    docs = _docs(spark)
    idx = MaintainedPostings(spark, str(tmp_path / "state"), compact_every=2)
    for bid, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 10**9))):
        idx.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    assert vecs(idx.doc_tfidf()) == vecs(doc_tfidf(docs)) != set()

    victim = docs.where(F.col("text").isNotNull()).orderBy("doc_id").limit(1).collect()[0]
    update = spark.createDataFrame(
        [(victim.doc_id, "spark spark tfidf", victim.lang, victim.source, 17)],
        DOCS_SCHEMA,
    )
    idx.process_batch(update, 3)
    corpus = docs.where(F.col("doc_id") != victim.doc_id).unionByName(update)
    assert vecs(idx.doc_tfidf()) == vecs(doc_tfidf(corpus))

    kill = spark.createDataFrame(
        [(victim.doc_id, None, victim.lang, victim.source, 0)], DOCS_SCHEMA
    )
    idx.process_batch(kill, 4)
    corpus2 = docs.where(F.col("doc_id") != victim.doc_id).unionByName(kill)
    assert vecs(idx.doc_tfidf()) == vecs(doc_tfidf(corpus2))


def test_crash_between_dfreq_and_stats_writes(spark, tmp_path):
    """Forged crash in the three-log write window: postings + dfreq
    deltas landed for a batch, the stats guard row did not. The replay
    must read PRIOR state only (before_batch_id — never its own
    half-applied deltas) and converge to the clean-run state."""
    import shutil

    docs = _docs(spark)
    half = docs.where(F.col("doc_id") < 250)
    rest = docs.where(F.col("doc_id") >= 250)
    idx = MaintainedPostings(spark, str(tmp_path / "state"))
    idx.process_batch(half, 0)
    idx.process_batch(rest, 1)
    clean_vocab = _vocab_set(idx.vocab_df_idf())
    clean_search = _search_set(idx.search(_queries(spark), k=25))

    # forge the crash: batch 1's guard (stats) never landed
    shutil.rmtree(str(tmp_path / "state" / "stats" / "delta-b00000001"))
    assert not idx.stats_log.has(1) and idx.log.has(1) and idx.df_log.has(1)
    idx.process_batch(rest, 1)  # replay
    assert _vocab_set(idx.vocab_df_idf()) == clean_vocab
    assert _search_set(idx.search(_queries(spark), k=25)) == clean_search

    # replay of a fully applied batch: no-op even with changed input
    idx.process_batch(rest.withColumn("text", F.lit("junk junk")), 1)
    assert _vocab_set(idx.vocab_df_idf()) == clean_vocab


def test_stream_wiring_builds_same_index(spark, tmp_path):
    docs = _docs(spark)
    src = str(tmp_path / "src")
    for i, (lo, hi) in enumerate(((0, 250), (250, 10**9))):
        docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.parquet(f"{src}/part{i}")
    idx = MaintainedPostings(spark, str(tmp_path / "state"))
    q = idx.start(f"{src}/part*", str(tmp_path / "ckpt"))
    assert q.awaitTermination(180), "availableNow query did not finish"
    got = _search_set(idx.search(_queries(spark), k=25))
    want = _search_set(bm25_search(docs, _queries(spark), k=25))
    assert got == want
