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
