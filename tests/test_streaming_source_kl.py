"""Maintained per-source token distributions (streaming/source_stats.py):
(a) a multi-batch-built state serves KL(P_source ‖ P_corpus)
identically to the batch operator over the same corpus; (b) a delta
write is O(batch vocabulary), never O(corpus); (c) a re-ingested doc
REPLACES its contributions — including a SOURCE MOVE (old source's
cells decrement, new source's increment) and a NULL-text update
(removal); (d) NULL-source docs count toward the corpus marginals but
never appear in the output (the batch operator's inner-join
semantics); (e) crash replay of an applied batch is a no-op and a
crash INSIDE the write window converges on replay; (f) the streaming
wiring feeds the same process_batch."""

import os

from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.functions.text import source_kl_divergence
from cuda_gis_smoothing_spark.streaming.dedup import DOCS_SCHEMA
from cuda_gis_smoothing_spark.streaming.source_stats import (
    MaintainedSourceTokens,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _kl_set(df):
    return {(r.source, r.n_tokens, r.kl_divergence) for r in df.collect()}


def test_multibatch_state_equals_batch_kl(spark, tmp_path):
    docs = _docs(spark)
    mst = MaintainedSourceTokens(spark, str(tmp_path / "state"), compact_every=2)
    for bid, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 10**9))):
        mst.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    got = _kl_set(mst.kl())
    want = _kl_set(source_kl_divergence(docs))
    assert got == want and len(want) > 0
    # maintained total equals the batch rebuild's exact integer sum
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).where(F.col("t") != "")
    assert mst.total_tokens() == toks.count()
    # compaction fired (compact_every=2) and the view survived it
    assert any(
        d.startswith("base-")
        for d in os.listdir(tmp_path / "state" / "counts")
    )


def test_multibatch_zipf_equals_batch(spark, tmp_path):
    """The second read-side statistic over the same state: a
    multi-batch-built (and doc-updated) state serves the SAME Zipf fit
    as the batch operator over the final corpus — including through a
    NULL-text update (token removal) that shrinks the count table."""
    from cuda_gis_smoothing_spark.functions.text import zipf_fit

    docs = _docs(spark)
    mst = MaintainedSourceTokens(spark, str(tmp_path / "state"))
    for bid, (lo, hi) in enumerate(((0, 200), (200, 10**9))):
        mst.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    assert mst.zipf().collect() == zipf_fit(docs).collect()
    # update: null one doc's text — its occurrences leave the fit
    some = docs.orderBy("doc_id").limit(1).select(
        "doc_id", F.lit(None).cast("string").alias("text"), "lang",
        "source", "n_chars",
    )
    mst.process_batch(some, 2)
    updated = docs.join(some.select("doc_id"), "doc_id", "left_anti")
    assert mst.zipf().collect() == zipf_fit(updated).collect()


def test_delta_writes_are_o_batch_vocab(spark, tmp_path):
    docs = _docs(spark)
    mst = MaintainedSourceTokens(spark, str(tmp_path / "state"))
    mst.process_batch(docs, 0)
    corpus_cells = spark.read.parquet(
        str(tmp_path / "state" / "counts" / "delta-b00000000")
    ).count()
    batch = docs.limit(5)
    mst.process_batch(batch, 1)
    d1 = spark.read.parquet(
        str(tmp_path / "state" / "counts" / "delta-b00000001")
    )
    batch_cells = (
        batch.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("t")
        )
        .where(F.col("t") != "")
        .distinct()
        .count()
    )
    assert d1.count() <= batch_cells < corpus_cells
    assert _kl_set(mst.kl()) == _kl_set(source_kl_divergence(docs))


def test_update_moves_source_and_null_text_removes(spark, tmp_path):
    docs = _docs(spark).where(F.col("doc_id") < 40)
    mst = MaintainedSourceTokens(spark, str(tmp_path / "state"))
    mst.process_batch(docs, 0)
    # doc 0 MOVES to another source with new text; doc 1 text -> NULL
    moved = spark.createDataFrame(
        [(0, "zz moved tokens zz", "movedsource"), (1, None, "web")],
        "doc_id long, text string, source string",
    )
    mst.process_batch(moved, 1)
    updated = (
        docs.where(F.col("doc_id") >= 2)
        .select("doc_id", "text", "source")
        .unionByName(moved)
    )
    assert _kl_set(mst.kl()) == _kl_set(source_kl_divergence(updated))
    # the moved source actually appears
    assert any(r[0] == "movedsource" for r in _kl_set(mst.kl()))


def test_null_source_counts_toward_corpus_only(spark, tmp_path):
    rows = [
        (0, "a a b", "s1"),
        (1, "a b c", "s2"),
        (2, "c c d common", None),  # NULL source: marginals only
        (3, None, "s3"),  # NULL text: contributes nothing
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    mst = MaintainedSourceTokens(spark, str(tmp_path / "state"))
    mst.process_batch(docs, 0)
    got = _kl_set(mst.kl())
    want = _kl_set(source_kl_divergence(docs))
    assert got == want
    srcs = {r[0] for r in got}
    assert srcs == {"s1", "s2"}  # no NULL row, no s3 (empty), no sentinel


def test_crash_replay_converges(spark, tmp_path):
    docs = _docs(spark).where(F.col("doc_id") < 60)
    mst = MaintainedSourceTokens(spark, str(tmp_path / "state"))
    mst.process_batch(docs.where(F.col("doc_id") < 30), 0)
    # applied-batch replay: a second call with the same id is a no-op
    before = _kl_set(mst.kl())
    mst.process_batch(docs.where(F.col("doc_id") < 30), 0)
    assert _kl_set(mst.kl()) == before
    # crash INSIDE the write window: doc slice written, counts+stats not
    b1 = docs.where(F.col("doc_id") >= 30)
    from cuda_gis_smoothing_spark.streaming.source_stats import (
        _doc_source_slices,
    )

    mst.log.write_delta(_doc_source_slices(b1), 1)
    assert not mst.stats_log.has(1)
    mst.process_batch(b1, 1)  # replay: overwrites idempotently
    assert _kl_set(mst.kl()) == _kl_set(source_kl_divergence(docs))


def test_streaming_wiring(spark, tmp_path):
    docs = _docs(spark).where(F.col("doc_id") < 50)
    src = str(tmp_path / "src")
    docs.select("doc_id", "text", "lang", "source", "n_chars").coalesce(
        1
    ).write.parquet(src)
    mst = MaintainedSourceTokens(spark, str(tmp_path / "state"))
    q = mst.start(src, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _kl_set(mst.kl()) == _kl_set(source_kl_divergence(docs))


def test_intra_batch_duplicate_ids_resolve_deterministically(spark, tmp_path):
    """Two rows sharing an id in ONE batch (producer replay + source
    correction) must collapse to one deterministic representative —
    the greatest (source, text) — keeping the doc log one-row-per-key
    so later re-ingests decrement cleanly (the packer's intra-batch
    dup-id class)."""
    dup = spark.createDataFrame(
        [
            (0, "x y z", "web"),
            (0, "x y q", "blog"),  # same id, different source+text
            (1, "a b", "web"),
        ],
        "doc_id long, text string, source string",
    )
    mst = MaintainedSourceTokens(spark, str(tmp_path / "state"))
    mst.process_batch(dup, 0)
    # one log row per key
    slices = mst.log.read().collect()
    assert len(slices) == 2
    # representative = greatest (source, text) -> ('web', 'x y z')
    rep = spark.createDataFrame(
        [(0, "x y z", "web"), (1, "a b", "web")],
        "doc_id long, text string, source string",
    )
    assert _kl_set(mst.kl()) == _kl_set(source_kl_divergence(rep))
    # a later re-ingest replaces the representative cleanly
    upd = spark.createDataFrame(
        [(0, "m n", "books")], "doc_id long, text string, source string"
    )
    mst.process_batch(upd, 1)
    final = spark.createDataFrame(
        [(0, "m n", "books"), (1, "a b", "web")],
        "doc_id long, text string, source string",
    )
    assert _kl_set(mst.kl()) == _kl_set(source_kl_divergence(final))


def test_multibatch_diversity_equals_batch(spark, tmp_path):
    """The third read-side statistic over the same state: a
    multi-batch-built state serves the SAME Simpson/TTR card as the
    batch operator — including the NULL-source group (sentinel key
    decoded back to NULL, unlike kl's inner-join drop)."""
    from cuda_gis_smoothing_spark.functions.text import source_diversity

    docs = _docs(spark)
    mst = MaintainedSourceTokens(spark, str(tmp_path / "state"), compact_every=2)
    for bid, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 10**9))):
        mst.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    got = {
        r.source: (r.n_tokens, r.n_types, r.ttr, r.simpson)
        for r in mst.diversity().collect()
    }
    want = {
        r.source: (r.n_tokens, r.n_types, r.ttr, r.simpson)
        for r in source_diversity(docs).collect()
    }
    assert got == want and got
