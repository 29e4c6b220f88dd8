"""Maintained KMV sketches (streaming/sketches.py): (a) a multi-batch-
built state serves distinct_counts() IDENTICALLY to the batch
kmv_distinct over the union of the batches (union-of-sketches ==
sketch-of-union); (b) a delta write touches only the batch's groups,
never O(state); (c) NULL ids are excluded and NULL group values round-
trip through the sentinel; (d) replay of an applied batch is a no-op;
(e) the streaming wiring feeds the same process_batch."""

import os

from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.sketches import kmv_distinct
from cuda_gis_smoothing_spark.streaming.sketches import MaintainedKMV

SF_DIR = "/root/testdata/sf0.001"
K = 8


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_multibatch_equals_batch(spark, tmp_path):
    ev = _events(spark)
    mk = MaintainedKMV(
        spark, str(tmp_path / "state"), ["event_type"], "user_id", k=K,
        compact_every=2,
    )
    for bid, (lo, hi) in enumerate(((0, 300), (300, 700), (700, 10**9))):
        mk.process_batch(
            ev.where((F.col("event_id") >= lo) & (F.col("event_id") < hi)), bid
        )
    got = _rows(mk.distinct_counts())
    want = _rows(kmv_distinct(ev, ["event_type"], "user_id", k=K))
    assert got == want and len(want) > 0
    # some group actually sketches (est != exact path)
    assert any(r[1] == K for r in want)
    # compaction fired and the view survived it
    assert any(
        d.startswith("base-")
        for d in os.listdir(tmp_path / "state" / "sketches")
    )


def test_delta_touches_only_batch_groups(spark, tmp_path):
    ev = _events(spark)
    mk = MaintainedKMV(
        spark, str(tmp_path / "state"), ["event_type"], "user_id", k=K
    )
    mk.process_batch(ev, 0)
    one_type = ev.orderBy("event_id").limit(1)
    mk.process_batch(one_type, 1)
    d1 = spark.read.parquet(
        str(tmp_path / "state" / "sketches" / "delta-b00000001")
    )
    assert d1.count() == 1
    assert _rows(mk.distinct_counts()) == _rows(
        kmv_distinct(ev, ["event_type"], "user_id", k=K)
    )


def test_null_id_and_null_group(spark, tmp_path):
    rows = [
        (1, "a", 10),
        (2, "a", None),  # NULL id: excluded
        (3, None, 11),  # NULL group: kept as the NULL group
        (4, None, 12),
        (5, "b", 10),
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, user_id long")
    mk = MaintainedKMV(
        spark, str(tmp_path / "state"), ["event_type"], "user_id", k=K
    )
    mk.process_batch(ev, 0)
    got = _rows(mk.distinct_counts())
    want = _rows(kmv_distinct(ev, ["event_type"], "user_id", k=K))
    assert got == want
    assert (None, 2, *[r for r in want if r[0] is None][0][2:]) in got


def test_replay_is_noop(spark, tmp_path):
    ev = _events(spark)
    mk = MaintainedKMV(
        spark, str(tmp_path / "state"), ["event_type"], "user_id", k=K
    )
    mk.process_batch(ev.where(F.col("event_id") < 100), 0)
    before = _rows(mk.distinct_counts())
    mk.process_batch(ev.where(F.col("event_id") < 100), 0)
    assert _rows(mk.distinct_counts()) == before


def test_streaming_wiring(spark, tmp_path):
    ev = _events(spark).where(F.col("event_id") < 200)
    src = str(tmp_path / "src")
    ev.select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(1).write.parquet(src)
    mk = MaintainedKMV(
        spark, str(tmp_path / "state"), ["event_type"], "user_id", k=K
    )
    q = mk.start(src, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _rows(mk.distinct_counts()) == _rows(
        kmv_distinct(ev, ["event_type"], "user_id", k=K)
    )


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _overlap_mk(spark, tmp_path, k=64):
    from cuda_gis_smoothing_spark.operators.sketches import (
        shingle_hash_members,
    )

    return MaintainedKMV(
        spark,
        str(tmp_path / "state"),
        ["source"],
        k=k,
        members=lambda df: shingle_hash_members(df, 5),
    )


def test_overlap_single_batch_equals_batch_operator(spark, tmp_path):
    from cuda_gis_smoothing_spark.operators.sketches import (
        kmv_shingle_overlap,
    )

    docs = _docs(spark)
    mk = _overlap_mk(spark, tmp_path)
    mk.process_batch(docs, 0)
    assert _rows(mk.overlap_pairs()) == _rows(
        kmv_shingle_overlap(docs, k_shingle=5, k=64)
    )


def test_overlap_multibatch_appends_merge(spark, tmp_path):
    from cuda_gis_smoothing_spark.operators.sketches import (
        kmv_shingle_overlap,
    )

    docs = _docs(spark)
    mk = _overlap_mk(spark, tmp_path)
    for bid, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 10**9))):
        mk.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    got = _rows(mk.overlap_pairs())
    want = _rows(kmv_shingle_overlap(docs, k_shingle=5, k=64))
    assert got == want and len(want) > 0


def test_overlap_excludes_null_group(spark, tmp_path):
    rows = [
        (0, "a b c d e f g", "s1"),
        (1, "a b c d e h i", "s2"),
        (2, "a b c d e j k", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    mk = _overlap_mk(spark, tmp_path)
    mk.process_batch(docs, 0)
    pairs = {(r.source_a, r.source_b) for r in mk.overlap_pairs().collect()}
    assert pairs == {("s1", "s2")}


def test_overlap_streaming_wiring_with_docs_schema(spark, tmp_path):
    """The members hook is only streamable with the matching schema —
    start(schema=DOCS_SCHEMA) wires the documents stream through the
    same process_batch."""
    from cuda_gis_smoothing_spark.operators.sketches import (
        kmv_shingle_overlap,
    )
    from cuda_gis_smoothing_spark.streaming.dedup import DOCS_SCHEMA

    docs = _docs(spark).where(F.col("doc_id") < 80)
    src = str(tmp_path / "src")
    docs.select("doc_id", "text", "lang", "source", "n_chars").coalesce(
        1
    ).write.parquet(src)
    mk = _overlap_mk(spark, tmp_path)
    q = mk.start(src, str(tmp_path / "ckpt"), schema=DOCS_SCHEMA)
    q.awaitTermination(120)
    assert _rows(mk.overlap_pairs()) == _rows(
        kmv_shingle_overlap(docs, k_shingle=5, k=64)
    )


def test_quantiles_single_batch_equals_batch_operator(spark, tmp_path):
    from cuda_gis_smoothing_spark.operators.events import PCT_QS
    from cuda_gis_smoothing_spark.operators.sketches import (
        kmv_quantile_sketch,
    )
    from cuda_gis_smoothing_spark.streaming.sketches import (
        MaintainedQuantiles,
    )

    ev = _events(spark)
    mq = MaintainedQuantiles(
        spark, str(tmp_path / "state"), ["event_type"], "event_id", "value", k=64
    )
    mq.process_batch(ev, 0)
    assert _rows(mq.quantiles(PCT_QS)) == _rows(
        kmv_quantile_sketch(
            ev, "value", "event_id", PCT_QS, group_cols=("event_type",), k=64
        )
    )


def test_quantiles_multibatch_and_redelivery(spark, tmp_path):
    """Disjoint batches merge to the batch operator over the union;
    re-delivering an already-sampled batch changes nothing
    (array_union dedups equal (h, id, v) structs)."""
    from cuda_gis_smoothing_spark.operators.events import PCT_QS
    from cuda_gis_smoothing_spark.operators.sketches import (
        kmv_quantile_sketch,
    )
    from cuda_gis_smoothing_spark.streaming.sketches import (
        MaintainedQuantiles,
    )

    ev = _events(spark)
    mq = MaintainedQuantiles(
        spark, str(tmp_path / "state"), ["event_type"], "event_id", "value",
        k=64, compact_every=2,
    )
    for bid, (lo, hi) in enumerate(((0, 300), (300, 700), (700, 10**9))):
        mq.process_batch(
            ev.where((F.col("event_id") >= lo) & (F.col("event_id") < hi)), bid
        )
    want = _rows(
        kmv_quantile_sketch(
            ev, "value", "event_id", PCT_QS, group_cols=("event_type",), k=64
        )
    )
    assert _rows(mq.quantiles(PCT_QS)) == want
    # redelivery of batch 0's rows under a NEW batch id: no change
    mq.process_batch(ev.where(F.col("event_id") < 300), 3)
    assert _rows(mq.quantiles(PCT_QS)) == want
    assert any(
        d.startswith("base-")
        for d in os.listdir(tmp_path / "state" / "samples")
    )


def test_quantiles_delta_touches_only_batch_groups(spark, tmp_path):
    from cuda_gis_smoothing_spark.operators.events import PCT_QS
    from cuda_gis_smoothing_spark.streaming.sketches import (
        MaintainedQuantiles,
    )

    ev = _events(spark)
    mq = MaintainedQuantiles(
        spark, str(tmp_path / "state"), ["event_type"], "event_id", "value", k=16
    )
    mq.process_batch(ev, 0)
    mq.process_batch(ev.orderBy("event_id").limit(1), 1)
    d1 = spark.read.parquet(
        str(tmp_path / "state" / "samples" / "delta-b00000001")
    )
    assert d1.count() == 1
    mq.quantiles(PCT_QS).collect()  # state still serves


# -- MaintainedCMS ---------------------------------------------------------


def _cms_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _cms_state(m):
    return {
        (r.j, r.counter): r.cnt for r in m.counters().collect()
    }


def _cms_batch_rebuild(spark, docs):
    from cuda_gis_smoothing_spark.operators.dedup import _doc_tokens
    from cuda_gis_smoothing_spark.operators.sketches import cms_counters
    from pyspark.sql import functions as F

    counts = _doc_tokens(docs, "text", "doc_id", None).groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    return {
        (r.j, r.counter): r.cnt
        for r in cms_counters(counts, "t", "df").collect()
    }


def test_cms_multi_batch_update_and_tombstone_equal_rebuild(spark, tmp_path):
    from cuda_gis_smoothing_spark.streaming.sketches import MaintainedCMS

    m = MaintainedCMS(spark, str(tmp_path / "cms"))
    b0 = _cms_docs(
        spark,
        [(1, "a b c", "en", "s", 0), (2, "a a d", "en", "s", 0),
         (3, None, "en", "s", 0)],
    )
    # doc 2 UPDATED (loses d, gains e); doc 1 text NULLED (tombstone);
    # doc 4 new
    b1 = _cms_docs(
        spark,
        [(2, "a e", "en", "s", 0), (1, None, "en", "s", 0),
         (4, "b c", "en", "s", 0)],
    )
    m.process_batch(b0, 0)
    assert _cms_state(m) == _cms_batch_rebuild(spark, b0)
    m.process_batch(b1, 1)
    final = _cms_docs(
        spark,
        [(1, None, "en", "s", 0), (2, "a e", "en", "s", 0),
         (3, None, "en", "s", 0), (4, "b c", "en", "s", 0)],
    )
    assert _cms_state(m) == _cms_batch_rebuild(spark, final)
    # crash replay: no double-apply
    before = _cms_state(m)
    m.process_batch(b1, 1)
    assert _cms_state(m) == before
    # estimates: present tokens >= truth; absent token estimates 0
    q = spark.createDataFrame([("a",), ("zzz_absent",)], "t string")
    est = {r.token: r.cms_estimate for r in m.estimates(q).collect()}
    assert est["a"] >= 1
    assert est["zzz_absent"] >= 0  # may collide, but never negative


def test_cms_deltas_are_o_batch_vocab(spark, tmp_path):
    from cuda_gis_smoothing_spark.operators.sketches import CMS_ROWS
    from cuda_gis_smoothing_spark.streaming.sketches import MaintainedCMS

    m = MaintainedCMS(spark, str(tmp_path / "cms"))
    big = _cms_docs(
        spark,
        [(i, " ".join(f"w{i}_{k}" for k in range(6)), "en", "s", 0)
         for i in range(40)],
    )
    m.process_batch(big, 0)
    tiny = _cms_docs(spark, [(1000, "only two", "en", "s", 0)])
    m.process_batch(tiny, 1)
    delta = m.counters_log.read_delta(1)
    # 2 tokens x 4 rows = at most 8 touched counters
    assert delta.count() <= 2 * len(CMS_ROWS)
