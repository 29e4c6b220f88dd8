"""MaintainedComponents: incremental near-dup clustering must equal
the batch CC (min-id labels, EXACT integer equality) after every
batch, survive crash replays, relabel losing components, and write
O(batch + merged members) deltas — never O(corpus)."""

import os

import pytest
from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.dedup import neardup_components, simhash
from cuda_gis_smoothing_spark.streaming.components import MaintainedComponents

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_labels(spark, docs):
    return {
        (r.doc_id, r.component)
        for r in neardup_components(docs, max_hamming=1).collect()
    }


def test_multibatch_equals_batch(spark, tmp_path):
    docs = _docs(spark)
    mc = MaintainedComponents(spark, str(tmp_path / "state"), compact_every=2)
    splits = ((0, 170), (170, 340), (340, 10**9))
    for bid, (lo, hi) in enumerate(splits):
        mc.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
        upto = docs.where(F.col("doc_id") < hi)
        got = {(r.doc_id, r.component) for r in mc.components().collect()}
        assert got == _batch_labels(spark, upto), f"diverged after batch {bid}"


def test_quotient_merge_relabels_two_stored_components(spark, tmp_path):
    """Find three texts whose simhashes satisfy d(a,b)=hamming 2 with c
    within hamming 1 of both — ingesting a and b first creates TWO
    components; c's batch must merge them through the quotient graph
    and relabel the losing component's stored member."""
    cands = [f"tok{i} w{i % 3} q{i % 5} z{i % 7}" for i in range(40)]
    fps = {
        r.doc_id: r.simhash
        for r in simhash(
            _mk(spark, list(enumerate(cands))), bits=16
        ).collect()
    }
    triple = None
    ids = sorted(fps)
    for i in ids:
        for j in ids:
            if j <= i or bin(fps[i] ^ fps[j]).count("1") != 2:
                continue
            for k in ids:
                if k in (i, j):
                    continue
                if (
                    bin(fps[k] ^ fps[i]).count("1") <= 1
                    and bin(fps[k] ^ fps[j]).count("1") <= 1
                ):
                    triple = (i, j, k)
                    break
            if triple:
                break
        if triple:
            break
    assert triple is not None, "no merge triple among candidates — widen search"
    i, j, k = triple
    mc = MaintainedComponents(spark, str(tmp_path / "state"))
    mc.process_batch(_mk(spark, [(100, cands[i]), (200, cands[j])]), 0)
    first = {r.doc_id: r.component for r in mc.components().collect()}
    assert first == {100: 100, 200: 200}  # two singletons, no pair
    mc.process_batch(_mk(spark, [(300, cands[k])]), 1)
    merged = {r.doc_id: r.component for r in mc.components().collect()}
    assert merged == {100: 100, 200: 100, 300: 100}  # 200 RELABELED
    # and the maintained result still equals the batch operator
    all_docs = _mk(spark, [(100, cands[i]), (200, cands[j]), (300, cands[k])])
    assert {(d, c) for d, c in merged.items()} == _batch_labels(spark, all_docs)


def test_label_delta_is_o_batch(spark, tmp_path):
    docs = _docs(spark)
    mc = MaintainedComponents(spark, str(tmp_path / "state"), compact_every=99)
    mc.process_batch(docs.where(F.col("doc_id") < 400), 0)
    # batch 1: fresh ids far from the corpus id range, unique texts
    mc.process_batch(
        _mk(spark, [(10_000 + i, f"unique{i} xyzzy{i} plugh{i}") for i in range(5)]),
        1,
    )
    delta = spark.read.parquet(
        os.path.join(str(tmp_path / "state"), "labels", "delta-b00000001")
    )
    assert delta.count() == 5  # no relabels: exactly the batch rows


def test_append_only_contract_raises(spark, tmp_path):
    mc = MaintainedComponents(spark, str(tmp_path / "state"))
    mc.process_batch(_mk(spark, [(1, "a b"), (2, "c d")]), 0)
    with pytest.raises(ValueError, match="append-only"):
        mc.process_batch(_mk(spark, [(2, "e f")]), 1)
    with pytest.raises(ValueError, match="duplicate ids"):
        mc.process_batch(_mk(spark, [(9, "x"), (9, "y")]), 2)


def test_crash_replay_and_null_text(spark, tmp_path):
    """Forged crash: the labels delta landed but the stats row (the
    replay guard, written LAST) did not — replaying the batch must
    converge to the same state. NULL-text docs stay singletons."""
    import shutil

    state = str(tmp_path / "state")
    mc = MaintainedComponents(spark, state)
    mc.process_batch(_mk(spark, [(1, "a b c"), (2, None)]), 0)
    mc.process_batch(_mk(spark, [(3, "a b c"), (4, None)]), 1)
    shutil.rmtree(os.path.join(state, "stats", "delta-b00000001"))
    mc2 = MaintainedComponents(spark, state)
    mc2.process_batch(_mk(spark, [(3, "a b c"), (4, None)]), 1)
    got = {r.doc_id: r.component for r in mc2.components().collect()}
    assert got == {1: 1, 2: 2, 3: 1, 4: 4}
    assert mc2.stats_row()[0] == 4
    # replay of a FULLY applied batch is a no-op
    mc2.process_batch(_mk(spark, [(3, "a b c"), (4, None)]), 1)
    assert mc2.stats_row()[0] == 4


def test_streaming_wiring(spark, tmp_path):
    docs = _docs(spark).where(F.col("doc_id") < 120)
    src = str(tmp_path / "src")
    docs.where(F.col("doc_id") < 60).coalesce(1).write.mode("append").parquet(src)
    docs.where(F.col("doc_id") >= 60).coalesce(1).write.mode("append").parquet(src)
    mc = MaintainedComponents(spark, str(tmp_path / "state"))
    q = mc.start(src, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {(r.doc_id, r.component) for r in mc.components().collect()}
    assert got == _batch_labels(spark, docs)
