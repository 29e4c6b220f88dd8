"""MaintainedWinnow: (a) single batch == the batch operator exactly;
(b) doc updates replace the selection wholesale (latest-wins) and
NULL-text re-ingest tombstones the doc; (c) cross-batch candidates
join the batch against PRIOR state only (updated docs never pair via
their stale selection; intra-batch pairs are out of scope); (d)
deltas are O(batch); (e) replay of an applied batch is a no-op."""

import pytest
from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.dedup import winnow_fingerprints
from cuda_gis_smoothing_spark.streaming.winnow import MaintainedWinnow

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k tokens


def _doc(i, text):
    return (i, text, "en", "web", len(text or ""))


def _b0(spark):
    return spark.createDataFrame(
        [
            _doc(1, f"one unique prefix here {SHARED} and a suffix tail"),
            _doc(2, "totally disjoint text with no overlap at all whatsoever"),
            _doc(3, None),  # NULL text: tombstone row from the start
        ],
        SCHEMA,
    )


def _b1(spark):
    return spark.createDataFrame(
        [
            _doc(4, f"{SHARED} completely different ending words now"),
            _doc(5, f"{SHARED} completely different ending words now"),  # 4's twin
            _doc(2, "rewritten second document body entirely fresh tokens"),
        ],
        SCHEMA,
    )


def _fps(df):
    return {(r["doc_id"], r["fingerprint"]) for r in df.collect()}


def test_single_batch_equals_batch_operator(spark, tmp_path):
    mw = MaintainedWinnow(spark, str(tmp_path / "s"))
    mw.process_batch(_b0(spark), 0)
    assert _fps(mw.fingerprints()) == _fps(winnow_fingerprints(_b0(spark)))


def test_update_replaces_and_null_tombstones(spark, tmp_path):
    mw = MaintainedWinnow(spark, str(tmp_path / "s"))
    mw.process_batch(_b0(spark), 0)
    old_doc2 = {f for d, f in _fps(mw.fingerprints()) if d == 2}
    mw.process_batch(_b1(spark), 1)
    cur = _fps(mw.fingerprints())
    new_doc2 = {f for d, f in cur if d == 2}
    assert new_doc2 and not (new_doc2 & old_doc2)  # wholesale replacement
    assert not any(d == 3 for d, _ in cur)  # tombstoned from batch 0
    # NULL-text re-ingest of doc 1 removes it
    mw.process_batch(spark.createDataFrame([_doc(1, None)], SCHEMA), 2)
    assert not any(d == 1 for d, _ in _fps(mw.fingerprints()))


def test_cross_batch_candidates(spark, tmp_path):
    mw = MaintainedWinnow(spark, str(tmp_path / "s"))
    mw.process_batch(_b0(spark), 0)
    mw.process_batch(_b1(spark), 1)
    pairs = {(r["doc_a"], r["doc_b"]) for r in mw.cross_batch_candidates(1).collect()}
    assert (1, 4) in pairs and (1, 5) in pairs  # shared run found vs stored
    assert (4, 5) not in pairs and (5, 4) not in pairs  # intra-batch: out of scope
    # doc 2 was UPDATED in batch 1: its stale batch-0 selection must not
    # appear on the prior side (doc_a == 2 impossible)
    assert not any(a == 2 for a, _ in pairs)
    # first batch has no prior: empty candidate set
    assert mw.cross_batch_candidates(0).count() == 0


def test_delta_is_o_batch_and_replay_noop(spark, tmp_path):
    mw = MaintainedWinnow(spark, str(tmp_path / "s"), compact_every=99)
    mw.process_batch(_b0(spark), 0)
    mw.process_batch(_b1(spark), 1)
    assert mw.log.read_delta(1).count() == 3  # batch-1 docs only
    before = _fps(mw.fingerprints())
    junk = spark.createDataFrame([_doc(9, "junk junk junk junk junk")], SCHEMA)
    mw.process_batch(junk, 1)  # replay id with changed input: no-op
    assert _fps(mw.fingerprints()) == before


def test_stream_wiring(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _b0(spark).coalesce(1).write.mode("append").parquet(src)
    mw = MaintainedWinnow(spark, str(tmp_path / "s"))
    q = mw.start(src, ckpt)
    q.awaitTermination(120)
    assert _fps(mw.fingerprints()) == _fps(winnow_fingerprints(_b0(spark)))
