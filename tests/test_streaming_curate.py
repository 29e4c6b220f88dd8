"""Incremental curation: (a) one batch holding the whole corpus must
reproduce batch curate_corpus EXACTLY; (b) a multi-batch stream must
match an independent pure-Python implementation of the documented
streaming-greedy semantics; (c) crash replay of an applied batch id is
a no-op."""

import pandas as pd

from cuda_gis_smoothing_spark.operators.curate import curate_corpus, filtered_base
from cuda_gis_smoothing_spark.operators.dedup import MH_A, MH_B, MH_PRIME
from cuda_gis_smoothing_spark.operators.sampling import S_A, S_B, _DENOM
from cuda_gis_smoothing_spark.streaming.curate import IncrementalCurator

SF_DIR = "/root/testdata/sf0.001"
THR = 0.9
SAMPLE_F = 0.8


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_single_batch_equals_batch_curate(spark, tmp_path):
    cur = IncrementalCurator(spark, str(tmp_path / "state"))
    cur.process_batch(_docs(spark), 0)
    got = {
        (r.doc_id, r.n_tokens, r.quality_score)
        for r in cur.current_curated().collect()
    }
    want = {
        (r.doc_id, r.n_tokens, r.quality_score)
        for r in curate_corpus(_docs(spark)).collect()
    }
    assert got == want and len(want) > 0


# ---- independent Python oracle for the stateful stages ----------------
def _tok_hash(t):
    acc = 7
    for c in t:
        acc = (acc * 131 + ord(c)) % MH_PRIME
    return acc


def _bands(text, n_hashes=6, bands=3):
    toks = {t for t in text.lower().split(" ") if t}
    hs = [_tok_hash(t) for t in toks]
    if not hs:
        return []
    mh = [min((h * MH_A[i] + MH_B[i]) % MH_PRIME for h in hs) for i in range(n_hashes)]
    return [
        (b, (mh[2 * b] * 8191 + mh[2 * b + 1]) % MH_PRIME) for b in range(bands)
    ]


def _jac(a, b):
    sa = {t for t in a.lower().split(" ") if t}
    sb = {t for t in b.lower().split(" ") if t}
    i = len(sa & sb)
    return round(i / (len(sa) + len(sb) - i) + 1e-9, 6)


def _oracle(batches):
    """batches: list of [(doc_id, text)] — returns curated doc_id set."""
    kept = []  # [(doc_id, text, bands)]
    digests = set()
    curated = set()
    for batch in batches:
        # first-seen exact dedup: min doc_id per digest within batch,
        # digest not already kept
        by_digest = {}
        for doc_id, text in sorted(batch):
            by_digest.setdefault(text, doc_id)
        b1 = [
            (doc_id, text)
            for text, doc_id in by_digest.items()
            if text not in digests
        ]
        # cross-batch near-dup (band candidates, verified)
        b2 = []
        for doc_id, text in sorted(b1):
            bb = set(_bands(text))
            hit = any(
                bb & set(kb) and _jac(text, kt) >= THR for _, kt, kb in kept
            )
            if not hit:
                b2.append((doc_id, text))
        # intra-batch monotone rule: drop vs any SMALLER batch survivor
        survivors = []
        for doc_id, text in sorted(b2):
            bb = set(_bands(text))
            hit = any(
                a < doc_id and bb & set(_bands(at)) and _jac(text, at) >= THR
                for a, at in b2
            )
            if not hit:
                survivors.append((doc_id, text))
        for doc_id, text in survivors:
            kept.append((doc_id, text, _bands(text)))
            digests.add(text)
            if ((doc_id * S_A + S_B) % MH_PRIME) % _DENOM < int(SAMPLE_F * _DENOM):
                curated.add(doc_id)
    return curated


def test_multi_batch_matches_python_oracle(spark, tmp_path):
    docs = _docs(spark)
    # the stateless filter stages are gate-tested elsewhere; feed the
    # SAME filtered base to both sides so the oracle stays independent
    # on everything stateful
    base = filtered_base(docs, "en", 0.5).orderBy("doc_id").toPandas()
    cuts = [0, len(base) // 3, 2 * len(base) // 3, len(base)]
    batches_pd = [base.iloc[cuts[i]:cuts[i + 1]] for i in range(3)]

    cur = IncrementalCurator(spark, str(tmp_path / "state"), compact_every=2)
    for bid, bpd in enumerate(batches_pd):
        bdf = spark.createDataFrame(
            bpd[["doc_id", "text"]].assign(
                lang="en", source="s", n_chars=bpd["text"].str.len()
            ),
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        cur.process_batch(bdf, bid)

    got = set(_ids(cur.current_curated()))
    want = _oracle(
        [list(zip(b["doc_id"], b["text"])) for b in batches_pd]
    )
    assert got == want and len(want) > 0

    # crash replay of the last applied batch id: a no-op
    n_before = cur.current_kept().count()
    cur.process_batch(
        spark.createDataFrame(
            batches_pd[2][["doc_id", "text"]].assign(
                lang="en", source="s", n_chars=1
            ),
            "doc_id long, text string, lang string, source string, n_chars long",
        ),
        2,
    )
    assert cur.current_kept().count() == n_before


def test_crash_between_curated_and_kept_writes_replays_cleanly(spark, tmp_path):
    """Simulate the crash window: curated delta written, kept delta not
    (the kept log is the replay guard, written LAST) — reprocessing the
    batch must converge to the same state as a clean run, not lose or
    double rows."""
    import shutil

    docs = _docs(spark)
    state = tmp_path / "state"
    cur = IncrementalCurator(spark, str(state))
    cur.process_batch(docs, 0)
    clean_curated = set(_ids(cur.current_curated()))
    clean_kept = cur.current_kept().count()

    # forge the crash: drop the kept delta, keep the curated delta
    shutil.rmtree(str(state / "kept_docs" / "delta-b00000000"))
    assert not cur.kept_log.has(0)
    cur.process_batch(docs, 0)  # replay
    assert set(_ids(cur.current_curated())) == clean_curated
    assert cur.current_kept().count() == clean_kept


def test_crash_between_aux_and_kept_writes_does_not_lose_batch(spark, tmp_path):
    """The ADVICE-r3 high: crash AFTER aux_log.write_delta(batch N) but
    BEFORE kept_log.write_delta(batch N), with real prior state. The
    crashed aux delta holds batch N's own survivors' digests; if the
    replay reads it as 'prior' state, the digest anti-join drops every
    batch-N survivor as an exact dup and the batch is permanently lost.
    The replay must read aux state BEFORE batch N and reproduce the
    original kept/curated sets exactly."""
    import shutil

    docs = _docs(spark).orderBy("doc_id").toPandas()
    half = len(docs) // 2
    mk = lambda pdf: spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    state = tmp_path / "state"
    cur = IncrementalCurator(spark, str(state))
    cur.process_batch(mk(docs.iloc[:half]), 0)
    kept_b0 = cur.current_kept().count()
    cur.process_batch(mk(docs.iloc[half:]), 1)
    clean_kept = set(_ids(cur.current_kept()))
    clean_curated = set(_ids(cur.current_curated()))
    assert len(clean_kept) > kept_b0  # batch 1 has real survivors

    # forge the crash: curated + aux deltas for batch 1 landed, the
    # kept delta (the replay guard, written LAST) did not
    shutil.rmtree(str(state / "kept_docs" / "delta-b00000001"))
    assert not cur.kept_log.has(1)
    assert cur.aux_log.has(1)  # the poisonous in-flight delta is there
    cur.process_batch(mk(docs.iloc[half:]), 1)  # replay
    assert set(_ids(cur.current_kept())) == clean_kept
    assert set(_ids(cur.current_curated())) == clean_curated


# ===== strict-policy incremental curator (span-coverage drops) =========
from cuda_gis_smoothing_spark.operators.curate import (
    CURATE_MAX_DUP_RATIO,
    CURATE_MAX_SPAN_COV,
    CURATE_SPAN_GRAM,
    curate_corpus_strict,
)
from cuda_gis_smoothing_spark.streaming.curate import IncrementalStrictCurator


def test_strict_single_batch_equals_batch_strict(spark, tmp_path):
    cur = IncrementalStrictCurator(spark, str(tmp_path / "state"))
    cur.process_batch(_docs(spark), 0)
    got = {
        (r.doc_id, r.n_tokens, r.quality_score)
        for r in cur.current_curated().collect()
    }
    want = {
        (r.doc_id, r.n_tokens, r.quality_score)
        for r in curate_corpus_strict(_docs(spark)).collect()
    }
    assert got == want and len(want) > 0


def _runs(ta, tb, k):
    """Maximal equal-token runs of length >= k between two token
    lists; [(start_a, length)] 0-based — the independent form of the
    gram-seed diagonal merge."""
    out = []
    for d in range(-(len(tb) - 1), len(ta)):
        i, j, run = max(0, d), max(0, d) - d, 0
        while i < len(ta) and j < len(tb):
            if ta[i] == tb[j]:
                run += 1
            else:
                if run >= k:
                    out.append((i - run, run))
                run = 0
            i += 1
            j += 1
        if run >= k:
            out.append((i - run, run))
    return out


def _union_len(ivs):
    total, cur_s, cur_e = 0, None, None
    for s, e in sorted(ivs):
        if cur_s is None or s > cur_e + 1:
            if cur_s is not None:
                total += cur_e - cur_s + 1
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    return total + (cur_e - cur_s + 1 if cur_s is not None else 0)


def _strict_oracle(batches, k=CURATE_SPAN_GRAM, max_cov=CURATE_MAX_SPAN_COV):
    """batches: list of [(doc_id, text)] AFTER lang/quality filtering —
    independent Python implementation of the documented streaming
    semantics: repetition filter, first-seen exact dedup, joint
    (prior-kept + batch-peer) interval-union coverage drop, sample."""
    kept = []  # (doc_id, tokens)
    digests = set()
    curated = set()
    for batch in batches:
        reps = []
        for doc_id, text in sorted(batch):
            toks = text.lower().split(" ")
            dup = round(1.0 - len(set(toks)) / len(toks) + 1e-9, 6)
            if dup <= CURATE_MAX_DUP_RATIO:
                reps.append((doc_id, text))
        by_digest = {}
        for doc_id, text in reps:
            by_digest.setdefault(text, doc_id)
        b1 = sorted(
            (doc_id, text)
            for text, doc_id in by_digest.items()
            if text not in digests
        )
        toks = {doc_id: text.lower().split(" ") for doc_id, text in b1}
        survivors = []
        for doc_id, text in b1:
            td = toks[doc_id]
            ivs = []
            for other_id, ot in toks.items():
                if other_id != doc_id:
                    ivs += [(s, s + L - 1) for s, L in _runs(td, ot, k)]
            for _, ktoks in kept:
                ivs += [(s, s + L - 1) for s, L in _runs(td, ktoks, k)]
            cov = round(_union_len(ivs) / len(td) + 1e-9, 6)
            if cov <= max_cov:
                survivors.append((doc_id, text))
        for doc_id, text in survivors:
            kept.append((doc_id, toks[doc_id]))
            digests.add(text)
            if ((doc_id * S_A + S_B) % MH_PRIME) % _DENOM < int(
                SAMPLE_F * _DENOM
            ):
                curated.add(doc_id)
    return curated


def test_strict_multi_batch_matches_python_oracle(spark, tmp_path):
    docs = _docs(spark)
    base = filtered_base(docs, "en", 0.5).orderBy("doc_id").toPandas()
    cuts = [0, len(base) // 3, 2 * len(base) // 3, len(base)]
    batches_pd = [base.iloc[cuts[i]:cuts[i + 1]] for i in range(3)]

    cur = IncrementalStrictCurator(
        spark, str(tmp_path / "state"), compact_every=2
    )
    for bid, bpd in enumerate(batches_pd):
        bdf = spark.createDataFrame(
            bpd[["doc_id", "text"]].assign(
                lang="en", source="s", n_chars=bpd["text"].str.len()
            ),
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        cur.process_batch(bdf, bid)

    got = set(_ids(cur.current_curated()))
    want = _strict_oracle(
        [list(zip(b["doc_id"], b["text"])) for b in batches_pd]
    )
    assert got == want and len(want) > 0


def test_strict_crash_between_aux_and_kept_writes(spark, tmp_path):
    """The inherited crash contract must hold for the strict subclass
    too: crashed aux delta for batch N excluded on replay, original
    kept/curated sets reproduced."""
    import shutil

    docs = _docs(spark).orderBy("doc_id").toPandas()
    half = len(docs) // 2
    mk = lambda pdf: spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    state = tmp_path / "state"
    cur = IncrementalStrictCurator(spark, str(state))
    cur.process_batch(mk(docs.iloc[:half]), 0)
    kept_b0 = cur.current_kept().count()
    cur.process_batch(mk(docs.iloc[half:]), 1)
    clean_kept = set(_ids(cur.current_kept()))
    clean_curated = set(_ids(cur.current_curated()))
    assert len(clean_kept) > kept_b0

    shutil.rmtree(str(state / "kept_docs" / "delta-b00000001"))
    assert not cur.kept_log.has(1) and cur.aux_log.has(1)
    cur.process_batch(mk(docs.iloc[half:]), 1)  # replay
    assert set(_ids(cur.current_kept())) == clean_kept
    assert set(_ids(cur.current_curated())) == clean_curated


def test_strict_cross_batch_drop_is_monotone(spark, tmp_path):
    """A later doc heavily covered by PRIOR kept text is dropped; the
    prior kept doc is NOT retroactively dropped (the documented
    monotone direction of the symmetric batch rule)."""
    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # quality/lang-passing base text (needs stopwords for lang=en)
    t0 = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "far away to find some quiet water near a shady tree"
    )
    cur = IncrementalStrictCurator(spark, str(tmp_path / "state"))
    cur.process_batch(mk([(1, t0, "en", "s", len(t0))]), 0)
    assert set(_ids(cur.current_kept())) == {1}
    # batch 2: one near-copy (prefix lifted from t0 -> high coverage),
    # one fresh doc
    copy = t0.split(" ")
    lifted = " ".join(copy[:18]) + " with totally different closing words here"
    fresh = (
        "a completely different story was written this morning about "
        "bright mountains and the cold wind that blows in winter there"
    )
    cur.process_batch(
        mk([(2, lifted, "en", "s", len(lifted)), (3, fresh, "en", "s", len(fresh))]),
        1,
    )
    assert set(_ids(cur.current_kept())) == {1, 3}  # 2 dropped, 1 stays


def test_strict_aux_log_is_the_cross_batch_span_source(spark, tmp_path):
    """(1) the stored gram postings equal gram_positions over the kept
    text; (2) a crafted span-copier of a kept doc is dropped
    cross-batch; (3) with a POISONED aux log the same doc survives —
    proving the cross-batch span seeds read the log, not re-derived
    kept text."""
    import os
    import shutil

    from pyspark.sql import functions as F

    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    t0 = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "far away to find some quiet water near a shady tree"
    )
    lifted = " ".join(t0.split(" ")[:18]) + " with totally different closing words here"
    copier = mk([(2, lifted, "en", "s", len(lifted))])

    from cuda_gis_smoothing_spark.operators.dedup import gram_positions

    cur = IncrementalStrictCurator(spark, str(tmp_path / "state_a"))
    cur.process_batch(mk([(1, t0, "en", "s", len(t0))]), 0)
    stored = {
        (r["doc_id"], p["_pos"], p["_g"])
        for r in cur.aux_log.read().collect()
        for p in r["_gp"]
    }
    derived = {
        (r["doc_id"], r["_pos"], r["_g"])
        for r in gram_positions(cur.current_kept(), cur.gram_len).collect()
    }
    assert stored == derived and stored
    cur.process_batch(copier, 1)
    assert set(_ids(cur.current_kept())) == {1}  # dropped via the log

    cur2 = IncrementalStrictCurator(spark, str(tmp_path / "state_b"))
    cur2.process_batch(mk([(1, t0, "en", "s", len(t0))]), 0)
    aux_dir = str(tmp_path / "state_b" / "kept_aux" / "delta-b00000000")
    poisoned = cur2.aux_log.read().select(
        "doc_id",
        "_k",
        F.expr(
            "transform(_gp, p -> struct(p._pos AS _pos, 'zzz' AS _g))"
        ).alias("_gp"),
        "_n",
    )
    poisoned.write.mode("overwrite").parquet(aux_dir + ".tmp")
    shutil.rmtree(aux_dir)
    os.rename(aux_dir + ".tmp", aux_dir)
    cur2.process_batch(copier, 1)
    assert set(_ids(cur2.current_kept())) == {1, 2}  # log IS the source


def test_strict_cross_batch_join_never_rebuilds_stored_grams(spark, tmp_path):
    """The per-batch cross-batch span job must consume STORED gram
    postings (VERDICT r4 #5): the analyzed _drops plan for a follow-up
    batch contains ZERO gram-assembly expressions (array_join/slice) —
    both sides explode materialized postings — and the stored side is
    semi-joined to the batch's gram set before the span join."""
    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    t0 = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "far away to find some quiet water near a shady tree"
    )
    cur = IncrementalStrictCurator(spark, str(tmp_path / "state"))
    cur.process_batch(mk([(1, t0, "en", "s", len(t0))]), 0)
    nxt = mk([(2, t0 + " extra tail words", "en", "s", len(t0) + 17)])
    # mimic process_batch's staging for batch 1 (checkpoints cut the
    # batch side's own gram-build lineage, as in the real path)
    b = cur._batch_base(nxt).localCheckpoint()
    aux_b = cur._aux(b).localCheckpoint()
    prior_aux = cur.aux_log.read(before_batch_id=1).localCheckpoint()
    plan = cur._drops(b, aux_b, prior_aux)._jdf.queryExecution().analyzed().toString()
    assert "array_join" not in plan and "slice" not in plan
    assert "LeftSemi" in plan  # the batch-gram prefilter on the stored side


def test_strict_stream_wiring_equals_sequential_batches(spark, tmp_path):
    """The inherited start() wiring must drive the strict curator to
    the same state as direct sequential process_batch calls."""
    from pyspark.sql import functions as F

    docs = _docs(spark)
    src = str(tmp_path / "src")
    halves = ((0, 250), (250, 10**9))
    for i, (lo, hi) in enumerate(halves):
        docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.parquet(f"{src}/part{i}")
    streamed = IncrementalStrictCurator(spark, str(tmp_path / "state_s"))
    q = streamed.start(f"{src}/part*", str(tmp_path / "ckpt"))
    assert q.awaitTermination(300), "availableNow query did not finish"

    direct = IncrementalStrictCurator(spark, str(tmp_path / "state_d"))
    for bid, (lo, hi) in enumerate(halves):
        direct.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    assert set(_ids(streamed.current_curated())) == set(
        _ids(direct.current_curated())
    )
    assert set(_ids(streamed.current_kept())) == set(_ids(direct.current_kept()))


def test_band_log_is_the_cross_batch_candidate_source(spark, tmp_path):
    """(1) the persisted band-value log equals the signatures derived
    from the kept docs' text; (2) a crafted near-dup of a kept doc is
    dropped cross-batch; (3) with a POISONED band log the same doc
    survives — proving candidate generation reads the log and the
    per-batch plan no longer re-derives kept signatures from text."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from cuda_gis_smoothing_spark.operators.dedup import band_values_projection

    docs = _docs(spark)
    cur = IncrementalCurator(spark, str(tmp_path / "state_a"))
    cur.process_batch(docs, 0)
    kept = cur.current_kept()

    stored = {
        (r["doc_id"], tuple(r["_bvs"])) for r in cur.aux_log.read().collect()
    }
    derived = {
        (r["doc_id"], tuple(r["_bvs"]))
        for r in band_values_projection(kept, 6, 3).collect()
    }
    assert stored == derived and stored

    # craft near-dups: source text + one new token (jaccard n/(n+1))
    rows = kept.orderBy("doc_id").collect()
    cand_rows = [
        (100000 + r["doc_id"], r["text"] + " zzqx", "en", "s", len(r["text"]) + 5)
        for r in rows
        if len({t for t in r["text"].lower().split(" ") if t}) >= 15
    ]
    cand_df = spark.createDataFrame(
        cand_rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    base_bv = {r["doc_id"]: list(r["_bvs"]) for r in cur.aux_log.read().collect()}
    cand_bv = {
        r["doc_id"]: list(r["_bvs"])
        for r in band_values_projection(cand_df, 6, 3).collect()
    }
    ok_ids = {r["doc_id"] for r in filtered_base(cand_df, "en", 0.5).collect()}
    probe_id = next(
        cid
        for cid, bv in sorted(cand_bv.items())
        if cid in ok_ids
        and any(a == b for a, b in zip(bv, base_bv[cid - 100000]))
    )
    batch1 = cand_df.where(F.col("doc_id") == probe_id)

    n_kept = kept.count()
    cur.process_batch(batch1, 1)
    assert cur.current_kept().count() == n_kept  # dropped via the log

    cur2 = IncrementalCurator(spark, str(tmp_path / "state_b"))
    cur2.process_batch(docs, 0)
    band_dir = str(tmp_path / "state_b" / "kept_aux" / "delta-b00000000")
    poisoned = cur2.aux_log.read().select(
        "doc_id",
        F.expr("transform(_bvs, x -> CAST(-1 AS BIGINT))").alias("_bvs"),
        "_k",
        "_tok",
    )
    poisoned.write.mode("overwrite").parquet(band_dir + ".tmp")
    shutil.rmtree(band_dir)
    os.rename(band_dir + ".tmp", band_dir)
    cur2.process_batch(batch1, 1)
    assert cur2.current_kept().count() == n_kept + 1  # log IS the source


def test_band_log_backfilled_for_pre_upgrade_state(spark, tmp_path):
    """A state dir written before the aux log existed (no kept_aux
    dir): the first post-upgrade batch must BACKFILL the log with the
    prior kept docs' band values — otherwise every later batch treats
    the incomplete log as the full candidate source and admits
    near-dups of pre-upgrade kept docs."""
    import shutil

    from cuda_gis_smoothing_spark.operators.dedup import band_values_projection

    docs = _docs(spark)
    state = tmp_path / "state"
    cur = IncrementalCurator(spark, str(state))
    cur.process_batch(docs, 0)
    shutil.rmtree(str(state / "kept_aux"))  # forge the pre-upgrade dir
    assert cur.aux_log.read() is None

    # an all-filtered batch (German stopword text -> lang != en) still
    # triggers the fallback path and the backfill write
    junk = spark.createDataFrame(
        [(90000, "der die das und der die", "de", "s", 23)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    cur.process_batch(junk, 1)
    stored = {
        (r["doc_id"], tuple(r["_bvs"])) for r in cur.aux_log.read().collect()
    }
    derived = {
        (r["doc_id"], tuple(r["_bvs"]))
        for r in band_values_projection(cur.current_kept(), 6, 3).collect()
    }
    assert stored == derived and stored


def test_band_log_backfill_survives_crash_replay(spark, tmp_path):
    """Crash window DURING the backfill batch: the band delta landed,
    the kept delta did not. The replay must backfill AGAIN (the
    decision is 'no band snapshot older than this batch', which a
    crashed backfill delta does not satisfy) — `read() is None` would
    skip it and overwrite the delta with survivors-only keys, silently
    losing the pre-upgrade docs' band values."""
    import shutil

    from cuda_gis_smoothing_spark.operators.dedup import band_values_projection

    docs = _docs(spark)
    state = tmp_path / "state"
    cur = IncrementalCurator(spark, str(state))
    cur.process_batch(docs, 0)
    shutil.rmtree(str(state / "kept_aux"))  # forge the pre-upgrade dir

    junk = spark.createDataFrame(
        [(90000, "der die das und der die", "de", "s", 23)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    cur.process_batch(junk, 1)  # the backfill batch
    # forge the crash: band delta for batch 1 exists, kept delta removed
    shutil.rmtree(str(state / "kept_docs" / "delta-b00000001"))
    assert not cur.kept_log.has(1)
    cur.process_batch(junk, 1)  # replay

    stored = {
        (r["doc_id"], tuple(r["_bvs"])) for r in cur.aux_log.read().collect()
    }
    derived = {
        (r["doc_id"], tuple(r["_bvs"]))
        for r in band_values_projection(cur.current_kept(), 6, 3).collect()
    }
    assert stored == derived and stored
