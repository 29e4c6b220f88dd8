"""Randomized differentials + plan shape for the round-3 corpus
analytics additions: repetition_signals (Gopher repetition filters),
source_overlap (cross-source k-gram audit) and bm25_topk (lexical
retrieval). Each operator is checked against an independent pure-Python
oracle on seeded random corpora, including the short-doc edge cases
(single-token and sub-k docs) that trip ANSI element_at / descending
sequence(1, 0)."""

import math
import random
from collections import Counter

import pytest

from cuda_gis_smoothing_spark.operators.curate import (
    repetition_signals,
    source_overlap,
)
from cuda_gis_smoothing_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_topk,
)

VOCAB = ["spark", "join", "filter", "scan", "agg", "row", "the", "a"]


def _rand_docs(seed, n=40):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        ln = rng.choice([1, 1, 2, 3, rng.randint(4, 30)])
        text = " ".join(rng.choice(VOCAB) for _ in range(ln))
        rows.append((i, text, f"src{rng.randint(0, 3)}"))
    return rows


@pytest.mark.parametrize("seed", [7, 23])
def test_repetition_signals_matches_python(spark, seed):
    rows = _rand_docs(seed)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}
    assert len(got) == len(rows)
    for doc_id, text, _ in rows:
        toks = text.lower().split(" ")
        bigs = [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
        tc, bc = Counter(toks), Counter(bigs)
        g = got[doc_id]
        assert g["n_tokens"] == len(toks)
        assert g["distinct_tokens"] == len(tc)
        assert math.isclose(
            g["dup_token_ratio"], 1 - len(tc) / len(toks), abs_tol=2e-6
        )
        assert math.isclose(
            g["top_token_frac"], max(tc.values()) / len(toks), abs_tol=2e-6
        )
        assert g["n_bigrams"] == len(bigs)
        assert g["distinct_bigrams"] == len(bc)
        if bigs:
            assert math.isclose(
                g["top_bigram_frac"], max(bc.values()) / len(bigs), abs_tol=2e-6
            )
        else:
            assert g["top_bigram_frac"] is None


@pytest.mark.parametrize("hash_shingles", [False, True])
def test_source_overlap_matches_python(spark, hash_shingles):
    k = 3
    rows = _rand_docs(11, n=60)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap(df, k=k, hash_shingles=hash_shingles).collect()
    }

    per_src = {}
    for _, text, src in rows:
        toks = text.lower().split(" ")
        per_src.setdefault(src, set()).update(
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        )
    expected = {}
    srcs = sorted(per_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(per_src[a] & per_src[b])
            if shared:
                expected[(a, b)] = (
                    shared,
                    shared / len(per_src[a] | per_src[b]),
                )
    assert set(got) == set(expected)
    for key, (shared, jac) in expected.items():
        assert got[key]["shared_shingles"] == shared
        assert math.isclose(got[key]["overlap_jaccard"], jac, abs_tol=2e-6)


def test_bm25_matches_python(spark):
    terms = ("spark", "join")
    rows = _rand_docs(5, n=30)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = bm25_topk(df, terms=terms, k=30).collect()
    assert len(got) == 30  # k >= corpus: every doc scored

    docs = {i: t.lower().split(" ") for i, t, _ in rows}
    N = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / N
    df_t = {
        t: sum(1 for toks in docs.values() if t in toks) for t in terms
    }
    def score(toks):
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            idf = math.log(1 + (N - df_t[t] + 0.5) / (df_t[t] + 0.5))
            s += idf * tf * (BM25_K1 + 1) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * len(toks) / avgdl)
            )
        return s

    for r in got:
        assert math.isclose(r["bm25"], score(docs[r["doc_id"]]), abs_tol=2e-6)
    # descending by rounded score, doc_id tiebreak — the gate's ordering
    keys = [(-r["bm25"], r["doc_id"]) for r in got]
    assert keys == sorted(keys)


def test_bm25_plan_topk_and_broadcast(spark):
    """Top-k must be TakeOrderedAndProject (per-partition heaps), the
    1-row stats join a broadcast — never a global Sort or a shuffled
    join against a single-row side."""
    rows = _rand_docs(3, n=50)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    plan = bm25_topk(df)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_source_overlap_plan_is_equijoin(spark):
    """The source-pair self-join must hash-join on the shingle (the
    source inequality is a post-join filter), never a cartesian."""
    rows = _rand_docs(9, n=50)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    plan = source_overlap(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------- spans

from cuda_gis_smoothing_spark.operators.dedup import duplicate_spans


def _python_spans(rows, k):
    """Brute-force maximal common runs >= k tokens between doc pairs."""
    docs = {i: t.lower().split(" ") for i, t, *_ in rows}
    out = set()
    ids = sorted(docs)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            ta, tb = docs[a], docs[b]
            # match matrix diagonal scan: maximal equal runs
            for diag in range(-(len(tb) - 1), len(ta)):
                i = max(0, diag)
                j = i - diag
                run = 0
                while i < len(ta) and j < len(tb):
                    if ta[i] == tb[j]:
                        run += 1
                    else:
                        if run >= k:
                            out.add((a, b, i - run + 1, j - run + 1, run))
                        run = 0
                    i += 1
                    j += 1
                if run >= k:
                    out.add((a, b, i - run + 1, j - run + 1, run))
    return out


@pytest.mark.parametrize("seed", [2, 31])
def test_duplicate_spans_matches_python(spark, seed):
    rng = random.Random(seed)
    rows = []
    for i in range(24):
        ln = rng.choice([2, 3, rng.randint(8, 40)])
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(ln))))
    # plant a long shared span across three docs
    span = " ".join(rng.choice(VOCAB) for _ in range(12))
    rows[3] = (3, rows[3][1] + " " + span)
    rows[7] = (7, span + " " + rows[7][1])
    rows[11] = (11, span)
    k = 4
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
        for r in duplicate_spans(df, gram_len=k).collect()
    }
    assert got == _python_spans(rows, k)
    # the planted 12-token span must surface for all three pairs
    planted = {(a, b) for a, b, *_ in got}
    assert {(3, 7), (3, 11), (7, 11)} <= planted


def test_duplicate_spans_hot_gram_cap(spark):
    # one boilerplate gram in EVERY doc + one rare long span
    rows = [(i, "the same old header " + f"u{i} v{i}") for i in range(10)]
    rows.append((90, "x y z w q r s t"))
    rows.append((91, "x y z w q r s t"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = duplicate_spans(df, gram_len=4, max_gram_positions=5).collect()
    # boilerplate header (10 positions for its gram) is dropped from
    # seeding; the rare 8-token span survives
    pairs = {(r.doc_a, r.doc_b) for r in capped}
    assert pairs == {(90, 91)}
    assert {r.span_tokens for r in capped} == {8}
    # uncapped finds the header pairs too
    full = {(r.doc_a, r.doc_b) for r in duplicate_spans(df, gram_len=4).collect()}
    assert (0, 1) in full and (90, 91) in full


def test_duplicate_spans_cap_fragments_interior_hot_gram(spark):
    """Documented capped semantics: a long run whose INTERIOR gram is
    hot fragments at the dropped seed position — the flanks surface as
    shorter overlapping spans, and a min_span above the fragment
    length then loses the duplication entirely."""
    run = "r1 r2 r3 hot1 hot2 hot3 r4 r5 r6"  # 9 tokens, gram_len=3
    rows = [(90, run), (91, run)]
    # make ONLY the interior gram hot (10 extra positions)
    rows += [(i, f"u{i} hot1 hot2 hot3 v{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {
        (r.start_a, r.span_tokens)
        for r in duplicate_spans(df, gram_len=3).collect()
        if (r.doc_a, r.doc_b) == (90, 91)
    }
    assert uncapped == {(1, 9)}
    capped = {
        (r.start_a, r.span_tokens)
        for r in duplicate_spans(df, gram_len=3, max_gram_positions=5).collect()
        if (r.doc_a, r.doc_b) == (90, 91)
    }
    assert capped == {(1, 5), (5, 5)}  # fragmented at the hot seed
    gone = [
        r
        for r in duplicate_spans(
            df, gram_len=3, max_gram_positions=5, min_span=6
        ).collect()
        if (r.doc_a, r.doc_b) == (90, 91)
    ]
    assert gone == []  # the caveat min_span users must know about


def test_duplicate_spans_plan_is_equijoin(spark):
    rows = [(i, "a b c d e f g h") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = (
        duplicate_spans(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


from cuda_gis_smoothing_spark.operators.dedup import span_coverage


@pytest.mark.parametrize("seed", [13, 47])
def test_span_coverage_matches_python(spark, seed):
    rng = random.Random(seed)
    rows = []
    for i in range(20):
        ln = rng.choice([2, rng.randint(8, 40)])
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(ln))))
    span = " ".join(rng.choice(VOCAB) for _ in range(10))
    rows[2] = (2, rows[2][1] + " " + span)
    rows[5] = (5, span + " " + rows[5][1] + " " + span)
    k = 4
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.covered_tokens, r.coverage)
           for r in span_coverage(df, gram_len=k).collect()}
    assert set(got) == {i for i, _ in rows}

    # python oracle: union of interval sets from the brute-force spans
    spans = _python_spans(rows, k)
    covered = {i: set() for i, _ in rows}
    for a, b, sa, sb, ln in spans:
        covered[a].update(range(sa, sa + ln))
        covered[b].update(range(sb, sb + ln))
    for i, text in rows:
        n = len(text.split(" "))
        assert got[i][0] == n
        assert got[i][1] == len(covered[i]), f"doc {i}"
        assert math.isclose(got[i][2], len(covered[i]) / n, abs_tol=2e-6)


from cuda_gis_smoothing_spark.operators.sampling import (
    MH_PRIME,
    S_A,
    S_B,
    _DENOM,
    quality_weighted_sample,
)


def test_quality_weighted_sample_exact_per_row(spark):
    """The kept set is EXACTLY the rows whose portable hash clears the
    floor'd score threshold — recomputed independently in python — and
    is identical across runs."""
    rng = random.Random(3)
    rows = [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 80))), "s")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = {(r.doc_id, r.quality_score) for r in quality_weighted_sample(df).collect()}
    kept2 = {(r.doc_id, r.quality_score) for r in quality_weighted_sample(df).collect()}
    assert kept == kept2

    # full score table (threshold 0 keeps nothing; grab scores via the
    # same operator pipeline with the filter removed)
    from cuda_gis_smoothing_spark.operators.curate import _with_quality_and_lang

    scores = {
        r.doc_id: r.quality_score
        for r in _with_quality_and_lang(df, "doc_id").collect()
    }
    expected = {
        (i, s)
        for i, s in scores.items()
        if (i * S_A + S_B) % MH_PRIME % _DENOM < int(s * _DENOM + 1e-9)
    }
    assert kept == expected
    assert 0 < len(kept) < len(rows)


from cuda_gis_smoothing_spark.operators.retrieval import bm25_search


def test_bm25_search_matches_topk_for_single_terms(spark):
    """For a one-term query, the inverted-index path must score every
    matching doc exactly like the literal-terms path (same idf, same
    length normalisation, single contribution so no sum-order slack)."""
    rows = _rand_docs(19, n=40)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    term = "spark"
    qdf = spark.createDataFrame([(1, term)], "query_id long, term string")
    via_search = {
        r.doc_id: r.bm25 for r in bm25_search(df, qdf, k=1000).collect()
    }
    via_topk = {
        r.doc_id: r.bm25
        for r in bm25_topk(df, terms=(term,), k=1000).collect()
        if r.bm25 != 0.0
    }
    assert via_search == via_topk


def test_bm25_search_multi_term_python_oracle(spark):
    rows = _rand_docs(29, n=30)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    terms = [(7, "join"), (7, "scan"), (8, "the")]
    qdf = spark.createDataFrame(terms, "query_id long, term string")
    got = {(r.query_id, r.doc_id): r.bm25 for r in bm25_search(df, qdf, k=1000).collect()}

    docs = {i: t.lower().split(" ") for i, t, _ in rows}
    N = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / N
    from collections import defaultdict
    qterms = defaultdict(list)
    for q, t in terms:
        qterms[q].append(t)
    dfreq = {t: sum(1 for d in docs.values() if t in d) for _, t in terms}
    for (q, d), score in got.items():
        exp = 0.0
        for t in qterms[q]:
            tf = docs[d].count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            exp += idf * tf * (BM25_K1 + 1) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * len(docs[d]) / avgdl)
            )
        assert exp > 0  # only matching docs appear
        assert math.isclose(score, exp, abs_tol=2e-6)
    # every doc containing a query term appears
    expected_pairs = {
        (q, d)
        for q, ts in qterms.items()
        for d, toks in docs.items()
        if any(t in toks for t in ts)
    }
    assert set(got) == expected_pairs


def test_bm25_search_max_df_cap(spark):
    """The stop-term skew lever (VERDICT r3 #5). Corpus with a
    near-universal term ('the' forced into every doc):
    (a) max_df >= true max df: results IDENTICAL to the uncapped run;
    (b) max_df below the hot term's df: results equal a run whose
        query set never contained the hot term (surviving terms'
        scores untouched — df/N stats still come from full postings);
    (c) the join fan-out bound: with the cap, the postings join input
        for this query set is sum(df of surviving terms) <= #terms *
        max_df — the per-task bound a hot key would otherwise break."""
    rows = [
        (i, t + " the", s) for i, t, s in _rand_docs(41, n=40)
    ]  # 'the' in EVERY doc: df = 40
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    qdf = spark.createDataFrame(
        [(1, "the"), (1, "join"), (2, "scan")], "query_id long, term string"
    )
    toks = {i: t.lower().split(" ") for i, t, _ in rows}
    dfreq = {
        term: sum(1 for d in toks.values() if term in d)
        for term in ("the", "join", "scan")
    }
    assert dfreq["the"] == 40
    uncapped = {
        (r.query_id, r.doc_id): r.bm25
        for r in bm25_search(df, qdf, k=1000).collect()
    }
    # (a) cap above every df: provably unchanged
    at_max = {
        (r.query_id, r.doc_id): r.bm25
        for r in bm25_search(df, qdf, k=1000, max_df=max(dfreq.values())).collect()
    }
    assert at_max == uncapped
    # (b) cap excludes exactly the hot term
    cap = 39
    capped = {
        (r.query_id, r.doc_id): r.bm25
        for r in bm25_search(df, qdf, k=1000, max_df=cap).collect()
    }
    qdf_no_hot = spark.createDataFrame(
        [(1, "join"), (2, "scan")], "query_id long, term string"
    )
    no_hot = {
        (r.query_id, r.doc_id): r.bm25
        for r in bm25_search(df, qdf_no_hot, k=1000).collect()
    }
    assert capped == no_hot
    assert len(capped) < len(uncapped)  # the ~N-row fan-out is gone
    # (c) per-(term)-key join input bound under the cap
    surviving = [t for t in dfreq if dfreq[t] <= cap]
    fanout = sum(dfreq[t] for t in surviving)
    assert fanout <= len(surviving) * cap
    assert max(dfreq[t] for t in surviving) <= cap  # no hot key remains


from cuda_gis_smoothing_spark.operators.curate import curate_corpus_strict


def test_curate_strict_each_stage_fires(spark):
    """One synthetic doc per drop reason; the survivor survives."""
    def admits(i):  # deterministic-sample acceptance at 0.8
        return (i * S_A + S_B) % MH_PRIME % _DENOM < 800_000

    ids = [i for i in range(100) if admits(i)]
    keep_id, dup_id, de_id, rep_id, spanA, spanB = ids[:6]
    # a sampled-out id for the final stage
    out_id = next(i for i in range(100) if not admits(i))

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    good = "the quick cat is of house to bird in tree and pond stone leaf"
    rows = [
        (keep_id, good),                                 # survives
        (dup_id, good),                                  # exact dup (larger id)
        (de_id, "der hund ist nicht und das der und ist nicht das und"),  # lang
        (rep_id, "the the the the the the the the"),     # repetition
        (spanA, span + " the red fox is of to in barn one two"),   # span cov
        (spanB, span + " the old owl is of to in nest six ten"),   # span cov
        # sampled out — text shares NO 4-gram with `good`, else the
        # span stage would drop both before sampling ever ran
        (out_id, "the slow worm is in mud of to deep dark damp hole"),
    ]
    assert dup_id > keep_id
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r.doc_id for r in curate_corpus_strict(df).collect()}
    assert kept == {keep_id}


def test_duplicate_spans_pair_stage_parallelism(spark):
    """The per-diagonal merge must EXECUTE on multiple partitions —
    AQE coalesces the tiny-bytes seed shuffle to one partition unless
    the repartition is user-specified (the CLAUDE.md blind spot).
    Asserted on the result partitioning, which inherits the pinned
    window shuffle (the groupBy reuses its clustering)."""
    rng = random.Random(41)
    rows = [
        (i, " ".join(rng.choice(VOCAB) for _ in range(30))) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import pyspark.sql.functions as F

    spans = duplicate_spans(df, gram_len=3)
    npart = spans.select(F.spark_partition_id().alias("p")).distinct().count()
    assert npart > 1, "span merge coalesced to a single partition"


def test_bm25_rejects_unsafe_terms(spark):
    rows = _rand_docs(1, n=5)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    with pytest.raises(ValueError, match="a-z0-9"):
        bm25_topk(df, terms=("don't",))


from cuda_gis_smoothing_spark.operators.curate import repetition_signals_expr


@pytest.mark.parametrize("seed", [7, 23])
def test_repetition_expr_variant_equals_agg(spark, seed):
    """The shuffle-free expression variant must emit EXACTLY the agg
    variant's rows (same round6'd doubles, same NULL for sub-2-token
    docs) — it is the streaming-legal stateless projection form."""
    rows = _rand_docs(seed) + [(999, None, "s")]  # NULL text: both drop it
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    agg = {tuple(r) for r in repetition_signals(df).collect()}
    expr = {tuple(r) for r in repetition_signals_expr(df).collect()}
    assert agg == expr
    assert 999 not in {t[0] for t in agg}


def test_repetition_expr_variant_is_shuffle_free(spark):
    rows = _rand_docs(3, n=20)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    plan = (
        repetition_signals_expr(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_repetition_expr_variant_streams(spark, tmp_path):
    """Stateless projection => legal on a streaming DataFrame."""
    rows = _rand_docs(9, n=15)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = repetition_signals_expr(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("rep_expr_stream")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow query did not finish"
    got = {tuple(r) for r in spark.sql("SELECT * FROM rep_expr_stream").collect()}
    expected = {tuple(r) for r in repetition_signals(df).collect()}
    assert got == expected


from cuda_gis_smoothing_spark.operators.curate import source_overlap_minhash


def test_source_overlap_minhash_estimates_exact_jaccard(spark):
    """Componentwise-match MinHash estimate vs the exact operator on a
    corpus with engineered overlap levels; n=128 gives se <= 0.045, so
    |est - exact| < 0.2 is ~4.4 sigma per pair — deterministic given
    the fixed hash family, but not tuned to it."""
    k = 3
    rows, rid = [], 0
    # srcA/srcB share most shingles; srcC is disjoint
    for i in range(12):
        t = f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}"
        rows.append((rid, t, "srcA")); rid += 1
        rows.append((rid, t, "srcB")); rid += 1
    for i in range(12):
        rows.append((rid, f"z{i} z{i+1} z{i+2} z{i+3}", "srcC")); rid += 1
    rows.append((rid, "w0 w1 w2 only a here", "srcB"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    exact = {
        (r.source_a, r.source_b): r.overlap_jaccard
        for r in source_overlap(df, k=k).collect()
    }
    est = {
        (r.source_a, r.source_b): r.est_jaccard
        for r in source_overlap_minhash(df, k=k, n_hashes=128).collect()
    }
    assert set(est) == {("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")}
    for pair, e in est.items():
        assert abs(e - exact.get(pair, 0.0)) < 0.2, (pair, e, exact.get(pair))
    # ordering preserved: the high-overlap pair dominates
    assert est[("srcA", "srcB")] > max(est[("srcA", "srcC")], est[("srcB", "srcC")])
    # determinism
    est2 = {
        (r.source_a, r.source_b): r.est_jaccard
        for r in source_overlap_minhash(df, k=k, n_hashes=128).collect()
    }
    assert est == est2


def test_holdout_logprob_differential(spark):
    """Python differential on a synthetic corpus whose ids are chosen
    to land in specific splits, including a val doc with train-UNSEEN
    tokens backed off to the floor 1/(T+V)."""
    import math

    from pyspark.sql import functions as F

    from cuda_gis_smoothing_spark.functions.text import holdout_logprob
    from cuda_gis_smoothing_spark.operators.sampling import (
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        sample_hash_col,
    )

    ids = spark.range(0, 4000).select(
        "id", sample_hash_col("id").alias("h")
    ).collect()
    train_ids = [r.id for r in ids if r.h < SPLIT_TRAIN_LT]
    val_ids = [r.id for r in ids if SPLIT_TRAIN_LT <= r.h < SPLIT_VAL_LT]
    assert len(train_ids) >= 2 and len(val_ids) >= 2
    rows = [
        (train_ids[0], "a a b"),
        (train_ids[1], "b c"),
        (val_ids[0], "a zz"),   # one seen, one unseen
        (val_ids[1], "qq qq"),  # all unseen -> pure floor
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in holdout_logprob(df).collect()
    }
    T, V = 5, 3  # a:2 b:2 c:1
    def p(c):
        return (c + 1) / (T + V)

    r0 = got[val_ids[0]]
    assert (r0.n_token_occurrences, r0.n_unseen) == (2, 1)
    assert abs(r0.avg_neg_logprob - (-(math.log(p(2)) + math.log(p(0))) / 2)) < 1e-6
    r1 = got[val_ids[1]]
    assert (r1.n_token_occurrences, r1.n_unseen) == (2, 2)
    assert abs(r1.avg_neg_logprob - (-math.log(p(0)))) < 1e-6
    # train docs are never scored
    assert set(got) == {val_ids[0], val_ids[1]}


def test_lang_source_chi2_differential(spark):
    """scipy-free Python differential on a small table with an EMPTY
    observed cell (the O=0, E>0 cell a bare groupBy never emits) and a
    NULL lang row (excluded)."""
    from cuda_gis_smoothing_spark.functions.text import lang_source_chi2

    rows = (
        [(i, "en", "s1") for i in range(10)]
        + [(i + 10, "en", "s2") for i in range(5)]
        + [(i + 20, "de", "s1") for i in range(3)]
        # NO (de, s2) cell; one NULL lang row
        + [(30, None, "s2")]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    r = lang_source_chi2(df).collect()[0]
    n = 18.0
    obs = {("en", "s1"): 10, ("en", "s2"): 5, ("de", "s1"): 3, ("de", "s2"): 0}
    rm = {"en": 15, "de": 3}
    cm = {"s1": 13, "s2": 5}
    chi2 = sum(
        (o - rm[l] * cm[s] / n) ** 2 / (rm[l] * cm[s] / n)
        for (l, s), o in obs.items()
    )
    assert (r.n_docs, r.n_langs, r.n_sources, r.dof) == (18, 2, 2, 1)
    assert abs(r.chi2 - chi2) < 1e-5
    assert abs(r.cramers_v - (chi2 / (n * 1)) ** 0.5) < 1e-5


def test_compression_ratio_matches_zlib(spark):
    """doc_compression_ratio (the rows-only pandas-UDF gate) must equal
    a pure-Python zlib computation row for row, with NULL for NULL and
    empty text."""
    import zlib

    from cuda_gis_smoothing_spark.functions.text import doc_compression_ratio

    rows = [
        (1, "the the the the the the the the the the"),  # compresses hard
        (2, "zq8!kf@93jx#mwp2$vd7&hb1*ln5^cr4"),  # high-entropy
        (3, None),
        (4, ""),
        (5, "a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in doc_compression_ratio(docs).collect()}
    for i, t in rows:
        if not t:
            assert got[i]["compression_ratio"] is None
        else:
            b = t.encode("utf-8")
            exp = round(len(zlib.compress(b, 6)) / len(b) + 1e-09, 6)
            assert got[i]["compression_ratio"] == exp
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"]


def test_quality_calibration_ecdf_invariants(spark):
    """cume_dist calibration invariants on an engineered corpus: the
    max quantile per source is exactly 1.0, tied scores share one
    quantile, quantiles are monotone in score, and a source's skewed
    scale calibrates to the same quantile grid as a clean source."""
    import __spark_entry__ as entry_mod

    rows = (
        # source A: four docs, two EXACT ties in the middle
        [(1, "a b c d e f g h " * 8, "en", "A", 0),
         (2, "a b", "en", "A", 0),
         (3, "a b", "en", "A", 0),
         (4, "a b c d", "en", "A", 0)]
        # source B: two docs + a NULL-text doc (carries the degenerate
        # composite score — both engines' LEAST() skips NULL terms —
        # and ranks like any other doc)
        + [(10, "x y z w " * 16, "en", "B", 0),
           (11, "x", "en", "B", 0),
           (12, None, "en", "B", 0)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        for t in ["documents"]:
            df.write.mode("overwrite").parquet(f"{d}/{t}.parquet")
        out = entry_mod.queries()["quality_calibration"](spark, d).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # NULL-text doc is INCLUDED with the deterministic degenerate score
    # (0.5*1 + 0.25*0 + 0.25*1 — the least()-skips-NULL fold, identical
    # in both engines and pinned by the doc_quality fuzz corpus)
    b = {r.doc_id: r for r in out if r.source == "B"}
    assert b[12].quality_score == 0.75
    for src, rs in by_src.items():
        assert max(r.source_quantile for r in rs) == 1.0
        ordered = sorted(rs, key=lambda r: r.quality_score)
        qs = [r.source_quantile for r in ordered]
        assert qs == sorted(qs)  # monotone in score
    a = {r.doc_id: r for r in by_src["A"]}
    assert a[2].source_quantile == a[3].source_quantile  # exact tie
    assert a[2].source_quantile == 0.5  # 2 of 4 rows <= the tied score


def test_doc_skyline_matches_bruteforce(spark):
    """Brute-force O(n²) dominance differential over the sf0.001
    documents table, plus an engineered corpus with ties at a skyline
    point (equal points don't dominate each other — all kept) and a
    strictly dominated duplicate-quality doc."""
    from cuda_gis_smoothing_spark.functions.text import quality_features
    from cuda_gis_smoothing_spark.operators.curate import doc_skyline
    from cuda_gis_smoothing_spark.sources.tables import load

    def brute(pts):
        out = set()
        for i, (q, t) in pts.items():
            dominated = any(
                (q2 >= q and t2 >= t and (q2 > q or t2 > t))
                for j, (q2, t2) in pts.items()
                if j != i
            )
            if not dominated:
                out.add(i)
        return out

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    feats = quality_features(docs).select(
        "doc_id", "quality_score", "n_tokens"
    ).collect()
    pts = {
        r.doc_id: (r.quality_score, r.n_tokens)
        for r in feats
        if r.quality_score is not None and r.n_tokens is not None
    }
    got = {r.doc_id for r in doc_skyline(docs).collect()}
    assert got == brute(pts) and got

    # engineered: two docs with IDENTICAL text tie at one skyline
    # point; a third at the same quality with fewer tokens is dominated
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today", "s"),
        (1, "the quick brown fox jumps over the lazy dog today", "s"),
        (2, "the quick brown fox jumps", "s"),
    ]
    eng = spark.createDataFrame(rows, "doc_id long, text string, source string")
    epts = {
        r.doc_id: (r.quality_score, r.n_tokens)
        for r in quality_features(eng).select(
            "doc_id", "quality_score", "n_tokens"
        ).collect()
    }
    egot = {r.doc_id for r in doc_skyline(eng).collect()}
    assert egot == brute(epts)
    assert {0, 1} <= egot  # the tied pair both survive


def test_quality_mannwhitney_matches_bruteforce(spark):
    """Brute-force pairwise U (count a>b plus half-ties) over the
    sf0.001 corpus, plus the tie-corrected normal z recomputed in
    Python — the operator's integer rank machinery must agree."""
    import math
    from collections import Counter

    from cuda_gis_smoothing_spark.functions.text import (
        quality_features,
        quality_mannwhitney,
    )
    from cuda_gis_smoothing_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    feats = (
        quality_features(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "quality_score")
        .collect()
    )
    a = [round(r.quality_score, 6) for r in feats if r.source == "src0" and r.quality_score is not None]
    b = [round(r.quality_score, 6) for r in feats if r.source == "src1" and r.quality_score is not None]
    u = sum((x > y) + 0.5 * (x == y) for x in a for y in b)
    n1, n2 = len(a), len(b)
    n = n1 + n2
    ties = Counter(a + b)
    tie_sum = sum(t**3 - t for t in ties.values())
    var = (n1 * n2 / 12.0) * ((n + 1) - tie_sum / (n * (n - 1)))
    z = (u - n1 * n2 / 2.0) / math.sqrt(var)
    r = quality_mannwhitney(docs).collect()[0]
    assert (r.n_a, r.n_b) == (n1, n2) and n1 > 0 and n2 > 0
    assert r.u_a == pytest.approx(u, abs=2e-6)
    assert r.z == pytest.approx(z, abs=2e-6)


def test_heaps_fit_matches_python_ols(spark):
    """heaps_fit == a pure-Python cumulative-curve OLS over the same
    tokenization and doc order; beta lands in a sane (0, 1] band on
    the fixture corpus."""
    import math

    import pytest

    from cuda_gis_smoothing_spark.functions.text import heaps_fit
    from cuda_gis_smoothing_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    rows = sorted(
        (r.doc_id, r.text)
        for r in docs.select("doc_id", "text").collect()
    )
    seen, N, V, pts = set(), 0, 0, []
    tt = tv = 0
    for _, text in rows:
        toks = [t for t in (text or "").lower().split(" ") if t]
        if not toks:
            continue
        new = {t for t in toks if t not in seen}
        seen |= new
        N += len(toks)
        V += len(new)
        tt += len(toks)
        tv += len(new)
        pts.append((math.log(N), math.log(V)))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    lnk = (sy - beta * sx) / n

    r = heaps_fit(docs).collect()[0]
    assert (r.n_points, r.total_tokens, r.total_vocab) == (n, tt, tv)
    assert r.heaps_beta == pytest.approx(beta, abs=1e-5)
    assert r.heaps_lnk == pytest.approx(lnk, abs=1e-5)
    assert 0 < r.heaps_beta <= 1


def test_source_heaps_matches_python_and_guards_single_doc(spark):
    """Per-source fits == per-source Python OLS over each source's own
    curve; a single-doc source gets NULL beta/lnK (exact-zero OLS
    denominator, the NULLIF guard); NULL sources dropped."""
    import math

    import pytest

    from cuda_gis_smoothing_spark.functions.text import source_heaps

    rows = [
        (1, "a", "x y z"),
        (2, "a", "x y w w"),
        (3, "a", "v"),
        (4, "lone", "p q r"),
        (5, None, "never counted"),
        (6, "b", None),
        (7, "b", "m n"),
        (8, "b", "m o"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.source: r for r in source_heaps(df).collect()}
    assert set(got) == {"a", "lone", "b"}

    def fit(docs):
        seen, N, V, pts = set(), 0, 0, []
        tt = tv = 0
        for _, text in sorted(docs):
            toks = [t for t in (text or "").lower().split(" ") if t]
            if not toks:
                continue
            new = {t for t in toks if t not in seen}
            seen |= new
            N += len(toks)
            V += len(new)
            tt += len(toks)
            tv += len(new)
            pts.append((math.log(N), math.log(V)))
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        den = n * sxx - sx * sx
        beta = (n * sxy - sx * sy) / den if den != 0 else None
        return n, tt, tv, beta

    for src, docs in (
        ("a", [(1, "x y z"), (2, "x y w w"), (3, "v")]),
        ("b", [(7, "m n"), (8, "m o")]),
    ):
        n, tt, tv, beta = fit(docs)
        r = got[src]
        assert (r.n_points, r.total_tokens, r.total_vocab) == (n, tt, tv)
        assert r.heaps_beta == pytest.approx(beta, abs=1e-5)
    lone = got["lone"]
    assert (lone.n_points, lone.total_tokens, lone.total_vocab) == (1, 3, 3)
    assert lone.heaps_beta is None and lone.heaps_lnk is None


def test_source_diversity_matches_python(spark):
    """Engineered repetitive vs diverse sources: Simpson -> 1 for a
    one-word source, TTR exact integer ratios; NULL source groups as
    its own row; NULL-text docs contribute zero tokens."""
    import pytest

    from cuda_gis_smoothing_spark.functions.text import source_diversity

    rows = [
        (1, "spam spam spam spam", "rep"),
        (2, "spam spam", "rep"),
        (3, "a b c d", "div"),
        (4, "e f g h", "div"),
        (5, None, "div"),          # NULL text: zero tokens
        (6, "x x y", None),        # NULL source group
        (7, "solo", "one"),        # single token: simpson NULL (N(N-1)=0)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in source_diversity(df).collect()}

    def simpson(counts):
        n = sum(counts)
        return sum(c * (c - 1) for c in counts) / (n * (n - 1))

    rep = got["rep"]
    assert (rep.n_tokens, rep.n_types) == (6, 1)
    assert rep.ttr == pytest.approx(1 / 6, abs=1e-6)
    assert rep.simpson == pytest.approx(1.0, abs=1e-6)
    div = got["div"]
    assert (div.n_tokens, div.n_types) == (8, 8)
    assert div.ttr == 1.0 and div.simpson == 0.0
    nul = got[None]
    assert (nul.n_tokens, nul.n_types) == (3, 2)
    assert nul.simpson == pytest.approx(simpson([2, 1]), abs=1e-6)
    assert got["one"].simpson is None


def test_quality_weighted_quantiles_matches_python(spark):
    """Brute-force weighted-quantile differential over the operator's
    OWN (quality, tokens) projection — the probe picks the smallest
    level whose cumulative token weight reaches f·W."""
    import pytest

    from cuda_gis_smoothing_spark.operators.curate import _with_quality_and_lang
    from cuda_gis_smoothing_spark.operators.sampling import (
        QW_QUANTILE_FRACTIONS,
        quality_weighted_quantiles,
    )

    rows = [
        (1, "one two three four five six seven", "s"),
        (2, "a, b,,, c!!!! d.... e", "s"),
        (3, "the and is of to in the and is of", "s"),
        (4, "word " * 80, "s"),
        (5, None, "s"),  # NULL text: out of scope by contract
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    base = [
        (r.quality_score, r.n_tokens)
        for r in _with_quality_and_lang(df, "doc_id").collect()
        if r.n_tokens is not None
    ]
    lv = {}
    for q, w in base:
        lv[q] = lv.get(q, 0) + w
    levels = sorted(lv)
    total = sum(lv.values())
    expect = {}
    for f in QW_QUANTILE_FRACTIONS:
        cum = 0
        for q in levels:
            cum += lv[q]
            if cum >= f * total:
                expect[f] = q
                break
    got = {r.fraction: r.weighted_quality for r in quality_weighted_quantiles(df).collect()}
    assert got == pytest.approx(expect, abs=1e-9)


def test_source_token_gini_matches_python(spark):
    """Descending-rank gini differential: a one-megadoc source is far
    more unequal than a uniform one; singleton gini = 0."""
    import pytest

    from cuda_gis_smoothing_spark.functions.text import source_token_gini

    rows = [
        (1, "w " * 99 + "w", "whale"),     # 100 tokens
        (2, "a b", "whale"),
        (3, "a b", "whale"),
        (4, "x y z", "flat"),
        (5, "p q r", "flat"),
        (6, None, "flat"),                  # NULL text out of scope
        (7, "solo doc", None),              # NULL source group
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in source_token_gini(df).collect()}

    def gini(xs):
        xs = sorted(xs, reverse=True)
        n, s = len(xs), sum(xs)
        return ((n + 1) * s - 2 * sum((j + 1) * x for j, x in enumerate(xs))) / (n * s)

    w = got["whale"]
    assert (w.n_docs, w.total_tokens) == (3, 104)
    assert w.gini == pytest.approx(gini([100, 2, 2]), abs=1e-6)
    f = got["flat"]
    assert (f.n_docs, f.total_tokens) == (2, 6)
    assert f.gini == pytest.approx(0.0, abs=1e-6)
    assert got[None].n_docs == 1 and got[None].gini == pytest.approx(0.0, abs=1e-6)
    assert w.gini > f.gini
