"""Unit/differential tests for the round-5 retrieval-fusion, JSON
extraction, and data-mixing operators — independent oracles beside the
DuckDB twin gates (the seeded-differential house pattern)."""

import json
import math

import pytest

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_rrf_ranks_match_member_lists(spark):
    """Every doc of each ranker's top-k appears in the fusion with the
    rank equal to its position in that ranker's own gated ordering, and
    the fused score is exactly 1/(k0+r_b) + 1/(k0+r_v)."""
    from cuda_gis_smoothing_spark.operators.retrieval import (
        RRF_K0,
        bm25_topk,
        rrf_fuse_topk,
        tfidf_topk,
    )

    docs = _docs(spark)
    b = [r.doc_id for r in bm25_topk(docs).collect()]  # already ordered
    v = [r.doc_id for r in tfidf_topk(docs).collect()]
    fused = {r.doc_id: r for r in rrf_fuse_topk(docs).collect()}

    assert set(fused) == set(b) | set(v)
    for rank, d in enumerate(b, start=1):
        assert fused[d].bm25_rank == rank
    for rank, d in enumerate(v, start=1):
        assert fused[d].vsm_rank == rank
    for d, row in fused.items():
        expect = (1.0 / (RRF_K0 + row.bm25_rank) if row.bm25_rank else 0.0) + (
            1.0 / (RRF_K0 + row.vsm_rank) if row.vsm_rank else 0.0
        )
        assert row.rrf == pytest.approx(expect, abs=1e-6)


def test_props_stats_vs_python_json(spark):
    """props_field_stats == a pure-Python json.loads oracle over the
    same hostile value classes (strict-integer-only contract)."""
    from cuda_gis_smoothing_spark.operators.events import props_field_stats

    rows = [
        (1, "a", '{"k": 87}'),
        (2, "a", '{"k": "12"}'),
        (3, "a", '{"k": 87.5}'),
        (4, "a", None),
        (5, "a", "not json"),
        (6, "b", '{"x": 1}'),
        (7, "b", '{"k": null}'),
        (8, "b", '{"k": true}'),
        (9, "b", '{"k": -5}'),
        (10, "b", '{"k": 99999999999999999999}'),
        (11, "c", '{"k": "abc"}'),
        # parser-leniency divergence classes + envelope rejections
        (12, "c", '{"k": 3}junk'),
        (13, "c", "{'k': 4}"),
        (14, "c", '{"k": 6,}'),
        (15, "c", '{"k": 1, "m": [1, 2]}'),
        (16, "c", '{ "k" : 9 , "m" : "x,y" }'),
        # trailing newline: the \A..\z anchor class (Java ^..$ would
        # accept this, RE2 would not — both must reject)
        (17, "c", '{"k": 7}\n'),
        (18, "c", '{"k": "12\n"}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, props string"
    )

    import re

    from cuda_gis_smoothing_spark.operators.events import (
        PROPS_FLAT_OBJECT_RE,
    )

    # Python re has no \z (that's Java/RE2); \Z is its exact equivalent
    envelope = re.compile(PROPS_FLAT_OBJECT_RE.replace(r"\z", r"\Z"))

    def oracle_k(p):
        # the gate's contract: strict flat-scalar-object envelope first
        if p is None or not envelope.match(p):
            return None
        try:
            obj = json.loads(p)
        except ValueError:
            return None
        if not isinstance(obj, dict) or "k" not in obj:
            return None
        val = obj["k"]
        # strict-integer contract: JSON ints and integer STRINGS only,
        # within int64 (try_cast NULLs the overflow in both engines)
        if isinstance(val, bool) or val is None:
            return None
        if isinstance(val, float):
            return None
        if isinstance(val, str):
            if not val.lstrip("-").isdigit() or val in ("-", ""):
                return None
            val = int(val)
        if not isinstance(val, int) or not (-(2**63) <= val < 2**63):
            return None
        return val

    expect = {}
    for _, et, p in rows:
        k = oracle_k(p)
        e = expect.setdefault(et, [0, []])
        e[0] += 1
        if k is not None:
            e[1].append(k)

    got = {r.event_type: r for r in props_field_stats(df).collect()}
    assert set(got) == set(expect)
    for et, (n, ks) in expect.items():
        r = got[et]
        assert r.n_events == n and r.n_valid == len(ks)
        if ks:
            assert (r.k_min, r.k_max, r.k_sum) == (min(ks), max(ks), sum(ks))
            assert r.k_avg == pytest.approx(sum(ks) / len(ks), abs=1e-6)
        else:
            assert r.k_min is None and r.k_sum is None and r.k_avg is None


def test_mixture_invariants_and_zero_token_source(spark):
    """natural_share sums to 1 (round6 slack), rates are capped at 1,
    the uniform target is hit exactly when achievable, and an all-NULL
    source reports rate 1 on zero tokens."""
    from cuda_gis_smoothing_spark.operators.curate import (
        source_mixture_weights,
    )

    rows = (
        [(i, "big", "a b c d e f g h") for i in range(60)]  # 480 tokens
        + [(100 + i, "small", "a b") for i in range(10)]  # 20 tokens
        + [(200 + i, "nulls", None) for i in range(3)]  # 0 tokens
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in source_mixture_weights(df).collect()}

    assert set(out) == {"big", "small", "nulls"}
    total = 500
    share_sum = sum(r.natural_share for r in out.values())
    assert abs(share_sum - 1.0) <= len(out) * (5e-7 + 1e-9)
    for r in out.values():
        assert r.sample_rate <= 1.0
    # uniform target: T/S = 500/3 tokens per source
    assert out["big"].tokens == 480
    assert out["big"].sample_rate == pytest.approx(
        (total / 3) / 480, abs=1e-6
    )
    assert out["small"].sample_rate == 1.0  # under target — never upsampled
    assert out["nulls"].tokens == 0 and out["nulls"].sample_rate == 1.0
    assert out["big"].effective_tokens == pytest.approx(
        round((total / 3) / 480 + 1e-9, 6) * 480, abs=1e-6
    )
    assert math.isclose(out["small"].effective_tokens, 20.0)


def test_edit_distance_vs_bruteforce_dp(spark):
    """Every (pair, distance) the gate emits is exactly the Levenshtein
    DP value, and — recall floor — every ASCII pair within max_dist
    whose token sets are IDENTICAL (all bands must then agree) is
    found. Banded recall on token-divergent pairs is probabilistic by
    design and not asserted."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        EDIT_MAX_DIST,
        edit_distance_pairs,
    )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (1, base),
        (2, base[:-3] + "cat"),          # tiny edit, same token set mostly
        (3, base.replace("quick", "quik")),
        (4, "completely different text with other words entirely"),
        (5, base),                        # exact duplicate of 1
        (6, None),                        # NULL text: excluded
        (7, base + "é"),                  # non-ASCII: out of contract
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.edit_distance
        for r in edit_distance_pairs(docs).collect()
    }
    texts = {i: t for i, t in rows if t is not None and t.isascii()}
    for (a, b), d in got.items():
        assert d == lev(texts[a], texts[b]) <= EDIT_MAX_DIST
    # identical-token-set recall floor: the exact duplicate pair
    assert (1, 5) in got and got[(1, 5)] == 0
    assert all(7 not in pair and 6 not in pair for pair in got)


def test_key_skew_gini_vs_python(spark):
    """key_skew_report == a pure-Python Gini over the same counts, on
    an engineered skew (one key owning half the table) and on a uniform
    table (gini 0). NULL keys count as one group."""
    from cuda_gis_smoothing_spark.operators.analytics import key_skew_report

    rows = [(i, 1) for i in range(50)] + [
        (50 + i, 2 + (i % 5)) for i in range(25)
    ] + [(99, None)]
    df = spark.createDataFrame(rows, "event_id long, user_id int")
    r = key_skew_report(df, "user_id").collect()[0]

    from collections import Counter

    counts = Counter(u for _, u in rows)
    xs = sorted(counts.values())
    n, tot = len(xs), sum(xs)
    gini = (2 * sum(i * x for i, x in enumerate(xs, 1)) - (n + 1) * tot) / (
        n * tot
    )
    assert (r.n_keys, r.n_rows, r.max_count) == (n, tot, max(xs))
    assert r.gini == pytest.approx(gini, abs=1e-6)
    assert r.top1_share == pytest.approx(max(xs) / tot, abs=1e-6)

    uniform = spark.createDataFrame(
        [(i, i % 10) for i in range(100)], "event_id long, user_id int"
    )
    assert key_skew_report(uniform, "user_id").collect()[0].gini == 0.0


def test_temperature_mixture_flattens_toward_uniform(spark):
    """alpha=0.5 temperature invariants: weights sum to 1 (round6
    slack), the order of sources is preserved, the mixture is strictly
    FLATTER than natural (max weight < max share, min weight > min
    share), hand-computed sqrt values match, and a zero-token source
    gets weight 0 (never a fake share)."""
    import math

    from cuda_gis_smoothing_spark.operators.curate import (
        source_mixture_temperature,
    )

    rows = (
        [(i, "big", "a b c d e f g h") for i in range(60)]  # 480 tokens
        + [(100 + i, "small", "a b") for i in range(10)]  # 20 tokens
        + [(200 + i, "nulls", None) for i in range(3)]  # 0 tokens
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in source_mixture_temperature(df).collect()}

    assert set(out) == {"big", "small", "nulls"}
    wsum = sum(r.mixture_weight for r in out.values())
    assert abs(wsum - 1.0) <= len(out) * (5e-7 + 1e-9)
    # hand-computed: integerized sqrt weights
    ws = {s: math.floor(math.sqrt(out[s].tokens) * 1e6 + 1e-9) for s in out}
    tot = sum(ws.values())
    for s in out:
        assert out[s].mixture_weight == pytest.approx(ws[s] / tot, abs=1e-6)
    assert out["nulls"].mixture_weight == 0.0
    # flattening: big's weight < its natural share; small's weight >
    assert out["big"].mixture_weight < out["big"].natural_share
    assert out["small"].mixture_weight > out["small"].natural_share
    # order preserved
    assert out["big"].mixture_weight > out["small"].mixture_weight


def test_layout_overlap_sorted_vs_hash(spark):
    """Zone-map semantics on a contiguous cell range: the cell_range
    layout yields PERFECT clustering depth (every bucket's zone map
    overlaps only itself — avg/max overlap 1, span share 1/B) while
    the hash layout's buckets each span ~the whole key range (overlap
    ≈ B, span share ≈ 1). Morton over a contiguous 1-D range widens
    the per-bucket CELL spans (bit interleaving scatters ids)."""
    from cuda_gis_smoothing_spark.operators.stats import (
        LAYOUT_BUCKETS,
        layout_overlap_report,
    )

    B = LAYOUT_BUCKETS
    cells = spark.range(0, 128 * B).withColumnRenamed("id", "cell")
    out = {r.layout: r for r in layout_overlap_report(cells).collect()}

    assert set(out) == {"hash", "cell_range", "morton_range"}
    cr = out["cell_range"]
    assert (cr.n_buckets_used, cr.max_overlap) == (B, 1)
    assert cr.avg_overlap == 1.0
    assert cr.avg_span_share == pytest.approx(1 / B, abs=1e-6)
    h = out["hash"]
    assert h.avg_overlap > B * 0.9
    assert h.avg_span_share > 0.9
    assert out["morton_range"].avg_span_share > cr.avg_span_share


def test_join_size_rate1_is_exact_and_vs_python(spark):
    """join_size_report at rate=1 samples every key (est == exact,
    rel_err 0); at the default rate the exact side matches a pure-
    Python sum of squared counts and the estimate is R x the sampled
    subset's mass (engineered hot key keeps both branches non-zero)."""
    from collections import Counter

    from cuda_gis_smoothing_spark.operators.analytics import (
        JS_A,
        JS_B,
        JS_RATE,
        join_size_report,
    )
    from cuda_gis_smoothing_spark.operators.dedup import MH_PRIME

    rows = [(i % 7, i % 3) for i in range(60)] + [(99, 99)] * 20
    df = spark.createDataFrame(rows, "l_partkey long, l_suppkey long")

    exact = {
        "l_partkey": Counter(p for p, _ in rows),
        "l_suppkey": Counter(s for _, s in rows),
    }
    out = {r.key_col: r for r in join_size_report(df).collect()}
    for col, counts in exact.items():
        r = out[col]
        assert r.exact_size == sum(c * c for c in counts.values())
        assert r.n_keys == len(counts)
        samp = sum(
            c * c
            for k, c in counts.items()
            if ((k % MH_PRIME) * JS_A + JS_B) % MH_PRIME % JS_RATE == 0
        )
        assert r.est_size == JS_RATE * samp

    for r in join_size_report(df, rate=1).collect():
        assert r.est_size == r.exact_size
        assert r.sampled_keys == r.n_keys
        assert r.rel_err == 0.0


def test_value_winsorized_vs_python(spark):
    """Pure-Python winsorized/trimmed differential over sf0.001
    orders: linear-interpolated fences, integer middle sum, clamped
    tails — every column reproduced independently."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        WINSOR_HI,
        WINSOR_LO,
        value_winsorized,
    )
    from cuda_gis_smoothing_spark.sources.tables import load

    orders = load(spark, SF, "orders")
    vals = sorted(
        round(r.o_totalprice * 100)
        for r in orders.select("o_totalprice").collect()
        if r.o_totalprice is not None
    )

    def q(f):
        pos = (len(vals) - 1) * f
        i, frac = int(pos), pos - int(pos)
        return vals[i] + frac * (vals[i + 1] - vals[i]) if frac else float(vals[i])

    lo, hi = q(WINSOR_LO), q(WINSOR_HI)
    mid = [v for v in vals if lo <= v <= hi]
    n_low = sum(1 for v in vals if v < lo)
    n_high = sum(1 for v in vals if v > hi)
    [r] = value_winsorized(orders).collect()
    assert r.n_orders == len(vals)
    assert r.n_low == n_low and r.n_high == n_high
    assert r.p05 == pytest.approx(lo, abs=2e-6)
    assert r.p95 == pytest.approx(hi, abs=2e-6)
    assert r.trimmed_mean_cents == pytest.approx(sum(mid) / len(mid), abs=2e-6)
    want = (sum(mid) + n_low * lo + n_high * hi) / len(vals)
    assert r.winsorized_mean_cents == pytest.approx(want, abs=2e-6)
    # robustness: the winsorized mean sits between the fences
    assert lo <= r.winsorized_mean_cents <= hi


def test_value_winsorized_degenerate_middle_is_null_not_crash(spark):
    """Review catch: with two extreme totals nothing falls inside
    [p05, p95] — n_mid = 0 must yield a NULL trimmed mean (matching
    the DuckDB twin), not an ANSI divide-by-zero crash."""
    from cuda_gis_smoothing_spark.operators.analytics import value_winsorized

    df = spark.createDataFrame(
        [(1, 0.01), (2, 1000.00)], "o_orderkey long, o_totalprice double"
    )
    [r] = value_winsorized(df).collect()
    assert r.n_orders == 2
    assert r.trimmed_mean_cents is None
    assert r.n_low == 1 and r.n_high == 1
