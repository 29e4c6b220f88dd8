"""Seeded randomized differential tests for the round-2 operators:
each Spark implementation vs an independent pure-Python oracle on
random instances (fixed seeds — deterministic CI, no per-example Spark
jobs like hypothesis would generate)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_star_components_vs_union_find(spark, seed):
    """Large-star/small-star on a random graph == Python union-find."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        _canonical_edges,
        _large_star,
        _small_star,
    )

    rng = np.random.default_rng(seed)
    n, m = 200, 160
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2)) if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}

    e = _canonical_edges(
        spark.createDataFrame(edges, ["a", "b"])
    ).localCheckpoint()
    for _ in range(12):
        nxt = _small_star(_large_star(e)).localCheckpoint()
        if nxt.exceptAll(e).union(e.exceptAll(nxt)).limit(1).count() == 0:
            e = nxt
            break
        e = nxt
    roots = {r["a"]: r["b"] for r in e.groupBy("a").agg(F.min("b").alias("b")).collect()}
    got = {i: roots.get(i, i) for i in range(n)}
    assert got == want


@pytest.mark.parametrize("seed", [3, 41])
def test_prefix_jaccard_vs_bruteforce_random_docs(spark, seed):
    """Prefix-filtered jaccard == brute force on random small-vocab
    docs (dense overlap regime — the worst case for candidate bugs)."""
    from cuda_gis_smoothing_spark.operators.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(15)]
    docs = []
    for i in range(60):
        k = int(rng.integers(3, 12))
        toks = rng.choice(vocab, size=k, replace=True)
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    thr = 0.5
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(df, threshold=thr, block_col=None).collect()
    }
    sets = {i: set(t.split()) for i, t in docs}
    want = set()
    for a in range(60):
        for b in range(a + 1, 60):
            i = len(sets[a] & sets[b])
            j = i / (len(sets[a]) + len(sets[b]) - i)
            if round(j + 1e-9, 6) >= thr:
                want.add((a, b, round(j + 1e-9, 6)))
    assert got == want


@pytest.mark.parametrize("seed", [5, 47])
def test_prefix_containment_vs_bruteforce_random_docs(spark, seed):
    """Asymmetric-prefix containment == brute force on random
    small-vocab docs, plus an explicit doc-inside-doc pair (the case
    jaccard misses and containment exists for). The asymmetric
    candidate join (smaller side prefix x larger side full postings)
    must lose NOTHING."""
    from cuda_gis_smoothing_spark.operators.dedup import containment_pairs

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(18)]
    docs = []
    for i in range(50):
        k = int(rng.integers(2, 14))
        toks = rng.choice(vocab, size=k, replace=True)
        docs.append((i, " ".join(toks)))
    # doc 100 = a strict token-subset of doc 101 (containment 1.0,
    # jaccard ~0.3)
    docs.append((100, "w0 w1 w2 w3"))
    docs.append((101, "w0 w1 w2 w3 w5 w6 w7 w8 w9 w10 w11 w12 w13"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    thr = 0.7
    got = {
        (r.doc_a, r.doc_b, r.containment)
        for r in containment_pairs(df, threshold=thr, block_col=None).collect()
    }
    sets = {i: set(t.split()) for i, t in docs}
    ids = sorted(sets)
    want = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            i = len(sets[a] & sets[b])
            c = round(i / min(len(sets[a]), len(sets[b])) + 1e-9, 6)
            if c >= thr:
                want.add((a, b, c))
    assert (100, 101, 1.0) in want  # the doc-inside-doc pair is live
    assert got == want


def test_containment_banded_subset_of_exact_with_positive_recall(spark):
    """The LSH candidate route: banded containment pairs must be a
    SUBSET of the exact asymmetric-prefix result (verification is the
    same exact predicate — only candidate recall is traded), with
    positive measured recall on a corpus of bounded-ratio near-dup
    families, identical containment values on every surviving pair,
    and the documented blind spot demonstrated: a tiny doc strictly
    inside a doc ≥ 4x its size is OUT of candidate scope (bucket gap)."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_banded,
    )

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    # near-dup families with bounded size ratio (the banded regime)
    for fam in range(12):
        base = list(rng.choice(vocab, size=int(rng.integers(8, 14)), replace=False))
        docs.append((fam * 10, " ".join(base)))
        docs.append((fam * 10 + 1, " ".join(base + [rng.choice(vocab)])))
    # the blind spot: 3 tokens strictly inside a 24-token doc (ratio 8)
    big = list(rng.choice(vocab, size=24, replace=False))
    docs.append((900, " ".join(big)))
    docs.append((901, " ".join(big[:3])))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    thr = 0.8

    exact = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(df, threshold=thr, block_col=None).collect()
    }
    banded = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs_banded(df, threshold=thr).collect()
    }
    assert set(banded) <= set(exact)
    assert (900, 901) in exact or (901, 900) in exact  # exact path sees it
    assert (900, 901) not in banded and (901, 900) not in banded  # by design
    recall = len(banded) / len(exact)
    assert 0 < recall < 1, recall  # positive, and honestly partial
    for k, v in banded.items():
        assert v == exact[k]  # surviving pairs: the exact value


def test_containment_max_df_cap(spark):
    """The stop-token skew lever on the asymmetric containment join
    (VERDICT r4 #2; bm25_search max_df is the template). Corpus with a
    universal token 'the' (df = corpus size):
    (a) max_df >= true max df: output IDENTICAL to the uncapped run;
    (b) max_df below the hot token's df: exactly the pairs whose ONLY
        shared token is the hot one leave the result (the documented
        stop-list recall trade); every surviving pair's containment
        value is unchanged (verification intersects FULL token sets);
    (c) the fan-out bound: under the cap every token remaining on the
        full postings side has df <= cap, so a join key's input is
        <= (its prefix df) x cap rows — the per-task bound one
        stop-token would otherwise break with (prefix df) x N."""
    from cuda_gis_smoothing_spark.operators.dedup import containment_pairs

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(18)]
    docs = []
    for i in range(50):
        k = int(rng.integers(2, 10))
        toks = rng.choice(vocab, size=k, replace=True)
        docs.append((i, " ".join(toks) + " the"))  # 'the' in EVERY doc
    # a pair above threshold whose ONLY shared token is the hot one:
    # E = {the} strictly inside F -> containment 1.0 via 'the' alone
    docs.append((100, "the"))
    docs.append((101, "the zq1 zq2"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    thr = 0.7
    n_docs = len(docs)

    def run(cap):
        return {
            (r.doc_a, r.doc_b, r.containment)
            for r in containment_pairs(
                df, threshold=thr, block_col=None, max_df=cap
            ).collect()
        }

    uncapped = run(None)
    assert (100, 101, 1.0) in uncapped
    # (a) cap at the true max df (the universal token): unchanged
    assert run(n_docs) == uncapped
    # (b) cap excludes exactly the hot token from the full side
    cap = n_docs - 1
    capped = run(cap)
    sets = {i: set(t.split()) for i, t in docs}
    only_hot = {
        (a, b, c)
        for (a, b, c) in uncapped
        if sets[a] & sets[b] == {"the"}
    }
    assert (100, 101, 1.0) in only_hot  # the constructed casualty is live
    assert capped == uncapped - only_hot
    # (c) analytic fan-out bound: every token surviving on the full
    # side has df <= cap (the hot key is gone)
    dfreq = {}
    for s in sets.values():
        for t in s:
            dfreq[t] = dfreq.get(t, 0) + 1
    assert max(v for t, v in dfreq.items() if v <= cap) <= cap
    assert dfreq["the"] == n_docs > cap  # the skew really existed


@pytest.mark.parametrize("boundaries", ["uniform", "quantile"])
def test_global_ranks_vs_enumerate_random_keys(spark, boundaries):
    """global_ranks == sorted enumerate under negative keys, duplicate
    leading keys, and a non-trivial partition count, for both boundary
    modes."""
    from cuda_gis_smoothing_spark.plans.partitioning import global_ranks

    rng = np.random.default_rng(5)
    rows = [
        (int(rng.integers(-500, 500)), i) for i in range(1200)
    ]  # leading key repeats; (k, uid) unique
    df = spark.createDataFrame(rows, ["k", "uid"]).repartition(9)
    got = {
        r["uid"]: r["rnk"]
        for r in global_ranks(
            df, ["k", "uid"], "rnk", num_partitions=7, boundaries=boundaries
        ).collect()
    }
    want = {
        uid: pos + 1
        for pos, (_, uid) in enumerate(sorted(rows))
    }
    assert got == want


@pytest.mark.parametrize("boundaries", ["uniform", "quantile"])
def test_global_prefix_sums_vs_enumerate(spark, boundaries):
    """global_prefix_sums == a Python running sum over the sorted rows
    (exclusive), under negative keys, duplicate leading keys, zero
    values, and a partition count that matches neither the data's nor
    the bucket count — both boundary modes."""
    from cuda_gis_smoothing_spark.plans.partitioning import global_prefix_sums

    rng = np.random.default_rng(11)
    rows = [
        (int(rng.integers(-300, 300)), i, int(rng.integers(0, 40)))
        for i in range(900)
    ]
    df = spark.createDataFrame(rows, ["k", "uid", "v"]).repartition(9)
    got = {
        r["uid"]: r["pfx"]
        for r in global_prefix_sums(
            df, ["k", "uid"], "v", "pfx", num_partitions=7, boundaries=boundaries
        ).collect()
    }
    want, acc = {}, 0
    for _, uid, v in sorted(rows):
        want[uid] = acc
        acc += v
    assert got == want


def test_pack_sequences_vs_python(spark):
    """pack_sequences == a Python concat-and-chunk walk in doc_id
    order, including a doc that straddles a sequence boundary."""
    from cuda_gis_smoothing_spark.operators.packing import pack_sequences

    rng = np.random.default_rng(13)
    rows = [
        (i, " ".join("w" for _ in range(int(rng.integers(1, 40)))))
        for i in range(0, 400, 3)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    L = 64
    got = {
        r.doc_id: (r.n_tokens, r.start_seq, r.seq_offset)
        for r in pack_sequences(df, seq_len=L).collect()
    }
    acc, want, straddles = 0, {}, 0
    for doc_id, text in sorted(rows):
        n = len(text.split(" "))
        want[doc_id] = (n, acc // L, acc % L)
        straddles += (acc % L) + n > L
        acc += n
    assert got == want
    assert straddles > 0  # boundary-straddling docs are exercised


def test_packing_manifest_invariants(spark):
    """Manifest fragments reassemble the packed stream exactly: every
    FULL sequence's fragments sum to seq_len with contiguous
    seq_token ranges, every doc's fragments cover 0..n_tokens in
    order, and fragment placement matches pack_sequences."""
    from cuda_gis_smoothing_spark.operators.packing import (
        pack_sequences,
        packing_manifest,
    )

    rng = np.random.default_rng(17)
    rows = [
        (i, " ".join("w" for _ in range(int(rng.integers(1, 90)))))
        for i in range(0, 300, 2)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    L = 64
    man = packing_manifest(df, seq_len=L).collect()
    placed = {
        r.doc_id: (r.n_tokens, r.start_seq, r.seq_offset)
        for r in pack_sequences(df, seq_len=L).collect()
    }
    total = sum(n for n, _, _ in placed.values())
    by_seq, by_doc = {}, {}
    for r in man:
        by_seq.setdefault(r.seq_id, []).append(r)
        by_doc.setdefault(r.doc_id, []).append(r)
    n_full = total // L
    for s in range(n_full):
        frs = sorted(by_seq[s], key=lambda r: r.seq_token_start)
        assert sum(f.n_frag for f in frs) == L
        pos = 0
        for f in frs:
            assert f.seq_token_start == pos  # no gaps, no overlaps
            pos += f.n_frag
    for doc_id, frs in by_doc.items():
        frs = sorted(frs, key=lambda r: r.doc_token_start)
        n, start_seq, seq_offset = placed[doc_id]
        assert frs[0].doc_token_start == 0
        assert frs[0].seq_id == start_seq
        assert frs[0].seq_token_start == seq_offset
        pos = 0
        for f in frs:
            assert f.doc_token_start == pos
            pos += f.n_frag
        assert pos == n  # full doc covered


def test_scatter_int_vs_python_gather(spark):
    """Fixed-point scatter smoothing == a Python integer gather over
    the same ragged random grid (holes included)."""
    from cuda_gis_smoothing_spark.hexgrid import ENC, OFFSET, kring_offsets
    from cuda_gis_smoothing_spark.operators.smoothing import smooth_scatter_int

    rng = np.random.default_rng(11)
    cells = {}
    for q in range(12):
        for r in range(12):
            if rng.random() < 0.8:
                cells[(q + OFFSET) * ENC + (r + OFFSET)] = int(rng.integers(0, 5000))
    df = spark.createDataFrame(list(cells.items()), ["cell", "qty"])
    w = {0: 10_000, 1: 6_065, 2: 1_353}
    got = {
        r["cell"]: r["s"]
        for r in smooth_scatter_int(df, "qty", w, k=2, out_col="s").collect()
    }
    offs = [(dq * ENC + dr, ring) for dq, dr, ring in kring_offsets(2, True)]
    want = {}
    for c, _ in cells.items():
        num = den = 0
        for delta, ring in offs:
            v = cells.get(c + delta)
            if v is not None:
                num += v * w[ring]
                den += w[ring]
        want[c] = num / den
    assert set(got) == set(want)
    for c in got:
        assert got[c] == want[c], c  # exact float equality (int division)


@pytest.mark.parametrize("seed", [3, 41])
def test_blocked_bucket_drops_vs_python_lsh_oracle(spark, seed):
    """lsh_blocked_neardup_drops == an independent pure-Python
    recomputation of the declared semantics (minhash band candidates →
    exact jaccard → drop the larger id) on random small-vocab docs —
    covering candidate generation, first-shared-band dedup, the size
    prefilter, and the blocked join in one differential."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        MH_A,
        MH_B,
        MH_PRIME,
        lsh_blocked_neardup_drops,
    )

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for i in range(70):
        k = int(rng.integers(2, 10))
        toks = rng.choice(vocab, size=k, replace=True)
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    thr = 0.6

    def tok_hash(t):
        acc = 7
        for c in t:
            acc = (acc * 131 + ord(c)) % MH_PRIME
        return acc

    def bands_of(text, n_hashes=6, bands=3):
        toks = {t for t in text.lower().split(" ") if t}
        hs = [tok_hash(t) for t in toks]
        if not hs:
            return set()
        mh = [
            min((h * MH_A[i] + MH_B[i]) % MH_PRIME for h in hs)
            for i in range(n_hashes)
        ]
        return {
            (b, (mh[2 * b] * 8191 + mh[2 * b + 1]) % MH_PRIME)
            for b in range(bands)
        }

    sets = {i: {t for t in t_.split(" ") if t} for i, t_ in docs}
    bands = {i: bands_of(t_) for i, t_ in docs}
    want = set()
    for a in range(70):
        for b in range(a + 1, 70):
            if not (bands[a] & bands[b]):
                continue
            i = len(sets[a] & sets[b])
            if round(i / (len(sets[a]) + len(sets[b]) - i) + 1e-9, 6) >= thr:
                want.add(b)
    for n_blocks in (1, 4):
        got = {
            r.doc_id
            for r in lsh_blocked_neardup_drops(
                df, thr, n_blocks=n_blocks
            ).collect()
        }
        assert got == want, n_blocks
