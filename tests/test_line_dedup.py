"""C4-style chunk-line dedup: Spark vs an independent pure-Python
oracle on seeded random corpora (engineered cross-doc duplicate spans,
intra-doc repeats, NULL text, newline-embedded and trailing-space
texts), plus targeted semantics checks (keep-first, width param,
all-dropped reassembly)."""

import random

import pytest

from cuda_gis_smoothing_spark.operators.dedup import (
    LINE_MIN_DUP_DOCS,
    boilerplate_chunks,
    chunk_lines,
    line_dedup,
)

WORDS = ["the", "fast", "key", "order", "sort", "merge", "part", "win\ndow",
         "small", "hash", "scan", "join", "batch", "stream", "dup", "é"]


def _mk_corpus(seed: int, n: int = 60):
    """Random docs; every third doc copies an aligned 16-token prefix
    from doc 0 (guaranteed cross-doc duplicate chunks at width 8);
    newline and non-ASCII tokens ride inside texts; two NULL-text docs
    and one doc made ONLY of the shared prefix (all-dropped unless it
    owns the first occurrence)."""
    rng = random.Random(seed)
    shared = " ".join(rng.choice(WORDS) for _ in range(16))
    rows = []
    for i in range(n):
        body = " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 40)))
        text = f"{shared} {body}" if i % 3 == 0 else body
        rows.append((i * 7 + 1, text))
    rows.append((9001, None))
    rows.append((9002, None))
    rows.append((9003, shared + " " + shared))  # intra-doc repeat of the prefix
    return rows


def _oracle(rows, width, min_dup):
    """Pure-Python re-implementation (chunk, doc-frequency, keep global
    first by (doc_id, pos), reassemble)."""
    ex = []  # (doc_id, pos, chunk)
    for doc_id, text in rows:
        if text is None:
            continue
        toks = text.lower().split(" ")
        for p in range(0, (len(toks) + width - 1) // width):
            ex.append((doc_id, p, " ".join(toks[p * width:(p + 1) * width])))
    df, first = {}, {}
    for doc_id, p, c in ex:
        df.setdefault(c, set()).add(doc_id)
        k = (doc_id, p)
        if c not in first or k < first[c]:
            first[c] = k
    out = {}
    for doc_id, text in rows:
        if text is None:
            out[doc_id] = (0, 0, 0, None)
            continue
        kept = [
            (p, c)
            for d, p, c in ex
            if d == doc_id and (len(df[c]) < min_dup or first[c] == (d, p))
        ]
        total = sum(1 for d, _, _ in ex if d == doc_id)
        kept.sort()
        out[doc_id] = (
            total,
            len(kept),
            total - len(kept),
            " ".join(c for _, c in kept),
        )
    return out


@pytest.mark.parametrize("seed,width", [(11, 8), (42, 8), (77, 3)])
def test_line_dedup_matches_python_oracle(spark, seed, width):
    rows = _mk_corpus(seed)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.n_dropped, r.new_text)
        for r in line_dedup(docs, width=width).collect()
    }
    assert got == _oracle(rows, width, LINE_MIN_DUP_DOCS)


def test_keep_first_occurrence_survives(spark):
    """The duplicate chunk's (min doc_id, min pos) occurrence is the
    one kept — C4 keeps one copy, not zero."""
    docs = spark.createDataFrame(
        [(5, "a b c d"), (2, "a b c d x y z w"), (9, "q r s t a b c d")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs, width=4).collect()}
    assert out[2].new_text == "a b c d x y z w"  # doc 2 pos 0 is first
    assert out[5].new_text == "" and out[5].n_dropped == 1
    assert out[9].new_text == "q r s t" and out[9].n_kept == 1


def test_boilerplate_topk_order(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "c d"), (5, "c d"),
         (6, "c d c d")],  # intra-doc repeat: n_occ 4 but n_docs 3
        "doc_id long, text string",
    )
    rows = boilerplate_chunks(docs, width=2, min_df=2, k=10).collect()
    assert [(r.chunk, r.n_docs, r.n_occurrences) for r in rows] == [
        ("c d", 3, 4),
        ("a b", 3, 3),
    ]


def test_chunk_lines_partial_tail_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "")], "doc_id long, text string"
    )
    rows = sorted(
        (r.doc_id, r.pos, r.chunk) for r in chunk_lines(docs, width=2).collect()
    )
    assert rows == [(1, 0, "a b"), (1, 1, "c d"), (1, 2, "e"), (2, 0, "")]
