

def test_doc_readability_differential(spark):
    """Python differential for the ARI card over engineered texts:
    counts, the 1-sentence floor, and the wordless-doc drop."""
    import pytest as _pt

    from cuda_gis_smoothing_spark.functions.text import (
        ARI_BIAS,
        ARI_CHARS,
        ARI_WORDS,
        doc_readability,
    )

    rows = [
        (1, "The cat sat. The dog ran!"),
        (2, "no terminator here"),
        (3, "one? two? three?"),
        (4, "   "),
        (5, None),
        (6, "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in doc_readability(df).collect()}
    assert set(got) == {1, 2, 3, 6}  # 4 wordless, 5 NULL -> dropped
    import re

    for did, text in rows:
        if did not in got:
            continue
        low = text.lower()
        words = [w for w in low.split(" ") if w != ""]
        n_chars = len(re.sub(r"[^a-z0-9]", "", low))
        n_sent = max(sum(low.count(c) for c in ".!?"), 1)
        r = got[did]
        assert r.n_alnum_chars == n_chars
        assert r.n_words == len(words)
        assert r.n_sentences == n_sent
        cw, ws = n_chars / len(words), len(words) / n_sent
        assert r.avg_word_len == _pt.approx(cw, abs=2e-6)
        assert r.words_per_sentence == _pt.approx(ws, abs=2e-6)
        assert r.ari == _pt.approx(
            ARI_CHARS * cw + ARI_WORDS * ws + ARI_BIAS, abs=2e-6
        )
    assert got[2].n_sentences == 1
