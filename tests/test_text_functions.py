

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


def test_pii_redact_python_oracle(spark):
    """re.sub oracle over engineered texts: typed placeholders, pinned
    order, NULL propagation, non-PII text byte-preserved."""
    import re

    from cuda_gis_smoothing_spark.operators.curate import (
        PII_REDACT_PATTERNS,
        pii_redact,
    )

    rows = [
        (1, "Contact John.Doe+x@Example.ORG today"),
        (2, "ssn 123-45-6789 card 4111111111111111"),
        (3, "plain text, no pii; café ümlaut\n"),
        (4, None),
        (5, "a@b.co9 digits 987654321 end"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r.text_redacted for r in pii_redact(df).collect()}
    for did, text in rows:
        if text is None:
            assert got[did] is None
            continue
        want = text
        for _, pat, rep in PII_REDACT_PATTERNS:
            want = re.sub(pat, rep.replace("\\", "\\\\"), want)
        assert got[did] == want, (did, got[did], want)
    assert got[3] == rows[2][1]  # untouched byte-for-byte
    assert "[SSN]" in got[2] and "[NUMBER]" in got[2]
    assert "[EMAIL]" in got[1]
