"""JSONL / CSV source-sink round trips over the real documents
fixture — NULL text, quotes/commas in text, and unicode must survive
byte-identically (the dedup digests downstream depend on it)."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    extra = spark.createDataFrame(
        [
            (100001, 'quote " and, comma', "en", "srcx", 18),
            (100002, None, None, "srcx", None),
            (100003, "unicode héllo ñ 中", "en", "srcx", 17),
            (100004, "", "en", "srcx", 0),
            # embedded newline: the multiLine rationale, exercised
            (100005, "line one\nline two", "en", "srcx", 17),
        ],
        base.schema,
    )
    return base.unionByName(extra)


def _assert_round_trip(original, loaded):
    assert loaded.schema == original.schema
    a = sorted(map(tuple, original.collect()))
    b = sorted(map(tuple, loaded.collect()))
    assert a == b


def test_jsonl_round_trip(spark, docs, tmp_path):
    from cuda_gis_smoothing_spark.sources.text_formats import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    p = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, p)
    _assert_round_trip(docs, read_documents_jsonl(spark, p))


def test_csv_round_trip(spark, docs, tmp_path):
    from cuda_gis_smoothing_spark.sources.text_formats import (
        read_documents_csv,
        write_documents_csv,
    )

    p = str(tmp_path / "docs_csv")
    write_documents_csv(docs, p)
    _assert_round_trip(docs, read_documents_csv(spark, p))


def test_csv_sentinel_literal_reads_as_null_documented_limit(
    spark, tmp_path
):
    """A text field whose content is LITERALLY the \\N sentinel reads
    back as NULL — the reader matches nullValue after unquoting, so no
    quoting protects it (probed, incl. quoteAll). Pinned here as the
    documented CSV limitation; JSONL is the lossless format (its
    round-trip test covers this same value)."""
    from cuda_gis_smoothing_spark.sources.text_formats import (
        CSV_NULL,
        read_documents_csv,
        read_documents_jsonl,
        write_documents_csv,
        write_documents_jsonl,
    )

    df = spark.createDataFrame(
        [(1, CSV_NULL, "en", "s", 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p = str(tmp_path / "sentinel_csv")
    write_documents_csv(df, p)
    assert read_documents_csv(spark, p).collect()[0].text is None
    # JSONL round-trips the same value losslessly
    pj = str(tmp_path / "sentinel_jsonl")
    write_documents_jsonl(df, pj)
    assert read_documents_jsonl(spark, pj).collect()[0].text == CSV_NULL


def test_jsonl_failfast_on_corrupt_row(spark, tmp_path):
    from cuda_gis_smoothing_spark.sources.text_formats import (
        read_documents_jsonl,
    )

    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok"}\nnot json at all\n'
    )
    with pytest.raises(Exception, match="Malformed|FAILFAST|JSON"):
        read_documents_jsonl(spark, str(p)).collect()


def test_orc_round_trip(spark, docs, tmp_path):
    from cuda_gis_smoothing_spark.sources.text_formats import (
        read_documents_orc,
        write_documents_orc,
    )

    p = str(tmp_path / "docs_orc")
    write_documents_orc(docs, p)
    _assert_round_trip(docs, read_documents_orc(spark, p))
