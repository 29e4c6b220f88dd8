"""JSONL / CSV ingest and export for the document tables — the
text-format source/sink pair beside the parquet tables (an analytics
engine's landing-zone formats; parquet stays the canonical storage).

Schemas are EXPLICIT on read: schema inference is a full extra pass
over the data at 100 TB, and silently widens types between drops
(a doc_id batch of small ints infers int32 and breaks the appended
table). ``mode="FAILFAST"`` surfaces malformed rows instead of
nulling them silently — corrupt landing-zone rows should stop the
load, not leak NULL docs into dedup (use PERMISSIVE + corrupt-record
column only in explicit quarantine flows).

Reference: the reference engine reads its fixed binary grid layout
(grid_io.cu); this module is the Spark-side generalization to the
text formats a landing zone actually receives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """One JSON object per line, gzip — the interchange format corpus
    drops arrive in. NULL fields are DROPPED per line by Spark's JSON
    writer (standard JSONL practice); the explicit read schema
    restores them as NULLs, so the round trip is lossless."""
    docs.write.mode("overwrite").option("compression", "gzip").json(path)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
    )


#: CSV cannot distinguish NULL from '' unless NULL gets a sentinel —
#: Spark writes both as an empty field and reads empty fields back as
#: NULL (measured: an empty-text doc returned as NULL text). The
#: MySQL-style \\N sentinel on BOTH sides keeps NULL and '' distinct;
#: emptyValue pins '' to stay ''. KNOWN LIMIT (pinned by test): a text
#: field whose content is LITERALLY the sentinel reads back as NULL —
#: the reader matches nullValue after unquoting, so even quoteAll
#: cannot protect it (measured). CSV is the interchange format for
#: humans and legacy loaders; JSONL is the lossless one.
CSV_NULL = "\\N"


def write_documents_csv(docs: DataFrame, path: str) -> None:
    """CSV with header, full quoting with escape-by-doubling — document
    text contains commas, quotes, and (in general) newlines, so
    ``multiLine`` must mirror on the read side."""
    (
        docs.write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .option("nullValue", CSV_NULL)
        .option("emptyValue", '""')
        .option("compression", "gzip")
        .csv(path)
    )


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("header", "true")
        .option("escape", '"')
        .option("nullValue", CSV_NULL)
        .option("emptyValue", "")
        .option("multiLine", "true")
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_documents_orc(docs: DataFrame, path: str) -> None:
    """ORC sink (Spark-native columnar, zlib) — the Hive-ecosystem
    interchange format beside parquet. ORC carries real NULLs and
    types, so unlike CSV/JSONL the round trip needs no sentinel or
    schema-restore tricks; it exists for warehouses whose landing
    tables are ORC-managed."""
    docs.write.mode("overwrite").option("compression", "zlib").orc(path)


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """Schema still EXPLICIT (the module contract): ORC files carry a
    schema, but pinning the read schema rejects drift between drops
    instead of silently unioning mismatched types."""
    return spark.read.schema(DOCUMENTS_SCHEMA).orc(path)
