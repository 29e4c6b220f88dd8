"""Sequence packing: lay the tokenized corpus out as fixed-length
training sequences (the concat-and-chunk layout GPT-style training
uses — documents are concatenated in a deterministic order into one
token stream and cut every ``seq_len`` tokens, so a doc may straddle a
sequence boundary).

No reference counterpart; a graft LLM-pipeline addition: this is the
step between a curated corpus and a training dataloader, and the
per-doc placement must be deterministic and engine-portable so shards
can be (re)built independently.

Spark-first shape: the only global quantity is an EXCLUSIVE prefix sum
of token counts in doc_id order — computed partition-parallel via
``plans/partitioning.global_prefix_sums`` (deterministic range
buckets + per-bucket window + an O(num_buckets) offset table), never a
single-partition ``Window.orderBy`` over the corpus. Placement is then
pure integer arithmetic per row (exact in both engines — no float
division anywhere)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cuda_gis_smoothing_spark.plans.partitioning import global_prefix_sums

#: gate-fixed sequence length (shared with the DuckDB twin's literal)
PACK_SEQ_LEN = 256


def pack_sequences(
    docs: DataFrame, seq_len: int = PACK_SEQ_LEN, id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc placement in the packed token stream:
    ``(doc_id, n_tokens, start_seq, seq_offset)`` where ``start_seq``
    is the 0-based sequence index the doc STARTS in and ``seq_offset``
    its 0-based token offset inside that sequence. A doc with
    ``seq_offset + n_tokens > seq_len`` straddles into the following
    sequence(s) — standard concat-and-chunk semantics; a loader reads
    ``ceil((seq_offset + n_tokens) / seq_len)`` consecutive sequences
    for it. NULL-text docs are excluded (nothing to pack; the DuckDB
    twin filters ``text IS NOT NULL`` to match)."""
    n_tokens = F.size(F.split(F.lower(F.col("text")), " ")).cast("long")
    d = docs.where(F.col("text").isNotNull()).select(
        F.col(id_col), n_tokens.alias("n_tokens")
    )
    p = global_prefix_sums(d, [id_col], "n_tokens", out_col="_p")
    return p.select(
        id_col,
        "n_tokens",
        F.expr(f"_p div {int(seq_len)}").cast("long").alias("start_seq"),
        (F.col("_p") % int(seq_len)).cast("long").alias("seq_offset"),
    )
