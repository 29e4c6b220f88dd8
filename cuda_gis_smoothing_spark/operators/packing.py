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


def pack_from_counts(
    d: DataFrame, seq_len: int = PACK_SEQ_LEN, id_col: str = "doc_id"
) -> DataFrame:
    """Placement from a ``(id, n_tokens)`` table — the composable core
    (e.g. packing a CURATED corpus, whose gate output already carries
    n_tokens, without re-reading text): ``(id, n_tokens, start_seq,
    seq_offset)``, all integer arithmetic."""
    L = int(seq_len)
    # global_prefix_sums consumes its input through THREE differently-
    # pruned subplans (min/max agg, windowed pass, per-bucket totals) —
    # an expensive derived input (a curated corpus, a tokenize) would
    # re-execute per consumer (the CLAUDE.md multi-consumer class;
    # plan-verified: curate_packed ran the LSH drop stage ~3x before
    # this). The counts table is 2 ints/doc — materialize it once.
    d = d.select(F.col(id_col), F.col("n_tokens")).localCheckpoint()
    p = global_prefix_sums(d, [id_col], "n_tokens", out_col="_p")
    return p.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.expr(f"_p div {L}").cast("long").alias("start_seq"),
        (F.col("_p") % L).cast("long").alias("seq_offset"),
    )


def _counts(docs: DataFrame, id_col: str) -> DataFrame:
    """(id, n_tokens) for docs WITH text — NULL-text docs are excluded
    (nothing to pack; the DuckDB twins filter ``text IS NOT NULL``)."""
    n_tokens = F.size(F.split(F.lower(F.col("text")), " ")).cast("long")
    return docs.where(F.col("text").isNotNull()).select(
        F.col(id_col), n_tokens.alias("n_tokens")
    )


def pack_sequences(
    docs: DataFrame, seq_len: int = PACK_SEQ_LEN, id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc placement in the packed token stream:
    ``(doc_id, n_tokens, start_seq, seq_offset)`` where ``start_seq``
    is the 0-based sequence index the doc STARTS in and ``seq_offset``
    its 0-based token offset inside that sequence. A doc with
    ``seq_offset + n_tokens > seq_len`` straddles into the following
    sequence(s) — standard concat-and-chunk semantics
    (:func:`packing_manifest` expands the straddles for a loader)."""
    return pack_from_counts(_counts(docs, id_col), seq_len, id_col)


def packing_manifest(
    docs: DataFrame, seq_len: int = PACK_SEQ_LEN, id_col: str = "doc_id"
) -> DataFrame:
    """The loader-facing fragment manifest: one row per (sequence, doc
    fragment) — ``(seq_id, doc_id, doc_token_start, seq_token_start,
    n_frag)``, 0-based — i.e. "sequence ``seq_id`` contains tokens
    ``doc_token_start .. +n_frag`` of ``doc_id``, starting at its
    position ``seq_token_start``". A boundary-straddling doc emits one
    row per sequence it touches (``F.sequence`` explode over its
    ceil-bounded span — output is O(docs + straddles), each doc's
    fan-out is ceil(n/L)+1). Invariant (pytest-gated): every FULL
    sequence's fragments sum to exactly ``seq_len`` tokens with no
    gaps. Pure integer arithmetic end to end."""
    L = int(seq_len)
    # same multi-consumer materialization as pack_from_counts
    counts = _counts(docs, id_col).localCheckpoint()
    p = global_prefix_sums(counts, [id_col], "n_tokens", out_col="_p")
    first = F.expr(f"_p div {L}")
    last = F.expr(f"(_p + n_tokens - 1) div {L}")
    frags = p.select(
        id_col,
        "n_tokens",
        "_p",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    start_tok = F.greatest(F.col("seq_id") * L, F.col("_p"))
    end_tok = F.least((F.col("seq_id") + 1) * L, F.col("_p") + F.col("n_tokens"))
    return frags.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        id_col,
        (start_tok - F.col("_p")).cast("long").alias("doc_token_start"),
        (start_tok - F.col("seq_id") * L).cast("long").alias("seq_token_start"),
        (end_tok - start_tok).cast("long").alias("n_frag"),
    )
