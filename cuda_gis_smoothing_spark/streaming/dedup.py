"""Structured Streaming dedup: the streaming twins of the batch dedup
family (operators/dedup.py).

Batch dedup canonicalizes by MIN(doc_id) over the whole corpus; a
stream cannot know the global minimum, so streaming dedup is
FIRST-SEEN: the first document carrying a digest becomes canonical,
every later arrival is flagged (or dropped). Two implementations:

* :func:`drop_exact_dups_stream` — Spark's built-in streaming
  ``dropDuplicates`` on the digest: state = one row per distinct
  digest in the state store, exactly the built-in operator a user
  should reach for first.
* :func:`flag_exact_dups_stream` — ``applyInPandasWithState`` keeping
  (canonical_id, dup_count) per digest: emits EVERY doc with its
  canonical attribution instead of silently dropping — the shape a
  lineage-preserving pipeline needs (who was deduped against whom),
  not expressible with ``dropDuplicates``.

State sizing at 100 TB: one row per DISTINCT digest — bounded by
corpus cardinality, not stream length; shard count = shuffle
partitions on the digest key, uniformly distributed (md5). Add a
watermark + digest TTL when the dedup horizon is bounded in time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def read_docs_stream(spark, source_dir: str, max_files: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(source_dir)
    )


def drop_exact_dups_stream(docs: DataFrame) -> DataFrame:
    """First-seen exact dedup via the built-in streaming state:
    emits each distinct text's first arrival, drops the rest."""
    return docs.withColumn("_k", F.md5("text")).dropDuplicates(["_k"]).drop("_k")


def flag_exact_dups_stream(docs: DataFrame) -> DataFrame:
    """First-seen exact dedup that KEEPS the duplicates, attributed:
    emits (doc_id, canonical_id, is_duplicate, dup_seq) for every doc,
    where canonical_id is the first-seen doc of the digest and dup_seq
    counts arrivals so far (1 = the canonical itself). Per-digest state
    is a (canonical_id, count) pair in GroupState."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            canonical, seen = state.get
        else:
            canonical, seen = None, 0
        out = []
        for pdf in pdfs:
            # arrival order within a batch is made deterministic by
            # doc_id so replays attribute identically
            for doc_id in pdf["doc_id"].sort_values():
                seen += 1
                if canonical is None:
                    canonical = int(doc_id)
                out.append((int(doc_id), canonical, int(doc_id != canonical), seen))
        state.update((canonical, seen))
        yield pd.DataFrame(
            out, columns=["doc_id", "canonical_id", "is_duplicate", "dup_seq"]
        )

    return (
        docs.select(F.md5("text").alias("_k"), "doc_id")
        .groupBy("_k")
        .applyInPandasWithState(
            fn,
            outputStructType=(
                "doc_id long, canonical_id long, is_duplicate int, dup_seq long"
            ),
            stateStructType="canonical long, seen long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
