"""Maintained incremental BM25 postings (VERDICT r3 #4).

``operators/retrieval.bm25_search`` rebuilds its inverted index with a
per-session ``localCheckpoint`` — at 100 TB the postings are a
MAINTAINED table, not a per-query rebuild. This module is that
maintained form, on the repo's SnapshotLog substrate
(streaming/incremental.py: base+delta parquet, latest-wins per key,
idempotent per batch id, compaction+GC — the same machinery the
incremental curator and smoother state use).

State shape: ONE doc-keyed log row per document —
``(doc_id, _post array<struct<term,_tf>>, _dl)`` — i.e. the document's
entire posting slice plus its length, derived by the SAME
``doc_postings`` tokenization the batch operator uses:

* a batch writes O(batch-docs) rows, never O(corpus) (tested);
* a re-ingested doc_id REPLACES its old postings via latest-wins —
  document update is one delta row, no read-modify-write of term
  state (a term-keyed layout would need df decrements for the old
  text; doc-keyed gets updates for free). A NULL-text re-ingest gets
  an explicit TOMBSTONE row (empty ``_post``, ``_dl = 0``) — zero
  emitted rows would leave the stale postings alive under latest-wins
  (ADVICE r4); ``search`` filters tombstones so the doc vanishes from
  postings AND the (N, avgdl) statistics, matching ``bm25_search``
  over the equivalently updated corpus;
* crash replay is the standard SnapshotLog contract: ``has(batch_id)``
  short-circuits, delta writes are idempotent per batch id. One log,
  one write per batch — no multi-log write-order window to defend
  (unlike the curator's three logs).

Query path: explode the stored rows back to ``(doc_id, term, _tf)``
and score through the SHARED kernel
``operators/retrieval.bm25_score_postings`` — results are IDENTICAL to
``bm25_search`` over the corpus the log currently represents (tested
multi-batch and through a doc update; the bm25_search driver gate
itself routes through a single-batch MaintainedPostings, so the
CORRECTNESS row gates this path every round). The stored per-doc
``_dl`` feeds the stats directly — the maintained path derives doc
lengths and (N, avgdl) WITHOUT re-aggregating postings.

Scale notes: the per-search dfreq derivation is one aggregation over
the stored postings (no text re-tokenization — that is the cost the
log removes); a service with a hot query stream would maintain dfreq
as a second log, which needs old-row lookups on update and is left to
callers. The stop-term ``max_df`` lever passes through to the kernel.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_score_postings,
    doc_postings,
)
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog


class MaintainedPostings:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        id_col: str = "doc_id",
        compact_every: int = 4,
    ):
        self.spark = spark
        self.id_col = id_col
        self.compact_every = compact_every
        self.log = SnapshotLog(
            spark, os.path.join(state_root, "doc_postings"), key=id_col
        )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        """Fold a batch of (re)ingested docs into the index: one
        doc-keyed delta of O(batch) rows."""
        if self.log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        per_doc = (
            doc_postings(docs, self.id_col)
            .groupBy(self.id_col)
            .agg(
                F.collect_list(F.struct("term", "_tf")).alias("_post"),
                F.sum("_tf").alias("_dl"),
            )
        )
        # NULL-text docs explode to ZERO postings rows (doc_postings
        # contract) — without an explicit row, latest-wins would keep a
        # previously-ingested version's postings alive. Emit a tombstone
        # (empty _post, _dl=0) per such id so the update removes the doc.
        tombstones = (
            docs.select(self.id_col)
            .distinct()
            .join(per_doc.select(self.id_col), self.id_col, "left_anti")
            .select(
                self.id_col,
                F.expr(
                    "CAST(array() AS array<struct<term:string,_tf:double>>)"
                ).alias("_post"),
                F.lit(0.0).alias("_dl"),
            )
        )
        self.log.write_delta(per_doc.unionByName(tombstones), batch_id)
        if self.log.delta_count() >= self.compact_every:
            self.log.compact(batch_id)

    def doc_table(self) -> DataFrame | None:
        """Latest (doc_id, _post, _dl) per doc — N and avgdl derive
        from this without touching the exploded postings."""
        return self.log.read()

    def postings(self) -> DataFrame | None:
        """The maintained inverted index as (id, term, _tf) rows."""
        t = self.doc_table()
        if t is None:
            return None
        return t.select(self.id_col, F.explode("_post").alias("_p")).select(
            self.id_col, "_p.term", F.col("_p._tf").alias("_tf")
        )

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        k1: float = BM25_K1,
        b: float = BM25_B,
        max_df: int | None = None,
    ) -> DataFrame:
        """Top-k BM25 per query over the CURRENT index state — the
        shared scoring kernel, fed the stored doc lengths."""
        t = self.doc_table()
        if t is None:
            raise ValueError("MaintainedPostings: empty index (no batches applied)")
        # tombstoned docs (NULL-text update) leave postings AND the
        # (N, avgdl) statistics — size() > 0 also handles a NULL array
        t = t.where(F.size("_post") > 0)
        # eager=True is a CONTRACT, not a default: callers (the
        # bm25_search gate) may delete the state directory as soon as
        # this plan is built, relying on the checkpoint having already
        # materialized the one state read that feeds post + dl + stats.
        t = t.localCheckpoint(eager=True)
        post = t.select(self.id_col, F.explode("_post").alias("_p")).select(
            self.id_col, "_p.term", F.col("_p._tf").alias("_tf")
        )
        dl = t.select(self.id_col, "_dl")
        return bm25_score_postings(
            post, queries, k=k, id_col=self.id_col, k1=k1, b=b,
            max_df=max_df, dl=dl,
        )

    def start(self, source_dir: str, checkpoint_dir: str, available_now: bool = True):
        from cuda_gis_smoothing_spark.streaming.dedup import DOCS_SCHEMA

        stream = (
            self.spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(source_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
