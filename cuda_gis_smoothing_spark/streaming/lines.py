"""Maintained C4-style line-dedup state — the incremental form of
``operators/dedup.line_dedup`` (the MaintainedBigrams/dfreq-log
pattern applied to chunk-line statistics).

The batch operator re-explodes and re-aggregates the whole corpus per
run; at 100 TB the chunk doc-frequency table and the first-occurrence
selection a streaming curation pipeline consumes are MAINTAINED:

* ``doc_chunks`` — ONE doc-keyed row per document:
  ``(doc_id, _has_text, _ch array<struct<pos,d,chunk>>)`` — the doc's
  chunk occurrences (same tokenizer/chunking as the batch operator;
  NULL-text docs get an EMPTY slice with ``_has_text`` false — the
  natural tombstone), latest-wins on re-ingest.
* ``chunk_stats`` — digest-keyed ABSOLUTE rows
  ``(d, chunk, df, occ, first_key)``, latest-wins. A batch diffs its
  doc ids' PRIOR slices (read with ``before_batch_id`` — the
  crash-window rule) against the new slices into net per-digest df
  (distinct-doc) AND occ (occurrence-count) deltas — both exactly
  reversible — and folds the batch's min occurrence keys into
  ``first_key`` via ``least`` — MIN over ever-observed occurrences is
  MONOTONE, so no decrement is ever needed. The chunk TEXT rides in
  the stats row (functionally determined by the digest) so the
  boilerplate audit report serves without touching doc slices or the
  corpus. Delta size O(batch chunk vocabulary), never O(corpus)
  (tested).
* ``stats`` — one row ``(n_docs, n_occurrences)``: decrement+increment
  maintained corpus totals, written LAST as the replay guard.

Selection contract (the IncrementalPacker immutable-placement
precedent): ``first_key`` is FIRST-EVER-OBSERVED and append-only — a
doc update never re-opens a chunk's canonical position. Consequence:
if the first-owner doc is updated to no longer contain the chunk, NO
current occurrence matches ``first_key`` and the chunk drops
everywhere (documented + tested). For append-only corpora with
ascending doc ids the served output equals the batch rebuild exactly
(tested; the ``dedup_lines_maintained`` gate routes the corpus through
a single-batch instance against the identical SQL twin — the
bm25_search precedent, so the driver gates the incremental path).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.operators.dedup import (
    BOILERPLATE_TOPK,
    LINE_MIN_DUP_DOCS,
    LINE_WIDTH,
    _LINE_POS_SHIFT,
    chunk_lines,
)
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog

_CH_EMPTY = "CAST(array() AS array<struct<pos:int,d:string,chunk:string>>)"


def _doc_chunk_slices(
    docs: DataFrame, width: int, id_col: str = "doc_id"
) -> DataFrame:
    """One row per batch doc: its chunk-occurrence slice (pos, md5
    digest, chunk text — the text rides in state so serving never
    touches the corpus, the strict-curator materialized-postings
    precedent) and the NULL-text marker."""
    occ = chunk_lines(docs, width, id_col=id_col).select(
        id_col, "pos", F.md5("chunk").alias("d"), "chunk"
    )
    slices = occ.groupBy(id_col).agg(
        F.collect_list(F.struct("pos", "d", "chunk")).alias("_ch")
    )
    return (
        docs.select(id_col, F.col("text").isNotNull().alias("_has_text"))
        .join(slices, id_col, "left")
        .select(
            id_col,
            "_has_text",
            F.coalesce("_ch", F.expr(_CH_EMPTY)).alias("_ch"),
        )
    )


class MaintainedLines:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        width: int = LINE_WIDTH,
        min_dup_docs: int = LINE_MIN_DUP_DOCS,
        id_col: str = "doc_id",
        compact_every: int = 4,
    ):
        self.spark = spark
        self.width = int(width)
        self.min_dup_docs = int(min_dup_docs)
        self.id_col = id_col
        self.compact_every = compact_every
        self.log = SnapshotLog(
            spark, os.path.join(state_root, "doc_chunks"), key=id_col
        )
        self.chunk_log = SnapshotLog(
            spark, os.path.join(state_root, "chunk_stats"), key="d"
        )
        self.stats_log = SnapshotLog(
            spark, os.path.join(state_root, "stats"), key="k"
        )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        """Fold a batch of (re)ingested docs into the state: one
        doc-keyed slice delta of O(batch) rows, one digest-keyed stats
        delta of O(batch chunk vocabulary) rows, one 1-row totals
        delta (the replay guard, written LAST)."""
        if self.stats_log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        self.log.write_delta(
            _doc_chunk_slices(docs, self.width, self.id_col), batch_id
        )
        delta = self.log.read_delta(batch_id)
        prior = self.log.read(before_batch_id=batch_id)
        old_rows = (
            None
            if prior is None
            else prior.join(
                delta.select(self.id_col), self.id_col, "left_semi"
            ).localCheckpoint()  # feeds the df decrement AND the totals
        )

        def digest_contrib(rows: DataFrame, sign: int) -> DataFrame:
            # per (doc, digest): ±1 df and ±count occurrence contribution
            return (
                rows.select(self.id_col, F.explode("_ch").alias("_p"))
                .groupBy(F.col("_p.d").alias("d"), F.col(self.id_col))
                .agg(F.count(F.lit(1)).alias("_c"))
                .select(
                    "d",
                    F.lit(sign).alias("_s"),
                    (F.col("_c") * sign).alias("_o"),
                )
            )

        net = digest_contrib(delta, 1)
        if old_rows is not None:
            net = net.unionByName(digest_contrib(old_rows, -1))
        net = net.groupBy("d").agg(
            F.sum("_s").alias("_net"), F.sum("_o").alias("_net_occ")
        )
        bmin = (
            delta.select(self.id_col, F.explode("_ch").alias("_p"))
            .select(
                F.col("_p.d").alias("d"),
                F.col("_p.chunk").alias("_chunk"),
                (F.col(self.id_col) * _LINE_POS_SHIFT + F.col("_p.pos")).alias(
                    "_bk"
                ),
            )
            .groupBy("d")
            # chunk text is functionally determined by the digest — min
            # is just a deterministic pick
            .agg(F.min("_bk").alias("_bk"), F.min("_chunk").alias("_chunk"))
        )
        # touched = df/occ changed OR a (possibly smaller) first key seen
        touched = (
            net.join(bmin, "d", "full_outer")
            .select(
                "d",
                F.coalesce("_net", F.lit(0)).alias("_net"),
                F.coalesce("_net_occ", F.lit(0)).alias("_net_occ"),
                "_bk",
                "_chunk",
            )
            .where(
                (F.col("_net") != 0)
                | (F.col("_net_occ") != 0)
                | F.col("_bk").isNotNull()
            )
        )
        cur = self.chunk_log.read(before_batch_id=batch_id)
        if cur is None:
            new = touched.select(
                "d",
                F.col("_chunk").alias("chunk"),
                F.col("_net").cast("long").alias("df"),
                F.col("_net_occ").cast("long").alias("occ"),
                F.col("_bk").cast("long").alias("first_key"),
            )
        else:
            new = touched.join(cur, "d", "left").select(
                "d",
                # a decrement-only touch has no batch text: keep the row's
                F.coalesce(F.col("_chunk"), F.col("chunk")).alias("chunk"),
                (F.coalesce(F.col("df"), F.lit(0)) + F.col("_net"))
                .cast("long")
                .alias("df"),
                (F.coalesce(F.col("occ"), F.lit(0)) + F.col("_net_occ"))
                .cast("long")
                .alias("occ"),
                F.least(
                    F.coalesce("first_key", F.col("_bk")),
                    F.coalesce("_bk", F.col("first_key")),
                )
                .cast("long")
                .alias("first_key"),
            )

        def totals(rows: DataFrame) -> tuple[int, int]:
            r = rows.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum(F.size("_ch")), F.lit(0)).alias("o"),
            ).collect()[0]
            return int(r["n"]), int(r["o"])

        add_n, add_o = totals(delta)
        rm_n, rm_o = (0, 0) if old_rows is None else totals(old_rows)
        old_stats = self.stats_log.read(before_batch_id=batch_id)
        if old_stats is None:
            base_n, base_o = 0, 0
        else:
            row = old_stats.collect()[0]
            base_n, base_o = int(row["n_docs"]), int(row["n_occurrences"])
        # write order is the crash contract: doc_chunks (above), the
        # chunk stats, then the totals row LAST as the replay guard
        self.chunk_log.write_delta(new, batch_id)
        self.stats_log.write_delta(
            self.spark.createDataFrame(
                [("total", base_n - rm_n + add_n, base_o - rm_o + add_o)],
                "k string, n_docs long, n_occurrences long",
            ),
            batch_id,
        )
        if self.log.delta_count() >= self.compact_every:
            for log in (self.log, self.chunk_log, self.stats_log):
                log.compact(batch_id)

    def chunk_stats(self) -> DataFrame | None:
        """The maintained (d, df, first_key) table — df = 0 rows (a
        chunk whose last doc left the corpus) filtered out; their
        first_key claims remain latent in the log (append-only
        selection) and re-surface with the historical key if the chunk
        returns."""
        t = self.chunk_log.read()
        if t is None:
            return None
        return t.where(F.col("df") > 0)

    def stats_row(self) -> tuple[int, int] | None:
        t = self.stats_log.read()
        if t is None:
            return None
        r = t.collect()[0]
        return int(r["n_docs"]), int(r["n_occurrences"])

    def line_dedup(self) -> DataFrame:
        """The served per-doc dedup table over the CURRENT state —
        same output contract as the batch operator ((doc_id, n_chunks,
        n_kept, n_dropped, new_text); NULL-text docs preserved with
        NULL new_text): occurrences explode from stored slices (the
        corpus is never re-read), keep = df below threshold OR the
        occurrence IS the first-ever-observed one. Reads state through
        EAGER localCheckpoints — the MaintainedPostings.search
        contract: callers may delete the state directory once the plan
        is built."""
        state = self.log.read()
        stats = self.chunk_stats()
        if state is None or stats is None:
            raise ValueError("MaintainedLines: empty state (no batches applied)")
        state = state.localCheckpoint(eager=True)
        stats = stats.localCheckpoint(eager=True)
        occ = state.select(
            self.id_col, F.explode("_ch").alias("_p")
        ).select(
            self.id_col,
            F.col("_p.pos").alias("pos"),
            F.col("_p.d").alias("d"),
            F.col("_p.chunk").alias("chunk"),
            (F.col(self.id_col) * _LINE_POS_SHIFT + F.col("_p.pos")).alias("_k"),
        )
        kept = occ.join(stats.select("d", "df", "first_key"), "d").withColumn(
            "_keep",
            (F.col("df") < F.lit(self.min_dup_docs))
            | (F.col("_k") == F.col("first_key")),
        )
        per_doc = kept.groupBy(self.id_col).agg(
            F.count(F.lit(1)).cast("long").alias("_n_chunks"),
            F.sum(F.col("_keep").cast("long")).cast("long").alias("_n_kept"),
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(if(_keep, struct(pos, chunk), null))), "
                "x -> x.chunk), ' ')"
            ).alias("_new_text"),
        )
        return (
            state.select(self.id_col, "_has_text")
            .join(per_doc, self.id_col, "left")
            .select(
                self.id_col,
                F.coalesce("_n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
                F.coalesce("_n_kept", F.lit(0)).cast("long").alias("n_kept"),
                (
                    F.coalesce("_n_chunks", F.lit(0))
                    - F.coalesce("_n_kept", F.lit(0))
                )
                .cast("long")
                .alias("n_dropped"),
                F.when(F.col("_has_text"), F.coalesce("_new_text", F.lit("")))
                .alias("new_text"),
            )
        )

    def boilerplate_chunks(
        self, min_df: int | None = None, k: int = BOILERPLATE_TOPK
    ) -> DataFrame:
        """Top-``k`` boilerplate chunk-lines served PURELY from the
        maintained stats log — same output contract and total order as
        ``operators/dedup.boilerplate_chunks`` ((chunk, n_docs,
        n_occurrences); chunk is the tiebreak AND the group key so the
        cut is tie-proof), but the corpus and the doc slices are never
        read: one TakeOrderedAndProject over O(chunk vocabulary) state
        rows. Reads state through an EAGER localCheckpoint (the
        MaintainedPostings.search contract: callers may delete the
        state directory once the plan is built)."""
        min_df = self.min_dup_docs if min_df is None else int(min_df)
        stats = self.chunk_stats()
        if stats is None:
            raise ValueError("MaintainedLines: empty state (no batches applied)")
        return (
            stats.localCheckpoint(eager=True)
            .where(F.col("df") >= F.lit(min_df))
            .select(
                "chunk",
                F.col("df").cast("long").alias("n_docs"),
                F.col("occ").cast("long").alias("n_occurrences"),
            )
            .orderBy(
                F.col("n_docs").desc(), F.col("n_occurrences").desc(), "chunk"
            )
            .limit(int(k))
        )

    def start(self, source_dir: str, checkpoint_dir: str, available_now: bool = True):
        from cuda_gis_smoothing_spark.streaming.dedup import DOCS_SCHEMA

        stream = (
            self.spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(source_dir)
        )
        writer = stream.writeStream.foreachBatch(
            lambda df, bid: self.process_batch(df, bid)
        ).option("checkpointLocation", checkpoint_dir)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
