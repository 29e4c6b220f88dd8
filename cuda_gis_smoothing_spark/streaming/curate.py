"""Incremental (streaming) corpus curation — the foreachBatch twin of
operators/curate.py::curate_corpus.

Chaining the needed stateful operators (digest dedup state + band
bucket state) inside ONE streaming query is illegal in Spark, so the
incremental curator follows the repo's IncrementalSmoother pattern:
each micro-batch is processed with ordinary BATCH operators against a
persisted kept-docs state log (streaming/incremental.py::SnapshotLog —
base+delta parquet, idempotent per batch id, compaction+GC).

Semantics (streaming-greedy, batch-monotone — documented, tested
against an independent Python oracle):
  per batch B (after language+quality filters):
    1. exact dedup: drop digests already kept in prior batches; keep
       the smallest doc_id per digest within the batch.
    2. near-dup drop: drop b in B if a VERIFIED jaccard >= t partner
       exists among prior kept docs (cross-batch candidates from the
       shared MinHash band keys) or among smaller same-batch survivors
       (the same monotone rule curate_corpus uses corpus-wide).
    3. survivors enter the kept state; the deterministic sample of the
       survivors is appended to the curated output log.
  A single batch containing the whole corpus therefore reproduces
  curate_corpus EXACTLY (tested).

Scale shape: per batch, every step is a hash shuffle keyed on digest,
band bucket, or doc id; state grows with KEPT docs only. Everything
the per-batch plan needs from the kept side is PERSISTED in an
auxiliary SnapshotLog — one row per kept doc with its md5 digest,
LSH band-value array, and distinct-token array — so a batch reads
STORED state for the digest anti-join, the candidate keys, AND the
verify arrays: kept TEXT is never re-scanned, re-hashed, or
re-tokenized per batch (O(kept) recomputation was the cost the log
family was introduced to remove; byte volume is ~the same as the
text, the win is the per-batch CPU). The invariant making the aux log
complete: filtered_base keeps only docs with at least one stopword
hit, so every kept doc has tokens and therefore an aux row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.operators.curate import (
    CURATE_LANG,
    CURATE_MIN_QUALITY,
    CURATE_NEARDUP_J,
    CURATE_SAMPLE_F,
    exact_canonical,
    filtered_base,
)
from cuda_gis_smoothing_spark.operators.dedup import (
    TOKEN_ARRAY_SQL,
    band_values_projection,
    explode_band_values,
    lsh_blocked_neardup_drops,
    verified_jaccard_pairs_prepared,
)
from cuda_gis_smoothing_spark.operators.sampling import deterministic_sample
from cuda_gis_smoothing_spark.streaming.dedup import DOCS_SCHEMA
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog


class IncrementalCurator:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        lang: str = CURATE_LANG,
        min_quality: float = CURATE_MIN_QUALITY,
        neardup_jaccard: float = CURATE_NEARDUP_J,
        sample_fraction: float = CURATE_SAMPLE_F,
        n_hashes: int = 6,
        bands: int = 3,
        compact_every: int = 4,
    ):
        self.spark = spark
        self.lang = lang
        self.min_quality = min_quality
        self.neardup_jaccard = neardup_jaccard
        self.sample_fraction = sample_fraction
        self.n_hashes = n_hashes
        self.bands = bands
        self.compact_every = compact_every
        self.kept_log = SnapshotLog(
            spark, os.path.join(state_root, "kept_docs"), key="doc_id"
        )
        self.curated_log = SnapshotLog(
            spark, os.path.join(state_root, "curated"), key="doc_id"
        )
        # kept docs' derived state, one row per doc: md5 digest (_k),
        # LSH band-value array (_bvs), distinct-token array (_tok) —
        # everything cross-batch processing needs without touching text
        self.aux_log = SnapshotLog(
            spark, os.path.join(state_root, "kept_aux"), key="doc_id"
        )

    def current_kept(self) -> DataFrame | None:
        return self.kept_log.read()

    def current_curated(self) -> DataFrame | None:
        return self.curated_log.read()

    def _aux(self, docs: DataFrame) -> DataFrame:
        """(doc_id, _bvs, _k, _tok) — the stored per-doc derivations,
        token-hashed/tokenized/digested in ONE projection."""
        return band_values_projection(
            docs,
            self.n_hashes,
            self.bands,
            extra={
                "_k": F.md5("text"),
                "_tok": F.expr(TOKEN_ARRAY_SQL.format(text_col="text")),
            },
        )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        if self.kept_log.has(batch_id):
            return  # crash replay of an already-applied batch: no-op
        b = exact_canonical(
            filtered_base(docs, self.lang, self.min_quality)
        ).localCheckpoint()
        # the batch's digests/band values/token arrays are derived ONCE
        # and reused: digest anti-join, candidate keys, verify side a,
        # and the aux-log delta
        aux_b = self._aux(b).localCheckpoint()
        prior = self.kept_log.read()
        backfill_prior = False
        if prior is not None:
            prior = prior.localCheckpoint()
            # backfill decision must be REPLAY-STABLE: "no aux snapshot
            # OLDER than this batch" — a crash after the backfill delta
            # write but before the kept write leaves only delta-b{N},
            # and `read() is None` would then skip the backfill on
            # replay and overwrite it with survivors-only rows, losing
            # the pre-upgrade docs' derived state forever. Any state
            # dir that legitimately covered earlier batches has an aux
            # snapshot with an older id (deltas per batch; compaction
            # bases carry the compacting batch's id).
            oldest = self.aux_log.oldest_batch_id()
            backfill_prior = oldest is None or oldest >= batch_id
            if not backfill_prior:
                # before_batch_id is load-bearing: a crash between the
                # aux write and the kept write leaves delta-b{batch_id}
                # holding THIS batch's survivors' digests — an
                # unfiltered read would route them into the `seen`
                # anti-join below and the replay would drop every
                # batch survivor as an exact dup (permanent data loss)
                prior_aux = self.aux_log.read(
                    before_batch_id=batch_id
                ).localCheckpoint()
            else:
                # one-time upgrade cost for a state dir written before
                # the aux log existed (or a crashed backfill replay)
                prior_aux = self._aux(prior).localCheckpoint()
            # cross-batch exact dedup on the STORED digests
            seen = prior_aux.select("_k").distinct()
            b = (
                b.withColumn("_k", F.md5("text"))
                .join(seen, "_k", "left_anti")
                .drop("_k")
            )
            # cross-batch near-dup: batch band keys vs STORED kept band
            # keys. Digest-dropped batch docs may leak extra candidate
            # rows (aux_b predates the anti-join), but their doc_a
            # cannot resolve an array in the post-dedup verify side, so
            # the drop set is identical. (A crashed delta for THIS
            # batch is excluded at the read above, so neither the
            # digest anti-join nor this candidate join ever sees the
            # batch's own in-flight rows as prior state.)
            nb = explode_band_values(aux_b.select("doc_id", "_bvs"))
            np_ = explode_band_values(prior_aux.select("doc_id", "_bvs"))
            cand = (
                nb.select(F.col("doc_id").alias("doc_a"), "band", "bh")
                .join(
                    np_.select(F.col("doc_id").alias("doc_b"), "band", "bh"),
                    ["band", "bh"],
                )
                .select("doc_a", "doc_b")
                .distinct()
            )
            # verify over STORED token arrays on both sides — the batch
            # side restricted to post-dedup b so phantom doc_a vanish
            ta = (
                aux_b.join(b.select("doc_id"), "doc_id", "left_semi")
                .select(F.col("doc_id").alias("doc_a"), F.col("_tok").alias("_ta"))
            )
            tb = prior_aux.select(
                F.col("doc_id").alias("doc_b"), F.col("_tok").alias("_tb")
            )
            dropped = (
                verified_jaccard_pairs_prepared(cand, ta, tb, self.neardup_jaccard)
                .select(F.col("doc_a").alias("doc_id"))
                .distinct()
            )
            b = b.join(dropped, "doc_id", "left_anti").localCheckpoint()
        # intra-batch near-dup (monotone: drop vs any smaller batch doc)
        # — the same fused blocked bucket kernel curate_corpus uses, so
        # a self-similar BATCH is per-task bounded too
        dropped_intra = lsh_blocked_neardup_drops(
            b, self.neardup_jaccard, n_hashes=self.n_hashes, bands=self.bands
        )
        survivors = b.join(dropped_intra, "doc_id", "left_anti").localCheckpoint()
        # write order is the crash-safety contract: the replay guard is
        # has(batch_id) on the KEPT log, so the kept delta must land
        # LAST — a crash after the curated/aux writes but before the
        # kept write replays the whole batch (earlier delta dirs are
        # overwritten idempotently); the reverse order would skip the
        # replay and silently lose the batch's curated rows
        self.curated_log.write_delta(
            deterministic_sample(survivors, self.sample_fraction).select(
                "doc_id", "n_tokens", "quality_score"
            ),
            batch_id,
        )
        aux_delta = aux_b.join(survivors.select("doc_id"), "doc_id", "left_semi")
        if backfill_prior and prior is not None:
            aux_delta = self._aux(prior).unionByName(aux_delta)
        self.aux_log.write_delta(aux_delta, batch_id)
        self.kept_log.write_delta(survivors, batch_id)
        if self.kept_log.delta_count() >= self.compact_every:
            self.kept_log.compact(batch_id)
            self.curated_log.compact(batch_id)
            self.aux_log.compact(batch_id)

    def start(self, source_dir: str, checkpoint_dir: str, available_now: bool = True):
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
