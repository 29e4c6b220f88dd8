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
band bucket, or doc id; state grows with KEPT docs only. The kept
side's band keys are PERSISTED as their own SnapshotLog (one row per
kept doc: its band-value array), written with each batch's survivors —
cross-batch candidate generation reads stored keys instead of
re-deriving minhash signatures from the full kept corpus text every
batch (O(kept) token hashing, which dominates once kept >> batch).
The kept-docs text log is still read per batch, but only for the
digest anti-join and the verify join — no signature recomputation.
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
    verified_pairs,
)
from cuda_gis_smoothing_spark.operators.dedup import (
    band_values_projection,
    explode_band_values,
    lsh_blocked_neardup_drops,
)
from cuda_gis_smoothing_spark.operators.sampling import deterministic_sample
from cuda_gis_smoothing_spark.streaming.dedup import DOCS_SCHEMA, _banded_keys
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
        # kept docs' LSH band-value arrays, one row per doc — read per
        # batch for cross-batch candidates instead of re-deriving
        # signatures from the kept corpus text (O(kept) token hashing)
        self.band_log = SnapshotLog(
            spark, os.path.join(state_root, "band_keys"), key="doc_id"
        )

    def current_kept(self) -> DataFrame | None:
        return self.kept_log.read()

    def current_curated(self) -> DataFrame | None:
        return self.curated_log.read()

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        if self.kept_log.has(batch_id):
            return  # crash replay of an already-applied batch: no-op
        b = exact_canonical(
            filtered_base(docs, self.lang, self.min_quality)
        ).localCheckpoint()
        # the batch's band values are token-hashed ONCE here and reused
        # three ways: cross-batch candidate keys (exploded), the
        # band-log delta (filtered to survivors), and — indirectly —
        # nothing else recomputes signatures except the intra-batch
        # blocked kernel, which carries token arrays anyway
        bvs_b = band_values_projection(
            b, self.n_hashes, self.bands
        ).localCheckpoint()
        prior = self.kept_log.read()
        backfill_prior = False
        if prior is not None:
            prior = prior.localCheckpoint()
            # cross-batch exact dedup on the digest
            seen = prior.select(F.md5("text").alias("_k")).distinct()
            b = (
                b.withColumn("_k", F.md5("text"))
                .join(seen, "_k", "left_anti")
                .drop("_k")
            )
            # cross-batch near-dup: batch band keys vs the PERSISTED
            # kept band keys (falling back to recomputation only for a
            # state dir written before the band log existed). A crash
            # between the band-log write and the kept-log write leaves
            # phantom band rows for this batch's docs — harmless on
            # replay: their candidate pairs cannot resolve a text in
            # the kept log's verify join, so no spurious drop occurs
            # and the band delta is rewritten idempotently.
            # candidate keys from the precomputed batch band values;
            # digest-dropped docs may leak extra candidate rows, but
            # their doc_a cannot resolve a text in the verify join
            # against post-dedup b, so the drop set is identical
            nb = explode_band_values(bvs_b)
            # backfill decision must be REPLAY-STABLE: "no band snapshot
            # OLDER than this batch" — a crash after the backfill delta
            # write but before the kept write leaves only delta-b{N},
            # and `read() is None` would then skip the backfill on
            # replay and overwrite it with survivors-only keys, losing
            # the pre-upgrade docs' band values forever. Any state dir
            # that legitimately covered earlier batches has a band
            # snapshot with an older id (deltas per batch; compaction
            # bases carry the compacting batch's id).
            oldest = self.band_log.oldest_batch_id()
            backfill_prior = oldest is None or oldest >= batch_id
            if not backfill_prior:
                np_ = explode_band_values(self.band_log.read())
            else:
                np_ = _banded_keys(prior, self.n_hashes, self.bands)
            cand = (
                nb.select(F.col("doc_id").alias("doc_a"), "band", "bh")
                .join(
                    np_.select(F.col("doc_id").alias("doc_b"), "band", "bh"),
                    ["band", "bh"],
                )
                .select("doc_a", "doc_b")
                .distinct()
            )
            dropped = (
                verified_pairs(cand, b, prior, self.neardup_jaccard)
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
        # LAST — a crash after the curated/band writes but before the
        # kept write replays the whole batch (earlier delta dirs are
        # overwritten idempotently); the reverse order would skip the
        # replay and silently lose the batch's curated rows
        self.curated_log.write_delta(
            deterministic_sample(survivors, self.sample_fraction).select(
                "doc_id", "n_tokens", "quality_score"
            ),
            batch_id,
        )
        bv_delta = bvs_b.join(
            survivors.select("doc_id"), "doc_id", "left_semi"
        )
        if backfill_prior:
            # one-time upgrade cost for a state dir written before the
            # band log existed: persist the PRIOR kept docs' band keys
            # too, or every later batch would treat the incomplete log
            # as the full candidate source and admit near-dups of
            # pre-upgrade kept docs
            bv_delta = band_values_projection(
                prior.select("doc_id", "text"), self.n_hashes, self.bands
            ).unionByName(bv_delta)
        self.band_log.write_delta(bv_delta, batch_id)
        self.kept_log.write_delta(survivors, batch_id)
        if self.kept_log.delta_count() >= self.compact_every:
            self.kept_log.compact(batch_id)
            self.curated_log.compact(batch_id)
            self.band_log.compact(batch_id)

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
