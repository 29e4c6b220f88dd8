"""Incremental (streaming) corpus curation — the foreachBatch twins of
operators/curate.py::curate_corpus and ::curate_corpus_strict.

Chaining the needed stateful operators (digest dedup state + band or
span state) inside ONE streaming query is illegal in Spark, so the
incremental curators follow the repo's IncrementalSmoother pattern:
each micro-batch is processed with ordinary BATCH operators against
persisted state logs (streaming/incremental.py::SnapshotLog —
base+delta parquet, idempotent per batch id, compaction+GC).

Shared semantics (streaming-greedy, batch-monotone — documented,
tested against independent Python oracles):
  per batch B (after the per-pipeline stateless filters):
    1. exact dedup: drop digests already kept in prior batches; keep
       the smallest doc_id per digest within the batch.
    2. pipeline-specific near-dup / coverage drop (see subclasses).
    3. survivors enter the kept state; the deterministic sample of the
       survivors is appended to the curated output log.
  A single batch containing the whole corpus reproduces the batch
  pipeline EXACTLY (tested for both subclasses). doc_ids are unique
  across the stream by contract (the kept log is doc-keyed).

Crash contract (ONE implementation, inherited): the replay guard is
``has(batch_id)`` on the KEPT log, so the kept delta lands LAST; a
crash after the curated/aux writes replays the whole batch (delta
writes are idempotent). The replay reads prior aux state with
``before_batch_id`` so the crashed in-flight aux delta — which holds
this batch's own survivors' digests — is never mistaken for prior
state (the ADVICE-r3 data-loss window, regression-tested). The
backfill decision ("does any aux snapshot PREdate this batch?") is
replay-stable for state dirs written before an aux log existed.

Scale shape: per batch, every step is a hash shuffle keyed on digest,
band bucket, gram, or doc id; state grows with KEPT docs only.
Everything the per-batch plan needs from the kept side is PERSISTED in
an auxiliary SnapshotLog, so a batch reads STORED state — kept TEXT is
never re-scanned, re-hashed, or re-tokenized per batch (byte volume is
~the text's, the win is the per-batch CPU).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.operators.curate import (
    CURATE_LANG,
    CURATE_MAX_DUP_RATIO,
    CURATE_MAX_SPAN_COV,
    CURATE_MIN_QUALITY,
    CURATE_NEARDUP_J,
    CURATE_SAMPLE_F,
    CURATE_SPAN_GRAM,
    exact_canonical,
    filtered_base,
)
from cuda_gis_smoothing_spark.operators.dedup import (
    TOKEN_ARRAY_SQL,
    band_values_projection,
    bipartite_spans,
    explode_band_values,
    interval_coverage,
    lsh_blocked_neardup_drops,
    merge_gram_runs,
    verified_jaccard_pairs_prepared,
)
from cuda_gis_smoothing_spark.operators.sampling import deterministic_sample
from cuda_gis_smoothing_spark.streaming.dedup import DOCS_SCHEMA
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog


class _IncrementalCuratorBase:
    """The shared three-log skeleton; subclasses define the stateless
    batch filters (:meth:`_batch_base`), the per-doc derived state the
    aux log stores (:meth:`_aux`), and the drop rule
    (:meth:`_drops`)."""

    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        sample_fraction: float = CURATE_SAMPLE_F,
        compact_every: int = 4,
    ):
        self.spark = spark
        self.sample_fraction = sample_fraction
        self.compact_every = compact_every
        self.kept_log = SnapshotLog(
            spark, os.path.join(state_root, "kept_docs"), key="doc_id"
        )
        self.curated_log = SnapshotLog(
            spark, os.path.join(state_root, "curated"), key="doc_id"
        )
        # kept docs' derived state, one row per doc — everything
        # cross-batch processing needs without touching kept text
        self.aux_log = SnapshotLog(
            spark, os.path.join(state_root, "kept_aux"), key="doc_id"
        )

    # -- subclass surface ------------------------------------------------------
    def _batch_base(self, docs: DataFrame) -> DataFrame:
        """Stateless filters + intra-batch exact canonicalization."""
        raise NotImplementedError

    def _aux(self, docs: DataFrame) -> DataFrame:
        """(doc_id, _k, ...) — the stored per-doc derivations; _k is
        the md5 digest every subclass's cross-batch dedup keys on."""
        raise NotImplementedError

    def _drops(
        self, b: DataFrame, aux_b: DataFrame, prior_aux: DataFrame | None
    ) -> DataFrame:
        """doc_ids of batch docs to drop, given the digest-deduped
        batch ``b``, its derived state ``aux_b`` (predates the digest
        anti-join — restrict via semi-join on ``b``), and the PRIOR
        kept docs' stored state (None on the first batch)."""
        raise NotImplementedError

    # -- state views -----------------------------------------------------------
    def current_kept(self) -> DataFrame | None:
        return self.kept_log.read()

    def current_curated(self) -> DataFrame | None:
        return self.curated_log.read()

    # -- the foreachBatch body -------------------------------------------------
    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        if self.kept_log.has(batch_id):
            return  # crash replay of an already-applied batch: no-op
        b = self._batch_base(docs).localCheckpoint()
        # the batch's derived state is computed ONCE and reused: digest
        # anti-join, drop-rule inputs, and the aux-log delta
        aux_b = self._aux(b).localCheckpoint()
        prior = self.kept_log.read()
        backfill_prior = False
        prior_aux = None
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
                .localCheckpoint()
            )
        dropped = self._drops(b, aux_b, prior_aux)
        survivors = b.join(dropped, "doc_id", "left_anti").localCheckpoint()
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

    # -- stream wiring ---------------------------------------------------------
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


class IncrementalCurator(_IncrementalCuratorBase):
    """The jaccard-policy incremental curator (curate_corpus's twin).

    Drop rule per batch: a batch doc b is dropped if a VERIFIED
    jaccard >= t partner exists among prior kept docs (cross-batch
    candidates from the shared MinHash band keys) or among smaller
    same-batch survivors (the same monotone rule curate_corpus uses
    corpus-wide). Aux payload per kept doc: md5 digest (_k), LSH
    band-value array (_bvs), distinct-token array (_tok).
    """

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
        super().__init__(spark, state_root, sample_fraction, compact_every)
        self.lang = lang
        self.min_quality = min_quality
        self.neardup_jaccard = neardup_jaccard
        self.n_hashes = n_hashes
        self.bands = bands

    def _batch_base(self, docs: DataFrame) -> DataFrame:
        return exact_canonical(
            filtered_base(docs, self.lang, self.min_quality)
        )

    def _aux(self, docs: DataFrame) -> DataFrame:
        """(doc_id, _bvs, _k, _tok) — band values, digest and distinct
        tokens, token-hashed/tokenized/digested in ONE projection."""
        return band_values_projection(
            docs,
            self.n_hashes,
            self.bands,
            extra={
                "_k": F.md5("text"),
                "_tok": F.expr(TOKEN_ARRAY_SQL.format(text_col="text")),
            },
        )

    def _drops(
        self, b: DataFrame, aux_b: DataFrame, prior_aux: DataFrame | None
    ) -> DataFrame:
        cross = None
        if prior_aux is not None:
            # cross-batch near-dup: batch band keys vs STORED kept band
            # keys. Digest-dropped batch docs may leak extra candidate
            # rows (aux_b predates the anti-join), but their doc_a
            # cannot resolve an array in the post-dedup verify side, so
            # the drop set is identical. (A crashed delta for THIS
            # batch is excluded at the base class's read, so neither
            # the digest anti-join nor this candidate join ever sees
            # the batch's own in-flight rows as prior state.)
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
            cross = (
                verified_jaccard_pairs_prepared(cand, ta, tb, self.neardup_jaccard)
                .select(F.col("doc_a").alias("doc_id"))
                .distinct()
            )
            b = b.join(cross, "doc_id", "left_anti").localCheckpoint()
        # intra-batch near-dup (monotone: drop vs any smaller batch doc
        # surviving the cross-batch stage) — the same fused blocked
        # bucket kernel curate_corpus uses, so a self-similar BATCH is
        # per-task bounded too
        intra = lsh_blocked_neardup_drops(
            b, self.neardup_jaccard, n_hashes=self.n_hashes, bands=self.bands
        )
        return intra if cross is None else cross.unionByName(intra)


class IncrementalStrictCurator(_IncrementalCuratorBase):
    """The strict-policy incremental curator — curate_corpus_strict's
    twin (VERDICT r3 #3): language -> quality -> Gopher repetition
    filter -> exact dedup -> SPAN-COVERAGE drop -> sample.

    The two design questions the batch backlog flagged, answered:

    * **Aux payload.** Span seeds need ORDERED tokens with positions —
      the jaccard curator's distinct-token arrays cannot express them.
      The aux row stores the doc's GRAM POSTINGS ``_gp`` =
      ``array<struct<_pos, _g>>`` (the fully materialized
      :func:`gram_positions` output, nested per doc so the log stays
      one-row-per-key), its token count ``_n``, and the ``_k`` digest
      (VERDICT r4 #5 — previously the raw token array, which every
      batch re-built grams from: an O(kept tokens) string-assembly
      pass per batch). Byte volume ~k× the kept text — inherent to
      substring-level state; the log buys per-batch CPU: the
      cross-batch side is now explode(stored structs), zero
      tokenization or gram assembly (plan-asserted: no array_join on
      the prior side), and the stored postings are SEMI-JOINED down to
      the batch's own gram set before the span join's shuffle, so the
      per-batch join ships O(batch grams ∩ stored grams) stored rows,
      not O(stored grams).

    * **Drop direction.** Batch span coverage is SYMMETRIC (both
      members of a copied pair can exceed the threshold and drop); an
      incremental rule needs a monotone direction. The rule: once
      kept, a doc is never retroactively dropped — an INCOMING doc's
      coverage is measured against ALL prior kept docs and ALL its
      same-batch (exact-deduped) peers, with every interval unioned in
      ONE sweep before thresholding (a doc 0.15-covered by kept text
      and 0.15 by a batch peer drops at threshold 0.25 — separate
      sequential checks would keep it). Within a single batch the rule
      degenerates to the batch operator's symmetric semantics, so one
      whole-corpus batch == ``curate_corpus_strict`` EXACTLY (tested);
      across batches it is the standard streaming-greedy
      approximation (tested against a pure-Python oracle).
    """

    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        lang: str = CURATE_LANG,
        min_quality: float = CURATE_MIN_QUALITY,
        max_dup_ratio: float = CURATE_MAX_DUP_RATIO,
        max_span_coverage: float = CURATE_MAX_SPAN_COV,
        gram_len: int = CURATE_SPAN_GRAM,
        sample_fraction: float = CURATE_SAMPLE_F,
        compact_every: int = 4,
    ):
        super().__init__(spark, state_root, sample_fraction, compact_every)
        self.lang = lang
        self.min_quality = min_quality
        self.max_dup_ratio = max_dup_ratio
        self.max_span_coverage = max_span_coverage
        self.gram_len = gram_len

    def _batch_base(self, docs: DataFrame) -> DataFrame:
        from cuda_gis_smoothing_spark.functions.numeric import round6

        base = filtered_base(docs, self.lang, self.min_quality)
        # the same inline pure-expression repetition filter
        # curate_corpus_strict uses (equality with repetition_signals
        # pytest-gated there)
        toks = F.split(F.lower(F.col("text")), " ")
        dup_ratio = round6(1.0 - F.size(F.array_distinct(toks)) / F.size(toks))
        return exact_canonical(base.where(dup_ratio <= self.max_dup_ratio))

    def _aux(self, docs: DataFrame) -> DataFrame:
        """(doc_id, _k, _gp, _n) — digest, MATERIALIZED gram postings
        (1-based positions, identical to :func:`gram_positions`; empty
        array for docs shorter than the gram), and token count. Grams
        are built exactly ONCE per doc lifetime, here."""
        k = self.gram_len
        grams = F.expr(
            f"CASE WHEN size(_t) >= {k} THEN "
            f"transform(sequence(1, size(_t) - {k - 1}), "
            f"i -> struct(CAST(i AS BIGINT) AS _pos, "
            f"array_join(slice(_t, i, {k}), ' ') AS _g)) "
            f"ELSE CAST(array() AS array<struct<_pos: bigint, _g: string>>) END"
        )
        return docs.select(
            "doc_id",
            F.md5("text").alias("_k"),
            F.split(F.lower(F.col("text")), " ").alias("_t"),
        ).select(
            "doc_id",
            "_k",
            grams.alias("_gp"),
            F.size("_t").cast("long").alias("_n"),
        )

    @staticmethod
    def _gram_pos(aux: DataFrame) -> DataFrame:
        """(doc_id, _pos, _g) from the stored nested postings — the
        read-side twin of :func:`gram_positions`, with no string work."""
        return aux.select("doc_id", F.explode("_gp").alias("_e")).select(
            "doc_id", F.col("_e._pos").alias("_pos"), F.col("_e._g").alias("_g")
        )

    def _drops(
        self, b: DataFrame, aux_b: DataFrame, prior_aux: DataFrame | None
    ) -> DataFrame:
        k = self.gram_len
        # batch docs' gram positions, from the stored postings (aux_b
        # predates the digest anti-join — restrict to surviving b)
        aux_bb = aux_b.join(b.select("doc_id"), "doc_id", "left_semi")
        pos_b = self._gram_pos(aux_bb)
        # intra-batch spans: the duplicate_spans self-join shape over
        # stored arrays (same pinned parallelism)
        parts = b.sparkSession.sparkContext.defaultParallelism
        sa = pos_b.select(
            F.col("doc_id").alias("doc_a"), F.col("_pos").alias("pos_a"), "_g"
        ).repartition(parts, "_g")
        sb = pos_b.select(
            F.col("doc_id").alias("doc_b"), F.col("_pos").alias("pos_b"), "_g"
        ).repartition(parts, "_g")
        intra = merge_gram_runs(
            sa.join(sb, "_g").where(F.col("doc_a") < F.col("doc_b")), k, parts
        )
        # intra pairs are batch-batch: BOTH sides contribute intervals
        # (exploded from one pass — the span_coverage lesson)
        iv = (
            intra.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("doc_a").alias("doc_id"),
                            F.col("start_a").alias("_s"),
                            (F.col("start_a") + F.col("span_tokens") - 1).alias("_e"),
                        ),
                        F.struct(
                            F.col("doc_b").alias("doc_id"),
                            F.col("start_b").alias("_s"),
                            (F.col("start_b") + F.col("span_tokens") - 1).alias("_e"),
                        ),
                    )
                ).alias("_iv")
            )
            .select("_iv.doc_id", "_iv._s", "_iv._e")
        )
        if prior_aux is not None:
            # cross-batch spans: batch side vs STORED kept gram
            # postings — no tokenization or gram assembly here — and
            # only the batch side's intervals matter (kept docs are
            # never retroactively dropped; their coverage froze at
            # admission). The stored side semi-joins down to the
            # batch's own gram set BEFORE the span join's shuffle:
            # ships O(batch grams ∩ stored grams) rows, not O(stored
            # grams) — the broadcast is bounded by the micro-batch's
            # distinct grams.
            batch_grams = pos_b.select("_g").distinct()
            pos_k = self._gram_pos(prior_aux).join(
                F.broadcast(batch_grams), "_g", "left_semi"
            )
            cross = bipartite_spans(pos_b, pos_k, k)
            iv = iv.unionByName(
                cross.select(
                    F.col("doc_a").alias("doc_id"),
                    F.col("start_a").alias("_s"),
                    (F.col("start_a") + F.col("span_tokens") - 1).alias("_e"),
                )
            )
        doc_tokens = aux_bb.select("doc_id", F.col("_n").alias("n_tokens"))
        cov = interval_coverage(iv, doc_tokens)
        return cov.where(F.col("coverage") > self.max_span_coverage).select(
            "doc_id"
        )
