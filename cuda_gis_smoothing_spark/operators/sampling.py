"""Deterministic sampling for training-data pipelines.

Hash-based Bernoulli sampling keyed on a stable id — NOT ``rand()``:
the sample is reproducible across runs, engines, partitionings and
retries (a task retry with ``rand()`` silently changes the sample; at
100 TB retries are a certainty). The hash is the repo's portable
affine-over-prime construction (operators/dedup.py) so DuckDB draws
the *identical* sample — the per-row decision itself is
correctness-gated, not just the aggregate rate.

Stratified mode takes per-stratum fractions (e.g. downsample dominant
languages, keep all of rare ones) — the usual class-rebalancing step
before training. Everything is a single Catalyst filter: no shuffle,
no UDF, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cuda_gis_smoothing_spark.operators.dedup import MH_PRIME

# one more affine pair, disjoint from the MinHash ones, so sampling
# never correlates with signature buckets
S_A = 1_094_795_711
S_B = 373_587_883
_DENOM = 1_000_000  # fraction resolution 1e-6


def sample_hash_col(id_col: str = "doc_id") -> Column:
    return (F.col(id_col) * S_A + S_B) % MH_PRIME % _DENOM


def sample_hash_sql(id_expr: str = "doc_id") -> str:
    return f"(({id_expr} * {S_A} + {S_B}) % {MH_PRIME}) % {_DENOM}"


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided purely by the row's id."""
    return df.where(sample_hash_col(id_col) < int(fraction * _DENOM))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (class rebalancing).

    ``fractions`` maps stratum value → keep-fraction; strata not listed
    keep ``default_fraction``. One filter expression, no shuffle.
    """
    thresh = F.lit(int(default_fraction * _DENOM))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(frac * _DENOM))
        ).otherwise(thresh)
    return df.where(sample_hash_col(id_col) < thresh)


def stratified_sample_sql(
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    source: str = "documents",
) -> str:
    """DuckDB twin drawing the identical per-row sample."""
    branches = " ".join(
        f"WHEN {strata_col} = '{value}' THEN {int(frac * _DENOM)}"
        for value, frac in sorted(fractions.items(), reverse=True)
    )
    case = f"CASE {branches} ELSE {int(default_fraction * _DENOM)} END"
    return f"SELECT * FROM {source} WHERE {sample_hash_sql(id_col)} < {case}"


def quality_weighted_sample(docs: DataFrame) -> DataFrame:
    """Importance sampling by quality: keep each doc with probability
    equal to its quality score — the soft alternative to a hard
    quality cutoff (a DSIR/CCNet-shaped reweighting: high-quality docs
    are kept almost surely, low-quality docs survive at their score's
    rate instead of being zeroed).

    Output: ``(doc_id, n_tokens, quality_score)`` for kept docs. The
    decision is ``portable_hash(doc_id) < floor(score * 1e6)`` — same
    hash family as :func:`deterministic_sample`, so the per-row draw is
    reproducible across runs/retries/engines and the DuckDB twin keeps
    the IDENTICAL set (floor via functions.numeric.floor_stable: the
    score is a round6'd double, so score*1e6 sits ~1e-11 from an
    integer and both engines must nudge the same way). One scan, one
    Catalyst filter, no shuffle, pushdown-friendly.
    """
    from cuda_gis_smoothing_spark.functions.numeric import floor_stable
    from cuda_gis_smoothing_spark.operators.curate import (
        _with_quality_and_lang,
    )

    q = _with_quality_and_lang(docs, "doc_id")
    return q.where(
        sample_hash_col("doc_id")
        < floor_stable(F.col("quality_score") * _DENOM)
    ).select("doc_id", "n_tokens", "quality_score")


#: weighted-quantile probe fractions — shared by the operator and its
#: DuckDB twin (flit()-ed there) so the grid cannot drift
QW_QUANTILE_FRACTIONS = (0.25, 0.5, 0.75, 0.9, 0.99)


def quality_weighted_quantiles(
    docs: DataFrame, fractions: tuple[float, ...] = QW_QUANTILE_FRACTIONS
) -> DataFrame:
    """TOKEN-weighted quality quantiles: "the median token (not the
    median document) sits at quality X" — the curation-threshold
    question that doc-count percentiles answer wrongly when long docs
    skew low (a 10%-of-docs spam source can be 40% of tokens). For
    each probe fraction f, the smallest quality level whose cumulative
    token weight reaches f of the total.

    Exactness: weights are integer token counts; the per-level sums and
    the running sum are integers; the threshold compare ``cumw ≥ f·W``
    is one correctly-rounded multiply on each side of an exact compare
    — the identical expression shape in both engines (the
    axis_visibility lesson: no aggregate feeds the compare, so even an
    exact boundary tie resolves identically). MIN over levels is
    association-free. NULL-text docs carry NULL n_tokens and are out of
    scope (a NULL weight would poison the sum) — documented contract.

    Plan (100 TB): one quality projection scan → one map-side-combining
    per-LEVEL aggregate (levels are bounded by the round6 grid, ≤ 1e6
    rows, NOT the corpus) → one unpartitioned running-sum window over
    the level table (the locality_metric ≤10M-row window contract) →
    a 1-row broadcast total and a #fractions-sized probe."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.operators.curate import _with_quality_and_lang

    q = _with_quality_and_lang(docs, "doc_id").where(F.col("n_tokens").isNotNull())
    lv = q.groupBy("quality_score").agg(
        F.sum("n_tokens").cast("long").alias("_w")
    )
    lv = lv.localCheckpoint()  # two consumers: the running sum and the total
    w = Window.orderBy("quality_score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = lv.select(
        "quality_score", F.sum("_w").over(w).cast("double").alias("_cw")
    )
    tot = lv.agg(F.sum("_w").cast("double").alias("_W"))
    fr = F.explode(F.array(*[F.lit(float(f)) for f in fractions])).alias("fraction")
    return (
        cum.crossJoin(F.broadcast(tot))
        .select("quality_score", "_cw", "_W", fr)
        .where(F.col("_cw") >= F.col("fraction") * F.col("_W"))
        .groupBy("fraction")
        .agg(F.min("quality_score").alias("weighted_quality"))
    )


#: train/val/test hash boundaries over the 1e-6-resolution hash space
#: (train 90%, val 5%, test 5%) — ONE constant pair shared by the
#: operator and the DuckDB twin so the cut cannot drift
SPLIT_TRAIN_LT = 900_000
SPLIT_VAL_LT = 950_000


def dataset_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic train/val/test assignment ``(doc_id, split)`` —
    the holdout cut every training pipeline makes, decided purely by
    the row's id through the portable hash (NOT rand(): reproducible
    across runs, engines, partitionings and task retries, and a doc
    keeps its split when the corpus around it changes — the property
    that prevents silent test-set leakage on re-ingestion). Boundaries
    are module constants; the per-row assignment itself is
    correctness-gated against the DuckDB twin. One scan, one
    expression, no shuffle."""
    h = sample_hash_col(id_col)
    split = (
        F.when(h < SPLIT_TRAIN_LT, F.lit("train"))
        .when(h < SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(F.col(id_col), split.alias("split"))


def source_quota(docs: DataFrame, per_source_cap: int = 50) -> DataFrame:
    """Source balancing by quota: keep each source's top
    ``per_source_cap`` docs by quality — the data-mixing step that
    stops one crawl from dominating the blend (the hard-cap
    counterpart of :func:`stratified_sample`'s rate-based form).

    Output: ``(doc_id, source, quality_score, rank)``. Ordering is
    (quality DESC, doc_id ASC) — quality is a round6'd double that
    hash-matches across engines (the doc_quality gate), and doc_id
    breaks ties, so the cut is a deterministic TOTAL order in both
    engines (the cross-engine window rule).

    Plan: one scan derives quality, one window per source partition.
    Partition size = a source's doc count — at 100 TB with a
    billion-doc source, pre-filter with an approximate per-source
    quality threshold (approx quantile at 1 - cap/n) so the exact
    window only ranks the near-threshold band; the gate corpus needs
    no such band-pass."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.operators.curate import _with_quality_and_lang

    q = _with_quality_and_lang(docs, "doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        q.select("doc_id", "source", "quality_score")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= per_source_cap)
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle (training data-order layout)
# ---------------------------------------------------------------------------

#: fresh affine pair, disjoint from S_A/S_B (sampling), MH/JS/KMV —
#: epoch permutations must not correlate with sample membership
ES_A = 1_327_217_909
ES_B = 477_218_579
ES_EPOCHS = 2
ES_SHARDS = 8


def epoch_shuffle(
    docs: DataFrame,
    id_col: str = "doc_id",
    epochs: int = ES_EPOCHS,
    shards: int = ES_SHARDS,
) -> DataFrame:
    """Deterministic per-epoch training permutation + shard layout —
    the data-ORDER step a training pipeline runs after packing: every
    epoch must visit each example once in a different, reproducible
    order, and loaders take contiguous position blocks (shards). Per
    (doc, epoch): position = rank of the portable affine hash
    ``h = ((id + epoch) mod P · ES_A + ES_B) mod P`` within the epoch
    (a bijection for ids < P, so positions are a true permutation;
    the id tie-break keeps ranks total beyond that), shard =
    ``(position−1)·shards div n`` — balanced contiguous blocks,
    integer floor-div exact cross-engine.

    Plan (100 TB): epochs ride ONE scan via an explode; ranks come
    from the partition-parallel :func:`global_ranks` kernel over the
    COMBINED integer key ``epoch·P + h`` (the cost_allocation
    integerize-the-key move: one global rank, per-epoch positions
    recovered by subtracting ``epoch·n``) — no global sort, no
    per-epoch window over the corpus. Output
    ``(doc_id, epoch, position, shard)``, all BIGINT."""
    from cuda_gis_smoothing_spark.plans.partitioning import global_ranks

    base = docs.select(F.col(id_col).alias("doc_id"))
    e = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(epochs - 1))).alias("_e"),
    ).select("doc_id", F.col("_e").cast("long").alias("epoch"))
    h = (
        F.pmod(F.col("doc_id") + F.col("epoch"), F.lit(MH_PRIME)) * ES_A
        + ES_B
    ) % MH_PRIME
    keyed = e.select(
        "doc_id", "epoch", (F.col("epoch") * MH_PRIME + h).alias("_k")
    )
    ranked = global_ranks(keyed, ["_k", "doc_id"], out_col="_r")
    nrow = base.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    pos = F.col("_r") - F.col("epoch") * F.col("_n")
    return (
        ranked.crossJoin(F.broadcast(nrow))
        .select(
            "doc_id",
            "epoch",
            pos.cast("long").alias("position"),
            ((pos - 1) * shards).cast("long").alias("_t"),
            "_n",
        )
        .select(
            "doc_id",
            "epoch",
            "position",
            F.expr("_t DIV _n").cast("long").alias("shard"),
        )
    )


def epoch_shuffle_sql(
    epochs: int = ES_EPOCHS, shards: int = ES_SHARDS
) -> str:
    """DuckDB twin: per-epoch ROW_NUMBER over (h, id) — identical
    positions because h is unique per epoch (bijection) and the id
    tie-break totalizes the order regardless."""
    vals = ", ".join(f"({i})" for i in range(epochs))
    return f"""
WITH e AS (
  SELECT d.doc_id, CAST(ep.epoch AS BIGINT) AS epoch
  FROM documents d CROSS JOIN (VALUES {vals}) AS ep(epoch)
),
k AS (
  SELECT doc_id, epoch,
         ((((doc_id + epoch) % {MH_PRIME} + {MH_PRIME}) % {MH_PRIME})
          * {ES_A} + {ES_B}) % {MH_PRIME} AS h
  FROM e
),
p AS (
  SELECT doc_id, epoch,
         CAST(ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY h, doc_id)
              AS BIGINT) AS position
  FROM k
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
SELECT doc_id, epoch, position,
       CAST((position - 1) * {shards} // n.n AS BIGINT) AS shard
FROM p, n
""".strip()
