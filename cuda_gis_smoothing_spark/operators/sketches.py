"""Deterministic cardinality sketching: KMV (k-minimum-values)
approximate distinct counts.

At 100 TB "how many distinct users/tokens/documents" is answered by a
SKETCH, not COUNT(DISTINCT) — but the usual sketches (HyperLogLog,
``approx_count_distinct``) use engine-private hashes and are therefore
ungateable cross-engine (the documented approx_percentile constraint).
KMV over the repo's PORTABLE affine-over-prime hash removes that: the
estimator is a pure function of the k smallest distinct hash values,
every one of which both engines compute bit-identically — a fully
driver-hash-gateable approximate algorithm, the same move that made
sampling reproducible (operators/sampling.py: hash, never rand()).

Estimator (Bar-Yossef et al.): with hashes ~ uniform on [0, P), the
k-th smallest distinct value h_(k) estimates density k/n, so

    n̂  =  (k − 1) · P / (h_(k) + 1)          (sketch full: n ≥ k)
    n̂  =  n_exact                            (fewer than k distinct)

(+1 keeps the ratio finite at h=0; relative error ~ 1/√(k−2)).
Hash collisions under-count exactly identically in both engines.

Scale shape: the heavy step is the (group, hash) DISTINCT — a
map-side-combinable hash aggregate over the raw stream; the per-group
rank that extracts the k smallest then runs over DISTINCT HASHES only
(≤ one row per distinct member, not per event). The merge property
real pipelines use — union of sketches = sketch of union (keep the k
smallest of the concatenation) — holds by construction since the
sketch is just the k smallest distinct hashes; sketches from
partitions/days can be merged without re-reading events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from cuda_gis_smoothing_spark.operators.dedup import MH_PRIME

# a fresh affine pair, disjoint from the MinHash (MH_A/MH_B) and
# sampling (S_A/S_B) pairs, so cardinality sketches never correlate
# with signature buckets or sample membership
KMV_A = 1_582_459_139
KMV_B = 711_628_519
KMV_K = 64


def kmv_hash_col(id_col: str) -> Column:
    """Portable hash to [0, MH_PRIME): the id is reduced mod P BEFORE
    the affine transform so products stay < 2^61 for ANY bigint id
    (DuckDB raises on int64 overflow where Spark wraps — the CLAUDE.md
    invariant)."""
    return (F.pmod(F.col(id_col), F.lit(MH_PRIME)) * KMV_A + KMV_B) % MH_PRIME


def kmv_hash_sql(id_expr: str) -> str:
    return f"((({id_expr} % {MH_PRIME} + {MH_PRIME}) % {MH_PRIME}) * {KMV_A} + {KMV_B}) % {MH_PRIME}"


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Per-group approximate distinct ``id_col`` count via a k-minimum-
    values sketch. Output one row per group:
    ``(*group_cols, n_sketch, kth_hash, est_distinct)`` where n_sketch
    = min(k, distinct) and est_distinct is the (rounded) estimate —
    exact when the sketch isn't full. NULL ids are excluded (COUNT
    DISTINCT convention, identical in both engines)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    if k < 2:
        raise ValueError("kmv_distinct: k must be >= 2 (estimator uses k - 1)")
    hashes = (
        df.where(F.col(id_col).isNotNull())
        .select(*group_cols, kmv_hash_col(id_col).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    topk = hashes.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    kp = (k - 1) * MH_PRIME  # exact integer, emitted as one literal
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(F.lit(float(kp)) / (F.col("kth_hash") + 1))
    return (
        topk.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            F.max("_h").cast("long").alias("kth_hash"),
        )
        .select(*group_cols, "n_sketch", "kth_hash", round6(est).alias("est_distinct"))
    )


def kmv_distinct_sql(
    source: str, group_cols: list[str], id_expr: str, k: int = KMV_K
) -> str:
    """DuckDB twin of :func:`kmv_distinct` — same hash, same rank, same
    literal (k−1)·P numerator, same round6."""
    from cuda_gis_smoothing_spark.functions.numeric import flit

    g = ", ".join(group_cols)
    kp = flit(float((k - 1) * MH_PRIME))
    return f"""
WITH hs AS (
  SELECT DISTINCT {g}, {kmv_hash_sql(id_expr)} AS h
  FROM {source} WHERE {id_expr} IS NOT NULL
),
rk AS (
  SELECT {g}, h, ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY h) AS rn FROM hs
),
agg AS (
  SELECT {g}, COUNT(*) AS n_sketch, MAX(h) AS kth_hash
  FROM rk WHERE rn <= {k} GROUP BY {g}
)
SELECT {g}, CAST(n_sketch AS BIGINT) AS n_sketch,
       CAST(kth_hash AS BIGINT) AS kth_hash,
       ROUND((CASE WHEN n_sketch < {k} THEN CAST(n_sketch AS DOUBLE)
                   ELSE {kp} / (kth_hash + 1) END) + 1e-09, 6) AS est_distinct
FROM agg
""".strip()
