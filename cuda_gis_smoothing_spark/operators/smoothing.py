"""The core k-ring neighbor-average smoothing operators (J1/J2 + A1-A4).

Reference semantics (transcribed, not ported):
  * J1 neighbor gather      /root/reference/src/cpu/hex_smooth_naive.cpp:53-59
  * J2 second-order set     /root/reference/src/cuda/hex_smooth_cuda_v5.cu:423-463
  * A1 simple average       /root/reference/src/cpu/hex_smooth_naive.cpp:48-63
  * A2 Gaussian weights     /root/reference/src/cpu/hex_smooth_naive.cpp:65-83
  * A3 extended two-ring    /root/reference/src/cuda/hex_smooth_cuda_v5.cu:127-180
  * A4 fused multi-variable /root/reference/src/cuda/hex_smooth_cuda_v4.cu:59-111

Spark-first design (SURVEY.md §2/§7): the adjacency list, CSR offsets
and padded neighbor arrays of the reference all disappear. k-ring
expansion is an ``explode`` of a LITERAL (dq*ENC + dr, ring) offset
array — pure column arithmetic inside whole-stage codegen, no UDF, no
extra shuffle. The gather is ONE equi self-join; every weight scheme
and every fused variable is folded into ONE groupBy aggregate, so the
whole pass costs exactly one join + one aggregation regardless of how
many variables are fused (the reference needed a hand-written CUDA
kernel per combination).

Scale notes (100 TB thinking):
  * The join's build side (cell -> values) is the full cell table; for
    city/continent grids it fits comfortably under a broadcast
    threshold → zero-shuffle map-side join. For planet-scale grids,
    hash join on ``cell`` shuffles both sides ONCE; AQE skew-join
    splits hot cells.
  * The groupBy reuses the join's output partitioning on ``cell`` when
    the join was shuffle-hash on the same key → no second shuffle.
  * Weighted sums accumulate in float64 regardless of input width
    (partial-agg order is nondeterministic; float32 accumulation would
    not be reproducible — SURVEY.md §7 numeric-parity risk).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from cuda_gis_smoothing_spark.hexgrid import kring_offsets, neighbor_delta
from cuda_gis_smoothing_spark.plans.config import SmoothingPlan


def kring_edges(
    cells: DataFrame,
    k: int,
    include_center: bool = True,
    cell_col: str = "cell",
) -> DataFrame:
    """J1/J2: expand each cell to its k-ring as (cell, nbr, ring) rows.

    Pure column math: ``nbr = cell + dq*ENC + dr`` over a literal offset
    array. Emits 1 + 6 (+ 12) rows per cell; dangling neighbors are NOT
    filtered here — the later inner join against the cell table drops
    them, which IS the reference's validity filter
    (/root/reference/src/cuda/hex_smooth_cuda_v1.cu:52).
    """
    offs = F.array(
        *[
            F.struct(
                F.lit(neighbor_delta(dq, dr)).alias("delta"),
                F.lit(ring).alias("ring"),
            )
            for dq, dr, ring in kring_offsets(k, include_center)
        ]
    )
    return cells.select(
        F.col(cell_col).alias("cell"),
        F.explode(offs).alias("o"),
    ).select(
        "cell",
        (F.col("cell") + F.col("o.delta")).alias("nbr"),
        F.col("o.ring").alias("ring"),
    )


def ring_weight_col(weights: dict[int, float]):
    """ring -> weight as a foldable CASE expression (Catalyst constant-folds)."""
    expr = None
    rings = sorted(weights)
    for ring in rings[:-1]:
        cond = F.col("ring") == ring
        expr = F.when(cond, F.lit(weights[ring])) if expr is None else expr.when(cond, F.lit(weights[ring]))
    last = F.lit(weights[rings[-1]])
    return last if expr is None else expr.otherwise(last)


def smooth(
    cells: DataFrame,
    plan: SmoothingPlan,
    restrict_to: DataFrame | None = None,
) -> DataFrame:
    """A1-A4: one weighted neighbor-average pass over ``plan.variables``.

    Input: DataFrame with ``cell`` plus one numeric column per variable.
    Output: ``cell`` + ``smoothed_<var>`` per variable, one row per
    input cell (isolated cells keep their own value — the join always
    matches at least the ring-0 self row).

    ``restrict_to`` (a DataFrame with a ``cell`` column) limits the
    OUTPUT to those cells — neighbor VALUES still come from the full
    ``cells`` table, so each produced row is identical to the
    unrestricted run's. This is the incremental-maintenance hook
    (IncrementalSmoother re-smooths only a batch's affected k-rings):
    on the geometric gather path the k-ring edges are generated from
    the restricted set alone, so the per-batch join/aggregate work is
    O(restricted x ring), never O(state). Strict ring-2 membership
    depends on mid-cell presence in the FULL grid, and scatter pushes
    contributions FROM every source cell, so those two paths restrict
    by semi-join after edge generation instead (correct, but the edge
    build stays O(state)).
    """
    if plan.strategy == "scatter":
        out = smooth_scatter(cells, plan)
        if restrict_to is not None:
            out = out.join(restrict_to.select("cell"), "cell", "left_semi")
        return out
    variables = list(plan.variables)
    if plan.k == 2 and plan.strict_second_order:
        ring01 = kring_edges(cells.select("cell"), 1, include_center=True)
        ring2 = second_order_edges(cells.select("cell")).withColumn("ring", F.lit(2))
        edges = ring01.unionByName(ring2)
        if restrict_to is not None:
            edges = edges.join(restrict_to.select("cell"), "cell", "left_semi")
    else:
        src = cells.select("cell")
        if restrict_to is not None:
            # only live cells produce output rows (a dangling neighbor
            # key in restrict_to must not fabricate a row from its
            # own neighbors' values)
            src = restrict_to.select("cell").join(src, "cell", "left_semi")
        edges = kring_edges(src, plan.k, include_center=True)

    values = cells.select(
        F.col("cell").alias("nbr"),
        *[F.col(v).cast("double").alias(f"_v_{v}") for v in variables],
    )
    if plan.broadcast_values is True:
        values = F.broadcast(values)

    joined = edges.join(values, "nbr", "inner")
    w = ring_weight_col(plan.ring_weights).alias("w")
    joined = joined.select("cell", w, *[f"_v_{v}" for v in variables])

    aggs = [
        (F.sum(F.col(f"_v_{v}") * F.col("w")) / F.sum("w")).alias(f"smoothed_{v}")
        for v in variables
    ]
    out = joined.groupBy("cell").agg(*aggs)

    if plan.spatial_reorder:
        from cuda_gis_smoothing_spark.plans.partitioning import spatial_repartition

        out = spatial_repartition(out, plan.num_partitions)
    return out


def smooth_scatter(cells: DataFrame, plan: SmoothingPlan) -> DataFrame:
    """Alternative physical strategy for :func:`smooth` (same logical
    operator — the reference's v1-vs-v2 'physical variants' spirit):

    SCATTER instead of GATHER. Each cell explodes its value toward its
    k-ring targets (ring offsets are symmetric, so scattering with ring
    weights equals gathering); one groupBy(target) merges contributions
    with map-side partial aggregation, and a left-semi join against the
    cell table drops phantom targets (the validity filter).

    Plan shape: Generate → partial agg → ONE exchange at cell
    cardinality → final agg → semi join. The gather plan instead joins
    at 19x cell cardinality BEFORE aggregating; scatter's shuffle
    carries per-partition partials only — cheaper whenever cells per
    partition overlap neighborhoods (always, after spatial
    partitioning). Not applicable to strict adjacency ring-2 (needs the
    two-hop join).
    """
    if plan.k == 2 and plan.strict_second_order:
        raise ValueError("scatter strategy supports geometric rings only")
    variables = list(plan.variables)
    weights = plan.ring_weights
    offs = F.array(
        *[
            F.struct(
                F.lit(neighbor_delta(dq, dr)).alias("delta"),
                F.lit(float(weights[ring])).alias("w"),
            )
            for dq, dr, ring in kring_offsets(plan.k, include_center=True)
        ]
    )
    contrib = cells.select(
        F.col("cell"),
        F.explode(offs).alias("o"),
        *[F.col(v).cast("double").alias(f"_v_{v}") for v in variables],
    ).select(
        (F.col("cell") + F.col("o.delta")).alias("cell"),
        F.col("o.w").alias("w"),
        *[f"_v_{v}" for v in variables],
    )
    agg = contrib.groupBy("cell").agg(
        *[
            (F.sum(F.col(f"_v_{v}") * F.col("w")) / F.sum("w")).alias(f"smoothed_{v}")
            for v in variables
        ]
    )
    return agg.join(cells.select("cell"), "cell", "left_semi")


def smooth_scatter_int(
    cells: DataFrame,
    value_col: str,
    scaled_weights: dict[int, int],
    k: int = 2,
    out_col: str = "smoothed",
) -> DataFrame:
    """Value-gated scatter smoothing with a reassociation-safe oracle
    story: integer-scaled fixed-point sums.

    Scatter reassociates the weighted sum (partials merge in shuffle
    order), so a float gate could in principle land on the other side
    of a rounding boundary than the oracle's fold. With an INTEGER
    value column and integer-scaled weights the numerator and
    denominator are exact BIGINTs in ANY association (the int-sum mean
    trick from operators/multimodal.py:47-49), and the single final
    division is deterministic — the driver hash gate holds bit-for-bit
    through the scatter plan (Generate → partial agg → ONE exchange at
    cell cardinality → final agg → semi join, same shape as
    :func:`smooth_scatter`). Keep products under 2^62: value_col *
    max(weight) * ring_size bounded — raises if weights are not ints.
    """
    for w in scaled_weights.values():
        if not isinstance(w, int):
            raise TypeError("scaled_weights must be integers (fixed-point)")
    offs = F.array(
        *[
            F.struct(
                F.lit(neighbor_delta(dq, dr)).alias("delta"),
                F.lit(scaled_weights[ring]).alias("w"),
            )
            for dq, dr, ring in kring_offsets(k, include_center=True)
        ]
    )
    contrib = cells.select(
        F.col("cell"),
        F.explode(offs).alias("o"),
        F.col(value_col).cast("long").alias("_v"),
    ).select(
        (F.col("cell") + F.col("o.delta")).alias("cell"),
        F.col("o.w").cast("long").alias("w"),
        "_v",
    )
    agg = contrib.groupBy("cell").agg(
        F.sum(F.col("_v") * F.col("w")).alias("_num"),
        F.sum("w").alias("_den"),
    )
    smoothed = (F.col("_num").cast("double") / F.col("_den").cast("double")).alias(
        out_col
    )
    return agg.join(cells.select("cell"), "cell", "left_semi").select("cell", smoothed)


def smooth_with_stats(cells: DataFrame, plan: SmoothingPlan) -> DataFrame:
    """Like :func:`smooth` but also emits the valid-neighbor count and
    weight mass per cell (useful for validation / lineage)."""
    variables = list(plan.variables)
    edges = kring_edges(cells.select("cell"), plan.k, include_center=True)
    values = cells.select(
        F.col("cell").alias("nbr"),
        *[F.col(v).cast("double").alias(f"_v_{v}") for v in variables],
    )
    joined = edges.join(values, "nbr", "inner").select(
        "cell",
        "ring",
        ring_weight_col(plan.ring_weights).alias("w"),
        *[f"_v_{v}" for v in variables],
    )
    return joined.groupBy("cell").agg(
        *[
            (F.sum(F.col(f"_v_{v}") * F.col("w")) / F.sum("w")).alias(f"smoothed_{v}")
            for v in variables
        ],
        F.sum(F.when(F.col("ring") > 0, 1).otherwise(0)).alias("n_valid_neighbors"),
        F.sum("w").alias("weight_mass"),
    )


def derive_variables(cells: DataFrame, ndvi_col: str = "ndvi") -> DataFrame:
    """P1: the reference's literal derived projections
    (/root/reference/src/cuda/hex_smooth_cuda_v4.cu:359-363)."""
    n = F.col(ndvi_col)
    return cells.withColumns(
        {
            "mndwi": n * 0.9 + 0.05,
            "evi": n * 1.1 - 0.05,
            "ndwi": n * 0.95,
        }
    )


def second_order_edges(cells: DataFrame) -> DataFrame:
    """J2 as a *relational derivation* (parity check for kring ring 2):

    neighbors-of-neighbors via two-hop self-join, excluding self and
    first-order, deduped — the literal transcription of
    ``generateSecondOrderNeighbors``
    (/root/reference/src/cuda/hex_smooth_cuda_v5.cu:423-463). The fast
    path is ``kring_edges(k=2)``; this exists to PROVE they agree (the
    reference's own cross-validation spirit).
    """
    e1 = kring_edges(cells, 1, include_center=False).select("cell", "nbr")
    # keep only edges that land on real cells before hopping again
    real = cells.select(F.col("cell").alias("nbr"))
    e1v = e1.join(real, "nbr", "left_semi")
    hop2 = (
        e1v.alias("a")
        .join(
            e1v.select(F.col("cell").alias("mid"), F.col("nbr").alias("nbr2")).alias("b"),
            F.col("a.nbr") == F.col("b.mid"),
        )
        .select(F.col("a.cell").alias("cell"), F.col("b.nbr2").alias("nbr"))
        .where(F.col("cell") != F.col("nbr"))
        .distinct()
    )
    return hop2.join(e1v, ["cell", "nbr"], "left_anti")


def smooth_residual(cells: DataFrame, plan: SmoothingPlan) -> DataFrame:
    """High-pass detail layer: original − smoothed per cell — the
    complement every smoothing pipeline also wants (the reference's
    smoothing REMOVES detail; the residual IS that detail — anomaly
    spikes, sensor noise, edges). One smoothing pass joined back to
    the originals; the subtraction happens on the RAW smoothed double
    (bit-identical cross-engine, same as the smooth gates) and rounds
    once. Output ``cell`` + ``residual_<var>`` per variable;
    ``smoothing_sql(..., residual=True)`` is the twin builder."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    variables = list(plan.variables)
    sm = smooth(cells, plan)
    return (
        cells.select("cell", *variables)
        .join(sm, "cell")
        .select(
            "cell",
            *[
                round6(
                    F.col(v).cast("double") - F.col(f"smoothed_{v}")
                ).alias(f"residual_{v}")
                for v in variables
            ],
        )
    )


#: range-kernel width for the gated bilateral pass — ndvi lives in
#: (0, 1] on the fixture grid, so 0.1 suppresses neighbors across a
#: >~0.25 value step while barely touching same-plateau smoothing.
BILATERAL_SIGMA = 0.1


def smooth_bilateral(
    cells: DataFrame,
    plan: SmoothingPlan,
    sigma_r: float = BILATERAL_SIGMA,
) -> DataFrame:
    """Edge-preserving (bilateral) smoothing: each neighbor's spatial
    ring weight is multiplied by a Gaussian RANGE kernel
    ``exp(-(v_n - v_c)^2 / (2*sigma_r^2))``, so neighbors across a
    value discontinuity contribute ~nothing — the classic
    edge-preserving denoiser (Tomasi & Manduchi 1998) that the plain
    passes cannot express (they blur edges BY DESIGN; the reference's
    smoothing family stops at fixed ring weights,
    /root/reference/src/cpu/hex_smooth_naive.cpp:65-83 — this is the
    standard extension every raster toolbox ships beside it).

    Same one-join-one-aggregate plan as :func:`smooth` plus ONE extra
    equi-join attaching the CENTER value to each edge row (the range
    kernel needs v_c). Per-variable weights: each fused variable gets
    its OWN range kernel (a hot NDVI edge must not suppress elevation
    smoothing), still a single groupBy — one (sum v*w, sum w) pair per
    variable. Weights are projected to NAMED columns before the
    aggregate (each is referenced twice; the CollapseProject lesson).

    Cross-engine: the kernel inputs are bit-identical doubles (integer
    sums / correctly-rounded divisions), EXP is libm-class <=1 ulp in
    both engines — the same exposure class as the gated ln() in
    doc_logprob; outputs round once through round6. The squared
    difference is written ``(a-b)*(a-b)`` (exact-rounded multiply),
    never POW, and the denominator ``2*sigma_r^2`` is folded ONCE in
    Python so both engines divide by the same literal double.

    Scale (100 TB): identical shuffle profile to :func:`smooth` — the
    extra center-value join shares the ``cell`` key with the final
    aggregate, so AQE/bucketing co-locates it; no new shuffle stage
    when the cell table is bucketed by cell.
    """
    from cuda_gis_smoothing_spark.functions.numeric import round6

    variables = list(plan.variables)
    two_s2 = 2.0 * sigma_r * sigma_r
    edges = kring_edges(cells.select("cell"), plan.k, include_center=True)
    values = cells.select(
        F.col("cell").alias("nbr"),
        *[F.col(v).cast("double").alias(f"_v_{v}") for v in variables],
    )
    centers = cells.select(
        "cell",
        *[F.col(v).cast("double").alias(f"_c_{v}") for v in variables],
    )
    ring_w = ring_weight_col(plan.ring_weights)
    joined = (
        edges.join(values, "nbr", "inner")
        .join(centers, "cell", "inner")
        .select(
            "cell",
            *[F.col(f"_v_{v}") for v in variables],
            *[
                (
                    ring_w
                    * F.exp(
                        -(
                            (F.col(f"_v_{v}") - F.col(f"_c_{v}"))
                            * (F.col(f"_v_{v}") - F.col(f"_c_{v}"))
                        )
                        / F.lit(two_s2)
                    )
                ).alias(f"_w_{v}")
                for v in variables
            ],
        )
    )
    return joined.groupBy("cell").agg(
        *[
            round6(
                F.sum(F.col(f"_v_{v}") * F.col(f"_w_{v}")) / F.sum(f"_w_{v}")
            ).alias(f"bilateral_{v}")
            for v in variables
        ]
    )


def smoothing_sql(
    variant: str,
    variables: Sequence[str],
    dialect: str,
    source: str = "cells",
    with_ctes: str = "",
    residual: bool = False,
    bilateral_sigma: float | None = None,
) -> str:
    """Emit the ANSI-SQL equivalent of :func:`smooth` for a given
    dialect ('spark' | 'duckdb') over a relation named ``source``.

    Shared by the DuckDB oracle (driver correctness gate) and by tests;
    the literal weight constants guarantee both engines fold the same
    doubles. ``with_ctes`` prepends extra CTEs (e.g. the testdata grid
    derivation).
    """
    from cuda_gis_smoothing_spark.hexgrid import ENC
    from cuda_gis_smoothing_spark.oracle import VARIANTS

    weights = VARIANTS[variant]
    k = 2 if variant.endswith("_k2") else 1
    offs = kring_offsets(k, include_center=True)
    rows = ",\n    ".join(
        f"({dq * ENC + dr}, {ring})" for dq, dr, ring in offs
    )
    from cuda_gis_smoothing_spark.functions.numeric import flit

    wcase = "CASE " + " ".join(
        f"WHEN o.ring = {ring} THEN {flit(w)}" for ring, w in sorted(weights.items())
    ) + " END"
    if bilateral_sigma is not None:
        # per-variable weight: ring weight x Gaussian range kernel on
        # the center/neighbor value gap (smooth_bilateral's twin) —
        # (a-b)*(a-b) not POW, denominator folded once in Python
        two_s2 = 2.0 * bilateral_sigma * bilateral_sigma

        def wvar(v: str) -> str:
            return (
                f"({wcase}) * EXP(-((n.{v} - c.{v}) * (n.{v} - c.{v}))"
                f" / {flit(two_s2)})"
            )

        aggs = ",\n  ".join(
            f"ROUND((SUM(n.{v} * {wvar(v)}) / SUM({wvar(v)})) + 1e-09, 6)"
            f" AS bilateral_{v}"
            for v in variables
        )
    elif residual:
        # high-pass detail layer: original − smoothed, subtracted RAW
        # then rounded once (MAX over the per-cell group is the
        # constant center value — both engines aggregate it the same)
        aggs = ",\n  ".join(
            f"ROUND((MAX(c.{v}) - SUM(n.{v} * {wcase}) / SUM({wcase})) + 1e-09, 6) AS residual_{v}"
            for v in variables
        )
    else:
        aggs = ",\n  ".join(
            f"ROUND((SUM(n.{v} * {wcase}) / SUM({wcase})) + 1e-09, 6) AS smoothed_{v}"
            for v in variables
        )
    values = "VALUES\n    " + rows
    if dialect == "spark":
        offsets_cte = f"offsets (delta, ring) AS (SELECT * FROM ({values}) AS t(delta, ring))"
    else:
        offsets_cte = f"offsets (delta, ring) AS ({values})"
    pre = f"{with_ctes}," if with_ctes else ""
    return f"""
WITH {pre}
{offsets_cte}
SELECT
  c.cell AS cell,
  {aggs}
FROM {source} c
CROSS JOIN offsets o
JOIN {source} n ON n.cell = c.cell + o.delta
GROUP BY c.cell
""".strip()


# -- IDW gap filling ------------------------------------------------------

IDW_MIN_CONTRIBUTORS = 3


def idw_fill(
    cells: DataFrame,
    variables: Sequence[str] = ("ndvi",),
    k: int = 2,
    min_contributors: int = IDW_MIN_CONTRIBUTORS,
) -> DataFrame:
    """Inverse-distance-weighted gap filling: estimate a value for
    every ABSENT cell that has at least ``min_contributors`` present
    cells inside its k-ring, as the 1/ring weighted mean of those
    neighbors — the interpolation stage a real raster pipeline runs
    BEFORE the reference's smoothing passes (sensor dropouts / cloud
    masks leave holes the smoother would otherwise propagate around).
    The reference stops at smoothing present cells
    (/root/reference/src/cpu/hex_smooth_naive.cpp:48-63); this is the
    standard companion the same toolboxes ship.

    Candidate holes are derived, never enumerated: k-ring offsets are
    SYMMETRIC, so "present cells in the hole's k-ring" == "holes in a
    present cell's k-ring" — one explode of the present table gives
    (hole, contributor, ring) rows, one LEFT ANTI join against the
    present table drops non-holes, one aggregate computes the
    estimate. Weights 1/1 and 1/2 are exact doubles; outputs round6.
    The ``min_contributors`` floor (>= 3 by default) stops wild
    single-neighbor extrapolation at the raster border.

    Scale (100 TB): explode fans out 18x then collapses in a map-side-
    combining aggregate keyed on the hole cell; the anti-join is a
    hash equi-join on the same key. No window, no collect.
    """
    from cuda_gis_smoothing_spark.functions.numeric import round6

    variables = list(variables)
    edges = kring_edges(cells.select("cell"), k, include_center=False)
    vals = cells.select(
        F.col("cell").alias("_src"),
        *[F.col(v).cast("double").alias(f"_v_{v}") for v in variables],
    )
    contrib = (
        edges.select(
            F.col("nbr").alias("hole"),
            F.col("cell").alias("_src"),
            (F.lit(1.0) / F.col("ring")).alias("_w"),
        )
        .join(
            cells.select(F.col("cell").alias("hole")), "hole", "left_anti"
        )
        .join(vals, "_src", "inner")
    )
    out = contrib.groupBy("hole").agg(
        F.count(F.lit(1)).cast("long").alias("n_contributors"),
        *[
            round6(F.sum(F.col(f"_v_{v}") * F.col("_w")) / F.sum("_w")).alias(
                f"idw_{v}"
            )
            for v in variables
        ],
    )
    return out.where(F.col("n_contributors") >= min_contributors).select(
        F.col("hole").alias("cell"), "n_contributors",
        *[f"idw_{v}" for v in variables],
    )


def idw_fill_sql(
    variables: Sequence[str] = ("ndvi",),
    k: int = 2,
    min_contributors: int = IDW_MIN_CONTRIBUTORS,
    source: str = "cells",
    with_ctes: str = "",
) -> str:
    """DuckDB twin of :func:`idw_fill` (same literal offsets/weights)."""
    from cuda_gis_smoothing_spark.hexgrid import ENC

    offs = kring_offsets(k, include_center=False)
    rows = ",\n    ".join(f"({dq * ENC + dr}, {ring})" for dq, dr, ring in offs)
    aggs = ",\n  ".join(
        f"ROUND((SUM(c.{v} * (1.0 / o.ring)) / SUM(1.0 / o.ring)) + 1e-09, 6)"
        f" AS idw_{v}"
        for v in variables
    )
    pre = f"{with_ctes}," if with_ctes else ""
    return f"""
WITH {pre}
offsets (delta, ring) AS (VALUES
    {rows}),
est AS (
  SELECT c.cell + o.delta AS cell,
         CAST(COUNT(*) AS BIGINT) AS n_contributors,
  {aggs}
  FROM {source} c CROSS JOIN offsets o
  WHERE NOT EXISTS (
    SELECT 1 FROM {source} p WHERE p.cell = c.cell + o.delta
  )
  GROUP BY c.cell + o.delta
)
SELECT * FROM est WHERE n_contributors >= {int(min_contributors)}
""".strip()
