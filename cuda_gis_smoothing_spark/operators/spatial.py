"""Spatial operators: raster-tile materialization, point-in-polygon,
kNN via cell-covering + local refine (BASELINE.json north_star).

The reference has no vector-spatial operators; these are the
graft-mandated additions. Cell→tile math reuses the reference's
"integer id → 2D coordinate" decode idea
(/root/reference/src/cuda/hex_smooth_cuda_v5.cu:42-47) but projects the
hex centroid to Web-Mercator slippy tiles. Tile/cell assignments are
INTEGER invariants (bit-for-bit, BASELINE.json north_star), so the
expression is emitted once as SQL text and evaluated by both Spark
(``F.expr``) and the DuckDB oracle — identical shape, identical literal
constants, with a round-before-floor guard against last-ulp libm
differences between JVM and C math.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from cuda_gis_smoothing_spark.hexgrid import ENC, OFFSET, GridSpec

_G = GridSpec()
_SQRT3 = 1.7320508075688772
_PI = 3.141592653589793
_COS0 = math.cos(math.radians(_G.origin_lat))


def centroid_sql(cell_expr: str, dialect: str) -> tuple[str, str]:
    """(lat, lon) centroid of a packed cell id as SQL text.

    Every float literal goes through ``flit`` (exponent notation):
    DuckDB would otherwise run literal-heavy subexpressions in DECIMAL
    arithmetic and silently truncate (Spark parses the same literal as
    DOUBLE) — integer outputs survive that, tie-sensitive ones don't.
    """
    from cuda_gis_smoothing_spark.functions.numeric import flit

    idiv = "DIV" if dialect == "spark" else "//"
    q = f"(({cell_expr}) {idiv} {ENC} - {OFFSET})"
    r = f"(({cell_expr}) % {ENC} - {OFFSET})"
    x = f"({flit(_G.size_deg)} * ({flit(_SQRT3)} * ({q} + {r} / 2e0)))"
    lat = f"({flit(_G.size_deg)} * {flit(1.5)} * {r} + {flit(_G.origin_lat)})"
    lon = f"({x} / {flit(_COS0)} + {flit(_G.origin_lon)})"
    return lat, lon


def hex_distance_sql(a_expr: str, b_expr: str, dialect: str) -> str:
    """Integer axial hex distance between two packed cell ids as SQL
    text — the ONE builder for both engines (drift prevention). The
    OFFSET cancels in the coordinate differences, the |dq|+|dr|+|dq+dr|
    sum is always even and non-negative, so floor-div by 2 is exact
    and Spark ``div`` == DuckDB ``//``."""
    idiv = "DIV" if dialect == "spark" else "//"
    dq = f"(({a_expr}) {idiv} {ENC} - ({b_expr}) {idiv} {ENC})"
    dr = f"(({a_expr}) % {ENC} - ({b_expr}) % {ENC})"
    return f"((abs({dq}) + abs({dr}) + abs({dq} + {dr})) {idiv} 2)"


def tile_sql(cell_expr: str, zoom: int, dialect: str) -> tuple[str, str]:
    """(tile_x, tile_y) SQL text for the cell centroid at ``zoom``."""
    from cuda_gis_smoothing_spark.functions.numeric import flit

    lat, lon = centroid_sql(cell_expr, dialect)
    n = 1 << zoom
    pi = flit(_PI)
    # +1e-9 before FLOOR: both engines see the same double, so any
    # last-ulp libm difference at an integer boundary lands the same side
    tx = f"CAST(FLOOR((({lon} + 18e1) / 36e1 * {n}) + 1e-09) AS INT)"
    lat_rad = f"({lat} * {pi} / 18e1)"
    ty = (
        f"CAST(FLOOR(((1e0 - LN(TAN({lat_rad}) + 1e0 / COS({lat_rad})) / {pi}) "
        f"/ 2e0 * {n}) + 1e-09) AS INT)"
    )
    return tx, ty


def tile_assignment(cells: DataFrame, zoom: int = 12, cell_col: str = "cell") -> DataFrame:
    """Raster-tile materialization: cell → (tile_x, tile_y, zoom).

    Pure column math — at 100 TB this is a projection fused into the
    scan, no shuffle at all; the downstream ``groupBy(tile)`` is the
    only exchange.
    """
    tx, ty = tile_sql(cell_col, zoom, "spark")
    return cells.select(
        F.col(cell_col).alias("cell"),
        F.expr(tx).alias("tile_x"),
        F.expr(ty).alias("tile_y"),
        F.lit(zoom).alias("zoom"),
    )


def tile_histogram(cells: DataFrame, zoom: int = 12) -> DataFrame:
    """Cells per tile — the materialization driver's work list."""
    return (
        tile_assignment(cells, zoom)
        .groupBy("tile_x", "tile_y", "zoom")
        .agg(F.count("*").alias("n_cells"))
    )


def tile_pyramid(cells: DataFrame, zooms: tuple[int, ...] = (10, 11, 12)) -> DataFrame:
    """Multi-zoom tile rollup (the hypertable-rollup analog): cell
    counts per tile at every zoom level in one DataFrame.

    Parent tiles are exact halvings of child coordinates, so the rollup
    could also be computed bottom-up (child>>1); we derive each level
    from the cell centroid directly, which keeps every level an
    independent projection of the SAME scan — Catalyst evaluates all
    zoom expressions in one pass over a single exchange per level.
    """
    per_zoom = [tile_histogram(cells, z) for z in zooms]
    out = per_zoom[0]
    for p in per_zoom[1:]:
        out = out.unionByName(p)
    return out


def coarse_cell_expr(factor: int, cell_col: str = "cell"):
    """The ONE coarse-key derivation shared by :func:`grid_downsample`
    and the maintained pyramid's affected-set projection (drift
    prevention: if they diverged, the restricted recompute would miss
    coarse cells). Packed q/r are non-negative by the OFFSET contract,
    so truncating and floor division agree cross-engine."""
    q = (F.col(cell_col) / ENC).cast("long")
    r = F.col(cell_col) % ENC
    return (q / factor).cast("long") * ENC + (r / factor).cast("long")


def grid_downsample(
    cells: DataFrame,
    factor: int = 2,
    value_col: str = "ndvi",
    restrict_to: DataFrame | None = None,
) -> DataFrame:
    """Raster pyramid/overview level on the hex grid itself (the
    :func:`tile_pyramid` sibling in axial space): aggregate cells by
    an integer ``factor`` — coarse q/r = packed q/r // factor. Both
    packed components are NON-NEGATIVE by the OFFSET packing contract
    (hexgrid.py), so truncating and floor division agree and the
    double-division-then-cast quotient cannot cross an integer
    boundary (error ~1e-12 vs a gap ≥ 1/factor). Mean goes through
    round6 over ≤ factor² members (the focal_stats class); min/max
    cross raw. Output ``(coarse_cell, n_cells, mean_value, min_value,
    max_value)``.

    ``restrict_to`` (a DataFrame with a ``coarse_cell`` column) limits
    the recompute to those coarse cells — the IncrementalPyramid
    per-batch path: fine rows are semi-joined on their DERIVED coarse
    key before the aggregate, so per-batch work is
    O(affected × factor²), not O(grid).

    Plan (100 TB): ONE map-side-combinable hash aggregate per level —
    the overview-building shape (each pyramid level is a groupBy of
    the level below; no joins, no windows)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    v = F.col(value_col).cast("double")
    src = cells.select(
        coarse_cell_expr(factor).alias("coarse_cell"), v.alias("_v")
    )
    if restrict_to is not None:
        src = src.join(
            restrict_to.select("coarse_cell"), "coarse_cell", "left_semi"
        )
    return (
        src.groupBy("coarse_cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            round6(F.avg("_v")).alias("mean_value"),
            F.min("_v").alias("min_value"),
            F.max("_v").alias("max_value"),
        )
    )


def boundary_distance_sql(boundaries_pdf) -> str:
    """Min point-to-segment distance to any region boundary, as ONE
    SQL expression over projected columns ``px``/``py`` (px = lon·cosφ₀
    — the knn metric's equirectangular scaling; py = lat) — emitted
    once and evaluated by BOTH Spark (``F.expr``) and DuckDB (the
    centroid_sql/tile_sql single-text precedent, so the two engines
    compute the IDENTICAL correctly-rounded expression and the LEAST
    over segments cannot diverge). All per-segment constants (scaled
    vertices, deltas, squared lengths, the clamped projection's
    divisor) are Python-folded literals; the per-row math is pure
    mul/add/div/sqrt + LEAST/GREATEST."""
    from cuda_gis_smoothing_spark.functions.numeric import flit

    d2s = []
    for row in boundaries_pdf.itertuples():
        ring = [(p[0] * _COS0, p[1]) for p in row.ring_xy]
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            dx, dy = x2 - x1, y2 - y1
            len2 = dx * dx + dy * dy
            # expanded form |PA|² − 2t·(PA·D) + t²|D|² keeps each
            # subterm referenced at most 3× (the inline-repetition
            # lesson); GREATEST(…, 0) guards the cancellation-rounding
            # negative that would SQRT to NaN
            pax = f"(px - {flit(x1)})"
            pay = f"(py - {flit(y1)})"
            dot = f"({pax} * {flit(dx)} + {pay} * {flit(dy)})"
            t = f"LEAST(GREATEST({dot} / {flit(len2)}, 0e0), 1e0)"
            d2s.append(
                f"GREATEST({pax} * {pax} + {pay} * {pay}"
                f" - 2e0 * {t} * {dot} + {t} * {t} * {flit(len2)}, 0e0)"
            )
    return f"SQRT(LEAST({', '.join(d2s)}))"


def pip_region_sql(lat_expr: str, lon_expr: str, boundaries_pdf) -> str:
    """First-containing-region id as a SQL CASE over literal polygons.

    Even-odd ray casting unrolled per edge — the same arithmetic (same
    literal vertices, same crossing formula) as the vectorized UDF in
    :func:`point_in_polygon`, so both engines agree except on exact
    boundary points (measure zero). Used by the DuckDB oracle gate.
    """
    from cuda_gis_smoothing_spark.functions.numeric import flit

    branches = []
    for row in boundaries_pdf.itertuples():
        ring = [(float(p[0]), float(p[1])) for p in row.ring_xy]
        terms = []
        n = len(ring)
        for i in range(n):
            x1, y1 = (flit(v) for v in ring[i])
            x2, y2 = (flit(v) for v in ring[(i + 1) % n])
            cross = (
                f"(CASE WHEN (({y1} > {lat_expr}) <> ({y2} > {lat_expr})) "
                f"AND ({lon_expr} < ({x2} - {x1}) * ({lat_expr} - {y1}) "
                f"/ ({y2} - {y1}) + {x1}) THEN 1 ELSE 0 END)"
            )
            terms.append(cross)
        inside = "(" + " + ".join(terms) + ") % 2 = 1"
        branches.append(f"WHEN {inside} THEN '{row.region_id}'")
    return "CASE " + " ".join(branches) + " ELSE NULL END"


# --- point-in-polygon ---------------------------------------------------------
def point_in_polygon(
    points: DataFrame,
    boundaries_pdf: pd.DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Tag each point with the region containing it (or null).

    The boundary table is tiny (vector polygons) → it ships to every
    executor as a plain broadcast variable; the test is a vectorized
    numpy ray-casting inside ONE Arrow-batched pandas UDF with a bbox
    prefilter. No join, no shuffle — the 100 TB point side streams
    through map-side only.
    """
    spark = points.sparkSession
    polys = [
        (
            str(row.region_id),
            np.asarray([(p[0], p[1]) for p in row.ring_xy], dtype=np.float64),
        )
        for row in boundaries_pdf.itertuples()
    ]
    bc = spark.sparkContext.broadcast(
        [
            (rid, ring, ring[:, 0].min(), ring[:, 0].max(), ring[:, 1].min(), ring[:, 1].max())
            for rid, ring in polys
        ]
    )

    @F.pandas_udf(T.StringType())
    def _tag(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la = lat.to_numpy(dtype=np.float64)
        lo = lon.to_numpy(dtype=np.float64)
        out = np.full(len(la), None, dtype=object)
        unassigned = np.ones(len(la), dtype=bool)
        for rid, ring, x0, x1, y0, y1 in bc.value:
            cand = unassigned & (lo >= x0) & (lo <= x1) & (la >= y0) & (la <= y1)
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            inside = _ray_cast(lo[idx], la[idx], ring)
            hit = idx[inside]
            out[hit] = rid
            unassigned[hit] = False
        return pd.Series(out)

    return points.withColumn("region_id", _tag(F.col(lat_col), F.col(lon_col)))


def _ray_cast(lon: np.ndarray, lat: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting; same semantics as oracle.point_in_polygon."""
    inside = np.zeros(len(lon), dtype=bool)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        crosses = (y1 > lat) != (y2 > lat)
        if not crosses.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        inside ^= crosses & (lon < xin)
    return inside


# --- kNN: covering cells + local refine ----------------------------------------
def knn(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    ring: int = 2,
    id_col: str = "image_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """k nearest points per query via cell covering + window refine.

    Candidate generation joins each query's k-ring-``ring`` covering
    cells against the (cell-bucketed) point table — an equi join that
    broadcasts the (small) query side; exact distance + window rank
    refine locally. Points/queries need (cell, lat, lon) columns.

    At 100 TB the covering join touches only the partitions holding the
    query neighborhoods (partition pruning on cell), never the full
    point table; ``ring`` trades recall for candidate count and should
    grow until ≥k candidates per query (caller-controlled).
    """
    from cuda_gis_smoothing_spark.operators.smoothing import kring_edges

    cover = kring_edges(
        queries.select(F.col("cell")).distinct(), ring, include_center=True
    ).select(F.col("cell").alias("qcell"), F.col("nbr").alias("cell"))
    qside = queries.select(
        F.col(query_id_col),
        F.col("cell").alias("qcell"),
        F.col("lat").alias("qlat"),
        F.col("lon").alias("qlon"),
    ).join(F.broadcast(cover), "qcell")

    cand = (
        points.select(id_col, "cell", "lat", "lon")
        .join(F.broadcast(qside), "cell")
        .where(F.col(id_col) != F.col(query_id_col))  # self-exclusion
    )

    d2 = (
        (F.col("lat") - F.col("qlat")) * (F.col("lat") - F.col("qlat"))
        + (F.col("lon") - F.col("qlon")) * (F.col("lon") - F.col("qlon")) * (_COS0 * _COS0)
    ).alias("d2")
    ranked = cand.select(query_id_col, id_col, d2).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(query_id_col).orderBy(F.col("d2").asc(), F.col(id_col).asc())
        ),
    )
    return ranked.where(F.col("rank") <= k).select(
        query_id_col, id_col, "rank", F.round(F.sqrt("d2"), 9).alias("dist_deg")
    )


def grid_upsample(
    cells: DataFrame, factor: int = 2, value_col: str = "ndvi"
) -> DataFrame:
    """Overview→detail serve completing the pyramid family: each fine
    cell joined back to its :func:`grid_downsample` parent plus the
    residual ``value − parent mean`` (the detail layer a pyramid
    renderer blends — the smooth_residual_k2 high-pass idea at the
    pyramid scale). The parent key is the same truncating coarse
    derivation (non-negative packing makes it floor division — the
    grid_downsample contract); residual subtracts a round6'd mean from
    a raw value, one correctly-rounded op under round6. Output
    ``(cell, coarse_cell, value, coarse_mean, residual)``.

    Plan (100 TB): the coarse aggregate (grid/factor² rows) broadcasts
    against the fine table — one map-side join, no shuffle of the
    detail level."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    coarse = grid_downsample(cells, factor, value_col).select(
        "coarse_cell", F.col("mean_value").alias("coarse_mean")
    )
    fine = cells.select(
        "cell",
        coarse_cell_expr(factor).alias("coarse_cell"),
        round6(F.col(value_col).cast("double")).alias("value"),
    )
    return fine.join(F.broadcast(coarse), "coarse_cell").select(
        "cell",
        "coarse_cell",
        "value",
        "coarse_mean",
        round6(F.col("value") - F.col("coarse_mean")).alias("residual"),
    )


def zonal_stats(cells: DataFrame, boundaries_pdf, value_col: str = "ndvi") -> DataFrame:
    """Zonal statistics over a (cell, value) surface: broadcast PIP
    region tag (vectorized ray-cast, no shuffle on the cell side) +
    one region-keyed aggregate; cells outside every polygon form the
    NULL zone (kept — it IS the coverage-gap headline). Extracted from
    the gate body so the maintained serving path
    (IncrementalSmoother.zonal_stats) runs the IDENTICAL kernel (the
    shared-kernel drift-prevention class). min/max cross the gate as
    RAW doubles (association-order-free); the mean is the focal_stats
    mean contract."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    lat, lon = centroid_sql("cell", "spark")
    pts = cells.select(
        "cell",
        F.col(value_col),
        F.expr(lat).alias("lat"),
        F.expr(lon).alias("lon"),
    )
    tagged = point_in_polygon(pts, boundaries_pdf)
    return tagged.groupBy("region_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        round6(F.avg(value_col)).alias(f"mean_{value_col}"),
        F.min(value_col).alias(f"min_{value_col}"),
        F.max(value_col).alias(f"max_{value_col}"),
    )
