"""D6 flow routing over the hex value surface — the hydrology family
of classic raster GIS (steepest-descent flow direction, drainage-basin
delineation, flow accumulation), grafted onto the reference's ring-1
hex adjacency (src/cuda/hex_smooth_cuda_v4.cu:118-214 builds the same
6-neighbor CSR; the reference smooths over it, this ROUTES over it).

All three operators are twin-exact by construction:

* ``flow_direction`` — the steepest-descent neighbor is simply the
  ring-1 neighbor with the MINIMUM value (the per-cell drop x_c − x_n
  is maximized where x_n is minimized), so the argmax is one
  ``min(struct(value, id))`` over exact parquet-derived doubles with an
  integer tie-break (the majority_filter struct-MIN precedent) — no
  float arithmetic enters the comparison beyond bit-identical values.
* ``watershed_basins`` — strict descent makes the flow graph an
  ACYCLIC functional forest, so each undirected component holds exactly
  one sink (edges = nodes − sinks per component; connectivity forces
  sinks ≤ 1): basins are connected components, computed by the shared
  :func:`operators.dedup.star_components` core (third graph domain
  beside near-dup fingerprints and ndvi patches was raster patches;
  this is the fourth).
* ``flow_accumulation`` — the FULL upslope count (1 + number of cells
  whose flow path reaches the cell), not a bounded-hop approximation:
  transitive descendant pairs by relation squaring (P ← P ∪ P∘P,
  O(log L) rounds for longest flow path L — on a continental DEM L is
  thousands of cells, so the log-round shape is the one that survives
  100 TB; the per-round pair mass Σ path lengths is inherent to the
  closure). Counts are integers, so the gate is tie-proof.

DuckDB twins share ONE CTE builder (:func:`flow_ctes` — the
_span_ctes/_session_ctes drift-prevention class): the flow_direction
window ``ORDER BY (n.value ASC, n.cell ASC)`` is a TOTAL order per
cell (neighbor ids are unique), satisfying the cross-engine window
rule; the closure twins are recursive CTEs over the same ``fd`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cuda_gis_smoothing_spark.hexgrid import ENC, RING1_OFFSETS

#: ring-1 packed-cell deltas (the _R1 list of the entry twins)
R1_DELTAS: tuple[int, ...] = tuple(dq * ENC + dr for dq, dr in RING1_OFFSETS)


def flow_direction(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Per-cell steepest-descent routing: ``flow_to`` = the strictly
    lower ring-1 neighbor of minimum value (tie-break smallest cell
    id), NULL for sinks (no strictly lower neighbor — flats are sinks,
    the plain D8 convention without flat resolution); ``descent`` =
    the drop to that neighbor (0 for sinks). Cells with no valid
    neighbor at all (isolated holes) are sinks. Output
    ``(cell, flow_to, descent)`` over every input cell.

    Plan (100 TB): one ring-1 explode + equi-join + one struct-MIN
    aggregate + one cell-keyed join — the smooth() shuffle shape, no
    window sort."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    vals = cells.select("cell", F.col(value_col).cast("double").alias("_x"))
    offs = F.array(*[F.lit(d) for d in R1_DELTAS])
    e = vals.select("cell", F.explode(offs).alias("_d")).select(
        "cell", (F.col("cell") + F.col("_d")).alias("nbr")
    )
    nb = e.join(
        vals.select(F.col("cell").alias("nbr"), F.col("_x").alias("_xn")), "nbr"
    )
    best = nb.groupBy("cell").agg(
        F.min(F.struct(F.col("_xn").alias("xn"), F.col("nbr").alias("nbr"))).alias(
            "_m"
        )
    )
    return (
        vals.join(best, "cell", "left")
        .select(
            "cell",
            F.when(F.col("_m.xn") < F.col("_x"), F.col("_m.nbr")).alias("flow_to"),
            round6(
                F.greatest(
                    F.col("_x") - F.coalesce(F.col("_m.xn"), F.col("_x")),
                    F.lit(0.0),
                )
            ).alias("descent"),
        )
    )


def watershed_basins(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Drainage-basin delineation: label each connected component of
    the (undirected) flow forest — exactly one sink per basin, see the
    module docstring — and report ``(basin, n_cells, sink_cell,
    sink_value)`` with ``basin`` = the component's minimum cell id
    (the star-CC label contract)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.dedup import star_components

    # two differently-pruned consumers (CC edges + the sink rows) —
    # checkpoint the derived table (the multi-consumer re-execute class)
    fd = flow_direction(cells, value_col).localCheckpoint()
    edges = fd.where(F.col("flow_to").isNotNull()).select(
        F.col("cell").alias("a"), F.col("flow_to").alias("b")
    )
    labels = star_components(edges, cells.select("cell"), "cell")
    vals = cells.select("cell", F.col(value_col).cast("double").alias("_x"))
    sinks = (
        fd.where(F.col("flow_to").isNull())
        .select("cell")
        .join(labels, "cell")
        .join(vals, "cell")
        .select(
            F.col("component").alias("basin"),
            F.col("cell").alias("sink_cell"),
            round6(F.col("_x")).alias("sink_value"),
        )
    )
    sizes = labels.groupBy(F.col("component").alias("basin")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cells")
    )
    return sizes.join(sinks, "basin").select(
        "basin", "n_cells", "sink_cell", "sink_value"
    )


def flow_accumulation(
    cells: DataFrame, value_col: str = "ndvi", max_rounds: int = 16
) -> DataFrame:
    """Full flow accumulation: ``upslope_cells`` = 1 + the number of
    cells whose (strictly descending, hence finite and acyclic) flow
    path reaches the cell. Transitive descendant pairs by relation
    squaring — each round at most doubles the covered path length, so
    convergence takes ceil(log2 L) + 1 rounds; raises if ``max_rounds``
    (paths up to 2**max_rounds) is exceeded. Output
    ``(cell, upslope_cells)`` over every input cell."""
    edges = (
        flow_direction(cells, value_col)
        .where(F.col("flow_to").isNotNull())
        .select(F.col("cell").alias("src"), F.col("flow_to").alias("dst"))
        .localCheckpoint()
    )
    pairs = edges
    n = pairs.count()
    converged = False
    for _ in range(max_rounds):
        hop = pairs.join(
            pairs.select(F.col("src").alias("dst"), F.col("dst").alias("_d2")),
            "dst",
        ).select("src", F.col("_d2").alias("dst"))
        nxt = pairs.union(hop).distinct().localCheckpoint()
        m = nxt.count()
        pairs = nxt
        if m == n:
            converged = True
            break
        n = m
    if not converged:
        raise RuntimeError(
            f"flow_accumulation did not converge in {max_rounds} rounds"
        )
    acc = pairs.groupBy("dst").agg(F.count(F.lit(1)).alias("_n"))
    return (
        cells.select("cell")
        .join(acc, cells["cell"] == acc["dst"], "left")
        .select(
            "cell",
            (F.lit(1) + F.coalesce(F.col("_n"), F.lit(0)))
            .cast("long")
            .alias("upslope_cells"),
        )
    )


def flow_ctes(source: str = "cells4", value_col: str = "ndvi") -> str:
    """The ONE DuckDB CTE builder for the family (drift-prevention
    class): emits ``f_offsets`` / ``fnb`` / ``fd`` CTE text, ``fd``
    being the exact twin of :func:`flow_direction` (columns cell,
    flow_to, descent_raw — callers round). Compose inside a caller's
    WITH list after the cells CTEs."""
    vals = ", ".join(f"({d})" for d in R1_DELTAS)
    return f"""
f_offsets (delta) AS (VALUES {vals}),
fnb AS (
  SELECT c.cell, c.{value_col} AS x, n.{value_col} AS xn, n.cell AS nbr,
         ROW_NUMBER() OVER (PARTITION BY c.cell ORDER BY n.{value_col} ASC, n.cell ASC) AS rk
  FROM {source} c CROSS JOIN f_offsets o
  JOIN {source} n ON n.cell = c.cell + o.delta
),
fd AS (
  SELECT c.cell,
         CASE WHEN b.xn < b.x THEN b.nbr END AS flow_to,
         GREATEST(c.{value_col} - COALESCE(b.xn, c.{value_col}), 0e0) AS descent_raw
  FROM {source} c LEFT JOIN (SELECT * FROM fnb WHERE rk = 1) b ON b.cell = c.cell
)
""".strip()
