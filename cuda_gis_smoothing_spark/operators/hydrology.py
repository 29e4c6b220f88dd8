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

Built on those cores: ``flow_path_length`` (steps-to-sink + terminal
cell — both integers/ids, tie-proof), ``basin_stats`` (zonal
statistics over the DERIVED basin partition — the zonal_stats pattern
with the polygon replaced by the flow partition; min/max raw,
mean/relief round6 per the focal_stats precedent) and ``twi``
(topographic wetness ln(a / (tanβ + ε)) — integer upslope count over
the unrounded central-difference gradient; ln is the doc_logprob
≤1-ulp class, safe under round6).

DuckDB twins share ONE CTE builder per layer (:func:`flow_ctes` for
``fd``, :func:`flow_closure_ctes` for the directed closure,
:func:`flow_component_ctes` for the undirected components — the
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


def flow_direction(
    cells: DataFrame,
    value_col: str = "ndvi",
    restrict_to: DataFrame | None = None,
) -> DataFrame:
    """Per-cell steepest-descent routing: ``flow_to`` = the strictly
    lower ring-1 neighbor of minimum value (tie-break smallest cell
    id), NULL for sinks (no strictly lower neighbor — flats are sinks,
    the plain D8 convention without flat resolution); ``descent`` =
    the drop to that neighbor (0 for sinks). Cells with no valid
    neighbor at all (isolated holes) are sinks. Output
    ``(cell, flow_to, descent)`` over every input cell.

    ``restrict_to`` (a DataFrame with a ``cell`` column) limits the
    OUTPUT to those cells while neighbor values still come from the
    full ``cells`` table — the smooth(restrict_to=...) geometric
    gather: ring-1 edges are generated from the restricted set alone,
    so the per-call work is O(restricted × ring), not O(grid) (the
    IncrementalFlowRouter per-batch path).

    Plan (100 TB): one ring-1 explode + equi-join + one struct-MIN
    aggregate + one cell-keyed join — the smooth() shuffle shape, no
    window sort."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    vals = cells.select("cell", F.col(value_col).cast("double").alias("_x"))
    src = vals
    if restrict_to is not None:
        # intersect: a key in restrict_to absent from the grid must
        # not fabricate a row
        src = vals.join(restrict_to.select("cell"), "cell", "left_semi")
    offs = F.array(*[F.lit(d) for d in R1_DELTAS])
    e = src.select("cell", F.explode(offs).alias("_d")).select(
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
        src.join(best, "cell", "left")
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


def basin_labels(
    cells: DataFrame, value_col: str = "ndvi", fd: DataFrame | None = None
) -> DataFrame:
    """Per-cell drainage-basin label ``(cell, basin)`` — connected
    components of the undirected flow forest, ``basin`` = the
    component's minimum cell id (the star-CC label contract). Pass a
    pre-checkpointed ``fd`` to share the flow-direction derivation with
    a sibling consumer (the multi-consumer re-execute class)."""
    from cuda_gis_smoothing_spark.operators.dedup import star_components

    if fd is None:
        fd = flow_direction(cells, value_col).localCheckpoint()
    edges = fd.where(F.col("flow_to").isNotNull()).select(
        F.col("cell").alias("a"), F.col("flow_to").alias("b")
    )
    return star_components(edges, cells.select("cell"), "cell").select(
        "cell", F.col("component").alias("basin")
    )


def watershed_basins(
    cells: DataFrame, value_col: str = "ndvi", fd: DataFrame | None = None
) -> DataFrame:
    """Drainage-basin delineation: label each connected component of
    the (undirected) flow forest — exactly one sink per basin, see the
    module docstring — and report ``(basin, n_cells, sink_cell,
    sink_value)`` with ``basin`` = the component's minimum cell id
    (the star-CC label contract). Pass a pre-checkpointed ``fd`` to
    share the flow-direction derivation with a sibling consumer."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    # two differently-pruned consumers (CC edges + the sink rows) —
    # checkpoint the derived table (the multi-consumer re-execute class)
    if fd is None:
        fd = flow_direction(cells, value_col).localCheckpoint()
    labels = basin_labels(cells, value_col, fd=fd).withColumnRenamed(
        "basin", "component"
    )
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


def descendant_pairs(edges: DataFrame, max_rounds: int = 16) -> DataFrame:
    """Transitive closure of a DAG's ``(src, dst)`` edge set by
    relation squaring — each round at most doubles the covered path
    length, so convergence takes ceil(log2 L) + 1 rounds for longest
    path L; raises if ``max_rounds`` (paths up to 2**max_rounds) is
    exceeded. Shared by every flow-closure consumer (accumulation,
    path length, wetness index)."""
    pairs = edges.select("src", "dst").localCheckpoint()
    n = pairs.count()
    for _ in range(max_rounds):
        hop = pairs.join(
            pairs.select(F.col("src").alias("dst"), F.col("dst").alias("_d2")),
            "dst",
        ).select("src", F.col("_d2").alias("dst"))
        nxt = pairs.union(hop).distinct().localCheckpoint()
        m = nxt.count()
        pairs = nxt
        if m == n:
            return pairs
        n = m
    raise RuntimeError(f"flow closure did not converge in {max_rounds} rounds")


def _flow_edges(
    cells: DataFrame, value_col: str, fd: DataFrame | None = None
) -> DataFrame:
    """Directed flow edges ``(src, dst)`` (sinks absent). NOT
    checkpointed here — :func:`descendant_pairs` checkpoints its input
    once (a second one would double-materialize; review catch). Pass a
    pre-checkpointed ``fd`` to share the flow-direction derivation
    with sibling consumers."""
    src = fd if fd is not None else flow_direction(cells, value_col)
    return src.where(F.col("flow_to").isNotNull()).select(
        F.col("cell").alias("src"), F.col("flow_to").alias("dst")
    )


def flow_accumulation(
    cells: DataFrame,
    value_col: str = "ndvi",
    max_rounds: int = 16,
    fd: DataFrame | None = None,
) -> DataFrame:
    """Full flow accumulation: ``upslope_cells`` = 1 + the number of
    cells whose (strictly descending, hence finite and acyclic) flow
    path reaches the cell. Closure by :func:`descendant_pairs`; counts
    are integers, so the gate is tie-proof. Output
    ``(cell, upslope_cells)`` over every input cell."""
    pairs = descendant_pairs(_flow_edges(cells, value_col, fd), max_rounds)
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


def flow_load(
    cells: DataFrame,
    value_col: str = "ndvi",
    max_rounds: int = 16,
    fd: DataFrame | None = None,
) -> DataFrame:
    """VALUE-WEIGHTED flow accumulation — the sediment/contaminant
    load raster (what hydrologists route downstream when cells carry
    a source strength, not just area): ``upslope_micro_load`` = the
    cell's own weight plus the weights of every upslope cell, with
    weight = ``floor_stable(value · 1e6)`` — INTEGER micro-units, so
    the closure aggregate is an exact BIGINT sum (the
    integerize-the-sum pattern: a float Σ over an unbounded upslope
    set is the cross-engine association hazard; the micro-load sum
    has zero float exposure). ``upslope_load`` = micro/1e6, one
    correctly-rounded division under round6. Same shared
    :func:`descendant_pairs` closure as :func:`flow_accumulation` —
    constant weights reduce this to it exactly (pytest invariant).
    Int64 bound: |w| ≤ 1e6 · max|value| and upslope counts ≤ grid
    size, orders of magnitude under 2^62 at any real raster.

    Reference parity: extends the reference's neighbor-reduce
    vocabulary (hex_smooth_cuda_v5 gather loops) along the D6 flow
    family; output ``(cell, upslope_micro_load, upslope_load)``."""
    from cuda_gis_smoothing_spark.functions.numeric import (
        floor_stable,
        round6,
    )

    w = cells.select(
        "cell",
        floor_stable(F.col(value_col) * 1e6).cast("long").alias("_w"),
    )
    pairs = descendant_pairs(_flow_edges(cells, value_col, fd), max_rounds)
    up = (
        pairs.join(w.withColumnRenamed("cell", "src"), "src")
        .groupBy("dst")
        .agg(F.sum("_w").alias("_s"))
    )
    total = F.col("_w") + F.coalesce(F.col("_s"), F.lit(0))
    return w.join(up, w["cell"] == up["dst"], "left").select(
        "cell",
        total.cast("long").alias("upslope_micro_load"),
        round6(total.cast("double") / F.lit(1e6)).alias("upslope_load"),
    )


def flow_path_length(
    cells: DataFrame, value_col: str = "ndvi", max_rounds: int = 16
) -> DataFrame:
    """Per-cell flow-path length: ``path_steps`` = number of D6 hops
    from the cell to its basin's sink (0 for sinks) and ``sink_cell``
    = that terminal cell. From the shared descendant closure: steps =
    the cell's descendant count (a strictly descending path visits
    each descendant once), sink = its unique descendant with no
    outgoing edge. Integer steps + id sink — tie-proof. Output
    ``(cell, path_steps, sink_cell)`` over every input cell."""
    fd = flow_direction(cells, value_col).localCheckpoint()
    edges = fd.where(F.col("flow_to").isNotNull()).select(
        F.col("cell").alias("src"), F.col("flow_to").alias("dst")
    )
    pairs = descendant_pairs(edges, max_rounds)
    sinks = fd.where(F.col("flow_to").isNull()).select("cell")
    steps = pairs.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("path_steps")
    )
    term = pairs.join(sinks.withColumnRenamed("cell", "dst"), "dst").select(
        "src", F.col("dst").alias("sink_cell")
    )
    non_sinks = (
        steps.join(term, "src")
        .select(F.col("src").alias("cell"), "path_steps", "sink_cell")
    )
    sink_rows = sinks.select(
        "cell",
        F.lit(0).cast("long").alias("path_steps"),
        F.col("cell").alias("sink_cell"),
    )
    return non_sinks.unionByName(sink_rows)


def flow_sinuosity(
    cells: DataFrame, value_col: str = "ndvi", max_rounds: int = 16
) -> DataFrame:
    """Flow-path sinuosity per cell — committed D6 path length over
    the straight-line hex distance to the terminal sink (the channel-
    meandering card hydrologists read beside drainage_density; 1 =
    perfectly straight path, larger = meandering around the relief).

    Everything integer until one exact division under round6: steps
    come from :func:`flow_path_length`, the straight-line separation
    is the axial hex distance (|dq| + |dr| + |dq+dr|) / 2 — dq/dr are
    differences of unpacked coordinates where the OFFSET cancels and
    the sum is always even, so integer floor-div by 2 is exact and
    Spark ``div`` == DuckDB ``//`` on the non-negative numerator. By
    the triangle inequality steps >= hex_distance, so sinuosity >= 1
    (pytest invariant). Sinks emit NULL (0/0). Output ``(cell,
    path_steps, hex_distance, sinuosity)`` over every input cell.

    Plan (100 TB): flow_path_length's shared closure + one row-local
    projection — no new shuffles."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.spatial import hex_distance_sql

    p = flow_path_length(cells, value_col, max_rounds)
    hexd = F.expr(hex_distance_sql("cell", "sink_cell", "spark")).cast(
        "long"
    )
    return p.select(
        "cell",
        "path_steps",
        hexd.alias("hex_distance"),
        round6(
            F.when(hexd > 0, F.col("path_steps") / hexd)
        ).alias("sinuosity"),
    )


def flow_upstream_length(
    cells: DataFrame,
    value_col: str = "ndvi",
    max_rounds: int = 16,
    fd: DataFrame | None = None,
) -> DataFrame:
    """Per-cell LONGEST upstream flow path — ``upstream_steps`` = D6
    hops from the farthest headwater whose flow path passes through the
    cell (0 for ridge cells nothing drains into): the upstream sibling
    of :func:`flow_path_length` and the classic "flow length (up)"
    raster op (drives time-of-concentration / erosion-length models).

    Because every cell's DOWNSTREAM path is unique, the hop distance
    from an ancestor ``a`` to the cell ``c`` it drains through is
    ``steps(a) − steps(c)`` where ``steps(x)`` = |descendants(x)| (the
    :func:`flow_path_length` argument — the path from ``a`` visits each
    of its descendants exactly once, ``c`` among them), so the maximum
    over ancestors needs only the SHARED closure plus one integer MAX —
    no per-pair distance bookkeeping. Integers/ids only: tie-proof
    cross-engine. Output ``(cell, upstream_steps)`` over every input
    cell.

    Plan (100 TB): one closure (O(log L) squaring rounds, shared shape
    with accumulation/path-length), two hash aggregates, two joins on
    cell ids. ``descendant_pairs`` returns a localCheckpoint, so its
    two differently-pruned consumers (steps by src, ancestor max by
    dst) cannot re-execute the closure; the tiny per-cell steps table
    is checkpointed for the same reason. ``fd`` lets sibling
    consumers share the flow-direction derivation."""
    if fd is None:
        fd = flow_direction(cells, value_col)
    pairs = descendant_pairs(_flow_edges(cells, value_col, fd), max_rounds)
    cnt = pairs.groupBy("src").agg(F.count(F.lit(1)).alias("_n"))
    steps = (
        cells.select("cell")
        .join(cnt, cells["cell"] == cnt["src"], "left")
        .select(
            "cell", F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("_steps")
        )
        .localCheckpoint()  # feeds the ancestor max AND the final join
    )
    anc = (
        pairs.join(
            steps.select(F.col("cell").alias("src"), F.col("_steps").alias("_as")),
            "src",
        )
        .groupBy("dst")
        .agg(F.max("_as").alias("_mx"))
    )
    return steps.join(anc, steps["cell"] == anc["dst"], "left").select(
        "cell",
        F.coalesce(F.col("_mx") - F.col("_steps"), F.lit(0))
        .cast("long")
        .alias("upstream_steps"),
    )


def basin_channel_length(
    cells: DataFrame, value_col: str = "ndvi", max_rounds: int = 16
) -> DataFrame:
    """Longest flow path per basin (the hydrologic "longest flow
    path" driving time-of-concentration): because every path ends at
    the basin's unique sink, the basin's longest source-to-sink path
    is exactly the sink's :func:`flow_upstream_length` — one join, no
    new closure semantics. Output ``(basin, n_cells, sink_cell,
    channel_steps)``; integers/ids only, tie-proof. At 100 TB ``fd``
    would be a stored table shared by both derivations (the
    flow_direction_maintained serving path); here each op derives it
    — gate-scale cost, not a scale hazard. r6: ONE checkpointed
    ``fd`` now feeds both derivations (the multi-consumer class), and
    the two eager sub-jobs behind them — the star-CC fixpoint and the
    closure's squaring rounds — are independent chains of small
    blocking actions, so they materialize concurrently from a driver
    thread pool (guide §2.6, the threshold-sweep precedent)."""
    from concurrent.futures import ThreadPoolExecutor

    fd = flow_direction(cells, value_col).localCheckpoint()
    with ThreadPoolExecutor(max_workers=2) as pool:
        basins_f = pool.submit(watershed_basins, cells, value_col, fd)
        up_f = pool.submit(
            flow_upstream_length, cells, value_col, max_rounds, fd
        )
        basins = basins_f.result().select("basin", "n_cells", "sink_cell")
        up = up_f.result().select(
            F.col("cell").alias("sink_cell"),
            F.col("upstream_steps").alias("channel_steps"),
        )
    return basins.join(up, "sink_cell").select(
        "basin", "n_cells", "sink_cell", "channel_steps"
    )


def basin_stats(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Zonal statistics over DERIVED zones: per drainage basin, cell
    count, mean/min/max of the value surface and relief (max − min) —
    the zonal_stats pattern with the zone polygon replaced by the flow
    partition. min/max cross the gate as raw doubles (association-
    order-free); mean/relief go through round6 (the focal_stats
    precedent). Output ``(basin, n_cells, mean_value, min_value,
    max_value, relief)``."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    vals = cells.select("cell", F.col(value_col).cast("double").alias("_x"))
    return (
        basin_labels(cells, value_col)
        .join(vals, "cell")
        .groupBy("basin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            round6(F.avg("_x")).alias("mean_value"),
            F.min("_x").alias("min_value"),
            F.max("_x").alias("max_value"),
            round6(F.max("_x") - F.min("_x")).alias("relief"),
        )
    )


def basin_relief_ratio(
    cells: DataFrame, value_col: str = "ndvi"
) -> DataFrame:
    """Elevation–relief ratio per basin — Pike & Wilson's estimator of
    the hypsometric integral, the geomorphic-maturity card read beside
    :func:`basin_hypsometry`'s band histogram:

        er_ratio = (mean − min) / (max − min)

    ≈1 young/plateau-like basins (mass near the top), ≈0 senile
    basins. Flat basins (relief 0) emit NULL.

    Cross-engine: round-FIRST layering (the ivf_silhouette class) —
    the numerator reads :func:`basin_stats`' ALREADY-round6'd mean
    against the exact min/max (min/max are association-order-free raw
    doubles), so the final expression is correctly-rounded ops over
    bit-identical inputs in both engines; one more round6 on the
    ratio. Output ``(basin, n_cells, relief, er_ratio)``."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    s = basin_stats(cells, value_col)
    den = F.col("max_value") - F.col("min_value")
    return s.select(
        "basin",
        "n_cells",
        "relief",
        round6(
            F.when(
                den > 0, (F.col("mean_value") - F.col("min_value")) / den
            )
        ).alias("er_ratio"),
    )


#: TWI slope-floor epsilon (flats have zero gradient): a literal folded
#: identically into both engines via flit on the SQL side
TWI_EPS = 1e-3


def twi(
    cells: DataFrame, value_col: str = "ndvi", max_rounds: int = 16
) -> DataFrame:
    """Topographic wetness index ln(a / (tanβ + ε)) with a = the full
    upslope count (flow_accumulation) and tanβ = the central-difference
    gradient magnitude (cell_gradient's UNROUNDED form — re-derived
    inline so no intermediate round6 enters the formula). ln is libm
    but ≤1 ulp cross-engine (the doc_logprob class) — safe under
    round6. Border/hole cells are excluded (the central-difference
    contract). Output ``(cell, upslope_cells, twi)``."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.hexgrid import ENC

    acc = flow_accumulation(cells, value_col, max_rounds)
    vals = cells.select("cell", F.col(value_col).cast("double").alias("_x"))

    def nbr(delta: int, alias: str) -> DataFrame:
        return vals.select(
            (F.col("cell") - delta).alias("cell"), F.col("_x").alias(alias)
        )

    gq = (F.col("_qp") - F.col("_qm")) / 2.0
    gr = (F.col("_rp") - F.col("_rm")) / 2.0
    wet = F.log(
        F.col("upslope_cells").cast("double")
        / (F.sqrt(gq * gq + gr * gr) + F.lit(TWI_EPS))
    )
    return (
        vals.join(nbr(ENC, "_qp"), "cell")
        .join(nbr(-ENC, "_qm"), "cell")
        .join(nbr(1, "_rp"), "cell")
        .join(nbr(-1, "_rm"), "cell")
        .join(acc, "cell")
        .select("cell", "upslope_cells", round6(wet).alias("twi"))
    )


def aspect_sectors(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Hex-native aspect (downslope direction) classification: per
    cell, ``sector`` = the index of its steepest-descent neighbor in
    the canonical ring-1 offset order (:data:`R1_DELTAS`), −1 for
    sinks/flats — the gradient-free aspect product (the classic raster
    aspect discretized to the 6 hex directions). Reuses
    :func:`flow_direction`'s struct-MIN argmin, so the classification
    inherits its tie-proofness; the sector map is pure integer
    arithmetic on ``flow_to − cell``. Output ``(cell, sector)``."""
    fd = flow_direction(cells, value_col)
    delta = F.col("flow_to") - F.col("cell")
    sector = F.lit(-1)
    for i in reversed(range(len(R1_DELTAS))):
        sector = F.when(delta == R1_DELTAS[i], F.lit(i)).otherwise(sector)
    return fd.select("cell", sector.cast("int").alias("sector"))


#: minimum upslope count for a cell to qualify as a stream cell (small
#: because the gated fixture's basins average ~7 cells)
STREAM_THRESHOLD = 3


def drainage_density(
    cells: DataFrame,
    value_col: str = "ndvi",
    threshold: int = STREAM_THRESHOLD,
    max_rounds: int = 16,
) -> DataFrame:
    """Stream-network extraction + per-basin drainage density: stream
    cells are those with ``upslope_cells >= threshold``; per basin,
    report cell count, stream-cell count, density (stream/total — one
    exact integer-ratio division, correctly rounded identically in
    both engines, then round6) and the basin's maximum accumulation.
    Composes the three hydrology cores over ONE checkpointed flow
    direction (the multi-consumer re-execute class: labels and the
    closure both consume ``fd``). Integer counts keep the grouping
    tie-proof. Output ``(basin, n_cells, n_stream_cells,
    drainage_density, max_upslope)``."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    from concurrent.futures import ThreadPoolExecutor

    fd = flow_direction(cells, value_col).localCheckpoint()
    # the CC fixpoint (labels) and the closure's squaring rounds (acc)
    # are independent eager action chains over the shared fd — overlap
    # them (guide §2.6, the basin_channel_length precedent)
    with ThreadPoolExecutor(max_workers=2) as pool:
        labels_f = pool.submit(basin_labels, cells, value_col, fd)
        acc_f = pool.submit(flow_accumulation, cells, value_col, max_rounds, fd)
        labels = labels_f.result()
        acc = acc_f.result()
    return (
        labels.join(acc, "cell")
        .groupBy("basin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum((F.col("upslope_cells") >= threshold).cast("long"))
            .cast("long")
            .alias("n_stream_cells"),
            F.max("upslope_cells").alias("max_upslope"),
        )
        .select(
            "basin",
            "n_cells",
            "n_stream_cells",
            round6(
                F.col("n_stream_cells").cast("double") / F.col("n_cells")
            ).alias("drainage_density"),
            "max_upslope",
        )
    )


def stream_distance(
    cells: DataFrame,
    value_col: str = "ndvi",
    threshold: int = STREAM_THRESHOLD,
    max_rounds: int = 16,
) -> DataFrame:
    """Flow length TO the stream network — the hillslope-routing
    raster paired with TWI in erosion/transport models (how far does
    water travel overland before entering a channel?): per cell, D6
    hops along its committed flow path to the FIRST stream cell
    (``upslope_cells >= threshold``, the drainage_density definition).

    Along a flow path steps-to-sink decreases by exactly 1 per hop,
    so the first stream cell reached is the stream descendant with
    MAXIMUM steps, and the distance is ``steps(c) − max_steps`` — one
    integer MAX over the closure join, tie-proof. Stream cells emit
    0; cells whose path never meets a stream (their basin has no
    channel) emit NULL (the idw_fill coverage contract). Output
    ``(cell, is_stream, stream_dist)``; is_stream is an INT flag (a
    BOOLEAN would cross the hash gate as engine-specific text).

    Plan (100 TB): the shared closure + two count aggregates + one
    semi-filtered MAX join; the per-cell base table is checkpointed
    once ahead of its three consumers (stream set, candidate join,
    final projection — the multi-consumer class)."""
    fd = flow_direction(cells, value_col).localCheckpoint()
    pairs = descendant_pairs(_flow_edges(cells, value_col, fd), max_rounds)
    inc = pairs.groupBy("dst").agg(F.count(F.lit(1)).alias("_in"))
    stp = pairs.groupBy("src").agg(F.count(F.lit(1)).alias("_st"))
    base = (
        fd.select("cell")
        .join(stp, fd["cell"] == stp["src"], "left")
        .select("cell", F.coalesce(F.col("_st"), F.lit(0)).alias("steps"))
        .join(inc, F.col("cell") == inc["dst"], "left")
        .select(
            "cell",
            F.col("steps").cast("long").alias("steps"),
            (F.lit(1) + F.coalesce(F.col("_in"), F.lit(0)))
            .cast("long")
            .alias("up"),
        )
        .localCheckpoint()  # stream set + candidate join + final
    )
    streams = base.where(F.col("up") >= threshold).select(
        F.col("cell").alias("dst"), F.col("steps").alias("_ss")
    )
    cand = (
        pairs.join(streams, "dst")
        .groupBy("src")
        .agg(F.max("_ss").alias("_mx"))
    )
    return base.join(cand, base["cell"] == cand["src"], "left").select(
        "cell",
        (F.col("up") >= threshold).cast("int").alias("is_stream"),
        F.when(F.col("up") >= threshold, F.lit(0).cast("long"))
        .otherwise(F.col("steps") - F.col("_mx"))
        .cast("long")
        .alias("stream_dist"),
    )


def riparian_zones(
    cells: DataFrame,
    value_col: str = "ndvi",
    threshold: int = STREAM_THRESHOLD,
    max_rounds: int = 16,
) -> DataFrame:
    """Riparian gradient: the value surface aggregated by flow distance
    to the stream network — "how does vegetation change as you move
    away from the channel?", the buffer-zone analysis hydrologists run
    after extracting streams. One row per :func:`stream_distance` value
    (bounded by the longest flow path, never the corpus):
    ``(stream_dist, n_cells, mean_value)`` — the NULL-distance row
    (cells whose path never meets a channel) is kept, it IS the
    unrouted-area headline. Counts integer; the mean is the zonal
    focal-mean contract.

    Plan (100 TB): the stream_distance composition + one cell equi-join
    + a distance-keyed hash aggregate."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    sd = stream_distance(cells, value_col, threshold, max_rounds)
    return (
        sd.join(cells.select("cell", value_col), "cell")
        .groupBy("stream_dist")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            round6(F.avg(value_col)).alias(f"mean_{value_col}"),
        )
    )


def stream_junctions(
    cells: DataFrame,
    value_col: str = "ndvi",
    threshold: int = STREAM_THRESHOLD,
    max_rounds: int = 16,
    fd: DataFrame | None = None,
) -> DataFrame:
    """Confluence census: stream cells (``upslope_cells >= threshold``,
    the drainage_density definition) that receive committed flow from
    TWO OR MORE stream neighbors — the nodes where channels merge, the
    backbone of network topology (Strahler order increments exactly
    here; stream_order's >=2-at-max flag fires on this set). Output
    one row per junction: ``(cell, n_stream_inflows, upslope_cells)``
    — all integers, tie-proof.

    Plan (100 TB): ONE checkpointed flow direction feeds the shared
    closure (upslope counts) and the single-hop inflow count (an
    equi-join of the stream set with fd on flow_to); no windows.
    ``fd`` lets maintained callers pass the flow log (the
    flow_accumulation contract)."""
    if fd is None:
        fd = flow_direction(cells, value_col).localCheckpoint()
    acc = flow_accumulation(cells, value_col, max_rounds, fd=fd)
    streams = acc.where(F.col("upslope_cells") >= int(threshold)).localCheckpoint()
    # committed single-hop inflows FROM stream cells: fd rows whose
    # source is a stream cell, grouped by their target
    inflows = (
        fd.where(F.col("flow_to").isNotNull())
        .join(
            streams.select(F.col("cell").alias("_src")),
            F.col("cell") == F.col("_src"),
        )
        .groupBy("flow_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_stream_inflows"))
    )
    return (
        streams.join(inflows, streams["cell"] == inflows["flow_to"])
        .where(F.col("n_stream_inflows") >= 2)
        .select("cell", "n_stream_inflows", "upslope_cells")
    )


def stream_junctions_sql(threshold: int = STREAM_THRESHOLD) -> str:
    """DuckDB twin of :func:`stream_junctions` — the shared flow +
    closure CTEs, the drainage_density upslope definition, one
    single-hop inflow count. Compose after the cells + flow CTEs."""
    return f"""
facc AS (SELECT dst, COUNT(*) AS n FROM freach GROUP BY dst),
fups AS (
  SELECT c.cell, CAST(1 + COALESCE(a.n, 0) AS BIGINT) AS upslope_cells
  FROM cells4 c LEFT JOIN facc a ON a.dst = c.cell
),
fstreams AS (SELECT cell, upslope_cells FROM fups WHERE upslope_cells >= {int(threshold)}),
finflows AS (
  SELECT d.flow_to AS cell, CAST(COUNT(*) AS BIGINT) AS n_stream_inflows
  FROM fd d JOIN fstreams s ON s.cell = d.cell
  WHERE d.flow_to IS NOT NULL
  GROUP BY d.flow_to
)
SELECT s.cell, i.n_stream_inflows, s.upslope_cells
FROM fstreams s JOIN finflows i ON i.cell = s.cell
WHERE i.n_stream_inflows >= 2
""".strip()


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


def flow_closure_ctes() -> str:
    """DIRECTED transitive-closure CTEs over ``fd`` (``fedges`` +
    recursive ``freach(src, dst)``) — shared by the accumulation /
    path-length / TWI twins. Recursion terminates because strict
    descent makes the flow graph acyclic."""
    return """
fedges AS (SELECT cell AS src, flow_to AS dst FROM fd WHERE flow_to IS NOT NULL),
freach(src, dst) AS (
  SELECT src, dst FROM fedges
  UNION
  SELECT r.src, e.dst FROM freach r JOIN fedges e ON e.src = r.dst
)
""".strip()


def flow_component_ctes(source: str = "cells4") -> str:
    """UNDIRECTED component CTEs over ``fd`` (symmetric closure +
    per-cell min-reachable label ``fcomp(cell, basin)``) — shared by
    the watershed / basin-stats twins; the label contract matches
    star_components (component = min cell id)."""
    return f"""
fuedges AS (SELECT cell AS a, flow_to AS b FROM fd WHERE flow_to IS NOT NULL),
fsym AS (SELECT a, b FROM fuedges UNION ALL SELECT b, a FROM fuedges),
fureach(a, b) AS (
  SELECT a, b FROM fsym
  UNION
  SELECT r.a, s.b FROM fureach r JOIN fsym s ON r.b = s.a WHERE s.b <> r.a
),
fcomp AS (
  SELECT c.cell, LEAST(c.cell, COALESCE(r.mn, c.cell)) AS basin
  FROM {source} c
  LEFT JOIN (SELECT a, MIN(b) AS mn FROM fureach GROUP BY a) r ON r.a = c.cell
)
""".strip()


# -- cost-distance accumulation (the classic cost-surface raster op) --

#: integer scale for the per-cell crossing cost (1 + floor(v * 1000))
COST_SCALE = 1000
#: Bellman-Ford relaxation rounds — exact geodesic cost for every cell
#: whose optimal path to a seed has <= COST_ROUNDS edges; cells beyond
#: the horizon report NULL (documented bounded-horizon semantics, the
#: fixed-iteration cell_pagerank precedent)
COST_ROUNDS = 8


def cost_weights(
    cells: DataFrame, value_col: str = "ndvi"
) -> DataFrame:
    """Integer crossing cost per cell: ``w = 1 + floor_stable(v *
    COST_SCALE)`` — strictly positive, integer, so every cumulative
    cost below is EXACT integer min-plus arithmetic (min is
    association-order-free and + is exact on int64: the gate is
    tie-proof cross-engine with zero float exposure). Bound: max path
    cost <= COST_ROUNDS * (1 + COST_SCALE) << 2^62."""
    from cuda_gis_smoothing_spark.functions.numeric import floor_stable

    return cells.select(
        "cell",
        (
            F.lit(1)
            + floor_stable(F.col(value_col).cast("double") * COST_SCALE)
        )
        .cast("long")
        .alias("w"),
    )


def cost_distance(
    cells: DataFrame,
    value_col: str = "ndvi",
    threshold: int = STREAM_THRESHOLD,
    rounds: int = COST_ROUNDS,
    max_rounds: int = 16,
    fd: DataFrame | None = None,
) -> DataFrame:
    """Cost-distance to the stream network — the classic GIS
    cost-surface accumulation (riparian-buffer / proximity modelling):
    seeds are the stream cells (``upslope_cells >= threshold``, the
    drainage_density extraction) at cost 0; stepping INTO cell c costs
    the integer :func:`cost_weights` ``w(c)``; ``cost`` = the minimal
    cumulative cost over ring-1 hex paths, via ``rounds`` Bellman-Ford
    relaxations (exact for all cells whose optimal path has <= rounds
    edges; farther cells are NULL — bounded horizon BY CONTRACT,
    mirrored in the twin's unrolled CTE chain):

        d0(c)  = 0 if seed(c) else NULL
        dt(c)  = least(dt-1(c), min_n dt-1(n) + w(c))

    ``least``/``min`` skip NULLs identically in both engines (the
    quality_calibration pinned contract), so NULL is infinity with no
    sentinel arithmetic.

    Spark shape (100 TB): weights and the ring-1 edge list materialize
    ONCE (localCheckpoint — ``rounds`` consumers, the cell_pagerank
    multi-consumer class); each round is one equi-join + one integer
    hash MIN + one cell-keyed left join — the smoothing shuffle shape,
    no windows, no collect. Output ``(cell, seed, cost)``."""
    d = _cost_relax(cells, value_col, threshold, rounds, max_rounds, fd=fd)
    return d.select(
        "cell",
        "seed",
        F.expr(f"_k div {ALLOC_SHIFT}").cast("long").alias("cost"),
    )


#: seed-id shift for the combined (cost, seed) relaxation key:
#: combined = cost * ALLOC_SHIFT + seed_cell. Exact while seed cell
#: ids < 2^34 (q, r < ~2^17 grids — continental at the reference's hex
#: pitch) and cost <= COST_ROUNDS * (1 + COST_SCALE) < 2^13, so
#: combined < 2^47 << 2^62 (the portable-int invariant). min(combined)
#: IS the lexicographic (cost, seed-id) minimum, and adding w·SHIFT
#: preserves it — the argmin rides the SAME integer min-plus for free
#: (the integerize-the-argmin lesson).
ALLOC_SHIFT = 1 << 34


def _cost_relax(
    cells: DataFrame,
    value_col: str,
    threshold: int,
    rounds: int,
    max_rounds: int,
    fd: DataFrame | None = None,
) -> DataFrame:
    """The ONE bounded Bellman-Ford kernel behind
    :func:`cost_distance` and :func:`cost_allocation`: relaxes the
    COMBINED integer key ``k = cost * ALLOC_SHIFT + seed_cell`` (NULL =
    unreached), so one pass yields both the minimal cost (``k div
    SHIFT``) and its claiming seed (``k % SHIFT``, smallest seed id on
    cost ties — lexicographic by construction). Each round's state is
    localCheckpoint'ed: the loop references ``d`` TWICE per round (in
    the relax subquery and as the combine side), so an un-materialized
    chain doubles the physical plan per round — 510 joins at rounds=8
    vs the linear 16 (the multi-consumer re-execute class; the
    descendant_pairs per-round checkpoint pattern). Pass a
    pre-checkpointed ``fd`` to share the flow derivation (the
    drainage_density contract). Output ``(cell, seed, _k)``."""
    acc = flow_accumulation(cells, value_col, max_rounds, fd=fd)
    wts = cost_weights(cells, value_col)
    offs = F.array(*[F.lit(d) for d in R1_DELTAS])
    edges = (
        cells.select("cell", F.explode(offs).alias("_d"))
        .select("cell", (F.col("cell") + F.col("_d")).alias("nbr"))
        .join(cells.select(F.col("cell").alias("nbr")), "nbr")
        .join(wts, "cell")
        .localCheckpoint()  # rounds consumers
    )
    seeds = acc.select(
        "cell", (F.col("upslope_cells") >= int(threshold)).alias("seed")
    )
    d = seeds.select(
        "cell",
        "seed",
        F.when(F.col("seed"), F.col("cell").cast("long")).alias("_k"),
    ).localCheckpoint()  # cuts the closure lineage out of every round
    for _ in range(int(rounds)):
        relax = (
            edges.join(
                d.where(F.col("_k").isNotNull()).select(
                    F.col("cell").alias("nbr"), F.col("_k").alias("_kn")
                ),
                "nbr",
            )
            .groupBy("cell")
            .agg(F.min(F.col("_kn") + F.col("w") * ALLOC_SHIFT).alias("_nk"))
        )
        d = (
            d.join(relax, "cell", "left")
            .select(
                "cell", "seed", F.least(F.col("_k"), F.col("_nk")).alias("_k")
            )
            .localCheckpoint()  # two consumers next round — keep the plan linear
        )
    return d


def cost_allocation(
    cells: DataFrame,
    value_col: str = "ndvi",
    threshold: int = STREAM_THRESHOLD,
    rounds: int = COST_ROUNDS,
    max_rounds: int = 16,
    fd: DataFrame | None = None,
) -> DataFrame:
    """Cost allocation — the companion raster to :func:`cost_distance`
    (ArcGIS "cost allocation"/Voronoi-under-cost): which seed cell
    claims each cell, = the seed of the lexicographically minimal
    (cost, seed-id) path, decoded from the SAME combined-key
    relaxation (zero extra arithmetic; cost ties break to the smallest
    seed id — deterministic cross-engine BY the integer encoding).
    Output ``(cell, seed, cost, nearest_seed)``; both NULL beyond the
    horizon."""
    d = _cost_relax(cells, value_col, threshold, rounds, max_rounds, fd=fd)
    return d.select(
        "cell",
        "seed",
        F.expr(f"_k div {ALLOC_SHIFT}").cast("long").alias("cost"),
        (F.col("_k") % ALLOC_SHIFT).cast("long").alias("nearest_seed"),
    )


def cost_next_hop(
    cells: DataFrame,
    value_col: str = "ndvi",
    threshold: int = STREAM_THRESHOLD,
    rounds: int = COST_ROUNDS,
    max_rounds: int = 16,
    fd: DataFrame | None = None,
) -> DataFrame:
    """Least-cost-path direction field — the backlink raster that turns
    :func:`cost_distance` into traversable paths (ArcGIS "cost back
    link"): for each reached non-seed cell, the ring-1 neighbor that
    the minimal-cost path to the stream network leaves through.

    next_hop = argmin over ring-1 neighbors of the FINAL combined key
    ``k = cost·SHIFT + seed`` (the own-cell entry weight is constant
    across neighbors, so the relaxation's argmin reduces to the plain
    neighbor-key argmin); ties break to the smallest neighbor id via
    struct-MIN (the flow_direction tie-proof argmin — all-integer, so
    cross-engine exact). Descent is STRICT: k(c) ≥ min_n k(n) + w(c)·
    SHIFT > min_n k(n) even under the bounded horizon, so following
    next_hop always terminates at a seed (pytest-pinned). Seeds and
    unreached cells emit NULL next_hop.

    Plan (100 TB): ONE extra ring-1 equi-join + struct-MIN hash
    aggregate over the relaxation's final (checkpointed) state — the
    flow_direction shuffle shape; no windows. Output ``(cell, seed,
    cost, nearest_seed, next_hop, next_cost)``."""
    d = _cost_relax(cells, value_col, threshold, rounds, max_rounds, fd=fd)
    offs = F.array(*[F.lit(dd) for dd in R1_DELTAS])
    edges = cells.select("cell", F.explode(offs).alias("_d")).select(
        "cell", (F.col("cell") + F.col("_d")).alias("nbr")
    )
    nbrk = (
        edges.join(
            d.where(F.col("_k").isNotNull()).select(
                F.col("cell").alias("nbr"), F.col("_k").alias("_kn")
            ),
            "nbr",
        )
        .groupBy("cell")
        .agg(F.min(F.struct(F.col("_kn"), F.col("nbr"))).alias("_m"))
    )
    reached = (~F.col("seed")) & F.col("_k").isNotNull()
    return (
        d.join(nbrk, "cell", "left")
        .select(
            "cell",
            "seed",
            F.expr(f"_k div {ALLOC_SHIFT}").cast("long").alias("cost"),
            (F.col("_k") % ALLOC_SHIFT).cast("long").alias("nearest_seed"),
            F.when(reached, F.col("_m.nbr")).cast("long").alias("next_hop"),
            F.when(reached, F.expr(f"_m._kn div {ALLOC_SHIFT}"))
            .cast("long")
            .alias("next_cost"),
        )
    )


def cost_weight_cte(source: str = "cells4", value_col: str = "ndvi") -> str:
    """The ONE ``cw (cell, w)`` crossing-weight CTE — shared by the
    cost_distance and flow_path_cost twins so the integerization can't
    drift (the flow_ctes drift-prevention class); twin of
    :func:`cost_weights`."""
    return f"""cw AS (
  SELECT c.cell, CAST(1 + FLOOR((c.{value_col} * {COST_SCALE}) + 1e-09) AS BIGINT) AS w
  FROM {source} c
)"""


def cost_ctes(
    threshold: int = STREAM_THRESHOLD,
    rounds: int = COST_ROUNDS,
    source: str = "cells4",
    value_col: str = "ndvi",
) -> str:
    """DuckDB twin CTEs for the :func:`_cost_relax` kernel — seeds
    from the shared recursive closure (:func:`flow_closure_ctes` must
    precede), then ``rounds`` UNROLLED relaxation CTEs over the
    COMBINED key ``k = cost * ALLOC_SHIFT + seed_cell`` (the
    cell_pagerank unrolled-iteration precedent; all-integer min-plus,
    LEAST skips NULLs in both engines; ``//`` and Spark ``div``
    agree on non-negative integers). Final table: ``cd{rounds}
    (cell, seed, k)`` — callers decode cost ``k // SHIFT`` and
    nearest_seed ``k % SHIFT``."""
    parts = [
        "cacc AS (SELECT dst, COUNT(*) AS n FROM freach GROUP BY dst)",
        cost_weight_cte(source, value_col),
        f"""cedges AS (
  SELECT c.cell, c.cell + o.delta AS nbr
  FROM {source} c CROSS JOIN f_offsets o
  JOIN {source} n ON n.cell = c.cell + o.delta
)""",
        f"""cd0 AS (
  SELECT c.cell,
         (1 + COALESCE(a.n, 0)) >= {int(threshold)} AS seed,
         CASE WHEN (1 + COALESCE(a.n, 0)) >= {int(threshold)}
              THEN CAST(c.cell AS BIGINT) END AS k
  FROM {source} c LEFT JOIN cacc a ON a.dst = c.cell
)""",
    ]
    for t in range(1, int(rounds) + 1):
        parts.append(
            f"""cd{t} AS (
  SELECT p.cell, p.seed, LEAST(p.k, m.nk) AS k
  FROM cd{t - 1} p LEFT JOIN (
    SELECT e.cell, MIN(pn.k + w.w * {ALLOC_SHIFT}) AS nk
    FROM cedges e
    JOIN cd{t - 1} pn ON pn.cell = e.nbr AND pn.k IS NOT NULL
    JOIN cw w ON w.cell = e.cell
    GROUP BY e.cell
  ) m ON m.cell = p.cell
)"""
        )
    return ",\n".join(parts)


def flow_path_cost(
    cells: DataFrame,
    value_col: str = "ndvi",
    max_rounds: int = 16,
) -> DataFrame:
    """Integer cost accumulated ALONG each cell's flow path: the sum
    of :func:`cost_weights` over the cells its water flows INTO
    (= its strict descendants in the flow forest; 0 for sinks) — the
    path-weighted sibling of :func:`flow_path_length` (hops) and the
    downstream analogue of :func:`cost_distance` (which searches over
    ALL ring-1 paths; this one follows the committed D6 routing). One
    join of the shared descendant closure against the weight table +
    one integer SUM — tie-proof. Output ``(cell, path_cost)``."""
    wts = cost_weights(cells, value_col)
    pairs = descendant_pairs(_flow_edges(cells, value_col), max_rounds)
    costs = (
        pairs.join(wts.withColumnRenamed("cell", "dst"), "dst")
        .groupBy("src")
        .agg(F.sum("w").alias("_pc"))
    )
    return (
        cells.select("cell")
        .join(costs, cells["cell"] == costs["src"], "left")
        .select(
            "cell",
            F.coalesce(F.col("_pc"), F.lit(0)).cast("long").alias("path_cost"),
        )
    )


def stream_magnitude(
    cells: DataFrame, value_col: str = "ndvi", max_rounds: int = 16
) -> DataFrame:
    """Shreve stream magnitude: the number of SOURCE cells (cells with
    no inflow — the flow forest's leaves) whose water passes through
    the cell, counting the cell itself if it is a source. Shreve's
    order is the additive one (magnitude at a confluence = sum of
    tributary magnitudes), which makes it exactly one closure join:
    m(c) = |{leaf u : u = c or (u, c) ∈ closure}| — integer,
    tie-proof. (Strahler's max-based order needs a bottom-up
    traversal with depth-many rounds — not twin-expressible as a
    fixed unroll; Shreve is the standard additive alternative.)
    Output ``(cell, magnitude)``, magnitude >= 1 for source cells and
    every cell downstream of one; pure-sink isolated cells report 1
    (they are their own source)."""
    fd = flow_direction(cells, value_col).localCheckpoint()
    edges = _flow_edges(cells, value_col, fd)
    # leaves: no edge flows INTO the cell
    leaves = cells.select("cell").join(
        edges.select(F.col("dst").alias("cell")), "cell", "left_anti"
    )
    pairs = descendant_pairs(edges, max_rounds)
    thru = (
        pairs.join(leaves.withColumnRenamed("cell", "src"), "src")
        .groupBy("dst")
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    own = leaves.select("cell", F.lit(1).alias("_own"))
    return (
        cells.select("cell")
        .join(thru.withColumnRenamed("dst", "cell"), "cell", "left")
        .join(own, "cell", "left")
        .select(
            "cell",
            (F.coalesce(F.col("_m"), F.lit(0)) + F.coalesce(F.col("_own"), F.lit(0)))
            .cast("long")
            .alias("magnitude"),
        )
    )


#: hypsometric elevation bands (uniform over the unit value range)
HYPSO_BANDS = 10


def basin_hypsometry(
    cells: DataFrame, value_col: str = "ndvi", bands: int = HYPSO_BANDS
) -> DataFrame:
    """Per-basin hypsometric histogram: cell counts per uniform
    elevation band ``band = least(floor_stable(v * bands), bands-1)``
    over the unit-range value surface — the area-elevation curve
    hydrologists read basin maturity from, over the DERIVED basin
    partition (the basin_stats zonal pattern). Integer band keys and
    counts — tie-proof. Empty (basin, band) combinations are absent
    (sparse contract). Output ``(basin, band, n_cells)``."""
    from cuda_gis_smoothing_spark.functions.numeric import floor_stable

    labels = basin_labels(cells, value_col)
    banded = cells.select(
        "cell",
        F.least(
            floor_stable(F.col(value_col).cast("double") * int(bands)),
            F.lit(int(bands) - 1),
        )
        .cast("int")
        .alias("band"),
    )
    return (
        labels.join(banded, "cell")
        .groupBy("basin", "band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cells"))
    )

def basin_adjacency(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Basin adjacency report: which drainage basins share a border,
    and how many ring-1 cell edges cross it — the input to basin
    merging / pruning (small basins dissolve into their
    largest-border neighbor). Each unordered border cell pair counts
    ONCE (directed edges exist both ways; the basin_a < basin_b filter
    keeps exactly one direction). Labels come from ONE checkpointed
    basin_labels pass consumed by both edge endpoints. All-integer —
    tie-proof. Output ``(basin_a, basin_b, n_border_edges)``."""
    labels = basin_labels(cells, value_col).localCheckpoint()  # two sides
    offs = F.array(*[F.lit(d) for d in R1_DELTAS])
    e = cells.select("cell", F.explode(offs).alias("_d")).select(
        "cell", (F.col("cell") + F.col("_d")).alias("nbr")
    )
    return (
        e.join(labels.select("cell", F.col("basin").alias("basin_a")), "cell")
        .join(
            labels.select(
                F.col("cell").alias("nbr"), F.col("basin").alias("basin_b")
            ),
            "nbr",
        )
        .where(F.col("basin_a") < F.col("basin_b"))
        .groupBy("basin_a", "basin_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_border_edges"))
    )


def basin_mainstem(
    cells: DataFrame, value_col: str = "ndvi", max_rounds: int = 16
) -> DataFrame:
    """Mainstem raster — the cells lying on a LONGEST source-to-sink
    flow path of their basin (the "main channel" basin_channel_length
    reports the length of; all ties flagged when several paths are
    equally long): the longest path THROUGH a cell has
    ``upstream_steps(c) + steps(c)`` hops (the flow_upstream_length
    argument: dist(farthest headwater→c) + dist(c→sink)), so mainstem
    cells are exactly those where that sum equals the basin maximum.
    All integers/ids — tie-proof. Output ``(cell, basin,
    through_steps, is_mainstem)``; is_mainstem is an INT flag (the
    stream_distance boolean contract).

    Plan (100 TB): ONE shared closure feeding both the steps and
    ancestor-max aggregates (fd and the per-cell steps table each
    checkpointed ahead of their two consumers), the basin max is a
    hash aggregate over cells + one join back — no windows."""
    from concurrent.futures import ThreadPoolExecutor

    fd = flow_direction(cells, value_col).localCheckpoint()

    # the CC fixpoint (labels) and the closure chain (pairs + steps
    # checkpoint) are independent eager action chains over the shared
    # fd — overlap them (guide §2.6, the basin_channel_length
    # precedent); the join order below is unchanged.
    def _closure():
        pairs = descendant_pairs(_flow_edges(cells, value_col, fd), max_rounds)
        cnt = pairs.groupBy("src").agg(F.count(F.lit(1)).alias("_n"))
        steps = (
            fd.select("cell")
            .join(cnt, fd["cell"] == cnt["src"], "left")
            .select(
                "cell",
                F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("_steps"),
            )
            .localCheckpoint()  # ancestor max + the through projection
        )
        return pairs, steps

    with ThreadPoolExecutor(max_workers=2) as pool:
        labels_f = pool.submit(basin_labels, cells, value_col, fd)
        closure_f = pool.submit(_closure)
        labels = labels_f.result()
        pairs, steps = closure_f.result()
    anc = (
        pairs.join(
            steps.select(F.col("cell").alias("src"), F.col("_steps").alias("_as")),
            "src",
        )
        .groupBy("dst")
        .agg(F.max("_as").alias("_mx"))
    )
    thr = (
        steps.join(anc, steps["cell"] == anc["dst"], "left")
        .join(labels, "cell")
        .select(
            "cell",
            "basin",
            F.coalesce(F.col("_mx"), F.col("_steps"))
            .cast("long")
            .alias("through_steps"),
        )
        .localCheckpoint()  # basin max + the final flag projection
    )
    chan = thr.groupBy("basin").agg(F.max("through_steps").alias("_chan"))
    return thr.join(chan, "basin").select(
        "cell",
        "basin",
        "through_steps",
        (F.col("through_steps") == F.col("_chan")).cast("int").alias(
            "is_mainstem"
        ),
    )


def basin_pour_points(
    cells: DataFrame, value_col: str = "ndvi"
) -> DataFrame:
    """Pour points (spill saddles) between adjacent basins — the
    elevation at which two drainage basins would merge under rising
    water, the quantity hierarchical basin-merging and flood-fill
    connectivity read off :func:`basin_adjacency`'s border report:
    per adjacent pair, the MINIMUM over border edges of
    ``max(value_a, value_b)`` plus the representative border cells.

    Cross-engine: greatest/min are association-free SELECTIONS over
    bit-identical parquet doubles (the fill_sinks zero-float-exposure
    class); the representative edge is the (saddle, cell, nbr)
    struct-MIN — a total order, ties impossible past the id pair.
    Output ``(basin_a, basin_b, n_border_edges, saddle_value,
    saddle_cell, saddle_nbr)`` with saddle_cell ∈ basin_a,
    saddle_nbr ∈ basin_b (each undirected border edge enters once via
    the basin_a < basin_b direction filter).

    Plan (100 TB): basin_adjacency's edge join + one per-pair hash
    argmin (no window sort); labels checkpointed once ahead of both
    endpoint joins."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    labels = basin_labels(cells, value_col).localCheckpoint()  # two sides
    offs = F.array(*[F.lit(d) for d in R1_DELTAS])
    vals = cells.select("cell", F.col(value_col).alias("_x"))
    e = (
        cells.select("cell", F.explode(offs).alias("_d"))
        .select("cell", (F.col("cell") + F.col("_d")).alias("nbr"))
        .join(labels.select("cell", F.col("basin").alias("basin_a")), "cell")
        .join(
            labels.select(
                F.col("cell").alias("nbr"), F.col("basin").alias("basin_b")
            ),
            "nbr",
        )
        .where(F.col("basin_a") < F.col("basin_b"))
        .join(vals, "cell")
        .join(
            vals.select(F.col("cell").alias("nbr"), F.col("_x").alias("_xn")),
            "nbr",
        )
        .select(
            "basin_a",
            "basin_b",
            F.struct(
                F.greatest("_x", "_xn").alias("s"),
                F.col("cell").alias("c"),
                F.col("nbr").alias("n"),
            ).alias("_k"),
        )
    )
    agg = e.groupBy("basin_a", "basin_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_border_edges"),
        F.min("_k").alias("_m"),
    )
    return agg.select(
        "basin_a",
        "basin_b",
        "n_border_edges",
        round6(F.col("_m.s")).alias("saddle_value"),
        F.col("_m.c").alias("saddle_cell"),
        F.col("_m.n").alias("saddle_nbr"),
    )


# -- depression filling (Planchon–Darboux) ----------------------------

#: water-level propagation horizon: each round carries border
#: information one ring inward, so ``rounds`` bounds the border-path
#: length considered (the COST_ROUNDS bounded-horizon contract). The
#: fixture grid is 40x40 (interior distance to border <= 20); 24
#: covers it with slack, and the differential pytest asserts the
#: bounded result IS the unbounded fixpoint there.
FILL_ROUNDS = 24
#: pre-fill water level for interior cells — an exact integer-valued
#: double far above any grid value (ndvi-scale variables are O(1));
#: surviving sentinels mark cells the horizon never reached (NULL out)
FILL_SENTINEL = 1.0e9


def fill_sinks(
    cells: DataFrame, value_col: str = "ndvi", rounds: int = FILL_ROUNDS
) -> DataFrame:
    """Planchon–Darboux depression filling — the standard DEM
    preprocessing step before flow routing (a filled surface drains
    everywhere; :func:`flow_direction`'s sinks become flats):

        W⁰(c) = z(c) on BORDER cells, sentinel elsewhere
        Wᵗ⁺¹(c) = max(z(c), min_{n ∈ ring1(c)} Wᵗ(n)) on interior cells

    Border = valid ring-1 degree < 6: both true grid-edge cells and
    hole-adjacent cells spill off-grid (the documented hole contract —
    a missing neighbor is open boundary, matching the strict ring-2
    hole semantics' treatment of absent cells). The fixpoint W is the
    MINIMAX border-path level: min over paths to the border of the
    max elevation en route; after ``rounds`` rounds each W is exact
    over paths of ≤ rounds edges (an upper bound on the true fill —
    identical in both engines since the twin unrolls the SAME rounds).
    Cells no border wave reached emit NULL (none on the fixture).

    Cross-engine: the entire data path is min / max / GREATEST over
    exact stored doubles and the integer-valued sentinel — selections,
    never arithmetic, so the gate has ZERO float-association exposure
    (the focal_stats class) and ``fill_depth = W − z`` subtracts
    identical doubles. Output ``(cell, filled_level, fill_depth)``.

    Plan (100 TB): edges materialized once (localCheckpoint, degree +
    every round consume it); each round is one equi-join + one
    min-aggregate + one left join on the cell key — the smoothing
    shuffle shape — with per-round localCheckpoint (the _cost_relax
    double-reference lesson: the loop variable feeds both the neighbor
    scan and the combine side)."""
    vals = cells.select("cell", F.col(value_col).cast("double").alias("_z"))
    offs = F.array(*[F.lit(d) for d in R1_DELTAS])
    edges = (
        vals.select("cell", F.explode(offs).alias("_d"))
        .select("cell", (F.col("cell") + F.col("_d")).alias("nbr"))
        .join(vals.select(F.col("cell").alias("nbr")), "nbr")
        .localCheckpoint()  # degree + rounds consumers
    )
    deg = edges.groupBy("cell").agg(F.count(F.lit(1)).alias("_nn"))
    base = vals.join(deg, "cell", "left").select(
        "cell", "_z", F.coalesce(F.col("_nn"), F.lit(0)).alias("_nn")
    )
    w = base.select(
        "cell",
        "_z",
        "_nn",
        F.when(F.col("_nn") < 6, F.col("_z"))
        .otherwise(F.lit(FILL_SENTINEL))
        .alias("_w"),
    ).localCheckpoint()
    for _ in range(int(rounds)):
        mn = (
            edges.join(
                w.select(F.col("cell").alias("nbr"), F.col("_w").alias("_wn")),
                "nbr",
            )
            .groupBy("cell")
            .agg(F.min("_wn").alias("_mn"))
        )
        w = (
            w.join(mn, "cell", "left")
            .select(
                "cell",
                "_z",
                "_nn",
                F.when(F.col("_nn") < 6, F.col("_z"))
                .otherwise(F.greatest(F.col("_z"), F.col("_mn")))
                .alias("_w"),
            )
            .localCheckpoint()
        )
    return w.select(
        "cell",
        F.when(F.col("_w") < FILL_SENTINEL, F.col("_w")).alias(
            "filled_level"
        ),
        F.when(F.col("_w") < FILL_SENTINEL, F.col("_w") - F.col("_z")).alias(
            "fill_depth"
        ),
    )


def fill_sinks_sql(
    source: str = "cells4",
    value_col: str = "ndvi",
    rounds: int = FILL_ROUNDS,
) -> str:
    """Unrolled fixed-iteration twin of :func:`fill_sinks` (the
    _pagerank_sql CTE-chain shape; one CTE per round). Compose after
    the cells CTEs."""
    vals = ", ".join(f"({d})" for d in R1_DELTAS)
    sent = "1000000000.0"
    # every wt references w{t-1} exactly ONCE (base rows come from the
    # stable fs_b — z/nn never change): a twice-referenced loop CTE
    # inlines 2^rounds deep in DuckDB (the _cost_relax double-reference
    # lesson, twin side); fs_edges/fs_b are MATERIALIZED because all
    # ``rounds`` iterations reference them
    ctes = [
        f"""fs_edges AS MATERIALIZED (
  SELECT c.cell, n.cell AS nbr
  FROM {source} c CROSS JOIN fs_offsets o
  JOIN {source} n ON n.cell = c.cell + o.delta
)""",
        "fs_deg AS (SELECT cell, COUNT(*) AS nn FROM fs_edges GROUP BY cell)",
        f"""fs_b AS MATERIALIZED (
  SELECT s.cell, s.{value_col} AS z, COALESCE(d.nn, 0) AS nn
  FROM {source} s LEFT JOIN fs_deg d ON d.cell = s.cell
)""",
        f"w0 AS (SELECT cell, nn, CASE WHEN nn < 6 THEN z ELSE {sent} END AS w FROM fs_b)",
    ]
    # each round MATERIALIZED as well: inlined, the 24-deep nested tree
    # costs DuckDB's optimizer ~2 minutes (measured) vs sub-second when
    # every round executes once over the #cells-row table
    for t in range(1, int(rounds) + 1):
        ctes.append(
            f"""w{t} AS MATERIALIZED (
  SELECT b.cell, b.nn,
         CASE WHEN b.nn < 6 THEN b.z ELSE GREATEST(b.z, m.mn) END AS w
  FROM fs_b b
  LEFT JOIN (
    SELECT e.cell, MIN(p.w) AS mn
    FROM fs_edges e JOIN w{t - 1} p ON p.cell = e.nbr
    GROUP BY e.cell
  ) m ON m.cell = b.cell
)"""
        )
    chain = ",\n".join(ctes)
    return f"""
fs_offsets (delta) AS (VALUES {vals}),
{chain}
""".strip()


# -- Strahler stream order -------------------------------------------

#: bottom-up propagation horizon: order is exact for every cell whose
#: flow-tree HEIGHT is <= rounds (the COST_ROUNDS bounded-horizon
#: contract); the fixture's longest flow path is 4 edges, pinned by
#: the unbounded-fixpoint differential pytest
STRAHLER_ROUNDS = 8


def stream_order(
    cells: DataFrame, value_col: str = "ndvi", rounds: int = STRAHLER_ROUNDS
) -> DataFrame:
    """Strahler order of the D6 flow forest — the stream-hierarchy
    classifier Shreve's additive :func:`stream_magnitude` cannot
    express (Strahler increments only when two EQUAL-order tributaries
    meet; the backlog documented it out pending the bounded-horizon
    contract cost_distance later established):

        order(leaf) = 1
        order(v)    = m + 1 if ≥ 2 children reach m = max child order,
                      m     otherwise

    computed as a Jacobi iteration from all-ones (orders only ever
    grow, so after t rounds every cell of flow-tree height ≤ t is
    final). The per-round combine folds (max child order, ≥2-at-max
    flag) into ONE integer key ``k = ord·2 + flag`` (max(k) picks the
    max order and, within it, the flag — the cost_allocation
    integerize-the-argmin lesson), decoded as ``k div 2 + k % 2``.
    All-integer → tie-proof, twin-exact.

    Plan (100 TB): edges + base materialized once; each round is one
    equi-join + two hash aggregates + one left join keyed on the cell
    (the fill_sinks round shape, per-round localCheckpoint — the
    _cost_relax double-reference lesson). Output
    ``(cell, strahler_order)`` over every grid cell (non-stream cells
    carry their drainage-tree order; filter on upslope for channels).
    """
    fd = flow_direction(cells, value_col)
    edges = (
        fd.where(F.col("flow_to").isNotNull())
        .select(F.col("cell").alias("src"), F.col("flow_to").alias("dst"))
        .localCheckpoint()  # rounds consumers
    )
    base = cells.select("cell").localCheckpoint()  # rounds + 1 consumers
    o = base.select("cell", F.lit(1).cast("long").alias("ord"))
    for _ in range(int(rounds)):
        ca = (
            edges.join(
                o.select(F.col("cell").alias("src"), "ord"), "src"
            )
            .groupBy("dst", "ord")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        mm = ca.groupBy("dst").agg(
            F.max(
                F.col("ord") * 2 + (F.col("_cnt") >= 2).cast("long")
            ).alias("_k")
        )
        o = (
            base.join(mm, base["cell"] == mm["dst"], "left")
            .select(
                "cell",
                F.when(F.col("_k").isNull(), F.lit(1).cast("long"))
                .otherwise(F.expr("_k div 2 + _k % 2"))
                .alias("ord"),
            )
            .localCheckpoint()
        )
    return o.select("cell", F.col("ord").alias("strahler_order"))


def strahler_ctes(
    source: str = "cells4", rounds: int = STRAHLER_ROUNDS
) -> str:
    """Unrolled twin CTEs for :func:`stream_order` — compose AFTER
    :func:`flow_ctes` (consumes ``fd``). Every round references the
    previous one exactly once and is MATERIALIZED (the fill_sinks
    twin lesson: inlined chains cost DuckDB minutes)."""
    ctes = [
        "so_edges AS MATERIALIZED (SELECT cell AS src, flow_to AS dst FROM fd WHERE flow_to IS NOT NULL)",
        f"o0 AS MATERIALIZED (SELECT cell, CAST(1 AS BIGINT) AS ord FROM {source})",
    ]
    for t in range(1, int(rounds) + 1):
        ctes.append(
            f"""o{t} AS MATERIALIZED (
  SELECT b.cell,
         CASE WHEN m.k IS NULL THEN CAST(1 AS BIGINT)
              ELSE m.k // 2 + m.k % 2 END AS ord
  FROM {source} b
  LEFT JOIN (
    SELECT ca.dst, MAX(ca.ord * 2 + CASE WHEN ca.cnt >= 2 THEN 1 ELSE 0 END) AS k
    FROM (
      SELECT e.dst, p.ord, COUNT(*) AS cnt
      FROM so_edges e JOIN o{t - 1} p ON p.cell = e.src
      GROUP BY 1, 2
    ) ca
    GROUP BY ca.dst
  ) m ON m.dst = b.cell
)"""
        )
    return ",\n".join(ctes)


def stream_networks(
    cells: DataFrame,
    value_col: str = "ndvi",
    threshold: int = STREAM_THRESHOLD,
    max_rounds: int = 16,
    fd: DataFrame | None = None,
) -> DataFrame:
    """Drainage-network labeling — connected components of the
    STREAM-CELL subgraph (cells with ``upslope_cells >= threshold``,
    edges = flow edges whose BOTH endpoints are stream cells): the
    star-CC core's 5th graph domain (near-dup / embedding / basin /
    raster-patch / stream network). Per network: cell count, source
    count (stream cells with zero stream inflows), confluence count
    (≥ 2 stream inflows), the unique outlet (the one stream cell with
    no outgoing stream edge — the directed forest inside a component
    drains to exactly one exit, the watershed one-sink argument) and
    the peak accumulation. Integers/ids only — tie-proof. Output
    ``(network, n_cells, n_sources, n_confluences, outlet_cell,
    max_upslope)``.

    Plan (100 TB): fd is checkpointed ONCE and feeds the accumulation
    closure + edge restriction (the multi-consumer class); the stream
    set is checkpointed ahead of its 4 consumers (both edge endpoints,
    labels, the aggregate); the CC then runs on the stream subgraph —
    orders of magnitude smaller than the grid (that asymmetry is the
    whole point of extracting the network before labeling it)."""
    from cuda_gis_smoothing_spark.operators.dedup import star_components

    if fd is None:
        fd = flow_direction(cells, value_col).localCheckpoint()
    acc = flow_accumulation(cells, value_col, max_rounds, fd=fd)
    stream = (
        acc.where(F.col("upslope_cells") >= threshold)
        .select("cell", "upslope_cells")
        .localCheckpoint()
    )
    sedges = (
        fd.where(F.col("flow_to").isNotNull())
        .join(stream.select("cell"), "cell", "left_semi")
        .join(
            stream.select(F.col("cell").alias("flow_to")),
            "flow_to",
            "left_semi",
        )
        .select("cell", "flow_to")
        .localCheckpoint()
    )
    comp = star_components(
        sedges.select(F.col("cell").alias("a"), F.col("flow_to").alias("b")),
        stream.select("cell"),
        "cell",
    ).select("cell", F.col("component").alias("network"))
    inflows = sedges.groupBy(F.col("flow_to").alias("cell")).agg(
        F.count(F.lit(1)).alias("_n_in")
    )
    has_out = sedges.select("cell").distinct().withColumn(
        "_has_out", F.lit(1)
    )
    return (
        comp.join(stream, "cell")
        .join(inflows, "cell", "left")
        .join(has_out, "cell", "left")
        .groupBy("network")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum((F.coalesce("_n_in", F.lit(0)) == 0).cast("long"))
            .cast("long")
            .alias("n_sources"),
            F.sum((F.coalesce("_n_in", F.lit(0)) >= 2).cast("long"))
            .cast("long")
            .alias("n_confluences"),
            F.min(F.when(F.col("_has_out").isNull(), F.col("cell"))).alias(
                "outlet_cell"
            ),
            F.max("upslope_cells").alias("max_upslope"),
        )
    )


def stream_network_ctes(threshold: int = STREAM_THRESHOLD) -> str:
    """DuckDB twin CTEs for :func:`stream_networks` — compose after
    ``flow_ctes()`` + ``flow_closure_ctes()``: stream set from the
    shared closure, edge restriction, symmetric recursive closure
    (min-reachable label = the star-CC contract), inflow counts."""
    return f"""
sn_acc AS (SELECT dst, COUNT(*) AS n FROM freach GROUP BY dst),
sn_cells AS (
  SELECT c.cell, CAST(1 + COALESCE(a.n, 0) AS BIGINT) AS up
  FROM cells4 c LEFT JOIN sn_acc a ON a.dst = c.cell
  WHERE 1 + COALESCE(a.n, 0) >= {threshold}
),
sn_edges AS (
  SELECT f.cell AS a, f.flow_to AS b
  FROM fd f JOIN sn_cells s ON s.cell = f.cell
            JOIN sn_cells t ON t.cell = f.flow_to
),
sn_sym AS (SELECT a, b FROM sn_edges UNION ALL SELECT b, a FROM sn_edges),
sn_reach(a, b) AS (
  SELECT a, b FROM sn_sym
  UNION
  SELECT r.a, s.b FROM sn_reach r JOIN sn_sym s ON r.b = s.a WHERE s.b <> r.a
),
sn_comp AS (
  SELECT s.cell, s.up, LEAST(s.cell, COALESCE(r.mn, s.cell)) AS network
  FROM sn_cells s
  LEFT JOIN (SELECT a, MIN(b) AS mn FROM sn_reach GROUP BY a) r ON r.a = s.cell
),
sn_in AS (SELECT b AS cell, COUNT(*) AS n_in FROM sn_edges GROUP BY b),
sn_out AS (SELECT DISTINCT a AS cell FROM sn_edges)
""".strip()


STREAM_NETWORKS_SELECT = """
SELECT p.network,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN COALESCE(i.n_in, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sources,
       CAST(SUM(CASE WHEN COALESCE(i.n_in, 0) >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_confluences,
       MIN(CASE WHEN o.cell IS NULL THEN p.cell END) AS outlet_cell,
       MAX(p.up) AS max_upslope
FROM sn_comp p
LEFT JOIN sn_in i ON i.cell = p.cell
LEFT JOIN sn_out o ON o.cell = p.cell
GROUP BY p.network
""".strip()
