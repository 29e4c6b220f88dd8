"""Grid statistics operators: A5 neighbor stats, A6 edge count,
O3 locality metric, O4 quadrant histogram.

References:
  * A5 printStats        /root/reference/src/cpu/hex_smooth_naive.cpp:118-133
  * A6 total connections /root/reference/src/cpu/hex_smooth_optimized.cpp:62,78-79
  * O3 locality metric   /root/reference/src/cuda/hex_smooth_cuda_v5.cu:551-559
  * O4 quadrant counts   /root/reference/src/cuda/hex_smooth_cuda_v5.cu:301-318
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cuda_gis_smoothing_spark.hexgrid import ENC, OFFSET
from cuda_gis_smoothing_spark.operators.smoothing import kring_edges
from cuda_gis_smoothing_spark.plans.partitioning import morton_col


def valid_edges(cells: DataFrame, k: int = 1) -> DataFrame:
    """Materialized valid adjacency (cell, nbr, ring): kring expansion
    semi-joined against the cell table (drops dangling/border refs)."""
    e = kring_edges(cells.select("cell"), k, include_center=False)
    return e.join(cells.select(F.col("cell").alias("nbr")), "nbr", "left_semi")


def neighbor_counts(cells: DataFrame, k: int = 1, ring: int | None = None) -> DataFrame:
    """Per-cell valid neighbor count — left join keeps 0-neighbor cells
    (the reference's isolated hexagons, D1 min=0). ``ring`` restricts to
    one ring (e.g. ring=2 → the J2 second-order cardinality)."""
    e = valid_edges(cells, k)
    if ring is not None:
        e = e.where(F.col("ring") == ring)
    cnt = e.groupBy("cell").agg(F.count("*").alias("n_neighbors"))
    return (
        cells.select("cell")
        .join(cnt, "cell", "left")
        .select("cell", F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"))
    )


def neighbor_stats(cells: DataFrame, k: int = 1) -> DataFrame:
    """A5+A6: one-row min/max/avg neighbor count + total edge count."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    return neighbor_counts(cells, k).agg(
        F.min("n_neighbors").alias("min_neighbors"),
        F.max("n_neighbors").alias("max_neighbors"),
        round6(F.avg("n_neighbors")).alias("avg_neighbors"),
        F.sum("n_neighbors").alias("total_edges"),
    )


def hotspot_zscore(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Getis-Ord-inspired hotspot score (simplified Gi*): per cell,
    the z-score of its NEIGHBORHOOD SUM ({cell} ∪ valid ring-1
    neighbors) against the global value distribution —
    ``(S - n·μ) / (σ·√n)`` with corpus mean μ and sample stddev σ.
    The classic local spatial-clustering detector ("where do high
    values cluster?") re-expressed Spark-first: one k-ring equi-join
    plus a 1-row broadcast of global stats, no windows. The full Gi*
    denominator's finite-population correction ``√((N-n)/(N-1))`` is
    deliberately omitted (documented simplification: it → 1 for
    n ≪ N, and the statistic stays monotone in the same local sum, so
    hotspot RANKING is unchanged).

    Output: ``(cell, n_local, local_sum, z_score)``; isolated cells
    (n_local = 1) score their own deviation. A zero-variance grid
    yields NULL z via NULLIF — identically cross-engine."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    vals = cells.select(F.col("cell").alias("nbr"), F.col(value_col).alias("_v"))
    nbrhood = (
        valid_edges(cells, 1)
        .select("cell", "nbr")
        .unionByName(cells.select("cell", F.col("cell").alias("nbr")))
    )
    local = (
        nbrhood.join(vals, "nbr")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_local"),
            F.sum("_v").alias("_s"),
        )
    )
    stats = cells.agg(
        F.avg(value_col).alias("_mu"), F.stddev(value_col).alias("_sd")
    )
    z = (F.col("_s") - F.col("n_local") * F.col("_mu")) / F.expr(
        "nullif(_sd * sqrt(n_local), 0.0d)"
    )
    return local.crossJoin(F.broadcast(stats)).select(
        "cell",
        "n_local",
        round6(F.col("_s")).alias("local_sum"),
        round6(z).alias("z_score"),
    )


def morans_i(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Global Moran's I — THE spatial-autocorrelation statistic ("is
    the surface clustered, random, or dispersed?"), binary ring-1
    contiguity weights:

        I = (n / W) · Σ_ij (x_i − μ)(x_j − μ) / Σ_i (x_i − μ)²

    with W = total directed valid edges. One row out:
    ``(n_cells, total_edges, morans_i)``.

    Spark shape: the cross-product term needs each edge's BOTH
    endpoint deviations — one k-ring equi-join at edge cardinality
    (the smoothing join's shape), then everything collapses to 1-row
    aggregates; μ is a 1-row broadcast. No windows, no iteration.
    The expected value under the null, −1/(n−1), is a trivial
    derivation for the caller; the z-score's variance formula (E[I²])
    needs only the same aggregates plus edge-degree counts — left out
    to keep the gate arithmetic minimal."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    mu = cells.agg(F.avg(value_col).alias("_mu"))
    dev = cells.crossJoin(F.broadcast(mu)).select(
        "cell", (F.col(value_col) - F.col("_mu")).alias("_d")
    )
    e = valid_edges(cells, 1).select("cell", "nbr")
    cross = (
        e.join(dev, "cell")
        .join(
            dev.select(F.col("cell").alias("nbr"), F.col("_d").alias("_dn")),
            "nbr",
        )
        .agg(
            F.count(F.lit(1)).alias("_W"),
            F.sum(F.col("_d") * F.col("_dn")).alias("_num"),
        )
    )
    den = dev.agg(
        F.count(F.lit(1)).alias("_n"), F.sum(F.col("_d") * F.col("_d")).alias("_den")
    )
    return cross.crossJoin(F.broadcast(den)).select(
        F.col("_n").cast("long").alias("n_cells"),
        F.col("_W").cast("long").alias("total_edges"),
        round6(
            (F.col("_n") / F.col("_W")) * F.col("_num") / F.col("_den")
        ).alias("morans_i"),
    )


def geary_c(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Global Geary's C — the squared-difference complement of
    :func:`morans_i` (sensitive to LOCAL dissimilarity where Moran's I
    measures global covariance; the pair is the standard spatial-
    autocorrelation report), binary ring-1 contiguity weights:

        C = (n − 1) · Σ_ij (x_i − x_j)² / (2W · Σ_i (x_i − μ)²)

    with W = total directed valid edges (each unordered pair counted
    twice in both Σ_ij and W, so the statistic equals the unordered
    form). C < 1 ⇒ positive autocorrelation, ≈1 random, >1 dispersed.
    One row out: ``(n_cells, total_edges, geary_c)``.

    Spark shape: identical to Moran's I — one edge-cardinality k-ring
    equi-join for the pair term, 1-row aggregates and a 1-row μ
    broadcast for the denominator; no windows, no iteration."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    vals = cells.select("cell", F.col(value_col).alias("_x"))
    e = valid_edges(cells, 1).select("cell", "nbr")
    cross = (
        e.join(vals, "cell")
        .join(
            vals.select(F.col("cell").alias("nbr"), F.col("_x").alias("_xn")),
            "nbr",
        )
        .agg(
            F.count(F.lit(1)).alias("_W"),
            F.sum(
                (F.col("_x") - F.col("_xn")) * (F.col("_x") - F.col("_xn"))
            ).alias("_num"),
        )
    )
    mu = cells.agg(F.avg(value_col).alias("_mu"))
    den = (
        cells.crossJoin(F.broadcast(mu))
        .select((F.col(value_col) - F.col("_mu")).alias("_d"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_d") * F.col("_d")).alias("_den"),
        )
    )
    return cross.crossJoin(F.broadcast(den)).select(
        F.col("_n").cast("long").alias("n_cells"),
        F.col("_W").cast("long").alias("total_edges"),
        round6(
            (F.col("_n") - 1) * F.col("_num") / (2.0 * F.col("_W") * F.col("_den"))
        ).alias("geary_c"),
    )


def local_morans_i(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Local Moran's I (Anselin LISA) — the per-cell decomposition of
    :func:`morans_i` that turns "is the surface clustered?" into
    "WHERE is it clustered?":

        I_i = (x_i − μ) / m₂ · Σ_j w_ij (x_j − μ),   m₂ = Σ(x−μ)²/n

    binary ring-1 contiguity, plus the cluster-quadrant label the LISA
    map colors: HH/LL (own and neighbor-mean deviation same-signed),
    HL/LH (outliers), ISO for cells with no valid neighbors (I_i = 0,
    the empty sum). Completes the family: global I, global C
    (:func:`geary_c`), Gi* (:func:`hotspot_zscore`), local I.

    Output ``(cell, n_neighbors, local_i, quadrant)``. Spark shape:
    the SAME one k-ring edge join + 1-row broadcast aggregates as the
    global statistic — the per-cell Σ_j is a cell-keyed hash
    aggregate; a LEFT join keeps isolated cells. Cross-engine note:
    the quadrant label thresholds raw deviation SIGNS, so a cell whose
    value sits within fp-association noise of the corpus mean could
    legally label differently between engines (same class as the
    round6-boundary near-ties the fuzz suites deliberately don't
    randomize); the fixture has no such cell at either gated scale."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    mu = cells.agg(F.avg(value_col).alias("_mu"))
    dev = (
        cells.crossJoin(F.broadcast(mu))
        .select("cell", (F.col(value_col) - F.col("_mu")).alias("_d"))
        .localCheckpoint()  # three consumers: m2, edge join, cell join
    )
    m2 = dev.agg((F.sum(F.col("_d") * F.col("_d")) / F.count(F.lit(1))).alias("_m2"))
    nbr_sum = (
        valid_edges(cells, 1)
        .select("cell", "nbr")
        .join(dev.select(F.col("cell").alias("nbr"), F.col("_d").alias("_dn")), "nbr")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("_k"), F.sum("_dn").alias("_sn"))
    )
    j = (
        dev.join(nbr_sum, "cell", "left")
        .crossJoin(F.broadcast(m2))
        .select(
            "cell",
            F.coalesce(F.col("_k"), F.lit(0)).cast("long").alias("n_neighbors"),
            (F.col("_d") / F.col("_m2") * F.coalesce(F.col("_sn"), F.lit(0.0))).alias(
                "_i"
            ),
            "_d",
            F.coalesce(F.col("_sn"), F.lit(0.0)).alias("_snz"),
        )
    )
    quadrant = (
        F.when(F.col("n_neighbors") == 0, F.lit("ISO"))
        .when((F.col("_d") >= 0) & (F.col("_snz") >= 0), F.lit("HH"))
        .when((F.col("_d") < 0) & (F.col("_snz") < 0), F.lit("LL"))
        .when(F.col("_d") >= 0, F.lit("HL"))
        .otherwise(F.lit("LH"))
    )
    return j.select(
        "cell", "n_neighbors", round6(F.col("_i")).alias("local_i"),
        quadrant.alias("quadrant"),
    )


def join_counts(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Join-count statistics (Cliff & Ord) — the BINARY-mark member of
    the spatial-autocorrelation family (global I/C measure continuous
    covariance; join counts answer the same question for a two-color
    map): mark each cell Black iff its value exceeds the corpus mean,
    then count Black-Black, Black-White, and White-White joins over the
    ring-1 contiguity edges. Clustering ⇒ BB+WW above their random-
    labeling expectation, BW below. One row out:
    ``(n_cells, n_black, total_edges, bb_edges, bw_edges, ww_edges)``
    — directed edge counts (each unordered join counted twice, the
    same W convention as :func:`morans_i`), all integers, so the gate
    is tie-proof EXCEPT at the mark boundary itself: a cell at
    fp-association-noise distance from the mean could legally flip
    color cross-engine (the local_morans_i quadrant caveat; the
    fixture has no such cell at either gated scale).

    Spark shape: the family's standard plan — 1-row μ broadcast, one
    edge-cardinality k-ring equi-join, everything collapsing to 1-row
    integer aggregates; no windows, no iteration."""
    mu = cells.agg(F.avg(value_col).alias("_mu"))
    mark = (
        cells.crossJoin(F.broadcast(mu))
        .select(
            "cell", (F.col(value_col) > F.col("_mu")).cast("int").alias("_m")
        )
        .localCheckpoint()  # three consumers: totals, both edge ends
    )
    e = valid_edges(cells, 1).select("cell", "nbr")
    joins = (
        e.join(mark, "cell")
        .join(
            mark.select(F.col("cell").alias("nbr"), F.col("_m").alias("_mn")),
            "nbr",
        )
        .agg(
            F.count(F.lit(1)).alias("_W"),
            F.sum(F.col("_m") * F.col("_mn")).alias("_bb"),
            F.sum((1 - F.col("_m")) * (1 - F.col("_mn"))).alias("_ww"),
        )
    )
    tot = mark.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_m").alias("_black")
    )
    return joins.crossJoin(F.broadcast(tot)).select(
        F.col("_n").cast("long").alias("n_cells"),
        F.col("_black").cast("long").alias("n_black"),
        F.col("_W").cast("long").alias("total_edges"),
        F.col("_bb").cast("long").alias("bb_edges"),
        (F.col("_W") - F.col("_bb") - F.col("_ww")).cast("long").alias("bw_edges"),
        F.col("_ww").cast("long").alias("ww_edges"),
    )


def bivariate_morans_i(
    cells: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Bivariate Moran's I — the CROSS-variable member of the spatial-
    autocorrelation family ("does X here predict Y next door?" — e.g.
    vegetation vs sampling density, price vs demand):

        I_xy = (n / W) · Σ_edges (x_i − μx)(y_j − μy)
               / √(Σ_i (x_i − μx)² · Σ_i (y_i − μy)²)

    over directed ring-1 contiguity edges (x from the edge SOURCE, y
    from the NEIGHBOR — the asymmetric convention; swap columns for
    I_yx). NOTE the two variables must not be affine images of each
    other (the grid's derived bands are ndvi-linear, so this gate pairs
    ndvi with OBSERVATION DENSITY, which is not).

    Spark shape: the morans_i plan verbatim with a second deviation —
    one edge-cardinality k-ring equi-join, 1-row broadcast means,
    everything collapsing to 1-row aggregates. Output one row:
    ``(n_cells, total_edges, bivariate_i)``."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    mu = cells.agg(F.avg(x_col).alias("_mx"), F.avg(y_col).alias("_my"))
    dev = cells.crossJoin(F.broadcast(mu)).select(
        "cell",
        (F.col(x_col) - F.col("_mx")).alias("_dx"),
        (F.col(y_col) - F.col("_my")).alias("_dy"),
    )
    e = valid_edges(cells, 1).select("cell", "nbr")
    cross = (
        e.join(dev.select("cell", "_dx"), "cell")
        .join(
            dev.select(F.col("cell").alias("nbr"), F.col("_dy").alias("_dyn")),
            "nbr",
        )
        .agg(
            F.count(F.lit(1)).alias("_W"),
            F.sum(F.col("_dx") * F.col("_dyn")).alias("_num"),
        )
    )
    den = dev.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_dx") * F.col("_dx")).alias("_sx"),
        F.sum(F.col("_dy") * F.col("_dy")).alias("_sy"),
    )
    return cross.crossJoin(F.broadcast(den)).select(
        F.col("_n").cast("long").alias("n_cells"),
        F.col("_W").cast("long").alias("total_edges"),
        round6(
            (F.col("_n") / F.col("_W"))
            * F.col("_num")
            / F.sqrt(F.col("_sx") * F.col("_sy"))
        ).alias("bivariate_i"),
    )


def cell_pagerank(
    cells: DataFrame, damping: float = 0.85, iters: int = 5
) -> DataFrame:
    """Fixed-iteration PageRank over the ring-1 contiguity graph — the
    graph-centrality member of the grid-analytics family (CC finds
    components; PageRank ranks cells by how reachable they are through
    the adjacency — border/hole cells score low, interior cells high):

        pr⁰(c)   = 1 / n
        prᵗ⁺¹(c) = (1 − d) / n  +  d · Σ_{b→c} prᵗ(b) / deg(b)

    with deg = valid ring-1 out-degree (the adjacency is symmetric).
    Zero-degree (isolated) cells hold the teleport term only and their
    mass leaves the system — the standard simple formulation, identical
    in the twin. ITERS IS FIXED (not run-to-convergence): a fixed
    unrolling is exactly expressible as ``iters`` chained SQL CTEs, so
    the driver hash-gates an ITERATIVE algorithm — the star-CC
    precedent, without its integer-only restriction. Per-iteration
    neighbor sums aggregate ≤ 6 doubles (fp-association noise ~1e-16,
    absorbed by round6's 1e-9 nudge — the smoothing-gate class).

    Spark shape: edges+degree materialized ONCE (localCheckpoint —
    ``iters`` consumers would otherwise re-derive the k-ring join per
    iteration, the multi-consumer re-execution class), then per
    iteration one equi-join + one hash aggregate + one left join; n is
    a 1-row broadcast, never a collect. At 100 TB each iteration is
    the same shuffle-on-cell the smoothing pass runs.

    Output: (cell, pagerank round6), one row per cell."""
    e = valid_edges(cells, 1).select(
        F.col("cell").alias("src"), F.col("nbr").alias("dst")
    )
    return pagerank_rounds(cells, e, damping, iters, id_col="cell")


def pagerank_rounds(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    id_col: str = "cell",
) -> DataFrame:
    """The fixed-iteration PageRank core over an arbitrary DIRECTED
    ``(src, dst)`` edge table — extracted from :func:`cell_pagerank` so
    other graph domains (the banded embedding near-dup graph) run the
    IDENTICAL rounds (the star_components one-kernel-many-domains
    precedent). Undirected callers pass both orientations. Same
    contracts as the cell form: fixed unrolling (twin = chained CTEs),
    zero-degree nodes hold the teleport term, per-node inbound sums are
    degree-bounded doubles whose association noise round6 absorbs.
    Output ``(id_col, pagerank)``."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    edges = edges.join(deg, "src").localCheckpoint()  # iters consumers
    base = nodes.select(id_col).localCheckpoint()  # iters + 2 consumers
    nn = base.agg(F.count(F.lit(1)).alias("_n"))
    pr = base.crossJoin(F.broadcast(nn)).select(
        id_col, (F.lit(1.0) / F.col("_n")).alias("pr")
    )
    teleport = F.lit(1.0 - damping) / F.col("_n")
    for _ in range(iters):
        inb = (
            edges.join(pr.withColumnRenamed(id_col, "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("_deg")).alias("_s"))
        )
        pr = (
            base.join(inb, base[id_col] == inb["dst"], "left")
            .crossJoin(F.broadcast(nn))
            .select(
                id_col,
                (
                    teleport
                    + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr.select(id_col, round6(F.col("pr")).alias("pagerank"))


def semivariogram(
    cells: DataFrame, value_col: str = "ndvi", k: int = 2
) -> DataFrame:
    """Empirical semivariogram over the grid's ring lags — the
    geostatistician's spatial-continuity report (what kriging fits its
    model to): per lag h (= ring number),

        γ(h) = Σ_{(i,j) at lag h} (x_i − x_j)² / (2 · N_h)

    over DIRECTED valid edges (each unordered pair twice in both the
    sum and N_h, so γ equals the classic unordered form). Output one
    row per ring: ``(ring, n_pairs, gamma)`` — rising γ(1) → γ(2) is
    spatial continuity; flat is nugget-dominated noise.

    Spark shape: ONE k-ring equi-join at edge cardinality carrying the
    ring label (the cell_edges adjacency), then a ring-keyed hash
    aggregate — k rows out."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    vals = cells.select("cell", F.col(value_col).alias("_x"))
    e = valid_edges(cells, k).select("cell", "nbr", "ring")
    return (
        e.join(vals, "cell")
        .join(
            vals.select(F.col("cell").alias("nbr"), F.col("_x").alias("_xn")),
            "nbr",
        )
        .groupBy("ring")
        .agg(
            F.count(F.lit(1)).alias("_np"),
            F.sum(
                (F.col("_x") - F.col("_xn")) * (F.col("_x") - F.col("_xn"))
            ).alias("_s"),
        )
        .select(
            F.col("ring").cast("int").alias("ring"),
            F.col("_np").cast("long").alias("n_pairs"),
            round6(F.col("_s") / (2.0 * F.col("_np"))).alias("gamma"),
        )
    )


def directional_axes(k: int) -> list[tuple[int, int, int, int]]:
    """(delta, ring, axis_dq, axis_dr) rows for every k-ring offset,
    where (axis_dq, axis_dr) is the offset's CANONICAL axis — opposite
    directions merged by sign-normalizing on (dq > 0, then dr > 0), so
    ring 1 yields 3 axes and ring 2 six. Constants, shared verbatim by
    the Spark operator and the DuckDB twin builder."""
    from cuda_gis_smoothing_spark.hexgrid import kring_offsets, neighbor_delta

    out = []
    for dq, dr, ring in kring_offsets(k, include_center=False):
        sgn = 1 if (dq > 0 or (dq == 0 and dr > 0)) else -1
        out.append((neighbor_delta(dq, dr), ring, dq * sgn, dr * sgn))
    return out


def directional_semivariogram(
    cells: DataFrame, value_col: str = "ndvi", k: int = 2
) -> DataFrame:
    """Per-DIRECTION empirical semivariogram — the anisotropy report
    (does spatial continuity differ along the grid's axes?): the
    :func:`semivariogram` sum split by each lag's canonical hex axis
    (opposite directions merged, so every unordered pair lands on one
    axis twice and γ keeps the classic form). Output one row per
    (ring, axis): ``(ring, dq, dr, n_pairs, gamma)`` — axis-dependent
    γ at the same ring is anisotropy (directional trends, striping),
    which an isotropic kriging model would misfit; per-ring sums of
    n_pairs and the pair-weighted γ mean reproduce the isotropic
    semivariogram exactly (tested).

    Spark shape: identical to :func:`semivariogram` except the offsets
    ride as a 18-row literal struct array (explode of constants — no
    extra join), each carrying its PRECOMPUTED canonical axis, so the
    group key never does float or sign arithmetic cross-engine."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    offs = F.array(
        *[
            F.struct(
                F.lit(delta).alias("delta"),
                F.lit(ring).alias("ring"),
                F.lit(adq).alias("dq"),
                F.lit(adr).alias("dr"),
            )
            for delta, ring, adq, adr in directional_axes(k)
        ]
    )
    vals = cells.select("cell", F.col(value_col).alias("_x"))
    e = vals.select("cell", "_x", F.explode(offs).alias("_o")).select(
        "_x",
        (F.col("cell") + F.col("_o.delta")).alias("nbr"),
        F.col("_o.ring").alias("ring"),
        F.col("_o.dq").alias("dq"),
        F.col("_o.dr").alias("dr"),
    )
    return (
        e.join(
            vals.select(F.col("cell").alias("nbr"), F.col("_x").alias("_xn")),
            "nbr",
        )
        .groupBy("ring", "dq", "dr")
        .agg(
            F.count(F.lit(1)).alias("_np"),
            F.sum(
                (F.col("_x") - F.col("_xn")) * (F.col("_x") - F.col("_xn"))
            ).alias("_s"),
        )
        .select(
            F.col("ring").cast("int").alias("ring"),
            F.col("dq").cast("int").alias("dq"),
            F.col("dr").cast("int").alias("dr"),
            F.col("_np").cast("long").alias("n_pairs"),
            round6(F.col("_s") / (2.0 * F.col("_np"))).alias("gamma"),
        )
    )


def cell_gradient(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Per-cell gradient by central differences along the two axial
    hex directions — the slope/aspect primitive of raster GIS (the
    reference smooths the field; this measures how steeply it varies
    and in which axis): grad_q = (x(q+1,r) − x(q−1,r))/2, grad_r
    likewise, magnitude = √(grad_q² + grad_r²). Cells missing either
    axis neighbor (grid border/holes) are EXCLUDED — central
    differences aren't defined there, and one-sided fallbacks would
    silently mix estimator orders (documented contract, like the
    strict-ring-2 hole semantics). One 4-neighbor equi-join via a
    literal offsets array; all float math is per-row over exact
    grid values. Output ``(cell, grad_q, grad_r, grad_mag)``."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.hexgrid import ENC

    vals = cells.select("cell", F.col(value_col).alias("_x"))

    def nbr(delta: int, alias: str) -> DataFrame:
        return vals.select(
            (F.col("cell") - delta).alias("cell"), F.col("_x").alias(alias)
        )

    gq = (F.col("_qp") - F.col("_qm")) / 2.0
    gr = (F.col("_rp") - F.col("_rm")) / 2.0
    return (
        vals.join(nbr(ENC, "_qp"), "cell")
        .join(nbr(-ENC, "_qm"), "cell")
        .join(nbr(1, "_rp"), "cell")
        .join(nbr(-1, "_rm"), "cell")
        .select(
            "cell",
            round6(gq).alias("grad_q"),
            round6(gr).alias("grad_r"),
            round6(F.sqrt(gq * gq + gr * gr)).alias("grad_mag"),
        )
    )


#: measured window-vs-bucketed crossover (32 cores, see docstring)
LOCALITY_WINDOW_MAX_ROWS = 10_000_000


def locality_metric(cells: DataFrame, strategy: str = "auto") -> DataFrame:
    """O3: avg |original-position distance| between consecutive cells in
    Morton order — the reference's post-reorder locality report (66.37,
    results/benchmarks/extended_neighborhoods_study_5393971.out:10).

    "Original position" = rank in cell-id order (the reference's array
    index); the metric is how far apart Morton-consecutive cells sit in
    the original layout.

    Two physical strategies, identical results (parametrized pytest):

    * ``window`` — plain ``Window.orderBy`` ranks + lag. One-partition
      sort: fastest below the crossover (stage overhead dominates
      there) but holds the whole table in a single task — OOM, not
      slowdown, at 10^9 rows.
    * ``bucketed`` — both global orderings through
      ``plans.partitioning.global_ranks`` (deterministic range buckets
      + local sort + O(num_buckets) offset prefix sum); the "lag" is a
      self-join on the dense Morton-order position (zpos == zpos - 1).
      Partition-parallel at any scale; plan-asserted in
      tests/test_plans.py.

    ``auto`` (default) picks by row count at the measured ~10M-cell
    crossover (32 cores: window 4.6 s vs bucketed 12.4 s at 5M;
    bucketed 34.5 s vs window 51.5 s at 30M, and the window's single
    task OOMs at 10^9) — one extra count() pass, which is metadata-cheap
    on a materialized table and one aggregate execution on a computed
    input.
    """
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.plans.partitioning import global_ranks

    if strategy not in ("auto", "window", "bucketed"):
        raise ValueError("strategy must be auto, window, or bucketed")
    z = cells.select("cell").select(F.col("cell"), morton_col("cell").alias("zkey"))
    if strategy == "auto":
        strategy = (
            "window" if z.count() <= LOCALITY_WINDOW_MAX_ROWS else "bucketed"
        )
    if strategy == "window":
        from pyspark.sql import Window

        zi = z.withColumn("idx", F.row_number().over(Window.orderBy("cell")))
        d = F.abs(
            F.col("idx") - F.lag("idx").over(Window.orderBy("zkey", "cell"))
        )
        return zi.select(d.alias("d")).agg(
            round6(F.avg("d")).alias("avg_index_distance")
        )
    with_idx = global_ranks(z, ["cell"], "idx")
    with_zpos = global_ranks(with_idx, ["zkey", "cell"], "zpos")
    prev = with_zpos.select(
        (F.col("zpos") + 1).alias("zpos"), F.col("idx").alias("pidx")
    )
    return (
        with_zpos.join(prev, "zpos")
        .select(F.abs(F.col("idx") - F.col("pidx")).alias("d"))
        .agg(round6(F.avg("d")).alias("avg_index_distance"))
    )


def quadrant_histogram(cells: DataFrame) -> DataFrame:
    """O4: cell counts per (q, r) quadrant around the grid's midpoint."""
    q = (F.col("cell") / ENC).cast("long") - OFFSET
    r = (F.col("cell") % ENC) - OFFSET
    mids = cells.agg(
        F.avg(q).alias("mq"), F.avg(r).alias("mr")
    )
    c = cells.select("cell", q.alias("q"), r.alias("r")).crossJoin(F.broadcast(mids))
    return (
        c.select(
            (F.col("q") >= F.col("mq")).cast("int").alias("q_hi"),
            (F.col("r") >= F.col("mr")).cast("int").alias("r_hi"),
        )
        .groupBy("q_hi", "r_hi")
        .agg(F.count("*").alias("n_cells"))
    )


def value_patches(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Raster region labeling (blob / patch extraction): connected
    components of the ABOVE-MEAN cells over ring-1 contiguity — the
    landscape-ecology "patch" primitive (contiguous high-NDVI stands),
    and the raster analog of the near-dup cluster labeling. One row
    per patch: ``(patch_id, n_cells, mean_<value_col>)`` with patch_id
    = the component's smallest cell id.

    Shares :func:`~cuda_gis_smoothing_spark.operators.dedup.star_components`
    (large-star/small-star, O(log n) rounds) with the text and
    embedding dedup families — one CC core, three graph domains; the
    DuckDB twin is a recursive closure over the SAME marked edge set
    (the embedding_components precedent). Mark-boundary caveat as in
    :func:`join_counts`: a cell at fp-noise distance from μ could
    legally flip sides cross-engine (no such cell in the fixture at
    either gated scale).

    Plan (100 TB): 1-row μ broadcast → marked-cell filter (checkpointed
    once: it feeds both edge endpoints, the node list, and the final
    stats join — the multi-consumer class) → ring-1 equi-join edges
    among marked cells only → star CC → patch-keyed hash aggregate.
    """
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.dedup import star_components

    mu = cells.agg(F.avg(value_col).alias("_mu"))
    marked = (
        cells.crossJoin(F.broadcast(mu))
        .where(F.col(value_col) > F.col("_mu"))
        .select("cell", value_col)
        .localCheckpoint()
    )
    edges = valid_edges(marked, 1).select(
        F.col("cell").alias("a"), F.col("nbr").alias("b")
    )
    comp = star_components(edges, marked.select("cell"), id_col="cell")
    return (
        comp.join(marked, "cell")
        .groupBy(F.col("component").alias("patch_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            round6(F.avg(value_col)).alias(f"mean_{value_col}"),
        )
    )


def patch_metrics(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Landscape-ecology patch SHAPE metrics over the same above-mean
    patches as :func:`value_patches`: per patch, cell count, hex
    PERIMETER (exposed cell sides: ``6·n − directed internal edges`` —
    a side is hidden iff the neighbor is in the same patch, and
    adjacent marked cells are same-patch by CC definition) and a hex
    shape index ``perimeter / (6·sqrt(n))`` (1.0 for a lone hexagon,
    growing with boundary complexity — the FRAGSTATS shape-index
    analog). Perimeter is pure integers; the index divides two
    correctly-rounded scalars computed from integers in the identical
    op sequence on both engines (the axis_visibility exactness class),
    then round6. Mark-boundary caveat as in :func:`value_patches`.

    Plan (100 TB): 1-row μ broadcast → marked filter (checkpointed:
    feeds both edge endpoints and the size aggregate) → ring-1
    equi-join edges (checkpointed: feeds the CC core AND the internal-
    edge count) → star CC → two patch-keyed hash aggregates.
    """
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.dedup import star_components

    mu = cells.agg(F.avg(value_col).alias("_mu"))
    marked = (
        cells.crossJoin(F.broadcast(mu))
        .where(F.col(value_col) > F.col("_mu"))
        .select("cell")
        .localCheckpoint()
    )
    edges = (
        valid_edges(marked, 1)
        .select(F.col("cell").alias("a"), F.col("nbr").alias("b"))
        .localCheckpoint()  # feeds star CC and the internal-edge count
    )
    comp = star_components(edges, marked.select("cell"), id_col="cell")
    comp = comp.localCheckpoint()  # feeds sizes and the edge-side join
    sizes = comp.groupBy(F.col("component").alias("patch_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cells")
    )
    internal = (
        edges.join(comp, edges["a"] == comp["cell"])
        .groupBy(F.col("component").alias("patch_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("_ie"))
    )
    perim = (
        F.lit(6) * F.col("n_cells") - F.coalesce(F.col("_ie"), F.lit(0))
    ).cast("long")
    return (
        sizes.join(internal, "patch_id", "left")
        .select(
            "patch_id",
            "n_cells",
            perim.alias("perimeter"),
            round6(
                perim.cast("double")
                / (F.lit(6.0) * F.sqrt(F.col("n_cells").cast("double")))
            ).alias("shape_index"),
        )
    )


def landscape_summary(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Class-level landscape metrics over the above-mean patch mosaic
    (the FRAGSTATS class summary): patch count, total marked cells,
    largest-patch cells, LPI (largest / total marked), mean patch
    size, total perimeter and edge density (total perimeter / 6·grid
    cells). One row. Every aggregate is an INTEGER sum/max/count over
    :func:`patch_metrics` rows (association-free), the ratios are
    exact-integer-ratio divisions under round6 — tie-proof
    cross-engine. Plan: patch_metrics' aggregates + one 1-row reduce +
    a 1-row grid count broadcast."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    pm = patch_metrics(cells, value_col)
    total = cells.agg(F.count(F.lit(1)).cast("long").alias("_g"))
    agg = pm.agg(
        F.count(F.lit(1)).cast("long").alias("n_patches"),
        F.sum("n_cells").cast("long").alias("marked_cells"),
        F.max("n_cells").cast("long").alias("largest_patch"),
        F.sum("perimeter").cast("long").alias("total_perimeter"),
    )
    return agg.crossJoin(F.broadcast(total)).select(
        "n_patches",
        "marked_cells",
        "largest_patch",
        "total_perimeter",
        round6(
            F.col("largest_patch").cast("double")
            / F.col("marked_cells").cast("double")
        ).alias("lpi"),
        round6(
            F.col("marked_cells").cast("double")
            / F.col("n_patches").cast("double")
        ).alias("mean_patch_cells"),
        round6(
            F.col("total_perimeter").cast("double")
            / (F.lit(6.0) * F.col("_g").cast("double"))
        ).alias("edge_density"),
    )


def correlogram(cells: DataFrame, value_col: str = "ndvi", k: int = 2) -> DataFrame:
    """Spatial correlogram: Moran's I per ring distance 1..k — the
    range-of-dependence diagnostic (how fast autocorrelation decays
    with distance; the lattice sibling of :func:`semivariogram`, which
    reports the same structure as variance instead of correlation).
    One row per ring: ``(ring, n_cells, total_edges, morans_i)``;
    ring 1 reproduces :func:`morans_i` exactly by construction (same
    join, same aggregates — pinned in pytest).

    Spark shape: ONE k-ring equi-join at full edge cardinality with
    the ring label carried through (the cell_edges table), collapsing
    to a #rings-sized hash aggregate; μ and the deviation denominator
    are 1-row broadcasts. Still no windows, no iteration."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    mu = cells.agg(F.avg(value_col).alias("_mu"))
    dev = cells.crossJoin(F.broadcast(mu)).select(
        "cell", (F.col(value_col) - F.col("_mu")).alias("_d")
    )
    e = valid_edges(cells, k).select("cell", "nbr", "ring")
    cross = (
        e.join(dev, "cell")
        .join(
            dev.select(F.col("cell").alias("nbr"), F.col("_d").alias("_dn")),
            "nbr",
        )
        .groupBy("ring")
        .agg(
            F.count(F.lit(1)).alias("_W"),
            F.sum(F.col("_d") * F.col("_dn")).alias("_num"),
        )
    )
    den = dev.agg(
        F.count(F.lit(1)).alias("_n"), F.sum(F.col("_d") * F.col("_d")).alias("_den")
    )
    return cross.crossJoin(F.broadcast(den)).select(
        F.col("ring").cast("int").alias("ring"),
        F.col("_n").cast("long").alias("n_cells"),
        F.col("_W").cast("long").alias("total_edges"),
        round6((F.col("_n") / F.col("_W")) * F.col("_num") / F.col("_den")).alias(
            "morans_i"
        ),
    )


def cell_quantile_norm(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Rank-based (ECDF) normalization of a cell variable — the
    quantile-normalization preprocessing step (maps any value
    distribution onto the uniform grid; the raster analog of the ML
    feature transform). Output: (cell, <value_col>, ecdf) with ecdf =
    rank/n under the (value, cell) TOTAL order (ties broken by cell id
    so both engines assign identical ranks; rank/n is an
    integer-over-integer double — exact cross-engine).

    Plan (100 TB): ranks from quantile-boundary ``global_ranks``
    (partition-parallel — a float leading key degenerates the uniform
    integer-width cut to one bucket, so quantile cuts are REQUIRED
    here); n is a 1-row broadcast. No global sort."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.plans.partitioning import global_ranks

    base = cells.select("cell", value_col)
    n = base.agg(F.count(F.lit(1)).alias("_n"))
    ranked = global_ranks(
        base, [value_col, "cell"], out_col="_r", boundaries="quantile"
    )
    return ranked.crossJoin(F.broadcast(n)).select(
        "cell",
        value_col,
        round6(F.col("_r") / F.col("_n")).alias("ecdf"),
    )


def majority_filter(
    cells: DataFrame, k: int = 1, value_col: str = "ndvi", n_classes: int = 8
) -> DataFrame:
    """GIS majority (mode) filter — the CATEGORICAL smoothing the mean
    family can't express (land-cover / classified rasters: a cell takes
    its neighborhood's most common class, never an average of class
    ids). Class = ``floor_stable(value * n_classes)`` (the integer
    banding contract: floats never cross the gate), neighborhood =
    the cell plus its valid k-ring.

    Mode tie-break is DETERMINISTIC and cross-engine: highest count,
    then smallest class id — folded as one ``min(struct(-count, cls))``
    aggregate (the PQ struct-MIN argmin precedent), so the whole
    operator is two hash aggregates on the k-ring join, no window sort.
    Output: ``(cell, mode_class, mode_count, n_local)``.

    Plan (100 TB): identical shape to :func:`smooth` — one k-ring
    explode + equi-join + two groupBys that reuse the join's
    partitioning on ``cell``; map-side partials bound the first
    aggregate's shuffle by (cells x classes-present-locally).
    """
    from cuda_gis_smoothing_spark.functions.numeric import floor_stable
    from cuda_gis_smoothing_spark.operators.smoothing import kring_edges

    cls = cells.select(
        F.col("cell").alias("nbr"),
        floor_stable(F.col(value_col) * n_classes).cast("long").alias("cls"),
    )
    edges = kring_edges(cells.select("cell"), k, include_center=True)
    counts = (
        edges.join(cls, "nbr")
        .groupBy("cell", "cls")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    pick = F.min(F.struct((-F.col("_n")).alias("neg"), F.col("cls").alias("cls")))
    return (
        counts.groupBy("cell")
        .agg(pick.alias("_m"), F.sum("_n").alias("n_local"))
        .select(
            "cell",
            F.col("_m.cls").alias("mode_class"),
            (-F.col("_m.neg")).cast("long").alias("mode_count"),
            F.col("n_local").cast("long").alias("n_local"),
        )
    )


def focal_stats(
    cells: DataFrame, k: int = 1, value_col: str = "ndvi"
) -> DataFrame:
    """Focal statistics (the ArcGIS/GDAL focal block): per cell, count
    / mean / min / max / range of the value over {cell} ∪ its valid
    k-ring — the descriptive sibling of :func:`majority_filter` (mode)
    and :func:`operators.smoothing.smooth` (weighted mean). min/max
    are association-order-free so they cross the gate as raw doubles;
    mean and range go through round6. Output: ``(cell, n_local,
    focal_mean, focal_min, focal_max, focal_range)``.

    Plan (100 TB): the smooth() shape — one k-ring explode + equi-join
    + one groupBy reusing the join's partitioning on ``cell``."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.smoothing import kring_edges

    vals = cells.select(
        F.col("cell").alias("nbr"), F.col(value_col).cast("double").alias("_v")
    )
    edges = kring_edges(cells.select("cell"), k, include_center=True)
    return (
        edges.join(vals, "nbr")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_local"),
            round6(F.avg("_v")).alias("focal_mean"),
            F.min("_v").alias("focal_min"),
            F.max("_v").alias("focal_max"),
            round6(F.max("_v") - F.min("_v")).alias("focal_range"),
        )
    )


def local_extrema(
    cells: DataFrame, value_col: str = "ndvi"
) -> DataFrame:
    """Local-extremum classification (the peak/pit morphometry layer
    beside :func:`focal_stats`): every cell with >= 1 valid ring-1
    neighbor is 'max' iff its value strictly exceeds every neighbor,
    'min' iff strictly below every neighbor, else 'other' — plateau
    members compare equal to a neighbor and classify 'other'.
    Isolated cells (no valid neighbor) are excluded by contract (the
    terrain_ruggedness precedent). Output ``(cell, n_neighbors,
    extremum)``.

    Cross-engine: the compares consume the RAW stored double vs
    min/max of raw stored doubles — min/max are association-order-free
    selections (the focal_stats contract), so both engines compare
    identical doubles and the CASE cannot diverge even at exact ties.

    Plan (100 TB): the smooth() shape — one ring-1 explode +
    equi-join + one groupBy, then a broadcast-free join back to the
    center value on the same key."""
    from cuda_gis_smoothing_spark.operators.smoothing import kring_edges

    vals = cells.select(
        F.col("cell").alias("nbr"), F.col(value_col).cast("double").alias("_v")
    )
    edges = kring_edges(cells.select("cell"), 1, include_center=False)
    nb = (
        edges.join(vals, "nbr")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_neighbors"),
            F.min("_v").alias("_nmin"),
            F.max("_v").alias("_nmax"),
        )
    )
    center = cells.select("cell", F.col(value_col).cast("double").alias("_x"))
    return nb.join(center, "cell").select(
        "cell",
        "n_neighbors",
        F.when(F.col("_x") > F.col("_nmax"), F.lit("max"))
        .when(F.col("_x") < F.col("_nmin"), F.lit("min"))
        .otherwise(F.lit("other"))
        .alias("extremum"),
    )


#: line-of-sight range (cells) along each hex axis — small fixed range
#: keeps the explode constant-factor (6 · R²/2 rows per cell)
VISIBILITY_RANGE = 4


def axis_visibility(
    cells: DataFrame, value_col: str = "ndvi", r: int = VISIBILITY_RANGE
) -> DataFrame:
    """Line-of-sight visibility count — the viewshed primitive
    restricted to the 6 hex axes: target t = c + k·d (k ≤ r) is
    visible from c iff every intermediate j ∈ 1..k−1 exists on the
    grid AND sits strictly below the sight line
    ``x_c + (x_t − x_c) · (j/k)`` (a missing intermediate blocks the
    ray — holes are opaque, the documented contract). Output
    ``(cell, n_visible)`` over every input cell (0 when no target in
    range), n_visible ≤ 6r.

    Cross-engine: the sight-line height is the IDENTICAL expression
    shape in Spark and the twin — every op (sub, int-ratio div, mul,
    add) is correctly rounded, so both engines compare the SAME
    doubles and the blocked boolean cannot diverge (stronger than the
    join_counts mark-boundary caveat: no aggregate feeds the compare).
    Adjacent targets (k=1) have no intermediates and are always
    visible.

    Plan (100 TB): two literal-offset explodes + equi-joins + two hash
    aggregates — rows per cell bounded by 6·r²/2 (the smooth() class,
    constant fan-out; no window, no self-join on values)."""
    from cuda_gis_smoothing_spark.operators.hydrology import R1_DELTAS

    vals = cells.select("cell", F.col(value_col).cast("double").alias("_x"))
    tgt_offs = F.array(
        *[
            F.struct(F.lit(d).alias("d"), F.lit(k).alias("k"))
            for d in R1_DELTAS
            for k in range(1, r + 1)
        ]
    )
    # rays with an existing target: (cell, _x, d, k, _xt)
    rays = (
        vals.select("cell", "_x", F.explode(tgt_offs).alias("_o"))
        .select(
            "cell",
            "_x",
            F.col("_o.d").alias("_d"),
            F.col("_o.k").alias("_k"),
            (F.col("cell") + F.col("_o.d") * F.col("_o.k")).alias("_t"),
        )
        .join(
            vals.select(F.col("cell").alias("_t"), F.col("_x").alias("_xt")),
            "_t",
        )
        .localCheckpoint()  # TWO differently-pruned consumers (k1 +
        # multi) — the multi-consumer re-execute class
    )
    k1 = rays.where(F.col("_k") == 1).select("cell", "_d", "_k")
    multi = rays.where(F.col("_k") >= 2)
    inter = (
        multi.select(
            "cell",
            "_d",
            "_k",
            "_x",
            "_xt",
            F.explode(F.sequence(F.lit(1), F.col("_k") - 1)).alias("_j"),
        )
        .select(
            "cell",
            "_d",
            "_k",
            "_x",
            "_xt",
            "_j",
            (F.col("cell") + F.col("_d") * F.col("_j")).alias("_i"),
        )
        .join(
            vals.select(F.col("cell").alias("_i"), F.col("_x").alias("_xi")),
            "_i",
        )
    )
    line = F.col("_x") + (F.col("_xt") - F.col("_x")) * (
        F.col("_j").cast("double") / F.col("_k")
    )
    checked = inter.groupBy("cell", "_d", "_k").agg(
        F.count(F.lit(1)).alias("_nf"),
        F.max((F.col("_xi") >= line).cast("int")).alias("_blocked"),
    )
    vis_multi = checked.where(
        (F.col("_nf") == F.col("_k") - 1) & (F.col("_blocked") == 0)
    ).select("cell", "_d", "_k")
    n_vis = (
        k1.unionByName(vis_multi)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_visible"))
    )
    return (
        cells.select("cell")
        .join(n_vis, "cell", "left")
        .select(
            "cell",
            F.coalesce("n_visible", F.lit(0)).cast("long").alias("n_visible"),
        )
    )


def cell_curvature(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Second-order terrain derivatives: per-axis second differences
    curv_q = x(q+1,r) − 2x + x(q−1,r) (curv_r likewise) and the hex
    Laplacian Σ_ring1 x_n − 6x — curvature closes the derivative
    family (gradient → curvature → ruggedness → shading). Restricted
    to INTERIOR cells (all 6 ring-1 neighbors present): second
    differences aren't defined at borders and a partial Laplacian
    silently changes the stencil (the cell_gradient border-contract
    class). Output ``(cell, curv_q, curv_r, laplacian)``.

    Plan (100 TB): ONE ring-1 explode + equi-join + one conditional
    aggregate (HAVING count = 6) — not six shifted self-joins; the
    smooth() shuffle shape."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.hydrology import R1_DELTAS

    vals = cells.select("cell", F.col(value_col).cast("double").alias("_x"))
    offs = F.array(*[F.lit(d) for d in R1_DELTAS])
    e = vals.select(
        "cell", F.col("_x").alias("_c"), F.explode(offs).alias("_d")
    ).select("cell", "_c", (F.col("cell") + F.col("_d")).alias("nbr"), "_d")
    nb = e.join(
        vals.select(F.col("cell").alias("nbr"), F.col("_x").alias("_xn")), "nbr"
    )

    def pick(delta: int):
        return F.sum(F.when(F.col("_d") == delta, F.col("_xn")))

    return (
        nb.groupBy("cell", "_c")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            pick(ENC).alias("_qp"),
            pick(-ENC).alias("_qm"),
            pick(1).alias("_rp"),
            pick(-1).alias("_rm"),
            F.sum("_xn").alias("_s"),
        )
        .where(F.col("_n") == 6)
        .select(
            "cell",
            round6(F.col("_qp") + F.col("_qm") - 2.0 * F.col("_c")).alias("curv_q"),
            round6(F.col("_rp") + F.col("_rm") - 2.0 * F.col("_c")).alias("curv_r"),
            round6(F.col("_s") - 6.0 * F.col("_c")).alias("laplacian"),
        )
    )


def terrain_ruggedness(
    cells: DataFrame, k: int = 1, value_col: str = "ndvi"
) -> DataFrame:
    """Terrain ruggedness index (Riley TRI, mean-|Δ| form): per cell,
    the average absolute value difference to its valid k-ring
    neighbors plus the neighbor count — the roughness sibling of
    :func:`cell_gradient` (gradient measures oriented slope; TRI
    measures isotropic local variability). Cells with NO valid
    neighbor (isolated holes) are excluded — the mean is undefined
    there (the cell_gradient border-contract class). Sums are ≤ 6
    ring-1 terms, the smoothing/focal_stats round6 class. Output
    ``(cell, n_neighbors, tri)``.

    Plan (100 TB): the smooth() shape — one ring explode + equi-join
    + one groupBy reusing the join's partitioning on ``cell``."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.smoothing import kring_edges

    vals = cells.select(
        F.col("cell").alias("nbr"), F.col(value_col).cast("double").alias("_v")
    )
    ctr = cells.select("cell", F.col(value_col).cast("double").alias("_c"))
    edges = kring_edges(cells.select("cell"), k, include_center=False)
    return (
        edges.join(vals, "nbr")
        .join(ctr, "cell")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_neighbors"),
            round6(F.avg(F.abs(F.col("_v") - F.col("_c")))).alias("tri"),
        )
    )


# -- hillshade (terrain trio: gradient -> slope/aspect -> shading) --------

#: light at 45 deg altitude from the NW-analog direction on the axial
#: grid (azimuth measured from the +q axis) — folded in Python so both
#: engines see LITERAL doubles; the per-row math is then pure
#: mul/add/div/sqrt (all IEEE-correctly-rounded: ZERO libm exposure,
#: unlike the naive atan/cos/sin formulation it is equivalent to)
import math as _math

HILLSHADE_ALTITUDE_DEG = 45.0
HILLSHADE_AZIMUTH_DEG = 315.0
_ZEN = _math.radians(90.0 - HILLSHADE_ALTITUDE_DEG)
HS_COSZ = _math.cos(_ZEN)
HS_SINZ = _math.sin(_ZEN)
HS_LX = _math.cos(_math.radians(HILLSHADE_AZIMUTH_DEG))
HS_LY = _math.sin(_math.radians(HILLSHADE_AZIMUTH_DEG))


def hillshade(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Lambertian hillshade over the hex value surface — the third leg
    of the terrain trio (cell_gradient measures the surface; this
    renders it): illumination = max(0, L·n) with surface normal
    n = (−grad_q, −grad_r, 1)/√(1+|grad|²) and a FIXED sun vector L.
    Algebraically identical to the classic
    cos(zen)·cos(slope) + sin(zen)·sin(slope)·cos(az−aspect) formula
    (cos∘atan / sin∘atan2 expand to the rational forms), but written
    WITHOUT trig on the data path: the sun components are Python-folded
    literals, so the per-row math is exact-rounded mul/add/div/sqrt and
    the output crosses the engine gate like any integer-derived double.
    Border/hole cells are excluded (the cell_gradient central-
    difference contract). Output ``(cell, hillshade)`` in [0, 1].
    """
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.hexgrid import ENC

    vals = cells.select("cell", F.col(value_col).alias("_x"))

    def nbr(delta: int, alias: str) -> DataFrame:
        return vals.select(
            (F.col("cell") - delta).alias("cell"), F.col("_x").alias(alias)
        )

    gq = (F.col("_qp") - F.col("_qm")) / 2.0
    gr = (F.col("_rp") - F.col("_rm")) / 2.0
    # L·n with n ∝ (−gq, −gr, 1): the −grads cancel into the light's
    # horizontal components below (L_xy points TOWARD the sun)
    num = F.lit(HS_COSZ) - F.lit(HS_SINZ) * (
        F.lit(HS_LX) * gq + F.lit(HS_LY) * gr
    )
    shade = F.greatest(F.lit(0.0), num / F.sqrt(gq * gq + gr * gr + 1.0))
    return (
        vals.join(nbr(ENC, "_qp"), "cell")
        .join(nbr(-ENC, "_qm"), "cell")
        .join(nbr(1, "_rp"), "cell")
        .join(nbr(-1, "_rm"), "cell")
        .select("cell", round6(shade).alias("hillshade"))
    )


def terrain_profile(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """FUSED terrain kernel — the reference's fused-pass idea
    (smooth_fused_k2) applied to the derivative family: ONE ring-1
    explode + equi-join + ONE conditional aggregate produces gradient
    (grad_q/grad_r/grad_mag), curvature (curv_q/curv_r/laplacian),
    ruggedness (tri), hillshade and flow direction (flow_to/descent)
    together — one shuffle instead of five. Restricted to INTERIOR
    cells (all 6 neighbors; per-op border semantics live in the
    standalone operators — documented contract). Axis values arrive as
    single-row conditional sums (exact), so every derived column is
    bit-compatible with its standalone operator on the shared domain
    (cross-operator equality pytest); TWI stays standalone (it needs
    the accumulation closure — not a single-pass product).

    Plan (100 TB): the fused pass reads the cell table ONCE and
    shuffles ONCE on cell; the five standalone operators each pay
    their own ring join — this is the operator a 100 TB terrain sweep
    actually runs."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.hydrology import R1_DELTAS

    vals = cells.select("cell", F.col(value_col).cast("double").alias("_x"))
    offs = F.array(*[F.lit(d) for d in R1_DELTAS])
    e = vals.select(
        "cell", F.col("_x").alias("_c"), F.explode(offs).alias("_d")
    ).select("cell", "_c", (F.col("cell") + F.col("_d")).alias("nbr"), "_d")
    nb = e.join(
        vals.select(F.col("cell").alias("nbr"), F.col("_x").alias("_xn")), "nbr"
    )

    def pick(delta: int):
        return F.sum(F.when(F.col("_d") == delta, F.col("_xn")))

    agg = (
        nb.groupBy("cell", "_c")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            pick(ENC).alias("_qp"),
            pick(-ENC).alias("_qm"),
            pick(1).alias("_rp"),
            pick(-1).alias("_rm"),
            F.sum("_xn").alias("_s"),
            F.avg(F.abs(F.col("_xn") - F.col("_c"))).alias("_t"),
            F.min(
                F.struct(F.col("_xn").alias("xn"), F.col("nbr").alias("nbr"))
            ).alias("_m"),
        )
        .where(F.col("_n") == 6)
    )
    gq = (F.col("_qp") - F.col("_qm")) / 2.0
    gr = (F.col("_rp") - F.col("_rm")) / 2.0
    num = F.lit(HS_COSZ) - F.lit(HS_SINZ) * (
        F.lit(HS_LX) * gq + F.lit(HS_LY) * gr
    )
    shade = F.greatest(F.lit(0.0), num / F.sqrt(gq * gq + gr * gr + 1.0))
    return agg.select(
        "cell",
        round6(gq).alias("grad_q"),
        round6(gr).alias("grad_r"),
        round6(F.sqrt(gq * gq + gr * gr)).alias("grad_mag"),
        round6(F.col("_qp") + F.col("_qm") - 2.0 * F.col("_c")).alias("curv_q"),
        round6(F.col("_rp") + F.col("_rm") - 2.0 * F.col("_c")).alias("curv_r"),
        round6(F.col("_s") - 6.0 * F.col("_c")).alias("laplacian"),
        round6(F.col("_t")).alias("tri"),
        round6(shade).alias("hillshade"),
        F.when(F.col("_m.xn") < F.col("_c"), F.col("_m.nbr")).alias("flow_to"),
        round6(
            F.greatest(
                F.col("_c") - F.coalesce(F.col("_m.xn"), F.col("_c")),
                F.lit(0.0),
            )
        ).alias("descent"),
    )


def hillshade_sql(source: str = "cells", with_ctes: str = "") -> str:
    """DuckDB twin of :func:`hillshade` — identical literal sun
    components (flit-folded) over the same 4-neighbor join."""
    from cuda_gis_smoothing_spark.functions.numeric import flit
    from cuda_gis_smoothing_spark.hexgrid import ENC

    gq = "((qp.ndvi - qm.ndvi) / 2e0)"
    gr = "((rp.ndvi - rm.ndvi) / 2e0)"
    num = f"({flit(HS_COSZ)} - {flit(HS_SINZ)} * ({flit(HS_LX)} * {gq} + {flit(HS_LY)} * {gr}))"
    pre = f"WITH {with_ctes}" if with_ctes else ""
    return f"""
{pre}
SELECT c.cell,
       ROUND(GREATEST(0e0, {num} / SQRT({gq} * {gq} + {gr} * {gr} + 1e0)) + 1e-09, 6) AS hillshade
FROM {source} c
JOIN {source} qp ON qp.cell = c.cell + {ENC}
JOIN {source} qm ON qm.cell = c.cell - {ENC}
JOIN {source} rp ON rp.cell = c.cell + 1
JOIN {source} rm ON rm.cell = c.cell - 1
""".strip()


# -- landform classification (Weiss TPI, two scales) -----------------------

#: TPI magnitude below which a cell counts as "level" at that scale —
#: a flit-able literal so both engines compare the SAME double against
#: identical round6 inputs
LANDFORM_TPI_T = 0.01

#: the 9 (fine, coarse) sign combinations, Weiss-style names; keys are
#: (sign_fine, sign_coarse) with sign in {-1, 0, 1}
LANDFORM_CLASSES = {
    (1, 1): "ridge",
    (1, 0): "local_ridge",
    (1, -1): "knoll_in_valley",
    (0, 1): "upper_slope",
    (0, 0): "plane",
    (0, -1): "lower_slope",
    (-1, 1): "dip_on_ridge",
    (-1, 0): "local_valley",
    (-1, -1): "valley",
}


def landform_classes(
    cells: DataFrame, value_col: str = "ndvi", t: float = LANDFORM_TPI_T
) -> DataFrame:
    """Two-scale TPI landform classification (Weiss, simplified to the
    3×3 sign grid): TPI_k = x − mean(ring-k neighborhood) at ring 1
    (fine, = −laplacian/6 on the interior) and GEOMETRIC ring 2
    (coarse, the 12 cells at exact hex distance 2 —
    /root/reference/src/cuda/hex_smooth_cuda_v5.cu:423-463's "second
    order" neighborhood). Each scale classifies to {−1, 0, +1} via
    |TPI| vs ``t``; the pair names one of 9 landforms (ridge / valley
    / plane / local_ridge / upper_slope / ...). Restricted to FULLY
    INTERIOR cells (6 ring-1 AND 12 ring-2 neighbors — a partial
    neighborhood silently changes the stencil, the cell_gradient
    border contract). Output ``(cell, tpi_fine, tpi_coarse,
    landform)``.

    Cross-engine: TPI sums are ≤ 12 ring terms (the smoothing/
    focal_stats round6 class); the threshold CASE compares the
    ROUND6'd values against a flit literal, so identical rounded
    doubles classify identically — a cell whose true TPI sits at
    fp-noise distance from ±t could legally differ only if round6
    itself diverged (the local_morans_i quadrant-label class, but
    strictly safer: the compare reads the already-gated columns).

    Plan (100 TB): ONE 18-offset explode + equi-join + one conditional
    hash aggregate — the smooth_strict_k2 shuffle shape; no windows,
    no self-join on values."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.hexgrid import (
        RING1_OFFSETS,
        RING2_OFFSETS,
        neighbor_delta,
    )

    offs = F.array(
        *[
            F.struct(
                F.lit(neighbor_delta(dq, dr)).alias("d"), F.lit(g).alias("g")
            )
            for g, ring in ((1, RING1_OFFSETS), (2, RING2_OFFSETS))
            for dq, dr in ring
        ]
    )
    vals = cells.select("cell", F.col(value_col).cast("double").alias("_x"))
    e = vals.select(
        "cell", F.col("_x").alias("_c"), F.explode(offs).alias("_o")
    ).select(
        "cell",
        "_c",
        (F.col("cell") + F.col("_o.d")).alias("nbr"),
        F.col("_o.g").alias("_g"),
    )
    nb = e.join(
        vals.select(F.col("cell").alias("nbr"), F.col("_x").alias("_xn")), "nbr"
    )
    agg = (
        nb.groupBy("cell", "_c")
        .agg(
            F.sum(F.when(F.col("_g") == 1, 1).otherwise(0)).alias("_n1"),
            F.sum(F.when(F.col("_g") == 2, 1).otherwise(0)).alias("_n2"),
            F.sum(F.when(F.col("_g") == 1, F.col("_xn"))).alias("_s1"),
            F.sum(F.when(F.col("_g") == 2, F.col("_xn"))).alias("_s2"),
        )
        .where((F.col("_n1") == 6) & (F.col("_n2") == 12))
        .select(
            "cell",
            round6(F.col("_c") - F.col("_s1") / 6.0).alias("tpi_fine"),
            round6(F.col("_c") - F.col("_s2") / 12.0).alias("tpi_coarse"),
        )
    )

    def sign(col: str):
        return (
            F.when(F.col(col) > t, 1).when(F.col(col) < -t, -1).otherwise(0)
        )

    expr = None
    for (sf_, sc_), name in LANDFORM_CLASSES.items():
        cond = (sign("tpi_fine") == sf_) & (sign("tpi_coarse") == sc_)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return agg.select("cell", "tpi_fine", "tpi_coarse", expr.alias("landform"))


def landform_classes_sql(
    source: str = "cells4", with_ctes: str = "", t: float = LANDFORM_TPI_T
) -> str:
    """DuckDB twin of :func:`landform_classes` — identical 18-offset
    conditional aggregate; the CASE reads the same ROUND6'd columns."""
    from cuda_gis_smoothing_spark.functions.numeric import flit, round6_sql
    from cuda_gis_smoothing_spark.hexgrid import (
        RING1_OFFSETS,
        RING2_OFFSETS,
        neighbor_delta,
    )

    rows = ", ".join(
        f"({neighbor_delta(dq, dr)}, {g})"
        for g, ring in ((1, RING1_OFFSETS), (2, RING2_OFFSETS))
        for dq, dr in ring
    )
    tl = flit(t)
    sf = f"(CASE WHEN tpi_fine > {tl} THEN 1 WHEN tpi_fine < -{tl} THEN -1 ELSE 0 END)"
    sc = f"(CASE WHEN tpi_coarse > {tl} THEN 1 WHEN tpi_coarse < -{tl} THEN -1 ELSE 0 END)"
    cases = "\n         ".join(
        f"WHEN {sf} = {a} AND {sc} = {b} THEN '{name}'"
        for (a, b), name in LANDFORM_CLASSES.items()
    )
    pre = f"WITH {with_ctes}," if with_ctes else "WITH"
    return f"""
{pre}
lfoffsets (delta, ring) AS (VALUES {rows}),
lftpi AS (
  SELECT c.cell,
         {round6_sql(f"c.ndvi - SUM(CASE WHEN o.ring = 1 THEN n.ndvi END) / 6e0")} AS tpi_fine,
         {round6_sql(f"c.ndvi - SUM(CASE WHEN o.ring = 2 THEN n.ndvi END) / 12e0")} AS tpi_coarse
  FROM {source} c CROSS JOIN lfoffsets o
  JOIN {source} n ON n.cell = c.cell + o.delta
  GROUP BY c.cell, c.ndvi
  HAVING SUM(CASE WHEN o.ring = 1 THEN 1 ELSE 0 END) = 6
     AND SUM(CASE WHEN o.ring = 2 THEN 1 ELSE 0 END) = 12
)
SELECT cell, tpi_fine, tpi_coarse,
       CASE {cases} END AS landform
FROM lftpi
""".strip()


def terrain_openness(
    cells: DataFrame, value_col: str = "ndvi", r: int = VISIBILITY_RANGE
) -> DataFrame:
    """Topographic openness (Yokoyama et al.) in the TANGENT domain:
    along each of the 6 hex axes, the horizon tangent is
    ``max over k ≤ r of (x_{c+k·d} − x_c) / k`` over EXISTING targets
    (no opacity — openness measures elevation angles, unlike
    :func:`axis_visibility`'s sight-line blocking; holes simply
    contribute no candidate). Reported per cell as the mean and max of
    the 6 axis horizon tangents, restricted to cells where EVERY axis
    has at least one target (ring-1 complete — the border contract).
    The classic angular form is π/2 − atan(tan) averaged; atan is
    monotone, so the tangent domain carries the same ordering with
    ZERO libm exposure (the hillshade rational-form lesson). Output
    ``(cell, horizon_tan_mean, horizon_tan_max)``.

    Cross-engine: each candidate tangent is the IDENTICAL
    correctly-rounded expression shape in both engines, MAX is
    association-order-free (the focal_stats lesson), and the 6-term
    axis-mean is the smoothing round6 class.

    Plan (100 TB): one 6r-offset literal explode + equi-join + two
    hash aggregates keyed by cell — the smooth() constant-fan-out
    shape; no windows, no self-join on values."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.hydrology import R1_DELTAS

    vals = cells.select("cell", F.col(value_col).cast("double").alias("_x"))
    offs = F.array(
        *[
            F.struct(F.lit(d).alias("d"), F.lit(k).alias("k"))
            for d in R1_DELTAS
            for k in range(1, r + 1)
        ]
    )
    rays = (
        vals.select("cell", "_x", F.explode(offs).alias("_o"))
        .select(
            "cell",
            "_x",
            F.col("_o.d").alias("_d"),
            F.col("_o.k").alias("_k"),
            (F.col("cell") + F.col("_o.d") * F.col("_o.k")).alias("_t"),
        )
        .join(
            vals.select(F.col("cell").alias("_t"), F.col("_x").alias("_xt")),
            "_t",
        )
    )
    tan = (F.col("_xt") - F.col("_x")) / F.col("_k").cast("double")
    per_axis = rays.groupBy("cell", "_d").agg(F.max(tan).alias("_mtan"))
    return (
        per_axis.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("_na"),
            F.sum("_mtan").alias("_s"),
            F.max("_mtan").alias("_mx"),
        )
        .where(F.col("_na") == 6)
        .select(
            "cell",
            round6(F.col("_s") / 6.0).alias("horizon_tan_mean"),
            round6(F.col("_mx")).alias("horizon_tan_max"),
        )
    )


def terrain_openness_sql(
    source: str = "cells4", with_ctes: str = "", r: int = VISIBILITY_RANGE
) -> str:
    """DuckDB twin of :func:`terrain_openness` — identical tangent
    expression shape over the same (axis, k) offset grid."""
    from cuda_gis_smoothing_spark.functions.numeric import round6_sql
    from cuda_gis_smoothing_spark.operators.hydrology import R1_DELTAS

    rows = ", ".join(
        f"({d}, {k})" for d in R1_DELTAS for k in range(1, r + 1)
    )
    pre = f"WITH {with_ctes}," if with_ctes else "WITH"
    return f"""
{pre}
toffs (delta, k) AS (VALUES {rows}),
taxis AS (
  SELECT c.cell, o.delta,
         MAX((t.ndvi - c.ndvi) / CAST(o.k AS DOUBLE)) AS mtan
  FROM {source} c CROSS JOIN toffs o
  JOIN {source} t ON t.cell = c.cell + o.delta * o.k
  GROUP BY c.cell, o.delta
)
SELECT cell,
       {round6_sql("SUM(mtan) / 6e0")} AS horizon_tan_mean,
       {round6_sql("MAX(mtan)")} AS horizon_tan_max
FROM taxis
GROUP BY cell
HAVING COUNT(*) = 6
""".strip()


def median_filter(cells: DataFrame, value_col: str = "ndvi") -> DataFrame:
    """Median smoothing — the salt-and-pepper-robust sibling of the
    reference's weighted-mean pass (majority_filter is its categorical
    cousin): per cell, the EXACT median of {self ∪ valid ring-1
    neighbors} (1–7 values; holes shrink the window — the reference's
    validity-filter semantics, hex_smooth_cuda_v1.cu:52). Median =
    the shared exact-percentile aggregate at q=0.5 (Spark percentile
    == DuckDB quantile_cont bit-for-bit on identical doubles — the
    value_percentiles contract; even-count windows interpolate the
    midpoint, one correctly-rounded averaging op), under round6.
    Output ``(cell, n_window, median_ndvi)``.

    Plan (100 TB): the smooth() shape — one 7-offset explode +
    equi-join + one cell-keyed aggregate; per-group sorts are 7-element
    (bounded), so the exact percentile is NOT the scale hazard it is
    for high-cardinality value groups."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.events import (
        percentile_array_expr,
    )
    from cuda_gis_smoothing_spark.operators.smoothing import kring_edges

    vals = cells.select(
        F.col("cell").alias("nbr"), F.col(value_col).cast("double").alias("_v")
    )
    edges = kring_edges(cells.select("cell"), k=1, include_center=True)
    return (
        edges.join(vals, "nbr")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_window"),
            percentile_array_expr("_v", (0.5,)).alias("_p"),
        )
        .select(
            "cell",
            "n_window",
            round6(F.col("_p")[0]).alias("median_ndvi"),
        )
    )


def median_filter_sql(source: str = "cells4", with_ctes: str = "") -> str:
    """DuckDB twin of :func:`median_filter` — quantile_cont over the
    same self∪ring-1 window."""
    from cuda_gis_smoothing_spark.functions.numeric import round6_sql
    from cuda_gis_smoothing_spark.operators.hydrology import R1_DELTAS

    rows = ", ".join(f"({d})" for d in (0, *R1_DELTAS))
    pre = f"WITH {with_ctes}," if with_ctes else "WITH"
    return f"""
{pre}
mfoffs (delta) AS (VALUES {rows})
SELECT c.cell,
       CAST(COUNT(*) AS BIGINT) AS n_window,
       {round6_sql("quantile_cont(n.ndvi, 0.5)")} AS median_ndvi
FROM {source} c CROSS JOIN mfoffs o
JOIN {source} n ON n.cell = c.cell + o.delta
GROUP BY c.cell
""".strip()


#: zone-map audit bucket count — 32 matches the shuffle-partition and
#: bucketBy defaults, so the card measures the layouts the repo ships
LAYOUT_BUCKETS = 32


def layout_overlap_report(
    cells: DataFrame, n_buckets: int = LAYOUT_BUCKETS
) -> DataFrame:
    """Zone-map clustering-depth audit — the measurement step before
    choosing a table layout (the key_skew_report of the ORDER
    dimension, and the 1-D answer to the reference's O1/O2 reorder
    question, /root/reference/src/cuda/hex_smooth_cuda_v4.cu:264-297):
    would per-file min/max statistics actually prune a cell-range
    predicate under each candidate layout?

    Each layout assigns every row to one of ``n_buckets`` equal-width
    key ranges ("files"): ``hash`` (the portable affine hash — the
    unclustered baseline), ``cell_range`` (sorted by the packed cell
    id), ``morton_range`` (the reference's Z-order key). Per bucket we
    take the CELL min/max zone map, then measure Snowflake-style
    clustering depth: overlap(b) = how many buckets' zone maps
    intersect b's (1.0 = perfect pruning, ≈ n_buckets = every range
    predicate scans everything).

    Exactness: bucket assignment is all-integer (affine hash <
    MH_PRIME, width-division via integer div over non-negative keys —
    Spark ``div`` == DuckDB ``//`` there), zone maps are integer
    min/max, overlaps integer counts; the two ratios are single
    divisions of exact int64s under round6.

    Plan (100 TB): ONE corpus scan (the three layouts explode from one
    row — the two-sided-union one-pass lesson) + a 1-row broadcast
    stats attach + one (layout, bucket)-keyed aggregate; the overlap
    self-join runs on ≤ 3·n_buckets zone-map rows, checkpointed once
    ahead of its three consumers. Output per layout:
    ``(layout, n_buckets_used, avg_overlap, max_overlap,
    avg_span_share)``."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.sampling import sample_hash_sql
    from cuda_gis_smoothing_spark.plans.partitioning import morton_sql

    B = int(n_buckets)
    keyed = cells.select(
        F.col("cell").cast("long").alias("cell"),
        F.expr(sample_hash_sql("cell")).cast("long").alias("_kh"),
        F.col("cell").cast("long").alias("_kc"),
        F.expr(morton_sql("cell", "spark")).cast("long").alias("_km"),
    )
    stats = keyed.agg(
        F.min("_kh").alias("_h0"),
        F.max("_kh").alias("_h1"),
        F.min("_kc").alias("_c0"),
        F.max("_kc").alias("_c1"),
        F.min("_km").alias("_m0"),
        F.max("_km").alias("_m1"),
    )

    def bucket(k: str, lo: str, hi: str):
        return F.expr(
            f"least({B - 1}, (({k} - {lo}) * {B}) div ({hi} - {lo} + 1))"
        ).cast("long")

    lb = (
        keyed.crossJoin(F.broadcast(stats))
        .select(
            "cell",
            (F.col("_c1") - F.col("_c0") + 1).alias("_w"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("hash").alias("layout"),
                        bucket("_kh", "_h0", "_h1").alias("bucket"),
                    ),
                    F.struct(
                        F.lit("cell_range").alias("layout"),
                        bucket("_kc", "_c0", "_c1").alias("bucket"),
                    ),
                    F.struct(
                        F.lit("morton_range").alias("layout"),
                        bucket("_km", "_m0", "_m1").alias("bucket"),
                    ),
                )
            ).alias("_lb"),
        )
        .select(
            F.col("_lb.layout").alias("layout"),
            F.col("_lb.bucket").alias("bucket"),
            "cell",
            "_w",
        )
    )
    g = (
        lb.groupBy("layout", "bucket")
        .agg(
            F.min("cell").alias("_mn"),
            F.max("cell").alias("_mx"),
            F.max("_w").alias("_w"),
        )
        .localCheckpoint()  # both self-join legs + the final aggregate
    )
    a, b = g.alias("a"), g.alias("b")
    ov = (
        a.join(
            b,
            (F.col("a.layout") == F.col("b.layout"))
            & (F.col("a._mx") >= F.col("b._mn"))
            & (F.col("b._mx") >= F.col("a._mn")),
        )
        .groupBy(
            F.col("a.layout").alias("layout"),
            F.col("a.bucket").alias("bucket"),
            F.col("a._mn").alias("_mn"),
            F.col("a._mx").alias("_mx"),
            F.col("a._w").alias("_w"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("_ov"))
    )
    return ov.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
        round6(F.sum("_ov") / F.count(F.lit(1))).alias("avg_overlap"),
        F.max("_ov").cast("long").alias("max_overlap"),
        round6(
            F.sum(F.col("_mx") - F.col("_mn") + F.lit(1))
            / (F.count(F.lit(1)) * F.max("_w"))
        ).alias("avg_span_share"),
    )
