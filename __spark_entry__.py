"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (fused 4-variable
two-ring Gaussian smoothing + tile-assignment join — the reference v5
configuration, /root/reference/src/cuda/hex_smooth_cuda_v5.cu:906-941,
re-expressed Spark-first). ``queries()`` exposes every SQL-expressible
operator from SURVEY.md §2 plus the training-data-pipeline additions;
``oracle_sql()`` gives each one an ANSI-SQL DuckDB twin built from the
SAME literal constants (weights, offsets, hash parameters), so the
driver's row-count/schema/value-hash gate is exact.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:  # driver may import us from another cwd
    sys.path.insert(0, _REPO)

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to python workers (addPyFile == --py-files).

    Driver-side imports are covered by the sys.path insert above, but
    executor python workers resolve imports from THEIR path — which
    only contains this repo when the JVM happened to start in it.
    """
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    try:
        import hashlib
        import shutil
        import tempfile

        # content-keyed archive name: a fixed path would let a stale
        # zip (built before a code edit in the same container) ship old
        # UDF code to executors while the driver runs new code
        pkg = os.path.join(_REPO, "cuda_gis_smoothing_spark")
        h = hashlib.sha256()
        for root, _, files in sorted(os.walk(pkg)):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    h.update(p.encode())
                    with open(p, "rb") as fh:
                        h.update(fh.read())
        zip_base = os.path.join(
            tempfile.gettempdir(), f"cuda_gis_smoothing_spark_{h.hexdigest()[:16]}"
        )
        zip_path = zip_base + ".zip"
        if not os.path.exists(zip_path):
            shutil.make_archive(zip_base, "zip", _REPO, "cuda_gis_smoothing_spark")
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already importable (normal case) — never fail the query
    _SHIPPED.add(key)

from cuda_gis_smoothing_spark.functions.text import (
    BPE_REGEX,
    STOPWORDS,
    language_id,
    quality_features,
)
from cuda_gis_smoothing_spark.functions.numeric import round6
from cuda_gis_smoothing_spark.hexgrid import ENC, OFFSET, RING1_OFFSETS, RING2_OFFSETS
from cuda_gis_smoothing_spark.operators import stats as stats_ops
from cuda_gis_smoothing_spark.operators.dedup import (
    MH_A,
    MH_B,
    MH_PRIME,
    exact_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
    token_hash_sql_duckdb,
    tokenset_dedup,
)
from cuda_gis_smoothing_spark.operators.similarity import cosine_knn
from cuda_gis_smoothing_spark.operators.smoothing import (
    derive_variables,
    smooth,
    smoothing_sql,
)
from cuda_gis_smoothing_spark.operators.spatial import tile_assignment, tile_sql
from cuda_gis_smoothing_spark.plans.config import ALL_VARIABLES, SmoothingPlan
from cuda_gis_smoothing_spark.plans.partitioning import morton_sql
from cuda_gis_smoothing_spark.sources.tables import (
    GRID_CELLS_SQL,
    GRID_QTY_SQL,
    grid_from_lineitem,
    grid_qty_from_lineitem,
    load,
)

_R1 = [dq * ENC + dr for dq, dr in RING1_OFFSETS]
_R2 = [dq * ENC + dr for dq, dr in RING2_OFFSETS]
_JACCARD_THRESHOLD = 0.45
_KNN_QUERIES = 8
_LSH_PLANES = 8
_EMB_DIM = 64  # testdata embedding dimension (all sf tiers)
_ZOOM = 12


# --------------------------------------------------------------------------
# entry
# --------------------------------------------------------------------------
def entry(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Flagship: fused 4-var two-ring Gaussian smoothing + tile join.

    Runs the scatter strategy (the pipeline default — one exchange at
    cell cardinality, see operators/smoothing.py::smooth_scatter).
    """
    cells = grid_from_lineitem(spark, sf_dir)
    plan = SmoothingPlan(
        variant="gaussian_k2", variables=ALL_VARIABLES, strategy="scatter"
    )
    smoothed = smooth(cells, plan)
    tiles = tile_assignment(cells, zoom=_ZOOM)
    return smoothed.join(tiles, "cell").orderBy("cell")


# --------------------------------------------------------------------------
# Spark queries
# --------------------------------------------------------------------------
def _rounded_smooth(variant: str, variables: tuple[str, ...]):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        cells = grid_from_lineitem(spark, sf_dir)
        out = smooth(cells, SmoothingPlan(variant=variant, variables=variables))
        return out.select(
            "cell",
            *[round6(f"smoothed_{v}").alias(f"smoothed_{v}") for v in variables],
        )

    return q


def _q_smooth_maintained(spark, sf_dir):
    """The reference's headline smoothing served from MAINTAINED state
    (the bm25_search precedent: the driver gates the incremental path
    against the identical batch twin): the cell table folds into an
    IncrementalSmoother as one partials batch — ndvi rides as
    (sum_ndvi, n=1), so state-side sum/n recovers it exactly — and the
    smoothed snapshot log serves the result. Single batch == the
    smooth_gaussian_k2 gate exactly; multi-batch/restart/crash-replay
    equality lives in tests/test_streaming.py."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.incremental import IncrementalSmoother

    cells = grid_from_lineitem(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="smooth_state_")
    sm = IncrementalSmoother(
        spark, state, plan=SmoothingPlan(variant="gaussian_k2", variables=("ndvi",))
    )
    sm.process_partials(
        cells.select(
            "cell", F.col("ndvi").alias("sum_ndvi"), F.lit(1).cast("long").alias("n")
        ),
        0,
    )
    out = (
        sm.current_smoothed()
        .localCheckpoint(eager=True)  # state dir is GC'd next line
        .select("cell", round6("smoothed_ndvi").alias("smoothed_ndvi"))
    )
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_majority_filter(spark, sf_dir):
    """GIS majority (mode) filter: categorical neighborhood smoothing
    — integer class banding, struct-MIN argmax (count DESC, class ASC
    tie-break), two hash aggregates on the k-ring join."""
    from cuda_gis_smoothing_spark.operators.stats import majority_filter

    return majority_filter(grid_from_lineitem(spark, sf_dir))


def _q_focal_stats(spark, sf_dir):
    """Focal count/mean/min/max/range over the valid ring-1
    neighborhood — the descriptive sibling of the mode/mean filters."""
    from cuda_gis_smoothing_spark.operators.stats import focal_stats

    return focal_stats(grid_from_lineitem(spark, sf_dir))


def _q_local_extrema(spark, sf_dir):
    """Peak/pit classification over the valid ring-1 neighborhood —
    strict-inequality extrema, plateau members 'other' (raw-double
    compares against association-order-free min/max)."""
    from cuda_gis_smoothing_spark.operators.stats import local_extrema

    return local_extrema(grid_from_lineitem(spark, sf_dir))


def _q_zonal_stats(spark, sf_dir):
    """Zonal statistics: the PIP region tag (broadcast + vectorized
    ray-cast, no shuffle on the point side) composed with one
    region-keyed aggregate — cells outside every polygon form the NULL
    zone (kept: it IS the coverage-gap headline). Routed through the
    SHARED operators.spatial.zonal_stats kernel (the maintained gate
    serves the identical body from smoother state)."""
    from cuda_gis_smoothing_spark import datagen
    from cuda_gis_smoothing_spark.operators.spatial import zonal_stats

    _ensure_shipped(spark)
    cells = grid_from_lineitem(spark, sf_dir).select("cell", "ndvi")
    return zonal_stats(cells, datagen.gen_boundaries())


def _q_zonal_stats_maintained(spark, sf_dir):
    """The SAME zonal statistics served from MAINTAINED cell state
    (the smooth_maintained precedent): the cell table folds into an
    IncrementalSmoother as one partials batch — ndvi rides as
    (sum_ndvi, n=1) so state sum/n recovers it exactly — and the
    shared zonal_stats kernel runs over state_cells(). SHARED twin."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark import datagen
    from cuda_gis_smoothing_spark.operators.spatial import zonal_stats
    from cuda_gis_smoothing_spark.streaming.incremental import IncrementalSmoother

    _ensure_shipped(spark)
    cells = grid_from_lineitem(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="smooth_state_")
    sm = IncrementalSmoother(spark, state)
    sm.process_partials(
        cells.select(
            "cell", F.col("ndvi").alias("sum_ndvi"), F.lit(1).cast("long").alias("n")
        ),
        0,
    )
    out = zonal_stats(
        sm.state_cells(), datagen.gen_boundaries()
    ).localCheckpoint(eager=True)  # state dir is GC'd next line
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_stream_junctions(spark, sf_dir):
    """Confluence census over the D6 stream network: stream cells with
    >= 2 committed stream inflows — integer census, shared flow
    closure, the nodes where Strahler order increments."""
    from cuda_gis_smoothing_spark.operators.hydrology import stream_junctions

    return stream_junctions(grid_from_lineitem(spark, sf_dir))


def _q_zonal_majority(spark, sf_dir):
    """Zonal majority — the CATEGORICAL zonal statistic beside
    _q_zonal_stats' means (land-cover share per district): class =
    floor_stable(ndvi · 8) (the majority_filter banding contract),
    per-zone mode with the deterministic (count DESC, class ASC)
    tie-break folded as one struct-MIN argmax (no window sort); the
    NULL zone (outside every polygon) is kept. Plan: broadcast PIP tag
    (no shuffle on the cell side) + two zone-keyed hash aggregates."""
    from cuda_gis_smoothing_spark import datagen
    from cuda_gis_smoothing_spark.functions.numeric import floor_stable
    from cuda_gis_smoothing_spark.operators.spatial import (
        centroid_sql,
        point_in_polygon,
    )

    _ensure_shipped(spark)
    cells = grid_from_lineitem(spark, sf_dir).select("cell", "ndvi")
    lat, lon = centroid_sql("cell", "spark")
    pts = cells.select(
        floor_stable(F.col("ndvi") * 8).cast("long").alias("cls"),
        F.expr(lat).alias("lat"),
        F.expr(lon).alias("lon"),
    )
    tagged = point_in_polygon(pts, datagen.gen_boundaries())
    counts = tagged.groupBy("region_id", "cls").agg(
        F.count(F.lit(1)).alias("_n")
    )
    pick = F.min(
        F.struct((-F.col("_n")).alias("neg"), F.col("cls").alias("cls"))
    )
    return (
        counts.groupBy("region_id")
        .agg(pick.alias("_m"), F.sum("_n").alias("_t"))
        .select(
            "region_id",
            F.col("_m.cls").alias("mode_class"),
            (-F.col("_m.neg")).cast("long").alias("mode_count"),
            F.col("_t").cast("long").alias("n_cells"),
        )
    )


def _zone_class_counts(spark, sf_dir):
    """The SHARED (region_id, cls, n_cells) zone×class aggregate behind
    zonal_crosstab AND zonal_diversity (review catch — the banding
    expression and PIP composition existed in two gate bodies plus two
    twin copies; the daily_cte drift-prevention class). Classes use the
    majority_filter banding contract; the NULL zone is kept."""
    from cuda_gis_smoothing_spark import datagen
    from cuda_gis_smoothing_spark.functions.numeric import floor_stable
    from cuda_gis_smoothing_spark.operators.spatial import (
        centroid_sql,
        point_in_polygon,
    )

    _ensure_shipped(spark)
    cells = grid_from_lineitem(spark, sf_dir).select("cell", "ndvi")
    lat, lon = centroid_sql("cell", "spark")
    pts = cells.select(
        floor_stable(F.col("ndvi") * 8).cast("long").alias("cls"),
        F.expr(lat).alias("lat"),
        F.expr(lon).alias("lon"),
    )
    tagged = point_in_polygon(pts, datagen.gen_boundaries())
    return tagged.groupBy("region_id", "cls").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells")
    )


def _q_zonal_crosstab(spark, sf_dir):
    """Zone × class contingency — the full land-cover-composition
    table zonal_majority cuts to its mode row: per (zone, class) cell
    count plus the class share of the zone (exact integer ratio under
    round6; the zone total is an integer window sum). Plan: broadcast
    PIP tag + one hash aggregate + a #zones×#classes-row window."""
    from pyspark.sql import Window

    counts = _zone_class_counts(spark, sf_dir)
    w = Window.partitionBy("region_id")
    return counts.select(
        "region_id",
        "cls",
        "n_cells",
        round6(
            F.col("n_cells").cast("double")
            / F.sum("n_cells").over(w).cast("double")
        ).alias("zone_share"),
    )


def _q_zonal_diversity(spark, sf_dir):
    """Per-zone land-cover DIVERSITY over the zonal_crosstab composition
    (the FRAGSTATS zone-level SHDI/SIDI card): class count, Simpson
    index Σc(c−1)/(N(N−1)) — an exact integer ratio — and Shannon
    H = ln(N) − (Σ c·ln c)/N (the doc_logprob ≤1-ulp ln class; the sum
    spans ≤ #classes terms, bounded by the banding grid, not the
    corpus). The SHARED _zone_class_counts stage (one banding + PIP
    definition with zonal_crosstab); the NULL zone is kept. All counts
    integers; the Simpson sums are integer-valued doubles
    (association-free < 2^53)."""
    counts = _zone_class_counts(spark, sf_dir).withColumnRenamed(
        "n_cells", "_c"
    )
    agg = counts.groupBy("region_id").agg(
        F.sum("_c").cast("long").alias("n_cells"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.col("_c").cast("double") * (F.col("_c") - F.lit(1))).alias("_rep"),
        F.sum(F.col("_c").cast("double") * F.log(F.col("_c").cast("double"))).alias(
            "_clnc"
        ),
    )
    n = F.col("n_cells").cast("double")
    return agg.select(
        "region_id",
        "n_cells",
        "n_classes",
        round6(
            F.col("_rep") / F.nullif(n * (F.col("n_cells") - F.lit(1)), F.lit(0.0))
        ).alias("simpson"),
        round6(F.log(n) - F.col("_clnc") / n).alias("shannon"),
    )


def _q_neighbor_stats(spark, sf_dir):
    return stats_ops.neighbor_stats(grid_from_lineitem(spark, sf_dir), k=1)


def _q_edge_count(spark, sf_dir):
    cells = grid_from_lineitem(spark, sf_dir)
    return stats_ops.valid_edges(cells, 1).agg(F.count(F.lit(1)).alias("total_edges"))


def _q_derived_variables(spark, sf_dir):
    cells = grid_from_lineitem(spark, sf_dir).select("cell", "ndvi")
    return derive_variables(cells).select(
        "cell",
        *[round6(v).alias(v) for v in ALL_VARIABLES],
    )


def _q_ring2_cardinality(spark, sf_dir):
    cells = grid_from_lineitem(spark, sf_dir)
    return stats_ops.neighbor_counts(cells, k=2, ring=2).select(
        "cell", F.col("n_neighbors").alias("n_ring2")
    )


_SOURCE_QUOTA_CAP = 10


def _q_source_quota(spark, sf_dir):
    """Source balancing: keep each source's top-N docs by quality
    (deterministic total order: round6 quality desc, doc_id)."""
    from cuda_gis_smoothing_spark.operators.sampling import source_quota

    return source_quota(
        load(spark, sf_dir, "documents"), per_source_cap=_SOURCE_QUOTA_CAP
    )


def _q_source_dedup_stats(spark, sf_dir):
    """Per-source duplication report (dataset-card marginal)."""
    from cuda_gis_smoothing_spark.operators.curate import source_dedup_stats

    return source_dedup_stats(load(spark, sf_dir, "documents"))


_DECILES = tuple(round(0.1 * i, 1) for i in range(1, 10))


def _q_quality_deciles(spark, sf_dir):
    """Exact corpus quality-score deciles (the threshold-picking
    table) — the shared percentile kernel, ungrouped."""
    from cuda_gis_smoothing_spark.operators.curate import _with_quality_and_lang
    from cuda_gis_smoothing_spark.operators.events import percentile_explode

    q = _with_quality_and_lang(load(spark, sf_dir, "documents"), "doc_id")
    return percentile_explode(q, "quality_score", _DECILES, out_value="quality")


def _q_cell_edges(spark, sf_dir):
    """The materialized valid adjacency (cell, nbr, ring) — the
    reference's CSR neighbor structure as a first-class table (k=2:
    both rings, border-clipped by the semi-join)."""
    cells = grid_from_lineitem(spark, sf_dir)
    return stats_ops.valid_edges(cells, 2).select("cell", "nbr", "ring")


def _q_hotspot_cells(spark, sf_dir):
    """Getis-Ord-style neighborhood-sum z-score (hotspot detection)."""
    return stats_ops.hotspot_zscore(grid_from_lineitem(spark, sf_dir))


def _q_morans_i(spark, sf_dir):
    """Global Moran's I over ring-1 contiguity (spatial
    autocorrelation)."""
    return stats_ops.morans_i(grid_from_lineitem(spark, sf_dir))


def _q_geary_c(spark, sf_dir):
    """Global Geary's C over ring-1 contiguity — the squared-difference
    complement of Moran's I (the standard autocorrelation pair)."""
    return stats_ops.geary_c(grid_from_lineitem(spark, sf_dir))


def _q_join_counts(spark, sf_dir):
    """Join-count statistics over ring-1 contiguity — the binary-mark
    member of the spatial-autocorrelation family (BB/BW/WW joins for
    the above-mean two-coloring)."""
    return stats_ops.join_counts(grid_from_lineitem(spark, sf_dir))


def _q_semivariogram(spark, sf_dir):
    """Empirical semivariogram over ring-1/ring-2 lags (the kriging
    input: spatial continuity per lag)."""
    return stats_ops.semivariogram(grid_from_lineitem(spark, sf_dir))


def _q_semivariogram_directional(spark, sf_dir):
    """Per-axis semivariogram (anisotropy report): the same γ(h) sum
    split by each lag's canonical hex axis — axis-dependent continuity
    at one ring is directional trend/striping an isotropic model
    would misfit."""
    return stats_ops.directional_semivariogram(grid_from_lineitem(spark, sf_dir))


def _q_local_morans_i(spark, sf_dir):
    """Local Moran's I (Anselin LISA) with HH/LL/HL/LH quadrant labels
    — the per-cell clustering map."""
    return stats_ops.local_morans_i(grid_from_lineitem(spark, sf_dir))


def _q_locality(spark, sf_dir):
    return stats_ops.locality_metric(grid_from_lineitem(spark, sf_dir))


def _q_quadrants(spark, sf_dir):
    return stats_ops.quadrant_histogram(grid_from_lineitem(spark, sf_dir))


def _q_tiles(spark, sf_dir):
    return tile_assignment(grid_from_lineitem(spark, sf_dir), zoom=_ZOOM)


def _q_events_hourly(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("ws"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round6(F.avg("value")).alias("avg_value"),
        )
        .select(
            F.col("ws").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def _q_doc_quality(spark, sf_dir):
    return quality_features(load(spark, sf_dir, "documents"))


def _q_language_id(spark, sf_dir):
    return language_id(load(spark, sf_dir, "documents"))


def _q_quality_calibration(spark, sf_dir):
    """Cross-source score calibration: each doc's quality mapped to its
    ECDF quantile WITHIN its source (cume_dist — tie-invariant: the
    value depends only on the score multiset, so tied round6 scores
    cannot flake it; its value is an exact integer ratio). The fix for
    'source A's 0.6 means something different than source B's 0.6'
    before any cross-source quality threshold. NULL-text docs carry
    the DEGENERATE composite score (0.75: both engines' least() skips
    NULL terms — the doc_quality contract) and rank like any doc; the
    IS NOT NULL guard only drops a fully-NULL score if one ever
    arises. One scan, one source-partitioned window."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.functions.text import (
        quality_feature_cols,
        quality_score_col,
    )

    docs = load(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id", "source", *quality_feature_cols("text")
    ).withColumn("quality_score", quality_score_col())
    w = Window.partitionBy("source").orderBy("quality_score")
    return (
        q.where(F.col("quality_score").isNotNull())
        .select(
            "doc_id",
            "source",
            "quality_score",
            round6(F.cume_dist().over(w)).alias("source_quantile"),
        )
    )


def _q_dedup_exact(spark, sf_dir):
    return exact_dedup(load(spark, sf_dir, "documents"))


def _q_dedup_tokenset(spark, sf_dir):
    return tokenset_dedup(load(spark, sf_dir, "documents"))


def _q_doc_fingerprint(spark, sf_dir):
    from cuda_gis_smoothing_spark.functions.text import doc_fingerprint

    return doc_fingerprint(load(spark, sf_dir, "documents"))


def _q_minhash(spark, sf_dir):
    return minhash_signatures(load(spark, sf_dir, "documents"), n_hashes=6)


def _q_simhash(spark, sf_dir):
    return simhash(load(spark, sf_dir, "documents"), bits=16)


def _q_minhash_lsh(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(load(spark, sf_dir, "documents"), n_hashes=6, bands=3)


def _q_simhash_pairs(spark, sf_dir):
    return simhash_pairs(load(spark, sf_dir, "documents"), max_hamming=3, bits=16)


def _q_simhash_pairs_banded(spark, sf_dir):
    """Banded (pigeonhole) simhash pair join — shares the quadratic
    verifier's oracle, so the gate proves the banding is exact."""
    from cuda_gis_smoothing_spark.operators.dedup import simhash_pairs_banded

    return simhash_pairs_banded(load(spark, sf_dir, "documents"), max_hamming=3, bits=16)


_SAMPLE_FRACTIONS = {"en": 0.5, "de": 0.2}


def _q_stratified_sample(spark, sf_dir):
    """Deterministic per-stratum sampling — the per-row keep/drop
    decision itself is gated (both engines draw the identical sample
    from the shared affine hash), not just the rate."""
    from cuda_gis_smoothing_spark.operators.sampling import stratified_sample

    return stratified_sample(
        load(spark, sf_dir, "documents"), _SAMPLE_FRACTIONS, default_fraction=0.05
    )


_TOP_TOKENS_K = 50
_LEN_BUCKET = 200


def _q_vocab_top_tokens(spark, sf_dir):
    """Corpus vocabulary stats: global top-k tokens by document
    frequency (deterministic tie-break on the token) — the classic
    first look at a training corpus. Plan: explode -> hash agg ->
    bounded top-k (rank window over the aggregated table only)."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.operators.dedup import _doc_tokens

    toks = _doc_tokens(load(spark, sf_dir, "documents"), "text", "doc_id", None)
    counts = toks.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    # orderBy().limit(k) plans as TakeOrderedAndProject — distributed
    # per-partition top-k + merge, NO global sort even at vocab scale;
    # the rank window then runs over k rows only
    top = counts.orderBy(F.col("df").desc(), F.col("t").asc()).limit(_TOP_TOKENS_K)
    w = Window.orderBy(F.col("df").desc(), F.col("t").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col("t").alias("token"), "df", "rank"
    )


def _q_vocab_cms_estimates(spark, sf_dir):
    """Count-Min sketch audit card: the exact top-k document
    frequencies beside their CMS estimates (d=4, w=1024) — the
    frequency sketch beside KMV's distinct, deterministic over the
    portable token hash so it is twin-exact; estimates are one-sided
    (>= truth, pytest + Python differential). Plan: ONE corpus scan
    into the vocab-sized count table (localCheckpoint'ed — the
    counters and the top-k are two differently-shaped consumers),
    counters built WEIGHTED from it, sketch-sized broadcast join on
    the query side."""
    from cuda_gis_smoothing_spark.operators.dedup import _doc_tokens
    from cuda_gis_smoothing_spark.operators.sketches import (
        CMS_TOPK,
        cms_counters,
        cms_hash_cols,
    )

    toks = _doc_tokens(load(spark, sf_dir, "documents"), "text", "doc_id", None)
    counts = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .localCheckpoint()
    )
    ctr = cms_counters(counts, token_col="t", weight_col="df")
    top = counts.orderBy(F.col("df").desc(), F.col("t").asc()).limit(CMS_TOPK)
    probes = top.select(
        "t", "df", F.explode(cms_hash_cols("t")).alias("r")
    ).select("t", "df", F.col("r.j").alias("j"), F.col("r.counter").alias("counter"))
    return (
        probes.join(F.broadcast(ctr), ["j", "counter"])
        .groupBy(F.col("t").alias("token"))
        .agg(
            F.max("df").alias("df"),
            F.min("cnt").alias("cms_estimate"),
        )
    )


def _q_vocab_cms_maintained(spark, sf_dir):
    """The SAME CMS audit card with the COUNTERS served from a
    maintained doc-keyed sketch log (MaintainedCMS — the decrementable
    sketch: doc updates subtract their old contributions); the exact
    top-k df side still comes from the corpus, so the CORRECTNESS row
    gates the maintained counter path against the batch twin (the
    source_kl_maintained precedent)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.operators.dedup import _doc_tokens
    from cuda_gis_smoothing_spark.operators.sketches import CMS_TOPK
    from cuda_gis_smoothing_spark.streaming.sketches import MaintainedCMS

    docs = load(spark, sf_dir, "documents")
    state = tempfile.mkdtemp(prefix="cms_state_")
    m = MaintainedCMS(spark, state)
    m.process_batch(docs, 0)
    toks = _doc_tokens(docs, "text", "doc_id", None)
    counts = toks.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    top = counts.orderBy(F.col("df").desc(), F.col("t").asc()).limit(CMS_TOPK)
    est = m.estimates(top.select("t"))  # eager-checkpoint contract
    shutil.rmtree(state, ignore_errors=True)
    return top.join(est, top["t"] == est["token"]).select(
        "token", "df", "cms_estimate"
    )


def _q_doc_length_histogram(spark, sf_dir):
    """Character-length histogram at fixed bucket width — the standard
    corpus length profile. Pure Catalyst: integer floor-div bucket +
    one hash aggregation."""
    docs = load(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / _LEN_BUCKET) * _LEN_BUCKET).cast("long")
    return docs.groupBy(bucket.alias("len_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        round6(F.avg("n_chars")).alias("avg_chars"),
    )


_CONTAM_K = 4
_CONTAM_BENCH = "src0"


def _q_contamination(spark, sf_dir):
    """Benchmark decontamination: k-gram shingle overlap between the
    held-out benchmark source and the training sources."""
    from cuda_gis_smoothing_spark.operators.curate import contamination_report

    return contamination_report(
        load(spark, sf_dir, "documents"), bench_source=_CONTAM_BENCH, k=_CONTAM_K
    )


def _q_pii_scan_report(spark, sf_dir):
    """Per-source PII exposure audit (email / digit-run / SSN shapes)
    — regex classes restricted to the RE2 ∩ Java search subset."""
    from cuda_gis_smoothing_spark.operators.curate import pii_scan_report

    return pii_scan_report(load(spark, sf_dir, "documents"))


def _q_doc_novelty(spark, sf_dir):
    """Per-doc share of corpus-first k-gram shingles (min doc id =
    deterministic ingest order) — the dedup-ordering card."""
    from cuda_gis_smoothing_spark.operators.curate import doc_novelty

    return doc_novelty(load(spark, sf_dir, "documents"))


def _q_source_stats(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.curate import source_stats

    return source_stats(load(spark, sf_dir, "documents"))


_OVERLAP_K = 5
_SPAN_GRAM = 4


def _q_duplicate_spans(spark, sf_dir):
    """Span-level duplicate detection: maximal shared token runs."""
    from cuda_gis_smoothing_spark.operators.dedup import duplicate_spans

    return duplicate_spans(load(spark, sf_dir, "documents"), gram_len=_SPAN_GRAM)


def _q_span_coverage(spark, sf_dir):
    """Per-doc duplicated-span token coverage (substring-dedup signal)."""
    from cuda_gis_smoothing_spark.operators.dedup import span_coverage

    return span_coverage(load(spark, sf_dir, "documents"), gram_len=_SPAN_GRAM)


def _q_doc_repetition(spark, sf_dir):
    """Gopher-style within-doc repetition quality signals."""
    from cuda_gis_smoothing_spark.operators.curate import repetition_signals

    return repetition_signals(load(spark, sf_dir, "documents"))


def _q_source_overlap(spark, sf_dir):
    """Pairwise cross-source k-gram overlap matrix (dataset audit)."""
    from cuda_gis_smoothing_spark.operators.curate import source_overlap

    return source_overlap(load(spark, sf_dir, "documents"), k=_OVERLAP_K)


def _q_curate_corpus_strict(spark, sf_dir):
    """Strict composed curation: lang -> quality -> repetition filter
    -> exact dedup -> span-coverage drop -> deterministic sample."""
    from cuda_gis_smoothing_spark.operators.curate import curate_corpus_strict

    return curate_corpus_strict(load(spark, sf_dir, "documents"))


def _q_quality_weighted_sample(spark, sf_dir):
    """Importance sampling: per-doc keep probability = quality score."""
    from cuda_gis_smoothing_spark.operators.sampling import (
        quality_weighted_sample,
    )

    return quality_weighted_sample(load(spark, sf_dir, "documents"))


_OVERLAP_MH_N = 32


def _q_language_confusion(spark, sf_dir):
    """Language-ID evaluation: confusion matrix vs the stored truth."""
    from cuda_gis_smoothing_spark.operators.curate import language_confusion

    return language_confusion(load(spark, sf_dir, "documents"))


def _q_source_overlap_minhash(spark, sf_dir):
    """MinHash-estimated cross-source overlap (aggregation-only path)."""
    from cuda_gis_smoothing_spark.operators.curate import source_overlap_minhash

    return source_overlap_minhash(
        load(spark, sf_dir, "documents"), k=_OVERLAP_K, n_hashes=_OVERLAP_MH_N
    )


def _q_bm25_topk(spark, sf_dir):
    """BM25 lexical top-k retrieval over fixed query terms."""
    from cuda_gis_smoothing_spark.operators.retrieval import bm25_topk

    return bm25_topk(load(spark, sf_dir, "documents"))


#: (query_id, term) rows for the inverted-index BM25 gate
_BM25_QUERIES = (
    (1, "spark"),
    (1, "join"),
    (2, "filter"),
    (2, "scan"),
    (2, "the"),
    (3, "vector"),
)


def _q_bm25_search(spark, sf_dir):
    """Inverted-index BM25 over a query table (the large-query path),
    routed THROUGH the maintained incremental index: the corpus is
    folded into a fresh SnapshotLog-backed MaintainedPostings as one
    batch and the search runs over the STORED index — so this
    CORRECTNESS row gates the maintained path (identical to direct
    bm25_search: shared bm25_score_postings kernel, tested also
    multi-batch/after-update in tests/test_streaming_retrieval.py)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.retrieval import MaintainedPostings

    qdf = spark.createDataFrame(
        list(_BM25_QUERIES), "query_id long, term string"
    )
    state = tempfile.mkdtemp(prefix="bm25_idx_")
    idx = MaintainedPostings(spark, state)
    idx.process_batch(load(spark, sf_dir, "documents"), 0)
    out = idx.search(qdf, k=10)
    # search() reads the state through an EAGER localCheckpoint (pinned
    # explicitly there — localCheckpoint(eager=True) — as a contract for
    # exactly this pattern), so the returned plan no longer references
    # the parquet dir — safe to GC now instead of leaking one postings
    # copy per gate invocation
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_curate_corpus(spark, sf_dir):
    """The composed training-data pipeline (lang filter -> quality
    filter -> exact dedup -> LSH-verified near-dup drop -> deterministic
    sample), driver-gated end-to-end as ONE query."""
    from cuda_gis_smoothing_spark.operators.curate import curate_corpus

    return curate_corpus(load(spark, sf_dir, "documents"))


def _q_dedup_components(spark, sf_dir):
    """Large-star/small-star edge rewiring (O(log n) rounds) vs a
    recursive DuckDB CTE — the one gate where the two engines run
    genuinely different algorithm families to the same fixpoint; the
    O(diameter) label-propagation twin is cross-checked in pytest."""
    from cuda_gis_smoothing_spark.operators.dedup import neardup_components

    return neardup_components(load(spark, sf_dir, "documents"), max_hamming=1)


def _q_dedup_component_sizes(spark, sf_dir):
    """Dataset-card cluster-size histogram: (size, n_components) over
    the simhash near-dup components — two hash aggregates on top of
    the star-CC fixpoint (singletons included: the size-1 row IS the
    'how much of the corpus is unique' headline number)."""
    from cuda_gis_smoothing_spark.operators.dedup import neardup_components

    comp = neardup_components(load(spark, sf_dir, "documents"), max_hamming=1)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
    )


def _q_dedup_components_maintained(spark, sf_dir):
    """The near-dup clustering served from MAINTAINED state (the
    bm25_search precedent): the corpus folds into a fresh
    MaintainedComponents as one batch and the label log serves the
    result — single batch == neardup_components exactly (integer
    min-id labels), so the twin is SHARED. Multi-batch/merge-relabel/
    crash-replay equality lives in tests/test_streaming_components.py."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.components import MaintainedComponents

    state = tempfile.mkdtemp(prefix="cc_state_")
    mc = MaintainedComponents(spark, state)
    mc.process_batch(load(spark, sf_dir, "documents"), 0)
    out = mc.components()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_embedding_components(spark, sf_dir):
    """Semantic-dedup clusters: star CC over the banded embedding
    near-dup graph, vs a recursive closure over the SAME banded SQL."""
    from cuda_gis_smoothing_spark.operators.dedup import embedding_components

    return embedding_components(
        load(spark, sf_dir, "embeddings"), threshold=_EMB_BANDED_THRESHOLD
    )


def _q_dedup_canonicals(spark, sf_dir):
    """Quality-argmax canonical per near-dup component (the keep-the-
    best-copy step after component labeling); ties to the smallest id."""
    from cuda_gis_smoothing_spark.operators.dedup import component_canonicals

    return component_canonicals(load(spark, sf_dir, "documents"), max_hamming=1)


def _q_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), threshold=_JACCARD_THRESHOLD, block_col="lang"
    )


def _q_knn_cosine(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_knn(emb, queries, k=5)


def _q_knn_graph(spark, sf_dir):
    """Exact corpus-wide k-NN graph via the blocked triangle join."""
    from cuda_gis_smoothing_spark.operators.similarity import knn_graph

    return knn_graph(load(spark, sf_dir, "embeddings"), k=5)


def _q_knn_mutual_pairs(spark, sf_dir):
    """Reciprocal k-NN filter: pairs where EACH vector ranks the other
    in its own top-k — one reversed-pair self-join of the
    localCheckpoint'ed exact graph; twin composed from the knn_graph
    SQL (the rrf_fusion nested-derived-table precedent)."""
    from cuda_gis_smoothing_spark.operators.similarity import knn_mutual_pairs

    return knn_mutual_pairs(load(spark, sf_dir, "embeddings"), k=5)


def _q_knn_label_vote(spark, sf_dir):
    """k-NN majority-vote label transfer across the portable-hash
    holdout cut — blocked pairwise cosines, round6 rank total order,
    integer vote argmax; the label-noise audit beside
    label_centroid_similarity."""
    from cuda_gis_smoothing_spark.operators.similarity import knn_label_vote

    return knn_label_vote(load(spark, sf_dir, "embeddings"))


def _q_split_leakage_check(spark, sf_dir):
    """Cross-split near-dup leakage audit: LSH candidates filtered to
    boundary-crossing pairs before the exact-jaccard verify; the
    cross-SPLIT sibling of contamination_report."""
    from cuda_gis_smoothing_spark.operators.curate import split_leakage_check

    return split_leakage_check(load(spark, sf_dir, "documents"))


def _q_label_confusion(spark, sf_dir):
    """Confusion matrix of the k-NN label vote — integer rollup of the
    gated vote output; twin nests the vote SQL (the knn_mutual_pairs
    composition precedent)."""
    from cuda_gis_smoothing_spark.operators.similarity import label_confusion

    return label_confusion(load(spark, sf_dir, "embeddings"))


def _q_ivf_silhouette(spark, sf_dir):
    """Per-vector silhouette over the seeded IVF buckets: a and b are
    ROUND6'd per-bucket means FIRST, the b argmin is a (mean, bucket)
    struct-MIN total order, and s divides the two rounded values — so
    both engines compute s from bit-identical inputs."""
    from cuda_gis_smoothing_spark.operators.similarity import ivf_silhouette

    return ivf_silhouette(load(spark, sf_dir, "embeddings"))


def _q_doc_keywords(spark, sf_dir):
    """Top-5 TF-IDF keywords per doc: one window over the gated sparse
    vectors, rank on (round6 tfidf DESC, token ASC) — a cross-engine
    total order."""
    from cuda_gis_smoothing_spark.functions.text import doc_keywords

    return doc_keywords(load(spark, sf_dir, "documents"))


def _q_basin_adjacency(spark, sf_dir):
    """Basin border report: ring-1 edges crossing basin labels,
    unordered pairs counted once — all-integer, tie-proof."""
    from cuda_gis_smoothing_spark.operators.hydrology import basin_adjacency

    return basin_adjacency(grid_from_lineitem(spark, sf_dir))


def _q_pq_recall_report(spark, sf_dir):
    """Recall@5 of PQ ADC search vs the exact ranker, per query —
    accuracy as a gated queryable artifact (integer overlap of two
    gated total orders; twin composes both ranker SQLs)."""
    from cuda_gis_smoothing_spark.operators.similarity import rank_overlap_report

    return rank_overlap_report(
        _q_knn_cosine(spark, sf_dir), _q_pq_search(spark, sf_dir)
    )


def _q_ivf_recall_report(spark, sf_dir):
    """Recall@5 of seeded-IVF probe search vs the exact ranker, per
    query (the pq_recall_report sibling)."""
    from cuda_gis_smoothing_spark.operators.similarity import rank_overlap_report

    return rank_overlap_report(
        _q_knn_cosine(spark, sf_dir), _q_knn_ivf(spark, sf_dir)
    )


def _q_graph_recall_report(spark, sf_dir):
    """Per-vector recall@5 of the IVF-probed k-NN graph against the
    exact graph (the pq_recall_report sibling at graph scale)."""
    from concurrent.futures import ThreadPoolExecutor

    from cuda_gis_smoothing_spark.operators.similarity import rank_overlap_report

    def as_q(df):
        return df.select(
            F.col("vec_id").alias("query_id"), "neighbor_id"
        )

    # the exact and the IVF graphs are independent multi-second jobs:
    # build+materialize both from a driver thread pool (guide §2.6)
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_ex = pool.submit(
            lambda: as_q(_q_knn_graph(spark, sf_dir)).localCheckpoint()
        )
        f_ap = pool.submit(
            lambda: as_q(_q_knn_graph_ivf(spark, sf_dir)).localCheckpoint()
        )
        ex, ap = f_ex.result(), f_ap.result()
    return rank_overlap_report(ex, ap)


def _q_kmv_error_report(spark, sf_dir):
    """KMV sketch accuracy as a gated artifact: per event type, the
    exact distinct-user count vs the sketch estimate and the relative
    error (rounded estimate − exact integer) / exact. NULL event types
    excluded (a NULL group key cannot equi-join its twin row)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    est = (
        _q_kmv_distinct_users(spark, sf_dir)
        .where(F.col("event_type").isNotNull())
        .select("event_type", "est_distinct")
    )
    exact = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "exact_distinct",
        "est_distinct",
        F.when(
            F.col("exact_distinct") > 0,
            round6(
                (F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct")
            ),
        ).alias("rel_error"),
    )


def _q_cms_error_report(spark, sf_dir):
    """Count-Min overestimation summary over the probed vocabulary:
    integer counts/max (CMS never underestimates) + the round6 mean
    relative overestimate — the sketch-health card."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    t = _q_vocab_cms_estimates(spark, sf_dir)
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum((F.col("cms_estimate") > F.col("df")).cast("long"))
        .cast("long")
        .alias("n_overestimated"),
        F.max(F.col("cms_estimate") - F.col("df"))
        .cast("long")
        .alias("max_overestimate"),
        round6(
            F.avg((F.col("cms_estimate") - F.col("df")) / F.col("df"))
        ).alias("mean_rel_overestimate"),
    )


def _q_banded_pair_recall(spark, sf_dir):
    """Pair-set recall of the banded embedding near-dup against the
    exact blocked join at the SAME threshold (banding verifies
    exactly, so banded pairs are a subset — the report quantifies the
    candidate-generation loss the banded docs describe): one integer
    row (n_exact_pairs, n_banded_pairs, n_common, recall)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_banded,
    )

    emb = load(spark, sf_dir, "embeddings")
    # the two pair kernels are independent jobs: materialize them from
    # a driver thread pool so their stage tails overlap (guide §2.6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_exact = pool.submit(
            lambda: embedding_neardup_pairs(emb, threshold=_EMB_BANDED_THRESHOLD)
            .select("vec_a", "vec_b")
            .localCheckpoint()  # count + intersection consumers
        )
        f_banded = pool.submit(
            lambda: embedding_neardup_pairs_banded(
                emb, threshold=_EMB_BANDED_THRESHOLD
            )
            .select("vec_a", "vec_b")
            .localCheckpoint()
        )
        exact, banded = f_exact.result(), f_banded.result()
    ne = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact_pairs"))
    nb = banded.agg(F.count(F.lit(1)).cast("long").alias("n_banded_pairs"))
    nc = exact.join(banded, ["vec_a", "vec_b"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    return (
        ne.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nc))
        .select(
            "n_exact_pairs",
            "n_banded_pairs",
            "n_common",
            F.when(
                F.col("n_exact_pairs") > 0,
                round6(
                    F.col("n_common").cast("double") / F.col("n_exact_pairs")
                ),
            ).alias("recall"),
        )
    )


def _q_minhash_error_report(spark, sf_dir):
    """MinHash estimator accuracy card (the kmv/cms_error_report
    sibling for the near-dup family): over the LSH candidate pairs
    (>=1 shared band — the regime where the pipeline actually consults
    the estimator, and sub-quadratic by construction), group by the
    matching-component count m and report integer pair counts plus the
    POOLED exact jaccard (sum_intersect / sum_union — integer sums,
    ONE division under round6; a per-pair mean of float jaccards would
    be a sum-association hazard) against the estimator's m/6.

    A band collision without any shared token is possible, so the
    intersection may be 0 — the twin LEFT-joins its token-equijoin
    intersection and coalesces to 0."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
        token_array_side,
    )

    docs = load(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    # two differently-renamed consumers of the signature aggregate
    sig = minhash_signatures(docs).localCheckpoint()
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh_{i}").alias(f"a_mh_{i}") for i in range(6)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh_{i}").alias(f"b_mh_{i}") for i in range(6)],
    )
    m_expr = sum(
        (F.col(f"a_mh_{i}") == F.col(f"b_mh_{i}")).cast("long") for i in range(6)
    )
    i_expr = F.size(F.array_intersect("_ta", "_tb")).cast("long")
    pairs = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(token_array_side(docs, "doc_a"), "doc_a")
        .join(token_array_side(docs, "doc_b"), "doc_b")
        .select(
            m_expr.alias("n_matching"),
            i_expr.alias("_i"),
            (
                F.size("_ta").cast("long") + F.size("_tb").cast("long") - i_expr
            ).alias("_u"),
        )
    )
    return pairs.groupBy("n_matching").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("_i").cast("long").alias("sum_intersect"),
        F.sum("_u").cast("long").alias("sum_union"),
    ).select(
        "n_matching",
        "n_pairs",
        "sum_intersect",
        "sum_union",
        round6(F.col("n_matching").cast("double") / F.lit(6.0)).alias(
            "est_jaccard"
        ),
        round6(
            F.col("sum_intersect").cast("double") / F.col("sum_union")
        ).alias("pooled_jaccard"),
    )


def _q_knn_graph_ivf(spark, sf_dir):
    """Approximate (IVF-blocked) corpus k-NN graph — the scale path of
    knn_graph (candidates from each vector's probed buckets, never
    N^2/2). Seeded centroids keep the whole bucket/probe/rank plumbing
    SQL-expressible for the twin; recall vs the exact graph is
    pytest-gated."""
    from cuda_gis_smoothing_spark.operators.similarity import knn_graph_ivf

    _ensure_shipped(spark)  # pandas UDFs run in py workers
    return knn_graph_ivf(
        load(spark, sf_dir, "embeddings"), k=5, n_centroids=8, n_probe=2
    )


def _q_knn_graph_ivf_trained(spark, sf_dir):
    """The ANN graph under TRAINED (k-means||) centroids — the variant
    a production semantic-dedup pipeline runs (measured recall 0.52 vs
    0.43 seeded on the fixture). ROWS-ONLY gate BY DESIGN: Lloyd means
    aggregate distributed doubles, so trained centroids are not
    SQL-expressible/bit-stable cross-engine (train_centroids docstring)
    — quality is recall-gated in pytest
    (tests/test_partitioning_dedup.py::test_knn_graph_ivf_recall_vs_exact)
    and the bucket/probe/rank plumbing is identical to the seeded
    knn_graph_ivf gate, which the SQL twin checks every round."""
    from cuda_gis_smoothing_spark.operators.similarity import (
        knn_graph_ivf,
        train_centroids,
    )

    _ensure_shipped(spark)  # pandas UDFs run in py workers
    emb = load(spark, sf_dir, "embeddings")
    cents = train_centroids(emb, n_centroids=8, iters=3)
    return knn_graph_ivf(emb, k=5, n_centroids=8, n_probe=2, centroids=cents)


def _q_knn_lsh(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.similarity import lsh_bucketed_knn

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_bucketed_knn(emb, queries, k=5, n_planes=_LSH_PLANES)


def _q_knn_ivf(spark, sf_dir):
    """IVF ANN through the REAL pandas-UDF bucketing operator, gated
    against a SQL oracle: centroid training is deterministic (seeds =
    the 8 smallest vec_ids, normalized) so bucket assignment and
    probing are expressible as a ranked cross join in DuckDB."""
    from cuda_gis_smoothing_spark.operators.similarity import ivf_knn

    _ensure_shipped(spark)  # pandas UDFs run in py workers
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_knn(emb, queries, k=5, n_centroids=8, n_probe=2)


def _q_knn_ivf_maintained(spark, sf_dir):
    """The SAME seeded-centroid IVF ANN served from the MAINTAINED
    vector log (streaming/similarity.MaintainedIVF): the corpus folds
    into a fresh single-batch index and the query runs the shared
    probe/join/rank kernel over STORED (vec_id, bucket, emb, nrm) rows
    — this CORRECTNESS row gates the incremental-ingest path against
    the identical SQL twin (multi-batch/after-update equality is in
    tests/test_streaming_similarity.py)."""
    import shutil
    import tempfile

    import numpy as np

    from cuda_gis_smoothing_spark.streaming.similarity import MaintainedIVF

    _ensure_shipped(spark)
    emb = load(spark, sf_dir, "embeddings")
    # the knn_ivf gate's deterministic seeds: the 8 smallest vec_ids
    seeds = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    cents = np.asarray([r[0] for r in seeds], dtype=np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12
    state = tempfile.mkdtemp(prefix="ivf_idx_")
    idx = MaintainedIVF(spark, state, cents)
    idx.process_batch(emb, 0)
    queries = emb.where(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = idx.query(queries, k=5, n_probe=2)
    # query() reads state through an EAGER localCheckpoint — safe to GC
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_pip_regions(spark, sf_dir):
    """Point-in-polygon through the REAL broadcast+numpy-raycast
    operator, gated against an unrolled literal-polygon SQL oracle."""
    from cuda_gis_smoothing_spark import datagen
    from cuda_gis_smoothing_spark.operators.spatial import centroid_sql, point_in_polygon

    _ensure_shipped(spark)  # the ray-cast pandas UDF runs in py workers
    cells = grid_from_lineitem(spark, sf_dir).select("cell")
    lat, lon = centroid_sql("cell", "spark")
    pts = cells.select(
        "cell", F.expr(lat).alias("lat"), F.expr(lon).alias("lon")
    )
    out = point_in_polygon(pts, datagen.gen_boundaries())
    return out.select("cell", "region_id")


def _q_knn_cells(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.spatial import centroid_sql, knn

    cells = grid_from_lineitem(spark, sf_dir).select("cell")
    lat, lon = centroid_sql("cell", "spark")
    pts = cells.select("cell", F.expr(lat).alias("lat"), F.expr(lon).alias("lon"))
    queries = pts.where(F.col("cell") % 37 == 0).select(
        F.col("cell").alias("query_id"), "cell", "lat", "lon"
    )
    out = knn(pts, queries, k=5, ring=2, id_col="cell", query_id_col="query_id")
    return out.select("query_id", F.col("cell").alias("neighbor_cell"), "rank")


def _q_tile_pyramid(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.spatial import tile_pyramid

    return tile_pyramid(grid_from_lineitem(spark, sf_dir), zooms=(10, 11, 12))


def _q_dedup_normalized(spark, sf_dir):
    """Normalization-aware exact dedup (case/punct/whitespace-variant
    groups) — the 'soft exact' first pass of web-corpus pipelines."""
    from cuda_gis_smoothing_spark.operators.dedup import normalized_dedup

    return normalized_dedup(load(spark, sf_dir, "documents"))


_CONTAINMENT_T = 0.8


def _q_dedup_containment(spark, sf_dir):
    """Token-set containment pairs (doc-inside-doc duplication) via
    the asymmetric AllPairs prefix join."""
    from cuda_gis_smoothing_spark.operators.dedup import containment_pairs

    return containment_pairs(
        load(spark, sf_dir, "documents"), threshold=_CONTAINMENT_T
    )


def _q_dedup_containment_banded(spark, sf_dir):
    """The recall-traded LSH candidate route for containment (banded
    MinHash + size-bucket gap, exact verify) — the sub-quadratic
    sibling of dedup_containment; recall vs the exact path is measured
    in pytest and documented as inherently partial."""
    from cuda_gis_smoothing_spark.operators.dedup import containment_pairs_banded

    return containment_pairs_banded(
        load(spark, sf_dir, "documents"), threshold=_CONTAINMENT_T
    )


def _q_cross_source_dups(spark, sf_dir):
    """Cross-source exact-duplication audit (digest-keyed provenance
    overlap)."""
    from cuda_gis_smoothing_spark.operators.curate import cross_source_dups

    return cross_source_dups(load(spark, sf_dir, "documents"))


def _q_decontaminated_corpus(spark, sf_dir):
    """Decontamination as a pipeline stage: the training corpus minus
    benchmark-shingle-sharing docs."""
    from cuda_gis_smoothing_spark.operators.curate import decontaminated_corpus

    return decontaminated_corpus(
        load(spark, sf_dir, "documents"), bench_source=_CONTAM_BENCH, k=_CONTAM_K
    )


def _q_doc_skyline(spark, sf_dir):
    """Pareto skyline over (quality, tokens): per-quality max + ONE
    running max over distinct quality levels — no quadratic dominance
    join; equal points are mutually non-dominating and all kept."""
    from cuda_gis_smoothing_spark.operators.curate import doc_skyline

    return doc_skyline(load(spark, sf_dir, "documents"))


def _q_decontaminated_bloom(spark, sf_dir):
    """The 100 TB decontamination path: benchmark shingles fold into a
    broadcast 8 KB Bloom mask, training shingles drop MAP-SIDE, exact
    verify on candidates only — no false negatives + verify ⇒ output
    == decontaminated_corpus bit-for-bit (SHARED twin)."""
    from cuda_gis_smoothing_spark.operators.curate import decontaminated_bloom

    return decontaminated_bloom(
        load(spark, sf_dir, "documents"), bench_source=_CONTAM_BENCH, k=_CONTAM_K
    )


_VOCAB_MIN_DF = 2
_BIGRAM_K = 30


def _q_vocab_df_idf(spark, sf_dir):
    """The corpus vocabulary table (token, df, idf) above a df floor —
    the materialized statistics BM25/stop-listing read, served from the
    MAINTAINED dfreq + stats logs: the corpus folds into a fresh
    single-batch MaintainedPostings and the vocabulary is read from its
    term-keyed df log (zero postings aggregation at read time), so this
    CORRECTNESS row gates the maintained-statistics path every round
    (multi-batch/after-update equality vs the batch rebuild is in
    tests/test_streaming_retrieval.py). idf is the repo's BM25
    convention ln(1 + (N - df + .5)/(df + .5))."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.retrieval import MaintainedPostings

    _ensure_shipped(spark)
    state = tempfile.mkdtemp(prefix="vocab_idx_")
    idx = MaintainedPostings(spark, state)
    idx.process_batch(load(spark, sf_dir, "documents"), 0)
    out = idx.vocab_df_idf(min_df=_VOCAB_MIN_DF)
    # vocab_df_idf reads state through an EAGER localCheckpoint (its
    # documented contract) — safe to GC the state dir now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_sequence_packing(spark, sf_dir):
    """Concat-and-chunk sequence packing: each doc's (start_seq,
    seq_offset) in the fixed-length packed token stream, via the
    partition-parallel exclusive prefix sum (never a global-sort
    window)."""
    from cuda_gis_smoothing_spark.operators.packing import pack_sequences

    return pack_sequences(load(spark, sf_dir, "documents"))


def _q_packing_manifest(spark, sf_dir):
    """The loader-facing fragment manifest: one row per (sequence, doc
    fragment), straddling docs expanded via a bounded sequence
    explode."""
    from cuda_gis_smoothing_spark.operators.packing import packing_manifest

    return packing_manifest(load(spark, sf_dir, "documents"))


def _q_curate_packed(spark, sf_dir):
    """Composition: the curated corpus (lang -> quality -> dedup ->
    near-dup -> sample) laid out as fixed-length training sequences —
    the end-to-end corpus-build-to-dataloader story as ONE gate."""
    from cuda_gis_smoothing_spark.operators.curate import curate_corpus
    from cuda_gis_smoothing_spark.operators.packing import pack_from_counts

    curated = curate_corpus(load(spark, sf_dir, "documents"))
    return pack_from_counts(curated.select("doc_id", "n_tokens"))


def _q_events_daily_anomaly(spark, sf_dir):
    """Per-(type, day) volume z-score vs the type's own daily
    mean/stddev — aggregation-only, no windows (tie-proof)."""
    from cuda_gis_smoothing_spark.operators.events import daily_anomaly

    return daily_anomaly(load(spark, sf_dir, "events"))


def _q_bigram_pmi(spark, sf_dir):
    """Top-k adjacent-token bigrams with pointwise mutual information —
    the collocation/co-occurrence statistic embedding pipelines
    precompute."""
    from cuda_gis_smoothing_spark.functions.text import bigram_pmi

    return bigram_pmi(load(spark, sf_dir, "documents"), k=_BIGRAM_K)


def _q_bigram_pmi_maintained(spark, sf_dir):
    """The SAME top-k PMI table served from maintained co-occurrence
    logs (bigram/unigram count tables + the 1-row totals log — zero
    corpus re-tokenization/re-aggregation at read time): the corpus
    folds into a fresh single-batch MaintainedBigrams, so this
    CORRECTNESS row gates the maintained collocation path against the
    identical SQL twin every round (the doc_tfidf_maintained
    precedent)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.cooccur import MaintainedBigrams

    state = tempfile.mkdtemp(prefix="bigram_state_")
    mb = MaintainedBigrams(spark, state)
    mb.process_batch(load(spark, sf_dir, "documents"), 0)
    out = mb.bigram_pmi(k=_BIGRAM_K)  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


_COOC_WINDOW = 3


def _q_cooccurrence_window_maintained(spark, sf_dir):
    """The SAME top-k windowed co-occurrence table served from a
    maintained pair-count log (window=3 MaintainedBigrams instance —
    zero corpus re-tokenization at read time; the
    bigram_pmi_maintained precedent, windowed)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.cooccur import MaintainedBigrams

    state = tempfile.mkdtemp(prefix="cooc_state_")
    mb = MaintainedBigrams(spark, state, window=_COOC_WINDOW)
    mb.process_batch(load(spark, sf_dir, "documents"), 0)
    out = mb.cooccurrence(k=_BIGRAM_K)  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_keyword_textrank_maintained(spark, sf_dir):
    """TextRank served from the window=3 maintained pair log: the
    distinct co-occurrence graph recovered from state (O(vocab)), the
    shared pagerank core at read time — zero corpus re-tokenization."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.cooccur import MaintainedBigrams

    state = tempfile.mkdtemp(prefix="textrank_state_")
    mb = MaintainedBigrams(spark, state, window=_COOC_WINDOW)
    mb.process_batch(load(spark, sf_dir, "documents"), 0)
    out = mb.textrank()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_doc_bigram_logprob(spark, sf_dir):
    """Interpolated bigram-LM self-score per doc — the second-order
    perplexity-filter signal (λ·bigram MLE + (1−λ)·unigram backoff)."""
    from cuda_gis_smoothing_spark.functions.text import doc_bigram_logprob

    return doc_bigram_logprob(load(spark, sf_dir, "documents"))


def _q_source_kl_divergence(spark, sf_dir):
    """Per-source KL(P_source ‖ P_corpus) over unigram distributions —
    the dataset-card drift statistic."""
    from cuda_gis_smoothing_spark.functions.text import source_kl_divergence

    return source_kl_divergence(load(spark, sf_dir, "documents"))


def _q_cooccurrence_window(spark, sf_dir):
    """Top-k windowed (skip-gram) co-occurrence pairs — the
    co-occurrence-matrix builder for embedding training; all-integer
    output on a deterministic total order."""
    from cuda_gis_smoothing_spark.functions.text import cooccurrence_window

    return cooccurrence_window(
        load(spark, sf_dir, "documents"), window=_COOC_WINDOW, k=_BIGRAM_K
    )


_PQ_M = 8
_PQ_KSUB = 16


def _q_pq_codes(spark, sf_dir):
    """Product-quantization codes (vec_id, subspace, code) under the
    SEEDED codebook (sub-centroid (s, j) = subspace s of the j-th
    smallest-id vector) — the 32x-compressed vector layout IVF-PQ
    stores at 100 TB; all-integer output, argmin tie-broken on cid."""
    from cuda_gis_smoothing_spark.operators.quantization import pq_encode

    return pq_encode(load(spark, sf_dir, "embeddings"), m=_PQ_M, ksub=_PQ_KSUB)


def _q_pq_search(spark, sf_dir):
    """ADC top-k over PQ reconstructions: exact query vs quantized
    corpus (q·q + r·r − 2·q·r, every dot a sequential fold — bit-
    identical cross-engine). Recall vs exact L2 is pytest-gated."""
    from cuda_gis_smoothing_spark.operators.quantization import pq_search

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_search(emb, queries, k=5, m=_PQ_M, ksub=_PQ_KSUB)


def _q_ivfpq_search(spark, sf_dir):
    """IVF-PQ: the FAISS-style two-level ANN layout — IVF buckets prune
    candidates, ADC over PQ reconstructions ranks them (coarse probe by
    cosine, fine rank by L2 — the standard mixed-metric recipe). Both
    quantizers seeded ⇒ fully twin-checkable; all-bucket probe ==
    pq_search exactly (pytest)."""
    from cuda_gis_smoothing_spark.operators.quantization import ivfpq_search

    _ensure_shipped(spark)  # pandas UDFs run in py workers
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivfpq_search(
        emb, queries, k=5, m=_PQ_M, ksub=_PQ_KSUB, n_centroids=8, n_probe=2
    )


def _q_pq_codes_maintained(spark, sf_dir):
    """The SAME seeded PQ codes served from the MAINTAINED vec-keyed
    codes log (streaming/quantization.MaintainedPQ): the corpus folds
    into a fresh single-batch state and codes() reads STORED rows —
    this CORRECTNESS row gates the incremental-ingest path against
    pq_codes' identical SQL twin (multi-batch/update/tombstone
    equality is in tests/test_streaming_quantization.py)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.quantization import MaintainedPQ

    emb = load(spark, sf_dir, "embeddings")
    state = tempfile.mkdtemp(prefix="pq_state_")
    mpq = MaintainedPQ.seeded(spark, state, emb, m=_PQ_M, ksub=_PQ_KSUB)
    mpq.process_batch(emb, 0)
    out = mpq.codes()  # reads state through an EAGER localCheckpoint
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_ivfpq_search_maintained(spark, sf_dir):
    """ivfpq_search served from the COMPOSED maintained two-tier
    export (streaming/quantization.export_ivfpq: MaintainedIVF bucket
    rows ⋈ MaintainedPQ code rows → one bucket-partitioned
    operators/quantization.IVFPQIndex): both logs fold a fresh
    single batch, the export joins their latest-wins views, and
    search runs ADC over STORED codes with PartitionFilters pruning
    unprobed buckets — this CORRECTNESS row gates the whole
    log→export→probe path against ivfpq_search's identical SQL twin
    (multi-batch / update / tombstone equality is in
    tests/test_ivfpq_index.py). The result is eagerly checkpointed so
    the state and index directories can be deleted once the plan is
    built (the _q_bm25_search contract)."""
    import shutil
    import tempfile

    import numpy as np

    from cuda_gis_smoothing_spark.streaming.quantization import (
        MaintainedPQ,
        export_ivfpq,
    )
    from cuda_gis_smoothing_spark.streaming.similarity import MaintainedIVF

    from concurrent.futures import ThreadPoolExecutor

    _ensure_shipped(spark)  # pandas UDFs run in py workers
    emb = load(spark, sf_dir, "embeddings")

    # the seed/codebook collects and the two state builds are pairwise
    # independent jobs — overlap each pair from a driver thread pool
    # (guide §2.6, the MaintainedComponents precedent) instead of four
    # serialized cluster-idle actions; write order WITHIN each log is
    # unchanged (each process_batch keeps its own replay-guard order).
    def _seed_rows(n):
        return (
            emb.orderBy("vec_id")
            .limit(n)
            .select(F.col("embedding").cast("array<double>"))
            .collect()
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        seeds_f = pool.submit(_seed_rows, 8)
        brows_f = pool.submit(_seed_rows, _PQ_KSUB)
        seeds, brows = seeds_f.result(), brows_f.result()
    cents = np.asarray([r[0] for r in seeds], dtype=np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12
    book = np.asarray([r[0] for r in brows], dtype=np.float64)
    root = tempfile.mkdtemp(prefix="ivfpq_state_")
    ivf = MaintainedIVF(spark, f"{root}/ivf", cents)
    pq = MaintainedPQ(spark, f"{root}/pq", book, m=_PQ_M)
    with ThreadPoolExecutor(max_workers=2) as pool:
        ivf_f = pool.submit(ivf.process_batch, emb, 0)
        pq_f = pool.submit(pq.process_batch, emb, 0)
        ivf_f.result()
        pq_f.result()
    idx = export_ivfpq(ivf, pq, f"{root}/exp")
    queries = emb.where(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = idx.search(queries, k=5, n_probe=2).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


def _q_cell_pagerank(spark, sf_dir):
    """Fixed-iteration (5) PageRank over ring-1 contiguity — an
    ITERATIVE algorithm driver-hash-gated via an unrolled 5-CTE twin."""
    return stats_ops.cell_pagerank(grid_from_lineitem(spark, sf_dir))


def _q_pq_search_trained(spark, sf_dir):
    """ADC search under a per-subspace k-means-TRAINED codebook — the
    production PQ path. ROWS-ONLY gate BY DESIGN (numpy Lloyd means
    are not SQL-expressible — the knn_graph_ivf_trained precedent);
    encode/reconstruct/rank run the SAME kernels the twin-checked
    seeded pq_search gate pins, and recall is pytest-gated
    (tests/test_quantization.py — trained ≈ seeded on the isotropic
    random fixture, measured and documented in the operator)."""
    from cuda_gis_smoothing_spark.operators.quantization import pq_search_trained

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_search_trained(emb, queries, k=5, m=_PQ_M, ksub=_PQ_KSUB)


def _q_sq_codes(spark, sf_dir):
    """SQ8-style scalar quantization codes (vec_id, dim, code) — the
    per-dimension compressed vector layout beside PQ; calibration =
    corpus per-dim min/max (association-order-free aggregates)."""
    from cuda_gis_smoothing_spark.operators.quantization import sq_encode

    return sq_encode(load(spark, sf_dir, "embeddings"), levels=_SQ_LEVELS)


def _q_sq_search(spark, sf_dir):
    """ADC top-k over SQ midpoint reconstructions — same total order
    and output shape as pq_search; recall pytest-gated (SQ8 on 64 dims
    reconstructs far tighter than 8-subspace PQ)."""
    from cuda_gis_smoothing_spark.operators.quantization import sq_search

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sq_search(emb, queries, k=5, levels=_SQ_LEVELS)


def _q_morans_i_bivariate(spark, sf_dir):
    """Bivariate Moran's I between ndvi and OBSERVATION DENSITY (per-
    cell lineitem row count — genuinely not an affine image of ndvi,
    unlike the derived bands): does vegetation here predict sampling
    density next door? Completes the spatial-autocorrelation family's
    cross-variable member."""
    from cuda_gis_smoothing_spark.sources.tables import GRID

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_quantity"
    )
    q = F.col("l_partkey") % GRID
    r = F.col("l_orderkey") % GRID
    cell = ((q + OFFSET) * ENC + (r + OFFSET)).alias("cell")
    cells = (
        li.select(cell, "l_quantity")
        .groupBy("cell")
        .agg(
            (F.sum("l_quantity") / F.count(F.lit(1)) / 50.0).alias("ndvi"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .localCheckpoint()  # three consumers: means, deviations, edges
    )
    return stats_ops.bivariate_morans_i(cells, "ndvi", "n_obs")


def _q_source_kl_maintained(spark, sf_dir):
    """The SAME per-source KL drift table served from maintained
    (source, token) count logs — zero corpus re-tokenization at read
    time: the corpus folds into a fresh single-batch
    MaintainedSourceTokens, so this CORRECTNESS row gates the
    maintained path against the batch twin's SQL every round (the
    bigram_pmi_maintained precedent)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.source_stats import (
        MaintainedSourceTokens,
    )

    state = tempfile.mkdtemp(prefix="srckl_state_")
    mst = MaintainedSourceTokens(spark, state)
    mst.process_batch(load(spark, sf_dir, "documents"), 0)
    out = mst.kl()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_zipf_fit_maintained(spark, sf_dir):
    """The SAME corpus Zipf fit served from maintained (source, token)
    count logs — the second read-side statistic over the
    MaintainedSourceTokens state (zero corpus re-tokenization at read
    time); single-batch state == the batch count table exactly, so the
    batch twin is SHARED (the source_kl_maintained precedent)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.source_stats import (
        MaintainedSourceTokens,
    )

    state = tempfile.mkdtemp(prefix="zipf_state_")
    mst = MaintainedSourceTokens(spark, state)
    mst.process_batch(load(spark, sf_dir, "documents"), 0)
    out = mst.zipf()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


_QSK_K = 64


def _q_value_quantiles_sketch(spark, sf_dir):
    """Approximate per-type value quantiles from a bottom-k-by-hash
    sample — the deterministic, mergeable, twin-exact alternative to
    approx_percentile (engine-private sketch) and to exact percentile
    (full per-group sort at 100 TB)."""
    from cuda_gis_smoothing_spark.operators.events import PCT_QS
    from cuda_gis_smoothing_spark.operators.sketches import kmv_quantile_sketch

    return kmv_quantile_sketch(
        load(spark, sf_dir, "events"),
        "value",
        "event_id",
        PCT_QS,
        group_cols=("event_type",),
        k=_QSK_K,
    )


def _q_value_quantiles_maintained(spark, sf_dir):
    """The SAME quantile-sketch table served from maintained bottom-k
    sample logs (value rides with the hash, so bottom-k samples merge
    like KMV sketches): the events fold into a fresh single-batch
    MaintainedQuantiles, gating the maintained path against the batch
    twin every round."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.operators.events import PCT_QS
    from cuda_gis_smoothing_spark.streaming.sketches import (
        MaintainedQuantiles,
    )

    state = tempfile.mkdtemp(prefix="mq_state_")
    mq = MaintainedQuantiles(
        spark, state, ["event_type"], "event_id", "value", k=_QSK_K
    )
    mq.process_batch(load(spark, sf_dir, "events"), 0)
    out = mq.quantiles(PCT_QS)  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_source_overlap_kmv(spark, sf_dir):
    """KMV-sketch cross-source shingle SET OPERATIONS: estimated
    |A|, |B|, |A∪B|, |A∩B| and Jaccard per source pair — the sketch
    sibling of source_overlap (exact) and source_overlap_minhash
    (ratio-only); sketches are mergeable, so at 100 TB per-source
    sketches accumulate across partitions/days without re-reading."""
    from cuda_gis_smoothing_spark.operators.sketches import kmv_shingle_overlap

    return kmv_shingle_overlap(
        load(spark, sf_dir, "documents"), k_shingle=_OVERLAP_K, k=64
    )


def _q_kmv_distinct_users(spark, sf_dir):
    """Per-event-type approximate distinct users via a k-minimum-values
    sketch over the PORTABLE hash — the cross-engine-gateable
    cardinality sketch (HLL/approx_count_distinct use engine-private
    hashes and can't be twinned; KMV over the repo hash can). The
    fixture's 150 distinct users per type exceed k=64, so the gate
    exercises the real estimator, not the exact fallback."""
    from cuda_gis_smoothing_spark.operators.sketches import kmv_distinct

    return kmv_distinct(
        load(spark, sf_dir, "events"), ["event_type"], "user_id", k=64
    )


def _q_source_overlap_kmv_maintained(spark, sf_dir):
    """The SAME cross-source set-operation table served from maintained
    per-source shingle sketches (the members hook + overlap_pairs) —
    the 'sketches merge across days without re-reading documents'
    claim, gated: single-batch state == kmv_shingle_overlap exactly."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.operators.sketches import (
        shingle_hash_members,
    )
    from cuda_gis_smoothing_spark.streaming.sketches import MaintainedKMV

    state = tempfile.mkdtemp(prefix="kmvov_state_")
    mk = MaintainedKMV(
        spark,
        state,
        ["source"],
        k=64,
        members=lambda df: shingle_hash_members(df, _OVERLAP_K),
    )
    mk.process_batch(load(spark, sf_dir, "documents"), 0)
    out = mk.overlap_pairs()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_kmv_distinct_maintained(spark, sf_dir):
    """The SAME per-type distinct-user sketch table served from a
    maintained group-keyed KMV log (union-of-sketches == sketch-of-
    union; O(touched-groups × k) deltas, state #groups × k longs): the
    events fold into a fresh single-batch MaintainedKMV, so this
    CORRECTNESS row gates the maintained sketch path against
    kmv_distinct's twin every round."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.sketches import MaintainedKMV

    state = tempfile.mkdtemp(prefix="kmv_state_")
    mk = MaintainedKMV(spark, state, ["event_type"], "user_id", k=64)
    mk.process_batch(load(spark, sf_dir, "events"), 0)
    out = mk.distinct_counts()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test holdout assignment per doc (90/5/5
    over the portable hash space) — retry/re-ingest-stable by
    construction."""
    from cuda_gis_smoothing_spark.operators.sampling import dataset_split

    return dataset_split(load(spark, sf_dir, "documents"))


def _q_embedding_norms(spark, sf_dir):
    """One-row embedding-table sanity profile (counts, dims, norm
    spread, zero vectors) — the pre-indexing dataset card."""
    from cuda_gis_smoothing_spark.operators.similarity import embedding_norms

    return embedding_norms(load(spark, sf_dir, "embeddings"))


def _q_ivf_bucket_stats(spark, sf_dir):
    """IVF quantizer occupancy (bucket, n_vectors, share), dead buckets
    included — the ANN index-health report."""
    from cuda_gis_smoothing_spark.operators.similarity import ivf_bucket_stats

    _ensure_shipped(spark)
    return ivf_bucket_stats(load(spark, sf_dir, "embeddings"), n_centroids=8)


def _q_doc_tfidf(spark, sf_dir):
    """Sparse TF-IDF document vectors (coordinate form)."""
    from cuda_gis_smoothing_spark.functions.text import doc_tfidf

    return doc_tfidf(load(spark, sf_dir, "documents"))


def _q_doc_tfidf_maintained(spark, sf_dir):
    """The SAME sparse TF-IDF vectors served from the maintained index
    logs (stored postings for tf, the dfreq log for df, the 1-row
    stats log for N — zero corpus re-tokenization/re-aggregation at
    read time): the corpus folds into a fresh single-batch
    MaintainedPostings, so this CORRECTNESS row gates the maintained
    vectorization path against the identical SQL twin every round."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.retrieval import MaintainedPostings

    _ensure_shipped(spark)
    state = tempfile.mkdtemp(prefix="tfidf_idx_")
    idx = MaintainedPostings(spark, state)
    idx.process_batch(load(spark, sf_dir, "documents"), 0)
    out = idx.doc_tfidf()  # eager-checkpoint contract: safe to GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


_FEATURE_DIM = 64


def _q_feature_hashing(spark, sf_dir):
    """Hashing-trick sparse doc vectors, L2-normalized per doc."""
    from cuda_gis_smoothing_spark.functions.text import feature_hashed_vectors

    return feature_hashed_vectors(load(spark, sf_dir, "documents"), dim=_FEATURE_DIM)


def _q_sessionize(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.events import sessionize

    return sessionize(load(spark, sf_dir, "events"))


def _q_asof_attribution(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.events import asof_attribute

    return asof_attribute(load(spark, sf_dir, "events"))


def _q_range_join(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.events import range_join_followups

    return range_join_followups(load(spark, sf_dir, "events"))


def _q_events_rollup(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.events import events_rollup

    return events_rollup(load(spark, sf_dir, "events"))


def _q_user_moving_avg(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.events import user_moving_avg

    return user_moving_avg(load(spark, sf_dir, "events"))


def _q_value_outliers(spark, sf_dir):
    """Tukey IQR outlier screen per event type (exact q1/q3 through
    the shared percentile kernel — boundary doubles identical
    cross-engine)."""
    from cuda_gis_smoothing_spark.operators.events import value_outliers

    return value_outliers(load(spark, sf_dir, "events"))


def _q_value_percentiles(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.events import value_percentiles

    return value_percentiles(load(spark, sf_dir, "events"))


def _q_funnel(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.events import funnel_conversion

    return funnel_conversion(load(spark, sf_dir, "events"))


def _q_cohort_retention(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.events import cohort_retention

    return cohort_retention(load(spark, sf_dir, "events"))


def _q_top_event_types(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.events import top_event_types_per_user

    return top_event_types_per_user(load(spark, sf_dir, "events"), k=3)


def _q_dedup_lines(spark, sf_dir):
    """C4-style line-level dedup over aligned 8-token chunk-lines:
    drop every occurrence of a cross-doc repeated chunk except the
    global first, reassemble each doc. NULL-text rows preserved."""
    from cuda_gis_smoothing_spark.operators.dedup import line_dedup

    return line_dedup(load(spark, sf_dir, "documents"))


def _q_boilerplate_lines(spark, sf_dir):
    """Boilerplate chunk-line audit: top-k chunks by doc frequency —
    one explode + hash aggregate + TakeOrderedAndProject."""
    from cuda_gis_smoothing_spark.operators.dedup import boilerplate_chunks

    return boilerplate_chunks(load(spark, sf_dir, "documents"))


def _q_blocking_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: double-correlated EXISTS + NOT-EXISTS,
    decorrelated into order-keyed aggregates (top-2 trick)."""
    from cuda_gis_smoothing_spark.operators.analytics import blocking_suppliers

    return blocking_suppliers(
        load(spark, sf_dir, "supplier"), load(spark, sf_dir, "lineitem")
    )


def _q_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: scalar-subquery threshold (integer-exact
    rational compare) + LEFT ANTI join on orders."""
    from cuda_gis_smoothing_spark.operators.analytics import idle_customers

    return idle_customers(
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    )


def _q_nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape: conditional share-of-group over one join tree
    (CASE-gated and total sums from the same fact rows)."""
    from cuda_gis_smoothing_spark.operators.analytics import nation_market_share

    return nation_market_share(
        load(spark, sf_dir, "region"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "supplier"),
    )


def _q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 proper: the dimension-attribute equality
    (s_nationkey = c_nationkey) riding the broadcast supplier join —
    the one canonical star shape region_revenue doesn't express."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        local_supplier_volume,
    )

    return local_supplier_volume(
        load(spark, sf_dir, "region"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "supplier"),
    )


def _q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: pushed shipdate filter + one wide multi-
    aggregate pass, every measure an exact scaled-integer sum."""
    from cuda_gis_smoothing_spark.operators.analytics import pricing_summary

    return pricing_summary(load(spark, sf_dir, "lineitem"))


def _q_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: cross-nation revenue matrix per ship year
    (full matrix — a fixed nation pair is degenerate at sf0.001)."""
    from cuda_gis_smoothing_spark.operators.analytics import volume_shipping

    return volume_shipping(
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "lineitem"),
    )


def _q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: max-revenue supplier(s) in a quarter — the
    scalar-subquery-on-aggregate plan, integer-exact tie compare."""
    from cuda_gis_smoothing_spark.operators.analytics import top_supplier

    return top_supplier(
        load(spark, sf_dir, "supplier"), load(spark, sf_dir, "lineitem")
    )


def _q_dedup_lines_maintained(spark, sf_dir):
    """The SAME per-doc line-dedup table served from maintained
    chunk-df/first-occurrence logs (the corpus is never re-read at
    serve time): the corpus folds into a fresh single-batch
    MaintainedLines, so this CORRECTNESS row gates the incremental
    path against the identical SQL twin (the bm25_search precedent)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.lines import MaintainedLines

    state = tempfile.mkdtemp(prefix="lines_state_")
    ml = MaintainedLines(spark, state)
    ml.process_batch(load(spark, sf_dir, "documents"), 0)
    out = ml.line_dedup()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_boilerplate_maintained(spark, sf_dir):
    """The boilerplate chunk-line audit served PURELY from maintained
    (df, occ, chunk-text) stats — the corpus folds into a fresh
    single-batch MaintainedLines and the report reads O(chunk vocab)
    state rows (the bm25_search precedent: the driver gates the
    incremental path against the identical SQL twin)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.lines import MaintainedLines

    state = tempfile.mkdtemp(prefix="lines_state_")
    ml = MaintainedLines(spark, state)
    ml.process_batch(load(spark, sf_dir, "documents"), 0)
    out = ml.boilerplate_chunks()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_dedup_embedding(spark, sf_dir):
    """Exact all-pairs cosine near-dup through the blocked triangle
    equi-join (no Cartesian/NestedLoop node — plan-asserted)."""
    from cuda_gis_smoothing_spark.operators.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(load(spark, sf_dir, "embeddings"), threshold=0.4)


_EMB_BANDED_THRESHOLD = 0.2


def _q_dedup_embedding_banded(spark, sf_dir):
    """Bucketed near-dup path: banded hyperplane sign-bit candidates +
    exact cosine verify — gated against a DuckDB twin of the SAME
    banded semantics (the knn_lsh precedent: the gate proves the Spark
    bucketed plan implements the declared arithmetic exactly)."""
    from cuda_gis_smoothing_spark.operators.dedup import embedding_neardup_pairs_banded

    return embedding_neardup_pairs_banded(
        load(spark, sf_dir, "embeddings"), threshold=_EMB_BANDED_THRESHOLD
    )


def _q_embedding_sim_histogram(spark, sf_dir):
    """Semantic-dedup tuning card: the pair-similarity distribution
    over the banded near-dup graph in 0.05-wide cosine bands — the
    measurement a threshold choice is made FROM (how much pair mass
    each candidate threshold would drop). Counts exact; band id via
    floor_stable on the round6 cosine; mean round6."""
    from cuda_gis_smoothing_spark.functions.numeric import floor_stable
    from cuda_gis_smoothing_spark.operators.dedup import embedding_neardup_pairs_banded

    pairs = embedding_neardup_pairs_banded(
        load(spark, sf_dir, "embeddings"), threshold=_EMB_BANDED_THRESHOLD
    )
    return pairs.groupBy(
        floor_stable(F.col("cosine") * 20).cast("long").alias("sim_band")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        round6(F.avg("cosine")).alias("mean_cosine"),
    )


def _q_embedding_degree_histogram(spark, sf_dir):
    """Dedup-graph degree distribution: how many near-dup partners
    each vector has under the banded graph, including the 0-degree
    mass (the fraction semantic dedup wouldn't touch) — the third
    marginal beside component sizes and pair-similarity mass."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        embedding_neardup_pairs_banded,
    )

    emb = load(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs_banded(emb, threshold=_EMB_BANDED_THRESHOLD)
    # both directions from ONE pass (the explode-of-structs lesson)
    ends = pairs.select(
        F.explode(F.array(F.col("vec_a"), F.col("vec_b"))).alias("vec_id")
    )
    deg = ends.groupBy("vec_id").agg(F.count(F.lit(1)).alias("_d"))
    return (
        emb.select("vec_id")
        .join(deg, "vec_id", "left")
        .select(F.coalesce(F.col("_d"), F.lit(0)).cast("long").alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    )


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _q_table_profile(spark, sf_dir):
    """Numeric dataset-card profile of lineitem: one aggregate pass +
    stack unpivot vs the oracle's per-column UNION."""
    from cuda_gis_smoothing_spark.operators.analytics import profile_numeric

    return profile_numeric(load(spark, sf_dir, "lineitem"), _PROFILE_COLS)


def _q_doc_logprob(spark, sf_dir):
    """Unigram LM self-scoring (CCNet/Gopher perplexity-filter shape)
    — MLE token frequencies, per-doc mean -log p over occurrences."""
    from cuda_gis_smoothing_spark.functions.text import doc_unigram_logprob

    return doc_unigram_logprob(load(spark, sf_dir, "documents"))


def _q_label_centroid_similarity(spark, sf_dir):
    """Pairwise cosine between per-label embedding centroids — the
    class-separation audit of a labeled embedding table."""
    from cuda_gis_smoothing_spark.operators.similarity import (
        label_centroid_similarity,
    )

    return label_centroid_similarity(load(spark, sf_dir, "embeddings"))


def _q_embedding_outliers(spark, sf_dir):
    """Per-label embedding outliers (k farthest from own centroid by
    cosine) — the mislabeled-example screen; round-FIRST centroid
    layering, sequential-fold cosine, (round6 cosine, vec_id) rank."""
    from cuda_gis_smoothing_spark.operators.similarity import (
        embedding_outliers,
    )

    return embedding_outliers(load(spark, sf_dir, "embeddings"))


def _q_embedding_outliers_maintained(spark, sf_dir):
    """embedding_outliers served from the MAINTAINED labeled-vector
    log (single-batch state == the batch operator; the bm25_search
    precedent — this row gates the incremental path; multi-batch /
    update / tombstone equality in tests/test_streaming_similarity)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.similarity import (
        MaintainedLabeledVectors,
    )

    state = tempfile.mkdtemp(prefix="lblvec_")
    mv = MaintainedLabeledVectors(spark, state)
    mv.process_batch(load(spark, sf_dir, "embeddings"), 0)
    out = mv.outliers()
    # outliers() reads state through an EAGER localCheckpoint — safe to GC
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_doc_entropy(spark, sf_dir):
    """Per-doc unigram Shannon entropy + type-token ratio (lexical-
    diversity quality signals; the self-distribution complement of
    doc_logprob's corpus-LM score)."""
    from cuda_gis_smoothing_spark.functions.text import doc_token_entropy

    return doc_token_entropy(load(spark, sf_dir, "documents"))


def _q_zipf_fit(spark, sf_dir):
    """Corpus Zipf-law OLS fit (ln freq ~ ln rank) over partition-
    parallel quantile-boundary global ranks — the dataset-card corpus-
    health diagnostic."""
    from cuda_gis_smoothing_spark.functions.text import zipf_fit

    return zipf_fit(load(spark, sf_dir, "documents"))


def _q_doc_compression_ratio(spark, sf_dir):
    """Compressibility quality signal (deflate size / raw size) — the
    one deliberate text-side vectorized pandas UDF; ROWS-ONLY gate
    (zlib has no SQL twin), pytest-gated by a zlib differential."""
    from cuda_gis_smoothing_spark.functions.text import doc_compression_ratio

    return doc_compression_ratio(load(spark, sf_dir, "documents"))


def _q_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve (smallest top-frequency vocab per
    occurrence-share target) — composes BOTH partition-parallel
    order-statistics kernels (global_ranks + global_prefix_sums)."""
    from cuda_gis_smoothing_spark.functions.text import vocab_coverage

    return vocab_coverage(load(spark, sf_dir, "documents"))


def _q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event-type
    sequences (empirical funnel discovery); (epoch_us, event_id) total
    order so tied timestamps cannot flake the lag pairing."""
    from cuda_gis_smoothing_spark.operators.events import event_transitions

    return event_transitions(load(spark, sf_dir, "events"))


def _q_event_transitions_maintained(spark, sf_dir):
    """The SAME transition matrix served from maintained state: the
    corpus folds into a fresh single-batch MaintainedTransitions and
    the serve path (shared transition_probabilities kernel) is gated
    against the batch twin's SQL (the source_kl_maintained precedent)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.transitions import (
        MaintainedTransitions,
    )

    state = tempfile.mkdtemp(prefix="trans_state_")
    mt = MaintainedTransitions(spark, state)
    mt.process_batch(load(spark, sf_dir, "events"), 0)
    out = mt.transitions()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_transition_stationary(spark, sf_dir):
    """Stationary distribution of the event-type Markov chain: damped
    fixed-iteration power iteration over the GATED event_transitions
    matrix (round-first layering — both engines iterate on identical
    round6 probabilities); unrolled 5-CTE twin (the cell_pagerank
    precedent)."""
    from cuda_gis_smoothing_spark.operators.events import (
        transition_stationary,
    )

    return transition_stationary(load(spark, sf_dir, "events"))


def _q_transition_stationary_maintained(spark, sf_dir):
    """The SAME stationary distribution served from maintained
    transition state (shared stationary_from_matrix kernel over the
    maintained matrix — the source_kl_maintained precedent; batch twin
    SHARED)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.transitions import (
        MaintainedTransitions,
    )

    state = tempfile.mkdtemp(prefix="statdist_state_")
    mt = MaintainedTransitions(spark, state)
    mt.process_batch(load(spark, sf_dir, "events"), 0)
    out = mt.stationary()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_transition_entropy_rate(spark, sf_dir):
    """Entropy rate of the event-type Markov chain — H = −Σ_i π_i ·
    Σ_j P_ij · ln P_ij (nats): how predictable the next event is from
    the current one, the clickstream-regularity headline. Round-FIRST
    layering twice over: both π and P are the GATED round6 tables, so
    the product/ln terms are identical doubles in both engines (ln is
    the doc_logprob ≤1-ulp class, absorbed — with the #types²-term sum
    association — by the final round6). The matrix is computed ONCE
    (checkpointed, feeding the stationary iteration AND the entropy
    join — the multi-consumer class)."""
    from cuda_gis_smoothing_spark.operators.events import (
        event_transitions,
        stationary_from_matrix,
    )

    tm = (
        event_transitions(load(spark, sf_dir, "events"))
        .where(F.col("from_type").isNotNull() & F.col("to_type").isNotNull())
        .select("from_type", "to_type", "p_transition")
        .localCheckpoint()  # stationary iteration + entropy join
    )
    pi = stationary_from_matrix(tm).localCheckpoint()  # count + join
    ns = pi.agg(F.count(F.lit(1)).cast("long").alias("n_states"))
    ent = (
        tm.join(pi, tm["from_type"] == pi["event_type"])
        .agg(
            (
                -F.sum(
                    F.col("stationary_p")
                    * F.col("p_transition")
                    * F.log(F.col("p_transition"))
                )
            ).alias("_h")
        )
    )
    return ent.crossJoin(F.broadcast(ns)).select(
        "n_states", round6(F.col("_h")).alias("entropy_rate")
    )


def _q_late_shipments(spark, sf_dir):
    """TPC-H Q4-shaped priority audit — the LEFT SEMI (EXISTS) plan
    shape over the order key with the exact-microsecond lateness
    predicate riding the join condition."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        late_shipment_priority,
    )

    return late_shipment_priority(
        load(spark, sf_dir, "orders"), load(spark, sf_dir, "lineitem")
    )


def _q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: PROMO-part revenue share on the exact integer
    cents x percent grid; part is a broadcast dimension hop."""
    from cuda_gis_smoothing_spark.operators.analytics import promo_revenue

    return promo_revenue(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part")
    )


def _q_supplier_balances(spark, sf_dir):
    """Per-nation supplier census with exact-cent balance totals —
    brings the supplier table under the gate wall."""
    from cuda_gis_smoothing_spark.operators.analytics import supplier_balances

    return supplier_balances(
        load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "region"),
    )


def _q_basket_part_pairs(spark, sf_dir):
    """Market-basket lift: bounded per-order self-join (≤ items/order²
    fan-out), integer counts, one division, TakeOrderedAndProject."""
    from cuda_gis_smoothing_spark.operators.analytics import basket_part_pairs

    return basket_part_pairs(load(spark, sf_dir, "lineitem"))


def _q_forecast_revenue_change(spark, sf_dir):
    """TPC-H Q6 shape: the pure predicate-pushdown scan-aggregate —
    all predicates integer/timestamp-exact and pushed to the scan."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        forecast_revenue_change,
    )

    return forecast_revenue_change(load(spark, sf_dir, "lineitem"))


def _q_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape (schema-adapted): OR-of-conjunctions predicate
    over a broadcast dimension join."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        disjunctive_revenue,
    )

    return disjunctive_revenue(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part")
    )


def _q_key_skew_report(spark, sf_dir):
    """Shuffle-key skew diagnostic over events.user_id — the
    measurement step before the salting lever; gini rank sum is
    tie-permutation-invariant so the ranks kernel twins exactly."""
    from cuda_gis_smoothing_spark.operators.analytics import key_skew_report

    return key_skew_report(load(spark, sf_dir, "events"), "user_id")


def _q_dedup_edit_distance(spark, sf_dir):
    """Character-level near-dup pairs: all-band MinHash candidates +
    length prefilter + threshold-banded exact levenshtein verify
    (printable-ASCII contract — byte==char in both engines)."""
    from cuda_gis_smoothing_spark.operators.dedup import edit_distance_pairs

    return edit_distance_pairs(load(spark, sf_dir, "documents"))


def _q_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of the two gated rankers (BM25 + VSM
    cosine) — hybrid retrieval; ranks NULL when a doc is in only one
    list."""
    from cuda_gis_smoothing_spark.operators.retrieval import rrf_fuse_topk

    return rrf_fuse_topk(load(spark, sf_dir, "documents"))


def _q_props_field_stats(spark, sf_dir):
    """Semi-structured projection: per-type integer stats of the JSON
    props field, regex-gated so the extraction cannot diverge
    cross-engine."""
    from cuda_gis_smoothing_spark.operators.events import props_field_stats

    return props_field_stats(load(spark, sf_dir, "events"))


def _q_source_mixture_weights(spark, sf_dir):
    """Uniform-target data-mixing rates per source (capped at 1) —
    integer-exact token masses, single-division shares."""
    from cuda_gis_smoothing_spark.operators.curate import (
        source_mixture_weights,
    )

    return source_mixture_weights(load(spark, sf_dir, "documents"))


def _q_source_mixture_temperature(spark, sf_dir):
    """Temperature-scaled (alpha=0.5) source sampling weights — the
    integerized-sqrt normalization keeps the weights twin-exact."""
    from cuda_gis_smoothing_spark.operators.curate import (
        source_mixture_temperature,
    )

    return source_mixture_temperature(load(spark, sf_dir, "documents"))


def _q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: segment filter pushed into the customer scan,
    two fact equi-joins, exact-cents top-k via TakeOrderedAndProject."""
    from cuda_gis_smoothing_spark.operators.analytics import shipping_priority

    return shipping_priority(
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
    )


def _q_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: returns-exposure ranking — the returnflag
    filter reaches the lineitem scan; customer join runs over the
    aggregated side only."""
    from cuda_gis_smoothing_spark.operators.analytics import returned_revenue

    return returned_revenue(
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
    )


def _q_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: orders-per-customer histogram INCLUDING the
    zero-order bucket (LEFT OUTER join — fuzz-pinned on order-less
    customers)."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        customer_order_distribution,
    )

    return customer_order_distribution(
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    )


def _q_part_quantity_outliers(spark, sf_dir):
    """TPC-H Q17 shape: small-lot revenue audit — decorrelated per-part
    average join with a pure-integer threshold compare."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        part_quantity_outliers,
    )

    return part_quantity_outliers(load(spark, sf_dir, "lineitem"))


def _q_big_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-pruned order-quantity aggregate joined
    to orders; integer-exact ranking."""
    from cuda_gis_smoothing_spark.operators.analytics import big_orders

    return big_orders(
        load(spark, sf_dir, "orders"), load(spark, sf_dir, "lineitem")
    )


def _q_user_rfm(spark, sf_dir):
    """RFM segmentation scored against exact corpus quartiles — every
    compared quantity integer or round6 so the thresholds cannot flip
    cross-engine."""
    from cuda_gis_smoothing_spark.operators.events import user_rfm

    return user_rfm(load(spark, sf_dir, "events"))


def _q_session_event_affinity(spark, sf_dir):
    """Within-session event-type lift (sessions as baskets — the
    basket_part_pairs shape over the shared session boundaries);
    integer counts + one round6 division."""
    from cuda_gis_smoothing_spark.operators.events import (
        session_event_affinity,
    )

    return session_event_affinity(load(spark, sf_dir, "events"))


def _q_session_paths(spark, sf_dir):
    """Top session-opening event-type paths (first 3 events per
    session under sessionize's exact gap boundaries) — the
    entry-funnel report; k-cut total-ordered on (count desc, path)."""
    from cuda_gis_smoothing_spark.operators.events import session_paths

    return session_paths(load(spark, sf_dir, "events"))


def _q_event_autocorrelation(spark, sf_dir):
    """Lag-{1,2,7} Pearson autocorrelation of each type's daily count
    series — calendar-lagged pairs, integer moments, one division."""
    from cuda_gis_smoothing_spark.operators.events import event_autocorrelation

    return event_autocorrelation(load(spark, sf_dir, "events"))


def _q_events_daily_anomaly_robust(spark, sf_dir):
    """Median/MAD daily-volume z-scores — the masking-resistant twin
    of events_daily_anomaly; integer counts, exact percentiles, one
    round6 division."""
    from cuda_gis_smoothing_spark.operators.events import daily_anomaly_robust

    return daily_anomaly_robust(load(spark, sf_dir, "events"))


def _q_event_autocorrelation_maintained(spark, sf_dir):
    """The SAME seasonality card served from a maintained (type, day)
    count log — zero event re-aggregation at read time; single-batch
    instance vs the batch twin's SQL (the source_kl_maintained
    precedent), so CORRECTNESS gates the incremental path."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.daily_counts import (
        MaintainedDailyCounts,
    )

    state = tempfile.mkdtemp(prefix="daily_state_")
    m = MaintainedDailyCounts(spark, state)
    m.process_batch(load(spark, sf_dir, "events"), 0)
    out = m.autocorrelation()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_event_interarrival(spark, sf_dir):
    """Per-type inter-arrival gap stats (count/min/max/mean + exact
    p50/p90 through the shared percentile kernel) — burst/automation
    detection over integer-microsecond gaps."""
    from cuda_gis_smoothing_spark.operators.events import event_interarrival

    return event_interarrival(load(spark, sf_dir, "events"))


_WINNOW_W = 4


def _q_tfidf_topk(spark, sf_dir):
    """Vector-space-model retrieval (lnc.nnn cosine over the shared
    doc_tfidf sparse vectors) — the classical ranking beside BM25."""
    from cuda_gis_smoothing_spark.operators.retrieval import tfidf_topk

    return tfidf_topk(load(spark, sf_dir, "documents"))


def _q_winnowing(spark, sf_dir):
    """Winnowing (MOSS) fingerprint selection: per-window minimum of
    the rolling gram hashes — the guaranteed-recall sub-quadratic
    fingerprint set for span-level near-dup candidates."""
    from cuda_gis_smoothing_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(
        load(spark, sf_dir, "documents"), gram_len=_SPAN_GRAM, window=_WINNOW_W
    )


def _q_winnowing_maintained(spark, sf_dir):
    """The SAME winnowed fingerprint set served from a maintained
    doc-keyed selection log (single-batch fold, the bm25_search
    precedent) — gates the incremental span-level candidate index
    against the batch twin every round."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.winnow import MaintainedWinnow

    state = tempfile.mkdtemp(prefix="winnow_state_")
    mw = MaintainedWinnow(spark, state, gram_len=_SPAN_GRAM, window=_WINNOW_W)
    mw.process_batch(load(spark, sf_dir, "documents"), 0)
    out = mw.fingerprints()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_dedup_winnowed(spark, sf_dir):
    """Near-dup pairs from winnowed-fingerprint candidates + shared
    exact-jaccard verify — the guaranteed-recall (span-level)
    candidate source beside the MinHash/SimHash band families."""
    from cuda_gis_smoothing_spark.operators.dedup import winnowed_neardup_pairs

    return winnowed_neardup_pairs(
        load(spark, sf_dir, "documents"),
        threshold=_JACCARD_THRESHOLD,
        gram_len=_SPAN_GRAM,
        window=_WINNOW_W,
    )


def _q_ndvi_patches(spark, sf_dir):
    """Raster region labeling: connected components of above-mean
    cells over ring-1 contiguity (landscape 'patches'), via the SAME
    star-CC core as the text/embedding dedup clusters; recursive-
    closure twin over the identical marked edge set."""
    return stats_ops.value_patches(grid_from_lineitem(spark, sf_dir))


def _q_cell_quantile_norm(spark, sf_dir):
    """Rank-based (ECDF) normalization of ndvi — quantile-boundary
    global ranks (partition-parallel, no global sort), exact rank/n."""
    return stats_ops.cell_quantile_norm(grid_from_lineitem(spark, sf_dir))


def _q_landscape_summary(spark, sf_dir):
    """Class-level landscape card (patch count, LPI, mean patch size,
    edge density) — integer aggregates of patch_metrics rows + exact
    integer-ratio divisions under round6."""
    return stats_ops.landscape_summary(grid_from_lineitem(spark, sf_dir))


def _q_zonal_quantiles(spark, sf_dir):
    """Per-zone exact percentiles (the ECDF layer over zonal_stats'
    moments): the PIP region tag composed with the shared percentile
    kernel; the NULL zone is kept (the zonal_stats coverage-gap
    contract) — NULL groups appear identically in both engines."""
    from cuda_gis_smoothing_spark import datagen
    from cuda_gis_smoothing_spark.operators.events import (
        PCT_QS,
        percentile_explode,
    )
    from cuda_gis_smoothing_spark.operators.spatial import (
        centroid_sql,
        point_in_polygon,
    )

    _ensure_shipped(spark)
    cells = grid_from_lineitem(spark, sf_dir).select("cell", "ndvi")
    lat, lon = centroid_sql("cell", "spark")
    pts = cells.select(
        "cell", "ndvi", F.expr(lat).alias("lat"), F.expr(lon).alias("lon")
    )
    tagged = point_in_polygon(pts, datagen.gen_boundaries())
    return percentile_explode(
        tagged, "ndvi", PCT_QS, group_cols=("region_id",), out_value="ndvi_q"
    )


def _q_grid_upsample(spark, sf_dir):
    """Overview→detail serve: fine cells joined to their broadcast
    pyramid parents + the round6 residual detail layer."""
    from cuda_gis_smoothing_spark.operators.spatial import grid_upsample

    return grid_upsample(grid_from_lineitem(spark, sf_dir))


def _q_supplier_part_variety(spark, sf_dir):
    """Q16 adapted (lineitem stands in for the absent partsupp):
    distinct-supplier variety per (brand, type, size) with the
    NOT-predicates; broadcast part dimension."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        supplier_part_variety,
    )

    return supplier_part_variety(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part")
    )


def _q_pii_redact(spark, sf_dir):
    """PII redaction transform — three pinned-order global regex
    replaces, pure per-row (streaming-legal)."""
    from cuda_gis_smoothing_spark.operators.curate import pii_redact

    return pii_redact(load(spark, sf_dir, "documents"))


def _q_active_users_weekly(spark, sf_dir):
    """DAU/WAU stickiness per epoch-anchored week — integer distinct
    counts + exact ratios under round6."""
    from cuda_gis_smoothing_spark.operators.events import active_users_weekly

    return active_users_weekly(load(spark, sf_dir, "events"))


def _q_median_filter(spark, sf_dir):
    """Median smoothing over self∪ring-1 windows — the shared exact
    percentile aggregate at q=0.5 under round6."""
    return stats_ops.median_filter(grid_from_lineitem(spark, sf_dir))


def _q_shipping_lag_percentiles(spark, sf_dir):
    """Order-to-ship latency: integer day lags through the shared
    exact percentile kernel, grouped by order priority."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        shipping_lag_percentiles,
    )

    return shipping_lag_percentiles(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    )


def _q_stream_networks_maintained(spark, sf_dir):
    """Drainage networks served from MAINTAINED router state (the
    cost_distance_maintained closure-product contract). Single batch
    == the batch gate exactly (SHARED twin)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.incremental import (
        IncrementalFlowRouter,
    )

    cells = grid_from_lineitem(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="flow_state_")
    rt = IncrementalFlowRouter(spark, state)
    rt.process_partials(
        cells.select(
            "cell", F.col("ndvi").alias("sum_ndvi"), F.lit(1).cast("long").alias("n")
        ),
        0,
    )
    out = rt.stream_networks().localCheckpoint(eager=True)  # state GC'd next
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_split_centroid_drift(spark, sf_dir):
    """Distribution-shift audit across the deterministic holdout cut:
    pairwise split-centroid cosines through the shared centroid
    kernel."""
    from cuda_gis_smoothing_spark.operators.similarity import (
        split_centroid_drift,
    )

    return split_centroid_drift(load(spark, sf_dir, "embeddings"))


def _q_embedding_assortativity(spark, sf_dir):
    """Degree assortativity of the banded near-dup graph — all-integer
    moments over both edge orientations, one final division (NULL on a
    regular graph)."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        embedding_assortativity,
    )

    return embedding_assortativity(
        load(spark, sf_dir, "embeddings"), threshold=_EMB_BANDED_THRESHOLD
    )


def _q_stream_networks(spark, sf_dir):
    """Drainage-network labeling: star CC over the stream-cell
    subgraph (5th CC domain) + per-network source/confluence/outlet
    census — integers/ids only."""
    from cuda_gis_smoothing_spark.operators.hydrology import stream_networks

    return stream_networks(grid_from_lineitem(spark, sf_dir))


def _q_user_event_entropy_maintained(spark, sf_dir):
    """The SAME diversity card served from the maintained
    (user, type) count log through the shared user_entropy_from_counts
    kernel (single batch == the batch operator exactly, shared twin)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.user_stats import (
        MaintainedUserTypes,
    )

    state = tempfile.mkdtemp(prefix="usertypes_state_")
    m = MaintainedUserTypes(spark, state)
    m.process_batch(load(spark, sf_dir, "events"), 0)
    out = m.entropy().localCheckpoint(eager=True)  # state dir GC'd next
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_user_activity_zipf(spark, sf_dir):
    """Power-law fit of per-user event counts through the SHARED zipf
    rank/regression kernel — the user-skew concentration card."""
    from cuda_gis_smoothing_spark.operators.events import user_activity_zipf

    return user_activity_zipf(load(spark, sf_dir, "events"))


def _q_doc_readability(spark, sf_dir):
    """ARI readability card — three integer counts + a literal-folded
    linear combo, zero shuffles (pure per-row expressions)."""
    from cuda_gis_smoothing_spark.functions.text import doc_readability

    return doc_readability(load(spark, sf_dir, "documents"))


def _q_user_event_entropy(spark, sf_dir):
    """Per-user behavioral diversity: Shannon entropy of the user's
    event-type distribution (stable one-pass form, ln under round6) +
    integer totals; NULL user/type rows excluded."""
    from cuda_gis_smoothing_spark.operators.events import user_event_entropy

    return user_event_entropy(load(spark, sf_dir, "events"))


def _q_terrain_openness(spark, sf_dir):
    """Topographic openness in the tangent domain: per-axis horizon
    tangent maxima (association-free MAX over identical rounded
    expressions), 6-axis mean under round6; ring-1-complete cells."""
    return stats_ops.terrain_openness(grid_from_lineitem(spark, sf_dir))


def _q_landform_classes(spark, sf_dir):
    """Two-scale TPI landform classification (Weiss 3x3 sign grid) —
    fine = ring-1 TPI, coarse = geometric ring-2 TPI; fully-interior
    cells only; classes named from the round6'd TPI pair."""
    return stats_ops.landform_classes(grid_from_lineitem(spark, sf_dir))


def _q_patch_metrics(spark, sf_dir):
    """Patch shape metrics (cell count, hex perimeter = 6n − internal
    directed edges, shape index P/(6√n)) over the same above-mean CC
    patches as ndvi_patches — pure integers plus one identical-shape
    scalar tail, twin over the SHARED patch CTE builder."""
    return stats_ops.patch_metrics(grid_from_lineitem(spark, sf_dir))


def _q_correlogram(spark, sf_dir):
    """Spatial correlogram: Moran's I per ring distance (1, 2) — the
    autocorrelation-decay diagnostic; ring 1 reproduces morans_i."""
    return stats_ops.correlogram(grid_from_lineitem(spark, sf_dir), k=2)


def _q_cell_gradient(spark, sf_dir):
    """Central-difference gradient along the two axial hex directions
    (slope/aspect primitive); border cells without both axis neighbors
    excluded by contract."""
    return stats_ops.cell_gradient(grid_from_lineitem(spark, sf_dir))


def _q_hillshade(spark, sf_dir):
    """Lambertian hillshade over the ndvi surface — trig folded into
    Python literal sun components so the data path is exact-rounded
    arithmetic only; border cells excluded (the gradient contract)."""
    return stats_ops.hillshade(grid_from_lineitem(spark, sf_dir))


def _q_flow_direction(spark, sf_dir):
    """D6 steepest-descent routing: each cell's strictly-lowest ring-1
    neighbor (argmin = struct-MIN on exact doubles, integer tie-break);
    sinks flow nowhere. operators/hydrology.py module docstring has the
    twin-exactness argument."""
    from cuda_gis_smoothing_spark.operators.hydrology import flow_direction

    return flow_direction(grid_from_lineitem(spark, sf_dir))


def _q_stream_order(spark, sf_dir):
    """Strahler order of the flow forest (bounded bottom-up rounds,
    integer max-order + ≥2-at-max flag folded into one key — exact
    for tree heights ≤ 8; fixture height is 4, differential-pinned)."""
    from cuda_gis_smoothing_spark.operators.hydrology import stream_order

    return stream_order(grid_from_lineitem(spark, sf_dir))


def _q_fill_sinks(spark, sf_dir):
    """Planchon–Darboux depression filling (bounded-horizon unrolled
    relaxation; the entire data path is min/max selections over exact
    doubles — zero float-association exposure)."""
    from cuda_gis_smoothing_spark.operators.hydrology import fill_sinks

    return fill_sinks(grid_from_lineitem(spark, sf_dir))


def _q_flow_direction_filled(spark, sf_dir):
    """Routing over the FILLED surface — the standard DEM pipeline
    composition (fill then route): depressions drain to their pour
    level first, so only true spill paths remain; cells the fill
    turned flat have no strict descent and stay sinks (flat-direction
    resolution documented out — the plain D8 convention). Twin
    composes the fill CTE chain under the SHARED flow_ctes builder."""
    from cuda_gis_smoothing_spark.operators.hydrology import (
        fill_sinks,
        flow_direction,
    )

    cells = grid_from_lineitem(spark, sf_dir)
    filled = (
        fill_sinks(cells)
        .where(F.col("filled_level").isNotNull())
        .select("cell", F.col("filled_level").alias("ndvi"))
    )
    return flow_direction(filled)


def _q_watershed_basins(spark, sf_dir):
    """Drainage basins = connected components of the undirected flow
    forest (exactly one sink per basin — strict descent is acyclic);
    the shared star-CC core's fourth graph domain."""
    from cuda_gis_smoothing_spark.operators.hydrology import watershed_basins

    return watershed_basins(grid_from_lineitem(spark, sf_dir))


def _q_flow_accumulation(spark, sf_dir):
    """Full upslope-cell counts via O(log L) relation squaring vs the
    twin's recursive closure — integer counts, tie-proof."""
    from cuda_gis_smoothing_spark.operators.hydrology import flow_accumulation

    return flow_accumulation(grid_from_lineitem(spark, sf_dir))


def _q_flow_load(spark, sf_dir):
    """Value-weighted flow accumulation (the sediment-load raster):
    integer micro-unit weights summed over the shared descendant
    closure — exact BIGINT sums, zero float-association exposure,
    one final division under round6."""
    from cuda_gis_smoothing_spark.operators.hydrology import flow_load

    return flow_load(grid_from_lineitem(spark, sf_dir))


def _q_flow_path_length(spark, sf_dir):
    """Per-cell flow-path length (D6 hops to the basin sink) + the
    terminal sink cell — steps = descendant count of the shared
    closure, integers/ids only, tie-proof."""
    from cuda_gis_smoothing_spark.operators.hydrology import flow_path_length

    return flow_path_length(grid_from_lineitem(spark, sf_dir))


def _q_flow_upstream_length(spark, sf_dir):
    """Longest UPSTREAM flow path per cell (hops from the farthest
    headwater draining through it) — from the shared closure via
    steps(ancestor) − steps(cell) (unique downstream paths make hop
    distance a difference of descendant counts); integers only,
    tie-proof."""
    from cuda_gis_smoothing_spark.operators.hydrology import (
        flow_upstream_length,
    )

    return flow_upstream_length(grid_from_lineitem(spark, sf_dir))


def _q_basin_channel_length(spark, sf_dir):
    """Longest source-to-sink flow path per basin — the sink's
    upstream length joined onto the basin partition; integers only."""
    from cuda_gis_smoothing_spark.operators.hydrology import (
        basin_channel_length,
    )

    return basin_channel_length(grid_from_lineitem(spark, sf_dir))


def _q_basin_stats(spark, sf_dir):
    """Zonal statistics over the DERIVED basin partition (count, mean,
    min/max, relief per drainage basin) — zonal_stats with the polygon
    zone replaced by the flow partition; min/max raw doubles,
    mean/relief round6 (the focal_stats contract)."""
    from cuda_gis_smoothing_spark.operators.hydrology import basin_stats

    return basin_stats(grid_from_lineitem(spark, sf_dir))


def _q_twi(spark, sf_dir):
    """Topographic wetness index ln(a / (tanβ + ε)): integer upslope
    count over the unrounded central-difference gradient magnitude —
    ln is the doc_logprob ≤1-ulp class, safe under round6; border
    cells excluded (the cell_gradient contract)."""
    from cuda_gis_smoothing_spark.operators.hydrology import twi

    return twi(grid_from_lineitem(spark, sf_dir))


def _q_flow_direction_maintained(spark, sf_dir):
    """D6 flow routing served from MAINTAINED state (the
    smooth_maintained precedent): the cell table folds into an
    IncrementalFlowRouter as one partials batch — ndvi rides as
    (sum_ndvi, n=1) so state sum/n recovers it exactly — and the fd
    snapshot log serves the result. Single batch == the flow_direction
    gate exactly (SHARED twin); multi-batch/affected-set/crash-replay
    equality lives in tests/test_hydrology.py."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.incremental import (
        IncrementalFlowRouter,
    )

    cells = grid_from_lineitem(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="flow_state_")
    rt = IncrementalFlowRouter(spark, state)
    rt.process_partials(
        cells.select(
            "cell", F.col("ndvi").alias("sum_ndvi"), F.lit(1).cast("long").alias("n")
        ),
        0,
    )
    out = rt.current_flow().localCheckpoint(eager=True)  # state dir GC'd next
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_cost_distance_maintained(spark, sf_dir):
    """Cost-distance served from MAINTAINED cell state (the
    flow_direction_maintained precedent; closure products recompute on
    read): one partials batch folds the grid, the bounded relaxation
    runs over the recovered surface. Single batch == the batch gate
    exactly (SHARED twin)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.incremental import (
        IncrementalFlowRouter,
    )

    cells = grid_from_lineitem(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="flow_state_")
    rt = IncrementalFlowRouter(spark, state)
    rt.process_partials(
        cells.select(
            "cell", F.col("ndvi").alias("sum_ndvi"), F.lit(1).cast("long").alias("n")
        ),
        0,
    )
    out = rt.cost_distance().localCheckpoint(eager=True)  # state dir GC'd next
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_flow_load_maintained(spark, sf_dir):
    """Weighted flow accumulation served from the maintained router
    state (closure recompute-on-read; fd from the maintained flow
    log). Single batch == the batch gate exactly (SHARED twin)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.incremental import (
        IncrementalFlowRouter,
    )

    cells = grid_from_lineitem(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="flow_state_")
    rt = IncrementalFlowRouter(spark, state)
    rt.process_partials(
        cells.select(
            "cell", F.col("ndvi").alias("sum_ndvi"), F.lit(1).cast("long").alias("n")
        ),
        0,
    )
    out = rt.flow_load().localCheckpoint(eager=True)  # state dir GC'd next
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_aspect_sectors(spark, sf_dir):
    """Hex-native aspect classification: sector = canonical ring-1
    index of the steepest-descent neighbor (−1 for sinks) — pure
    integer arithmetic on the tie-proof flow argmin."""
    from cuda_gis_smoothing_spark.operators.hydrology import aspect_sectors

    return aspect_sectors(grid_from_lineitem(spark, sf_dir))


def _q_drainage_density(spark, sf_dir):
    """Stream network + per-basin drainage density: composes flow
    direction, basin labels and the accumulation closure over ONE
    checkpointed fd; integer counts + one exact integer-ratio
    division (round6)."""
    from cuda_gis_smoothing_spark.operators.hydrology import drainage_density

    return drainage_density(grid_from_lineitem(spark, sf_dir))


def _q_events_cusum_maintained(spark, sf_dir):
    """The SAME changepoint curve served from the maintained (type,
    day) count log — zero event re-aggregation at read time;
    single-batch instance vs the batch twin's SQL (the
    event_autocorrelation_maintained precedent)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.daily_counts import (
        MaintainedDailyCounts,
    )

    state = tempfile.mkdtemp(prefix="daily_state_")
    m = MaintainedDailyCounts(spark, state)
    m.process_batch(load(spark, sf_dir, "events"), 0)
    out = m.cusum().localCheckpoint(eager=True)  # state dir GC'd next
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_daily_trend_maintained(spark, sf_dir):
    """Theil–Sen trend served from the maintained (type, day) count
    log (the events_cusum_maintained precedent)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.daily_counts import (
        MaintainedDailyCounts,
    )

    state = tempfile.mkdtemp(prefix="daily_state_")
    m = MaintainedDailyCounts(spark, state)
    m.process_batch(load(spark, sf_dir, "events"), 0)
    out = m.trend().localCheckpoint(eager=True)  # state dir GC'd next
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_quality_mannwhitney(spark, sf_dir):
    """Mann–Whitney U between two sources' quality: integer rank
    machinery (doubled rank-sums + tie cubes), shape-identical float
    tail, NULLIF-guarded where ANSI would raise."""
    from cuda_gis_smoothing_spark.functions.text import quality_mannwhitney

    return quality_mannwhitney(load(spark, sf_dir, "documents"))


def _q_daily_trend(spark, sf_dir):
    """Theil–Sen robust trend per event type: median of pairwise
    integer-ratio slopes over the daily series — the exact percentile
    kernel crosses engines bit-for-bit; pair join bounded by calendar
    span squared, never event rows."""
    from cuda_gis_smoothing_spark.operators.events import daily_trend

    return daily_trend(load(spark, sf_dir, "events"))


def _q_boundary_distance(spark, sf_dir):
    """Distance-to-boundary raster: per cell centroid, min point-to-
    segment distance to any region ring — ONE shared expression text
    evaluated by both engines (the centroid_sql single-text precedent),
    all segment constants Python-folded."""
    from cuda_gis_smoothing_spark import datagen
    from cuda_gis_smoothing_spark.functions.numeric import flit
    from cuda_gis_smoothing_spark.operators import spatial as _sp
    from cuda_gis_smoothing_spark.operators.spatial import (
        boundary_distance_sql,
        centroid_sql,
    )

    cells = grid_from_lineitem(spark, sf_dir).select("cell")
    lat, lon = centroid_sql("cell", "spark")
    pts = cells.select(
        "cell",
        F.expr(f"({lon}) * {flit(_sp._COS0)}").alias("px"),
        F.expr(lat).alias("py"),
    )
    dist = boundary_distance_sql(datagen.gen_boundaries())
    return pts.select("cell", round6(F.expr(dist)).alias("boundary_dist"))


def _q_multitouch_attribution(spark, sf_dir):
    """Linear multi-touch attribution: integer micro-credits split by
    1e6 DIV n (no float credit sums), lookback match via the bucketed
    range-join shape, direct conversions credited in full."""
    from cuda_gis_smoothing_spark.operators.events import multitouch_attribution

    return multitouch_attribution(load(spark, sf_dir, "events"))


def _q_events_cusum(spark, sf_dir):
    """Per-type CUSUM changepoint curve: integer prefix window sums
    (association-proof) + one float mul/sub per row; windows run over
    day cardinality, never event rows."""
    from cuda_gis_smoothing_spark.operators.events import events_cusum

    return events_cusum(load(spark, sf_dir, "events"))


def _q_integrity_report(spark, sf_dir):
    """Warehouse data-quality audit: referential integrity (LEFT ANTI
    == NOT EXISTS on NULL-never-matches), dup PKs, NULL requireds,
    range checks — one integer count per declared constraint."""
    from cuda_gis_smoothing_spark.operators.analytics import integrity_report

    return integrity_report(
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "documents"),
        load(spark, sf_dir, "events"),
    )


def _q_grid_downsample_maintained(spark, sf_dir):
    """Overview level served from MAINTAINED state (the
    smooth_maintained precedent, third instance of the shared
    cell-state pattern): one partials batch folds in, the coarse log
    serves the result. Single batch == grid_downsample exactly
    (SHARED twin); multi-batch/min-max-refresh equality lives in
    tests/test_streaming.py."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.incremental import IncrementalPyramid

    cells = grid_from_lineitem(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="pyr_state_")
    pyr = IncrementalPyramid(spark, state)
    pyr.process_partials(
        cells.select(
            "cell", F.col("ndvi").alias("sum_ndvi"), F.lit(1).cast("long").alias("n")
        ),
        0,
    )
    out = pyr.current_pyramid().localCheckpoint(eager=True)  # state GC'd next
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_terrain_profile(spark, sf_dir):
    """Fused terrain kernel: gradient + curvature + TRI + hillshade +
    flow direction from ONE ring join + ONE conditional aggregate —
    one shuffle instead of five (the smooth_fused_k2 idea applied to
    the derivative family); interior cells only."""
    from cuda_gis_smoothing_spark.operators.stats import terrain_profile

    return terrain_profile(grid_from_lineitem(spark, sf_dir))


def _q_axis_visibility(spark, sf_dir):
    """Line-of-sight visibility count along the 6 hex axes (the
    viewshed primitive): sight-line heights are IDENTICAL expression
    shapes in both engines (correctly-rounded ops only), so the
    blocked compare cannot diverge; holes are opaque by contract."""
    from cuda_gis_smoothing_spark.operators.stats import axis_visibility

    return axis_visibility(grid_from_lineitem(spark, sf_dir))


def _q_cell_curvature(spark, sf_dir):
    """Second differences per axis + hex Laplacian over interior cells
    (all 6 neighbors present) — one ring explode + conditional
    aggregate, not six shifted self-joins."""
    from cuda_gis_smoothing_spark.operators.stats import cell_curvature

    return cell_curvature(grid_from_lineitem(spark, sf_dir))


def _q_terrain_ruggedness(spark, sf_dir):
    """Riley TRI (mean |Δ| to ring-1 neighbors) — isotropic roughness
    beside cell_gradient's oriented slope; isolated cells excluded."""
    from cuda_gis_smoothing_spark.operators.stats import terrain_ruggedness

    return terrain_ruggedness(grid_from_lineitem(spark, sf_dir))


def _q_grid_downsample(spark, sf_dir):
    """Pyramid/overview level on the axial grid: coarse cell = packed
    q/r // 2, one map-side-combinable hash aggregate — the
    overview-building shape at 100 TB."""
    from cuda_gis_smoothing_spark.operators.spatial import grid_downsample

    return grid_downsample(grid_from_lineitem(spark, sf_dir))


def _q_smooth_residual_k2(spark, sf_dir):
    """High-pass detail layer: ndvi − gaussian_k2 smoothed ndvi (the
    complement of the reference's flagship pass — anomaly spikes and
    edges the smoothing removed)."""
    from cuda_gis_smoothing_spark.operators.smoothing import smooth_residual
    from cuda_gis_smoothing_spark.plans.config import SmoothingPlan

    return smooth_residual(
        grid_from_lineitem(spark, sf_dir),
        SmoothingPlan(variant="gaussian_k2", variables=("ndvi",)),
    )


def _q_idw_fill(spark, sf_dir):
    """Inverse-distance gap filling: estimate ndvi for absent cells
    with >= 3 present k-ring neighbors (holes + the just-outside
    border ring) — the interpolation stage that runs BEFORE smoothing."""
    from cuda_gis_smoothing_spark.operators.smoothing import idw_fill

    return idw_fill(grid_from_lineitem(spark, sf_dir))


def _q_smooth_bilateral_k1(spark, sf_dir):
    """Edge-preserving bilateral pass: gaussian_k1 ring weights x a
    Gaussian range kernel on the ndvi gap — neighbors across a value
    discontinuity stop contributing (the denoiser that KEEPS edges)."""
    from cuda_gis_smoothing_spark.operators.smoothing import smooth_bilateral
    from cuda_gis_smoothing_spark.plans.config import SmoothingPlan

    return smooth_bilateral(
        grid_from_lineitem(spark, sf_dir),
        SmoothingPlan(variant="gaussian_k1", variables=("ndvi",)),
    )


def _q_embedding_triangles(spark, sf_dir):
    """Triangle census + global clustering of the banded near-dup
    graph — cliques collapse safely, chains over-merge (the question
    behind canonical selection)."""
    from cuda_gis_smoothing_spark.operators.dedup import embedding_triangles

    return embedding_triangles(
        load(spark, sf_dir, "embeddings"), threshold=_EMB_BANDED_THRESHOLD
    )


def _q_embedding_local_clustering(spark, sf_dir):
    """Per-vector local clustering coefficient over the banded graph —
    clique cores (cc≈1, safe transitive collapse) vs chain bridges
    (cc≈0, over-merge hazard), per member."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        embedding_local_clustering,
    )

    return embedding_local_clustering(
        load(spark, sf_dir, "embeddings"), threshold=_EMB_BANDED_THRESHOLD
    )


def _q_embedding_kcore(spark, sf_dir):
    """2-core of the banded near-dup graph — cycle-corroborated dup
    clusters survive, single-collision chain periphery peels away
    (raises if peeling hasn't stabilized, so green == true k-core)."""
    from cuda_gis_smoothing_spark.operators.dedup import embedding_kcore

    return embedding_kcore(
        load(spark, sf_dir, "embeddings"), threshold=_EMB_BANDED_THRESHOLD
    )


def _q_lang_source_chi2(spark, sf_dir):
    """Pearson χ² independence between lang and source (+ Cramér's V)
    — the dataset-card homogeneity check."""
    from cuda_gis_smoothing_spark.functions.text import lang_source_chi2

    return lang_source_chi2(load(spark, sf_dir, "documents"))


def _q_holdout_logprob(spark, sf_dir):
    """Cross-split LM evaluation: Laplace unigram LM fit on the train
    split scores the val split (the leak-free perplexity filter;
    doc_logprob's held-out counterpart)."""
    from cuda_gis_smoothing_spark.functions.text import holdout_logprob

    return holdout_logprob(load(spark, sf_dir, "documents"))


def _q_region_revenue(spark, sf_dir):
    """TPC-H Q5-shaped star join: broadcast dims, shuffle facts, exact
    fixed-point revenue (association-free integer sums)."""
    from cuda_gis_smoothing_spark.operators.analytics import region_revenue

    return region_revenue(
        load(spark, sf_dir, "region"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
    )


def _q_top_customers(spark, sf_dir):
    """TPC-H Q10-shaped top-k by revenue — TakeOrderedAndProject, no
    global sort."""
    from cuda_gis_smoothing_spark.operators.analytics import top_customers

    return top_customers(
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
    )


def _q_events_pivot(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.events import events_pivot

    return events_pivot(load(spark, sf_dir, "events"))


def _q_user_sliding_avg(spark, sf_dir):
    """ANSI RANGE (time-based) window frame — per-user trailing-hour
    average; ties at an instant share a frame, so the result is
    order-independent and cross-engine exact."""
    from cuda_gis_smoothing_spark.operators.events import user_sliding_avg

    return user_sliding_avg(load(spark, sf_dir, "events"))


def _q_events_cube(spark, sf_dir):
    from cuda_gis_smoothing_spark.operators.events import events_cube

    return events_cube(load(spark, sf_dir, "events"))


def _q_cumulative_users(spark, sf_dir):
    """Cumulative distinct users via first-touch attribution + a
    day-cardinality prefix sum — never a cumulative COUNT(DISTINCT)
    window over event rows."""
    from cuda_gis_smoothing_spark.operators.events import cumulative_users

    return cumulative_users(load(spark, sf_dir, "events"))


def _q_salted_aggregate(spark, sf_dir):
    """The explicit skew lever, oracle-gated: two-stage salted
    aggregation over event_type (a handful of hot keys — every key is
    a skew key) must equal the plain GROUP BY under the round6 policy:
    stage-1 partial counts compose exactly; the double value sums are
    subject to the repo's round6 tolerance (fp addition is
    non-associative across the forced two-stage grouping — see
    plans/partitioning.salted_cell_aggregate)."""
    from cuda_gis_smoothing_spark.plans.partitioning import salted_cell_aggregate

    ev = load(spark, sf_dir, "events")
    out = salted_cell_aggregate(
        ev, "event_type", ["value"], salt_buckets=16, salt_source="user_id"
    )
    return out.select(
        F.col("cell").alias("event_type"),
        round6("avg_value").alias("avg_value"),
        "n_rows",
    )


def _q_dedup_embedding_probed(spark, sf_dir):
    """Multi-probe banded near-dup (probe_bits=1): one join side also
    emits every band value with a single bit flipped, so pairs whose
    best band differs in exactly one sign bit become candidates too —
    the recall dial for sub-sign-stable thresholds, gated against a
    DuckDB twin of the same one-bit-flip key expansion."""
    from cuda_gis_smoothing_spark.operators.dedup import embedding_neardup_pairs_banded

    return embedding_neardup_pairs_banded(
        load(spark, sf_dir, "embeddings"),
        threshold=_EMB_BANDED_THRESHOLD,
        probe_bits=1,
    )


#: gaussian_k2 ring weights x 10^4, exact integers (0.6065 / 0.1353
#: are 4-decimal constants — reference kernel literals)
_SCALED_W_K2 = {0: 10_000, 1: 6_065, 2: 1_353}


def _q_smooth_scatter_k2(spark, sf_dir):
    """The SCATTER physical strategy, value-gated: integer fixed-point
    sums make the reassociated shuffle partials bit-exact against the
    oracle's fold (see smooth_scatter_int)."""
    from cuda_gis_smoothing_spark.operators.smoothing import smooth_scatter_int

    cells = grid_qty_from_lineitem(spark, sf_dir)
    out = smooth_scatter_int(cells, "qty", _SCALED_W_K2, k=2, out_col="smoothed_qty")
    return out.select("cell", round6("smoothed_qty").alias("smoothed_qty"))


def _q_smooth_strict_k2(spark, sf_dir):
    cells = grid_from_lineitem(spark, sf_dir)
    out = smooth(
        cells,
        SmoothingPlan(
            variant="gaussian_k2", variables=("ndvi",), strict_second_order=True
        ),
    )
    return out.select("cell", round6("smoothed_ndvi").alias("smoothed_ndvi"))


def _q_cost_distance(spark, sf_dir):
    """Cost-distance to the stream network: integer min-plus
    Bellman-Ford over ring-1 hex adjacency (seeds = drainage stream
    cells, crossing cost = 1 + floor(ndvi*1000)) — all-integer, so the
    iterative accumulation is tie-proof cross-engine; the twin unrolls
    the same relaxations as chained CTEs (the cell_pagerank
    precedent). Cells beyond the COST_ROUNDS horizon are NULL by
    contract."""
    from cuda_gis_smoothing_spark.operators.hydrology import cost_distance

    return cost_distance(grid_from_lineitem(spark, sf_dir))


def _q_cost_allocation(spark, sf_dir):
    """Cost allocation (Voronoi-under-cost): the claiming seed decoded
    from the SAME combined integer min-plus key as cost_distance —
    cost ties break to the smallest seed id BY the encoding."""
    from cuda_gis_smoothing_spark.operators.hydrology import cost_allocation

    return cost_allocation(grid_from_lineitem(spark, sf_dir))


def _q_basin_relief_ratio(spark, sf_dir):
    """Elevation-relief ratio (== the hypsometric integral estimator)
    per basin: (mean − min)/(max − min) via round-FIRST layering over
    basin_stats' gated columns; flat basins NULL."""
    from cuda_gis_smoothing_spark.operators.hydrology import (
        basin_relief_ratio,
    )

    return basin_relief_ratio(grid_from_lineitem(spark, sf_dir))


def _q_flow_sinuosity(spark, sf_dir):
    """Flow-path sinuosity: committed D6 path steps / straight-line
    axial hex distance to the terminal sink — all-integer until one
    exact division under round6; sinks NULL; sinuosity >= 1 by the
    triangle inequality."""
    from cuda_gis_smoothing_spark.operators.hydrology import flow_sinuosity

    return flow_sinuosity(grid_from_lineitem(spark, sf_dir))


def _q_stream_distance(spark, sf_dir):
    """Flow length to the stream network: per cell, integer D6 hops
    along the committed path to the first stream cell (steps argmax
    over stream descendants); stream cells 0, channel-less paths
    NULL."""
    from cuda_gis_smoothing_spark.operators.hydrology import stream_distance

    return stream_distance(grid_from_lineitem(spark, sf_dir))


def _q_source_heaps(spark, sf_dir):
    """Per-source Heaps'-law fits (the dataset-card view: templated
    sources saturate early): integer partitioned-window cumulatives,
    NULLIF-guarded single-point sources."""
    from cuda_gis_smoothing_spark.functions.text import source_heaps

    return source_heaps(load(spark, sf_dir, "documents"))


def _q_user_burstiness_maintained(spark, sf_dir):
    """The per-user Fano card served from a user-keyed maintained
    daily-count log (MaintainedDailyCounts key generalization);
    single-batch instance == the batch operator, shared twin."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.daily_counts import (
        MaintainedDailyCounts,
    )

    state = tempfile.mkdtemp(prefix="udaily_state_")
    m = MaintainedDailyCounts(spark, state, key="user_id")
    m.process_batch(load(spark, sf_dir, "events"), 0)
    out = m.burstiness()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_heaps_fit_maintained(spark, sf_dir):
    """The SAME vocabulary-growth fit served from maintained per-doc +
    seen-type logs (zero re-tokenization at read time); single-batch
    instance == the batch operator exactly, so the twin is SHARED."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.heaps import MaintainedHeaps

    state = tempfile.mkdtemp(prefix="heaps_state_")
    m = MaintainedHeaps(spark, state)
    m.process_batch(load(spark, sf_dir, "documents"), 0)
    out = m.heaps()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_basin_mainstem(spark, sf_dir):
    """Mainstem raster: cells on a longest source-to-sink path of
    their basin (upstream + downstream hop sum equals the basin max)
    — all integers, tie-proof; flags every tied path."""
    from cuda_gis_smoothing_spark.operators.hydrology import basin_mainstem

    return basin_mainstem(grid_from_lineitem(spark, sf_dir))


def _q_funnel_step_latency(spark, sf_dir):
    """Funnel step-transition latency percentiles in seconds over the
    SHARED earliest-completion chain (integer micros spans / 1e6 into
    the exact percentile kernel)."""
    from cuda_gis_smoothing_spark.operators.events import (
        funnel_step_latency,
    )

    return funnel_step_latency(load(spark, sf_dir, "events"))


def _q_basin_pour_points(spark, sf_dir):
    """Spill saddles between adjacent basins: per border pair, the min
    over border edges of max(value_a, value_b) + representative cells
    — association-free selections, struct-MIN argmin."""
    from cuda_gis_smoothing_spark.operators.hydrology import (
        basin_pour_points,
    )

    return basin_pour_points(grid_from_lineitem(spark, sf_dir))


def _q_session_stats(spark, sf_dir):
    """Session-quality percentile card (duration seconds + events per
    session) over the shared gap-break session boundaries, via the
    exact percentile kernel."""
    from cuda_gis_smoothing_spark.operators.events import session_stats

    return session_stats(load(spark, sf_dir, "events"))


def _q_heaps_fit(spark, sf_dir):
    """Heaps'-law vocabulary-growth fit: OLS ln V ~ ln N over the
    per-doc cumulative curve (integer prefix sums over the doc_id
    total order; ln/OLS tail is the zipf precedent)."""
    from cuda_gis_smoothing_spark.functions.text import heaps_fit

    return heaps_fit(load(spark, sf_dir, "documents"))


def _q_user_burstiness(spark, sf_dir):
    """Per-user Fano-factor dispersion (the bot/regularity screen):
    the shared burstiness kernel keyed by user over (user, day)
    counts — integer moments, one exact division."""
    from cuda_gis_smoothing_spark.operators.events import user_burstiness

    return user_burstiness(load(spark, sf_dir, "events"))


def _q_layout_overlap_report(spark, sf_dir):
    """Zone-map clustering-depth audit per candidate layout (hash /
    cell-range / morton-range): would per-file min/max stats prune a
    cell-range predicate? The measurement step before bucketBy/sort
    layout choices — all-integer, one corpus scan."""
    from cuda_gis_smoothing_spark.operators.stats import (
        layout_overlap_report,
    )

    return layout_overlap_report(grid_from_lineitem(spark, sf_dir))


def _q_cost_next_hop(spark, sf_dir):
    """Least-cost-path backlink raster: per reached cell, the ring-1
    neighbor the minimal-cost path to the stream leaves through
    (struct-MIN argmin over the final combined key — strict descent,
    so chains always terminate at seeds)."""
    from cuda_gis_smoothing_spark.operators.hydrology import cost_next_hop

    return cost_next_hop(grid_from_lineitem(spark, sf_dir))


def _q_flow_path_cost(spark, sf_dir):
    """Integer cost accumulated along each cell's committed D6 flow
    path (sum of crossing weights over its descendants; 0 for sinks) —
    one closure join + one integer SUM, tie-proof."""
    from cuda_gis_smoothing_spark.operators.hydrology import flow_path_cost

    return flow_path_cost(grid_from_lineitem(spark, sf_dir))


def _q_stream_magnitude(spark, sf_dir):
    """Shreve stream magnitude (additive stream order): sources whose
    water passes through each cell, via one closure join against the
    leaf set — integers only."""
    from cuda_gis_smoothing_spark.operators.hydrology import stream_magnitude

    return stream_magnitude(grid_from_lineitem(spark, sf_dir))


def _q_events_seasonality(spark, sf_dir):
    """Day-of-week profile per event type: epoch-anchored integer
    weekday (engine weekday functions disagree on numbering — integer
    day arithmetic doesn't) + exact-integer-ratio shares over the
    #types x 7 aggregate."""
    from cuda_gis_smoothing_spark.operators.events import events_seasonality

    return events_seasonality(load(spark, sf_dir, "events"))


def _q_events_seasonality_maintained(spark, sf_dir):
    """The SAME weekday profile served from the maintained (type, day)
    count log through the shared seasonality_from_daily kernel (the
    events_cusum_maintained precedent)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.daily_counts import (
        MaintainedDailyCounts,
    )

    state = tempfile.mkdtemp(prefix="daily_state_")
    m = MaintainedDailyCounts(spark, state)
    m.process_batch(load(spark, sf_dir, "events"), 0)
    out = m.seasonality().localCheckpoint(eager=True)  # state dir GC'd next
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_events_burstiness(spark, sf_dir):
    """Per-type Fano-factor dispersion card — calendar span zero-fills
    for free (zero days add nothing to the integer moments), one exact
    integer ratio per type under round6."""
    from cuda_gis_smoothing_spark.operators.events import events_burstiness

    return events_burstiness(load(spark, sf_dir, "events"))


def _q_events_burstiness_maintained(spark, sf_dir):
    """The SAME dispersion card served from the maintained (type, day)
    count log through the shared burstiness_from_daily kernel (the
    events_seasonality_maintained precedent)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.daily_counts import (
        MaintainedDailyCounts,
    )

    state = tempfile.mkdtemp(prefix="daily_state_")
    m = MaintainedDailyCounts(spark, state)
    m.process_batch(load(spark, sf_dir, "events"), 0)
    out = m.burstiness().localCheckpoint(eager=True)  # state dir GC'd next
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_basin_hypsometry(spark, sf_dir):
    """Per-basin hypsometric (area-elevation) histogram: integer
    uniform bands over the unit value surface, grouped by the derived
    basin partition — sparse (basin, band, n_cells) rows."""
    from cuda_gis_smoothing_spark.operators.hydrology import basin_hypsometry

    return basin_hypsometry(grid_from_lineitem(spark, sf_dir))



def _q_value_benford(spark, sf_dir):
    """Benford first-digit audit over extended-price cents: per-digit
    observed vs expected shares + chi2 terms (kept per-digit so every
    float is one correctly-rounded expression over exact integers)."""
    from cuda_gis_smoothing_spark.operators.analytics import value_benford

    return value_benford(load(spark, sf_dir, "lineitem"))


def _q_revenue_concentration(spark, sf_dir):
    """Customer revenue-concentration card: gini + top-k whale shares
    of per-customer fixed-point order totals via the descending-rank
    kernel (no global window, no separate row count)."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        revenue_concentration,
    )

    return revenue_concentration(load(spark, sf_dir, "orders"))



def _q_session_bounce(spark, sf_dir):
    """Bounce-rate card per session entry type over the SHARED
    gap-break session boundaries — integer-exact counts, two exact
    integer ratios under round6."""
    from cuda_gis_smoothing_spark.operators.events import session_bounce

    return session_bounce(load(spark, sf_dir, "events"))


def _q_epoch_shuffle(spark, sf_dir):
    """Deterministic per-epoch training permutation + contiguous
    shard layout: portable affine hash ranks via the partition-
    parallel rank kernel over the combined epoch·P + h key."""
    from cuda_gis_smoothing_spark.operators.sampling import epoch_shuffle

    return epoch_shuffle(load(spark, sf_dir, "documents"))


def _q_value_winsorized(spark, sf_dir):
    """Winsorized + trimmed mean card over order totals: exact-cents
    middle sum (integer), percentile fences from the shared kernel,
    fixed-shape float tail — robust revenue average."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        value_winsorized,
    )

    return value_winsorized(load(spark, sf_dir, "orders"))


def _q_join_size_report(spark, sf_dir):
    """Self-join output-size estimator card: exact pair mass vs the
    portable-hash 1/R key-sample estimate per candidate key — the
    measurement before committing to a pair-join shuffle."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        join_size_report,
    )

    return join_size_report(load(spark, sf_dir, "lineitem"))


def _q_heavy_hitters(spark, sf_dir):
    """CMS-prefiltered exact heavy hitters: the sketch probes the raw
    token stream map-side so only candidates reach the exact df
    aggregate; one-sidedness makes the prefilter lossless and the
    exact verify removes every collision — output == plain HAVING."""
    from cuda_gis_smoothing_spark.operators.sketches import heavy_hitters

    return heavy_hitters(load(spark, sf_dir, "documents"))


def _q_source_diversity(spark, sf_dir):
    """Per-source Simpson index + type-token ratio: the repetition-side
    complement of source_kl_divergence's drift card — all-integer
    aggregates (integer-valued-double sums), two exact divisions under
    round6."""
    from cuda_gis_smoothing_spark.functions.text import source_diversity

    return source_diversity(load(spark, sf_dir, "documents"))


def _q_daily_kendall_tau(spark, sf_dir):
    """Kendall τ-b between every event-type pair's daily count series —
    rank statistics over integer counts (the Theil–Sen twin-exactness
    lesson); pairwise work bounded by the calendar, never the corpus."""
    from cuda_gis_smoothing_spark.operators.events import daily_kendall_tau

    return daily_kendall_tau(load(spark, sf_dir, "events"))


def _q_quality_weighted_quantiles(spark, sf_dir):
    """Token-weighted quality quantiles: the smallest quality level
    whose cumulative token weight reaches each probe fraction — integer
    running weights over the bounded round6 level grid."""
    from cuda_gis_smoothing_spark.operators.sampling import (
        quality_weighted_quantiles,
    )

    return quality_weighted_quantiles(load(spark, sf_dir, "documents"))


def _q_candidate_family_report(spark, sf_dir):
    """Candidate-generation accuracy card across the three text
    near-dup families (MinHash-LSH / SimHash bands / winnowing) vs the
    exact prefix-filtered Jaccard pair set — integer pair counts, two
    guarded exact ratios."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        candidate_family_report,
    )

    return candidate_family_report(
        load(spark, sf_dir, "documents"),
        threshold=_JACCARD_THRESHOLD,
        gram_len=_SPAN_GRAM,
        window=_WINNOW_W,
    )


def _q_cohort_revenue(spark, sf_dir):
    """Monthly revenue cohorts over orders: epoch-anchored integer
    month ids (engine month-diff conventions never enter), exact-cents
    revenue — all integers, tie-proof."""
    from cuda_gis_smoothing_spark.operators.analytics import cohort_revenue

    return cohort_revenue(load(spark, sf_dir, "orders"))


def _q_order_gap_days(spark, sf_dir):
    """Inter-order interval percentiles: integer day gaps from LAG
    over the per-customer (date, orderkey) total order through the
    shared percentile kernel."""
    from cuda_gis_smoothing_spark.operators.analytics import order_gap_days

    return order_gap_days(load(spark, sf_dir, "orders"))


def _q_riparian_zones(spark, sf_dir):
    """Riparian gradient: mean value per flow-distance-to-stream band
    (NULL-distance unrouted row kept) — the buffer-zone analysis over
    the shared stream_distance composition."""
    from cuda_gis_smoothing_spark.operators.hydrology import riparian_zones

    return riparian_zones(grid_from_lineitem(spark, sf_dir))


def _q_source_diversity_maintained(spark, sf_dir):
    """The SAME per-source Simpson/TTR card served from the maintained
    (source, token) count log through the shared diversity_from_counts
    kernel (the source_kl_maintained precedent; sentinel key decoded
    back to the batch operator's NULL group)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.source_stats import (
        MaintainedSourceTokens,
    )

    state = tempfile.mkdtemp(prefix="srcdiv_state_")
    mst = MaintainedSourceTokens(spark, state)
    mst.process_batch(load(spark, sf_dir, "documents"), 0)
    out = mst.diversity()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_stream_junctions_maintained(spark, sf_dir):
    """Confluence census served from maintained router state (closure
    recompute-on-read; fd from the maintained flow log). Single batch
    == the batch gate exactly (SHARED twin)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.incremental import (
        IncrementalFlowRouter,
    )

    cells = grid_from_lineitem(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="flow_state_")
    rt = IncrementalFlowRouter(spark, state)
    rt.process_partials(
        cells.select(
            "cell", F.col("ndvi").alias("sum_ndvi"), F.lit(1).cast("long").alias("n")
        ),
        0,
    )
    out = rt.stream_junctions().localCheckpoint(eager=True)  # state GC'd next
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (sole late supplier on multi-supplier orders),
    decorrelated into two order-keyed aggregates; the twin keeps the
    canonical EXISTS + NOT EXISTS correlated form, so the gate proves
    the decorrelation."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        waiting_suppliers,
    )

    return waiting_suppliers(
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "supplier"),
    )


def _q_embedding_component_density(spark, sf_dir):
    """Per-cluster edge density (clique vs chain card) over the banded
    near-dup graph, vs a recursive closure of the SAME banded SQL."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        embedding_component_density,
    )

    return embedding_component_density(
        load(spark, sf_dir, "embeddings"), threshold=_EMB_BANDED_THRESHOLD
    )


_SWEEP_THRESHOLDS = (0.2, 0.3, 0.4)


def _q_dedup_threshold_sweep(spark, sf_dir):
    """Per-cosine-cutoff cluster census over the banded near-dup graph
    — the threshold-tuning decision card; one star-CC per cutoff over
    a once-computed verified pair set."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        dedup_threshold_sweep,
    )

    return dedup_threshold_sweep(
        load(spark, sf_dir, "embeddings"), thresholds=_SWEEP_THRESHOLDS
    )


def _q_nation_profit(spark, sf_dir):
    """TPC-H Q9 adapted (cost = 80% of p_retailprice): per-(nation,
    year) profit over the five-table star; exact 10^4-scaled integer
    sum, one round6 division."""
    from cuda_gis_smoothing_spark.operators.analytics import nation_profit

    return nation_profit(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "part"),
    )


def _q_part_similarity(spark, sf_dir):
    """Item-item CF: per-part top-k co-purchase cosine neighbors over
    the shared basket kernel; rank on the rounded cosine."""
    from cuda_gis_smoothing_spark.operators.analytics import part_similarity

    return part_similarity(load(spark, sf_dir, "lineitem"))


def _q_part_recommendations(spark, sf_dir):
    """Basket completion: per-order top-k candidates by summed integer
    micro-cosines over the item-item neighbor lists (in-basket parts
    anti-joined out)."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        part_recommendations,
    )

    return part_recommendations(load(spark, sf_dir, "lineitem"))


def _q_part_similarity_maintained(spark, sf_dir):
    """Item-item CF served from maintained co-purchase count logs
    (single-batch instance == the batch operator exactly; the
    smooth_maintained precedent)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.copurchase import (
        MaintainedCopurchase,
    )

    state = tempfile.mkdtemp(prefix="copurchase_state_")
    mc = MaintainedCopurchase(spark, state)
    mc.process_batch(load(spark, sf_dir, "lineitem"), 0)
    out = mc.similarity()  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_part_recommendations_maintained(spark, sf_dir):
    """Basket completion served from maintained co-purchase state:
    ingest once, score the same orders as queries == the batch
    composite exactly."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.copurchase import (
        MaintainedCopurchase,
    )

    li = load(spark, sf_dir, "lineitem")
    state = tempfile.mkdtemp(prefix="copurchase_rec_state_")
    mc = MaintainedCopurchase(spark, state)
    mc.process_batch(li, 0)
    out = mc.recommendations(li)  # eager-checkpoint contract: GC now
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_customer_similarity(spark, sf_dir):
    """User-user CF: per-customer top-k neighbors by shared-part
    cosine — the co-membership kernel's second domain (baskets=parts,
    items=customers)."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        customer_similarity,
    )

    return customer_similarity(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    )


def _q_customer_recommendations(spark, sf_dir):
    """Per-customer part recommendations: item-item neighbor lists
    scored over each customer's full purchase history (the canonical
    item2item serving unit)."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        customer_recommendations,
    )

    return customer_recommendations(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    )


def _q_part_pagerank(spark, sf_dir):
    """Catalog centrality: the shared fixed-iteration pagerank core's
    4th domain (co-purchase part graph)."""
    from cuda_gis_smoothing_spark.operators.analytics import part_pagerank

    return part_pagerank(load(spark, sf_dir, "lineitem"))


def _q_source_similarity(spark, sf_dir):
    """Source vocabulary set-cosine — the co-membership kernel's third
    domain (baskets=tokens, items=sources)."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        source_similarity,
    )

    return source_similarity(load(spark, sf_dir, "documents"))


def _q_keyword_textrank(spark, sf_dir):
    """TextRank keywords: the shared fixed-iteration PageRank core
    over the distinct token co-occurrence graph (3rd graph domain);
    round6-rank total-order top-k."""
    from cuda_gis_smoothing_spark.functions.text import keyword_textrank

    return keyword_textrank(
        load(spark, sf_dir, "documents"), window=_COOC_WINDOW
    )


def _q_customer_rfm(spark, sf_dir):
    """Warehouse RFM segmentation over orders — the user_rfm house
    pattern (all-integer axes, quartiles from the exact percentile
    kernel over the SAME values)."""
    from cuda_gis_smoothing_spark.operators.analytics import customer_rfm

    return customer_rfm(load(spark, sf_dir, "orders"))


def _q_source_token_gini(spark, sf_dir):
    """Per-source document-length inequality (gini over doc token
    counts, descending-rank integer formula) — the length-mass skew
    card beside source_diversity's vocabulary card."""
    from cuda_gis_smoothing_spark.functions.text import source_token_gini

    return source_token_gini(load(spark, sf_dir, "documents"))


def _q_embedding_pagerank(spark, sf_dir):
    """PageRank centrality over the banded embedding near-dup graph —
    the shared fixed-iteration pagerank_rounds core (7th graph domain
    for a shared kernel family); hub vectors = dense near-dup
    neighborhoods, the curation-priority signal."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        embedding_neardup_pairs_banded,
    )
    from cuda_gis_smoothing_spark.operators.stats import pagerank_rounds

    emb = load(spark, sf_dir, "embeddings")
    pairs = (
        embedding_neardup_pairs_banded(emb, threshold=_EMB_BANDED_THRESHOLD)
        .select("vec_a", "vec_b")
        .localCheckpoint()  # both edge orientations consume it
    )
    edges = pairs.select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("vec_b").alias("src"), F.col("vec_a").alias("dst"))
    )
    return pagerank_rounds(
        emb.select("vec_id"), edges, id_col="vec_id"
    )


def _q_event_type_lift(spark, sf_dir):
    """Market-basket lift between event-type pairs over user baskets —
    the basket_part_pairs contract on the events table: exact integer
    counts, one double division under round6, alphabet-bounded
    fan-out."""
    from cuda_gis_smoothing_spark.operators.events import event_type_lift

    return event_type_lift(load(spark, sf_dir, "events"))


def _q_daily_runs_test(spark, sf_dir):
    """Wald–Wolfowitz runs test per event type's daily series: exact
    median exclusion, integer run/sign counts over the day total
    order, fixed-shape guarded float tail."""
    from cuda_gis_smoothing_spark.operators.events import daily_runs_test

    return daily_runs_test(load(spark, sf_dir, "events"))


def _maintained_daily(spark, sf_dir):
    """Single-batch MaintainedDailyCounts state, served eagerly so the
    temp state dir can be GC'd (the events_seasonality_maintained
    pattern)."""
    import tempfile

    from cuda_gis_smoothing_spark.streaming.daily_counts import (
        MaintainedDailyCounts,
    )

    state = tempfile.mkdtemp(prefix="daily_state_")
    m = MaintainedDailyCounts(spark, state)
    m.process_batch(load(spark, sf_dir, "events"), 0)
    return m, state


def _q_daily_kendall_tau_maintained(spark, sf_dir):
    """The SAME τ-b card served from the maintained (type, day) count
    log through the shared kendall_from_daily kernel."""
    import shutil

    m, state = _maintained_daily(spark, sf_dir)
    out = m.kendall_tau().localCheckpoint(eager=True)
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_daily_runs_test_maintained(spark, sf_dir):
    """The SAME runs-test card served from the maintained (type, day)
    count log through the shared runs_from_daily kernel."""
    import shutil

    m, state = _maintained_daily(spark, sf_dir)
    out = m.runs_test().localCheckpoint(eager=True)
    shutil.rmtree(state, ignore_errors=True)
    return out


def _q_event_type_lift_maintained(spark, sf_dir):
    """The SAME basket-lift card served from the maintained
    (user, type) count log through the shared lift_from_user_types
    kernel (the user_event_entropy_maintained pattern)."""
    import shutil
    import tempfile

    from cuda_gis_smoothing_spark.streaming.user_stats import (
        MaintainedUserTypes,
    )

    state = tempfile.mkdtemp(prefix="usertype_state_")
    m = MaintainedUserTypes(spark, state)
    m.process_batch(load(spark, sf_dir, "events"), 0)
    out = m.type_lift().localCheckpoint(eager=True)
    shutil.rmtree(state, ignore_errors=True)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Dict ORDER matters: the driver gates only the FIRST 50 entries, so
    # never-driver-checked gates (all r4 additions + the r3 overflow) and any
    # new round's gates go at the FRONT (VERDICT r4 item 1).  The r1-r3 gates
    # that already have driver CORRECTNESS rows sit at the back; the in-repo
    # sf0.01 replica (tests/test_entry_parity.py) still covers all of them.
    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "funnel_conversion": _q_funnel,
        "cohort_retention": _q_cohort_retention,
        "events_rollup": _q_events_rollup,
        "user_moving_avg": _q_user_moving_avg,
        "value_percentiles": _q_value_percentiles,
        "dedup_embedding": _q_dedup_embedding,
        "dedup_embedding_banded": _q_dedup_embedding_banded,
        "dedup_embedding_probed": _q_dedup_embedding_probed,
        "salted_aggregate": _q_salted_aggregate,
        "cumulative_users": _q_cumulative_users,
        "user_sliding_avg": _q_user_sliding_avg,
        "events_cube": _q_events_cube,
        "region_revenue": _q_region_revenue,
        "top_customers": _q_top_customers,
        "doc_logprob": _q_doc_logprob,
        "dedup_canonicals": _q_dedup_canonicals,
        "table_profile": _q_table_profile,
        "events_pivot": _q_events_pivot,
        "tile_pyramid": _q_tile_pyramid,
        "pip_regions": _q_pip_regions,
        "knn_cells": _q_knn_cells,
        "dedup_normalized": _q_dedup_normalized,
        "dedup_containment": _q_dedup_containment,
        "cross_source_dups": _q_cross_source_dups,
        "decontaminated_corpus": _q_decontaminated_corpus,
        "vocab_df_idf": _q_vocab_df_idf,
        "sequence_packing": _q_sequence_packing,
        "packing_manifest": _q_packing_manifest,
        "curate_packed": _q_curate_packed,
        "events_daily_anomaly": _q_events_daily_anomaly,
        "hotspot_cells": _q_hotspot_cells,
        "source_quota": _q_source_quota,
        "embedding_components": _q_embedding_components,
        "morans_i": _q_morans_i,
        "doc_tfidf": _q_doc_tfidf,
        "feature_hashing": _q_feature_hashing,
        "knn_graph": _q_knn_graph,
        "source_dedup_stats": _q_source_dedup_stats,
        "quality_deciles": _q_quality_deciles,
        "cell_edges": _q_cell_edges,
        # --- new in r5 (keep inside the driver's 50-entry window) ---------
        "knn_graph_ivf": _q_knn_graph_ivf,
        "doc_tfidf_maintained": _q_doc_tfidf_maintained,
        "knn_ivf_maintained": _q_knn_ivf_maintained,
        "geary_c": _q_geary_c,
        "semivariogram": _q_semivariogram,
        "bigram_pmi": _q_bigram_pmi,
        "ivf_bucket_stats": _q_ivf_bucket_stats,
        "local_morans_i": _q_local_morans_i,
        "dataset_split": _q_dataset_split,
        "embedding_norms": _q_embedding_norms,
        "dedup_containment_banded": _q_dedup_containment_banded,
        "bigram_pmi_maintained": _q_bigram_pmi_maintained,
        # rows-only BY DESIGN (trained centroids are not SQL-expressible;
        # recall is pytest-gated — see the gate docstring)
        "knn_graph_ivf_trained": _q_knn_graph_ivf_trained,
        "join_counts": _q_join_counts,
        "doc_bigram_logprob": _q_doc_bigram_logprob,
        "source_kl_divergence": _q_source_kl_divergence,
        "cooccurrence_window": _q_cooccurrence_window,
        "pq_codes": _q_pq_codes,
        "pq_search": _q_pq_search,
        "pq_codes_maintained": _q_pq_codes_maintained,
        "ivfpq_search": _q_ivfpq_search,
        "cell_pagerank": _q_cell_pagerank,
        "kmv_distinct_users": _q_kmv_distinct_users,
        "sq_codes": _q_sq_codes,
        "sq_search": _q_sq_search,
        # rows-only BY DESIGN (trained sub-codebooks are not
        # SQL-expressible; recall is pytest-gated — see the docstring)
        "pq_search_trained": _q_pq_search_trained,
        "morans_i_bivariate": _q_morans_i_bivariate,
        "ivfpq_search_maintained": _q_ivfpq_search_maintained,
        "source_overlap_kmv": _q_source_overlap_kmv,
        "value_quantiles_sketch": _q_value_quantiles_sketch,
        "source_kl_maintained": _q_source_kl_maintained,
        "kmv_distinct_maintained": _q_kmv_distinct_maintained,
        "source_overlap_kmv_maintained": _q_source_overlap_kmv_maintained,
        "semivariogram_directional": _q_semivariogram_directional,
        "value_quantiles_maintained": _q_value_quantiles_maintained,
        "holdout_logprob": _q_holdout_logprob,
        "lang_source_chi2": _q_lang_source_chi2,
        "label_centroid_similarity": _q_label_centroid_similarity,
        "value_outliers": _q_value_outliers,
        "embedding_triangles": _q_embedding_triangles,
        "smooth_residual_k2": _q_smooth_residual_k2,
        "cell_gradient": _q_cell_gradient,
        "doc_entropy": _q_doc_entropy,
        "zipf_fit": _q_zipf_fit,
        "vocab_coverage": _q_vocab_coverage,
        "doc_compression_ratio": _q_doc_compression_ratio,
        "event_transitions": _q_event_transitions,
        "event_transitions_maintained": _q_event_transitions_maintained,
        "event_interarrival": _q_event_interarrival,
        "session_paths": _q_session_paths,
        "user_rfm": _q_user_rfm,
        "late_shipments": _q_late_shipments,
        "promo_revenue": _q_promo_revenue,
        "supplier_balances": _q_supplier_balances,
        "shipping_priority": _q_shipping_priority,
        "returned_revenue": _q_returned_revenue,
        "customer_order_distribution": _q_customer_order_distribution,
        "part_quantity_outliers": _q_part_quantity_outliers,
        "big_orders": _q_big_orders,
        "rrf_fusion": _q_rrf_fusion,
        "props_field_stats": _q_props_field_stats,
        "source_mixture_weights": _q_source_mixture_weights,
        "dedup_edit_distance": _q_dedup_edit_distance,
        "key_skew_report": _q_key_skew_report,
        "forecast_revenue_change": _q_forecast_revenue_change,
        "disjunctive_revenue": _q_disjunctive_revenue,
        "basket_part_pairs": _q_basket_part_pairs,
        "tfidf_topk": _q_tfidf_topk,
        "winnowing_fingerprints": _q_winnowing,
        "winnowing_maintained": _q_winnowing_maintained,
        "dedup_winnowed": _q_dedup_winnowed,
        "ndvi_patches": _q_ndvi_patches,
        "correlogram": _q_correlogram,
        "cell_quantile_norm": _q_cell_quantile_norm,
        # --- driver-checked in r4 (CORRECTNESS_r04 green) -----------------
        "smooth_simple_k1": _rounded_smooth("simple_k1", ("ndvi",)),
        "smooth_gaussian_k1": _rounded_smooth("gaussian_k1", ("ndvi",)),
        "smooth_gaussian_k2": _rounded_smooth("gaussian_k2", ("ndvi",)),
        "smooth_uniform_k2": _rounded_smooth("uniform_k2", ("ndvi",)),
        "smooth_fused_k2": _rounded_smooth("gaussian_k2", ALL_VARIABLES),
        "neighbor_stats": _q_neighbor_stats,
        "edge_count": _q_edge_count,
        "derived_variables": _q_derived_variables,
        "ring2_cardinality": _q_ring2_cardinality,
        "locality_metric": _q_locality,
        "quadrant_histogram": _q_quadrants,
        "tile_assignment": _q_tiles,
        "events_hourly": _q_events_hourly,
        "doc_quality": _q_doc_quality,
        "doc_language_id": _q_language_id,
        "dedup_exact": _q_dedup_exact,
        "dedup_tokenset": _q_dedup_tokenset,
        "doc_fingerprint": _q_doc_fingerprint,
        "minhash_signatures": _q_minhash,
        "minhash_lsh": _q_minhash_lsh,
        "simhash": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "simhash_pairs_banded": _q_simhash_pairs_banded,
        "dedup_components": _q_dedup_components,
        "curate_corpus": _q_curate_corpus,
        "vocab_top_tokens": _q_vocab_top_tokens,
        "doc_length_histogram": _q_doc_length_histogram,
        "contamination_report": _q_contamination,
        "source_stats": _q_source_stats,
        "doc_repetition": _q_doc_repetition,
        "source_overlap": _q_source_overlap,
        "source_overlap_minhash": _q_source_overlap_minhash,
        "language_confusion": _q_language_confusion,
        "bm25_topk": _q_bm25_topk,
        "duplicate_spans": _q_duplicate_spans,
        "span_coverage": _q_span_coverage,
        "quality_weighted_sample": _q_quality_weighted_sample,
        "bm25_search": _q_bm25_search,
        "curate_corpus_strict": _q_curate_corpus_strict,
        "stratified_sample": _q_stratified_sample,
        "ngram_jaccard": _q_jaccard,
        "knn_cosine": _q_knn_cosine,
        "knn_lsh": _q_knn_lsh,
        "knn_ivf": _q_knn_ivf,
        "smooth_strict_k2": _q_smooth_strict_k2,
        "smooth_scatter_k2": _q_smooth_scatter_k2,
        "sessionize": _q_sessionize,
        "asof_attribution": _q_asof_attribution,
        "range_join_followups": _q_range_join,
        "top_event_types": _q_top_event_types,
        # --- round-5 close additions (rotate into the window in r6) ------
        "dedup_lines": _q_dedup_lines,
        "dedup_lines_maintained": _q_dedup_lines_maintained,
        "boilerplate_lines": _q_boilerplate_lines,
        "boilerplate_maintained": _q_boilerplate_maintained,
        "blocking_suppliers": _q_blocking_suppliers,
        "idle_customers": _q_idle_customers,
        "nation_market_share": _q_nation_market_share,
        "pricing_summary": _q_pricing_summary,
        "volume_shipping": _q_volume_shipping,
        "top_supplier": _q_top_supplier,
        "smooth_maintained": _q_smooth_maintained,
        "dedup_component_sizes": _q_dedup_component_sizes,
        "dedup_components_maintained": _q_dedup_components_maintained,
        "majority_filter": _q_majority_filter,
        "focal_stats": _q_focal_stats,
        "zonal_stats": _q_zonal_stats,
        "embedding_sim_histogram": _q_embedding_sim_histogram,
        "smooth_bilateral_k1": _q_smooth_bilateral_k1,
        "event_autocorrelation": _q_event_autocorrelation,
        "local_supplier_volume": _q_local_supplier_volume,
        "idw_fill": _q_idw_fill,
        "event_autocorrelation_maintained": _q_event_autocorrelation_maintained,
        "embedding_degree_histogram": _q_embedding_degree_histogram,
        "events_daily_anomaly_robust": _q_events_daily_anomaly_robust,
        "source_mixture_temperature": _q_source_mixture_temperature,
        "quality_calibration": _q_quality_calibration,
        "vocab_cms_estimates": _q_vocab_cms_estimates,
        "vocab_cms_maintained": _q_vocab_cms_maintained,
        "hillshade": _q_hillshade,
        "flow_direction": _q_flow_direction,
        "watershed_basins": _q_watershed_basins,
        "flow_accumulation": _q_flow_accumulation,
        "flow_path_length": _q_flow_path_length,
        "basin_stats": _q_basin_stats,
        "twi": _q_twi,
        "flow_direction_maintained": _q_flow_direction_maintained,
        "aspect_sectors": _q_aspect_sectors,
        "drainage_density": _q_drainage_density,
        "terrain_ruggedness": _q_terrain_ruggedness,
        "grid_downsample": _q_grid_downsample,
        "cell_curvature": _q_cell_curvature,
        "axis_visibility": _q_axis_visibility,
        "terrain_profile": _q_terrain_profile,
        "grid_downsample_maintained": _q_grid_downsample_maintained,
        "integrity_report": _q_integrity_report,
        "events_cusum": _q_events_cusum,
        "multitouch_attribution": _q_multitouch_attribution,
        "boundary_distance": _q_boundary_distance,
        "daily_trend": _q_daily_trend,
        "quality_mannwhitney": _q_quality_mannwhitney,
        "events_cusum_maintained": _q_events_cusum_maintained,
        "daily_trend_maintained": _q_daily_trend_maintained,
        # appended AT THE END (never mid-dict): inserting before
        # position 50 displaces driver-window gates (review catch)
        "decontaminated_bloom": _q_decontaminated_bloom,
        "doc_skyline": _q_doc_skyline,
        "cost_distance": _q_cost_distance,
        "cost_allocation": _q_cost_allocation,
        "flow_path_cost": _q_flow_path_cost,
        "stream_magnitude": _q_stream_magnitude,
        "basin_hypsometry": _q_basin_hypsometry,
        "events_seasonality": _q_events_seasonality,
        "events_seasonality_maintained": _q_events_seasonality_maintained,
        "knn_mutual_pairs": _q_knn_mutual_pairs,
        "cost_distance_maintained": _q_cost_distance_maintained,
        "knn_label_vote": _q_knn_label_vote,
        "split_leakage_check": _q_split_leakage_check,
        "label_confusion": _q_label_confusion,
        "ivf_silhouette": _q_ivf_silhouette,
        "doc_keywords": _q_doc_keywords,
        "basin_adjacency": _q_basin_adjacency,
        "pq_recall_report": _q_pq_recall_report,
        "ivf_recall_report": _q_ivf_recall_report,
        "graph_recall_report": _q_graph_recall_report,
        "kmv_error_report": _q_kmv_error_report,
        "cms_error_report": _q_cms_error_report,
        "banded_pair_recall": _q_banded_pair_recall,
        "minhash_error_report": _q_minhash_error_report,
        "local_extrema": _q_local_extrema,
        "zipf_fit_maintained": _q_zipf_fit_maintained,
        "pii_scan_report": _q_pii_scan_report,
        "transition_stationary": _q_transition_stationary,
        "transition_stationary_maintained": _q_transition_stationary_maintained,
        "zonal_majority": _q_zonal_majority,
        "transition_entropy_rate": _q_transition_entropy_rate,
        "events_burstiness": _q_events_burstiness,
        "events_burstiness_maintained": _q_events_burstiness_maintained,
        "fill_sinks": _q_fill_sinks,
        "flow_direction_filled": _q_flow_direction_filled,
        "doc_novelty": _q_doc_novelty,
        "stream_order": _q_stream_order,
        "flow_upstream_length": _q_flow_upstream_length,
        "patch_metrics": _q_patch_metrics,
        "session_event_affinity": _q_session_event_affinity,
        "zonal_crosstab": _q_zonal_crosstab,
        "embedding_outliers": _q_embedding_outliers,
        "landscape_summary": _q_landscape_summary,
        "basin_channel_length": _q_basin_channel_length,
        "embedding_outliers_maintained": _q_embedding_outliers_maintained,
        "landform_classes": _q_landform_classes,
        "terrain_openness": _q_terrain_openness,
        "user_event_entropy": _q_user_event_entropy,
        "user_activity_zipf": _q_user_activity_zipf,
        "doc_readability": _q_doc_readability,
        "user_event_entropy_maintained": _q_user_event_entropy_maintained,
        "stream_networks": _q_stream_networks,
        "embedding_assortativity": _q_embedding_assortativity,
        "split_centroid_drift": _q_split_centroid_drift,
        "stream_networks_maintained": _q_stream_networks_maintained,
        "shipping_lag_percentiles": _q_shipping_lag_percentiles,
        "median_filter": _q_median_filter,
        "pii_redact": _q_pii_redact,
        "active_users_weekly": _q_active_users_weekly,
        "supplier_part_variety": _q_supplier_part_variety,
        "grid_upsample": _q_grid_upsample,
        "zonal_quantiles": _q_zonal_quantiles,
        "embedding_local_clustering": _q_embedding_local_clustering,
        "embedding_kcore": _q_embedding_kcore,
        "cost_next_hop": _q_cost_next_hop,
        "basin_relief_ratio": _q_basin_relief_ratio,
        "layout_overlap_report": _q_layout_overlap_report,
        "flow_sinuosity": _q_flow_sinuosity,
        "user_burstiness": _q_user_burstiness,
        "stream_distance": _q_stream_distance,
        "heaps_fit": _q_heaps_fit,
        "basin_pour_points": _q_basin_pour_points,
        "session_stats": _q_session_stats,
        "basin_mainstem": _q_basin_mainstem,
        "funnel_step_latency": _q_funnel_step_latency,
        "heaps_fit_maintained": _q_heaps_fit_maintained,
        "user_burstiness_maintained": _q_user_burstiness_maintained,
        "source_heaps": _q_source_heaps,
        "value_benford": _q_value_benford,
        "revenue_concentration": _q_revenue_concentration,
        "join_size_report": _q_join_size_report,
        "heavy_hitters": _q_heavy_hitters,
        "flow_load": _q_flow_load,
        "value_winsorized": _q_value_winsorized,
        "epoch_shuffle": _q_epoch_shuffle,
        "flow_load_maintained": _q_flow_load_maintained,
        "session_bounce": _q_session_bounce,
        "source_diversity": _q_source_diversity,
        "daily_kendall_tau": _q_daily_kendall_tau,
        "quality_weighted_quantiles": _q_quality_weighted_quantiles,
        "event_type_lift": _q_event_type_lift,
        "daily_runs_test": _q_daily_runs_test,
        "zonal_diversity": _q_zonal_diversity,
        "daily_kendall_tau_maintained": _q_daily_kendall_tau_maintained,
        "daily_runs_test_maintained": _q_daily_runs_test_maintained,
        "event_type_lift_maintained": _q_event_type_lift_maintained,
        "candidate_family_report": _q_candidate_family_report,
        "zonal_stats_maintained": _q_zonal_stats_maintained,
        "stream_junctions": _q_stream_junctions,
        "embedding_pagerank": _q_embedding_pagerank,
        "customer_rfm": _q_customer_rfm,
        "source_token_gini": _q_source_token_gini,
        "cohort_revenue": _q_cohort_revenue,
        "order_gap_days": _q_order_gap_days,
        "riparian_zones": _q_riparian_zones,
        "source_diversity_maintained": _q_source_diversity_maintained,
        "stream_junctions_maintained": _q_stream_junctions_maintained,
        "waiting_suppliers": _q_waiting_suppliers,
        "embedding_component_density": _q_embedding_component_density,
        "dedup_threshold_sweep": _q_dedup_threshold_sweep,
        "keyword_textrank": _q_keyword_textrank,
        "nation_profit": _q_nation_profit,
        "cooccurrence_window_maintained": _q_cooccurrence_window_maintained,
        "keyword_textrank_maintained": _q_keyword_textrank_maintained,
        "part_similarity": _q_part_similarity,
        "part_recommendations": _q_part_recommendations,
        "part_similarity_maintained": _q_part_similarity_maintained,
        "part_recommendations_maintained": _q_part_recommendations_maintained,
        "customer_similarity": _q_customer_similarity,
        "source_similarity": _q_source_similarity,
        "part_pagerank": _q_part_pagerank,
        "customer_recommendations": _q_customer_recommendations,
    }
    return qs


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------
def _vals(deltas: list[int]) -> str:
    return ", ".join(f"({d})" for d in deltas)


def _stopword_pat(lang: str) -> str:
    return "\\b(" + "|".join(STOPWORDS[lang]) + ")\\b"


def _dedup_sql(key_expr: str) -> str:
    return f"""
SELECT doc_id,
       COUNT(*) OVER (PARTITION BY {key_expr}) AS dup_group_size,
       MIN(doc_id) OVER (PARTITION BY {key_expr}) AS canonical_id,
       CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY {key_expr}) AS INT) AS is_duplicate
FROM documents
""".strip()


def _pq_ctes() -> str:
    """Shared CTE prefix for the PQ twins: seeded codebook, per-
    subspace candidates, argmin codes — mirroring
    operators/quantization.py term by term (the cc − 2·cv argmin
    score; every dot a sequential list_dot_product fold, so the
    doubles match Spark's aggregate(zip_with(...)) bit-for-bit)."""
    m, ksub = _PQ_M, _PQ_KSUB
    dsub = f"(len(emb) // {m})"
    vdsub = f"(len(v.emb) // {m})"
    return f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
seed AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, emb
  FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT {ksub})
),
sub AS (
  SELECT cid, u.s AS s,
         emb[(u.s * {dsub} + 1):((u.s + 1) * {dsub})] AS sub
  FROM seed, UNNEST(generate_series(0, {m - 1})) AS u(s)
),
cand AS (
  SELECT v.vec_id, sb.s, sb.cid,
         list_dot_product(sb.sub, sb.sub)
         - 2.0e0 * list_dot_product(sb.sub,
             v.emb[(sb.s * {vdsub} + 1):((sb.s + 1) * {vdsub})]) AS score
  FROM e v CROSS JOIN sub sb
),
codes AS (
  SELECT vec_id, s, cid FROM (
    SELECT vec_id, s, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY score, cid) AS rk
    FROM cand
  ) WHERE rk = 1
)""".strip()


def _pq_codes_sql() -> str:
    return f"""
WITH {_pq_ctes()}
SELECT vec_id, CAST(s AS INT) AS subspace, CAST(cid AS INT) AS code
FROM codes
""".strip()


def _pq_search_sql() -> str:
    return f"""
WITH {_pq_ctes()},
recon AS (
  SELECT c.vec_id, flatten(list(sb.sub ORDER BY c.s)) AS recon
  FROM codes c JOIN sub sb ON sb.s = c.s AND sb.cid = c.cid
  GROUP BY c.vec_id
),
rr AS (SELECT vec_id, recon, list_dot_product(recon, recon) AS rr FROM recon),
q AS (
  SELECT vec_id AS query_id, emb, list_dot_product(emb, emb) AS qq
  FROM e WHERE vec_id < {_KNN_QUERIES}
),
p AS (
  SELECT q.query_id, r.vec_id AS neighbor_id,
         q.qq + r.rr - 2.0e0 * list_dot_product(q.emb, r.recon) AS d
  FROM q JOIN rr r ON r.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, ROUND(d + 1e-09, 6) AS adc_dist,
       CAST(rank AS INT) AS rank
FROM (
  SELECT query_id, neighbor_id, d,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
  FROM p
)
WHERE rank <= 5
""".strip()


def _ivfpq_sql() -> str:
    """IVF-PQ twin: knn_ivf's seeded cosine assignment CTEs (verbatim
    convention — ranked cross join, ties to the lowest cid) feeding
    pq_search's ADC over reconstructions."""
    return f"""
WITH {_pq_ctes()},
recon AS (
  SELECT c.vec_id, flatten(list(sb.sub ORDER BY c.s)) AS recon
  FROM codes c JOIN sub sb ON sb.s = c.s AND sb.cid = c.cid
  GROUP BY c.vec_id
),
rr AS (SELECT vec_id, recon, list_dot_product(recon, recon) AS rr FROM recon),
n AS (SELECT vec_id, emb, SQRT(list_dot_product(emb, emb)) AS nrm FROM e),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS ccid,
         emb AS cemb, SQRT(list_dot_product(emb, emb)) AS cnrm
  FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 8)
),
assign AS (
  SELECT n.vec_id, c.ccid,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY list_dot_product(n.emb, c.cemb) / (n.nrm * c.cnrm) DESC, c.ccid
         ) AS rk
  FROM n CROSS JOIN cent c
),
bucket AS (SELECT vec_id, ccid AS bucket FROM assign WHERE rk = 1),
probe AS (
  SELECT vec_id, ccid AS bucket FROM assign WHERE rk <= 2 AND vec_id < {_KNN_QUERIES}
),
q AS (
  SELECT vec_id AS query_id, emb, list_dot_product(emb, emb) AS qq
  FROM e WHERE vec_id < {_KNN_QUERIES}
),
p AS (
  SELECT pr.vec_id AS query_id, b.vec_id AS neighbor_id,
         q.qq + r.rr - 2.0e0 * list_dot_product(q.emb, r.recon) AS d
  FROM probe pr
  JOIN bucket b ON b.bucket = pr.bucket AND b.vec_id <> pr.vec_id
  JOIN q ON q.query_id = pr.vec_id
  JOIN rr r ON r.vec_id = b.vec_id
)
SELECT query_id, neighbor_id, ROUND(d + 1e-09, 6) AS adc_dist,
       CAST(rank AS INT) AS rank
FROM (
  SELECT query_id, neighbor_id, d,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
  FROM p
)
WHERE rank <= 5
""".strip()


_SQ_LEVELS = 256


def _sq_ctes() -> str:
    """Shared CTE prefix for the scalar-quantization twins: per-dim
    posexplode, min/max calibration (association-order-free — exact
    cross-engine with no fold gymnastics), floor_stable bucket codes
    mirroring operators/quantization.py::sq_encode term by term."""
    lv = f"{float(_SQ_LEVELS)!r}e0"
    return f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
vals AS (
  SELECT vec_id, u.i - 1 AS dim, emb[u.i] AS x
  FROM e, UNNEST(generate_series(1, len(emb))) AS u(i)
),
stats AS (SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM vals GROUP BY dim),
sq AS (
  SELECT v.vec_id, v.dim,
         CASE WHEN s.hi = s.lo THEN 0
              ELSE LEAST({_SQ_LEVELS - 1},
                         FLOOR(((v.x - s.lo) / (s.hi - s.lo) * {lv}) + 1e-09))
         END AS code
  FROM vals v JOIN stats s ON s.dim = v.dim
)""".strip()


def _sq_codes_sql() -> str:
    return f"""
WITH {_sq_ctes()}
SELECT vec_id, CAST(dim AS INT) AS dim, CAST(code AS INT) AS code FROM sq
""".strip()


def _sq_search_sql() -> str:
    lv = f"{float(_SQ_LEVELS)!r}e0"
    return f"""
WITH {_sq_ctes()},
recon AS (
  SELECT c.vec_id,
         list(CASE WHEN s.hi = s.lo THEN s.lo
                   ELSE s.lo + (c.code + 0.5e0) * (s.hi - s.lo) / {lv}
              END ORDER BY c.dim) AS recon
  FROM sq c JOIN stats s ON s.dim = c.dim
  GROUP BY c.vec_id
),
rr AS (SELECT vec_id, recon, list_dot_product(recon, recon) AS rr FROM recon),
q AS (
  SELECT vec_id AS query_id, emb, list_dot_product(emb, emb) AS qq
  FROM e WHERE vec_id < {_KNN_QUERIES}
),
p AS (
  SELECT q.query_id, r.vec_id AS neighbor_id,
         q.qq + r.rr - 2.0e0 * list_dot_product(q.emb, r.recon) AS d
  FROM q JOIN rr r ON r.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, ROUND(d + 1e-09, 6) AS adc_dist,
       CAST(rank AS INT) AS rank
FROM (
  SELECT query_id, neighbor_id, d,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
  FROM p
)
WHERE rank <= 5
""".strip()


def _pagerank_chain_sql(
    node_cte: str, node_col: str, damping: float = 0.85, iters: int = 5
) -> str:
    """The unrolled pr0..prN CTE chain over caller-provided ``edges``
    / ``deg`` / ``nn`` CTEs — ONE builder shared by every PageRank
    twin (cells, banded embedding graph) so the rounds cannot drift.
    Teleport/damping literals are flit() of the SAME Python doubles
    the Spark kernel uses (1.0 − 0.85 computed in Python ONCE so both
    engines fold the identical non-representable constant)."""
    from cuda_gis_smoothing_spark.functions.numeric import flit

    d, omd = flit(damping), flit(1.0 - damping)
    ctes = [
        f"pr0 AS (SELECT {node_col}, {flit(1.0)} / nn.n AS pr"
        f" FROM {node_cte} CROSS JOIN nn)"
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""pr{t} AS (
  SELECT m.{node_col}, {omd} / nn.n + {d} * COALESCE(inb.s, {flit(0.0)}) AS pr
  FROM {node_cte} m CROSS JOIN nn
  LEFT JOIN (
    SELECT ed.dst AS dst, SUM(p.pr / deg.deg) AS s
    FROM edges ed JOIN pr{t - 1} p ON p.{node_col} = ed.src JOIN deg ON deg.src = ed.src
    GROUP BY ed.dst
  ) inb ON inb.dst = m.{node_col}
)"""
        )
    return ",\n".join(ctes)


def _window_pairs_ctes(window: int) -> str:
    """toks + pr CTE text — the ONE windowed position-pair derivation
    (twin of functions/text.py::window_pairs) shared by the
    cooccurrence_window and keyword_textrank twins."""
    return f"""toks AS (SELECT string_split(lower(text), ' ') AS ts FROM documents),
pr AS (
  SELECT ts[i] AS t1, ts[j] AS t2
  FROM toks,
       UNNEST(CASE WHEN len(ts) >= 2
              THEN generate_series(1, len(ts) - 1) ELSE [] END) AS u(i),
       UNNEST(generate_series(i + 1, least(i + {int(window)}, len(ts)))) AS v(j)
  WHERE ts[i] <> '' AND ts[j] <> ''
)""".strip()


def _pagerank_sql(damping: float = 0.85, iters: int = 5) -> str:
    """Unrolled fixed-iteration PageRank twin of
    operators/stats.py::cell_pagerank (rounds via the shared
    _pagerank_chain_sql builder)."""
    chain = _pagerank_chain_sql("cells4", "cell", damping, iters)
    return f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES {_vals(_R1)}),
edges AS (
  SELECT c.cell AS src, n.cell AS dst
  FROM cells4 c CROSS JOIN offsets o JOIN cells4 n ON n.cell = c.cell + o.delta
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM cells4),
{chain}
SELECT cell, ROUND(pr + 1e-09, 6) AS pagerank FROM pr{iters}
""".strip()


def _embedding_pagerank_sql(damping: float = 0.85, iters: int = 5) -> str:
    """PageRank over the banded embedding near-dup graph — the SAME
    unrolled chain (shared builder) over the banded pairs twin, both
    edge orientations; isolated vectors hold the teleport term."""
    chain = _pagerank_chain_sql("nodes", "vec_id", damping, iters)
    return f"""
WITH pairs AS ({_emb_banded_sql()}),
edges AS (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION ALL
  SELECT vec_b AS src, vec_a AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT vec_id FROM embeddings),
nn AS (SELECT COUNT(*) AS n FROM nodes),
{chain}
SELECT vec_id, ROUND(pr + 1e-09, 6) AS pagerank FROM pr{iters}
""".strip()


def _part_pagerank_sql(damping: float = 0.85, iters: int = 5) -> str:
    """PageRank over the co-purchase part graph — the SAME unrolled
    chain builder (4th domain) over the SAME basket CTEs the
    similarity twins use; isolated parts hold the teleport term."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        BASKET_MIN_SUPPORT,
        _basket_ctes,
    )

    chain = _pagerank_chain_sql("nodes", "l_partkey", damping, iters)
    return f"""
WITH {_basket_ctes(BASKET_MIN_SUPPORT)},
edges AS (
  SELECT part_a AS src, part_b AS dst FROM pairs
  UNION ALL
  SELECT part_b AS src, part_a AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT l_partkey FROM op),
nn AS (SELECT COUNT(*) AS n FROM nodes),
{chain}
SELECT l_partkey, ROUND(pr + 1e-09, 6) AS pagerank FROM pr{iters}
""".strip()


def oracle_sql() -> dict[str, str]:
    tx, ty = tile_sql("cell", _ZOOM, "duckdb")
    tok_cte = """
tok AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS t
    FROM documents
  ) WHERE t <> ''
)""".strip()
    tok_lang_cte = """
tok AS (
  SELECT DISTINCT doc_id, lang, t FROM (
    SELECT doc_id, lang, unnest(list_distinct(string_split(lower(text), ' '))) AS t
    FROM documents
  ) WHERE t <> ''
)""".strip()
    th = token_hash_sql_duckdb("t")
    mh_aggs = ",\n       ".join(
        f"MIN((h * {MH_A[i]} + {MH_B[i]}) % {MH_PRIME}) AS mh_{i}" for i in range(6)
    )
    # LSH banding twin of operators/dedup.py::minhash_lsh_pairs
    # (n_hashes=6, bands=3): the shared builder — one banding definition
    from cuda_gis_smoothing_spark.operators.dedup import band_union_sql

    band_union = band_union_sql("sig")
    langs = sorted(STOPWORDS)
    hits_cols = ",\n       ".join(
        f"LEN(regexp_extract_all(lower(text), '{_stopword_pat(lg)}')) AS hits_{lg}"
        for lg in langs
    )
    gmax = "GREATEST(" + ", ".join(f"hits_{lg}" for lg in langs) + ")"
    lang_case = (
        f"CASE WHEN {gmax} = 0 THEN 'und' "
        + " ".join(f"WHEN hits_{lg} = {gmax} THEN '{lg}'" for lg in langs[:-1])
        + f" ELSE '{langs[-1]}' END"
    )

    out = {
        "smooth_simple_k1": smoothing_sql(
            "simple_k1", ["ndvi"], "duckdb", source="cells4", with_ctes=GRID_CELLS_SQL
        ),
        "smooth_gaussian_k1": smoothing_sql(
            "gaussian_k1", ["ndvi"], "duckdb", source="cells4", with_ctes=GRID_CELLS_SQL
        ),
        "smooth_gaussian_k2": smoothing_sql(
            "gaussian_k2", ["ndvi"], "duckdb", source="cells4", with_ctes=GRID_CELLS_SQL
        ),
        "smooth_uniform_k2": smoothing_sql(
            "uniform_k2", ["ndvi"], "duckdb", source="cells4", with_ctes=GRID_CELLS_SQL
        ),
        "smooth_fused_k2": smoothing_sql(
            "gaussian_k2", list(ALL_VARIABLES), "duckdb", source="cells4", with_ctes=GRID_CELLS_SQL
        ),
        "neighbor_stats": f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES {_vals(_R1)}),
cnt AS (
  SELECT c.cell, COUNT(n.cell) AS n_neighbors
  FROM cells4 c CROSS JOIN offsets o
  LEFT JOIN cells4 n ON n.cell = c.cell + o.delta
  GROUP BY c.cell
)
SELECT MIN(n_neighbors) AS min_neighbors,
       MAX(n_neighbors) AS max_neighbors,
       ROUND(AVG(n_neighbors) + 1e-09, 6) AS avg_neighbors,
       CAST(SUM(n_neighbors) AS BIGINT) AS total_edges
FROM cnt
""".strip(),
        "edge_count": f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES {_vals(_R1)})
SELECT COUNT(*) AS total_edges
FROM cells4 c CROSS JOIN offsets o
JOIN cells4 n ON n.cell = c.cell + o.delta
""".strip(),
        # majority filter: the window's ORDER BY (n DESC, cls ASC) is a
        # TOTAL order per cell ((cell, cls) rows are distinct) and only
        # a filter consumes it — safe per the cross-engine window rule
        "majority_filter": f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES (0), {_vals(_R1)}),
cls AS (SELECT cell, CAST(FLOOR(ndvi * 8 + 1e-09) AS BIGINT) AS cls FROM cells4),
cnt AS (
  SELECT c.cell, n.cls, COUNT(*) AS n
  FROM cls c CROSS JOIN offsets o
  JOIN cls n ON n.cell = c.cell + o.delta
  GROUP BY 1, 2
)
SELECT cell, cls AS mode_class, CAST(n AS BIGINT) AS mode_count,
       CAST(t AS BIGINT) AS n_local
FROM (
  SELECT cell, cls, n, SUM(n) OVER (PARTITION BY cell) AS t,
         ROW_NUMBER() OVER (PARTITION BY cell ORDER BY n DESC, cls ASC) AS rk
  FROM cnt
)
WHERE rk = 1
""".strip(),
        # focal stats: min/max are association-order-free (raw doubles
        # cross the gate); mean/range round6
        "focal_stats": f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES (0), {_vals(_R1)})
SELECT c.cell,
       CAST(COUNT(*) AS BIGINT) AS n_local,
       ROUND(AVG(n.ndvi) + 1e-09, 6) AS focal_mean,
       MIN(n.ndvi) AS focal_min,
       MAX(n.ndvi) AS focal_max,
       ROUND(MAX(n.ndvi) - MIN(n.ndvi) + 1e-09, 6) AS focal_range
FROM cells4 c CROSS JOIN offsets o
JOIN cells4 n ON n.cell = c.cell + o.delta
GROUP BY c.cell
""".strip(),
        "derived_variables": f"""
WITH {GRID_CELLS_SQL}
SELECT cell, ROUND(ndvi + 1e-09, 6) AS ndvi, ROUND(mndwi + 1e-09, 6) AS mndwi,
       ROUND(evi + 1e-09, 6) AS evi, ROUND(ndwi + 1e-09, 6) AS ndwi
FROM cells4
""".strip(),
        "ring2_cardinality": f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES {_vals(_R2)})
SELECT c.cell AS cell, COUNT(n.cell) AS n_ring2
FROM cells4 c CROSS JOIN offsets o
LEFT JOIN cells4 n ON n.cell = c.cell + o.delta
GROUP BY c.cell
""".strip(),
        "locality_metric": f"""
WITH {GRID_CELLS_SQL},
z AS (
  SELECT cell, {morton_sql("cell", "duckdb")} AS zkey,
         ROW_NUMBER() OVER (ORDER BY cell) AS idx
  FROM cells4
),
l AS (SELECT idx, LAG(idx) OVER (ORDER BY zkey, cell) AS pidx FROM z)
SELECT ROUND(AVG(ABS(idx - pidx)) + 1e-09, 6) AS avg_index_distance
FROM l WHERE pidx IS NOT NULL
""".strip(),
        "quadrant_histogram": f"""
WITH {GRID_CELLS_SQL},
qr AS (SELECT (cell // {ENC} - {OFFSET}) AS q, (cell % {ENC} - {OFFSET}) AS r FROM cells4),
m AS (SELECT AVG(q) AS mq, AVG(r) AS mr FROM qr)
SELECT CAST(q >= mq AS INT) AS q_hi, CAST(r >= mr AS INT) AS r_hi,
       COUNT(*) AS n_cells
FROM qr, m
GROUP BY 1, 2
""".strip(),
        "tile_assignment": f"""
WITH {GRID_CELLS_SQL}
SELECT cell, {tx} AS tile_x, {ty} AS tile_y, {_ZOOM} AS zoom
FROM cells4
""".strip(),
        "events_hourly": """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(AVG(value) + 1e-09, 6) AS avg_value
FROM events
GROUP BY 1, 2
""".strip(),
        "doc_quality": f"""
WITH base AS (
  SELECT doc_id,
         LENGTH(text) AS n_chars,
         LEN(string_split(text, ' ')) AS n_tokens,
         LEN(regexp_extract_all(text, '{BPE_REGEX}')) AS n_bpe_tokens,
         ROUND(LENGTH(regexp_replace(text, ' ', '', 'g')) * 1.0
               / LEN(string_split(text, ' ')) + 1e-09, 6) AS avg_token_len,
         ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0
               / LENGTH(text) + 1e-09, 6) AS punct_ratio,
         ROUND(LEN(regexp_extract_all(lower(text), '{_stopword_pat("en")}')) * 1.0
               / LEN(string_split(text, ' ')) + 1e-09, 6) AS stopword_ratio
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_bpe_tokens, avg_token_len, punct_ratio, stopword_ratio,
       ROUND(LEAST(n_tokens / 64.0, 1.0) * 0.5
             + (1.0 - LEAST(punct_ratio * 4.0, 1.0)) * 0.25
             + LEAST(stopword_ratio * 4.0, 1.0) * 0.25 + 1e-09, 6) AS quality_score
FROM base
""".strip(),
        "doc_language_id": f"""
WITH h AS (
  SELECT doc_id,
       {hits_cols}
  FROM documents
)
SELECT doc_id, {", ".join(f"hits_{lg}" for lg in langs)},
       CASE WHEN {" AND ".join(f"hits_{lg} IS NULL" for lg in langs)}
            THEN 'und' ELSE {lang_case} END AS pred_lang
FROM h
""".strip(),
        "dedup_exact": _dedup_sql("md5(text)"),
        "dedup_tokenset": _dedup_sql(
            "md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))"
        ),
        "doc_fingerprint": f"""
SELECT doc_id,
       CASE WHEN text IS NULL THEN NULL ELSE
         list_reduce(list_prepend(CAST(7 AS BIGINT),
           list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
           (acc, c) -> (acc * 131 + c) % {MH_PRIME})
       END AS fingerprint
FROM documents
""".strip(),
        "minhash_signatures": f"""
WITH {tok_cte},
h AS (SELECT doc_id, {th} AS h FROM tok)
SELECT doc_id,
       {mh_aggs}
FROM h
GROUP BY doc_id
""".strip(),
        "minhash_lsh": f"""
WITH {tok_cte},
h AS (SELECT doc_id, {th} AS h FROM tok),
sig AS (SELECT doc_id, {mh_aggs} FROM h GROUP BY doc_id),
banded AS (
  {band_union}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
FROM banded a
JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
GROUP BY 1, 2
""".strip(),
        "simhash": f"""
WITH {tok_cte},
h AS (SELECT doc_id, {th} AS h FROM tok),
bits AS (
  SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS s
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
FROM bits
GROUP BY doc_id
""".strip(),
        "simhash_pairs": f"""
WITH {tok_cte},
h AS (SELECT doc_id, {th} AS h FROM tok),
bits AS (
  SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS s
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b)
  GROUP BY doc_id, b
),
sh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits
  GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""".strip(),
        "ngram_jaccard": f"""
WITH {tok_lang_cte},
sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM tok a JOIN tok b ON a.t = b.t AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(i * 1.0 / (sa.n + sb.n - i) + 1e-09, 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE ROUND(i * 1.0 / (sa.n + sb.n - i) + 1e-09, 6) >= {_JACCARD_THRESHOLD}
""".strip(),
        "knn_cosine": f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (SELECT vec_id, emb, SQRT(list_dot_product(emb, emb)) AS nrm FROM e),
p AS (
  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
         list_dot_product(q.emb, x.emb) / (q.nrm * x.nrm) AS sim
  FROM n q JOIN n x ON x.vec_id <> q.vec_id
  WHERE q.vec_id < {_KNN_QUERIES}
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM p
)
WHERE rank <= 5
""".strip(),
        "knn_lsh": _knn_lsh_sql(),
        "knn_ivf": f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (SELECT vec_id, emb, SQRT(list_dot_product(emb, emb)) AS nrm FROM e),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
         emb AS cemb, SQRT(list_dot_product(emb, emb)) AS cnrm
  FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 8)
),
assign AS (
  SELECT n.vec_id, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY list_dot_product(n.emb, c.cemb) / (n.nrm * c.cnrm) DESC, c.cid
         ) AS rk
  FROM n CROSS JOIN cent c
),
bucket AS (SELECT vec_id, cid AS bucket FROM assign WHERE rk = 1),
probe AS (
  SELECT vec_id, cid AS bucket FROM assign WHERE rk <= 2 AND vec_id < {_KNN_QUERIES}
),
p AS (
  SELECT pr.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_dot_product(q.emb, x.emb) / (q.nrm * x.nrm) AS sim
  FROM probe pr
  JOIN bucket b ON b.bucket = pr.bucket AND b.vec_id <> pr.vec_id
  JOIN n q ON q.vec_id = pr.vec_id
  JOIN n x ON x.vec_id = b.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM p
)
WHERE rank <= 5
""".strip(),
        "smooth_strict_k2": _smooth_strict_sql(),
        "smooth_scatter_k2": _smooth_scatter_sql(),
        "sessionize": _sessionize_sql(),
        "asof_attribution": _asof_sql(),
        "range_join_followups": _range_join_sql(),
        "top_event_types": _top_event_types_sql(),
        "funnel_conversion": _funnel_sql_oracle(),
        "cohort_retention": _cohort_sql_oracle(),
        "events_rollup": _rollup_sql_oracle(),
        "cumulative_users": _cumulative_users_sql_oracle(),
        "user_sliding_avg": _sliding_avg_sql_oracle(),
        "events_cube": _cube_sql_oracle(),
        "region_revenue": _region_revenue_sql_oracle(),
        "top_customers": _top_customers_sql_oracle(),
        "doc_logprob": _doc_logprob_sql_oracle(),
        "table_profile": _table_profile_sql_oracle(),
        "events_pivot": _pivot_sql_oracle(),
        "user_moving_avg": _moving_avg_sql_oracle(),
        "value_percentiles": _percentiles_sql_oracle(),
        "tile_pyramid": _tile_pyramid_sql(),
        "pip_regions": _pip_sql(),
        "zonal_stats": _zonal_sql(),
        "knn_cells": _knn_cells_sql(),
        "dedup_embedding": f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (SELECT vec_id, emb, SQRT(list_dot_product(emb, emb)) AS nrm FROM e)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) + 1e-09, 6) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) + 1e-09, 6) >= 0.4
""".strip(),
        "dedup_embedding_banded": _emb_banded_sql(),
        # similarity-band histogram over the SAME banded pair SQL
        "embedding_sim_histogram": f"""
WITH pairs AS (
{_emb_banded_sql()}
)
SELECT CAST(FLOOR(cosine * 20 + 1e-09) AS BIGINT) AS sim_band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(cosine) + 1e-09, 6) AS mean_cosine
FROM pairs
GROUP BY 1
""".strip(),
        "dedup_embedding_probed": _emb_banded_sql(probe_bits=1),
        "salted_aggregate": """
SELECT event_type,
       ROUND(SUM(value) / COUNT(*) + 1e-09, 6) AS avg_value,
       COUNT(*) AS n_rows
FROM events
GROUP BY event_type
""".strip(),
        "vocab_top_tokens": f"""
WITH {tok_cte},
counts AS (SELECT t, COUNT(*) AS df FROM tok GROUP BY t)
SELECT t AS token, df, CAST(rank AS INT) AS rank FROM (
  SELECT t, df, ROW_NUMBER() OVER (ORDER BY df DESC, t ASC) AS rank FROM counts
)
WHERE rank <= {_TOP_TOKENS_K}
""".strip(),
        "doc_length_histogram": f"""
SELECT CAST((n_chars // {_LEN_BUCKET}) * {_LEN_BUCKET} AS BIGINT) AS len_bucket,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_chars) + 1e-09, 6) AS avg_chars
FROM documents
GROUP BY 1
""".strip(),
        "contamination_report": f"""
WITH sh AS (
  SELECT doc_id, source,
         unnest(list_transform(
           generate_series(1, greatest(len(string_split(lower(text), ' ')) - {_CONTAM_K - 1}, 0)),
           i -> array_to_string((string_split(lower(text), ' '))[i:i+{_CONTAM_K - 1}], ' '))) AS shingle
  FROM documents
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE source = '{_CONTAM_BENCH}'),
train AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE source <> '{_CONTAM_BENCH}')
SELECT t.doc_id, COUNT(*) AS n_contaminated_shingles
FROM train t JOIN bench b USING (shingle)
GROUP BY t.doc_id
""".strip(),
    }
    out["source_stats"] = f"""
WITH q AS ({out["doc_quality"]}),
l AS ({out["doc_language_id"]})
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(q.n_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(q.quality_score) + 1e-09, 6) AS avg_quality,
       CAST(SUM(CASE WHEN l.pred_lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_english
FROM documents d JOIN q USING (doc_id) JOIN l USING (doc_id)
GROUP BY d.source
""".strip()
    # the banded pair join must return EXACTLY the quadratic verifier's
    # rows (pigeonhole guarantee) — sharing the oracle proves it
    out["simhash_pairs_banded"] = out["simhash_pairs"]
    # composed curation pipeline: one twin for the whole chain
    from cuda_gis_smoothing_spark.functions.numeric import flit
    from cuda_gis_smoothing_spark.operators.curate import (
        CURATE_LANG,
        CURATE_MIN_QUALITY,
        CURATE_NEARDUP_J,
        CURATE_SAMPLE_F,
    )
    from cuda_gis_smoothing_spark.operators.sampling import _DENOM, sample_hash_sql

    band_union2 = band_union_sql("sig2")
    out["curate_corpus"] = f"""
WITH q AS ({out["doc_quality"]}),
l AS ({out["doc_language_id"]}),
base AS (
  SELECT d.doc_id, d.text, q.n_tokens, q.quality_score
  FROM documents d JOIN q USING (doc_id) JOIN l USING (doc_id)
  WHERE l.pred_lang = '{CURATE_LANG}' AND q.quality_score >= {flit(CURATE_MIN_QUALITY)}
),
canon AS (SELECT MIN(doc_id) AS doc_id FROM base GROUP BY md5(text)),
kept2 AS (SELECT b.* FROM base b JOIN canon USING (doc_id)),
tok2 AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS t
    FROM kept2
  ) WHERE t <> ''
),
h2 AS (SELECT doc_id, {th} AS h FROM tok2),
sig2 AS (SELECT doc_id, {mh_aggs} FROM h2 GROUP BY doc_id),
banded2 AS (
  {band_union2}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded2 a JOIN banded2 b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM tok2 GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN tok2 a ON a.doc_id = c.doc_a
  JOIN tok2 b ON b.doc_id = c.doc_b AND b.t = a.t
  GROUP BY 1, 2
),
dropd AS (
  SELECT DISTINCT doc_b AS doc_id FROM inter
  JOIN sz sa ON sa.doc_id = doc_a
  JOIN sz sb ON sb.doc_id = doc_b
  WHERE ROUND(i * 1.0 / (sa.n + sb.n - i) + 1e-09, 6) >= {flit(CURATE_NEARDUP_J)}
)
SELECT doc_id, n_tokens, quality_score
FROM kept2
WHERE doc_id NOT IN (SELECT doc_id FROM dropd)
  AND {sample_hash_sql("doc_id")} < {int(CURATE_SAMPLE_F * _DENOM)}
""".strip()
    from cuda_gis_smoothing_spark.operators.sampling import (
        SPLIT_TRAIN_LT as _SLTR,
        SPLIT_VAL_LT as _SLVL,
    )

    # cross-split leakage: the minhash_lsh candidate definition + the
    # shared split-hash cut + the one verify formula
    _shsd = sample_hash_sql("doc_id")
    out["split_leakage_check"] = f"""
WITH {tok_cte},
h AS (SELECT doc_id, {th} AS h FROM tok),
sig AS (SELECT doc_id, {mh_aggs} FROM h GROUP BY doc_id),
banded AS (
  {band_union}
),
sp AS (
  SELECT doc_id,
         CASE WHEN {_shsd} < {_SLTR} THEN 'train'
              WHEN {_shsd} < {_SLVL} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
xb AS (
  SELECT c.doc_a, c.doc_b, sa.split AS split_a, sb.split AS split_b
  FROM cand c JOIN sp sa ON sa.doc_id = c.doc_a JOIN sp sb ON sb.doc_id = c.doc_b
  WHERE sa.split <> sb.split
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT x.doc_a, x.doc_b, COUNT(*) AS i
  FROM xb x
  JOIN tok a ON a.doc_id = x.doc_a
  JOIN tok b ON b.doc_id = x.doc_b AND b.t = a.t
  GROUP BY 1, 2
)
SELECT x.doc_a, x.doc_b, x.split_a, x.split_b,
       ROUND(i2.i * 1.0 / (sa.n + sb.n - i2.i) + 1e-09, 6) AS jaccard
FROM inter i2
JOIN xb x ON x.doc_a = i2.doc_a AND x.doc_b = i2.doc_b
JOIN sz sa ON sa.doc_id = i2.doc_a
JOIN sz sb ON sb.doc_id = i2.doc_b
WHERE ROUND(i2.i * 1.0 / (sa.n + sb.n - i2.i) + 1e-09, 6) >= {flit(CURATE_NEARDUP_J)}
""".strip()
    from cuda_gis_smoothing_spark.operators.sampling import stratified_sample_sql

    out["stratified_sample"] = stratified_sample_sql(
        _SAMPLE_FRACTIONS, default_fraction=0.05
    )
    # connected components: recursive CTE (transitive closure + min per
    # node) checks Spark's iterative label propagation at its fixpoint
    out["dedup_components"] = f"""
WITH RECURSIVE pairs AS ({out["simhash_pairs"]}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs WHERE hamming <= 1),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
)
SELECT d.doc_id,
       LEAST(d.doc_id, COALESCE(r.mn, d.doc_id)) AS component
FROM documents d
LEFT JOIN (SELECT a, MIN(b) AS mn FROM reach GROUP BY a) r ON r.a = d.doc_id
""".strip()
    # single-batch maintained clustering == the batch operator exactly,
    # so the twin is SHARED (the dedup_lines_maintained precedent)
    out["dedup_components_maintained"] = out["dedup_components"]
    # cluster-size histogram: the same recursive components query,
    # reduced twice (the dedup_canonicals nesting precedent)
    out["dedup_component_sizes"] = f"""
WITH comp AS (
{out["dedup_components"]}
)
SELECT size, CAST(COUNT(*) AS BIGINT) AS n_components
FROM (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS size FROM comp GROUP BY component
)
GROUP BY size
""".strip()
    # quality-argmax canonical per component: the components CTE is the
    # full recursive query above, nested as a derived table
    out["dedup_canonicals"] = f"""
WITH comp AS (
{out["dedup_components"]}
),
q AS ({out["doc_quality"]})
SELECT component, n_members, canonical_id, best_quality FROM (
  SELECT c.component,
         COUNT(*) OVER (PARTITION BY c.component) AS n_members,
         c.doc_id AS canonical_id,
         ROUND(MAX(q.quality_score) OVER (PARTITION BY c.component) + 1e-09, 6) AS best_quality,
         ROW_NUMBER() OVER (PARTITION BY c.component ORDER BY q.quality_score DESC, c.doc_id ASC) AS rk
  FROM comp c JOIN q USING (doc_id)
)
WHERE rk = 1
""".strip()
    out["doc_repetition"] = """
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
g AS (
  SELECT doc_id, 'tok' AS kind, unnest(ts) AS g FROM toks
  UNION ALL
  SELECT doc_id, 'big' AS kind, ts[i] || ' ' || ts[i+1] AS g
  FROM toks, UNNEST(CASE WHEN len(ts) >= 2 THEN generate_series(1, len(ts)-1) ELSE [] END) AS u(i)
),
c AS (SELECT doc_id, kind, g, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
k AS (SELECT doc_id, kind, SUM(c) AS n, COUNT(*) AS d, MAX(c) AS top FROM c GROUP BY 1, 2)
SELECT doc_id,
  CAST(SUM(CASE WHEN kind = 'tok' THEN n END) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN kind = 'tok' THEN d END) AS BIGINT) AS distinct_tokens,
  ROUND(1e0 - SUM(CASE WHEN kind = 'tok' THEN d END) * 1e0
        / SUM(CASE WHEN kind = 'tok' THEN n END) + 1e-09, 6) AS dup_token_ratio,
  ROUND(SUM(CASE WHEN kind = 'tok' THEN top END) * 1e0
        / SUM(CASE WHEN kind = 'tok' THEN n END) + 1e-09, 6) AS top_token_frac,
  CAST(COALESCE(SUM(CASE WHEN kind = 'big' THEN n END), 0) AS BIGINT) AS n_bigrams,
  CAST(COALESCE(SUM(CASE WHEN kind = 'big' THEN d END), 0) AS BIGINT) AS distinct_bigrams,
  ROUND(SUM(CASE WHEN kind = 'big' THEN top END) * 1e0
        / SUM(CASE WHEN kind = 'big' THEN n END) + 1e-09, 6) AS top_bigram_frac
FROM k GROUP BY doc_id
""".strip()
    out["source_overlap"] = f"""
WITH sh AS (
  SELECT DISTINCT source,
         unnest(list_transform(
           generate_series(1, greatest(len(string_split(lower(text), ' ')) - {_OVERLAP_K - 1}, 0)),
           i -> array_to_string((string_split(lower(text), ' '))[i:i+{_OVERLAP_K - 1}], ' '))) AS shingle
  FROM documents
),
sz AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
p AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS shared_shingles
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b, p.shared_shingles,
       ROUND(p.shared_shingles * 1e0 / (sa.n + sb.n - p.shared_shingles) + 1e-09, 6) AS overlap_jaccard
FROM p JOIN sz sa ON sa.source = p.source_a JOIN sz sb ON sb.source = p.source_b
""".strip()
    out["bm25_topk"] = _bm25_sql()
    out["bm25_search"] = _bm25_search_sql()
    out["duplicate_spans"] = f"""
WITH {_span_ctes("documents", _SPAN_GRAM)}
SELECT doc_a, doc_b, start_a, start_b, span_tokens FROM spans
""".strip()
    out["span_coverage"] = f"""
WITH {_span_ctes("documents", _SPAN_GRAM)},
{_coverage_ctes()}
SELECT d.doc_id,
       CAST(len(string_split(lower(d.text), ' ')) AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered_tokens,
       ROUND(COALESCE(c.covered, 0) * 1e0
             / len(string_split(lower(d.text), ' ')) + 1e-09, 6) AS coverage
FROM documents d LEFT JOIN cov c USING (doc_id)
""".strip()
    from cuda_gis_smoothing_spark.operators.sampling import (
        _DENOM as _SAMPLE_DENOM,
        sample_hash_sql,
    )

    out["quality_weighted_sample"] = f"""
WITH q AS ({out["doc_quality"]})
SELECT doc_id, n_tokens, quality_score
FROM q
WHERE {sample_hash_sql("doc_id")} < FLOOR(quality_score * {_SAMPLE_DENOM} + 1e-09)
""".strip()
    out["curate_corpus_strict"] = _curate_strict_sql(
        out["doc_quality"], out["doc_language_id"], out["doc_repetition"]
    )
    out["source_overlap_minhash"] = _source_overlap_minhash_sql()
    out["language_confusion"] = f"""
WITH l AS ({out["doc_language_id"]}),
cm AS (
  SELECT d.lang, l.pred_lang, COUNT(*) AS n_docs
  FROM documents d JOIN l USING (doc_id)
  GROUP BY 1, 2
),
t AS (SELECT lang, SUM(n_docs) AS tt FROM cm GROUP BY lang)
SELECT cm.lang, cm.pred_lang, cm.n_docs,
       ROUND(cm.n_docs * 1e0 / t.tt + 1e-09, 6) AS truth_share
FROM cm JOIN t USING (lang)
""".strip()
    # normalization-aware exact dedup: DuckDB regexp_replace needs the
    # 'g' flag (first-match default; Spark replaces all)
    out["dedup_normalized"] = _dedup_sql(
        "md5(trim(regexp_replace(regexp_replace(lower(text), "
        "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))"
    )
    out["dedup_containment"] = f"""
WITH {tok_lang_cte},
sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM tok a JOIN tok b ON a.t = b.t AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(i * 1.0 / LEAST(sa.n, sb.n) + 1e-09, 6) AS containment
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE ROUND(i * 1.0 / LEAST(sa.n, sb.n) + 1e-09, 6) >= {_CONTAINMENT_T}
""".strip()
    out["cross_source_dups"] = """
WITH sd AS (
  SELECT DISTINCT source,
         md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS k
  FROM documents WHERE text IS NOT NULL
)
SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared_texts
FROM sd a JOIN sd b ON a.k = b.k AND a.source < b.source
GROUP BY 1, 2
""".strip()
    out["decontaminated_corpus"] = f"""
WITH contam AS ({out["contamination_report"]})
SELECT d.doc_id, d.source,
       CAST(len(string_split(lower(d.text), ' ')) AS BIGINT) AS n_tokens
FROM documents d
WHERE d.source <> '{_CONTAM_BENCH}'
  AND d.doc_id NOT IN (SELECT doc_id FROM contam)
""".strip()
    # bloom prefilter has no false negatives and the exact verify
    # removes every false positive → output == the exact anti-join's,
    # so the twin is SHARED (the banded-variant precedent)
    out["decontaminated_bloom"] = out["decontaminated_corpus"]
    # skyline: the running max runs over DISTINCT quality levels
    # (total order — the cross-engine window rule); round6 quality is
    # the join key (the user_rfm compare-only-rounded contract)
    out["doc_skyline"] = f"""
WITH q AS ({out["doc_quality"]}),
pts AS (
  SELECT doc_id, quality_score, CAST(n_tokens AS BIGINT) AS n_tokens
  FROM q WHERE quality_score IS NOT NULL AND n_tokens IS NOT NULL
),
perq AS (SELECT quality_score, MAX(n_tokens) AS mt FROM pts GROUP BY 1),
run AS (
  SELECT quality_score, mt,
         MAX(mt) OVER (ORDER BY quality_score DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_above
  FROM perq
)
SELECT p.doc_id, p.quality_score, p.n_tokens
FROM pts p JOIN run r ON r.quality_score = p.quality_score
WHERE p.n_tokens = r.mt AND (r.best_above IS NULL OR r.best_above < r.mt)
""".strip()
    out["vocab_df_idf"] = f"""
WITH {tok_cte},
dfr AS (SELECT t, COUNT(*) AS df FROM tok GROUP BY t),
n AS (SELECT COUNT(*) * 1.0 AS N FROM documents WHERE text IS NOT NULL)
SELECT t AS token, CAST(df AS BIGINT) AS df,
       ROUND(ln(1.0 + (n.N - df + 0.5) / (df + 0.5)) + 1e-09, 6) AS idf
FROM dfr, n
WHERE df >= {_VOCAB_MIN_DF}
""".strip()
    from cuda_gis_smoothing_spark.operators.events import DAILY_ANOMALY_SQL
    from cuda_gis_smoothing_spark.operators.packing import PACK_SEQ_LEN

    out["source_quota"] = f"""
WITH q AS ({out["doc_quality"]})
SELECT doc_id, source, quality_score, rank FROM (
  SELECT q.doc_id, d.source, q.quality_score,
         ROW_NUMBER() OVER (
           PARTITION BY d.source
           ORDER BY q.quality_score DESC, q.doc_id
         ) AS rank
  FROM q JOIN documents d USING (doc_id)
)
WHERE rank <= {_SOURCE_QUOTA_CAP}
""".strip()
    out["embedding_components"] = f"""
WITH RECURSIVE pairs AS ({_emb_banded_sql()}),
edges AS (SELECT vec_a AS a, vec_b AS b FROM pairs),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
)
SELECT e.vec_id,
       LEAST(e.vec_id, COALESCE(r.mn, e.vec_id)) AS component
FROM embeddings e
LEFT JOIN (SELECT a, MIN(b) AS mn FROM reach GROUP BY a) r ON r.a = e.vec_id
""".strip()
    out["morans_i"] = f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES {_vals(_R1)}),
mu AS (SELECT AVG(ndvi) AS mu FROM cells4),
dev AS (SELECT cell, ndvi - mu.mu AS d FROM cells4, mu),
cr AS (
  SELECT COUNT(*) AS W, SUM(a.d * b.d) AS num
  FROM cells4 c CROSS JOIN offsets o
  JOIN cells4 n ON n.cell = c.cell + o.delta
  JOIN dev a ON a.cell = c.cell
  JOIN dev b ON b.cell = n.cell
),
dn AS (SELECT COUNT(*) AS n, SUM(d * d) AS den FROM dev)
SELECT CAST(dn.n AS BIGINT) AS n_cells,
       CAST(cr.W AS BIGINT) AS total_edges,
       ROUND((dn.n * 1.0 / cr.W) * cr.num / dn.den + 1e-09, 6) AS morans_i
FROM cr, dn
""".strip()
    out["geary_c"] = f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES {_vals(_R1)}),
cr AS (
  SELECT COUNT(*) AS W, SUM((c.ndvi - n.ndvi) * (c.ndvi - n.ndvi)) AS num
  FROM cells4 c CROSS JOIN offsets o
  JOIN cells4 n ON n.cell = c.cell + o.delta
),
dn AS (
  SELECT COUNT(*) AS n, SUM((ndvi - m.mu) * (ndvi - m.mu)) AS den
  FROM cells4, (SELECT AVG(ndvi) AS mu FROM cells4) m
)
SELECT CAST(dn.n AS BIGINT) AS n_cells,
       CAST(cr.W AS BIGINT) AS total_edges,
       ROUND((dn.n - 1) * cr.num / (2.0 * cr.W * dn.den) + 1e-09, 6) AS geary_c
FROM cr, dn
""".strip()
    out["join_counts"] = f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES {_vals(_R1)}),
mu AS (SELECT AVG(ndvi) AS mu FROM cells4),
mark AS (SELECT cell, CAST(ndvi > mu.mu AS INT) AS m FROM cells4, mu),
jn AS (
  SELECT COUNT(*) AS W,
         SUM(a.m * b.m) AS bb,
         SUM((1 - a.m) * (1 - b.m)) AS ww
  FROM cells4 c CROSS JOIN offsets o
  JOIN cells4 n ON n.cell = c.cell + o.delta
  JOIN mark a ON a.cell = c.cell
  JOIN mark b ON b.cell = n.cell
),
tot AS (SELECT COUNT(*) AS n, SUM(m) AS black FROM mark)
SELECT CAST(tot.n AS BIGINT) AS n_cells,
       CAST(tot.black AS BIGINT) AS n_black,
       CAST(jn.W AS BIGINT) AS total_edges,
       CAST(jn.bb AS BIGINT) AS bb_edges,
       CAST(jn.W - jn.bb - jn.ww AS BIGINT) AS bw_edges,
       CAST(jn.ww AS BIGINT) AS ww_edges
FROM jn, tot
""".strip()
    out["local_morans_i"] = f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES {_vals(_R1)}),
mu AS (SELECT AVG(ndvi) AS mu FROM cells4),
dev AS (SELECT cell, ndvi - mu.mu AS d FROM cells4, mu),
m2 AS (SELECT SUM(d * d) / COUNT(*) AS m2 FROM dev),
ns AS (
  SELECT c.cell, COUNT(*) AS k, SUM(bd.d) AS sn
  FROM cells4 c CROSS JOIN offsets o
  JOIN cells4 n ON n.cell = c.cell + o.delta
  JOIN dev bd ON bd.cell = n.cell
  GROUP BY c.cell
)
SELECT dev.cell,
       CAST(COALESCE(ns.k, 0) AS BIGINT) AS n_neighbors,
       ROUND(dev.d / m2.m2 * COALESCE(ns.sn, 0) + 1e-09, 6) AS local_i,
       CASE WHEN COALESCE(ns.k, 0) = 0 THEN 'ISO'
            WHEN dev.d >= 0 AND COALESCE(ns.sn, 0) >= 0 THEN 'HH'
            WHEN dev.d < 0 AND COALESCE(ns.sn, 0) < 0 THEN 'LL'
            WHEN dev.d >= 0 THEN 'HL'
            ELSE 'LH' END AS quadrant
FROM dev LEFT JOIN ns ON ns.cell = dev.cell, m2
""".strip()
    out["semivariogram"] = f"""
WITH {GRID_CELLS_SQL},
o1 (delta) AS (VALUES {_vals(_R1)}),
o2 (delta) AS (VALUES {_vals(_R2)}),
offs AS (
  SELECT delta, 1 AS ring FROM o1
  UNION ALL
  SELECT delta, 2 AS ring FROM o2
)
SELECT CAST(o.ring AS INT) AS ring,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(SUM((c.ndvi - n.ndvi) * (c.ndvi - n.ndvi)) / (2.0 * COUNT(*)) + 1e-09, 6) AS gamma
FROM cells4 c CROSS JOIN offs o
JOIN cells4 n ON n.cell = c.cell + o.delta
GROUP BY o.ring
""".strip()
    from cuda_gis_smoothing_spark.functions.text import TFIDF_VEC_CTES
    from cuda_gis_smoothing_spark.operators.retrieval import tfidf_topk_sql

    out["doc_tfidf"] = f"""
WITH {TFIDF_VEC_CTES}
SELECT doc_id, token, tf, tfidf FROM vec
""".strip()
    from cuda_gis_smoothing_spark.functions.text import DOC_KEYWORDS_K

    out["doc_keywords"] = f"""
WITH {TFIDF_VEC_CTES}
SELECT doc_id, token, tfidf, CAST(rank AS INT) AS rank FROM (
  SELECT doc_id, token, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
  FROM vec
) WHERE rank <= {DOC_KEYWORDS_K}
""".strip()
    out["tfidf_topk"] = tfidf_topk_sql()
    # identical semantics, different Spark path (maintained index logs)
    out["doc_tfidf_maintained"] = out["doc_tfidf"]
    out["knn_ivf_maintained"] = out["knn_ivf"]
    out["bigram_pmi"] = f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
uni AS (
  SELECT t, COUNT(*) AS c FROM (SELECT unnest(ts) AS t FROM toks)
  WHERE t <> '' GROUP BY t
),
tot AS (SELECT SUM(c) * 1.0 AS T FROM uni),
bg AS (
  SELECT ts[i] AS t1, ts[i + 1] AS t2
  FROM toks, UNNEST(CASE WHEN len(ts) >= 2
                    THEN generate_series(1, len(ts) - 1) ELSE [] END) AS u(i)
  WHERE ts[i] <> '' AND ts[i + 1] <> ''
),
bc AS (SELECT t1, t2, COUNT(*) AS c FROM bg GROUP BY t1, t2),
btot AS (SELECT SUM(c) * 1.0 AS B FROM bc),
ranked AS (
  SELECT t1, t2, c, ROW_NUMBER() OVER (ORDER BY c DESC, t1, t2) AS rank FROM bc
)
SELECT r.t1, r.t2, CAST(r.c AS BIGINT) AS n_pairs,
       ROUND(ln((r.c / btot.B) / ((u1.c / tot.T) * (u2.c / tot.T))) + 1e-09, 6) AS pmi,
       CAST(r.rank AS INT) AS rank
FROM ranked r
JOIN uni u1 ON u1.t = r.t1
JOIN uni u2 ON u2.t = r.t2, tot, btot
WHERE r.rank <= {_BIGRAM_K}
""".strip()
    # identical semantics, different Spark path (maintained co-occurrence logs)
    out["bigram_pmi_maintained"] = out["bigram_pmi"]
    from cuda_gis_smoothing_spark.functions.numeric import flit as _flit
    from cuda_gis_smoothing_spark.functions.text import BIGRAM_LM_LAMBDA

    out["doc_bigram_logprob"] = f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
bg AS (
  SELECT doc_id, ts[i] AS t1, ts[i + 1] AS t2
  FROM toks, UNNEST(CASE WHEN len(ts) >= 2
                    THEN generate_series(1, len(ts) - 1) ELSE [] END) AS u(i)
  WHERE ts[i] <> '' AND ts[i + 1] <> ''
),
bc AS (SELECT t1, t2, COUNT(*) AS c FROM bg GROUP BY t1, t2),
ctx AS (SELECT t1, SUM(c) AS s FROM bc GROUP BY t1),
uni AS (
  SELECT t, COUNT(*) AS c FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> '' GROUP BY t
),
tot AS (SELECT SUM(c) * 1.0 AS T FROM uni)
SELECT bg.doc_id,
       COUNT(*) AS n_bigram_occurrences,
       ROUND(AVG(-ln({_flit(BIGRAM_LM_LAMBDA)} * (bc.c * 1.0 / ctx.s)
                     + {_flit(1.0 - BIGRAM_LM_LAMBDA)} * (u.c / tot.T))) + 1e-09, 6)
         AS avg_neg_logprob
FROM bg JOIN bc USING (t1, t2) JOIN ctx USING (t1)
JOIN uni u ON u.t = bg.t2 CROSS JOIN tot
GROUP BY bg.doc_id
""".strip()
    out["source_kl_divergence"] = """
WITH stc AS (
  SELECT source, t, COUNT(*) AS c FROM (
    SELECT source, unnest(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> '' GROUP BY source, t
),
ct AS (SELECT t, SUM(c) AS ct FROM stc GROUP BY t),
ns AS (SELECT source, SUM(c) AS ns FROM stc GROUP BY source),
tot AS (SELECT SUM(c) * 1.0 AS T FROM stc)
SELECT stc.source,
       CAST(MAX(ns.ns) AS BIGINT) AS n_tokens,
       ROUND(SUM((stc.c * 1.0 / ns.ns)
                 * ln((stc.c * 1.0 / ns.ns) / (ct.ct / tot.T))) + 1e-09, 6)
         AS kl_divergence
FROM stc JOIN ct USING (t) JOIN ns USING (source) CROSS JOIN tot
GROUP BY stc.source
""".strip()
    out["cooccurrence_window"] = f"""
WITH {_window_pairs_ctes(_COOC_WINDOW)},
pc AS (SELECT t1, t2, COUNT(*) AS c FROM pr GROUP BY t1, t2),
ranked AS (
  SELECT t1, t2, c, ROW_NUMBER() OVER (ORDER BY c DESC, t1, t2) AS rank FROM pc
)
SELECT t1, t2, CAST(c AS BIGINT) AS n_pairs, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_BIGRAM_K}
""".strip()
    # windowed pair counts served from the window=3 maintained log ==
    # the batch operator exactly (SHARED twin — the bigram_pmi_maintained
    # precedent)
    out["cooccurrence_window_maintained"] = out["cooccurrence_window"]
    out["pq_codes"] = _pq_codes_sql()
    out["pq_search"] = _pq_search_sql()
    # identical semantics, different Spark path (maintained codes log)
    out["pq_codes_maintained"] = out["pq_codes"]
    out["ivfpq_search"] = _ivfpq_sql()
    out["ivfpq_search_maintained"] = _ivfpq_sql()
    out["cell_pagerank"] = _pagerank_sql()
    from cuda_gis_smoothing_spark.functions.text import TEXTRANK_K

    # TextRank: the SAME unrolled chain builder over the SAME windowed
    # pairs CTE text cooccurrence_window's twin uses; rank cut orders
    # on the ROUNDED pagerank (identical doubles cross-engine)
    out["keyword_textrank"] = f"""
WITH {_window_pairs_ctes(_COOC_WINDOW)},
epairs AS (
  SELECT DISTINCT LEAST(t1, t2) AS a, GREATEST(t1, t2) AS b
  FROM pr WHERE t1 <> t2
),
edges AS (
  SELECT a AS src, b AS dst FROM epairs
  UNION ALL SELECT b AS src, a AS dst FROM epairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (
  SELECT DISTINCT t AS token
  FROM (SELECT unnest(ts) AS t FROM toks) WHERE t <> ''
),
nn AS (SELECT COUNT(*) AS n FROM nodes),
{_pagerank_chain_sql("nodes", "token")},
ranked AS (
  SELECT token, ROUND(pr + 1e-09, 6) AS pagerank,
         ROW_NUMBER() OVER (ORDER BY ROUND(pr + 1e-09, 6) DESC, token) AS rank
  FROM pr5
)
SELECT token, pagerank, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TEXTRANK_K}
""".strip()
    # identical semantics, graph recovered from the maintained pair log
    out["keyword_textrank_maintained"] = out["keyword_textrank"]
    from cuda_gis_smoothing_spark.operators.sketches import kmv_distinct_sql

    out["kmv_distinct_users"] = kmv_distinct_sql(
        "events", ["event_type"], "user_id", k=64
    )
    out["sq_codes"] = _sq_codes_sql()
    out["sq_search"] = _sq_search_sql()
    from cuda_gis_smoothing_spark.sources.tables import GRID as _GRID

    out["morans_i_bivariate"] = f"""
WITH cellsb AS (
  SELECT ((l_partkey % {_GRID}) + {OFFSET}) * {ENC} + ((l_orderkey % {_GRID}) + {OFFSET}) AS cell,
         SUM(l_quantity) / COUNT(*) / 5e1 AS ndvi,
         COUNT(*) AS n_obs
  FROM lineitem GROUP BY 1
),
offsets (delta) AS (VALUES {_vals(_R1)}),
mu AS (SELECT AVG(ndvi) AS mx, AVG(n_obs) AS my FROM cellsb),
dev AS (SELECT cell, ndvi - mu.mx AS dx, n_obs - mu.my AS dy FROM cellsb, mu),
cr AS (
  SELECT COUNT(*) AS W, SUM(a.dx * b.dy) AS num
  FROM cellsb c CROSS JOIN offsets o
  JOIN cellsb n ON n.cell = c.cell + o.delta
  JOIN dev a ON a.cell = c.cell
  JOIN dev b ON b.cell = n.cell
),
dn AS (SELECT COUNT(*) AS n, SUM(dx * dx) AS sx, SUM(dy * dy) AS sy FROM dev)
SELECT CAST(dn.n AS BIGINT) AS n_cells,
       CAST(cr.W AS BIGINT) AS total_edges,
       ROUND(((dn.n / cr.W) * cr.num / SQRT(dn.sx * dn.sy)) + 1e-09, 6) AS bivariate_i
FROM cr, dn
""".strip()
    from cuda_gis_smoothing_spark.operators.sketches import (
        kmv_shingle_overlap_sql,
    )

    out["source_overlap_kmv"] = kmv_shingle_overlap_sql(k_shingle=_OVERLAP_K, k=64)
    from cuda_gis_smoothing_spark.operators.events import PCT_QS as _PCT_QS
    from cuda_gis_smoothing_spark.operators.sketches import (
        kmv_quantile_sketch_sql,
    )

    out["value_quantiles_sketch"] = kmv_quantile_sketch_sql(
        "SELECT * FROM events",
        "value",
        "event_id",
        _PCT_QS,
        group_cols=("event_type",),
        k=_QSK_K,
    )
    # identical semantics, different Spark path (maintained count logs)
    out["source_kl_maintained"] = out["source_kl_divergence"]
    # identical semantics, different Spark path (maintained sketch log)
    out["kmv_distinct_maintained"] = out["kmv_distinct_users"]
    out["source_overlap_kmv_maintained"] = out["source_overlap_kmv"]
    out["value_quantiles_maintained"] = out["value_quantiles_sketch"]
    from cuda_gis_smoothing_spark.functions.text import (
        HOLDOUT_LOGPROB_SQL,
        LANG_SOURCE_CHI2_SQL,
    )

    out["holdout_logprob"] = HOLDOUT_LOGPROB_SQL
    out["lang_source_chi2"] = LANG_SOURCE_CHI2_SQL
    from cuda_gis_smoothing_spark.operators.similarity import (
        LABEL_CENTROID_SQL,
    )

    out["label_centroid_similarity"] = LABEL_CENTROID_SQL
    from cuda_gis_smoothing_spark.operators.similarity import (
        embedding_outliers_sql,
    )

    out["embedding_outliers"] = embedding_outliers_sql()
    # single-batch maintained state == the batch operator exactly, so
    # the twin is SHARED (the smooth_maintained precedent)
    out["embedding_outliers_maintained"] = embedding_outliers_sql()
    from cuda_gis_smoothing_spark.operators.events import VALUE_OUTLIERS_SQL

    out["value_outliers"] = VALUE_OUTLIERS_SQL
    out["cell_gradient"] = f"""
WITH {GRID_CELLS_SQL}
SELECT c.cell,
       ROUND(((qp.ndvi - qm.ndvi) / 2e0) + 1e-09, 6) AS grad_q,
       ROUND(((rp.ndvi - rm.ndvi) / 2e0) + 1e-09, 6) AS grad_r,
       ROUND(SQRT(((qp.ndvi - qm.ndvi) / 2e0) * ((qp.ndvi - qm.ndvi) / 2e0)
                + ((rp.ndvi - rm.ndvi) / 2e0) * ((rp.ndvi - rm.ndvi) / 2e0)) + 1e-09, 6) AS grad_mag
FROM cells4 c
JOIN cells4 qp ON qp.cell = c.cell + {ENC}
JOIN cells4 qm ON qm.cell = c.cell - {ENC}
JOIN cells4 rp ON rp.cell = c.cell + 1
JOIN cells4 rm ON rm.cell = c.cell - 1
""".strip()
    from cuda_gis_smoothing_spark.operators.stats import hillshade_sql

    out["hillshade"] = hillshade_sql(source="cells4", with_ctes=GRID_CELLS_SQL)
    from cuda_gis_smoothing_spark.operators.hydrology import (
        R1_DELTAS,
        STREAM_THRESHOLD,
        TWI_EPS,
        flow_closure_ctes,
        flow_component_ctes,
        flow_ctes,
    )

    # hydrology family: one shared CTE builder per layer (fd / directed
    # closure / undirected components — drift-prevention); closure
    # twins are recursive CTEs — the flow graph is acyclic by strict
    # descent, so recursion terminates
    _FLOW = f"{GRID_CELLS_SQL},\n{flow_ctes()}"
    out["flow_direction"] = f"""
WITH {_FLOW}
SELECT cell, flow_to, ROUND(descent_raw + 1e-09, 6) AS descent
FROM fd
""".strip()
    # single-batch maintained state == the batch operator exactly, so
    # the twin is SHARED (the smooth_maintained precedent)
    out["flow_direction_maintained"] = out["flow_direction"]
    out["watershed_basins"] = f"""
WITH RECURSIVE {_FLOW},
{flow_component_ctes()},
fsizes AS (SELECT basin, CAST(COUNT(*) AS BIGINT) AS n_cells FROM fcomp GROUP BY 1),
fsinks AS (
  SELECT p.basin, d.cell AS sink_cell, ROUND(c.ndvi + 1e-09, 6) AS sink_value
  FROM fd d JOIN fcomp p ON p.cell = d.cell JOIN cells4 c ON c.cell = d.cell
  WHERE d.flow_to IS NULL
)
SELECT s.basin, s.n_cells, k.sink_cell, k.sink_value
FROM fsizes s JOIN fsinks k ON k.basin = s.basin
""".strip()
    out["flow_accumulation"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
facc AS (SELECT dst, COUNT(*) AS n FROM freach GROUP BY dst)
SELECT c.cell, CAST(1 + COALESCE(a.n, 0) AS BIGINT) AS upslope_cells
FROM cells4 c LEFT JOIN facc a ON a.dst = c.cell
""".strip()
    from cuda_gis_smoothing_spark.functions.numeric import (
        floor_stable_sql,
        round6_sql,
    )

    out["flow_load"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
fw AS (SELECT cell, CAST({floor_stable_sql("ndvi * 1e6")} AS BIGINT) AS w
       FROM cells4),
fup AS (
  SELECT r.dst, CAST(SUM(w.w) AS BIGINT) AS s
  FROM freach r JOIN fw w ON w.cell = r.src GROUP BY r.dst
)
SELECT w.cell,
       CAST(w.w + COALESCE(u.s, 0) AS BIGINT) AS upslope_micro_load,
       {round6_sql("CAST(w.w + COALESCE(u.s, 0) AS DOUBLE) / 1e6")}
         AS upslope_load
FROM fw w LEFT JOIN fup u ON u.dst = w.cell
""".strip()
    # the ONE (cell, path_steps, sink_cell) derivation — shared by the
    # flow_path_length and flow_sinuosity twins (drift prevention)
    _fpl_body = """
fsteps AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS path_steps FROM freach GROUP BY src),
fsinks AS (SELECT cell FROM fd WHERE flow_to IS NULL),
fterm AS (SELECT r.src, r.dst AS sink_cell FROM freach r JOIN fsinks s ON s.cell = r.dst),
fpl AS (
  SELECT t.src AS cell, st.path_steps, t.sink_cell
  FROM fsteps st JOIN fterm t ON t.src = st.src
  UNION ALL
  SELECT cell, CAST(0 AS BIGINT) AS path_steps, cell AS sink_cell FROM fsinks
)""".strip()
    out["flow_path_length"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
{_fpl_body}
SELECT cell, path_steps, sink_cell FROM fpl
""".strip()
    from cuda_gis_smoothing_spark.operators.spatial import hex_distance_sql

    _hexd = hex_distance_sql("cell", "sink_cell", "duckdb")
    out["flow_sinuosity"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
{_fpl_body}
SELECT cell, path_steps,
       CAST({_hexd} AS BIGINT) AS hex_distance,
       ROUND((CASE WHEN {_hexd} > 0
                   THEN path_steps * 1.0 / {_hexd} END) + 1e-09, 6) AS sinuosity
FROM fpl
""".strip()
    out["flow_upstream_length"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
fsteps AS (
  SELECT c.cell, CAST(COALESCE(s.n, 0) AS BIGINT) AS steps
  FROM cells4 c
  LEFT JOIN (SELECT src, COUNT(*) AS n FROM freach GROUP BY src) s ON s.src = c.cell
),
fanc AS (
  SELECT r.dst, MAX(st.steps) AS mx
  FROM freach r JOIN fsteps st ON st.cell = r.src GROUP BY r.dst
)
SELECT s.cell, CAST(COALESCE(a.mx - s.steps, 0) AS BIGINT) AS upstream_steps
FROM fsteps s LEFT JOIN fanc a ON a.dst = s.cell
""".strip()
    out["basin_channel_length"] = f"""
WITH RECURSIVE {_FLOW},
{flow_component_ctes()},
{flow_closure_ctes()},
fsteps AS (
  SELECT c.cell, CAST(COALESCE(s.n, 0) AS BIGINT) AS steps
  FROM cells4 c
  LEFT JOIN (SELECT src, COUNT(*) AS n FROM freach GROUP BY src) s ON s.src = c.cell
),
fanc AS (
  SELECT r.dst, MAX(st.steps) AS mx
  FROM freach r JOIN fsteps st ON st.cell = r.src GROUP BY r.dst
),
fup AS (
  SELECT s.cell, CAST(COALESCE(a.mx - s.steps, 0) AS BIGINT) AS upstream_steps
  FROM fsteps s LEFT JOIN fanc a ON a.dst = s.cell
),
fsizes AS (SELECT basin, CAST(COUNT(*) AS BIGINT) AS n_cells FROM fcomp GROUP BY 1)
SELECT p.basin, z.n_cells, k.cell AS sink_cell, u.upstream_steps AS channel_steps
FROM fd k
JOIN fcomp p ON p.cell = k.cell
JOIN fsizes z ON z.basin = p.basin
JOIN fup u ON u.cell = k.cell
WHERE k.flow_to IS NULL
""".strip()
    # the ONE basin-stats aggregate CTE — shared with basin_relief_ratio
    # (the drift-prevention class)
    _bstats_core = """bst AS (
  SELECT p.basin,
         CAST(COUNT(*) AS BIGINT) AS n_cells,
         ROUND(AVG(c.ndvi) + 1e-09, 6) AS mean_value,
         MIN(c.ndvi) AS min_value,
         MAX(c.ndvi) AS max_value,
         ROUND((MAX(c.ndvi) - MIN(c.ndvi)) + 1e-09, 6) AS relief
  FROM fcomp p JOIN cells4 c ON c.cell = p.cell
  GROUP BY p.basin
)"""
    out["basin_stats"] = f"""
WITH RECURSIVE {_FLOW},
{flow_component_ctes()},
{_bstats_core}
SELECT basin, n_cells, mean_value, min_value, max_value, relief FROM bst
""".strip()
    # round-FIRST layering: er_ratio reads bst's already-round6'd mean
    # against the exact min/max — correctly-rounded ops over identical
    # inputs in both engines
    out["basin_relief_ratio"] = f"""
WITH RECURSIVE {_FLOW},
{flow_component_ctes()},
{_bstats_core}
SELECT basin, n_cells, relief,
       ROUND((CASE WHEN max_value - min_value > 0
                   THEN (mean_value - min_value) / (max_value - min_value)
              END) + 1e-09, 6) AS er_ratio
FROM bst
""".strip()
    out["basin_adjacency"] = f"""
WITH RECURSIVE {_FLOW},
{flow_component_ctes()}
SELECT pa.basin AS basin_a, pb.basin AS basin_b,
       CAST(COUNT(*) AS BIGINT) AS n_border_edges
FROM cells4 c CROSS JOIN f_offsets o
JOIN cells4 nb ON nb.cell = c.cell + o.delta
JOIN fcomp pa ON pa.cell = c.cell
JOIN fcomp pb ON pb.cell = nb.cell
WHERE pa.basin < pb.basin
GROUP BY 1, 2
""".strip()
    # representative saddle edge: (saddle, cell, nbr) is a total order
    # (id pair breaks any value tie), so ROW_NUMBER rk=1 == struct-MIN
    out["basin_pour_points"] = f"""
WITH RECURSIVE {_FLOW},
{flow_component_ctes()},
pedges AS (
  SELECT pa.basin AS basin_a, pb.basin AS basin_b,
         c.cell, nb.cell AS nbr,
         GREATEST(c.ndvi, nb.ndvi) AS s
  FROM cells4 c CROSS JOIN f_offsets o
  JOIN cells4 nb ON nb.cell = c.cell + o.delta
  JOIN fcomp pa ON pa.cell = c.cell
  JOIN fcomp pb ON pb.cell = nb.cell
  WHERE pa.basin < pb.basin
),
pranked AS (
  SELECT basin_a, basin_b, cell, nbr, s,
         CAST(COUNT(*) OVER (PARTITION BY basin_a, basin_b) AS BIGINT) AS n_border_edges,
         ROW_NUMBER() OVER (PARTITION BY basin_a, basin_b ORDER BY s, cell, nbr) AS rk
  FROM pedges
)
SELECT basin_a, basin_b, n_border_edges,
       ROUND(s + 1e-09, 6) AS saddle_value,
       cell AS saddle_cell, nbr AS saddle_nbr
FROM pranked WHERE rk = 1
""".strip()
    out["basin_mainstem"] = f"""
WITH RECURSIVE {_FLOW},
{flow_component_ctes()},
{flow_closure_ctes()},
msteps AS (
  SELECT d.cell, CAST(COALESCE(s.n, 0) AS BIGINT) AS steps
  FROM fd d LEFT JOIN (SELECT src, COUNT(*) AS n FROM freach GROUP BY src) s
    ON s.src = d.cell
),
manc AS (
  SELECT r.dst, MAX(s2.steps) AS mx
  FROM freach r JOIN msteps s2 ON s2.cell = r.src
  GROUP BY r.dst
),
mthr AS (
  SELECT s.cell, p.basin,
         CAST(COALESCE(a.mx, s.steps) AS BIGINT) AS through_steps
  FROM msteps s
  LEFT JOIN manc a ON a.dst = s.cell
  JOIN fcomp p ON p.cell = s.cell
),
mchan AS (SELECT basin, MAX(through_steps) AS chan FROM mthr GROUP BY basin)
SELECT t.cell, t.basin, t.through_steps,
       CAST(CASE WHEN t.through_steps = c2.chan THEN 1 ELSE 0 END AS INT) AS is_mainstem
FROM mthr t JOIN mchan c2 ON c2.basin = t.basin
""".strip()
    out["twi"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
facc AS (SELECT dst, COUNT(*) AS n FROM freach GROUP BY dst),
fups AS (
  SELECT c.cell, CAST(1 + COALESCE(a.n, 0) AS BIGINT) AS upslope_cells
  FROM cells4 c LEFT JOIN facc a ON a.dst = c.cell
)
SELECT c.cell, u.upslope_cells,
       ROUND(LN(CAST(u.upslope_cells AS DOUBLE)
                / (SQRT(((qp.ndvi - qm.ndvi) / 2e0) * ((qp.ndvi - qm.ndvi) / 2e0)
                      + ((rp.ndvi - rm.ndvi) / 2e0) * ((rp.ndvi - rm.ndvi) / 2e0))
                   + {flit(TWI_EPS)})) + 1e-09, 6) AS twi
FROM cells4 c
JOIN cells4 qp ON qp.cell = c.cell + {ENC}
JOIN cells4 qm ON qm.cell = c.cell - {ENC}
JOIN cells4 rp ON rp.cell = c.cell + 1
JOIN cells4 rm ON rm.cell = c.cell - 1
JOIN fups u ON u.cell = c.cell
""".strip()
    _sector_case = " ".join(
        f"WHEN {d} THEN {i}" for i, d in enumerate(R1_DELTAS)
    )
    out["aspect_sectors"] = f"""
WITH {_FLOW}
SELECT cell,
       CAST(CASE flow_to - cell {_sector_case} ELSE -1 END AS INT) AS sector
FROM fd
""".strip()
    out["drainage_density"] = f"""
WITH RECURSIVE {_FLOW},
{flow_component_ctes()},
{flow_closure_ctes()},
facc AS (SELECT dst, COUNT(*) AS n FROM freach GROUP BY dst),
fups AS (
  SELECT c.cell, CAST(1 + COALESCE(a.n, 0) AS BIGINT) AS upslope_cells
  FROM cells4 c LEFT JOIN facc a ON a.dst = c.cell
)
SELECT p.basin,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN u.upslope_cells >= {STREAM_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT) AS n_stream_cells,
       ROUND((CAST(SUM(CASE WHEN u.upslope_cells >= {STREAM_THRESHOLD} THEN 1 ELSE 0 END) AS DOUBLE)
              / COUNT(*)) + 1e-09, 6) AS drainage_density,
       MAX(u.upslope_cells) AS max_upslope
FROM fcomp p JOIN fups u ON u.cell = p.cell
GROUP BY p.basin
""".strip()
    out["stream_distance"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
sdin AS (SELECT dst, COUNT(*) AS n FROM freach GROUP BY dst),
sdst AS (SELECT src, COUNT(*) AS n FROM freach GROUP BY src),
sdbase AS (
  SELECT d.cell,
         CAST(COALESCE(st.n, 0) AS BIGINT) AS steps,
         CAST(1 + COALESCE(i.n, 0) AS BIGINT) AS up
  FROM fd d
  LEFT JOIN sdst st ON st.src = d.cell
  LEFT JOIN sdin i ON i.dst = d.cell
),
sstreams AS (SELECT cell, steps FROM sdbase WHERE up >= {STREAM_THRESHOLD}),
scand AS (
  SELECT r.src, MAX(s.steps) AS mx
  FROM freach r JOIN sstreams s ON s.cell = r.dst
  GROUP BY r.src
)
SELECT b.cell,
       CAST(CASE WHEN b.up >= {STREAM_THRESHOLD} THEN 1 ELSE 0 END AS INT) AS is_stream,
       CAST(CASE WHEN b.up >= {STREAM_THRESHOLD} THEN 0 ELSE b.steps - c.mx END AS BIGINT) AS stream_dist
FROM sdbase b LEFT JOIN scand c ON c.src = b.cell
""".strip()
    from cuda_gis_smoothing_spark.operators.hydrology import (
        COST_ROUNDS,
        cost_ctes,
    )

    # cost_distance: seeds ride the shared recursive closure; the
    # relaxations are UNROLLED integer min-plus CTEs (cell_pagerank
    # precedent — LEAST skips NULLs identically in both engines)
    from cuda_gis_smoothing_spark.operators.hydrology import ALLOC_SHIFT

    out["cost_distance"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
{cost_ctes()}
SELECT cell, seed, CAST(k // {ALLOC_SHIFT} AS BIGINT) AS cost FROM cd{COST_ROUNDS}
""".strip()
    # single-batch maintained state == the batch operator exactly
    out["cost_distance_maintained"] = out["cost_distance"]
    out["cost_allocation"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
{cost_ctes()}
SELECT cell, seed,
       CAST(k // {ALLOC_SHIFT} AS BIGINT) AS cost,
       CAST(k % {ALLOC_SHIFT} AS BIGINT) AS nearest_seed
FROM cd{COST_ROUNDS}
""".strip()
    # cost_next_hop: the neighbor argmin is a TOTAL order (k, nbr) —
    # nbr unique per partition, so the tied-window hazard can't bind
    out["cost_next_hop"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
{cost_ctes()},
cnhb AS (
  SELECT e.cell, p.k AS kn, p.cell AS nbr,
         ROW_NUMBER() OVER (PARTITION BY e.cell ORDER BY p.k ASC, p.cell ASC) AS rk
  FROM (SELECT c.cell, c.cell + o.delta AS nbr
        FROM cells4 c CROSS JOIN f_offsets o) e
  JOIN cd{COST_ROUNDS} p ON p.cell = e.nbr AND p.k IS NOT NULL
)
SELECT d.cell, d.seed,
       CAST(d.k // {ALLOC_SHIFT} AS BIGINT) AS cost,
       CAST(d.k % {ALLOC_SHIFT} AS BIGINT) AS nearest_seed,
       CAST(CASE WHEN NOT d.seed AND d.k IS NOT NULL THEN b.nbr END AS BIGINT) AS next_hop,
       CAST(CASE WHEN NOT d.seed AND d.k IS NOT NULL
                 THEN b.kn // {ALLOC_SHIFT} END AS BIGINT) AS next_cost
FROM cd{COST_ROUNDS} d
LEFT JOIN (SELECT * FROM cnhb WHERE rk = 1) b ON b.cell = d.cell
""".strip()
    from cuda_gis_smoothing_spark.operators.hydrology import (
        HYPSO_BANDS,
        cost_weight_cte,
    )

    out["flow_path_cost"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
{cost_weight_cte()},
fpc AS (
  SELECT r.src, SUM(w.w) AS pc FROM freach r JOIN cw w ON w.cell = r.dst GROUP BY r.src
)
SELECT c.cell, CAST(COALESCE(p.pc, 0) AS BIGINT) AS path_cost
FROM cells4 c LEFT JOIN fpc p ON p.src = c.cell
""".strip()
    out["stream_magnitude"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
fleaves AS (
  SELECT c.cell FROM cells4 c
  WHERE NOT EXISTS (SELECT 1 FROM fedges e WHERE e.dst = c.cell)
),
fthru AS (
  SELECT r.dst, COUNT(*) AS m
  FROM freach r JOIN fleaves l ON l.cell = r.src GROUP BY r.dst
)
SELECT c.cell,
       CAST(COALESCE(t.m, 0)
            + (CASE WHEN l.cell IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS magnitude
FROM cells4 c
LEFT JOIN fthru t ON t.dst = c.cell
LEFT JOIN fleaves l ON l.cell = c.cell
""".strip()
    out["basin_hypsometry"] = f"""
WITH RECURSIVE {_FLOW},
{flow_component_ctes()}
SELECT p.basin,
       CAST(LEAST(FLOOR((c.ndvi * {HYPSO_BANDS}) + 1e-09), {HYPSO_BANDS - 1}) AS INT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_cells
FROM fcomp p JOIN cells4 c ON c.cell = p.cell
GROUP BY 1, 2
""".strip()
    out["terrain_ruggedness"] = f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES {_vals(_R1)})
SELECT c.cell,
       CAST(COUNT(*) AS BIGINT) AS n_neighbors,
       ROUND(AVG(ABS(n.ndvi - c.ndvi)) + 1e-09, 6) AS tri
FROM cells4 c CROSS JOIN offsets o
JOIN cells4 n ON n.cell = c.cell + o.delta
GROUP BY c.cell
""".strip()
    out["cell_curvature"] = f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES {_vals(_R1)})
SELECT c.cell,
       ROUND((SUM(CASE WHEN o.delta = {ENC} THEN n.ndvi END)
            + SUM(CASE WHEN o.delta = -{ENC} THEN n.ndvi END)
            - 2e0 * c.ndvi) + 1e-09, 6) AS curv_q,
       ROUND((SUM(CASE WHEN o.delta = 1 THEN n.ndvi END)
            + SUM(CASE WHEN o.delta = -1 THEN n.ndvi END)
            - 2e0 * c.ndvi) + 1e-09, 6) AS curv_r,
       ROUND((SUM(n.ndvi) - 6e0 * c.ndvi) + 1e-09, 6) AS laplacian
FROM cells4 c CROSS JOIN offsets o
JOIN cells4 n ON n.cell = c.cell + o.delta
GROUP BY c.cell, c.ndvi
HAVING COUNT(*) = 6
""".strip()
    from cuda_gis_smoothing_spark.operators.stats import (
        HS_COSZ,
        HS_LX,
        HS_LY,
        HS_SINZ,
        VISIBILITY_RANGE,
    )

    # fused terrain kernel: the twin mirrors SEMANTICS, not the fused
    # plan — flow rides the shared fd CTE, the rest are conditional
    # sums over one offsets join (axis values are single-row sums, so
    # every column matches its standalone twin's expression shape)
    _gq = "((a.qp - a.qm) / 2e0)"
    _gr = "((a.rp - a.rm) / 2e0)"
    _hsnum = (
        f"({flit(HS_COSZ)} - {flit(HS_SINZ)} * "
        f"({flit(HS_LX)} * {_gq} + {flit(HS_LY)} * {_gr}))"
    )
    out["terrain_profile"] = f"""
WITH {_FLOW},
offsets (delta) AS (VALUES {_vals(_R1)}),
a AS (
  SELECT c.cell, c.ndvi AS x, COUNT(*) AS n,
         SUM(CASE WHEN o.delta = {ENC} THEN n.ndvi END) AS qp,
         SUM(CASE WHEN o.delta = -{ENC} THEN n.ndvi END) AS qm,
         SUM(CASE WHEN o.delta = 1 THEN n.ndvi END) AS rp,
         SUM(CASE WHEN o.delta = -1 THEN n.ndvi END) AS rm,
         SUM(n.ndvi) AS s,
         AVG(ABS(n.ndvi - c.ndvi)) AS t
  FROM cells4 c CROSS JOIN offsets o
  JOIN cells4 n ON n.cell = c.cell + o.delta
  GROUP BY c.cell, c.ndvi
  HAVING COUNT(*) = 6
)
SELECT a.cell,
       ROUND({_gq} + 1e-09, 6) AS grad_q,
       ROUND({_gr} + 1e-09, 6) AS grad_r,
       ROUND(SQRT({_gq} * {_gq} + {_gr} * {_gr}) + 1e-09, 6) AS grad_mag,
       ROUND((a.qp + a.qm - 2e0 * a.x) + 1e-09, 6) AS curv_q,
       ROUND((a.rp + a.rm - 2e0 * a.x) + 1e-09, 6) AS curv_r,
       ROUND((a.s - 6e0 * a.x) + 1e-09, 6) AS laplacian,
       ROUND(a.t + 1e-09, 6) AS tri,
       ROUND(GREATEST(0e0, {_hsnum} / SQRT({_gq} * {_gq} + {_gr} * {_gr} + 1e0)) + 1e-09, 6) AS hillshade,
       f.flow_to,
       ROUND(f.descent_raw + 1e-09, 6) AS descent
FROM a JOIN fd f ON f.cell = a.cell
""".strip()

    _ks = ", ".join(f"({k})" for k in range(1, VISIBILITY_RANGE + 1))
    out["axis_visibility"] = f"""
WITH {GRID_CELLS_SQL},
dirs (d) AS (VALUES {_vals(_R1)}),
ks (k) AS (VALUES {_ks}),
rays AS (
  SELECT c.cell, c.ndvi AS x, d.d AS d, k.k AS k, t.ndvi AS xt
  FROM cells4 c CROSS JOIN dirs d CROSS JOIN ks k
  JOIN cells4 t ON t.cell = c.cell + d.d * k.k
),
inter AS (
  SELECT r.cell, r.d, r.k, r.x, r.xt, u.j, i.ndvi AS xi
  FROM rays r, UNNEST(range(1, r.k)) AS u(j)
  JOIN cells4 i ON i.cell = r.cell + r.d * u.j
  WHERE r.k >= 2
),
checked AS (
  SELECT cell, d, k, COUNT(*) AS nf,
         MAX(CASE WHEN xi >= x + (xt - x) * (CAST(j AS DOUBLE) / k)
                  THEN 1 ELSE 0 END) AS blocked
  FROM inter GROUP BY cell, d, k
),
vis AS (
  SELECT cell FROM rays WHERE k = 1
  UNION ALL
  SELECT cell FROM checked WHERE nf = k - 1 AND blocked = 0
),
nv AS (SELECT cell, COUNT(*) AS n FROM vis GROUP BY cell)
SELECT c.cell, CAST(COALESCE(nv.n, 0) AS BIGINT) AS n_visible
FROM cells4 c LEFT JOIN nv ON nv.cell = c.cell
""".strip()
    out["grid_downsample"] = f"""
WITH {GRID_CELLS_SQL}
SELECT ((cell // {ENC}) // 2) * {ENC} + ((cell % {ENC}) // 2) AS coarse_cell,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(AVG(ndvi) + 1e-09, 6) AS mean_value,
       MIN(ndvi) AS min_value,
       MAX(ndvi) AS max_value
FROM cells4
GROUP BY 1
""".strip()
    # single-batch maintained state == the batch operator exactly
    # (the smooth_maintained precedent)
    out["grid_downsample_maintained"] = out["grid_downsample"]
    from cuda_gis_smoothing_spark.operators.analytics import (
        INTEGRITY_REPORT_SQL,
    )

    out["integrity_report"] = INTEGRITY_REPORT_SQL
    from cuda_gis_smoothing_spark.operators.events import EVENTS_CUSUM_SQL

    out["events_cusum"] = EVENTS_CUSUM_SQL
    # single-batch maintained state == the batch operator exactly
    out["events_cusum_maintained"] = EVENTS_CUSUM_SQL
    from cuda_gis_smoothing_spark.operators.events import DAILY_TREND_SQL

    out["daily_trend"] = DAILY_TREND_SQL
    # single-batch maintained state == the batch operator exactly
    out["daily_trend_maintained"] = DAILY_TREND_SQL
    from cuda_gis_smoothing_spark.operators.events import (
        EVENTS_SEASONALITY_SQL,
    )

    out["events_seasonality"] = EVENTS_SEASONALITY_SQL
    # single-batch maintained state == the batch operator exactly
    out["events_seasonality_maintained"] = EVENTS_SEASONALITY_SQL
    from cuda_gis_smoothing_spark.functions.text import quality_mannwhitney_sql

    out["quality_mannwhitney"] = f"""
WITH q AS ({out["doc_quality"]}),
{quality_mannwhitney_sql()}
""".strip()
    from cuda_gis_smoothing_spark.operators.events import (
        multitouch_attribution_sql,
    )

    out["multitouch_attribution"] = multitouch_attribution_sql()
    from cuda_gis_smoothing_spark import datagen as _dg
    from cuda_gis_smoothing_spark.operators import spatial as _sp2
    from cuda_gis_smoothing_spark.operators.spatial import (
        boundary_distance_sql,
        centroid_sql,
    )

    _blat, _blon = centroid_sql("cell", "duckdb")
    out["boundary_distance"] = f"""
WITH {GRID_CELLS_SQL},
pt AS (
  SELECT cell, ({_blon}) * {flit(_sp2._COS0)} AS px, {_blat} AS py
  FROM cells4
)
SELECT cell,
       ROUND(({boundary_distance_sql(_dg.gen_boundaries())}) + 1e-09, 6) AS boundary_dist
FROM pt
""".strip()
    from cuda_gis_smoothing_spark.functions.text import (
        DOC_ENTROPY_SQL,
        ZIPF_FIT_SQL,
        vocab_coverage_sql,
    )

    out["doc_entropy"] = DOC_ENTROPY_SQL
    out["zipf_fit"] = ZIPF_FIT_SQL
    from cuda_gis_smoothing_spark.operators.events import session_stats_sql

    out["session_stats"] = session_stats_sql()
    from cuda_gis_smoothing_spark.operators.events import funnel_latency_sql

    out["funnel_step_latency"] = funnel_latency_sql()
    from cuda_gis_smoothing_spark.functions.text import HEAPS_FIT_SQL

    out["heaps_fit"] = HEAPS_FIT_SQL
    from cuda_gis_smoothing_spark.functions.text import SOURCE_HEAPS_SQL

    out["source_heaps"] = SOURCE_HEAPS_SQL
    # single-batch maintained state == the batch operator exactly
    out["heaps_fit_maintained"] = HEAPS_FIT_SQL
    out["vocab_coverage"] = vocab_coverage_sql()
    from cuda_gis_smoothing_spark.operators.events import (
        EVENT_INTERARRIVAL_SQL,
        EVENT_TRANSITIONS_SQL,
    )

    out["event_transitions"] = EVENT_TRANSITIONS_SQL
    out["event_transitions_maintained"] = EVENT_TRANSITIONS_SQL
    out["event_interarrival"] = EVENT_INTERARRIVAL_SQL
    from cuda_gis_smoothing_spark.operators.events import (
        event_autocorrelation_sql,
    )

    out["event_autocorrelation"] = event_autocorrelation_sql()
    # single-batch maintained state == the batch operator exactly, so
    # the twin is SHARED (the smooth_maintained precedent)
    out["event_autocorrelation_maintained"] = event_autocorrelation_sql()
    from cuda_gis_smoothing_spark.operators.events import (
        daily_anomaly_robust_sql,
    )

    out["events_daily_anomaly_robust"] = daily_anomaly_robust_sql()
    from cuda_gis_smoothing_spark.operators.events import (
        SESSION_PATHS_SQL,
        user_rfm_sql,
    )

    out["session_paths"] = SESSION_PATHS_SQL
    out["user_rfm"] = user_rfm_sql()
    from cuda_gis_smoothing_spark.operators.events import (
        session_event_affinity_sql,
    )

    out["session_event_affinity"] = session_event_affinity_sql()
    from cuda_gis_smoothing_spark.operators.analytics import (
        PROMO_REVENUE_SQL,
        SUPPLIER_BALANCES_SQL,
        late_shipment_sql,
    )

    out["late_shipments"] = late_shipment_sql()
    out["promo_revenue"] = PROMO_REVENUE_SQL
    out["supplier_balances"] = SUPPLIER_BALANCES_SQL
    from cuda_gis_smoothing_spark.operators.analytics import (
        CUSTOMER_ORDER_DISTRIBUTION_SQL,
        PART_QUANTITY_OUTLIERS_SQL,
        big_orders_sql,
        returned_revenue_sql,
        shipping_priority_sql,
    )

    out["shipping_priority"] = shipping_priority_sql()
    out["returned_revenue"] = returned_revenue_sql()
    out["customer_order_distribution"] = CUSTOMER_ORDER_DISTRIBUTION_SQL
    out["part_quantity_outliers"] = PART_QUANTITY_OUTLIERS_SQL
    out["big_orders"] = big_orders_sql()
    from cuda_gis_smoothing_spark.operators.curate import (
        SOURCE_MIXTURE_WEIGHTS_SQL,
    )
    from cuda_gis_smoothing_spark.operators.events import (
        props_field_stats_sql,
    )
    from cuda_gis_smoothing_spark.operators.retrieval import (
        rrf_fuse_topk_sql,
        tfidf_topk_sql,
    )

    # composed from the two rankers' OWN twins — one scoring definition
    out["rrf_fusion"] = rrf_fuse_topk_sql(_bm25_sql(), tfidf_topk_sql())
    out["props_field_stats"] = props_field_stats_sql()
    out["source_mixture_weights"] = SOURCE_MIXTURE_WEIGHTS_SQL
    from cuda_gis_smoothing_spark.operators.curate import (
        SOURCE_MIXTURE_TEMPERATURE_SQL,
    )

    out["source_mixture_temperature"] = SOURCE_MIXTURE_TEMPERATURE_SQL
    from cuda_gis_smoothing_spark.operators.dedup import edit_distance_sql

    out["dedup_edit_distance"] = edit_distance_sql()
    from cuda_gis_smoothing_spark.operators.analytics import (
        key_skew_report_sql,
    )

    out["key_skew_report"] = key_skew_report_sql("events", "user_id")
    from cuda_gis_smoothing_spark.operators.analytics import (
        disjunctive_revenue_sql,
        forecast_revenue_change_sql,
    )

    out["forecast_revenue_change"] = forecast_revenue_change_sql()
    out["disjunctive_revenue"] = disjunctive_revenue_sql()
    from cuda_gis_smoothing_spark.operators.analytics import (
        basket_part_pairs_sql,
    )

    out["basket_part_pairs"] = basket_part_pairs_sql()
    from cuda_gis_smoothing_spark.operators.dedup import (
        winnow_sql,
        winnowed_neardup_sql,
    )

    out["winnowing_fingerprints"] = winnow_sql(_SPAN_GRAM, _WINNOW_W)
    # identical semantics, different Spark path (maintained selection log)
    out["winnowing_maintained"] = out["winnowing_fingerprints"]
    out["dedup_winnowed"] = winnowed_neardup_sql(
        _JACCARD_THRESHOLD, _SPAN_GRAM, _WINNOW_W
    )
    out["cell_quantile_norm"] = f"""
WITH {GRID_CELLS_SQL},
n AS (SELECT COUNT(*) AS n FROM cells4)
SELECT cell, ndvi,
       ROUND(ROW_NUMBER() OVER (ORDER BY ndvi, cell) * 1.0 / n.n + 1e-09, 6) AS ecdf
FROM cells4, n
""".strip()
    out["correlogram"] = f"""
WITH {GRID_CELLS_SQL},
o1 (delta) AS (VALUES {_vals(_R1)}),
o2 (delta) AS (VALUES {_vals(_R2)}),
offs AS (
  SELECT delta, 1 AS ring FROM o1
  UNION ALL
  SELECT delta, 2 AS ring FROM o2
),
mu AS (SELECT AVG(ndvi) AS mu FROM cells4),
dev AS (SELECT cell, ndvi - mu.mu AS d FROM cells4, mu),
cr AS (
  SELECT o.ring, COUNT(*) AS W, SUM(a.d * b.d) AS num
  FROM cells4 c CROSS JOIN offs o
  JOIN cells4 n ON n.cell = c.cell + o.delta
  JOIN dev a ON a.cell = c.cell
  JOIN dev b ON b.cell = n.cell
  GROUP BY o.ring
),
dn AS (SELECT COUNT(*) AS n, SUM(d * d) AS den FROM dev)
SELECT CAST(cr.ring AS INT) AS ring,
       CAST(dn.n AS BIGINT) AS n_cells,
       CAST(cr.W AS BIGINT) AS total_edges,
       ROUND((dn.n * 1.0 / cr.W) * cr.num / dn.den + 1e-09, 6) AS morans_i
FROM cr, dn
""".strip()
    # ONE patch CTE builder (mark/sym/reach/comp) shared by the
    # ndvi_patches and patch_metrics twins — drift-prevention class
    _PATCH_CTES = f"""
offsets (delta) AS (VALUES {_vals(_R1)}),
mu AS (SELECT AVG(ndvi) AS mu FROM cells4),
mark AS (SELECT cell, ndvi FROM cells4, mu WHERE ndvi > mu.mu),
sym AS (
  SELECT c.cell AS a, n.cell AS b
  FROM mark c CROSS JOIN offsets o
  JOIN mark n ON n.cell = c.cell + o.delta
),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
),
comp AS (
  SELECT m.cell, m.ndvi,
         LEAST(m.cell, COALESCE(r.mn, m.cell)) AS patch_id
  FROM mark m
  LEFT JOIN (SELECT a, MIN(b) AS mn FROM reach GROUP BY a) r ON r.a = m.cell
)
""".strip()
    out["ndvi_patches"] = f"""
WITH RECURSIVE {GRID_CELLS_SQL},
{_PATCH_CTES}
SELECT patch_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(AVG(ndvi) + 1e-09, 6) AS mean_ndvi
FROM comp
GROUP BY patch_id
""".strip()
    out["patch_metrics"] = f"""
WITH RECURSIVE {GRID_CELLS_SQL},
{_PATCH_CTES},
psize AS (SELECT patch_id, CAST(COUNT(*) AS BIGINT) AS n_cells FROM comp GROUP BY 1),
pint AS (
  SELECT p.patch_id, CAST(COUNT(*) AS BIGINT) AS ie
  FROM sym s JOIN comp p ON p.cell = s.a GROUP BY 1
)
SELECT s.patch_id, s.n_cells,
       CAST(6 * s.n_cells - COALESCE(i.ie, 0) AS BIGINT) AS perimeter,
       ROUND((CAST(6 * s.n_cells - COALESCE(i.ie, 0) AS DOUBLE)
              / (6e0 * SQRT(CAST(s.n_cells AS DOUBLE)))) + 1e-09, 6) AS shape_index
FROM psize s LEFT JOIN pint i ON i.patch_id = s.patch_id
""".strip()
    out["landscape_summary"] = f"""
WITH RECURSIVE {GRID_CELLS_SQL},
{_PATCH_CTES},
psize AS (SELECT patch_id, CAST(COUNT(*) AS BIGINT) AS n_cells FROM comp GROUP BY 1),
pint AS (
  SELECT p.patch_id, CAST(COUNT(*) AS BIGINT) AS ie
  FROM sym s JOIN comp p ON p.cell = s.a GROUP BY 1
),
pm AS (
  SELECT s.patch_id, s.n_cells,
         CAST(6 * s.n_cells - COALESCE(i.ie, 0) AS BIGINT) AS perimeter
  FROM psize s LEFT JOIN pint i ON i.patch_id = s.patch_id
),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS grid_cells FROM cells4)
SELECT CAST(COUNT(*) AS BIGINT) AS n_patches,
       CAST(SUM(n_cells) AS BIGINT) AS marked_cells,
       CAST(MAX(n_cells) AS BIGINT) AS largest_patch,
       CAST(SUM(perimeter) AS BIGINT) AS total_perimeter,
       ROUND((CAST(MAX(n_cells) AS DOUBLE) / CAST(SUM(n_cells) AS DOUBLE)) + 1e-09, 6) AS lpi,
       ROUND((CAST(SUM(n_cells) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) + 1e-09, 6) AS mean_patch_cells,
       ROUND((CAST(SUM(perimeter) AS DOUBLE) / (6e0 * CAST(g.grid_cells AS DOUBLE))) + 1e-09, 6) AS edge_density
FROM pm CROSS JOIN g
GROUP BY g.grid_cells
""".strip()
    out["smooth_residual_k2"] = smoothing_sql(
        "gaussian_k2",
        ["ndvi"],
        "duckdb",
        source="cells4",
        with_ctes=GRID_CELLS_SQL,
        residual=True,
    )
    from cuda_gis_smoothing_spark.operators.smoothing import BILATERAL_SIGMA

    out["smooth_bilateral_k1"] = smoothing_sql(
        "gaussian_k1",
        ["ndvi"],
        "duckdb",
        source="cells4",
        with_ctes=GRID_CELLS_SQL,
        bilateral_sigma=BILATERAL_SIGMA,
    )
    from cuda_gis_smoothing_spark.operators.smoothing import idw_fill_sql

    out["idw_fill"] = idw_fill_sql(
        source="cells4", with_ctes=GRID_CELLS_SQL
    )
    out["embedding_degree_histogram"] = f"""
WITH pairs AS ({_emb_banded_sql()}),
ends AS (
  SELECT vec_a AS vec_id FROM pairs
  UNION ALL SELECT vec_b AS vec_id FROM pairs
),
deg AS (
  SELECT e.vec_id, CAST(COUNT(p.vec_id) AS BIGINT) AS degree
  FROM embeddings e LEFT JOIN ends p ON p.vec_id = e.vec_id
  GROUP BY e.vec_id
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM deg GROUP BY degree
""".strip()
    out["embedding_triangles"] = f"""
WITH pairs AS ({_emb_banded_sql()}),
e AS (SELECT vec_a, vec_b FROM pairs),
deg AS (
  SELECT v, COUNT(*) AS d FROM (
    SELECT vec_a AS v FROM e UNION ALL SELECT vec_b AS v FROM e
  ) GROUP BY v
),
w AS (SELECT CAST(SUM(d * (d - 1)) // 2 AS BIGINT) AS w FROM deg),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t
  FROM e e1
  JOIN e e2 ON e1.vec_b = e2.vec_a
  JOIN e e3 ON e3.vec_a = e1.vec_a AND e3.vec_b = e2.vec_b
),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e)
SELECT ne.n AS n_edges, w.w AS n_wedges, t.t AS n_triangles,
       ROUND((CASE WHEN w.w > 0 THEN 3e0 * t.t / w.w
                   ELSE CAST(0 AS DOUBLE) END) + 1e-09, 6) AS global_clustering
FROM ne, w, t
""".strip()
    out["embedding_local_clustering"] = f"""
WITH pairs AS ({_emb_banded_sql()}),
e AS (SELECT vec_a, vec_b FROM pairs),
deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT vec_a AS v FROM e UNION ALL SELECT vec_b AS v FROM e
  ) GROUP BY v
),
tri AS (
  SELECT e1.vec_a AS a, e1.vec_b AS b, e2.vec_b AS c
  FROM e e1
  JOIN e e2 ON e1.vec_b = e2.vec_a
  WHERE EXISTS (
    SELECT 1 FROM e e3
    WHERE e3.vec_a = e1.vec_a AND e3.vec_b = e2.vec_b
  )
),
tc AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM (
    SELECT a AS v FROM tri
    UNION ALL SELECT b AS v FROM tri
    UNION ALL SELECT c AS v FROM tri
  ) GROUP BY v
)
SELECT emb.vec_id,
       CAST(COALESCE(deg.d, 0) AS BIGINT) AS degree,
       CAST(COALESCE(tc.t, 0) AS BIGINT) AS n_triangles,
       ROUND((CASE WHEN COALESCE(deg.d, 0) >= 2
              THEN 2e0 * COALESCE(tc.t, 0) / (deg.d * (deg.d - 1))
              ELSE CAST(0 AS DOUBLE) END) + 1e-09, 6) AS local_cc
FROM embeddings emb
LEFT JOIN deg ON deg.v = emb.vec_id
LEFT JOIN tc ON tc.v = emb.vec_id
""".strip()
    out["embedding_kcore"] = _embedding_kcore_sql()
    out["layout_overlap_report"] = _layout_overlap_sql()
    from cuda_gis_smoothing_spark.operators.stats import directional_axes

    _dir_vals = ", ".join(
        f"({delta}, {ring}, {adq}, {adr})"
        for delta, ring, adq, adr in directional_axes(2)
    )
    out["semivariogram_directional"] = f"""
WITH {GRID_CELLS_SQL},
offs (delta, ring, dq, dr) AS (VALUES {_dir_vals})
SELECT CAST(o.ring AS INT) AS ring, CAST(o.dq AS INT) AS dq, CAST(o.dr AS INT) AS dr,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(SUM((c.ndvi - n.ndvi) * (c.ndvi - n.ndvi)) / (2.0 * COUNT(*)) + 1e-09, 6) AS gamma
FROM cells4 c CROSS JOIN offs o
JOIN cells4 n ON n.cell = c.cell + o.delta
GROUP BY o.ring, o.dq, o.dr
""".strip()
    from cuda_gis_smoothing_spark.operators.sampling import (
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        sample_hash_sql,
    )

    out["dataset_split"] = f"""
SELECT doc_id,
       CASE WHEN h < {SPLIT_TRAIN_LT} THEN 'train'
            WHEN h < {SPLIT_VAL_LT} THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, {sample_hash_sql("doc_id")} AS h FROM documents)
""".strip()
    out["embedding_norms"] = """
WITH n AS (
  SELECT embedding::DOUBLE[] AS emb,
         SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(MAX(len(emb)) AS INT) AS n_dims,
       ROUND(MIN(nrm) + 1e-09, 6) AS min_norm,
       ROUND(MAX(nrm) + 1e-09, 6) AS max_norm,
       ROUND(AVG(nrm) + 1e-09, 6) AS avg_norm,
       CAST(SUM(CASE WHEN nrm < 1e-12 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
FROM n
""".strip()
    out["dedup_containment_banded"] = f"""
WITH {tok_cte},
h AS (SELECT doc_id, {th} AS h FROM tok),
sig AS (SELECT doc_id, {mh_aggs} FROM h GROUP BY doc_id),
banded AS (
  {band_union}
),
sz AS (SELECT doc_id, COUNT(*) AS n, LENGTH(bin(COUNT(*))) - 1 AS g FROM tok GROUP BY doc_id),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
  JOIN sz sa ON sa.doc_id = a.doc_id
  JOIN sz sb ON sb.doc_id = b.doc_id
  WHERE ABS(sa.g - sb.g) <= 1
),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN tok a ON a.doc_id = c.doc_a
  JOIN tok b ON b.doc_id = c.doc_b AND b.t = a.t
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       ROUND(i.i * 1.0 / LEAST(sa.n, sb.n) + 1e-09, 6) AS containment
FROM inter i
JOIN sz sa ON sa.doc_id = i.doc_a
JOIN sz sb ON sb.doc_id = i.doc_b
WHERE ROUND(i.i * 1.0 / LEAST(sa.n, sb.n) + 1e-09, 6) >= {_CONTAINMENT_T}
""".strip()
    from cuda_gis_smoothing_spark.operators.similarity import (
        recall_report_sql,
    )

    out["pq_recall_report"] = recall_report_sql(out["knn_cosine"], out["pq_search"])
    out["ivf_recall_report"] = recall_report_sql(out["knn_cosine"], out["knn_ivf"])
    out["ivf_bucket_stats"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (SELECT vec_id, emb, SQRT(list_dot_product(emb, emb)) AS nrm FROM e),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
         emb AS cemb, SQRT(list_dot_product(emb, emb)) AS cnrm
  FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 8)
),
assign AS (
  SELECT n.vec_id, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY list_dot_product(n.emb, c.cemb) / (n.nrm * c.cnrm) DESC, c.cid
         ) AS rk
  FROM n CROSS JOIN cent c
),
bcnt AS (SELECT cid, COUNT(*) AS n_vectors FROM assign WHERE rk = 1 GROUP BY cid),
tot AS (SELECT SUM(n_vectors) * 1.0 AS T FROM bcnt)
SELECT CAST(cent.cid AS INT) AS bucket,
       CAST(COALESCE(bcnt.n_vectors, 0) AS BIGINT) AS n_vectors,
       ROUND(COALESCE(bcnt.n_vectors, 0) / tot.T + 1e-09, 6) AS share
FROM cent LEFT JOIN bcnt ON bcnt.cid = cent.cid, tot
""".strip()
    out["ivf_silhouette"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (SELECT vec_id, emb, SQRT(list_dot_product(emb, emb)) AS nrm FROM e),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
         emb AS cemb, SQRT(list_dot_product(emb, emb)) AS cnrm
  FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 8)
),
assign AS (
  SELECT n.vec_id, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY list_dot_product(n.emb, c.cemb) / (n.nrm * c.cnrm) DESC, c.cid
         ) AS rk
  FROM n CROSS JOIN cent c
),
bkt AS (SELECT vec_id, CAST(cid AS INT) AS bucket FROM assign WHERE rk = 1),
p AS (
  SELECT a.vec_id AS i, b.vec_id AS j,
         1e0 - ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) + 1e-09, 6) AS d
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
),
per AS (
  SELECT p.i, bi.bucket AS bi, bj.bucket AS bj,
         ROUND(AVG(p.d) + 1e-09, 6) AS m
  FROM p JOIN bkt bi ON bi.vec_id = p.i JOIN bkt bj ON bj.vec_id = p.j
  GROUP BY 1, 2, 3
),
own AS (SELECT i, m AS a_mean FROM per WHERE bi = bj),
oth AS (
  SELECT i, m AS b_mean FROM (
    SELECT i, m, ROW_NUMBER() OVER (PARTITION BY i ORDER BY m, bj) AS rk
    FROM per WHERE bi <> bj
  ) WHERE rk = 1
)
SELECT k.vec_id, k.bucket, o.a_mean, t.b_mean,
       CASE WHEN o.a_mean IS NULL OR t.b_mean IS NULL THEN NULL
            WHEN GREATEST(o.a_mean, t.b_mean) = 0 THEN 0e0
            ELSE ROUND((t.b_mean - o.a_mean) / GREATEST(o.a_mean, t.b_mean) + 1e-09, 6)
       END AS silhouette
FROM bkt k
LEFT JOIN own o ON o.i = k.vec_id
LEFT JOIN oth t ON t.i = k.vec_id
""".strip()
    out["feature_hashing"] = f"""
WITH occ AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> ''
),
b AS (SELECT doc_id, {token_hash_sql_duckdb("t")} % {_FEATURE_DIM} AS dim_index FROM occ),
c AS (SELECT doc_id, dim_index, COUNT(*) * 1.0 AS c FROM b GROUP BY 1, 2),
nm AS (SELECT doc_id, SQRT(SUM(c * c)) AS nrm FROM c GROUP BY doc_id)
SELECT c.doc_id, CAST(c.dim_index AS BIGINT) AS dim_index,
       ROUND(c.c / nm.nrm + 1e-09, 6) AS weight
FROM c JOIN nm USING (doc_id)
""".strip()
    _KNN_GRAPH_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (SELECT vec_id, emb, SQRT(list_dot_product(emb, emb)) AS nrm FROM e),
p AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) + 1e-09, 6) AS cosine
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
)
SELECT vec_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT vec_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM p
)
WHERE rank <= 5
""".strip()
    out["knn_graph"] = _KNN_GRAPH_SQL
    from cuda_gis_smoothing_spark.operators.sampling import (
        SPLIT_TRAIN_LT as _TRLT,
        SPLIT_VAL_LT as _VLLT,
        sample_hash_sql as _shs,
    )
    from cuda_gis_smoothing_spark.operators.similarity import KNN_VOTE_K

    # label vote: the knn_graph pair/rank definition restricted to
    # (val -> train) directions over the shared split hash cut
    out["knn_label_vote"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
n AS (SELECT vec_id, emb, label, SQRT(list_dot_product(emb, emb)) AS nrm FROM e),
sp AS (
  SELECT vec_id,
         CASE WHEN {_shs('vec_id')} < {_TRLT} THEN 'train'
              WHEN {_shs('vec_id')} < {_VLLT} THEN 'val'
              ELSE 'test' END AS split
  FROM e
),
p AS (
  SELECT q.vec_id AS val_id, t.vec_id AS train_id, t.label,
         ROUND(list_dot_product(q.emb, t.emb) / (q.nrm * t.nrm) + 1e-09, 6) AS cosine
  FROM n q JOIN sp sq ON sq.vec_id = q.vec_id AND sq.split = 'val'
  JOIN n t ON t.vec_id <> q.vec_id
  JOIN sp st ON st.vec_id = t.vec_id AND st.split = 'train'
  WHERE t.label IS NOT NULL
),
topk AS (
  SELECT val_id, label FROM (
    SELECT val_id, label,
           ROW_NUMBER() OVER (PARTITION BY val_id ORDER BY cosine DESC, train_id) AS rk
    FROM p
  ) WHERE rk <= {KNN_VOTE_K}
),
votes AS (SELECT val_id, label, CAST(COUNT(*) AS BIGINT) AS votes FROM topk GROUP BY 1, 2),
pred AS (
  SELECT val_id, label AS predicted_label, votes,
         ROW_NUMBER() OVER (PARTITION BY val_id ORDER BY votes DESC, label) AS pr
  FROM votes
)
SELECT p.val_id AS vec_id, CAST(e.label AS BIGINT) AS true_label,
       CAST(p.predicted_label AS BIGINT) AS predicted_label, p.votes
FROM pred p JOIN e ON e.vec_id = p.val_id
WHERE p.pr = 1
""".strip()
    out["label_confusion"] = f"""
SELECT true_label, predicted_label, CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM ({out["knn_label_vote"]}) v
GROUP BY 1, 2
""".strip()
    # mutual pairs COMPOSED from the graph twin (the rrf_fusion
    # nested-derived-table precedent — one definition, no drift)
    out["knn_mutual_pairs"] = f"""
WITH g AS (
  SELECT * FROM ({_KNN_GRAPH_SQL})
)
SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b, a.cosine,
       a.rank AS rank_ab, b.rank AS rank_ba
FROM g a JOIN g b ON b.vec_id = a.neighbor_id AND b.neighbor_id = a.vec_id
WHERE a.vec_id < a.neighbor_id
""".strip()
    out["knn_graph_ivf"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (SELECT vec_id, emb, SQRT(list_dot_product(emb, emb)) AS nrm FROM e),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
         emb AS cemb, SQRT(list_dot_product(emb, emb)) AS cnrm
  FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 8)
),
assign AS (
  SELECT n.vec_id, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY list_dot_product(n.emb, c.cemb) / (n.nrm * c.cnrm) DESC, c.cid
         ) AS rk
  FROM n CROSS JOIN cent c
),
bucket AS (SELECT vec_id, cid AS bucket FROM assign WHERE rk = 1),
probe AS (SELECT vec_id, cid AS bucket FROM assign WHERE rk <= 2),
p AS (
  SELECT pr.vec_id AS vec_id, b.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.emb, x.emb) / (q.nrm * x.nrm) + 1e-09, 6) AS cosine
  FROM probe pr
  JOIN bucket b ON b.bucket = pr.bucket AND b.vec_id <> pr.vec_id
  JOIN n q ON q.vec_id = pr.vec_id
  JOIN n x ON x.vec_id = b.vec_id
)
SELECT vec_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT vec_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM p
)
WHERE rank <= 5
""".strip()
    out["source_dedup_stats"] = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
       ROUND(1.0 - COUNT(DISTINCT md5(text)) * 1.0 / COUNT(*) + 1e-09, 6) AS dup_rate
FROM documents WHERE text IS NOT NULL
GROUP BY source
""".strip()
    from cuda_gis_smoothing_spark.operators.events import percentile_sql

    out["quality_deciles"] = percentile_sql(
        out["doc_quality"], "quality_score", _DECILES, out_value="quality"
    )
    from cuda_gis_smoothing_spark.operators.sketches import (
        CMS_ROWS,
        CMS_TOPK,
        cms_hash_sql,
    )

    _cms_ctr_branches = "\n    UNION ALL ".join(
        f"SELECT {j} AS j, {cms_hash_sql('t', j)} AS counter, df FROM counts"
        for j in range(len(CMS_ROWS))
    )
    _cms_probe_branches = "\n    UNION ALL ".join(
        f"SELECT t, df, {j} AS j, {cms_hash_sql('t', j)} AS counter FROM top"
        for j in range(len(CMS_ROWS))
    )
    out["vocab_cms_estimates"] = f"""
WITH {tok_cte},
counts AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY t),
ctr AS (
  SELECT j, counter, CAST(SUM(df) AS BIGINT) AS cnt FROM (
    {_cms_ctr_branches}
  ) GROUP BY j, counter
),
top AS (
  SELECT t, df FROM (
    SELECT t, df, ROW_NUMBER() OVER (ORDER BY df DESC, t ASC) AS r FROM counts
  ) WHERE r <= {CMS_TOPK}
),
probes AS (
    {_cms_probe_branches}
)
SELECT p.t AS token, MAX(p.df) AS df, MIN(c.cnt) AS cms_estimate
FROM probes p JOIN ctr c USING (j, counter)
GROUP BY p.t
""".strip()
    # single-batch maintained counters == the batch sketch exactly, so
    # the twin is SHARED (the smooth_maintained precedent)
    out["vocab_cms_maintained"] = out["vocab_cms_estimates"]
    # composes the gated doc_quality SQL (no feature duplication — the
    # drift-prevention class); join-back supplies source
    out["quality_calibration"] = f"""
WITH q AS ({out["doc_quality"]}),
j AS (
  SELECT d.doc_id, d.source, q.quality_score
  FROM q JOIN documents d USING (doc_id)
  WHERE q.quality_score IS NOT NULL
)
SELECT doc_id, source, quality_score,
       ROUND(cume_dist() OVER (PARTITION BY source ORDER BY quality_score)
             + 1e-09, 6) AS source_quantile
FROM j
""".strip()
    out["cell_edges"] = f"""
WITH {GRID_CELLS_SQL},
o1 (delta) AS (VALUES {_vals(_R1)}),
o2 (delta) AS (VALUES {_vals(_R2)}),
offs AS (
  SELECT delta, 1 AS ring FROM o1
  UNION ALL
  SELECT delta, 2 AS ring FROM o2
)
SELECT c.cell, n.cell AS nbr, CAST(o.ring AS INT) AS ring
FROM cells4 c CROSS JOIN offs o
JOIN cells4 n ON n.cell = c.cell + o.delta
""".strip()
    out["events_daily_anomaly"] = DAILY_ANOMALY_SQL
    out["hotspot_cells"] = f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES {_vals(_R1)}),
loc AS (
  SELECT c.cell,
         COUNT(n.cell) + 1 AS n_local,
         COALESCE(SUM(n.ndvi), 0) + ANY_VALUE(c.ndvi) AS local_sum
  FROM cells4 c CROSS JOIN offsets o
  LEFT JOIN cells4 n ON n.cell = c.cell + o.delta
  GROUP BY c.cell
),
st AS (SELECT AVG(ndvi) AS mu, STDDEV(ndvi) AS sd FROM cells4)
SELECT cell, CAST(n_local AS BIGINT) AS n_local,
       ROUND(local_sum + 1e-09, 6) AS local_sum,
       ROUND((local_sum - n_local * mu) / NULLIF(sd * sqrt(n_local), 0) + 1e-09, 6) AS z_score
FROM loc, st
""".strip()

    out["sequence_packing"] = f"""
WITH d AS (
  SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
p AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prefix
  FROM d
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(prefix // {PACK_SEQ_LEN} AS BIGINT) AS start_seq,
       CAST(prefix % {PACK_SEQ_LEN} AS BIGINT) AS seq_offset
FROM p
""".strip()
    _L = PACK_SEQ_LEN
    out["packing_manifest"] = f"""
WITH d AS (
  SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
p AS (
  -- CAST: DuckDB's windowed SUM(int) is HUGEINT, which
  -- generate_series rejects (the CLAUDE.md SUM->HUGEINT quirk)
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS prefix
  FROM d
),
f AS (
  SELECT doc_id, n_tokens, prefix,
         unnest(generate_series(prefix // {_L}, (prefix + n_tokens - 1) // {_L})) AS seq_id
  FROM p
)
SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
       CAST(GREATEST(seq_id * {_L}, prefix) - prefix AS BIGINT) AS doc_token_start,
       CAST(GREATEST(seq_id * {_L}, prefix) - seq_id * {_L} AS BIGINT) AS seq_token_start,
       CAST(LEAST((seq_id + 1) * {_L}, prefix + n_tokens)
            - GREATEST(seq_id * {_L}, prefix) AS BIGINT) AS n_frag
FROM f
""".strip()
    out["curate_packed"] = f"""
WITH curated AS ({out["curate_corpus"]}),
p AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prefix
  FROM curated
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(prefix // {_L} AS BIGINT) AS start_seq,
       CAST(prefix % {_L} AS BIGINT) AS seq_offset
FROM p
""".strip()
    from cuda_gis_smoothing_spark.operators.dedup import (
        boilerplate_chunks_sql,
        line_dedup_sql,
    )

    out["dedup_lines"] = line_dedup_sql()
    # single-batch maintained state == the batch operator exactly, so
    # the twin is SHARED (the bigram_pmi_maintained precedent)
    out["dedup_lines_maintained"] = line_dedup_sql()
    out["boilerplate_lines"] = boilerplate_chunks_sql()
    out["boilerplate_maintained"] = boilerplate_chunks_sql()
    from cuda_gis_smoothing_spark.operators.analytics import (
        blocking_suppliers_sql,
        idle_customers_sql,
        nation_market_share_sql,
        pricing_summary_sql,
        top_supplier_sql,
        volume_shipping_sql,
    )

    out["blocking_suppliers"] = blocking_suppliers_sql()
    out["idle_customers"] = idle_customers_sql()
    out["nation_market_share"] = nation_market_share_sql()
    from cuda_gis_smoothing_spark.operators.analytics import (
        local_supplier_volume_sql,
    )

    out["local_supplier_volume"] = local_supplier_volume_sql()
    out["pricing_summary"] = pricing_summary_sql()
    out["volume_shipping"] = volume_shipping_sql()
    out["top_supplier"] = top_supplier_sql()
    # single-batch maintained state == the batch operator exactly, so
    # the twin is SHARED (the dedup_lines_maintained precedent)
    out["smooth_maintained"] = smoothing_sql(
        "gaussian_k2", ["ndvi"], "duckdb", source="cells4", with_ctes=GRID_CELLS_SQL
    )
    def _as_q(sql):
        return f"SELECT vec_id AS query_id, neighbor_id FROM ({sql})"

    out["banded_pair_recall"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (SELECT vec_id, emb, SQRT(list_dot_product(emb, emb)) AS nrm FROM e),
xp AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) + 1e-09, 6)
        >= {flit(_EMB_BANDED_THRESHOLD)}
),
bp AS (SELECT vec_a, vec_b FROM ({out["dedup_embedding_banded"]})),
nc AS (SELECT COUNT(*) AS n_common FROM xp JOIN bp USING (vec_a, vec_b)),
ne AS (SELECT COUNT(*) AS n FROM xp),
nb AS (SELECT COUNT(*) AS n FROM bp)
SELECT CAST(ne.n AS BIGINT) AS n_exact_pairs,
       CAST(nb.n AS BIGINT) AS n_banded_pairs,
       CAST(nc.n_common AS BIGINT) AS n_common,
       CASE WHEN ne.n > 0
            THEN ROUND(nc.n_common * 1.0 / ne.n + 1e-09, 6) END AS recall
FROM ne, nb, nc
""".strip()
    out["graph_recall_report"] = recall_report_sql(
        _as_q(out["knn_graph"]), _as_q(out["knn_graph_ivf"])
    )
    out["kmv_error_report"] = f"""
WITH est AS (
  SELECT event_type, est_distinct FROM ({out["kmv_distinct_users"]})
  WHERE event_type IS NOT NULL
),
ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events WHERE event_type IS NOT NULL GROUP BY 1
)
SELECT ex.event_type, ex.exact_distinct, est.est_distinct,
       CASE WHEN ex.exact_distinct > 0
            THEN ROUND((est.est_distinct - ex.exact_distinct) * 1.0
                       / ex.exact_distinct + 1e-09, 6) END AS rel_error
FROM ex JOIN est USING (event_type)
""".strip()
    out["cms_error_report"] = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN cms_estimate > df THEN 1 ELSE 0 END) AS BIGINT) AS n_overestimated,
       CAST(MAX(cms_estimate - df) AS BIGINT) AS max_overestimate,
       ROUND(AVG((cms_estimate - df) * 1.0 / df) + 1e-09, 6) AS mean_rel_overestimate
FROM ({out["vocab_cms_estimates"]}) t
""".strip()
    out["minhash_error_report"] = f"""
WITH {tok_cte},
h AS (SELECT doc_id, {th} AS h FROM tok),
sig AS (SELECT doc_id, {mh_aggs} FROM h GROUP BY doc_id),
banded AS (
  {band_union}
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN tok a ON a.doc_id = c.doc_a
  JOIN tok b ON b.doc_id = c.doc_b AND b.t = a.t
  GROUP BY 1, 2
),
m AS (
  SELECT CAST({" + ".join(f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(6))} AS BIGINT) AS n_matching,
         COALESCE(i.i, 0) AS i,
         sza.n + szb.n - COALESCE(i.i, 0) AS u
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b
  JOIN sz sza ON sza.doc_id = c.doc_a
  JOIN sz szb ON szb.doc_id = c.doc_b
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
)
SELECT n_matching,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(i) AS BIGINT) AS sum_intersect,
       CAST(SUM(u) AS BIGINT) AS sum_union,
       ROUND(n_matching * 1.0 / 6 + 1e-09, 6) AS est_jaccard,
       ROUND(SUM(i) * 1.0 / SUM(u) + 1e-09, 6) AS pooled_jaccard
FROM m
GROUP BY n_matching
""".strip()
    # strict-inequality extrema vs association-order-free min/max:
    # raw-double compares, identical operands both engines
    out["local_extrema"] = f"""
WITH {GRID_CELLS_SQL},
offsets (delta) AS (VALUES {_vals(_R1)}),
nb AS (
  SELECT c.cell, CAST(COUNT(*) AS BIGINT) AS n_neighbors,
         MIN(n.ndvi) AS nmin, MAX(n.ndvi) AS nmax, MIN(c.ndvi) AS x
  FROM cells4 c CROSS JOIN offsets o
  JOIN cells4 n ON n.cell = c.cell + o.delta
  GROUP BY c.cell
)
SELECT cell, n_neighbors,
       CASE WHEN x > nmax THEN 'max'
            WHEN x < nmin THEN 'min'
            ELSE 'other' END AS extremum
FROM nb
""".strip()
    # single-batch maintained state == the batch count table exactly,
    # so the twin is SHARED (the source_kl_maintained precedent)
    out["zipf_fit_maintained"] = ZIPF_FIT_SQL
    from cuda_gis_smoothing_spark.operators.curate import PII_PATTERNS

    _pii_flags = ",\n         ".join(
        f"CASE WHEN text IS NOT NULL AND regexp_matches(lower(text), '{p}')"
        f" THEN 1 ELSE 0 END AS _{k}"
        for k, p in PII_PATTERNS.items()
    )
    _pii_sums = ",\n       ".join(
        f"CAST(SUM(_{k}) AS BIGINT) AS n_{k}" for k in PII_PATTERNS
    )
    _pii_any = " + ".join(f"_{k}" for k in PII_PATTERNS)
    out["pii_scan_report"] = f"""
WITH f AS (
  SELECT source,
         {_pii_flags}
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       {_pii_sums},
       CAST(SUM(CASE WHEN {_pii_any} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM f
GROUP BY source
""".strip()
    from cuda_gis_smoothing_spark.operators.events import (
        transition_stationary_sql,
    )

    out["transition_stationary"] = transition_stationary_sql()
    # single-batch maintained matrix == the batch matrix exactly →
    # shared twin (the zipf_fit_maintained precedent)
    out["transition_stationary_maintained"] = transition_stationary_sql()
    out["zonal_majority"] = _zonal_majority_sql()
    out["zonal_crosstab"] = _zonal_crosstab_sql()
    # both π and P nested from their own gated SQLs (round-first
    # layering — the rrf_fusion composition precedent)
    out["transition_entropy_rate"] = f"""
WITH pi AS (
  SELECT event_type, stationary_p FROM ({transition_stationary_sql()})
),
tm AS (
  SELECT from_type, to_type, p_transition FROM ({EVENT_TRANSITIONS_SQL})
  WHERE from_type IS NOT NULL AND to_type IS NOT NULL
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pi) AS n_states,
       ROUND(-SUM(pi.stationary_p * tm.p_transition * ln(tm.p_transition))
             + 1e-09, 6) AS entropy_rate
FROM tm JOIN pi ON pi.event_type = tm.from_type
""".strip()
    from cuda_gis_smoothing_spark.operators.events import (
        EVENTS_BURSTINESS_SQL,
    )

    out["events_burstiness"] = EVENTS_BURSTINESS_SQL
    from cuda_gis_smoothing_spark.operators.events import USER_BURSTINESS_SQL

    out["user_burstiness"] = USER_BURSTINESS_SQL
    # single-batch maintained state == the batch operator exactly
    out["user_burstiness_maintained"] = USER_BURSTINESS_SQL
    # additive counts: maintained state == batch daily table exactly
    out["events_burstiness_maintained"] = EVENTS_BURSTINESS_SQL
    from cuda_gis_smoothing_spark.operators.hydrology import (
        FILL_ROUNDS,
        fill_sinks_sql,
    )

    out["fill_sinks"] = f"""
WITH {GRID_CELLS_SQL},
{fill_sinks_sql()}
SELECT f.cell,
       CASE WHEN f.w < 1000000000.0 THEN f.w END AS filled_level,
       CASE WHEN f.w < 1000000000.0 THEN f.w - b.z END AS fill_depth
FROM w{FILL_ROUNDS} f JOIN fs_b b ON b.cell = f.cell
""".strip()
    out["flow_direction_filled"] = f"""
WITH {GRID_CELLS_SQL},
{fill_sinks_sql()},
filled AS (SELECT f.cell, f.w AS ndvi FROM w{FILL_ROUNDS} f WHERE f.w < 1000000000.0),
{flow_ctes(source="filled")}
SELECT cell, flow_to, ROUND(descent_raw + 1e-09, 6) AS descent
FROM fd
""".strip()
    from cuda_gis_smoothing_spark.operators.curate import DOC_NOVELTY_K

    _nk = DOC_NOVELTY_K
    out["doc_novelty"] = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, len(string_split(lower(text), ' ')) - {_nk - 1}),
             i -> array_to_string((string_split(lower(text), ' '))[i:i+{_nk - 1}], ' '))) AS shingle
    FROM documents
    WHERE len(string_split(lower(text), ' ')) >= {_nk}
  )
),
fst AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle)
SELECT sh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN fst.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       ROUND(SUM(CASE WHEN fst.first_doc = sh.doc_id THEN 1 ELSE 0 END) * 1.0
             / COUNT(*) + 1e-09, 6) AS novelty
FROM sh JOIN fst USING (shingle)
GROUP BY sh.doc_id
""".strip()
    from cuda_gis_smoothing_spark.operators.hydrology import (
        STRAHLER_ROUNDS,
        strahler_ctes,
    )

    out["stream_order"] = f"""
WITH {GRID_CELLS_SQL},
{flow_ctes()},
{strahler_ctes()}
SELECT cell, ord AS strahler_order FROM o{STRAHLER_ROUNDS}
""".strip()
    from cuda_gis_smoothing_spark.operators.stats import landform_classes_sql

    out["landform_classes"] = landform_classes_sql(
        source="cells4", with_ctes=GRID_CELLS_SQL
    )
    from cuda_gis_smoothing_spark.operators.stats import terrain_openness_sql

    out["terrain_openness"] = terrain_openness_sql(
        source="cells4", with_ctes=GRID_CELLS_SQL
    )
    from cuda_gis_smoothing_spark.operators.events import (
        USER_EVENT_ENTROPY_SQL,
    )

    out["user_event_entropy"] = USER_EVENT_ENTROPY_SQL
    # single-batch maintained state == the batch operator exactly, so
    # the twin is SHARED (the smooth_maintained precedent)
    out["user_event_entropy_maintained"] = USER_EVENT_ENTROPY_SQL
    from cuda_gis_smoothing_spark.operators.events import (
        user_activity_zipf_sql,
    )

    out["user_activity_zipf"] = user_activity_zipf_sql()
    from cuda_gis_smoothing_spark.functions.text import doc_readability_sql

    out["doc_readability"] = doc_readability_sql()
    from cuda_gis_smoothing_spark.operators.hydrology import (
        STREAM_NETWORKS_SELECT,
        stream_network_ctes,
    )

    out["stream_networks"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
{stream_network_ctes()}
{STREAM_NETWORKS_SELECT}
""".strip()
    from cuda_gis_smoothing_spark.operators.dedup import (
        embedding_assortativity_sql,
    )

    out["embedding_assortativity"] = embedding_assortativity_sql(
        _emb_banded_sql()
    )
    from cuda_gis_smoothing_spark.operators.similarity import (
        split_centroid_drift_sql,
    )

    out["split_centroid_drift"] = split_centroid_drift_sql()
    # single-batch maintained state == the batch operator exactly, so
    # the twin is SHARED (the cost_distance_maintained precedent)
    out["stream_networks_maintained"] = out["stream_networks"]
    from cuda_gis_smoothing_spark.operators.analytics import (
        shipping_lag_percentiles_sql,
    )

    out["shipping_lag_percentiles"] = shipping_lag_percentiles_sql()
    from cuda_gis_smoothing_spark.operators.stats import median_filter_sql

    out["median_filter"] = median_filter_sql(
        source="cells4", with_ctes=GRID_CELLS_SQL
    )
    from cuda_gis_smoothing_spark.operators.curate import pii_redact_sql

    out["pii_redact"] = pii_redact_sql()
    from cuda_gis_smoothing_spark.operators.events import (
        ACTIVE_USERS_WEEKLY_SQL,
    )

    out["active_users_weekly"] = ACTIVE_USERS_WEEKLY_SQL
    from cuda_gis_smoothing_spark.operators.analytics import (
        supplier_part_variety_sql,
    )

    out["supplier_part_variety"] = supplier_part_variety_sql()
    from cuda_gis_smoothing_spark import datagen
    from cuda_gis_smoothing_spark.operators.events import percentile_sql as _psql
    from cuda_gis_smoothing_spark.operators.events import PCT_QS as _PCTQ
    from cuda_gis_smoothing_spark.operators.spatial import (
        centroid_sql,
        pip_region_sql,
    )

    _zlat, _zlon = centroid_sql("cell", "duckdb")
    _zcase = pip_region_sql("pt.lat", "pt.lon", datagen.gen_boundaries())
    # nested WITH inside the kernel's derived table — the rrf_fusion
    # nesting precedent
    out["zonal_quantiles"] = _psql(
        f"""WITH {GRID_CELLS_SQL},
pt AS (SELECT cell, ndvi, {_zlat} AS lat, {_zlon} AS lon FROM cells4)
SELECT {_zcase} AS region_id, ndvi FROM pt""",
        "ndvi",
        _PCTQ,
        group_cols=("region_id",),
        out_value="ndvi_q",
    )
    out["grid_upsample"] = f"""
WITH {GRID_CELLS_SQL},
upc AS (
  SELECT ((cell // {ENC}) // 2) * {ENC} + ((cell % {ENC}) // 2) AS coarse_cell,
         ROUND(AVG(ndvi) + 1e-09, 6) AS coarse_mean
  FROM cells4 GROUP BY 1
),
upf AS (
  SELECT cell,
         ((cell // {ENC}) // 2) * {ENC} + ((cell % {ENC}) // 2) AS coarse_cell,
         ROUND(ndvi + 1e-09, 6) AS value
  FROM cells4
)
SELECT f.cell, f.coarse_cell, f.value, c.coarse_mean,
       ROUND((f.value - c.coarse_mean) + 1e-09, 6) AS residual
FROM upf f JOIN upc c ON c.coarse_cell = f.coarse_cell
""".strip()
    from cuda_gis_smoothing_spark.operators.analytics import (
        revenue_concentration_sql,
        value_benford_sql,
    )

    out["value_benford"] = value_benford_sql()
    out["revenue_concentration"] = revenue_concentration_sql()
    from cuda_gis_smoothing_spark.operators.analytics import (
        join_size_report_sql,
    )

    out["join_size_report"] = join_size_report_sql()
    from cuda_gis_smoothing_spark.operators.sketches import heavy_hitters_sql

    out["heavy_hitters"] = heavy_hitters_sql(tok_cte)
    from cuda_gis_smoothing_spark.operators.analytics import (
        value_winsorized_sql,
    )

    out["value_winsorized"] = value_winsorized_sql()
    from cuda_gis_smoothing_spark.operators.sampling import epoch_shuffle_sql

    out["epoch_shuffle"] = epoch_shuffle_sql()
    # single-batch maintained router state == the batch operator
    # exactly (the cost_distance_maintained precedent) — SHARED twin
    out["flow_load_maintained"] = out["flow_load"]
    from cuda_gis_smoothing_spark.operators.events import SESSION_BOUNCE_SQL

    out["session_bounce"] = SESSION_BOUNCE_SQL
    from cuda_gis_smoothing_spark.functions.text import SOURCE_DIVERSITY_SQL

    out["source_diversity"] = SOURCE_DIVERSITY_SQL
    from cuda_gis_smoothing_spark.operators.events import DAILY_KENDALL_TAU_SQL

    out["daily_kendall_tau"] = DAILY_KENDALL_TAU_SQL
    from cuda_gis_smoothing_spark.functions.numeric import flit as _flit
    from cuda_gis_smoothing_spark.operators.sampling import (
        QW_QUANTILE_FRACTIONS,
    )

    _fr_vals = ", ".join(f"({_flit(f)})" for f in QW_QUANTILE_FRACTIONS)
    out["quality_weighted_quantiles"] = f"""
WITH q AS ({out["doc_quality"]}),
lv AS (
  SELECT quality_score, CAST(SUM(n_tokens) AS BIGINT) AS w
  FROM q WHERE n_tokens IS NOT NULL GROUP BY quality_score
),
c AS (
  SELECT quality_score,
         CAST(SUM(w) OVER (ORDER BY quality_score
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cw
  FROM lv
),
tot AS (SELECT CAST(SUM(w) AS DOUBLE) AS W FROM lv),
fr (fraction) AS (VALUES {_fr_vals})
SELECT fr.fraction, MIN(c.quality_score) AS weighted_quality
FROM c CROSS JOIN tot CROSS JOIN fr
WHERE c.cw >= fr.fraction * tot.W
GROUP BY fr.fraction
""".strip()
    from cuda_gis_smoothing_spark.operators.events import (
        DAILY_RUNS_TEST_SQL,
        event_type_lift_sql,
    )

    out["event_type_lift"] = event_type_lift_sql()
    out["daily_runs_test"] = DAILY_RUNS_TEST_SQL
    out["zonal_diversity"] = _zonal_diversity_sql()
    # single-batch maintained state == the batch operator exactly
    # (the events_seasonality_maintained precedent) — SHARED twins
    out["daily_kendall_tau_maintained"] = out["daily_kendall_tau"]
    out["daily_runs_test_maintained"] = out["daily_runs_test"]
    out["event_type_lift_maintained"] = out["event_type_lift"]
    from cuda_gis_smoothing_spark.operators.dedup import (
        winnow_ctes as _winnow_ctes,
    )

    # the rrf_fusion precedent: family pair sets composed from their
    # OWN gated twins via nested-WITH derived tables; exact truth is
    # the unblocked form of the ngram_jaccard twin (no lang equi-key)
    out["candidate_family_report"] = f"""
WITH mh AS (SELECT doc_a, doc_b FROM ({out["minhash_lsh"]}) q),
sh AS (SELECT doc_a, doc_b FROM ({out["simhash_pairs"]}) q),
wn AS (SELECT doc_a, doc_b FROM (
  WITH {_winnow_ctes(_SPAN_GRAM, _WINNOW_W)},
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM wfp a JOIN wfp b
      ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
  )
  SELECT doc_a, doc_b FROM cand) q),
tok AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> ''
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
exact AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sz sa ON sa.doc_id = doc_a
  JOIN sz sb ON sb.doc_id = doc_b
  WHERE ROUND(i * 1.0 / (sa.n + sb.n - i) + 1e-09, 6) >= {_JACCARD_THRESHOLD}
),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs FROM exact),
fam AS (
  SELECT 'minhash_lsh' AS family, doc_a, doc_b FROM mh
  UNION ALL SELECT 'simhash_banded', doc_a, doc_b FROM sh
  UNION ALL SELECT 'winnowing', doc_a, doc_b FROM wn
),
per AS (
  SELECT family,
         CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(SUM(CASE WHEN e.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_true
  FROM fam f LEFT JOIN exact e ON e.doc_a = f.doc_a AND e.doc_b = f.doc_b
  GROUP BY family
)
SELECT family, n_candidates, n_exact_pairs, n_true,
       ROUND(CAST(n_true AS DOUBLE)
             / NULLIF(CAST(n_candidates AS DOUBLE), 0) + 1e-09, 6)
         AS pair_precision,
       ROUND(CAST(n_true AS DOUBLE)
             / NULLIF(CAST(n_exact_pairs AS DOUBLE), 0) + 1e-09, 6)
         AS pair_recall
FROM per CROSS JOIN ne
""".strip()
    # maintained state sum/n recovers ndvi exactly for a single batch
    # with n=1 partials (the smooth_maintained precedent) — SHARED twin
    out["zonal_stats_maintained"] = out["zonal_stats"]
    from cuda_gis_smoothing_spark.operators.hydrology import (
        stream_junctions_sql,
    )

    out["stream_junctions"] = f"""
WITH RECURSIVE {_FLOW},
{flow_closure_ctes()},
{stream_junctions_sql()}
""".strip()
    out["embedding_pagerank"] = _embedding_pagerank_sql()
    from cuda_gis_smoothing_spark.operators.analytics import customer_rfm_sql

    out["customer_rfm"] = customer_rfm_sql()
    from cuda_gis_smoothing_spark.functions.text import SOURCE_TOKEN_GINI_SQL

    out["source_token_gini"] = SOURCE_TOKEN_GINI_SQL
    from cuda_gis_smoothing_spark.operators.analytics import (
        COHORT_REVENUE_SQL,
        order_gap_days_sql,
    )

    out["cohort_revenue"] = COHORT_REVENUE_SQL
    out["order_gap_days"] = order_gap_days_sql()
    # riparian gradient: the stream_distance twin nested as a derived
    # table (the rrf_fusion precedent), grouped by distance band
    out["riparian_zones"] = f"""
WITH sd AS (SELECT cell, stream_dist FROM ({out["stream_distance"]}) q),
{GRID_CELLS_SQL}
SELECT sd.stream_dist,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(AVG(c.ndvi) + 1e-09, 6) AS mean_ndvi
FROM sd JOIN cells4 c USING (cell)
GROUP BY sd.stream_dist
""".strip()
    # single-batch maintained state == the batch operator exactly —
    # SHARED twins (the source_kl_maintained / flow_load precedents)
    out["source_diversity_maintained"] = out["source_diversity"]
    out["stream_junctions_maintained"] = out["stream_junctions"]
    from cuda_gis_smoothing_spark.operators.analytics import (
        waiting_suppliers_sql,
    )

    out["waiting_suppliers"] = waiting_suppliers_sql()
    from cuda_gis_smoothing_spark.operators.analytics import nation_profit_sql

    out["nation_profit"] = nation_profit_sql()
    from cuda_gis_smoothing_spark.operators.analytics import part_similarity_sql

    out["part_similarity"] = part_similarity_sql()
    from cuda_gis_smoothing_spark.operators.analytics import (
        part_recommendations_sql,
    )

    out["part_recommendations"] = part_recommendations_sql()
    # neighbor lists served from maintained co-purchase counts == the
    # batch operator exactly (SHARED twin — the smooth_maintained class)
    out["part_similarity_maintained"] = out["part_similarity"]
    out["part_recommendations_maintained"] = out["part_recommendations"]
    from cuda_gis_smoothing_spark.operators.analytics import (
        customer_similarity_sql,
    )

    out["customer_similarity"] = customer_similarity_sql()
    from cuda_gis_smoothing_spark.operators.analytics import (
        source_similarity_sql,
    )

    out["source_similarity"] = source_similarity_sql()
    out["part_pagerank"] = _part_pagerank_sql()
    from cuda_gis_smoothing_spark.operators.analytics import (
        customer_recommendations_sql,
    )

    out["customer_recommendations"] = customer_recommendations_sql()
    # per-component census over the SAME banded pair SQL under the
    # embedding_components recursive closure; density is one double
    # division of exact int64s
    out["embedding_component_density"] = f"""
WITH RECURSIVE pairs AS ({_emb_banded_sql()}),
edges AS (SELECT vec_a AS a, vec_b AS b FROM pairs),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
),
verts AS (
  -- explicit DISTINCT: inside a WITH RECURSIVE list DuckDB 1.0 runs a
  -- non-recursive member's bare UNION as UNION ALL (measured 498 vs
  -- 293 rows) — never rely on UNION dedup for a COUNTED CTE there
  SELECT DISTINCT v FROM (
    SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
  )
),
lab AS (
  SELECT v, LEAST(v, COALESCE(r.mn, v)) AS component
  FROM verts
  LEFT JOIN (SELECT a, MIN(b) AS mn FROM reach GROUP BY a) r ON r.a = verts.v
),
mem AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members FROM lab GROUP BY 1
),
ed AS (
  SELECT l.component, CAST(COUNT(*) AS BIGINT) AS n_edges
  FROM edges g JOIN lab l ON l.v = g.a GROUP BY 1
)
SELECT mem.component, mem.n_members, ed.n_edges,
       ROUND(2.0 * ed.n_edges
             / (mem.n_members * (mem.n_members - 1)) + 1e-09, 6) AS density
FROM mem JOIN ed USING (component)
""".strip()
    # threshold sweep: one recursive-closure census per cutoff over the
    # SAME banded SQL (explicit DISTINCT verts — the WITH-RECURSIVE
    # bare-UNION class), unioned into the card
    from cuda_gis_smoothing_spark.functions.numeric import flit

    sweep_parts = []
    for _t in _SWEEP_THRESHOLDS:
        sweep_parts.append(f"""SELECT * FROM (
WITH RECURSIVE pairs AS ({_emb_banded_sql(threshold=_t)}),
edges AS (SELECT vec_a AS a, vec_b AS b FROM pairs),
sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
),
verts AS (
  SELECT DISTINCT v FROM (
    SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
  )
),
lab AS (
  SELECT v, LEAST(v, COALESCE(r.mn, v)) AS component
  FROM verts
  LEFT JOIN (SELECT a, MIN(b) AS mn FROM reach GROUP BY a) r ON r.a = verts.v
),
sizes AS (SELECT component, COUNT(*) AS sz FROM lab GROUP BY 1),
summ AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_components,
         CAST(COALESCE(SUM(sz), 0) AS BIGINT) AS n_clustered,
         CAST(COALESCE(MAX(sz), 0) AS BIGINT) AS largest_component
  FROM sizes
),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM edges)
SELECT CAST({flit(_t)} AS DOUBLE) AS threshold, np.n_pairs, summ.n_clustered,
       summ.n_components, summ.largest_component,
       CAST(summ.n_clustered - summ.n_components AS BIGINT) AS drop_count
FROM np, summ
)""")
    out["dedup_threshold_sweep"] = "\nUNION ALL\n".join(sweep_parts).strip()
    return out


def _zonal_diversity_sql() -> str:
    # integer counts via the SHARED zone-class chain; Simpson sums as
    # integer-valued doubles; Shannon via H = ln(N) − (Σ c·ln c)/N
    # over ≤ #classes terms (ln ≤1-ulp)
    return f"""
WITH {GRID_CELLS_SQL},
{_zone_class_cnt_ctes()},
agg AS (
  SELECT region_id,
         CAST(SUM(n_cells) AS BIGINT) AS n_cells,
         CAST(COUNT(*) AS BIGINT) AS n_classes,
         SUM(CAST(n_cells AS DOUBLE) * (n_cells - 1)) AS rep,
         SUM(CAST(n_cells AS DOUBLE) * ln(CAST(n_cells AS DOUBLE))) AS clnc
  FROM cnt GROUP BY region_id
)
SELECT region_id, n_cells, n_classes,
       ROUND(rep / NULLIF(CAST(n_cells AS DOUBLE) * (n_cells - 1), 0) + 1e-09, 6)
         AS simpson,
       ROUND(ln(CAST(n_cells AS DOUBLE)) - clnc / CAST(n_cells AS DOUBLE)
             + 1e-09, 6) AS shannon
FROM agg
""".strip()


def _source_overlap_minhash_sql() -> str:
    from cuda_gis_smoothing_spark.functions.numeric import flit
    from cuda_gis_smoothing_spark.operators.curate import _overlap_affine_pairs
    from cuda_gis_smoothing_spark.operators.dedup import (
        MH_PRIME,
        token_hash_sql_duckdb,
    )

    n = _OVERLAP_MH_N
    pairs = _overlap_affine_pairs(n)
    th = token_hash_sql_duckdb("shingle")
    mins = ",\n       ".join(
        f"MIN((h * {a} + {b}) % {MH_PRIME}) AS mh_{i}"
        for i, (a, b) in enumerate(pairs)
    )
    match = " + ".join(
        f"CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END" for i in range(n)
    )
    return f"""
WITH sh AS (
  SELECT source,
         unnest(list_transform(
           generate_series(1, greatest(len(string_split(lower(text), ' ')) - {_OVERLAP_K - 1}, 0)),
           i -> array_to_string((string_split(lower(text), ' '))[i:i+{_OVERLAP_K - 1}], ' '))) AS shingle
  FROM documents
),
h AS (SELECT source, {th} AS h FROM sh),
sig AS (SELECT source,
       {mins}
       FROM h GROUP BY source)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(({match}) AS BIGINT) AS n_matching_hashes,
       ROUND(({match}) * {flit(1.0)} / {flit(float(n))} + 1e-09, 6) AS est_jaccard
FROM sig a JOIN sig b ON a.source < b.source
""".strip()


def _span_ctes(source: str, g: int) -> str:
    """CTE chain ``toks → pos → seed → runs → spans`` implementing
    duplicate_spans' gram-seed + per-diagonal islands-and-gaps merge
    over relation ``source`` — ONE builder shared by the
    duplicate_spans, span_coverage and curate_corpus_strict twins so a
    fix to the sweep can never silently diverge between gates; the
    gram extraction itself comes from the shared ``gram_pos_ctes``
    (also the winnowing family's)."""
    from cuda_gis_smoothing_spark.operators.dedup import gram_pos_ctes

    return f"""{gram_pos_ctes(source, g)},
seed AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
  FROM pos a JOIN pos b ON a.g = b.g AND a.doc_id < b.doc_id
),
runs AS (
  SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
         pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS grp
  FROM seed
),
spans AS (
  SELECT doc_a, doc_b, MIN(pos_a) AS start_a, MIN(pos_b) AS start_b,
         COUNT(*) + {g - 1} AS span_tokens
  FROM runs GROUP BY doc_a, doc_b, diag, grp
)"""


def _coverage_ctes() -> str:
    """CTE chain ``iv → mark → isl → cov`` reducing ``spans`` to
    per-doc covered-token mass (interval union). The DISTINCT in
    ``iv`` makes the window ORDER BY total — without it DuckDB's two
    window passes can permute tied duplicate rows between sorts and
    over-merge islands (see operators/dedup.py::span_coverage)."""
    return """iv AS (
  SELECT DISTINCT doc_id, s, e FROM (
    SELECT doc_a AS doc_id, start_a AS s, start_a + span_tokens - 1 AS e FROM spans
    UNION ALL
    SELECT doc_b AS doc_id, start_b AS s, start_b + span_tokens - 1 AS e FROM spans
  )
),
mark AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
isl AS (
  SELECT doc_id, s, e,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM mark
),
cov AS (
  SELECT doc_id, SUM(mx - mn + 1) AS covered
  FROM (SELECT doc_id, island, MIN(s) AS mn, MAX(e) AS mx FROM isl GROUP BY 1, 2)
  GROUP BY 1
)"""


def _curate_strict_sql(q_sql: str, l_sql: str, rep_sql: str) -> str:
    from cuda_gis_smoothing_spark.functions.numeric import flit
    from cuda_gis_smoothing_spark.operators.curate import (
        CURATE_LANG,
        CURATE_MAX_DUP_RATIO,
        CURATE_MAX_SPAN_COV,
        CURATE_MIN_QUALITY,
        CURATE_SAMPLE_F,
        CURATE_SPAN_GRAM,
    )
    from cuda_gis_smoothing_spark.operators.sampling import (
        _DENOM,
        sample_hash_sql,
    )

    g = CURATE_SPAN_GRAM
    return f"""
WITH q AS ({q_sql}),
l AS ({l_sql}),
rep AS ({rep_sql}),
base AS (
  SELECT d.doc_id, d.text, q.n_tokens, q.quality_score
  FROM documents d JOIN q USING (doc_id) JOIN l USING (doc_id) JOIN rep USING (doc_id)
  WHERE l.pred_lang = '{CURATE_LANG}'
    AND q.quality_score >= {flit(CURATE_MIN_QUALITY)}
    AND rep.dup_token_ratio <= {flit(CURATE_MAX_DUP_RATIO)}
),
canon AS (SELECT MIN(doc_id) AS doc_id FROM base GROUP BY md5(text)),
kept AS (SELECT b.* FROM base b JOIN canon USING (doc_id)),
{_span_ctes("kept", g)},
{_coverage_ctes()}
SELECT k.doc_id, k.n_tokens, k.quality_score
FROM kept k LEFT JOIN cov c USING (doc_id)
WHERE ROUND(COALESCE(c.covered, 0) * 1e0 / k.n_tokens + 1e-09, 6) <= {flit(CURATE_MAX_SPAN_COV)}
  AND {sample_hash_sql("k.doc_id")} < {int(CURATE_SAMPLE_F * _DENOM)}
""".strip()


def _bm25_sql() -> str:
    from cuda_gis_smoothing_spark.functions.numeric import flit
    from cuda_gis_smoothing_spark.operators.retrieval import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        BM25_TOPK_K,
        check_terms,
    )

    check_terms(BM25_TERMS)  # terms are interpolated below
    k1, b = flit(BM25_K1), flit(BM25_B)
    half = flit(0.5)
    tf_cols = ",\n         ".join(
        f"len(list_filter(string_split(lower(text), ' '), x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) * {flit(1.0)} AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    contrib = " + ".join(
        f"ln({flit(1.0)} + (st.N - st.df_{i} + {half}) / (st.df_{i} + {half}))"
        f" * (per.tf_{i} * ({k1} + {flit(1.0)}))"
        f" / (per.tf_{i} + {k1} * ({flit(1.0)} - {b} + {b} * per.n_tokens / st.avgdl))"
        for i in range(len(BM25_TERMS))
    )
    return f"""
WITH per AS (
  SELECT doc_id,
         len(string_split(lower(text), ' ')) AS n_tokens,
         {tf_cols}
  FROM documents
),
st AS (SELECT COUNT(*) * {flit(1.0)} AS N,
              AVG(n_tokens * {flit(1.0)}) AS avgdl,
              {df_cols}
       FROM per)
SELECT per.doc_id, CAST(per.n_tokens AS BIGINT) AS n_tokens,
       ROUND(({contrib}) + 1e-09, 6) AS bm25
FROM per, st
ORDER BY bm25 DESC, per.doc_id
LIMIT {BM25_TOPK_K}
""".strip()


def _bm25_search_sql() -> str:
    from cuda_gis_smoothing_spark.functions.numeric import flit
    from cuda_gis_smoothing_spark.operators.retrieval import (
        BM25_B,
        BM25_K1,
        check_terms,
    )

    check_terms(t for _, t in _BM25_QUERIES)  # interpolated into VALUES
    k1, b, half, one = flit(BM25_K1), flit(BM25_B), flit(0.5), flit(1.0)
    vals = ", ".join(
        f"(CAST({q} AS BIGINT), '{t}')" for q, t in _BM25_QUERIES
    )
    return f"""
WITH qt (query_id, term) AS (VALUES {vals}),
toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
post AS (SELECT doc_id, term, COUNT(*) * {one} AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, len(string_split(lower(text), ' ')) * {one} AS dl
       FROM documents WHERE text IS NOT NULL),
st AS (SELECT COUNT(*) * {one} AS N, AVG(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, COUNT(*) * {one} AS df FROM post GROUP BY 1),
contrib AS (
  SELECT qt.query_id, post.doc_id,
         ln({one} + (st.N - dfreq.df + {half}) / (dfreq.df + {half}))
         * (post.tf * ({k1} + {one}))
         / (post.tf + {k1} * ({one} - {b} + {b} * dl.dl / st.avgdl)) AS c
  FROM qt
  JOIN post USING (term)
  JOIN dfreq USING (term)
  JOIN dl ON dl.doc_id = post.doc_id, st
),
scored AS (
  SELECT query_id, doc_id, ROUND(SUM(c) + 1e-09, 6) AS bm25
  FROM contrib GROUP BY 1, 2
)
SELECT query_id, doc_id, bm25 FROM (
  SELECT query_id, doc_id, bm25,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rk
  FROM scored
)
WHERE rk <= 10
""".strip()


def _pip_sql() -> str:
    from cuda_gis_smoothing_spark import datagen
    from cuda_gis_smoothing_spark.operators.spatial import centroid_sql, pip_region_sql

    lat, lon = centroid_sql("cell", "duckdb")
    case = pip_region_sql("pt.lat", "pt.lon", datagen.gen_boundaries())
    return f"""
WITH {GRID_CELLS_SQL},
pt AS (SELECT cell, {lat} AS lat, {lon} AS lon FROM cells4)
SELECT cell, {case} AS region_id
FROM pt
""".strip()


def _zonal_sql() -> str:
    from cuda_gis_smoothing_spark import datagen
    from cuda_gis_smoothing_spark.operators.spatial import centroid_sql, pip_region_sql

    lat, lon = centroid_sql("cell", "duckdb")
    case = pip_region_sql("pt.lat", "pt.lon", datagen.gen_boundaries())
    return f"""
WITH {GRID_CELLS_SQL},
pt AS (SELECT cell, ndvi, {lat} AS lat, {lon} AS lon FROM cells4),
z AS (SELECT ndvi, {case} AS region_id FROM pt)
SELECT region_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(AVG(ndvi) + 1e-09, 6) AS mean_ndvi,
       MIN(ndvi) AS min_ndvi,
       MAX(ndvi) AS max_ndvi
FROM z
GROUP BY region_id
""".strip()


def _zonal_majority_sql() -> str:
    from cuda_gis_smoothing_spark import datagen
    from cuda_gis_smoothing_spark.operators.spatial import (
        centroid_sql,
        pip_region_sql,
    )

    lat, lon = centroid_sql("cell", "duckdb")
    case = pip_region_sql("pt.lat", "pt.lon", datagen.gen_boundaries())
    # the window ORDER BY is a TOTAL order per zone (cls unique in the
    # count table) — the span_coverage tied-window lesson doesn't bind
    return f"""
WITH {GRID_CELLS_SQL},
pt AS (SELECT CAST(FLOOR(ndvi * 8 + 1e-09) AS BIGINT) AS cls,
              {lat} AS lat, {lon} AS lon FROM cells4),
z AS (SELECT cls, {case} AS region_id FROM pt),
cnt AS (SELECT region_id, cls, COUNT(*) AS n FROM z GROUP BY 1, 2)
SELECT region_id, cls AS mode_class, CAST(n AS BIGINT) AS mode_count,
       CAST(t AS BIGINT) AS n_cells
FROM (
  SELECT region_id, cls, n, SUM(n) OVER (PARTITION BY region_id) AS t,
         ROW_NUMBER() OVER (PARTITION BY region_id ORDER BY n DESC, cls ASC) AS rk
  FROM cnt
)
WHERE rk = 1
""".strip()


def _layout_overlap_sql() -> str:
    """Twin of layout_overlap_report — identical integer bucket
    assignment (affine hash / cell / morton keys, width-division via
    ``//`` on non-negative ints == Spark ``div``), integer zone maps,
    two exact-integer-ratio divisions under round6."""
    from cuda_gis_smoothing_spark.operators.sampling import sample_hash_sql
    from cuda_gis_smoothing_spark.operators.stats import LAYOUT_BUCKETS
    from cuda_gis_smoothing_spark.plans.partitioning import morton_sql

    B = LAYOUT_BUCKETS
    sel = ", ".join(
        f"LEAST({B - 1}, (({k} - {lo}) * {B}) // ({hi} - {lo} + 1)) AS b{k}"
        for k, lo, hi in (("kh", "h0", "h1"), ("kc", "c0", "c1"), ("km", "m0", "m1"))
    )
    return f"""
WITH {GRID_CELLS_SQL},
lkeyed AS (
  SELECT CAST(cell AS BIGINT) AS cell,
         CAST({sample_hash_sql("cell")} AS BIGINT) AS kh,
         CAST(cell AS BIGINT) AS kc,
         CAST({morton_sql("cell", "duckdb")} AS BIGINT) AS km
  FROM cells4
),
lst AS (
  SELECT MIN(kh) AS h0, MAX(kh) AS h1, MIN(kc) AS c0, MAX(kc) AS c1,
         MIN(km) AS m0, MAX(km) AS m1
  FROM lkeyed
),
lkb AS (SELECT l.cell, l.kh, l.kc, l.km, s.*, {sel}
        FROM lkeyed l CROSS JOIN lst s),
lb AS (
  SELECT 'hash' AS layout, bkh AS bucket, cell, c1 - c0 + 1 AS w FROM lkb
  UNION ALL
  SELECT 'cell_range', bkc, cell, c1 - c0 + 1 FROM lkb
  UNION ALL
  SELECT 'morton_range', bkm, cell, c1 - c0 + 1 FROM lkb
),
lg AS (
  SELECT layout, bucket, MIN(cell) AS mn, MAX(cell) AS mx, MAX(w) AS w
  FROM lb GROUP BY 1, 2
),
lov AS (
  SELECT a.layout, a.bucket, a.mn, a.mx, a.w, CAST(COUNT(*) AS BIGINT) AS ov
  FROM lg a JOIN lg b2 ON b2.layout = a.layout
                      AND a.mx >= b2.mn AND b2.mx >= a.mn
  GROUP BY 1, 2, 3, 4, 5
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
       ROUND((CAST(SUM(ov) AS DOUBLE) / COUNT(*)) + 1e-09, 6) AS avg_overlap,
       CAST(MAX(ov) AS BIGINT) AS max_overlap,
       ROUND((CAST(SUM(mx - mn + 1) AS DOUBLE) / (COUNT(*) * MAX(w))) + 1e-09, 6) AS avg_span_share
FROM lov GROUP BY layout
""".strip()


def _embedding_kcore_sql() -> str:
    """Unrolled bounded-peeling twin of embedding_kcore (the fill_sinks
    CTE-chain shape): every round MATERIALIZED, the previous round's
    edge table referenced a bounded number of times. The Spark side
    raises if peeling hasn't stabilized within the horizon, so a green
    gate certifies both engines computed the TRUE k-core."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        KCORE_K,
        KCORE_ROUNDS,
    )

    ctes = [f"kc_e0 AS MATERIALIZED (SELECT vec_a, vec_b FROM ({_emb_banded_sql()}))"]
    for t in range(1, KCORE_ROUNDS + 1):
        ctes.extend((
            f"""kc_k{t} AS MATERIALIZED (
  SELECT v FROM (
    SELECT vec_a AS v FROM kc_e{t - 1}
    UNION ALL SELECT vec_b AS v FROM kc_e{t - 1}
  ) GROUP BY v HAVING COUNT(*) >= {KCORE_K}
)""",
            f"""kc_e{t} AS MATERIALIZED (
  SELECT e.vec_a, e.vec_b FROM kc_e{t - 1} e
  JOIN kc_k{t} a ON a.v = e.vec_a
  JOIN kc_k{t} b ON b.v = e.vec_b
)""",
        ))
    chain = ",\n".join(ctes)
    return f"""
WITH {chain}
SELECT v AS vec_id, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM (
  SELECT vec_a AS v FROM kc_e{KCORE_ROUNDS}
  UNION ALL SELECT vec_b AS v FROM kc_e{KCORE_ROUNDS}
) GROUP BY v
""".strip()


def _zone_class_cnt_ctes() -> str:
    """The ONE ``pt → z → cnt`` (region_id, cls, n_cells) CTE chain
    behind the zonal_crosstab AND zonal_diversity twins (review catch:
    the banding expression and PIP CASE existed in two hand-written
    copies — the daily_cte drift-prevention class). Compose after the
    cells CTEs."""
    from cuda_gis_smoothing_spark import datagen
    from cuda_gis_smoothing_spark.operators.spatial import (
        centroid_sql,
        pip_region_sql,
    )

    lat, lon = centroid_sql("cell", "duckdb")
    case = pip_region_sql("pt.lat", "pt.lon", datagen.gen_boundaries())
    return f"""pt AS (SELECT CAST(FLOOR(ndvi * 8 + 1e-09) AS BIGINT) AS cls,
              {lat} AS lat, {lon} AS lon FROM cells4),
z AS (SELECT cls, {case} AS region_id FROM pt),
cnt AS (SELECT region_id, cls, CAST(COUNT(*) AS BIGINT) AS n_cells FROM z GROUP BY 1, 2)"""


def _zonal_crosstab_sql() -> str:
    # integer counts; the zone total is an integer window sum (PARTITION
    # BY groups the NULL zone identically in both engines); one exact-
    # integer-ratio division under round6
    return f"""
WITH {GRID_CELLS_SQL},
{_zone_class_cnt_ctes()}
SELECT region_id, cls, n_cells,
       ROUND((CAST(n_cells AS DOUBLE)
              / CAST(SUM(n_cells) OVER (PARTITION BY region_id) AS DOUBLE))
             + 1e-09, 6) AS zone_share
FROM cnt
""".strip()


def _knn_cells_sql() -> str:
    from cuda_gis_smoothing_spark.functions.numeric import flit
    from cuda_gis_smoothing_spark.operators import spatial as _sp
    from cuda_gis_smoothing_spark.operators.spatial import centroid_sql

    # the EXACT double the knn operator folds into its d2 expression
    cos2 = flit(_sp._COS0 * _sp._COS0)
    lat, lon = centroid_sql("cell", "duckdb")
    deltas = [0] + _R1 + _R2  # ring 0..2 covering, matches knn(ring=2)
    return f"""
WITH {GRID_CELLS_SQL},
pt AS (SELECT cell, {lat} AS lat, {lon} AS lon FROM cells4),
offs (delta) AS (VALUES {_vals(deltas)}),
q AS (SELECT cell AS query_id, lat AS qlat, lon AS qlon FROM pt WHERE cell % 37 = 0),
cover AS (SELECT q.query_id, q.qlat, q.qlon, q.query_id + o.delta AS ccell
          FROM q CROSS JOIN offs o),
cand AS (
  SELECT c.query_id, p.cell AS neighbor_cell,
         (p.lat - c.qlat) * (p.lat - c.qlat)
         + (p.lon - c.qlon) * (p.lon - c.qlon) * {cos2} AS d2
  FROM cover c JOIN pt p ON p.cell = c.ccell
  WHERE p.cell <> c.query_id
)
SELECT query_id, neighbor_cell, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, neighbor_cell,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2 ASC, neighbor_cell ASC) AS rank
  FROM cand
)
WHERE rank <= 5
""".strip()


def _tile_pyramid_sql() -> str:
    levels = []
    for z in (10, 11, 12):
        tx, ty = tile_sql("cell", z, "duckdb")
        levels.append(
            f"SELECT {tx} AS tile_x, {ty} AS tile_y, {z} AS zoom, COUNT(*) AS n_cells "
            f"FROM cells4 GROUP BY 1, 2, 3"
        )
    body = "\nUNION ALL\n".join(levels)
    return f"WITH {GRID_CELLS_SQL}\n{body}"


def _sessionize_sql() -> str:
    from cuda_gis_smoothing_spark.operators.events import SESSIONIZE_SQL

    return SESSIONIZE_SQL


def _asof_sql() -> str:
    from cuda_gis_smoothing_spark.operators.events import asof_attribute_sql

    return asof_attribute_sql()


def _range_join_sql() -> str:
    from cuda_gis_smoothing_spark.operators.events import range_join_sql

    return range_join_sql()


def _top_event_types_sql() -> str:
    from cuda_gis_smoothing_spark.operators.events import top_event_types_sql

    return top_event_types_sql(3)


def _funnel_sql_oracle() -> str:
    from cuda_gis_smoothing_spark.operators.events import funnel_sql

    return funnel_sql()


def _cohort_sql_oracle() -> str:
    from cuda_gis_smoothing_spark.operators.events import cohort_retention_sql

    return cohort_retention_sql()


def _rollup_sql_oracle() -> str:
    from cuda_gis_smoothing_spark.operators.events import ROLLUP_SQL

    return ROLLUP_SQL


def _pivot_sql_oracle() -> str:
    from cuda_gis_smoothing_spark.operators.events import PIVOT_SQL

    return PIVOT_SQL


def _table_profile_sql_oracle() -> str:
    from cuda_gis_smoothing_spark.operators.analytics import profile_numeric_sql

    return profile_numeric_sql("lineitem", _PROFILE_COLS)


def _doc_logprob_sql_oracle() -> str:
    from cuda_gis_smoothing_spark.functions.text import UNIGRAM_LOGPROB_SQL

    return UNIGRAM_LOGPROB_SQL


def _region_revenue_sql_oracle() -> str:
    from cuda_gis_smoothing_spark.operators.analytics import REGION_REVENUE_SQL

    return REGION_REVENUE_SQL


def _top_customers_sql_oracle() -> str:
    from cuda_gis_smoothing_spark.operators.analytics import top_customers_sql

    return top_customers_sql()


def _sliding_avg_sql_oracle() -> str:
    from cuda_gis_smoothing_spark.operators.events import user_sliding_avg_sql

    return user_sliding_avg_sql()


def _cube_sql_oracle() -> str:
    from cuda_gis_smoothing_spark.operators.events import CUBE_SQL

    return CUBE_SQL


def _cumulative_users_sql_oracle() -> str:
    from cuda_gis_smoothing_spark.operators.events import CUMULATIVE_USERS_SQL

    return CUMULATIVE_USERS_SQL


def _moving_avg_sql_oracle() -> str:
    from cuda_gis_smoothing_spark.operators.events import user_moving_avg_sql

    return user_moving_avg_sql()


def _percentiles_sql_oracle() -> str:
    from cuda_gis_smoothing_spark.operators.events import value_percentiles_sql

    return value_percentiles_sql()


def _emb_banded_sql(probe_bits: int = 0, threshold: float | None = None) -> str:
    """DuckDB twin of operators/dedup.embedding_neardup_pairs_banded:
    same hyperplane family, same band packing, same exact-cosine verify
    (sign margins checked: min |projection| on the fixture is 1.3e-5,
    orders of magnitude above either engine's dot-product fp error, so
    the band values are engine-independent). ``probe_bits=1`` mirrors
    the multi-probe dial: the right join side also carries every band
    value with one bit flipped (the same xor-key expansion the Spark
    operator explodes). ``threshold`` overrides the default verify
    cutoff (the threshold-sweep card)."""
    from cuda_gis_smoothing_spark.operators.dedup import EMB_BANDS, EMB_PLANES

    thr = _EMB_BANDED_THRESHOLD if threshold is None else threshold
    width = EMB_PLANES // EMB_BANDS
    band_selects = []
    for b in range(EMB_BANDS):
        bits = " + ".join(
            f"CASE WHEN list_dot_product(emb, {_lsh_plane_weights(b * width + k)!r}::DOUBLE[]) > 0 "
            f"THEN {1 << k} ELSE 0 END"
            for k in range(width)
        )
        band_selects.append(f"SELECT vec_id, {b} AS band, ({bits}) AS bv FROM n")
    bands_union = "\n  UNION ALL ".join(band_selects)
    if probe_bits == 0:
        probe_cte = "kb AS (SELECT * FROM k)"
    else:
        flips = ", ".join(f"({1 << k})" for k in range(width))
        probe_cte = f"""flips (f) AS (VALUES {flips}),
kb AS (
  SELECT vec_id, band, bv FROM k
  UNION ALL
  SELECT vec_id, band, xor(bv, f) AS bv FROM k CROSS JOIN flips
)"""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (SELECT vec_id, emb, SQRT(list_dot_product(emb, emb)) AS nrm FROM e),
k AS (
  {bands_union}
),
{probe_cte},
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM k a JOIN kb b ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       ROUND(list_dot_product(x.emb, y.emb) / (x.nrm * y.nrm) + 1e-09, 6) AS cosine
FROM cand c
JOIN n x ON x.vec_id = c.vec_a
JOIN n y ON y.vec_id = c.vec_b
WHERE ROUND(list_dot_product(x.emb, y.emb) / (x.nrm * y.nrm) + 1e-09, 6) >= {thr}
""".strip()


def _lsh_plane_weights(p: int, dim: int = _EMB_DIM) -> list[float]:
    """Deterministic hyperplane weights — MUST mirror the expression in
    operators/similarity.lsh_bucketed_knn: ((i*(2p+3) + p*p+1) % 7) - 3."""
    return [float((i * (2 * p + 3) + p * p + 1) % 7 - 3) for i in range(dim)]


def _knn_lsh_sql() -> str:
    bucket_terms = " + ".join(
        f"CASE WHEN list_dot_product(emb, {_lsh_plane_weights(p)!r}::DOUBLE[]) > 0 "
        f"THEN {1 << p} ELSE 0 END"
        for p in range(_LSH_PLANES)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (
  SELECT vec_id, emb, SQRT(list_dot_product(emb, emb)) AS nrm,
         ({bucket_terms}) AS bucket
  FROM e
),
p AS (
  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
         list_dot_product(q.emb, x.emb) / (q.nrm * x.nrm) AS sim
  FROM n q JOIN n x ON x.bucket = q.bucket AND x.vec_id <> q.vec_id
  WHERE q.vec_id < {_KNN_QUERIES}
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM p
)
WHERE rank <= 5
""".strip()


def _smooth_scatter_sql() -> str:
    """Fixed-point twin of _q_smooth_scatter_k2: the scatter and gather
    forms are algebraically identical under symmetric offsets, and the
    integer numerator/denominator are exact in any association — so the
    relational gather SQL hash-matches Spark's scatter plan exactly."""
    offs = [
        (0, _SCALED_W_K2[0]),
        *[(d, _SCALED_W_K2[1]) for d in _R1],
        *[(d, _SCALED_W_K2[2]) for d in _R2],
    ]
    vals = ", ".join(f"({d}, {w})" for d, w in offs)
    return f"""
WITH {GRID_QTY_SQL},
offsets (delta, w) AS (VALUES {vals})
SELECT c.cell AS cell,
       ROUND(SUM(n.qty * o.w) * 1.0 / SUM(o.w) + 1e-09, 6) AS smoothed_qty
FROM cellsq c CROSS JOIN offsets o
JOIN cellsq n ON n.cell = c.cell + o.delta
GROUP BY c.cell
""".strip()


def _smooth_strict_sql() -> str:
    """Adjacency-based (strict) two-ring smoothing: ring 2 reachable
    only through a PRESENT ring-1 cell — the reference's literal
    generateSecondOrderNeighbors semantics as relational SQL."""
    from cuda_gis_smoothing_spark.hexgrid import W_EXT_RING1, W_EXT_RING2

    return f"""
WITH {GRID_CELLS_SQL},
offs1 (delta) AS (VALUES {_vals(_R1)}),
e1 AS (
  SELECT c.cell AS cell, c.cell + o.delta AS nbr
  FROM cells4 c CROSS JOIN offs1 o
  JOIN cells4 n ON n.cell = c.cell + o.delta
),
r2 AS (
  SELECT DISTINCT a.cell AS cell, b.nbr AS nbr
  FROM e1 a JOIN e1 b ON b.cell = a.nbr
  WHERE b.nbr <> a.cell
    AND NOT EXISTS (SELECT 1 FROM e1 x WHERE x.cell = a.cell AND x.nbr = b.nbr)
),
contrib AS (
  SELECT cell, cell AS src, 1.0 AS w FROM cells4
  UNION ALL SELECT cell, nbr AS src, {W_EXT_RING1!r} AS w FROM e1
  UNION ALL SELECT cell, nbr AS src, {W_EXT_RING2!r} AS w FROM r2
)
SELECT t.cell AS cell,
       ROUND(SUM(v.ndvi * t.w) / SUM(t.w) + 1e-09, 6) AS smoothed_ndvi
FROM contrib t JOIN cells4 v ON v.cell = t.src
GROUP BY t.cell
""".strip()
