"""Table sources over the driver's parquet testdata + the grid view.

``grid_from_lineitem`` derives a deterministic hex-cell table from the
TPC-H-ish ``lineitem`` table (FIXTURES.md driver-oracle mapping): the
integer keys become axial coordinates, so every smoothing / stats
operator gets an ANSI-SQL DuckDB oracle over the same parquet. The
construction is exact in both engines: ``l_quantity`` is
integer-valued, so per-cell sums (and hence avgs) are bit-identical
doubles regardless of aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.hexgrid import ENC, OFFSET

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: grid side used for the testdata-derived cell table
GRID = 40


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


#: per-session cache of the derived cell table — keyed by Spark
#: applicationId (unique per live session) + sf_dir. The sf_dir is
#: treated as IMMUTABLE (true for the read-only testdata this repo
#: targets); rewriting its parquet in-session requires
#: clear_cells_cache(). Entries for stopped sessions are tiny
#: (DataFrame handles) and die with the process.
_CELLS_CACHE: dict[tuple[str, str], DataFrame] = {}


def clear_cells_cache() -> None:
    """Drop all cached cell tables (needed after rewriting an sf_dir
    in-session, and by tests that must re-exercise the derivation —
    e.g. the hostile-session-config invariance suite, which would
    otherwise verify smoothing gates against cells checkpointed under
    default config)."""
    _CELLS_CACHE.clear()


def grid_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cells(cell, ndvi, mndwi, evi, ndwi) derived from lineitem.

    cell = pack(l_partkey % GRID, l_orderkey % GRID); ndvi = scaled
    avg(l_quantity). Derived variables follow the reference's literal
    projections (src/cuda/hex_smooth_cuda_v4.cu:359-363).

    The result is localCheckpoint'ed once per (session, sf_dir): the
    cell table is a DERIVED AGGREGATE that every smoothing/stats/
    spatial gate joins against itself up to 8 times — unmaterialized,
    each pruned join branch re-runs the lineitem scan + aggregation
    (measured 16 scans in smooth_strict_k2's plan; ReuseExchange
    cannot dedup differently-pruned branches). At 100 TB the cell
    table is a stored table, not a per-query derivation — the
    checkpoint models exactly that.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CELLS_CACHE.get(key)
    if cached is not None:
        return cached
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_orderkey", "l_quantity")
    q = F.col("l_partkey") % GRID
    r = F.col("l_orderkey") % GRID
    cell = ((q + OFFSET) * ENC + (r + OFFSET)).alias("cell")
    ndvi = (F.sum("l_quantity") / F.count(F.lit(1)) / 50.0).alias("ndvi")
    cells = li.select(cell, "l_quantity").groupBy("cell").agg(ndvi)
    out = cells.withColumns(
        {
            "mndwi": F.col("ndvi") * 0.9 + 0.05,
            "evi": F.col("ndvi") * 1.1 - 0.05,
            "ndwi": F.col("ndvi") * 0.95,
        }
    ).localCheckpoint()
    _CELLS_CACHE[key] = out
    return out


# float literals in exponent form: DuckDB parses bare decimals as
# DECIMAL (Spark: DOUBLE) — see functions/numeric.py::flit
GRID_CELLS_SQL = f"""
cells AS (
  SELECT ((l_partkey % {GRID}) + {OFFSET}) * {ENC} + ((l_orderkey % {GRID}) + {OFFSET}) AS cell,
         SUM(l_quantity) / COUNT(*) / 5e1 AS ndvi
  FROM lineitem
  GROUP BY 1
),
cells4 AS (
  SELECT cell, ndvi,
         ndvi * 9e-1 + 5e-2 AS mndwi,
         ndvi * 1.1e0 - 5e-2 AS evi,
         ndvi * 9.5e-1 AS ndwi
  FROM cells
)
""".strip()


def grid_qty_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cells(cell, qty) with an INTEGER value column: qty = per-cell
    SUM(l_quantity) as BIGINT (l_quantity is integer-valued, so the
    double sum is exact in any order and the cast is lossless in both
    engines). The input for fixed-point value-gated scatter smoothing
    (operators/smoothing.py::smooth_scatter_int)."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_orderkey", "l_quantity")
    q = F.col("l_partkey") % GRID
    r = F.col("l_orderkey") % GRID
    cell = ((q + OFFSET) * ENC + (r + OFFSET)).alias("cell")
    return (
        li.select(cell, "l_quantity")
        .groupBy("cell")
        .agg(F.sum("l_quantity").cast("long").alias("qty"))
    )


GRID_QTY_SQL = f"""
cellsq AS (
  SELECT ((l_partkey % {GRID}) + {OFFSET}) * {ENC} + ((l_orderkey % {GRID}) + {OFFSET}) AS cell,
         CAST(SUM(l_quantity) AS BIGINT) AS qty
  FROM lineitem
  GROUP BY 1
)
""".strip()
