"""Partitioning policy: the O1/O2 spatial-reordering analog + skew tools.

The reference spends ~220 LoC on Morton / recursive-bisection reorder
maps and inverse permutations (src/cuda/hex_smooth_cuda_v4.cu:264-297,
src/cuda/hex_smooth_cuda_v5.cu:321-359,466-560). Under Spark, rows carry
their keys, so a "reordering" is just a partitioner choice:
``repartitionByRange`` on a space-filling-curve key clusters spatially
adjacent cells into the same partition (less shuffle fan-out for the
neighbor join), and ``orderBy(cell)`` at the sink replaces the entire
inverse-permutation machinery (O5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cuda_gis_smoothing_spark.hexgrid import ENC, OFFSET

_MASKS = (0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555)
_SHIFTS = (8, 4, 2, 1)


def _part1by1_sql(v: str, shift_fmt: str) -> str:
    """Expand 16-bit value ``v`` to even bit positions (SQL text)."""
    expr = v
    for mask, sh in zip(_MASKS, _SHIFTS):
        shifted = shift_fmt.format(x=expr, n=sh)
        expr = f"(({expr} | {shifted}) & {mask})"
    return expr


def morton_sql(cell_expr: str, dialect: str) -> str:
    """Z-order key of a packed cell id as a SQL expression.

    Same bit interleave as the reference's ``morton2D``
    (/root/reference/src/cuda/hex_smooth_cuda_v4.cu:29-44). Emitted as
    SQL text in two dialects so the Spark plan (via ``F.expr``) and the
    DuckDB oracle evaluate the IDENTICAL integer function.
    """
    shift_fmt = "shiftleft({x}, {n})" if dialect == "spark" else "({x} << {n})"
    q = f"(({cell_expr}) DIV {ENC} - {OFFSET})" if dialect == "spark" else f"(({cell_expr}) // {ENC} - {OFFSET})"
    r = f"(({cell_expr}) % {ENC} - {OFFSET})"
    x = f"({q} & 65535)"
    y = f"({r} & 65535)"
    ex = _part1by1_sql(x, shift_fmt)
    ey = _part1by1_sql(y, shift_fmt)
    return f"({ex} | {shift_fmt.format(x=ey, n=1)})"


def morton_col(cell_col: str = "cell") -> Column:
    return F.expr(morton_sql(cell_col, "spark"))


def spatial_repartition(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Range-partition + sort on the Morton key (reference O1/O2 analog).

    At 100 TB this is the difference between neighbor-join shuffle
    traffic going to 2 adjacent partitions vs all N — spatially local
    keys land together, and AQE coalesces the tail.
    """
    zkey = morton_col("cell").alias("_zkey")
    with_key = df.withColumn("_zkey", zkey)
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        with_key.repartitionByRange(parts, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )


def _deterministic_buckets(
    df: DataFrame, k0: str, parts: int, boundaries: str
) -> DataFrame:
    """Attach the deterministic ``_bkt`` range-bucket column the
    partition-parallel order-statistics family (:func:`global_ranks`,
    :func:`global_prefix_sums`) shares — a pure function of the DATA
    (broadcast min/max or quantile cut points), never of physical
    partitioning, so every consumer of the plan sees identical buckets
    even when exchanges are not reused (see global_ranks' rationale)."""
    if boundaries == "quantile":
        qs = [i / parts for i in range(1, parts)]
        cuts = sorted(set(df.approxQuantile(k0, qs, 0.001)))
        bkt_expr = F.lit(0)
        for c in cuts:
            bkt_expr = bkt_expr + (F.col(k0) > F.lit(c)).cast("long")
        return df.select(*df.columns, bkt_expr.alias("_bkt"))
    elif boundaries == "uniform":
        mm = df.agg(F.min(k0).alias("_lo"), F.max(k0).alias("_hi"))
        width = F.greatest(
            ((F.col("_hi") - F.col("_lo") + 1) / parts).cast("long") + 1, F.lit(1)
        )
        bkt = ((F.col(k0) - F.col("_lo")) / width).cast("long").alias("_bkt")
        return df.crossJoin(F.broadcast(mm)).select(*df.columns, bkt)
    raise ValueError("boundaries must be 'uniform' or 'quantile'")


def global_ranks(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rank",
    num_partitions: int | None = None,
    boundaries: str = "uniform",
) -> DataFrame:
    """Exact global 1-based ranks over ``order_cols`` WITHOUT a global
    sort — partition-parallel at any scale.

    ``Window.orderBy(...)`` pulls the whole table into ONE partition.
    Instead: (1) bucket rows by a DETERMINISTIC uniform range split of
    the leading key (min/max joined in-plan as a 1-row broadcast — a
    pure function of the data, so every consumer of the plan sees the
    same buckets even when exchanges are not reused; physical-partition
    tricks like ``monotonically_increasing_id`` over
    ``repartitionByRange`` break exactly there, because range-sampled
    boundaries can differ between re-executions); (2) rank locally
    within each bucket (hash exchange on the bucket id + per-bucket
    sort); (3) shift each bucket's local ranks by the row count of the
    buckets before it — the offset table is one row per bucket, so its
    prefix-sum window and broadcast join are O(num_buckets), not
    O(rows).

    Requires ``order_cols`` to form a unique key and the leading key to
    be numeric. ``boundaries="uniform"`` (default) splits the key RANGE
    evenly — right for roughly uniform leading keys (packed cell ids,
    Morton keys). ``boundaries="quantile"`` splits at approxQuantile
    cut points instead, so heavily skewed keys still give balanced
    buckets (one extra aggregation pass over the leading key; the cut
    points are data-derived and deterministic for a fixed input, so the
    consumers stay consistent — tested under a pathological 99%-heavy
    key distribution).
    """
    from pyspark.sql import Window

    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    b = _deterministic_buckets(df, order_cols[0], parts, boundaries)
    local = F.row_number().over(Window.partitionBy("_bkt").orderBy(*order_cols))
    ranked = b.select(*df.columns, "_bkt", local.alias("_lrank"))
    counts = b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_n"))
    # prefix sum over num_buckets rows — the ONLY single-partition
    # step, structurally bounded by the bucket count, not the data
    off = counts.select(
        "_bkt",
        (F.sum("_n").over(Window.orderBy("_bkt")) - F.col("_n")).alias("_off"),
    )
    return ranked.join(F.broadcast(off), "_bkt").select(
        *df.columns, (F.col("_lrank") + F.col("_off")).alias(out_col)
    )


def global_prefix_sums(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "prefix",
    num_partitions: int | None = None,
    boundaries: str = "uniform",
) -> DataFrame:
    """EXCLUSIVE global running sum of ``value_col`` in ``order_cols``
    order WITHOUT a global sort — the prefix-SUM sibling of
    :func:`global_ranks` (same deterministic range buckets, same
    O(num_buckets)-bounded single-partition step; shared rationale
    there). Row i's output is the sum of all strictly-earlier rows'
    values (0 for the first row) — the quantity sequence packing,
    offset assignment and cumulative layouts need. Requires
    ``order_cols`` to form a unique key with a numeric leading key;
    integer values compose exactly across the two stages.

    Consumer note: the input feeds THREE differently-pruned subplans
    (bucket min/max, the windowed pass, per-bucket totals) that
    ReuseExchange cannot dedup — materialize an expensive DERIVED
    input first (operators/packing does; the CLAUDE.md multi-consumer
    re-execution class)."""
    from pyspark.sql import Window

    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    b = _deterministic_buckets(df, order_cols[0], parts, boundaries)
    w_local = (
        Window.partitionBy("_bkt")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(value_col).over(w_local), F.lit(0))
    summed = b.select(*df.columns, "_bkt", local.alias("_lsum"))
    totals = b.groupBy("_bkt").agg(F.sum(value_col).alias("_n"))
    # prefix sum over num_buckets rows — the ONLY single-partition
    # step, structurally bounded by the bucket count, not the data
    off = totals.select(
        "_bkt",
        (F.sum("_n").over(Window.orderBy("_bkt")) - F.col("_n")).alias("_off"),
    )
    return summed.join(F.broadcast(off), "_bkt").select(
        *df.columns, (F.col("_lsum") + F.col("_off")).cast("long").alias(out_col)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: spread each (possibly hot) key over
    ``n_salts`` reducers by salting the left side and replicating the
    right side once per salt value.

    AQE's runtime skew-join split handles most cases; this is the
    EXPLICIT lever for when it can't (skew invisible to size stats,
    e.g. a cheap-to-ship but expensive-to-process key, or a build side
    AQE refuses to split). Left salt is a deterministic hash of the
    left row's other columns (uniform, retry-stable); right replication
    is an explode of 0..n_salts-1 — factor n_salts regardless of data.
    Exact for inner/left joins on equi keys (each left row matches its
    right partner under exactly one salt).

    Degenerate case: if the left side has ONLY the key column, the salt
    falls back to hash(key) — every row of a hot key then gets the SAME
    salt and the join provides zero skew relief (results stay correct).
    A warning is emitted because that is the one scenario this operator
    exists for; dedupe the key-only side or add a discriminating column.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left equi joins")
    others = [c for c in left.columns if c != key]
    if not others:
        import warnings

        warnings.warn(
            "salted_join: left side has only the join key; salting by "
            "hash(key) gives every row of a hot key the same salt — no "
            "skew relief (results remain correct)",
            stacklevel=2,
        )
        others = [key]
    lsalt = F.pmod(F.hash(*[F.col(c) for c in others]), F.lit(n_salts))
    l2 = left.withColumn("_salt", lsalt)
    r2 = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l2.join(r2, [key, "_salt"], how).drop("_salt")


def salted_cell_aggregate(
    df: DataFrame,
    cell_col: str,
    value_cols: list[str],
    salt_buckets: int,
    salt_source: str,
) -> DataFrame:
    """Two-stage salted aggregation for hot cells (explicit skew handling).

    Stage 1 groups by (cell, salt) — the hot cell's millions of rows
    split across ``salt_buckets`` reducers; stage 2 merges the partial
    (sum, count) pairs. Integer/count composition is exact; DOUBLE
    value sums are subject to the repo's round6 tolerance policy —
    fp addition is non-associative, so the two-stage sum can differ in
    the last ulps from a single-pass sum (same accepted risk class as
    every float gate; if a flake ever appears at larger scales, gate
    on an integer-scaled value per the region_revenue fixed-point
    precedent). This is the lever the north_rule mandates beyond AQE's
    runtime skew splitting.
    """
    salt = (F.abs(F.hash(F.col(salt_source))) % salt_buckets).alias("_salt")
    partial = (
        df.select(F.col(cell_col).alias("cell"), salt, *value_cols)
        .groupBy("cell", "_salt")
        .agg(
            *[F.sum(F.col(v).cast("double")).alias(f"_sum_{v}") for v in value_cols],
            F.count(F.lit(1)).alias("_cnt"),
        )
    )
    return partial.groupBy("cell").agg(
        *[
            (F.sum(f"_sum_{v}") / F.sum("_cnt")).alias(f"avg_{v}")
            for v in value_cols
        ],
        F.sum("_cnt").alias("n_rows"),
    )
