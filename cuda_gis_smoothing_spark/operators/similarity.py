"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed
variant (random hyperplane signs) is the scale path — candidates only
join within a bucket, so the pair space is |bucket|² not N².

All vector math uses higher-order functions (``zip_with`` +
``aggregate``) on double-cast arrays: JVM-side, deterministic
left-to-right fold, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot_col(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def with_norm(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Cast to array<double> and attach the L2 norm (computed once)."""
    d = df.withColumn("_emb", F.col(emb_col).cast("array<double>"))
    return d.withColumn("_nrm", F.sqrt(dot_col("_emb", "_emb")))


def cosine_knn(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the (small) query side
    against the full corpus, rank with a per-query window.

    At 100 TB the corpus side stays partition-parallel (map-side join +
    local top-k via the window after a shuffle on query_id — bounded at
    #queries * k rows out).
    """
    c = with_norm(embeddings, "embedding").select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_emb").alias("c_emb"),
        F.col("_nrm").alias("c_nrm"),
    )
    q = with_norm(queries, "embedding").select(
        F.col(query_id_col), F.col("_emb").alias("q_emb"), F.col("_nrm").alias("q_nrm")
    )
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col))
    sim = (dot_col("c_emb", "q_emb") / (F.col("c_nrm") * F.col("q_nrm"))).alias("sim")
    ranked = pairs.select(query_id_col, "neighbor_id", sim).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(query_id_col).orderBy(
                F.col("sim").desc(), F.col("neighbor_id").asc()
            )
        ),
    )
    return ranked.where(F.col("rank") <= k).select(query_id_col, "neighbor_id", "rank")


def lsh_bucketed_knn(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets.

    Deterministic "random" hyperplanes: plane p weights dimension d by
    sign of a fixed affine sequence — no RNG state, reproducible across
    engines and rounds. Bucket = n_planes sign bits; candidates join on
    bucket equality only (multi-probe: exact Hamming-0 here; grow probes
    for recall). Scale path: shuffle keys are buckets, corpus never
    self-joins.
    """
    def bucket_expr(emb: str) -> Column:
        bits = []
        for p in range(n_planes):
            # deterministic +-1 pattern per (plane, dim): sign of a
            # quadratic residue-ish sequence
            proj = F.expr(
                f"aggregate(zip_with({emb}, sequence(0, size({emb}) - 1), "
                f"(x, i) -> x * (CAST((i * {2 * p + 3} + {p * p + 1}) % 7 AS DOUBLE) - 3.0)), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    c = with_norm(embeddings, "embedding").select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_emb").alias("c_emb"),
        F.col("_nrm").alias("c_nrm"),
        bucket_expr("_emb").alias("bucket"),
    )
    q = with_norm(queries, "embedding").select(
        F.col(query_id_col),
        F.col("_emb").alias("q_emb"),
        F.col("_nrm").alias("q_nrm"),
        bucket_expr("_emb").alias("bucket"),
    )
    pairs = c.join(F.broadcast(q), "bucket").where(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    sim = (dot_col("c_emb", "q_emb") / (F.col("c_nrm") * F.col("q_nrm"))).alias("sim")
    ranked = pairs.select(query_id_col, "neighbor_id", sim).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(query_id_col).orderBy(
                F.col("sim").desc(), F.col("neighbor_id").asc()
            )
        ),
    )
    return ranked.where(F.col("rank") <= k).select(query_id_col, "neighbor_id", "rank")
