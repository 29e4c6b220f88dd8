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


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    oversample: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_train_rows: int = 65536,
):
    """k-means‖-style centroid training, fully deterministic (no RNG
    state) and bounded on the driver.

    1. Oversample ``oversample * n_centroids`` candidates by HASH RANK
       (distributed orderBy+limit — the deterministic stand-in for
       k-means‖'s random oversampling pass; collect is bounded at L
       rows, never the corpus).
    2. Reduce to ``n_centroids`` seeds with greedy farthest-point
       selection on the driver (the deterministic analog of k-means++'s
       cost-weighted draw, and exactly k-means‖'s "recluster the
       oversampled set" step).
    3. ``iters`` distributed Lloyd rounds over a DETERMINISTIC HASH
       SAMPLE of at most ~``max_train_rows`` vectors (the standard IVF
       recipe: quantizer quality needs a bounded representative sample,
       not the corpus — the full corpus is assigned exactly once, by
       the caller). The sample is unit-normalized ONCE and
       materialized (``localCheckpoint``; a staged table on a real
       cluster), so each round is one vectorized pandas-UDF assignment
       (a numpy matmul per Arrow batch) + a JVM-side posexplode +
       groupBy(bucket, dim) mean — collecting n_centroids*dim
       aggregate rows per round, never data rows, and never
       re-scanning the corpus.

    Returns a numpy (n_centroids, dim) array of UNIT-norm centroids.
    Lloyd means aggregate distributed doubles, so centroids can differ
    across runs by fp-association noise — callers gate on recall, not
    on bit-exact centroid values (the seeded variant in :func:`ivf_knn`
    keeps the SQL-exact driver gate).
    """
    import numpy as np

    from cuda_gis_smoothing_spark.operators.sampling import deterministic_sample

    L = oversample * n_centroids
    pool_rows = (
        embeddings.select(
            F.col(id_col),
            F.col(emb_col).cast("array<double>").alias("_e"),
            F.pmod(F.hash(F.col(id_col)), F.lit(1_000_003)).alias("_r"),
        )
        .orderBy("_r", id_col)
        .limit(L)
        .collect()
    )
    pool = np.asarray([r["_e"] for r in pool_rows], dtype=np.float64)
    pool /= np.linalg.norm(pool, axis=1, keepdims=True) + 1e-12
    chosen = [0]
    for _ in range(n_centroids - 1):
        d = np.min(1.0 - pool @ pool[chosen].T, axis=1)
        d[chosen] = -1.0
        chosen.append(int(np.argmax(d)))
    cents = pool[chosen].copy()

    src = embeddings
    n_rows = embeddings.count()
    if n_rows > max_train_rows:
        src = deterministic_sample(
            embeddings, max_train_rows / n_rows, id_col=id_col
        )
    unit = (
        with_norm(src, emb_col)
        .select(
            F.transform(
                "_emb", lambda x: x / (F.col("_nrm") + F.lit(1e-12))
            ).alias("_u")
        )
        .localCheckpoint()
    )
    for _ in range(iters):
        assign = _nearest_bucket_udf(embeddings.sparkSession, cents)
        assigned = unit.select(assign(F.col("_u")).alias("_b"), "_u")
        sums = (
            assigned.select("_b", F.posexplode("_u").alias("_d", "_x"))
            .groupBy("_b", "_d")
            .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        new = cents.copy()
        acc: dict[int, np.ndarray] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["_b"], np.zeros(cents.shape[1]))[r["_d"]] = r["_s"]
            cnt[r["_b"]] = r["_n"]
        for b, v in acc.items():
            if cnt[b] > 0:
                new[b] = v / cnt[b]
        new /= np.linalg.norm(new, axis=1, keepdims=True) + 1e-12
        cents = new
    return cents


def _nearest_bucket_udf(spark, cents):
    """Vectorized nearest-centroid assignment (broadcast + matmul)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    bc = spark.sparkContext.broadcast(np.asarray(cents, dtype=np.float64))

    def _nearest(emb):
        m = np.asarray([np.asarray(e, dtype=np.float64) for e in emb])
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        return pd.Series(np.argmax(m @ bc.value.T, axis=1).astype(np.int32))

    _nearest.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return F.pandas_udf(_nearest, T.IntegerType())


def ivf_knn(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    centroids=None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into centroid buckets,
    probe the ``n_probe`` nearest buckets per query, exact-rerank local.

    Default centroid "training" is deterministic (no RNG state): the
    corpus vectors with the ``n_centroids`` smallest ids act as seeds —
    SQL-expressible, so the driver gate checks the whole bucket/probe
    plumbing exactly. Pass ``centroids`` (e.g. from
    :func:`train_centroids`, the k-means‖ path) for real recall at
    scale; the plumbing is identical. Assignment is one numpy matmul
    per Arrow batch (vectorized pandas UDF); the probe join shuffles on
    bucket id only.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = embeddings.sparkSession
    if centroids is None:
        seeds = (
            embeddings.orderBy(id_col)
            .limit(n_centroids)
            .select(F.col("embedding").cast("array<double>"))
            .collect()
        )
        cents = np.asarray([r[0] for r in seeds], dtype=np.float64)  # (C, d)
        cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12
    else:
        cents = np.asarray(centroids, dtype=np.float64)
    bc = spark.sparkContext.broadcast(cents)

    # NOTE: annotations set as live objects — postponed (string)
    # annotations from `from __future__ import annotations` break
    # pandas_udf's type-hint inference for closure-defined functions
    def _nearest(emb):
        m = np.asarray([np.asarray(e, dtype=np.float64) for e in emb])
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        return pd.Series(np.argmax(m @ bc.value.T, axis=1).astype(np.int32))

    _nearest.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    nearest_bucket = F.pandas_udf(_nearest, T.IntegerType())

    def _probe(emb):
        m = np.asarray([np.asarray(e, dtype=np.float64) for e in emb])
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        sims = m @ bc.value.T
        # stable sort: exact centroid-similarity ties (the fixture has
        # near/exact duplicate vectors) must resolve to the LOWEST cid,
        # matching the oracle's ORDER BY sim DESC, cid
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    _probe.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    probe_buckets = F.pandas_udf(_probe, T.ArrayType(T.IntegerType()))

    c = with_norm(embeddings, "embedding").select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_emb").alias("c_emb"),
        F.col("_nrm").alias("c_nrm"),
        nearest_bucket("embedding").alias("bucket"),
    )
    q = with_norm(queries, "embedding").select(
        F.col(query_id_col),
        F.col("_emb").alias("q_emb"),
        F.col("_nrm").alias("q_nrm"),
        F.explode(probe_buckets("embedding")).alias("bucket"),
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


def knn_graph(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact k-NN GRAPH over the whole corpus — every vector's top-k
    cosine neighbors, the similarity-graph builder semantic
    clustering/dedup pipelines materialize. Output:
    ``(vec_id, neighbor_id, cosine, rank)``.

    Unlike :func:`cosine_knn` (which broadcasts a SMALL query side),
    the self-graph has no small side — so the pairwise cosines come
    from the BLOCKED triangle equi-join
    (operators/dedup.embedding_neardup_pairs with the threshold open:
    balanced ~B²/2 hash tasks, parallelism pinned, no
    broadcast-of-corpus, no nested-loop node), each unordered pair
    computed once and exploded into both directions for the per-vector
    top-k window. Ranking is on the ROUND6'd cosine with neighbor_id
    tie-break — a cross-engine total order (raw-double ordering can
    legally differ in the last ulp between engines). The N²/2 work is
    inherent to the exact graph; the recall-traded scale paths are
    :func:`ivf_knn` / :func:`lsh_bucketed_knn` per query batch."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.operators.dedup import embedding_neardup_pairs

    pairs = embedding_neardup_pairs(
        embeddings, threshold=-2.0, id_col=id_col, n_blocks=n_blocks
    )
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("vec_a").alias(id_col),
                    F.col("vec_b").alias("neighbor_id"),
                    F.col("cosine"),
                ),
                F.struct(
                    F.col("vec_b").alias(id_col),
                    F.col("vec_a").alias("neighbor_id"),
                    F.col("cosine"),
                ),
            )
        ).alias("_e")
    ).select(f"_e.{id_col}", "_e.neighbor_id", "_e.cosine")
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def knn_mutual_pairs(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    n_blocks: int = 8,
) -> DataFrame:
    """Mutual (reciprocal) k-NN pairs — the standard high-precision
    neighbor filter for semantic dedup/clustering (a pair survives only
    if EACH vector ranks the other in its own top-k; hubs that appear
    in many lists but reciprocate few are dropped). One self-join of
    the :func:`knn_graph` table on the reversed pair — the graph is
    localCheckpoint'ed ahead of its two differently-projected consumers
    (the multi-consumer re-execute class; at 100 TB the k-NN graph is a
    stored table anyway and this join is O(N·k) on (vec, nbr) keys).
    Output ``(vec_a, vec_b, cosine, rank_ab, rank_ba)`` with
    vec_a < vec_b; cosine is the round6 pair cosine (symmetric)."""
    g = knn_graph(embeddings, k, id_col, n_blocks).localCheckpoint()
    a = g.select(
        F.col(id_col).alias("vec_a"),
        F.col("neighbor_id").alias("vec_b"),
        "cosine",
        F.col("rank").alias("rank_ab"),
    ).where(F.col("vec_a") < F.col("vec_b"))
    b = g.select(
        F.col(id_col).alias("_vb"),
        F.col("neighbor_id").alias("_va"),
        F.col("rank").alias("rank_ba"),
    )
    return a.join(
        b,
        (F.col("vec_a") == F.col("_va")) & (F.col("vec_b") == F.col("_vb")),
    ).select("vec_a", "vec_b", "cosine", "rank_ab", "rank_ba")


#: k for the label-vote classifier gate (matches the knn_graph gate k)
KNN_VOTE_K = 5


def knn_label_vote(
    embeddings: DataFrame,
    k: int = KNN_VOTE_K,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
    n_blocks: int = 8,
) -> DataFrame:
    """k-NN majority-vote label transfer across the deterministic
    holdout cut — the classic label-propagation / label-quality audit
    a training pipeline runs over a labeled embedding table (predict
    each val-split vector's label from its k nearest train-split
    vectors; disagreement with the stored label flags label noise or
    non-separable classes, the actionable sibling of
    label_centroid_similarity's global report).

    Deterministic end-to-end: the split is the portable-hash
    dataset_split cut, neighbor ranking is on the ROUND6'd cosine with
    train-id tie-break (the knn_graph total-order contract), and the
    vote argmax is integer (votes DESC, label ASC). Train vectors with
    NULL labels don't vote; val vectors keep a possibly-NULL
    true_label. Pairwise cosines come from the SAME blocked triangle
    kernel as knn_graph (pinned parallelism, no broadcast-of-corpus);
    both (val, train) orientations are emitted from ONE pass via the
    explode-of-two-structs idiom (a union of two filters would run the
    pair join twice — the span_coverage class). Output
    ``(vec_id, true_label, predicted_label, votes)`` per val vector
    with >= 1 labeled train neighbor."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.operators.dedup import embedding_neardup_pairs
    from cuda_gis_smoothing_spark.operators.sampling import dataset_split

    sp = dataset_split(embeddings.select(id_col), id_col=id_col)
    pairs = embedding_neardup_pairs(
        embeddings, threshold=-2.0, id_col=id_col, n_blocks=n_blocks
    )
    cand = pairs.join(
        sp.select(F.col(id_col).alias("vec_a"), F.col("split").alias("_sa")),
        "vec_a",
    ).join(
        sp.select(F.col(id_col).alias("vec_b"), F.col("split").alias("_sb")),
        "vec_b",
    )
    directed = (
        cand.select(
            "cosine",
            F.explode(
                F.array(
                    F.struct(
                        F.col("vec_a").alias("v"),
                        F.col("vec_b").alias("t"),
                        F.col("_sa").alias("sv"),
                        F.col("_sb").alias("st"),
                    ),
                    F.struct(
                        F.col("vec_b").alias("v"),
                        F.col("vec_a").alias("t"),
                        F.col("_sb").alias("sv"),
                        F.col("_sa").alias("st"),
                    ),
                )
            ).alias("_e"),
        )
        .where((F.col("_e.sv") == "val") & (F.col("_e.st") == "train"))
        .select(
            F.col("_e.v").alias("val_id"),
            F.col("_e.t").alias("train_id"),
            "cosine",
        )
    )
    tl = embeddings.select(
        F.col(id_col).alias("train_id"), F.col(label_col).alias("_tl")
    ).where(F.col("_tl").isNotNull())
    w = Window.partitionBy("val_id").orderBy(
        F.col("cosine").desc(), F.col("train_id").asc()
    )
    topk = (
        directed.join(tl, "train_id")
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= int(k))
    )
    votes = topk.groupBy("val_id", "_tl").agg(
        F.count(F.lit(1)).cast("long").alias("votes")
    )
    pw = Window.partitionBy("val_id").orderBy(
        F.col("votes").desc(), F.col("_tl").asc()
    )
    pred = (
        votes.withColumn("_pr", F.row_number().over(pw))
        .where(F.col("_pr") == 1)
        .select(
            "val_id",
            F.col("_tl").cast("long").alias("predicted_label"),
            "votes",
        )
    )
    truth = embeddings.select(
        F.col(id_col).alias("val_id"),
        F.col(label_col).cast("long").alias("true_label"),
    )
    return pred.join(truth, "val_id").select(
        F.col("val_id").alias(id_col), "true_label", "predicted_label", "votes"
    )


def label_confusion(
    embeddings: DataFrame,
    k: int = KNN_VOTE_K,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
    n_blocks: int = 8,
) -> DataFrame:
    """Confusion matrix of the k-NN label vote over the val split —
    the evaluation report consuming :func:`knn_label_vote` (which
    class pairs the embedding space confuses, and how much label noise
    each class carries): one integer rollup
    ``(true_label, predicted_label, n_vectors)``. NULL true_labels
    group as their own row (both engines group NULLs together). Sparse
    contract: absent combinations are absent."""
    return (
        knn_label_vote(embeddings, k, id_col, emb_col, label_col, n_blocks)
        .groupBy("true_label", "predicted_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    )


def _probe_buckets_udf(spark, cents, n_probe: int):
    """Vectorized ``n_probe``-nearest-centroid assignment (broadcast +
    numpy matmul per Arrow batch; STABLE argsort so exact
    centroid-similarity ties take the lowest cid, matching the SQL
    twins' ``ORDER BY sim DESC, cid``)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    bc = spark.sparkContext.broadcast(np.asarray(cents, dtype=np.float64))

    def _probe(emb):
        m = np.asarray([np.asarray(e, dtype=np.float64) for e in emb])
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        sims = m @ bc.value.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    _probe.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return F.pandas_udf(_probe, T.ArrayType(T.IntegerType()))


def knn_graph_ivf(
    embeddings: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    n_blocks: int = 8,
    centroids=None,
) -> DataFrame:
    """Approximate (IVF-blocked) k-NN GRAPH — the operator a 100 TB
    semantic-dedup pipeline actually runs (the exact
    :func:`knn_graph` is its recall oracle): per-vector top-k cosine
    restricted to IVF candidates, i.e. :func:`ivf_knn` semantics with
    the WHOLE corpus as the query side, built WITHOUT broadcasting the
    corpus. Output ``(vec_id, neighbor_id, cosine, rank)`` — the exact
    graph's schema; recall@k vs it is pytest-gated at two scales.

    Semantics (SQL-expressible so the driver twin checks the full
    bucket/probe/rank plumbing): centroids default to the
    ``n_centroids`` smallest-id vectors (the seeded quantizer the
    ``knn_ivf`` gate already proves cross-engine; pass ``centroids``
    from :func:`train_centroids` for trained recall — plumbing
    identical); every vector RESIDES in its nearest bucket and PROBES
    its ``n_probe`` nearest; vector v's candidates are the residents
    of v's probed buckets; cosine is exact over candidates, ranked on
    the ROUND6'd value with neighbor_id tie-break (a cross-engine
    total order).

    Scale shape: ONE corpus scan computes the probe list per vector
    (vectorized matmul; the resident bucket is its first element),
    localCheckpoint'ed because the resident and probe sides project it
    differently (two consumers would re-run the scan + UDF — the
    multi-consumer re-execution class). The candidate join is EQUI on
    ``(bucket, block)``: residents hash-block into ``n_blocks``, each
    probe row replicates across blocks — a hot bucket's pair work
    spreads over ``n_blocks`` tasks (per-task ~|bucket|²·n_probe/
    n_blocks) instead of one, at n_blocks× probe-row shuffle
    replication (probe rows are (id, emb, nrm) — corpus-linear, the
    same trade :func:`embedding_neardup_pairs` makes). Parallelism is
    PINNED with user repartition on both sides: the block keys are
    byte-tiny, so AQE would coalesce the shuffle and run every dot
    product on one core. No broadcast-of-corpus, no nested-loop node
    (plan-asserted); candidate work is Σ_buckets |bucket|·(probes into
    it) ≈ N·avg_bucket·n_probe vs the exact graph's N²/2.
    """
    import numpy as np

    from cuda_gis_smoothing_spark.functions.numeric import round6

    spark = embeddings.sparkSession
    if centroids is None:
        seeds = (
            embeddings.orderBy(id_col)
            .limit(n_centroids)
            .select(F.col("embedding").cast("array<double>"))
            .collect()
        )
        cents = np.asarray([r[0] for r in seeds], dtype=np.float64)
        cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12
    else:
        cents = np.asarray(centroids, dtype=np.float64)
    probe_udf = _probe_buckets_udf(spark, cents, n_probe)
    base = (
        with_norm(embeddings, "embedding")
        .select(
            F.col(id_col),
            "_emb",
            "_nrm",
            probe_udf(F.col("_emb")).alias("_probes"),
        )
        .localCheckpoint()
    )
    resident = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_emb").alias("c_emb"),
        F.col("_nrm").alias("c_nrm"),
        F.element_at("_probes", 1).alias("bucket"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    probe = base.select(
        F.col(id_col),
        F.col("_emb").alias("q_emb"),
        F.col("_nrm").alias("q_nrm"),
        F.explode("_probes").alias("bucket"),
    ).select(
        id_col,
        "q_emb",
        "q_nrm",
        "bucket",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("_blk"),
    )
    parts = spark.sparkContext.defaultParallelism
    pairs = (
        probe.repartition(parts, "bucket", "_blk")
        .join(resident.repartition(parts, "bucket", "_blk"), ["bucket", "_blk"])
        .where(F.col("neighbor_id") != F.col(id_col))
    )
    cos = round6(dot_col("q_emb", "c_emb") / (F.col("q_nrm") * F.col("c_nrm")))
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.select(id_col, "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            id_col, "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
        )
    )


def ivf_bucket_stats(
    embeddings: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    centroids=None,
) -> DataFrame:
    """IVF coarse-quantizer occupancy report ``(bucket, n_vectors,
    share)`` — the index-health table an ANN operator watches: probe
    cost bounds assume roughly balanced inverted lists, and a hot
    bucket (dead centroid, skewed corpus) silently degrades every
    probe to a scan of that bucket. Buckets with ZERO vectors are
    included (a dead centroid is exactly what the report must show).
    Seeded centroids by default (the SQL-exact quantizer the knn_ivf
    gate proves); pass trained ``centroids`` for the production form.

    Plan: one corpus scan through the vectorized assignment UDF, one
    C-cardinality hash aggregate, a 1-row total broadcast."""
    import numpy as np

    from cuda_gis_smoothing_spark.functions.numeric import round6

    spark = embeddings.sparkSession
    if centroids is None:
        seeds = (
            embeddings.orderBy(id_col)
            .limit(n_centroids)
            .select(F.col("embedding").cast("array<double>"))
            .collect()
        )
        cents = np.asarray([r[0] for r in seeds], dtype=np.float64)
        cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12
    else:
        cents = np.asarray(centroids, dtype=np.float64)
    probe = _probe_buckets_udf(spark, cents, 1)
    counts = (
        embeddings.select(
            F.element_at(probe(F.col("embedding")), 1).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    allb = spark.range(len(cents)).select(F.col("id").cast("int").alias("bucket"))
    tot = counts.agg(F.sum("_n").cast("double").alias("_T"))
    return (
        allb.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_vectors"),
            round6(F.coalesce(F.col("_n"), F.lit(0)) / F.col("_T")).alias("share"),
        )
    )


def ivf_silhouette(
    embeddings: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector silhouette over the seeded IVF coarse buckets — the
    clustering-quality card beside ivf_bucket_stats' occupancy report
    (is the quantizer actually separating the space, per vector):
    with cosine distance d = 1 − cosine,

        a(i) = mean d to OWN-bucket members      (NULL if singleton)
        b(i) = min over OTHER buckets of mean d  (NULL if one bucket)
        s(i) = (b − a) / max(a, b)

    Cross-engine determinism by construction: a and b are ROUND6'd
    per-bucket means FIRST (the aggregate-gate sum-association class),
    the b argmin is a struct-MIN over (rounded mean, bucket id) — a
    total order — and s divides the two ROUNDED values, so both
    engines compute s from bit-identical inputs. Pairwise distances
    come from the blocked triangle kernel (each unordered pair once,
    both directions via the explode-of-two-structs idiom — one pass).
    Output ``(vec_id, bucket, a_mean, b_mean, silhouette)``.

    Scale note: exact silhouette is inherently Σ bucket² pair work;
    the 100 TB path samples per-bucket representatives before this
    operator — the report semantics are unchanged."""
    import numpy as np

    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.dedup import embedding_neardup_pairs

    spark = embeddings.sparkSession
    seeds = (
        embeddings.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    cents = np.asarray([r[0] for r in seeds], dtype=np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12
    probe = _probe_buckets_udf(spark, cents, 1)
    # bucket attached to the corpus row and carried THROUGH the pair
    # kernel (extra_cols): the old shape joined the O(N²) directed pair
    # stream against the assignment twice — two shuffles of the widest
    # table in the plan — to recover what each pair row already knew
    # (guide §2.4: remove shuffles outright; r6 measured 7.2 → 4.2 s).
    # att feeds the kernel's two sides + the spine → localCheckpoint.
    att = embeddings.select(
        F.col(id_col),
        "embedding",
        F.element_at(probe(F.col("embedding")), 1).alias("bucket"),
    ).localCheckpoint()
    assign = att.select(F.col(id_col), "bucket")
    pairs = embedding_neardup_pairs(
        att, threshold=-2.0, id_col=id_col, extra_cols=("bucket",)
    )
    withb = pairs.select(
        (1.0 - F.col("cosine")).alias("_d"),
        F.explode(
            F.array(
                F.struct(
                    F.col("vec_a").alias("i"),
                    F.col("bucket_a").alias("_bi"),
                    F.col("bucket_b").alias("_bj"),
                ),
                F.struct(
                    F.col("vec_b").alias("i"),
                    F.col("bucket_b").alias("_bi"),
                    F.col("bucket_a").alias("_bj"),
                ),
            )
        ).alias("_e"),
    ).select(
        F.col("_e.i").alias("i"), F.col("_e._bi").alias("_bi"),
        F.col("_e._bj").alias("_bj"), "_d",
    )
    per = withb.groupBy("i", "_bi", "_bj").agg(
        round6(F.avg("_d")).alias("_m")
    )
    own = per.where(F.col("_bi") == F.col("_bj")).select(
        "i", F.col("_m").alias("a_mean")
    )
    other = (
        per.where(F.col("_bi") != F.col("_bj"))
        .groupBy("i")
        .agg(F.min(F.struct(F.col("_m").alias("m"), F.col("_bj").alias("b"))).alias("_mb"))
        .select("i", F.col("_mb.m").alias("b_mean"))
    )
    return (
        assign.select(F.col(id_col), "bucket")
        .join(own.withColumnRenamed("i", id_col), id_col, "left")
        .join(other.withColumnRenamed("i", id_col), id_col, "left")
        .select(
            id_col,
            "bucket",
            "a_mean",
            "b_mean",
            # NULL when either side is undefined (singleton bucket /
            # single occupied bucket); 0 when both rounded means are 0
            # (coincident points — the scikit convention); else the
            # ratio of the two ROUNDED values under round6. Spark ANSI
            # raises on /0 where DuckDB NULLs, so the zero branch is
            # explicit (the source_mixture_weights class).
            F.when(
                F.col("a_mean").isNull() | F.col("b_mean").isNull(),
                F.lit(None).cast("double"),
            )
            .when(
                F.greatest(F.col("a_mean"), F.col("b_mean")) == 0, F.lit(0.0)
            )
            .otherwise(
                round6(
                    (F.col("b_mean") - F.col("a_mean"))
                    / F.greatest(F.col("a_mean"), F.col("b_mean"))
                )
            )
            .alias("silhouette"),
        )
    )


def rank_overlap_report(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Per-query recall@k of an approximate ranker against the exact
    one — accuracy as a QUERYABLE, gated artifact instead of only a
    pytest floor (both inputs are themselves gated total-order
    rankers, so the integer overlap is deterministic cross-engine).
    ``exact``/``approx``: (query_id, neighbor_id, ...) top-k tables.
    Output ``(query_id, n_exact, overlap, recall)``, recall the exact
    integer ratio under round6. The exact side feeds two consumers →
    localCheckpoint."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    ex = exact.select("query_id", "neighbor_id").localCheckpoint()
    ov = (
        ex.join(approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("_ov"))
    )
    base = ex.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    return base.join(ov, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce(F.col("_ov"), F.lit(0)).cast("long").alias("overlap"),
        round6(
            F.coalesce(F.col("_ov"), F.lit(0)).cast("double") / F.col("n_exact")
        ).alias("recall"),
    )


def recall_report_sql(exact_sql: str, approx_sql: str) -> str:
    """DuckDB twin builder for :func:`rank_overlap_report` — nests the
    two gated ranker SQLs as derived tables (the rrf_fusion
    composition precedent: one ranking definition each, no drift)."""
    return f"""
WITH x AS (SELECT query_id, neighbor_id FROM ({exact_sql})),
a AS (SELECT query_id, neighbor_id FROM ({approx_sql})),
ov AS (
  SELECT x.query_id, COUNT(*) AS overlap
  FROM x JOIN a ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
  GROUP BY 1
),
b AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM x GROUP BY 1)
SELECT b.query_id, b.n_exact,
       CAST(COALESCE(ov.overlap, 0) AS BIGINT) AS overlap,
       ROUND(COALESCE(ov.overlap, 0) * 1.0 / b.n_exact + 1e-09, 6) AS recall
FROM b LEFT JOIN ov USING (query_id)
""".strip()


def embedding_norms(embeddings: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Embedding-table dataset card: ONE row of
    ``(n_vectors, n_dims, min_norm, max_norm, avg_norm, n_zero)`` —
    the sanity profile every similarity/ANN pipeline checks before
    indexing (a zero vector poisons cosine; a norm spread of orders of
    magnitude means unnormalized embeddings; a dim mismatch means a
    corrupted batch — n_dims is the MAX so a short vector shows up as
    a smaller-than-expected avg norm and a caller comparing against
    the model's dim catches it). One scan, one hash aggregate."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    n = with_norm(embeddings, emb_col)
    return n.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.max(F.size("_emb")).cast("int").alias("n_dims"),
        round6(F.min("_nrm")).alias("min_norm"),
        round6(F.max("_nrm")).alias("max_norm"),
        round6(F.avg("_nrm")).alias("avg_norm"),
        F.sum((F.col("_nrm") < 1e-12).cast("long")).cast("long").alias("n_zero"),
    )


def ivf_knn_trained(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    iters: int = 3,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN over k-means‖-trained centroids (:func:`train_centroids`)
    — the recall-at-scale path; pytest gates its recall@k against the
    seeded variant and exact brute force on the fixture corpus."""
    cents = train_centroids(
        embeddings, n_centroids=n_centroids, iters=iters, id_col=id_col
    )
    return ivf_knn(
        embeddings,
        queries,
        k=k,
        n_centroids=n_centroids,
        n_probe=n_probe,
        id_col=id_col,
        query_id_col=query_id_col,
        centroids=cents,
    )


class IVFIndex:
    """Persisted IVF index: build once, probe many — the amortized form
    of :func:`ivf_knn` for a corpus that outlives its queries.

    Layout under ``path``:
      * ``centroids/`` — (bucket, centroid array<double>), C tiny rows
      * ``corpus/``    — (vec_id, c_emb, c_nrm) parquet PARTITIONED BY
        bucket: Spark's partition directories ARE the IVF inverted
        lists, so a probe reads only the probed buckets' files
        (PartitionFilters prune the rest — at 100 TB, a 2-of-64-bucket
        probe scans ~3% of the corpus; plan-asserted in tests)

    Query: probe buckets per query vector (numpy matmul over the
    broadcast centroids), collect the probed bucket SET (bounded by
    n_probe * #queries — queries are the broadcast-small side by
    assumption), STATIC-prune the corpus scan with it, then the same
    bucket equi-join + exact rerank as :func:`ivf_knn` — results are
    identical to ivf_knn over the same centroids (tested).

    A query set too large to broadcast probes ~every bucket, so
    pruning buys nothing there: skip the collect and shuffle-join
    :meth:`probe_buckets` output against the corpus on the bucket key
    directly (both sides hash-partitioned on a C-cardinality key —
    salt with plans.partitioning.salted_join if C is small relative to
    the cluster)."""

    def __init__(self, spark, path: str, centroids):
        import numpy as np

        self.spark = spark
        self.path = path
        self.centroids = np.asarray(centroids, dtype=np.float64)
        # broadcast ONCE — "build once, probe many" must not leak one
        # driver+executor broadcast per query() call
        self._bc = spark.sparkContext.broadcast(self.centroids)

    @classmethod
    def build(
        cls,
        embeddings: DataFrame,
        path: str,
        n_centroids: int = 8,
        iters: int = 3,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        max_train_rows: int = 65536,
    ) -> "IVFIndex":
        import os

        spark = embeddings.sparkSession
        cents = train_centroids(
            embeddings,
            n_centroids=n_centroids,
            iters=iters,
            id_col=id_col,
            emb_col=emb_col,
            max_train_rows=max_train_rows,
        )
        assign = _nearest_bucket_udf(spark, cents)
        corpus = with_norm(embeddings, emb_col).select(
            F.col(id_col).alias("vec_id"),
            F.col("_emb").alias("c_emb"),
            F.col("_nrm").alias("c_nrm"),
            assign(F.col("_emb")).alias("bucket"),
        )
        corpus.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(path, "corpus")
        )
        spark.createDataFrame(
            [(b, [float(x) for x in c]) for b, c in enumerate(cents)],
            "bucket int, centroid array<double>",
        ).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
        return cls(spark, path, cents)

    @classmethod
    def load(cls, spark, path: str) -> "IVFIndex":
        import os

        import numpy as np

        rows = (
            spark.read.parquet(os.path.join(path, "centroids"))
            .orderBy("bucket")
            .collect()
        )
        cents = np.asarray([r["centroid"] for r in rows], dtype=np.float64)
        return cls(spark, path, cents)

    def probe_buckets(self, queries: DataFrame, n_probe: int,
                      query_id_col: str = "query_id") -> DataFrame:
        """(query_id, q_emb, q_nrm, bucket) — one row per probed bucket."""
        return probe_rows(queries, self._bc, n_probe, query_id_col)

    def query(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 2,
        query_id_col: str = "query_id",
        prune: bool = True,
    ) -> DataFrame:
        """``prune=True`` (default) is the broadcast-small-queries path:
        collect the probed bucket set and static-prune the corpus scan.
        ``prune=False`` is the LARGE-query-set path: no driver-side
        collect at all — the probe output shuffle-joins the full corpus
        on the bucket key (a big query set probes ~every bucket anyway,
        so pruning buys nothing there). Results identical (tested)."""
        import os

        q = self.probe_buckets(queries, n_probe, query_id_col)
        corpus = self.spark.read.parquet(os.path.join(self.path, "corpus"))
        return probe_join_rank(corpus, q, k, query_id_col, prune)


def probe_rows(
    queries: DataFrame, bc, n_probe: int, query_id_col: str = "query_id"
) -> DataFrame:
    """(query_id, q_emb, q_nrm, bucket) probe rows against an ALREADY
    BROADCAST centroid matrix ``bc`` — shared by the persisted and the
    maintained IVF indexes, which both broadcast ONCE at construction
    ('build once, probe many' must not leak one broadcast per query)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    def _probe(emb):
        m = np.asarray([np.asarray(e, dtype=np.float64) for e in emb])
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        sims = m @ bc.value.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    _probe.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    probe = F.pandas_udf(_probe, T.ArrayType(T.IntegerType()))
    return with_norm(queries, "embedding").select(
        F.col(query_id_col),
        F.col("_emb").alias("q_emb"),
        F.col("_nrm").alias("q_nrm"),
        F.explode(probe("embedding")).alias("bucket"),
    )


def probe_join_rank(
    corpus: DataFrame,
    q: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    prune: bool = True,
) -> DataFrame:
    """The IVF probe/join/rank tail shared by :class:`IVFIndex` and the
    maintained index: ``corpus`` is (vec_id, c_emb, c_nrm, bucket) rows,
    ``q`` the probe rows from :func:`probe_rows`. ``prune`` collects
    the (query-bounded) probed bucket set and static-filters the corpus
    — partition pruning when the corpus is bucket-partitioned parquet."""
    if prune:
        q = q.localCheckpoint()  # consumed twice: bucket set + join
        probed = sorted(
            r["bucket"] for r in q.select("bucket").distinct().collect()
        )
        corpus = corpus.where(
            F.col("bucket").isin(probed)  # static partition pruning
        )
    q_side = F.broadcast(q) if prune else q  # large sets: shuffle join
    pairs = corpus.join(q_side, "bucket").where(
        F.col("vec_id") != F.col(query_id_col)
    )
    sim = (
        dot_col("c_emb", "q_emb") / (F.col("c_nrm") * F.col("q_nrm"))
    ).alias("sim")
    ranked = pairs.select(
        query_id_col, F.col("vec_id").alias("neighbor_id"), sim
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(query_id_col).orderBy(
                F.col("sim").desc(), F.col("neighbor_id").asc()
            )
        ),
    )
    return ranked.where(F.col("rank") <= k).select(
        query_id_col, "neighbor_id", "rank"
    )


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


def label_centroid_similarity(
    embeddings: DataFrame,
    emb_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Class-separation audit over the embedding space: per-label
    centroid, then pairwise cosine between label centroids — near-1.0
    cosines mean the embedding model does not separate those classes
    (or the labels are noise), the first question asked of any labeled
    embedding table. Cosine is computed from per-dimension SUMS (the
    mean's 1/n cancels), so the heavy work is ONE posexplode +
    (label, dim) hash aggregate — L×d rows out — and the pair stage
    joins centroid COORDINATES (L²·d bounded rows), never vectors.
    NULL labels and NULL embeddings are excluded. Output per pair
    (a < b): ``(label_a, label_b, n_a, n_b, centroid_cosine)``.
    Cross-row double sums sit under round6 like every aggregate gate
    (the morans_i / source_kl precedent); the per-dimension fold order
    inside a pair is a SEQUENTIAL 64-term join-aggregate in both
    engines."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    coords = (
        embeddings.where(
            F.col(label_col).isNotNull() & F.col(emb_col).isNotNull()
        )
        .select(F.col(label_col).alias("label"), F.posexplode(emb_col))
        .groupBy("label", "pos")
        .agg(
            F.sum(F.col("col").cast("double")).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        .localCheckpoint()  # two pair-join sides
    )
    stats = coords.groupBy("label").agg(
        F.max("_n").cast("long").alias("n"),
        F.sum(F.col("_s") * F.col("_s")).alias("_sq"),
    )

    def side(suffix: str) -> DataFrame:
        return coords.select(
            F.col("label").alias(f"label_{suffix}"),
            "pos",
            F.col("_s").alias(f"_s{suffix}"),
        )

    num = (
        side("a")
        .join(side("b"), "pos")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("_sa") * F.col("_sb")).alias("_dot"))
    )
    sa = stats.select(
        F.col("label").alias("label_a"),
        F.col("n").alias("n_a"),
        F.col("_sq").alias("_sqa"),
    )
    sb = stats.select(
        F.col("label").alias("label_b"),
        F.col("n").alias("n_b"),
        F.col("_sq").alias("_sqb"),
    )
    return (
        num.join(sa, "label_a")
        .join(sb, "label_b")
        .select(
            F.col("label_a").cast("int").alias("label_a"),
            F.col("label_b").cast("int").alias("label_b"),
            "n_a",
            "n_b",
            round6(
                F.col("_dot") / (F.sqrt("_sqa") * F.sqrt("_sqb"))
            ).alias("centroid_cosine"),
        )
    )


def label_centroid_sql(source: str = "embeddings") -> str:
    """DuckDB twin of :func:`label_centroid_similarity` over any
    relation providing ``(label, embedding)`` — the ONE centroid-pair
    twin builder (the zipf_sql_from_counts precedent) behind the label
    gate and the split-drift gate."""
    return f"""
WITH coords AS (
  SELECT label, i - 1 AS pos,
         SUM(CAST(embedding[i] AS DOUBLE)) AS s,
         COUNT(*) AS n
  FROM {source}, LATERAL (
    SELECT unnest(generate_series(1, len(embedding))) AS i
  )
  WHERE label IS NOT NULL AND embedding IS NOT NULL
  GROUP BY 1, 2
),
stats AS (
  SELECT label, CAST(MAX(n) AS BIGINT) AS n, SUM(s * s) AS sq
  FROM coords GROUP BY label
),
num AS (
  SELECT a.label AS label_a, b.label AS label_b, SUM(a.s * b.s) AS dot
  FROM coords a JOIN coords b ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2
)
SELECT CAST(num.label_a AS INT) AS label_a,
       CAST(num.label_b AS INT) AS label_b,
       sa.n AS n_a, sb.n AS n_b,
       ROUND(num.dot / (SQRT(sa.sq) * SQRT(sb.sq)) + 1e-09, 6) AS centroid_cosine
FROM num
JOIN stats sa ON sa.label = num.label_a
JOIN stats sb ON sb.label = num.label_b
""".strip()


LABEL_CENTROID_SQL = label_centroid_sql()

#: split ids shared by split_centroid_drift and its twin (ordering
#: train < val < test rides the integer encoding)
SPLIT_IDS = {0: "train", 1: "val", 2: "test"}


def split_centroid_drift(
    embeddings: DataFrame, emb_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Distribution-shift audit across the holdout cut: pairwise
    centroid cosine BETWEEN dataset splits (train/val/test assigned by
    the SAME portable hash as :func:`~cuda_gis_smoothing_spark.
    operators.sampling.dataset_split`) — a low train↔test centroid
    cosine means the deterministic split is not iid in embedding space
    (ingestion-order correlation), the check run before trusting
    holdout metrics. Splits ride as INTEGER labels (0/1/2) through the
    SHARED :func:`label_centroid_similarity` kernel, then map to
    names. Output per pair: ``(split_a, split_b, n_a, n_b,
    centroid_cosine)``."""
    from cuda_gis_smoothing_spark.operators.sampling import (
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        sample_hash_col,
    )

    h = sample_hash_col(id_col)
    sid = (
        F.when(h < SPLIT_TRAIN_LT, 0).when(h < SPLIT_VAL_LT, 1).otherwise(2)
    )
    tagged = embeddings.select(
        sid.alias("label"), F.col(emb_col).alias("embedding")
    )
    out = label_centroid_similarity(tagged, "embedding", "label")

    def name(col: str):
        expr = None
        for i, nm in SPLIT_IDS.items():
            c = F.col(col) == i
            expr = F.when(c, nm) if expr is None else expr.when(c, nm)
        return expr

    return out.select(
        name("label_a").alias("split_a"),
        name("label_b").alias("split_b"),
        "n_a",
        "n_b",
        "centroid_cosine",
    )


def split_centroid_drift_sql() -> str:
    """DuckDB twin of :func:`split_centroid_drift` — the shared
    centroid builder over the hash-tagged subquery, ids mapped to the
    same names."""
    from cuda_gis_smoothing_spark.operators.sampling import (
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        sample_hash_sql,
    )

    h = sample_hash_sql("vec_id")
    src = f"""(
    SELECT CASE WHEN {h} < {SPLIT_TRAIN_LT} THEN 0
                WHEN {h} < {SPLIT_VAL_LT} THEN 1
                ELSE 2 END AS label,
           embedding
    FROM embeddings
  )"""
    cases_a = " ".join(
        f"WHEN label_a = {i} THEN '{nm}'" for i, nm in SPLIT_IDS.items()
    )
    cases_b = " ".join(
        f"WHEN label_b = {i} THEN '{nm}'" for i, nm in SPLIT_IDS.items()
    )
    return f"""
SELECT CASE {cases_a} END AS split_a,
       CASE {cases_b} END AS split_b,
       n_a, n_b, centroid_cosine
FROM ({label_centroid_sql(src)})
""".strip()


#: outliers reported per label (shared by the operator and its twin)
EMBEDDING_OUTLIERS_K = 5


def embedding_outliers(
    embeddings: DataFrame,
    k: int = EMBEDDING_OUTLIERS_K,
    emb_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label embedding outliers: the ``k`` vectors FARTHEST from
    their own label's centroid by cosine — the mislabeled-example /
    contamination screen run before training on labeled embeddings
    (:func:`label_centroid_similarity` asks whether classes separate;
    this asks which members don't belong).

    Twin-exactness by the ROUND-FIRST layering (the ivf_silhouette
    precedent): the per-(label, dim) SUM — the one cross-row float
    aggregate — is round6'ed FIRST, the centroid is assembled from the
    rounded coordinates (ordered by pos: unique, so collect order is
    never observable), and everything downstream (dot products, norms,
    cosine, the rank cut) is a SEQUENTIAL fold / scalar op over
    bit-identical inputs in both engines — zero association exposure
    past the rounded layer. The mean's 1/n cancels in cosine, so sums
    stand in for centroids. Rank total-orders on (round6 cosine ASC,
    vec_id ASC). NULL labels / embeddings are excluded.

    Output ``(label, vec_id, centroid_cosine, rank)``, k rows per
    label. Plan (100 TB): one posexplode + (label, dim) hash aggregate
    (L×d rows), the L-row centroid table broadcast back onto the
    corpus, and a per-label top-k window over corpus rows — one
    shuffle on label, bounded output L·k."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    valid = embeddings.where(
        F.col(label_col).isNotNull() & F.col(emb_col).isNotNull()
    )
    coords = (
        valid.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(emb_col).cast("array<double>")),
        )
        .groupBy("label", "pos")
        .agg(round6(F.sum("col")).alias("_s"))
    )
    cen = coords.groupBy("label").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, _s))), x -> x._s)"
        ).alias("_cen")
    )
    v = with_norm(valid, emb_col).select(
        F.col(label_col).alias("label"), "vec_id", "_emb", "_nrm"
    )
    cos = (
        dot_col("_emb", "_cen")
        / (F.col("_nrm") * F.sqrt(dot_col("_cen", "_cen")))
    )
    scored = v.join(F.broadcast(cen), "label").select(
        "label", "vec_id", round6(cos).alias("centroid_cosine")
    )
    w = Window.partitionBy("label").orderBy(
        F.col("centroid_cosine").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
        .select("label", "vec_id", "centroid_cosine", "rank")
    )


def embedding_outliers_sql(k: int = EMBEDDING_OUTLIERS_K) -> str:
    """DuckDB twin of :func:`embedding_outliers` — identical rounded
    layer, then list_dot_product (the knn_cosine fold precedent)."""
    return f"""
WITH valid AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
  WHERE label IS NOT NULL AND embedding IS NOT NULL
),
coords AS (
  SELECT label, i - 1 AS pos,
         ROUND(SUM(emb[i]) + 1e-09, 6) AS s
  FROM valid, LATERAL (
    SELECT unnest(generate_series(1, len(emb))) AS i
  )
  GROUP BY 1, 2
),
cen AS (
  SELECT label, LIST(s ORDER BY pos) AS cen FROM coords GROUP BY label
),
scored AS (
  SELECT v.label, v.vec_id,
         ROUND(list_dot_product(v.emb, c.cen)
               / (SQRT(list_dot_product(v.emb, v.emb))
                  * SQRT(list_dot_product(c.cen, c.cen))) + 1e-09, 6) AS centroid_cosine
  FROM valid v JOIN cen c ON c.label = v.label
)
SELECT label, vec_id, centroid_cosine, CAST(rank AS INT) AS rank FROM (
  SELECT label, vec_id, centroid_cosine,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY centroid_cosine ASC, vec_id ASC) AS rank
  FROM scored
)
WHERE rank <= {int(k)}
""".strip()
