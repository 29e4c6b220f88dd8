"""Product quantization (PQ) over embedding columns — the missing
member of the ANN family beside IVF (similarity.py): at 100 TB the
standard vector-index layout is IVF-PQ, where each vector is stored as
``m`` small sub-codes instead of ``dim`` floats (here 8 bytes/vector vs
256 — a 32x memory cut), and search scans CODES with asymmetric
distance computation (ADC), touching the original floats never.

Reference parity note: the reference engine (CUDA grid smoothing,
SURVEY.md §1) has no vector layer; this extends the graft's
similarity-search surface (SURVEY.md §2 additions) the way IVFIndex
does, and composes with it (the IVF bucket prunes candidates, PQ
compresses what remains).

Determinism contract (the seeded-IVF precedent, similarity.py:613):
sub-centroids are SEEDED — sub-centroid (s, j) is subspace ``s`` of the
``j``-th smallest-id vector, raw (NOT normalized: PQ quantizes raw
coordinates; L2 on raw vectors is the metric). Every distance is a
composition of SEQUENTIAL-fold dot products (``aggregate(zip_with(...))``
in Spark, ``list_dot_product`` in DuckDB — both left-to-right, so the
doubles are bit-identical cross-engine, the knn_cosine precedent) and
every argmin/rank breaks ties on the integer id — total orders, gates
tie-proof. A trained variant would follow the train_centroids pattern
(recall-gated, rows-only); the seeded form keeps the full
encode/reconstruct/ADC plumbing SQL-twin-checkable.

Scale notes (100 TB):
  * Encoding is ONE corpus scan cross-joined with a BROADCAST literal-
    sized table (m * ksub sub-centroids — 128 rows here), folded by a
    hash aggregate (struct-min argmin, no window sort). No shuffle of
    the embedding column beyond the final (vec, subspace, code) rows.
  * ADC search scans the (vec, code) table + reconstructions; the
    original float vectors are read ONCE at encode time. Query side is
    a broadcast; per-query top-k via window at #queries * k output.
  * Codes are INTs; the (vec_id, subspace, code) table is the 100 TB
    stored artifact (partitionBy subspace or bucket on a real lake).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from cuda_gis_smoothing_spark.operators.similarity import dot_col


def _slice_col(arr: str, s: str, dsub: str) -> Column:
    """1-based subspace slice: elements [s*dsub+1, (s+1)*dsub]."""
    return F.expr(f"slice({arr}, {s} * {dsub} + 1, {dsub})")


def codebook_from_seeds(seeds: DataFrame, m: int) -> DataFrame:
    """Slice full seed vectors ``(cid, _e array<double>)`` into the
    (cid, s, sub) sub-centroid table. m * ksub rows — literal-sized,
    always broadcast by callers."""
    return (
        seeds.select("cid", "_e", F.explode(F.expr(f"sequence(0, {m - 1})")).alias("s"))
        .select(
            "cid",
            "s",
            _slice_col("_e", "s", f"(size(_e) DIV {m})").alias("sub"),
        )
    )


def pq_subcentroids(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """The seeded codebook: (cid, s, sub) — subspace ``s`` of the
    ``cid``-th smallest-id vector (cid in [0, ksub)), raw doubles."""
    w = Window.orderBy(id_col)
    seeds = (
        embeddings.select(id_col, F.col(emb_col).cast("array<double>").alias("_e"))
        .orderBy(id_col)
        .limit(ksub)
        .withColumn("cid", F.row_number().over(w) - 1)
    )
    return codebook_from_seeds(seeds, m)


def seeded_book(
    embeddings: DataFrame,
    ksub: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> list:
    """The seeded codebook as driver rows: the ``ksub`` smallest-id
    vectors' exact doubles (bounded collect — the ivf_knn seed
    convention). Shape (ksub, dim), feeds :func:`pq_encode_against`."""
    rows = (
        embeddings.orderBy(id_col)
        .limit(ksub)
        .select(F.col(emb_col).cast("array<double>"))
        .collect()
    )
    return [list(r[0]) for r in rows]


def _seq_sq_norm(sub) -> float:
    """Σ x² as a SEQUENTIAL left fold (plain loop — NOT np.dot, whose
    pairwise/SIMD accumulation order differs): bit-identical to both
    engines' fold-based dot products over the same doubles."""
    acc = 0.0
    for x in sub:
        acc += float(x) * float(x)
    return acc


def _book_lit(book, m: int) -> Column:
    """The codebook as a LITERAL nested array column
    ``array<array<struct<sub array<double>, cc double>>>`` indexed
    [s][j] — m·ksub·dsub doubles (~2 k here), small enough to live in
    the plan like the k-ring offset literals. ``cc = c·c`` is
    precomputed (sequential fold) so encode needs ONE dot per
    candidate."""
    ksub = len(book)
    dim = len(book[0])
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    dsub = dim // m
    return F.array(
        *[
            F.array(
                *[
                    F.struct(
                        F.array(
                            *[
                                F.lit(float(x))
                                for x in row[s * dsub : (s + 1) * dsub]
                            ]
                        ).alias("sub"),
                        F.lit(_seq_sq_norm(row[s * dsub : (s + 1) * dsub])).alias(
                            "cc"
                        ),
                    )
                    for row in book
                ]
            )
            for s in range(m)
        ]
    )


def pq_encode_against(
    embeddings: DataFrame,
    book,
    m: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """:func:`pq_encode` against an EXPLICIT (ksub, dim) codebook
    (driver rows / numpy — the maintained-index path freezes one at
    construction; encode arithmetic must not depend on where the seeds
    came from).

    The whole argmin is a PURE PROJECTION: the codebook is a literal
    nested array, per-subspace scores are a higher-order transform
    (``c.cc − 2·c·v`` — the v·v term is constant per (vector,
    subspace), so dropping it preserves the argmin), and the code is
    ``array_position(scores, array_min(scores)) − 1`` — first match =
    lowest cid, the twin's ROW_NUMBER (score, cid) tie-break. One
    corpus scan, whole-stage codegen, ZERO joins/shuffles/aggregates
    (the first cut used a struct-MIN aggregate, which Spark compiles
    to SortAggregate — struct buffers aren't hash-aggregable — and
    sorted the N·m·ksub candidate stream; the literal form deletes
    the stream entirely). Scores are projected to a named column
    BEFORE the argmin consumes them twice (the CollapseProject
    cheap-expr rule would otherwise re-evaluate every dot product —
    the CLAUDE.md language-argmax lesson).

    Rows with a NULL embedding are filtered: they produce NO code rows
    (callers needing tombstones emit them — the MaintainedPQ
    contract)."""
    dot = (
        "aggregate(zip_with(c.sub, slice(_e, s * _dsub + 1, _dsub), "
        "(x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return (
        embeddings.select(id_col, F.col(emb_col).cast("array<double>").alias("_e"))
        .where(F.col("_e").isNotNull())
        .withColumn("_dsub", F.expr(f"size(_e) DIV {m}"))
        .withColumn("_cb", _book_lit(book, m))
        .withColumn(
            "_sc",
            F.expr(
                f"transform(sequence(0, {m - 1}), s -> "
                f"transform(element_at(_cb, s + 1), c -> c.cc - 2.0D * {dot}))"
            ),
        )
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {m - 1}), s -> "
                    "array_position(element_at(_sc, s + 1), "
                    "array_min(element_at(_sc, s + 1))) - 1)"
                )
            ).alias("subspace", "code"),
        )
        .select(
            id_col,
            F.col("subspace").cast("int").alias("subspace"),
            F.col("code").cast("int").alias("code"),
        )
    )


def pq_encode(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` sub-codes: code_s = argmin_j
    ||v_s − c_{s,j}||², ties to the smallest j, under the SEEDED
    codebook. Output: (vec_id, subspace, code) — one row per vector
    per subspace, all integers. See :func:`pq_encode_against` for the
    pure-projection plan shape."""
    return pq_encode_against(
        embeddings,
        seeded_book(embeddings, ksub, id_col, emb_col),
        m,
        id_col,
        emb_col,
    )


def pq_reconstruct_against(
    codes: DataFrame, codebook: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """(id, recon array<double>) from a (id, subspace, code) table and
    a (cid, s, sub) codebook: chosen sub-centroids concatenated in
    subspace order (sort_array over distinct-s structs →
    deterministic). The maintained-index serving path reads STORED
    codes through this — the original floats never."""
    cents = F.broadcast(
        codebook.select(
            F.col("s").cast("int").alias("subspace"),
            F.col("cid").cast("int").alias("code"),
            "sub",
        )
    )
    return (
        codes.join(cents, ["subspace", "code"])
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("subspace", "sub"))).alias("_a"))
        .select(id_col, F.expr("flatten(transform(_a, x -> x.sub))").alias("recon"))
    )


def pq_reconstruct(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(vec_id, recon array<double>): each vector's quantized
    reconstruction under the seeded codebook."""
    return pq_reconstruct_against(
        pq_encode(embeddings, m, ksub, id_col, emb_col),
        pq_subcentroids(embeddings, m, ksub, id_col, emb_col),
        id_col,
    )


def pq_search(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: rank the corpus for each query by
    ``||q − recon(v)||² = q·q + r·r − 2·q·r`` — the query stays exact,
    the corpus is its PQ reconstruction (that asymmetry is the A in
    ADC). Composition identical in the twin, every dot a sequential
    fold → bit-identical doubles; rank on (dist asc, neighbor_id) is a
    total order. Self-pairs excluded (the knn convention — ADC
    self-distance is the quantization error, not 0).

    Output: (query_id, neighbor_id, adc_dist round6, rank). Recall vs
    exact L2 is pytest-gated (tests/test_quantization.py); at 100 TB
    this scans codes/reconstructions only — compose with IVFIndex
    buckets to also prune the candidate set."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    recon = pq_reconstruct(embeddings, m, ksub, id_col, emb_col).select(
        F.col(id_col).alias("neighbor_id"),
        "recon",
        dot_col("recon", "recon").alias("_rr"),
    )
    q = queries.select(
        query_id_col, F.col(emb_col).cast("array<double>").alias("_q")
    ).withColumn("_qq", dot_col("_q", "_q"))
    pairs = recon.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col))
    dist = (
        F.col("_qq") + F.col("_rr") - F.lit(2.0) * dot_col("_q", "recon")
    ).alias("_d")
    ranked = pairs.select(query_id_col, "neighbor_id", dist).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(query_id_col).orderBy(
                F.col("_d").asc(), F.col("neighbor_id").asc()
            )
        ),
    )
    return ranked.where(F.col("rank") <= k).select(
        query_id_col,
        "neighbor_id",
        round6(F.col("_d")).alias("adc_dist"),
        F.col("rank").cast("int").alias("rank"),
    )


def ivfpq_search(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: THE 100 TB vector-search layout (the FAISS IVFPQ index,
    re-expressed Spark-first) — the IVF coarse quantizer prunes
    CANDIDATES (only vectors in the query's ``n_probe`` nearest
    buckets are scored) while PQ compresses the SCORING (candidates
    ranked by ADC over reconstructions, the floats never read at query
    time). Composes the two seeded quantizers verbatim: buckets are
    ivf_knn's (cosine argmax over the ``n_centroids`` smallest-id
    vectors, normalized — similarity.py:181), fine ranking is
    pq_search's ADC L2 (coarse probe by cosine, fine rank by L2 — the
    standard mixed-metric IVFPQ recipe; documented, tested:
    probing ALL buckets recovers pq_search exactly).

    Both quantizers seeded ⇒ the full bucket/probe/encode/ADC pipeline
    has a DuckDB twin; recall is pytest-gated. Plan shape: candidate
    join shuffles on bucket id only; the query side (probe explode) is
    a broadcast; per-query top-k via window at #queries × k output.

    Output: (query_id, neighbor_id, adc_dist round6, rank)."""
    import numpy as np

    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.similarity import (
        _nearest_bucket_udf,
        _probe_buckets_udf,
    )

    spark = embeddings.sparkSession
    seeds = (
        embeddings.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(emb_col).cast("array<double>"))
        .collect()
    )
    cents = np.asarray([r[0] for r in seeds], dtype=np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12
    nearest = _nearest_bucket_udf(spark, cents)
    probe = _probe_buckets_udf(spark, cents, n_probe)

    recon = pq_reconstruct(embeddings, m, ksub, id_col, emb_col)
    corpus = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), nearest(emb_col).alias("bucket")
        )
        .join(recon.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
        .withColumn("_rr", dot_col("recon", "recon"))
    )
    q = queries.select(
        query_id_col,
        F.col(emb_col).cast("array<double>").alias("_q"),
        F.explode(probe(emb_col)).alias("bucket"),
    ).withColumn("_qq", dot_col("_q", "_q"))
    pairs = corpus.join(F.broadcast(q), "bucket").where(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    dist = (
        F.col("_qq") + F.col("_rr") - F.lit(2.0) * dot_col("_q", "recon")
    ).alias("_d")
    ranked = pairs.select(query_id_col, "neighbor_id", dist).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(query_id_col).orderBy(
                F.col("_d").asc(), F.col("neighbor_id").asc()
            )
        ),
    )
    return ranked.where(F.col("rank") <= k).select(
        query_id_col,
        "neighbor_id",
        round6(F.col("_d")).alias("adc_dist"),
        F.col("rank").cast("int").alias("rank"),
    )


def sq_dim_stats(
    embeddings: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Per-dimension (dim, lo, hi) calibration for scalar quantization:
    one posexplode + min/max aggregate over the corpus — and min/max
    are ASSOCIATION-ORDER-FREE, so unlike sums these corpus aggregates
    are bit-identical cross-engine with no sequential-fold gymnastics.
    dim-count rows — broadcast by every consumer. At 100 TB this is
    the one calibration pass; the table is the stored artifact."""
    return (
        embeddings.select(
            F.posexplode(F.col(emb_col).cast("array<double>")).alias("dim", "_x")
        )
        .groupBy("dim")
        .agg(F.min("_x").alias("lo"), F.max("_x").alias("hi"))
    )


def sq_encode(
    embeddings: DataFrame,
    levels: int = 256,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """SQ8-style scalar quantization — the OTHER standard compressed
    vector layout beside PQ (FAISS SQ8): each dimension is quantized
    independently to ``levels`` uniform buckets over its corpus
    [lo, hi] range,

        code = min(levels − 1, floor((x − lo) / (hi − lo) · levels))

    (x = hi lands in the top bucket via the min-clamp; a CONSTANT
    dimension (hi == lo) gets code 0 — both engines identically). The
    boundary floor goes through floor_stable, the repo's cross-engine
    .5-tie contract. Output: (vec_id, dim, code int) — 4x smaller than
    PQ codes per stored value but no inter-dim structure; all-integer,
    twin-gated.

    Plan: ONE corpus scan posexploded against the broadcast dim-stats
    table; pure column arithmetic, no UDFs, no windows."""
    from cuda_gis_smoothing_spark.functions.numeric import floor_stable

    stats = F.broadcast(sq_dim_stats(embeddings, id_col, emb_col))
    vals = embeddings.select(
        id_col,
        F.posexplode(F.col(emb_col).cast("array<double>")).alias("dim", "_x"),
    )
    raw = floor_stable(
        (F.col("_x") - F.col("lo")) / (F.col("hi") - F.col("lo")) * F.lit(float(levels))
    )
    code = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(F.lit(levels - 1), raw)
    )
    return vals.join(stats, "dim").select(
        id_col,
        F.col("dim").cast("int").alias("dim"),
        code.cast("int").alias("code"),
    )


def sq_search(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    levels: int = 256,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over scalar-quantized reconstructions: each stored
    code decodes to its bucket MIDPOINT,

        x̂ = lo + (code + 0.5) · (hi − lo) / levels

    and candidates rank by ``q·q + r·r − 2·q·r`` over the
    reconstruction array (dims reassembled in order via sort_array —
    the PQ recon convention, so every distance is a sequential fold,
    bit-identical cross-engine). Same output shape and total order as
    :func:`pq_search`. Constant dims decode to lo + 0.5·0 = lo.

    Output: (query_id, neighbor_id, adc_dist round6, rank)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    stats = F.broadcast(sq_dim_stats(embeddings, id_col, emb_col))
    xhat = F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
        F.col("lo")
        + (F.col("code") + F.lit(0.5))
        * (F.col("hi") - F.col("lo"))
        / F.lit(float(levels))
    )
    recon = (
        sq_encode(embeddings, levels, id_col, emb_col)
        .join(stats, "dim")
        .select(id_col, "dim", xhat.alias("_xh"))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("dim", "_xh"))).alias("_a"))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.expr("transform(_a, x -> x._xh)").alias("recon"),
        )
        .withColumn("_rr", dot_col("recon", "recon"))
    )
    q = queries.select(
        query_id_col, F.col(emb_col).cast("array<double>").alias("_q")
    ).withColumn("_qq", dot_col("_q", "_q"))
    pairs = recon.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col))
    dist = (
        F.col("_qq") + F.col("_rr") - F.lit(2.0) * dot_col("_q", "recon")
    ).alias("_d")
    ranked = pairs.select(query_id_col, "neighbor_id", dist).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(query_id_col).orderBy(
                F.col("_d").asc(), F.col("neighbor_id").asc()
            )
        ),
    )
    return ranked.where(F.col("rank") <= k).select(
        query_id_col,
        "neighbor_id",
        round6(F.col("_d")).alias("adc_dist"),
        F.col("rank").cast("int").alias("rank"),
    )


def train_pq_codebook(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_train_rows: int = 65536,
):
    """Per-subspace k-means PQ codebook training — what production PQ
    runs (the seeded codebook keeps the gate SQL-exact; THIS one buys
    recall). Deterministic, no RNG: the training sample is hash-ranked
    (the train_centroids pool convention — bounded collect, never the
    corpus), per-subspace init is the first ``ksub`` sample subvectors,
    Lloyd runs in float64 numpy with argmin ties to the lowest cid and
    empty clusters keeping their previous centroid.

    Returns a (ksub, dim) float64 matrix — row j's subspace-s slice is
    sub-centroid (s, j), the concatenated layout ``codebook_from_seeds``
    and ``MaintainedPQ`` consume directly (subspaces are independent, so
    any (m, ksub, dsub) codebook reshapes losslessly into full-vector
    rows). Like train_centroids: numpy means aggregate doubles, so
    callers gate on RECALL, not bit-exact codes — the trained gate is
    rows-only BY DESIGN."""
    import numpy as np

    pool_rows = (
        embeddings.select(
            F.col(emb_col).cast("array<double>").alias("_e"),
            F.pmod(F.hash(F.col(id_col)), F.lit(1_000_003)).alias("_r"),
            F.col(id_col),
        )
        .where(F.col("_e").isNotNull())
        .orderBy("_r", id_col)
        .limit(max_train_rows)
        .collect()
    )
    X = np.asarray([r["_e"] for r in pool_rows], dtype=np.float64)
    n, dim = X.shape
    if n < ksub:
        raise ValueError(f"train_pq_codebook: {n} training rows < ksub={ksub}")
    dsub = dim // m
    book = np.zeros((ksub, dim), dtype=np.float64)
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        C = sub[:ksub].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)  # ties -> lowest cid (numpy argmin)
            for j in range(ksub):
                mask = assign == j
                if mask.any():
                    C[j] = sub[mask].mean(0)
        book[:, s * dsub : (s + 1) * dsub] = C
    return book


def pq_search_trained(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """ADC top-k under a TRAINED codebook: train (driver-bounded numpy
    Lloyd per subspace), encode+reconstruct+rank through the SAME
    Catalyst kernels as the seeded path (codebook_from_seeds →
    pq_encode_against → pq_reconstruct_against). Honest measurement on
    the SYNTHETIC fixture: the vectors are isotropic random, so
    per-subspace k-means finds no cluster structure to exploit and
    trained recall ≈ seeded recall (0.15-0.25 both, order flipping
    between sf0.001/sf0.01 — unlike the full-vector IVF case, where
    training measured 0.52 vs 0.43 seeded); on real embedding corpora
    with cluster structure training is the standard recall lever.
    Recall floor pytest-gated; the twin-checked seeded gate pins the
    shared plumbing every round."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    spark = embeddings.sparkSession
    book = train_pq_codebook(
        embeddings, m, ksub, iters, id_col, emb_col
    )
    seeds = spark.createDataFrame(
        [(cid, [float(x) for x in row]) for cid, row in enumerate(book)],
        "cid int, _e array<double>",
    )
    cents = codebook_from_seeds(seeds, m).localCheckpoint(eager=True)
    codes = pq_encode_against(embeddings, book, m, id_col, emb_col)
    recon = pq_reconstruct_against(codes, cents, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        "recon",
        dot_col("recon", "recon").alias("_rr"),
    )
    q = queries.select(
        query_id_col, F.col(emb_col).cast("array<double>").alias("_q")
    ).withColumn("_qq", dot_col("_q", "_q"))
    pairs = recon.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col))
    dist = (
        F.col("_qq") + F.col("_rr") - F.lit(2.0) * dot_col("_q", "recon")
    ).alias("_d")
    ranked = pairs.select(query_id_col, "neighbor_id", dist).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(query_id_col).orderBy(
                F.col("_d").asc(), F.col("neighbor_id").asc()
            )
        ),
    )
    return ranked.where(F.col("rank") <= k).select(
        query_id_col,
        "neighbor_id",
        round6(F.col("_d")).alias("adc_dist"),
        F.col("rank").cast("int").alias("rank"),
    )


class IVFPQIndex:
    """Persisted IVF-PQ serving index — the composed serving tier of
    ``similarity.IVFIndex`` (coarse buckets as partition directories)
    and the PQ codes table: corpus rows are ``(vec_id, codes
    array<int>)`` PARTITIONED BY bucket, so a probe reads only the
    probed buckets' files (PartitionFilters — plan-asserted in tests)
    AND ships only ``m`` ints per candidate. Search is
    :func:`ivfpq_search`'s fine path over STORED codes: reconstruction
    is a pure projection against the literal codebook (zero corpus-side
    joins — the :func:`pq_encode_against` plan shape), ADC L2 ranks on
    the (dist, neighbor_id) total order; over the same vectors,
    centroids and codebook the results equal the batch operator
    bit-for-bit (tested).

    Layout under ``path``:
      * ``centroids/`` — (bucket, centroid array<double>), normalized
        coarse centroids (the cosine-probe convention)
      * ``codebook/``  — (cid, emb array<double>, m), raw full seed
        rows (PQ quantizes raw coordinates)
      * ``corpus/``    — (vec_id, codes) parquet partitioned by bucket

    Built batch-side via :meth:`build`, or from the maintained ingest
    logs via ``streaming.quantization.export_ivfpq`` (the two-tier
    deployment: vec-keyed logs absorb O(batch) ingest, this layout
    serves probes)."""

    def __init__(self, spark, path: str, centroids, codebook, m: int):
        import numpy as np

        self.spark = spark
        self.path = path
        self.m = int(m)
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.codebook = np.asarray(codebook, dtype=np.float64)
        # broadcast ONCE — 'build once, probe many' must not leak one
        # broadcast per search() call (the IVFIndex contract)
        self._bc = spark.sparkContext.broadcast(self.centroids)

    @classmethod
    def _write(cls, spark, corpus: DataFrame, path: str, centroids, codebook, m: int):
        import os

        corpus.select("vec_id", "codes", "bucket").write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(os.path.join(path, "corpus"))
        spark.createDataFrame(
            [(b, [float(x) for x in row]) for b, row in enumerate(centroids)],
            "bucket int, centroid array<double>",
        ).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
        spark.createDataFrame(
            [(cid, [float(x) for x in row], int(m)) for cid, row in enumerate(codebook)],
            "cid int, emb array<double>, m int",
        ).write.mode("overwrite").parquet(os.path.join(path, "codebook"))
        return cls(spark, path, centroids, codebook, m)

    @classmethod
    def build(
        cls,
        embeddings: DataFrame,
        path: str,
        centroids,
        codebook,
        m: int = 8,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
    ) -> "IVFPQIndex":
        """One pass over the corpus: nearest-bucket assignment (the
        normalized-cosine argmax, ties to the lowest cid) + PQ encode
        against the frozen ``codebook``, written bucket-partitioned.
        NULL-embedding rows are excluded (nothing to serve)."""
        from cuda_gis_smoothing_spark.operators.similarity import (
            _nearest_bucket_udf,
        )

        spark = embeddings.sparkSession
        assign = _nearest_bucket_udf(spark, centroids)
        codes = (
            pq_encode_against(embeddings, codebook, m, id_col, emb_col)
            .groupBy(id_col)
            .agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(subspace, code))),"
                    " x -> x.code)"
                ).alias("codes")
            )
        )
        corpus = (
            embeddings.where(F.col(emb_col).isNotNull())
            .select(F.col(id_col).alias("vec_id"), assign(emb_col).alias("bucket"))
            .join(codes.withColumnRenamed(id_col, "vec_id"), "vec_id")
        )
        return cls._write(spark, corpus, path, centroids, codebook, m)

    @classmethod
    def load(cls, spark, path: str) -> "IVFPQIndex":
        import os

        import numpy as np

        crows = (
            spark.read.parquet(os.path.join(path, "centroids"))
            .orderBy("bucket")
            .collect()
        )
        brows = (
            spark.read.parquet(os.path.join(path, "codebook"))
            .orderBy("cid")
            .collect()
        )
        return cls(
            spark,
            path,
            np.asarray([r["centroid"] for r in crows], dtype=np.float64),
            np.asarray([r["emb"] for r in brows], dtype=np.float64),
            int(brows[0]["m"]),
        )

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 2,
        query_id_col: str = "query_id",
        prune: bool = True,
    ) -> DataFrame:
        """Top-k ADC per query over the probed buckets.
        ``prune=True`` collects the probed bucket SET (bounded by
        #queries * n_probe — queries are broadcast-small by assumption)
        and static-filters the corpus scan so PartitionFilters prune
        unprobed bucket directories; ``prune=False`` is the
        large-query-set path (no driver collect — the probe output
        shuffle-joins the corpus on the bucket key). Results identical
        either way, and identical to :func:`ivfpq_search` over the
        indexed vectors (tested)."""
        import os

        from cuda_gis_smoothing_spark.functions.numeric import round6
        from cuda_gis_smoothing_spark.operators.similarity import probe_rows

        q = probe_rows(queries, self._bc, n_probe, query_id_col).withColumn(
            "_qq", dot_col("q_emb", "q_emb")
        )
        corpus = self.spark.read.parquet(os.path.join(self.path, "corpus"))
        if prune:
            buckets = sorted(
                r["bucket"] for r in q.select("bucket").distinct().collect()
            )
            corpus = corpus.where(F.col("bucket").isin(buckets))
        recon = (
            corpus.withColumn("_cb", _book_lit(self.codebook, self.m))
            .select(
                F.col("vec_id").alias("neighbor_id"),
                "bucket",
                F.expr(
                    "flatten(transform(codes, (c, s) -> "
                    "element_at(element_at(_cb, s + 1), c + 1).sub))"
                ).alias("recon"),
            )
            .withColumn("_rr", dot_col("recon", "recon"))
        )
        pairs = recon.join(F.broadcast(q), "bucket").where(
            F.col("neighbor_id") != F.col(query_id_col)
        )
        dist = (
            F.col("_qq") + F.col("_rr") - F.lit(2.0) * dot_col("q_emb", "recon")
        ).alias("_d")
        ranked = pairs.select(query_id_col, "neighbor_id", dist).withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.col("_d").asc(), F.col("neighbor_id").asc()
                )
            ),
        )
        return ranked.where(F.col("rank") <= k).select(
            query_id_col,
            "neighbor_id",
            round6(F.col("_d")).alias("adc_dist"),
            F.col("rank").cast("int").alias("rank"),
        )
