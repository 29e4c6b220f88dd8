"""Deterministic cardinality sketching: KMV (k-minimum-values)
approximate distinct counts.

At 100 TB "how many distinct users/tokens/documents" is answered by a
SKETCH, not COUNT(DISTINCT) — but the usual sketches (HyperLogLog,
``approx_count_distinct``) use engine-private hashes and are therefore
ungateable cross-engine (the documented approx_percentile constraint).
KMV over the repo's PORTABLE affine-over-prime hash removes that: the
estimator is a pure function of the k smallest distinct hash values,
every one of which both engines compute bit-identically — a fully
driver-hash-gateable approximate algorithm, the same move that made
sampling reproducible (operators/sampling.py: hash, never rand()).

Estimator (Bar-Yossef et al.): with hashes ~ uniform on [0, P), the
k-th smallest distinct value h_(k) estimates density k/n, so

    n̂  =  (k − 1) · P / (h_(k) + 1)          (sketch full: n ≥ k)
    n̂  =  n_exact                            (fewer than k distinct)

(+1 keeps the ratio finite at h=0; relative error ~ 1/√(k−2)).
Hash collisions under-count exactly identically in both engines.

Scale shape: the heavy step is the (group, hash) DISTINCT — a
map-side-combinable hash aggregate over the raw stream; the per-group
rank that extracts the k smallest then runs over DISTINCT HASHES only
(≤ one row per distinct member, not per event). The merge property
real pipelines use — union of sketches = sketch of union (keep the k
smallest of the concatenation) — holds by construction since the
sketch is just the k smallest distinct hashes; sketches from
partitions/days can be merged without re-reading events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from cuda_gis_smoothing_spark.operators.dedup import MH_PRIME

# a fresh affine pair, disjoint from the MinHash (MH_A/MH_B) and
# sampling (S_A/S_B) pairs, so cardinality sketches never correlate
# with signature buckets or sample membership
KMV_A = 1_582_459_139
KMV_B = 711_628_519
KMV_K = 64


def kmv_hash_col(id_col: str) -> Column:
    """Portable hash to [0, MH_PRIME): the id is reduced mod P BEFORE
    the affine transform so products stay < 2^61 for ANY bigint id
    (DuckDB raises on int64 overflow where Spark wraps — the CLAUDE.md
    invariant)."""
    return (F.pmod(F.col(id_col), F.lit(MH_PRIME)) * KMV_A + KMV_B) % MH_PRIME


def kmv_hash_sql(id_expr: str) -> str:
    return f"((({id_expr} % {MH_PRIME} + {MH_PRIME}) % {MH_PRIME}) * {KMV_A} + {KMV_B}) % {MH_PRIME}"


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Per-group approximate distinct ``id_col`` count via a k-minimum-
    values sketch. Output one row per group:
    ``(*group_cols, n_sketch, kth_hash, est_distinct)`` where n_sketch
    = min(k, distinct) and est_distinct is the (rounded) estimate —
    exact when the sketch isn't full. NULL ids are excluded (COUNT
    DISTINCT convention, identical in both engines)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    if k < 2:
        raise ValueError("kmv_distinct: k must be >= 2 (estimator uses k - 1)")
    hashes = (
        df.where(F.col(id_col).isNotNull())
        .select(*group_cols, kmv_hash_col(id_col).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    topk = hashes.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    kp = (k - 1) * MH_PRIME  # exact integer, emitted as one literal
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(F.lit(float(kp)) / (F.col("kth_hash") + 1))
    return (
        topk.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            F.max("_h").cast("long").alias("kth_hash"),
        )
        .select(*group_cols, "n_sketch", "kth_hash", round6(est).alias("est_distinct"))
    )


def kmv_distinct_sql(
    source: str, group_cols: list[str], id_expr: str, k: int = KMV_K
) -> str:
    """DuckDB twin of :func:`kmv_distinct` — same hash, same rank, same
    literal (k−1)·P numerator, same round6."""
    from cuda_gis_smoothing_spark.functions.numeric import flit

    g = ", ".join(group_cols)
    kp = flit(float((k - 1) * MH_PRIME))
    return f"""
WITH hs AS (
  SELECT DISTINCT {g}, {kmv_hash_sql(id_expr)} AS h
  FROM {source} WHERE {id_expr} IS NOT NULL
),
rk AS (
  SELECT {g}, h, ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY h) AS rn FROM hs
),
agg AS (
  SELECT {g}, COUNT(*) AS n_sketch, MAX(h) AS kth_hash
  FROM rk WHERE rn <= {k} GROUP BY {g}
)
SELECT {g}, CAST(n_sketch AS BIGINT) AS n_sketch,
       CAST(kth_hash AS BIGINT) AS kth_hash,
       ROUND((CASE WHEN n_sketch < {k} THEN CAST(n_sketch AS DOUBLE)
                   ELSE {kp} / (kth_hash + 1) END) + 1e-09, 6) AS est_distinct
FROM agg
""".strip()


def kmv_shingle_overlap(
    docs: DataFrame,
    k_shingle: int = 5,
    k: int = KMV_K,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS between per-source k-gram
    shingle sets, entirely from KMV sketches: for every source pair
    (a < b) estimate |A|, |B|, |A∪B| and, via inclusion–exclusion,
    |A∩B| and Jaccard. The sketch answer to ``source_overlap``'s exact
    self-join: MinHash (``source_overlap_minhash``) estimates the
    Jaccard RATIO only — KMV sketches also estimate the SIZES (union /
    intersection cardinalities), the numbers a dataset card reports.

    Union-of-sketches = sketch-of-union by construction (the k smallest
    of two k-smallest lists ARE the k smallest of the union), so the
    pair stage runs over #sources × k sketch rows; the heavy work is
    ONE distinct (source, shingle-hash) aggregate over the corpus,
    map-side combinable — at 100 TB per-source sketches are mergeable
    across days/partitions without re-reading documents. Exact when a
    sketch isn't full (n < k); relative error ~ 1/√(k−2) when full.

    Shingles are ``source_overlap``'s exact k-token grams (docs with
    fewer than ``k_shingle`` tokens contribute none); hashes via the
    portable rolling hash then the KMV affine (products < 2^62 — the
    overflow invariant); every estimate is one division of exact
    integers and the inclusion–exclusion sum composes identically
    cross-engine (``kmv_shingle_overlap_sql`` is the DuckDB twin)."""
    if k < 2:
        raise ValueError("kmv_shingle_overlap: k must be >= 2 (estimator uses k - 1)")
    hashes = shingle_hash_members(
        docs, k_shingle, source_col=source_col, text_col=text_col
    )
    w = Window.partitionBy("source").orderBy(F.col("_h").asc())
    sk = (
        hashes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy("source")
        .agg(F.sort_array(F.collect_list("_h")).alias("sk"))
    )
    # the sketch table feeds BOTH pair-join sides — unmaterialized,
    # the corpus-wide shingle scan runs twice (the source_overlap
    # multi-consumer lesson); #sources × k rows, trivial to pin
    sk = sk.localCheckpoint()
    return kmv_overlap_pairs(sk, k)


def shingle_hash_members(
    docs: DataFrame,
    k_shingle: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distinct (source, shingle-hash) members: ``source_overlap``'s
    exact k-token grams through the portable rolling hash and the KMV
    affine (products < 2^62 — the overflow invariant). Shared by the
    batch overlap operator and the maintained sketch's members hook."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        shingles_expr,
        token_hash_col,
    )

    toks = F.split(F.lower(F.col(text_col)), " ")
    return (
        docs.select(F.col(source_col).alias("source"), toks.alias("_toks"))
        .where(F.size("_toks") >= k_shingle)
        .select("source", F.explode(shingles_expr(k_shingle)).alias("t"))
        .select(
            "source",
            ((token_hash_col("t") * KMV_A + KMV_B) % MH_PRIME).alias("_h"),
        )
        .distinct()
    )


def kmv_overlap_pairs(sk: DataFrame, k: int, group_col: str = "source") -> DataFrame:
    """The pairwise set-operation stage over (group, sorted sketch
    array) rows — shared by :func:`kmv_shingle_overlap` and the
    maintained sketch (``MaintainedKMV.overlap_pairs``): per-side
    counts / k-th values derive from the array itself, the union
    sketch is the k smallest of the merged arrays, and intersection /
    Jaccard follow by inclusion–exclusion."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    kp = float((k - 1) * MH_PRIME)

    def est(n, kth):
        return F.when(n < k, n.cast("double")).otherwise(F.lit(kp) / (kth + 1))

    def side(suffix: str) -> DataFrame:
        return sk.select(
            F.col(group_col).alias(f"{group_col}_{suffix}"),
            F.col("sk").alias(f"_sk{suffix}"),
        )

    ga, gb = f"{group_col}_a", f"{group_col}_b"
    pairs = (
        side("a")
        .join(side("b"), F.col(ga) < F.col(gb))
        .withColumn("_m", F.expr(f"slice(array_sort(array_union(_ska, _skb)), 1, {k})"))
    )
    # project the estimates to named columns before they feed multiple
    # output expressions (the CollapseProject re-evaluation lesson)
    pe = pairs.select(
        ga,
        gb,
        est(F.size("_ska").cast("long"), F.element_at("_ska", F.size("_ska"))).alias("_ea"),
        est(F.size("_skb").cast("long"), F.element_at("_skb", F.size("_skb"))).alias("_eb"),
        est(F.size("_m").cast("long"), F.element_at("_m", F.size("_m"))).alias("_eu"),
    )
    inter = F.greatest(F.lit(0.0), F.col("_ea") + F.col("_eb") - F.col("_eu"))
    return pe.select(
        ga,
        gb,
        round6(F.col("_ea")).alias("est_a"),
        round6(F.col("_eb")).alias("est_b"),
        round6(F.col("_eu")).alias("est_union"),
        round6(inter).alias("est_intersection"),
        round6(inter / F.col("_eu")).alias("est_jaccard"),
    )


def kmv_shingle_overlap_sql(k_shingle: int = 5, k: int = KMV_K) -> str:
    """DuckDB twin of :func:`kmv_shingle_overlap` over the
    ``documents`` view — same shingles, same hash, same affine, same
    merge, same inclusion–exclusion composition, same round6."""
    from cuda_gis_smoothing_spark.functions.numeric import flit
    from cuda_gis_smoothing_spark.operators.dedup import token_hash_sql_duckdb

    th = token_hash_sql_duckdb("t")
    kp = flit(float((k - 1) * MH_PRIME))
    z = "CAST(0.0 AS DOUBLE)"
    return f"""
WITH sh AS (
  SELECT DISTINCT source,
         unnest(list_transform(
           generate_series(1, greatest(len(string_split(lower(text), ' ')) - {k_shingle - 1}, 0)),
           i -> array_to_string((string_split(lower(text), ' '))[i:i+{k_shingle - 1}], ' '))) AS t
  FROM documents
),
hs AS (
  SELECT DISTINCT source, ({th} * {KMV_A} + {KMV_B}) % {MH_PRIME} AS h FROM sh
),
rk AS (
  SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn FROM hs
),
sk AS (
  SELECT source, COUNT(*) AS n, MAX(h) AS kth, list(h ORDER BY h) AS sk
  FROM rk WHERE rn <= {k} GROUP BY source
),
pr AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.n AS na, a.kth AS ka, b.n AS nb, b.kth AS kb,
         list_slice(list_sort(list_distinct(a.sk || b.sk)), 1, {k}) AS m
  FROM sk a JOIN sk b ON a.source < b.source
),
pe AS (
  SELECT source_a, source_b,
    CASE WHEN na < {k} THEN CAST(na AS DOUBLE) ELSE {kp} / (ka + 1) END AS ea,
    CASE WHEN nb < {k} THEN CAST(nb AS DOUBLE) ELSE {kp} / (kb + 1) END AS eb,
    CASE WHEN LEN(m) < {k} THEN CAST(LEN(m) AS DOUBLE)
         ELSE {kp} / (m[LEN(m)] + 1) END AS eu
  FROM pr
)
SELECT source_a, source_b,
  ROUND(ea + 1e-09, 6) AS est_a,
  ROUND(eb + 1e-09, 6) AS est_b,
  ROUND(eu + 1e-09, 6) AS est_union,
  ROUND(GREATEST({z}, ea + eb - eu) + 1e-09, 6) AS est_intersection,
  ROUND((GREATEST({z}, ea + eb - eu) / eu) + 1e-09, 6) AS est_jaccard
FROM pe
""".strip()


def kmv_quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    fractions: tuple[float, ...],
    group_cols: tuple[str, ...] = (),
    k: int = 256,
) -> DataFrame:
    """Approximate per-group quantiles from a BOTTOM-k-BY-HASH row
    sample — the quantile member of the deterministic-sketch family.
    ``approx_percentile`` (t-digest/KLL style) is engine-private and
    ungateable; a bottom-k sample under the PORTABLE hash is a
    deterministic uniform sample, so quantiles over it estimate the
    group quantiles with error ~1/sqrt(k) in RANK space, and both
    engines select the identical sample bit-for-bit. Exact whenever a
    group has <= k non-null rows (the sample IS the group).

    Mergeable like KMV: the bottom-k of a union is the bottom-k of
    concatenated per-partition bottom-k's (value rides with the hash),
    so at 100 TB per-day/per-partition sketches merge without
    re-reading events — unlike exact ``percentile``, which sorts every
    group end-to-end. The heavy step is one per-group top-k rank over
    (hash, id); the quantile then runs over <= k rows per group.

    Selection order is (hash, id) — ``id_col`` must be unique, making
    the sample a TOTAL order (the cross-engine window-tie invariant).
    NULL values and NULL ids are excluded BEFORE sampling: a NULL
    value carries no information, and a NULL id's NULL hash sorts
    first in Spark but last in DuckDB. Routes through the shared
    :func:`~cuda_gis_smoothing_spark.operators.events.percentile_explode`
    kernel (the one cross-engine-sensitive percentile composition);
    :func:`kmv_quantile_sketch_sql` is the DuckDB twin."""
    from cuda_gis_smoothing_spark.operators.events import percentile_explode

    w = Window.partitionBy(
        *[F.col(g) for g in group_cols] if group_cols else [F.lit(1)]
    ).orderBy(kmv_hash_col(id_col).asc(), F.col(id_col).asc())
    # NULL ids are excluded BEFORE ranking: a NULL hash sorts FIRST in
    # Spark's ascending window but LAST under DuckDB's defaults, so a
    # NULL-id row would enter one engine's sample and not the other's
    sample = (
        df.where(F.col(value_col).isNotNull() & F.col(id_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
    )
    return percentile_explode(
        sample, value_col, fractions, group_cols=group_cols, out_value="est_value"
    )


def kmv_quantile_sketch_sql(
    source_sql: str,
    value_col: str,
    id_col: str,
    fractions: tuple[float, ...],
    group_cols: tuple[str, ...] = (),
    k: int = 256,
) -> str:
    """DuckDB twin of :func:`kmv_quantile_sketch`: identical portable
    hash, identical (hash, id) total-order bottom-k selection,
    identical quantile kernel (``percentile_sql``)."""
    from cuda_gis_smoothing_spark.operators.events import percentile_sql

    part = f"PARTITION BY {', '.join(group_cols)} " if group_cols else ""
    sample = f"""
SELECT * FROM (
  SELECT *, ROW_NUMBER() OVER ({part}ORDER BY {kmv_hash_sql(id_col)}, {id_col}) AS _rn
  FROM ({source_sql}) WHERE {value_col} IS NOT NULL AND {id_col} IS NOT NULL
) WHERE _rn <= {k}
""".strip()
    return percentile_sql(
        sample, value_col, fractions, group_cols=group_cols, out_value="est_value"
    )


# -- Count-Min Sketch (the frequency sketch beside KMV's distinct) --------

#: 4 independent affine rows over the token hash (products stay < 2^62:
#: both factors < 2^31 — the portable-hash integer bound)
CMS_ROWS = (
    (1_094_795_711, 373_587_883),
    (1_582_459_139, 711_628_519),
    (1_183_186_591, 926_292_013),
    (1_431_655_751, 161_803_399),
)
CMS_WIDTH = 1024
CMS_TOPK = 20


def cms_hash_cols(token_col: str = "t", h: Column | None = None):
    """The d (j, counter) struct array for one token — shared by the
    counter build and the query side so the hash family cannot drift.
    Pass a pre-projected hash column ``h`` when the caller has already
    named the token hash (the CollapseProject re-reference lesson —
    avoids re-folding the token chars once per row)."""
    from cuda_gis_smoothing_spark.operators.dedup import token_hash_col

    if h is None:
        h = token_hash_col(token_col)
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    F.pmod(h * F.lit(a) + F.lit(b), F.lit(MH_PRIME))
                    % CMS_WIDTH
                ).alias("counter"),
            )
            for j, (a, b) in enumerate(CMS_ROWS)
        ]
    )


def cms_counters(
    toks: DataFrame, token_col: str = "t", weight_col: str | None = None
) -> DataFrame:
    """Count-Min counter table over a token stream: each input row
    increments ``len(CMS_ROWS)`` counters ``h_j(t) = ((hash(t)*A_j +
    B_j) % MH_PRIME) % CMS_WIDTH`` (by ``weight_col`` when given — a
    pre-aggregated (token, count) table builds the IDENTICAL sketch as
    the raw stream, which is how a gate feeds it from a vocab-sized
    table in one corpus scan). Output (j, counter, cnt) — exploded
    rows collapse by map-side partial aggregation into at most d·W
    rows per partition, so the shuffle ships sketch-sized state no
    matter the corpus (THE point of a sketch at 100 TB: the counter
    table is mergeable across any partitioning, like the KMV bottom-k
    set).

    Deterministic by construction (the KMV precedent): integer
    arithmetic over the portable token hash — twin-exact, unlike a
    seeded-RNG sketch."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    h = toks.select(cms_hash_cols(token_col).alias("_rows"), w.alias("_w"))
    return (
        h.select(F.explode("_rows").alias("r"), "_w")
        .groupBy(F.col("r.j").alias("j"), F.col("r.counter").alias("counter"))
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cms_hash_sql(token_expr: str, j: int) -> str:
    from cuda_gis_smoothing_spark.operators.dedup import token_hash_sql_duckdb

    a, b = CMS_ROWS[j]
    return (
        f"(({token_hash_sql_duckdb(token_expr)} * {a} + {b})"
        f" % {MH_PRIME}) % {CMS_WIDTH}"
    )


# ---------------------------------------------------------------------------
# CMS-prefiltered exact heavy hitters (the sketch-probe scale path)
# ---------------------------------------------------------------------------

#: heavy = token appears in >= n_docs / HH_REL documents (>= 1%),
#: floored at 2 so a tiny corpus never declares every token heavy
HH_REL = 100


def heavy_hitters(docs: DataFrame, rel: int = HH_REL) -> DataFrame:
    """Exact document-frequency heavy hitters with a Count-Min
    PREFILTER — the 100 TB shape for "which tokens are hot": pass 1
    folds the raw token stream into the d×W counter sketch (map-side
    combinable, sketch-sized shuffle — ``cms_counters``); the sketch
    is packed into ONE dense ``array<long>`` row (the
    decontaminated_bloom assembly: range ⟕ counters, sort_array of
    (idx, cnt) structs — distributed, no collect) and broadcast; pass
    2 probes every raw token MAP-SIDE (``least`` over the d
    ``element_at`` lookups) so only candidate tokens reach the exact
    document-frequency aggregate — the shuffle ships candidates, not
    the vocabulary. CMS estimates are ONE-SIDED (est ≥ true df), so a
    genuinely heavy token always survives the prefilter — the exact
    ``df ≥ threshold`` verify then removes every collision-inflated
    false positive: output == the plain ``HAVING df ≥ threshold``
    bit-for-bit (the lossless-prefilter contract, pytest-pinned).

    Output ``(token, df, cms_estimate, threshold)`` — all BIGINT, the
    estimate column gates the sketch path itself (not just the final
    set). Threshold is data-derived: ``greatest(2, n_docs div rel)``
    (integer floor-div — exact cross-engine on non-negative ints).

    Reference parity: the reference has no sketch layer; this extends
    its per-cell aggregation vocabulary (hex_smooth_cuda_v5 reduce
    loops) with the frequency-sketch member of the accuracy-card
    family (kmv/cms_error_report)."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        _doc_tokens,
        token_hash_col,
    )

    spark = docs.sparkSession
    d = len(CMS_ROWS)
    # the token stream feeds BOTH passes (sketch build + probe) — two
    # differently-shaped consumers re-tokenize the corpus without the
    # checkpoint (the multi-consumer class; measured 39→12 s at
    # sf0.1). At 100 TB swap for two streaming passes over a STORED
    # token table — the pass structure is unchanged.
    toks = _doc_tokens(docs, "text", "doc_id", None).localCheckpoint()
    ctr = cms_counters(toks)  # pass 1: unweighted, straight off the stream
    mask = (
        spark.range(d * CMS_WIDTH)
        .select(F.col("id").alias("_i"))
        .join(
            ctr.select(
                (F.col("j").cast("long") * CMS_WIDTH + F.col("counter")).alias(
                    "_i"
                ),
                "cnt",
            ),
            "_i",
            "left",
        )
        .select("_i", F.coalesce("cnt", F.lit(0)).cast("long").alias("_c"))
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_i", "_c"))),
                lambda s: s["_c"],
            ).alias("_cms")
        )
    )
    thr = docs.agg(
        F.expr(f"GREATEST(CAST(2 AS BIGINT), COUNT(*) DIV {rel})").alias(
            "_thr"
        )
    )
    one_row = mask.crossJoin(thr)
    # hash projected ONCE to a named column (the CollapseProject
    # re-reference lesson); the probe composes cms_hash_cols — ONE
    # hash-family definition for build and query (review catch: an
    # inline re-implementation could silently desync from the
    # counters, breaking the one-sidedness the prefilter relies on)
    probed = toks.select(
        "doc_id", "t", token_hash_col("t").alias("_h")
    ).crossJoin(F.broadcast(one_row))
    est = F.array_min(
        F.transform(
            cms_hash_cols("t", h=F.col("_h")),
            lambda s: F.element_at(
                F.col("_cms"),
                (s["j"] * CMS_WIDTH + s["counter"]).cast("int") + 1,
            ),
        )
    )
    cand = probed.select(
        "doc_id", "t", "_thr", est.alias("_est")
    ).where(F.col("_est") >= F.col("_thr"))
    return (
        cand.groupBy(F.col("t").alias("token"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.max("_est").cast("long").alias("cms_estimate"),
            F.max("_thr").cast("long").alias("threshold"),
        )
        .where(F.col("df") >= F.col("threshold"))
    )


def heavy_hitters_sql(tok_cte: str, rel: int = HH_REL) -> str:
    """DuckDB twin: the sketch built WEIGHTED from the vocab count
    table (identical counters to the raw-stream build — the
    vocab_cms_estimates lesson), probed per distinct token via the
    (j, counter) join; same one-sided prefilter + exact verify."""
    ctr_branches = "\n    UNION ALL ".join(
        f"SELECT {j} AS j, {cms_hash_sql('t', j)} AS counter, df FROM counts"
        for j in range(len(CMS_ROWS))
    )
    probe_branches = "\n    UNION ALL ".join(
        f"SELECT t, df, {j} AS j, {cms_hash_sql('t', j)} AS counter"
        " FROM counts"
        for j in range(len(CMS_ROWS))
    )
    return f"""
WITH {tok_cte},
counts AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY t),
ctr AS (
  SELECT j, counter, CAST(SUM(df) AS BIGINT) AS cnt FROM (
    {ctr_branches}
  ) GROUP BY j, counter
),
thr AS (SELECT GREATEST(CAST(2 AS BIGINT), COUNT(*) // {rel}) AS threshold
        FROM documents),
est AS (
  SELECT p.t, MAX(p.df) AS df, MIN(c.cnt) AS cms_estimate
  FROM ({probe_branches}) p JOIN ctr c USING (j, counter)
  GROUP BY p.t
)
SELECT e.t AS token, e.df, e.cms_estimate, t.threshold
FROM est e, thr t
WHERE e.cms_estimate >= t.threshold AND e.df >= t.threshold
""".strip()
