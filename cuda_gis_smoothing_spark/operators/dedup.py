"""Deduplication operators over document tables (training-data pipeline).

No reference counterpart (the reference is a smoothing kernel); these
are the graft's large-scale-pipeline additions. All hot paths are
JVM-side built-ins; the only "hash functions" used for cross-engine
checkable variants are arithmetic constructions (affine transforms over
a shared polynomial token hash) that Spark SQL and DuckDB evaluate
identically — no engine-private hash in any correctness-gated output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# modulus < 2^31 so a*x+b stays under 2^62 (no int64 overflow in either
# engine — DuckDB raises on bigint overflow, Spark wraps; staying exact
# keeps both identical)
MH_PRIME = 2_147_483_629  # largest prime < 2^31
MH_A = (906_021_953, 1_396_241_621, 403_931_569, 1_803_059_29, 729_614_273, 53_045_021)
MH_B = (252_529_531, 1_142_678_147, 882_212_081, 66_048_17, 1_989_221_141, 90_362_951)


def _group_dedup(df: DataFrame, key, id_col: str) -> DataFrame:
    """groupBy + join keyed dedup (shared by exact / tokenset).

    The window-function form would sort every shuffle partition by the
    digest just to broadcast two group aggregates back to the rows; the
    groupBy collapses to one row per distinct key with map-side partial
    aggregation, and the join back is a SHUFFLE_HASH equi-join on the
    same key (no sort on either side — plan-asserted in
    tests/test_plans.py). At 100 TB the group table is also exactly the
    "keep one canonical doc" output a dedup pipeline materializes.

    NULL keys (NULL text → NULL digest): the join back is an equi-join,
    which REJECTS NULL matches — without the sentinel coalesce below,
    NULL-text rows would silently vanish from the Spark output while
    the DuckDB window twin keeps them as one all-NULL partition (SQL
    window PARTITION BY groups NULLs together). The non-hex sentinel
    reproduces exactly that one-group semantic and cannot collide with
    a real md5 (md5('') is a valid digest of empty text, a DIFFERENT
    group in both engines).
    """
    key = F.coalesce(key, F.lit("__null__"))
    keyed = df.select(F.col(id_col), key.alias("_k"))
    groups = keyed.groupBy("_k").agg(
        F.count(F.lit(1)).alias("dup_group_size"),
        F.min(id_col).alias("canonical_id"),
    )
    return (
        keyed.join(groups.hint("SHUFFLE_HASH"), "_k")
        .select(
            id_col,
            "dup_group_size",
            "canonical_id",
            (F.col(id_col) != F.col("canonical_id")).cast("int").alias("is_duplicate"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5-keyed duplicate groups with a canonical row.

    Hash shuffle on the digest — uniformly distributed, no skew."""
    return _group_dedup(df, F.md5(F.col(text_col)), id_col)


def tokenset_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup by normalized token multiset → exact key dedup.

    Normalization: lowercase, whitespace tokenize, distinct, sort,
    rejoin — catches word-order shuffles and duplicated-token noise.
    """
    norm = F.array_join(
        F.array_sort(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))), " "
    )
    return _group_dedup(df, F.md5(norm), id_col)


def normalized_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Normalization-aware exact dedup: lowercase → strip
    non-alphanumerics → collapse runs of spaces → trim, then md5-keyed
    duplicate groups — the standard "soft exact" first pass of
    web-corpus pipelines, catching the case/punctuation/spacing
    variants raw :func:`exact_dedup` misses while staying a pure
    digest groupBy (same SHUFFLE_HASH shape, no pair join). The
    DuckDB twin needs the 'g' flag on regexp_replace (DuckDB replaces
    the first match by default; Spark replaces all)."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return _group_dedup(df, F.md5(norm), id_col)


def shingles_expr(k: int, toks_col: str = "_toks"):
    """k-token shingles of a token-array column — THE shingle
    construction (transform/sequence/greatest/array_join) every
    overlap consumer shares: ``source_overlap`` (operators/curate.py),
    ``shingle_hash_members`` (operators/sketches.py) and the tests.
    One definition so the greatest(...,1) guard and the separator can
    never drift between them; each consumer's SQL twin is pinned to
    this form by its own parity gate."""
    return F.expr(
        f"transform(sequence(1, greatest(size({toks_col}) - {k - 1}, 1)), "
        f"i -> array_join(slice({toks_col}, i, {k}), ' '))"
    )


def token_hash_col(token_col: str = "t"):
    """Polynomial rolling hash of a token, mod MH_PRIME, as a Column.

    Computed with the ``aggregate`` higher-order function over the
    token's characters — pure Catalyst expressions, and reproducible in
    DuckDB via ``list_reduce`` (same fold order, same arithmetic).
    """
    return F.expr(
        f"aggregate(split({token_col}, ''), CAST(7 AS BIGINT), "
        f"(acc, c) -> (acc * 131 + ascii(c)) % {MH_PRIME})"
    )


def token_hash_sql_duckdb(token_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(7 AS BIGINT), "
        f"list_transform(string_split({token_expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * 131 + c) % {MH_PRIME})"
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_hashes: int = 6
) -> DataFrame:
    """MinHash over the distinct-token set: one row per doc with
    ``mh_0..mh_{n-1}`` columns (min of affine transforms of the shared
    token hash). Entirely JVM-side: explode → hash → groupBy(min)."""
    toks = df.select(
        id_col, F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))).alias("t")
    ).where(F.col("t") != "")
    h = toks.select(id_col, token_hash_col("t").alias("h"))
    aggs = [
        F.min((F.col("h") * MH_A[i] + MH_B[i]) % MH_PRIME).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return h.groupBy(id_col).agg(*aggs)


def banded_signature_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 6,
    bands: int = 3,
) -> DataFrame:
    """(id, band, bh) LSH band rows — the banding arithmetic shared by
    :func:`minhash_lsh_pairs` and :func:`containment_pairs_banded`
    (bh folds the band's signature rows as ``(prev*8191 + mh) % P``)."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n_hashes)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + j}") for j in range(rows_per_band)]
        expr = parts[0]
        for p in parts[1:]:
            expr = (expr * 8191 + p) % MH_PRIME
        band_cols.append(F.struct(F.lit(b).alias("band"), expr.alias("bh")))
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 6,
    bands: int = 3,
) -> DataFrame:
    """LSH candidate pairs: band the signature, self-join on band value.

    rows-per-band = n_hashes // bands. At scale the band join is the
    classic shingle→minhash→band→bucket-join: shuffle keyed on
    (band_id, band_hash), candidate verification local to the match.
    Output: (doc_a, doc_b, n_shared_bands).
    """
    banded = banded_signature_rows(df, text_col, id_col, n_hashes, bands)
    # pinned parallelism: band-key rows are tiny by bytes but the pair
    # output is superlinear — AQE would coalesce the shuffle to one
    # partition and emit every candidate from one core
    parts = df.sparkSession.sparkContext.defaultParallelism
    banded = banded.repartition(parts, "band", "bh")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def band_values_projection(
    docs: DataFrame,
    n_hashes: int,
    bands: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra: dict | None = None,
) -> DataFrame:
    """(id, _bvs) — one row per doc, ``_bvs`` = array of the doc's LSH
    band values in band order, with the EXACT :func:`minhash_lsh_pairs`
    arithmetic — computed as a PURE PROJECTION (nested higher-order
    expressions: filter/transform/aggregate/array_min) instead of the
    batch explode → groupBy(min).

    This is the STORABLE form: one row per doc keyed on the id, which
    is what the incremental curator persists in its band-key
    SnapshotLog (latest-wins logs need one row per key). Docs with no
    tokens get no row (exactly like the batch operator, where they have
    no signature row). ``extra`` maps output column names to Columns
    carried through (evaluated once per doc)."""
    d = docs.select(
        id_col,
        F.expr(_TOKEN_HASHES_SQL.format(text_col=text_col)).alias("_hs"),
        *[c.alias(name) for name, c in (extra or {}).items()],
    )
    mh = [
        F.expr(
            f"array_min(transform(_hs, h -> (h * {MH_A[i]} + {MH_B[i]}) % {MH_PRIME}))"
        ).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    sig = d.select(id_col, *mh, *(extra or {})).where(F.col("mh_0").isNotNull())
    rows_per_band = n_hashes // bands
    band_exprs = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + j}") for j in range(rows_per_band)]
        expr = parts[0]
        for p in parts[1:]:
            expr = (expr * 8191 + p) % MH_PRIME
        band_exprs.append(expr)
    return sig.select(
        id_col, F.array(*band_exprs).alias("_bvs"), *(extra or {})
    )


def explode_band_values(
    bvs: DataFrame, id_col: str = "doc_id", keep_values: bool = False
) -> DataFrame:
    """(id, _bvs, extras...) → (id, band, bh, extras...) join keys;
    ``keep_values`` retains the full ``_bvs`` array on every exploded
    row (first-shared-band dedup needs both sides' earlier bands)."""
    others = [c for c in bvs.columns if c not in (id_col, "_bvs")]
    return bvs.select(
        id_col,
        F.posexplode("_bvs").alias("band", "bh"),
        *others,
        *(["_bvs"] if keep_values else []),
    )


def banded_keys_projection(
    docs: DataFrame,
    n_hashes: int,
    bands: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra: dict | None = None,
    with_band_values: bool = False,
) -> DataFrame:
    """(id, band, bh) LSH band keys — :func:`band_values_projection`
    exploded to join-key rows.

    Two callers need the projection form: streaming (an aggregation
    upstream of ``applyInPandasWithState`` is illegal in one query) and
    the blocked bucket verify (the token-array payload must ride along
    the same row, which a groupBy would separate). A doc's signature is
    a pure function of its text, so the arithmetic is identical;
    equality with the batch signatures is asserted in tests. ``extra``
    maps output column names to Columns carried through (evaluated once
    per doc, BEFORE the band explode); ``with_band_values``
    additionally keeps ``_bvs`` = the full array of the doc's band
    values on every exploded row (bands are few — the
    first-shared-band dedup in :func:`lsh_blocked_neardup_drops` needs
    both sides' earlier bands)."""
    vals = band_values_projection(
        docs, n_hashes, bands, id_col=id_col, text_col=text_col, extra=extra
    )
    return explode_band_values(vals, id_col=id_col, keep_values=with_band_values)


#: distinct non-empty lowercase whitespace tokens of {text_col}, hashed
#: with the shared portable polynomial hash — as one nested expression
_TOKEN_HASHES_SQL = (
    "transform(filter(array_distinct(split(lower({text_col}), ' ')), t -> t <> ''), "
    "t -> aggregate(split(t, ''), CAST(7 AS BIGINT), "
    f"(acc, c) -> (acc * 131 + ascii(c)) % {MH_PRIME}))"
)

#: distinct non-empty lowercase whitespace tokens as an array column
TOKEN_ARRAY_SQL = "filter(array_distinct(split(lower({text_col}), ' ')), t -> t <> '')"


def lsh_blocked_neardup_drops(
    docs: DataFrame,
    threshold: float,
    n_hashes: int = 6,
    bands: int = 3,
    n_blocks: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Doc ids with a VERIFIED jaccard >= ``threshold`` partner of
    smaller id — LSH band candidates and exact-jaccard verification
    FUSED into one blocked-triangle equi-join per band bucket.

    The separate candidates-then-verify pipeline has two unbounded
    tasks under a pathological self-similar corpus (a band bucket with
    K members): the bucket self-join emits its K^2/2 candidate rows
    from ONE join key, and the verify join on doc_a concentrates a hot
    doc's K-1 candidate x token rows likewise. Here each bucket member
    gets a hash block g in [0, n_blocks); the left side replicates to
    block pairs (g, j>=g), the right to (i<=g, g), and the join is EQUI
    on (band, bh, block_i, block_j) — per-task work is |B_i| x |B_j|
    pairs (~(K/n_blocks)^2, asserted under a 90%-self-similar corpus in
    tests/test_partitioning_dedup.py), the same balanced-triangle
    construction as :func:`embedding_neardup_pairs`. Verification runs
    IN the join row: both sides carry their distinct-token arrays, the
    exact intersection is one ``array_intersect`` — no candidate x
    token explode, no re-join against the corpus, no aggregation.

    Cost shape: each doc ships n_blocks+1 copies of its token array per
    band (bands * (n_blocks+1) total) — the price of the structural
    per-task bound; n_blocks=1 degenerates to the plain bucket
    equi-join (2 copies per band) when skew is no concern.

    Two exact pre-intersect reductions (both matter on self-similar
    corpora, where most pairs share EVERY band — measured 86% of all
    pairs are candidates on the sf0.1 fixture):
      * first-shared-band dedup: a pair verifies ONLY in its lowest
        shared band (each side carries its full band-value array —
        ``bands`` ints — and the match is skipped when any earlier
        band also matches), so a 3-band match costs one intersect, not
        three.
      * size-ratio prefilter: jaccard >= t forces
        min(n_a, n_b) / max(n_a, n_b) >= t, checked on the array sizes
        (with epsilon slack covering the round-to-6 on the verify) —
        provably a candidate superset, no string work.
    """
    from cuda_gis_smoothing_spark.functions.numeric import round6

    # cheap-to-ship, expensive-to-process: the pre-join rows are tiny
    # by bytes (band keys + token arrays), so AQE coalesces the shuffle
    # to ONE partition and the entire pair×intersect work runs on one
    # core (measured 13 s -> 39 s at sf0.1 when an upstream plan change
    # shrank the stats). Pin the parallelism explicitly: spread the
    # projection input and hash-partition both join sides on the join
    # keys with a USER-SPECIFIED count, which AQE does not coalesce.
    parts = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < parts:
        docs = docs.repartition(parts, id_col)
    # INT-coded token arrays (injective global rank — identical
    # intersect/size arithmetic, see coded_token_arrays): the band join
    # ships each doc's array bands·(n_blocks+1) times and intersects
    # O(candidate) pairs, so primitive longs beat UTF8 strings on both
    # shuffle bytes (guide §2.3) and per-pair verify cost (r6 measured
    # curate_corpus 6.3 → 5.0 s, curate_packed 6.1 → 5.7 s isolated)
    coded = coded_token_arrays(docs, id_col, text_col)
    keyed = banded_keys_projection(
        docs.join(coded, id_col),
        n_hashes,
        bands,
        id_col=id_col,
        text_col=text_col,
        extra={"_tok": F.col("_arr")},
        with_band_values=True,
    ).withColumn("_g", F.pmod(F.hash(id_col), F.lit(n_blocks)))
    # both join sides read `keyed`: materialize it once so the per-char
    # token-hash fold over the corpus runs ONCE, not twice (swap for a
    # staged table / reliable checkpoint on a preemptible cluster)
    keyed = keyed.localCheckpoint()
    left = keyed.select(
        F.col(id_col).alias("ida"),
        F.col("_tok").alias("ta"),
        F.col("_bvs").alias("bva"),
        "band",
        "bh",
        F.col("_g").alias("bi"),
        F.explode(F.sequence(F.col("_g"), F.lit(n_blocks - 1))).alias("bj"),
    )
    right = keyed.select(
        F.col(id_col).alias("idb"),
        F.col("_tok").alias("tb"),
        F.col("_bvs").alias("bvb"),
        "band",
        "bh",
        F.explode(F.sequence(F.lit(0), F.col("_g"))).alias("bi"),
        F.col("_g").alias("bj"),
    )
    # unrolled over the constant band count (a Spark `sequence(1,
    # band)` DESCENDS to [1, 0] at band 0 and element_at(_, 0) throws)
    earlier_match = F.lit(False)
    for b2 in range(bands - 1):
        earlier_match = earlier_match | (
            (F.col("band") > b2)
            & (F.element_at("bva", b2 + 1) == F.element_at("bvb", b2 + 1))
        )
    first_band = ~earlier_match
    na, nb = F.size("ta"), F.size("tb")
    size_ok = (
        F.least(na, nb).cast("double")
        >= (threshold - 1e-6) * (F.greatest(na, nb).cast("double"))
    )
    jk = ["band", "bh", "bi", "bj"]
    pairs = (
        left.repartition(parts, *jk)
        .join(right.repartition(parts, *jk), jk)
        .where((F.col("bi") != F.col("bj")) | (F.col("ida") < F.col("idb")))
        .where(first_band)
        .where(size_ok)
    )
    i = F.size(F.array_intersect("ta", "tb"))
    jac = round6(i / (na + nb - i))
    return (
        pairs.select(
            F.greatest("ida", "idb").alias(id_col), jac.alias("_jaccard")
        )
        .where(F.col("_jaccard") >= threshold)
        .select(id_col)
        .distinct()
    )


def verified_jaccard_pairs_prepared(
    cand: DataFrame,
    ta: DataFrame,
    tb: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact-jaccard verification over PREPARED token-array sides:
    ``ta`` = (doc_a, _ta array<string>), ``tb`` = (doc_b, _tb) — the
    incremental curator feeds STORED arrays from its aux state log so
    kept text is never re-tokenized per batch. ONE ``array_intersect``
    per candidate, no candidate x token explode, no aggregation; the
    single copy of the verify arithmetic."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    i = F.size(F.array_intersect("_ta", "_tb"))
    jac = round6(i / (F.size("_ta") + F.size("_tb") - i))
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def token_array_side(
    docs: DataFrame, out_id: str, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(out_id, _ta/_tb) distinct-token-array side for the prepared
    verify (column name follows the out_id: doc_a -> _ta, doc_b -> _tb)."""
    arr = F.expr(TOKEN_ARRAY_SQL.format(text_col=text_col))
    return docs.select(
        F.col(id_col).alias(out_id), arr.alias("_ta" if out_id == "doc_a" else "_tb")
    )


def coded_token_sides(
    a_docs: DataFrame,
    b_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """INT-coded distinct-token-array sides for the per-pair verify
    kernels: each token is recoded to its global ``(xxhash64(t), t)``
    rank — an INJECTIVE map shared by both sides, so every
    ``|A∩B|`` / ``|A|`` the verify computes is IDENTICAL to the
    string-array form (set cardinalities are invariant under injective
    recoding; the rank, unlike a raw hash, cannot collide) while the
    O(pairs) ``array_intersect`` runs on primitive longs instead of
    UTF8 strings — measured 2.6x on the 12.5M-pair exact-jaccard
    verify at sf0.1 (guide §2.3 narrow-types applied to the per-task
    hot loop). Ranks come from ``plans.partitioning.global_ranks`` —
    partition-parallel AND a pure function of the data, so the two
    consumers of the vocab agree even when exchanges are not reused
    (the documented multi-consumer class). The coded tables are
    localCheckpoint'ed: each feeds a verify-side join, and at 100 TB
    they are stored tables anyway (the postings precedent).

    A doc with no tokens yields NO coded row (inner-join drop) — such
    docs cannot appear in any candidate pair (no postings, no
    signature, no fingerprint), so the verify output is unchanged."""
    same = a_docs is b_docs
    if same:
        coded = coded_token_arrays(a_docs, id_col, text_col).localCheckpoint()
        ca = coded.select(F.col(id_col).alias("doc_a"), F.col("_arr").alias("_ta"))
        cb = coded.select(F.col(id_col).alias("doc_b"), F.col("_arr").alias("_tb"))
        return ca, cb
    ta = _doc_tokens(a_docs, text_col, id_col, None)
    tb = _doc_tokens(b_docs, text_col, id_col, None)
    vocab = _token_rank_vocab(ta.select("t").unionByName(tb.select("t")))

    def side(toks: DataFrame, out_id: str) -> DataFrame:
        col = "_ta" if out_id == "doc_a" else "_tb"
        return (
            toks.join(vocab, "t")
            .groupBy(id_col)
            .agg(F.collect_list("_code").alias(col))
            .select(F.col(id_col).alias(out_id), col)
        )

    return side(ta, "doc_a").localCheckpoint(), side(tb, "doc_b").localCheckpoint()


def _token_rank_vocab(tokens: DataFrame) -> DataFrame:
    """(t, _code) injective global token ranks over ``(xxhash64, t)``
    — partition-parallel (global_ranks) and a pure function of the
    data, so multiple consumers agree even when exchanges are not
    reused."""
    from cuda_gis_smoothing_spark.plans.partitioning import global_ranks

    # pmod keeps the leading rank key in [0, 2^31): global_ranks'
    # uniform bucket width math is (hi - lo + 1)-based and a full-range
    # int64 hash overflows it under ANSI; ties on _h break on t, so the
    # (h, t) order stays a total order and the rank stays injective
    vocab = tokens.distinct().withColumn(
        "_h", F.pmod(F.xxhash64("t"), F.lit(1 << 31))
    )
    return global_ranks(vocab, ["_h", "t"], out_col="_code").select("t", "_code")


def coded_token_arrays(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, _arr) — each doc's DISTINCT tokens as an INT-coded
    array under the injective :func:`_token_rank_vocab` map. The
    per-doc core behind :func:`coded_token_sides`; also joined onto
    the doc row by the fused LSH drop kernel so the arrays its band
    join ships bands·(n_blocks+1) times are primitive longs instead
    of UTF8 strings. NOT materialized here — callers checkpoint."""
    toks = _doc_tokens(docs, text_col, id_col, None)
    vocab = _token_rank_vocab(toks.select("t"))
    return (
        toks.join(vocab, "t")
        .groupBy(id_col)
        .agg(F.collect_list("_code").alias("_arr"))
    )


def verified_jaccard_pairs(
    cand: DataFrame,
    a_docs: DataFrame,
    b_docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-jaccard verification of candidate (doc_a, doc_b) pairs:
    doc_a resolved against ``a_docs``, doc_b against ``b_docs`` (the
    sides may be different tables). Text-input convenience wrapper of
    :func:`verified_jaccard_pairs_prepared`. Returns (doc_a, doc_b,
    jaccard) for pairs with jaccard >= threshold.

    Stays on STRING token arrays deliberately: the sides are pure
    projections (no shuffle, no action), which beats the INT-recoded
    form (:func:`coded_token_sides`) for the few-million-pair verifies
    this wrapper serves — measured r6: split_leakage_check 5.4→8.1 s
    and minhash_error_report 6.0→7.1 s REGRESSED under the recode
    (vocab-rank overhead > intersect savings), while the ~12.5M-pair
    unblocked exact-jaccard truth wins 2.6x (that path opts in)."""
    return verified_jaccard_pairs_prepared(
        cand,
        token_array_side(a_docs, "doc_a", id_col, text_col),
        token_array_side(b_docs, "doc_b", id_col, text_col),
        threshold,
    )


def _doc_tokens(df: DataFrame, text_col: str, id_col: str, block_col: str | None):
    """Distinct lowercase whitespace tokens per doc (plus block col)."""
    return df.select(
        id_col,
        *([block_col] if block_col else []),
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))).alias("t"),
    ).where(F.col("t") != "")


def prefix_postings(
    toks: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    keep_stats: bool = False,
) -> DataFrame:
    """AllPairs/PPJoin prefix postings: the provably sufficient subset
    of the token-posting index for Jaccard >= ``threshold``.

    Tokens within each doc are ordered by ascending document frequency
    (tie-break: token text) — any total order is CORRECT, this one is
    FAST because hot tokens sort last and drop out of prefixes. The
    prefix keeps the first ``n - ceil(t*n) + 1`` tokens: a pair with
    Jaccard >= t has intersection >= ceil(t*n) on each side, and its
    smallest common token (in the global order) provably lands in BOTH
    prefixes (Bayardo et al. "Scaling Up All Pairs", Xiao et al.
    PPJoin) — so joining prefixes only loses NOTHING. This is what
    bounds a hot token: one token in 1M docs contributes join rows only
    from the few docs short enough to carry it in their prefix, instead
    of 10^12 posting-pair rows.
    """
    from pyspark.sql import Window

    keys = [id_col] + ([block_col] if block_col else [])
    dfreq = toks.groupBy(*(([block_col] if block_col else []) + ["t"])).agg(
        F.count(F.lit(1)).alias("_df")
    )
    with_df = toks.join(dfreq, ([block_col] if block_col else []) + ["t"])
    w = Window.partitionBy(id_col).orderBy("_df", "t")
    sized = with_df.select(
        *keys,
        "t",
        F.row_number().over(w).alias("_pos"),
        F.count(F.lit(1)).over(Window.partitionBy(id_col)).alias("_n"),
    )
    # epsilon before ceil: fp noise may push an exact t*n UP a notch,
    # which would SHORTEN the prefix and silently lose recall; pushing
    # it down only lengthens the prefix (more candidates, still exact)
    alpha = F.ceil(F.col("_n") * threshold - 1e-9)
    kept = sized.where(F.col("_pos") <= F.col("_n") - alpha + 1)
    # keep_stats: carry (_pos, _n) so the candidate join can apply the
    # PPJoin positional filter (see ngram_jaccard_pairs)
    return kept.select(*keys, "t", *(["_pos", "_n"] if keep_stats else []))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    block_col: str | None = "lang",
) -> DataFrame:
    """Token-set Jaccard near-dup pairs above ``threshold`` — EXACT
    (gated against the all-pairs DuckDB oracle) but candidate-bounded.

    Candidates come from a self-join of :func:`prefix_postings` (see
    there for the zero-recall-loss argument), so the join input is a
    provably sufficient subset of the posting lists and a hot token no
    longer makes the plan quadratic in its document frequency
    (tests/test_partitioning_dedup.py has the synthetic-hot-token
    bound). Verification is one ``array_intersect`` per distinct
    candidate over projected token arrays (no candidate x token
    explode/groupBy — measured 28 → ~8 s at sf0.1), with the posting
    self-join's parallelism pinned (tiny posting rows, superlinear
    pair output — the AQE coalesce blind spot).
    """
    toks = _doc_tokens(df, text_col, id_col, block_col)
    # both self-join sides consume the postings; unmaterialized, each
    # pruned branch re-runs tokenize + posting construction from the
    # corpus (ReuseExchange can't dedup them — the span_coverage
    # lesson). The postings are prefix-filtered (small); stage once.
    pp = prefix_postings(
        toks, threshold, id_col, block_col, keep_stats=True
    ).localCheckpoint()
    join_keys = ["t"] + ([block_col] if block_col else [])
    parts = df.sparkSession.sparkContext.defaultParallelism
    a = pp.repartition(parts, *join_keys).alias("a")
    b = pp.repartition(parts, *join_keys).alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for kcol in join_keys:
        cond = cond & (F.col(f"a.{kcol}") == F.col(f"b.{kcol}"))
    # PPJoin positional filter (Xiao et al.), row-local and LOSSLESS:
    # jaccard >= t forces i >= ceil(t/(1+t)·(na+nb)); for a pair's
    # FIRST shared token (global df order) all earlier tokens are
    # disjoint, so i <= 1 + min(na − pa, nb − pb) — and the prefix
    # theorem guarantees that first shared token sits in BOTH prefixes,
    # so every qualifying pair keeps at least that row. Later shared
    # rows may be dropped freely (the pair is already emitted by its
    # first row; distinct dedups anyway). The threshold rides the same
    # −1e-6 slack as the verify's round6 boundary. Prunes the raw join
    # output BEFORE the distinct — the exact kernel's dominant stage
    # (r6: join+distinct 11.7 → measured below; pairs 12.5M → fewer).
    te = threshold - 1e-6
    ubound = F.lit(1) + F.least(
        F.col("a._n") - F.col("a._pos"), F.col("b._n") - F.col("b._pos")
    )
    alpha = F.ceil(
        (F.col("a._n") + F.col("b._n")) * F.lit(te / (1.0 + te)) - F.lit(1e-9)
    )
    cond = cond & (ubound >= alpha)
    cand = (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    # INT-coded token arrays for the verify: this is the one verify
    # whose candidate set can approach N²/2 on a self-similar corpus
    # (12.5M distinct pairs at sf0.1 — the prefix filter provably loses
    # nothing but prunes little there), so the O(pairs) intersect cost
    # dominates and the injective recode's fixed vocab-rank overhead
    # amortizes: measured 7.3 s → 2.9 s on the verify stage, identical
    # output (set cardinality is invariant under an injective map).
    # Explicit broadcast: a localCheckpoint'ed side has no size stats,
    # so the planner would SortMergeJoin — shuffling+sorting the whole
    # pair stream twice (plan-verified; cost exceeded the recode win).
    ta, tb = coded_token_sides(df, df, id_col, text_col)
    return verified_jaccard_pairs_prepared(
        cand, F.broadcast(ta), F.broadcast(tb), threshold
    )


def verified_containment_pairs_prepared(
    cand: DataFrame,
    ta: DataFrame,
    tb: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact-containment verification over prepared token-array sides
    (shape of :func:`verified_jaccard_pairs_prepared`): containment =
    round6(|A∩B| / min(|A|, |B|)) — the max-direction containment,
    i.e. how much of the SMALLER doc is inside the larger."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    i = F.size(F.array_intersect("_ta", "_tb"))
    c = round6(i / F.least(F.size("_ta"), F.size("_tb")))
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("doc_a", "doc_b", c.alias("containment"))
        .where(F.col("containment") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    block_col: str | None = "lang",
    max_df: int | None = None,
) -> DataFrame:
    """Token-set CONTAINMENT near-dup pairs:
    ``round6(|A∩B| / min(|A|,|B|)) >= threshold``, output
    ``(doc_a, doc_b, containment)`` with ``doc_a < doc_b``, pairs
    within the same ``block_col`` value.

    Jaccard misses doc-inside-doc duplication — a short doc quoted
    wholesale inside a long one has tiny jaccard but containment 1.0.
    This is the token-set-granularity form of that check
    (:func:`duplicate_spans` is the position-granularity form), the
    standard second dedup axis of corpus pipelines.

    Candidates: ASYMMETRIC AllPairs. A qualifying pair has
    ``|∩| >= ceil(t * n_small)``, so the smallest common token in the
    global df order provably lands in the SMALLER doc's
    :func:`prefix_postings` prefix (same bound as the jaccard case,
    applied to the small side only); the larger side must be probed
    with its FULL postings — its intersection bound is relative to the
    OTHER doc's size, so no prefix is sufficient for it. The
    ``(n, id)``-lexicographic join condition assigns the roles. Zero
    recall loss w.r.t. the EXACT threshold; one ``array_intersect``
    per distinct candidate; the posting join's parallelism pinned
    (the AQE blind spot). Round6-boundary caveat (same class as the
    jaccard prefix path, but systematic rather than noise): the
    verify/twin threshold on the ROUNDED ratio admits a pair whose
    exact ratio is up to ~5e-7 BELOW t (i = ceil(t·n)-1 rounding up
    to t, possible only for n ≳ 4·10⁵ distinct tokens per doc); the
    prefix bound is derived from the exact t, so such a pair could
    lack a candidate. Out of range for bounded-length web documents;
    derive the prefix from t - 1e-6 if docs that large ever appear.

    Skew lever (``max_df``, the bm25_search precedent): the full-side
    postings keep hot tokens — unlike the two-sided-prefix jaccard
    join — so a stop-token contributes (its prefix-side docs) × (its
    full df) candidate rows into ONE join task. ``max_df`` drops
    tokens whose per-block document frequency exceeds the cap from the
    FULL postings side before the join, bounding every join key's
    fan-out by (prefix df) × ``max_df``. Candidate generation only:
    verification still intersects FULL token arrays, so every
    surviving pair's containment value is exact and unchanged. With
    ``max_df`` ≥ the corpus' true max df the output is IDENTICAL (no
    token dropped — tested); below it, a pair whose every shared
    prefix-qualifying token is capped leaves the result — the standard
    stop-list recall trade, callers pick the cap. The default (None)
    disables the cap so the gate twin needs no mirror.
    """
    toks = _doc_tokens(df, text_col, id_col, block_col)
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    # both candidate sides re-derive tokens+sizes; stage them once
    # (prefix side is small; the full side is the token table itself)
    pp = (
        prefix_postings(toks, threshold, id_col, block_col)
        .join(sizes, id_col)
        .localCheckpoint()
    )
    full = toks.join(sizes, id_col)
    if max_df is not None:
        # per-(block, token) df, matching the join keys below — the
        # anti-join input is the vocab table (tiny next to postings)
        gkeys = ([block_col] if block_col else []) + ["t"]
        hot = (
            toks.groupBy(*gkeys)
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > float(max_df))
            .select(*gkeys)
        )
        full = full.join(hot, gkeys, "left_anti")
    full = full.localCheckpoint()
    join_keys = ["t"] + ([block_col] if block_col else [])
    parts = df.sparkSession.sparkContext.defaultParallelism
    a = pp.repartition(parts, *join_keys).alias("a")
    b = full.repartition(parts, *join_keys).alias("b")
    smaller = (F.col("a._n") < F.col("b._n")) | (
        (F.col("a._n") == F.col("b._n"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    )
    cond = smaller
    for kcol in join_keys:
        cond = cond & (F.col(f"a.{kcol}") == F.col(f"b.{kcol}"))
    cand = (
        a.join(b, cond)
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_b"),
        )
        .distinct()
    )
    # one checkpointed token-array table serves BOTH verify sides (the
    # containment_pairs_banded lesson: two token_array_side plans
    # re-tokenized the corpus once per side)
    arr = df.select(
        F.col(id_col).alias("_id"),
        F.expr(TOKEN_ARRAY_SQL.format(text_col=text_col)).alias("_arr"),
    ).localCheckpoint()
    return verified_containment_pairs_prepared(
        cand,
        arr.select(F.col("_id").alias("doc_a"), F.col("_arr").alias("_ta")),
        arr.select(F.col("_id").alias("doc_b"), F.col("_arr").alias("_tb")),
        threshold,
    )


def containment_pairs_banded(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_hashes: int = 6,
    bands: int = 3,
    max_bucket_gap: int = 1,
) -> DataFrame:
    """APPROXIMATE containment pairs — the recall-traded LSH candidate
    route beside the exact :func:`containment_pairs` (which stays the
    lossless path; this is its sub-quadratic sibling, the
    ``dedup_embedding_banded``-vs-exact pattern applied to
    containment). Output shape identical: ``(doc_a, doc_b,
    containment)`` with the EXACT round6 containment of every
    surviving pair (verification intersects full token sets — only
    candidate RECALL is traded).

    Candidates: a pair must (a) share a MinHash LSH band value and
    (b) sit within ``max_bucket_gap`` geometric size buckets
    (g = ⌊log₂ |tokens|⌋, computed as ``length(bin(n)) - 1`` — pure
    integer arithmetic, no float log to disagree cross-engine).

    Recall contract (documented, measured in pytest, inherent — not a
    bug): containment t between sizes a ≤ b ≤ r·a implies jaccard ≥
    t/(1 + r − t); within gap 1 the ratio is < 4, so t = 0.8 pairs can
    sit at jaccard ≈ 0.19 where 6-hash/3-band LSH fires with modest
    probability — banding CANNOT be recall-exact for containment, and
    pairs with size ratio ≥ 2^(gap+1) (a snippet inside a much larger
    doc — exactly what the asymmetric-prefix exact path exists for)
    are out of candidate scope BY CONSTRUCTION. What the bucket gap
    buys at 100 TB: the band join's fan-out never pairs a shard-sized
    doc with every snippet sharing a hot band value — per-band-bucket
    work is bounded by the bucket's size-neighborhood, and every
    shuffle key is (band, bh), never all-pairs.
    """
    banded = banded_signature_rows(df, text_col, id_col, n_hashes, bands)
    toks = _doc_tokens(df, text_col, id_col, None)
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    g = (F.length(F.expr("bin(_n)")) - 1).alias("_g")
    # withg feeds BOTH sides of the band self-join — without the
    # checkpoint the signature+size subplan (a full tokenize+minhash
    # pass) executes twice (the multi-consumer derived-subplan class).
    withg = (
        banded.join(sizes, id_col)
        .select(id_col, "band", "bh", g)
        .localCheckpoint()
    )
    parts = df.sparkSession.sparkContext.defaultParallelism
    a = withg.repartition(parts, "band", "bh").alias("a")
    b = withg.repartition(parts, "band", "bh").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (
                F.abs(F.col("a._g") - F.col("b._g")) <= max_bucket_gap
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    # INT-coded verify sides (one tokenize pass, checkpointed, shared
    # by both join sides; containment is invariant under the injective
    # recode — see coded_token_sides). This candidate stream is ~8.4M
    # pairs at sf0.1 — measured 6.4 -> 5.0 s against the two
    # string-array sides (which also re-tokenized the corpus twice);
    # the sub-10M-pair rejection note in verified_jaccard_pairs is
    # about adding a vocab-rank build where NO shared-side checkpoint
    # existed, which is not this shape.
    ca, cb = coded_token_sides(df, df, id_col=id_col, text_col=text_col)
    return verified_containment_pairs_prepared(cand, ca, cb, threshold)


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``.

    Exact pairwise verifier over the fingerprint table (tiny rows),
    quadratic in doc count — the differential baseline for
    :func:`simhash_pairs_banded`, which is the scale path (same rows,
    candidates from pigeonhole band equi-joins instead of all pairs).
    """
    sh = simhash(df, text_col=text_col, id_col=id_col, bits=bits)
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("hb"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    ham = F.expr("bit_count(ha ^ hb)").cast("long").alias("hamming")
    return pairs.select("doc_a", "doc_b", ham).where(F.col("hamming") <= max_hamming)


def banded_hamming_pairs(
    fp: DataFrame,
    fp_col: str,
    id_col: str,
    max_hamming: int,
    bits: int,
    out_a: str = "doc_a",
    out_b: str = "doc_b",
) -> DataFrame:
    """EXACT Hamming-distance pair join over ANY integer fingerprint
    column (simhash, image phash, ...) without the quadratic self-join.

    Pigeonhole banding: split the fingerprint into ``max_hamming + 1``
    bands; a pair within Hamming distance ``max_hamming`` has at most
    ``max_hamming`` differing bits across ``max_hamming + 1`` bands, so
    at least one band matches EXACTLY. Candidates therefore come from
    equi-joins keyed on (band_id, band_value) — shuffle on band
    buckets, never all-pairs — then one bit_count verifies. Arithmetic
    shift + mask makes band extraction sign-safe for bit-63
    fingerprints. Output: (out_a, out_b, hamming).
    """
    bands = max_hamming + 1
    if bits % bands:
        raise ValueError("bits must divide evenly into max_hamming+1 bands")
    width = bits // bands
    mask = (1 << width) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(fp_col, b * width).bitwiseAND(F.lit(mask)).alias("bv"),
            )
            for b in range(bands)
        ]
    )
    banded = fp.select(
        F.col(id_col), F.col(fp_col).alias("_fp"), F.explode(band_structs).alias("bb")
    ).select(id_col, "_fp", "bb.band", "bb.bv")
    # pinned parallelism: fingerprint band rows are ~16 bytes but the
    # pair output is superlinear (the AQE coalesce blind spot)
    parts = fp.sparkSession.sparkContext.defaultParallelism
    banded = banded.repartition(parts, "band", "bv")
    a = banded.select(
        F.col(id_col).alias(out_a), F.col("_fp").alias("ha"), "band", "bv"
    )
    b = banded.select(
        F.col(id_col).alias(out_b), F.col("_fp").alias("hb"), "band", "bv"
    )
    cand = (
        a.join(b, ["band", "bv"])
        .where(F.col(out_a) < F.col(out_b))
        .select(out_a, out_b, "ha", "hb")
        .distinct()  # a pair may match in several bands
    )
    ham = F.expr("bit_count(ha ^ hb)").cast("long").alias("hamming")
    return cand.select(out_a, out_b, ham).where(F.col("hamming") <= max_hamming)


def simhash_pairs_banded(
    df: DataFrame,
    max_hamming: int = 3,
    bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT simhash near-dup pairs without the quadratic self-join —
    the 100 TB path :func:`simhash_pairs`'s docstring promises; the
    banding itself is the generic :func:`banded_hamming_pairs`.
    Returns the same rows as the quadratic verifier (gated against the
    same DuckDB oracle to prove zero recall loss)."""
    sh = simhash(df, text_col=text_col, id_col=id_col, bits=bits)
    return banded_hamming_pairs(sh, "simhash", id_col, max_hamming, bits)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_blocks: int = 8,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim >= threshold) — the
    EXACT all-pairs verifier, shaped as a blocked triangle equi-join.

    A thresholded cosine join has no equi key, and below ~0.7 the
    qualifying pairs are up to 66 degrees apart — no LSH banding is
    recall-exact there (measured on this corpus: pairs at 0.4 differ in
    up to 21 of 32 hyperplane sign bits), so the N^2/2 candidate WORK
    is inherent to the exact semantics. What is NOT inherent is the
    single-threaded plan Spark gives a non-equi self-join
    (BroadcastNestedLoop/CartesianProduct): here each vector gets a
    hash block g in [0, n_blocks); the left side replicates to block
    pairs (g, j>=g), the right to (i<=g, g), and the join is EQUI on
    the (i, j) pair — hash-partitioned into n_blocks*(n_blocks+1)/2
    balanced tasks with no driver-side or nested-loop node
    (plan-asserted in tests/test_plans.py). Replication is balanced by
    construction: block g ships (n_blocks - g) left copies and (g + 1)
    right copies — n_blocks + 1 total for EVERY block, so no
    tournament re-pairing is needed, and per-task work is |Ni| x |Nj|
    (uniform under hash blocking). n_blocks trades total shuffle
    volume (~n_blocks/2 effective copies per side) against parallelism
    (~n_blocks^2/2 tasks); the same blocked kernel is what runs
    per-bucket when candidates come from
    :func:`embedding_neardup_pairs_banded` — the scale path for real
    near-dup thresholds.
    """
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.similarity import dot_col, with_norm

    n = with_norm(df, emb_col).select(
        F.col(id_col), F.col("_emb"), F.col("_nrm"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("_g"),
        *[F.col(c) for c in extra_cols],
    )
    left = n.select(
        F.col(id_col).alias("ida"),
        F.col("_emb").alias("ea"),
        F.col("_nrm").alias("na"),
        F.col("_g").alias("bi"),
        F.explode(F.sequence(F.col("_g"), F.lit(n_blocks - 1))).alias("bj"),
        *[F.col(c).alias(f"{c}_l") for c in extra_cols],
    )
    right = n.select(
        F.col(id_col).alias("idb"),
        F.col("_emb").alias("eb"),
        F.col("_nrm").alias("nb"),
        F.explode(F.sequence(F.lit(0), F.col("_g"))).alias("bi"),
        F.col("_g").alias("bj"),
        *[F.col(c).alias(f"{c}_r") for c in extra_cols],
    )
    # pin the pair-stage parallelism: the block keys are tiny by bytes,
    # so AQE would coalesce the shuffle and run the O(N^2/2) dot
    # products on one core (user-specified repartition is not coalesced)
    parts = df.sparkSession.sparkContext.defaultParallelism
    pairs = (
        left.repartition(parts, "bi", "bj")
        .join(right.repartition(parts, "bi", "bj"), ["bi", "bj"])
        .where((F.col("bi") != F.col("bj")) | (F.col("ida") < F.col("idb")))
    )
    sim = dot_col("ea", "eb") / (F.col("na") * F.col("nb"))
    # extra_cols ride through id-aligned: {c}_a belongs to vec_a (the
    # smaller id), {c}_b to vec_b — callers like ivf_silhouette carry
    # the bucket assignment through the kernel instead of re-joining
    # the (much larger) pair output against it afterwards
    extras = [
        F.when(F.col("ida") < F.col("idb"), F.col(f"{c}_l"))
        .otherwise(F.col(f"{c}_r"))
        .alias(f"{c}_a")
        for c in extra_cols
    ] + [
        F.when(F.col("ida") < F.col("idb"), F.col(f"{c}_r"))
        .otherwise(F.col(f"{c}_l"))
        .alias(f"{c}_b")
        for c in extra_cols
    ]
    return pairs.select(
        F.least("ida", "idb").alias("vec_a"),
        F.greatest("ida", "idb").alias("vec_b"),
        round6(sim).alias("cosine"),
        *extras,
    ).where(F.col("cosine") >= threshold)


#: deterministic hyperplane family shared with the DuckDB twin — plane
#: p weights dimension i by ((i*(2p+3) + p*p + 1) % 7) - 3 (the same
#: construction similarity.lsh_bucketed_knn uses, widened to 32 planes)
EMB_PLANES = 32
EMB_BANDS = 4


def _plane_proj(emb: str, p: int):
    return F.expr(
        f"aggregate(zip_with({emb}, sequence(0, size({emb}) - 1), "
        f"(x, i) -> x * (CAST((i * {2 * p + 3} + {p * p + 1}) % 7 AS DOUBLE) - 3.0)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def embedding_neardup_pairs_banded(
    df: DataFrame,
    threshold: float = 0.2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = EMB_PLANES,
    bands: int = EMB_BANDS,
    probe_bits: int = 0,
) -> DataFrame:
    """Bucketed (approximate) embedding near-dup pairs: candidates from
    banded hyperplane sign bits, exact cosine verified within candidates
    — the 100 TB path whose shuffle keys are (band, band_value) buckets,
    never all-pairs.

    ``n_planes`` deterministic hyperplanes give each vector a sign
    bitstring; split into ``bands`` bands, a pair is a candidate iff
    some band matches EXACTLY (equi-join per band, like
    :func:`simhash_pairs_banded` — but over continuous vectors banding
    is a recall/cost dial, not a pigeonhole guarantee: on the driver
    fixture it prunes the pair space to ~6% and keeps ~all recall at
    sign-stable high thresholds, while at 0.4 — 66-degree pairs — the
    measured recall is low; tests/test_partitioning_dedup.py documents
    the measured numbers, and the driver gate checks this operator's
    declared banded semantics exactly against a DuckDB twin of the same
    arithmetic).

    ``probe_bits=1`` is the multi-probe recall dial: one join side also
    emits every band value with a single bit flipped, so pairs whose
    best band differs in exactly one sign bit become candidates too —
    +width keys per band per vector (linear), recall strictly grows
    (tested). BOTH settings are driver-gated: ``dedup_embedding_banded``
    runs probe_bits=0, ``dedup_embedding_probed`` runs probe_bits=1
    against a DuckDB twin of the same one-bit-flip key expansion.
    """
    if probe_bits not in (0, 1):
        raise ValueError("probe_bits supports 0 (exact bands) or 1")
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.similarity import dot_col, with_norm

    if n_planes % bands:
        raise ValueError("n_planes must divide evenly into bands")
    width = n_planes // bands
    n = with_norm(df, emb_col).select(F.col(id_col), F.col("_emb"), F.col("_nrm"))
    # consumed by 3 branches (band keys + both verify sides): compute
    # the norms once instead of re-scanning per branch
    n = n.localCheckpoint()
    band_vals = []
    for b in range(bands):
        bv = F.lit(0)
        for k in range(width):
            p = b * width + k
            bit = F.when(_plane_proj("_emb", p) > 0, F.lit(1 << k)).otherwise(F.lit(0))
            bv = bv + bit
        band_vals.append(F.struct(F.lit(b).alias("band"), bv.alias("bv")))
    keys = n.select(
        F.col(id_col), F.explode(F.array(*band_vals)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))
    a = keys.select(F.col(id_col).alias("vec_a"), "band", "bv")
    b_keys = keys
    if probe_bits == 1:
        flips = F.array(*[F.expr(f"bv ^ {1 << k}") for k in range(width)])
        probed = keys.select(F.col(id_col), "band", F.explode(flips).alias("bv"))
        b_keys = keys.unionByName(probed)
    b2 = b_keys.select(F.col(id_col).alias("vec_b"), "band", "bv")
    parts = df.sparkSession.sparkContext.defaultParallelism
    cand = (
        a.repartition(parts, "band", "bv")
        .join(b2.repartition(parts, "band", "bv"), ["band", "bv"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    va = n.select(
        F.col(id_col).alias("vec_a"), F.col("_emb").alias("ea"), F.col("_nrm").alias("na")
    )
    vb = n.select(
        F.col(id_col).alias("vec_b"), F.col("_emb").alias("eb"), F.col("_nrm").alias("nb")
    )
    sim = dot_col("ea", "eb") / (F.col("na") * F.col("nb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", round6(sim).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """SimHash fingerprint (``bits`` wide, up to 64) over distinct
    tokens.

    Bit b of the fingerprint = majority vote of bit b across token
    hashes. Expressed as explode(tokens) x explode(bits) → groupBy —
    all JVM-side arithmetic on the shared portable token hash.

    The base token hash carries 31 usable bits (mod MH_PRIME < 2^31);
    wider fingerprints read bits from independent affine transforms of
    it (the MinHash transform family): bit b votes on bit ``b % 31`` of
    ``h_(b//31)`` where h_0 = h (so fingerprints up to 31 bits — and
    the 16-bit driver gate — are unchanged) and h_k = (h*A_k + B_k) %
    MH_PRIME. The fingerprint itself aggregates with ``bit_or`` (not a
    sum), so bit 63 is sign-safe in one BIGINT.
    """
    if bits > 64:
        raise ValueError("simhash supports at most 64 bits")
    toks = df.select(
        id_col, F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))).alias("t")
    ).where(F.col("t") != "")
    h = toks.select(id_col, token_hash_col("t").alias("h"))
    tiers = ["h"]
    for k in range((bits + 30) // 31 - 1):
        tiers.append(f"((h * {MH_A[k]} + {MH_B[k]}) % {MH_PRIME})")
    vote_src = (
        "CASE " + " ".join(
            f"WHEN b DIV 31 = {k} THEN {t}" for k, t in enumerate(tiers)
        ) + " END"
    )
    bit = F.explode(F.array(*[F.lit(b) for b in range(bits)])).alias("b")
    votes = h.select(id_col, "h", bit).select(
        id_col,
        "b",
        F.expr(f"(shiftright({vote_src}, b % 31) & 1) * 2 - 1").alias("v"),
    )
    bitvals = votes.groupBy(id_col, "b").agg(F.sum("v").alias("s"))
    return bitvals.groupBy(id_col).agg(
        F.expr(
            "bit_or(CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), b) "
            "ELSE CAST(0 AS BIGINT) END)"
        ).alias("simhash")
    )


def _canonical_edges(e: DataFrame) -> DataFrame:
    """Undirected edge list as (a, b) with a > b, no self-loops, deduped."""
    return (
        e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): every node connects its STRICTLY LARGER
    neighbors to the minimum of its closed neighborhood. The
    neighborhood minimum rides a window over the symmetrized edges
    (ONE exchange by node id, no join): the old groupBy+equi-join form
    shipped the full symmetrized list through a SECOND exchange on the
    same key for no extra information, and per-round exchange count is
    the latency floor of the whole CC loop once round 1 has collapsed
    the graph (measured: the post-collapse rounds are fixed-latency,
    not data-bound). Output may contain duplicate rows — small-star's
    min is duplicate-insensitive and its trailing distinct dedups, so
    a distinct here would only add an exchange. Shuffle volume equals
    the join form's (that join also shuffled all of sym by ``a``); the
    window adds a per-partition sort but drops a whole pass.
    """
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mv = F.min("b").over(Window.partitionBy("a"))
    return (
        sym.withColumn("_m", F.least(mv, F.col("a")))
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node connects itself and its smaller
    neighbors to its minimum smaller neighbor. Input/output canonical
    (a > b). Same windowed shape as :func:`_large_star`: per-group min
    over one exchange, then every row rewires IN PLACE — a row sitting
    at the group minimum emits the root edge ``(a, m)``, every other
    row the sibling edge ``(b, m)`` — and one distinct canonicalizes
    the round (the set output is what the convergence probe
    compares)."""
    m = F.min("b").over(Window.partitionBy("a"))
    return (
        e.withColumn("_m", m)
        .select(
            F.when(F.col("b") == F.col("_m"), F.col("a"))
            .otherwise(F.col("b"))
            .alias("a"),
            F.col("_m").alias("b"),
        )
        .distinct()
    )


def neardup_components(
    df: DataFrame,
    max_hamming: int = 1,
    bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_rounds: int = 16,
    check_every: int = 2,
) -> DataFrame:
    """Connected components over the simhash near-dup graph: every doc
    labeled with the SMALLEST doc_id transitively reachable through
    pairs within ``max_hamming`` — the canonicalization step of a dedup
    pipeline (keep one representative per component).

    Large-star/small-star alternation (Kiveris et al.): each round
    rewires edges toward local minima, converging to per-component
    stars in O(log n) rounds INDEPENDENT of component diameter — a
    length-L chain needs ~log L rounds here vs L rounds of plain label
    propagation (:func:`neardup_components_propagation`, retained as
    the differential twin). Per round: two groupBy+join passes over the
    edge list, lineage truncated with ``localCheckpoint`` (swap for
    reliable ``checkpoint`` on a preemptible cluster). Convergence is
    checked only every ``check_every`` rounds (one cheap
    symmetric-difference probe) instead of a driver action per round
    (the sf0.01 fixture converges at round 5, so probing every 2 stops
    at round 6 instead of 8);
    if the budget runs out unconverged the loop RAISES rather than
    returning wrong labels silently.

    Not SQL-expressible in one pass — the DuckDB oracle uses a
    recursive CTE (transitive closure + min per node), so the gate
    cross-validates an ITERATIVE Spark algorithm against a recursive
    SQL one.
    """
    pairs = simhash_pairs_banded(
        df, max_hamming=max_hamming, bits=bits, text_col=text_col, id_col=id_col
    )
    return star_components(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")),
        df.select(F.col(id_col)),
        id_col=id_col,
        max_rounds=max_rounds,
        check_every=check_every,
    )


def star_components(
    edge_pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    max_rounds: int = 16,
    check_every: int = 2,
    pre_canonicalized: bool = False,
) -> DataFrame:
    """The large-star/small-star iteration over an ARBITRARY edge list
    ``(a, b)`` — the generic core :func:`neardup_components` (simhash
    graph) and :func:`embedding_components` (ANN graph) share. Every
    node in ``nodes`` (single column ``id_col``) is labeled with the
    smallest transitively-reachable id; isolated nodes label
    themselves. Raises on non-convergence (see neardup_components).

    ``pre_canonicalized=True`` skips the canonical-edge pass AND its
    checkpoint: the caller asserts ``edge_pairs`` is already canonical
    (``a > b``, no self-loops), DISTINCT, and materialized (a
    localCheckpoint the caller also reads for other consumers) —
    otherwise the same 2M-row stream materializes twice back-to-back
    (once for the caller's consumers, once here)."""
    if pre_canonicalized:
        edges = edge_pairs
    else:
        edges = _canonical_edges(edge_pairs).localCheckpoint()
    converged = False
    for r in range(1, max_rounds + 1):
        nxt = _small_star(_large_star(edges)).localCheckpoint()
        if r % check_every == 0 or r == max_rounds:
            diff = (
                nxt.exceptAll(edges).union(edges.exceptAll(nxt)).limit(1).count()
            )
            if diff == 0:
                converged = True
                edges = nxt
                break
        edges = nxt
    if not converged:
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds"
        )
    # at the star fixpoint every non-root node has exactly one edge to
    # its component root (= component min)
    roots = edges.groupBy("a").agg(F.min("b").alias("component"))
    return (
        nodes.select(F.col(id_col).alias("a"))
        .join(roots, "a", "left")
        .select(
            F.col("a").alias(id_col),
            F.coalesce("component", F.col("a")).alias("component"),
        )
    )


def embedding_components(
    emb: DataFrame, threshold: float, id_col: str = "vec_id"
) -> DataFrame:
    """Semantic-dedup clusters: connected components over the BANDED
    embedding near-dup graph (:func:`embedding_neardup_pairs_banded`
    edges at cosine ≥ ``threshold``) — the embedding-space analog of
    :func:`neardup_components`, labeling every vector with its
    cluster's smallest vec_id. The candidate graph is the banded one
    (recall limits at low thresholds documented there); the DuckDB
    twin composes the SAME banded pair SQL under a recursive closure,
    so the gate checks the iterative star algorithm against recursive
    SQL over an identical edge set."""
    pairs = embedding_neardup_pairs_banded(emb, threshold=threshold)
    return star_components(
        pairs.select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b")),
        emb.select(F.col(id_col)),
        id_col=id_col,
    )


def embedding_component_density(
    emb: DataFrame, threshold: float, id_col: str = "vec_id"
) -> DataFrame:
    """Per-cluster edge density over the banded embedding near-dup
    graph — the cluster-level refinement of
    :func:`embedding_components`' labels and the decision card behind
    dedup_canonicals' collapse: density ``2e/(n(n−1))`` near 1 marks a
    CLIQUE (one canonical per cluster is safe), near 0 a CHAIN whose
    transitive collapse over-merges (the per-cluster form of
    :func:`embedding_triangles`' global transitivity question). One
    row per component with ≥ 1 edge: (component, n_members, n_edges,
    density). Singleton vectors have no density question and are
    excluded BY CONSTRUCTION (vertices = pair endpoints only).

    Exactness: member and edge counts are integers; density is ONE
    double division of exact int64s under round6 (the
    embedding_local_clustering layering — zero sum-association
    exposure). Every edge's endpoints share a component by definition,
    so attributing each pair through its left endpoint's label counts
    every intra-component edge exactly once.

    Plan (100 TB): the banded pair kernel (blocked, AQE-pinned) + the
    O(log n) star rounds; pairs and labels each feed two consumers →
    both localCheckpoint'ed (the multi-consumer scan lesson). The
    DuckDB twin composes the SAME banded SQL under a recursive
    closure (the embedding_components precedent)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    pairs = (
        embedding_neardup_pairs_banded(emb, threshold=threshold)
        .select("vec_a", "vec_b")
        .localCheckpoint()
    )
    verts = (
        pairs.select(F.col("vec_a").alias(id_col))
        .unionAll(pairs.select(F.col("vec_b").alias(id_col)))
        .distinct()
    )
    labels = star_components(
        pairs.select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b")),
        verts,
        id_col=id_col,
    ).localCheckpoint()
    members = labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    edges = (
        pairs.join(labels, pairs["vec_a"] == labels[id_col])
        .groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
    return members.join(edges, "component").select(
        "component",
        "n_members",
        "n_edges",
        round6(
            F.lit(2.0)
            * F.col("n_edges")
            / (F.col("n_members") * (F.col("n_members") - F.lit(1)))
        ).alias("density"),
    )


def dedup_threshold_sweep(
    emb: DataFrame,
    thresholds: tuple[float, ...] = (0.2, 0.3, 0.4),
    id_col: str = "vec_id",
) -> DataFrame:
    """Threshold-tuning card for embedding near-dup: per-cosine-cutoff
    cluster census over the banded graph — the measurement a pipeline
    owner reads BEFORE picking the dedup threshold (too low collapses
    distinct documents through chains, too high keeps duplicates). One
    row per threshold: n_pairs (verified banded edges), n_clustered
    (vectors in ≥1 pair), n_components (non-singleton clusters),
    largest_component, drop_count (vectors a one-canonical-per-cluster
    collapse would drop = n_clustered − n_components). The census is
    over the BANDED graph at each cutoff — the same graph the
    dedup_embedding_banded / embedding_components gates serve, so the
    card describes exactly what the production collapse would do
    (banding recall limits at low-sign-stability thresholds are
    documented on the pair kernel).

    Plan (100 TB): the banded pair kernel runs ONCE at min(thresholds)
    — candidates don't depend on the cutoff, higher cutoffs are pure
    filters over the verified pair set (localCheckpoint'ed: every
    threshold × {count, vertices, CC edges} consumer re-derives it
    otherwise) — then one star-CC per threshold over a shrinking
    graph. Exactness: all census values are integers; the ≥-compare
    runs over round6 cosines against the same parsed literal on both
    engines (the quality_weighted_quantiles identical-shape class).
    The DuckDB twin unions one recursive-closure census per threshold
    over the SAME banded SQL (explicit DISTINCT vertex CTE — the
    WITH-RECURSIVE bare-UNION class)."""
    if not thresholds or list(thresholds) != sorted(set(thresholds)):
        raise ValueError("thresholds must be strictly increasing")
    base = (
        embedding_neardup_pairs_banded(emb, threshold=min(thresholds))
        .select("vec_a", "vec_b", "cosine")
        .localCheckpoint()
    )

    def census(t: float):
        """One threshold's 1-row census, materialized — the per-cutoff
        star-CC rounds are chains of tiny blocking actions, so the
        cutoffs run from a driver thread pool (guide §2.6: independent
        jobs overlap; r6 measured 10.3 → 4.8 s for the card)."""
        pairs = base.where(F.col("cosine") >= F.lit(float(t))).localCheckpoint()
        verts = (
            pairs.select(F.col("vec_a").alias(id_col))
            .unionAll(pairs.select(F.col("vec_b").alias(id_col)))
            .distinct()
        )
        labels = star_components(
            pairs.select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b")),
            verts,
            id_col=id_col,
        )
        sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("_sz"))
        summary = sizes.agg(
            F.count(F.lit(1)).cast("long").alias("n_components"),
            F.coalesce(F.sum("_sz"), F.lit(0)).cast("long").alias("n_clustered"),
            F.coalesce(F.max("_sz"), F.lit(0))
            .cast("long")
            .alias("largest_component"),
        )
        return (
            pairs.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
            .crossJoin(summary)
            .select(
                F.lit(float(t)).alias("threshold"),
                "n_pairs",
                "n_clustered",
                "n_components",
                "largest_component",
                (F.col("n_clustered") - F.col("n_components"))
                .cast("long")
                .alias("drop_count"),
            )
            .localCheckpoint()
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thresholds)) as pool:
        rows = list(pool.map(census, thresholds))  # row order = threshold order
    out = rows[0]
    for row in rows[1:]:
        out = out.unionAll(row)
    return out


def embedding_triangles(
    emb: DataFrame, threshold: float, id_col: str = "vec_id"
) -> DataFrame:
    """Triangle census of the banded embedding near-dup graph — the
    graph-analytics sibling of :func:`embedding_components`: one row
    ``(n_edges, n_wedges, n_triangles, global_clustering)`` where
    global clustering = 3·triangles / wedges (the transitivity ratio
    dedup pipelines read to decide whether near-dup clusters are
    CLIQUES — safe to collapse to one canonical — or CHAINS, where
    transitive collapse over-merges; the reference question behind
    dedup_canonicals' quality-argmax).

    All counting is integer-exact. Every pair arrives a < b, so the
    a<b<c triangle joins ((a,b) ⋈ (b,c) ⋈ (a,c)) count each triangle
    exactly once; wedges come from the symmetric degree (Σ d·(d−1)/2,
    exact in int64). The pair table feeds FOUR consumers (degree +
    three join legs) — localCheckpoint'ed once (the multi-consumer
    scan lesson)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    pairs = (
        embedding_neardup_pairs_banded(emb, threshold=threshold)
        .select("vec_a", "vec_b")
        .localCheckpoint()
    )
    deg = (
        pairs.select(F.col("vec_a").alias("v"))
        .unionAll(pairs.select(F.col("vec_b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    # all-integer wedge count: Σ d·(d−1) is even, halved with INTEGER
    # division after the integer sum (a double division would lose
    # exactness past 2^53 and Spark's truncating cast could disagree
    # with DuckDB's rounding cast by 1)
    wedges = deg.agg(
        F.expr("sum(_d * (_d - 1)) div 2").cast("long").alias("_w")
    )
    e1 = pairs.select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b"))
    e2 = pairs.select(F.col("vec_a").alias("b"), F.col("vec_b").alias("c"))
    e3 = pairs.select(F.col("vec_a").alias("a"), F.col("vec_b").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"], "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("_t"))
    )
    n_edges = pairs.agg(F.count(F.lit(1)).cast("long").alias("_e"))
    return (
        n_edges.crossJoin(wedges)
        .crossJoin(tri)
        .select(
            F.col("_e").alias("n_edges"),
            F.col("_w").alias("n_wedges"),
            F.col("_t").alias("n_triangles"),
            round6(
                F.when(F.col("_w") > 0, 3.0 * F.col("_t") / F.col("_w"))
                .otherwise(F.lit(0.0))
            ).alias("global_clustering"),
        )
    )


def embedding_local_clustering(
    emb: DataFrame, threshold: float, id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector local clustering coefficient over the banded
    embedding near-dup graph — the node-level refinement of
    :func:`embedding_triangles`' global transitivity: for each vector,
    ``local_cc = 2·t(v) / (d(v)·(d(v)−1))`` where t(v) counts
    triangles through v and d(v) its degree. Dedup pipelines read it
    per-CLUSTER-MEMBER: a near-1 coefficient marks clique cores (safe
    transitive collapse), a near-0 one marks chain bridges whose
    collapse over-merges (the canonical-selection hazard the global
    ratio can only report in aggregate).

    Exactness: degrees and triangle counts are integers; the final
    ratio is ONE double division of exact int64s (correctly rounded,
    so identical cross-engine) under round6 — zero sum-association
    exposure. Every pair arrives a < b and the pair set is distinct,
    so the a<b<c semi-join enumerates each triangle exactly once; the
    three members then come from one explode (both-direction-explode
    precedent, knn_graph). Degree-0/1 vectors get local_cc = 0.0 and
    stay in the output via the LEFT join against the corpus (the
    0-degree-mass contract of embedding_degree_histogram).

    Scale: the pair table feeds five consumers (degree, three join
    legs, edge enum) — localCheckpoint'ed once (at 100 TB it's a
    stored table); joins are equi-joins on vector ids, never
    all-pairs. Reference parity: extends the reference's validation-
    stats layer (src/cpu/hex_smooth_naive.cpp:118-133 neighbor-stats)
    to the embedding graph domain."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    pairs = (
        embedding_neardup_pairs_banded(emb, threshold=threshold)
        .select("vec_a", "vec_b")
        .localCheckpoint()
    )
    deg = (
        pairs.select(F.col("vec_a").alias("v"))
        .unionAll(pairs.select(F.col("vec_b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("_d"))
    )
    e1 = pairs.select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b"))
    e2 = pairs.select(F.col("vec_a").alias("b"), F.col("vec_b").alias("c"))
    e3 = pairs.select(F.col("vec_a").alias("a"), F.col("vec_b").alias("c"))
    tri_members = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"], "left_semi")
        .select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("v")
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("_t"))
    )
    return (
        emb.select(F.col(id_col).alias("vec_id"))
        .join(deg, F.col("vec_id") == deg["v"], "left")
        .drop("v")
        .join(tri_members, F.col("vec_id") == tri_members["v"], "left")
        .drop("v")
        .select(
            "vec_id",
            F.coalesce(F.col("_d"), F.lit(0)).cast("long").alias("degree"),
            F.coalesce(F.col("_t"), F.lit(0))
            .cast("long")
            .alias("n_triangles"),
            round6(
                F.when(
                    F.coalesce(F.col("_d"), F.lit(0)) >= 2,
                    2.0
                    * F.coalesce(F.col("_t"), F.lit(0))
                    / (F.col("_d") * (F.col("_d") - 1)),
                ).otherwise(F.lit(0.0))
            ).alias("local_cc"),
        )
    )


#: bounded peeling horizon for :func:`embedding_kcore` — peeling is
#: exact once a full round removes nothing; the operator RAISES if the
#: graph hasn't stabilized within the horizon (the dedup_components
#: non-convergence precedent), so a green gate certifies the output IS
#: the true k-core. Long induced chains peel ~2 cells/round; the banded
#: fixture stabilizes in <= 3 rounds at both SFs.
KCORE_ROUNDS = 8
KCORE_K = 2


def kcore_pairs(
    pairs: DataFrame, k: int = KCORE_K, rounds: int = KCORE_ROUNDS
) -> DataFrame:
    """Generic k-core peeling over an undirected a<b pair table (the
    star_components generic-core precedent): repeatedly drop vertices
    of degree < k and their incident edges until stable. Returns the
    surviving vertices as ``(vec_id, core_degree)`` — core_degree is
    the degree WITHIN the core (≥ k by definition).

    Exactness: degrees are integer counts and edges are dropped by
    integer set membership — zero float exposure, so the bounded
    unrolled twin matches round-for-round. Raises if a peel after
    ``rounds`` rounds would still remove vertices.

    Plan (100 TB): the edge table shrinks monotonically; each round is
    one both-direction hash aggregate + two semi-joins on vertex ids,
    with a per-round localCheckpoint (the _cost_relax double-reference
    lesson: each round's table feeds the degree union twice AND both
    semi-join legs)."""
    e = pairs.select("vec_a", "vec_b").localCheckpoint()

    def degrees(edges: DataFrame) -> DataFrame:
        return (
            edges.select(F.col("vec_a").alias("v"))
            .unionAll(edges.select(F.col("vec_b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("_d"))
        )

    for _ in range(int(rounds)):
        keep = degrees(e).where(F.col("_d") >= k).select("v")
        e = (
            e.join(keep.select(F.col("v").alias("vec_a")), "vec_a", "left_semi")
            .join(keep.select(F.col("v").alias("vec_b")), "vec_b", "left_semi")
            .localCheckpoint()
        )
    final = degrees(e).localCheckpoint()
    if final.where(F.col("_d") < k).limit(1).count() > 0:
        raise ValueError(
            f"k-core peeling did not stabilize within {rounds} rounds"
        )
    return final.select(
        F.col("v").alias("vec_id"), F.col("_d").alias("core_degree")
    )


def embedding_kcore(
    emb: DataFrame,
    threshold: float,
    k: int = KCORE_K,
    rounds: int = KCORE_ROUNDS,
    id_col: str = "vec_id",
) -> DataFrame:
    """k-core of the banded embedding near-dup graph — the robustness
    filter between :func:`embedding_local_clustering`'s per-node view
    and :func:`embedding_components`' reachability view: a vector in
    the 2-core sits on a CYCLE of near-dup relations (mutually
    corroborated duplication), while tree-like periphery — the single
    spurious banded collision that chains two unrelated clusters —
    peels away. Dedup pipelines collapse the core aggressively and
    re-verify the periphery."""
    return kcore_pairs(
        embedding_neardup_pairs_banded(emb, threshold=threshold),
        k=k,
        rounds=rounds,
    )


def component_canonicals(
    df: DataFrame,
    max_hamming: int = 1,
    bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-based canonical selection per near-dup component: the
    step after :func:`neardup_components` in a real dedup pipeline —
    keep the HIGHEST-QUALITY member of each duplicate cluster (min-id
    canonicalization throws away the best copy whenever it isn't the
    oldest). Ties break to the smallest id; quality_score is already
    rounded to 6 dp, so the argmax is cross-engine deterministic.
    Output: (component, n_members, canonical_id, best_quality) — one
    hash aggregate on the component id over the labeled corpus.
    """
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.functions.text import quality_features

    comps = neardup_components(
        df, max_hamming=max_hamming, bits=bits, text_col=text_col, id_col=id_col
    )
    q = quality_features(df, text_col=text_col, id_col=id_col).select(
        id_col, "quality_score"
    )
    j = comps.join(q, id_col)
    pick = F.max_by(
        id_col, F.struct(F.col("quality_score"), (-F.col(id_col)).alias("_nd"))
    )
    return j.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        pick.alias("canonical_id"),
        round6(F.max("quality_score")).alias("best_quality"),
    )


def neardup_components_propagation(
    df: DataFrame,
    max_hamming: int = 1,
    bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """Differential twin of :func:`neardup_components`: plain iterative
    min-label propagation (a node's label becomes the min of its own
    and its neighbors' labels, O(component diameter) rounds with a
    driver-side convergence count per round). Kept because two
    genuinely different algorithm families agreeing on the same labels
    is the cross-validation the reference's case-study script models
    (/root/reference/scripts/case-study.sh:107-137). Raises if the
    round budget is exhausted before the fixpoint (never returns
    unconverged labels silently).
    """
    pairs = simhash_pairs_banded(
        df, max_hamming=max_hamming, bits=bits, text_col=text_col, id_col=id_col
    )
    # both edge directions from ONE pass over the (expensive) banded
    # pair plan — a union of two selects would execute it twice even
    # though the result is checkpointed right after (pruned branches
    # defeat ReuseExchange; the span_coverage lesson)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")),
                F.struct(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")),
            )
        ).alias("_e")
    ).select("_e.a", "_e.b")
    sym = sym.localCheckpoint()  # pairs plan is reused every round
    labels = df.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, F.col("b") == F.col("node"))
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        new = (
            labels.join(nbr, F.col("node") == F.col("a"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_iter} rounds"
        )
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("component"))


def duplicate_spans(
    docs: DataFrame,
    gram_len: int = 4,
    min_span: int | None = None,
    max_gram_positions: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level (substring) duplicate detection: the maximal common
    token runs between every document pair — the Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better")
    semantics, re-expressed as joins instead of a suffix array.

    Output: ``(doc_a, doc_b, start_a, start_b, span_tokens)`` with
    ``doc_a < doc_b``, 1-based token starts, one row per MAXIMAL run of
    >= ``gram_len`` shared consecutive tokens (>= ``min_span`` if set).
    Doc-level dedup (exact/minhash/simhash families above) misses
    partially-copied text — a quote, a boilerplate header, a paragraph
    lifted between crawls; this operator finds the copied span itself.

    Plan: positions → ``gram_len``-gram seeds (pure Catalyst
    transform/posexplode, one corpus scan) → self equi-join on the gram
    → maximal-run merge per (pair, diagonal): two seeds lie on one run
    iff ``pos_a - pos_b`` matches and ``pos_a`` is consecutive, so
    ``pos_a - row_number() OVER (pair, diagonal ORDER BY pos_a)`` is
    constant per run (islands-and-gaps) and one aggregation emits the
    maximal spans. Every shuffle key is a gram or a (pair, diagonal) —
    no global sort; window partitions are bounded by a single pair's
    seed count.

    Scale: the suffix-array method is inherently sequential; the join
    form is embarrassingly parallel but quadratic in per-gram position
    count — a boilerplate gram appearing P times globally seeds P²
    pairs. ``max_gram_positions`` caps that: grams above the cap are
    dropped from SEEDING. Capped semantics, precisely: a run consisting
    ONLY of ultra-common grams disappears entirely (boilerplate by
    definition — the mass a real corpus run wants excluded), and a long
    run whose INTERIOR grams are hot FRAGMENTS at the dropped seed
    positions into shorter overlapping spans (the flanks still surface,
    but a ``min_span`` filter can then drop fragments of a genuinely
    long duplication — apply ``min_span`` with that caveat, or repair
    adjacent same-diagonal spans downstream). The cap changes
    semantics, so the driver gate runs uncapped; both capped behaviors
    (whole-run drop and interior fragmentation) are pytest-pinned.
    """
    k = gram_len
    pos = gram_positions(docs, k, id_col=id_col)
    if max_gram_positions is not None:
        hot = (
            pos.groupBy("_g")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_gram_positions)
            .select("_g")
        )
        pos = pos.join(hot, "_g", "left_anti")

    # pinned parallelism, twice (the CLAUDE.md AQE blind spot): gram
    # keys and seed rows are tiny by bytes but the pair output is
    # superlinear — AQE coalesces both the seed join and the
    # per-diagonal window shuffle to ONE partition (measured at sf0.1:
    # the whole merge ran on one core). User-specified repartitions on
    # the join/window keys are never coalesced; the window repartition
    # also satisfies the window's required distribution AND the
    # downstream groupBy's (subset clustering), so no extra exchange.
    parts = docs.sparkSession.sparkContext.defaultParallelism
    a = pos.select(
        F.col(id_col).alias("doc_a"),
        F.col("_pos").alias("pos_a"),
        F.col("_g"),
    ).repartition(parts, "_g")
    b = pos.select(
        F.col(id_col).alias("doc_b"),
        F.col("_pos").alias("pos_b"),
        F.col("_g"),
    ).repartition(parts, "_g")
    seeds = a.join(b, "_g").where(F.col("doc_a") < F.col("doc_b"))
    spans = merge_gram_runs(seeds, k, parts)
    if min_span is not None:
        spans = spans.where(F.col("span_tokens") >= min_span)
    return spans


def gram_positions(
    docs: DataFrame,
    gram_len: int,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """``(id, _pos, _g)``: each doc's ``gram_len``-gram at each 1-based
    token position — the seed table of the span-dedup family. With
    ``tokens_col`` the grams derive from a STORED ordered-token array
    column instead of tokenizing ``text`` (the incremental curator's
    aux-log path: kept text is never re-scanned per batch)."""
    k = gram_len
    toks = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.split(F.lower(F.col("text")), " ")
    )
    grams = F.expr(
        f"transform(sequence(1, greatest(size(_toks) - {k - 1}, 1)), "
        f"i -> array_join(slice(_toks, i, {k}), ' '))"
    )
    return (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .where(F.size("_toks") >= k)
        .select(id_col, F.posexplode(grams).alias("_p", "_g"))
        .select(
            id_col,
            (F.col("_p") + 1).cast("long").alias("_pos"),
            F.col("_g").alias("_g"),
        )
    )


def merge_gram_runs(seeds: DataFrame, k: int, parts: int) -> DataFrame:
    """Maximal-run merge of gram seeds ``(doc_a, doc_b, pos_a, pos_b)``
    per (pair, diagonal) — the islands-and-gaps kernel
    :func:`duplicate_spans` and :func:`bipartite_spans` share. The
    window repartition is PINNED (user-specified repartitions are
    never AQE-coalesced — the CLAUDE.md blind spot) and satisfies both
    the window's and the downstream groupBy's required distribution."""
    from pyspark.sql import Window

    diag = (F.col("pos_a") - F.col("pos_b")).alias("_diag")
    w = Window.partitionBy("doc_a", "doc_b", "_diag").orderBy("pos_a")
    runs = (
        seeds.select("doc_a", "doc_b", "pos_a", "pos_b", diag)
        .repartition(parts, "doc_a", "doc_b", "_diag")
        .withColumn("_grp", F.col("pos_a") - F.row_number().over(w))
    )
    return (
        runs.groupBy("doc_a", "doc_b", "_diag", "_grp")
        .agg(
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
            (F.count(F.lit(1)) + (k - 1)).alias("span_tokens"),
        )
        .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
    )


def bipartite_spans(
    pos_a: DataFrame, pos_b: DataFrame, gram_len: int
) -> DataFrame:
    """Maximal shared token runs BETWEEN two position tables (each
    ``(id, _pos, _g)`` from :func:`gram_positions`) — the cross-batch
    form of :func:`duplicate_spans` for the incremental strict curator:
    side a is the incoming batch, side b the stored kept state, and no
    ``doc_a < doc_b`` ordering applies (the id sets are disjoint by
    the caller's contract). Same pinned-parallelism discipline as the
    self-join form."""
    parts = pos_a.sparkSession.sparkContext.defaultParallelism
    a = pos_a.select(
        F.col(pos_a.columns[0]).alias("doc_a"),
        F.col("_pos").alias("pos_a"),
        "_g",
    ).repartition(parts, "_g")
    b = pos_b.select(
        F.col(pos_b.columns[0]).alias("doc_b"),
        F.col("_pos").alias("pos_b"),
        "_g",
    ).repartition(parts, "_g")
    return merge_gram_runs(a.join(b, "_g"), gram_len, parts)


def span_coverage(
    docs: DataFrame,
    gram_len: int = 4,
    id_col: str = "doc_id",
    spans: DataFrame | None = None,
) -> DataFrame:
    """Per-document duplicated-span coverage: the fraction of each
    doc's tokens lying inside SOME maximal cross-doc shared run (from
    :func:`duplicate_spans`) — the quantity substring-dedup pipelines
    threshold on to drop or trim documents.

    Output: ``(doc_id, n_tokens, covered_tokens, coverage)`` for every
    doc (0 / 0.0 when nothing is shared).

    Plan: spans → per-doc [start, end] intervals (both sides of each
    pair) → classic interval-union sweep per doc with two bounded
    windows (new-island flag via running MAX(end) over preceding rows,
    island id via running SUM of the flag) → per-island extents →
    per-doc covered mass → LEFT JOIN back to the corpus. Window
    partitions are per-doc (bounded by a doc's span count).

    Determinism note: intervals are DISTINCT'd before the sweep — not
    for the union semantics (which are insensitive to duplicates) but
    to make the window ORDER BY (s, e) a TOTAL order. With exact
    duplicate rows the order has ties, and an engine that sorts the
    flag window and the running-sum window in different passes (DuckDB
    does; Spark fuses both into one WindowExec) can permute tied rows
    BETWEEN the passes, attaching a duplicate to the wrong island and
    silently over-merging (observed: a ~10%-of-runs parity flake
    before the distinct).
    """
    from pyspark.sql import Window

    if spans is None:
        spans = duplicate_spans(docs, gram_len=gram_len, id_col=id_col)
    # both interval sides from ONE pass over spans: a unionAll of two
    # differently-pruned selects re-executes the whole span subplan
    # per branch (pruning defeats ReuseExchange — the bm25_search
    # lesson); exploding an inline 2-struct array reads it once
    iv = (
        spans.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias(id_col),
                        F.col("start_a").alias("_s"),
                        (F.col("start_a") + F.col("span_tokens") - 1).alias("_e"),
                    ),
                    F.struct(
                        F.col("doc_b").alias(id_col),
                        F.col("start_b").alias("_s"),
                        (F.col("start_b") + F.col("span_tokens") - 1).alias("_e"),
                    ),
                )
            ).alias("_iv")
        )
        .select(f"_iv.{id_col}", "_iv._s", "_iv._e")
    )
    n_tokens = F.size(F.split(F.lower(F.col("text")), " ")).cast("long")
    return interval_coverage(
        iv, docs.select(F.col(id_col), n_tokens.alias("n_tokens")), id_col
    )


def interval_coverage(
    iv: DataFrame, doc_tokens: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc interval-union mass: ``iv`` is ``(id, _s, _e)`` interval
    rows (duplicates fine — DISTINCT'd here, which also makes the
    window ORDER BY a total order, see :func:`span_coverage`'s
    determinism note), ``doc_tokens`` is ``(id, n_tokens)`` for every
    doc that should appear in the output (coverage 0.0 when no
    intervals). The sweep kernel shared by :func:`span_coverage` and
    the incremental strict curator (whose interval set unions
    cross-batch and intra-batch spans before ONE sweep)."""
    from pyspark.sql import Window

    iv = iv.distinct()
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = iv.withColumn(
        "_new",
        (F.col("_s") > F.coalesce(F.max("_e").over(w_prev), F.lit(-1)))
        .cast("long"),
    ).withColumn("_island", F.sum("_new").over(w_run))
    covered = (
        marked.groupBy(id_col, "_island")
        .agg(F.min("_s").alias("_mn"), F.max("_e").alias("_mx"))
        .groupBy(id_col)
        .agg(F.sum(F.col("_mx") - F.col("_mn") + 1).alias("_covered"))
    )
    from cuda_gis_smoothing_spark.functions.numeric import round6

    return (
        doc_tokens.join(covered, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("_covered"), F.lit(0)).cast("long").alias(
                "covered_tokens"
            ),
            round6(
                F.coalesce(F.col("_covered"), F.lit(0)) / F.col("n_tokens")
            ).alias("coverage"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    gram_len: int = 4,
    window: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every ``gram_len``-gram, slide a ``window``
    of consecutive gram hashes, keep each window's minimum — the
    guarantee is that any shared run of ``window + gram_len - 1``
    tokens between two docs shares at least one selected fingerprint,
    at ~2/(window+1) of the full gram density. The sub-quadratic
    complement of :func:`duplicate_spans`' exact gram seeds: candidate
    pairs can join on the winnowed set instead of every gram.

    Contract: the output is the DISTINCT (doc, fingerprint-VALUE) set
    (position-free — value sets are order-insensitive, so rightmost-
    vs-leftmost tie selection inside a window cannot matter); prefix
    windows shorter than ``window`` are included, so every doc with
    ≥ gram_len tokens emits ≥ 1 fingerprint (short docs are not
    silently unfingerprinted). Grams and the polynomial hash are the
    shared :func:`gram_positions` / :func:`token_hash_col` kernels —
    already cross-engine-pinned by the span and minhash gates.

    Plan (100 TB): explode grams → ONE doc-keyed window (hash exchange
    on doc id + per-doc sort by position; parallel across docs — a doc
    is never split, bounded by max doc length) → distinct, keyed by
    (doc, fingerprint) so the dedup shuffle is fingerprint-parallel.
    No joins, no driver state.
    """
    from pyspark.sql import Window as W

    pos = gram_positions(docs, gram_len, id_col)
    h = pos.select(id_col, "_pos", token_hash_col("_g").alias("_gh"))
    w = W.partitionBy(id_col).orderBy("_pos").rowsBetween(-(window - 1), 0)
    return (
        h.select(F.col(id_col), F.min("_gh").over(w).alias("fingerprint"))
        .distinct()
        .select(id_col, F.col("fingerprint").cast("long").alias("fingerprint"))
    )


def gram_pos_ctes(source: str, g: int) -> str:
    """DuckDB CTE pair ``toks → pos`` emitting each doc's 1-based
    ``g``-gram positions ``(doc_id, pos, g)`` — the SQL twin of
    :func:`gram_positions`, shared by the span family
    (``__spark_entry__._span_ctes``) and the winnowing family so the
    gram semantics (empty-guard, 1-based positions, space join) can
    never silently diverge between them."""
    return f"""toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM {source}),
pos AS (
  SELECT doc_id, i AS pos, array_to_string(ts[i:i+{g - 1}], ' ') AS g
  FROM toks, UNNEST(CASE WHEN len(ts) >= {g}
                    THEN generate_series(1, len(ts) - {g - 1}) ELSE [] END) AS u(i)
)"""


def winnow_ctes(gram_len: int, window: int, source: str = "documents") -> str:
    """CTE chain ``toks → pos → h → wfp`` producing the winnowed
    (doc_id, fingerprint) set — ONE builder shared by the
    winnowing_fingerprints and dedup_winnowed twins (the _span_ctes
    precedent: a fix to the selection can never diverge between
    gates). Grams from the shared :func:`gram_pos_ctes`, same
    polynomial hash, same window frame as
    :func:`winnow_fingerprints`."""
    return f"""{gram_pos_ctes(source, gram_len)},
h AS (SELECT doc_id, pos, {token_hash_sql_duckdb("g")} AS gh FROM pos),
wfp AS (
  SELECT DISTINCT doc_id,
         CAST(MIN(gh) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS fingerprint
  FROM h
)"""


def winnow_sql(gram_len: int, window: int, source: str = "documents") -> str:
    """DuckDB twin of :func:`winnow_fingerprints`."""
    return f"""
WITH {winnow_ctes(gram_len, window, source)}
SELECT doc_id, fingerprint FROM wfp
""".strip()


def winnowed_neardup_pairs(
    docs: DataFrame,
    threshold: float,
    gram_len: int = 4,
    window: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs from WINNOWED candidates: docs sharing any
    winnowing fingerprint (:func:`winnow_fingerprints`) are verified
    with the shared exact-jaccard kernel
    (:func:`verified_jaccard_pairs`). The third candidate source
    beside MinHash-LSH bands and SimHash bands — unlike either, its
    recall on SPAN-level duplication is a guarantee, not a
    probability: any shared run of window+gram−1 tokens yields a
    shared fingerprint, so boilerplate/quotation overlap is never
    missed, at ~2/(window+1) of the full gram-join's candidate mass
    (the duplicate_spans seed join without the density).

    Output: (doc_a, doc_b, jaccard) at jaccard ≥ threshold.

    Plan (100 TB): the fingerprint table is checkpointed once (both
    join sides read it), the self-join is pinned to full parallelism
    on the fingerprint key (the AQE-coalesce class — candidate keys
    are cheap to ship, pair output is superlinear), pairs dedup on
    first-shared-fingerprint (ONE verify per pair, the LSH-drop
    precedent), and the verify is one array_intersect per candidate.
    Hot-fingerprint caveat: a fingerprint shared by m docs emits m²/2
    candidates — same exposure class as an LSH band bucket; the
    blocked-triangle equi-join form (lsh_blocked_neardup_drops) is the
    lever if a corpus develops megaclusters.
    """
    cand = winnow_candidate_pairs(docs, gram_len, window, id_col)
    return verified_jaccard_pairs(cand, docs, docs, threshold, id_col)


def winnow_candidate_pairs(
    docs: DataFrame,
    gram_len: int = 4,
    window: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """The winnowing CANDIDATE stage (docs sharing ≥1 winnowed
    fingerprint, distinct ``(doc_a, doc_b)``) — extracted from
    :func:`winnowed_neardup_pairs` so the candidate-family accuracy
    card audits the SAME pair set the verify kernel consumes (the
    shared-kernel drift-prevention class). Pinned parallelism on the
    fingerprint key (the AQE-coalesce class)."""
    fps = winnow_fingerprints(docs, gram_len, window, id_col).localCheckpoint()
    parts = docs.sparkSession.sparkContext.defaultParallelism
    a = fps.select(F.col(id_col).alias("doc_a"), "fingerprint").repartition(
        parts, "fingerprint"
    )
    b = fps.select(F.col(id_col).alias("doc_b"), "fingerprint").repartition(
        parts, "fingerprint"
    )
    return (
        a.join(b, "fingerprint")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def winnowed_neardup_sql(
    threshold: float, gram_len: int, window: int, source: str = "documents"
) -> str:
    """DuckDB twin of :func:`winnowed_neardup_pairs`: the SAME winnow
    CTE chain for candidates, exact distinct-token jaccard verify."""
    return f"""
WITH {winnow_ctes(gram_len, window, source)},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM wfp a JOIN wfp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
),
tok AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM {source}
  ) WHERE t <> ''
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN tok a ON a.doc_id = c.doc_a
  JOIN tok b ON b.doc_id = c.doc_b AND b.t = a.t
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(i * 1.0 / (sa.n + sb.n - i) + 1e-09, 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE ROUND(i * 1.0 / (sa.n + sb.n - i) + 1e-09, 6) >= {threshold}
""".strip()


def candidate_family_report(
    docs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 6,
    bands: int = 3,
    max_hamming: int = 3,
    bits: int = 16,
    gram_len: int = 4,
    window: int = 4,
) -> DataFrame:
    """Candidate-generation accuracy card across the three text
    near-dup families — MinHash-LSH bands, SimHash bands, winnowed
    fingerprints — each measured against the EXACT token-set Jaccard
    pair set at ``threshold`` (unblocked: prefix-filtered AllPairs, so
    the truth itself is sub-quadratic). The capacity-planning question
    every dedup pipeline asks BEFORE committing to a family: how many
    candidate pairs does each generator emit (verify cost) and what
    fraction of the true pairs does it reach (recall)? The
    minhash_error_report sibling one level up: that card grades the
    ESTIMATOR, this one grades the CANDIDATE SETS.

    One row per family: ``(family, n_candidates, n_exact_pairs,
    n_true, pair_precision, pair_recall)`` — integer pair counts,
    two guarded exact-ratio divisions under round6. SimHash pairs are
    its verified hamming ≤ d output (that family's own gate
    semantics); winnowing contributes its pre-verify candidate set
    (the shared :func:`winnow_candidate_pairs` stage).

    Plan (100 TB): each family's pair set is the family's own gated
    sub-quadratic kernel. The four kernels are INDEPENDENT jobs, so
    their materializations overlap from a small driver thread pool
    (guide §2.6 — each kernel's shuffle tail back-fills cores the
    others free), and family membership is resolved in ONE pass: the
    four distinct pair sets union with a family tag into a single
    groupBy(pair) flag table + 1-row count aggregate, replacing three
    separate exact⋈family shuffle joins (guide §2.4 — one exchange
    over Σ|sets| instead of three over |exact| each; r6 measured
    30.1 → 22.7 s for the card, 37.4 s before the INT-coded exact
    verify — isolated min-of-3, same epoch). Every family emits
    DISTINCT pairs
    (groupBy / .distinct() in each kernel), so flag-sum counts equal
    the old per-set counts exactly."""
    from concurrent.futures import ThreadPoolExecutor

    from cuda_gis_smoothing_spark.functions.numeric import round6

    builders = {
        "e": lambda: ngram_jaccard_pairs(docs, threshold=threshold, block_col=None)
        .select("doc_a", "doc_b")
        .localCheckpoint(),
        "m": lambda: minhash_lsh_pairs(docs, n_hashes=n_hashes, bands=bands)
        .select("doc_a", "doc_b")
        .localCheckpoint(),
        "s": lambda: simhash_pairs_banded(docs, max_hamming=max_hamming, bits=bits)
        .select("doc_a", "doc_b")
        .localCheckpoint(),
        "w": lambda: winnow_candidate_pairs(docs, gram_len, window).localCheckpoint(),
    }
    with ThreadPoolExecutor(max_workers=len(builders)) as pool:
        futs = {tag: pool.submit(fn) for tag, fn in builders.items()}
        sets = {tag: f.result() for tag, f in futs.items()}
    tagged = None
    for tag, df_ in sets.items():
        part = df_.select("doc_a", "doc_b", F.lit(tag).alias("_f"))
        tagged = part if tagged is None else tagged.unionByName(part)
    flags = tagged.groupBy("doc_a", "doc_b").agg(
        *[
            F.max((F.col("_f") == tag).cast("int")).alias(f"_{tag}")
            for tag in sets
        ]
    )
    tot = flags.agg(
        F.coalesce(F.sum("_e"), F.lit(0)).cast("long").alias("n_exact_pairs"),
        *[
            c
            for tag in ("m", "s", "w")
            for c in (
                F.coalesce(F.sum(f"_{tag}"), F.lit(0))
                .cast("long")
                .alias(f"nc_{tag}"),
                F.coalesce(F.sum(F.col(f"_{tag}") * F.col("_e")), F.lit(0))
                .cast("long")
                .alias(f"nt_{tag}"),
            )
        ],
    ).localCheckpoint()  # 1 row, three row-builder consumers
    rows = [
        tot.select(
            F.lit(name).alias("family"),
            F.col(f"nc_{tag}").alias("n_candidates"),
            F.col("n_exact_pairs"),
            F.col(f"nt_{tag}").alias("n_true"),
        )
        for tag, name in (
            ("m", "minhash_lsh"),
            ("s", "simhash_banded"),
            ("w", "winnowing"),
        )
    ]
    rep = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return rep.select(
        "family",
        "n_candidates",
        "n_exact_pairs",
        "n_true",
        round6(
            F.col("n_true").cast("double")
            / F.nullif(F.col("n_candidates").cast("double"), F.lit(0.0))
        ).alias("pair_precision"),
        round6(
            F.col("n_true").cast("double")
            / F.nullif(F.col("n_exact_pairs").cast("double"), F.lit(0.0))
        ).alias("pair_recall"),
    )


#: printable-ASCII text gate for byte-vs-char sensitive kernels —
#: DuckDB's levenshtein counts BYTES while Spark's counts CHARS
#: (probed: levenshtein('héllo','hello') = 2 vs 1), so edit-distance
#: operators restrict to the range where byte == char, identically on
#: both sides. Anchors are \A..\z, NOT ^..$: Java's '$' (Spark rlike)
#: matches BEFORE a trailing newline while RE2's (DuckDB) is strict
#: end-of-text (probed: 'hello\n' passed ^..$ only in Spark), so
#: ^-anchored cross-engine gates diverge on newline-terminated text.
ASCII_TEXT_RE = r"\A[ -~]*\z"

EDIT_MAX_DIST = 50


def edit_distance_pairs(
    docs: DataFrame,
    max_dist: int = EDIT_MAX_DIST,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 6,
    bands: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by EXACT edit distance ≤ ``max_dist`` over
    MinHash candidates — the character-level verify kernel beside the
    token-set (jaccard), bit (hamming), and span (winnow) families;
    what title/bitext dedup runs where token-level jaccard is too
    coarse (a 3-char edit in every token zeroes jaccard but is a tiny
    edit distance).

    Candidates must share ALL ``bands`` LSH bands (precision-first: an
    edit budget of ~10% of the text implies near-identical token sets,
    the regime where every band agrees) — recall is probabilistic like
    every banded kernel and is NOT exact for pairs whose edits
    concentrate in few long tokens; the pytest measures it against a
    brute-force oracle. Two exact prefilters run before the O(d·n)
    verify: printable-ASCII texts only (byte == char, see
    ``ASCII_TEXT_RE`` — non-ASCII docs are out of contract IDENTICALLY
    in both engines), and ``|len(a) − len(b)| ≤ max_dist`` (a length
    gap is a lower bound on edit distance). The Spark verify uses the
    threshold-banded ``levenshtein(a, b, max_dist)`` (O(d·n), returns
    −1 above the threshold); the DuckDB twin computes the full matrix —
    identical within the kept set.

    Plan (100 TB): the banded self-join is :func:`minhash_lsh_pairs`
    (pinned parallelism, first-class band shuffle keys); texts join the
    candidate list by id — at real scale the verify stage ships full
    text to each candidate pair (bounded by the all-band precision
    gate; a dictionary/fetch service replaces the join when texts are
    huge). Output: (doc_a, doc_b, edit_distance).
    """
    ad = docs.where(F.col(text_col).rlike(ASCII_TEXT_RE)).select(
        F.col(id_col), F.col(text_col), F.length(text_col).alias("_L")
    )
    cand = (
        minhash_lsh_pairs(ad, text_col, id_col, n_hashes, bands)
        .where(F.col("n_shared_bands") == bands)
        .select("doc_a", "doc_b")
    )
    withtexts = (
        cand.join(
            ad.select(
                F.col(id_col).alias("doc_a"),
                F.col(text_col).alias("_ta"),
                F.col("_L").alias("_la"),
            ),
            "doc_a",
        )
        .join(
            ad.select(
                F.col(id_col).alias("doc_b"),
                F.col(text_col).alias("_tb"),
                F.col("_L").alias("_lb"),
            ),
            "doc_b",
        )
        .where(F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
    )
    return (
        withtexts.withColumn(
            "edit_distance",
            F.levenshtein(F.col("_ta"), F.col("_tb"), max_dist).cast("long"),
        )
        .where(F.col("edit_distance") >= 0)
        .select("doc_a", "doc_b", "edit_distance")
    )


def band_union_sql(
    sig_cte: str = "sig", n_hashes: int = 6, bands: int = 3
) -> str:
    """UNION ALL of ``(doc_id, band, bh)`` rows over a minhash
    signature CTE — the DuckDB twin of :func:`banded_signature_rows`'
    fold (``(prev*8191 + mh) % P``). ONE definition shared by every
    banded twin (minhash_lsh, curate_corpus, edit distance) so the
    banding arithmetic cannot drift between gates (the shared-CTE
    drift-prevention class)."""
    rpb = n_hashes // bands
    outs = []
    for b in range(bands):
        expr = f"mh_{b * rpb}"
        for j in range(1, rpb):
            expr = f"({expr} * 8191 + mh_{b * rpb + j}) % {MH_PRIME}"
        outs.append(f"SELECT doc_id, {b} AS band, {expr} AS bh FROM {sig_cte}")
    return "\n  UNION ALL ".join(outs)


def edit_distance_sql(
    max_dist: int = EDIT_MAX_DIST, source: str = "documents"
) -> str:
    """DuckDB twin of :func:`edit_distance_pairs` (n_hashes=6, bands=3,
    the gate constants — bands via the shared :func:`band_union_sql`).
    The distance is computed ONCE in a scored CTE (referencing the
    full-matrix levenshtein in both SELECT and WHERE would run the
    O(n·m) DP twice per candidate — DuckDB does not CSE across
    clauses)."""
    th = token_hash_sql_duckdb("t")
    mh = ",\n       ".join(
        f"MIN((h * {MH_A[i]} + {MH_B[i]}) % {MH_PRIME}) AS mh_{i}"
        for i in range(6)
    )
    bu = band_union_sql("sig")
    return f"""
WITH ad AS (
  SELECT doc_id, text, length(text) AS L
  FROM {source} WHERE regexp_matches(text, '{ASCII_TEXT_RE}')
),
tok AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS t
    FROM ad
  ) WHERE t <> ''
),
h AS (SELECT doc_id, {th} AS h FROM tok),
sig AS (SELECT doc_id, {mh} FROM h GROUP BY doc_id),
banded AS (
  {bu}
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) = 3
),
wt AS (
  SELECT doc_a, doc_b, ta.text AS t_a, tb.text AS t_b
  FROM cand
  JOIN ad ta ON ta.doc_id = cand.doc_a
  JOIN ad tb ON tb.doc_id = cand.doc_b
  WHERE abs(ta.L - tb.L) <= {int(max_dist)}
),
scored AS (
  SELECT doc_a, doc_b, levenshtein(t_a, t_b) AS d FROM wt
)
SELECT doc_a, doc_b, CAST(d AS BIGINT) AS edit_distance
FROM scored WHERE d <= {int(max_dist)}
""".strip()


# -- C4-style line-level dedup (the fifth dedup family: aligned token
# -- chunks stand in for "lines" — the fixture corpus has no newlines,
# -- and the operator core is separator-agnostic anyway) ---------------

#: tokens per chunk-line (8 ≈ a short sentence)
LINE_WIDTH = 8
#: a chunk appearing in this many DISTINCT docs is boilerplate
LINE_MIN_DUP_DOCS = 2
BOILERPLATE_TOPK = 50
#: first-occurrence key = doc_id·2^30 + pos — exact while
#: doc_id < 2^32 and pos < 2^30 (≈8.5 G tokens/doc at width 8);
#: beyond that widen to a decimal key
_LINE_POS_SHIFT = 1 << 30


def chunk_lines(
    df: DataFrame,
    width: int = LINE_WIDTH,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exploded (doc_id, pos, chunk) table of NON-OVERLAPPING
    ``width``-token chunks — the corpus "lines" for C4-style line
    dedup (Raffel et al. 2020 drop repeated lines; newline-split lines
    degenerate on this corpus, so the gate chunks the token stream;
    the core below is separator-agnostic, and the newline form is
    covered by the pytest differential over newline texts).

    The final partial chunk IS emitted (C4 dedups short lines too);
    NULL-text docs contribute no chunks (callers reattach them — the
    NULL-text contract). Tokens project to ``_toks`` FIRST (the
    CollapseProject rule: the transform lambda references them
    ``n_chunks`` times)."""
    width = int(width)
    toks = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.split(F.lower(F.col(text_col)), " ").alias("_toks"),
    )
    # size >= 1 for any non-NULL text, so the sequence always ascends
    # (the contamination_report sequence(1,0)-descends lesson)
    chunks = F.expr(
        f"transform(sequence(0, cast(ceil(size(_toks) / {width}.0) as int) - 1), "
        f"i -> array_join(slice(_toks, i * {width} + 1, {width}), ' '))"
    )
    return toks.select(id_col, F.posexplode(chunks).alias("pos", "chunk"))


def line_dedup(
    df: DataFrame,
    width: int = LINE_WIDTH,
    min_dup_docs: int = LINE_MIN_DUP_DOCS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style line dedup over chunk-lines: every occurrence of a
    chunk appearing in >= ``min_dup_docs`` DISTINCT docs is dropped
    EXCEPT the global first (min (doc_id, pos) — C4 keeps one copy).
    Doc-frequency (not occurrence-count) semantics: an intra-doc repeat
    with df=1 keeps both copies. Output per INPUT doc (NULL-text rows
    preserved with NULL new_text): (doc_id, n_chunks, n_kept,
    n_dropped, new_text) — new_text is the kept chunks rejoined in
    position order ('' when everything dropped, NULL text → NULL).

    Plan (100 TB): one explode (corpus_tokens/width rows), chunk stats
    hash-aggregate keyed on the md5 digest (map-side combined; the
    digest — not the chunk string — is the shuffle/join key, the
    exact_dedup precedent), one digest equi-join back (per-key
    multiplicity = occurrence count — no fan-out product), one per-doc
    aggregate. The exploded table has two differently-pruned consumers
    (stats + join-back), so the corpus scans twice (plus an id-pruned
    third scan reattaching NULL-text docs — plan-measured 3 FileScans);
    the derivation is one split+explode, cheaper than materializing
    the explosion."""
    width, min_dup_docs = int(width), int(min_dup_docs)
    ex = chunk_lines(df, width, text_col, id_col).select(
        id_col,
        "pos",
        "chunk",
        F.md5("chunk").alias("_d"),
        (F.col(id_col) * _LINE_POS_SHIFT + F.col("pos")).alias("_k"),
    )
    stats = ex.groupBy("_d").agg(
        F.count_distinct(F.col(id_col)).alias("_df"),
        F.min("_k").alias("_first"),
    )
    kept = ex.join(stats, "_d").withColumn(
        "_keep",
        (F.col("_df") < F.lit(min_dup_docs)) | (F.col("_k") == F.col("_first")),
    )
    per_doc = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n_chunks"),
        F.sum(F.col("_keep").cast("long")).cast("long").alias("_n_kept"),
        F.expr(
            "array_join(transform(array_sort("
            "collect_list(if(_keep, struct(pos, chunk), null))), "
            "x -> x.chunk), ' ')"
        ).alias("new_text"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("_n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("_n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.coalesce("_n_chunks", F.lit(0)) - F.coalesce("_n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
            "new_text",
        )
    )


def boilerplate_chunks(
    df: DataFrame,
    width: int = LINE_WIDTH,
    min_df: int = LINE_MIN_DUP_DOCS,
    k: int = BOILERPLATE_TOPK,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` boilerplate chunk-lines by doc frequency — the audit
    report a curation run reads BEFORE picking the line-dedup
    threshold. Total order (n_docs DESC, n_occurrences DESC, chunk) —
    chunk is the group key, so the cut is tie-proof. Output:
    (chunk, n_docs, n_occurrences).

    Plan (100 TB): one explode + one hash aggregate (map-side
    combined) + TakeOrderedAndProject."""
    width, min_df, k = int(width), int(min_df), int(k)
    ex = chunk_lines(df, width, text_col, id_col)
    return (
        ex.groupBy("chunk")
        .agg(
            F.count_distinct(F.col(id_col)).cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_df)
        .orderBy(F.col("n_docs").desc(), F.col("n_occurrences").desc(), "chunk")
        .limit(k)
    )


def chunk_ctes(width: int = LINE_WIDTH, source: str = "documents") -> str:
    """Shared DuckDB CTEs for the chunk-line family (ONE builder — the
    _span_ctes drift-prevention rule): base (tokenized docs) and ex
    (doc_id, pos, chunk, d=md5, k=first-occurrence key). DuckDB
    list_slice is (begin, end)-inclusive vs Spark slice's (start,
    length) — both clamp at the array end."""
    width = int(width)
    return f"""
base AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
         FROM {source} WHERE text IS NOT NULL),
ex AS (
  SELECT doc_id, u.pos AS pos, u.chunk AS chunk, md5(u.chunk) AS d,
         doc_id * {_LINE_POS_SHIFT} + u.pos AS k
  FROM (SELECT doc_id,
          unnest(list_transform(generate_series(0, CAST(ceil(len(toks) / {width}.0) AS INT) - 1),
                 i -> struct_pack(pos := i,
                                  chunk := array_to_string(list_slice(toks, i * {width} + 1, (i + 1) * {width}), ' ')))) AS u
        FROM base) t)
""".strip()


def line_dedup_sql(
    width: int = LINE_WIDTH,
    min_dup_docs: int = LINE_MIN_DUP_DOCS,
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`line_dedup`. string_agg over an empty
    FILTER set is NULL where Spark's array_join of an empty array is
    '' — COALESCE pins the all-dropped doc to '' on both sides."""
    min_dup_docs = int(min_dup_docs)
    return f"""
WITH {chunk_ctes(width, source)},
stats AS (SELECT d, COUNT(DISTINCT doc_id) AS df, MIN(k) AS first_k
          FROM ex GROUP BY 1),
kept AS (
  SELECT ex.doc_id, ex.pos, ex.chunk,
         (s.df < {min_dup_docs} OR ex.k = s.first_k) AS keep
  FROM ex JOIN stats s ON s.d = ex.d
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         COALESCE(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE keep), '')
           AS new_text
  FROM kept GROUP BY 1
)
SELECT s.doc_id,
       CAST(COALESCE(p.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(COALESCE(p.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(p.n_chunks, 0) - COALESCE(p.n_kept, 0) AS BIGINT)
         AS n_dropped,
       p.new_text AS new_text
FROM {source} s LEFT JOIN per_doc p ON p.doc_id = s.doc_id
""".strip()


def boilerplate_chunks_sql(
    width: int = LINE_WIDTH,
    min_df: int = LINE_MIN_DUP_DOCS,
    k: int = BOILERPLATE_TOPK,
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`boilerplate_chunks`."""
    min_df, k = int(min_df), int(k)
    return f"""
WITH {chunk_ctes(width, source)}
SELECT chunk,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM ex GROUP BY 1
HAVING COUNT(DISTINCT doc_id) >= {min_df}
ORDER BY n_docs DESC, n_occurrences DESC, chunk
LIMIT {k}
""".strip()


def embedding_assortativity(
    emb: DataFrame, threshold: float, id_col: str = "vec_id"
) -> DataFrame:
    """Degree assortativity of the banded embedding near-dup graph —
    the structural question after :func:`embedding_triangles`'s
    transitivity: do high-degree vectors attach to other hubs
    (assortative, r > 0 — dense template families) or to leaves
    (disassortative, r < 0 — hub-and-spoke near-dup stars, the shape
    where canonical-per-component collapse is safest)? Pearson
    correlation of endpoint degrees over BOTH edge orientations (the
    symmetric convention: Σx = Σy, Σxx = Σyy, so only three moments
    are needed).

    Twin-exactness: degrees are integers, every moment is an INTEGER
    sum (BIGINT both sides — with M = 2·edges, the products need
    M·Σxx < 2^62, the lang_source_chi2 overflow-documentation class),
    so numerator and denominator cross engines EXACTLY; the one float
    op is the final division, NULL on zero degree variance (a regular
    graph has no defined assortativity — NULLIF, the mannwhitney
    guard). Output one row:
    ``(n_nodes, n_edges, degree_assortativity)``.

    Plan (100 TB): pair table checkpointed once ahead of its THREE
    consumers (degree build + edge-join legs + edge count); both
    orientations emitted from ONE pass via explode(array(struct...))
    (the span_coverage union lesson); joins are id-keyed equi-joins.
    """
    from cuda_gis_smoothing_spark.functions.numeric import round6

    pairs = (
        embedding_neardup_pairs_banded(emb, threshold=threshold)
        .select("vec_a", "vec_b")
        .localCheckpoint()
    )
    deg = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("vec_a").alias("v")),
                    F.struct(F.col("vec_b").alias("v")),
                )
            ).alias("_e")
        )
        .select(F.col("_e.v").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("_d"))
        .localCheckpoint()  # two edge-join sides + the node count
    )
    da = deg.select(F.col("v").alias("vec_a"), F.col("_d").alias("_da"))
    db = deg.select(F.col("v").alias("vec_b"), F.col("_d").alias("_db"))
    oriented = (
        pairs.join(da, "vec_a")
        .join(db, "vec_b")
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("_da").alias("x"), F.col("_db").alias("y")
                    ),
                    F.struct(
                        F.col("_db").alias("x"), F.col("_da").alias("y")
                    ),
                )
            ).alias("_o")
        )
        .select(F.col("_o.x").alias("x"), F.col("_o.y").alias("y"))
    )
    mom = oriented.agg(
        F.count(F.lit(1)).cast("long").alias("_m"),
        F.sum("x").cast("long").alias("_sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("_sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("_sxy"),
    )
    nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    num = F.col("_m") * F.col("_sxy") - F.col("_sx") * F.col("_sx")
    den = F.col("_m") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    return (
        nodes.crossJoin(mom)
        .select(
            "n_nodes",
            F.expr("_m div 2").cast("long").alias("n_edges"),
            round6(
                num.cast("double")
                / F.nullif(den.cast("double"), F.lit(0.0))
            ).alias("degree_assortativity"),
        )
    )


def embedding_assortativity_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`embedding_assortativity` over the gated
    banded pair SQL (composed, the rrf_fusion nesting precedent)."""
    return f"""
WITH pairs AS ({pairs_sql}),
ends AS (
  SELECT vec_a AS v FROM pairs UNION ALL SELECT vec_b AS v FROM pairs
),
deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM ends GROUP BY v),
oriented AS (
  SELECT da.d AS x, db.d AS y
  FROM pairs p JOIN deg da ON da.v = p.vec_a JOIN deg db ON db.v = p.vec_b
  UNION ALL
  SELECT db.d AS x, da.d AS y
  FROM pairs p JOIN deg da ON da.v = p.vec_a JOIN deg db ON db.v = p.vec_b
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM oriented
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
SELECT nn.n_nodes,
       CAST(mom.m // 2 AS BIGINT) AS n_edges,
       ROUND(CAST(mom.m * mom.sxy - mom.sx * mom.sx AS DOUBLE)
             / NULLIF(CAST(mom.m * mom.sxx - mom.sx * mom.sx AS DOUBLE), 0e0)
             + 1e-09, 6) AS degree_assortativity
FROM nn, mom
""".strip()
