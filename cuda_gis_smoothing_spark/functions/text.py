"""Text-analysis column functions for document tables.

All pure Catalyst expressions (no UDFs): language-ID by stopword
hits, quality scoring by length/punct/stopword ratios, token counting
(whitespace + a BPE-ish regex), and a portable polynomial document
fingerprint. Each has an ANSI-SQL twin runnable by DuckDB (the driver
oracle), built from the same literal constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: tiny per-language stopword lists (heuristic language ID)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "dans"),
    "es": ("el", "la", "los", "y", "es", "en"),
}

#: BPE-ish token pattern: letter runs, digit runs, single punctuation
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def tokens_col(text_col: str = "text") -> Column:
    return F.split(F.lower(F.col(text_col)), " ")


def n_tokens_col(text_col: str = "text") -> Column:
    return F.size(F.split(F.col(text_col), " "))


def bpe_token_count_col(text_col: str = "text") -> Column:
    return F.size(F.expr(f"regexp_extract_all({text_col}, '{BPE_REGEX}', 0)"))


def punct_ratio_col(text_col: str = "text") -> Column:
    stripped = F.regexp_replace(F.col(text_col), "[.,!?;:]", "")
    return (F.length(text_col) - F.length(stripped)) / F.length(text_col)


def stopword_hits_col(text_col: str, lang: str) -> Column:
    pat = "\\\\b(" + "|".join(STOPWORDS[lang]) + ")\\\\b"
    return F.size(F.expr(f"regexp_extract_all(lower({text_col}), '{pat}', 0)"))


def quality_score_col() -> Column:
    """Composite quality score in [0, 1] over the NAMED feature columns
    (`n_tokens`, `punct_ratio`, `stopword_ratio` — the round6'd forms
    :func:`quality_features` projects) — shared by the gate operator
    and the fused single-projection curation path so the formula cannot
    drift."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    score = (
        F.least(F.col("n_tokens") / 64.0, F.lit(1.0)) * 0.5
        + (1.0 - F.least(F.col("punct_ratio") * 4.0, F.lit(1.0))) * 0.25
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.25
    )
    return round6(score)


def quality_feature_cols(text_col: str = "text") -> list[Column]:
    """The per-row quality feature columns (pure projections)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    nt = n_tokens_col(text_col)
    # counts cast to long: DuckDB LEN/LENGTH are BIGINT, Spark's are int
    return [
        F.length(text_col).cast("long").alias("n_chars"),
        nt.cast("long").alias("n_tokens"),
        bpe_token_count_col(text_col).cast("long").alias("n_bpe_tokens"),
        round6(F.length(F.regexp_replace(F.col(text_col), " ", "")) / nt).alias(
            "avg_token_len"
        ),
        round6(punct_ratio_col(text_col)).alias("punct_ratio"),
        round6(stopword_hits_col(text_col, "en") / nt).alias("stopword_ratio"),
    ]


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: lengths, token stats, punct/stopword
    ratios, and a composite quality score in [0, 1]."""
    out = df.select(id_col, *quality_feature_cols(text_col))
    return out.withColumn("quality_score", quality_score_col())


def pred_lang_from_hits(hit_col) -> Column:
    """Predicted language from per-language hit columns: argmax with a
    deterministic tie-break by language code, 'und' when all zero.
    ``hit_col`` maps a language code to its hit-count Column — pass
    COLUMN REFERENCES to a prior projection, never the raw regexp
    expressions: the left-to-right WHEN fold references each hit twice
    per level, and inlining the (expensive) regexps duplicates their
    evaluation per level — measured 2.5x on the curation pipeline.
    Spark's CollapseProject deliberately keeps non-cheap expressions in
    their own projection for exactly this reason."""
    # left-to-right scan: first language with a strictly higher hit
    # count wins, so exact ties resolve to the alphabetically first
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(STOPWORDS):
        h = hit_col(lang)
        cond = h > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, h).otherwise(best_hits)
    return best


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits
    (deterministic tie-break by language code; 'und' when all zero)."""
    hits = [
        stopword_hits_col(text_col, lang).cast("long").alias(f"hits_{lang}")
        for lang in sorted(STOPWORDS)
    ]
    d = df.select(id_col, *hits)
    return d.select(
        id_col,
        *[f"hits_{lang}" for lang in sorted(STOPWORDS)],
        pred_lang_from_hits(lambda lang: F.col(f"hits_{lang}")).alias("pred_lang"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Portable polynomial rolling hash over the whole document
    (char-level Karp-Rabin mod MH_PRIME) — the document-fingerprinting
    primitive; identical in DuckDB via list_reduce."""
    from cuda_gis_smoothing_spark.operators.dedup import MH_PRIME

    fp = F.expr(
        f"aggregate(split({text_col}, ''), CAST(7 AS BIGINT), "
        f"(acc, c) -> (acc * 131 + ascii(c)) % {MH_PRIME})"
    )
    return df.select(id_col, fp.alias("fingerprint"))


def doc_unigram_logprob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Unigram LM self-scoring — the CCNet/Gopher perplexity-filter
    shape: token probabilities are MLE corpus frequencies, each doc is
    scored by the mean negative log-probability over its TOKEN
    OCCURRENCES (not distinct tokens — repetition is signal). Low
    scores = templated/common text, high = rare-token noise; real
    pipelines threshold both tails.

    Plan (100 TB): TWO passes over the corpus tokens — the count-build
    aggregate and the scoring join (LM training and scoring are
    different dataflows; materializing the occurrence table to skip
    the second scan would stage more bytes than it saves). The
    vocab-sized count table is materialized ONCE (localCheckpoint —
    its total and the scoring join both read it; a staged table on a
    real cluster), the corpus total is a 1-row broadcast derived from
    it, and the count join broadcasts when the vocab fits (AQE
    decides). Entirely JVM-side; docs with no tokens get no row (same
    contract as the signature operators). Output: (doc_id,
    n_token_occurrences, avg_neg_logprob).
    """
    from cuda_gis_smoothing_spark.functions.numeric import round6

    occ = df.select(
        id_col, F.explode(tokens_col(text_col)).alias("t")
    ).where(F.col("t") != "")
    counts = occ.groupBy("t").agg(F.count(F.lit(1)).alias("_c")).localCheckpoint()
    total = counts.agg(F.sum("_c").alias("_s"))
    scored = (
        occ.join(counts, "t")
        .crossJoin(F.broadcast(total))
        .select(id_col, (-F.log(F.col("_c") / F.col("_s"))).alias("_nlp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_token_occurrences"),
        round6(F.avg("_nlp")).alias("avg_neg_logprob"),
    )


UNIGRAM_LOGPROB_SQL = """
WITH occ AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> ''
),
c AS (SELECT t, COUNT(*) AS c FROM occ GROUP BY t),
tot AS (SELECT SUM(c) AS s FROM c)
SELECT occ.doc_id,
       COUNT(*) AS n_token_occurrences,
       ROUND(AVG(-ln(c.c * 1.0 / tot.s)) + 1e-09, 6) AS avg_neg_logprob
FROM occ JOIN c USING (t) CROSS JOIN tot
GROUP BY occ.doc_id
""".strip()


def holdout_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-split LM evaluation — the held-out counterpart of
    :func:`doc_unigram_logprob`'s SELF-score: a Laplace-smoothed
    unigram LM is fit on the TRAIN split (the deterministic
    ``dataset_split`` hash cut, so the model/data boundary is
    reproducible and leak-free by construction) and scores the VAL
    split's docs by mean −ln p over token occurrences, with

        p(t) = (c_t + 1) / (T + V)

    (c_t train count, T train occurrences, V train vocabulary —
    smoothing is REQUIRED here, unlike the self-score, because val
    docs legally contain train-unseen tokens). This is the actual
    quality/contamination-adjacent filter pipelines run: a val doc
    scoring far below the mass is templated or leaked from train;
    far above is out-of-distribution noise. Output per val doc:
    ``(doc_id, n_token_occurrences, n_unseen, avg_neg_logprob)`` —
    n_unseen counts occurrences backed off to the floor probability.

    Plan (100 TB): one pass over the train partition into the
    vocab-sized count table (materialized once — its totals row and
    the scoring join both read it), one pass over the much smaller
    val partition, a LEFT join against counts (unseen tokens keep the
    row), 1-row broadcast totals. Docs with no tokens get no row
    (the self-score contract); every smoothing input is an exact
    integer so the served doubles gate cross-engine
    (``HOLDOUT_LOGPROB_SQL``)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.sampling import (
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        sample_hash_col,
    )

    h = sample_hash_col(id_col)

    def occ(lo: int, hi: int) -> DataFrame:
        return (
            df.where((h >= lo) & (h < hi))
            .select(id_col, F.explode(tokens_col(text_col)).alias("t"))
            .where(F.col("t") != "")
        )

    counts = (
        occ(0, SPLIT_TRAIN_LT)
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()  # two consumers: totals row + scoring join
    )
    tot = counts.agg(
        F.sum("_c").alias("_s"), F.count(F.lit(1)).alias("_v")
    )
    p = (F.coalesce(F.col("_c"), F.lit(0)) + 1) / (F.col("_s") + F.col("_v"))
    return (
        occ(SPLIT_TRAIN_LT, SPLIT_VAL_LT)
        .join(counts, "t", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            F.col("_c").isNull().cast("int").alias("_u"),
            (-F.log(p)).alias("_nlp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_token_occurrences"),
            F.sum("_u").cast("long").alias("n_unseen"),
            round6(F.avg("_nlp")).alias("avg_neg_logprob"),
        )
    )


def _holdout_logprob_sql() -> str:
    from cuda_gis_smoothing_spark.operators.sampling import (
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        sample_hash_sql,
    )

    hs = sample_hash_sql("doc_id")
    return f"""
WITH tr AS (
  SELECT t FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS t
    FROM documents WHERE {hs} < {SPLIT_TRAIN_LT}
  ) WHERE t <> ''
),
c AS (SELECT t, COUNT(*) AS c FROM tr GROUP BY t),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS s, COUNT(*) AS v FROM c),
vo AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
    FROM documents
    WHERE {hs} >= {SPLIT_TRAIN_LT} AND {hs} < {SPLIT_VAL_LT}
  ) WHERE t <> ''
)
SELECT vo.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_token_occurrences,
       CAST(SUM(CASE WHEN c.c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
       ROUND(AVG(-ln((COALESCE(c.c, 0) + 1) * 1.0 / (tot.s + tot.v))) + 1e-09, 6) AS avg_neg_logprob
FROM vo LEFT JOIN c USING (t) CROSS JOIN tot
GROUP BY vo.doc_id
""".strip()


HOLDOUT_LOGPROB_SQL = _holdout_logprob_sql()


def doc_tfidf(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Sparse TF-IDF document vectors: one row per (doc, distinct
    token) with ``tfidf = tf · idf``, tf the doc's occurrence count
    and idf the repo's BM25-style smoothing
    ``ln(1 + (N − df + .5)/(df + .5))`` over N = docs with text —
    the vectorization step feeding classic similarity/classification.
    Sparse (coordinate) output is deliberate: a dense array column in
    SQL would need per-element correlated derivation in the twin,
    while the sparse form is the SAME explode→agg→join dataflow in
    both engines — and at 100 TB the sparse postings ARE the storage
    format (the dense form is a downstream reshape).

    Plan: one token explode, a (doc, token) tf aggregate, a token df
    aggregate (vocab-sized, materialized once), a 1-row broadcast N.
    Output: (doc_id, token, tf, tfidf)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    occ = df.select(
        id_col, F.explode(tokens_col(text_col)).alias("token")
    ).where(F.col("token") != "")
    tf = occ.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("_df"))
        .localCheckpoint()
    )
    n = df.where(F.col(text_col).isNotNull()).agg(
        F.count(F.lit(1)).cast("double").alias("_N")
    )
    idf = F.log(
        F.lit(1.0) + (F.col("_N") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(id_col, "token", "tf", round6(F.col("tf") * idf).alias("tfidf"))
    )


DOC_KEYWORDS_K = 5


def doc_keywords(
    df: DataFrame,
    k: int = DOC_KEYWORDS_K,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction: the top-``k`` tokens by TF-IDF
    — the summary card / weak-labeling signal built directly on
    :func:`doc_tfidf` (one window over the sparse vectors; ranking on
    the ROUND6'd tfidf with token-text tie-break — a cross-engine
    total order, the knn_graph rank contract). Output
    ``(doc_id, token, tfidf, rank)``."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        doc_tfidf(df, text_col, id_col)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(id_col, "token", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


def bigram_pmi(
    df: DataFrame, k: int = 30, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` adjacent-token bigrams by count, with pointwise mutual
    information — the co-occurrence statistic embedding/phrase-mining
    pipelines precompute (word2vec-style collocation detection):

        pmi(a,b) = ln( (c_ab / B) / ((c_a / T) · (c_b / T)) )

    over corpus-wide counts (c_ab bigram occurrences, B total bigrams,
    c_x unigram occurrences, T total tokens; empty tokens excluded on
    both levels). Output ``(t1, t2, n_pairs, pmi, rank)``, ranked by
    (count desc, t1, t2) — a deterministic cross-engine total order.

    Plan: one scan explodes bigram structs (pure higher-order
    expression, no self-join on positions), one scan for unigrams; two
    hash aggregates, two 1-row broadcasts, orderBy+limit =
    TakeOrderedAndProject (per-partition heaps, no global sort) with
    the rank window over k rows only."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.functions.numeric import round6

    toks = F.split(F.lower(F.col(text_col)), " ")
    d = df.select(F.col(id_col), toks.alias("_t"))
    big = (
        d.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(_t) >= 2 THEN "
                    "transform(sequence(1, size(_t) - 1), "
                    "i -> struct(element_at(_t, i) AS t1, element_at(_t, i + 1) AS t2)) "
                    "ELSE CAST(array() AS array<struct<t1: string, t2: string>>) END"
                )
            ).alias("_b")
        )
        .select("_b.t1", "_b.t2")
        .where((F.col("t1") != "") & (F.col("t2") != ""))
    )
    # the bigram-count table feeds the B total AND the top-k — two
    # differently-pruned consumers would re-run the corpus explode
    bc = (
        big.groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()
    )
    uni = (
        d.select(F.explode("_t").alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("_u"))
        .localCheckpoint()  # two join consumers (t1, t2 resolution)
    )
    tot = uni.agg(F.sum("_u").cast("double").alias("_T"))
    btot = bc.agg(F.sum("_c").cast("double").alias("_B"))
    top = bc.orderBy(F.col("_c").desc(), "t1", "t2").limit(k)
    w = Window.orderBy(F.col("_c").desc(), "t1", "t2")
    pmi = F.log(
        (F.col("_c") / F.col("_B"))
        / ((F.col("_u1") / F.col("_T")) * (F.col("_u2") / F.col("_T")))
    )
    return (
        top.withColumn("rank", F.row_number().over(w))
        .join(uni.select(F.col("t").alias("t1"), F.col("_u").alias("_u1")), "t1")
        .join(uni.select(F.col("t").alias("t2"), F.col("_u").alias("_u2")), "t2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            "t1",
            "t2",
            F.col("_c").cast("long").alias("n_pairs"),
            round6(pmi).alias("pmi"),
            "rank",
        )
    )


#: interpolation weight for the bigram LM self-score (λ on the bigram
#: MLE term, 1−λ on the unigram backoff) — shared with the SQL twin
BIGRAM_LM_LAMBDA = 0.75


def doc_bigram_logprob(
    df: DataFrame,
    lam: float = BIGRAM_LM_LAMBDA,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated bigram-LM self-scoring — the second-order sibling
    of :func:`doc_unigram_logprob` (the CCNet/Gopher perplexity-filter
    shape, one step closer to the KenLM models real pipelines use):
    each doc is scored by the mean negative log-probability of its
    BIGRAM OCCURRENCES under

        p(b | a) = λ · c_ab / c_a·   +   (1 − λ) · c_b / T

    where c_ab is the corpus bigram count, c_a· the count of a as a
    bigram CONTEXT (Σ_x c_ax — derived from the bigram table, NOT the
    unigram count, so the conditional sums to 1 over the backoff-free
    part), c_b the unigram count and T the token total (the add-λ
    interpolation that keeps unseen-in-context bigrams finite).
    Repetitive/templated text scores low, rare-transition noise high.
    Bigrams skip positions flanking an empty token — the
    :func:`bigram_pmi` convention.

    Plan (100 TB): the corpus bigram-count table is materialized ONCE
    (localCheckpoint — the context-count aggregate derives from it and
    the scoring join reads it; a staged table on a real cluster), the
    unigram table likewise (its total + the backoff join), then ONE
    scoring join stream over the doc bigram occurrences and a doc-keyed
    aggregate. Entirely JVM-side. Docs with no qualifying bigram get no
    row (the signature-operator contract). Output: (doc_id,
    n_bigram_occurrences, avg_neg_logprob)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    toks = tokens_col(text_col)
    occ = (
        df.select(F.col(id_col), toks.alias("_t"))
        .select(
            id_col,
            F.explode(
                F.expr(
                    "CASE WHEN size(_t) >= 2 THEN "
                    "transform(sequence(1, size(_t) - 1), "
                    "i -> struct(element_at(_t, i) AS t1, element_at(_t, i + 1) AS t2)) "
                    "ELSE CAST(array() AS array<struct<t1: string, t2: string>>) END"
                )
            ).alias("_b"),
        )
        .select(id_col, "_b.t1", "_b.t2")
        .where((F.col("t1") != "") & (F.col("t2") != ""))
    )
    bc = (
        occ.groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()  # two consumers: context counts + scoring join
    )
    ctx = bc.groupBy("t1").agg(F.sum("_c").alias("_ctx"))
    uni = (
        df.select(F.explode(toks).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("_u"))
        .localCheckpoint()  # two consumers: total + backoff join
    )
    tot = uni.agg(F.sum("_u").cast("double").alias("_T"))
    p = F.lit(lam) * (F.col("_c") / F.col("_ctx")) + F.lit(1.0 - lam) * (
        F.col("_u") / F.col("_T")
    )
    return (
        occ.join(bc, ["t1", "t2"])
        .join(ctx, "t1")
        .join(uni.select(F.col("t").alias("t2"), "_u"), "t2")
        .crossJoin(F.broadcast(tot))
        .select(id_col, (-F.log(p)).alias("_nlp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigram_occurrences"),
            round6(F.avg("_nlp")).alias("avg_neg_logprob"),
        )
    )


def source_kl_divergence(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source token-distribution drift: KL(P_source ‖ P_corpus)
    over unigram MLE distributions,

        KL = Σ_t p_s(t) · ln(p_s(t) / p(t))

    — the dataset-card statistic that flags a source whose language
    use diverges from the mix (domain skew, boilerplate, spam) before
    it trains. Every source term is present in the corpus distribution
    by construction, so the sum is always finite and no smoothing
    constant enters the gate arithmetic. Output: one row per source,
    ``(source, n_tokens, kl_divergence)``, NULL sources excluded (the
    inner joins drop NULL keys — identically in both engines).

    Plan (100 TB): ONE corpus token pass into a (source, token) count
    table, materialized once (localCheckpoint — the corpus counts, the
    source totals, and the KL term all derive from it), then
    vocabulary-sized joins and a source-keyed 1-row-per-source
    aggregate; the corpus total is a 1-row broadcast. No windows."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    stc = (
        df.select(F.col(source_col).alias("source"), F.explode(tokens_col(text_col)).alias("t"))
        .where(F.col("t") != "")
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()  # three consumers: corpus counts, totals, KL term
    )
    ct = stc.groupBy("t").agg(F.sum("_c").alias("_ct"))
    ns = stc.groupBy("source").agg(F.sum("_c").alias("_ns"))
    tot = stc.agg(F.sum("_c").cast("double").alias("_T"))
    ps = F.col("_c") / F.col("_ns")
    pc = F.col("_ct") / F.col("_T")
    return (
        stc.join(ct, "t")
        .join(ns, "source")
        .crossJoin(F.broadcast(tot))
        .select("source", "_ns", (ps * F.log(ps / pc)).alias("_kl"))
        .groupBy("source")
        .agg(
            F.max("_ns").cast("long").alias("n_tokens"),
            round6(F.sum("_kl")).alias("kl_divergence"),
        )
    )


def source_diversity(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source lexical-diversity card: token total, distinct-type
    count, type-token ratio, and the Simpson index

        simpson = Σ_t c_t·(c_t − 1) / (N·(N − 1))

    (the probability two tokens drawn without replacement from the
    source are the same type — 1 for a one-word spam source, →0 for a
    maximally diverse one). The repetition-side complement of
    :func:`source_kl_divergence`'s drift score: KL flags a source whose
    vocabulary DIFFERS from the mix, Simpson flags one that barely has
    a vocabulary at all.

    Exactness: every aggregate is an integer; the Simpson sums are
    computed as integer-valued DOUBLES (Σ c·(c−1) and N·(N−1) stay
    exact while < 2^53 — the avgdl lesson: integer-valued double sums
    are association-free), sidestepping both Spark's silent int64 wrap
    and DuckDB's HUGEINT promotion. TTR and Simpson are each ONE
    division of two exact numbers under round6. NULL sources group as
    one NULL row identically in both engines; NULL-text docs explode to
    zero tokens in both.

    Plan (100 TB): one corpus token pass into a (source, token) count
    table (map-side combining), then a source-keyed aggregate over
    vocabulary-sized rows. No windows, no joins."""
    stc = (
        df.select(
            F.col(source_col).alias("source"),
            F.explode(tokens_col(text_col)).alias("t"),
        )
        .where(F.col("t") != "")
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return diversity_from_counts(stc)


def diversity_from_counts(stc: DataFrame) -> DataFrame:
    """The diversity rollup over a PREPARED ``(source, t, _c)`` count
    table — ONE shared body so the batch gate and the maintained
    serving path (MaintainedSourceTokens.diversity) can never drift
    (the user_entropy_from_counts precedent)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    agg = stc.groupBy("source").agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("_c").cast("double") * (F.col("_c") - F.lit(1))).alias("_rep"),
    )
    n = F.col("n_tokens")
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        round6(F.col("n_types") / n).alias("ttr"),
        round6(
            F.col("_rep")
            / F.nullif(n.cast("double") * (n - F.lit(1)), F.lit(0.0))
        ).alias("simpson"),
    )


def source_token_gini(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source inequality of document LENGTHS: gini over doc token
    counts within each source — "is this source a few megadocs plus
    chaff?", the length-mass skew card beside source_diversity's
    vocabulary card (key_skew_report's corpus-side sibling, grouped).
    Gini over DESCENDING ranks j: ((n+1)·S − 2·Σ j·x) / (n·S) — integer
    numerator and denominator, ONE double division under round6; tie
    blocks hold equal x so the rank sum is tie-permutation-invariant
    (the revenue_concentration argument). Ranks are per-source
    ROW_NUMBERs over the (−n_tokens, doc_id) TOTAL order (source
    partitions are bounded; no global window). NULL-text docs are out
    of scope (no length); NULL sources group as one row. Int64 bound:
    per-source n_docs · total_tokens < 2^62.

    Output ``(source, n_docs, total_tokens, gini)``."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.functions.numeric import round6

    d = df.where(F.col(text_col).isNotNull()).select(
        F.col(source_col).alias("source"),
        F.col("doc_id"),
        n_tokens_col(text_col).cast("long").alias("_x"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("_x").desc(), F.col("doc_id")
    )
    ranked = d.select("source", "_x", F.row_number().over(w).alias("_j"))
    n, s = F.count(F.lit(1)), F.sum("_x")
    gini = ((n + 1) * s - F.lit(2) * F.sum(F.col("_j") * F.col("_x"))).cast(
        "double"
    ) / F.nullif((n * s).cast("double"), F.lit(0.0))
    return ranked.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        s.cast("long").alias("total_tokens"),
        round6(gini).alias("gini"),
    )


SOURCE_TOKEN_GINI_SQL = """
WITH d AS (
  SELECT source, doc_id, CAST(LEN(string_split(text, ' ')) AS BIGINT) AS x
  FROM documents WHERE text IS NOT NULL
),
r AS (
  SELECT source, x,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY x DESC, doc_id) AS j
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(x) AS BIGINT) AS total_tokens,
       ROUND(CAST((COUNT(*) + 1) * SUM(x) - 2 * SUM(j * x) AS DOUBLE)
             / NULLIF(CAST(COUNT(*) * SUM(x) AS DOUBLE), 0) + 1e-09, 6) AS gini
FROM r GROUP BY source
""".strip()


SOURCE_DIVERSITY_SQL = """
WITH stc AS (
  SELECT source, t, COUNT(*) AS c FROM (
    SELECT source, unnest(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> '' GROUP BY source, t
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) + 1e-09, 6) AS ttr,
       ROUND(SUM(CAST(c AS DOUBLE) * (c - 1))
             / NULLIF(CAST(SUM(c) AS DOUBLE) * (SUM(c) - 1), 0) + 1e-09, 6)
         AS simpson
FROM stc GROUP BY source
""".strip()


def lang_source_chi2(
    df: DataFrame, lang_col: str = "lang", source_col: str = "source"
) -> DataFrame:
    """Pearson χ² independence test between language and source — the
    dataset-card question "is language mix homogeneous across
    sources?" (a strongly dependent pair means per-source language
    filters can't be tuned globally). Observed counts come from one
    (lang, source) aggregate; the FULL R×C contingency table is
    reconstituted by crossing the marginals and left-joining observed
    cells (χ² needs the O=0, E>0 cells a groupBy alone never emits).
    Output one row: ``(n_docs, n_langs, n_sources, dof, chi2,
    cramers_v)`` with V = √(χ²/(N·min(R−1, C−1))). NULL lang/source
    rows are excluded up front (identically in the twin). Every input
    to the float formula is an exact integer; the cell sum has R×C
    (bounded, vocabulary-free) terms."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    obs = (
        df.where(F.col(lang_col).isNotNull() & F.col(source_col).isNotNull())
        .groupBy(F.col(lang_col).alias("lang"), F.col(source_col).alias("source"))
        .agg(F.count(F.lit(1)).alias("_o"))
        .localCheckpoint()  # FOUR consumers: rm, cm, tot + the cells left join
    )
    rm = obs.groupBy("lang").agg(F.sum("_o").alias("_r"))
    cm = obs.groupBy("source").agg(F.sum("_o").alias("_c"))
    tot = obs.agg(F.sum("_o").cast("double").alias("_n"))
    # marginal product in DOUBLE: r·c overflows int64 once N > ~2^31
    # (Spark would wrap silently, DuckDB would raise — the CLAUDE.md
    # overflow invariant), and the twin multiplies in the same order
    e = F.col("_r").cast("double") * F.col("_c") / F.col("_n")
    o = F.coalesce(F.col("_o"), F.lit(0)).cast("double")
    return (
        rm.crossJoin(cm)
        .join(obs, ["lang", "source"], "left")
        .crossJoin(F.broadcast(tot))
        .select("lang", "source", "_n", ((o - e) * (o - e) / e).alias("_t"))
        .agg(
            F.max("_n").cast("long").alias("n_docs"),
            F.count_distinct(F.col("lang")).cast("int").alias("n_langs"),
            F.count_distinct(F.col("source")).cast("int").alias("n_sources"),
            (
                (F.count_distinct(F.col("lang")) - 1)
                * (F.count_distinct(F.col("source")) - 1)
            )
            .cast("int")
            .alias("dof"),
            round6(F.sum("_t")).alias("chi2"),
            round6(
                F.sqrt(
                    F.sum("_t")
                    / (
                        F.max("_n")
                        * F.least(
                            F.count_distinct(F.col("lang")) - 1,
                            F.count_distinct(F.col("source")) - 1,
                        )
                    )
                )
            ).alias("cramers_v"),
        )
    )


LANG_SOURCE_CHI2_SQL = """
WITH obs AS (
  SELECT lang, source, COUNT(*) AS o FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2
),
rm AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1),
cm AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM obs),
cells AS (
  SELECT rm.lang, cm.source, tot.n,
         COALESCE(obs.o, 0) * 1.0 AS o,
         (rm.r * 1.0) * cm.c / tot.n AS e
  FROM rm CROSS JOIN cm CROSS JOIN tot
  LEFT JOIN obs ON obs.lang = rm.lang AND obs.source = cm.source
)
SELECT CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS INT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS INT) AS n_sources,
       CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1) AS INT) AS dof,
       ROUND(SUM((o - e) * (o - e) / e) + 1e-09, 6) AS chi2,
       ROUND(SQRT(SUM((o - e) * (o - e) / e) /
                  (MAX(n) * LEAST(COUNT(DISTINCT lang) - 1,
                                  COUNT(DISTINCT source) - 1))) + 1e-09, 6) AS cramers_v
FROM cells
""".strip()


def window_pairs(
    df: DataFrame, window: int, text_col: str = "text"
) -> DataFrame:
    """DIRECTED windowed position pairs (t_i, t_j), i < j ≤ i+window,
    corpus-wide — the ONE pair derivation :func:`cooccurrence_window`
    and :func:`keyword_textrank` share (drift prevention). ONE corpus
    scan; pairs are a pure nested higher-order expression (flatten ∘
    transform², no positions self-join); empty tokens excluded. The
    inner ``sequence(i+1, least(i+window, n))`` is always ascending
    and non-empty for i ≤ n−1 — the descending-``sequence`` trap
    (contamination_report lesson) cannot fire."""
    d = df.select(tokens_col(text_col).alias("_t"))
    return (
        d.select(F.explode(F.expr(window_pairs_expr(window))).alias("_p"))
        .select("_p.t1", "_p.t2")
        .where((F.col("t1") != "") & (F.col("t2") != ""))
    )


def window_pairs_expr(window: int, arr: str = "_t") -> str:
    """The windowed position-pair SQL expression over a token array
    column — the ONE derivation text :func:`window_pairs` and the
    maintained doc-slice builder (streaming/cooccur.py) share;
    ``window=1`` degenerates to adjacent bigrams."""
    if window < 1:
        raise ValueError("window_pairs_expr: window must be >= 1")
    return (
        f"CASE WHEN size({arr}) >= 2 THEN "
        f"flatten(transform(sequence(1, size({arr}) - 1), "
        f"i -> transform(sequence(i + 1, least(i + {int(window)}, size({arr}))), "
        f"j -> struct(element_at({arr}, i) AS t1, element_at({arr}, j) AS t2)))) "
        "ELSE CAST(array() AS array<struct<t1: string, t2: string>>) END"
    )


def cooccurrence_window(
    df: DataFrame,
    window: int = 3,
    k: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` windowed co-occurrence pairs — the skip-gram
    generalization of :func:`bigram_pmi`'s adjacency (window=1 ≡
    bigrams): for every position i, the DIRECTED pairs (t_i, t_j) with
    i < j ≤ i+window are counted corpus-wide — the co-occurrence
    matrix builder word2vec/GloVe-style embedding pipelines feed.
    Output ``(t1, t2, n_pairs, rank)`` ranked by (count desc, t1, t2)
    — all-integer values on a deterministic total order, so the gate
    is tie-proof. Pairs involving an empty token are excluded (each
    (i, j) position pair judged independently — the bigram
    convention, windowed).

    Plan: ONE corpus scan — the window pairs are a pure nested
    higher-order expression (flatten ∘ transform², no positions
    self-join, no per-row Python), then a hash count aggregate and
    orderBy+limit = TakeOrderedAndProject (per-partition heaps, no
    global sort) with the rank window over k rows only. The inner
    ``sequence(i+1, least(i+window, n))`` is always ascending and
    non-empty for i ≤ n−1 — the descending-``sequence`` trap
    (contamination_report lesson) cannot fire."""
    from pyspark.sql import Window

    pairs = window_pairs(df, window, text_col)
    counts = pairs.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("_c"))
    w = Window.orderBy(F.col("_c").desc(), "t1", "t2")
    return (
        counts.orderBy(F.col("_c").desc(), "t1", "t2")
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select(
            "t1",
            "t2",
            F.col("_c").cast("long").alias("n_pairs"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


TEXTRANK_K = 30


def keyword_textrank(
    df: DataFrame,
    window: int = 3,
    k: int = TEXTRANK_K,
    damping: float = 0.85,
    iters: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau): PageRank over
    the corpus token co-occurrence graph — tokens are vertices, an
    undirected edge links tokens that co-occur within ``window``
    positions (DISTINCT pairs: unweighted, the original formulation),
    and the top-``k`` tokens by rank are the corpus keywords. The
    THIRD graph domain for the one :func:`~cuda_gis_smoothing_spark.
    operators.stats.pagerank_rounds` core (grid ring-1, banded
    embedding graph, now token co-occurrence), so the rounds cannot
    drift between domains.

    Output ``(token, pagerank, rank)`` by (pagerank DESC, token ASC)
    — the cut orders on the ROUND6'd rank (both engines compare
    identical rounded doubles; raw-pr ordering would expose 1e-16
    association noise at round6 ties), tie-broken on token: a total
    order, the doc_keywords k-cut class. Tokens that never co-occur
    (single-token docs) hold the teleport term only — kept as
    vertices. Hot tokens (stopwords) have unbounded degree: inbound
    sums aggregate up to deg doubles (association noise ~1e-13 at
    vocab-scale degrees, absorbed by round6's 1e-9 nudge — the
    cell_pagerank class, wider but same argument).

    Plan (100 TB): one corpus scan → distinct-pair dedup (the
    corpus-scale shuffle) → both orientations emitted from ONE pass
    via explode(array(struct)) (the span_coverage two-sided-union
    trick — a unionAll of two selects re-executes the distinct) →
    ``iters`` equi-join + hash-agg rounds over the edge table
    (checkpointed once inside the core) → TakeOrderedAndProject.
    DuckDB twin: the SAME shared unrolled pr0..prN chain builder over
    the SAME pairs CTE text cooccurrence_window's twin uses."""
    from cuda_gis_smoothing_spark.operators.stats import pagerank_rounds
    from pyspark.sql import Window

    und = (
        window_pairs(df, window, text_col)
        .where(F.col("t1") != F.col("t2"))
        .select(
            F.least("t1", "t2").alias("a"), F.greatest("t1", "t2").alias("b")
        )
        .distinct()
    )
    edges = und.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    nodes = (
        df.select(F.explode(tokens_col(text_col)).alias("token"))
        .where(F.col("token") != "")
        .distinct()
    )
    pr = pagerank_rounds(nodes, edges, damping, iters, id_col="token")
    w = Window.orderBy(F.col("pagerank").desc(), "token")
    return (
        pr.orderBy(F.col("pagerank").desc(), "token")
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("token", "pagerank", "rank")
    )


def feature_hashed_vectors(
    df: DataFrame, dim: int = 64, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Hashing-trick (feature-hashing) document vectors in sparse
    coordinate form: token occurrences are bucketed by
    ``portable_token_hash % dim``; each (doc, dim_index) weight is the
    bucket's occurrence count L2-normalized per doc — the fixed-width,
    vocabulary-free featurization (Weinberger et al.) used when a
    learned embedding is unavailable or the vocab is unbounded. The
    hash is the repo's polynomial token hash (engine-portable), NEVER
    an engine-private hash, so the twin buckets identically.

    Output: (doc_id, dim_index, weight) — sparse; at most ``dim`` rows
    per doc. Plan: explode → (doc, bucket) count → per-doc norm via a
    second doc-keyed aggregate joined back (no windows)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.operators.dedup import token_hash_col

    occ = df.select(
        id_col, F.explode(tokens_col(text_col)).alias("t")
    ).where(F.col("t") != "")
    bucketed = occ.select(
        id_col, F.pmod(token_hash_col("t"), F.lit(dim)).alias("dim_index")
    )
    # counts feeds BOTH the norm aggregate and the final join — the
    # multi-consumer class again; at ≤ dim rows per doc the checkpoint
    # stages almost nothing and halves the corpus token passes
    counts = bucketed.groupBy(id_col, "dim_index").agg(
        F.count(F.lit(1)).cast("double").alias("_c")
    ).localCheckpoint()
    norms = counts.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("_c") * F.col("_c"))).alias("_nrm")
    )
    return counts.join(norms, id_col).select(
        id_col,
        F.col("dim_index").cast("long").alias("dim_index"),
        round6(F.col("_c") / F.col("_nrm")).alias("weight"),
    )


def doc_token_entropy(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document unigram Shannon entropy and type-token ratio — the
    lexical-diversity quality signals (low entropy = templated or
    repetitive text, the same family Gopher's repetition filters
    target, but distribution-based instead of run-based; complements
    :func:`doc_unigram_logprob`, which scores against the CORPUS LM
    while this scores the doc against itself).

    Entropy in nats over the doc's own token distribution, computed as
    ``ln(n) - sum(c*ln(c))/n`` (one pass over the per-(doc, token)
    counts, no per-term division). TTR = distinct/total (exact integer
    division in double — identical cross-engine).

    Plan (100 TB): explode → (doc, token) hash aggregate → doc-keyed
    hash aggregate. Two partial-agg shuffles, both keyed by doc so the
    second reuses nothing corpus-wide; no windows, no joins. Docs with
    no tokens get no row (the signature-operator contract; NULL text
    included).
    """
    from cuda_gis_smoothing_spark.functions.numeric import round6

    counts = (
        df.select(id_col, F.explode(tokens_col(text_col)).alias("t"))
        .where(F.col("t") != "")
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return counts.groupBy(id_col).agg(
        F.sum("_c").cast("long").alias("n_token_occurrences"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
        round6(
            F.log(F.sum("_c")) - F.sum(F.col("_c") * F.log("_c")) / F.sum("_c")
        ).alias("token_entropy"),
        round6(F.count(F.lit(1)) / F.sum("_c")).alias("ttr"),
    )


DOC_ENTROPY_SQL = """
WITH occ AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> ''
),
c AS (SELECT doc_id, t, COUNT(*) AS c FROM occ GROUP BY doc_id, t)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_token_occurrences,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
       ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c) + 1e-09, 6) AS token_entropy,
       ROUND(COUNT(*) * 1.0 / SUM(c) + 1e-09, 6) AS ttr
FROM c
GROUP BY doc_id
""".strip()


def zipf_fit(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus Zipf-law fit: OLS regression of ``ln(freq)`` on
    ``ln(rank)`` over the full token-frequency table — the standard
    corpus-health diagnostic (natural text slopes near −1; templated /
    synthetic corpora drift off it). One summary row: (n_vocab,
    n_occurrences, zipf_slope, zipf_intercept).

    Ranks are DESCENDING by frequency. Cross-engine determinism: ties
    in frequency are broken by token, and within a tie block ln(freq)
    is constant, so every regression sum is invariant to tie
    permutation anyway — but both engines use the SAME (count, token)
    total order so per-token ranks agree exactly.

    Plan (100 TB): the vocab-sized count table is materialized once
    (localCheckpoint — it feeds the rank stage's three differently-
    pruned subplans AND the 1-row vocab total; the multi-consumer
    class), ranks come from plans/partitioning.global_ranks
    (partition-parallel, quantile boundaries — counts are Zipf-skewed
    so uniform range cuts would put the df=1 mass in one bucket), and
    the regression is a 1-row aggregate. No global sort anywhere.
    """
    counts = (
        df.select(id_col, F.explode(tokens_col(text_col)).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()
    )
    return zipf_fit_from_counts(counts)


def zipf_fit_from_counts(counts: DataFrame) -> DataFrame:
    """The Zipf regression over a PREPARED ``(t, _c)`` token-count
    table (already materialized — the caller owns the checkpoint): the
    shared kernel behind :func:`zipf_fit` and
    ``MaintainedSourceTokens.zipf`` (the ``*_from_daily`` precedent —
    one rank/regression definition, batch and maintained paths cannot
    drift)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.plans.partitioning import global_ranks

    vocab = counts.agg(F.count(F.lit(1)).alias("_v"))
    ranked = (
        global_ranks(counts, ["_c", "t"], out_col="_r", boundaries="quantile")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.log(F.col("_v") - F.col("_r") + 1).alias("_x"),
            F.log("_c").alias("_y"),
            F.col("_c"),
        )
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_c").cast("long").alias("n_occurrences"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    slope = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / (
        F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    )
    return agg.select(
        F.col("_n").cast("long").alias("n_vocab"),
        "n_occurrences",
        round6(slope).alias("zipf_slope"),
        round6((F.col("_sy") - slope * F.col("_sx")) / F.col("_n")).alias(
            "zipf_intercept"
        ),
    )


def zipf_sql_from_counts(counts_ctes: str) -> str:
    """DuckDB twin of :func:`zipf_fit_from_counts` over prepared CTEs
    that define ``c(t, c)`` — the ONE regression twin builder behind
    every zipf gate (corpus tokens, maintained source tokens, user
    activity), so batch/maintained/adapted paths cannot drift."""
    return f"""
WITH {counts_ctes},
v AS (SELECT COUNT(*) AS v FROM c),
ranked AS (
  SELECT ln(v.v - ROW_NUMBER() OVER (ORDER BY c.c, c.t) + 1) AS x,
         ln(c.c) AS y, c.c
  FROM c, v
),
s AS (
  SELECT COUNT(*) AS n, SUM(c) AS occ, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_vocab,
       CAST(occ AS BIGINT) AS n_occurrences,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) + 1e-09, 6) AS zipf_slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n + 1e-09, 6)
         AS zipf_intercept
FROM s
""".strip()


ZIPF_FIT_SQL = zipf_sql_from_counts(
    """occ AS (
  SELECT t FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> ''
),
c AS (SELECT t, COUNT(*) AS c FROM occ GROUP BY t)"""
)


def heaps_fit(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heaps'-law fit V(N) = K·N^β — vocabulary growth against corpus
    size, the companion corpus-health diagnostic to :func:`zipf_fit`
    (natural text β ≈ 0.4–0.6; templated corpora saturate early, OCR
    noise inflates β toward 1): OLS of ``ln V_i`` on ``ln N_i`` over
    the per-doc cumulative (tokens seen, distinct types seen) curve in
    doc_id order. One summary row ``(n_points, total_tokens,
    total_vocab, heaps_beta, heaps_lnk)`` (lnK reported, no exp).

    Cross-engine: per-doc token counts and NEW-type counts (a type is
    new at its min doc_id) are integers; both cumulatives are INTEGER
    prefix sums over the unique doc_id total order (the events_cusum
    integerize-the-cumulative lesson — float running sums diverge by
    combiner association, integer ones cannot); the ln/OLS tail is the
    zipf_fit precedent. Docs contributing zero tokens (NULL/empty
    text) never advance either cumulative and emit no point.

    Plan (100 TB): two corpus scans (per-doc counts; first-occurrence
    per type — a token-keyed aggregate), then everything runs on the
    #docs-row per-doc table through :func:`heaps_from_per_doc` (input
    checkpointed once ahead of the two partition-parallel
    ``global_prefix_sums`` passes — no global sort — and the totals
    aggregate)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.plans.partitioning import (
        global_prefix_sums,
    )

    occ = df.select(
        id_col, F.explode(tokens_col(text_col)).alias("t")
    ).where(F.col("t") != "")
    dt = occ.groupBy(id_col).agg(F.count(F.lit(1)).alias("_tok"))
    nt = (
        occ.groupBy("t")
        .agg(F.min(id_col).alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_new"))
    )
    per = dt.join(nt, id_col, "left").select(
        id_col,
        F.col("_tok").cast("long").alias("_tok"),
        F.coalesce(F.col("_new"), F.lit(0)).cast("long").alias("_new"),
    )
    return heaps_from_per_doc(per, id_col)


def heaps_from_per_doc(per: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The Heaps regression over a prepared ``(id, _tok, _new)``
    per-doc table — the shared kernel behind :func:`heaps_fit` and
    ``MaintainedHeaps.heaps`` (the *_from_daily precedent — one
    curve/OLS definition, batch and maintained paths cannot drift).
    Checkpoints the input once (eager) ahead of the two prefix passes
    and the totals aggregate."""
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.plans.partitioning import (
        global_prefix_sums,
    )

    per = per.localCheckpoint()  # two prefix passes + totals
    pn = global_prefix_sums(
        per, [id_col], "_tok", out_col="_pn"
    ).localCheckpoint()  # the second pass has three subplans of its own
    pv = global_prefix_sums(pn, [id_col], "_new", out_col="_pv")
    pts = pv.select(
        F.log(F.col("_pn") + F.col("_tok")).alias("_x"),
        F.log(F.col("_pv") + F.col("_new")).alias("_y"),
    ).where((F.col("_pn") + F.col("_tok") > 0) & (F.col("_pv") + F.col("_new") > 0))
    agg = pts.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    totals = per.agg(
        F.sum("_tok").cast("long").alias("total_tokens"),
        F.sum("_new").cast("long").alias("total_vocab"),
    )
    slope = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / (
        F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    )
    return agg.crossJoin(F.broadcast(totals)).select(
        F.col("_n").cast("long").alias("n_points"),
        "total_tokens",
        "total_vocab",
        round6(slope).alias("heaps_beta"),
        round6((F.col("_sy") - slope * F.col("_sx")) / F.col("_n")).alias(
            "heaps_lnk"
        ),
    )


def source_heaps(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-SOURCE Heaps'-law fit — the dataset-card view of
    :func:`heaps_fit` (templated/synthetic sources saturate early =
    low β; diverse organic sources grow; the mixture-weighting signal
    beside source_kl_divergence): each source's own cumulative
    (tokens, types-new-to-THE-SOURCE) curve in doc_id order, OLS per
    source.

    Cross-engine: the cumulatives are INTEGER window sums PARTITIONED
    by source over the unique doc_id order (a partitioned window needs
    no global machinery at all — each source sorts locally); the
    ln/OLS tail is the zipf/heaps precedent. A single-point source has
    an EXACTLY-zero OLS denominator (x² − x² over the same double), so
    the NULLIF-shaped guard is hit identically in both engines (the
    quality_mannwhitney class) — β/lnK NULL there. NULL sources are
    dropped (the kmv NULL-key contract); zero-token docs emit no
    point. Output ``(source, n_points, total_tokens, total_vocab,
    heaps_beta, heaps_lnk)``.

    Plan (100 TB): two corpus scans (per-doc counts; (source, type)
    first-occurrence), then one partitioned window + two per-source
    aggregates over the #docs-row table (checkpointed — window pass +
    totals)."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.functions.numeric import round6

    base = df.where(F.col(source_col).isNotNull())
    occ = base.select(
        source_col, id_col, F.explode(tokens_col(text_col)).alias("t")
    ).where(F.col("t") != "")
    dt = occ.groupBy(source_col, id_col).agg(
        F.count(F.lit(1)).alias("_tok")
    )
    nt = (
        occ.groupBy(source_col, "t")
        .agg(F.min(id_col).alias(id_col))
        .groupBy(source_col, id_col)
        .agg(F.count(F.lit(1)).alias("_new"))
    )
    per = (
        dt.join(nt, [source_col, id_col], "left")
        .select(
            source_col,
            id_col,
            F.col("_tok").cast("long").alias("_tok"),
            F.coalesce(F.col("_new"), F.lit(0)).cast("long").alias("_new"),
        )
        .localCheckpoint()  # window pass + per-source totals
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pts = (
        per.select(
            source_col,
            F.sum("_tok").over(w).alias("_cn"),
            F.sum("_new").over(w).alias("_cv"),
        )
        .where(F.col("_cv") > 0)
        .select(
            source_col,
            F.log("_cn").alias("_x"),
            F.log("_cv").alias("_y"),
        )
    )
    agg = pts.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    totals = per.groupBy(source_col).agg(
        F.sum("_tok").cast("long").alias("total_tokens"),
        F.sum("_new").cast("long").alias("total_vocab"),
    )
    den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        den != 0,
        (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / den,
    )
    return agg.join(totals, source_col).select(
        source_col,
        F.col("_n").cast("long").alias("n_points"),
        "total_tokens",
        "total_vocab",
        round6(slope).alias("heaps_beta"),
        round6((F.col("_sy") - slope * F.col("_sx")) / F.col("_n")).alias(
            "heaps_lnk"
        ),
    )


SOURCE_HEAPS_SQL = """
WITH socc AS (
  SELECT source, doc_id, t FROM (
    SELECT source, doc_id, unnest(string_split(lower(text), ' ')) AS t
    FROM documents WHERE source IS NOT NULL
  ) WHERE t <> ''
),
sdt AS (
  SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM socc GROUP BY 1, 2
),
snt AS (
  SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS nv
  FROM (SELECT source, t, MIN(doc_id) AS doc_id FROM socc GROUP BY 1, 2)
  GROUP BY 1, 2
),
sper AS (
  SELECT d.source, d.doc_id, d.c, COALESCE(n.nv, 0) AS nv
  FROM sdt d LEFT JOIN snt n ON n.source = d.source AND n.doc_id = d.doc_id
),
spts AS (
  SELECT source, SUM(c) OVER w AS cn, SUM(nv) OVER w AS cv
  FROM sper
  WINDOW w AS (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
shxy AS (
  SELECT source, ln(CAST(cn AS DOUBLE)) AS x, ln(CAST(cv AS DOUBLE)) AS y
  FROM spts WHERE cv > 0
),
shs AS (
  SELECT source, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM shxy GROUP BY source
),
sht AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS tt, CAST(SUM(nv) AS BIGINT) AS tv
  FROM sper GROUP BY source
)
SELECT s.source, CAST(s.n AS BIGINT) AS n_points,
       t.tt AS total_tokens, t.tv AS total_vocab,
       ROUND(((s.n * s.sxy - s.sx * s.sy) / NULLIF(s.n * s.sxx - s.sx * s.sx, 0))
             + 1e-09, 6) AS heaps_beta,
       ROUND(((s.sy - ((s.n * s.sxy - s.sx * s.sy)
                       / NULLIF(s.n * s.sxx - s.sx * s.sx, 0)) * s.sx) / s.n)
             + 1e-09, 6) AS heaps_lnk
FROM shs s JOIN sht t ON t.source = s.source
""".strip()


HEAPS_FIT_SQL = """
WITH hocc AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> ''
),
hdt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM hocc GROUP BY 1),
hnt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nv
  FROM (SELECT t, MIN(doc_id) AS doc_id FROM hocc GROUP BY t) GROUP BY 1
),
hper AS (
  SELECT d.doc_id, d.c, COALESCE(n.nv, 0) AS nv
  FROM hdt d LEFT JOIN hnt n ON n.doc_id = d.doc_id
),
hpts AS (
  SELECT SUM(c) OVER w AS cn, SUM(nv) OVER w AS cv
  FROM hper
  WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
hxy AS (
  SELECT ln(CAST(cn AS DOUBLE)) AS x, ln(CAST(cv AS DOUBLE)) AS y
  FROM hpts WHERE cn > 0 AND cv > 0
),
hs AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM hxy
),
ht AS (SELECT CAST(SUM(c) AS BIGINT) AS tt, CAST(SUM(nv) AS BIGINT) AS tv FROM hper)
SELECT CAST(n AS BIGINT) AS n_points, ht.tt AS total_tokens, ht.tv AS total_vocab,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) + 1e-09, 6) AS heaps_beta,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n + 1e-09, 6)
         AS heaps_lnk
FROM hs, ht
""".strip()


#: vocabulary-coverage targets (shared by operator and twin)
VOCAB_COVERAGES = (0.5, 0.75, 0.9, 0.99)


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    coverages: tuple[float, ...] = VOCAB_COVERAGES,
) -> DataFrame:
    """Vocabulary coverage curve: the smallest top-by-frequency vocab
    that covers each target share of token OCCURRENCES — the
    tokenizer-budget question ("how many types cover 95% of the
    corpus?"). One row per target:
    (coverage, vocab_needed, vocab_share, occ_share).

    Composes BOTH partition-parallel order-statistics kernels over the
    same checkpointed count table: descending ranks from
    ``global_ranks`` and top-of-distribution cumulative mass from
    ``global_prefix_sums`` (top-r sum = T − ascending exclusive
    prefix, so no descending pass is needed); no global sort anywhere.
    The threshold compare is (integer cumulative) ≥ (target × integer
    total) — one double product, identical cross-engine; within a
    count-tie block the cumulative values are permutation-invariant,
    and both engines pin the same (count, token) total order anyway.
    ``occ_share`` reports the exact share the chosen vocab covers
    (≥ the target — the curve is a step function).
    """
    from cuda_gis_smoothing_spark.functions.numeric import round6
    from cuda_gis_smoothing_spark.plans.partitioning import (
        global_prefix_sums,
        global_ranks,
    )

    counts = (
        df.select(F.explode(tokens_col(text_col)).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()
    )
    tot = counts.agg(
        F.count(F.lit(1)).alias("_v"), F.sum("_c").alias("_T")
    )
    ranked = global_ranks(counts, ["_c", "t"], out_col="_r", boundaries="quantile")
    pre = global_prefix_sums(
        counts, ["_c", "t"], "_c", out_col="_p", boundaries="quantile"
    ).select("t", "_p")
    cov = F.explode(
        F.array(*[F.lit(float(c)) for c in coverages])
    ).alias("coverage")
    rows = (
        ranked.join(pre, "t")
        .crossJoin(F.broadcast(tot))
        .select(
            (F.col("_v") - F.col("_r") + 1).alias("_rd"),
            (F.col("_T") - F.col("_p")).alias("_topcum"),
            "_v",
            "_T",
            cov,
        )
    )
    hit = rows.where(F.col("_topcum") >= F.col("coverage") * F.col("_T"))
    # _topcum is strictly increasing in rank_desc (counts ≥ 1), so the
    # first qualifying rank's mass is the MIN _topcum among qualifiers
    return (
        hit.groupBy("coverage")
        .agg(
            F.min("_rd").cast("long").alias("vocab_needed"),
            F.min("_topcum").alias("_occ"),
            F.max("_v").alias("_vv"),
            F.max("_T").alias("_TT"),
        )
        .select(
            round6(F.col("coverage")).alias("coverage"),
            "vocab_needed",
            round6(F.col("vocab_needed") / F.col("_vv")).alias("vocab_share"),
            round6(F.col("_occ") / F.col("_TT")).alias("occ_share"),
        )
    )


def vocab_coverage_sql(coverages: tuple[float, ...] = VOCAB_COVERAGES) -> str:
    """DuckDB twin of :func:`vocab_coverage` — the (c DESC, t DESC)
    window order matches the Spark side's V − asc_rank + 1 exactly."""
    from cuda_gis_smoothing_spark.functions.numeric import flit

    covs = ", ".join(flit(float(c)) for c in coverages)
    return f"""
WITH occ AS (
  SELECT t FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> ''
),
c AS (SELECT t, COUNT(*) AS c FROM occ GROUP BY t),
tot AS (SELECT COUNT(*) AS v, SUM(c) AS T FROM c),
r AS (
  SELECT ROW_NUMBER() OVER (ORDER BY c.c DESC, c.t DESC) AS rd,
         SUM(c.c) OVER (ORDER BY c.c DESC, c.t DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS topcum
  FROM c
),
cov AS (SELECT unnest([{covs}]) AS coverage),
hit AS (
  SELECT cov.coverage, r.rd, r.topcum, tot.v, tot.T
  FROM r, cov, tot
  WHERE r.topcum >= cov.coverage * tot.T
)
SELECT ROUND(coverage + 1e-09, 6) AS coverage,
       CAST(MIN(rd) AS BIGINT) AS vocab_needed,
       ROUND(MIN(rd) * 1.0 / MAX(v) + 1e-09, 6) AS vocab_share,
       ROUND(MIN(topcum) * 1.0 / MAX(T) + 1e-09, 6) AS occ_share
FROM hit GROUP BY coverage
""".strip()


#: DuckDB CTE chain ``occ → tf → dfr → n → vec`` producing the exact
#: :func:`doc_tfidf` sparse vectors — ONE definition shared by the
#: doc_tfidf / doc_tfidf_maintained twins and the tfidf_topk retrieval
#: twin so the weighting can never drift between them.
TFIDF_VEC_CTES = """occ AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> ''
),
tf AS (SELECT doc_id, t AS token, COUNT(*) AS tf FROM occ GROUP BY 1, 2),
dfr AS (SELECT token, COUNT(*) * 1.0 AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) * 1.0 AS N FROM documents WHERE text IS NOT NULL),
vec AS (
  SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf,
         ROUND(tf.tf * ln(1.0 + (n.N - dfr.df + 0.5) / (dfr.df + 0.5)) + 1e-09, 6) AS tfidf
  FROM tf JOIN dfr USING (token), n
)"""


def doc_compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Compressibility quality signal (the Gopher/FineWeb heuristic):
    deflate-compressed size over raw UTF-8 size — near-zero ratios are
    templated/repetitive text, near-1 ratios are noise; real pipelines
    threshold both tails. Output: (doc_id, n_chars, compression_ratio)
    with NULL ratio for NULL/empty text.

    ROWS-ONLY gate BY DESIGN: zlib is not expressible in DuckDB SQL,
    so there is no twin — correctness is pytest-gated by a pure-Python
    zlib differential (deterministic: zlib at a fixed level is
    bit-stable across platforms/versions for the same input, and the
    ratio is rounded on the same round6 grid as everything else).

    This is ALSO the repo's one deliberate text-side Python UDF: a
    vectorized ``pandas_udf`` over Arrow batches (never row-at-a-time
    — the ~10-100× rule), the pattern to copy when a signal genuinely
    cannot be a Catalyst expression. Plan: a pure projection — no
    shuffle, scales embarrassingly."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _ratio(s):
        import zlib

        def f(t):
            if t is None:
                return None
            b = t.encode("utf-8")
            if not b:
                return None
            return round(len(zlib.compress(b, 6)) / len(b) + 1e-09, 6)

        return s.map(f)

    # `from __future__ import annotations` stringifies closure type
    # hints, which pandas_udf cannot resolve — attach live objects
    # (the CLAUDE.md pandas_udf annotations quirk)
    _ratio.__annotations__ = {"s": pd.Series, "return": pd.Series}
    ratio = pandas_udf(_ratio, "double")
    return df.select(
        id_col,
        F.length(text_col).cast("long").alias("n_chars"),
        ratio(F.col(text_col)).alias("compression_ratio"),
    )


def quality_mannwhitney(
    df: DataFrame, source_a: str = "src0", source_b: str = "src1"
) -> DataFrame:
    """Mann–Whitney U rank-sum test between two sources' quality
    scores — the nonparametric two-sample A/B test beside χ²'s
    categorical independence. Ranks run over DISTINCT round6 quality
    values (a total-order window over value cardinality — the
    doc_skyline shape; tie groups take the average rank), and EVERY
    aggregate is an INTEGER: doubled rank-sums 2R = Σ tₐ·(2p+t+1) and
    the tie-correction cubes Σ(t³−t) — no float ever accumulates
    cross-engine; u/μ/σ²/z are single float expressions over those
    exact integers (shape-identical in the twin), with NULLIF guards
    where Spark ANSI would raise on /0 (zero variance, N ≤ 1).
    Output 1 row ``(n_a, n_b, u_a, z)``; u_a counts (a, b) pairs where
    a ranks higher (+ half-ties).

    Int bounds (the CLAUDE.md overflow invariant — DuckDB raises
    rather than silently wrapping): tie cubes cap N at ~1.6M compared
    rows per test; shard larger corpora per test stratum."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.functions.numeric import round6

    # source rides the SAME per-row projection as the features — ONE
    # scan, zero joins (quality_features + a doc_id re-join would
    # re-scan the corpus and shuffle; review catch)
    both = (
        df.where(F.col("source").isin([source_a, source_b]))
        .select("source", *quality_feature_cols("text"))
        .withColumn("v", quality_score_col())
        .where(F.col("v").isNotNull())
        .select("source", "v")
    )
    pv = both.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum((F.col("source") == source_a).cast("long"))
        .cast("long")
        .alias("ta"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wr = pv.withColumn("p", F.coalesce(F.sum("t").over(w), F.lit(0)))
    ag = wr.agg(
        F.sum("ta").cast("long").alias("n1"),
        F.sum(F.col("t") - F.col("ta")).cast("long").alias("n2"),
        F.sum(F.col("ta") * (2 * F.col("p") + F.col("t") + 1))
        .cast("long")
        .alias("r2a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("ties"),
    )
    derived = ag.select(
        "n1",
        "n2",
        F.expr("CAST(r2a - n1 * (n1 + 1) AS DOUBLE) / 2.0").alias("_u"),
        F.expr("CAST(n1 * n2 AS DOUBLE) / 2.0").alias("_mu"),
        F.expr(
            "(CAST(n1 * n2 AS DOUBLE) / 12.0) * ((n1 + n2 + 1)"
            " - CAST(ties AS DOUBLE)"
            " / NULLIF(CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1), 0.0))"
        ).alias("_var"),
    )
    return derived.select(
        F.col("n1").alias("n_a"),
        F.col("n2").alias("n_b"),
        round6(F.col("_u")).alias("u_a"),
        round6(
            (F.col("_u") - F.col("_mu"))
            / F.sqrt(F.expr("NULLIF(GREATEST(_var, 0.0), 0.0)"))
        ).alias("z"),
    )


def quality_mannwhitney_sql(
    source_a: str = "src0", source_b: str = "src1"
) -> str:
    """DuckDB twin of :func:`quality_mannwhitney` — same integer rank
    machinery, shape-identical float tail (built over the shared
    doc_quality CTE, spliced by the caller)."""
    return f"""
bv AS (
  SELECT d.source, q.quality_score AS v
  FROM q JOIN documents d USING (doc_id)
  WHERE d.source IN ('{source_a}', '{source_b}') AND q.quality_score IS NOT NULL
),
pv AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(CASE WHEN source = '{source_a}' THEN 1 ELSE 0 END) AS BIGINT) AS ta
  FROM bv GROUP BY 1
),
wr AS (
  SELECT v, t, ta,
         COALESCE(CAST(SUM(t) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS p
  FROM pv
),
ag AS (
  SELECT CAST(SUM(ta) AS BIGINT) AS n1,
         CAST(SUM(t - ta) AS BIGINT) AS n2,
         CAST(SUM(ta * (2 * p + t + 1)) AS BIGINT) AS r2a,
         CAST(SUM(t * t * t - t) AS BIGINT) AS ties
  FROM wr
),
dv AS (
  SELECT n1, n2,
         CAST(r2a - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u,
         CAST(n1 * n2 AS DOUBLE) / 2.0 AS mu,
         (CAST(n1 * n2 AS DOUBLE) / 12.0) * ((n1 + n2 + 1)
           - CAST(ties AS DOUBLE)
           / NULLIF(CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1), 0.0)) AS var
  FROM ag
)
SELECT n1 AS n_a, n2 AS n_b,
       ROUND(u + 1e-09, 6) AS u_a,
       ROUND((u - mu) / SQRT(NULLIF(GREATEST(var, 0.0), 0.0)) + 1e-09, 6) AS z
FROM dv
""".strip()


# Automated Readability Index constants (Senter & Smith 1967) — the
# syllable-free readability formula, so the whole data path is integer
# counts + one literal-folded linear combination (zero libm)
ARI_CHARS = 4.71
ARI_WORDS = 0.5
ARI_BIAS = -21.43


def doc_readability(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document readability card via the Automated Readability
    Index: ARI = 4.71·(chars/words) + 0.5·(words/sentences) − 21.43 —
    chosen over Flesch BECAUSE it needs no syllable counting, so the
    data path is three integer counts (alnum chars via one
    regexp_replace, words via the shared tokenizer, sentences via
    terminator-character counting with translate — both exact string
    ops) and a literal-folded linear combo of two integer ratios
    (every op correctly rounded on identical inputs — the
    axis_visibility identical-expression-shape class). Terminator-free
    docs count as ONE sentence; wordless/NULL docs get no row (the
    signature-operator contract). Output ``(doc_id, n_alnum_chars,
    n_words, n_sentences, avg_word_len, words_per_sentence, ari)``.

    Plan (100 TB): pure per-row expressions — one scan, ZERO shuffles;
    streaming-legal by construction."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    low = F.lower(F.col(text_col))
    words = F.filter(F.split(low, " "), lambda x: x != "")
    n_words = F.size(words).cast("long")
    n_chars = F.length(F.regexp_replace(low, "[^a-z0-9]", "")).cast("long")
    n_sent = F.greatest(
        (F.length(low) - F.length(F.translate(low, ".!?", ""))).cast("long"),
        F.lit(1).cast("long"),
    )
    cw = n_chars.cast("double") / n_words.cast("double")
    ws = n_words.cast("double") / n_sent.cast("double")
    ari = F.lit(ARI_CHARS) * cw + F.lit(ARI_WORDS) * ws + F.lit(ARI_BIAS)
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            n_chars.alias("n_alnum_chars"),
            n_words.alias("n_words"),
            n_sent.alias("n_sentences"),
            round6(cw).alias("avg_word_len"),
            round6(ws).alias("words_per_sentence"),
            round6(ari).alias("ari"),
        )
        .where(F.col("n_words") > 0)
    )


def doc_readability_sql() -> str:
    """DuckDB twin of :func:`doc_readability` — identical counts and
    literal-folded linear combination (flit doubles; DuckDB
    regexp_replace needs the explicit 'g' flag — the dedup_normalized
    lesson)."""
    from cuda_gis_smoothing_spark.functions.numeric import flit, round6_sql

    return f"""
WITH rb AS (
  SELECT doc_id,
         CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS n_alnum_chars,
         CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS BIGINT) AS n_words,
         GREATEST(CAST(length(lower(text)) - length(translate(lower(text), '.!?', '')) AS BIGINT),
                  CAST(1 AS BIGINT)) AS n_sentences
  FROM documents
  WHERE text IS NOT NULL
)
SELECT doc_id, n_alnum_chars, n_words, n_sentences,
       {round6_sql("CAST(n_alnum_chars AS DOUBLE) / CAST(n_words AS DOUBLE)")} AS avg_word_len,
       {round6_sql("CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)")} AS words_per_sentence,
       {round6_sql(f"{flit(ARI_CHARS)} * (CAST(n_alnum_chars AS DOUBLE) / CAST(n_words AS DOUBLE)) + {flit(ARI_WORDS)} * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) + {flit(ARI_BIAS)}")} AS ari
FROM rb
WHERE n_words > 0
""".strip()
