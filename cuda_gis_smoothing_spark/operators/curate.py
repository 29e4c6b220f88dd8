"""End-to-end corpus curation: the composed training-data pipeline.

One operator chaining the steps every LLM-corpus build runs — language
ID -> quality filter -> exact dedup -> LSH-candidate near-dup drop ->
deterministic sample — each stage the repo's gated primitive, composed
so the WHOLE pipeline is driver-gated against a single DuckDB twin
(__spark_entry__.oracle_sql()["curate_corpus"]).

Scale shape (100 TB): stages 1-2 are pure Catalyst projections +
filters (pushdown-friendly, no shuffle); exact dedup is one groupBy on
md5 + a semi-join; near-dup candidates come from the MinHash-LSH band
equi-join (never all-pairs) and are verified with an exact
token-intersection join bounded by the candidate set; the final sample
is a single hash filter. Every shuffle key is either a digest, a band
bucket, or a doc id — uniformly distributed, no skew levers needed.

Near-dup semantics (documented, deliberately simple): drop any doc
that VERIFIES jaccard >= threshold against a SMALLER surviving doc,
whether or not that smaller doc is itself dropped — monotone and
SQL-expressible (transitive canonicalization is neardup_components'
job, not curation's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cuda_gis_smoothing_spark.functions.numeric import round6
from cuda_gis_smoothing_spark.operators.dedup import (
    lsh_blocked_neardup_drops,
    shingles_expr,
    verified_jaccard_pairs,
)
from cuda_gis_smoothing_spark.operators.sampling import deterministic_sample

CURATE_LANG = "en"
CURATE_MIN_QUALITY = 0.5
CURATE_NEARDUP_J = 0.9
CURATE_SAMPLE_F = 0.8

# strict-pipeline thresholds (chosen non-vacuous on the fixture:
# dup_token_ratio p80 ~= 0.66, survivor span coverage p90 ~= 0.30)
CURATE_MAX_DUP_RATIO = 0.65
CURATE_MAX_SPAN_COV = 0.25
CURATE_SPAN_GRAM = 4


def contamination_report(
    docs: DataFrame,
    bench_source: str = "src0",
    k: int = 4,
    id_col: str = "doc_id",
    hash_shingles: bool = False,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Pile k-gram method): flag
    every training doc sharing at least one k-token shingle with the
    held-out benchmark partition, with the overlap count.

    Output: (doc_id, n_contaminated_shingles) for contaminated docs.
    Plan: shingle explode (pure Catalyst transform/slice — no UDF) →
    distinct → one equi-join on the shingle. ``hash_shingles=True`` is
    the 100 TB path: the distinct/join shuffle keys become
    ``xxhash64(shingle)`` (8 bytes instead of a k-token string —
    engine-private hash, fine because it never leaves the plan); the
    driver gate runs the raw-string form so the DuckDB twin is
    byte-identical, and a pytest asserts both paths agree. The
    benchmark side is tiny and broadcasts. Real pipelines use k=8..13;
    the fixture's ~40-word vocabulary needs k=4 for a non-vacuous gate
    (documented, not hidden).

    Engine note: Spark's ``sequence(1, 0)`` DESCENDS ([1, 0]) while
    DuckDB's ``generate_series(1, 0)`` is empty — docs shorter than k
    are filtered explicitly on the Spark side to keep the twins equal.
    """
    bench, train = _shingle_tables(
        docs, bench_source, k, id_col, hash_shingles=hash_shingles
    )
    return (
        train.join(bench, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
    )


def _shingle_tables(
    docs: DataFrame,
    bench_source: str,
    k: int,
    id_col: str = "doc_id",
    hash_shingles: bool = False,
):
    """The ONE benchmark/training shingle-table builder shared by the
    decontamination family (report, exact filter, bloom prefilter —
    the drift-prevention class). Returns ``(bench, train)``: distinct
    benchmark shingles and distinct (id, shingle) training rows."""
    toks = F.split(F.lower(F.col("text")), " ")
    shingles = shingles_expr(k)
    shingle_key = (
        F.xxhash64(F.col("_shingle")) if hash_shingles else F.col("_shingle")
    )
    sh = (
        docs.select(id_col, "source", toks.alias("_toks"))
        .where(F.size("_toks") >= k)
        .select(id_col, "source", F.explode(shingles).alias("_shingle"))
        .select(id_col, "source", shingle_key.alias("shingle"))
    )
    bench = (
        sh.where(F.col("source") == bench_source).select("shingle").distinct()
    )
    train = (
        sh.where(F.col("source") != bench_source)
        .select(id_col, "shingle")
        .distinct()
    )
    return bench, train


def repetition_signals_expr(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Pure-expression variant of :func:`repetition_signals`: identical
    output columns, computed per row with array higher-order functions
    — ZERO shuffles and streaming-legal (a stateless projection, usable
    upstream of ``applyInPandasWithState`` where an aggregation is
    illegal — the streaming/minhash lesson).

    Trade (documented, measured by construction): the top-gram counts
    are O(distinct × n) per row vs the agg variant's shuffled
    O(n); right for bounded-length docs (web pages), wrong for a
    single 10⁹-token document — the agg variant distributes WITHIN a
    doc, this one does not. Equality with the agg variant is
    pytest-gated (including NULL-text rows, which BOTH variants drop —
    the agg's explode drops them implicitly, this one filters
    explicitly). Duplicate ``id_col`` values are outside the contract:
    the agg variant would merge them into one group, this one emits
    one row per input row.
    """
    docs = docs.where(F.col("text").isNotNull())
    toks = F.split(F.lower(F.col("text")), " ")
    bigrams = F.expr(
        "slice(transform(sequence(1, greatest(size(_toks) - 1, 1)), "
        "i -> concat(try_element_at(_toks, i), ' ', try_element_at(_toks, i + 1))), "
        "1, greatest(size(_toks) - 1, 0))"
    )

    def top_count(arr: str) -> F.Column:
        return F.expr(
            f"array_max(transform(array_distinct({arr}), "
            f"t -> size(filter({arr}, x -> x = t))))"
        )

    staged = docs.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "_bigs", bigrams
    )
    n = F.size("_toks").cast("long")
    d = F.size(F.array_distinct("_toks")).cast("long")
    nb = F.size("_bigs").cast("long")
    db = F.size(F.array_distinct("_bigs")).cast("long")
    return staged.select(
        id_col,
        n.alias("n_tokens"),
        d.alias("distinct_tokens"),
        round6(1.0 - d / n).alias("dup_token_ratio"),
        round6(top_count("_toks") / n).alias("top_token_frac"),
        nb.alias("n_bigrams"),
        db.alias("distinct_bigrams"),
        F.when(nb > 0, round6(top_count("_bigs") / nb)).alias(
            "top_bigram_frac"
        ),
    )


def repetition_signals(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al.
    2021's repetition filters, the token/bigram subset): per doc, the
    duplicate-token mass, the most-frequent-token share and the
    most-frequent-bigram share — the quality features that catch
    boilerplate and degenerate generations that length/punct ratios
    miss.

    Output: ``(doc_id, n_tokens, distinct_tokens, dup_token_ratio,
    top_token_frac, n_bigrams, distinct_bigrams, top_bigram_frac)``;
    ``top_bigram_frac`` is NULL for docs with < 2 tokens.

    Plan (one corpus scan, two hash aggregations, no joins): tokens and
    bigrams are built as ONE array of (kind, gram) structs per doc —
    bigrams via ``try_element_at`` over a 1-based index sequence,
    slice-guarded so single-token docs yield an empty array (Spark's
    ``sequence(1, 0)`` DESCENDS, and ANSI ``element_at`` raises
    out-of-bounds; both traps documented in CLAUDE.md) — then a single
    explode → groupBy(doc, kind, gram) → groupBy(doc, kind) →
    conditional-agg pivot. Both aggregations partial-combine map-side;
    the only shuffle key is (doc_id, kind, gram): uniformly
    distributed, per-group size bounded by document length. At 100 TB
    this is embarrassingly parallel per document.
    """
    toks = F.split(F.lower(F.col("text")), " ")
    tok_structs = F.expr(
        "transform(_toks, t -> named_struct('kind', 'tok', 'g', t))"
    )
    bigram_structs = F.expr(
        "slice(transform(sequence(1, greatest(size(_toks) - 1, 1)), "
        "i -> named_struct('kind', 'big', 'g', "
        "concat(try_element_at(_toks, i), ' ', try_element_at(_toks, i + 1)))), "
        "1, greatest(size(_toks) - 1, 0))"
    )
    grams = (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .select(id_col, F.explode(F.concat(tok_structs, bigram_structs)).alias("_s"))
        .select(id_col, F.col("_s.kind").alias("_kind"), F.col("_s.g").alias("_g"))
    )
    counts = grams.groupBy(id_col, "_kind", "_g").agg(
        F.count(F.lit(1)).alias("_c")
    )
    per_kind = counts.groupBy(id_col, "_kind").agg(
        F.sum("_c").alias("_n"),
        F.count(F.lit(1)).alias("_d"),
        F.max("_c").alias("_top"),
    )

    def _k(kind: str, col: str):
        return F.sum(F.when(F.col("_kind") == kind, F.col(col)))

    return per_kind.groupBy(id_col).agg(
        _k("tok", "_n").cast("long").alias("n_tokens"),
        _k("tok", "_d").cast("long").alias("distinct_tokens"),
        round6(1.0 - _k("tok", "_d") / _k("tok", "_n")).alias("dup_token_ratio"),
        round6(_k("tok", "_top") / _k("tok", "_n")).alias("top_token_frac"),
        F.coalesce(_k("big", "_n"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(_k("big", "_d"), F.lit(0)).cast("long").alias("distinct_bigrams"),
        round6(_k("big", "_top") / _k("big", "_n")).alias("top_bigram_frac"),
    )


def source_overlap(
    docs: DataFrame, k: int = 5, hash_shingles: bool = False
) -> DataFrame:
    """Pairwise cross-source k-gram overlap matrix — the dataset-audit
    report that quantifies how much two ingestion sources share
    (mirrored crawls, cross-posted content) BEFORE committing to a
    training mix. Same k-gram machinery as :func:`contamination_report`
    but symmetric over all source pairs, with the overlap normalised to
    a Jaccard.

    Output: ``(source_a, source_b, shared_shingles, overlap_jaccard)``
    for pairs sharing >= 1 distinct k-token shingle, with
    ``source_a < source_b``.

    Plan: distinct (source, shingle) → self equi-join on the shingle
    (Catalyst plans the ``<`` as a post-join filter on a hash join) →
    one aggregation keyed on the source pair; per-source shingle
    vocabularies join back via broadcast (#sources rows). Per-shingle
    join fan-out is bounded by #sources² regardless of corpus size —
    no hot-key hazard. ``hash_shingles=True`` is the 100 TB path
    (8-byte xxhash64 shuffle keys, engine-private; gate runs the
    raw-string form so the DuckDB twin is byte-identical).
    """
    toks = F.split(F.lower(F.col("text")), " ")
    shingles = shingles_expr(k)
    shingle_key = (
        F.xxhash64(F.col("_shingle")) if hash_shingles else F.col("_shingle")
    )
    sh = (
        docs.select("source", toks.alias("_toks"))
        .where(F.size("_toks") >= k)
        .select("source", F.explode(shingles).alias("_shingle"))
        .select("source", shingle_key.alias("shingle"))
        .distinct()
    )
    # the distinct shingle table feeds FOUR pruned consumers (both
    # self-join sides + both per-source size joins) — unmaterialized
    # that is 8 corpus scans (measured; ReuseExchange can't dedup
    # them). Materialize once: this IS the table the audit stages.
    sh = sh.localCheckpoint()
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("_n"))
    pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    sizes_a = sizes.select(
        F.col("source").alias("source_a"), F.col("_n").alias("_na")
    )
    sizes_b = sizes.select(
        F.col("source").alias("source_b"), F.col("_n").alias("_nb")
    )
    return (
        pairs.join(F.broadcast(sizes_a), "source_a")
        .join(F.broadcast(sizes_b), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_shingles",
            round6(
                F.col("shared_shingles")
                / (F.col("_na") + F.col("_nb") - F.col("shared_shingles"))
            ).alias("overlap_jaccard"),
        )
    )


def _with_quality_and_lang(docs: DataFrame, *keep: str) -> DataFrame:
    """(keep..., n_tokens, quality_score, pred_lang) in one scan with
    ZERO joins — quality features and language id are pure per-row
    functions, so deriving them through separate operator calls
    re-scans the text column once per feature set and shuffles twice to
    re-join on doc_id (the plan the gate operators keep for their own
    outputs). Two chained projections, not one: the expensive regexp
    hit counts land in named columns first and the language argmax
    folds over the COLUMN REFS (see pred_lang_from_hits — inlining the
    regexps into the fold re-evaluates them per fold level, measured
    2.5x slower). Join-free; plan-asserted in tests/test_plans.py."""
    from cuda_gis_smoothing_spark.functions.text import (
        STOPWORDS,
        pred_lang_from_hits,
        quality_feature_cols,
        quality_score_col,
        stopword_hits_col,
    )

    langs = sorted(STOPWORDS)
    hits = [
        stopword_hits_col("text", lang).cast("long").alias(f"_hits_{lang}")
        for lang in langs
    ]
    staged = docs.select(*keep, *quality_feature_cols("text"), *hits)
    feature_names = [
        c for c in staged.columns if c not in keep and not c.startswith("_hits_")
    ]
    return staged.select(
        *keep,
        *feature_names,
        pred_lang_from_hits(lambda lang: F.col(f"_hits_{lang}")).alias(
            "pred_lang"
        ),
    ).withColumn("quality_score", quality_score_col())


def source_stats(docs: DataFrame) -> DataFrame:
    """Per-source corpus report: doc count, token mass, mean quality,
    english share — the table a dataset card is built from. One
    projection + one hash aggregation keyed on the (low-cardinality)
    source; no joins."""
    joined = _with_quality_and_lang(docs, "doc_id", "source")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        round6(F.avg("quality_score")).alias("avg_quality"),
        F.sum((F.col("pred_lang") == "en").cast("long")).alias("n_english"),
    )


#: PII detector patterns — deliberately restricted to the RE2 ∩ Java
#: common subset (character classes + unbounded reps, no lookaround, no
#: anchors: these are SEARCH patterns under rlike/regexp_matches, so
#: the Java-'$'-before-trailing-newline divergence class cannot bind).
#: Matched against lower(text) in BOTH engines. No single quotes (the
#: patterns are interpolated into the twin SQL).
PII_PATTERNS = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+",
    "long_digits": r"[0-9]{9}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def pii_scan_report(
    docs: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source PII exposure audit — the pre-release compliance card
    of a training-data pipeline (the integrity_report sibling for the
    corpus): per source, how many docs contain an email shape, a 9+
    digit run, or an SSN shape, plus the any-detector union. Counts
    only (the audit LOCATES exposure; redaction is a downstream
    transform). NULL-text docs count toward n_docs and no detector
    (three-valued rlike NULL → explicit coalesce to 0 on both sides).

    Plan (100 TB): one projection evaluating each regex ONCE into a
    named column (the CollapseProject lesson — never inline a regex
    into a multi-reference fold) + one hash aggregate keyed on the
    low-cardinality source. No joins, no windows."""
    flags = docs.select(
        source_col,
        *[
            F.coalesce(
                F.lower(F.col(text_col)).rlike(p), F.lit(False)
            )
            .cast("long")
            .alias(f"_{k}")
            for k, p in PII_PATTERNS.items()
        ],
    )
    hit_sum = None
    for k in PII_PATTERNS:
        c = F.col(f"_{k}")
        hit_sum = c if hit_sum is None else hit_sum + c
    return flags.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *[
            F.sum(f"_{k}").cast("long").alias(f"n_{k}")
            for k in PII_PATTERNS
        ],
        F.sum((hit_sum > 0).cast("long")).cast("long").alias("n_flagged"),
    )


#: k-gram width for the novelty card (the decontamination family's k)
DOC_NOVELTY_K = 4


def doc_novelty(
    docs: DataFrame, k: int = DOC_NOVELTY_K, id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc novelty share — the dedup-ORDERING card: fraction of
    the doc's DISTINCT k-gram shingles whose corpus-FIRST occurrence
    (minimum doc id — the deterministic stand-in for ingest order) is
    this doc. A crawl re-ingest shows novelty collapsing toward 0;
    span-dedup thresholds (Lee et al.) are cuts over exactly this
    distribution. Docs with < k tokens have no shingles and no row
    (the contamination_report short-doc contract — Spark sequence(1,0)
    DESCENDS, so short docs are filtered BEFORE the explode on both
    sides). All-integer counts, one exact division under round6.

    Plan (100 TB): ONE distinct (doc, shingle) table, checkpointed
    ahead of its two differently-grouped consumers (gram-keyed min +
    doc-keyed counts — the multi-consumer class); both aggregates are
    map-side-combinable hash aggs, no windows."""
    from cuda_gis_smoothing_spark.operators.dedup import shingles_expr

    toks = F.split(F.lower(F.col("text")), " ")
    sh = (
        docs.select(id_col, toks.alias("_toks"))
        .where(F.size("_toks") >= k)
        .select(id_col, F.explode(shingles_expr(k)).alias("_shingle"))
        .distinct()
        .localCheckpoint()  # gram-keyed min + doc-keyed counts
    )
    first = sh.groupBy("_shingle").agg(F.min(id_col).alias("_first"))
    return (
        sh.join(first, "_shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("_first") == F.col(id_col)).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_novel",
            round6(F.col("n_novel") / F.col("n_shingles")).alias("novelty"),
        )
    )


def filtered_base(docs: DataFrame, lang: str, min_quality: float) -> DataFrame:
    """Stage 1-2 of curation: (doc_id, text, n_tokens, quality_score)
    for docs passing the language and quality filters — one scan, one
    projection, zero joins."""
    return (
        _with_quality_and_lang(docs, "doc_id", "text")
        .where(
            (F.col("pred_lang") == lang)
            & (F.col("quality_score") >= min_quality)
        )
        .select("doc_id", "text", "n_tokens", "quality_score")
    )


def exact_canonical(df: DataFrame) -> DataFrame:
    """Keep only each md5(text) group's canonical (smallest doc_id) row."""
    canon = df.groupBy(F.md5("text").alias("_k")).agg(
        F.min("doc_id").alias("doc_id")
    )
    return df.join(canon.select("doc_id"), "doc_id", "left_semi")


def verified_pairs(
    cand: DataFrame,
    a_docs: DataFrame,
    b_docs: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact-jaccard verification of candidate (doc_a, doc_b) pairs —
    the curation-facing name for the single shared verify kernel
    (``operators.dedup.verified_jaccard_pairs``; one arithmetic, no
    drift between the ngram gate and the curation pipelines)."""
    return verified_jaccard_pairs(cand, a_docs, b_docs, threshold)


def curate_corpus(
    docs: DataFrame,
    lang: str = CURATE_LANG,
    min_quality: float = CURATE_MIN_QUALITY,
    neardup_jaccard: float = CURATE_NEARDUP_J,
    sample_fraction: float = CURATE_SAMPLE_F,
    n_hashes: int = 6,
    bands: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Returns the curated corpus as (doc_id, n_tokens, quality_score)."""
    base = filtered_base(docs, lang, min_quality)
    kept = exact_canonical(base)
    # `kept` feeds the band keys, the verify arrays and the final
    # projection — many scans of the docs table in the unmaterialized
    # plan. Materialize the filtered survivors ONCE (measured 25 s ->
    # single-scan at sf0.1; on a real cluster stage this to a table /
    # reliable checkpoint instead)
    kept = kept.localCheckpoint()

    # near-dup drop: LSH band candidates + exact-jaccard verify, FUSED
    # per band bucket through the blocked-triangle equi-join so a
    # pathological self-similar bucket bounds per-task work at
    # ~(K/n_blocks)^2 pairs (see lsh_blocked_neardup_drops)
    dropped = lsh_blocked_neardup_drops(
        kept,
        neardup_jaccard,
        n_hashes=n_hashes,
        bands=bands,
        n_blocks=n_blocks,
    )
    survivors = kept.join(dropped, "doc_id", "left_anti")
    return deterministic_sample(survivors, sample_fraction).select(
        "doc_id", "n_tokens", "quality_score"
    )


def curate_corpus_strict(
    docs: DataFrame,
    lang: str = CURATE_LANG,
    min_quality: float = CURATE_MIN_QUALITY,
    max_dup_ratio: float = CURATE_MAX_DUP_RATIO,
    max_span_coverage: float = CURATE_MAX_SPAN_COV,
    gram_len: int = CURATE_SPAN_GRAM,
    sample_fraction: float = CURATE_SAMPLE_F,
) -> DataFrame:
    """The strict curation pipeline: :func:`curate_corpus`'s chain with
    the round-3 signals swapped in — language -> quality ->
    WITHIN-doc repetition filter (Gopher) -> exact dedup ->
    CROSS-doc span-coverage drop (substring-dedup semantics) ->
    deterministic sample. Returns (doc_id, n_tokens, quality_score).

    Differences from curate_corpus, deliberately: repetition replaces
    nothing (it is a new per-doc filter: boilerplate/degenerate text
    the length/punct features miss), and the near-dup drop criterion is
    span COVERAGE (fraction of tokens inside maximal shared runs
    against any other survivor) instead of whole-doc jaccard — the
    policy that also catches partial copies. Stage order note: the
    repetition filter commutes with exact dedup (identical text =>
    identical signals), so running it first only shrinks the dedup
    input.

    Scale shape: stages 1-3 are per-doc projections/aggregations (the
    repetition signals shuffle on (doc, gram) only); survivors are
    localCheckpoint'ed ONCE before the pair stage (the curate_corpus
    lesson — the span join otherwise re-derives the whole filter chain
    per branch); the span stage inherits duplicate_spans' bounded
    equi-join shape; the sample is one hash filter.
    """
    from cuda_gis_smoothing_spark.operators.dedup import span_coverage

    base = filtered_base(docs, lang, min_quality)
    # repetition filter as an INLINE expression — the exact-equal
    # pure-expression form of dup_token_ratio (repetition_signals_expr;
    # equality pytest-gated), so stages 1-3 stay join- and shuffle-free
    # instead of paying the agg variant's two shuffles plus a semi-join
    toks = F.split(F.lower(F.col("text")), " ")
    dup_ratio = round6(
        1.0 - F.size(F.array_distinct(toks)) / F.size(toks)
    )
    kept = exact_canonical(base.where(dup_ratio <= max_dup_ratio))
    kept = kept.localCheckpoint()

    cov = span_coverage(kept, gram_len=gram_len)
    drops = cov.where(F.col("coverage") > max_span_coverage).select("doc_id")
    survivors = kept.join(drops, "doc_id", "left_anti")
    return deterministic_sample(survivors, sample_fraction).select(
        "doc_id", "n_tokens", "quality_score"
    )


def cross_source_dups(docs: DataFrame, key: str = "tokenset") -> DataFrame:
    """Cross-source duplication audit: for every source pair, how many
    DISTINCT duplicate keys appear in both —
    ``(source_a, source_b, n_shared_texts)`` with
    ``source_a < source_b`` — the provenance-overlap table a dedup or
    licensing review reads before deciding drop priority between
    sources (:func:`source_overlap` is the fuzzy k-gram form; this is
    the digest form, far cheaper: one hash per doc, not shingles).

    ``key``: "tokenset" (default) digests the sorted distinct token
    set (the :func:`operators.dedup.tokenset_dedup` normalization —
    catches word-order shuffles, which is how near-copies actually
    cross crawls/sources; on the gate fixture raw-text dups never
    span sources, measured, so the exact key would gate a vacuous
    empty table); "exact" digests the raw text.

    Plan: one distinct (source, digest) projection, self-joined on the
    digest — per-digest fan-out bounded by the #sources carrying it
    (≤ #sources², never doc-cardinality), then a tiny pair-keyed agg.
    """
    if key == "tokenset":
        kexpr = F.md5(
            F.array_join(
                F.array_sort(
                    F.array_distinct(F.split(F.lower(F.col("text")), " "))
                ),
                " ",
            )
        )
    elif key == "exact":
        kexpr = F.md5("text")
    else:
        raise ValueError(f"unknown key mode {key!r}")
    sd = (
        docs.where(F.col("text").isNotNull())
        .select("source", kexpr.alias("_k"))
        .distinct()
    )
    a = sd.select(F.col("source").alias("source_a"), "_k")
    b = sd.select(F.col("source").alias("source_b"), "_k")
    return (
        a.join(b, "_k")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_texts"))
    )


def decontaminated_corpus(
    docs: DataFrame, bench_source: str = "src0", k: int = 4
) -> DataFrame:
    """Benchmark decontamination as a PIPELINE stage (the filter form
    of :func:`contamination_report`, which is the audit form): every
    training doc sharing ≥ 1 k-token shingle with the held-out
    benchmark partition is DROPPED; output is the surviving training
    corpus ``(doc_id, source, n_tokens)``. The GPT-3/Pile k-gram
    method applied the way a corpus build actually consumes it — one
    anti-join over the same shingle equi-join the report uses."""
    contam = contamination_report(docs, bench_source=bench_source, k=k).select(
        "doc_id"
    )
    n_tokens = F.size(F.split(F.lower(F.col("text")), " ")).cast("long")
    return (
        docs.where(F.col("source") != bench_source)
        .join(contam, "doc_id", "left_anti")
        .select("doc_id", "source", n_tokens.alias("n_tokens"))
    )


#: Bloom prefilter sizing: 2^16 bits (1024 packed longs, 8 KB
#: broadcast) x 2 probes — benchmark sets are small by definition, so
#: the false-positive rate stays low and every FP is removed by the
#: exact verify anyway
BLOOM_BITS = 1 << 16
BLOOM_HASHES = 2


def _bloom_mask(shingles: DataFrame) -> DataFrame:
    """ONE-row ``(_mask array<long>)`` Bloom bit array over a shingle
    set: per shingle, BLOOM_HASHES indices via seeded xxhash64
    (engine-private — the mask never crosses the engine gate), packed
    into BLOOM_BITS/64 longs by bit_or, assembled in word order (a
    sort_array of (word, bits) structs — deterministic, no
    collect-to-driver). The 1-row result rides a broadcast crossJoin
    (the 1-row stats class, covered by its ungrouped aggregate)."""
    spark = shingles.sparkSession
    idx = F.array(
        *[
            F.pmod(F.xxhash64(F.col("shingle"), F.lit(i)), F.lit(BLOOM_BITS))
            for i in range(BLOOM_HASHES)
        ]
    )
    pos = shingles.select(F.explode(idx).alias("_idx")).distinct()
    packed = pos.groupBy(F.expr("_idx DIV 64").alias("_w")).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(_idx % 64 AS INT)))"
        ).alias("_bits")
    )
    return (
        spark.range(BLOOM_BITS // 64)
        .select(F.col("id").alias("_w"))
        .join(packed, "_w", "left")
        .select("_w", F.coalesce("_bits", F.lit(0)).cast("long").alias("_bits"))
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_w", "_bits"))),
                lambda s: s["_bits"],
            ).alias("_mask")
        )
    )


def bloom_candidate_shingles(
    train: DataFrame, mask: DataFrame
) -> DataFrame:
    """Training shingle rows that pass every Bloom probe against the
    broadcast 1-row ``mask`` — the map-side candidate drop. Probe
    indices are projected to NAMED columns first (the CollapseProject
    re-reference lesson), then each bit test is pure long arithmetic
    (shiftright of a negative packed word sign-extends high bits but
    moves bit b to position 0 regardless; ``& 1`` isolates it)."""
    probed = train.select(
        "*",
        *[
            F.pmod(F.xxhash64(F.col("shingle"), F.lit(i)), F.lit(BLOOM_BITS))
            .alias(f"_i{i}")
            for i in range(BLOOM_HASHES)
        ],
    ).crossJoin(F.broadcast(mask))
    cond = F.lit(True)
    for i in range(BLOOM_HASHES):
        cond = cond & F.expr(
            f"(shiftright(element_at(_mask, CAST(_i{i} DIV 64 AS INT) + 1),"
            f" CAST(_i{i} % 64 AS INT)) & 1) = 1"
        )
    return probed.where(cond).drop(
        "_mask", *[f"_i{i}" for i in range(BLOOM_HASHES)]
    )


def decontaminated_bloom(
    docs: DataFrame, bench_source: str = "src0", k: int = 4
) -> DataFrame:
    """Bloom-prefiltered decontamination — the 100 TB SCALE PATH of
    :func:`decontaminated_corpus` with IDENTICAL output (the twin is
    SHARED, the banded-variant precedent): the benchmark shingle set
    folds into an 8 KB Bloom bit array broadcast to every executor;
    training shingles probe it MAP-SIDE and only candidates reach the
    exact shingle equi-join (verify). Bloom membership has NO false
    negatives, so every genuinely shared shingle survives the
    prefilter, and the exact verify removes every false positive —
    survivors are the exact anti-join's survivors bit-for-bit. At
    100 TB the exact path shuffles the full distinct training-shingle
    table; here non-candidate grams die in the scan stage and the
    shuffle carries only the (tiny) candidate set."""
    bench, train = _shingle_tables(docs, bench_source, k)
    cand = bloom_candidate_shingles(train, _bloom_mask(bench))
    contaminated = cand.join(bench, "shingle").select("doc_id").distinct()
    n_tokens = F.size(F.split(F.lower(F.col("text")), " ")).cast("long")
    return (
        docs.where(F.col("source") != bench_source)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "source", n_tokens.alias("n_tokens"))
    )


def doc_skyline(docs: DataFrame) -> DataFrame:
    """Pareto skyline over (quality_score, n_tokens) — the classic
    dominance query (maximize both): a doc survives iff NO other doc
    is ≥ on both axes and strictly better on one. Computed WITHOUT a
    quadratic dominance join: group to per-quality max tokens (the
    corpus-scale aggregate), then one running max over the DISTINCT
    quality levels ordered DESC (distinct keys ⇒ a total order, the
    cross-engine window rule) — a doc is on the skyline iff it carries
    its level's max tokens AND beats every higher level's best. Ties
    at the same (quality, tokens) point don't dominate each other and
    are all kept. NULL-text docs are excluded symmetrically (their
    n_tokens is NULL in both engines). Output ``(doc_id,
    quality_score, n_tokens)``.

    Scale note: the window input is the |distinct quality levels|
    aggregate, not the corpus — the heavy work is the map-side-
    combinable groupBy; round6 quality is the join/group key (the
    user_rfm compare-only-rounded-values contract)."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.functions.text import quality_features

    pts = (
        quality_features(docs)
        .select("doc_id", "quality_score", F.col("n_tokens").cast("long").alias("n_tokens"))
        .where(F.col("quality_score").isNotNull() & F.col("n_tokens").isNotNull())
        .localCheckpoint()  # TWO differently-pruned consumers (per_q +
        # the final join) — the multi-consumer re-execute class
    )
    per_q = pts.groupBy("quality_score").agg(F.max("n_tokens").alias("_mt"))
    w = (
        Window.orderBy(F.col("quality_score").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = per_q.withColumn("_best_above", F.max("_mt").over(w))
    return (
        pts.join(run, "quality_score")
        .where(
            (F.col("n_tokens") == F.col("_mt"))
            & (F.col("_best_above").isNull() | (F.col("_best_above") < F.col("_mt")))
        )
        .select("doc_id", "quality_score", "n_tokens")
    )


def source_dedup_stats(docs: DataFrame) -> DataFrame:
    """Per-source duplication report: doc count, distinct-text count
    and duplicate rate — the dataset-card number a source-priority
    decision starts from (:func:`cross_source_dups` is the pairwise
    cross-source view; this is the within-source marginal). One hash
    aggregate on (source, digest) semantics via COUNT(DISTINCT);
    NULL-text rows are excluded symmetrically in both engines."""
    d = docs.where(F.col("text").isNotNull())
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
        round6(
            1.0 - F.countDistinct(F.md5("text")) / F.count(F.lit(1))
        ).alias("dup_rate"),
    )


def _overlap_affine_pairs(n: int) -> list[tuple[int, int]]:
    """Deterministic affine family ((a, b) with a odd, both < MH_PRIME)
    extending the 6 fixed MinHash pairs to arbitrary n — generated by
    fixed LCG steps so the Spark plan and the DuckDB twin interpolate
    the IDENTICAL literals. h < MH_PRIME < 2^31 keeps a*h < 2^62 (no
    overflow divergence between engines)."""
    from cuda_gis_smoothing_spark.operators.dedup import MH_PRIME

    a, b, out = 1_222_334_441, 876_543_211, []
    for _ in range(n):
        a = (a * 1_103_515_245 + 12_345) % MH_PRIME
        b = (b * 69_069 + 1) % MH_PRIME
        out.append((a | 1, b))
    return out


def source_overlap_minhash(
    docs: DataFrame, k: int = 5, n_hashes: int = 32
) -> DataFrame:
    """MinHash-estimated cross-source overlap — the 100 TB form of
    :func:`source_overlap`: instead of self-joining the distinct
    (source, shingle) table (shuffle of every shingle string), each
    source's shingle SET is reduced to an ``n_hashes``-component
    MinHash signature in ONE aggregation pass, and the pairwise
    estimate is componentwise agreement between signatures —
    ``E[n_matching / n] = exact jaccard`` (the classic MinHash
    property), with standard error ``sqrt(J(1-J)/n)``.

    Output: ``(source_a, source_b, n_matching_hashes, est_jaccard)``
    for ALL source pairs (source_a < source_b), estimate round6'd.

    Plan: shingles → portable Karp-Rabin hash → one groupBy(source)
    with n partial-combining MIN aggregates; the pair stage joins the
    #sources-row signature table against itself with an inequality —
    a broadcast nested loop over the AUDIT DIMENSION (tens of rows),
    which is exactly where a non-equi join is fine. Corpus-sized data
    is touched once and never shuffled on a string key.
    """
    from cuda_gis_smoothing_spark.operators.dedup import (
        MH_PRIME,
        token_hash_col,
    )

    toks = F.split(F.lower(F.col("text")), " ")
    shingles = shingles_expr(k)
    # NO distinct before the aggregation: MIN over a multiset equals
    # MIN over its set, so deduping the raw shingle strings would only
    # add the full string-keyed shuffle this operator exists to avoid
    sh = (
        docs.select("source", toks.alias("_toks"))
        .where(F.size("_toks") >= k)
        .select("source", F.explode(shingles).alias("_shingle"))
    )
    h = sh.select("source", token_hash_col("_shingle").alias("_h"))
    pairs = _overlap_affine_pairs(n_hashes)
    sig = h.groupBy("source").agg(
        *[
            F.min((F.col("_h") * a + b) % MH_PRIME).alias(f"_mh_{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    )
    a_side, b_side = sig.alias("a"), sig.alias("b")
    matches = sum(
        (F.col(f"a._mh_{i}") == F.col(f"b._mh_{i}")).cast("long")
        for i in range(n_hashes)
    )
    return (
        a_side.join(b_side, F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            matches.alias("n_matching_hashes"),
            round6(matches / float(n_hashes)).alias("est_jaccard"),
        )
    )


def language_confusion(docs: DataFrame) -> DataFrame:
    """Evaluation report for the heuristic language ID: the confusion
    matrix of stored ground-truth ``lang`` vs ``pred_lang``, with the
    per-cell share of the truth class — how a pipeline owner decides
    whether the stopword heuristic is good enough before filtering a
    corpus on it.

    Output: ``(lang, pred_lang, n_docs, truth_share)``. One projection
    chain + one hash aggregation on a (|langs|²)-cardinality key + a
    per-truth-class share via a broadcast-sized self-aggregate — no
    corpus-sized shuffle beyond the count itself.
    """
    base = _with_quality_and_lang(docs, "doc_id", "lang").select(
        "lang", "pred_lang"
    )
    cm = base.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = cm.groupBy("lang").agg(F.sum("n_docs").alias("_t"))
    return (
        cm.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "pred_lang",
            "n_docs",
            round6(F.col("n_docs") / F.col("_t")).alias("truth_share"),
        )
    )


def source_mixture_weights(docs: DataFrame) -> DataFrame:
    """Training-mixture sampling weights per source: the rate at which
    each source must be (down-)sampled so the surviving token mass
    approaches a UNIFORM share across sources, without upsampling
    (rate capped at 1 — repeat-epoch weighting is a trainer concern).
    The data-mixing step every multi-source pretraining pipeline runs
    between curation and packing.

    ``rate_s = min(1, (T/S) / tokens_s)`` where T is the corpus token
    total and S the number of sources; a token-free source reports
    rate 1 (nothing to drop — the zero denominator is guarded
    explicitly because Spark ANSI raises and DuckDB yields NULL on
    double division by zero). Output per source: ``n_docs``, ``tokens``,
    ``natural_share`` (tokens_s/T), ``sample_rate``, and
    ``effective_tokens`` (round6(rate)·tokens re-rounded, so both
    engines multiply the identical already-rounded double).

    Cross-engine contract: every input to every division is an exact
    int64 (token counts), so each quotient is one IEEE division of
    exact integers — bit-identical — then round6.

    Plan (100 TB): ONE scan + one source-keyed hash aggregate
    (map-side combined); the corpus totals (T, S) come from an
    unpartitioned window over the #sources-row aggregate — a separate
    ``per.agg(...)`` consumer would re-execute the corpus scan (the
    multi-consumer pruning class CLAUDE.md documents; single FileScan
    plan-asserted). Output is #sources rows."""
    from pyspark.sql import Window

    tok = docs.select(
        "source",
        F.size(F.split(F.lower(F.col("text")), " ")).cast("long").alias("_t"),
    )
    per = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("tokens"),
    )
    w = Window.partitionBy()  # #sources rows: a single-task window
    per = per.select(
        "source",
        "n_docs",
        "tokens",
        F.sum("tokens").over(w).cast("double").alias("_T"),
        F.count(F.lit(1)).over(w).cast("double").alias("_S"),
    )
    rate = F.when(F.col("tokens") == 0, F.lit(1.0)).otherwise(
        F.least(
            F.lit(1.0),
            (F.col("_T") / F.col("_S")) / F.col("tokens").cast("double"),
        )
    )
    return (
        per.select(
            "source",
            "n_docs",
            "tokens",
            round6(F.col("tokens").cast("double") / F.col("_T")).alias(
                "natural_share"
            ),
            round6(rate).alias("sample_rate"),
        )
        .select(
            "source",
            "n_docs",
            "tokens",
            "natural_share",
            "sample_rate",
            round6(F.col("sample_rate") * F.col("tokens")).alias(
                "effective_tokens"
            ),
        )
    )


SOURCE_MIXTURE_WEIGHTS_SQL = """
WITH tok AS (
  SELECT source, len(string_split(lower(text), ' ')) AS t
  FROM documents
),
per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(SUM(t), 0) AS BIGINT) AS tokens
  FROM tok GROUP BY source
),
tot AS (SELECT CAST(SUM(tokens) AS DOUBLE) AS T,
               CAST(COUNT(*) AS DOUBLE) AS S FROM per),
rated AS (
  SELECT source, n_docs, tokens,
         ROUND(CAST(tokens AS DOUBLE) / T + 1e-09, 6) AS natural_share,
         ROUND(CASE WHEN tokens = 0 THEN CAST(1.0 AS DOUBLE)
                    ELSE LEAST(CAST(1.0 AS DOUBLE),
                               (T / S) / CAST(tokens AS DOUBLE)) END
               + 1e-09, 6) AS sample_rate
  FROM per, tot
)
SELECT source, n_docs, tokens, natural_share, sample_rate,
       ROUND(sample_rate * tokens + 1e-09, 6) AS effective_tokens
FROM rated
""".strip()


def source_mixture_temperature(docs: DataFrame) -> DataFrame:
    """Temperature-scaled source sampling weights — the mT5/Pile
    standard: sample source s with probability proportional to
    ``p_s^alpha`` (p_s = natural token share), flattening the mixture
    toward uniform without :func:`source_mixture_weights`'s hard cap.
    ``alpha`` is FIXED at 0.5 by contract: sqrt is IEEE-correctly-
    rounded in both engines while a general ``POW(p, alpha)`` is the
    ≤1-ulp libm class — the one exactness-compatible temperature.

    Cross-engine normalization trick: the denominator is a SUM of
    doubles, whose association order differs between engines — so the
    per-source weight is INTEGERIZED first (``floor_stable(sqrt(tokens)
    * 1e6)``, exact int64: sqrt and the 1e6 multiply are correctly
    rounded, floor_stable absorbs the boundary) and the normalizer is
    an exact integer sum; each output weight is then ONE IEEE division
    of exact integers, round6'ed. The 1e-6 quantization moves any
    weight by < 1e-6/WS — invisible at round6 for every real corpus.
    An all-empty corpus (every source zero tokens) yields NULL weights
    via NULLIF rather than a fake uniform.

    Output per source: ``n_docs``, ``tokens``, ``natural_share``,
    ``mixture_weight`` (sums to 1 within round6 slack). Plan: same
    single-scan shape as source_mixture_weights — one source-keyed
    aggregate, both corpus totals from ONE unpartitioned window over
    the #sources-row table."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.functions.numeric import floor_stable

    tok = docs.select(
        "source",
        F.size(F.split(F.lower(F.col("text")), " ")).cast("long").alias("_t"),
    )
    per = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("tokens"),
    )
    per = per.select(
        "source",
        "n_docs",
        "tokens",
        floor_stable(F.sqrt(F.col("tokens").cast("double")) * F.lit(1e6))
        .cast("long")
        .alias("_ws"),
    )
    w = Window.partitionBy()  # #sources rows: a single-task window
    per = per.select(
        "source",
        "n_docs",
        "tokens",
        "_ws",
        F.sum("tokens").over(w).cast("double").alias("_T"),
        F.sum("_ws").over(w).cast("double").alias("_wsum"),
    )
    return per.select(
        "source",
        "n_docs",
        "tokens",
        round6(F.col("tokens").cast("double") / F.col("_T")).alias(
            "natural_share"
        ),
        round6(
            F.col("_ws").cast("double") / F.nullif(F.col("_wsum"), F.lit(0.0))
        ).alias("mixture_weight"),
    )


SOURCE_MIXTURE_TEMPERATURE_SQL = """
WITH tok AS (
  SELECT source, len(string_split(lower(text), ' ')) AS t
  FROM documents
),
per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(SUM(t), 0) AS BIGINT) AS tokens
  FROM tok GROUP BY source
),
ws AS (
  SELECT source, n_docs, tokens,
         CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE)) * 1e6 + 1e-09) AS BIGINT) AS wsc
  FROM per
),
tot AS (
  SELECT CAST(SUM(tokens) AS DOUBLE) AS T,
         CAST(SUM(wsc) AS DOUBLE) AS WS
  FROM ws
)
SELECT source, n_docs, tokens,
       ROUND(CAST(tokens AS DOUBLE) / T + 1e-09, 6) AS natural_share,
       ROUND(CAST(wsc AS DOUBLE) / NULLIF(WS, 0) + 1e-09, 6) AS mixture_weight
FROM ws, tot
""".strip()

def split_leakage_check(
    docs,
    threshold: float = CURATE_NEARDUP_J,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Train/eval leakage audit: near-duplicate pairs that CROSS the
    deterministic holdout cut — the check every training pipeline runs
    before trusting a val/test score (a train doc whose near-dup sits
    in the test split inflates eval silently; the cross-SPLIT sibling
    of contamination_report's external-benchmark check). MinHash-LSH
    candidates (the shared banded kernel, pinned parallelism) filtered
    to cross-split pairs BEFORE the exact-jaccard verify — same-split
    pairs dominate the candidate mass and are irrelevant here, so the
    verify runs on the boundary-crossing sliver only. The candidate
    table feeds two consumers (verify + split re-attach) →
    localCheckpoint (the multi-consumer class). Output
    ``(doc_a, doc_b, split_a, split_b, jaccard)``, jaccard >= threshold
    round6."""
    from pyspark.sql import functions as F

    from cuda_gis_smoothing_spark.operators.dedup import (
        minhash_lsh_pairs,
        verified_jaccard_pairs,
    )
    from cuda_gis_smoothing_spark.operators.sampling import dataset_split

    cand = minhash_lsh_pairs(docs, text_col, id_col)
    sp = dataset_split(docs, id_col)
    cross = (
        cand.join(
            sp.select(F.col(id_col).alias("doc_a"), F.col("split").alias("split_a")),
            "doc_a",
        )
        .join(
            sp.select(F.col(id_col).alias("doc_b"), F.col("split").alias("split_b")),
            "doc_b",
        )
        .where(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b")
        .localCheckpoint()  # verify + split re-attach consumers
    )
    ver = verified_jaccard_pairs(
        cross.select("doc_a", "doc_b"), docs, docs, threshold, id_col, text_col
    )
    return ver.join(cross, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "split_a", "split_b", "jaccard"
    )


#: redaction patterns — the PII_PATTERNS shapes widened to mixed case
#: (redaction runs over RAW text, detection over lower(text)); applied
#: in THIS order (emails first so digit runs inside addresses are
#:  already gone; ssn before long_digits is irrelevant — the dash
#: breaks the 9-digit run — but the order is pinned anyway)
PII_REDACT_PATTERNS = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+", "[EMAIL]"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
    ("long_digits", r"[0-9]{9}", "[NUMBER]"),
)


def pii_redact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction — the transform downstream of
    :func:`pii_scan_report`'s audit: emails / SSN shapes / 9-digit
    runs replaced with typed placeholder tokens, all other text
    byte-preserved. Three sequential global regexp_replace passes in a
    PINNED order (each pattern projected once — the CollapseProject
    lesson); the patterns stay in the RE2 ∩ Java SEARCH subset (no
    anchors, no alternation, no lookaround) so leftmost-match
    semantics agree cross-engine. NULL text stays NULL (regexp_replace
    propagates NULL in both engines). Output ``(doc_id,
    text_redacted)``.

    Plan (100 TB): pure per-row expressions — one scan, zero shuffles,
    streaming-legal."""
    out = F.col(text_col)
    for _, pat, rep in PII_REDACT_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return docs.select(id_col, out.alias("text_redacted"))


def pii_redact_sql() -> str:
    """DuckDB twin of :func:`pii_redact` — the same three global
    ('g' flag — the dedup_normalized lesson) replaces in the same
    order."""
    expr = "text"
    for _, pat, rep in PII_REDACT_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return f"SELECT doc_id, {expr} AS text_redacted FROM documents"
