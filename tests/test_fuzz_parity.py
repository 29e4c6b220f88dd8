"""Adversarial-corpus parity fuzz: run every document-family gate and
its DuckDB twin over a SYNTHETIC corpus engineered to hit the edge
cases the fixed testdata cannot — exact dups (within and across
sources), one-token near-dups, degenerate single/two-token docs,
pathological repetition, long shared spans, skewed sources, and
non-contiguous doc ids — and require the same rows/values/hashes as
the driver's gate. This is how the span_coverage tie-order flake
class would have surfaced before the driver did.

Content model stays inside the engine's target domain (ascii words,
single-space separators, ids < 2^31 so the portable affine hash
arithmetic stays < 2^62 in both engines — the CLAUDE.md overflow
bound)."""

import random

import duckdb
import pytest

from test_entry_parity import assert_gate_on

WORDS = (
    "the fast key order sort table scan merge part window small hash "
    "join spark group query row data slow filter customer line batch "
    "value stream vector agg column and of to is in der die das und "
    "ist nicht le la les et est dans el los y es"
).split()

#: gates that read ONLY the documents table
DOC_GATES = [
    "doc_quality",
    "doc_language_id",
    "language_confusion",
    "dedup_exact",
    "dedup_tokenset",
    "doc_fingerprint",
    "minhash_signatures",
    "minhash_lsh",
    # estimator-accuracy card: NULL-text docs must vanish identically
    # from signatures, band join AND both token-array sides; duplicate
    # texts pin the m=6 / jaccard=1 band
    "minhash_error_report",
    "simhash",
    "simhash_pairs",
    "simhash_pairs_banded",
    "dedup_components",
    "dedup_canonicals",
    "dedup_component_sizes",
    "vocab_top_tokens",
    # the engineered PII docs pin each detector class + the no-match
    # hyphenated number; NULL-text docs pin the coalesce-to-0 branch
    "pii_scan_report",
    "doc_length_histogram",
    "contamination_report",
    "source_stats",
    "stratified_sample",
    "ngram_jaccard",
    "doc_logprob",
    "doc_repetition",
    "source_overlap",
    "source_overlap_minhash",
    "bm25_topk",
    "bm25_search",
    "duplicate_spans",
    "span_coverage",
    "quality_weighted_sample",
    "curate_corpus",
    "curate_corpus_strict",
    "dedup_normalized",
    "dedup_containment",
    "dedup_containment_banded",
    "cross_source_dups",
    # per-doc top-k over round6 tfidf: the tie-heavy fuzz corpus
    # exercises the (tfidf, token) total-order cut
    "doc_keywords",
    # LSH candidates x split-hash boundary x exact verify — NULL-text
    # docs must vanish identically from signatures AND token sides
    "split_leakage_check",
    # corpus-first shingle attribution: exact-dup families pin the
    # all-novel-first-copy / zero-novel-later-copy split; NULL/short
    # texts drop identically pre-explode
    "doc_novelty",
    "decontaminated_corpus",
    "decontaminated_bloom",
    "vocab_df_idf",
    "sequence_packing",
    "packing_manifest",
    "curate_packed",
    "source_quota",
    "doc_tfidf",
    "doc_tfidf_maintained",
    "feature_hashing",
    "source_dedup_stats",
    "quality_deciles",
    "bigram_pmi",
    "bigram_pmi_maintained",
    "doc_bigram_logprob",
    "source_kl_divergence",
    # source set-cosine: NULL-text docs contribute no tokens and the
    # NULL-source doc drops on both sides; distinct-vocab counts pin
    # the aliased co-membership kernel on the adversarial corpus
    "source_similarity",
    "cooccurrence_window",
    "dataset_split",
    "source_overlap_kmv",
    "source_overlap_kmv_maintained",
    "source_kl_maintained",
    "holdout_logprob",
    "lang_source_chi2",
    "doc_entropy",
    "zipf_fit",
    # integer prefix-sum cumulatives over doc order; NULL/empty-text
    # docs pin the no-point contract (zipf ln/OLS tail precedent)
    "heaps_fit",
    # the per-source view: partitioned-window cumulatives + the
    # NULLIF single-point guard over the fuzz's tiny sources
    "source_heaps",
    # integer counts + literal-folded linear combo; the NULL-text /
    # newline / non-ASCII docs pin the drop + terminator contracts
    "doc_readability",
    # the redaction transform over the engineered PII docs + NULL /
    # newline / non-ASCII texts — leftmost-match agreement pinned on
    # hostile content
    "pii_redact",
    "winnowing_fingerprints",
    "winnowing_maintained",
    "dedup_winnowed",
    "vocab_coverage",
    "tfidf_topk",
    # composes the two fuzz-pinned rankers; NULL-text docs exercise the
    # absent-from-one-list NULL-rank path
    "rrf_fusion",
    # NULL-text docs pin the zero-token-source rate-1 guard
    "source_mixture_weights",
    # NULL-text docs pin the zero-token weight-0 branch; the integerized
    # sqrt normalizer is exercised over hostile token counts
    "source_mixture_temperature",
    # cume_dist is tie-invariant BY DEFINITION; the fuzz corpus's
    # duplicate texts create the tied round6 scores that pin it, and
    # NULL-text docs pin the degenerate-score (least-skips-NULL) class
    "quality_calibration",
    # skyline: duplicate texts pin the equal-point (mutually
    # non-dominating) class; NULL-text docs drop out symmetrically
    "doc_skyline",
    # integer rank machinery: duplicate texts create the tied round6
    # scores that pin the average-rank/tie-cube path; NULL-text docs
    # carry the degenerate 0.75 score into BOTH sides identically
    "quality_mannwhitney",
    # character-level verify kernel; NULL-text docs pin the ASCII gate
    "dedup_edit_distance",
    # C4-style chunk-line family: newline-terminated and non-ASCII
    # texts ride inside chunks; NULL-text docs pin the preserved-row
    # contract (NULL new_text, zero counts)
    "dedup_lines",
    "dedup_lines_maintained",
    "boilerplate_lines",
    # CMS-prefiltered exact heavy hitters: NULL-text docs count toward
    # the n_docs threshold but contribute no tokens — pins the
    # lossless-prefilter contract over the adversarial corpus
    "heavy_hitters",
    # epoch permutation is text-independent (pure id arithmetic) but
    # the fuzz corpus pins the rank kernel over its id distribution
    "epoch_shuffle",
    # NULL-source group + NULL-text zero-token docs pin the
    # integer-valued-double Simpson sums
    "source_diversity",
    # NULL-text docs (NULL n_tokens) are out of scope by contract; the
    # fuzz corpus pins the filter + the level-grid running sum
    "quality_weighted_quantiles",
    # near-dup heavy adversarial corpus: all three family pair sets +
    # the unblocked exact truth cross one report
    "candidate_family_report",
    # tie-heavy doc lengths pin the per-source descending-rank gini
    # (rank-sum tie invariance); NULL text out of scope, NULL source
    # groups as one row
    "source_token_gini",
]


def _fuzz_corpus(seed: int = 20260816, n: int = 160):
    rng = random.Random(seed)
    langs = ["en", "de", "fr", "es"]
    rows = []
    used_ids = set()

    def next_id():
        # non-contiguous, bounded < 2^31
        while True:
            i = rng.randrange(1, 2_000_000_000)
            if i not in used_ids:
                used_ids.add(i)
                return i

    def rand_text(lo, hi):
        return " ".join(rng.choice(WORDS) for _ in range(rng.randint(lo, hi)))

    def add(text, source=None):
        i = next_id()
        rows.append(
            (i, text, rng.choice(langs), source or f"src{rng.randint(0, 5)}",
             len(text))
        )
        return text

    # bulk random docs
    for _ in range(n):
        add(rand_text(4, 60))
    # degenerate lengths
    for _ in range(8):
        add(rand_text(1, 1))
        add(rand_text(2, 3))
    # pathological repetition
    for w in ("the", "agg", "und"):
        add(" ".join([w] * rng.randint(6, 20)))
    # exact dup families (within + across sources, incl. the bench src0)
    for _ in range(5):
        t = rand_text(8, 30)
        add(t, "src0")
        add(t, "src1")
        add(t, "src1")
    # one-token near-dups
    for _ in range(5):
        t = rand_text(12, 25).split(" ")
        add(" ".join(t))
        t[rng.randrange(len(t))] = rng.choice(WORDS)
        add(" ".join(t))
    # long shared spans with distinct flanks
    for _ in range(4):
        span = rand_text(10, 16)
        add(rand_text(3, 6) + " " + span)
        add(span + " " + rand_text(3, 6))
    # NULL text: the class the ADVICE-r3 bm25 finding and the
    # _group_dedup sentinel exist for — every doc gate must either
    # handle it identically to its twin or filter it identically
    rows.append((next_id(), None, "en", "src2", 0))
    rows.append((next_id(), None, "de", "src0", 0))
    # newline-terminated and non-ASCII texts: the \A..\z anchor class
    # (Java ^..$ accepts a trailing newline, RE2 does not) and the
    # byte-vs-char contract — ASCII-gated kernels must exclude these
    # IDENTICALLY in both engines while token-level gates process them
    t = rand_text(10, 20)
    rows.append((next_id(), t + "\n", "en", "src3", len(t) + 1))
    rows.append((next_id(), t + " café", "fr", "src3", len(t) + 5))
    # PII-shaped strings pin pii_scan_report's regex classes in both
    # engines (SEARCH patterns, unanchored — the \A..\z class doesn't
    # bind): an email with mixed case, a 9+ digit run, an SSN shape,
    # and a short hyphenated number that must match NOTHING
    add("contact me at John.Doe+spam@Example.COM today", "src4")
    add("order 123456789012 shipped", "src4")
    add("ssn 123-45-6789 on file", "src5")
    add("call 555-1234 maybe", "src5")
    rng.shuffle(rows)
    return rows


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_sf")
    df = spark.createDataFrame(
        _fuzz_corpus(),
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def fuzz_ddb(fuzz_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{fuzz_dir}/documents.parquet/*.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_GATES)
def test_doc_gate_matches_oracle_on_fuzz_corpus(spark, fuzz_dir, fuzz_ddb, name):
    assert_gate_on(spark, fuzz_ddb, name, fuzz_dir)
