"""KMV set-operation sketches (operators/sketches.kmv_shingle_overlap):
(a) with k >= every per-source shingle count the sketch is EXACT —
est_a/est_b/est_union/est_intersection equal the true set sizes and
est_jaccard the true Jaccard; (b) with k=64 the (full-sketch)
estimates land within the theory band of the exact values — sizes
within ~3/sqrt(k-2) relative, intersection within an absolute band
scaled by the UNION size (inclusion–exclusion noise is union-scaled:
tiny intersections are estimated with union-sized error — the
standard KMV caveat, documented in the operator); (c) invalid k
raises. Cross-engine equality is the driver parity gate
(source_overlap_kmv shares the twin builder)."""

import itertools

import pytest
from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.sketches import kmv_shingle_overlap

SF_DIR = "/root/testdata/sf0.001"
KSH = 5


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _exact_sets(spark):
    from cuda_gis_smoothing_spark.operators.dedup import shingles_expr

    toks = F.split(F.lower(F.col("text")), " ")
    sh = (
        _docs(spark)
        .select("source", toks.alias("_toks"))
        .where(F.size("_toks") >= KSH)
        .select("source", F.explode(shingles_expr(KSH)).alias("t"))
        .distinct()
        .collect()
    )
    out = {}
    for r in sh:
        out.setdefault(r["source"], set()).add(r["t"])
    return out

def test_exact_when_sketch_not_full(spark):
    ex = _exact_sets(spark)
    got = {
        (r.source_a, r.source_b): r
        for r in kmv_shingle_overlap(_docs(spark), k=10**6).collect()
    }
    assert len(got) == len(ex) * (len(ex) - 1) // 2
    for a, b in itertools.combinations(sorted(ex), 2):
        r, A, B = got[(a, b)], ex[a], ex[b]
        assert r.est_a == len(A) and r.est_b == len(B)
        assert r.est_union == len(A | B)
        assert r.est_intersection == len(A & B)
        assert abs(r.est_jaccard - len(A & B) / len(A | B)) < 1e-6


def test_estimator_error_bands(spark):
    k = 64
    ex = _exact_sets(spark)
    got = {
        (r.source_a, r.source_b): r
        for r in kmv_shingle_overlap(_docs(spark), k=k).collect()
    }
    rel = 3.0 / (k - 2) ** 0.5  # ~3 sigma of the KMV relative error
    for a, b in itertools.combinations(sorted(ex), 2):
        r, A, B = got[(a, b)], ex[a], ex[b]
        uni = len(A | B)
        assert abs(r.est_a - len(A)) <= rel * len(A)
        assert abs(r.est_b - len(B)) <= rel * len(B)
        assert abs(r.est_union - uni) <= rel * uni
        # inclusion-exclusion: intersection error is UNION-scaled
        assert abs(r.est_intersection - len(A & B)) <= 2 * rel * uni
        assert abs(r.est_jaccard - len(A & B) / uni) <= 2 * rel


def test_bad_k_raises(spark):
    with pytest.raises(ValueError):
        kmv_shingle_overlap(_docs(spark), k=1)
