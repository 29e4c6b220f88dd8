"""Batch similarity operators: reciprocal k-NN filter, label vote and
silhouette differentials."""
import pytest
def test_knn_mutual_pairs_matches_python_reciprocal_filter(spark):
    from cuda_gis_smoothing_spark.operators.similarity import (
        knn_graph,
        knn_mutual_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    g = {
        (r["vec_id"], r["neighbor_id"]): (r["cosine"], r["rank"])
        for r in knn_graph(emb, k=5).collect()
    }
    want = {}
    for (a, b), (cos, rab) in g.items():
        if a < b and (b, a) in g:
            want[(a, b)] = (cos, rab, g[(b, a)][1])
    got = {
        (r["vec_a"], r["vec_b"]): (r["cosine"], r["rank_ab"], r["rank_ba"])
        for r in knn_mutual_pairs(emb, k=5).collect()
    }
    assert got == want and 0 < len(got) < len(g)


def test_embedding_outliers_matches_numpy_differential(spark):
    """Numpy differential with the SAME round-first layering: per-label
    per-dim sums rounded to 6 decimals, cosine to own centroid,
    bottom-k on (round6 cosine, vec_id)."""
    from cuda_gis_smoothing_spark.operators.similarity import (
        EMBEDDING_OUTLIERS_K,
        embedding_outliers,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = [
        (r["vec_id"], r["label"], r["embedding"])
        for r in emb.collect()
        if r["label"] is not None and r["embedding"] is not None
    ]
    sums = {}
    for _, lab, v in rows:
        s = sums.setdefault(lab, [0.0] * len(v))
        for i, x in enumerate(v):
            s[i] += float(x)
    cen = {
        lab: [round(x + 1e-09, 6) for x in s] for lab, s in sums.items()
    }
    scored = {}
    for vid, lab, v in rows:
        c = cen[lab]
        dot = sum(float(a) * b for a, b in zip(v, c))
        nv = sum(float(a) * float(a) for a in v) ** 0.5
        nc = sum(b * b for b in c) ** 0.5
        scored.setdefault(lab, []).append(
            (round(dot / (nv * nc) + 1e-09, 6), vid)
        )
    want = {}
    for lab, lst in scored.items():
        lst.sort()
        for rk, (cos, vid) in enumerate(lst[:EMBEDDING_OUTLIERS_K], 1):
            want[(lab, vid)] = (cos, rk)
    got = {
        (r["label"], r["vec_id"]): (r["centroid_cosine"], r["rank"])
        for r in embedding_outliers(emb).collect()
    }
    assert set(got) == set(want) and len(got) > 0
    for key, (cos, rk) in want.items():
        assert got[key][1] == rk, key
        assert got[key][0] == pytest.approx(cos, abs=2e-6)


def test_knn_label_vote_matches_python_vote_over_spark_pairs(spark):
    """Re-implement ranking + voting in Python from the SAME pair
    cosines Spark computed (no independent float path — rank flips on
    round6 boundaries are not a legal difference source) and compare
    the full output."""
    from cuda_gis_smoothing_spark.operators.dedup import embedding_neardup_pairs
    from cuda_gis_smoothing_spark.operators.sampling import dataset_split
    from cuda_gis_smoothing_spark.operators.similarity import (
        KNN_VOTE_K,
        knn_label_vote,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    split = {r["vec_id"]: r["split"] for r in dataset_split(emb, "vec_id").collect()}
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    pairs = embedding_neardup_pairs(emb, threshold=-2.0, id_col="vec_id").collect()
    nbrs = {}
    for r in pairs:
        for v, t in ((r["vec_a"], r["vec_b"]), (r["vec_b"], r["vec_a"])):
            if split[v] == "val" and split[t] == "train" and labels[t] is not None:
                nbrs.setdefault(v, []).append((-r["cosine"], t))
    want = {}
    for v, lst in nbrs.items():
        lst.sort()
        counts = {}
        for _, t in lst[:KNN_VOTE_K]:
            counts[labels[t]] = counts.get(labels[t], 0) + 1
        pl, votes = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        want[v] = (labels[v], pl, votes)
    got = {
        r["vec_id"]: (r["true_label"], r["predicted_label"], r["votes"])
        for r in knn_label_vote(emb).collect()
    }
    assert got == want and len(got) > 10


def test_label_confusion_is_the_vote_rollup(spark):
    from cuda_gis_smoothing_spark.operators.similarity import (
        knn_label_vote,
        label_confusion,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    votes = knn_label_vote(emb).collect()
    want = {}
    for r in votes:
        key = (r["true_label"], r["predicted_label"])
        want[key] = want.get(key, 0) + 1
    got = {
        (r["true_label"], r["predicted_label"]): r["n_vectors"]
        for r in label_confusion(emb).collect()
    }
    assert got == want and sum(got.values()) == len(votes)


def test_ivf_silhouette_matches_numpy_differential(spark):
    """Numpy recomputation with the SAME rounding discipline (round6
    per-bucket means, ratio of rounded values) over the same seeded
    assignment."""
    import numpy as np

    from cuda_gis_smoothing_spark.operators.similarity import ivf_silhouette

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = sorted(
        (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
        for r in emb.collect()
    )
    ids = [i for i, _ in rows]
    X = np.stack([v for _, v in rows])
    nrm = np.linalg.norm(X, axis=1)
    cents = X[:8] / (np.linalg.norm(X[:8], axis=1, keepdims=True) + 1e-12)
    bucket = np.argmax((X / nrm[:, None]) @ cents.T, axis=1)  # ties: lowest cid

    def r6(x):
        return np.floor((x + 1e-9) * 1e6 + 0.5) / 1e6

    cos = r6((X @ X.T) / np.outer(nrm, nrm))
    d = 1.0 - cos
    want = {}
    for ix, vid in enumerate(ids):
        per = {}
        for jx in range(len(ids)):
            if jx == ix:
                continue
            per.setdefault(bucket[jx], []).append(d[ix, jx])
        a = r6(float(np.mean(per[bucket[ix]]))) if bucket[ix] in per else None
        others = sorted(
            (r6(float(np.mean(v))), b) for b, v in per.items() if b != bucket[ix]
        )
        b = others[0][0] if others else None
        if a is None or b is None:
            sil = None
        elif max(a, b) == 0:
            sil = 0.0
        else:
            sil = r6((b - a) / max(a, b))
        want[vid] = (int(bucket[ix]), a, b, sil)
    got = {
        r["vec_id"]: (r["bucket"], r["a_mean"], r["b_mean"], r["silhouette"])
        for r in ivf_silhouette(emb).collect()
    }
    assert set(got) == set(want)
    for vid in want:
        gb, ga, gbm, gs = got[vid]
        wb, wa, wbm, ws = want[vid]
        assert gb == wb, vid
        for g, w in ((ga, wa), (gbm, wbm), (gs, ws)):
            if w is None:
                assert g is None
            else:
                assert g == pytest.approx(w, abs=2e-6), vid
