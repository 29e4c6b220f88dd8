"""Batch similarity operators: reciprocal k-NN filter differential."""
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
