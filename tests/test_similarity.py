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
