"""Plan-quality assertions — the optimizer contracts SURVEY.md §4
relies on must hold structurally, not just by luck.

These inspect the physical plan text: column pruning (payload bytes
never read by metadata-only operators), constant-folded weights, single
aggregation for fused variables, no Python UDFs in JVM-only paths.
"""

import pytest
from pyspark.sql import functions as F

from cuda_gis_smoothing_spark import datagen
from cuda_gis_smoothing_spark.operators.multimodal import geolocate, image_features
from cuda_gis_smoothing_spark.operators.smoothing import smooth
from cuda_gis_smoothing_spark.plans.config import ALL_VARIABLES, SmoothingPlan


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def images_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("imgs") / "tbl")
    pdf = datagen.gen_images(50)
    spark.createDataFrame(pdf).write.parquet(p)
    return p


def test_geolocate_prunes_payload_bytes(spark, images_parquet):
    """Metadata-only cell encoding must never scan the bytes column —
    at 100 TB that is the difference between reading 0.1% and 100% of
    the table."""
    df = spark.read.parquet(images_parquet)
    plan = _optimized(geolocate(df))
    import re

    m = re.search(r"ReadSchema: (\S+)", _explain_formatted(geolocate(df)))
    schema = m.group(1) if m else plan
    assert "bytes" not in schema
    assert "phash" in schema


def test_image_features_reads_payload(spark, images_parquet):
    df = spark.read.parquet(images_parquet)
    m = _explain_formatted(image_features(df))
    import re

    mm = re.search(r"ReadSchema: (\S+)", m)
    assert mm and "bytes" in mm.group(1)


def _explain_formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_smoothing_weights_constant_folded(spark):
    cells = spark.createDataFrame(datagen.gen_cells(side=8))
    plan = _plan(smooth(cells, SmoothingPlan(variant="gaussian_k2", variables=("ndvi",))))
    # the CASE must compare against literal doubles, not call exp()
    assert "0.6065" in plan and "0.1353" in plan
    assert "pythonUDF" not in plan.lower() or "ArrowEvalPython" not in plan


def test_fused_smoothing_is_single_aggregation(spark):
    cells = spark.createDataFrame(datagen.gen_cells(side=8))
    plan = _plan(smooth(cells, SmoothingPlan(variant="gaussian_k2", variables=ALL_VARIABLES)))
    # exactly one final-aggregate stage computes every smoothed_<var>
    finals = [
        ln
        for ln in plan.splitlines()
        if "HashAggregate" in ln and "smoothed_ndvi" in ln and "smoothed_ndwi" in ln
    ]
    assert finals, "fused variables must share one aggregate"
    # and the whole smoothing pass has no Python evaluation at all
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_smoothing_join_is_broadcast_when_forced(spark):
    cells = spark.createDataFrame(datagen.gen_cells(side=8))
    plan = _plan(
        smooth(
            cells,
            SmoothingPlan(
                variant="simple_k1", variables=("ndvi",), broadcast_values=True
            ),
        )
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_kring_expansion_has_no_shuffle_before_join(spark):
    from cuda_gis_smoothing_spark.operators.smoothing import kring_edges

    cells = spark.createDataFrame(datagen.gen_cells(side=8)).select("cell")
    plan = _plan(kring_edges(cells, 2))
    assert "Exchange" not in plan  # pure Generate + Project, map-side only


def test_locality_metric_has_no_global_window(spark):
    """O3's SCALE branch must not sort the full cell table in ONE
    partition: every Window in the plan operates on the deterministic
    ``_bkt`` bucket (per-bucket ranking, or the O(num_buckets) offset
    prefix sum) — never a bare global ordering over cell/zkey rows.
    (``auto`` picks this branch above the ~10M-row crossover; forced
    here because the fixture is tiny.)"""
    from cuda_gis_smoothing_spark.operators.stats import locality_metric

    cells = spark.createDataFrame(datagen.gen_cells(side=8))
    plan = _plan(locality_metric(cells, strategy="bucketed"))
    windows = [ln for ln in plan.splitlines() if "Window " in ln]
    assert windows, "expected bucket-local windows in the plan"
    for ln in windows:
        assert "_bkt" in ln, f"global (single-partition) window found: {ln.strip()}"
    # and no GLOBAL sort anywhere (per-bucket sorts print `], false`)
    import re

    global_sorts = [
        ln for ln in plan.splitlines() if re.search(r"Sort \[.*\], true", ln)
    ]
    assert not global_sorts, f"global sorts found: {global_sorts}"


def test_exact_dedup_has_no_sort(spark):
    """groupBy+join dedup must not sort anything: map-side partial agg,
    hash exchange on the digest, shuffled-hash join back."""
    from cuda_gis_smoothing_spark.operators.dedup import exact_dedup, tokenset_dedup

    docs = spark.createDataFrame(
        [(i, f"text {i % 7}") for i in range(50)], ["doc_id", "text"]
    )
    for op in (exact_dedup, tokenset_dedup):
        plan = _plan(op(docs))
        assert "Sort " not in plan and "SortMergeJoin" not in plan, plan
        assert "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
        assert "Window" not in plan


def test_knn_graph_and_containment_have_no_nested_loop(spark):
    """The two newest pair-join operators must keep the equi-join
    discipline with broadcast disabled (the 100 TB regime): knn_graph
    routes through the blocked triangle join, containment_pairs
    through the asymmetric prefix/full posting join — never a
    BroadcastNestedLoop or CartesianProduct node."""
    from cuda_gis_smoothing_spark.operators.dedup import containment_pairs
    from cuda_gis_smoothing_spark.operators.similarity import knn_graph, knn_graph_ivf

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i + j) % 9}" for j in range(6))) for i in range(40)],
        ["doc_id", "text"],
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, df in (
            ("knn_graph", knn_graph(emb, k=3)),
            ("knn_graph_ivf", knn_graph_ivf(emb, k=3)),
            ("containment_pairs", containment_pairs(docs, threshold=0.8, block_col=None)),
        ):
            plan = _plan(df)
            assert "BroadcastNestedLoop" not in plan, name
            assert "CartesianProduct" not in plan, name
            assert "Exchange hashpartitioning" in plan, name
            # the pair-stage shuffles must be USER-SPECIFIED repartitions
            # (byte-tiny block keys: AQE coalesces anything else to one
            # task — the CLAUDE.md blind spot), on BOTH join sides;
            # repartition(N, cols) prints as REPARTITION_BY_NUM
            assert plan.count("REPARTITION_BY_NUM") >= 2, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_embedding_neardup_has_no_nested_loop(spark):
    """Both embedding near-dup paths must plan as hash-partitioned
    equi-joins: the exact verifier through the blocked triangle join,
    the banded path through (band, bv) buckets — never a
    BroadcastNestedLoop or CartesianProduct node."""
    from cuda_gis_smoothing_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_banded,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for op in (embedding_neardup_pairs, embedding_neardup_pairs_banded):
        plan = _plan(op(emb))
        assert "BroadcastNestedLoop" not in plan, op.__name__
        assert "CartesianProduct" not in plan, op.__name__
    # with broadcast off (the 100 TB regime) the same plans become
    # shuffle equi-joins on hash-partitioned exchanges
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for op in (embedding_neardup_pairs, embedding_neardup_pairs_banded):
            plan = _plan(op(emb))
            assert "BroadcastNestedLoop" not in plan, op.__name__
            assert "CartesianProduct" not in plan, op.__name__
            assert "Exchange hashpartitioning" in plan, op.__name__
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_scatter_smoothing_has_single_aggregation_exchange(spark):
    """Scatter's selling point is structural: Generate → partial agg →
    ONE exchange at cell cardinality → final agg → semi join. The
    gather join's second hashpartitioning exchange must not appear on
    the aggregation path."""
    from cuda_gis_smoothing_spark.operators.smoothing import smooth_scatter

    cells = spark.createDataFrame(datagen.gen_cells(side=8))
    plan_cfg = SmoothingPlan(variant="gaussian_k2", variables=ALL_VARIABLES)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        scatter = _plan(smooth_scatter(cells, plan_cfg))
        gather = _plan(smooth(cells, plan_cfg))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert scatter.count("Exchange hashpartitioning") < gather.count(
        "Exchange hashpartitioning"
    )
    # all four variables still fused into one final aggregate
    finals = [
        ln
        for ln in scatter.splitlines()
        if "HashAggregate" in ln and "smoothed_ndvi" in ln and "smoothed_ndwi" in ln
    ]
    assert finals


def test_locality_metric_strategies_agree(spark):
    """window / bucketed / auto branches return the identical metric
    (absolute correctness is the driver gate's DuckDB twin; this pins
    branch equivalence so `auto` can never change the answer)."""
    from cuda_gis_smoothing_spark.operators.stats import locality_metric

    cells = spark.createDataFrame(datagen.gen_cells(side=12, n_isolated=3))
    vals = {
        s: locality_metric(cells, strategy=s).collect()[0]["avg_index_distance"]
        for s in ("window", "bucketed", "auto")
    }
    assert vals["window"] == vals["bucketed"] == vals["auto"]


def test_blocked_bucket_verify_plans_as_hash_equi_join(spark):
    """The fused curate verify kernel must plan as a hash-partitioned
    EQUI-join on (band, bh, block_i, block_j) — no BroadcastNestedLoop
    or CartesianProduct node, with broadcast on or off (the 100 TB
    regime)."""
    from cuda_gis_smoothing_spark.operators.dedup import lsh_blocked_neardup_drops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for thresh in (old, "-1"):
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
            plan = _plan(lsh_blocked_neardup_drops(docs, 0.9))
            assert "BroadcastNestedLoop" not in plan
            assert "CartesianProduct" not in plan
        assert "Exchange hashpartitioning" in plan  # broadcast-off form
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_star_join_broadcasts_dims_and_topk_avoids_global_sort(spark):
    """Q5-shaped chain: the dimension hops must be broadcast joins (no
    shuffle for region/nation); Q10-shaped top-k must plan as
    TakeOrderedAndProject, never a global Sort."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    plan5 = _plan(entry.queries()["region_revenue"](spark, sf))
    assert "BroadcastHashJoin" in plan5
    plan10 = _plan(entry.queries()["top_customers"](spark, sf))
    assert "TakeOrderedAndProject" in plan10
    # the only sort is the k-row rank window AFTER the limit (local,
    # prints "], false"); no GLOBAL sort anywhere
    import re

    assert not re.search(r"Sort \[.*\], true", plan10)


def test_filtered_base_is_join_free_single_scan(spark):
    """Curation stages 1-2 derive quality + language as pure
    projections: the plan must contain no join and no exchange — one
    scan, one filter, one projection."""
    from cuda_gis_smoothing_spark.operators.curate import filtered_base

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(filtered_base(docs, "en", 0.5))
    assert "Join" not in plan and "Exchange" not in plan
    assert plan.count("FileScan") == 1


def test_winnowed_pairs_plan_discipline(spark):
    """dedup_winnowed's candidate self-join must be a pinned
    (REPARTITION_BY_NUM on both sides) hash equi-join — never a
    nested loop — with broadcast disabled (the 100 TB regime)."""
    from cuda_gis_smoothing_spark.operators.dedup import winnowed_neardup_pairs

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i + j) % 9}" for j in range(8))) for i in range(40)],
        ["doc_id", "text"],
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = winnowed_neardup_pairs(docs, threshold=0.4)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan
        assert "CartesianProduct" not in plan
        assert plan.count("REPARTITION_BY_NUM") >= 2, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_props_stats_parses_json_once(spark):
    """props_field_stats must leave exactly ONE get_json_object in the
    executed plan — the regex gate and the cast both consume the same
    named projection (re-referencing the raw expression would parse
    every row's JSON twice; the CollapseProject expensive-expr class)."""
    from cuda_gis_smoothing_spark.operators.events import props_field_stats

    ev = spark.createDataFrame(
        [(1, "a", '{"k": 3}')], "event_id long, event_type string, props string"
    )
    plan = (
        props_field_stats(ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("get_json_object") == 1, plan


def test_mixture_weights_single_scan(spark, tmp_path):
    """source_mixture_weights must read the corpus ONCE: the (T, S)
    totals come from an unpartitioned window over the per-source
    aggregate, not a second differently-pruned aggregate consumer."""
    from cuda_gis_smoothing_spark.operators.curate import (
        source_mixture_weights,
    )

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"s{i % 3}", "a b c") for i in range(30)],
        "doc_id long, source string, text string",
    ).write.parquet(p)
    plan = (
        source_mixture_weights(spark.read.parquet(p))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_scans = plan.count("FileScan")
    assert n_scans == 1, f"{n_scans} scans\n{plan}"


def test_no_quadratic_join_in_any_batch_gate(spark):
    """Sweep EVERY pure-batch gate's executed plan: zero cartesian
    products anywhere, and every BroadcastNestedLoopJoin covered by an
    ungrouped (1-row stats) aggregate — the intentional
    crossJoin(broadcast(stats)) pattern plans as a BNL, an accidental
    corpus×corpus one does not have the 1-row side. Auto-covers future
    gates: only maintained/streaming gates (whose wrappers EXECUTE
    state builds) are skipped by name."""
    import re

    import __spark_entry__ as entry_mod
    from cuda_gis_smoothing_spark.plans.audit import assert_no_quadratic_join
    from cuda_gis_smoothing_spark.sources.tables import clear_cells_cache

    # only gates whose wrappers EXECUTE state builds are skipped; the
    # IVF/PQ/winnowing BATCH gates are all in the sweep (an earlier
    # `|stream` alternative silently excluded the BATCH hydrology
    # stream_* gates — every queries() name containing "stream" is a
    # batch gate, so "maintained" alone is the correct skip)
    skip = re.compile(r"maintained")
    # BNLs that are deliberate bounded-side designs the text heuristic
    # cannot see (each documented in its operator's docstring):
    exempt = {
        # exact brute-force scan vs a BOUNDED broadcast query table —
        # the deliberate baselines whose scale paths are the IVF gates
        "sq_search",
        "knn_cosine",
        "pq_search",
        "pq_search_trained",
        # composes pq_search as its approx side, inheriting that
        # gate's bounded broadcast-query BNL (the exact side is
        # localCheckpoint'ed inside rank_overlap_report, so only the
        # approx ranker's deliberate BNL survives into this plan)
        "pq_recall_report",
        # #sources² pair joins over per-source aggregate rows (source
        # cardinality is tiny by design)
        "source_overlap_kmv",
        "source_overlap_minhash",
        # the exact all-pairs simhash baseline (scale path:
        # simhash_pairs_banded — in the sweep and clean)
        "simhash_pairs",
        # 1-row (N, avgdl) stats attach whose aggregate sits behind the
        # postings localCheckpoint, invisible to the text count
        "bm25_search",
    }
    sf = "/root/testdata/sf0.001"
    clear_cells_cache()
    checked = 0
    for name, q in entry_mod.queries().items():
        if skip.search(name) or name in exempt:
            continue
        assert_no_quadratic_join(
            q(spark, sf), context=name, allow_stats_broadcasts=True
        )
        checked += 1
    assert checked >= 120  # the sweep must actually cover the surface
