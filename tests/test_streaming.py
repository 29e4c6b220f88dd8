"""Structured Streaming incremental smoothing: the stream's maintained
snapshot must equal a from-scratch batch run over all data seen — after
every batch, across stream restarts (checkpointed offsets)."""

import numpy as np
import pytest

from cuda_gis_smoothing_spark import datagen
from cuda_gis_smoothing_spark.operators.smoothing import smooth
from cuda_gis_smoothing_spark.plans.config import SmoothingPlan
from cuda_gis_smoothing_spark.plans.pipeline import PipelineConfig, ingest_cells
from cuda_gis_smoothing_spark.sources.images import IMAGES_SCHEMA
from cuda_gis_smoothing_spark.streaming.incremental import IncrementalSmoother

PLAN = SmoothingPlan(variant="gaussian_k1", variables=("ndvi",))


def _write_batch(spark, src, start, n):
    pdf = datagen.gen_images(n, start=start)
    spark.createDataFrame(pdf, schema=IMAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _batch_oracle(spark, all_images_df):
    cells = ingest_cells(all_images_df, PipelineConfig())
    return (
        smooth(cells.select("cell", "ndvi"), PLAN)
        .toPandas()
        .set_index("cell")
        .sort_index()
    )


@pytest.mark.slow
def test_incremental_equals_batch_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    sm = IncrementalSmoother(spark, state, plan=PLAN)

    # ---- batch 1
    _write_batch(spark, src, 0, 150)
    q = sm.start(src, ckpt)
    q.awaitTermination(120)
    got1 = sm.current_smoothed().toPandas().set_index("cell").sort_index()
    all1 = spark.createDataFrame(datagen.gen_images(150), schema=IMAGES_SCHEMA)
    exp1 = _batch_oracle(spark, all1)
    assert (got1.index == exp1.index).all()
    assert np.allclose(got1["smoothed_ndvi"], exp1["smoothed_ndvi"], atol=1e-9)

    # ---- batch 2 appended; RESTART the stream from checkpoint
    _write_batch(spark, src, 150, 120)
    q2 = sm.start(src, ckpt)
    q2.awaitTermination(120)
    got2 = sm.current_smoothed().toPandas().set_index("cell").sort_index()
    all2 = spark.createDataFrame(datagen.gen_images(270), schema=IMAGES_SCHEMA)
    exp2 = _batch_oracle(spark, all2)
    assert (got2.index == exp2.index).all()
    assert np.allclose(got2["smoothed_ndvi"], exp2["smoothed_ndvi"], atol=1e-9)

    # aggregates state must hold exactly all 270 images
    agg = sm.current_aggregates().agg({"n": "sum"}).collect()[0][0]
    assert agg == 270


def _snapshot_dirs(state_root):
    import os

    path = str(state_root / "cell_aggregates")
    return sorted(os.listdir(path)) if os.path.isdir(path) else []


def test_snapshot_log_compacts_and_replays(spark, tmp_path):
    """The base+delta state log: per-batch writes hold only updated
    cells, compaction folds deltas into one base and GCs the rest, and
    a foreachBatch crash-replay of an already-applied batch id is a
    no-op — after all of which the snapshot still equals a from-scratch
    batch run."""
    import os

    state = tmp_path / "state"
    sm = IncrementalSmoother(spark, str(state), plan=PLAN, compact_every=2)

    def batch_df(start, n):
        return spark.createDataFrame(
            datagen.gen_images(n, start=start), schema=IMAGES_SCHEMA
        )

    sm.process_batch(batch_df(0, 60), 0)
    sm.process_batch(batch_df(60, 60), 1)  # 2nd delta -> compaction fires
    dirs = _snapshot_dirs(state)
    assert dirs == ["base-b00000001"], dirs

    sm.process_batch(batch_df(120, 60), 2)
    dirs = _snapshot_dirs(state)
    assert dirs == ["base-b00000001", "delta-b00000002"], dirs
    # the delta holds only the cells batch 2 touched, not the world
    delta = spark.read.parquet(str(state / "cell_aggregates" / "delta-b00000002"))
    assert delta.count() < sm.current_aggregates().count()

    # crash replay of batch 2 (same id): state must not double-count
    n_before = sm.current_aggregates().agg({"n": "sum"}).collect()[0][0]
    sm.process_batch(batch_df(120, 60), 2)
    assert sm.current_aggregates().agg({"n": "sum"}).collect()[0][0] == n_before
    # replay of an already-COMPACTED batch id is also a no-op
    sm.process_batch(batch_df(60, 60), 1)
    assert sm.current_aggregates().agg({"n": "sum"}).collect()[0][0] == n_before
    assert n_before == 180

    got = sm.current_smoothed().toPandas().set_index("cell").sort_index()
    exp = _batch_oracle(spark, batch_df(0, 180))
    assert (got.index == exp.index).all()
    assert np.allclose(got["smoothed_ndvi"], exp["smoothed_ndvi"], atol=1e-9)
    assert os.path.isdir(str(state / "smoothed"))


def test_partials_entrypoint_multibatch_equals_batch(spark, tmp_path):
    """process_partials (the no-decode entry the smooth_maintained
    gate uses): cell-value rows folded over three batches — including
    an ADDITIVE update to already-seen cells — must serve the same
    smoothed snapshot as one batch smooth over the merged aggregates."""
    pdf = datagen.gen_cells(side=16, n_isolated=1)[["cell", "ndvi"]]
    cells = spark.createDataFrame(pdf)
    sm = IncrementalSmoother(spark, str(tmp_path / "state"), plan=PLAN)
    from pyspark.sql import functions as F

    parts = [
        cells.where(F.col("cell") % 3 == i).select(
            "cell", F.col("ndvi").alias("sum_ndvi"), F.lit(1).cast("long").alias("n")
        )
        for i in range(3)
    ]
    # batch 3 re-touches batch 0's cells with an additive contribution
    extra = parts[0].select(
        "cell", (F.col("sum_ndvi") * 3).alias("sum_ndvi"), F.col("n")
    )
    for bid, p in enumerate([*parts, extra]):
        sm.process_partials(p, bid)
    got = sm.current_smoothed().toPandas().set_index("cell").sort_index()
    merged = pdf.copy()
    touched = merged["cell"] % 3 == 0
    merged.loc[touched, "ndvi"] = merged.loc[touched, "ndvi"] * 4 / 2  # (v+3v)/2
    exp = (
        smooth(spark.createDataFrame(merged), PLAN)
        .toPandas()
        .set_index("cell")
        .sort_index()
    )
    assert (got.index == exp.index).all()
    assert np.allclose(got["smoothed_ndvi"], exp["smoothed_ndvi"], atol=1e-9)


def test_incremental_pyramid_multibatch_and_minmax_refresh(spark, tmp_path):
    """Multi-batch maintained pyramid equals a from-scratch downsample
    of the merged state; a second partial that LOWERS a fine cell's
    mean must refresh its coarse cell's min (decrement-unsafe for
    merge-maintenance — the restricted recompute handles it); a
    replayed batch is a no-op."""
    from pyspark.sql import functions as F

    from cuda_gis_smoothing_spark.hexgrid import ENC
    from cuda_gis_smoothing_spark.operators.spatial import grid_downsample
    from cuda_gis_smoothing_spark.streaming.incremental import IncrementalPyramid

    def partials(rows):
        return spark.createDataFrame(
            [(c, x, 1) for c, x in rows], "cell long, sum_ndvi double, n long"
        )

    base = (20 + 1) * ENC + 20
    b0 = [(base + i, 0.5) for i in range(4)]  # two coarse cells on axis r
    pyr = IncrementalPyramid(spark, str(tmp_path / "state"))
    pyr.process_partials(partials(b0), 0)
    # batch 1: one extra partial drags cell base+0's mean to 0.25 —
    # its coarse cell's min/mean must drop, the other must not change
    pyr.process_partials(partials([(base + 0, 0.0)]), 1)
    got = {r.coarse_cell: r for r in pyr.current_pyramid().collect()}
    want = {
        r.coarse_cell: r
        for r in grid_downsample(pyr.state_cells()).collect()
    }
    assert set(got) == set(want)
    for cc in want:
        for f in ("n_cells", "mean_value", "min_value", "max_value"):
            assert got[cc][f] == want[cc][f], (cc, f)
    assert min(r.min_value for r in got.values()) == 0.25
    # replay must be a no-op
    pyr.process_partials(partials([(base + 0, 0.0)]), 1)
    again = {r.coarse_cell: r for r in pyr.current_pyramid().collect()}
    assert {c: (r.n_cells, r.mean_value, r.min_value, r.max_value) for c, r in again.items()} == {
        c: (r.n_cells, r.mean_value, r.min_value, r.max_value) for c, r in got.items()
    }


def test_zonal_stats_served_equals_batch_multi_batch(spark, tmp_path):
    """zonal_stats over IncrementalSmoother.state_cells() == the batch
    kernel over the per-cell merged means — two partials batches with
    overlapping cells exercise the sum/n merge."""
    from cuda_gis_smoothing_spark import datagen
    from cuda_gis_smoothing_spark.operators.spatial import zonal_stats

    sm = IncrementalSmoother(spark, str(tmp_path / "state"))
    enc, off = 1 << 20, 1 << 10

    def cell(q, r):
        return (q + off) * enc + (r + off)

    b0 = [(cell(q, r), 0.1 * (q + 2 * r), 1) for q in range(6) for r in range(6)]
    # batch 1 re-observes a subset with different values (means shift)
    b1 = [(cell(q, r), 0.05 * (q - r), 1) for q in range(3) for r in range(3)]
    schema = "cell long, sum_ndvi double, n long"
    sm.process_partials(spark.createDataFrame(b0, schema), 0)
    sm.process_partials(spark.createDataFrame(b1, schema), 1)

    merged = {}
    for c, s, n in b0 + b1:
        t = merged.get(c, (0.0, 0))
        merged[c] = (t[0] + s, t[1] + n)
    cells = spark.createDataFrame(
        [(c, s / n) for c, (s, n) in merged.items()], "cell long, ndvi double"
    )
    bnd = datagen.gen_boundaries()
    got = {r.region_id: r for r in zonal_stats(sm.state_cells(), bnd).collect()}
    want = {r.region_id: r for r in zonal_stats(cells, bnd).collect()}
    assert set(got) == set(want) and got
    for k in want:
        g, w = got[k], want[k]
        assert (g.n_cells, g.mean_ndvi, g.min_ndvi, g.max_ndvi) == (
            w.n_cells,
            w.mean_ndvi,
            w.min_ndvi,
            w.max_ndvi,
        )
