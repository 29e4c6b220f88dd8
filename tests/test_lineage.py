"""Checkpointed resume + per-partition lineage (north_rule: a killed
job restarts mid-pipeline and skips completed stages)."""

import numpy as np

from cuda_gis_smoothing_spark.plans.lineage import ResumableRun, lineage_rows, stage_exists
from cuda_gis_smoothing_spark.plans.pipeline import PipelineConfig, ingest_cells
from cuda_gis_smoothing_spark.operators.smoothing import smooth
from cuda_gis_smoothing_spark.sources.images import synthesize_images


def _stages(spark, run_dir, images):
    run = ResumableRun(spark, run_dir)
    cfg = PipelineConfig()
    cells = run.stage("cells", lambda: ingest_cells(images, cfg))
    out = run.stage("smoothed", lambda: smooth(cells, cfg.plan))
    return run, out


def test_kill_and_resume_skips_done_stages(spark, tmp_path):
    images = synthesize_images(spark, 120, partitions=2)
    run_dir = str(tmp_path / "run")

    # simulate a job killed after stage 1: materialize only "cells"
    partial = ResumableRun(spark, run_dir)
    cfg = PipelineConfig()
    partial.stage("cells", lambda: ingest_cells(images, cfg))
    assert stage_exists(run_dir, "cells")
    assert not stage_exists(run_dir, "smoothed")

    # resume: cells must be SKIPPED, smoothed executed
    run, out = _stages(spark, run_dir, images)
    assert run.skipped == ["cells"]
    assert run.executed == ["smoothed"]

    # and the resumed result equals a fresh full run
    fresh_dir = str(tmp_path / "fresh")
    _, fresh = _stages(spark, fresh_dir, images)
    a = out.toPandas().set_index("cell").sort_index()
    b = fresh.toPandas().set_index("cell").sort_index()
    assert (a.index == b.index).all()
    assert np.allclose(a["smoothed_ndvi"], b["smoothed_ndvi"], atol=1e-12)


def test_lineage_rows_cover_all_rows(spark):
    df = spark.range(0, 1000, 1, 7).withColumnRenamed("id", "x")
    rows = lineage_rows(df).collect()
    assert sum(r["n_rows"] for r in rows) == 1000
    assert len({r["partition_id"] for r in rows}) == len(rows) == 7


def test_lineage_checksum_order_insensitive(spark):
    df1 = spark.range(0, 500, 1, 4)
    df2 = df1.orderBy(df1.id.desc()).repartition(4)
    c1 = sum(r["checksum"] for r in lineage_rows(df1).collect()) % (1 << 63)
    c2 = sum(r["checksum"] for r in lineage_rows(df2).collect()) % (1 << 63)
    assert c1 == c2


def test_run_metrics(spark, tmp_path):
    images = synthesize_images(spark, 60, partitions=2)
    run, _ = _stages(spark, str(tmp_path / "m"), images)
    m = run.metrics()
    assert set(m["stages"]) == {"cells", "smoothed"}
    assert m["stages"]["cells"]["rows"] > 0
