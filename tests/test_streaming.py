"""Structured Streaming incremental smoothing: the stream's maintained
snapshot must equal a from-scratch batch run over all data seen — after
every batch, across stream restarts (checkpointed offsets)."""

import numpy as np
import pytest

from cuda_gis_smoothing_spark import datagen
from cuda_gis_smoothing_spark.operators.smoothing import derive_variables, smooth
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
