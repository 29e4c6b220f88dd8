"""Incremental smoothing over a stream of image arrivals.

The reference is batch-only (SURVEY.md §1.4); this is the optional
extension it sketches: new images arrive continuously, per-cell
aggregates update incrementally, and smoothing recomputes ONLY the
k-ring neighborhoods of cells whose aggregate changed — not the world.

Design (Spark-first):
  * source: ``readStream`` over the images table directory (file
    source; swap for Kafka/Iceberg CDC on a real cluster).
  * per-batch merge via ``foreachBatch``: new (cell, sum, n) partials
    from the Arrow decode UDF merge into a running state table —
    sum/count compose exactly, so the merged aggregate is identical to
    a from-scratch batch aggregate over all data seen.
  * affected set: updated cells ∪ their k-ring (the cells whose
    smoothed value can change) — smoothing re-runs on that subset only,
    reading neighbor values from the full state (correct because
    smoothing is a single pass over current values, never iterative —
    SURVEY.md §3.4).

State lives in partitioned parquet next to the checkpoint dir, so a
killed stream resumes exactly (source offsets via Spark's checkpoint,
aggregate state via the atomic swap below).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.hexgrid import GridSpec
from cuda_gis_smoothing_spark.operators.multimodal import cell_partials
from cuda_gis_smoothing_spark.operators.smoothing import (
    derive_variables,
    kring_edges,
    smooth,
)
from cuda_gis_smoothing_spark.plans.config import SmoothingPlan


class IncrementalSmoother:
    """foreachBatch sink: merge partials, re-smooth affected k-rings."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        plan: SmoothingPlan | None = None,
        grid: GridSpec | None = None,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.plan = plan or SmoothingPlan(variant="gaussian_k1", variables=("ndvi",))
        self.grid = grid or GridSpec()
        os.makedirs(state_dir, exist_ok=True)

    # -- state table ---------------------------------------------------------
    @property
    def _agg_path(self) -> str:
        return os.path.join(self.state_dir, "cell_aggregates")

    @property
    def _smooth_path(self) -> str:
        return os.path.join(self.state_dir, "smoothed")

    def _read_state(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self._agg_path)
        except Exception:
            return None

    def current_aggregates(self) -> DataFrame | None:
        return self._read_state()

    def current_smoothed(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self._smooth_path)
        except Exception:
            return None

    # -- the foreachBatch body -------------------------------------------------
    def process_batch(self, images_batch: DataFrame, batch_id: int) -> None:
        new = (
            cell_partials(images_batch, self.grid)
            .groupBy("cell")
            .agg(F.sum("sum_ndvi").alias("sum_ndvi"), F.sum("n").alias("n"))
            .cache()
        )
        if new.isEmpty():
            new.unpersist()
            return
        prev = self._read_state()
        if prev is None:
            merged = new
        else:
            merged = (
                prev.unionByName(new)
                .groupBy("cell")
                .agg(F.sum("sum_ndvi").alias("sum_ndvi"), F.sum("n").alias("n"))
            )
        # atomic swap: write new state beside, then rename
        tmp = self._agg_path + f".b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = self._agg_path
        bak = old + ".old"
        if os.path.exists(old):
            os.rename(old, bak)
        os.rename(tmp, old)
        if os.path.exists(bak):
            import shutil

            shutil.rmtree(bak)

        # affected = updated cells ∪ k-ring(updated): every cell whose
        # smoothed value references an updated aggregate
        state = self.spark.read.parquet(self._agg_path)
        cells = derive_variables(
            state.select("cell", (F.col("sum_ndvi") / F.col("n")).alias("ndvi"))
        )
        affected = (
            kring_edges(new.select("cell"), self.plan.k, include_center=True)
            .select(F.col("nbr").alias("cell"))
            .distinct()
        )
        # neighbor VALUES must come from the full state; only the output
        # set is restricted — semi-join after the smooth keeps the plan
        # a pure subset of the batch plan (bit-identical results)
        smoothed = smooth(cells, self.plan).join(affected, "cell", "left_semi")

        # fold into the maintained full snapshot
        prev_smooth = self.current_smoothed()
        snap_tmp = self._smooth_path + f".b{batch_id}"
        if prev_smooth is None:
            base = smoothed
        else:
            prev_keep = prev_smooth.join(affected, "cell", "left_anti")
            base = prev_keep.unionByName(smoothed)
        base.write.mode("overwrite").parquet(snap_tmp)
        if os.path.exists(self._smooth_path):
            import shutil

            shutil.rmtree(self._smooth_path)
        os.rename(snap_tmp, self._smooth_path)
        new.unpersist()

    # -- stream wiring -----------------------------------------------------------
    def start(self, source_dir: str, checkpoint_dir: str, available_now: bool = True):
        from cuda_gis_smoothing_spark.sources.images import IMAGES_SCHEMA

        stream = (
            self.spark.readStream.schema(IMAGES_SCHEMA)
            .option("maxFilesPerTrigger", 4)
            .parquet(source_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
