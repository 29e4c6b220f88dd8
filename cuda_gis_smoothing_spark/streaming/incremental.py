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

State storage is a base+delta log (a miniature of the Iceberg/Delta
snapshot model), NOT a full rewrite per batch:

  ``<state>/cell_aggregates/base-b00000007/``   full snapshot as of batch 7
  ``<state>/cell_aggregates/delta-b00000008/``  merged rows for cells
                                                updated in batch 8 only

Reading = newest base ∪ later deltas, latest batch wins per cell
(one ``max_by`` aggregate). A batch therefore writes O(updated cells),
not O(total state); every ``compact_every`` deltas the view is folded
into a fresh base and subsumed dirs are garbage-collected. Writes are
idempotent by batch id — foreachBatch may replay a batch after a crash,
and an existing ``delta-b{id}`` dir makes the replay a no-op — and
crash-safe: a base is visible only after it is fully written, and
leftover subsumed dirs lose latest-wins anyway, so GC can die midway
with no correctness effect.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.hexgrid import GridSpec
from cuda_gis_smoothing_spark.operators.multimodal import cell_partials
from cuda_gis_smoothing_spark.operators.smoothing import (
    derive_variables,
    kring_edges,
    smooth,
)
from cuda_gis_smoothing_spark.plans.config import SmoothingPlan

_SNAP_RE = re.compile(r"^(base|delta)-b(\d+)$")


class SnapshotLog:
    """Base+delta parquet log with latest-wins-per-key reads."""

    def __init__(
        self, spark: SparkSession, path: str, key: str | list[str] = "cell"
    ):
        self.spark = spark
        self.path = path
        # composite keys (e.g. a bigram's (t1, t2)) are a key LIST —
        # latest-wins then groups on all parts, no concat-key ambiguity
        self.keys = [key] if isinstance(key, str) else list(key)
        self.key = self.keys[0]

    def _snapshots(self) -> list[tuple[int, str, str]]:
        """[(batch_id, kind, dir)] sorted by batch_id."""
        if not os.path.isdir(self.path):
            return []
        out = []
        for name in os.listdir(self.path):
            m = _SNAP_RE.match(name)
            if m:
                out.append((int(m.group(2)), m.group(1), os.path.join(self.path, name)))
        return sorted(out)

    def _live(self, before_batch_id: int | None = None) -> list[tuple[int, str, str]]:
        """Newest base plus every later delta (earlier dirs are
        subsumed — present only if a GC died midway; harmless).
        ``before_batch_id`` restricts the view to snapshots with a
        strictly smaller batch id — the crash-replay read: a batch
        re-reading prior state must NOT see its own crashed delta."""
        snaps = self._snapshots()
        if before_batch_id is not None:
            snaps = [s for s in snaps if s[0] < before_batch_id]
        bases = [s for s in snaps if s[1] == "base"]
        floor = bases[-1][0] if bases else -1
        return ([bases[-1]] if bases else []) + [
            s for s in snaps if s[1] == "delta" and s[0] > floor
        ]

    def has(self, batch_id: int) -> bool:
        return any(b == batch_id for b, _, _ in self._snapshots())

    def oldest_batch_id(self) -> int | None:
        """Smallest batch id with any snapshot (base or delta), or
        None for an empty log — the PUBLIC form of the replay-stability
        question 'does this log predate batch N?' (crash-recovery
        decisions must not depend on the private snapshot layout)."""
        snaps = self._snapshots()
        return snaps[0][0] if snaps else None

    def delta_count(self) -> int:
        return sum(1 for _, kind, _ in self._live() if kind == "delta")

    def read(self, before_batch_id: int | None = None) -> DataFrame | None:
        """Latest-wins view. Pass ``before_batch_id`` when reading PRIOR
        state while (re)processing that batch id: a crash between this
        log's delta write and the replay-guard log's write leaves a
        delta for the in-flight batch, and an unfiltered read would
        feed the batch its own partial output as 'prior' state."""
        live = self._live(before_batch_id)
        if not live:
            return None
        parts = [
            self.spark.read.parquet(d).withColumn("_b", F.lit(b)) for b, _, d in live
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        if len(parts) == 1:
            return df.drop("_b")
        vals = [c for c in df.columns if c not in (*self.keys, "_b")]
        return (
            df.groupBy(*self.keys)
            .agg(F.max_by(F.struct(*vals), F.col("_b")).alias("_s"))
            .select(*self.keys, "_s.*")
        )

    def write_delta(self, df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(self.path, f"delta-b{batch_id:08d}")
        )

    def read_delta(self, batch_id: int) -> DataFrame:
        """Read back ONE batch's delta — the already-written parquet IS
        a materialization, so a processor that derives further state
        from its own delta (MaintainedPostings' dfreq/stats diffs)
        reads it instead of paying a second checkpoint of the same
        rows."""
        return self.spark.read.parquet(
            os.path.join(self.path, f"delta-b{batch_id:08d}")
        )

    def compact(self, batch_id: int) -> None:
        """Fold the live view into ``base-b{batch_id}`` and GC subsumed
        dirs. Visible only once fully written; idempotent per batch."""
        base = os.path.join(self.path, f"base-b{batch_id:08d}")
        if os.path.exists(base):
            return
        view = self.read()
        if view is None:
            return
        view.write.mode("overwrite").parquet(base + ".tmp")
        os.rename(base + ".tmp", base)
        for b, kind, d in self._snapshots():
            if d != base and b <= batch_id:
                shutil.rmtree(d, ignore_errors=True)


def _merge_cell_partials(
    spark: SparkSession, agg: SnapshotLog, partials: DataFrame, batch_id: int
):
    """Fold ``(cell, sum_ndvi, n)`` partial rows into a cell-aggregate
    SnapshotLog — the ONE merge implementation shared by every
    cell-state maintainer (IncrementalSmoother, IncrementalFlowRouter;
    the drift-prevention class). O(batch) updated-cell merge,
    idempotent by batch id (crash replay re-reads the existing delta).
    Returns ``(updated_cells_df, cached_new_or_None)``, or ``None``
    when the batch is empty or already applied AND compacted away;
    callers must ``unpersist()`` the cached frame when done."""
    new = None
    agg_delta_dir = os.path.join(agg.path, f"delta-b{batch_id:08d}")
    if agg.has(batch_id):  # crash replay: batch already applied
        if not os.path.isdir(agg_delta_dir):
            return None  # applied AND compacted away — fully done
        return spark.read.parquet(agg_delta_dir).select("cell"), None
    new = (
        partials.groupBy("cell")
        .agg(F.sum("sum_ndvi").alias("sum_ndvi"), F.sum("n").alias("n"))
        .cache()
    )
    if new.isEmpty():
        new.unpersist()
        return None
    prev = agg.read()
    if prev is None:
        merged = new
    else:
        # only updated cells are re-merged and re-written:
        # O(batch), not O(state)
        merged = (
            prev.join(new.select("cell"), "cell", "left_semi")
            .unionByName(new)
            .groupBy("cell")
            .agg(F.sum("sum_ndvi").alias("sum_ndvi"), F.sum("n").alias("n"))
        )
    agg.write_delta(merged, batch_id)
    return new.select("cell"), new


class IncrementalSmoother:
    """foreachBatch sink: merge partials, re-smooth affected k-rings."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        plan: SmoothingPlan | None = None,
        grid: GridSpec | None = None,
        compact_every: int = 8,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.plan = plan or SmoothingPlan(variant="gaussian_k1", variables=("ndvi",))
        self.grid = grid or GridSpec()
        self.compact_every = compact_every
        os.makedirs(state_dir, exist_ok=True)
        self._agg = SnapshotLog(spark, os.path.join(state_dir, "cell_aggregates"))
        self._smooth = SnapshotLog(spark, os.path.join(state_dir, "smoothed"))

    # -- state views -----------------------------------------------------------
    def current_aggregates(self) -> DataFrame | None:
        return self._agg.read()

    def current_smoothed(self) -> DataFrame | None:
        return self._smooth.read()

    def state_cells(self) -> DataFrame | None:
        """The value surface recovered from state: sum/n is exact when
        partials ride as (value, n=1) — the same contract as
        IncrementalFlowRouter.state_cells (one cell-state recovery
        rule across the maintainers). Serves any (cell, ndvi)-shaped
        batch operator from maintained state (zonal_stats_maintained
        routes here)."""
        state = self._agg.read()
        if state is None:
            return None
        return state.select(
            "cell", (F.col("sum_ndvi") / F.col("n")).alias("ndvi")
        )

    # -- the foreachBatch body -------------------------------------------------
    def process_batch(self, images_batch: DataFrame, batch_id: int) -> None:
        self.process_partials(cell_partials(images_batch, self.grid), batch_id)

    def process_partials(self, partials: DataFrame, batch_id: int) -> None:
        """Fold pre-aggregated ``(cell, sum_ndvi, n)`` partial rows into
        the state (the packer's accepts-pre-counted-rows precedent:
        callers that already hold cell aggregates — a stored cell
        table, a different decoder — skip the image decode). Multiple
        rows per cell are fine; they merge additively."""
        res = _merge_cell_partials(self.spark, self._agg, partials, batch_id)
        if res is None:
            return
        updated, new = res

        if not self._smooth.has(batch_id):
            # affected = updated cells ∪ k-ring(updated): every cell
            # whose smoothed value references an updated aggregate
            state = self._agg.read()
            cells = derive_variables(
                state.select("cell", (F.col("sum_ndvi") / F.col("n")).alias("ndvi"))
            )
            affected = (
                kring_edges(updated, self.plan.k, include_center=True)
                .select(F.col("nbr").alias("cell"))
                .distinct()
            )
            # neighbor VALUES come from the full state; only the output
            # set is restricted. restrict_to generates the k-ring edges
            # from the affected set alone (geometric gather), so the
            # per-batch smooth is O(affected x ring) — a full-state
            # smooth + semi-join here would re-do O(state) work every
            # batch, exactly the scale trap the strict curator's
            # gram-postings fix closed
            smoothed = smooth(cells, self.plan, restrict_to=affected)
            self._smooth.write_delta(smoothed, batch_id)

        if self._agg.delta_count() >= self.compact_every:
            self._agg.compact(batch_id)
            self._smooth.compact(batch_id)
        if new is not None:
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


class IncrementalFlowRouter:
    """foreachBatch sink maintaining D6 flow direction over streaming
    cell aggregates — the :class:`IncrementalSmoother` pattern applied
    to the hydrology family. Per batch: merge ``(cell, sum_ndvi, n)``
    partials (the SHARED :func:`_merge_cell_partials` core), then
    recompute flow direction ONLY for affected = updated ∪
    ring-1(updated) via ``flow_direction(restrict_to=...)`` — a cell's
    steepest-descent target references exactly its ring-1 neighborhood
    and the operator is a single pass over current values (never
    iterative), so no other cell's routing can change: per-batch work
    is O(affected × ring), not O(grid).

    Downstream products (basins, accumulation, path length, TWI) are
    CLOSURES over fd: one updated cell can relabel an arbitrarily long
    downstream path, so maintaining them incrementally is decremental
    reachability (the MaintainedComponents edge-deletion class —
    documented out). They are instead recomputed from the maintained
    fd state on read; the fd log IS their stored input table at 100 TB.

    The fd log is written AFTER the aggregate log and is keyed by cell
    (latest-wins): a crash between the two writes replays the batch,
    re-reads the existing aggregate delta for its updated set, and
    rewrites the same fd rows — idempotent by batch id.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        grid: GridSpec | None = None,
        compact_every: int = 8,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.grid = grid or GridSpec()
        self.compact_every = compact_every
        os.makedirs(state_dir, exist_ok=True)
        self._agg = SnapshotLog(spark, os.path.join(state_dir, "cell_aggregates"))
        self._fd = SnapshotLog(spark, os.path.join(state_dir, "flow_direction"))

    # -- state views -----------------------------------------------------------
    def current_aggregates(self) -> DataFrame | None:
        return self._agg.read()

    def current_flow(self) -> DataFrame | None:
        """Latest-wins per-cell ``(cell, flow_to, descent)`` view."""
        fd = self._fd.read()
        return None if fd is None else fd.select("cell", "flow_to", "descent")

    def state_cells(self) -> DataFrame | None:
        """The value surface recovered from state: sum/n is exact when
        partials ride as (value, n=1) — the smooth_maintained
        contract."""
        state = self._agg.read()
        if state is None:
            return None
        return state.select(
            "cell", (F.col("sum_ndvi") / F.col("n")).alias("ndvi")
        )

    def cost_distance(self, **kwargs) -> DataFrame | None:
        """Cost-distance to the stream network served from maintained
        cell state — a CLOSURE product (the basins/accumulation
        recompute-on-read contract: one updated cell can re-route an
        arbitrarily long optimal path, so the bounded relaxation
        recomputes over the maintained surface; the aggregate log IS
        its stored input table at 100 TB). sum/n recovers values
        exactly when partials ride as (value, n=1), so a single-batch
        instance equals the batch operator bit-for-bit (the SHARED
        twin argument). The seed derivation reuses the MAINTAINED flow
        log (fd=current_flow) — the whole point of the router's state
        is that the fd derivation is never recomputed at read time
        (review catch)."""
        from cuda_gis_smoothing_spark.operators.hydrology import cost_distance

        cells = self.state_cells()
        if cells is None:
            return None
        fd = self.current_flow().localCheckpoint()  # closure consumers
        return cost_distance(cells, fd=fd, **kwargs)

    def stream_networks(self, **kwargs) -> DataFrame | None:
        """Drainage-network labeling served from maintained state —
        the same closure-product contract as :meth:`cost_distance`
        (accumulation + CC recompute over the maintained fd/value
        surface on read; the fd derivation itself is never recomputed).
        Single batch == the batch operator exactly (SHARED twin)."""
        from cuda_gis_smoothing_spark.operators.hydrology import (
            stream_networks,
        )

        cells = self.state_cells()
        if cells is None:
            return None
        fd = self.current_flow().localCheckpoint()  # closure consumers
        return stream_networks(cells, fd=fd, **kwargs)

    def stream_junctions(self, **kwargs) -> DataFrame | None:
        """Confluence census served from maintained state — the same
        closure-product contract as :meth:`cost_distance` (upslope +
        inflow census recompute over the maintained fd/value surface on
        read; the fd derivation itself is never recomputed). Single
        batch == the batch operator exactly (SHARED twin)."""
        from cuda_gis_smoothing_spark.operators.hydrology import (
            stream_junctions,
        )

        cells = self.state_cells()
        if cells is None:
            return None
        fd = self.current_flow().localCheckpoint()  # closure consumers
        return stream_junctions(cells, fd=fd, **kwargs)

    def flow_load(self, **kwargs) -> DataFrame | None:
        """Value-weighted flow accumulation served from maintained
        state — same closure-product contract as :meth:`cost_distance`
        (the upslope micro-load sum recomputes over the maintained
        fd/value surface on read; the fd derivation itself is never
        recomputed). Single batch == the batch operator exactly
        (SHARED twin)."""
        from cuda_gis_smoothing_spark.operators.hydrology import flow_load

        cells = self.state_cells()
        if cells is None:
            return None
        fd = self.current_flow().localCheckpoint()  # closure consumers
        return flow_load(cells, fd=fd, **kwargs)

    # -- the foreachBatch body -------------------------------------------------
    def process_batch(self, images_batch: DataFrame, batch_id: int) -> None:
        self.process_partials(cell_partials(images_batch, self.grid), batch_id)

    def process_partials(self, partials: DataFrame, batch_id: int) -> None:
        from cuda_gis_smoothing_spark.operators.hydrology import flow_direction

        res = _merge_cell_partials(self.spark, self._agg, partials, batch_id)
        if res is None:
            return
        updated, new = res

        if not self._fd.has(batch_id):
            cells = self.state_cells()
            affected = (
                kring_edges(updated, 1, include_center=True)
                .select(F.col("nbr").alias("cell"))
                .distinct()
            )
            self._fd.write_delta(
                flow_direction(cells, restrict_to=affected), batch_id
            )

        if self._agg.delta_count() >= self.compact_every:
            self._agg.compact(batch_id)
            self._fd.compact(batch_id)
        if new is not None:
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


class IncrementalPyramid:
    """foreachBatch sink maintaining a grid overview level over
    streaming cell aggregates — the third instance of the shared
    cell-state pattern (:class:`IncrementalSmoother` re-smooths
    k-rings, :class:`IncrementalFlowRouter` re-routes neighborhoods,
    this re-aggregates coarse cells): per batch, merge partials via
    :func:`_merge_cell_partials`, then recompute ONLY the coarse cells
    containing an updated fine cell via
    ``grid_downsample(restrict_to=...)`` — a coarse cell's count/mean/
    min/max reference exactly its factor² fine cells, so no other
    coarse cell can change; per-batch work is O(affected × factor²).
    min/max are NOT maintained by merging (a fine cell's mean can
    DECREASE when new partials arrive — decrement-unsafe); the
    restricted recompute from fine state sidesteps that entirely.
    The coarse log (key ``coarse_cell``) is written LAST (replay
    guard)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        factor: int = 2,
        grid: GridSpec | None = None,
        compact_every: int = 8,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.factor = factor
        self.grid = grid or GridSpec()
        self.compact_every = compact_every
        os.makedirs(state_dir, exist_ok=True)
        self._agg = SnapshotLog(spark, os.path.join(state_dir, "cell_aggregates"))
        self._coarse = SnapshotLog(
            spark, os.path.join(state_dir, "coarse"), key="coarse_cell"
        )

    def current_aggregates(self) -> DataFrame | None:
        return self._agg.read()

    def current_pyramid(self) -> DataFrame | None:
        """Latest-wins per-coarse-cell overview view."""
        c = self._coarse.read()
        if c is None:
            return None
        return c.select(
            "coarse_cell", "n_cells", "mean_value", "min_value", "max_value"
        )

    def state_cells(self) -> DataFrame | None:
        state = self._agg.read()
        if state is None:
            return None
        return state.select(
            "cell", (F.col("sum_ndvi") / F.col("n")).alias("ndvi")
        )

    def process_batch(self, images_batch: DataFrame, batch_id: int) -> None:
        self.process_partials(cell_partials(images_batch, self.grid), batch_id)

    def process_partials(self, partials: DataFrame, batch_id: int) -> None:
        from cuda_gis_smoothing_spark.operators.spatial import (
            coarse_cell_expr,
            grid_downsample,
        )

        res = _merge_cell_partials(self.spark, self._agg, partials, batch_id)
        if res is None:
            return
        updated, new = res

        if not self._coarse.has(batch_id):
            f = self.factor
            # SHARED key derivation (coarse_cell_expr) — a divergence
            # here would make the affected set miss coarse cells
            affected = updated.select(
                coarse_cell_expr(f).alias("coarse_cell")
            ).distinct()
            self._coarse.write_delta(
                grid_downsample(
                    self.state_cells(), f, restrict_to=affected
                ),
                batch_id,
            )

        if self._agg.delta_count() >= self.compact_every:
            self._agg.compact(batch_id)
            self._coarse.compact(batch_id)
        if new is not None:
            new.unpersist()
