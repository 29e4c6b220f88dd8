"""SmoothingPlan — the engine's logical-plan flags.

Mirrors the reference's five CLI plan flags (`setOptions`,
/root/reference/src/cuda/hex_smooth_cuda_v5.cu:416-420,586-592,852-880):
``use_second_order``, ``use_gaussian_weights``, ``use_kernel_fusion``,
``use_recursive_bisection``, ``bisection_levels`` — re-expressed as the
knobs that actually matter under Spark's execution model. "Kernel
fusion" is the multi-variable single-shuffle aggregate; "recursive
bisection / Morton reordering" is range partitioning on a
space-filling-curve key; the CUDA grid/block geometry has no analog
(Catalyst + AQE own physical scheduling).
"""

from __future__ import annotations

from dataclasses import dataclass

from cuda_gis_smoothing_spark.oracle import VARIANTS

ALL_VARIABLES = ("ndvi", "mndwi", "evi", "ndwi")


@dataclass(frozen=True)
class SmoothingPlan:
    #: weight scheme + neighborhood order; one of oracle.VARIANTS
    #: (simple_k1 | gaussian_k1 | gaussian_k2 | uniform_k2) — the
    #: reference's CLI configs (scripts/test-v5.sh:29-46).
    variant: str = "simple_k1"
    #: variables smoothed in ONE groupBy (reference v4 "kernel fusion",
    #: src/cuda/hex_smooth_cuda_v4.cu:59-111). A single entry == the
    #: unfused v1-v3 path.
    variables: tuple[str, ...] = ("ndvi",)
    #: broadcast the cell->value side of the neighbor join when True;
    #: None = let Catalyst/AQE decide by size (the shared-memory-cache
    #: analog, see SURVEY.md §4).
    broadcast_values: bool | None = None
    #: range-partition + sort on the Morton key before smoothing — the
    #: reference's O1/O2 spatial reordering. Off by default: at the
    #: reference's own scale reordering LOST to no-reorder
    #: (docs/IMPLEMENTATION_DETAILS.md:46-48), and under Spark a hash
    #: shuffle on cell is already key-clustered.
    spatial_reorder: bool = False
    #: ring-2 semantics: False = geometric k-ring (all cells at hex
    #: distance 2; pure arithmetic, no extra join) — identical to the
    #: reference on hole-free grids. True = the reference's literal
    #: adjacency-based neighbors-of-neighbors (reachable only through a
    #: present ring-1 cell, src/cuda/hex_smooth_cuda_v5.cu:423-463),
    #: which differs on ragged grids and costs a two-hop join.
    strict_second_order: bool = False
    #: number of output partitions for reordering / writes (None = AQE)
    num_partitions: int | None = None
    #: salt buckets for skewed per-cell aggregation in ingest (0 = off)
    salt_buckets: int = 0
    #: physical strategy: "gather" (kring explode + join + groupBy) or
    #: "scatter" (explode contributions toward targets, ONE exchange at
    #: cell cardinality, semi-join validity filter) — two physical
    #: variants of the same logical operator, cross-validated in tests;
    #: scatter measured ~12% faster at D2 scale and ships partials, not
    #: joined rows, through the shuffle. Gather required for strict
    #: adjacency ring-2.
    strategy: str = "gather"

    def __post_init__(self) -> None:
        if self.variant not in VARIANTS:
            raise ValueError(f"unknown variant {self.variant!r}; one of {sorted(VARIANTS)}")
        for v in self.variables:
            if v not in ALL_VARIABLES:
                raise ValueError(f"unknown variable {v!r}")

    @property
    def k(self) -> int:
        return 2 if self.variant.endswith("_k2") else 1

    @property
    def ring_weights(self) -> dict[int, float]:
        return dict(VARIANTS[self.variant])


#: the reference's benchmark sweep configs (test-v5.sh:29-46), fused
FUSED_SWEEP: tuple[SmoothingPlan, ...] = tuple(
    SmoothingPlan(variant=v, variables=ALL_VARIABLES)
    for v in ("simple_k1", "gaussian_k1", "gaussian_k2", "uniform_k2")
)
