"""cuda_gis_smoothing_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query semantics of the reference CUDA
case study (MaxMLang/cuda-gis-smoothing at /root/reference): k-ring
neighbor-average smoothing over a hexagonal grid with simple / Gaussian /
extended-two-ring weight schemes, multi-variable fusion, spatial
reordering, and golden-output cross-validation — plus the graft-mandated
image ingestion (H3-style cell encoding via Arrow-batched pandas UDFs),
point-in-polygon, kNN, raster-tile materialization, dedup / similarity /
text-analysis operators, and checkpointed, lineage-tracked execution.

Architecture is Spark-first: the grid is a DataFrame keyed by cell id,
neighbor expansion is pure column arithmetic (explode of literal ring
offsets), smoothing is ONE equi-join + ONE multi-aggregate groupBy, and
Catalyst/Tungsten pick the physical strategy. No RDDs; Python only runs
inside Arrow-batched UDFs (pixel codecs, geolocation).
"""

__version__ = "0.1.0"

from cuda_gis_smoothing_spark import hexgrid  # noqa: F401
