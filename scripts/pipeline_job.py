#!/usr/bin/env python
"""spark-submit entry point for the flagship pipeline (north_rule: runs
via ``spark-submit --py-files`` on a multi-executor cluster).

    ./scripts/submit_pipeline.sh --images /path/to/images_table \\
        --out /path/to/out --run-dir /path/to/run1 --variant gaussian_k2

Resumable: stages checkpoint under --run-dir (plans/lineage.py); rerun
the same command after a kill and completed stages are skipped. Lineage
and per-stage metrics are printed as JSON at the end.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="images table path (sources.images layout)")
    ap.add_argument("--out", required=True, help="output path for smoothed+tiled results")
    ap.add_argument("--run-dir", required=True, help="checkpoint/lineage directory")
    ap.add_argument("--variant", default="gaussian_k2")
    ap.add_argument("--zoom", type=int, default=12)
    ap.add_argument("--salt-buckets", type=int, default=0)
    ap.add_argument("--synthesize", type=int, default=0, help="synthesize N images first")
    args = ap.parse_args(argv)

    # on a real cluster: spark-submit provides the session; locally we build one
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("cuda-gis-smoothing-spark-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from cuda_gis_smoothing_spark.operators.smoothing import smooth
    from cuda_gis_smoothing_spark.operators.spatial import tile_assignment
    from cuda_gis_smoothing_spark.plans.config import ALL_VARIABLES, SmoothingPlan
    from cuda_gis_smoothing_spark.plans.lineage import ResumableRun
    from cuda_gis_smoothing_spark.plans.pipeline import PipelineConfig, ingest_cells
    from cuda_gis_smoothing_spark.sources.images import read_images, write_images
    from cuda_gis_smoothing_spark.sources.sink import write_ordered

    if args.synthesize:
        write_images(spark, args.images, args.synthesize)

    images = read_images(spark, args.images)
    cfg = PipelineConfig(
        plan=SmoothingPlan(variant=args.variant, variables=ALL_VARIABLES),
        zoom=args.zoom,
        salt_buckets=args.salt_buckets,
    )

    run = ResumableRun(spark, args.run_dir)
    cells = run.stage("cells", lambda: ingest_cells(images, cfg))
    smoothed = run.stage("smoothed", lambda: smooth(cells, cfg.plan))
    tiled = run.stage(
        "tiled",
        lambda: smoothed.join(tile_assignment(cells, zoom=cfg.zoom), "cell").join(
            cells.select("cell", "n_images"), "cell"
        ),
    )
    write_ordered(tiled, args.out)

    print(json.dumps(run.metrics()))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
