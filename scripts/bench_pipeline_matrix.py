"""One-off measurement for VERDICT r3 item #1: the 20k-image pipeline
headline regressed 1.48 -> 4.16 s between r2 and r3 while the 1M-image
scaling throughput improved. Suspects: the r3 default switch to the
scatter smoothing strategy, and/or the salted ingest branch.

Runs run_pipeline at the headline size over the 4 combos
(strategy gather/scatter x salt_buckets 0/8), min-of-3 INTERLEAVED
trials (CLAUDE.md noise policy: trials of the same config never run
back-to-back so a host-noise epoch hits all configs equally).

Usage: python scripts/bench_pipeline_matrix.py [n_images] [reps]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main():
    import bench  # reuses the session config bench.py uses
    from cuda_gis_smoothing_spark.plans.config import ALL_VARIABLES, SmoothingPlan
    from cuda_gis_smoothing_spark.plans.pipeline import PipelineConfig, run_pipeline
    from cuda_gis_smoothing_spark.sources.images import read_images

    from cuda_gis_smoothing_spark.session import get_spark

    spark = get_spark(
        app="bench-pipeline-matrix", cores=bench.CPUS, extra=bench.BENCH_SPARK_CONF
    )
    path = bench.ensure_images(spark, N)

    combos = {
        f"{strat}_salt{sb}": PipelineConfig(
            plan=SmoothingPlan(
                variant="gaussian_k2", variables=ALL_VARIABLES, strategy=strat
            ),
            salt_buckets=sb,
        )
        for strat in ("gather", "scatter")
        for sb in (0, 8)
    }

    def one(cfg):
        spark.catalog.clearCache()
        images = read_images(spark, path)
        t0 = time.perf_counter()
        bench._run_noop(run_pipeline(images, cfg))
        return time.perf_counter() - t0

    # warm-up: JIT/codegen/page cache once per config
    for name, cfg in combos.items():
        one(cfg)
    times = {name: [] for name in combos}
    for _ in range(REPS):
        for name, cfg in combos.items():
            times[name].append(one(cfg))
    out = {
        name: {"min": round(min(ts), 3), "all": [round(t, 3) for t in ts]}
        for name, ts in times.items()
    }
    print(json.dumps({"n_images": N, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
