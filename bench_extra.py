#!/usr/bin/env python
"""Extra benchmarks for the optimization round (guide §1.4): isolate
declared queries with the noop sink, min-of-N repeats, and capture
``explain("formatted")`` per query. bench.py itself is FROZEN for
measurement; this file exists so optimization evidence (isolated walls,
plan shapes) can be produced without touching it.

Usage:
  python bench_extra.py q <name> [<name> ...]   # isolated min-of-3 walls
  python bench_extra.py plan <name> [...]       # write plans/r06/<name>_<tag>.txt
  python bench_extra.py all                     # every BENCH_QUERIES entry, 1 run

Env:
  SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS  as bench.py
  BENCH_EXTRA_REPS     repeats per query (default 3, min kept)
  BENCH_EXTRA_TAG      plan-file suffix (default "before")
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
TAG = os.environ.get("BENCH_EXTRA_TAG", "before")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from cuda_gis_smoothing_spark.session import get_spark

    import __spark_entry__ as entry_mod
    from bench import BENCH_QUERIES, BENCH_SPARK_CONF

    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = sys.argv[2:]
    spark = get_spark(app="bench-extra", cores=CPUS, extra=BENCH_SPARK_CONF)
    qs = entry_mod.queries()

    if mode == "plan":
        os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(REPO, "plans", "r06", f"{name}_{TAG}.txt")
            with open(path, "w") as f:
                f.write(txt)
            log(f"wrote {path}")
        spark.stop()
        return

    if mode == "all":
        names = list(BENCH_QUERIES)
        reps = 1
    else:
        reps = REPS

    # warm-up pass (codegen/JIT) mirroring bench.py
    _noop(qs["smooth_fused_k2"](spark, SF_DIR))
    out = {}
    for name in names:
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            _noop(qs[name](spark, SF_DIR))
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
        out[name] = round(best, 3)
        log(f"{name}: {out[name]}s (min of {reps})")
    print(__import__("json").dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
