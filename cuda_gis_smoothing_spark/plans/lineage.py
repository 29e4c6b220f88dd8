"""Checkpointed resume + per-partition lineage (north_rule mandate).

Stage outputs are written to deterministic paths under a run directory;
a stage whose ``_SUCCESS``-marked output already exists is SKIPPED on
re-run, so a killed job resumes mid-pipeline. Each materialization also
emits per-partition lineage rows (partition id, row count, value
checksum) — computed with ``mapInPandas`` so the audit itself is
distributed and Arrow-batched.

This replaces nothing in the reference (it has no resume story — a
SLURM job rerun recomputes everything, scripts/case-study.sh:3-20); it
is required for 100 TB jobs where preemption is routine.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _stage_path(run_dir: str, name: str) -> str:
    return os.path.join(run_dir, f"stage={name}")


def stage_exists(run_dir: str, name: str) -> bool:
    p = _stage_path(run_dir, name)
    return os.path.exists(os.path.join(p, "_SUCCESS"))


def checkpoint_stage(
    df: DataFrame, run_dir: str, name: str, partition_cols: list[str] | None = None
) -> DataFrame:
    """Materialize ``df`` as stage ``name`` (skip if already done) and
    return the stage read back — downstream plans cut lineage here."""
    spark = df.sparkSession
    p = _stage_path(run_dir, name)
    if not stage_exists(run_dir, name):
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(p)
        lineage = collect_lineage(spark.read.parquet(p))
        with open(os.path.join(run_dir, f"lineage_{name}.json"), "w") as f:
            json.dump(lineage, f, indent=2)
    return spark.read.parquet(p)


def lineage_rows(df: DataFrame) -> DataFrame:
    """Per-partition audit rows: (partition_id, n_rows, checksum).

    The checksum is order-insensitive (sum of per-row xxhash-like
    mixes) so it is stable under intra-partition reordering.
    """
    cols = df.columns

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        n = 0
        chk = 0
        for pdf in it:
            n += len(pdf)
            h = pd.util.hash_pandas_object(
                pdf[cols].astype(str), index=False
            ).to_numpy()
            chk = (chk + int(h.sum())) % (1 << 63)
        yield pd.DataFrame(
            {"partition_id": [pid], "n_rows": [n], "checksum": [chk]}
        )

    return df.mapInPandas(fn, schema="partition_id int, n_rows long, checksum long")


def collect_lineage(df: DataFrame) -> list[dict]:
    return [r.asDict() for r in lineage_rows(df).collect()]


class ResumableRun:
    """Orchestrates a multi-stage pipeline with skip-if-done semantics.

    >>> run = ResumableRun(spark, "/tmp/run1")
    >>> cells = run.stage("cells", lambda: ingest_cells(images, cfg))
    >>> out   = run.stage("smoothed", lambda: smooth(cells, plan))
    """

    def __init__(self, spark: SparkSession, run_dir: str):
        self.spark = spark
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.executed: list[str] = []
        self.skipped: list[str] = []

    def stage(self, name: str, build, partition_cols: list[str] | None = None) -> DataFrame:
        if stage_exists(self.run_dir, name):
            self.skipped.append(name)
            return self.spark.read.parquet(_stage_path(self.run_dir, name))
        self.executed.append(name)
        return checkpoint_stage(build(), self.run_dir, name, partition_cols)

    def metrics(self) -> dict:
        out = {"executed": self.executed, "skipped": self.skipped, "stages": {}}
        for fn in os.listdir(self.run_dir):
            if fn.startswith("lineage_") and fn.endswith(".json"):
                with open(os.path.join(self.run_dir, fn)) as f:
                    rows = json.load(f)
                out["stages"][fn[len("lineage_"):-len(".json")]] = {
                    "partitions": len(rows),
                    "rows": sum(r["n_rows"] for r in rows),
                    "checksum": sum(r["checksum"] for r in rows) % (1 << 63),
                }
        return out
