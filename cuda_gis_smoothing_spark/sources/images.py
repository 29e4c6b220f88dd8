"""The images table: Iceberg-style source/sink over partitioned parquet.

BASELINE.json mandates "Iceberg tables of image + caption pairs". No
Iceberg runtime jar ships in this offline container (SURVEY.md §7 risk
list), so the table layer is partitioned parquet with a JSON manifest
standing in for snapshot metadata — same schema, same API surface
(``write_images`` / ``read_images``), swap-in ready for
``spark.read.format("iceberg")`` on a real cluster.

Synthesis is DISTRIBUTED: ``spark.range(n)`` → ``mapInPandas`` batch
generator, so fixture creation itself exercises the Arrow batch path
and scales with executors instead of looping on the driver.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def synthesize_images(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic distributed synthesis of the T1 images fixture."""
    from cuda_gis_smoothing_spark.datagen import gen_images

    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids = pdf["id"].to_numpy()
            if not len(ids):
                continue
            if (ids == ids[0] + np.arange(len(ids))).all():
                # spark.range partitions arrive as contiguous slices
                yield gen_images(len(ids), start=int(ids[0]))
            else:  # defensive: non-contiguous chunk → per-id generation
                yield pd.concat([gen_images(1, start=int(i)) for i in ids])

    return spark.range(0, n, 1, parts).mapInPandas(gen, schema=IMAGES_SCHEMA)


def write_images(
    spark: SparkSession, path: str, n: int, partitions: int | None = None
) -> str:
    """Materialize the images table + manifest; returns the path.

    Layout choices that matter for scan parallelism (a parquet split
    can never be smaller than a row group, so giant row groups cap the
    number of tasks that can read the table): 8 MB row groups keep
    image-payload tables splittable, and compression is disabled —
    the payloads are already PNG/zlib-compressed, snappy on top only
    burns CPU on both sides of the scan.
    """
    df = synthesize_images(spark, n, partitions)
    (
        df.write.mode("overwrite")
        .option("parquet.block.size", 8 * 1024 * 1024)
        .option("compression", "none")
        .parquet(os.path.join(path, "data"))
    )
    manifest = {
        "table": "images",
        "format": "parquet",  # iceberg stand-in (no runtime jar offline)
        "schema": IMAGES_SCHEMA,
        "row_count": n,
        "snapshot_id": f"syn-{n}",
        "created_unix": int(time.time()),
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def read_images(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "data"))


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, "manifest.json")) as f:
        return json.load(f)
