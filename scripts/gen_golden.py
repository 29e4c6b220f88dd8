#!/usr/bin/env python
"""Generate the committed golden fixtures (FIXTURES.md T5) from the
pure-Python oracle — the analog of the reference's golden CSVs
(smoothed_<impl>.csv, scripts/case-study.sh:107-137). Deterministic:
same bytes on every run (seeded fixtures, fixed float formatting).

Run from the repo root:  python scripts/gen_golden.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cuda_gis_smoothing_spark import datagen, oracle  # noqa: E402
from cuda_gis_smoothing_spark.functions import codecs  # noqa: E402
from cuda_gis_smoothing_spark.hexgrid import GridSpec, latlng_to_tile  # noqa: E402

OUT = os.path.join(REPO, "tests", "golden")
GRID_SIDE = 24
N_IMAGES = 200
FLOAT_FMT = "%.10f"


def smoothed_expected() -> pd.DataFrame:
    cells = datagen.gen_cells(side=GRID_SIDE, n_isolated=2)
    vals = {
        int(r.cell): {v: float(getattr(r, v)) for v in ("ndvi", "mndwi", "evi", "ndwi")}
        for r in cells.itertuples()
    }
    frames = []
    for variant in sorted(oracle.VARIANTS):
        out = oracle.smooth_cells(vals, variant, variables=("ndvi", "mndwi", "evi", "ndwi"))
        pdf = pd.DataFrame(
            [
                {"cell": c, "variant": variant, **{f"smoothed_{v}": out[c][v] for v in out[c]}}
                for c in sorted(out)
            ]
        )
        frames.append(pdf)
    return pd.concat(frames, ignore_index=True)


def tiles_expected() -> pd.DataFrame:
    g = GridSpec()
    imgs = datagen.gen_images(N_IMAGES)
    lat, lon = datagen.phash_to_latlng(imgs["phash"].to_numpy())
    cell = g.latlng_to_cell(lat, lon)
    clat, clon = g.cell_to_latlng(cell)
    tx, ty = latlng_to_tile(clat, clon, 12)
    return pd.DataFrame(
        {
            "image_id": imgs["image_id"],
            "cell": cell,
            "tile_x": tx.astype(np.int32),
            "tile_y": ty.astype(np.int32),
            "zoom": np.int32(12),
        }
    )


def pip_expected() -> pd.DataFrame:
    imgs = datagen.gen_images(N_IMAGES)
    lat, lon = datagen.phash_to_latlng(imgs["phash"].to_numpy())
    rings = [
        (row.region_id, [(p[0], p[1]) for p in row.ring_xy])
        for row in datagen.gen_boundaries().itertuples()
    ]
    region = []
    for la, lo in zip(lat, lon):
        rid = ""
        for r, ring in rings:
            if oracle.point_in_polygon(float(lo), float(la), ring):
                rid = r
                break
        region.append(rid)
    return pd.DataFrame({"image_id": imgs["image_id"], "region_id": region})


def features_expected() -> pd.DataFrame:
    g = GridSpec()
    imgs = datagen.gen_images(N_IMAGES)
    rows = []
    for r in imgs.itertuples():
        pix = codecs.decode(r.bytes, r.fmt, int(r.w), int(r.h))
        m = pix.reshape(-1, 3).mean(axis=0)
        lat, lon = datagen.phash_to_latlng(np.int64(r.phash))
        rows.append(
            {
                "image_id": r.image_id,
                "cell": int(g.latlng_to_cell(lat, lon)),
                "ndvi": float((m[1] - m[0]) / (m[1] + m[0] + 1e-9)),
            }
        )
    return pd.DataFrame(rows)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, fn in (
        ("smoothed_expected", smoothed_expected),
        ("tiles_expected", tiles_expected),
        ("pip_expected", pip_expected),
        ("features_expected", features_expected),
    ):
        path = os.path.join(OUT, f"{name}.csv")
        fn().to_csv(path, index=False, float_format=FLOAT_FMT)
        print("wrote", path)


if __name__ == "__main__":
    main()
