"""Multimodal (image) operators: decode, feature-extract, resize,
frame-sample — Arrow-batched plumbing over opaque binary columns.

Images are (bytes, w, h, fmt) per BASELINE.json input_hint; ALL pixel
work happens inside ``mapInPandas``/``pandas_udf`` over Arrow batches —
never row-at-a-time Python in a Spark task loop (the rows iterate
inside numpy-vectorized batch code here, against payloads that are
already in process memory).

Availability honesty: raw + PNG decode are REAL (stdlib zlib); JPEG is
a clearly-marked deterministic lossy stand-in (functions/codecs.py) —
this container ships no image library. Audio/video frame-sampling is
plumbing-only: schema, batching and partitioning are real, the decoder
raises NotImplementedError unless a deterministic fake is requested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from cuda_gis_smoothing_spark.datagen import phash_to_latlng
from cuda_gis_smoothing_spark.functions import codecs
from cuda_gis_smoothing_spark.hexgrid import GridSpec

FEATURE_SCHEMA = (
    "image_id string, cell long, lat double, lon double, "
    "ndvi double, mean_r double, mean_g double, mean_b double"
)


def _features_batch(pdf: pd.DataFrame, grid: GridSpec) -> pd.DataFrame:
    n = len(pdf)
    mean_r = np.empty(n)
    mean_g = np.empty(n)
    mean_b = np.empty(n)
    fmts = pdf["fmt"].to_numpy()
    ws = pdf["w"].to_numpy()
    hs = pdf["h"].to_numpy()
    bts = pdf["bytes"].to_numpy()
    for i in range(n):  # loop over in-memory batch; decode is numpy-vectorized
        pix = codecs.decode(bts[i], fmts[i], int(ws[i]), int(hs[i]))
        # integer sum then divide: bit-identical to float mean for uint8
        # (every partial sum is an exact float64) at ~2/3 the cost
        m = pix.reshape(-1, 3).sum(axis=0, dtype=np.int64) / (pix.shape[0] * pix.shape[1])
        mean_r[i], mean_g[i], mean_b[i] = m
    # NDVI-like vegetation index from RGB means: (G - R) / (G + R)
    ndvi = (mean_g - mean_r) / (mean_g + mean_r + 1e-9)
    lat, lon = phash_to_latlng(pdf["phash"].to_numpy())
    cell = grid.latlng_to_cell(lat, lon)
    return pd.DataFrame(
        {
            "image_id": pdf["image_id"].to_numpy(),
            "cell": cell,
            "lat": lat,
            "lon": lon,
            "ndvi": ndvi,
            "mean_r": mean_r,
            "mean_g": mean_g,
            "mean_b": mean_b,
        }
    )


def image_features(images: DataFrame, grid: GridSpec | None = None) -> DataFrame:
    """Decode pixels + geolocate: the graft's "H3 cell encoding of
    images via batched pandas/Arrow UDF" step.

    Column pruning matters at 100 TB: this is the ONLY operator that
    reads ``bytes``; everything downstream selects metadata/feature
    columns so parquet scans never touch payloads again.
    """
    g = grid or GridSpec()

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _features_batch(pdf, g)

    return images.select("image_id", "bytes", "w", "h", "fmt", "phash").mapInPandas(
        fn, schema=FEATURE_SCHEMA
    )


def cell_partials(images: DataFrame, grid: GridSpec | None = None) -> DataFrame:
    """Decode + geolocate + PARTIAL per-cell aggregation in one Arrow
    batch pass: emits (cell, sum_ndvi, n) per batch instead of one row
    per image.

    This is manual map-side combine at the image→cell cardinality
    cliff: the Python→JVM return traffic and the shuffle input shrink
    from |images| rows to ≈ |cells per batch| rows, and a hot cell
    contributes at most one row PER BATCH to the shuffle — skew is
    eliminated structurally, before AQE even looks at it. At 100 TB
    this (not the join) is the pipeline's make-or-break shuffle.
    """
    g = grid or GridSpec()
    fmt_id = (
        F.when(F.col("fmt") == "rgb8_raw", F.lit(0))
        .when(F.col("fmt") == "png", F.lit(1))
        .otherwise(F.lit(2))
        .cast("tinyint")
        .alias("fmt_id")
    )
    src = images.select("bytes", "w", "h", fmt_id, "phash")

    def fn(batches):
        import pyarrow as pa

        for b in batches:
            yield _partials_arrow_batch(b, g)

    return src.mapInArrow(fn, schema="cell long, sum_ndvi double, n long")


_FMT_BY_ID = ("rgb8_raw", "png", "jpeg")


def _partials_arrow_batch(batch, grid: GridSpec):
    """One Arrow batch → per-cell partials, without pandas object churn.

    The bytes column is read by slicing the Arrow data buffer directly
    (offsets + memoryview): one copy per payload at decode time instead
    of a Python object per row on entry — the difference is most of the
    boundary cost for million-row binary batches.
    """
    import pyarrow as pa

    cols = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
    barr = cols["bytes"]
    _, offsets_buf, data_buf = barr.buffers()
    offs = np.frombuffer(offsets_buf, dtype=np.int32)[
        barr.offset : barr.offset + len(barr) + 1
    ]
    # cast to unsigned bytes: pa.Buffer exposes format 'b' (signed), and
    # memoryview equality compares ELEMENT VALUES, so magic-byte checks
    # in the codecs would silently fail against bytes literals
    data = memoryview(data_buf).cast("B")
    ws = cols["w"].to_numpy(zero_copy_only=False)
    hs = cols["h"].to_numpy(zero_copy_only=False)
    fids = cols["fmt_id"].to_numpy(zero_copy_only=False)
    phash = cols["phash"].to_numpy(zero_copy_only=False)

    n = len(barr)
    mean_r = np.empty(n)
    mean_g = np.empty(n)
    for i in range(n):
        pix = codecs.decode(
            data[offs[i] : offs[i + 1]], _FMT_BY_ID[fids[i]], int(ws[i]), int(hs[i])
        )
        # integer sum then divide: bit-identical to float mean for uint8
        # (every partial sum is an exact float64) at ~2/3 the cost
        m = pix.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        npix = pix.shape[0] * pix.shape[1]
        mean_r[i] = m[0] / npix
        mean_g[i] = m[1] / npix
    ndvi = (mean_g - mean_r) / (mean_g + mean_r + 1e-9)
    lat, lon = phash_to_latlng(phash)
    cell = grid.latlng_to_cell(lat, lon)

    # per-batch combine (numpy, no pandas): sum/count per unique cell
    uniq, inv = np.unique(cell, return_inverse=True)
    sums = np.bincount(inv, weights=ndvi)
    counts = np.bincount(inv)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(uniq, type=pa.int64()),
            pa.array(sums, type=pa.float64()),
            pa.array(counts.astype(np.int64), type=pa.int64()),
        ],
        names=["cell", "sum_ndvi", "n"],
    )


def geolocate(images: DataFrame, grid: GridSpec | None = None) -> DataFrame:
    """Cell-encode WITHOUT decoding pixels (metadata-only path): lat/lon
    from phash bits, cell via the batched grid UDF. Reads no payloads."""
    g = grid or GridSpec()

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lat, lon = phash_to_latlng(pdf["phash"].to_numpy())
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "cell": g.latlng_to_cell(lat, lon),
                    "lat": lat,
                    "lon": lon,
                }
            )

    return images.select("image_id", "phash").mapInPandas(
        fn, schema="image_id string, cell long, lat double, lon double"
    )


def decode_roundtrip(images: DataFrame) -> DataFrame:
    """Decode → re-encode(raw) → PSNR per image (the pixel-invariant
    audit used by tests: lossless formats are exact, lossy ≥ 40 dB)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            psnr = np.empty(n)
            for i in range(n):
                pix = codecs.decode(
                    pdf["bytes"].iat[i], pdf["fmt"].iat[i], int(pdf["w"].iat[i]), int(pdf["h"].iat[i])
                )
                back = codecs.decode(
                    codecs.encode(pix, pdf["fmt"].iat[i]),
                    pdf["fmt"].iat[i],
                    int(pdf["w"].iat[i]),
                    int(pdf["h"].iat[i]),
                )
                psnr[i] = codecs.psnr(pix, back)
                ok[i] = psnr[i] >= 40.0 or np.isinf(psnr[i])
            yield pd.DataFrame(
                {"image_id": pdf["image_id"], "psnr": psnr, "roundtrip_ok": ok}
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        fn, schema="image_id string, psnr double, roundtrip_ok boolean"
    )


def resize(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize → raw rgb8 payloads (real numpy impl)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for i in range(len(pdf)):
                pix = codecs.decode(
                    pdf["bytes"].iat[i], pdf["fmt"].iat[i], int(pdf["w"].iat[i]), int(pdf["h"].iat[i])
                )
                yy = (np.arange(out_h) * pix.shape[0] // out_h).clip(0, pix.shape[0] - 1)
                xx = (np.arange(out_w) * pix.shape[1] // out_w).clip(0, pix.shape[1] - 1)
                out.append(codecs.encode_rgb8_raw(pix[yy][:, xx]))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "bytes": out,
                    "w": np.int32(out_w),
                    "h": np.int32(out_h),
                    "fmt": "rgb8_raw",
                }
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        fn, schema="image_id string, bytes binary, w int, h int, fmt string"
    )


def frame_sample(videos: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Video frame-sampling PLUMBING: schema/batching/partitioning are
    real; actual video decode is unavailable in this container (STUB).

    With ``fake=True`` a deterministic stand-in emits one synthetic
    frame per sampled index so the downstream pipeline is testable.
    """

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "no video codec in this environment; pass fake=True for "
                    "the deterministic stand-in"
                )
            rows = {"video_id": [], "frame_idx": [], "bytes": [], "w": [], "h": [], "fmt": []}
            for i in range(len(pdf)):
                n_frames = int(pdf["n_frames"].iat[i])
                for f_idx in range(0, n_frames, every_n):
                    import zlib

                    from cuda_gis_smoothing_spark.datagen import gen_pixels

                    seed = (zlib.crc32(str(pdf["video_id"].iat[i]).encode()) ^ f_idx) & 0xFFFF
                    pix = gen_pixels(seed, 16, 16)
                    rows["video_id"].append(pdf["video_id"].iat[i])
                    rows["frame_idx"].append(f_idx)
                    rows["bytes"].append(codecs.encode_rgb8_raw(pix))
                    rows["w"].append(16)
                    rows["h"].append(16)
                    rows["fmt"].append("rgb8_raw")
            yield pd.DataFrame(rows)

    return videos.mapInPandas(
        fn,
        schema="video_id string, frame_idx int, bytes binary, w int, h int, fmt string",
    )


def audio_features(audio: DataFrame, fake: bool = False) -> DataFrame:
    """Audio feature-extraction PLUMBING — the audio sibling of
    :func:`frame_sample` completing the image/audio/video modality
    surface: schema, Arrow batching and partitioning are real; actual
    audio decode is unavailable in this container (STUB).

    Input schema: ``(audio_id string, bytes binary, sample_rate int,
    n_samples int, fmt string)`` — the opaque-binary-plus-typed-
    metadata contract every multimodal column here follows. With
    ``fake=True`` a deterministic stand-in synthesizes an int16 PCM
    waveform per clip (crc32-seeded, reproducible across partitionings
    like gen_pixels) and the REAL feature math runs over it: RMS
    energy, zero-crossing rate, peak amplitude — the standard
    speech-corpus quality/filtering signals.

    Plan (100 TB): one mapInPandas pass, features only (bytes never
    re-emitted — the banded_hamming bytes-never-scanned discipline
    downstream); numeric outputs are floats from a vectorized numpy
    path, so this is a pipeline stage, not a cross-engine gate."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "no audio codec in this environment; pass fake=True "
                    "for the deterministic stand-in"
                )
            rows = {
                "audio_id": [],
                "sample_rate": [],
                "n_samples": [],
                "rms": [],
                "zcr": [],
                "peak": [],
            }
            for i in range(len(pdf)):
                n = int(pdf["n_samples"].iat[i])
                seed = zlib.crc32(str(pdf["audio_id"].iat[i]).encode()) & 0xFFFFFFFF
                rng = np.random.default_rng(seed)
                wave = rng.integers(
                    -(1 << 15), 1 << 15, size=n, dtype=np.int64
                )
                x = wave.astype(np.float64) / float(1 << 15)
                rows["audio_id"].append(pdf["audio_id"].iat[i])
                rows["sample_rate"].append(int(pdf["sample_rate"].iat[i]))
                rows["n_samples"].append(n)
                rows["rms"].append(float(np.sqrt(np.mean(x * x))) if n else 0.0)
                rows["zcr"].append(
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if n > 1
                    else 0.0
                )
                rows["peak"].append(float(np.max(np.abs(x))) if n else 0.0)
            yield pd.DataFrame(rows)

    return audio.select(
        "audio_id", "bytes", "sample_rate", "n_samples", "fmt"
    ).mapInPandas(
        fn,
        schema=(
            "audio_id string, sample_rate int, n_samples int, "
            "rms double, zcr double, peak double"
        ),
    )


def caption_audit(images: DataFrame) -> DataFrame:
    """Caption byte-equality invariant (BASELINE.json input_hint): the
    caption must survive the pipeline byte-for-byte. Emits a checksum
    column computed JVM-side (no UDF) for cheap cross-stage comparison."""
    return images.select(
        "image_id", F.md5(F.col("caption").cast("binary")).alias("caption_md5")
    )


def image_neardup_pairs(
    images, max_hamming: int = 3, bits: int = 64, id_col: str = "image_id"
):
    """Perceptual-hash image near-duplicate pairs: EXACT banded Hamming
    join over the images table's ``phash`` column (the generic
    pigeonhole machinery from operators/dedup.py::banded_hamming_pairs
    — one equi-join on (band, band_value), never all-pairs, one
    bit_count verify). The payload ``bytes`` column is never scanned
    (plan-asserted): near-dup detection over a 100 TB image corpus
    reads only the 8-byte fingerprint column. ``max_hamming`` must be
    one of 0/1/3/7/15 for a 64-bit hash (bands must divide bits).
    Output: (image_a, image_b, hamming)."""
    from cuda_gis_smoothing_spark.operators.dedup import banded_hamming_pairs

    fp = images.select(id_col, "phash")
    return banded_hamming_pairs(
        fp, "phash", id_col, max_hamming, bits, out_a="image_a", out_b="image_b"
    )
