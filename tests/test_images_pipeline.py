"""End-to-end image path: distributed synthesis → Arrow decode →
cell aggregates → smoothing → tiles, vs a local numpy/python oracle.
Pins the BASELINE.json north_star invariants: exact cell/tile
assignment, caption byte-equality, pixel PSNR, allclose smoothing."""

import numpy as np
import pytest

from cuda_gis_smoothing_spark import datagen, oracle
from cuda_gis_smoothing_spark.functions import codecs
from cuda_gis_smoothing_spark.hexgrid import GridSpec, latlng_to_tile
from cuda_gis_smoothing_spark.operators.multimodal import (
    caption_audit,
    decode_roundtrip,
    frame_sample,
    geolocate,
    image_features,
    resize,
)
from cuda_gis_smoothing_spark.plans.pipeline import PipelineConfig, run_pipeline
from cuda_gis_smoothing_spark.sources.images import (
    read_images,
    read_manifest,
    synthesize_images,
    write_images,
)

N = 300


@pytest.fixture(scope="module")
def images_df(spark):
    return synthesize_images(spark, N, partitions=4).cache()


@pytest.fixture(scope="module")
def images_pdf():
    return datagen.gen_images(N)


def _oracle_features(images_pdf):
    g = GridSpec()
    rows = {}
    for r in images_pdf.itertuples():
        pix = codecs.decode(r.bytes, r.fmt, int(r.w), int(r.h))
        m = pix.reshape(-1, 3).mean(axis=0)
        ndvi = (m[1] - m[0]) / (m[1] + m[0] + 1e-9)
        lat, lon = datagen.phash_to_latlng(np.int64(r.phash))
        cell = int(g.latlng_to_cell(lat, lon))
        rows[r.image_id] = {"cell": cell, "ndvi": float(ndvi)}
    return rows


def test_distributed_synthesis_matches_local(spark, images_df, images_pdf):
    got = {r["image_id"]: r for r in images_df.collect()}
    assert len(got) == N
    for r in images_pdf.itertuples():
        row = got[r.image_id]
        assert row["caption"] == r.caption          # byte-equal captions
        assert row["phash"] == int(r.phash)
        assert bytes(row["bytes"]) == bytes(r.bytes)  # identical payloads


def test_image_features_match_oracle(spark, images_df, images_pdf):
    exp = _oracle_features(images_pdf)
    got = {r["image_id"]: r for r in image_features(images_df).collect()}
    assert set(got) == set(exp)
    for iid, e in exp.items():
        assert got[iid]["cell"] == e["cell"]        # EXACT cell assignment
        assert abs(got[iid]["ndvi"] - e["ndvi"]) < 1e-9


def test_hot_cell_skew_exists(spark, images_df):
    """The fixture must contain a hot cell (~10% of images) so skew
    handling is actually exercised (SURVEY.md §7)."""
    counts = geolocate(images_df).groupBy("cell").count().collect()
    top = max(c["count"] for c in counts)
    assert top >= 0.08 * N


def test_decode_roundtrip_psnr(spark, images_df):
    rows = decode_roundtrip(images_df).collect()
    assert len(rows) == N
    # stored->decoded->re-encoded->decoded: lossless formats are exact
    # (inf); lossy re-encode of already-quantized pixels is idempotent
    # here, so every PSNR must clear the 40 dB bar or be inf.
    # (original-pixels-vs-decoded PSNR is pinned in test_codecs.py.)
    assert all(r["roundtrip_ok"] for r in rows)
    assert all(np.isinf(r["psnr"]) or r["psnr"] >= 40.0 for r in rows)


def test_pipeline_matches_oracle_smoothing(spark, images_df, images_pdf):
    cfg = PipelineConfig()
    out = run_pipeline(images_df, cfg).toPandas().set_index("cell").sort_index()
    # oracle: aggregate features per cell, derive, smooth
    feats = _oracle_features(images_pdf)
    agg: dict[int, list[float]] = {}
    for e in feats.values():
        agg.setdefault(e["cell"], []).append(e["ndvi"])
    vals = {}
    for cell, xs in agg.items():
        ndvi = sum(xs) / len(xs)
        vals[cell] = {
            "ndvi": ndvi,
            "mndwi": ndvi * 0.9 + 0.05,
            "evi": ndvi * 1.1 - 0.05,
            "ndwi": ndvi * 0.95,
        }
    exp = oracle.smooth_cells(vals, "gaussian_k2", variables=tuple(vals[next(iter(vals))]))
    assert set(out.index) == set(exp)
    for v in ("ndvi", "mndwi", "evi", "ndwi"):
        e = np.array([exp[c][v] for c in out.index])
        assert np.allclose(out[f"smoothed_{v}"].to_numpy(), e, atol=1e-4)
    # n_images per cell exact
    for cell, xs in agg.items():
        assert out.loc[cell, "n_images"] == len(xs)
    # tile assignment exact (integer invariant)
    g = GridSpec()
    lat, lon = g.cell_to_latlng(out.index.to_numpy())
    tx, ty = latlng_to_tile(lat, lon, 12)
    assert (out["tile_x"].to_numpy() == tx).all()
    assert (out["tile_y"].to_numpy() == ty).all()


def test_salted_aggregate_equals_unsalted(spark, images_df):
    a = run_pipeline(images_df, PipelineConfig(salt_buckets=8)).toPandas().set_index("cell").sort_index()
    b = run_pipeline(images_df, PipelineConfig(salt_buckets=0)).toPandas().set_index("cell").sort_index()
    assert (a.index == b.index).all()
    for c in ("smoothed_ndvi", "smoothed_mndwi"):
        assert np.allclose(a[c].to_numpy(), b[c].to_numpy(), atol=1e-12)


def test_caption_audit_stable(spark, images_df):
    a = {r["image_id"]: r["caption_md5"] for r in caption_audit(images_df).collect()}
    b = {r["image_id"]: r["caption_md5"] for r in caption_audit(images_df).collect()}
    assert a == b and len(a) == N


def test_resize_shapes(spark, images_df):
    out = resize(images_df.limit(10), 8, 8).collect()
    for r in out:
        assert r["w"] == 8 and r["h"] == 8 and r["fmt"] == "rgb8_raw"
        assert len(bytes(r["bytes"])) == 8 * 8 * 3


def test_frame_sample_stub_plumbing(spark):
    vids = spark.createDataFrame(
        [("vid0", 25), ("vid1", 7)], "video_id string, n_frames int"
    )
    out = frame_sample(vids, every_n=10, fake=True).collect()
    assert {(r["video_id"], r["frame_idx"]) for r in out} == {
        ("vid0", 0), ("vid0", 10), ("vid0", 20), ("vid1", 0),
    }
    with pytest.raises(Exception, match="NotImplementedError|no video codec"):
        frame_sample(vids, every_n=10, fake=False).collect()


def test_audio_features_stub_plumbing(spark):
    """Audio modality plumbing: deterministic fake waveform, real
    feature math, determinism across partitionings, honest stub on
    the real-decode path."""
    from cuda_gis_smoothing_spark.operators.multimodal import audio_features

    rows = [
        ("clip0", bytes(4), 16000, 1600, "pcm16"),
        ("clip1", bytes(4), 8000, 0, "pcm16"),
        ("clip2", bytes(4), 44100, 321, "pcm16"),
    ]
    schema = (
        "audio_id string, bytes binary, sample_rate int, "
        "n_samples int, fmt string"
    )
    aud = spark.createDataFrame(rows, schema)
    out = {r["audio_id"]: r for r in audio_features(aud, fake=True).collect()}
    assert set(out) == {"clip0", "clip1", "clip2"}
    r0 = out["clip0"]
    assert r0["n_samples"] == 1600 and r0["sample_rate"] == 16000
    assert 0.0 < r0["rms"] <= 1.0 and 0.0 < r0["zcr"] < 1.0
    assert r0["rms"] <= r0["peak"] <= 1.0
    # empty clip: all-zero features, no crash
    assert out["clip1"]["rms"] == 0.0 and out["clip1"]["zcr"] == 0.0
    # deterministic across partitionings (the gen_pixels contract)
    out2 = {
        r["audio_id"]: r
        for r in audio_features(aud.repartition(3), fake=True).collect()
    }
    for k in out:
        assert out[k] == out2[k]
    with pytest.raises(Exception, match="NotImplementedError|no audio codec"):
        audio_features(aud, fake=False).collect()


def test_iceberg_style_write_read(spark, tmp_path):
    p = write_images(spark, str(tmp_path / "tbl"), 50, partitions=2)
    df = read_images(spark, p)
    assert df.count() == 50
    man = read_manifest(p)
    assert man["row_count"] == 50 and man["format"] == "parquet"


def test_image_neardup_pairs_exact_and_prunes_bytes(spark):
    """Banded phash Hamming join == quadratic python truth on a corpus
    with engineered near-dup groups, and the plan never reads the
    payload bytes column."""
    import itertools
    import re

    from cuda_gis_smoothing_spark.operators.multimodal import image_neardup_pairs

    rng = np.random.default_rng(17)
    rows = []
    ph = []
    for g in range(12):
        seed = int(rng.integers(0, 2**63 - 1))
        for v in range(3):  # three variants, up to 2 bits flipped
            h = seed
            for _ in range(v):
                h ^= 1 << int(rng.integers(0, 64))
            # two's complement: a flip of bit 63 yields h >= 2^63, which
            # overflows LongType in createDataFrame (python xor/mask
            # below are sign-agnostic, so the truth set is unchanged)
            h = h - 2**64 if h >= 2**63 else h
            rows.append((f"img_{g}_{v}", h, b"\x00"))
            ph.append((f"img_{g}_{v}", h))
    images = spark.createDataFrame(rows, "image_id string, phash long, bytes binary")

    got = {
        (r.image_a, r.image_b, r.hamming)
        for r in image_neardup_pairs(images, max_hamming=3).collect()
    }
    want = set()
    for (ia, ha), (ib, hb) in itertools.combinations(ph, 2):
        a, b = sorted((ia, ib))
        d = bin((ha ^ hb) & (2**64 - 1)).count("1")
        if d <= 3:
            want.add((a, b, d))
    assert got == want and len(want) >= 12

    plan = images.sparkSession._jvm.PythonSQLUtils.explainString(
        image_neardup_pairs(images)._jdf.queryExecution(), "formatted"
    )
    for m in re.findall(r"ReadSchema: (\S+)", plan):
        assert "bytes" not in m
