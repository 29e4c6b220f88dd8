import numpy as np
import pytest

from cuda_gis_smoothing_spark import datagen
from cuda_gis_smoothing_spark.functions import codecs


@pytest.mark.parametrize("w,h", [(16, 16), (32, 24), (64, 32), (5, 3)])
def test_raw_and_png_lossless(w, h):
    pix = datagen.gen_pixels(7, w, h)
    for fmt in ("rgb8_raw", "png"):
        out = codecs.decode(codecs.encode(pix, fmt), fmt, w, h)
        assert out.shape == (h, w, 3)
        assert (out == pix).all(), fmt


def test_png_decode_handles_all_filters():
    # synthesize a PNG with filter types 1..4 by hand and check round-trip
    import struct
    import zlib

    rng = np.random.default_rng(42)
    pix = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    # encode with per-row filters [0,1,2,3,4,0]
    stride = 8 * 3
    flat = pix.reshape(6, stride).astype(np.int32)
    raw = b""
    for y, f in enumerate([0, 1, 2, 3, 4, 0]):
        line = flat[y].copy()
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        enc = line.copy()
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 1:
                enc[i] = (line[i] - a) & 0xFF
            elif f == 2:
                enc[i] = (line[i] - b) & 0xFF
            elif f == 3:
                enc[i] = (line[i] - (a + b) // 2) & 0xFF
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", 8, 6, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(raw))
        + codecs._png_chunk(b"IEND", b"")
    )
    assert (codecs.decode_png(png) == pix).all()


def test_jpeg_lossy_psnr_above_threshold():
    pix = datagen.gen_pixels(3, 64, 32)
    out = codecs.decode(codecs.encode(pix, "jpeg"), "jpeg", 64, 32)
    assert out.shape == pix.shape
    # BASELINE.json input_hint: lossy round-trip must keep PSNR >= 40 dB
    assert codecs.psnr(pix, out) >= 40.0
