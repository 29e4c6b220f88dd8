"""Pixel codecs for the ``images`` table's opaque ``bytes`` column.

The engine treats image payloads as binary columns with typed metadata
(w, h, fmt) — decode only ever happens inside Arrow-batched pandas UDFs
(see operators/multimodal.py), never row-at-a-time Python.

Formats:
  * ``rgb8_raw`` — lossless: w*h*3 uint8, row-major, the oracle format.
  * ``png``      — real, lossless: minimal 8-bit-RGB PNG written/read
                   with stdlib ``zlib`` + ``struct`` (no third-party
                   image library exists in this environment).
  * ``jpeg``     — STUB. No JPEG codec is available in this container;
                   when Pillow is importable we use it, otherwise a
                   clearly-marked deterministic lossy stand-in ("FJPG"
                   container, uniform quantization step 4) keeps the
                   Spark-side plumbing (schema, batching, PSNR >= 40 dB
                   invariant) real and testable. Quantization step 4
                   bounds MSE at 16/12 => PSNR ~ 46.8 dB > 40 dB, the
                   BASELINE.json lossy threshold.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # real JPEG only if an image lib happens to exist
    import PIL.Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except Exception:  # pragma: no cover - container has no Pillow
    _HAVE_PIL = False

FORMATS = ("rgb8_raw", "png", "jpeg")
_FJPG_MAGIC = b"FJPG"
_FJPG_STEP = 4  # quantization step; PSNR = 10*log10(255^2 * 12 / step^2) ~ 46.8 dB


# --- rgb8_raw ----------------------------------------------------------------
def encode_rgb8_raw(pix: np.ndarray) -> bytes:
    return np.ascontiguousarray(pix, dtype=np.uint8).tobytes()


def decode_rgb8_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


# --- png (minimal, 8-bit RGB, filter 0..4 on decode, 0 on encode) -----------
def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pix: np.ndarray) -> bytes:
    pix = np.ascontiguousarray(pix, dtype=np.uint8)
    h, w, _ = pix.shape
    raw = b"".join(b"\x00" + pix[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes, w: int | None = None, h: int | None = None) -> np.ndarray:
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    idat_parts = []
    pw = ph = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            pw, ph, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB PNGs supported")
        elif tag == b"IDAT":
            idat_parts.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    assert pw is not None and ph is not None
    raw = zlib.decompress(b"".join(idat_parts))
    stride = pw * 3
    out = np.empty((ph, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(ph):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            line += prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need per-pixel scan
            line = _unfilter_scan(ftype, line, prev)
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = line
        prev = line
    return out.reshape(ph, pw, 3)


def _unfilter_scan(ftype: int, line: np.ndarray, prev: np.ndarray) -> np.ndarray:
    bpp = 3
    out = line.astype(np.int32)
    for i in range(len(out)):
        a = out[i - bpp] if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        if ftype == 1:
            out[i] = (out[i] + a) & 0xFF
        elif ftype == 3:
            out[i] = (out[i] + (a + b) // 2) & 0xFF
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (out[i] + pred) & 0xFF
    return out.astype(np.uint8)


# --- jpeg (stub unless Pillow exists) ---------------------------------------
def encode_jpeg(pix: np.ndarray) -> bytes:
    if _HAVE_PIL:  # pragma: no cover
        import io

        import PIL.Image

        buf = io.BytesIO()
        PIL.Image.fromarray(pix, "RGB").save(buf, "JPEG", quality=95)
        return buf.getvalue()
    q = (np.ascontiguousarray(pix, dtype=np.uint8) // _FJPG_STEP).astype(np.uint8)
    h, w, _ = pix.shape
    return _FJPG_MAGIC + struct.pack(">HH", w, h) + zlib.compress(q.tobytes(), 6)


def decode_jpeg(data: bytes, w: int | None = None, h: int | None = None) -> np.ndarray:
    if data[:4] == _FJPG_MAGIC:
        pw, ph = struct.unpack(">HH", data[4:8])
        q = np.frombuffer(zlib.decompress(data[8:]), dtype=np.uint8)
        deq = q.astype(np.uint16) * _FJPG_STEP + _FJPG_STEP // 2
        return np.minimum(deq, 255).astype(np.uint8).reshape(ph, pw, 3)
    if _HAVE_PIL:  # pragma: no cover
        import io

        import PIL.Image

        return np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))
    raise NotImplementedError("no JPEG codec available in this environment")


_DECODERS = {"rgb8_raw": decode_rgb8_raw, "png": decode_png, "jpeg": decode_jpeg}
_ENCODERS = {"rgb8_raw": encode_rgb8_raw, "png": encode_png, "jpeg": encode_jpeg}


def decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Decode one payload → (h, w, 3) uint8."""
    return _DECODERS[fmt](data, w, h)


def encode(pix: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](pix)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
