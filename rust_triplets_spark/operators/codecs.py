"""Minimal pure-Python image codecs — PPM (P6) and uncompressed 24-bit BMP.

The container ships no image libraries (PIL/cv2), which previously left
the multimodal family's *real* decode/resize kernels
(:mod:`rust_triplets_spark.operators.multimodal`) permanently stubbed.
These two trivial formats need only stdlib + numpy, so the non-stub
branch is now exercisable end-to-end in any environment: decode →
pixels → resize → re-encode, with PIL still preferred when present (it
handles the compressed formats these codecs deliberately don't).

Formats, from their public specs:
- PPM P6 (netpbm): ``P6\\n<w> <h>\\n<maxval>\\n`` + raw RGB triples.
  Whitespace/comments per the netpbm grammar; maxval must be ≤ 255.
- BMP: 14-byte file header (``BM``, pixel-array offset at byte 10) +
  BITMAPINFOHEADER (width/height/bpp/compression), 24-bit BI_RGB only;
  rows are BGR, 4-byte aligned, bottom-up when height > 0.

Everything here is driver/executor-local byte math on one image at a
time — the Spark-side batching/memory contract lives in multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PPM P6 bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_ppm: expected (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM P6 bytes → (h, w, 3) uint8. Handles comments (#...) and any
    whitespace run between header tokens, per the netpbm grammar."""
    if not payload.startswith(b"P6"):
        raise ValueError("decode_ppm: not a P6 PPM (missing magic)")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and comment lines
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("decode_ppm: truncated header")
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError(f"decode_ppm: 16-bit PPM unsupported (maxval={maxval})")
    pos += 1  # exactly ONE whitespace byte after maxval, then raster
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError(
            f"decode_ppm: raster truncated ({len(raster)} of {need} bytes)"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes → (h, w, 3) uint8 RGB. Handles the
    4-byte row alignment, BGR order, and both bottom-up (height > 0) and
    top-down (height < 0) row layouts."""
    if not payload.startswith(b"BM") or len(payload) < 54:
        raise ValueError("decode_bmp: not a BMP (missing magic/header)")
    (pix_offset,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"decode_bmp: DIB header {hdr_size} unsupported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"decode_bmp: only uncompressed 24-bit supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    stride = (w * 3 + 3) & ~3
    need = stride * h
    raster = payload[pix_offset : pix_offset + need]
    if len(raster) < need:
        raise ValueError(
            f"decode_bmp: raster truncated ({len(raster)} of {need} bytes)"
        )
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if not top_down:
        img = img[::-1]
    return img.copy()


def decode_image_builtin(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes to the vendored decoders. Raises
    ``ValueError`` for formats they don't cover (PNG/JPEG/... need PIL)."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    raise ValueError(
        "decode_image_builtin: unsupported format (builtin codecs cover "
        "PPM P6 and 24-bit BMP; install PIL for compressed formats)"
    )


def resize_nearest(pixels: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize, (h0, w0, 3) → (h, w, 3): pure index math,
    deterministic, the same sample grid PIL's NEAREST uses
    (src_i = floor((dst_i + 0.5) * src / dst))."""
    arr = np.asarray(pixels)
    h0, w0 = arr.shape[:2]
    if h0 == 0 or w0 == 0:
        # a zero-pixel source has nothing to sample; emit black rather
        # than crashing the stage on arr[-1] of an empty axis
        return np.zeros((h, w, 3), dtype=arr.dtype if arr.size else np.uint8)
    ys = np.minimum(((np.arange(h) + 0.5) * h0 / h).astype(np.int64), h0 - 1)
    xs = np.minimum(((np.arange(w) + 0.5) * w0 / w).astype(np.int64), w0 - 1)
    return arr[ys][:, xs]
