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
import zlib

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
    if payload.startswith(_PNG_MAGIC):
        return decode_png(payload)
    if payload.startswith(b"\xff\xd8"):
        from rust_triplets_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload.startswith(b"GIF8"):
        from rust_triplets_spark.operators.gif import decode_gif

        return decode_gif(payload)
    raise ValueError(
        "decode_image_builtin: unsupported format (builtin codecs cover "
        "PPM P6, 24-bit BMP, 8-bit PNG, baseline + progressive JPEG, and "
        "GIF; install PIL for WebP/TIFF/...)"
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


# ---------------------------------------------------------------------------
# PNG (ISO/IEC 15948). Unlike PPM/BMP this is a REAL compressed format a
# multimodal corpus actually ships; the deflate layer is stdlib zlib, so a
# pure-Python decoder needs only chunk parsing + scanline unfiltering.
# Coverage: bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette),
# 4 (gray+alpha), 6 (RGBA); interlace 0 AND Adam7 (each of the 7 passes
# is an independently-filtered sub-image placed on the (x0, y0, dx, dy)
# grid — PNG spec §8.2). Alpha is dropped (PIL's convert("RGB")
# semantics). Encoder emits color type 2, filter 0, fixed zlib level —
# byte-reproducible.
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# Adam7 pass grid: (x_start, y_start, x_step, y_step) — PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_lines(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse per-scanline filtering (types 0-4) over one (sub-)image:
    ``h`` filtered scanlines of ``w * channels`` bytes each, every line
    prefixed by its filter byte. Returns the (h, stride) raster."""
    stride = w * channels
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"decode_png: bad raster size {len(raw)} for {w}x{h}x{channels}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        row = raw[y * (1 + stride): (y + 1) * (1 + stride)]
        f, line = row[0], bytearray(row[1:])
        above = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            line = bytearray(
                (np.frombuffer(bytes(line), dtype=np.uint8) + above).astype(
                    np.uint8
                ).tobytes()
            )
        elif f == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + int(above[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                ul = int(above[x - bpp]) if x >= bpp else 0
                line[x] = (line[x] + _paeth(left, int(above[x]), ul)) & 0xFF
        else:
            raise ValueError(f"decode_png: unknown filter {f} on row {y}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Pure Python + stdlib zlib; see the
    section comment for the supported subset (the overwhelmingly common
    8-bit non-interlaced shapes)."""
    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("decode_png: missing PNG signature")
    pos = len(_PNG_MAGIC)
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("decode_png: truncated chunk")
        pos += 12 + length  # length + type + data + crc (crc unchecked)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("decode_png: no IHDR chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"decode_png: unsupported bit depth {depth} (only 8)")
    if comp != 0 or filt != 0:
        raise ValueError("decode_png: nonstandard compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"decode_png: unknown interlace method {interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"decode_png: unknown color type {color}")
    if color == 3 and plte is None:
        raise ValueError("decode_png: palette image without PLTE")
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        px = _unfilter_lines(raw, h, w, channels).reshape(h, w, channels)
    else:
        # Adam7: seven independently-filtered sub-images, each placed on
        # its (x0, y0, dx, dy) grid; empty passes contribute zero bytes
        px = np.zeros((h, w, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            nbytes = ph * (1 + pw * channels)
            sub = _unfilter_lines(raw[pos:pos + nbytes], ph, pw, channels)
            pos += nbytes
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, channels)
        if pos != len(raw):
            raise ValueError(
                f"decode_png: Adam7 raster size mismatch ({len(raw)} bytes, "
                f"consumed {pos})"
            )
    if color == 0:  # gray
        return np.repeat(px, 3, axis=2)
    if color == 2:  # RGB
        return px.copy()
    if color == 3:  # palette
        if px.size and int(px.max()) >= plte.shape[0]:
            raise ValueError("decode_png: palette index out of range")
        return plte[px[..., 0]]
    if color == 4:  # gray + alpha -> drop alpha
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3].copy()  # RGBA -> drop alpha


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (color type 2, filter 0, zlib level 6
    — a fixed recipe, so output bytes are reproducible)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_png: expected (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raster = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster, 6))
        + chunk(b"IEND", b"")
    )
