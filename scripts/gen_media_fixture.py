"""Generate the committed multimodal decode-audit fixture.

Writes ``fixtures/media_sample.parquet``: a small table of real encoded
image payloads in every format the vendored codecs cover (PPM, 24-bit
BMP, PNG color-2 + palette, baseline JPEG, progressive JPEG), alongside
the EXPECTED integer decode facts ``(exp_height, exp_width,
exp_lum_bucket)`` computed through the same vendored decode path.

This is what puts the codec branch under the driver's hard correctness
signal (the ``media_decode_audit`` query): DuckDB cannot decode images,
but it can read the committed expectations and the driver then compares
the Spark-executed distributed decode (mapInPandas over binary columns)
against them value-for-value. The expectations are generator-pinned —
the decoders themselves are verified independently in
tests/test_jpeg.py and tests/test_multimodal.py against hand-computed
rasters and hand-crafted bitstreams, so a pinned regression here means
the decode path or the Spark plumbing changed.

All expected math is integer (see ``operators/multimodal.media_decode_
audit``), so the fixture is engine- and run-stable.

Usage: python scripts/gen_media_fixture.py
"""

from __future__ import annotations

import os
import struct
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_triplets_spark.operators.codecs import (  # noqa: E402
    decode_image_builtin,
    encode_png,
    encode_ppm,
)
from rust_triplets_spark.operators.jpeg import (  # noqa: E402
    encode_jpeg,
    encode_jpeg_progressive,
)


def _encode_bmp(px: np.ndarray) -> bytes:
    """Minimal 24-bit BITMAPINFOHEADER writer (bottom-up, 4-byte row
    padding) — the shape decode_bmp reads."""
    h, w = px.shape[:2]
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    raster = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        raster += px[y, :, ::-1].tobytes()  # RGB → BGR
        raster += b"\x00" * pad
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                       2835, 2835, 0, 0)
    return header + info + bytes(raster)


def _encode_png_palette(idx: np.ndarray, pal: np.ndarray) -> bytes:
    """Color-type-3 PNG writer (8-bit indices) for palette coverage."""
    h, w = idx.shape[:2]

    def chunk(t: bytes, d: bytes) -> bytes:
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    raster = zlib.compress(
        b"".join(b"\x00" + idx[y].tobytes() for y in range(h)), 6
    )
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", raster)
            + chunk(b"IEND", b""))


def _expected(payload: bytes) -> tuple[int, int, int]:
    """The operator's exact integer math, applied at generation time."""
    px = decode_image_builtin(payload).astype(np.int64)
    h, w = int(px.shape[0]), int(px.shape[1])
    n = h * w
    if n == 0:
        return h, w, 0
    lum_sum = int((299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]).sum())
    return h, w, int((lum_sum // (1000 * n)) // 16)


def main() -> None:
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:24, 0:16]
    gradient = np.stack(
        [(yy * 10) % 256, (xx * 14) % 256, ((yy + xx) * 6) % 256], axis=2
    ).astype(np.uint8)
    noise = rng.integers(0, 256, (13, 19, 3), dtype=np.uint8)
    flat = np.full((9, 9, 3), 200, dtype=np.uint8)
    dark = np.full((7, 31, 3), 22, dtype=np.uint8)
    pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
    idx = rng.integers(0, 6, (11, 8, 1), dtype=np.uint8)

    rows: list[tuple[int, str, bytes]] = [
        (1, "ppm", encode_ppm(gradient)),
        (2, "ppm", encode_ppm(dark)),
        (3, "bmp", _encode_bmp(noise)),
        (4, "bmp", _encode_bmp(gradient)),
        (5, "png", encode_png(noise)),
        (6, "png", encode_png(flat)),
        (7, "png_palette", _encode_png_palette(idx, pal)),
        (8, "jpeg_baseline", encode_jpeg(gradient, 90)),
        (9, "jpeg_baseline", encode_jpeg(flat, 85)),
        (10, "jpeg_baseline", encode_jpeg(noise, 95)),
        (11, "jpeg_progressive", encode_jpeg_progressive(gradient, 90)),
        (12, "jpeg_progressive", encode_jpeg_progressive(dark, 85)),
        (13, "jpeg_progressive", encode_jpeg_progressive(noise, 95)),
    ]

    exp = [_expected(p) for _, _, p in rows]
    table = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "fmt": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        "exp_height": pa.array([e[0] for e in exp], pa.int32()),
        "exp_width": pa.array([e[1] for e in exp], pa.int32()),
        "exp_lum_bucket": pa.array([e[2] for e in exp], pa.int32()),
    })
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "media_sample.parquet",
    )
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")
    for (mid, fmt, payload), (h, w, lb) in zip(rows, exp):
        print(f"  {mid:3d} {fmt:16s} {len(payload):6d} B  {h}x{w} lum_bucket={lb}")




def _expected_audio(payload: bytes) -> tuple[int, int, int, int, int]:
    """audio_decode_audit's exact integer math, at generation time."""
    import math

    from rust_triplets_spark.operators.audio import decode_wav

    s, rate = decode_wav(payload)
    n = int(s.shape[0])
    if n == 0:
        return n, int(s.shape[1]), int(rate), 0, 0
    ch0 = s[:, 0].astype(np.int64)
    ssum = int((ch0 * ch0).sum())
    nn = ch0 >= 0
    return (
        n, int(s.shape[1]), int(rate),
        math.isqrt(ssum // n) // 2048,
        int((nn[1:] != nn[:-1]).sum()),
    )


def gen_audio() -> None:
    from rust_triplets_spark.operators.audio import encode_wav

    rng = np.random.default_rng(42)
    t = np.arange(8000)
    sine = np.round(20000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int32)
    quiet = np.round(900 * np.sin(2 * np.pi * 100 * t / 8000)).astype(np.int32)
    square = np.where((t // 50) % 2 == 0, 12000, -12000).astype(np.int32)
    noise = rng.integers(-30000, 30000, 8000, dtype=np.int64).astype(np.int32)
    stereo = np.stack([sine, noise], axis=1)
    silence = np.zeros(4000, dtype=np.int32)
    f32 = (np.sin(2 * np.pi * 220 * t / 8000) * 0.5).astype(np.float32)

    def wav_f32(x: np.ndarray, rate: int) -> bytes:
        import struct as st
        body = x.astype("<f4").tobytes()
        fmt = st.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
        chunks = (b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
                  + b"data" + st.pack("<I", len(body)) + body)
        return b"RIFF" + st.pack("<I", len(chunks)) + chunks

    rows = [
        (1, "wav_pcm16", encode_wav(sine, 8000, 16)),
        (2, "wav_pcm16", encode_wav(quiet, 8000, 16)),
        (3, "wav_pcm16", encode_wav(square, 16000, 16)),
        (4, "wav_pcm16_stereo", encode_wav(stereo, 44100, 16)),
        (5, "wav_pcm8", encode_wav(noise >> 8, 8000, 8)),
        (6, "wav_pcm32", encode_wav(noise.astype(np.int64) << 16, 8000, 32)),
        (7, "wav_pcm16", encode_wav(silence, 8000, 16)),
        (8, "wav_float32", wav_f32(f32, 22050)),
    ]
    exp = [_expected_audio(p) for _, _, p in rows]
    table = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "fmt": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        "exp_n_frames": pa.array([e[0] for e in exp], pa.int64()),
        "exp_n_channels": pa.array([e[1] for e in exp], pa.int64()),
        "exp_sample_rate": pa.array([e[2] for e in exp], pa.int64()),
        "exp_rms_bucket": pa.array([e[3] for e in exp], pa.int64()),
        "exp_zero_crossings": pa.array([e[4] for e in exp], pa.int64()),
    })
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "audio_sample.parquet",
    )
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")
    for (mid, fmt, payload), e in zip(rows, exp):
        print(f"  {mid:3d} {fmt:18s} {len(payload):6d} B  "
              f"frames={e[0]} ch={e[1]} rate={e[2]} rms={e[3]} zc={e[4]}")


if __name__ == "__main__":
    main()
    gen_audio()
