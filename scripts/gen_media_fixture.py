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

    # GIF: palette-quantized stills (the vendored LZW decoder's rows in
    # the same audit) — indices into a random palette, one progressive
    # and one interlaced
    from rust_triplets_spark.operators.gif import encode_gif

    gpal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    gidx = rng.integers(0, 16, (14, 21), dtype=np.uint8)
    rows += [
        (14, "gif", encode_gif([gidx], gpal)),
        (15, "gif_interlaced", encode_gif([gidx.T.copy()], gpal,
                                          interlace=True)),
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
    from rust_triplets_spark.operators.audio import autocorr_pitch, decode_wav

    pitch = [autocorr_pitch(*decode_wav(p)) for _, _, p in rows]
    table = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "fmt": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        "exp_n_frames": pa.array([e[0] for e in exp], pa.int64()),
        "exp_n_channels": pa.array([e[1] for e in exp], pa.int64()),
        "exp_sample_rate": pa.array([e[2] for e in exp], pa.int64()),
        "exp_rms_bucket": pa.array([e[3] for e in exp], pa.int64()),
        "exp_zero_crossings": pa.array([e[4] for e in exp], pa.int64()),
        "exp_pitch_lag": pa.array([p[0] for p in pitch], pa.int64()),
        "exp_f0_hz": pa.array([p[1] for p in pitch], pa.int64()),
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


def gen_video() -> None:
    """fixtures/video_sample.parquet: structurally-valid MP4 containers
    (ISO 14496-12 box trees from operators/video.encode_mp4 — the parser
    itself is pinned against hand-built raw bytes in tests/test_video.py)
    plus the expected integer audit columns and the expected 4-pick
    frame-sampling plan as parallel list columns. All container-tick
    integers → engine- and run-stable."""
    from rust_triplets_spark.operators.video import (
        encode_mp4,
        parse_mp4,
        plan_frame_picks,
        video_track,
    )

    def vid(stts, sync, *, w, h, ts, fourcc="mp4v", tid=1):
        return {"track_id": tid, "handler": "vide", "fourcc": fourcc,
                "width": w, "height": h, "timescale": ts, "stts": stts,
                "sync_samples": sync}

    def aud(stts, *, ts, tid=2):
        return {"track_id": tid, "handler": "soun", "fourcc": "mp4a",
                "width": 0, "height": 0, "timescale": ts, "stts": stts,
                "sync_samples": None}

    rows = [
        # constant 30 fps-ish, keyframe every 10th sample
        (1, "mp4_cfr_gop10", encode_mp4(
            movie_timescale=1000,
            tracks=[vid([(90, 20)], [1, 11, 21, 31, 41, 51, 61, 71, 81],
                        w=640, h=360, ts=600)])),
        # variable frame durations (three stts runs), sparse keyframes
        (2, "mp4_vfr", encode_mp4(
            movie_timescale=90000,
            tracks=[vid([(10, 3000), (20, 1500), (10, 6000)], [1, 15, 31],
                        w=1280, h=720, ts=90000, fourcc="avc1")])),
        # no stss box: every sample is a sync point
        (3, "mp4_allsync", encode_mp4(
            movie_timescale=600,
            tracks=[vid([(48, 25)], None, w=320, h=240, ts=1200)])),
        # audio+video multi-track (video is track 2 here)
        (4, "mp4_av", encode_mp4(
            movie_timescale=1000,
            tracks=[aud([(430, 1024)], ts=44100, tid=1),
                    vid([(240, 1001)], [1, 61, 121, 181],
                        w=1920, h=1080, ts=24000, fourcc="hvc1", tid=2)])),
        # audio-only: no video track → audit -1s, plan contributes 0 rows
        (5, "mp4_audio_only", encode_mp4(
            movie_timescale=600, tracks=[aud([(100, 160)], ts=16000)])),
        # single-sample clip (a poster frame)
        (6, "mp4_single", encode_mp4(
            movie_timescale=600,
            tracks=[vid([(1, 600)], [1], w=100, h=100, ts=600)])),
    ]

    from rust_triplets_spark.operators.video import sample_byte_range

    n_picks = 4
    meta_cols = {k: [] for k in ("n_tracks", "duration_ms", "v_width",
                                 "v_height", "v_n_samples", "v_n_sync",
                                 "v_fourcc")}
    pick_cols = {k: [] for k in ("pick_ord", "target_tick", "sample_n",
                                 "dts_tick", "key_sample_n")}
    range_cols = {k: [] for k in ("sample_off", "sample_len",
                                  "key_off", "key_len")}
    for _, _, payload in rows:
        meta = parse_mp4(payload)
        meta_cols["n_tracks"].append(len(meta.tracks))
        meta_cols["duration_ms"].append(meta.duration * 1000 // meta.timescale)
        vt = video_track(meta)
        if vt is None:
            for k, v in (("v_width", -1), ("v_height", -1),
                         ("v_n_samples", -1), ("v_n_sync", -1),
                         ("v_fourcc", "")):
                meta_cols[k].append(v)
            picks = []
        else:
            meta_cols["v_width"].append(vt.width)
            meta_cols["v_height"].append(vt.height)
            meta_cols["v_n_samples"].append(vt.n_samples)
            meta_cols["v_n_sync"].append(
                vt.n_samples if vt.sync_samples is None
                else len(vt.sync_samples))
            meta_cols["v_fourcc"].append(vt.fourcc)
            picks = plan_frame_picks(vt.stts, vt.sync_samples, n_picks)
        for i, k in enumerate(pick_cols):
            pick_cols[k].append([p[i] for p in picks])
        ranges = [
            (sample_byte_range(vt, p[2]), sample_byte_range(vt, p[4]))
            for p in picks
        ]
        range_cols["sample_off"].append([r[0][0] for r in ranges])
        range_cols["sample_len"].append([r[0][1] for r in ranges])
        range_cols["key_off"].append([r[1][0] for r in ranges])
        range_cols["key_len"].append([r[1][1] for r in ranges])

    table = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "fmt": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        **{f"exp_{k}": pa.array(
            v, pa.string() if k == "v_fourcc" else pa.int64())
           for k, v in meta_cols.items()},
        **{f"exp_{k}": pa.array(v, pa.list_(pa.int64()))
           for k, v in pick_cols.items()},
        **{f"exp_{k}": pa.array(v, pa.list_(pa.int64()))
           for k, v in range_cols.items()},
    })
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "video_sample.parquet",
    )
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")
    for (mid, fmt, payload), nt, dm in zip(
        rows, meta_cols["n_tracks"], meta_cols["duration_ms"]
    ):
        print(f"  {mid:3d} {fmt:16s} {len(payload):6d} B  tracks={nt} "
              f"dur={dm}ms")


def gen_gif() -> None:
    """fixtures/gif_sample.parquet: animated GIFs (disposal methods,
    transparency holes, variable delays, interlace, a static single
    frame) plus the expected 4-pick frame audit — pick schedule AND the
    picked frames' integer luminance buckets, both computed through the
    vendored decode+planner path at generation time (the decoders
    themselves are pinned against hand-built bitstreams in
    tests/test_gif.py)."""
    from rust_triplets_spark.operators.gif import decode_gif_frames, encode_gif
    from rust_triplets_spark.operators.video import plan_frame_picks

    rng = np.random.default_rng(42)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)

    def frames_of(k, h, w, seed):
        r = np.random.default_rng(seed)
        return [r.integers(0, 8, (h, w), dtype=np.uint8) for _ in range(k)]

    rows = [
        # 10 frames, uniform 10cs delays
        (1, "gif_anim_uniform", encode_gif(
            frames_of(10, 12, 16, 1), pal, delays_cs=[10] * 10)),
        # variable delays: time-uniform picks != index-uniform
        (2, "gif_anim_vfr", encode_gif(
            frames_of(6, 9, 9, 2), pal,
            delays_cs=[50, 2, 2, 2, 2, 50])),
        # transparency + keep disposal: later frames composite over
        (3, "gif_anim_transparent", encode_gif(
            [np.full((8, 8), 1, np.uint8),
             np.full((8, 8), 7, np.uint8),
             np.full((8, 8), 3, np.uint8)],
            pal, delays_cs=[5, 5, 5], transparent=7)),
        # restore-to-background disposal between frames
        (4, "gif_anim_dispose_bg", encode_gif(
            [np.full((6, 10), 2, np.uint8),
             np.full((6, 10), 7, np.uint8)],
            pal, delays_cs=[8, 8], disposals=[2, 0], transparent=7,
            bg_index=4)),
        # static single frame, zero delay (degrades to index-uniform)
        (5, "gif_static", encode_gif(
            frames_of(1, 15, 11, 5), pal)),
        # interlaced animation
        (6, "gif_anim_interlaced", encode_gif(
            frames_of(4, 16, 8, 6), pal, delays_cs=[4, 4, 4, 4],
            interlace=True)),
    ]

    n_picks = 4
    pick_cols = {k: [] for k in ("pick_ord", "frame_idx", "target_cs",
                                 "lum_bucket")}
    for _, _, payload in rows:
        frames, delays = decode_gif_frames(payload)
        stts = [(1, max(int(d), 1)) for d in delays]
        picks = plan_frame_picks(stts, None, n_picks)
        pick_cols["pick_ord"].append([p[0] for p in picks])
        pick_cols["frame_idx"].append([p[2] - 1 for p in picks])
        pick_cols["target_cs"].append([p[1] for p in picks])
        lbs = []
        for p in picks:
            px = frames[p[2] - 1].astype(np.int64)
            n = px.shape[0] * px.shape[1]
            lum = int((299 * px[..., 0] + 587 * px[..., 1]
                       + 114 * px[..., 2]).sum())
            lbs.append((lum // (1000 * n)) // 16 if n else 0)
        pick_cols["lum_bucket"].append(lbs)

    table = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "fmt": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        **{f"exp_{k}": pa.array(v, pa.list_(pa.int64()))
           for k, v in pick_cols.items()},
    })
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "gif_sample.parquet",
    )
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")
    for (mid, fmt, payload), lbs in zip(rows, pick_cols["lum_bucket"]):
        print(f"  {mid:3d} {fmt:22s} {len(payload):6d} B  lum_buckets={lbs}")


def gen_audio_compressed() -> None:
    """fixtures/audio_compressed_sample.parquet: compressed/telephony WAV
    payloads — ITU-T G.711 µ-law/A-law (r10 verdict next-round #5), IMA
    ADPCM (tag 0x11), and an RF64 64-bit container — plus the expected
    integer audit columns (same columns as audio_sample, so the combined
    audit kernel is reused unchanged). The all-256-codes rows pin the
    complete G.711 expansion tables inside the fixture itself; the sine
    rows pin end-to-end companding/block-coding of real signal; the RF64
    row pins the ds64 size indirection."""
    from rust_triplets_spark.operators.audio import (
        alaw_compress,
        autocorr_pitch,
        decode_wav,
        encode_g711_wav,
        encode_ima_adpcm_wav,
        ulaw_compress,
    )

    rng = np.random.default_rng(17)
    t = np.arange(8000)
    sine = np.round(20000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64)
    low = np.round(15000 * np.sin(2 * np.pi * 160 * t / 8000)).astype(np.int64)
    noise = rng.integers(-30000, 30000, 8000, dtype=np.int64)
    ramp = np.arange(256, dtype=np.uint8)

    def rf64_pcm16(x: np.ndarray, rate: int) -> bytes:
        """RF64/ds64 wrapper around PCM16 (EBU Tech 3306): riff + data
        sizes deferred to ds64, data chunk size field = 0xFFFFFFFF."""
        import struct as st
        body = np.asarray(x).astype("<i2").tobytes()
        fmt = st.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        ds64 = st.pack("<QQQI", 0, len(body), len(x), 0)
        chunks = (b"WAVE"
                  + b"ds64" + st.pack("<I", len(ds64)) + ds64
                  + b"fmt " + st.pack("<I", len(fmt)) + fmt
                  + b"data" + st.pack("<I", 0xFFFFFFFF) + body)
        return b"RF64" + st.pack("<I", 0xFFFFFFFF) + chunks

    rows = [
        (1, "wav_ulaw", encode_g711_wav(ulaw_compress(sine), 8000, "ulaw")),
        (2, "wav_alaw", encode_g711_wav(alaw_compress(low), 8000, "alaw")),
        (3, "wav_ulaw_codes", encode_g711_wav(ramp, 8000, "ulaw")),
        (4, "wav_alaw_codes", encode_g711_wav(ramp, 8000, "alaw")),
        (5, "wav_alaw_stereo", encode_g711_wav(
            np.stack([alaw_compress(sine), alaw_compress(noise)], axis=1),
            16000, "alaw")),
        (6, "wav_ulaw_silence", encode_g711_wav(
            ulaw_compress(np.zeros(4000, dtype=np.int64)), 8000, "ulaw")),
        (7, "wav_ima_adpcm", encode_ima_adpcm_wav(
            np.round(12000 * np.sin(2 * np.pi * 160 * t / 8000))
            .astype(np.int64), 8000)),
        # a partial final block (8000 % 505 != 0 already) AND a tiny
        # block_align exercising many block headers
        (8, "wav_ima_adpcm_small_blocks", encode_ima_adpcm_wav(
            np.round(9000 * np.sin(2 * np.pi * 440 * t[:1000] / 8000))
            .astype(np.int64), 8000, block_align=16)),
        (9, "wav_rf64_pcm16", rf64_pcm16(sine, 8000)),
    ]
    exp = [_expected_audio(p) for _, _, p in rows]
    pitch = [autocorr_pitch(*decode_wav(p)) for _, _, p in rows]
    table = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "fmt": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        "exp_n_frames": pa.array([e[0] for e in exp], pa.int64()),
        "exp_n_channels": pa.array([e[1] for e in exp], pa.int64()),
        "exp_sample_rate": pa.array([e[2] for e in exp], pa.int64()),
        "exp_rms_bucket": pa.array([e[3] for e in exp], pa.int64()),
        "exp_zero_crossings": pa.array([e[4] for e in exp], pa.int64()),
        "exp_pitch_lag": pa.array([p[0] for p in pitch], pa.int64()),
        "exp_f0_hz": pa.array([p[1] for p in pitch], pa.int64()),
    })
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "audio_compressed_sample.parquet",
    )
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")
    for (mid, fmt, payload), e, p in zip(rows, exp, pitch):
        print(f"  {mid:3d} {fmt:26s} {len(payload):6d} B  "
              f"frames={e[0]} ch={e[1]} rms={e[3]} zc={e[4]} f0={p[1]}")


def gen_video_mjpeg() -> None:
    """fixtures/video_mjpeg_sample.parquet: MJPEG-in-MP4 clips — every
    video sample is a REAL baseline JPEG from the vendored encoder — plus
    the expected 4-pick frame-DECODE audit (r10 verdict next-round #1:
    close the plan → byte-range → pixels loop end-to-end).

    Expectations are deliberately computed from the ORIGINAL per-frame
    JPEG bytes (decode_jpeg before the container ever sees them), NOT by
    running video_frame_decode_audit: the audit must re-find those exact
    bytes through plan_frame_picks + the stsc/stco/stsz walk inside the
    written mdat, so a slicing/offset bug mismatches even though both
    sides use the same codec (whose own numbers are pinned by the
    hand-computed rasters in tests/test_jpeg.py)."""
    from rust_triplets_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from rust_triplets_spark.operators.video import (
        encode_mp4,
        parse_mp4,
        plan_frame_picks,
        video_track,
    )

    def frame(w, h, k, *, gray=False):
        """Deterministic frame k: a small diagonal gradient riding a
        brightness floor that STEPS with k (clipped, not wrapped — a
        wrapped full-range gradient averages to ~127 for every k), so
        picked frames decode to DIFFERENT luminance buckets and an
        off-by-one frame pick cannot slip through the pin."""
        yy, xx = np.mgrid[0:h, 0:w]
        grad = (xx * 60) // max(w - 1, 1) + (yy * 40) // max(h - 1, 1)
        base = np.clip(24 * k + grad, 0, 255)
        if gray:
            return base.astype(np.uint8)[..., None].repeat(3, axis=2)
        g = np.clip(base + 30, 0, 255)
        b = np.clip(base - 20, 0, 255)
        return np.stack([base, g, b], axis=2).astype(np.uint8)

    def vid(stts, sync, frames, *, w, h, ts, fourcc="jpeg", tid=1):
        return {"track_id": tid, "handler": "vide", "fourcc": fourcc,
                "width": w, "height": h, "timescale": ts, "stts": stts,
                "sync_samples": sync, "sample_data": frames}

    def aud(stts, *, ts, tid=2):
        return {"track_id": tid, "handler": "soun", "fourcc": "mp4a",
                "width": 0, "height": 0, "timescale": ts, "stts": stts,
                "sync_samples": None}

    clips = []
    # 1. constant frame rate, 10 frames, 16x16 color, all-sync (no stss —
    #    MJPEG semantics: every frame is independent)
    f1 = [encode_jpeg(frame(16, 16, k), quality=85) for k in range(10)]
    clips.append((1, "mjpeg_cfr", [f1], encode_mp4(
        movie_timescale=1000,
        tracks=[vid([(10, 100)], None, f1, w=16, h=16, ts=600)])))
    # 2. variable frame durations: time-uniform picks != index-uniform
    f2 = [encode_jpeg(frame(24, 16, k), quality=70) for k in range(8)]
    clips.append((2, "mjpeg_vfr", [f2], encode_mp4(
        movie_timescale=90000,
        tracks=[vid([(2, 9000), (4, 1500), (2, 12000)], None, f2,
                    w=24, h=16, ts=90000)])))
    # 3. audio+video multi-track, video is track 2 and its chunks
    #    interleave with audio fill chunks in mdat — the slice must land
    #    on the right track's bytes ('mjpa' fourcc variant)
    f3 = [encode_jpeg(frame(16, 8, k, gray=True), quality=92)
          for k in range(6)]
    clips.append((3, "mjpeg_av_gray", [f3], encode_mp4(
        movie_timescale=600,
        tracks=[aud([(40, 1024)], ts=44100, tid=1),
                vid([(6, 100)], None, f3, w=16, h=8, ts=600,
                    fourcc="mjpa", tid=2)])))
    # 4. single-frame poster clip (plan collapses to 1 distinct pick row)
    f4 = [encode_jpeg(frame(8, 8, 3), quality=90)]
    clips.append((4, "mjpeg_poster", [f4], encode_mp4(
        movie_timescale=600,
        tracks=[vid([(1, 600)], [1], f4, w=8, h=8, ts=600)])))
    # 5. audio-only clip: decode audit contributes zero rows
    clips.append((5, "mjpeg_audio_only", [None], encode_mp4(
        movie_timescale=600, tracks=[aud([(50, 160)], ts=16000)])))

    n_picks = 4
    pick_cols = {k: [] for k in ("pick_ord", "sample_n", "height",
                                 "width", "lum_bucket")}
    for _, _, (frames,), payload in clips:
        vt = video_track(parse_mp4(payload))
        picks = (plan_frame_picks(vt.stts, vt.sync_samples, n_picks)
                 if vt is not None else [])
        cols = {k: [] for k in pick_cols}
        for ord_, _tgt, sample_n, _dts, _key in picks:
            px = decode_jpeg(frames[sample_n - 1]).astype(np.int64)
            h, w = int(px.shape[0]), int(px.shape[1])
            lum_sum = int((299 * px[..., 0] + 587 * px[..., 1]
                           + 114 * px[..., 2]).sum())
            cols["pick_ord"].append(ord_)
            cols["sample_n"].append(sample_n)
            cols["height"].append(h)
            cols["width"].append(w)
            cols["lum_bucket"].append((lum_sum // (1000 * h * w)) // 16)
        for k in pick_cols:
            pick_cols[k].append(cols[k])

    table = pa.table({
        "media_id": pa.array([c[0] for c in clips], pa.int64()),
        "fmt": pa.array([c[1] for c in clips], pa.string()),
        "payload": pa.array([c[3] for c in clips], pa.binary()),
        **{f"exp_{k}": pa.array(v, pa.list_(pa.int64()))
           for k, v in pick_cols.items()},
    })
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "video_mjpeg_sample.parquet",
    )
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")
    for (mid, fmt, _, payload), lbs in zip(clips, pick_cols["lum_bucket"]):
        print(f"  {mid:3d} {fmt:18s} {len(payload):6d} B  lum_buckets={lbs}")


def gen_image_phash() -> None:
    """fixtures/image_phash_sample.parquet: planted near-duplicate image
    families (same picture re-encoded at different JPEG qualities /
    formats / small brightness shifts) plus distinct singletons, with the
    expected 63-bit perceptual hash per image. The oracle recomputes
    band-bucketed Hamming pairs in SQL from the pinned hashes; the Spark
    side must reproduce the hashes from PIXELS (decode → luma grid → DCT
    → median threshold) and the same pairs — so codec, hash kernel, and
    pairing logic sit under one driver row."""
    from rust_triplets_spark.operators.gif import encode_gif
    from rust_triplets_spark.operators.phash import phash63

    def make(k, h=48, w=64):
        yy, xx = np.mgrid[0:h, 0:w]
        base = ((xx * (3 + k)) // 2 + (yy * (5 + 2 * k)) // 3) % 256
        img = np.stack(
            [base, (base + 40 * k) % 256, 255 - base], 2
        ).astype(np.uint8)
        img[10 + k:20 + k, 15:40] = (20 * k) % 256
        return img

    rng = np.random.default_rng(23)
    a, b, c, d, e = (make(k) for k in range(5))
    noise = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)

    rows = [
        # family 1: PNG original + two JPEG re-encodes
        (1, "fam1_png", encode_png(a)),
        (2, "fam1_jpeg_q90", encode_jpeg(a, 90)),
        (3, "fam1_jpeg_q35", encode_jpeg(a, 35)),
        # family 2: BMP original + brightness-shifted PNG
        (4, "fam2_bmp", _encode_bmp(b)),
        (5, "fam2_png_bright", encode_png(
            np.clip(b.astype(np.int32) + 12, 0, 255).astype(np.uint8))),
        # family 3: noise PNG + high-quality JPEG of the same noise
        (6, "fam3_png_noise", encode_png(noise)),
        (7, "fam3_jpeg_q95", encode_jpeg(noise, 95)),
        # singletons (no partner within the Hamming radius)
        (8, "single_gif", encode_gif(
            [(c[..., 0] // 16).astype(np.uint8)],
            np.stack([np.arange(0, 256, 16)] * 3, 1).astype(np.uint8))),
        (9, "single_ppm", encode_ppm(d)),
        (10, "single_png", encode_png(e)),
    ]
    hashes = [phash63(decode_image_builtin(p)) for _, _, p in rows]
    table = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "fmt": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        "exp_phash": pa.array(hashes, pa.int64()),
    })
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "image_phash_sample.parquet",
    )
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")

    def ham(x, y):
        return bin(x ^ y).count("1")

    for (mid, fmt, payload), h in zip(rows, hashes):
        print(f"  {mid:3d} {fmt:16s} {len(payload):6d} B  phash={h:016x}")
    fams = [(1, 2), (1, 3), (2, 3), (4, 5), (6, 7)]
    print("  planted-pair hamming:",
          {p: ham(hashes[p[0] - 1], hashes[p[1] - 1]) for p in fams})
    cross = min(
        ham(hashes[i], hashes[j])
        for i in range(len(rows)) for j in range(i + 1, len(rows))
        if (rows[i][0], rows[j][0]) not in fams
    )
    print(f"  min cross-family hamming: {cross} (must exceed max_dist)")


def gen_audio_fp() -> None:
    """fixtures/audio_fp_sample.parquet: planted audio near-dup families
    (the same clip re-encoded through G.711/ADPCM/8-bit/volume-change)
    among distinct singletons, with the expected 32-subfingerprint list
    per clip. The oracle recomputes half-key candidates + 512-bit BER in
    SQL from the pinned lists; Spark must reproduce the fingerprints from
    the PAYLOAD (decode → FFT band energies → slope bits) and the same
    verified pairs."""
    from rust_triplets_spark.operators.audio import (
        alaw_compress,
        decode_wav,
        encode_g711_wav,
        encode_ima_adpcm_wav,
        encode_wav,
        ulaw_compress,
    )
    from rust_triplets_spark.operators.audiofp import audio_subfps

    t = np.arange(8000)

    def speechish(seed):
        r = np.random.default_rng(seed)
        x = sum(
            r.integers(2000, 6000)
            * np.sin(2 * np.pi * r.uniform(300, 1800) * t / 8000
                     + r.uniform(0, 6))
            for _ in range(5)
        )
        x += r.normal(0, 500, 8000)
        return np.round(np.clip(x, -30000, 30000)).astype(np.int64)

    c = [speechish(k) for k in range(6)]
    rows = [
        # family 1: PCM original + mu-law + IMA ADPCM re-encodes
        (1, "fp1_pcm16", encode_wav(c[0].astype(np.int32), 8000, 16)),
        (2, "fp1_ulaw", encode_g711_wav(ulaw_compress(c[0]), 8000, "ulaw")),
        (3, "fp1_adpcm", encode_ima_adpcm_wav(c[0], 8000)),
        # family 2: PCM original + 8-bit depth reduction
        (4, "fp2_pcm16", encode_wav(c[1].astype(np.int32), 8000, 16)),
        (5, "fp2_pcm8", encode_wav(
            (c[1] >> 8).astype(np.int32), 8000, 8)),
        # family 3: PCM original + volume change (slope bits are
        # amplitude-invariant: expected BER 0)
        (6, "fp3_pcm16", encode_wav(c[2].astype(np.int32), 8000, 16)),
        (7, "fp3_gain", encode_wav(
            np.round(c[2] * 0.7).astype(np.int32), 8000, 16)),
        # singletons, one per decode path
        (8, "single_pcm16", encode_wav(c[3].astype(np.int32), 8000, 16)),
        (9, "single_alaw", encode_g711_wav(
            alaw_compress(c[4]), 8000, "alaw")),
        (10, "single_adpcm", encode_ima_adpcm_wav(c[5], 8000)),
    ]
    fps = [audio_subfps(*decode_wav(p)) for _, _, p in rows]
    table = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "fmt": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        "exp_subfps": pa.array(fps, pa.list_(pa.int64())),
    })
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "audio_fp_sample.parquet",
    )
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")

    def ber(x, y):
        return sum(bin(a ^ b).count("1") for a, b in zip(x, y))

    fams = [(1, 2), (1, 3), (2, 3), (4, 5), (6, 7)]
    print("  planted-pair BER:",
          {p: ber(fps[p[0] - 1], fps[p[1] - 1]) for p in fams})
    cross = min(
        ber(fps[i], fps[j])
        for i in range(len(rows)) for j in range(i + 1, len(rows))
        if (rows[i][0], rows[j][0]) not in fams
    )
    print(f"  min cross-family BER: {cross} (must exceed max_ber=160)")


def gen_video_phash() -> None:
    """fixtures/video_phash_sample.parquet: MJPEG clips whose planted
    near-dup pairs are the SAME footage re-encoded (different JPEG
    quality / small brightness shift) plus distinct clips and an
    audio-only row, with the expected per-pick perceptual hashes. The
    oracle recomputes the time-aligned pairing in SQL from the pinned
    (pick_ord, phash) rows; Spark must reproduce the hashes from the
    PAYLOAD (container walk → slice → JPEG decode → pHash)."""
    from rust_triplets_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from rust_triplets_spark.operators.phash import phash63
    from rust_triplets_spark.operators.video import (
        encode_mp4,
        parse_mp4,
        plan_frame_picks,
        sample_byte_range,
        video_track,
    )

    def footage(seed, n=8, h=32, w=48):
        r = np.random.default_rng(seed)
        frames = []
        for k in range(n):
            yy, xx = np.mgrid[0:h, 0:w]
            base = np.clip(
                (xx * int(r.integers(3, 8))) // 2
                + (yy * int(r.integers(2, 6))) + 18 * k, 0, 255
            )
            img = np.stack(
                [base, np.clip(base + 35, 0, 255),
                 np.clip(base - 25, 0, 255)], 2
            ).astype(np.uint8)
            y0, x0 = int(r.integers(4, h - 12)), int(r.integers(4, w - 16))
            img[y0:y0 + 8, x0:x0 + 12] = int(r.integers(0, 256))
            frames.append(img)
        return frames

    def clip(frames, quality, *, shift=0, tid=1):
        fr = [
            np.clip(f.astype(np.int32) + shift, 0, 255).astype(np.uint8)
            for f in frames
        ]
        data = [encode_jpeg(f, quality) for f in fr]
        return encode_mp4(movie_timescale=600, tracks=[{
            "track_id": tid, "handler": "vide", "fourcc": "jpeg",
            "width": fr[0].shape[1], "height": fr[0].shape[0],
            "timescale": 600, "stts": [(len(fr), 75)],
            "sync_samples": None, "sample_data": data,
        }])

    def aud():
        return encode_mp4(movie_timescale=600, tracks=[{
            "track_id": 1, "handler": "soun", "fourcc": "mp4a",
            "width": 0, "height": 0, "timescale": 16000,
            "stts": [(50, 160)], "sync_samples": None,
        }])

    f1, f2, f3, f4 = footage(1), footage(2), footage(3), footage(4)
    rows = [
        (1, "vfam1_q90", clip(f1, 90)),
        (2, "vfam1_q45", clip(f1, 45)),          # re-encode of 1
        (3, "vfam2_q85", clip(f2, 85)),
        (4, "vfam2_bright", clip(f2, 85, shift=10)),  # brightness of 3
        (5, "vsingle_a", clip(f3, 90)),
        (6, "vsingle_b", clip(f4, 88)),
        (7, "vaudio_only", aud()),
    ]
    n_picks = 4
    ords, hashes = [], []
    for _, _, payload in rows:
        vt = video_track(parse_mp4(payload))
        po, ph = [], []
        if vt is not None:
            for ord_, _t, n, _d, _k in plan_frame_picks(
                vt.stts, vt.sync_samples, n_picks
            ):
                off, ln = sample_byte_range(vt, n)
                po.append(ord_)
                ph.append(phash63(decode_jpeg(payload[off:off + ln])))
        ords.append(po)
        hashes.append(ph)
    table = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "fmt": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        "exp_pick_ord": pa.array(ords, pa.list_(pa.int64())),
        "exp_phash": pa.array(hashes, pa.list_(pa.int64())),
    })
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "video_phash_sample.parquet",
    )
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")

    def ham(x, y):
        return bin(x ^ y).count("1")

    for (mid, fmt, payload), ph in zip(rows, hashes):
        print(f"  {mid:3d} {fmt:14s} {len(payload):6d} B  picks={len(ph)}")
    for a, b in ((0, 1), (2, 3)):
        ds = [ham(x, y) for x, y in zip(hashes[a], hashes[b])]
        print(f"  planted {rows[a][0]}-{rows[b][0]} per-pick hamming: {ds}")
    # cross pairs: report the close-frame count at max_dist=12 — the
    # fixture deliberately contains coincidental SINGLE-frame matches
    # (clips 1/2 vs 5 share one pick at exactly distance 12) that the
    # min_frames>=3 vote must filter
    for i in range(6):
        for j in range(i + 1, 6):
            if (i, j) in ((0, 1), (2, 3)):
                continue
            nc = sum(
                1 for x, y in zip(hashes[i], hashes[j]) if ham(x, y) <= 12
            )
            if nc:
                print(f"  cross {rows[i][0]}-{rows[j][0]}: n_close={nc} "
                      f"(filtered by min_frames)")


if __name__ == "__main__":
    main()
    gen_audio()
    gen_video()
    gen_gif()
    gen_video_mjpeg()
    gen_audio_compressed()
    gen_image_phash()
    gen_audio_fp()
    gen_video_phash()
