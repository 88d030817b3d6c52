"""Multimodal binary columns: plumbing (schema, batching, metadata) plus
the REAL decode/resize branch via the vendored PPM/BMP codecs — only
compressed formats (PNG/JPEG) still require PIL at runtime."""

import pytest
from pyspark.sql import functions as F

from rust_triplets_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _decode_image,
    extract_features,
    frame_sample_plan,
    media_metadata,
    sniff_mime,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"fakepngdata" * 10
JPG = b"\xff\xd8\xff\xe0" + b"fakejpegdata" * 10
WAV = b"RIFF" + b"\x00" * 40


def _media(spark):
    rows = [
        (1, "image", None, PNG, {}),
        (2, "image", None, JPG, {}),
        (3, "audio", None, WAV, {}),
        (4, "video", None, b"\x1a\x45\xdf\xa3" + b"x" * 50, {"n_frames": "100"}),
        (5, "image", None, None, {}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_metadata_sniffing_and_hash(spark):
    out = {r["media_id"]: r for r in media_metadata(_media(spark)).collect()}
    assert out[1]["sniffed_mime"] == "image/png"
    assert out[2]["sniffed_mime"] == "image/jpeg"
    assert out[3]["sniffed_mime"] == "audio/wav"
    assert out[4]["sniffed_mime"] == "video/webm"
    assert out[5]["sniffed_mime"] is None and out[5]["byte_size"] is None
    assert out[1]["byte_size"] == len(PNG)
    assert len(out[1]["content_hash"]) == 64
    # python-side sniffer agrees with the column expression
    assert sniff_mime(PNG) == "image/png" and sniff_mime(b"junk") == "application/octet-stream"


def test_feature_extraction_stub_pipeline(spark):
    feats = extract_features(_media(spark), dim=8, batch_rows=2)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert all(r["feat_dim"] == 8 and len(r["feature"]) == 8 for r in rows.values())
    # deterministic: same payload → same feature
    again = {r["media_id"]: r["feature"] for r in
             extract_features(_media(spark), dim=8).collect()}
    assert {k: list(v["feature"]) for k, v in rows.items()} == {
        k: list(v) for k, v in again.items()
    }
    # features are joinable with metadata downstream (small frame, no blobs)
    joined = feats.join(media_metadata(_media(spark)).select("media_id", "sniffed_mime"),
                        "media_id")
    assert joined.count() == 5


def test_batch_rows_bound_holds_at_execution(spark):
    # 5 rows in one partition with batch_rows=2 → chunks of (2, 2, 1); the
    # bound must hold at execution time, NOT via a session conf restored
    # before the lazy plan runs.
    feats = extract_features(
        _media(spark).coalesce(1), dim=4, batch_rows=2, emit_chunk_rows=True
    ).collect()
    sizes = [r["chunk_rows"] for r in feats]
    assert max(sizes) <= 2
    assert sorted(sizes) == [1, 2, 2, 2, 2]


def test_real_decode_unsupported_format_is_loud():
    # the builtin codecs now cover PPM/BMP/PNG/baseline-JPEG — CORRUPT
    # payloads (magic + garbage) and genuinely uncovered formats (WebP)
    # must fail per-payload with a clear error, never silently
    with pytest.raises((ValueError, OSError)):
        _decode_image(JPG)  # magic + garbage, not a real scan
    with pytest.raises((ValueError, OSError)):
        _decode_image(PNG)  # magic + garbage, not a raster
    with pytest.raises((ValueError, OSError)):
        _decode_image(b"RIFF....WEBPVP8 " + b"x" * 20)


def test_frame_sample_plan(spark):
    plan = frame_sample_plan(_media(spark), every_n_frames=30, max_frames=8).collect()
    assert [r["frame_idx"] for r in sorted(plan, key=lambda r: r["sample_ord"])] == [0, 30, 60, 90]
    assert all(r["media_id"] == 4 for r in plan)


def test_resize_stub_pipeline(spark):
    from rust_triplets_spark.operators.multimodal import resize_media

    out = {r["media_id"]: r for r in resize_media(
        _media(spark), 4, 3, batch_rows=2
    ).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # images get exactly w*h stand-in bytes and the target dims
    for mid in (1, 2):
        assert (out[mid]["width"], out[mid]["height"]) == (4, 3)
        assert len(out[mid]["payload"]) == 12
    # deterministic: same payload → same stand-in buffer
    again = {r["media_id"]: r for r in resize_media(
        _media(spark), 4, 3, batch_rows=2
    ).collect()}
    assert again[1]["payload"] == out[1]["payload"]
    # non-images pass through untouched, null dims
    assert out[3]["width"] is None and out[3]["payload"] == WAV
    # null payload survives as null-dims passthrough
    assert out[5]["width"] is None and out[5]["payload"] is None


def test_resize_real_path_rejects_unsupported_and_bad_dims(spark):
    import pytest as _pytest

    from rust_triplets_spark.operators.multimodal import (
        _resize_image_real,
        resize_media,
    )

    with _pytest.raises((ValueError, OSError)):
        _resize_image_real(PNG, 4, 4)  # compressed format needs PIL
    with _pytest.raises(ValueError):
        resize_media(_media(spark), 0, 4)


# ---------------------------------------------------------------------------
# real (non-stub) codec branch — vendored PPM/BMP codecs, no PIL needed
# ---------------------------------------------------------------------------


def _gradient_pixels(w, h):
    import numpy as np

    x = np.arange(w, dtype=np.uint8)[None, :].repeat(h, 0)
    y = np.arange(h, dtype=np.uint8)[:, None].repeat(w, 1)
    return np.stack([x * 7 % 256, y * 11 % 256, (x + y) * 3 % 256], axis=-1).astype(
        np.uint8
    )


def _bmp_bytes(pixels, top_down=False):
    """Hand-rolled uncompressed 24-bit BMP encoder (test-side only):
    BGR, 4-byte row stride, bottom-up unless top_down."""
    import struct

    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) & ~3
    bgr = pixels[:, :, ::-1]
    rows = bgr if top_down else bgr[::-1]
    raster = bytearray()
    for r in rows:
        raster += r.tobytes() + b"\x00" * (stride - w * 3)
    pix_offset = 14 + 40
    header = b"BM" + struct.pack(
        "<IHHI", pix_offset + len(raster), 0, 0, pix_offset
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(raster), 2835, 2835, 0, 0,
    )
    return bytes(header + dib + raster)


def test_codec_roundtrips():
    import numpy as np

    from rust_triplets_spark.operators.codecs import (
        decode_bmp,
        decode_ppm,
        encode_ppm,
        resize_nearest,
    )

    px = _gradient_pixels(7, 5)  # odd width exercises BMP row padding
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    # PPM header grammar: comments + arbitrary whitespace
    commented = b"P6\n# a comment\n 7\t5 #x\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(commented), px)
    assert np.array_equal(decode_bmp(_bmp_bytes(px)), px)
    assert np.array_equal(decode_bmp(_bmp_bytes(px, top_down=True)), px)
    # nearest resize: identity at same size; correct shape + exact corner
    # pixels at downscale
    assert np.array_equal(resize_nearest(px, 7, 5), px)
    small = resize_nearest(px, 3, 2)
    assert small.shape == (2, 3, 3)


def test_real_feature_branch_end_to_end(spark):
    """extract_features(use_stub=False) runs the REAL decode on vendored
    formats through mapInPandas — normalized luminance histogram of the
    actual pixels, deterministic, same value for the same raster encoded
    as PPM and as BMP."""
    from rust_triplets_spark.operators.multimodal import extract_features

    px = _gradient_pixels(8, 6)
    from rust_triplets_spark.operators.codecs import encode_ppm

    from rust_triplets_spark.operators.codecs import encode_png

    rows = [
        (1, "image", None, encode_ppm(px), {}),
        (2, "image", None, _bmp_bytes(px), {}),
        (3, "image", None, encode_png(px), {}),  # REAL compressed format
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in extract_features(media, dim=8, use_stub=False, batch_rows=1).collect()
    }
    assert set(out) == {1, 2, 3}
    for mid in (1, 2, 3):
        feat = out[mid]["feature"]
        assert len(feat) == 8 and abs(sum(feat) - 1.0) < 1e-4
    # same pixels → same feature regardless of container format
    assert out[1]["feature"] == out[2]["feature"] == out[3]["feature"]


def test_resize_real_branch_end_to_end(spark):
    """resize_media(use_stub=False): decode → nearest resample → re-encode;
    the output payload is a REAL raster that decodes to exactly the target
    dimensions with pixels drawn from the source image."""
    import numpy as np

    from rust_triplets_spark.operators.codecs import (
        decode_ppm,
        encode_ppm,
        resize_nearest,
    )
    from rust_triplets_spark.operators.multimodal import resize_media

    from rust_triplets_spark.operators.codecs import encode_png

    px = _gradient_pixels(10, 8)
    rows = [
        (1, "image", None, encode_ppm(px), {}),
        (2, "image", None, _bmp_bytes(px), {}),
        (3, "audio", None, WAV, {}),
        (4, "image", None, encode_png(px), {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in resize_media(media, 4, 3, use_stub=False, batch_rows=2).collect()
    }
    expect = resize_nearest(px, 4, 3)
    for mid in (1, 2, 4):
        assert (out[mid]["width"], out[mid]["height"]) == (4, 3)
        got = decode_ppm(out[mid]["payload"])
        assert got.shape == (3, 4, 3)
        assert np.array_equal(got, expect)
    # non-image passthrough unchanged on the real branch too
    assert out[3]["width"] is None and out[3]["payload"] == WAV


def test_multimodal_features_ship_as_webdataset(spark, tmp_path):
    """End-to-end: binary media -> codec-free metadata + extracted
    features -> byte-reproducible WebDataset tar shards. The multimodal
    plumbing and the multimodal sink compose on real Spark plans."""
    import json
    import os
    import tarfile

    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.multimodal import (
        extract_features,
        media_metadata,
    )
    from rust_triplets_spark.sinks.shards import write_webdataset_shards

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ])
    media = spark.createDataFrame(
        [Row(media_id=i, kind="image",
             payload=b"\x89PNG\r\n\x1a\n" + bytes([i % 200]) * 16)
         for i in range(12)],
        schema,
    )
    feats = extract_features(media, dim=4)
    meta = media_metadata(media)
    sample = (
        meta.join(feats.select("media_id", "feature"), "media_id")
        .select(
            "media_id", "payload",
            F.to_json(F.struct("byte_size", "sniffed_mime", "feature")).alias("meta"),
        )
    )
    out = str(tmp_path / "wds")
    write_webdataset_shards(
        sample, out, "media_id", {"payload": "png", "meta": "json"}, n_shards=2
    )
    seen = 0
    for name in sorted(os.listdir(out)):
        with tarfile.open(os.path.join(out, name)) as tar:
            for m in tar.getmembers():
                if m.name.endswith(".json"):
                    d = json.loads(tar.extractfile(m).read())
                    assert d["sniffed_mime"] == "image/png"
                    assert d["byte_size"] == 24 and len(d["feature"]) == 4
                    seen += 1
                else:
                    assert tar.extractfile(m).read()[:8] == b"\x89PNG\r\n\x1a\n"
    assert seen == 12


def test_degenerate_zero_pixel_image_survives_real_branch(spark):
    """A validly-formatted 0x0 PPM must not kill the stage: the real
    feature is all-zeros and the real resize emits black pixels
    (regression: ZeroDivisionError / IndexError)."""
    from rust_triplets_spark.operators.codecs import decode_ppm
    from rust_triplets_spark.operators.multimodal import (
        _real_feature,
        _resize_image_real,
    )

    empty = b"P6\n0 0\n255\n"
    assert decode_ppm(empty).shape == (0, 0, 3)
    assert _real_feature(empty, dim=4) == [0.0, 0.0, 0.0, 0.0]
    out = _resize_image_real(empty, 3, 2)
    assert decode_ppm(out).shape == (2, 3, 3)


def test_png_codec_roundtrip_and_filters():
    """The vendored PNG decoder against handcrafted rasters: encoder
    roundtrip, every scanline filter type (None/Sub/Up/Average/Paeth),
    and every supported color type (gray, RGB, palette, gray+alpha,
    RGBA). Reference filter math computed independently in the test."""
    import struct
    import zlib

    import numpy as np

    from rust_triplets_spark.operators.codecs import decode_png, encode_png

    rng = np.random.default_rng(7)
    for shape in [(1, 1, 3), (5, 9, 3), (16, 16, 3), (3, 1, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px), shape

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    w, h, bpp = 4, 5, 3
    stride = w * bpp
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    flat = px.reshape(h, stride).astype(np.int32)
    rows, prev = [], np.zeros(stride, dtype=np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur, enc = flat[y], bytearray()
        for x in range(stride):
            left = cur[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            v = {0: cur[x], 1: cur[x] - left, 2: cur[x] - up,
                 3: cur[x] - ((left + up) >> 1),
                 4: cur[x] - paeth(left, up, ul)}[f]
            enc.append(v & 0xFF)
        rows.append(bytes([f]) + bytes(enc))
        prev = cur
    sig = b"\x89PNG\r\n\x1a\n"
    png = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), px)

    def raster(arr):
        return zlib.compress(
            b"".join(b"\x00" + arr[y].tobytes() for y in range(arr.shape[0]))
        )

    g = rng.integers(0, 256, (3, 4, 1), dtype=np.uint8)
    png_g = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0))
             + chunk(b"IDAT", raster(g)) + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png_g), np.repeat(g, 3, axis=2))
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, (3, 4, 1), dtype=np.uint8)
    png_p = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0))
             + chunk(b"PLTE", pal.tobytes())
             + chunk(b"IDAT", raster(idx)) + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png_p), pal[idx[..., 0]])
    ga = rng.integers(0, 256, (3, 4, 2), dtype=np.uint8)
    png_ga = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 4, 0, 0, 0))
              + chunk(b"IDAT", raster(ga)) + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png_ga), np.repeat(ga[..., :1], 3, axis=2))
    rgba = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
    png_a = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 6, 0, 0, 0))
             + chunk(b"IDAT", raster(rgba)) + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png_a), rgba[..., :3])
    # unsupported shapes stay loud
    png_16 = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 16, 2, 0, 0, 0))
              + chunk(b"IDAT", b"") + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(png_16)


def test_png_palette_index_out_of_range_is_loud():
    """A palette image indexing past PLTE must raise the contract
    ValueError (not numpy IndexError) so per-payload fault isolation in
    decode_image_builtin callers holds."""
    import struct
    import zlib

    import numpy as np

    from rust_triplets_spark.operators.codecs import decode_png

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    pal = np.zeros((4, 3), dtype=np.uint8)  # only indices 0..3 valid
    idx = np.full((2, 3, 1), 9, dtype=np.uint8)  # index 9 out of range
    raster = zlib.compress(
        b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    )
    png = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", pal.tobytes())
           + chunk(b"IDAT", raster) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index out of range"):
        decode_png(png)


def test_png_adam7_interlace_decodes():
    """Adam7: hand-built interlaced PNGs (per-pass filtered sub-images,
    spec §8.2 grid) must decode identically to their progressive-free
    raster, across color types and awkward dimensions (passes that are
    empty, 1xN, Nx1)."""
    import struct
    import zlib

    import numpy as np

    from rust_triplets_spark.operators.codecs import _ADAM7, decode_png

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    def adam7_png(px, color, extra=b""):
        h, w = px.shape[:2]
        ch = px.shape[2]
        parts = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for y in range(sub.shape[0]):
                parts += b"\x00" + sub[y].tobytes()  # filter type 0
        sig = b"\x89PNG\r\n\x1a\n"
        return (sig
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1))
                + extra
                + chunk(b"IDAT", zlib.compress(bytes(parts)))
                + chunk(b"IEND", b""))

    rng = np.random.default_rng(21)
    for shape in [(16, 16), (13, 19), (1, 9), (9, 1), (7, 7), (3, 3)]:
        px = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        got = decode_png(adam7_png(px, 2))
        assert np.array_equal(got, px), shape
    # gray and palette shapes through the same grid
    g = rng.integers(0, 256, (11, 6, 1), dtype=np.uint8)
    assert np.array_equal(decode_png(adam7_png(g, 0)), np.repeat(g, 3, axis=2))
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, (10, 13, 1), dtype=np.uint8)
    got = decode_png(adam7_png(idx, 3, extra=chunk(b"PLTE", pal.tobytes())))
    assert np.array_equal(got, pal[idx[..., 0]])
