"""Multimodal binary-column plumbing (schema, batching, metadata) — the
codec-free parts are fully tested; decode is a documented stub."""

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


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        _decode_image(PNG)


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


def test_resize_real_path_is_explicit_stub(spark):
    import pytest as _pytest

    from rust_triplets_spark.operators.multimodal import (
        _resize_image_real,
        resize_media,
    )

    with _pytest.raises(NotImplementedError):
        _resize_image_real(PNG, 4, 4)
    with _pytest.raises(ValueError):
        resize_media(_media(spark), 0, 4)
