"""Perceptual image hash (operators/phash.py): kernel determinism and
robustness properties, degenerate geometry, Spark hash-kernel equality
with the committed fixture pins, and the banded near-dup pair query
end-to-end (planted families found, singletons absent)."""

import os

import numpy as np
import pytest

from rust_triplets_spark.operators.phash import (
    PHASH_BANDS,
    PHASH_BITS,
    image_phash,
    image_phash_pairs,
    phash63,
)

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "image_phash_sample.parquet",
)


def _img(k, h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * (3 + k)) // 2 + (yy * (5 + 2 * k)) // 3) % 256
    img = np.stack([base, (base + 40 * k) % 256, 255 - base], 2)
    img = img.astype(np.uint8)
    img[10 + k:20 + k, 15:40] = (20 * k) % 256
    return img


def _ham(a, b):
    return bin(a ^ b).count("1")


class TestKernel:
    def test_nonnegative_63_bits_and_deterministic(self):
        for k in range(4):
            h1 = phash63(_img(k))
            h2 = phash63(_img(k))
            assert h1 == h2
            assert 0 <= h1 < (1 << PHASH_BITS)

    def test_band_layout_covers_all_bits_once(self):
        seen = set()
        for s, w in PHASH_BANDS:
            bits = set(range(s, s + w))
            assert not bits & seen
            seen |= bits
        assert seen == set(range(PHASH_BITS))

    def test_reencode_is_near_distinct_is_far(self):
        from rust_triplets_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        a, b = _img(0), _img(3)
        ha = phash63(a)
        assert _ham(ha, phash63(decode_jpeg(encode_jpeg(a, 35)))) <= 8
        bright = np.clip(a.astype(np.int32) + 12, 0, 255).astype(np.uint8)
        assert _ham(ha, phash63(bright)) <= 8
        assert _ham(ha, phash63(b)) > 12

    def test_degenerate_geometries(self):
        # images smaller than the 32x32 grid exercise the clamped bins
        for shape in ((3, 2), (1, 1), (32, 5), (5, 70)):
            px = np.full((*shape, 3), 7, dtype=np.uint8)
            px[0, 0] = 200  # some structure
            h = phash63(px)
            assert 0 <= h < (1 << PHASH_BITS)
        with pytest.raises(ValueError, match="empty"):
            phash63(np.zeros((0, 4, 3), dtype=np.uint8))

    def test_constant_image_hashes_to_zero(self):
        # all-equal coefficients: nothing is strictly above the median
        h = phash63(np.full((16, 16, 3), 123, dtype=np.uint8))
        assert h == 0


class TestSpark:
    def test_kernel_matches_fixture_pins(self, spark):
        media = spark.read.parquet(FIXTURE)
        got = {
            r["media_id"]: r["phash"]
            for r in image_phash(
                media.select("media_id", "fmt", "payload"), batch_rows=3
            ).collect()
        }
        for r in media.collect():
            assert got[r["media_id"]] == r["exp_phash"], r["media_id"]

    def test_planted_pairs_found_singletons_absent(self, spark):
        media = spark.read.parquet(FIXTURE).select(
            "media_id", "fmt", "payload"
        )
        pairs = {
            (r["a"], r["b"]): r["hamming"]
            for r in image_phash_pairs(media, max_dist=12).collect()
        }
        assert set(pairs) == {(1, 2), (1, 3), (2, 3), (4, 5), (6, 7)}
        assert pairs[(4, 5)] == 0 and pairs[(6, 7)] == 0
        assert all(h <= 12 for h in pairs.values())
        flat = {x for p in pairs for x in p}
        assert flat.isdisjoint({8, 9, 10})  # singletons never pair


class TestVideoPhash:
    """video_phash_pairs (r11): the composed clip-level dedup — frame
    plan → slice → JPEG decode → pHash → aligned-frame vote."""

    VFIXTURE = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "video_phash_sample.parquet",
    )

    def test_frame_hashes_match_fixture_pins(self, spark):
        from rust_triplets_spark.operators.phash import video_frame_phash

        media = spark.read.parquet(self.VFIXTURE)
        got = {}
        for r in video_frame_phash(
            media.select("media_id", "payload"), n_picks=4, batch_rows=2
        ).collect():
            got.setdefault(r["media_id"], {})[r["pick_ord"]] = r["phash"]
        for r in media.collect():
            exp = dict(zip(r["exp_pick_ord"], r["exp_phash"]))
            assert got.get(r["media_id"], {}) == exp, r["media_id"]

    def test_pairs_and_min_frames_vote(self, spark):
        from rust_triplets_spark.operators.phash import video_phash_pairs

        media = spark.read.parquet(self.VFIXTURE).select(
            "media_id", "payload"
        )
        rows = {
            (r["a"], r["b"]): r.asDict()
            for r in video_phash_pairs(
                media, n_picks=4, max_dist=12, min_frames=3, batch_rows=2
            ).collect()
        }
        # the two planted families pair with all 4 frames close...
        assert set(rows) == {(1, 2), (3, 4)}
        assert rows[(1, 2)]["n_close"] == 4
        assert rows[(3, 4)]["n_close"] == 4
        # ...and the coincidental single-frame matches (clips 1/2 vs 5
        # share one pick at exactly distance 12) are filtered by the
        # vote — drop min_frames to 1 and they appear, proving the
        # false-positive path is live, not vacuous
        loose = {
            (r["a"], r["b"])
            for r in video_phash_pairs(
                media, n_picks=4, max_dist=12, min_frames=1, batch_rows=2
            ).collect()
        }
        assert {(1, 5), (2, 5)} <= loose

    def test_audio_only_contributes_nothing(self, spark):
        from rust_triplets_spark.operators.phash import video_frame_phash

        media = spark.read.parquet(self.VFIXTURE)
        only_audio = media.where("media_id = 7").select(
            "media_id", "payload"
        )
        assert video_frame_phash(only_audio).count() == 0
