"""Audio fingerprint (operators/audiofp.py): kernel properties
(amplitude invariance, codec robustness, separation), Spark kernel
equality with the committed fixture pins, and the half-key + BER-verify
pair query end-to-end."""

import os

import numpy as np

from rust_triplets_spark.operators.audio import (
    decode_wav,
    encode_g711_wav,
    encode_ima_adpcm_wav,
    encode_wav,
    ulaw_compress,
)
from rust_triplets_spark.operators.audiofp import (
    FP_BITS,
    FP_FRAMES,
    audio_fingerprint,
    audio_fp_pairs,
    audio_subfps,
)

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "audio_fp_sample.parquet",
)


def _speechish(seed, n=8000):
    t = np.arange(n)
    r = np.random.default_rng(seed)
    x = sum(
        r.integers(2000, 6000)
        * np.sin(2 * np.pi * r.uniform(300, 1800) * t / 8000
                 + r.uniform(0, 6))
        for _ in range(5)
    )
    x += r.normal(0, 500, n)
    return np.round(np.clip(x, -30000, 30000)).astype(np.int64)


def _fp(payload):
    return audio_subfps(*decode_wav(payload))


def _ber(a, b):
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


class TestKernel:
    def test_shape_and_range(self):
        fp = _fp(encode_wav(_speechish(0).astype(np.int32), 8000, 16))
        assert len(fp) == FP_FRAMES
        assert all(0 <= v < (1 << 16) for v in fp)
        assert FP_BITS == 512

    def test_amplitude_invariance_exact(self):
        x = _speechish(1)
        a = _fp(encode_wav(x.astype(np.int32), 8000, 16))
        b = _fp(encode_wav(np.round(x * 0.6).astype(np.int32), 8000, 16))
        assert a == b  # slope bits compare energies within one frame

    def test_codec_near_distinct_far(self):
        x, y = _speechish(2), _speechish(9)
        fx = _fp(encode_wav(x.astype(np.int32), 8000, 16))
        assert _ber(fx, _fp(encode_g711_wav(
            ulaw_compress(x), 8000, "ulaw"))) <= 64
        assert _ber(fx, _fp(encode_ima_adpcm_wav(x, 8000))) <= 128
        fy = _fp(encode_wav(y.astype(np.int32), 8000, 16))
        assert _ber(fx, fy) > 128

    def test_short_clip_pads_deterministically(self):
        x = _speechish(3, n=700)  # < one FFT frame
        a = _fp(encode_wav(x.astype(np.int32), 8000, 16))
        b = _fp(encode_wav(x.astype(np.int32), 8000, 16))
        assert a == b and len(a) == FP_FRAMES


class TestSpark:
    def test_kernel_matches_fixture_pins(self, spark):
        media = spark.read.parquet(FIXTURE)
        got = {
            r["media_id"]: list(r["subfps"])
            for r in audio_fingerprint(
                media.select("media_id", "fmt", "payload"), batch_rows=3
            ).collect()
        }
        for r in media.collect():
            assert got[r["media_id"]] == list(r["exp_subfps"]), r["media_id"]

    def test_planted_pairs_found_singletons_absent(self, spark):
        media = spark.read.parquet(FIXTURE).select(
            "media_id", "fmt", "payload"
        )
        pairs = {
            (r["a"], r["b"]): r["ber"]
            for r in audio_fp_pairs(media, batch_rows=4).collect()
        }
        assert set(pairs) == {(1, 2), (1, 3), (2, 3), (4, 5), (6, 7)}
        assert pairs[(6, 7)] == 0  # volume change
        assert all(b <= 128 for b in pairs.values())
        flat = {x for p in pairs for x in p}
        assert flat.isdisjoint({8, 9, 10})
