"""Vendored WAV/PCM codec: roundtrips at every depth (all normalized to
the 16-bit grid), hand-crafted chunk-layout edge cases, loud failures on
unsupported shapes, and the Spark audio audit end-to-end against the
committed fixture expectations."""

import math
import struct

import numpy as np
import pytest

from rust_triplets_spark.operators.audio import decode_wav, encode_wav


def test_pcm16_roundtrip_exact():
    rng = np.random.default_rng(5)
    x = rng.integers(-32768, 32768, (1000, 2), dtype=np.int64).astype(np.int32)
    s, rate = decode_wav(encode_wav(x, 44100, 16))
    assert rate == 44100
    assert np.array_equal(s, x)


def test_pcm8_normalizes_to_16bit_grid():
    x = np.array([-128, -1, 0, 127], dtype=np.int32)
    s, rate = decode_wav(encode_wav(x, 8000, 8))
    assert np.array_equal(s[:, 0], x << 8)


def test_pcm32_shifts_down_to_16bit_grid():
    x = (np.array([-30000, -1, 0, 30000], dtype=np.int64) << 16).astype(np.int32)
    s, _ = decode_wav(encode_wav(x, 8000, 32))
    assert np.array_equal(s[:, 0], np.array([-30000, -1, 0, 30000]))


def test_pcm24_handcrafted():
    """24-bit is decoder-only (the encoder doesn't write it): hand-pack
    little-endian 3-byte samples including negatives."""
    vals = [-(1 << 23), -256, 0, 256, (1 << 23) - 1]
    body = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    chunks = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body
              + (b"\x00" if len(body) & 1 else b""))
    payload = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    s, _ = decode_wav(payload)
    assert list(s[:, 0]) == [v >> 8 for v in vals]


def test_float32_lands_on_16bit_grid():
    x = np.array([-1.0, -0.5, 0.0, 0.5, 1.0, 2.0], dtype=np.float32)
    body = x.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 22050, 22050 * 4, 4, 32)
    chunks = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body)
    payload = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    s, rate = decode_wav(payload)
    assert rate == 22050
    # 2.0 clips to 1.0; ±0.5 rounds half-up away from zero via np.round
    assert list(s[:, 0]) == [-32767, -16384, 0, 16384, 32767, 32767]


def test_unknown_chunks_skipped_and_padding_honored():
    """A LIST chunk with odd length before fmt/data must be skipped with
    its pad byte (RIFF word alignment)."""
    x = np.array([100, -100, 50], dtype=np.int32)
    base = encode_wav(x, 8000, 16)
    inner = base[12:]  # fmt + data chunks
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    payload = b"RIFF" + struct.pack("<I", 4 + len(junk) + len(inner)) + b"WAVE" + junk + inner
    s, _ = decode_wav(payload)
    assert list(s[:, 0]) == [100, -100, 50]


def test_unsupported_shapes_are_loud():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"not audio at all")
    # ADPCM (tag 2) rejected
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
    payload = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
               + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(payload)
    with pytest.raises(ValueError, match="no fmt chunk"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_audio_audit_matches_fixture_expectations(spark):
    """The registered query's Spark path reproduces the committed
    expected frame value-for-value (the local twin of the driver gate)."""
    import os

    from rust_triplets_spark.operators.multimodal import audio_decode_audit

    fixture = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "audio_sample.parquet",
    )
    media = spark.read.parquet(fixture)
    got = {
        r["media_id"]: (r["n_frames"], r["n_channels"], r["sample_rate"],
                        r["rms_bucket"], r["zero_crossings"])
        for r in audio_decode_audit(media, batch_rows=3).collect()
    }
    exp = {
        r["media_id"]: (r["exp_n_frames"], r["exp_n_channels"],
                        r["exp_sample_rate"], r["exp_rms_bucket"],
                        r["exp_zero_crossings"])
        for r in media.collect()
    }
    assert got == exp
    # the fixture's own cross-depth pin: pcm8 (id 5) and pcm32 (id 6)
    # carry the same source noise → identical normalized features
    assert got[5] == got[6]


class TestPitch:
    def test_sine_square_silence(self):
        import numpy as np

        from rust_triplets_spark.operators.audio import (
            autocorr_pitch,
            decode_wav,
            encode_wav,
        )

        t = np.arange(8000)
        sine = np.round(
            20000 * np.sin(2 * np.pi * 440 * t / 8000)
        ).astype(np.int32)
        lag, f0 = autocorr_pitch(*decode_wav(encode_wav(sine, 8000, 16)))
        # 8000/440 = 18.18 → the integer lag grid quantizes to 18
        assert (lag, f0) == (18, 444)
        sq = np.where((t // 50) % 2 == 0, 12000, -12000).astype(np.int32)
        assert autocorr_pitch(
            *decode_wav(encode_wav(sq, 16000, 16))
        ) == (100, 160)
        sil = np.zeros(2000, dtype=np.int32)
        assert autocorr_pitch(
            *decode_wav(encode_wav(sil, 8000, 16))
        ) == (0, 0)

    def test_tie_prefers_smallest_lag(self):
        import numpy as np

        from rust_triplets_spark.operators.audio import autocorr_pitch

        # a perfectly periodic signal correlates equally at k and 2k;
        # the smallest lag (highest pitch) must win
        t = np.arange(4000)
        period = 40  # 200 Hz @ 8 kHz — both 40 and 80 are in band
        sig = np.where((t // (period // 2)) % 2 == 0, 10000, -10000)
        s = sig.astype(np.int32)[:, None]
        lag, f0 = autocorr_pitch(s, 8000)
        assert lag == period and f0 == 200

    def test_spark_audit_matches_fixture(self, spark):
        import os

        from rust_triplets_spark.operators.multimodal import audio_pitch_audit

        fixture = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fixtures", "audio_sample.parquet",
        )
        media = spark.read.parquet(fixture)
        got = {
            r["media_id"]: (r["pitch_lag"], r["f0_hz"])
            for r in audio_pitch_audit(
                media.select("media_id", "fmt", "payload"), batch_rows=3
            ).collect()
        }
        for r in media.collect():
            assert got[r["media_id"]] == (
                r["exp_pitch_lag"], r["exp_f0_hz"]
            ), r["media_id"]


class TestG711:
    """ITU-T G.711 companding (r11): expansion tables, the all-codes
    round trip, container decode, and the registered fixture query."""

    def test_spec_full_scale_values(self):
        from rust_triplets_spark.operators.audio import (
            ALAW_TO_LINEAR,
            ULAW_TO_LINEAR,
        )

        # published G.711 full-scale decode values
        assert int(ULAW_TO_LINEAR.max()) == 32124
        assert int(ULAW_TO_LINEAR.min()) == -32124
        assert int(ALAW_TO_LINEAR.max()) == 32256
        assert int(ALAW_TO_LINEAR.min()) == -32256
        # canonical single codes: µ-law 0xFF is +0, A-law 0xD5/0x55 are
        # the smallest-magnitude pair (+8/−8 on the 16-bit grid)
        assert int(ULAW_TO_LINEAR[0xFF]) == 0
        assert int(ALAW_TO_LINEAR[0xD5]) == 8
        assert int(ALAW_TO_LINEAR[0x55]) == -8

    def test_all_codes_round_trip(self):
        from rust_triplets_spark.operators.audio import (
            ALAW_TO_LINEAR,
            ULAW_TO_LINEAR,
            alaw_compress,
            ulaw_compress,
        )

        codes = np.arange(256, dtype=np.uint8)
        ra = alaw_compress(ALAW_TO_LINEAR[codes])
        assert np.array_equal(ra, codes)
        ru = ulaw_compress(ULAW_TO_LINEAR[codes])
        # µ-law's one redundancy: 0x7F (negative zero) decodes to 0,
        # which canonically re-encodes as 0xFF
        mism = np.nonzero(ru != codes)[0]
        assert list(mism) == [0x7F] and ru[0x7F] == 0xFF

    def test_quantization_idempotent(self):
        from rust_triplets_spark.operators.audio import (
            ALAW_TO_LINEAR,
            ULAW_TO_LINEAR,
            alaw_compress,
            ulaw_compress,
        )

        x = np.arange(-32768, 32768, 7, dtype=np.int64)
        qu = ULAW_TO_LINEAR[ulaw_compress(x)]
        qa = ALAW_TO_LINEAR[alaw_compress(x)]
        assert np.array_equal(ULAW_TO_LINEAR[ulaw_compress(qu)], qu)
        assert np.array_equal(ALAW_TO_LINEAR[alaw_compress(qa)], qa)
        # companding error is bounded by the top segment's step + clip
        assert int(np.abs(qu - x).max()) <= 644
        assert int(np.abs(qa - x).max()) <= 512

    def test_container_decode_both_laws(self):
        from rust_triplets_spark.operators.audio import (
            ALAW_TO_LINEAR,
            ULAW_TO_LINEAR,
            encode_g711_wav,
        )

        codes = np.arange(256, dtype=np.uint8)
        for law, table, tag in (("ulaw", ULAW_TO_LINEAR, 7),
                                ("alaw", ALAW_TO_LINEAR, 6)):
            payload = encode_g711_wav(codes, 8000, law)
            s, rate = decode_wav(payload)
            assert rate == 8000 and s.shape == (256, 1)
            assert np.array_equal(s[:, 0], table)
        # stereo interleave: per-channel tables survive the reshape
        stereo = encode_g711_wav(
            np.stack([codes, codes[::-1]], axis=1), 16000, "ulaw"
        )
        s, rate = decode_wav(stereo)
        assert s.shape == (256, 2)
        assert np.array_equal(s[:, 0], ULAW_TO_LINEAR)
        assert np.array_equal(s[:, 1], ULAW_TO_LINEAR[codes[::-1]])

    def test_g711_bad_depth_is_loud(self):
        # tag 7 with bits != 8 violates the law
        fmt = struct.pack("<HHIIHH", 7, 1, 8000, 16000, 2, 16)
        payload = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8)
                   + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                   + b"data" + struct.pack("<I", 0))
        with pytest.raises(ValueError, match="G.711 depth"):
            decode_wav(payload)

    def test_fixture_query_matches_expectations(self, spark):
        import os

        from rust_triplets_spark.operators.multimodal import audio_full_audit

        fixture = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fixtures", "audio_compressed_sample.parquet",
        )
        media = spark.read.parquet(fixture)
        got = {
            r["media_id"]: r.asDict()
            for r in audio_full_audit(
                media.select("media_id", "fmt", "payload"), batch_rows=2
            ).collect()
        }
        for r in media.collect():
            g = got[r["media_id"]]
            for col in ("n_frames", "n_channels", "sample_rate",
                        "rms_bucket", "zero_crossings", "pitch_lag",
                        "f0_hz"):
                assert g[col] == r["exp_" + col], (r["media_id"], col)


class TestImaAdpcmAndRf64:
    """IMA ADPCM (tag 0x11) + RF64 container (r11: the ADPCM/RF64 slice
    of the media long tail)."""

    def _tone(self, n=4000, f=160, rate=8000, amp=12000):
        t = np.arange(n)
        return np.round(amp * np.sin(2 * np.pi * f * t / rate)).astype(
            np.int64
        )

    def test_roundtrip_error_bounded(self):
        from rust_triplets_spark.operators.audio import encode_ima_adpcm_wav

        x = self._tone()
        s, rate = decode_wav(encode_ima_adpcm_wav(x, 8000))
        assert rate == 8000 and s.shape == (len(x), 1)
        err = np.abs(s[:, 0].astype(np.int64) - x)
        # 4-bit ADPCM on a band-limited tone: a few percent of full scale
        assert float(err.mean()) < 0.03 * 12000
        assert int(err.max()) < 0.15 * 32768

    def test_partial_final_block_and_small_blocks(self):
        from rust_triplets_spark.operators.audio import encode_ima_adpcm_wav

        # 100 samples, block_align 16 → spb 25 → 4 blocks (exact) and
        # 90 samples → partial last block (fact chunk bounds the count)
        for n in (100, 90, 1, 24, 26):
            x = self._tone(n=n)
            s, _ = decode_wav(encode_ima_adpcm_wav(x, 8000, block_align=16))
            assert s.shape == (n, 1), n
            # sample 0 of each block is carried verbatim in the header
            assert s[0, 0] == x[0]

    def test_block_decode_hand_math(self):
        from rust_triplets_spark.operators.audio import (
            ima_adpcm_decode_block,
        )

        # predictor 100, index 0 (step 7); nibbles 0x0 then 0x8:
        # +(7>>3)=0 → 100; then -(7>>3)=0 → 100 (indexes move -1, clamp 0)
        block = struct.pack("<hBB", 100, 0, 0) + bytes([0x80])
        got = ima_adpcm_decode_block(block, 3)
        assert list(got) == [100, 100, 100]
        # nibble 0x7: diff = step>>3 + step + step>>1 + step>>2 = 0+7+3+1
        block = struct.pack("<hBB", 0, 0, 0) + bytes([0x07])
        got = ima_adpcm_decode_block(block, 2)
        assert list(got) == [0, 11]

    def test_adpcm_loud_errors(self):
        from rust_triplets_spark.operators.audio import (
            encode_ima_adpcm_wav,
            ima_adpcm_decode_block,
        )

        with pytest.raises(ValueError, match="step index"):
            ima_adpcm_decode_block(struct.pack("<hBB", 0, 90, 0), 1)
        with pytest.raises(ValueError, match="shorter than its header"):
            ima_adpcm_decode_block(b"\x00", 1)
        # stereo ADPCM is a documented gap
        payload = bytearray(encode_ima_adpcm_wav(self._tone(50), 8000))
        fmt_off = payload.index(b"fmt ") + 8
        payload[fmt_off + 2:fmt_off + 4] = struct.pack("<H", 2)  # nch=2
        with pytest.raises(ValueError, match="mono-only"):
            decode_wav(bytes(payload))
        # inconsistent samples_per_block is loud
        payload = bytearray(encode_ima_adpcm_wav(self._tone(50), 8000))
        spb_off = payload.index(b"fmt ") + 8 + 18
        payload[spb_off:spb_off + 2] = struct.pack("<H", 9)
        with pytest.raises(ValueError, match="inconsistent"):
            decode_wav(bytes(payload))

    def _rf64(self, x, rate=8000, with_ds64=True):
        body = np.asarray(x).astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        ds64 = struct.pack("<QQQI", 0, len(body), len(x), 0)
        chunks = b"WAVE"
        if with_ds64:
            chunks += b"ds64" + struct.pack("<I", len(ds64)) + ds64
        chunks += (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                   + b"data" + struct.pack("<I", 0xFFFFFFFF) + body)
        return b"RF64" + struct.pack("<I", 0xFFFFFFFF) + chunks

    def test_rf64_ds64_size_indirection(self):
        x = np.array([100, -100, 50, 7], dtype=np.int32)
        s, rate = decode_wav(self._rf64(x))
        assert rate == 8000 and list(s[:, 0]) == [100, -100, 50, 7]

    def test_rf64_without_ds64_is_loud(self):
        with pytest.raises(ValueError, match="ds64"):
            decode_wav(self._rf64(np.array([1, 2], dtype=np.int32),
                                  with_ds64=False))

    def test_plain_riff_with_ffffffff_size_is_loud(self):
        # the 0xFFFFFFFF escape is an RF64 feature; in a plain RIFF it is
        # just a truncated chunk
        payload = self._rf64(np.array([1, 2], dtype=np.int32))
        payload = b"RIFF" + payload[4:]
        with pytest.raises(ValueError, match="truncated chunk"):
            decode_wav(payload)


from hypothesis import given, settings
from hypothesis import strategies as st


class TestAdpcmReferenceParity:
    @staticmethod
    def _reference_decode(block: bytes, n_samples: int) -> list:
        """Independent straight-from-the-spec decoder: per-nibble
        diff = step/8 + b2*step + b1*step/2 + b0*step/4 via explicit
        arithmetic (no shared helper), sign bit 8, clamp, index walk."""
        step_table = [
            7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
            34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
            143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
            449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
            1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
            3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
            9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
            22385, 24623, 27086, 29794, 32767,
        ]
        idx_delta = [-1, -1, -1, -1, 2, 4, 6, 8]
        pred = int.from_bytes(block[:2], "little", signed=True)
        index = block[2]
        out = [pred]
        for byte in block[4:]:
            for nib in (byte & 0xF, byte >> 4):
                step = step_table[index]
                mag = nib & 7
                diff = (step >> 3) + (step if mag & 4 else 0) \
                    + ((step >> 1) if mag & 2 else 0) \
                    + ((step >> 2) if mag & 1 else 0)
                pred = pred - diff if nib & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                index = max(0, min(88, index + idx_delta[mag]))
                out.append(pred)
                if len(out) == n_samples:
                    return out
        return out[:n_samples]

    @settings(max_examples=80, deadline=None)
    @given(
        pred=st.integers(-32768, 32767),
        index=st.integers(0, 88),
        data=st.binary(min_size=0, max_size=64),
    )
    def test_random_blocks_match_reference(self, pred, index, data):
        from rust_triplets_spark.operators.audio import (
            ima_adpcm_decode_block,
        )

        block = struct.pack("<hBB", pred, index, 0) + data
        n = 1 + 2 * len(data)
        got = list(ima_adpcm_decode_block(block, n))
        assert got == self._reference_decode(block, n)
