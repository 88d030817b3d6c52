"""GIF codec (operators/gif.py): LZW pinned against a hand-packed
bitstream (independent of our own encoder), container features
(interlace, local palettes via the builtin dispatch, disposal methods,
transparency, sub-block chaining), and the loud-error contract."""

import numpy as np
import pytest

from rust_triplets_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


class TestLzw:
    def test_hand_packed_vector(self):
        # mcs=2: clear=4 end=5, width starts at 3. Codes
        # [clear, 0, 1, 1, 0(w4), end(w4)] pack LSB-first to 44 02 05
        # and decode to pixels [0, 1, 1, 0]. Verified bit-by-bit by hand
        # (see the width-bump walk in the module docstring rules).
        assert bytes(_lzw_decode(bytes([0x44, 0x02, 0x05]), 2, 4)) == bytes(
            [0, 1, 1, 0]
        )

    def test_roundtrip_widths_and_sizes(self):
        rng = np.random.default_rng(11)
        for mcs in (2, 4, 8):
            for n in (1, 7, 4093, 30000):
                idx = rng.integers(0, 1 << mcs, n, dtype=np.uint8)
                got = _lzw_decode(_lzw_encode(idx, mcs), mcs, n)
                assert bytes(got) == bytes(idx), (mcs, n)

    def test_repetitive_input_exercises_dict_growth(self):
        # long runs force deep dictionary chains + the KwKwK case
        idx = np.tile(np.array([3, 3, 3, 1, 3, 3], dtype=np.uint8), 5000)
        got = _lzw_decode(_lzw_encode(idx, 2), 2, len(idx))
        assert bytes(got) == bytes(idx)

    def test_truncated_stream_raises(self):
        with pytest.raises(ValueError, match="ended before"):
            _lzw_decode(b"\x44", 2, 100)

    def test_code_beyond_table_raises(self):
        # width 3 after clear; feed code 7 first (table has 6 entries)
        # clear(100) then 111 -> bits: 100 111 -> byte 0b00111100 = 0x3C
        with pytest.raises(ValueError, match="first LZW code"):
            _lzw_decode(bytes([0x3C]), 2, 4)

    def test_min_code_size_range(self):
        with pytest.raises(ValueError, match="out of range"):
            _lzw_decode(b"\x00", 1, 1)

    def test_end_code_width_at_final_append_boundary(self):
        # r10 advice: when the decoder's mirror append for the FINAL data
        # code lands its table exactly at 2^width, a spec decoder reads
        # END at width+1 bits — the encoder must mirror the bump before
        # emitting END. This vector (found by instrumented search, seed
        # 21) hits that boundary exactly; the pre-fix encoder makes the
        # decode below raise "stream ended before image data". Asking for
        # MORE pixels than encoded forces the decoder to actually read
        # END (the exact-n_pixels paths never do).
        idx = np.array(
            [3, 1, 2, 1, 2, 1, 0, 1, 2, 2, 3, 0, 1, 3], dtype=np.uint8
        )
        got = _lzw_decode(_lzw_encode(idx, 2), 2, len(idx) + 16)
        assert bytes(got) == bytes(idx)

    def test_end_code_read_fuzz(self):
        # seeded fuzz of the END-read path across widths: every encoded
        # stream must terminate cleanly for a decoder that reads past the
        # data (i.e. END is always written at the width the decoder
        # expects, wherever the final append lands)
        rng = np.random.default_rng(7)
        for mcs in (2, 3, 4, 8):
            for _ in range(60):
                n = int(rng.integers(1, 200))
                idx = rng.integers(0, 1 << mcs, n, dtype=np.uint8)
                got = _lzw_decode(_lzw_encode(idx, mcs), mcs, n + 8)
                assert bytes(got) == bytes(idx), (mcs, n)


class TestContainer:
    def _pal(self, n=8, seed=3):
        return np.random.default_rng(seed).integers(
            0, 256, (n, 3), dtype=np.uint8
        )

    def test_single_frame_pixels(self):
        pal = self._pal()
        fr = np.random.default_rng(4).integers(0, 8, (19, 31), dtype=np.uint8)
        px = decode_gif(encode_gif([fr], pal))
        assert px.shape == (19, 31, 3)
        assert (px == pal[fr]).all()

    def test_interlaced_equals_progressive(self):
        pal = self._pal()
        fr = np.random.default_rng(5).integers(0, 8, (23, 9), dtype=np.uint8)
        assert (
            decode_gif(encode_gif([fr], pal, interlace=True))
            == decode_gif(encode_gif([fr], pal))
        ).all()

    def test_subblock_chaining_large_image(self):
        # > 255 bytes of LZW data forces multi-sub-block chains
        pal = self._pal()
        fr = np.random.default_rng(6).integers(0, 8, (64, 64), dtype=np.uint8)
        assert (decode_gif(encode_gif([fr], pal)) == pal[fr]).all()

    def test_animation_disposal_keep(self):
        pal = self._pal()
        rng = np.random.default_rng(7)
        frs = [rng.integers(0, 8, (12, 10), dtype=np.uint8) for _ in range(3)]
        frames, delays = decode_gif_frames(
            encode_gif(frs, pal, delays_cs=[2, 8, 14])
        )
        assert delays == [2, 8, 14]
        for got, idx in zip(frames, frs):
            assert (got == pal[idx]).all()

    def test_transparency_keeps_previous_pixels(self):
        # frame 2 is all-transparent → composites to frame 1's canvas
        pal = self._pal()
        f1 = np.full((6, 6), 2, dtype=np.uint8)
        f2 = np.full((6, 6), 7, dtype=np.uint8)  # 7 = transparent index
        frames, _ = decode_gif_frames(
            encode_gif([f1, f2], pal, transparent=7)
        )
        assert (frames[1] == frames[0]).all()

    def test_disposal_restore_background(self):
        pal = self._pal()
        f1 = np.full((4, 4), 3, dtype=np.uint8)
        f2 = np.full((4, 4), 7, dtype=np.uint8)  # transparent everywhere
        frames, _ = decode_gif_frames(
            encode_gif([f1, f2], pal, disposals=[2, 0], transparent=7,
                       bg_index=5)
        )
        # f1 disposed to the background color before f2; f2 adds nothing
        assert (frames[1] == pal[5]).all()

    def test_disposal_restore_previous(self):
        pal = self._pal()
        f1 = np.full((4, 4), 1, dtype=np.uint8)
        f2 = np.full((4, 4), 4, dtype=np.uint8)
        f3 = np.full((4, 4), 7, dtype=np.uint8)  # transparent
        frames, _ = decode_gif_frames(
            encode_gif([f1, f2, f3], pal, disposals=[0, 3, 0],
                       transparent=7)
        )
        # f2 was disposal-3: canvas reverts to f1 before f3 composites
        assert (frames[2] == frames[0]).all()

    def test_plain_text_comment_app_extensions_skipped(self):
        # spec-deprecated plain-text (0x01), comment (0xFE), and
        # application (0xFF) extensions must skip cleanly via their
        # sub-block chains and not disturb frame compositing
        import struct as st

        pal = self._pal()
        f0 = np.zeros((3, 3), dtype=np.uint8)
        f1 = np.full((3, 3), 2, dtype=np.uint8)
        payload = encode_gif([f0, f1], pal)
        base_frames, base_delays = decode_gif_frames(payload)

        def ext(label, body):
            out = bytes([0x21, label])
            for lo in range(0, len(body), 255):
                chunk = body[lo:lo + 255]
                out += bytes([len(chunk)]) + chunk
            return out + b"\x00"

        plain = ext(0x01, st.pack("<HHHHBBBB", 0, 0, 3, 3, 1, 1, 1, 0)
                    + b"HI")
        comment = ext(0xFE, b"made by tests")
        app = ext(0xFF, b"NETSCAPE2.0" + b"\x01\x00\x00")
        # inject right after header+GCT (structurally computed — byte
        # scans could false-match inside palette data) and between the
        # two frames' blocks
        gct_size = 3 * (2 << (payload[10] & 0x07))
        first_img = 13 + gct_size
        assert payload[first_img] == 0x21  # first frame's GCE follows
        second = payload.index(b"\x21\xf9", first_img + 2)
        doctored = (payload[:first_img] + plain + comment
                    + payload[first_img:second] + app + payload[second:])
        frames, delays = decode_gif_frames(doctored)
        assert delays == base_delays
        assert len(frames) == len(base_frames)
        for a, b in zip(frames, base_frames):
            assert np.array_equal(a, b)

    def test_gif87a_header_accepted(self):
        pal = self._pal()
        fr = np.zeros((3, 3), dtype=np.uint8)
        payload = bytearray(encode_gif([fr], pal))
        payload[4:6] = b"7a"
        assert decode_gif(bytes(payload)).shape == (3, 3, 3)

    def test_builtin_dispatch(self):
        from rust_triplets_spark.operators.codecs import decode_image_builtin

        pal = self._pal()
        fr = np.random.default_rng(8).integers(0, 8, (5, 7), dtype=np.uint8)
        assert (decode_image_builtin(encode_gif([fr], pal)) == pal[fr]).all()

    def test_bad_header_raises(self):
        with pytest.raises(ValueError, match="GIF87a/GIF89a"):
            decode_gif(b"GIF10a" + b"\x00" * 20)

    def test_missing_trailer_raises(self):
        pal = self._pal()
        fr = np.zeros((3, 3), dtype=np.uint8)
        payload = encode_gif([fr], pal)[:-1]  # drop 0x3B
        with pytest.raises(ValueError, match="trailer|truncated|ended"):
            decode_gif(payload)

    def test_image_outside_screen_raises(self):
        pal = self._pal()
        fr = np.zeros((3, 3), dtype=np.uint8)
        payload = bytearray(encode_gif([fr], pal))
        i = payload.index(0x2C)
        payload[i + 1:i + 3] = (200).to_bytes(2, "little")  # left=200
        with pytest.raises(ValueError, match="outside logical screen"):
            decode_gif(bytes(payload))


class TestSpark:
    def test_gif_frame_audit_matches_fixture(self, spark):
        import os

        from rust_triplets_spark.operators.multimodal import gif_frame_audit

        fixture = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fixtures", "gif_sample.parquet",
        )
        media = spark.read.parquet(fixture)
        got = sorted(
            tuple(r) for r in gif_frame_audit(
                media.select("media_id", "payload"), n_picks=4, batch_rows=2
            ).collect()
        )
        exp = []
        for r in media.collect():
            for i in range(len(r["exp_pick_ord"])):
                exp.append((
                    r["media_id"], r["exp_pick_ord"][i], r["exp_frame_idx"][i],
                    r["exp_target_cs"][i], r["exp_lum_bucket"][i],
                ))
        assert got == sorted(exp)

    def test_disposal_pins_inter_pick_state(self, spark):
        # the dispose-to-background row: picks 0-1 see the opaque first
        # frame, picks 2-3 the background-restored canvas — DIFFERENT
        # buckets, so the audit provably composites rather than decoding
        # frames independently
        import os

        fixture = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fixtures", "gif_sample.parquet",
        )
        row = (
            spark.read.parquet(fixture)
            .where("fmt = 'gif_anim_dispose_bg'")
            .collect()[0]
        )
        buckets = list(row["exp_lum_bucket"])
        assert buckets[0] != buckets[-1]
