"""MP4 container parser + frame-sampling planner (operators/video.py).

Parser facts are pinned against hand-built box trees (the writer is
exercised too, but the truncation/structure tests build raw bytes by
hand so the parser isn't graded by its own encoder). The plan math is
hand-computed on small stts/stss tables. Spark-side: the audit and plan
kernels run over the committed fixture and must match its expected
columns exactly (the same contract the driver's oracle checks)."""

import os
import struct

import pytest

from rust_triplets_spark.operators.video import (
    encode_mp4,
    expand_stts,
    parse_mp4,
    plan_frame_picks,
    video_track,
)

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "video_sample.parquet",
)


def _vid(stts, sync, *, w=64, h=48, ts=600, fourcc="mp4v", tid=1):
    return {
        "track_id": tid, "handler": "vide", "fourcc": fourcc,
        "width": w, "height": h, "timescale": ts, "stts": stts,
        "sync_samples": sync,
    }


def _aud(stts, *, ts=8000, tid=2):
    return {
        "track_id": tid, "handler": "soun", "fourcc": "mp4a",
        "width": 0, "height": 0, "timescale": ts, "stts": stts,
        "sync_samples": None,
    }


class TestParse:
    def test_roundtrip_single_video_track(self):
        payload = encode_mp4(
            movie_timescale=1000,
            tracks=[_vid([(30, 20)], [1, 11, 21])],

        )
        meta = parse_mp4(payload)
        assert meta.major_brand == "isom"
        assert meta.timescale == 1000
        # 30 samples x 20 ticks @600 → 600 media ticks = 1000 movie ticks
        assert meta.duration == 1000
        assert len(meta.tracks) == 1
        t = meta.tracks[0]
        assert (t.track_id, t.handler, t.fourcc) == (1, "vide", "mp4v")
        assert (t.width, t.height) == (64, 48)
        assert (t.timescale, t.duration) == (600, 600)
        assert t.n_samples == 30
        assert t.stts == [(30, 20)]
        assert t.sync_samples == [1, 11, 21]

    def test_multi_track_and_video_track_helper(self):
        payload = encode_mp4(
            movie_timescale=90000,
            tracks=[_aud([(80, 1024)]), _vid([(24, 25)], None)],
        )
        meta = parse_mp4(payload)
        assert len(meta.tracks) == 2
        vt = video_track(meta)
        assert vt is not None and vt.handler == "vide"
        assert vt.sync_samples is None  # no stss box → all-sync
        assert meta.tracks[0].fourcc == "mp4a"

    def test_audio_only_has_no_video_track(self):
        meta = parse_mp4(encode_mp4(movie_timescale=600,
                                    tracks=[_aud([(10, 160)])]))
        assert video_track(meta) is None

    def test_variable_stts_runs(self):
        meta = parse_mp4(encode_mp4(
            movie_timescale=600,
            tracks=[_vid([(3, 100), (2, 50), (1, 200)], [1])],
        ))
        t = meta.tracks[0]
        assert t.stts == [(3, 100), (2, 50), (1, 200)]
        assert t.n_samples == 6
        assert t.duration == 3 * 100 + 2 * 50 + 200

    def test_largesize_box(self):
        # wrap a valid file's moov in a size==1 (64-bit largesize) header
        payload = encode_mp4(movie_timescale=600,
                             tracks=[_vid([(5, 100)], None)])
        # find moov
        i = payload.index(b"moov") - 4
        size = struct.unpack(">I", payload[i:i + 4])[0]
        body = payload[i + 8:i + size]
        big = (struct.pack(">I", 1) + b"moov"
               + struct.pack(">Q", 16 + len(body)) + body)
        meta = parse_mp4(payload[:i] + big)
        assert meta.tracks[0].n_samples == 5

    def test_unknown_boxes_skipped(self):
        payload = encode_mp4(movie_timescale=600,
                             tracks=[_vid([(5, 100)], None)])
        junk = struct.pack(">I", 16) + b"skip" + b"\xde\xad\xbe\xef" * 2
        meta = parse_mp4(junk + payload)
        assert meta.tracks[0].n_samples == 5

    def test_truncated_header_raises(self):
        with pytest.raises(ValueError, match="mp4"):
            parse_mp4(b"\x00\x00\x00\x10ftyp")  # size 16, only 8 bytes

    def test_box_overrun_raises(self):
        bad = struct.pack(">I", 9999) + b"moov" + b"\x00" * 16
        with pytest.raises(ValueError, match="overruns"):
            parse_mp4(bad)

    def test_no_moov_raises(self):
        only_ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
        with pytest.raises(ValueError, match="no moov"):
            parse_mp4(only_ftyp)

    def test_size_smaller_than_header_raises(self):
        with pytest.raises(ValueError, match="smaller than header"):
            parse_mp4(struct.pack(">I", 4) + b"ftyp" + b"\x00" * 8)


class TestPlan:
    def test_expand_stts(self):
        assert expand_stts([(3, 10), (2, 5)]) == [0, 10, 20, 30, 35]

    def test_uniform_picks_constant_rate(self):
        # 10 samples x 10 ticks = 100 ticks; picks at 0,25,50,75
        picks = plan_frame_picks([(10, 10)], None, 4)
        assert [p[1] for p in picks] == [0, 25, 50, 75]
        assert [p[2] for p in picks] == [1, 3, 6, 8]  # dts 0,20,50,70
        assert [p[3] for p in picks] == [0, 20, 50, 70]
        # no stss → pick is its own keyframe
        assert [p[4] for p in picks] == [1, 3, 6, 8]

    def test_keyframe_snap(self):
        # sync at samples 1 and 6: picks past sample 6 snap to 6
        picks = plan_frame_picks([(10, 10)], [1, 6], 4)
        assert [p[2] for p in picks] == [1, 3, 6, 8]
        assert [p[4] for p in picks] == [1, 1, 6, 6]

    def test_variable_rate_time_uniform_not_index_uniform(self):
        # 2 long samples (100 ticks) then 8 short (10): total 280
        picks = plan_frame_picks([(2, 100), (8, 10)], None, 4)
        # targets 0,70,140,210 → samples 1 (dts0), 1 (dts0<=70<100),
        # 2 (100<=140<200), 4 (dts 210)
        assert [p[2] for p in picks] == [1, 1, 2, 4]
        assert [p[3] for p in picks] == [0, 0, 100, 210]

    def test_single_sample(self):
        assert plan_frame_picks([(1, 100)], None, 3) == [
            (0, 0, 1, 0, 1), (1, 33, 1, 0, 1), (2, 66, 1, 0, 1),
        ]

    def test_empty(self):
        assert plan_frame_picks([], None, 4) == []
        assert plan_frame_picks([(5, 10)], None, 0) == []


class TestSpark:
    def test_metadata_audit_matches_fixture(self, spark):
        from rust_triplets_spark.operators.video import video_metadata_audit

        media = spark.read.parquet(FIXTURE)
        got = {
            r["media_id"]: r.asDict()
            for r in video_metadata_audit(
                media.select("media_id", "fmt", "payload"), batch_rows=3
            ).collect()
        }
        for r in media.collect():
            g = got[r["media_id"]]
            for col in ("n_tracks", "duration_ms", "v_width", "v_height",
                        "v_n_samples", "v_n_sync", "v_fourcc"):
                assert g[col] == r["exp_" + col], (r["media_id"], col)

    def test_frame_plan_matches_fixture(self, spark):
        from rust_triplets_spark.operators.video import video_frame_plan

        media = spark.read.parquet(FIXTURE)
        got = sorted(
            tuple(r) for r in video_frame_plan(
                media.select("media_id", "payload"), n_picks=4, batch_rows=2
            ).collect()
        )
        exp = []
        for r in media.collect():
            for i in range(len(r["exp_pick_ord"])):
                exp.append((
                    r["media_id"], r["exp_pick_ord"][i],
                    r["exp_target_tick"][i], r["exp_sample_n"][i],
                    r["exp_dts_tick"][i], r["exp_key_sample_n"][i],
                ))
        assert got == sorted(exp)


class TestByteRanges:
    def test_range_slices_exact_sample_bytes(self):
        from rust_triplets_spark.operators.video import (
            sample_byte_range,
            sample_fill_byte,
        )

        payload = encode_mp4(
            movie_timescale=1000,
            tracks=[_vid([(12, 50)], [1, 7])],
            samples_per_chunk=5,
        )
        t = video_track(parse_mp4(payload))
        assert len(t.chunk_offsets) == 3  # 5+5+2
        assert t.stsc == [(1, 5, 1)]
        for n in range(1, 13):
            off, ln = sample_byte_range(t, n)
            assert payload[off:off + ln] == bytes(
                [sample_fill_byte(1, n)]
            ) * ln, n

    def test_multi_run_stsc_hand_math(self):
        # hand-built track: chunks [A: 2 samples][B: 2][C: 1] via two
        # stsc runs (chunks 1-2 @2 samples, chunk 3 @1)
        from rust_triplets_spark.operators.video import (
            Mp4Track,
            sample_byte_range,
        )

        t = Mp4Track(
            n_samples=5,
            sample_sizes=[10, 20, 30, 40, 50],
            stsc=[(1, 2, 1), (3, 1, 1)],
            chunk_offsets=[1000, 2000, 3000],
        )
        assert sample_byte_range(t, 1) == (1000, 10)
        assert sample_byte_range(t, 2) == (1010, 20)
        assert sample_byte_range(t, 3) == (2000, 30)
        assert sample_byte_range(t, 4) == (2030, 40)
        assert sample_byte_range(t, 5) == (3000, 50)

    def test_constant_size_stsz(self):
        from rust_triplets_spark.operators.video import (
            Mp4Track,
            sample_byte_range,
        )

        t = Mp4Track(n_samples=4, const_sample_size=100,
                     stsc=[(1, 4, 1)], chunk_offsets=[500])
        assert sample_byte_range(t, 3) == (700, 100)

    def test_out_of_range_and_missing_tables_raise(self):
        from rust_triplets_spark.operators.video import (
            Mp4Track,
            sample_byte_range,
        )

        t = Mp4Track(n_samples=2, sample_sizes=[5, 5],
                     stsc=[(1, 2, 1)], chunk_offsets=[0])
        with pytest.raises(ValueError, match="out of"):
            sample_byte_range(t, 3)
        bare = Mp4Track(n_samples=2, sample_sizes=[5, 5])
        with pytest.raises(ValueError, match="stsc/stco"):
            sample_byte_range(bare, 1)

    def test_spark_byte_ranges_match_fixture(self, spark):
        from rust_triplets_spark.operators.video import video_byte_ranges

        media = spark.read.parquet(FIXTURE)
        got = sorted(
            tuple(r) for r in video_byte_ranges(
                media.select("media_id", "payload"), n_picks=4, batch_rows=2
            ).collect()
        )
        exp = []
        for r in media.collect():
            for i in range(len(r["exp_pick_ord"])):
                exp.append((
                    r["media_id"], r["exp_pick_ord"][i], r["exp_sample_n"][i],
                    r["exp_sample_off"][i], r["exp_sample_len"][i],
                    r["exp_key_sample_n"][i], r["exp_key_off"][i],
                    r["exp_key_len"][i],
                ))
        assert got == sorted(exp)

    def test_fixture_ranges_address_real_mdat_bytes(self, spark):
        # end-to-end honesty check: slice every expected range out of the
        # committed payload and verify the writer's deterministic fill
        from rust_triplets_spark.operators.video import (
            parse_mp4,
            sample_fill_byte,
            video_track,
        )

        for r in spark.read.parquet(FIXTURE).collect():
            payload = bytes(r["payload"])
            vt = video_track(parse_mp4(payload))
            if vt is None:
                continue
            tid = vt.track_id
            for i in range(len(r["exp_pick_ord"])):
                off = r["exp_sample_off"][i]
                ln = r["exp_sample_len"][i]
                n = r["exp_sample_n"][i]
                assert payload[off:off + ln] == bytes(
                    [sample_fill_byte(tid, n)]
                ) * ln


class TestFrameDecode:
    """video_frame_decode_audit (r11): the plan → byte-range → decode
    loop closed to pixels over MJPEG-in-MP4."""

    MJPEG_FIXTURE = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "video_mjpeg_sample.parquet",
    )

    def _mjpeg_clip(self, n=6, w=16, h=8, fourcc="jpeg", extra_audio=False):
        import numpy as np

        from rust_triplets_spark.operators.jpeg import encode_jpeg

        frames = []
        for k in range(n):
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.clip(30 * k + xx * 4 + yy * 3, 0, 255).astype(np.uint8)
            frames.append(encode_jpeg(px[..., None].repeat(3, 2), quality=88))
        tracks = []
        tid = 1
        if extra_audio:
            tracks.append(_aud([(20, 512)], ts=16000, tid=1))
            tid = 2
        tracks.append(_vid([(n, 100)], None, w=w, h=h, ts=600,
                           fourcc=fourcc, tid=tid)
                      | {"sample_data": frames})
        return frames, encode_mp4(movie_timescale=600, tracks=tracks)

    def test_sliced_ranges_are_the_original_jpegs(self):
        # non-circular corroboration: the container walk must re-find the
        # EXACT original JPEG bytes, interleaved mdat included
        from rust_triplets_spark.operators.video import (
            plan_frame_picks,
            sample_byte_range,
        )

        frames, payload = self._mjpeg_clip(extra_audio=True, fourcc="mjpa")
        vt = video_track(parse_mp4(payload))
        for _ord, _tgt, n, _dts, _key in plan_frame_picks(
            vt.stts, vt.sync_samples, 4
        ):
            off, ln = sample_byte_range(vt, n)
            assert payload[off:off + ln] == frames[n - 1]

    def test_decode_audit_matches_direct_decode(self, spark):
        import numpy as np

        from rust_triplets_spark.operators.jpeg import decode_jpeg
        from rust_triplets_spark.operators.video import (
            plan_frame_picks,
            video_frame_decode_audit,
        )

        frames, payload = self._mjpeg_clip()
        media = spark.createDataFrame(
            [(1, bytearray(payload))], "media_id long, payload binary"
        )
        got = sorted(
            tuple(r)
            for r in video_frame_decode_audit(
                media, n_picks=4, batch_rows=2
            ).collect()
        )
        vt = video_track(parse_mp4(payload))
        exp = []
        for ord_, _tgt, n, _dts, _key in plan_frame_picks(
            vt.stts, vt.sync_samples, 4
        ):
            px = decode_jpeg(frames[n - 1]).astype(np.int64)
            h, w = px.shape[:2]
            lum = int((299 * px[..., 0] + 587 * px[..., 1]
                       + 114 * px[..., 2]).sum())
            exp.append((1, ord_, n, h, w, (lum // (1000 * h * w)) // 16))
        assert got == sorted(exp)

    def test_non_mjpeg_fourcc_raises(self, spark):
        from rust_triplets_spark.operators.video import (
            video_frame_decode_audit,
        )

        _, payload = self._mjpeg_clip(fourcc="avc1")
        media = spark.createDataFrame(
            [(1, bytearray(payload))], "media_id long, payload binary"
        )
        with pytest.raises(Exception, match="out of scope"):
            video_frame_decode_audit(media, n_picks=2).collect()

    def test_audio_only_contributes_no_rows(self, spark):
        from rust_triplets_spark.operators.video import (
            video_frame_decode_audit,
        )

        payload = encode_mp4(movie_timescale=600, tracks=[_aud([(10, 160)])])
        media = spark.createDataFrame(
            [(1, bytearray(payload))], "media_id long, payload binary"
        )
        assert video_frame_decode_audit(media).count() == 0

    def test_fixture_expectations_roundtrip(self, spark):
        from rust_triplets_spark.operators.video import (
            video_frame_decode_audit,
        )

        media = spark.read.parquet(self.MJPEG_FIXTURE)
        got = sorted(
            tuple(r)
            for r in video_frame_decode_audit(
                media.select("media_id", "payload"), n_picks=4, batch_rows=2
            ).collect()
        )
        exp = []
        for r in media.collect():
            for i in range(len(r["exp_pick_ord"])):
                exp.append((
                    r["media_id"], r["exp_pick_ord"][i], r["exp_sample_n"][i],
                    r["exp_height"][i], r["exp_width"][i],
                    r["exp_lum_bucket"][i],
                ))
        assert got == sorted(exp)
        # the fixture's luminance pins must actually discriminate frames
        # (a constant-brightness fixture would let off-by-one picks pass)
        per_clip = {}
        for (mid, _o, _n, _h, _w, lb) in exp:
            per_clip.setdefault(mid, set()).add(lb)
        assert any(len(v) >= 3 for v in per_clip.values())

    def test_sample_data_validation(self):
        with pytest.raises(ValueError, match="sample_data/stts mismatch"):
            encode_mp4(movie_timescale=600, tracks=[
                _vid([(3, 100)], None) | {"sample_data": [b"x"]}
            ])
        with pytest.raises(ValueError, match="exclusive"):
            encode_mp4(movie_timescale=600, tracks=[
                _vid([(1, 100)], None)
                | {"sample_data": [b"x"], "sample_sizes": [1]}
            ])
