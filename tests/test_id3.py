"""ID3 parser/scrubber invariants: hand-built tags in both versions and
all three text encodings, the v2.3-vs-v2.4 frame-size trap, audio-byte
preservation through a scrub, PII-only tag removal, idempotence, byte-
level writer verification and loud errors on malformed tags."""

import struct

import pytest

from rust_triplets_spark.operators.id3 import (
    id3_metadata_audit,
    id3_scrub_audit,
    parse_id3,
    scrub_id3,
)


def _ss(n):
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])


def _frame(ver, fid, body):
    size = _ss(len(body)) if ver == 4 else struct.pack(">I", len(body))
    return fid.encode() + size + b"\x00\x00" + body


def _tag(ver, frames, padding=0):
    body = b"".join(frames) + b"\x00" * padding
    return b"ID3" + bytes([ver, 0, 0]) + _ss(len(body)) + body


AUDIO = b"\x01\x02" * 100


def test_v23_plain_sizes_and_encodings():
    payload = _tag(3, [
        _frame(3, "TIT2", b"\x00Latin"),
        _frame(3, "TPE1", b"\x01" + "Ünï".encode("utf-16")),
        _frame(3, "TYER", b"\x001987"),
    ]) + AUDIO
    m = parse_id3(payload)
    assert m["version"] == 3 and m["n_frames"] == 3
    assert m["title"] == "Latin" and m["artist"] == "Ünï"
    assert m["year"] == "1987"


def test_v24_syncsafe_sizes_large_frame():
    """A 200-byte body: v2.4 syncsafe (0x01 0x48) differs from plain
    u32 — misreading the convention would desync the walk."""
    body = b"\x03" + b"x" * 199
    payload = _tag(4, [_frame(4, "TIT2", body),
                       _frame(4, "TRCK", b"\x031")]) + AUDIO
    m = parse_id3(payload)
    assert m["n_frames"] == 2 and len(m["title"]) == 199


def test_no_tag_passthrough():
    assert parse_id3(AUDIO) is None
    out, dropped = scrub_id3(AUDIO)
    assert out == AUDIO and dropped == 0


def test_scrub_keeps_catalog_drops_pii_and_preserves_audio():
    payload = _tag(3, [
        _frame(3, "TIT2", b"\x00Song"),
        _frame(3, "TYER", b"\x002001"),
        _frame(3, "COMM", b"\x00engd\x00secret"),
        _frame(3, "UFID", b"o\x00\x01"),
    ], padding=8) + AUDIO
    out, dropped = scrub_id3(payload)
    assert dropped == 2
    m = parse_id3(out)
    assert m["version"] == 4  # canonical re-emit
    assert m["title"] == "Song" and m["year"] == "2001"
    assert not (m["has_comm"] or m["has_ufid"])
    assert out.endswith(AUDIO)  # audio bytes untouched


def test_scrub_removes_pii_only_tag():
    payload = _tag(4, [_frame(4, "COMM", b"\x03eng\x00x")]) + AUDIO
    out, dropped = scrub_id3(payload)
    assert dropped == 1 and out == AUDIO


def test_scrub_idempotent():
    payload = _tag(3, [
        _frame(3, "TIT2", b"\x00T"), _frame(3, "PRIV", b"o\x00d"),
    ]) + AUDIO
    once, _ = scrub_id3(payload)
    twice, d2 = scrub_id3(once)
    assert twice == once and d2 == 0


def test_scrub_writer_byte_level():
    """Canonical re-emit of a single kept frame equals a hand-packed
    v2.4 tag byte-for-byte."""
    payload = _tag(3, [_frame(3, "TIT2", b"\x00Hi")]) + AUDIO
    out, _ = scrub_id3(payload)
    body = b"\x03Hi"
    exp_frame = b"TIT2" + _ss(len(body)) + b"\x00\x00" + body
    exp = b"ID3\x04\x00\x00" + _ss(len(exp_frame)) + exp_frame + AUDIO
    assert out == exp


def _stuff(raw):
    """Writer-side unsynchronisation: insert 0x00 after every 0xFF (the
    spec permits stuffing every 0xFF; readers must reverse any
    0xFF 0x00 pair)."""
    return raw.replace(b"\xff", b"\xff\x00")


def test_v23_whole_tag_unsync():
    """v2.3 unsync stuffs the ENTIRE tag body after framing — frame
    sizes and 0xFF-bearing bodies only parse after de-unsync."""
    raw = (_frame(3, "TIT2", b"\x00Caf\xff")
           + _frame(3, "PRIV", b"o\x00\xff\xe0\xff\xff"))
    stuffed = _stuff(raw)
    assert stuffed != raw  # the trap is real
    payload = b"ID3\x03\x00\x80" + _ss(len(stuffed)) + stuffed + AUDIO
    m = parse_id3(payload)
    assert m["n_frames"] == 2
    assert m["title"] == "Caf\xff" and m["has_priv"]
    # scrub of an unsync'd tag re-emits canonically and drops the PII
    out, dropped = scrub_id3(payload)
    assert dropped == 1 and out.endswith(AUDIO)
    after = parse_id3(out)
    assert after["title"] == "Caf\xff" and not after["has_priv"]


def test_v24_per_frame_unsync_and_dli():
    """v2.4 unsyncs per frame: stored size counts the stuffed bytes;
    a data-length indicator (fmt 0x01) prefixes the body with the
    original size and must be skipped."""
    raw = b"\x00Jazz\xff\xfe"
    stored = _stuff(raw)
    f_unsync = b"TIT2" + _ss(len(stored)) + b"\x00\x02" + stored
    with_dli = _ss(len(raw)) + stored
    f_dli = b"TALB" + _ss(len(with_dli)) + b"\x00\x03" + with_dli
    payload = _tag(4, [f_unsync, f_dli]) + AUDIO
    m = parse_id3(payload)
    assert m["title"] == "Jazz\xff\xfe" and m["album"] == "Jazz\xff\xfe"


def test_v24_tag_level_unsync_flag_applies_to_all_frames():
    """§6.1: the header unsync flag asserts every frame is unsync'd,
    even when a writer omitted the per-frame bit."""
    raw = b"\x00Hot\xff"
    stored = _stuff(raw)
    frame = b"TIT2" + _ss(len(stored)) + b"\x00\x00" + stored
    payload = b"ID3\x04\x00\x80" + _ss(len(frame)) + frame + AUDIO
    assert parse_id3(payload)["title"] == "Hot\xff"


def test_compressed_and_encrypted_frames_are_loud():
    body = b"\x00x"
    for ver, fmt in ((4, 0x08), (4, 0x04), (3, 0x80), (3, 0x40)):
        size = _ss(len(body)) if ver == 4 else struct.pack(">I", len(body))
        frame = b"TIT2" + size + bytes([0, fmt]) + body
        with pytest.raises(ValueError, match="compressed/encrypted"):
            parse_id3(_tag(ver, [frame]))


def test_malformed_is_loud():
    with pytest.raises(ValueError, match="unsupported"):
        parse_id3(b"ID3\x02\x00\x00" + _ss(0))
    with pytest.raises(ValueError, match="beyond payload"):
        parse_id3(b"ID3\x04\x00\x00" + _ss(100))
    bad_frame = b"ID3\x04\x00\x00" + _ss(12) + b"ti!2" + _ss(2) + b"\x00\x00ab"
    with pytest.raises(ValueError, match="bad frame id"):
        parse_id3(bad_frame)
    with pytest.raises(ValueError, match="non-syncsafe"):
        parse_id3(b"ID3\x04\x00\x00" + b"\x80\x00\x00\x00")


def test_audit_operators_on_fixture(spark):
    import os

    fixture = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "id3_sample.parquet",
    )
    media = spark.read.parquet(fixture)
    exp = {r["media_id"]: r.asDict() for r in media.collect()}
    got = {
        r["media_id"]: r.asDict()
        for r in id3_metadata_audit(
            media.select("media_id", "payload"), batch_rows=2
        ).collect()
    }
    for mid, e in exp.items():
        for col in ("has_id3", "version", "n_frames", "title_len",
                    "has_comm", "has_ufid", "has_priv", "has_apic"):
            assert got[mid][col] == e[f"exp_{col}"], (mid, col)
    sgot = {
        r["media_id"]: r.asDict()
        for r in id3_scrub_audit(
            media.select("media_id", "payload"), batch_rows=2
        ).collect()
    }
    for mid, e in exp.items():
        for col in ("dropped_frames", "bytes_before", "bytes_after",
                    "frames_after", "pii_after", "title_kept"):
            assert sgot[mid][col] == e[f"exp_{col}"], (mid, col)
