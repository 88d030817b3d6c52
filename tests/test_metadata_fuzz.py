"""Property fuzz for the EXIF and ID3 parsers/scrubbers (the gif/LZW
fuzz precedent): randomly GENERATED valid structures must parse to
their generation parameters and survive a scrub→re-parse round trip;
random byte garbage must either be recognized as tag-less or raise the
contracted ValueError — never any other exception."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from rust_triplets_spark.operators.exif import parse_exif, scrub_exif
from rust_triplets_spark.operators.id3 import parse_id3, scrub_id3

# --------------------------------------------------------------------------
# generated-valid EXIF
# --------------------------------------------------------------------------


def _exif_payload(endian, orientation, d, m, s_num, s_den, ref):
    e = "<" if endian == "II" else ">"

    def ifd(entries, next_off=0):
        body = struct.pack(e + "H", len(entries))
        for tag, ftype, count, val4 in entries:
            body += struct.pack(e + "HHI", tag, ftype, count) + val4
        return body + struct.pack(e + "I", next_off)

    # layout: header(8) ifd0(2+2*12+4=30) gps(2+3*12+4=42) data
    gps_off = 8 + 30
    data_off = gps_off + 42
    ifd0 = ifd([
        (0x0112, 3, 1, struct.pack(e + "HH", orientation, 0)),
        (0x8825, 4, 1, struct.pack(e + "I", gps_off)),
    ])
    gps = ifd([
        (0x0001, 2, 2, ref.encode() + b"\x00\x00\x00"),
        (0x0002, 5, 3, struct.pack(e + "I", data_off)),
        (0x0004, 5, 3, struct.pack(e + "I", data_off + 24)),
    ])
    data = b"".join(
        struct.pack(e + "II", n, dd)
        for n, dd in [(d, 1), (m, 1), (s_num, s_den), (10, 1), (2, 1), (1, 2)]
    )
    tiff = (b"II" if endian == "II" else b"MM") + struct.pack(e + "HI", 42, 8)
    tiff += ifd0 + gps + data
    seg = b"Exif\x00\x00" + tiff
    return (
        b"\xff\xd8\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg
        + b"\xff\xda" + struct.pack(">H", 2)
    )


@settings(max_examples=60, deadline=None)
@given(
    endian=st.sampled_from(["II", "MM"]),
    orientation=st.integers(1, 8),
    d=st.integers(0, 89),
    m=st.integers(0, 59),
    s_num=st.integers(0, 59_999),
    s_den=st.sampled_from([1, 10, 100, 1000]),
    ref=st.sampled_from(["N", "S"]),
)
def test_exif_generated_roundtrip(endian, orientation, d, m, s_num, s_den, ref):
    payload = _exif_payload(endian, orientation, d, m, s_num, s_den, ref)
    meta = parse_exif(payload)
    assert meta["byte_order"] == endian
    assert meta["orientation"] == orientation
    assert meta["has_gps"] is True
    # magnitude bound: degrees + minutes + seconds, each ceiled
    bound = (d + 1 + s_num // (s_den * 3600) + 1) * 1_000_000
    assert abs(meta["lat_microdeg"]) <= bound
    assert (meta["lat_microdeg"] < 0) == (ref == "S" and meta["lat_microdeg"] != 0)
    out, dropped = scrub_exif(payload)
    assert dropped == 3  # the gps frames
    after = parse_exif(out)
    assert after["has_gps"] is False
    assert after["orientation"] == orientation
    again, d2 = scrub_exif(out)
    assert again == out and d2 == 0


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_exif_garbage_never_crashes(blob):
    for payload in (blob, b"\xff\xd8" + blob,
                    b"\xff\xd8\xff\xe1" + blob, b"II*\x00" + blob):
        try:
            parse_exif(payload)
            scrub_exif(payload)
        except ValueError:
            pass  # the contracted loud path


# --------------------------------------------------------------------------
# generated-valid ID3
# --------------------------------------------------------------------------


def _ss(n):
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])


@settings(max_examples=60, deadline=None)
@given(
    ver=st.sampled_from([3, 4]),
    title=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0, max_size=40,
    ),
    n_pii=st.integers(0, 4),
    padding=st.integers(0, 32),
)
def test_id3_generated_roundtrip(ver, title, n_pii, padding):
    def frame(fid, body):
        size = _ss(len(body)) if ver == 4 else struct.pack(">I", len(body))
        return fid.encode() + size + b"\x00\x00" + body

    frames = [frame("TIT2", b"\x03" + title.encode("utf-8"))]
    for i in range(n_pii):
        frames.append(frame("COMM", b"\x03eng\x00" + bytes([65 + i]) * i))
    body = b"".join(frames) + b"\x00" * padding
    payload = (
        b"ID3" + bytes([ver, 0, 0]) + _ss(len(body)) + body + b"\xaa" * 50
    )
    m = parse_id3(payload)
    assert m["version"] == ver
    assert m["n_frames"] == 1 + n_pii
    assert m["title"] == title
    assert m["has_comm"] == (n_pii > 0)
    out, dropped = scrub_id3(payload)
    assert dropped == n_pii
    after = parse_id3(out)
    assert after["version"] == 4 and after["title"] == title
    assert not after["has_comm"]
    assert out.endswith(b"\xaa" * 50)
    again, d2 = scrub_id3(out)
    assert again == out and d2 == 0


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_id3_garbage_never_crashes(blob):
    for payload in (blob, b"ID3" + blob):
        try:
            parse_id3(payload)
            scrub_id3(payload)
        except ValueError:
            pass
