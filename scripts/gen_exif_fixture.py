"""Generate the committed EXIF metadata/scrub-audit fixture.

Writes ``fixtures/exif_sample.parquet``: real JPEG payloads carrying
hand-packed EXIF APP1 blocks (both byte orders, GPS IFDs with planted
coordinates, maker notes, user comments, a no-GPS case and a no-EXIF
case), alongside the EXPECTED integer audit facts for both
``exif_metadata_audit`` and ``exif_gps_scrub``.

The APP1 blocks are laid out by THIS script's own two-pass TIFF writer
— independent of ``operators/exif.py``'s parser and scrubber, so the
fixture is not self-confirming on the parse side (the scrub-output
expectations are generator-pinned like every media fixture; the
scrubber itself is verified byte-for-byte against hand-packed output
in tests/test_exif.py). GPS microdegree expectations are computed with
``fractions.Fraction`` floor math inline here.

Usage: python scripts/gen_exif_fixture.py
"""

from __future__ import annotations

import os
import struct
import sys
from fractions import Fraction

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_triplets_spark.operators.jpeg import encode_jpeg  # noqa: E402
from rust_triplets_spark.operators.exif import (  # noqa: E402
    parse_exif,
    scrub_exif,
)

SHORT, LONG, ASCII, RATIONAL, UNDEF = 3, 4, 2, 5, 7
_SIZE = {ASCII: 1, SHORT: 2, LONG: 4, RATIONAL: 8, UNDEF: 1}


def _pack_value(endian, ftype, value) -> tuple[bytes, int]:
    """(raw bytes, count) for one entry value."""
    if ftype == ASCII:
        raw = value.encode("ascii") + b"\x00"
        return raw, len(raw)
    if ftype == UNDEF:
        return value, len(value)
    if ftype == SHORT:
        vals = value if isinstance(value, (list, tuple)) else [value]
        return b"".join(struct.pack(endian + "H", v) for v in vals), len(vals)
    if ftype == LONG:
        vals = value if isinstance(value, (list, tuple)) else [value]
        return b"".join(struct.pack(endian + "I", v) for v in vals), len(vals)
    if ftype == RATIONAL:
        return (
            b"".join(struct.pack(endian + "II", n, d) for n, d in value),
            len(value),
        )
    raise AssertionError(ftype)


def build_tiff(endian: str, ifd0, exif_ifd=None, gps_ifd=None) -> bytes:
    """Two-pass hand layout: header, IFD0 (+pointer entries), Exif IFD,
    GPS IFD, data area. ``ifd0``/``exif_ifd``/``gps_ifd`` are lists of
    (tag, ftype, value)."""
    e = endian

    def render(entries, extra_ptrs):
        """entries -> [(tag, ftype, count, raw)], with pointer tags added."""
        out = []
        for tag, ftype, value in entries:
            raw, count = _pack_value(e, ftype, value)
            out.append([tag, ftype, count, raw])
        for tag, off in extra_ptrs:
            out.append([tag, LONG, 1, struct.pack(e + "I", off)])
        return sorted(out, key=lambda r: r[0])

    # pass 1: sizes (pointer offsets needed before data layout)
    n0 = len(ifd0) + (1 if exif_ifd else 0) + (1 if gps_ifd else 0)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    exif_off = ifd0_off + ifd0_size if exif_ifd else 0
    exif_size = (2 + 12 * len(exif_ifd) + 4) if exif_ifd else 0
    gps_off = ifd0_off + ifd0_size + exif_size if gps_ifd else 0
    gps_size = (2 + 12 * len(gps_ifd) + 4) if gps_ifd else 0
    data_off = ifd0_off + ifd0_size + exif_size + gps_size

    data = bytearray()

    def emit(entries):
        body = bytearray(struct.pack(e + "H", len(entries)))
        for tag, ftype, count, raw in entries:
            body += struct.pack(e + "HHI", tag, ftype, count)
            if len(raw) <= 4:
                body += raw.ljust(4, b"\x00")
            else:
                off = data_off + len(data)
                data.extend(raw)
                if len(data) % 2:
                    data.append(0)
                body += struct.pack(e + "I", off)
        body += struct.pack(e + "I", 0)
        return bytes(body)

    ptrs = []
    if exif_ifd:
        ptrs.append((0x8769, exif_off))
    if gps_ifd:
        ptrs.append((0x8825, gps_off))
    b0 = emit(render(ifd0, ptrs))
    bx = emit(render(exif_ifd, [])) if exif_ifd else b""
    bg = emit(render(gps_ifd, [])) if gps_ifd else b""
    header = (b"II" if e == "<" else b"MM") + struct.pack(e + "HI", 42, 8)
    return header + b0 + bx + bg + bytes(data)


def wrap_jpeg(tiff: bytes | None) -> bytes:
    """A real 8x8 baseline JPEG with the TIFF block spliced in as an
    EXIF APP1 right after SOI (None = plain JPEG, no EXIF)."""
    px = np.tile(
        np.linspace(40, 215, 8, dtype=np.uint8).reshape(1, 8, 1), (8, 1, 3)
    )
    jpg = encode_jpeg(px, quality=90)
    if tiff is None:
        return jpg
    seg = b"Exif\x00\x00" + tiff
    return jpg[:2] + b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg + jpg[2:]


def microdeg(d, m, s_num, s_den, ref) -> int:
    total = Fraction(d) + Fraction(m, 60)
    if s_den:
        total += Fraction(s_num, s_den * 3600)
    v = (total.numerator * 1_000_000) // total.denominator
    return -v if ref in ("S", "W") else v


def main() -> None:
    rows = []

    def canonical_tiff_size(kept0, keptx) -> int:
        """HAND-DERIVED size of the scrubber's canonical little-endian
        re-emit, computed from the case's own entry tuples with this
        script's independent ``_pack_value`` (never from scrub output):
        8-byte header + each IFD's ``2 + 12·n + 4`` + the out-of-line
        data area (raw values > 4 bytes, each even-padded)."""
        n0 = len(kept0) + (1 if keptx else 0)
        size = 8 + (2 + 12 * n0 + 4)
        if keptx:
            size += 2 + 12 * len(keptx) + 4
        for _tag, ftype, value in list(kept0) + list(keptx):
            raw, _count = _pack_value("<", ftype, value)
            if len(raw) > 4:
                size += len(raw) + (len(raw) % 2)
        return size

    def add(media_id, tiff, *, orientation, pixel_x, pixel_y, has_gps,
            lat, lon, had_maker, dropped, kept0, keptx,
            orientation_after):
        payload = wrap_jpeg(tiff)
        # generator-side sanity: the module parser must agree with the
        # hand layout BEFORE anything is committed
        meta = parse_exif(payload)
        if tiff is None:
            assert meta is None
        else:
            assert meta["orientation"] == orientation, (media_id, meta)
            assert meta["pixel_x"] == pixel_x
            assert meta["has_gps"] == bool(has_gps)
            assert meta["lat_microdeg"] == lat
            assert meta["lon_microdeg"] == lon
        # scrub-side expectations are hand-derived too (kept0/keptx are
        # the case's allowlist survivors, chosen by the author): the
        # canonical APP1 is 4 marker/length + 6 "Exif\0\0" bytes + the
        # re-emitted TIFF, or removed entirely when nothing survives.
        if tiff is None:
            exp_after = len(payload)
        else:
            exp_after = len(payload) - (4 + 6 + len(tiff))
            if kept0 or keptx:
                exp_after += 4 + 6 + canonical_tiff_size(kept0, keptx)
        scrubbed, ndrop = scrub_exif(payload)
        after = parse_exif(scrubbed)
        assert ndrop == dropped, (media_id, ndrop, dropped)
        assert len(scrubbed) == exp_after, (media_id, len(scrubbed), exp_after)
        got_orient = after["orientation"] if after else None
        assert got_orient == orientation_after, (media_id, got_orient)
        assert after is None or not after["has_gps"]
        rows.append({
            "media_id": media_id,
            "payload": payload,
            "exp_has_exif": 0 if tiff is None else 1,
            "exp_orientation": orientation,
            "exp_pixel_x": pixel_x,
            "exp_pixel_y": pixel_y,
            "exp_has_gps": 1 if has_gps else 0,
            "exp_lat_microdeg": lat,
            "exp_lon_microdeg": lon,
            "exp_had_gps": 1 if has_gps else 0,
            "exp_had_maker_note": 1 if had_maker else 0,
            "exp_dropped_tags": dropped,
            "exp_bytes_before": len(payload),
            "exp_bytes_after": exp_after,
            "exp_gps_after": 0,
            "exp_orientation_after": orientation_after,
        })

    # 1: little-endian, full kit — GPS N/W (San-Francisco-ish), maker
    # note + user comment + Software tag all droppable
    lat1 = [(37, 1), (46, 1), (2974, 100)]
    lon1 = [(122, 1), (25, 1), (986, 100)]
    t1 = build_tiff(
        "<",
        ifd0=[
            (0x010F, ASCII, "ACME"),
            (0x0110, ASCII, "X100"),
            (0x0112, SHORT, 6),
            (0x0131, ASCII, "snapr 1.0"),      # Software: dropped
            (0x0132, ASCII, "2024:05:01 10:00:00"),
        ],
        exif_ifd=[
            (0x9003, ASCII, "2024:05:01 09:59:58"),
            (0x927C, UNDEF, b"SECRET"),         # maker note: dropped
            (0x9286, UNDEF, b"ASCII\x00\x00\x00hi there"),  # dropped
            (0xA002, LONG, 8),
            (0xA003, LONG, 8),
        ],
        gps_ifd=[
            (0x0001, ASCII, "N"),
            (0x0002, RATIONAL, lat1),
            (0x0003, ASCII, "W"),
            (0x0004, RATIONAL, lon1),
        ],
    )
    add(1, t1, orientation=6, pixel_x=8, pixel_y=8, has_gps=1,
        lat=microdeg(37, 46, 2974, 100, "N"),
        lon=microdeg(122, 25, 986, 100, "W"),
        had_maker=True, dropped=1 + 2 + 4, orientation_after=6,
        kept0=[(0x010F, ASCII, "ACME"), (0x0110, ASCII, "X100"),
               (0x0112, SHORT, 6), (0x0132, ASCII, "2024:05:01 10:00:00")],
        keptx=[(0x9003, ASCII, "2024:05:01 09:59:58"),
               (0xA002, LONG, 8), (0xA003, LONG, 8)])

    # 2: big-endian, GPS S/E with millisecond-grade second denominators
    lat2 = [(33, 1), (52, 1), (11123, 1000)]
    lon2 = [(151, 1), (12, 1), (40042, 1000)]
    t2 = build_tiff(
        ">",
        ifd0=[
            (0x0112, SHORT, 1),
            (0x0132, ASCII, "2023:11:20 21:05:10"),
        ],
        gps_ifd=[
            (0x0001, ASCII, "S"),
            (0x0002, RATIONAL, lat2),
            (0x0003, ASCII, "E"),
            (0x0004, RATIONAL, lon2),
        ],
    )
    add(2, t2, orientation=1, pixel_x=None, pixel_y=None, has_gps=1,
        lat=microdeg(33, 52, 11123, 1000, "S"),
        lon=microdeg(151, 12, 40042, 1000, "E"),
        had_maker=False, dropped=4, orientation_after=1,
        kept0=[(0x0112, SHORT, 1), (0x0132, ASCII, "2023:11:20 21:05:10")],
        keptx=[])

    # 3: EXIF, no GPS — everything allowlisted survives, nothing drops
    t3 = build_tiff(
        "<",
        ifd0=[
            (0x0112, SHORT, 3),
            (0x0132, ASCII, "2022:01:02 03:04:05"),
        ],
        exif_ifd=[(0xA002, LONG, 8), (0xA003, LONG, 8)],
    )
    add(3, t3, orientation=3, pixel_x=8, pixel_y=8, has_gps=0,
        lat=None, lon=None, had_maker=False, dropped=0,
        orientation_after=3,
        kept0=[(0x0112, SHORT, 3), (0x0132, ASCII, "2022:01:02 03:04:05")],
        keptx=[(0xA002, LONG, 8), (0xA003, LONG, 8)])

    # 4: plain JPEG, no EXIF at all
    add(4, None, orientation=None, pixel_x=None, pixel_y=None,
        has_gps=0, lat=None, lon=None, had_maker=False, dropped=0,
        orientation_after=None, kept0=[], keptx=[])

    # 5: wild-data GPS — zero-denominator seconds (contributes 0) and a
    # missing longitude ref (lon stays unknown while has_gps is true)
    lat5 = [(51, 1), (30, 1), (0, 0)]
    t5 = build_tiff(
        "<",
        ifd0=[(0x0112, SHORT, 1)],
        gps_ifd=[
            (0x0001, ASCII, "N"),
            (0x0002, RATIONAL, lat5),
            (0x0004, RATIONAL, [(0, 1), (7, 1), (30, 1)]),  # no 0x0003 ref
        ],
    )
    add(5, t5, orientation=1, pixel_x=None, pixel_y=None, has_gps=1,
        lat=microdeg(51, 30, 0, 0, "N"), lon=None,
        had_maker=False, dropped=3, orientation_after=1,
        kept0=[(0x0112, SHORT, 1)], keptx=[])

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "exif_sample.parquet",
    )
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    schema = pa.schema(
        [("media_id", pa.int64()), ("payload", pa.binary())]
        + [(k, pa.int64()) for k in cols if k.startswith("exp_")]
    )
    table = pa.table(
        {k: cols[k] for k in schema.names}, schema=schema
    )
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {len(rows)} payloads")


if __name__ == "__main__":
    main()
