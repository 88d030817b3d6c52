"""EXIF/TIFF metadata parsing + PII scrubbing for image columns — the
multimodal counterpart of ``functions/pii.py``: camera images carry
geolocation (GPS IFD), serial-number-bearing maker notes and free-text
user comments, all of which a training-data pipeline must strip before
the payload ships. The reference has no media code at all; this extends
its ingestion-hygiene story (SURVEY §2.3 cleaning gates) to the binary
columns the driver's multimodal north star mandates.

Vendored parsers of PUBLIC specs, in the repo's jpeg.py/codecs.py style:

- TIFF 6.0 (Adobe, 1992): byte-order header (``II``/``MM``), magic 42,
  IFD chains of 12-byte entries (tag u16, type u16, count u32, value
  inline when it fits 4 bytes else absolute offset from the TIFF base).
- Exif 2.32 (JEITA CP-3451): the TIFF structure embedded in a JPEG APP1
  segment prefixed ``Exif\\0\\0``; private IFD pointers 0x8769 (Exif
  IFD) and 0x8825 (GPS IFD); GPS coordinates as degree/minute/second
  RATIONAL triples with N/S/E/W ASCII refs.

Scrubbing is by ALLOWLIST (the correct PII posture — strip everything
not explicitly kept): the scrubber re-emits a canonical little-endian
APP1 carrying only the kept tags (orientation, timestamps, pixel
dimensions, make/model by default) and NEVER a GPS IFD, maker note or
user comment. Rebuilding (rather than hole-punching the GPS pointer in
place) keeps the output spec-clean: entry counts, ascending tag order
and offsets are all regenerated, and a re-parse of the output is the
executable proof the location data is gone.

GPS coordinates surface as exact-integer MICRODEGREES:
``sign * floor(1e6 * (d + m/60 + s/3600))`` computed over a common
denominator in Python big ints — no float anywhere, so the audit
columns are bit-stable and oracle-checkable against committed
expectations (the media_decode_audit pattern).

Scale shape at 100 TB: both audits are Arrow-batched ``mapInPandas``
kernels over the payload column with ``batch_rows`` bounding the
working set; blobs never leave the Arrow stage — only small integer
audit columns (or the scrubbed payload itself, for the write path)
come out, and nothing here ever shuffles a blob.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from fractions import Fraction

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# TIFF field types (TIFF 6.0 §2): type id -> element byte width
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}
_ASCII = 2
_SHORT = 3
_LONG = 4
_RATIONAL = 5
_UNDEFINED = 7

# IFD0 / Exif-private tags (Exif 2.32 §4.6)
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_DATETIME_ORIGINAL = 0x9003
TAG_MAKER_NOTE = 0x927C
TAG_USER_COMMENT = 0x9286
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003
# GPS IFD tags (Exif 2.32 §4.6.6)
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002
TAG_GPS_LON_REF = 0x0003
TAG_GPS_LON = 0x0004

# default allowlist: what survives a scrub (tag -> home IFD)
SCRUB_KEEP_IFD0 = (TAG_MAKE, TAG_MODEL, TAG_ORIENTATION, TAG_DATETIME)
SCRUB_KEEP_EXIF = (TAG_DATETIME_ORIGINAL, TAG_PIXEL_X, TAG_PIXEL_Y)


class _Entry:
    """One parsed IFD entry with its value bytes resolved."""

    __slots__ = ("tag", "ftype", "count", "raw")

    def __init__(self, tag: int, ftype: int, count: int, raw: bytes):
        self.tag = tag
        self.ftype = ftype
        self.count = count
        self.raw = raw


def _read_ifd(data: bytes, off: int, endian: str) -> list[_Entry]:
    """Parse one IFD's entries, resolving offsetted values. Loud
    ValueError on truncation / out-of-range offsets (the repo's
    malformed-input contract: never silently misparse)."""
    if off + 2 > len(data):
        raise ValueError(f"exif: IFD offset {off} beyond TIFF data")
    (n,) = struct.unpack_from(endian + "H", data, off)
    end = off + 2 + 12 * n
    if end + 4 > len(data):
        raise ValueError(f"exif: IFD at {off} truncated ({n} entries)")
    entries = []
    for i in range(n):
        tag, ftype, count = struct.unpack_from(
            endian + "HHI", data, off + 2 + 12 * i
        )
        if ftype not in _TYPE_SIZE:
            # unknown field type: skip the entry (TIFF readers are
            # required to ignore fields they don't understand), but the
            # 12-byte record is still well-formed so parsing continues
            continue
        size = _TYPE_SIZE[ftype] * count
        vpos = off + 2 + 12 * i + 8
        if size <= 4:
            raw = data[vpos : vpos + size]
        else:
            (voff,) = struct.unpack_from(endian + "I", data, vpos)
            if voff + size > len(data):
                raise ValueError(
                    f"exif: tag 0x{tag:04x} value at {voff}+{size} beyond data"
                )
            raw = data[voff : voff + size]
        entries.append(_Entry(tag, ftype, count, raw))
    return entries


def _u_at(entry: _Entry, endian: str, i: int = 0) -> int:
    if entry.ftype == _SHORT:
        return struct.unpack_from(endian + "H", entry.raw, 2 * i)[0]
    if entry.ftype == _LONG:
        return struct.unpack_from(endian + "I", entry.raw, 4 * i)[0]
    raise ValueError(f"exif: tag 0x{entry.tag:04x} is not integer-typed")


def _ascii(entry: _Entry) -> str:
    return entry.raw.split(b"\x00", 1)[0].decode("ascii", "replace")


def _rationals(entry: _Entry, endian: str) -> list[tuple[int, int]]:
    out = []
    for i in range(entry.count):
        n, d = struct.unpack_from(endian + "II", entry.raw, 8 * i)
        out.append((n, d))
    return out


def dms_to_microdeg(dms: list[tuple[int, int]], ref: str) -> int:
    """Exact-integer microdegrees from (deg, min, sec) rationals:
    ``sign * floor(1e6 * (d + m/60 + s/3600))`` over a common
    denominator (Python big ints — no float, no precision cliff).
    Zero-denominator components contribute zero (seen in the wild for
    'unused' second fields)."""
    total = Fraction(0)
    for (n, d), scale in zip(dms, (1, 60, 3600)):
        if d:
            total += Fraction(n, d * scale)
    micro = (total.numerator * 1_000_000) // total.denominator
    return -micro if ref in ("S", "W") else micro


def parse_exif(payload: bytes) -> dict | None:
    """Parse the EXIF APP1 of a JPEG payload (or a bare TIFF blob).
    Returns None when the payload carries no EXIF; raises ValueError on
    a structurally malformed EXIF block."""
    tiff = _find_tiff(payload)
    if tiff is None:
        return None
    return _parse_tiff(tiff)


def _find_tiff(payload: bytes) -> bytes | None:
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return payload
    if payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows, no more APPn
            return None
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if marker == 0xE1 and payload[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return payload[pos + 10 : pos + 2 + seglen]
        pos += 2 + seglen
    return None


def _parse_tiff(data: bytes) -> dict:
    if len(data) < 8:
        raise ValueError(f"exif: TIFF header truncated ({len(data)} bytes)")
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError(f"exif: bad byte-order mark {data[:2]!r}")
    magic, ifd0_off = struct.unpack_from(endian + "HI", data, 2)
    if magic != 42:
        raise ValueError(f"exif: bad TIFF magic {magic}")
    ifd0 = _read_ifd(data, ifd0_off, endian)
    by_tag = {e.tag: e for e in ifd0}
    out: dict = {
        "byte_order": "II" if endian == "<" else "MM",
        "n_ifd0_tags": len(ifd0),
        "orientation": None,
        "make": None,
        "model": None,
        "datetime": None,
        "datetime_original": None,
        "pixel_x": None,
        "pixel_y": None,
        "has_gps": False,
        "lat_microdeg": None,
        "lon_microdeg": None,
        "has_maker_note": False,
        "has_user_comment": False,
    }
    if TAG_ORIENTATION in by_tag:
        out["orientation"] = _u_at(by_tag[TAG_ORIENTATION], endian)
    if TAG_MAKE in by_tag:
        out["make"] = _ascii(by_tag[TAG_MAKE])
    if TAG_MODEL in by_tag:
        out["model"] = _ascii(by_tag[TAG_MODEL])
    if TAG_DATETIME in by_tag:
        out["datetime"] = _ascii(by_tag[TAG_DATETIME])
    if TAG_EXIF_IFD in by_tag:
        exif_ifd = _read_ifd(data, _u_at(by_tag[TAG_EXIF_IFD], endian), endian)
        for e in exif_ifd:
            if e.tag == TAG_DATETIME_ORIGINAL:
                out["datetime_original"] = _ascii(e)
            elif e.tag == TAG_PIXEL_X:
                out["pixel_x"] = _u_at(e, endian)
            elif e.tag == TAG_PIXEL_Y:
                out["pixel_y"] = _u_at(e, endian)
            elif e.tag == TAG_MAKER_NOTE:
                out["has_maker_note"] = True
            elif e.tag == TAG_USER_COMMENT:
                out["has_user_comment"] = True
    if TAG_GPS_IFD in by_tag:
        gps = _read_ifd(data, _u_at(by_tag[TAG_GPS_IFD], endian), endian)
        gtag = {e.tag: e for e in gps}
        out["has_gps"] = True
        if TAG_GPS_LAT in gtag and TAG_GPS_LAT_REF in gtag:
            out["lat_microdeg"] = dms_to_microdeg(
                _rationals(gtag[TAG_GPS_LAT], endian),
                _ascii(gtag[TAG_GPS_LAT_REF]),
            )
        if TAG_GPS_LON in gtag and TAG_GPS_LON_REF in gtag:
            out["lon_microdeg"] = dms_to_microdeg(
                _rationals(gtag[TAG_GPS_LON], endian),
                _ascii(gtag[TAG_GPS_LON_REF]),
            )
    return out


# ---------------------------------------------------------------------------
# scrub: canonical re-emit of the allowlisted tags only
# ---------------------------------------------------------------------------


def _collect_keepable(data: bytes) -> tuple[list[_Entry], list[_Entry], int]:
    """Parse IFD0 + Exif IFD of a TIFF block, returning (kept IFD0
    entries, kept Exif-IFD entries, dropped entry count). GPS and
    everything not allowlisted drops; pointer tags never count as
    droppable payload themselves."""
    if len(data) < 8:
        raise ValueError(f"exif: TIFF header truncated ({len(data)} bytes)")
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError(f"exif: bad byte-order mark {data[:2]!r}")
    magic = struct.unpack_from(endian + "H", data, 2)[0]
    if magic != 42:
        raise ValueError(f"exif: bad TIFF magic {magic}")
    (ifd0_off,) = struct.unpack_from(endian + "I", data, 4)
    ifd0 = _read_ifd(data, ifd0_off, endian)
    exif = []
    for e in ifd0:
        if e.tag == TAG_EXIF_IFD:
            exif = _read_ifd(data, _u_at(e, endian), endian)
    gps_n = 0
    for e in ifd0:
        if e.tag == TAG_GPS_IFD:
            gps_n = len(_read_ifd(data, _u_at(e, endian), endian))
    keep0 = [e for e in ifd0 if e.tag in SCRUB_KEEP_IFD0]
    keepx = [e for e in exif if e.tag in SCRUB_KEEP_EXIF]
    pointer_tags = {TAG_EXIF_IFD, TAG_GPS_IFD}
    dropped = (
        sum(1 for e in ifd0 if e.tag not in SCRUB_KEEP_IFD0
            and e.tag not in pointer_tags)
        + sum(1 for e in exif if e.tag not in SCRUB_KEEP_EXIF)
        + gps_n
    )
    if endian == ">":
        # canonical output is little-endian: re-encode multi-byte values
        keep0 = [_to_le(e, endian) for e in keep0]
        keepx = [_to_le(e, endian) for e in keepx]
    return keep0, keepx, dropped


def _to_le(e: _Entry, endian: str) -> _Entry:
    if e.ftype in (_ASCII, _UNDEFINED, 1):
        return e
    if e.ftype == _SHORT:
        vals = [_u_at(e, endian, i) for i in range(e.count)]
        return _Entry(e.tag, e.ftype, e.count,
                      b"".join(struct.pack("<H", v) for v in vals))
    if e.ftype == _LONG:
        vals = [_u_at(e, endian, i) for i in range(e.count)]
        return _Entry(e.tag, e.ftype, e.count,
                      b"".join(struct.pack("<I", v) for v in vals))
    if e.ftype == _RATIONAL:
        vals = _rationals(e, endian)
        return _Entry(e.tag, e.ftype, e.count,
                      b"".join(struct.pack("<II", n, d) for n, d in vals))
    raise ValueError(f"exif: cannot re-encode field type {e.ftype}")


def _write_tiff(keep0: list[_Entry], keepx: list[_Entry]) -> bytes:
    """Emit a canonical little-endian TIFF block: header, IFD0 (ascending
    tags, Exif pointer appended when an Exif IFD follows), Exif IFD,
    then the out-of-line data area. Offsets are absolute from the TIFF
    base per spec."""
    keep0 = sorted(keep0, key=lambda e: e.tag)
    keepx = sorted(keepx, key=lambda e: e.tag)
    n0 = len(keep0) + (1 if keepx else 0)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    exif_off = ifd0_off + ifd0_size if keepx else 0
    exif_size = (2 + 12 * len(keepx) + 4) if keepx else 0
    data_off = ifd0_off + ifd0_size + exif_size
    data_area = bytearray()

    def entry_bytes(e: _Entry) -> bytes:
        nonlocal data_area
        head = struct.pack("<HHI", e.tag, e.ftype, e.count)
        if len(e.raw) <= 4:
            return head + e.raw.ljust(4, b"\x00")
        off = data_off + len(data_area)
        data_area += e.raw
        if len(data_area) % 2:  # TIFF 6.0: values begin on word boundaries
            data_area += b"\x00"
        return head + struct.pack("<I", off)

    body0 = bytearray(struct.pack("<H", n0))
    entries0 = list(keep0)
    rendered = [entry_bytes(e) for e in entries0]
    if keepx:
        ptr = struct.pack("<HHI", TAG_EXIF_IFD, _LONG, 1) + struct.pack(
            "<I", exif_off
        )
        # ascending tag order: 0x8769 sorts after every allowlisted IFD0 tag
        rendered.append(ptr)
    body0 += b"".join(rendered) + struct.pack("<I", 0)
    bodyx = bytearray()
    if keepx:
        bodyx += struct.pack("<H", len(keepx))
        bodyx += b"".join(entry_bytes(e) for e in keepx)
        bodyx += struct.pack("<I", 0)
    return (
        b"II*\x00" + struct.pack("<I", ifd0_off)
        + bytes(body0) + bytes(bodyx) + bytes(data_area)
    )


def scrub_exif(payload: bytes) -> tuple[bytes, int]:
    """Strip non-allowlisted EXIF metadata from a JPEG payload (GPS IFD,
    maker notes, user comments, everything else not explicitly kept).
    Returns ``(scrubbed_payload, dropped_entry_count)``; payloads with
    no EXIF pass through unchanged with 0 dropped. The APP1 segment is
    REPLACED by the canonical re-emit (or removed entirely when nothing
    survives the allowlist)."""
    tiff = _find_tiff(payload)
    if tiff is None:
        return payload, 0
    keep0, keepx, dropped = _collect_keepable(tiff)
    new_tiff = _write_tiff(keep0, keepx) if (keep0 or keepx) else b""
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return (new_tiff if new_tiff else payload[:0]), dropped
    # splice: rebuild the JPEG byte stream with the APP1 replaced/removed
    out = bytearray(payload[:2])
    pos = 2
    replaced = False
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            break
        marker = payload[pos + 1]
        if marker == 0xDA:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        is_exif_app1 = (
            marker == 0xE1 and payload[pos + 4 : pos + 10] == b"Exif\x00\x00"
        )
        if is_exif_app1 and not replaced:
            replaced = True
            if new_tiff:
                seg = b"Exif\x00\x00" + new_tiff
                out += b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg
            # else: drop the segment entirely
        else:
            out += payload[pos : pos + 2 + seglen]
        pos += 2 + seglen
    out += payload[pos:]
    return bytes(out), dropped


# ---------------------------------------------------------------------------
# distributed audits
# ---------------------------------------------------------------------------

EXIF_AUDIT_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("has_exif", T.LongType()),
    T.StructField("orientation", T.LongType()),
    T.StructField("pixel_x", T.LongType()),
    T.StructField("pixel_y", T.LongType()),
    T.StructField("has_gps", T.LongType()),
    T.StructField("lat_microdeg", T.LongType()),
    T.StructField("lon_microdeg", T.LongType()),
])

SCRUB_AUDIT_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("had_gps", T.LongType()),
    T.StructField("had_maker_note", T.LongType()),
    T.StructField("dropped_tags", T.LongType()),
    T.StructField("bytes_before", T.LongType()),
    T.StructField("bytes_after", T.LongType()),
    T.StructField("gps_after", T.LongType()),
    T.StructField("orientation_after", T.LongType()),
])


def exif_metadata_audit(media: DataFrame, batch_rows: int = 16) -> DataFrame:
    """Distributed EXIF extraction: geometry, orientation and exact
    integer-microdegree GPS facts per payload. Same mapInPandas shape
    as media_decode_audit — blobs never leave the Arrow stage, only 8
    small integer columns come out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo : lo + batch_rows]
                rows = []
                for mid, payload in zip(sub["media_id"], sub["payload"]):
                    meta = parse_exif(bytes(payload))
                    if meta is None:
                        rows.append((int(mid), 0, None, None, None, 0,
                                     None, None))
                        continue
                    rows.append((
                        int(mid),
                        1,
                        meta["orientation"],
                        meta["pixel_x"],
                        meta["pixel_y"],
                        1 if meta["has_gps"] else 0,
                        meta["lat_microdeg"],
                        meta["lon_microdeg"],
                    ))
                yield pd.DataFrame(
                    rows, columns=[f.name for f in EXIF_AUDIT_SCHEMA.fields]
                )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=EXIF_AUDIT_SCHEMA
    )


def exif_scrub_audit(media: DataFrame, batch_rows: int = 16) -> DataFrame:
    """Distributed scrub with executable proof: scrub each payload, then
    RE-PARSE the output inside the same kernel — ``gps_after`` is a
    measured re-parse, not an assumption. The scrubbed bytes stay in
    the Arrow stage (a write path would sink them; the audit only emits
    integers)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo : lo + batch_rows]
                rows = []
                for mid, payload in zip(sub["media_id"], sub["payload"]):
                    raw = bytes(payload)
                    before = parse_exif(raw)
                    scrubbed, dropped = scrub_exif(raw)
                    after = parse_exif(scrubbed)
                    rows.append((
                        int(mid),
                        1 if (before and before["has_gps"]) else 0,
                        1 if (before and before["has_maker_note"]) else 0,
                        int(dropped),
                        len(raw),
                        len(scrubbed),
                        1 if (after and after["has_gps"]) else 0,
                        after["orientation"] if after else None,
                    ))
                yield pd.DataFrame(
                    rows, columns=[f.name for f in SCRUB_AUDIT_SCHEMA.fields]
                )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=SCRUB_AUDIT_SCHEMA
    )
