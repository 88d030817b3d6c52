"""ID3v2 tag parsing + PII scrubbing for audio columns — the audio twin
of ``operators/exif.py``: music/podcast corpora carry free-text
comments (COMM), unique file identifiers (UFID), application-private
blobs (PRIV), general binary objects (GEOB) and embedded pictures
(APIC, which can themselves carry EXIF GPS) — all strippable metadata a
training pipeline must drop while keeping the catalog fields
(title/artist/album/year/track).

Vendored parser of the PUBLIC id3.org specs, in the exif.py style:

- ID3v2.3 (1999) / ID3v2.4 (2000): a 10-byte header (``ID3``, version,
  flags, SYNCSAFE 28-bit size), then frames of 4-char id + size
  (v2.3: plain big-endian u32; v2.4: syncsafe — the classic version
  trap, handled per version byte) + 2 flag bytes + payload. Padding is
  zero bytes to the declared tag size.
- Text frames (T***): an encoding byte (0 latin-1, 1 UTF-16+BOM,
  3 UTF-8) then the string; COMM adds a 3-byte language + short
  description before the body.
- Unsynchronisation (header flag 0x80) is reversed before frame
  walking: v2.3 stuffs the whole tag body (§5), v2.4 stuffs per frame
  (per-frame fmt bit 0x02, or all frames when the header flag is set,
  §6.1), with the data-length indicator (fmt 0x01) skipped. Compressed
  or encrypted frames raise loudly — never a silent misparse.

Scrubbing is by ALLOWLIST (the exif.py posture): the scrubber re-emits
a canonical v2.4 tag containing only the kept frames (TIT2/TPE1/TALB/
TRCK and the year, re-encoded UTF-8, syncsafe sizes, no padding) and
splices it over the original tag; audio payload bytes after the tag are
untouched. Re-parsing the output inside the same kernel is the
executable proof (the ``exif_gps_scrub`` pattern).

Scale shape at 100 TB: both audits are Arrow-batched ``mapInPandas``
kernels with ``batch_rows`` bounding the working set; blobs never leave
the Arrow stage — only small integer audit columns come out."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# frames kept by the scrub allowlist (catalog fields, v2.4 ids; TYER is
# v2.3's year and maps to TDRC on re-emit)
ID3_KEEP = ("TIT2", "TPE1", "TALB", "TRCK", "TDRC")
_V23_TO_V24 = {"TYER": "TDRC"}


def _syncsafe(n: int) -> bytes:
    if n >= 1 << 28:
        raise ValueError(f"id3: size {n} exceeds syncsafe range")
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])


def _unsyncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError(f"id3: non-syncsafe byte in size field {b!r}")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _decode_text(payload: bytes) -> str:
    """Text-frame body: encoding byte then string (terminator-tolerant)."""
    if not payload:
        return ""
    enc, body = payload[0], payload[1:]
    if enc == 0:
        return body.split(b"\x00", 1)[0].decode("latin-1", "replace")
    if enc == 1:
        return body.decode("utf-16", "replace").split("\x00", 1)[0]
    if enc == 2:
        return body.decode("utf-16-be", "replace").split("\x00", 1)[0]
    if enc == 3:
        return body.split(b"\x00", 1)[0].decode("utf-8", "replace")
    raise ValueError(f"id3: unknown text encoding {enc}")


def parse_id3(payload: bytes) -> dict | None:
    """Parse a leading ID3v2.3/2.4 tag. Returns None when the payload
    carries none; raises ValueError on a structurally malformed tag."""
    if payload[:3] != b"ID3":
        return None
    if len(payload) < 10:
        raise ValueError("id3: truncated header")
    ver_major, _ver_rev, flags = payload[3], payload[4], payload[5]
    if ver_major not in (3, 4):
        raise ValueError(f"id3: unsupported v2.{ver_major}")
    if flags & 0x40:
        raise ValueError("id3: extended header not supported")
    unsync = bool(flags & 0x80)
    size = _unsyncsafe(payload[6:10])
    if 10 + size > len(payload):
        raise ValueError(f"id3: declared size {size} beyond payload")
    tag = payload[10 : 10 + size]
    if unsync and ver_major == 3:
        # v2.3 §5: unsynchronisation (0xFF 0x00 -> 0xFF 0x00 0x00 stuffing
        # reversal) is applied over the WHOLE tag body as the last write
        # step, so reversing it first recovers the original framing —
        # frame sizes then read correctly as plain u32.
        tag = tag.replace(b"\xff\x00", b"\xff")
    frames = []
    pos = 0
    while pos + 10 <= len(tag):
        fid = tag[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if not all(65 <= c <= 90 or 48 <= c <= 57 for c in fid):
            raise ValueError(f"id3: bad frame id {fid!r} at {pos}")
        if ver_major == 4:
            fsize = _unsyncsafe(tag[pos + 4 : pos + 8])
        else:
            (fsize,) = struct.unpack_from(">I", tag, pos + 4)
        if pos + 10 + fsize > len(tag):
            raise ValueError(f"id3: frame {fid!r} size {fsize} beyond tag")
        fmt = tag[pos + 9]
        body = tag[pos + 10 : pos + 10 + fsize]
        if ver_major == 4:
            # v2.4 format flags %0h00kcnp: compression (0x08) / encryption
            # (0x04) would need zlib/keys — loud, never silent misparse.
            if fmt & 0x0C:
                raise ValueError(
                    f"id3: compressed/encrypted frame {fid!r} not supported"
                )
            if fmt & 0x01:  # data-length indicator prefixes the body
                if len(body) < 4:
                    raise ValueError(f"id3: frame {fid!r} DLI truncated")
                body = body[4:]
            # v2.4 §4: the stored frame size counts the data AS WRITTEN
            # (post-unsync), so walk with it then reverse the stuffing.
            # The tag-wide unsync flag means every frame is unsync'd even
            # when a writer omitted the per-frame bit (§6.1).
            if fmt & 0x02 or unsync:
                body = body.replace(b"\xff\x00", b"\xff")
        elif fmt & 0xC0:  # v2.3 format flags %ijk00000: i=compr, j=encr
            raise ValueError(
                f"id3: compressed/encrypted frame {fid!r} not supported"
            )
        frames.append((fid.decode("ascii"), body))
        pos += 10 + fsize
    out: dict = {
        "version": ver_major,
        "n_frames": len(frames),
        "tag_bytes": 10 + size,
        "title": None,
        "artist": None,
        "album": None,
        "year": None,
        "has_comm": False,
        "has_ufid": False,
        "has_priv": False,
        "has_geob": False,
        "has_apic": False,
        "frames": frames,
    }
    for fid, body in frames:
        if fid == "TIT2":
            out["title"] = _decode_text(body)
        elif fid == "TPE1":
            out["artist"] = _decode_text(body)
        elif fid == "TALB":
            out["album"] = _decode_text(body)
        elif fid in ("TDRC", "TYER"):
            out["year"] = _decode_text(body)
        elif fid == "COMM":
            out["has_comm"] = True
        elif fid == "UFID":
            out["has_ufid"] = True
        elif fid == "PRIV":
            out["has_priv"] = True
        elif fid == "GEOB":
            out["has_geob"] = True
        elif fid == "APIC":
            out["has_apic"] = True
    return out


def _text_frame(fid: str, text: str) -> bytes:
    body = b"\x03" + text.encode("utf-8")
    return fid.encode("ascii") + _syncsafe(len(body)) + b"\x00\x00" + body


def scrub_id3(payload: bytes) -> tuple[bytes, int]:
    """Strip non-allowlisted ID3 frames: re-emit a canonical v2.4 tag
    with only the catalog fields (UTF-8 re-encoded, frames in allowlist
    order, no padding), splice it over the original tag, leave the
    audio bytes untouched. Returns ``(scrubbed, dropped_frame_count)``;
    tagless payloads pass through with 0. A tag whose every frame drops
    is removed entirely."""
    meta = parse_id3(payload)
    if meta is None:
        return payload, 0
    kept: list[bytes] = []
    dropped = 0
    for fid, body in meta["frames"]:
        fid24 = _V23_TO_V24.get(fid, fid)
        if fid24 in ID3_KEEP:
            kept.append(_text_frame(fid24, _decode_text(body)))
        else:
            dropped += 1
    rest = payload[meta["tag_bytes"]:]
    if not kept:
        return rest, dropped
    frames = b"".join(kept)
    tag = b"ID3\x04\x00\x00" + _syncsafe(len(frames)) + frames
    return tag + rest, dropped


ID3_AUDIT_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("has_id3", T.LongType()),
    T.StructField("version", T.LongType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("title_len", T.LongType()),
    T.StructField("has_comm", T.LongType()),
    T.StructField("has_ufid", T.LongType()),
    T.StructField("has_priv", T.LongType()),
    T.StructField("has_apic", T.LongType()),
])

ID3_SCRUB_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("dropped_frames", T.LongType()),
    T.StructField("bytes_before", T.LongType()),
    T.StructField("bytes_after", T.LongType()),
    T.StructField("frames_after", T.LongType()),
    T.StructField("pii_after", T.LongType()),
    T.StructField("title_kept", T.LongType()),
])


def id3_metadata_audit(media: DataFrame, batch_rows: int = 16) -> DataFrame:
    """Distributed ID3 extraction: version, frame census and PII-frame
    presence flags per payload (exif_metadata_audit shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo : lo + batch_rows]
                rows = []
                for mid, payload in zip(sub["media_id"], sub["payload"]):
                    m = parse_id3(bytes(payload))
                    if m is None:
                        rows.append((int(mid), 0, None, None, None,
                                     None, None, None, None))
                        continue
                    rows.append((
                        int(mid), 1, m["version"], m["n_frames"],
                        len(m["title"]) if m["title"] is not None else None,
                        int(m["has_comm"]), int(m["has_ufid"]),
                        int(m["has_priv"]), int(m["has_apic"]),
                    ))
                yield pd.DataFrame(
                    rows, columns=[f.name for f in ID3_AUDIT_SCHEMA.fields]
                )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=ID3_AUDIT_SCHEMA
    )


def id3_scrub_audit(media: DataFrame, batch_rows: int = 16) -> DataFrame:
    """Distributed scrub with the re-parse proof: ``pii_after`` is a
    measured re-parse of the scrubbed payload (COMM/UFID/PRIV/GEOB/APIC
    all gone), ``title_kept`` proves the catalog survives."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo : lo + batch_rows]
                rows = []
                for mid, payload in zip(sub["media_id"], sub["payload"]):
                    raw = bytes(payload)
                    before = parse_id3(raw)
                    scrubbed, dropped = scrub_id3(raw)
                    after = parse_id3(scrubbed)
                    pii_after = 0
                    if after is not None and (
                        after["has_comm"] or after["has_ufid"]
                        or after["has_priv"] or after["has_geob"]
                        or after["has_apic"]
                    ):
                        pii_after = 1
                    title_kept = 0
                    if (
                        before is not None and after is not None
                        and before["title"] is not None
                        and before["title"] == after["title"]
                    ):
                        title_kept = 1
                    rows.append((
                        int(mid), int(dropped), len(raw), len(scrubbed),
                        after["n_frames"] if after is not None else 0,
                        pii_after, title_kept,
                    ))
                yield pd.DataFrame(
                    rows, columns=[f.name for f in ID3_SCRUB_SCHEMA.fields]
                )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=ID3_SCRUB_SCHEMA
    )
