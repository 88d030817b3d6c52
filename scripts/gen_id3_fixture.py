"""Generate the committed ID3 metadata/scrub-audit fixture.

Writes ``fixtures/id3_sample.parquet``: audio payloads carrying
hand-packed ID3v2.3 and v2.4 tags (both frame-size conventions, all
three text encodings, COMM/UFID/PRIV/APIC/GEOB PII frames, padding, a
PII-only tag and a tagless payload), with expected integer audit facts
for ``id3_metadata_audit`` and ``id3_pii_scrub``.

Tags are packed by THIS script's own layout code — independent of
``operators/id3.py`` — and the generator asserts the module parser
agrees with the hand layout before committing anything (the
gen_exif_fixture.py pattern).

Usage: python scripts/gen_id3_fixture.py
"""

from __future__ import annotations

import os
import struct
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_triplets_spark.operators.id3 import parse_id3, scrub_id3  # noqa: E402


def ss(n: int) -> bytes:
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])


def frame(ver: int, fid: str, body: bytes) -> bytes:
    size = ss(len(body)) if ver == 4 else struct.pack(">I", len(body))
    return fid.encode() + size + b"\x00\x00" + body


def tag(ver: int, frames: list[bytes], padding: int = 0) -> bytes:
    body = b"".join(frames) + b"\x00" * padding
    return b"ID3" + bytes([ver, 0, 0]) + ss(len(body)) + body


AUDIO = bytes((i * 73 + 11) % 256 for i in range(300))  # stand-in samples


def main() -> None:
    rows = []

    def add(media_id, payload, *, has_id3, version, n_frames, title_len,
            has_comm, has_ufid, has_priv, has_apic, title_kept,
            dropped, kept_texts, tag_bytes):
        """``dropped`` / ``kept_texts`` / ``tag_bytes`` are HAND-DERIVED
        per case (not read back from the scrubber): the canonical v2.4
        re-emit is 10 header bytes + per kept frame 10 header bytes + 1
        encoding byte + the UTF-8 text, so the expected scrubbed size is
        computable from the kept strings alone. The generator then
        asserts the scrubber AGREES — a scrubber regression fails here
        instead of silently re-pinning its own bug."""
        meta = parse_id3(payload)
        if not has_id3:
            assert meta is None
        else:
            assert meta["version"] == version and meta["n_frames"] == n_frames
            tl = len(meta["title"]) if meta["title"] is not None else None
            assert tl == title_len, (media_id, tl, title_len)
        exp_after = len(payload) - tag_bytes
        if kept_texts:
            exp_after += 10 + sum(11 + len(t.encode("utf-8"))
                                  for t in kept_texts)
        scrubbed, got_dropped = scrub_id3(payload)
        assert got_dropped == dropped, (media_id, got_dropped, dropped)
        assert len(scrubbed) == exp_after, (media_id, len(scrubbed), exp_after)
        after = parse_id3(scrubbed)
        got_frames_after = after["n_frames"] if after else 0
        assert got_frames_after == len(kept_texts), media_id
        assert after is None or not (
            after["has_comm"] or after["has_ufid"] or after["has_priv"]
            or after["has_geob"] or after["has_apic"]
        )
        rows.append({
            "media_id": media_id,
            "payload": payload,
            "exp_has_id3": 1 if has_id3 else 0,
            "exp_version": version,
            "exp_n_frames": n_frames,
            "exp_title_len": title_len,
            "exp_has_comm": None if not has_id3 else int(has_comm),
            "exp_has_ufid": None if not has_id3 else int(has_ufid),
            "exp_has_priv": None if not has_id3 else int(has_priv),
            "exp_has_apic": None if not has_id3 else int(has_apic),
            "exp_dropped_frames": dropped,
            "exp_bytes_before": len(payload),
            "exp_bytes_after": exp_after,
            "exp_frames_after": len(kept_texts),
            "exp_pii_after": 0,
            "exp_title_kept": 1 if title_kept else 0,
        })

    # 1: v2.3 full kit — latin-1 title, UTF-16 artist, year as TYER,
    # COMM/UFID/PRIV/APIC droppables, 16 bytes padding
    f1 = [
        frame(3, "TIT2", b"\x00Night Drive\x00"),
        frame(3, "TPE1", b"\x01" + "Ann Üla".encode("utf-16")),
        frame(3, "TALB", b"\x00Roads"),
        frame(3, "TYER", b"\x001999"),
        frame(3, "COMM", b"\x00engdescr\x00call me 555-0100"),
        frame(3, "UFID", b"owner@example\x00\x01\x02\x03"),
        frame(3, "PRIV", b"com.example/app\x00SECRET"),
        frame(3, "APIC", b"\x00image/jpeg\x00\x03\x00\xff\xd8\xff\xdb fake"),
    ]
    t1 = tag(3, f1, padding=16)
    add(1, t1 + AUDIO,
        has_id3=True, version=3, n_frames=8, title_len=11,
        has_comm=True, has_ufid=True, has_priv=True, has_apic=True,
        title_kept=True, dropped=4, tag_bytes=len(t1),
        kept_texts=["Night Drive", "Ann \u00dcla", "Roads", "1999"])

    # 2: v2.4 syncsafe frame sizes — UTF-8 title, TDRC, GEOB + COMM drop
    f2 = [
        frame(4, "TIT2", b"\x03Stra\xc3\x9fe 42"),
        frame(4, "TDRC", b"\x032004-11"),
        frame(4, "GEOB", b"\x00application/octet-stream\x00f\x00d\x00BLOB"),
        frame(4, "COMM", b"\x03eng\x00note to self"),
    ]
    t2 = tag(4, f2)
    add(2, t2 + AUDIO,
        has_id3=True, version=4, n_frames=4, title_len=9,
        has_comm=True, has_ufid=False, has_priv=False, has_apic=False,
        title_kept=True, dropped=2, tag_bytes=len(t2),
        kept_texts=["Stra\u00dfe 42", "2004-11"])

    # 3: PII-only tag — scrub must remove the tag entirely
    f3 = [
        frame(4, "COMM", b"\x03eng\x00private"),
        frame(4, "PRIV", b"x/y\x00data"),
    ]
    t3 = tag(4, f3)
    add(3, t3 + AUDIO,
        has_id3=True, version=4, n_frames=2, title_len=None,
        has_comm=True, has_ufid=False, has_priv=True, has_apic=False,
        title_kept=False, dropped=2, tag_bytes=len(t3), kept_texts=[])

    # 4: tagless payload — pass-through
    add(4, AUDIO,
        has_id3=False, version=None, n_frames=None, title_len=None,
        has_comm=None, has_ufid=None, has_priv=None, has_apic=None,
        title_kept=False, dropped=0, tag_bytes=0, kept_texts=[])

    # 5: v2.4 UTF-16BE text (encoding 2) + UFID — catalog-only keep
    f5 = [
        frame(4, "TIT2", b"\x02" + "Kühl".encode("utf-16-be")),
        frame(4, "TRCK", b"\x037/12"),
        frame(4, "UFID", b"db\x00\xaa\xbb"),
    ]
    t5 = tag(4, f5)
    add(5, t5 + AUDIO,
        has_id3=True, version=4, n_frames=3, title_len=4,
        has_comm=False, has_ufid=True, has_priv=False, has_apic=False,
        title_kept=True, dropped=1, tag_bytes=len(t5),
        kept_texts=["K\u00fchl", "7/12"])

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "id3_sample.parquet",
    )
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    schema = pa.schema(
        [("media_id", pa.int64()), ("payload", pa.binary())]
        + [(k, pa.int64()) for k in cols if k.startswith("exp_")]
    )
    table = pa.table({k: cols[k] for k in schema.names}, schema=schema)
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {len(rows)} payloads")


if __name__ == "__main__":
    main()
