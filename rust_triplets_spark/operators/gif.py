"""Minimal pure-Python GIF codec (GIF87a/GIF89a, CompuServe spec as
published in the W3C GIF89a specification).

The remaining common web image format after PNG/JPEG — and, via its
multi-frame form, the one ANIMATED format a web corpus ships in volume,
which makes it the cheapest real stand-in for video-style frame
sampling: every frame decodes to actual pixels in-sandbox, no codec
library needed (the LZW layer is ~60 lines).

Coverage: GIF87a + GIF89a, global and local color tables, interlaced
images (the 4-pass row schedule, §Appendix E), multi-frame animations
with graphic-control disposal methods 0/1 (keep), 2 (restore to
background) and 3 (restore to previous), transparency holes, and frame
delays. LZW is the GIF variant: variable code width from
``min_code_size+1`` to 12 bits, LSB-first bit packing, CLEAR/END codes,
dictionary cap 4096. Deliberately NOT covered (loud ``ValueError``):
plain-text extensions rendered as pixels (spec-deprecated; skipped as
data), corrupt streams, and code widths outside 2..8.

Encoder: a real LZW compressor (dictionary growth + width bumps +
CLEAR-on-full, mirroring the decoder's table evolution exactly), used by
the fixture generator and the round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-LZW codestream → palette indices (≤ ``n_pixels``; trailing
    data past the image area is ignored per spec)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"gif: LZW min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream ended before image data")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first LZW code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError("gif: LZW code beyond table")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # decoder widens when the NEXT code could address the table
            if len(table) == (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry
    return out[:n_pixels]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Palette indices → GIF-LZW codestream. Tracks the decoder's table
    size exactly (width bumps included) so any spec decoder accepts it."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, width)
    buf = b""
    for px in map(int, indices):
        cand = buf + bytes([px])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        # the decoder appends its mirror entry on RECEIVING that code and
        # widens when its table hits 2^width — mirror both here
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        buf = bytes([px])
    if buf:
        emit(table[buf], width)
        # the decoder appends its mirror entry on RECEIVING this final
        # data code too (unless it is the first code after a clear, when
        # next_code still sits at end+1 — safely below the boundary for
        # min_code_size >= 2); if that append lands its table exactly at
        # 2^width it reads the NEXT code at width+1 bits, so the width
        # bump must be mirrored before END is emitted or a spec decoder
        # reads END at the wrong width (r10 advice; the vendored decoder
        # stops at n_pixels and never hit it)
        if next_code < 4096:
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start row, step)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _read_color_table(payload: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    end = pos + 3 * n
    if end > len(payload):
        raise ValueError("gif: truncated color table")
    return (
        np.frombuffer(payload[pos:end], dtype=np.uint8).reshape(n, 3).copy(),
        end,
    )


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("gif: truncated sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(payload):
            raise ValueError("gif: truncated sub-block")
        chunks.append(payload[pos:pos + n])
        pos += n


def decode_gif_frames(payload: bytes):
    """GIF bytes → ``(frames, delays_cs)``: the list of fully-composited
    ``(screen_h, screen_w, 3)`` uint8 canvases (one per image block,
    disposal and transparency applied between frames) and each frame's
    graphic-control delay in centiseconds (0 when absent)."""
    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (
        b"7a", b"9a",
    ):
        raise ValueError("gif: missing GIF87a/GIF89a header")
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(payload, pos, 2 << (packed & 0x07))
    if bg_idx >= (len(gct) if gct is not None else 0):
        bg_idx = 0
    bg_rgb = gct[bg_idx] if gct is not None else np.zeros(3, np.uint8)

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state (applies to the NEXT image block)
    gce_delay = 0
    gce_transparent: int | None = None
    gce_disposal = 0

    while True:
        if pos >= len(payload):
            raise ValueError("gif: stream ended without trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("gif: truncated extension")
            label = payload[pos]
            pos += 1
            body, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                flags = body[0]
                gce_disposal = (flags >> 2) & 0x07
                gce_delay = struct.unpack_from("<H", body, 1)[0]
                gce_transparent = body[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")

        # image descriptor
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if left + iw > w or top + ih > h:
            raise ValueError("gif: image block outside logical screen")
        ct = gct
        if ipacked & 0x80:
            ct, pos = _read_color_table(payload, pos, 2 << (ipacked & 0x07))
        if ct is None:
            raise ValueError("gif: image without any color table")
        if pos >= len(payload):
            raise ValueError("gif: truncated image block")
        mcs = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        idx = np.frombuffer(
            _lzw_decode(data, mcs, iw * ih), dtype=np.uint8
        )
        if len(idx) < iw * ih:
            raise ValueError("gif: LZW data shorter than image area")
        if len(idx) and int(idx.max()) >= len(ct):
            raise ValueError("gif: palette index out of range")
        rows = idx.reshape(ih, iw)
        if ipacked & 0x40:
            rows = _deinterlace(rows)

        prev_canvas = canvas.copy()
        region = canvas[top:top + ih, left:left + iw]
        if gce_transparent is not None:
            opaque = rows != gce_transparent
            region[opaque] = ct[rows[opaque]]
        else:
            region[:] = ct[rows]
        frames.append(canvas.copy())
        delays.append(gce_delay)

        if gce_disposal == 2:  # restore to background
            canvas[top:top + ih, left:left + iw] = bg_rgb
        elif gce_disposal == 3:  # restore to previous
            canvas = prev_canvas
        # 0/1: leave as-is
        gce_delay, gce_transparent, gce_disposal = 0, None, 0

    if not frames:
        raise ValueError("gif: no image blocks")
    return frames, delays


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame as ``(h, w, 3)`` uint8 — the still-image
    entry point :func:`codecs.decode_image_builtin` dispatches to."""
    return decode_gif_frames(payload)[0][0]


def encode_gif(
    frames,
    palette: np.ndarray,
    *,
    delays_cs=None,
    disposals=None,
    transparent: int | None = None,
    interlace: bool = False,
    bg_index: int = 0,
) -> bytes:
    """Index-array frames (+ shared global palette) → GIF89a bytes.
    ``frames`` are full-canvas ``(h, w)`` uint8 index arrays; per-frame
    delay (centiseconds) and disposal method optional. Test/fixture
    harness for the decoder — real LZW, optional interlace."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape
    pal = np.asarray(palette, dtype=np.uint8)
    n = len(pal)
    size_field = max((n - 1).bit_length(), 1) - 1
    table_n = 2 << size_field
    if table_n < n:
        size_field += 1
        table_n = 2 << size_field
    pal_bytes = pal.tobytes() + b"\x00" * (3 * (table_n - n))
    mcs = max(size_field + 1, 2)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, bg_index, 0)
    out += pal_bytes
    for i, fr in enumerate(frames):
        delay = delays_cs[i] if delays_cs else 0
        disposal = disposals[i] if disposals else 0
        flags = (disposal & 0x07) << 2
        tidx = 0
        if transparent is not None and i > 0:
            flags |= 1
            tidx = transparent
        out += bytes([0x21, 0xF9, 4, flags])
        out += struct.pack("<H", delay)
        out += bytes([tidx, 0])
        out += bytes([0x2C])
        out += struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        rows = fr
        if interlace:
            order = []
            for start, step in _INTERLACE_PASSES:
                order.extend(range(start, h, step))
            rows = fr[order]
        out += bytes([mcs])
        data = _lzw_encode(rows.ravel(), mcs)
        for lo in range(0, len(data), 255):
            chunk = data[lo:lo + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
