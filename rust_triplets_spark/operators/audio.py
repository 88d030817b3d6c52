"""Minimal pure-Python WAV/PCM codec (RIFF: Microsoft/IBM WAVE format,
public spec; chunk layout per RIFF 1991 + RFC 2361 format tags).

The audio counterpart of :mod:`operators.jpeg` / :mod:`operators.codecs`:
the multimodal family's audio branch previously ran only the deterministic
stub kernels because no audio library ships in minimal containers; WAV is
the uncompressed interchange format audio corpora actually ship (and what
every compressed format decodes to), and its container is simple enough to
vendor exactly — so the real-decode branch (schema, Arrow batching,
per-payload fault isolation) now runs end-to-end for audio too.

Coverage: RIFF/WAVE with PCM (format tag 1) at 8/16/24/32-bit integer
depth, IEEE float32 (tag 3), and ITU-T G.711 A-law (tag 6) / µ-law
(tag 7) — the telephony/call-center corpus shape, expanded through the
spec's 256-entry segment tables (vectorized here from the G.711
companding law; same semantics as the classic public-domain CCITT
reference implementation) straight onto the decoder's 16-bit grid.
Any channel count, chunk order per spec (fmt before data, unknown
chunks skipped, word-aligned chunk padding). Deliberately NOT covered
(loud ``ValueError``): ADPCM/MP3 payloads-in-WAV,
WAVE_FORMAT_EXTENSIBLE sub-formats other than PCM/float/G.711, RF64.
Decode speed is pure-Python-orchestrated numpy — fine for the
bounded-batch ``mapInPandas`` media kernels this feeds.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# ITU-T G.711 companding (µ-law / A-law), vectorized integer-exact.
# Segment/mantissa layout per the G.711 tables; operationally identical
# to the classic public-domain CCITT reference (Sun g711.c) expansion —
# µ-law: BIAS 0x84, 8 segments, decoded range ±32124; A-law: 0x55 XOR
# toggle, 13-bit law, decoded range ±32256. Both land directly on the
# decoder's 16-bit grid, so no renormalization is needed.
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def _ulaw_expand_table() -> np.ndarray:
    code = np.arange(256, dtype=np.int64)
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + _ULAW_BIAS) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype(np.int32)


def _alaw_expand_table() -> np.ndarray:
    code = np.arange(256, dtype=np.int64)
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    t = np.where(seg == 0, t + 8,
                 np.where(seg == 1, t + 0x108, (t + 0x108) << (seg - 1)))
    return np.where(a & 0x80, t, -t).astype(np.int32)


ULAW_TO_LINEAR = _ulaw_expand_table()
ALAW_TO_LINEAR = _alaw_expand_table()


def ulaw_compress(pcm: np.ndarray) -> np.ndarray:
    """int16-grid linear → µ-law code bytes (the encoder half, used by
    the fixture writer and the all-256-codes round-trip pin)."""
    x = np.asarray(pcm, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    seg = np.searchsorted(
        np.array([0x100, 0x200, 0x400, 0x800, 0x1000, 0x2000, 0x4000]),
        mag, side="right",
    )
    code = ~(sign | (seg << 4) | ((mag >> (seg + 3)) & 0x0F)) & 0xFF
    return code.astype(np.uint8)


def alaw_compress(pcm: np.ndarray) -> np.ndarray:
    """int16-grid linear → A-law code bytes (13-bit law: input is used
    at 16-bit scale and truncated by 3 per the G.711 mapping)."""
    x = np.asarray(pcm, dtype=np.int64) >> 3
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.where(x >= 0, x, -x - 1)
    # segment = first i with mag <= seg_end[i] (the law's <= boundary:
    # side="left" — side="right" mis-segments exact segment ends like
    # 0x3F and breaks the all-codes round trip on two codes)
    seg = np.searchsorted(
        np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]),
        mag, side="left",
    )
    shift = np.where(seg < 2, 1, np.maximum(seg, 1))
    aval = np.where(
        seg >= 8, 0x7F, (seg << 4) | ((mag >> shift) & 0x0F)
    )
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ``(samples, sample_rate)`` where ``samples`` is int32,
    shape ``(n_frames, n_channels)``, ALWAYS on the 16-bit grid
    (8-bit recentred and shifted up, 24/32-bit shifted down, float32
    ``round(clip(x)·32767)``) — one integer domain for every depth, so
    downstream feature math is depth-independent and integer-exact (the
    audio analogue of the image decoders' uint8-RGB normalization)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("wav: missing RIFF/WAVE header")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("wav: truncated chunk")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("wav: fmt chunk too short")
            tag, nch, rate, _brate, _balign, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: sub-format GUID
                if clen < 40:
                    raise ValueError("wav: extensible fmt chunk too short")
                sub = struct.unpack("<H", body[24:26])[0]
                tag = sub
            if tag not in (1, 3, 6, 7):
                raise ValueError(
                    f"wav: format tag {tag} unsupported (PCM=1 / float=3 "
                    "/ A-law=6 / mu-law=7 only; ADPCM/MP3 need an audio "
                    "library)"
                )
            fmt = (tag, nch, rate, bits)
        elif cid == b"data":
            data = body
    if fmt is None:
        raise ValueError("wav: no fmt chunk")
    if data is None:
        raise ValueError("wav: no data chunk")
    tag, nch, rate, bits = fmt
    if nch < 1:
        raise ValueError("wav: zero channels")
    if tag in (6, 7):
        if bits != 8:
            raise ValueError(f"wav: G.711 depth {bits} invalid (8 only)")
        table = ALAW_TO_LINEAR if tag == 6 else ULAW_TO_LINEAR
        samples = table[np.frombuffer(data, dtype=np.uint8)]
    elif tag == 3:
        if bits != 32:
            raise ValueError(f"wav: float depth {bits} unsupported (32 only)")
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        samples = np.round(np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int32)
    elif bits == 8:
        samples = (
            (np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128) << 8
        )
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 24:
        raw = np.frombuffer(data[: len(data) // 3 * 3], dtype=np.uint8)
        raw = raw.reshape(-1, 3).astype(np.int32)
        v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        samples = np.where(v >= 1 << 23, v - (1 << 24), v).astype(np.int32) >> 8
    elif bits == 32:
        samples = np.frombuffer(data, dtype="<i4").astype(np.int32) >> 16
    else:
        raise ValueError(f"wav: PCM depth {bits} unsupported")
    n = len(samples) // nch * nch
    return samples[:n].reshape(-1, nch), rate


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """(n_frames, n_channels) int → WAV bytes (PCM, test harness for the
    decoder; deterministic byte layout)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    nch = arr.shape[1]
    if bits == 16:
        body = arr.astype("<i2").tobytes()
    elif bits == 8:
        body = (arr.astype(np.int32) + 128).clip(0, 255).astype(np.uint8).tobytes()
    elif bits == 32:
        body = arr.astype("<i4").tobytes()
    else:
        raise ValueError(f"encode_wav: depth {bits} unsupported (8/16/32)")
    balign = nch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, nch, sample_rate, sample_rate * balign, balign, bits
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def encode_g711_wav(
    codes: np.ndarray, sample_rate: int, law: str = "ulaw"
) -> bytes:
    """Raw G.711 code bytes (``(n_frames,)`` or ``(n_frames, n_ch)``
    uint8) → WAV container with format tag 7 (µ-law) / 6 (A-law) —
    the fixture/test-harness counterpart of :func:`encode_wav`."""
    arr = np.asarray(codes, dtype=np.uint8)
    if arr.ndim == 1:
        arr = arr[:, None]
    nch = arr.shape[1]
    tag = {"ulaw": 7, "alaw": 6}[law]
    body = arr.tobytes()
    balign = nch  # 8 bits/sample
    fmt = struct.pack(
        "<HHIIHH", tag, nch, sample_rate, sample_rate * balign, balign, 8
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def autocorr_pitch(samples: np.ndarray, rate: int,
                   f_lo: int = 50, f_hi: int = 500) -> tuple[int, int]:
    """Fundamental-period estimate by integer autocorrelation — the
    classic pitch detector (and the cheap voiced/music/tone signal an
    audio curation pass gates on), kept entirely on int64 so the result
    is bit-stable across engines and platforms: ``r[k] = Σ s[i]·s[i+k]``
    over channel 0 on the decoder's 16-bit grid, maximized over lags
    ``rate//f_hi .. rate//f_lo`` (50–500 Hz by default). Returns
    ``(lag, f0_hz)`` with ``f0_hz = rate // lag``; all-zero (or too
    short) audio returns ``(0, 0)``. Ties take the SMALLEST lag (the
    highest candidate pitch) — deterministic."""
    ch0 = samples[:, 0].astype(np.int64)
    lo = max(1, rate // f_hi)
    hi = rate // f_lo
    if len(ch0) <= hi or not int(np.abs(ch0).sum()):
        return 0, 0
    best_lag, best_r = 0, None
    for k in range(lo, hi + 1):
        r = int((ch0[:-k] * ch0[k:]).sum())
        if best_r is None or r > best_r:
            best_lag, best_r = k, r
    if best_r is None or best_r <= 0:
        return 0, 0  # no positive correlation in the band: unvoiced
    return best_lag, rate // best_lag
