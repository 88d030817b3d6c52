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
depth and IEEE float32 (tag 3), any channel count, chunk order per spec
(fmt before data, unknown chunks skipped, word-aligned chunk padding).
Deliberately NOT covered (loud ``ValueError``): ADPCM/µ-law/A-law/MP3
payloads-in-WAV, WAVE_FORMAT_EXTENSIBLE sub-formats other than PCM/float,
RF64. Decode speed is pure-Python-orchestrated numpy — fine for the
bounded-batch ``mapInPandas`` media kernels this feeds.
"""

from __future__ import annotations

import struct

import numpy as np


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
            if tag not in (1, 3):
                raise ValueError(
                    f"wav: format tag {tag} unsupported (PCM=1 / float=3 "
                    "only; ADPCM/mu-law/A-law need an audio library)"
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
    if tag == 3:
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
