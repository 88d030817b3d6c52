"""Minimal pure-Python baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

The last compressed format the multimodal family could not exercise
in-sandbox: PPM/BMP/PNG are covered by :mod:`operators.codecs`; JPEG is
the one a web-scale multimodal corpus actually ships most of. This
module implements the BASELINE sequential DCT process AND the
PROGRESSIVE DCT process (SOF2: spectral selection + successive
approximation, Annex G) from the public spec — together the two shapes
a web corpus actually ships (8-bit, Huffman, 1 or 3 components, any of
the standard 4:4:4 / 4:2:2 / 4:2:0 samplings, optional restart
intervals) — plus small 4:4:4 encoders (sequential and progressive)
used by the tests to produce real bitstreams to decode (JPEG is lossy,
so tests assert closeness, plus exact checks on DC-only images where
the transform chain is analytically exact).

Deliberately NOT covered (loud ``ValueError``): arithmetic coding,
12-bit precision, hierarchical, lossless. Decode speed is pure-Python
scale — fine for the bounded-batch `mapInPandas` media kernels this
feeds (operators/multimodal.py), whose batch shape, not the codec, is
the 100 TB contract; swap PIL in for production throughput.

Everything here is from the public spec: marker layout (B.2), Huffman
decoding procedure (F.2.2), the zig-zag order (A.3.6), the progressive
DC/AC decode procedures with EOB runs and correction bits (G.1.2), the
IDCT as the orthonormal type-III DCT, and the JFIF YCbCr↔RGB matrix
(ITU-T T.871).
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag index order (A.3.6): zigzag[i] = raster position of the i-th
# coefficient in transmission order
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis; IDCT(X) = C.T @ X @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.25) if _k else np.sqrt(0.125)
        )


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class _BitReader:
    """Entropy-coded-segment bit reader with 0xFF00 byte unstuffing and
    restart-marker awareness (F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        d = self.data
        while True:
            if self.pos >= len(d):
                raise ValueError("jpeg: entropy data truncated")
            b = d[self.pos]
            self.pos += 1
            if b != 0xFF:
                return b
            nxt = d[self.pos] if self.pos < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 1
                return 0xFF
            # a real marker: unread it and signal end-of-data
            self.pos -= 1
            raise _MarkerHit()

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.bits = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self) -> None:
        """Skip to just past the next RSTn marker; reset bit state."""
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                self.bits = self.nbits = 0
                return
            self.pos += 1
        raise ValueError("jpeg: expected restart marker")


class _MarkerHit(Exception):
    """Internal: entropy reader ran into a real marker."""


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


class _Huff:
    """Canonical JPEG Huffman table → (code length, symbol) decoder."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB (grayscale replicated)."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0
    coefs: dict[int, np.ndarray] | None = None
    nscans = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        # B.1.1.2: any number of 0xFF fill bytes may pad before the marker
        # id — skip them, or a padded file reads 0xFF as the id, falls
        # through every branch, and swallows a bogus segment length.
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                syms = seg[p + 17:p + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts, syms)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            if marker == 0xC2:
                # per-component coefficient store, sized to the
                # interleaved-padded grid (a superset of every scan's
                # non-interleaved grid); scans accumulate into it and
                # reconstruction happens once, at EOI (G.1)
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                coefs = {
                    c["id"]: np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
                    )
                    for c in comps
                }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg: non-DCT/arithmetic frame type 0xFF{marker:02X} "
                "unsupported (arithmetic/hierarchical/lossless need PIL)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            if frame["progressive"]:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0xF
                if ss == 0 and se != 0:
                    raise ValueError("jpeg: DC scan must have Se=0")
                if ss > 0 and ns != 1:
                    raise ValueError(
                        "jpeg: progressive AC scans must be single-component"
                    )
                pos = _decode_progressive_scan(
                    payload, pos + seglen, frame, scan, ss, se, ah, al,
                    huff_dc, huff_ac, restart_interval, coefs,
                )
                nscans += 1
                continue
            if ns != len(frame["comps"]):
                raise ValueError(
                    "jpeg: non-interleaved (multi-scan) baseline streams "
                    "unsupported — decoding only the first scan would "
                    "silently return color-shifted pixels; use PIL"
                )
            pixels = _decode_scan(
                payload, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
            return pixels
        pos += seglen
    if frame is not None and frame.get("progressive") and nscans:
        return _reconstruct_progressive(frame, coefs, qt)
    raise ValueError("jpeg: no scan found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if len(scan) == 1:
        # A.2.2: a single-component scan is NON-interleaved — one data
        # unit per MCU in component raster order, padded to 8 px (not
        # 8*h*v). The declared sampling factors only shape interleaved
        # geometry, so neutralize them here: a jpegtran-grayscaled 4:2:0
        # source keeps h=v=2 in its SOF and would otherwise decode
        # scrambled (or trip a misleading truncation error).
        comp0 = dict(scan[0][0], h=1, v=1)
        comps = [comp0]
        scan = [(comp0, scan[0][1], scan[0][2])]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    }
    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                br.align_to_restart()
                pred = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for comp, tdc, tac in scan:
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        try:
                            blk = _decode_block(
                                br, huff_dc[tdc], huff_ac[tac]
                            )
                        except _MarkerHit:
                            raise ValueError("jpeg: entropy data ended early")
                        coef = np.zeros(64)
                        coef[ZIGZAG] = blk
                        coef[ZIGZAG[0]] = blk[0] + pred[comp["id"]]
                        pred[comp["id"]] = int(coef[ZIGZAG[0]])
                        px = _idct2(
                            coef.reshape(8, 8) * qt[comp["tq"]]
                        ) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0:y0 + 8, x0:x0 + 8] = px
    out = []
    for c in comps:
        p = planes[c["id"]]
        # upsample to full resolution (nearest, the T.871 default shape)
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    return _to_rgb(out)


def _to_rgb(out: list[np.ndarray]) -> np.ndarray:
    """Full-resolution float planes → (h, w, 3) uint8 (T.871 matrix)."""
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive DCT (SOF2) — T.81 Annex G. Scans accumulate coefficients
# (DC first/refine, AC first with EOB runs, AC refine with correction
# bits) into the per-component store; reconstruction happens once at EOI.
# ---------------------------------------------------------------------------

def _decode_progressive_scan(
    data, pos, frame, scan, ss, se, ah, al, huff_dc, huff_ac, dri, coefs,
):
    """Decode one progressive scan's entropy data into ``coefs``; return
    the byte offset of the next marker."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    br = _BitReader(data, pos)
    try:
        if ss == 0 and len(scan) > 1:
            # interleaved DC scan: MCU geometry exactly as baseline
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            pred = {c["id"]: 0 for c, _, _ in scan}
            cnt = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if dri and cnt and cnt % dri == 0:
                        br.align_to_restart()
                        pred = {c["id"]: 0 for c, _, _ in scan}
                    cnt += 1
                    for comp, tdc, _ in scan:
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                blk = coefs[comp["id"]][
                                    my * comp["v"] + by, mx * comp["h"] + bx
                                ]
                                pred[comp["id"]] = _dc_progressive(
                                    blk, br, huff_dc.get(tdc), ah, al,
                                    pred[comp["id"]],
                                )
        else:
            # non-interleaved (single-component) scan: one data unit per
            # MCU over the component's own block grid (A.2.2)
            comp, tdc, tac = scan[0]
            cw = -(-(w * comp["h"]) // hmax)
            chh = -(-(h * comp["v"]) // vmax)
            bx_n = (cw + 7) // 8
            by_n = (chh + 7) // 8
            arr = coefs[comp["id"]]
            pred_v = 0
            eobrun = 0
            cnt = 0
            for by in range(by_n):
                for bx in range(bx_n):
                    if dri and cnt and cnt % dri == 0:
                        br.align_to_restart()
                        pred_v = 0
                        eobrun = 0
                    cnt += 1
                    blk = arr[by, bx]
                    if ss == 0:
                        pred_v = _dc_progressive(
                            blk, br, huff_dc.get(tdc), ah, al, pred_v
                        )
                    elif ah == 0:
                        eobrun = _ac_first(
                            blk, br, huff_ac[tac], ss, se, al, eobrun
                        )
                    else:
                        eobrun = _ac_refine(
                            blk, br, huff_ac[tac], ss, se, al, eobrun
                        )
    except _MarkerHit:
        raise ValueError("jpeg: entropy data ended early")
    # resync: advance to the next real (non-stuffed, non-restart) marker
    p = br.pos
    while p + 1 < len(data):
        if (
            data[p] == 0xFF
            and data[p + 1] != 0x00
            and data[p + 1] != 0xFF
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            break
        p += 1
    return p


def _dc_progressive(blk, br, hdc, ah, al, pred):
    """G.1.2.1: DC first pass decodes a diff at point-transform Al; the
    refinement pass appends one bit per block."""
    if ah == 0:
        if hdc is None:
            raise ValueError("jpeg: missing DC Huffman table")
        t = hdc.decode(br)
        pred += _extend(br.receive(t), t)
        blk[0] = pred << al
    else:
        if br.read_bit():
            blk[0] |= 1 << al
    return pred


def _ac_first(blk, br, hac, ss, se, al, eobrun):
    """G.1.2.2: AC first pass over band [ss, se] with EOBn run codes."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = hac.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.receive(r)
                return eobrun - 1  # current block is part of the run
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("jpeg: progressive AC index out of band")
        blk[k] = _extend(br.receive(s), s) << al
        k += 1
    return 0


def _ac_refine(blk, br, hac, ss, se, al, eobrun):
    """G.1.2.3: AC refinement — new coefficients arrive as ±1 at bit Al,
    already-nonzero coefficients receive one correction bit each as the
    scan passes over them (including inside EOB runs)."""
    p1 = 1 << al

    def correct(k):
        if br.read_bit() and (abs(int(blk[k])) & p1) == 0:
            blk[k] += p1 if blk[k] > 0 else -p1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = hac.decode(br)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break  # remaining coefficients handled by EOB logic
                # ZRL: pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("jpeg: bad AC refinement symbol")
                val = p1 if br.read_bit() else -p1
            # advance over r zero-history positions, correcting any
            # nonzero-history coefficients passed along the way
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, coefs, qt):
    """Dequantize + IDCT every accumulated block and assemble RGB."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    for c in comps:
        arr = coefs[c["id"]]
        by_n, bx_n = arr.shape[:2]
        q = qt[c["tq"]]
        plane = np.zeros((by_n * 8, bx_n * 8))
        for by in range(by_n):
            for bx in range(bx_n):
                coef = np.zeros(64)
                coef[ZIGZAG] = arr[by, bx]
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    _idct2(coef.reshape(8, 8) * q) + 128.0
                )
        p = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        out.append(p[:h, :w])
    return _to_rgb(out)


def _decode_block(br: _BitReader, hdc: _Huff, hac: _Huff) -> np.ndarray:
    """One 8x8 block in zig-zag order (DC diff in slot 0)."""
    out = np.zeros(64)
    t = hdc.decode(br)
    out[0] = _extend(br.receive(t), t)
    k = 1
    while k < 64:
        rs = hac.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: coefficient index out of range")
        out[k] = _extend(br.receive(s), s)
        k += 1
    return out


# ---------------------------------------------------------------------------
# Encoder (tests only): baseline 4:4:4, one quality knob, standard
# Annex K tables scaled the libjpeg way.
# ---------------------------------------------------------------------------

# Annex K.1 luminance / K.2 chrominance quantization tables
_K1 = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_K2 = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

# Annex K.3 typical Huffman tables (counts per length 1..16, then symbols)
_HT = {
    ("dc", 0): ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                bytes(range(12))),
    ("dc", 1): ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                bytes(range(12))),
    ("ac", 0): ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])),
    ("ac", 1): ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])),
}


def _huff_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        while self.nacc:
            self.write(1, 1)  # pad with 1s per spec


def _scale_q(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * s + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 → baseline 4:4:4 JPEG bytes (test harness for the
    decoder; deterministic)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_jpeg: expected (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qy, qc = _scale_q(_K1, quality), _scale_q(_K2, quality)
    codes = {k: _huff_codes(*v) for k, v in _HT.items()}

    def marker(m, payload_):
        return b"\xff" + bytes([m]) + struct.pack(">H", len(payload_) + 2) + payload_

    out = bytearray(b"\xff\xd8")
    for tq, tbl in ((0, qy), (1, qc)):
        z = np.zeros(64, dtype=np.uint8)
        z = tbl.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += marker(0xDB, bytes([tq]) + z.tobytes())
    out += marker(0xC0, struct.pack(">BHHB", 8, h, w, 3)
                  + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for (kind, tid), (counts, syms) in _HT.items():
        tc = 0 if kind == "dc" else 1
        out += marker(0xC4, bytes([(tc << 4) | tid]) + bytes(counts) + syms)
    out += marker(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    bw = _BitWriter()
    hpad = (h + 7) // 8 * 8
    wpad = (w + 7) // 8 * 8

    def pad(p):
        return np.pad(p, ((0, hpad - h), (0, wpad - w)), mode="edge")

    planes = [(pad(y), qy, 0), (pad(cb), qc, 1), (pad(cr), qc, 1)]
    pred = [0, 0, 0]
    for by in range(hpad // 8):
        for bx in range(wpad // 8):
            for ci, (p, q, tid) in enumerate(planes):
                blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coef = np.round(_dct2(blk) / q).astype(np.int64)
                zz = coef.reshape(-1)[ZIGZAG]
                dc = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t = max(0, int(dc).bit_length() if dc >= 0 else int(-dc).bit_length())
                ln, cd = codes[("dc", tid)][t]
                bw.write(ln, cd)
                if t:
                    bw.write(t, dc if dc >= 0 else dc + (1 << t) - 1)
                run = 0
                last_nz = max([i for i in range(1, 64) if zz[i]] or [0])
                for k in range(1, 64):
                    v = int(zz[k])
                    if k > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, cd = codes[("ac", tid)][0xF0]
                        bw.write(ln, cd)
                        run -= 16
                    s = v.bit_length() if v >= 0 else (-v).bit_length()
                    ln, cd = codes[("ac", tid)][(run << 4) | s]
                    bw.write(ln, cd)
                    bw.write(s, v if v >= 0 else v + (1 << s) - 1)
                    run = 0
                if last_nz < 63:
                    ln, cd = codes[("ac", tid)][0x00]  # EOB
                    bw.write(ln, cd)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 → PROGRESSIVE (SOF2) 4:4:4 JPEG bytes via pure
    spectral selection: scan 1 is the interleaved DC band, scans 2-4 are
    per-component full AC bands (Ss=1..63, no successive approximation).
    Test harness for the progressive decoder — the coefficient math is
    identical to :func:`encode_jpeg`, so decoding this stream must equal
    decoding the baseline stream pixel-for-pixel."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_jpeg_progressive: expected (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qy, qc = _scale_q(_K1, quality), _scale_q(_K2, quality)
    codes = {k: _huff_codes(*v) for k, v in _HT.items()}

    def marker(m, payload_):
        return b"\xff" + bytes([m]) + struct.pack(">H", len(payload_) + 2) + payload_

    out = bytearray(b"\xff\xd8")
    for tq, tbl in ((0, qy), (1, qc)):
        out += marker(0xDB, bytes([tq])
                      + tbl.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes())
    out += marker(0xC2, struct.pack(">BHHB", 8, h, w, 3)
                  + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for (kind, tid), (counts, syms) in _HT.items():
        tc = 0 if kind == "dc" else 1
        out += marker(0xC4, bytes([(tc << 4) | tid]) + bytes(counts) + syms)

    # quantize every block of every component up front (zig-zag order)
    hpad = (h + 7) // 8 * 8
    wpad = (w + 7) // 8 * 8

    def pad(p):
        return np.pad(p, ((0, hpad - h), (0, wpad - w)), mode="edge")

    planes = [(pad(y), qy, 0), (pad(cb), qc, 1), (pad(cr), qc, 1)]
    by_n, bx_n = hpad // 8, wpad // 8
    zz = np.zeros((3, by_n, bx_n, 64), dtype=np.int64)
    for ci, (p, q, _tid) in enumerate(planes):
        for by in range(by_n):
            for bx in range(bx_n):
                blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coef = np.round(_dct2(blk) / q).astype(np.int64)
                zz[ci, by, bx] = coef.reshape(-1)[ZIGZAG]

    # scan 1: interleaved DC (Ss=0, Se=0, Ah=0, Al=0)
    out += marker(0xDA, bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0]))
    bw = _BitWriter()
    pred = [0, 0, 0]
    for by in range(by_n):
        for bx in range(bx_n):
            for ci, tid in ((0, 0), (1, 1), (2, 1)):
                dc = int(zz[ci, by, bx, 0]) - pred[ci]
                pred[ci] = int(zz[ci, by, bx, 0])
                t = dc.bit_length() if dc >= 0 else (-dc).bit_length()
                ln, cd = codes[("dc", tid)][t]
                bw.write(ln, cd)
                if t:
                    bw.write(t, dc if dc >= 0 else dc + (1 << t) - 1)
    bw.flush()
    out += bw.out

    # scans 2-4: one full AC band per component (Ss=1, Se=63, Ah=0, Al=0)
    for ci, (cs, tid) in enumerate(((1, 0), (2, 1), (3, 1))):
        out += marker(0xDA, bytes([1, cs, tid, 1, 63, 0]))
        bw = _BitWriter()
        for by in range(by_n):
            for bx in range(bx_n):
                band = zz[ci, by, bx]
                run = 0
                last_nz = max([i for i in range(1, 64) if band[i]] or [0])
                for k in range(1, 64):
                    if k > last_nz:
                        break
                    v = int(band[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, cd = codes[("ac", tid)][0xF0]
                        bw.write(ln, cd)
                        run -= 16
                    s = v.bit_length() if v >= 0 else (-v).bit_length()
                    ln, cd = codes[("ac", tid)][(run << 4) | s]
                    bw.write(ln, cd)
                    bw.write(s, v if v >= 0 else v + (1 << s) - 1)
                    run = 0
                if last_nz < 63:
                    ln, cd = codes[("ac", tid)][0x00]  # EOB (run of 1)
                    bw.write(ln, cd)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
