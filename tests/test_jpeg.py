"""Baseline JPEG codec: roundtrip closeness (JPEG is lossy), analytic
exactness where the transform chain is exact (DC-only blocks), and
decoder-only validation on HAND-CRAFTED bitstreams the encoder cannot
produce (4:2:0 subsampling, restart intervals) so decoder correctness
does not depend on the encoder sharing its bugs."""

import struct

import numpy as np
import pytest

from rust_triplets_spark.operators.jpeg import (
    _HT,
    _BitWriter,
    _huff_codes,
    _scale_q,
    _K1,
    _K2,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def test_constant_image_roundtrips_exactly():
    for v in (0, 77, 128, 255):
        px = np.full((16, 24, 3), v, dtype=np.uint8)
        got = decode_jpeg(encode_jpeg(px, 90))
        assert got.shape == px.shape
        assert int(np.max(np.abs(got.astype(int) - int(v)))) <= 1, v


def test_smooth_gradient_close_at_q90():
    yy, xx = np.mgrid[0:32, 0:48]
    px = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(px, 90))
    diff = np.abs(got.astype(int) - px.astype(int))
    assert float(diff.mean()) < 2.0 and int(diff.max()) < 32


def test_odd_dimensions_pad_and_crop():
    px = np.full((13, 19, 3), 200, dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(px, 85))
    assert got.shape == (13, 19, 3)
    assert int(np.max(np.abs(got.astype(int) - 200))) <= 1


def test_noise_survives_high_quality():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(px, 95))
    assert float(np.abs(got.astype(int) - px.astype(int)).mean()) < 8.0


def _marker(m, payload):
    return b"\xff" + bytes([m]) + struct.pack(">H", len(payload) + 2) + payload


def _write_dc_only_block(bw, codes, tid, dc_diff):
    t = dc_diff.bit_length() if dc_diff >= 0 else (-dc_diff).bit_length()
    ln, cd = codes[("dc", tid)][t]
    bw.write(ln, cd)
    if t:
        bw.write(t, dc_diff if dc_diff >= 0 else dc_diff + (1 << t) - 1)
    ln, cd = codes[("ac", tid)][0x00]  # EOB
    bw.write(ln, cd)


def _headers(h, w, sampling, dri=0):
    """Shared header bytes for a hand-crafted 3-component stream."""
    qy, qc = _scale_q(_K1, 90), _scale_q(_K2, 90)
    out = bytearray(b"\xff\xd8")
    for tq, tbl in ((0, qy), (1, qc)):
        out += _marker(0xDB, bytes([tq])
                       + tbl.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes())
    hy, vy = sampling
    out += _marker(0xC0, struct.pack(">BHHB", 8, h, w, 3)
                   + bytes([1, (hy << 4) | vy, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for (kind, tid), (counts, syms) in _HT.items():
        tc = 0 if kind == "dc" else 1
        out += _marker(0xC4, bytes([(tc << 4) | tid]) + bytes(counts) + syms)
    if dri:
        out += _marker(0xDD, struct.pack(">H", dri))
    out += _marker(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return out, qy, qc


def test_handcrafted_420_stream_decodes():
    """A 4:2:0 MCU (4 Y blocks + 1 Cb + 1 Cr, all DC-only) hand-written
    bit by bit; expected pixels computed analytically: a DC-only block
    decodes to dc*q[0,0]/8 + 128 everywhere, and chroma upsamples 2x2."""
    codes = {k: _huff_codes(*v) for k, v in _HT.items()}
    out, qy, qc = _headers(16, 16, (2, 2))
    bw = _BitWriter()
    dcs = [4, -4, 8, -8]  # the four Y blocks' DC DIFFS (cumulative preds)
    for d in dcs:
        _write_dc_only_block(bw, codes, 0, d)
    _write_dc_only_block(bw, codes, 1, 2)   # Cb
    _write_dc_only_block(bw, codes, 1, -3)  # Cr
    bw.flush()
    payload = bytes(out) + bytes(bw.out) + b"\xff\xd9"
    got = decode_jpeg(payload)
    assert got.shape == (16, 16, 3)
    # Y plane: block (by, bx) DC value is the cumulative sum of diffs in
    # scan order (bx fastest): 4, 0, 8, 0
    cum = np.cumsum(dcs)
    yvals = {(0, 0): cum[0], (0, 1): cum[1], (1, 0): cum[2], (1, 1): cum[3]}
    cb = 2 * qc[0, 0] / 8.0
    cr = -3 * qc[0, 0] / 8.0
    for (by, bx), dc in yvals.items():
        y = dc * qy[0, 0] / 8.0 + 128.0
        r = np.clip(round(y + 1.402 * cr), 0, 255)
        g = np.clip(round(y - 0.344136 * cb - 0.714136 * cr), 0, 255)
        b = np.clip(round(y + 1.772 * cb), 0, 255)
        block = got[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
        assert np.all(np.abs(block[..., 0].astype(int) - r) <= 1)
        assert np.all(np.abs(block[..., 1].astype(int) - g) <= 1)
        assert np.all(np.abs(block[..., 2].astype(int) - b) <= 1)


def test_handcrafted_restart_interval_stream():
    """Two 8x8 MCUs with DRI=1: a RST0 marker between them resets the DC
    predictor, so the second block's diff is absolute."""
    codes = {k: _huff_codes(*v) for k, v in _HT.items()}
    out, qy, qc = _headers(8, 16, (1, 1))
    out2, _, _ = _headers(8, 16, (1, 1), dri=1)
    bw = _BitWriter()
    for comp_tid, d in ((0, 6), (1, 0), (1, 0)):
        _write_dc_only_block(bw, codes, comp_tid, d)
    bw.flush()
    first = bytes(bw.out)
    bw2 = _BitWriter()
    for comp_tid, d in ((0, 2), (1, 0), (1, 0)):
        _write_dc_only_block(bw2, codes, comp_tid, d)
    bw2.flush()
    payload = bytes(out2) + first + b"\xff\xd0" + bytes(bw2.out) + b"\xff\xd9"
    got = decode_jpeg(payload)
    y1 = 6 * qy[0, 0] / 8.0 + 128.0
    y2 = 2 * qy[0, 0] / 8.0 + 128.0  # absolute again after restart
    assert np.all(np.abs(got[:, :8, 0].astype(float) - round(y1)) <= 1)
    assert np.all(np.abs(got[:, 8:, 0].astype(float) - round(y2)) <= 1)


def test_arithmetic_and_corrupt_are_loud():
    # SOF9 = arithmetic-coded sequential: still deliberately rejected
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8" + b"\xff\xc9" + struct.pack(">H", 8) + b"\x08\x00\x08\x00\x08\x01")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8" + b"garbage" * 10)
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


def test_builtin_dispatch_and_multimodal_branch(spark):
    """decode_image_builtin routes JPEG; the real multimodal feature
    branch produces (near-)identical features for the same raster shipped
    as PPM and as JPEG q95."""
    from rust_triplets_spark.operators.codecs import encode_ppm
    from rust_triplets_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    from rust_triplets_spark.operators.jpeg import encode_jpeg_progressive

    yy, xx = np.mgrid[0:16, 0:16]
    px = np.stack([yy * 8, xx * 8, (yy + xx) * 4], axis=2).astype(np.uint8)
    rows = [
        (1, "image", None, encode_ppm(px), {}),
        (2, "image", None, encode_jpeg(px, 95), {}),
        (3, "image", None, encode_jpeg_progressive(px, 95), {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: r["feature"]
        for r in extract_features(media, dim=8, use_stub=False, batch_rows=1).collect()
    }
    # luminance histogram over a mod-8 fold is sensitive to ±1 pixel
    # wobble, so compare with a loose L1 budget rather than equality
    l1 = sum(abs(a - b) for a, b in zip(out[1], out[2]))
    assert l1 < 0.6, (out[1], out[2])
    # progressive carries the same coefficients as baseline → identical
    assert out[2] == out[3]


def test_grayscale_frame_with_subsampling_factors_is_noninterleaved():
    """T.81 A.2.2: a one-component scan is NON-interleaved — one data
    unit per MCU in raster order, padded to 8 px — even when the SOF
    declares sampling factors > 1 (jpegtran-grayscaled 4:2:0 sources
    keep h=v=2). Hand-crafted 16x8 gray frame, sampling (2,2), two
    DC-only blocks: interleaved decoding would demand 2x2 data units
    per MCU and fail (or scramble); non-interleaved decodes exactly."""
    codes = {k: _huff_codes(*v) for k, v in _HT.items()}
    qy = _scale_q(_K1, 90)
    out = bytearray(b"\xff\xd8")
    out += _marker(0xDB, bytes([0])
                   + qy.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes())
    out += _marker(0xC0, struct.pack(">BHHB", 8, 16, 8, 1)
                   + bytes([1, 0x22, 0]))  # h=v=2 on the only component
    for (kind, tid), (counts, syms) in _HT.items():
        tc = 0 if kind == "dc" else 1
        out += _marker(0xC4, bytes([(tc << 4) | tid]) + bytes(counts) + syms)
    out += _marker(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    _write_dc_only_block(bw, codes, 0, 6)   # block (0,0): dc=6
    _write_dc_only_block(bw, codes, 0, -2)  # block (1,0): dc=6-2=4
    bw.flush()
    got = decode_jpeg(bytes(out) + bytes(bw.out) + b"\xff\xd9")
    assert got.shape == (16, 8, 3)
    top = round(6 * qy[0, 0] / 8.0 + 128.0)
    bot = round(4 * qy[0, 0] / 8.0 + 128.0)
    assert np.all(np.abs(got[:8, :, 0].astype(int) - top) <= 1)
    assert np.all(np.abs(got[8:, :, 0].astype(int) - bot) <= 1)
    # all three channels replicate the gray plane
    assert np.array_equal(got[..., 0], got[..., 1])
    assert np.array_equal(got[..., 0], got[..., 2])


def test_fill_bytes_before_markers_are_skipped():
    """B.1.1.2: any number of 0xFF pad bytes may precede a marker id.
    Inject fill bytes before every header marker of a valid stream and
    assert the decode is unchanged."""
    px = np.full((8, 8, 3), 90, dtype=np.uint8)
    payload = encode_jpeg(px, 90)
    want = decode_jpeg(payload)
    # rebuild the stream with 0xFF fill bytes injected before each
    # marker in the header section (up to the SOS payload start)
    padded = bytearray(payload[:2])
    pos = 2
    while pos + 4 <= len(payload):
        assert payload[pos] == 0xFF
        marker = payload[pos + 1]
        padded += b"\xff\xff"  # two fill bytes, then the real marker
        padded += payload[pos:pos + 2]
        pos += 2
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        padded += payload[pos:pos + seglen]
        pos += seglen
        if marker == 0xDA:  # entropy data follows — copy verbatim
            padded += payload[pos:]
            break
    got = decode_jpeg(bytes(padded))
    assert np.array_equal(got, want)


def test_progressive_spectral_selection_matches_baseline_exactly():
    """Progressive (SOF2) decode via the spectral-selection test encoder:
    identical quantized coefficients as the baseline encoder, so the
    decoded pixels must match the baseline roundtrip BIT-FOR-BIT (this
    pins interleaved DC scans, non-interleaved AC band scans, EOB codes,
    and the EOI-time reconstruction)."""
    from rust_triplets_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    for shape, q in [((16, 24, 3), 85), ((13, 19, 3), 90), ((8, 8, 3), 95)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(px, q))
        prog = decode_jpeg(encode_jpeg_progressive(px, q))
        assert np.array_equal(base, prog), (shape, q)


def test_progressive_successive_approximation_handcrafted():
    """Hand-crafted 8x24 gray SOF2 stream exercising all four Annex G
    scan kinds: DC first at Al=1, DC refine, AC first at Al=1 with an
    EOB1 run spanning two blocks, AC refine (new ±1 coefficient,
    correction bits, EOB-run correction path). Expected pixels computed
    independently from the final coefficient set."""
    from rust_triplets_spark.operators.jpeg import _idct2

    # custom AC table: Annex K sequential tables carry no EOBn symbols
    # (progressive-only), so build one with EOB0/EOB1/newval/run-3 codes
    ac_counts = [0, 3, 1] + [0] * 13
    ac_syms = bytes([0x00, 0x01, 0x10, 0x31])
    codes = {k: _huff_codes(*v) for k, v in _HT.items()}
    codes[("ac", 0)] = _huff_codes(ac_counts, ac_syms)
    qy = _scale_q(_K1, 90)
    out = bytearray(b"\xff\xd8")
    out += _marker(0xDB, bytes([0])
                   + qy.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes())
    out += _marker(0xC2, struct.pack(">BHHB", 8, 8, 24, 1) + bytes([1, 0x11, 0]))
    counts, syms = _HT[("dc", 0)]
    out += _marker(0xC4, bytes([0x00]) + bytes(counts) + syms)
    out += _marker(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_syms)

    def sos(ss, se, ah, al):
        return _marker(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    # scan A — DC first, Al=1: block1 diff=2 (coef 4), blocks 2,3 diff=0
    out += sos(0, 0, 0, 1)
    bw = _BitWriter()
    ln, cd = codes[("dc", 0)][2]
    bw.write(ln, cd)
    bw.write(2, 2)
    for _ in range(2):
        ln, cd = codes[("dc", 0)][0]
        bw.write(ln, cd)
    bw.flush()
    out += bw.out
    # scan B — DC refine to Al=0: block1 bit 1 (4->5), blocks 2,3 bit 0
    out += sos(0, 0, 1, 0)
    bw = _BitWriter()
    bw.write(1, 1)
    bw.write(1, 0)
    bw.write(1, 0)
    bw.flush()
    out += bw.out
    # scan C — AC first, band 1..63, Al=1:
    #   block1: zz1 = +1 (coef 2), zz5 = -1 (coef -2), EOB
    #   block2: EOB1 with appended bit 0 → run covers blocks 2 AND 3
    out += sos(1, 63, 0, 1)
    bw = _BitWriter()
    ln, cd = codes[("ac", 0)][0x01]
    bw.write(ln, cd)
    bw.write(1, 1)            # +1
    ln, cd = codes[("ac", 0)][0x31]
    bw.write(ln, cd)
    bw.write(1, 0)            # -1
    ln, cd = codes[("ac", 0)][0x00]
    bw.write(ln, cd)          # EOB ends block1
    ln, cd = codes[("ac", 0)][0x10]
    bw.write(ln, cd)          # EOB1...
    bw.write(1, 0)            # ...appended bit 0 → eobrun = 2
    bw.flush()
    out += bw.out
    # scan D — AC refine to Al=0:
    #   block1: new +1 at zz2 (rs 0x01, sign 1), correction bit 1 for zz1
    #   (2→3) read inside the run, EOB, then correction bit 0 for zz5
    #   (stays -2) on the EOB path; blocks 2,3 via EOB1 (no bits — no
    #   nonzero history)
    out += sos(1, 63, 1, 0)
    bw = _BitWriter()
    ln, cd = codes[("ac", 0)][0x01]
    bw.write(ln, cd)
    bw.write(1, 1)            # sign: +1
    bw.write(1, 1)            # correction for zz1: 2 -> 3
    ln, cd = codes[("ac", 0)][0x00]
    bw.write(ln, cd)          # EOB
    bw.write(1, 0)            # correction for zz5 on the EOB path: stays -2
    ln, cd = codes[("ac", 0)][0x10]
    bw.write(ln, cd)          # EOB1...
    bw.write(1, 0)            # ...appended bit 0 → covers blocks 2 and 3
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    assert got.shape == (8, 24, 3)
    # expected: block1 zig-zag coefs {0: 5, 1: 3, 2: 1, 5: -2};
    # blocks 2,3 DC-only with coef 4
    coef = np.zeros(64)
    coef[ZIGZAG[[0, 1, 2, 5]]] = [5, 3, 1, -2]
    blk1 = np.clip(np.round(
        _idct2(coef.reshape(8, 8) * qy) + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(got[:, :8, 0], blk1)
    flat = round(4 * qy[0, 0] / 8.0 + 128.0)
    assert np.all(got[:, 8:, 0].astype(int) == flat)
    assert np.array_equal(got[..., 0], got[..., 1])
    assert np.array_equal(got[..., 0], got[..., 2])
