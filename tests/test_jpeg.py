"""Baseline JPEG decoder tests: an in-test from-scratch encoder (DCT,
quantization, canonical Huffman, byte stuffing, restart markers)
produces real JFIF streams the decoder must reproduce — grayscale,
4:2:0 color, and restart-interval variants."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from terasort_spark.sources.jpeg import _ZIGZAG, _C, decode_jpeg_luma

_DC_SYMS = list(range(12))  # categories 0..11, canonical length 4
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]  # EOB + ZRL + every (run, size<=10): 162 symbols, canonical length 8


def _canonical_codes(symbols, length):
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[symbols[k]] = (ln, code)
            k += 1
            code += 1
        code <<= 1
    return bits, codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value, width):
        for i in range(width - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def pad(self):
        while self.nbits:
            self.put(1, 1)


def _category(v):
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw, block, q, pred, dc_codes, ac_codes):
    coef = _C @ (block - 128.0) @ _C.T
    zz = np.round(coef.ravel()[_ZIGZAG] / q).astype(np.int64)
    diff = int(zz[0]) - pred
    s = _category(diff)
    ln, code = dc_codes[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _category(v)
        ln, code = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_codes[0x00]
        bw.put(code, ln)
    return int(zz[0])


def _encode_jpeg(y, cb=None, cr=None, subsample=False, restart=0):
    """Baseline JFIF encoder: grayscale (y only), 4:4:4 (cb/cr same
    size), or 4:2:0 (subsample=True, cb/cr at half size); flat
    quantization (all ones) so decode error is DCT rounding only."""
    h, w = y.shape
    q = np.ones(64, dtype=np.int64)
    dc_bits, dc_codes = _canonical_codes(_DC_SYMS, 4)
    ac_bits, ac_codes = _canonical_codes(_AC_SYMS, 8)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    comps = [(1, 0x22 if subsample else 0x11, 0)]
    planes = {1: y}
    if cb is not None:
        comps += [(2, 0x11, 0), (3, 0x11, 0)]
        planes[2], planes[3] = cb, cr
    sof = struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps))
    for cid, hv, tq in comps:
        sof += bytes([cid, hv, tq])
    out += b"\xff\xc0" + sof
    for tc, bits, syms in ((0, dc_bits, _DC_SYMS), (1, ac_bits, _AC_SYMS)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(syms), tc << 4)
        out += bytes(bits) + bytes(syms)
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _, _ in comps:
        sos += bytes([cid, 0x00])
    out += b"\xff\xda" + sos + b"\x00\x3f\x00"

    h_max = max(c[1] >> 4 for c in comps)
    v_max = max(c[1] & 15 for c in comps)
    mcus_x = -(-w // (8 * h_max))
    mcus_y = -(-h // (8 * v_max))
    bw = _BitWriter()
    pred = {cid: 0 for cid, _, _ in comps}
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                bw.pad()
                out += bytes(bw.out) + bytes((0xFF, 0xD0 + rst_n % 8))
                bw = _BitWriter()
                rst_n += 1
                pred = {cid: 0 for cid, _, _ in comps}
            mcu_count += 1
            for cid, hv, _ in comps:
                ch, cv = hv >> 4, hv & 15
                plane = planes[cid]
                for by in range(cv):
                    for bx in range(ch):
                        oy, ox = (my * cv + by) * 8, (mx * ch + bx) * 8
                        tile = plane[oy : oy + 8, ox : ox + 8].astype(np.float64)
                        pred[cid] = _encode_block(
                            bw, tile, q, pred[cid], dc_codes, ac_codes
                        )
    bw.pad()
    out += bytes(bw.out) + b"\xff\xd9"
    return bytes(out)


def test_jpeg_grayscale_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 16)).astype(np.float64)
    got = decode_jpeg_luma(_encode_jpeg(img))
    # flat quantization: the only loss is DCT-coefficient rounding
    assert got.shape == img.shape
    assert np.max(np.abs(got - img)) < 5.0

    # constant blocks quantize exactly (DC coefficient is an integer)
    flat = np.full((16, 16), 97.0)
    assert np.allclose(decode_jpeg_luma(_encode_jpeg(flat)), flat, atol=1e-6)


def test_jpeg_420_color_luma():
    """4:2:0 interleave: the decoder must walk 2x2 Y blocks + one Cb +
    one Cr per MCU and reassemble the full-resolution luma plane."""
    rng = np.random.RandomState(5)
    y = rng.randint(0, 256, size=(32, 32)).astype(np.float64)
    cb = rng.randint(0, 256, size=(16, 16)).astype(np.float64)
    cr = rng.randint(0, 256, size=(16, 16)).astype(np.float64)
    got = decode_jpeg_luma(_encode_jpeg(y, cb, cr, subsample=True))
    assert got.shape == y.shape
    assert np.max(np.abs(got - y)) < 5.0


def test_jpeg_restart_markers():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(16, 40)).astype(np.float64)  # 10 MCUs
    got = decode_jpeg_luma(_encode_jpeg(img, restart=3))
    assert np.max(np.abs(got - img)) < 5.0


def test_jpeg_through_spark_pipeline(spark):
    from terasort_spark.sources.media import extract_features_batched

    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, size=(8, 8)).astype(np.float64)
    df = spark.createDataFrame(
        [(1, bytearray(_encode_jpeg(img)), "image/jpeg")],
        "doc_id bigint, payload binary, media_type string",
    )
    got = df.mapInPandas(
        extract_features_batched,
        schema=(
            "doc_id bigint, media_type string, n_bytes bigint, "
            "sha_8 string, thumb_mean double"
        ),
    ).collect()
    assert got[0]["thumb_mean"] == pytest.approx(float(img.mean()), abs=2.0)


def test_jpeg_progressive_raises():
    # minimal SOF2 header -> NotImplementedError, not garbage output
    bad = b"\xff\xd8\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + b"\x01\x11\x00"
    with pytest.raises(NotImplementedError):
        decode_jpeg_luma(bad)
