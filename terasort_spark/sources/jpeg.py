"""Baseline JPEG (SOF0) decoder — pure stdlib + numpy, no external
codec.

Scope: 8-bit baseline sequential DCT, any component count and sampling
factors, restart markers, byte stuffing. Output is the full-resolution
LUMA (Y) plane cropped to the frame size — JPEG's Y channel IS the
BT.601 luma every other decoder in ``media.py`` returns, so no chroma
upsampling or color conversion is needed for the grayscale contract.

Progressive (SOF2), arithmetic coding, and 12-bit precision raise
``NotImplementedError`` — they are rare in training corpora and would
triple the surface for no additional architectural coverage.
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# 8x8 type-II DCT basis: IDCT(block) = C.T @ block @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


class _BitReader:
    """MSB-first entropy-segment reader with FF00 byte-unstuffing;
    stops at any non-RST marker."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST handled by caller via sync()
                raise _RestartMarker()
            else:
                raise EOFError("entropy segment ended")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker and reset bit alignment."""
        self.acc = 0
        self.nbits = 0
        assert self.buf[self.pos] == 0xFF and 0xD0 <= self.buf[self.pos + 1] <= 0xD7
        self.pos += 2


class _RestartMarker(Exception):
    pass


def _extend(v: int, size: int) -> int:
    """JPEG signed-magnitude extension (F.12)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class _Huffman:
    def __init__(self, bits: list[int], vals: bytes):
        # canonical codes in BITS order (Annex C)
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                k += 1
                code += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def decode_jpeg_luma(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG and return the float64 Y (luma) plane,
    (H, W), values clamped to [0, 255]."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int32)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = seg[p + 17 : p + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huffman(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(f"non-baseline JPEG (SOF{marker & 15})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cid, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cid] = (tables >> 4, tables & 15)
            return _decode_scan(
                payload, pos + seg_len, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seg_len
    raise ValueError("JPEG contains no scan")


def _decode_scan(buf, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * h_max))
    mcus_y = -(-frame["h"] // (8 * v_max))
    y_comp = comps[0]
    y_plane = np.zeros(
        (mcus_y * v_max * 8, mcus_x * h_max * 8), dtype=np.float64
    )
    br = _BitReader(buf, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for c in comps:
                dc_t, ac_t = scan[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            block = _decode_block(
                                br, huff_dc[dc_t], huff_ac[ac_t],
                                qt[c["tq"]], pred, c["id"],
                            )
                        except _RestartMarker as exc:  # pragma: no cover
                            raise ValueError("unexpected restart marker") from exc
                        if c is y_comp:
                            # luma tiles land at full resolution; other
                            # components advance the bitstream only
                            oy = (my * c["v"] + by) * 8
                            ox = (mx * c["h"] + bx) * 8
                            y_plane[oy : oy + 8, ox : ox + 8] = block
    return np.clip(y_plane[: frame["h"], : frame["w"]], 0.0, 255.0)


def _decode_block(br, hdc, hac, q, pred, cid):
    zz = np.zeros(64, dtype=np.int32)
    size = hdc.decode(br)
    diff = _extend(br.receive(size), size)
    pred[cid] += diff
    zz[0] = pred[cid]
    k = 1
    while k < 64:
        rs = hac.decode(br)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        zz[k] = _extend(br.receive(s), s)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[_ZIGZAG] = zz * q
    block = coef.reshape(8, 8)
    return _C.T @ block @ _C + 128.0
