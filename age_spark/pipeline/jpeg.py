"""Pure-Python baseline JPEG decoder (ITU-T T.81 sequential DCT, the
format the reference's multimodal fixtures would carry).  Implements the
published decode pipeline: marker parse -> huffman entropy decode ->
dequantize -> zigzag -> 2-D IDCT (numpy, separable 8x8 basis) -> chroma
upsample -> YCbCr->RGB.  Supported: SOF0 baseline, 8-bit, 1 or 3
components, any sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0),
restart markers.  Progressive (SOF2), arithmetic coding, and 12-bit
precision raise ``ValueError`` — disclosed bounds.

No third-party imaging library is involved; numpy only for the IDCT
matrix products.  Used by pipeline/multimodal.py:decode_image inside the
Arrow-batched decode kernel.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# separable 8-point IDCT basis: B[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_BASIS = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 ** 0.5) if _u == 0 else 1.0
    for _x in range(8):
        _BASIS[_u, _x] = (_c / 2.0) * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    """2-D type-III DCT of an 8x8 coefficient block (T.81 A.3.3)."""
    return _BASIS.T @ block @ _BASIS


class _HuffTable:
    """Canonical huffman table from a DHT segment (T.81 C.2): decode via
    incremental (code, length) walk — tables are tiny, lookup dicts are
    plenty fast for test-scale images."""

    def __init__(self, counts: List[int], symbols: bytes):
        self.lookup: Dict[Tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-coded segment reader with 0xFF00 byte-stuffing removal and
    restart-marker awareness (T.81 F.1.2.3)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0  # pad past EOI
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2  # stuffed FF
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: consumed by reset()
                else:
                    break  # EOI / next segment: pad
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8
        if self.nbits <= 24:
            # marker reached: pad with 1-bits per spec (decoder stops at EOB)
            while self.nbits <= 24:
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG entropy stream")

    def reset(self):
        """Consume a restart marker and realign to a byte boundary."""
        self.bitbuf = 0
        self.nbits = 0
        # scan forward to the RSTn marker bytes
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _extend(v: int, t: int) -> int:
    """DIFF/coefficient sign extension (T.81 F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_baseline_jpeg(data: bytes) -> Tuple[int, int, bytes]:
    """Decode a baseline JPEG to (width, height, interleaved RGB bytes)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG signature (no SOI)")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, _HuffTable] = {}
    huff_ac: Dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (w, h, components)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                tbl = np.zeros(64)
                for i in range(64):
                    tbl[ZIGZAG[i]] = seg[p + i]
                qt[tq] = tbl.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                syms = seg[p + 17 : p + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(counts, syms)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"JPEG SOF{marker - 0xC0} not supported — baseline sequential only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            return _decode_scan(
                data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        elif marker == 0xD9:  # EOI
            break
        pos += seglen
    raise ValueError("no JPEG scan found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors beyond 2x2 not supported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
    pred = {c["id"]: 0 for c in comps}
    rd = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rd.reset()
                pred = {c["id"]: 0 for c in comps}
            for cs, td, ta in scan:
                c = by_id[cs]
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        coeffs = np.zeros(64)
                        t = rd.decode(huff_dc[td])
                        diff = _extend(rd.bits(t), t)
                        pred[cs] += diff
                        coeffs[0] = pred[cs]
                        k = 1
                        while k < 64:
                            rs = rd.decode(huff_ac[ta])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            coeffs[ZIGZAG[k]] = _extend(rd.bits(s), s)
                            k += 1
                        block = _idct2(coeffs.reshape(8, 8) * qt[c["tq"]]) + 128.0
                        y0 = (my * c["v"] + bv) * 8
                        x0 = (mx * c["h"] + bh) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # upsample subsampled planes to full resolution, crop to (h, w)
    full = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        rgb = np.stack([y, y, y], axis=-1)
    elif len(full) == 3:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255)
    else:
        raise ValueError(f"{len(full)}-component JPEG not supported")
    return w, h, np.rint(rgb).astype(np.uint8).tobytes()
