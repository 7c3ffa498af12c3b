"""Pure-Python JPEG decoder (ITU-T T.81, the format the reference's
multimodal fixtures would carry).  Implements the published decode
pipeline: marker parse -> huffman entropy decode -> dequantize -> zigzag
-> 2-D IDCT (numpy, separable 8x8 basis) -> chroma upsample -> YCbCr->RGB.
Supported: SOF0 baseline sequential AND SOF2 progressive (spectral
selection + successive approximation, T.81 G.2 — DC first/refine scans,
AC first scans with EOB runs, AC refinement with correction bits), 8-bit,
1 or 3 components, sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0),
restart markers.  Arithmetic coding, hierarchical (SOF3+), and 12-bit
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


def _skip_entropy(data: bytes, pos: int) -> int:
    """Index of the next non-restart, non-stuffed marker after entropy data."""
    while pos + 1 < len(data):
        if (
            data[pos] == 0xFF
            and data[pos + 1] != 0x00
            and not (0xD0 <= data[pos + 1] <= 0xD7)
        ):
            return pos
        pos += 1
    return len(data)


def decode_baseline_jpeg(data: bytes) -> Tuple[int, int, bytes]:
    """Decode a JPEG (baseline SOF0 or progressive SOF2) to
    (width, height, interleaved RGB bytes)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG signature (no SOI)")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, _HuffTable] = {}
    huff_ac: Dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (w, h, components)
    progressive = False
    coef: Dict[int, np.ndarray] = {}  # progressive coefficient accumulators
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (w, h, comps)
            progressive = marker == 0xC2
            if progressive:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                for c in comps:
                    coef[c["id"]] = np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64
                    )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"JPEG SOF{marker - 0xC0} not supported — baseline or progressive only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            if not progressive:
                return _decode_scan(
                    data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            _decode_progressive_scan(
                data, pos + seglen, frame, scan, (ss, se, ahal >> 4, ahal & 0xF),
                huff_dc, huff_ac, restart_interval, coef,
            )
            pos = _skip_entropy(data, pos + seglen)
            continue
        elif marker == 0xD9:  # EOI
            if progressive:
                return _finish_progressive(frame, qt, coef)
            break
        pos += seglen
    if progressive and frame is not None:
        return _finish_progressive(frame, qt, coef)  # truncated: no EOI
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
    return _assemble(frame, planes, hmax, vmax)


def _assemble(frame, planes, hmax, vmax) -> Tuple[int, int, bytes]:
    """Upsample subsampled planes to full resolution, crop to (h, w),
    color-convert (BT.601 YCbCr->RGB, T.871)."""
    w, h, comps = frame
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


def _comp_block_grid(frame, c) -> Tuple[int, int]:
    """Non-interleaved block-grid size of one component (T.81 A.2.2:
    ceil of the ACTUAL component dimensions, not the MCU-padded grid)."""
    w, h, comps = frame
    hmax = max(x["h"] for x in comps)
    vmax = max(x["v"] for x in comps)
    cw = (w * c["h"] + hmax - 1) // hmax
    ch = (h * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8  # (rows, cols)


def _decode_progressive_scan(
    data, pos, frame, scan, band, huff_dc, huff_ac, restart_interval, coef
):
    """One progressive scan (T.81 G.2): DC first/refine (interleaved or
    single-component), AC first with EOB runs, AC refinement with
    correction bits — accumulating into per-component coefficient arrays
    (natural order, successive-approximation bits OR'd in place)."""
    w, h, comps = frame
    ss, se, ah, al = band
    by_id = {c["id"]: c for c in comps}
    rd = _BitReader(data, pos)

    if ss == 0:  # DC scan (refinement or first), possibly interleaved
        if se != 0:
            raise ValueError("progressive scan with Ss=0 must have Se=0")
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        pred = {cs: 0 for cs, _, _ in scan}

        def dc_block(blk, cs, td):
            if ah == 0:
                t = rd.decode(huff_dc[td])
                pred[cs] += _extend(rd.bits(t), t)
                blk[0] = pred[cs] << al
            else:  # refinement: one correction bit per block
                if rd.bit():
                    blk[0] |= 1 << al

        if len(scan) > 1:
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            n = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and n and n % restart_interval == 0:
                        rd.reset()
                        pred = {cs: 0 for cs, _, _ in scan}
                    for cs, td, _ in scan:
                        c = by_id[cs]
                        for bv in range(c["v"]):
                            for bh in range(c["h"]):
                                dc_block(
                                    coef[cs][my * c["v"] + bv, mx * c["h"] + bh],
                                    cs, td,
                                )
                    n += 1
        else:
            cs, td, _ = scan[0]
            nby, nbx = _comp_block_grid(frame, by_id[cs])
            n = 0
            for by in range(nby):
                for bx in range(nbx):
                    if restart_interval and n and n % restart_interval == 0:
                        rd.reset()
                        pred = {cs: 0}
                    dc_block(coef[cs][by, bx], cs, td)
                    n += 1
        return

    # AC scan: single component only (T.81 G.1.1.1.1)
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    cs, _, ta = scan[0]
    table = huff_ac[ta]
    nby, nbx = _comp_block_grid(frame, by_id[cs])
    eobrun = 0
    n = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and n and n % restart_interval == 0:
                rd.reset()
                eobrun = 0
            blk = coef[cs][by, bx]
            if ah == 0:
                eobrun = _ac_first(rd, table, blk, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(rd, table, blk, ss, se, al, eobrun)
            n += 1


def _ac_first(rd, table, blk, ss, se, al, eobrun) -> int:
    """AC spectral-selection first pass (T.81 G.2.2 / libjpeg
    decode_mcu_AC_first shape): RRRRSSSS runs, EOBn batches blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.decode(table)
        r, s = rs >> 4, rs & 0xF
        if s:
            k += r
            if k > se:
                raise ValueError("AC coefficient index overflow in progressive scan")
            blk[ZIGZAG[k]] = _extend(rd.bits(s), s) << al
            k += 1
        else:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += rd.bits(r)
                return eobrun - 1  # current block is part of the run
            k += 16  # ZRL
    return 0


def _ac_refine(rd, table, blk, ss, se, al, eobrun) -> int:
    """AC successive-approximation refinement (T.81 G.2.3 / libjpeg
    decode_mcu_AC_refine shape): newly-nonzero coefficients arrive as
    ±(1<<Al); every already-nonzero coefficient visited emits one
    correction bit."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.decode(table)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s:
                # s must be 1 in a refinement scan (new coefficient)
                val = p1 if rd.bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += rd.bits(r)
                break  # tail of this block handled below
            # advance over r zero-history coefficients, correcting any
            # nonzero-history ones along the way
            while k <= se:
                z = ZIGZAG[k]
                if blk[z] != 0:
                    if rd.bit() and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        # EOB run covers this block: correction bits for the remaining
        # nonzero-history coefficients of the band
        while k <= se:
            z = ZIGZAG[k]
            if blk[z] != 0:
                if rd.bit() and (blk[z] & p1) == 0:
                    blk[z] += p1 if blk[z] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _finish_progressive(frame, qt, coef) -> Tuple[int, int, bytes]:
    """Dequantize + IDCT the accumulated coefficient arrays and assemble."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = {}
    for c in comps:
        arr = coef[c["id"]]
        nby, nbx = arr.shape[0], arr.shape[1]
        plane = np.zeros((nby * 8, nbx * 8))
        q = qt[c["tq"]]
        for by in range(nby):
            for bx in range(nbx):
                block = _idct2(arr[by, bx].reshape(8, 8).astype(float) * q) + 128.0
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
        planes[c["id"]] = plane
    return _assemble(frame, planes, hmax, vmax)
