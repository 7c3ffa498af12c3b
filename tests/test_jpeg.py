"""Baseline-JPEG decoder tests (age_spark/pipeline/jpeg.py).

Two independent checks:
  1. a hand-assembled single-block grayscale JPEG whose decoded value is
     computable on paper (DC-only block: pixel = 128 + 2*DC for an
     all-16 quant table), pinning IDCT scaling and marker parsing;
  2. a self-contained baseline ENCODER (numpy FDCT + fixed-length huffman
     tables) round-tripped through the decoder on gradient and color
     images — 4:4:4 and 4:2:0 — with small quantization tolerance.
     A transposed or mis-scaled IDCT fails the gradient immediately.
"""

import struct

import numpy as np
import pytest

from age_spark.pipeline.jpeg import ZIGZAG, decode_baseline_jpeg


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits
        return bytes(self.out)


def _flat_table(symbols):
    """DHT payload with every symbol at code length 8 (canonical codes
    0..n-1) + the symbol->code map for encoding."""
    counts = [0] * 16
    counts[7] = len(symbols)
    payload = bytes(counts) + bytes(symbols)
    codes = {s: (8, i) for i, s in enumerate(symbols)}
    return payload, codes


_BASIS = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 ** 0.5) if _u == 0 else 1.0
    for _x in range(8):
        _BASIS[_u, _x] = (_c / 2.0) * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _fdct(block):
    return _BASIS @ (block - 128.0) @ _BASIS.T


def _cat(v):
    """Bit category + value bits of a DC diff / AC coefficient."""
    v = int(v)
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_baseline(rgb: np.ndarray, subsample: bool, q: int = 8) -> bytes:
    """Minimal baseline encoder: one quant table (all q), fixed-length
    huffman tables, 3 components, optional 4:2:0."""
    h, w, _ = rgb.shape
    r, g, b = rgb[..., 0].astype(float), rgb[..., 1].astype(float), rgb[..., 2].astype(float)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    hv = (2, 2) if subsample else (1, 1)
    hmax, vmax = hv
    mcux, mcuy = (w + 8 * hmax - 1) // (8 * hmax), (h + 8 * vmax - 1) // (8 * vmax)

    def plane_for(p, sh, sv):
        # pad to MCU grid, box-average subsample
        ph, pw = mcuy * vmax * 8, mcux * hmax * 8
        pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        if sh == hmax and sv == vmax:
            return pad
        return pad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    comps = [
        {"id": 1, "h": hmax, "v": vmax, "plane": plane_for(y, hmax, vmax)},
        {"id": 2, "h": 1, "v": 1, "plane": plane_for(cb, 1, 1)},
        {"id": 3, "h": 1, "v": 1, "plane": plane_for(cr, 1, 1)},
    ]

    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r_ << 4) | s for r_ in range(16) for s in range(1, 11)]
    # 162 symbols at length 8 is canonical-legal (<= 255 8-bit codes)
    dc_payload, dc_codes = _flat_table(dc_syms)
    ac_payload, ac_codes = _flat_table(ac_syms)

    out = bytearray(b"\xff\xd8")
    qtbl = bytes([0]) + bytes(q for _ in range(64))
    out += _seg(0xDB, qtbl)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + dc_payload)  # DC table 0
    out += _seg(0xC4, bytes([0x10]) + ac_payload)  # AC table 0
    sos = bytes([3]) + b"".join(bytes([c["id"], 0x00]) for c in comps) + bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    pred = {c["id"]: 0 for c in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for c in comps:
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        y0, x0 = (my * c["v"] + bv) * 8, (mx * c["h"] + bh) * 8
                        block = c["plane"][y0:y0 + 8, x0:x0 + 8]
                        coef = np.rint(_fdct(block) / q).astype(int)
                        zz = [coef.flat[ZIGZAG[i]] for i in range(64)]
                        diff = zz[0] - pred[c["id"]]
                        pred[c["id"]] = zz[0]
                        t, bits = _cat(diff)
                        ln, code = dc_codes[t]
                        bw.write(code, ln)
                        if t:
                            bw.write(bits, t)
                        run = 0
                        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
                        for i in range(1, last_nz + 1):
                            if zz[i] == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = ac_codes[0xF0]
                                bw.write(code, ln)
                                run -= 16
                            t, bits = _cat(zz[i])
                            ln, code = ac_codes[(run << 4) | t]
                            bw.write(code, ln)
                            bw.write(bits, t)
                            run = 0
                        if last_nz < 63:
                            ln, code = ac_codes[0x00]
                            bw.write(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_dc_only_grayscale_block():
    """Hand-assembled 8x8 grayscale JPEG: quant all 16, single DC
    coefficient c=5 -> every pixel is 128 + 2*16*5/16... exactly
    128 + 5*16/8 = 138 (IDCT of a DC-only block is DC*q/8)."""
    dc_payload, dc_codes = _flat_table(list(range(12)))
    ac_payload, ac_codes = _flat_table([0x00])
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(16 for _ in range(64)))
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + dc_payload)
    out += _seg(0xC4, bytes([0x10]) + ac_payload)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    t, bits = _cat(5)  # DC diff = 5
    ln, code = dc_codes[t]
    bw.write(code, ln)
    bw.write(bits, t)
    ln, code = ac_codes[0x00]  # EOB
    bw.write(code, ln)
    out += bw.flush() + b"\xff\xd9"

    w, h, rgb = decode_baseline_jpeg(bytes(out))
    assert (w, h) == (8, 8)
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(8, 8, 3)
    assert np.all(px == 138), px[0, 0]


@pytest.mark.parametrize("subsample", [False, True])
def test_round_trip_gradient(subsample):
    """Horizontal gradient: catches transposed IDCT / swapped MCU axes."""
    h, w = 16, 24
    x = np.tile(np.arange(w) * 10 % 256, (h, 1)).astype(np.uint8)
    img = np.stack([x, x, x], axis=-1)
    data = encode_baseline(img, subsample=subsample, q=4)
    dw, dh, rgb = decode_baseline_jpeg(data)
    assert (dw, dh) == (w, h)
    got = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(int)
    err = np.abs(got - img.astype(int))
    assert err.max() <= 14, err.max()
    assert err.mean() <= 4.0, err.mean()


def test_round_trip_color_420():
    """Red/blue split image through 4:2:0 — chroma upsampling must place
    the colors on the correct halves."""
    h, w = 16, 16
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :8, 0] = 200  # left red
    img[:, 8:, 2] = 200  # right blue
    data = encode_baseline(img, subsample=True, q=4)
    dw, dh, rgb = decode_baseline_jpeg(data)
    got = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(int)
    left, right = got[:, :4], got[:, 12:]
    assert left[..., 0].mean() > 150 and left[..., 2].mean() < 60
    assert right[..., 2].mean() > 150 and right[..., 0].mean() < 60


def test_hierarchical_raises():
    data = b"\xff\xd8" + _seg(0xC3, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="SOF3"):
        decode_baseline_jpeg(data + b"\xff\xd9")


def test_decode_image_dispatch():
    from age_spark.pipeline.multimodal import decode_image

    h, w = 8, 8
    img = np.full((h, w, 3), 99, dtype=np.uint8)
    data = encode_baseline(img, subsample=False, q=2)
    dw, dh, rgb = decode_image(data)
    assert (dw, dh) == (w, h)
    got = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(got - 99).max() <= 6


# ---------------------------------------------------------- progressive


def _shift_trunc(v: int, al: int) -> int:
    """AC point transform: magnitude truncation (T.81 G.1.2.2)."""
    a = abs(int(v)) >> al
    return a if v >= 0 else -a


def encode_progressive(rgb: np.ndarray, subsample: bool, q: int = 8, al: int = 1) -> bytes:
    """Minimal progressive encoder exercising the full T.81 G.2 surface:
    interleaved DC first scan (Al=al), per-component AC first scans over
    two spectral bands (Al=al), then — when al > 0 — DC refinement and
    per-component AC refinement scans (Ah=al, Al=al-1) with the
    correction-bit emission rules of the spec."""
    h, w, _ = rgb.shape
    r_, g_, b_ = rgb[..., 0].astype(float), rgb[..., 1].astype(float), rgb[..., 2].astype(float)
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
    cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0

    hv = (2, 2) if subsample else (1, 1)
    hmax, vmax = hv
    mcux, mcuy = (w + 8 * hmax - 1) // (8 * hmax), (h + 8 * vmax - 1) // (8 * vmax)

    def plane_for(p, sh, sv):
        ph, pw = mcuy * vmax * 8, mcux * hmax * 8
        pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        if sh == hmax and sv == vmax:
            return pad
        return pad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    comps = [
        {"id": 1, "h": hmax, "v": vmax, "plane": plane_for(y, hmax, vmax)},
        {"id": 2, "h": 1, "v": 1, "plane": plane_for(cb, 1, 1)},
        {"id": 3, "h": 1, "v": 1, "plane": plane_for(cr, 1, 1)},
    ]
    # quantized zigzag coefficients per block, padded MCU grid
    for c in comps:
        pl = c["plane"]
        nby, nbx = pl.shape[0] // 8, pl.shape[1] // 8
        zz = np.zeros((nby, nbx, 64), dtype=int)
        for by in range(nby):
            for bx in range(nbx):
                coefn = np.rint(_fdct(pl[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]) / q).astype(int)
                for i in range(64):
                    zz[by, bx, i] = coefn.flat[ZIGZAG[i]]
        c["zz"] = zz

    dc_payload, dc_codes = _flat_table(list(range(12)))
    ac_syms = [0x00, 0xF0] + [(rr << 4) | s for rr in range(16) for s in range(1, 11)]
    ac_payload, ac_codes = _flat_table(ac_syms)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(q for _ in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += _seg(0xC2, sof)  # SOF2 progressive
    out += _seg(0xC4, bytes([0x00]) + dc_payload)
    out += _seg(0xC4, bytes([0x10]) + ac_payload)

    def sos(scan_comps, ss, se, ah, al_):
        body = bytes([len(scan_comps)])
        for cid in scan_comps:
            body += bytes([cid, 0x00])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al_]))

    def comp_grid(c):
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8

    # ---- scan 1: interleaved DC first (point transform = arithmetic >>)
    out += sos([c["id"] for c in comps], 0, 0, 0, al)
    bw = _BitWriter()
    pred = {c["id"]: 0 for c in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for c in comps:
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        dc = int(c["zz"][my * c["v"] + bv, mx * c["h"] + bh, 0]) >> al
                        t, bits = _cat(dc - pred[c["id"]])
                        pred[c["id"]] = dc
                        ln, code = dc_codes[t]
                        bw.write(code, ln)
                        if t:
                            bw.write(bits, t)
    out += bw.flush()

    # ---- AC first scans: two spectral bands per component
    for c in comps:
        nby, nbx = comp_grid(c)
        for ss, se in ((1, 5), (6, 63)):
            out += sos([c["id"]], ss, se, 0, al)
            bw = _BitWriter()
            for by in range(nby):
                for bx in range(nbx):
                    vals = {k: _shift_trunc(c["zz"][by, bx, k], al) for k in range(ss, se + 1)}
                    run = 0
                    emitted = False
                    for k in range(ss, se + 1):
                        v = vals[k]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = ac_codes[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        t, bits = _cat(v)
                        ln, code = ac_codes[(run << 4) | t]
                        bw.write(code, ln)
                        bw.write(bits, t)
                        run = 0
                        emitted = True
                    if run or not emitted:
                        ln, code = ac_codes[0x00]  # EOB (run of 1 block)
                        bw.write(code, ln)
            out += bw.flush()

    if al > 0:
        # ---- DC refinement: one bit per block, interleaved MCU order
        out += sos([c["id"] for c in comps], 0, 0, al, al - 1)
        bw = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for c in comps:
                    for bv in range(c["v"]):
                        for bh in range(c["h"]):
                            dc = int(c["zz"][my * c["v"] + bv, mx * c["h"] + bh, 0])
                            bw.write((dc >> (al - 1)) & 1, 1)
        out += bw.flush()

        # ---- AC refinement per component over the full band
        for c in comps:
            nby, nbx = comp_grid(c)
            out += sos([c["id"]], 1, 63, al, al - 1)
            bw = _BitWriter()
            for by in range(nby):
                for bx in range(nbx):
                    run = 0
                    pending: list[int] = []
                    any_sym = False
                    for k in range(1, 64):
                        v = int(c["zz"][by, bx, k])
                        t_abs = abs(v) >> (al - 1)
                        hist = abs(v) >> al
                        if hist != 0:
                            pending.append(t_abs & 1)  # correction bit
                        elif t_abs == 1:
                            # newly significant in this pass
                            while run > 15:
                                ln, code = ac_codes[0xF0]
                                bw.write(code, ln)
                                for bit in pending:
                                    bw.write(bit, 1)
                                pending = []
                                run -= 16
                            ln, code = ac_codes[(run << 4) | 1]
                            bw.write(code, ln)
                            bw.write(1 if v > 0 else 0, 1)  # sign
                            for bit in pending:
                                bw.write(bit, 1)
                            pending = []
                            run = 0
                            any_sym = True
                        else:
                            run += 1
                    if run or pending or not any_sym:
                        ln, code = ac_codes[0x00]  # EOB covering block tail
                        bw.write(code, ln)
                        for bit in pending:
                            bw.write(bit, 1)
            out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("subsample", [False, True])
def test_progressive_matches_baseline(subsample):
    """Progressive (DC+AC first with Al=1, then full refinement) must
    reconstruct the EXACT same pixels as a baseline encoding of the same
    quantized coefficients."""
    h, w = 16, 24
    rng = np.random.default_rng(7)
    base = np.tile((np.arange(w) * 9 % 256), (h, 1))
    img = np.stack(
        [base, (base + 60) % 256, rng.integers(0, 256, (h, w))], axis=-1
    ).astype(np.uint8)
    ref = decode_baseline_jpeg(encode_baseline(img, subsample=subsample, q=4))
    got = decode_baseline_jpeg(encode_progressive(img, subsample=subsample, q=4, al=1))
    assert ref[:2] == got[:2]
    a = np.frombuffer(ref[2], dtype=np.uint8).astype(int)
    b = np.frombuffer(got[2], dtype=np.uint8).astype(int)
    assert np.array_equal(a, b), np.abs(a - b).max()


def test_progressive_spectral_only():
    """Spectral selection without successive approximation (Al=0): no
    refinement scans at all — DC + two AC band scans reconstruct exactly."""
    h, w = 16, 16
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :8, 0] = 200
    img[:, 8:, 2] = 200
    ref = decode_baseline_jpeg(encode_baseline(img, subsample=False, q=4))
    got = decode_baseline_jpeg(encode_progressive(img, subsample=False, q=4, al=0))
    assert ref[:2] == got[:2]
    assert ref[2] == got[2]
