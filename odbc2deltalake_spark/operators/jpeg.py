"""Baseline JPEG (ITU-T T.81, public spec) codec — stdlib-only.

JPEG is the most common scraped image format; a 100 TB multimodal
pipeline decodes it inside the Arrow-batched kernels multimodal_ops
already runs (one mapInPandas pass, no shuffle). The container has no
image libraries, so this is a from-scratch baseline-sequential
implementation: marker parse, DQT/DHT tables, Huffman entropy decode
with byte-stuffing, dequant + dezigzag, 8x8 IDCT, YCbCr->RGB.

Decode scope (everything else is a LOUD ValueError — never a silently
wrong image, same contract as operators/png.py):

- baseline sequential DCT (SOF0), 8-bit sample precision
- grayscale (1 component) or YCbCr with sampling factors up to 2x2 —
  4:4:4, 4:2:2 and 4:2:0 (the dominant scraped layout); chroma
  upsampling is NEAREST-NEIGHBOR (a legitimate decoder choice, exact
  for the flat-block fixtures); 3-component output converts to RGB
- restart intervals (DRI / RSTn: byte-align, consume marker, reset DC
  predictors — r13)
- Huffman coding (DHT, both table classes), 8-bit DQT entries
- progressive (SOF2), arithmetic (SOF9+), 12-bit, and sampling factors
  above 2 are refused by name

The encoder half writes COEFFICIENT-EXACT baseline streams
(`encode_jpeg_coeffs`: caller supplies already-quantized coefficient
blocks; unit quant tables by default). `encode_jpeg_flatblocks` builds
on it: an image whose 8x8 blocks are each a flat value v has a forward
DCT of exactly DC = 8*(v-128) and zero AC, so with unit quant tables
the round trip is EXACTLY lossless — the property that lets
mm_jpeg_pixel_stats hash against a pure-SQL oracle while the decode
side still runs the full Huffman+IDCT path. The YCbCr->RGB convert
uses the standard CCIR 601 constants with floor(x + 0.5) rounding so an
independent SQL engine reproduces it bit-for-bit.

Parity note: the reference repo has no image codecs — this module is
part of the training-data-pipeline surface the build brief adds on top
of the reference's operator set (like operators/png.py, r11-r12).
"""

from __future__ import annotations

import math

# JPEG zig-zag order: ZIGZAG[i] = raster index of the i-th coefficient
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Encoder Huffman tables — CUSTOM canonical tables (legal JPEG: tables
# travel in DHT), chosen so no code is all-ones and the layout is
# trivially auditable instead of transcribing the spec's Annex K lists:
#   DC: the 12 magnitude categories, every code 4 bits (codes 0..11)
#   AC: EOB, ZRL and every (run 0..15, size 1..10) symbol, every code
#       8 bits (162 symbols -> codes 0..161)
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_ENC_AC_BITS = [0] * 7 + [len(_ENC_AC_VALS)] + [0] * 8


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical-code procedure."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-bits padding per spec
        return bytes(self.buf)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dc_category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def encode_jpeg_coeffs(
    coeffs: list[list[list[int]]],
    width: int,
    height: int,
    sampling: list[tuple[int, int]] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG from already-quantized coefficients with UNIT quant
    tables. ``coeffs[comp][block][64]``: per component, raster-ordered
    8x8 blocks over THAT COMPONENT'S block grid (``mcux*h_i`` by
    ``mcuy*v_i``), each 64 RASTER-ordered integer coefficients.
    1 component = grayscale, 3 = YCbCr. ``sampling`` gives (h_i, v_i)
    per component (default all 1x1 — 4:4:4); [(2,2),(1,1),(1,1)] is
    4:2:0. ``restart_interval`` > 0 emits DRI + RSTn markers every that
    many MCUs (DC predictors reset — r13)."""
    ncomp = len(coeffs)
    if ncomp not in (1, 3):
        raise ValueError("1 (grayscale) or 3 (YCbCr) components only")
    if width <= 0 or height <= 0:
        raise ValueError("zero-area image")
    sampling = sampling or [(1, 1)] * ncomp
    if len(sampling) != ncomp or any(
        not (1 <= hh <= 2 and 1 <= vv <= 2) for hh, vv in sampling
    ):
        raise ValueError("sampling factors must be 1 or 2 per component")
    hmax = max(hh for hh, _ in sampling)
    vmax = max(vv for _, vv in sampling)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c, (hh, vv) in zip(coeffs, sampling):
        if len(c) != mcux * hh * mcuy * vv:
            raise ValueError("coefficient block count does not match dims")

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT id0, all-ones
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([ncomp])
    for i, (hh, vv) in enumerate(sampling):
        sof += bytes([i + 1, (hh << 4) | vv, 0])  # id, sampling, quant 0
    out += _seg(0xC0, sof)  # SOF0
    out += _seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])  # Ss, Se, AhAl
    out += _seg(0xDA, sos)

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    w = _BitWriter()
    pred = [0] * ncomp
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            out += w.flush()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            w = _BitWriter()
            pred = [0] * ncomp
        my, mx = divmod(m, mcux)
        for c in range(ncomp):
            hh, vv = sampling[c]
            cbw = mcux * hh
            for dv in range(vv):
                for dh in range(hh):
                    b = (my * vv + dv) * cbw + (mx * hh + dh)
                    _encode_block(
                        w, coeffs[c][b], pred, c, dc_codes, ac_codes
                    )
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_block(w, blk, pred, c, dc_codes, ac_codes):
    diff = blk[0] - pred[c]
    pred[c] = blk[0]
    t = _dc_category(diff)
    if t > 11:
        raise ValueError("DC difference out of baseline range")
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    # AC: zig-zag scan with (run, size) symbols, ZRL, EOB
    zz = [blk[ZIGZAG[i]] for i in range(1, 64)]
    last = 63
    while last and zz[last - 1] == 0:
        last -= 1
    run = 0
    for v in zz[:last]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            w.write(code, ln)
            run -= 16
        size = _dc_category(v)
        if size > 10:
            raise ValueError("AC coefficient out of encoder range")
        code, ln = ac_codes[(run << 4) | size]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)


def encode_jpeg_flatblocks(
    blocks: list[list[list[int]]],
    width: int,
    height: int,
    sampling: list[tuple[int, int]] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """JPEG whose 8x8 blocks are each one flat sample value — the
    EXACTLY-lossless fixture shape (flat block -> DC-only DCT, integer
    DC = 8*(v-128), unit quant). ``blocks[comp][by][bx]`` holds the
    flat value of each block over THAT COMPONENT'S block grid
    (``mcux*h_i`` wide by ``mcuy*v_i`` tall); 1 component = grayscale,
    3 = Y/Cb/Cr. 4:2:0 = ``sampling=[(2,2),(1,1),(1,1)]`` with chroma
    grids one block per 16x16 macroblock."""
    ncomp = len(blocks)
    sampling = sampling or [(1, 1)] * ncomp
    hmax = max(hh for hh, _ in sampling)
    vmax = max(vv for _, vv in sampling)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    coeffs = []
    for comp, (hh, vv) in zip(blocks, sampling):
        cbw, cbh = mcux * hh, mcuy * vv
        if len(comp) != cbh or any(len(r) != cbw for r in comp):
            raise ValueError("block grid does not match dims")
        cblocks = []
        for by in range(cbh):
            for bx in range(cbw):
                v = comp[by][bx]
                if not 0 <= v <= 255:
                    raise ValueError("sample out of range")
                blk = [0] * 64
                blk[0] = 8 * (v - 128)
                cblocks.append(blk)
        coeffs.append(cblocks)
    return encode_jpeg_coeffs(
        coeffs, width, height, sampling=sampling,
        restart_interval=restart_interval,
    )


# --------------------------------------------------------------- decode --


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 byte-unstuffing; stops at
    any real marker (0xFF followed by non-zero)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy data")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated entropy data")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError("marker inside entropy data")
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker (r13): padding bits are
        discarded, the two marker bytes eaten; anything else is loud."""
        self.n = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated entropy data at restart")
        if self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected RSTn marker")
        self.pos += 2


def _receive_extend(r: _BitReader, t: int) -> int:
    if t == 0:
        return 0
    v = r.bits(t)
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


_IDCT_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_IDCT_C = [1 / math.sqrt(2)] + [1.0] * 7


def _idct_block(coef: list[float]) -> list[int]:
    """8x8 inverse DCT + level shift + clamp (raster in, raster out).
    DC-only blocks (the overwhelmingly common flat-fixture case and any
    smooth region) take the exact integer fast path."""
    if not any(coef[1:]):
        v = coef[0] / 8 + 128
        p = min(255, max(0, math.floor(v + 0.5)))
        return [p] * 64
    out = []
    # separable: rows then columns
    tmp = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _IDCT_C[u] * coef[y * 8 + u] * _IDCT_COS[x][u]
            tmp[y][x] = s / 2
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                s += _IDCT_C[v] * tmp[v][x] * _IDCT_COS[y][v]
            p = s / 2 + 128
            out.append(min(255, max(0, math.floor(p + 0.5))))
    return out


def _ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """CCIR 601 with floor(x+0.5) — mirrored verbatim by the SQL oracle."""
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return (
        min(255, max(0, math.floor(r + 0.5))),
        min(255, max(0, math.floor(g + 0.5))),
        min(255, max(0, math.floor(b + 0.5))),
    )


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """JPEG bytes -> (width, height, channels, raw row-major pixels).
    Baseline sequential 8-bit grayscale / YCbCr with sampling factors up
    to 2x2 — 4:4:4, 4:2:2 and 4:2:0 (output RGB) — plus DRI/RSTn restart
    intervals; loud ValueError on anything else (progressive,
    arithmetic, 12-bit) — never a silently wrong image."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, list[int]] = {}
    hts: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    ri = 0
    while True:
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG (no SOS)")
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        # the spec allows optional 0xFF fill bytes before any marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            raise ValueError("EOI before image data")
        length = int.from_bytes(data[pos : pos + 2], "big")
        seg = data[pos + 2 : pos + length]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qts[tq] = list(seg[i + 1 : i + 65])
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"unsupported precision {prec} (8-bit only)")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                hh, vv = samp >> 4, samp & 0x0F
                if not (1 <= hh <= 2 and 1 <= vv <= 2):
                    raise ValueError(
                        f"sampling factor {hh}x{vv} unsupported (max 2x2)"
                    )
                comps.append((cid, hh, vv, tq))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = "progressive" if marker == 0xC2 else (
                "arithmetic-coded" if marker >= 0xC9 else "extended")
            raise ValueError(f"{kind} JPEG unsupported (baseline SOF0 only)")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nval = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nval])
                codes = _canonical_codes(bits, vals)
                hts[(tc, th)] = {
                    (ln, code): sym for sym, (code, ln) in codes.items()
                }
                i += 17 + nval
        elif marker == 0xDD:  # DRI
            ri = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            pos += length
            return _decode_scan(data, pos, frame, scan, qts, hts, ri)
        pos += length


def _decode_scan(data, pos, frame, scan, qts, hts, ri=0):
    w, h, comps = frame
    ncomp = len(comps)
    if len(scan) != ncomp:
        raise ValueError("partial scans unsupported (single-scan baseline)")
    # align scan order to frame components
    order = []
    for cs, td, ta in scan:
        match = next(
            (i for i, (cid, *_rest) in enumerate(comps) if cid == cs), None
        )
        if match is None:
            raise ValueError("scan references unknown component")
        order.append((match, td, ta))
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component block-grid geometry
    geo = [(mcux * c[1], mcuy * c[2]) for c in comps]
    r = _BitReader(data, pos)
    pred = [0] * ncomp
    planes = [[0] * (gw * gh * 64) for gw, gh in geo]
    for m in range(mcux * mcuy):
        if ri and m and m % ri == 0:
            r.restart()
            pred = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci, td, ta in order:
            dc_t = hts.get((0, td))
            ac_t = hts.get((1, ta))
            if dc_t is None or ac_t is None:
                raise ValueError("missing Huffman table")
            q = qts.get(comps[ci][3])
            if q is None:
                raise ValueError("missing quant table")
            hh, vv = comps[ci][1], comps[ci][2]
            cbw = geo[ci][0]
            for dv in range(vv):
                for dh in range(hh):
                    zz = [0] * 64
                    t = _huff_decode(r, dc_t)
                    pred[ci] += _receive_extend(r, t)
                    zz[0] = pred[ci] * q[0]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(r, ac_t)
                        run, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _receive_extend(r, size) * q[k]
                        k += 1
                    coef = [0.0] * 64
                    for i in range(64):
                        coef[ZIGZAG[i]] = zz[i]
                    px = _idct_block(coef)
                    b = (my * vv + dv) * cbw + (mx * hh + dh)
                    base = b * 64
                    plane = planes[ci]
                    for i in range(64):
                        plane[base + i] = px[i]
    # assemble blocks -> raster, crop to (w, h); subsampled components
    # upsample by nearest neighbor (sx = x*h_i//hmax), exact for the
    # flat-block fixtures and a legitimate decoder choice elsewhere
    def sample(ci: int, x: int, y: int) -> int:
        hh, vv = comps[ci][1], comps[ci][2]
        sx = x * hh // hmax
        sy = y * vv // vmax
        cbw = geo[ci][0]
        return planes[ci][
            ((sy >> 3) * cbw + (sx >> 3)) * 64 + (sy & 7) * 8 + (sx & 7)
        ]

    out = bytearray()
    for y in range(h):
        for x in range(w):
            if ncomp == 1:
                out.append(sample(0, x, y))
            else:
                out += bytes(
                    _ycbcr_to_rgb(
                        sample(0, x, y), sample(1, x, y), sample(2, x, y)
                    )
                )
    return w, h, (3 if ncomp == 3 else 1), bytes(out)
