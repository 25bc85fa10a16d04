"""Baseline JPEG codec gates (operators/jpeg.py): exactly-lossless
flat-block round trips (the oracle-able fixture shape), the general
Huffman+IDCT path cross-checked against an independent numpy IDCT,
DC-prediction chaining, ZRL runs, block cropping, and loud refusals for
everything outside the baseline-sequential 4:4:4 scope."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from odbc2deltalake_spark.operators.jpeg import (  # noqa: E402
    ZIGZAG,
    decode_jpeg,
    encode_jpeg_coeffs,
    encode_jpeg_flatblocks,
)


def _flat_grid(bw, bh, f):
    return [[f(bx, by) % 256 for bx in range(bw)] for by in range(bh)]


def test_grayscale_flatblock_round_trip_is_exact():
    """Flat 8x8 blocks -> DC-only DCT -> unit quant: byte-exact decode,
    including non-multiple-of-8 dims (the block-crop path)."""
    for w, h in ((8, 8), (16, 8), (13, 10), (4, 4), (25, 17), (9, 8)):
        bw, bh = (w + 7) // 8, (h + 7) // 8
        grid = _flat_grid(bw, bh, lambda bx, by: 37 + 5 * bx + 11 * by)
        w2, h2, c, px = decode_jpeg(encode_jpeg_flatblocks([grid], w, h))
        assert (w2, h2, c) == (w, h, 1)
        assert all(
            px[y * w + x] == grid[y // 8][x // 8]
            for y in range(h)
            for x in range(w)
        ), (w, h)


def test_color_444_flatblock_round_trip_matches_reference_convert():
    """YCbCr 4:4:4 flat blocks decode to RGB through the CCIR 601
    floor(x+0.5) convert — recomputed here independently per pixel."""

    def conv(y_, cb, cr):
        cl = lambda v: min(255, max(0, math.floor(v + 0.5)))  # noqa: E731
        return (
            cl(y_ + 1.402 * (cr - 128)),
            cl(y_ - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
            cl(y_ + 1.772 * (cb - 128)),
        )

    w, h = 19, 11
    bw, bh = (w + 7) // 8, (h + 7) // 8
    gy = _flat_grid(bw, bh, lambda bx, by: 90 + 3 * bx + 7 * by)
    gcb = [[(2 * v) % 256 for v in row] for row in gy]
    gcr = [[(3 * v) % 256 for v in row] for row in gy]
    w2, h2, c, px = decode_jpeg(encode_jpeg_flatblocks([gy, gcb, gcr], w, h))
    assert (w2, h2, c) == (w, h, 3)
    for y in range(h):
        for x in range(w):
            by, bx = y // 8, x // 8
            want = conv(gy[by][bx], gcb[by][bx], gcr[by][bx])
            got = tuple(px[3 * (y * w + x) : 3 * (y * w + x) + 3])
            assert got == want, (x, y, got, want)


def test_general_coefficients_match_independent_numpy_idct():
    """Nonzero ACs (incl. a ZRL-requiring sparse tail and a negative
    large coefficient) decode through the full Huffman+IDCT path to the
    SAME pixels as a from-the-definition numpy IDCT."""
    np = pytest.importorskip("numpy")
    blk = [0] * 64
    blk[0] = 8 * (77 - 128)
    blk[1] = 37
    blk[8] = -21
    blk[16] = -200
    blk[27] = 9
    blk[63] = 5  # forces a >15 zero run -> ZRL symbols
    w2, h2, c, px = decode_jpeg(encode_jpeg_coeffs([[list(blk)]], 8, 8))
    assert (w2, h2, c) == (8, 8, 1)

    C = np.array([1 / np.sqrt(2)] + [1.0] * 7)
    F = np.array(blk, dtype=float).reshape(8, 8)
    spatial = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        C[u] * C[v] * F[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            spatial[y, x] = s / 4 + 128
    want = np.clip(np.floor(spatial + 0.5), 0, 255).astype(int)
    got = np.array(list(px)).reshape(8, 8)
    assert np.array_equal(got, want), (got, want)


def test_dc_prediction_chains_across_blocks_and_components():
    """DC values are differentially coded per component; a multi-block,
    multi-component image with wildly swinging DCs round-trips exactly
    (byte-stuffing included: large categories emit 0xFF-dense runs)."""
    w, h = 32, 16
    bw, bh = 4, 2
    gy = _flat_grid(bw, bh, lambda bx, by: (251 * bx + 13 * by + 5))
    gcb = _flat_grid(bw, bh, lambda bx, by: (7 + 97 * bx * by))
    gcr = _flat_grid(bw, bh, lambda bx, by: (200 - 50 * bx + 30 * by))
    w2, h2, c, px = decode_jpeg(encode_jpeg_flatblocks([gy, gcb, gcr], w, h))
    assert (w2, h2, c) == (w, h, 3)
    # spot-check via the grayscale twin of each plane: re-encode Y alone
    w2, h2, c, py = decode_jpeg(encode_jpeg_flatblocks([gy], w, h))
    assert all(
        py[y * w + x] == gy[y // 8][x // 8]
        for y in range(h)
        for x in range(w)
    )


def test_zigzag_is_an_involution_free_permutation():
    assert sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8


def test_loud_refusals():
    grid = [[100]]
    good = encode_jpeg_flatblocks([grid], 8, 8)

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # progressive: rewrite SOF0 marker to SOF2
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(prog)
    # arithmetic: SOF9
    arith = good.replace(b"\xff\xc0", b"\xff\xc9")
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(arith)
    # sampling factor above 2: patch the sampling byte (0x11 -> 0x33)
    i = good.index(b"\xff\xc0")
    sub = bytearray(good)
    assert sub[i + 2 + 2 + 1 + 4 + 1 + 1] == 0x11
    sub[i + 2 + 2 + 1 + 4 + 1 + 1] = 0x33
    with pytest.raises(ValueError, match="sampling factor"):
        decode_jpeg(bytes(sub))
    # 16-bit quant table: Pq nibble
    j = good.index(b"\xff\xdb")
    q16 = bytearray(good)
    q16[j + 4] = 0x10
    with pytest.raises(ValueError, match="16-bit quant"):
        decode_jpeg(bytes(q16))
    # truncated entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(good[:-4])
    # encoder edges
    with pytest.raises(ValueError, match="zero-area"):
        encode_jpeg_coeffs([[[0] * 64]], 0, 8)
    with pytest.raises(ValueError, match="block grid"):
        encode_jpeg_flatblocks([[[1, 2]]], 8, 8)
    with pytest.raises(ValueError, match="sample out of range"):
        encode_jpeg_flatblocks([[[300]]], 8, 8)
    with pytest.raises(ValueError, match="components"):
        encode_jpeg_coeffs([[[0] * 64]] * 2, 8, 8)


def test_420_subsampled_flat_round_trip_is_exact():
    """4:2:0 (the dominant scraped layout, r13): Y blocks per 8x8,
    chroma per 16x16 macroblock; with flat blocks the nearest-neighbor
    upsample is exact, so every RGB pixel is independently
    recomputable — including non-multiple-of-16 crop dims."""

    def conv(y_, cb, cr):
        cl = lambda v: min(255, max(0, math.floor(v + 0.5)))  # noqa: E731
        return (
            cl(y_ + 1.402 * (cr - 128)),
            cl(y_ - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
            cl(y_ + 1.772 * (cb - 128)),
        )

    for w, h in ((16, 16), (19, 11), (32, 8), (7, 23)):
        mcux, mcuy = (w + 15) // 16, (h + 15) // 16
        gy = _flat_grid(mcux * 2, mcuy * 2, lambda bx, by: 3 * bx + 7 * by + 100)
        gcb = _flat_grid(mcux, mcuy, lambda bx, by: 50 + 9 * bx + 4 * by)
        gcr = _flat_grid(mcux, mcuy, lambda bx, by: 210 - 13 * bx - 6 * by)
        data = encode_jpeg_flatblocks(
            [gy, gcb, gcr], w, h, sampling=[(2, 2), (1, 1), (1, 1)]
        )
        w2, h2, c, px = decode_jpeg(data)
        assert (w2, h2, c) == (w, h, 3)
        for y in range(h):
            for x in range(w):
                want = conv(
                    gy[y // 8][x // 8],
                    gcb[y // 16][x // 16],
                    gcr[y // 16][x // 16],
                )
                got = tuple(px[3 * (y * w + x) : 3 * (y * w + x) + 3])
                assert got == want, (w, h, x, y, got, want)


def test_422_subsampled_flat_round_trip_is_exact():
    """4:2:2 (2x1 luma sampling): chroma halves horizontally only."""
    w, h = 21, 10
    mcux, mcuy = (w + 15) // 16, (h + 7) // 8
    gy = _flat_grid(mcux * 2, mcuy, lambda bx, by: 5 * bx + 17 * by + 60)
    gcb = _flat_grid(mcux, mcuy, lambda bx, by: 128)  # neutral chroma
    gcr = _flat_grid(mcux, mcuy, lambda bx, by: 128)
    data = encode_jpeg_flatblocks(
        [gy, gcb, gcr], w, h, sampling=[(2, 1), (1, 1), (1, 1)]
    )
    w2, h2, c, px = decode_jpeg(data)
    assert (w2, h2, c) == (w, h, 3)
    # neutral chroma -> R=G=B=Y exactly
    for y in range(h):
        for x in range(w):
            yv = gy[y // 8][x // 8]
            got = tuple(px[3 * (y * w + x) : 3 * (y * w + x) + 3])
            assert got == (yv, yv, yv), (x, y, got, yv)


def test_restart_intervals_reset_predictors_and_round_trip():
    """DRI/RSTn (r13): markers land every Ri MCUs, DC predictors reset,
    decode is byte-exact; a stream whose RSTn is corrupted is loud."""
    w, h = 48, 8
    grid = [[(37 + 50 * bx) % 256 for bx in range(6)]]
    data = encode_jpeg_flatblocks([grid], w, h, restart_interval=2)
    assert b"\xff\xdd" in data
    n_rst = sum(data.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
    assert n_rst == 2  # 6 MCUs / Ri=2 -> markers after MCU 2 and 4
    w2, h2, c, px = decode_jpeg(data)
    assert (w2, h2, c) == (w, h, 1)
    assert all(
        px[y * w + x] == grid[0][x // 8] for y in range(h) for x in range(w)
    )
    # corrupt the first RSTn into a non-restart marker byte
    i = data.index(b"\xff\xd0")
    bad = data[:i] + b"\xff\xc8" + data[i + 2 :]
    with pytest.raises(ValueError):
        decode_jpeg(bad)


def test_fill_bytes_before_markers_are_tolerated():
    """T.81 allows any number of 0xFF fill bytes before a marker; real
    encoders emit them for alignment — decode must skip, not misparse."""
    good = encode_jpeg_flatblocks([[[100]]], 8, 8)
    i = good.index(b"\xff\xc0")
    filled = good[:i] + b"\xff\xff\xff" + good[i:]
    w, h, c, px = decode_jpeg(filled)
    assert (w, h, c) == (8, 8, 1)
    assert set(px) == {100}
