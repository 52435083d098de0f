"""Pure-stdlib baseline JPEG codec (operators/jpeg_codec.py).

The oracled query only exercises DC-only flat blocks (that is what
makes the lossy transform SQL-predictable); these tests cover the
GENERAL decoder paths — AC run/size Huffman coding, ZRL runs, byte
stuffing, multi-block DC prediction — against an independent NumPy
cosine-matrix IDCT, plus the honest-refusal errors.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from git_etl_spark.operators.jpeg_codec import (
    QTAB_ZZ,
    ZIGZAG,
    decode_jpeg_gray,
    encode_jpeg_gray_coeffs,
)
from git_etl_spark.operators.multimodal import encode_jpeg_payload, jpeg_features

# independent reference IDCT: cosine basis matrix multiply (not the
# codec's separable loop), T.81 A.3.3 convention
_C = np.array(
    [[np.cos((2 * x + 1) * u * np.pi / 16) for u in range(8)] for x in range(8)]
) * np.array([1 / np.sqrt(2)] + [1.0] * 7)


def _np_idct(coef_natural: list[int]) -> np.ndarray:
    F_ = np.array(coef_natural, dtype=float).reshape(8, 8)
    s = _C @ F_ @ _C.T / 4 + 128
    return np.clip(np.floor(s + 0.5), 0, 255).astype(int)


def _dequant_natural(blk_natural: list[int]) -> list[int]:
    deq = [0] * 64
    for k in range(64):
        deq[ZIGZAG[k]] = blk_natural[ZIGZAG[k]] * QTAB_ZZ[k]
    return deq


def test_flat_block_roundtrip_lossless():
    """DC quantization step 8 == the IDCT's 1/8 DC gain: blockwise-
    constant images survive the full encode→decode bit-exactly."""
    rng = random.Random(7)
    for _ in range(25):
        doc_id = rng.randrange(10**6)
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(40)))
        f = jpeg_features(encode_jpeg_payload(doc_id, body))
        wb, hb = doc_id % 4 + 2, doc_id % 3 + 2
        vals = [
            body[k] if k < len(body) else (doc_id + 13 * k) % 256
            for k in range(wb * hb)
        ]
        assert f["width"] == wb * 8 and f["height"] == hb * 8
        assert f["n_blocks"] == wb * hb
        assert f["pixel_sum"] == 64 * sum(vals)
        assert f["min_px"] == min(vals) and f["max_px"] == max(vals)
        assert f["blk_weighted"] == sum((k + 1) * v for k, v in enumerate(vals))


def test_general_coefficients_match_numpy_idct():
    """Random sparse AC coefficients through the real entropy layer:
    decoded pixels must equal the independent NumPy IDCT of the same
    dequantized blocks."""
    rng = random.Random(11)
    for _ in range(30):
        wb = rng.randrange(1, 7)
        blocks = []
        for _ in range(wb):
            blk = [0] * 64
            for _ in range(rng.randrange(1, 20)):
                blk[rng.randrange(64)] = rng.randrange(-40, 41)
            blocks.append(blk)
        d = decode_jpeg_gray(encode_jpeg_gray_coeffs(blocks, wb * 8, 8))
        px = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(8, wb * 8)
        for bi, blk in enumerate(blocks):
            ref = _np_idct(_dequant_natural(blk))
            assert (px[:, bi * 8 : (bi + 1) * 8] == ref).all()


def test_zrl_and_high_zigzag_positions():
    """A lone coefficient at zigzag position 63 forces ZRL (16-zero
    run) codes through both encoder and decoder."""
    blk = [0] * 64
    blk[ZIGZAG[63]] = 30
    d = decode_jpeg_gray(encode_jpeg_gray_coeffs([blk], 8, 8))
    ref = _np_idct(_dequant_natural(blk))
    px = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(8, 8)
    assert (px == ref).all()


def test_byte_stuffing_roundtrip():
    """Dense high-amplitude blocks reliably produce 0xFF entropy bytes;
    the stuffed stream must still decode exactly."""
    rng = random.Random(3)
    blocks = []
    for _ in range(16):
        blocks.append([rng.randrange(-100, 101) for _ in range(64)])
    payload = encode_jpeg_gray_coeffs(blocks, 32, 32)
    assert b"\xff\x00" in payload.split(b"\xff\xda")[1]  # stuffing occurred
    d = decode_jpeg_gray(payload)
    px = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(32, 32)
    for bi, blk in enumerate(blocks):
        by, bx = divmod(bi, 4)
        ref = _np_idct(_dequant_natural(blk))
        assert (px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] == ref).all()


def test_dc_prediction_across_blocks():
    """DC DIFF coding: monotonically varying flat blocks (every DIFF
    size category 0-8) reconstruct exactly."""
    vals = [0, 255, 0, 128, 127, 129, 1, 254, 64]
    blocks = [[v - 128] + [0] * 63 for v in vals]
    d = decode_jpeg_gray(encode_jpeg_gray_coeffs(blocks, 8 * len(vals), 8))
    px = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(8, 8 * len(vals))
    for k, v in enumerate(vals):
        assert (px[:, k * 8 : (k + 1) * 8] == v).all()


def test_unsupported_sof_refused():
    """Lossless (SOF3) still refuses loudly; a baseline stream merely
    RELABELED as progressive is malformed (a progressive scan may not
    span DC and AC together) and is diagnosed as such, not decoded."""
    p = bytearray(encode_jpeg_payload(5, b"hello"))
    i = p.find(b"\xff\xc0")
    p[i + 1] = 0xC3  # SOF0 -> SOF3 (lossless)
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(bytes(p))
    p[i + 1] = 0xC2  # SOF0 -> SOF2 with a baseline-shaped scan
    with pytest.raises(ValueError, match="Se = 0"):
        decode_jpeg_gray(bytes(p))


def test_malformed_rejected():
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\x89PNG not a jpeg")
    p = encode_jpeg_payload(5, b"hello")
    with pytest.raises(ValueError):
        decode_jpeg_gray(p[:-2])  # EOI stripped


def test_decode_image_routes_jpeg():
    """The generic decode_image dispatcher now really decodes JPEG
    payloads instead of refusing."""
    from git_etl_spark.operators.multimodal import decode_image

    doc_id, body = 9, b"abcdef"
    f = decode_image(encode_jpeg_payload(doc_id, body))
    wb, hb = doc_id % 4 + 2, doc_id % 3 + 2
    vals = [
        body[k] if k < len(body) else (doc_id + 13 * k) % 256
        for k in range(wb * hb)
    ]
    assert f["magic"] == "JPEG"
    assert f["width"] == wb * 8 and f["height"] == hb * 8
    assert f["max_byte"] == max(vals)


def test_fill_bytes_and_tem_marker_tolerated():
    """T.81 B.1.1.2: 0xFF fill bytes may pad any marker, and TEM (0x01)
    is a legal standalone marker — neither is desynchronization."""
    blk = [0] * 64
    blk[0] = 16
    payload = encode_jpeg_gray_coeffs([blk], 8, 8)
    # inject fill bytes + a TEM marker right after SOI
    padded = payload[:2] + b"\xff\xff\xff\x01" + payload[2:]
    d = decode_jpeg_gray(padded)
    assert d["width"] == d["height"] == 8
    assert d == decode_jpeg_gray(payload)


def test_dri_zero_interval_is_noop_nonzero_refused():
    """DRI with interval 0 disables restarts (no-op); a nonzero
    interval declares RSTn markers the entropy decoder doesn't
    implement — honest NotImplementedError, not 'malformed'."""
    blk = [0] * 64
    blk[0] = 16
    payload = encode_jpeg_gray_coeffs([blk], 8, 8)
    dri0 = payload[:2] + b"\xff\xdd\x00\x04\x00\x00" + payload[2:]
    assert decode_jpeg_gray(dri0) == decode_jpeg_gray(payload)
    dri8 = payload[:2] + b"\xff\xdd\x00\x04\x00\x08" + payload[2:]
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg_gray(dri8)


def test_out_of_range_coefficients_diagnosed():
    """Coefficients beyond Annex-K table range raise a diagnosable
    ValueError (not a bare KeyError)."""
    dc_blk = [0] * 64
    dc_blk[0] = 2048  # DC diff size category 12 > 11
    with pytest.raises(ValueError, match="DC coefficient"):
        encode_jpeg_gray_coeffs([dc_blk], 8, 8)
    ac_blk = [0] * 64
    ac_blk[1] = 1024  # AC size category 11 > 10
    with pytest.raises(ValueError, match="AC coefficient"):
        encode_jpeg_gray_coeffs([ac_blk], 8, 8)


# ---------------------------------------------------------------------------
# Progressive (SOF2)
# ---------------------------------------------------------------------------

from git_etl_spark.operators.jpeg_codec import (  # noqa: E402
    DEFAULT_PROGRESSIVE_SCANS,
    encode_jpeg_gray_coeffs_progressive,
)


def _random_blocks(rng, n, dc=60, ac=40, density=0.3):
    blocks = []
    for _ in range(n):
        blk = [0] * 64
        blk[0] = rng.randint(-dc, dc)
        for k in range(1, 64):
            if rng.random() < density:
                blk[k] = rng.randint(-ac, ac) or 3
        blocks.append(blk)
    return blocks


def test_progressive_roundtrip_matches_baseline():
    """Same quantized coefficients through the progressive wire format
    must decode to exactly the baseline decode (identical IDCT input)."""
    rng = random.Random(42)
    for trial in range(6):
        n = rng.randint(1, 12)
        blocks = _random_blocks(rng, n)
        base = decode_jpeg_gray(encode_jpeg_gray_coeffs(blocks, n * 8, 8))
        prog = decode_jpeg_gray(
            encode_jpeg_gray_coeffs_progressive(blocks, n * 8, 8)
        )
        assert prog == base


def test_progressive_eobrun_spans_blocks():
    """Long runs of AC-empty blocks exercise EOBRUN > 1 (the EOBn
    symbols absent from baseline), including runs needing appended
    bits, plus correction-bit reads inside the EOB-run region."""
    rng = random.Random(7)
    blocks = [[0] * 64 for _ in range(40)]
    for i, blk in enumerate(blocks):
        blk[0] = rng.randint(-50, 50)
    # a few sparse AC coefficients so refinement sweeps cross EOB runs
    blocks[0][5] = 12
    blocks[17][63] = -9
    blocks[39][1] = 5
    base = decode_jpeg_gray(encode_jpeg_gray_coeffs(blocks, 40 * 8, 8))
    prog = decode_jpeg_gray(
        encode_jpeg_gray_coeffs_progressive(blocks, 40 * 8, 8)
    )
    assert prog == base


def test_progressive_zrl_and_deep_refinement():
    """Coefficients isolated behind >16 zero-history positions force
    ZRL inside both first and refinement AC scans; magnitudes spanning
    several bit planes force multi-level successive approximation."""
    blocks = [[0] * 64]
    blocks[0][0] = -37
    blocks[0][20] = 21   # |v|>>2 = 5: first scan at Al=2
    blocks[0][40] = -6   # |v|>>2 = 1: newly nonzero at Al=2
    blocks[0][63] = 1    # appears only in the final Al=0 refinement
    scans = [
        (0, 0, 0, 3),
        (1, 63, 0, 2),
        (1, 63, 2, 1),
        (1, 63, 1, 0),
        (0, 0, 3, 2),
        (0, 0, 2, 1),
        (0, 0, 1, 0),
    ]
    base = decode_jpeg_gray(encode_jpeg_gray_coeffs(blocks, 8, 8))
    prog = decode_jpeg_gray(
        encode_jpeg_gray_coeffs_progressive(blocks, 8, 8, scans=scans)
    )
    assert prog == base


def test_progressive_matches_numpy_idct():
    """Progressive decode against the independent cosine-matrix IDCT —
    the same oracle the baseline path is tested against."""
    rng = random.Random(99)
    blocks = _random_blocks(rng, 4)
    d = decode_jpeg_gray(encode_jpeg_gray_coeffs_progressive(blocks, 32, 8))
    from git_etl_spark.operators.jpeg_codec import QTAB_ZZ, ZIGZAG

    C = np.array([1 / np.sqrt(2)] + [1.0] * 7)
    cos = np.array(
        [
            [np.cos((2 * x + 1) * u * np.pi / 16) for u in range(8)]
            for x in range(8)
        ]
    )
    for bi, blk in enumerate(blocks):
        coef = np.zeros(64)
        for k in range(64):
            coef[ZIGZAG[k]] = blk[ZIGZAG[k]] * QTAB_ZZ[k]
        m = coef.reshape(8, 8)
        px = (cos * C) @ m @ (cos * C).T / 4 + 128
        px = np.clip(np.floor(px + 0.5), 0, 255).astype(int)
        got = np.array(
            [
                [d["pixels"][y * 32 + bi * 8 + x] for x in range(8)]
                for y in range(8)
            ]
        )
        assert (got == px).all()


def test_progressive_scan_script_validation():
    blocks = [[0] * 64]
    with pytest.raises(ValueError, match="DC and AC"):
        encode_jpeg_gray_coeffs_progressive(
            blocks, 8, 8, scans=[(0, 63, 0, 0)]
        )
    with pytest.raises(ValueError, match="before the DC first"):
        encode_jpeg_gray_coeffs_progressive(
            blocks, 8, 8, scans=[(1, 63, 0, 0), (0, 0, 0, 0)]
        )
    with pytest.raises(ValueError, match="two first scans"):
        encode_jpeg_gray_coeffs_progressive(
            blocks, 8, 8, scans=[(0, 0, 0, 0), (1, 63, 0, 1), (1, 5, 0, 1)]
        )
    with pytest.raises(ValueError, match="must step"):
        encode_jpeg_gray_coeffs_progressive(
            blocks, 8, 8, scans=[(0, 0, 0, 2), (1, 63, 0, 2), (1, 63, 2, 0)]
        )


def test_decode_image_routes_progressive_jpeg():
    """The multimodal router needs no changes: decode_jpeg_gray
    dispatches SOF2 internally."""
    from git_etl_spark.operators.multimodal import decode_image

    blk = [[0] * 64]
    blk[0][0] = 16
    payload = encode_jpeg_gray_coeffs_progressive(blk, 8, 8)
    d = decode_image(payload)
    assert d["width"] == 8 and d["height"] == 8
