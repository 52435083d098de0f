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


def test_dri_declared_but_unreached_is_noop():
    """DRI with interval 0 disables restarts (no-op), and a declared
    interval longer than the scan (no RSTn ever due) decodes
    identically — both shapes appear in real files."""
    blk = [0] * 64
    blk[0] = 16
    payload = encode_jpeg_gray_coeffs([blk], 8, 8)
    dri0 = payload[:2] + b"\xff\xdd\x00\x04\x00\x00" + payload[2:]
    assert decode_jpeg_gray(dri0) == decode_jpeg_gray(payload)
    dri8 = payload[:2] + b"\xff\xdd\x00\x04\x00\x08" + payload[2:]
    assert decode_jpeg_gray(dri8) == decode_jpeg_gray(payload)


def test_restart_interval_gray_roundtrip():
    """Restart markers change the stream (RSTn + predictor resets +
    bit-alignment padding) but not the decode: an image encoded with
    DRI=2 must decode byte-identically to the restart-free encoding,
    through the real resync path (predictors reset, modulo-8 RST
    sequence consumed)."""
    rng = random.Random(23)
    blocks = []
    for _ in range(6):  # 6 blocks → restarts after MCUs 2 and 4
        blk = [0] * 64
        blk[0] = rng.randrange(-60, 61)
        for _ in range(rng.randrange(1, 10)):
            blk[rng.randrange(1, 64)] = rng.randrange(-30, 31)
        blocks.append(blk)
    plain = encode_jpeg_gray_coeffs(blocks, 48, 8)
    with_rst = encode_jpeg_gray_coeffs(blocks, 48, 8, restart_interval=2)
    assert with_rst != plain  # RSTn markers really are in the stream
    assert with_rst.count(b"\xff\xd0") >= 1  # RST0 present
    assert decode_jpeg_gray(with_rst) == decode_jpeg_gray(plain)


def test_restart_marker_sequence_enforced():
    """A missing/odd restart marker where the declared interval demands
    one is stream corruption — diagnosed as ValueError, not decoded."""
    blk0 = [0] * 64
    blk0[0] = 16
    blocks = [list(blk0) for _ in range(4)]
    with_rst = encode_jpeg_gray_coeffs(blocks, 32, 8, restart_interval=2)
    i = with_rst.find(b"\xff\xd0")
    assert i > 0
    corrupted = with_rst[:i] + b"\xff\xd3" + with_rst[i + 2 :]  # RST0→RST3
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg_gray(corrupted)


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


# ---------------------------------------------------------------------------
# Baseline color (interleaved YCbCr): subsampling, upsampling, YCbCr→RGB
# ---------------------------------------------------------------------------

from git_etl_spark.operators.jpeg_codec import (  # noqa: E402
    decode_jpeg,
    encode_jpeg_color_coeffs,
)


def _np_color_oracle(blocks_per_comp, samplings, qtabs_zz, width, height):
    """Independent NumPy pipeline: per-block dequant + cosine-matrix
    IDCT into each component's padded plane, replication upsampling,
    and the same JFIF YCbCr→RGB expression — the codec's color path
    must match it byte-for-byte."""
    hmax = max(h for h, _ in samplings)
    vmax = max(v for _, v in samplings)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for (hf, vf), blocks, qt in zip(samplings, blocks_per_comp, qtabs_zz):
        cwb, chb = mcus_x * hf, mcus_y * vf
        plane = np.zeros((chb * 8, cwb * 8), dtype=int)
        for bi, blk in enumerate(blocks):
            deq = [0] * 64
            for k in range(64):
                deq[ZIGZAG[k]] = blk[ZIGZAG[k]] * qt[k]
            by, bx = divmod(bi, cwb)
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _np_idct(deq)
        planes.append(plane)
    ys = np.arange(height)
    xs = np.arange(width)
    up = []
    for (hf, vf), plane in zip(samplings, planes):
        up.append(plane[(ys * vf // vmax)[:, None], (xs * hf // hmax)[None, :]])
    y, cb, cr = up[0].astype(float), up[1] - 128.0, up[2] - 128.0
    r = y + 1.402 * cr
    b = y + 1.772 * cb
    g = (y - 0.299 * r - 0.114 * b) / 0.587
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def _random_color_blocks(rng, samplings, width, height, dc_range=60, n_ac=12):
    hmax = max(h for h, _ in samplings)
    vmax = max(v for _, v in samplings)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    out = []
    for hf, vf in samplings:
        blocks = []
        for _ in range(mcus_x * hf * mcus_y * vf):
            blk = [0] * 64
            blk[0] = rng.randrange(-dc_range, dc_range + 1)
            for _ in range(rng.randrange(1, n_ac)):
                blk[rng.randrange(1, 64)] = rng.randrange(-25, 26)
            blocks.append(blk)
        out.append(blocks)
    return out


def _assert_color_matches_oracle(payload, blocks, samplings, qtabs, w, h):
    d = decode_jpeg(payload)
    assert d["ncomp"] == 3 and d["width"] == w and d["height"] == h
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 3)
    ref = _np_color_oracle(blocks, samplings, qtabs, w, h)
    assert (got == ref).all()


def test_color_444_roundtrip_matches_numpy():
    """4:4:4 (no subsampling): three full-resolution planes through the
    interleaved MCU walk, per-component DC predictors, two DQT ids and
    per-component Huffman table selection."""
    rng = random.Random(31)
    samplings = [(1, 1), (1, 1), (1, 1)]
    w, h = 16, 16
    blocks = _random_color_blocks(rng, samplings, w, h)
    payload = encode_jpeg_color_coeffs(blocks, w, h, samplings)
    qtabs = [QTAB_ZZ, QTAB_ZZ, QTAB_ZZ]
    _assert_color_matches_oracle(payload, blocks, samplings, qtabs, w, h)


def test_color_420_subsampled_and_cropped():
    """4:2:0 with frame dims that don't fill the MCU grid (20×12 in
    16×16 MCUs): 4 luma blocks per MCU, quarter-resolution chroma,
    replication upsampling, right/bottom padding cropped."""
    rng = random.Random(37)
    samplings = [(2, 2), (1, 1), (1, 1)]
    w, h = 20, 12
    blocks = _random_color_blocks(rng, samplings, w, h)
    chroma_q = [q + 2 for q in QTAB_ZZ]  # distinct table under DQT id 1
    payload = encode_jpeg_color_coeffs(
        blocks, w, h, samplings, qtab_chroma_zz=chroma_q
    )
    qtabs = [QTAB_ZZ, chroma_q, chroma_q]
    _assert_color_matches_oracle(payload, blocks, samplings, qtabs, w, h)


def test_color_422_horizontal_subsampling():
    """4:2:2 (horizontal-only chroma subsampling) exercises asymmetric
    h/v factors in both the MCU walk and the upsampler."""
    rng = random.Random(41)
    samplings = [(2, 1), (1, 1), (1, 1)]
    w, h = 24, 8
    blocks = _random_color_blocks(rng, samplings, w, h)
    payload = encode_jpeg_color_coeffs(blocks, w, h, samplings)
    qtabs = [QTAB_ZZ, QTAB_ZZ, QTAB_ZZ]
    _assert_color_matches_oracle(payload, blocks, samplings, qtabs, w, h)


def test_color_restart_interval_roundtrip():
    """Restart markers in an interleaved color scan: all three DC
    predictors reset at each RSTn and the decode equals the
    restart-free stream byte-for-byte."""
    rng = random.Random(43)
    samplings = [(2, 2), (1, 1), (1, 1)]
    w, h = 32, 32  # 2×2 MCUs → RSTn after every MCU at interval 1
    blocks = _random_color_blocks(rng, samplings, w, h)
    plain = encode_jpeg_color_coeffs(blocks, w, h, samplings)
    with_rst = encode_jpeg_color_coeffs(
        blocks, w, h, samplings, restart_interval=1
    )
    assert with_rst.count(b"\xff\xd1") >= 1  # RST1 really present
    dp, dr = decode_jpeg(plain), decode_jpeg(with_rst)
    assert dp == dr
    qtabs = [QTAB_ZZ, QTAB_ZZ, QTAB_ZZ]
    _assert_color_matches_oracle(with_rst, blocks, samplings, qtabs, w, h)


def test_color_neutral_chroma_is_grayscale():
    """All-zero chroma coefficients decode to the 128 level → Cb−128 =
    Cr−128 = 0, so R = G = B = Y: the color transform's neutral axis
    reproduces the luma plane exactly."""
    samplings = [(1, 1), (1, 1), (1, 1)]
    w = h = 8
    yblk = [0] * 64
    yblk[0] = 12
    yblk[9] = 7
    zero = [[0] * 64]
    payload = encode_jpeg_color_coeffs([[yblk], zero, zero], w, h, samplings)
    d = decode_jpeg(payload)
    rgb = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 3)
    assert (rgb[:, :, 0] == rgb[:, :, 1]).all()
    assert (rgb[:, :, 1] == rgb[:, :, 2]).all()
    gray = decode_jpeg(encode_jpeg_gray_coeffs([yblk], w, h))
    luma = np.frombuffer(gray["pixels"], dtype=np.uint8).reshape(h, w)
    assert (rgb[:, :, 0] == luma).all()


def test_color_refusals_and_gray_contract():
    """decode_jpeg_gray keeps its single-plane contract (color streams
    refuse loudly there); partially interleaved scans and CMYK frames
    are honest NotImplementedError in decode_jpeg, and a stream that
    scans only one of three components is diagnosed incomplete."""
    samplings = [(1, 1), (1, 1), (1, 1)]
    blocks = [[[0] * 64] for _ in range(3)]
    payload = encode_jpeg_color_coeffs(blocks, 8, 8, samplings)
    with pytest.raises(NotImplementedError, match="decode_jpeg for color"):
        decode_jpeg_gray(payload)
    # 3-component frame whose SOS names two components: partial
    # interleave — a legal-but-unsupported layout, refused loudly
    i = payload.find(b"\xff\xda")
    assert i > 0
    sos_2comp = payload[:i] + b"\xff\xda\x00\x0a\x02\x01\x00\x02\x11\x00\x3f\x00"
    with pytest.raises(NotImplementedError, match="partially interleaved"):
        decode_jpeg(sos_2comp + payload[i + 12 :])
    # single-component scan alone leaves components 2 and 3 unscanned:
    # the entropy data (interleaved 3-comp) happens to decode as one
    # block, but the frame is incomplete — never silently rendered
    sos_1comp = payload[:i] + b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
    with pytest.raises(ValueError):
        decode_jpeg(sos_1comp + payload[i + 12 :])
    # CMYK-shaped SOF (4 components)
    j = payload.find(b"\xff\xc0")
    seg = bytearray(payload[j : j + 4 + 15])
    seg[9] = 4  # ncomp byte inside SOF0
    with pytest.raises(NotImplementedError, match="4-component"):
        decode_jpeg(payload[:j] + bytes(seg) + payload[j + len(seg) :])


def test_color_separate_scans_roundtrip():
    """The rarer non-interleaved baseline layout — one scan per
    component over its ceil-dims grid, fresh DC predictor each — must
    decode identically to the interleaved stream, including with
    restart intervals and 4:2:0 sub-grids smaller than the padded
    MCU grid."""
    rng = random.Random(73)
    samplings = [(2, 2), (1, 1), (1, 1)]
    w, h = 24, 12  # mcus 2×1; Y sub-grid 3×2 inside padded 4×2
    blocks = _random_color_blocks(rng, samplings, w, h)
    # zero the Y padding blocks (column 3 of the 4-wide padded grid):
    # separate scans never transmit them
    for bi in range(len(blocks[0])):
        by, bx = divmod(bi, 4)
        if bx >= 3:
            blocks[0][bi] = [0] * 64
    inter = encode_jpeg_color_coeffs(blocks, w, h, samplings)
    sep = encode_jpeg_color_coeffs(blocks, w, h, samplings, separate_scans=True)
    assert sep.count(b"\xff\xda") == 3 and inter.count(b"\xff\xda") == 1
    assert decode_jpeg(sep) == decode_jpeg(inter)
    qtabs = [QTAB_ZZ, QTAB_ZZ, QTAB_ZZ]
    _assert_color_matches_oracle(sep, blocks, samplings, qtabs, w, h)
    sep_rst = encode_jpeg_color_coeffs(
        blocks, w, h, samplings, separate_scans=True, restart_interval=2
    )
    assert decode_jpeg(sep_rst) == decode_jpeg(inter)
    # nonzero AC in a padding block is refused loudly
    bad = [list(b) for b in blocks[0]]
    bad[3] = [0] * 64
    bad[3][5] = 7
    with pytest.raises(ValueError, match="padding block"):
        encode_jpeg_color_coeffs(
            [bad, blocks[1], blocks[2]], w, h, samplings, separate_scans=True
        )


def test_decode_image_routes_color_jpeg():
    """The multimodal router decodes baseline color JPEG for real now:
    features computed over interleaved RGB bytes."""
    from git_etl_spark.operators.multimodal import decode_image

    rng = random.Random(47)
    samplings = [(2, 2), (1, 1), (1, 1)]
    w, h = 16, 16
    blocks = _random_color_blocks(rng, samplings, w, h)
    payload = encode_jpeg_color_coeffs(blocks, w, h, samplings)
    f = decode_image(payload)
    ref = _np_color_oracle(
        blocks, samplings, [QTAB_ZZ, QTAB_ZZ, QTAB_ZZ], w, h
    )
    assert f["magic"] == "JPEG"
    assert f["width"] == w and f["height"] == h
    assert f["n_bytes"] == w * h * 3
    assert f["max_byte"] == int(ref.max())
    assert abs(f["mean_byte"] - ref.mean()) < 1e-9


# ---------------------------------------------------------------------------
# Progressive color (SOF2 YCbCr): interleaved DC scans + per-component AC
# ---------------------------------------------------------------------------

from git_etl_spark.operators.jpeg_codec import (  # noqa: E402
    DEFAULT_PROGRESSIVE_COLOR_SCANS,
    encode_jpeg_color_coeffs_progressive,
)


def test_progressive_color_444_matches_baseline_and_numpy():
    """The same coefficients through the progressive color wire layout
    (interleaved DC first/refine, per-component AC bands and
    refinements) must decode identically to the baseline color stream
    — and both match the independent NumPy oracle."""
    rng = random.Random(53)
    samplings = [(1, 1), (1, 1), (1, 1)]
    w, h = 16, 16
    blocks = _random_color_blocks(rng, samplings, w, h)
    base = decode_jpeg(encode_jpeg_color_coeffs(blocks, w, h, samplings))
    prog = decode_jpeg(
        encode_jpeg_color_coeffs_progressive(blocks, w, h, samplings)
    )
    assert prog == base
    qtabs = [QTAB_ZZ, QTAB_ZZ, QTAB_ZZ]
    _assert_color_matches_oracle(
        encode_jpeg_color_coeffs_progressive(blocks, w, h, samplings),
        blocks, samplings, qtabs, w, h,
    )


def test_progressive_color_420_subsampled():
    """4:2:0 progressive: the interleaved DC scan walks 4 luma + 2
    chroma blocks per MCU while AC scans walk each component's own
    grid; distinct chroma quant table under DQT id 1."""
    rng = random.Random(59)
    samplings = [(2, 2), (1, 1), (1, 1)]
    w, h = 32, 16
    blocks = _random_color_blocks(rng, samplings, w, h)
    chroma_q = [q + 3 for q in QTAB_ZZ]
    payload = encode_jpeg_color_coeffs_progressive(
        blocks, w, h, samplings, qtab_chroma_zz=chroma_q
    )
    qtabs = [QTAB_ZZ, chroma_q, chroma_q]
    _assert_color_matches_oracle(payload, blocks, samplings, qtabs, w, h)
    base = decode_jpeg(
        encode_jpeg_color_coeffs(
            blocks, w, h, samplings, qtab_chroma_zz=chroma_q
        )
    )
    assert decode_jpeg(payload) == base


def test_progressive_color_padding_subgrid():
    """An 8×8 4:2:0 frame puts 3 of the 4 luma blocks OUTSIDE the
    non-interleaved grid (ceil(8/8) = 1×1): their DC still travels in
    the interleaved scans, their AC has no scan to travel in — the
    encoder enforces all-zero padding and the decoder leaves the
    untransmitted AC at zero."""
    rng = random.Random(61)
    samplings = [(2, 2), (1, 1), (1, 1)]
    w = h = 8
    y_blocks = []
    for bi in range(4):
        blk = [0] * 64
        if bi == 0:  # only the in-grid block may carry AC
            blk[0] = 20
            blk[9] = 11
            blk[17] = -6
        y_blocks.append(blk)
    cblk = [0] * 64
    cblk[0] = 8
    blocks = [y_blocks, [list(cblk)], [list(cblk)]]
    payload = encode_jpeg_color_coeffs_progressive(blocks, w, h, samplings)
    qtabs = [QTAB_ZZ, QTAB_ZZ, QTAB_ZZ]
    _assert_color_matches_oracle(payload, blocks, samplings, qtabs, w, h)
    # nonzero AC in a padding block is refused loudly
    bad = [list(b) for b in y_blocks]
    bad[3] = list(bad[3])
    bad[3][5] = 9
    with pytest.raises(ValueError, match="padding block"):
        encode_jpeg_color_coeffs_progressive(
            [bad, [list(cblk)], [list(cblk)]], w, h, samplings
        )


def test_progressive_color_scan_script_validation():
    """Interleaved AC scans are a spec violation (Ns = 1 when Ss > 0):
    refused at encode time and diagnosed as malformed at decode time;
    per-component scripts still validate completeness."""
    samplings = [(1, 1), (1, 1), (1, 1)]
    blocks = [[[0] * 64] for _ in range(3)]
    with pytest.raises(ValueError, match="exactly one component"):
        encode_jpeg_color_coeffs_progressive(
            blocks, 8, 8, samplings,
            scans=[((0, 1, 2), 0, 0, 0, 0), ((0, 1), 1, 63, 0, 0)],
        )
    with pytest.raises(ValueError, match="two first scans"):
        encode_jpeg_color_coeffs_progressive(
            blocks, 8, 8, samplings,
            scans=[
                ((0, 1, 2), 0, 0, 0, 0),
                ((0,), 1, 63, 0, 0),
                ((0,), 1, 63, 0, 0),
                ((1,), 1, 63, 0, 0),
                ((2,), 1, 63, 0, 0),
            ],
        )
    # decoder side: a DC-shaped interleaved scan relabeled as AC
    good = encode_jpeg_color_coeffs_progressive(blocks, 8, 8, samplings)
    i = good.find(b"\xff\xda")
    assert i > 0
    seglen = int.from_bytes(good[i + 2 : i + 4], "big")
    seg = bytearray(good[i + 4 : i + 2 + seglen])
    assert seg[0] == 3  # the interleaved DC scan
    seg[7] = 1  # Ss: 0 -> 1 on an Ns=3 scan
    bad = good[: i + 4] + bytes(seg) + good[i + 2 + seglen :]
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(bad)


def test_progressive_gray_unchanged_by_color_refactor():
    """The single-component Annex-G path still matches the baseline
    decode after the multi-component generalization."""
    rng = random.Random(67)
    blocks = []
    for _ in range(4):
        blk = [0] * 64
        blk[0] = rng.randrange(-80, 81)
        for _ in range(rng.randrange(1, 14)):
            blk[rng.randrange(1, 64)] = rng.randrange(-30, 31)
        blocks.append(blk)
    from git_etl_spark.operators.jpeg_codec import (
        encode_jpeg_gray_coeffs_progressive,
    )

    prog = decode_jpeg_gray(encode_jpeg_gray_coeffs_progressive(blocks, 16, 16))
    base = decode_jpeg_gray(encode_jpeg_gray_coeffs(blocks, 16, 16))
    assert prog == base


def test_decode_image_routes_progressive_color_jpeg():
    """decode_image handles the most common real-world JPEG shape —
    progressive color — end to end."""
    from git_etl_spark.operators.multimodal import decode_image

    rng = random.Random(71)
    samplings = [(2, 2), (1, 1), (1, 1)]
    w, h = 16, 16
    blocks = _random_color_blocks(rng, samplings, w, h)
    payload = encode_jpeg_color_coeffs_progressive(blocks, w, h, samplings)
    f = decode_image(payload)
    assert f["magic"] == "JPEG"
    assert f["width"] == w and f["height"] == h
    assert f["n_bytes"] == w * h * 3


def test_16bit_quantization_tables():
    """DQT Pq=1 (16-bit entries — legal with 8-bit samples, T.81
    B.2.4.1): the encoder switches precision automatically when a step
    exceeds one byte, and both decode paths dequantize with the
    big-endian 16-bit values."""
    q16 = [300] + [256 + k for k in range(63)]  # every entry > 255
    blk = [0] * 64
    blk[0] = 2
    blk[1] = -1
    blk[9] = 1
    payload = encode_jpeg_gray_coeffs([blk], 8, 8, qtab_zz=q16)
    # the emitted DQT really is 16-bit: Pq/Tq byte 0x10, 129-byte body
    i = payload.find(b"\xff\xdb")
    seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
    assert seglen == 2 + 1 + 128 and payload[i + 4] == 0x10
    d = decode_jpeg_gray(payload)
    deq = [0] * 64
    for k in range(64):
        deq[ZIGZAG[k]] = blk[ZIGZAG[k]] * q16[k]
    ref = _np_idct(deq)
    px = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(8, 8)
    assert (px == ref).all()
    # color path: 16-bit chroma table alongside an 8-bit luma table
    samplings = [(1, 1), (1, 1), (1, 1)]
    blocks = [[list(blk)], [list(blk)], [list(blk)]]
    cp = encode_jpeg_color_coeffs(
        blocks, 8, 8, samplings, qtab_chroma_zz=q16
    )
    _assert_color_matches_oracle(
        cp, blocks, samplings, [QTAB_ZZ, q16, q16], 8, 8
    )
    # progressive path reads the same 16-bit DQT
    from git_etl_spark.operators.jpeg_codec import (
        encode_jpeg_gray_coeffs_progressive,
    )

    pp = encode_jpeg_gray_coeffs_progressive([blk], 8, 8, qtab_zz=q16)
    assert decode_jpeg_gray(pp) == d
    # out-of-range steps are refused
    with pytest.raises(ValueError, match="1..65535"):
        encode_jpeg_gray_coeffs([blk], 8, 8, qtab_zz=[0] * 64)
