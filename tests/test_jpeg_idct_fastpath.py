"""r16: the DC-only IDCT fast path must be bit-identical to the general
separable loop (kept VERBATIM below as the reference — the
equivalence-proof pattern of tests/test_pca_moment_pass.py).

The fast path fires when every AC coefficient is zero. Exactness
argument the test checks empirically: in the general loop every AC
term is an exact IEEE ±0.0 product, COS[x][0] = cos(0) = 1.0 exactly,
and adding ±0.0 to a float never changes it — so the two sums reduce
to s = C0·(C0·dc) with the same multiplication order the fast path
uses."""

from __future__ import annotations

import math
import random

from git_etl_spark.operators.jpeg_codec import _IDCT_C, _IDCT_COS, _idct_2d


def _idct_2d_general(coef):
    """The pre-r16 general path, verbatim (jpeg_codec.py @ r15 tag)."""
    tmp = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        row = coef[v * 8 : v * 8 + 8]
        for x in range(8):
            tmp[v][x] = sum(
                _IDCT_C[u] * row[u] * _IDCT_COS[x][u] for u in range(8)
            )
    out = [0] * 64
    for x in range(8):
        for y in range(8):
            s = sum(_IDCT_C[v] * tmp[v][y] * _IDCT_COS[x][v] for v in range(8))
            val = int(math.floor(s / 4 + 128.5))
            out[x * 8 + y] = 0 if val < 0 else (255 if val > 255 else val)
    return out


def test_dc_only_fastpath_bit_identical():
    """Every DC-only block — including clamp boundaries, negative DC,
    zero, and huge magnitudes — decodes identically via both paths."""
    dcs = list(range(-1200, 1201, 7)) + [
        -1024, -1, 0, 1, 8, 1016, 1017, 1023, 1024, -1017, 2**20, -(2**20)
    ]
    for dc in dcs:
        coef = [dc] + [0] * 63
        assert _idct_2d(coef) == _idct_2d_general(coef), dc


def test_general_blocks_unchanged():
    """Blocks with ANY nonzero AC must take the general path and match
    the verbatim reference (i.e. the fast path cannot misfire)."""
    rng = random.Random(0xD1C7)
    for _ in range(50):
        coef = [rng.randrange(-512, 513) for _ in range(64)]
        # force at least one nonzero AC
        coef[rng.randrange(1, 64)] = rng.randrange(1, 100)
        assert _idct_2d(coef) == _idct_2d_general(coef)
    # adversarial: a single tiny AC in the last slot
    coef = [100] + [0] * 62 + [1]
    assert _idct_2d(coef) == _idct_2d_general(coef)
