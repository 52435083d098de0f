"""Decoder-boundary robustness: corrupt media payloads must fail with
the diagnosable contract exceptions (ValueError / NotImplementedError),
never a stray internal IndexError/KeyError/struct.error/zlib.error —
inside mapInPandas a bare internal exception fails the whole stage
undiagnosed, so at 100 TB ingest scale the failure mode of a malformed
payload is part of the operator's contract.

Deterministic fuzz: seeded truncation / byte-flip / garbage-insertion
sweeps over valid fixtures from every encoder family this repo ships
(PNG at several depths, WAV widths, baseline gray/color JPEG,
progressive JPEG). Counterexamples shrink to a reproducible seed.
"""

from __future__ import annotations

import io
import random
import struct
import wave
import zlib

import pytest

from git_etl_spark.operators.gif_codec import decode_gif, encode_gif
from git_etl_spark.operators.jpeg_codec import (
    decode_jpeg,
    encode_jpeg_color_coeffs,
    encode_jpeg_gray_coeffs,
    encode_jpeg_gray_coeffs_progressive,
)
from git_etl_spark.operators.multimodal import (
    decode_image,
    decode_png,
    decode_wav,
)

ALLOWED = (ValueError, NotImplementedError)
TRIALS = 1200


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _png_fixture(depth: int, color_type: int) -> bytes:
    ch = {0: 1, 2: 3, 3: 1}[color_type]
    w, h = 6, 4
    bits = w * ch * depth
    rb = (bits + 7) // 8
    raw = bytearray()
    for r in range(h):
        raw += bytes([0]) + bytes((r * 31 + i * 7) % 256 for i in range(rb))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
        )
    )
    if color_type == 3:
        png += _png_chunk(b"PLTE", bytes(range(3 * (1 << min(depth, 8)))[:768]))
    return (
        png
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_fixture_adam7(depth: int, color_type: int) -> bytes:
    """Adam7-interlaced PNG: seven independently filtered passes,
    each pass's scanlines carrying only its own (sub-sampled) pixels."""
    ch = {0: 1, 2: 3, 3: 1}[color_type]
    w, h = 9, 7  # non-multiple-of-8 dims so every pass is non-trivial
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        rb = (pw * ch * depth + 7) // 8
        for r in range(ph):
            raw += bytes([0]) + bytes((r * 31 + i * 7) % 256 for i in range(rb))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 1)
        )
    )
    if color_type == 3:
        png += _png_chunk(b"PLTE", bytes(range(3 * (1 << min(depth, 8)))[:768]))
    return (
        png
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _wav_fixture(sampwidth: int, nch: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(sampwidth)
        w.setframerate(8000)
        w.writeframes(bytes((i * 13) % 256 for i in range(sampwidth * nch * 50)))
    return buf.getvalue()


def _jpeg_fixtures() -> list[bytes]:
    blk = [0] * 64
    blk[0], blk[1], blk[8], blk[10] = 50, -3, 7, 2
    return [
        encode_jpeg_gray_coeffs([blk], 8, 8),
        encode_jpeg_color_coeffs(
            [[blk], [blk], [blk]], 8, 8, [(1, 1), (1, 1), (1, 1)]
        ),
        encode_jpeg_gray_coeffs_progressive([blk], 8, 8),
    ]


def _mutate(payload: bytes, rng: random.Random) -> bytes:
    b = bytearray(payload)
    mode = rng.randrange(3)
    if mode == 0:  # truncate
        return bytes(b[: rng.randrange(len(b))])
    if mode == 1:  # flip bytes
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        return bytes(b)
    pos = rng.randrange(len(b))  # insert garbage
    return bytes(
        b[:pos]
        + bytes(rng.randrange(256) for _ in range(rng.randrange(1, 9)))
        + b[pos:]
    )


def _sweep(name: str, payload: bytes, fn, seed: int) -> None:
    rng = random.Random(seed)
    for trial in range(TRIALS):
        mutated = _mutate(payload, rng)
        try:
            fn(mutated)
        except ALLOWED:
            pass
        except Exception as exc:  # noqa: BLE001 - the assertion target
            pytest.fail(
                f"{name} seed={seed} trial={trial}: non-contract "
                f"{type(exc).__name__}: {exc}"
            )


def test_png_decode_contract_under_corruption():
    for i, (depth, ctype) in enumerate([(8, 2), (8, 0), (2, 0), (16, 0), (4, 3)]):
        _sweep(f"png d{depth} t{ctype}", _png_fixture(depth, ctype), decode_png, 100 + i)


def test_png_adam7_decode_contract_under_corruption():
    # interlaced fixtures decode clean, then survive the same sweep —
    # covers the Adam7 pre-allocation bound (bit-flipped IHDR dims must
    # raise ValueError before any width·height allocation)
    for i, (depth, ctype) in enumerate([(8, 2), (4, 0), (16, 0), (4, 3)]):
        fixture = _png_fixture_adam7(depth, ctype)
        assert decode_png(fixture)["magic"] == "PNG"
        _sweep(f"png adam7 d{depth} t{ctype}", fixture, decode_png, 150 + i)


def test_wav_decode_contract_under_corruption():
    for i, (sw, nch) in enumerate([(1, 1), (2, 2), (3, 1), (4, 2)]):
        _sweep(f"wav w{sw} c{nch}", _wav_fixture(sw, nch), decode_wav, 200 + i)


def test_jpeg_decode_contract_under_corruption():
    for i, fixture in enumerate(_jpeg_fixtures()):
        _sweep(f"jpeg variant {i}", fixture, decode_jpeg, 300 + i)


def _gif_fixture(interlaced: bool = False) -> bytes:
    rng = random.Random(31)
    w, h, n = 9, 7, 8
    palette = bytes(((13 * i + c * 7) % 256) for i in range(n) for c in range(3))
    indices = bytes(rng.randrange(n) for _ in range(w * h))
    return encode_gif(
        w, h, [{"indices": indices, "interlaced": interlaced}], gct=palette
    )


def test_gif_decode_contract_under_corruption():
    _sweep("gif plain", _gif_fixture(False), decode_gif, 500)
    _sweep("gif interlaced", _gif_fixture(True), decode_gif, 501)


def test_decode_image_router_contract_under_corruption():
    """The mapInPandas-facing router inherits the same contract for
    every payload family it dispatches (incl. SIMG and raw fallback)."""
    simg = b"SIMG" + (4).to_bytes(2, "big") + (3).to_bytes(2, "big") + bytes(range(12))
    fixtures = [_png_fixture(8, 2), _jpeg_fixtures()[0], simg, b"plain text payload"]
    for i, fixture in enumerate(fixtures):
        _sweep(f"router variant {i}", fixture, decode_image, 400 + i)


def test_valid_fixtures_still_decode():
    """The sweep's base fixtures are genuinely valid — the robustness
    net must not be satisfied vacuously by everything raising."""
    for depth, ctype in [(8, 2), (2, 0), (16, 0), (4, 3)]:
        assert decode_png(_png_fixture(depth, ctype))["magic"] == "PNG"
    for sw, nch in [(1, 1), (2, 2), (3, 1), (4, 2)]:
        assert decode_wav(_wav_fixture(sw, nch))["n_samples"] == 50
    for fixture in _jpeg_fixtures():
        assert decode_jpeg(fixture)["width"] == 8
    for interlaced in (False, True):
        assert decode_gif(_gif_fixture(interlaced))["magic"] == "GIF"


def test_png_decompression_bomb_bounded():
    """A tiny IDAT inflating far past the header's scanline claim must
    raise at the cap (expected+1 bytes), never allocate the full
    decompressed stream — a 64 MB bomb compresses to ~64 KB and would
    otherwise balloon executor memory inside mapInPandas."""
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(64 * 1024 * 1024)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflates past"):
        decode_png(bomb)


def test_png_truncated_zlib_stream_diagnosed_at_codec_boundary():
    """decompressobj().decompress returns PARTIAL output on a truncated
    deflate stream without raising (unlike one-shot zlib.decompress),
    so a cut-off IDAT used to fall through to the geometry checks and
    be misreported as 'header claims more pixels than the IDAT stream
    carries'. It must instead be diagnosed as truncation at the codec
    boundary (ADVICE r9)."""
    good = _png_fixture(8, 2)
    # Locate the IDAT chunk and cut its deflate payload in half,
    # re-framing the chunk (length + CRC) so ONLY the zlib stream is
    # damaged — chunk-level integrity stays intact.
    i = good.index(b"IDAT") - 4
    (dlen,) = struct.unpack(">I", good[i : i + 4])
    payload = good[i + 8 : i + 8 + dlen]
    cut = payload[: dlen // 2]
    truncated = good[:i] + _png_chunk(b"IDAT", cut) + good[i + 12 + dlen :]
    with pytest.raises(ValueError, match="truncated PNG zlib stream"):
        decode_png(truncated)


def test_png_length_exact_truncation_without_eof_diagnosed():
    """ADVICE r10: a deflate stream cut off after emitting exactly the
    expected number of filtered bytes — but before the BFINAL block
    close / adler32 trailer — used to decode silently (the old check
    fired only on len(raw) < expected), so a corrupted-but-length-exact
    stream passed as valid and its checksum was never verified. The
    boundary must reject it: output <= expected with dec.eof False is
    missing input, and eof=True is also the only state in which zlib
    has actually verified the adler32."""
    good = _png_fixture(8, 2)
    i = good.index(b"IDAT") - 4
    (dlen,) = struct.unpack(">I", good[i : i + 4])
    payload = good[i + 8 : i + 8 + dlen]
    # Find a cut point where ALL expected bytes come out but the
    # end-of-stream marker is never reached (cutting the 4-byte adler
    # trailer alone usually suffices; scan backwards to be robust to
    # codec/level differences in where the last literal lands).
    full = zlib.decompress(payload)
    cut_payload = None
    for t in range(1, min(len(payload), 64)):
        dec = zlib.decompressobj()
        try:
            raw = dec.decompress(payload[:-t], len(full) + 1)
        except zlib.error:
            continue
        if len(raw) == len(full) and not dec.eof:
            cut_payload = payload[:-t]
            break
    assert cut_payload is not None, "no length-exact truncation point found"
    damaged = good[:i] + _png_chunk(b"IDAT", cut_payload) + good[i + 12 + dlen :]
    with pytest.raises(ValueError, match="truncated PNG zlib stream"):
        decode_png(damaged)


def test_png_corrupted_adler32_rejected():
    """The companion guarantee: when the trailer IS present but the
    adler32 mismatches, zlib raises during decompression and the codec
    maps it to the malformed-stream diagnosis — so a bit-flipped
    checksum can't pass either."""
    good = _png_fixture(8, 2)
    i = good.index(b"IDAT") - 4
    (dlen,) = struct.unpack(">I", good[i : i + 4])
    payload = good[i + 8 : i + 8 + dlen]
    bad = payload[:-1] + bytes([payload[-1] ^ 0xFF])
    damaged = good[:i] + _png_chunk(b"IDAT", bad) + good[i + 12 + dlen :]
    with pytest.raises(ValueError, match="malformed PNG zlib stream"):
        decode_png(damaged)
