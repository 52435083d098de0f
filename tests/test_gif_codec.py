"""GIF codec: LZW roundtrips (incl. KwKwK, code-width growth to 12
bits, dictionary-full resets, deferred clear), container decode
(global/local palettes, interlace, multi-frame), and router dispatch.
The oracle everywhere is independent arithmetic: indices mapped
through the palette by the test itself, never by the code under test.
"""

from __future__ import annotations

import random

import pytest

from git_etl_spark.operators.gif_codec import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def _palette(n):
    return bytes(((13 * i + ch * 7) % 256) for i in range(n) for ch in range(3))


def _map_rgb(indices, palette):
    return b"".join(palette[3 * i : 3 * i + 3] for i in indices)


def test_lzw_roundtrip_small_and_kwkwk():
    # KwKwK: runs of a repeated symbol force the code-defined-by-its-
    # own-use case immediately
    for data in (b"\x00" * 50, b"\x01\x01\x01\x01\x01", b"\x00\x01" * 30,
                 b"", b"\x02"):
        assert bytes(lzw_decode(2, lzw_encode(2, data))) == data


def test_lzw_roundtrip_random_all_code_sizes():
    rng = random.Random(11)
    for min_cs, nsym in ((2, 4), (3, 7), (8, 256)):
        data = bytes(rng.randrange(nsym) for _ in range(20000))
        assert bytes(lzw_decode(min_cs, lzw_encode(min_cs, data))) == data


def test_lzw_roundtrip_dictionary_full_reset():
    # low-entropy long stream with many distinct bigrams pushes the
    # dictionary to 4096 and through the encoder's clear-reset
    rng = random.Random(5)
    data = bytes(rng.randrange(3) for _ in range(120000))
    enc = lzw_encode(2, data)
    assert bytes(lzw_decode(2, enc)) == data
    assert len(enc) < len(data)  # it really is compressing


def test_lzw_deferred_clear_stream():
    """A stream whose encoder never sends clear after the dictionary
    fills: the decoder must sit at 12-bit codes, defining nothing,
    until the data ends. Built by emitting only literal codes while
    mirroring the decoder's width schedule."""
    min_cs = 8
    clear, eoi = 256, 257
    data = bytes((i * 37 + 11) % 256 for i in range(6000))

    out = bytearray()
    acc = nbits = 0
    code_size = min_cs + 1

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    nxt = eoi + 1  # decoder's next-free counter
    for k, b in enumerate(data):
        emit(b)
        if k > 0 and nxt < 4096:
            # decoder defines one entry per code after the first
            nxt += 1
            if nxt == (1 << code_size) and code_size < 12:
                code_size += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    assert bytes(lzw_decode(min_cs, bytes(out))) == data


def test_gif_single_frame_roundtrip_and_stats():
    rng = random.Random(3)
    w, h, n = 17, 9, 16
    palette = _palette(n)
    indices = bytes(rng.randrange(n) for _ in range(w * h))
    gif = encode_gif(w, h, [{"indices": indices}], gct=palette)
    d = decode_gif_frames(gif)
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, 1)
    assert d["frames"][0]["rgb"] == _map_rgb(indices, palette)
    feats = decode_gif(gif)
    rgb = _map_rgb(indices, palette)
    assert feats == {
        "n_bytes": len(rgb),
        "magic": "GIF",
        "width": w,
        "height": h,
        "mean_byte": sum(rgb) / len(rgb),
        "max_byte": max(rgb),
    }


def test_gif_interlaced_frame_equals_sequential():
    rng = random.Random(9)
    w, h, n = 11, 13, 8  # odd height exercises all four passes unevenly
    palette = _palette(n)
    indices = bytes(rng.randrange(n) for _ in range(w * h))
    # store rows in four-pass order, flag interlaced
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    stored = b"".join(indices[y * w : (y + 1) * w] for y in order)
    gif_i = encode_gif(
        w, h, [{"indices": stored, "interlaced": True}], gct=palette
    )
    gif_s = encode_gif(w, h, [{"indices": indices}], gct=palette)
    assert decode_gif_frames(gif_i)["frames"][0]["rgb"] == _map_rgb(
        indices, palette
    )
    assert decode_gif(gif_i) == decode_gif(gif_s)


def test_gif_local_table_overrides_global_and_multiframe():
    rng = random.Random(21)
    w, h = 6, 5
    gct = _palette(4)
    lct = bytes(reversed(_palette(8)))
    f1 = bytes(rng.randrange(4) for _ in range(w * h))
    f2 = bytes(rng.randrange(8) for _ in range(12))  # 4×3 sub-rectangle
    gif = encode_gif(
        w,
        h,
        [
            {"indices": f1},
            {"indices": f2, "left": 1, "top": 1, "width": 4, "height": 3,
             "lct": lct},
        ],
        gct=gct,
    )
    d = decode_gif_frames(gif)
    assert d["n_frames"] == 2
    assert d["frames"][0]["rgb"] == _map_rgb(f1, gct)
    assert d["frames"][1]["rgb"] == _map_rgb(f2, lct)
    assert (d["frames"][1]["left"], d["frames"][1]["top"]) == (1, 1)
    # router stats cover BOTH frames' pixels
    both = _map_rgb(f1, gct) + _map_rgb(f2, lct)
    feats = decode_gif(gif)
    assert feats["n_bytes"] == len(both)
    assert feats["mean_byte"] == sum(both) / len(both)


def test_gif_extensions_skipped_and_gif87a():
    w, h = 3, 2
    palette = _palette(4)
    indices = bytes([0, 1, 2, 3, 1, 0])
    gif = encode_gif(w, h, [{"indices": indices}], gct=palette,
                     version=b"GIF87a")
    # splice a graphic-control and a comment extension before the image
    ext = (b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE
           + b"\x21\xfe\x05hello\x00")          # comment
    gif = gif[:13 + len(palette)] + ext + gif[13 + len(palette):]
    d = decode_gif_frames(gif)
    assert d["frames"][0]["rgb"] == _map_rgb(indices, palette)


def test_gif_router_dispatch(spark):
    """decode_image routes GIF payloads through the real decoder inside
    the same Arrow-batched mapInPandas plumbing as PNG/JPEG/SIMG."""
    import pandas as pd

    from git_etl_spark.operators.multimodal import FEATURE_SCHEMA, decode_image

    rng = random.Random(2)
    w, h, n = 8, 8, 16
    palette = _palette(n)
    indices = bytes(rng.randrange(n) for _ in range(w * h))
    gif = encode_gif(w, h, [{"indices": indices}], gct=palette)
    assert decode_image(gif)["magic"] == "GIF"

    simg = b"SIMG" + (4).to_bytes(2, "big") + (2).to_bytes(2, "big") + b"abcdefgh"
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [gif, simg]}),
        "doc_id long, payload binary",
    )

    def extract(batches):
        for pdf in batches:
            feats = [decode_image(p) for p in pdf["payload"]]
            o = pd.DataFrame(feats)
            o.insert(0, "doc_id", pdf["doc_id"].values)
            yield o

    rows = {r.doc_id: r for r in df.mapInPandas(extract, FEATURE_SCHEMA).collect()}
    rgb = _map_rgb(indices, palette)
    assert rows[1].magic == "GIF" and rows[1].max_byte == max(rgb)
    assert rows[1].n_bytes == len(rgb)
    assert rows[2].magic == "SIMG"


def test_gif_malformed_diagnosed():
    palette = _palette(4)
    gif = encode_gif(3, 2, [{"indices": bytes(6)}], gct=palette)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif_frames(b"NOTGIF" + gif[6:])
    with pytest.raises(ValueError, match="truncated"):
        decode_gif_frames(gif[:10])
    with pytest.raises(ValueError, match="trailer"):
        decode_gif_frames(gif[:-1])
    # pixel index beyond the table: craft with a 2-entry palette but
    # indices up to 3 (encoder refuses, so splice the table short)
    with pytest.raises(ValueError):
        bad = encode_gif(3, 2, [{"indices": bytes([3] * 6)}], gct=_palette(2))
    # LZW stream carrying fewer pixels than the descriptor claims
    import struct

    data = lzw_encode(2, bytes(4))  # 4 pixels under a 3×2 descriptor
    short = (
        b"GIF89a"
        + struct.pack("<HHBBB", 3, 2, 0x81, 0, 0)  # GCT flag, 4 entries
        + palette
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 3, 2, 0)
        + bytes([2])
        + bytes([len(data)])
        + data
        + b"\x00\x3b"
    )
    with pytest.raises(ValueError, match="decodes to"):
        decode_gif_frames(short)


# ---------------------------------------------------------------------------
# Property-based invariants (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=150, deadline=None)
@given(
    min_cs=st.integers(min_value=2, max_value=8),
    data=st.data(),
)
def test_lzw_roundtrip_property(min_cs, data):
    """∀ index streams within the alphabet: decode(encode(x)) == x."""
    nsym = 1 << min_cs
    xs = data.draw(
        st.binary(max_size=3000).map(
            lambda b: bytes(v % nsym for v in b)
        )
    )
    assert bytes(lzw_decode(min_cs, lzw_encode(min_cs, xs))) == xs


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=20),
    interlaced=st.booleans(),
    data=st.data(),
)
def test_gif_container_roundtrip_property(w, h, interlaced, data):
    """∀ (dims, palette, pixels, interlace): the container roundtrips
    to exactly the palette-mapped RGB, independent of storage order."""
    from git_etl_spark.operators.gif_codec import interlace_row_order

    n = data.draw(st.sampled_from([2, 4, 16, 256]))
    palette = _palette(n)
    indices = bytes(
        data.draw(st.integers(min_value=0, max_value=n - 1))
        for _ in range(w * h)
    )
    stored = (
        b"".join(indices[y * w : (y + 1) * w] for y in interlace_row_order(h))
        if interlaced
        else indices
    )
    gif = encode_gif(
        w, h, [{"indices": stored, "interlaced": interlaced}], gct=palette
    )
    assert decode_gif_frames(gif)["frames"][0]["rgb"] == _map_rgb(
        indices, palette
    )
