"""RIFF/AVI codec: container round-trips, real frame decode, loud
bounds. Encoder and parser must agree by construction of the format —
every geometry fact is read back FROM the emitted stream."""

from __future__ import annotations

import struct

import pytest

from git_etl_spark.operators.avi_codec import (
    decode_avi_frames,
    encode_avi_dib,
    encode_avi_mjpeg,
    parse_avi,
)


def _gradient_frame(width: int, height: int, seed: int) -> bytes:
    """Deterministic RGB frame, distinct per seed."""
    return bytes(
        (x * 3 + y * 7 + c * 11 + seed * 13) % 256
        for y in range(height)
        for x in range(width)
        for c in range(3)
    )


def test_dib_roundtrip_bit_exact():
    """encode → decode returns the exact RGB bytes for every frame,
    including a width whose 3-byte rows need 4-byte padding (w=5 →
    15-byte rows, 16-byte stride)."""
    w, h = 5, 4
    frames = [_gradient_frame(w, h, s) for s in range(3)]
    payload = encode_avi_dib(frames, w, h, fps=25)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    got = decode_avi_frames(payload)
    assert (got["width"], got["height"], got["n_frames"]) == (w, h, 3)
    assert [px for _, px in got["frames"]] == frames
    assert [i for i, _ in got["frames"]] == [0, 1, 2]


def test_dib_stride_sampling():
    w, h = 4, 2
    frames = [_gradient_frame(w, h, s) for s in range(7)]
    payload = encode_avi_dib(frames, w, h)
    got = decode_avi_frames(payload, stride=3)
    assert [i for i, _ in got["frames"]] == [0, 3, 6]
    assert got["n_frames"] == 7
    assert [px for _, px in got["frames"]] == [frames[0], frames[3], frames[6]]


def test_mjpeg_frames_decode_via_jpeg_codec():
    """MJPG frame chunks are full JPEG streams; decoding the AVI must
    yield exactly what decoding each JPEG directly yields."""
    from git_etl_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_gray_coeffs,
    )

    blocks = []
    for dc in (40, -20, 77):
        blk = [0] * 64
        blk[0] = dc
        blk[5] = 9
        blocks.append(blk)
    jpegs = [encode_jpeg_gray_coeffs([b], 8, 8) for b in blocks]
    payload = encode_avi_mjpeg(jpegs, 8, 8, fps=5)
    got = decode_avi_frames(payload)
    assert got["n_frames"] == 3
    for (idx, px), j in zip(got["frames"], jpegs):
        assert px == bytes(decode_jpeg(j)["pixels"])


def test_parse_exposes_header_facts():
    w, h = 6, 3
    payload = encode_avi_dib([_gradient_frame(w, h, 0)], w, h, fps=10)
    meta = parse_avi(payload)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, 1)
    assert meta["usec_per_frame"] == 100_000
    assert meta["bit_count"] == 24
    assert meta["compression"] == b"\x00\x00\x00\x00"


def test_unknown_compression_raises_loudly():
    payload = bytearray(encode_avi_dib([_gradient_frame(4, 2, 0)], 4, 2))
    i = payload.index(b"strf") + 8 + 16  # biCompression field
    payload[i : i + 4] = b"cvid"
    with pytest.raises(NotImplementedError, match="cvid"):
        decode_avi_frames(bytes(payload))


def test_malformed_rejected():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    good = encode_avi_dib([_gradient_frame(4, 2, 0)], 4, 2)
    bad = bytearray(good)
    i = bad.index(b"avih") + 4
    bad[i : i + 4] = struct.pack("<I", 2**20)  # chunk overruns parent
    with pytest.raises(ValueError, match="overruns"):
        parse_avi(bytes(bad))


def test_audio_only_avi_raises():
    """A RIFF/AVI with no vids stream is a loud NotImplementedError,
    not a silent empty decode."""
    from git_etl_spark.operators.avi_codec import _avi_container

    payload = _avi_container([], 0, 0, 0, b"\x00" * 4, b"\x00" * 4, 0, 0, 10)
    # overwrite the strh fccType 'vids' with 'auds'
    b = bytearray(payload)
    i = b.index(b"strh") + 8
    b[i : i + 4] = b"auds"
    with pytest.raises(NotImplementedError, match="vids"):
        parse_avi(bytes(b))


def test_short_dib_frame_diagnosed():
    """An inconsistent container is a loud ValueError either way the
    damage lands: shrinking a frame chunk's declared size desyncs the
    chunk walk ('overruns its parent'); a frame that parses but is
    shorter than the geometry requires is diagnosed by the DIB
    decoder ('shorter than geometry')."""
    good = encode_avi_dib([_gradient_frame(4, 4, 1)], 4, 4)
    truncated = bytearray(good)
    i = truncated.index(b"00db") + 4
    truncated[i : i + 4] = struct.pack("<I", 8)
    with pytest.raises(ValueError, match="shorter|overruns"):
        decode_avi_frames(bytes(truncated))

    # geometry-vs-frame mismatch without breaking the walk: declare a
    # taller image in both headers than the one encoded frame carries
    taller = bytearray(good)
    j = taller.index(b"avih") + 8 + 36   # avih dwHeight
    taller[j : j + 4] = struct.pack("<I", 64)
    k = taller.index(b"strf") + 8 + 8    # BITMAPINFOHEADER biHeight
    taller[k : k + 4] = struct.pack("<i", 64)
    with pytest.raises(ValueError, match="shorter"):
        decode_avi_frames(bytes(taller))


# ---------------------------------------------------------------------------
# multimodal plumbing integration: the same helpers the registered
# decode/frame-sample queries run inside mapInPandas
# ---------------------------------------------------------------------------


def test_decode_image_handles_avi_payload():
    from git_etl_spark.operators.multimodal import decode_image

    w, h = 4, 2
    frames = [_gradient_frame(w, h, s) for s in range(2)]
    payload = encode_avi_dib(frames, w, h)
    f = decode_image(payload)
    assert f["magic"] == "AVI"
    assert (f["width"], f["height"]) == (w, h)
    mv = memoryview(frames[0])
    assert f["mean_byte"] == sum(mv) / len(mv)   # FIRST frame, decoded
    assert f["max_byte"] == max(mv)
    assert f["n_bytes"] == len(frames[0])


def test_decode_image_still_loud_on_other_riff():
    import pytest as _pytest

    from git_etl_spark.operators.multimodal import decode_image

    wave = b"RIFF" + struct.pack("<I", 12) + b"WAVEfmt " + b"\x00" * 4
    with _pytest.raises(NotImplementedError, match="WEBP|WAVE"):
        decode_image(wave)


def test_sample_frames_real_avi_path():
    """The frame-sample helper's REAL path: stride derived from the
    container's frame count, mean over DECODED pixels (bottom-up rows
    flipped, padding stripped, BGR->RGB) — cross-checked against the
    original RGB frames, which the payload stores in a different byte
    layout than the one being averaged."""
    from git_etl_spark.operators.multimodal import sample_frames_stub

    w, h = 5, 3  # padded rows: decode must NOT average the pad bytes
    frames = [_gradient_frame(w, h, s) for s in range(20)]
    rows = sample_frames_stub(encode_avi_dib(frames, w, h), max_frames=8)
    assert len(rows) == 10  # 20 frames, stride 2
    assert [r["frame_idx"] for r in rows] == list(range(0, 20, 2))
    for r in rows:
        src = memoryview(frames[r["frame_idx"]])
        assert r["n_frames"] == 20
        assert r["frame_mean"] == sum(src) / len(src)
        step = max(1, len(src) // 4)
        assert r["thumb_hex"] == bytes(src[::step][:4]).hex()


def test_sample_frames_still_loud_on_single_images():
    import pytest as _pytest

    from git_etl_spark.operators.multimodal import sample_frames_stub

    with _pytest.raises(NotImplementedError):
        sample_frames_stub(b"\x89PNG\r\n\x1a\nrest")
    wave = b"RIFF" + struct.pack("<I", 12) + b"WAVEfmt " + b"\x00" * 4
    with _pytest.raises(NotImplementedError):
        sample_frames_stub(wave)


def test_mjpeg_avi_through_frame_sampler():
    from git_etl_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_gray_coeffs,
    )
    from git_etl_spark.operators.multimodal import sample_frames_stub

    blk = [0] * 64
    blk[0], blk[3] = 55, -7
    jpeg = encode_jpeg_gray_coeffs([blk], 8, 8)
    rows = sample_frames_stub(encode_avi_mjpeg([jpeg] * 3, 8, 8))
    px = bytes(decode_jpeg(jpeg)["pixels"])
    assert len(rows) == 3
    assert all(r["frame_mean"] == sum(px) / len(px) for r in rows)


def test_idx1_records_unpadded_body_size():
    """idx1 entries must record the TRUE frame body size, not the
    padded chunk length: _chunk pads odd bodies to even, and an
    external consumer seeking via idx1 would otherwise read one
    garbage byte per odd (MJPEG-typical) frame (ADVICE r13). Walk the
    emitted container byte-for-byte: each idx1 size must equal the
    size field in the corresponding movi chunk header, and the odd
    body must still be stored padded."""
    # frame payloads of odd (7) and even (8) length; MJPG bodies are
    # opaque at container level so raw bytes exercise the path directly
    bodies = [b"x" * 7, b"y" * 8]
    payload = encode_avi_mjpeg(bodies, 8, 8, fps=5)

    idx_off = payload.find(b"idx1")
    assert idx_off > 0
    idx_size = struct.unpack_from("<I", payload, idx_off + 4)[0]
    entries = []
    p = idx_off + 8
    while p < idx_off + 8 + idx_size:
        fourcc = payload[p : p + 4]
        flags, off, size = struct.unpack_from("<III", payload, p + 4)
        entries.append((fourcc, flags, off, size))
        p += 16
    assert [e[3] for e in entries] == [7, 8]
    assert all(e[0] == b"00dc" for e in entries)

    # cross-check against the movi chunks themselves: idx1 offsets are
    # relative to the movi list body (starting at its 'movi' fourcc)
    movi_body = payload.find(b"movi")
    for fourcc, _flags, off, size in entries:
        chunk_at = movi_body + off
        assert payload[chunk_at : chunk_at + 4] == fourcc
        hdr_size = struct.unpack_from("<I", payload, chunk_at + 4)[0]
        assert hdr_size == size
    # odd body stored padded: next chunk starts on an even boundary
    first_end = movi_body + entries[0][2] + 8 + entries[0][3]
    assert payload[first_end : first_end + 1] == b"\x00"  # pad byte
    assert entries[1][2] == entries[0][2] + 8 + entries[0][3] + 1
