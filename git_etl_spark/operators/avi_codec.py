"""Pure-stdlib RIFF/AVI video codec (uncompressed DIB + MJPEG frames).

Closes the "RIFF video raises loudly (ffmpeg absent)" half of the
multimodal honest gap the same way the WAV/JPEG/GIF/PNG paths were
closed: implement the CONTAINER and the entropy layer for real, no
external codec. Reference surface: the driver-side media helpers in
/root/reference (the reference repo has no media decode at all — this
module, like the other codecs, belongs to the mandated LLM-pipeline
extension surface).

- **Parser** (:func:`parse_avi`): RIFF('AVI ') chunk walk — LIST
  recursion, even-byte chunk padding, ``avih`` main header (frame
  count, dimensions, µs/frame), the first ``vids`` stream's ``strh``
  (handler fourcc) + ``strf`` (BITMAPINFOHEADER), and the ``movi``
  frame chunks (``##db``/``##dc`` of the video stream, in stream
  order; ``idx1`` is tolerated and ignored — the movi order IS the
  frame order for the sequential layouts emitted here).
- **Frame decode** (:func:`decode_avi_frames`): BI_RGB 24-bit DIB
  frames are unpacked for real (bottom-up row order flipped, 4-byte
  row padding stripped, BGR→RGB); ``MJPG`` frames are full JPEG
  streams decoded by :mod:`.jpeg_codec` (baseline or progressive —
  whatever the frame carries). Anything else — other biCompression
  values, other handler fourccs (cvid/xvid/h264…), palettized DIBs,
  bottom-up/top-down mixed negative heights other than the standard
  bottom-up layout — raises ``NotImplementedError`` loudly, the
  honest-gap policy.
- **Encoders** (:func:`encode_avi_dib`, :func:`encode_avi_mjpeg`):
  the inverse container layer for tests and synthetic corpora — emit
  RIFF/AVI with hdrl(avih + strl(strh+strf)) + movi + idx1. The
  parser reads every geometry fact FROM the stream, so the two sides
  agree by construction of the format, not by shared Python state.

Scale posture: like the other codecs this is driver-free per-row work
inside Arrow-batched ``mapInPandas`` — each payload decodes
independently inside its task; nothing here shuffles or collects.
"""

from __future__ import annotations

import struct

__all__ = [
    "parse_avi",
    "decode_avi_frames",
    "encode_avi_dib",
    "encode_avi_mjpeg",
]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def parse_avi(payload: bytes) -> dict:
    """Parse the container: header facts + raw frame chunks.

    Returns ``{"width", "height", "n_frames", "usec_per_frame",
    "handler", "bit_count", "compression", "frames": [(kind, bytes)]}``
    where ``kind`` is ``"db"`` (uncompressed DIB) or ``"dc"``
    (compressed, per the handler fourcc). Raises ``ValueError`` on a
    malformed container and ``NotImplementedError`` when the first
    video stream is missing."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    end = min(len(payload), 8 + _u32(payload, 4))

    avih: dict | None = None
    strh_handler: bytes | None = None
    strf: dict | None = None
    vids_stream_no: int | None = None
    frames: list[tuple[str, bytes]] = []
    n_streams_seen = 0

    def walk(off: int, stop: int) -> None:
        nonlocal avih, strh_handler, strf, vids_stream_no, n_streams_seen
        pending_vids = False
        while off + 8 <= stop:
            fourcc = payload[off : off + 4]
            size = _u32(payload, off + 4)
            body_off = off + 8
            if body_off + size > stop:
                raise ValueError("chunk overruns its parent")
            if fourcc == b"LIST":
                walk(body_off + 4, body_off + size)
            elif fourcc == b"avih":
                if size < 40:
                    raise ValueError("avih too short")
                avih = {
                    "usec_per_frame": _u32(payload, body_off),
                    "n_frames": _u32(payload, body_off + 16),
                    "width": _u32(payload, body_off + 32),
                    "height": _u32(payload, body_off + 36),
                }
            elif fourcc == b"strh":
                if size < 8:
                    raise ValueError("strh too short")
                fcc_type = payload[body_off : body_off + 4]
                pending_vids = fcc_type == b"vids" and vids_stream_no is None
                if pending_vids:
                    strh_handler = payload[body_off + 4 : body_off + 8]
                    vids_stream_no = n_streams_seen
                n_streams_seen += 1
            elif fourcc == b"strf":
                if pending_vids:
                    if size < 40:
                        raise ValueError("vids strf lacks BITMAPINFOHEADER")
                    strf = {
                        "bit_count": struct.unpack_from(
                            "<H", payload, body_off + 14
                        )[0],
                        "compression": payload[body_off + 16 : body_off + 20],
                    }
                    pending_vids = False
            elif (
                len(fourcc) == 4
                and fourcc[:2].isdigit()
                and fourcc[2:4] in (b"db", b"dc")
            ):
                if vids_stream_no is not None and int(fourcc[:2]) == vids_stream_no:
                    frames.append(
                        (
                            fourcc[2:4].decode(),
                            payload[body_off : body_off + size],
                        )
                    )
            # 'idx1', 'JUNK', audio '##wb', other streams: skipped
            off = body_off + size + (size & 1)  # chunks pad to even

    walk(12, end)
    if avih is None:
        raise ValueError("missing avih header")
    if strh_handler is None or strf is None:
        raise NotImplementedError("no vids stream in AVI (audio-only?)")
    return {
        **avih,
        "handler": strh_handler,
        "bit_count": strf["bit_count"],
        "compression": strf["compression"],
        "frames": frames,
    }


def _decode_dib_frame(data: bytes, width: int, height: int) -> bytes:
    """BI_RGB 24-bit bottom-up DIB → interleaved top-down RGB bytes."""
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3  # rows pad to 4 bytes
    if len(data) < stride * height:
        raise ValueError("DIB frame shorter than geometry requires")
    out = bytearray(row_bytes * height)
    for y in range(height):
        src = (height - 1 - y) * stride  # bottom-up → top-down
        dst = y * row_bytes
        row = data[src : src + row_bytes]
        # BGR → RGB per pixel
        out[dst + 0 : dst + row_bytes : 3] = row[2::3]
        out[dst + 1 : dst + row_bytes : 3] = row[1::3]
        out[dst + 2 : dst + row_bytes : 3] = row[0::3]
    return bytes(out)


def decode_avi_frames(payload: bytes, stride: int = 1) -> dict:
    """Decode every ``stride``-th video frame for real.

    Returns ``{"width", "height", "n_frames", "frames": [(frame_idx,
    pixel_bytes)]}`` — pixels are interleaved RGB for DIB frames and
    whatever :func:`.jpeg_codec.decode_jpeg` returns for MJPG frames
    (luma plane for grayscale streams, interleaved RGB for color).
    Loud on any compression this module does not really decode."""
    meta = parse_avi(payload)
    comp = meta["compression"]
    handler = meta["handler"]
    is_rgb = comp in (b"\x00\x00\x00\x00", b"RGB ") and meta["bit_count"] == 24
    is_mjpg = comp == b"MJPG" or handler == b"MJPG"
    if not (is_rgb or is_mjpg):
        raise NotImplementedError(
            f"AVI compression {comp!r} (handler {handler!r}) not decodable "
            "without an external codec; only BI_RGB 24-bit DIB and MJPG "
            "are implemented for real"
        )
    frames: list[tuple[int, bytes]] = []
    step = max(1, stride)
    for idx in range(0, len(meta["frames"]), step):
        kind, data = meta["frames"][idx]
        if is_rgb and kind == "db":
            frames.append(
                (idx, _decode_dib_frame(data, meta["width"], meta["height"]))
            )
        elif is_mjpg and kind == "dc":
            from .jpeg_codec import decode_jpeg

            frames.append((idx, bytes(decode_jpeg(data)["pixels"])))
        else:
            raise NotImplementedError(
                f"frame chunk kind {kind!r} under compression {comp!r}"
            )
    return {
        "width": meta["width"],
        "height": meta["height"],
        "n_frames": len(meta["frames"]),
        "frames": frames,
    }


# ---------------------------------------------------------------------------
# Encoders (tests / synthetic corpora)
# ---------------------------------------------------------------------------


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def _avi_container(
    frame_chunks: list[bytes],
    width: int,
    height: int,
    n_frames: int,
    handler: bytes,
    compression: bytes,
    bit_count: int,
    size_image: int,
    fps: int,
) -> bytes:
    usec = 1_000_000 // max(1, fps)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec, size_image * fps, 0, 0x10, n_frames, 0, 1, size_image,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n_frames,
                      size_image, 0, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, bit_count, compression, size_image,
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(frame_chunks)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame chunk (offset relative to movi list body)
    idx_entries = []
    off = 4  # skip the 'movi' list-type fourcc
    for ch in frame_chunks:
        # idx1 records the TRUE body size — read it back from the chunk
        # header rather than deriving it from len(ch): _chunk pads odd
        # bodies so len(ch) is always even and a len-based formula
        # over-counts odd (MJPEG-typical) bodies by the pad byte
        # (ADVICE r13).
        body_size = struct.unpack_from("<I", ch, 4)[0]
        idx_entries.append(ch[:4] + struct.pack("<III", 0x10, off, body_size))
        off += len(ch)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avi_dib(frames_rgb: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """Top-down interleaved-RGB frames → BI_RGB 24-bit AVI (rows
    re-flipped to the format's bottom-up order, padded to 4 bytes,
    RGB→BGR)."""
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    pad = b"\x00" * (stride - row_bytes)
    chunks = []
    for rgb in frames_rgb:
        if len(rgb) != row_bytes * height:
            raise ValueError("frame byte length does not match geometry")
        rows = []
        for y in range(height - 1, -1, -1):  # top-down → bottom-up
            row = bytearray(rgb[y * row_bytes : (y + 1) * row_bytes])
            row[0::3], row[2::3] = row[2::3], row[0::3]  # RGB → BGR
            rows.append(bytes(row) + pad)
        chunks.append(_chunk(b"00db", b"".join(rows)))
    return _avi_container(
        chunks, width, height, len(frames_rgb), b"DIB ",
        b"\x00\x00\x00\x00", 24, stride * height, fps,
    )


def encode_avi_mjpeg(jpeg_frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """Complete JPEG streams (e.g. from ``encode_jpeg_gray_coeffs``) →
    an MJPG AVI: each frame chunk IS a full JPEG payload."""
    chunks = [_chunk(b"00dc", j) for j in jpeg_frames]
    size_image = max((len(j) for j in jpeg_frames), default=0)
    return _avi_container(
        chunks, width, height, len(jpeg_frames), b"MJPG", b"MJPG", 24,
        size_image, fps,
    )
