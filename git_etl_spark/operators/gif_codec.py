"""Pure-stdlib GIF codec — the third real image format behind the
multimodal router (after PNG and JPEG), closing the common web-corpus
trio. Like ``jpeg_codec``, this is written from the public
specification (GIF89a, CompuServe 1990; the LZW variant is the one
described there, LSB-first packing with variable 3–12-bit codes), not
ported from any library: a scraped-media curation pipeline meets GIFs
constantly, and the router refusing them as "needs ffmpeg" would be a
false env gap — GIF needs nothing beyond byte arithmetic.

Scope (documented, tested):

- GIF87a and GIF89a signatures; logical screen descriptor; global and
  per-image local color tables (local overrides global).
- Full LZW decompression: clear/EOI codes, code-width growth 3→12
  bits, the KwKwK self-referential case, deferred-clear streams (the
  dictionary may sit full at 4096 entries until the encoder sends a
  clear — emitting codes at 12 bits meanwhile).
- Multiple image blocks (animation frames), each decoded over its own
  sub-rectangle; four-pass row interlacing per frame.
- Extension blocks (graphic control, comment, application, plain
  text) are walked by their sub-block framing and skipped — they
  carry no pixels.

Deliberately out of scope, loudly: animation *compositing* (disposal
methods and transparency blending between frames produce a rendered
video — the statistics here are over each frame's own decoded palette
colors, which is the curation-relevant signal), and sub-blocks framing
anything but pixels. Malformed streams raise ValueError at the
decoder boundary, same contract as the JPEG/PNG/WAV decoders
(tests/test_codec_robustness.py).
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable code width)
# ---------------------------------------------------------------------------


def lzw_decode(min_code_size: int, data: bytes) -> bytearray:
    """Decode one image's LZW stream (sub-blocks already concatenated)
    into palette indices."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"LZW minimum code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary as (prefix_code, last_index) pairs — O(1) appends and
    # no quadratic byte copying on long chains
    prefix: list[int] = [-1] * clear + [-1, -1]
    suffix: list[int] = list(range(clear)) + [0, 0]
    first: list[int] = list(range(clear)) + [0, 0]

    out = bytearray()
    code_size = min_code_size + 1
    acc = nbits = 0
    prev = -1
    pos = 0
    n = len(data)

    def expand(code: int) -> bytearray:
        chain = bytearray()
        c = code
        while c >= 0:
            chain.append(suffix[c])
            c = prefix[c]
        chain.reverse()
        return chain

    while True:
        while nbits < code_size:
            if pos >= n:
                # stream may legally end right after EOI was consumed;
                # ending mid-symbol without EOI is truncation, but many
                # real encoders omit EOI — treat exhausted bits as end
                return out
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size

        if code == clear:
            del prefix[clear + 2 :]
            del suffix[clear + 2 :]
            del first[clear + 2 :]
            code_size = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            return out
        if prev < 0:
            if code >= clear:
                raise ValueError("LZW stream starts with a non-literal code")
            out.append(code)
            prev = code
            continue
        nxt = len(prefix)
        if code < nxt:
            entry_first = first[code]
            out += expand(code)
        elif code == nxt:
            # KwKwK: the code being defined by this very symbol
            entry_first = first[prev]
            out += expand(prev)
            out.append(entry_first)
        else:
            raise ValueError(f"LZW code {code} beyond dictionary size {nxt}")
        if nxt < 4096:
            prefix.append(prev)
            suffix.append(entry_first)
            first.append(first[prev])
            # widen when the next code to be DEFINED no longer fits
            if nxt + 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code


def lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """GIF-variant LZW encoder (for fixtures and the write path): real
    dictionary compression with clear + EOI framing, exercising code
    widths up to 12 bits and dictionary-full resets."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"LZW minimum code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    emit(clear)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if nxt < 4096:
            table[cand] = nxt
            if nxt == (1 << code_size) and code_size < 12:
                code_size += 1
            nxt += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
            code_size = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def interlace_row_order(height: int) -> list[int]:
    """Row indices in four-pass storage order (GIF89a appendix E):
    position k in the stored stream is image row
    ``interlace_row_order(h)[k]``. Used by the decoder to scatter rows
    back and by encoders to lay rows out."""
    return [
        y for start, step in _INTERLACE_PASSES for y in range(start, height, step)
    ]


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a length-prefixed sub-block chain; returns (data,
    next offset past the 0 terminator)."""
    chunks = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-block chain")
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise ValueError("truncated GIF sub-block")
        chunks.append(payload[pos : pos + size])
        pos += size


def decode_gif_frames(payload: bytes) -> dict:
    """Decode every image block of a GIF to palette-resolved RGB.

    Returns ``{"width", "height", "n_frames", "frames"}`` where each
    frame is ``{"left", "top", "width", "height", "interlaced",
    "rgb"}`` with ``rgb`` the frame's own w·h·3 bytes (row-major, no
    inter-frame compositing — see module docstring)."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF logical screen descriptor")
    width, height, packed, _bg, _aspect = struct.unpack_from(
        "<HHBBB", payload, 6
    )
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    frames = []
    n_total = len(payload)
    while True:
        if pos >= n_total:
            raise ValueError("GIF stream ends without trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-block chain
            if pos >= n_total:
                raise ValueError("truncated GIF extension")
            pos += 1  # label
            _, pos = _sub_blocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block introducer 0x{block:02x}")
        if pos + 9 > n_total:
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if fw == 0 or fh == 0:
            raise ValueError("empty GIF image block")
        table = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            table = payload[pos : pos + 3 * n]
            if len(table) < 3 * n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if not table:
            raise ValueError("GIF image block with no color table in scope")
        if pos >= n_total:
            raise ValueError("truncated GIF image data")
        min_code_size = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        indices = lzw_decode(min_code_size, data)
        if len(indices) < fw * fh:
            raise ValueError(
                f"GIF frame decodes to {len(indices)} pixels, needs {fw * fh}"
            )
        indices = indices[: fw * fh]
        n_colors = len(table) // 3
        if max(indices) >= n_colors:
            raise ValueError("GIF pixel index outside color table")
        interlaced = bool(fpacked & 0x40)
        if interlaced:
            deinter = bytearray(fw * fh)
            for src_row, y in enumerate(interlace_row_order(fh)):
                deinter[y * fw : (y + 1) * fw] = indices[
                    src_row * fw : (src_row + 1) * fw
                ]
            indices = deinter
        rgb = bytearray(fw * fh * 3)
        for k, ix in enumerate(indices):
            rgb[3 * k : 3 * k + 3] = table[3 * ix : 3 * ix + 3]
        frames.append(
            {
                "left": left,
                "top": top,
                "width": fw,
                "height": fh,
                "interlaced": interlaced,
                "rgb": bytes(rgb),
            }
        )
    if not frames:
        raise ValueError("GIF with no image blocks")
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
    }


def decode_gif(payload: bytes) -> dict:
    """Router-shaped decode: the byte statistics run over the
    palette-resolved RGB of ALL frames (an animation's curation signal
    is its whole pixel content, not frame 1), under the same 6-key
    contract as SIMG/PNG/JPEG."""
    d = decode_gif_frames(payload)
    allrgb = b"".join(f["rgb"] for f in d["frames"])
    return {
        "n_bytes": len(allrgb),
        "magic": "GIF",
        "width": d["width"],
        "height": d["height"],
        "mean_byte": sum(allrgb) / len(allrgb) if allrgb else 0.0,
        "max_byte": max(allrgb) if allrgb else 0,
    }


def encode_gif(
    width: int,
    height: int,
    frames: list[dict],
    gct: bytes = b"",
    version: bytes = b"GIF89a",
) -> bytes:
    """Emit a GIF from palette-indexed frames (fixtures + write path).

    Each frame dict: ``indices`` (bytes, w·h palette indices), optional
    ``left``/``top``/``width``/``height`` (default full screen),
    optional ``lct`` (local color table bytes, length 3·2^k), optional
    ``interlaced`` (rows stored in four-pass order). ``gct`` is the
    global color table (length 3·2^k) — every frame must have a table
    in scope."""
    if version not in GIF_MAGICS:
        raise ValueError("GIF version must be GIF87a or GIF89a")

    def table_bits(table: bytes) -> int:
        n = len(table) // 3
        if len(table) % 3 or n < 2 or n > 256 or n & (n - 1):
            raise ValueError("color table length must be 3·2^k, k=1..8")
        return n.bit_length() - 2  # field stores k-1 for 2^k entries

    out = bytearray(version)
    packed = 0
    if gct:
        packed = 0x80 | table_bits(gct)
    out += struct.pack("<HHBBB", width, height, packed, 0, 0)
    out += gct
    for f in frames:
        fw = f.get("width", width)
        fh = f.get("height", height)
        indices = f["indices"]
        if len(indices) != fw * fh:
            raise ValueError("frame indices length != width·height")
        lct = f.get("lct", b"")
        fpacked = 0
        if lct:
            fpacked |= 0x80 | table_bits(lct)
        if f.get("interlaced"):
            fpacked |= 0x40
        table = lct or gct
        if not table:
            raise ValueError("frame has no color table in scope")
        n_colors = len(table) // 3
        if indices and max(indices) >= n_colors:
            raise ValueError("frame index outside its color table")
        out += b"\x2c" + struct.pack(
            "<HHHHB", f.get("left", 0), f.get("top", 0), fw, fh, fpacked
        )
        out += lct
        min_code_size = max(2, (n_colors - 1).bit_length())
        out.append(min_code_size)
        data = lzw_encode(min_code_size, bytes(indices))
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
