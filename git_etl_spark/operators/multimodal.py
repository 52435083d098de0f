"""Multimodal column plumbing — SURVEY.md §2.10 X5.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata travelling alongside. The corpus has no real media, so the
payload is a deterministic stand-in (UTF-8 bytes of the text column);
everything *around* the payload — binary columns, byte-level scalar
functions, Arrow-batched ``mapInPandas`` decode plumbing, schema and
partitioning — is real and tested.

The stand-in payloads ship in a real (synthetic) container format —
SIMG: 4-byte magic + big-endian width/height header + body — built
JVM-side and *parsed* back in the Python workers (``decode_image``),
so the mapInPandas path exercises an actual per-payload decode whose
every feature the DuckDB oracle reconstructs independently. PNG is
decoded for real with only the stdlib (``decode_png``: chunk walk,
zlib inflate, all five scanline prediction filters), and so are
RIFF/WAVE integer PCM audio at every width ``wave`` frames —
8/16/24/32-bit, multi-channel mixdown — and — since round 7 — JPEG
(``jpeg_codec``: segment walk, canonical Huffman DC+AC entropy
decode, dequantize, de-zigzag, IDCT; round 8 added progressive SOF2
with spectral selection + successive approximation, baseline YCbCr
color — interleaved MCUs, 4:2:0/4:2:2 subsampling, restart
intervals, JFIF YCbCr→RGB — and progressive color). GIF87a/GIF89a
decode for real too (``gif_codec``: full LZW with deferred clear,
global/local palettes, interlace, multi-frame). The loud
NotImplementedError list is down to what genuinely needs an external
codec: lossless/arithmetic/12-bit JPEG, compressed-codec AVI
(cvid/xvid/h264…), and WEBP — a silent fake decode of real media
would be worse than a loud gap. RIFF/AVI video with BI_RGB DIB or
MJPG frames decodes for real since r13 (``avi_codec``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query
from ..session import iter_checkpoint

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, magic string, width int, height int,"
    " mean_byte double, max_byte int"
)

# the synthetic container format the corpus's stand-in media ships in:
# 4-byte magic, 2-byte big-endian width, 2-byte big-endian height, body
SIMG_MAGIC = b"SIMG"
PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# formats whose decode genuinely needs an external codec (ffmpeg — not
# in this environment); PNG is NOT here (stdlib zlib + prediction
# filters), since round 7 neither is baseline JPEG (pure-stdlib
# huffman + IDCT, operators/jpeg_codec.py), and since round 13 the
# RIFF family decodes its WAVE-PCM case via the stdlib ``wave`` and
# its AVI case (BI_RGB DIB + MJPG frames) via operators/avi_codec.py —
# the remaining loud RIFF members are compressed-codec AVI
# (cvid/xvid/h264…) and WEBP (VP8 entropy coding)
REAL_CODEC_MAGICS = (b"RIFF",)
AVI_FORM = b"AVI "
JPEG_MAGIC = b"\xff\xd8\xff"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(
    raw: bytes, p: int, stride: int, height: int, bpp: int
) -> tuple[bytearray, int]:
    """Reverse the per-scanline prediction filters of one (sub-)image:
    ``height`` rows of ``1 + stride`` bytes starting at ``raw[p]``.
    ``bpp`` is the filter's byte distance — ``max(1, bits_per_pixel //
    8)`` per RFC 2083 §6.2, so sub-byte depths filter with distance 1
    and 16-bit with 2·channels. Returns (reconstructed bytes, next
    offset). Used for the whole image when non-interlaced and per
    Adam7 pass when interlaced — each pass is filtered as an
    independent sub-image (RFC 2083 §2.6), so the same reversal
    applies with the pass's own dims."""
    if len(raw) - p < (stride + 1) * height:
        raise ValueError("PNG scanline stream has wrong length")
    recon = bytearray()
    prev = bytearray(stride)
    for _ in range(height):
        filt = raw[p]
        row = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if filt == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif filt == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pr = a + b - c
                pa, pb, pc = abs(pr - a), abs(pr - b), abs(pr - c)
                best = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + best) & 0xFF
        elif filt != 0:
            raise ValueError(f"invalid PNG filter byte {filt}")
        recon += row
        prev = row
    return recon, p


# Adam7 pass grid: (x_start, y_start, x_step, y_step), RFC 2083 §2.6
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def decode_png(payload: bytes) -> dict:
    """Real PNG decode with only the stdlib: chunk walk (IHDR → IDAT*
    → IEND), one ``zlib.decompress`` of the concatenated IDAT stream,
    then per-scanline reversal of all five PNG prediction filters
    (None/Sub/Up/Average/Paeth, RFC 2083 §6) — so mean/max statistics
    are over actual reconstructed pixel bytes, not compressed bits.
    Adam7-interlaced images decode for real too: seven independently
    filtered passes, each unfiltered with its own dims and scattered
    back onto the (x_start + i·x_step, y_start + j·y_step) grid.
    Palette-indexed (color type 3) resolves indices through PLTE so
    the statistics are over actual colors. Every legal PNG bit depth
    decodes: sub-byte grayscale/palette rows (1/2/4-bit, MSB-first
    packing) are unpacked to per-pixel samples, 16-bit samples are
    big-endian pairs; non-palette samples are normalized to the
    canonical 8-bit range (linear ``v·255/(2^d−1)`` rescale for
    shallow depths — exact, since 2^d−1 divides 255 — and the spec's
    high-byte reduction for 16-bit) so the statistics are comparable
    across depths."""
    import struct
    import zlib

    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = bit_depth = color_type = None
    interlace = 0
    idat = bytearray()
    plte = b""
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            if len(data) < 13:
                raise ValueError("truncated IHDR chunk")
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", data[:10]
            )
            interlace = data[12]
        elif ctype == b"PLTE":
            plte = bytes(data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # length + type + payload + crc
    if width is None:
        raise ValueError("PNG without IHDR")
    legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
             4: (8, 16), 6: (8, 16)}
    if (
        color_type not in legal
        or bit_depth not in legal[color_type]
        or interlace > 1
    ):
        raise ValueError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace}: not a legal IHDR combination"
        )
    ch = _PNG_CHANNELS[color_type]
    bits_pp = ch * bit_depth
    fbpp = max(1, bits_pp // 8)  # filter byte distance, RFC 2083 §6.2

    def _row_bytes(w: int) -> int:
        return (w * bits_pp + 7) // 8

    def _unpack_row(row: bytes, w: int) -> list[int]:
        """Packed scanline bytes → w·channels raw sample values."""
        ns = w * ch
        if bit_depth == 8:
            return list(row[:ns])
        if bit_depth == 16:
            return [
                (row[2 * k] << 8) | row[2 * k + 1] for k in range(ns)
            ]
        out, per_byte, mask = [], 8 // bit_depth, (1 << bit_depth) - 1
        for k in range(ns):
            b = row[k // per_byte]
            shift = 8 - bit_depth * (k % per_byte + 1)
            out.append((b >> shift) & mask)
        return out

    # The header (already validated) fixes the EXACT filtered-stream
    # length: one filter byte plus row_bytes per scanline, per pass.
    # Decompress with that as a hard cap so a decompression bomb (tiny
    # IDAT inflating to gigabytes against a small claimed geometry) is
    # cut off at expected+1 bytes instead of ballooning executor
    # memory — the inverse of the bit-flipped-IHDR bound below.
    if interlace == 0:
        expected = height * (1 + _row_bytes(width))
    else:
        expected = sum(
            ph * (1 + _row_bytes(pw))
            for x0, y0, dx, dy in _ADAM7
            for pw in [(width - x0 + dx - 1) // dx]
            for ph in [(height - y0 + dy - 1) // dy]
            if pw > 0 and ph > 0
        )
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"malformed PNG zlib stream: {exc}") from exc
    if len(raw) > expected:
        raise ValueError(
            "PNG IDAT stream inflates past the header's scanline claim"
        )
    # decompressobj().decompress returns partial output on a TRUNCATED
    # stream without raising (unlike one-shot zlib.decompress), so a
    # short stream would otherwise fall through to the geometry checks
    # and be misreported as a pixel-claim mismatch. Diagnose it at the
    # codec boundary: output at-or-below the expected length with no
    # end-of-stream marker means the deflate stream was cut off — the
    # == case (all scanline bytes emitted, but the stream ends before
    # the BFINAL block close / adler32 trailer, ADVICE r10) matters
    # because eof=True is also what guarantees zlib VERIFIED the
    # adler32 checksum: a cap of expected+1 was never hit at <=
    # expected bytes of output, so an un-reached trailer can only mean
    # missing input, never an early stop.
    if len(raw) <= expected and not dec.eof:
        raise ValueError("truncated PNG zlib stream")
    # Bound the header's pixel claim against what the decompressed
    # stream can actually carry BEFORE any width·height allocation —
    # a bit-flipped IHDR must raise, not trigger a multi-GB list.
    # Each pixel needs bits_pp bits of filtered data (filter bytes
    # only add to the stream), so this bound is conservative-safe.
    if width * height * bits_pp > len(raw) * 8:
        raise ValueError(
            "PNG header claims more pixels than the IDAT stream carries"
        )
    if interlace == 0:
        rb = _row_bytes(width)
        recon_b, p = _png_unfilter(raw, 0, rb, height, fbpp)
        if p != len(raw):
            raise ValueError("PNG scanline stream has wrong length")
        samples: list[int] = []
        for j in range(height):
            samples += _unpack_row(recon_b[j * rb : (j + 1) * rb], width)
    else:  # Adam7 — scatter per-sample so packed passes land right
        samples = [0] * (width * height * ch)
        p = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes no scanlines
            rb = _row_bytes(pw)
            sub, p = _png_unfilter(raw, p, rb, ph, fbpp)
            for j in range(ph):
                vals = _unpack_row(sub[j * rb : (j + 1) * rb], pw)
                row = (y0 + j * dy) * width
                for i in range(pw):
                    o = (row + x0 + i * dx) * ch
                    samples[o : o + ch] = vals[i * ch : (i + 1) * ch]
        if p != len(raw):
            raise ValueError("PNG scanline stream has wrong length")
    if color_type != 3:
        # normalize samples to the canonical 8-bit range: exact linear
        # rescale for shallow depths (2^d−1 divides 255), high-byte
        # reduction for 16-bit (the spec's scaling approximation)
        if bit_depth < 8:
            scale = 255 // ((1 << bit_depth) - 1)
            recon = bytearray(v * scale for v in samples)
        elif bit_depth == 16:
            recon = bytearray(v >> 8 for v in samples)
        else:
            recon = bytearray(samples)
    else:
        recon = bytearray(samples)  # palette indices at any depth
    if color_type == 3:
        # palette-indexed: the filtered bytes are PLTE indices, not
        # samples — resolve them to RGB so the statistics are over
        # actual colors (index statistics would be silently wrong).
        if len(plte) < 3 or len(plte) % 3:
            raise ValueError("palette PNG without a valid PLTE chunk")
        n = len(plte) // 3
        if any(ix >= n for ix in recon):
            raise ValueError("palette index out of PLTE range")
        out = bytearray(len(recon) * 3)
        for k, ix in enumerate(recon):
            out[3 * k : 3 * k + 3] = plte[3 * ix : 3 * ix + 3]
        recon = out
    return {
        "n_bytes": len(recon),
        "magic": "PNG",
        "width": width,
        "height": height,
        "mean_byte": (sum(recon) / len(recon)) if recon else 0.0,
        "max_byte": max(recon) if recon else 0,
    }


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           substr(hex(encode(text)), 1, 8) AS magic_hex,
           octet_length(encode(text)) - length(text) AS multibyte_extra
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column scalar pack: byte length, content hash, magic-
    prefix extraction — the metadata projection that runs *without*
    decoding payloads (column pruning means the scan never touches
    other columns; at 100 TB of media this is the cheap pass)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5("text").alias("payload_md5"),
        F.substring(F.hex(payload), 1, 8).alias("magic_hex"),
        (F.octet_length(payload) - F.length("text")).alias("multibyte_extra"),
    )


#: The one directory BOTH engines list for the read_blob-oracled
#: queries below. The harness registers table *views*, not the data
#: directory, so the oracle SQL cannot see sf_dir — instead of
#: hardcoding the path on only the oracle side (silently wrong if the
#: harness ever verifies at another scale), both the Spark query and
#: the oracle derive from this constant, making the comparison valid
#: at every sf.
BLOB_ORACLE_DIR = "/root/testdata/sf0.01"


@query(
    "multimodal_binaryfile_listing",
    oracle=f"""
    SELECT string_split(filename, '/')[-1] AS file_name,
           CAST(size AS BIGINT) AS n_bytes,
           md5(hex(content)) AS content_md5
    FROM read_blob('{BLOB_ORACLE_DIR}/*.parquet')
    """,
)
def multimodal_binaryfile_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 ``binaryFile`` source: ingest opaque files (the sf dir's own
    parquet files as stand-ins for media blobs) as (path, length,
    content) rows — the entry point for a media corpus at 100 TB,
    where each row is one object-store blob. Returns deterministic
    metadata (basename, byte length, content fingerprint).

    Oracled since round 6 against DuckDB's independent filesystem view
    (``read_blob``): every content byte participates via
    md5(hex(content)) — DuckDB 1.0 has no BLOB md5, but hex() of a
    blob is identical uppercase in both engines, so hashing the hex
    string is an equivalent full-content witness. Both sides list
    BLOB_ORACLE_DIR (not sf_dir) so the comparison stays valid at any
    verification scale."""
    files = spark.read.format("binaryFile").load(f"{BLOB_ORACLE_DIR}/*.parquet")
    return files.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.md5(F.hex("content")).alias("content_md5"),
    ).orderBy("file_name")


@query(
    "multimodal_binaryfile_meta",
    oracle=f"""
    SELECT string_split(filename, '/')[-1] AS file_name,
           CAST(size AS BIGINT) AS n_bytes
    FROM read_blob('{BLOB_ORACLE_DIR}/*.parquet')
    """,
)
def multimodal_binaryfile_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled twin of the ``binaryFile`` listing: name + byte length
    verified against DuckDB's independent filesystem view
    (``read_blob``) — proving the Spark source reads the same objects
    at the same sizes (the listing twin additionally content-hashes
    them). Both sides list BLOB_ORACLE_DIR (not sf_dir)
    so the comparison stays valid at any verification scale."""
    files = spark.read.format("binaryFile").load(f"{BLOB_ORACLE_DIR}/*.parquet")
    return files.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
    )


def _nonnull_docs(spark, sf_dir):
    """documents with content. A NULL text has no payload to
    synthesize or decode — the drop-null-content semantic every media
    pipeline here shares with its oracle (`WHERE text IS NOT NULL` in
    each base CTE): no content, no media row. One helper, not six
    copies, so the policy changes in exactly one place."""
    return load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )


def encode_simg(doc_id_col, text_col):
    """JVM-side SIMG container builder: magic + 2-byte big-endian
    width/height header + UTF-8 body. Width is payload-derived
    (doc_id mod 13 + 4), height = ⌈n_bytes / width⌉ — every field is a
    pure function of the row, so the container is reproducible by the
    DuckDB oracle."""
    body = F.encode(text_col, "UTF-8")
    width = (F.col(doc_id_col) % 13 + 4).cast("int")
    height = (
        (F.octet_length(body) + width - F.lit(1)) / width
    ).cast("int")
    be16 = lambda c: F.unhex(F.lpad(F.hex(c), 4, "0"))  # noqa: E731
    return F.concat(F.lit(SIMG_MAGIC), be16(width), be16(height), body)


def decode_image(payload: bytes) -> dict:
    """Pure-Python deterministic decode inside the Arrow-batched
    ``mapInPandas`` plumbing: SIMG containers are struct-parsed, PNGs
    are decoded for real via ``decode_png`` (stdlib zlib + filter
    reversal), baseline AND progressive JPEGs for real via
    ``jpeg_codec`` (stdlib huffman + IDCT), GIFs for real via
    ``gif_codec`` (stdlib LZW + palette resolution), RIFF/AVI video
    for real via ``avi_codec`` (stdlib container walk; BI_RGB DIB and
    MJPG frames — the stats are over the FIRST decoded frame, the
    image-shaped reading of a video payload), other RIFF members
    (compressed-codec AVI, WEBP) raise loudly, and any other payload
    falls back to raw byte statistics so the pipeline stays total."""
    import struct

    if payload[:4] in REAL_CODEC_MAGICS:
        if payload[8:12] == AVI_FORM:
            from .avi_codec import decode_avi_frames

            d = decode_avi_frames(payload, stride=1)
            first = memoryview(d["frames"][0][1]) if d["frames"] else b""
            return {
                "n_bytes": len(first),
                "magic": "AVI",
                "width": d["width"],
                "height": d["height"],
                "mean_byte": sum(first) / len(first) if first else 0.0,
                "max_byte": max(first) if first else 0,
            }
        raise NotImplementedError(
            "real decode of this RIFF form needs an external codec "
            "(WEBP / compressed-codec AVI); only WAVE-PCM and "
            "DIB/MJPG AVI are implemented in-stdlib"
        )
    if payload[:3] == JPEG_MAGIC:
        from .jpeg_codec import decode_jpeg

        # grayscale AND baseline YCbCr color (4:4:4/4:2:2/4:2:0,
        # restart intervals): 1-component pixels are the luma plane,
        # 3-component pixels are interleaved RGB — the byte statistics
        # are over whatever the stream actually carries.
        d = decode_jpeg(payload)
        px = memoryview(d["pixels"])
        return {
            "n_bytes": len(px),
            "magic": "JPEG",
            "width": d["width"],
            "height": d["height"],
            "mean_byte": sum(px) / len(px) if px else 0.0,
            "max_byte": max(px) if px else 0,
        }
    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif_codec import decode_gif

        # real LZW decode; statistics over palette-resolved RGB of all
        # frames (animation content, not just frame 1)
        return decode_gif(payload)
    if payload[:4] == SIMG_MAGIC:
        if len(payload) < 8:
            raise ValueError("truncated SIMG header")
        width, height = struct.unpack(">HH", payload[4:8])
        body = payload[8:]
        mv = memoryview(body)
        total = sum(mv)
        return {
            "n_bytes": len(body),
            "magic": "SIMG",
            "width": width,
            "height": height,
            "mean_byte": total / len(body) if body else 0.0,
            "max_byte": max(mv) if body else 0,
        }
    mv = memoryview(payload)
    total = sum(mv)
    return {
        "n_bytes": len(payload),
        "magic": payload[:4].decode("utf-8", errors="replace"),
        "width": 0,
        "height": 0,
        "mean_byte": total / len(payload) if payload else 0.0,
        "max_byte": max(mv) if payload else 0,
    }


@query(
    "multimodal_decode_features",
    oracle="""
    WITH b AS (
        SELECT doc_id,
               hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               CAST(doc_id % 13 + 4 AS INT) AS width
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           'SIMG' AS magic,
           width,
           CAST((n + width - 1) // width AS INT) AS height,
           list_aggregate(list_transform(range(1, n + 1),
               i -> CAST('0x' || substr(h, 2*i - 1, 2) AS INT)), 'sum')
             * 1.0 / n AS mean_byte,
           CAST(list_aggregate(list_transform(range(1, n + 1),
               i -> CAST('0x' || substr(h, 2*i - 1, 2) AS INT)), 'max')
             AS INT) AS max_byte
    FROM b
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 decode / feature-extract over binary payloads with
    ``mapInPandas``: Arrow-batched iterator of pandas frames, one
    Python worker per partition — the correct shape for CPU-heavy
    per-item work (image resize, frame sampling, audio features).
    Batch size follows ``spark.sql.execution.arrow.maxRecordsPerBatch``;
    at 100 TB the input is repartitioned so one batch of payloads fits
    executor memory.

    The payload is a real (synthetic) container: rows are wrapped in
    the SIMG header JVM-side (`encode_simg`), and the Python worker
    actually PARSES each payload (`decode_image`: struct-unpacked
    header + per-byte statistics over the body). The DuckDB oracle
    reconstructs every feature independently from the text column —
    byte sums via hex-pair arithmetic — so the full wrap→ship→decode
    loop is value-verified, not just shape-checked."""
    docs = (
        _nonnull_docs(spark, sf_dir)
        # single-file corpus → one input split; spread the per-item
        # decode CPU over every core before the Python stage (same
        # treatment as the JPEG/GIF/WAV twins — the 10× corpus ran
        # single-task without it)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", encode_simg("doc_id", "text").alias("payload"))
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[
                [
                    "doc_id",
                    "n_bytes",
                    "magic",
                    "width",
                    "height",
                    "mean_byte",
                    "max_byte",
                ]
            ]

    return docs.mapInPandas(extract, schema=FEATURE_SCHEMA)


FRAME_BYTES = 256  # stand-in "frame" granularity for the video payload
FRAME_SCHEMA = (
    "doc_id long, frame_idx int, n_frames int, frame_mean double,"
    " thumb_hex string"
)


def sample_frames_stub(payload: bytes, max_frames: int = 8) -> list[dict]:
    """Frame-sampling with a REAL path and a stand-in path, both
    deterministic in payload alone (retries / speculative tasks
    produce identical rows at any parallelism):

    - RIFF/AVI payloads (since r13): real container + frame decode via
      ``avi_codec`` — every stride-th frame's mean is over its DECODED
      pixels (DIB rows unpadded and RGB-ordered, MJPG frames through
      the full JPEG entropy layer), thumbnail from the decoded pixel
      bytes. PNG/JPEG payloads (single images in a video column) and
      non-AVI RIFF (WAVE audio here, WEBP) stay loudly refused.
    - any other payload: the synthetic stand-in — fixed 256-byte
      'frames', mean-byte feature, 4-byte strided thumbnail — which
      keeps the oracled 1→N expansion value-checkable in SQL."""
    if payload[:4] == b"RIFF" and payload[8:12] == AVI_FORM:
        from .avi_codec import decode_avi_frames, parse_avi

        # parse once (container walk only, no pixel work) to size the
        # stride, then decode ONLY the sampled frames
        n_frames = max(1, len(parse_avi(payload)["frames"]))
        stride = max(1, n_frames // max_frames)
        meta = decode_avi_frames(payload, stride=stride)
        out = []
        for idx, px in meta["frames"]:
            mv = memoryview(px)
            step = max(1, len(px) // 4)
            out.append(
                {
                    "frame_idx": idx,
                    "n_frames": n_frames,
                    "frame_mean": (sum(mv) / len(px)) if px else 0.0,
                    "thumb_hex": bytes(px[::step][:4]).hex(),
                }
            )
        return out
    if payload[:4] in (b"\x89PNG", b"\xff\xd8\xff\xe0", b"RIFF"):
        raise NotImplementedError(
            "single-image or non-AVI RIFF payload in the video column; "
            "real AVI decodes via avi_codec, the rest stays loud"
        )
    n_frames = max(1, -(-len(payload) // FRAME_BYTES))
    stride = max(1, n_frames // max_frames)
    out = []
    for idx in range(0, n_frames, stride):
        frame = payload[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
        mv = memoryview(frame)
        step = max(1, len(frame) // 4)
        out.append(
            {
                "frame_idx": idx,
                "n_frames": n_frames,
                "frame_mean": (sum(mv) / len(frame)) if frame else 0.0,
                "thumb_hex": frame[::step][:4].hex(),
            }
        )
    return out


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH b AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n
        FROM documents WHERE text IS NOT NULL
    ),
    f AS (
        SELECT doc_id, h, n,
               CAST(greatest(1, (n + 255) // 256) AS INT) AS n_frames
        FROM b
    ),
    g AS (
        SELECT doc_id, h, n, n_frames,
               CAST(greatest(1, n_frames // 8) AS INT) AS stride
        FROM f
    ),
    frames AS (
        SELECT doc_id, h, n, n_frames,
               CAST(idx AS INT) AS frame_idx,
               least(n, (idx + 1) * 256) - idx * 256 AS flen
        FROM g, unnest(range(0, n_frames, stride)) AS t(idx)
    )
    SELECT doc_id, frame_idx, n_frames,
           list_aggregate(list_transform(range(1, flen + 1),
               i -> CAST('0x' || substr(h, 2*(frame_idx*256 + i) - 1, 2)
                    AS INT)), 'sum') * 1.0 / flen AS frame_mean,
           array_to_string(list_transform(
               list_filter(range(0, 4),
                           j -> j * greatest(1, flen // 4) < flen),
               j -> lower(substr(h,
                    2*(frame_idx*256 + j * greatest(1, flen // 4)) + 1,
                    2))), '') AS thumb_hex
    FROM frames
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 frame-sampling over 'video' payloads with ``mapInPandas`` in
    its row-expanding form: each input row yields a variable number of
    output rows (one per sampled frame) — the shape that matters for
    video pipelines, where the 1→N expansion must happen executor-side
    (never a driver-side loop) and downstream repartitioning rebalances
    the exploded rows. The frame 'decode' operates on synthetic frames
    (see sample_frames_stub), but every emitted value — frame index,
    per-frame byte mean, strided thumbnail hex — is independently
    reconstructed by the DuckDB oracle from the text column, so the
    expansion is value-verified, not just shape-checked."""
    docs = (
        _nonnull_docs(spark, sf_dir)
        # spread the per-item frame walk across cores (see the
        # decode-features twin above for the single-split rationale)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    )

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for f in sample_frames_stub(payload):
                    rows.append({"doc_id": doc_id, **f})
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "n_frames", "frame_mean", "thumb_hex"
                ],
            )

    return docs.mapInPandas(expand, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Audio: real RIFF/WAVE PCM via the stdlib `wave` reader
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, duration_ms long,"
    " mean_sample double, rms double, peak int, zero_crossings long"
)


def _le_bytes(c, n_bytes: int):
    """Little-endian byte string of an integer column, built JVM-side:
    big-endian hex, zero-padded, byte pairs re-concatenated in reverse
    order, unhexed. Pure expression — reproducible by the oracle."""
    hx = F.lpad(F.hex(c.cast("bigint")), n_bytes * 2, "0")
    pairs = [
        F.substring(hx, 2 * i + 1, 2) for i in reversed(range(n_bytes))
    ]
    return F.unhex(F.concat(*pairs))


def encode_wav(doc_id_col, text_col):
    """JVM-side canonical 44-byte RIFF/WAVE PCM container: 8-bit mono
    with a doc-derived sample rate (8/12/16 kHz by doc_id mod 3) and
    the UTF-8 text bytes as the sample stream — a REAL WAV file any
    player or the stdlib ``wave`` reader accepts, with every header
    field a pure function of the row so the DuckDB oracle can
    reconstruct the decoded features independently."""
    body = F.encode(text_col, "UTF-8")
    n = F.octet_length(body)
    rate = (F.col(doc_id_col) % 3 * 4000 + 8000).cast("int")
    return F.concat(
        F.lit(b"RIFF"),
        _le_bytes(n + 36, 4),           # RIFF chunk size
        F.lit(b"WAVEfmt "),
        _le_bytes(F.lit(16), 4),        # fmt chunk size
        _le_bytes(F.lit(1), 2),         # PCM
        _le_bytes(F.lit(1), 2),         # mono
        _le_bytes(rate, 4),             # sample rate
        _le_bytes(rate, 4),             # byte rate (1 byte/sample mono)
        _le_bytes(F.lit(1), 2),         # block align
        _le_bytes(F.lit(8), 2),         # bits per sample
        F.lit(b"data"),
        _le_bytes(n, 4),                # data chunk size
        body,
    )


def decode_wav(payload: bytes) -> dict:
    """Real WAV decode with only the stdlib ``wave`` reader (+ NumPy
    for the wide-sample math): parses the RIFF/WAVE container, checks
    the PCM format fields, reads the raw sample frames, and derives
    the features an audio curation pipeline filters on — duration,
    mean level, RMS energy, peak, and midline (zero) crossings.

    All integer PCM widths ``wave`` can frame are decoded: 8-bit
    (unsigned, midline 128), 16/24/32-bit (signed little-endian,
    midline 0). Multi-channel audio is mixed down per frame by the
    arithmetic channel mean before the level statistics — the standard
    mono fold — while ``peak`` stays a *raw per-channel* extreme so
    clipping on one channel is never averaged away. Only compressed
    WAV (µ-law/ADPCM/float) still raises: a real codec dependency.

    The 8-bit-mono arithmetic is kept on the original pure-stdlib
    branch, byte-for-byte identical to what the frozen
    ``multimodal_audio_features`` DuckDB oracle reconstructs.
    """
    import io
    import math
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as w:
            nch = w.getnchannels()
            sw = w.getsampwidth()
            rate = w.getframerate()
            n = w.getnframes()
            samples = w.readframes(n)
    except wave.Error as exc:
        if "unknown format" in str(exc):
            # recognized RIFF/WAVE but a compressed codec id
            # (µ-law/ADPCM/float): decoding needs a real codec
            raise NotImplementedError(f"compressed WAV: {exc}") from exc
        raise ValueError(f"malformed WAV container ({exc})") from exc
    except EOFError as exc:
        raise ValueError("malformed WAV container (truncated)") from exc
    except RuntimeError as exc:
        # the stdlib wave chunk reader raises a BARE RuntimeError (no
        # message) on a seek past the chunk end — convert only that
        # exact shape; a RuntimeError carrying a message is a genuine
        # programming error and must not be relabeled as bad input
        if str(exc):
            raise
        raise ValueError("malformed WAV container (truncated)") from exc
    if rate <= 0 or nch <= 0 or sw <= 0:
        raise ValueError("malformed WAV header (non-positive fmt field)")
    # a truncated data chunk yields fewer frames than the header claims:
    # derive n from the bytes actually present so every feature is
    # computed over the same (complete) frames
    n = min(n, len(samples) // (nch * sw))
    samples = samples[: n * nch * sw]
    if sw == 1 and nch == 1:
        mv = memoryview(samples)
        total = sum(mv)
        sumsq = sum((s - 128) * (s - 128) for s in mv)
        zc = sum(
            1 for i in range(1, len(mv)) if (mv[i] >= 128) != (mv[i - 1] >= 128)
        )
        return {
            "sample_rate": rate,
            "n_samples": n,
            "duration_ms": n * 1000 // rate,
            "mean_sample": total / n if n else 0.0,
            "rms": math.sqrt(sumsq / n) if n else 0.0,
            "peak": max(mv) if n else 0,
            "zero_crossings": zc,
        }

    import numpy as np

    if sw == 1:
        arr = np.frombuffer(samples, dtype=np.uint8).astype(np.int64)
        mid = 128
    elif sw == 2:
        arr = np.frombuffer(samples, dtype="<i2").astype(np.int64)
        mid = 0
    elif sw == 3:
        b = np.frombuffer(samples, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        arr = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        arr = np.where(arr >= 1 << 23, arr - (1 << 24), arr)
        mid = 0
    elif sw == 4:
        arr = np.frombuffer(samples, dtype="<i4").astype(np.int64)
        mid = 0
    else:  # pragma: no cover - wave itself rejects other widths
        raise NotImplementedError(f"PCM sample width {sw} bytes")
    arr = arr.reshape(n, nch)
    mixed = arr.mean(axis=1) if nch > 1 else arr[:, 0].astype(np.float64)
    dev = mixed - mid
    ge = mixed >= mid
    return {
        "sample_rate": rate,
        "n_samples": n,
        "duration_ms": n * 1000 // rate,
        "mean_sample": float(mixed.mean()) if n else 0.0,
        # raw per-channel extreme: unsigned max for 8-bit, |signed| max
        # for wider widths — one clipped channel must stay visible
        "peak": int(arr.max() if sw == 1 else np.abs(arr).max()) if n else 0,
        "rms": float(np.sqrt((dev * dev).mean())) if n else 0.0,
        "zero_crossings": int((ge[1:] != ge[:-1]).sum()),
    }


@query(
    "multimodal_audio_features",
    oracle="""
    WITH b AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               CAST(doc_id % 3 * 4000 + 8000 AS INT) AS rate
        FROM documents WHERE text IS NOT NULL
    ),
    s AS (
        SELECT doc_id, rate, n,
               list_transform(range(1, n + 1),
                   i -> CAST('0x' || substr(h, 2*i - 1, 2) AS INT)) AS smp
        FROM b
    )
    SELECT doc_id,
           rate AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
           list_aggregate(smp, 'sum') * 1.0 / n AS mean_sample,
           sqrt(list_aggregate(list_transform(smp,
                    x -> CAST((x - 128) * (x - 128) AS DOUBLE)), 'sum') / n)
               AS rms,
           CAST(list_aggregate(smp, 'max') AS INT) AS peak,
           CAST(len(list_filter(range(2, n + 1),
                    i -> (smp[i] >= 128) <> (smp[i-1] >= 128))) AS BIGINT)
               AS zero_crossings
    FROM s
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 audio path made REAL: rows are wrapped JVM-side into genuine
    RIFF/WAVE PCM containers (``encode_wav`` — a file any audio tool
    opens), shipped as binary columns, and decoded executor-side by the
    stdlib ``wave`` reader inside Arrow-batched ``mapInPandas``
    (``decode_wav``). The features are what audio curation filters on
    (duration, mean level, RMS energy, peak, midline crossings), and
    the DuckDB oracle reconstructs every one independently from the
    text column via hex-pair arithmetic — so the full
    encode→ship→codec-parse→feature loop is value-verified
    cross-engine. Exactness: sample sums and crossing counts are
    integers; mean/RMS perform the identical double divisions and one
    correctly-rounded sqrt in both engines.

    This closed the audio half of the former RIFF honest gap: WAV PCM
    needs no external codec — and since r13 the video half is closed
    too for uncompressed-DIB and MJPG AVI (``avi_codec``); only
    compressed-codec AVI and WEBP still raise loudly. At 100 TB the
    shape is unchanged: opaque
    binary column + typed metadata, Arrow batches sized by
    ``maxRecordsPerBatch``, decode parallelism ∝ partitions."""
    docs = (
        _nonnull_docs(spark, sf_dir)
        # one small parquet file → one input split; spread the per-item
        # codec CPU over every core before the Python stage (explicit N
        # — exempt from AQE's byte-based coalescer), same treatment as
        # the JPEG/GIF twins (measured: the 10× corpus ran single-task
        # at 4.3 s without this)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", encode_wav("doc_id", "text").alias("payload"))
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_wav(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[
                [
                    "doc_id",
                    "sample_rate",
                    "n_samples",
                    "duration_ms",
                    "mean_sample",
                    "rms",
                    "peak",
                    "zero_crossings",
                ]
            ]

    return docs.mapInPandas(extract, schema=AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual image hash (aHash) over decoded pixels
# ---------------------------------------------------------------------------

AHASH_SCHEMA = "doc_id long, width int, height int, n_pixels long, ahash string"


def ahash_bits(body: bytes, width: int) -> tuple[int, int, str]:
    """8×8 average-hash over a grayscale pixel grid: block-mean
    downsample (floor bucket mapping, partial last row included),
    bit = block mean ≥ global mean decided by exact integer
    cross-multiplication (sum_b · N ≥ total · n_b — no division, no
    float), empty blocks (width < 8 leaves unhit columns) emit 0.
    Returns (height, n_pixels, 64-char bitstring row-major)."""
    n = len(body)
    h = (n + width - 1) // width
    sums = [0] * 64
    cnts = [0] * 64
    total = 0
    for p, val in enumerate(body):
        r, c = p // width, p % width
        idx = ((r * 8) // h) * 8 + (c * 8) // width
        sums[idx] += val
        cnts[idx] += 1
        total += val
    bits = "".join(
        "1" if cnts[i] and sums[i] * n >= total * cnts[i] else "0"
        for i in range(64)
    )
    return h, n, bits


@query(
    "multimodal_image_ahash",
    oracle="""
    WITH b AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n,
               CAST(doc_id % 13 + 4 AS INT) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    g AS (SELECT *, CAST((n + w - 1) // w AS INT) AS h FROM b),
    px AS (
        SELECT doc_id, w, h, n, p,
               CAST('0x' || substr(hx, 2*p + 1, 2) AS INT) AS val,
               ((p // w) * 8) // h * 8 + ((p % w) * 8) // w AS idx
        FROM g, unnest(range(0, n)) AS t(p)
    ),
    blocks AS (
        SELECT doc_id, idx, SUM(val) AS s, COUNT(*) AS cnt
        FROM px GROUP BY doc_id, idx
    ),
    tot AS (
        SELECT doc_id, SUM(val) AS st, CAST(COUNT(*) AS BIGINT) AS nt
        FROM px GROUP BY doc_id
    ),
    bits AS (
        SELECT t.doc_id, r.i AS idx,
               CASE WHEN bl.cnt IS NOT NULL AND bl.s * t.nt >= t.st * bl.cnt
                    THEN '1' ELSE '0' END AS bit
        FROM tot t
        CROSS JOIN (SELECT unnest(range(0, 64)) AS i) r
        LEFT JOIN blocks bl ON bl.doc_id = t.doc_id AND bl.idx = r.i
    )
    SELECT g.doc_id, g.w AS width, g.h AS height,
           CAST(g.n AS BIGINT) AS n_pixels,
           (SELECT array_to_string(list(bit ORDER BY idx), '')
            FROM bits WHERE bits.doc_id = g.doc_id) AS ahash
    FROM g
    """,
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashing (average hash) over REAL decoded
    pixels: each SIMG container is struct-parsed executor-side
    (``decode_image`` path) and its pixel grid block-mean-downsampled
    to an 8×8 bit matrix — the standard cheap near-duplicate-image
    key (two images whose aHashes are within a few Hamming bits are
    usually crops/re-encodes of each other, so the hash is the bucket
    key image dedup joins on; exact-duplicate payloads collide on all
    64 bits by construction).

    Exactness: every bit is decided by integer cross-multiplication
    (block_sum·N ≥ total·block_count) — no float anywhere — so the
    64-char bitstring is hash-stable cross-engine, and the DuckDB
    oracle reconstructs the full decode→downsample→threshold chain
    from the text column via hex-pair arithmetic. Empty blocks (the
    width-<8 payloads leave unhit grid columns) are pinned to 0 in
    both engines.

    At 100 TB: one mapInPandas pass over the media column (Arrow
    batches, parallelism ∝ partitions), output one 64-bit key per
    image; the dedup join is then a plain shuffle on the hash — the
    same X1 exact-dedup shape, applied to pixels instead of text."""
    docs = (
        _nonnull_docs(spark, sf_dir)
        # the per-byte aHash grid walk is the heaviest pure-Python
        # per-item loop in the media family — spread it (10× corpus
        # measured 4.5 s single-task without this)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", encode_simg("doc_id", "text").alias("payload"))
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                if payload[:4] != SIMG_MAGIC:
                    raise ValueError("ahash expects SIMG containers here")
                width, _ = _struct.unpack(">HH", payload[4:8])
                h, n, bits = ahash_bits(payload[8:], width)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": width,
                        "height": h,
                        "n_pixels": n,
                        "ahash": bits,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_pixels", "ahash"]
            )

    return docs.mapInPandas(extract, schema=AHASH_SCHEMA)


_AHASH_SQL = """
    WITH b AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n,
               CAST(doc_id % 13 + 4 AS INT) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    g AS (SELECT *, CAST((n + w - 1) // w AS INT) AS h FROM b),
    px AS (
        SELECT doc_id, w, h, n, p,
               CAST('0x' || substr(hx, 2*p + 1, 2) AS INT) AS val,
               ((p // w) * 8) // h * 8 + ((p % w) * 8) // w AS idx
        FROM g, unnest(range(0, n)) AS t(p)
    ),
    blocks AS (
        SELECT doc_id, idx, SUM(val) AS s, COUNT(*) AS cnt
        FROM px GROUP BY doc_id, idx
    ),
    tot AS (
        SELECT doc_id, SUM(val) AS st, CAST(COUNT(*) AS BIGINT) AS nt
        FROM px GROUP BY doc_id
    ),
    bits AS (
        SELECT t.doc_id, r.i AS idx,
               CASE WHEN bl.cnt IS NOT NULL AND bl.s * t.nt >= t.st * bl.cnt
                    THEN '1' ELSE '0' END AS bit
        FROM tot t
        CROSS JOIN (SELECT unnest(range(0, 64)) AS i) r
        LEFT JOIN blocks bl ON bl.doc_id = t.doc_id AND bl.idx = r.i
    ),
    hashes AS (
        SELECT g.doc_id,
               (SELECT array_to_string(list(bit ORDER BY idx), '')
                FROM bits WHERE bits.doc_id = g.doc_id) AS ahash
        FROM g
    )
"""


@query(
    "multimodal_ahash_dup_candidates",
    oracle=_AHASH_SQL
    + """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.ahash,
           (SELECT md5(da.text) = md5(db.text)
            FROM documents da, documents db
            WHERE da.doc_id = a.doc_id AND db.doc_id = b.doc_id)
               AS same_payload
    FROM hashes a JOIN hashes b
      ON a.ahash = b.ahash AND a.doc_id < b.doc_id
    """,
)
def multimodal_ahash_dup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image-dedup join the aHash exists for: documents whose
    decoded pixel grids produce the SAME 64-bit average hash are
    near-duplicate-image candidates — one equi-join on the hash (the
    X1 exact-dedup shape applied to pixels), never pixels², with
    ``same_payload`` distinguishing true byte-identical duplicates
    from perceptual-only collisions for the downstream keep/drop
    policy. At 100 TB the hash table is 64 bits/image and the join
    shuffles only hash+id — pixel data never moves after the decode
    pass."""
    hashes = multimodal_image_ahash(spark, sf_dir).select("doc_id", "ahash")
    payload = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("pmd5")
    )
    # both self-join sides read the same (doc_id, ahash, pmd5) table —
    # materialize it once: without the checkpoint each side re-runs
    # the ENTIRE decode→downsample mapInPandas pass (Spark does not
    # dedupe common subplans), doubling the heaviest pure-Python media
    # loop for ~24 bytes/row of output (guide §4 "pay the Python
    # boundary once" / §8 "decide with small rows"; A/B in
    # OPTIMIZATION_r15.md)
    sides = iter_checkpoint(hashes.join(payload, "doc_id"))
    a = sides.select(
        F.col("doc_id").alias("doc_a"), "ahash", F.col("pmd5").alias("md5_a")
    )
    b = sides.select(
        F.col("doc_id").alias("doc_b"),
        F.col("ahash").alias("ahash_b"),
        F.col("pmd5").alias("md5_b"),
    )
    return (
        a.join(b, (F.col("ahash") == F.col("ahash_b")) & (F.col("doc_a") < F.col("doc_b")))
        .select(
            "doc_a",
            "doc_b",
            "ahash",
            (F.col("md5_a") == F.col("md5_b")).alias("same_payload"),
        )
    )


SILENCE_TAU = 24  # |sample − 128| ≤ τ counts as silence (8-bit PCM midline)


@query(
    "multimodal_audio_silence_segments",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents
        -- drop-null-content, mirrored in the Spark side (r14
        -- null-heavy sweep): a tombstoned clip has no sample stream
        -- to segment
        WHERE text IS NOT NULL
    ),
    px AS (
        SELECT doc_id, n, p,
               abs(CAST('0x' || substr(hx, 2*p + 1, 2) AS INT) - 128)
                   <= {SILENCE_TAU} AS silent
        FROM b, unnest(range(0, n)) AS t(p)
    ),
    isl AS (
        SELECT doc_id, n, p,
               p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        FROM px WHERE silent
    ),
    runs AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM isl GROUP BY doc_id, grp
    )
    SELECT b.doc_id,
           CAST(b.n AS BIGINT) AS n_samples,
           COALESCE(CAST((SELECT SUM(run_len) FROM runs r
                          WHERE r.doc_id = b.doc_id) AS BIGINT), 0)
               AS n_silent,
           COALESCE(CAST((SELECT COUNT(*) FROM runs r
                          WHERE r.doc_id = b.doc_id) AS BIGINT), 0)
               AS n_segments,
           COALESCE(CAST((SELECT MAX(run_len) FROM runs r
                          WHERE r.doc_id = b.doc_id) AS BIGINT), 0)
               AS max_run,
           COALESCE(CAST((SELECT SUM(run_len) FROM runs r
                          WHERE r.doc_id = b.doc_id) AS BIGINT), 0)
               * 1000000 // b.n AS silent_ppm
    FROM b
    """,
)
def multimodal_audio_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence segmentation over the 8-bit PCM sample stream (the VAD
    primitive behind audio trimming and speech-segment extraction):
    samples within τ of the midline are 'silent', consecutive silent
    samples form segments, and each clip reports segment count, total
    and longest silence, and the exact-ppm silent fraction — the
    features an audio curation pipeline thresholds to drop dead air or
    split long recordings. All integer arithmetic over actual sample
    bytes; the oracle recomputes the full segmentation from hex pairs
    with the gaps-and-islands rewrite.

    Scale: the segmentation is a single map-side array fold per clip
    (run-length state is one 4-field struct), so there is NO
    per-sample explode, window, or shuffle — the only exchange is the
    explicit repartition that spreads clips across cores (the input is
    one small file, and without it the whole CPU-dense fold lands on a
    single task; measured 2.4 s → 0.5 s at sf0.1). Parallelism ∝
    clips, state ∝ O(1) per clip."""
    docs = load_table(spark, sf_dir, "documents")
    # drop-null-content (r14 null-heavy sweep), mirrored in the oracle:
    # same posture as the six decode pipelines from the r12 null axis
    b = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.hex(F.encode("text", "UTF-8")).alias("hx"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n"),
    ).repartition(32, "doc_id")
    # chunked hex walk: substring(hx, offset, 2) rescans the string to
    # find the char offset, so the per-sample form is O(n²) per clip
    # (measured 4.5 s at sf0.1) — cutting the hex into 128-char chunks
    # first makes each inner substring O(chunk); flatten preserves
    # sample order, which is all the run-length fold needs
    arr = (
        "flatten(transform("
        " transform(sequence(1, CAST(ceil(n / 64.0) AS INT)),"
        "           c -> substring(hx, (c - 1) * 128 + 1, 128)),"
        " ch -> transform(sequence(1, length(ch) DIV 2),"
        "        i -> abs(conv(substring(ch, 2*i - 1, 2), 16, 10)"
        f"               - 128) <= {SILENCE_TAU})))"
    )
    # one left-to-right fold carries (current run, best run, segment
    # count, silent count); a segment opens when a silent sample
    # follows a non-silent accumulator state (cur = 0)
    stats = (
        "aggregate("
        f" {arr},"
        " struct(CAST(0 AS BIGINT) AS cur, CAST(0 AS BIGINT) AS best,"
        "        CAST(0 AS BIGINT) AS nseg, CAST(0 AS BIGINT) AS nsil),"
        " (acc, x) -> struct("
        "   IF(x, acc.cur + 1, CAST(0 AS BIGINT)) AS cur,"
        "   greatest(acc.best, IF(x, acc.cur + 1, CAST(0 AS BIGINT))) AS best,"
        "   acc.nseg + IF(x AND acc.cur = 0, 1, 0) AS nseg,"
        "   acc.nsil + IF(x, 1, 0) AS nsil))"
    )
    return b.select(
        "doc_id",
        F.col("n").cast("long").alias("n_samples"),
        F.expr(stats).alias("s"),
    ).select(
        "doc_id",
        "n_samples",
        F.col("s.nsil").alias("n_silent"),
        F.col("s.nseg").alias("n_segments"),
        F.col("s.best").alias("max_run"),
        F.expr("CAST(s.nsil * 1000000 div n_samples AS BIGINT)").alias(
            "silent_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Real baseline JPEG decode (pure stdlib — operators/jpeg_codec.py)
# ---------------------------------------------------------------------------

JPEG_SCHEMA = (
    "doc_id long, width int, height int, n_blocks int, mean_px double,"
    " min_px int, max_px int, pixel_sum long, blk_weighted long"
)


def encode_jpeg_payload(doc_id: int, body: bytes) -> bytes:
    """Deterministic grayscale baseline JPEG for one row: a
    (doc_id%4+2) × (doc_id%3+2) grid of 8×8 blocks, block k constant at
    byte k of the payload (padded past the end by (doc_id + 13·k) mod
    256). Each flat block quantizes to a single DC coefficient; with
    the DC quantization step pinned to 8 (exactly the IDCT's 1/8 DC
    gain, `jpeg_codec.QTAB_ZZ`) the lossy transform is bit-exact for
    this corpus — which is what lets the DuckDB oracle predict every
    decoded pixel from hex-pair arithmetic while the DECODER stays a
    fully general baseline implementation."""
    from .jpeg_codec import encode_jpeg_gray_coeffs

    wb = doc_id % 4 + 2
    hb = doc_id % 3 + 2
    vals = [
        body[k] if k < len(body) else (doc_id + 13 * k) % 256
        for k in range(wb * hb)
    ]
    blocks = [[v - 128] + [0] * 63 for v in vals]
    return encode_jpeg_gray_coeffs(blocks, wb * 8, hb * 8)


def jpeg_features(payload: bytes) -> dict:
    """Decode a baseline JPEG (`jpeg_codec.decode_jpeg_gray`) and
    derive the features an image-curation pass filters on, all from
    the actual reconstructed pixels: dimensions, block count, mean /
    min / max pixel, the full pixel sum (a witness that EVERY pixel
    decoded, not one per block), and a position-weighted sum over the
    blocks' top-left pixels (a witness of block scan ORDER)."""
    from .jpeg_codec import decode_jpeg_gray

    d = decode_jpeg_gray(payload)
    w, h, px = d["width"], d["height"], memoryview(d["pixels"])
    wb, hb = w // 8, h // 8
    blk_weighted = sum(
        (k + 1) * px[(k // wb) * 8 * w + (k % wb) * 8] for k in range(wb * hb)
    )
    total = sum(px)
    return {
        "width": w,
        "height": h,
        "n_blocks": wb * hb,
        "mean_px": total / (w * h),
        "min_px": min(px),
        "max_px": max(px),
        "pixel_sum": total,
        "blk_weighted": blk_weighted,
    }


@query(
    "multimodal_jpeg_features",
    oracle="""
    WITH b AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               CAST(doc_id % 4 + 2 AS INT) AS wb,
               CAST(doc_id % 3 + 2 AS INT) AS hb
        FROM documents WHERE text IS NOT NULL
    ),
    v AS (
        SELECT doc_id, wb, hb, wb * hb AS nb,
               list_transform(range(0, wb * hb),
                   k -> CASE WHEN k < n
                             THEN CAST('0x' || substr(h, 2*k + 1, 2) AS INT)
                             ELSE CAST((doc_id + 13 * k) % 256 AS INT) END)
                   AS vals
        FROM b
    )
    SELECT doc_id,
           CAST(wb * 8 AS INT) AS width,
           CAST(hb * 8 AS INT) AS height,
           CAST(nb AS INT) AS n_blocks,
           list_aggregate(vals, 'sum') * 1.0 / nb AS mean_px,
           CAST(list_aggregate(vals, 'min') AS INT) AS min_px,
           CAST(list_aggregate(vals, 'max') AS INT) AS max_px,
           CAST(list_aggregate(vals, 'sum') * 64 AS BIGINT) AS pixel_sum,
           CAST(list_aggregate(list_transform(range(1, nb + 1),
                    k -> k * vals[k]), 'sum') AS BIGINT) AS blk_weighted
    FROM v
    """,
)
def multimodal_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 JPEG path made REAL with only the stdlib: rows are encoded
    into genuine baseline-sequential grayscale JPEGs (SOI / JFIF APP0 /
    DQT / SOF0 / DHT / SOS / EOI, canonical-Huffman entropy data with
    byte stuffing — `jpeg_codec.encode_jpeg_gray_coeffs`), shipped as a
    binary column across an Arrow batch boundary, then parsed back by
    the fully general baseline decoder (`jpeg_codec.decode_jpeg_gray`:
    segment walk, table reconstruction from the stream, Huffman DC+AC
    decode, dequantize, de-zigzag, float IDCT, clamp). Two separate
    ``mapInPandas`` stages — encode and decode never share Python
    state; every table the decoder uses it read from the payload.

    Exactness contract: the corpus images are blockwise-constant with
    the DC quantization step pinned at 8, so the normally-lossy
    DCT roundtrip is bit-exact here and the DuckDB oracle reconstructs
    all eight features from hex-pair arithmetic (`encode_jpeg_payload`
    for the layout). The decoder's general AC/ZRL/stuffing paths are
    exercised by pytest against an independent NumPy cosine-matrix
    IDCT, as are progressive (SOF2) decode, baseline YCbCr color
    (interleaved MCUs, subsampling, restart intervals), and the JFIF
    color transform. Arithmetic coding, lossless/12-bit SOFs,
    compressed-codec AVI, and WEBP remain the loud honest gaps
    (DIB/MJPG AVI decodes for real via ``avi_codec`` since r13).

    Scale: identical shape to the other decode queries — opaque binary
    column + typed metadata, per-item CPU inside Arrow-batched
    ``mapInPandas``, parallelism ∝ partitions, no shuffle at all."""
    docs = (
        _nonnull_docs(spark, sf_dir)
        .select("doc_id", F.encode("text", "UTF-8").alias("body"))
        # the corpus is one small parquet file → one input split; the
        # per-item codec CPU is the cost here, so spread the rows over
        # every core before the Python stages (explicit N — exempt
        # from AQE's byte-based coalescer; measured 10.5 → ~1 s)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        encode_jpeg_payload(int(i), bytes(b))
                        for i, b in zip(pdf["doc_id"], pdf["body"])
                    ],
                }
            )

    jpegs = docs.mapInPandas(enc, schema="doc_id long, payload binary")

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [jpeg_features(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return jpegs.mapInPandas(dec, schema=JPEG_SCHEMA)


# ---------------------------------------------------------------------------
# Real GIF decode (pure stdlib LZW — operators/gif_codec.py)
# ---------------------------------------------------------------------------

GIF_SCHEMA = (
    "doc_id long, width int, height int, interlaced boolean, n_bytes long,"
    " pixel_sum long, weighted_r long, mean_byte double, max_byte int"
)

GIF_COLORS = 16


def encode_gif_payload(doc_id: int, body: bytes) -> bytes:
    """Deterministic single-frame GIF for one row: a (doc_id%5+3) ×
    (doc_id%4+3) image whose pixel k carries palette index
    ``byte_k % 16`` (padded past the end by (doc_id + 7·k) mod 256),
    under a 16-entry palette whose channel values are linear in
    (doc_id, index). Odd doc_ids store rows in four-pass interlaced
    order; every third doc ships the palette as a LOCAL color table
    (no global one) — both container variants flow through the same
    decoder. GIF's palette indirection is lossless, so unlike JPEG no
    quantization pinning is needed for the oracle to predict every
    decoded RGB byte from hex-pair arithmetic."""
    from .gif_codec import encode_gif, interlace_row_order

    w = doc_id % 5 + 3
    h = doc_id % 4 + 3
    idx = bytes(
        (body[k] if k < len(body) else (doc_id + 7 * k) % 256) % GIF_COLORS
        for k in range(w * h)
    )
    palette = bytes(
        c % 256
        for i in range(GIF_COLORS)
        for c in (doc_id * 7 + i * 13, doc_id * 11 + i * 17, doc_id * 3 + i * 29)
    )
    interlaced = doc_id % 2 == 1
    stored = (
        b"".join(idx[y * w : (y + 1) * w] for y in interlace_row_order(h))
        if interlaced
        else idx
    )
    frame: dict = {"indices": stored, "interlaced": interlaced}
    gct = palette
    if doc_id % 3 == 0:
        frame["lct"] = palette
        gct = b""
    return encode_gif(w, h, [frame], gct=gct)


def gif_features(payload: bytes) -> dict:
    """Decode a GIF (`gif_codec.decode_gif_frames`) and derive curation
    features from the actual palette-resolved pixels: dimensions, the
    parsed interlace flag, full RGB byte sum (witness that every pixel
    decoded), a position-weighted red-channel sum (witness of pixel
    ORDER — a deinterlace slip flips it), mean and max byte."""
    from .gif_codec import decode_gif_frames

    d = decode_gif_frames(payload)
    f = d["frames"][0]
    rgb = memoryview(f["rgb"])
    n_px = f["width"] * f["height"]
    total = sum(rgb)
    return {
        "width": d["width"],
        "height": d["height"],
        "interlaced": f["interlaced"],
        "n_bytes": len(rgb),
        "pixel_sum": total,
        "weighted_r": sum((k + 1) * rgb[3 * k] for k in range(n_px)),
        "mean_byte": total / len(rgb),
        "max_byte": max(rgb),
    }


@query(
    "multimodal_gif_features",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               CAST(doc_id % 5 + 3 AS INT) AS w,
               CAST(doc_id % 4 + 3 AS INT) AS ht
        FROM documents WHERE text IS NOT NULL
    ),
    v AS (
        SELECT doc_id, w, ht, w * ht AS np,
               list_transform(range(0, w * ht),
                   k -> (CASE WHEN k < n
                              THEN CAST('0x' || substr(h, 2*k + 1, 2) AS INT)
                              ELSE CAST((doc_id + 7 * k) % 256 AS INT) END)
                        % {GIF_COLORS}) AS idx
        FROM b
    ),
    p AS (
        SELECT doc_id, w, ht, np,
               list_transform(idx, i -> CAST((doc_id * 7 + i * 13) % 256
                                             AS BIGINT)) AS r,
               list_transform(idx, i -> CAST((doc_id * 11 + i * 17) % 256
                                             AS BIGINT)) AS g,
               list_transform(idx, i -> CAST((doc_id * 3 + i * 29) % 256
                                             AS BIGINT)) AS bl
        FROM v
    )
    SELECT doc_id,
           w AS width,
           ht AS height,
           doc_id % 2 = 1 AS interlaced,
           CAST(np * 3 AS BIGINT) AS n_bytes,
           CAST(list_aggregate(r, 'sum') + list_aggregate(g, 'sum')
                + list_aggregate(bl, 'sum') AS BIGINT) AS pixel_sum,
           CAST(list_aggregate(list_transform(range(1, np + 1),
                    k -> k * r[k]), 'sum') AS BIGINT) AS weighted_r,
           (list_aggregate(r, 'sum') + list_aggregate(g, 'sum')
            + list_aggregate(bl, 'sum')) * 1.0 / (np * 3) AS mean_byte,
           CAST(greatest(list_aggregate(r, 'max'), list_aggregate(g, 'max'),
                         list_aggregate(bl, 'max')) AS INT) AS max_byte
    FROM p
    """,
)
def multimodal_gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 GIF path made REAL with only the stdlib: rows are encoded
    into genuine GIF89a files (logical screen descriptor, global OR
    local color table, real LZW compression with clear/EOI framing —
    `gif_codec.encode_gif`), shipped as a binary column across an
    Arrow batch boundary, then parsed back by the fully general
    decoder (`gif_codec.decode_gif_frames`: block walk, LZW
    decompression with code-width growth, four-pass deinterlacing,
    palette resolution). Encode and decode are separate ``mapInPandas``
    stages sharing no Python state. Half the corpus is stored
    interlaced and a third carries its palette as a local table, so
    both container variants and the row-scatter path are exercised
    under the oracle — which, because GIF's palette indirection is
    lossless (no quantization to pin, unlike the JPEG twin),
    reconstructs every decoded RGB byte from hex-pair arithmetic.

    Scale: same shape as the other decode queries — opaque binary
    column, per-item CPU inside Arrow-batched ``mapInPandas``,
    parallelism ∝ partitions, no shuffle at all."""
    docs = (
        _nonnull_docs(spark, sf_dir)
        .select("doc_id", F.encode("text", "UTF-8").alias("body"))
        # one small parquet file → one input split; spread the per-item
        # codec CPU over every core (explicit N — exempt from AQE's
        # byte-based coalescer), same treatment as the JPEG twin
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        encode_gif_payload(int(i), bytes(b))
                        for i, b in zip(pdf["doc_id"], pdf["body"])
                    ],
                }
            )

    gifs = docs.mapInPandas(enc, schema="doc_id long, payload binary")

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [gif_features(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return gifs.mapInPandas(dec, schema=GIF_SCHEMA)
