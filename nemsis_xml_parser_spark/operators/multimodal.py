"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata (north-star extension).

The Spark-side machinery — schema, binaryFile scan, Arrow-batched pandas
UDFs over ``mapInPandas``, partition sizing — is real and tested.  Media
decode is REAL, library-free, for four codec families: PNG (stdlib zlib
+ the five scanline filters, ``decode_png_pixels``), 16-bit PCM WAV
(``decode_wav_samples``), baseline JPEG incl. 4:2:0 color (Huffman +
IDCT, ``operators/jpeg.py``), and Motion-JPEG video in a real RIFF/AVI
container (``operators/video.py``).  Progressive JPEG and non-MJPG video
codecs still raise ``NotImplementedError`` at clearly-marked seams where
pillow/ffmpeg plug in on a production cluster.

Design for 100 TB of media:
* one row per object via ``binaryFile`` (no shuffle to ingest);
* ``spark.sql.files.maxPartitionBytes`` governs batch memory, and
  ``mapInPandas`` streams Arrow batches so a partition never fully
  materializes in Python;
* metadata extraction emits a narrow typed row (media dropped) so
  downstream analytics never re-reads the blobs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("media_type", StringType(), True),
        StructField("content", BinaryType(), True),
        StructField("length", LongType(), True),
    ]
)


def spread_ids(ids: DataFrame, id_col: str) -> DataFrame:
    """Repartition an id frame to full executor width before a
    compute-heavy mapInPandas synthesize/decode pass.  The ids usually
    arrive as a projection of one small parquet file — ONE partition —
    which would serialize every per-image Python codec loop onto a
    single core (measured 6x on the LZW tile corpus at sf0.1).  The
    ~KB id shuffle is noise next to the codec work it parallelizes."""
    sc = ids.sparkSession.sparkContext
    return ids.select(id_col).repartition(sc.defaultParallelism)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("media_type", StringType(), True),
        StructField("length", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)


def read_media_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile scan → MEDIA_SCHEMA rows (media type sniffed from magic
    bytes JVM-side — no Python in the scan)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    magic_hex = F.hex(F.substring(F.col("content"), 1, 4))
    media_type = (
        F.when(magic_hex == "89504E47", "image/png")
        .when(magic_hex.startswith("FFD8FF"), "image/jpeg")
        .when(magic_hex == "52494646", "audio/wav")
        .otherwise("application/octet-stream")
    )
    return raw.select(
        F.col("path"),
        media_type.alias("media_type"),
        F.col("content"),
        F.col("length"),
    )


def _jpeg_dimensions(content: bytes) -> tuple[int, int] | None:
    """Walk JPEG segment markers to the SOF (start-of-frame) header, which
    stores height then width big-endian.  Pure byte arithmetic — no codec;
    this is the same marker walk pillow performs before any pixel work."""
    # SOF0-SOF15 carry dimensions, except DHT (C4), DNL (C8), DAC (CC)
    sof = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
    pos = 2
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            pos += 1  # fill bytes / entropy-coded data resync
            continue
        marker = content[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD9:  # RST/SOI/EOI: no length field
            pos += 2
            continue
        seglen = struct.unpack(">H", content[pos + 2 : pos + 4])[0]
        if marker in sof and pos + 9 <= n:
            height, width = struct.unpack(">HH", content[pos + 5 : pos + 9])
            return width, height
        pos += 2 + seglen
    return None


def decode_image_meta(content: bytes) -> tuple[int | None, int | None, str | None]:
    """Header-only decode: width/height for PNG (IHDR), JPEG (SOF marker
    walk), GIF (logical screen descriptor), BMP (DIB header) — all pure
    byte parsing, no image library.  Pixel-level decode is REAL for PNG
    (``decode_png_pixels``), 16-bit PCM WAV (``decode_wav_samples``) and
    baseline JPEG (``operators/jpeg.py::decode_baseline_jpeg`` — Huffman
    + IDCT, grayscale/4:4:4); progressive JPEG, chroma subsampling and
    video still require a real codec and raise ``NotImplementedError`` at
    that seam."""
    if content[:8] == b"\x89PNG\r\n\x1a\n" and len(content) >= 24:
        width, height = struct.unpack(">II", content[16:24])
        return int(width), int(height), "png"
    if content[:3] == b"\xff\xd8\xff":
        dims = _jpeg_dimensions(content)
        if dims is not None:
            return dims[0], dims[1], "jpeg"
        return None, None, "jpeg"
    if content[:6] in (b"GIF87a", b"GIF89a") and len(content) >= 10:
        width, height = struct.unpack("<HH", content[6:10])
        return int(width), int(height), "gif"
    if content[:2] == b"BM" and len(content) >= 26:
        width, height = struct.unpack("<ii", content[18:26])
        return int(width), abs(int(height)), "bmp"  # negative height = top-down
    if content[:2] == b"P6":
        w, h, _ = _parse_ppm_header(content)
        return w, h, "ppm"
    return None, None, None


def _parse_ppm_header(content: bytes) -> tuple[int, int, int]:
    """(width, height, data_offset) of a binary PPM (P6)."""
    fields: list[int] = []
    pos = 2
    while len(fields) < 3 and pos < len(content):
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    return fields[0], fields[1], pos


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over ``mapInPandas`` — the real
    production plumbing; only ``decode_image_meta`` is a stub."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, mtype, content, length in zip(
                pdf["path"], pdf["media_type"], pdf["content"], pdf["length"]
            ):
                try:
                    w, h, fmt = decode_image_meta(bytes(content) if content is not None else b"")
                except NotImplementedError:
                    w, h, fmt = None, None, "undecoded"
                out.append((path, mtype, length, w, h, fmt))
            yield pd.DataFrame(
                out, columns=["path", "media_type", "length", "width", "height", "format"]
            )

    return media.mapInPandas(extract, schema=MEDIA_META_SCHEMA)


def fake_frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Deterministic stand-in for video frame sampling: emit one row per
    ``every_n_bytes`` offset with an md5 of the chunk — exercises the
    explode-shaped output (one media row → many sample rows) that real
    frame extraction produces."""
    offsets = F.sequence(
        F.lit(0), F.greatest(F.col("length") - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return media.select(
        "path",
        F.explode(offsets).alias("offset"),
        F.md5(F.substring_index(F.base64("content"), "=", 1)).alias("chunk_sig"),
    )


AUDIO_META_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("bits", IntegerType(), True),
        StructField("duration_ms", DoubleType(), True),
        StructField("format", StringType(), True),
    ]
)


def decode_wav_meta(
    content: bytes,
) -> tuple[int | None, int | None, int | None, float | None, str | None]:
    """RIFF/WAVE header parse: (sample_rate, channels, bits, duration_ms,
    format).  Walks the chunk list to fmt/data — pure byte arithmetic,
    no audio library; sample-level decode stays a codec seam."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None, None, None, None, None
    pos = 12
    rate = chans = bits = None
    data_size = None
    n = len(content)
    while pos + 8 <= n:
        cid = content[pos : pos + 4]
        size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        if cid == b"fmt " and pos + 24 <= n:
            chans, rate = struct.unpack("<HI", content[pos + 10 : pos + 16])
            (bits,) = struct.unpack("<H", content[pos + 22 : pos + 24])
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None:
        return None, None, None, None, "wav"
    dur = None
    if data_size is not None and rate and chans and bits:
        dur = data_size * 1000.0 / (rate * chans * (bits // 8))
    return rate, chans, bits, dur, "wav"


def make_wav_bytes(sample_rate: int, channels: int, n_samples: int,
                   bits: int = 16) -> bytes:
    """Minimal valid PCM WAV with silent samples."""
    block = channels * (bits // 8)
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def extract_audio_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched WAV header extraction — same plumbing shape as
    ``extract_media_metadata``, audio-typed output."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rate, chans, bits, dur, fmt = decode_wav_meta(
                    bytes(content) if content is not None else b""
                )
                out.append((path, rate, chans, bits, dur, fmt))
            yield pd.DataFrame(
                out,
                columns=["path", "sample_rate", "channels", "bits",
                         "duration_ms", "format"],
            )

    return media.mapInPandas(extract, schema=AUDIO_META_SCHEMA)


def synthesize_audio(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WAV corpus from an id column: sample rate cycles
    8000/16000/44100 by ``id % 3``, channels = ``id % 2 + 1``, length =
    ``id % 100 + 1`` samples — all predictable arithmetic for an external
    oracle."""
    rates = [8000, 16000, 44100]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                buf = make_wav_bytes(rates[i % 3], i % 2 + 1, i % 100 + 1)
                rows.append((str(i), "audio/wav", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def make_image_bytes(fmt: str, width: int, height: int) -> bytes:
    """Minimal valid header bytes for one image of the given format — the
    deterministic media generator used to exercise the decode path without
    fixture files (encode → decode must round-trip the dimensions)."""
    if fmt == "png":
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">II", width, height)
            + b"\x08\x02\x00\x00\x00"
        )
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"
    if fmt == "jpeg":
        return (
            b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", height, width)
            + b"\x03" + b"\x00" * 10
            + b"\xff\xd9"
        )
    if fmt == "bmp":
        return b"BM" + b"\x00" * 16 + struct.pack("<ii", width, height)
    raise ValueError(f"unknown format {fmt!r}")


def synthesize_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic media corpus from an id column: format cycles
    png/gif/jpeg by ``id % 3``, dimensions are fixed arithmetic on the id
    (width = id*7 % 640 + 16, height = id*13 % 480 + 16) so an external
    oracle can predict what the decoder must recover.  Arrow-batched
    mapInPandas, MEDIA_SCHEMA output — same shape as read_media_dir."""
    fmts = ["png", "gif", "jpeg"]
    mtypes = {"png": "image/png", "gif": "image/gif", "jpeg": "image/jpeg"}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                fmt = fmts[i % 3]
                buf = make_image_bytes(fmt, i * 7 % 640 + 16, i * 13 % 480 + 16)
                rows.append((str(i), mtypes[fmt], buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


# --------------------------------------------------------------- PNG codec
# Real pixel-level PNG with nothing but stdlib zlib + numpy: chunk walk,
# IDAT inflate/deflate, per-scanline (un)filter for all five PNG filter
# types (spec: https://www.w3.org/TR/png-3/#9Filters).  This closes the one
# codec seam that needs no external library; JPEG/video stay stubbed.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ft: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward PNG filter of one scanline (encoder side)."""
    out = bytearray(len(row))
    for i in range(len(row)):
        x = row[i]
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            f = x
        elif ft == 1:
            f = x - a
        elif ft == 2:
            f = x - b
        elif ft == 3:
            f = x - ((a + b) >> 1)
        elif ft == 4:
            f = x - _paeth(a, b, c)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[i] = f & 0xFF
    return bytes(out)


def _unfilter_row(ft: int, filt: bytes, prev: bytes, bpp: int) -> bytes:
    """Inverse PNG filter of one scanline (decoder side).  Sequential in x
    (Sub/Average/Paeth reference the just-reconstructed left pixel), so a
    per-byte loop is inherent; scanlines are short and the loop runs inside
    Arrow-batched workers, never on the driver."""
    out = bytearray(len(filt))
    for i in range(len(filt)):
        f = filt[i]
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            x = f
        elif ft == 1:
            x = f + a
        elif ft == 2:
            x = f + b
        elif ft == 3:
            x = f + ((a + b) >> 1)
        elif ft == 4:
            x = f + _paeth(a, b, c)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[i] = x & 0xFF
    return bytes(out)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(px, filter_mode: str = "cycle") -> bytes:
    """Real PNG encoder: 8-bit RGB (colortype 2), CRC-correct chunks,
    zlib-compressed IDAT.  ``filter_mode='cycle'`` filters scanline y with
    type y % 5 so every PNG filter (None/Sub/Up/Average/Paeth) appears in
    the stream — the round-trip then proves the decoder's whole unfilter
    table, not just the trivial path."""
    import zlib

    h, w, ch = px.shape
    if ch != 3:
        raise NotImplementedError("encode_png writes 8-bit RGB only")
    raw = bytearray()
    prev = bytes(w * ch)
    for y in range(h):
        row = px[y].tobytes()
        ft = (y % 5) if filter_mode == "cycle" else 0
        raw.append(ft)
        raw += _filter_row(ft, row, prev, ch)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_rgba(px, filter_mode: str = "cycle") -> bytes:
    """Real PNG encoder, 8-bit RGBA (colortype 6): same cycling filter
    discipline as ``encode_png`` with the 4-byte pixel distance."""
    import zlib

    h, w, ch = px.shape
    if ch != 4:
        raise ValueError("encode_png_rgba needs (h, w, 4)")
    raw = bytearray()
    prev = bytes(w * 4)
    for y in range(h):
        row = px[y].tobytes()
        ft = (y % 5) if filter_mode == "cycle" else 0
        raw.append(ft)
        raw += _filter_row(ft, row, prev, 4)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def encode_png16_gray(px, filter_mode: str = "cycle") -> bytes:
    """Real PNG encoder, 16-bit greyscale (colortype 0, bitdepth 16,
    big-endian samples): filters run on BYTES with the 2-byte pixel
    distance, per the spec."""
    import zlib

    import numpy as np

    h, w = px.shape
    raw = bytearray()
    prev = bytes(w * 2)
    for y in range(h):
        row = np.asarray(px[y], dtype=">u2").tobytes()
        ft = (y % 5) if filter_mode == "cycle" else 0
        raw.append(ft)
        raw += _filter_row(ft, row, prev, 2)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


# Adam7 pass geometry: (x0, y0, dx, dy) per pass
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def encode_png_interlaced(px) -> bytes:
    """Adam7-interlaced 8-bit RGB PNG: each of the seven passes is an
    independently filtered sub-image (filter type y % 5 within the pass,
    previous row resets per pass), concatenated into one zlib stream —
    the progressive layout old web encoders emit."""
    import zlib

    h, w, ch = px.shape
    if ch != 3:
        raise NotImplementedError("encode_png_interlaced writes RGB only")
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = px[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        prev = bytes(pw * ch)
        for y in range(ph):
            row = sub[y].tobytes()
            ft = y % 5
            raw.append(ft)
            raw += _filter_row(ft, row, prev, ch)
            prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(idx, palette) -> bytes:
    """8-bit palettized PNG (colortype 3): PLTE chunk of (r, g, b)
    triples, IDAT of filtered index scanlines (filter y % 5)."""
    import zlib

    h, w = idx.shape
    if len(palette) > 256:
        raise ValueError("PNG palette holds at most 256 entries")
    raw = bytearray()
    prev = bytes(w)
    for y in range(h):
        row = idx[y].tobytes()
        ft = y % 5
        raw.append(ft)
        raw += _filter_row(ft, row, prev, 1)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    plte = bytes(v for rgb in palette for v in rgb)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(buf: bytes):
    """Real PNG pixel decode with stdlib zlib: chunk walk → IDAT inflate →
    per-scanline unfilter → (h, w, channels) array.  Supports 8-bit
    greyscale (colortype 0), RGB (2), palette (3, expanded to RGB via
    PLTE) and RGBA (6), plus 16-BIT greyscale (big-endian samples,
    uint16 out) and the SUB-BYTE depths 1/2/4 for grey and palette
    (packed MSB-first scanlines, filter distance floored at one byte,
    raw levels out unscaled) — each in both non-interlaced and
    Adam7-interlaced layouts (PNG filters operate on BYTES with the
    bytes-per-pixel distance, so one unfilter table covers every
    depth; r11 closed the sub-byte seam)."""
    import zlib

    import numpy as np

    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, plte = 8, b"", None
    w = h = bitdepth = colortype = interlace = None
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bitdepth, colortype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    ok = (
        (bitdepth == 8 and colortype in (0, 2, 3, 6))
        or (bitdepth == 16 and colortype == 0)
        or (bitdepth in (1, 2, 4) and colortype in (0, 3))
    )
    if not ok or interlace not in (0, 1):
        raise NotImplementedError(
            "only 1/2/4/8-bit grey+palette, 8-bit RGB/RGBA or 16-bit "
            "grey PNG decode is implemented"
        )
    if colortype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    ch = {0: 1, 2: 3, 3: 1, 6: 4}[colortype]
    subbyte = bitdepth < 8
    # the PNG filter distance is BYTES per pixel, floored at 1 for the
    # packed sub-byte depths (spec: "bpp is rounded up to one")
    bpp = max(1, ch * bitdepth // 8)
    dtype = np.dtype(">u2") if bitdepth == 16 else np.dtype(np.uint8)
    # MSB-first place values for unpacking a packed sub-byte scanline
    places = (
        (1 << np.arange(bitdepth - 1, -1, -1)).astype(np.uint8)
        if subbyte
        else None
    )
    data = zlib.decompress(idat)

    def unfilter_block(ph: int, pw: int, off: int):
        stride = (
            (pw * ch * bitdepth + 7) // 8 if subbyte else pw * bpp
        )
        rows, prev = [], bytes(stride)
        for y in range(ph):
            o = off + y * (stride + 1)
            cur = _unfilter_row(
                data[o], data[o + 1 : o + 1 + stride], prev, bpp
            )
            if subbyte:
                # unpack MSB-first groups of `bitdepth` bits; the last
                # byte's padding bits fall off the pw*ch slice
                bits = np.unpackbits(np.frombuffer(cur, np.uint8))
                samples = bits.reshape(-1, bitdepth) @ places
                rows.append(samples[: pw * ch].astype(np.uint8))
            else:
                rows.append(np.frombuffer(cur, dtype=dtype))
            prev = cur
        return np.stack(rows).reshape(ph, pw, ch), off + ph * (stride + 1)

    if interlace == 0:
        out, _ = unfilter_block(h, w, 0)
    else:
        out = np.zeros((h, w, ch), dtype=dtype)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            ph = (h - y0 + dy - 1) // dy
            pw = (w - x0 + dx - 1) // dx
            if ph <= 0 or pw <= 0:
                continue
            sub, off = unfilter_block(ph, pw, off)
            out[y0::dy, x0::dx] = sub
    if colortype == 3:
        out = plte[out[:, :, 0]]
    if bitdepth == 16:
        out = out.astype(np.uint16)
    return out


def make_png_image(image_id: int) -> bytes:
    """Deterministic REAL png from an integer id: width = id%24+4, height =
    id%16+4, pixel(x, y, c) = (id*7 + 3x + 5y + 11c) mod 256 — closed-form
    arithmetic an external SQL oracle reproduces without decoding anything."""
    import numpy as np

    w, h = image_id % 24 + 4, image_id % 16 + 4
    x = np.arange(w).reshape(1, w, 1)
    y = np.arange(h).reshape(h, 1, 1)
    c = np.arange(3).reshape(1, 1, 3)
    px = ((image_id * 7 + 3 * x + 5 * y + 11 * c) % 256).astype(np.uint8)
    return encode_png(px)


def make_png_variant_image(image_id: int) -> bytes:
    """Deterministic REAL png exercising the layout seams: even ids are
    Adam7-INTERLACED RGB with make_png_image's pixel formula (interlacing
    is lossless, so the closed form is unchanged); odd ids are PALETTE
    (colortype 3) with index (id*7 + 3x + 5y) % 64 and palette entry
    j → ((3j) % 256, (5j) % 256, (7j) % 256), i.e. decoded channel c is
    (index * (3 + 2c)) % 256."""
    import numpy as np

    w, h = image_id % 24 + 4, image_id % 16 + 4
    if image_id % 2 == 0:
        x = np.arange(w).reshape(1, w, 1)
        y = np.arange(h).reshape(h, 1, 1)
        c = np.arange(3).reshape(1, 1, 3)
        px = ((image_id * 7 + 3 * x + 5 * y + 11 * c) % 256).astype(np.uint8)
        return encode_png_interlaced(px)
    x = np.arange(w).reshape(1, w)
    y = np.arange(h).reshape(h, 1)
    idx = ((image_id * 7 + 3 * x + 5 * y) % 64).astype(np.uint8)
    palette = [((3 * j) % 256, (5 * j) % 256, (7 * j) % 256) for j in range(64)]
    return encode_png_palette(idx, palette)


def synthesize_png_variant_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus alternating Adam7-interlaced and palette
    PNGs — MEDIA_SCHEMA output, Arrow-batched."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_png_variant_image(int(i))
                rows.append((str(int(i)), "image/png", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def make_png_deep_image(image_id: int) -> bytes:
    """Deterministic REAL png exercising the DEPTH seams: even ids are
    16-BIT greyscale (big-endian samples, filters on byte pairs) with
    v(x, y) = (id*257 + 513x + 1031y) mod 65536; odd ids are RGBA
    (colortype 6) with channel law (id*7 + 3x + 5y + 11c) mod 256 for
    c in 0..3 — the alpha plane is a first-class sample, not an
    afterthought.  Both cycle all five PNG filters."""
    import numpy as np

    w, h = image_id % 24 + 4, image_id % 16 + 4
    if image_id % 2 == 0:
        x = np.arange(w).reshape(1, w)
        y = np.arange(h).reshape(h, 1)
        px = ((image_id * 257 + 513 * x + 1031 * y) % 65536).astype(
            np.uint16
        )
        return encode_png16_gray(px)
    x = np.arange(w).reshape(1, w, 1)
    y = np.arange(h).reshape(h, 1, 1)
    c = np.arange(4).reshape(1, 1, 4)
    px = ((image_id * 7 + 3 * x + 5 * y + 11 * c) % 256).astype(np.uint8)
    return encode_png_rgba(px)


def _pack_subbyte_row(samples, bitdepth: int) -> bytes:
    """Pack one scanline of sub-byte samples MSB-first (PNG layout)."""
    import numpy as np

    per_byte = 8 // bitdepth
    n = len(samples)
    padded = np.zeros(((n + per_byte - 1) // per_byte) * per_byte, np.uint8)
    padded[:n] = samples
    bits = (
        (padded.reshape(-1, 1) >> np.arange(bitdepth - 1, -1, -1)) & 1
    ).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def encode_png_subbyte(levels, bitdepth: int, palette=None) -> bytes:
    """1/2/4-bit PNG: greyscale (colortype 0) or palettized (colortype 3
    when ``palette`` is given) — packed MSB-first scanlines, filters
    cycling y % 5 at the 1-byte filter distance the spec floors
    sub-byte depths to."""
    import zlib

    h, w = levels.shape
    if bitdepth not in (1, 2, 4):
        raise ValueError("sub-byte encoder takes bitdepth 1, 2 or 4")
    if int(levels.max(initial=0)) >= (1 << bitdepth):
        raise ValueError("sample exceeds bit depth")
    raw = bytearray()
    stride = (w * bitdepth + 7) // 8
    prev = bytes(stride)
    for y in range(h):
        row = _pack_subbyte_row(levels[y], bitdepth)
        ft = y % 5
        raw.append(ft)
        raw += _filter_row(ft, row, prev, 1)
        prev = row
    colortype = 3 if palette is not None else 0
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, colortype, 0, 0, 0)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(
            b"PLTE", bytes(v for rgb in palette for v in rgb)
        )
    return (
        out
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def make_png_subbyte_image(image_id: int) -> bytes:
    """Deterministic REAL sub-byte png: depth cycles 1/2/4 by id % 3,
    level(x, y) = (id*7 + 3x + 5y) mod 2^depth.  Even ids are packed
    GREYSCALE (raw levels out), odd ids are PALETTIZED with
    PLTE[i] = ((37i) mod 256, (59i) mod 256, (83i) mod 256) — both
    closed-form so a SQL oracle reproduces every decoded sample."""
    import numpy as np

    w, h = image_id % 24 + 4, image_id % 16 + 4
    depth = (1, 2, 4)[image_id % 3]
    x = np.arange(w).reshape(1, w)
    y = np.arange(h).reshape(h, 1)
    lv = ((image_id * 7 + 3 * x + 5 * y) % (1 << depth)).astype(np.uint8)
    if image_id % 2 == 0:
        return encode_png_subbyte(lv, depth)
    palette = [
        ((37 * i) % 256, (59 * i) % 256, (83 * i) % 256)
        for i in range(1 << depth)
    ]
    return encode_png_subbyte(lv, depth, palette=palette)


def synthesize_png_subbyte_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus of 1/2/4-bit grey + palettized PNGs —
    MEDIA_SCHEMA output, Arrow-batched."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_png_subbyte_image(int(i))
                rows.append((str(int(i)), "image/png", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthesize_png_deep_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus alternating 16-bit greyscale and RGBA PNGs —
    MEDIA_SCHEMA output, Arrow-batched."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_png_deep_image(int(i))
                rows.append((str(int(i)), "image/png", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthesize_png_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus of REAL (zlib-compressed, all-filters) PNGs from
    an id column — MEDIA_SCHEMA output, Arrow-batched."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_png_image(int(i))
                rows.append((str(int(i)), "image/png", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("image_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_subpixels", LongType(), True),
        StructField("px_sum", LongType(), True),
        StructField("px_min", IntegerType(), True),
        StructField("px_max", IntegerType(), True),
    ]
)


def png_pixel_stats(media: DataFrame) -> DataFrame:
    """Pixel statistics via the REAL decode path (inflate + unfilter): one
    narrow row per image, blobs dropped on output.  ``path`` must carry the
    integer image id (synthesize_png_media's contract)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_png_pixels(bytes(content))
                h, w, _ = px.shape
                rows.append(
                    (
                        int(path),
                        w,
                        h,
                        int(px.size),
                        int(px.sum()),
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "width", "height",
                    "n_subpixels", "px_sum", "px_min", "px_max",
                ],
            )

    return media.mapInPandas(stats, schema=PIXEL_STATS_SCHEMA)


EMBED_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("embedding", ArrayType(DoubleType()), True),
    ]
)


def byte_histogram_embedding(
    media: DataFrame,
    dim: int = 64,
    id_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Deterministic media feature extraction: L1-normalized ``dim``-bin
    histogram of byte values (256 bins folded modulo ``dim``) as an
    ARRAY<DOUBLE> embedding — the stand-in for a real image/audio encoder
    (which plugs in at ``_embed_bytes``).  The plumbing is the production
    shape: Arrow-batched ``mapInPandas``, numpy vectorized per batch, blobs
    dropped on output so downstream ANN never re-reads media."""
    import numpy as np

    if 256 % dim != 0:
        raise ValueError(f"dim must divide 256, got {dim}")

    def _embed_bytes(buf: bytes) -> list[float]:
        if not buf:
            return [0.0] * dim
        counts = np.bincount(np.frombuffer(buf, dtype=np.uint8), minlength=256)
        folded = counts.reshape(-1, dim).sum(axis=0)  # 256 % dim == 0 bins
        return (folded / folded.sum()).tolist()

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": pdf[id_col].astype(str),
                    "embedding": [
                        _embed_bytes(bytes(c) if c is not None else b"")
                        for c in pdf[content_col]
                    ],
                }
            )

    return media.mapInPandas(embed, schema=EMBED_SCHEMA)


def resize_ppm(buf: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize for binary PPM (P6) — uncompressed RGB,
    so numpy indexing is the whole job.  This is the live half of the
    resize seam; compressed codecs plug in at ``_resize_bytes``."""
    import numpy as np

    w0, h0, off = _parse_ppm_header(buf)
    px = np.frombuffer(buf, dtype=np.uint8, count=w0 * h0 * 3, offset=off)
    px = px.reshape(h0, w0, 3)
    ys = (np.arange(height) * h0 // height).clip(0, h0 - 1)
    xs = (np.arange(width) * w0 // width).clip(0, w0 - 1)
    out = px[ys][:, xs]
    return b"P6\n%d %d\n255\n" % (width, height) + out.tobytes()


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize over the standard mapInPandas/error-routing shape.
    Uncompressed PPM resizes for real (``resize_ppm``); compressed codecs
    (JPEG/PNG pixels) require an image library not present in this
    container and are stubbed at ``_resize_bytes`` (rows come back with
    status='unresized')."""

    def _resize_bytes(buf: bytes) -> bytes:
        if buf[:2] == b"P6":
            return resize_ppm(buf, width, height)
        raise NotImplementedError(
            "compressed-codec resize requires pillow/opencv — not present "
            "in this container; stubbed by design"
        )

    out_schema = StructType(
        [
            StructField("path", StringType(), False),
            StructField("content", BinaryType(), True),
            StructField("status", StringType(), True),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows.append((path, _resize_bytes(bytes(content)), "resized"))
                except NotImplementedError:
                    rows.append((path, content, "unresized"))
            yield pd.DataFrame(rows, columns=["path", "content", "status"])

    return media.mapInPandas(resize, schema=out_schema)


THUMB_STATS_SCHEMA = StructType(
    [
        StructField("image_id", LongType(), False),
        StructField("src_width", IntegerType(), True),
        StructField("src_height", IntegerType(), True),
        StructField("thumb_sum", LongType(), True),
        StructField("thumb_min", IntegerType(), True),
        StructField("thumb_max", IntegerType(), True),
    ]
)


def png_thumbnail_stats(
    media: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """Decode PNG pixels (REAL inflate+unfilter path) then nearest-neighbor
    resize to ``out_w``x``out_h`` with the same integer index mapping as
    ``resize_ppm`` (src = out_idx * src_dim // out_dim) and reduce to
    narrow per-thumbnail statistics — the decode→transform→feature shape
    of an image-pipeline pre-processing stage, blobs never leaving the
    Arrow batch."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_png_pixels(bytes(content))
                h, w, _ = px.shape
                ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                th = px[ys][:, xs]
                rows.append(
                    (int(path), w, h, int(th.sum()), int(th.min()), int(th.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "src_width", "src_height",
                    "thumb_sum", "thumb_min", "thumb_max",
                ],
            )

    return media.mapInPandas(stats, schema=THUMB_STATS_SCHEMA)


def make_wav_pcm_bytes(audio_id: int) -> bytes:
    """Deterministic REAL-PCM WAV from an integer id: rate cycles
    8000/16000/44100 by id%3, channels = id%2+1, n = id%100+1 samples,
    sample(i, ch) = ((id*13 + 7i + 3ch) mod 2003) - 1001 as int16 LE —
    closed-form arithmetic an external SQL oracle reproduces without
    touching a byte."""
    import numpy as np

    rate = [8000, 16000, 44100][audio_id % 3]
    channels = audio_id % 2 + 1
    n = audio_id % 100 + 1
    i = np.arange(n).reshape(n, 1)
    ch = np.arange(channels).reshape(1, channels)
    samples = ((audio_id * 13 + 7 * i + 3 * ch) % 2003 - 1001).astype("<i2")
    block = channels * 2
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


#: IMA ADPCM step-size table (89 entries) and index-adjust table —
#: the DVI/IMA reference constants (also inlined in the generated
#: DuckDB oracle for multimodal_wav_adpcm_stats)
IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)
IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_adpcm_decode(data: bytes, block_align: int):
    """Mono IMA ADPCM block decode: per block a 4-byte header (int16 LE
    predictor = the block's FIRST output sample, step index, reserved)
    followed by 4-bit nibbles, LOW nibble first.  Per nibble n:
    diff = step>>3 (+step if n&4) (+step>>1 if n&2) (+step>>2 if n&1),
    subtracted when n&8; predictor clamped to int16, index adjusted by
    IMA_INDEX_TABLE[n&7] and clamped to [0, 88]."""
    import numpy as np

    out = []
    for off in range(0, len(data) - len(data) % block_align, block_align):
        block = data[off : off + block_align]
        pred = struct.unpack("<h", block[0:2])[0]
        idx = block[2]
        if idx > 88:
            raise ValueError(f"ADPCM step index {idx} out of range")
        out.append(pred)
        for byte in block[4:]:
            for n in (byte & 0x0F, byte >> 4):
                step = IMA_STEP_TABLE[idx]
                diff = step >> 3
                if n & 4:
                    diff += step
                if n & 2:
                    diff += step >> 1
                if n & 1:
                    diff += step >> 2
                pred = (
                    max(-32768, pred - diff)
                    if n & 8
                    else min(32767, pred + diff)
                )
                idx = min(88, max(0, idx + IMA_INDEX_TABLE[n & 7]))
                out.append(pred)
    return np.array(out, dtype=np.int16)


def decode_wav_samples(content: bytes):
    """REAL sample-level PCM decode: chunk walk to fmt/data, int16 LE →
    (n_samples, channels) numpy array.  The audio twin of
    decode_png_pixels.  Codecs: 16-bit PCM, 8-bit G.711 mu-law/A-law,
    and mono IMA ADPCM (format 0x11, 4-bit — r11 closed the ADPCM
    seam); anything else raises NotImplementedError."""
    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, n = 12, len(content)
    chans = bits = codec = block_align = None
    data = None
    while pos + 8 <= n:
        cid = content[pos : pos + 4]
        size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            codec, chans = struct.unpack("<HH", content[pos + 8 : pos + 12])
            (block_align,) = struct.unpack(
                "<H", content[pos + 20 : pos + 22]
            )
            (bits,) = struct.unpack("<H", content[pos + 22 : pos + 24])
        elif cid == b"data":
            data = content[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if data is None or not chans:
        raise ValueError("WAV missing data/fmt")
    if codec == 1 and bits == 16:
        arr = np.frombuffer(data, dtype="<i2")
    elif codec == 7 and bits == 8:  # G.711 mu-law
        arr = _ulaw_to_linear(np.frombuffer(data, dtype=np.uint8))
    elif codec == 6 and bits == 8:  # G.711 A-law
        arr = _alaw_to_linear(np.frombuffer(data, dtype=np.uint8))
    elif codec == 0x11 and bits == 4 and chans == 1:  # IMA ADPCM
        arr = _ima_adpcm_decode(data, block_align)
    else:
        raise NotImplementedError(
            "only 16-bit PCM / 8-bit G.711 mu-law / A-law / mono IMA "
            "ADPCM WAV decode"
        )
    return arr.reshape(len(arr) // chans, chans)


def _ulaw_to_linear(codes: "np.ndarray") -> "np.ndarray":
    """ITU-T G.711 mu-law expansion (the classic CCITT reference
    arithmetic): v = ~code; t = (((v & 15) << 3) + 0x84) << exponent;
    sign bit picks 0x84 - t vs t - 0x84."""
    import numpy as np

    v = (255 - codes.astype(np.int64)) & 0xFF
    t = (((v & 0x0F) << 3) + 0x84) << ((v >> 4) & 0x07)
    return np.where(v & 0x80, 0x84 - t, t - 0x84).astype(np.int64)


def _alaw_to_linear(codes: "np.ndarray") -> "np.ndarray":
    """ITU-T G.711 A-law expansion: a = code ^ 0x55; segment 0 is
    linear (t = m*16 + 8), higher segments shift (t = (m*16 + 0x108)
    << (seg-1)); sign bit SET means positive."""
    import numpy as np

    a = codes.astype(np.int64) ^ 0x55
    m = a & 0x0F
    seg = (a >> 4) & 0x07
    t = np.where(seg == 0, m * 16 + 8, (m * 16 + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int64)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("audio_id", LongType(), False),
        StructField("n_samples", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("sample_sum", LongType(), True),
        StructField("sample_min", IntegerType(), True),
        StructField("sample_max", IntegerType(), True),
    ]
)


def synthesize_pcm_audio(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus of REAL-PCM WAVs (MEDIA_SCHEMA, Arrow-batched)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_wav_pcm_bytes(int(i))
                rows.append((str(int(i)), "audio/wav", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def wav_sample_stats(media: DataFrame) -> DataFrame:
    """Sample statistics via the REAL PCM decode path — narrow rows out,
    blobs never leave the batch.  ``path`` carries the integer audio id
    (synthesize_pcm_audio's contract)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                s = decode_wav_samples(bytes(content))
                rows.append(
                    (
                        int(path),
                        int(s.shape[0]),
                        int(s.shape[1]),
                        int(s.sum()),
                        int(s.min()),
                        int(s.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "n_samples", "n_channels",
                    "sample_sum", "sample_min", "sample_max",
                ],
            )

    return media.mapInPandas(stats, schema=AUDIO_STATS_SCHEMA)


LUMA_HIST_SCHEMA = StructType(
    [
        StructField("bin", IntegerType(), False),
        StructField("n_px", LongType(), False),
    ]
)


def png_luminance_histogram(media: DataFrame, bins: int = 16) -> DataFrame:
    """Corpus luminance histogram via the REAL decode path — the exposure/
    contrast audit an image-curation pipeline runs before filtering: per
    image, integer BT.601 luma ``(299·R + 587·G + 114·B) // 1000`` (all
    integer arithmetic, so an external SQL oracle reproduces it exactly;
    float luma weights would round differently across engines), binned to
    ``256 // bins``-wide buckets and bincounted with numpy inside the
    Arrow batch.  Emits (bin, n_px) partials per image — 16 narrow rows,
    blobs never leave the executor — ready for the global per-bin
    aggregate."""
    width = 256 // bins

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            counts = np.zeros(bins, dtype=np.int64)
            for content in pdf["content"]:
                px = decode_png_pixels(bytes(content)).astype(np.int64)
                luma = (
                    299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                ) // 1000
                counts += np.bincount(luma.ravel() // width, minlength=bins)
            yield pd.DataFrame(
                {"bin": np.arange(bins, dtype=np.int32), "n_px": counts}
            )

    return (
        media.mapInPandas(hist, schema=LUMA_HIST_SCHEMA)
        .groupBy("bin")
        .agg(F.sum("n_px").alias("n_px"))
    )


PHASH_SCHEMA = StructType(
    [
        StructField("image_id", LongType(), False),
        StructField("ahash_hi", LongType(), False),
        StructField("ahash_lo", LongType(), False),
    ]
)


def png_average_hash(media: DataFrame) -> DataFrame:
    """64-bit average perceptual hash per PNG via the REAL decode path.

    Pipeline per image, all integer math so both engines agree bit-for-
    bit: inflate+unfilter (``decode_png_pixels``), BT.601 integer luma
    ``(299R + 587G + 114B) // 1000`` (same convention as
    ``png_luminance_histogram``), nearest-neighbor sample to 8x8 with
    the ``resize_ppm`` index map (src = out_idx * dim // 8), then
    bit k = 1 iff ``luma*64 > sum(luma8x8)`` (integer cross-multiplied
    mean compare), packed row-major into two 32-bit halves (hi = bits
    32..63) so the value fits signed BIGINT in any engine.

    The aHash groups identical-looking images under one key — the
    first-pass perceptual image dedup (group-by hash, no pair joins).
    """
    import numpy as np

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_png_pixels(bytes(content)).astype(np.int64)
                h, w, _ = px.shape
                luma = (
                    299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                ) // 1000
                th = luma[(np.arange(8) * h // 8)][:, (np.arange(8) * w // 8)]
                s = int(th.sum())
                bits = (th.ravel() * 64 > s).astype(np.int64)
                lo = int(sum(int(bits[k]) << k for k in range(32)))
                hi = int(sum(int(bits[k]) << (k - 32) for k in range(32, 64)))
                rows.append((int(path), hi, lo))
            yield pd.DataFrame(
                rows, columns=["image_id", "ahash_hi", "ahash_lo"]
            )

    return media.mapInPandas(hashes, schema=PHASH_SCHEMA)


ENERGY_SEG_SCHEMA = StructType(
    [
        StructField("audio_id", LongType(), False),
        StructField("n_frames", LongType(), True),
        StructField("n_quiet", LongType(), True),
        StructField("n_quiet_segments", LongType(), True),
        StructField("longest_quiet_run", LongType(), True),
        StructField("total_energy", LongType(), True),
    ]
)


def wav_energy_segments(media: DataFrame, frame: int = 16) -> DataFrame:
    """Frame-energy VAD-style silence segmentation via the REAL PCM
    decode path — the preprocessing an audio pipeline runs to trim or
    segment silence before feature extraction.

    Per clip: non-overlapping ``frame``-sample windows (last partial
    kept), integer energy Σ s² across channels, a frame is QUIET iff
    ``2·energy·n_frames < total_energy`` (strictly below half the mean
    — integer cross-multiplied, so both engines compare identical
    integers), and quiet runs are counted gaps-and-islands style.
    Everything is exact integer arithmetic end-to-end.
    """
    import numpy as np

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                s = decode_wav_samples(bytes(content)).astype(np.int64)
                n = s.shape[0]
                nf = (n + frame - 1) // frame
                e = np.array(
                    [int((s[f * frame:(f + 1) * frame] ** 2).sum())
                     for f in range(nf)],
                    dtype=np.int64,
                )
                tot = int(e.sum())
                quiet = 2 * e * nf < tot
                runs = longest = cur = 0
                for q in quiet:
                    if q:
                        cur += 1
                        runs += cur == 1
                        longest = max(longest, cur)
                    else:
                        cur = 0
                rows.append(
                    (int(path), nf, int(quiet.sum()), runs, longest, tot)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "n_frames", "n_quiet",
                    "n_quiet_segments", "longest_quiet_run", "total_energy",
                ],
            )

    return media.mapInPandas(seg, schema=ENERGY_SEG_SCHEMA)


def synthesize_jpeg_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus of REAL baseline JPEGs (operators/jpeg.py —
    constant-block construction with closed-form decoded pixels) from an
    id column — MEDIA_SCHEMA output, Arrow-batched."""
    from .jpeg import make_jpeg_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_jpeg_image(int(i))
                rows.append((str(int(i)), "image/jpeg", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def jpeg_pixel_stats(media: DataFrame) -> DataFrame:
    """Pixel statistics via the REAL baseline-JPEG decode path (marker
    walk, DQT/DHT table reads, Huffman, dequant, IDCT): one narrow row
    per image, blobs dropped on output.  ``path`` must carry the integer
    image id (synthesize_jpeg_media's contract).  Output shape matches
    ``png_pixel_stats`` (PIXEL_STATS_SCHEMA); grayscale means
    n_subpixels = width·height."""
    from .jpeg import decode_baseline_jpeg

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_baseline_jpeg(bytes(content))
                h, w = px.shape[:2]
                rows.append(
                    (
                        int(path),
                        w,
                        h,
                        int(px.size),
                        int(px.sum()),
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "width", "height",
                    "n_subpixels", "px_sum", "px_min", "px_max",
                ],
            )

    return media.mapInPandas(stats, schema=PIXEL_STATS_SCHEMA)


def synthesize_jpeg420_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus of REAL 4:2:0 color JPEGs (operators/jpeg.py
    constant-MCU construction, closed-form decoded RGB)."""
    from .jpeg import make_jpeg420_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_jpeg420_image(int(i))
                rows.append((str(int(i)), "image/jpeg", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


COLOR_STATS_SCHEMA = StructType(
    [
        StructField("image_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("r_sum", LongType(), True),
        StructField("g_sum", LongType(), True),
        StructField("b_sum", LongType(), True),
        StructField("rgb_min", IntegerType(), True),
        StructField("rgb_max", IntegerType(), True),
    ]
)


def jpeg_color_stats(media: DataFrame) -> DataFrame:
    """Per-channel statistics via the REAL subsampled-color decode path
    (interleaved 4:2:0 MCUs, two quant/Huffman table pairs, chroma
    upsample, JFIF inverse color transform)."""
    from .jpeg import decode_baseline_jpeg

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_baseline_jpeg(bytes(content))
                h, w, _ = px.shape
                rows.append(
                    (
                        int(path),
                        w,
                        h,
                        int(px[..., 0].sum()),
                        int(px[..., 1].sum()),
                        int(px[..., 2].sum()),
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "width", "height",
                    "r_sum", "g_sum", "b_sum", "rgb_min", "rgb_max",
                ],
            )

    return media.mapInPandas(stats, schema=COLOR_STATS_SCHEMA)


PERIODICITY_SCHEMA = StructType(
    [
        StructField("audio_id", LongType(), False),
        StructField("n_samples", IntegerType(), True),
        StructField("energy", LongType(), True),
        StructField("corr_p4", LongType(), True),
        StructField("corr_p8", LongType(), True),
        StructField("corr_p16", LongType(), True),
    ]
)


def wav_periodicity_features(media: DataFrame, periods=(4, 8, 16)) -> DataFrame:
    """Square-wave matched-filter periodicity probe over the REAL PCM
    decode path: per audio, channel-0 energy Σx² and the correlation
    Σ x_i·s_i against ±1 square waves of the given periods (s_i = +1
    when i mod p < p/2) — the integer-exact cousin of a Goertzel bin
    (sin/cos would drag libm cross-engine variance into the oracle;
    square-wave signs keep every statistic a BIGINT)."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                samples = decode_wav_samples(bytes(content))
                x = samples[:, 0].astype(np.int64)
                n = len(x)
                i = np.arange(n)
                corrs = [
                    int((x * np.where(i % p < p // 2, 1, -1)).sum())
                    for p in periods
                ]
                rows.append(
                    (int(path), n, int((x * x).sum()), *corrs)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "n_samples", "energy",
                    "corr_p4", "corr_p8", "corr_p16",
                ],
            )

    return media.mapInPandas(feats, schema=PERIODICITY_SCHEMA)


PER_IMAGE_HIST_SCHEMA = StructType(
    [
        StructField("image_id", LongType(), False),
        StructField("bin", IntegerType(), False),
        StructField("n_px", LongType(), False),
    ]
)


def png_luminance_bins(media: DataFrame, bins: int = 16) -> DataFrame:
    """PER-IMAGE luminance histogram via the REAL decode path — the
    per-asset exposure profile downstream per-image statistics (entropy,
    contrast scoring, exposure gating) are computed from, where
    ``png_luminance_histogram`` only keeps the corpus-level rollup.

    Same integer BT.601 luma convention ((299R + 587G + 114B) // 1000,
    ``256 // bins``-wide buckets, numpy bincount inside the Arrow
    batch); emits only NON-EMPTY (image_id, bin, n_px) rows — at most
    ``bins`` narrow rows per image, blobs never leave the executor."""
    width = 256 // bins

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_png_pixels(bytes(content)).astype(np.int64)
                luma = (
                    299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                ) // 1000
                counts = np.bincount(luma.ravel() // width, minlength=bins)
                for b in np.nonzero(counts)[0]:
                    rows.append((int(path), int(b), int(counts[b])))
            yield pd.DataFrame(rows, columns=["image_id", "bin", "n_px"])

    return media.mapInPandas(hist, schema=PER_IMAGE_HIST_SCHEMA)


def synthesize_bmp_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus of REAL RLE8-compressed BMPs
    (operators/bmp.py — run/absolute-mode round-length mix with
    closed-form pixels) from an id column — MEDIA_SCHEMA, Arrow-batched."""
    from .bmp import make_bmp_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_bmp_image(int(i))
                rows.append((str(int(i)), "image/bmp", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def bmp_pixel_stats(media: DataFrame) -> DataFrame:
    """Pixel statistics via the REAL BMP RLE8 decode path (header walk,
    bottom-up rows, encoded runs, absolute blocks with alignment pads,
    EOL/EOB markers): one narrow row per image, PIXEL_STATS_SCHEMA."""
    from .bmp import decode_bmp

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_bmp(bytes(content))
                h, w = px.shape
                rows.append(
                    (int(path), w, h, int(px.size), int(px.sum()),
                     int(px.min()), int(px.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "width", "height",
                    "n_subpixels", "px_sum", "px_min", "px_max",
                ],
            )

    return media.mapInPandas(stats, schema=PIXEL_STATS_SCHEMA)


TONE_N_SAMPLES = 256
TONE_RATE = 8000


def make_wav_tone_bytes(audio_id: int) -> bytes:
    """Deterministic single-tone WAV: 256 mono int16 samples at 8 kHz,
    a pure sine with EXACTLY k = id%31+1 cycles in the window (bin-
    aligned, so its DFT is a single line at bin k), amplitude 12000,
    phase 0.  Quantization noise from the int16 rounding is ~1 LSB —
    five orders of magnitude under the peak — so the spectral argmax
    is closed-form k for the SQL oracle."""
    import numpy as np

    k = audio_id % 31 + 1
    i = np.arange(TONE_N_SAMPLES)
    samples = np.round(
        12000.0 * np.sin(2.0 * np.pi * k * i / TONE_N_SAMPLES)
    ).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, TONE_RATE, TONE_RATE * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthesize_tone_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus of REAL single-tone PCM WAVs — MEDIA_SCHEMA,
    Arrow-batched."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_wav_tone_bytes(int(i))
                rows.append((str(int(i)), "audio/wav", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


DFT_PEAK_SCHEMA = StructType(
    [
        StructField("audio_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("peak_bin", IntegerType(), True),
        StructField("peak_freq_hz", DoubleType(), True),
    ]
)


def wav_dft_peak(media: DataFrame) -> DataFrame:
    """Dominant-frequency detection over real PCM decode: chunk-walk the
    WAV, deinterleave channel 0, run a REAL DFT (numpy rfft) and take
    the spectral argmax over the non-DC bins — the pitch/carrier
    detector every audio curation pass runs.  Only integer-safe
    quantities surface (bin index, n, and bin·rate/N — exact double
    arithmetic), so the oracle never depends on libm/FFT rounding."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                arr = decode_wav_samples(bytes(content))
                x = arr[:, 0].astype(np.float64)
                n = len(x)
                spec = np.abs(np.fft.rfft(x))
                peak = int(np.argmax(spec[1:]) + 1)  # exclude DC
                rows.append(
                    (int(path), n, peak, peak * TONE_RATE / n)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DFT_PEAK_SCHEMA])

    return media.mapInPandas(stats, schema=DFT_PEAK_SCHEMA)


def make_wav_sweep_bytes(audio_id: int) -> bytes:
    """Deterministic TWO-SEGMENT tone WAV for the STFT path: 512 mono
    int16 samples at 8 kHz — the first 256-sample frame carries exactly
    k1 = id%31+1 cycles, the second k2 = (id*7)%31+1 cycles (both
    bin-aligned in their own frame, amplitude 12000, phase 0).  A
    whole-file DFT smears the two lines; only a correctly-framed STFT
    recovers (k1, k2) per frame — which is what the closed-form oracle
    asserts."""
    import numpy as np

    i = np.arange(TONE_N_SAMPLES)
    segs = []
    for k in (audio_id % 31 + 1, (audio_id * 7) % 31 + 1):
        segs.append(
            np.round(
                12000.0 * np.sin(2.0 * np.pi * k * i / TONE_N_SAMPLES)
            ).astype("<i2")
        )
    data = np.concatenate(segs).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, TONE_RATE, TONE_RATE * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthesize_sweep_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus of REAL two-segment PCM WAVs — MEDIA_SCHEMA,
    Arrow-batched."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_wav_sweep_bytes(int(i))
                rows.append((str(int(i)), "audio/wav", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


STFT_SCHEMA = StructType(
    [
        StructField("audio_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("peak_bin", IntegerType(), True),
        StructField("band", StringType(), True),
    ]
)


def wav_stft_peaks(media: DataFrame, frame: int = 256) -> DataFrame:
    """Short-time Fourier transform over real PCM decode: deinterleave
    channel 0, split into non-overlapping ``frame``-sample windows, run
    a REAL DFT per window (numpy rfft) and classify each frame's
    spectral argmax into low/mid/high bands — the framing primitive
    under every audio feature extractor (VAD, language-ID frontends,
    music/speech discrimination).  Only integer-safe quantities surface
    (frame index, argmax bin, band label), so the oracle never depends
    on FFT rounding."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                arr = decode_wav_samples(bytes(content))
                x = arr[:, 0].astype(np.float64)
                n_frames = len(x) // frame
                for fi in range(n_frames):
                    seg = x[fi * frame : (fi + 1) * frame]
                    spec = np.abs(np.fft.rfft(seg))
                    peak = int(np.argmax(spec[1:]) + 1)  # exclude DC
                    band = (
                        "low" if peak <= 10 else "mid" if peak <= 21 else "high"
                    )
                    rows.append((int(path), fi, peak, band))
            yield pd.DataFrame(rows, columns=[f.name for f in STFT_SCHEMA])

    return media.mapInPandas(stats, schema=STFT_SCHEMA)


def synthesize_progressive_jpeg_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus of REAL progressive (SOF2) JPEGs
    (operators/jpeg_progressive.py — 6-scan spectral-selection +
    successive-approximation script) — MEDIA_SCHEMA, Arrow-batched."""
    from .jpeg_progressive import make_progressive_jpeg_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_progressive_jpeg_image(int(i))
                rows.append((str(int(i)), "image/jpeg", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthesize_progressive_420_jpeg_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus of REAL 4:2:0-subsampled progressive JPEGs
    (operators/jpeg_progressive.py::encode_progressive_jpeg_420 — the
    general-sampling MCU walk + replication chroma upsample) —
    MEDIA_SCHEMA, Arrow-batched."""
    from .jpeg_progressive import make_progressive_420_jpeg_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_progressive_420_jpeg_image(int(i))
                rows.append((str(int(i)), "image/jpeg", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthesize_progressive_420_gradient_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus of NON-CONSTANT (linear-ramp) 4:2:0
    progressive JPEGs — every AC scan kind carries real payload through
    the subsampled MCU walk (jpeg_progressive.py::
    make_progressive_420_gradient_image) — MEDIA_SCHEMA, Arrow-batched."""
    from .jpeg_progressive import make_progressive_420_gradient_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_progressive_420_gradient_image(int(i))
                rows.append((str(int(i)), "image/jpeg", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def jpeg_progressive_gradient_parity_stats(media: DataFrame) -> DataFrame:
    """Per gradient-fixture image: dimensions, subpixel count, and
    ``n_mismatch`` — the count of decoded subpixels differing from the
    INDEPENDENT reference reconstruction (forward DCT → quantize →
    dequantize → IDCT of the known ramp law, no bitstream involved;
    chroma replicated 2x2).  A correct codec yields n_mismatch = 0 for
    every image, which is the column the DuckDB oracle pins alongside
    the closed-form dimensions — the decode-vs-reconstruction equality
    travels through the oracle gate as data."""
    import numpy as np

    from .jpeg_progressive import (
        decode_progressive_jpeg,
        reference_reconstruction,
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                i = int(path)
                got = decode_progressive_jpeg(bytes(content))
                h, w = got.shape[:2]
                X, Y = np.meshgrid(np.arange(w), np.arange(h))
                yp = ((3 * X + 5 * Y + 11 * i) % 256).astype(np.uint8)
                mism = int((got[:, :, 0] != reference_reconstruction(yp)).sum())
                Xc, Yc = np.meshgrid(np.arange(w // 2), np.arange(h // 2))
                for c in (1, 2):
                    cp = (
                        (5 * Xc + 3 * Yc + 11 * i + 40 * c) % 256
                    ).astype(np.uint8)
                    ref = np.repeat(
                        np.repeat(reference_reconstruction(cp), 2, axis=0),
                        2, axis=1,
                    )
                    mism += int((got[:, :, c] != ref).sum())
                rows.append((i, w, h, int(got.size), mism))
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "width", "height", "n_subpixels",
                    "n_mismatch",
                ],
            )

    return media.mapInPandas(
        stats,
        schema="image_id long, width int, height int, "
        "n_subpixels long, n_mismatch long",
    )


def synthesize_progressive_color_jpeg_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus of REAL three-component 4:4:4 progressive
    JPEGs (operators/jpeg_progressive.py::encode_progressive_jpeg_color
    — interleaved DC scans + per-component AC scans) — MEDIA_SCHEMA,
    Arrow-batched."""
    from .jpeg_progressive import make_progressive_color_jpeg_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_progressive_color_jpeg_image(int(i))
                rows.append((str(int(i)), "image/jpeg", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthesize_jpeg12_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus of REAL 12-bit extended-sequential JPEGs
    (operators/jpeg.py::make_jpeg12_image — constant-block construction,
    closed-form decoded pixels) — MEDIA_SCHEMA output, Arrow-batched."""
    from .jpeg import make_jpeg12_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_jpeg12_image(int(i))
                rows.append((str(int(i)), "image/jpeg", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthesize_bmp4_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus of REAL 4-bit BMPs (operators/bmp.py — even
    ids BI_RLE4 runs + absolute nibble blocks, odd ids raw packed
    nibbles with row padding) — MEDIA_SCHEMA, Arrow-batched."""
    from .bmp import make_bmp4_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_bmp4_image(int(i))
                rows.append((str(int(i)), "image/bmp", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def bmp4_pixel_stats(media: DataFrame) -> DataFrame:
    """Pixel statistics via the REAL 4-bit BMP decode path (packed
    nibbles / RLE4 alternating-nibble runs): PIXEL_STATS_SCHEMA rows."""
    from .bmp import decode_bmp4

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_bmp4(bytes(content))
                h, w = px.shape
                rows.append(
                    (int(path), w, h, int(px.size), int(px.sum()),
                     int(px.min()), int(px.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "width", "height",
                    "n_subpixels", "px_sum", "px_min", "px_max",
                ],
            )

    return media.mapInPandas(stats, schema=PIXEL_STATS_SCHEMA)


def make_wav_g711_bytes(audio_id: int) -> bytes:
    """Deterministic REAL G.711 WAV: mu-law (format 7) unless id%3==0
    which takes A-law (format 6); channels = id%2+1, n = id%80+1,
    rate 8000 (the G.711 telephony rate), code(i, ch) = (id*17 + 11i +
    5ch) mod 256 — the CODE bytes are the closed form, so the SQL
    oracle replays the expansion arithmetic without touching a byte."""
    import numpy as np

    fmt_tag = 6 if audio_id % 3 == 0 else 7
    channels = audio_id % 2 + 1
    n = audio_id % 80 + 1
    i = np.arange(n).reshape(n, 1)
    ch = np.arange(channels).reshape(1, channels)
    codes = ((audio_id * 17 + 11 * i + 5 * ch) % 256).astype(np.uint8)
    data = codes.tobytes()
    block = channels  # 8 bits per sample
    fmt = struct.pack("<HHIIHH", fmt_tag, channels, 8000, 8000 * block, block, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_adpcm_wav(audio_id: int) -> bytes:
    """Deterministic REAL mono IMA ADPCM WAV (format 0x11): id%2+1
    blocks of block_align 12 (4-byte header + 8 data bytes = 16
    nibbles = 17 samples/block).  Block b: initial predictor
    ((id·97 + 131·b) mod 4096) − 2048, initial step index
    (id + 5·b) mod 40, nibble i = (id·3 + 7·i + 11·b) mod 16 — all
    closed-form, so the DuckDB oracle replays the decode recurrence
    with a recursive CTE over the same constants."""
    nblocks = audio_id % 2 + 1
    block_align = 12
    data = bytearray()
    for b in range(nblocks):
        pred0 = ((audio_id * 97 + 131 * b) % 4096) - 2048
        idx0 = (audio_id + 5 * b) % 40
        data += struct.pack("<hBB", pred0, idx0, 0)
        for j in range(8):
            lo = (audio_id * 3 + 7 * (2 * j) + 11 * b) % 16
            hi = (audio_id * 3 + 7 * (2 * j + 1) + 11 * b) % 16
            data.append(lo | (hi << 4))
    samples_per_block = 1 + 2 * (block_align - 4)
    rate = 8000
    byterate = rate * block_align // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, rate, byterate, block_align, 4, 2, samples_per_block,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", 20) + fmt
    body += b"data" + struct.pack("<I", len(data)) + bytes(data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthesize_adpcm_audio(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus of REAL IMA ADPCM WAVs (MEDIA_SCHEMA,
    Arrow-batched)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_adpcm_wav(int(i))
                rows.append((str(int(i)), "audio/wav", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


EXIF_META_SCHEMA = StructType(
    [
        StructField("image_id", LongType(), False),
        StructField("orientation", IntegerType(), True),
        StructField("datetime", StringType(), True),
        StructField("description", StringType(), True),
        StructField("xres_num", LongType(), True),
        StructField("xres_den", LongType(), True),
        StructField("byte_order", StringType(), True),
    ]
)


def synthesize_exif_jpeg_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus of REAL baseline JPEGs carrying an EXIF
    APP1 (operators/exif.py) — byte order alternates II/MM by id,
    RATIONAL XResolution out-of-line; MEDIA_SCHEMA, Arrow-batched."""
    from .exif import build_exif_app1, insert_exif
    from .jpeg import make_jpeg_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[id_col]:
                i = int(raw)
                dt = (
                    f"2026:{i % 12 + 1:02d}:{i % 28 + 1:02d} "
                    f"{i % 24:02d}:{i % 60:02d}:{(i * 7) % 60:02d}"
                )
                app1 = build_exif_app1(
                    i % 8 + 1, dt, f"img-{i}",
                    (i % 300 + 1, i % 4 + 1), big_endian=i % 2 == 1,
                )
                buf = insert_exif(make_jpeg_image(i), app1)
                rows.append((str(i), "image/jpeg", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def jpeg_exif_meta(media: DataFrame) -> DataFrame:
    """EXIF metadata rows via the REAL APP1/TIFF-IFD parse — narrow
    rows out, blobs stay in the Arrow batch."""
    from .exif import decode_jpeg_exif

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = decode_jpeg_exif(bytes(content))
                rows.append(
                    (
                        int(path),
                        m["orientation"],
                        m["datetime"],
                        m["description"],
                        m["xres_num"],
                        m["xres_den"],
                        m["byte_order"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "orientation", "datetime", "description",
                    "xres_num", "xres_den", "byte_order",
                ],
            )

    return media.mapInPandas(meta, schema=EXIF_META_SCHEMA)


def synthesize_g711_audio(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus of REAL G.711 WAVs (MEDIA_SCHEMA, Arrow-batched)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_wav_g711_bytes(int(i))
                rows.append((str(int(i)), "audio/wav", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return spread_ids(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)
