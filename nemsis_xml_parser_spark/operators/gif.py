"""Real GIF87a codec — LZW compress/decompress, grayscale palette,
stdlib + numpy only.

Completes the image tier's honest-codec roster (PNG: zlib + 5 filters;
JPEG: Huffman + IDCT incl. 4:2:0; MJPEG/AVI: RIFF container): GIF's
variable-width LSB-first LZW with CLEAR/EOI codes, 12-bit cap and
table-full reset, a 256-entry grayscale global color table (palette
index == luma, so decoded pixels are exact integers), single
non-interlaced image block.  Interlaced GIFs, local color tables and
GIF89a extension blocks raise at clearly-marked seams.

GIF is LOSSLESS, so fixtures round-trip bit-exactly and the SQL oracle
recomputes every decoded pixel from the closed-form fixture formula —
any drift in bit packing, code-width bumps or sub-block framing breaks
the hash.

Reference parity: the reference (psycopg2 ETL) has no media tier; this
extends SURVEY §2.I multimodal operators.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_MAX_CODE_WIDTH = 12


def lzw_compress(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: variable-width codes (LSB-first), CLEAR emitted
    first and on table overflow, EOI last."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[cand] = next_code
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decompress(data: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    def read() -> int | None:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    while True:
        code = read()
        if code is None:
            raise ValueError("LZW stream ended without EOI")
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and len(table) < (1 << _MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            # widen when the NEXT code would not fit (decoder stays one
            # step behind the encoder's width bump)
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry


def encode_gif(px: np.ndarray) -> bytes:
    """Grayscale 2-D uint8 array → GIF87a with a 256-gray global
    palette (index == luma)."""
    if px.ndim != 2:
        raise NotImplementedError("grayscale (2-D) GIF encode only")
    h, w = px.shape
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT: 256 entries
    for i in range(256):
        out += bytes((i, i, i))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(8)  # LZW minimum code size
    comp = lzw_compress(px.astype(np.uint8).tobytes(), 8)
    for i in range(0, len(comp), 255):
        block = comp[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(buf: bytes) -> np.ndarray:
    """GIF87a/89a → 2-D uint8 index array (== luma for the grayscale
    palette this tier writes)."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))  # skip global color table
    while pos < len(buf):
        b = buf[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # GIF89a extension block — skip sub-blocks
            pos += 2
            while buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _x, _y, w, h, ipacked = struct.unpack_from("<HHHHB", buf, pos + 1)
        pos += 10
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF")
        if ipacked & 0x80:
            raise NotImplementedError("local color table")
        min_code = buf[pos]
        pos += 1
        comp = bytearray()
        while buf[pos] != 0:
            n = buf[pos]
            comp += buf[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        raw = lzw_decompress(bytes(comp), min_code)
        if len(raw) != w * h:
            raise ValueError(f"decoded {len(raw)} px, expected {w * h}")
        return np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
    raise ValueError(f"no image block in GIF ({sw}x{sh} screen)")


def make_gif_image(image_id: int) -> bytes:
    """Deterministic REAL GIF from an integer id: width = id%20+4,
    height = id%12+4, pixel(x, y) = (id*5 + 7x + 11y) mod 256 —
    closed-form for the SQL oracle (GIF is lossless, so decode is
    exact)."""
    w, h = image_id % 20 + 4, image_id % 12 + 4
    x = np.arange(w).reshape(1, w)
    y = np.arange(h).reshape(h, 1)
    px = ((image_id * 5 + 7 * x + 11 * y) % 256).astype(np.uint8)
    return encode_gif(px)


def synthesize_gif_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus of REAL (LZW-compressed) GIFs —
    MEDIA_SCHEMA output, Arrow-batched."""
    from .multimodal import MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_gif_image(int(i))
                rows.append((str(int(i)), "image/gif", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return ids.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


GIF_STATS_SCHEMA = StructType(
    [
        StructField("image_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("px_sum", LongType(), True),
        StructField("px_min", IntegerType(), True),
        StructField("px_max", IntegerType(), True),
    ]
)


def gif_pixel_stats(media: DataFrame) -> DataFrame:
    """Integer pixel statistics via the REAL GIF decode path."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_gif(bytes(content)).astype(np.int64)
                h, w = px.shape
                rows.append(
                    (int(path), w, h, int(px.sum()), int(px.min()), int(px.max()))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in GIF_STATS_SCHEMA])

    return media.mapInPandas(stats, schema=GIF_STATS_SCHEMA)
