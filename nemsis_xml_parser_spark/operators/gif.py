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

Round-7 seam closures: 4-pass interlaced images (rows stored in
8/8/4/2-stride pass order, deinterlaced on decode), local color tables
(per-image palette overriding the global one), and honest palette→luma
mapping — decoded values are the integer BT.601 luma of the palette
entry ((299R + 587G + 114B + 500) div 1000), which degenerates to the
raw index for the identity-gray palettes this tier writes, keeping all
earlier fixtures bit-identical.

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



def _spread(ids: DataFrame, id_col: str) -> DataFrame:
    """Full-width repartition before the per-image Python codec loop
    (multimodal.spread_ids — the ids usually arrive as ONE partition)."""
    from .multimodal import spread_ids

    return spread_ids(ids, id_col)


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


# GIF 4-pass interlace: (row offset, stride) per pass
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    return [
        r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
    ]


def _palette_luma(palette: np.ndarray) -> np.ndarray:
    """Integer BT.601 luma LUT for an (n, 3) uint8 palette — exact
    integer arithmetic so both engines agree bit-for-bit."""
    p = palette.astype(np.int64)
    return (
        (299 * p[:, 0] + 587 * p[:, 1] + 114 * p[:, 2] + 500) // 1000
    ).astype(np.uint8)


def encode_gif(
    px: np.ndarray,
    interlace: bool = False,
    local_palette: np.ndarray | None = None,
) -> bytes:
    """Grayscale 2-D uint8 array → GIF87a with a 256-gray global
    palette (index == luma).

    ``interlace`` stores rows in the 4-pass 8/8/4/2 order with the
    interlace flag set; ``local_palette`` ((256, 3) uint8) writes a
    per-image local color table instead of relying on the global one —
    pixel VALUES are still written as indices, so a non-identity local
    palette changes what a correct decoder returns (its luma).
    """
    if px.ndim != 2:
        raise NotImplementedError("grayscale (2-D) GIF encode only")
    h, w = px.shape
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT: 256 entries
    for i in range(256):
        out += bytes((i, i, i))
    ipacked = 0x40 if interlace else 0
    if local_palette is not None:
        if local_palette.shape != (256, 3):
            raise ValueError("local_palette must be (256, 3)")
        ipacked |= 0x80 | 0x07  # LCT present, 256 entries
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, ipacked)
    if local_palette is not None:
        out += local_palette.astype(np.uint8).tobytes()
    out.append(8)  # LZW minimum code size
    body = px[_interlace_order(h), :] if interlace else px
    comp = lzw_compress(body.astype(np.uint8).tobytes(), 8)
    for i in range(0, len(comp), 255):
        block = comp[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(buf: bytes) -> np.ndarray:
    """GIF87a/89a → 2-D uint8 luma array: indices mapped through the
    active palette's integer BT.601 luma (local color table when
    present, else global, else identity).  For the identity-gray
    palettes this tier writes, luma == index, so lossless fixtures
    round-trip bit-exactly.  Interlaced images are deinterlaced."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
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
        pal = gct
        if ipacked & 0x80:  # local color table overrides the global one
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                buf[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
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
        px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
        if ipacked & 0x40:  # deinterlace: stored rows are in pass order
            out = np.empty_like(px)
            out[_interlace_order(h), :] = px
            px = out
        if pal is not None:
            px = _palette_luma(pal)[px]
        return px
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


def make_gif_image_interlaced(image_id: int) -> bytes:
    """Same closed-form pixels as :func:`make_gif_image` but stored
    INTERLACED — a correct decoder returns identical pixels, so the
    same SQL oracle verifies the deinterlacing path end-to-end."""
    w, h = image_id % 20 + 4, image_id % 12 + 4
    x = np.arange(w).reshape(1, w)
    y = np.arange(h).reshape(h, 1)
    px = ((image_id * 5 + 7 * x + 11 * y) % 256).astype(np.uint8)
    return encode_gif(px, interlace=True)


def synthesize_gif_media(
    ids: DataFrame, id_col: str = "doc_id", interlace: bool = False
) -> DataFrame:
    """Deterministic corpus of REAL (LZW-compressed) GIFs —
    MEDIA_SCHEMA output, Arrow-batched."""
    from .multimodal import MEDIA_SCHEMA

    maker = make_gif_image_interlaced if interlace else make_gif_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = maker(int(i))
                rows.append((str(int(i)), "image/gif", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return _spread(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


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
