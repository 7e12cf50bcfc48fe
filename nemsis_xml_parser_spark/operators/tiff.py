"""Real baseline-TIFF codec — IFD walking, multi-strip assembly,
PackBits RLE, both byte orders; stdlib + numpy only.

Extends the honest-codec roster (PNG zlib+filters, JPEG Huffman+IDCT,
GIF LZW, BMP RLE8, WAV PCM, MJPEG/AVI) with the scanned-document
container every OCR/ingest pipeline meets: little- or big-endian
header, IFD entry table (tag/type/count/value-or-offset with the
inline-when-it-fits rule), strip-based image data (StripOffsets /
StripByteCounts / RowsPerStrip), Compression 1 (none) and 32773
(PackBits — the classic 1-byte-header RLE, implemented both
directions).  8-bit grayscale (BlackIsZero) single-IFD images decode;
tiles, palettes, multi-sample and other compressions raise at named
seams.

TIFF is LOSSLESS here, so fixtures round-trip bit-exactly and the SQL
oracle recomputes every decoded pixel from the closed-form fixture
formula — a wrong strip boundary, endian swap or RLE run length breaks
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

# TIFF tag ids
_WIDTH, _LENGTH, _BPS, _COMPRESSION, _PHOTOMETRIC = 256, 257, 258, 259, 262
_STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279


def packbits_compress(data: bytes) -> bytes:
    """Apple PackBits: header n in [0,127] → n+1 literals; n in
    [-127,-1] → repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)  # two's complement of 1-run
            out.append(data[i])
            i += run
            continue
        # literal stretch: until the next run starts or 128 bytes
        j = i + 1
        while (
            j < n
            and j - i < 128
            and not (j + 1 < n and data[j] == data[j + 1])
        ):
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def packbits_decompress(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        h = data[i]
        i += 1
        if h == 128:  # no-op
            continue
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        else:
            out += bytes([data[i]]) * (257 - h)
            i += 1
    if len(out) != expected:
        raise ValueError(
            f"PackBits decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def encode_tiff(
    px: np.ndarray,
    rows_per_strip: int = 4,
    packbits: bool = True,
    big_endian: bool = False,
) -> bytes:
    """Grayscale 2-D uint8 → single-IFD strip TIFF (PackBits or raw)."""
    if px.ndim != 2:
        raise NotImplementedError("grayscale (2-D) TIFF encode only")
    h, w = px.shape
    bo = ">" if big_endian else "<"
    strips = []
    for r0 in range(0, h, rows_per_strip):
        raw = px[r0 : r0 + rows_per_strip, :].astype(np.uint8).tobytes()
        strips.append(packbits_compress(raw) if packbits else raw)
    n_strips = len(strips)
    # layout: 8-byte header | strip data | [strip offset/count arrays] | IFD
    header = struct.pack(bo + "2sHI", b"MM" if big_endian else b"II", 42, 0)
    data_start = 8
    offsets = []
    pos = data_start
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    # arrays for offsets/counts when they don't fit inline (count > 1)
    arrays = bytearray()
    if n_strips > 1:
        off_array_pos = pos
        for o in offsets:
            arrays += struct.pack(bo + "I", o)
        cnt_array_pos = pos + 4 * n_strips
        for s in strips:
            arrays += struct.pack(bo + "I", len(s))
        pos += len(arrays)
    ifd_pos = pos

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # type 3 = SHORT: value left-justified in the 4-byte field
        # (first two bytes in either byte order); type 4 = LONG
        if typ == 3 and count == 1:
            return struct.pack(bo + "HHIHH", tag, typ, count, value, 0)
        return struct.pack(bo + "HHII", tag, typ, count, value)

    entries = [
        entry(_WIDTH, 4, 1, w),
        entry(_LENGTH, 4, 1, h),
        entry(_BPS, 3, 1, 8),
        entry(_COMPRESSION, 3, 1, 32773 if packbits else 1),
        entry(_PHOTOMETRIC, 3, 1, 1),  # BlackIsZero
        entry(
            _STRIP_OFFSETS,
            4,
            n_strips,
            offsets[0] if n_strips == 1 else off_array_pos,
        ),
        entry(_SPP, 3, 1, 1),
        entry(_ROWS_PER_STRIP, 4, 1, rows_per_strip),
        entry(
            _STRIP_COUNTS,
            4,
            n_strips,
            len(strips[0]) if n_strips == 1 else cnt_array_pos,
        ),
    ]
    ifd = struct.pack(bo + "H", len(entries)) + b"".join(entries) + struct.pack(
        bo + "I", 0
    )
    out = bytearray(header)
    out[4:8] = struct.pack(bo + "I", ifd_pos)
    for s in strips:
        out += s
    out += arrays
    out += ifd
    return bytes(out)


def _read_values(buf: bytes, bo: str, typ: int, count: int, raw: bytes):
    """IFD entry value(s): inline when they fit in 4 bytes, else at the
    offset the value field points to."""
    size = {3: 2, 4: 4}.get(typ)
    if size is None:
        raise NotImplementedError(f"TIFF field type {typ}")
    fmt = {3: "H", 4: "I"}[typ]
    total = size * count
    if total <= 4:
        return list(struct.unpack_from(bo + fmt * count, raw, 0))
    (off,) = struct.unpack(bo + "I", raw)
    return list(struct.unpack_from(bo + fmt * count, buf, off))


def decode_tiff(buf: bytes) -> np.ndarray:
    """Strip TIFF → 2-D uint8 array (8-bit grayscale, Compression 1 or
    PackBits, either byte order)."""
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    magic, ifd_off = struct.unpack_from(bo + "HI", buf, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (n_entries,) = struct.unpack_from(bo + "H", buf, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", buf, base)
        tags[tag] = _read_values(
            buf, bo, typ, count, buf[base + 8 : base + 12]
        )
    (next_ifd,) = struct.unpack_from(bo + "I", buf, ifd_off + 2 + 12 * n_entries)
    if next_ifd != 0:
        raise NotImplementedError("multi-IFD (multi-page) TIFF")
    w, h = tags[_WIDTH][0], tags[_LENGTH][0]
    if tags.get(_BPS, [8])[0] != 8 or tags.get(_SPP, [1])[0] != 1:
        raise NotImplementedError("only 8-bit single-sample TIFF")
    if tags.get(_PHOTOMETRIC, [1])[0] not in (0, 1):
        raise NotImplementedError("only grayscale photometric TIFF")
    comp = tags.get(_COMPRESSION, [1])[0]
    if comp not in (1, 32773):
        raise NotImplementedError(f"TIFF compression {comp}")
    if _STRIP_OFFSETS not in tags:
        raise NotImplementedError("tiled TIFF (no strip offsets)")
    offsets = tags[_STRIP_OFFSETS]
    counts = tags[_STRIP_COUNTS]
    rps = tags.get(_ROWS_PER_STRIP, [h])[0]
    out = bytearray()
    for si, (o, c) in enumerate(zip(offsets, counts)):
        rows = min(rps, h - si * rps)
        expected = rows * w
        chunk = buf[o : o + c]
        if comp == 32773:
            out += packbits_decompress(chunk, expected)
        else:
            if len(chunk) != expected:
                raise ValueError("strip byte count mismatch")
            out += chunk
    if tags.get(_PHOTOMETRIC, [1])[0] == 0:  # WhiteIsZero: invert
        return (255 - np.frombuffer(bytes(out), dtype=np.uint8)).reshape(h, w)
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w)


def make_tiff_image(image_id: int) -> bytes:
    """Deterministic REAL multi-strip PackBits TIFF: width = id%20+4,
    height = id%12+4, pixel(x, y) = (id*3 + 5y + x div 6) mod 256 —
    x-runs of 6 exercise actual RLE runs; closed-form for the SQL
    oracle.  Every 3rd image is big-endian, every 5th uncompressed, so
    one corpus covers both byte orders and both compressions."""
    w, h = image_id % 20 + 4, image_id % 12 + 4
    x = np.arange(w).reshape(1, w)
    y = np.arange(h).reshape(h, 1)
    px = ((image_id * 3 + 5 * y + x // 6) % 256).astype(np.uint8)
    return encode_tiff(
        px,
        rows_per_strip=4,
        packbits=(image_id % 5 != 0),
        big_endian=(image_id % 3 == 0),
    )


def synthesize_tiff_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus of REAL strip TIFFs — MEDIA_SCHEMA output,
    Arrow-batched."""
    from .multimodal import MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_tiff_image(int(i))
                rows.append((str(int(i)), "image/tiff", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return ids.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


TIFF_STATS_SCHEMA = StructType(
    [
        StructField("image_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("px_sum", LongType(), True),
        StructField("px_min", IntegerType(), True),
        StructField("px_max", IntegerType(), True),
    ]
)


def tiff_pixel_stats(media: DataFrame) -> DataFrame:
    """Integer pixel statistics via the REAL TIFF decode path."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_tiff(bytes(content)).astype(np.int64)
                h, w = px.shape
                rows.append(
                    (int(path), w, h, int(px.sum()), int(px.min()), int(px.max()))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in TIFF_STATS_SCHEMA])

    return media.mapInPandas(stats, schema=TIFF_STATS_SCHEMA)
