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
import zlib
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
_PLANAR, _PREDICTOR = 284, 317
_TILE_WIDTH, _TILE_LENGTH, _TILE_OFFSETS, _TILE_COUNTS = 322, 323, 324, 325
_JPEGTABLES = 347

# TIFF LZW (spec section 13): MSB-first bit packing, Clear=256, EOI=257,
# first data code 258, and the "early change" — the code width bumps one
# code EARLIER than the table size strictly requires (at next-code 511,
# 1023, 2047), the quirk that distinguishes TIFF LZW from GIF LZW.
_LZW_CLEAR, _LZW_EOI = 256, 257



def _spread(ids: DataFrame, id_col: str) -> DataFrame:
    """Full-width repartition before the per-image Python codec loop
    (multimodal.spread_ids — the ids usually arrive as ONE partition)."""
    from .multimodal import spread_ids

    return spread_ids(ids, id_col)


def lzw_compress(data: bytes) -> bytes:
    """TIFF-variant LZW compression (early-change, MSB-first)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(_LZW_CLEAR, width)
    prefix = b""
    for byte in data:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        put(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # early change: width grows when the NEXT code to assign hits
        # 2^width - 1 (511/1023/2047), not 2^width
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:  # table full (early change leaves 4094 max)
            put(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prefix = bytes([byte])
    if prefix:
        put(table[prefix], width)
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    put(_LZW_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decompress(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW decompression; stops at EOI or ``expected``
    output bytes (strip/tile size), whichever comes first."""
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None

    def get() -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return _LZW_EOI
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        return code

    while len(out) < expected:
        code = get()
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt LZW stream: code beyond table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out += entry
        # early change, mirroring the writer: the writer bumps when its
        # next assignable code reaches 2^width - 1; the reader's table
        # trails the writer's by ONE entry (it adds nothing on the
        # first code after Clear), so the same moment is table length
        # 2^width - 2 — the classic 510/1022/2046 decoder switch points
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError(
            f"LZW strip ended early: {len(out)} of {expected} bytes"
        )
    return bytes(out[:expected])


def _hdiff_encode(raw: bytes, w: int, spp: int) -> bytes:
    """Predictor 2 (horizontal differencing), per row per sample."""
    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, w * spp).astype(np.int16)
    d = a.copy()
    d[:, spp:] = a[:, spp:] - a[:, :-spp]
    return (d % 256).astype(np.uint8).tobytes()


def _hdiff_decode(raw: bytes, w: int, spp: int) -> bytes:
    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, w * spp).astype(np.int64)
    for x in range(spp, w * spp, spp):
        a[:, x : x + spp] = (a[:, x : x + spp] + a[:, x - spp : x]) % 256
    return a.astype(np.uint8).tobytes()


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


def _page_segment(
    px: np.ndarray,
    rows_per_strip: int,
    packbits: bool,
    bo: str,
    base: int,
) -> tuple[bytes, list[bytes]]:
    """One page's (data segment, IFD entries) with every file offset
    computed against ``base`` (where the segment will start).  The data
    segment holds strip bytes plus the out-of-line offset/count arrays
    (and the 3-SHORT BitsPerSample array for RGB, which at 6 bytes
    never fits the inline value field)."""
    if px.ndim == 2:
        spp, photometric = 1, 1  # BlackIsZero grayscale
    elif px.ndim == 3 and px.shape[2] == 3:
        spp, photometric = 3, 2  # chunky RGB
    else:
        raise NotImplementedError("grayscale (2-D) or RGB (h,w,3) only")
    h, w = px.shape[0], px.shape[1]
    strips = []
    for r0 in range(0, h, rows_per_strip):
        raw = px[r0 : r0 + rows_per_strip].astype(np.uint8).tobytes()
        strips.append(packbits_compress(raw) if packbits else raw)
    n_strips = len(strips)
    offsets = []
    pos = base
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    arrays = bytearray()
    if n_strips > 1:
        off_array_pos = pos
        for o in offsets:
            arrays += struct.pack(bo + "I", o)
        cnt_array_pos = pos + 4 * n_strips
        for s in strips:
            arrays += struct.pack(bo + "I", len(s))
        pos += len(arrays)
    if spp == 3:
        bps_array_pos = pos
        arrays += struct.pack(bo + "HHH", 8, 8, 8)
        pos += 6

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # type 3 = SHORT: value left-justified in the 4-byte field
        # (first two bytes in either byte order); type 4 = LONG
        if typ == 3 and count == 1:
            return struct.pack(bo + "HHIHH", tag, typ, count, value, 0)
        return struct.pack(bo + "HHII", tag, typ, count, value)

    entries = [
        entry(_WIDTH, 4, 1, w),
        entry(_LENGTH, 4, 1, h),
        (
            entry(_BPS, 3, 1, 8)
            if spp == 1
            else entry(_BPS, 3, 3, bps_array_pos)
        ),
        entry(_COMPRESSION, 3, 1, 32773 if packbits else 1),
        entry(_PHOTOMETRIC, 3, 1, photometric),
        entry(
            _STRIP_OFFSETS,
            4,
            n_strips,
            offsets[0] if n_strips == 1 else off_array_pos,
        ),
        entry(_SPP, 3, 1, spp),
        entry(_ROWS_PER_STRIP, 4, 1, rows_per_strip),
        entry(
            _STRIP_COUNTS,
            4,
            n_strips,
            len(strips[0]) if n_strips == 1 else cnt_array_pos,
        ),
    ]
    return b"".join(strips) + bytes(arrays), entries


def encode_tiff_multipage(
    pages: list[np.ndarray],
    rows_per_strip: int = 4,
    packbits: bool | list[bool] = True,
    big_endian: bool = False,
) -> bytes:
    """uint8 page arrays (2-D grayscale or (h,w,3) RGB, freely mixed) →
    one multi-IFD TIFF: header | page0 data | page0 IFD | page1 data |
    page1 IFD | …, each IFD's next pointer chaining to the following
    page (0 on the last — the baseline multi-page layout every fax /
    scanned-document reader walks)."""
    if not pages:
        raise ValueError("need at least one page")
    pb = (
        list(packbits)
        if isinstance(packbits, (list, tuple))
        else [packbits] * len(pages)
    )
    bo = ">" if big_endian else "<"
    out = bytearray(
        struct.pack(bo + "2sHI", b"MM" if big_endian else b"II", 42, 0)
    )
    prev_next_ptr: int | None = None  # file position of the previous
    for i, px in enumerate(pages):    # page's next-IFD field, patched
        data, entries = _page_segment(px, rows_per_strip, pb[i], bo, len(out))
        ifd_pos = len(out) + len(data)
        if i == 0:
            out[4:8] = struct.pack(bo + "I", ifd_pos)
        else:
            out[prev_next_ptr : prev_next_ptr + 4] = struct.pack(
                bo + "I", ifd_pos
            )
        out += data
        out += struct.pack(bo + "H", len(entries))
        out += b"".join(entries)
        prev_next_ptr = len(out)
        out += struct.pack(bo + "I", 0)
    return bytes(out)


def encode_tiff(
    px: np.ndarray,
    rows_per_strip: int = 4,
    packbits: bool = True,
    big_endian: bool = False,
) -> bytes:
    """uint8 image (2-D grayscale or (h,w,3) RGB) → single-IFD strip
    TIFF (PackBits or raw)."""
    return encode_tiff_multipage([px], rows_per_strip, packbits, big_endian)


def encode_tiff_tiled(
    px: np.ndarray,
    tile_w: int = 16,
    tile_h: int = 16,
    packbits: bool = True,
    big_endian: bool = False,
    compression: int | None = None,
    predictor: int = 1,
    planar: int = 1,
) -> bytes:
    """uint8 image (2-D grayscale or (h,w,3) RGB) → single-IFD TILED
    TIFF (TileWidth/TileLength/TileOffsets/TileByteCounts instead of
    the strip tags): the layout large scans and geo rasters use so
    readers can fetch a spatial region without the full raster.  Tiles
    run left-to-right, top-to-bottom; EVERY tile is padded to the full
    tile_w × tile_h (the spec's edge rule — decoders must clip), pad
    bytes zero.  Tile dims default to the spec-mandated multiple of
    16.

    ``compression``: 1 (none), 5 (LZW), 8 (Deflate) or 32773 (PackBits;
    None derives from the legacy ``packbits`` flag).  ``predictor`` 2 =
    horizontal differencing per TILE row per sample (applied before
    compression, spec section 14 — tile rows are tile_w wide, never the
    image width).  ``planar`` 2 = plane-major tile sequence: ALL of
    sample 0's tiles, then sample 1's, then sample 2's; TileOffsets /
    TileByteCounts carry SamplesPerPixel × TilesPerImage entries."""
    if tile_w % 16 or tile_h % 16:
        raise ValueError("TIFF tile dimensions must be multiples of 16")
    if compression is None:
        compression = 32773 if packbits else 1
    if compression not in (1, 5, 8, 32773):
        raise ValueError("tiled TIFF compression must be 1, 5, 8 or 32773")
    if predictor not in (1, 2) or planar not in (1, 2):
        raise ValueError("predictor and planar must be 1 or 2")
    if px.ndim == 2:
        spp, photometric = 1, 1
    elif px.ndim == 3 and px.shape[2] == 3:
        spp, photometric = 3, 2
    else:
        raise NotImplementedError("grayscale (2-D) or RGB (h,w,3) only")
    if planar == 2 and spp == 1:
        planar = 1  # planar is meaningless for one sample
    h, w = px.shape[0], px.shape[1]
    a = px.astype(np.uint8)
    if spp == 1:
        a = a[..., None]
    tiles: list[bytes] = []
    planes = range(spp) if planar == 2 else (None,)
    for plane in planes:
        row_spp = spp if plane is None else 1
        for ty in range(0, h, tile_h):
            for tx in range(0, w, tile_w):
                tile = np.zeros((tile_h, tile_w, row_spp), dtype=np.uint8)
                part = (
                    a[ty : ty + tile_h, tx : tx + tile_w]
                    if plane is None
                    else a[ty : ty + tile_h, tx : tx + tile_w, plane : plane + 1]
                )
                tile[: part.shape[0], : part.shape[1]] = part
                raw = tile.tobytes()
                if predictor == 2:
                    raw = _hdiff_encode(raw, tile_w, row_spp)
                if compression == 5:
                    raw = lzw_compress(raw)
                elif compression == 8:
                    raw = zlib.compress(raw)
                elif compression == 32773:
                    raw = packbits_compress(raw)
                tiles.append(raw)
    bo = ">" if big_endian else "<"
    out = bytearray(
        struct.pack(bo + "2sHI", b"MM" if big_endian else b"II", 42, 0)
    )
    offsets = []
    pos = len(out)
    for t in tiles:
        offsets.append(pos)
        pos += len(t)
    arrays = bytearray()
    n_tiles = len(tiles)
    if n_tiles > 1:
        off_array_pos = pos
        for o in offsets:
            arrays += struct.pack(bo + "I", o)
        cnt_array_pos = pos + 4 * n_tiles
        for t in tiles:
            arrays += struct.pack(bo + "I", len(t))
        pos += len(arrays)
    if spp == 3:
        bps_array_pos = pos
        arrays += struct.pack(bo + "HHH", 8, 8, 8)
        pos += 6

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        if typ == 3 and count == 1:
            return struct.pack(bo + "HHIHH", tag, typ, count, value, 0)
        return struct.pack(bo + "HHII", tag, typ, count, value)

    entries = [
        entry(_WIDTH, 4, 1, w),
        entry(_LENGTH, 4, 1, h),
        (
            entry(_BPS, 3, 1, 8)
            if spp == 1
            else entry(_BPS, 3, 3, bps_array_pos)
        ),
        entry(_COMPRESSION, 3, 1, compression),
        entry(_PHOTOMETRIC, 3, 1, photometric),
        entry(_SPP, 3, 1, spp),
        entry(_TILE_WIDTH, 3, 1, tile_w),
        entry(_TILE_LENGTH, 3, 1, tile_h),
        entry(
            _TILE_OFFSETS,
            4,
            n_tiles,
            offsets[0] if n_tiles == 1 else off_array_pos,
        ),
        entry(
            _TILE_COUNTS,
            4,
            n_tiles,
            len(tiles[0]) if n_tiles == 1 else cnt_array_pos,
        ),
        entry(_PLANAR, 3, 1, planar),
        entry(_PREDICTOR, 3, 1, predictor),
    ]
    # TIFF 6.0 requires IFD entries in ascending tag order; PlanarConfig
    # (284) and Predictor (317) must land before the tile tags (322-325).
    entries.sort(key=lambda e: struct.unpack(bo + "H", e[:2])[0])
    ifd_pos = pos
    out[4:8] = struct.pack(bo + "I", ifd_pos)
    out += b"".join(tiles) + bytes(arrays)
    out += struct.pack(bo + "H", len(entries))
    out += b"".join(entries)
    out += struct.pack(bo + "I", 0)
    return bytes(out)


def encode_tiff_lzw(
    px: np.ndarray,
    rows_per_strip: int = 4,
    compression: int = 5,
    predictor: int = 1,
    planar: int = 1,
    big_endian: bool = False,
) -> bytes:
    """uint8 image (2-D grayscale or (h,w,3) RGB) → single-IFD strip
    TIFF with LZW (compression 5) or none (1), optional horizontal-
    differencing predictor (317 = 2), and optional PLANAR configuration
    (284 = 2: the strip sequence is all of sample 0's strips, then
    sample 1's, then sample 2's — StripOffsets/ByteCounts carry
    SamplesPerPixel × StripsPerImage entries, spec section 14)."""
    if compression not in (1, 5, 8):
        raise ValueError("encode_tiff_lzw writes compression 1, 5 or 8 only")
    if predictor not in (1, 2) or planar not in (1, 2):
        raise ValueError("predictor and planar must be 1 or 2")
    if px.ndim == 2:
        spp, photometric = 1, 1
    elif px.ndim == 3 and px.shape[2] == 3:
        spp, photometric = 3, 2
    else:
        raise NotImplementedError("grayscale (2-D) or RGB (h,w,3) only")
    if planar == 2 and spp == 1:
        planar = 1  # planar is meaningless for one sample
    h, w = px.shape[0], px.shape[1]
    a = px.astype(np.uint8)
    if spp == 1:
        a = a[..., None]
    strips: list[bytes] = []
    planes = range(spp) if planar == 2 else (None,)
    for plane in planes:
        for r0 in range(0, h, rows_per_strip):
            if plane is None:
                raw = a[r0 : r0 + rows_per_strip].tobytes()
                row_spp = spp
            else:
                raw = np.ascontiguousarray(
                    a[r0 : r0 + rows_per_strip, :, plane]
                ).tobytes()
                row_spp = 1
            if predictor == 2:
                raw = _hdiff_encode(raw, w, row_spp)
            if compression == 5:
                raw = lzw_compress(raw)
            elif compression == 8:  # Adobe Deflate: plain zlib stream
                raw = zlib.compress(raw)
            strips.append(raw)
    bo = ">" if big_endian else "<"
    out = bytearray(
        struct.pack(bo + "2sHI", b"MM" if big_endian else b"II", 42, 0)
    )
    offsets = []
    pos = len(out)
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    arrays = bytearray()
    n_strips = len(strips)
    if n_strips > 1:
        off_array_pos = pos
        for o in offsets:
            arrays += struct.pack(bo + "I", o)
        cnt_array_pos = pos + 4 * n_strips
        for s in strips:
            arrays += struct.pack(bo + "I", len(s))
        pos += len(arrays)
    if spp == 3:
        bps_array_pos = pos
        arrays += struct.pack(bo + "HHH", 8, 8, 8)
        pos += 6

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        if typ == 3 and count == 1:
            return struct.pack(bo + "HHIHH", tag, typ, count, value, 0)
        return struct.pack(bo + "HHII", tag, typ, count, value)

    entries = [
        entry(_WIDTH, 4, 1, w),
        entry(_LENGTH, 4, 1, h),
        (
            entry(_BPS, 3, 1, 8)
            if spp == 1
            else entry(_BPS, 3, 3, bps_array_pos)
        ),
        entry(_COMPRESSION, 3, 1, compression),
        entry(_PHOTOMETRIC, 3, 1, photometric),
        entry(
            _STRIP_OFFSETS,
            4,
            n_strips,
            offsets[0] if n_strips == 1 else off_array_pos,
        ),
        entry(_SPP, 3, 1, spp),
        entry(_ROWS_PER_STRIP, 4, 1, rows_per_strip),
        entry(
            _STRIP_COUNTS,
            4,
            n_strips,
            len(strips[0]) if n_strips == 1 else cnt_array_pos,
        ),
        entry(_PLANAR, 3, 1, planar),
        entry(_PREDICTOR, 3, 1, predictor),
    ]
    # Same ascending-tag-order requirement as encode_tiff_tiled above.
    entries.sort(key=lambda e: struct.unpack(bo + "H", e[:2])[0])
    ifd_pos = pos
    out[4:8] = struct.pack(bo + "I", ifd_pos)
    out += b"".join(strips) + bytes(arrays)
    out += struct.pack(bo + "H", len(entries))
    out += b"".join(entries)
    out += struct.pack(bo + "I", 0)
    return bytes(out)


def _jpeg_split(stream: bytes) -> tuple[list[tuple[int, bytes]], bytes]:
    """Split a complete JPEG stream into its pre-scan marker segments
    [(marker, segment_bytes)] and the trailing entropy data (everything
    after the SOS header, EOI included)."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    segs: list[tuple[int, bytes]] = []
    pos = 2
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        m = stream[pos + 1]
        (ln,) = struct.unpack(">H", stream[pos + 2 : pos + 4])
        segs.append((m, stream[pos : pos + 2 + ln]))
        pos += 2 + ln
        if m == 0xDA:  # SOS: remainder is entropy data + EOI
            return segs, stream[pos:]
    raise ValueError("JPEG stream ended before SOS")


def encode_tiff_jpeg(
    px: np.ndarray,
    rows_per_strip: int = 8,
    big_endian: bool = False,
    shared_tables: bool = False,
) -> bytes:
    """uint8 GRAYSCALE image → single-IFD strip TIFF with new-style
    JPEG compression (tag 259 = 7, TIFF Technical Note 2).  Default:
    every strip is a COMPLETE baseline JPEG stream (SOI … EOI),
    decodable by any conforming JPEG codec — the layout
    scanned-document pipelines emit when they want JPEG rate with TIFF
    paging.  ``shared_tables=True`` writes the JPEGTables (tag 347)
    variant: one abbreviated table-specification stream (SOI, DQT,
    DHTs, EOI) in the tag, and per-strip ABBREVIATED image streams
    with the DQT/DHT segments stripped — the libtiff default that
    amortizes table bytes across strips.  Dimensions and
    rows_per_strip must be multiples of 8 (whole MCUs per strip)."""
    if px.ndim != 2:
        raise NotImplementedError("encode_tiff_jpeg writes grayscale only")
    h, w = px.shape
    if w % 8 or h % 8 or rows_per_strip % 8:
        raise ValueError("JPEG-in-TIFF needs 8-multiple dims and strip rows")
    from .jpeg import encode_baseline_jpeg

    strips = [
        encode_baseline_jpeg(px[r0 : r0 + rows_per_strip].astype(np.uint8))
        for r0 in range(0, h, rows_per_strip)
    ]
    tables = b""
    if shared_tables:
        # the encoder uses FIXED standard tables, so the first strip's
        # DQT/DHT segments are every strip's
        segs0, _ = _jpeg_split(strips[0])
        tables = (
            b"\xff\xd8"
            + b"".join(s for m, s in segs0 if m in (0xDB, 0xC4))
            + b"\xff\xd9"
        )
        abbrev = []
        for s in strips:
            segs, entropy = _jpeg_split(s)
            abbrev.append(
                b"\xff\xd8"
                + b"".join(sb for m, sb in segs if m not in (0xDB, 0xC4))
                + entropy
            )
        strips = abbrev
    bo = ">" if big_endian else "<"
    out = bytearray(
        struct.pack(bo + "2sHI", b"MM" if big_endian else b"II", 42, 0)
    )
    offsets = []
    pos = len(out)
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    arrays = bytearray()
    n_strips = len(strips)
    if n_strips > 1:
        off_array_pos = pos
        for o in offsets:
            arrays += struct.pack(bo + "I", o)
        cnt_array_pos = pos + 4 * n_strips
        for s in strips:
            arrays += struct.pack(bo + "I", len(s))
        pos += len(arrays)
    if tables:
        tables_pos = pos
        arrays += tables
        pos += len(tables)

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        if typ == 3 and count == 1:
            return struct.pack(bo + "HHIHH", tag, typ, count, value, 0)
        return struct.pack(bo + "HHII", tag, typ, count, value)

    entries = [
        entry(_WIDTH, 4, 1, w),
        entry(_LENGTH, 4, 1, h),
        entry(_BPS, 3, 1, 8),
        entry(_COMPRESSION, 3, 1, 7),
        entry(_PHOTOMETRIC, 3, 1, 1),
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
    if tables:
        # tag 347, type 7 (UNDEFINED): count = byte length, value = the
        # offset of the table stream (always > 4 bytes)
        entries.append(entry(_JPEGTABLES, 7, len(tables), tables_pos))
        entries.sort(key=lambda e: struct.unpack(bo + "H", e[:2])[0])
    ifd_pos = pos
    out[4:8] = struct.pack(bo + "I", ifd_pos)
    out += b"".join(strips) + bytes(arrays)
    out += struct.pack(bo + "H", len(entries))
    out += b"".join(entries)
    out += struct.pack(bo + "I", 0)
    return bytes(out)


def _read_values(buf: bytes, bo: str, typ: int, count: int, raw: bytes):
    """IFD entry value(s): inline when they fit in 4 bytes, else at the
    offset the value field points to.  Types: 1/7 (BYTE/UNDEFINED),
    3 (SHORT), 4 (LONG)."""
    size = {1: 1, 3: 2, 4: 4, 7: 1}.get(typ)
    if size is None:
        raise NotImplementedError(f"TIFF field type {typ}")
    fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[typ]
    total = size * count
    if total <= 4:
        return list(struct.unpack_from(bo + fmt * count, raw, 0))
    (off,) = struct.unpack(bo + "I", raw)
    return list(struct.unpack_from(bo + fmt * count, buf, off))


def _decode_ifd(buf: bytes, bo: str, ifd_off: int) -> tuple[np.ndarray, int]:
    """Decode one IFD's image; returns (pixels, next-IFD offset).
    Grayscale pages come back 2-D, RGB pages (h, w, 3)."""
    (n_entries,) = struct.unpack_from(bo + "H", buf, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", buf, base)
        tags[tag] = _read_values(
            buf, bo, typ, count, buf[base + 8 : base + 12]
        )
    (next_ifd,) = struct.unpack_from(
        bo + "I", buf, ifd_off + 2 + 12 * n_entries
    )
    w, h = tags[_WIDTH][0], tags[_LENGTH][0]
    spp = tags.get(_SPP, [1])[0]
    bps = tags.get(_BPS, [8] * spp)
    if any(b != 8 for b in bps) or spp not in (1, 3):
        raise NotImplementedError("only 8-bit gray or 8-bit chunky RGB TIFF")
    photometric = tags.get(_PHOTOMETRIC, [1])[0]
    if spp == 1 and photometric not in (0, 1):
        raise NotImplementedError("only grayscale photometric TIFF")
    if spp == 3 and photometric != 2:
        raise NotImplementedError("3-sample TIFF must be photometric RGB")
    comp = tags.get(_COMPRESSION, [1])[0]
    if comp not in (1, 5, 7, 8, 32773):
        raise NotImplementedError(f"TIFF compression {comp}")
    predictor = tags.get(_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    planar = tags.get(_PLANAR, [1])[0]
    if planar not in (1, 2):
        raise NotImplementedError(f"TIFF planar configuration {planar}")

    def _unstrip(chunk: bytes, expected: int, row_spp: int) -> bytes:
        if comp == 32773:
            raw = packbits_decompress(chunk, expected)
        elif comp == 5:
            raw = lzw_decompress(chunk, expected)
        elif comp == 8:
            raw = zlib.decompress(chunk)
            if len(raw) != expected:
                raise ValueError("deflate strip size mismatch")
        else:
            if len(chunk) != expected:
                raise ValueError("strip byte count mismatch")
            raw = chunk
        # predictor 2 differences within each row, per sample — undo
        # AFTER decompression (spec section 14: prediction is applied
        # to the data before compression)
        if predictor == 2:
            raw = _hdiff_decode(raw, w, row_spp)
        return raw

    if comp == 7:
        # new-style JPEG-in-TIFF (Tech Note 2): each strip is a complete
        # JPEG stream — or, with JPEGTables (tag 347), an ABBREVIATED
        # stream whose DQT/DHT come from the shared table-specification
        # stream, spliced in right after the strip's SOI — decoded by
        # the real baseline codec, then stacked in strip order
        if spp != 1 or planar == 2 or predictor == 2:
            raise NotImplementedError("JPEG-in-TIFF: grayscale chunky only")
        from .jpeg import decode_baseline_jpeg

        shared = b""
        if _JPEGTABLES in tags:
            jt = bytes(tags[_JPEGTABLES])
            if jt[:2] != b"\xff\xd8" or jt[-2:] != b"\xff\xd9":
                raise ValueError("JPEGTables must be SOI..EOI delimited")
            shared = jt[2:-2]
        offsets = tags[_STRIP_OFFSETS]
        counts = tags[_STRIP_COUNTS]
        rps = tags.get(_ROWS_PER_STRIP, [h])[0]
        parts = []
        for si, (o, c) in enumerate(zip(offsets, counts)):
            strip = buf[o : o + c]
            if shared:
                if strip[:2] != b"\xff\xd8":
                    raise ValueError("abbreviated JPEG strip missing SOI")
                strip = b"\xff\xd8" + shared + strip[2:]
            part = decode_baseline_jpeg(strip)
            rows = min(rps, h - si * rps)
            if part.shape != (rows, w):
                raise ValueError("JPEG strip dimensions mismatch")
            parts.append(part)
        px = np.vstack(parts)
    elif _STRIP_OFFSETS in tags:
        offsets = tags[_STRIP_OFFSETS]
        counts = tags[_STRIP_COUNTS]
        rps = tags.get(_ROWS_PER_STRIP, [h])[0]
        strips_per_image = (h + rps - 1) // rps
        if planar == 2 and spp == 3:
            # planar layout: all of sample 0's strips, then 1's, then
            # 2's — each strip holds ONE sample's rows
            if len(offsets) != 3 * strips_per_image:
                raise ValueError("planar TIFF: wrong StripOffsets count")
            full = np.zeros((h, w, 3), dtype=np.uint8)
            for p in range(3):
                out = bytearray()
                for si in range(strips_per_image):
                    idx = p * strips_per_image + si
                    rows = min(rps, h - si * rps)
                    out += _unstrip(
                        buf[offsets[idx] : offsets[idx] + counts[idx]],
                        rows * w,
                        1,
                    )
                full[:, :, p] = np.frombuffer(bytes(out), dtype=np.uint8).reshape(
                    h, w
                )
            px = full
        else:
            out = bytearray()
            for si, (o, c) in enumerate(zip(offsets, counts)):
                rows = min(rps, h - si * rps)
                out += _unstrip(buf[o : o + c], rows * w * spp, spp)
            px = np.frombuffer(bytes(out), dtype=np.uint8)
            px = px.reshape(h, w) if spp == 1 else px.reshape(h, w, 3)
    elif _TILE_OFFSETS in tags:
        # tiled layout: every tile is a full tile_w × tile_h raster
        # (edge tiles padded by the writer); the reader clips
        tw = tags[_TILE_WIDTH][0]
        th = tags[_TILE_LENGTH][0]
        offsets = tags[_TILE_OFFSETS]
        counts = tags[_TILE_COUNTS]
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        tiles_per_image = across * down
        n_planes = spp if (planar == 2 and spp == 3) else 1
        tile_spp = spp // n_planes  # 1 on planar, spp on chunky
        if len(offsets) != n_planes * tiles_per_image:
            raise ValueError(
                f"tiled TIFF: {len(offsets)} tiles, expected "
                f"{n_planes * tiles_per_image}"
            )
        full = np.zeros((h, w, spp), dtype=np.uint8)
        expected = tw * th * tile_spp
        for ti, (o, c) in enumerate(zip(offsets, counts)):
            chunk = buf[o : o + c]
            if comp == 32773:
                raw = packbits_decompress(chunk, expected)
            elif comp == 5:
                raw = lzw_decompress(chunk, expected)
            elif comp == 8:
                raw = zlib.decompress(chunk)
                if len(raw) != expected:
                    raise ValueError("deflate tile size mismatch")
            else:
                if len(chunk) != expected:
                    raise ValueError("tile byte count mismatch")
                raw = chunk
            # predictor 2 differences within each TILE row (tile_w wide,
            # per tile sample) — undone after decompression, before clip
            if predictor == 2:
                raw = _hdiff_decode(raw, tw, tile_spp)
            tile = np.frombuffer(raw, dtype=np.uint8).reshape(th, tw, tile_spp)
            plane, pi = divmod(ti, tiles_per_image)
            ty, tx = (pi // across) * th, (pi % across) * tw
            ch, cw = min(th, h - ty), min(tw, w - tx)
            if n_planes == 1:
                full[ty : ty + ch, tx : tx + cw] = tile[:ch, :cw]
            else:
                full[ty : ty + ch, tx : tx + cw, plane] = tile[:ch, :cw, 0]
        px = full[:, :, 0] if spp == 1 else full
    else:
        raise ValueError("TIFF with neither strip nor tile offsets")
    if photometric == 0:  # WhiteIsZero: invert
        px = 255 - px
    return px, next_ifd


def decode_tiff_pages(buf: bytes) -> list[np.ndarray]:
    """Walk the whole IFD chain — one array per page (the baseline
    multi-page layout: fax bundles, scanned multi-sheet documents)."""
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    magic, ifd_off = struct.unpack_from(bo + "HI", buf, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    pages: list[np.ndarray] = []
    seen: set[int] = set()
    while ifd_off != 0:
        if ifd_off in seen:
            raise ValueError("IFD chain loop")
        seen.add(ifd_off)
        px, ifd_off = _decode_ifd(buf, bo, ifd_off)
        pages.append(px)
    return pages


def decode_tiff(buf: bytes) -> np.ndarray:
    """Single-page strip TIFF → uint8 array (2-D gray or (h,w,3) RGB).
    Raises on multi-IFD files rather than silently dropping pages —
    use ``decode_tiff_pages`` for those."""
    pages = decode_tiff_pages(buf)
    if len(pages) != 1:
        raise ValueError(
            f"multi-IFD TIFF with {len(pages)} pages: use decode_tiff_pages"
        )
    return pages[0]


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

    return _spread(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


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


def make_tiff_tiled_image(image_id: int) -> bytes:
    """Deterministic REAL tiled TIFF: width = id%37+17, height =
    id%23+17 (always >= 2 tiles in each 16-px dimension with clipped
    edge tiles), sample v(x,y,c) = (id*7 + 3y + x div 5 + 50c) mod 256
    (c = 0 on grayscale), chunky RGB every 4th id, PackBits unless
    id%5 == 0, big-endian every 3rd id — closed-form for the SQL
    oracle, so a wrong tile origin, pad clip, channel interleave or
    run length breaks the hash."""
    w, h = image_id % 37 + 17, image_id % 23 + 17
    x = np.arange(w).reshape(1, w)
    y = np.arange(h).reshape(h, 1)
    base = image_id * 7
    if image_id % 4 == 1:
        c = np.arange(3).reshape(1, 1, 3)
        px = ((base + 3 * y[..., None] + x[..., None] // 5 + 50 * c) % 256).astype(
            np.uint8
        )
    else:
        px = ((base + 3 * y + x // 5) % 256).astype(np.uint8)
    return encode_tiff_tiled(
        px,
        tile_w=16,
        tile_h=16,
        packbits=(image_id % 5 != 0),
        big_endian=(image_id % 3 == 0),
    )


def synthesize_tiff_tiled_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus of REAL tiled TIFFs — MEDIA_SCHEMA output,
    Arrow-batched."""
    from .multimodal import MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_tiff_tiled_image(int(i))
                rows.append((str(int(i)), "image/tiff", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return _spread(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


TIFF_TILED_STATS_SCHEMA = StructType(
    [
        StructField("image_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("px_sum", LongType(), True),
        StructField("px_min", IntegerType(), True),
        StructField("px_max", IntegerType(), True),
    ]
)


def tiff_tiled_stats(media: DataFrame) -> DataFrame:
    """Integer pixel statistics via the tiled decode path (decode_tiff
    dispatches on TileOffsets vs StripOffsets)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_tiff(bytes(content)).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                ch = 1 if px.ndim == 2 else px.shape[2]
                rows.append(
                    (
                        int(path), w, h, ch,
                        int(px.sum()), int(px.min()), int(px.max()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in TIFF_TILED_STATS_SCHEMA]
            )

    return media.mapInPandas(stats, schema=TIFF_TILED_STATS_SCHEMA)


def make_tiff_tiled_pred_image(image_id: int) -> bytes:
    """Deterministic REAL tiled TIFF exercising the r10 tile seams:
    width = id%37+17, height = id%23+17 (>= 2 clipped-edge tiles each
    way), sample v(x,y,c) = (id*13 + 5y + x div 3 + 40c) mod 256
    (c = 0 on grayscale).  Design matrix: chunky/planar RGB every odd
    id (PLANAR configuration 2 unless id%5 == 0), compression cycles
    LZW/Deflate/PackBits/none by id%4, horizontal-differencing
    PREDICTOR on ids%3 != 0 (per tile row — tile_w wide, the seam the
    strip predictor left open), big-endian every 7th id."""
    w, h = image_id % 37 + 17, image_id % 23 + 17
    x = np.arange(w).reshape(1, w)
    y = np.arange(h).reshape(h, 1)
    base = image_id * 13
    if image_id % 2 == 1:
        c = np.arange(3).reshape(1, 1, 3)
        px = ((base + 5 * y[..., None] + x[..., None] // 3 + 40 * c) % 256).astype(
            np.uint8
        )
    else:
        px = ((base + 5 * y + x // 3) % 256).astype(np.uint8)
    return encode_tiff_tiled(
        px,
        tile_w=16,
        tile_h=16,
        big_endian=(image_id % 7 == 0),
        compression=(5, 8, 32773, 1)[image_id % 4],
        predictor=(2 if image_id % 3 != 0 else 1),
        planar=(2 if (image_id % 2 == 1 and image_id % 5 != 0) else 1),
    )


def synthesize_tiff_tiled_pred_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus of REAL predictor/planar/LZW tiled TIFFs —
    MEDIA_SCHEMA output, Arrow-batched."""
    from .multimodal import MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_tiff_tiled_pred_image(int(i))
                rows.append((str(int(i)), "image/tiff", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return _spread(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def make_tiff_jpeg_image(image_id: int) -> bytes:
    """Deterministic REAL JPEG-in-TIFF (compression 7): width =
    8*(id%3+1), height = 8*(id%4+1), every 8x8 block CONSTANT at
    v(bx, by) = (id*17 + 7bx + 19by) mod 256 — the exact-round-trip
    JPEG construction (operators/jpeg.py module docstring: a constant
    block quantizes to DC-only losslessly), so decoded pixel (x, y) =
    v(x//8, y//8) stays closed-form for the SQL oracle even though the
    codec is lossy in general.  One baseline JPEG stream per 8-row
    strip — COMPLETE streams for even ids, ABBREVIATED streams with
    the shared JPEGTables tag 347 for odd ids (the libtiff default);
    big-endian container every 3rd id."""
    w, h = 8 * (image_id % 3 + 1), 8 * (image_id % 4 + 1)
    bx = np.arange(w // 8).reshape(1, -1)
    by = np.arange(h // 8).reshape(-1, 1)
    v = (image_id * 17 + 7 * bx + 19 * by) % 256
    px = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)
    return encode_tiff_jpeg(
        px,
        rows_per_strip=8,
        big_endian=(image_id % 3 == 0),
        shared_tables=(image_id % 2 == 1),
    )


def synthesize_tiff_jpeg_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus of REAL JPEG-in-TIFF files — MEDIA_SCHEMA
    output, Arrow-batched."""
    from .multimodal import MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_tiff_jpeg_image(int(i))
                rows.append((str(int(i)), "image/tiff", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return _spread(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def make_tiff_multipage_image(image_id: int) -> bytes:
    """Deterministic REAL multi-IFD TIFF: id%3+2 pages chained through
    the next-IFD pointer, grayscale and chunky RGB alternating.  Page p
    has width (id+2p)%14+4, height (id+3p)%8+3, sample
    v(x,y,c) = (id*5 + 7p + 3y + x div 4 + 50c) mod 256 (c = 0 on
    grayscale pages) — x-runs of 4 exercise PackBits, per-page
    compression alternates ((id+p)%5 uncompressed), and the whole file
    is big-endian every 3rd id.  Closed-form for the SQL oracle."""
    n_pages = image_id % 3 + 2
    pages: list[np.ndarray] = []
    pb: list[bool] = []
    for p in range(n_pages):
        w = (image_id + 2 * p) % 14 + 4
        h = (image_id + 3 * p) % 8 + 3
        x = np.arange(w).reshape(1, w)
        y = np.arange(h).reshape(h, 1)
        base = image_id * 5 + 7 * p
        if p % 2 == 0:
            px = ((base + 3 * y + x // 4) % 256).astype(np.uint8)
        else:
            c = np.arange(3).reshape(1, 1, 3)
            px = (
                (base + 3 * y[..., None] + x[..., None] // 4 + 50 * c) % 256
            ).astype(np.uint8)
        pages.append(px)
        pb.append((image_id + p) % 5 != 0)
    return encode_tiff_multipage(
        pages, rows_per_strip=3, packbits=pb, big_endian=(image_id % 3 == 0)
    )


def synthesize_tiff_multipage_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus of REAL multi-page TIFFs — MEDIA_SCHEMA
    output, Arrow-batched."""
    from .multimodal import MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_tiff_multipage_image(int(i))
                rows.append((str(int(i)), "image/tiff", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return _spread(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


TIFF_PAGE_STATS_SCHEMA = StructType(
    [
        StructField("image_id", LongType(), False),
        StructField("page_idx", IntegerType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("px_sum", LongType(), True),
        StructField("px_min", IntegerType(), True),
        StructField("px_max", IntegerType(), True),
    ]
)


def tiff_multipage_stats(media: DataFrame) -> DataFrame:
    """Per-page integer pixel statistics via the full IFD-chain walk
    (``decode_tiff_pages``) — one output row per (file, page)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for p, px in enumerate(decode_tiff_pages(bytes(content))):
                    a = px.astype(np.int64)
                    h, w = a.shape[0], a.shape[1]
                    ch = 1 if a.ndim == 2 else a.shape[2]
                    rows.append(
                        (
                            int(path), p, w, h, ch,
                            int(a.sum()), int(a.min()), int(a.max()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in TIFF_PAGE_STATS_SCHEMA]
            )

    return media.mapInPandas(stats, schema=TIFF_PAGE_STATS_SCHEMA)


def make_tiff_lzw_image(image_id: int) -> bytes:
    """Deterministic REAL LZW-strip TIFF exercising the compression-5
    seams as a design matrix: RGB on even ids, horizontal-differencing
    predictor unless id%3==0, PLANAR configuration on id%4==2 (RGB
    only — planar collapses to chunky for one sample), Adobe Deflate
    (compression 8, zlib) on id%11==0, uncompressed control on id%7==0,
    big-endian on id%5==0.  pixel(x, y, c) =
    (id*11 + 7y + x div 4 + 31c) mod 256 — x-runs of 4 give LZW real
    repeats; closed-form for the SQL oracle."""
    w, h = image_id % 17 + 5, image_id % 9 + 4
    ch = 3 if image_id % 2 == 0 else 1
    x = np.arange(w).reshape(1, w, 1)
    y = np.arange(h).reshape(h, 1, 1)
    c = np.arange(ch).reshape(1, 1, ch)
    px = ((image_id * 11 + 7 * y + x // 4 + 31 * c) % 256).astype(np.uint8)
    if ch == 1:
        px = px[:, :, 0]
    return encode_tiff_lzw(
        px,
        rows_per_strip=3,
        compression=(
            8 if image_id % 11 == 0
            else 1 if image_id % 7 == 0
            else 5
        ),
        predictor=(1 if image_id % 3 == 0 else 2),
        planar=(2 if image_id % 4 == 2 else 1),
        big_endian=(image_id % 5 == 0),
    )


def synthesize_tiff_lzw_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus of REAL LZW/predictor/planar strip TIFFs —
    MEDIA_SCHEMA output, Arrow-batched."""
    from .multimodal import MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_tiff_lzw_image(int(i))
                rows.append((str(int(i)), "image/tiff", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return _spread(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def tiff_lzw_stats(media: DataFrame) -> DataFrame:
    """Integer pixel statistics via the LZW/predictor/planar strip
    decode path (same narrow-rows-out shape as tiff_tiled_stats)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_tiff(bytes(content)).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                ch = 1 if px.ndim == 2 else px.shape[2]
                rows.append(
                    (
                        int(path), w, h, ch,
                        int(px.sum()), int(px.min()), int(px.max()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in TIFF_TILED_STATS_SCHEMA]
            )

    return media.mapInPandas(stats, schema=TIFF_TILED_STATS_SCHEMA)
