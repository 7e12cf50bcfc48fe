"""BMP codec (8-bit palettized, BI_RGB and BI_RLE8) — pure Python,
stdlib ``struct`` + numpy.  Another REAL library-free codec next to PNG
(multimodal.decode_png_pixels), JPEG (jpeg.py), GIF LZW (gif.py) and
MJPEG/AVI (video.py): BMP's RLE8 is the classic run-length scheme
(encoded runs, absolute literal blocks, end-of-line / end-of-bitmap
markers, bottom-up row order, 16-bit-aligned absolute runs) that
Windows bitmaps and many sensor dumps still use.

Decoder scope: 8-bit palettized, BI_RGB (raw rows, 4-byte padded) and
BI_RLE8 (runs + absolute mode + EOL/EOB + the DELTA escape 00 02 dx dy,
which jumps the cursor right/up leaving skipped pixels at palette 0 —
the sparse-bitmap device).  Other bit depths raise; each seam is named
at its raise site.

Everything is lossless, so fixtures get exact closed-form oracles: the
encoder is exercised end-to-end by decoding what it wrote, and the
decoder's marker/run/absolute/padding handling is pinned by the
round-trip tests plus the oracled query."""

from __future__ import annotations

import struct

import numpy as np

_BI_RGB = 0
_BI_RLE8 = 1


def _headers(w: int, h: int, compression: int, data_len: int) -> bytes:
    """BITMAPFILEHEADER + BITMAPINFOHEADER + 256-entry grayscale palette
    (palette[i] = (i, i, i, 0) so palette index == sample value)."""
    palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    off = 14 + 40 + len(palette)
    fileh = struct.pack("<2sIHHI", b"BM", off + data_len, 0, 0, off)
    infoh = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, compression, data_len, 2835, 2835, 256, 0
    )
    return fileh + infoh + palette


def encode_bmp_raw(px: np.ndarray, top_down: bool = False) -> bytes:
    """Uncompressed (BI_RGB) 8-bit BMP, 4-byte padded rows.  Bottom-up
    by default; ``top_down=True`` writes the negative-biHeight variant
    (rows in natural order — the layout DIBs from screen captures and
    many video pipelines use; the spec allows it ONLY for BI_RGB)."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape
    pad = (-w) % 4
    ys = range(h) if top_down else range(h - 1, -1, -1)
    rows = [px[y].tobytes() + b"\x00" * pad for y in ys]
    data = b"".join(rows)
    return _headers(w, -h if top_down else h, _BI_RGB, len(data)) + data


def encode_bmp_core(px: np.ndarray) -> bytes:
    """BITMAPCOREHEADER (OS/2 1.x) 8-bit BMP: the 12-byte header with
    16-bit width/height and a 3-byte-per-entry (BGR, no reserved byte)
    palette — always uncompressed, always bottom-up.  Still emitted by
    legacy scanners and clipboard paths."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape
    if w > 0xFFFF or h > 0xFFFF:
        raise ValueError("BITMAPCOREHEADER dimensions are 16-bit")
    palette = b"".join(struct.pack("<BBB", i, i, i) for i in range(256))
    off = 14 + 12 + len(palette)
    pad = (-w) % 4
    rows = [px[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)]
    data = b"".join(rows)
    fileh = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    coreh = struct.pack("<IHHHH", 12, w, h, 1, 8)
    return fileh + coreh + palette + data


def encode_bmp_rle8(px: np.ndarray) -> bytes:
    """RLE8-compressed 8-bit BMP.  Maximal equal runs of length >= 2
    become encoded runs (count, value); singletons are batched — 3+ in a
    row as an absolute block (03..FF, literal bytes, 16-bit aligned),
    fewer as length-1 encoded runs.  Every row ends with EOL (00 00),
    the image with EOB (00 01) — the layout Windows writes."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape
    out = bytearray()
    for y in range(h - 1, -1, -1):
        row = px[y]
        runs: list[tuple[int, int]] = []  # (length, value)
        x = 0
        while x < w:
            v = row[x]
            n = 1
            while x + n < w and row[x + n] == v and n < 255:
                n += 1
            runs.append((n, int(v)))
            x += n
        i = 0
        while i < len(runs):
            if runs[i][0] == 1:
                j = i
                while j < len(runs) and runs[j][0] == 1 and j - i < 255:
                    j += 1
                if j - i >= 3:  # absolute mode (spec minimum 3)
                    lits = bytes(runs[t][1] for t in range(i, j))
                    out += bytes([0x00, len(lits)]) + lits
                    if len(lits) % 2:
                        out += b"\x00"  # absolute runs are 16-bit aligned
                    i = j
                    continue
            n, v = runs[i]
            out += bytes([n, v])
            i += 1
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # EOB
    return _headers(w, h, _BI_RLE8, len(out)) + bytes(out)


def decode_bmp(buf: bytes) -> np.ndarray:
    """(h, w) uint8 sample array of an 8-bit palettized BMP (values are
    palette indices; the writers above use the identity grayscale
    palette).  Handles BI_RGB row padding and the full BI_RLE8 marker
    set including the 00 02 dx dy delta escape (skipped pixels stay
    0, per the spec's undefined-gap convention), negative-biHeight
    top-down BI_RGB bitmaps, and the 12-byte BITMAPCOREHEADER (OS/2)
    variant."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size == 12:  # BITMAPCOREHEADER: 16-bit dims, BI_RGB only
        w, h = struct.unpack_from("<HH", buf, 18)
        bpp = struct.unpack_from("<H", buf, 24)[0]
        comp = _BI_RGB
    elif hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size}")
    else:
        w, h = struct.unpack_from("<ii", buf, 18)
        bpp = struct.unpack_from("<H", buf, 28)[0]
        comp = struct.unpack_from("<I", buf, 30)[0]
    top_down = h < 0
    if top_down:
        if comp != _BI_RGB:
            raise ValueError("top-down BMP must be BI_RGB (spec)")
        h = -h
    if bpp != 8:
        raise NotImplementedError(f"{bpp}-bit BMP (only 8-bit palettized)")
    out = np.zeros((h, w), dtype=np.uint8)
    if comp == _BI_RGB:
        stride = w + ((-w) % 4)
        for y in range(h):
            row = buf[off + y * stride : off + y * stride + w]
            dst = y if top_down else h - 1 - y
            out[dst] = np.frombuffer(row, dtype=np.uint8)
        return out
    if comp != _BI_RLE8:
        raise NotImplementedError(f"BMP compression {comp}")
    x, y = 0, 0  # y counts bottom-up rows
    pos = off
    while pos + 1 < len(buf):
        c0, c1 = buf[pos], buf[pos + 1]
        pos += 2
        if c0 > 0:  # encoded run
            if y >= h or x + c0 > w:
                raise ValueError("RLE8 run past bitmap bounds")
            out[h - 1 - y, x : x + c0] = c1
            x += c0
        elif c1 == 0:  # EOL
            x, y = 0, y + 1
        elif c1 == 1:  # EOB
            return out
        elif c1 == 2:  # delta: cursor += (dx right, dy up); gaps stay 0
            if pos + 2 > len(buf):
                raise ValueError("RLE8 delta escape truncated")
            dx, dy = buf[pos], buf[pos + 1]
            pos += 2
            x, y = x + dx, y + dy
            if x > w or y >= h:
                raise ValueError("RLE8 delta escape outside bitmap")
        else:  # absolute mode: c1 literal bytes, 16-bit aligned
            if y >= h or x + c1 > w:
                raise ValueError("RLE8 absolute block past bitmap bounds")
            lits = buf[pos : pos + c1]
            out[h - 1 - y, x : x + c1] = np.frombuffer(lits, dtype=np.uint8)
            x += c1
            pos += c1 + (c1 % 2)
    raise ValueError("RLE8 stream ended without EOB")


def make_bmp_image(image_id: int) -> bytes:
    """Deterministic REAL RLE8 BMP from an integer id: width =
    4·(id%4+2), height = id%3+2, pixel (x, y) = (id·3 + 5·y +
    x // (1 + id%3)) mod 251 — run lengths cycle 1/2/3 with the id, so
    the corpus exercises encoded runs, absolute literal blocks (with
    their 16-bit alignment pad) and both markers; decoded pixels are
    closed-form for the SQL oracle."""
    w, h = 4 * (image_id % 4 + 2), image_id % 3 + 2
    x = np.arange(w).reshape(1, -1)
    y = np.arange(h).reshape(-1, 1)
    v = (image_id * 3 + 5 * y + x // (1 + image_id % 3)) % 251
    return encode_bmp_rle8(v.astype(np.uint8))


# ---------------------------------------------------------------------------
# 4-bit (16-color) BMP — BI_RGB packed nibbles and BI_RLE4
# ---------------------------------------------------------------------------

_BI_RLE4 = 2


def _headers4(w: int, h: int, compression: int, data_len: int) -> bytes:
    """File + info header with biBitCount=4 and a 16-entry palette
    (palette[i] = (17i, 17i, 17i, 0): index == sample, spread to the
    full gray range)."""
    palette = b"".join(
        struct.pack("<BBBB", 17 * i, 17 * i, 17 * i, 0) for i in range(16)
    )
    off = 14 + 40 + len(palette)
    fileh = struct.pack("<2sIHHI", b"BM", off + data_len, 0, 0, off)
    infoh = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 4, compression, data_len, 2835, 2835, 16, 0
    )
    return fileh + infoh + palette


def _pack_nibbles(vals) -> bytes:
    out = bytearray()
    for i in range(0, len(vals), 2):
        hi = vals[i] & 0x0F
        lo = vals[i + 1] & 0x0F if i + 1 < len(vals) else 0
        out.append((hi << 4) | lo)
    return bytes(out)


def encode_bmp4_raw(px: np.ndarray, top_down: bool = False) -> bytes:
    """Uncompressed 4-bit BMP: two pixels per byte (high nibble first),
    rows padded to 4-byte boundaries.  Bottom-up by default;
    ``top_down=True`` writes the negative-biHeight variant (rows in
    natural order — valid for BI_RGB only, per the spec)."""
    px = np.asarray(px, dtype=np.uint8)
    if px.max(initial=0) > 15:
        raise ValueError("4-bit BMP samples must be < 16")
    h, w = px.shape
    rows = []
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        row = _pack_nibbles(list(px[y]))
        rows.append(row + b"\x00" * ((-len(row)) % 4))
    data = b"".join(rows)
    return _headers4(w, -h if top_down else h, _BI_RGB, len(data)) + data


def encode_bmp_rle4(px: np.ndarray) -> bytes:
    """BI_RLE4: encoded runs carry TWO alternating nibbles per data
    byte (a run of one value v encodes as (n, v<<4|v)); rows end with
    EOL 00 00, the bitmap with EOB 00 01.  Bottom-up.  This writer
    emits single-value encoded runs plus absolute literal blocks for
    length-1/2 stretches (16-bit aligned), so decoders see both
    modes."""
    px = np.asarray(px, dtype=np.uint8)
    if px.max(initial=0) > 15:
        raise ValueError("4-bit BMP samples must be < 16")
    h, w = px.shape
    out = bytearray()
    for y in range(h - 1, -1, -1):
        row = px[y]
        runs = []
        i = 0
        while i < w:
            j = i
            while j < w and row[j] == row[i]:
                j += 1
            runs.append((j - i, int(row[i])))
            i = j
        i = 0
        while i < len(runs):
            if runs[i][0] <= 2:
                j = i
                lits: list[int] = []
                while j < len(runs) and runs[j][0] <= 2:
                    lits += [runs[j][1]] * runs[j][0]
                    j += 1
                if len(lits) >= 3:  # absolute mode (spec minimum 3)
                    payload = _pack_nibbles(lits)
                    out += bytes([0x00, len(lits)]) + payload
                    if len(payload) % 2:
                        out += b"\x00"  # 16-bit alignment
                    i = j
                    continue
            n, v = runs[i]
            while n > 255:
                out += bytes([254, (v << 4) | v])
                n -= 254
            out += bytes([n, (v << 4) | v])
            i += 1
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # EOB
    return _headers4(w, h, _BI_RLE4, len(out)) + bytes(out)


def decode_bmp4(buf: bytes) -> np.ndarray:
    """(h, w) uint8 index array of a 4-bit BMP: BI_RGB packed nibbles
    (4-byte padded rows; bottom-up or negative-biHeight top-down) or
    BI_RLE4 (runs of alternating nibbles, absolute blocks, EOL/EOB,
    bottom-up)."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError(f"4-bit BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    comp = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 4:
        raise ValueError("decode_bmp4 handles 4-bit BMPs only")
    top_down = h < 0
    if top_down:
        if comp != _BI_RGB:
            raise ValueError("top-down BMP must be BI_RGB (spec)")
        h = -h
    out = np.zeros((h, w), dtype=np.uint8)

    def unpack(row: bytes, n: int) -> list[int]:
        vals: list[int] = []
        for b in row:
            vals.append(b >> 4)
            vals.append(b & 0x0F)
        return vals[:n]

    if comp == _BI_RGB:
        stride = ((w * 4 + 31) // 32) * 4
        for y in range(h):
            row = buf[off + y * stride : off + y * stride + (w + 1) // 2]
            dst = y if top_down else h - 1 - y
            out[dst] = unpack(row, w)
        return out
    if comp != _BI_RLE4:
        raise NotImplementedError(f"4-bit BMP compression {comp}")
    x, y = 0, 0
    pos = off
    while pos + 1 < len(buf):
        c0, c1 = buf[pos], buf[pos + 1]
        pos += 2
        if c0 > 0:  # encoded run of alternating nibbles
            if y >= h or x + c0 > w:
                raise ValueError("RLE4 run past bitmap bounds")
            pair = [c1 >> 4, c1 & 0x0F]
            for i in range(c0):
                out[h - 1 - y, x + i] = pair[i % 2]
            x += c0
        elif c1 == 0:  # EOL
            x, y = 0, y + 1
        elif c1 == 1:  # EOB
            return out
        elif c1 == 2:  # delta — gaps stay 0
            if pos + 2 > len(buf):
                raise ValueError("RLE4 delta escape truncated")
            dx, dy = buf[pos], buf[pos + 1]
            pos += 2
            x, y = x + dx, y + dy
            if x > w or y >= h:
                raise ValueError("RLE4 delta past bitmap bounds")
        else:  # absolute block of c1 nibbles, 16-bit aligned
            nbytes = (c1 + 1) // 2
            vals = unpack(buf[pos : pos + nbytes], c1)
            pos += nbytes + (nbytes % 2)
            if y >= h or x + c1 > w:
                raise ValueError("RLE4 absolute run past bitmap bounds")
            out[h - 1 - y, x : x + c1] = vals
            x += c1
    raise ValueError("RLE4 stream ended without EOB")


def make_bmp4_image(image_id: int) -> bytes:
    """Deterministic REAL 4-bit BMP: width = id%14+4, height = id%9+3,
    sample (x, y) = (id*3 + 2*x + 5*y) % 16 — even ids RLE4 (runs +
    absolute blocks), id%4==1 raw packed nibbles bottom-up, id%4==3
    raw TOP-DOWN (negative biHeight); all decode to the same closed
    form, so the oracle breaks on any row-order drift."""
    w, h = image_id % 14 + 4, image_id % 9 + 3
    x = np.arange(w).reshape(1, -1)
    y = np.arange(h).reshape(-1, 1)
    v = ((image_id * 3 + 2 * x + 5 * y) % 16).astype(np.uint8)
    if image_id % 2 == 0:
        return encode_bmp_rle4(v)
    return encode_bmp4_raw(v, top_down=image_id % 4 == 3)
