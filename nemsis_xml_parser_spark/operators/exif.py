"""EXIF metadata read/write — the APP1 segment of a JPEG carries a
complete TIFF IFD structure ("Exif\\0\\0" + byte-order header + IFD0),
and image-curation pipelines read it for orientation, timestamps and
resolution before any pixel work.

Writer: a minimal, spec-conformant IFD0 (entries in ascending tag
order — TIFF 6.0 requires it; the in-repo TIFF codecs learned that
lesson in r10) with SHORT, ASCII and RATIONAL entries, the RATIONAL
carried out-of-line through the value-offset indirection that makes
IFD parsing non-trivial.  Both byte orders are emitted (II and MM) so
the reader's endianness handling is exercised, not assumed.

Reader: marker walk to APP1/"Exif\\0\\0", TIFF header validation
(byte order, magic 42), IFD0 entry scan with type-aware value
extraction (inline when size <= 4 bytes, offset-followed otherwise).

Reference parity: none — §2.I multimodal-metadata tier.
"""

from __future__ import annotations

import struct

__all__ = ["build_exif_app1", "insert_exif", "decode_jpeg_exif"]

TAG_DESCRIPTION = 0x010E
TAG_ORIENTATION = 0x0112
TAG_XRESOLUTION = 0x011A
TAG_DATETIME = 0x0132

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def build_exif_app1(
    orientation: int,
    datetime_str: str,
    description: str,
    xres: tuple[int, int],
    big_endian: bool = False,
) -> bytes:
    """APP1 payload: Exif\\0\\0 + TIFF header + IFD0 with the four tags
    in ascending order; ASCII and RATIONAL values out-of-line."""
    bo = ">" if big_endian else "<"
    desc = description.encode("ascii") + b"\x00"
    dt = datetime_str.encode("ascii") + b"\x00"
    entries = [
        (TAG_DESCRIPTION, 2, len(desc), desc),
        (TAG_ORIENTATION, 3, 1, None),
        (TAG_XRESOLUTION, 5, 1, struct.pack(bo + "II", *xres)),
        (TAG_DATETIME, 2, len(dt), dt),
    ]
    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4  # header + count + entries + next-IFD
    ifd = struct.pack(bo + "H", n)
    tail = b""
    for tag, typ, count, payload in sorted(entries):
        if payload is None:  # the inline SHORT
            val = struct.pack(bo + "HH", orientation, 0)
        elif len(payload) <= 4:
            val = payload + b"\x00" * (4 - len(payload))
        else:
            val = struct.pack(bo + "I", data_off + len(tail))
            tail += payload
        ifd += struct.pack(bo + "HHI", tag, typ, count) + val
    ifd += struct.pack(bo + "I", 0)  # no next IFD
    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(bo + "HI", 42, 8)
        + ifd
        + tail
    )
    return b"Exif\x00\x00" + tiff


def insert_exif(jpeg: bytes, app1_payload: bytes) -> bytes:
    """Insert the APP1 segment immediately after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    seg = b"\xff\xe1" + struct.pack(">H", len(app1_payload) + 2) + app1_payload
    return jpeg[:2] + seg + jpeg[2:]


def decode_jpeg_exif(buf: bytes) -> dict:
    """Parse the first EXIF APP1 of a JPEG into
    {orientation, datetime, description, xres_num, xres_den,
    byte_order} (missing tags → None).  Raises ValueError when no EXIF
    segment exists."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    tiff = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            break
        marker = buf[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # entropy data follows; EXIF must precede
            break
        seglen = struct.unpack(">H", buf[pos + 2 : pos + 4])[0]
        body = buf[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        pos += 2 + seglen
    if tiff is None:
        raise ValueError("no EXIF APP1 segment")
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("bad TIFF byte order in EXIF")
    magic, ifd_off = struct.unpack(bo + "HI", tiff[2:8])
    if magic != 42:
        raise ValueError("bad TIFF magic in EXIF")
    (n,) = struct.unpack(bo + "H", tiff[ifd_off : ifd_off + 2])
    out = {
        "orientation": None,
        "datetime": None,
        "description": None,
        "xres_num": None,
        "xres_den": None,
        "byte_order": "MM" if bo == ">" else "II",
    }
    for i in range(n):
        o = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(bo + "HHI", tiff[o : o + 8])
        size = _TYPE_SIZES.get(typ, 0) * count
        if size == 0:
            continue
        if size <= 4:
            raw = tiff[o + 8 : o + 8 + size]
        else:
            (off,) = struct.unpack(bo + "I", tiff[o + 8 : o + 12])
            raw = tiff[off : off + size]
        if tag == TAG_ORIENTATION and typ == 3:
            out["orientation"] = struct.unpack(bo + "H", raw[:2])[0]
        elif tag == TAG_DATETIME and typ == 2:
            out["datetime"] = raw.rstrip(b"\x00").decode("ascii")
        elif tag == TAG_DESCRIPTION and typ == 2:
            out["description"] = raw.rstrip(b"\x00").decode("ascii")
        elif tag == TAG_XRESOLUTION and typ == 5:
            num, den = struct.unpack(bo + "II", raw)
            out["xres_num"], out["xres_den"] = num, den
    return out
