"""BMP codec (operators/bmp.py): RLE8/raw round-trips, marker and
alignment handling, seam raises."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nemsis_xml_parser_spark.operators import bmp as B


def _fixture_expected(iid: int) -> np.ndarray:
    w, h = 4 * (iid % 4 + 2), iid % 3 + 2
    x = np.arange(w).reshape(1, -1)
    y = np.arange(h).reshape(-1, 1)
    return ((iid * 3 + 5 * y + x // (1 + iid % 3)) % 251).astype(np.uint8)


def test_fixture_roundtrip_closed_form():
    for iid in range(36):
        got = B.decode_bmp(B.make_bmp_image(iid))
        assert (got == _fixture_expected(iid)).all()


def test_raw_and_rle_agree_on_random_content():
    rng = np.random.RandomState(11)
    for w, h in [(1, 1), (3, 5), (7, 2), (254, 3), (255, 2), (256, 2)]:
        px = rng.randint(0, 256, (h, w)).astype(np.uint8)
        assert (B.decode_bmp(B.encode_bmp_rle8(px)) == px).all()
        assert (B.decode_bmp(B.encode_bmp_raw(px)) == px).all()


def test_absolute_mode_is_actually_emitted():
    # strictly increasing row = all singleton runs -> absolute blocks
    px = np.arange(16, dtype=np.uint8).reshape(1, 16)
    buf = B.encode_bmp_rle8(px)
    off = struct.unpack_from("<I", buf, 10)[0]
    data = buf[off:]
    assert data[0] == 0x00 and data[1] == 16  # one absolute block of 16
    assert (B.decode_bmp(buf) == px).all()


def test_odd_absolute_block_is_word_aligned():
    px = np.arange(5, dtype=np.uint8).reshape(1, 5)
    buf = B.encode_bmp_rle8(px)
    off = struct.unpack_from("<I", buf, 10)[0]
    data = buf[off:]
    assert data[0] == 0x00 and data[1] == 5
    assert data[2 + 5] == 0x00  # alignment pad byte
    assert (B.decode_bmp(buf) == px).all()


def test_seams_raise():
    with pytest.raises(ValueError, match="BM magic"):
        B.decode_bmp(b"XX" + b"\x00" * 60)
    buf = bytearray(B.make_bmp_image(1))
    struct.pack_into("<H", buf, 28, 24)  # claim 24-bit
    with pytest.raises(NotImplementedError, match="24-bit"):
        B.decode_bmp(bytes(buf))
    buf = bytearray(B.make_bmp_image(1))
    off = struct.unpack_from("<I", buf, 10)[0]
    # delta jumping outside the bitmap is a clean error, not a crash
    buf[off : off + 4] = b"\x00\x02\xff\xff"
    with pytest.raises(ValueError, match="delta escape outside"):
        B.decode_bmp(bytes(buf))
    # truncated stream without EOB
    buf = bytearray(B.make_bmp_image(2))
    with pytest.raises(ValueError, match="EOB"):
        B.decode_bmp(bytes(buf[:-2]))


def test_delta_escape_moves_cursor():
    # hand-built RLE8 stream: row0 (bottom): 3 pixels of 7, delta (+2, +1)
    # -> skips 2 columns and moves up one row, then 2 pixels of 9, EOL, EOB
    data = bytes(
        [3, 7,            # run: 3 x 7 at (0..2, bottom row)
         0, 2, 2, 1,      # delta: x += 2, y += 1 (one row up)
         2, 9,            # run: 2 x 9 at (5..6) of row 1
         0, 0,            # EOL
         0, 1]            # EOB
    )
    buf = B._headers(8, 3, 1, len(data)) + data
    px = B.decode_bmp(buf)
    exp = np.zeros((3, 8), dtype=np.uint8)
    exp[2, 0:3] = 7          # bottom row (stored first)
    exp[1, 5:7] = 9          # one row up, columns 5-6 after the delta
    assert (px == exp).all()


def test_top_down_roundtrip():
    import numpy as np

    from nemsis_xml_parser_spark.operators.bmp import decode_bmp, encode_bmp_raw

    rng = np.random.default_rng(3)
    for shape in [(5, 7), (12, 16), (1, 9), (9, 1)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        buf = encode_bmp_raw(px, top_down=True)
        # negative biHeight on the wire
        import struct

        assert struct.unpack_from("<i", buf, 22)[0] == -shape[0]
        assert (decode_bmp(buf) == px).all()


def test_top_down_rle_rejected():
    import struct

    import numpy as np
    import pytest

    from nemsis_xml_parser_spark.operators.bmp import decode_bmp, encode_bmp_rle8

    px = np.zeros((4, 4), dtype=np.uint8)
    buf = bytearray(encode_bmp_rle8(px))
    struct.pack_into("<i", buf, 22, -4)  # forge a top-down RLE8 header
    with pytest.raises(ValueError):
        decode_bmp(bytes(buf))


def test_core_header_roundtrip():
    import struct

    import numpy as np

    from nemsis_xml_parser_spark.operators.bmp import decode_bmp, encode_bmp_core

    rng = np.random.default_rng(4)
    for shape in [(6, 6), (3, 11), (17, 5)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        buf = encode_bmp_core(px)
        assert struct.unpack_from("<I", buf, 14)[0] == 12
        assert (decode_bmp(buf) == px).all()


# ---------------------------------------------------------------------------
# 4-bit (16-color) BMP
# ---------------------------------------------------------------------------


def test_bmp4_roundtrip_raw_and_rle4():
    import numpy as np

    from nemsis_xml_parser_spark.operators.bmp import (
        decode_bmp4,
        encode_bmp4_raw,
        encode_bmp_rle4,
    )

    rng = np.random.default_rng(44)
    for _ in range(10):
        h, w = rng.integers(1, 10), rng.integers(1, 18)
        px = rng.integers(0, 16, size=(h, w)).astype(np.uint8)
        assert (decode_bmp4(encode_bmp4_raw(px)) == px).all()
        assert (decode_bmp4(encode_bmp_rle4(px)) == px).all()


def test_bmp4_rle4_alternating_nibble_run():
    import struct

    import numpy as np

    from nemsis_xml_parser_spark.operators.bmp import _headers4, decode_bmp4

    # hand-built stream: one row '5 2 5 2 5' as a single encoded run of
    # 5 pixels with value byte 0x52, then EOL + EOB — pins the
    # alternating-nibble semantics an all-same-value encoder never emits
    data = bytes([5, 0x52]) + b"\x00\x00" + b"\x00\x01"
    buf = _headers4(5, 1, 2, len(data)) + data
    assert decode_bmp4(buf).tolist() == [[5, 2, 5, 2, 5]]
    # and an absolute block of 5 nibbles: 3 data bytes (odd) + the
    # 16-bit alignment pad the spec requires
    data = (
        bytes([0x00, 5, 0x7A, 0xB0, 0xE0, 0x00]) + b"\x00\x00" + b"\x00\x01"
    )
    buf = _headers4(5, 1, 2, len(data)) + data
    assert decode_bmp4(buf).tolist() == [[7, 10, 11, 0, 14]]


def test_bmp4_fixture_matches_formula():
    import numpy as np

    from nemsis_xml_parser_spark.operators.bmp import (
        decode_bmp4,
        make_bmp4_image,
    )

    for i in (0, 1, 4, 9, 27, 100):
        w, h = i % 14 + 4, i % 9 + 3
        out = decode_bmp4(make_bmp4_image(i))
        x = np.arange(w).reshape(1, -1)
        y = np.arange(h).reshape(-1, 1)
        assert (out == (i * 3 + 2 * x + 5 * y) % 16).all(), i


def test_bmp4_top_down_roundtrip():
    import numpy as np
    import struct

    from nemsis_xml_parser_spark.operators.bmp import (
        decode_bmp4,
        encode_bmp4_raw,
    )

    rng = np.random.default_rng(45)
    for _ in range(6):
        h, w = rng.integers(1, 10), rng.integers(1, 18)
        px = rng.integers(0, 16, size=(h, w)).astype(np.uint8)
        buf = encode_bmp4_raw(px, top_down=True)
        # the header really carries a negative biHeight
        assert struct.unpack_from("<i", buf, 22)[0] == -int(h)
        assert (decode_bmp4(buf) == px).all()
        # and it differs from the bottom-up bytes for multi-row images
        if h > 1 and not (px == px[::-1]).all():
            assert buf != encode_bmp4_raw(px)


def test_bmp4_fixture_top_down_ids_match_formula():
    import numpy as np
    import struct

    from nemsis_xml_parser_spark.operators.bmp import (
        decode_bmp4,
        make_bmp4_image,
    )

    for i in (3, 7, 11, 103):  # id % 4 == 3 → top-down raw variant
        buf = make_bmp4_image(i)
        assert struct.unpack_from("<i", buf, 22)[0] < 0, i
        w, h = i % 14 + 4, i % 9 + 3
        x = np.arange(w).reshape(1, -1)
        y = np.arange(h).reshape(-1, 1)
        assert (decode_bmp4(buf) == (i * 3 + 2 * x + 5 * y) % 16).all(), i
