"""GIF87a codec: LZW round trips (overflow, KwKwK), container seams."""

from __future__ import annotations

import numpy as np
import pytest

from nemsis_xml_parser_spark.operators.gif import (
    decode_gif,
    encode_gif,
    lzw_compress,
    lzw_decompress,
    make_gif_image,
)


def test_lzw_roundtrip_random_and_degenerate():
    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"\x00",
        bytes(rng.integers(0, 256, 20000, dtype=np.uint8)),  # table overflow
        b"ab" * 5000,        # deep prefixes → KwKwK codes
        b"\x00" * 30000,     # maximal repetition
        bytes(range(256)) * 40,
    ]
    for data in cases:
        assert lzw_decompress(lzw_compress(data)) == data


def test_fixture_closed_form_roundtrip():
    for i in (0, 1, 7, 19, 23, 200):
        px = decode_gif(make_gif_image(i))
        w, h = i % 20 + 4, i % 12 + 4
        x = np.arange(w).reshape(1, w)
        y = np.arange(h).reshape(h, 1)
        assert (px == (i * 5 + 7 * x + 11 * y) % 256).all()


def test_arbitrary_grayscale_roundtrip():
    rng = np.random.default_rng(11)
    for _ in range(4):
        a = rng.integers(0, 256, (int(rng.integers(1, 50)), int(rng.integers(1, 50))),
                         dtype=np.uint8)
        assert (decode_gif(encode_gif(a)) == a).all()


def test_gif89a_extension_blocks_are_skipped():
    buf = bytearray(make_gif_image(5))
    buf[:6] = b"GIF89a"
    # splice a Graphic Control Extension before the image descriptor
    idesc = buf.index(0x2C, 13 + 768)
    gce = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0])
    patched = bytes(buf[:idesc]) + gce + bytes(buf[idesc:])
    assert (decode_gif(patched) == decode_gif(make_gif_image(5))).all()


def test_not_a_gif_raises():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG\r\n")


def test_interlaced_flag_raises():
    buf = bytearray(make_gif_image(3))
    idesc = buf.index(0x2C, 13 + 768)
    buf[idesc + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(buf))


def test_color_encode_not_implemented():
    with pytest.raises(NotImplementedError):
        encode_gif(np.zeros((4, 4, 3), dtype=np.uint8))


def test_truncated_stream_raises():
    with pytest.raises(ValueError):
        lzw_decompress(b"\x01")
