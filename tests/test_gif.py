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


def test_interlaced_roundtrip():
    rng = np.random.default_rng(13)
    for h in (1, 2, 4, 5, 8, 9, 17, 33):
        a = rng.integers(0, 256, (h, 7), dtype=np.uint8)
        assert (decode_gif(encode_gif(a, interlace=True)) == a).all()


def test_interlaced_storage_differs_but_decodes_equal():
    # for h >= 2 the stored row order differs from scanline order, so the
    # two encodings are different byte streams that decode identically
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    plain, inter = encode_gif(a), encode_gif(a, interlace=True)
    assert plain != inter
    assert (decode_gif(plain) == decode_gif(inter)).all()


def test_local_color_table_luma_mapping():
    # inverted-gray local palette: decoded luma must be 255 - index
    a = np.arange(32, dtype=np.uint8).reshape(4, 8)
    pal = np.stack([np.arange(255, -1, -1, dtype=np.uint8)] * 3, axis=1)
    got = decode_gif(encode_gif(a, local_palette=pal))
    assert (got == 255 - a).all()


def test_color_palette_bt601_luma():
    # pure-red palette entry: luma = (299*255 + 500) // 1000 = 76
    a = np.zeros((2, 2), dtype=np.uint8)
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[0] = (255, 0, 0)
    got = decode_gif(encode_gif(a, local_palette=pal))
    assert (got == 76).all()


def test_interlaced_closed_form_fixture():
    from nemsis_xml_parser_spark.operators.gif import make_gif_image_interlaced

    for i in (0, 7, 123):
        assert (
            decode_gif(make_gif_image_interlaced(i))
            == decode_gif(make_gif_image(i))
        ).all()


def test_color_encode_not_implemented():
    with pytest.raises(NotImplementedError):
        encode_gif(np.zeros((4, 4, 3), dtype=np.uint8))


def test_truncated_stream_raises():
    with pytest.raises(ValueError):
        lzw_decompress(b"\x01")
