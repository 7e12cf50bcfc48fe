"""Adam7-interlaced and palette PNG codec paths (pure-Python — the
Spark-side plumbing is covered by the multimodal_png_variants_stats
oracle row)."""

from __future__ import annotations

import numpy as np
import pytest

from nemsis_xml_parser_spark.operators.multimodal import (
    decode_png_pixels,
    encode_png_interlaced,
    encode_png_palette,
    make_png_variant_image,
)


def test_adam7_roundtrip_various_dims():
    rng = np.random.default_rng(7)
    # dims straddling the 8x8 pass grid: empty passes, 1-col/1-row passes
    for h, w in [(1, 1), (2, 3), (4, 4), (7, 9), (8, 8), (13, 21), (16, 24)]:
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        out = decode_png_pixels(encode_png_interlaced(px))
        assert (out == px).all(), (h, w)


def test_adam7_wire_flags_interlace():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    buf = encode_png_interlaced(px)
    ihdr = buf.index(b"IHDR") + 4
    assert buf[ihdr + 12] == 1  # interlace method byte


def test_palette_roundtrip_expands_plte():
    idx = (np.arange(30).reshape(5, 6) % 16).astype(np.uint8)
    palette = [(j * 11 % 256, j * 13 % 256, j * 17 % 256) for j in range(16)]
    out = decode_png_pixels(encode_png_palette(idx, palette))
    exp = np.array(palette, dtype=np.uint8)[idx]
    assert (out == exp).all()
    assert b"PLTE" in encode_png_palette(idx, palette)


def test_palette_rejects_oversize():
    idx = np.zeros((2, 2), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_png_palette(idx, [(0, 0, 0)] * 257)


def test_variant_fixture_matches_closed_form():
    for i in (0, 1, 6, 13, 48, 95):
        w, h = i % 24 + 4, i % 16 + 4
        out = decode_png_pixels(make_png_variant_image(i))
        x = np.arange(w).reshape(1, w, 1)
        y = np.arange(h).reshape(h, 1, 1)
        c = np.arange(3).reshape(1, 1, 3)
        if i % 2 == 0:
            exp = (i * 7 + 3 * x + 5 * y + 11 * c) % 256
        else:
            exp = (((i * 7 + 3 * x + 5 * y) % 64) * (3 + 2 * c)) % 256
        assert (out == exp).all(), i


def test_subbyte_roundtrip_and_fixture_exact():
    """1/2/4-bit grey + palettized PNGs (r11: the sub-byte seam):
    packed MSB-first scanlines, 1-byte filter distance, padding bits
    dropped, palette expansion — decode(make) matches the closed form."""
    import numpy as np

    from nemsis_xml_parser_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_subbyte,
        make_png_subbyte_image,
    )

    for i in range(18):
        px = decode_png_pixels(make_png_subbyte_image(i))
        w, h = i % 24 + 4, i % 16 + 4
        depth = (1, 2, 4)[i % 3]
        x = np.arange(w).reshape(1, w)
        y = np.arange(h).reshape(h, 1)
        lv = (i * 7 + 3 * x + 5 * y) % (1 << depth)
        if i % 2 == 0:
            exp = lv.reshape(h, w, 1)
        else:
            pal = np.array(
                [((37 * j) % 256, (59 * j) % 256, (83 * j) % 256)
                 for j in range(1 << depth)]
            )
            exp = pal[lv]
        assert px.shape == exp.shape and (px == exp).all(), i
    # odd widths: the last byte's padding bits must fall off
    odd = np.array([[1, 0, 3], [2, 3, 1]], dtype=np.uint8)
    out = decode_png_pixels(encode_png_subbyte(odd, 2))
    assert (out[:, :, 0] == odd).all()
    # sample exceeding the depth is rejected at encode time
    try:
        encode_png_subbyte(np.array([[4]], dtype=np.uint8), 2)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
