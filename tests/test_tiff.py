"""TIFF codec: PackBits round-trips, strip assembly, both byte orders,
inline vs offset IFD values, photometric inversion, named seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nemsis_xml_parser_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    make_tiff_image,
    packbits_compress,
    packbits_decompress,
)


def test_packbits_known_vector():
    # the classic Apple TN1023 example
    data = bytes.fromhex("AAAAAA80002AAAAAAAAAAA800022AAAAAAAAAAAAAAAAAAAAAA")
    comp = packbits_compress(data)
    assert packbits_decompress(comp, len(data)) == data
    assert len(comp) < len(data)


def test_packbits_roundtrip_property():
    rng = np.random.default_rng(3)
    for _ in range(30):
        n = int(rng.integers(0, 600))
        d = rng.integers(0, 4, n).astype(np.uint8).tobytes()  # runny alphabet
        assert packbits_decompress(packbits_compress(d), len(d)) == d


def test_packbits_noop_header_skipped():
    # 0x80 is a no-op and must not consume payload
    assert packbits_decompress(b"\x80\x00A", 1) == b"A"


def test_packbits_length_mismatch_raises():
    with pytest.raises(ValueError, match="PackBits"):
        packbits_decompress(b"\x00A", 5)


@pytest.mark.parametrize("packbits", [True, False])
@pytest.mark.parametrize("big_endian", [True, False])
def test_tiff_roundtrip(packbits, big_endian):
    rng = np.random.default_rng(11)
    for h, w in ((1, 1), (3, 9), (4, 4), (9, 2), (13, 31)):
        a = rng.integers(0, 256, (h, w), dtype=np.uint8)
        got = decode_tiff(
            encode_tiff(a, rows_per_strip=4, packbits=packbits, big_endian=big_endian)
        )
        assert (got == a).all()


def test_single_strip_inline_offsets():
    # h <= rows_per_strip → count-1 strip arrays stay inline in the IFD
    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert (decode_tiff(encode_tiff(a, rows_per_strip=8)) == a).all()


def test_white_is_zero_inverts():
    a = np.full((2, 2), 10, dtype=np.uint8)
    buf = bytearray(encode_tiff(a, packbits=False))
    # patch PhotometricInterpretation (tag 262) from 1 to 0
    i = buf.find(struct.pack("<HHIHH", 262, 3, 1, 1, 0))
    assert i > 0
    buf[i : i + 12] = struct.pack("<HHIHH", 262, 3, 1, 0, 0)
    assert (decode_tiff(bytes(buf)) == 245).all()


def test_fixture_closed_form():
    for i in (0, 3, 5, 7, 15, 60):
        px = decode_tiff(make_tiff_image(i)).astype(np.int64)
        w, h = i % 20 + 4, i % 12 + 4
        x = np.arange(w).reshape(1, w)
        y = np.arange(h).reshape(h, 1)
        assert (px == (i * 3 + 5 * y + x // 6) % 256).all()


def test_not_a_tiff_raises():
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"GIF87a")


def test_unsupported_compression_seam():
    a = np.zeros((2, 2), dtype=np.uint8)
    buf = bytearray(encode_tiff(a, packbits=False))
    i = buf.find(struct.pack("<HHIHH", 259, 3, 1, 1, 0))
    # CCITT Group 4 (4): a named seam (LZW, Deflate and JPEG-in-TIFF
    # are real as of r10)
    buf[i : i + 12] = struct.pack("<HHIHH", 259, 3, 1, 4, 0)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(bytes(buf))


def test_unsupported_shape_seam():
    with pytest.raises(NotImplementedError):
        encode_tiff(np.zeros((2, 2, 4), dtype=np.uint8))  # RGBA: not yet


@pytest.mark.parametrize("packbits", [True, False])
@pytest.mark.parametrize("big_endian", [True, False])
def test_rgb_roundtrip(packbits, big_endian):
    rng = np.random.default_rng(23)
    for h, w in ((1, 1), (3, 9), (9, 2), (7, 13)):
        a = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        got = decode_tiff(
            encode_tiff(a, packbits=packbits, big_endian=big_endian)
        )
        assert got.shape == (h, w, 3)
        assert (got == a).all()


def test_multipage_roundtrip_mixed_pages():
    from nemsis_xml_parser_spark.operators.tiff import (
        decode_tiff_pages,
        encode_tiff_multipage,
    )

    rng = np.random.default_rng(29)
    pages = [
        rng.integers(0, 256, (5, 8)).astype(np.uint8),
        rng.integers(0, 256, (7, 4, 3)).astype(np.uint8),
        rng.integers(0, 256, (3, 14)).astype(np.uint8),
    ]
    buf = encode_tiff_multipage(pages, 2, [True, False, True], True)
    got = decode_tiff_pages(buf)
    assert len(got) == 3
    for a, b in zip(pages, got):
        assert a.shape == b.shape and (a == b).all()


def test_multipage_fixture_closed_form():
    from nemsis_xml_parser_spark.operators.tiff import (
        decode_tiff_pages,
        make_tiff_multipage_image,
    )

    for i in (0, 1, 2, 3, 4, 5, 7, 11, 30):
        got = decode_tiff_pages(make_tiff_multipage_image(i))
        assert len(got) == i % 3 + 2
        for p, px in enumerate(got):
            w, h = (i + 2 * p) % 14 + 4, (i + 3 * p) % 8 + 3
            x = np.arange(w).reshape(1, w)
            y = np.arange(h).reshape(h, 1)
            base = i * 5 + 7 * p
            if p % 2 == 0:
                exp = ((base + 3 * y + x // 4) % 256).astype(np.uint8)
            else:
                c = np.arange(3).reshape(1, 1, 3)
                exp = (
                    (base + 3 * y[..., None] + x[..., None] // 4 + 50 * c)
                    % 256
                ).astype(np.uint8)
            assert px.shape == exp.shape and (px == exp).all(), (i, p)


def test_decode_tiff_refuses_multipage():
    from nemsis_xml_parser_spark.operators.tiff import (
        make_tiff_multipage_image,
    )

    with pytest.raises(ValueError, match="decode_tiff_pages"):
        decode_tiff(make_tiff_multipage_image(3))


def test_ifd_chain_loop_detected():
    from nemsis_xml_parser_spark.operators.tiff import decode_tiff_pages

    buf = bytearray(encode_tiff(np.zeros((2, 2), dtype=np.uint8)))
    # point the (single) IFD's next pointer back at itself
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n_entries,) = struct.unpack_from("<H", buf, ifd_off)
    next_pos = ifd_off + 2 + 12 * n_entries
    buf[next_pos : next_pos + 4] = struct.pack("<I", ifd_off)
    with pytest.raises(ValueError, match="loop"):
        decode_tiff_pages(bytes(buf))


def test_tiled_roundtrip_gray_and_rgb():
    import numpy as np

    from nemsis_xml_parser_spark.operators.tiff import (
        decode_tiff,
        encode_tiff_tiled,
    )

    rng = np.random.default_rng(8)
    for shape in [(10, 12), (17, 33), (23, 53, 3), (16, 16), (48, 32, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for pb in (True, False):
            for be in (True, False):
                out = decode_tiff(
                    encode_tiff_tiled(px, packbits=pb, big_endian=be)
                )
                assert out.shape == px.shape
                assert (out == px).all()


def test_tiled_fixture_matches_formula():
    import numpy as np

    from nemsis_xml_parser_spark.operators.tiff import (
        decode_tiff,
        make_tiff_tiled_image,
    )

    for i in (0, 1, 3, 5, 12, 37, 97):
        px = decode_tiff(make_tiff_tiled_image(i))
        w, h = i % 37 + 17, i % 23 + 17
        x = np.arange(w).reshape(1, w)
        y = np.arange(h).reshape(h, 1)
        if i % 4 == 1:
            c = np.arange(3).reshape(1, 1, 3)
            exp = (
                (i * 7 + 3 * y[..., None] + x[..., None] // 5 + 50 * c) % 256
            ).astype(np.uint8)
        else:
            exp = ((i * 7 + 3 * y + x // 5) % 256).astype(np.uint8)
        assert (px == exp).all()


def test_tiled_rejects_non_multiple_of_16():
    import numpy as np
    import pytest

    from nemsis_xml_parser_spark.operators.tiff import encode_tiff_tiled

    with pytest.raises(ValueError):
        encode_tiff_tiled(np.zeros((8, 8), dtype=np.uint8), tile_w=12)


# ---------------------------------------------------------------------------
# LZW / predictor / planar (round 9)
# ---------------------------------------------------------------------------

from nemsis_xml_parser_spark.operators.tiff import (  # noqa: E402
    encode_tiff_lzw,
    lzw_compress,
    lzw_decompress,
    make_tiff_lzw_image,
)


def test_lzw_roundtrip_width_growth_and_reset():
    """Random 20k bytes cross the 9->10->11->12 bit widths AND a table
    reset (Clear at next-code 4094); any early-change mismatch between
    writer and reader corrupts everything after the first boundary."""
    import random

    random.seed(11)
    data = bytes(random.randrange(256) for _ in range(20000))
    assert lzw_decompress(lzw_compress(data), len(data)) == data


def test_lzw_kwkwk_case():
    """cScSc-pattern input forces the code-equals-table-size branch."""
    data = b"ABABABA" * 40
    assert lzw_decompress(lzw_compress(data), len(data)) == data


def test_lzw_empty_and_single():
    assert lzw_decompress(lzw_compress(b""), 0) == b""
    assert lzw_decompress(lzw_compress(b"Q"), 1) == b"Q"


def test_lzw_truncated_stream_raises():
    enc = lzw_compress(b"hello world, hello world")
    with pytest.raises(ValueError, match="ended early"):
        lzw_decompress(enc[: len(enc) // 2], 24)


@pytest.mark.parametrize("comp", [1, 5])
@pytest.mark.parametrize("pred", [1, 2])
@pytest.mark.parametrize("planar", [1, 2])
def test_tiff_lzw_matrix_roundtrip(comp, pred, planar):
    rng = np.random.default_rng(comp * 7 + pred * 3 + planar)
    for shape in [(9, 13), (9, 13, 3), (4, 33, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        for be in (False, True):
            buf = encode_tiff_lzw(
                px, rows_per_strip=3, compression=comp,
                predictor=pred, planar=planar, big_endian=be,
            )
            got = decode_tiff(buf)
            assert got.shape == px.shape
            assert (got == px).all()


def test_tiff_lzw_fixture_closed_form():
    for image_id in [0, 2, 3, 5, 7, 14, 30]:
        px = decode_tiff(make_tiff_lzw_image(image_id)).astype(np.int64)
        h, w = px.shape[0], px.shape[1]
        assert (w, h) == (image_id % 17 + 5, image_id % 9 + 4)
        ch = 1 if px.ndim == 2 else px.shape[2]
        assert ch == (3 if image_id % 2 == 0 else 1)
        x = np.arange(w).reshape(1, w, 1)
        y = np.arange(h).reshape(h, 1, 1)
        c = np.arange(ch).reshape(1, 1, ch)
        exp = (image_id * 11 + 7 * y + x // 4 + 31 * c) % 256
        got = px if px.ndim == 3 else px[:, :, None]
        assert (got == exp).all()


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
@pytest.mark.parametrize("pred", [1, 2])
@pytest.mark.parametrize("planar", [1, 2])
def test_tiled_predictor_planar_matrix_roundtrip(comp, pred, planar):
    """r10: the tiled predictor/planar seams are CLOSED — the full
    compression x predictor x planar matrix round-trips bit-exactly on
    gray and RGB with clipped edge tiles, both byte orders."""
    from nemsis_xml_parser_spark.operators.tiff import (
        decode_tiff,
        encode_tiff_tiled,
    )

    rng = np.random.RandomState(comp * 10 + pred * 2 + planar)
    for shape in ((21, 37), (21, 37, 3)):
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        for be in (False, True):
            buf = encode_tiff_tiled(
                px, compression=comp, predictor=pred, planar=planar,
                big_endian=be,
            )
            got = decode_tiff(buf)
            assert got.shape == px.shape and (got == px).all()


def test_tiled_pred_fixture_matches_formula():
    from nemsis_xml_parser_spark.operators.tiff import (
        decode_tiff,
        make_tiff_tiled_pred_image,
    )

    for image_id in range(24):
        px = decode_tiff(make_tiff_tiled_pred_image(image_id))
        w, h = image_id % 37 + 17, image_id % 23 + 17
        ch = 3 if image_id % 2 == 1 else 1
        x = np.arange(w).reshape(1, w, 1)
        y = np.arange(h).reshape(h, 1, 1)
        c = np.arange(ch).reshape(1, 1, ch)
        exp = (image_id * 13 + 5 * y + x // 3 + 40 * c) % 256
        got = px if px.ndim == 3 else px[:, :, None]
        assert got.shape == (h, w, ch)
        assert (got == exp).all()


def test_jpeg_in_tiff_roundtrip_and_fixture():
    """Compression 7 (new-style JPEG-in-TIFF): each strip is a complete
    baseline JPEG; constant-block fixtures decode exactly."""
    from nemsis_xml_parser_spark.operators.tiff import (
        decode_tiff,
        encode_tiff_jpeg,
        make_tiff_jpeg_image,
    )

    for image_id in range(16):
        px = decode_tiff(make_tiff_jpeg_image(image_id))
        w, h = 8 * (image_id % 3 + 1), 8 * (image_id % 4 + 1)
        bx = np.arange(w) // 8
        by = np.arange(h) // 8
        exp = (
            image_id * 17 + 7 * bx.reshape(1, w) + 19 * by.reshape(h, 1)
        ) % 256
        assert px.shape == (h, w)
        assert (px == exp).all()
    # non-8-multiple dims refused (whole MCUs per strip)
    with pytest.raises(ValueError, match="8-multiple"):
        encode_tiff_jpeg(np.zeros((12, 16), dtype=np.uint8))
    with pytest.raises(NotImplementedError, match="grayscale"):
        encode_tiff_jpeg(np.zeros((16, 16, 3), dtype=np.uint8))


def test_jpeg_in_tiff_shared_tables_tag347():
    """shared_tables=True writes one JPEGTables stream (tag 347) and
    strips DQT/DHT from every per-strip stream; decode splices them
    back losslessly."""
    import struct

    from nemsis_xml_parser_spark.operators.tiff import (
        _JPEGTABLES,
        _jpeg_split,
        decode_tiff,
        encode_tiff_jpeg,
    )

    rng = np.random.default_rng(46)
    px = (rng.integers(0, 2, size=(24, 16)) * 255).astype(np.uint8)
    full = encode_tiff_jpeg(px, rows_per_strip=8)
    shared = encode_tiff_jpeg(px, rows_per_strip=8, shared_tables=True)
    # JPEG is lossy on this random image, but BOTH layouts must decode
    # to the SAME pixels (the entropy data is byte-identical)
    assert (decode_tiff(full) == decode_tiff(shared)).all()
    # the shared layout amortizes the table bytes: 3 strips, tables once
    assert len(shared) < len(full)
    # tag 347 present and SOI..EOI delimited with DQT+DHT only
    bo = "<"
    (ifd_off,) = struct.unpack_from(bo + "I", shared, 4)
    (n,) = struct.unpack_from(bo + "H", shared, ifd_off)
    tags = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", shared, base)
        tags[tag] = (typ, count, base)
    assert _JPEGTABLES in tags
    typ, count, base = tags[_JPEGTABLES]
    assert typ == 7
    (off,) = struct.unpack_from(bo + "I", shared, base + 8)
    jt = shared[off : off + count]
    assert jt[:2] == b"\xff\xd8" and jt[-2:] == b"\xff\xd9"
    markers = [m for m, _ in _jpeg_split(jt[:-2] + b"\xff\xda\x00\x02")[0]]
    assert set(markers[:-1]) <= {0xDB, 0xC4}
    # IFD entries stay ascending-tag sorted (TIFF spec requirement)
    tag_list = [
        struct.unpack_from(bo + "H", shared, ifd_off + 2 + 12 * i)[0]
        for i in range(n)
    ]
    assert tag_list == sorted(tag_list)
