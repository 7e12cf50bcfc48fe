"""Baseline JPEG codec (operators/jpeg.py): Huffman + IDCT, stdlib only."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from nemsis_xml_parser_spark.operators import jpeg as J


def test_constant_block_roundtrip_exact():
    # the closed-form construction behind the oracle: constant 8x8
    # blocks with DC quantizer 8 must round-trip bit-exactly
    for iid in [0, 1, 2, 7, 13, 100, 255, 999]:
        px = J.decode_baseline_jpeg(J.make_jpeg_image(iid))
        w, h = 8 * (iid % 3 + 1), 8 * (iid % 2 + 1)
        bx = np.arange(w // 8).reshape(1, -1)
        by = np.arange(h // 8).reshape(-1, 1)
        want = np.repeat(
            np.repeat((iid * 11 + 13 * bx + 29 * by) % 256, 8, 0), 8, 1
        )
        assert px.shape == (h, w)
        assert (px == want).all()


def test_lossy_roundtrip_bounded_error():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    dec = J.decode_baseline_jpeg(J.encode_baseline_jpeg(img))
    err = np.abs(dec.astype(int) - img.astype(int))
    # worst case bounded by quantizer geometry (AC step 16)
    assert err.max() <= 64 and err.mean() < 8


def test_smooth_gradient_near_exact():
    gx = (np.tile(np.arange(32), (16, 1)) * 4).astype(np.uint8)
    dec = J.decode_baseline_jpeg(J.encode_baseline_jpeg(gx))
    assert np.abs(dec.astype(int) - gx.astype(int)).max() <= 4


def test_odd_dimensions_pad_and_crop():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (13, 21)).astype(np.uint8)
    dec = J.decode_baseline_jpeg(J.encode_baseline_jpeg(img))
    assert dec.shape == (13, 21)


def test_idct_matches_independent_definition():
    # decode-path IDCT (matrix form A.T @ S @ A) vs the textbook
    # per-pixel cosine double sum — two independent evaluation orders
    rng = np.random.RandomState(3)
    S = rng.randint(-512, 512, (8, 8)).astype(np.float64)

    def idct_reference(S):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                acc = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        acc += (
                            cu * cv / 4.0 * S[u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                out[x, y] = acc
        return out

    got = J._A.T @ S @ J._A
    assert np.abs(got - idct_reference(S)).max() < 1e-9


def test_golden_bytes_stable():
    # byte-identical synthesis across calls and runs (fixture contract)
    buf = J.make_jpeg_image(7)
    assert buf == J.make_jpeg_image(7)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    assert (
        hashlib.md5(buf).hexdigest() == "e38d5bfcb6ecdd573c39979cc324fcee"
    )


def test_progressive_and_subsampled_raise():
    buf = bytearray(J.make_jpeg_image(1))
    sof = buf.find(b"\xff\xc0")
    assert sof > 0
    prog = bytes(buf[:sof]) + b"\xff\xc2" + bytes(buf[sof + 2 :])
    with pytest.raises(NotImplementedError, match="progressive"):
        J.decode_baseline_jpeg(prog)
    sub = bytearray(buf)
    sub[sof + 2 + 2 + 6 + 1] = 0x33  # sampling factors 3x3 (beyond scope)
    with pytest.raises(NotImplementedError, match="sampling factors 3x3"):
        J.decode_baseline_jpeg(bytes(sub))
    color = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(NotImplementedError, match="grayscale"):
        J.encode_baseline_jpeg(color)


def test_restart_interval_roundtrip_and_marker_checks():
    # DRI fixtures (id % 4 != 0) round-trip to the closed form: byte
    # alignment, RSTn cycling and DC predictor resets all exercised
    for iid in (1, 2, 3, 5, 11):
        px = J.decode_baseline_jpeg(J.make_jpeg_image(iid))
        w, h = 8 * (iid % 3 + 1), 8 * (iid % 2 + 1)
        bx = np.arange(w // 8).reshape(1, -1)
        by = np.arange(h // 8).reshape(-1, 1)
        v = (iid * 11 + 13 * bx + 29 * by) % 256
        exp = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)
        assert (px == exp).all()
    # DRI framing must not change pixels on a lossy (gradient) image
    grad = (np.arange(40 * 40).reshape(40, 40) % 256).astype(np.uint8)
    base = J.decode_baseline_jpeg(J.encode_baseline_jpeg(grad))
    for ri in (1, 3, 7):
        dec = J.decode_baseline_jpeg(
            J.encode_baseline_jpeg(grad, restart_interval=ri)
        )
        assert (dec == base).all()
    # an out-of-sequence RSTn is a corrupt stream, not silently accepted
    buf = bytearray(J.encode_baseline_jpeg(grad, restart_interval=1))
    first_rst = next(
        i for i in range(buf.find(b"\xff\xda"), len(buf) - 1)
        if buf[i] == 0xFF and 0xD0 <= buf[i + 1] <= 0xD7
    )
    buf[first_rst + 1] = 0xD5  # expected RST0
    with pytest.raises(ValueError, match="out of sequence"):
        J.decode_baseline_jpeg(bytes(buf))


def test_byte_stuffing_roundtrip():
    # the bit layer must stuff 0x00 after emitted 0xFF bytes and the
    # reader must transparently strip it
    bw = J._BitWriter()
    for _ in range(4):
        bw.write(0xFF, 8)      # guaranteed stuffed bytes
    bw.write(0b101, 3)
    out = bw.flush()
    assert out.count(b"\xff\x00") == 4
    r = J._BitReader(out, 0)
    for _ in range(4):
        assert r.read_bits(8) == 0xFF
    assert r.read_bits(3) == 0b101


def test_decoder_reads_tables_from_stream():
    # swap in a DIFFERENT (still canonical) DC table: 12 symbols at
    # 5 bits instead of 4.  A decoder that assumed the encoder's table
    # instead of reading DHT would mis-decode; the stream carries the
    # new table, so decode must stay exact.
    iid = 13
    orig_codes = J._DC_CODES
    try:
        J._DC_CODES = {s: (i, 5) for i, s in enumerate(range(12))}
        buf = J.make_jpeg_image(iid)
    finally:
        J._DC_CODES = orig_codes
    px = J.decode_baseline_jpeg(buf)
    w, h = 8 * (iid % 3 + 1), 8 * (iid % 2 + 1)
    bx = np.arange(w // 8).reshape(1, -1)
    by = np.arange(h // 8).reshape(-1, 1)
    want = np.repeat(
        np.repeat((iid * 11 + 13 * bx + 29 * by) % 256, 8, 0), 8, 1
    )
    assert (px == want).all()


def test_420_constant_mcu_closed_form_exact():
    for iid in [0, 1, 2, 7, 13, 100, 255]:
        px = J.decode_baseline_jpeg(J.make_jpeg420_image(iid))
        w, h = 16 * (iid % 3 + 1), 16 * (iid % 2 + 1)
        assert px.shape == (h, w, 3)
        mx = np.arange(w // 16).reshape(1, -1)
        my = np.arange(h // 16).reshape(-1, 1)
        yv = (iid * 5 + 7 * mx + 11 * my) % 256
        cbv = 80 + (iid * 3 + 13 * mx + 17 * my) % 96
        crv = 80 + (iid * 7 + 19 * mx + 23 * my) % 96
        r = np.clip(np.round(yv + 1.402 * (crv - 128.0)), 0, 255)
        g = np.clip(
            np.round(
                yv - 0.344136 * (cbv - 128.0) - 0.714136 * (crv - 128.0)
            ),
            0,
            255,
        )
        b = np.clip(np.round(yv + 1.772 * (cbv - 128.0)), 0, 255)
        want = np.stack(
            [np.repeat(np.repeat(c, 16, 0), 16, 1) for c in (r, g, b)],
            axis=-1,
        )
        assert (px == want).all()


def test_rgb420_roundtrip_bounded_error_smooth():
    xx = np.tile(np.arange(32), (32, 1))
    yy = xx.T
    rgb = np.stack(
        [xx * 4 % 256, yy * 4 % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    dec = J.decode_baseline_jpeg(J.encode_baseline_jpeg_rgb420(rgb))
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert err.max() <= 32 and err.mean() < 6


def test_420_uses_both_quant_and_huffman_table_pairs():
    buf = J.make_jpeg420_image(5)
    # two DQT tables (ids 0 and 1) and four DHT tables (DC0/AC0/DC1/AC1)
    assert buf.count(b"\xff\xdb") == 2
    assert buf.count(b"\xff\xc4") == 4


def test_jpeg12_constant_blocks_lossless():
    import numpy as np

    from nemsis_xml_parser_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_jpeg12,
    )

    rng = np.random.default_rng(12)
    for _ in range(4):
        bh, bw = rng.integers(1, 4), rng.integers(1, 5)
        blocks = rng.integers(0, 4096, size=(bh, bw))
        px = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint16)
        out = decode_baseline_jpeg(encode_jpeg12(px))
        assert out.dtype == np.uint16
        assert (out == px).all()


def test_jpeg12_wire_format():
    import numpy as np

    from nemsis_xml_parser_spark.operators.jpeg import encode_jpeg12

    buf = encode_jpeg12(np.zeros((8, 8), dtype=np.uint16))
    assert b"\xff\xc1" in buf  # SOF1
    assert b"\xff\xc0" not in buf
    i = buf.index(b"\xff\xc1")
    assert buf[i + 4] == 12  # precision field
    j = buf.index(b"\xff\xdb")
    assert buf[j + 4] == 0x10  # Pq=1 16-bit DQT


def test_jpeg12_gradient_within_quant_error():
    import numpy as np

    from nemsis_xml_parser_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_jpeg12,
    )

    y, x = np.mgrid[0:24, 0:32]
    px = ((y * 50 + x * 30) % 4096).astype(np.uint16)
    out = decode_baseline_jpeg(encode_jpeg12(px))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 64


def test_jpeg12_fixture_matches_formula():
    import numpy as np

    from nemsis_xml_parser_spark.operators.jpeg import (
        decode_baseline_jpeg,
        make_jpeg12_image,
    )

    for i in (0, 1, 5, 11, 23):
        out = decode_baseline_jpeg(make_jpeg12_image(i))
        bh, bw = i % 3 + 2, i % 4 + 2
        by = np.arange(bh).reshape(bh, 1)
        bx = np.arange(bw).reshape(1, bw)
        exp = np.repeat(
            np.repeat((i * 37 + 131 * bx + 197 * by) % 4096, 8, 0), 8, 1
        )
        assert (out == exp).all()
