"""Progressive (SOF2) JPEG codec (operators/jpeg_progressive.py):
constant-fixture closed form, gradient round-trip parity against the
baseline codec (pins EOBn / ZRL / correction-bit machinery), dispatch
through decode_baseline_jpeg, and seam raises."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nemsis_xml_parser_spark.operators import jpeg as J
from nemsis_xml_parser_spark.operators import jpeg_progressive as P


def test_constant_fixtures_match_closed_form():
    for iid in range(24):
        px = P.decode_progressive_jpeg(P.make_progressive_jpeg_image(iid))
        w, h = 8 * (iid % 3 + 1), 8 * (iid % 2 + 1)
        bx = np.arange(w // 8).reshape(1, -1)
        by = np.arange(h // 8).reshape(-1, 1)
        v = (iid * 11 + 13 * bx + 29 * by) % 256
        exp = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)
        assert px.shape == (h, w)
        assert (px == exp).all()


def test_gradient_parity_with_baseline_codec():
    """Same quantized coefficients through both entropy pipelines must
    yield identical pixels — this is what proves the AC-refinement
    correction bits, EOB runs and ZRL handling, which constant blocks
    (all-zero AC) never touch."""
    for seed, shape in [(1, (24, 40)), (2, (8, 8)), (3, (17, 9)),
                        (5, (64, 64)), (7, (33, 15))]:
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, shape).astype(np.uint8)
        base = J.decode_baseline_jpeg(J.encode_baseline_jpeg(px))
        prog = P.decode_progressive_jpeg(P.encode_progressive_jpeg(px))
        assert (prog == base).all(), (seed, shape)


def test_smooth_image_exercises_long_eob_runs():
    # a nearly-flat image: most AC bands empty -> multi-block EOB runs
    px = np.full((48, 48), 77, dtype=np.uint8)
    px[20, 20] = 200  # one busy block
    base = J.decode_baseline_jpeg(J.encode_baseline_jpeg(px))
    prog = P.decode_progressive_jpeg(P.encode_progressive_jpeg(px))
    assert (prog == base).all()


def test_decode_baseline_jpeg_dispatches_sof2():
    buf = P.make_progressive_jpeg_image(3)
    assert b"\xff\xc2" in buf  # really progressive
    px_direct = P.decode_progressive_jpeg(buf)
    px_dispatch = J.decode_baseline_jpeg(buf)
    assert (px_direct == px_dispatch).all()


def test_seams_raise():
    buf = bytearray(P.make_progressive_jpeg_image(1))
    sof = buf.find(b"\xff\xc2")
    # sampling factors above 2 stay a named seam (1 and 2 are
    # implemented since r11 — 4:4:4 / 4:2:0 / 4:2:2)
    bad = bytearray(buf)
    bad[sof + 2 + 2 + 5 + 2] = 0x33
    with pytest.raises(NotImplementedError, match="sampling factor"):
        P.decode_progressive_jpeg(bytes(bad))
    # DRI inside progressive
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 8)
    sos = buf.find(b"\xff\xda")
    with pytest.raises(NotImplementedError, match="restart"):
        P.decode_progressive_jpeg(bytes(buf[:sos]) + dri + bytes(buf[sos:]))
    # the single-plane encoder stays grayscale-only (color goes through
    # encode_progressive_jpeg_color)
    with pytest.raises(NotImplementedError, match="grayscale"):
        P.encode_progressive_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    # color planes must be 4:4:4 (equal size)
    with pytest.raises(ValueError, match="4:4:4"):
        P.encode_progressive_jpeg_color(
            np.zeros((16, 16), dtype=np.uint8),
            np.zeros((8, 8), dtype=np.uint8),
            np.zeros((8, 8), dtype=np.uint8),
        )


def test_color_constant_fixture_exact():
    # constant blocks per plane survive the full 8-scan color pipeline
    for i in (0, 1, 5, 11):
        w, h = 8 * (i % 3 + 1), 8 * (i % 2 + 1)
        got = P.decode_progressive_jpeg(P.make_progressive_color_jpeg_image(i))
        assert got.shape == (h, w, 3)
        bx = np.arange(w // 8).reshape(1, -1)
        by = np.arange(h // 8).reshape(-1, 1)
        for c in range(3):
            v = (i * 11 + 13 * bx + 29 * by + 47 * c) % 256
            exp = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1)
            assert (got[:, :, c] == exp).all(), f"id {i} plane {c}"


def test_color_gradient_matches_direct_reconstruction():
    # non-constant planes: the interleaved-DC + per-component AC scans
    # must reproduce exactly the dequant+IDCT of the quantized blocks
    # (the codec's own lossless-given-quantization contract)
    from nemsis_xml_parser_spark.operators.jpeg import QTABLE_ZZ, ZIGZAG, _A

    h, w = 16, 24
    planes = [
        (
            (np.arange(h).reshape(h, 1) * 3
             + np.arange(w).reshape(1, w) * 5 + 40 * c) % 256
        ).astype(np.uint8)
        for c in range(3)
    ]
    got = P.decode_progressive_jpeg(P.encode_progressive_jpeg_color(*planes))
    q = np.empty((8, 8))
    for idx, (u, v) in enumerate(ZIGZAG):
        q[u, v] = QTABLE_ZZ[idx]
    for c in range(3):
        hh, ww, nby, nbx, blocks = P._quantized_blocks(planes[c])
        ref = np.empty((nby * 8, nbx * 8))
        for b, zz in enumerate(blocks):
            s = np.zeros((8, 8))
            for idx, (u, v) in enumerate(ZIGZAG):
                s[u, v] = zz[idx]
            blk = _A.T @ (s * q) @ _A + 128.0
            byy, bxx = divmod(b, nbx)
            ref[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = blk
        ref = np.clip(np.round(ref[:hh, :ww]), 0, 255).astype(np.uint8)
        assert (got[:, :, c] == ref).all(), f"plane {c}"


def test_deterministic_bytes():
    assert P.make_progressive_jpeg_image(9) == P.make_progressive_jpeg_image(9)


def test_wide_dqt_roundtrip_and_fixture_routing():
    """Pq=1 (16-bit) quantization tables decode identically to Pq=0 —
    same values, wider storage; id%4==1 fixtures carry the wide form."""
    import numpy as np

    from nemsis_xml_parser_spark.operators.jpeg_progressive import (
        decode_progressive_jpeg,
        encode_progressive_jpeg,
        make_progressive_jpeg_image,
    )

    rng = np.random.default_rng(47)
    px = rng.integers(0, 256, size=(16, 24)).astype(np.uint8)
    narrow = encode_progressive_jpeg(px)
    wide = encode_progressive_jpeg(px, wide_dqt=True)
    assert wide != narrow and len(wide) == len(narrow) + 64
    assert (
        decode_progressive_jpeg(wide) == decode_progressive_jpeg(narrow)
    ).all()
    # wide-DQT fixture ids still decode to the closed form
    for i in (1, 5, 13):
        out = decode_progressive_jpeg(make_progressive_jpeg_image(i))
        w, h = 8 * (i % 3 + 1), 8 * (i % 2 + 1)
        bx = np.arange(w) // 8
        by = np.arange(h) // 8
        exp = (i * 11 + 13 * bx.reshape(1, w) + 29 * by.reshape(h, 1)) % 256
        assert (out == exp).all(), i
    # Pq=1 payload structure: marker byte 0x10, 129-byte table entry
    assert wide[wide.index(b"\xff\xdb") + 4] == 0x10


def test_420_constant_fixture_exact():
    """4:2:0: interleaved DC walks the 4xY+Cb+Cr MCU order, AC scans
    cover each component's own grid, chroma upsamples by replication."""
    for i in (0, 1, 2, 3, 4, 5):
        w, h = 16 * (i % 3 + 1), 16 * (i % 2 + 1)
        got = P.decode_progressive_jpeg(P.make_progressive_420_jpeg_image(i))
        assert got.shape == (h, w, 3)
        X, Y = np.meshgrid(np.arange(w), np.arange(h))
        assert (got[:, :, 0] == (i * 11 + 13 * (X // 8) + 29 * (Y // 8)) % 256).all()
        for c in (1, 2):
            exp = (i * 11 + 13 * (X // 16) + 29 * (Y // 16) + 47 * c) % 256
            assert (got[:, :, c] == exp).all(), f"id {i} chroma {c}"


def test_420_encoder_validates_shapes():
    with pytest.raises(ValueError, match="16-aligned"):
        P.encode_progressive_jpeg_420(
            np.zeros((8, 8), dtype=np.uint8),
            np.zeros((4, 4), dtype=np.uint8),
            np.zeros((4, 4), dtype=np.uint8),
        )
    with pytest.raises(ValueError, match="half-resolution"):
        P.encode_progressive_jpeg_420(
            np.zeros((16, 16), dtype=np.uint8),
            np.zeros((16, 16), dtype=np.uint8),
            np.zeros((8, 8), dtype=np.uint8),
        )


def test_420_gradient_matches_direct_reconstruction():
    """NON-constant 4:2:0: ramp planes push AC-first EOB runs, ZRL and
    the §G.1.2.3 correction bits through the subsampled MCU walk; the
    decode must equal the independent dequant+IDCT reconstruction of
    each plane, chroma upsampled by replication."""
    for i in (0, 1, 4, 7):
        w, h = 16 * (i % 3 + 1), 16 * (i % 2 + 1)
        got = P.decode_progressive_jpeg(
            P.make_progressive_420_gradient_image(i)
        )
        assert got.shape == (h, w, 3)
        X, Y = np.meshgrid(np.arange(w), np.arange(h))
        yp = ((3 * X + 5 * Y + 11 * i) % 256).astype(np.uint8)
        assert (got[:, :, 0] == P.reference_reconstruction(yp)).all(), i
        Xc, Yc = np.meshgrid(np.arange(w // 2), np.arange(h // 2))
        for c in (1, 2):
            cp = ((5 * Xc + 3 * Yc + 11 * i + 40 * c) % 256).astype(
                np.uint8
            )
            ref = P.reference_reconstruction(cp)
            up = np.repeat(np.repeat(ref, 2, axis=0), 2, axis=1)
            assert (got[:, :, c] == up).all(), f"id {i} chroma {c}"
