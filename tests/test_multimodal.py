"""Multimodal plumbing: binaryFile scan, magic-byte sniffing, Arrow-batched
metadata extraction.  Header decode (PNG/JPEG/GIF/BMP/PPM dimensions) is
real pure-byte parsing; pixel-level codec work stays stubbed."""

import struct

import numpy as np
import pytest

from nemsis_xml_parser_spark.operators import multimodal as M


def _png(width, height):
    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + ihdr + b"rest"


def _ppm(width, height, seed=0):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (width, height) + px.tobytes()


@pytest.fixture()
def media_dir(tmp_path):
    (tmp_path / "a.png").write_bytes(_png(640, 480))
    (tmp_path / "b.jpg").write_bytes(M.make_image_bytes("jpeg", 320, 240))
    (tmp_path / "c.bin").write_bytes(b"garbage-bytes")
    return str(tmp_path)


def test_media_scan_sniffs_types(spark, media_dir):
    media = M.read_media_dir(spark, media_dir)
    types = {r["path"].rsplit("/", 1)[-1]: r["media_type"] for r in media.collect()}
    assert types["a.png"] == "image/png"
    assert types["b.jpg"] == "image/jpeg"
    assert types["c.bin"] == "application/octet-stream"


def test_metadata_extraction_decodes_headers(spark, media_dir):
    meta = M.extract_media_metadata(M.read_media_dir(spark, media_dir))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in meta.collect()}
    assert (rows["a.png"]["width"], rows["a.png"]["height"]) == (640, 480)
    assert rows["a.png"]["format"] == "png"
    assert (rows["b.jpg"]["width"], rows["b.jpg"]["height"]) == (320, 240)
    assert rows["b.jpg"]["format"] == "jpeg"
    assert rows["c.bin"]["format"] is None


def test_decode_image_meta_all_formats():
    for fmt, w, h in [("png", 17, 3000), ("gif", 2, 65535), ("jpeg", 1920, 1080),
                      ("bmp", 33, 44)]:
        assert M.decode_image_meta(M.make_image_bytes(fmt, w, h)) == (w, h, fmt)
    assert M.decode_image_meta(_ppm(12, 7)) == (12, 7, "ppm")
    # top-down BMP stores negative height
    bm = b"BM" + b"\x00" * 16 + struct.pack("<ii", 10, -20)
    assert M.decode_image_meta(bm) == (10, 20, "bmp")
    assert M.decode_image_meta(b"") == (None, None, None)


def test_jpeg_marker_walk_robust():
    # dimensions live in a later SOF segment, behind fill bytes and an RST
    body = (
        b"\xff\xd8"
        + b"\xff\xe1" + struct.pack(">H", 6) + b"Exif"      # APP1 skipped
        + b"\xff\xc4" + struct.pack(">H", 5) + b"\x00" * 3  # DHT: not a SOF
        + b"\xff" + b"\xff\xd0"                              # fill byte + RST0
        + b"\xff\xc2" + struct.pack(">H", 17) + b"\x08"      # progressive SOF2
        + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 10
        + b"\xff\xd9"
    )
    assert M.decode_image_meta(body) == (640, 480, "jpeg")
    # truncated JPEG with no SOF: format known, dimensions unknown
    assert M.decode_image_meta(b"\xff\xd8\xff\xe0JFIF") == (None, None, "jpeg")


def test_frame_sample_shape(spark, media_dir):
    media = M.read_media_dir(spark, media_dir)
    samples = M.fake_frame_sample(media, every_n_bytes=8)
    # explode-shaped: ≥1 row per media object, offsets stepped by 8
    assert samples.count() >= 3
    offs = [
        r["offset"]
        for r in samples.where(samples.path.endswith("c.bin")).collect()
    ]
    assert offs == [0, 8]


def test_byte_histogram_embedding_properties(spark, media_dir):
    media = M.read_media_dir(spark, media_dir)
    emb = M.byte_histogram_embedding(media, dim=64)
    rows = {r["path"].rsplit("/", 1)[-1]: r["embedding"] for r in emb.collect()}
    assert set(rows) == {"a.png", "b.jpg", "c.bin"}
    for v in rows.values():
        assert len(v) == 64
        assert abs(sum(v) - 1.0) < 1e-9  # L1-normalized
        assert all(x >= 0 for x in v)
    # deterministic: same input → same embedding
    again = {r["path"].rsplit("/", 1)[-1]: r["embedding"] for r in
             M.byte_histogram_embedding(media, dim=64).collect()}
    assert again == rows


def test_byte_histogram_embedding_rejects_bad_dim(spark, media_dir):
    with pytest.raises(ValueError, match="divide 256"):
        M.byte_histogram_embedding(M.read_media_dir(spark, media_dir), dim=60)


def test_resize_media_ppm_real_codecs_stubbed(spark, media_dir, tmp_path):
    import shutil

    media_src = tmp_path / "m"
    media_src.mkdir()
    for f in ("a.png", "b.jpg", "c.bin"):
        shutil.copy(f"{media_dir}/{f}", media_src / f)
    (media_src / "d.ppm").write_bytes(_ppm(8, 4, seed=7))
    out = M.resize_media(M.read_media_dir(spark, str(media_src)), 4, 2)
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in out.collect()}
    # compressed codecs stubbed: original bytes survive with status marker
    assert rows["a.png"]["status"] == "unresized"
    assert rows["b.jpg"]["status"] == "unresized"
    # uncompressed PPM resizes for real
    assert rows["d.ppm"]["status"] == "resized"
    resized = bytes(rows["d.ppm"]["content"])
    assert M.decode_image_meta(resized) == (4, 2, "ppm")
    # nearest-neighbor: output pixels are a subsample of the input grid
    w0, h0, off0 = M._parse_ppm_header(_ppm(8, 4, seed=7))
    src = np.frombuffer(_ppm(8, 4, seed=7)[off0:], dtype=np.uint8).reshape(4, 8, 3)
    _, _, off1 = M._parse_ppm_header(resized)
    got = np.frombuffer(resized[off1:], dtype=np.uint8).reshape(2, 4, 3)
    assert (got == src[::2, ::2]).all()


def test_resize_ppm_upscale_roundtrip():
    buf = _ppm(3, 2, seed=1)
    up = M.resize_ppm(buf, 9, 4)
    assert M.decode_image_meta(up) == (9, 4, "ppm")
    down = M.resize_ppm(up, 3, 2)
    assert down == buf  # nearest-neighbor up/down by integer factors


def test_wav_decode_roundtrip():
    buf = M.make_wav_bytes(16000, 2, 1600)  # 1600 stereo samples @16k
    rate, chans, bits, dur, fmt = M.decode_wav_meta(buf)
    assert (rate, chans, bits, fmt) == (16000, 2, 16, "wav")
    assert dur == 100.0  # 1600/16000 s = 100 ms
    # chunk walk survives an extra chunk before fmt (odd size → word align)
    extra = b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"LIST" + bytes([3, 0, 0, 0]) + b"abc\x00" + buf[12:]
    rate2, chans2, _, dur2, _ = M.decode_wav_meta(extra)
    assert (rate2, chans2, dur2) == (16000, 2, 100.0)
    assert M.decode_wav_meta(b"RIFFxxxxAVI ") == (None, None, None, None, None)


def test_extract_audio_metadata(spark, tmp_path):
    (tmp_path / "a.wav").write_bytes(M.make_wav_bytes(8000, 1, 80))
    (tmp_path / "b.bin").write_bytes(b"not audio")
    meta = M.extract_audio_metadata(M.read_media_dir(spark, str(tmp_path)))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in meta.collect()}
    assert rows["a.wav"]["sample_rate"] == 8000
    assert rows["a.wav"]["duration_ms"] == 10.0
    assert rows["b.bin"]["format"] is None


# --------------------------------------------------------------- PNG codec


def test_png_roundtrip_all_filters():
    # filter_mode='cycle' puts every filter type (0..4) in the stream, so
    # the round-trip proves the whole unfilter table incl. Paeth ties.
    rng = np.random.RandomState(7)
    for h, w in [(5, 4), (7, 31), (12, 1)]:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        buf = M.encode_png(px)
        assert buf[:8] == b"\x89PNG\r\n\x1a\n"
        out = M.decode_png_pixels(buf)
        np.testing.assert_array_equal(out, px)


def test_png_decode_greyscale_and_errors():
    import zlib

    # hand-build a 2x2 8-bit grey PNG (colortype 0), filter 0 rows
    raw = b"\x00\x0a\x14" + b"\x00\x1e\x28"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + M._png_chunk(b"IHDR", ihdr)
        + M._png_chunk(b"IDAT", zlib.compress(raw))
        + M._png_chunk(b"IEND", b"")
    )
    out = M.decode_png_pixels(buf)
    assert out.shape == (2, 2, 1)
    assert out.ravel().tolist() == [10, 20, 30, 40]
    with pytest.raises(ValueError):
        M.decode_png_pixels(b"nope")
    # sub-byte depths are a REAL path since r11: a hand-built 2x2
    # 4-bit grey PNG (one packed byte per row, filter 0) decodes to
    # raw levels
    raw4 = b"\x00\xa4" + b"\x00\x3d"  # rows (10, 4) and (3, 13)
    ihdr4 = struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0)
    buf4 = (
        b"\x89PNG\r\n\x1a\n"
        + M._png_chunk(b"IHDR", ihdr4)
        + M._png_chunk(b"IDAT", zlib.compress(raw4))
        + M._png_chunk(b"IEND", b"")
    )
    out4 = M.decode_png_pixels(buf4)
    assert out4.shape == (2, 2, 1)
    assert out4.ravel().tolist() == [10, 4, 3, 13]
    # and 16-bit RGB (unsupported colortype x depth combo) still raises
    ihdr16rgb = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    buf16rgb = (
        b"\x89PNG\r\n\x1a\n"
        + M._png_chunk(b"IHDR", ihdr16rgb)
        + M._png_chunk(b"IDAT", zlib.compress(raw))
        + M._png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        M.decode_png_pixels(buf16rgb)


def test_make_png_image_closed_form():
    # pixel(x, y, c) = (id*7 + 3x + 5y + 11c) % 256 — the oracle's contract
    for image_id in [0, 17, 123]:
        px = M.decode_png_pixels(M.make_png_image(image_id))
        h, w, ch = px.shape
        assert (w, h, ch) == (image_id % 24 + 4, image_id % 16 + 4, 3)
        x = np.arange(w).reshape(1, w, 1)
        y = np.arange(h).reshape(h, 1, 1)
        c = np.arange(3).reshape(1, 1, 3)
        expect = (image_id * 7 + 3 * x + 5 * y + 11 * c) % 256
        np.testing.assert_array_equal(px, expect.astype(np.uint8))


def test_png_pixel_stats_spark(spark):
    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    stats = M.png_pixel_stats(M.synthesize_png_media(ids)).collect()
    assert len(stats) == 40
    by_id = {r["image_id"]: r for r in stats}
    for image_id in (0, 13, 39):
        px = M.decode_png_pixels(M.make_png_image(image_id))
        r = by_id[image_id]
        assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
        assert r["n_subpixels"] == px.size
        assert r["px_sum"] == int(px.sum())
        assert (r["px_min"], r["px_max"]) == (int(px.min()), int(px.max()))


def test_png_thumbnail_stats_spark(spark):
    ids = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    out = {r["image_id"]: r for r in
           M.png_thumbnail_stats(M.synthesize_png_media(ids)).collect()}
    assert len(out) == 20
    for image_id in (0, 7, 19):
        px = M.decode_png_pixels(M.make_png_image(image_id))
        h, w, _ = px.shape
        ys = (np.arange(8) * h // 8).clip(0, h - 1)
        xs = (np.arange(8) * w // 8).clip(0, w - 1)
        th = px[ys][:, xs]
        r = out[image_id]
        assert (r["src_width"], r["src_height"]) == (w, h)
        assert r["thumb_sum"] == int(th.sum())
        assert (r["thumb_min"], r["thumb_max"]) == (int(th.min()), int(th.max()))


def test_wav_pcm_roundtrip_and_errors():
    for audio_id in (0, 5, 42):
        buf = M.make_wav_pcm_bytes(audio_id)
        s = M.decode_wav_samples(buf)
        n, ch = audio_id % 100 + 1, audio_id % 2 + 1
        assert s.shape == (n, ch)
        i = np.arange(n).reshape(n, 1)
        c = np.arange(ch).reshape(1, ch)
        expect = (audio_id * 13 + 7 * i + 3 * c) % 2003 - 1001
        np.testing.assert_array_equal(s, expect)
        # header metadata agrees with the old header-only decoder
        rate, chans, bits, _, fmt = M.decode_wav_meta(buf)
        assert (chans, bits, fmt) == (ch, 16, "wav")
    with pytest.raises(ValueError):
        M.decode_wav_samples(b"RIFFxxxxAVI mov")
    # 8-bit PCM must hit the NotImplementedError seam
    bad = M.make_wav_bytes(8000, 1, 10, bits=8)
    with pytest.raises(NotImplementedError):
        M.decode_wav_samples(bad)


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law (round 9)
# ---------------------------------------------------------------------------


def test_g711_known_anchor_values():
    """Spec-anchored extremes: mu-law 0xFF is +0, 0x80 is +32124 (the
    mu-law ceiling); A-law 0xAA expands to +32256 (the A-law ceiling),
    0xD5 (0x80^0x55) is +8 (A-law has no true zero)."""
    import numpy as np

    from nemsis_xml_parser_spark.operators.multimodal import (
        _alaw_to_linear,
        _ulaw_to_linear,
    )

    u = _ulaw_to_linear(np.array([0xFF, 0x80, 0x7F, 0x00], dtype=np.uint8))
    assert list(u) == [0, 32124, 0, -32124]
    a = _alaw_to_linear(np.array([0xAA, 0xD5, 0x55, 0x2A], dtype=np.uint8))
    assert list(a) == [32256, 8, -8, -32256]


def test_g711_wav_decode_roundtrip_shapes():
    from nemsis_xml_parser_spark.operators.multimodal import (
        decode_wav_samples,
        make_wav_g711_bytes,
    )

    for i in (0, 1, 2, 3, 7, 12, 80):
        s = decode_wav_samples(make_wav_g711_bytes(i))
        assert s.shape == (i % 80 + 1, i % 2 + 1)
        # every G.711 expansion lands inside the 16-bit linear range
        assert s.min() >= -32768 and s.max() <= 32767


def test_non_g711_non_pcm_still_raises():
    import struct

    from nemsis_xml_parser_spark.operators.multimodal import (
        decode_wav_samples,
        make_wav_g711_bytes,
    )

    buf = bytearray(make_wav_g711_bytes(1))
    i = buf.find(b"fmt ")
    # splice format tag 2 (ADPCM): still a named seam
    buf[i + 8 : i + 10] = struct.pack("<H", 2)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="G.711"):
        decode_wav_samples(bytes(buf))


def test_png_deep_roundtrips_and_fixture():
    """16-bit greyscale and RGBA PNGs: filters run on bytes at the
    2-/4-byte pixel distance; decode restores the exact samples."""
    import numpy as np

    from nemsis_xml_parser_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png16_gray,
        encode_png_rgba,
        make_png_deep_image,
    )

    rng = np.random.default_rng(48)
    g16 = rng.integers(0, 65536, size=(9, 13)).astype(np.uint16)
    out = decode_png_pixels(encode_png16_gray(g16))
    assert out.dtype == np.uint16 and out.shape == (9, 13, 1)
    assert (out[:, :, 0] == g16).all()
    rgba = rng.integers(0, 256, size=(7, 11, 4)).astype(np.uint8)
    out = decode_png_pixels(encode_png_rgba(rgba))
    assert out.shape == (7, 11, 4) and (out == rgba).all()
    # fixture law: even ids 16-bit grey, odd ids RGBA
    for i in (0, 2, 10):
        w, h = i % 24 + 4, i % 16 + 4
        px = decode_png_pixels(make_png_deep_image(i))
        x = np.arange(w).reshape(1, w)
        y = np.arange(h).reshape(h, 1)
        assert (px[:, :, 0] == (i * 257 + 513 * x + 1031 * y) % 65536).all()
    for i in (1, 3, 11):
        w, h = i % 24 + 4, i % 16 + 4
        px = decode_png_pixels(make_png_deep_image(i))
        x = np.arange(w).reshape(1, w, 1)
        y = np.arange(h).reshape(h, 1, 1)
        c = np.arange(4).reshape(1, 1, 4)
        assert (px == (i * 7 + 3 * x + 5 * y + 11 * c) % 256).all()


def test_adpcm_wav_decode_matches_reference_recurrence():
    """IMA ADPCM (r11: the audio seam): decode(make) must equal an
    independently-coded replay of the IMA recurrence from the fixture
    constants."""
    from nemsis_xml_parser_spark.operators.multimodal import (
        IMA_INDEX_TABLE,
        IMA_STEP_TABLE,
        decode_wav_samples,
        make_adpcm_wav,
    )

    for aid in range(12):
        got = decode_wav_samples(make_adpcm_wav(aid))
        exp = []
        for b in range(aid % 2 + 1):
            pred = ((aid * 97 + 131 * b) % 4096) - 2048
            idx = (aid + 5 * b) % 40
            exp.append(pred)
            for i in range(16):
                n = (aid * 3 + 7 * i + 11 * b) % 16
                step = IMA_STEP_TABLE[idx]
                diff = step >> 3
                if n & 4:
                    diff += step
                if n & 2:
                    diff += step >> 1
                if n & 1:
                    diff += step >> 2
                pred = (
                    max(-32768, pred - diff)
                    if n & 8
                    else min(32767, pred + diff)
                )
                idx = min(88, max(0, idx + IMA_INDEX_TABLE[n & 7]))
                exp.append(pred)
        assert got.shape == (len(exp), 1), aid
        assert got[:, 0].tolist() == exp, aid


def test_adpcm_wav_rejects_bad_step_index():
    import struct as _s

    from nemsis_xml_parser_spark.operators.multimodal import (
        decode_wav_samples,
        make_adpcm_wav,
    )

    buf = bytearray(make_adpcm_wav(1))
    di = buf.find(b"data") + 8
    buf[di + 2] = 99  # step index > 88
    with pytest.raises(ValueError, match="step index"):
        decode_wav_samples(bytes(buf))
    # stereo ADPCM stays a named seam
    fi = buf.find(b"fmt ") + 8
    buf2 = bytearray(make_adpcm_wav(1))
    _s.pack_into("<H", buf2, fi + 2, 2)
    with pytest.raises(NotImplementedError):
        decode_wav_samples(bytes(buf2))
