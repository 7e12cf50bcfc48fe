"""RIFF/AVI Motion-JPEG container: round-trip, sampling, error seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nemsis_xml_parser_spark.operators.jpeg import decode_baseline_jpeg
from nemsis_xml_parser_spark.operators.video import (
    decode_avi_frames,
    make_avi_mjpeg_bytes,
    make_mjpeg_video,
    synthesize_mjpeg_media,
    video_frame_stats,
)


def expected_frame(vid: int, f: int) -> np.ndarray:
    w, h = 8 * (vid % 3 + 1), 8 * (vid % 2 + 1)
    bx = np.arange(w // 8).reshape(1, -1)
    by = np.arange(h // 8).reshape(-1, 1)
    v = (vid * 11 + 7 * f + 13 * bx + 29 * by) % 256
    return np.repeat(np.repeat(v, 8, axis=0), 8, axis=1)


def test_container_roundtrip_every_frame_exact():
    for vid in (0, 1, 5, 7, 11):
        w, h, declared, frames = decode_avi_frames(make_mjpeg_video(vid))
        assert (w, h) == (8 * (vid % 3 + 1), 8 * (vid % 2 + 1))
        assert declared == len(frames) == vid % 5 + 2
        for f, jf in enumerate(frames):
            assert (decode_baseline_jpeg(jf) == expected_frame(vid, f)).all()


def test_odd_sized_frames_are_padded_to_even_chunks():
    # JPEG payloads are routinely odd-length; RIFF requires even chunk
    # alignment — a parser that forgets the pad byte desyncs after the
    # first odd frame.
    frames = [b"\xff\xd8" + b"x" * 3 + b"\xff\xd9"] * 4  # 7 bytes, odd
    buf = make_avi_mjpeg_bytes(frames, 8, 8)
    _, _, _, got = decode_avi_frames(buf)
    assert got == frames


def test_not_an_avi_raises():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")


def test_non_mjpg_codec_raises_not_implemented():
    buf = bytearray(make_mjpeg_video(3))
    i = buf.find(b"MJPG", buf.find(b"strf"))  # strf biCompression
    buf[i : i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi_frames(bytes(buf))


def test_declared_count_mismatch_raises():
    buf = bytearray(make_mjpeg_video(4))
    i = buf.find(b"avih") + 8 + 16  # dwTotalFrames inside avih body
    struct.pack_into("<I", buf, i, 99)
    with pytest.raises(ValueError, match="index mismatch"):
        decode_avi_frames(bytes(buf))


def test_frame_sampling_strides(spark):
    media = synthesize_mjpeg_media(
        spark.createDataFrame([(9,)], "doc_id bigint")  # 9%5+2 = 6 frames
    )
    full = video_frame_stats(media, every=1).collect()[0]
    half = video_frame_stats(media, every=2).collect()[0]
    assert full["n_frames"] == half["n_frames"] == 6
    assert full["n_sampled"] == 6 and half["n_sampled"] == 3
    sums = [int(expected_frame(9, f).sum()) for f in range(6)]
    assert full["px_sum"] == sum(sums)
    assert half["px_sum"] == sum(sums[::2])
    assert half["motion_abs"] == sum(
        abs(b - a) for a, b in zip(sums[::2], sums[::2][1:])
    )


def test_invalid_stride_raises(spark):
    media = synthesize_mjpeg_media(spark.createDataFrame([(1,)], "doc_id bigint"))
    with pytest.raises(ValueError):
        video_frame_stats(media, every=0)


def test_video_scene_cuts_wrap_semantics(spark):
    """A pair cuts exactly when a block wraps past 255 (fixture advances
    +7/frame): verify against straight numpy decode of the same blobs."""
    import numpy as np
    import pyspark.sql.functions as F

    from nemsis_xml_parser_spark.operators import jpeg as J
    from nemsis_xml_parser_spark.operators.video import (
        decode_avi_frames,
        make_mjpeg_video,
        synthesize_mjpeg_media,
        video_scene_cuts,
    )

    ids = spark.range(24).select(F.col("id").alias("doc_id"))
    got = {
        r["video_id"]: r
        for r in video_scene_cuts(synthesize_mjpeg_media(ids)).collect()
    }
    for vid in range(24):
        w, h, _, frames = decode_avi_frames(make_mjpeg_video(vid))
        px = [J.decode_baseline_jpeg(f).astype("int64") for f in frames]
        diffs = [int(np.abs(b - a).sum()) for a, b in zip(px, px[1:])]
        cuts = [i for i, d in enumerate(diffs) if d > 7 * w * h]
        r = got[vid]
        assert r["n_frames"] == len(frames)
        assert r["n_pairs"] == len(diffs)
        assert r["n_cuts"] == len(cuts)
        assert r["first_cut_pair"] == (cuts[0] if cuts else None)
        assert r["motion_total"] == sum(diffs)
    # the corpus must exercise BOTH outcomes or the threshold is untested
    assert any(r["n_cuts"] > 0 for r in got.values())
    assert any(r["n_cuts"] == 0 for r in got.values())
