"""Motion-JPEG video container (RIFF/AVI) — real writer, parser, and
frame-sampling stats, stdlib + numpy only.

Closes the video seam of the multimodal tier with REAL code instead of
a stub: AVI is a RIFF container (the same chunk grammar as the WAV
path, ``multimodal.decode_wav_samples``), and Motion-JPEG stores one
baseline JPEG per frame — which ``operators/jpeg.py`` already decodes
for real (marker walk, canonical Huffman, dequant, IDCT).  So the
pipeline here is genuine end-to-end: RIFF chunk walk → ``movi`` frame
extraction → every-Nth frame sampling → real JPEG decode → integer
pixel/motion statistics.  Remaining NotImplementedError seams: non-MJPG
codecs (no codec libs in this container) and interleaved audio streams.

Writer layout (the minimal spec-shaped AVI every MJPEG tool accepts):
``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
00dc*) idx1)`` with BITMAPINFOHEADER biCompression='MJPG'.

Scale shape: blobs stay inside the Arrow batch on the executor; only
fixed-width stat rows leave.  Frame sampling (``every``) is the
decode-cost lever — the standard frame-subsample every video feature
pipeline applies before per-frame models.

Reference parity: the reference (psycopg2 ETL) has no media tier; this
extends SURVEY §2.I multimodal operators.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .jpeg import decode_baseline_jpeg, encode_baseline_jpeg

FPS = 10  # fixed fixture rate: us/frame = 100_000



def _spread(ids: DataFrame, id_col: str) -> DataFrame:
    """Full-width repartition before the per-image Python codec loop
    (multimodal.spread_ids — the ids usually arrive as ONE partition)."""
    from .multimodal import spread_ids

    return spread_ids(ids, id_col)


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(tag: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", tag + body)


def make_avi_mjpeg_bytes(frames: list[bytes], width: int, height: int) -> bytes:
    """A real RIFF/AVI Motion-JPEG container around pre-encoded JPEG
    frames (one ``00dc`` chunk each, plus an ``idx1`` index)."""
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // FPS,  # dwMicroSecPerFrame
        0,                 # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX
        len(frames),       # dwTotalFrames
        0, 1, 0,           # initial frames, streams, suggested buffer
        width, height,
        0, 0, 0, 0,        # reserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, FPS, 0,
                      len(frames), 0, 0, 0, 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_items = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_items)
    idx, off = [], 4  # offsets relative to the start of 'movi' tag data
    for f in frames:
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", b"".join(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(buf: bytes) -> tuple[int, int, int, list[bytes]]:
    """Walk the RIFF tree; return (width, height, declared_frames,
    jpeg_frame_payloads).  Raises on non-AVI or non-MJPG content."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    width = height = declared = -1
    frames: list[bytes] = []

    def walk(data: bytes) -> None:
        nonlocal width, height, declared
        pos = 0
        while pos + 8 <= len(data):
            tag = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body = data[pos + 8 : pos + 8 + size]
            if tag == b"LIST":
                walk(body[4:])
            elif tag == b"avih":
                declared = struct.unpack_from("<I", body, 16)[0]
                width = struct.unpack_from("<I", body, 32)[0]
                height = struct.unpack_from("<I", body, 36)[0]
            elif tag == b"strf":
                if body[16:20] != b"MJPG":
                    raise NotImplementedError(
                        f"codec {body[16:20]!r} (only MJPG is decodable here)"
                    )
            elif tag == b"00dc":
                frames.append(body)
            pos += 8 + size + (size % 2)

    walk(buf[12:])
    if declared >= 0 and declared != len(frames):
        raise ValueError(
            f"index mismatch: avih declares {declared}, movi holds {len(frames)}"
        )
    return width, height, declared, frames


def make_mjpeg_video(video_id: int) -> bytes:
    """Deterministic REAL MJPEG/AVI from an integer id: dims 8·(id%3+1) ×
    8·(id%2+1), id%5+2 frames, frame f's 8×8 block (bx, by) CONSTANT at
    (id·11 + 7·f + 13·bx + 29·by) mod 256 — the exact-round-trip JPEG
    construction (operators/jpeg.py module docstring), so every decoded
    pixel is closed-form for the SQL oracle."""
    import numpy as np

    w, h = 8 * (video_id % 3 + 1), 8 * (video_id % 2 + 1)
    n = video_id % 5 + 2
    frames = []
    for f in range(n):
        bx = np.arange(w // 8).reshape(1, -1)
        by = np.arange(h // 8).reshape(-1, 1)
        v = (video_id * 11 + 7 * f + 13 * bx + 29 * by) % 256
        px = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)
        frames.append(encode_baseline_jpeg(px))
    return make_avi_mjpeg_bytes(frames, w, h)


def synthesize_mjpeg_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus of REAL MJPEG/AVI videos — MEDIA_SCHEMA
    output, Arrow-batched."""
    from .multimodal import MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                buf = make_mjpeg_video(int(i))
                rows.append((str(int(i)), "video/x-msvideo", buf, len(buf)))
            yield pd.DataFrame(
                rows, columns=["path", "media_type", "content", "length"]
            )

    return _spread(ids, id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


VIDEO_STATS_SCHEMA = StructType(
    [
        StructField("video_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", LongType(), True),
        StructField("n_sampled", LongType(), True),
        StructField("px_sum", LongType(), True),
        StructField("px_min", IntegerType(), True),
        StructField("px_max", IntegerType(), True),
        StructField("motion_abs", LongType(), True),
    ]
)


def video_frame_stats(media: DataFrame, every: int = 2) -> DataFrame:
    """Every-Nth-frame sampling + real per-frame JPEG decode → integer
    pixel stats and a motion proxy (Σ |frame-sum delta| between
    consecutive SAMPLED frames — exact BIGINTs, no float means)."""
    if every < 1:
        raise ValueError("every must be >= 1")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                w, h, _, frames = decode_avi_frames(bytes(content))
                sampled = frames[::every]
                sums, mn, mx = [], 255, 0
                for jf in sampled:
                    px = decode_baseline_jpeg(jf).astype("int64")
                    sums.append(int(px.sum()))
                    mn = min(mn, int(px.min()))
                    mx = max(mx, int(px.max()))
                motion = sum(
                    abs(b - a) for a, b in zip(sums, sums[1:])
                )
                rows.append(
                    (
                        int(path), w, h, len(frames), len(sampled),
                        sum(sums), mn, mx, motion,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_STATS_SCHEMA])

    return media.mapInPandas(stats, schema=VIDEO_STATS_SCHEMA)


SCENE_CUTS_SCHEMA = StructType(
    [
        StructField("video_id", LongType(), False),
        StructField("n_frames", LongType(), True),
        StructField("n_pairs", LongType(), True),
        StructField("n_cuts", LongType(), True),
        StructField("first_cut_pair", LongType(), True),
        StructField("motion_total", LongType(), True),
    ]
)


def video_scene_cuts(media: DataFrame, mean_abs_threshold: int = 7) -> DataFrame:
    """Shot-boundary (scene-cut) detection over MJPEG/AVI blobs: every
    frame is REALLY decoded (operators/jpeg.py), consecutive frames are
    compared by exact integer Σ|Δpixel|, and a pair is a CUT when its
    mean absolute difference exceeds ``mean_abs_threshold`` (strictly;
    integer comparison Σ|Δ| > t·w·h, no float means anywhere) — the
    classic pixel-difference shot detector every video curation
    pipeline runs first.

    Scale shape: blobs stay inside the Arrow batch (one executor-local
    decode per video, narrow stat rows out); per-video work is
    frames·pixels, embarrassingly parallel across videos; cross-video
    state is zero.  first_cut_pair is the 0-based index of the first
    cutting pair, NULL when no pair cuts."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                w, h, _, frames = decode_avi_frames(bytes(content))
                px = [
                    decode_baseline_jpeg(jf).astype("int64") for jf in frames
                ]
                diffs = [
                    int(abs(b - a).sum()) for a, b in zip(px, px[1:])
                ]
                limit = mean_abs_threshold * w * h
                cuts = [i for i, d in enumerate(diffs) if d > limit]
                rows.append(
                    (
                        int(path),
                        len(frames),
                        len(diffs),
                        len(cuts),
                        cuts[0] if cuts else None,
                        sum(diffs),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in SCENE_CUTS_SCHEMA])

    return media.mapInPandas(stats, schema=SCENE_CUTS_SCHEMA)
