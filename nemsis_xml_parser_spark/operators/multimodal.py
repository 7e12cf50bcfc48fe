"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata (north-star extension).

The Spark-side machinery — schema, binaryFile scan, Arrow-batched pandas
UDFs over ``mapInPandas``, partition sizing — is real and tested; the
actual media decode is STUBBED (this container has no image/audio libs):
``decode_image_meta`` parses only well-known header bytes deterministically
and raises ``NotImplementedError`` for real codec work, clearly marking the
seam where pillow/ffmpeg plug in on a production cluster.

Design for 100 TB of media:
* one row per object via ``binaryFile`` (no shuffle to ingest);
* ``spark.sql.files.maxPartitionBytes`` governs batch memory, and
  ``mapInPandas`` streams Arrow batches so a partition never fully
  materializes in Python;
* metadata extraction emits a narrow typed row (media dropped) so
  downstream analytics never re-reads the blobs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("media_type", StringType(), True),
        StructField("content", BinaryType(), True),
        StructField("length", LongType(), True),
    ]
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("media_type", StringType(), True),
        StructField("length", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)


def read_media_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile scan → MEDIA_SCHEMA rows (media type sniffed from magic
    bytes JVM-side — no Python in the scan)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    magic_hex = F.hex(F.substring(F.col("content"), 1, 4))
    media_type = (
        F.when(magic_hex == "89504E47", "image/png")
        .when(magic_hex.startswith("FFD8FF"), "image/jpeg")
        .when(magic_hex == "52494646", "audio/wav")
        .otherwise("application/octet-stream")
    )
    return raw.select(
        F.col("path"),
        media_type.alias("media_type"),
        F.col("content"),
        F.col("length"),
    )


def decode_image_meta(content: bytes) -> tuple[int | None, int | None, str | None]:
    """Deterministic header-only decode: PNG IHDR width/height.  Real codec
    decode (JPEG/video frames/audio samples) is intentionally NOT
    implemented in this environment — plug pillow/ffmpeg in here."""
    if content[:8] == b"\x89PNG\r\n\x1a\n" and len(content) >= 24:
        width, height = struct.unpack(">II", content[16:24])
        return int(width), int(height), "png"
    if content[:3] == b"\xff\xd8\xff":
        raise NotImplementedError(
            "JPEG decode requires an image library (pillow) not present in "
            "this container — stubbed by design"
        )
    return None, None, None


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over ``mapInPandas`` — the real
    production plumbing; only ``decode_image_meta`` is a stub."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, mtype, content, length in zip(
                pdf["path"], pdf["media_type"], pdf["content"], pdf["length"]
            ):
                try:
                    w, h, fmt = decode_image_meta(bytes(content) if content is not None else b"")
                except NotImplementedError:
                    w, h, fmt = None, None, "undecoded"
                out.append((path, mtype, length, w, h, fmt))
            yield pd.DataFrame(
                out, columns=["path", "media_type", "length", "width", "height", "format"]
            )

    return media.mapInPandas(extract, schema=MEDIA_META_SCHEMA)


def fake_frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Deterministic stand-in for video frame sampling: emit one row per
    ``every_n_bytes`` offset with an md5 of the chunk — exercises the
    explode-shaped output (one media row → many sample rows) that real
    frame extraction produces."""
    offsets = F.sequence(
        F.lit(0), F.greatest(F.col("length") - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return media.select(
        "path",
        F.explode(offsets).alias("offset"),
        F.md5(F.substring_index(F.base64("content"), "=", 1)).alias("chunk_sig"),
    )


EMBED_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("embedding", ArrayType(DoubleType()), True),
    ]
)


def byte_histogram_embedding(
    media: DataFrame,
    dim: int = 64,
    id_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Deterministic media feature extraction: L1-normalized ``dim``-bin
    histogram of byte values (256 bins folded modulo ``dim``) as an
    ARRAY<DOUBLE> embedding — the stand-in for a real image/audio encoder
    (which plugs in at ``_embed_bytes``).  The plumbing is the production
    shape: Arrow-batched ``mapInPandas``, numpy vectorized per batch, blobs
    dropped on output so downstream ANN never re-reads media."""
    import numpy as np

    if 256 % dim != 0:
        raise ValueError(f"dim must divide 256, got {dim}")

    def _embed_bytes(buf: bytes) -> list[float]:
        if not buf:
            return [0.0] * dim
        counts = np.bincount(np.frombuffer(buf, dtype=np.uint8), minlength=256)
        folded = counts.reshape(-1, dim).sum(axis=0)  # 256 % dim == 0 bins
        return (folded / folded.sum()).tolist()

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": pdf[id_col].astype(str),
                    "embedding": [
                        _embed_bytes(bytes(c) if c is not None else b"")
                        for c in pdf[content_col]
                    ],
                }
            )

    return media.mapInPandas(embed, schema=EMBED_SCHEMA)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: same mapInPandas/error-routing shape as
    ``extract_media_metadata``; the pixel work itself requires an image
    library not present in this container and is stubbed at
    ``_resize_bytes`` (rows come back with status='unresized')."""

    def _resize_bytes(buf: bytes) -> bytes:
        raise NotImplementedError(
            "pixel resize requires pillow/opencv — not present in this "
            "container; stubbed by design"
        )

    out_schema = StructType(
        [
            StructField("path", StringType(), False),
            StructField("content", BinaryType(), True),
            StructField("status", StringType(), True),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows.append((path, _resize_bytes(bytes(content)), "resized"))
                except NotImplementedError:
                    rows.append((path, content, "unresized"))
            yield pd.DataFrame(rows, columns=["path", "content", "status"])

    return media.mapInPandas(resize, schema=out_schema)
