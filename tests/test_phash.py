"""Average-hash perceptual image dedup (operators/multimodal.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nemsis_xml_parser_spark.operators.multimodal import (  # noqa: E402
    png_average_hash,
    synthesize_png_media,
)
from nemsis_xml_parser_spark.plans import QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _ref_hash(i: int) -> tuple[int, int]:
    w, h = i % 24 + 4, i % 16 + 4
    x = np.arange(w)
    y = np.arange(h)
    px = (
        i * 7
        + 3 * x[None, :, None]
        + 5 * y[:, None, None]
        + 11 * np.arange(3)[None, None, :]
    ) % 256
    luma = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    th = luma[(np.arange(8) * h // 8)][:, (np.arange(8) * w // 8)]
    s = th.sum()
    bits = (th.ravel() * 64 > s).astype(int)
    lo = sum(int(bits[k]) << k for k in range(32))
    hi = sum(int(bits[k]) << (k - 32) for k in range(32, 64))
    return hi, lo


def test_hash_matches_closed_form_reference(spark):
    ids = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    got = {
        r.image_id: (r.ahash_hi, r.ahash_lo)
        for r in png_average_hash(synthesize_png_media(ids)).collect()
    }
    for i in range(40):
        assert got[i] == _ref_hash(i), i


def test_groups_partition_the_corpus(spark):
    from nemsis_xml_parser_spark.plans.registry import table

    rows = QUERIES["multimodal_phash_groups"].spark(spark, SF_DIR).collect()
    n_docs = table(spark, SF_DIR, "documents").count()
    assert sum(r.n_images for r in rows) == n_docs
    # dedup teeth: the gradient corpus collapses into far fewer groups
    assert len(rows) < n_docs
    assert any(r.n_images > 1 for r in rows)
    for r in rows:
        assert 0 <= r.ahash_lo < 1 << 32
        assert 0 <= r.ahash_hi < 1 << 32
