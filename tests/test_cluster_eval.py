"""Clustering-evaluation and audio-segmentation query semantics."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nemsis_xml_parser_spark.plans import QUERIES  # noqa: E402
from nemsis_xml_parser_spark.plans.registry import table  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_ari_nmi_lawful_range(spark):
    row = QUERIES["quality_adjusted_rand"].spark(spark, SF_DIR).collect()[0]
    assert row.n == table(spark, SF_DIR, "embeddings").count()
    assert row.n_clusters <= 8
    assert row.n_classes == 10
    # ARI in [-1, 1]; NMI in [0, 1].  The iters=0 seeded quantizer is
    # label-uninformative by construction, so both sit near 0 — the
    # metric honestly reports that.
    assert -1.0 <= row.ari <= 1.0
    assert 0.0 <= row.nmi <= 1.0
    assert abs(row.ari) < 0.2


def test_audio_silence_partitions_frames(spark):
    rows = (
        QUERIES["multimodal_audio_silence_segments"]
        .spark(spark, SF_DIR)
        .collect()
    )
    assert len(rows) == table(spark, SF_DIR, "documents").count()
    quiet_clips = 0
    for r in rows:
        assert 0 <= r.n_quiet <= r.n_frames
        assert r.n_quiet_segments <= r.n_quiet
        assert r.longest_quiet_run <= r.n_quiet
        if r.n_quiet:
            assert r.n_quiet_segments >= 1
            quiet_clips += 1
    # the threshold actually discriminates on this corpus
    assert 0 < quiet_clips < len(rows)
