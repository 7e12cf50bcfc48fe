"""STFT framing over real PCM decode: per-frame peak recovery, framing
boundary sensitivity, band classification."""

from __future__ import annotations

import numpy as np

from nemsis_xml_parser_spark.operators.multimodal import (
    decode_wav_samples,
    make_wav_sweep_bytes,
)


def test_sweep_fixture_segments_are_bin_aligned():
    for i in (0, 4, 17, 123):
        arr = decode_wav_samples(make_wav_sweep_bytes(i))
        x = arr[:, 0].astype(np.float64)
        assert len(x) == 512
        k1, k2 = i % 31 + 1, (i * 7) % 31 + 1
        for fi, k in ((0, k1), (1, k2)):
            spec = np.abs(np.fft.rfft(x[fi * 256 : (fi + 1) * 256]))
            assert int(np.argmax(spec[1:]) + 1) == k


def test_whole_file_dft_smears_when_tones_differ():
    # pick an id where k1 != k2: the unframed spectrum has two lines of
    # comparable mass, so per-frame analysis is genuinely load-bearing
    i = 1  # k1=2, k2=8
    x = decode_wav_samples(make_wav_sweep_bytes(i))[:, 0].astype(np.float64)
    spec = np.abs(np.fft.rfft(x))
    top2 = np.sort(spec[1:])[-2:]
    assert top2[0] > 0.25 * top2[1]  # two comparable lines, not one


def test_band_thresholds_cover_all_bins():
    for pk in range(1, 32):
        band = "low" if pk <= 10 else "mid" if pk <= 21 else "high"
        assert band in ("low", "mid", "high")
