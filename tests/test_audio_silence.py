"""Units for operators/multimodal.audio_silence_features.

The oracle pins the 64-sample/8-window corpus path; these pin the tail
partial window, the strict `< threshold` edge, run bookkeeping, and
the corrupt-media error-row discipline.
"""

from __future__ import annotations

import pytest

from ingest_pipeline_spark.operators.multimodal import (
    audio_silence_features,
    wav_encode,
)


def _run(spark, samples, window=4, threshold=100):
    rows = spark.createDataFrame(
        [(1, bytearray(wav_encode(samples)))], "asset_id long, media binary"
    )
    return audio_silence_features(rows, window=window, threshold=threshold).collect()[0]


def test_silence_known_pattern(spark):
    # windows of 4: [0,0,0,0]=0 silent; [50,0,0,0]=2500 loud; [1,1,1,1]=4
    # silent; [0,0,5,0]=25 silent -> n_silent=3, longest run=2 (the tail two)
    samples = [0, 0, 0, 0, 50, 0, 0, 0, 1, 1, 1, 1, 0, 0, 5, 0]
    r = _run(spark, samples, window=4, threshold=100)
    assert (r.n_windows, r.n_silent, r.longest_silent_run) == (4, 3, 2)
    assert r.energy_sum == 2500 + 4 + 25


def test_silence_tail_partial_window(spark):
    # 6 samples, window 4 -> tail frame has 2 samples and its own energy
    samples = [100, 100, 100, 100, 3, 4]
    r = _run(spark, samples, window=4, threshold=26)
    # frames: [100x4]=40000 loud; [3,4]=25 silent (25 < 26)
    assert (r.n_windows, r.n_silent, r.longest_silent_run) == (2, 1, 1)
    assert r.energy_sum == 40000 + 25


def test_silence_threshold_is_strict(spark):
    # energy == threshold must NOT be silent
    samples = [5, 0, 0, 0]
    r = _run(spark, samples, window=4, threshold=25)
    assert (r.n_silent, r.longest_silent_run) == (0, 0)


def test_silence_corrupt_media_degrades(spark):
    bad = spark.createDataFrame(
        [(1, bytearray(b"RIFFxxxx")), (2, None), (3, bytearray(b""))],
        "asset_id long, media binary",
    )
    out = {r.asset_id: r.decode_ok for r in audio_silence_features(bad).collect()}
    assert out == {1: False, 2: False, 3: False}


def test_silence_rejects_bad_window():
    with pytest.raises(ValueError):
        audio_silence_features(None, window=0)
