"""Units for operators/multimodal.video_keyframes.

The oracle pins the 4-frame corpus; these pin hand-built multi-shot
clips: the cut rule opening new shots, the max-variance keyframe
choice, the earliest-frame tie rule, and the corrupt discipline.
"""

from __future__ import annotations

from ingest_pipeline_spark.operators.multimodal import (
    video_keyframes,
    y4m_encode,
)


def _run(spark, frames, threshold=100):
    blob = y4m_encode(2, 2, [bytes(f) for f in frames])
    rows = spark.createDataFrame(
        [(1, bytearray(blob))], "asset_id long, media binary"
    )
    out = video_keyframes(rows, threshold=threshold).collect()
    return sorted((r.shot_id, r.start_frame, r.n_frames, r.keyframe_idx, r.key_vnum)
                  for r in out)


def test_keyframes_two_shots_hand_computed(spark):
    # frames 0,1 similar (SAD small); frame 2 jumps (SAD > 100) -> new shot.
    # vnum = 4*sum(p^2) - sum(p)^2
    f0 = [10, 10, 10, 10]      # vnum 0
    f1 = [10, 30, 10, 10]      # SAD 20; vnum 4*1200-60^2 = 1200
    f2 = [200, 200, 200, 200]  # SAD 720 -> cut; vnum 0
    got = _run(spark, [f0, f1, f2])
    assert got == [
        (0, 0, 2, 1, 1200),  # shot 0 = frames 0-1, keyframe = busier f1
        (1, 2, 1, 2, 0),
    ]


def test_keyframes_tie_takes_earliest_frame(spark):
    f0 = [0, 50, 0, 0]
    f1 = [0, 0, 50, 0]  # same multiset -> same vnum; SAD 100 == thr, no cut
    got = _run(spark, [f0, f1], threshold=100)
    assert len(got) == 1
    assert got[0][3] == 0  # earliest of the tied frames


def test_keyframes_corrupt_media_degrades(spark):
    bad = spark.createDataFrame(
        [(1, bytearray(b"YUV4MPEG2 bogus")), (2, None)],
        "asset_id long, media binary",
    )
    out = {r.asset_id: r.decode_ok for r in video_keyframes(bad).collect()}
    assert out == {1: False, 2: False}
