"""Pipeline-parallel process_stream must be RESULT-IDENTICAL to the
sequential process_frame loop (SURVEY §2.5 PP row; the fused dispatch key is
derived from the frame index precisely so speculation changes nothing)."""

import numpy as np

from bundle_adjustment_tpu.config import (BAConfig, CameraModel,
                                          KeyframeCriteria, PipelineConfig)
from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
from bundle_adjustment_tpu.utils.event_log import EventLog
from bundle_adjustment_tpu.utils.synthetic import synthetic_sequence


def _cfg(K, w, h):
    return PipelineConfig(
        camera=CameraModel(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                           width=w, height=h),
        num_features=1024,
        pyramid_levels=3,
        ratio_test=0.75,
        min_tracked_features=15,
        pose_inlier_ratio=0.4,
        pose_inlier_numbers=15,
        consistent_convention=True,
        keyframe=KeyframeCriteria(min_median_displacement_px=12.0),
        ba=BAConfig(window_size=4, max_points=4096, max_obs=16384),
    )


def test_stream_matches_sequential():
    frames, K, _, _ = synthetic_sequence(n_frames=12, seed=3)
    h, w = frames[0].shape[:2]

    pipe_a = VisualOdometryPipeline(_cfg(K, w, h), log=EventLog(echo=False),
                                    use_pallas_matcher=False)
    seq_results = [pipe_a.process_frame(f) for f in frames]

    pipe_b = VisualOdometryPipeline(_cfg(K, w, h), log=EventLog(echo=False),
                                    use_pallas_matcher=False)
    stream_results = list(pipe_b.process_stream(frames))

    assert len(stream_results) == len(seq_results)
    assert [r.get("status") for r in stream_results] == \
        [r.get("status") for r in seq_results]
    assert pipe_b.map.num_keyframes == pipe_a.map.num_keyframes
    assert pipe_b.map.num_points == pipe_a.map.num_points
    assert pipe_b.map.num_observations == pipe_a.map.num_observations
    # bit-identical world state: poses and points
    for k in pipe_a.map.sorted_kf_ids():
        np.testing.assert_array_equal(pipe_a.map.keyframes[k].R,
                                      pipe_b.map.keyframes[k].R)
        np.testing.assert_array_equal(pipe_a.map.keyframes[k].t,
                                      pipe_b.map.keyframes[k].t)
    np.testing.assert_array_equal(pipe_a.map.points(), pipe_b.map.points())
