"""Checkpoint/resume tests: exact-resume semantics and deterministic replay
(SURVEY §5: checkpoint/resume + determinism are build requirements the
reference lacks)."""

import numpy as np
import pytest

from bundle_adjustment_tpu.config import preset_desk
from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
from bundle_adjustment_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from bundle_adjustment_tpu.utils.event_log import EventLog
from bundle_adjustment_tpu.utils.io import image_folder_frames

DESK = "/root/reference/desk_images"


def small_cfg():
    cfg = preset_desk()
    return type(cfg)(**{**cfg.__dict__, "num_features": 800, "pyramid_levels": 3})


@pytest.fixture(scope="module")
def frames():
    return list(image_folder_frames(DESK))


def run_all(frames, pipe):
    for f in frames:
        pipe.process_frame(f)
    return pipe


def state_signature(pipe):
    m = pipe.map
    ids = m.sorted_kf_ids()
    return {
        "frame_idx": pipe.frame_idx,
        "n_kf": m.num_keyframes,
        "n_pts": m.num_points,
        "n_obs": m.num_observations,
        "poses": np.stack([m.keyframes[k].t for k in ids]) if ids else None,
        "points": m.points()[m.point_alive()].copy(),
    }


def test_roundtrip_resume_equals_straight_run(frames, tmp_path):
    cfg = small_cfg()

    # straight run
    pipe_a = run_all(frames, VisualOdometryPipeline(cfg, log=EventLog(echo=False),
                                                    use_pallas_matcher=False))
    sig_a = state_signature(pipe_a)

    # interrupted run: 2 frames -> checkpoint -> restore -> last frame
    pipe_b = VisualOdometryPipeline(cfg, log=EventLog(echo=False),
                                    use_pallas_matcher=False)
    for f in frames[:2]:
        pipe_b.process_frame(f)
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(pipe_b, ckpt)
    pipe_c = load_checkpoint(ckpt, cfg, log=EventLog(echo=False),
                             use_pallas_matcher=False)
    for f in frames[2:]:
        pipe_c.process_frame(f)
    sig_c = state_signature(pipe_c)

    assert sig_a["n_kf"] == sig_c["n_kf"]
    assert sig_a["n_pts"] == sig_c["n_pts"]
    assert sig_a["n_obs"] == sig_c["n_obs"]
    np.testing.assert_allclose(sig_c["poses"], sig_a["poses"], atol=1e-9)
    np.testing.assert_allclose(sig_c["points"], sig_a["points"], atol=1e-9)


def test_config_fingerprint_guard(frames, tmp_path):
    cfg = small_cfg()
    pipe = VisualOdometryPipeline(cfg, log=EventLog(echo=False),
                                  use_pallas_matcher=False)
    pipe.process_frame(frames[0])
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(pipe, ckpt)

    other = type(cfg)(**{**cfg.__dict__, "ratio_test": 0.5})
    with pytest.raises(ValueError, match="fingerprint"):
        load_checkpoint(ckpt, other)
    # override works
    pipe2 = load_checkpoint(ckpt, other, strict_config=False,
                            log=EventLog(echo=False), use_pallas_matcher=False)
    assert pipe2.map.num_keyframes == 1


def test_deterministic_replay(frames):
    """Two identical runs produce identical state — SURVEY §5's race-detection
    substitute: the frame loop must be deterministic."""
    cfg = small_cfg()
    a = state_signature(run_all(frames, VisualOdometryPipeline(
        cfg, log=EventLog(echo=False), use_pallas_matcher=False)))
    b = state_signature(run_all(frames, VisualOdometryPipeline(
        cfg, log=EventLog(echo=False), use_pallas_matcher=False)))
    assert a["n_kf"] == b["n_kf"] and a["n_pts"] == b["n_pts"]
    np.testing.assert_array_equal(a["poses"], b["poses"])
    np.testing.assert_array_equal(a["points"], b["points"])
