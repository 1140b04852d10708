"""Relocalization and map-point culling tests (the lehman_indoor config's
failure-handling subsystems, SURVEY §5)."""

import dataclasses

import numpy as np
import pytest

from bundle_adjustment_tpu.config import CameraModel, PipelineConfig, KeyframeCriteria, BAConfig
from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
from bundle_adjustment_tpu.utils.event_log import EventLog
from bundle_adjustment_tpu.utils.synthetic import synthetic_sequence


def make_cfg(K, **kw):
    base = dict(
        camera=CameraModel(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                           width=640, height=480),
        num_features=1200, pyramid_levels=4, ratio_test=0.75,
        min_tracked_features=15, pose_inlier_ratio=0.4, pose_inlier_numbers=15,
        consistent_convention=True,
        keyframe=KeyframeCriteria(min_median_displacement_px=12.0),
        ba=BAConfig(window_size=4, max_points=4096, max_obs=16384),
    )
    base.update(kw)
    return PipelineConfig(**base)


@pytest.fixture(scope="module")
def seq():
    return synthetic_sequence(n_frames=10, seed=0)


def test_relocalization_after_blackout(seq):
    """Track a few frames, feed garbage (tracking loss), then return to a
    previously seen view: the pipeline must relocalize via the descriptor
    bank + PnP instead of staying lost."""
    frames, K, gt_C, gt_R = seq
    cfg = make_cfg(K, reloc_enabled=True, reloc_bank_size=8)
    pipe = VisualOdometryPipeline(cfg, log=EventLog(echo=False),
                                  use_pallas_matcher=False)
    for f in frames[:6]:
        pipe.process_frame(f)
    n_kf_before = pipe.map.num_keyframes
    assert n_kf_before >= 4

    rng = np.random.default_rng(0)
    black = rng.integers(0, 30, size=frames[0].shape, dtype=np.uint8)
    for _ in range(2):
        r = pipe.process_frame(black)
        assert r["status"] == "discarded"  # garbage frames never relocalize
    bad_reloc = [e for e in pipe.log.events if e["event"] == "relocalization"]
    assert bad_reloc and not any(e["success"] for e in bad_reloc), (
        "garbage frames must fail relocalization cleanly")

    # force the relocalization path on a previously seen view (the organic
    # path would recover via normal last-KF tracking first, which is also
    # fine — here we exercise the bank-search + PnP re-entry itself)
    import cv2

    pipe.frame_idx += 1
    gray = cv2.cvtColor(frames[4], cv2.COLOR_BGR2GRAY)
    kp = pipe._extract(gray)
    pipe._lost_frames = 2
    r = pipe._tracking_lost(frames[4], kp, "forced")
    assert r is not None and r["status"] == "relocalized", r
    assert r["inliers"] > 15
    ok_reloc = [e for e in pipe.log.events
                if e["event"] == "relocalization" and e["success"]]
    assert ok_reloc and ok_reloc[-1]["kf_id"] >= 0
    # the relocalized keyframe's pose is close to the anchor view's GT pose
    new_kf = pipe.map.keyframes[r["kf_id"]]
    C_est = -new_kf.R.T @ new_kf.t
    # compare against the mapped frame-4 camera center up to map scale: use
    # the already-estimated KF at frame 4 as the target
    target = [k for k in pipe.map.keyframes.values() if k.frame_idx == 4]
    assert target
    C_ref = -target[0].R.T @ target[0].t
    assert np.linalg.norm(C_est - C_ref) < 0.2 * max(np.linalg.norm(C_ref), 1.0)


def test_culling_removes_weak_points(seq):
    """With culling on, weakly-observed points outside the active window are
    removed and the observation table stays consistent."""
    frames, K, _, _ = seq
    cfg = make_cfg(K, cull_enabled=True, cull_min_observations=3,
                   ba=BAConfig(window_size=2, max_points=4096, max_obs=16384))
    pipe = VisualOdometryPipeline(cfg, log=EventLog(echo=False),
                                  use_pallas_matcher=False)
    for f in frames:
        pipe.process_frame(f)
    cull_events = [e for e in pipe.log.events if e["event"] == "cull"]
    assert cull_events, "culling never triggered"
    assert sum(e["culled"] for e in cull_events) > 0
    # no observation references a dead point
    m = pipe.map
    alive_obs = m._obs_alive[: m._n_obs]
    assert m.point_alive()[m._obs_mp[: m._n_obs][alive_obs]].all()
    # kp_to_mp back-pointers never reference dead points
    for kf in m.keyframes.values():
        live = kf.kp_to_mp[kf.kp_to_mp >= 0]
        assert m.point_alive()[live].all()
