"""Loop closure (models/loop_closure.py): sim(3) RANSAC unit test, map-point
fusion invariants, and an end-to-end closure on a synthetic drifted ring map
(the reference has no loop closure — its global BA cannot close a loop whose
observation topology never ties; this capability is built fresh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bundle_adjustment_tpu.config import (BAConfig, CameraModel,
                                          KeyframeCriteria, PipelineConfig)
from bundle_adjustment_tpu.models import loop_closure
from bundle_adjustment_tpu.models.map_store import Keyframe, Map
from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
from bundle_adjustment_tpu.ops.lie import so3_exp_np
from bundle_adjustment_tpu.utils.event_log import EventLog


def test_fit_sim3_ransac_with_outliers():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(60, 3)) * 2.0
    s, R, t = 1.3, so3_exp_np(np.array([0.1, -0.2, 0.05])), np.array([0.4, -0.1, 0.7])
    Y = (s * (R @ X.T)).T + t + rng.normal(size=X.shape) * 0.002
    Y[:18] += rng.normal(size=(18, 3)) * 3.0  # 30% outliers
    fit = loop_closure.fit_sim3_ransac(X, Y, tol=0.05)
    assert fit is not None
    s_f, R_f, t_f, inl = fit
    assert abs(s_f - s) < 0.01
    np.testing.assert_allclose(R_f, R, atol=0.01)
    np.testing.assert_allclose(t_f, t, atol=0.05)
    assert inl.sum() >= 40


def _mini_map_with_two_points():
    m = Map(use_native=False)
    rng = np.random.default_rng(1)
    for k in range(3):
        m.add_keyframe(Keyframe(
            kf_id=k, R=np.eye(3), t=np.zeros(3),
            xy=rng.uniform(0, 100, size=(8, 2)),
            desc=jnp.asarray(rng.integers(0, 2**31, size=(8, 8)).astype(np.uint32)),
            kp_valid=np.ones(8, bool), frame_idx=k))
    mp = m.add_map_points(rng.normal(size=(2, 3)))
    # dst observed by KF0(kp0), KF1(kp1); src by KF1(kp2), KF2(kp3)
    m.add_observations(0, mp[:1], np.array([0]), np.zeros((1, 2)))
    m.add_observations(1, mp[:1], np.array([1]), np.zeros((1, 2)))
    m.add_observations(1, mp[1:], np.array([2]), np.zeros((1, 2)))
    m.add_observations(2, mp[1:], np.array([3]), np.zeros((1, 2)))
    return m, int(mp[0]), int(mp[1])


def test_merge_points_redirects_and_keeps_invariants():
    m, dst, src = _mini_map_with_two_points()
    n = m.merge_points(dst, src)
    # KF2's observation redirected; KF1 already observes dst -> dropped
    assert n == 1
    assert not m.point_alive()[src]
    kfs, kps = m.observations_of_point(dst)
    assert sorted(kfs.tolist()) == [0, 1, 2]
    # back-pointers: one map point per keypoint, consistent with the table
    assert m.keyframes[2].kp_to_mp[3] == dst
    assert m.keyframes[1].kp_to_mp[2] == -1   # dropped duplicate
    assert m.num_observations == 3


def _project(K, R, t, X):
    Xc = X @ R.T + t
    return (Xc[:, :2] / Xc[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]


def test_loop_closure_on_drifted_ring():
    """Cameras on a ring observing a central cloud; poses and points carry a
    progressively interpolated sim(3) drift.  The final keyframe revisits the
    start; try_close_loop must detect it, recover the drift sim(3), correct
    the chain (ATE drops), fuse duplicates, and add loop observations."""
    rng = np.random.default_rng(2)
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1.0]])
    C, P = 12, 240
    X_true = rng.normal(size=(P, 3)) * np.array([1.5, 1.0, 1.5])
    desc = jnp.asarray(rng.integers(0, 2**31, size=(P, 8)).astype(np.uint32))

    # true ring poses: cameras at radius 5 looking at the origin
    def true_pose(i, n=C):
        ang = 2 * np.pi * i / n
        Cpos = np.array([5 * np.sin(ang), 0.0, -5 * np.cos(ang)])
        z = -Cpos / np.linalg.norm(Cpos)            # look at origin
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])                     # world->cam rows
        return R, -R @ Cpos

    # drift sim(3) at full strength (alpha=1)
    s_d, R_d, t_d = 1.18, so3_exp_np(np.array([0.0, 0.12, 0.0])), \
        np.array([0.35, 0.0, -0.2])

    def drift(X, alpha):
        sa, Ra, ta = loop_closure._interp_sim3(s_d, R_d, t_d, alpha)
        return (sa * (X @ Ra.T)) + ta

    cfg = PipelineConfig(
        camera=CameraModel(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                           width=640, height=480),
        keyframe=KeyframeCriteria(),
        ba=BAConfig(window_size=4),
        consistent_convention=True,
        loop_closure=True, loop_min_gap=6, loop_min_matches=20,
        loop_min_inliers=10,
        # exercise the post-closure polish BA with its separate LM cap
        # (regression: the cap override must not mutate the frozen config)
        loop_run_global_ba=True, loop_ba_iters=5,
    )
    pipe = VisualOdometryPipeline(cfg, log=EventLog(echo=False))

    true_poses = [true_pose(i) for i in range(C)]
    stored = []
    for i, (R, t) in enumerate(true_poses):
        alpha = i / (C - 1)
        sa, Ra, ta = loop_closure._interp_sim3(s_d, R_d, t_d, alpha)
        Rs = R @ Ra.T
        ts = sa * t - Rs @ ta
        stored.append((Rs, ts, alpha))

    # visibility: split points among keyframes as anchors
    anchors = np.repeat(np.arange(C), -(-P // C))[:P]
    mp_ids = pipe.map.add_map_points(np.zeros((P, 3)))
    for i, (R, t) in enumerate(true_poses):
        Rs, ts, alpha = stored[i]
        mine = np.flatnonzero(anchors == i)
        # stored coords = drifted by the anchor's alpha
        pipe.map._pts[mp_ids[mine]] = drift(X_true[mine], alpha)
        # keyframe sees its own anchors + the previous KF's (track overlap)
        prev = np.flatnonzero(anchors == i - 1) if i else np.array([], int)
        seen = np.concatenate([mine, prev]).astype(int)
        uv = _project(K, R, t, X_true[seen])       # true-geometry pixels
        kf = Keyframe(kf_id=pipe.map.new_keyframe_id(), R=Rs, t=ts,
                      xy=np.zeros((P, 2)), desc=desc,
                      kp_valid=np.zeros(P, bool), frame_idx=i)
        kf.xy[seen] = uv
        kf.kp_valid[seen] = True
        pipe.map.add_keyframe(kf)
        pipe.map.add_observations(kf.kf_id, mp_ids[seen], seen, uv)

    # closing keyframe: revisits KF0's view at full drift; it re-triangulated
    # the anchor-0 points as NEW (duplicate) map points at drifted coords
    R0, t0 = true_poses[0]
    Rs, ts, _ = stored[0]
    sa, Ra, ta = loop_closure._interp_sim3(s_d, R_d, t_d, 1.0)
    R_c = R0 @ Ra.T
    t_c = sa * t0 - R_c @ ta
    first = np.flatnonzero(anchors == 0)
    dup_ids = pipe.map.add_map_points(drift(X_true[first], 1.0))
    uv = _project(K, R0, t0, X_true[first])
    new_kf = Keyframe(kf_id=pipe.map.new_keyframe_id(), R=R_c, t=t_c,
                      xy=np.zeros((P, 2)), desc=desc,
                      kp_valid=np.zeros(P, bool), frame_idx=C)
    new_kf.xy[first] = uv
    new_kf.kp_valid[first] = True
    pipe.map.add_keyframe(new_kf)
    pipe.map.add_observations(new_kf.kf_id, dup_ids, first, uv)

    def chain_ate():
        est = np.stack([-kf.R.T @ kf.t
                        for kf in pipe.map.keyframes.values()])
        gt = np.stack([-R.T @ t for R, t in true_poses]
                      + [-R0.T @ t0])
        return np.linalg.norm(est - gt, axis=1).mean()

    ate_before = chain_ate()
    info = loop_closure.try_close_loop(pipe, new_kf)
    assert info is not None, "loop not detected"
    assert info["anchor_kf"] == 0
    assert abs(info["scale"] - 1.0 / s_d) < 0.05
    assert info["fused"] > 0
    ate_after = chain_ate()
    assert ate_after < 0.35 * ate_before, (ate_before, ate_after)
    # duplicates died; their observations moved to the original points
    assert not pipe.map.point_alive()[dup_ids].any() or \
        pipe.map.point_alive()[dup_ids].sum() < len(dup_ids) * 0.3
