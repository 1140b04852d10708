"""Distributed-layer tests on the virtual 8-device CPU mesh (SURVEY §4 plan d:
distributed BA == single-host BA modulo reduction order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundle_adjustment_tpu.ops import ba, hamming
from bundle_adjustment_tpu.parallel import dist_ba, dist_match, mesh as mesh_mod

from test_ba import make_problem


@pytest.fixture(scope="module")
def mesh8():
    return mesh_mod.make_mesh(1, 8)


@pytest.fixture(scope="module")
def mesh24():
    return mesh_mod.make_mesh(2, 4)


def test_sharded_ba_matches_single(rng, mesh8):
    prob, (rv, tv, X) = make_problem(rng, n_cams=4, n_pts=64, noise=0.2, perturb=0.05)
    rv1, tv1, pt1, stats1 = ba.ba_solve(prob, n_fixed=1, max_iterations=30)

    sharded = dist_ba.shard_problem(prob, 8)
    rv8, tv8, pt8, stats8 = dist_ba.ba_solve_sharded(
        sharded, mesh8, axis="pt", n_fixed=1, max_iterations=30
    )
    # identical solver path modulo reduction order -> very close results
    assert abs(float(stats8.final_cost) - float(stats1.final_cost)) <= 1e-3 * max(
        float(stats1.final_cost), 1.0
    )
    np.testing.assert_allclose(np.asarray(rv8), np.asarray(rv1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tv8), np.asarray(tv1), atol=1e-3)


def test_shard_problem_roundtrip(rng):
    prob, _ = make_problem(rng, n_cams=3, n_pts=50)
    sharded = dist_ba.shard_problem(prob, 4)
    # all live observations preserved
    assert float(sharded.obs_mask.sum()) == float(prob.obs_mask.sum())
    assert int(sharded.point_mask.sum()) == int(prob.point_mask.sum())
    # local point indices stay within their shard block
    P_s = sharded.points.shape[0] // 4
    pi = np.asarray(sharded.pnt_idx)
    om = np.asarray(sharded.obs_mask) > 0
    O_s = len(pi) // 4
    for s in range(4):
        sel = om[s * O_s:(s + 1) * O_s]
        assert (pi[s * O_s:(s + 1) * O_s][sel] < P_s).all()


def test_windows_consensus(rng, mesh24):
    # two overlapping windows over a 7-camera chain, solved in parallel with
    # points sharded 4-way; shared keyframes get averaged (consensus)
    prob_full, (rv, tv, X) = make_problem(rng, n_cams=7, n_pts=48, noise=0.1,
                                          perturb=0.03)
    wins = dist_ba.partition_windows(7, 2, overlap=1)
    assert len(wins) == 2
    shared = set(wins[0]) & set(wins[1])
    assert shared, "windows must overlap"

    problems = []
    for w in wins:
        keep = np.isin(np.asarray(prob_full.cam_idx), w)
        remap = {int(k): i for i, k in enumerate(dict.fromkeys(w.tolist()))}
        cam_idx = np.array([remap.get(int(c), 0) for c in np.asarray(prob_full.cam_idx)],
                           np.int32)
        sub = prob_full._replace(
            rvecs=jnp.asarray(np.asarray(prob_full.rvecs)[list(remap)], jnp.float32),
            tvecs=jnp.asarray(np.asarray(prob_full.tvecs)[list(remap)], jnp.float32),
            cam_idx=jnp.asarray(cam_idx),
            obs_mask=jnp.asarray(np.asarray(prob_full.obs_mask) * keep, jnp.float32),
        )
        problems.append(dist_ba.shard_problem(sub, 4))
        # equal-length windows (unique kf lists for bookkeeping)
    win_ids = [np.array(list(dict.fromkeys(w.tolist()))) for w in wins]

    poses, sim3s, (rvs, tvs, ptss, stats) = dist_ba.solve_windows_consensus(
        problems, win_ids, mesh24, n_fixed=1, max_iterations=25
    )
    assert len(sim3s) == 2
    assert set(poses) == set(range(7))
    for kf, (rvk, tvk) in poses.items():
        assert np.isfinite(rvk).all() and np.isfinite(tvk).all()
    # consensus poses close to ground truth (each window is well-constrained)
    for kf in sorted(poses):
        np.testing.assert_allclose(poses[kf][0], rv[kf], atol=5e-2)


def test_match_sharded_equals_single(rng, mesh8):
    d1 = hamming.pack_u8_to_u32(jnp.asarray(
        rng.integers(0, 256, size=(256, 32), dtype=np.uint8)))
    d2 = hamming.pack_u8_to_u32(jnp.asarray(
        rng.integers(0, 256, size=(192, 32), dtype=np.uint8)))
    v1 = jnp.ones(256, bool)
    v2 = jnp.arange(192) < 150
    idx0, mask0, best0 = jax.jit(hamming.match, static_argnames=("ratio",))(
        d1, d2, v1, v2, ratio=0.8)
    idx1, mask1, best1 = dist_match.match_sharded(d1, d2, v1, v2, mesh8,
                                                  axis="pt", ratio=0.8)
    np.testing.assert_array_equal(np.asarray(idx0), np.asarray(idx1))
    np.testing.assert_array_equal(np.asarray(mask0), np.asarray(mask1))


def test_match_ring_equals_single(rng, mesh8):
    d1 = hamming.pack_u8_to_u32(jnp.asarray(
        rng.integers(0, 256, size=(128, 32), dtype=np.uint8)))
    d2 = hamming.pack_u8_to_u32(jnp.asarray(
        rng.integers(0, 256, size=(256, 32), dtype=np.uint8)))
    v2 = jnp.arange(256) < 200
    best0, idx0, second0 = hamming.knn2(d1, d2, None, v2)
    idx1, mask1, best1 = dist_match.match_ring(d1, d2, v2, mesh8, axis="pt",
                                               ratio=0.8)
    np.testing.assert_array_equal(np.asarray(best0), np.asarray(best1))
    # ring fold visits blocks in a device-dependent order; ties may pick a
    # different block, so compare distances (exact) and indices via distance
    d_at = np.asarray(hamming.hamming_matrix(d1, d2))
    np.testing.assert_array_equal(
        d_at[np.arange(128), np.asarray(idx1)], np.asarray(best1).astype(int))


def _make_map(n_kfs=5, n_pts=60, seed=0, perturb_kf=None, perturb_mag=0.05):
    """A Map with known GT poses/points, full observations, and optionally
    one keyframe's pose perturbed (for detecting stale writebacks)."""
    from bundle_adjustment_tpu.models.map_store import Keyframe, Map
    from bundle_adjustment_tpu.ops.lie import so3_exp_np

    r = np.random.default_rng(seed)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1.0]])
    X = r.uniform([-3, -3, 6], [3, 3, 14], size=(n_pts, 3))
    m = Map(use_native=False)
    uv_all = []
    for c in range(n_kfs):
        R = so3_exp_np(np.array([0.02 * c, -0.01 * c, 0.005 * c]))
        t = np.array([0.25 * c, 0.02 * c, 0.01 * c])
        Xc = X @ R.T + t
        uv = (Xc[:, :2] / Xc[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        uv_all.append(uv)
        R_store, t_store = R.copy(), t.copy()
        if perturb_kf == c:
            R_store = so3_exp_np(np.array([0.02 * c + perturb_mag,
                                           -0.01 * c, 0.005 * c]))
            t_store = t + perturb_mag
        m.add_keyframe(Keyframe(
            kf_id=c, R=R_store, t=t_store, xy=uv.copy(),
            desc=jnp.zeros((n_pts, 8), jnp.uint32),
            kp_valid=np.ones(n_pts, bool), frame_idx=c,
        ))
    mp_ids = m.add_map_points(X, None)
    for c in range(n_kfs):
        m.add_observations(c, mp_ids, np.arange(n_pts), uv_all[c])
    return m, K, X


def test_gather_window_repeat_padding_routes_to_first_slot():
    """Repeat-padded windows (uneven partitions) must route the duplicated
    keyframe's observations to its FIRST slot — the one the consensus reads —
    not the padding slot (round-1 advisor finding)."""
    m, K, _ = _make_map(n_kfs=3)
    problem, mp_ids, _ = m.gather_window([0, 1, 2, 2], K, 256, 1024)
    live = np.asarray(problem.obs_mask) > 0
    cams = np.asarray(problem.cam_idx)[live]
    assert (cams == 2).sum() > 0, "kf 2's observations missing from slot 2"
    assert (cams == 3).sum() == 0, "observations leaked to the padding slot"


def test_windows_consensus_repeat_padded(mesh24):
    """End-to-end: partitioned global BA with an unevenly split window list
    (last window repeat-padded) must still optimize the padded window's
    last keyframe rather than writing back its stale input pose."""
    from bundle_adjustment_tpu.ops.lie import so3_log_np

    m, K, _ = _make_map(n_kfs=5, perturb_kf=4, perturb_mag=0.04)
    gt_rv = np.array([[0.02 * c, -0.01 * c, 0.005 * c] for c in range(5)])
    gt_tv = np.array([[0.25 * c, 0.02 * c, 0.01 * c] for c in range(5)])

    # both repeat-padded to equal length, like partition_windows produces
    windows = [np.array([0, 1, 2, 2]), np.array([2, 3, 4, 4])]
    problems, mp_lists = [], []
    for ids in windows:
        uniq = list(dict.fromkeys(int(k) for k in ids))
        prob, mp_ids, _ = m.gather_window(
            uniq + [uniq[-1]] * (len(ids) - len(uniq)), K, 64, 256,
            pad_to_max=True)
        problems.append(dist_ba.shard_problem(prob, 4, min_obs_capacity=64))
        mp_lists.append(mp_ids)
    poses, _sim3s, _ = dist_ba.solve_windows_consensus(
        problems, windows, mesh24, n_fixed=2, max_iterations=30)

    # kf 4 entered perturbed by 0.04; the consensus pose must be the
    # OPTIMIZED one (near GT), not the stale input
    rv4, tv4 = poses[4]
    assert np.linalg.norm(rv4 - gt_rv[4]) < 0.01, rv4 - gt_rv[4]
    assert np.linalg.norm(tv4 - gt_tv[4]) < 0.02, tv4 - gt_tv[4]


def test_sim3_consensus_recovers_divergent_gauges():
    """Windows whose solutions live in deliberately divergent sim(3) gauges
    (scale drift + rotation + offset — exactly what independent monocular
    window solves produce) must be reconciled back onto the first window's
    frame.  A Euclidean average of rotation vectors / translations (round-1
    consensus) cannot do this; the sim(3) chain alignment must."""
    from bundle_adjustment_tpu.ops.lie import so3_exp_np, so3_log_np

    gt_rv = np.array([[0.03 * c, -0.02 * c, 0.01 * c] for c in range(6)])
    gt_tv = np.array([[0.3 * c, 0.05 * c, 0.02 * c] for c in range(6)])

    windows = [np.array([0, 1, 2, 3]), np.array([2, 3, 4, 5])]
    # window 0 at GT; window 1 distorted by a sim(3): world scaled 1.4x,
    # rotated 0.2 rad, shifted — its extrinsics transform accordingly
    s_d = 1.4
    R_d = so3_exp_np(np.array([0.1, -0.15, 0.05]))
    t_d = np.array([0.5, -0.3, 0.2])

    rvs = np.zeros((2, 4, 3))
    tvs = np.zeros((2, 4, 3))
    for i, kf in enumerate(windows[0]):
        rvs[0, i] = gt_rv[kf]
        tvs[0, i] = gt_tv[kf]
    for i, kf in enumerate(windows[1]):
        R = so3_exp_np(gt_rv[kf])
        # distorted world: X' = s_d R_d X + t_d; camera center follows as
        # c' = s_d R_d c + t_d, orientation as R' = R R_dᵀ
        c = -R.T @ gt_tv[kf]
        c_w = s_d * (R_d @ c) + t_d
        R_w = R @ R_d.T
        rvs[1, i] = so3_log_np(R_w)
        tvs[1, i] = -(R_w @ c_w)

    poses, sim3s = dist_ba.reconcile_windows_sim3(windows, rvs, tvs)
    # recovered alignment ~ inverse of the distortion
    s_r, R_r, t_r = sim3s[1]
    assert abs(s_r - 1.0 / s_d) < 1e-6
    for kf in range(6):
        rvk, tvk = poses[kf]
        np.testing.assert_allclose(rvk, gt_rv[kf], atol=1e-8)
        np.testing.assert_allclose(tvk, gt_tv[kf], atol=1e-7)


def test_capacity_drop_event_emitted():
    """Over-capacity BA windows must surface a capacity_drop event
    ("no silent caps" — SURVEY §4 quality rule)."""
    from bundle_adjustment_tpu.utils.event_log import EventLog

    m, K, _ = _make_map(n_kfs=3, n_pts=50)
    m.log = EventLog(echo=False)
    problem, mp_ids, _ = m.gather_window([0, 1, 2], K, max_points=16,
                                         max_obs=64)
    drops = [e for e in m.log.events if e["event"] == "capacity_drop"]
    assert drops, "truncation happened but no capacity_drop event"
    assert drops[0]["dropped_points"] == 50 - 16
    assert len(mp_ids) <= 16 and int(np.asarray(problem.obs_mask).sum()) <= 64


def test_grid_from_flat_drop_callback(rng):
    from bundle_adjustment_tpu.ops import ba_grid

    prob, _ = make_problem(rng, n_cams=4, n_pts=32)
    dropped = []
    grid = ba_grid.from_flat(prob, max_slots=1, on_drop=dropped.append)
    assert dropped and dropped[0] > 0
    assert int(np.asarray(grid.mask).sum()) + dropped[0] == int(
        np.asarray(prob.obs_mask).sum())


def test_pipeline_with_sharded_ba(rng):
    """The full pipeline with mesh_shape set runs its LBA through the
    distributed Schur solver (pipeline wiring, not just the solver)."""
    import dataclasses

    from bundle_adjustment_tpu.config import preset_desk
    from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
    from bundle_adjustment_tpu.utils.event_log import EventLog
    from bundle_adjustment_tpu.utils.io import image_folder_frames

    cfg = preset_desk()
    cfg = dataclasses.replace(cfg, num_features=800, pyramid_levels=3,
                              mesh_shape=(1, 4))
    pipe = VisualOdometryPipeline(cfg, log=EventLog(echo=False),
                                  use_pallas_matcher=False)
    for f in image_folder_frames("/root/reference/desk_images"):
        pipe.process_frame(f)
    summary = pipe.finalize("/tmp/mesh_test_out")
    assert summary["num_keyframes"] == 3
    assert summary["global_ba"] is not None and not summary["global_ba"]["diverged"]
    assert pipe._mesh is not None and pipe._mesh.shape == {"win": 1, "pt": 4}


def test_partitioned_global_ba(rng):
    """config 5 end-to-end: partitioned windows + consensus from the pipeline
    API over a (win, pt) mesh, improving the map like a global BA would."""
    import dataclasses

    from bundle_adjustment_tpu.config import CameraModel, PipelineConfig, \
        KeyframeCriteria, BAConfig
    from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
    from bundle_adjustment_tpu.utils.event_log import EventLog
    from bundle_adjustment_tpu.utils.synthetic import synthetic_sequence

    frames, K, gt_C, _ = synthetic_sequence(n_frames=14, seed=1)
    cfg = PipelineConfig(
        camera=CameraModel(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                           width=640, height=480),
        num_features=1000, pyramid_levels=3, ratio_test=0.75,
        min_tracked_features=15, pose_inlier_ratio=0.4, pose_inlier_numbers=15,
        consistent_convention=True,
        keyframe=KeyframeCriteria(min_median_displacement_px=12.0),
        ba=BAConfig(window_size=4, max_points=8192, max_obs=32768),
    )
    pipe = VisualOdometryPipeline(cfg, log=EventLog(echo=False),
                                  use_pallas_matcher=False)
    for f in frames:
        pipe.process_frame(f)
    assert pipe.map.num_keyframes >= 8

    from bundle_adjustment_tpu.parallel import mesh as mesh_mod

    result = pipe.run_partitioned_global_ba(
        n_windows=2, mesh=mesh_mod.make_mesh(2, 4), overlap=2)
    assert result is not None, "partitioned BA skipped"
    assert not result["diverged"]
    assert result["windows"] == 2 and result["mesh"] == {"win": 2, "pt": 4}
    # map stays sane afterwards
    traj = pipe.map.trajectory(consistent=True)
    assert np.isfinite(traj).all()
    d = np.linalg.norm(np.diff(traj, axis=0), axis=1)
    assert (d > 1e-9).all()
