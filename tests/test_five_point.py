"""5-point minimal solver tests vs ground truth and the cv2 oracle."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.ops import ransac
from bundle_adjustment_tpu.ops.five_point import five_point_candidates

K = np.array([[912.78, 0, 650.29], [0, 913.03, 362.72], [0, 0, 1.0]])


def make_pair(rng, n=5, w_scale=0.1):
    X = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3))
    w = rng.normal(size=3) * w_scale
    R, _ = cv2.Rodrigues(w)
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    x1 = X[:, :2] / X[:, 2:]
    Xc = X @ R.T + t
    x2 = Xc[:, :2] / Xc[:, 2:]
    E = np.cross(np.eye(3), t) @ R  # hat(t) @ R
    return x1, x2, E / np.linalg.norm(E)


def e_dist(E1, E2):
    E1 = E1 / np.linalg.norm(E1)
    E2 = E2 / np.linalg.norm(E2)
    return min(np.abs(E1 - E2).max(), np.abs(E1 + E2).max())


def test_recovers_exact_solution(rng):
    hits = 0
    for trial in range(10):
        x1, x2, E_gt = make_pair(rng)
        Es, valid = five_point_candidates(
            jnp.asarray(x1, jnp.float32)[None], jnp.asarray(x2, jnp.float32)[None]
        )
        Es, valid = np.asarray(Es[0]), np.asarray(valid[0])
        errs = [e_dist(E, E_gt) for E, v in zip(Es, valid) if v]
        if errs and min(errs) < 5e-3:
            hits += 1
    assert hits >= 9, f"only {hits}/10 trials recovered the true essential matrix"


def test_candidates_satisfy_epipolar(rng):
    x1, x2, _ = make_pair(rng)
    Es, valid = five_point_candidates(
        jnp.asarray(x1, jnp.float32)[None], jnp.asarray(x2, jnp.float32)[None]
    )
    Es, valid = np.asarray(Es[0]), np.asarray(valid[0])
    p1 = np.hstack([x1, np.ones((5, 1))])
    p2 = np.hstack([x2, np.ones((5, 1))])
    assert valid.any()
    for E, v in zip(Es, valid):
        if not v:
            continue
        En = E / np.linalg.norm(E)
        res = np.abs(np.sum(p2 * (p1 @ En.T), axis=1)).max()
        assert res < 1e-3, f"candidate violates epipolar constraint: {res}"
        # rank 2 with equal nonzero singular values (essential manifold)
        s = np.linalg.svd(En, compute_uv=False)
        assert s[2] < 1e-4 and abs(s[0] - s[1]) < 1e-3


def test_matches_cv2_5point_solutions(rng):
    """cv2.findEssentialMat on exactly 5 points returns the stacked Nister
    solutions; each must appear in our candidate set."""
    x1, x2, _ = make_pair(rng)
    uv1 = x1 * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    uv2 = x2 * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    E_cv, _ = cv2.findEssentialMat(uv1, uv2, K, method=cv2.LMEDS)
    Es, valid = five_point_candidates(
        jnp.asarray(x1, jnp.float32)[None], jnp.asarray(x2, jnp.float32)[None]
    )
    Es, valid = np.asarray(Es[0]), np.asarray(valid[0])
    ours = [E for E, v in zip(Es, valid) if v]
    assert ours
    for i in range(0, E_cv.shape[0], 3):
        E_ref = E_cv[i : i + 3]
        d = min(e_dist(E, E_ref) for E in ours)
        assert d < 2e-2, f"cv2 solution {i // 3} missing from our candidates: {d}"


def test_ransac_5pt_beats_8pt_on_noisy_wide_baseline(rng):
    """The regression that motivated the 5-point solver: with integer-pixel
    noise and moderate outliers, 5pt must recover at least as many inliers."""
    n = 120
    X = rng.uniform([-3, -3, 3], [3, 3, 12], size=(n, 3))
    w = rng.normal(size=3) * 0.3
    R, _ = cv2.Rodrigues(w)
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)

    def proj(Rc, tc, Xs):
        Xc = Xs @ Rc.T + tc
        return (Xc[:, :2] / Xc[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]

    uv1 = np.round(proj(np.eye(3), np.zeros(3), X))  # integer-pixel keypoints
    uv2 = np.round(proj(R, t, X))
    n_out = 40
    uv2[:n_out] = rng.uniform([0, 0], [1280, 720], size=(n_out, 2))

    results = {}
    for solver in ("5pt", "8pt"):
        res = ransac.estimate_essential_pose(
            jax.random.PRNGKey(0),
            jnp.asarray(uv1, jnp.float32),
            jnp.asarray(uv2, jnp.float32),
            jnp.ones(n, bool),
            jnp.asarray(K, jnp.float32),
            threshold_px=1.0,
            num_hyp=2048,
            solver=solver,
        )
        results[solver] = int(res.num_inliers)
    assert results["5pt"] >= results["8pt"]
    assert results["5pt"] >= 0.9 * (n - n_out), results
