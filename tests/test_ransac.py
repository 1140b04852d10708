"""RANSAC pose tests: synthetic ground truth + cv2 chain comparison
(SURVEY §4 plan a/b)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.ops import ransac

K = np.array([[912.78, 0, 650.29], [0, 913.03, 362.72], [0, 0, 1.0]])


def synthetic_matches(rng, n=500, outlier_frac=0.3, noise_px=0.5):
    X = rng.uniform([-3, -3, 4], [3, 3, 12], size=(n, 3))
    w = rng.normal(size=3) * 0.1
    R, _ = cv2.Rodrigues(w)
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    t *= 0.5

    def proj(Rc, tc, Xs):
        Xc = Xs @ Rc.T + tc
        return (Xc[:, :2] / Xc[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]

    uv1 = proj(np.eye(3), np.zeros(3), X)
    uv2 = proj(R, t, X)
    uv1 += rng.normal(size=uv1.shape) * noise_px
    uv2 += rng.normal(size=uv2.shape) * noise_px
    n_out = int(n * outlier_frac)
    uv2[:n_out] = rng.uniform([0, 0], [1280, 720], size=(n_out, 2))
    gt_inlier = np.ones(n, bool)
    gt_inlier[:n_out] = False
    return uv1, uv2, R, t, gt_inlier, X


def test_essential_recovers_pose(rng):
    uv1, uv2, R_gt, t_gt, gt_inl, _ = synthetic_matches(rng)
    res = ransac.estimate_essential_pose(
        jax.random.PRNGKey(0),
        jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
        jnp.ones(len(uv1), bool),
        jnp.asarray(K, jnp.float32),
        threshold_px=3.0,
    )
    assert bool(res.ok)
    R, t = np.asarray(res.R), np.asarray(res.t)
    # rotation within 0.5 deg
    ang = np.degrees(np.arccos(np.clip((np.trace(R.T @ R_gt) - 1) / 2, -1, 1)))
    assert ang < 0.5, f"rotation error {ang:.3f} deg"
    # translation direction within 1 deg (sign/scale-free up to cheirality)
    cosang = abs(t @ t_gt) / np.linalg.norm(t_gt)
    assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 1.5
    # cheirality fixed the sign
    assert t @ t_gt > 0
    # inlier set matches ground truth closely
    inl = np.asarray(res.inliers)
    assert (inl & gt_inl).sum() / gt_inl.sum() > 0.9
    assert (inl & ~gt_inl).sum() / (~gt_inl).sum() < 0.1


def test_essential_matches_cv2_on_same_data(rng):
    uv1, uv2, R_gt, t_gt, _, _ = synthetic_matches(rng, n=300, outlier_frac=0.2)
    res = ransac.estimate_essential_pose(
        jax.random.PRNGKey(1),
        jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
        jnp.ones(len(uv1), bool),
        jnp.asarray(K, jnp.float32),
    )
    E_cv, mask = cv2.findEssentialMat(uv1, uv2, K, method=cv2.RANSAC, prob=0.999, threshold=3.0)
    _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, uv1, uv2, K, mask=mask.copy())
    R = np.asarray(res.R)
    dR = np.degrees(np.arccos(np.clip((np.trace(R.T @ R_cv) - 1) / 2, -1, 1)))
    assert dR < 1.0, f"ours vs cv2 rotation differs by {dR:.2f} deg"
    # inlier counts comparable
    assert abs(int(res.num_inliers) - int(mask.sum())) < 0.1 * len(uv1)


def test_essential_masked_points_ignored(rng):
    uv1, uv2, R_gt, _, _, _ = synthetic_matches(rng, n=400, outlier_frac=0.0)
    # corrupt the masked-out half completely
    uv2_bad = uv2.copy()
    uv2_bad[200:] = rng.uniform([0, 0], [1280, 720], size=(200, 2))
    valid = jnp.arange(400) < 200
    res = ransac.estimate_essential_pose(
        jax.random.PRNGKey(2),
        jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2_bad, jnp.float32),
        valid,
        jnp.asarray(K, jnp.float32),
    )
    R = np.asarray(res.R)
    ang = np.degrees(np.arccos(np.clip((np.trace(R.T @ R_gt) - 1) / 2, -1, 1)))
    assert ang < 0.5
    assert not np.asarray(res.inliers)[200:].any()


def test_pnp_recovers_pose(rng):
    uv1, uv2, R_gt, t_gt, gt_inl, X = synthetic_matches(rng, n=300, outlier_frac=0.25)
    res = ransac.estimate_pnp_pose(
        jax.random.PRNGKey(3),
        jnp.asarray(X, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
        jnp.ones(len(X), bool),
        jnp.asarray(K, jnp.float32),
        reproj_threshold_px=8.0,
    )
    assert bool(res.ok)
    R, t = np.asarray(res.R), np.asarray(res.t)
    ang = np.degrees(np.arccos(np.clip((np.trace(R.T @ R_gt) - 1) / 2, -1, 1)))
    assert ang < 0.5, f"rotation error {ang:.3f} deg"
    np.testing.assert_allclose(t, t_gt, atol=0.05)  # PnP recovers metric t
    inl = np.asarray(res.inliers)
    assert (inl & gt_inl).sum() / gt_inl.sum() > 0.9


def test_pnp_matches_cv2(rng):
    uv1, uv2, R_gt, t_gt, _, X = synthetic_matches(rng, n=200, outlier_frac=0.1)
    res = ransac.estimate_pnp_pose(
        jax.random.PRNGKey(4),
        jnp.asarray(X, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
        jnp.ones(len(X), bool),
        jnp.asarray(K, jnp.float32),
    )
    ok, rvec, tvec, inl = cv2.solvePnPRansac(
        X, uv2, K, None, iterationsCount=100, reprojectionError=8.0, confidence=0.99,
        flags=cv2.SOLVEPNP_ITERATIVE,
    )
    assert ok
    R_cv, _ = cv2.Rodrigues(rvec)
    R = np.asarray(res.R)
    dR = np.degrees(np.arccos(np.clip((np.trace(R.T @ R_cv) - 1) / 2, -1, 1)))
    assert dR < 1.0
    np.testing.assert_allclose(np.asarray(res.t), tvec.ravel(), atol=0.05)


def test_too_few_points_not_ok():
    res = ransac.estimate_essential_pose(
        jax.random.PRNGKey(5),
        jnp.zeros((64, 2), jnp.float32),
        jnp.zeros((64, 2), jnp.float32),
        jnp.arange(64) < 5,
        jnp.asarray(K, jnp.float32),
    )
    assert not bool(res.ok)
