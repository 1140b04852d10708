"""Projection + triangulation tests vs cv2 oracles (SURVEY §4 test plan a)."""

import cv2
import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.ops import lie, projection, triangulation

K = np.array([[912.78, 0, 650.29], [0, 913.03, 362.72], [0, 0, 1.0]])


def make_scene(rng, n=100):
    X = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3))
    w = rng.normal(size=3) * 0.1
    R, _ = cv2.Rodrigues(w)
    t = rng.normal(size=3) * 0.2
    return X, w, R, t


def test_project_matches_cv2(rng):
    X, w, R, t = make_scene(rng)
    uv_cv, _ = cv2.projectPoints(X, w, t, K, None)
    uv_cv = uv_cv.reshape(-1, 2)
    uv, z = projection.project_rvec(
        jnp.asarray(K, jnp.float32),
        jnp.asarray(w, jnp.float32),
        jnp.asarray(t, jnp.float32),
        jnp.asarray(X, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(uv), uv_cv, atol=0.05)
    assert np.all(np.asarray(z) > 0)


def test_pixel_roundtrip(rng):
    uv = rng.uniform([0, 0], [1280, 720], size=(50, 2)).astype(np.float32)
    xn = projection.pixel_to_normalized(jnp.asarray(K, jnp.float32), jnp.asarray(uv))
    back_u = np.asarray(xn)[:, 0] * K[0, 0] + K[0, 2]
    back_v = np.asarray(xn)[:, 1] * K[1, 1] + K[1, 2]
    np.testing.assert_allclose(np.stack([back_u, back_v], 1), uv, atol=1e-3)


def test_triangulate_matches_cv2(rng):
    X, w, R, t = make_scene(rng, n=60)
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t.reshape(3, 1)])
    uv1 = (P1 @ np.hstack([X, np.ones((60, 1))]).T).T
    uv1 = uv1[:, :2] / uv1[:, 2:]
    uv2 = (P2 @ np.hstack([X, np.ones((60, 1))]).T).T
    uv2 = uv2[:, :2] / uv2[:, 2:]

    X_cv = cv2.triangulatePoints(P1, P2, uv1.T, uv2.T)
    X_cv = (X_cv[:3] / X_cv[3:]).T

    X_jax = triangulation.triangulate_dlt(
        jnp.asarray(P1, jnp.float32),
        jnp.asarray(P2, jnp.float32),
        jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(X_jax), X_cv, atol=5e-2)
    np.testing.assert_allclose(np.asarray(X_jax), X, atol=5e-2)


def test_triangulate_pair_cheirality(rng):
    X, w, R, t = make_scene(rng, n=40)
    # points behind camera 1 must be masked out
    X_bad = X.copy()
    X_bad[:10, 2] *= -1
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t.reshape(3, 1)])

    def proj(P, Xs):
        h = (P @ np.hstack([Xs, np.ones((len(Xs), 1))]).T).T
        return h[:, :2] / h[:, 2:]

    uv1, uv2 = proj(P1, X_bad), proj(P2, X_bad)
    Xr, valid = triangulation.triangulate_pair(
        jnp.asarray(K, jnp.float32),
        jnp.asarray(R, jnp.float32),
        jnp.asarray(t, jnp.float32),
        jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
    )
    valid = np.asarray(valid)
    assert not valid[:10].any()
    assert valid[10:].all()
    np.testing.assert_allclose(np.asarray(Xr)[valid], X_bad[valid], atol=5e-2)


def test_sampson_zero_for_exact_matches(rng):
    X, w, R, t = make_scene(rng, n=30)
    E = lie.so3_hat(jnp.asarray(t, jnp.float32)) @ jnp.asarray(R, jnp.float32)
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t.reshape(3, 1)])

    def proj(P, Xs):
        h = (P @ np.hstack([Xs, np.ones((len(Xs), 1))]).T).T
        return h[:, :2] / h[:, 2:]

    uv1 = jnp.asarray(proj(P1, X), jnp.float32)
    uv2 = jnp.asarray(proj(P2, X), jnp.float32)
    errs = projection.epipolar_errors_px(E, jnp.asarray(K, jnp.float32), uv1, uv2)
    assert float(jnp.max(errs)) < 1e-2  # squared px

    # perturbed matches must score worse
    uv2_bad = uv2 + 5.0
    errs_bad = projection.epipolar_errors_px(E, jnp.asarray(K, jnp.float32), uv1, uv2_bad)
    assert float(jnp.median(errs_bad)) > float(jnp.median(errs)) + 1.0
