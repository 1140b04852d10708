"""Lie-ops unit tests against the cv2.Rodrigues oracle (SURVEY §4 test plan a)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.ops import lie


def random_rotvecs(rng, n, max_angle=np.pi - 0.2):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return axes * angles


def test_so3_exp_matches_cv2(rng):
    ws = random_rotvecs(rng, 50).astype(np.float32)
    R_jax = np.asarray(jax.vmap(lie.so3_exp)(jnp.asarray(ws)))
    for w, R in zip(ws, R_jax):
        R_cv, _ = cv2.Rodrigues(w.astype(np.float64))
        np.testing.assert_allclose(R, R_cv, atol=1e-5)


def test_so3_exp_small_angle(rng):
    ws = (rng.normal(size=(20, 3)) * 1e-6).astype(np.float32)
    R = np.asarray(jax.vmap(lie.so3_exp)(jnp.asarray(ws)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape), atol=1e-5)


def test_so3_log_roundtrip(rng):
    ws = random_rotvecs(rng, 50).astype(np.float32)
    R = jax.vmap(lie.so3_exp)(jnp.asarray(ws))
    w_back = np.asarray(jax.vmap(lie.so3_log)(R))
    np.testing.assert_allclose(w_back, ws, atol=1e-3)


def test_so3_log_matches_cv2(rng):
    ws = random_rotvecs(rng, 30)
    for w in ws:
        R_cv, _ = cv2.Rodrigues(w)
        w_jax = np.asarray(lie.so3_log(jnp.asarray(R_cv, dtype=jnp.float32)))
        np.testing.assert_allclose(w_jax, w, atol=1e-3)


def test_so3_log_near_pi():
    # rotation by ~pi around a skew axis — the hard branch
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    w = axis * (np.pi - 1e-4)
    R_cv, _ = cv2.Rodrigues(w)
    w_jax = np.asarray(lie.so3_log(jnp.asarray(R_cv, dtype=jnp.float32)))
    # log is defined up to sign at pi; compare rotations, not vectors
    R_back, _ = cv2.Rodrigues(w_jax.astype(np.float64))
    np.testing.assert_allclose(R_back, R_cv, atol=1e-3)


def test_rotation_angle(rng):
    ws = random_rotvecs(rng, 30).astype(np.float32)
    R = jax.vmap(lie.so3_exp)(jnp.asarray(ws))
    angles = np.asarray(jax.vmap(lie.rotation_angle)(R))
    np.testing.assert_allclose(angles, np.linalg.norm(ws, axis=1), atol=1e-4)


def test_exp_is_differentiable():
    g = jax.grad(lambda w: jnp.sum(lie.so3_exp(w)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(lambda w: jnp.sum(lie.so3_exp(w)))(jnp.array([0.3, -0.2, 0.9]))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_compose_pose_reference_formula(rng):
    # parity with the literal formula at src/pipeline.py:244-245
    w1, w2 = random_rotvecs(rng, 2).astype(np.float32)
    t1 = rng.normal(size=3).astype(np.float32)
    t2 = rng.normal(size=3).astype(np.float32)
    R1 = np.asarray(lie.so3_exp(jnp.asarray(w1)))
    R2 = np.asarray(lie.so3_exp(jnp.asarray(w2)))
    Rw, tw = lie.compose_pose_reference(
        jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2), jnp.asarray(t2)
    )
    np.testing.assert_allclose(np.asarray(Rw), R1 @ R2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tw), t1 + R1 @ t2, atol=1e-6)


def test_invert_rt(rng):
    w = random_rotvecs(rng, 1)[0].astype(np.float32)
    R = lie.so3_exp(jnp.asarray(w))
    t = jnp.asarray(rng.normal(size=3).astype(np.float32))
    Ri, ti = lie.invert_rt(R, t)
    X = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    Xc = X @ R.T + t
    X_back = Xc @ Ri.T + ti
    np.testing.assert_allclose(np.asarray(X_back), np.asarray(X), atol=1e-5)


def test_so3_exp_and_jac_matches_jacfwd(rng):
    """Analytic Rodrigues derivative == autodiff, incl. the theta->0 regime
    (the Pallas BA kernel inlines this math; ops/ba_pallas.py)."""
    import jax

    ws = np.concatenate([
        rng.normal(size=(32, 3)),
        np.zeros((1, 3)),
        rng.normal(size=(4, 3)) * 1e-6,
        rng.normal(size=(4, 3)) * np.pi,
    ]).astype(np.float32)
    ws = jnp.asarray(ws)
    R_ad = jax.vmap(lie.so3_exp)(ws)
    J_ad = jax.vmap(jax.jacfwd(lie.so3_exp))(ws)
    R_an, J_an = lie.so3_exp_and_jac(ws)
    np.testing.assert_allclose(np.asarray(R_an), np.asarray(R_ad), atol=1e-6)
    np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad), atol=1e-5)


def test_rodrigues_rows_matches_exp_and_jac(rng):
    """The Pallas kernel's row-stacked Rodrigues == lie.so3_exp_and_jac."""
    from bundle_adjustment_tpu.ops.ba_pallas import _rodrigues_rows

    ws = jnp.asarray(np.concatenate(
        [rng.normal(size=(8, 3)), np.zeros((1, 3))]).astype(np.float32))
    R, J = lie.so3_exp_and_jac(ws)
    R_rows, dR_rows = _rodrigues_rows(jnp.transpose(ws), want_jac=True)
    C = ws.shape[0]
    R_k = np.asarray(R_rows).T.reshape(C, 3, 3)
    np.testing.assert_allclose(R_k, np.asarray(R), atol=1e-6)
    # dR_rows[k*9+i*3+j] = dR_ij/dr_k  ->  (C, k, i, j) -> (C, i, j, k)
    J_k = np.asarray(dR_rows).T.reshape(C, 3, 3, 3).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(J_k, np.asarray(J), atol=1e-5)
