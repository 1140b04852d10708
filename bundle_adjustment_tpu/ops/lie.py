"""so(3)/SE(3) Lie-group operations: closed-form Rodrigues exp/log maps.

TPU-native replacement for cv2.Rodrigues (ref call sites:
src/bundle_adjuster.py:59,157,235 and src/keyframe_detector.py:77).  Unlike
the OpenCV binding these are differentiable — the BA residual is autodiff'd
through ``so3_exp`` instead of finite-differenced.

All functions are dtype-preserving, jit/vmap/grad-safe, and use Taylor
expansions near ``theta = 0`` guarded with ``jnp.where`` on both branches so
gradients stay finite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# 3x3 matmuls are tiny — force full f32 precision so they don't get routed
# through bf16 MXU passes on TPU (1e-3-level error would corrupt poses).
_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_HIGHEST)


def so3_hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector: hat(w) @ v == cross(w, v)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (axis-angle, |w| = angle in radians) -> rotation matrix.

    Rodrigues: R = I + sin(t)/t * W + (1-cos(t))/t^2 * W^2, W = hat(w).
    Near t=0 uses the 2nd-order Taylor coefficients (1 - t^2/6, 1/2 - t^2/24).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)  # guarded sqrt; exact value unused near 0
    small = theta2 < _EPS

    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS))

    W = so3_hat(w)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_exp_and_jac(w: jnp.ndarray):
    """Rodrigues map AND its analytic derivative, batched over leading dims.

    Returns ``(R, dRdw)`` with ``R[..., 3, 3]`` equal to :func:`so3_exp` and
    ``dRdw[..., 3, 3, 3]`` where ``dRdw[..., i, j, k] = dR_ij / dw_k`` —
    matching ``jax.jacfwd(so3_exp)`` to float tolerance (tested in
    tests/test_lie.py) but with no autodiff machinery, so it is usable inside
    Pallas kernels (ops/ba_pallas.py) where jacfwd cannot trace.

    Derivation: R = I + a W + b W² with W = hat(w), a = sin t / t,
    b = (1-cos t)/t².  Then for each component k,

        dR/dw_k = (a'/t) w_k W + a hat(e_k)
                + (b'/t) w_k W² + b (hat(e_k) W + W hat(e_k))

    with the small-angle limits a'/t -> -1/3, b'/t -> -1/12 (Taylor to t²).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < _EPS

    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    a = jnp.where(small, 1.0 - theta2 / 6.0, sin_t / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - cos_t) / theta2.clip(_EPS * _EPS))
    # a'(t)/t and b'(t)/t with Taylor fallbacks
    t3 = (theta2 * theta).clip(_EPS ** 3)
    t4 = (theta2 * theta2).clip(_EPS ** 4)
    ratio_a = jnp.where(small, -1.0 / 3.0 + theta2 / 30.0,
                        (theta * cos_t - sin_t) / t3)
    ratio_b = jnp.where(small, -1.0 / 12.0 + theta2 / 180.0,
                        (theta * sin_t - 2.0 * (1.0 - cos_t)) / t4)

    W = so3_hat(w)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2

    E = so3_hat(jnp.eye(3, dtype=w.dtype))          # (3, 3, 3): E[k] = hat(e_k)
    E = jnp.broadcast_to(E, w.shape[:-1] + (3, 3, 3))
    EW = jnp.matmul(E, W[..., None, :, :], precision=_HIGHEST)
    WE = jnp.matmul(W[..., None, :, :], E, precision=_HIGHEST)

    dR = (
        (ratio_a[..., None, None, None] * w[..., :, None, None]) * W[..., None, :, :]
        + a[..., None, None, None] * E
        + (ratio_b[..., None, None, None] * w[..., :, None, None]) * W2[..., None, :, :]
        + b[..., None, None, None] * (EW + WE)
    )
    # dR currently indexed [..., k, i, j]; reorder to [..., i, j, k]
    dR = jnp.moveaxis(dR, -3, -1)
    return R, dR


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> rotation vector (inverse Rodrigues).

    Handles the three regimes: generic, near-identity (Taylor), and near-pi
    (axis from the diagonal of (R + I)/2).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)

    # generic: w = theta / (2 sin t) * vee(R - R^T)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    small = theta < 1e-5
    near_pi = theta > jnp.pi - 1e-3

    # small-angle: theta/(2 sin t) ~ 1/2 + t^2/12
    scale_generic = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * jnp.where(jnp.abs(sin_t) < _EPS, _EPS, sin_t)),
    )
    w_generic = scale_generic[..., None] * vee

    # near pi: R ~ I + 2/theta^2 * w w^T - ... ; axis^2 from diagonal of (R+I)/2
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag + 1.0) * 0.5, 0.0, 1.0)
    axis = jnp.sqrt(axis2)
    # fix signs using off-diagonal sums: sign(axis_i * axis_j) = sign(R_ij + R_ji)
    # anchor the largest component positive, derive the others
    s01 = R[..., 0, 1] + R[..., 1, 0]
    s02 = R[..., 0, 2] + R[..., 2, 0]
    s12 = R[..., 1, 2] + R[..., 2, 1]
    imax = jnp.argmax(axis2, axis=-1)
    ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
    # per-anchor reconstructions
    x0, y0, z0 = ax, jnp.sign(s01) * ay, jnp.sign(s02) * az          # anchor x
    y1, x1, z1 = ay, jnp.sign(s01) * ax, jnp.sign(s12) * az          # anchor y
    z2, x2, y2 = az, jnp.sign(s02) * ax, jnp.sign(s12) * ay          # anchor z
    axis_fixed = jnp.where(
        (imax == 0)[..., None],
        jnp.stack([x0, y0, z0], axis=-1),
        jnp.where(
            (imax == 1)[..., None],
            jnp.stack([x1, y1, z1], axis=-1),
            jnp.stack([x2, y2, z2], axis=-1),
        ),
    )
    norm = jnp.linalg.norm(axis_fixed, axis=-1, keepdims=True).clip(_EPS)
    w_pi = theta[..., None] * axis_fixed / norm

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation magnitude in radians, = |so3_log(R)| but cheaper and smoother.

    Used by the keyframe rotation trigger (ref: src/keyframe_detector.py:77-81
    computes ||Rodrigues(R_rel)||)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


# ---------------------------------------------------------------------------
# Pose composition — the REFERENCE's convention, reproduced deliberately
# ---------------------------------------------------------------------------

def compose_pose_reference(last_R, last_t, R_rel, t_rel):
    """Compose a new keyframe pose from the last pose and a relative motion,
    exactly as the reference does (ref: src/pipeline.py:244-245):

        world_R = last_R @ R_rel
        world_t = last_t + last_R @ t_rel

    NOTE (documented quirk, SURVEY §2.4): with (R_rel, t_rel) coming from
    essential-matrix recoverPose semantics (x2 = R x1 + t) this composition is
    *not* the mathematically standard cam-to-world chain; the reference treats
    (R, t) inconsistently between composition and BA projection.  We reproduce
    the behavior for parity rather than silently fixing it.
    """
    return _mm(last_R, R_rel), last_t + _mm(last_R, t_rel[..., None])[..., 0]


def invert_rt(R, t):
    """Invert an [R|t] rigid transform: returns (R^T, -R^T t)."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -_mm(Rt, t[..., None])[..., 0]


# ---------------------------------------------------------------------------
# Host-side float64 twins (numpy) for map bookkeeping — the device path stays
# f32, but stored poses are f64 like the reference's numpy state
# ---------------------------------------------------------------------------

def so3_exp_np(w):
    import numpy as np

    w = np.asarray(w, np.float64)
    theta = np.linalg.norm(w)
    if theta < 1e-10:
        W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        return np.eye(3) + W
    k = w / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def so3_log_np(R):
    import numpy as np

    R = np.asarray(R, np.float64)
    cos_t = np.clip((np.trace(R) - 1) / 2, -1, 1)
    theta = np.arccos(cos_t)
    if theta < 1e-10:
        return np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]) / 2
    if theta > np.pi - 1e-6:
        # near pi: axis from diagonal
        A = (R + np.eye(3)) / 2
        axis = np.sqrt(np.clip(np.diag(A), 0, 1))
        # fix signs from off-diagonals, anchoring the largest component
        i = int(np.argmax(axis))
        s = np.array([A[i, 0], A[i, 1], A[i, 2]])
        signs = np.sign(np.where(np.arange(3) == i, 1.0, s))
        axis = axis * signs
        return theta * axis / np.linalg.norm(axis)
    return theta / (2 * np.sin(theta)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )
