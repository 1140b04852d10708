"""Pinhole projection and epipolar distances.

TPU-native replacement for cv2.projectPoints (ref call site:
src/bundle_adjuster.py:67 — pinhole, zero distortion) and the epipolar
scoring needed by essential-matrix RANSAC (replacing the inlier test inside
cv2.findEssentialMat, ref: src/pose_estimator.py:27).

All functions broadcast over leading batch dims and are autodiff-safe; the BA
residual differentiates through ``project_rvec``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bundle_adjustment_tpu.ops.lie import so3_exp

# geometry matmuls run at full f32 — bf16 MXU rounding would cost whole pixels
# at 4-digit pixel coordinates
_HIGHEST = jax.lax.Precision.HIGHEST


def project(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray):
    """Project world points through extrinsic [R|t] and intrinsics K.

    X: (..., N, 3) world points; R: (..., 3, 3); t: (..., 3); K: (3, 3).
    Returns (uv, z): pixel coords (..., N, 2) and camera-frame depth (..., N).
    The depth is returned so callers can build cheirality masks instead of
    branching (static-shape design)."""
    Xc = jnp.matmul(X, jnp.swapaxes(R, -1, -2), precision=_HIGHEST) + t[..., None, :]
    z = Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    x = Xc[..., 0] / z_safe
    y = Xc[..., 1] / z_safe
    u = K[0, 0] * x + K[0, 2]
    v = K[1, 1] * y + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


def project_rvec(K: jnp.ndarray, rvec: jnp.ndarray, tvec: jnp.ndarray, X: jnp.ndarray):
    """cv2.projectPoints-equivalent: rotation-vector parameterized projection.
    This is the exact form the BA cost differentiates (ref semantics:
    src/bundle_adjuster.py:59-67)."""
    return project(K, so3_exp(rvec), tvec, X)


def pixel_to_normalized(K: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels -> normalized camera coordinates (undistorted pinhole)."""
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x, y], axis=-1)


def sampson_distance(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) distance for an essential matrix, in
    normalized-coordinate units.

    x1, x2: (..., N, 2) normalized coords in cam1/cam2; E: (..., 3, 3).
    d = (x2ᵀ E x1)² / (‖(E x1)₀₁‖² + ‖(Eᵀ x2)₀₁‖²).
    """
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)  # (..., N, 3)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Ep1 = jnp.matmul(p1, jnp.swapaxes(E, -1, -2), precision=_HIGHEST)  # rows = E @ p1
    Etp2 = jnp.matmul(p2, E, precision=_HIGHEST)                       # rows = Eᵀ @ p2
    err = jnp.sum(p2 * Ep1, axis=-1)            # x2ᵀ E x1
    denom = (
        Ep1[..., 0] ** 2 + Ep1[..., 1] ** 2 + Etp2[..., 0] ** 2 + Etp2[..., 1] ** 2
    ).clip(1e-12)
    return err * err / denom


def epipolar_errors_px(E, K, uv1, uv2):
    """Sampson distance converted to (squared) pixel units via mean focal
    length, matching the pixel-threshold convention of the reference's RANSAC
    (threshold 3.0 px at src/pose_estimator.py:27)."""
    f = (K[0, 0] + K[1, 1]) * 0.5
    x1 = pixel_to_normalized(K, uv1)
    x2 = pixel_to_normalized(K, uv2)
    return sampson_distance(E, x1, x2) * (f * f)
