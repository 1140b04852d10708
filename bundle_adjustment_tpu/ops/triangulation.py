"""Batched DLT triangulation with two-sided cheirality masking.

TPU-native replacement for cv2.triangulatePoints + the reference's
homogeneous divide and both-camera z>0 filter (ref: src/pipeline.py:315-336;
the cheirality check is at 325-333, the +1e-6 divide guard at 323).

Instead of filtering (dynamic shapes), we return a validity mask — downstream
stages carry the mask through the static-shape observation tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


def camera_matrix(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """P = K [R | t], broadcasting over leading dims."""
    Rt = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    return jnp.matmul(K, Rt, precision=_HIGHEST)


def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray):
    """Linear (DLT) triangulation of N correspondences.

    P1, P2: (3, 4) camera matrices; uv1, uv2: (N, 2) pixel coords.
    Returns X: (N, 3) points in the coordinate frame of P1/P2's world.

    Solves the classic 4x4 homogeneous system per point via the eigenvector of
    AᵀA with smallest eigenvalue (batched eigh of a symmetric 4x4 — cheap and
    XLA-friendly; avoids per-point SVD).  The homogeneous divide uses the same
    epsilon guard the reference does (src/pipeline.py:323).
    """
    u1, v1 = uv1[..., 0], uv1[..., 1]
    u2, v2 = uv2[..., 0], uv2[..., 1]
    # rows: u*P[2] - P[0], v*P[2] - P[1] for each view → (N, 4, 4)
    A = jnp.stack(
        [
            u1[:, None] * P1[2] - P1[0],
            v1[:, None] * P1[2] - P1[1],
            u2[:, None] * P2[2] - P2[0],
            v2[:, None] * P2[2] - P2[1],
        ],
        axis=-2,
    )
    AtA = jnp.matmul(jnp.swapaxes(A, -1, -2), A, precision=_HIGHEST)  # (N, 4, 4) sym PSD
    _, vecs = jnp.linalg.eigh(AtA)     # ascending eigenvalues
    Xh = vecs[..., :, 0]               # (N, 4) smallest-eigenvalue eigenvector
    w = Xh[..., 3]
    w_safe = w + jnp.where(w >= 0, 1e-6, -1e-6)
    return Xh[..., :3] / w_safe[..., None]


def cheirality_mask(
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    R2: jnp.ndarray,
    t2: jnp.ndarray,
    X: jnp.ndarray,
    max_depth: float = 1e6,
) -> jnp.ndarray:
    """True where X is in front of BOTH cameras (z > 0), the reference's
    two-sided check (src/pipeline.py:325-333).  A generous max-depth bound
    rejects near-infinity DLT blowups that the reference would keep."""
    z1 = (X @ R1[2, :]) + t1[2]
    z2 = (X @ R2[2, :]) + t2[2]
    return (z1 > 0) & (z2 > 0) & (z1 < max_depth) & (z2 < max_depth)


def triangulate_pair(K, R_rel, t_rel, uv1, uv2):
    """Two-view triangulation in the first camera's frame, exactly the
    reference's setup: P1 = K[I|0], P2 = K[R_rel|t_rel]
    (ref: src/pipeline.py:319-322).  Returns (X, valid_mask)."""
    eye = jnp.eye(3, dtype=R_rel.dtype)
    zero = jnp.zeros((3,), dtype=R_rel.dtype)
    P1 = camera_matrix(K.astype(R_rel.dtype), eye, zero)
    P2 = camera_matrix(K.astype(R_rel.dtype), R_rel, t_rel)
    X = triangulate_dlt(P1, P2, uv1, uv2)
    valid = cheirality_mask(eye, zero, R_rel, t_rel, X)
    return X, valid
