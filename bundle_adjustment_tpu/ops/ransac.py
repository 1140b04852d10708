"""Batched-hypothesis RANSAC pose estimation, fully jitted.

TPU-native replacement for cv2.findEssentialMat(RANSAC) + cv2.recoverPose
(ref: src/pose_estimator.py:27-31) and cv2.solvePnPRansac
(ref: src/pose_estimator.py:72-81).  Instead of the data-dependent
hypothesize-verify loop, a static batch of K minimal samples is drawn and
scored with one vmapped pass (SURVEY §7 hard part 2): sample -> closed-form
solve -> Sampson/reprojection scoring -> masked argmax -> IRLS refinement on
the winner's inliers.  All shapes static; invalid correspondences are masked.

Essential path: Hartley-normalized 8-point solve (eigh of the 9x9 normal
matrix), rank-2 projection, cheirality-vote decomposition into (R, t).
PnP path: 6-point DLT for the full projection matrix, nearest-rotation
extraction, reprojection scoring, Gauss-Newton polish on inliers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundle_adjustment_tpu.ops.five_point import five_point_candidates
from bundle_adjustment_tpu.ops.lie import so3_exp, so3_hat
from bundle_adjustment_tpu.ops.projection import pixel_to_normalized, sampson_distance

_HIGHEST = jax.lax.Precision.HIGHEST


class PoseResult(NamedTuple):
    R: jnp.ndarray            # (3, 3) relative rotation (x2 = R x1 + t convention)
    t: jnp.ndarray            # (3,) unit-norm relative translation
    inliers: jnp.ndarray      # (N,) bool
    num_inliers: jnp.ndarray  # () int32
    inlier_ratio: jnp.ndarray # () f32, inliers / valid matches
    ok: jnp.ndarray           # () bool — enough valid points to estimate


def _sample_indices(key, valid, num_hyp, sample_size, quality=None):
    """(num_hyp, sample_size) indices drawn from the valid slots.

    With ``quality`` (lower = better, e.g. Hamming match distance), sampling
    is progressive (PROSAC-style): hypothesis h draws from the best
    ``k_h`` valid correspondences, with k growing linearly from
    ~2x the sample size to all of them.  At low inlier rates this raises the
    all-inlier sample probability by orders of magnitude over uniform
    sampling — the batched counterpart of cv2's early-exit adaptive loop."""
    n = valid.shape[0]
    if quality is None:
        order = jnp.argsort(~valid)        # valid indices first, stable
    else:
        order = jnp.argsort(jnp.where(valid, quality, jnp.inf))
    n_valid = jnp.sum(valid).astype(jnp.float32)
    if quality is None:
        k_h = jnp.full((num_hyp, 1), 1.0) * jnp.maximum(n_valid, 1.0)
    else:
        frac = (jnp.arange(num_hyp, dtype=jnp.float32) + 1.0) / num_hyp
        k0 = jnp.minimum(2.0 * sample_size, jnp.maximum(n_valid, 1.0))
        k_h = (k0 + frac * jnp.maximum(n_valid - k0, 0.0))[:, None]
    u = jax.random.uniform(key, (num_hyp, sample_size))
    r = jnp.floor(u * k_h).astype(jnp.int32)
    return order[jnp.clip(r, 0, n - 1)]


def _hartley_normalize(x):
    """Per-sample isotropic normalization: centroid 0, mean norm sqrt(2).
    x: (S, 2) -> (x_norm, T) with T (3,3) s.t. x_norm_h = T @ x_h."""
    c = jnp.mean(x, axis=0)
    d = jnp.mean(jnp.linalg.norm(x - c, axis=1))
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-8)
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=x.dtype
    )
    T = T.at[0, 0].set(s).at[1, 1].set(s).at[0, 2].set(-s * c[0]).at[1, 2].set(-s * c[1])
    return (x - c) * s, T


def _eight_point(x1, x2, w=None):
    """Weighted 8-point essential estimate from normalized-camera coords.
    x1, x2: (S, 2); w: optional (S,) weights.  Returns E (3, 3), rank-2."""
    x1n, T1 = _hartley_normalize(x1)
    x2n, T2 = _hartley_normalize(x2)
    ones = jnp.ones_like(x1n[:, :1])
    p1 = jnp.concatenate([x1n, ones], axis=1)  # (S, 3)
    p2 = jnp.concatenate([x2n, ones], axis=1)
    A = (p2[:, :, None] * p1[:, None, :]).reshape(-1, 9)  # rows = outer(p2, p1)
    if w is not None:
        A = A * w[:, None]
    AtA = jnp.matmul(A.T, A, precision=_HIGHEST)
    _, vecs = jnp.linalg.eigh(AtA)
    E = vecs[:, 0].reshape(3, 3)
    E = jnp.matmul(jnp.matmul(T2.T, E, precision=_HIGHEST), T1, precision=_HIGHEST)
    # project to the essential manifold: singular values (1, 1, 0)
    U, s, Vt = jnp.linalg.svd(E)
    E = jnp.matmul(U * jnp.array([1.0, 1.0, 0.0], E.dtype), Vt, precision=_HIGHEST)
    return E


def _decompose_e(E):
    """E -> the four (R, t) candidates (Hartley-Zisserman)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = jnp.matmul(jnp.matmul(U, W, precision=_HIGHEST), Vt, precision=_HIGHEST)
    R2 = jnp.matmul(jnp.matmul(U, W.T, precision=_HIGHEST), Vt, precision=_HIGHEST)
    t = U[:, 2]
    return jnp.stack([R1, R1, R2, R2]), jnp.stack([t, -t, t, -t])


def _cheirality_counts(R, t, x1, x2, mask):
    """Count points in front of both cameras for candidate (R, t).
    Linear depth: d1 = -(p2 x t).(p2 x R p1) / |p2 x R p1|^2."""
    ones = jnp.ones_like(x1[:, :1])
    p1 = jnp.concatenate([x1, ones], axis=1)
    p2 = jnp.concatenate([x2, ones], axis=1)
    Rp1 = jnp.matmul(p1, R.T, precision=_HIGHEST)
    a = jnp.cross(p2, Rp1)
    b = jnp.cross(p2, jnp.broadcast_to(t, p2.shape))
    d1 = -jnp.sum(b * a, axis=1) / jnp.sum(a * a, axis=1).clip(1e-12)
    z2 = d1 * Rp1[:, 2] + t[2]
    return jnp.sum((d1 > 0) & (z2 > 0) & mask)


def _tangent_basis(t):
    """(3, 2) orthonormal basis of the plane perpendicular to unit vector t."""
    e = jnp.where(jnp.abs(t[0]) < 0.9,
                  jnp.array([1.0, 0.0, 0.0], t.dtype),
                  jnp.array([0.0, 1.0, 0.0], t.dtype))
    b1 = jnp.cross(t, e)
    b1 = b1 / jnp.linalg.norm(b1).clip(1e-12)
    b2 = jnp.cross(t, b1)
    return jnp.stack([b1, b2], axis=1)


def _polish_rt(R, t, x1, x2, valid, thr_norm_sq, iters=5):
    """Gauss-Newton on the 5-dof essential manifold (rotation + translation
    direction), minimizing the signed Sampson residual over current inliers —
    the counterpart of the LM polish inside cv2's RANSAC that our batched
    8-point path otherwise lacks.  Re-gates inliers each iteration."""
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    p2 = jnp.concatenate([x2, ones], axis=-1)

    def signed_sampson(E, w):
        Ep1 = jnp.matmul(p1, E.T, precision=_HIGHEST)
        Etp2 = jnp.matmul(p2, E, precision=_HIGHEST)
        err = jnp.sum(p2 * Ep1, axis=-1)
        denom = (Ep1[..., 0] ** 2 + Ep1[..., 1] ** 2
                 + Etp2[..., 0] ** 2 + Etp2[..., 1] ** 2).clip(1e-12)
        return err / jnp.sqrt(denom) * w

    def step(carry, _):
        R, t = carry
        E = jnp.matmul(so3_hat(t), R, precision=_HIGHEST)
        d = sampson_distance(E, x1, x2)
        w = ((d < thr_norm_sq) & valid).astype(x1.dtype)
        B = _tangent_basis(t)

        def res(params):
            R2 = jnp.matmul(so3_exp(params[:3]), R, precision=_HIGHEST)
            t2 = t + B @ params[3:]
            t2 = t2 / jnp.linalg.norm(t2).clip(1e-12)
            return signed_sampson(jnp.matmul(so3_hat(t2), R2, precision=_HIGHEST), w)

        p0 = jnp.zeros(5, x1.dtype)
        r = res(p0)
        J = jax.jacfwd(res)(p0)                           # (N, 5)
        JtJ = jnp.matmul(J.T, J, precision=_HIGHEST) + 1e-9 * jnp.eye(5, dtype=x1.dtype)
        g = jnp.matmul(J.T, r, precision=_HIGHEST)
        delta = -jnp.linalg.solve(JtJ, g)
        R_new = jnp.matmul(so3_exp(delta[:3]), R, precision=_HIGHEST)
        t_new = t + B @ delta[3:]
        t_new = t_new / jnp.linalg.norm(t_new).clip(1e-12)
        # accept on the MSAC score (sharper than inlier count on the
        # small-baseline plateau where the count is flat)
        def msac(R_, t_):
            E_ = jnp.matmul(so3_hat(t_), R_, precision=_HIGHEST)
            return jnp.sum(jnp.minimum(sampson_distance(E_, x1, x2), thr_norm_sq)
                           * valid)

        better = msac(R_new, t_new) <= msac(R, t)
        return (jnp.where(better, R_new, R), jnp.where(better, t_new, t)), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t


@functools.partial(jax.jit, static_argnames=("num_hyp", "refine_iters", "solver"))
def estimate_essential_pose(
    key,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    threshold_px: float = 3.0,
    num_hyp: int = 1024,
    refine_iters: int = 2,
    quality: jnp.ndarray | None = None,
    solver: str = "5pt",
) -> PoseResult:
    """Essential-matrix RANSAC + cheirality-max decomposition.

    uv1, uv2: (N, 2) pixel matches (static N, masked by `valid`).
    Semantics match the reference chain findEssentialMat(RANSAC, prob=.999,
    threshold)+recoverPose (src/pose_estimator.py:27-31): returns the relative
    pose with x2 = R x1 + t and the epipolar-inlier mask.

    ``solver``: "5pt" (default — Nister/Stewenius minimal solver, exact on
    the sample, matching cv2's internals; ~num_hyp/10 minimal samples each
    yielding up to 10 candidates) or "8pt" (Hartley-normalized least-squares
    minimal solver; cheaper per sample but needs all-inlier *and* low-noise
    samples, measurably weaker on wide-baseline data).
    """
    Kf = K.astype(uv1.dtype)
    x1 = pixel_to_normalized(Kf, uv1)
    x2 = pixel_to_normalized(Kf, uv2)
    f = (Kf[0, 0] + Kf[1, 1]) * 0.5
    thr_norm_sq = (threshold_px / f) ** 2  # Sampson in normalized units

    def msac(E):
        # truncated-Sampson (MSAC) score: lower is better.  Discriminates
        # within the inlier-count plateau that small-baseline pairs produce
        # (the count is flat over a wide model manifold there).
        d = sampson_distance(E, x1, x2)
        return jnp.sum(jnp.minimum(d, thr_norm_sq) * valid)

    def count(E):
        d = sampson_distance(E, x1, x2)
        return jnp.sum((d < thr_norm_sq) & valid)

    if solver == "5pt":
        n_samples = max(num_hyp // 10, 32)
        idx = _sample_indices(key, valid, n_samples, 5, quality)      # (S, 5)
        Es, cand_ok = five_point_candidates(x1[idx], x2[idx])         # (S,10,3,3)
        Es = Es.reshape(-1, 3, 3)
        cand_ok = cand_ok.reshape(-1)
        scores = jnp.where(cand_ok, jax.vmap(msac)(Es), jnp.inf)
    else:
        idx = _sample_indices(key, valid, num_hyp, 8, quality)        # (K, 8)
        Es = jax.vmap(lambda i: _eight_point(x1[i], x2[i]))(idx)      # (K, 3, 3)
        scores = jax.vmap(msac)(Es)

    best = jnp.argmin(scores)
    E = Es[best]

    # IRLS refinement: re-solve with all current inliers, repeat
    def refine(E, _):
        d = sampson_distance(E, x1, x2)
        w = ((d < thr_norm_sq) & valid).astype(x1.dtype)
        E2 = _eight_point(x1, x2, w)
        better = msac(E2) <= msac(E)
        return jnp.where(better, E2, E), None

    E, _ = jax.lax.scan(refine, E, None, length=refine_iters)

    d = sampson_distance(E, x1, x2)
    inliers = (d < thr_norm_sq) & valid

    Rs, ts = _decompose_e(E)
    votes = jax.vmap(lambda R, t: _cheirality_counts(R, t, x1, x2, inliers))(Rs, ts)
    pick = jnp.argmax(votes)
    R, t = Rs[pick], ts[pick]

    # manifold polish (recovers the borderline inliers cv2's internal LM gets)
    R, t = _polish_rt(R, t, x1, x2, valid, thr_norm_sq)
    E = jnp.matmul(so3_hat(t), R, precision=_HIGHEST)
    d = sampson_distance(E, x1, x2)
    inliers = (d < thr_norm_sq) & valid
    n_inl = jnp.sum(inliers)
    n_valid = jnp.sum(valid)

    return PoseResult(
        R=R,
        t=t,
        inliers=inliers,
        num_inliers=n_inl.astype(jnp.int32),
        inlier_ratio=n_inl / jnp.maximum(n_valid, 1).astype(uv1.dtype),
        ok=n_valid >= 8,
    )


# ---------------------------------------------------------------------------
# PnP (3D-2D) RANSAC
# ---------------------------------------------------------------------------


def _dlt_projection(X, x, w=None):
    """6+ point DLT for P (3, 4) from world points X (S, 3) and normalized
    image coords x (S, 2)."""
    S = X.shape[0]
    ones = jnp.ones((S, 1), X.dtype)
    Xh = jnp.concatenate([X, ones], axis=1)  # (S, 4)
    zeros = jnp.zeros_like(Xh)
    # two rows per point (standard DLT for P)
    r1 = jnp.concatenate([Xh, zeros, -x[:, 0:1] * Xh], axis=1)  # (S, 12)
    r2 = jnp.concatenate([zeros, Xh, -x[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2S, 12)
    if w is not None:
        A = A * jnp.concatenate([w, w])[:, None]
    AtA = jnp.matmul(A.T, A, precision=_HIGHEST)
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[:, 0].reshape(3, 4)


def _pose_from_projection(P):
    """Extract (R, t) from P = s[R|t]: nearest rotation via SVD, scale from
    the singular values, sign from det."""
    M = P[:, :3]
    U, s, Vt = jnp.linalg.svd(M)
    detUV = jnp.linalg.det(jnp.matmul(U, Vt, precision=_HIGHEST))
    R = jnp.matmul(U * jnp.array([1.0, 1.0, 1.0], P.dtype) * jnp.sign(detUV), Vt,
                   precision=_HIGHEST)
    scale = jnp.sign(detUV) * 3.0 / jnp.sum(s).clip(1e-12)
    t = P[:, 3] * scale
    return R, t


def _reproj_err_norm(R, t, X, x):
    """Squared reprojection error in normalized coords; behind-camera points
    get a huge error so they never count as inliers."""
    Xc = jnp.matmul(X, R.T, precision=_HIGHEST) + t
    z = Xc[:, 2]
    bad = z <= 1e-6
    proj = Xc[:, :2] / jnp.where(bad, 1.0, z)[:, None]
    err = jnp.sum((proj - x) ** 2, axis=1)
    return jnp.where(bad, 1e12, err)


@functools.partial(jax.jit, static_argnames=("num_hyp", "polish_iters"))
def estimate_pnp_pose(
    key,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    reproj_threshold_px: float = 8.0,
    num_hyp: int = 128,
    polish_iters: int = 5,
) -> PoseResult:
    """PnP RANSAC: world->camera pose from 3D-2D correspondences.

    Mirrors cv2.solvePnPRansac(SOLVEPNP_ITERATIVE, reprojectionError=8.0,
    iterationsCount=100) (ref: src/pose_estimator.py:72-81): DLT hypotheses
    from 6-point minimal sets, reprojection-inlier scoring, Gauss-Newton
    polish of the winner on its inliers.  Returns extrinsic (R, t) with
    x_cam = R X_world + t.
    """
    Kf = K.astype(uv.dtype)
    x = pixel_to_normalized(Kf, uv)
    f = (Kf[0, 0] + Kf[1, 1]) * 0.5
    thr_norm_sq = (reproj_threshold_px / f) ** 2

    idx = _sample_indices(key, valid, num_hyp, 6)

    def solve(i):
        P = _dlt_projection(X[i], x[i])
        return _pose_from_projection(P)

    Rs, ts = jax.vmap(solve)(idx)

    def score(R, t):
        err = _reproj_err_norm(R, t, X, x)
        return jnp.sum((err < thr_norm_sq) & valid)

    counts = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(counts)
    R0, t0 = Rs[best], ts[best]

    inl0 = (_reproj_err_norm(R0, t0, X, x) < thr_norm_sq) & valid

    # Gauss-Newton polish on (delta_w, delta_t) about the winner, inlier-weighted
    def gn_step(carry, _):
        R, t = carry
        w_mask = ((_reproj_err_norm(R, t, X, x) < thr_norm_sq) & valid).astype(x.dtype)

        def residual(params):
            dw, dt = params[:3], params[3:]
            Rp = jnp.matmul(so3_exp(dw), R, precision=_HIGHEST)
            Xc = jnp.matmul(X, Rp.T, precision=_HIGHEST) + (t + dt)
            z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-6, 1e-6, Xc[:, 2])
            proj = Xc[:, :2] / z[:, None]
            return ((proj - x) * w_mask[:, None]).reshape(-1)

        p0 = jnp.zeros(6, x.dtype)
        r = residual(p0)
        J = jax.jacfwd(residual)(p0)  # (2N, 6)
        JtJ = jnp.matmul(J.T, J, precision=_HIGHEST) + 1e-6 * jnp.eye(6, dtype=x.dtype)
        g = jnp.matmul(J.T, r, precision=_HIGHEST)
        delta = -jnp.linalg.solve(JtJ, g)
        R_new = jnp.matmul(so3_exp(delta[:3]), R, precision=_HIGHEST)
        t_new = t + delta[3:]
        # accept only if the inlier-weighted cost decreases
        def cost(R_, t_):
            e = _reproj_err_norm(R_, t_, X, x)
            return jnp.sum(jnp.minimum(e, thr_norm_sq) * valid)

        better = cost(R_new, t_new) < cost(R, t)
        return (
            jnp.where(better, R_new, R),
            jnp.where(better, t_new, t),
        ), None

    (R, t), _ = jax.lax.scan(gn_step, (R0, t0), None, length=polish_iters)

    err = _reproj_err_norm(R, t, X, x)
    inliers = (err < thr_norm_sq) & valid
    n_inl = jnp.sum(inliers)
    n_valid = jnp.sum(valid)
    return PoseResult(
        R=R,
        t=t,
        inliers=inliers,
        num_inliers=n_inl.astype(jnp.int32),
        inlier_ratio=n_inl / jnp.maximum(n_valid, 1).astype(uv.dtype),
        ok=n_valid >= 6,  # >= 4 in the reference gate; DLT needs 6
    )
