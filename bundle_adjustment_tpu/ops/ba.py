"""Windowed bundle adjustment: Schur-complement Levenberg-Marquardt, fully
jitted with static shapes.

TPU-native replacement for the reference's scipy sparse TRF solver
(ref: src/bundle_adjuster.py:122-193 — least_squares with lil_matrix
jac_sparsity, loss='huber', xtol=ftol=1e-5, max_nfev=50, finite-difference
Jacobian, one cv2.projectPoints call per observation per evaluation).

Design (SURVEY §7 phases 5-6):
- The observation table (cam_idx, pnt_idx, uv, mask) IS the sparsity pattern —
  no lil_matrix; the block structure is known analytically (SURVEY §2.3).
- Per-observation 2x9 Jacobians by forward-mode autodiff of the projection
  (replacing finite differences entirely).
- Robust Huber IRLS weights per residual component (scipy loss='huber'
  semantics: weight = 1 if |r| <= delta else delta/|r|).
- Normal equations assembled by segment_sum into per-camera 6x6 U-blocks and
  per-point 3x3 V-blocks; the point block-diagonal is eliminated in closed
  form (batched 3x3 adjugate inverses) and the reduced camera system
  S = U - W V^-1 W^T is built by scattering per-observation 6x3 coupling
  blocks into a (P, C, 6, 3) tensor and contracting on the MXU — the
  "blocked Schur" of BASELINE.json's north star.
- Classic LM trust-region-like damping with accept/reject, ftol/xtol stopping,
  and the reference's divergence-discard semantics handled by the caller
  (cost is returned; see models/pipeline).

The gauge anchor (oldest window KF) is fixed by excluding its camera
parameters (ref: src/bundle_adjuster.py:141-142); its observations still
constrain the points.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundle_adjustment_tpu.ops.lie import so3_exp
from bundle_adjustment_tpu.ops.projection import project

_HIGHEST = jax.lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    """Static-shape windowed BA problem.

    C cameras (first ``n_fixed`` are gauge-fixed), P points, O observations —
    all padded; ``obs_mask`` zeroes padding and culled observations
    (the hook SURVEY §5 notes for map-point culling)."""

    rvecs: jnp.ndarray     # (C, 3) so(3) rotation vectors
    tvecs: jnp.ndarray     # (C, 3)
    points: jnp.ndarray    # (P, 3)
    cam_idx: jnp.ndarray   # (O,) i32 in [0, C)
    pnt_idx: jnp.ndarray   # (O,) i32 in [0, P)
    uv: jnp.ndarray        # (O, 2) observed pixels
    obs_mask: jnp.ndarray  # (O,) f32 or bool
    point_mask: jnp.ndarray  # (P,) bool — padding points excluded from solve
    K: jnp.ndarray         # (3, 3)


class BAStats(NamedTuple):
    initial_cost: jnp.ndarray    # robust (Huber) cost, scipy convention 0.5*sum(rho)
    final_cost: jnp.ndarray
    initial_sq: jnp.ndarray      # raw sum of squared residuals (reference's log metric)
    final_sq: jnp.ndarray
    iterations: jnp.ndarray
    accepted: jnp.ndarray        # whether the solve improved the robust cost


def _residuals(rvecs, tvecs, points, p: BAProblem):
    """(O, 2) reprojection residuals, masked.  so3_exp runs once per CAMERA
    (C of them), not per observation — the rotations are then gathered."""
    Rs = jax.vmap(so3_exp)(rvecs)                          # (C, 3, 3)
    X = points[p.pnt_idx]                                  # (O, 3)
    Rg = Rs[p.cam_idx]                                     # (O, 3, 3)
    Xc = jnp.einsum("oij,oj->oi", Rg, X, precision=_HIGHEST) + tvecs[p.cam_idx]
    z = Xc[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = p.K[0, 0] * Xc[:, 0] / z_safe + p.K[0, 2]
    v = p.K[1, 1] * Xc[:, 1] / z_safe + p.K[1, 2]
    r = jnp.stack([u, v], axis=1) - p.uv
    return r * p.obs_mask[:, None]


def _huber_weights(r, delta):
    """Per-component IRLS weights for scipy's loss='huber' (f_scale=delta)."""
    a = jnp.abs(r)
    return jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12))


def robust_cost(r, delta):
    """0.5 * sum(rho(r)) with Huber rho — scipy least_squares' objective."""
    a = jnp.abs(r)
    quad = r * r
    lin = 2.0 * delta * a - delta * delta
    return 0.5 * jnp.sum(jnp.where(a <= delta, quad, lin))


def _obs_jacobians(rvecs, tvecs, points, p: BAProblem):
    """Per-observation Jacobians: Jc (O, 2, 6) wrt (rvec, tvec), Jp (O, 2, 3)
    wrt point — analytic, with the expensive d(so3_exp)/d(rvec) computed once
    per CAMERA (forward-mode over C inputs) and chained per observation via
    dense einsums.  ~3x cheaper per LM iteration than per-obs autodiff."""
    Rs = jax.vmap(so3_exp)(rvecs)                          # (C, 3, 3)
    dRdr = jax.vmap(jax.jacfwd(so3_exp))(rvecs)            # (C, 3, 3, 3)

    X = points[p.pnt_idx]
    Rg = Rs[p.cam_idx]
    Xc = jnp.einsum("oij,oj->oi", Rg, X, precision=_HIGHEST) + tvecs[p.cam_idx]
    z = Xc[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / z_safe
    fx, fy = p.K[0, 0], p.K[1, 1]
    zeros = jnp.zeros_like(inv_z)
    # d uv / d Xc  (O, 2, 3) for the pinhole projection
    duv_dXc = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * Xc[:, 0] * inv_z * inv_z], axis=1),
            jnp.stack([zeros, fy * inv_z, -fy * Xc[:, 1] * inv_z * inv_z], axis=1),
        ],
        axis=1,
    )
    J_t = duv_dXc                                              # (O, 2, 3)
    J_X = jnp.einsum("oki,oij->okj", duv_dXc, Rg, precision=_HIGHEST)
    dXc_dr = jnp.einsum("oijr,oj->oir", dRdr[p.cam_idx], X, precision=_HIGHEST)
    J_r = jnp.einsum("oki,oir->okr", duv_dXc, dXc_dr, precision=_HIGHEST)
    Jc = jnp.concatenate([J_r, J_t], axis=2)                   # (O, 2, 6)
    return Jc, J_X


def _inv3(M):
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    Cc = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, B, Cc], axis=-1),
            jnp.stack([D, E, F], axis=-1),
            jnp.stack([G, H, I], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name else x


def _pcg_blocked(matvec, b, Minv, iters, tol):
    """Preconditioned conjugate gradient on the reduced camera system,
    matrix-free.  ``b``/state are (C_adj, 6) block vectors; ``Minv`` is the
    (C_adj, 6, 6) block-Jacobi preconditioner OR a callable r -> M^-1 r
    (grouped preconditioners, ops/ba_grid).  Runs to ``iters`` or a
    relative-residual ``tol``, whichever first (while_loop — no wasted
    iterations once converged)."""
    if callable(Minv):
        apply_precond = Minv
    else:
        def apply_precond(r):
            return jnp.einsum("cij,cj->ci", Minv, r, precision=_HIGHEST)
    bnorm = jnp.sqrt(jnp.sum(b * b))
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_precond(r0)
    rz0 = jnp.sum(r0 * z0)

    def cond(s):
        _, r, _, _, it, done = s
        return (~done) & (it < iters)

    def body(s):
        x, r, p, rz, it, done = s
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        done = jnp.sqrt(jnp.sum(r * r)) <= tol * jnp.maximum(bnorm, 1e-30)
        return (x, r, p, rz_new, it + 1, done)

    x, _, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, z0, rz0, 0, bnorm <= 0.0))
    return x


def _solve_normal_equations(rvecs, tvecs, points, p: BAProblem, lam, delta, n_fixed,
                            axis_name=None, cg_iters: int = 0, cg_tol: float = 1e-6):
    """One damped Schur step: returns (d_rvecs, d_tvecs, d_points).

    With ``axis_name`` set (inside shard_map), the problem's points and
    observations are shard-local while cameras are replicated: the per-point
    V elimination stays local and only the small reduced camera system
    (S, g_c, Wz — a few KB) crosses ICI via psum — the distributed Schur
    reduction of SURVEY §2.5/BASELINE's north star.

    ``cg_iters`` = 0 solves the reduced camera system densely (builds the
    (P, C_adj, 6, 3) coupling tensor and a (6C')² matrix — right for windows,
    O((6C')³) for global BA).  ``cg_iters`` > 0 switches to MATRIX-FREE
    block-Jacobi PCG: S·x is evaluated as U x − W V⁻¹ Wᵀ x through two
    gathers and two segment_sums per iteration, so neither S nor the coupling
    tensor is ever materialized — memory O(O·18) and time O(cg_iters·O)
    regardless of camera count.  This is the north-star "reduced camera
    system solved via PCG" (replacing scipy TRF at
    /root/reference/src/bundle_adjuster.py:170-174)."""
    C = rvecs.shape[0]
    P = points.shape[0]
    C_adj = C - n_fixed

    r = _residuals(rvecs, tvecs, points, p)               # (O, 2)
    w = _huber_weights(r, delta) * p.obs_mask[:, None]     # (O, 2)
    Jc, Jp = _obs_jacobians(rvecs, tvecs, points, p)       # (O,2,6), (O,2,3)

    cam_adj = p.cam_idx - n_fixed
    cam_ok = (cam_adj >= 0)[:, None, None]
    cam_adj_c = jnp.clip(cam_adj, 0, max(C_adj - 1, 0))
    Jc = jnp.where(cam_ok, Jc, 0.0)                        # fixed cams contribute no Jc

    Jc_w = Jc * w[:, :, None]                              # weighted rows
    Jp_w = Jp * w[:, :, None]

    # per-obs blocks
    U_o = jnp.einsum("oki,okj->oij", Jc_w, Jc, precision=_HIGHEST)   # (O, 6, 6)
    V_o = jnp.einsum("oki,okj->oij", Jp_w, Jp, precision=_HIGHEST)   # (O, 3, 3)
    Y_o = jnp.einsum("oki,okj->oij", Jc_w, Jp, precision=_HIGHEST)   # (O, 6, 3)
    gc_o = jnp.einsum("oki,ok->oi", Jc_w, r, precision=_HIGHEST)     # (O, 6)
    gp_o = jnp.einsum("oki,ok->oi", Jp_w, r, precision=_HIGHEST)     # (O, 3)

    U = _psum(jax.ops.segment_sum(U_o, cam_adj_c, num_segments=max(C_adj, 1)), axis_name)
    V = jax.ops.segment_sum(V_o, p.pnt_idx, num_segments=P)          # point-local
    g_c = _psum(jax.ops.segment_sum(gc_o, cam_adj_c, num_segments=max(C_adj, 1)), axis_name)
    g_p = jax.ops.segment_sum(gp_o, p.pnt_idx, num_segments=P)       # point-local

    # Marquardt damping on the block diagonals
    eyec = jnp.eye(6, dtype=U.dtype)
    eyep = jnp.eye(3, dtype=V.dtype)
    U = U + lam * (jnp.abs(jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(U))) + 1e-6 * eyec)
    V = V + lam * (jnp.abs(jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(V))) + 1e-6 * eyep)
    Vinv = _inv3(V)                                        # (P, 3, 3)
    # padded/unconstrained points: keep their delta at 0
    Vinv = jnp.where(p.point_mask[:, None, None], Vinv, 0.0)

    nC = max(C_adj, 1)
    n = nC * 6

    # rhs: b = -g_c + W V^-1 g_p (shared by both camera-system solvers)
    z_p = jnp.einsum("pij,pj->pi", Vinv, g_p, precision=_HIGHEST)    # (P, 3)
    Wz_o = jnp.einsum("oij,oj->oi", Y_o, z_p[p.pnt_idx], precision=_HIGHEST)
    Wz = _psum(jax.ops.segment_sum(Wz_o, cam_adj_c, num_segments=nC),
               axis_name)
    b_blocks = -g_c + Wz                                             # (nC, 6)

    if cg_iters > 0:
        # matrix-free PCG on S = U - W V^-1 W^T: each matvec is two gathers
        # + two segment_sums; neither S nor the (P, C', 6, 3) coupling tensor
        # exists.  Y_o rows of gauge-fixed cameras are already zero (Jc was
        # masked), so fixed cams contribute nothing.
        def matvec(x):
            y_o = jnp.einsum("oij,oi->oj", Y_o, x[cam_adj_c], precision=_HIGHEST)
            q = jax.ops.segment_sum(y_o, p.pnt_idx, num_segments=P)
            z = jnp.einsum("pij,pj->pi", Vinv, q, precision=_HIGHEST)
            w_o = jnp.einsum("oij,oj->oi", Y_o, z[p.pnt_idx], precision=_HIGHEST)
            WVWx = _psum(jax.ops.segment_sum(w_o, cam_adj_c, num_segments=nC),
                         axis_name)
            Ux = jnp.einsum("cij,cj->ci", U, x, precision=_HIGHEST)
            return Ux - WVWx

        # block-Jacobi preconditioner = exact 6x6 diagonal blocks of S
        # (exact because a (camera, point) pair has at most one observation:
        # B[p,c] V^-1 B[p,c]^T == Y_o V^-1 Y_o^T per observation)
        D_o = jnp.einsum("oij,ojk,olk->oil", Y_o, Vinv[p.pnt_idx], Y_o,
                         precision=_HIGHEST)
        D = _psum(jax.ops.segment_sum(D_o, cam_adj_c, num_segments=nC),
                  axis_name)
        Pc = U - D + 1e-8 * jnp.eye(6, dtype=U.dtype)
        Minv = jnp.linalg.inv(Pc)                                    # (nC, 6, 6)
        dc_blocks = _pcg_blocked(matvec, b_blocks, Minv, cg_iters, cg_tol)
    else:
        # dense: scatter coupling blocks into B[P, C_adj, 6, 3] and contract
        # for the Schur complement S = blockdiag(U) - W V^-1 W^T on the MXU
        B = jnp.zeros((P, nC, 6, 3), U.dtype)
        B = B.at[p.pnt_idx, cam_adj_c].add(Y_o * cam_ok.astype(U.dtype))
        BV = jnp.einsum("pcik,pkl->pcil", B, Vinv, precision=_HIGHEST)
        S_full = -_psum(
            jnp.einsum("pcil,pdjl->cidj", BV, B, precision=_HIGHEST), axis_name
        ).reshape(n, n)
        idx = jnp.arange(nC)
        Ublock = jnp.zeros((nC, 6, nC, 6), U.dtype)
        Ublock = Ublock.at[idx, :, idx, :].set(U)
        S_full = S_full + Ublock.reshape(n, n)

        dc = jnp.linalg.solve(S_full + 1e-8 * jnp.eye(n, dtype=S_full.dtype),
                              b_blocks.reshape(n))
        dc_blocks = dc.reshape(nC, 6)

    # back-substitute points: dp = V^-1 (-g_p - W^T dc)
    Wt_dc_o = jnp.einsum("oij,oi->oj", Y_o, dc_blocks[cam_adj_c], precision=_HIGHEST)
    Wt_dc = jax.ops.segment_sum(Wt_dc_o, p.pnt_idx, num_segments=P)
    dp = jnp.einsum("pij,pj->pi", Vinv, -g_p - Wt_dc, precision=_HIGHEST)

    d_r = jnp.zeros_like(rvecs).at[n_fixed:].set(dc_blocks[:C_adj, :3])
    d_t = jnp.zeros_like(tvecs).at[n_fixed:].set(dc_blocks[:C_adj, 3:])
    return d_r, d_t, dp


def ba_solve_impl(
    problem: BAProblem,
    n_fixed: int = 1,
    max_iterations: int = 50,
    huber_delta: float = 1.0,
    lambda_init: float = 1e-3,
    lambda_up: float = 4.0,
    lambda_down: float = 0.5,
    lambda_min: float = 1e-10,
    lambda_max: float = 1e8,
    ftol: float = 1e-5,
    xtol: float = 1e-5,
    axis_name: str | None = None,
    cg_iters: int = 0,
    cg_tol: float = 1e-6,
):
    """Levenberg-Marquardt with Schur elimination.  Returns
    (rvecs, tvecs, points, BAStats).  Caller applies the reference's
    divergence-discard rule using the stats.

    ``axis_name``: set when called inside shard_map with points/observations
    sharded along that mesh axis (see parallel/dist_ba.py); every psum'd
    quantity (costs, camera system) is then globally consistent, so all
    shards take identical LM accept/reject decisions.

    ``cg_iters`` > 0 solves the reduced camera system with matrix-free
    block-Jacobi PCG instead of a dense solve — required for global BA over
    long keyframe chains (see _solve_normal_equations)."""
    p = problem._replace(obs_mask=problem.obs_mask.astype(problem.uv.dtype))

    def cost_at(rv, tv, pt):
        return _psum(robust_cost(_residuals(rv, tv, pt, p), huber_delta), axis_name)

    def sq_at(rv, tv, pt):
        r = _residuals(rv, tv, pt, p)
        return _psum(jnp.sum(r * r), axis_name)

    init_cost = cost_at(p.rvecs, p.tvecs, p.points)
    init_sq = sq_at(p.rvecs, p.tvecs, p.points)

    # state: (rvecs, tvecs, points, lambda, cost, iteration, done)
    def cond(s):
        return (~s[6]) & (s[5] < max_iterations)

    def body(s):
        rv, tv, pt, lam, cost, it, done = s
        d_r, d_t, d_p = _solve_normal_equations(
            rv, tv, pt, p, lam, huber_delta, n_fixed, axis_name,
            cg_iters=cg_iters, cg_tol=cg_tol,
        )
        rv2, tv2, pt2 = rv + d_r, tv + d_t, pt + d_p
        new_cost = cost_at(rv2, tv2, pt2)
        accept = new_cost < cost

        # cameras are replicated under sharding; only the point terms need
        # the cross-shard sum
        step_norm = jnp.sqrt(
            jnp.sum(d_r * d_r) + jnp.sum(d_t * d_t)
            + _psum(jnp.sum(d_p * d_p), axis_name)
        )
        param_norm = jnp.sqrt(
            jnp.sum(rv * rv) + jnp.sum(tv * tv)
            + _psum(jnp.sum(pt * pt), axis_name)
        )
        converged = accept & (
            ((cost - new_cost) <= ftol * jnp.maximum(cost, 1e-12))
            | (step_norm <= xtol * (param_norm + xtol))
        )

        rv = jnp.where(accept, rv2, rv)
        tv = jnp.where(accept, tv2, tv)
        pt = jnp.where(accept, pt2, pt)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * lambda_down, lambda_min),
                        jnp.minimum(lam * lambda_up, lambda_max))
        # a rejected step at lambda_max cannot make progress — stop
        stuck = (~accept) & (lam >= lambda_max)
        return (rv, tv, pt, lam, cost, it + 1, converged | stuck)

    lam0 = jnp.asarray(lambda_init, p.uv.dtype)
    rv, tv, pt, lam, cost, it, _ = jax.lax.while_loop(
        cond, body, (p.rvecs, p.tvecs, p.points, lam0, init_cost, 0, False)
    )

    stats = BAStats(
        initial_cost=init_cost,
        final_cost=cost,
        initial_sq=init_sq,
        final_sq=sq_at(rv, tv, pt),
        iterations=it,
        accepted=cost < init_cost,
    )
    return rv, tv, pt, stats


ba_solve = jax.jit(
    ba_solve_impl,
    static_argnames=("n_fixed", "axis_name", "cg_iters"),
)
