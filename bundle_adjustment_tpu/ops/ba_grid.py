"""Dense observation-grid bundle adjustment: the scatter-free fast path.

The flat observation-table solver (ops/ba.py) spends its per-iteration time
on op-count overhead, not FLOPs: segment_sums and a scatter dominate the
~100 small XLA ops per LM iteration.  This solver re-lays the problem out as
a dense (P, D) grid — each map point owns up to D observation slots (one per
observing camera; within one window D <= C since a point is seen at most
once per camera) — so every reduction is a plain masked einsum:

    U   = einsum('pdc,pdki,pdkj->cij', onehot_cam, Jc_w, Jc)
    V   = einsum('pdki,pdkj->pij',      Jp_w, Jp)          # no segments!
    B   = einsum('pdc,pdij->pcij',      onehot_cam, Y)      # no scatter!

Everything else (3x3 adjugate elimination, MXU Schur contraction, LM
accept/reject with the reference's semantics) matches ops/ba.py, and the
two solvers are asserted equivalent in tests/test_ba_grid.py.

This IS the natural TPU layout for the problem — the "BA block layout" that
SURVEY §2.3 says the lil_matrix pattern becomes.  The flat path remains for
the sharded/distributed solver (points partition cleanly there).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.ops import ba as ba_flat
from bundle_adjustment_tpu.ops.lie import so3_exp

_HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Batched tiny-matrix algebra as VPU elementwise ops.
#
# einsum/dot_general on (P*D)-batched 6x3-class matrices lowers to batched
# MXU dot_generals whose tiles are ~95% padding; measured on TPU v5e at
# global scale (C=200, P=30k, D=4) the einsum formulation costs 6.2 ms
# (setup) + 4.4 ms (preconditioner) per LM iteration.  Expressing the same
# contractions as broadcast-multiply + axis-sum keeps them on the VPU where
# XLA fuses the whole chain into a few passes over the (P, D) grid.
# ---------------------------------------------------------------------------

def _mv(A, x):
    """(..., i, j) @ (..., j) -> (..., i) as multiply + sum."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def _mm(a, b):
    """(..., i, k) @ (..., k, j) -> (..., i, j) as multiply + sum."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def _jtj(a, b, w):
    """sum_k w[..., k] * a[..., k, i] * b[..., k, j] -> (..., i, j)."""
    aw = a * w[..., None]
    return jnp.sum(aw[..., :, :, None] * b[..., :, None, :], axis=-3)


def _inv6(M):
    """Batched 6x6 inverse via 3x3-block Schur elimination (adjugate 3x3
    inverses, ba._inv3).  M is the damped block-Jacobi diagonal of the Schur
    complement — SPD by construction — so the A block is invertible."""
    A = M[..., :3, :3]
    B = M[..., :3, 3:]
    Cb = M[..., 3:, :3]
    D = M[..., 3:, 3:]
    Ainv = ba_flat._inv3(A)
    AinvB = _mm(Ainv, B)
    Sinv = ba_flat._inv3(D - _mm(Cb, AinvB))
    CAinv = _mm(Cb, Ainv)
    SinvCAinv = _mm(Sinv, CAinv)
    tl = Ainv + _mm(AinvB, SinvCAinv)
    tr = -_mm(AinvB, Sinv)
    bl = -SinvCAinv
    top = jnp.concatenate([tl, tr], axis=-1)
    bot = jnp.concatenate([bl, Sinv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


class BAProblemGrid(NamedTuple):
    rvecs: jnp.ndarray      # (C, 3)
    tvecs: jnp.ndarray      # (C, 3)
    points: jnp.ndarray     # (P, 3)
    cam_slot: jnp.ndarray   # (P, D) i32 in [0, C) — observing camera per slot
    uv: jnp.ndarray         # (P, D, 2)
    mask: jnp.ndarray       # (P, D) f32 — 0 for empty slots
    point_mask: jnp.ndarray # (P,) bool
    K: jnp.ndarray          # (3, 3)


def from_flat(problem: ba_flat.BAProblem, max_slots: int | None = None,
              on_drop=None) -> BAProblemGrid:
    """Host-side conversion from the flat observation table.  Each point's
    observations fill its D slots; max_slots defaults to the max observation
    count of any point, so by default NOTHING is dropped.  When max_slots
    caps D below that, excess observations are dropped and ``on_drop(n)`` is
    invoked with the count (no silent caps — callers route it to the event
    log)."""
    pnt = np.asarray(problem.pnt_idx)
    cam = np.asarray(problem.cam_idx)
    uv = np.asarray(problem.uv)
    m = np.asarray(problem.obs_mask) > 0
    P = problem.points.shape[0]

    counts = np.zeros(P, np.int64)
    np.add.at(counts, pnt[m], 1)
    D = int(max(counts.max(initial=1), 1))
    if max_slots is not None:
        D = min(D, max_slots)

    cam_slot = np.zeros((P, D), np.int32)
    uv_g = np.zeros((P, D, 2), np.float32)
    mask = np.zeros((P, D), np.float32)
    # vectorized slot assignment: stable-sort live obs by point, slot index =
    # position within the point's run
    live = np.flatnonzero(m)
    order = np.argsort(pnt[live], kind="stable")
    rows = live[order]
    p_sorted = pnt[rows]
    # start offset of each run, repeated per element
    run_start = np.r_[0, np.flatnonzero(np.diff(p_sorted)) + 1]
    starts_rep = np.repeat(run_start, np.diff(np.r_[run_start, len(p_sorted)]))
    slots = np.arange(len(p_sorted)) - starts_rep
    keep = slots < D
    n_dropped = int((~keep).sum())
    if n_dropped and on_drop is not None:
        on_drop(n_dropped)
    cam_slot[p_sorted[keep], slots[keep]] = cam[rows[keep]]
    uv_g[p_sorted[keep], slots[keep]] = uv[rows[keep]]
    mask[p_sorted[keep], slots[keep]] = 1.0

    return BAProblemGrid(
        rvecs=problem.rvecs,
        tvecs=problem.tvecs,
        points=problem.points,
        cam_slot=jnp.asarray(cam_slot),
        uv=jnp.asarray(uv_g),
        mask=jnp.asarray(mask),
        point_mask=problem.point_mask,
        K=problem.K,
    )


def _grid_terms(rvecs, tvecs, points, p: BAProblemGrid):
    """Residuals r (P,D,2), Huber weights applied, and Jacobians
    Jc (P,D,2,6), Jp (P,D,2,3), with so3_exp/dR per CAMERA only."""
    Rs = jax.vmap(so3_exp)(rvecs)                    # (C, 3, 3)
    dRdr = jax.vmap(jax.jacfwd(so3_exp))(rvecs)      # (C, 3, 3, 3)

    Rg = Rs[p.cam_slot]                              # (P, D, 3, 3)
    tg = tvecs[p.cam_slot]                           # (P, D, 3)
    X = points[:, None, :]                           # (P, 1, 3)
    Xc = _mv(Rg, jnp.broadcast_to(X, Rg.shape[:2] + (3,))) + tg
    z = Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / z_safe
    fx, fy = p.K[0, 0], p.K[1, 1]
    u = fx * Xc[..., 0] * inv_z + p.K[0, 2]
    v = fy * Xc[..., 1] * inv_z + p.K[1, 2]
    r = (jnp.stack([u, v], axis=-1) - p.uv) * p.mask[..., None]

    zeros = jnp.zeros_like(inv_z)
    duv_dXc = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * Xc[..., 0] * inv_z * inv_z], axis=-1),
            jnp.stack([zeros, fy * inv_z, -fy * Xc[..., 1] * inv_z * inv_z], axis=-1),
        ],
        axis=-2,
    )                                                 # (P, D, 2, 3)
    J_t = duv_dXc
    # "pdki,pdij->pdkj": sum_i duv[..., k, i] Rg[..., i, j]
    J_X = jnp.sum(duv_dXc[..., :, :, None] * Rg[..., None, :, :], axis=-2)
    # "pdijr,pj->pdir": sum_j dRdr[..., i, j, r] X[p, j]
    dXc_dr = jnp.sum(dRdr[p.cam_slot] * points[:, None, None, :, None],
                     axis=-2)                         # (P, D, 3, 3)
    # "pdki,pdir->pdkr": sum_i duv[..., k, i] dXc_dr[..., i, r]
    J_r = jnp.sum(duv_dXc[..., :, :, None] * dXc_dr[..., None, :, :], axis=-2)
    Jc = jnp.concatenate([J_r, J_t], axis=-1)         # (P, D, 2, 6)
    return r, Jc, J_X


def _solve_step(rvecs, tvecs, points, p: BAProblemGrid, lam, delta, n_fixed,
                onehot):
    C = rvecs.shape[0]
    C_adj = max(C - n_fixed, 1)

    r, Jc, Jp = _grid_terms(rvecs, tvecs, points, p)
    a = jnp.abs(r)
    w = jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12)) \
        * p.mask[..., None]

    cam_ok = (p.cam_slot >= n_fixed).astype(r.dtype)[..., None, None]
    Jc = Jc * cam_ok
    Jc_w = Jc * w[..., None]
    Jp_w = Jp * w[..., None]

    # onehot: (P, D, C_adj) — fixed cams map to an all-zero row
    U = jnp.einsum("pdc,pdki,pdkj->cij", onehot, Jc_w, Jc, precision=_HIGHEST)
    g_c = jnp.einsum("pdc,pdki,pdk->ci", onehot, Jc_w, r, precision=_HIGHEST)
    V = jnp.einsum("pdki,pdkj->pij", Jp_w, Jp, precision=_HIGHEST)
    g_p = jnp.einsum("pdki,pdk->pi", Jp_w, r, precision=_HIGHEST)
    Y = jnp.einsum("pdki,pdkj->pdij", Jc_w, Jp, precision=_HIGHEST)  # (P,D,6,3)
    B = jnp.einsum("pdc,pdij->pcij", onehot, Y, precision=_HIGHEST)  # (P,C',6,3)

    eyec = jnp.eye(6, dtype=U.dtype)
    eyep = jnp.eye(3, dtype=V.dtype)
    U = U + lam * (jnp.abs(jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(U))) + 1e-6 * eyec)
    V = V + lam * (jnp.abs(jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(V))) + 1e-6 * eyep)
    Vinv = ba_flat._inv3(V)
    Vinv = jnp.where(p.point_mask[:, None, None], Vinv, 0.0)

    n = C_adj * 6
    BV = jnp.einsum("pcik,pkl->pcil", B, Vinv, precision=_HIGHEST)
    S = -jnp.einsum("pcil,pdjl->cidj", BV, B, precision=_HIGHEST).reshape(n, n)
    idx = jnp.arange(C_adj)
    Ublock = jnp.zeros((C_adj, 6, C_adj, 6), U.dtype)
    Ublock = Ublock.at[idx, :, idx, :].set(U)
    S = S + Ublock.reshape(n, n)

    z_p = jnp.einsum("pij,pj->pi", Vinv, g_p, precision=_HIGHEST)
    Wz = jnp.einsum("pcij,pj->ci", B, z_p, precision=_HIGHEST)
    b = (-g_c + Wz).reshape(n)

    dc = jnp.linalg.solve(S + 1e-8 * jnp.eye(n, dtype=S.dtype), b)
    dc_blocks = dc.reshape(C_adj, 6)

    Wt_dc = jnp.einsum("pcij,ci->pj", B, dc_blocks, precision=_HIGHEST)
    dp = jnp.einsum("pij,pj->pi", Vinv, -g_p - Wt_dc, precision=_HIGHEST)

    d_r = jnp.zeros_like(rvecs).at[n_fixed:].set(dc_blocks[: C - n_fixed, :3])
    d_t = jnp.zeros_like(tvecs).at[n_fixed:].set(dc_blocks[: C - n_fixed, 3:])
    return d_r, d_t, dp


def _group_precond_rows(Y, YV, cam_slot, n_fixed, g):
    """Per-observation rows of the GROUPED block-Jacobi preconditioner.

    Cameras (adjusted index a = cam - n_fixed) partition into groups of
    ``g`` consecutive cameras; the preconditioner is the EXACT principal
    submatrix of the Schur complement S for each group — every
    within-group coupling block S_{c1,c2} = -sum_p Y(c1,p) V^-1 Y(c2,p)^T
    is captured, whatever its offset (no band assumption, so the blocks
    stay principal submatrices of SPD S and the preconditioner stays SPD
    under loop-closure/covisibility fill-in).

    Returns (P, D, g*36) rows: row (p, d1) holds, for each group-local
    position l, the 6x6 block sum over slots d2 of the same point whose
    camera shares d1's group and sits at local position l — reduced by
    camera via the SAME one-hot matmul as the rest of the setup (the
    diagonal l == local(d1) term doubles as the plain block-Jacobi Dred).
    """
    P, D = cam_slot.shape
    a = cam_slot - n_fixed                                   # (P, D)
    grp = jnp.where(a >= 0, a // g, -1)
    loc = a % g
    same = (grp[:, :, None] == grp[:, None, :]) & (a[:, :, None] >= 0) \
        & (a[:, None, :] >= 0)                               # (P, D, D)
    dt = Y.dtype
    rows = jnp.zeros((P, D, g, 36), dt)
    for d2 in range(D):
        # q[p, d1] = YV[p, d1] @ Y[p, d2]^T  (6x6), fused multiply-sum
        q = jnp.sum(YV[..., :, None, :] * Y[:, d2, None, None, :, :],
                    axis=-1)                                 # (P, D, 6, 6)
        oh = (loc[:, d2, None] == jnp.arange(g)[None, :])[:, None, :] \
            & same[:, :, d2, None]                           # (P, D, g)
        rows = rows + q.reshape(P, D, 1, 36) * oh[..., None].astype(dt)
    return rows.reshape(P, D, g * 36)


def _solve_step_pcg(rvecs, tvecs, points, p: BAProblemGrid, lam, delta,
                    n_fixed, onehot_T, cg_iters, cg_tol, pc_group=1):
    """One damped Schur step on the grid layout with a MATRIX-FREE PCG camera
    solve — the global-scale path (C in the hundreds) where the dense step's
    (P, C', 6, 3) coupling tensor and (6C')² system stop scaling.

    Scatter-free by construction: every point-side reduction is an axis sum
    over the D slot dimension, and the single camera-side reduction per PCG
    matvec is ONE MXU matmul against ``onehot_T`` (C_adj, P*D) — TPU scatters
    (segment_sum) are what made the flat PCG path ~75 ms/LM-iteration slower
    at this scale.  ``cg_tol`` may be a traced scalar (Eisenstat-Walker
    forcing feeds a per-LM-iteration tolerance).

    The setup's FOUR camera reductions (U diag blocks, gradient, rhs
    coupling, preconditioner blocks) ride ONE matmul: each pass over
    onehot_T reads C_adj*P*D floats of one-hot — the dominant HBM traffic
    at this scale — so k-columns are batched, not repeated.  ``onehot_T``
    may be bf16 (0/1 is exact in bf16): the reduction then runs the MXU
    bf16 path with f32 accumulation, halving the one-hot read; enabled by
    the caller above ~512 cameras where the f32 one-hot outgrows VMEM-
    friendly tiling (see ba_solve_grid_impl cg_bf16)."""
    C = rvecs.shape[0]
    C_adj = max(C - n_fixed, 1)
    P, D = p.cam_slot.shape
    bf16_reduce = onehot_T.dtype == jnp.bfloat16

    r, Jc, Jp = _grid_terms(rvecs, tvecs, points, p)
    a = jnp.abs(r)
    w = jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12)) \
        * p.mask[..., None]

    cam_ok = (p.cam_slot >= n_fixed).astype(r.dtype)[..., None, None]
    Jc = Jc * cam_ok
    Jc_w = Jc * w[..., None]
    Jp_w = Jp * w[..., None]

    def cam_reduce(rows):
        """(P, D, ...) observation rows -> (C_adj, ...) via one MXU matmul."""
        flat = rows.reshape(P * D, -1)
        if bf16_reduce:
            out = jnp.dot(onehot_T, flat.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        else:
            out = onehot_T @ flat
        return out.reshape((C_adj,) + rows.shape[2:])

    V = jnp.sum(_jtj(Jp, Jp, w), axis=1)                        # (P, 3, 3)
    g_p = jnp.sum(Jp_w * r[..., None], axis=(1, 2))             # (P, 3)
    Y = _jtj(Jc, Jp, w)                                         # (P, D, 6, 3)

    eyep = jnp.eye(3, dtype=V.dtype)
    V = V + lam * (jnp.abs(jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(V))) + 1e-6 * eyep)
    Vinv = ba_flat._inv3(V)
    Vinv = jnp.where(p.point_mask[:, None, None], Vinv, 0.0)
    z_p = _mv(Vinv, g_p)
    YV = _mm(Y, Vinv[:, None])                                  # (P, D, 6, 3)
    if pc_group > 1:
        pc_rows = _group_precond_rows(Y, YV, p.cam_slot, n_fixed, pc_group)
    else:
        D_o = jnp.sum(YV[..., :, None, :] * Y[..., None, :, :], axis=-1)
        pc_rows = D_o.reshape(P, D, 36)

    # ONE batched camera reduction for the whole setup:
    #   [U blocks (36) | gradient (6) | rhs coupling Wz (6) | precond blocks]
    setup_rows = jnp.concatenate([
        _jtj(Jc, Jc, w).reshape(P, D, 36),
        jnp.sum(Jc_w * r[..., None], axis=-2),
        jnp.sum(Y * z_p[:, None, None, :], axis=-1),
        pc_rows,
    ], axis=-1)                                  # (P, D, 48 + 36*pc_group)
    red = cam_reduce(setup_rows)
    U = red[:, :36].reshape(C_adj, 6, 6)
    g_c = red[:, 36:42]
    Wz = red[:, 42:48]

    eyec = jnp.eye(6, dtype=U.dtype)
    damp = lam * (jnp.abs(jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(U))) + 1e-6 * eyec)
    U = U + damp

    # rhs b = -g_c + W V^-1 g_p
    b = -g_c + Wz                                               # (C', 6)

    pad = jnp.zeros((n_fixed, 6), U.dtype)

    def matvec(x):
        xs = jnp.concatenate([pad, x], axis=0)[p.cam_slot]      # (P, D, 6)
        y = jnp.sum(Y * xs[..., None], axis=-2)                 # (P, D, 3)
        q = jnp.sum(y, axis=1)                                  # (P, 3)
        z = _mv(Vinv, q)
        w2 = jnp.sum(Y * z[:, None, None, :], axis=-1)          # (P, D, 6)
        WVWx = cam_reduce(w2)
        Ux = _mv(U, x)
        return Ux - WVWx

    if pc_group > 1:
        # grouped block-Jacobi: exact (6g x 6g) group-diagonal blocks of S,
        # inverted batched once per LM iteration; the apply per CG
        # iteration is one batched (nG, 6g) @ (nG, 6g, 6g) contraction
        g = pc_group
        nG = -(-C_adj // g)
        pad_n = nG * g - C_adj
        grp = red[:, 48:].reshape(C_adj, g, 6, 6)
        eye6 = jnp.eye(6, dtype=U.dtype)
        if pad_n:
            Ud = jnp.concatenate(
                [U, jnp.broadcast_to(eye6, (pad_n, 6, 6))], axis=0)
            grp = jnp.concatenate(
                [grp, jnp.zeros((pad_n, g, 6, 6), grp.dtype)], axis=0)
        else:
            Ud = U
        Mg = -grp.reshape(nG, g, g, 6, 6)
        di = jnp.arange(g)
        Mg = Mg.at[:, di, di].add(Ud.reshape(nG, g, 6, 6))
        M = Mg.transpose(0, 1, 3, 2, 4).reshape(nG, 6 * g, 6 * g)
        Minv_g = jnp.linalg.inv(M + 1e-8 * jnp.eye(6 * g, dtype=M.dtype))

        def Minv(rr):
            if pad_n:
                rr = jnp.concatenate(
                    [rr, jnp.zeros((pad_n, 6), rr.dtype)], axis=0)
            z = _mv(Minv_g, rr.reshape(nG, 6 * g))
            return z.reshape(nG * g, 6)[:C_adj]
    else:
        # block-Jacobi preconditioner: exact 6x6 diagonal blocks of S (exact
        # because one (camera, point) pair has at most one observation slot)
        Dred = red[:, 48:].reshape(C_adj, 6, 6)
        Minv = _inv6(U - Dred + 1e-8 * jnp.eye(6, dtype=U.dtype))

    dc_blocks = ba_flat._pcg_blocked(matvec, b, Minv, cg_iters, cg_tol)

    # back-substitute points: dp = V^-1 (-g_p - W^T dc)
    dcs = jnp.concatenate([pad, dc_blocks], axis=0)[p.cam_slot]  # (P, D, 6)
    Wt = jnp.sum(jnp.sum(Y * dcs[..., None], axis=-2), axis=1)   # (P, 3)
    dp = _mv(Vinv, -g_p - Wt)

    d_r = jnp.zeros_like(rvecs).at[n_fixed:].set(dc_blocks[: C - n_fixed, :3])
    d_t = jnp.zeros_like(tvecs).at[n_fixed:].set(dc_blocks[: C - n_fixed, 3:])
    return d_r, d_t, dp, jnp.sqrt(jnp.sum(b * b))


def ba_solve_grid_impl(
    problem: BAProblemGrid,
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
    cg_iters: int = 0,
    cg_tol: float = 1e-6,
    cg_forcing: bool = True,
    cg_bf16: bool = False,
    cg_precond_group: int = 1,
):
    """LM loop identical in semantics to ops/ba.ba_solve, on the grid layout.

    ``cg_iters`` = 0 (default): dense camera-system solve — the window-scale
    fast path.  ``cg_iters`` > 0: matrix-free block-Jacobi PCG camera solve
    (global-scale; see _solve_step_pcg).  With ``cg_forcing`` the PCG
    tolerance follows an Eisenstat-Walker forcing sequence
    tol_k = clip(sqrt(|b_k| / |b_0|), cg_tol, 0.1): early LM iterations solve
    the camera system loosely (a handful of CG steps), tightening as the
    gradient shrinks — LM accept/reject guards the inexact steps."""
    p = problem._replace(mask=problem.mask.astype(problem.uv.dtype))
    C = p.rvecs.shape[0]
    C_adj = max(C - n_fixed, 1)
    # static one-hot over adjustable cameras (all-zero row for fixed cams);
    # the PCG path builds the transposed layout directly (no 2x(P*D*C') relayout)
    if cg_iters > 0:
        onehot = None
        # bf16 one-hot (0/1 is exact in bf16) halves the dominant HBM read of
        # every camera reduction; reduction values go through the MXU bf16
        # path with f32 accumulation (~3-decimal-digit rounding on the
        # reduced terms — PCG direction noise that block-Jacobi + LM
        # accept/reject absorb; enable at global scale, see config.ba)
        oh_dtype = jnp.bfloat16 if cg_bf16 else p.uv.dtype
        onehot_T = (jnp.arange(C_adj)[:, None]
                    == (p.cam_slot.reshape(-1)[None, :] - n_fixed)
                    ).astype(oh_dtype)                  # (C_adj, P*D)
    else:
        onehot = (p.cam_slot[..., None] - n_fixed
                  == jnp.arange(C_adj)[None, None, :]).astype(p.uv.dtype)

    def residuals(rv, tv, pt):
        r, _, _ = _grid_terms(rv, tv, pt, p)
        return r

    def cost_at(rv, tv, pt):
        return ba_flat.robust_cost(residuals(rv, tv, pt), huber_delta)

    def sq_at(rv, tv, pt):
        r = residuals(rv, tv, pt)
        return jnp.sum(r * r)

    init_cost = cost_at(p.rvecs, p.tvecs, p.points)
    init_sq = sq_at(p.rvecs, p.tvecs, p.points)

    def cond(s):
        return (~s[6]) & (s[5] < max_iterations)

    def body(s):
        rv, tv, pt, lam, cost, it, done, b0, blast = s
        if cg_iters > 0:
            if cg_forcing:
                # Eisenstat-Walker: tol_k from the PREVIOUS step's gradient
                # norm (b0 < 0 marks the first iteration -> loose 0.1)
                tol = jnp.where(
                    b0 > 0.0,
                    jnp.clip(jnp.sqrt(blast / jnp.maximum(b0, 1e-30)),
                             cg_tol, 0.1),
                    0.1,
                ).astype(p.uv.dtype)
            else:
                tol = jnp.asarray(cg_tol, p.uv.dtype)
            d_r, d_t, d_p, bnorm = _solve_step_pcg(
                rv, tv, pt, p, lam, huber_delta, n_fixed, onehot_T, cg_iters,
                tol, pc_group=cg_precond_group)
            b0 = jnp.where(b0 > 0.0, b0, bnorm)
            blast = bnorm
        else:
            d_r, d_t, d_p = _solve_step(rv, tv, pt, p, lam, huber_delta,
                                        n_fixed, onehot)
        rv2, tv2, pt2 = rv + d_r, tv + d_t, pt + d_p
        new_cost = cost_at(rv2, tv2, pt2)
        accept = new_cost < cost
        step_norm = jnp.sqrt(jnp.sum(d_r * d_r) + jnp.sum(d_t * d_t)
                             + jnp.sum(d_p * d_p))
        param_norm = jnp.sqrt(jnp.sum(rv * rv) + jnp.sum(tv * tv)
                              + jnp.sum(pt * pt))
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
        stuck = (~accept) & (lam >= lambda_max)
        return (rv, tv, pt, lam, cost, it + 1, converged | stuck, b0, blast)

    lam0 = jnp.asarray(lambda_init, p.uv.dtype)
    neg1 = jnp.asarray(-1.0, p.uv.dtype)
    rv, tv, pt, lam, cost, it, _, _, _ = jax.lax.while_loop(
        cond, body,
        (p.rvecs, p.tvecs, p.points, lam0, init_cost, 0, False, neg1, neg1),
    )
    stats = ba_flat.BAStats(
        initial_cost=init_cost, final_cost=cost,
        initial_sq=init_sq, final_sq=sq_at(rv, tv, pt),
        iterations=it, accepted=cost < init_cost,
    )
    return rv, tv, pt, stats


ba_solve_grid = jax.jit(
    ba_solve_grid_impl,
    static_argnames=("n_fixed", "cg_iters", "cg_forcing", "cg_bf16",
                     "cg_precond_group"),
)
