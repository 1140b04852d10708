"""Fused Pallas LM kernel: the ENTIRE windowed-BA Levenberg-Marquardt solve
in one TPU kernel dispatch.

Why this exists (measured, tools/profile_ba.py on TPU v5e): one LM iteration
of the XLA observation-grid solver (ops/ba_grid.py) costs ~1.73 ms, of which
the per-stage device work sums to only ~0.30 ms — the rest is XLA composition
overhead (relayouts and fusion boundaries between ~100 small ops), and even
the 0.30 ms is latency-bound: the window problem's ~23 MFLOP/iteration is
~0.1 us of v5e MXU time.  The whole solve is a VMEM-resident problem (a few
MB), so the TPU-native answer is ONE kernel that keeps every intermediate in
vector registers / VMEM and never round-trips HBM between stages — this
file.  It is the "Pallas blocked Schur-complement LM" of BASELINE.json's
north star (replacing scipy TRF at
/root/reference/src/bundle_adjuster.py:170-174), with LM semantics identical
to ops/ba_grid.ba_solve_grid (accept/reject, ftol/xtol stopping, divergence
handling by the caller).

Data layout (the TPU layout — P on the 128-lane axis):
    ptT      (3, P)      map points, transposed
    onehot   (D*C, P)    row d*C+c = 1 where slot d of point p observes cam c
                         (dead slots have all-zero rows)
    maskT    (D, P)      1.0 for live observation slots
    uvT      (D*2, P)    observed pixels, rows (d, {u,v})
    pmaskT   (1, P)      live (non-padding) points
    params   (1, 4)      fx, fy, cx, cy

Per LM iteration, entirely in-kernel:
  1. Rodrigues R(rv) and its ANALYTIC derivative (lie.so3_exp_and_jac math,
     re-derived as (1, C) row arithmetic),
  2. per-slot residuals + analytic Jacobians (VPU elementwise over P lanes),
  3. normal equations: U/g_c via MXU dot_generals of onehot-masked Jacobian
     stacks; V (3x3 point blocks) and the camera-point coupling B as vector
     madds,
  4. Schur complement S = blockdiag(U) - B V^-1 B^T via 3 MXU matmuls
     contracting the point lanes,
  5. the (6C')x(6C') camera system solved by statically-unrolled in-kernel
     Gauss-Jordan (S is damped SPD, so pivoting is unnecessary),
  6. point back-substitution, trial-point Huber cost, LM accept/reject.

The while_loop lives INSIDE the kernel, so a full 50-iteration solve is one
dispatch.  ``reference_lm`` runs the identical jnp math outside Pallas (same
function, plain arrays) — the CPU test oracle asserted against ba_solve_grid
in tests/test_ba_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bundle_adjustment_tpu.ops import ba as ba_flat
from bundle_adjustment_tpu.ops import ba_grid

_HIGHEST = jax.lax.Precision.HIGHEST


def _dotPP(a, b):
    """(M, P) x (N, P) -> (M, N): contract the lane (point) axis on the MXU
    without relayout of either operand."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), precision=_HIGHEST,
        preferred_element_type=jnp.float32)


def _dotCP(a, b):
    """(M, C) x (C, P) -> (M, P): the onehot gather as a matmul."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), precision=_HIGHEST,
        preferred_element_type=jnp.float32)


def _rodrigues_rows(rvT, want_jac):
    """R (and optionally dR/dr) for all C cameras as row-stacked arrays.

    ``rvT`` is (3, C).  Returns ``R_rows`` (9, C) with R_rows[i*3+j] = R_ij
    and ``dR_rows`` (27, C) with dR_rows[k*9+i*3+j] = dR_ij/dr_k (or None).
    Same math as lie.so3_exp_and_jac (asserted equal in tests/test_lie.py),
    written with (1, C) row arithmetic only so it lowers inside Pallas.
    """
    eps = 1e-8
    wx = rvT[0:1, :]
    wy = rvT[1:2, :]
    wz = rvT[2:3, :]
    t2 = wx * wx + wy * wy + wz * wz
    t = jnp.sqrt(t2 + eps * eps)
    small = t2 < eps
    st = jnp.sin(t)
    ct = jnp.cos(t)
    a = jnp.where(small, 1.0 - t2 / 6.0, st / t)
    b = jnp.where(small, 0.5 - t2 / 24.0,
                  (1.0 - ct) / jnp.maximum(t2, eps * eps))

    zero = jnp.zeros_like(wx)
    one = jnp.ones_like(wx)
    W = [zero, -wz, wy,
         wz, zero, -wx,
         -wy, wx, zero]
    W2 = [-(wy * wy + wz * wz), wx * wy, wx * wz,
          wx * wy, -(wx * wx + wz * wz), wy * wz,
          wx * wz, wy * wz, -(wx * wx + wy * wy)]
    I9 = [one, zero, zero, zero, one, zero, zero, zero, one]
    R_rows = jnp.concatenate(
        [I9[m] + a * W[m] + b * W2[m] for m in range(9)], axis=0)
    if not want_jac:
        return R_rows, None

    ra = jnp.where(small, -1.0 / 3.0 + t2 / 30.0,
                   (t * ct - st) / jnp.maximum(t2 * t, eps ** 3))
    rb = jnp.where(small, -1.0 / 12.0 + t2 / 180.0,
                   (t * st - 2.0 * (1.0 - ct)) / jnp.maximum(t2 * t2, eps ** 4))
    # E_k = hat(e_k) (constant), M_k = E_k W + W E_k
    E = [
        [zero, zero, zero, zero, zero, -one, zero, one, zero],
        [zero, zero, one, zero, zero, zero, -one, zero, zero],
        [zero, -one, zero, one, zero, zero, zero, zero, zero],
    ]
    M = [
        [zero, wy, wz, wy, -2 * wx, zero, wz, zero, -2 * wx],
        [-2 * wy, wx, zero, wx, zero, wz, zero, wz, -2 * wy],
        [-2 * wz, zero, wx, zero, -2 * wz, wy, wx, wy, zero],
    ]
    wk = [wx, wy, wz]
    dR_rows = jnp.concatenate(
        [ra * wk[k] * W[m] + a * E[k][m] + rb * wk[k] * W2[m] + b * M[k][m]
         for k in range(3) for m in range(9)], axis=0)
    return R_rows, dR_rows


def _huber_rho_sum(r_rows, delta):
    """0.5 * sum(rho(r)) over (1, P) residual rows (scipy loss='huber')."""
    total = None
    for r in r_rows:
        av = jnp.abs(r)
        quad = r * r
        lin = 2.0 * delta * av - delta * delta
        c = jnp.sum(jnp.where(av <= delta, quad, lin))
        total = c if total is None else total + c
    return 0.5 * total


def _sq_sum(r_rows):
    total = None
    for r in r_rows:
        c = jnp.sum(r * r)
        total = c if total is None else total + c
    return total


def _lm_solve_values(rv0, tv0, ptT0, onehot, maskT, uvT, pmaskT, params, cfg):
    """The complete LM solve on plain jnp VALUES — called from inside the
    Pallas kernel (refs pre-read) and directly by ``reference_lm`` for CPU
    testing.  Returns (rv (C,3), tv (C,3), ptT (3,P), stats (1,8))."""
    C = cfg["C"]
    D = cfg["D"]
    n_fixed = cfg["n_fixed"]
    C_adj = C - n_fixed
    n = C_adj * 6
    delta = cfg["huber_delta"]
    P = ptT0.shape[1]
    fx = params[0:1, 0:1]
    fy = params[0:1, 1:2]
    cx = params[0:1, 2:3]
    cy = params[0:1, 3:4]

    def slot_oh(d):
        return onehot[d * C:(d + 1) * C, :]             # (C, P)

    def slot_oh_adj(d):
        return onehot[d * C + n_fixed:(d + 1) * C, :]   # (C_adj, P)

    def slot_camera_frame(R_rows, tvT, ptT, d):
        """Xc rows, inv_z, mask and residual rows for slot d."""
        oh = slot_oh(d)
        Rg = _dotCP(R_rows, oh)                          # (9, P)
        tg = _dotCP(tvT, oh)                             # (3, P)
        p0, p1, p2 = ptT[0:1, :], ptT[1:2, :], ptT[2:3, :]
        Xc = [Rg[3 * i:3 * i + 1, :] * p0
              + Rg[3 * i + 1:3 * i + 2, :] * p1
              + Rg[3 * i + 2:3 * i + 3, :] * p2
              + tg[i:i + 1, :] for i in range(3)]
        z = Xc[2]
        z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        inv_z = 1.0 / z_safe
        m = maskT[d:d + 1, :]
        u = fx * Xc[0] * inv_z + cx
        v = fy * Xc[1] * inv_z + cy
        r = [(u - uvT[2 * d:2 * d + 1, :]) * m,
             (v - uvT[2 * d + 1:2 * d + 2, :]) * m]
        return Rg, Xc, inv_z, m, r

    def all_residual_rows(rv, tvv, ptT):
        R_rows, _ = _rodrigues_rows(jnp.transpose(rv), want_jac=False)
        tvT = jnp.transpose(tvv)
        rows = []
        for d in range(D):
            _, _, _, _, r = slot_camera_frame(R_rows, tvT, ptT, d)
            rows += r
        return rows

    def solve_step(rv, tvv, ptT, lam):
        R_rows, dR_rows = _rodrigues_rows(jnp.transpose(rv), want_jac=True)
        tvT = jnp.transpose(tvv)
        p0, p1, p2 = ptT[0:1, :], ptT[1:2, :], ptT[2:3, :]

        U_gc = jnp.zeros((n, 7), jnp.float32)
        # coupling blocks, 3 lane-parallel stacks: B[l][(c, i)] = B[p, c, i, l]
        B = [jnp.zeros((n, P), jnp.float32) for _ in range(3)]
        Vr = {(l, lp): jnp.zeros((1, P), jnp.float32)
              for l in range(3) for lp in range(l, 3)}
        g_p = [jnp.zeros((1, P), jnp.float32) for _ in range(3)]

        for d in range(D):
            Rg, Xc, inv_z, m, r = slot_camera_frame(R_rows, tvT, ptT, d)
            dRg = _dotCP(dR_rows, slot_oh(d))            # (27, P)

            # Huber IRLS weights (mask folded in, as ops/ba_grid.py)
            w = []
            for k in range(2):
                ak = jnp.abs(r[k])
                w.append(jnp.where(ak <= delta, 1.0,
                                   delta / jnp.maximum(ak, 1e-12)) * m)

            zrow = jnp.zeros_like(inv_z)
            duv = [[fx * inv_z, zrow, -fx * Xc[0] * inv_z * inv_z],
                   [zrow, fy * inv_z, -fy * Xc[1] * inv_z * inv_z]]

            # point Jacobian rows: jp[k][j] = sum_i duv[k][i] * R_ij
            jp = [[duv[k][0] * Rg[0 + j:1 + j, :]
                   + duv[k][1] * Rg[3 + j:4 + j, :]
                   + duv[k][2] * Rg[6 + j:7 + j, :]
                   for j in range(3)] for k in range(2)]

            # dXc/dr[i][kk] = sum_j dRg[kk*9 + i*3 + j] * pt[j]
            dXdr = [[dRg[kk * 9 + i * 3:kk * 9 + i * 3 + 1, :] * p0
                     + dRg[kk * 9 + i * 3 + 1:kk * 9 + i * 3 + 2, :] * p1
                     + dRg[kk * 9 + i * 3 + 2:kk * 9 + i * 3 + 3, :] * p2
                     for kk in range(3)] for i in range(3)]

            # camera Jacobian rows: cols 0-2 rotation, 3-5 translation
            jc = [[duv[k][0] * dXdr[0][kk] + duv[k][1] * dXdr[1][kk]
                   + duv[k][2] * dXdr[2][kk] for kk in range(3)]
                  + [duv[k][i] for i in range(3)] for k in range(2)]

            # ---- accumulate normal equations -------------------------------
            for l in range(3):
                for lp in range(l, 3):
                    Vr[(l, lp)] = Vr[(l, lp)] + (w[0] * jp[0][l] * jp[0][lp]
                                                 + w[1] * jp[1][l] * jp[1][lp])
                g_p[l] = g_p[l] + w[0] * jp[0][l] * r[0] + w[1] * jp[1][l] * r[1]

            # U and g_c in one MXU shot per k: OHJ (n, P) rows (c, i) =
            # oh_adj[c] * w[k] * jc[k][i]; right (7, P) rows = [jc ; r]
            oh_adj = slot_oh_adj(d)
            for k in range(2):
                wjc = [w[k] * jc[k][i] for i in range(6)]
                OHJ = jnp.concatenate(
                    [oh_adj[c:c + 1, :] * wjc[i]
                     for c in range(C_adj) for i in range(6)], axis=0)
                right = jnp.concatenate(jc[k] + [r[k]], axis=0)   # (7, P)
                U_gc = U_gc + _dotPP(OHJ, right)

            # B[l][(c, i)] += oh_adj[c] * Y[i, l],
            # with Y[i, l] = sum_k w[k] jc[k][i] jp[k][l]
            for l in range(3):
                Y_l = [w[0] * jc[0][i] * jp[0][l] + w[1] * jc[1][i] * jp[1][l]
                       for i in range(6)]
                B[l] = B[l] + jnp.concatenate(
                    [oh_adj[c:c + 1, :] * Y_l[i]
                     for c in range(C_adj) for i in range(6)], axis=0)

        # ---- damping + 3x3 block inverse (adjugate, ba.ops._inv3 math) -----
        v00 = Vr[(0, 0)]
        v01 = Vr[(0, 1)]
        v02 = Vr[(0, 2)]
        v11 = Vr[(1, 1)]
        v12 = Vr[(1, 2)]
        v22 = Vr[(2, 2)]
        v00 = v00 + lam * jnp.abs(v00) + lam * 1e-6
        v11 = v11 + lam * jnp.abs(v11) + lam * 1e-6
        v22 = v22 + lam * jnp.abs(v22) + lam * 1e-6
        A_ = v11 * v22 - v12 * v12
        B_ = v02 * v12 - v01 * v22
        C_ = v01 * v12 - v02 * v11
        E_ = v00 * v22 - v02 * v02
        F_ = v01 * v02 - v00 * v12
        I_ = v00 * v11 - v01 * v01
        det = v00 * A_ + v01 * B_ + v02 * C_
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        inv_det = pmaskT / det                 # point mask folds in here
        iv = {(0, 0): A_ * inv_det, (0, 1): B_ * inv_det, (0, 2): C_ * inv_det,
              (1, 1): E_ * inv_det, (1, 2): F_ * inv_det, (2, 2): I_ * inv_det}

        def Vinv(l, lp):
            return iv[(l, lp)] if (l, lp) in iv else iv[(lp, l)]

        # z_p = V^-1 g_p ; b = -g_c + B z_p ; S = blockdiag(U) - B V^-1 B^T
        z_p = [Vinv(l, 0) * g_p[0] + Vinv(l, 1) * g_p[1] + Vinv(l, 2) * g_p[2]
               for l in range(3)]
        BV = [B[0] * Vinv(0, lp) + B[1] * Vinv(1, lp) + B[2] * Vinv(2, lp)
              for lp in range(3)]
        S = -(_dotPP(BV[0], B[0]) + _dotPP(BV[1], B[1]) + _dotPP(BV[2], B[2]))
        # (n, 1) lane reduction; done as ONE multi_reduction with a constant
        # (zero) accumulator — Mosaic rejects (n,P)x(1,P) dots whose result
        # feeds an add (it folds the add into the reduction accumulator)
        Wz = jnp.sum(B[0] * z_p[0] + B[1] * z_p[1] + B[2] * z_p[2],
                     axis=1, keepdims=True)                        # (n, 1)

        # blockdiag(U) via masked column broadcasts (Mosaic rejects lane-dim
        # concats at non-aligned offsets, so no concat-based assembly here):
        # S_u[a, b_] = U_gc[a, j] where b_ == (a//6)*6 + j
        rowi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        coli = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        blockbase = (rowi // 6) * 6
        S_u = jnp.zeros((n, n), jnp.float32)
        for j in range(6):
            S_u = S_u + jnp.where(coli == blockbase + j,
                                  U_gc[:, j:j + 1], 0.0)
        eye_n = rowi == coli
        # per-block diag damping lam*(|diag|+1e-6) plus the solve's 1e-8 ridge
        S = S + S_u + jnp.where(eye_n,
                                lam * jnp.abs(S_u) + lam * 1e-6 + 1e-8, 0.0)

        g_c = U_gc[:, 6:7]
        b = -g_c + Wz                                              # (n, 1)

        # ---- Gauss-Jordan, statically unrolled (damped SPD: no pivoting);
        # S and the rhs kept separate (no [S | b] concat) -------------------
        rowid = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        for k in range(n):
            piv = S[k:k + 1, k:k + 1]                              # (1, 1)
            piv = jnp.where(jnp.abs(piv) < 1e-20, 1e-20, piv)
            inv_piv = 1.0 / piv
            pivrow = S[k:k + 1, :] * inv_piv                       # (1, n)
            pivb = b[k:k + 1, :] * inv_piv                         # (1, 1)
            colk = S[:, k:k + 1]                                   # (n, 1)
            is_k = rowid == k
            factor = jnp.where(is_k, 0.0, colk)
            S = S - factor * pivrow
            b = b - factor * pivb
            S = jnp.where(is_k, pivrow, S)
            b = jnp.where(is_k, pivb, b)
        dc = b                                                     # (n, 1)

        # ---- back-substitute points -----------------------------------------
        Wt = [jnp.sum(dc * B[l], axis=0, keepdims=True) for l in range(3)]
        rhs = [-g_p[l] - Wt[l] for l in range(3)]
        dpT = jnp.concatenate(
            [Vinv(l, 0) * rhs[0] + Vinv(l, 1) * rhs[1] + Vinv(l, 2) * rhs[2]
             for l in range(3)], axis=0)                           # (3, P)

        # ---- camera deltas: dc (n, 1) -> (C, 3), concat-free ----------------
        # d[cf, j] = sum_a [a//6 == cf - n_fixed] dc[a] [a%6 == j(+3)]
        dcT = jnp.transpose(dc)                                    # (1, n)
        cam_of = jax.lax.broadcasted_iota(jnp.int32, (C, n), 1) // 6 + n_fixed
        cam_id = jax.lax.broadcasted_iota(jnp.int32, (C, n), 0)
        E_sel = jnp.where(cam_of == cam_id, dcT, 0.0)              # (C, n)
        a_mod = jax.lax.broadcasted_iota(jnp.int32, (n, 3), 0) % 6
        col3 = jax.lax.broadcasted_iota(jnp.int32, (n, 3), 1)
        F_r = jnp.where(a_mod == col3, 1.0, 0.0).astype(jnp.float32)
        F_t = jnp.where(a_mod == col3 + 3, 1.0, 0.0).astype(jnp.float32)
        d_rv = _dotCP(E_sel, F_r)                                  # (C, 3)
        d_tv = _dotCP(E_sel, F_t)
        return d_rv, d_tv, dpT

    def cost_of(rv, tvv, ptT):
        return _huber_rho_sum(all_residual_rows(rv, tvv, ptT), delta)

    def sq_of(rv, tvv, ptT):
        return _sq_sum(all_residual_rows(rv, tvv, ptT))

    init_cost = cost_of(rv0, tv0, ptT0)
    init_sq = sq_of(rv0, tv0, ptT0)

    max_iterations = cfg["max_iterations"]
    ftol, xtol = cfg["ftol"], cfg["xtol"]
    lam_up, lam_dn = cfg["lambda_up"], cfg["lambda_down"]
    lam_min, lam_max = cfg["lambda_min"], cfg["lambda_max"]

    def cond(s):
        return (~s[6]) & (s[5] < max_iterations)

    def body(s):
        rv, tvv, ptT, lam, cost, it, done = s
        d_rv, d_tv, dpT = solve_step(rv, tvv, ptT, lam)
        rv2 = rv + d_rv
        tv2 = tvv + d_tv
        pt2 = ptT + dpT
        new_cost = cost_of(rv2, tv2, pt2)
        accept = new_cost < cost
        step_norm = jnp.sqrt(jnp.sum(d_rv * d_rv) + jnp.sum(d_tv * d_tv)
                             + jnp.sum(dpT * dpT))
        param_norm = jnp.sqrt(jnp.sum(rv * rv) + jnp.sum(tvv * tvv)
                              + jnp.sum(ptT * ptT))
        converged = accept & (
            ((cost - new_cost) <= ftol * jnp.maximum(cost, 1e-12))
            | (step_norm <= xtol * (param_norm + xtol))
        )
        rv = jnp.where(accept, rv2, rv)
        tvv = jnp.where(accept, tv2, tvv)
        ptT = jnp.where(accept, pt2, ptT)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * lam_dn, lam_min),
                        jnp.minimum(lam * lam_up, lam_max))
        stuck = (~accept) & (lam >= lam_max)
        return (rv, tvv, ptT, lam, cost, it + 1, converged | stuck)

    state = (rv0, tv0, ptT0, jnp.float32(cfg["lambda_init"]), init_cost,
             jnp.int32(0), init_cost < 0.0)
    rv, tvv, ptT, lam, cost, it, _ = jax.lax.while_loop(cond, body, state)

    final_sq = sq_of(rv, tvv, ptT)
    vals = (init_cost, cost, init_sq, final_sq,
            it.astype(jnp.float32), (cost < init_cost).astype(jnp.float32),
            lam, jnp.float32(0.0))
    # masked-broadcast assembly (no lane-dim concat of (1,1) scalars)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    stats = jnp.zeros((1, 8), jnp.float32)
    for i, v in enumerate(vals):
        stats = stats + jnp.where(lane8 == i, v.astype(jnp.float32), 0.0)
    return rv, tvv, ptT, stats


def eligible_shape(C: int, P: int, D: int, n_fixed: int = 1) -> bool:
    """Shape-level gate (see kernel_eligible)."""
    n = max(C - n_fixed, 1) * 6
    if n > 48 or D > 12 or P > 2048:
        return False
    P_pad = -(-P // 128) * 128
    # dominant VMEM residents: 3 B stacks + OHJ/right transients (n, P),
    # onehot (D*C, P), ~70 (1, P) working rows, uv/mask
    est_bytes = 4 * P_pad * (4 * n + D * C + 3 * D + 70)
    return est_bytes < 10 * 1024 * 1024


def kernel_eligible(grid: ba_grid.BAProblemGrid, n_fixed: int = 1) -> bool:
    """Static-bound gate for the fused kernel: the Gauss-Jordan unroll wants
    a small camera system and everything must fit VMEM (~16 MB/core).  Above
    these bounds callers use the XLA grid solver or the PCG flat path.

    P <= 2048 is the compile-PROVEN boundary on v5e: at P=4096 the Mosaic
    compile helper aborts (measured r04 — the first on-hardware stress run
    latched the runtime fallback on its very first window because this gate
    admitted P=4096; bench's compile smoke covers the window kernel at the
    gate-derived buckets (admitted_window_shapes) so the boundary is
    re-checked every bench run)."""
    P, D = grid.cam_slot.shape
    return eligible_shape(grid.rvecs.shape[0], P, D, n_fixed)


def admitted_window_shapes(C: int = 6, D: int = 4, n_fixed: int = 1) -> list:
    """Point buckets for the hardware compile smoke, DERIVED from the gate
    (VERDICT r04 #6): the pipeline pads gathered windows to power-of-two P
    buckets, so sweep every pow-2 bucket the gate admits at window scale,
    plus the first two refused buckets (recorded as "ineligible" so a
    silently widened gate shows up as a NEW smoked shape, the r04 P=4096
    bug class)."""
    shapes, refused = [], 0
    P = 128
    while refused < 2 and P <= 1 << 16:
        if eligible_shape(C, P, D, n_fixed):
            shapes.append(P)
        else:
            refused += 1
            shapes.append(P)
        P *= 2
    return shapes


def _kernel(rv_ref, tv_ref, pt_ref, onehot_ref, mask_ref, uv_ref, pmask_ref,
            params_ref, rv_out, tv_out, pt_out, stats_out, *, cfg):
    rv, tvv, ptT, stats = _lm_solve_values(
        rv_ref[:], tv_ref[:], pt_ref[:], onehot_ref[:], mask_ref[:],
        uv_ref[:], pmask_ref[:], params_ref[:], cfg)
    rv_out[:] = rv
    tv_out[:] = tvv
    pt_out[:] = ptT
    stats_out[:] = stats


def _prep_inputs(grid: ba_grid.BAProblemGrid, n_fixed: int):
    """XLA-side layout: transpose to lane-parallel P and pad P to 128."""
    P, D = grid.cam_slot.shape
    C = grid.rvecs.shape[0]
    P_pad = -(-P // 128) * 128
    pad = P_pad - P

    ptT = jnp.pad(grid.points.astype(jnp.float32), ((0, pad), (0, 0))).T
    cam_slotT = jnp.pad(grid.cam_slot, ((0, pad), (0, 0))).T      # (D, P')
    maskT = jnp.pad(grid.mask.astype(jnp.float32), ((0, pad), (0, 0))).T
    uvT = jnp.pad(grid.uv.astype(jnp.float32),
                  ((0, pad), (0, 0), (0, 0))).transpose(1, 2, 0).reshape(
                      2 * D, P_pad)
    pmaskT = jnp.pad(grid.point_mask.astype(jnp.float32), (0, pad))[None, :]
    # onehot gather matrix; dead slots (mask 0) get all-zero rows so their
    # cam_slot of 0 cannot alias camera 0
    onehot = (cam_slotT[:, None, :] == jnp.arange(C)[None, :, None]
              ).astype(jnp.float32)
    onehot = (onehot * maskT[:, None, :]).reshape(D * C, P_pad)
    params = jnp.stack(
        [grid.K[0, 0], grid.K[1, 1], grid.K[0, 2], grid.K[1, 2]]
    ).astype(jnp.float32)[None, :]
    return ptT, onehot, maskT, uvT, pmaskT, params, P, P_pad, D, C


def _stats_tuple(stats):
    return ba_flat.BAStats(
        initial_cost=stats[0, 0], final_cost=stats[0, 1],
        initial_sq=stats[0, 2], final_sq=stats[0, 3],
        iterations=stats[0, 4].astype(jnp.int32),
        accepted=stats[0, 5] > 0.5,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_fixed", "max_iterations", "huber_delta",
                     "lambda_init", "lambda_up", "lambda_down", "lambda_min",
                     "lambda_max", "ftol", "xtol", "interpret"))
def ba_solve_grid_pallas(
    grid: ba_grid.BAProblemGrid,
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
    interpret: bool = False,
):
    """Drop-in equivalent of ops/ba_grid.ba_solve_grid as one fused TPU
    kernel.  Solver knobs are static (they select a compiled kernel variant).
    Returns (rvecs, tvecs, points, BAStats) exactly like ba_solve_grid."""
    from jax.experimental import pallas as pl

    ptT, onehot, maskT, uvT, pmaskT, params, P, P_pad, D, C = _prep_inputs(
        grid, n_fixed)
    cfg = dict(
        C=C, D=D, n_fixed=n_fixed, max_iterations=max_iterations,
        huber_delta=huber_delta, lambda_init=lambda_init, lambda_up=lambda_up,
        lambda_down=lambda_down, lambda_min=lambda_min, lambda_max=lambda_max,
        ftol=ftol, xtol=xtol,
    )

    rv, tvv, ptT_out, stats = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        out_shape=(
            jax.ShapeDtypeStruct((C, 3), jnp.float32),
            jax.ShapeDtypeStruct((C, 3), jnp.float32),
            jax.ShapeDtypeStruct((3, P_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ),
        interpret=interpret,
    )(grid.rvecs.astype(jnp.float32), grid.tvecs.astype(jnp.float32),
      ptT, onehot, maskT, uvT, pmaskT, params)

    return rv, tvv, ptT_out.T[:P], _stats_tuple(stats)


@functools.partial(
    jax.jit,
    static_argnames=("n_fixed", "max_iterations", "huber_delta",
                     "lambda_init", "lambda_up", "lambda_down", "lambda_min",
                     "lambda_max", "ftol", "xtol"))
def reference_lm(
    grid: ba_grid.BAProblemGrid,
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
):
    """The kernel's numerical twin as a plain XLA function (CPU test oracle):
    identical math and layout, no pallas_call."""
    ptT, onehot, maskT, uvT, pmaskT, params, P, P_pad, D, C = _prep_inputs(
        grid, n_fixed)
    cfg = dict(
        C=C, D=D, n_fixed=n_fixed, max_iterations=max_iterations,
        huber_delta=huber_delta, lambda_init=lambda_init, lambda_up=lambda_up,
        lambda_down=lambda_down, lambda_min=lambda_min, lambda_max=lambda_max,
        ftol=ftol, xtol=xtol,
    )
    rv, tvv, ptT_out, stats = _lm_solve_values(
        grid.rvecs.astype(jnp.float32), grid.tvecs.astype(jnp.float32),
        ptT, onehot, maskT, uvT, pmaskT, params, cfg)
    return rv, tvv, ptT_out.T[:P], _stats_tuple(stats)
