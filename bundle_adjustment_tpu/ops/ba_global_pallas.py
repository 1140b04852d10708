"""Fused Pallas kernels for the GLOBAL-scale PCG bundle adjuster.

Why this exists (measured, `tools/profile_ba.py --global-pcg` on TPU v5e at
C=200/P=30k/O=120k): one LM iteration of the XLA grid PCG solver
(ops/ba_grid._solve_step_pcg) costs ~16.7 ms composed, but its stages sum to
only ~4.7 ms (terms 1.56 + setup 0.39 + preconditioner 1.30 + trial cost
1.44) + 0.42 ms per CG matvec — the remainder is XLA fusion-boundary
overhead between the ~hundreds of small ops, the same measured gap that
justified the window-scale fused kernel (ops/ba_pallas.py, which replaces
scipy TRF at /root/reference/src/bundle_adjuster.py:170-174; this module
plays that role at the reference's GLOBAL-BA scale, src/main.py:80-89).

The global problem does NOT fit VMEM, so unlike ba_pallas.py this is not one
whole-solve kernel; it is four kernels tiled over map points, with the tiny
camera-space algebra (damping, block-Jacobi inverse, CG scalar recurrences,
LM accept/reject) staying in XLA where it is a handful of (C',6)-sized ops:

  _setup_kernel   one pass over P-tiles per LM iteration: residuals +
                  analytic Jacobians + Huber IRLS weights + V elimination +
                  coupling blocks Y + ALL FOUR camera reductions (U blocks,
                  gradient, rhs coupling, block-Jacobi preconditioner rows),
                  accumulated across tiles into one (C', 54) output
                  (U and the preconditioner are symmetric 6x6 blocks, packed
                  as 21 upper-triangle lanes each — 54 = 21+6+6+21 — which
                  cuts the dominant scatter-matmul FLOPs 36% vs naive 84).
  _matvec_kernel  one pass per CG iteration: S·x = U x − W V⁻¹ Wᵀ x
                  matrix-free, streaming the Y/V⁻¹ tiles written by setup.
  _cost_kernel    trial-point Huber cost + raw squared cost.
  _backsub_kernel point back-substitution dp = −(z_p + V⁻¹ Wᵀ x).

Camera-indexed data flows through the kernels in one of two modes, picked
per problem size by `_plan` (both modes share every line of math):

  gather mode (small C): the per-slot camera rows (R, dR/dr, t, x) are
      gathered IN-KERNEL as a (C, TP) one-hot matmul rebuilt from the int32
      slot row with one iota compare — the one-hot never exists in HBM (the
      XLA path materializes a (C', P·D) one-hot: 95 MB of HBM traffic per
      pass at C=200, 1.9 GB at C=1000 — the reason its bf16 mode existed).
  pregather mode (large C): the same gathers run OUTSIDE the kernel as one
      XLA take per pass ((D·39, P) ~ 75 MB HBM at C=1000 — 2 orders below
      the XLA path's one-hot) and stream in as plain tiled inputs.  This
      removes the gather one-hots' C·TP VMEM transients AND their
      O(C·D·P) matmul FLOPs, so large-C problems keep large tiles.

The SCATTER side (the (C', 54) camera reduction) always stays in-kernel as
an MXU matmul against slot one-hots, but is blocked over C-chunks of CB
rows so its VMEM transient is (CB, TP) regardless of C — the fix for the
r03 scoped-VMEM OOM class and what extends eligibility past C=2048.

LM semantics (accept/reject, Eisenstat-Walker forcing, ftol/xtol stopping)
are ba_grid.ba_solve_grid's, asserted equivalent in
tests/test_ba_global_pallas.py (interpret mode on CPU; step-level parity vs
_solve_step_pcg and whole-solve cost parity, in both modes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundle_adjustment_tpu.ops import ba as ba_flat
from bundle_adjustment_tpu.ops import ba_grid
from bundle_adjustment_tpu.ops.ba_pallas import _rodrigues_rows

_HIGHEST = jax.lax.Precision.HIGHEST

# setup-kernel reduction layout (lane axis of the (C_adj, 54) output):
# symmetric 6x6 blocks packed as their 21 upper-triangle entries
_TRI6 = [(i, j) for i in range(6) for j in range(i, 6)]
_TRI6_IDX = {ij: k for k, ij in enumerate(_TRI6)}
_RED_U = slice(0, 21)       # U upper triangle
_RED_GC = slice(21, 27)     # camera gradient
_RED_WZ = slice(27, 33)     # rhs coupling  W V^-1 g_p
_RED_DO = slice(33, 54)     # block-Jacobi  W V^-1 W^T  upper triangle
_RED_COLS = 54


def _unpack_sym6(tri):
    """(..., 21) packed upper triangle -> (..., 6, 6) symmetric blocks."""
    idx = jnp.asarray([[_TRI6_IDX[(min(i, j), max(i, j))] for j in range(6)]
                       for i in range(6)], jnp.int32)
    return tri[..., idx]


def _dotPP(a, b):
    """(M, TP) x (N, TP) -> (M, N): contract the lane (point) axis."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), precision=_HIGHEST,
        preferred_element_type=jnp.float32)


def _dotCP(a, b):
    """(M, C) x (C, TP) -> (M, TP): the one-hot gather as a matmul."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), precision=_HIGHEST,
        preferred_element_type=jnp.float32)


def _slot_onehot(slot_row, m_row, C, base=0):
    """(C, TP) one-hot for rows [base, base+C) from an int32 slot row; dead
    slots all-zero."""
    ci = jax.lax.broadcasted_iota(jnp.int32, (C, slot_row.shape[1]), 0)
    return jnp.where(ci == slot_row - base, m_row, 0.0)


def _scatter_chunks(slotT, maskT, rows, red, *, d, C_adj, n_fixed, CB):
    """red += rows · one_hot(slot - n_fixed)ᵀ, blocked over C-chunks of CB
    columns so the one-hot transient is (CB, TP) regardless of C.

    Output orientation is (n_rows, C_adj) — rows on the SUBLANE axis — on
    purpose: the MXU pads a matmul's output lane dim to 128, so the naive
    (C_adj, 54) orientation issues 128/54 = 2.4x (setup) to 128/6 = 21x
    (matvec) padding FLOPs; callers un-scramble the small result once in
    XLA (_unscramble_chunks).  NOTE the measured residual cost (r04, C=1000):
    the one-hot CONSTRUCTION itself is VPU-bound at ~2-4 compare/select ops
    per (C', TP) cell — O(C'·P·D) per pass — which is what now dominates the
    matvec pass (3.3 ms measured vs ~0.3 ms of MXU+HBM roofline).  The next
    lever, if large-C throughput matters more: sort points by owning camera
    in from_flat and skip chunks no slot in the tile can hit (loop-closure
    rows keep extra chunks alive via the same mask, so it stays exact).

    Every chunk is a FULL CB columns; chunks stack on the SUBLANE axis — the
    output is (nchunks*n_rows, CB), un-scrambled to (C', n_rows) by
    _unscramble_chunks in XLA.  A one-hot row beyond C_adj can never match a
    slot (slots are < C), so the padding columns are exact zeros.  Lane-axis
    concat of the chunk results is NOT an option: it crashes the Mosaic
    compiler at every multi-chunk size tried (C>=1000, r04), aligned or not,
    while sublane concat of matmul outputs compiles everywhere."""
    parts = []
    for lo in range(0, C_adj, CB):
        oh = _slot_onehot(slotT[d:d + 1, :], maskT[d:d + 1, :], CB,
                          base=n_fixed + lo)
        parts.append(_dotPP(rows, oh))               # (n_rows, CB)
    contrib = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return red + contrib


def _unscramble_chunks(out, n_rows, C_adj, CB):
    """(nchunks*n_rows, CB) chunk-stacked kernel output -> (C_adj, n_rows)."""
    nch = out.shape[0] // n_rows
    return out.reshape(nch, n_rows, CB).transpose(0, 2, 1).reshape(
        nch * CB, n_rows)[:C_adj]


def _c_pad(C_adj, CB):
    """Padded camera-column count of the chunked scatter output."""
    return -(-C_adj // CB) * CB


def _slot_frame(Rg, tg, ptT, maskT, uvT, scal, d):
    """Camera-frame coords + residual rows for slot d of the current tile.
    Rg (9, TP) / tg (3, TP) are the slot's camera rows — one-hot-masked in
    gather mode, raw gathered in pregather mode; residuals are masked either
    way so dead slots contribute exactly zero downstream (all reduction
    terms carry w or r factors)."""
    fx = scal[0:1, 0:1]
    fy = scal[0:1, 1:2]
    cx = scal[0:1, 2:3]
    cy = scal[0:1, 3:4]
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
    return Xc, inv_z, m, r


def _setup_body(fetch, ptT, slotT, maskT, uvT, pmaskT, scal,
                *, C, D, n_fixed, CB):
    """Per-tile setup math on plain jnp VALUES (shared by the Pallas kernel
    and the CPU oracle).  ``fetch(d) -> (Rg (9,TP), dRg (27,TP), tg (3,TP))``
    supplies slot d's camera rows (gather or pregather mode).  Returns
    (YT rows (D*18, TP), VinvT (6, TP), zpT (3, TP), red (54, C_adj)).

    ``CB=None`` selects SPLIT mode (the C>1024 path): no scatter runs here;
    the per-slot 54 reduction rows are returned raw as a (D*54, TP) stack
    for the separate `_scatter54_kernel` — the multi-chunk scatter that
    aborts the Mosaic compiler inside this (already huge) body compiles
    fine in that small kernel, which is what breaks the r04 C<=1024 setup
    compile wall."""
    lam = scal[0:1, 4:5]
    delta = scal[0:1, 5:6]
    p0, p1, p2 = ptT[0:1, :], ptT[1:2, :], ptT[2:3, :]
    C_adj = max(C - n_fixed, 1)

    Vr = {}
    g_p = [0.0, 0.0, 0.0]
    per_slot = []           # (w, r, jc, jp) per d

    for d in range(D):
        slot = slotT[d:d + 1, :]
        Rg, dRg, tg = fetch(d)
        Xc, inv_z, m, r = _slot_frame(Rg, tg, ptT, maskT, uvT, scal, d)
        cam_ok = jnp.where(slot >= n_fixed, 1.0, 0.0)

        w = []
        for k in range(2):
            ak = jnp.abs(r[k])
            w.append(jnp.where(ak <= delta, 1.0,
                               delta / jnp.maximum(ak, 1e-12)) * m)

        zrow = jnp.zeros_like(inv_z)
        fx = scal[0:1, 0:1]
        fy = scal[0:1, 1:2]
        duv = [[fx * inv_z, zrow, -fx * Xc[0] * inv_z * inv_z],
               [zrow, fy * inv_z, -fy * Xc[1] * inv_z * inv_z]]

        # point Jacobian rows: jp[k][l] = sum_i duv[k][i] * R_il
        jp = [[duv[k][0] * Rg[0 + l:1 + l, :]
               + duv[k][1] * Rg[3 + l:4 + l, :]
               + duv[k][2] * Rg[6 + l:7 + l, :]
               for l in range(3)] for k in range(2)]

        # dXc/dr[i][kk] = sum_j dRg[kk*9 + i*3 + j] * pt[j]
        dXdr = [[dRg[kk * 9 + i * 3:kk * 9 + i * 3 + 1, :] * p0
                 + dRg[kk * 9 + i * 3 + 1:kk * 9 + i * 3 + 2, :] * p1
                 + dRg[kk * 9 + i * 3 + 2:kk * 9 + i * 3 + 3, :] * p2
                 for kk in range(3)] for i in range(3)]

        # camera Jacobian rows (cols 0-2 rotation, 3-5 translation), zeroed
        # for gauge-fixed cameras exactly as ba_grid (cam_ok BEFORE Y/U)
        jc = [[(duv[k][0] * dXdr[0][kk] + duv[k][1] * dXdr[1][kk]
                + duv[k][2] * dXdr[2][kk]) * cam_ok for kk in range(3)]
              + [duv[k][i] * cam_ok for i in range(3)] for k in range(2)]

        for l in range(3):
            for lp in range(l, 3):
                Vr[(l, lp)] = Vr.get((l, lp), 0.0) \
                    + w[0] * jp[0][l] * jp[0][lp] + w[1] * jp[1][l] * jp[1][lp]
            g_p[l] = g_p[l] + w[0] * jp[0][l] * r[0] + w[1] * jp[1][l] * r[1]

        # stash only the small per-slot rows; scatter one-hots are rebuilt
        # chunk-by-chunk in the reduction loop below to bound VMEM
        per_slot.append((w, r, jc, jp))

    # ---- V damping + adjugate inverse (ba._inv3 math), point mask folded --
    lam_eps = lam * 1e-6
    v00 = Vr[(0, 0)]
    v01 = Vr[(0, 1)]
    v02 = Vr[(0, 2)]
    v11 = Vr[(1, 1)]
    v12 = Vr[(1, 2)]
    v22 = Vr[(2, 2)]
    v00 = v00 + lam * jnp.abs(v00) + lam_eps
    v11 = v11 + lam * jnp.abs(v11) + lam_eps
    v22 = v22 + lam * jnp.abs(v22) + lam_eps
    A_ = v11 * v22 - v12 * v12
    B_ = v02 * v12 - v01 * v22
    C_ = v01 * v12 - v02 * v11
    E_ = v00 * v22 - v02 * v02
    F_ = v01 * v02 - v00 * v12
    I_ = v00 * v11 - v01 * v01
    det = v00 * A_ + v01 * B_ + v02 * C_
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv_det = pmaskT / det
    iv = {(0, 0): A_ * inv_det, (0, 1): B_ * inv_det, (0, 2): C_ * inv_det,
          (1, 1): E_ * inv_det, (1, 2): F_ * inv_det, (2, 2): I_ * inv_det}

    def Vinv(l, lp):
        return iv[(l, lp)] if (l, lp) in iv else iv[(lp, l)]

    z_p = [Vinv(l, 0) * g_p[0] + Vinv(l, 1) * g_p[1] + Vinv(l, 2) * g_p[2]
           for l in range(3)]

    # ---- per-slot Y, camera reductions ------------------------------------
    Y_rows_all = []
    raw_rows = []           # split mode (CB=None): per-slot (54, TP) stacks
    red = 0.0
    for d in range(D):
        w, r, jc, jp = per_slot[d]
        # Y[i][l] = sum_k w[k] jc[k][i] jp[k][l]
        Y = [[w[0] * jc[0][i] * jp[0][l] + w[1] * jc[1][i] * jp[1][l]
              for l in range(3)] for i in range(6)]
        YV = [[Y[i][0] * Vinv(0, l) + Y[i][1] * Vinv(1, l)
               + Y[i][2] * Vinv(2, l) for l in range(3)] for i in range(6)]
        rows = []
        # U block rows (21, upper tri): U[i][j] = sum_k w[k] jc[k][i] jc[k][j]
        for i, j in _TRI6:
            rows.append(w[0] * jc[0][i] * jc[0][j]
                        + w[1] * jc[1][i] * jc[1][j])
        # gradient rows (6)
        for i in range(6):
            rows.append(w[0] * jc[0][i] * r[0] + w[1] * jc[1][i] * r[1])
        # rhs coupling rows (6): (Y z_p)[i]
        for i in range(6):
            rows.append(Y[i][0] * z_p[0] + Y[i][1] * z_p[1] + Y[i][2] * z_p[2])
        # preconditioner rows (21, upper tri): (Y V^-1 Y^T)[i][j]
        for i, j in _TRI6:
            rows.append(YV[i][0] * Y[j][0] + YV[i][1] * Y[j][1]
                        + YV[i][2] * Y[j][2])
        rows = jnp.concatenate(rows, axis=0)                 # (54, TP)
        if CB is None:
            raw_rows.append(rows)
        else:
            red = _scatter_chunks(slotT, maskT, rows, red, d=d, C_adj=C_adj,
                                  n_fixed=n_fixed, CB=CB)
        Y_rows_all += [Y[i][l] for i in range(6) for l in range(3)]
    if CB is None:
        red = jnp.concatenate(raw_rows, axis=0)              # (D*54, TP)

    YT = jnp.concatenate(Y_rows_all, axis=0)                 # (D*18, TP)
    VinvT = jnp.concatenate(
        [iv[(0, 0)], iv[(0, 1)], iv[(0, 2)], iv[(1, 1)], iv[(1, 2)],
         iv[(2, 2)]], axis=0)                                # (6, TP)
    zpT = jnp.concatenate(z_p, axis=0)                       # (3, TP)
    return YT, VinvT, zpT, red


def _gather_fetch(R_ref, dR_ref, tv_ref, slot_ref, mask_ref, *, C):
    """fetch(d) for gather mode: per-slot camera rows via one (C, TP)
    one-hot matmul per table (mask folded, so dead slots read zeros)."""
    def fetch(d):
        oh = _slot_onehot(slot_ref[d:d + 1, :], mask_ref[d:d + 1, :], C)
        return (_dotCP(R_ref[:], oh), _dotCP(dR_ref[:], oh),
                _dotCP(tv_ref[:], oh))
    return fetch


def _pre_fetch(cam_ref, *, rows):
    """fetch(d) for pregather mode: slot-major contiguous row slices of the
    XLA-gathered (D*rows, TP) tile (rows = 9 R + 27 dR + 3 t)."""
    def fetch(d):
        sl = cam_ref[d * rows:(d + 1) * rows, :]
        return sl[0:9, :], sl[9:36, :], sl[36:39, :]
    return fetch


def _setup_kernel_gather(R_ref, dR_ref, tv_ref, pt_ref, slot_ref, mask_ref,
                         uv_ref, pmask_ref, scal_ref, Y_out, Vinv_out,
                         zp_out, red_out, *, C, D, n_fixed, CB):
    fetch = _gather_fetch(R_ref, dR_ref, tv_ref, slot_ref, mask_ref, C=C)
    _setup_common(fetch, pt_ref, slot_ref, mask_ref, uv_ref, pmask_ref,
                  scal_ref, Y_out, Vinv_out, zp_out, red_out,
                  C=C, D=D, n_fixed=n_fixed, CB=CB)


def _setup_common(fetch, pt_ref, slot_ref, mask_ref, uv_ref, pmask_ref,
                  scal_ref, Y_out, Vinv_out, zp_out, red_out,
                  *, C, D, n_fixed, CB):
    from jax.experimental import pallas as pl

    YT, VinvT, zpT, red = _setup_body(
        fetch, pt_ref[:], slot_ref[:], mask_ref[:], uv_ref[:], pmask_ref[:],
        scal_ref[:], C=C, D=D, n_fixed=n_fixed, CB=CB)
    Y_out[:] = YT
    Vinv_out[:] = VinvT
    zp_out[:] = zpT

    @pl.when(pl.program_id(0) == 0)
    def _():
        red_out[:] = jnp.zeros_like(red_out)

    red_out[:] = red_out[:] + red


def _setup_math_kernel_skipg(live_ref, cam_ref, pt_ref, slot_ref, mask_ref,
                             uv_ref, pmask_ref, scal_ref, Y_out, Vinv_out,
                             zp_out, rows_out, cam_scr,
                             *, C, D, n_fixed, CB, NCH):
    """Split-setup math half (chunked-gather mode; the C>=513 path):
    everything the fused setup computes EXCEPT the camera scatter — the raw
    (D*54, TP) reduction rows stream to HBM for `_scatter54_kernel`.  With
    the scatter gone the body has no C dependence beyond the resident
    camera table, so it compiles at any camera count (the r04 wall was
    multi-chunk scatter inside this body).  Camera rows (R, dR, t = 39)
    come from the in-kernel chunk-skipped gather; note base0=0 — FIXED
    cameras must still be gathered (only the scatter excludes them)."""
    _skip_gather(live_ref, slot_ref[:], mask_ref[:], cam_ref, cam_scr,
                 n_rows=39, D=D, CB=CB, NCH=NCH, base0=0)
    fetch = _pre_fetch(cam_scr, rows=39)
    YT, VinvT, zpT, rows = _setup_body(
        fetch, pt_ref[:], slot_ref[:], mask_ref[:], uv_ref[:], pmask_ref[:],
        scal_ref[:], C=C, D=D, n_fixed=n_fixed, CB=None)
    Y_out[:] = YT
    Vinv_out[:] = VinvT
    zp_out[:] = zpT
    rows_out[:] = rows


def _skip_scatter(live_ref, slotT, maskT, rows_of, out_ref, *, n_rows, D,
                  n_fixed, CB, NCH):
    """Chunk-skipped camera scatter: for each of NCH static C-chunks, the
    (CB, TP) one-hot + matmul run ONLY if this P-tile's prefetched live
    table says some slot hits the chunk.  With points camera-sorted (see
    ba_solve_global_pallas) a tile's slots span ~C*TP/P cameras, so ~1-2 of
    NCH chunks are live — the O(C'*P*D) one-hot construction that dominated
    the r04 matvec (3.3 ms vs 0.3 ms roofline, BASELINE.md) shrinks by
    ~nch/live.  Loop-closure observations stay exact: they simply keep
    extra chunks live via the same table.  ``rows_of(d) -> (n_rows, TP)``."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for ci in range(NCH):
        @pl.when(live_ref[i * NCH + ci] > 0)
        def _(ci=ci):
            acc = None
            for d in range(D):
                oh = _slot_onehot(slotT[d:d + 1, :], maskT[d:d + 1, :], CB,
                                  base=n_fixed + ci * CB)
                c = _dotPP(rows_of(d), oh)
                acc = c if acc is None else acc + c
            sl = slice(ci * n_rows, (ci + 1) * n_rows)
            out_ref[sl, :] = out_ref[sl, :] + acc


def _scatter54_kernel(live_ref, rows_ref, slot_ref, mask_ref, out_ref,
                      *, D, n_fixed, CB, NCH):
    """Scatter half of the split setup: consumes the math kernel's (D*54,
    TP) row stream, produces the same chunk-stacked (NCH*54, CB) reduction
    `_setup_kernel_*` would have."""
    _skip_scatter(live_ref, slot_ref[:], mask_ref[:],
                  lambda d: rows_ref[d * 54:(d + 1) * 54, :], out_ref,
                  n_rows=_RED_COLS, D=D, n_fixed=n_fixed, CB=CB, NCH=NCH)


def _skip_gather(live_ref, slotT, maskT, tab_ref, scr_ref, *, n_rows, D,
                 CB, NCH, base0):
    """Chunk-skipped camera GATHER, the dual of `_skip_scatter`: fill the
    (D*n_rows, TP) scratch with per-slot rows from the VMEM-resident
    (n_rows, NCH*CB) table (column j = camera base0+j), building (CB, TP)
    one-hots only for live chunks.  This replaces the per-pass XLA
    `slot_major` takes of old pregather mode — (rows*D, P_pad) HBM
    round-trips per kernel pass (75 MB/LM-iteration for setup's 39 rows at
    C=1000) — with resident tables of a few hundred KB.  pl.when can't
    yield values, so the gather accumulates into scratch (zeroed first;
    masked one-hots make dead/out-of-window slots read exact zeros)."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    scr_ref[:] = jnp.zeros_like(scr_ref)   # scratch persists across tiles
    for ci in range(NCH):
        @pl.when(live_ref[i * NCH + ci] > 0)
        def _(ci=ci):
            tc = tab_ref[:, ci * CB:(ci + 1) * CB]           # (n_rows, CB)
            for d in range(D):
                oh = _slot_onehot(slotT[d:d + 1, :], maskT[d:d + 1, :], CB,
                                  base=base0 + ci * CB)
                sl = slice(d * n_rows, (d + 1) * n_rows)
                scr_ref[sl, :] = scr_ref[sl, :] + _dotCP(tc, oh)


def _vinv_apply(VinvT, q):
    """(6, TP) packed symmetric 3x3 inverse applied to q rows [3 x (1, TP)]."""
    v00, v01, v02 = VinvT[0:1, :], VinvT[1:2, :], VinvT[2:3, :]
    v11, v12, v22 = VinvT[3:4, :], VinvT[4:5, :], VinvT[5:6, :]
    return [v00 * q[0] + v01 * q[1] + v02 * q[2],
            v01 * q[0] + v11 * q[1] + v12 * q[2],
            v02 * q[0] + v12 * q[1] + v22 * q[2]]


def _coupling_body(Y_ref, Vinv_ref, slotT, maskT, fetch_x, *, C, D,
                   n_fixed, CB, backsub, zp_ref=None):
    """Shared math of the matvec and backsub kernels.

    ``fetch_x(d) -> (6, TP)`` supplies slot d's camera vector x (one-hot
    gather in gather mode, pre-gathered slice in pregather mode; fixed
    cameras read zero rows either way).

    matvec:  returns (6, C_adj) contribution  W V^-1 W^T x   (lane-reduced,
        cameras on lanes — see _scatter_chunks on the orientation)
    backsub: returns (3, TP) rows  dp = -(z_p + V^-1 W^T x)
    """
    C_adj = max(C - n_fixed, 1)

    def slot_Y(d):
        return [[Y_ref[d * 18 + i * 3 + l:d * 18 + i * 3 + l + 1, :]
                 for l in range(3)] for i in range(6)]

    q = [0.0, 0.0, 0.0]
    stash = []
    for d in range(D):
        xs = fetch_x(d)                                      # (6, TP)
        Y = slot_Y(d)
        for l in range(3):
            q[l] = q[l] + sum(Y[i][l] * xs[i:i + 1, :] for i in range(6))
        stash.append(Y)
    z = _vinv_apply(Vinv_ref[:], q)
    if backsub:
        zp = zp_ref[:]
        return jnp.concatenate(
            [-(zp[l:l + 1, :] + z[l]) for l in range(3)], axis=0)
    out = 0.0
    for d in range(D):
        Y = stash[d]
        w2 = jnp.concatenate(
            [Y[i][0] * z[0] + Y[i][1] * z[1] + Y[i][2] * z[2]
             for i in range(6)], axis=0)                     # (6, TP)
        out = _scatter_chunks(slotT, maskT, w2, out, d=d, C_adj=C_adj,
                              n_fixed=n_fixed, CB=CB)
    return out


def _x_gather_fetch(x_ref, slot_ref, mask_ref, *, C):
    def fetch_x(d):
        oh = _slot_onehot(slot_ref[d:d + 1, :], mask_ref[d:d + 1, :], C)
        return _dotCP(x_ref[:], oh)
    return fetch_x


def _x_pre_fetch(xg_ref):
    def fetch_x(d):
        return xg_ref[d * 6:(d + 1) * 6, :]
    return fetch_x


def _matvec_kernel_gather(Y_ref, Vinv_ref, slot_ref, mask_ref, x_ref,
                          out_ref, *, C, D, n_fixed, CB):
    fetch_x = _x_gather_fetch(x_ref, slot_ref, mask_ref, C=C)
    _matvec_common(Y_ref, Vinv_ref, slot_ref, mask_ref, fetch_x, out_ref,
                   C=C, D=D, n_fixed=n_fixed, CB=CB)


def _matvec_common(Y_ref, Vinv_ref, slot_ref, mask_ref, fetch_x, out_ref,
                   *, C, D, n_fixed, CB):
    from jax.experimental import pallas as pl

    out = _coupling_body(Y_ref, Vinv_ref, slot_ref[:], mask_ref[:], fetch_x,
                         C=C, D=D, n_fixed=n_fixed, CB=CB, backsub=False)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] + out


def _matvec_kernel_pre_skip(live_ref, Y_ref, Vinv_ref, slot_ref, mask_ref,
                            x_ref, out_ref, xs_scr, *, C, D, n_fixed, CB,
                            NCH):
    """Pregather matvec, both sides chunk-skipped.

    The x GATHER reuses the scatter's chunk windows: x lives VMEM-resident
    as a tiny (6, NCH*CB) table (columns = adjusted camera index) and each
    live chunk's (CB, TP) one-hot doubles as the gather operand — this
    deletes the per-matvec XLA `slot_major` pre-gather, whose (D*6, P_pad)
    take was written to and re-read from HBM 8x per LM iteration (measured
    r05: 1.69 ms/matvec with it, 0.62 ms without).  base0=n_fixed is safe
    here (unlike setup/cost, which need base0=0): x rows for fixed cameras
    are zero anyway.  The w2 scatter rebuilds the same one-hots (cheap:
    ~2 VPU ops per (CB, TP) cell, live chunks only)."""
    slotT = slot_ref[:]
    maskT = mask_ref[:]
    _skip_gather(live_ref, slotT, maskT, x_ref, xs_scr, n_rows=6, D=D,
                 CB=CB, NCH=NCH, base0=n_fixed)

    def slot_Y(d):
        return [[Y_ref[d * 18 + i * 3 + l:d * 18 + i * 3 + l + 1, :]
                 for l in range(3)] for i in range(6)]

    q = [0.0, 0.0, 0.0]
    stash = []
    for d in range(D):
        xs = xs_scr[d * 6:(d + 1) * 6, :]
        Y = slot_Y(d)
        for l in range(3):
            q[l] = q[l] + sum(Y[i][l] * xs[i:i + 1, :] for i in range(6))
        stash.append(Y)
    z = _vinv_apply(Vinv_ref[:], q)
    w2 = [jnp.concatenate(
        [Y[i][0] * z[0] + Y[i][1] * z[1] + Y[i][2] * z[2]
         for i in range(6)], axis=0) for Y in stash]         # D x (6, TP)

    _skip_scatter(live_ref, slotT, maskT, lambda d: w2[d],
                  out_ref, n_rows=6, D=D, n_fixed=n_fixed, CB=CB, NCH=NCH)


def _backsub_kernel_gather(Y_ref, Vinv_ref, zp_ref, slot_ref, mask_ref,
                           x_ref, dp_out, *, C, D, n_fixed, CB):
    fetch_x = _x_gather_fetch(x_ref, slot_ref, mask_ref, C=C)
    dp_out[:] = _coupling_body(Y_ref, Vinv_ref, slot_ref[:], mask_ref[:],
                               fetch_x, C=C, D=D, n_fixed=n_fixed, CB=CB,
                               backsub=True, zp_ref=zp_ref)


def _backsub_kernel_skipg(live_ref, Y_ref, Vinv_ref, zp_ref, slot_ref,
                          mask_ref, x_ref, dp_out, x_scr,
                          *, C, D, n_fixed, CB, NCH):
    """Chunked-gather backsub: x fetched in-kernel from the resident
    (6, NCH*CB) adjusted-column table (fixed/dead slots read zeros via the
    masked one-hot + pad_x), then dp = -(z_p + V^-1 W^T x)."""
    _skip_gather(live_ref, slot_ref[:], mask_ref[:], x_ref, x_scr,
                 n_rows=6, D=D, CB=CB, NCH=NCH, base0=n_fixed)
    fetch_x = _x_pre_fetch(x_scr)
    dp_out[:] = _coupling_body(Y_ref, Vinv_ref, None, None, fetch_x,
                               C=C, D=D, n_fixed=n_fixed, CB=CB,
                               backsub=True, zp_ref=zp_ref)


def _cost_body(fetch, ptT, maskT, uvT, scal, *, D):
    delta = scal[0:1, 5:6]
    huber = 0.0
    sq = 0.0
    for d in range(D):
        Rg, tg = fetch(d)
        _, _, m, r = _slot_frame(Rg, tg, ptT, maskT, uvT, scal, d)
        for k in range(2):
            av = jnp.abs(r[k])
            quad = r[k] * r[k]
            lin = 2.0 * delta * av - delta * delta
            huber = huber + jnp.sum(jnp.where(av <= delta, quad, lin))
            sq = sq + jnp.sum(quad)
    return 0.5 * huber, sq


def _cost_kernel_gather(R_ref, tv_ref, pt_ref, slot_ref, mask_ref, uv_ref,
                        scal_ref, out_ref, *, C, D):
    def fetch(d):
        oh = _slot_onehot(slot_ref[d:d + 1, :], mask_ref[d:d + 1, :], C)
        return _dotCP(R_ref[:], oh), _dotCP(tv_ref[:], oh)

    _cost_common(fetch, pt_ref, mask_ref, uv_ref, scal_ref, out_ref, D=D)


def _cost_kernel_skipg(live_ref, camc_ref, pt_ref, slot_ref, mask_ref,
                       uv_ref, scal_ref, out_ref, cam_scr, *, C, D, CB, NCH):
    """Chunked-gather cost: camera rows (R, t = 12) from the resident
    (12, NCH*CB) raw-column table (base0=0 — fixed cameras project too)."""
    _skip_gather(live_ref, slot_ref[:], mask_ref[:], camc_ref, cam_scr,
                 n_rows=12, D=D, CB=CB, NCH=NCH, base0=0)

    def fetch(d):
        sl = cam_scr[d * 12:(d + 1) * 12, :]
        return sl[0:9, :], sl[9:12, :]

    _cost_common(fetch, pt_ref, mask_ref, uv_ref, scal_ref, out_ref, D=D)


def _cost_common(fetch, pt_ref, mask_ref, uv_ref, scal_ref, out_ref, *, D):
    from jax.experimental import pallas as pl

    huber, sq = _cost_body(fetch, pt_ref[:], mask_ref[:], uv_ref[:],
                           scal_ref[:], D=D)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2), 1)
    acc = jnp.where(lane == 0, huber, sq)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] + acc


# ---------------------------------------------------------------------------
# VMEM planning.
#
# Mosaic's scoped-VMEM limit is 16 MB on v5e; leave headroom for compiler
# temporaries the model below doesn't see.  (Round-3 shipped a hard-coded
# TP=1024 cost tile at C=1000 that overflowed to 19.23 MB on hardware —
# BENCH_r03 — because the table encoded two measured points, not the budget.)
# ---------------------------------------------------------------------------

_VMEM_BUDGET = 13 * (1 << 20)
_KERNEL_KINDS = ("setup", "matvec", "backsub", "cost")
# in-kernel gathers are cheap below this camera count; above it the gather
# one-hots' C·TP transients and O(C·D·P) matmul FLOPs both argue for the
# XLA pre-gather (measured crossover discussion in BASELINE.md)
_PREGATHER_MIN_C = 513
class Plan(NamedTuple):
    """One kernel's tile plan.  ``split`` only ever True for kind='setup'
    (the math+scatter kernel pair); pregather matvec always runs the
    chunk-skipped scatter."""
    tp: int
    cb: int
    pregather: bool
    split: bool = False


def _skip_cb(C_adj: int) -> int:
    """Chunk width for the skip-scatter kernels: 128 (exactly one MXU lane
    tile — smaller chunks pad to 128 lanes anyway) widened only to cap the
    static chunk loop at 16 (compile-time body size)."""
    cb = 128
    while -(-max(C_adj, 1) // cb) > 16:
        cb *= 2
    return cb


def _vmem_bytes(kind: str, C: int, D: int, TP: int,
                pregather: bool, CB: int) -> int:
    """Per-tile Mosaic working-set estimate (bytes).

    Gather mode is calibrated against measured scoped-VMEM footprints on
    v5e at C=1000, D=4:
      setup  TP=512  -> 21.95 MB (OOM)   TP=256 -> fits
      cost   TP=1024 -> 19.23 MB (OOM)   TP=256 -> fits
    charging one (C, TP) one-hot per construction *site* (Mosaic keeps the
    unrolled slot loop's values live).  Pregather mode replaces the gather
    sites with streamed input rows; only the (CB, TP) scatter chunks remain.
    """
    lane = C * TP * 4          # one (C, TP) gather one-hot
    # _scatter_chunks always materializes a FULL (CB, TP) chunk (one-hot
    # rows beyond C_adj are exact zeros but still built), so charge CB
    # as-is (ADVICE r04: min(CB, C) undercounts when CB = _ceil8(C) > C)
    chunk = CB * TP * 4        # one (CB, TP) scatter one-hot
    row = TP * 4               # one (1, TP) f32 row
    red_io = 64 * C * 4        # (54/6, C_adj) accumulators, sublane-padded
    if kind == "setup":
        stash = (22 * D + 54) * row           # w/r/jc/jp rows + scatter rows
        outs = (18 * D + 9) * row * 2         # Y/Vinv/zp tiles, dbl-buffered
        if pregather:
            return (D * chunk + 2 * 39 * D * row + stash + outs
                    + (4 * D + 8) * row + red_io)
        return (D + 3) * lane + D * chunk + stash + outs \
            + 39 * C * 4 + red_io
    # resident camera-row tables of the chunked-gather kernels: padded to
    # whole chunks, and nch <= 17 raw chunks by _skip_cb
    tab = lambda rows: rows * (min(17, -(-max(C, 1) // CB)) * CB) * 4
    # EMPIRICAL (r05, isolated matvec sweeps on v5e): chunked-gather
    # kernels fall off a ~5x performance cliff when C*TP crosses ~1.8M,
    # independent of CB and chunk count — e.g. (C=1792, TP=1024) runs
    # 0.67 ms/matvec while (C=1856, TP=1024) runs 3.2 ms, and C=2048 is
    # fast again at TP=512; staging the one-hots through an explicit
    # scratch does NOT remove it.  The boundary is exactly two (C, TP) f32
    # buffers hitting the 16 MB VMEM, so charge 2*C*TP*4 as the loops'
    # high-water; the planner then shrinks TP as C grows (TP=512 at
    # C=2048, 256 at 4096, 128 at 8192 — all measured fast)
    cliff = 2 * C * TP * 4
    if kind == "setup_math":
        # split-setup math half (chunked-gather only): no scatter chunks or
        # reduction accumulators; the raw (D*54, TP) row stream is an extra
        # double-buffered output; camera rows come from the resident
        # 39-row table via a few live one-hots into the (39*D, TP) scratch
        stash = (22 * D + 54) * row
        outs = (18 * D + 9 + 54 * D) * row * 2
        return tab(39) + 39 * D * row + cliff + stash + outs \
            + (4 * D + 8) * row
    if kind == "setup_scatter":
        # split-setup scatter half: rows input (dbl-buffered) + slot/mask +
        # the chunk-loop high-water + the resident chunk-stacked output
        # (nch <= 16 by _skip_cb)
        return (2 * 54 * D + 4 * D) * row + cliff + 16 * 54 * CB * 4
    if kind == "matvec":
        ys = (2 * 18 * D + 24) * row
        if pregather:
            # chunk-skipped gather+scatter: the chunk-loop high-water, the
            # xs scratch, and the resident x table + chunk-stacked output
            # (nch <= 16 by _skip_cb)
            return cliff + ys + 6 * D * row + 4 * D * row \
                + tab(6) + 16 * 6 * CB * 4
        return (D + 1) * lane + D * chunk + ys + 6 * C * 4 + red_io
    if kind == "backsub":
        ys = (2 * 18 * D + 30) * row
        if pregather:
            return cliff + ys + 6 * D * row + 4 * D * row + tab(6)
        return (D + 1) * lane + ys + 6 * C * 4
    assert kind == "cost"
    if pregather:
        return cliff + (12 * D + 4 * D + 16) * row + tab(12)
    return (D + 1) * lane + (4 * D + 16) * row + 12 * C * 4


def _ceil8(n):
    return -(-n // 8) * 8


def _plan(kind: str, C: int, D: int, pregather: bool | None = None):
    """Plan(TP, CB, pregather, split) maximizing the P-tile (then the
    scatter chunk) under the VMEM budget, or None if nothing fits.
    ``pregather=None`` picks the mode by size; passing a bool plans FOR
    that mode (so a forced mode gets tiles fitted to its own working set —
    ADVICE r04).  Pregather mode only pays off once the gather one-hots
    dominate; below _PREGATHER_MIN_C the proven gather kernels run with a
    single scatter chunk (identical to the r03-measured configs).

    GATHER mode (C < 513): the r03/r04-proven fused kernels — setup as one
    kernel pinned to a single full-width scatter chunk (its body is near
    the Mosaic compiler's complexity limit; a second scatter chunk inside
    it crashes the compiler, measured at C=1000 r04, compile-proven
    single-chunk boundary CB = 1024).

    CHUNKED-GATHER mode (pregather=True; auto at C >= 513): every kernel
    fetches camera rows in-kernel from small VMEM-resident tables and
    scatters via the chunk-SKIPPED one-hots (CB from `_skip_cb`: 128
    unless the 16-chunk cap widens it; per-tile live-chunk tables built at
    solve start).  Setup SPLITS into the math kernel (no C dependence in
    its body, compiles at any size) + the small `_scatter54_kernel`
    (multi-chunk scatter compiles there, like the matvec body) — which is
    what retires the r04 C<=1024 eligibility wall AND measured faster at
    C=1000 than the fused single-chunk setup (54 vs 50 it/s even before
    the in-kernel gathers)."""
    if pregather is None:
        pregather = C >= _PREGATHER_MIN_C
    if pregather:
        cb = _skip_cb(C)
        kinds = (("setup_math", "setup_scatter") if kind == "setup"
                 else (kind,))
        for tp in (1024, 512, 256, 128):
            if all(_vmem_bytes(k, C, D, tp, True, cb) <= _VMEM_BUDGET
                   for k in kinds):
                return Plan(tp, cb, True, kind == "setup")
        return None
    if kind == "setup":
        if _ceil8(C) > 1024:
            return None
        cbs = [_ceil8(C)]
    else:
        cap = min(512, _ceil8(C))
        cbs = sorted({cap, min(cap, 256), min(cap, 128)}, reverse=True)
    for tp in (1024, 512, 256, 128):
        for cb in cbs:
            if _vmem_bytes(kind, C, D, tp, False, cb) <= _VMEM_BUDGET:
                return Plan(tp, cb, False, False)
    return None


def _live_table(slotT, maskT, n_fixed, C_adj, TP, CB, P_pad):
    """(n_tiles * nch,) int32 live-chunk table for the skip-scatter kernels:
    entry t*nch + ci is 1 iff some masked slot in P-tile t scatters into
    camera chunk ci.  With camera-sorted points most tiles have 1-2 live
    chunks; loop-closure observations mark extra chunks live (exactness is
    theirs by construction — the kernel still scatters every live chunk)."""
    nch = _c_pad(C_adj, CB) // CB
    n_tiles = P_pad // TP
    adj = slotT - n_fixed                                    # (D, P_pad)
    valid = (maskT > 0) & (adj >= 0)
    ci = jnp.where(valid, adj // CB, 0)
    ti = jax.lax.broadcasted_iota(jnp.int32, slotT.shape, 1) // TP
    idx = jnp.where(valid, ti * nch + ci, n_tiles * nch)     # OOB => dropped
    return jnp.zeros((n_tiles * nch,), jnp.int32).at[
        idx.reshape(-1)].max(1, mode="drop")


def eligible_shape_global(C: int, D: int, n_fixed: int = 1) -> bool:
    """Shape-level gate (see kernel_eligible_global)."""
    if not (D <= 12 and 0 <= n_fixed < C and C <= 8192):
        return False
    return all(_plan(k, C, D) is not None for k in _KERNEL_KINDS)


def kernel_eligible_global(grid: ba_grid.BAProblemGrid, n_fixed: int = 1
                           ) -> bool:
    """Static gate: the kernels unroll the D slot loop (compile time) and
    every kernel's per-tile working set must fit Mosaic's scoped-VMEM budget
    (same estimate the tile planner uses).  Outside these bounds callers use
    the XLA grid/flat PCG paths."""
    P, D = grid.cam_slot.shape
    return eligible_shape_global(grid.rvecs.shape[0], D, n_fixed)


def admitted_shapes(D: int = 4) -> list:
    """Camera counts for the hardware compile smoke, DERIVED from the
    planner instead of a hand-kept list (VERDICT r04 #6: a hand-enumerated
    smoke can drift from the gate, re-admitting the r03/r04 bug class at
    the next boundary).  One representative C per distinct compile
    signature — per-kernel (TP, CB, pregather, split) — choosing the
    LARGEST C in each bucket (worst case for VMEM, table widths, and the
    chunk-loop unroll).  Widening a gate creates new signatures, which
    automatically widens the smoke."""
    sigs = {}
    for C in range(2, 8193):
        plans = [(k, _plan(k, C, D)) for k in _KERNEL_KINDS]
        if any(p is None for _, p in plans):
            continue
        # gather-mode CB is pinned to _ceil8(C) — same code structure at
        # every C, so it would create a spurious bucket per 8 cameras
        sig = tuple((k, p.tp, p.pregather, p.split)
                    + ((p.cb,) if p.pregather else ())
                    for k, p in plans)
        sigs[sig] = C          # ascending C: keeps the largest per bucket
    return sorted(sigs.values())


@functools.partial(
    jax.jit,
    static_argnames=("n_fixed", "max_iterations", "huber_delta",
                     "lambda_init", "lambda_up", "lambda_down", "lambda_min",
                     "lambda_max", "ftol", "xtol", "cg_iters", "cg_tol",
                     "cg_forcing", "interpret", "force_pregather"))
def ba_solve_global_pallas(
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
    cg_iters: int = 8,
    cg_tol: float = 1e-6,
    cg_forcing: bool = True,
    interpret: bool = False,
    force_pregather: bool | None = None,
):
    """Drop-in equivalent of ba_grid.ba_solve_grid's PCG path with the
    per-observation stages fused into Pallas kernels.  Returns
    (rvecs, tvecs, points, BAStats) exactly like ba_solve_grid.
    ``force_pregather`` overrides the size-based mode pick (testing)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = grid.rvecs.shape[0]
    C_adj = max(C - n_fixed, 1)
    P, D = grid.cam_slot.shape
    # a forced mode is planned FOR that mode, not retrofitted onto the
    # auto-picked mode's tiles (its working set differs — ADVICE r04)
    plans = {k: _plan(k, C, D, pregather=force_pregather)
             for k in _KERNEL_KINDS}
    if any(p is None for p in plans.values()):
        raise ValueError(
            f"global Pallas kernels ineligible at C={C}, D={D} "
            f"(force_pregather={force_pregather}): working set exceeds the "
            f"{_VMEM_BUDGET >> 20} MB scoped-VMEM budget at the minimum "
            "tile (gate with kernel_eligible_global)")
    # every tile divides the max (all powers of two) so one padded P works
    TP_max = max(p.tp for p in plans.values())
    P_pad = -(-P // TP_max) * TP_max
    pad = P_pad - P

    # sort points by owning camera (min live slot; dead points last) so each
    # P-tile's slots span a narrow camera range — the skip-scatter kernels'
    # live-chunk tables then mark ~1-2 of nch chunks per tile, deleting the
    # dead one-hot constructions that dominated the r04 matvec.  The
    # permutation is INTERNAL: points return in input order below.
    own = jnp.min(jnp.where(grid.mask > 0, grid.cam_slot, C + 1), axis=1)
    own = jnp.where(grid.point_mask, own, C + 1)
    perm = jnp.argsort(own)

    ptT0 = jnp.pad(grid.points.astype(jnp.float32)[perm],
                   ((0, pad), (0, 0))).T
    slotT = jnp.pad(grid.cam_slot[perm], ((0, pad), (0, 0))).T
    maskT = jnp.pad(grid.mask.astype(jnp.float32)[perm],
                    ((0, pad), (0, 0))).T
    uvT = jnp.pad(grid.uv.astype(jnp.float32)[perm],
                  ((0, pad), (0, 0), (0, 0))).transpose(1, 2, 0).reshape(
                      2 * D, P_pad)
    pmaskT = jnp.pad(grid.point_mask.astype(jnp.float32)[perm],
                     (0, pad))[None, :]

    # per-tile live-chunk tables for the skip gather/scatter kernels (slot/
    # mask never change during the solve, so these are loop invariants).
    # GATHER tables cover raw camera columns [0, C) (fixed cameras must be
    # fetched); SCATTER (and x-fetch) tables cover adjusted columns
    # [n_fixed, C).
    def live_raw(kind):
        p = plans[kind]
        return _live_table(slotT, maskT, 0, C, p.tp, p.cb, P_pad)

    def live_adj(kind):
        p = plans[kind]
        return _live_table(slotT, maskT, n_fixed, C_adj, p.tp, p.cb, P_pad)

    live_mv = live_bs = live_cost = live_sg = live_ss = None
    if plans["matvec"].pregather:
        live_mv = live_adj("matvec")
        live_bs = live_adj("backsub")
        live_cost = live_raw("cost")
    if plans["setup"].split:
        live_sg = live_raw("setup")
        live_ss = live_adj("setup")

    def cam_table(rowsC, cb):
        """(rows, C) camera-row table -> VMEM-resident (rows, nchg*cb)."""
        nchg = _c_pad(C, cb) // cb
        return jnp.pad(rowsC, ((0, 0), (0, nchg * cb - C)))

    def scal_row(lam):
        # built in XLA (outside the kernels), so a plain stack is fine
        return jnp.stack(
            [grid.K[0, 0], grid.K[1, 1], grid.K[0, 2], grid.K[1, 2],
             lam, jnp.float32(huber_delta), jnp.float32(0), jnp.float32(0)]
        ).astype(jnp.float32)[None, :]

    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))

    def tile_for(kind):
        p = plans[kind]
        tiled = lambda rows, tp=p.tp: pl.BlockSpec((rows, tp),
                                                   lambda i: (0, i))
        return tiled, P_pad // p.tp, p.cb, p.pregather

    def run_setup(R_rows, dR_rows, tvT, ptT, lam):
        tiled, n_tiles, cb, pre = tile_for("setup")
        nch = _c_pad(C_adj, cb) // cb
        if plans["setup"].split:
            tp = plans["setup"].tp
            nchg = _c_pad(C, cb) // cb
            camT = cam_table(
                jnp.concatenate([R_rows, dR_rows, tvT], axis=0), cb)
            gtiled = lambda rows: pl.BlockSpec(
                (rows, tp), lambda i, live: (0, i))
            gfull = lambda a, b: pl.BlockSpec((a, b),
                                              lambda i, live: (0, 0))
            math_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[gfull(39, nchg * cb), gtiled(3), gtiled(D),
                          gtiled(D), gtiled(2 * D), gtiled(1), gfull(1, 8)],
                out_specs=(gtiled(D * 18), gtiled(6), gtiled(3),
                           gtiled(D * _RED_COLS)),
                scratch_shapes=[pltpu.VMEM((39 * D, tp), jnp.float32)],
            )
            YT, VinvT, zpT, rowsT = pl.pallas_call(
                functools.partial(_setup_math_kernel_skipg, C=C, D=D,
                                  n_fixed=n_fixed, CB=cb, NCH=nchg),
                grid_spec=math_spec,
                out_shape=(
                    jax.ShapeDtypeStruct((D * 18, P_pad), jnp.float32),
                    jax.ShapeDtypeStruct((6, P_pad), jnp.float32),
                    jax.ShapeDtypeStruct((3, P_pad), jnp.float32),
                    jax.ShapeDtypeStruct((D * _RED_COLS, P_pad),
                                         jnp.float32),
                ),
                interpret=interpret,
            )(live_sg, camT, ptT, slotT, maskT, uvT, pmaskT, scal_row(lam))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[gtiled(D * _RED_COLS), gtiled(D), gtiled(D)],
                out_specs=pl.BlockSpec((nch * _RED_COLS, cb),
                                       lambda i, live: (0, 0)),
            )
            redT = pl.pallas_call(
                functools.partial(_scatter54_kernel, D=D, n_fixed=n_fixed,
                                  CB=cb, NCH=nch),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((nch * _RED_COLS, cb),
                                               jnp.float32),
                interpret=interpret,
            )(live_ss, rowsT, slotT, maskT)
            return YT, VinvT, zpT, redT
        out_specs = (tiled(D * 18), tiled(6), tiled(3),
                     full(nch * _RED_COLS, cb))
        out_shape = (
            jax.ShapeDtypeStruct((D * 18, P_pad), jnp.float32),
            jax.ShapeDtypeStruct((6, P_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, P_pad), jnp.float32),
            jax.ShapeDtypeStruct((nch * _RED_COLS, cb), jnp.float32),
        )
        return pl.pallas_call(
            functools.partial(_setup_kernel_gather, C=C, D=D,
                              n_fixed=n_fixed, CB=cb),
            grid=(n_tiles,),
            in_specs=[full(9, C), full(27, C), full(3, C), tiled(3),
                      tiled(D), tiled(D), tiled(2 * D), tiled(1), full(1, 8)],
            out_specs=out_specs, out_shape=out_shape,
            interpret=interpret,
        )(R_rows, dR_rows, tvT, ptT, slotT, maskT, uvT, pmaskT,
          scal_row(lam))

    def run_matvec(YT, VinvT, xT):
        tiled, n_tiles, cb, pre = tile_for("matvec")
        nch = _c_pad(C_adj, cb) // cb
        if pre:
            # x as a VMEM-resident (6, nch*CB) table in ADJUSTED camera
            # columns (xT already has zero rows for fixed cameras)
            xp = pad_x_adj(xT, nch * cb)
            tp = plans["matvec"].tp
            stiled = lambda rows: pl.BlockSpec(
                (rows, tp), lambda i, live: (0, i))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[stiled(D * 18), stiled(6), stiled(D), stiled(D),
                          pl.BlockSpec((6, nch * cb), lambda i, live: (0, 0))],
                out_specs=pl.BlockSpec((nch * 6, cb),
                                       lambda i, live: (0, 0)),
                scratch_shapes=[pltpu.VMEM((6 * D, tp), jnp.float32)],
            )
            return pl.pallas_call(
                functools.partial(_matvec_kernel_pre_skip, C=C, D=D,
                                  n_fixed=n_fixed, CB=cb, NCH=nch),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((nch * 6, cb), jnp.float32),
                interpret=interpret,
            )(live_mv, YT, VinvT, slotT, maskT, xp)
        return pl.pallas_call(
            functools.partial(_matvec_kernel_gather, C=C, D=D,
                              n_fixed=n_fixed, CB=cb),
            grid=(n_tiles,),
            in_specs=[tiled(D * 18), tiled(6), tiled(D), tiled(D),
                      full(6, C)],
            out_specs=full(nch * 6, cb),
            out_shape=jax.ShapeDtypeStruct((nch * 6, cb), jnp.float32),
            interpret=interpret,
        )(YT, VinvT, slotT, maskT, xT)

    def run_backsub(YT, VinvT, zpT, xT):
        tiled, n_tiles, cb, pre = tile_for("backsub")
        if pre:
            tp = plans["backsub"].tp
            nch = _c_pad(C_adj, cb) // cb
            xp = pad_x_adj(xT, nch * cb)
            gtiled = lambda rows: pl.BlockSpec(
                (rows, tp), lambda i, live: (0, i))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[gtiled(D * 18), gtiled(6), gtiled(3), gtiled(D),
                          gtiled(D),
                          pl.BlockSpec((6, nch * cb),
                                       lambda i, live: (0, 0))],
                out_specs=gtiled(3),
                scratch_shapes=[pltpu.VMEM((6 * D, tp), jnp.float32)],
            )
            return pl.pallas_call(
                functools.partial(_backsub_kernel_skipg, C=C, D=D,
                                  n_fixed=n_fixed, CB=cb, NCH=nch),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((3, P_pad), jnp.float32),
                interpret=interpret,
            )(live_bs, YT, VinvT, zpT, slotT, maskT, xp)
        return pl.pallas_call(
            functools.partial(_backsub_kernel_gather, C=C, D=D,
                              n_fixed=n_fixed, CB=cb),
            grid=(n_tiles,),
            in_specs=[tiled(D * 18), tiled(6), tiled(3), tiled(D),
                      tiled(D), full(6, C)],
            out_specs=tiled(3),
            out_shape=jax.ShapeDtypeStruct((3, P_pad), jnp.float32),
            interpret=interpret,
        )(YT, VinvT, zpT, slotT, maskT, xT)

    def run_cost(rv, tv, ptT):
        tiled, n_tiles, cb, pre = tile_for("cost")
        R_rows, _ = _rodrigues_rows(rv.T, want_jac=False)
        if pre:
            tp = plans["cost"].tp
            nchg = _c_pad(C, cb) // cb
            camcT = cam_table(jnp.concatenate([R_rows, tv.T], axis=0), cb)
            gtiled = lambda rows: pl.BlockSpec(
                (rows, tp), lambda i, live: (0, i))
            gfull = lambda a, b: pl.BlockSpec((a, b),
                                              lambda i, live: (0, 0))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[gfull(12, nchg * cb), gtiled(3), gtiled(D),
                          gtiled(D), gtiled(2 * D), gfull(1, 8)],
                out_specs=gfull(1, 2),
                scratch_shapes=[pltpu.VMEM((12 * D, tp), jnp.float32)],
            )
            out = pl.pallas_call(
                functools.partial(_cost_kernel_skipg, C=C, D=D, CB=cb,
                                  NCH=nchg),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
                interpret=interpret,
            )(live_cost, camcT, ptT, slotT, maskT, uvT,
              scal_row(jnp.float32(0)))
        else:
            out = pl.pallas_call(
                functools.partial(_cost_kernel_gather, C=C, D=D),
                grid=(n_tiles,),
                in_specs=[full(9, C), full(3, C), tiled(3), tiled(D),
                          tiled(D), tiled(2 * D), full(1, 8)],
                out_specs=full(1, 2),
                out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
                interpret=interpret,
            )(R_rows, tv.T, ptT, slotT, maskT, uvT, scal_row(jnp.float32(0)))
        return out[0, 0], out[0, 1]

    def pad_x(x):
        """(C_adj, 6) camera blocks -> (6, C) with zero rows for fixed."""
        xT = jnp.zeros((6, C), jnp.float32)
        return jax.lax.dynamic_update_slice(xT, x.T, (0, n_fixed))

    def pad_x_adj(xT, cols):
        """(6, C) x with zeroed fixed rows -> (6, cols) ADJUSTED-column
        table for the chunked x gathers (column j = camera n_fixed+j)."""
        xa = jax.lax.dynamic_slice(xT, (0, n_fixed), (6, C - n_fixed))
        return jnp.pad(xa, ((0, 0), (0, cols - (C - n_fixed))))

    eye6 = jnp.eye(6, dtype=jnp.float32)

    def solve_step(rv, tv, ptT, lam, tol):
        R_rows, dR_rows = _rodrigues_rows(rv.T, want_jac=True)
        YT, VinvT, zpT, redT = run_setup(R_rows, dR_rows, tv.T, ptT, lam)
        cb_s = plans["setup"][1]
        red = _unscramble_chunks(redT, _RED_COLS, C_adj, cb_s)  # (C_adj, 54)
        U = _unpack_sym6(red[:, _RED_U])
        g_c = red[:, _RED_GC]
        Wz = red[:, _RED_WZ]
        Dred = _unpack_sym6(red[:, _RED_DO])
        damp = lam * (jnp.abs(jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(U)))
                      + 1e-6 * eye6)
        U = U + damp
        b = -g_c + Wz
        Minv = ba_grid._inv6(U - Dred + 1e-8 * eye6)

        cb_m = plans["matvec"][1]

        def matvec(x):
            Ux = jnp.sum(U * x[:, None, :], axis=-1)
            WVWx = _unscramble_chunks(run_matvec(YT, VinvT, pad_x(x)),
                                      6, C_adj, cb_m)
            return Ux - WVWx

        dc = ba_flat._pcg_blocked(matvec, b, Minv, cg_iters, tol)
        dpT = run_backsub(YT, VinvT, zpT, pad_x(dc))
        d_r = jnp.zeros_like(rv).at[n_fixed:].set(dc[: C - n_fixed, :3])
        d_t = jnp.zeros_like(tv).at[n_fixed:].set(dc[: C - n_fixed, 3:])
        return d_r, d_t, dpT, jnp.sqrt(jnp.sum(b * b))

    init_cost, init_sq = run_cost(grid.rvecs.astype(jnp.float32),
                                  grid.tvecs.astype(jnp.float32), ptT0)

    def cond(s):
        return (~s[6]) & (s[5] < max_iterations)

    def body(s):
        rv, tv, ptT, lam, cost, it, done, b0, blast = s
        if cg_forcing:
            tol = jnp.where(
                b0 > 0.0,
                jnp.clip(jnp.sqrt(blast / jnp.maximum(b0, 1e-30)),
                         cg_tol, 0.1),
                0.1)
        else:
            tol = jnp.float32(cg_tol)
        d_r, d_t, dpT, bnorm = solve_step(rv, tv, ptT, lam, tol)
        b0 = jnp.where(b0 > 0.0, b0, bnorm)
        blast = bnorm
        rv2, tv2, pt2 = rv + d_r, tv + d_t, ptT + dpT
        new_cost, _ = run_cost(rv2, tv2, pt2)
        accept = new_cost < cost
        step_norm = jnp.sqrt(jnp.sum(d_r * d_r) + jnp.sum(d_t * d_t)
                             + jnp.sum(dpT * dpT))
        param_norm = jnp.sqrt(jnp.sum(rv * rv) + jnp.sum(tv * tv)
                              + jnp.sum(ptT * ptT))
        converged = accept & (
            ((cost - new_cost) <= ftol * jnp.maximum(cost, 1e-12))
            | (step_norm <= xtol * (param_norm + xtol))
        )
        rv = jnp.where(accept, rv2, rv)
        tv = jnp.where(accept, tv2, tv)
        ptT = jnp.where(accept, pt2, ptT)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * lambda_down, lambda_min),
                        jnp.minimum(lam * lambda_up, lambda_max))
        stuck = (~accept) & (lam >= lambda_max)
        return (rv, tv, ptT, lam, cost, it + 1, converged | stuck, b0, blast)

    lam0 = jnp.float32(lambda_init)
    neg1 = jnp.float32(-1.0)
    rv, tv, ptT, lam, cost, it, _, _, _ = jax.lax.while_loop(
        cond, body,
        (grid.rvecs.astype(jnp.float32), grid.tvecs.astype(jnp.float32),
         ptT0, lam0, init_cost, 0, False, neg1, neg1),
    )
    _, final_sq = run_cost(rv, tv, ptT)
    stats = ba_flat.BAStats(
        initial_cost=init_cost, final_cost=cost,
        initial_sq=init_sq, final_sq=final_sq,
        iterations=it, accepted=cost < init_cost,
    )
    # undo the internal camera-sort: row i of the output = input point i
    pts_sorted = ptT.T[:P]
    pts = jnp.zeros_like(pts_sorted).at[perm].set(pts_sorted)
    return rv, tv, pts, stats
