"""Per-stage roofline breakdown of one BA LM iteration (VERDICT r1 weak #2:
"no speed-of-light evidence for BA").

Times each stage of the observation-grid LM step in isolation with the same
scanned K-minus-1 marginal protocol bench.py uses (one dispatch chaining K
data-dependent evaluations, so neither tunnel round trips nor async-dispatch
overlap distort the number), and reports XLA's own FLOP estimate per stage so
the gap between achieved and peak is attributable: the window problem is
op-overhead/latency-bound, not FLOP-bound — the interesting number is
microseconds, and which stage owns them.

Stages (ops/ba_grid.py):
  terms     — residuals + analytic Jacobians               (_grid_terms)
  assemble  — Huber weights, U/V/g/Y/B einsum reductions
  schur     — V^-1 elimination + MXU Schur contraction -> S, b
  solve     — dense (6C')x(6C') jnp.linalg.solve
  backsub   — point back-substitution
  cost      — trial-point cost evaluation
  full      — one complete _solve_step + cost (the LM-iteration unit)

    python tools/profile_ba.py            # real TPU
    python tools/profile_ba.py --cpu      # functional check
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def marginal_time(run, k_hi=64, repeats=5):
    import jax

    def best_of(k):
        out = run(k)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = run(k)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    d1 = best_of(1)
    dK = best_of(k_hi)
    return (dK - d1) / (k_hi - 1)


def stage_flops(fn, *args):
    """XLA's FLOP estimate for one evaluation of fn."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def scan_chain_of(step, init, perturb):
    """Chain k data-dependent evaluations of ``step`` in ONE dispatch."""
    import jax

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(x0, iters):
        def body(carry, _):
            out = step(carry)
            return perturb(carry, out), None
        carry, _ = jax.lax.scan(body, x0, None, length=iters)
        return carry
    return lambda k: chain(init, iters=k)


def main_global(args):
    """Stage breakdown of the GLOBAL-scale grid PCG LM step
    (ops/ba_grid._solve_step_pcg) at C=200/P=30k/O=120k — the numbers behind
    the batched-tiny-einsum elimination and the measured CG cap (config.py
    BAConfig.cg_iters).  Stages: terms (residuals+Jacobians), gathers (the
    small-table camera-state gathers inside terms, isolated), setup (Hessian
    blocks U/V/Y, gradient, rhs), precond (block-Jacobi 6x6 diagonal of S),
    matvec (one PCG application), cost (trial-point evaluation)."""
    import jax
    import jax.numpy as jnp

    import bench
    from bundle_adjustment_tpu.ops import ba as ba_flat
    from bundle_adjustment_tpu.ops import ba_grid
    from bundle_adjustment_tpu.ops.lie import so3_exp

    H = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(11)
    prob = bench.make_global_problem(
        rng, C=args.cams, P=args.points, obs_per_pt=args.obs_per_pt)
    grid = ba_grid.from_flat(prob)
    n_fixed = 1
    C = grid.rvecs.shape[0]
    C_adj = C - n_fixed
    P, D = grid.cam_slot.shape
    onehot_T = jnp.asarray(
        (np.arange(C_adj)[:, None]
         == (np.asarray(grid.cam_slot).reshape(-1)[None, :] - n_fixed)
         ).astype(np.float32))
    lam = jnp.float32(1e-3)
    eps = 1e-12
    stages = {}

    def f_terms(pt):
        return ba_grid._grid_terms(grid.rvecs, grid.tvecs, pt, grid)

    r0, Jc0, Jp0 = jax.jit(lambda: f_terms(grid.points))()
    stages["terms"] = marginal_time(scan_chain_of(
        f_terms, grid.points, lambda pt, out: pt + eps * jnp.sum(out[0])),
        k_hi=16)

    def f_gather(rv):
        Rs = jax.vmap(so3_exp)(rv)
        dRdr = jax.vmap(jax.jacfwd(so3_exp))(rv)
        return (Rs[grid.cam_slot], grid.tvecs[grid.cam_slot],
                dRdr[grid.cam_slot])
    stages["terms_gathers_only"] = marginal_time(scan_chain_of(
        f_gather, grid.rvecs,
        lambda rv, out: rv + eps * jnp.sum(out[0][:, :1])), k_hi=16)

    def cam_reduce(rows):
        flat = rows.reshape(P * D, -1)
        return (onehot_T @ flat).reshape((C_adj,) + rows.shape[2:])

    def f_setup(r):
        a = jnp.abs(r)
        w = jnp.where(a <= 1.0, 1.0, 1.0 / jnp.maximum(a, 1e-12)) \
            * grid.mask[..., None]
        cam_ok = (grid.cam_slot >= n_fixed).astype(r.dtype)[..., None, None]
        Jc = Jc0 * cam_ok
        Jc_w = Jc * w[..., None]
        U = cam_reduce(ba_grid._jtj(Jc, Jc, w))
        g_c = cam_reduce(jnp.sum(Jc_w * r[..., None], axis=-2))
        V = jnp.sum(ba_grid._jtj(Jp0, Jp0, w), axis=1)
        g_p = jnp.sum(Jp0 * w[..., None] * r[..., None], axis=(1, 2))
        Y = ba_grid._jtj(Jc, Jp0, w)
        eyec = jnp.eye(6, dtype=U.dtype)
        eyep = jnp.eye(3, dtype=V.dtype)
        U = U + lam * (jnp.abs(jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(U)))
                       + 1e-6 * eyec)
        V = V + lam * (jnp.abs(jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(V)))
                       + 1e-6 * eyep)
        Vinv = ba_flat._inv3(V)
        Vinv = jnp.where(grid.point_mask[:, None, None], Vinv, 0.0)
        z_p = ba_grid._mv(Vinv, g_p)
        Wz = cam_reduce(jnp.sum(Y * z_p[:, None, None, :], axis=-1))
        b = -g_c + Wz
        return U, Vinv, Y, b, g_p

    U0, Vinv0, Y0, b0, gp0 = jax.jit(lambda: f_setup(r0))()
    stages["setup"] = marginal_time(scan_chain_of(
        f_setup, r0, lambda r, out: r + eps * out[3][:1, :2][None]), k_hi=16)

    def f_precond(Y):
        YV = ba_grid._mm(Y, Vinv0[:, None])
        D_o = jnp.sum(YV[..., :, None, :] * Y[..., None, :, :], axis=-1)
        Dred = cam_reduce(D_o)
        return ba_grid._inv6(U0 - Dred + 1e-8 * jnp.eye(6, dtype=U0.dtype))
    stages["precond"] = marginal_time(scan_chain_of(
        f_precond, Y0, lambda Y, out: Y + eps * jnp.sum(out)), k_hi=16)

    g = 16  # grouped block-Jacobi (config.ba.cg_precond_group bench setting)
    nG = -(-C_adj // g)
    pad_n = nG * g - C_adj

    def f_precond_grouped(Y):
        YV = ba_grid._mm(Y, Vinv0[:, None])
        rows = ba_grid._group_precond_rows(Y, YV, grid.cam_slot, n_fixed, g)
        red = cam_reduce(rows).reshape(C_adj, g, 6, 6)
        eye6 = jnp.eye(6, dtype=U0.dtype)
        Ud = jnp.concatenate(
            [U0, jnp.broadcast_to(eye6, (pad_n, 6, 6))], axis=0) \
            if pad_n else U0
        grp = jnp.concatenate(
            [red, jnp.zeros((pad_n, g, 6, 6), red.dtype)], axis=0) \
            if pad_n else red
        Mg = -grp.reshape(nG, g, g, 6, 6)
        di = jnp.arange(g)
        Mg = Mg.at[:, di, di].add(Ud.reshape(nG, g, 6, 6))
        M = Mg.transpose(0, 1, 3, 2, 4).reshape(nG, 6 * g, 6 * g)
        return jnp.linalg.inv(M + 1e-8 * jnp.eye(6 * g, dtype=M.dtype))
    Minv_g0 = jax.jit(lambda: f_precond_grouped(Y0))()
    stages["precond_grouped_build"] = marginal_time(scan_chain_of(
        f_precond_grouped, Y0, lambda Y, out: Y + eps * jnp.sum(out)),
        k_hi=16)

    def f_precond_grouped_apply(rr):
        rp = jnp.concatenate([rr, jnp.zeros((pad_n, 6), rr.dtype)], axis=0) \
            if pad_n else rr
        z = ba_grid._mv(Minv_g0, rp.reshape(nG, 6 * g))
        return z.reshape(nG * g, 6)[:C_adj]
    stages["precond_grouped_apply"] = marginal_time(scan_chain_of(
        f_precond_grouped_apply, b0, lambda x, out: out), k_hi=64)

    pad = jnp.zeros((n_fixed, 6), U0.dtype)

    def f_matvec(x):
        xs = jnp.concatenate([pad, x], axis=0)[grid.cam_slot]
        y = jnp.sum(Y0 * xs[..., None], axis=-2)
        q = jnp.sum(y, axis=1)
        z = ba_grid._mv(Vinv0, q)
        w2 = jnp.sum(Y0 * z[:, None, None, :], axis=-1)
        return ba_grid._mv(U0, x) - cam_reduce(w2)
    stages["matvec"] = marginal_time(scan_chain_of(
        f_matvec, b0, lambda x, out: out), k_hi=64)

    def f_cost(pt):
        r, _, _ = ba_grid._grid_terms(grid.rvecs, grid.tvecs, pt, grid)
        return jnp.sum(r * r)
    stages["cost"] = marginal_time(scan_chain_of(
        f_cost, grid.points, lambda pt, out: pt + eps * out), k_hi=16)

    out = {
        "metric": "ba_global_pcg_breakdown",
        "problem": f"C={args.cams} P={args.points} D<={args.obs_per_pt}",
        "backend": jax.default_backend(),
        "stage_us": {k: round(v * 1e6, 1) for k, v in stages.items()},
        "per_lm_iter_fixed_us": round(
            (stages["terms"] + stages["setup"] + stages["precond"]
             + stages["cost"]) * 1e6, 1),
        "per_cg_iter_us": round(stages["matvec"] * 1e6, 1),
    }
    print(json.dumps(out, indent=2))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--global-pcg", action="store_true",
                    help="profile the global-scale grid PCG stages instead "
                         "of the window-scale dense step")
    ap.add_argument("--cams", type=int, default=6)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--obs-per-pt", type=int, default=4)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))

    if getattr(args, "global_pcg", False):
        if args.cams == 6:  # window default -> global default
            args.cams, args.points = 200, 30000
        return main_global(args)

    import jax.numpy as jnp

    import bench
    from bundle_adjustment_tpu.ops import ba_grid

    bench._C, bench._P, bench._OBS_PER_PT = (
        args.cams, args.points, args.obs_per_pt)
    rng = np.random.default_rng(7)
    prob, _ = bench.make_window_problem(rng)
    grid = ba_grid.from_flat(prob)
    n_fixed = 1
    C = grid.rvecs.shape[0]
    C_adj = C - n_fixed
    n = C_adj * 6
    onehot = (np.asarray(grid.cam_slot)[..., None] - n_fixed
              == np.arange(C_adj)[None, None, :]).astype(np.float32)
    onehot = jnp.asarray(onehot)
    lam = jnp.float32(1e-3)

    # ---- stage functions (each returns arrays that feed the next) ---------
    def f_terms(rv, tv, pt):
        return ba_grid._grid_terms(rv, tv, pt, grid)

    r0, Jc0, Jp0 = jax.jit(f_terms)(grid.rvecs, grid.tvecs, grid.points)

    def f_assemble(r, Jc, Jp):
        from bundle_adjustment_tpu.ops import ba as ba_flat
        a = jnp.abs(r)
        w = jnp.where(a <= 1.0, 1.0, 1.0 / jnp.maximum(a, 1e-12)) \
            * grid.mask[..., None]
        cam_ok = (grid.cam_slot >= n_fixed).astype(r.dtype)[..., None, None]
        Jc = Jc * cam_ok
        Jc_w = Jc * w[..., None]
        Jp_w = Jp * w[..., None]
        H = jax.lax.Precision.HIGHEST
        U = jnp.einsum("pdc,pdki,pdkj->cij", onehot, Jc_w, Jc, precision=H)
        g_c = jnp.einsum("pdc,pdki,pdk->ci", onehot, Jc_w, r, precision=H)
        V = jnp.einsum("pdki,pdkj->pij", Jp_w, Jp, precision=H)
        g_p = jnp.einsum("pdki,pdk->pi", Jp_w, r, precision=H)
        Y = jnp.einsum("pdki,pdkj->pdij", Jc_w, Jp, precision=H)
        B = jnp.einsum("pdc,pdij->pcij", onehot, Y, precision=H)
        return U, g_c, V, g_p, B

    U0, gc0, V0, gp0, B0 = jax.jit(f_assemble)(r0, Jc0, Jp0)

    def f_schur(U, g_c, V, g_p, B):
        from bundle_adjustment_tpu.ops import ba as ba_flat
        H = jax.lax.Precision.HIGHEST
        eyec = jnp.eye(6, dtype=U.dtype)
        eyep = jnp.eye(3, dtype=V.dtype)
        Ud = U + lam * (jnp.abs(jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(U)))
                        + 1e-6 * eyec)
        Vd = V + lam * (jnp.abs(jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(V)))
                        + 1e-6 * eyep)
        Vinv = ba_flat._inv3(Vd)
        Vinv = jnp.where(grid.point_mask[:, None, None], Vinv, 0.0)
        BV = jnp.einsum("pcik,pkl->pcil", B, Vinv, precision=H)
        S = -jnp.einsum("pcil,pdjl->cidj", BV, B, precision=H).reshape(n, n)
        idx = jnp.arange(C_adj)
        Ub = jnp.zeros((C_adj, 6, C_adj, 6), U.dtype).at[idx, :, idx, :].set(Ud)
        S = S + Ub.reshape(n, n)
        z_p = jnp.einsum("pij,pj->pi", Vinv, g_p, precision=H)
        Wz = jnp.einsum("pcij,pj->ci", B, z_p, precision=H)
        b = (-g_c + Wz).reshape(n)
        return S, b, Vinv

    S0, b0, Vinv0 = jax.jit(f_schur)(U0, gc0, V0, gp0, B0)

    def f_solve(S, b):
        return jnp.linalg.solve(S + 1e-8 * jnp.eye(n, dtype=S.dtype), b)

    dc0 = jax.jit(f_solve)(S0, b0)

    def f_backsub(dc, B, Vinv, g_p):
        H = jax.lax.Precision.HIGHEST
        dcb = dc.reshape(C_adj, 6)
        Wt = jnp.einsum("pcij,ci->pj", B, dcb, precision=H)
        return jnp.einsum("pij,pj->pi", Vinv, -g_p - Wt, precision=H)

    def f_cost(rv, tv, pt):
        r, _, _ = ba_grid._grid_terms(rv, tv, pt, grid)
        return jnp.sum(r * r)

    def f_full(rv, tv, pt):
        d_r, d_t, d_p = ba_grid._solve_step(
            rv, tv, pt, grid, lam, 1.0, n_fixed, onehot)
        r, _, _ = ba_grid._grid_terms(rv + d_r, tv + d_t, pt + d_p, grid)
        return jnp.sum(r * r)

    # ---- scanned marginal timing per stage ---------------------------------
    def scan_chain(step, init, perturb):
        """Chain k data-dependent evaluations of ``step`` in ONE dispatch."""
        @functools.partial(jax.jit, static_argnames=("iters",))
        def chain(x0, iters):
            def body(carry, _):
                out = step(carry)
                return perturb(carry, out), None
            carry, _ = jax.lax.scan(body, x0, None, length=iters)
            return carry
        return lambda k: chain(init, iters=k)

    eps = 1e-12  # keep the chain data-dependent but numerically a no-op

    stages = {}

    stages["terms"] = marginal_time(scan_chain(
        lambda pt: f_terms(grid.rvecs, grid.tvecs, pt),
        grid.points,
        lambda pt, out: pt + eps * jnp.sum(out[0])))

    stages["assemble"] = marginal_time(scan_chain(
        lambda r: f_assemble(r, Jc0, Jp0),
        r0,
        lambda r, out: r + eps * out[3][:, None, :2]))

    stages["schur"] = marginal_time(scan_chain(
        lambda U: f_schur(U, gc0, V0, gp0, B0),
        U0,
        lambda U, out: U + eps * out[0][:6, :6].reshape(1, 6, 6)))

    stages["solve"] = marginal_time(scan_chain(
        lambda b: f_solve(S0, b),
        b0,
        lambda b, out: b + eps * out))

    stages["backsub"] = marginal_time(scan_chain(
        lambda dc: f_backsub(dc, B0, Vinv0, gp0),
        dc0,
        lambda dc, out: dc + eps * jnp.sum(out)))

    stages["cost"] = marginal_time(scan_chain(
        lambda pt: f_cost(grid.rvecs, grid.tvecs, pt),
        grid.points,
        lambda pt, out: pt + eps * out))

    stages["full_lm_iter"] = marginal_time(scan_chain(
        lambda pt: f_full(grid.rvecs, grid.tvecs, pt),
        grid.points,
        lambda pt, out: pt + eps * out))

    flops = {}
    flops["terms"], _ = stage_flops(f_terms, grid.rvecs, grid.tvecs, grid.points)
    flops["assemble"], _ = stage_flops(f_assemble, r0, Jc0, Jp0)
    flops["schur"], _ = stage_flops(f_schur, U0, gc0, V0, gp0, B0)
    flops["solve"], _ = stage_flops(f_solve, S0, b0)
    flops["backsub"], _ = stage_flops(f_backsub, dc0, B0, Vinv0, gp0)
    flops["cost"], _ = stage_flops(f_cost, grid.rvecs, grid.tvecs, grid.points)
    flops["full_lm_iter"], _ = stage_flops(
        f_full, grid.rvecs, grid.tvecs, grid.points)

    peak = __import__("bench").device_peak_flops()
    out = {
        "metric": "ba_lm_iteration_breakdown",
        "problem": f"C={args.cams} P={args.points} D<={args.obs_per_pt}",
        "backend": jax.default_backend(),
        "stage_us": {k: round(v * 1e6, 1) for k, v in stages.items()},
        "stage_flops": {k: int(v) for k, v in flops.items()},
        "stage_mfu_pct": {
            k: round(100 * flops[k] / max(stages[k], 1e-12) / peak, 4)
            for k in stages},
        "sum_of_stages_us": round(
            sum(v for k, v in stages.items() if k != "full_lm_iter") * 1e6, 1),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
