"""Headline benchmark: BA iterations/s on TPU vs the scipy CPU baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The problem is the representative LBA window scale of the video configs:
6 cameras (1 gauge-fixed), 2048 map points, 8192 observations, 0.5 px noise —
the same synthetic problem the scipy baseline was measured on (see
BASELINE.md "CPU baseline numbers"; regenerate with --rebaseline, which runs
scipy least_squares with jac_sparsity/huber/max_nfev=50 exactly as the
reference does at src/bundle_adjuster.py:170-174).

A "BA iteration" is one damped normal-equations step: for us one LM
iteration (autodiff J + Schur + solve), for scipy one TRF Jacobian build
(njev).  Extra fields report the Hamming-matcher and frontend throughput.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# first compiles through a remote-compile tunnel can take minutes; persist
_JAX_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _JAX_CACHE_DIR)
# cache sub-second executables too — their sum is the cold start
# (utils/prewarm.py; VERDICT r04 #7)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

# scipy TRF on the identical problem, measured on this machine's CPU
# (njev per second; see BASELINE.md) — regenerate with --rebaseline
SCIPY_BASELINE_ITERS_PER_S = None  # filled by --rebaseline; see below
_BASELINE_FILE = "BASELINE_CPU.json"

_C, _P, _OBS_PER_PT = 6, 2048, 4
_K = np.array([[912.78, 0, 650.29], [0, 913.03, 362.72], [0, 0, 1.0]])


def make_window_problem(rng):
    from bundle_adjustment_tpu.ops import ba
    from bundle_adjustment_tpu.ops.lie import so3_exp_np

    X = rng.uniform([-4, -4, 4], [4, 4, 16], size=(_P, 3))
    rvecs = np.stack([[0.02 * c, -0.03 * c, 0.01 * c] for c in range(_C)])
    tvecs = np.stack([[0.3 * c, 0.05 * c, 0.02 * c] for c in range(_C)])

    cam_idx = np.empty(_P * _OBS_PER_PT, np.int32)
    pnt_idx = np.empty(_P * _OBS_PER_PT, np.int32)
    uv = np.empty((_P * _OBS_PER_PT, 2))
    o = 0
    for p in range(_P):
        for c in rng.choice(_C, size=_OBS_PER_PT, replace=False):
            R = so3_exp_np(rvecs[c])
            Xc = R @ X[p] + tvecs[c]
            uv[o] = (Xc[:2] / Xc[2]) * [_K[0, 0], _K[1, 1]] + [_K[0, 2], _K[1, 2]]
            uv[o] += rng.normal(size=2) * 0.5
            cam_idx[o], pnt_idx[o] = c, p
            o += 1

    rv_p = rvecs.copy()
    tv_p = tvecs.copy()
    rv_p[1:] += rng.normal(size=(_C - 1, 3)) * 0.01
    tv_p[1:] += rng.normal(size=(_C - 1, 3)) * 0.05
    X_p = X + rng.normal(size=X.shape) * 0.05

    prob = ba.BAProblem(
        rvecs=jnp.asarray(rv_p, jnp.float32),
        tvecs=jnp.asarray(tv_p, jnp.float32),
        points=jnp.asarray(X_p, jnp.float32),
        cam_idx=jnp.asarray(cam_idx),
        pnt_idx=jnp.asarray(pnt_idx),
        uv=jnp.asarray(uv, jnp.float32),
        obs_mask=jnp.ones(len(uv), jnp.float32),
        point_mask=jnp.ones(_P, bool),
        K=jnp.asarray(_K, jnp.float32),
    )
    return prob, (rvecs, tvecs, X, cam_idx, pnt_idx, uv)


def _marginal_estimate(timed_run, k_hi, repeats=10, passes=2):
    """K-minus-1 marginal protocol with a self-attested spread.

    ``timed_run(k)`` must issue ONE dispatch chaining ``k`` data-dependent
    iterations and block, returning the actual iteration count.  Per-call
    wall time through the device tunnel carries tens-of-ms round-trip jitter
    (BASELINE.md), so the signal ``t(K) - t(1)`` must dwarf it: callers pick
    ``k_hi`` so the device-time delta is >= ~100 ms.  min-of-``repeats``
    strips the positive-additive tunnel noise; the whole estimate is then
    repeated ``passes`` times and the relative spread across passes is
    reported alongside the point value (VERDICT r2 #1: numbers must
    reproduce, and say so)."""
    def best_of(k):
        timed_run(k)  # warm (compile / cache)
        best, it = float("inf"), 1
        for _ in range(repeats):
            t0 = time.perf_counter()
            it = timed_run(k)
            best = min(best, time.perf_counter() - t0)
        return best, it

    ests = []
    for _ in range(passes):
        d1, i1 = best_of(1)
        dK, iK = best_of(k_hi)
        ests.append((dK - d1) / max(iK - i1, 1))
    point = min(ests)
    spread = (max(ests) - min(ests)) / point if point > 0 else 0.0
    return point, spread


def bench_tpu_ba(prob):
    """Marginal cost per LM iteration, free of dispatch/sync artifacts.

    Measures BOTH window solvers: the XLA observation-grid solver and the
    fused Pallas LM kernel (ops/ba_pallas.py; TPU only).  The headline is the
    best available on this backend.

    Protocol: ONE dispatch scanning K data-dependent FULL 50-iteration solves
    (ftol=xtol=0 disables the convergence exits, and 50 iterations is too few
    for the rejected-at-lambda_max stop), minus a 1-solve dispatch, divided by
    the actual iteration-count delta read from the solver stats.  Raising the
    solver's own max_iterations instead does NOT work: once converged, LM
    rejects every step, lambda hits lambda_max after ~55 rejects and the loop
    exits — the span silently stops growing and the estimate drowns in tunnel
    jitter (the round-2 bench's 8-17x run-to-run swing, VERDICT r2 #1)."""
    from bundle_adjustment_tpu.ops import ba_grid, ba_pallas

    grid = ba_grid.from_flat(prob)
    kwargs = dict(n_fixed=1, max_iterations=50, ftol=0.0, xtol=0.0,
                  lambda_max=1e30)

    def measure(solve, k, repeats=10, passes=2):
        """Per-iteration marginal with per-solve setup cancelled: difference
        two chains of the SAME solve count at different max_iterations, so
        prep/launch overhead subtracts out exactly.  Also returns the full
        50-iteration solve latency (what the pipeline actually pays)."""
        @functools.partial(jax.jit, static_argnames=("iters", "max_iter"))
        def chain(iters, max_iter):
            def body(carry, _):
                # data dependency so XLA cannot hoist the scanned solve; the
                # perturbation (~1e-27) vanishes in f32 rounding, so every
                # solve does identical work
                g = grid._replace(rvecs=grid.rvecs + carry * 1e-30)
                kw = dict(kwargs, max_iterations=max_iter)
                _, _, _, stats = solve(g, **kw)
                return stats.final_sq.astype(jnp.float32), stats.iterations
            carry, its = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=iters)
            return carry, jnp.sum(its)

        def best_of(max_iter):
            c, its = chain(iters=k, max_iter=max_iter)
            jax.block_until_ready(c)
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                c, its = chain(iters=k, max_iter=max_iter)
                jax.block_until_ready(c)
                best = min(best, time.perf_counter() - t0)
            return best, int(its)

        ests, solve_ts = [], []
        for _ in range(passes):
            d_lo, i_lo = best_of(10)
            d_hi, i_hi = best_of(50)
            ests.append((d_hi - d_lo) / (i_hi - i_lo))
            solve_ts.append(d_hi / k)
        per_iter = min(ests)
        spread = (max(ests) - per_iter) / per_iter
        return 1.0 / per_iter, spread, min(solve_ts)

    # one plain solve of each for the stats + kernel-vs-XLA cross-check
    stats = jax.device_get(ba_grid.ba_solve_grid(grid, **kwargs)[3])
    # ~70 ms/solve x 8 chained solves per dispatch
    grid_its, grid_spread, grid_solve_s = measure(ba_grid.ba_solve_grid, 8)
    pallas_its, pallas_spread, pallas_solve_s = None, None, None
    if jax.default_backend() == "tpu":
        p_stats = jax.device_get(
            ba_pallas.ba_solve_grid_pallas(grid, **kwargs)[3])
        # the kernel must reproduce the XLA solve (same LM semantics)
        assert abs(float(p_stats.final_sq) - float(stats.final_sq)) <= \
            1e-2 * max(float(stats.final_sq), 1.0), (
                float(p_stats.final_sq), float(stats.final_sq))
        # ~1.2 ms/solve x 512 chained solves per dispatch
        pallas_its, pallas_spread, pallas_solve_s = measure(
            ba_pallas.ba_solve_grid_pallas, 512)
    best = max(grid_its, pallas_its or 0.0)
    spread = pallas_spread if (pallas_its or 0.0) >= grid_its else grid_spread
    solve_s = pallas_solve_s if (pallas_its or 0.0) >= grid_its else grid_solve_s
    return (best, float(stats.initial_sq), float(stats.final_sq), grid,
            grid_its, pallas_its, spread, solve_s)


def lm_iteration_flops(grid, n_fixed=1):
    """XLA's own FLOP estimate for ONE LM iteration (normal-equations step +
    cost evaluation) — the numerator of the BA MFU/roofline number."""
    from bundle_adjustment_tpu.ops import ba_grid

    C = grid.rvecs.shape[0]
    C_adj = max(C - n_fixed, 1)
    onehot = (np.asarray(grid.cam_slot)[..., None] - n_fixed
              == np.arange(C_adj)[None, None, :]).astype(np.float32)
    onehot = jnp.asarray(onehot)

    def one_iter(rv, tv, pt):
        d_r, d_t, d_p = ba_grid._solve_step(
            rv, tv, pt, grid, jnp.float32(1e-3), 1.0, n_fixed, onehot)
        r, _, _ = ba_grid._grid_terms(rv + d_r, tv + d_t, pt + d_p, grid)
        return jnp.sum(r * r)

    compiled = jax.jit(one_iter).lower(
        grid.rvecs, grid.tvecs, grid.points).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def make_global_problem(rng, C=200, P=30000, obs_per_pt=4):
    """Reference-scale GLOBAL BA problem: a long camera chain with
    band-diagonal visibility (each point seen by ~4 consecutive cameras),
    the structure the matrix-free PCG camera solve exists for (the dense
    (6C)^2 solve and the (P, C', 6, 3) coupling tensor both stop scaling
    around here; see ops/ba._solve_normal_equations)."""
    from bundle_adjustment_tpu.ops import ba
    from bundle_adjustment_tpu.ops.lie import so3_exp_np

    c_ids = np.arange(C)
    rvecs = np.stack([0.10 * np.sin(c_ids / 10), 0.10 * np.cos(c_ids / 13),
                      0.05 * np.sin(c_ids / 7)], axis=1)
    Rs = np.stack([so3_exp_np(r) for r in rvecs])
    # camera CENTERS on a smooth forward trajectory; extrinsic translation is
    # t = -R c so projection magnitudes stay bounded at ANY C (an earlier
    # version used t directly as both center and extrinsic, which made uv —
    # and the f32 squared cost — grow with C until, at C=1000, float32 could
    # not even represent an LM improvement at cost ~1e19)
    centers = np.stack([0.3 * c_ids, 0.05 * np.sin(c_ids / 5),
                        0.02 * c_ids], axis=1)
    tvecs = -np.einsum("cij,cj->ci", Rs, centers)

    base = (np.arange(P) * max(C - obs_per_pt, 1) // P).astype(np.int32)
    # each point sits in FRONT of its base camera at depth 4-16, offset
    # within a generous frustum — visible from the ~4 consecutive cameras
    # that observe it (band-diagonal visibility)
    offs = rng.uniform([-4, -4, 4], [4, 4, 16], size=(P, 3))
    X = centers[base] + np.einsum("pji,pj->pi", Rs[base], offs)

    cam_idx = (base[:, None] + np.arange(obs_per_pt)[None, :]).reshape(-1)
    cam_idx = np.minimum(cam_idx, C - 1).astype(np.int32)
    pnt_idx = np.repeat(np.arange(P, dtype=np.int32), obs_per_pt)
    Xc = np.einsum("oij,oj->oi", Rs[cam_idx], X[pnt_idx]) + tvecs[cam_idx]
    uv = (Xc[:, :2] / Xc[:, 2:]) * [_K[0, 0], _K[1, 1]] + [_K[0, 2], _K[1, 2]]
    uv += rng.normal(size=uv.shape) * 0.5
    valid = Xc[:, 2] > 0.5

    # perturb CENTER and rotation, then rebuild t = -R c: perturbing the
    # extrinsic (rvec, tvec) independently moves the implied camera center
    # by |delta_R| * |t|, which grows with trajectory length
    free = (np.arange(C)[:, None] > 0)
    rv_p = rvecs + rng.normal(size=rvecs.shape) * 0.005 * free
    c_p = centers + rng.normal(size=centers.shape) * 0.02 * free
    R_p = np.stack([so3_exp_np(r) for r in rv_p])
    tv_p = -np.einsum("cij,cj->ci", R_p, c_p)
    return ba.BAProblem(
        rvecs=jnp.asarray(rv_p, jnp.float32),
        tvecs=jnp.asarray(tv_p, jnp.float32),
        points=jnp.asarray(X + rng.normal(size=X.shape) * 0.02, jnp.float32),
        cam_idx=jnp.asarray(cam_idx),
        pnt_idx=jnp.asarray(pnt_idx),
        uv=jnp.asarray(uv, jnp.float32),
        obs_mask=jnp.asarray(valid, jnp.float32),
        point_mask=jnp.ones(P, bool),
        K=jnp.asarray(_K, jnp.float32),
    )


def global_iter_mxu_flops(grid, n_fixed=1, cg_iters=8):
    """Analytic MXU-matmul FLOPs ISSUED per LM iteration by the fused global
    kernels (ops/ba_global_pallas) — the MFU numerator (VERDICT r03 #5).

    Counts the slot one-hot gather/scatter matmuls, the kernels' only MXU
    work (the per-observation Jacobian/residual math is VPU elementwise and
    excluded, as is the XLA-side camera algebra at O(C) scale).  These are
    *issued* FLOPs: the one-hot contraction does C x rows x TP MACs to move
    rows x TP useful values, so the useful-work fraction is ~1/C on the
    gather side — pregather mode (C > 512) removes exactly that term."""
    from bundle_adjustment_tpu.ops import ba_global_pallas as gp

    C = grid.rvecs.shape[0]
    C_adj = max(C - n_fixed, 1)
    P, D = grid.cam_slot.shape
    plans = {k: gp._plan(k, C, D) for k in gp._KERNEL_KINDS}
    if any(p is None for p in plans.values()):
        return None
    TP_max = max(p.tp for p in plans.values())
    P_pad = -(-P // TP_max) * TP_max

    # the skip-scatter kernels (pregather matvec, split setup) only issue
    # matmuls for LIVE chunks; replicate the solver's camera-sort + live
    # table to count them (data-dependent, hence computed per problem)
    slot = np.asarray(grid.cam_slot)
    mask = np.asarray(grid.mask) > 0
    own = np.where(mask, slot, C + 1).min(axis=1)
    own = np.where(np.asarray(grid.point_mask), own, C + 1)
    order = np.argsort(own, kind="stable")
    slot_s, mask_s = slot[order], mask[order]

    def live_cb_cols(tp, cb):
        """sum over tiles of (live chunks * CB) for a (tp, cb) plan."""
        pp = -(-P // tp) * tp
        sl = np.pad(slot_s, ((0, pp - P), (0, 0)))
        mk = np.pad(mask_s, ((0, pp - P), (0, 0)))
        adj = sl - n_fixed
        ok = mk & (adj >= 0)
        ci = np.where(ok, adj // cb, -1).reshape(pp // tp, tp * D)
        live = sum(len(np.unique(row[row >= 0])) for row in ci)
        return live * cb, pp // tp

    def kernel_flops(kind, gather_rows, scatter_rows):
        p = plans[kind]
        g = 0 if p.pregather else 2 * gather_rows * C * D * P_pad
        if scatter_rows == 0:
            return g
        skip = (kind == "matvec" and p.pregather) or p.split
        if skip:
            cols, _ = live_cb_cols(p.tp, p.cb)
            return g + 2 * scatter_rows * D * cols * p.tp
        return g + 2 * scatter_rows * C_adj * D * P_pad

    setup = kernel_flops("setup", 39, 54)
    matvec = kernel_flops("matvec", 6, 6)
    cost = kernel_flops("cost", 12, 0)
    backsub = kernel_flops("backsub", 6, 0)
    # one setup + cg matvecs + trial & accept cost evals + one backsub
    return setup + cg_iters * matvec + 2 * cost + backsub


def bench_global_ba():
    """Marginal it/s at global scale (C=200 cameras, 30k points, 120k
    observations), for the matrix-free PCG camera solvers: the fused Pallas
    kernel path (ops/ba_global_pallas — headline on TPU), the XLA scatter-free
    GRID layout (ops/ba_grid._solve_step_pcg, with Eisenstat-Walker forcing)
    and the flat segment-sum path (the sharded/distributed layout)."""
    from bundle_adjustment_tpu.ops import ba, ba_global_pallas, ba_grid

    rng = np.random.default_rng(11)
    prob = make_global_problem(rng)
    grid = ba_grid.from_flat(prob)

    def measure(run, k_hi, repeats):
        stats_box = {}

        def timed_run(iters):
            st = run(iters)
            stats_box["stats"] = st
            return int(st.iterations)

        per_iter, spread = _marginal_estimate(timed_run, k_hi,
                                              repeats=repeats)
        return 1.0 / per_iter, spread, stats_box["stats"]

    def run_grid(iters, cg_iters=8):
        # cap 8 = the pipeline default: final cost identical to cap 32 at
        # this scale (see config.BAConfig.cg_iters measurements), 1.8x faster
        out = ba_grid.ba_solve_grid(
            grid, n_fixed=1, max_iterations=iters, ftol=0.0, xtol=0.0,
            lambda_max=1e30, cg_iters=cg_iters, cg_tol=1e-6, cg_forcing=True)
        return jax.device_get(out[3])

    def run_flat(iters):
        out = ba.ba_solve(prob, n_fixed=1, max_iterations=iters, ftol=0.0,
                          xtol=0.0, lambda_max=1e30, cg_iters=8,
                          cg_tol=1e-6)
        return jax.device_get(out[3])

    def run_kernel(iters):
        out = ba_global_pallas.ba_solve_global_pallas(
            grid, n_fixed=1, max_iterations=iters, ftol=0.0, xtol=0.0,
            lambda_max=1e30, cg_iters=8, cg_tol=1e-6, cg_forcing=True)
        return jax.device_get(out[3])

    # ~15 ms/iter grid, ~120 ms/iter flat: spans sized for >=500 ms deltas
    grid_its, g_spread, g_stats = measure(run_grid, 51, repeats=6)
    cg32_its, _, cg32_stats = measure(
        lambda iters: run_grid(iters, cg_iters=32), 51, repeats=6)
    flat_its, _, _ = measure(run_flat, 11, repeats=4)
    # cap-8 is the headline only while it holds final cost vs cap-32 (the
    # guard that justifies the measured-cap protocol)
    ok = float(g_stats.final_sq) <= 1.1 * float(cg32_stats.final_sq)
    if not ok:
        grid_its, g_stats = cg32_its, cg32_stats
    best_its, best_stats, best_spread = grid_its, g_stats, g_spread
    kernel_its, kernel_mfu = None, None
    if jax.default_backend() == "tpu":
        # kernel failures (Mosaic compile / parity) must not discard the
        # healthy XLA numbers already measured (ADVICE r03)
        try:
            kernel_its, k_spread, k_stats = measure(run_kernel, 41, repeats=6)
            # fused-kernel path must reproduce the XLA solve's cost to 1%
            assert abs(float(k_stats.final_sq) - float(g_stats.final_sq)) <= \
                1e-2 * max(float(g_stats.final_sq), 1.0), (
                    float(k_stats.final_sq), float(g_stats.final_sq))
        except Exception as e:
            kernel_its = f"error: {e}"
        else:
            flops = global_iter_mxu_flops(grid, n_fixed=1, cg_iters=8)
            if flops:
                kernel_mfu = 100.0 * flops * kernel_its / device_peak_flops()
            if kernel_its > best_its:
                best_its, best_stats, best_spread = (kernel_its, k_stats,
                                                     k_spread)
    return (best_its, float(best_stats.initial_sq),
            float(best_stats.final_sq), flat_its, best_spread, cg32_its,
            float(cg32_stats.final_sq), grid_its, kernel_its, kernel_mfu)


def bench_global_c1000(repeats=3):
    """Stability + throughput datapoint at lehmanL ambition scale: C=1000
    cameras, P=120k points, O=480k observations (VERDICT r2 #4).  On TPU the
    fused kernel path (in-kernel one-hot, f32 end-to-end — measured both
    faster AND lower final cost than the XLA path's bf16 reductions, whose
    f32 one-hot would be 1.9 GB per pass); XLA grid + bf16 elsewhere."""
    from bundle_adjustment_tpu.ops import ba_global_pallas, ba_grid

    rng = np.random.default_rng(13)
    prob = make_global_problem(rng, C=1000, P=120000)
    grid = ba_grid.from_flat(prob)
    use_kernel = (jax.default_backend() == "tpu"
                  and ba_global_pallas.kernel_eligible_global(grid, n_fixed=1))

    def run_kernel(iters):
        out = ba_global_pallas.ba_solve_global_pallas(
            grid, n_fixed=1, max_iterations=iters, ftol=0.0, xtol=0.0,
            lambda_max=1e30, cg_iters=8, cg_tol=1e-6, cg_forcing=True)
        return jax.device_get(out[3])

    def run_xla(iters):
        out = ba_grid.ba_solve_grid(
            grid, n_fixed=1, max_iterations=iters, ftol=0.0, xtol=0.0,
            lambda_max=1e30, cg_iters=8, cg_tol=1e-6, cg_forcing=True,
            cg_bf16=True)
        return jax.device_get(out[3])

    def measure(run):
        box = {}

        def timed_run(iters):
            st = run(iters)
            box["st"] = st
            return int(st.iterations)

        per_iter, spread = _marginal_estimate(timed_run, 21, repeats=repeats,
                                              passes=2)
        st = box["st"]
        assert np.isfinite(float(st.final_sq))
        return (1.0 / per_iter, float(st.initial_sq), float(st.final_sq),
                spread)

    mfu = None
    path = "pallas_kernel" if use_kernel else "xla_grid_bf16"
    if use_kernel:
        # a kernel failure here must degrade to the measured XLA datapoint,
        # not a null row (ADVICE r03 / BENCH_r03 regression)
        try:
            its, init, final, spread = measure(run_kernel)
            flops = global_iter_mxu_flops(grid, n_fixed=1, cg_iters=8)
            if flops:
                mfu = 100.0 * flops * its / device_peak_flops()
            return its, init, final, spread, path, mfu
        except Exception:
            path = "xla_grid_bf16 (kernel failed)"
    return measure(run_xla) + (path, mfu)


def bench_compile_smoke(shapes=None, window_shapes=None):
    """Hardware-shape compile gate (VERDICT r03 #2): COMPILE the fused
    kernels at every shape the pipeline may route to them, so a scoped-VMEM
    or compiler-abort regression shows up as an "error:" cell in BENCH
    instead of shipping silently (the r03 failure mode — and the r04 window
    kernel at P=4096, which latched the stress run's runtime fallback).
    Global kernels sweep the camera count (the OOM risk is C-driven);
    the whole-solve WINDOW kernel sweeps the point bucket (its abort was
    P-driven).  The swept shapes are DERIVED from the gates
    (admitted_shapes / admitted_window_shapes, VERDICT r04 #6) — widening
    a gate automatically widens this smoke."""
    from bundle_adjustment_tpu.ops import ba_global_pallas, ba_grid, ba_pallas

    if shapes is None:
        shapes = ba_global_pallas.admitted_shapes(D=4)
    if window_shapes is None:
        window_shapes = ba_pallas.admitted_window_shapes()
    out = {}
    for C in shapes:
        rng = np.random.default_rng(17)
        prob = make_global_problem(rng, C=C, P=max(4 * C, 2048))
        grid = ba_grid.from_flat(prob)
        if not ba_global_pallas.kernel_eligible_global(grid, n_fixed=1):
            out[str(C)] = "ineligible (gate routes to XLA)"
            continue
        try:
            r = jax.block_until_ready(ba_global_pallas.ba_solve_global_pallas(
                grid, n_fixed=1, max_iterations=1, ftol=0.0, xtol=0.0,
                lambda_max=1e30, cg_iters=1, cg_tol=1e-6, cg_forcing=False))
            assert np.isfinite(float(r[3].final_sq))
            out[str(C)] = "ok"
        except Exception as e:
            out[str(C)] = f"error: {e}"[:300]
    for P in window_shapes:
        key = f"window_P{P}"
        rng = np.random.default_rng(19)
        global _C, _P, _OBS_PER_PT
        save = (_C, _P, _OBS_PER_PT)
        try:
            _C, _P, _OBS_PER_PT = 6, P, 4
            prob, _ = make_window_problem(rng)
        finally:
            _C, _P, _OBS_PER_PT = save
        grid = ba_grid.from_flat(prob)
        if not ba_pallas.kernel_eligible(grid, n_fixed=1):
            out[key] = "ineligible (gate routes to XLA)"
            continue
        try:
            r = jax.block_until_ready(ba_pallas.ba_solve_grid_pallas(
                grid, n_fixed=1, max_iterations=1, ftol=0.0, xtol=0.0,
                lambda_max=1e30))
            assert np.isfinite(float(r[3].final_sq))
            out[key] = "ok"
        except Exception as e:
            out[key] = f"error: {e}"[:300]
    return out


def device_peak_flops():
    """Nominal bf16 matmul peak of the attached device (for MFU context)."""
    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v5 lite": 197e12, "v5e": 197e12,
        "v5p": 459e12, "v4": 275e12, "v6": 918e12, "v6e": 918e12,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 197e12 if jax.default_backend() == "tpu" else 1e12


def _marginal_time(run, k_hi=64, repeats=10):
    """K-minus-1 marginal protocol over a blocking chained dispatch; returns
    (per_call_seconds, relative_spread) via _marginal_estimate."""
    def timed_run(k):
        jax.block_until_ready(run(k))
        return k

    return _marginal_estimate(timed_run, k_hi, repeats=repeats)


def bench_matcher():
    """Marginal per-call time of the fused Pallas 4096^2 2-NN kernel,
    measured as one dispatch scanning K data-dependent calls (so neither the
    tunnel round trip nor async-dispatch overlap distorts it — VERDICT r1
    weak #1: the committed bench must reproduce the kernel claim)."""
    from bundle_adjustment_tpu.ops import hamming
    from bundle_adjustment_tpu.ops.hamming_pallas import knn2_pallas

    rng = np.random.default_rng(0)
    d1 = hamming.pack_u8_to_u32(
        jnp.asarray(rng.integers(0, 256, size=(4096, 32), dtype=np.uint8)))
    d2 = hamming.pack_u8_to_u32(
        jnp.asarray(rng.integers(0, 256, size=(4096, 32), dtype=np.uint8)))

    use_pallas = jax.default_backend() == "tpu"

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(d1, d2, iters):
        def body(carry, _):
            if use_pallas:
                best, idx, second = knn2_pallas(carry, d2)
            else:
                best, idx, second = hamming.knn2(carry, d2)
            # data dependency so XLA cannot hoist/fold the scanned kernel:
            # flip one low bit of each descriptor from the result
            dep = (best.astype(jnp.uint32) & 1)[:, None]
            return carry ^ dep, (best[0], idx[0])
        carry, _ = jax.lax.scan(body, d1, None, length=iters)
        return carry

    # ~0.4 ms/call x 1024 calls => ~400 ms marginal span (VERDICT r2 #1:
    # k_hi=64 left the delta inside tunnel jitter)
    per_call, spread = _marginal_time(lambda k: chain(d1, d2, iters=k),
                                      k_hi=1024)
    # FLOP-equivalent of the distance matmul: 2 * N1 * N2 * 256
    flops = 2.0 * 4096 * 4096 * 256
    return per_call, flops / per_call, spread


def bench_orb():
    """Marginal per-frame time of ORB extraction (1280x720, 4000 features,
    8 levels) under the same scanned-dispatch protocol."""
    from bundle_adjustment_tpu.ops import orb

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 255, size=(720, 1280), dtype=np.uint8))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(img, iters):
        def body(carry, _):
            kp = orb.extract(carry, num_features=4000, levels=8,
                             height=720, width=1280)
            dep = (kp.desc[0, 0] & 1).astype(jnp.uint8)
            return carry.at[0, 0].add(dep), None
        carry, _ = jax.lax.scan(body, img, None, length=iters)
        return carry

    # ~6 ms/frame x 64 => ~380 ms marginal span
    return _marginal_time(lambda k: chain(img, iters=k), k_hi=64)


def measure_scipy_baseline(scene):
    import cv2
    from scipy.optimize import least_squares
    from scipy.sparse import lil_matrix

    rvecs, tvecs, X, cam_idx, pnt_idx, uv = scene
    rng = np.random.default_rng(1)
    O = len(uv)
    n_adj = _C - 1

    rv_p = rvecs.copy()
    tv_p = tvecs.copy()
    rv_p[1:] += rng.normal(size=(n_adj, 3)) * 0.01
    tv_p[1:] += rng.normal(size=(n_adj, 3)) * 0.05
    X_p = X + rng.normal(size=X.shape) * 0.05

    def fun(x):
        rv = np.vstack([rvecs[0], x[: n_adj * 3].reshape(-1, 3)])
        tv = np.vstack([tvecs[0], x[n_adj * 3 : 2 * n_adj * 3].reshape(-1, 3)])
        Xx = x[2 * n_adj * 3 :].reshape(-1, 3)
        res = np.empty((O, 2))
        for c in range(_C):
            m = cam_idx == c
            proj, _ = cv2.projectPoints(
                Xx[pnt_idx[m]], rv[c].reshape(3, 1), tv[c].reshape(3, 1), _K, None)
            res[m] = proj.reshape(-1, 2) - uv[m]
        return res.ravel()

    A = lil_matrix((2 * O, n_adj * 6 + _P * 3), dtype=int)
    for o in range(O):
        c, p = cam_idx[o], pnt_idx[o]
        if c >= 1:
            ca = c - 1
            A[2 * o : 2 * o + 2, ca * 3 : (ca + 1) * 3] = 1
            A[2 * o : 2 * o + 2, n_adj * 3 + ca * 3 : n_adj * 3 + (ca + 1) * 3] = 1
        A[2 * o : 2 * o + 2, n_adj * 6 + p * 3 : n_adj * 6 + (p + 1) * 3] = 1

    x0 = np.concatenate([rv_p[1:].ravel(), tv_p[1:].ravel(), X_p.ravel()])
    t0 = time.time()
    res = least_squares(fun, x0, jac_sparsity=A, loss="huber", f_scale=1.0,
                        xtol=1e-5, ftol=1e-5, max_nfev=50)
    dt = time.time() - t0
    return {"njev": res.njev, "nfev": res.nfev, "elapsed_s": dt,
            "iters_per_s": res.njev / dt, "cost": res.cost}


def load_baseline():
    if os.path.exists(_BASELINE_FILE):
        with open(_BASELINE_FILE) as f:
            return json.load(f)["iters_per_s"]
    return SCIPY_BASELINE_ITERS_PER_S


def main():
    if "--rebaseline" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        rng = np.random.default_rng(7)
        _, scene = make_window_problem(rng)
        result = measure_scipy_baseline(scene)
        with open(_BASELINE_FILE, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
        return

    rng = np.random.default_rng(7)
    prob, _ = make_window_problem(rng)
    (it_per_s, init_sq, final_sq, grid, grid_its, pallas_its,
     ba_spread, ba_solve_s) = bench_tpu_ba(prob)
    peak = device_peak_flops()
    ba_flops = lm_iteration_flops(grid)
    ba_tflops = ba_flops * it_per_s / 1e12

    match_s, match_flops_s, match_spread = bench_matcher()
    orb_s, orb_spread = bench_orb()
    try:
        (g_its, g_init, g_final, g_flat_its, g_spread, g_cg32_its,
         g_cg32_final, g_xla_its, g_kernel_its,
         g_kernel_mfu) = bench_global_ba()
    except Exception as e:  # global-scale BA is auxiliary; never fail bench
        g_its, g_init, g_final, g_flat_its, g_spread = (
            f"error: {e}", None, None, None, None)
        g_cg32_its, g_cg32_final, g_xla_its, g_kernel_its, g_kernel_mfu = (
            None, None, None, None, None)
    try:
        (c1000_its, c1000_init, c1000_final, c1000_spread, c1000_path,
         c1000_mfu) = bench_global_c1000()
    except Exception as e:
        c1000_its, c1000_init, c1000_final, c1000_spread = (
            f"error: {e}", None, None, None)
        c1000_path, c1000_mfu = None, None
    compile_smoke = None
    if jax.default_backend() == "tpu":
        try:
            compile_smoke = bench_compile_smoke()
        except Exception as e:
            compile_smoke = f"error: {e}"

    fps, tracked_ms, fps_cold = None, None, None
    if "--no-fps" not in sys.argv:
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools"))
            from fps_bench import run_mode

            from bundle_adjustment_tpu.utils.synthetic import synthetic_sequence

            frames, Kc, _, _ = synthetic_sequence(n_frames=16, motion="strafe")
            # two passes: the first compiles every shape bucket this
            # sequence hits (new buckets otherwise land INSIDE the measured
            # span — the r04 dedup change shifted buckets and turned the
            # r03 1.19 fps row into 0.79 until re-warmed); the second pass
            # is the steady-state number a deployment sees
            kw = dict(warmup=5, use_pallas=jax.default_backend() == "tpu",
                      pipelined=True)
            fps_cold, _, _, _ = run_mode(frames, Kc, True, **kw)
            fps, tracked_ms, _, _ = run_mode(frames, Kc, True, **kw)
            if tracked_ms != tracked_ms:  # no tracked frames -> nan
                tracked_ms = None
        except Exception as e:  # fps is auxiliary; never fail the bench
            fps = f"error: {e}"

    # first run of a FRESH process with the on-disk compile cache populated
    # (the passes above populated it): what a deployment's first session
    # sees on a machine that has run before (VERDICT r04 #7; target within
    # ~2x of warm vs the 13x cold/warm gap of BENCH_r04)
    fps_first_cached = None
    if "--no-fps" not in sys.argv and isinstance(fps, float):
        try:
            import subprocess

            env = dict(os.environ, BA_TPU_JAX_CACHE=_JAX_CACHE_DIR)
            probe = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "fps_bench.py"),
                 "--first-run-probe", "--frames", "16", "--warmup", "5",
                 "--platform",
                 "tpu" if jax.default_backend() == "tpu" else "cpu"],
                capture_output=True, text=True, timeout=1200, env=env)
            for line in reversed(probe.stdout.strip().splitlines()):
                try:
                    fps_first_cached = json.loads(line)["first_run_fps"]
                    break
                except (ValueError, KeyError):
                    continue
        except Exception as e:
            fps_first_cached = f"error: {e}"

    baseline = load_baseline()
    vs = it_per_s / baseline if baseline else None
    print(json.dumps({
        "metric": "ba_iterations_per_s",
        "value": round(it_per_s, 3),
        "unit": "LM iterations/s (C=6, P=2048, O=8192 window)",
        "vs_baseline": round(vs, 2) if vs else None,
        "scipy_cpu_iters_per_s": baseline,
        "ba_cost_reduction": round(init_sq / max(final_sq, 1e-9), 1),
        "ba_ms_per_iter": round(1e3 / it_per_s, 4),
        "ba_solve50_ms": round(ba_solve_s * 1e3, 3),
        "ba_spread_pct": round(100 * ba_spread, 1),
        "ba_xla_grid_iters_per_s": round(grid_its, 1),
        "ba_pallas_iters_per_s": (round(pallas_its, 1) if pallas_its else None),
        "ba_flops_per_iter": ba_flops,
        "ba_achieved_tflops": round(ba_tflops, 3),
        "ba_mfu_pct_bf16peak": round(100 * ba_tflops * 1e12 / peak, 3),
        "matcher_ms_per_4096sq_2nn": round(match_s * 1e3, 4),
        "matcher_spread_pct": round(100 * match_spread, 1),
        "matcher_tflops_equiv": round(match_flops_s / 1e12, 2),
        "matcher_mfu_pct_bf16peak": round(100 * match_flops_s / peak, 2),
        "orb_ms_per_frame_720p": round(orb_s * 1e3, 3),
        "orb_spread_pct": round(100 * orb_spread, 1),
        "ba_global_iters_per_s": (round(g_its, 2)
                                  if isinstance(g_its, float) else g_its),
        "ba_global_spread_pct": (round(100 * g_spread, 1)
                                 if isinstance(g_spread, float) else None),
        "ba_global_cg32_iters_per_s": (round(g_cg32_its, 2)
                                       if isinstance(g_cg32_its, float)
                                       else g_cg32_its),
        "ba_global_xla_iters_per_s": (round(g_xla_its, 2)
                                      if isinstance(g_xla_its, float)
                                      else g_xla_its),
        "ba_global_pallas_iters_per_s": (round(g_kernel_its, 2)
                                         if isinstance(g_kernel_its, float)
                                         else g_kernel_its),
        "ba_global_c1000_iters_per_s": (round(c1000_its, 2)
                                        if isinstance(c1000_its, float)
                                        else c1000_its),
        "ba_global_c1000_cost_reduction": (
            round(c1000_init / max(c1000_final, 1e-9), 1)
            if c1000_final else None),
        "ba_global_c1000_problem": ("C=1000, P=120000, O=480000, CG cap 8 "
                                    "(fused kernel f32 on TPU; XLA grid "
                                    "bf16 reduce elsewhere)"),
        "ba_global_c1000_path": c1000_path,
        "ba_global_c1000_spread_pct": (round(100 * c1000_spread, 1)
                                       if isinstance(c1000_spread, float)
                                       else None),
        "ba_global_c1000_mfu_pct_bf16peak": (round(c1000_mfu, 2)
                                             if c1000_mfu else None),
        "ba_global_mfu_pct_bf16peak": (round(g_kernel_mfu, 2)
                                       if g_kernel_mfu else None),
        "ba_global_compile_smoke": compile_smoke,
        "ba_global_flat_iters_per_s": (round(g_flat_its, 2)
                                       if isinstance(g_flat_its, float)
                                       else g_flat_its),
        "ba_global_problem": ("C=200, P=30000, O=120000, PCG camera solve, "
                              "measured CG cap 8 (fused Pallas kernels on "
                              "TPU, ops/ba_global_pallas; XLA grid layout "
                              "elsewhere)"),
        "ba_global_cost_reduction": (round(g_init / max(g_final, 1e-9), 1)
                                     if g_final else None),
        "frontend_fps_tracked": (round(fps, 3)
                                 if isinstance(fps, float) else fps),
        "frontend_fps_first_run": (round(fps_cold, 3)
                                   if isinstance(fps_cold, float) else None),
        "frontend_fps_first_run_cached": (
            round(fps_first_cached, 3)
            if isinstance(fps_first_cached, float) else fps_first_cached),
        "frontend_tracked_ms": (round(tracked_ms, 1)
                                if isinstance(tracked_ms, float) else
                                tracked_ms),
        "device_peak_bf16_tflops": peak / 1e12,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
