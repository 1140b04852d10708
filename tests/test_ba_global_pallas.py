"""Fused global-BA Pallas kernels vs the XLA grid PCG solver.

Strategy (mirrors tests/test_ba_pallas.py): run the kernels in Pallas
INTERPRET mode on the CPU backend and assert parity against
ops/ba_grid._solve_step_pcg / ba_solve_grid — step-level (one damped Schur
step with a fixed lambda must match the XLA step to float tolerance) and
solve-level (same LM trajectory => same final cost within tolerance).
Real-TPU compilation + throughput is bench.py's job.
"""

import numpy as np

import jax
import jax.numpy as jnp

from bundle_adjustment_tpu.ops import ba as ba_flat
from bundle_adjustment_tpu.ops import ba_grid, ba_global_pallas


def _make_problem(rng, C=12, P=600, obs_per_pt=4, noise=0.5):
    """Small band-visibility global problem (bench.make_global_problem
    geometry, sized for the CPU interpreter)."""
    from bundle_adjustment_tpu.ops.lie import so3_exp_np

    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1.0]])
    c_ids = np.arange(C)
    rvecs = np.stack([0.1 * np.sin(c_ids / 3), 0.1 * np.cos(c_ids / 4),
                      0.05 * np.sin(c_ids / 5)], axis=1)
    Rs = np.stack([so3_exp_np(r) for r in rvecs])
    centers = np.stack([0.3 * c_ids, 0.05 * np.sin(c_ids / 2),
                        0.02 * c_ids], axis=1)
    tvecs = -np.einsum("cij,cj->ci", Rs, centers)

    base = (np.arange(P) * max(C - obs_per_pt, 1) // P).astype(np.int32)
    offs = rng.uniform([-3, -3, 4], [3, 3, 12], size=(P, 3))
    X = centers[base] + np.einsum("pji,pj->pi", Rs[base], offs)
    cam_idx = np.minimum(base[:, None] + np.arange(obs_per_pt)[None, :],
                         C - 1).astype(np.int32).reshape(-1)
    pnt_idx = np.repeat(np.arange(P, dtype=np.int32), obs_per_pt)
    Xc = np.einsum("oij,oj->oi", Rs[cam_idx], X[pnt_idx]) + tvecs[cam_idx]
    uv = (Xc[:, :2] / Xc[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    uv += rng.normal(size=uv.shape) * noise
    valid = Xc[:, 2] > 0.5

    free = (np.arange(C)[:, None] > 0)
    rv_p = rvecs + rng.normal(size=rvecs.shape) * 0.01 * free
    c_p = centers + rng.normal(size=centers.shape) * 0.03 * free
    R_p = np.stack([so3_exp_np(r) for r in rv_p])
    tv_p = -np.einsum("cij,cj->ci", R_p, c_p)
    prob = ba_flat.BAProblem(
        rvecs=jnp.asarray(rv_p, jnp.float32),
        tvecs=jnp.asarray(tv_p, jnp.float32),
        points=jnp.asarray(X + rng.normal(size=X.shape) * 0.03, jnp.float32),
        cam_idx=jnp.asarray(cam_idx),
        pnt_idx=jnp.asarray(pnt_idx),
        uv=jnp.asarray(uv, jnp.float32),
        obs_mask=jnp.asarray(valid, jnp.float32),
        point_mask=jnp.ones(P, bool),
        K=jnp.asarray(K, jnp.float32),
    )
    return ba_grid.from_flat(prob)


def _setup_outputs_interp(grid, lam, n_fixed=1, pregather=False, CB=None):
    """One setup-kernel pass (interpret mode) -> (YT, VinvT, zpT, red)."""
    from functools import partial

    from jax.experimental import pallas as pl

    gp = ba_global_pallas
    C = grid.rvecs.shape[0]
    C_adj = C - n_fixed
    P, D = grid.cam_slot.shape
    TP = 256
    CB = CB or min(512, gp._ceil8(C))
    P_pad = -(-P // TP) * TP
    pad = P_pad - P
    ptT = jnp.pad(grid.points.astype(jnp.float32), ((0, pad), (0, 0))).T
    slotT = jnp.pad(grid.cam_slot, ((0, pad), (0, 0))).T
    maskT = jnp.pad(grid.mask.astype(jnp.float32), ((0, pad), (0, 0))).T
    uvT = jnp.pad(grid.uv.astype(jnp.float32),
                  ((0, pad), (0, 0), (0, 0))).transpose(1, 2, 0).reshape(
                      2 * D, P_pad)
    pmaskT = jnp.pad(grid.point_mask.astype(jnp.float32), (0, pad))[None, :]
    scal = jnp.stack([grid.K[0, 0], grid.K[1, 1], grid.K[0, 2], grid.K[1, 2],
                      jnp.float32(lam), jnp.float32(1.0), jnp.float32(0),
                      jnp.float32(0)]).astype(jnp.float32)[None, :]
    R_rows, dR_rows = gp._rodrigues_rows(
        grid.rvecs.astype(jnp.float32).T, want_jac=True)
    tvT = grid.tvecs.astype(jnp.float32).T

    nch = gp._c_pad(C_adj, CB) // CB
    tiled = lambda rows: pl.BlockSpec((rows, TP), lambda i: (0, i))
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    out_specs = (tiled(D * 18), tiled(6), tiled(3),
                 full(nch * gp._RED_COLS, CB))
    out_shape = (
        jax.ShapeDtypeStruct((D * 18, P_pad), jnp.float32),
        jax.ShapeDtypeStruct((6, P_pad), jnp.float32),
        jax.ShapeDtypeStruct((3, P_pad), jnp.float32),
        jax.ShapeDtypeStruct((nch * gp._RED_COLS, CB), jnp.float32),
    )
    if pregather:
        # chunked-gather mode: the split math + scatter54 kernel pair (the
        # production C>=513 path, including the live-chunk tables)
        from jax.experimental.pallas import tpu as pltpu

        nchg = gp._c_pad(C, CB) // CB
        nch_s = gp._c_pad(C_adj, CB) // CB
        camT = jnp.pad(jnp.concatenate([R_rows, dR_rows, tvT], axis=0),
                       ((0, 0), (0, nchg * CB - C)))
        live_g = gp._live_table(slotT, maskT, 0, C, TP, CB, P_pad)
        live_s = gp._live_table(slotT, maskT, n_fixed, C_adj, TP, CB, P_pad)
        gtiled = lambda rows: pl.BlockSpec((rows, TP),
                                           lambda i, live: (0, i))
        gfull = lambda a, b: pl.BlockSpec((a, b), lambda i, live: (0, 0))
        math_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(P_pad // TP,),
            in_specs=[gfull(39, nchg * CB), gtiled(3), gtiled(D), gtiled(D),
                      gtiled(2 * D), gtiled(1), gfull(1, 8)],
            out_specs=(gtiled(D * 18), gtiled(6), gtiled(3),
                       gtiled(D * gp._RED_COLS)),
            scratch_shapes=[pltpu.VMEM((39 * D, TP), jnp.float32)])
        YT, VinvT, zpT, rowsT = pl.pallas_call(
            partial(gp._setup_math_kernel_skipg, C=C, D=D, n_fixed=n_fixed,
                    CB=CB, NCH=nchg),
            grid_spec=math_spec,
            out_shape=(
                jax.ShapeDtypeStruct((D * 18, P_pad), jnp.float32),
                jax.ShapeDtypeStruct((6, P_pad), jnp.float32),
                jax.ShapeDtypeStruct((3, P_pad), jnp.float32),
                jax.ShapeDtypeStruct((D * gp._RED_COLS, P_pad), jnp.float32),
            ),
            interpret=True,
        )(live_g, camT, ptT, slotT, maskT, uvT, pmaskT, scal)
        sc_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(P_pad // TP,),
            in_specs=[gtiled(D * gp._RED_COLS), gtiled(D), gtiled(D)],
            out_specs=pl.BlockSpec((nch_s * gp._RED_COLS, CB),
                                   lambda i, live: (0, 0)))
        redT = pl.pallas_call(
            partial(gp._scatter54_kernel, D=D, n_fixed=n_fixed, CB=CB,
                    NCH=nch_s),
            grid_spec=sc_spec,
            out_shape=jax.ShapeDtypeStruct((nch_s * gp._RED_COLS, CB),
                                           jnp.float32),
            interpret=True,
        )(live_s, rowsT, slotT, maskT)
        out = (YT, VinvT, zpT, redT)
    else:
        out = pl.pallas_call(
            partial(gp._setup_kernel_gather, C=C, D=D, n_fixed=n_fixed,
                    CB=CB),
            grid=(P_pad // TP,),
            in_specs=[full(9, C), full(27, C), full(3, C), tiled(3),
                      tiled(D), tiled(D), tiled(2 * D), tiled(1),
                      full(1, 8)],
            out_specs=out_specs, out_shape=out_shape, interpret=True,
        )(R_rows, dR_rows, tvT, ptT, slotT, maskT, uvT, pmaskT, scal)
    YT, VinvT, zpT, redT = out
    red = gp._unscramble_chunks(redT, gp._RED_COLS, C_adj, CB)
    return (YT, VinvT, zpT, red), P


import pytest


@pytest.mark.parametrize("mode", ["gather", "pregather", "chunked"])
def test_setup_reductions_match_xla_step(mode):
    """The setup kernel's U / g_c / Wz / precond reductions and the V^-1
    elimination must reproduce ops/ba_grid's values — in both camera-row
    fetch modes, and with a scatter chunk smaller than C (multi-chunk)."""
    rng = np.random.default_rng(3)
    grid = _make_problem(rng)
    n_fixed = 1
    lam = 1e-3
    C = grid.rvecs.shape[0]
    C_adj = C - n_fixed
    P, D = grid.cam_slot.shape

    (YT, VinvT, zpT, red), _ = _setup_outputs_interp(
        grid, lam, n_fixed, pregather=(mode == "pregather"),
        CB=8 if mode == "chunked" else None)

    # XLA reference pieces, computed exactly as _solve_step_pcg does
    r, Jc, Jp = ba_grid._grid_terms(
        grid.rvecs.astype(jnp.float32), grid.tvecs.astype(jnp.float32),
        grid.points.astype(jnp.float32), grid)
    delta = 1.0
    a = jnp.abs(r)
    w = jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12)) \
        * grid.mask.astype(jnp.float32)[..., None]
    cam_ok = (grid.cam_slot >= n_fixed).astype(r.dtype)[..., None, None]
    Jc = Jc * cam_ok
    V = jnp.sum(ba_grid._jtj(Jp, Jp, w), axis=1)
    V = V + lam * (jnp.abs(jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(V)))
                   + 1e-6 * jnp.eye(3))
    Vinv = ba_flat._inv3(V)
    Vinv = jnp.where(grid.point_mask[:, None, None], Vinv, 0.0)
    g_p = jnp.sum(Jp * w[..., None] * r[..., None], axis=(1, 2))
    z_p = jnp.einsum("pij,pj->pi", Vinv, g_p)
    Y = ba_grid._jtj(Jc, Jp, w)

    np.testing.assert_allclose(np.asarray(zpT)[:, :P].T, np.asarray(z_p),
                               rtol=1e-2, atol=1e-3)
    # Y rows: YT[d*18 + i*3 + l, p] == Y[p, d, i, l]
    Yk = np.asarray(YT)[:, :P].T.reshape(P, D, 6, 3)
    np.testing.assert_allclose(Yk, np.asarray(Y), rtol=1e-2, atol=1e-3)

    onehot_T = (jnp.arange(C_adj)[:, None]
                == (grid.cam_slot.reshape(-1)[None, :] - n_fixed)
                ).astype(jnp.float32)
    U_ref = (onehot_T @ ba_grid._jtj(Jc, Jc, w).reshape(-1, 36)
             ).reshape(C_adj, 6, 6)
    gc_ref = onehot_T @ jnp.sum(Jc * w[..., None] * r[..., None],
                                axis=-2).reshape(-1, 6)
    Wz_ref = onehot_T @ jnp.sum(Y * z_p[:, None, None, :],
                                axis=-1).reshape(-1, 6)
    YV = ba_grid._mm(Y, Vinv[:, None])
    Do_ref = (onehot_T @ jnp.sum(
        YV[..., :, None, :] * Y[..., None, :, :], axis=-1).reshape(-1, 36)
    ).reshape(C_adj, 6, 6)

    gp = ba_global_pallas
    np.testing.assert_allclose(
        np.asarray(gp._unpack_sym6(red[:, gp._RED_U])),
        np.asarray(U_ref), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(red)[:, gp._RED_GC],
                               np.asarray(gc_ref), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(red)[:, gp._RED_WZ],
                               np.asarray(Wz_ref), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(gp._unpack_sym6(red[:, gp._RED_DO])),
        np.asarray(Do_ref), rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("pregather", [False, True])
def test_full_solve_matches_grid_pcg(pregather):
    """Whole-solve LM trajectory parity: same iteration count ballpark and
    final cost within 1% of ba_solve_grid's PCG path, in both fetch modes."""
    rng = np.random.default_rng(5)
    grid = _make_problem(rng)
    kwargs = dict(n_fixed=1, max_iterations=15, ftol=0.0, xtol=0.0,
                  lambda_max=1e30, cg_iters=8, cg_tol=1e-6, cg_forcing=True)
    rv_x, tv_x, pt_x, st_x = ba_grid.ba_solve_grid(grid, **kwargs)
    rv_k, tv_k, pt_k, st_k = ba_global_pallas.ba_solve_global_pallas(
        grid, interpret=True, force_pregather=pregather, **kwargs)

    np.testing.assert_allclose(float(st_k.initial_cost),
                               float(st_x.initial_cost), rtol=1e-5)
    np.testing.assert_allclose(float(st_k.final_cost), float(st_x.final_cost),
                               rtol=1e-2)
    np.testing.assert_allclose(float(st_k.final_sq), float(st_x.final_sq),
                               rtol=1e-2)
    assert float(st_k.final_cost) < float(st_k.initial_cost)
    # parameters land at the same optimum
    np.testing.assert_allclose(np.asarray(rv_k), np.asarray(rv_x),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(pt_k), np.asarray(pt_x),
                               rtol=0, atol=5e-2)


def test_full_solve_matches_grid_pcg_multichunk_skip(monkeypatch):
    """MULTI-chunk chunked-gather mode: with the skip chunk forced down to
    8 cameras the C=12 problem spans 2 chunks, so the live-table skip logic
    (gather AND scatter sides, all four kernels) must route every
    observation through the right chunk — asserted by whole-solve parity
    against the XLA grid path.  (At default _skip_cb the test problem fits
    one chunk and the skip machinery is exercised only trivially.)"""
    rng = np.random.default_rng(5)
    grid = _make_problem(rng)
    kwargs = dict(n_fixed=1, max_iterations=15, ftol=0.0, xtol=0.0,
                  lambda_max=1e30, cg_iters=8, cg_tol=1e-6, cg_forcing=True)
    rv_x, tv_x, pt_x, st_x = ba_grid.ba_solve_grid(grid, **kwargs)
    monkeypatch.setattr(ba_global_pallas, "_skip_cb", lambda C_adj: 8)
    assert ba_global_pallas._plan("setup", grid.rvecs.shape[0],
                                  grid.cam_slot.shape[1],
                                  pregather=True).split
    # the chunk width is read at trace time: drop any cached trace from the
    # un-patched parity test above (same shapes + statics)
    ba_global_pallas.ba_solve_global_pallas.clear_cache()
    rv_k, tv_k, pt_k, st_k = ba_global_pallas.ba_solve_global_pallas(
        grid, interpret=True, force_pregather=True, **kwargs)
    ba_global_pallas.ba_solve_global_pallas.clear_cache()
    np.testing.assert_allclose(float(st_k.initial_cost),
                               float(st_x.initial_cost), rtol=1e-5)
    np.testing.assert_allclose(float(st_k.final_cost), float(st_x.final_cost),
                               rtol=1e-2)
    np.testing.assert_allclose(np.asarray(rv_k), np.asarray(rv_x),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(pt_k), np.asarray(pt_x),
                               rtol=0, atol=5e-2)


def test_eligibility_gate():
    rng = np.random.default_rng(7)
    grid = _make_problem(rng)
    assert ba_global_pallas.kernel_eligible_global(grid)
    big_D = grid._replace(cam_slot=jnp.zeros((16, 20), jnp.int32),
                          mask=jnp.zeros((16, 20), jnp.float32),
                          uv=jnp.zeros((16, 20, 2), jnp.float32),
                          points=jnp.zeros((16, 3), jnp.float32),
                          point_mask=jnp.zeros(16, bool))
    assert not ba_global_pallas.kernel_eligible_global(big_D)
    # n_fixed must index a real camera: >= C means the reduction shapes
    # (oh[n_fixed:]) would mismatch the declared C_adj block (ADVICE r03)
    C = grid.rvecs.shape[0]
    assert not ba_global_pallas.kernel_eligible_global(grid, n_fixed=C)
    assert not ba_global_pallas.kernel_eligible_global(grid, n_fixed=-1)


def test_vmem_tile_picker_budget():
    """The round-3 regression, encoded: hard-coded TP tables shipped a cost
    kernel at C=1000/TP=1024 that overflowed Mosaic's 16 MB scoped VMEM on
    hardware (BENCH_r03: 19.23M > 16M).  The budget model must classify the
    measured OOM configs (gather mode) as over-budget and the measured
    working configs as under, and the planner must never return an
    over-budget (tile, chunk)."""
    gp = ba_global_pallas
    limit = 16 << 20
    # measured OOM points (v5e, D=4, gather mode, single chunk = C)
    assert gp._vmem_bytes("cost", 1000, 4, 1024, False, 1000) > limit
    assert gp._vmem_bytes("setup", 1000, 4, 512, False, 512) > limit
    # measured working points: model must keep them under the picker budget
    assert gp._vmem_bytes("cost", 1000, 4, 256, False, 512) <= gp._VMEM_BUDGET
    assert gp._vmem_bytes("setup", 1000, 4, 256, False, 512) <= gp._VMEM_BUDGET
    assert gp._vmem_bytes("matvec", 1000, 4, 256, False, 512) <= gp._VMEM_BUDGET
    # hardware-proven r04 compile-smoke configs must stay reachable:
    # C=256 all-1024, C=512 setup/matvec 512
    assert gp._plan("setup", 256, 4)[0] == 1024
    assert gp._plan("setup", 512, 4)[0] >= 512
    # the planner never selects an over-budget config, for any (C, D)
    for C in (6, 200, 256, 512, 1000, 2048, 4096, 8192):
        for D in (2, 4, 8, 12):
            for kind in gp._KERNEL_KINDS:
                plan = gp._plan(kind, C, D)
                if plan is not None:
                    kinds = (["setup_math", "setup_scatter"] if plan.split
                             else [kind])
                    for k in kinds:
                        assert gp._vmem_bytes(
                            k, C, D, plan.tp, plan.pregather, plan.cb) \
                            <= gp._VMEM_BUDGET
                    assert plan.tp >= 128 and (plan.tp & (plan.tp - 1)) == 0
                    # fused setup runs one full-width chunk (<=1024); the
                    # skip/light kernels chunk at <=512 (16-chunk cap)
                    assert 0 < plan.cb <= (
                        1024 if kind == "setup" and not plan.split else 512)
                    assert plan.split == (
                        kind == "setup" and C >= gp._PREGATHER_MIN_C)
    # pregather shapes (C >= 513) now plan SPLIT setup + chunk-skip
    # scatter (math + scatter54 kernel pair) — measured faster than the
    # fused single-chunk setup at C=1000 AND eligible at any C (r05);
    # gather-mode shapes keep the r03/r04-proven fused kernel
    for C in (513, 1000, 1024):
        assert all(gp._plan(k, C, 4) is not None for k in gp._KERNEL_KINDS)
        assert gp._plan("setup", C, 4).split
        assert not gp._plan("setup", 512, 4).split
    for C in (2048, 4096, 8192):
        plan = gp._plan("setup", C, 4)
        assert plan is not None and plan.split and plan.pregather
        # the skip chunk keeps the static chunk loop bounded
        assert -(-(C - 1) // plan.cb) <= 16
        # gather mode cannot split (the math body takes streamed rows)
        assert gp._plan("setup", C, 4, pregather=False) is None
    # eligibility consults the same planner
    rng = np.random.default_rng(7)
    grid = _make_problem(rng)
    D = grid.cam_slot.shape[1]
    assert all(gp._plan(k, grid.rvecs.shape[0], D) is not None
               for k in gp._KERNEL_KINDS)


def test_admitted_shapes_follow_gates(monkeypatch):
    """The compile-smoke sweep is DERIVED from the gates (VERDICT r04 #6):
    every admitted shape must actually be eligible, the boundary shapes
    must be present, and a deliberately widened gate must surface as a
    CHANGED smoke set (the property that prevents a silently-widened gate
    from shipping unsmoked — the r03/r04 bug class)."""
    from bundle_adjustment_tpu.ops import ba_pallas

    gp = ba_global_pallas
    base = gp.admitted_shapes()
    assert base[-1] == 8192          # eligibility cap is the last bucket
    assert 512 in base               # gather/pregather boundary bucket
    assert all(gp.eligible_shape_global(C, 4) for C in base)
    assert not gp.eligible_shape_global(8193, 4)
    # window buckets: compile-proven sizes admitted, first refusals recorded
    w = ba_pallas.admitted_window_shapes()
    assert 1024 in w and 2048 in w and 4096 in w
    assert ba_pallas.eligible_shape(6, 2048, 4)
    assert not ba_pallas.eligible_shape(6, 4096, 4)
    # a deliberately widened gate produces a different smoke set
    monkeypatch.setattr(gp, "_VMEM_BUDGET", gp._VMEM_BUDGET * 4)
    assert set(gp.admitted_shapes()) != set(base)


def test_compile_smoke_on_tpu():
    """Hardware-shape compile gate: the fused global kernels must COMPILE at
    every eligible camera count (the r03 VMEM OOM was a compile-time failure
    that interpret-mode tests cannot catch).  The CPU suite skips this; it is
    exercised on hardware by bench.py's ba_global_compile_smoke preflight."""
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU (Mosaic compile) — see bench.py "
                    "ba_global_compile_smoke for the hardware gate")
    import bench

    smoke = bench.bench_compile_smoke()
    bad = {c: v for c, v in smoke.items() if v.startswith("error")}
    assert not bad, bad


def test_pipeline_global_ba_falls_back_on_kernel_failure(monkeypatch):
    """If the fused global kernels fail to compile mid-run (the BENCH_r03
    failure mode), the pipeline's global BA must degrade to the XLA grid/flat
    path instead of crashing (models/pipeline._solve_window)."""
    from bundle_adjustment_tpu.config import (BAConfig, CameraModel,
                                              KeyframeCriteria,
                                              PipelineConfig)
    from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
    from bundle_adjustment_tpu.utils.event_log import EventLog
    from bundle_adjustment_tpu.utils.synthetic import synthetic_sequence

    frames, K, _, _ = synthetic_sequence(n_frames=12, seed=0)
    cfg = PipelineConfig(
        camera=CameraModel(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                           width=640, height=480),
        num_features=1200, pyramid_levels=4, min_tracked_features=15,
        pose_inlier_ratio=0.4, pose_inlier_numbers=15,
        keyframe=KeyframeCriteria(min_median_displacement_px=12.0),
        ba=BAConfig(window_size=4, max_points=4096, max_obs=16384,
                    pcg_min_cameras=3, use_pallas_ba=False),
    )
    pipe = VisualOdometryPipeline(cfg, log=EventLog(echo=False),
                                  use_pallas_matcher=False)
    for f in frames:
        pipe.process_frame(f)
    # needs only len(window) > pcg_min_cameras=3 to hit the global PCG path
    assert pipe.map.num_keyframes >= 4

    def boom(*a, **k):
        raise RuntimeError("forced Mosaic scoped-VMEM OOM (test)")

    monkeypatch.setattr(ba_global_pallas, "ba_solve_global_pallas", boom)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    result = pipe.run_full_ba()
    assert result is not None and np.isfinite(result["final"])
    assert pipe._global_pallas_broken
    assert any(e["event"] == "pallas_ba_fallback" for e in pipe.log.events)
    # and the flag short-circuits the kernel path on the next solve
    result2 = pipe.run_full_ba()
    assert result2 is not None and np.isfinite(result2["final"])
