"""Scaling-efficiency harness for the distributed Schur BA (north-star
metric: >=80% frames/s scaling efficiency at 2 hosts, BASELINE.md).

Two modes:

  --window  (legacy r03 behavior) per-LM-iteration wall time of the
            point-sharded solver on the tiny 6-camera window problem at
            shard counts 1..N.

  default   problem-size sweep at GLOBAL scale (C=200 cameras, O = 30k /
            120k / 480k observations) x shard counts, PLUS a psum-only
            microbench of the exact per-iteration collective payload.  This
            separates the two things the virtual mesh can actually measure:
            (a) how the per-shard compute shrinks with the point partition,
            (b) what the collective path costs per iteration.

IMPORTANT — what virtual-device numbers mean: this host has 2 physical
cores; the 8 "devices" are XLA host-platform threads sharing that silicon.
Total compute throughput is therefore ~FLAT in the shard count — the ideal
virtual-mesh curve is constant ms/iter, NOT 1/n — and any rise above the
1-shard line is parallelization overhead (shard dispatch, inter-thread
collectives, padding).  Real scaling comes from the analytic projection:
per-iteration collective BYTES (psum of the reduced camera system:
U (C',6,6) + g_c + Wz + cg_iters x WVWx (C',6), all f32) against per-shard
compute FLOPs, both reported here; BASELINE.md carries the 2-host
projection built from these.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/measure_scaling.py --platform cpu [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _marginal_it_time(solve, iters, repeats=3):
    import jax

    def run(k):
        out = solve(k)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = solve(k)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best, int(out[3].iterations)

    d1, i1 = run(1)
    dK, iK = run(1 + iters)
    return (dK - d1) / max(iK - i1, 1)


def _psum_microbench(mesh, axis, C_adj, n_psum=48, repeats=3):
    """Per-psum cost of the solver's exact collective payload on this mesh:
    one (C', 48) f32 psum (U+g_c+Wz packed is 48 lanes per camera) chained
    ``n_psum`` times with a data dependency so XLA cannot batch them."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    x = jnp.ones((mesh.shape[axis], C_adj, 48), jnp.float32)

    def chained(x, k):
        def body(c, _):
            return jax.lax.psum(c, axis) * (1.0 + 1e-30), None
        c, _ = jax.lax.scan(body, x[0], None, length=k)
        return c[None]

    def run(k):
        fn = shard_map(lambda x, k=k: chained(x, k), mesh=mesh,
                       in_specs=(P(axis),), out_specs=P(axis),
                       check_vma=False)
        out = jax.jit(fn)(x)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(jax.jit(fn)(x))
            best = min(best, time.perf_counter() - t0)
        return best

    d1 = run(1)
    dK = run(1 + n_psum)
    return (dK - d1) / n_psum


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    ap.add_argument("--window", action="store_true",
                    help="legacy r03 tiny-window sweep")
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--cams", type=int, default=6)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--obs-per-point", type=int, default=4)
    ap.add_argument("--out", type=str, default=None,
                    help="write all result rows to this JSON file")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    import bench
    from bundle_adjustment_tpu.ops import ba
    from bundle_adjustment_tpu.parallel import dist_ba, mesh as mesh_mod

    n_dev = len(jax.devices())
    shard_counts = [n for n in (1, 2, 4, 8, 16) if n <= n_dev]
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    def sweep_problem(prob, label, cg_iters):
        kw = dict(n_fixed=1, ftol=0.0, xtol=0.0, lambda_max=1e30)
        if cg_iters:
            kw.update(cg_iters=cg_iters, cg_tol=1e-6)
        base = None
        C_adj = prob.rvecs.shape[0] - 1
        # per-iteration collective payload of the sharded solver (f32):
        # psum of U (C',6,6) + g_c (C',6) + Wz (C',6) once, WVWx (C',6)
        # per CG matvec, + 3 scalars
        comm_bytes = 4 * C_adj * (36 + 6 + 6 + 6 * max(cg_iters, 0)) + 12
        for n in shard_counts:
            if n == 1:
                solve = lambda k: ba.ba_solve(prob, max_iterations=k, **kw)
                psum_s = 0.0
            else:
                mesh = mesh_mod.make_mesh(1, n)
                sharded = dist_ba.shard_problem(prob, n)
                solve = lambda k, mesh=mesh, sharded=sharded: \
                    dist_ba.ba_solve_sharded(sharded, mesh, axis="pt",
                                             max_iterations=k, **kw)
                psum_s = _psum_microbench(mesh, "pt", C_adj)
            t = _marginal_it_time(solve, args.iters)
            if base is None:
                base = t
            emit({
                "config": f"{label} pt={n}", "devices": n,
                "obs": int(prob.uv.shape[0]),
                "ms_per_iteration": round(t * 1e3, 3),
                "vs_pt1": round(base / t, 3),
                "psum_us_per_collective": round(psum_s * 1e6, 1),
                # 1 + cg_iters collectives per LM iteration
                "collective_share_pct": round(
                    100 * psum_s * (1 + max(cg_iters, 0)) / t, 1),
                "comm_bytes_per_iteration": comm_bytes,
            })

    if args.window:
        bench._C, bench._P, bench._OBS_PER_PT = (
            args.cams, args.points, args.obs_per_point)
        prob, _ = bench.make_window_problem(np.random.default_rng(7))
        sweep_problem(prob, "window C=6", cg_iters=0)
    else:
        # O = 30k / 120k / 480k at fixed C=200: the collective payload is
        # constant while per-shard compute grows 16x, so the comm:compute
        # trend is directly visible (VERDICT r03 #4)
        for P_pts in (7500, 30000, 120000):
            prob = bench.make_global_problem(
                np.random.default_rng(11), C=200, P=P_pts)
            sweep_problem(prob, f"global C=200 P={P_pts}", cg_iters=8)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"host_physical_cores": 2,
                       "note": ("virtual devices share silicon: ideal curve "
                                "is FLAT ms/iter; rises are overhead. See "
                                "BASELINE.md scaling section for the 2-host "
                                "projection."),
                       "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
