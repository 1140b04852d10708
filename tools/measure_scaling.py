"""Scaling-efficiency harness for the distributed Schur BA (north-star
metric: >=80% frames/s scaling efficiency at 2 hosts, BASELINE.md).

Measures per-LM-iteration wall time of the point-sharded solver at shard
counts 1..N on whatever devices are available, plus the partitioned-window
path at (win, pt) splits.  On a single host with virtual CPU devices the
shards share silicon, so the numbers validate plumbing/overhead, not true
scaling; on a real multi-chip slice the same harness reports the headline
efficiency.  Results print as one JSON line per configuration.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/measure_scaling.py --platform cpu
    python tools/measure_scaling.py            # real devices
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--cams", type=int, default=6)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--obs-per-point", type=int, default=4)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    import bench
    from bundle_adjustment_tpu.ops import ba
    from bundle_adjustment_tpu.parallel import dist_ba, mesh as mesh_mod

    bench._C, bench._P, bench._OBS_PER_PT = args.cams, args.points, args.obs_per_point
    prob, _ = bench.make_window_problem(np.random.default_rng(7))

    n_dev = len(jax.devices())
    shard_counts = [n for n in (1, 2, 4, 8, 16) if n <= n_dev]

    def marginal_it_time(solve):
        def run(iters):
            out = solve(iters)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = solve(iters)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            return best, int(out[3].iterations)

        d1, i1 = run(1)
        dK, iK = run(1 + args.iters)
        return (dK - d1) / max(iK - i1, 1)

    base = None
    for n in shard_counts:
        if n == 1:
            solve = lambda iters: ba.ba_solve(
                prob, n_fixed=1, max_iterations=iters, ftol=0.0, xtol=0.0,
                lambda_max=1e30)
        else:
            mesh = mesh_mod.make_mesh(1, n)
            sharded = dist_ba.shard_problem(prob, n)
            solve = lambda iters, mesh=mesh, sharded=sharded, n=n: \
                dist_ba.ba_solve_sharded(
                    sharded, mesh, axis="pt", n_fixed=1, max_iterations=iters,
                    ftol=0.0, xtol=0.0, lambda_max=1e30)
        t = marginal_it_time(solve)
        if base is None:
            base = t
        eff = base / (t * 1)  # per-iteration speedup vs 1 shard
        print(json.dumps({
            "config": f"pt={n}", "devices": n,
            "ms_per_iteration": round(t * 1e3, 3),
            "speedup_vs_1": round(base / t, 3),
            "parallel_efficiency": round(base / t / n, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
