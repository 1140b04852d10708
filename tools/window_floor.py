"""Window-kernel latency-floor experiment (VERDICT r03 #7).

The fused window LM kernel (ops/ba_pallas.py) runs ~8-20 us/iteration at
22.7 MFLOP/iter — ~10% MFU.  Hypothesis: the iteration time is LATENCY
bound (the LM body is a sequential dependency chain of small VPU ops +
one MXU contraction), not throughput bound.  Test: sweep the point count P
at fixed window size — if us/iter is ~flat in P, the kernel is at its
dependency-latency floor and more FLOPs/iter are free; if it scales with P,
there is throughput headroom to chase.

    python tools/window_floor.py        # TPU (the kernel is TPU-only)

Prints one JSON line per P plus a verdict line; BASELINE.md quotes it.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    import bench
    from bundle_adjustment_tpu.ops import ba_grid, ba_pallas

    assert jax.default_backend() == "tpu", "window kernel is TPU-only"

    kwargs = dict(n_fixed=1, max_iterations=50, ftol=0.0, xtol=0.0,
                  lambda_max=1e30)
    rows = []
    for P in (256, 512, 1024, 2048):
        bench._C, bench._P, bench._OBS_PER_PT = 6, P, 4
        prob, _ = bench.make_window_problem(np.random.default_rng(7))
        grid = ba_grid.from_flat(prob)

        @functools.partial(jax.jit, static_argnames=("iters", "max_iter"))
        def chain(iters, max_iter, grid=grid):
            def body(carry, _):
                g = grid._replace(rvecs=grid.rvecs + carry * 1e-30)
                kw = dict(kwargs, max_iterations=max_iter)
                _, _, _, stats = ba_pallas.ba_solve_grid_pallas(g, **kw)
                return stats.final_sq.astype(jnp.float32), stats.iterations
            carry, its = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=iters)
            return carry, jnp.sum(its)

        def best_of(max_iter, k=512, repeats=8):
            c, its = chain(iters=k, max_iter=max_iter)
            jax.block_until_ready(c)
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                c, its = chain(iters=k, max_iter=max_iter)
                jax.block_until_ready(c)
                best = min(best, time.perf_counter() - t0)
            return best, int(its)

        d_lo, i_lo = best_of(10)
        d_hi, i_hi = best_of(50)
        us_per_iter = 1e6 * (d_hi - d_lo) / (i_hi - i_lo)
        rows.append((P, us_per_iter))
        print(json.dumps({"P": P, "obs": 4 * P,
                          "us_per_lm_iteration": round(us_per_iter, 2)}),
              flush=True)

    (p0, t0), (pn, tn) = rows[0], rows[-1]
    ratio = tn / t0
    print(json.dumps({
        "metric": "window_kernel_floor",
        "P_span": f"{p0}->{pn} ({pn // p0}x points)",
        "time_ratio": round(ratio, 2),
        "latency_bound": bool(ratio < 2.0),
        "note": ("time_ratio << P ratio => the LM body is dependency-latency "
                 "bound; per-iteration FLOPs are nearly free and MFU is not "
                 "the binding metric for this kernel"),
    }))


if __name__ == "__main__":
    main()
