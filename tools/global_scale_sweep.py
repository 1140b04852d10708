"""Measured global-BA throughput at the LARGE camera counts the gates admit.

The compile smoke proves the fused kernels COMPILE through C=8192
(bench.py `ba_global_compile_smoke`), and bench measures C=200/C=1000 every
round — but the sizes between smoke and measurement (C=2048/4096/8192, the
scales a >1000-keyframe map actually solves at; the reference's global BA
runs at any map size, /root/reference/src/main.py:80-89) had no committed
measured rate.  This sweep reuses bench's exact problem generator and
chained-dispatch marginal protocol at those sizes and prints one JSON line,
so BASELINE's large-C rows reproduce from a committed harness.

    python tools/global_scale_sweep.py                 # C = 2048 4096 8192
    python tools/global_scale_sweep.py --cams 2048     # one size
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cams", type=int, nargs="+", default=[2048, 4096, 8192])
    ap.add_argument("--pts-per-cam", type=int, default=120,
                    help="P = cams * this (bench's C=1000 row uses 120)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args(argv)

    import jax

    from bench import _marginal_estimate, make_global_problem
    from bundle_adjustment_tpu.ops import ba_global_pallas, ba_grid

    out = {"metric": "ba_global_scale_sweep",
           "backend": jax.default_backend(), "sizes": {}}
    for C in args.cams:
        P = C * args.pts_per_cam
        rng = np.random.default_rng(13)
        prob = make_global_problem(rng, C=C, P=P)
        grid = ba_grid.from_flat(prob)
        if not (jax.default_backend() == "tpu"
                and ba_global_pallas.kernel_eligible_global(grid, n_fixed=1)):
            out["sizes"][str(C)] = {"path": "ineligible"}
            continue

        box = {}

        def timed_run(iters):
            st = jax.device_get(ba_global_pallas.ba_solve_global_pallas(
                grid, n_fixed=1, max_iterations=iters, ftol=0.0, xtol=0.0,
                lambda_max=1e30, cg_iters=8, cg_tol=1e-6, cg_forcing=True)[3])
            box["st"] = st
            return int(st.iterations)

        per_iter, spread = _marginal_estimate(timed_run, 21,
                                              repeats=args.repeats, passes=2)
        st = box["st"]
        assert np.isfinite(float(st.final_sq))
        out["sizes"][str(C)] = {
            "P": P, "O": int(np.sum(np.asarray(prob.obs_mask) > 0)),
            "iters_per_s": round(1.0 / per_iter, 1),
            "ms_per_iter": round(1e3 * per_iter, 2),
            "spread_pct": round(100 * spread, 1),
            "initial_sq": float(st.initial_sq),
            "final_sq": float(st.final_sq),
            "path": "pallas_kernel",
        }
        print(json.dumps({C: out["sizes"][str(C)]}), flush=True)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
