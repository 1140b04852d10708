"""Per-stage breakdown of ORB extraction on TPU (companion to
tools/profile_ba.py; same scanned K-minus-1 marginal protocol).

Stages, per pyramid level 0 (1280x720):
  blur      — 7x7 separable Gaussian (describe prerequisite)
  fast      — FAST-9 bit-arc score map
  nms       — 3x3 non-max suppression
  harris    — Harris response map
  moments   — dense intensity-centroid moment maps (orientation)
  topk      — approx_max_k over the full H*W score map
  describe  — patch slice-gather + binned-pattern MXU matmul
  extract   — the full multi-level pipeline (what the frontend pays)

Stage chains feed outputs back through a float multiply (x + 0.0*sum(out));
integer feedbacks are constant-folded by XLA and get DCE'd to ~0 ms.

    python tools/profile_orb.py            # real TPU
    python tools/profile_orb.py --cpu
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


def marginal_time(run, k_hi=16, repeats=3):
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


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--features", type=int, default=4000)
    ap.add_argument("--levels", type=int, default=8)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))

    import jax.numpy as jnp

    from bundle_adjustment_tpu.ops import orb

    H, W = 720, 1280
    rng = np.random.default_rng(1)
    img_u8 = jnp.asarray(rng.integers(0, 255, size=(H, W), dtype=np.uint8))
    img = img_u8.astype(jnp.float32)
    budget = orb.level_budgets(args.features, args.levels, 1.2)[0]

    def chain(step, init, perturb):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def go(x0, iters):
            def body(carry, _):
                out = step(carry)
                return perturb(carry, out), None
            carry, _ = jax.lax.scan(body, x0, None, length=iters)
            return carry
        return lambda k: go(init, iters=k)

    eps = jnp.float32(1e-20)
    stages = {}

    def feedback(x, o):
        tot = sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(o))
        return (x + eps * tot).astype(x.dtype) if x.dtype == jnp.float32 \
            else x

    stages["blur"] = marginal_time(chain(orb.gaussian_blur, img, feedback))
    stages["fast"] = marginal_time(chain(
        lambda x: orb.fast_score_map(x, 20.0), img, feedback))
    score0 = orb.fast_score_map(img, 20.0)
    stages["nms"] = marginal_time(chain(orb._nms3, score0, feedback))
    stages["harris"] = marginal_time(chain(orb.harris_response, img, feedback))
    stages["moments"] = marginal_time(chain(orb._moment_maps, img, feedback))

    rank0 = jnp.where(orb._nms3(score0) > 0, orb.harris_response(img), -jnp.inf)

    def topk_step(r):
        tv, ti = jax.lax.approx_max_k(r.reshape(-1), budget,
                                      recall_target=0.95)
        return tv

    stages["topk"] = marginal_time(chain(topk_step, rank0, feedback))

    _, ti = jax.lax.top_k(rank0.reshape(-1), budget)
    yx0 = jnp.stack([ti // W, ti % W], axis=1).astype(jnp.int32)

    blurred = orb.gaussian_blur(img)
    ang0 = jnp.asarray(rng.uniform(-np.pi, np.pi, budget), jnp.float32)

    def describe_step(a):
        return orb._describe(blurred, yx0, a).astype(jnp.float32)

    stages["describe"] = marginal_time(chain(
        describe_step, ang0, lambda a, o: a + eps * jnp.sum(o)))

    def extract_step(im):
        kp = orb.extract(im, num_features=args.features, levels=args.levels,
                         height=H, width=W)
        return kp

    stages["extract_full"] = marginal_time(chain(
        extract_step, img_u8,
        lambda im, kp: im.at[0, 0].add((kp.desc[0, 0] & 1).astype(jnp.uint8))))

    out = {
        "metric": "orb_extract_breakdown",
        "image": f"{W}x{H}, {args.features} features, {args.levels} levels "
                 f"(level-0 budget {budget})",
        "backend": jax.default_backend(),
        "stage_ms": {k: round(v * 1e3, 3) for k, v in stages.items()},
        "note": "per-level stages are level 0 only; extract_full is all levels",
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
