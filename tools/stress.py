"""Reference-scale long-sequence stress harness (committed; VERDICT r1 #3).

Generates a LONG synthetic video (default 600 frames; the reference's real
runs span frames 90-1400, /root/reference/legacy/local_BA_sparsity.py:698)
of a closed textured room with revisits and occlusion, drives the
lehman_indoor preset (culling + relocalization) END-TO-END through the CLI
(bundle_adjustment_tpu.run), and scores the run: keyframes, culled points,
pruned observations, divergences, relocalizations, capacity drops, ATE vs
the ground-truth trajectory, and frames/s.

One command reproduces the BASELINE.md numbers:

    python tools/stress.py --frames 600 --out /tmp/stress

Notes: runs on the CPU backend by default (the axon TPU tunnel pays a
per-dispatch round trip that makes 600-frame validation impractical; kernel
perf is bench.py's job).  ~10 min at 600 frames.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--motion", default="room", choices=["room", "strafe", "orbit"])
    ap.add_argument("--seed", type=int, default=2)
    ap.add_argument("--out", default="/tmp/stress_out")
    ap.add_argument("--preset", default="lehman_indoor")
    ap.add_argument("--features", type=int, default=1500)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--staged", action="store_true",
                    help="disable the fused frontend (for A/B comparison)")
    ap.add_argument("--dedup-px", type=float, default=None,
                    help="override ops.orb._DEDUP_CELL_PX for this run "
                         "(the r05 multi-seed dedup/ATE study, BASELINE.md)")
    args = ap.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from bundle_adjustment_tpu.utils.synthetic import synthetic_sequence, write_video
    from bundle_adjustment_tpu.utils.metrics import ate_rmse

    os.makedirs(args.out, exist_ok=True)
    print(f"rendering {args.frames}-frame '{args.motion}' sequence...",
          flush=True)
    frames, K, gt_C, gt_R = synthetic_sequence(
        n_frames=args.frames, motion=args.motion, seed=args.seed)
    video = os.path.join(args.out, "sequence.mp4")
    write_video(frames, video)

    run_out = os.path.join(args.out, "run")
    cli = ["--preset", args.preset, "--video", video, "--out", run_out,
           "--fx", str(K[0, 0]), "--size", "640x480",
           "--consistent-convention", "--features", str(args.features)]

    from bundle_adjustment_tpu import run as run_mod

    if args.dedup_px is not None:
        # must land before the first ORB trace: the constant is read at
        # trace time and baked into the jitted extractor
        from bundle_adjustment_tpu.ops import orb as orb_mod

        orb_mod._DEDUP_CELL_PX = float(args.dedup_px)

    if args.staged:
        # A/B hook: patch the preset to the staged per-op frontend
        import dataclasses

        orig = run_mod.PRESETS[args.preset]
        run_mod.PRESETS[args.preset] = (
            lambda: dataclasses.replace(orig(), fused_frontend=False))

    t0 = time.perf_counter()
    summary = run_mod.main(cli)
    elapsed = time.perf_counter() - t0

    # ---- score the run ----------------------------------------------------
    events = [json.loads(l) for l in open(os.path.join(run_out, "events.jsonl"))]

    def count(ev):
        return sum(1 for e in events if e["event"] == ev)

    culled = sum(e.get("culled", 0) for e in events if e["event"] == "cull")
    pruned = sum(e.get("pruned", 0) for e in events if e["event"] == "prune")
    cap_drops = sum(e.get("dropped_obs", 0) + e.get("dropped_points", 0)
                    for e in events if e["event"] == "capacity_drop")
    reloc_ok = sum(1 for e in events
                   if e["event"] == "relocalization" and e.get("success"))
    reloc_fail = sum(1 for e in events
                     if e["event"] == "relocalization" and not e.get("success"))
    closures = [e for e in events if e["event"] == "loop_closure"]

    # ATE: match keyframe trajectory rows to GT by source frame index
    est, gt = [], []
    with open(os.path.join(run_out, "trajectory.txt")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            v = line.split()
            fi = int(v[0])
            if 0 <= fi < len(gt_C):
                est.append([float(v[2]), float(v[3]), float(v[4])])
                gt.append(gt_C[fi])
    est = np.asarray(est)
    gt = np.asarray(gt)
    ate = ate_rmse(est, gt) if len(est) >= 3 else float("nan")
    path_len = float(np.sum(np.linalg.norm(np.diff(gt_C, axis=0), axis=1)))

    result = {
        "frames": args.frames,
        "seed": args.seed,
        "dedup_px": args.dedup_px,
        "motion": args.motion,
        "fused_frontend": not args.staged,
        "keyframes": summary["num_keyframes"],
        "map_points": summary["num_points"],
        "observations": summary["num_observations"],
        "culled_points": int(culled),
        "pruned_obs": int(pruned),
        "capacity_drops": int(cap_drops),
        "divergences": count("ba_diverged"),
        "reloc_success": int(reloc_ok),
        "reloc_fail": int(reloc_fail),
        "loop_closures": len(closures),
        "loop_fused_points": int(sum(e.get("fused", 0) for e in closures)),
        "frames_discarded": count("frame_discarded"),
        "ate_rmse": round(float(ate), 4),
        "ate_pct_of_path": round(100.0 * float(ate) / max(path_len, 1e-9), 3),
        "gt_path_len": round(path_len, 3),
        "frames_per_s": summary["frames_per_s"],
        "elapsed_s": round(elapsed, 1),
        "backend": args.platform,
    }
    with open(os.path.join(args.out, "stress_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
