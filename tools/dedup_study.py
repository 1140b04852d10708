"""Multi-seed 600-frame stress study deciding the ORB dedup cell (r05).

Round 4 changed `ops.orb._DEDUP_CELL_PX` 3 px -> 1 px on PAIRWISE evidence
(the orb_quality scorecard: RANSAC inliers 0.69x -> 1.27x cv2) but the same
change moved the single-seed 600-frame stress ATE 5.6% -> 8.1% — the proxy
metric and the end metric ordered oppositely on ONE seed.  A single-seed ATE
with +-45% swing is not decision grade either way, so this harness runs the
full end-to-end stress (closure on, lehman_indoor preset — the reference's
long-sequence regime, /root/reference/legacy/local_BA_sparsity.py:698) over
N seeds x dedup in {1 px, 3 px} and reports mean +- spread, which is what
BASELINE.md's r05 stress section and the final dedup choice are built from.

    python tools/dedup_study.py --seeds 2 3 4 5 6 --frames 600 \
        --out /tmp/dedup_study

Each (seed, dedup) cell is an independent subprocess (fresh jit caches; the
dedup constant is baked at first trace).  ~10 min/cell on this host's CPU.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cell(seed: int, dedup: float, frames: int, out_dir: str,
             platform: str = "cpu") -> dict:
    cell = os.path.join(out_dir, f"s{seed}_d{dedup:g}_{platform}")
    res_path = os.path.join(cell, "stress_result.json")
    if os.path.exists(res_path):
        return json.load(open(res_path))
    cmd = [sys.executable, os.path.join(REPO, "tools", "stress.py"),
           "--frames", str(frames), "--seed", str(seed),
           "--dedup-px", str(dedup), "--out", cell,
           "--platform", platform]
    t0 = time.perf_counter()
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if p.returncode != 0:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
        return {"seed": seed, "dedup_px": dedup, "failed": True,
                "elapsed_s": round(time.perf_counter() - t0, 1)}
    return json.load(open(res_path))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, nargs="+", default=[2, 3, 4, 5, 6])
    ap.add_argument("--dedup", type=float, nargs="+", default=[1.0, 3.0])
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--out", default="/tmp/dedup_study")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    cells = []
    for dedup in args.dedup:
        for seed in args.seeds:
            r = run_cell(seed, dedup, args.frames, args.out, args.platform)
            cells.append(r)
            print(json.dumps({k: r.get(k) for k in (
                "seed", "dedup_px", "ate_pct_of_path", "keyframes",
                "loop_closures", "divergences", "frames_discarded",
                "failed")}), flush=True)

    summary = {"frames": args.frames, "platform": args.platform,
               "seeds": args.seeds, "by_dedup": {}}
    for dedup in args.dedup:
        ates = [r["ate_pct_of_path"] for r in cells
                if r.get("dedup_px") == dedup and not r.get("failed")]
        if not ates:
            continue
        summary["by_dedup"][f"{dedup:g}"] = {
            "n": len(ates),
            "ate_pct_mean": round(statistics.mean(ates), 2),
            "ate_pct_stdev": round(statistics.stdev(ates), 2)
            if len(ates) > 1 else 0.0,
            "ate_pct_min": min(ates),
            "ate_pct_max": max(ates),
            "ate_pct_all": ates,
            "closures_mean": round(statistics.mean(
                [r["loop_closures"] for r in cells
                 if r.get("dedup_px") == dedup and not r.get("failed")]), 2),
        }
    with open(os.path.join(args.out, "dedup_study.json"), "w") as f:
        json.dump({"summary": summary, "cells": cells}, f, indent=2)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
