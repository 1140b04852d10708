"""End-to-end frames/s: the reference pipeline's OWN code vs this framework
on the SAME frames at reference settings (VERDICT r2 #2).

The reference publishes no throughput numbers (BASELINE.md), so the baseline
is measured here by executing its actual code (/root/reference/src via
tools/run_reference.py) on a synthetic 1280x720 sequence with 4000 ORB
features, ratio 0.75, window-5 LBA — the src/main.py configuration — and
identical (relaxed) reliability gates for both pipelines so each produces a
keyframe chain on the synthetic content.

Ours is timed twice: a cold pass (includes jit compiles; first run on a new
machine) and a warm pass (fresh pipeline instance, compile cache populated —
every run after the first).  The warm number is the steady-state headline;
both are reported.  Keyframe/point counts for both pipelines are in the
output so the comparison is transparent about how much work each did.

    python tools/e2e_fps.py --platform tpu --frames 40
    python tools/e2e_fps.py --platform cpu --frames 24   # functional check
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GATES = dict(min_matches=20, inlier_ratio_gate=0.3, inlier_number_gate=15)


def time_ours(frames, K, use_pallas: bool):
    from bundle_adjustment_tpu.config import (BAConfig, CameraModel,
                                              PipelineConfig)
    from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
    from bundle_adjustment_tpu.utils.event_log import EventLog

    cfg = PipelineConfig(
        camera=CameraModel(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                           width=frames[0].shape[1],
                           height=frames[0].shape[0]),
        num_features=4000,                      # ref: src/main.py:60
        min_tracked_features=GATES["min_matches"],
        pose_inlier_ratio=GATES["inlier_ratio_gate"],
        pose_inlier_numbers=GATES["inlier_number_gate"],
        consistent_convention=True,
        ba=BAConfig(window_size=5),             # ref: src/parameters.py:19
    )
    pipe = VisualOdometryPipeline(cfg, log=EventLog(echo=False),
                                  use_pallas_matcher=use_pallas)
    t0 = time.perf_counter()
    for _ in pipe.process_stream(frames):  # pipeline-parallel overlap
        pass
    frame_loop_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    pipe.run_global_ba()
    global_ba_s = time.perf_counter() - t0
    return frame_loop_s, global_ba_s, pipe.map.num_keyframes, \
        pipe.map.num_points


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--motion", default="orbit")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    from bundle_adjustment_tpu.utils.synthetic import synthetic_sequence

    frames, K, _, _ = synthetic_sequence(
        n_frames=args.frames, width=1280, height=720, fx=912.78,
        motion=args.motion, seed=args.seed)
    n = len(frames)

    out = {"metric": "e2e_fps", "frames": n, "motion": args.motion,
           "resolution": "1280x720", "features": 4000}

    if not args.skip_reference:
        from run_reference import run_reference

        _, ref_pts, ref_kfs, _, ref_t = run_reference(
            frames, K, "/tmp/e2e_ref", ratio_test=0.75,
            keyframe_criteria=None, return_timings=True, **GATES)
        out.update(
            ref_fps=round(n / ref_t["frame_loop_s"], 3),
            ref_frame_loop_s=round(ref_t["frame_loop_s"], 2),
            ref_global_ba_s=round(ref_t["global_ba_s"], 2),
            ref_keyframes=len(ref_kfs), ref_points=ref_pts)

    use_pallas = jax.default_backend() == "tpu"
    cold_s, cold_gba_s, _, _ = time_ours(frames, K, use_pallas)
    warm_s, warm_gba_s, kfs, pts = time_ours(frames, K, use_pallas)
    out.update(
        ours_fps=round(n / warm_s, 3),
        ours_frame_loop_s=round(warm_s, 2),
        ours_global_ba_s=round(warm_gba_s, 2),
        ours_cold_fps=round(n / cold_s, 3),
        ours_keyframes=kfs, ours_points=pts,
        backend=jax.default_backend())
    if "ref_fps" in out:
        out["fps_vs_reference"] = round(out["ours_fps"] / out["ref_fps"], 2)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
