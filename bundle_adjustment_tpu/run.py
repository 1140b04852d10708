"""CLI driver: the TPU-native equivalent of the reference's main()
(ref: src/main.py:20-102) with argparse presets instead of hard-coded paths.

Usage:
    python -m bundle_adjustment_tpu.run --preset desk \
        --images /root/reference/desk_images --out /tmp/out
    python -m bundle_adjustment_tpu.run --preset video --video data/video.mp4 \
        --start 90 --end 1400 --out output_map
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import time

import numpy as np

from bundle_adjustment_tpu import config as cfg_mod
from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
from bundle_adjustment_tpu.utils.event_log import EventLog
from bundle_adjustment_tpu.utils.io import image_folder_frames, video_frames

PRESETS = {
    "desk": cfg_mod.preset_desk,
    "scout": cfg_mod.preset_scout,
    "video": cfg_mod.preset_video,
    "lehman_indoor": cfg_mod.preset_lehman_indoor,
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", choices=sorted(PRESETS), default="video")
    p.add_argument("--video", help="video file input")
    p.add_argument("--images", help="image folder input (sorted)")
    p.add_argument("--start", type=int, default=0, help="first video frame")
    p.add_argument("--end", type=int, default=None, help="last video frame (exclusive)")
    p.add_argument("--out", default="output_map")
    p.add_argument("--debug", action="store_true",
                   help="write per-keyframe debug artifacts (plots, PCDs)")
    p.add_argument("--pcd-series", action="store_true",
                   help="write a per-keyframe PCD replay series "
                        "(render with tools/render_pcd_folder.py)")
    p.add_argument("--consistent-convention", action="store_true",
                   help="use the geometrically consistent pose chain instead "
                        "of the reference-parity quirk (see config.py)")
    p.add_argument("--features", type=int, default=None)
    p.add_argument("--features-from-cv2", action="store_true",
                   help="inject cv2.ORB keypoints/descriptors instead of the "
                        "TPU extractor (detector-vs-geometry isolation; "
                        "SURVEY §7 escape hatch)")
    p.add_argument("--fx", type=float, default=None,
                   help="override camera intrinsics (use with --fy/--cx/--cy)")
    p.add_argument("--fy", type=float, default=None)
    p.add_argument("--cx", type=float, default=None)
    p.add_argument("--cy", type=float, default=None)
    p.add_argument("--size", default=None, metavar="WxH",
                   help="frame size for the camera model, e.g. 640x480")
    p.add_argument("--no-clean", action="store_true",
                   help="keep existing output dir contents")
    p.add_argument("--pallas", action="store_true", default=None,
                   help="force the Pallas matcher (default: auto on TPU)")
    p.add_argument("--platform", choices=["cpu", "tpu"], default=None,
                   help="force the jax backend (overrides JAX_PLATFORMS; "
                        "useful where a site plugin pins the platform)")
    p.add_argument("--mesh", type=int, default=None, metavar="N",
                   help="shard bundle adjustment over N devices (distributed "
                        "Schur reduction; psum over ICI)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the frame loop into "
                        "<out>/jax_trace (view with xprof/tensorboard)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() so multi-host "
                        "meshes (parallel/) span the slice; use the standard "
                        "JAX coordinator env vars")
    p.add_argument("--checkpoint", default=None,
                   help="resume from this checkpoint and save back to it at "
                        "the end of the run")
    p.add_argument("--prewarm", action="store_true",
                   help="compile (or cache-load) the pipeline's shape "
                        "buckets on a synthetic warmup BEFORE the frame "
                        "loop (utils/prewarm.py; VERDICT r04 #7 cold start)")
    p.add_argument("--no-pipelined", action="store_true",
                   help="disable pipeline-parallel frame overlap (issue frame "
                        "N+1's fused dispatch only after frame N's readback)")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        import jax

        jax.distributed.initialize()
    # durable on-disk compile cache: a machine only ever compiles a
    # (function, shape) bucket once (utils/prewarm.py; VERDICT r04 #7)
    from bundle_adjustment_tpu.utils.prewarm import (enable_persistent_cache,
                                                     prewarm)

    enable_persistent_cache()
    cfg = PRESETS[args.preset]()
    overrides = {"output_dir": args.out, "debug": args.debug,
                 "export_pcd_series": args.pcd_series}
    if args.consistent_convention:
        overrides["consistent_convention"] = True
    if args.features:
        overrides["num_features"] = args.features
    if args.features_from_cv2:
        overrides["features_source"] = "cv2"
    if args.mesh:
        overrides["mesh_shape"] = (1, args.mesh)
    if args.fx is not None:
        from bundle_adjustment_tpu.config import CameraModel

        w, h = (cfg.camera.width, cfg.camera.height)
        if args.size:
            w, h = (int(x) for x in args.size.lower().split("x"))
        overrides["camera"] = CameraModel(
            fx=args.fx, fy=args.fy if args.fy is not None else args.fx,
            cx=args.cx if args.cx is not None else w / 2,
            cy=args.cy if args.cy is not None else h / 2,
            width=w, height=h,
        )
    cfg = dataclasses.replace(cfg, **overrides)

    if not args.no_clean and os.path.isdir(args.out):
        shutil.rmtree(args.out)  # ref: src/main.py:44-48 clean_directories
    os.makedirs(args.out, exist_ok=True)

    log = EventLog(os.path.join(args.out, "events.jsonl"), echo=True)
    resumed_frames = 0
    if args.checkpoint and os.path.exists(args.checkpoint):
        from bundle_adjustment_tpu.utils.checkpoint import load_checkpoint

        pipe = load_checkpoint(args.checkpoint, cfg, log=log,
                               use_pallas_matcher=args.pallas)
        # pipe.frame_idx counts frames already consumed (0-based); skip that
        # many source frames so the resumed run does not re-ingest them into
        # the restored map (duplicate keyframes/observations otherwise)
        resumed_frames = pipe.frame_idx + 1
        print(f"Resumed from {args.checkpoint}: frame {pipe.frame_idx}, "
              f"{pipe.map.num_keyframes} keyframes; skipping the first "
              f"{resumed_frames} already-processed source frames")
    else:
        pipe = VisualOdometryPipeline(cfg, log=log, use_pallas_matcher=args.pallas)

    if args.prewarm:
        info = prewarm(cfg, use_pallas=args.pallas)
        log.emit("prewarm",
                 f"Prewarm: {info['frames']} synthetic frames in "
                 f"{info['prewarm_s']} s (shape buckets compiled/cached)",
                 **info)

    if args.images:
        frames = image_folder_frames(args.images)
    elif args.video:
        frames = video_frames(args.video, start=args.start, end=args.end)
    else:
        raise SystemExit("provide --video or --images")
    from bundle_adjustment_tpu.utils.io import prefetch

    frames = prefetch(frames)  # overlap decode with device compute

    if args.profile:
        import jax

        jax.profiler.start_trace(os.path.join(args.out, "jax_trace"))

    def _skip(src, n):
        for i, f in enumerate(src):
            if i >= n:
                yield f

    if resumed_frames:
        frames = _skip(frames, resumed_frames)

    t0 = time.perf_counter()
    n_frames = 0
    if args.no_pipelined:
        for frame in frames:
            pipe.process_frame(frame)
            n_frames += 1
    else:
        # pipeline-parallel: frame N+1's fused dispatch overlaps frame N's
        # readback + host bookkeeping (models/pipeline.py::process_stream)
        for _ in pipe.process_stream(frames):
            n_frames += 1
    elapsed = time.perf_counter() - t0

    if args.checkpoint:
        from bundle_adjustment_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(pipe, args.checkpoint)
    if args.profile:
        import jax

        jax.profiler.stop_trace()
    summary = pipe.finalize(args.out)
    summary["frames"] = n_frames
    summary["elapsed_s"] = round(elapsed, 3)
    summary["frames_per_s"] = round(n_frames / max(elapsed, 1e-9), 3)
    log.metric("frames_per_s", summary["frames_per_s"], frames=n_frames)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    log.close()
    return summary


if __name__ == "__main__":
    main()
