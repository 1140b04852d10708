"""Cold-start mitigation: persistent compile cache + shape-bucket prewarm.

The reference pays zero compile cost (cv2/scipy ship compiled,
/root/reference/src/main.py:20-102 starts processing immediately); our
pipeline pays one XLA compile per (function, shape-bucket) the run touches —
measured at 1.1 fps first run vs 14.4 fps warm (BENCH_r04
``frontend_fps_first_run``).  Two mechanisms close that gap (VERDICT r04 #7):

1. ``enable_persistent_cache()`` — JAX's on-disk compilation cache, so a
   process only ever *compiles* a (function, shape) once per machine; later
   processes deserialize the executable instead (~100 ms vs 5-40 s through
   the remote-compile tunnel).
2. ``prewarm(cfg)`` (``run.py --prewarm``) — drives a tiny synthetic
   sequence at the configured camera geometry through a scratch pipeline
   BEFORE the real frame loop, so the data-independent shape buckets (the
   fused tracked dispatch, matcher, pose RANSAC, keyframe insertion, the
   small-window BA grids) compile — or load from the on-disk cache — up
   front instead of stalling the first real frames.

What prewarm cannot pin down: BA problem buckets are pow-2 sized from live
map content (``map_store.gather_window``), so a real run can still hit a
point/observation bucket the synthetic warmup didn't.  Those compile once
mid-run and land in the persistent cache for every later run — the cache is
the durable mechanism, prewarm is the first-session accelerator.
"""

from __future__ import annotations

import dataclasses
import os
import tempfile
import time


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's compilation cache at a durable on-disk directory.

    Resolution order: explicit arg > ``BA_TPU_JAX_CACHE`` env var >
    ``~/.cache/bundle_adjustment_tpu/jax``.  Safe to call more than once.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("BA_TPU_JAX_CACHE")
    if cache_dir is None:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                 "bundle_adjustment_tpu", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # the default 1 s threshold skips exactly the many medium executables
    # (matcher, insertion helpers, small BA grids) whose sum IS the cold
    # start; cache everything non-trivial
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return cache_dir


def prewarm(cfg, use_pallas: bool | None = None, echo: bool = False) -> dict:
    """Compile (or cache-load) the pipeline's shape buckets ahead of the run.

    Two segments over one synthetic strafe sequence at ``cfg.camera``'s
    geometry:

    * forced-keyframe frames (feature-ratio trigger always fires) walk the
      bootstrap, insertion/triangulation, and window-BA buckets for every
      window length up to ``cfg.ba.window_size``;
    * never-keyframe frames compile the fused TRACKED dispatch — the
      per-frame hot path a deployment spends almost all its time in.

    The scratch pipeline shares the module-level ``lru_cache``'d jit
    builders with the real one (same config => same executables in-process)
    and everything it compiles lands in the persistent cache for later
    processes.  Returns timing + bucket counts for the log.
    """
    from bundle_adjustment_tpu.config import KeyframeCriteria
    from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
    from bundle_adjustment_tpu.utils.event_log import EventLog
    from bundle_adjustment_tpu.utils.synthetic import synthetic_sequence

    t0 = time.perf_counter()
    cam = cfg.camera
    n_forced = cfg.ba.window_size + 4   # windows of every length + refine
    n_tracked = 4
    frames, _, _, _ = synthetic_sequence(
        n_frames=n_forced + n_tracked, width=cam.width, height=cam.height,
        fx=cam.fx, motion="strafe")

    force_kf = KeyframeCriteria(min_feature_ratio=2.0)  # criterion 4 always
    never_kf = KeyframeCriteria(
        min_parallax_deg=1e9, min_median_displacement_px=1e9,
        min_rotation_rad=1e9, min_feature_ratio=0.0)

    with tempfile.TemporaryDirectory(prefix="ba_prewarm_") as tmp:
        warm_cfg = dataclasses.replace(
            cfg, output_dir=tmp, debug=False, export_pcd_series=False,
            keyframe=force_kf,
            # keep the scratch run moving even if synthetic tracking is
            # weaker than the preset expects
            min_tracked_features=min(cfg.min_tracked_features, 12),
            pose_inlier_numbers=min(cfg.pose_inlier_numbers, 12),
        )
        pipe = VisualOdometryPipeline(warm_cfg, log=EventLog(echo=echo),
                                      use_pallas_matcher=use_pallas)
        for f in frames[:n_forced]:
            pipe.process_frame(f)
        # keyframe criteria are host-side per-frame reads; swapping them
        # changes no compiled bucket, just routes frames to the tracked path
        pipe.cfg = dataclasses.replace(warm_cfg, keyframe=never_kf)
        for f in frames[n_forced:]:
            pipe.process_frame(f)
        kfs = pipe.map.num_keyframes

    return {
        "prewarm_s": round(time.perf_counter() - t0, 2),
        "frames": n_forced + n_tracked,
        "keyframes": kfs,
    }
