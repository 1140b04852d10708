"""The frame-pipeline orchestrator: the TPU-native VisualOdometryPipeline.

Mirrors the reference's per-frame control flow (ref: src/pipeline.py:41-99):
grayscale -> extract -> (first frame: init map at identity,
src/pipeline.py:101-110) -> match vs last keyframe only -> min-match gate ->
essential-matrix pose -> reliability gate -> keyframe decision -> insertion
(re-observation vs triangulation split, src/pipeline.py:226-313) -> windowed
local BA with divergence rollback (src/bundle_adjuster.py:122-193).

Host/device split (SURVEY §3.2 note): image -> device for extraction;
descriptors stay device-resident; one small host sync for the gates/keyframe
decision; BA fully on device; host keeps the id/bookkeeping mirror.

Documented divergences from the reference (all strict improvements, flagged
per SURVEY §2.4/§7 rather than silently introduced):
- The reference's `_add_new_keyframe` mis-aligns triangulated points with
  their match indices when cheirality drops points (it ignores the valid-index
  return at src/pipeline.py:288); we keep the association correct.
- The reference's parallax lookup skips map-point id 0 (`if mp_id` is falsy
  for 0 at src/keyframe_detector.py:51); we treat id 0 like any other.
- RANSAC is batched-hypothesis (fixed 1024 samples) rather than early-exit
  sequential; with prob=.999 the reference's expected trial count is similar.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.config import PipelineConfig
from bundle_adjustment_tpu.models.keyframe import decide_keyframe
from bundle_adjustment_tpu.models.map_store import Keyframe, Map
from bundle_adjustment_tpu.ops import ba, hamming, orb, ransac, triangulation
from bundle_adjustment_tpu.ops.lie import rotation_angle
from bundle_adjustment_tpu.utils.event_log import EventLog
from bundle_adjustment_tpu.utils import viz


def _grid_shape_key(grid):
    """jit-bucket identity of a grid problem: (C, P, D).  The per-shape
    kernel-failure latch keys on this (ADVICE r04: a deterministic Mosaic
    failure at one oversized shape must not disable proven shapes)."""
    P, D = grid.cam_slot.shape
    return (int(grid.rvecs.shape[0]), int(P), int(D))


@functools.lru_cache(maxsize=64)
def _build_lba_refine_fn(use_pallas: bool, n_fixed: int, opts: tuple,
                         has_refine: bool, refine_iters: int,
                         refine_huber: float, prune_thr: float):
    """Window LBA + optional motion-only refine of the newest keyframe +
    post-BA outlier classification, fused into ONE jitted dispatch whose
    host-needed outputs are packed into a single flat f32 vector (one device
    pull).  On a remote-dispatch rig each dispatch or pull is a full tunnel
    round trip; the staged insertion path cost ~6 of them here (VERDICT r2
    #2).  Packed layout, with C cameras, O observation slots, P point slots:
      [rv (C*3) | tv (C*3) | window stats (6) | refine rvec+tvec+stats (12) |
       bad-observation mask (O) | points (P*3)]"""
    from bundle_adjustment_tpu.ops import ba_grid, ba_pallas

    optd = dict(opts)

    def impl(grid, problem, *maybe_refine):
        if use_pallas:
            rv, tv, pts, stats = ba_pallas.ba_solve_grid_pallas(
                grid, n_fixed=n_fixed, **optd)
        else:
            rv, tv, pts, stats = ba_grid.ba_solve_grid_impl(
                grid, n_fixed=n_fixed, **optd)
        f32 = jnp.float32
        stats_v = jnp.stack([
            stats.initial_cost.astype(f32), stats.final_cost.astype(f32),
            stats.initial_sq.astype(f32), stats.final_sq.astype(f32),
            stats.iterations.astype(f32), stats.accepted.astype(f32)])
        if has_refine:
            rp = maybe_refine[0]
            # motion-only BA: every point masked out of the parameter set
            # (V^-1 = 0 => the reduced system is the camera block alone)
            rp = rp._replace(point_mask=jnp.zeros_like(rp.point_mask))
            rrv, rtv, _, rstats = ba.ba_solve_impl(
                rp, n_fixed=0, max_iterations=refine_iters,
                huber_delta=refine_huber)
            refine_v = jnp.concatenate([
                rrv[0].astype(f32), rtv[0].astype(f32),
                jnp.stack([rstats.initial_sq.astype(f32),
                           rstats.final_sq.astype(f32),
                           rstats.iterations.astype(f32),
                           rstats.accepted.astype(f32),
                           jnp.float32(0.0), jnp.float32(0.0)])])
        else:
            refine_v = jnp.zeros(12, f32)
        if prune_thr > 0:
            r = ba._residuals(rv, tv, pts, problem)
            norms = jnp.linalg.norm(r, axis=1)
            bad = (problem.obs_mask > 0) & (norms > prune_thr)
        else:
            bad = jnp.zeros(problem.uv.shape[0], bool)
        return jnp.concatenate([
            rv.reshape(-1).astype(f32), tv.reshape(-1).astype(f32),
            stats_v, refine_v, bad.astype(f32),
            pts.reshape(-1).astype(f32)])

    return jax.jit(impl)


class VisualOdometryPipeline:
    def __init__(self, config: PipelineConfig, log: Optional[EventLog] = None,
                 use_pallas_matcher: Optional[bool] = None):
        self.cfg = config
        self.map = Map()
        self.log = log or EventLog(echo=False)
        self.map.log = self.log  # capacity_drop events surface in the stream
        self.frame_idx = -1
        self.K = config.camera.K
        self._key = jax.random.PRNGKey(0)
        self._dispatch_key = jax.random.PRNGKey(1)  # fold_in by frame index
        self._lost_frames = 0
        self._last_debug_frame = None
        self._mesh = None
        self._pallas_ba_broken = False  # set on first Mosaic compile failure
        # shape keys (C, P, D) whose fused global kernels failed twice: a
        # deterministic compile/VMEM failure is shape-specific, so latching
        # ONE oversized bucket must not disable proven smaller shapes
        # (ADVICE r04); truthiness preserved — non-empty means "something
        # is latched"
        self._global_pallas_broken: set = set()
        self._last_loop_kf = -(10 ** 9)  # loop-closure cooldown tracker
        # fused-frontend device mirror of the last keyframe (models/frontend)
        self._front_state = None
        self._front_state_kf = -1
        self._front_dirty = False
        if use_pallas_matcher is None:
            use_pallas_matcher = jax.default_backend() == "tpu"
        self.use_pallas_matcher = use_pallas_matcher
        # jit the frame-to-frame match+gather step once
        self._match_fn = jax.jit(self._match_device)

    # -- device helpers ----------------------------------------------------

    def _match_device(self, desc1, valid1, desc2, valid2):
        idx, mask, dist = hamming.match(
            desc1, desc2, valid1, valid2,
            ratio=self.cfg.ratio_test, cross_check=self.cfg.cross_check,
            use_pallas=False,  # jit-internal; pallas variant used via flag below
        )
        return idx, mask, dist

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # -- pipeline ----------------------------------------------------------

    def _extract(self, gray: np.ndarray) -> orb.Keypoints:
        if self.cfg.features_source == "cv2":
            return self._extract_cv2(gray)
        return orb.extract(
            jnp.asarray(gray),
            num_features=self.cfg.num_features,
            levels=self.cfg.pyramid_levels,
            scale=self.cfg.pyramid_scale,
            threshold=float(self.cfg.fast_threshold),
            height=gray.shape[0],
            width=gray.shape[1],
        )

    def _extract_cv2(self, gray: np.ndarray) -> orb.Keypoints:
        """cv2.ORB feature injection (SURVEY §7 hard-part-1 escape hatch,
        ref: src/features.py:13-16): the reference's exact detector/descriptor
        feeding our matcher/pose/BA stack, padded to the static capacity.
        Lets an ATE difference be attributed to the detector vs the geometry."""
        import cv2

        if not hasattr(self, "_cv2_orb"):
            self._cv2_orb = cv2.ORB_create(nfeatures=self.cfg.num_features)
        kps, des = self._cv2_orb.detectAndCompute(gray, None)
        N = self.cfg.num_features
        xy = np.zeros((N, 2), np.float32)
        d8 = np.zeros((N, 32), np.uint8)
        valid = np.zeros(N, bool)
        resp = np.zeros(N, np.float32)
        ang = np.zeros(N, np.float32)
        size = np.zeros(N, np.float32)
        lvl = np.zeros(N, np.int32)
        n = 0
        if kps:
            n = min(len(kps), N)
            xy[:n] = [k.pt for k in kps[:n]]
            d8[:n] = des[:n]
            valid[:n] = True
            resp[:n] = [k.response for k in kps[:n]]
            ang[:n] = np.radians([k.angle for k in kps[:n]])
            size[:n] = [k.size for k in kps[:n]]
            lvl[:n] = [k.octave for k in kps[:n]]
        return orb.Keypoints(
            xy=jnp.asarray(xy),
            response=jnp.asarray(resp),
            angle=jnp.asarray(ang),
            size=jnp.asarray(size),
            level=jnp.asarray(lvl),
            desc=hamming.pack_u8_to_u32(jnp.asarray(d8)),
            valid=jnp.asarray(valid),
        )

    def process_frame(self, frame_bgr: np.ndarray, _gray=None,
                      _res=None) -> dict:
        """Process one BGR frame.  Returns a result dict with the decision
        chain (used by tests and the metrics layer).  ``_gray``/``_res``:
        internal — a speculatively-dispatched fused-frontend result from
        process_stream's pipeline-parallel overlap."""
        t_start = time.perf_counter()
        result = self._process_frame_inner(frame_bgr, _gray, _res)
        # per-frame stage timing (SURVEY §5 tracing: structured, per-stage)
        self.log.emit("frame_timing", None, frame_idx=self.frame_idx,
                      status=result.get("status"),
                      total_ms=round((time.perf_counter() - t_start) * 1e3, 2))
        return result

    def _fusable(self) -> bool:
        """True when the fused single-dispatch tracked path applies."""
        return (self.cfg.fused_frontend and self.cfg.pnp_first
                and self.cfg.pnp_scale and self.map.num_keyframes > 0
                and self.cfg.features_source == "orb_tpu")

    def _ensure_front_state(self) -> int:
        """Refresh the device mirror of the last keyframe if stale; returns
        the last keyframe id."""
        from bundle_adjustment_tpu.models import frontend

        last_id = self.map.sorted_kf_ids()[-1]
        if (self._front_state is None or self._front_state_kf != last_id
                or self._front_dirty):
            self._front_state = frontend.make_state(
                self.map.keyframes[last_id], self.map.points(),
                self.cfg.num_features)
            self._front_state_kf = last_id
            self._front_dirty = False
        return last_id

    def _fused_dispatch(self, gray: np.ndarray, frame_idx: int = None):
        """Issue the fused tracked-frame dispatch against the CURRENT front
        state (async; nothing is read back here).  The PnP RANSAC key is
        derived from the TARGET frame index (fold_in), so a speculative
        dispatch from process_stream and a sequential one for the same frame
        are bit-identical."""
        from bundle_adjustment_tpu.models import frontend

        if frame_idx is None:
            frame_idx = self.frame_idx
        self._ensure_front_state()
        fn = frontend.build_track_fn(
            self.cfg.num_features, self.cfg.pyramid_levels,
            self.cfg.pyramid_scale, float(self.cfg.fast_threshold),
            gray.shape[0], gray.shape[1], self.cfg.ratio_test,
            self.cfg.cross_check, self.use_pallas_matcher,
            self.cfg.pnp_iters, self.cfg.pnp_reproj_err_px,
            self.cfg.ransac_threshold_px, self.cfg.consistent_convention,
        )
        return fn(jnp.asarray(gray), self._front_state,
                  jnp.asarray(self.K, jnp.float32),
                  jax.random.fold_in(self._dispatch_key, frame_idx))

    def process_stream(self, frames):
        """Generator over per-frame results with PIPELINE-PARALLEL overlap
        (SURVEY §2.5 PP row): frame N+1's fused tracked dispatch is issued
        BEFORE frame N's scalar readback, so the device extracts/matches
        frame N+1 while the host runs frame N's gates and bookkeeping — and,
        on a remote-dispatch rig, the two tunnel round trips overlap.  The
        speculation is against the current last-keyframe mirror; when frame
        N turns out to be a keyframe (or relocalizes, or BA moves the map)
        the speculative dispatch is discarded and reissued — rare by design.
        Results are yielded in frame order with identical semantics to
        process_frame."""
        import cv2

        pending = None  # (frame_bgr, gray, speculative TrackResult or None)
        for frame_bgr in frames:
            if pending is None:
                pending = (frame_bgr, None, None)
                continue
            spec = gray = None
            if self._fusable():
                gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)
                # pending will be frame_idx+1; this frame is frame_idx+2
                spec = self._fused_dispatch(gray, self.frame_idx + 2)
                token = (self._front_state_kf, self.map.num_keyframes)
            yield self.process_frame(pending[0], pending[1], pending[2])
            if spec is not None and (
                    self._front_dirty
                    or (self._front_state_kf, self.map.num_keyframes) != token):
                spec = None  # map/pose state moved: speculation invalid
            pending = (frame_bgr, gray, spec)
        if pending is not None:
            yield self.process_frame(pending[0], pending[1], pending[2])

    def _process_frame_inner(self, frame_bgr: np.ndarray, gray=None,
                             res=None) -> dict:
        import cv2

        self.frame_idx += 1
        self.log.frame(self.frame_idx)
        if gray is None:
            gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)

        # fused tracked-frame path: ONE device dispatch + one scalar readback
        # (models/frontend.py); the staged path below remains for the first
        # frame, fused_frontend=False, cv2 feature injection, and non-PnP
        # configurations
        if self._fusable():
            return self._process_frame_fused(gray, frame_bgr, res=res)

        kp = self._extract(gray)

        if self.map.num_keyframes == 0:
            self._initialize_map(frame_bgr, kp)
            return {"status": "initialized", "kf_id": 0}

        last_id = self.map.sorted_kf_ids()[-1]
        last_kf = self.map.keyframes[last_id]

        if self.use_pallas_matcher:
            from bundle_adjustment_tpu.ops.hamming_pallas import knn2_pallas

            best, idx, second = knn2_pallas(
                last_kf.desc, kp.desc, kp.valid
            )
            mask = hamming.ratio_test_mask(best, second, self.cfg.ratio_test)
            mask = mask & jnp.asarray(last_kf.kp_valid)
            dist = best
        else:
            idx, mask, dist = self._match_fn(
                last_kf.desc, jnp.asarray(last_kf.kp_valid), kp.desc, kp.valid
            )

        match_idx = np.asarray(idx)
        match_mask = np.asarray(mask)
        n_matches = int(match_mask.sum())

        if n_matches < self.cfg.min_tracked_features:
            self.log.frame_discarded(self.frame_idx, "Not enough matches to track.")
            return self._tracking_lost(frame_bgr, kp, "matches")

        kp_xy = np.asarray(kp.xy)
        uv1 = last_kf.xy                       # slot-aligned query keypoints
        uv2 = kp_xy[match_idx]                 # matched train keypoints

        # -- pose: PnP-first on tracked frames, essential RANSAC otherwise --
        # The PnP pose chain (see config.pnp_scale/pnp_first) anchors the new
        # pose to the map; its relative model then classifies epipolar
        # inliers in one Sampson pass — the 5-point hypothesis machinery only
        # runs at initialization and on tracking loss.
        world_pose_override = None
        R_rel = t_rel = inl = None
        tracked_n = int((match_mask & (last_kf.kp_to_mp >= 0)).sum())
        if (self.cfg.pnp_scale and self.cfg.pnp_first
                and tracked_n >= self.cfg.pnp_scale_min_tracked):
            pnp = self._pnp_pose(last_kf, kp_xy, match_idx, match_mask)
            if pnp is not None:
                R_pnp, t_pnp = pnp
                R_rel = R_pnp @ last_kf.R.T
                t_rel = t_pnp - R_rel @ last_kf.t
                inl = self._epipolar_inliers(R_rel, t_rel, uv1, uv2, match_mask)
                if self.cfg.consistent_convention:
                    world_pose_override = (R_pnp, t_pnp)

        if R_rel is None:
            pose = ransac.estimate_essential_pose(
                self._next_key(),
                jnp.asarray(uv1, jnp.float32),
                jnp.asarray(uv2, jnp.float32),
                jnp.asarray(match_mask),
                jnp.asarray(self.K, jnp.float32),
                threshold_px=self.cfg.ransac_threshold_px,
                num_hyp=self.cfg.ransac_iters,
                quality=dist,  # PROSAC-style best-matches-first sampling
            )
            if not bool(pose.ok):
                self.log.pose(self.frame_idx, 0, n_matches, 0.0)
                self.log.frame_discarded(self.frame_idx, "Could not estimate pose.")
                return self._tracking_lost(frame_bgr, kp, "pose")
            R_rel = np.asarray(pose.R, np.float64)
            t_rel = np.asarray(pose.t, np.float64)
            inl = np.asarray(pose.inliers)
            # scale from PnP even when the essential model won the pose
            if self.cfg.pnp_scale and tracked_n >= self.cfg.pnp_scale_min_tracked:
                pnp = self._pnp_pose(last_kf, kp_xy, match_idx, match_mask)
                if pnp is not None:
                    R_pnp, t_pnp = pnp
                    R_rel_pnp = R_pnp @ last_kf.R.T
                    t_rel_pnp = t_pnp - R_rel_pnp @ last_kf.t
                    if self.cfg.consistent_convention:
                        world_pose_override = (R_pnp, t_pnp)
                        R_rel, t_rel = R_rel_pnp, t_rel_pnp
                    else:
                        s = float(np.clip(np.linalg.norm(t_rel_pnp), 1e-3, 1e3))
                        t_rel = t_rel * s

        num_inliers = int(inl.sum())
        inlier_ratio = num_inliers / max(n_matches, 1)
        self.log.pose(self.frame_idx, num_inliers, n_matches, inlier_ratio)

        reliable = (
            inlier_ratio > self.cfg.pose_inlier_ratio
            and num_inliers > self.cfg.pose_inlier_numbers
        )
        if not reliable:
            self.log.frame_discarded(
                self.frame_idx, "Low inlier ratio or insufficient inliers."
            )
            return self._tracking_lost(frame_bgr, kp, "unreliable")

        self._lost_frames = 0

        # -- keyframe decision (ref: src/keyframe_detector.py:21-87) -------
        tracked_slots = inl & (last_kf.kp_to_mp >= 0)
        tracked_mp = last_kf.kp_to_mp[tracked_slots]
        if self.cfg.consistent_convention:
            R_new, t_new = self._compose(last_kf.R, last_kf.t, R_rel, t_rel)
            last_center = -last_kf.R.T @ last_kf.t
            new_center = -R_new.T @ t_new
        else:
            last_center = last_kf.t
            new_center = last_kf.t + last_kf.R @ t_rel
        rot_mag = float(rotation_angle(jnp.asarray(R_rel, jnp.float32)))
        decision = decide_keyframe(
            self.cfg.keyframe,
            tracked_points=self.map.points()[tracked_mp],
            last_cam_center=last_center,
            new_cam_center=new_center,
            uv_last=uv1[inl],
            uv_new=uv2[inl],
            rotation_rad=rot_mag,
            num_inliers=num_inliers,
            num_last_features=int(last_kf.kp_valid.sum()),
        )
        if not decision.is_keyframe:
            return {"status": "tracked", "inliers": num_inliers,
                    "inlier_ratio": inlier_ratio}

        kf_id = self.map.new_keyframe_id()
        self.log.keyframe_trigger(self.frame_idx, kf_id, decision.reason,
                                  decision.metrics)
        self._add_new_keyframe(frame_bgr, kp, last_kf, match_idx, inl, R_rel, t_rel,
                               world_pose=world_pose_override)
        ba_result = self.run_local_ba(
            refine_kf_id=kf_id if self.cfg.pose_refine else None)
        loop_info = self._maybe_close_loop(kf_id)
        return {
            "status": "keyframe",
            "kf_id": kf_id,
            "reason": decision.reason,
            "inliers": num_inliers,
            "inlier_ratio": inlier_ratio,
            "ba": ba_result,
            "loop": loop_info,
        }

    def _process_frame_fused(self, gray: np.ndarray, frame_bgr: np.ndarray,
                             res=None) -> dict:
        """Tracked-frame path as one fused device dispatch (VERDICT round-1
        item 1): extract -> match -> PnP -> Sampson inliers -> keyframe
        metrics on device; gates + decision taxonomy on host from one small
        scalar readback.  Big arrays only cross the host boundary on keyframe
        insertion / essential-RANSAC fallback (rare).  ``res``: an already-
        issued speculative dispatch from process_stream's overlap."""
        import types

        from bundle_adjustment_tpu.models import frontend
        from bundle_adjustment_tpu.models.keyframe import decide_from_metrics

        last_id = self._ensure_front_state()
        last_kf = self.map.keyframes[last_id]
        if res is None:
            res = self._fused_dispatch(gray)

        # THE host sync of the tracked path: ONE packed (34,) vector carrying
        # every scalar and pose (each separate device_get is a full dispatch
        # round trip on remote-dispatch rigs)
        sc = frontend.unpack_scalars(res.packed)
        n_matches = sc.n_matches
        num_inliers = sc.num_inliers

        kp = types.SimpleNamespace(xy=res.kp_xy, desc=res.kp_desc,
                                   valid=res.kp_valid)

        if n_matches < self.cfg.min_tracked_features:
            self.log.frame_discarded(self.frame_idx, "Not enough matches to track.")
            return self._tracking_lost(frame_bgr, kp, "matches")

        world_pose_override = None
        pnp_good = (sc.pnp_ok
                    and sc.tracked_n >= self.cfg.pnp_scale_min_tracked
                    and sc.pnp_inliers >= self.cfg.pnp_scale_min_tracked)
        if pnp_good:
            R_rel = sc.R_rel
            t_rel = sc.t_rel
            inl = None  # (N,) inlier mask pulled only on keyframe insertion
            if self.cfg.consistent_convention:
                world_pose_override = (sc.R_pnp, sc.t_pnp)
            metrics_from_device = True
        else:
            # essential-RANSAC fallback (initialization chains, map-thin
            # frames, PnP failure) — a second dispatch, rare by design
            match_idx = np.asarray(res.match_idx)
            match_mask = np.asarray(res.match_mask)
            kp_xy = np.asarray(res.kp_xy)
            uv1 = last_kf.xy
            uv2 = kp_xy[match_idx]
            pose = ransac.estimate_essential_pose(
                self._next_key(),
                jnp.asarray(uv1, jnp.float32),
                jnp.asarray(uv2, jnp.float32),
                res.match_mask,
                jnp.asarray(self.K, jnp.float32),
                threshold_px=self.cfg.ransac_threshold_px,
                num_hyp=self.cfg.ransac_iters,
                quality=res.match_dist,
            )
            if not bool(pose.ok):
                self.log.pose(self.frame_idx, 0, n_matches, 0.0)
                self.log.frame_discarded(self.frame_idx, "Could not estimate pose.")
                return self._tracking_lost(frame_bgr, kp, "pose")
            R_rel = np.asarray(pose.R, np.float64)
            t_rel = np.asarray(pose.t, np.float64)
            inl = np.asarray(pose.inliers)
            num_inliers = int(inl.sum())
            metrics_from_device = False

        inlier_ratio = num_inliers / max(n_matches, 1)
        self.log.pose(self.frame_idx, num_inliers, n_matches, inlier_ratio)

        reliable = (
            inlier_ratio > self.cfg.pose_inlier_ratio
            and num_inliers > self.cfg.pose_inlier_numbers
        )
        if not reliable:
            self.log.frame_discarded(
                self.frame_idx, "Low inlier ratio or insufficient inliers."
            )
            return self._tracking_lost(frame_bgr, kp, "unreliable")

        self._lost_frames = 0

        if metrics_from_device:
            decision = decide_from_metrics(
                self.cfg.keyframe,
                n_tracked=sc.n_parallax,
                median_parallax_deg=sc.med_parallax_deg,
                median_displacement_px=sc.med_disp_px,
                rotation_rad=sc.rot_mag,
                num_inliers=num_inliers,
                num_last_features=int(last_kf.kp_valid.sum()),
            )
        else:
            # fallback pose: compute the metrics host-side like the staged path
            match_idx = np.asarray(res.match_idx)
            kp_xy = np.asarray(res.kp_xy)
            tracked_slots = inl & (last_kf.kp_to_mp >= 0)
            tracked_mp = last_kf.kp_to_mp[tracked_slots]
            if self.cfg.consistent_convention:
                R_new, t_new = self._compose(last_kf.R, last_kf.t, R_rel, t_rel)
                last_center = -last_kf.R.T @ last_kf.t
                new_center = -R_new.T @ t_new
            else:
                last_center = last_kf.t
                new_center = last_kf.t + last_kf.R @ t_rel
            decision = decide_keyframe(
                self.cfg.keyframe,
                tracked_points=self.map.points()[tracked_mp],
                last_cam_center=last_center,
                new_cam_center=new_center,
                uv_last=last_kf.xy[inl],
                uv_new=kp_xy[match_idx[inl]],
                rotation_rad=sc.rot_mag,
                num_inliers=num_inliers,
                num_last_features=int(last_kf.kp_valid.sum()),
            )

        if not decision.is_keyframe:
            return {"status": "tracked", "inliers": num_inliers,
                    "inlier_ratio": inlier_ratio}

        kf_id = self.map.new_keyframe_id()
        self.log.keyframe_trigger(self.frame_idx, kf_id, decision.reason,
                                  decision.metrics)
        # insertion payload: ONE packed pull instead of per-array round trips
        ins = frontend.unpack_insert(res.insert_packed)
        if inl is None:
            inl = ins.inliers  # deferred to insertion time
        kp_host = types.SimpleNamespace(xy=ins.kp_xy, desc=res.kp_desc,
                                        valid=ins.kp_valid)
        # the speculative triangulation used the PnP relative model; on the
        # essential-RANSAC fallback the model differs — re-triangulate there
        tri = (ins.tri_X, ins.tri_valid) if metrics_from_device else None
        self._add_new_keyframe(
            frame_bgr, kp_host, last_kf, ins.match_idx, inl,
            R_rel, t_rel, world_pose=world_pose_override, tri=tri)
        ba_result = self.run_local_ba(
            refine_kf_id=kf_id if self.cfg.pose_refine else None)
        loop_info = self._maybe_close_loop(kf_id)
        return {
            "status": "keyframe",
            "kf_id": kf_id,
            "reason": decision.reason,
            "inliers": num_inliers,
            "inlier_ratio": inlier_ratio,
            "ba": ba_result,
            "loop": loop_info,
        }

    def _maybe_close_loop(self, kf_id: int):
        """Attempt loop closure for a just-inserted keyframe (after its LBA),
        rate-limited by loop_cooldown keyframes."""
        if not self.cfg.loop_closure:
            return None
        if kf_id - self._last_loop_kf < self.cfg.loop_cooldown:
            return None
        from bundle_adjustment_tpu.models import loop_closure

        info = loop_closure.try_close_loop(self, self.map.keyframes[kf_id])
        if info is not None:
            self._last_loop_kf = kf_id
        return info

    def _epipolar_inliers(self, R_rel, t_rel, uv1, uv2, match_mask):
        """Sampson inlier classification against a known relative model."""
        from bundle_adjustment_tpu.ops.lie import so3_hat
        from bundle_adjustment_tpu.ops.projection import epipolar_errors_px

        t = t_rel / max(np.linalg.norm(t_rel), 1e-12)
        E = np.asarray(so3_hat(jnp.asarray(t, jnp.float32))) @ R_rel.astype(np.float32)
        errs = np.asarray(epipolar_errors_px(
            jnp.asarray(E, jnp.float32), jnp.asarray(self.K, jnp.float32),
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32)))
        return (errs < self.cfg.ransac_threshold_px ** 2) & match_mask

    def _pnp_pose(self, last_kf: Keyframe, kp_xy, match_idx, match_mask):
        """World extrinsic (R, t) of the current frame from PnP against the
        tracked map points, or None when tracking is too thin / PnP fails.
        Stored poses are interpreted as extrinsics — exactly how the BA
        projects them — so the PnP pose is directly comparable."""
        tracked = match_mask & (last_kf.kp_to_mp >= 0)
        slots = np.flatnonzero(tracked)
        if len(slots) < self.cfg.pnp_scale_min_tracked:
            return None
        X = self.map.points()[last_kf.kp_to_mp[slots]]
        uv = kp_xy[match_idx[slots]]
        cap = max(64, 1 << int(np.ceil(np.log2(len(slots)))))
        Xp = np.zeros((cap, 3), np.float32)
        uvp = np.zeros((cap, 2), np.float32)
        Xp[: len(slots)] = X
        uvp[: len(slots)] = uv
        valid = np.arange(cap) < len(slots)

        res = ransac.estimate_pnp_pose(
            self._next_key(),
            jnp.asarray(Xp), jnp.asarray(uvp), jnp.asarray(valid),
            jnp.asarray(self.K, jnp.float32),
            reproj_threshold_px=self.cfg.pnp_reproj_err_px,
            num_hyp=self.cfg.pnp_iters,
        )
        if not bool(res.ok) or int(res.num_inliers) < self.cfg.pnp_scale_min_tracked:
            return None
        R_pnp = np.asarray(res.R, np.float64)
        t_pnp = np.asarray(res.t, np.float64)
        if not (np.isfinite(R_pnp).all() and np.isfinite(t_pnp).all()):
            return None
        return R_pnp, t_pnp

    def _tracking_lost(self, frame_bgr, kp, why: str) -> dict:
        self._lost_frames += 1
        if self.cfg.reloc_enabled and self._lost_frames >= 2:
            from bundle_adjustment_tpu.models.relocalize import try_relocalize

            result = try_relocalize(self, frame_bgr, kp)
            if result is not None:
                self._lost_frames = 0
                return result
        return {"status": "discarded", "why": why}

    def _initialize_map(self, frame_bgr, kp: orb.Keypoints):
        self.log.emit("init", "Initializing with first keyframe...", frame_idx=self.frame_idx)
        kf = Keyframe(
            kf_id=self.map.new_keyframe_id(),
            R=np.eye(3),
            t=np.zeros(3),
            xy=np.asarray(kp.xy, np.float64),
            desc=kp.desc,
            kp_valid=np.asarray(kp.valid),
            frame_idx=self.frame_idx,
        )
        self.map.add_keyframe(kf)
        self.log.keyframe_trigger(self.frame_idx, kf.kf_id, "Initialization", {})

    def _compose(self, last_R, last_t, R_rel, t_rel):
        """Pose composition under the configured convention (see config)."""
        if self.cfg.consistent_convention:
            return R_rel @ last_R, R_rel @ last_t + t_rel
        return last_R @ R_rel, last_t + last_R @ t_rel

    def _cam_to_world(self, last_kf: Keyframe, X_rel: np.ndarray) -> np.ndarray:
        """Transform points from the last KF's camera frame to world."""
        if self.cfg.consistent_convention:
            return (X_rel - last_kf.t) @ last_kf.R  # == R^T (X - t) rowwise
        return (last_kf.R @ X_rel.T).T + last_kf.t  # reference formula

    def _add_new_keyframe(self, frame_bgr, kp: orb.Keypoints, last_kf: Keyframe,
                          match_idx, inl, R_rel, t_rel, world_pose=None,
                          tri=None):
        """Keyframe insertion with re-observation bookkeeping + triangulation
        (ref: src/pipeline.py:226-313).  ``world_pose`` (from the PnP chain)
        overrides the composed pose when provided.  ``tri`` = (X_rel, valid)
        per match slot, speculatively computed inside the fused tracked
        dispatch (models/frontend.py) so insertion needs no triangulation
        dispatch of its own."""
        if world_pose is not None:
            world_R, world_t = world_pose
        else:
            world_R, world_t = self._compose(last_kf.R, last_kf.t, R_rel, t_rel)

        kp_xy = np.asarray(kp.xy, np.float64)
        new_kf = Keyframe(
            kf_id=self.map.new_keyframe_id(),
            R=world_R,
            t=world_t,
            xy=kp_xy,
            desc=kp.desc,
            kp_valid=np.asarray(kp.valid),
            frame_idx=self.frame_idx,
        )
        self.map.add_keyframe(new_kf)

        slots = np.flatnonzero(inl)                     # query kp indices on last KF
        # knnMatch without crosscheck can map several query slots onto one
        # train keypoint; keep only the first per train index so a new-KF
        # keypoint never receives two map points (the reference's dict
        # bookkeeping silently tolerates this; our invariant does not)
        _, first = np.unique(match_idx[slots], return_index=True)
        slots = slots[np.sort(first)]
        mp_of_slot = last_kf.kp_to_mp[slots]
        reobs = mp_of_slot >= 0

        # re-observations: existing map point seen again in the new KF
        r_slots = slots[reobs]
        self.map.add_observations(
            new_kf.kf_id,
            mp_of_slot[reobs],
            match_idx[r_slots],
            kp_xy[match_idx[r_slots]],
        )

        # new points: triangulate in the last KF's frame, then world-transform
        n_slots = slots[~reobs]
        if len(n_slots):
            if tri is not None:
                # speculative per-slot triangulation from the fused tracked
                # dispatch — already pulled, no extra round trip
                X_rel = tri[0][n_slots]
                valid = tri[1][n_slots]
            else:
                uv1 = last_kf.xy[n_slots]
                uv2 = kp_xy[match_idx[n_slots]]
                X_rel, valid = triangulation.triangulate_pair(
                    jnp.asarray(self.K, jnp.float32),
                    jnp.asarray(R_rel, jnp.float32),
                    jnp.asarray(t_rel, jnp.float32),
                    jnp.asarray(uv1, jnp.float32),
                    jnp.asarray(uv2, jnp.float32),
                )
                X_rel = np.asarray(X_rel, np.float64)
                valid = np.asarray(valid)
            self.log.triangulated(self.frame_idx, int(valid.sum()), len(n_slots))
            if valid.any():
                keep = n_slots[valid]
                X_w = self._cam_to_world(last_kf, X_rel[valid])
                uv2k = kp_xy[match_idx[keep]]
                cc = np.clip(np.round(uv2k).astype(int), 0,
                             [frame_bgr.shape[1] - 1, frame_bgr.shape[0] - 1])
                bgr = frame_bgr[cc[:, 1], cc[:, 0]].astype(np.float64)
                colors = bgr[:, ::-1] / 255.0
                mp_ids = self.map.add_map_points(X_w, colors)
                # observed by BOTH keyframes (ref: src/pipeline.py:305-307)
                self.map.add_observations(last_kf.kf_id, mp_ids, keep, last_kf.xy[keep])
                self.map.add_observations(new_kf.kf_id, mp_ids, match_idx[keep],
                                          kp_xy[match_idx[keep]])

        if self.cfg.covis_keyframes > 0:
            self._covisibility_reobserve(new_kf, exclude_id=last_kf.kf_id)

        # pose_refine now rides the LBA dispatch (run_local_ba refine_kf_id)

        if self.cfg.cull_enabled:
            self._cull_points()

        if self.cfg.debug:
            out = self.cfg.output_dir
            viz.plot_and_save_trajectory_2d(
                self.map.trajectory(self.cfg.consistent_convention),
                os.path.join(out, "trajectory_2d"),
                f"kf{new_kf.kf_id:04d}")
            rots = [self.map.keyframes[k].R for k in self.map.sorted_kf_ids()]
            viz.plot_and_save_trajectory_3d(
                self.map.trajectory(self.cfg.consistent_convention), rots,
                os.path.join(out, "trajectory_3d"),
                f"kf{new_kf.kf_id:04d}")
            # reference DEBUG artifacts (src/pipeline.py:59-71, 91-95) + the
            # legacy depth overlay (legacy/depth_estimation.py:176-192)
            sel = slots
            viz.draw_matches(
                self._last_debug_frame if self._last_debug_frame is not None
                else frame_bgr,
                last_kf.xy[sel], frame_bgr, kp_xy[match_idx[sel]],
                os.path.join(out, "debug_matches",
                             f"matches_{new_kf.kf_id:04d}.png"))
            viz.draw_keypoints(
                frame_bgr, kp_xy[np.asarray(kp.valid)],
                os.path.join(out, "debug_keyframes",
                             f"keyframe_{new_kf.kf_id:04d}.png"))
            tracked_now = np.flatnonzero(new_kf.kp_to_mp >= 0)
            if len(tracked_now):
                X = self.map.points()[new_kf.kp_to_mp[tracked_now]]
                depths = X @ new_kf.R[2] + new_kf.t[2]
                viz.draw_depth_overlay(
                    frame_bgr, new_kf.xy[tracked_now], depths,
                    os.path.join(out, "debug_depth",
                                 f"depth_{new_kf.kf_id:04d}.png"))
        self._last_debug_frame = frame_bgr.copy() if self.cfg.debug else None

        if self.cfg.export_pcd_series:
            # per-keyframe PCD replay series (legacy/pc_generator.py:98-101)
            from bundle_adjustment_tpu.utils.io import write_pcd

            pts_w, colors = self.map.get_pcd()
            if len(pts_w):
                write_pcd(os.path.join(self.cfg.output_dir, "pcd_series",
                                       f"frame_{new_kf.kf_id:05d}.pcd"),
                          pts_w, colors)

    def _covisibility_reobserve(self, new_kf: Keyframe, exclude_id: int):
        """Register reprojection-verified re-observations of map points seen
        by recent keyframes (beyond the last one) — longer tracks, less drift.
        Projection uses the extrinsic interpretation of stored poses, i.e.
        exactly the model BA optimizes.

        The WHOLE recent bank is matched + verified in ONE device dispatch
        (frontend.covis_step; one per-keyframe dispatch each cost a full
        tunnel round trip — VERDICT r2 #2); only the sequential
        one-point-per-keypoint bookkeeping stays host-side."""
        from bundle_adjustment_tpu.models import frontend

        recent = [k for k in self.map.sorted_kf_ids()
                  if k not in (new_kf.kf_id, exclude_id)][-self.cfg.covis_keyframes:]
        if not recent:
            return
        pts_all = self.map.points()
        bank_desc = jnp.stack([self.map.keyframes[k].desc for k in recent])
        N = new_kf.xy.shape[0]
        B = len(recent)
        bank_valid = np.zeros((B, N), bool)
        bank_pts = np.zeros((B, N, 3), np.float32)
        bank_tracked = np.zeros((B, N), bool)
        for b, k in enumerate(recent):
            kf = self.map.keyframes[k]
            bank_valid[b] = kf.kp_valid
            tr = kf.kp_to_mp >= 0
            bank_tracked[b] = tr
            if tr.any():
                bank_pts[b, tr] = pts_all[kf.kp_to_mp[tr]]

        fn = frontend.build_covis_fn(
            self.cfg.ratio_test, self.cfg.cross_check,
            self.use_pallas_matcher, float(self.cfg.covis_reproj_px))
        out = np.asarray(fn(
            bank_desc, jnp.asarray(bank_valid), jnp.asarray(bank_pts),
            jnp.asarray(bank_tracked), new_kf.desc,
            jnp.asarray(new_kf.kp_valid),
            jnp.asarray(new_kf.xy, jnp.float32),
            jnp.asarray(new_kf.R, jnp.float32),
            jnp.asarray(new_kf.t, jnp.float32),
            jnp.asarray(self.K, jnp.float32)))

        for b, kf_id in enumerate(recent):
            kf = self.map.keyframes[kf_id]
            idx = out[b, :, 0].astype(np.int64)
            ok = out[b, :, 1] > 0.5
            slots = np.flatnonzero(ok)
            if not len(slots):
                continue
            new_slots = idx[slots]
            # one observation per new keypoint; skip already-assigned ones
            _, first = np.unique(new_slots, return_index=True)
            keep = np.sort(first)
            slots, new_slots = slots[keep], new_slots[keep]
            free = new_kf.kp_to_mp[new_slots] < 0
            slots, new_slots = slots[free], new_slots[free]
            if not len(slots):
                continue
            mp = kf.kp_to_mp[slots]
            live = mp >= 0  # device verify used insertion-time kp_to_mp too
            slots, new_slots, mp = slots[live], new_slots[live], mp[live]
            if len(slots):
                self.map.add_observations(
                    new_kf.kf_id, mp, new_slots, new_kf.xy[new_slots]
                )
                self.log.emit(
                    "covis",
                    f"    -> Covisibility: +{len(slots)} re-observations vs KF {kf_id}",
                    kf_id=new_kf.kf_id, anchor_kf=kf_id, added=len(slots),
                )

    def _refine_pose_only(self, kf_id: int):
        """Motion-only BA: optimize one keyframe's pose over its observations
        with the map fixed.  Implemented through the regular Schur solver by
        masking every point out of the parameter set (point_mask False =>
        V^-1 = 0 => the reduced system is the camera block alone)."""
        gathered = self.map.gather_window([kf_id], self.K,
                                          self.cfg.ba.max_points, self.cfg.ba.max_obs)
        if gathered is None:
            return
        problem, mp_ids, obs_rows = gathered
        if len(obs_rows) < 10:
            return
        problem = problem._replace(point_mask=jnp.zeros_like(problem.point_mask))
        rv, tv, _, stats = ba.ba_solve(
            problem, n_fixed=0, max_iterations=10,
            huber_delta=self.cfg.ba.huber_delta,
        )
        stats = jax.device_get(stats)
        if bool(stats.accepted) and float(stats.final_sq) < float(stats.initial_sq):
            kf = self.map.keyframes[kf_id]
            from bundle_adjustment_tpu.ops.lie import so3_exp_np

            kf.R = so3_exp_np(np.asarray(rv[0], np.float64))
            kf.t = np.asarray(tv[0], np.float64)

    # -- bundle adjustment glue -------------------------------------------

    def run_local_ba(self, window_size: Optional[int] = None,
                     global_ba: bool = False,
                     refine_kf_id: Optional[int] = None) -> Optional[dict]:
        """Windowed LBA with the reference's window/gauge/divergence semantics
        (ref: src/bundle_adjuster.py:122-193).  Global BA is LBA with
        window_size = num_keyframes (ref: src/main.py:80-89).

        ``refine_kf_id``: also motion-only-refine this keyframe's pose,
        chained into the same device dispatch as the window solve when the
        single-device path runs (VERDICT r2 #2)."""
        w = window_size or self.cfg.ba.window_size
        all_ids = self.map.sorted_kf_ids()
        if len(all_ids) < w:
            self.log.lba_skipped("Not enough keyframes.")
            if refine_kf_id is not None:
                self._refine_pose_only(refine_kf_id)
            return None
        window = all_ids[-(w + 1):-1]
        if len(window) < 2:
            self.log.lba_skipped("No adjustable keyframes.")
            if refine_kf_id is not None:
                self._refine_pose_only(refine_kf_id)
            return None
        return self._solve_window(window, all_ids, global_ba=global_ba,
                                  refine_kf_id=refine_kf_id)

    def run_partitioned_global_ba(self, n_windows: int, mesh=None,
                                  overlap: int = 2,
                                  consensus_rounds: int = 1) -> Optional[dict]:
        """Global BA as partitioned keyframe windows solved in parallel over
        a (win, pt) mesh with sim(3) pose-graph consensus — the lehmanL
        multi-host configuration (BASELINE config 5; SURVEY §2.5 SP/CP row).

        Windows overlap by ``overlap`` keyframes.  Each window's monocular
        solve has a free sim(3) gauge (scale included); consensus chain-
        aligns the windows by sim(3) fit on overlap keyframes, fuses shared
        poses by chordal rotation averaging, and transforms each window's
        points by its alignment before writeback (first owning window wins).
        ``consensus_rounds`` > 1 iterates solve -> reconcile -> re-solve with
        the reconciled poses as the next round's initialization."""
        from bundle_adjustment_tpu.parallel import dist_ba, mesh as mesh_mod

        all_ids = self.map.sorted_kf_ids()
        if len(all_ids) < n_windows * 2:
            self.log.lba_skipped("Not enough keyframes for partitioned BA.")
            return None
        if mesh is None:
            n_dev = len(jax.devices())
            pt = max(n_dev // n_windows, 1)
            mesh = mesh_mod.make_mesh(n_windows, pt)
        n_pt = mesh.shape["pt"]

        parts = dist_ba.partition_windows(len(all_ids), n_windows, overlap)
        window_kf_ids = [np.asarray(all_ids)[w] for w in parts]

        from bundle_adjustment_tpu.ops.lie import so3_exp_np

        t0 = time.perf_counter()
        result = None
        for _round in range(max(1, consensus_rounds)):
            # equal static shapes across windows: global capacity buckets
            problems, mp_lists = [], []
            for ids in window_kf_ids:
                uniq = list(dict.fromkeys(int(k) for k in ids))
                gathered = self.map.gather_window(
                    uniq + [uniq[-1]] * (len(ids) - len(uniq)),  # repeat-pad
                    self.K, self.cfg.ba.max_points, self.cfg.ba.max_obs,
                    pad_to_max=True)
                if gathered is None:
                    self.log.lba_skipped("Empty window in partitioned BA.")
                    return None
                prob, mp_ids, _ = gathered
                problems.append(
                    dist_ba.shard_problem(
                        prob, n_pt,
                        min_obs_capacity=-(-self.cfg.ba.max_obs // max(n_pt, 1)))
                    if n_pt > 1 else prob)
                mp_lists.append(mp_ids)
            shapes = {tuple(p.points.shape) + tuple(p.uv.shape) for p in problems}
            if len(shapes) != 1:
                self.log.lba_skipped("Window shapes differ; falling back to full BA.")
                return self.run_full_ba()

            poses, sim3s, (rvs, tvs, ptss, stats) = dist_ba.solve_windows_consensus(
                problems, window_kf_ids, mesh,
                n_fixed=max(1, min(self.cfg.ba.n_fixed, len(window_kf_ids[0]) - 1)),
                max_iterations=self.cfg.ba.max_iterations,
                huber_delta=self.cfg.ba.huber_delta,
            )

            for kf_id, (rv, tv) in poses.items():
                kf = self.map.keyframes[int(kf_id)]
                kf.R = so3_exp_np(np.asarray(rv, np.float64))
                kf.t = np.asarray(tv, np.float64)
            # points: sim(3)-aligned into the global frame; first owning
            # window wins
            written = set()
            ptss = np.asarray(ptss)
            for w, mp_ids in enumerate(mp_lists):
                s, Rg, tg = sim3s[w]
                pts_w = ptss[w].reshape(-1, 3)[: len(mp_ids)]
                pts_w = (s * pts_w) @ np.asarray(Rg).T + np.asarray(tg)
                fresh = [i for i, mp in enumerate(mp_ids) if mp not in written]
                if fresh:
                    self.map._pts[mp_ids[fresh]] = pts_w[fresh]
                    written.update(int(mp_ids[i]) for i in fresh)

            self._front_dirty = True
            init = float(np.sum(np.asarray(stats.initial_sq)))
            final = float(np.sum(np.asarray(stats.final_sq)))
            result = {"diverged": False, "initial": init, "final": final,
                      "windows": n_windows, "mesh": dict(mesh.shape),
                      "rounds": _round + 1}

        elapsed = time.perf_counter() - t0
        result["elapsed_s"] = elapsed
        self.log.lba(all_ids[-1], result["initial"], result["final"],
                     int(np.max(np.asarray(stats.iterations))),
                     result["final"] >= result["initial"], elapsed,
                     global_ba=True)
        return result

    def run_full_ba(self, max_iterations: Optional[int] = None
                    ) -> Optional[dict]:
        """Full BA over ALL keyframes, including the newest (the reference's
        global BA always excludes it via the [-(w+1):-1] window — this is the
        opt-in completion pass; see config.final_full_ba).  ``max_iterations``
        overrides the config LM cap for THIS solve (loop-closure polish runs
        with its own, smaller cap — config.loop_ba_iters)."""
        all_ids = self.map.sorted_kf_ids()
        if len(all_ids) < 3:
            return None
        return self._solve_window(all_ids, all_ids, global_ba=True,
                                  max_iterations=max_iterations)

    def _try_global_kernel(self, grid, solver_kwargs, path: str):
        """Run the fused global-BA kernels with a retry-once guard.

        The axon remote-compile tunnel occasionally returns transient HTTP
        errors (observed r04: a shape that compiles standalone failed once
        inside a long stress run and the broad except latched the kernels
        off for the remainder).  Retry once; only a REPEATED failure —
        i.e. a deterministic compile limit, the r03 VMEM-OOM class — latches
        THIS problem's shape key in `_global_pallas_broken` (per-shape: one
        oversized window must not disable proven smaller shapes) and routes
        it to the XLA grid/flat path.  Returns (rv, tv, pts, stats) or
        None."""
        from bundle_adjustment_tpu.ops import ba_global_pallas

        last_err = None
        n_attempts = 2
        for attempt in range(n_attempts):
            try:
                return jax.block_until_ready(
                    ba_global_pallas.ba_solve_global_pallas(
                        grid, cg_forcing=True, **solver_kwargs))
            except Exception as e:
                last_err = e
                if attempt + 1 < n_attempts:
                    # transient tunnel failures collide with in-flight
                    # compiles from the speculative frontend; give them
                    # time to drain (no trailing sleep on the final try)
                    time.sleep(2.0)
        self._global_pallas_broken.add(_grid_shape_key(grid))
        self.log.emit(
            "pallas_ba_fallback",
            f"    -> Global Pallas BA kernels unavailable "
            f"({last_err!r}); using the XLA grid/flat solver",
            error=repr(last_err)[:300], path=path)
        return None

    def _solve_window(self, window, all_ids, global_ba: bool = False,
                      refine_kf_id: Optional[int] = None,
                      max_iterations: Optional[int] = None) -> Optional[dict]:

        n_fixed = max(1, min(self.cfg.ba.n_fixed, len(window) - 1))
        max_points, max_obs = self.cfg.ba.max_points, self.cfg.ba.max_obs
        if global_ba:
            # global BA must see the WHOLE map: auto-size the gather capacity
            # to the live map instead of the sliding-window caps (the flat
            # PCG path above pcg_min_cameras handles this scale; shapes are
            # pow-2 bucketed by gather_window so jit reuse is bounded)
            max_points = max(max_points, self.map.num_points)
            max_obs = max(max_obs, self.map.num_observations)
        gathered = self.map.gather_window(window, self.K, max_points, max_obs)
        if gathered is None:
            self.log.lba_skipped("No points in the local window.")
            return None
        problem, mp_ids, obs_rows = gathered

        if self.cfg.debug:
            viz.plot_and_save_sparsity(
                np.asarray(problem.cam_idx), np.asarray(problem.pnt_idx),
                len(window), len(mp_ids),
                os.path.join(self.cfg.output_dir, "debug_sparsity"),
                f"kf{window[0]:04d}_{window[-1]:04d}",
            )

        # save the last optimized KF's pose for chain propagation
        last_opt = self.map.keyframes[window[-1]]
        E_before = (last_opt.R.copy(), last_opt.t.copy())

        solver_kwargs = dict(
            n_fixed=n_fixed,
            max_iterations=(max_iterations if max_iterations is not None
                            else self.cfg.ba.max_iterations),
            huber_delta=self.cfg.ba.huber_delta,
            lambda_init=self.cfg.ba.lambda_init,
            lambda_up=self.cfg.ba.lambda_up,
            lambda_down=self.cfg.ba.lambda_down,
            lambda_min=self.cfg.ba.lambda_min,
            lambda_max=self.cfg.ba.lambda_max,
            ftol=self.cfg.ba.ftol,
            xtol=self.cfg.ba.xtol,
        )
        t0 = time.perf_counter()
        bad_mask = None  # set by the fused single-device path
        # large windows (global BA over a long chain): matrix-free PCG camera
        # solve on the flat path — no (P, C', 6, 3) coupling tensor, no dense
        # (6C')^2 system (see ops/ba._solve_normal_equations)
        if len(window) > self.cfg.ba.pcg_min_cameras:
            solver_kwargs.update(cg_iters=self.cfg.ba.cg_iters,
                                 cg_tol=self.cfg.ba.cg_tol)
            if len(window) - n_fixed >= self.cfg.ba.cg_bf16_min_cameras:
                solver_kwargs.update(cg_bf16=True)
        n_pt = int(np.prod(self.cfg.mesh_shape))
        if n_pt > 1 and len(jax.devices()) >= n_pt:
            # distributed Schur BA: points sharded over all mesh devices,
            # camera system psum'd over ICI (parallel/dist_ba.py)
            from bundle_adjustment_tpu.parallel import dist_ba, mesh as mesh_mod

            if self._mesh is None:
                self._mesh = mesh_mod.make_mesh(1, n_pt)
            sharded = dist_ba.shard_problem(problem, n_pt)
            rv, tv, pts_sh, stats = dist_ba.ba_solve_sharded(
                sharded, self._mesh, axis="pt", **solver_kwargs
            )
            # undo the shard layout: points were re-ordered contiguously
            P_tot = problem.points.shape[0]
            P_s = -(-P_tot // n_pt)
            pts = jnp.asarray(np.asarray(pts_sh)[: n_pt * P_s].reshape(-1, 3)[:P_tot])
        elif "cg_iters" in solver_kwargs:
            # large-window PCG path.  On TPU, the fused Pallas kernels
            # (ops/ba_global_pallas: in-kernel one-hot, f32 end-to-end —
            # measured 5.7x the XLA grid path at C=200 and both faster and
            # lower-cost than its bf16 reductions at C=1000).  Otherwise the
            # scatter-free XLA grid layout (ops/ba_grid._solve_step_pcg —
            # point sums are axis reductions, the camera reduction is one MXU
            # matmul against a (C', P*D) one-hot); the materialized one-hot
            # is its memory cost, so fall back to the flat segment-sum path
            # when it would exceed ~2 GB.
            from bundle_adjustment_tpu.ops import ba_global_pallas, ba_grid

            grid = ba_grid.from_flat(problem, on_drop=lambda n: self.log.emit(
                "capacity_drop",
                f"    -> Grid layout dropped {n} observations (max_slots cap)",
                dropped_obs=int(n)))
            P_g, D_g = grid.cam_slot.shape
            oh_bytes_per = 2 if solver_kwargs.get("cg_bf16") else 4
            onehot_bytes = oh_bytes_per * P_g * D_g * max(len(window) - n_fixed, 1)
            use_global_pallas = (
                jax.default_backend() == "tpu"
                and _grid_shape_key(grid) not in self._global_pallas_broken
                and self.cfg.ba.cg_precond_group == 1
                and ba_global_pallas.kernel_eligible_global(
                    grid, n_fixed=n_fixed))
            if use_global_pallas:
                kw = dict(solver_kwargs)
                kw.pop("cg_bf16", None)  # kernel is f32-exact
                out = self._try_global_kernel(grid, kw, "global")
                if out is not None:
                    rv, tv, pts, stats = out
                else:
                    use_global_pallas = False
            if use_global_pallas:
                pass  # solved above
            elif onehot_bytes <= 2 << 30:
                rv, tv, pts, stats = ba_grid.ba_solve_grid(
                    grid, cg_forcing=True,
                    cg_precond_group=self.cfg.ba.cg_precond_group,
                    **solver_kwargs)
            else:
                solver_kwargs.pop("cg_bf16", None)  # flat path: f32 only
                rv, tv, pts, stats = ba.ba_solve(problem, **solver_kwargs)
        else:
            # single-device fast path: the scatter-free observation-grid
            # solver (ops/ba_grid.py), upgraded to the fused Pallas LM kernel
            # (ops/ba_pallas.py; one device dispatch for the WHOLE solve,
            # ~8 us/LM iteration on v5e) when on TPU and within its bounds.
            # The solve, the new keyframe's motion-only refine, and post-BA
            # outlier classification run as ONE dispatch + ONE flat pull
            # (_build_lba_refine_fn).
            from bundle_adjustment_tpu.ops import ba_grid, ba_pallas

            grid = ba_grid.from_flat(problem, on_drop=lambda n: self.log.emit(
                "capacity_drop",
                f"    -> Grid layout dropped {n} observations (max_slots cap)",
                dropped_obs=int(n)))
            use_pallas = (self.cfg.ba.use_pallas_ba and not self._pallas_ba_broken
                          and jax.default_backend() == "tpu"
                          and ba_pallas.kernel_eligible(grid, n_fixed))

            solved_big = False
            if (not use_pallas and self.cfg.ba.use_pallas_ba
                    and jax.default_backend() == "tpu"
                    and _grid_shape_key(grid) not in
                    self._global_pallas_broken
                    and len(window) - n_fixed >= 2):
                # big-window TPU path: the whole-solve window kernel's
                # compile-proven P<=2048 bound excludes this bucket (a
                # 1500-4000-feature window routinely gathers 4k-11k points),
                # but the P-TILED global fused PCG kernels handle it — ~an
                # order of magnitude over the XLA grid solve these windows
                # previously fell back to.  LM accept/reject + the
                # divergence rollback below absorb the PCG inexactness.
                from bundle_adjustment_tpu.ops import ba_global_pallas

                if ba_global_pallas.kernel_eligible_global(
                        grid, n_fixed=n_fixed):
                    kw = dict(solver_kwargs)
                    kw.update(cg_iters=self.cfg.ba.cg_iters,
                              cg_tol=self.cfg.ba.cg_tol)
                    out = self._try_global_kernel(grid, kw, "big_window")
                    if out is not None:
                        rv, tv, pts, stats = out
                        solved_big = True

            if not solved_big:
                refine_problem = None
                if refine_kf_id is not None:
                    g2 = self.map.gather_window(
                        [refine_kf_id], self.K,
                        self.cfg.ba.max_points, self.cfg.ba.max_obs)
                    if g2 is not None and len(g2[2]) >= 10:
                        refine_problem = g2[0]

                opts = tuple(sorted(
                    (k, int(v) if k == "max_iterations" else float(v))
                    for k, v in solver_kwargs.items() if k != "n_fixed"))
                fn_args = (n_fixed, opts, refine_problem is not None, 10,
                           float(self.cfg.ba.huber_delta),
                           float(self.cfg.prune_obs_reproj_px))
                call_args = (grid, problem) + (
                    (refine_problem,) if refine_problem is not None else ())
                flat = None
                last_err = None
                n_attempts = 2 if use_pallas else 1
                for attempt in range(n_attempts):
                    try:
                        flat = np.asarray(
                            _build_lba_refine_fn(use_pallas, *fn_args)(
                                *call_args),
                            np.float64)
                        break
                    except Exception as e:
                        if not use_pallas:
                            raise
                        last_err = e
                        if attempt + 1 < n_attempts:
                            # transient tunnel failures collide with
                            # in-flight compiles from the speculative
                            # frontend; let them drain before retrying, and
                            # only latch the kernel off on a REPEATED
                            # failure (no trailing sleep on the final try)
                            time.sleep(2.0)
                if flat is None:
                    self._pallas_ba_broken = True
                    self.log.emit(
                        "pallas_ba_fallback",
                        f"    -> Pallas BA kernel unavailable ({last_err!r});"
                        f" using the XLA grid solver",
                        error=repr(last_err)[:300], path="window")
                    flat = np.asarray(
                        _build_lba_refine_fn(False, *fn_args)(*call_args),
                        np.float64)
                C_w = len(window)
                O_w = problem.uv.shape[0]
                rv = flat[: 3 * C_w].reshape(C_w, 3)
                tv = flat[3 * C_w: 6 * C_w].reshape(C_w, 3)
                sv = flat[6 * C_w: 6 * C_w + 6]
                refv = flat[6 * C_w + 6: 6 * C_w + 18]
                bad_mask = flat[6 * C_w + 18: 6 * C_w + 18 + O_w] > 0.5
                pts = flat[6 * C_w + 18 + O_w:].reshape(-1, 3)
                stats = ba.BAStats(
                    initial_cost=sv[0], final_cost=sv[1], initial_sq=sv[2],
                    final_sq=sv[3], iterations=int(sv[4]), accepted=sv[5] > 0.5)
                if refine_problem is not None and bool(refv[9] > 0.5) \
                        and refv[7] < refv[6]:
                    # refine accepted & improved: write the new pose back (the
                    # window solve never touches this keyframe — ref window
                    # choice src/bundle_adjuster.py:140 always excludes it)
                    from bundle_adjustment_tpu.ops.lie import so3_exp_np

                    kf_r = self.map.keyframes[refine_kf_id]
                    kf_r.R = so3_exp_np(refv[0:3])
                    kf_r.t = refv[3:6].copy()
                refine_kf_id = None  # handled; skip the fallback below
        if refine_kf_id is not None:
            # non-fused solver branches (distributed / PCG): refine runs as
            # its own dispatch, as before
            self._refine_pose_only(refine_kf_id)
        if not isinstance(stats, ba.BAStats) or not isinstance(
                stats.final_sq, float):
            stats = jax.device_get(stats)
        elapsed = time.perf_counter() - t0

        # divergence rejection on the raw squared cost — the reference's
        # np.sum(res.fun**2) comparison (src/bundle_adjuster.py:176-179)
        diverged = float(stats.final_sq) >= float(stats.initial_sq)
        self.log.lba(window[-1], float(stats.initial_sq), float(stats.final_sq),
                     int(stats.iterations), diverged, elapsed, global_ba=global_ba)
        if diverged:
            return {"diverged": True, "initial": float(stats.initial_sq),
                    "final": float(stats.final_sq), "elapsed_s": elapsed}

        self.map.apply_ba_result(window, mp_ids, rv, tv, pts, n_fixed=n_fixed)
        self._front_dirty = True  # poses/points moved under the device mirror

        if self.cfg.prune_obs_reproj_px > 0:
            # post-BA outlier pruning on the solved window's residuals
            # (classified on-device by the fused path; recomputed here only
            # for the distributed/PCG branches)
            if bad_mask is None:
                r = np.asarray(ba._residuals(
                    jnp.asarray(rv, jnp.float32), jnp.asarray(tv, jnp.float32),
                    jnp.asarray(pts, jnp.float32), problem))
                norms = np.linalg.norm(r, axis=1)
                live = np.asarray(problem.obs_mask) > 0
                bad_mask = live & (norms > self.cfg.prune_obs_reproj_px)
            bad = bad_mask
            n_bad = int(bad[: len(obs_rows)].sum())
            if n_bad:
                self.map.kill_observations(obs_rows[bad[: len(obs_rows)]])
                self.log.emit("prune",
                              f"    -> Pruned {n_bad} outlier observations after BA.",
                              pruned=n_bad)

        if self.cfg.propagate_ba_correction:
            # E_j' = (E_j E_k^-1) E_k'  keeps each post-window KF's relative
            # pose to the last optimized KF k (extrinsic interpretation —
            # the one BA itself uses)
            R_b, t_b = E_before
            R_a, t_a = last_opt.R, last_opt.t
            for j in all_ids:
                if j <= window[-1]:
                    continue
                kf = self.map.keyframes[j]
                R_rel = kf.R @ R_b.T
                t_rel = kf.t - R_rel @ t_b
                kf.R = R_rel @ R_a
                kf.t = R_rel @ t_a + t_rel

        if self.cfg.debug:
            from bundle_adjustment_tpu.utils.io import write_pcd

            pts_w, colors = self.map.get_pcd()
            write_pcd(
                os.path.join(self.cfg.output_dir, "lba_steps",
                             f"map_after_lba_kf_{window[0]:04d}.pcd"),
                pts_w, colors,
            )
        return {
            "diverged": False,
            "initial": float(stats.initial_sq),
            "final": float(stats.final_sq),
            "iterations": int(stats.iterations),
            "elapsed_s": elapsed,
            "n_cams": len(window),
            "n_points": len(mp_ids),
            "n_obs": len(obs_rows),  # live rows gathered (no device pull)
        }

    def run_global_ba(self) -> Optional[dict]:
        """Final global BA: the reference temporarily sets window_size to the
        keyframe count (src/main.py:80-89), so the newest KF stays excluded."""
        return self.run_local_ba(window_size=self.map.num_keyframes, global_ba=True)

    # -- map maintenance ---------------------------------------------------

    def _write_debug_videos(self, out: str):
        """Assemble keyframe/match/depth overlay videos from the per-keyframe
        debug images (the legacy scripts' cv2.VideoWriter outputs)."""
        import glob as _glob

        import cv2

        for sub, name in (("debug_keyframes", "keypoint_video.mp4"),
                          ("debug_matches", "match_video.mp4"),
                          ("debug_depth", "depth_video.mp4")):
            paths = sorted(_glob.glob(os.path.join(out, sub, "*.png")))
            if not paths:
                continue
            first = cv2.imread(paths[0])
            h, w = first.shape[:2]
            vw = cv2.VideoWriter(os.path.join(out, name),
                                 cv2.VideoWriter_fourcc(*"mp4v"), 5, (w, h))
            for p in paths:
                img = cv2.imread(p)
                if img is not None and img.shape[:2] == (h, w):
                    vw.write(img)
            vw.release()

    def _cull_points(self):
        """Drop weakly-observed points once they leave the active window
        (SURVEY §5 long-context: designed fresh; the reference never deletes)."""
        w_ids = set(self.map.sorted_kf_ids()[-(self.cfg.ba.window_size + 1):])
        counts = self.map.observation_count_per_point()
        alive = self.map.point_alive()
        # a point is safe while any of its observations is in the window
        n = self.map._n_obs
        in_window = np.zeros(len(counts), bool)
        obs_alive = self.map._obs_alive[:n]
        obs_kf = self.map._obs_kf[:n]
        obs_mp = self.map._obs_mp[:n]
        for k in w_ids:
            in_window[obs_mp[obs_alive & (obs_kf == k)]] = True
        weak = alive & ~in_window & (counts < self.cfg.cull_min_observations)
        if weak.any():
            self.map.cull_points(np.flatnonzero(weak))
            self.log.emit("cull", f"    -> Culled {int(weak.sum())} weak map points.",
                          culled=int(weak.sum()))

    # -- finalization ------------------------------------------------------

    def finalize(self, out_dir: Optional[str] = None) -> dict:
        """Global BA + artifact export (ref: src/main.py:80-102)."""
        out = out_dir or self.cfg.output_dir
        result = self.run_global_ba()
        if self.cfg.final_full_ba:
            full = self.run_full_ba()
            if full is not None:
                result = full
        pts, colors = self.map.get_pcd()
        os.makedirs(out, exist_ok=True)
        if len(pts):
            from bundle_adjustment_tpu.utils.io import write_pcd

            if self.cfg.export_voxel > 0:
                from bundle_adjustment_tpu.native import voxel_downsample_native

                pts, colors = voxel_downsample_native(pts, colors,
                                                      self.cfg.export_voxel)
            write_pcd(os.path.join(out, "final_map_global_ba.pcd"), pts, colors)

        if self.cfg.debug:
            # overlay videos from the per-keyframe debug frames
            # (legacy/vo.py:143-146, depth_estimation.py:227)
            self._write_debug_videos(out)
        viz.plot_and_save_trajectory_2d(self.map.trajectory(self.cfg.consistent_convention),
                                        os.path.join(out, "trajectory_2d"), "final")
        rots = [self.map.keyframes[k].R for k in self.map.sorted_kf_ids()]
        viz.plot_and_save_trajectory_3d(self.map.trajectory(self.cfg.consistent_convention), rots,
                                        os.path.join(out, "trajectory_3d"), "final")

        # machine-readable trajectory (TUM-ish: frame_idx kf_id cx cy cz + so3)
        from bundle_adjustment_tpu.ops.lie import so3_log_np

        traj = self.map.trajectory(self.cfg.consistent_convention)
        with open(os.path.join(out, "trajectory.txt"), "w") as f:
            f.write("# frame_idx kf_id cx cy cz wx wy wz\n")
            for k, c in zip(self.map.sorted_kf_ids(), traj):
                kf = self.map.keyframes[k]
                w = so3_log_np(kf.R)
                f.write(f"{kf.frame_idx} {k} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
                        f"{w[0]:.6f} {w[1]:.6f} {w[2]:.6f}\n")
        return {
            "num_keyframes": self.map.num_keyframes,
            "num_points": self.map.num_points,
            "num_observations": self.map.num_observations,
            "global_ba": result,
        }
