"""Fused per-frame frontend: ONE device dispatch for the tracked-frame path.

The reference's hot loop (ref: src/pipeline.py:41-99) is extract -> match ->
pose -> gates -> keyframe decision.  Round 1 translated each stage into its
own device call with host syncs between — ~5-8 round trips per frame; through
a remote device tunnel each trip costs tens of ms, so the pipeline measured
~0.1 fps while device compute summed to single-digit ms (BASELINE.md).

This module fuses the whole tracked path into one jitted function:

    ORB extract -> Hamming 2-NN + ratio -> PnP RANSAC against the tracked
    map points -> relative model -> Sampson epipolar inliers -> keyframe
    METRICS (median parallax / displacement / rotation magnitude)

The host reads back one small scalar bundle (a handful of numbers) to run
the decision cascade — min-match gate, reliability gate, keyframe criteria
(ref: src/pipeline.py:55-87, src/keyframe_detector.py:21-87) — and pulls the
big per-keypoint arrays only when a keyframe is actually inserted.  The
5-point essential machinery stays out of this path entirely (it runs as a
separate dispatch on initialization / tracking loss only).

Inputs live in a device-resident ``FrontendState`` mirror of the last
keyframe (descriptor bank, keypoint grid, per-slot map-point positions,
pose), refreshed by the pipeline only when a keyframe event or BA writeback
changes it — never per tracked frame.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.ops import hamming, orb, ransac, triangulation
from bundle_adjustment_tpu.ops.lie import so3_exp, so3_hat, rotation_angle
from bundle_adjustment_tpu.ops.projection import epipolar_errors_px


class FrontendState(NamedTuple):
    """Device mirror of the last keyframe (what matching/PnP need)."""

    desc: jnp.ndarray      # (N, 8) u32 descriptor bank
    xy: jnp.ndarray        # (N, 2) f32 keypoint pixels
    kp_valid: jnp.ndarray  # (N,) bool
    pts3d: jnp.ndarray     # (N, 3) f32 map-point position per slot (0 if none)
    tracked: jnp.ndarray   # (N,) bool — slot has a map point
    rvec: jnp.ndarray      # (3,) f32 so(3) of the extrinsic R
    tvec: jnp.ndarray      # (3,) f32


class TrackResult(NamedTuple):
    """Everything the host needs.  All per-frame scalars AND poses are packed
    into ONE (34,) f32 vector so the tracked path costs exactly one device
    transfer (on a remote-dispatch rig every separate device_get is a visible
    round trip — pulling 10 scalars + 2 poses individually was ~5x the
    latency of this single pull).  Big per-keypoint arrays stay on device and
    are pulled only on keyframe insertion / fallback paths."""

    # packed layout (34,) f32:
    #   0 n_matches | 1 tracked_n | 2 pnp_ok | 3 pnp_inliers | 4 num_inliers
    #   5 rot_mag | 6 n_parallax | 7 med_parallax_deg | 8 med_disp_px
    #   9 n_kp_valid | 10:19 R_pnp | 19:22 t_pnp | 22:31 R_rel | 31:34 t_rel
    packed: jnp.ndarray
    # per-keypoint arrays (stay on device until needed)
    kp_xy: jnp.ndarray            # (M, 2)
    kp_desc: jnp.ndarray          # (M, 8)
    kp_valid: jnp.ndarray         # (M,)
    match_idx: jnp.ndarray        # (N,)
    match_mask: jnp.ndarray       # (N,)
    match_dist: jnp.ndarray       # (N,)
    inliers: jnp.ndarray          # (N,)
    # everything keyframe INSERTION needs, as ONE (N, 10) f32 matrix so the
    # insertion path costs one device pull instead of ~6 (VERDICT r2 #2).
    # cols: 0 match_idx | 1 match_mask | 2 inliers | 3:6 speculative DLT
    # triangulation of each match in the last KF's frame | 6 tri_valid
    # (cheirality & inlier) | 7:9 kp_xy | 9 kp_valid
    insert_packed: jnp.ndarray


class TrackScalars(NamedTuple):
    """Host-side unpacked view of TrackResult.packed."""

    n_matches: int
    tracked_n: int
    pnp_ok: bool
    pnp_inliers: int
    num_inliers: int
    rot_mag: float
    n_parallax: int
    med_parallax_deg: float
    med_disp_px: float
    n_kp_valid: int
    R_pnp: "np.ndarray"
    t_pnp: "np.ndarray"
    R_rel: "np.ndarray"
    t_rel: "np.ndarray"


def unpack_scalars(packed) -> TrackScalars:
    import numpy as np

    v = np.asarray(packed, np.float64)
    return TrackScalars(
        n_matches=int(v[0]), tracked_n=int(v[1]), pnp_ok=bool(v[2] > 0.5),
        pnp_inliers=int(v[3]), num_inliers=int(v[4]), rot_mag=float(v[5]),
        n_parallax=int(v[6]), med_parallax_deg=float(v[7]),
        med_disp_px=float(v[8]), n_kp_valid=int(v[9]),
        R_pnp=v[10:19].reshape(3, 3), t_pnp=v[19:22],
        R_rel=v[22:31].reshape(3, 3), t_rel=v[31:34],
    )


def _masked_median(values, mask):
    """Median over the masked subset; nan when the subset is empty."""
    v = jnp.where(mask, values, jnp.nan)
    return jnp.nanmedian(v)


def track_step(
    image_u8: jnp.ndarray,
    state: FrontendState,
    K: jnp.ndarray,
    key: jnp.ndarray,
    *,
    num_features: int,
    levels: int,
    pyramid_scale: float,
    fast_threshold: float,
    height: int,
    width: int,
    ratio: float,
    cross_check: bool,
    use_pallas: bool,
    pnp_iters: int,
    pnp_reproj_px: float,
    sampson_thr_px: float,
    consistent: bool,
) -> TrackResult:
    """The fused tracked-frame step (jit this with everything after * static)."""
    kp = orb.extract(
        image_u8, num_features=num_features, levels=levels,
        scale=pyramid_scale, threshold=fast_threshold,
        height=height, width=width,
    )
    idx, mask, dist = hamming.match(
        state.desc, kp.desc, state.kp_valid, kp.valid,
        ratio=ratio, cross_check=cross_check, use_pallas=use_pallas,
    )
    uv1 = state.xy
    uv2 = kp.xy[idx]
    tracked = mask & state.tracked
    tracked_n = jnp.sum(tracked)

    # PnP against the map (slot-aligned: pts3d[i] <-> uv2[i]); mirrors the
    # pipeline's PnP-first pose chain (see config.pnp_first)
    res = ransac.estimate_pnp_pose(
        key, state.pts3d, uv2, tracked, K,
        reproj_threshold_px=pnp_reproj_px, num_hyp=pnp_iters,
    )
    R_last = so3_exp(state.rvec)
    t_last = state.tvec
    R_pnp, t_pnp = res.R, res.t
    R_rel = jnp.matmul(R_pnp, R_last.T)
    t_rel = t_pnp - R_rel @ t_last
    finite = jnp.isfinite(R_pnp).all() & jnp.isfinite(t_pnp).all()

    # epipolar inliers of ALL matches against the PnP relative model
    t_u = t_rel / jnp.linalg.norm(t_rel).clip(1e-12)
    E = jnp.matmul(so3_hat(t_u), R_rel)
    errs = epipolar_errors_px(E, K, uv1, uv2)
    inl = (errs < sampson_thr_px**2) & mask
    num_inliers = jnp.sum(inl)

    # keyframe metrics (ref: src/keyframe_detector.py:36-86) — medians on
    # device, threshold cascade on host
    rot_mag = rotation_angle(R_rel)
    if consistent:
        c_last = -(R_last.T @ t_last)
        c_new = -(R_pnp.T @ t_pnp)
    else:
        c_last = t_last
        c_new = t_last + R_last @ t_rel
    par_mask = inl & state.tracked
    r1 = state.pts3d - c_last
    r2 = state.pts3d - c_new
    n1 = jnp.linalg.norm(r1, axis=1)
    n2 = jnp.linalg.norm(r2, axis=1)
    good = par_mask & (n1 > 1e-9) & (n2 > 1e-9)
    cosang = jnp.sum(r1 * r2, axis=1) / (n1 * n2).clip(1e-18)
    ang_deg = jnp.degrees(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
    med_par = _masked_median(ang_deg, good)
    med_disp = _masked_median(jnp.linalg.norm(uv2 - uv1, axis=1), inl)

    # speculative two-view triangulation of every match against the PnP
    # relative model (ref: src/pipeline.py:315-336).  Insertion-time work
    # folded into the tracked dispatch: batched DLT is ~free device-side,
    # while a separate triangulation dispatch costs a full tunnel round trip
    # per keyframe (VERDICT r2 #2).
    tri_X, tri_ok = triangulation.triangulate_pair(
        K.astype(jnp.float32), R_rel.astype(jnp.float32),
        t_rel.astype(jnp.float32), uv1, uv2)
    tri_ok = tri_ok & inl

    f32 = jnp.float32
    packed = jnp.concatenate([
        jnp.stack([
            jnp.sum(mask).astype(f32),
            tracked_n.astype(f32),
            (res.ok & finite).astype(f32),
            res.num_inliers.astype(f32),
            num_inliers.astype(f32),
            rot_mag.astype(f32),
            jnp.sum(par_mask).astype(f32),
            med_par.astype(f32),
            med_disp.astype(f32),
            jnp.sum(kp.valid).astype(f32),
        ]),
        R_pnp.reshape(-1).astype(f32),
        t_pnp.astype(f32),
        R_rel.reshape(-1).astype(f32),
        t_rel.astype(f32),
    ])
    insert_packed = jnp.concatenate([
        idx[:, None].astype(f32),
        mask[:, None].astype(f32),
        inl[:, None].astype(f32),
        tri_X.astype(f32),
        tri_ok[:, None].astype(f32),
        kp.xy.astype(f32),
        kp.valid[:, None].astype(f32),
    ], axis=1)
    return TrackResult(
        packed=packed,
        kp_xy=kp.xy,
        kp_desc=kp.desc,
        kp_valid=kp.valid,
        match_idx=idx,
        match_mask=mask,
        match_dist=dist,
        inliers=inl,
        insert_packed=insert_packed,
    )


class InsertArrays(NamedTuple):
    """Host-side unpacked view of TrackResult.insert_packed (numpy)."""

    match_idx: "np.ndarray"   # (N,) int
    match_mask: "np.ndarray"  # (N,) bool
    inliers: "np.ndarray"     # (N,) bool
    tri_X: "np.ndarray"       # (N, 3) f64, last-KF camera frame
    tri_valid: "np.ndarray"   # (N,) bool
    kp_xy: "np.ndarray"       # (N, 2) f64
    kp_valid: "np.ndarray"    # (N,) bool


def unpack_insert(insert_packed) -> InsertArrays:
    v = np.asarray(insert_packed, np.float64)
    return InsertArrays(
        match_idx=v[:, 0].astype(np.int64),
        match_mask=v[:, 1] > 0.5,
        inliers=v[:, 2] > 0.5,
        tri_X=v[:, 3:6],
        tri_valid=v[:, 6] > 0.5,
        kp_xy=v[:, 7:9],
        kp_valid=v[:, 9] > 0.5,
    )


def covis_step(
    bank_desc: jnp.ndarray,     # (B, N, 8) u32 — recent-KF descriptor banks
    bank_valid: jnp.ndarray,    # (B, N) bool
    bank_pts: jnp.ndarray,      # (B, N, 3) f32 map point per slot (0 if none)
    bank_tracked: jnp.ndarray,  # (B, N) bool — slot has a live map point
    new_desc: jnp.ndarray,      # (N, 8) u32
    new_valid: jnp.ndarray,     # (N,) bool
    new_xy: jnp.ndarray,        # (N, 2) f32
    R_new: jnp.ndarray,         # (3, 3) f32 extrinsic of the new keyframe
    t_new: jnp.ndarray,         # (3,) f32
    K: jnp.ndarray,             # (3, 3) f32
    *,
    ratio: float,
    cross_check: bool,
    use_pallas: bool,
    reproj_px: float,
) -> jnp.ndarray:
    """Covisibility re-observation for ALL recent keyframes in ONE dispatch
    (VERDICT r2 #2: one match dispatch per covisibility keyframe was a full
    tunnel round trip each).  For every bank keyframe: Hamming 2-NN match of
    its descriptors against the new keyframe's, then reprojection
    verification of its slot-aligned map points under the new keyframe's
    extrinsic (the model BA optimizes).  Returns (B, N, 2) f32 packed
    [match_idx, ok] — one device pull for the whole bank; the sequential
    one-point-per-keypoint bookkeeping stays on host."""
    outs = []
    for b in range(bank_desc.shape[0]):  # B is small & static: unrolled
        idx, mask, _ = hamming.match(
            bank_desc[b], new_desc, bank_valid[b], new_valid,
            ratio=ratio, cross_check=cross_check, use_pallas=use_pallas,
        )
        Xc = bank_pts[b] @ R_new.T + t_new
        z = Xc[:, 2]
        z_safe = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
        uv_hat = (Xc[:, :2] / z_safe[:, None]) * jnp.array(
            [K[0, 0], K[1, 1]]) + jnp.array([K[0, 2], K[1, 2]])
        err = jnp.linalg.norm(uv_hat - new_xy[idx], axis=1)
        ok = (mask & bank_tracked[b] & (z > 1e-6)
              & jnp.isfinite(err) & (err < reproj_px))
        outs.append(jnp.stack([idx.astype(jnp.float32),
                               ok.astype(jnp.float32)], axis=1))
    return jnp.stack(outs)


@functools.lru_cache(maxsize=8)
def build_covis_fn(ratio, cross_check, use_pallas, reproj_px):
    fn = functools.partial(covis_step, ratio=ratio, cross_check=cross_check,
                           use_pallas=use_pallas, reproj_px=reproj_px)
    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def build_track_fn(num_features, levels, pyramid_scale, fast_threshold,
                   height, width, ratio, cross_check, use_pallas,
                   pnp_iters, pnp_reproj_px, sampson_thr_px, consistent):
    """One compiled fused step per static-config signature."""
    fn = functools.partial(
        track_step,
        num_features=num_features, levels=levels,
        pyramid_scale=pyramid_scale, fast_threshold=fast_threshold,
        height=height, width=width, ratio=ratio, cross_check=cross_check,
        use_pallas=use_pallas, pnp_iters=pnp_iters,
        pnp_reproj_px=pnp_reproj_px, sampson_thr_px=sampson_thr_px,
        consistent=consistent,
    )
    return jax.jit(fn)


def make_state(kf, points: np.ndarray, capacity: int) -> FrontendState:
    """Build the device mirror from a host Keyframe + the map's point array.
    ``capacity`` = the keypoint capacity (num_features)."""
    from bundle_adjustment_tpu.ops.lie import so3_log_np

    kp_to_mp = kf.kp_to_mp
    tracked = kp_to_mp >= 0
    pts = np.zeros((capacity, 3), np.float32)
    if tracked.any():
        pts[tracked] = points[kp_to_mp[tracked]]
    return FrontendState(
        desc=kf.desc,
        xy=jnp.asarray(kf.xy, jnp.float32),
        kp_valid=jnp.asarray(kf.kp_valid),
        pts3d=jnp.asarray(pts),
        tracked=jnp.asarray(tracked),
        rvec=jnp.asarray(so3_log_np(kf.R), jnp.float32),
        tvec=jnp.asarray(kf.t, jnp.float32),
    )
