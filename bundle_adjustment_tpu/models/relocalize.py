"""Relocalization on tracking loss: descriptor-bank search + PnP re-entry.

The lehman_indoor configuration requires "relocalization on match failure"
(BASELINE.json config 4).  The reference has no implementation — its nearest
behaviors are the dead exhaustive matcher (ref: src/pipeline.py:112-223,
disabled at 98) and the never-called estimate_pose_pnp
(ref: src/pose_estimator.py:46-92).  Per SURVEY §5 this is built fresh from
those templates: on tracking loss, match the current frame's descriptors
against the last ``reloc_bank_size`` keyframes' device-resident banks, take
the keyframe with the most map-point-backed matches, and re-enter the pose
chain with PnP RANSAC against its 3D points.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.models.map_store import Keyframe
from bundle_adjustment_tpu.ops import hamming, ransac


def try_relocalize(pipe, frame_bgr, kp) -> Optional[dict]:
    """Attempt PnP re-entry.  Returns a result dict on success, None on
    failure (the caller keeps discarding frames)."""
    cfg = pipe.cfg
    bank_ids = pipe.map.sorted_kf_ids()[-cfg.reloc_bank_size:]
    if not bank_ids:
        return None

    best = None  # (num_matches, kf_id, X, uv, slots_mask)
    kp_xy = np.asarray(kp.xy, np.float64)
    for kf_id in reversed(bank_ids):
        kf: Keyframe = pipe.map.keyframes[kf_id]
        idx, mask, _ = hamming.match(
            kf.desc, kp.desc,
            jnp.asarray(kf.kp_valid), kp.valid,
            ratio=cfg.ratio_test,
        )
        idx = np.asarray(idx)
        mask = np.asarray(mask)
        tracked = mask & (kf.kp_to_mp >= 0)
        n = int(tracked.sum())
        if best is None or n > best[0]:
            slots = np.flatnonzero(tracked)
            X = pipe.map.points()[kf.kp_to_mp[slots]]
            uv = kp_xy[idx[slots]]
            best = (n, kf_id, X, uv, idx, slots)
        if n >= 100:  # plenty — stop searching
            break

    n, kf_id, X, uv, idx, slots = best
    if n < 6:
        pipe.log.reloc(pipe.frame_idx, False)
        return None

    # pad to a static-ish capacity for the jitted PnP
    cap = max(64, 1 << int(np.ceil(np.log2(n))))
    Xp = np.zeros((cap, 3), np.float32)
    uvp = np.zeros((cap, 2), np.float32)
    Xp[:n] = X
    uvp[:n] = uv
    valid = np.arange(cap) < n

    res = ransac.estimate_pnp_pose(
        pipe._next_key(),
        jnp.asarray(Xp),
        jnp.asarray(uvp),
        jnp.asarray(valid),
        jnp.asarray(pipe.K, jnp.float32),
        reproj_threshold_px=cfg.pnp_reproj_err_px,
        num_hyp=cfg.pnp_iters,
    )
    num_inl = int(res.num_inliers)
    if not bool(res.ok) or num_inl <= cfg.pose_inlier_numbers:
        pipe.log.reloc(pipe.frame_idx, False, kf_id, num_inl)
        return None

    pipe.log.reloc(pipe.frame_idx, True, kf_id, num_inl)

    # insert a keyframe at the PnP pose (extrinsic — consistent with how BA
    # interprets stored poses; see the convention note in models/pipeline.py)
    R = np.asarray(res.R, np.float64)
    t = np.asarray(res.t, np.float64)
    new_kf = Keyframe(
        kf_id=pipe.map.new_keyframe_id(),
        R=R,
        t=t,
        xy=kp_xy,
        desc=kp.desc,
        kp_valid=np.asarray(kp.valid),
        frame_idx=pipe.frame_idx,
    )
    pipe.map.add_keyframe(new_kf)
    pipe.log.keyframe_trigger(pipe.frame_idx, new_kf.kf_id, "Relocalization",
                              {"anchor_kf": kf_id, "pnp_inliers": num_inl})

    # register re-observations for the PnP inliers
    inl = np.asarray(res.inliers)[:n]
    anchor = pipe.map.keyframes[kf_id]
    mp_ids = anchor.kp_to_mp[slots[inl]]
    kp_idxs = idx[slots[inl]]
    pipe.map.add_observations(new_kf.kf_id, mp_ids, kp_idxs, kp_xy[kp_idxs])

    ba_result = pipe.run_local_ba()
    return {"status": "relocalized", "kf_id": new_kf.kf_id,
            "anchor_kf": kf_id, "inliers": num_inl, "ba": ba_result}
