"""Loop closure: bank detection + sim(3) drift correction + point fusion.

The reference has NO loop closure — its end-of-run global BA
(ref: src/main.py:80-89) can only polish a chain whose observation topology
already ties the loop, and a pure VO chain's does not: monocular scale drift
is unobservable to BA when every point is seen only by a short run of
keyframes.  Measured on the 600-frame synthetic room loop, global BA
converges (3.8e10 -> 8.9e5) yet ATE stays ~10% of path because the loop is
never topologically closed.

This module closes it, per new keyframe:

1. DETECT: match the new keyframe's descriptors against the stacked bank of
   all keyframes at least ``loop_min_gap`` older (the same one-dispatch bank
   search relocalization uses — exact MXU 2-NN small, coarse-to-fine ANN
   large); anchor = the bank keyframe with the most ratio-test matches.
2. VERIFY + FIT: from matches where BOTH sides carry a map point, fit a
   sim(3) drifted-world -> loop-world with RANSAC over Umeyama alignments of
   3-point samples (scale IS the monocular drift, so similarity — not rigid
   — alignment).
3. CORRECT: distribute the sim(3) along the pose chain after the anchor with
   interpolated corrections (alpha ramping 0 -> 1; s^alpha, exp(alpha*log R),
   alpha*t), updating keyframe extrinsics as
       R' = R Ra^T,  t' = s_a t - R' t_a
   (projectively exact per keyframe — uniform depth scale cancels in the
   pinhole divide) and transforming each map point by its FIRST observer's
   correction.
4. FUSE: merge matched point pairs (map_store.merge_points) and add
   reprojection-verified observations of old map points at free keypoints —
   these shared observations are what lets global BA hold the loop closed.
5. POLISH: optionally run full-map BA.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.ops import hamming
from bundle_adjustment_tpu.ops.lie import so3_exp_np, so3_log_np
from bundle_adjustment_tpu.utils.metrics import umeyama_align


def fit_sim3_ransac(X_src: np.ndarray, X_dst: np.ndarray, tol: float,
                    iters: int = 256, seed: int = 0):
    """RANSAC similarity fit X_dst ~= s * R @ X_src + t from 3-point minimal
    samples.  Returns (s, R, t, inlier_mask) or None."""
    n = len(X_src)
    if n < 4:
        return None
    rng = np.random.default_rng(seed)
    best = None
    for _ in range(iters):
        sel = rng.choice(n, 3, replace=False)
        s, R, t = umeyama_align(X_src[sel], X_dst[sel], with_scale=True)
        if not (np.isfinite(s) and 1e-3 < s < 1e3):
            continue
        r = np.linalg.norm((s * (R @ X_src.T)).T + t - X_dst, axis=1)
        inl = r < tol
        if best is None or inl.sum() > best.sum():
            best = inl
    if best is None or best.sum() < 4:
        return None
    s, R, t = umeyama_align(X_src[best], X_dst[best], with_scale=True)
    r = np.linalg.norm((s * (R @ X_src.T)).T + t - X_dst, axis=1)
    inl = r < tol
    if inl.sum() < 4:
        return None
    s, R, t = umeyama_align(X_src[inl], X_dst[inl], with_scale=True)
    return float(s), R, t, inl


def _interp_sim3(s: float, R: np.ndarray, t: np.ndarray, alpha: float):
    """Interpolated similarity: identity at alpha=0, (s, R, t) at alpha=1.
    Scale/rotation interpolate geodesically; translation linearly (the exact
    sim(3) geodesic's V-matrix correction is irrelevant at drift-correction
    magnitudes, and errors vanish at both endpoints)."""
    w = so3_log_np(R)
    return s ** alpha, so3_exp_np(alpha * w), alpha * np.asarray(t, np.float64)


def try_close_loop(pipe, new_kf) -> Optional[dict]:
    """Attempt loop closure for a freshly inserted keyframe.  Returns an info
    dict on success, None otherwise.  Mutates poses/points/observations."""
    cfg = pipe.cfg
    all_ids = pipe.map.sorted_kf_ids()
    cutoff = new_kf.kf_id - cfg.loop_min_gap
    if not any(k <= cutoff for k in all_ids):
        return None

    # ONE descriptor per old map point (its anchor observation) — see
    # map_store.anchor_observations for why a stacked multi-view bank breaks
    # the ratio test
    bank_mp, bank_kf, bank_kp = pipe.map.anchor_observations(cutoff)
    if len(bank_mp) < cfg.loop_min_matches:
        return None
    bank_desc = np.zeros((len(bank_mp),) + new_kf.desc.shape[1:], np.uint32)
    for k in np.unique(bank_kf):
        g = bank_kf == k
        bank_desc[g] = np.asarray(pipe.map.keyframes[int(k)].desc)[bank_kp[g]]

    if len(bank_mp) > cfg.reloc_ann_threshold:
        from bundle_adjustment_tpu.ops import ann

        idx, mask, _ = ann.match_bank(
            jnp.asarray(new_kf.desc), jnp.asarray(bank_desc),
            jnp.ones(len(bank_mp), bool), ratio=cfg.ratio_test)
    else:
        idx, mask, _ = hamming.match(
            jnp.asarray(new_kf.desc), jnp.asarray(bank_desc),
            jnp.asarray(new_kf.kp_valid), jnp.ones(len(bank_mp), bool),
            ratio=cfg.ratio_test)
    idx = np.asarray(idx)
    mask = np.asarray(mask) & new_kf.kp_valid

    cur_slots = np.flatnonzero(mask)
    if len(cur_slots) < cfg.loop_min_matches:
        return None
    hit_kf = bank_kf[idx[cur_slots]]
    kf_vals, kf_counts = np.unique(hit_kf, return_counts=True)
    anchor_id = int(kf_vals[np.argmax(kf_counts)])
    if int(kf_counts.max()) < cfg.loop_min_matches:
        return None

    # 3D-3D pairs: anchor-neighborhood matches where both sides have points
    near = np.abs(hit_kf - anchor_id) <= max(cfg.loop_min_gap // 2, 3)
    cur_kp = cur_slots[near]
    mp_old = bank_mp[idx[cur_kp]]
    mp_new = new_kf.kp_to_mp[cur_kp]
    both = (mp_new >= 0) & (mp_new != mp_old)
    pair_kp, pair_old, pair_new = cur_kp[both], mp_old[both], mp_new[both]
    # dedup on both sides (one fusion per physical point)
    _, f = np.unique(pair_old, return_index=True)
    pair_kp, pair_old, pair_new = pair_kp[f], pair_old[f], pair_new[f]
    _, f = np.unique(pair_new, return_index=True)
    pair_kp, pair_old, pair_new = pair_kp[f], pair_old[f], pair_new[f]
    if len(pair_old) < cfg.loop_min_inliers:
        return None

    pts = pipe.map.points()
    X_new, X_old = pts[pair_new], pts[pair_old]
    scene = float(np.median(np.linalg.norm(
        X_old - np.median(X_old, axis=0), axis=1))) or 1.0
    fit = fit_sim3_ransac(X_new, X_old, tol=cfg.loop_sim3_tol_rel * scene,
                          seed=int(new_kf.kf_id))
    if fit is None:
        return None
    s, Rg, tg, inl = fit
    if int(inl.sum()) < cfg.loop_min_inliers or not 0.2 < s < 5.0:
        return None

    # --- correct the pose chain after the anchor -------------------------
    ids_after = [k for k in all_ids if k > anchor_id]
    m = len(ids_after)
    for i, k in enumerate(ids_after):
        alpha = (i + 1) / m
        sa, Ra, ta = _interp_sim3(s, Rg, tg, alpha)
        kf = pipe.map.keyframes[k]
        Rk = kf.R @ Ra.T
        kf.R = Rk
        kf.t = sa * kf.t - Rk @ ta
    # points move with their first observer's correction (vectorized: map
    # each live point's first-observer keyframe to its chain position)
    first = pipe.map.first_observer_per_point()
    alive_idx = np.flatnonzero(pipe.map.point_alive())
    fo = first[alive_idx]
    ids_arr = np.asarray(ids_after, np.int64)
    in_after = (fo > anchor_id) & (fo <= ids_arr[-1])
    pos = np.searchsorted(ids_arr, fo[in_after])
    moved = alive_idx[in_after]
    for p in np.unique(pos):
        alpha = (p + 1) / m
        sa, Ra, ta = _interp_sim3(s, Rg, tg, alpha)
        mp_arr = moved[pos == p]
        pipe.map._pts[mp_arr] = (sa * pts[mp_arr]) @ Ra.T + ta

    # --- fuse duplicate points (old map point wins) -----------------------
    fused = 0
    for o, nw in zip(pair_old[inl], pair_new[inl]):
        fused += pipe.map.merge_points(int(o), int(nw))

    # --- add verified observations of old points at FREE keypoints -------
    free = new_kf.kp_to_mp[cur_slots] < 0
    f_kp = cur_slots[free]
    f_mp = bank_mp[idx[f_kp]]
    _, f = np.unique(f_mp, return_index=True)
    f_kp, f_mp = f_kp[np.sort(f)], f_mp[np.sort(f)]
    added = 0
    if len(f_kp):
        X = pipe.map.points()[f_mp]
        Xc = X @ new_kf.R.T + new_kf.t
        z = Xc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            uv_hat = (Xc[:, :2] / z[:, None]) * [pipe.K[0, 0], pipe.K[1, 1]] \
                + [pipe.K[0, 2], pipe.K[1, 2]]
        err = np.linalg.norm(uv_hat - new_kf.xy[f_kp], axis=1)
        ok = (z > 1e-6) & np.isfinite(err) & (err < cfg.covis_reproj_px)
        if ok.any():
            pipe.map.add_observations(new_kf.kf_id, f_mp[ok], f_kp[ok],
                                      new_kf.xy[f_kp[ok]])
            added = int(ok.sum())

    pipe._front_dirty = True
    info = {"anchor_kf": anchor_id, "matches": int(kf_counts.max()),
            "sim3_inliers": int(inl.sum()), "scale": round(s, 4),
            "fused": int(fused), "added_obs": added,
            "chain_corrected": m}
    pipe.log.emit(
        "loop_closure",
        f"    -> Loop closure: KF {new_kf.kf_id} -> anchor {anchor_id} "
        f"(sim3 inliers {int(inl.sum())}, scale {s:.3f}, fused {fused}, "
        f"+{added} obs, {m} poses corrected)",
        kf_id=new_kf.kf_id, **info)

    if cfg.loop_run_global_ba:
        info["ba"] = pipe.run_full_ba()
    return info
