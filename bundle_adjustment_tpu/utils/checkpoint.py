"""Checkpoint / resume: restartable serialization of the full pipeline state.

The reference has none (SURVEY §5 — only partial-progress artifacts like
per-LBA PCD dumps, src/bundle_adjuster.py:186-193).  Long sequences and
multi-host runs need real restartability: this serializes the Map SoA
(keyframe poses, keypoints, descriptor banks, kp->mp back-pointers, map
points/colors/alive, the flat observation table), the pipeline cursor
(frame index, PRNG key, lost-frame counter), and a config fingerprint —
one compressed .npz, no pickle.

Resume is exact: the PRNG chain and all state round-trip bit-for-bit, so a
resumed run replays identically to an uninterrupted one (asserted by
tests/test_checkpoint.py).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json

import jax
import jax.numpy as jnp
import numpy as np

_FORMAT_VERSION = 1


#: operational knobs that do not change what the map MEANS — a checkpoint
#: must resume fine across different output dirs / debug settings
_NON_SEMANTIC = {"output_dir", "debug", "export_pcd_series", "export_voxel",
                 "fused_frontend"}


def _config_fingerprint(cfg) -> str:
    d = {k: v for k, v in dataclasses.asdict(cfg).items()
         if k not in _NON_SEMANTIC}
    blob = json.dumps(d, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def save_checkpoint(pipe, path: str):
    """Serialize a VisualOdometryPipeline to ``path`` (.npz)."""
    m = pipe.map
    kf_ids = m.sorted_kf_ids()
    arrays = {
        "format_version": np.array(_FORMAT_VERSION),
        "frame_idx": np.array(pipe.frame_idx),
        "lost_frames": np.array(pipe._lost_frames),
        "prng_key": np.asarray(pipe._key),
        "config_fp": np.frombuffer(
            _config_fingerprint(pipe.cfg).encode(), dtype=np.uint8
        ),
        # map points
        "points": m._pts[: m._n_pts],
        "colors": m._colors[: m._n_pts],
        "pt_alive": m._pt_alive[: m._n_pts],
        # observation table
        "obs_kf": m._obs_kf[: m._n_obs],
        "obs_mp": m._obs_mp[: m._n_obs],
        "obs_kp": m._obs_kp[: m._n_obs],
        "obs_uv": m._obs_uv[: m._n_obs],
        "obs_alive": m._obs_alive[: m._n_obs],
        # keyframes (stacked; capacity is uniform per run)
        "kf_ids": np.array(kf_ids, np.int64),
    }
    if kf_ids:
        arrays.update(
            kf_R=np.stack([m.keyframes[k].R for k in kf_ids]),
            kf_t=np.stack([m.keyframes[k].t for k in kf_ids]),
            kf_frame_idx=np.array([m.keyframes[k].frame_idx for k in kf_ids]),
            kf_xy=np.stack([m.keyframes[k].xy for k in kf_ids]),
            kf_valid=np.stack([m.keyframes[k].kp_valid for k in kf_ids]),
            kf_kp_to_mp=np.stack([m.keyframes[k].kp_to_mp for k in kf_ids]),
            kf_desc=np.stack([np.asarray(m.keyframes[k].desc) for k in kf_ids]),
        )
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, config, log=None, use_pallas_matcher=None,
                    strict_config: bool = True):
    """Restore a VisualOdometryPipeline from a checkpoint."""
    from bundle_adjustment_tpu.models.map_store import Keyframe
    from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline

    z = np.load(path)
    version = int(z["format_version"])
    if version != _FORMAT_VERSION:
        raise ValueError(f"checkpoint format {version} != {_FORMAT_VERSION}")
    fp_saved = z["config_fp"].tobytes().decode()
    fp_now = _config_fingerprint(config)
    if strict_config and fp_saved != fp_now:
        raise ValueError(
            f"config fingerprint mismatch: checkpoint {fp_saved}, current {fp_now} "
            "(pass strict_config=False to override)"
        )

    pipe = VisualOdometryPipeline(config, log=log,
                                  use_pallas_matcher=use_pallas_matcher)
    pipe.frame_idx = int(z["frame_idx"])
    pipe._lost_frames = int(z["lost_frames"])
    pipe._key = jnp.asarray(z["prng_key"])

    m = pipe.map
    n_pts = len(z["points"])
    m._ensure_pts(n_pts)
    m._pts[:n_pts] = z["points"]
    m._colors[:n_pts] = z["colors"]
    m._pt_alive[:n_pts] = z["pt_alive"]
    m._n_pts = n_pts
    m.next_map_point_id = n_pts

    n_obs = len(z["obs_kf"])
    m._ensure_obs(n_obs)
    m._obs_kf[:n_obs] = z["obs_kf"]
    m._obs_mp[:n_obs] = z["obs_mp"]
    m._obs_kp[:n_obs] = z["obs_kp"]
    m._obs_uv[:n_obs] = z["obs_uv"]
    m._obs_alive[:n_obs] = z["obs_alive"]
    m._n_obs = n_obs
    if m._native is not None and n_obs:
        # rebuild the C++ mirror (restore bypasses add_observations)
        m._native.append(z["obs_kf"], z["obs_mp"], z["obs_kp"], z["obs_uv"])
        dead = np.flatnonzero(~z["obs_alive"])
        if len(dead):
            m._native.kill_rows(dead)

    for i, k in enumerate(z["kf_ids"]):
        kf = Keyframe(
            kf_id=int(k),
            R=z["kf_R"][i],
            t=z["kf_t"][i],
            xy=z["kf_xy"][i],
            desc=jnp.asarray(z["kf_desc"][i]),
            kp_valid=z["kf_valid"][i],
            frame_idx=int(z["kf_frame_idx"][i]),
            kp_to_mp=z["kf_kp_to_mp"][i].copy(),
        )
        m.add_keyframe(kf)
    return pipe
