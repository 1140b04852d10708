"""Structure-of-arrays world model: keyframes, map points, observations.

Replaces the reference's dict-of-objects Map/Keyframe/MapPoint with
bidirectional observation lists (ref: src/map_structures.py:7-78).  Host-side
numpy SoA with amortized growth; per-keyframe descriptor banks stay resident
on device for matching.  Dense integer ids in insertion order reproduce the
reference's id semantics (ref: src/map_structures.py:36-54), including the
duplicate-id rejection.

The observation table is stored flat — (kf_id, mp_id, kp_idx, u, v) rows —
which is simultaneously:
- the reference's MapPoint.observations list (filter by mp_id),
- the reference's Keyframe.observations list (filter by kf_id),
- and the BA sparsity pattern (SURVEY §2.3: "becomes the BA block layout").

``gather_window`` compacts a keyframe window into a padded static-shape
BAProblem (bucketed capacities so ba_solve retraces only per bucket), and
``apply_ba_result`` writes optimized poses/points back (the reference's
_update_map, src/bundle_adjuster.py:220-240).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.ops import ba
from bundle_adjustment_tpu.ops.lie import so3_exp_np, so3_log_np

_GROW = 1.5


def _bucket(n: int, buckets=(256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536, 131072)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(2 ** np.ceil(np.log2(max(n, 1))))


@dataclasses.dataclass
class Keyframe:
    """Host view of one keyframe.  R, t use the reference's convention
    (SURVEY §2.4): composition treats t as position, BA treats (R, t) as the
    extrinsic — reproduced deliberately."""

    kf_id: int
    R: np.ndarray             # (3, 3)
    t: np.ndarray             # (3,)
    xy: np.ndarray            # (N, 2) keypoint pixels (fixed capacity, masked)
    desc: jnp.ndarray         # (N, 8) uint32, device-resident
    kp_valid: np.ndarray      # (N,) bool
    frame_idx: int = -1
    # kp_idx -> mp_id reverse lookup (-1 = none); the reference builds this
    # dict on the fly at src/pipeline.py:251
    kp_to_mp: np.ndarray = None

    def __post_init__(self):
        if self.kp_to_mp is None:
            self.kp_to_mp = np.full(self.xy.shape[0], -1, np.int64)


class Map:
    """The world model.  All arrays are host numpy except descriptor banks.

    When the native host runtime is built (make -C native), a C++ mirror of
    the observation table accelerates the per-BA window gathers with a
    per-keyframe row index (O(window) instead of an O(n_obs) scan); the numpy
    arrays remain the source of truth (checkpointing, tests)."""

    def __init__(self, use_native: bool = True):
        self.keyframes: dict[int, Keyframe] = {}
        self.next_keyframe_id = 0
        self.next_map_point_id = 0
        # optional EventLog; capacity truncation in gather_window reports
        # through it (the "no silent caps" rule — SURVEY §4)
        self.log = None

        self._native = None
        if use_native:
            try:
                from bundle_adjustment_tpu.native import HAVE_NATIVE, NativeObsTable

                if HAVE_NATIVE:
                    self._native = NativeObsTable()
            except Exception:
                self._native = None

        cap = 1024
        self._pts = np.zeros((cap, 3), np.float64)
        self._colors = np.zeros((cap, 3), np.float64)
        self._pt_alive = np.zeros(cap, bool)
        self._n_pts = 0

        ocap = 4096
        self._obs_kf = np.zeros(ocap, np.int64)
        self._obs_mp = np.zeros(ocap, np.int64)
        self._obs_kp = np.zeros(ocap, np.int64)
        self._obs_uv = np.zeros((ocap, 2), np.float64)
        self._obs_alive = np.zeros(ocap, bool)
        self._n_obs = 0

    # -- keyframes ---------------------------------------------------------

    def add_keyframe(self, kf: Keyframe) -> int:
        if kf.kf_id in self.keyframes:  # ref: src/map_structures.py:44-45
            raise ValueError(f"keyframe id {kf.kf_id} already exists")
        self.keyframes[kf.kf_id] = kf
        self.next_keyframe_id = max(self.next_keyframe_id, kf.kf_id + 1)
        return kf.kf_id

    def new_keyframe_id(self) -> int:
        return self.next_keyframe_id

    @property
    def num_keyframes(self) -> int:
        return len(self.keyframes)

    def sorted_kf_ids(self) -> list[int]:
        return sorted(self.keyframes)

    # -- map points --------------------------------------------------------

    def _ensure_pts(self, extra: int):
        need = self._n_pts + extra
        if need > len(self._pts):
            cap = max(int(len(self._pts) * _GROW), need)
            for name in ("_pts", "_colors"):
                a = getattr(self, name)
                b = np.zeros((cap, a.shape[1]), a.dtype)
                b[: self._n_pts] = a[: self._n_pts]
                setattr(self, name, b)
            alive = np.zeros(cap, bool)
            alive[: self._n_pts] = self._pt_alive[: self._n_pts]
            self._pt_alive = alive

    def add_map_points(self, pts: np.ndarray, colors: Optional[np.ndarray] = None) -> np.ndarray:
        """Append a batch of points; returns their dense new ids."""
        n = len(pts)
        self._ensure_pts(n)
        ids = np.arange(self._n_pts, self._n_pts + n)
        self._pts[ids] = pts
        self._colors[ids] = colors if colors is not None else 0.5
        self._pt_alive[ids] = True
        self._n_pts += n
        self.next_map_point_id = self._n_pts
        return ids

    @property
    def num_points(self) -> int:
        return int(self._pt_alive[: self._n_pts].sum())

    def points(self) -> np.ndarray:
        return self._pts[: self._n_pts]

    def colors(self) -> np.ndarray:
        return self._colors[: self._n_pts]

    def point_alive(self) -> np.ndarray:
        return self._pt_alive[: self._n_pts]

    def cull_points(self, mp_ids: np.ndarray):
        """Remove map points (SURVEY §5: the reference never deletes, but its
        BA guard at src/bundle_adjuster.py:213 is the hook culling plugs
        into).  Observations of culled points die with them."""
        self._pt_alive[mp_ids] = False
        kill = np.isin(self._obs_mp[: self._n_obs], mp_ids)
        self._obs_alive[: self._n_obs][kill] = False
        if self._native is not None:
            self._native.kill_mps(np.asarray(mp_ids, np.int64))
        for kf in self.keyframes.values():
            kf.kp_to_mp[np.isin(kf.kp_to_mp, mp_ids)] = -1

    # -- observations ------------------------------------------------------

    def _ensure_obs(self, extra: int):
        need = self._n_obs + extra
        if need > len(self._obs_kf):
            cap = max(int(len(self._obs_kf) * _GROW), need)
            for name in ("_obs_kf", "_obs_mp", "_obs_kp"):
                a = getattr(self, name)
                b = np.zeros(cap, a.dtype)
                b[: self._n_obs] = a[: self._n_obs]
                setattr(self, name, b)
            uv = np.zeros((cap, 2), np.float64)
            uv[: self._n_obs] = self._obs_uv[: self._n_obs]
            self._obs_uv = uv
            alive = np.zeros(cap, bool)
            alive[: self._n_obs] = self._obs_alive[: self._n_obs]
            self._obs_alive = alive

    def add_observations(self, kf_id: int, mp_ids: np.ndarray, kp_idxs: np.ndarray,
                         uvs: np.ndarray):
        """Register observations bidirectionally (the reference appends to
        both MapPoint.observations and Keyframe.observations,
        src/pipeline.py:305-307; here one table serves both)."""
        n = len(mp_ids)
        if n == 0:
            return
        self._ensure_obs(n)
        sl = slice(self._n_obs, self._n_obs + n)
        self._obs_kf[sl] = kf_id
        self._obs_mp[sl] = mp_ids
        self._obs_kp[sl] = kp_idxs
        self._obs_uv[sl] = uvs
        self._obs_alive[sl] = True
        self._n_obs += n
        self.keyframes[kf_id].kp_to_mp[kp_idxs] = mp_ids
        if self._native is not None:
            self._native.append(np.full(n, kf_id, np.int64), mp_ids, kp_idxs, uvs)

    @property
    def num_observations(self) -> int:
        return int(self._obs_alive[: self._n_obs].sum())

    def observations_of_point(self, mp_id: int):
        m = (self._obs_mp[: self._n_obs] == mp_id) & self._obs_alive[: self._n_obs]
        return self._obs_kf[: self._n_obs][m], self._obs_kp[: self._n_obs][m]

    def first_observer_per_point(self) -> np.ndarray:
        """Per-point id of the FIRST observing keyframe (int64; max-int for
        points with no live observation).  Used by loop closure to assign
        each point the drift correction of the keyframe that anchored it."""
        first = np.full(self._n_pts, np.iinfo(np.int64).max, np.int64)
        alive = self._obs_alive[: self._n_obs]
        np.minimum.at(first, self._obs_mp[: self._n_obs][alive],
                      self._obs_kf[: self._n_obs][alive])
        return first

    def anchor_observations(self, max_first_kf: int):
        """(mp_ids, kf_ids, kp_idxs) of each live point's FIRST observation,
        restricted to points first observed at or before ``max_first_kf``.
        This is the loop-closure descriptor bank: ONE descriptor per map
        point — a stacked multi-view bank would contain near-identical
        descriptors of the same physical point in adjacent keyframes, and
        Lowe's ratio test kills every such self-duplicate match."""
        first = self.first_observer_per_point()
        alive_rows = self._obs_alive[: self._n_obs]
        okf = self._obs_kf[: self._n_obs][alive_rows]
        omp = self._obs_mp[: self._n_obs][alive_rows]
        okp = self._obs_kp[: self._n_obs][alive_rows]
        sel = (first[omp] == okf) & (okf <= max_first_kf) & self._pt_alive[omp]
        mp, kf, kp = omp[sel], okf[sel], okp[sel]
        _, f = np.unique(mp, return_index=True)
        return mp[f], kf[f], kp[f]

    def merge_points(self, dst_mp: int, src_mp: int) -> int:
        """Fuse two map points that turned out to be the same physical point
        (loop closure): every observation of ``src_mp`` is redirected to
        ``dst_mp`` and ``src_mp`` dies.  A keyframe that already observes
        ``dst_mp`` keeps its existing observation (one observation per
        keyframe-point pair; one map point per keypoint).  Implemented as
        kill + re-add so the native obs-table mirror stays in sync through
        its existing append/kill API.  Returns the redirect count."""
        m = (self._obs_mp[: self._n_obs] == src_mp) & \
            self._obs_alive[: self._n_obs]
        kfs = self._obs_kf[: self._n_obs][m].copy()
        kps = self._obs_kp[: self._n_obs][m].copy()
        uvs = self._obs_uv[: self._n_obs][m].copy()
        dst_kfs = set(int(k) for k in self.observations_of_point(dst_mp)[0])
        self.cull_points(np.asarray([src_mp]))
        n = 0
        for kf, kp, uv in zip(kfs, kps, uvs):
            if int(kf) in dst_kfs:
                continue
            self.add_observations(int(kf), np.asarray([dst_mp]),
                                  np.asarray([kp]), uv[None])
            dst_kfs.add(int(kf))
            n += 1
        return n

    def observation_count_per_point(self) -> np.ndarray:
        counts = np.zeros(self._n_pts, np.int64)
        alive = self._obs_alive[: self._n_obs]
        np.add.at(counts, self._obs_mp[: self._n_obs][alive], 1)
        return counts

    # -- BA window extraction / writeback ---------------------------------

    def gather_window(self, window_kf_ids: list[int], K: np.ndarray,
                      max_points: int, max_obs: int, dtype=np.float32,
                      pad_to_max: bool = False):
        """Build a padded BAProblem for the given keyframe window.

        Mirrors _gather_local_data (ref: src/bundle_adjuster.py:195-218):
        points = those observed by window KFs; observations = only those made
        by window KFs (outside-window observations of the same points are
        excluded, matching the reference).  Returns (problem, mp_ids) or None
        if the window has nothing to optimize.
        """
        window_kf_ids = list(window_kf_ids)
        # FIRST-occurrence semantics: partitioned windows are repeat-padded
        # with their last keyframe id, and the consensus reader
        # (parallel/dist_ba.py) takes the first occurrence's slot — routing
        # the duplicated keyframe's observations to a later (padding) slot
        # would silently leave its optimized pose discarded.
        kf_pos: dict = {}
        for i, k in enumerate(window_kf_ids):
            kf_pos.setdefault(k, i)

        if self._native is not None:
            obs_rows = np.sort(self._native.gather_window(
                np.asarray(window_kf_ids, np.int64)))
        else:
            alive = self._obs_alive[: self._n_obs]
            in_win = np.isin(self._obs_kf[: self._n_obs], window_kf_ids) & alive
            obs_rows = np.flatnonzero(in_win)  # original table rows (for pruning)
        okf = self._obs_kf[obs_rows]
        omp = self._obs_mp[obs_rows]
        okp = self._obs_kp[obs_rows]
        ouv = self._obs_uv[obs_rows]
        if len(omp) == 0:
            return None

        mp_ids, pnt_idx = np.unique(omp, return_inverse=True)
        if len(mp_ids) > max_points or len(omp) > max_obs:
            # keep the most-observed points; drop the rest from this solve
            n_pts_before, n_obs_before = len(mp_ids), len(omp)
            counts = np.bincount(pnt_idx)
            keep_p = np.argsort(-counts)[:max_points]
            keep_mask = np.isin(pnt_idx, keep_p)
            okf, omp, okp, ouv = okf[keep_mask], omp[keep_mask], okp[keep_mask], ouv[keep_mask]
            obs_rows = obs_rows[keep_mask][:max_obs]
            okf, omp, okp, ouv = okf[:max_obs], omp[:max_obs], okp[:max_obs], ouv[:max_obs]
            mp_ids, pnt_idx = np.unique(omp, return_inverse=True)
            if self.log is not None:
                # no silent caps: over-capacity windows are visible events
                self.log.emit(
                    "capacity_drop",
                    f"    -> BA window over capacity: dropped "
                    f"{n_pts_before - len(mp_ids)} points / "
                    f"{n_obs_before - len(omp)} observations "
                    f"(max_points={max_points}, max_obs={max_obs})",
                    dropped_points=int(n_pts_before - len(mp_ids)),
                    dropped_obs=int(n_obs_before - len(omp)),
                    max_points=int(max_points), max_obs=int(max_obs),
                )

        cam_idx = np.array([kf_pos[k] for k in okf], np.int32)
        C = len(window_kf_ids)
        if pad_to_max:
            # identical static shapes across windows (partitioned solves)
            P, O = max_points, max_obs
        else:
            P = _bucket(len(mp_ids))
            O = _bucket(len(omp))

        rvecs = np.stack([so3_log_np(self.keyframes[k].R) for k in window_kf_ids]).astype(dtype)
        tvecs = np.stack([self.keyframes[k].t for k in window_kf_ids]).astype(dtype)

        pts = np.zeros((P, 3), dtype)
        pts[: len(mp_ids)] = self._pts[mp_ids]
        point_mask = np.zeros(P, bool)
        point_mask[: len(mp_ids)] = True

        ci = np.zeros(O, np.int32)
        pi = np.zeros(O, np.int32)
        uv = np.zeros((O, 2), dtype)
        om = np.zeros(O, dtype)
        ci[: len(omp)] = cam_idx
        pi[: len(omp)] = pnt_idx
        uv[: len(omp)] = ouv
        om[: len(omp)] = 1.0

        problem = ba.BAProblem(
            rvecs=jnp.asarray(rvecs, dtype),
            tvecs=jnp.asarray(tvecs, dtype),
            points=jnp.asarray(pts),
            cam_idx=jnp.asarray(ci),
            pnt_idx=jnp.asarray(pi),
            uv=jnp.asarray(uv),
            obs_mask=jnp.asarray(om),
            point_mask=jnp.asarray(point_mask),
            K=jnp.asarray(K, dtype),
        )
        return problem, mp_ids, obs_rows

    def kill_observations(self, obs_rows: np.ndarray):
        """Remove specific observation-table rows (post-BA outlier pruning);
        clears the kp->mp back-pointers for the removed rows."""
        self._obs_alive[obs_rows] = False
        if self._native is not None:
            self._native.kill_rows(np.asarray(obs_rows, np.int64))
        for r in obs_rows:
            kf = self.keyframes[self._obs_kf[r]]
            if kf.kp_to_mp[self._obs_kp[r]] == self._obs_mp[r]:
                kf.kp_to_mp[self._obs_kp[r]] = -1

    def apply_ba_result(self, window_kf_ids: list[int], mp_ids: np.ndarray,
                        rvecs, tvecs, points, n_fixed: int = 1):
        """Write optimized poses/points back (ref: src/bundle_adjuster.py:220-240).
        The fixed anchor's pose is untouched."""
        rvecs = np.asarray(rvecs, np.float64)
        tvecs = np.asarray(tvecs, np.float64)
        points = np.asarray(points, np.float64)
        for i, k in enumerate(window_kf_ids):
            if i < n_fixed:
                continue
            kf = self.keyframes[k]
            kf.R = so3_exp_np(rvecs[i])
            kf.t = tvecs[i]
        self._pts[mp_ids] = points[: len(mp_ids)]

    # -- export ------------------------------------------------------------

    def get_pcd(self):
        """(points, colors) of alive map points (ref: src/map_structures.py:56-78)."""
        alive = self._pt_alive[: self._n_pts]
        return self._pts[: self._n_pts][alive], self._colors[: self._n_pts][alive]

    def trajectory(self, consistent: bool = False):
        """(K, 3) camera positions in keyframe order.  Default: t as position
        (the reference's plotting convention, src/visualization.py:24-97);
        ``consistent=True`` computes the true optical center -R^T t for the
        extrinsic-convention mode."""
        ids = self.sorted_kf_ids()
        if not ids:
            return np.zeros((0, 3))
        if consistent:
            return np.stack(
                [-self.keyframes[k].R.T @ self.keyframes[k].t for k in ids]
            )
        return np.stack([self.keyframes[k].t for k in ids])
