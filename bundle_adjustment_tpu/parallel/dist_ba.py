"""Distributed bundle adjustment: point-sharded Schur reduction and
window-partitioned multi-window solves with pose consensus.

Two sharding strategies, composable on a 2D ("win", "pt") mesh:

1. **Point sharding ("pt" axis — the TP analog).** Map points and their
   observations are partitioned across devices; cameras are replicated.
   Each shard builds its point Hessians (3x3 V-blocks) and its contribution
   to the reduced camera system locally; only S (6C x 6C, a few KB), g_c,
   and the scalar costs cross ICI via psum.  Every shard then solves the
   same tiny camera system and back-substitutes its own points — zero
   further communication.  This is exactly BASELINE.json's "distributed BA
   doing Schur reduction via psum over ICI".

2. **Window partitioning ("win" axis — the SP/CP analog).** The keyframe
   sequence is split into overlapping windows, one per device row; each
   solves its window independently (the reference's sliding-window structure,
   src/bundle_adjuster.py:140, made parallel), then boundary keyframes shared
   by neighboring windows are reconciled by averaging their pose estimates
   (all_gather over "win" — the pose-graph consensus step).

Observation padding keeps every shard's shapes identical; masked rows are
inert (proven by the padding-inertness test of the core solver).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from bundle_adjustment_tpu.ops import ba



def shard_problem(problem: ba.BAProblem, n_shards: int,
                  min_obs_capacity: int = 0) -> ba.BAProblem:
    """Re-layout a BAProblem so points/observations partition into
    ``n_shards`` equal contiguous blocks (leading-dim concatenated).

    Host-side, numpy.  Each observation is routed to the shard owning its
    point; per-shard point/obs counts are padded to the global max so every
    shard has identical shapes.  Point indices become shard-local.
    """
    P_tot = problem.points.shape[0]
    pnt_idx = np.asarray(problem.pnt_idx)
    cam_idx = np.asarray(problem.cam_idx)
    uv = np.asarray(problem.uv)
    obs_mask = np.asarray(problem.obs_mask)
    points = np.asarray(problem.points)
    point_mask = np.asarray(problem.point_mask)

    P_s = -(-P_tot // n_shards)  # ceil
    O_s = 0
    shard_of_point = np.minimum(np.arange(P_tot) // P_s, n_shards - 1)
    obs_shard = shard_of_point[pnt_idx]
    live = obs_mask > 0
    for s in range(n_shards):
        O_s = max(O_s, int((live & (obs_shard == s)).sum()))
    O_s = max(O_s, min_obs_capacity, 1)

    pts_out = np.zeros((n_shards * P_s, 3), points.dtype)
    pmask_out = np.zeros(n_shards * P_s, bool)
    ci = np.zeros(n_shards * O_s, np.int32)
    pi = np.zeros(n_shards * O_s, np.int32)
    uv_out = np.zeros((n_shards * O_s, 2), uv.dtype)
    om = np.zeros(n_shards * O_s, obs_mask.dtype)

    for s in range(n_shards):
        p0 = s * P_s
        sel_p = slice(p0, min(p0 + P_s, P_tot))
        n_p = sel_p.stop - sel_p.start
        pts_out[s * P_s : s * P_s + n_p] = points[sel_p]
        pmask_out[s * P_s : s * P_s + n_p] = point_mask[sel_p]

        sel_o = np.flatnonzero(live & (obs_shard == s))
        n_o = len(sel_o)
        o0 = s * O_s
        ci[o0 : o0 + n_o] = cam_idx[sel_o]
        pi[o0 : o0 + n_o] = pnt_idx[sel_o] - p0  # shard-local point index
        uv_out[o0 : o0 + n_o] = uv[sel_o]
        om[o0 : o0 + n_o] = obs_mask[sel_o]

    return ba.BAProblem(
        rvecs=problem.rvecs,
        tvecs=problem.tvecs,
        points=jnp.asarray(pts_out),
        cam_idx=jnp.asarray(ci),
        pnt_idx=jnp.asarray(pi),
        uv=jnp.asarray(uv_out),
        obs_mask=jnp.asarray(om),
        point_mask=jnp.asarray(pmask_out),
        K=problem.K,
    )


def ba_solve_sharded(problem: ba.BAProblem, mesh: Mesh, axis: str = "pt",
                     n_fixed: int = 1, **solver_kwargs):
    """Solve a point-sharded BAProblem over one mesh axis.

    ``problem`` must come from :func:`shard_problem` with
    n_shards = mesh.shape[axis].  Returns (rvecs, tvecs, points, BAStats)
    with points in the sharded layout (de-interleave with the same P_s).
    """
    sharded = P(axis)
    replicated = P()
    in_specs = ba.BAProblem(
        rvecs=replicated, tvecs=replicated,
        points=sharded,
        cam_idx=sharded, pnt_idx=sharded, uv=sharded, obs_mask=sharded,
        point_mask=sharded,
        K=replicated,
    )
    out_specs = (
        replicated, replicated, sharded,
        ba.BAStats(*([replicated] * len(ba.BAStats._fields))),
    )

    solve = functools.partial(
        ba.ba_solve_impl, n_fixed=n_fixed, axis_name=axis, **solver_kwargs
    )
    fn = shard_map(solve, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)(problem)


# ---------------------------------------------------------------------------
# Window partitioning with overlap consensus (the SP/CP axis)
# ---------------------------------------------------------------------------


def partition_windows(n_keyframes: int, n_windows: int, overlap: int = 1):
    """Split [0, n_keyframes) into ``n_windows`` contiguous windows whose
    neighbors share ``overlap`` keyframes.  Returns a list of index arrays,
    all padded to equal length (repeat-last padding; BA is invariant to the
    duplicated-camera trick because duplicates get no observations)."""
    if n_windows == 1:
        return [np.arange(n_keyframes)]
    base = -(-(n_keyframes + (n_windows - 1) * overlap) // n_windows)
    windows = []
    start = 0
    for w in range(n_windows):
        end = min(start + base, n_keyframes)
        windows.append(np.arange(start, end))
        start = end - overlap
    L = max(len(w) for w in windows)
    return [np.pad(w, (0, L - len(w)), mode="edge") for w in windows]


def solve_windows_consensus(
    problems: Sequence[ba.BAProblem],
    window_kf_ids: Sequence[np.ndarray],
    mesh: Mesh,
    n_fixed: int = 1,
    **solver_kwargs,
):
    """Solve W independent window-BA problems in parallel over the "win" mesh
    axis (optionally x point shards over "pt"), then reconcile poses of
    keyframes appearing in multiple windows by averaging (so(3) log-space
    for rotation) — the boundary-pose consensus of SURVEY §2.5.

    ``problems`` must share identical shapes (same bucketed capacities) and
    already be point-sharded for mesh.shape["pt"] if that axis is > 1.
    Returns (poses: dict kf_id -> (rvec, tvec), per-window results).
    """
    W = len(problems)
    n_pt = mesh.shape["pt"]
    assert W == mesh.shape["win"], (W, mesh.shape)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *problems)

    win_sharded_pt = P("win", "pt") if n_pt > 1 else P("win")
    specs = ba.BAProblem(
        rvecs=P("win"), tvecs=P("win"),
        points=win_sharded_pt,
        cam_idx=win_sharded_pt, pnt_idx=win_sharded_pt, uv=win_sharded_pt,
        obs_mask=win_sharded_pt, point_mask=win_sharded_pt,
        K=P(),
    )
    out_specs = (
        P("win"), P("win"), win_sharded_pt,
        ba.BAStats(*([P("win")] * len(ba.BAStats._fields))),
    )

    axis_name = "pt" if n_pt > 1 else None

    def one_window(prob):
        # inside shard_map the leading "win" dim is 1 — strip and restore
        prob = jax.tree.map(lambda x: x[0], prob)
        rv, tv, pts, stats = ba.ba_solve_impl(
            prob, n_fixed=n_fixed, axis_name=axis_name, **solver_kwargs
        )
        return jax.tree.map(lambda x: x[None], (rv, tv, pts, stats))

    fn = shard_map(one_window, mesh=mesh, in_specs=(specs,), out_specs=out_specs,
                   check_vma=False)
    rvs, tvs, ptss, stats = jax.jit(fn)(stacked)

    rvs = np.asarray(rvs)
    tvs = np.asarray(tvs)

    # consensus: average pose estimates of keyframes shared between windows
    pose_acc: dict[int, list] = {}
    for w, ids in enumerate(window_kf_ids):
        seen = set()
        for i, kf in enumerate(ids):
            kf = int(kf)
            if kf in seen:  # repeat-padding duplicates
                continue
            seen.add(kf)
            pose_acc.setdefault(kf, []).append((rvs[w, i], tvs[w, i]))
    poses = {}
    for kf, estimates in pose_acc.items():
        rv = np.mean([e[0] for e in estimates], axis=0)  # log-space average
        tv = np.mean([e[1] for e in estimates], axis=0)
        poses[kf] = (rv, tv)
    return poses, (rvs, tvs, np.asarray(ptss), jax.device_get(stats))
