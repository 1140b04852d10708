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
   src/bundle_adjuster.py:140, made parallel).  Each window's solution lives
   in its own gauge — monocular BA leaves a sim(3) freedom per window (scale
   included) — so reconciliation is a real pose-graph consensus: windows are
   chain-aligned by per-window **sim(3)** transforms fit on overlap keyframes
   (scale from center spreads, rotation by chordal averaging), then shared
   keyframes' poses are fused by chordal rotation mean + translation mean.

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


def problem_specs(axis: str = "pt") -> ba.BAProblem:
    """PartitionSpecs for a point-sharded BAProblem: cameras/K replicated,
    everything point- or observation-indexed sharded over ``axis``."""
    sharded = P(axis)
    replicated = P()
    return ba.BAProblem(
        rvecs=replicated, tvecs=replicated,
        points=sharded,
        cam_idx=sharded, pnt_idx=sharded, uv=sharded, obs_mask=sharded,
        point_mask=sharded,
        K=replicated,
    )


def globalize(tree, mesh: Mesh, specs):
    """device_put a host pytree onto a (possibly multi-PROCESS) mesh with the
    given PartitionSpecs — every process passes the identical full arrays and
    receives the global jax.Array view of its addressable shards.  Required
    for jit/shard_map inputs when the mesh spans jax.distributed processes."""
    from jax.sharding import NamedSharding

    return jax.tree.map(
        lambda x, s: jax.device_put(np.asarray(x), NamedSharding(mesh, s)),
        tree, specs)


def ba_solve_sharded(problem: ba.BAProblem, mesh: Mesh, axis: str = "pt",
                     n_fixed: int = 1, globalize_inputs: bool = False,
                     **solver_kwargs):
    """Solve a point-sharded BAProblem over one mesh axis.

    ``problem`` must come from :func:`shard_problem` with
    n_shards = mesh.shape[axis].  Returns (rvecs, tvecs, points, BAStats)
    with points in the sharded layout (de-interleave with the same P_s).

    ``globalize_inputs``: device_put the inputs with their mesh shardings
    first — required when ``mesh`` spans multiple jax.distributed processes
    (each process passes the same full arrays)."""
    in_specs = problem_specs(axis)
    sharded = P(axis)
    replicated = P()
    out_specs = (
        replicated, replicated, sharded,
        ba.BAStats(*([replicated] * len(ba.BAStats._fields))),
    )

    solve = functools.partial(
        ba.ba_solve_impl, n_fixed=n_fixed, axis_name=axis, **solver_kwargs
    )
    fn = shard_map(solve, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
                   check_vma=False)
    if globalize_inputs:
        problem = globalize(problem, mesh, in_specs)
    return jax.jit(fn)(problem)


# ---------------------------------------------------------------------------
# Window partitioning with overlap consensus (the SP/CP axis)
# ---------------------------------------------------------------------------


def _project_so3(M: np.ndarray) -> np.ndarray:
    """Nearest rotation matrix (Frobenius) via SVD."""
    U, _, Vt = np.linalg.svd(M)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = U @ np.diag([1.0, 1.0, -1.0]) @ Vt
    return R


def chordal_mean(Rs) -> np.ndarray:
    """Chordal L2 rotation average: projection of the Euclidean mean onto
    SO(3).  Valid globally (unlike a Euclidean mean of rotation VECTORS,
    which is only meaningful for tightly clustered rotations)."""
    return _project_so3(np.mean(np.asarray(Rs, np.float64), axis=0))


def fit_sim3(centers_dst: np.ndarray, centers_src: np.ndarray,
             R_rel: list) -> tuple:
    """Fit (s, R_g, t_g) with  c_dst ≈ s·R_g·c_src + t_g.

    Rotation comes from the per-keyframe relative extrinsic rotations
    ``R_rel`` (R_dst_kᵀ R_src_k), chordal-averaged; scale from the RMS center
    spread ratio (Umeyama-style); translation from the centroids.  With one
    shared keyframe the scale is indeterminate → 1."""
    R_g = chordal_mean(R_rel)
    mu_d = centers_dst.mean(axis=0)
    mu_s = centers_src.mean(axis=0)
    s = 1.0
    if len(centers_dst) >= 2:
        spread_d = np.sqrt(np.sum((centers_dst - mu_d) ** 2))
        spread_s = np.sqrt(np.sum((centers_src - mu_s) ** 2))
        if spread_s > 1e-12 and spread_d > 1e-12:
            s = float(spread_d / spread_s)
    t_g = mu_d - s * (R_g @ mu_s)
    return s, R_g, t_g


def reconcile_windows_sim3(window_kf_ids: Sequence[np.ndarray], rvs, tvs):
    """Pose-graph consensus over independently solved windows.

    Each monocular window solve has a free sim(3) gauge (scale included —
    overlap averaging alone cannot fix inter-window scale drift).  Windows
    are chain-aligned left to right: window w is mapped into the global
    frame by a sim(3) fit on the keyframes it shares with the already
    aligned prefix, then shared keyframes are fused by chordal rotation
    averaging + translation mean.

    Returns (poses: dict kf_id -> (rvec, tvec), sim3s: per-window
    (s, R_g, t_g) mapping that window's world into the global frame —
    apply to its points as X' = s·R_g·X + t_g).
    """
    from bundle_adjustment_tpu.ops.lie import so3_exp_np, so3_log_np

    W = len(window_kf_ids)
    rvs = np.asarray(rvs, np.float64)
    tvs = np.asarray(tvs, np.float64)

    # first-occurrence slot per unique keyframe (repeat-padded windows)
    slots: list[dict] = []
    for ids in window_kf_ids:
        d: dict = {}
        for i, kf in enumerate(ids):
            d.setdefault(int(kf), i)
        slots.append(d)

    def pose(w, i):
        return so3_exp_np(rvs[w, i]), tvs[w, i]

    identity = (1.0, np.eye(3), np.zeros(3))
    sim3s = [identity]
    # window 0 defines the global frame
    aligned: list[dict] = [{kf: pose(0, i) for kf, i in slots[0].items()}]
    for w in range(1, W):
        prefix: dict = {}
        for a in aligned:
            prefix.update(a)  # later windows win; any consistent choice works
        shared = [kf for kf in slots[w] if kf in prefix]
        if shared:
            c_dst, c_src, R_rel = [], [], []
            for kf in shared:
                R_d, t_d = prefix[kf]
                R_s, t_s = pose(w, slots[w][kf])
                c_dst.append(-R_d.T @ t_d)
                c_src.append(-R_s.T @ t_s)
                R_rel.append(R_d.T @ R_s)
            s, R_g, t_g = fit_sim3(np.asarray(c_dst), np.asarray(c_src), R_rel)
        else:
            s, R_g, t_g = identity
        sim3s.append((s, R_g, t_g))
        cur = {}
        for kf, i in slots[w].items():
            R_s, t_s = pose(w, i)
            # extrinsic under the world sim(3): R' = R R_gᵀ, t' = s·t − R'·t_g
            R_n = R_s @ R_g.T
            t_n = s * t_s - R_n @ t_g
            cur[kf] = (R_n, t_n)
        aligned.append(cur)

    acc: dict[int, list] = {}
    for a in aligned:
        for kf, Rt in a.items():
            acc.setdefault(kf, []).append(Rt)
    poses = {}
    for kf, lst in acc.items():
        R = chordal_mean([Rt[0] for Rt in lst])
        t = np.mean([Rt[1] for Rt in lst], axis=0)
        poses[kf] = (so3_log_np(R), t)
    return poses, sim3s


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
    globalize_inputs: bool = False,
    **solver_kwargs,
):
    """Solve W independent window-BA problems in parallel over the "win" mesh
    axis (optionally x point shards over "pt"), then reconcile them with the
    sim(3) pose-graph consensus of :func:`reconcile_windows_sim3` — the
    boundary-pose consensus of SURVEY §2.5 done with proper gauge handling
    (chordal rotation averaging; per-window scale).

    ``problems`` must share identical shapes (same bucketed capacities) and
    already be point-sharded for mesh.shape["pt"] if that axis is > 1.
    Returns (poses: dict kf_id -> (rvec, tvec), sim3s: per-window world
    alignment for the window's POINTS, per-window raw results).
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
    if globalize_inputs:
        stacked = globalize(stacked, mesh, specs)
    rvs, tvs, ptss, stats = jax.jit(fn)(stacked)

    if globalize_inputs:
        # cross-process outputs are only shard-addressable; reshard to
        # replicated (an all-gather over the mesh) so every process can read
        # the full result for the host-side consensus
        from jax.sharding import NamedSharding

        rep = jax.jit(lambda t: t,
                      out_shardings=NamedSharding(mesh, P()))
        rvs, tvs, ptss, stats = jax.device_get(rep((rvs, tvs, ptss, stats)))

    rvs = np.asarray(rvs)
    tvs = np.asarray(tvs)

    poses, sim3s = reconcile_windows_sim3(window_kf_ids, rvs, tvs)
    return poses, sim3s, (rvs, tvs, np.asarray(ptss), jax.device_get(stats))
