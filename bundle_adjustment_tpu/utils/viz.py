"""Debug/visualization artifacts: trajectory plots, BA sparsity spy plots,
match/keyframe overlays, depth-colored frames.

Covers the reference's visual-artifact surface: sparsity spy
(ref: src/visualization.py:12-22), 2D top-down X-Z trajectory (24-51), 3D
quiver trajectory with camera-Z arrows + equal-aspect box (53-97), match and
keypoint overlays (src/pipeline.py:59-71,91-95), and the legacy depth-map
frames (legacy/depth_estimation.py:176-192).  All matplotlib-Agg / cv2,
host-side only.
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _ensure(path):
    os.makedirs(path, exist_ok=True)
    return path


def plot_and_save_sparsity(cam_idx, pnt_idx, n_cams, n_pts, out_dir, tag):
    """Spy plot of the BA Jacobian block structure from the observation table
    (the reference builds a lil_matrix to plot; the obs table already encodes
    the same pattern)."""
    _ensure(out_dir)
    n_obs = len(cam_idx)
    rows = np.repeat(np.arange(n_obs) * 2, 2) + np.tile([0, 1], n_obs)
    fig, ax = plt.subplots(figsize=(6, 6))
    # camera block columns
    cam_cols = np.asarray(cam_idx) * 6
    pnt_cols = n_cams * 6 + np.asarray(pnt_idx) * 3
    for d in range(6):
        ax.scatter(cam_cols + d, np.repeat(np.arange(n_obs) * 2, 1), s=0.1, c="k")
    for d in range(3):
        ax.scatter(pnt_cols + d, np.arange(n_obs) * 2, s=0.1, c="k")
    ax.invert_yaxis()
    ax.set_title(f"BA sparsity {tag}: {n_obs} obs, {n_cams} cams, {n_pts} pts")
    ax.set_xlabel("parameter columns")
    ax.set_ylabel("residual rows")
    fig.savefig(os.path.join(out_dir, f"sparsity_{tag}.png"), dpi=100)
    plt.close(fig)


def plot_and_save_trajectory_2d(trajectory, out_dir, tag):
    """Top-down X-Z path (ref: src/visualization.py:24-51)."""
    _ensure(out_dir)
    t = np.asarray(trajectory)
    fig, ax = plt.subplots(figsize=(8, 8))
    if len(t):
        ax.plot(t[:, 0], t[:, 2], "b-o", markersize=3)
        ax.plot(t[0, 0], t[0, 2], "gs", markersize=8, label="start")
        ax.plot(t[-1, 0], t[-1, 2], "r^", markersize=8, label="latest")
        ax.legend()
    ax.set_xlabel("X")
    ax.set_ylabel("Z")
    ax.set_title(f"Trajectory (top-down) — {len(t)} keyframes")
    ax.axis("equal")
    ax.grid(True)
    fig.savefig(os.path.join(out_dir, f"trajectory_2d_{tag}.png"), dpi=100)
    plt.close(fig)


def plot_and_save_trajectory_3d(trajectory, rotations, out_dir, tag):
    """3D path with camera-Z orientation arrows and equal-aspect bounding
    (ref: src/visualization.py:53-97)."""
    _ensure(out_dir)
    t = np.asarray(trajectory)
    fig = plt.figure(figsize=(9, 9))
    ax = fig.add_subplot(111, projection="3d")
    if len(t):
        ax.plot(t[:, 0], t[:, 1], t[:, 2], "b-o", markersize=3)
        # camera viewing direction = R^T @ [0,0,1] (third row of R)
        for pos, R in zip(t, rotations):
            z = np.asarray(R)[2, :]
            ax.quiver(pos[0], pos[1], pos[2], z[0], z[1], z[2],
                      length=0.3, color="r", arrow_length_ratio=0.3)
        # equal aspect bounding cube
        mins, maxs = t.min(0), t.max(0)
        center = (mins + maxs) / 2
        half = max((maxs - mins).max() / 2, 0.5)
        ax.set_xlim(center[0] - half, center[0] + half)
        ax.set_ylim(center[1] - half, center[1] + half)
        ax.set_zlim(center[2] - half, center[2] + half)
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("Z")
    ax.set_title(f"Trajectory 3D — {len(t)} keyframes")
    fig.savefig(os.path.join(out_dir, f"trajectory_3d_{tag}.png"), dpi=100)
    plt.close(fig)


def draw_matches(frame1, xy1, frame2, xy2, out_path, max_draw=200):
    """Side-by-side match overlay (replaces cv2.drawMatches usage at
    ref: src/pipeline.py:60-71)."""
    import cv2

    h = max(frame1.shape[0], frame2.shape[0])
    w = frame1.shape[1] + frame2.shape[1]
    canvas = np.zeros((h, w, 3), np.uint8)
    canvas[: frame1.shape[0], : frame1.shape[1]] = frame1
    canvas[: frame2.shape[0], frame1.shape[1] :] = frame2
    off = frame1.shape[1]
    rng = np.random.default_rng(0)
    sel = rng.permutation(len(xy1))[:max_draw]
    for i in sel:
        p1 = tuple(np.round(xy1[i]).astype(int))
        p2 = tuple(np.round(xy2[i]).astype(int) + [off, 0])
        color = tuple(int(c) for c in rng.integers(64, 255, 3))
        cv2.line(canvas, p1, p2, color, 1, cv2.LINE_AA)
        cv2.circle(canvas, p1, 3, color, 1)
        cv2.circle(canvas, p2, 3, color, 1)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    cv2.imwrite(out_path, canvas)


def draw_keypoints(frame, xy, out_path, color=(0, 255, 0)):
    """Keypoint overlay (replaces cv2.drawKeypoints at ref:
    src/pipeline.py:92-95)."""
    import cv2

    img = frame.copy()
    for p in np.round(np.asarray(xy)).astype(int):
        cv2.circle(img, tuple(p), 3, color, 1, cv2.LINE_AA)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    cv2.imwrite(out_path, img)


def draw_depth_overlay(frame, xy, depths, out_path, pmin=5, pmax=95):
    """Percentile-normalized depth-colored circles (the legacy depth video
    frames, ref: legacy/depth_estimation.py:176-192)."""
    import cv2

    img = frame.copy()
    if len(depths):
        lo, hi = np.percentile(depths, [pmin, pmax])
        norm = np.clip((depths - lo) / max(hi - lo, 1e-9), 0, 1)
        cmap = cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_JET)
        for p, c in zip(np.round(np.asarray(xy)).astype(int), cmap[:, 0]):
            cv2.circle(img, tuple(p), 4, tuple(int(x) for x in c), -1, cv2.LINE_AA)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    cv2.imwrite(out_path, img)
