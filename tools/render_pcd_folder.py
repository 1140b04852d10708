"""Render a folder of PCD files into depth-colored frames and an mp4 —
the non-interactive counterpart of the reference's Open3D viewer
(legacy/visualize_pc_folder.py: steps through frame_%05d.pcd files with
depth-colored viridis points, key 'N' advancing; here every frame renders
headlessly and an mp4 replaces the key loop, since no display/open3d exists
in this environment).

Usage:
    python tools/render_pcd_folder.py <pcd_dir> <out_dir> [--fps 5]
Consumes the series written by the pipeline's ``export_pcd_series`` option.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")


def render_pcd(path: str, out_png: str, elev=-70.0, azim=-90.0, bounds=None):
    from bundle_adjustment_tpu.utils.io import read_pcd

    pts, colors = read_pcd(path)
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    if len(pts):
        # depth-colored viridis like the reference viewer
        # (legacy/visualize_pc_folder.py:83-95)
        depth = pts[:, 2]
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=depth, cmap="viridis",
                   s=2, depthshade=False)
        if bounds is None:
            mins, maxs = pts.min(0), pts.max(0)
        else:
            mins, maxs = bounds
        center = (mins + maxs) / 2
        half = max((maxs - mins).max() / 2, 1e-3)
        ax.set_xlim(center[0] - half, center[0] + half)
        ax.set_ylim(center[1] - half, center[1] + half)
        ax.set_zlim(center[2] - half, center[2] + half)
    ax.view_init(elev=elev, azim=azim)
    ax.set_title(os.path.basename(path) + f"  ({len(pts)} pts)")
    fig.savefig(out_png, dpi=90)
    plt.close(fig)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("pcd_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--fps", type=int, default=5)
    args = ap.parse_args(argv)

    paths = sorted(glob.glob(os.path.join(args.pcd_dir, "*.pcd")))
    if not paths:
        raise SystemExit(f"no .pcd files in {args.pcd_dir}")
    os.makedirs(args.out_dir, exist_ok=True)

    # shared bounds from the last (largest) cloud for a stable camera
    from bundle_adjustment_tpu.utils.io import read_pcd

    pts_last, _ = read_pcd(paths[-1])
    bounds = (pts_last.min(0), pts_last.max(0)) if len(pts_last) else None

    pngs = []
    for p in paths:
        out_png = os.path.join(args.out_dir,
                               os.path.splitext(os.path.basename(p))[0] + ".png")
        render_pcd(p, out_png, bounds=bounds)
        pngs.append(out_png)
    print(f"rendered {len(pngs)} frames")

    import cv2

    first = cv2.imread(pngs[0])
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(os.path.join(args.out_dir, "pcd_replay.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), args.fps, (w, h))
    for p in pngs:
        img = cv2.imread(p)
        if img is not None and img.shape[:2] == (h, w):
            vw.write(img)
    vw.release()
    print(os.path.join(args.out_dir, "pcd_replay.mp4"))


if __name__ == "__main__":
    main()
