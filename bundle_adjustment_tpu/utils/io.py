"""Host I/O: frame sources, PCD point-cloud files, voxel downsampling.

open3d is not available in this environment (SURVEY §2.3), so the PCD
writer/reader is hand-rolled (ASCII and binary little-endian, the subset
open3d emits).  cv2 is kept for pure I/O (video decode, image read) exactly
as the reference uses it (ref: src/main.py:50, legacy/mapping_mvs.py:171-174)
— it is not on the compute path.
"""

from __future__ import annotations

import glob
import os
import struct
from typing import Iterator, Optional

import numpy as np


# -- frame sources ---------------------------------------------------------

def video_frames(path: str, start: int = 0, end: Optional[int] = None) -> Iterator[np.ndarray]:
    """Yield BGR frames from a video (ref driver loop: src/main.py:50-73).
    ``start``/``end`` mirror the legacy frame-range runs
    (ref: legacy/local_BA_sparsity.py:698 — frames 90..1400 etc.)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    i = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok or (end is not None and i >= end):
                return
            if i >= start:
                yield frame
            i += 1
    finally:
        cap.release()


def image_folder_frames(folder: str, pattern: str = "*") -> Iterator[np.ndarray]:
    """Yield BGR frames from a sorted image folder (ref:
    legacy/mapping_mvs.py:171-174, legacy/local_BA_sparsity_images.py:674-678)."""
    import cv2

    paths = sorted(
        p for p in glob.glob(os.path.join(folder, pattern))
        if p.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    if not paths:
        raise FileNotFoundError(f"no images found in {folder}")
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if img is not None:
            yield img


def prefetch(iterator: Iterator, depth: int = 3) -> Iterator:
    """Run an iterator (e.g. video decode) in a background thread with a
    bounded queue, overlapping host I/O with device compute — the single-chip
    pipeline-parallel analog (SURVEY §2.5 PP row).  cv2 releases the GIL
    inside decode, so a plain thread suffices; exceptions propagate."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


# -- PCD -------------------------------------------------------------------

def write_pcd(path: str, points: np.ndarray, colors: Optional[np.ndarray] = None,
              binary: bool = False):
    """Write a PCD v0.7 file (x y z [rgb]).  Colors are floats in [0, 1]
    packed into the PCL float-rgb convention."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    n = len(points)
    has_color = colors is not None
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    fields = "x y z rgb" if has_color else "x y z"
    sizes = "4 4 4 4" if has_color else "4 4 4"
    types = "F F F F" if has_color else "F F F"
    counts = "1 1 1 1" if has_color else "1 1 1"
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {fields}\n"
        f"SIZE {sizes}\n"
        f"TYPE {types}\n"
        f"COUNT {counts}\n"
        f"WIDTH {n}\n"
        "HEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )

    if has_color:
        c = np.clip(np.asarray(colors).reshape(-1, 3), 0, 1)
        rgb_u32 = (
            (np.round(c[:, 0] * 255).astype(np.uint32) << 16)
            | (np.round(c[:, 1] * 255).astype(np.uint32) << 8)
            | np.round(c[:, 2] * 255).astype(np.uint32)
        )
        rgb_f = rgb_u32.view(np.float32)
        data = np.column_stack([points, rgb_f])
    else:
        data = points

    if binary:
        with open(path, "wb") as f:
            f.write(header.encode())
            f.write(np.ascontiguousarray(data, np.float32).tobytes())
    else:
        with open(path, "w") as f:
            f.write(header)
            for row in data:
                if has_color:
                    f.write(f"{row[0]:.6f} {row[1]:.6f} {row[2]:.6f} "
                            f"{struct.unpack('<f', struct.pack('<f', row[3]))[0]:.9e}\n")
                else:
                    f.write(f"{row[0]:.6f} {row[1]:.6f} {row[2]:.6f}\n")


def read_pcd(path: str):
    """Read the PCD subset written by ``write_pcd``.  Returns (points, colors
    or None)."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode().strip()
            if line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key] = val
            if key == "DATA":
                break
        n = int(header["POINTS"])
        fields = header["FIELDS"].split()
        ncols = len(fields)
        if header["DATA"] == "binary":
            data = np.frombuffer(f.read(n * ncols * 4), np.float32).reshape(n, ncols)
        else:
            data = np.loadtxt(f, dtype=np.float32).reshape(n, ncols)
    points = data[:, :3].astype(np.float64)
    colors = None
    if "rgb" in fields:
        rgb_u32 = np.ascontiguousarray(data[:, fields.index("rgb")]).view(np.uint32)
        colors = np.stack(
            [(rgb_u32 >> 16) & 0xFF, (rgb_u32 >> 8) & 0xFF, rgb_u32 & 0xFF], axis=1
        ).astype(np.float64) / 255.0
    return points, colors


def voxel_downsample(points: np.ndarray, colors: Optional[np.ndarray], voxel: float):
    """Average points (and colors) per voxel — replaces
    open3d.voxel_down_sample (ref: legacy/local_BA.py:586, mapping.py:209)."""
    if len(points) == 0:
        return points, colors
    keys = np.floor(points / voxel).astype(np.int64)
    # hash voxel coords to one int key
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    n_vox = counts.shape[0]
    acc = np.zeros((n_vox, 3))
    np.add.at(acc, inv, points)
    out_pts = acc / counts[:, None]
    out_colors = None
    if colors is not None:
        cacc = np.zeros((n_vox, 3))
        np.add.at(cacc, inv, colors)
        out_colors = cacc / counts[:, None]
    return out_pts, out_colors
