"""Synthetic rendered sequences with ground-truth camera trajectories.

The reference's video configs (video_0001 / lehman) reference files stripped
from the snapshot (.MISSING_LARGE_BLOBS:1-3), so end-to-end video testing
and ATE measurement need a generated stand-in.  This renders a two-plane
textured scene (two depths — a single plane would be a degenerate
configuration for essential-matrix estimation) by perspective-warping random
textures through exact plane homographies, for any camera trajectory.

Used by the synthetic-sequence E2E tests and by bench/demo tooling.
"""

from __future__ import annotations



import numpy as np


def _texture(rng, size=512, blobs=400):
    """Feature-rich random texture: blobs + gradients (FAST-detectable)."""
    import cv2

    img = np.full((size, size, 3), 80, np.uint8)
    for _ in range(blobs):
        c = tuple(int(x) for x in rng.integers(0, size, 2))
        col = tuple(int(x) for x in rng.integers(0, 255, 3))
        r = int(rng.integers(3, 14))
        cv2.circle(img, c, r, col, -1)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    return img


def _plane_corners_world(center, ex, ey, half):
    c = np.asarray(center, float)
    ex = np.asarray(ex, float)
    ey = np.asarray(ey, float)
    return np.stack([
        c - half * ex - half * ey,
        c + half * ex - half * ey,
        c + half * ex + half * ey,
        c - half * ex + half * ey,
    ])


def _subdivide(tex, corners, n):
    """Split a textured quad into an n x n grid of sub-quads (each with its
    texture crop).  render_frame skips any quad with a corner behind the
    camera; subdividing walls means only the sliver nearest the camera drops
    out instead of the whole wall going blank — essential for closed-room
    scenes where the camera walks along its own walls."""
    out = []
    c0, c1, c2, c3 = [np.asarray(c, float) for c in corners]
    h, w = tex.shape[:2]
    for i in range(n):        # texture y / ey direction
        for j in range(n):    # texture x / ex direction
            u0, u1 = j / n, (j + 1) / n
            v0, v1 = i / n, (i + 1) / n

            def P(u, v):
                top = c0 * (1 - u) + c1 * u
                bot = c3 * (1 - u) + c2 * u
                return top * (1 - v) + bot * v

            sub = tex[int(v0 * h):max(int(v1 * h), int(v0 * h) + 2),
                      int(u0 * w):max(int(u1 * w), int(u0 * w) + 2)]
            out.append((sub, np.stack([P(u0, v0), P(u1, v0),
                                       P(u1, v1), P(u0, v1)])))
    return out


def _project(K, R, t, X):
    Xc = X @ R.T + t
    return (Xc[:, :2] / Xc[:, 2:]) @ np.diag([K[0, 0], K[1, 1]]) + [K[0, 2], K[1, 2]]


def render_frame(K, R, t, planes, width=640, height=480, depth_sort=False):
    """planes: list of (texture, corners_world (4,3)), far to near order.
    ``depth_sort`` re-orders per frame by camera distance (painter's
    algorithm) — needed for closed scenes where the order depends on the
    viewpoint; planes behind the camera are skipped."""
    import cv2

    if depth_sort:
        def depth(p):
            c = p[1].mean(axis=0)
            return float((R @ c + t)[2])

        planes = sorted(planes, key=depth, reverse=True)

    frame = np.full((height, width, 3), 40, np.uint8)
    for tex, corners in planes:
        Xc = corners @ R.T + t
        if (Xc[:, 2] < 0.2).any():  # plane reaches behind the camera
            continue
        uv = _project(K, R, t, corners).astype(np.float32)
        if not np.isfinite(uv).all():
            continue
        src = np.array([[0, 0], [tex.shape[1] - 1, 0],
                        [tex.shape[1] - 1, tex.shape[0] - 1],
                        [0, tex.shape[0] - 1]], np.float32)
        H = cv2.getPerspectiveTransform(src, uv)
        warped = cv2.warpPerspective(tex, H, (width, height))
        mask = cv2.warpPerspective(np.ones(tex.shape[:2], np.uint8), H,
                                   (width, height))
        frame[mask > 0] = warped[mask > 0]
    return frame


def synthetic_sequence(
    n_frames: int = 20,
    width: int = 640,
    height: int = 480,
    fx: float = 450.0,
    seed: int = 0,
    motion: str = "strafe",
):
    """Yields (frames list, K, gt_positions (N,3), gt_rotations (N,3,3)).

    Ground-truth poses are extrinsics: x_cam = R @ X_world + t, with camera
    center C = -R^T t recorded in gt_positions.
    """
    from bundle_adjustment_tpu.ops.lie import so3_exp_np

    rng = np.random.default_rng(seed)
    K = np.array([[fx, 0, width / 2], [0, fx, height / 2], [0, 0, 1.0]])

    if motion == "room":
        # Closed scene for reference-scale long sequences (the reference's
        # real runs span frames 90-1400, legacy/local_BA_sparsity.py:698):
        # a textured box interior + two free-standing occluder planes; the
        # camera patrols an ellipse with sinusoidal yaw, so it REVISITS its
        # starting view (loop), sees walls occluded and disoccluded by the
        # inner planes, and sweeps viewpoints continuously.
        half = 8.0
        walls = []
        for center, ex, ey in [
            ([0, 0, half], [1, 0, 0], [0, 1, 0]),      # front wall
            ([0, 0, -half], [-1, 0, 0], [0, 1, 0]),    # back wall
            ([half, 0, 0], [0, 0, -1], [0, 1, 0]),     # right wall
            ([-half, 0, 0], [0, 0, 1], [0, 1, 0]),     # left wall
        ]:
            walls.extend(_subdivide(_texture(rng, size=768, blobs=900),
                                    _plane_corners_world(center, ex, ey, half),
                                    n=6))
        # occluders inside the room
        walls.append((_texture(rng, size=256, blobs=160),
                      _plane_corners_world([1.5, 0.3, 4.0], [1, 0, 0.2],
                                           [0, 1, 0], 1.0)))
        walls.append((_texture(rng, size=256, blobs=160),
                      _plane_corners_world([-2.5, -0.5, -3.0], [1, 0, -0.3],
                                           [0, 1, 0], 1.2)))
        frames, centers, rotations = [], [], []
        for i in range(n_frames):
            s = i / max(n_frames - 1, 1)
            ang = 2.0 * np.pi * s                       # full loop -> revisit
            C = np.array([2.5 * np.sin(ang), 0.3 * np.sin(2 * ang),
                          2.0 - 2.0 * np.cos(ang)])
            yaw = -ang + 0.35 * np.sin(3 * ang)         # look-around sweeps
            R = so3_exp_np(np.array([0.0, yaw, 0.0]))
            t = -R @ C
            frames.append(render_frame(K, R, t, walls, width, height,
                                       depth_sort=True))
            centers.append(C)
            rotations.append(R)
        return frames, K, np.stack(centers), np.stack(rotations)

    tex_far = _texture(rng)
    tex_near = _texture(rng)
    planes = [
        (tex_far, _plane_corners_world([0.6, 0.0, 9.0], [1, 0, 0], [0, 1, 0], 6.0)),
        (tex_near, _plane_corners_world([-1.2, -0.4, 4.5], [1, 0, 0.15], [0, 1, 0], 1.8)),
    ]

    frames, centers, rotations = [], [], []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        if motion == "strafe":
            C = np.array([2.2 * s, 0.25 * np.sin(2 * np.pi * s), 0.4 * s])
            w = np.array([0.0, -0.25 * s, 0.0])
        elif motion == "orbit":
            ang = 0.5 * s
            C = np.array([3.0 * np.sin(ang), 0.0, 6.0 - 6.0 * np.cos(ang)])
            w = np.array([0.0, -ang, 0.0])
        else:
            raise ValueError(motion)
        R = so3_exp_np(w)
        t = -R @ C
        frames.append(render_frame(K, R, t, planes, width, height))
        centers.append(C)
        rotations.append(R)
    return frames, K, np.stack(centers), np.stack(rotations)


def write_video(frames, path: str, fps: int = 15):
    """Write frames to an mp4 (exercises the cv2.VideoWriter/Capture path the
    reference drives through, src/main.py:50)."""
    import cv2

    h, w = frames[0].shape[:2]
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        out.write(f)
    out.release()
