"""ORB-style feature detection + description, TPU-native.

Replaces cv2.ORB_create().detectAndCompute (ref call site:
src/features.py:13-16; budget 4000 at src/main.py:60).  Everything is
static-shape and jits once per image geometry:

- image pyramid (``pyramid_levels`` levels, scale 1.2) via bilinear resize
- FAST-9 corner test vectorized as 16 shifted-image comparisons with the
  contiguous-arc check done by bit-packing the 16 compare bits into an int32
  and AND-shifting (runs >= 9 in five ops) — no per-pixel loops
- 3x3 NMS on a FAST magnitude score, Harris re-ranking (OpenCV's default
  HARRIS_SCORE behavior), fixed per-level budgets via lax.approx_max_k
  (the TPU-native two-stage top-k)
- intensity-centroid orientation over a radius-15 disc, computed as DENSE
  moment maps (incremental shift-add filters) instead of per-keypoint
  gathers — TPU element gathers are scalar-unit-bound (measured ~9 ms for
  one level's disc gathers vs sub-ms dense; tools/profile_orb.py)
- steered-BRIEF 256-bit descriptors: one (37, 37) patch per keypoint via a
  big-slice gather, then all pair comparisons for the keypoint's 12° angle
  bin (the ORB paper's rBRIEF steering quantization) as a single bf16 MXU
  matmul against a precomputed ±1 pattern matrix

Parity note (SURVEY §7 hard part 1): this targets *behavioral* parity
(match statistics, downstream trajectory), not bit parity with OpenCV.  The
BRIEF point pattern is a seeded Gaussian pattern (BRIEF-style), not OpenCV's
learned table — descriptors only ever match against descriptors from this
same extractor, so the pattern choice is free; the documented escape hatch
for isolation testing is feeding cv2-extracted features into the pipeline.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST

# FAST radius-3 Bresenham circle, in order around the circle (x, y)
_FAST_CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)

_PATCH_R = 15          # orientation disc radius
_SAMPLE_R = 18         # max |rotated BRIEF offset| (pattern norm <= 13*sqrt(2))
_PATCH = 2 * _SAMPLE_R + 1   # meaningful descriptor patch side (37)
_GRID = 40             # physical patch side (rows/cols 37..39 unused; 40 is
                       # what the Pallas DMA path produces — 8-aligned)
_BORDER = 19           # detection border (sampling radius + 1)
_NUM_PAIRS = 256
_NBINS = 30            # rBRIEF steering quantization: 2*pi/30 = 12 degrees
_DESC_DTYPE = "bfloat16"  # descriptor-matmul operand dtype (see _describe)
# Cross-level dedup cell (px at level 0; 0 disables).  Decided on the END
# metric, not the pairwise proxy (r05 multi-seed study, tools/dedup_study.py,
# committed artifacts in .dedup_study/): 600-frame stress ATE over 5 seeds is
# 8.4+-3.8% at 3 px vs 10.0+-3.4% at 1 px, with 3 px winning the per-seed
# pairing 4/5 — even though 1 px wins the desk/scout pairwise scorecard
# (tools/orb_quality.py: RANSAC inliers 1.27x cv2 vs 0.69x; r04 measured the
# suppression of strong corners' co-detections).  The pairwise scorecard is
# the proxy that lost.  Seed spread is +-3.4-3.8 pp, larger than the 1.6 pp
# mean gap: any future frontend change must be gated on the multi-seed mean,
# never a single-seed ATE (BASELINE.md r05).
_DEDUP_CELL_PX = 3.0

# toggle for the Pallas DMA patch-gather (ops/orb_pallas.py); module-level so
# a host can fall back to the XLA slice-gather if Mosaic rejects the kernel
USE_PALLAS_GATHER = True


def _make_brief_pattern(seed: int = 1234) -> np.ndarray:
    """(256, 2, 2) int32 point-pair offsets, BRIEF-style isotropic Gaussian
    (sigma = patch/5), clipped to the patch.  Fixed seed => deterministic
    descriptors across processes/hosts."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, _PATCH_R * 2 / 5.0, size=(_NUM_PAIRS, 2, 2))
    return np.clip(np.round(pts), -(_PATCH_R - 2), _PATCH_R - 2).astype(np.int32)


try:
    # decorrelated pattern learned offline by tools/learn_brief_pattern.py
    # (the ORB paper's greedy rBRIEF selection, our own training run)
    from bundle_adjustment_tpu.ops.brief_pattern import PATTERN as _BRIEF_PATTERN
except ImportError:  # fall back to the plain seeded Gaussian pattern
    _BRIEF_PATTERN = _make_brief_pattern()

class Keypoints(NamedTuple):
    """SoA keypoint batch, fixed capacity N (padded, masked)."""

    xy: jnp.ndarray        # (N, 2) f32, level-0 pixel coords (x, y)
    response: jnp.ndarray  # (N,) f32 Harris response
    angle: jnp.ndarray     # (N,) f32 radians
    size: jnp.ndarray      # (N,) f32 patch diameter at level 0 scale
    level: jnp.ndarray     # (N,) i32 pyramid level
    desc: jnp.ndarray      # (N, 8) u32 packed 256-bit descriptors
    valid: jnp.ndarray     # (N,) bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0, ksize: int = 7) -> jnp.ndarray:
    """Separable Gaussian blur, reflect padding.  img: (H, W) f32."""
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    kj = jnp.asarray(k)
    p = jnp.pad(img, ((0, 0), (r, r)), mode="edge")
    img_h = sum(p[:, i : i + img.shape[1]] * kj[i] for i in range(ksize))
    p = jnp.pad(img_h, ((r, r), (0, 0)), mode="edge")
    return sum(p[i : i + img.shape[0], :] * kj[i] for i in range(ksize))


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9 corner score map: 0 where not a corner, else the arc-contrast
    magnitude used for NMS.  img: (H, W) f32 in [0, 255]."""
    H, W = img.shape
    p = jnp.pad(img, ((3, 3), (3, 3)), mode="edge")  # one pad, 16 static slices
    shifted = jnp.stack(
        [p[3 + int(dy):3 + int(dy) + H, 3 + int(dx):3 + int(dx) + W]
         for dx, dy in _FAST_CIRCLE])
    bright = shifted > img[None] + threshold          # (16, H, W)
    dark = shifted < img[None] - threshold

    def has_run9(masks):
        bits = jnp.zeros(img.shape, jnp.int32)
        for i in range(16):
            bits = bits | (masks[i].astype(jnp.int32) << i)
        y = bits | (bits << 16)
        z = y & (y >> 1)    # runs >= 2
        z = z & (z >> 2)    # >= 4
        z = z & (z >> 4)    # >= 8
        z = z & (z >> 1)    # >= 9
        return z != 0

    corner = has_run9(bright) | has_run9(dark)
    diff = shifted - img[None]
    bright_mag = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=0)
    dark_mag = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=0)
    return jnp.where(corner, jnp.maximum(bright_mag, dark_mag), 0.0)


def harris_response(img: jnp.ndarray, k: float = 0.04, block: int = 7) -> jnp.ndarray:
    """Dense Harris corner response (Sobel gradients, box-summed products)."""
    p = jnp.pad(img, 1, mode="edge")
    gx = (
        (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])
    ) * 0.125
    gy = (
        (p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])
    ) * 0.125

    def box(a):
        r = block // 2
        pa = jnp.pad(a, r, mode="edge")
        c = jnp.cumsum(jnp.cumsum(pa, axis=0), axis=1)
        c = jnp.pad(c, ((1, 0), (1, 0)))
        H, W = a.shape
        return (
            c[block : block + H, block : block + W]
            - c[:H, block : block + W]
            - c[block : block + H, :W]
            + c[:H, :W]
        )

    sxx, syy, sxy = box(gx * gx), box(gy * gy), box(gx * gy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def _nms3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep strict local maxima over a 3x3 neighborhood."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((score == m) & (score > 0), score, 0.0)


def _moment_maps(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense intensity-centroid moments (m10, m01) over the radius-15 disc at
    EVERY pixel — orientation without per-keypoint gathers.

    TPU rationale (measured, tools/profile_orb.py): the per-keypoint disc
    gather (709 samples x ~1300 keypoints) costs ~9 ms/level because TPU
    element gathers are scalar-unit work; these dense maps are ~150 fused
    full-image VPU adds (HBM-bandwidth bound, sub-ms), after which the
    per-keypoint read is 2 elements.  Uses incremental-width x-filters:
      ramp  R_w(y,x) = sum_{j=1..w} j*(I(y,x+j) - I(y,x-j))
      box   B_w(y,x) = sum_{|j|<=w} I(y,x+j)
    with R_w = R_{w-1} + w*(I_{+w} - I_{-w}) (and box analog), then
      m10 = sum_dy R_{w(|dy|)} shifted by dy,   w(dy) = floor(sqrt(r^2-dy^2))
      m01 = sum_dy dy * B_{w(|dy|)} shifted by dy
    which is exactly sum over the disc of dx*I / dy*I (edge-clamped borders,
    same values as the old clipped gather)."""
    H, W = img.shape
    r = _PATCH_R
    p = jnp.pad(img, r, mode="edge")  # (H+2r, W+2r)
    widths = [int(np.floor(np.sqrt(r * r - dy * dy))) for dy in range(r + 1)]

    def xs(j):  # x-shifted view, all padded rows kept for the later y-shift
        return p[:, r + j : r + j + W]

    ramp = [jnp.zeros((H + 2 * r, W), img.dtype)]
    box = [xs(0)]
    for j in range(1, r + 1):
        ramp.append(ramp[-1] + float(j) * (xs(j) - xs(-j)))
        box.append(box[-1] + xs(j) + xs(-j))

    m10 = jnp.zeros((H, W), img.dtype)
    m01 = jnp.zeros((H, W), img.dtype)
    for dy in range(-r, r + 1):
        w = widths[abs(dy)]
        if w > 0:
            m10 = m10 + ramp[w][r + dy : r + dy + H, :]
        if dy != 0:
            m01 = m01 + float(dy) * box[w][r + dy : r + dy + H, :]
    return m10, m01


def _detect_level(img_f32, threshold, budget, border=_BORDER):
    """One pyramid level: FAST -> NMS -> Harris re-rank -> top-`budget`.
    Returns (xy_level f32 (B,2) [x,y], harris (B,), angle (B,), valid (B,),
    desc_u32 (B, 8))."""
    H, W = img_f32.shape
    blurred = gaussian_blur(img_f32)

    score = _nms3(fast_score_map(img_f32, threshold))
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_border = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    harris = harris_response(img_f32)
    # rank candidates by Harris (OpenCV HARRIS_SCORE), -inf where not a corner
    rank = jnp.where((score > 0) & in_border, harris, -jnp.inf)

    # approx_max_k is the TPU-native top-k (two-stage partial reduction;
    # ~free vs ~1.3 ms for exact lax.top_k on a 720p map).  Missing a few of
    # the true top-`budget` corners is behaviorally irrelevant: budgets are
    # already inflated by `overdetect` and re-compacted across levels.
    top_vals, top_idx = jax.lax.approx_max_k(
        rank.reshape(-1), budget, recall_target=0.95)
    valid = jnp.isfinite(top_vals)
    yx = jnp.stack([top_idx // W, top_idx % W], axis=1).astype(jnp.int32)  # (B, 2)

    # subpixel refinement: 1D quadratic fit on the FAST score along each axis
    # (integer-pixel keypoints are the dominant noise source at strict
    # epipolar thresholds; cv2 ORB also returns integer corners, so this is
    # an accuracy improvement, not a parity requirement)
    def score_at(dy, dx):
        return score[jnp.clip(yx[:, 0] + dy, 0, H - 1),
                     jnp.clip(yx[:, 1] + dx, 0, W - 1)]

    s0 = score_at(0, 0)

    def subpixel_offset(s_minus, s_plus):
        denom = s_minus - 2.0 * s0 + s_plus
        off = 0.5 * (s_minus - s_plus) / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        return jnp.clip(off, -0.5, 0.5)

    off_x = subpixel_offset(score_at(0, -1), score_at(0, 1))
    off_y = subpixel_offset(score_at(-1, 0), score_at(1, 0))

    # orientation: intensity centroid over the disc, read from the dense
    # moment maps (2 element gathers per keypoint instead of 709)
    m10, m01 = _moment_maps(img_f32)
    flat = yx[:, 0] * W + yx[:, 1]
    angle = jnp.arctan2(m01.reshape(-1)[flat], m10.reshape(-1)[flat])

    desc = _describe(blurred, yx, angle)
    xy = jnp.stack([yx[:, 1] + off_x, yx[:, 0] + off_y], axis=1).astype(jnp.float32)  # (x, y)
    return xy, top_vals, angle, valid, desc


def _pattern_matrix() -> np.ndarray:
    """(GRID*GRID, NBINS*256) ±1 descriptor-sampling matrix.

    The ORB paper's rBRIEF discretizes the steering rotation to 2π/30 (12°)
    increments and precomputes the rotated pattern per bin; this bakes that
    lookup table into a single constant matrix so descriptor sampling becomes
    one MXU matmul over extracted patches:
        bit(k, j) = [patch_k · D[:, bin_k*256 + j] > 0]
    where column (q, j) is onehot(rotated point b) - onehot(rotated point a)
    (so bit = I(p_a) < I(p_b), identical semantics to direct sampling; a pair
    whose endpoints round to the same cell yields 0 -> bit False, matching
    the strict '<')."""
    D = np.zeros((_GRID * _GRID, _NBINS * _NUM_PAIRS), np.float32)
    pat = _BRIEF_PATTERN.astype(np.float64)                 # (256, 2, 2) [x, y]
    px, py = pat[..., 0], pat[..., 1]                       # (256, 2)
    for q in range(_NBINS):
        th = 2.0 * np.pi * q / _NBINS
        c, s = np.cos(th), np.sin(th)
        ox = np.round(px * c - py * s).astype(np.int64)     # (256, 2)
        oy = np.round(px * s + py * c).astype(np.int64)
        cell = (oy + _SAMPLE_R) * _GRID + (ox + _SAMPLE_R)
        cols = q * _NUM_PAIRS + np.arange(_NUM_PAIRS)
        np.add.at(D, (cell[:, 1], cols), 1.0)
        np.add.at(D, (cell[:, 0], cols), -1.0)
    return D


_PATTERN_MATRIX = _pattern_matrix()


def _extract_patches(blurred, start_y, start_x):
    """(B, 40, 40) f32 patches centered at 128.  On TPU: the Pallas DMA
    gather kernel (ops/orb_pallas.py, ~6x the XLA slice-gather); elsewhere:
    vmapped dynamic_slice (XLA lowers it to one gather of large contiguous
    slices — still ~5x faster per element than per-sample element gathers)."""
    if USE_PALLAS_GATHER and jax.default_backend() == "tpu":
        from bundle_adjustment_tpu.ops import orb_pallas

        return orb_pallas.gather_patches40(blurred, start_y, start_x)
    H, W = blurred.shape
    p = jnp.pad(blurred, ((0, _GRID - _PATCH), (0, _GRID - _PATCH)))

    def one(sy, sx):
        return jax.lax.dynamic_slice(p, (sy, sx), (_GRID, _GRID))

    return jax.vmap(one)(start_y, start_x) - 128.0


def _describe(blurred, yx, angle):
    """Steered-BRIEF, TPU-native: extract one patch per keypoint (Pallas DMA
    kernel / big-slice gather — see _extract_patches), then do all 256 pair
    comparisons for the keypoint's 12° angle bin as one bf16 MXU matmul
    against the precomputed ±1 pattern matrix.  Packs to (B, 8) u32."""
    H, W = blurred.shape
    start_y = jnp.clip(yx[:, 0] - _SAMPLE_R, 0, H - _PATCH)
    start_x = jnp.clip(yx[:, 1] - _SAMPLE_R, 0, W - _PATCH)

    patches = _extract_patches(blurred, start_y, start_x)   # (B, 40, 40)
    # centered at 128 so bf16 quantization error is ~0.25 intensity steps;
    # the shift cancels exactly in every pair difference (columns sum to 0)
    dt = jnp.dtype(_DESC_DTYPE)
    pm = patches.reshape(-1, _GRID * _GRID).astype(dt)
    D = jnp.asarray(_PATTERN_MATRIX, dt)
    vals = jax.lax.dot_general(
        pm, D, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(-1, _NBINS, _NUM_PAIRS)

    # soft steering: linear blend of the two adjacent bins (recovers the
    # quality lost to hard 12° quantization — measured cross-view epipolar
    # inlier ratio 0.38 hard vs 0.45 blended on the desk pair — for the cost
    # of a 2-hot instead of 1-hot bin-select einsum)
    a = angle * (_NBINS / (2.0 * np.pi))
    q0 = jnp.floor(a).astype(jnp.int32)
    t = (a - q0.astype(a.dtype))[:, None]
    w = (jax.nn.one_hot(jnp.mod(q0, _NBINS), _NBINS, dtype=vals.dtype) * (1 - t)
         + jax.nn.one_hot(jnp.mod(q0 + 1, _NBINS), _NBINS, dtype=vals.dtype) * t)
    sel = jnp.einsum("bq,bqj->bj", w, vals)
    bits = (sel > 0).astype(jnp.uint32)                     # (B, 256)

    lane = jnp.arange(256, dtype=jnp.uint32) % 32
    word = np.arange(256) // 32
    shifted = bits << lane[None, :]
    desc = jnp.stack(
        [
            jnp.bitwise_or.reduce(shifted[:, word == w], axis=1)
            for w in range(8)
        ],
        axis=1,
    )
    return desc


def level_budgets(num_features: int, levels: int, scale: float) -> list[int]:
    """Per-level keypoint budgets, geometric in 1/scale^2 (OpenCV's split)."""
    f = 1.0 / (scale * scale)
    raw = np.array([f**i for i in range(levels)])
    raw = raw / raw.sum() * num_features
    b = np.maximum(np.round(raw).astype(int), 1)
    # fix rounding so the total is exact
    b[0] += num_features - b.sum()
    return [int(x) for x in b]


@functools.partial(
    jax.jit,
    static_argnames=("num_features", "levels", "scale", "threshold", "height",
                     "width", "overdetect"),
)
def extract(
    image_u8: jnp.ndarray,
    *,
    num_features: int = 4000,
    levels: int = 8,
    scale: float = 1.2,
    threshold: float = 20.0,
    height: int = 720,
    width: int = 1280,
    overdetect: float = 1.6,
) -> Keypoints:
    """Detect + describe up to ``num_features`` keypoints.  image_u8: (H, W)
    grayscale.  Returns a fixed-capacity Keypoints SoA (invalid slots masked).

    ``overdetect`` inflates the per-level detection budgets so that the
    cross-level dedup pass (below) still leaves ~num_features survivors; the
    final output is compacted to the top num_features by response.
    """
    img0 = image_u8.astype(jnp.float32)
    budgets = level_budgets(int(num_features * overdetect), levels, scale)

    parts = []
    img = img0
    for lvl in range(levels):
        sf = scale**lvl
        h, w = max(int(round(height / sf)), 64), max(int(round(width / sf)), 64)
        if lvl > 0:
            img = jax.image.resize(img0, (h, w), method="bilinear")
        xy, resp, ang, valid, desc = _detect_level(img, threshold, budgets[lvl])
        parts.append(
            (
                xy * sf,                                   # back to level-0 coords
                resp,
                ang,
                jnp.full_like(resp, 31.0 * sf),
                jnp.full(resp.shape, lvl, jnp.int32),
                desc,
                valid,
            )
        )

    xy = jnp.concatenate([p[0] for p in parts])
    resp = jnp.concatenate([p[1] for p in parts])
    ang = jnp.concatenate([p[2] for p in parts])
    size = jnp.concatenate([p[3] for p in parts])
    lvl = jnp.concatenate([p[4] for p in parts])
    desc = jnp.concatenate([p[5] for p in parts])
    valid = jnp.concatenate([p[6] for p in parts])

    # Cross-level dedup: the same physical corner detected at adjacent pyramid
    # levels yields near-identical descriptors, so a keypoint's own duplicate
    # becomes its 2nd-nearest neighbor and Lowe's ratio test kills the true
    # match.  Keep only the highest-response keypoint per _DEDUP_CELL_PX
    # level-0 cell (segment-max with index tie-break; single pass, static
    # shapes).
    if _DEDUP_CELL_PX > 0:
        cp = _DEDUP_CELL_PX
        cell_w = int((width + 2) // cp) + 1
        cell_h = int((height + 2) // cp) + 1
        cell = (
            jnp.clip((xy[:, 1] / cp).astype(jnp.int32), 0, cell_h - 1) * cell_w
            + jnp.clip((xy[:, 0] / cp).astype(jnp.int32), 0, cell_w - 1)
        )
        n_cells = cell_h * cell_w
        n = resp.shape[0]
        # unique integer rank (best response = highest score) so exactly one
        # winner per cell regardless of f32 ties
        order = jnp.argsort(jnp.where(valid, -resp, jnp.inf))
        rank = jnp.zeros(n, jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        score = -rank
        cell_best = jax.ops.segment_max(score, cell, num_segments=n_cells)
        valid = valid & (score == cell_best[cell])

    # compact to the top num_features survivors by response (static shape)
    sel_score = jnp.where(valid, resp, -jnp.inf)
    _, sel = jax.lax.top_k(sel_score, num_features)
    return Keypoints(
        xy=xy[sel],
        response=resp[sel],
        angle=ang[sel],
        size=size[sel],
        level=lvl[sel],
        desc=desc[sel],
        valid=valid[sel] & jnp.isfinite(sel_score[sel]),
    )
