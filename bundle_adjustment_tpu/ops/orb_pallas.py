"""Pallas patch-gather kernel: per-keypoint image patches via pipelined DMAs.

Why: after the dense-moments/matmul ORB redesign, ~70% of the remaining
extraction cost is the per-keypoint (37, 37) patch slice-gather for
descriptor sampling (XLA lowers vmapped dynamic_slice to a gather op that is
row-latency-bound at ~1.55 µs per slice — measured, tools/profile_orb.py).
The TPU-native fix is manual DMA with up to CHUNK copies in flight per grid
step.

Mosaic constrains HBM slices to the (8, 128) tiling: slice sizes AND dynamic
offsets must be tile-aligned on both trailing dims.  So each keypoint DMAs an
aligned (48, 256) band that covers its patch (row offset rounded down to 8,
column offset to 128: the 40-row window fits since 40 + 7 <= 48, the 37-col
window since 37 + 127 <= 256), then the kernel
extracts the exact (40, 40) patch with two tiny MXU matmuls against one-hot
row/column selection matrices built in-registers from the residual offsets:

    patch = S_row(40, 48) @ band(48, 256) @ S_col(256, 40)
    S_row[i, k] = [k == ry + i],  S_col[c, j] = [c == rx + j]

The patch grid is (40, 40) with the keypoint centered at (18, 18); cells
beyond 37 are never referenced by the descriptor pattern matrix (zero rows).

Replaces the gather inside ``orb._describe`` (ref behavior: cv2 ORB
descriptor sampling, /root/reference/src/features.py:13-16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 128       # keypoints per grid step == max in-flight DMAs
                   # (measured on v5e: 0.33 ms/1291 keypoints at 128 vs
                   # 0.62 ms at 64 vs 1.94 ms for the XLA slice-gather;
                   # 256 would exceed VMEM: bands alone are 12.6 MB)
_BAND_R = 48       # DMA band rows (multiple of 8; covers 40 + ry<8)
_BAND_C = 256      # DMA band cols (multiple of 128; covers 37 + rx<128)
_OUT = 40          # output patch side (rows [py0, py0+40), cols likewise)


def _gather_kernel(starts_ref, img_ref, out_ref, bands, sems):
    """starts_ref: SMEM (4, B_pad) i32 rows (y_aligned, x_aligned, ry, rx) —
    transposed so SMEM's 128-lane row padding costs 4 rows, not B_pad rows
    (at level-0 budgets a (B_pad, 4) layout alone exceeds the 1 MB SMEM);
    img_ref: (H_pad, W_pad) f32 in HBM (ANY); out_ref: VMEM block
    (CHUNK, OUT, OUT); bands: VMEM scratch (CHUNK, BAND_R, BAND_C);
    sems: (CHUNK,) DMA semaphores."""
    i = pl.program_id(0)

    def copy(j):
        ya = pl.multiple_of(starts_ref[0, i * _CHUNK + j], 8)
        xa = pl.multiple_of(starts_ref[1, i * _CHUNK + j], 128)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(ya, _BAND_R), pl.ds(xa, _BAND_C)],
            bands.at[j],
            sems.at[j],
        )

    def start(j, _):
        copy(j).start()
        return 0

    jax.lax.fori_loop(0, _CHUNK, start, 0)

    def extract(j, _):
        copy(j).wait()
        ry = starts_ref[2, i * _CHUNK + j]
        rx = starts_ref[3, i * _CHUNK + j]
        band = bands[j]                                     # (BAND_R, BAND_C)
        rows_k = jax.lax.broadcasted_iota(jnp.int32, (_OUT, _BAND_R), 1)
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (_OUT, _BAND_R), 0)
        s_row = (rows_k == rows_i + ry).astype(band.dtype)  # (OUT, BAND_R)
        cols_c = jax.lax.broadcasted_iota(jnp.int32, (_BAND_C, _OUT), 0)
        cols_j = jax.lax.broadcasted_iota(jnp.int32, (_BAND_C, _OUT), 1)
        s_col = (cols_c == cols_j + rx).astype(band.dtype)  # (BAND_C, OUT)
        # center at 128 BEFORE the selection dots: the MXU runs f32 matmuls
        # as bf16 passes at default precision, so values are bf16-rounded —
        # centering first keeps that rounding at <= 0.25 intensity steps,
        # exactly matching what the downstream bf16 descriptor matmul needs
        # (orb._describe feeds (patch - 128) to the pattern matrix).
        patch = jax.lax.dot(
            jax.lax.dot(s_row, band - 128.0,
                        preferred_element_type=jnp.float32),
            s_col, preferred_element_type=jnp.float32)
        out_ref[j] = patch
        return 0

    jax.lax.fori_loop(0, _CHUNK, extract, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_patches40(img, start_y, start_x, *, interpret: bool = False):
    """img: (H, W) f32; start_y/start_x: (B,) i32 patch origins in
    [0, H-37] / [0, W-37].  Returns (B, 40, 40) f32 where out[b, i, j] ≈
    img[start_y[b]+i, start_x[b]+j] - 128 (centered; values carry <= 0.25
    bf16 rounding from the MXU selection passes — irrelevant to descriptor
    bits, which compare pixel pairs).  Zero-padded beyond the image edge;
    only rows/cols < 37 are meaningful to callers."""
    H, W = img.shape
    B = start_y.shape[0]
    B_pad = -(-B // _CHUNK) * _CHUNK

    padded = jnp.pad(img, ((0, _BAND_R), (0, _BAND_C)))
    ya = (start_y // 8) * 8
    xa = (start_x // 128) * 128
    starts = jnp.zeros((4, B_pad), jnp.int32)
    starts = starts.at[0, :B].set(ya).at[1, :B].set(xa)
    starts = starts.at[2, :B].set(start_y - ya).at[3, :B].set(start_x - xa)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B_pad // _CHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (_CHUNK, _OUT, _OUT),
            index_map=lambda i, starts: (i, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((_CHUNK, _BAND_R, _BAND_C), jnp.float32),
            pltpu.SemaphoreType.DMA((_CHUNK,)),
        ],
    )
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((B_pad, _OUT, _OUT), img.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, padded)
    return out[:B]
