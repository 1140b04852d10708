"""Fused Pallas TPU kernel: tiled Hamming 2-NN without materializing the
distance matrix.

The XLA path (ops/hamming.py) writes the full N1 x N2 f32 distance matrix to
HBM (64 MB at 4096^2) and reads it back twice for the top-2 — HBM bandwidth
dominates.  This kernel streams 128-wide column tiles of the bit matrix
through the MXU and folds the running (best, second, argbest) per query row
entirely in VMEM: HBM traffic drops to the inputs + three N1-vectors.

This is the "tile the O(N^2) object through VMEM" pattern SURVEY §2.5 maps
ring attention onto for this workload (replacing cv2.BFMatcher.knnMatch,
ref: src/features.py:26-41).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bundle_adjustment_tpu.ops.hamming import INVALID_DIST, unpack_bits

_TM = 256   # query rows per grid step
_TN = 2048  # train columns per inner tile
# Tile sizing (v5e): the (TM, 256)x(256, TN) bf16 dot is the whole cost —
# at 128x128 tiles the kernel issued 1024 4-MFLOP dots and ran issue-bound
# (0.36 ms, 12% MXU); at 256x2048 it issues 32 268-MFLOP dots.  VMEM at
# N2=4096: b2t 2 MB + D tile 2 MB + carries, well under the ~16 MB budget.


def _knn2_kernel(b1_ref, b2t_ref, pop1_ref, pop2_ref, valid2_ref,
                 best_ref, idx_ref, second_ref):
    n2 = b2t_ref.shape[1]
    num_tiles = n2 // _TN

    b1 = b1_ref[:]                      # (TM, 256) bf16
    pop1 = pop1_ref[:]                  # (TM, 1) f32

    def body(t, carry):
        best, idx, second = carry
        col0 = t * _TN
        b2t = b2t_ref[:, pl.ds(col0, _TN)]              # (256, TN) bf16
        inner = jnp.dot(b1, b2t, preferred_element_type=jnp.float32)
        pop2 = pop2_ref[0, pl.ds(col0, _TN)]            # (TN,)
        penalty = valid2_ref[0, pl.ds(col0, _TN)]       # 0 valid / INVALID_DIST masked
        D = pop1 + pop2[None, :] - 2.0 * inner + penalty[None, :]  # (TM, TN)

        tmin_i = jnp.argmin(D, axis=1)                  # (TM,)
        tmin = jnp.min(D, axis=1, keepdims=True)        # (TM, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (_TM, _TN), 1)
        D2 = jnp.where(cols == tmin_i[:, None], jnp.inf, D)
        tsecond = jnp.min(D2, axis=1, keepdims=True)    # (TM, 1)
        tidx = (col0 + tmin_i)[:, None].astype(jnp.int32)

        # merge sorted pairs (best<=second), (tmin<=tsecond)
        take_tile = tmin < best
        new_best = jnp.where(take_tile, tmin, best)
        new_idx = jnp.where(take_tile, tidx, idx)
        new_second = jnp.where(
            take_tile, jnp.minimum(best, tsecond), jnp.minimum(second, tmin)
        )
        return new_best, new_idx, new_second

    init = (
        jnp.full((_TM, 1), jnp.inf, jnp.float32),
        jnp.zeros((_TM, 1), jnp.int32),
        jnp.full((_TM, 1), jnp.inf, jnp.float32),
    )
    best, idx, second = jax.lax.fori_loop(0, num_tiles, body, init)
    best_ref[:] = best
    idx_ref[:] = idx
    second_ref[:] = second


def _pad_rows(x: jnp.ndarray, multiple: int, fill=0):
    pad = (-x.shape[0]) % multiple
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=fill)


@functools.partial(jax.jit, static_argnames=("interpret",))
def knn2_pallas(d1_u32, d2_u32, valid2=None, *, interpret: bool = False):
    """2-NN Hamming match, fused.  d*_u32: (N, 8) uint32 packed descriptors.

    Returns (best_dist, best_idx, second_dist) of shape (N1,).  N1/N2 are
    padded to 128 internally; pass `valid2` to mask train padding/empty slots.
    """
    n1 = d1_u32.shape[0]
    n2 = d2_u32.shape[0]
    if valid2 is None:
        valid2 = jnp.ones((n2,), bool)

    b1 = _pad_rows(unpack_bits(d1_u32), _TM)                    # (N1p, 256)
    b2 = _pad_rows(unpack_bits(d2_u32), _TN)                    # (N2p, 256)
    v2 = _pad_rows(valid2, _TN, fill=False)
    pop1 = jnp.sum(b1.astype(jnp.float32), axis=-1, keepdims=True)   # (N1p, 1)
    pop2 = jnp.sum(b2.astype(jnp.float32), axis=-1)[None, :]         # (1, N2p)
    penalty = jnp.where(v2, 0.0, INVALID_DIST)[None, :]              # (1, N2p)
    b2t = b2.T                                                        # (256, N2p)
    n1p = b1.shape[0]

    grid = (n1p // _TM,)
    best, idx, second = pl.pallas_call(
        _knn2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TM, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, b2t.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b2t.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b2t.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n1p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n1p, 1), jnp.int32),
            jax.ShapeDtypeStruct((n1p, 1), jnp.float32),
        ],
        interpret=interpret,
    )(b1, b2t, pop1, pop2, penalty)
    return best[:n1, 0], idx[:n1, 0], second[:n1, 0]
