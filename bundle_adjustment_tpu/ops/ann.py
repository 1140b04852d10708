"""Approximate nearest-neighbor descriptor search: coarse-to-fine re-ranking.

The reference's ANN capability is FLANN with an LSH index
(ref: legacy/local_BA_sparsity_images.py:346-375).  Bucketed LSH is a poor
fit for TPU (data-dependent bucket sizes break static shapes, and gather-
scatter beats the MXU's strengths); the TPU-native equivalent of "don't pay
the full exact cost" is a **coarse-to-fine** scheme that keeps every stage a
dense matmul:

  stage 1 (coarse): Hamming distance on a SUBSAMPLE of descriptor lanes
    (default 2 of 8 uint32 words = 64 of 256 bits) against the whole bank —
    an MXU matmul at 1/4 the bits;
  stage 2 (fine):  exact 256-bit distance, but only on each query's top-K
    coarse candidates (gathered, K << M).

Cost: N·M·64 + N·K·256 bit-ops vs N·M·256 exact — ~3.5x fewer at K=32 and
M=64k, growing with bank size.  Like LSH, it is approximate: a true nearest
neighbor missed by the coarse stage is lost; unlike LSH the failure mode is
graceful (it is still the coarse-nearest candidate set, not an empty
bucket).  Recall on descriptor distributions with real structure (matching
features differ in a few dozen bits; non-matching are near 128) is ~99%
(tests/test_ann.py measures it).

Intended for large relocalization banks (models/relocalize.py stacks many
keyframes' descriptors and searches once); frame-to-frame matching stays
exact (a 4096^2 exact match is already ~30us on one chip — bench.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bundle_adjustment_tpu.ops import hamming


def _lane_bits(d_u32: jnp.ndarray, lanes) -> jnp.ndarray:
    """Unpack selected uint32 lanes to a bf16 bit matrix (N, 32*len(lanes))."""
    sel = d_u32[:, jnp.asarray(lanes)]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (sel[..., :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(sel.shape[0], -1).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("k_candidates", "coarse_lanes"))
def knn2_coarse_fine(
    query_u32: jnp.ndarray,
    bank_u32: jnp.ndarray,
    bank_valid: jnp.ndarray | None = None,
    k_candidates: int = 32,
    coarse_lanes: int = 2,
):
    """Approximate 2-NN of each query against the bank.

    Returns (best_dist, best_idx, second_dist) with the same contract as
    hamming.knn2 (invalid bank slots masked to INVALID_DIST).  ``best`` /
    ``second`` are exact 256-bit distances of the re-ranked candidates; the
    approximation is only in WHICH candidates reach the fine stage.
    """
    M = bank_u32.shape[0]
    lanes = tuple(range(coarse_lanes))

    # stage 1: coarse distances on a bit subsample (MXU matmul)
    qb = _lane_bits(query_u32, lanes)
    bb = _lane_bits(bank_u32, lanes)
    pop_q = jnp.sum(qb.astype(jnp.float32), axis=1)
    pop_b = jnp.sum(bb.astype(jnp.float32), axis=1)
    inner = jnp.dot(qb, bb.T, preferred_element_type=jnp.float32)
    D_coarse = pop_q[:, None] + pop_b[None, :] - 2.0 * inner
    if bank_valid is not None:
        D_coarse = jnp.where(bank_valid[None, :], D_coarse, hamming.INVALID_DIST)

    k = min(k_candidates, M)
    _, cand = jax.lax.top_k(-D_coarse, k)                 # (N, k) bank indices

    # stage 2: exact 256-bit popcount(XOR) on the gathered candidates only
    cand_desc = bank_u32[cand]                            # (N, k, 8)
    x = query_u32[:, None, :] ^ cand_desc
    D_fine = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)
    if bank_valid is not None:
        D_fine = jnp.where(bank_valid[cand], D_fine, hamming.INVALID_DIST)

    best_pos = jnp.argmin(D_fine, axis=1)
    best = jnp.take_along_axis(D_fine, best_pos[:, None], axis=1)[:, 0]
    best_idx = jnp.take_along_axis(cand, best_pos[:, None], axis=1)[:, 0]
    cols = jnp.arange(k)[None, :]
    D2 = jnp.where(cols == best_pos[:, None], jnp.inf, D_fine)
    second = jnp.min(D2, axis=1)
    return best, best_idx.astype(jnp.int32), second


def match_bank(query_u32, bank_u32, bank_valid=None, ratio: float = 0.75,
               k_candidates: int = 32):
    """Ratio-tested approximate match against a large bank: returns
    (match_idx, match_mask, best_dist) like hamming.match."""
    best, idx, second = knn2_coarse_fine(
        query_u32, bank_u32, bank_valid, k_candidates=k_candidates)
    mask = hamming.ratio_test_mask(best, second, ratio)
    return idx, mask, best
