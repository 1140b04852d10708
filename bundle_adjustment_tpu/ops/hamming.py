"""Binary-descriptor k-NN matching: Hamming distances on the MXU.

TPU-native replacement for cv2.BFMatcher(NORM_HAMMING).knnMatch(k=2) + Lowe's
ratio test (ref: src/features.py:23-41) and the FLANN/LSH variant
(ref: legacy/local_BA_sparsity_images.py:346-375 — subsumed: exact k-NN at
MXU speed needs no approximate index).

Design: a 256-bit descriptor pair's Hamming distance is
    popcount(a XOR b) = |a| + |b| - 2 * <bits(a), bits(b)>
so the full N1 x N2 distance matrix is a rank-256 matmul — exactly what the
MXU does at speed-of-light.  Bit values are 0/1 and row sums are <= 256, so
bf16 products are exact with f32 accumulation.

Two implementations:
- ``hamming_matrix`` / ``knn2``: pure-XLA (unpack -> matmul -> two-pass top-2)
  used as the oracle and the CPU fallback.
- ``knn2_pallas`` (ops/hamming_pallas.py): fused Pallas kernel that streams
  column tiles through VMEM and keeps the running top-2, never materializing
  the O(N^2) matrix in HBM — the "don't materialize the big matrix" analog of
  ring attention called for in SURVEY §2.5.

All shapes are static; invalid slots are masked with +inf-like sentinel
distances rather than filtered.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: sentinel distance for masked-out descriptor slots (max real distance is 256)
INVALID_DIST = 1e9


def pack_u8_to_u32(descriptors_u8: jnp.ndarray) -> jnp.ndarray:
    """(N, 32) uint8 ORB descriptors -> (N, 8) uint32 lanes (little-endian)."""
    d = descriptors_u8.astype(jnp.uint32).reshape(*descriptors_u8.shape[:-1], 8, 4)
    return d[..., 0] | (d[..., 1] << 8) | (d[..., 2] << 16) | (d[..., 3] << 24)


def unpack_bits(descriptors_u32: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) bf16 bit matrix (values 0.0 / 1.0)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (descriptors_u32[..., :, None] >> shifts) & jnp.uint32(1)  # (N, 8, 32)
    return bits.reshape(*descriptors_u32.shape[:-1], 256).astype(jnp.bfloat16)


def hamming_matrix_popcount(d1_u32: jnp.ndarray, d2_u32: jnp.ndarray) -> jnp.ndarray:
    """Direct popcount(XOR) distance matrix — O(N^2) memory; test oracle only."""
    x = d1_u32[:, None, :] ^ d2_u32[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_matrix(d1_u32: jnp.ndarray, d2_u32: jnp.ndarray) -> jnp.ndarray:
    """MXU path: distance = |a| + |b| - 2 a.b over unpacked bits.  f32 (N1, N2)."""
    b1 = unpack_bits(d1_u32)
    b2 = unpack_bits(d2_u32)
    pop1 = jnp.sum(b1.astype(jnp.float32), axis=-1)
    pop2 = jnp.sum(b2.astype(jnp.float32), axis=-1)
    inner = jnp.dot(b1, b2.T, preferred_element_type=jnp.float32)
    return pop1[:, None] + pop2[None, :] - 2.0 * inner


def _top2_rows(D: jnp.ndarray):
    """Per-row (best_dist, best_idx, second_dist) of a distance matrix."""
    best_idx = jnp.argmin(D, axis=1)
    best = jnp.take_along_axis(D, best_idx[:, None], axis=1)[:, 0]
    cols = jnp.arange(D.shape[1])[None, :]
    D2 = jnp.where(cols == best_idx[:, None], jnp.inf, D)
    second = jnp.min(D2, axis=1)
    return best, best_idx.astype(jnp.int32), second


def knn2(
    d1_u32: jnp.ndarray,
    d2_u32: jnp.ndarray,
    valid1: jnp.ndarray | None = None,
    valid2: jnp.ndarray | None = None,
):
    """2-NN match of every query descriptor against the train set (XLA path).

    Returns (best_dist, best_idx, second_dist), each (N1,).  Invalid train
    slots score INVALID_DIST; invalid query slots get INVALID_DIST results.
    """
    D = hamming_matrix(d1_u32, d2_u32)
    if valid2 is not None:
        D = jnp.where(valid2[None, :], D, INVALID_DIST)
    best, best_idx, second = _top2_rows(D)
    if valid1 is not None:
        best = jnp.where(valid1, best, INVALID_DIST)
        second = jnp.where(valid1, second, INVALID_DIST)
    return best, best_idx, second


def ratio_test_mask(best: jnp.ndarray, second: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """Lowe's ratio gate: keep where best < ratio * second (ref semantics:
    src/features.py:37 — strict inequality)."""
    return (best < ratio * second) & (best < INVALID_DIST)


def crosscheck_mask(best_idx_12: jnp.ndarray, best_idx_21: jnp.ndarray) -> jnp.ndarray:
    """Mutual-best-match gate: i -> j is kept iff argmin_j(D[i,:]) = j and
    argmin_i(D[:,j]) = i (cv2 crossCheck=True semantics; optional in the
    reference, ref: src/features.py:26)."""
    n1 = best_idx_12.shape[0]
    back = best_idx_21[best_idx_12]
    return back == jnp.arange(n1, dtype=best_idx_12.dtype)


def match(
    d1_u32: jnp.ndarray,
    d2_u32: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    ratio: float = 0.75,
    cross_check: bool = False,
    use_pallas: bool = False,
):
    """Full matcher: 2-NN + ratio test (+ optional crosscheck).

    Returns (match_idx, match_mask, best_dist): for each query i,
    match_idx[i] is the matched train index and match_mask[i] whether the
    match survived the gates.  Static shapes; no compaction here (the host
    pipeline compacts when it needs dense lists).
    """
    if use_pallas:
        from bundle_adjustment_tpu.ops.hamming_pallas import knn2_pallas

        best, best_idx, second = knn2_pallas(d1_u32, d2_u32, valid2)
        best = jnp.where(valid1, best, INVALID_DIST)
        second = jnp.where(valid1, second, INVALID_DIST)
    else:
        best, best_idx, second = knn2(d1_u32, d2_u32, valid1, valid2)
    mask = ratio_test_mask(best, second, ratio)
    if cross_check:
        if use_pallas:
            from bundle_adjustment_tpu.ops.hamming_pallas import knn2_pallas

            _, best_idx_21, _ = knn2_pallas(d2_u32, d1_u32, valid1)
        else:
            _, best_idx_21, _ = knn2(d2_u32, d1_u32, valid2, valid1)
        mask = mask & crosscheck_mask(best_idx, best_idx_21)
    return best_idx, mask, best
