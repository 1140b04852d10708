"""Data-parallel feature matching over the device mesh.

The matcher is embarrassingly parallel along the query axis: shard query
descriptors over the mesh, replicate the train bank, run the MXU Hamming
2-NN per shard, no collectives (SURVEY §2.5 DP row).  The descriptor-block
*ring* variant (for exhaustive/relocalization matching against a bank larger
than one device's HBM) shards the train side instead and rotates blocks with
ppermute, keeping a running top-2 — the ring-attention analog.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from bundle_adjustment_tpu.ops import hamming


def match_sharded(d1, d2, valid1, valid2, mesh: Mesh, axis: str = "win",
                  ratio: float = 0.75):
    """2-NN + ratio match with queries sharded over ``axis``.  Query count
    must divide by the axis size.  Returns (idx, mask, best) like
    hamming.match."""

    def local(d1s, v1s, d2r, v2r):
        best, idx, second = hamming.knn2(d1s, d2r, v1s, v2r)
        return idx, hamming.ratio_test_mask(best, second, ratio), best

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    return jax.jit(fn)(d1, valid1, d2, valid2)


def match_ring(d1, d2, valid2, mesh: Mesh, axis: str = "pt",
               ratio: float = 0.75):
    """Train-side ring: the train bank is sharded over ``axis``; each step
    every device matches its full query set against the resident train block,
    folds the running top-2, and rotates the block to its neighbor with
    ppermute.  HBM never holds more than one block per device and the O(N^2)
    distance matrix is never materialized anywhere.

    Queries are replicated; returns (idx, mask, best) with global train
    indices."""
    n = mesh.shape[axis]

    def local(d1r, d2s, v2s):
        my = jax.lax.axis_index(axis)
        block = d2s.shape[0]

        def step(i, carry):
            best, bidx, second, blk_desc, blk_valid = carry
            src = (my + i) % n  # which shard's block we currently hold
            b, bi, s = hamming.knn2(d1r, blk_desc, None, blk_valid)
            bi_global = bi + src * block
            # fold (b, s) into the running (best, second)
            take = b < best
            new_best = jnp.where(take, b, best)
            new_bidx = jnp.where(take, bi_global, bidx)
            new_second = jnp.where(take, jnp.minimum(best, s),
                                   jnp.minimum(second, b))
            # rotate the block backwards around the ring
            perm = [(j, (j - 1) % n) for j in range(n)]
            blk_desc = jax.lax.ppermute(blk_desc, axis, perm)
            blk_valid = jax.lax.ppermute(blk_valid, axis, perm)
            return new_best, new_bidx, new_second, blk_desc, blk_valid

        init = (
            jnp.full(d1r.shape[:1], jnp.inf, jnp.float32),
            jnp.zeros(d1r.shape[:1], jnp.int32),
            jnp.full(d1r.shape[:1], jnp.inf, jnp.float32),
            d2s,
            v2s,
        )
        best, bidx, second, _, _ = jax.lax.fori_loop(0, n, step, init)
        return bidx, hamming.ratio_test_mask(best, second, ratio), best

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(d1, d2, valid2)
