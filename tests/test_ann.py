"""Coarse-to-fine approximate descriptor search (ops/ann.py) — the TPU-native
successor of the reference's FLANN/LSH matcher option
(ref: legacy/local_BA_sparsity_images.py:346-375)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.ops import ann, hamming


def _structured_bank(rng, m=2048):
    """ORB-like descriptor statistics: matching pairs differ in a few dozen
    bits, non-matching pairs are near 128 (random)."""
    return rng.integers(0, 256, size=(m, 32), dtype=np.uint8)


def _corrupt(rng, d8, nbits):
    out = d8.copy()
    for i in range(len(out)):
        pos = rng.choice(256, size=nbits, replace=False)
        out[i, pos // 8] ^= (1 << (pos % 8)).astype(np.uint8)
    return out


def test_ann_recall_on_structured_queries(rng):
    bank8 = _structured_bank(rng, 2048)
    q_src = rng.choice(2048, size=256, replace=False)
    q8 = _corrupt(rng, bank8[q_src], nbits=30)   # true NN ~30 bits away

    bank = hamming.pack_u8_to_u32(jnp.asarray(bank8))
    q = hamming.pack_u8_to_u32(jnp.asarray(q8))

    bex, iex, sex = hamming.knn2(q, bank)
    ba_, ia_, sa_ = ann.knn2_coarse_fine(q, bank, k_candidates=32)

    recall = float(np.mean(np.asarray(ia_) == np.asarray(iex)))
    assert recall >= 0.97, recall
    # recovered distances are EXACT where the index agrees
    agree = np.asarray(ia_) == np.asarray(iex)
    np.testing.assert_array_equal(np.asarray(ba_)[agree],
                                  np.asarray(bex)[agree])
    # true match should be found for nearly all queries
    found = float(np.mean(np.asarray(ia_) == q_src))
    assert found >= 0.95, found


def test_ann_respects_bank_valid(rng):
    bank8 = _structured_bank(rng, 512)
    bank = hamming.pack_u8_to_u32(jnp.asarray(bank8))
    q = hamming.pack_u8_to_u32(jnp.asarray(_corrupt(rng, bank8[:64], 20)))
    valid = jnp.asarray(np.arange(512) < 256)
    _, idx, _ = ann.knn2_coarse_fine(q, bank, valid, k_candidates=16)
    # queries 0..63 correspond to valid bank rows; matches stay in-range
    assert (np.asarray(idx) < 256).all()


def test_reloc_uses_ann_on_large_bank(rng):
    """Relocalization with the ANN threshold forced to 0 must still recover
    tracking (exercises the stacked-bank ANN path end-to-end)."""
    from bundle_adjustment_tpu.config import (BAConfig, CameraModel,
                                              KeyframeCriteria, PipelineConfig)
    from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
    from bundle_adjustment_tpu.utils.event_log import EventLog
    from bundle_adjustment_tpu.utils.synthetic import synthetic_sequence

    frames, K, _, _ = synthetic_sequence(n_frames=14, seed=1)
    cfg = PipelineConfig(
        camera=CameraModel(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                           width=640, height=480),
        num_features=1000, pyramid_levels=3,
        min_tracked_features=15, pose_inlier_ratio=0.4, pose_inlier_numbers=15,
        consistent_convention=True,
        keyframe=KeyframeCriteria(min_median_displacement_px=12.0),
        ba=BAConfig(window_size=4, max_points=8192, max_obs=32768),
        reloc_enabled=True, reloc_ann_threshold=0,  # force the ANN path
    )
    pipe = VisualOdometryPipeline(cfg, log=EventLog(echo=False),
                                  use_pallas_matcher=False)
    for f in frames[:8]:
        pipe.process_frame(f)
    assert pipe.map.num_keyframes >= 3
    # inject tracking loss: two garbage frames, then a real one -> reloc
    noise = (np.random.default_rng(0)
             .integers(0, 255, size=frames[0].shape, dtype=np.uint8))
    pipe.process_frame(noise)
    pipe.process_frame(noise)
    out = pipe.process_frame(frames[8])
    assert out["status"] in ("relocalized", "keyframe", "tracked"), out
    reloc_events = [e for e in pipe.log.events
                    if e["event"] == "relocalization" and e.get("success")]
    if out["status"] == "relocalized":
        assert reloc_events
