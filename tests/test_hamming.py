"""Hamming matcher tests vs the cv2.BFMatcher oracle (SURVEY §4 plan a)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from bundle_adjustment_tpu.ops import hamming


def random_descriptors(rng, n):
    return rng.integers(0, 256, size=(n, 32), dtype=np.uint8)


def orb_descriptors(path="/root/reference/desk_images/image11.png", n=500):
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    orb = cv2.ORB_create(nfeatures=n)
    _, des = orb.detectAndCompute(img, None)
    return des


def test_pack_unpack_roundtrip(rng):
    d = random_descriptors(rng, 64)
    packed = hamming.pack_u8_to_u32(jnp.asarray(d))
    bits = np.asarray(hamming.unpack_bits(packed), dtype=np.float32)
    expected = np.unpackbits(d, axis=1, bitorder="little")
    np.testing.assert_array_equal(bits, expected)


def test_mxu_matrix_equals_popcount(rng):
    d1 = hamming.pack_u8_to_u32(jnp.asarray(random_descriptors(rng, 96)))
    d2 = hamming.pack_u8_to_u32(jnp.asarray(random_descriptors(rng, 80)))
    D_pop = np.asarray(hamming.hamming_matrix_popcount(d1, d2))
    D_mxu = np.asarray(hamming.hamming_matrix(d1, d2))
    np.testing.assert_array_equal(D_pop, D_mxu.astype(np.int32))


def test_matrix_matches_cv2_norms(rng):
    d1u8 = random_descriptors(rng, 40)
    d2u8 = random_descriptors(rng, 40)
    D = np.asarray(
        hamming.hamming_matrix(
            hamming.pack_u8_to_u32(jnp.asarray(d1u8)),
            hamming.pack_u8_to_u32(jnp.asarray(d2u8)),
        )
    )
    for i in range(0, 40, 7):
        for j in range(0, 40, 7):
            assert D[i, j] == cv2.norm(d1u8[i], d2u8[j], cv2.NORM_HAMMING)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_match_equals_bfmatcher(use_pallas):
    des = orb_descriptors()
    des1, des2 = des[: len(des) // 2], des[len(des) // 2 :]
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    good = {}
    for pair in bf.knnMatch(des1, des2, k=2):
        if len(pair) == 2 and pair[0].distance < 0.75 * pair[1].distance:
            good[pair[0].queryIdx] = (pair[0].trainIdx, pair[0].distance)

    d1 = hamming.pack_u8_to_u32(jnp.asarray(des1))
    d2 = hamming.pack_u8_to_u32(jnp.asarray(des2))
    if use_pallas:
        from bundle_adjustment_tpu.ops.hamming_pallas import knn2_pallas

        best, idx, second = knn2_pallas(d1, d2, interpret=True)
        mask = hamming.ratio_test_mask(best, second, 0.75)
    else:
        idx, mask, best = hamming.match(
            d1, d2, jnp.ones(len(des1), bool), jnp.ones(len(des2), bool), ratio=0.75
        )
    idx, mask, best = np.asarray(idx), np.asarray(mask), np.asarray(best)

    ours = {i: (int(idx[i]), float(best[i])) for i in range(len(des1)) if mask[i]}
    # distances must agree exactly on the intersection; the match sets may
    # differ only on argmin ties — require >= 98% agreement
    common = set(ours) & set(good)
    agree = sum(1 for i in common if ours[i][1] == good[i][1])
    assert len(common) >= 0.98 * max(len(good), 1)
    assert agree == len(common)


def test_match_masks(rng):
    d1u8 = random_descriptors(rng, 32)
    d2u8 = np.vstack([d1u8[:16], random_descriptors(rng, 16)])  # first 16 identical
    d1 = hamming.pack_u8_to_u32(jnp.asarray(d1u8))
    d2 = hamming.pack_u8_to_u32(jnp.asarray(d2u8))
    valid1 = jnp.arange(32) < 24
    valid2 = jnp.arange(32) < 8  # only 8 of the identical ones valid
    idx, mask, best = hamming.match(d1, d2, valid1, valid2, ratio=0.95)
    idx, mask, best = np.asarray(idx), np.asarray(mask), np.asarray(best)
    # queries 0..7 find their identical valid twins at distance 0
    assert mask[:8].all()
    np.testing.assert_array_equal(idx[:8], np.arange(8))
    np.testing.assert_array_equal(best[:8], 0)
    # invalid queries never match
    assert not mask[24:].any()
    # matches never point at invalid train slots
    assert (idx[mask] < 8).all()


def test_crosscheck(rng):
    d1u8 = random_descriptors(rng, 48)
    d2u8 = d1u8[::-1].copy()  # permutation -> crosscheck keeps bijection
    d1 = hamming.pack_u8_to_u32(jnp.asarray(d1u8))
    d2 = hamming.pack_u8_to_u32(jnp.asarray(d2u8))
    v = jnp.ones(48, bool)
    idx, mask, _ = hamming.match(d1, d2, v, v, ratio=1.0, cross_check=True)
    idx, mask = np.asarray(idx), np.asarray(mask)
    assert mask.sum() >= 40  # ties may drop a few
    np.testing.assert_array_equal(idx[mask], 47 - np.flatnonzero(mask))


def test_pallas_padding_boundaries():
    # non-multiple-of-128 sizes exercise the padding path
    from bundle_adjustment_tpu.ops.hamming_pallas import knn2_pallas

    rng = np.random.default_rng(3)
    d1u8 = rng.integers(0, 256, size=(130, 32), dtype=np.uint8)
    d2u8 = rng.integers(0, 256, size=(200, 32), dtype=np.uint8)
    d1 = hamming.pack_u8_to_u32(jnp.asarray(d1u8))
    d2 = hamming.pack_u8_to_u32(jnp.asarray(d2u8))
    best_p, idx_p, second_p = knn2_pallas(d1, d2, interpret=True)
    best_x, idx_x, second_x = hamming.knn2(d1, d2)
    np.testing.assert_array_equal(np.asarray(best_p), np.asarray(best_x))
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_array_equal(np.asarray(second_p), np.asarray(second_x))
