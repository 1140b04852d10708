"""ORB extractor tests: repeatability/coverage vs the cv2.ORB oracle and
self-consistency of descriptors under matching (SURVEY §4 plan a: match-rate
metric, not bit-exactness)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from bundle_adjustment_tpu.ops import hamming, orb

IMG1 = "/root/reference/desk_images/image11.png"
IMG2 = "/root/reference/desk_images/image22.png"


@pytest.fixture(scope="module")
def desk_pair():
    g1 = cv2.imread(IMG1, cv2.IMREAD_GRAYSCALE)
    g2 = cv2.imread(IMG2, cv2.IMREAD_GRAYSCALE)
    return g1, g2


def run_extract(img, n=1000):
    return orb.extract(
        jnp.asarray(img),
        num_features=n,
        levels=4,
        height=img.shape[0],
        width=img.shape[1],
    )


def test_extract_shapes_and_masks(desk_pair):
    g1, _ = desk_pair
    kp = run_extract(g1)
    assert kp.xy.shape == (1000, 2)
    assert kp.desc.shape == (1000, 8)
    assert kp.desc.dtype == jnp.uint32
    n_valid = int(kp.valid.sum())
    assert n_valid > 300, f"too few keypoints: {n_valid}"
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < g1.shape[1]).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < g1.shape[0]).all()


def test_corners_near_cv2_corners(desk_pair):
    """Most of our detections should lie near some cv2 ORB detection (the
    detectors agree on what is corner-like), checked via nearest-neighbor
    distance in pixel space at level 0."""
    g1, _ = desk_pair
    kp = run_extract(g1)
    ours = np.asarray(kp.xy)[np.asarray(kp.valid)]
    lv = np.asarray(kp.level)[np.asarray(kp.valid)]
    ours0 = ours[lv == 0]

    cv_orb = cv2.ORB_create(nfeatures=2000)
    cv_kps = cv_orb.detect(g1, None)
    cv_xy = np.array([k.pt for k in cv_kps])
    d = np.linalg.norm(ours0[:, None, :] - cv_xy[None, :, :], axis=-1).min(axis=1)
    frac_near = float((d <= 4.0).mean())
    assert frac_near > 0.5, f"only {frac_near:.2f} of our corners near cv2 corners"


def test_descriptor_matching_across_views(desk_pair):
    """End-to-end quality gate: our keypoints+descriptors on two real views
    must produce a healthy set of ratio-test matches that are geometrically
    consistent (essential-matrix inlier ratio comparable to the cv2 chain)."""
    g1, g2 = desk_pair
    kp1, kp2 = run_extract(g1, 1500), run_extract(g2, 1500)
    idx, mask, _ = hamming.match(kp1.desc, kp2.desc, kp1.valid, kp2.valid, ratio=0.75)
    idx, mask = np.asarray(idx), np.asarray(mask)
    n_matches = int(mask.sum())
    assert n_matches >= 50, f"too few ratio-test matches: {n_matches}"

    p1 = np.asarray(kp1.xy)[mask]
    p2 = np.asarray(kp2.xy)[idx[mask]]
    K = np.array([[431.4, 0, 640], [0, 431.4, 360], [0, 0, 1.0]])
    E, inl = cv2.findEssentialMat(p1, p2, K, method=cv2.RANSAC, prob=0.999, threshold=1.0)
    ratio = float(inl.mean())
    assert ratio > 0.4, f"inlier ratio too low: {ratio:.2f} over {n_matches} matches"


def test_descriptors_stable_under_identity():
    """Same image twice -> nearly all valid keypoints match themselves at
    distance 0."""
    g = cv2.imread(IMG1, cv2.IMREAD_GRAYSCALE)
    kp1 = run_extract(g, 800)
    kp2 = run_extract(g, 800)
    best, idx, _ = hamming.knn2(kp1.desc, kp2.desc, kp1.valid, kp2.valid)
    best, idx = np.asarray(best), np.asarray(idx)
    valid = np.asarray(kp1.valid)
    assert (best[valid] == 0).mean() > 0.99
    assert (idx[valid] == np.flatnonzero(np.ones_like(valid))[valid]).mean() > 0.99


def test_orientation_rotates_with_image():
    """Rotating the image by 90 deg shifts keypoint angles by ~90 deg."""
    g = cv2.imread(IMG1, cv2.IMREAD_GRAYSCALE)
    g = g[:704, :704]  # square so the rotation is exact
    kp = orb.extract(jnp.asarray(g), num_features=300, levels=1, height=704, width=704)
    gr = np.rot90(g, k=-1).copy()  # clockwise
    kpr = orb.extract(jnp.asarray(gr), num_features=300, levels=1, height=704, width=704)

    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    ang = np.asarray(kp.angle)[np.asarray(kp.valid)]
    xyr = np.asarray(kpr.xy)[np.asarray(kpr.valid)]
    angr = np.asarray(kpr.angle)[np.asarray(kpr.valid)]
    # map original coords into rotated frame: (x, y) -> (H-1-y, x)
    mapped = np.stack([703 - xy[:, 1], xy[:, 0]], axis=1)
    d = np.linalg.norm(mapped[:, None] - xyr[None], axis=-1)
    j = d.argmin(axis=1)
    near = d[np.arange(len(mapped)), j] < 2.0
    assert near.mean() > 0.5
    # under (x, y) -> (H-1-y, x), direction (dx, dy) -> (-dy, dx): angle +pi/2
    dang = (angr[j[near]] - ang[near] - np.pi / 2 + np.pi) % (2 * np.pi) - np.pi
    assert np.abs(np.median(dang)) < 0.1


def test_pallas_patch_gather_interpret():
    """The Pallas DMA patch-gather kernel (ops/orb_pallas.py) must agree with
    the XLA slice-gather path exactly (integer-valued pixels are exact in the
    kernel's bf16 selection passes).  Runs in Pallas interpret mode so it is
    exercised on the CPU test mesh; the real-TPU equality is asserted by the
    descriptor bit-parity check in bench/dev runs."""
    import jax
    import jax.lax

    from bundle_adjustment_tpu.ops import orb_pallas

    rng = np.random.default_rng(3)
    H, W, B = 240, 320, 200
    img = jnp.asarray(rng.integers(0, 256, size=(H, W)).astype(np.float32))
    sy = jnp.asarray(rng.integers(0, H - 37, B), jnp.int32)
    sx = jnp.asarray(rng.integers(0, W - 37, B), jnp.int32)

    out = orb_pallas.gather_patches40(img, sy, sx, interpret=True)
    padded = jnp.pad(img, ((0, 48), (0, 256)))
    ref = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(padded, (y, x), (40, 40))
    )(sy, sx) - 128.0
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
