"""ORB evidence vs the cv2 oracle (VERDICT r2 #7): wall-clock of
cv2.ORB_create on THIS host's CPU at the reference setting (4000 features,
8 levels, 1280x720 — /root/reference/src/main.py:60, src/features.py:13-16)
next to our extractor, plus a match-quality scorecard on the in-tree
desk/scout image pairs: ratio-test survivor counts (Lowe 0.75, the
reference's matcher contract at src/features.py:31-37), epipolar-RANSAC
inlier counts of those survivors, and mutual detection repeatability.

    python tools/orb_quality.py                 # quality on CPU backend
    python tools/orb_quality.py --platform tpu  # + our TPU timing

Prints one JSON object; BASELINE.md quotes it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DESK = "/root/reference/desk_images"
SCOUT = "/root/reference/scout_images"
PAIRS = [
    (f"{DESK}/image11.png", f"{DESK}/image22.png", "desk 11-22"),
    (f"{DESK}/image22.png", f"{DESK}/image33.png", "desk 22-33"),
    (f"{SCOUT}/image.png", f"{SCOUT}/image2.png", "scout 1-2"),
    (f"{SCOUT}/image3.png", f"{SCOUT}/image4.png", "scout 3-4"),
    (f"{SCOUT}/image6.png", f"{SCOUT}/image7.png", "scout 6-7"),
]
N_FEATURES = 4000
LEVELS = 8
RATIO = 0.75


def cv2_extract(cv2, img):
    orb = cv2.ORB_create(nfeatures=N_FEATURES, nlevels=LEVELS)
    kps, des = orb.detectAndCompute(img, None)
    xy = np.array([k.pt for k in kps], np.float32).reshape(-1, 2)
    return xy, des


def cv2_ratio_matches(cv2, d1, d2):
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    good = []
    for pair in bf.knnMatch(d1, d2, k=2):
        if len(pair) == 2 and pair[0].distance < RATIO * pair[1].distance:
            good.append((pair[0].queryIdx, pair[0].trainIdx))
    return good


def ransac_inliers(cv2, xy1, xy2, matches):
    """Epipolar-consistency score of a match set: essential RANSAC inliers
    under a nominal K (same K both pipelines -> fair relative metric)."""
    if len(matches) < 8:
        return 0
    h = 720.0
    K = np.array([[900.0, 0, 640.0], [0, 900.0, h / 2], [0, 0, 1]])
    p1 = np.float32([xy1[i] for i, _ in matches])
    p2 = np.float32([xy2[j] for _, j in matches])
    _, mask = cv2.findEssentialMat(p1, p2, K, method=cv2.RANSAC,
                                   prob=0.999, threshold=3.0)
    return 0 if mask is None else int(mask.sum())


def repeatability(xy_a, xy_b, tol=3.0):
    """Fraction of detections in a within tol px of some detection in b."""
    if len(xy_a) == 0 or len(xy_b) == 0:
        return 0.0
    d2 = ((xy_a[:, None, :] - xy_b[None, :, :]) ** 2).sum(-1)
    return float((d2.min(axis=1) <= tol * tol).mean())


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--repeats", type=int, default=10)
    args = ap.parse_args(argv)

    import cv2
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    import jax.numpy as jnp

    from bundle_adjustment_tpu.ops import hamming, orb

    out = {"metric": "orb_quality", "features": N_FEATURES, "levels": LEVELS,
           "ratio": RATIO, "backend": jax.default_backend()}

    # --- cv2 CPU wall-clock at the reference setting (720p) ---
    g0 = cv2.imread(f"{DESK}/image11.png", cv2.IMREAD_GRAYSCALE)
    assert g0.shape == (720, 1280), g0.shape
    cv2_extract(cv2, g0)  # warm
    best = min(_timed(cv2_extract, cv2, g0) for _ in range(args.repeats))
    out["cv2_orb_ms_720p_cpu"] = round(best * 1e3, 2)

    # --- ours on the selected backend, same image (chained marginal on
    # tpu is bench.py's job; here a simple blocked best-of timing) ---
    def ours_extract(img):
        kp = orb.extract(jnp.asarray(img), num_features=N_FEATURES,
                         levels=LEVELS, height=img.shape[0],
                         width=img.shape[1])
        kp = jax.tree.map(jax.device_get, kp)
        v = kp.valid.astype(bool)
        return kp.xy[v], kp.desc[v]

    ours_extract(g0)  # compile
    best = min(_timed(lambda c, i: ours_extract(i), None, g0)
               for _ in range(args.repeats))
    out["ours_orb_ms_720p"] = round(best * 1e3, 2)

    # --- per-pair scorecard ---
    def ours_ratio_matches(d1, d2):
        q = jnp.asarray(d1)
        t = jnp.asarray(d2)
        idx, m, _ = hamming.match(q, t, jnp.ones(len(d1), bool),
                                  jnp.ones(len(d2), bool), ratio=RATIO)
        idx, m = np.asarray(idx), np.asarray(m).astype(bool)
        return [(i, int(idx[i])) for i in np.nonzero(m)[0]]

    rows = []
    for f1, f2, name in PAIRS:
        g1 = cv2.imread(f1, cv2.IMREAD_GRAYSCALE)
        g2 = cv2.imread(f2, cv2.IMREAD_GRAYSCALE)
        c_xy1, c_d1 = cv2_extract(cv2, g1)
        c_xy2, c_d2 = cv2_extract(cv2, g2)
        o_xy1, o_d1 = ours_extract(g1)
        o_xy2, o_d2 = ours_extract(g2)

        cm = cv2_ratio_matches(cv2, c_d1, c_d2)
        om = ours_ratio_matches(o_d1, o_d2)
        rows.append({
            "pair": name,
            "cv2_kps": int(len(c_xy1)),
            "ours_kps": int(len(o_xy1)),
            "repeat_ours_vs_cv2": round(repeatability(o_xy1, c_xy1), 3),
            "repeat_cv2_vs_ours": round(repeatability(c_xy1, o_xy1), 3),
            "cv2_ratio_survivors": len(cm),
            "ours_ratio_survivors": len(om),
            "cv2_ransac_inliers": ransac_inliers(cv2, c_xy1, c_xy2, cm),
            "ours_ransac_inliers": ransac_inliers(cv2, o_xy1, o_xy2, om),
        })
    out["pairs"] = rows
    out["survivor_ratio_ours_over_cv2"] = round(
        sum(r["ours_ratio_survivors"] for r in rows)
        / max(sum(r["cv2_ratio_survivors"] for r in rows), 1), 3)
    out["inlier_ratio_ours_over_cv2"] = round(
        sum(r["ours_ransac_inliers"] for r in rows)
        / max(sum(r["cv2_ransac_inliers"] for r in rows), 1), 3)
    print(json.dumps(out))
    return out


def _timed(fn, cv2mod, img):
    t0 = time.perf_counter()
    fn(cv2mod, img)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
