"""Cold-start mitigation (utils/prewarm.py; VERDICT r04 #7).

The reference pays zero compile cost (cv2/scipy ship compiled); our answer
is a persistent on-disk compile cache + an explicit shape-bucket prewarm
(``run.py --prewarm``).  These tests cover the cache plumbing and that the
prewarm drive actually walks both the keyframe and tracked paths.
"""

import os

import jax

from bundle_adjustment_tpu.config import BAConfig, CameraModel, PipelineConfig
from bundle_adjustment_tpu.utils.prewarm import (enable_persistent_cache,
                                                 prewarm)


def test_enable_persistent_cache_sets_config(tmp_path):
    d = str(tmp_path / "cache")
    got = enable_persistent_cache(d)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.1
    # restore the suite's shared cache (conftest set it before us)
    enable_persistent_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))


def test_enable_persistent_cache_env_default(tmp_path, monkeypatch):
    d = str(tmp_path / "envcache")
    monkeypatch.setenv("BA_TPU_JAX_CACHE", d)
    assert enable_persistent_cache() == d
    enable_persistent_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))


def test_prewarm_walks_both_paths():
    """Tiny-geometry prewarm: forced-keyframe segment builds >=3 keyframes
    (bootstrap + insertion + window-BA buckets), tracked segment runs the
    fused dispatch without growing the map."""
    cfg = PipelineConfig(
        camera=CameraModel(fx=300.0, fy=300.0, cx=160, cy=120,
                           width=320, height=240),
        num_features=512, pyramid_levels=3,
        ba=BAConfig(window_size=2, max_points=1024, max_obs=4096),
    )
    info = prewarm(cfg, use_pallas=False)
    assert info["frames"] == cfg.ba.window_size + 8
    # every forced frame that passes the gates becomes a keyframe; the
    # never-keyframe tail must add none beyond the forced segment
    assert 3 <= info["keyframes"] <= cfg.ba.window_size + 4
    assert info["prewarm_s"] > 0
