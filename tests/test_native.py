"""Native host-runtime tests: C++ obs table / voxel downsample vs the numpy
reference paths (skipped when the library is unbuilt)."""

import numpy as np
import pytest

from bundle_adjustment_tpu.native import HAVE_NATIVE

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native library not built")


def test_obs_table_matches_numpy_map(rng):
    from bundle_adjustment_tpu.models.map_store import Map

    m_native = Map(use_native=True)
    m_numpy = Map(use_native=False)
    assert m_native._native is not None

    from bundle_adjustment_tpu.models.map_store import Keyframe
    import jax.numpy as jnp

    pts = rng.normal(size=(40, 3)) + [0, 0, 8]
    sels = [rng.permutation(40)[:20] for _ in range(5)]
    uvs = [rng.uniform(0, 640, size=(20, 2)) for _ in range(5)]
    for maps in (m_native, m_numpy):
        for k in range(5):
            maps.add_keyframe(Keyframe(
                kf_id=k, R=np.eye(3), t=np.zeros(3),
                xy=np.zeros((64, 2)), desc=jnp.zeros((64, 8), jnp.uint32),
                kp_valid=np.ones(64, bool), frame_idx=k))
        ids = maps.add_map_points(pts)
        for k in range(5):
            maps.add_observations(k, ids[sels[k]], np.arange(20), uvs[k])

    K = np.array([[450.0, 0, 320], [0, 450.0, 240], [0, 0, 1.0]])
    for window in ([0, 1], [1, 2, 3], [4]):
        a = m_native.gather_window(window, K, 256, 1024)
        b = m_numpy.gather_window(window, K, 256, 1024)
        assert (a is None) == (b is None)
        if a is None:
            continue
        np.testing.assert_array_equal(a[2], b[2])  # same obs rows
        np.testing.assert_array_equal(a[1], b[1])  # same mp ids
        np.testing.assert_array_equal(np.asarray(a[0].uv), np.asarray(b[0].uv))

    # cull + kill paths stay in sync
    m_native.cull_points(ids[:5])
    m_numpy.cull_points(ids[:5])
    assert m_native.num_observations == m_numpy.num_observations
    a = m_native.gather_window([0, 1, 2], K, 256, 1024)
    b = m_numpy.gather_window([0, 1, 2], K, 256, 1024)
    np.testing.assert_array_equal(a[2], b[2])

    rows = a[2][:3]
    m_native.kill_observations(rows)
    m_numpy.kill_observations(rows)
    a = m_native.gather_window([0, 1, 2], K, 256, 1024)
    b = m_numpy.gather_window([0, 1, 2], K, 256, 1024)
    np.testing.assert_array_equal(a[2], b[2])


def test_voxel_downsample_matches_numpy(rng):
    from bundle_adjustment_tpu.native import voxel_downsample_native
    from bundle_adjustment_tpu.utils.io import voxel_downsample

    pts = rng.normal(size=(2000, 3)) * 3
    cols = rng.uniform(size=(2000, 3))
    p_n, c_n = voxel_downsample_native(pts, cols, 0.7)
    p_np, c_np = voxel_downsample(pts, cols, 0.7)
    assert len(p_n) == len(p_np)
    # same voxel set (order-independent): sort both by coordinates
    o1 = np.lexsort(p_n.T)
    o2 = np.lexsort(p_np.T)
    np.testing.assert_allclose(p_n[o1], p_np[o2], atol=1e-9)
    np.testing.assert_allclose(c_n[o1], c_np[o2], atol=1e-9)
