"""Grid-layout BA solver: equivalence with the flat-table solver."""

import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.ops import ba, ba_grid

from test_ba import make_problem


def test_grid_conversion_preserves_observations(rng):
    prob, _ = make_problem(rng, n_cams=4, n_pts=30, pad_pts=10, pad_obs=20)
    grid = ba_grid.from_flat(prob)
    assert float(grid.mask.sum()) == float(prob.obs_mask.sum())
    # every (point, cam, uv) triplet survives
    flat = set()
    m = np.asarray(prob.obs_mask) > 0
    for o in np.flatnonzero(m):
        flat.add((int(prob.pnt_idx[o]), int(prob.cam_idx[o]),
                  round(float(prob.uv[o, 0]), 3)))
    gm = np.asarray(grid.mask) > 0
    got = set()
    for p, d in zip(*np.nonzero(gm)):
        got.add((int(p), int(grid.cam_slot[p, d]),
                 round(float(grid.uv[p, d, 0]), 3)))
    assert flat == got


def test_grid_solver_matches_flat(rng):
    prob, (rv, tv, X) = make_problem(rng, n_cams=4, n_pts=60, noise=0.3,
                                     perturb=0.05)
    rv1, tv1, pt1, s1 = ba.ba_solve(prob, n_fixed=1, max_iterations=40)
    grid = ba_grid.from_flat(prob)
    rv2, tv2, pt2, s2 = ba_grid.ba_solve_grid(grid, n_fixed=1, max_iterations=40)
    np.testing.assert_allclose(float(s2.initial_sq), float(s1.initial_sq),
                               rtol=1e-5)
    # identical semantics => same optimum to float tolerance
    assert abs(float(s2.final_cost) - float(s1.final_cost)) <= 1e-3 * max(
        float(s1.final_cost), 1.0)
    np.testing.assert_allclose(np.asarray(rv2), np.asarray(rv1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tv2), np.asarray(tv1), atol=1e-3)


def test_grid_solver_n_fixed2(rng):
    prob, (rv, tv, X) = make_problem(rng, n_cams=5, n_pts=50, perturb=0.03)
    grid = ba_grid.from_flat(prob)
    rv2, tv2, pt2, s2 = ba_grid.ba_solve_grid(grid, n_fixed=2, max_iterations=40)
    rv1, tv1, pt1, s1 = ba.ba_solve(prob, n_fixed=2, max_iterations=40)
    assert bool(s2.accepted)
    # both fixed cameras untouched
    np.testing.assert_array_equal(np.asarray(rv2[:2]), np.asarray(prob.rvecs[:2]))
    # same gauge, same semantics -> same optimum as the flat solver
    np.testing.assert_allclose(np.asarray(tv2), np.asarray(tv1), atol=2e-3)
    assert abs(float(s2.final_cost) - float(s1.final_cost)) <= 1e-3 * max(
        float(s1.final_cost), 1.0)


def test_grid_padding_inert(rng):
    prob0, _ = make_problem(rng, n_cams=3, n_pts=40)
    prob1, _ = make_problem(rng, n_cams=3, n_pts=40, pad_pts=24, pad_obs=60)
    g0 = ba_grid.from_flat(prob0)
    g1 = ba_grid.from_flat(prob1)
    r0 = ba_grid.ba_solve_grid(g0, n_fixed=1, max_iterations=30)
    r1 = ba_grid.ba_solve_grid(g1, n_fixed=1, max_iterations=30)
    assert abs(float(r0[3].final_sq) - float(r1[3].final_sq)) < 1e-3 * max(
        float(r0[3].initial_sq), 1.0)
