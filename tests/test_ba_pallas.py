"""Fused Pallas LM kernel (ops/ba_pallas.py): numerical-twin equivalence.

The kernel body is a pure-jnp function; ``reference_lm`` runs it as plain
XLA (the CPU oracle) and ``ba_solve_grid_pallas(interpret=True)`` runs the
identical graph through the Pallas interpreter.  Both must match the XLA
grid solver (ops/ba_grid.py) — same LM semantics, same optimum.  The real
Mosaic-compiled kernel is asserted on TPU by bench/profile runs (it cannot
compile on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.ops import ba, ba_grid, ba_pallas

from test_ba import make_problem


def test_reference_lm_matches_grid(rng):
    prob, _ = make_problem(rng, n_cams=4, n_pts=60, noise=0.3, perturb=0.05)
    grid = ba_grid.from_flat(prob)
    rv1, tv1, pt1, s1 = ba_grid.ba_solve_grid(grid, n_fixed=1,
                                              max_iterations=40)
    rv2, tv2, pt2, s2 = ba_pallas.reference_lm(grid, n_fixed=1,
                                               max_iterations=40)
    np.testing.assert_allclose(float(s2.initial_sq), float(s1.initial_sq),
                               rtol=1e-5)
    assert abs(float(s2.final_cost) - float(s1.final_cost)) <= 1e-3 * max(
        float(s1.final_cost), 1.0)
    np.testing.assert_allclose(np.asarray(rv2), np.asarray(rv1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tv2), np.asarray(tv1), atol=1e-3)
    assert bool(s2.accepted)


def test_reference_lm_n_fixed2(rng):
    prob, _ = make_problem(rng, n_cams=5, n_pts=50, perturb=0.03)
    grid = ba_grid.from_flat(prob)
    rv2, tv2, pt2, s2 = ba_pallas.reference_lm(grid, n_fixed=2,
                                               max_iterations=40)
    rv1, tv1, pt1, s1 = ba_grid.ba_solve_grid(grid, n_fixed=2,
                                              max_iterations=40)
    # both gauge cameras untouched
    np.testing.assert_array_equal(np.asarray(rv2[:2]), np.asarray(prob.rvecs[:2]))
    np.testing.assert_array_equal(np.asarray(tv2[:2]), np.asarray(prob.tvecs[:2]))
    np.testing.assert_allclose(np.asarray(tv2), np.asarray(tv1), atol=2e-3)
    assert abs(float(s2.final_cost) - float(s1.final_cost)) <= 1e-3 * max(
        float(s1.final_cost), 1.0)


def test_reference_lm_padding_inert(rng):
    """Padding points/observations (and the internal pad of P to 128) must
    not change the solve."""
    prob0, _ = make_problem(rng, n_cams=3, n_pts=40)
    prob1, _ = make_problem(rng, n_cams=3, n_pts=40, pad_pts=24, pad_obs=60)
    g0 = ba_grid.from_flat(prob0)
    g1 = ba_grid.from_flat(prob1)
    r0 = ba_pallas.reference_lm(g0, max_iterations=25)
    r1 = ba_pallas.reference_lm(g1, max_iterations=25)
    # both solves reach the same optimum (atol: costs sit at the f32 noise
    # floor ~1e-8 where relative comparison is meaningless)
    np.testing.assert_allclose(float(r0[3].final_cost),
                               float(r1[3].final_cost), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(r0[0]), np.asarray(r1[0]), atol=1e-5)


def test_reference_lm_recovers_ground_truth(rng):
    """Noise-free observations + perturbed init -> the solve must return to
    the ground-truth geometry (gauge held by the fixed camera)."""
    prob, (rv_gt, tv_gt, X_gt) = make_problem(rng, n_cams=4, n_pts=80,
                                              noise=0.0, perturb=0.04)
    grid = ba_grid.from_flat(prob)
    rv, tv, pt, s = ba_pallas.reference_lm(grid, max_iterations=50)
    assert float(s.final_sq) < 1e-2
    np.testing.assert_allclose(np.asarray(rv), rv_gt, atol=5e-3)
    np.testing.assert_allclose(np.asarray(tv), tv_gt, atol=2e-2)


def test_pallas_interpret_matches_reference(rng):
    """The pallas_call graph (interpreter mode on CPU) is the same function
    as reference_lm — results must agree to float-accumulation tolerance."""
    prob, _ = make_problem(rng, n_cams=3, n_pts=30, perturb=0.03)
    grid = ba_grid.from_flat(prob)
    r_ref = ba_pallas.reference_lm(grid, max_iterations=10)
    r_pal = ba_pallas.ba_solve_grid_pallas(grid, max_iterations=10,
                                           interpret=True)
    np.testing.assert_allclose(float(r_pal[3].final_cost),
                               float(r_ref[3].final_cost), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r_pal[0]), np.asarray(r_ref[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_pal[2]), np.asarray(r_ref[2]),
                               atol=1e-4)


def test_pallas_kernel_on_tpu(rng):
    """Real Mosaic-compiled kernel vs the XLA grid solver (TPU only)."""
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU (Mosaic compile)")
    prob, _ = make_problem(rng, n_cams=4, n_pts=60, noise=0.3, perturb=0.05)
    grid = ba_grid.from_flat(prob)
    rv1, tv1, pt1, s1 = ba_grid.ba_solve_grid(grid, n_fixed=1,
                                              max_iterations=40)
    rv2, tv2, pt2, s2 = ba_pallas.ba_solve_grid_pallas(grid, n_fixed=1,
                                                       max_iterations=40)
    assert abs(float(s2.final_cost) - float(s1.final_cost)) <= 1e-3 * max(
        float(s1.final_cost), 1.0)
    np.testing.assert_allclose(np.asarray(rv2), np.asarray(rv1), atol=1e-3)
