"""Minimal 5-point essential-matrix solver (Stewenius' Groebner-basis /
action-matrix formulation), batched and TPU-compatible.

Why this exists: the 8-point minimal solver least-squares-fits 8 noisy
correspondences, so even all-inlier samples yield models whose inlier sets
run ~25% short of cv2's 5-point chain (measured on the scout pairs; no
8-point hypothesis in 8192 reached cv2's count).  The 5-point solver fits
the minimal set exactly — hypothesis precision is bounded by 5 points'
noise, matching cv2.findEssentialMat's internals
(ref call site: src/pose_estimator.py:27).

Method (per minimal sample):
1. 4-dim nullspace of the 5x9 epipolar constraint matrix (eigh of AtA)
   -> E(x,y,z) = x E1 + y E2 + z E3 + E4.
2. The 10 cubic constraints (det E = 0 and 2 E EtE - tr(E Et) E = 0)
   expanded over the 20-monomial basis via precomputed multiplication
   tables -> M (10x20).
3. Eliminate the 10 degree-3 monomials: B = M1^-1 M2 (10x10).
4. Action matrix A_x for multiplication by x on the quotient-ring basis
   [x2, xy, xz, y2, yz, z2, x, y, z, 1]; its right eigenvectors encode the
   up-to-10 solutions.
5. TPU twist: jnp.linalg.eig (nonsymmetric) is CPU-only, so real
   eigenvalues are isolated by sign changes of slogdet(A - t I) on a grid
   followed by fixed-iteration bisection — branch-free, batched, and exactly
   the real roots (complex pairs produce no sign change and are skipped,
   which is fine: they are not physical solutions).
6. Eigenvector per root via SVD nullspace of (A - t I) -> (x, y, z)
   -> candidate E, projected to the essential manifold.

Everything is vmapped over hypotheses; each sample yields 10 masked
candidate slots.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST

# -- monomial bookkeeping (host-side constants) -----------------------------

_L1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]                # x, y, z, 1
_L2 = [
    (2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1), (0, 0, 2),
    (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0),
]                                                                  # quotient basis
_D3 = [
    (3, 0, 0), (2, 1, 0), (2, 0, 1), (1, 2, 0), (1, 1, 1), (1, 0, 2),
    (0, 3, 0), (0, 2, 1), (0, 1, 2), (0, 0, 3),
]
_L3 = _D3 + _L2                                                    # 20 columns


def _mul_table(a_basis, b_basis, out_basis):
    T = np.zeros((len(a_basis), len(b_basis), len(out_basis)), np.float32)
    index = {m: k for k, m in enumerate(out_basis)}
    for i, ma in enumerate(a_basis):
        for j, mb in enumerate(b_basis):
            m = (ma[0] + mb[0], ma[1] + mb[1], ma[2] + mb[2])
            T[i, j, index[m]] = 1.0
    return T


# kept as numpy so importing this module inside an active jit trace is safe
_T11 = _mul_table(_L1, _L1, _L2)   # (4, 4, 10)
_T21 = _mul_table(_L2, _L1, _L3)   # (10, 4, 20)

# x * basis_monomial -> degree-3 monomial row (for the first six basis elems)
# x*x2=x3(0) x*xy=x2y(1) x*xz=x2z(2) x*y2=xy2(3) x*yz=xyz(4) x*z2=xz2(5)
_ACTION_D3_ROWS = (0, 1, 2, 3, 4, 5)


def _pmul11(a, b):
    """(.., 4) x (.., 4) -> (.., 10)"""
    return jnp.einsum("...i,...j,ijk->...k", a, b, _T11, precision=_HIGHEST)


def _pmul21(a, b):
    """(.., 10) x (.., 4) -> (.., 20)"""
    return jnp.einsum("...i,...j,ijk->...k", a, b, _T21, precision=_HIGHEST)


def _constraint_matrix(Ep):
    """Ep: (3, 3, 4) polynomial essential matrix -> M (10, 20)."""
    # EEt[i][j] = sum_k E[i,k] * E[j,k]  (degree 2)
    EEt = jnp.einsum("ika,jkb,abm->ijm", Ep, Ep, _T11, precision=_HIGHEST)  # (3,3,10)
    # (EEt E)[i][j] = sum_k EEt[i,k] * E[k,j]  (degree 3)
    EEtE = jnp.einsum("ikm,kja,mab->ijb", EEt, Ep, _T21, precision=_HIGHEST)  # (3,3,20)
    tr = EEt[0, 0] + EEt[1, 1] + EEt[2, 2]                                   # (10,)
    trE = jnp.einsum("m,ija,mab->ijb", tr, Ep, _T21, precision=_HIGHEST)     # (3,3,20)
    C = 2.0 * EEtE - trE                                                     # (3,3,20)

    # det(E) via cofactor expansion, all in polynomial space
    def minor(r1, r2, c1, c2):
        return _pmul11(Ep[r1, c1], Ep[r2, c2]) - _pmul11(Ep[r1, c2], Ep[r2, c1])

    det = (
        _pmul21(minor(1, 2, 1, 2), Ep[0, 0])
        - _pmul21(minor(1, 2, 0, 2), Ep[0, 1])
        + _pmul21(minor(1, 2, 0, 1), Ep[0, 2])
    )                                                                         # (20,)
    return jnp.concatenate([det[None, :], C.reshape(9, 20)], axis=0)


def _action_matrix(x1, x2):
    """One minimal sample -> (A_x (10,10), nullspace basis (4,3,3))."""
    ones = jnp.ones_like(x1[:, :1])
    p1 = jnp.concatenate([x1, ones], axis=1)
    p2 = jnp.concatenate([x2, ones], axis=1)
    A = (p2[:, :, None] * p1[:, None, :]).reshape(5, 9)
    AtA = jnp.matmul(A.T, A, precision=_HIGHEST)
    _, vecs = jnp.linalg.eigh(AtA)
    basis = vecs[:, :4].T.reshape(4, 3, 3)        # E1..E4 (smallest eigvecs)

    # polynomial E over [x, y, z, 1]
    Ep = jnp.stack([basis[0], basis[1], basis[2], basis[3]], axis=-1)  # (3,3,4)
    M = _constraint_matrix(Ep)                    # (10, 20)
    M1, M2 = M[:, :10], M[:, 10:]
    B = jnp.linalg.solve(M1 + 1e-12 * jnp.eye(10, dtype=M.dtype), M2)  # (10,10)

    Ax = jnp.zeros((10, 10), M.dtype)
    for i, r in enumerate(_ACTION_D3_ROWS):
        Ax = Ax.at[i].set(-B[r])
    Ax = Ax.at[6, 0].set(1.0)   # x*x  -> x2
    Ax = Ax.at[7, 1].set(1.0)   # x*y  -> xy
    Ax = Ax.at[8, 2].set(1.0)   # x*z  -> xz
    Ax = Ax.at[9, 6].set(1.0)   # x*1  -> x
    return Ax, basis


_ABERTH_ITERS = 40


def _tr_inv_complex(Ax, z):
    """tr((Ax - z I)^-1) for a batch of complex shifts z (10,), computed via
    the real 20x20 block embedding [[X, -Y], [Y, X]] of X + iY — nonsymmetric
    complex LU is not required, so this runs on TPU.

    Returns complex (10,).  A characteristic-polynomial route is numerically
    doomed here: the action matrix has tightly clustered real eigenvalues and
    a 1e-14 coefficient perturbation already scatters them (measured), so we
    work with the determinant/resolvent directly."""
    eye = jnp.eye(10, dtype=Ax.dtype)
    a = z.real
    b = z.imag
    X = Ax[None] - a[:, None, None] * eye[None]            # (10, 10, 10)
    Yb = -b[:, None, None] * eye[None]                     # imag part of M
    top = jnp.concatenate([X, -Yb], axis=2)
    bot = jnp.concatenate([Yb, X], axis=2)
    K = jnp.concatenate([top, bot], axis=1)                # (10, 20, 20)
    Kinv = jnp.linalg.inv(K + 1e-20 * jnp.eye(20, dtype=Ax.dtype)[None])
    tr_re = jnp.trace(Kinv[:, :10, :10], axis1=1, axis2=2)
    tr_im = jnp.trace(Kinv[:, 10:, :10], axis1=1, axis2=2)
    return tr_re + 1j * tr_im


def _real_eigs(Ax):
    """All real eigenvalues of a 10x10 matrix, branch-free (TPU has no
    nonsymmetric ``eig``): Ehrlich-Aberth iteration on p(z) = det(Ax - zI)
    with Newton corrections p/p' = -1/tr((Ax - zI)^-1) — all 10 eigenvalues
    (complex pairs included) converge simultaneously, including the tightly
    clustered real roots that defeat sign-scan bisection and coefficient-
    based root finding.  Returns (roots (10,), valid (10,))."""
    s = jnp.max(jnp.sum(jnp.abs(Ax), axis=1)) + 1e-6
    cdtype = jnp.complex128 if Ax.dtype == jnp.float64 else jnp.complex64
    k = jnp.arange(10)
    z0 = (s * 0.9 * jnp.exp(2j * jnp.pi * (k + 0.35) / 10.0)).astype(cdtype)
    off_diag = ~jnp.eye(10, dtype=bool)

    def step(_, z):
        tr = _tr_inv_complex(Ax, z)
        tr_safe = jnp.where(jnp.abs(tr) < 1e-14, 1e-14, tr)
        newton = -1.0 / tr_safe                            # p/p'
        newton = jnp.where(jnp.isfinite(newton), newton, 0.0)
        diff = z[:, None] - z[None, :]
        diff = jnp.where(jnp.abs(diff) < 1e-12, 1e-12, diff)
        sums = jnp.sum(jnp.where(off_diag, 1.0 / diff, 0.0), axis=1)
        denom = 1.0 - newton * sums
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        corr = newton / denom
        corr = jnp.where(jnp.isfinite(corr), corr, 0.0)
        # clamp runaway steps
        mag = jnp.abs(corr)
        corr = jnp.where(mag > 0.5 * s, corr * (0.5 * s / mag), corr)
        return z - corr

    z = jax.lax.fori_loop(0, _ABERTH_ITERS, step, z0)
    lam = z.real
    valid = (jnp.abs(z.imag) < 1e-4 * s) & jnp.isfinite(lam)
    return lam, valid


def _solve_sample(x1, x2):
    """(5,2),(5,2) normalized coords -> (Es (10,3,3), valid (10,))."""
    Ax, basis = _action_matrix(x1, x2)
    roots, valid = _real_eigs(Ax)

    eye = jnp.eye(10, dtype=Ax.dtype)

    def eigvec(t):
        # nullspace of (Ax - t I) via SVD
        _, _, Vt = jnp.linalg.svd(Ax - t * eye)
        return Vt[-1]                                  # (10,)

    vs = jax.vmap(eigvec)(roots)                       # (10, 10)
    w = vs[:, 9]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    xs = vs[:, 6] / w_safe
    ys = vs[:, 7] / w_safe
    zs = vs[:, 8] / w_safe
    valid = valid & (jnp.abs(w) > 1e-10)

    Es = (
        xs[:, None, None] * basis[0]
        + ys[:, None, None] * basis[1]
        + zs[:, None, None] * basis[2]
        + basis[3]
    )                                                   # (10, 3, 3)
    # project to the essential manifold (sv = 1, 1, 0)
    U, _, Vt = jnp.linalg.svd(Es)
    Es = jnp.matmul(
        U * jnp.array([1.0, 1.0, 0.0], Es.dtype), Vt, precision=_HIGHEST
    )
    return Es, valid


def five_point_candidates(x1_samples, x2_samples):
    """Batched minimal solves.  x*_samples: (H, 5, 2) normalized coords.
    Returns (Es (H, 10, 3, 3), valid (H, 10))."""
    return jax.vmap(_solve_sample)(x1_samples, x2_samples)
