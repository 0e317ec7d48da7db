"""Branch-free small-matrix decompositions for batched use on TPU.

``jnp.linalg.svd`` lowers to a LAPACK/XLA custom call that is slow to compile
and slow to run for tiny batched matrices; the PD solver needs thousands of
2x2/3x3 SVDs per local-global iteration (ref
``Constraint_projections.py:419,547,682``).  These routines are pure jnp
arithmetic (Jacobi rotations with a fixed sweep count, ``where``-based
branches), so XLA vectorizes them straight onto the VPU under ``vmap``.

All functions operate on a single matrix and are designed to be ``vmap``-ed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-30


def _grad_safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt with a ZERO (instead of inf) derivative at x <= 0.

    Values are bit-identical to ``jnp.sqrt`` for x > 0 and 0 otherwise
    (callers clamp negatives anyway).  Needed for reverse-mode AD through
    degenerate spectra: the SVD-based projections are smooth functions of
    F even when singular values coincide (e.g. an element exactly at rest,
    F = I), but ``sqrt'(0) = inf`` poisons the whole backward pass with
    inf * 0 = NaN — the double-``where`` keeps the untaken branch's
    cotangent finite (see ``sim/diff.py``)."""
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)),
                     jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# symmetric eigendecomposition via cyclic Jacobi
# ---------------------------------------------------------------------------

def _jacobi_rotation(app, aqq, apq):
    """Givens rotation (c, s) annihilating the off-diagonal apq, branch-free."""
    tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < _EPS, 1.0, apq))
    # t = sign(tau) / (|tau| + sqrt(1 + tau^2)); sign(0) must be +1 so that
    # equal diagonal entries still produce the required 45-degree rotation
    sgn = jnp.where(tau >= 0, 1.0, -1.0).astype(tau.dtype)
    t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.abs(apq) < _EPS, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    return c, s


def _apply_jacobi(A, V, p, q):
    c, s = _jacobi_rotation(A[p, p], A[q, q], A[p, q])
    # G = identity with [[c, s], [-s, c]] in rows/cols (p, q); A <- G^T A G
    Ap = c * A[:, p] - s * A[:, q]
    Aq = s * A[:, p] + c * A[:, q]
    A = A.at[:, p].set(Ap).at[:, q].set(Aq)
    Ap = c * A[p, :] - s * A[q, :]
    Aq = s * A[p, :] + c * A[q, :]
    A = A.at[p, :].set(Ap).at[q, :].set(Aq)
    Vp = c * V[:, p] - s * V[:, q]
    Vq = s * V[:, p] + c * V[:, q]
    V = V.at[:, p].set(Vp).at[:, q].set(Vq)
    return A, V


def jacobi_eigh3(S: jnp.ndarray, sweeps: int = 6):
    """Eigendecomposition of a symmetric 3x3: returns (eigvals (3,) descending,
    eigvecs (3,3) columns).  ``sweeps`` cyclic Jacobi sweeps (quadratic
    convergence; 6 reaches fp64 round-off for 3x3)."""
    A = S
    V = jnp.eye(3, dtype=S.dtype)
    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            A, V = _apply_jacobi(A, V, p, q)
    w = jnp.diagonal(A)
    order = jnp.argsort(-w)
    return w[order], V[:, order]


def jacobi_eigh2(S: jnp.ndarray):
    """Closed-form eigendecomposition of a symmetric 2x2 (descending)."""
    a, b, d = S[0, 0], S[0, 1], S[1, 1]
    tr = a + d
    diff = a - d
    rad = _grad_safe_sqrt(diff * diff + 4.0 * b * b)
    w0 = 0.5 * (tr + rad)
    w1 = 0.5 * (tr - rad)
    c, s = _jacobi_rotation(a, d, b)
    # same rotation convention as _apply_jacobi: new col0 = c*e0 - s*e1
    V = jnp.array([[c, s], [-s, c]], dtype=S.dtype)
    # diagonal of V^T S V decides which column carries the larger eigenvalue
    d0 = (V[:, 0] @ (S @ V[:, 0]))
    V = jnp.where(d0 < 0.5 * tr, V[:, ::-1], V)
    return jnp.array([w0, w1], dtype=S.dtype), V


# ---------------------------------------------------------------------------
# SVD of 3x3 / 2x2 via eigendecomposition of F^T F
# ---------------------------------------------------------------------------

def _orthonormal_u(B: jnp.ndarray, sigma: jnp.ndarray):
    """Columns of U from B = F V = U diag(sigma): Gram-Schmidt on the columns
    of B with a basis-vector fallback for (near-)zero singular values.
    Branch-free, always returns an orthonormal matrix."""
    n = B.shape[0]
    eps = jnp.finfo(B.dtype).eps
    # eigh(F^T F) perturbs sigmas by ~sqrt(eps)*sigma0; below that the column
    # direction of B is numerical noise and must be replaced.
    thresh = 16.0 * jnp.sqrt(eps) * (sigma[0] + _EPS)
    cand = jnp.eye(n, dtype=B.dtype)

    cols = []
    for i in range(n):
        v = B[:, i]
        for pc in cols:
            v = v - (v @ pc) * pc
        # grad-safe norm: a fully-degenerate element (F = 0 -> B = 0)
        # otherwise NaNs the backward pass through norm'(0) even though
        # the where below discards the branch (0 * NaN = NaN)
        vn = _grad_safe_sqrt((v * v).sum())
        ok = (sigma[i] > thresh) & (vn > _EPS)
        # fallback: the basis vector least aligned with previous columns
        scores = jnp.zeros(n, dtype=B.dtype)
        for pc in cols:
            scores = scores + (cand @ pc) ** 2
        alt = cand[:, jnp.argmin(scores)]
        for pc in cols:
            alt = alt - (alt @ pc) * pc
        alt = alt / jnp.maximum(_grad_safe_sqrt((alt * alt).sum()), _EPS)
        cols.append(jnp.where(ok, v / jnp.maximum(vn, _EPS), alt))
    return jnp.stack(cols, axis=1)


def svd3x3(F: jnp.ndarray):
    """SVD of a 3x3 matrix: F = U diag(s) V^T, with s sorted descending and
    non-negative, U and V orthogonal (matches numpy's convention up to the
    usual sign ambiguity)."""
    S = F.T @ F
    w, V = jacobi_eigh3(S)
    sigma = _grad_safe_sqrt(w)
    U = _orthonormal_u(F @ V, sigma)
    return U, sigma, V.T


def svd2x2(F: jnp.ndarray):
    """SVD of a 2x2 matrix (descending non-negative singular values)."""
    S = F.T @ F
    w, V = jacobi_eigh2(S)
    sigma = _grad_safe_sqrt(w)
    U = _orthonormal_u(F @ V, sigma)
    return U, sigma, V.T


def polar_rotation3x3(F: jnp.ndarray):
    """Rotation factor R = U V^T of the polar decomposition F = R S, with
    det(R) = +1 enforced by flipping the last column of U (the convention the
    deformation-gradient constraint uses, ref
    Constraint_projections.py:682-687)."""
    U, s, Vt = svd3x3(F)
    R = U @ Vt
    flip = jnp.linalg.det(R) < 0
    U = U.at[:, 2].multiply(jnp.where(flip, -1.0, 1.0))
    return U @ Vt


# ---------------------------------------------------------------------------
# dominant mode of a (d, F) trajectory via its d x d Gram matrix
# ---------------------------------------------------------------------------

def top_mode_rows(X: jnp.ndarray):
    """Dominant singular triple of X (d, F) with d in {2, 3}: returns
    (sigma0, w) where w = sigma0 * (first right singular vector), i.e. the
    quantity ``sing[0] * Vt[0]`` the greedy PCA extraction uses
    (ref posComponents.py:83-85).  Computed from the tiny d x d Gram matrix
    so the heavy op is one (d,F)x(F,d) matmul — MXU-friendly under vmap.

    Sign convention is arbitrary (as with any SVD); all downstream uses are
    sign-invariant (rank-1 deflation w ⊗ c is quadratic in the sign).
    """
    d = X.shape[0]
    G = X @ X.T
    if d == 3:
        w, V = jacobi_eigh3(G)
    elif d == 2:
        w, V = jacobi_eigh2(G)
    else:
        raise ValueError("top_mode_rows supports d in {2, 3}")
    sigma0 = jnp.sqrt(jnp.maximum(w[0], 0.0))
    u0 = V[:, 0]
    # sigma * Vt[0] = u0^T X  (since X = U S Vt and u0 is the top left vector)
    return sigma0, u0 @ X
