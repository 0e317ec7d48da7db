"""Jacobi-preconditioned conjugate gradients for the PD global solve.

The global matrix ``A = M/dt^2 + sum_i w_i S_i^T A_i^T A_i S_i`` (ref
``Simulators.py:559-613``) couples equal dims only, so it is the 3-fold
interleaved Kronecker lift of one SPD ``(N, N)`` block ``A_d``.  Above the
dense-Cholesky size limit the reference prefactors a host sparse LU and pays
a host round trip per local-global iteration; on TPU (no sparse
factorizations, high host-link latency) we instead solve the per-dim system
on device with CG:

* the matvec is the COO triplet form of ``A_d`` (segment-sum scatter) — the
  same struct-of-arrays the LHS is assembled from, no densification;
* Jacobi (diagonal) preconditioning removes the 1e10 pinned-mass scale, so
  the iteration count is governed by the elastic stiffness ratio only;
* all three dims share one solve on an ``(N, 3)`` right-hand side;
* callers solve in displacement form ``u = q - s_n`` (rhs at elastic scale),
  which keeps float32 viable with pinned masses, and warm-start each PD
  iteration from the previous one's ``u`` — PD convergence makes successive
  solves nearly identical, collapsing the CG iteration count.

Everything is ``lax.while_loop``-based and jit/shard_map composable.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def coo_matvec(rows, cols, vals, x, n):
    """y = A x for COO triplets; x (n, k) -> y (n, k)."""
    return jax.ops.segment_sum(vals[:, None] * x[cols], rows,
                               num_segments=n)


def build_ell(rows, cols, vals, n: int, diag_add=None):
    """Coalesce COO triplets into padded ELL form: ``(cols (n, k) int32,
    vals (n, k))`` with zero-padding (padded entries point at row 0 with
    value 0).

    ELL turns the sparse matvec into a gather + batched dot — no scatter —
    which is the TPU-friendly layout (segment-sum scatters serialize badly
    on the VPU); mesh matrices have tightly bounded row degree so the
    padding waste is small.  ``diag_add`` (n,) is added to the diagonal
    before packing.
    """
    import scipy.sparse as sp

    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    if diag_add is not None:
        A = (A + sp.diags(diag_add)).tocsr()
    counts = np.diff(A.indptr)
    k = max(int(counts.max()) if len(counts) else 1, 1)
    cols_pad = np.zeros((n, k), dtype=np.int32)
    vals_pad = np.zeros((n, k), dtype=A.data.dtype)
    slot = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
    row_of = np.repeat(np.arange(n), counts)
    cols_pad[row_of, slot] = A.indices
    vals_pad[row_of, slot] = A.data
    return cols_pad, vals_pad


def ell_matvec(cols_pad, vals_pad, x):
    """y = A x for padded ELL; x (n, d) -> y (n, d)."""
    return jnp.einsum("nk,nkd->nd", vals_pad, x[cols_pad])


def pcg_solve(matvec, dinv, rhs, x0=None, tol: float = 1e-12,
              max_iters: int = 400):
    """Jacobi-preconditioned CG on an (n, d) right-hand side; functional
    core — ``matvec``/``dinv``/``rhs`` may all be traced arguments, so a
    single compilation serves every re-prepared system of the same shape.

    ``tol`` is relative to the preconditioned RHS norm — a WARM-START-
    INDEPENDENT scale (relative to the initial residual, a good warm start
    would demand a further reduction below the rounding floor and spin to
    max_iters doing nothing).
    """
    x = jnp.zeros_like(rhs) if x0 is None else x0
    r = rhs - matvec(x)
    z = dinv[:, None] * r
    rz = jnp.sum(r * z, axis=0)                       # (d,)
    rhs_z = jnp.sum(rhs * (dinv[:, None] * rhs), axis=0)
    # floor against all-zero rhs dims (flat cloth): converged at start
    rz0 = jnp.maximum(rhs_z, jnp.finfo(rhs.dtype).tiny)
    # dtype-aware tolerance: float32 cannot reach 1e-11 relative — floor
    # at ~50 eps so the loop stops at the precision floor instead of
    # stalling to max_iters (f32 CG reliably reaches ~3e-6 relative in
    # the preconditioned norm; tighter floors hit the rounding plateau)
    eff_tol = max(tol, 50.0 * float(jnp.finfo(rhs.dtype).eps))
    thresh = (eff_tol * eff_tol) * rz0

    def cond(state):
        _, r, z, p, rz, it = state
        return jnp.logical_and(it < max_iters, jnp.any(rz > thresh))

    def body(state):
        x, r, z, p, rz, it = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap, axis=0),
                                 jnp.finfo(rhs.dtype).tiny)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * Ap
        z = dinv[:, None] * r
        rz_new = jnp.sum(r * z, axis=0)
        beta = rz_new / jnp.maximum(rz, jnp.finfo(rhs.dtype).tiny)
        p = z + beta[None, :] * p
        return x, r, z, p, rz_new, it + 1

    x, _, _, _, _, it = jax.lax.while_loop(
        cond, body, (x, r, z, z, rz, jnp.asarray(0)))
    return x, it


def make_pcg_solver(rows: np.ndarray, cols: np.ndarray, vals,
                    diag, n: int, *, tol: float = 1e-12,
                    max_iters: int = 400, matvec=None):
    """Build ``solve(rhs (n,3), x0) -> (x, iters)`` for the SPD matrix given
    in COO form (or a custom ``matvec``), with Jacobi preconditioning.
    Closure-based wrapper over :func:`pcg_solve`.
    """
    dinv = 1.0 / jnp.asarray(diag)

    if matvec is None:
        rows_j = jnp.asarray(rows)
        cols_j = jnp.asarray(cols)
        vals_j = jnp.asarray(vals)

        def matvec(x):
            return coo_matvec(rows_j, cols_j, vals_j, x, n)

    def solve(rhs, x0=None, max_iterations=max_iters):
        return pcg_solve(matvec, dinv, rhs, x0, tol=tol,
                         max_iters=max_iterations)

    return solve
