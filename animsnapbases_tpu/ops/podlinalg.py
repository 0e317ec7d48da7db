"""Snapshot-POD linear algebra (method of snapshots).

For a snapshot matrix X (n, F) with n >> F, the left singular vectors are
recovered from the F x F Gram matrix:  X^T X = W L W^T,  U = X W L^{-1/2}.
The heavy operation is the (F, n) x (n, F) Gram matmul — one MXU-friendly
contraction — instead of an O(n F^2) LAPACK SVD, which XLA compiles slowly
and TPUs execute poorly.  Replaces the reference's full ``scipy.linalg.svd``
at ``constraintsComponents.py:297-320`` (pod_vectorized) and the torch SVD at
``:273-295`` (pod).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def snapshot_pod(X: jnp.ndarray):
    """Economy SVD of X (n, F) via the Gram matrix, valid for n >= F.

    Returns (U (n, F), s (F,), Vt (F, F)) with singular values descending.
    Columns of U for (near-)zero singular values are zero-filled.
    """
    G = X.T @ X  # (F, F)
    w, W = jnp.linalg.eigh(G)  # ascending
    w = w[::-1]
    W = W[:, ::-1]
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    denom = jnp.where(s > 1e-12 * (s[0] + 1e-30), s, jnp.inf)
    U = (X @ W) / denom[None, :]
    return U, s, W.T
