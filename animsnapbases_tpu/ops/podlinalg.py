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


def snapshot_pod_host(X, n_modes: int | None = None):
    """Host (numpy f64) twin of :func:`snapshot_pod` — same Gram-matrix
    method of snapshots, same zero-fill convention.

    For host-resident snapshot matrices (the bases pipeline reads them from
    ``.npz``/``.bin`` artifacts) consumed back on the host (the modes are
    stored to ``.npz``), the POD is bandwidth-bound, not FLOP-bound: at
    bunny scale the device path ships ~200 MB over the host<->TPU link for
    ~14 GFLOP of matmul.  When that link is slow (tunneled hosts), the BLAS
    Gram path wins by an order of magnitude; device/sharded paths remain
    for device-resident or multi-chip snapshots.

    ``n_modes`` restricts the returned left vectors to the leading modes
    (U is (n, n_modes)); the full singular-value vector is returned either
    way so callers can rank-truncate.  The Gram matmul runs as one dsyrk
    (half the GEMM flops).
    """
    import numpy as np
    from scipy.linalg import blas

    X = np.asarray(X, dtype=np.float64)
    F = X.shape[1]
    k = F if n_modes is None else min(int(n_modes), F)
    Xf = X if X.flags.c_contiguous or X.flags.f_contiguous else (
        np.ascontiguousarray(X))
    G = blas.dsyrk(1.0, Xf, trans=1, lower=0)       # upper triangle of X^T X
    G = np.triu(G) + np.triu(G, 1).T
    w, W = np.linalg.eigh(G)
    w = w[::-1]
    W = np.ascontiguousarray(W[:, ::-1])
    s = np.sqrt(np.maximum(w, 0.0))
    denom = np.where(s > 1e-12 * (s[0] + 1e-30), s, np.inf)
    U = Xf @ (W[:, :k] / denom[None, :k])
    return U, s, W.T


def snapshot_pod_sharded(X, mesh, axis: str = "model"):
    """Multi-chip :func:`snapshot_pod`: the snapshot rows (the big n axis —
    vertices or constraint rows) are sharded over ``mesh[axis]``; the Gram
    matrix is a ``psum`` of per-shard ``X_s^T X_s`` contributions over ICI;
    the tiny F x F eigendecomposition runs replicated and the left vectors
    are recovered shard-locally.  Exact same math as the single-device path
    (SURVEY §5.8's TPU-native scale-out of the bases pipeline).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n, F = X.shape
    nsh = mesh.shape[axis]
    n_pad = -(-n // nsh) * nsh

    def f(Xs):
        G = jax.lax.psum(Xs.T @ Xs, axis)
        w, W = jnp.linalg.eigh(G)
        w = w[::-1]
        W = W[:, ::-1]
        s = jnp.sqrt(jnp.maximum(w, 0.0))
        denom = jnp.where(s > 1e-12 * (s[0] + 1e-30), s, jnp.inf)
        Us = (Xs @ W) / denom[None, :]
        return Us, s, W.T

    sharded = shard_map(f, mesh=mesh, in_specs=P(axis),
                        out_specs=(P(axis), P(), P()))

    @jax.jit
    def run(X):
        Xp = jnp.pad(X, ((0, n_pad - n), (0, 0)))
        Us, s, Wt = sharded(Xp)
        return Us[:n], s, Wt

    return run(jnp.asarray(X))
