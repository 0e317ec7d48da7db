"""Position-space reduction bases for the reduced simulator.

The reference declares but never implements position reduction in its solver
(``Simulators.py:144-155``); this module provides the basis construction the
implemented path consumes: per-dim POD of raw position snapshots (no mean
subtraction, so the rest/affine content lies in the span and q = U z is
exact at the snapshots), orthonormal per dim.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animsnapbases_tpu.ops.podlinalg import snapshot_pod


def position_basis_from_trajectory(traj: np.ndarray, r: int,
                                   mesh=None) -> np.ndarray:
    """traj (F, N, 3) -> components (r, N, 3), per-dim orthonormal.

    Uses snapshot-POD per dim (Gram matmul + small eigh, MXU-friendly).
    r is clipped to the number of frames.  ``mesh`` shards the vertex axis
    of the Gram matmul over its 'model' axis (multi-chip bases path).
    """
    F, N, _ = traj.shape
    r = min(r, F)
    comps = np.empty((r, N, 3))
    for d in range(3):
        X = jnp.asarray(traj[:, :, d].T)       # (N, F)
        if mesh is not None:
            from animsnapbases_tpu.ops.podlinalg import snapshot_pod_sharded
            U, s, _ = snapshot_pod_sharded(X, mesh)
        else:
            U, s, _ = snapshot_pod(X)
        Ud = np.asarray(U[:, :r])
        # zero singular directions -> replace with orthonormal completion
        # (can happen when F_effective < r); QR keeps things orthonormal
        if s[r - 1] <= 1e-12 * (float(s[0]) + 1e-30):
            Ud, _ = np.linalg.qr(Ud + 1e-12 * np.random.default_rng(0)
                                 .standard_normal(Ud.shape))
        comps[:, :, d] = Ud.T
    return comps


def save_position_basis(path: str, comps: np.ndarray) -> None:
    np.savez(path, components=comps)
