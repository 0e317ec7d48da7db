"""Rigid/centered frame alignment via the orthogonal Procrustes problem.

TPU-native take on the reference's per-frame loop
(``utils/process.py:210-250``): all frames aligned in one ``vmap``-batched
SVD.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def rigid_procrustes(frompts: jnp.ndarray, topts: jnp.ndarray,
                     rigid: bool = True) -> jnp.ndarray:
    """Best rigid (or translation-only) 4x4 transform moving ``frompts`` onto
    ``topts``.  Batched over leading axes via vmap-compatible ops."""
    t0 = frompts.mean(axis=0)
    t1 = topts.mean(axis=0)
    m = (topts - t1).T @ (frompts - t0)
    u, _, vt = jnp.linalg.svd(m)
    r = u @ vt
    r = jnp.where(jnp.linalg.det(r) < 0, -r, r)
    T = jnp.eye(4, dtype=frompts.dtype)
    if rigid:
        T = T.at[:3, :3].set(r)
    T = T.at[:3, 3].set(t1 - r @ t0)
    return T


def _apply_rbm(verts: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    return verts @ T[:3, :3].T + T[:3, 3]


@jax.jit
def _align_rigid(verts: jnp.ndarray) -> jnp.ndarray:
    v0 = verts[0]
    Ts = jax.vmap(lambda v: rigid_procrustes(v, v0, rigid=True))(verts)
    return jax.vmap(_apply_rbm)(verts, Ts)


@jax.jit
def _align_centered(verts: jnp.ndarray) -> jnp.ndarray:
    v0 = verts[0]
    Ts = jax.vmap(lambda v: rigid_procrustes(v, v0, rigid=False))(verts)
    return jax.vmap(_apply_rbm)(verts, Ts)


def align_animation(verts: np.ndarray, rigid: bool = True) -> np.ndarray:
    """Align every frame of (F, N, 3) onto frame 0. ``rigid=False`` applies
    only the translation part (the '_centered' mode)."""
    v = jnp.asarray(verts)
    out = _align_rigid(v) if rigid else _align_centered(v)
    return np.asarray(out, dtype=np.float32)
