"""Jitted kernels for greedy deflation PCA extraction.

The greedy loop (ref ``snapbases/posComponents.py:66-129``) picks the vertex
with the largest residual energy, takes the dominant mode of its (3, F)
trajectory, and deflates the rank-1 term from the residual.  On TPU each step
is a fused argmax + tiny Gram eigensolve + one rank-1 update over the full
(F, N, 3) tensor; the K-step loop runs as ``lax.scan`` on device for the
global-support path, or as a host loop around the same kernels when per-step
geodesic support maps are needed (local support / SPLOCS).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from animsnapbases_tpu.ops.svd3 import top_mode_rows


def project_weight(x: jnp.ndarray) -> jnp.ndarray:
    """Non-negative cone projection, normalized to max 1 (ref
    posComponents.py:52-58)."""
    x = jnp.maximum(0.0, x)
    mx = x.max()
    return jnp.where(mx == 0, x, x / jnp.where(mx == 0, 1.0, mx))


def signed_nonneg_weight(wk: jnp.ndarray) -> jnp.ndarray:
    """Choose between the projections of +wk and -wk onto the non-negative
    cone, keeping the larger (ref posComponents.py:87-94)."""
    wp = project_weight(wk)
    wn = project_weight(-wk)
    return jnp.where(jnp.linalg.norm(wp) > jnp.linalg.norm(wn), wp, wn)


@jax.jit
def select_vertex(R: jnp.ndarray) -> jnp.ndarray:
    """Vertex index with maximal summed squared residual over frames/dims."""
    return jnp.argmax((R ** 2).sum(axis=(0, 2)))


@jax.jit
def dominant_mode(R: jnp.ndarray, idx: jnp.ndarray):
    """(sigma0, wk) of the (3, F) trajectory of vertex ``idx``; wk is
    sigma0 * Vt[0] of the reference's SVD."""
    X = R[:, idx, :].T
    return top_mode_rows(X)


@jax.jit
def deflate(R: jnp.ndarray, wk: jnp.ndarray, support: jnp.ndarray):
    """Solve for the optimal component under the support map and remove the
    rank-1 term:  ck = (wk . R) * support / <wk, wk>;  R -= wk (x) ck.
    Returns (ck (N, 3), R')."""
    denom = wk @ wk
    ck = jnp.einsum("f,fnd->nd", wk, R) * support[:, None] / denom
    return ck, R - wk[:, None, None] * ck[None]


@partial(jax.jit, static_argnames=("num_components",))
def _extract_global_impl(R0: jnp.ndarray, num_components: int):
    ones = jnp.ones(R0.shape[1], dtype=R0.dtype)

    def step(R, _):
        idx = jnp.argmax((R ** 2).sum(axis=(0, 2)))
        sigma0, wk = top_mode_rows(R[:, idx, :].T)
        ck, R = deflate(R, wk, ones)
        return R, (ck, wk, sigma0, jnp.linalg.norm(R), idx)

    R_final, (C, W, sig, res, idxs) = jax.lax.scan(
        step, R0, None, length=num_components)
    return C, W.T, sig, res, idxs, R_final


def extract_global(R0: jnp.ndarray, num_components: int, mesh=None):
    """Full greedy extraction with global support as a device-side scan.

    Returns (comps (K, N, 3), weights (F, K), sigma0s (K,), res_norms (K,),
    indices (K,), R_final).  ``mesh`` (jax.sharding.Mesh with a 'model'
    axis) shards the vertex axis — argmax/deflation run vertex-parallel
    with XLA-inserted collectives, selections and components identical
    to single-device (zero-padded columns never win the argmax)."""
    R0 = jnp.asarray(R0)
    if mesh is None:
        return _extract_global_impl(R0, num_components)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from animsnapbases_tpu.utils.padding import zero_pad_to_multiple

    n = R0.shape[1]
    R0 = zero_pad_to_multiple(R0, 1, mesh.shape["model"])
    R0 = jax.device_put(R0, NamedSharding(mesh, P(None, "model", None)))
    C, W, sig, res, idxs, R_final = _extract_global_impl(R0,
                                                         num_components)
    return C[:, :n], W, sig, res, idxs, R_final[:, :n]
