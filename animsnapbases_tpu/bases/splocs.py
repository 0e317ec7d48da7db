"""SPLOCS sparse-localized component optimization kernels.

Block-coordinate-descent weight updates + ADMM component updates with
l1/l2-prox shrinkage (ref ``snapbases/posComponents.py:131-189,251-256``),
expressed as device-side scans/loops.  The outer iteration stays on host
because the per-component regularization strength needs geodesic support
maps (two sparse backsolves per queried vertex).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from animsnapbases_tpu.bases.greedy import project_weight


@jax.jit
def update_weights(Rflat: jnp.ndarray, C_flat: jnp.ndarray, W: jnp.ndarray):
    """One sweep of block-coordinate-descent weight updates.

    Rflat (F, N*3) residual, C_flat (K, N*3) components, W (F, K).
    Returns (Rflat', W').  Components with ~zero norm get zero activation.
    """

    def body(carry, xs):
        Rf, W = carry
        Ck, k = xs
        ck_norm = Ck @ Ck
        safe = ck_norm > 1e-8

        def do_update(args):
            Rf, W = args
            Rf = Rf + jnp.outer(W[:, k], Ck)
            opt = (Rf @ Ck) / jnp.where(safe, ck_norm, 1.0)
            wk = project_weight(opt)
            Rf = Rf - jnp.outer(wk, Ck)
            return Rf, W.at[:, k].set(wk)

        def zero_update(args):
            Rf, W = args
            return Rf, W.at[:, k].set(0.0)

        Rf, W = jax.lax.cond(safe, do_update, zero_update, (Rf, W))
        return (Rf, W), None

    ks = jnp.arange(W.shape[1])
    (Rflat, W), _ = jax.lax.scan(body, (Rflat, W), (C_flat, ks))
    return Rflat, W


@jax.jit
def component_magnitude_argmax(C: jnp.ndarray) -> jnp.ndarray:
    """Per-component vertex of largest displacement, (K,) indices."""
    return jnp.argmax((C ** 2).sum(axis=2), axis=1)


@jax.jit
def prox_l1l2(Lambda: jnp.ndarray, x: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Group shrinkage over the last axis (ref posComponents.py:251-256)."""
    xlen = jnp.sqrt((x ** 2).sum(axis=-1))
    shrink = jnp.maximum(0.0, 1.0 - beta * Lambda / jnp.where(xlen == 0, 1.0,
                                                              xlen))
    shrink = jnp.where(xlen == 0, 0.0, shrink)
    return x * shrink[..., None]


@partial(jax.jit, static_argnames=("num_admm_iterations",))
def admm_update(C: jnp.ndarray, U: jnp.ndarray, W: jnp.ndarray,
                Xflat: jnp.ndarray, Lambda: jnp.ndarray, rho: float,
                num_admm_iterations: int):
    """ADMM over components with a prefactored (K, K) Cholesky solve.

    C, U: (K, N, 3); W: (F, K); Xflat: (F, N*3); Lambda: (K, N).
    Returns (C', U', Z') after the fixed iteration count; the caller sets
    C <- Z as the reference does.
    """
    K = C.shape[0]
    G = W.T @ W
    c = W.T @ Xflat                       # (K, N*3)
    L = jnp.linalg.cholesky(G + rho * jnp.eye(K, dtype=C.dtype))

    def body(_, carry):
        C, Z, U = carry
        rhs = c + rho * (Z - U).reshape(c.shape)
        C = jax.scipy.linalg.cho_solve((L, True), rhs).reshape(C.shape)
        Z = prox_l1l2(Lambda, C + U, 1.0 / rho)
        U = U + C - Z
        return C, Z, U

    Z = C
    C, Z, U = jax.lax.fori_loop(0, num_admm_iterations, body, (C, Z, U))
    return C, U, Z


@jax.jit
def splocs_energy(Xflat: jnp.ndarray, W: jnp.ndarray, C: jnp.ndarray,
                  Lambda: jnp.ndarray):
    """(residual R (F,N,3), sparsity, E_rms, energy) — the objective report
    of each outer iteration (ref posComponents.py:183-189)."""
    F = Xflat.shape[0]
    K, N, _ = C.shape
    R = Xflat - W @ C.reshape(K, -1)
    sparsity = (Lambda * jnp.sqrt((C ** 2).sum(axis=2))).sum()
    E_rms = jnp.linalg.norm(R) / jnp.sqrt(3.0 * N * F)
    energy = (R ** 2).sum() + sparsity
    return R.reshape(F, N, 3), sparsity, E_rms, energy
