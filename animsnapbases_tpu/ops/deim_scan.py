"""Row-wise DEIM as a single device ``lax.scan``.

The greedy DEIM recurrence (ref ``constraintsComponents.py:797-860``) is
sequential in k, but each iteration's work is one small masked solve plus a
large residual matvec + argmax — ideal for the device: the scan keeps the
(ep, K, d) basis resident (no 10s-scale D2H of the basis over tunneled
hosts) and the matvec rides the MXU.

Masking trick: at step k the selected-row system is (k, k); it is embedded
in a fixed (K, K) matrix whose unselected rows/columns are identity, with a
zero rhs tail — the solution is exactly the k-system's solution padded with
zeros, so one static shape serves all steps (the host loop's
``np.linalg.lstsq`` on the square invertible system agrees up to rounding).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def deim_rows(bases, K: int | None = None):
    """Greedy row selection on ``bases`` (ep, K_b, d).

    Returns (Pt (K,), residual_norms (K,)) — selected row per mode, in
    order.  ``K`` defaults to the number of modes.
    """
    bases = jnp.asarray(bases)
    ep, K_b, d = bases.shape
    K = K_b if K is None else min(K, K_b)
    eye = jnp.eye(K, dtype=bases.dtype)

    def step(carry, k):
        Pt, Vsel = carry                       # (K,) int32; (K, K, d)
        vk = bases[:, k, :]                    # (ep, d)
        mask = jnp.arange(K) < k
        both = mask[:, None] & mask[None, :]
        b = jnp.where(mask[:, None], vk[Pt], 0.0)          # (K, d)
        x = []
        for i in range(d):
            Am = jnp.where(both, Vsel[:, :, i], eye)
            x.append(jnp.linalg.solve(Am, b[:, i]))
        x = jnp.stack(x, axis=-1)                          # (K, d)
        c = jnp.einsum("ekd,kd->ed", bases[:, :K, :], x)
        r = jnp.where(k == 0, vk, c - vk)
        rsq = (r ** 2).sum(axis=1)
        idx = jnp.argmax(rsq)
        Pt = Pt.at[k].set(idx.astype(Pt.dtype))
        Vsel = Vsel.at[k].set(bases[idx, :K, :])
        return (Pt, Vsel), jnp.sqrt(rsq[idx])

    Pt0 = jnp.zeros(K, dtype=jnp.int32)
    Vsel0 = jnp.zeros((K, K, d), dtype=bases.dtype)
    (Pt, _), res = jax.lax.scan(step, (Pt0, Vsel0), jnp.arange(K))
    return Pt, res


def deim_rows_host_result(bases, p: int, K: int | None = None):
    """Run :func:`deim_rows` and return numpy (Pt, alphas, alpha_ranges)
    in the reference's output convention."""
    Pt, _ = deim_rows(bases, K)
    Pt = np.asarray(Pt, dtype=np.int64)
    return Pt, Pt // p, np.arange(1, len(Pt) + 1)


def deim_blocks(bases, p: int, K: int | None = None):
    """Greedy block selection (block-DEIM, ref
    ``constraintsComponents.py:733-795``) as one ``lax.scan``: at step k
    the residual of basis block k against the selected (kp, kp) system
    picks the element owning the largest-energy residual ROW (the
    reference's convention); all p of that element's rows join the
    selection.

    bases (ep, K*p, d).  Returns alphas (K,) — selected element per mode.
    """
    bases = jnp.asarray(bases)
    ep, kp_total, d = bases.shape
    K = kp_total // p if K is None else min(K, kp_total // p)
    Kp = K * p
    eye = jnp.eye(Kp, dtype=bases.dtype)

    def step(carry, k):
        rows, Vsel = carry                 # (Kp,) int32; (Kp, Kp, d)
        vk = jax.lax.dynamic_slice_in_dim(bases[:, :Kp, :], k * p, p,
                                          axis=1)          # (ep, p, d)
        mask = jnp.arange(Kp) < k * p
        both = mask[:, None] & mask[None, :]
        b = jnp.where(mask[:, None, None], vk[rows], 0.0)   # (Kp, p, d)
        x = []
        for i in range(d):
            Am = jnp.where(both, Vsel[:, :, i], eye)
            x.append(jnp.linalg.solve(Am, b[:, :, i]))      # (Kp, p)
        x = jnp.stack(x, axis=-1)                           # (Kp, p, d)
        c = jnp.einsum("ekd,kpd->epd", bases[:, :Kp, :], x)
        r = jnp.where(k == 0, vk, c - vk)
        # reference convention (constraintsComponents.py:772-774): argmax
        # over ROW energy, the winning row's element contributes its block
        alpha = jnp.argmax((r ** 2).sum(axis=(1, 2))) // p
        new_rows = (alpha * p + jnp.arange(p)).astype(rows.dtype)
        rows = jax.lax.dynamic_update_slice(rows, new_rows, (k * p,))
        Vsel = jax.lax.dynamic_update_slice(
            Vsel, bases[new_rows, :Kp, :], (k * p, 0, 0))
        return (rows, Vsel), alpha

    rows0 = jnp.zeros(Kp, dtype=jnp.int32)
    Vsel0 = jnp.zeros((Kp, Kp, d), dtype=bases.dtype)
    (_, _), alphas = jax.lax.scan(step, (rows0, Vsel0), jnp.arange(K))
    return alphas


def deim_blocks_host_result(bases, p: int, K: int | None = None):
    """Run :func:`deim_blocks` and return numpy (Pt, alphas, alpha_ranges)
    in the reference's output convention (Pt holds whole p-blocks)."""
    alphas = np.asarray(deim_blocks(bases, p, K), dtype=np.int64)
    Pt = (alphas[:, None] * p + np.arange(p)[None, :]).reshape(-1)
    return Pt, alphas, np.arange(1, len(alphas) + 1)
