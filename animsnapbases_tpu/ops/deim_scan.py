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
