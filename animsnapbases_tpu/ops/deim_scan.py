"""Row-wise DEIM as a single device ``lax.scan``.

The greedy DEIM recurrence (ref ``constraintsComponents.py:797-860``) is
sequential in k, but each iteration's work is one small masked solve plus a
large residual matvec + argmax — ideal for the device: the scan keeps the
(ep, K, d) basis resident (no 10s-scale D2H of the basis over tunneled
hosts) and the matvec rides the MXU.

Solve strategy (round 3): the selected-row system grows by one
row/column per step, so its inverse is maintained INCREMENTALLY by the
block-bordering identity

    [[A, b], [c^T, d]]^-1 = [[A^-1 + A^-1 b S^-1 c^T A^-1, -A^-1 b S^-1],
                             [-S^-1 c^T A^-1,               S^-1]],
    S = d - c^T A^-1 b,

embedded in a fixed (K, K) matrix whose unselected rows/columns stay
identity (so one static shape serves every step and the padded rhs tail
solves to zero).  This replaces the O(K^3)-per-step ``jnp.linalg.solve``
(a LAPACK custom call — slow to compile AND serial at run time on TPU,
CLAUDE.md) with O(K^2) matmul/outer updates: the whole selection is
matmuls + argmax, nothing but MXU/VPU work.  Well-posedness note: DEIM's
argmax-residual pick is exactly what keeps ||V[Pt]^-1|| growth bounded
(the classic DEIM lemma), so the unpivoted bordered inverse is stable in
the regime the algorithm constructs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _border_update(Minv, b_vec, c_vec, d_val, q, K):
    """Grow the embedded inverse by selection ``q``: ``b_vec``/``c_vec``
    (K, d) are the new column/row (masked to entries < q), ``d_val`` (d,)
    the corner.  Entries outside the active block are identity, which the
    masking of b_vec/c_vec keeps uncontaminated."""
    Ainv_b = jnp.einsum("abd,bd->ad", Minv, b_vec)          # (K, d)
    cAinv = jnp.einsum("ad,abd->bd", c_vec, Minv)           # (K, d)
    S = d_val - jnp.sum(cAinv * b_vec, axis=0)              # (d,)
    Sinv = 1.0 / S
    Minv = Minv + Ainv_b[:, None, :] * cAinv[None, :, :] * Sinv
    is_q = jnp.arange(K) == q
    # column q, row q, then the corner
    Minv = jnp.where(is_q[None, :, None], (-Ainv_b * Sinv)[:, None, :],
                     Minv)
    Minv = jnp.where(is_q[:, None, None], (-cAinv * Sinv)[None, :, :],
                     Minv)
    Minv = jnp.where(is_q[:, None, None] & is_q[None, :, None],
                     Sinv[None, None, :], Minv)
    return Minv


def _shard_rows(bases, mesh):
    """Place ``bases`` with its row axis sharded over the mesh's 'model'
    axis (padding rows with zeros to a multiple of the axis size — zero
    rows never win the argmax).  The scan's residual matvec then runs
    row-parallel across devices; XLA inserts the argmax/gather
    collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape["model"]
    ep = bases.shape[0]
    pad = (-ep) % n
    if pad:
        bases = jnp.concatenate(
            [bases, jnp.zeros((pad,) + bases.shape[1:], bases.dtype)])
    return jax.device_put(bases, NamedSharding(mesh, P("model")))


def deim_rows(bases, K: int | None = None, mesh=None):
    """Greedy row selection on ``bases`` (ep, K_b, d).

    Returns (Pt (K,), residual_norms (K,)) — selected row per mode, in
    order.  ``K`` defaults to the number of modes.  ``mesh`` (a
    jax.sharding.Mesh with a 'model' axis) shards the row axis — the
    multi-chip bases path; selections are identical to single-device.
    """
    bases = jnp.asarray(bases)
    ep, K_b, d = bases.shape
    K = K_b if K is None else min(K, K_b)
    if mesh is not None:
        bases = _shard_rows(bases, mesh)

    def step(carry, k):
        Pt, Vsel, Minv = carry   # (K,) int32; (K, K, d); (K, K, d)
        vk = bases[:, k, :]                    # (ep, d)
        mask = jnp.arange(K) < k
        b = jnp.where(mask[:, None], Vsel[:, k, :], 0.0)    # (K, d)
        x = jnp.einsum("abd,bd->ad", Minv, b)               # (K, d)
        c = jnp.einsum("ekd,kd->ed", bases[:, :K, :], x)
        r = jnp.where(k == 0, vk, c - vk)
        rsq = (r ** 2).sum(axis=1)
        idx = jnp.argmax(rsq)
        Pt = Pt.at[k].set(idx.astype(Pt.dtype))
        new_row = bases[idx, :K, :]                         # (K, d)
        Vsel = Vsel.at[k].set(new_row)
        c_vec = jnp.where(mask[:, None], new_row, 0.0)
        Minv = _border_update(Minv, b, c_vec, new_row[k], k, K)
        return (Pt, Vsel, Minv), jnp.sqrt(rsq[idx])

    Pt0 = jnp.zeros(K, dtype=jnp.int32)
    Vsel0 = jnp.zeros((K, K, d), dtype=bases.dtype)
    Minv0 = jnp.broadcast_to(jnp.eye(K, dtype=bases.dtype)[:, :, None],
                             (K, K, d))
    (Pt, _, _), res = jax.lax.scan(step, (Pt0, Vsel0, Minv0),
                                   jnp.arange(K))
    return Pt, res


def deim_rows_host_result(bases, p: int, K: int | None = None, mesh=None):
    """Run :func:`deim_rows` and return numpy (Pt, alphas, alpha_ranges)
    in the reference's output convention."""
    Pt, _ = deim_rows(bases, K, mesh=mesh)
    Pt = np.asarray(Pt, dtype=np.int64)
    return Pt, Pt // p, np.arange(1, len(Pt) + 1)


def deim_blocks(bases, p: int, K: int | None = None, mesh=None):
    """Greedy block selection (block-DEIM, ref
    ``constraintsComponents.py:733-795``) as one ``lax.scan``: at step k
    the residual of basis block k against the selected (kp, kp) system
    picks the element owning the largest-energy residual ROW (the
    reference's convention); all p of that element's rows join the
    selection.  The selected-system inverse is maintained by p bordered
    rank-1 updates per step (see module docstring) — no LAPACK solves.

    bases (ep, K*p, d).  Returns alphas (K,) — selected element per mode.
    """
    bases = jnp.asarray(bases)
    ep, kp_total, d = bases.shape
    K = kp_total // p if K is None else min(K, kp_total // p)
    Kp = K * p
    if mesh is not None:
        bases = _shard_rows(bases, mesh)

    def step(carry, k):
        rows, Vsel, Minv = carry   # (Kp,) int32; (Kp, Kp, d); (Kp, Kp, d)
        vk = jax.lax.dynamic_slice_in_dim(bases[:, :Kp, :], k * p, p,
                                          axis=1)          # (ep, p, d)
        mask = jnp.arange(Kp) < k * p
        b = jnp.where(
            mask[:, None, None],
            jax.lax.dynamic_slice_in_dim(Vsel, k * p, p, axis=1),
            0.0)                                            # (Kp, p, d)
        x = jnp.einsum("abd,bpd->apd", Minv, b)             # (Kp, p, d)
        c = jnp.einsum("ekd,kpd->epd", bases[:, :Kp, :], x)
        r = jnp.where(k == 0, vk, c - vk)
        # reference convention (constraintsComponents.py:772-774): argmax
        # over ROW energy, the winning row's element contributes its block
        alpha = jnp.argmax((r ** 2).sum(axis=(1, 2))) // p
        new_rows = (alpha * p + jnp.arange(p)).astype(rows.dtype)
        rows = jax.lax.dynamic_update_slice(rows, new_rows, (k * p,))
        newV = bases[new_rows, :Kp, :]                      # (p, Kp, d)
        Vsel = jax.lax.dynamic_update_slice(Vsel, newV, (k * p, 0, 0))
        for j in range(p):
            q = k * p + j
            maskq = jnp.arange(Kp) < q
            b_vec = jnp.where(
                maskq[:, None],
                jax.lax.dynamic_slice_in_dim(
                    Vsel, q, 1, axis=1)[:, 0, :], 0.0)      # (Kp, d)
            c_vec = jnp.where(maskq[:, None], newV[j], 0.0)
            d_val = jax.lax.dynamic_slice_in_dim(
                newV[j], q, 1, axis=0)[0]                   # (d,)
            Minv = _border_update(Minv, b_vec, c_vec, d_val, q, Kp)
        return (rows, Vsel, Minv), alpha

    rows0 = jnp.zeros(Kp, dtype=jnp.int32)
    Vsel0 = jnp.zeros((Kp, Kp, d), dtype=bases.dtype)
    Minv0 = jnp.broadcast_to(jnp.eye(Kp, dtype=bases.dtype)[:, :, None],
                             (Kp, Kp, d))
    (_, _, _), alphas = jax.lax.scan(step, (rows0, Vsel0, Minv0),
                                     jnp.arange(K))
    return alphas


def deim_blocks_host_result(bases, p: int, K: int | None = None,
                            mesh=None):
    """Run :func:`deim_blocks` and return numpy (Pt, alphas, alpha_ranges)
    in the reference's output convention (Pt holds whole p-blocks)."""
    alphas = np.asarray(deim_blocks(bases, p, K, mesh=mesh), dtype=np.int64)
    Pt = (alphas[:, None] * p + np.arange(p)[None, :]).reshape(-1)
    return Pt, alphas, np.arange(1, len(alphas) + 1)
