"""Row-wise DEIM as a single device ``lax.scan``.

The greedy DEIM recurrence (ref ``constraintsComponents.py:797-860``) is
sequential in k, but each iteration's work is one small masked solve plus a
large residual matvec + argmax — ideal for the device: the scan keeps the
(ep, K, d) basis resident (no 10s-scale D2H of the basis over tunneled
hosts) and the matvec rides the MXU.

Two structural choices make the scan fast on TPU (round 3):

* **Incremental bordered inverse.**  The selected-row system grows by one
  row/column per step, so its inverse is maintained by the
  block-bordering identity

      [[A, b], [c^T, e]]^-1 = [[A^-1 + A^-1 b S^-1 c^T A^-1, -A^-1 b S^-1],
                               [-S^-1 c^T A^-1,               S^-1]],
      S = e - c^T A^-1 b,

  embedded in a fixed (K, K) matrix whose unselected rows/columns stay
  identity (one static shape serves every step; the padded rhs tail
  solves to zero).  This replaces the O(K^3)-per-step
  ``jnp.linalg.solve`` (a LAPACK custom call — slow to compile AND
  serial at run time on TPU) with O(K^2) matmul/outer updates.
  Well-posedness: DEIM's argmax-residual pick is exactly what keeps
  ||V[Pt]^-1|| growth bounded (the classic DEIM lemma), so the unpivoted
  bordered inverse is stable in the regime the algorithm constructs.

* **Dim-major layout.**  All scan-internal tensors lead with the d axis
  ((d, ep, K) basis, (d, K, K) inverse): the heavy residual contraction
  becomes a d-batched matvec with the contraction on the minor axis —
  no per-step relayout of the 100 MB-scale basis (the (ep, K, d) form
  batches over the minor-most axis, which forced exactly that).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def _border_update(Minv, b_vec, c_vec, e_val, q, K):
    """Grow the embedded inverse by selection ``q``: ``b_vec``/``c_vec``
    (d, K) are the new column/row (masked to entries < q), ``e_val``
    (d, 1) the corner.  Entries outside the active block are identity,
    which the masking of b_vec/c_vec keeps uncontaminated.  All arrays
    dim-major: Minv (d, K, K)."""
    Ainv_b = jnp.einsum("dab,db->da", Minv, b_vec)          # (d, K)
    cAinv = jnp.einsum("da,dab->db", c_vec, Minv)           # (d, K)
    S = e_val - jnp.sum(cAinv * b_vec, axis=1, keepdims=True)  # (d, 1)
    Sinv = 1.0 / S
    Minv = Minv + (Ainv_b * Sinv)[:, :, None] * cAinv[:, None, :]
    is_q = jnp.arange(K) == q
    # column q, row q, then the corner
    Minv = jnp.where(is_q[None, None, :], (-Ainv_b * Sinv)[:, :, None],
                     Minv)
    Minv = jnp.where(is_q[None, :, None], (-cAinv * Sinv)[:, None, :],
                     Minv)
    Minv = jnp.where(is_q[None, :, None] & is_q[None, None, :],
                     Sinv[:, :, None], Minv)
    return Minv


def _shard_cols(basesT, mesh):
    """Place dim-major ``basesT`` (d, ep, K) with its row (ep) axis
    sharded over the mesh's 'model' axis (zero-padding to a multiple of
    the axis size — zero rows never win the argmax).  The residual
    matvec then runs row-parallel; XLA inserts the argmax/gather
    collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from animsnapbases_tpu.utils.padding import zero_pad_to_multiple

    basesT = zero_pad_to_multiple(basesT, 1, mesh.shape["model"])
    return jax.device_put(basesT, NamedSharding(mesh, P(None, "model",
                                                        None)))


@partial(jax.jit, static_argnames=("K",))
def _deim_rows_jit(basesT, K):
    """One-dispatch kernel on dim-major basesT (d, ep, K): eager-mode
    slicing/transpose would cost ~100 ms of tunnel latency PER op."""
    d = basesT.shape[0]

    def step(carry, k):
        Pt, Vsel, Minv = carry   # (K,) int32; (d, K, K); (d, K, K)
        vk = jax.lax.dynamic_slice_in_dim(basesT, k, 1, axis=2)[..., 0]
        mask = jnp.arange(K) < k
        b = jnp.where(mask[None, :],
                      jax.lax.dynamic_slice_in_dim(
                          Vsel, k, 1, axis=2)[..., 0], 0.0)  # (d, K)
        x = jnp.einsum("dab,db->da", Minv, b)               # (d, K)
        c = jnp.einsum("dek,dk->de", basesT, x)             # (d, ep)
        r = jnp.where(k == 0, vk, c - vk)
        rsq = (r ** 2).sum(axis=0)                          # (ep,)
        idx = jnp.argmax(rsq)
        Pt = Pt.at[k].set(idx.astype(Pt.dtype))
        new_row = basesT[:, idx, :]                         # (d, K)
        Vsel = jnp.where((jnp.arange(K) == k)[None, :, None],
                         new_row[:, None, :], Vsel)
        c_vec = jnp.where(mask[None, :], new_row, 0.0)
        e_val = jax.lax.dynamic_slice_in_dim(
            new_row, k, 1, axis=1)                          # (d, 1)
        Minv = _border_update(Minv, b, c_vec, e_val, k, K)
        return (Pt, Vsel, Minv), jnp.sqrt(rsq[idx])

    Pt0 = jnp.zeros(K, dtype=jnp.int32)
    Vsel0 = jnp.zeros((d, K, K), dtype=basesT.dtype)
    Minv0 = jnp.broadcast_to(jnp.eye(K, dtype=basesT.dtype)[None],
                             (d, K, K))
    (Pt, _, _), res = jax.lax.scan(step, (Pt0, Vsel0, Minv0),
                                   jnp.arange(K))
    return Pt, res


@partial(jax.jit, static_argnames=("K",))
def _to_dim_major(bases, K):
    return bases[:, :K, :].transpose(2, 0, 1)


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
    basesT = _to_dim_major(bases, K)
    if mesh is not None:
        basesT = _shard_cols(basesT, mesh)
    return _deim_rows_jit(basesT, K)


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
    rank-1 updates per step (see module docstring) — no LAPACK solves;
    dim-major layout throughout.

    bases (ep, K*p, d).  Returns alphas (K,) — selected element per mode.
    """
    bases = jnp.asarray(bases)
    ep, kp_total, d = bases.shape
    K = kp_total // p if K is None else min(K, kp_total // p)
    basesT = _to_dim_major(bases, K * p)
    if mesh is not None:
        basesT = _shard_cols(basesT, mesh)
    return _deim_blocks_jit(basesT, p, K)


@partial(jax.jit, static_argnames=("p", "K"))
def _deim_blocks_jit(basesT, p, K):
    """One-dispatch kernel on dim-major basesT (d, ep, Kp)."""
    d = basesT.shape[0]
    Kp = K * p

    def step(carry, k):
        rows, Vsel, Minv = carry  # (Kp,) int32; (d, Kp, Kp); (d, Kp, Kp)
        vk = jax.lax.dynamic_slice_in_dim(basesT, k * p, p,
                                          axis=2)          # (d, ep, p)
        mask = jnp.arange(Kp) < k * p
        b = jnp.where(
            mask[None, :, None],
            jax.lax.dynamic_slice_in_dim(Vsel, k * p, p, axis=2),
            0.0)                                            # (d, Kp, p)
        x = jnp.einsum("dab,dbp->dap", Minv, b)             # (d, Kp, p)
        c = jnp.einsum("dek,dkp->dep", basesT, x)           # (d, ep, p)
        r = jnp.where(k == 0, vk, c - vk)
        # reference convention (constraintsComponents.py:772-774): argmax
        # over ROW energy, the winning row's element contributes its block
        alpha = jnp.argmax((r ** 2).sum(axis=(0, 2))) // p
        new_rows = (alpha * p + jnp.arange(p)).astype(rows.dtype)
        rows = jax.lax.dynamic_update_slice(rows, new_rows, (k * p,))
        newV = basesT[:, new_rows, :]                       # (d, p, Kp)
        Vsel = jax.lax.dynamic_update_slice(Vsel, newV, (0, k * p, 0))
        for j in range(p):
            q = k * p + j
            maskq = jnp.arange(Kp) < q
            b_vec = jnp.where(
                maskq[None, :],
                jax.lax.dynamic_slice_in_dim(
                    Vsel, q, 1, axis=2)[..., 0], 0.0)       # (d, Kp)
            c_vec = jnp.where(maskq[None, :], newV[:, j, :], 0.0)
            e_val = jax.lax.dynamic_slice_in_dim(
                newV[:, j, :], q, 1, axis=1)                # (d, 1)
            Minv = _border_update(Minv, b_vec, c_vec, e_val, q, Kp)
        return (rows, Vsel, Minv), alpha

    rows0 = jnp.zeros(Kp, dtype=jnp.int32)
    Vsel0 = jnp.zeros((d, Kp, Kp), dtype=basesT.dtype)
    Minv0 = jnp.broadcast_to(jnp.eye(Kp, dtype=basesT.dtype)[None],
                             (d, Kp, Kp))
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
