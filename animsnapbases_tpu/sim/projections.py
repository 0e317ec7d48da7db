"""Batched constraint-projection kernels (the PD "local step").

Each kernel maps positions q (N, 3) to the stacked projections p (e*p, 3) of
one constraint group — the quantity the reference computes one constraint at
a time in ``get_pi`` (``Constraint_projections.py``).  All element loops are
vmapped; the tiny SVDs use the branch-free Jacobi routines in
:mod:`animsnapbases_tpu.ops.svd3`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from animsnapbases_tpu.ops.segment import coo_matvec_cols
from animsnapbases_tpu.ops.svd3 import polar_rotation3x3, svd2x2, svd3x3

_EPS = 1e-30


# ---------------------------------------------------------------------------
# per-group stacked projections
# ---------------------------------------------------------------------------

def positional_p(targets: jnp.ndarray) -> jnp.ndarray:
    """Positional constraints project to their (possibly animated) targets;
    the target array (e, 3) is computed host-side per frame."""
    return targets


def verts_bending_p(q: jnp.ndarray, data: dict) -> jnp.ndarray:
    """Mean-curvature bending projection per constrained vertex
    (ref :197-215)."""
    centers = data["indices"]
    nbrs = data["neighbors"]
    cots = data["cotans"]
    mask = data["mask"]
    rest = data["rest_curvature"]
    tri_n = data["tri_normal"]
    dot_n = data["dot_with_normal"]

    qc = q[centers]                              # (e, 3)
    qn = q[nbrs]                                 # (e, D, 3)
    diff = (qc[:, None, :] - qn) * (cots * mask)[:, :, None]
    star_sum = diff.sum(axis=1)                  # (e, 3)
    norm = jnp.linalg.norm(star_sum, axis=1)

    correction = jnp.where(
        (norm < 1e-10)[:, None],
        tri_n * rest[:, None],
        star_sum * (rest / jnp.maximum(norm, _EPS))[:, None])

    if data.get("prevent_bending_flips", True):
        dots = (tri_n * correction).sum(axis=1)
        flip = (norm > 1e-5) & (dots * dot_n < 0)
        correction = jnp.where(flip[:, None], -correction, correction)
    return correction                            # (e, 3) == (e*p, 3), p=1


def edge_spring_p(q: jnp.ndarray, data: dict) -> jnp.ndarray:
    """Spring projection midpoint difference (ref :291-312)."""
    edges = data["edges"]
    rest = data["rest_length"]
    p1 = q[edges[:, 0]]
    p2 = q[edges[:, 1]]
    spring = p2 - p1
    length = jnp.linalg.norm(spring, axis=1)
    n = spring / jnp.maximum(length, _EPS)[:, None]
    delta = 0.5 * (length - rest)
    pi = 0.5 * spring - delta[:, None] * n
    return jnp.where((length > 0)[:, None], pi, 0.0)


def tris_strain_p(q: jnp.ndarray, data: dict) -> jnp.ndarray:
    """2D-projected deformation-gradient sigma clamp (ref :407-426).
    Returns (e*2, 3)."""
    faces = data["faces"]
    P = data["P"]                                 # (e, 3, 2)
    DmInv = data["DmInv"]                         # (e, 2, 2)
    smin, smax = data["sigma_min"], data["sigma_max"]

    q1 = q[faces[:, 0]]
    Ds = jnp.stack([q[faces[:, 1]] - q1, q[faces[:, 2]] - q1], axis=2)
    Ds2d = jnp.einsum("eij,eik->ejk", P, Ds)      # P^T Ds (e, 2, 2)
    F = jnp.einsum("eij,ejk->eik", Ds2d, DmInv)

    def proj(Fm):
        U, s, Vt = svd2x2(Fm)
        s = jnp.clip(s, smin, smax)
        return (U * s[None, :]) @ Vt

    Fhat = jax.vmap(proj)(F)                      # (e, 2, 2)
    pi = jnp.einsum("eij,ejk->eki", P, Fhat)      # (P @ Fhat)^T -> (e, 2, 3)
    return pi.reshape(-1, 3)


def tets_strain_p(q: jnp.ndarray, data: dict) -> jnp.ndarray:
    """3D deformation-gradient sigma clamp with inversion handling
    (ref :534-554).  Returns (e*3, 3)."""
    el = data["elements"]
    DmInv = data["DmInv"]
    smin, smax = data["sigma_min"], data["sigma_max"]

    q4 = q[el[:, 3]]
    Ds = jnp.stack([q[el[:, 0]] - q4, q[el[:, 1]] - q4, q[el[:, 2]] - q4],
                   axis=2)
    F = jnp.einsum("eij,ejk->eik", Ds, DmInv)

    def proj(Fm):
        U, s, Vt = svd3x3(Fm)
        s = jnp.clip(s, smin, smax)
        s = s.at[2].multiply(jnp.where(jnp.linalg.det(Fm) < 0, -1.0, 1.0))
        return (U * s[None, :]) @ Vt

    Fhat = jax.vmap(proj)(F)                      # (e, 3, 3) rows stacked
    return Fhat.reshape(-1, 3)


def tets_deformation_gradient_p(q: jnp.ndarray, data: dict) -> jnp.ndarray:
    """Polar rotation extraction R = U V^T; projection is R^T (ref :669-687).
    Returns (e*3, 3)."""
    el = data["elements"]
    DmInv = data["DmInv"]
    q4 = q[el[:, 3]]
    Ds = jnp.stack([q[el[:, 0]] - q4, q[el[:, 1]] - q4, q[el[:, 2]] - q4],
                   axis=2)
    F = jnp.einsum("eij,ejk->eik", Ds, DmInv)
    R = jax.vmap(polar_rotation3x3)(F)
    return jnp.swapaxes(R, 1, 2).reshape(-1, 3)


PROJECTION_KERNELS = {
    "verts_bending": verts_bending_p,
    "edge_spring": edge_spring_p,
    "tris_strain": tris_strain_p,
    "tets_strain": tets_strain_p,
    "tets_deformation_gradient": tets_deformation_gradient_p,
}


def group_rhs(st_rows, st_cols, st_vals, p_stacked, n_verts):
    """S^T @ p as gather + segment-sum."""
    return coo_matvec_cols(st_rows, st_cols, st_vals, p_stacked, n_verts)
