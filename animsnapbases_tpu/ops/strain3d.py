"""Entry-wise (Mosaic-safe) 3x3 strain projections.

For Pallas TPU kernels every element's 3x3 matrices are carried as separate
component arrays (any shape, typically (1, m) rows) — no gather/scatter, no
LAPACK, no trig: cyclic Jacobi with branch-free rotations, plus a
rotation-parametrized SVD  F = Û diag(σ0, σ1, t2) Vᵀ  with
det(Û) = det(V) = +1 (t2 carries the sign of det F).  In that basis both
PD projections lose all sign logic:

* tet strain clamp (ref Constraint_projections.py:534-554, including the
  det<0 handling):   Fhat = Û diag(clip σ0, clip σ1, clip σ2) Vᵀ
* polar rotation (ref :669-687 with its det fix):   R = Û Vᵀ

because the reference's inversion flip exactly re-signs the third mode into
the nearest-non-inverted / nearest-rotation target, which is what the
det-+1 parametrization produces natively.

Matrices are tuples of 9 entry arrays in row-major order
(m00, m01, m02, m10, m11, m12, m20, m21, m22).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-30


def _rotation(app, aqq, apq):
    """Branch-free Jacobi rotation (c, s); sign(0) treated as +1."""
    tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < _EPS, 1.0, apq))
    sgn = jnp.where(tau >= 0, 1.0, -1.0)
    t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.abs(apq) < _EPS, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    return c, t * c


def eigh3_entries(a00, a01, a02, a11, a12, a22, sweeps: int = 5):
    """Cyclic Jacobi on symmetric entries.  Returns
    ((w0, w1, w2), V entries (9,)) with V accumulated from rotations
    (det V = +1), eigenpairs unsorted."""
    one = jnp.ones_like(a00)
    zero = jnp.zeros_like(a00)
    v = [one, zero, zero, zero, one, zero, zero, zero, one]

    for _ in range(sweeps):
        # rotation (0, 1)
        c, s = _rotation(a00, a11, a01)
        a00, a11, t01 = (c * c * a00 - 2 * c * s * a01 + s * s * a11,
                         s * s * a00 + 2 * c * s * a01 + c * c * a11,
                         zero)
        a02, a12 = c * a02 - s * a12, s * a02 + c * a12
        a01 = t01
        for i in (0, 1, 2):
            vp, vq = v[3 * i + 0], v[3 * i + 1]
            v[3 * i + 0], v[3 * i + 1] = c * vp - s * vq, s * vp + c * vq

        # rotation (0, 2)
        c, s = _rotation(a00, a22, a02)
        a00, a22, t02 = (c * c * a00 - 2 * c * s * a02 + s * s * a22,
                         s * s * a00 + 2 * c * s * a02 + c * c * a22,
                         zero)
        a01, a12 = c * a01 - s * a12, s * a01 + c * a12
        a02 = t02
        for i in (0, 1, 2):
            vp, vq = v[3 * i + 0], v[3 * i + 2]
            v[3 * i + 0], v[3 * i + 2] = c * vp - s * vq, s * vp + c * vq

        # rotation (1, 2)
        c, s = _rotation(a11, a22, a12)
        a11, a22, t12 = (c * c * a11 - 2 * c * s * a12 + s * s * a22,
                         s * s * a11 + 2 * c * s * a12 + c * c * a22,
                         zero)
        a01, a02 = c * a01 - s * a02, s * a01 + c * a02
        a12 = t12
        for i in (0, 1, 2):
            vp, vq = v[3 * i + 1], v[3 * i + 2]
            v[3 * i + 1], v[3 * i + 2] = c * vp - s * vq, s * vp + c * vq

    return (a00, a11, a22), tuple(v)


def _swap_cols(w, v, i, j):
    """Compare-swap eigenpair columns i > j by eigenvalue, branch-free.
    A column swap would flip det(V); restoring it by negating one column
    keeps V a rotation."""
    do = w[j] > w[i]

    def sel(a, b):
        return jnp.where(do, b, a)

    w = list(w)
    v = list(v)
    w[i], w[j] = sel(w[i], w[j]), sel(w[j], w[i])
    for r in range(3):
        a, b = v[3 * r + i], v[3 * r + j]
        # swapped column j gets negated to preserve det(V) = +1
        v[3 * r + i], v[3 * r + j] = sel(a, b), sel(b, -a)
    return tuple(w), tuple(v)


def svd3_rotation_basis(f, sweeps: int = 5):
    """Rotation-parametrized SVD of F (9 entry arrays).

    Returns (U entries, (s0, s1, s2), V entries) with s sorted descending and
    NON-NEGATIVE, det(U) = det(V) = +1; the sign of det(F) is absorbed in
    the relation F = U diag(s0, s1, ±s2) V^T (not returned — the PD
    projections don't need it)."""
    f00, f01, f02, f10, f11, f12, f20, f21, f22 = f
    # S = F^T F (symmetric)
    a00 = f00 * f00 + f10 * f10 + f20 * f20
    a01 = f00 * f01 + f10 * f11 + f20 * f21
    a02 = f00 * f02 + f10 * f12 + f20 * f22
    a11 = f01 * f01 + f11 * f11 + f21 * f21
    a12 = f01 * f02 + f11 * f12 + f21 * f22
    a22 = f02 * f02 + f12 * f12 + f22 * f22

    w, v = eigh3_entries(a00, a01, a02, a11, a12, a22, sweeps=sweeps)
    # sorting network for 3 (descending)
    w, v = _swap_cols(w, v, 0, 1)
    w, v = _swap_cols(w, v, 1, 2)
    w, v = _swap_cols(w, v, 0, 1)

    s0 = jnp.sqrt(jnp.maximum(w[0], 0.0))
    s1 = jnp.sqrt(jnp.maximum(w[1], 0.0))
    s2 = jnp.sqrt(jnp.maximum(w[2], 0.0))

    v00, v01, v02, v10, v11, v12, v20, v21, v22 = v
    # B = F V; columns b_j = sigma_j * u_j (third column signed)
    b00 = f00 * v00 + f01 * v10 + f02 * v20
    b10 = f10 * v00 + f11 * v10 + f12 * v20
    b20 = f20 * v00 + f21 * v10 + f22 * v20
    b01 = f00 * v01 + f01 * v11 + f02 * v21
    b11 = f10 * v01 + f11 * v11 + f12 * v21
    b21 = f20 * v01 + f21 * v11 + f22 * v21

    inv0 = 1.0 / jnp.maximum(s0, _EPS)
    u00, u10, u20 = b00 * inv0, b10 * inv0, b20 * inv0
    # Gram-Schmidt the second column
    dot01 = u00 * b01 + u10 * b11 + u20 * b21
    r01, r11, r21 = b01 - dot01 * u00, b11 - dot01 * u10, b21 - dot01 * u20
    n1 = jnp.sqrt(r01 * r01 + r11 * r11 + r21 * r21)
    inv1 = 1.0 / jnp.maximum(n1, _EPS)
    u01, u11, u21 = r01 * inv1, r11 * inv1, r21 * inv1
    # third column: right-handed completion (det(U) = +1 by construction)
    u02 = u10 * u21 - u20 * u11
    u12 = u20 * u01 - u00 * u21
    u22 = u00 * u11 - u10 * u01

    U = (u00, u01, u02, u10, u11, u12, u20, u21, u22)
    return U, (s0, s1, s2), v


def _compose_u_diag_vt(U, d, V):
    """Entries of U diag(d) V^T."""
    u00, u01, u02, u10, u11, u12, u20, u21, u22 = U
    v00, v01, v02, v10, v11, v12, v20, v21, v22 = V
    d0, d1, d2 = d
    out = []
    u_rows = ((u00, u01, u02), (u10, u11, u12), (u20, u21, u22))
    v_rows = ((v00, v01, v02), (v10, v11, v12), (v20, v21, v22))
    for i in range(3):
        for j in range(3):
            out.append(u_rows[i][0] * d0 * v_rows[j][0]
                       + u_rows[i][1] * d1 * v_rows[j][1]
                       + u_rows[i][2] * d2 * v_rows[j][2])
    return tuple(out)


def tet_strain_fhat(f, smin: float, smax: float, sweeps: int = 5):
    """Clamped deformation gradient Fhat (9 entries); equivalent to the
    reference's svd-clamp with inversion handling."""
    U, (s0, s1, s2), V = svd3_rotation_basis(f, sweeps=sweeps)
    d = (jnp.clip(s0, smin, smax), jnp.clip(s1, smin, smax),
         jnp.clip(s2, smin, smax))
    return _compose_u_diag_vt(U, d, V)


def polar_rotation(f, sweeps: int = 5):
    """Closest rotation R = Û V^T (9 entries); equivalent to the reference's
    polar extraction with det fix."""
    U, _, V = svd3_rotation_basis(f, sweeps=sweeps)
    one = jnp.ones_like(f[0])
    return _compose_u_diag_vt(U, (one, one, one), V)
