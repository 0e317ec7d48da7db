"""Closed-form 2x2 SVD sigma-clamp via rotation angles.

For the tri-strain projection the only thing needed from the SVD is
``Fhat = U clip(S) V^T``.  The rotation-angle form computes it in ~25
elementwise ops (2 atan2, 4 sincos) with no Gram-Schmidt or branches —
ideal for fusing entire batches into a single VPU kernel (both in XLA and
inside Pallas).

Convention note: for exactly rank-deficient F (sy == 0) the null-space
orientation of the SVD is arbitrary; this form picks sign(0) = +1.  The PD
strain clamp operates near F ~ I where this never matters.
"""

from __future__ import annotations

import jax.numpy as jnp


def _half_angle(c2, s2):
    """(cos x, sin x) from (cos 2x, sin 2x), branch-free and Mosaic-friendly
    (no trig primitives).  Picks x in (-pi/2, pi/2] (cos x >= 0) — the
    half-angle branch the atan2 formulation also lands in."""
    cx = jnp.sqrt(jnp.maximum((1.0 + c2) * 0.5, 0.0))
    # sin x = sin 2x / (2 cos x) when cos x isn't tiny, else |sin x| =
    # sqrt((1-c2)/2) with the sign of sin 2x (sign(0) treated as +)
    sgn = jnp.where(s2 >= 0, 1.0, -1.0)
    alt = sgn * jnp.sqrt(jnp.maximum((1.0 - c2) * 0.5, 0.0))
    safe = cx > 1e-4
    sx = jnp.where(safe, s2 / jnp.maximum(2.0 * cx, 1e-30), alt)
    return cx, sx


def clamped_fhat_2x2(a, b, c, d, smin: float, smax: float):
    """Entries of Fhat = U clip(Sigma) V^T for F = [[a, b], [c, d]],
    elementwise over arrays of any shape.  Returns (f00, f01, f10, f11).

    Trig-free: the U/V rotation sines/cosines come from half-angle
    identities on the algebraic (cos, sin) pairs, so the whole clamp lowers
    to sqrt/mul/select — valid inside Pallas TPU kernels."""
    E = (a + d) * 0.5
    Fv = (a - d) * 0.5
    G = (c + b) * 0.5
    H = (c - b) * 0.5
    Q = jnp.sqrt(E * E + H * H)
    R = jnp.sqrt(Fv * Fv + G * G)
    sx = Q + R
    sy = Q - R                       # signed; negative iff det(F) < 0

    # (cos a1, sin a1) = (Fv, G)/R ; (cos a2, sin a2) = (E, H)/Q.  The half
    # angles a_i/2 lie in (-pi/2, pi/2] (cos >= 0), which is exactly the
    # branch _half_angle returns — so the results are exact, and the angle
    # sums below carry no wrap ambiguity.
    invQ = 1.0 / jnp.maximum(Q, 1e-30)
    invR = 1.0 / jnp.maximum(R, 1e-30)
    ok_q = Q > 1e-30
    ok_r = R > 1e-30
    ca1 = jnp.where(ok_r, Fv * invR, 1.0)
    sa1 = jnp.where(ok_r, G * invR, 0.0)
    ca2 = jnp.where(ok_q, E * invQ, 1.0)
    sa2 = jnp.where(ok_q, H * invQ, 0.0)
    c1, s1 = _half_angle(ca1, sa1)     # psi1 = a1/2
    c2, s2_ = _half_angle(ca2, sa2)    # psi2 = a2/2
    # phi = psi2 + psi1 ; theta = psi1 - psi2
    cp = c2 * c1 - s2_ * s1
    sp = s2_ * c1 + c2 * s1
    ct = c1 * c2 + s1 * s2_
    st = s1 * c2 - c1 * s2_

    shx = jnp.clip(sx, smin, smax)
    sgn = jnp.where(sy >= 0, 1.0, -1.0)
    shy = sgn * jnp.clip(jnp.abs(sy), smin, smax)
    f00 = shx * cp * ct + shy * sp * st
    f01 = shx * cp * st - shy * sp * ct
    f10 = shx * sp * ct - shy * cp * st
    f11 = shx * sp * st + shy * cp * ct
    return f00, f01, f10, f11
