"""Numpy oracles of the reference constraint math (get_pi / S^T columns /
LHS triplets), one constraint at a time, for parity-testing the batched
kernels."""

import numpy as np


def edge_spring_pi(q, v0, v1, rest):
    p1, p2 = q[v0], q[v1]
    spring = p2 - p1
    length = np.linalg.norm(spring)
    if length == 0:
        return np.zeros(3)
    n = spring / length
    delta = 0.5 * (length - rest)
    pi1 = p1 + delta * n
    pi2 = p2 - delta * n
    return 0.5 * (pi2 - pi1)


def tri_strain_pi(q, tri, P, DmInv, smin, smax):
    q1, q2, q3 = q[tri[0]], q[tri[1]], q[tri[2]]
    Ds = np.column_stack([q2 - q1, q3 - q1])
    Ds2d = P.T @ Ds
    U, s, Vt = np.linalg.svd(Ds2d @ DmInv)
    s = np.clip(s, smin, smax)
    Fhat = U @ np.diag(s) @ Vt
    return (P @ Fhat).T                     # (2, 3)


def tet_strain_pi(q, tet, DmInv, smin, smax):
    q1, q2, q3, q4 = (q[i] for i in tet)
    Ds = np.column_stack([q1 - q4, q2 - q4, q3 - q4])
    F = Ds @ DmInv
    U, s, Vt = np.linalg.svd(F)
    s = np.clip(s, smin, smax)
    if np.linalg.det(F) < 0:
        s[2] = -s[2]
    return U @ np.diag(s) @ Vt              # (3, 3)


def tet_defgrad_pi(q, tet, DmInv):
    q1, q2, q3, q4 = (q[i] for i in tet)
    Ds = np.column_stack([q1 - q4, q2 - q4, q3 - q4])
    F = Ds @ DmInv
    U, _, Vt = np.linalg.svd(F)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R[:, 2] *= -1
    return R.T


def bending_pi(q, center, nbrs, cotans, rest_curv, tri_normal,
               dot_with_normal, prevent_flips=True):
    star_sum = np.zeros(3)
    for nb, w in zip(nbrs, cotans):
        star_sum += (q[center] - q[nb]) * w
    norm = np.linalg.norm(star_sum)
    if norm < 1e-10:
        correction = tri_normal * rest_curv
    else:
        correction = star_sum * (rest_curv / norm)
    if prevent_flips:
        d = tri_normal @ correction
        if norm > 1e-5 and d * dot_with_normal < 0:
            correction = -correction
    return correction


def tet_rest(positions, tet):
    p1, p2, p3, p4 = (positions[i] for i in tet)
    Dm = np.column_stack([p1 - p4, p2 - p4, p3 - p4])
    return np.linalg.inv(Dm), np.linalg.det(Dm) / 6.0


def tri_rest(positions, tri):
    p1, p2, p3 = (positions[i] for i in tri)
    e1, e2 = p2 - p1, p3 - p1
    P = np.zeros((3, 2))
    P[:, 0] = e1 / np.linalg.norm(e1)
    P[:, 1] = e2 - (e2 @ P[:, 0]) * P[:, 0]
    P[:, 1] /= np.linalg.norm(P[:, 1])
    rest2d = P.T @ np.column_stack([e1, e2])
    return P, np.linalg.inv(rest2d), 0.5 * np.linalg.det(rest2d)


def tet_lhs_triplets(tet, DmInv, V0, wi):
    G = np.zeros((4, 3))
    G[:3, :] = DmInv
    G[3, :] = -G[:3, :].sum(axis=0)
    K = np.kron(G @ G.T, np.eye(3)) * (wi * abs(V0))
    out = []
    for i in range(12):
        for j in range(12):
            if abs(K[i, j]) > 1e-12:
                out.append((3 * tet[i // 3] + i % 3,
                            3 * tet[j // 3] + j % 3, K[i, j]))
    return out


def tri_deformation_operator(DmInv):
    """Corrected per-triangle operator B (3 verts, 2): since
    Ds = [q2-q1, q3-q1], v2 gets DmInv row 0, v3 row 1, v1 the negative sum
    (the reference is off by one vertex; see groups.build_tris_strain)."""
    B = np.empty((3, 2))
    B[1] = DmInv[0]
    B[2] = DmInv[1]
    B[0] = -(DmInv[0] + DmInv[1])
    return B


def tri_lhs_triplets(tri, DmInv, A0, wi):
    B = tri_deformation_operator(DmInv)
    K = np.kron(B @ B.T, np.eye(3)) * (wi * abs(A0))
    out = []
    for i in range(9):
        for j in range(9):
            if abs(K[i, j]) > 1e-12:
                out.append((3 * tri[i // 3] + i % 3,
                            3 * tri[j // 3] + j % 3, K[i, j]))
    return out
