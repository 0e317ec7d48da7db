"""Volumetric utilities: generalized winding numbers and surface
tetrahedralization.

Native replacements for the reference's libigl/tetgen calls
(``projective_dynamics/geometry.py:76-98``,
``Constraint_projections.py:692-713``): the winding number is the exact
solid-angle sum (Jacobson et al. 2013), fully vectorized; tetrahedralization
uses Delaunay of the surface vertices filtered by winding number of the tet
barycenters.  Unlike tetgen this inserts no Steiner points, so element
quality is lower on thin geometry — adequate for the procedural models the
demos tetrahedralize (boxes, bars)."""

from __future__ import annotations

import numpy as np


def winding_number(V: np.ndarray, F: np.ndarray,
                   points: np.ndarray) -> np.ndarray:
    """Generalized winding number of ``points`` (m, 3) w.r.t. the closed
    triangle mesh (V, F).  ~1 inside, ~0 outside."""
    V = np.asarray(V, dtype=float)
    F = np.asarray(F, dtype=np.int64)
    P = np.atleast_2d(np.asarray(points, dtype=float))

    # solid angle of each triangle as seen from each point
    a = V[F[:, 0]][None, :, :] - P[:, None, :]     # (m, t, 3)
    b = V[F[:, 1]][None, :, :] - P[:, None, :]
    c = V[F[:, 2]][None, :, :] - P[:, None, :]
    la = np.linalg.norm(a, axis=2)
    lb = np.linalg.norm(b, axis=2)
    lc = np.linalg.norm(c, axis=2)
    num = np.einsum("mtj,mtj->mt", a, np.cross(b, c))
    den = (la * lb * lc + np.einsum("mtj,mtj->mt", a, b) * lc
           + np.einsum("mtj,mtj->mt", b, c) * la
           + np.einsum("mtj,mtj->mt", c, a) * lb)
    omega = 2.0 * np.arctan2(num, den)
    return omega.sum(axis=1) / (4.0 * np.pi)


def orient_faces_consistently(F: np.ndarray) -> np.ndarray:
    """Propagate a consistent orientation over a manifold triangle mesh by
    BFS over shared edges (two adjacent faces are consistent iff they
    traverse their shared edge in opposite directions).  The global sign
    stays ambiguous — pair with |winding number| for inside tests."""
    F = np.asarray(F, dtype=np.int64).copy()
    from collections import defaultdict, deque

    edge_faces = defaultdict(list)
    for t, tri in enumerate(F):
        for k in range(3):
            e = (tri[k], tri[(k + 1) % 3])
            edge_faces[tuple(sorted(e))].append(t)

    visited = np.zeros(len(F), dtype=bool)
    for start in range(len(F)):
        if visited[start]:
            continue
        visited[start] = True
        queue = deque([start])
        while queue:
            t = queue.popleft()
            tri = F[t]
            directed = {(tri[k], tri[(k + 1) % 3]) for k in range(3)}
            for k in range(3):
                key = tuple(sorted((tri[k], tri[(k + 1) % 3])))
                for nb in edge_faces[key]:
                    if nb == t or visited[nb]:
                        continue
                    nb_tri = F[nb]
                    nb_directed = {(nb_tri[j], nb_tri[(j + 1) % 3])
                                   for j in range(3)}
                    # same direction on the shared edge => inconsistent
                    if directed & nb_directed:
                        F[nb] = nb_tri[::-1]
                    visited[nb] = True
                    queue.append(nb)
    return F


def tetrahedralize(V: np.ndarray, F: np.ndarray,
                   inside_threshold: float = 0.5):
    """Tetrahedralize the volume bounded by surface (V, F):
    Delaunay of the vertices, keeping tets whose barycenter has winding
    number > threshold.  Returns (TV, IT, F_boundary) with the same
    reversed-winding convention as the reference wrapper."""
    from scipy.spatial import Delaunay

    from animsnapbases_tpu.geometry.mesh import boundary_facets

    V = np.asarray(V, dtype=float)
    F = orient_faces_consistently(F)
    tri = Delaunay(V)
    TT = tri.simplices.astype(np.int64)
    TT = TT[:, ::-1]

    bc = V[TT].mean(axis=1)
    w = winding_number(V, F, bc)
    IT = TT[np.abs(w) > inside_threshold]

    faces = boundary_facets(IT)
    return V, IT, faces[:, ::-1]
