"""Procedural test meshes: tetrahedral bar and cloth grid.

Deterministic fixtures matching the reference generators
(``projective_dynamics/geometry.py:129-227``) so recorded snapshots and
constraint orderings line up across implementations.
"""

from __future__ import annotations

import numpy as np

from animsnapbases_tpu.geometry.mesh import boundary_facets


def bar_model(width: int, height: int, depth: int):
    """Tetrahedral bar on a vertex grid; 5 tets per cell with parity-alternated
    decomposition.  Returns (V, T, F, V_surface) exactly like the reference
    (including its reversed winding of T and F)."""
    V = np.zeros((width * height * depth, 3))
    idx = lambda i, j, k: i * height * depth + j * depth + k  # noqa: E731
    for i in range(width):
        for j in range(height):
            for k in range(depth):
                V[idx(i, j, k)] = (float(i), float(j), float(k))

    tets = []
    for i in range(width - 1):
        for j in range(height - 1):
            for k in range(depth - 1):
                p0 = idx(i, j, k)
                p1 = idx(i + 1, j, k)
                p2 = idx(i + 1, j + 1, k)
                p3 = idx(i, j + 1, k)
                p4 = idx(i, j, k + 1)
                p5 = idx(i + 1, j, k + 1)
                p6 = idx(i + 1, j + 1, k + 1)
                p7 = idx(i, j + 1, k + 1)
                if (i + j + k) % 2 == 1:
                    tets += [[p1, p0, p5, p2], [p5, p2, p7, p6],
                             [p7, p0, p5, p4], [p2, p0, p7, p3],
                             [p5, p0, p7, p2]]
                else:
                    tets += [[p3, p1, p4, p0], [p6, p1, p3, p2],
                             [p4, p1, p6, p5], [p6, p3, p4, p7],
                             [p3, p1, p6, p4]]
    T = np.asarray(tets, dtype=np.int64)
    F = boundary_facets(T)
    T = T[:, ::-1]
    F = F[:, ::-1]
    surface_idx = np.unique(F.flatten())
    return V, T, F, V[surface_idx]


def cloth_model(rows: int, cols: int):
    """Flat cloth grid in the XY plane; two triangles per cell, reference
    winding. Returns (V, F)."""
    verts = []
    faces = []
    for i in range(rows):
        for j in range(cols):
            verts.append([float(i), float(j), 0.0])
            if i == rows - 1 or j == cols - 1:
                continue
            ll = i * cols + j
            ul = i * cols + (j + 1)
            lr = (i + 1) * cols + j
            ur = (i + 1) * cols + (j + 1)
            faces.append([ll, ur, ul])
            faces.append([ll, lr, ur])
    return np.asarray(verts), np.asarray(faces, dtype=np.int64)


def bar_model_surface_tetrahedralized(width: int, height: int, depth: int):
    """Surface-grid bar fed through tetrahedralization (the reference's
    tetgen-based variant, geometry.py:101-105).  Returns (V, T, F)."""
    from animsnapbases_tpu.geometry.volume import tetrahedralize

    V, F = bar_surface_mesh(width, height, depth)
    return tetrahedralize(V, F)


def bar_surface_mesh(width: int, height: int, depth: int):
    """Surface-only cuboid grid mesh (vertices on the boundary of the grid,
    quads split into triangles) — the input the reference feeds to tetgen."""
    grid = np.array([
        [i, j, k]
        for i in range(width)
        for j in range(height)
        for k in range(depth)
        if i in (0, width - 1) or j in (0, height - 1) or k in (0, depth - 1)
    ], dtype=float)
    lookup = {tuple(p): n for n, p in enumerate(grid)}
    faces = []

    def add_quad(p0, p1, p2, p3):
        faces.append([lookup[tuple(p0)], lookup[tuple(p1)], lookup[tuple(p2)]])
        faces.append([lookup[tuple(p0)], lookup[tuple(p2)], lookup[tuple(p3)]])

    for i in range(width - 1):
        for j in range(height - 1):
            for k in (0, depth - 1):
                quad = [[i, j, k], [i + 1, j, k], [i + 1, j + 1, k], [i, j + 1, k]]
                if all(tuple(map(float, p)) in lookup for p in quad):
                    add_quad(*[np.array(p, dtype=float) for p in quad])
    for i in range(width - 1):
        for k in range(depth - 1):
            for j in (0, height - 1):
                quad = [[i, j, k], [i + 1, j, k], [i + 1, j, k + 1], [i, j, k + 1]]
                if all(tuple(map(float, p)) in lookup for p in quad):
                    add_quad(*[np.array(p, dtype=float) for p in quad])
    for j in range(height - 1):
        for k in range(depth - 1):
            for i in (0, width - 1):
                quad = [[i, j, k], [i, j + 1, k], [i, j + 1, k + 1], [i, j, k + 1]]
                if all(tuple(map(float, p)) in lookup for p in quad):
                    add_quad(*[np.array(p, dtype=float) for p in quad])
    return grid, np.asarray(faces, dtype=np.int64)
