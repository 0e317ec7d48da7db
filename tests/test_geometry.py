import numpy as np
import pytest

from animsnapbases_tpu.geometry import (
    unique_edges, tet_edges, boundary_facets, largest_component_mask,
    filter_reindex, vertex_normals, triangle_areas, elements_per_vertex,
    padded_incidence, build_vertex_stars,
    vertex_masses_voronoi, vertex_masses_barycentric_tet,
    lumped_mass_normalized, tet_element_masses, tri_element_masses,
    edge_element_masses, cotan_laplacian, GeodesicDistance,
    rigid_procrustes, align_animation, bar_model, cloth_model,
)
from animsnapbases_tpu.geometry.mesh import vertex_star_vertices


TET = np.array([[0, 1, 2, 3]])
TET_VERTS = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])


def test_unique_edges():
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    e = unique_edges(faces)
    expected = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [2, 3]])
    np.testing.assert_array_equal(e, expected)


def test_tet_edges():
    e = tet_edges(TET)
    assert e.shape == (6, 2)
    assert (e[:, 0] < e[:, 1]).all()


def test_boundary_facets_single_tet():
    f = boundary_facets(TET)
    assert f.shape == (4, 3)
    # all 4 faces are boundary for a single tet
    keys = {tuple(sorted(t)) for t in f}
    assert keys == {(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)}


def test_boundary_facets_two_tets_share_face():
    tets = np.array([[0, 1, 2, 3], [1, 2, 3, 4]])
    f = boundary_facets(tets)
    keys = {tuple(sorted(t)) for t in f}
    assert (1, 2, 3) not in keys  # interior face removed
    assert len(f) == 6


def test_largest_component_and_reindex():
    # two triangles, disconnected; second component bigger (4 verts via 2 tris)
    faces = np.array([[0, 1, 2], [3, 4, 5], [4, 5, 6]])
    mask = largest_component_mask(7, faces)
    np.testing.assert_array_equal(mask, [False, False, False, True, True, True, True])
    kept_faces = faces[mask[faces].all(axis=1)]
    re = filter_reindex(mask, kept_faces)
    np.testing.assert_array_equal(re, [[0, 1, 2], [1, 2, 3]])


def test_triangle_areas_and_normals():
    verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    faces = np.array([[0, 1, 2]])
    np.testing.assert_allclose(triangle_areas(verts, faces), [0.5])
    n = vertex_normals(verts, faces)
    np.testing.assert_allclose(n, np.tile([0, 0, 1.0], (3, 1)))


def test_elements_per_vertex_matches_reference_semantics():
    tets = np.array([[0, 1, 2, 3], [2, 3, 4, 5], [4, 5, 6, 7]])
    assert elements_per_vertex([2], tets) == [0, 1]
    assert elements_per_vertex([0, 7], tets) == [0, 2]


def test_vertex_star_vertices():
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    assert vertex_star_vertices(0, faces) == [0, 1, 2, 3]
    assert vertex_star_vertices(1, faces) == [0, 1, 2]


def test_padded_incidence():
    tets = np.array([[0, 1, 2, 3], [2, 3, 4, 5]])
    table, counts = padded_incidence(6, tets)
    assert counts.tolist() == [1, 1, 2, 2, 1, 1]
    assert table[2].tolist() == [0, 1]
    assert table[0].tolist() == [0, -1]


def test_vertex_stars_closed_fan():
    # square split in two triangles: diagonal edge (0,2) has two triangles
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    stars = build_vertex_stars(4, faces)
    diag = [e for e in stars[0] if e.v2 == 2][0]
    assert diag.t1 == 0 and diag.t2 == 1
    assert {diag.v_other_t1, diag.v_other_t2} == {1, 3}
    bound = [e for e in stars[0] if e.v2 == 1][0]
    assert bound.t2 == -1


def test_voronoi_masses_equilateral():
    # equilateral triangle: each corner gets area/3 (non-obtuse, symmetric)
    verts = np.array([[0.0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0]])
    faces = np.array([[0, 1, 2]])
    m = vertex_masses_voronoi(verts, faces)
    area = triangle_areas(verts, faces)[0]
    np.testing.assert_allclose(m, area / 3, rtol=1e-12)
    np.testing.assert_allclose(m.sum(), area, rtol=1e-12)


def test_voronoi_masses_obtuse_fallback():
    verts = np.array([[0.0, 0, 0], [4, 0, 0], [2, 0.2, 0]])  # obtuse at v2
    faces = np.array([[0, 1, 2]])
    m = vertex_masses_voronoi(verts, faces)
    area = triangle_areas(verts, faces)[0]
    np.testing.assert_allclose(m, [area / 4, area / 4, area / 2], rtol=1e-12)


def test_tet_masses():
    m = vertex_masses_barycentric_tet(TET_VERTS, TET)
    vol = 1.0 / 6.0
    np.testing.assert_allclose(m, vol / 4)
    mn = lumped_mass_normalized(TET_VERTS, TET)
    np.testing.assert_allclose(mn.sum(), 1.0)


def test_element_masses():
    vm = np.array([1.0, 2.0, 3.0, 4.0])
    em = tet_element_masses(vm, TET, 3)
    np.testing.assert_allclose(em, [10.0] * 3)
    tm = tri_element_masses(vm, np.array([[0, 1, 2]]), 2)
    np.testing.assert_allclose(tm, [6.0, 6.0])
    edm = edge_element_masses(vm, np.array([[0, 3]]), 1)
    np.testing.assert_allclose(edm, [5.0])


def test_cotan_laplacian_constant_nullspace():
    verts, faces = cloth_model(5, 5)
    L, VA = cotan_laplacian(verts, faces)
    np.testing.assert_allclose(L @ np.ones(len(verts)), 0, atol=1e-12)
    # symmetric
    np.testing.assert_allclose((L - L.T).toarray(), 0, atol=1e-12)
    # linear functions are harmonic on interior verts of a flat mesh
    x = verts[:, 0]
    lx = L @ x
    interior = np.array([i for i in range(len(verts))
                         if 0 < verts[i, 0] < 4 and 0 < verts[i, 1] < 4])
    np.testing.assert_allclose(lx[interior], 0, atol=1e-10)


def test_geodesics_on_flat_grid():
    verts, faces = cloth_model(15, 15)
    gd = GeodesicDistance(verts, faces)
    phi = gd(0)
    assert phi.shape == (225,)
    assert phi[0] == pytest.approx(phi.min())
    # distance should grow monotonically-ish with euclidean distance on a plane
    eu = np.linalg.norm(verts - verts[0], axis=1)
    corr = np.corrcoef(phi, eu)[0, 1]
    assert corr > 0.99
    # roughly metric: far corner ~ sqrt(2)*14
    assert abs(phi[-1] - eu[-1]) / eu[-1] < 0.15


def test_rigid_procrustes_recovers_rotation():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3))
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1.0]])
    t = np.array([1.0, -2.0, 0.5])
    moved = pts @ R.T + t
    T = np.asarray(rigid_procrustes(moved, pts, rigid=True))
    np.testing.assert_allclose(T[:3, :3] @ R, np.eye(3), atol=1e-8)
    recovered = moved @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(recovered, pts, atol=1e-8)


def test_align_animation():
    rng = np.random.default_rng(1)
    base = rng.normal(size=(30, 3))
    frames = [base]
    for k in range(1, 4):
        th = 0.2 * k
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        frames.append(base @ R.T + k)
    verts = np.stack(frames)
    aligned = align_animation(verts, rigid=True)
    for f in range(4):
        np.testing.assert_allclose(aligned[f], base, atol=1e-4)
    # centered mode: removes translation only
    centered = align_animation(verts, rigid=False)
    np.testing.assert_allclose(centered[0], base, atol=1e-5)
    assert not np.allclose(centered[2], base, atol=1e-3)  # rotation remains


def test_bar_model_matches_reference_shapes():
    V, T, F, Vs = bar_model(4, 3, 3)
    assert V.shape == (36, 3)
    assert T.shape == ((3) * (2) * (2) * 5, 4)
    # tet volumes nonzero
    d = V[T]
    vol = np.einsum("ij,ij->i",
                    np.cross(d[:, 1] - d[:, 0], d[:, 2] - d[:, 0]),
                    d[:, 3] - d[:, 0]) / 6.0
    assert (np.abs(vol) > 1e-12).all()
    # five-tet decomposition covers each unit cell exactly
    np.testing.assert_allclose(np.abs(vol).sum(), 3 * 2 * 2, rtol=1e-12)


def test_cloth_model():
    V, F = cloth_model(3, 4)
    assert V.shape == (12, 3)
    assert F.shape == (2 * 2 * 3, 3)
    np.testing.assert_allclose(triangle_areas(V, F).sum(), 2 * 3, rtol=1e-12)
