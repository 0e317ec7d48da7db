"""Parity tests of the batched constraint kernels vs per-constraint oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracles_sim as osim
from animsnapbases_tpu.geometry.procedural import bar_model, cloth_model
from animsnapbases_tpu.sim import groups as G
from animsnapbases_tpu.sim import projections as P
from animsnapbases_tpu.sim.solver import build_global_matrix
from animsnapbases_tpu.sim.model import DeformableModel


RNG = np.random.default_rng(0)


def _jd(data):
    return {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
            for k, v in data.items()}


@pytest.fixture(scope="module")
def cloth():
    V, F = cloth_model(5, 5)
    return V, F


@pytest.fixture(scope="module")
def bar():
    V, T, F, _ = bar_model(3, 2, 2)
    return V, T, F


def _deformed(V, scale=0.1, seed=1):
    rng = np.random.default_rng(seed)
    return V + scale * rng.normal(size=V.shape)


def test_edge_spring_parity(cloth):
    V, F = cloth
    g = G.build_edge_spring(G.unique_edges(F) if hasattr(G, "unique_edges")
                            else __import__(
        "animsnapbases_tpu.geometry.mesh", fromlist=["unique_edges"]
    ).unique_edges(F), 2.5, V)
    q = _deformed(V)
    p = np.asarray(P.edge_spring_p(jnp.asarray(q), _jd(g.data)))
    for i, (v0, v1) in enumerate(g.data["edges"]):
        ref = osim.edge_spring_pi(q, v0, v1, g.data["rest_length"][i])
        np.testing.assert_allclose(p[i], ref, atol=1e-10)


def test_tri_strain_parity(cloth):
    V, F = cloth
    g = G.build_tris_strain(F, 1e4, V, 0.95, 1.05)
    q = _deformed(V)
    p = np.asarray(P.tris_strain_p(jnp.asarray(q), _jd(g.data)))
    for i, tri in enumerate(F):
        Pm, DmInv, A0 = osim.tri_rest(V, tri)
        np.testing.assert_allclose(g.data["P"][i], Pm, atol=1e-12)
        np.testing.assert_allclose(g.data["DmInv"][i], DmInv, atol=1e-10)
        assert g.data["A0"][i] == pytest.approx(A0)
        ref = osim.tri_strain_pi(q, tri, Pm, DmInv, 0.95, 1.05)
        np.testing.assert_allclose(p[2 * i:2 * i + 2], ref, atol=1e-8)


def test_tet_strain_parity(bar):
    V, T, F = bar
    g = G.build_tets_strain(T, 1e6, V, 0.99, 1.01)
    q = _deformed(V, scale=0.15)
    p = np.asarray(P.tets_strain_p(jnp.asarray(q), _jd(g.data)))
    for i, tet in enumerate(T):
        DmInv, V0 = osim.tet_rest(V, tet)
        np.testing.assert_allclose(g.data["DmInv"][i], DmInv, atol=1e-10)
        assert g.data["V0"][i] == pytest.approx(V0)
        ref = osim.tet_strain_pi(q, tet, DmInv, 0.99, 1.01)
        np.testing.assert_allclose(p[3 * i:3 * i + 3], ref, atol=1e-8)


def test_tet_strain_inverted_element(bar):
    """Inversion handling: flip the bar to force det(F) < 0."""
    V, T, F = bar
    g = G.build_tets_strain(T, 1e6, V, 0.99, 1.01)
    q = V.copy()
    q[:, 0] = -q[:, 0]  # mirror -> inverted tets
    p = np.asarray(P.tets_strain_p(jnp.asarray(q), _jd(g.data)))
    for i, tet in enumerate(T[:10]):
        DmInv, _ = osim.tet_rest(V, tet)
        ref = osim.tet_strain_pi(q, tet, DmInv, 0.99, 1.01)
        np.testing.assert_allclose(p[3 * i:3 * i + 3], ref, atol=1e-7)


def test_tet_defgrad_parity(bar):
    V, T, F = bar
    g = G.build_tets_deformation_gradient(T, 1e6, V)
    q = _deformed(V, scale=0.2)
    p = np.asarray(P.tets_deformation_gradient_p(jnp.asarray(q), _jd(g.data)))
    for i, tet in enumerate(T):
        DmInv, _ = osim.tet_rest(V, tet)
        ref = osim.tet_defgrad_pi(q, tet, DmInv)
        np.testing.assert_allclose(p[3 * i:3 * i + 3], ref, atol=1e-7)


def test_bending_parity(cloth):
    V, F = cloth
    model = DeformableModel(V, F, floor_collision=False)
    voronoi = model.vertex_masses(F, model.positions)
    g = G.build_verts_bending(model.positions, F, 0.5, voronoi)
    assert g.num > 0  # interior vertices exist on a 5x5 grid
    q = _deformed(model.positions, scale=0.05, seed=3)
    p = np.asarray(P.verts_bending_p(jnp.asarray(q), _jd(g.data)))
    d = g.data
    for i in range(g.num):
        m = d["mask"][i]
        ref = osim.bending_pi(q, d["indices"][i], d["neighbors"][i][m],
                              d["cotans"][i][m], d["rest_curvature"][i],
                              d["tri_normal"][i], d["dot_with_normal"][i])
        np.testing.assert_allclose(p[i], ref, atol=1e-9)


def test_lhs_matrix_parity(bar):
    """Global-matrix triplets match the per-constraint oracle assembly."""
    import scipy.sparse

    V, T, F = bar
    model = DeformableModel(V, F, elements=T, floor_collision=False)
    wi = 123.0
    model.add_tet_constrain_strain(0.95, 1.05, wi=wi)
    dt = 0.016
    A = build_global_matrix(model, dt)

    n3 = 3 * len(V)
    triplets = []
    for tet in T:
        DmInv, V0 = osim.tet_rest(V, tet)
        triplets += osim.tet_lhs_triplets(tet, DmInv, V0, wi)
    rows, cols, vals = zip(*triplets)
    A_ref = scipy.sparse.csc_matrix((vals, (rows, cols)), shape=(n3, n3))
    A_ref = A_ref + scipy.sparse.diags(np.repeat(model.mass, 3) / dt ** 2)
    np.testing.assert_allclose(A.toarray(), A_ref.toarray(), atol=1e-8)


def test_lhs_tri_strain_parity(cloth):
    import scipy.sparse

    V, F = cloth
    model = DeformableModel(V, F, floor_collision=False)
    wi = 7.0
    model.add_tri_constrain_strain(0.9, 1.1, wi=wi)
    dt = 0.02
    A = build_global_matrix(model, dt)

    n3 = 3 * len(V)
    triplets = []
    for tri in F:
        _, DmInv, A0 = osim.tri_rest(V, tri)
        triplets += osim.tri_lhs_triplets(tri, DmInv, A0, wi)
    rows, cols, vals = zip(*triplets)
    A_ref = scipy.sparse.csc_matrix((vals, (rows, cols)), shape=(n3, n3))
    A_ref = A_ref + scipy.sparse.diags(np.repeat(model.mass, 3) / dt ** 2)
    np.testing.assert_allclose(A.toarray(), A_ref.toarray(), atol=1e-8)


def test_assembly_st_rhs_matches_matrix(cloth):
    """S^T p via segment-sum equals the scipy sparse product."""
    V, F = cloth
    model = DeformableModel(V, F, floor_collision=False)
    model.add_tri_constrain_strain(0.9, 1.1, wi=3.0)
    g = model.groups["tris_strain"]
    q = _deformed(V, seed=5)
    p = np.asarray(P.tris_strain_p(jnp.asarray(q), _jd(g.data)))
    rhs = np.asarray(P.group_rhs(jnp.asarray(g.st_rows),
                                 jnp.asarray(g.st_cols),
                                 jnp.asarray(g.st_vals),
                                 jnp.asarray(p), model.n_verts))
    ST = g.assembly_scipy(model.n_verts)
    np.testing.assert_allclose(rhs, ST @ p, atol=1e-9)
