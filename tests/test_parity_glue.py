"""Small parity-surface items: p->position animation export, friction
response, surface tetrahedralized bar, interpolation-element .bin viewer."""

import os

import numpy as np

from animsnapbases_tpu.sim.collisions import tangential_friction_response


def test_tangential_friction_response():
    v = np.array([[1.0, -2.0, 0.0], [3.0, 0.0, 0.0]])
    corr = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
    out = tangential_friction_response(v, corr, friction_coeff=0.5,
                                       repulsion_coeff=2.0)
    # vertex 0: normal part (0,-2,0) removed, tangential (1,0,0)*0.5,
    # plus repulsion 2*(0,1,0)
    np.testing.assert_allclose(out[0], [0.5, 2.0, 0.0])
    # untouched vertex passes through
    np.testing.assert_allclose(out[1], v[1])


def test_bar_surface_tetrahedralized():
    from animsnapbases_tpu.geometry.procedural import (
        bar_model_surface_tetrahedralized,
    )

    V, T, F = bar_model_surface_tetrahedralized(3, 3, 3)
    assert T.shape[0] > 0
    d = V[T]
    vol = np.abs(np.einsum(
        "ij,ij->i", np.cross(d[:, 1] - d[:, 0], d[:, 2] - d[:, 0]),
        d[:, 3] - d[:, 0])).sum() / 6.0
    assert abs(vol - 8.0) / 8.0 < 0.05


def test_store_snapshots_animations(tmp_path):
    import scipy.sparse

    from animsnapbases_tpu.io.h5anim import read_components_h5
    from animsnapbases_tpu.geometry.procedural import cloth_model
    from animsnapbases_tpu.snapshots.nonlinear import NonlinearSnapshots

    V, F = cloth_model(4, 4)
    nl = NonlinearSnapshots()
    nl.verts, nl.tris = V, F
    ep = 10
    nl.snapTensor = np.random.default_rng(0).normal(size=(3, ep, 3))
    St = scipy.sparse.random(len(V), ep, density=0.3, random_state=1).tocsr()
    path = nl.store_snapshots_animations(str(tmp_path), "p_anim.h5", St=St)
    rest, tris, comps, _ = read_components_h5(path)
    assert comps.shape == (3, len(V), 3)
    np.testing.assert_allclose(comps[1] + rest, St @ nl.snapTensor[1] + V,
                               atol=1e-12)


def test_interpolation_elements_from_bin(tmp_path):
    from animsnapbases_tpu.analysis.accuracy import (
        visualize_interpolation_elements_from_bin,
    )
    from animsnapbases_tpu.geometry.procedural import cloth_model
    from animsnapbases_tpu.io.binfmt import write_points_vector
    from animsnapbases_tpu.io.meshes import save_obj

    V, F = cloth_model(4, 4)
    mesh = str(tmp_path / "cloth.obj")
    save_obj(mesh, V, F)
    pts = write_points_vector(str(tmp_path / "pts_"), 10, 3,
                              np.array([0.0, 2, 5]))
    verts_bin = write_points_vector(str(tmp_path / "verts_"), 10, 3,
                                    np.array([0.0, 1, 2]))
    out = visualize_interpolation_elements_from_bin(
        mesh, verts_bin, pts, str(tmp_path / "sel.png"))
    assert os.path.exists(out)
