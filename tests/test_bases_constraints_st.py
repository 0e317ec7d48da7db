"""St-coupled constraint-basis paths: pca_blocks_with_St (tolerance-driven,
position-space argmax) and geom selection with error_in_pos_space."""

import os

import numpy as np
import pytest

from animsnapbases_tpu.bases.constraints import ConstraintComponents
from animsnapbases_tpu.geometry.procedural import cloth_model
from animsnapbases_tpu.io.meshes import save_obj
from animsnapbases_tpu.sim.model import DeformableModel
from test_bases_constraints import make_cc


@pytest.fixture(scope="module")
def cloth_setup(tmp_path_factory):
    """Cloth tri-strain group: St assembly + recorded-like snapshots."""
    tmp = tmp_path_factory.mktemp("st")
    V, F = cloth_model(5, 5)
    V = V.copy()
    V[:, 2] += 0.1 * V[:, 0]
    model = DeformableModel(V, F, floor_collision=False)
    model.add_tri_constrain_strain(0.9, 1.1, wi=2.0)
    g = model.groups["tris_strain"]
    St = g.assembly_scipy(model.n_verts)

    rng = np.random.default_rng(0)
    Fn, ep = 10, g.num * 2
    modes = rng.normal(size=(3, ep, 3))
    t = np.linspace(0, 1, Fn)
    w = np.stack([np.sin(2 * np.pi * (k + 1) * t) for k in range(3)])
    X = np.einsum("kf,knd->fnd", w, modes) + 0.02 * rng.normal(
        size=(Fn, ep, 3))
    return tmp, V, F, St, X, model


def _cc_with_st(tmp_path, X, St, V, F, tmp, **kw):
    cc = make_cc(tmp_path, X, p=2, **kw)
    cc.St = St
    # adjacency needs the mesh file the config points at
    cc.nonlinearSnapshots.tris = F
    cc.nonlinearSnapshots.verts = V
    cc.nonlinearSnapshots.ele_type = "_tris"
    return cc


def test_pca_blocks_with_st_runs_to_tolerance(cloth_setup, tmp_path):
    tmp, V, F, St, X, model = cloth_setup
    tol = 0.4 * np.linalg.norm(X)
    cc = _cc_with_st(tmp_path, X, St, V, F, tmp,
                     basis_type="pca_blocks_with_St", tol=tol)
    cc.compute_pca_blocks_with_st()
    assert cc.comps is not None
    assert cc.comps.shape[0] % 2 == 0        # whole p-blocks
    assert cc.numComp == cc.comps.shape[0] // 2
    # residual after deflating the kept components is below tolerance
    rec = np.einsum("fk,knd->fnd", cc.weigs, cc.comps)
    assert np.linalg.norm(X - rec) <= tol * 1.0001
    # the greedy loop tracked selected vertices
    assert len(cc.largeDeforPoints) >= 1


def test_pca_blocks_with_st_unreachable_tol_terminates(cloth_setup,
                                                       tmp_path):
    """The reference loops `while norm(R) > tol` unbounded
    (constraintsComponents.py:180) and hangs on a noise floor above tol;
    our loop must cap at the requested component count and warn."""
    tmp, V, F, St, X, model = cloth_setup
    cc = _cc_with_st(tmp_path, X, St, V, F, tmp,
                     basis_type="pca_blocks_with_St", tol=1e-30, K=4)
    with pytest.warns(UserWarning, match="stopped at"):
        cc.compute_pca_blocks_with_st()
    assert cc.numComp <= 4
    assert cc.comps.shape[0] == cc.numComp * 2


def test_geom_selection_in_position_space(cloth_setup, tmp_path):
    tmp, V, F, St, X, model = cloth_setup
    cc = _cc_with_st(tmp_path, X, St, V, F, tmp, basis_type="pca_blocks",
                     interpolation="geom", K=3, ele_per_vert=2)
    cc.compute_pca_blocks()
    cc.geom_block_form_utilizing_differential_operator(
        error_in_pos_space=True)
    # one interpolation vertex per component, elements capped at 2 per vertex
    assert len(cc.geom_interpol_verts) == 3
    assert cc.geom_alpha_ranges[-1] == len(cc.geom_alpha)
    jumps = np.diff(np.concatenate([[0], cc.geom_alpha_ranges]))
    assert (jumps <= 2).all()
    # Pt holds both rows of each selected element
    assert len(cc.geom_Pt) == 2 * len(cc.geom_alpha)
    # selected vertices exist on the mesh
    assert all(0 <= v < len(V) for v in cc.geom_interpol_verts)
    # selected elements are adjacent to their vertices
    for v, alphas_start, alphas_end in zip(
            cc.geom_interpol_verts,
            np.concatenate([[0], cc.geom_alpha_ranges[:-1]]),
            cc.geom_alpha_ranges):
        for alpha in cc.geom_alpha[alphas_start:alphas_end]:
            assert v in F[alpha]


def test_store_components_gradually(cloth_setup, tmp_path):
    tmp, V, F, St, X, model = cloth_setup
    cc = _cc_with_st(tmp_path, X, St, V, F, tmp, basis_type="pca_blocks",
                     interpolation="geom", K=3, ele_per_vert=2)
    cc.compute_pca_blocks()
    cc.geom_block_form_utilizing_differential_operator(
        error_in_pos_space=True)
    cc.nonlinearSnapshots.frs = X.shape[0]
    cc.store_components_gradually_to_files(1, 3, 1, ".bin")
    out = cc.param.constProj_output_directory
    bins = sorted(f for f in os.listdir(out) if f.endswith(".bin"))
    # components + points + verts per k
    assert any(f.startswith("p_nl_F10Kp") for f in bins)
    assert any(f.startswith("p_nl_interpol_points_") for f in bins)
    assert any(f.startswith("corrVerts") for f in bins)
