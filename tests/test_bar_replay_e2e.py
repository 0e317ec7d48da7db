"""Volumetric (tet) counterpart of the cloth replay e2e: bar scenario FOM
records tet constraint projections; POD+DEIM bases + position POD; reduced
replay of the same schedule tracks the full-order run."""

import os

import numpy as np
import pytest

from animsnapbases_tpu.demos.scenarios import build_scenario
from reduction_helpers import pod_deim_basis
from test_demos_cli import small_args


@pytest.fixture(scope="module")
def bar_fom(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bar_replay")
    params, args = small_args(
        tmp, vert_bending_constraint=False, edge_constraint=False,
        tri_strain_constraint=False, tet_strain_constraint=True,
        tet_deformation_constraint=True,
        deformation_gradient_constraint_wi=1e5)
    driver = build_scenario("bar_automated_deformationgradient", args,
                            record_fom_info=True, params=params,
                            record_positions=True)
    driver.run(max_frames=50)
    return tmp, params, driver


def test_bar_reduced_replay(bar_fom):
    tmp, params, fom = bar_fom
    record = fom.record_path
    model = fom.model
    groups = [g for g in ("tets_strain", "tets_deformation_gradient")
              if g in model.groups]
    assert groups == ["tets_strain", "tets_deformation_gradient"]

    basis_dir = str(tmp / "bases")
    for gname in groups:
        data = np.load(os.path.join(record, gname + "_p.npz"))
        frames = np.stack([data[str(i)] for i in sorted(
            map(int, data.files))])
        basis = pod_deim_basis(frames, model.groups[gname].p, 24)
        gdir = os.path.join(basis_dir, gname)
        os.makedirs(gdir, exist_ok=True)
        np.savez(os.path.join(gdir, "basis.npz"), **basis)

    from animsnapbases_tpu.bases.position_reduction import (
        position_basis_from_trajectory,
        save_position_basis,
    )

    traj = np.array(fom.trajectory)
    pos_path = str(tmp / "pos_basis.npz")
    save_position_basis(pos_path,
                        position_basis_from_trajectory(traj, 30))

    params2, args2 = small_args(
        tmp, vert_bending_constraint=False, edge_constraint=False,
        tri_strain_constraint=False, tet_strain_constraint=True,
        tet_deformation_constraint=True,
        deformation_gradient_constraint_wi=1e5)
    args2.solver = "animSnapBasesSolver"
    args2.constraint_projection_basis_type = "deim_pod_vectorized"
    args2.tet_strain_reduced = True
    args2.tet_strain_num_components = 16
    args2.tet_deformation_reduced = True
    args2.tet_deformation_num_components = 16
    args2.deim_oversample = 1.4
    args2.geom_interpolation_basis_dir = basis_dir
    args2.geom_interpolation_basis_file = "basis.npz"
    args2.position_reduced = True
    args2.position_num_components = 30
    args2.position_basis_file = pos_path
    args2.output_dir = str(tmp / "reduced_out")

    driver2 = build_scenario("bar_automated_deformationgradient", args2,
                             record_fom_info=True, params=params2,
                             record_positions=True)
    driver2.run(max_frames=50)
    assert driver2.solver.frame == 50

    ref = np.array(fom.trajectory)
    red = np.array(driver2.trajectory)
    scale = np.abs(ref).max()
    rel = np.abs(red - ref) / scale
    assert rel.mean() < 0.02, f"bar reduced replay deviates: {rel.mean()}"
    assert np.isfinite(red).all()
