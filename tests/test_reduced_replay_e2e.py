"""The complete reference workflow through the top-level APIs:

1. FOM scenario records p snapshots + positions (sim driver)
2. bases computed (POD+DEIM + position POD)
3. REDUCED scenario replays the same schedule with the reduced solver,
   exporting positions (sim driver with solver=animSnapBasesSolver)
4. on-mesh accuracy compares the two exported sequences frame-by-frame
"""

import os

import numpy as np
import pytest

from animsnapbases_tpu.analysis.accuracy import compute_accuracy
from animsnapbases_tpu.demos.scenarios import build_scenario
from reduction_helpers import pod_deim_basis
from test_demos_cli import small_args


@pytest.fixture(scope="module")
def fom_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("replay")
    params, args = small_args(tmp, vert_bending_constraint=False)
    driver = build_scenario("cloth_automated_strain", args,
                            record_fom_info=True, params=params,
                            record_positions=True)
    driver.run(max_frames=40)
    return tmp, params, driver


def test_reduced_replay_and_on_mesh_accuracy(fom_run):
    tmp, params, fom_driver = fom_run
    record = fom_driver.record_path

    # --- bases from the recording ---
    from animsnapbases_tpu.bases.position_reduction import (
        position_basis_from_trajectory,
        save_position_basis,
    )

    basis_dir = str(tmp / "bases")
    model = fom_driver.model
    for gname in ("tris_strain", "edge_spring"):
        data = np.load(os.path.join(record, gname + "_p.npz"))
        frames = np.stack([data[str(i)] for i in sorted(
            map(int, data.files))])
        basis = pod_deim_basis(frames, model.groups[gname].p, 20)
        gdir = os.path.join(basis_dir, gname)
        os.makedirs(gdir, exist_ok=True)
        np.savez(os.path.join(gdir, "basis.npz"), **basis)

    traj = np.array(fom_driver.trajectory)
    pos_basis_path = str(tmp / "pos_basis.npz")
    save_position_basis(pos_basis_path,
                        position_basis_from_trajectory(traj, 20))

    # --- reduced replay of the same scenario via the driver ---
    params2, args2 = small_args(tmp, vert_bending_constraint=False)
    args2.solver = "animSnapBasesSolver"
    args2.constraint_projection_basis_type = "deim_pod_vectorized"
    args2.tri_strain_reduced = True
    args2.tri_strain_num_components = 12
    args2.edge_spring_reduced = True
    args2.edge_spring_num_components = 12
    args2.deim_oversample = 1.4
    args2.geom_interpolation_basis_dir = basis_dir
    args2.geom_interpolation_basis_file = "basis.npz"
    args2.position_reduced = True
    args2.position_num_components = 20
    args2.position_basis_file = pos_basis_path
    args2.output_dir = str(tmp / "reduced_out")

    driver2 = build_scenario("cloth_automated_strain", args2,
                             record_fom_info=True, params=params2,
                             record_positions=True)
    driver2.run(max_frames=40)
    assert driver2.solver.frame == 40
    # reduced recording path carries the reduction tags
    assert "reduced_12" in driver2.record_path
    assert "constraint_projection/deim_pod_vectorized" in driver2.record_path

    # --- on-mesh accuracy between the exported sequences ---
    rows = compute_accuracy(
        os.path.join(fom_driver.pos_dir, "pos_%d.off"),
        os.path.join(driver2.pos_dir, "pos_%d.off"),
        range(0, 40, 5),
        out_dir=str(tmp / "accuracy"))
    assert len(rows) == 8
    mean_l2 = np.mean([r["rel_l2"] for r in rows])
    assert mean_l2 < 0.05, f"reduced replay deviates: {mean_l2}"
    assert os.path.exists(os.path.join(str(tmp / "accuracy"),
                                       "on_mesh_accuracy.csv"))
