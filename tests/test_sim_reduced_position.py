"""Position-reduced solver tests: the fully-reduced fast path (reduced
coordinates all the way through the iteration) tracks the full simulation,
and run_steps matches the per-step loop."""

import os

import numpy as np
import pytest

from animsnapbases_tpu.bases.position_reduction import (
    position_basis_from_trajectory,
    save_position_basis,
)
from test_sim_solver import gravity_forces, make_cloth_solver, sim_args


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """FOM run -> p snapshots + position trajectory -> constraint basis +
    position basis."""
    tmp = tmp_path_factory.mktemp("posred")
    solver, model = make_cloth_solver(rows=5, cols=5, wi=1e4, tilt=0.15)
    record = str(tmp / "FOM")
    solver.store_assembly_matrices(record)
    solver.set_record_path(record)
    solver.set_store_p(True)
    solver.max_p_snapshots_num = 24
    traj = []
    for _ in range(25):
        solver.step(gravity_forces(model), num_iterations=6)
        traj.append(model.positions.copy())
    traj = np.array(traj)

    # constraint-projection basis via pod_vectorized + DEIM (programmatic)
    from animsnapbases_tpu.bases.constraints import ConstraintComponents
    from animsnapbases_tpu.snapshots.nonlinear import NonlinearSnapshots
    from animsnapbases_tpu.config.bases_config import BasesConfig

    import shutil

    basis_dir = str(tmp / "bases")
    for gname, elements, rowsize in (("tris_strain", "_tris", 2),
                                     ("edge_spring", "_edges", 1)):
        cfg = {
            "object": {"experiment_dir": str(tmp) + "/", "mesh": "c",
                       "volumetric": False, "experiment": "e" + gname,
                       "snap_format": ".off"},
            "vertexPos_bases": {"computeState": {"compute": False}},
            "constraintProj_bases": {
                "computeState": {"compute": True, "run_main": True,
                                 "testingComputations": "_Release"},
                "constraintType": {"name": gname, "elements": elements,
                                   "p_snaps_folder": "/x",
                                   "assembly_file_name": "assembly_ST.npz",
                                   "assembly_key": gname,
                                   "snaps_pattern_full_p": "/t.npz",
                                   "constrained_elements": "",
                                   "rowSize": rowsize},
                "snapshots": {"numFrames": 12, "frame_increment": 2,
                              "preAlignement": "_noAlignement",
                              "reduced_snaps_available": False},
                "basis_type": "pod_vectorized", "interpolation_type": "deim",
                "desired_num_components": 20, "bases_res_tol": 1e-20,
                "dim": 3, "max_element_per_geom_vert": 10,
                "rest_shape": "first", "massWeighted": "_nonWeighted",
                "standarized": "_nonStandarized", "supported": "_Global",
                "orthogonalized": "_nonOrthogonalized",
                "store_sing_val": False, "store_to_files": True,
                "run_tests": False, "visualize_geom_elements": False,
                "visualize_elements_at_bases_num": 0},
        }
        param = BasesConfig.from_dict(cfg, results_dir=str(tmp / "results"))
        param.constProj_input_snapshots_pattern = os.path.join(
            record, gname + "_p.npz")
        param.constProj_weightedSt = os.path.join(record, "assembly_ST.npz")
        param.ensure_dirs()

        nl = NonlinearSnapshots(param)
        nl.config()
        nl.snapshots_prepare()
        bases = ConstraintComponents(param, nl)
        bases.config()
        bases.compute_components_store_singvalues()
        bases.post_process_components()
        bases.deim()
        basis_npz = bases.store_components_n_interpol_points()
        os.makedirs(os.path.join(basis_dir, gname), exist_ok=True)
        shutil.copy(basis_npz, os.path.join(basis_dir, gname, "basis.npz"))

    pos_basis = position_basis_from_trajectory(traj, r=14)
    pos_path = str(tmp / "pos_basis.npz")
    save_position_basis(pos_path, pos_basis)
    return basis_dir, pos_path, traj


def _reduced_solver(basis_dir, pos_path, with_position):
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    args = sim_args(
        constraint_projection_basis_type="deim_pod_vectorized",
        tri_strain_reduced=True, tri_strain_num_components=10,
        edge_spring_reduced=True, edge_spring_num_components=10,
        geom_interpolation_basis_dir=basis_dir,
        geom_interpolation_basis_file="basis.npz",
        position_reduced=with_position,
        position_num_components=14,
        position_basis_file=pos_path)
    solver = AnimSnapBasesSolver(args)
    _, model = make_cloth_solver(rows=5, cols=5, wi=1e4, tilt=0.15)
    solver.set_model(model)
    solver.prepare(args)
    return solver, model


def test_position_reduced_tracks_full(pipeline):
    basis_dir, pos_path, traj_full = pipeline
    solver, model = _reduced_solver(basis_dir, pos_path, with_position=True)
    for _ in range(25):
        solver.step(gravity_forces(model), num_iterations=6)
    assert np.isfinite(model.positions).all()
    scale = np.abs(traj_full[-1]).max()
    err = np.abs(model.positions - traj_full[-1]).max() / scale
    assert err < 0.08, f"position-reduced sim deviates: {err}"


def test_run_steps_matches_step_loop(pipeline):
    basis_dir, pos_path, _ = pipeline
    s1, m1 = _reduced_solver(basis_dir, pos_path, with_position=True)
    s2, m2 = _reduced_solver(basis_dir, pos_path, with_position=True)
    f = gravity_forces(m1)
    for _ in range(10):
        s1.step(f, num_iterations=6)
    s2.run_steps(f, 10, num_iterations=6)
    np.testing.assert_allclose(m2.positions, m1.positions, atol=1e-8)
    np.testing.assert_allclose(m2.velocities, m1.velocities, atol=1e-8)
    assert s2.frame == s1.frame == 10


def test_fast_path_is_selected(pipeline):
    """With every non-positional group reduced + position reduction, the
    fully-reduced iteration path must be active (run_jit exists)."""
    basis_dir, pos_path, _ = pipeline
    solver, _ = _reduced_solver(basis_dir, pos_path, with_position=True)
    assert solver._run_jit is not None
    assert solver._step_jit is not None
