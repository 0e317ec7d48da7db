"""Full-order solver integration tests + the complete round trip:
simulate -> record p snapshots -> compute constraint bases + DEIM ->
reduced simulation matches the full one."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

from animsnapbases_tpu.config.bases_config import BasesConfig
from animsnapbases_tpu.geometry.procedural import bar_model, cloth_model
from animsnapbases_tpu.sim.model import DeformableModel
from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver
from animsnapbases_tpu.sim.solver import Solver


GRAVITY = np.array([0.0, -9.81, 0.0])


def sim_args(**kw):
    from animsnapbases_tpu.config.sim_config import default_sim_args
    args = default_sim_args()
    args.dt = 0.016
    for k, v in kw.items():
        setattr(args, k, v)
    return args


def make_cloth_solver(rows=6, cols=6, fix_side=True, wi=1e4, tilt=0.0):
    V, F = cloth_model(rows, cols)
    if tilt:
        V = V.copy()
        V[:, 2] += tilt * V[:, 0]   # tilt out of the XY plane
    model = DeformableModel(V, F, masses=np.full(len(V), 10.0),
                            floor_collision=True, init_height_shift=3.0)
    model.add_tri_constrain_strain(0.95, 1.05, wi=wi)
    model.add_edge_spring_constraint(wi=wi)
    if fix_side:
        model.compute_cloth_corner_indices()
        model.fix_surface_side_vertices("left")
    solver = Solver()
    solver.set_model(model)
    solver.prepare(sim_args())
    return solver, model


def gravity_forces(model, mass_per_particle=10.0):
    """Reference convention (usr_interface.py:164-166): constant per-vertex
    gravity force using mass_per_particle — NOT the (possibly 1e10-pinned)
    actual vertex mass, which is what keeps fixed vertices in place."""
    f = np.zeros_like(model.positions)
    f[:, 1] = GRAVITY[1] * mass_per_particle
    return f


def test_cloth_hangs_under_gravity():
    solver, model = make_cloth_solver()
    p0 = model.positions.copy()
    fixed = model.fixed_flags
    for _ in range(40):
        solver.step(gravity_forces(model), num_iterations=10)
    assert np.isfinite(model.positions).all()
    # fixed side barely moves (mass 1e10)
    np.testing.assert_allclose(model.positions[fixed], p0[fixed], atol=1e-3)
    # free side fell
    assert model.positions[~fixed, 1].mean() < p0[~fixed, 1].mean() - 0.1
    # springs keep the cloth from tearing: edge lengths bounded
    g = model.groups["edge_spring"]
    e = g.data["edges"]
    lengths = np.linalg.norm(model.positions[e[:, 0]]
                             - model.positions[e[:, 1]], axis=1)
    assert lengths.max() < 3.0 * g.data["rest_length"].max()


def test_floor_collision_clamps():
    V, F = cloth_model(4, 4)
    model = DeformableModel(V, F, masses=np.full(len(V), 1.0),
                            floor_collision=True, init_height_shift=0.05)
    model.add_edge_spring_constraint(wi=1e3)
    solver = Solver()
    solver.set_model(model)
    solver.prepare(sim_args())
    for _ in range(30):
        solver.step(gravity_forces(model), num_iterations=5)
    # predictor clamping keeps the cloth at/above the floor (within a step)
    assert model.positions[:, 1].min() > -0.2


def test_bar_deformation_gradient_stability():
    V, T, F, _ = bar_model(5, 3, 3)
    model = DeformableModel(V, F, elements=T,
                            masses=np.full(len(V), 10.0),
                            floor_collision=True, init_height_shift=1.0)
    model.add_tet_constrain_deformation_gradient(wi=1e6)
    model.fix_side_vertices(side="left", threshold=0.5, axis=0)
    solver = Solver()
    solver.set_model(model)
    solver.prepare(sim_args())
    for _ in range(30):
        solver.step(gravity_forces(model), num_iterations=10)
    assert np.isfinite(model.positions).all()
    # bar tip droops but stays attached
    tip = model.positions[V[:, 0] > 3.5]
    assert tip[:, 1].mean() < V[V[:, 0] > 3.5][:, 1].mean() + 1.0
    # volume roughly preserved by the deformation-gradient constraint
    d = model.positions[T]
    vol = np.abs(np.einsum("ij,ij->i",
                           np.cross(d[:, 1] - d[:, 0], d[:, 2] - d[:, 0]),
                           d[:, 3] - d[:, 0])).sum() / 6.0
    d0 = V[T]
    vol0 = np.abs(np.einsum("ij,ij->i",
                            np.cross(d0[:, 1] - d0[:, 0], d0[:, 2] - d0[:, 0]),
                            d0[:, 3] - d0[:, 0])).sum() / 6.0
    assert abs(vol - vol0) / vol0 < 0.2


def test_positional_constraint_pins_vertex():
    V, F = cloth_model(4, 4)
    model = DeformableModel(V, F, masses=np.full(len(V), 1.0),
                            floor_collision=False)
    model.add_edge_spring_constraint(wi=1e3)
    model.add_positional_constraint(0, wi=1e9)
    target = model.positions[0].copy()
    solver = Solver()
    solver.set_model(model)
    solver.prepare(sim_args())
    for _ in range(20):
        solver.step(gravity_forces(model), num_iterations=10)
    np.testing.assert_allclose(model.positions[0], target, atol=1e-3)


def test_recording_roundtrip(tmp_path):
    """Recorded p snapshots + assembly export are consumable by the
    nonlinear-snapshots reader."""
    solver, model = make_cloth_solver(rows=5, cols=5)
    record = str(tmp_path / "FOM")
    solver.store_assembly_matrices(record)
    solver.set_record_path(record)
    solver.set_store_p(True)
    solver.max_p_snapshots_num = 10
    for _ in range(11):
        solver.step(gravity_forces(model), num_iterations=4)
    assert os.path.exists(os.path.join(record, "tris_strain_p.npz"))
    assert os.path.exists(os.path.join(record, "edge_spring_p.npz"))
    assert os.path.exists(os.path.join(record, "assembly_ST.npz"))

    data = np.load(os.path.join(record, "tris_strain_p.npz"))
    e = model.groups["tris_strain"].num
    assert data["0"].shape == (2 * e, 3)
    assert "10" in data.files

    st = np.load(os.path.join(record, "assembly_ST.npz"),
                 allow_pickle=True)["tris_strain"].item()
    assert st.shape == (model.n_verts, 2 * e)


@pytest.fixture(scope="module")
def fom_recording(tmp_path_factory):
    """Run a cloth FOM sim recording tris_strain projections."""
    tmp = tmp_path_factory.mktemp("roundtrip")
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
    return tmp, record, np.array(traj)


def _constproj_config(tmp, record, mesh_dir, num_frames=12):
    cfg = {
        "object": {
            "experiment_dir": str(tmp) + "/",
            "mesh": "cloth5", "volumetric": False,
            "experiment": "exp", "snap_format": ".off",
        },
        "vertexPos_bases": {"computeState": {"compute": False}},
        "constraintProj_bases": {
            "computeState": {"compute": True, "run_main": True,
                             "testingComputations": "_Release"},
            "constraintType": {
                "name": "tris_strain", "elements": "_tris",
                "p_snaps_folder": "/FOMREL",
                "pos_snaps_folder": "/pos", "geom_pos_snaps_folder": "/geom",
                "assembly_file_name": "assembly_ST.npz",
                "assembly_key": "tris_strain",
                "snaps_pattern_full_p": "/tris_strain_p.npz",
                "constrained_elements": "", "rowSize": 2,
            },
            "snapshots": {"numFrames": num_frames, "frame_increment": 2,
                          "preAlignement": "_noAlignement",
                          "reduced_snaps_available": False},
            "basis_type": "pod_vectorized",
            "interpolation_type": "deim",
            "desired_num_components": 20,
            "bases_res_tol": 1e-20, "dim": 3,
            "max_element_per_geom_vert": 10,
            "rest_shape": "first",
            "massWeighted": "_nonWeighted",
            "standarized": "_nonStandarized",
            "supported": "_Global",
            "orthogonalized": "_nonOrthogonalized",
            "store_sing_val": False, "store_to_files": True,
            "run_tests": False, "visualize_geom_elements": False,
            "visualize_elements_at_bases_num": 0,
        },
    }
    param = BasesConfig.from_dict(cfg, results_dir=str(tmp / "results"))
    return param


def test_full_round_trip_reduced_sim(fom_recording, tmp_path):
    """simulate -> bases (pod_vectorized + DEIM) -> reduced sim ~ full sim."""
    tmp, record, traj_full = fom_recording

    # point the config's snapshot pattern at the recording
    param = _constproj_config(tmp, record, None)
    # patch derived paths directly at the recorded files
    param.constProj_input_snapshots_pattern = os.path.join(
        record, "tris_strain_p.npz")
    param.constProj_weightedSt = os.path.join(record, "assembly_ST.npz")
    param.constProj_masses_file = ""   # force element-mass computation? no:
    # mass weighting is off in this config
    param.ensure_dirs()

    from animsnapbases_tpu.bases.constraints import ConstraintComponents
    from animsnapbases_tpu.snapshots.nonlinear import NonlinearSnapshots

    nl = NonlinearSnapshots(param)
    nl.config()
    nl.snapshots_prepare()
    assert nl.snapTensor.shape[0] == 12     # numFrames with increment 2

    bases = ConstraintComponents(param, nl)
    bases.config()
    bases.compute_components_store_singvalues()
    bases.post_process_components()
    bases.deim()
    out = bases.store_components_n_interpol_points()
    assert os.path.exists(out)

    # reduced solver consumes the npz; rebuild the same model
    basis_dir = str(tmp_path / "bases")
    os.makedirs(os.path.join(basis_dir, "tris_strain"), exist_ok=True)
    import shutil
    shutil.copy(out, os.path.join(basis_dir, "tris_strain", "basis.npz"))

    solver_full, model_full = make_cloth_solver(rows=5, cols=5, wi=1e4, tilt=0.15)
    args = sim_args(
        constraint_projection_basis_type="deim_pod_vectorized",
        tri_strain_reduced=True, tri_strain_num_components=10,
        geom_interpolation_basis_dir=basis_dir,
        geom_interpolation_basis_file="basis.npz")

    solver_red = AnimSnapBasesSolver(args)
    _, model_red = make_cloth_solver(rows=5, cols=5, wi=1e4, tilt=0.15)
    solver_red.set_model(model_red)
    solver_red.prepare(args)

    for _ in range(25):
        f = gravity_forces(model_full)
        solver_full.step(f, num_iterations=6)
        solver_red.step(f, num_iterations=6)

    assert np.isfinite(model_red.positions).all()
    # reduced trajectory tracks the full one
    scale = np.abs(model_full.positions).max()
    err = np.abs(model_red.positions - model_full.positions).max() / scale
    assert err < 0.05, f"reduced sim deviates: {err}"
