"""Scenario driver + CLI tests: scripted schedules run headlessly, record
the artifacts the bases pipelines consume, and the bases CLI closes the loop
on them."""

import json
import os

import numpy as np
import pytest

from animsnapbases_tpu.config.sim_config import SimConfig
from animsnapbases_tpu.demos.poke import (
    create_poke_z_motion_with_jumps,
    voronoi_seeds_and_partition,
)
from animsnapbases_tpu.demos.scenarios import SCENARIOS, build_scenario


CONFIG = os.path.join(os.path.dirname(__file__), "..",
                      "configs", "demos", "testing.json")


def small_args(tmp_path, **overrides):
    params = SimConfig(CONFIG)
    # shrink the configured systems (scenarios re-read these at frame 0)
    params.system_params["system"]["Cloth"] = {"cloth_width": 6,
                                               "cloth_height": 6}
    params.system_params["system"]["Bar"] = {"bar_width": 4, "bar_height": 3,
                                             "bar_depth": 3}
    args = params.build_args("Cloth")
    args.output_dir = str(tmp_path / "output")
    args.solver_iterations = 4
    for k, v in overrides.items():
        setattr(args, k, v)
    return params, args


def test_poke_motion_shape():
    m = create_poke_z_motion_with_jumps(20, 10, 3, z_range=0.5)
    assert m.shape == (90, 3)
    assert np.allclose(m[:, :2], 0)
    assert abs(m[:, 2]).max() == pytest.approx(0.5, rel=0.1)
    # pauses are zero
    assert np.allclose(m[20:30, 2], 0)


def test_poke_motion_bitexact_vs_reference_recipe():
    """The vectorized one-cycle+tile construction must reproduce the
    reference's per-cycle loop (``demos/calbacks.py:650-686``) BIT-exactly
    — poke trajectory parity feeds bit-exact snapshot replays."""
    def oracle(f_l, f_j, k, z_range=1.0):
        pattern = []
        for _ in range(k):
            quarter = f_l // 4
            z = z_range
            pattern.append(np.concatenate([
                np.linspace(0, -z, quarter, endpoint=False),
                np.linspace(-z, +z, quarter, endpoint=False),
                np.linspace(+z, -z, quarter, endpoint=False),
                np.linspace(-z, 0, f_l - 3 * quarter),
            ]))
            pattern.append(np.zeros(f_j))
        z_all = np.concatenate(pattern)
        motion = np.zeros((len(z_all), 3))
        motion[:, 2] = z_all
        return motion

    for f_l, f_j, k, zr in [(40, 8, 3, 0.05), (20, 10, 3, 0.5),
                            (22, 0, 2, 1.0), (4, 1, 5, 2.5)]:
        got = create_poke_z_motion_with_jumps(f_l, f_j, k, z_range=zr)
        want = oracle(f_l, f_j, k, z_range=zr)
        assert got.shape == want.shape
        assert (got == want).all(), (f_l, f_j, k, zr)


def test_voronoi_seeds():
    from animsnapbases_tpu.geometry.procedural import cloth_model
    V, F = cloth_model(8, 8)
    seeds, labels = voronoi_seeds_and_partition(V, F, 5)
    assert len(seeds) == 6
    assert len(set(seeds.tolist())) == 6
    assert labels.shape == (64,)
    assert set(labels.tolist()) <= set(range(6))


def test_bar_scenario_schedule(tmp_path):
    params, args = small_args(
        tmp_path, tet_deformation_constraint=True,
        vert_bending_constraint=False, edge_constraint=False,
        tri_strain_constraint=False,
        deformation_gradient_constraint_wi=1e6)
    driver = build_scenario("bar_automated_deformationgradient", args,
                            record_fom_info=True, params=params)
    # override to the small bar for test speed
    args.bar_width, args.bar_height, args.bar_depth = 4, 3, 3
    driver.run(max_frames=45)

    model = driver.model
    assert model.elements.shape[0] > 0
    # after frame 40, left side released
    assert driver.solver.frame == 45
    left = model.positions[:, 0] < model.positions[:, 0].mean()
    assert not model.fixed_flags[np.argsort(model.init_positions[:, 0])[:5]].any()
    # mesh exports written
    obj_dir = os.path.join(args.output_dir, "bar")
    assert os.path.exists(os.path.join(obj_dir, "bar.obj"))
    assert os.path.exists(os.path.join(obj_dir, "bar.mesh"))
    # recording path uses the token grammar
    assert "tets_deformation_gradient_wi" in driver.record_path


def test_cloth_snapshots_scenario_records(tmp_path):
    params, args = small_args(tmp_path, vert_bending_constraint=False)
    driver = build_scenario("cloth_snapshots", args, record_fom_info=True,
                            params=params, record_positions=True,
                            poking_frames_per_point=8,
                            rest_frames_per_point=4, number_pokes=2)
    driver.run()

    # stop frame = 2*(8+4) + 4 = 28
    assert driver.solver.frame == 28
    rec = driver.record_path
    assert os.path.exists(os.path.join(rec, "assembly_ST.npz"))
    assert os.path.exists(os.path.join(rec, "tris_strain_p.npz"))
    assert os.path.exists(os.path.join(rec, "edge_spring_p.npz"))
    data = np.load(os.path.join(rec, "tris_strain_p.npz"))
    assert "0" in data.files and "27" in data.files

    # position snapshots exported for the pos pipeline
    assert driver.pos_dir is not None
    assert os.path.exists(os.path.join(driver.pos_dir, "pos_0.off"))
    assert os.path.exists(os.path.join(driver.pos_dir, "pos_27.off"))

    # poke constraints actually moved the cloth out of plane
    traj = np.array(driver.trajectory)
    assert np.abs(traj[..., 2] - traj[0, :, 2]).max() > 0.005


def test_full_cli_loop(tmp_path):
    """sim CLI records -> bases CLI consumes -> basis npz produced."""
    params, args = small_args(tmp_path, vert_bending_constraint=False)
    driver = build_scenario("cloth_snapshots", args, record_fom_info=True,
                            params=params, record_positions=True,
                            poking_frames_per_point=8,
                            rest_frames_per_point=4, number_pokes=2)
    driver.run()

    # write a bases config pointing at the recording
    cfg = {
        "object": {"experiment_dir": args.output_dir + "/",
                   "mesh": "cloth", "volumetric": False,
                   "experiment": "cloth_automated_snapshots",
                   "snap_format": ".off"},
        "vertexPos_bases": {"computeState": {"compute": False}},
        "constraintProj_bases": {
            "computeState": {"compute": True, "run_main": True,
                             "testingComputations": "_Release"},
            "constraintType": {
                "name": "tris_strain", "elements": "_tris",
                "p_snaps_folder": os.path.relpath(
                    driver.record_path,
                    os.path.join(args.output_dir, "cloth",
                                 "cloth_automated_snapshots")).join(["/",
                                                                     ""]),
                "assembly_file_name": "assembly_ST.npz",
                "assembly_key": "tris_strain",
                "snaps_pattern_full_p": "/tris_strain_p.npz",
                "constrained_elements": "", "rowSize": 2},
            "snapshots": {"numFrames": 14, "frame_increment": 2,
                          "preAlignement": "_noAlignement",
                          "reduced_snaps_available": False},
            "basis_type": "pod_vectorized", "interpolation_type": "deim",
            "desired_num_components": 12, "bases_res_tol": 1e-20, "dim": 3,
            "max_element_per_geom_vert": 10, "rest_shape": "first",
            "massWeighted": "_nonWeighted",
            "standarized": "_nonStandarized", "supported": "_Global",
            "orthogonalized": "_nonOrthogonalized",
            "store_sing_val": True, "store_to_files": True,
            "run_tests": True, "visualize_geom_elements": False,
            "visualize_elements_at_bases_num": 0},
    }
    from animsnapbases_tpu.cli import main as bases_main
    from animsnapbases_tpu.config.bases_config import BasesConfig

    param = BasesConfig.from_dict(cfg, results_dir=str(tmp_path / "results"))
    # point directly at recorded artifacts (path grammar is exercised in the
    # scenario test; here we bypass the relative-folder indirection)
    param.constProj_input_snapshots_pattern = os.path.join(
        driver.record_path, "tris_strain_p.npz")
    param.constProj_weightedSt = os.path.join(driver.record_path,
                                              "assembly_ST.npz")
    results = bases_main(param)
    nl = results["constproj"]
    out_npz = os.path.join(
        param.constProj_output_directory,
        "components_interpol_alphas_interpol_verts_interpol_alpha_ranges.npz")
    assert os.path.exists(out_npz)
    data = np.load(out_npz)
    assert set(data.files) == {"components", "interpol_alphas", "Pt",
                               "interpol_verts", "interpol_alpha_ranges"}
    # convergence figures/CSVs produced
    csvs = [f for f in os.listdir(param.constProj_output_directory)
            if f.endswith(".csv")]
    assert csvs
    pngs = [f for f in os.listdir(param.constProj_output_directory)
            if f.endswith(".png")]
    assert pngs
    # timing log flushed
    assert os.path.exists(os.path.join(param.constProj_output_directory,
                                       "function_timings.txt"))


def test_all_scenarios_construct(tmp_path):
    for name in SCENARIOS:
        params, args = small_args(tmp_path)
        driver = build_scenario(name, args, params=params)
        assert driver.stop_frame > 0


def test_chunked_replay_matches_per_frame(tmp_path):
    """Chunked scenario replay (one device dispatch per schedule-event gap,
    trajectory captured on device) must reproduce the per-frame loop
    exactly — positions, recorded p snapshots, and exported frames."""
    def drive(sub, chunked):
        params, args = small_args(
            tmp_path / sub, edge_constraint=True,
            vert_bending_constraint=False, strain_constraint=True)
        drv = build_scenario("cloth_automated_strain", args,
                             record_fom_info=True, params=params)
        drv.record_positions = True
        drv.run(max_frames=26, chunked=chunked)
        return drv

    a = drive("per_frame", chunked=False)
    b = drive("chunked", chunked=True)

    assert len(a.trajectory) == len(b.trajectory) == 26
    np.testing.assert_allclose(np.array(b.trajectory),
                               np.array(a.trajectory), atol=1e-8)
    # recorded p snapshots match frame-for-frame
    pa = os.path.join(a.record_path, "tris_strain_p.npz")
    pb = os.path.join(b.record_path, "tris_strain_p.npz")
    da, db = np.load(pa), np.load(pb)
    assert sorted(da.files) == sorted(db.files)
    for k in da.files:
        np.testing.assert_allclose(db[k], da[k], atol=1e-8)
    # exported position frames exist in both layouts
    fa, fb = sorted(os.listdir(a.pos_dir)), sorted(os.listdir(b.pos_dir))
    assert fa == fb and len(fa) == 26


@pytest.mark.parametrize("seed", [0, 1])
def test_chunked_replay_randomized_schedule(tmp_path, seed):
    """Fuzz the chunked driver against the per-frame loop with a seeded
    RANDOM fix/release schedule (irregular event gaps, repeated dirty
    rebuilds) — broader than the fixed scripted scenarios."""
    from animsnapbases_tpu.demos.scenarios import ScenarioDriver
    from animsnapbases_tpu.geometry.procedural import cloth_model

    rng = np.random.default_rng(seed)
    events = sorted(rng.choice(np.arange(2, 28), size=4, replace=False))

    def build(sub, chunked):
        params, args = small_args(
            tmp_path / f"{sub}{seed}", edge_constraint=True,
            vert_bending_constraint=False, strain_constraint=True)

        def geometry(a):
            V, F = cloth_model(6, 6)
            return V, F, None

        def setup(d):
            d.model.compute_cloth_corner_indices()
            d.model.fix_surface_side_vertices("left")

        schedule = {"setup": setup}
        for i, ev in enumerate(events):
            if i % 2 == 0:
                schedule[int(ev)] = (
                    lambda d: d.model.fix_surface_side_vertices("right"))
            else:
                schedule[int(ev)] = (
                    lambda d: d.model.release_surface_side_vertices("right"))
        drv = ScenarioDriver(args, "fuzz", "fuzz", geometry, schedule,
                             stop_frame=30)
        drv.run(chunked=chunked)
        return drv

    a = build("pf", chunked=False)
    b = build("ch", chunked=True)
    assert len(a.trajectory) == len(b.trajectory) == 30
    np.testing.assert_allclose(np.array(b.trajectory),
                               np.array(a.trajectory), atol=1e-8)


def test_record_screenshots_exports_pngs(tmp_path):
    """--record-screenshots renders one PNG per simulated frame (ref
    usr_interface.py:186-188 per-pre-draw polyscope screenshots)."""
    import glob

    params, args = small_args(tmp_path, vert_bending_constraint=False)
    driver = build_scenario("cloth_automated_strain", args,
                            params=params, record_screenshots=True)
    driver.run(max_frames=5)
    assert driver.shots_dir is not None
    pngs = sorted(glob.glob(os.path.join(driver.shots_dir, "*.png")))
    assert len(pngs) == len(driver.trajectory) == 5
    assert os.path.basename(pngs[0]) == "screenshot_0000.png"
