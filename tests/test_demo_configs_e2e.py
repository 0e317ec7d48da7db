"""The shipped per-experiment demo configs reproduce the reference workflow
step 1 verbatim: `sim_main.py --example X --config configs/demos/X.json`
records FOM snapshots + assembly matrices for the bases pipeline
(SURVEY §3.5; ref projective_dynamics/demos/*.json)."""

import json
import os

import numpy as np
import pytest

from animsnapbases_tpu.sim_cli import cli

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "demos")

EXPERIMENTS = {
    "bar_automated_deformationgradient": ["tets_deformation_gradient"],
    "cloth_automated_bend": ["verts_bending"],
    "cloth_automated_bend_spring_strain": ["verts_bending", "edge_spring",
                                           "tris_strain"],
    "cloth_automated_spring": ["edge_spring"],
    "cloth_automated_strain": ["tris_strain"],
}


def test_all_reference_demo_configs_shipped():
    ours = {f for f in os.listdir(CONF_DIR) if f.endswith(".json")}
    expected = set(EXPERIMENTS) | {"config", "testing"}
    assert {e + ".json" for e in expected} <= ours


@pytest.mark.parametrize("exp", sorted(EXPERIMENTS))
def test_demo_config_records_fom(exp, tmp_path):
    out = str(tmp_path / "out")
    driver = cli(["--example", exp,
                  "--config", os.path.join(CONF_DIR, exp + ".json"),
                  "--solver", "Solver", "--record", "--max-frames", "4",
                  "--output", out])
    assert driver.solver.frame == 4
    assert np.isfinite(driver.model.positions).all()
    record = driver.record_path
    assert os.path.exists(os.path.join(record, "assembly_ST.npz"))
    for group in EXPERIMENTS[exp]:
        p_npz = os.path.join(record, group + "_p.npz")
        assert os.path.exists(p_npz), f"missing {p_npz}"
        data = np.load(p_npz)
        assert len(data.files) == 4       # one stacked p per recorded frame


def test_reduced_replay_from_shipped_config(tmp_path):
    """Workflow step 3 (SURVEY §3.5) verbatim from the shipped demo config:
    the same JSON that recorded the FOM drives the REDUCED solver — the
    user only points its directories block at the computed bases."""
    from animsnapbases_tpu.demos.scenarios import build_scenario
    from animsnapbases_tpu.config.sim_config import SimConfig
    from reduction_helpers import pod_deim_basis

    exp = "cloth_automated_strain"
    cfg_path = os.path.join(CONF_DIR, exp + ".json")

    # step 1: FOM recording from the shipped config (CLI)
    out = str(tmp_path / "out")
    driver = cli(["--example", exp, "--config", cfg_path,
                  "--solver", "Solver", "--record", "--max-frames", "30",
                  "--output", out])
    record = driver.record_path

    # step 2: bases for the recorded group (programmatic pipeline)
    data = np.load(os.path.join(record, "tris_strain_p.npz"))
    frames = np.stack([data[str(i)] for i in sorted(map(int, data.files))])
    basis = pod_deim_basis(frames, driver.model.groups["tris_strain"].p, 20)
    basis_root = tmp_path / "p_bases"
    gdir = basis_root / "deim_pod_vectorized" / "tris_strain"
    os.makedirs(gdir, exist_ok=True)
    fname = ("components_interpol_alphas_interpol_verts_"
             "interpol_alpha_ranges.npz")
    np.savez(str(gdir / fname), **basis)

    # step 3: reduced replay driven by the SAME config file, with the
    # directories block pointed at the bases (the user-edited field)
    cfg = json.load(open(cfg_path))
    cfg["directories"]["geom_interpolation_basis_dir"] = str(basis_root) + "/"
    cfg["constraint_projetions_reduction"]["properties"] = ""
    cfg["directories"]["geom_interpolation_basis_file"] = fname
    cfg["directories"]["output"] = str(tmp_path / "reduced_out")
    user_cfg = str(tmp_path / (exp + ".json"))
    json.dump(cfg, open(user_cfg, "w"))

    params = SimConfig(user_cfg)
    args = params.build_args()
    assert args.solver == "animSnapBasesSolver"   # shipped default
    assert args.tri_strain_reduced and args.tri_strain_num_components == 20
    red = build_scenario(exp, args, params=params)
    red.run(max_frames=30)
    assert red.solver.frame == 30
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver
    assert isinstance(red.solver, AnimSnapBasesSolver)
    assert red.solver._reduced_groups.keys() == {"tris_strain"}
    assert np.isfinite(red.model.positions).all()
    # the reduced replay tracks the recorded FOM trajectory
    scale = np.abs(driver.model.positions).max()
    err = np.abs(red.model.positions - driver.model.positions).max() / scale
    assert err < 0.15, err


def test_legacy_config_json_loads():
    """The reference's base config.json schema (vis flags inside the solver
    block, legacy edge_constraint key) parses onto the same args."""
    from animsnapbases_tpu.config.sim_config import SimConfig

    params = SimConfig(os.path.join(CONF_DIR, "config.json"))
    args = params.build_args("Cloth")
    assert args.edge_constraint is True
    assert args.is_simulating is True
    assert args.window_open is False
    assert args.cloth_width == 20
