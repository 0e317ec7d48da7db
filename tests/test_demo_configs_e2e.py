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
