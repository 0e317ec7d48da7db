"""End-to-end run of scripts/fit_material.py (subprocess, CPU x64):
the twin experiment must converge and print a well-formed JSON line.
Also drives the --bunny recorded-bases path (bench-cache pipeline) at
test scale via monkeypatched bench constants."""

import importlib.util
import json
import os
import subprocess
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fit_material_converges():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fit_material.py"),
         "--steps", "80"],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    data = json.loads(line)
    assert data["metric"] == "material_fit_max_rel_scale_error"
    assert data["value"] < 0.1
    d = data["detail"]
    assert d["loss_last"] < 1e-3 * d["loss_first"]
    assert d["groups"] == ["edge_spring", "tris_strain"]


def test_fit_bunny_recorded_bases_path(tmp_path, monkeypatch):
    """The --bunny path (fit on the bench cache's PRODUCT-pipeline
    recorded bases) end-to-end at test scale: a small cloth stands in
    for the bunny, but the code path — bench.run_fom_and_bases ->
    build product bases -> AnimSnapBasesSolver -> DiffReducedSim ->
    fit_scales — is exactly the deliverable's (BENCH_fit_r05)."""
    import bench

    monkeypatch.setattr(bench, "BENCH_DIR", str(tmp_path / "cache"))
    monkeypatch.setattr(bench, "FOM_FRAMES", 24)
    monkeypatch.setattr(bench, "POS_MODES", 12)
    monkeypatch.setattr(bench, "CONSTR_MODES", 10)

    def small_mesh():
        from animsnapbases_tpu.geometry.procedural import cloth_model
        V, F = cloth_model(12, 12)
        V = V / 12.0
        V = V.copy()
        V[:, 2] += 0.05 * V[:, 0]
        V = V - V.mean(axis=0)
        return ((V / np.abs(V).max()).astype(np.float64),
                F.astype(np.int64), "small-cloth")

    monkeypatch.setattr(bench, "load_mesh", small_mesh)

    spec = importlib.util.spec_from_file_location(
        "fit_material", os.path.join(REPO, "scripts", "fit_material.py"))
    fm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fm)

    args = types.SimpleNamespace(steps=250, horizon=12, lr=0.05)
    data, ok = fm.fit_bunny(args)
    assert ok, data
    assert data["metric"] == "material_fit_max_rel_scale_error_bunny"
    assert data["value"] < 0.1
    d = data["detail"]
    assert d["groups"] == ["tris_strain", "edge_spring"] or \
        d["groups"] == ["edge_spring", "tris_strain"]
    assert "recorded" in d["bases"]
