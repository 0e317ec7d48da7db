"""End-to-end run of scripts/fit_material.py (subprocess, CPU x64):
the twin experiment must converge and print a well-formed JSON line."""

import json
import os
import subprocess
import sys

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
