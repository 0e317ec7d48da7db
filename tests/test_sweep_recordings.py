"""The all-examples sweep's recording phase (scripts/bench_sweep.py)
must land every experiment's snapshots EXACTLY where the shipped
example configs expect them — the reference sweep
(all_examples_bases_compute.sh:1-12) assumes the data is already laid
out; this pins the grammar contract between the scenario drivers'
recording paths and configs/examples/*.json."""

import glob
import importlib.util
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_sweep():
    spec = importlib.util.spec_from_file_location(
        "bench_sweep", os.path.join(REPO, "scripts", "bench_sweep.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _expected_dirs():
    """(config basename -> recording dir the config will read),
    derived from each example config's own grammar."""
    out = {}
    for path in sorted(glob.glob(
            os.path.join(REPO, "configs", "examples", "*.json"))):
        with open(path) as f:
            c = json.load(f)
        obj = c["object"]
        cb = c.get("constraintProj_bases", {})
        if cb.get("computeState", {}).get("compute"):
            sub = cb["constraintType"]["p_snaps_folder"].strip("/")
        else:
            sub = "position_snapshots/FOM"
        out[os.path.basename(path)] = os.path.join(
            obj["mesh"], obj["experiment"].strip("/"), sub)
    return out


def test_every_example_config_has_a_recording_experiment():
    """Each shipped example config's experiment is covered by the
    sweep's EXPERIMENTS table."""
    sweep = _load_sweep()
    experiments = set(sweep.EXPERIMENTS)
    for path in sorted(glob.glob(
            os.path.join(REPO, "configs", "examples", "*.json"))):
        with open(path) as f:
            c = json.load(f)
        exp = c["object"]["experiment"].strip("/")
        assert exp in experiments, (os.path.basename(path), exp)


def test_recordings_match_example_config_grammar(tmp_path, monkeypatch):
    """Record two representative families at test scale (a cloth family
    with wi OVERRIDES and the volumetric gFall via its fallback
    geometry) and assert the snapshots land in the exact directories
    the example configs derive."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    sweep = _load_sweep()
    out = str(tmp_path / "output")
    expected = _expected_dirs()

    # cloth strainOnly: the demo JSON's wi (1e7) must be overridden to
    # the example config's tris_strain_wi0.1_
    sweep.record_experiment("cloth_automated_strain", max_frames=6,
                            out_dir=out)
    d = os.path.join(
        out, expected["cloth_strainOnly_automated_deim_triStrainSubspace"
                      ".json"])
    assert os.path.isdir(d), d
    assert os.path.exists(os.path.join(d, "tris_strain_p.npz"))
    assert os.path.exists(os.path.join(d, "assembly_ST.npz"))

    # bunny gFall (volumetric; bar fallback so no reference mount /
    # tetrahedralization cost in tests) -> tets_strain_wi1000000_ (INT
    # formatting) + position .off sequence
    import animsnapbases_tpu.demos.scenarios as sc

    orig = sc._volumetric_mesh_geometry

    def tiny(mesh_name):
        build = orig(mesh_name)

        def wrapped(args):
            args.mesh_data_dir = "/nonexistent"
            return build(args)
        return wrapped

    monkeypatch.setattr(sc, "_volumetric_mesh_geometry", tiny)
    sweep.record_experiment("bunny_gFall", max_frames=6, out_dir=out)
    d = os.path.join(out,
                     expected["bunny_gFall_tetstrainSubspace.json"])
    assert os.path.isdir(d), d
    data = np.load(os.path.join(d, "tets_strain_p.npz"))
    assert len(data.files) >= 5
    pos = os.path.join(out, expected["bunny_gFall_posSubspace.json"])
    assert os.path.exists(os.path.join(pos, "pos_0.off"))
