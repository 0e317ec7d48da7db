"""All-examples bases-compute sweep artifact (VERDICT r4 item 8).

The reference sweep (``all_examples_bases_compute.sh:1-12``) loops
``python main.py`` over every shipped example config, assuming each
experiment's FOM snapshots already exist on disk.  This driver makes
the artifact self-contained and committed:

* **Phase 1 (record)** replays every experiment the 14 example configs
  depend on through the scenario drivers (``demos/scenarios.py``),
  with per-experiment weight overrides chosen so the recording-path
  grammar lands EXACTLY on each config's expected
  ``p_snaps_folder`` (e.g. the bar example configs expect
  ``tets_deformation_gradient_wi1000000_`` — an int-formatted wi — so
  the recording runs at wi=1e6, not the demo JSON's 1e8).  The
  volumetric ``bunny_gFall``/``armadillo_gFall`` recordings
  tetrahedralize the reference surface meshes on the fly
  (``geometry/volume.tetrahedralize``).
* **Phase 2 (sweep)** runs ``main.py --config_file`` on all 14 configs
  as subprocesses (the reference's own loop), recording rc +
  wall-clock per config.

Writes ``BENCH_sweep_r05.json``-style output: ONE JSON line, metric =
configs green, detail = per-config wall-clock.  Recordings land in
``output/`` (gitignored); delete it to force a fresh phase 1.

Run:  python scripts/bench_sweep.py [--skip-record] [--max-frames N]
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# experiment -> (demo config, arg overrides, record positions too)
# overrides make recording_subpath() match the example configs'
# p_snaps_folder grammar exactly (ints format without ".0")
EXPERIMENTS = {
    "bar_automated_deformationgradient": (
        "bar_automated_deformationgradient.json",
        {"deformation_gradient_constraint_wi": 1000000}, False),
    "cloth_automated_bend_spring_strain": (
        "cloth_automated_bend_spring_strain.json",
        {"strain_limit_constraint_wi": 0.1}, False),
    "cloth_automated_bend": ("cloth_automated_bend.json", {}, False),
    "cloth_automated_spring": ("cloth_automated_spring.json", {}, False),
    "cloth_automated_strain": (
        "cloth_automated_strain.json",
        {"strain_limit_constraint_wi": 0.1}, False),
    "bunny_gFall": ("bunny_gFall.json", {}, True),
    "armadillo_gFall": ("armadillo_gFall.json", {}, False),
}


def _recording_complete(name, want_pos, out_dir):
    """True if a previous run already left this experiment's snapshots
    (grammar-independent: any FOM group dir with a *_p.npz under the
    experiment, plus position frames when the config consumes them) —
    lets a crashed sweep resume without re-recording the slow
    tetrahedralized scenes."""
    import glob as _glob

    p = _glob.glob(os.path.join(out_dir, "*", name, "constraint_projection",
                                "FOM", "*", "*_p.npz"))
    if not p:
        return False
    if want_pos:
        pos = _glob.glob(os.path.join(out_dir, "*", name,
                                      "position_snapshots", "FOM", "*"))
        if not pos:
            return False
    return True


def record_experiment(name, max_frames=None, out_dir=None):
    from animsnapbases_tpu.config.sim_config import SimConfig
    from animsnapbases_tpu.demos.scenarios import build_scenario

    cfg_file, overrides, want_pos = EXPERIMENTS[name]
    if _recording_complete(name, want_pos,
                           out_dir or os.path.join(REPO, "output")):
        log(f"[sweep] recording for {name} already present — skipping")
        return 0.0
    params = SimConfig(os.path.join(REPO, "configs", "demos", cfg_file))
    args = params.build_args("Cloth" if name.startswith("cloth")
                             else "Bar")
    args.solver = "Solver"                    # FOM recording
    args.output_dir = out_dir or os.path.join(REPO, "output")
    # FOM semantics: the demo JSONs carry replay-time reduction blocks,
    # but the recording grammar must be the FOM one
    # (constraint_projection/FOM/<groups>_wi..._, no reduced_ tags)
    for flag in ("vert_bending_reduced", "edge_spring_reduced",
                 "tri_strain_reduced", "tet_strain_reduced",
                 "tet_deformation_reduced", "position_reduced"):
        setattr(args, flag, False)
    for k, v in overrides.items():
        setattr(args, k, v)
    driver = build_scenario(name, args, record_fom_info=True,
                            record_positions=want_pos)
    stop = driver.stop_frame if max_frames is None else min(
        driver.stop_frame, max_frames)
    # the p-recording flush cap must cover every frame the example
    # configs read (numFrames x increment - 1)
    args.max_p_snapshots_num = stop - 1
    t0 = time.perf_counter()
    driver.run(max_frames=stop)
    wall = time.perf_counter() - t0
    assert np.isfinite(driver.model.positions).all()
    log(f"[sweep] recorded {name}: {driver.solver.frame} frames, "
        f"{wall:.1f}s -> {driver.record_path}")
    return wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-record", action="store_true",
                    help="phase 2 only (recordings already in output/)")
    ap.add_argument("--max-frames", type=int, default=None,
                    help="cap recording length (test scale)")
    ap.add_argument("--configs", nargs="*", default=None)
    ap.add_argument("--tpu", action="store_true",
                    help="let phase-2 subprocesses use the default "
                         "backend (default: pass --cpu — the reference "
                         "sweep is CPU-only, and this keeps the sweep "
                         "off a chip another bench may be holding)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")   # exact f64 recordings

    detail = {"record_s": {}, "configs": {}}
    if not args.skip_record:
        for name in EXPERIMENTS:
            detail["record_s"][name] = round(
                record_experiment(name, args.max_frames), 1)

    import glob

    cfgs = args.configs or sorted(
        glob.glob(os.path.join(REPO, "configs", "examples", "*.json")))
    n_ok = 0
    for cfg in cfgs:
        base = os.path.basename(cfg)
        t0 = time.perf_counter()
        cmd = [sys.executable, "main.py", "--config_file", cfg]
        if not args.tpu:
            cmd.append("--cpu")
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        wall = time.perf_counter() - t0
        ok = proc.returncode == 0
        n_ok += ok
        detail["configs"][base] = {"rc": proc.returncode,
                                   "wallclock_s": round(wall, 1)}
        log(f"[sweep] {base}: rc={proc.returncode} {wall:.1f}s")
        if not ok:
            log(proc.stderr[-2000:])

    total = len(cfgs)
    result = {
        "metric": "bases_sweep_configs_green",
        "value": n_ok,
        "unit": f"of {total} example configs",
        "vs_baseline": round(n_ok / max(total, 1), 3),
        "detail": detail,
    }
    print(json.dumps(result))
    if n_ok == total and args.max_frames is None and not args.configs:
        with open(os.path.join(REPO, "BENCH_sweep_r05.json"), "w") as f:
            json.dump(result, f)
        log("[sweep] wrote BENCH_sweep_r05.json")
    return 0 if n_ok == total else 1


if __name__ == "__main__":
    raise SystemExit(main())
