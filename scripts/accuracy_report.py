"""On-mesh accuracy report: reduced replay vs FOM, CSV + jet heat maps.

The reference ships polyscope screenshots of per-vertex error
(``onMesh_accuracyMeasures.py:153-252``); this driver-runnable script
produces the same deliverable headlessly from the bench artifacts: it
replays the reduced solver over the recorded FOM window, writes
``on_mesh_accuracy.csv`` plus jet-colormap PNG heat maps (rel-L2 and
normal-angle, first/middle/last frames) under ``output/accuracy/``, and
prints ONE JSON line with the mean errors.

Runs on CPU by default (exact f64 replay, no tunnel dependency):
  python scripts/accuracy_report.py [--tpu]
"""

import argparse
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import bench  # noqa: E402

# Acceptance gates (VERDICT r3 item 7): committed at 2x the round-3
# artifact values (mean rel-L2 3.071e-3, mean normal angle 0.0989 rad) —
# a regression that doubles the on-mesh error fails the report and the
# bench-replay e2e instead of silently shipping a worse vs_baseline.
REL_L2_GATE = 6.2e-3
NORMAL_ANGLE_GATE = 0.20


def check_gates(mean_l2: float, mean_ang: float) -> dict:
    """Gate fields for the JSON artifact; raises on a gate violation."""
    gates = {
        "rel_l2_gate": REL_L2_GATE,
        "normal_angle_gate_rad": NORMAL_ANGLE_GATE,
        "gate_passed": bool(mean_l2 <= REL_L2_GATE
                            and mean_ang <= NORMAL_ANGLE_GATE),
    }
    if not gates["gate_passed"]:
        raise AssertionError(
            f"on-mesh accuracy regressed past the committed gate: "
            f"mean rel-L2 {mean_l2:.3e} (gate {REL_L2_GATE:.3e}), "
            f"mean normal angle {mean_ang:.3e} rad "
            f"(gate {NORMAL_ANGLE_GATE:.3e})")
    return gates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="replay on the default backend instead of CPU")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(_HERE),
                                                  "output", "accuracy"))
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    backend = jax.default_backend()
    dtype = jnp.float32 if backend == "tpu" else None
    bench.log(f"[accuracy] backend={backend}")

    meta = bench.run_fom_and_bases()
    traj_full = np.load(os.path.join(bench.BENCH_DIR, "traj.npy"))

    solver, model = bench.build_reduced_solver(meta, dtype)
    traj_red = solver.run_steps(bench.gravity(model), len(traj_full),
                                num_iterations=bench.FOM_ITERS, record=True)

    from animsnapbases_tpu.analysis.accuracy import (
        compute_accuracy_arrays,
        render_error_heatmaps,
    )

    rows, l2_maps, ang_maps = compute_accuracy_arrays(
        traj_full, np.asarray(traj_red), model.faces)

    os.makedirs(args.out, exist_ok=True)
    import csv

    csv_path = os.path.join(args.out, "on_mesh_accuracy.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["frame", "rel_l2",
                                          "normal_angle"])
        w.writeheader()
        w.writerows(rows)

    F = len(traj_full)
    sel = sorted({0, F // 2, F - 1})
    pngs = render_error_heatmaps(traj_red, model.faces, l2_maps, args.out,
                                 sel, prefix="rel_l2")
    pngs += render_error_heatmaps(traj_red, model.faces, ang_maps,
                                  args.out, sel, prefix="normal_angle")
    # rotating-camera capture of the final replay frame (VERDICT r3 item
    # 8: the reference's paper-figure rotation export,
    # nl_reduction_tests.py:244-341) — multi-angle views of the replayed
    # mesh next to the per-frame heat maps
    from animsnapbases_tpu.analysis.viewer import view_rotating_capture

    rot = view_rotating_capture(np.asarray(traj_red[-1]), model.faces,
                                os.path.join(args.out, "rotation"),
                                num_frames=8, prefix="replay_final")
    pngs += rot
    bench.log(f"[accuracy] wrote {csv_path}, {len(pngs) - len(rot)} heat "
              f"maps and {len(rot)} rotation captures")

    mean_l2 = float(np.mean([r["rel_l2"] for r in rows]))
    mean_ang = float(np.mean([r["normal_angle"] for r in rows]))
    try:
        gates = check_gates(mean_l2, mean_ang)
    except AssertionError:
        gates = {"rel_l2_gate": REL_L2_GATE,
                 "normal_angle_gate_rad": NORMAL_ANGLE_GATE,
                 "gate_passed": False}
        raise
    finally:
        print(json.dumps({
            "metric": "on_mesh_accuracy_mean_rel_l2",
            "value": round(mean_l2, 6),
            "unit": "relative L2",
            # headroom under the committed gate (>= 1 passes; the round-3
            # artifact's 1.0 placeholder had no acceptance semantics)
            "vs_baseline": round(REL_L2_GATE / max(mean_l2, 1e-30), 3),
            "detail": {"mean_normal_angle_rad": round(mean_ang, 5),
                       "frames": F, "csv": csv_path,
                       "heatmaps": [os.path.basename(p) for p in pngs],
                       **gates},
        }))


if __name__ == "__main__":
    main()
