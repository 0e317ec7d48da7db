"""Accuracy-speed Pareto frontier of the reduced bunny (VERDICT r4
item 9, ref generate_figures/nl_reduction_tests.py:117-225 — the
reference sweeps component counts for its convergence figures; here
both axes are measured: on-mesh accuracy of the replay AND serving
throughput).

Grid over the flagship bunny's CACHED artifacts (truncating stored
bases, no rebuilds):

* position modes r in {16, 32, 64} at 30 constraint modes (os 4/3)
* constraint modes m in {10, 20, 30} at r=64
* DEIM oversampling os in {1.0, 4/3, 5/3} at r=64, m=24 (m chosen so
  5/3 stays within the 40-mode stored selection; os=1.0 is the SQUARE
  DEIM the docs warn destabilizes — the sweep measures that cliff)

Per point, two subprocess phases (jax platform is process-global):

* accuracy (CPU x64): replay the recorded 48-frame FOM window, mean
  rel-L2 + mean normal angle vs traj.npy
  (``analysis.accuracy.compute_accuracy_arrays``).
* speed (TPU): the certified zero-force ring-down, best-of-3 timed
  chunks with the bench's finite+floor-clear certificate.

Results cached per point in ``bench_cache/pareto/``; writes
``BENCH_pareto_r05.json`` + ``output/pareto/pareto.csv`` and prints
ONE JSON line (value = points measured; the frontier/knee lives in the
detail + PERFORMANCE.md table).
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

POINTS = [
    # (r, m, oversample, tag)
    (16, 30, 4 / 3, "r16"),
    (32, 30, 4 / 3, "r32"),
    (64, 30, 4 / 3, "flagship"),
    (64, 10, 4 / 3, "m10"),
    (64, 20, 4 / 3, "m20"),
    (64, 24, 1.0, "os1.0"),
    (64, 24, 4 / 3, "os1.33"),
    (64, 24, 5 / 3, "os1.67"),
]
CHUNK = int(os.environ.get("PARETO_CHUNK", "60000"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _solver(r, m, os_, dtype):
    import bench

    meta = bench.run_fom_and_bases()
    return bench.build_reduced_solver(meta, dtype, pos_modes=r,
                                      constr_modes=m, oversample=os_)


def phase_accuracy(r, m, os_):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import bench
    from animsnapbases_tpu.analysis.accuracy import compute_accuracy_arrays

    solver, model = _solver(r, m, os_, None)
    traj_full = np.load(os.path.join(bench.BENCH_DIR, "traj.npy"))
    traj_red = solver.run_steps(bench.gravity(model), len(traj_full),
                                num_iterations=bench.FOM_ITERS,
                                record=True)
    traj_red = np.asarray(traj_red)
    if not np.isfinite(traj_red).all():
        return {"finite": False, "rel_l2": None, "normal_angle": None}
    rows, _, _ = compute_accuracy_arrays(traj_full, traj_red, model.faces)
    return {"finite": True,
            "rel_l2": float(np.mean([x["rel_l2"] for x in rows])),
            "normal_angle": float(np.mean([x["normal_angle"]
                                           for x in rows]))}


def phase_speed(r, m, os_, hang_mult=1.0, excite_mult=1.0):
    import jax

    cache_dir = os.path.join(REPO, "bench_cache", "xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import bench

    dtype = jnp.float32 if jax.default_backend() == "tpu" else None
    # resolve the cache BEFORE touching HANG_SHIFT (it is part of the
    # artifact fingerprint — a mutated value would trigger a rebuild);
    # the hang height only shifts the contact-free window's altitude,
    # not the kernel or its cost.  Truncated-basis points sag to a
    # different equilibrium, so a grazing certificate retries higher.
    meta = bench.run_fom_and_bases()
    if not hasattr(bench, "_pareto_hang0"):
        bench._pareto_hang0 = bench.HANG_SHIFT
    bench.HANG_SHIFT = bench._pareto_hang0 * hang_mult
    solver, model = bench.build_reduced_solver(meta, dtype, pos_modes=r,
                                               constr_modes=m,
                                               oversample=os_)
    f0 = np.zeros_like(model.positions)
    model.velocities = bench.ring_down_excitation(
        model, scale=bench.EXCITE_SCALE * excite_mult)
    try:
        solver.run_steps(f0, 50, num_iterations=10)       # warm/compile
    except Exception as e:                                # unstable point
        return {"steps_per_sec": None, "stable": False, "error": str(e)}
    P0, V0 = model.positions.copy(), model.velocities.copy()
    fr0 = solver.frame
    best = np.inf
    for _ in range(3):
        model.positions, model.velocities = P0.copy(), V0.copy()
        solver.frame = fr0
        t0 = time.perf_counter()
        solver.run_steps(f0, CHUNK, num_iterations=10)
        best = min(best, time.perf_counter() - t0)
        if not np.isfinite(model.positions).all():
            return {"steps_per_sec": None, "stable": False,
                    "error": "non-finite state in timed window"}
    try:
        end_min_y = bench.certify_floor_clear(model.positions,
                                              model.velocities)
    except AssertionError as e:
        # retry ladder for truncations whose ring-down drifts floorward:
        # higher hang, then weaker excitation.  Throughput is independent
        # of both (same kernel, same step count) — they only calibrate
        # the scene into the certified contact-free regime, and the used
        # multipliers are recorded in the row.
        if "floor" in str(e):
            if hang_mult == 1.0:
                return phase_speed(r, m, os_, hang_mult=2.0)
            if excite_mult == 1.0:
                return phase_speed(r, m, os_, hang_mult=2.0,
                                   excite_mult=0.25)
        return {"steps_per_sec": None, "stable": False, "error": str(e)}
    return {"steps_per_sec": CHUNK / best, "stable": True,
            "end_min_y": end_min_y, "hang_mult": hang_mult,
            "excite_mult": excite_mult,
            "resident_kind": getattr(solver, "_resident_kind", None)}


def run_point_subprocess(phase, r, m, os_):
    cache = os.path.join(REPO, "bench_cache", "pareto",
                         f"{phase}_{r}_{m}_{os_:.3f}.json")
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase", phase,
         "--r", str(r), "--m", str(m), "--os", repr(os_)],
        capture_output=True, text=True, cwd=REPO)
    sys.stderr.write(out.stderr[-1500:])
    if out.returncode != 0:
        log(f"[pareto] {phase} r={r} m={m} os={os_:.2f} FAILED")
        return None
    res = json.loads(out.stdout.strip().splitlines()[-1])
    with open(cache, "w") as f:
        json.dump(res, f)
    return res


def main():
    rows = []
    for r, m, os_, tag in POINTS:
        log(f"[pareto] === {tag}: r={r} m={m} os={os_:.2f} ===")
        acc = run_point_subprocess("accuracy", r, m, os_)
        spd = run_point_subprocess("speed", r, m, os_)
        rows.append({"tag": tag, "r": r, "m": m,
                     "oversample": round(os_, 3),
                     **{f"acc_{k}": v for k, v in (acc or {}).items()},
                     **{f"spd_{k}": v for k, v in (spd or {}).items()}})
        log(f"[pareto] {tag}: {rows[-1]}")

    out_dir = os.path.join(REPO, "output", "pareto")
    os.makedirs(out_dir, exist_ok=True)
    import csv

    csv_path = os.path.join(out_dir, "pareto.csv")
    keys = sorted({k for row in rows for k in row})
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    log(f"[pareto] wrote {csv_path}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6.4, 4.2))
        pts = [x for x in rows if x.get("spd_steps_per_sec")
               and x.get("acc_rel_l2")]
        xs = [x["acc_rel_l2"] * 100 for x in pts]
        ys = [x["spd_steps_per_sec"] / 1e3 for x in pts]
        ax.scatter(xs, ys, zorder=3)
        for x, y, p in zip(xs, ys, pts):
            ax.annotate(p["tag"], (x, y), textcoords="offset points",
                        xytext=(6, 4), fontsize=8)
        ax.set_xlabel("mean on-mesh rel-L2 error (%)")
        ax.set_ylabel("certified throughput (k steps/s)")
        ax.set_title("bunny reduced-PD: accuracy vs speed "
                     "(48-frame replay / 60k-step ring-down)")
        ax.grid(True, alpha=0.3)
        png_path = os.path.join(out_dir, "pareto.png")
        fig.savefig(png_path, dpi=130, bbox_inches="tight")
        plt.close(fig)
        log(f"[pareto] wrote {png_path}")
    except Exception as e:                      # plot is a nicety
        log(f"[pareto] plot skipped: {e}")

    measured = [x for x in rows if x.get("spd_steps_per_sec")]
    result = {
        "metric": "pareto_points_measured",
        "value": len(measured),
        "unit": f"of {len(POINTS)} grid points",
        "vs_baseline": 1.0,
        "detail": {"rows": rows, "csv": csv_path, "chunk": CHUNK},
    }
    print(json.dumps(result))
    if len(measured) >= len(POINTS) - 1:      # os=1.0 may be unstable
        with open(os.path.join(REPO, "BENCH_pareto_r05.json"), "w") as f:
            json.dump(result, f)
        log("[pareto] wrote BENCH_pareto_r05.json")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default=None)
    ap.add_argument("--r", type=int)
    ap.add_argument("--m", type=int)
    ap.add_argument("--os", dest="os_", type=float)
    a = ap.parse_args()
    if a.phase is None:
        main()
    elif a.phase == "accuracy":
        print(json.dumps(phase_accuracy(a.r, a.m, a.os_)))
    elif a.phase == "speed":
        print(json.dumps(phase_speed(a.r, a.m, a.os_)))
    else:
        raise SystemExit(f"unknown phase {a.phase}")
