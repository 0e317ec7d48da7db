"""Self-collision serving benchmark (VERDICT r3 item 5): an 80x80 cloth
with ``enable_self_collision="device"`` stepped through ``run_steps``.

Before round 4, ANY self-collision value dropped run_steps to the
scanned per-step path with the O(n*m) pushout pass fused into EVERY
step.  The proximity-gated tier (``_run_steps_self_collision``) probes
the clearance at window boundaries — the device pass is the IDENTITY
while every vertex stays >= min_dist from non-own candidate triangles
(ref Constraint_projections.py:1311-1419 resolves unconditionally per
step on the host) — and serves certified-clear windows on the resident
tiers, falling back to the fused per-step path near contact.

Scene: the cloth hangs from one fixed side in a damped near-rest state
(clearance >> min_dist, velocities small, so the kinematic certificate
admits long windows).  The contrast number (``per_step_fused``) is the
SAME scene timed with ``self_collision_resident=False`` — the exact
pre-tier behavior — measured in-process so tunnel load cancels.

Round-5 additions (VERDICT r4 item 5 — production scale):

* ``SC_ROWS=160`` runs a 25,600-vertex cloth, past the old 150M-pair
  hard gate — served by the row-blocked exact probe
  (``collisions_device._candidate_distances``).
* The exact probe and the cheap centroid-radius lower bound are timed
  directly (ms per call at this N).
* ``SC_CAPS`` sweeps the window cap: time/step vs 1/cap fits the
  per-window overhead (probe + loop turn) and the asymptotic tier-1
  rate — the probe-cost-vs-window-length column.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

ROWS = int(os.environ.get("SC_ROWS", "80"))
CHUNK = int(os.environ.get("SC_CHUNK", "60000"))
CHUNK_SLOW = int(os.environ.get("SC_CHUNK_SLOW", "2000"))
TRIALS = int(os.environ.get("SC_TRIALS", "3"))
CAPS = tuple(int(c) for c in os.environ.get(
    "SC_CAPS", "2048,8192,32768").split(",") if c)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(_HERE), "bench_cache",
                             "xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception as e:
        log(f"[bench_sc] compilation cache unavailable: {e}")

    from animsnapbases_tpu.geometry.procedural import cloth_model
    from animsnapbases_tpu.sim.model import DeformableModel
    from animsnapbases_tpu.utils.synthetic import synthetic_reduced_solver

    backend = jax.default_backend()
    log(f"[bench_sc] backend={backend} rows={ROWS}")

    V, F = cloth_model(ROWS, ROWS)
    V = V.copy()
    V[:, 2] += 0.1 * V[:, 0]
    model = DeformableModel(V, F, masses=np.full(len(V), 10.0),
                            floor_collision=False)
    model.add_tri_constrain_strain(0.95, 1.05, wi=1e4)
    model.add_edge_spring_constraint(wi=1e4)
    model.compute_cloth_corner_indices()
    model.fix_surface_side_vertices("left")
    n = model.n_verts
    log(f"[bench_sc] {n} verts, {len(F)} tris "
        f"(pair matrix {n * len(F) / 1e6:.0f}M)")

    t0 = time.time()
    solver = synthetic_reduced_solver(
        model, r=32, dtype=jnp.float32 if backend == "tpu" else None,
        matmul_dtype=jnp.bfloat16 if backend == "tpu" else None,
        extra_args={"damping": 2e-3})
    # rebuild with the device pass captured (prepare consumed the flag)
    solver.enable_self_collision = "device"
    solver.self_collision_window_cap = 32768
    solver.set_dirty()
    solver.prepare(solver.args)
    log(f"[bench_sc] prepare {time.time() - t0:.1f}s "
        f"(kind={solver._resident_kind}, "
        f"resident={solver._resident is not None})")
    assert solver._collision_mode == "device"
    assert solver._resident is not None

    fext = np.zeros_like(model.positions)    # near-rest ring-down
    t0 = time.time()
    solver.run_steps(fext, 200, num_iterations=10)
    log(f"[bench_sc] first run_steps (compile+dispatch) "
        f"{time.time() - t0:.1f}s")

    P0 = model.positions.copy()
    V0 = model.velocities.copy()

    def timed(steps, trials):
        best = 0.0
        for t in range(trials):
            model.positions = P0.copy()
            model.velocities = V0.copy()
            solver.frame = 0
            t0 = time.time()
            solver.run_steps(fext, steps, num_iterations=10)
            dt = time.time() - t0
            rate = steps / dt
            log(f"[bench_sc]   trial {t}: {steps} steps in {dt:.3f}s "
                f"-> {rate:,.0f} steps/s "
                f"(tier1={solver._last_fast_steps})")
            best = max(best, rate)
        return best

    log("[bench_sc] proximity-gated tier (resident windows):")
    best = timed(CHUNK, TRIALS)
    tier1 = solver._last_fast_steps
    finite = bool(np.isfinite(model.positions).all())
    clearance = solver._self_collision_clearance()
    log(f"[bench_sc] certificate: finite={finite}, tier1={tier1}, "
        f"end clearance {clearance:.4f} (min_dist 0.001)")
    assert finite and clearance > 0.001

    # --- probe cost at this N (exact top_k probe vs cheap bound) -----
    import jax

    from animsnapbases_tpu.sim.collisions_device import (
        min_clearance_device,
        min_clearance_lower_bound_device,
    )

    _, perm, iperm = solver._resident
    faces_j = jnp.asarray(iperm[np.asarray(model.faces)])
    Pt = jnp.asarray(model.positions[perm], dtype=jnp.float32)
    probe_j = jax.jit(lambda p: min_clearance_device(p, faces_j))
    bound_j = jax.jit(
        lambda p: min_clearance_lower_bound_device(p, faces_j))
    probe_ms, bound_ms = [], []
    jax.block_until_ready(probe_j(Pt))          # compile
    jax.block_until_ready(bound_j(Pt))
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(probe_j(Pt))
        probe_ms.append((time.time() - t0) * 1e3)
        t0 = time.time()
        jax.block_until_ready(bound_j(Pt))
        bound_ms.append((time.time() - t0) * 1e3)
    probe_ms, bound_ms = min(probe_ms), min(bound_ms)
    blocked = n * len(F) > 150_000_000
    log(f"[bench_sc] exact probe {probe_ms:.1f} ms, lower bound "
        f"{bound_ms:.1f} ms per call (n*m={n * len(F) / 1e6:.0f}M, "
        f"{'row-blocked' if blocked else 'single-slab'})")

    # --- probe overhead vs window length: sweep the window cap -------
    # time/step = tier1_us + overhead_us_per_window / cap  (the damped
    # near-rest scene admits full caps, so windows == cap steps)
    cap_rates = {}
    for cap in CAPS:
        solver.self_collision_window_cap = cap
        solver._sc_fused = None           # rebuild the fused loop
        solver.run_steps(fext, 200, num_iterations=10)   # compile
        cap_rates[cap] = timed(min(CHUNK, cap * 8), max(2, TRIALS - 1))
    solver.self_collision_window_cap = 32768
    solver._sc_fused = None
    xs = np.array([1.0 / c for c in CAPS])
    ys = np.array([1e6 / cap_rates[c] for c in CAPS])   # us/step
    ov_slope, tier1_us = np.polyfit(xs, ys, 1)
    log(f"[bench_sc] window-cap fit: {tier1_us:.2f} us/step asymptote "
        f"+ {ov_slope:.0f} us/window overhead "
        f"(~{ov_slope / 1e3:.1f} ms/window incl. probe+loop turn)")

    # contrast: the exact pre-tier path (pass fused into every step),
    # measured in-process on a shorter window (it is ~2 orders slower)
    log("[bench_sc] per-step fused path (pre-tier behavior):")
    solver.self_collision_resident = False
    t0 = time.time()
    solver.run_steps(fext, 50, num_iterations=10)   # compile
    log(f"[bench_sc] per-step compile+dispatch {time.time() - t0:.1f}s")
    slow = timed(CHUNK_SLOW, 1)
    solver.self_collision_resident = True

    print(json.dumps({
        "metric": "reduced_pd_steps_per_sec_selfcollision",
        "value": round(best, 1),
        "unit": "steps/s",
        "vs_baseline": round(best / 10000, 3),
        "detail": {"n_verts": n, "rows": ROWS, "chunk": CHUNK,
                   "tier1_steps": tier1,
                   "per_step_fused_steps_per_sec": round(slow, 1),
                   "speedup_vs_per_step": round(best / slow, 1),
                   "end_clearance": round(float(clearance), 4),
                   "window_cap": 32768,
                   "probe_ms": round(probe_ms, 2),
                   "bound_ms": round(bound_ms, 2),
                   "probe_blocked": blocked,
                   "cap_sweep_steps_per_sec": {
                       str(c): round(cap_rates[c], 1) for c in CAPS},
                   "overhead_us_per_window": round(float(ov_slope), 1),
                   "tier1_us_per_step_asymptote": round(float(tier1_us),
                                                        3),
                   "synthetic_basis_r": 32},
    }))


if __name__ == "__main__":
    main()
