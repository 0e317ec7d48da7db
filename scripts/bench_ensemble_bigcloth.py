"""Big-model ENSEMBLE serving benchmark: B simultaneous sims of the
317x317 (100,489-vertex) cloth served through ONE batched CHUNKED
affine kernel.

At this scale the full-state batched resident kernel exceeds the VMEM
gate for any nb >= 1 + headroom, so before round 3's batched chunked
path, ensemble serving of big models dropped to the vmapped per-step
loop (~1.3k steps/s per model at 250k verts) or, via the fused-slice
fallback, sequential nb=1 groups at the contact-tier rate (~39k
AGGREGATE at 100k verts, batch-size independent).  The batched CHUNKED
kernel steps the whole ensemble's coefficient state in one kernel —
its per-sim O(N) cost is ONE packed y-row block, so ~32 sims of the
100k-vertex cloth fit the 72 MB gate (capacity pinned by
tests/test_resident_batched.py::test_batched_chunked_budget_admits_8_megacloth_sims
at 250k-vert scale).

Scene matches scripts/bench_bigcloth.py: synthetic orthonormal r=48
basis, zero-force rest window (contact-free; asserted floor-clear and
finite per sim), damping 2e-3.  Prints ONE JSON line with AGGREGATE
steps/s (B x per-sim rate).

Env: ENSEMBLE_BIGCLOTH_BATCH (default 8), BIGCLOTH_ROWS (317),
ENSEMBLE_BIGCLOTH_CHUNK (default 60000), ENSEMBLE_BIGCLOTH_TRIALS (3).
"""

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

B = int(os.environ.get("ENSEMBLE_BIGCLOTH_BATCH", "8"))
ROWS = int(os.environ.get("BIGCLOTH_ROWS", "317"))
CHUNK = int(os.environ.get("ENSEMBLE_BIGCLOTH_CHUNK", "60000"))
TRIALS = int(os.environ.get("ENSEMBLE_BIGCLOTH_TRIALS", "3"))


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
        log(f"[bench_ens_bigcloth] compilation cache unavailable: {e}")

    from animsnapbases_tpu.geometry.procedural import cloth_model
    from animsnapbases_tpu.sim.model import DeformableModel
    from animsnapbases_tpu.utils.synthetic import synthetic_reduced_solver

    backend = jax.default_backend()
    log(f"[bench_ens_bigcloth] backend={backend} rows={ROWS} B={B}")

    V, F = cloth_model(ROWS, ROWS)
    V = V.copy()
    V[:, 2] += 0.1 * V[:, 0]
    model = DeformableModel(V, F, masses=np.full(len(V), 10.0),
                            floor_collision=True, init_height_shift=10.0)
    model.add_tri_constrain_strain(0.95, 1.05, wi=1e4)
    model.add_edge_spring_constraint(wi=1e4)
    model.compute_cloth_corner_indices()
    model.fix_surface_side_vertices("left")
    n = model.n_verts
    log(f"[bench_ens_bigcloth] {n} verts, {len(F)} tris")

    t0 = time.time()
    solver = synthetic_reduced_solver(
        model, r=48, dtype=jnp.float32 if backend == "tpu" else None,
        matmul_dtype=jnp.bfloat16 if backend == "tpu" else None,
        extra_args={"damping": 2e-3})
    log(f"[bench_ens_bigcloth] prepare {time.time() - t0:.1f}s "
        f"(kind={solver._resident_kind})")

    rebase = int(os.environ.get("ENSEMBLE_BIGCLOTH_REBASE", "0"))
    if rebase:
        # at nb sims the per-chunk O(nb*N) overhead (y-row min/max,
        # operand staging, rebase lifts) is nb x the solo kernel's —
        # a longer cadence amortizes it (A/B knob)
        solver.resident_rebase_every = rebase
        log(f"[bench_ens_bigcloth] rebase_every={rebase}")

    run = solver.make_batched_run()
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.tile(model.velocities, (B, 1, 1))
    fext = np.zeros_like(pos)                 # rest state: no contact

    t0 = time.time()
    p, v = run(pos, vel, fext, 100, num_iterations=10)
    p.block_until_ready()
    log(f"[bench_ens_bigcloth] first batched chunk (compile+dispatch) "
        f"{time.time() - t0:.1f}s; path: {solver._last_batched_path}")
    assert solver._last_batched_path == "batched-chunked", (
        "big-model ensemble did not serve on the batched chunked "
        f"kernel: {solver._last_batched_path}")

    # settle into the rest window once, then time resets from there
    P0, V0 = np.asarray(p), np.asarray(v)
    best = 0.0
    for t in range(TRIALS):
        p, v = jnp.asarray(P0), jnp.asarray(V0)
        t0 = time.time()
        p, v = run(p, v, fext, CHUNK, num_iterations=10)
        p.block_until_ready()
        dt = time.time() - t0
        rate = B * CHUNK / dt
        log(f"[bench_ens_bigcloth] trial {t}: {B}x{CHUNK} steps in "
            f"{dt:.3f}s -> {rate:,.0f} aggregate steps/s "
            f"({solver._last_batched_path})")
        assert solver._last_batched_path == "batched-chunked", \
            solver._last_batched_path
        best = max(best, rate)

    P = np.asarray(p)
    finite = bool(np.isfinite(P).all())
    min_y = float(P[..., 1].min())
    log(f"[bench_ens_bigcloth] certificate: finite={finite}, min y "
        f"{min_y:.2f} (floor at 0)")
    assert finite and min_y > 0.0, "timed window not contact-free/finite"

    print(json.dumps({
        "metric": "ensemble_aggregate_steps_per_sec_bigcloth",
        "value": round(best, 1),
        "unit": "steps/s",
        "vs_baseline": round(best / 10000, 3),
        "detail": {"n_verts": n, "rows": ROWS, "batch": B,
                   "chunk": CHUNK,
                   "per_sim_steps_per_sec": round(best / B, 1),
                   "batched_path": solver._last_batched_path,
                   "end_min_y": round(min_y, 2),
                   "synthetic_basis_r": 48},
    }))


if __name__ == "__main__":
    main()
