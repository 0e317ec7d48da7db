"""Ensemble-serving benchmark: many independent reduced sims on ONE chip.

Production serving runs B simultaneous reduced PD sims (e.g. per-user
cloth instances) batched through ``AnimSnapBasesSolver.make_batched_run``.
Since round 3 this routes through the BATCHED RESIDENT Pallas kernel
(dim-major (3B, N) state, shared bf16 matrices): every per-dim matvec of
the solo kernel widens from one row to B rows, so the per-step cost is
nearly batch-independent and AGGREGATE steps/s scales with B — the axis
that converts the latency-bound solo kernel into chip throughput.  The
metric is aggregate steps/s across the batch.

Reuses the bench.py bunny artifacts.  Prints ONE JSON line:
  {"metric": "ensemble_reduced_pd_aggregate_steps_per_sec", "value": N,
   "unit": "steps/s", "vs_baseline": N / 10000}
"""

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import bench  # noqa: E402

BATCH = int(os.environ.get("ENSEMBLE_BATCH", "8"))
# long chunks amortize the ~50-80 ms tunnel dispatch, exactly as the
# solo bench's 180k-step chunks do (dynamic trip count: no recompile);
# at 16384 the dispatch was still ~25 % of the chunk wall-clock
CHUNK = int(os.environ.get("ENSEMBLE_CHUNK", "65536"))
N_CHUNKS = 6


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(bench.BENCH_DIR, "xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        bench.log(f"[bench_ensemble] compilation cache unavailable: {e}")

    backend = jax.default_backend()
    dtype = jnp.float32 if backend == "tpu" else None
    bench.log(f"[bench_ensemble] backend={backend} batch={BATCH}")

    meta = bench.run_fom_and_bases()
    solver, model = bench.build_reduced_solver(meta, dtype)
    run = solver.make_batched_run()

    # timed phase: zero-force damped ring-down per sim (same certified
    # design as bench.py — sustained gravity droops the soft body onto
    # the floor mid-run), each sim excited with a differently-scaled FOM
    # tail velocity so the batch genuinely diverges
    v0 = bench.ring_down_excitation(model)
    pos = np.tile(model.positions, (BATCH, 1, 1))
    vel = np.stack([(1.0 + 0.1 * i) * v0 for i in range(BATCH)])
    f = np.zeros_like(pos)

    t0 = time.perf_counter()
    p, v = run(pos, vel, f, CHUNK, num_iterations=10)
    p.block_until_ready()
    bench.log(f"[bench_ensemble] first chunk (compile) "
              f"{time.perf_counter() - t0:.1f}s")
    path = getattr(solver, "_last_batched_path", None) or (
        "batched-resident"
        if solver._resident_batched.get(BATCH) is not None
        else "vmapped-xla")
    bench.log(f"[bench_ensemble] serving path: {path}")
    assert np.isfinite(np.asarray(p)).all()

    best = float("inf")
    for _ in range(N_CHUNKS):
        t0 = time.perf_counter()
        p2, v2 = run(p, v, f, CHUNK, num_iterations=10)
        p2.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    agg = BATCH * CHUNK / best
    bench.log(f"[bench_ensemble] {BATCH} sims x {CHUNK} steps in {best:.3f}s"
              f" -> {agg:,.0f} aggregate steps/s "
              f"({agg / BATCH:,.0f} per sim)")
    # certify the timed window across the WHOLE batch: finite and
    # floor-clear at the end
    end_min_y = bench.certify_floor_clear(p2)
    bench.log(f"[bench_ensemble] certificate: finite, min y "
              f"{end_min_y:.2f} across {BATCH} sims")

    print(json.dumps({
        "metric": "ensemble_reduced_pd_aggregate_steps_per_sec",
        "value": round(agg, 1),
        "unit": "steps/s",
        "vs_baseline": round(agg / bench.BASELINE_STEPS_PER_SEC, 3),
        "detail": {"batch": BATCH, "chunk": CHUNK, "path": path,
                   "per_sim_steps_per_sec": round(agg / BATCH, 1),
                   "end_min_y": round(end_min_y, 2)},
    }))


if __name__ == "__main__":
    main()
