"""BEYOND-GATE resident benchmark: a 500x500 (250,000-vertex) cloth
stepping fully ON-CHIP through the chunked-only tier.

At this scale NO full-state resident kernel fits VMEM (the tiling-aware
operand estimate is ~178 MB against the 72 MB gate), so before this
tier the model fell to the ~1.3k steps/s per-step fused path.  The
CHUNKED affine kernel carries only coefficient state — its O(N)
operands are the lift's y-slice (r, N) for the exact per-step floor
check plus one packed (3, N) y-rows array — so the solver admits the
model as ``chunked-only`` (run_fn=None: contact windows go to bounded
per-step fused dispatches; the zero-force rest window timed here never
takes them, certified by ``tier1_steps``).

Uses a SYNTHETIC random orthonormal basis (r=48) like bench_bigcloth:
basis quality is irrelevant for throughput; the timed window is a
zero-force rest state asserted floor-clear and finite.  Prints ONE JSON
line.
"""

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

ROWS = int(os.environ.get("MEGACLOTH_ROWS", "500"))
CHUNK = int(os.environ.get("MEGACLOTH_CHUNK", "120000"))
TRIALS = int(os.environ.get("MEGACLOTH_TRIALS", "4"))


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
        log(f"[bench_megacloth] compilation cache unavailable: {e}")

    from animsnapbases_tpu.geometry.procedural import cloth_model
    from animsnapbases_tpu.sim.model import DeformableModel
    from animsnapbases_tpu.utils.synthetic import synthetic_reduced_solver

    backend = jax.default_backend()
    log(f"[bench_megacloth] backend={backend} rows={ROWS}")

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
    log(f"[bench_megacloth] {n} verts, {len(F)} tris")

    t0 = time.time()
    solver = synthetic_reduced_solver(
        model, r=48, dtype=jnp.float32 if backend == "tpu" else None,
        matmul_dtype=jnp.bfloat16 if backend == "tpu" else None,
        extra_args={"damping": 2e-3})
    log(f"[bench_megacloth] prepare {time.time() - t0:.1f}s "
        f"(kind={solver._resident_kind})")
    assert solver._resident_kind == "chunked-only", \
        f"expected beyond-gate admission, got {solver._resident_kind}"

    fext = np.zeros_like(model.positions)     # rest state: no contact
    t0 = time.time()
    solver.run_steps(fext, 100, num_iterations=10)
    log(f"[bench_megacloth] first run_steps (compile+dispatch) "
        f"{time.time() - t0:.1f}s; kind now: {solver._resident_kind}")

    P0 = model.positions.copy()
    V0 = model.velocities.copy()
    best = 0.0
    for t in range(TRIALS):
        model.positions = P0.copy()
        model.velocities = V0.copy()
        t0 = time.time()
        solver.run_steps(fext, CHUNK, num_iterations=10)
        dt = time.time() - t0
        rate = CHUNK / dt
        log(f"[bench_megacloth] trial {t}: {CHUNK} steps in {dt:.3f}s "
            f"-> {rate:,.0f} steps/s")
        best = max(best, rate)

    P = model.positions
    finite = bool(np.isfinite(P).all())
    min_y = float(P[:, 1].min())
    log(f"[bench_megacloth] certificate: finite={finite}, min y "
        f"{min_y:.2f} (floor at 0)")
    assert finite and min_y > 0.0, "timed window not contact-free/finite"

    print(json.dumps({
        "metric": "reduced_pd_steps_per_sec_megacloth",
        "value": round(best, 1),
        "unit": "steps/s",
        "vs_baseline": round(best / 10000, 3),
        "detail": {"n_verts": n, "rows": ROWS, "chunk": CHUNK,
                   "resident_kind": solver._resident_kind,
                   "tier1_steps": solver._last_fast_steps,
                   "end_min_y": round(min_y, 2),
                   "synthetic_basis_r": 48,
                   "rebase_every": solver._chunked_rebase_every(n),
                   "floor_exact": solver._chunked_floor_exact(n)},
    }))


if __name__ == "__main__":
    main()
