"""Contact-dominated reduced-PD benchmark (VERDICT r2 item 6).

The flagship bench scene hangs contact-free, so the affine resident
kernel's floor branch never fires and its contact-regime throughput was a
prose claim only.  This bench builds the SAME bunny scene lowered so the
body rests on the floor: every step clamps, driving the kernel's
persistent-contact path (anchored contact steps).

Caches its own FOM/bases artifacts in ``bench_cache_contact/`` (the
floor-resting scene records different snapshots than the hang).  Prints
ONE JSON line:
  {"metric": "contact_reduced_pd_steps_per_sec_bunny", "value": N,
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

# long chunks amortize the ~50-80 ms tunnel dispatch (same reasoning as
# bench.py's 180k-step chunks; the resting scene is stationary, so chunk
# length does not change what is measured)
CHUNK = 60000
N_CHUNKS = 6


def main():
    import jax
    import jax.numpy as jnp

    # floor-resting scene: hang the pins just low enough that the bunny's
    # belly presses into the floor for the whole run.  Gravity is scaled
    # up so the DAMPED reduced equilibrium genuinely needs floor support:
    # at 1x the 48-frame basis leaves the reduced body artificially stiff
    # (it never recorded deep-sag shapes) and over ~90k damped steps it
    # settles just ABOVE the floor — caught by the end-of-window
    # certificate below; at 4x the resting state presses firmly in.
    bench.BENCH_DIR = os.path.join(os.path.dirname(_HERE),
                                   "bench_cache_contact")
    bench.HANG_SHIFT = 0.75
    bench.GRAVITY_SCALE = 4.0
    # this scene LIVES on the floor: the in-kernel contact mode is the
    # fast path here (the lean tier-1 build is for contact-free scenes)
    bench.RESIDENT_CONTACT_MODE = True

    cache_dir = os.path.join(bench.BENCH_DIR, "xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        bench.log(f"[bench-contact] compilation cache unavailable: {e}")

    backend = jax.default_backend()
    dtype = jnp.float32 if backend == "tpu" else None
    bench.log(f"[bench-contact] backend={backend}")

    meta = bench.run_fom_and_bases_contact()
    solver, model = bench.build_reduced_solver(meta, dtype)
    f = bench.gravity(model)

    t0 = time.perf_counter()
    solver.run_steps(f, bench.FOM_FRAMES, num_iterations=bench.FOM_ITERS)
    bench.log(f"[bench-contact] first run_steps (compile+load) "
              f"{time.perf_counter() - t0:.1f}s; resident: "
              f"{getattr(solver, '_resident_kind', None)}")
    assert np.isfinite(model.positions).all()
    tail = np.load(os.path.join(bench.BENCH_DIR, "traj_tail.npy"))
    scale = np.abs(tail).max()
    d = np.abs(model.positions - tail) / scale
    bench.log(f"[bench-contact] reduced-vs-FOM after {bench.FOM_FRAMES} "
              f"steps: mean {d.mean():.4f}  p99 {np.quantile(d, 0.99):.4f}")
    # the scene must actually be contact-dominated
    frac = float(np.mean(model.positions[:, 1]
                         <= model.floor_height + 1e-3))
    bench.log(f"[bench-contact] fraction of verts at the floor: {frac:.3f}")
    assert frac > 0.02, "scene is not resting on the floor"

    solver.run_steps(f, 50, num_iterations=10)      # warm
    best = float("inf")
    for _ in range(N_CHUNKS):
        t0 = time.perf_counter()
        solver.run_steps(f, CHUNK, num_iterations=10)
        best = min(best, time.perf_counter() - t0)
    sps = CHUNK / best
    bench.log(f"[bench-contact] {CHUNK} steps in {best:.3f}s -> "
              f"{sps:,.0f} steps/s (contact-dominated)")
    # certify the timed window: finite, and STILL contact-dominated at
    # its end (the sustained-gravity resting scene is dissipative —
    # clamping + damping bound the energy, unlike the free-hang case)
    assert np.isfinite(model.positions).all(), \
        "timed window left non-finite state"
    end_frac = float(np.mean(model.positions[:, 1]
                             <= model.floor_height + 1e-3))
    assert end_frac > 0.02, \
        f"timed window left the floor (contact fraction {end_frac:.3f})"
    bench.log(f"[bench-contact] certificate: finite, end contact "
              f"fraction {end_frac:.3f}")

    print(json.dumps({
        "metric": "contact_reduced_pd_steps_per_sec_bunny",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / bench.BASELINE_STEPS_PER_SEC, 3),
        "detail": {"floor_contact_vert_fraction": round(frac, 3),
                   "end_contact_fraction": round(end_frac, 3),
                   "gravity_scale": bench.GRAVITY_SCALE,
                   "resident_kind": getattr(solver, "_resident_kind",
                                            None)},
    }))


if __name__ == "__main__":
    main()
