"""Benchmark: reduced-PD throughput with ANIMATED positional targets.

Round-1 VERDICT item 3: the flagship throughput number only covered
constraint schedules that never move, because ``run_steps`` froze the
positional targets at the entry frame.  Round 2 ships a per-frame target
timeline with each device dispatch (``sim/reduced.py:run_steps``); this
bench measures the same bunny reduced-PD pipeline as ``bench.py`` but with
a poke-style ``user_defined`` z-shift trajectory (ref
``demos/calbacks.py:650-686,824-839``) driving one pinned vertex, so every
step consumes a different target.

Reuses the bench.py artifact cache.  Prints ONE JSON line:
  {"metric": "reduced_pd_steps_per_sec_bunny_poke", "value": N,
   "unit": "steps/s", "vs_baseline": N / 10000}
"""

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import bench  # noqa: E402  (repo-root bench.py: cache + solver builders)

# chunk of steps per device dispatch.  Power of two so the padded target
# timeline hits one compilation.  Round 4: the chunked tier-1 kernel
# streams its rb rows from the HBM-resident schedule (only rebase_every
# rows stage per inner pallas_call), so run_steps' WINDOW BYPASS lifts
# the old ~32 MB VMEM-window cap (which limited chunks to 32768 and
# left the ~50-80 ms tunnel dispatch at ~25 % of the chunk wall-clock)
# — flagship-scale chunks now amortize the dispatch below a few %.
CHUNK = 131072
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
        bench.log(f"[bench_poke] compilation cache unavailable: {e}")

    backend = jax.default_backend()
    dtype = jnp.float32 if backend == "tpu" else None
    bench.log(f"[bench_poke] backend={backend}")

    meta = bench.run_fom_and_bases()
    solver, model = bench.build_reduced_solver(meta, dtype)

    # poke trajectory long enough that the targets stay animated for one
    # whole CHUNK — every trial (and the warmup) replays frames [0, CHUNK)
    # from the same reset state, so the schedule needs CHUNK frames, not
    # trials x CHUNK; keeping it to one chunk also keeps the uploaded
    # device-resident rb schedule (CHUNK * 3 * r * 4 B = 100 MB at r=64)
    # under RB_SCHED_DEVICE_LIMIT so the window bypass path serves it
    total = CHUNK + 64
    from animsnapbases_tpu.demos.poke import create_poke_z_motion_with_jumps

    cycles = total // 48 + 1
    shift = create_poke_z_motion_with_jumps(f_l=40, f_j=8, k=cycles,
                                            z_range=0.05)
    assert len(shift) >= total
    # poke the vertex nearest the centroid (free region of the bunny)
    vi = int(np.argmin(np.linalg.norm(
        model.positions - model.positions.mean(axis=0), axis=1)))
    # wi=1e5 (was 1e7 at the round-3 32k windows): the stiff poke pin
    # resonantly pumps the hyper-reduced bunny to blow-up between 65k
    # and 98k steps at wi=1e7 (measured min-y traces: diverges at any
    # z_range, including 0.02 with 4x damping trending down) — the
    # 131072-step window needs the tame pin + doubled damping + halved
    # excitation (min-y stays 19.7-20.2 the whole window).  Per-step
    # animated-target COST is wi/amplitude-independent: the kernel does
    # the identical rb load + dot either way.
    model.add_positional_constraint(vi, wi=1e5, motion_type="user_defined",
                                    frame_shift=shift)
    solver.args.damping = 2 * bench.DAMPING
    solver.set_dirty()
    t0 = time.perf_counter()
    solver.prepare(solver.args)
    bench.log(f"[bench_poke] re-prepare with poke constraint "
              f"{time.perf_counter() - t0:.1f}s")

    # timed phase: zero-force damped ring-down excited with a scaled FOM
    # tail velocity (same certified design as bench.py) — sustained
    # gravity over a 16k-step chunk droops the under-iterated soft body
    # onto the floor, which would mix contact handling into what is meant
    # to measure the animated-target schedule.  The poke constraint
    # (wi=1e5 z-shift on one vertex — see the wi note above; 1e7
    # resonantly diverges over long windows) keeps every step consuming
    # a different target.
    model.velocities = bench.ring_down_excitation(
        model, scale=0.5 * bench.EXCITE_SCALE)
    f = np.zeros_like(model.positions)
    p0, v0 = model.positions.copy(), model.velocities.copy()

    def reset():
        # each chunk replays the same 16k poke frames from the same state:
        # a sim poked for 100k+ consecutive frames resonates out of
        # distribution (the reference's poke demos run a few hundred
        # frames), which would measure divergence, not throughput
        model.positions, model.velocities = p0.copy(), v0.copy()
        solver.frame = 0

    t0 = time.perf_counter()
    solver.run_steps(f, CHUNK, num_iterations=10)       # warmup/compile
    bench.log(f"[bench_poke] first chunk (compile) "
              f"{time.perf_counter() - t0:.1f}s")
    assert np.isfinite(model.positions).all()

    best = float("inf")
    window_proof = None
    for _ in range(N_CHUNKS):
        reset()
        t0 = time.perf_counter()
        solver.run_steps(f, CHUNK, num_iterations=10)
        best = min(best, time.perf_counter() - t0)
        if getattr(solver, "_resident_fast", None) is not None:
            ok = getattr(solver, "_last_fast_steps", None) == CHUNK
            window_proof = ok if window_proof is None else (window_proof
                                                            and ok)
    steps_per_sec = CHUNK / best
    bench.log(f"[bench_poke] {CHUNK} animated-target steps in {best:.3f}s "
              f"-> {steps_per_sec:,.0f} steps/s")
    # certify the timed window: finite + floor-clear endpoint, and on the
    # lean build the per-step tier-1 proof that no timed step touched the
    # floor (bench.py's RESIDENT_CONTACT_MODE note)
    assert window_proof is not False, \
        "tier-1 kernel exited early: the timed window touched the floor"
    end_min_y = bench.certify_floor_clear(model.positions)
    bench.log(f"[bench_poke] certificate: finite, min y {end_min_y:.2f}, "
              f"per-step proof {window_proof}")

    print(json.dumps({
        "metric": "reduced_pd_steps_per_sec_bunny_poke",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / bench.BASELINE_STEPS_PER_SEC,
                             3),
        "detail": {"end_min_y": round(end_min_y, 2),
                   "window_contact_free_proof": window_proof,
                   "chunk": CHUNK, "trials": N_CHUNKS,
                   "poke_wi": 1e5, "z_range": 0.05,
                   "damping": 2 * bench.DAMPING},
    }))


if __name__ == "__main__":
    main()
