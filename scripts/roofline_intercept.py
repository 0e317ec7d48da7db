"""Per-step SHELL decomposition of the flagship chunked kernel
(VERDICT r4 item 4).

``scripts/roofline.py`` fits time/step vs num_iterations: at r04 the
slope was 0.462 us/iteration and the INTERCEPT 1.891 us/step — at the
default 10 iterations the per-step shell costs as much as ~4
iterations, and nothing attributed it.  This script rebuilds the
chunked tier-1 kernel (``build_resident_affine_chunked``) under
in-process A/B toggles of each shell component on the SAME prepared
flagship operands, interleaving trials across variants so tunnel-load
drift cancels, and fits slope/intercept per variant:

* ``r05``            — round-5 defaults (static-rb load hoist +
                       sqrt-free floor bound).
* ``dyn_rb``         — per-step dynamic rb load (r04 behavior): the
                       intercept delta vs r05 is the rb-gather share.
* ``sqrt_bound``     — sqrt-form floor bound (r04): delta = the
                       dependent-sqrt share.
* ``r04_shell``      — both off: the shipped round-4 shell, the
                       baseline the cuts are measured against.
* ``exact_per_step`` — floor_bound_skip=False: the exact O(r*N) check
                       every step; delta vs r05 = what the certified
                       O(r) bound buys at flagship N.
* ``exact_free``     — floor_exact=False: no in-kernel exact branch;
                       delta = Mosaic staging pressure of the UNTAKEN
                       branch's (r, N) lift reference.

Timing uses the kernels' RAW runners on packed device state (the same
entry run_steps dispatches), so host-side shell cost is excluded; the
scene is bench.py's certified zero-force ring-down and every cell
asserts steps_done == CHUNK (whole window stayed tier-1/contact-free).

Prints ONE JSON line (metric = r05 intercept in us/step) and writes
BENCH_roofline_r05.json-style detail with the per-component table.
"""

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import bench  # noqa: E402

ITER_COUNTS = (1, 4, 7, 10)
CHUNK = int(os.environ.get("ROOFLINE_CHUNK", "60000"))
ROUNDS = int(os.environ.get("ROOFLINE_ROUNDS", "3"))

VARIANTS = {
    "r05": {},
    "dyn_rb": {"static_rb": False},
    "sqrt_bound": {"sqrt_free_bound": False},
    "r04_shell": {"static_rb": False, "sqrt_free_bound": False},
    "exact_per_step": {"floor_bound_skip": False},
    "exact_free": {"floor_exact": False},
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    cache_dir = os.path.join(bench.BENCH_DIR, "xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception as e:
        log(f"[intercept] compilation cache unavailable: {e}")
    import jax.numpy as jnp

    backend = jax.default_backend()
    dtype = jnp.float32 if backend == "tpu" else None
    log(f"[intercept] backend={backend}")

    meta = bench.run_fom_and_bases()
    solver, model = bench.build_reduced_solver(meta, dtype)
    assert solver._resident_fast_kind == "chunked"
    st = solver._resident_state
    ops = st["ops"]

    from animsnapbases_tpu.ops.pallas_resident import (
        build_resident_affine_chunked,
    )

    common = (ops, ops["gather_slices"], ops["layout"], ops["G_allT"],
              ops["WT_all"], ops["inv3"], st["U_liftT"],
              st["ut_acT"], st["M_utac"], st["U_selT"], st["mass_inv"],
              solver.dt, solver.model.floor_height, st["n_sel"])
    base_kw = dict(rebase_every=solver._chunked_rebase_every(st["n"]),
                   interpret=st["interpret"],
                   eta=getattr(solver, "eta", 1.0))
    runners = {name: build_resident_affine_chunked(*common, **base_kw,
                                                   **kw)
               for name, kw in VARIANTS.items()}

    # certified ring-down state: warm up on the production tier, then
    # pack the post-warmup state once — every cell times the IDENTICAL
    # window from the identical state
    f0 = np.zeros_like(model.positions)
    model.velocities = bench.ring_down_excitation(model)
    solver.frame = 0
    solver.run_steps(f0, 50, num_iterations=10)
    perm = st["perm"]
    cast = solver._cast
    P0 = cast(np.ascontiguousarray(model.positions[perm].T))
    V0 = cast(np.ascontiguousarray(model.velocities[perm].T))
    Fx = cast(np.ascontiguousarray(f0[perm].T))
    rb = cast(np.zeros((1, 3, solver.U.shape[1])))

    # compile/warm every (variant, iters) cell first
    for name, run in runners.items():
        for it in ITER_COUNTS:
            t0 = time.perf_counter()
            _, _, k = run(P0, V0, Fx, rb, 64, it)
            jax.block_until_ready(k)
            log(f"[intercept] warm {name}/it={it}: "
                f"{time.perf_counter() - t0:.1f}s")

    # interleaved timing: round-robin over (variant, it) cells so
    # tunnel-load drift hits every cell equally; best-of-ROUNDS per cell
    best = {name: {it: np.inf for it in ITER_COUNTS}
            for name in runners}
    for rnd in range(ROUNDS):
        for name, run in runners.items():
            for it in ITER_COUNTS:
                t0 = time.perf_counter()
                _, _, k = run(P0, V0, Fx, rb, CHUNK, it)
                k = int(np.asarray(k)[0, 0])
                dt_us = (time.perf_counter() - t0) / CHUNK * 1e6
                assert k == CHUNK, \
                    f"{name}/it={it} left tier 1 at step {k}"
                best[name][it] = min(best[name][it], dt_us)
        log(f"[intercept] round {rnd + 1}/{ROUNDS} done")

    its = np.array(ITER_COUNTS, dtype=float)
    table = {}
    for name in runners:
        ts = np.array([best[name][it] for it in ITER_COUNTS])
        slope, intercept = np.polyfit(its, ts, 1)
        table[name] = {
            "us_per_step": {str(k): round(v, 3)
                            for k, v in best[name].items()},
            "slope_us_per_iteration": round(float(slope), 4),
            "intercept_us_per_step": round(float(intercept), 4),
            "steps_per_sec_at_10": round(1e6 / best[name][10], 1),
        }
        log(f"[intercept] {name:>15}: slope {slope:.3f} "
            f"intercept {intercept:.3f} "
            f"({1e6 / best[name][10]:,.0f} steps/s @10)")

    i05 = table["r05"]["intercept_us_per_step"]
    i04 = table["r04_shell"]["intercept_us_per_step"]
    attribution = {
        "rb_gather_us": round(
            table["dyn_rb"]["intercept_us_per_step"] - i05, 4),
        "bound_sqrt_us": round(
            table["sqrt_bound"]["intercept_us_per_step"] - i05, 4),
        "exact_check_vs_bound_us": round(
            table["exact_per_step"]["intercept_us_per_step"] - i05, 4),
        "untaken_exact_branch_us": round(
            i05 - table["exact_free"]["intercept_us_per_step"], 4),
        "r04_to_r05_shell_cut_us": round(i04 - i05, 4),
    }

    print(json.dumps({
        "metric": "flagship_intercept_us_per_step",
        "value": i05,
        "unit": "us/step (shell, extrapolated to 0 iterations)",
        # headroom vs the r04 shell: >1 means the round-5 cuts pay
        "vs_baseline": round(i04 / i05, 3) if i05 > 0 else None,
        "detail": {
            "variants": table,
            "attribution_us": attribution,
            "chunk": CHUNK, "rounds": ROUNDS,
            "iter_counts": list(ITER_COUNTS),
            "shapes": {k: int(st[k]) for k in
                       ("r", "n_sel", "g_total", "m_total", "n")},
        },
    }))


if __name__ == "__main__":
    main()
