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

    def time_cell(run, it):
        """One timed CHUNK; exits (exact-free bound trips, floor) are
        RE-ENTERED from the returned state — exactly run_steps' serving
        loop, so per-step cost includes the exit/rebase dispatches the
        variant actually pays.  Returns (us_per_step or None, exits)."""
        import jax

        done, exits = 0, 0
        P, V = P0, V0
        t0 = time.perf_counter()
        while done < CHUNK:
            Pn, Vn, k = run(P, V, Fx, rb, CHUNK - done, it)
            k = int(np.asarray(k)[0, 0])
            if k == 0:
                return None, exits        # bound can't clear post-rebase
            done += k
            if done < CHUNK:
                exits += 1
            P, V = Pn, Vn
        jax.block_until_ready(Pn)
        return (time.perf_counter() - t0) / CHUNK * 1e6, exits

    # interleaved timing: round-robin over (variant, it) cells so
    # tunnel-load drift hits every cell equally; best-of-ROUNDS per cell
    best = {name: {it: np.inf for it in ITER_COUNTS}
            for name in runners}
    cell_exits = {name: {} for name in runners}
    for rnd in range(ROUNDS):
        for name, run in runners.items():
            for it in ITER_COUNTS:
                dt_us, exits = time_cell(run, it)
                cell_exits[name][it] = exits
                if dt_us is None:
                    best[name][it] = None
                    continue
                if best[name][it] is not None:
                    best[name][it] = min(best[name][it] or np.inf, dt_us)
        log(f"[intercept] round {rnd + 1}/{ROUNDS} done")

    its_all = np.array(ITER_COUNTS, dtype=float)
    table = {}
    for name in runners:
        pts = [(it, best[name][it]) for it in ITER_COUNTS
               if best[name][it] not in (None, np.inf)]
        slope = intercept = None
        if len(pts) >= 2:
            xs = np.array([p[0] for p in pts], dtype=float)
            ys = np.array([p[1] for p in pts])
            slope, intercept = np.polyfit(xs, ys, 1)
        b10 = best[name].get(10)
        table[name] = {
            "us_per_step": {str(k): (round(v, 3) if v not in
                                     (None, np.inf) else None)
                            for k, v in best[name].items()},
            "exits": {str(k): v for k, v in cell_exits[name].items()},
            "slope_us_per_iteration": (round(float(slope), 4)
                                       if slope is not None else None),
            "intercept_us_per_step": (round(float(intercept), 4)
                                      if intercept is not None else None),
            "steps_per_sec_at_10": (round(1e6 / b10, 1)
                                    if b10 not in (None, np.inf)
                                    else None),
        }
        log(f"[intercept] {name:>15}: slope {slope} "
            f"intercept {intercept} "
            f"(@10: {table[name]['steps_per_sec_at_10']})")

    def icept(name):
        return table[name]["intercept_us_per_step"]

    def diff(a, b):
        return (round(a - b, 4)
                if a is not None and b is not None else None)

    i05, i04 = icept("r05"), icept("r04_shell")
    attribution = {
        "rb_gather_us": diff(icept("dyn_rb"), i05),
        "bound_sqrt_us": diff(icept("sqrt_bound"), i05),
        "exact_check_vs_bound_us": diff(icept("exact_per_step"), i05),
        "untaken_exact_branch_us": diff(i05, icept("exact_free")),
        "r04_to_r05_shell_cut_us": diff(i04, i05),
    }

    print(json.dumps({
        "metric": "flagship_intercept_us_per_step",
        "value": i05,
        "unit": "us/step (shell, extrapolated to 0 iterations)",
        # headroom vs the r04 shell: >1 means the round-5 cuts pay
        "vs_baseline": (round(i04 / i05, 3)
                        if i05 and i04 is not None else None),
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
