"""Roofline / MFU analysis of the serving kernels (VERDICT r3 item 9).

Counts per-step arithmetic and memory traffic of the three resident
kernels FROM THE PREPARED OPERAND SHAPES (no hand-waving constants),
then measures the flagship model's steps/s at several iteration counts
in one process: the slope of time-per-step vs num_iterations is the
per-iteration cost, the intercept is the per-step overhead (predictor,
floor bound, coefficient updates).  Comparing the slope against the
dependent-dot issue floor shows how close the kernel is to the
Mosaic-issue-latency bound — the analysis behind docs/PERFORMANCE.md's
"Roofline" section.

Counted work per CONTACT-FREE step, nb sims (from ops shapes):

* iteration loop (x num_iterations, ops/pallas_resident.py
  ``_make_iteration_loop``, latency-folded round-4 form): Vall = Vc +
  rb C_all (2*3nb*r*g_total), rb = rb_const + pT WT
  (2*3nb*m_total*r) -> TWO serially-dependent dots per iteration plus
  O(g_total) elementwise projection math.  (The pre-fold loop carried
  qT: three dependent dots, 2*3nb*n_sel*g_total for the gather.)
* chunked/affine step shell (Vc-folded round-4 form): Vc formed
  straight from the reduced coordinates through the G-composed
  operands — affine combos over g_total-wide prefixes + wsn UG
  (2*3nb*r*g_total; UG = U_selT G_allT precomposed on the host, so
  the old hoisted 2*3nb*n_sel*g_total gather AND the snT_sel build
  are gone), rb_lin (2*3nb*r*r via M_utac), u = rb inv3
  (2*3nb*r*r), O(r) bound + coefficient updates.  NO O(N) term —
  that is the whole point.
* standard kernel step shell: rb_const = -(U^T A_c) s_n and the lift
  q = s_n + U u touch the (3, r, N) matrices EVERY step:
  2*2*3nb*r*N flops and (with bf16 storage) 2*3*r*N*2 bytes of VMEM
  reads per step -> per-step cost scales with N.

Prints ONE JSON line (metric = flagship MFU in percent).
"""

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import bench  # noqa: E402

# public peak numbers for TPU v5e (one chip): 197 TFLOP/s bf16,
# 819 GB/s HBM
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9
ITER_COUNTS = (1, 4, 7, 10)
CHUNK = int(os.environ.get("ROOFLINE_CHUNK", "60000"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def counted_flops(st, nb=1):
    """(per-iteration flops, chunked per-step shell flops, standard
    per-step shell flops) from the prepared resident state."""
    r = st["r"]
    n_sel = st["n_sel"]
    g_total = st["g_total"]
    m_total = st["m_total"]
    n = st["n"]
    per_iter = (2 * 3 * nb * r * g_total          # Vall = Vc + rb C_all
                + 2 * 3 * nb * m_total * r        # rb   = rb_const + pT WT
                + 60 * g_total)                   # projection elementwise
    shell_chunked = (2 * 3 * nb * r * g_total     # Vc = ... + wsn UG
                     + 6 * 3 * nb * g_total       # affine prefix combos
                     + 2 * 2 * 3 * nb * r * r     # rb_lin via M_utac + u
                     + 40 * nb * r)               # bound + coeff updates
    shell_standard = (2 * 2 * 3 * nb * r * n      # project(sn) + lift
                      + 30 * nb * n)              # predictor/clamp/vel
    return per_iter, shell_chunked, shell_standard


def main():
    import jax

    cache_dir = os.path.join(bench.BENCH_DIR, "xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception as e:
        log(f"[roofline] compilation cache unavailable: {e}")
    import jax.numpy as jnp

    backend = jax.default_backend()
    dtype = jnp.float32 if backend == "tpu" else None
    log(f"[roofline] backend={backend}")

    meta = bench.run_fom_and_bases()
    solver, model = bench.build_reduced_solver(meta, dtype)
    st = solver._resident_state
    per_iter, shell_c, shell_s = counted_flops(st)
    log(f"[roofline] shapes: r={st['r']} n_sel={st['n_sel']} "
        f"g_total={st['g_total']} m_total={st['m_total']} n={st['n']}")
    log(f"[roofline] counted: {per_iter:,} flops/iter, "
        f"chunked shell {shell_c:,}, standard shell {shell_s:,}")

    # the bench's certified ZERO-FORCE damped ring-down scene: the whole
    # timed window runs tier 1 contact-free, so the slope measures the
    # chunked kernel's iteration loop, not contact-window handoffs
    f = np.zeros_like(model.positions)
    model.velocities = bench.ring_down_excitation(model)
    # warm every iteration-count variant (each is its own compile)
    for it in ITER_COUNTS:
        t0 = time.perf_counter()
        solver.run_steps(f, 64, num_iterations=it)
        log(f"[roofline] warm it={it}: {time.perf_counter() - t0:.1f}s")

    P0 = model.positions.copy()
    V0 = model.velocities.copy()
    us_per_step = {}
    for it in ITER_COUNTS:
        best = np.inf
        for _ in range(3):
            model.positions = P0.copy()
            model.velocities = V0.copy()
            solver.frame = 0
            t0 = time.perf_counter()
            solver.run_steps(f, CHUNK, num_iterations=it)
            best = min(best, (time.perf_counter() - t0) / CHUNK * 1e6)
        us_per_step[it] = best
        log(f"[roofline] it={it}: {best:.2f} us/step "
            f"(tier1={solver._last_fast_steps})")
        assert solver._last_fast_steps == CHUNK, \
            "timed window left tier 1 — slope would be contaminated"

    its = np.array(ITER_COUNTS, dtype=float)
    ts = np.array([us_per_step[i] for i in ITER_COUNTS])
    slope, intercept = np.polyfit(its, ts, 1)       # us per iteration
    rate10 = 1e6 / us_per_step[10]
    flops_step = 10 * per_iter + shell_c
    achieved = flops_step * rate10
    mfu = achieved / PEAK_BF16_FLOPS * 100
    # issue floor: the latency-folded loop has TWO serially-dependent
    # dots per iteration; the measured per-DOT latency is slope/2
    # (lower bound on any same-shape chain)
    per_dot_us = slope / 2.0

    print(json.dumps({
        "metric": "flagship_mfu_pct",
        "value": round(mfu, 4),
        "unit": "% of 197 bf16 TFLOP/s",
        "vs_baseline": 1.0,
        "detail": {
            "steps_per_sec_at_10_iters": round(rate10, 1),
            "us_per_step": {str(k): round(v, 3)
                            for k, v in us_per_step.items()},
            "us_per_iteration_slope": round(slope, 3),
            "us_per_step_intercept": round(intercept, 3),
            "us_per_dependent_dot": round(per_dot_us, 4),
            "flops_per_step_counted": int(flops_step),
            "flops_per_iteration": int(per_iter),
            "chunked_shell_flops": int(shell_c),
            "standard_shell_flops_at_N": int(shell_s),
            "shapes": {k: int(st[k]) for k in
                       ("r", "n_sel", "g_total", "m_total", "n")},
        },
    }))


if __name__ == "__main__":
    main()
