"""Real-TPU smoke checks for the paths the CPU test suite can only cover
in interpret mode (Mosaic rejects constructs interpret allows, CLAUDE.md).

Runs each check on the default backend and prints one PASS line per
check; exits non-zero on the first failure.  Uses tiny models + synthetic
bases, the persistent compilation cache, and the affine resident kernel
(the production path).

  python scripts/smoke_tpu.py            # all checks
  python scripts/smoke_tpu.py tets bend  # a subset

Checks:
  contact — floor-contact branch of the affine kernel (drop + clamp)
  tets    — tets_strain + tets_deformation_gradient group kernels
  bend    — verts_bending group kernel
  batched — make_batched_run ensemble serving
"""

import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _synthetic_reduced(model, **extra):
    import jax
    import jax.numpy as jnp

    from animsnapbases_tpu.utils.synthetic import synthetic_reduced_solver

    dt = jnp.float32 if jax.default_backend() == "tpu" else None
    return synthetic_reduced_solver(model, dtype=dt,
                                    extra_args=extra or None)


def _cloth(rows=8, cols=8, bending=False):
    from animsnapbases_tpu.geometry.procedural import cloth_model
    from animsnapbases_tpu.sim.model import DeformableModel

    V, F = cloth_model(rows, cols)
    V = V.copy()
    V[:, 2] += 0.1 * V[:, 0]
    model = DeformableModel(V, F, masses=np.full(len(V), 10.0),
                            floor_collision=True, init_height_shift=3.0)
    if bending:
        model.add_vertex_bending_constraint(1e4)
    model.add_tri_constrain_strain(0.95, 1.05, wi=1e4)
    model.add_edge_spring_constraint(wi=1e4)
    model.compute_cloth_corner_indices()
    model.fix_surface_side_vertices("left")
    return model


def _gravity(model):
    f = np.zeros_like(model.positions)
    f[:, 1] = -98.1
    return f


def check_contact():
    model = _cloth()
    solver = _synthetic_reduced(model)
    assert solver._resident is not None and solver._resident_kind == "affine"
    model.positions = model.positions.copy()
    model.positions[:, 1] -= model.positions[:, 1].min() - 0.02
    solver.run_steps(_gravity(model), 64, num_iterations=10)
    assert solver._resident is not None, "kernel fell back"
    assert solver._resident_kind == "affine", \
        "Mosaic rejected the affine kernel (standard-kernel fallback ran)"
    assert np.isfinite(model.positions).all()
    assert model.positions[:, 1].min() > -0.5, "no floor response"


def check_tets():
    from animsnapbases_tpu.geometry.procedural import bar_model
    from animsnapbases_tpu.sim.model import DeformableModel

    V, T, F, _ = bar_model(4, 3, 3)
    model = DeformableModel(V, F, elements=T,
                            masses=np.full(len(V), 10.0),
                            floor_collision=True, init_height_shift=2.0)
    model.add_tet_constrain_strain(0.95, 1.05, 1e4)
    model.add_tet_constrain_deformation_gradient(1e4)
    for i in range(len(V)):
        if V[i, 0] < V[:, 0].min() + 1e-6:
            model.fix(i)
    solver = _synthetic_reduced(model)
    assert solver._resident is not None
    solver.run_steps(_gravity(model), 64, num_iterations=10)
    assert solver._resident is not None, "tet kernels fell back"
    assert solver._resident_kind == "affine", \
        "Mosaic rejected the affine kernel (standard-kernel fallback ran)"
    assert np.isfinite(model.positions).all()


def check_bend():
    model = _cloth(bending=True)
    solver = _synthetic_reduced(model)
    assert solver._resident is not None
    solver.run_steps(_gravity(model), 64, num_iterations=10)
    assert solver._resident is not None, "bending kernel fell back"
    assert solver._resident_kind == "affine", \
        "Mosaic rejected the affine kernel (standard-kernel fallback ran)"
    assert np.isfinite(model.positions).all()


def check_batched():
    """Batched RESIDENT kernel (Mosaic, nb > 1): must compile, must match
    per-sim resident run_steps, and one sim slamming the floor must keep
    the whole batch exact (any-sim contact branch)."""
    model = _cloth()
    solver = _synthetic_reduced(model)
    assert solver._resident is not None
    run = solver.make_batched_run()
    B = 4
    base = _gravity(model)
    f = np.stack([base * (1.0 + 0.2 * b) for b in range(B - 1)]
                 + [base * 40.0])            # last sim hits the floor
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, f, 64, num_iterations=10)
    assert solver._resident_batched.get(B) is not None, \
        "Mosaic rejected the batched resident kernel (vmap fallback ran)"
    p = np.asarray(p)
    assert np.isfinite(p).all()
    for b in (0, B - 1):
        m2 = _cloth()
        s2 = _synthetic_reduced(m2)
        s2.run_steps(f[b], 64, num_iterations=10)
        assert s2._resident is not None
        err = np.abs(p[b] - m2.positions).max()
        # identical math, different rounding: the any-sim contact branch
        # runs airborne sims through the (exact) full-space step whose
        # bf16-storage dots round differently than the solo affine path —
        # ~5e-4 drift over 64 f32 steps; interpret-mode f64 matches 1e-6
        # (tests/test_resident_batched.py)
        assert err < 2e-3, f"sim {b} batched-vs-solo max err {err:.2e}"


def check_batched_poke():
    """Per-sim ANIMATED schedules through the batched resident kernel:
    the (T, 3B, r) rb-timeline layout with per-step dynamic loads at
    nb > 1 must compile under Mosaic and track each sim's own poke."""
    model = _cloth()
    solver = _synthetic_reduced(model)
    assert solver._resident is not None

    def shift(amp, per=8, cycles=2):
        seg = np.concatenate([np.linspace(0.0, amp, per // 2),
                              np.linspace(amp, 0.0, per - per // 2)])
        s = np.zeros((cycles * per, 3))
        s[:, 2] = np.tile(seg, cycles)
        return s

    B = 2
    shifts = [shift(0.4), shift(-0.3, per=6)]
    model.add_positional_constraint(10, wi=1e6,
                                    motion_type="user_defined",
                                    frame_shift=shifts[0])
    solver.set_dirty()
    solver.prepare(solver.args)
    run = solver.make_batched_run()

    from animsnapbases_tpu.sim.solver import positional_targets_timeline

    tls = []
    for b in range(B):
        model._positional[-1]["frame_shift"] = shifts[b]
        tl, animated = positional_targets_timeline(model, 0, 16)
        assert animated
        tls.append(tl)
    model._positional[-1]["frame_shift"] = shifts[0]
    T = max(len(t) for t in tls)
    tls = [np.concatenate([t, np.repeat(t[-1:], T - len(t), axis=0)])
           if len(t) < T else t for t in tls]

    f = np.tile(_gravity(model), (B, 1, 1))
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, f, 16, num_iterations=8,
               targets_seq=np.stack(tls))
    assert solver._resident_batched.get(B) is not None, \
        "Mosaic rejected the batched animated kernel (vmap fallback ran)"
    p = np.asarray(p)
    assert np.isfinite(p).all()
    for b in range(B):
        m2 = _cloth()
        s2 = _synthetic_reduced(m2)
        m2.add_positional_constraint(10, wi=1e6,
                                     motion_type="user_defined",
                                     frame_shift=shifts[b])
        s2.set_dirty()
        s2.prepare(s2.args)
        s2.run_steps(_gravity(m2), 16, num_iterations=8)
        err = np.abs(p[b] - m2.positions).max()
        assert err < 2e-3, f"sim {b} poked batched-vs-solo err {err:.2e}"


def check_damped():
    """Damped predictor (eta != 1, args.damping) under real Mosaic: the
    affine contact-mode kernel AND the lean tier-1 early-exit variant
    must compile with the damped coefficient updates and dissipate
    kinetic energy under zero external force (the bench ring-down
    relies on exactly this)."""
    rng = np.random.default_rng(7)

    def excite(model):
        v0 = rng.normal(scale=0.5, size=model.positions.shape)
        v0[model.fixed_flags] = 0.0
        return v0

    model = _cloth()
    solver = _synthetic_reduced(model, damping=0.05)
    assert solver.eta == 0.95
    assert solver._resident_kind == "affine"
    v0 = excite(model)
    model.velocities = v0.copy()
    f0 = np.zeros_like(model.positions)
    speed0 = float(np.linalg.norm(v0))
    solver.run_steps(f0, 128, num_iterations=10)
    assert solver._resident_kind == "affine", \
        "Mosaic rejected the damped affine kernel"
    assert np.isfinite(model.positions).all()
    speed1 = float(np.linalg.norm(model.velocities))
    assert speed1 < 0.5 * speed0, \
        f"damped ring-down did not decay ({speed0:.3f} -> {speed1:.3f})"

    # lean build: damped tier-1 early-exit kernel
    solver.resident_contact_mode = False
    solver.set_dirty()
    solver.prepare(solver.args)
    assert solver._resident_fast is not None, "tier-1 kernel not built"
    model.velocities = v0.copy()
    solver.run_steps(f0, 128, num_iterations=10)
    assert solver._resident_kind == "affine", \
        "Mosaic rejected the damped tier-1 kernel"
    assert np.isfinite(model.positions).all()
    assert float(np.linalg.norm(model.velocities)) < 0.5 * speed0


def check_chunked():
    """Spill-regime tiering under real Mosaic: the CHUNKED affine tier-1
    kernel (rebase in an outer XLA while_loop, coefficient-only Pallas
    body) must compile and serve contact-free windows whole, and the
    tiered handoff to the STANDARD contact kernel must survive a genuine
    floor hit.  (Exactness vs step() is pinned by the CPU interpret
    tests; this check is Mosaic acceptance.)"""
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    model = _cloth()
    old = AnimSnapBasesSolver.CHUNKED_TIER1_MIN_VERTS
    AnimSnapBasesSolver.CHUNKED_TIER1_MIN_VERTS = 4   # force spill tier
    try:
        solver = _synthetic_reduced(model, damping=0.01)
    finally:
        AnimSnapBasesSolver.CHUNKED_TIER1_MIN_VERTS = old
    assert solver._resident_kind == "standard"
    assert solver._resident_fast is not None, "chunked tier-1 not built"

    # contact-free ring-down: tier 1 must serve and certify the window
    rng = np.random.default_rng(11)
    v0 = rng.normal(scale=0.2, size=model.positions.shape)
    v0[model.fixed_flags] = 0.0
    model.velocities = v0.copy()
    f0 = np.zeros_like(model.positions)
    solver.run_steps(f0, 600, num_iterations=10)
    assert solver._resident_fast is not None, \
        "Mosaic rejected the chunked tier-1 kernel"
    assert solver._last_fast_steps == 600, \
        f"tier 1 did not serve the window ({solver._last_fast_steps})"
    assert np.isfinite(model.positions).all()

    # slam into the floor: early exit + standard-kernel remainder
    f = _gravity(model) * 30.0
    solver.run_steps(f, 400, num_iterations=10)
    assert np.isfinite(model.positions).all()
    min_y = float(model.positions[:, 1].min())
    assert min_y >= -1e-4, f"floor violated: {min_y}"
    assert solver._last_fast_steps != 400   # contact genuinely fired
    log(f"[smoke] chunked: ring-down served whole; contact window "
        f"min_y={min_y:.4f}")


def check_chunked_only():
    """BEYOND-GATE admission under real Mosaic: when no full-state
    resident kernel fits VMEM, the solver serves tier 1 on the chunked
    affine kernel alone (run_fn=None) and contact regimes on bounded
    per-step fused windows.  Forced here by inflating the full-state
    estimate — exactly what a 250k-vertex model produces."""
    from animsnapbases_tpu.ops import pallas_resident

    real = pallas_resident.estimate_vmem_bytes
    pallas_resident.estimate_vmem_bytes = lambda *a, **k: 1 << 60
    try:
        model = _cloth()
        solver = _synthetic_reduced(model, damping=0.01)
    finally:
        pallas_resident.estimate_vmem_bytes = real
    assert solver._resident_kind == "chunked-only"
    run_fn, _, _ = solver._resident
    assert run_fn is None and solver._resident_fast is not None

    # contact-free ring-down: tier 1 must serve and certify the window
    rng = np.random.default_rng(13)
    v0 = rng.normal(scale=0.2, size=model.positions.shape)
    v0[model.fixed_flags] = 0.0
    model.velocities = v0.copy()
    f0 = np.zeros_like(model.positions)
    solver.run_steps(f0, 600, num_iterations=10)
    assert solver._resident_fast is not None, \
        "Mosaic rejected the chunked-only tier-1 kernel"
    assert solver._last_fast_steps == 600, \
        f"tier 1 did not serve the window ({solver._last_fast_steps})"
    assert np.isfinite(model.positions).all()

    # slam into the floor: early exit + bounded per-step windows
    f = _gravity(model) * 30.0
    solver.run_steps(f, 400, num_iterations=10)
    assert np.isfinite(model.positions).all()
    min_y = float(model.positions[:, 1].min())
    assert min_y >= -1e-4, f"floor violated: {min_y}"
    assert solver._last_fast_steps != 400   # contact genuinely fired
    assert solver._resident is not None     # tier 1 still alive
    log(f"[smoke] chunked_only: ring-down served whole; contact window "
        f"min_y={min_y:.4f}")


def check_batched_chunked():
    """Big-model ENSEMBLE serving under real Mosaic: with no full-state
    batched kernel admitted (the 100k+-vertex regime, forced here via
    the batched gate), make_batched_run must serve the whole batch
    through ONE batched CHUNKED kernel, and survive a genuine floor hit
    via bounded per-step windows with hand-back.  (Exactness is pinned
    by the CPU interpret tests; this check is Mosaic acceptance of the
    nb>1 chunked kernel.)"""
    model = _cloth()
    solver = _synthetic_reduced(model, damping=0.01)
    assert solver._resident_fast is not None, "chunked tier-1 not built"
    solver.resident_batched_vmem_limit = 0   # no full-state batch fits
    run = solver.make_batched_run()
    B = 4

    # contact-free ring-down: the whole batch on one chunked kernel
    rng = np.random.default_rng(17)
    pos = np.tile(model.positions, (B, 1, 1))
    vel = rng.normal(scale=0.2, size=pos.shape)
    vel[:, model.fixed_flags] = 0.0
    f0 = np.zeros_like(pos)
    p, v = run(pos, vel, f0, 600, num_iterations=10)
    assert solver._last_batched_path == "batched-chunked", \
        solver._last_batched_path
    p = np.asarray(p)
    assert np.isfinite(p).all()

    # slam into the floor: whole-batch early exit + per-step windows
    f = np.tile(_gravity(model) * 30.0, (B, 1, 1))
    p, v = run(p, np.asarray(v), f, 400, num_iterations=10)
    assert solver._last_batched_path.startswith(
        "batched-chunked+perstep"), solver._last_batched_path
    p = np.asarray(p)
    assert np.isfinite(p).all()
    min_y = float(p[..., 1].min())
    assert min_y >= -1e-4, f"floor violated: {min_y}"
    log(f"[smoke] batched_chunked: B={B} ring-down on one kernel; "
        f"contact windows min_y={min_y:.4f}")


CHECKS = {"contact": check_contact, "tets": check_tets,
          "bend": check_bend, "batched": check_batched,
          "batched_poke": check_batched_poke, "damped": check_damped,
          "chunked": check_chunked, "chunked_only": check_chunked_only,
          "batched_chunked": check_batched_chunked}


def main():
    import jax

    cache = os.path.join(REPO, "bench_cache", "xla_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    backend = jax.default_backend()
    log(f"[smoke] backend={backend}")
    if backend != "tpu":
        sys.exit("[smoke] default backend is not TPU — this battery "
                 "verifies Mosaic compilation on real hardware; a CPU "
                 "run would green-light nothing (is the tunnel up?)")
    names = sys.argv[1:] or list(CHECKS)
    unknown = [n for n in names if n not in CHECKS]
    if unknown:
        sys.exit(f"[smoke] unknown check(s) {unknown}; "
                 f"available: {sorted(CHECKS)}")
    for name in names:
        t0 = time.perf_counter()
        CHECKS[name]()
        print(f"PASS {name} ({time.perf_counter() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
