"""Batched resident kernel (ensemble serving through the flagship Pallas
path): interpret-mode equivalence with per-sim run_steps.

VERDICT r2 item 1 (batch the resident kernel) and item 7 (per-sim target
schedules in batched serving).
"""

import numpy as np

from test_resident_kernel import _poke_shift, _solver
from test_sim_reduced_position import pipeline  # noqa: F401
from test_sim_solver import gravity_forces


def _per_sim_forces(model, B):
    """B gravity fields with per-sim scaling so trajectories diverge."""
    base = gravity_forces(model)
    return np.stack([base * (1.0 + 0.15 * b) for b in range(B)])


def test_batched_resident_matches_per_sim_run_steps(pipeline):
    basis_dir, pos_path, _ = pipeline
    B = 3
    solver, model = _solver(basis_dir, pos_path, "interpret")
    assert solver._resident is not None
    run = solver.make_batched_run()

    fs = _per_sim_forces(model, B)
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 7, num_iterations=6)
    # the batched RESIDENT kernel must actually have been used
    assert solver._resident_batched.get(B) is not None
    p = np.asarray(p)
    v = np.asarray(v)

    for b in range(B):
        s_ref, m_ref = _solver(basis_dir, pos_path, "interpret")
        s_ref.run_steps(fs[b], 7, num_iterations=6)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-6)
        np.testing.assert_allclose(v[b], m_ref.velocities, atol=1e-4)


def test_batched_resident_chunks_continue_animation(pipeline):
    """Consecutive make_batched_run calls with targets_seq omitted must
    CONTINUE the model's animated schedule (internal serving frame), not
    replay the same window (round-2 advisor finding)."""
    basis_dir, pos_path, _ = pipeline
    B = 2
    solver, model = _solver(basis_dir, pos_path, "interpret")
    model.add_positional_constraint(12, wi=1e7,
                                    motion_type="user_defined",
                                    frame_shift=_poke_shift())
    solver.set_dirty()
    solver.prepare(solver.args)
    assert solver._resident is not None
    run = solver.make_batched_run()

    f = gravity_forces(model)
    fs = np.tile(f, (B, 1, 1))
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 6, num_iterations=5)
    p, v = run(p, v, fs, 6, num_iterations=5)       # chunk 2 continues

    s_ref, m_ref = _solver(basis_dir, pos_path, "interpret")
    m_ref.add_positional_constraint(12, wi=1e7,
                                    motion_type="user_defined",
                                    frame_shift=_poke_shift())
    s_ref.set_dirty()
    s_ref.prepare(s_ref.args)
    s_ref.run_steps(f, 12, num_iterations=5)
    np.testing.assert_allclose(np.asarray(p)[0], m_ref.positions,
                               atol=1e-6)


def _poked_reference(basis_dir, pos_path, shift, f, steps, iters):
    s, m = _solver(basis_dir, pos_path, "interpret")
    m.add_positional_constraint(12, wi=1e7, motion_type="user_defined",
                                frame_shift=shift)
    s.set_dirty()
    s.prepare(s.args)
    s.run_steps(f, steps, num_iterations=iters)
    return m


def _per_sim_schedule_case(pipeline, pallas_mode):
    """VERDICT item 7 'Done' criterion: 2 sims, different poke schedules,
    each matches its own single-sim run_steps."""
    basis_dir, pos_path, _ = pipeline
    B = 2
    shifts = [_poke_shift(amp=0.3), _poke_shift(amp=-0.2, per=4)]
    solver, model = _solver(basis_dir, pos_path, pallas_mode)
    model.add_positional_constraint(12, wi=1e7,
                                    motion_type="user_defined",
                                    frame_shift=shifts[0])
    solver.set_dirty()
    solver.prepare(solver.args)
    run = solver.make_batched_run()

    # per-sim (B, T, e, 3) timelines from each sim's own schedule
    from animsnapbases_tpu.sim.solver import positional_targets_timeline

    tls = []
    for b in range(B):
        model._positional[-1]["frame_shift"] = shifts[b]
        tl, animated = positional_targets_timeline(model, 0, 10)
        assert animated
        tls.append(tl)
    model._positional[-1]["frame_shift"] = shifts[0]
    T = max(t.shape[0] for t in tls)
    tls = [np.concatenate([t, np.repeat(t[-1:], T - len(t), axis=0)])
           if len(t) < T else t for t in tls]
    targets_seq = np.stack(tls)

    f = gravity_forces(model)
    fs = np.tile(f, (B, 1, 1))
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 10, num_iterations=5,
               targets_seq=targets_seq)
    p = np.asarray(p)

    for b in range(B):
        m_ref = _poked_reference(basis_dir, pos_path, shifts[b], f, 10, 5)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-5)


def test_batched_resident_per_sim_schedules(pipeline):
    _per_sim_schedule_case(pipeline, "interpret")


def test_batched_vmap_per_sim_schedules(pipeline):
    """The XLA (vmap) fallback honours per-sim (B, T, e, 3) schedules
    too."""
    _per_sim_schedule_case(pipeline, "off")


def test_batched_resident_floor_contact(pipeline):
    """One sim slammed into the floor while the other stays airborne: the
    any-sim contact branch must stay exact for BOTH."""
    basis_dir, pos_path, _ = pipeline
    B = 2
    solver, model = _solver(basis_dir, pos_path, "interpret")
    assert model.floor_collision
    run = solver.make_batched_run()

    base = gravity_forces(model)
    fs = np.stack([base, base * 40.0])      # sim 1 hits the floor
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 12, num_iterations=6)
    assert solver._resident_batched.get(B) is not None
    p = np.asarray(p)

    floored = False
    for b in range(B):
        s_ref, m_ref = _solver(basis_dir, pos_path, "interpret")
        s_ref.run_steps(fs[b], 12, num_iterations=6)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-6)
        floored = floored or np.any(
            np.asarray(m_ref.positions)[:, 1] <= m_ref.floor_height + 1e-9)
    assert floored, "test scene never touched the floor"


def test_batched_resident_block_form(tmp_path_factory):
    """Block-form interpolation (deim_pca_blocks: whole p-row blocks, W
    permuted to row-major blocks at pack time) through the BATCHED
    resident kernel — the block emitters' dim-major (3nb, pm) outputs
    must stay exact at nb > 1."""
    import test_reduced_block_form as tbf

    block_basis = tbf.block_basis.__wrapped__(tmp_path_factory)
    basis_dir, _, pos_path = block_basis
    B = 2
    solver, model = tbf._block_reduced(basis_dir, pos_path, "interpret")
    assert solver._resident is not None
    run = solver.make_batched_run()

    from test_sim_solver import gravity_forces

    base = gravity_forces(model)
    fs = np.stack([base * (1.0 + 0.2 * b) for b in range(B)])
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 9, num_iterations=6)
    assert solver._resident_batched.get(B) is not None
    p = np.asarray(p)

    for b in range(B):
        s_ref, m_ref = tbf._block_reduced(basis_dir, pos_path,
                                          "interpret")
        s_ref.run_steps(fs[b], 9, num_iterations=6)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-6)


def test_batched_standard_kernel_matches(pipeline):
    """The batched STANDARD (non-affine) resident kernel — what ensemble
    rebuilds use after an affine Mosaic failure — must match per-sim
    runs."""
    basis_dir, pos_path, _ = pipeline
    B = 2
    solver, model = _solver(basis_dir, pos_path, "interpret")
    assert solver._resident_state["use_affine"] is True
    solver._resident_state["use_affine"] = False     # simulate fallback
    solver._resident_batched = {}
    solver._batched_call_cache = {}
    run = solver.make_batched_run()

    fs = _per_sim_forces(model, B)
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 7, num_iterations=6)
    assert solver._resident_batched.get(B) is not None
    p = np.asarray(p)

    for b in range(B):
        s_ref, m_ref = _solver(basis_dir, pos_path, "interpret")
        s_ref.run_steps(fs[b], 7, num_iterations=6)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-6)


import pytest


@pytest.mark.parametrize("seed", [0, 1])
def test_batched_serving_fuzz_random_chunks(pipeline, seed):
    """Seeded fuzz of ensemble serving: random per-sim forces + a random
    animated schedule served in RANDOM chunk splits (the internal
    serving-frame counter advancing across calls) must match each sim's
    own chunked run_steps."""
    basis_dir, pos_path, _ = pipeline
    rng = np.random.default_rng(seed)
    B = 2
    shift = rng.normal(scale=0.1, size=(int(rng.integers(6, 18)), 3))
    target = int(rng.integers(0, 20))
    total_steps = 20
    chunks = []
    left = total_steps
    while left:
        n = min(int(rng.integers(1, 7)), left)
        chunks.append(n)
        left -= n

    def build(mode):
        s, m = _solver(basis_dir, pos_path, mode)
        m.add_positional_constraint(target, wi=1e6,
                                    motion_type="user_defined",
                                    frame_shift=shift.copy())
        s.set_dirty()
        s.prepare(s.args)
        return s, m

    solver, model = build("interpret")
    run = solver.make_batched_run()
    fs = np.stack([gravity_forces(model) * (1.0 + 0.2 * b)
                   for b in range(B)])
    p = np.tile(model.positions, (B, 1, 1))
    v = np.zeros_like(p)
    for n in chunks:
        p, v = run(p, v, fs, n, num_iterations=5)
    assert solver._resident_batched.get(B) is not None
    p = np.asarray(p)

    for b in range(B):
        s_ref, m_ref = build("interpret")
        for n in chunks:
            s_ref.run_steps(fs[b], n, num_iterations=5)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-5)

def test_batched_resident_sliced_over_vmem_gate(pipeline):
    """A batch too big for the VMEM gate is served in resident-kernel
    slices (one compiled sub-batch kernel reused per group, final group
    padded), NOT dropped to the vmapped XLA path — each sim must still
    match its own run_steps, including per-sim animated schedules."""
    basis_dir, pos_path, _ = pipeline
    B = 5                                  # non-divisible: pads 5 -> 2+2+2
    solver, model = _solver(basis_dir, pos_path, "interpret")
    assert solver._resident is not None

    # per-sim animated schedules exercise the tl slicing/padding too
    from animsnapbases_tpu.sim.solver import positional_targets_timeline

    shifts = [_poke_shift(amp=0.1 * (b + 1), per=3 + b) for b in range(B)]
    model.add_positional_constraint(12, wi=1e7,
                                    motion_type="user_defined",
                                    frame_shift=shifts[0])
    solver.set_dirty()
    solver.prepare(solver.args)

    orig_build = solver._build_resident_batched

    def gated(nb):
        if nb > 2:                          # simulate the VMEM gate
            solver._resident_batched[nb] = None
            return None
        return orig_build(nb)

    solver._build_resident_batched = gated
    run = solver.make_batched_run()

    tls = []
    for b in range(B):
        model._positional[-1]["frame_shift"] = shifts[b]
        tl, animated = positional_targets_timeline(model, 0, 8)
        assert animated
        tls.append(tl)
    model._positional[-1]["frame_shift"] = shifts[0]
    T = max(t.shape[0] for t in tls)
    tls = [np.concatenate([t, np.repeat(t[-1:], T - len(t), axis=0)])
           if len(t) < T else t for t in tls]
    targets_seq = np.stack(tls)

    fs = _per_sim_forces(model, B)
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 8, num_iterations=5,
               targets_seq=targets_seq)
    assert solver._last_batched_path == "batched-resident-sliced[2x3]"
    assert solver._resident_batched.get(B, "absent") is None
    p = np.asarray(p)
    v = np.asarray(v)

    for b in range(B):
        m_ref = _poked_reference(basis_dir, pos_path, shifts[b], fs[b],
                                 8, 5)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-5)
        np.testing.assert_allclose(v[b], m_ref.velocities, atol=1e-3)


def test_batched_resident_sharded_over_mesh(pipeline):
    """Multi-chip ensemble serving: make_batched_run(mesh) shards the
    batch axis over the device mesh and runs the BATCHED resident kernel
    on each local shard (DP serving, no collectives in the hot loop) —
    every sim must match its own run_steps, including per-sim animated
    schedules riding sharded with the batch."""
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from animsnapbases_tpu.parallel import build_device_mesh

    basis_dir, pos_path, _ = pipeline
    B = 8
    solver, model = _solver(basis_dir, pos_path, "interpret")
    assert solver._resident is not None

    from animsnapbases_tpu.sim.solver import positional_targets_timeline

    shifts = [_poke_shift(amp=0.05 * (b + 1), per=3 + b % 4)
              for b in range(B)]
    model.add_positional_constraint(12, wi=1e7,
                                    motion_type="user_defined",
                                    frame_shift=shifts[0])
    solver.set_dirty()
    solver.prepare(solver.args)

    mesh = build_device_mesh((4,), ("data",))
    run = solver.make_batched_run(mesh)

    tls = []
    for b in range(B):
        model._positional[-1]["frame_shift"] = shifts[b]
        tl, animated = positional_targets_timeline(model, 0, 8)
        assert animated
        tls.append(tl)
    model._positional[-1]["frame_shift"] = shifts[0]
    T = max(t.shape[0] for t in tls)
    tls = [np.concatenate([t, np.repeat(t[-1:], T - len(t), axis=0)])
           if len(t) < T else t for t in tls]
    targets_seq = np.stack(tls)

    fs = _per_sim_forces(model, B)
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 8, num_iterations=5,
               targets_seq=targets_seq)
    assert solver._last_batched_path == "batched-resident-sharded[4x2]"
    p = np.asarray(p)

    for b in range(B):
        m_ref = _poked_reference(basis_dir, pos_path, shifts[b], fs[b],
                                 8, 5)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-5)


def test_batched_resident_sharded_shared_timeline(pipeline):
    """Sharded serving with a SHARED schedule (targets_seq omitted): the
    replicated (T, 3, r) timeline broadcasts to each shard's dim-major
    layout in-body, and consecutive chunks continue the animation."""
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from animsnapbases_tpu.parallel import build_device_mesh

    basis_dir, pos_path, _ = pipeline
    B = 4
    solver, model = _solver(basis_dir, pos_path, "interpret")
    model.add_positional_constraint(12, wi=1e7,
                                    motion_type="user_defined",
                                    frame_shift=_poke_shift())
    solver.set_dirty()
    solver.prepare(solver.args)
    assert solver._resident is not None

    mesh = build_device_mesh((4,), ("data",))
    run = solver.make_batched_run(mesh)

    f = gravity_forces(model)
    fs = np.tile(f, (B, 1, 1))
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 6, num_iterations=5)
    p, v = run(p, v, fs, 6, num_iterations=5)       # chunk 2 continues
    assert solver._last_batched_path == "batched-resident-sharded[4x1]"

    s_ref, m_ref = _solver(basis_dir, pos_path, "interpret")
    m_ref.add_positional_constraint(12, wi=1e7,
                                    motion_type="user_defined",
                                    frame_shift=_poke_shift())
    s_ref.set_dirty()
    s_ref.prepare(s_ref.args)
    s_ref.run_steps(f, 12, num_iterations=5)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(p)[b], m_ref.positions,
                                   atol=1e-6)


def test_batched_resident_dispatch_failure_retries_sliced(pipeline):
    """A kernel failure at dispatch (e.g. a Mosaic VMEM overflow at the
    optimistic BATCHED_VMEM_LIMIT gate) must serve THAT call in
    power-of-two slices, not drop the whole chunk to the vmapped XLA
    path (and must poison the failing batch size for later calls)."""
    import warnings

    basis_dir, pos_path, _ = pipeline
    B = 4
    solver, model = _solver(basis_dir, pos_path, "interpret")
    assert solver._resident is not None
    run = solver.make_batched_run()

    fs = _per_sim_forces(model, B)
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)

    def boom(*a, **k):
        raise RuntimeError("synthetic Mosaic failure")

    # pre-poison the compiled-call cache so the full-batch dispatch
    # raises exactly where a real Mosaic compile failure would surface
    solver._batched_call_cache = {("batched_call", B, True): boom}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        p, v = run(pos, vel, fs, 5, num_iterations=4)
    assert solver._last_batched_path.startswith("batched-resident-sliced")
    assert solver._resident_batched.get(B) is None       # poisoned
    p = np.asarray(p)

    for b in range(B):
        s_ref, m_ref = _solver(basis_dir, pos_path, "interpret")
        s_ref.run_steps(fs[b], 5, num_iterations=4)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-6)


def test_batched_run_rejects_vertex_mismatch(pipeline):
    """A vertex-count mismatch must raise in run() (host-side): inside
    the jitted pack the gather indices would silently CLAMP under jax
    semantics and step garbage state."""
    import pytest

    basis_dir, pos_path, _ = pipeline
    solver, model = _solver(basis_dir, pos_path, "interpret")
    run = solver.make_batched_run()
    B, n = 2, model.n_verts
    good = np.tile(model.positions, (B, 1, 1))
    bad = np.zeros((B, n + 3, 3))
    f = np.zeros((B, n, 3))
    with pytest.raises(ValueError, match="must be"):
        run(bad, np.zeros_like(bad), np.zeros_like(bad), 2)
    with pytest.raises(ValueError, match="must be"):
        run(good, np.zeros_like(good), np.zeros((B, n, 4)), 2)
    with pytest.raises(ValueError, match="batch mismatch"):
        run(good, np.zeros((B + 1, n, 3)), f, 2)


def test_pow2_pad_empty_passthrough():
    """Length-0 timelines pass through pow2_pad unchanged (the inline
    padding it replaced tolerated them; np.take would raise)."""
    from animsnapbases_tpu.utils.padding import pow2_pad

    a = np.zeros((0, 4, 3))
    out = pow2_pad(a, axis=0)
    assert out.shape == (0, 4, 3)


def test_batched_nb1_reuses_solo_runner(pipeline):
    """_build_resident_batched(1) must return the already-built solo
    resident runner, not compile a second identical kernel."""
    basis_dir, pos_path, _ = pipeline
    solver, model = _solver(basis_dir, pos_path, "interpret")
    assert solver._resident is not None
    run_b = solver._build_resident_batched(1)
    assert run_b is solver._resident[0]
    # and a B=1 serving call matches run_steps through it
    run = solver.make_batched_run()
    f = gravity_forces(model)
    p, v = run(model.positions[None], np.zeros((1,) + model.positions.shape),
               f[None], 5, num_iterations=4)
    assert solver._last_batched_path == "batched-resident"
    s_ref, m_ref = _solver(basis_dir, pos_path, "interpret")
    s_ref.run_steps(f, 5, num_iterations=4)
    np.testing.assert_allclose(np.asarray(p)[0], m_ref.positions,
                               atol=1e-6)


def test_batched_resident_sharded_over_gate_slices(pipeline):
    """Sharded serving whose PER-DEVICE batch exceeds the VMEM gate must
    serve the ensemble in smaller mesh-sharded groups (mirroring the
    single-chip sliced fallback), not drop to the vmapped XLA path."""
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from animsnapbases_tpu.parallel import build_device_mesh

    basis_dir, pos_path, _ = pipeline
    B = 8                                   # Bl = 2 per device
    solver, model = _solver(basis_dir, pos_path, "interpret")
    assert solver._resident is not None

    orig_build = solver._build_resident_batched

    def gated(nb):
        if nb > 1:                          # simulate the VMEM gate
            solver._resident_batched[nb] = None
            return None
        return orig_build(nb)

    solver._build_resident_batched = gated
    mesh = build_device_mesh((4,), ("data",))
    run = solver.make_batched_run(mesh)

    fs = _per_sim_forces(model, B)
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 6, num_iterations=5)
    assert solver._last_batched_path == (
        "batched-resident-sharded-sliced[4x1x2g]")
    p = np.asarray(p)

    for b in range(B):
        s_ref, m_ref = _solver(basis_dir, pos_path, "interpret")
        s_ref.run_steps(fs[b], 6, num_iterations=5)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-6)


# ---------------------------------------------------------------------------
# batched CHUNKED kernel: the ensemble path for models whose full-state
# batched kernel exceeds VMEM (spill regime / beyond the gate)
# ---------------------------------------------------------------------------

def test_batched_chunked_matches_per_sim_run_steps(pipeline):
    """With the in-kernel batched path gated out entirely, ensemble
    serving must go through the batched CHUNKED kernel (coefficient-only
    Pallas body) and each sim must match its own run_steps."""
    basis_dir, pos_path, _ = pipeline
    B = 3
    solver, model = _solver(basis_dir, pos_path, "interpret")
    assert solver._resident_fast is not None
    solver.resident_batched_vmem_limit = 0    # no full-state batch fits
    run = solver.make_batched_run()

    fs = _per_sim_forces(model, B)
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 7, num_iterations=6)
    assert solver._last_batched_path.startswith("batched-chunked")
    assert solver._resident_batched.get(("chunked", B)) is not None
    p = np.asarray(p)
    v = np.asarray(v)

    for b in range(B):
        s_ref, m_ref = _solver(basis_dir, pos_path, "interpret")
        s_ref.run_steps(fs[b], 7, num_iterations=6)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-5)
        np.testing.assert_allclose(v[b], m_ref.velocities, atol=1e-3)


def test_batched_chunked_floor_contact_windows(pipeline):
    """Whole-batch early exit: one sim slammed into the floor stops the
    kernel for ALL sims; the committed steps stand, bounded per-step
    windows serve the contact, and stepping hands BACK to the kernel (a
    short rebase cadence forces several kernel<->window alternations).
    Every sim must still match its own run_steps."""
    basis_dir, pos_path, _ = pipeline
    B = 2
    solver, model = _solver(basis_dir, pos_path, "interpret",
                            rebase_every=2)
    assert model.floor_collision
    solver.resident_batched_vmem_limit = 0
    run = solver.make_batched_run()

    base = gravity_forces(model)
    fs = np.stack([base, base * 40.0])        # sim 1 hits the floor
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 12, num_iterations=6)
    assert solver._last_batched_path.startswith("batched-chunked+perstep")
    p = np.asarray(p)

    floored = False
    for b in range(B):
        s_ref, m_ref = _solver(basis_dir, pos_path, "interpret",
                               rebase_every=2)
        s_ref.run_steps(fs[b], 12, num_iterations=6)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-5)
        floored = floored or np.any(
            np.asarray(m_ref.positions)[:, 1]
            <= m_ref.floor_height + 1e-9)
    assert floored, "test scene never touched the floor"


def test_batched_chunked_per_sim_schedules(pipeline):
    """Per-sim animated poke schedules through the batched CHUNKED
    kernel: the (B, T, e, 3) timeline rides as dim-major (T, 3B, r) rb
    rows staged chunk-by-chunk; each sim matches its own poked
    run_steps."""
    basis_dir, pos_path, _ = pipeline
    B = 2
    shifts = [_poke_shift(amp=0.3), _poke_shift(amp=-0.2, per=4)]
    solver, model = _solver(basis_dir, pos_path, "interpret")
    model.add_positional_constraint(12, wi=1e7,
                                    motion_type="user_defined",
                                    frame_shift=shifts[0])
    solver.set_dirty()
    solver.prepare(solver.args)
    assert solver._resident_fast is not None
    solver.resident_batched_vmem_limit = 0
    run = solver.make_batched_run()

    from animsnapbases_tpu.sim.solver import positional_targets_timeline

    tls = []
    for b in range(B):
        model._positional[-1]["frame_shift"] = shifts[b]
        tl, animated = positional_targets_timeline(model, 0, 10)
        assert animated
        tls.append(tl)
    model._positional[-1]["frame_shift"] = shifts[0]
    T = max(t.shape[0] for t in tls)
    tls = [np.concatenate([t, np.repeat(t[-1:], T - len(t), axis=0)])
           if len(t) < T else t for t in tls]
    targets_seq = np.stack(tls)

    f = gravity_forces(model)
    fs = np.tile(f, (B, 1, 1))
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 10, num_iterations=5,
               targets_seq=targets_seq)
    assert solver._last_batched_path.startswith("batched-chunked")
    p = np.asarray(p)

    for b in range(B):
        m_ref = _poked_reference(basis_dir, pos_path, shifts[b], f,
                                 10, 5)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-5)


def test_batched_chunked_budget_admits_8_megacloth_sims():
    """Capacity pin for the big-model ensemble path: 8 sims of the 250k-
    vertex megacloth (r=48, bf16 matmuls, f32 state) fit the chunked
    kernel's 72 MB gate in ONE kernel — the full-state batched kernel
    admits none of them.  32 sims must be rejected."""
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    st = {"n": 250000, "r": 48, "n_sel": 153, "g_total": 167,
          "m_total": 66, "mm_dtype": np.dtype(np.float16),
          "np_dtype": np.dtype(np.float32), "use_affine": True,
          "contact_mode": False}
    gate = AnimSnapBasesSolver.RESIDENT_VMEM_LIMIT
    b8 = AnimSnapBasesSolver.batched_chunked_budget(st, 8)
    b32 = AnimSnapBasesSolver.batched_chunked_budget(st, 32)
    assert b8 <= gate, f"8-sim chunked budget {b8 / 2**20:.1f} MB over"
    assert b32 > gate, f"32-sim chunked budget {b32 / 2**20:.1f} MB under"
    # the FULL-STATE batched kernel can't even serve one such sim under
    # the batched gate — which is exactly why the chunked path exists
    full1 = AnimSnapBasesSolver.batched_resident_budget(st, 2, True)
    assert full1 > AnimSnapBasesSolver.BATCHED_VMEM_LIMIT


def test_batched_chunked_sharded_over_mesh(pipeline):
    """Multi-chip BIG-model ensemble serving: with no full-state batched
    kernel admitted, make_batched_run(mesh) must serve each device's
    local shard through the batched CHUNKED kernel under shard_map —
    every sim matching its own run_steps, per-sim schedules included."""
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from animsnapbases_tpu.parallel import build_device_mesh

    basis_dir, pos_path, _ = pipeline
    B = 8
    solver, model = _solver(basis_dir, pos_path, "interpret")
    assert solver._resident_fast is not None

    from animsnapbases_tpu.sim.solver import positional_targets_timeline

    shifts = [_poke_shift(amp=0.05 * (b + 1), per=3 + b % 4)
              for b in range(B)]
    model.add_positional_constraint(12, wi=1e7,
                                    motion_type="user_defined",
                                    frame_shift=shifts[0])
    solver.set_dirty()
    solver.prepare(solver.args)
    # gate the full-state batched builder out entirely (the nb=1 reuse
    # shortcut ignores the VMEM limit, so a limit of 0 alone still lets
    # the group recursion serve bl=1 slices)
    solver._build_resident_batched = lambda nb: None

    mesh = build_device_mesh((4,), ("data",))
    run = solver.make_batched_run(mesh)

    tls = []
    for b in range(B):
        model._positional[-1]["frame_shift"] = shifts[b]
        tl, animated = positional_targets_timeline(model, 0, 8)
        assert animated
        tls.append(tl)
    model._positional[-1]["frame_shift"] = shifts[0]
    T = max(t.shape[0] for t in tls)
    tls = [np.concatenate([t, np.repeat(t[-1:], T - len(t), axis=0)])
           if len(t) < T else t for t in tls]
    targets_seq = np.stack(tls)

    fs = _per_sim_forces(model, B)
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 8, num_iterations=5,
               targets_seq=targets_seq)
    assert solver._last_batched_path.startswith(
        "batched-chunked-sharded[4x2]")
    p = np.asarray(p)

    for b in range(B):
        m_ref = _poked_reference(basis_dir, pos_path, shifts[b], fs[b],
                                 8, 5)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-5)


def test_batched_chunked_sharded_desync_contact(pipeline):
    """Lockstep under desynchronizing contact: ONE shard's sim slams
    into the floor while the others fly free — the probe-and-retry
    protocol must re-agree on a common step count, serve the clamp in
    bounded per-step windows, hand back, and keep every sim exact."""
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from animsnapbases_tpu.parallel import build_device_mesh

    basis_dir, pos_path, _ = pipeline
    B = 4
    solver, model = _solver(basis_dir, pos_path, "interpret",
                            rebase_every=2)
    assert model.floor_collision
    solver._build_resident_batched = lambda nb: None
    mesh = build_device_mesh((4,), ("data",))
    run = solver.make_batched_run(mesh)

    base = gravity_forces(model)
    fs = np.stack([base, base * 40.0, base, base])  # shard 1 hits
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    p, v = run(pos, vel, fs, 12, num_iterations=6)
    path = solver._last_batched_path
    assert path.startswith("batched-chunked-sharded[4x1]"), path
    assert "+perstep" in path, path
    p = np.asarray(p)

    floored = False
    for b in range(B):
        s_ref, m_ref = _solver(basis_dir, pos_path, "interpret",
                               rebase_every=2)
        s_ref.run_steps(fs[b], 12, num_iterations=6)
        np.testing.assert_allclose(p[b], m_ref.positions, atol=1e-5)
        floored = floored or np.any(
            np.asarray(m_ref.positions)[:, 1]
            <= m_ref.floor_height + 1e-9)
    assert floored, "test scene never touched the floor"


def test_chunked_rb_chunk_bytes_counts_padding_and_cadence():
    """The rb VMEM gate must count what the chunked kernel actually
    stages per chunk: min(rebase cadence, T) steps x 8-sublane-aligned
    row stride x 128-lane-padded columns (round-4 review finding: the
    unpadded 1024-row default undercounted a 4096-cadence animated
    ensemble 4-10x)."""
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    s = object.__new__(AnimSnapBasesSolver)

    class M:
        n_verts = 250000          # past the large-N gate: cadence 4096
    s.model = M()
    # B=8 sims: 3*8=24 rows/step -> stride 24 (already 8-aligned);
    # r=48 -> 128 lanes; T large -> S = 4096
    assert s._chunked_rb_chunk_bytes(8, 100000, 48, 4) == \
        4096 * 24 * 128 * 4
    # short shared timeline: S = T
    assert s._chunked_rb_chunk_bytes(8, 16, 48, 4) == 16 * 24 * 128 * 4
    # solo rows pad 3 -> 8
    assert s._chunked_rb_chunk_bytes(1, 1, 48, 4) == 1 * 8 * 128 * 4
    # explicit override wins over the size default
    s.resident_rebase_every = 256
    assert s._chunked_rb_chunk_bytes(8, 100000, 48, 4) == \
        256 * 24 * 128 * 4
