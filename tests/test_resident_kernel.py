"""Resident multi-step kernel (whole sim loop in one pallas_call):
interpret-mode equivalence with the per-step jitted path."""

import numpy as np
import pytest

from test_sim_reduced_position import pipeline  # noqa: F401
from test_sim_solver import gravity_forces, make_cloth_solver, sim_args


def _solver(basis_dir, pos_path, pallas_mode, floor=True,
            rebase_every=None):
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    args = sim_args(
        constraint_projection_basis_type="deim_pod_vectorized",
        tri_strain_reduced=True, tri_strain_num_components=10,
        edge_spring_reduced=True, edge_spring_num_components=10,
        geom_interpolation_basis_dir=basis_dir,
        geom_interpolation_basis_file="basis.npz",
        position_reduced=True, position_num_components=14,
        position_basis_file=pos_path)
    solver = AnimSnapBasesSolver(args, pallas_mode=pallas_mode)
    _, model = make_cloth_solver(rows=5, cols=5, wi=1e4, tilt=0.15)
    if not floor:
        model.floor_collision = False
    solver.set_model(model)
    if rebase_every is not None:
        solver.resident_rebase_every = rebase_every
    solver.prepare(args)
    return solver, model


def test_resident_built_in_interpret_mode(pipeline):
    basis_dir, pos_path, _ = pipeline
    solver, _ = _solver(basis_dir, pos_path, "interpret")
    assert getattr(solver, "_resident", None) is not None


def test_resident_run_matches_step_loop(pipeline):
    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _solver(basis_dir, pos_path, "interpret")
    assert s_res._resident is not None
    s_ref, m_ref = _solver(basis_dir, pos_path, "off")
    f = gravity_forces(m_ref)

    s_res.run_steps(f, 8, num_iterations=6)     # resident path
    for _ in range(8):
        s_ref.step(f, num_iterations=6)

    assert s_res.frame == 8
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m_res.velocities, m_ref.velocities, atol=1e-4)


def _poke_shift(cycles=3, per=6, amp=0.3):
    seg = np.concatenate([np.linspace(0.0, amp, per // 2),
                          np.linspace(amp, 0.0, per - per // 2)])
    shift = np.zeros((cycles * per, 3))
    shift[:, 2] = np.tile(seg, cycles)
    return shift


def _add_poke(solver, model):
    model.add_positional_constraint(12, wi=1e7,
                                    motion_type="user_defined",
                                    frame_shift=_poke_shift())
    solver.set_dirty()
    solver.prepare(solver.args)


def test_resident_animated_targets_match_step_loop(pipeline):
    """VERDICT r1 item 3: a 3-cycle poke schedule (animated positional
    targets) replayed through the RESIDENT kernel must match per-frame
    step() — the target timeline ships with the call instead of being
    frozen at the entry frame."""
    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _solver(basis_dir, pos_path, "interpret")
    _add_poke(s_res, m_res)
    assert s_res._resident is not None
    s_ref, m_ref = _solver(basis_dir, pos_path, "off")
    _add_poke(s_ref, m_ref)
    f = gravity_forces(m_ref)

    s_res.run_steps(f, 18, num_iterations=6)    # resident, one dispatch
    for _ in range(18):
        s_ref.step(f, num_iterations=6)

    assert s_res.frame == 18
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-5)


def test_resident_animated_targets_past_schedule_end(pipeline):
    """Chunked resident replay that runs PAST the poke schedule's last
    frame: the device-resident rb timeline must clamp to its final value
    (frame-shift clamp semantics), exactly like the per-frame step()."""
    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _solver(basis_dir, pos_path, "interpret")
    _add_poke(s_res, m_res)              # 18-frame schedule
    assert s_res._resident is not None
    s_ref, m_ref = _solver(basis_dir, pos_path, "off")
    _add_poke(s_ref, m_ref)
    f = gravity_forces(m_ref)

    for n in (10, 10, 10):               # 30 frames total, 12 past the end
        s_res.run_steps(f, n, num_iterations=6)
    for _ in range(30):
        s_ref.step(f, num_iterations=6)

    assert s_res.frame == 30
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-5)


def test_run_jit_animated_targets_match_step_loop(pipeline):
    """Same poke replay through the XLA run_steps path (pallas off),
    split into chunks the way scenario schedules drive it."""
    basis_dir, pos_path, _ = pipeline
    s_a, m_a = _solver(basis_dir, pos_path, "off")
    _add_poke(s_a, m_a)
    s_b, m_b = _solver(basis_dir, pos_path, "off")
    _add_poke(s_b, m_b)
    f = gravity_forces(m_a)

    for _ in range(18):
        s_a.step(f, num_iterations=6)
    for _ in range(3):
        s_b.run_steps(f, 6, num_iterations=6)

    assert s_b.frame == 18
    np.testing.assert_allclose(m_b.positions, m_a.positions, atol=1e-8)
    np.testing.assert_allclose(m_b.velocities, m_a.velocities, atol=1e-7)


def test_affine_kernel_is_default(pipeline):
    """The affine kernel is the default for floor-on AND floor-off models
    (floor contact is handled by the adaptive in-kernel branch)."""
    basis_dir, pos_path, _ = pipeline
    s, _ = _solver(basis_dir, pos_path, "interpret", floor=False)
    assert s._resident is not None
    assert s._resident_kind == "affine"
    s2, _ = _solver(basis_dir, pos_path, "interpret", floor=True)
    assert s2._resident is not None
    assert s2._resident_kind == "affine"


def test_affine_floor_contact_matches_step_loop(pipeline):
    """A cloth hovering just above the floor drops INTO it: the adaptive
    contact branch (materialize + clamp + standard step + re-anchor) must
    match the per-frame jitted step exactly, across rebase boundaries."""
    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _solver(basis_dir, pos_path, "interpret", floor=True,
                           rebase_every=4)
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=True)
    for m in (m_res, m_ref):
        m.positions = m.positions.copy()
        m.positions[:, 1] -= 2.92        # hover just above the floor
    f = gravity_forces(m_ref)

    s_res.run_steps(f, 14, num_iterations=6)
    for _ in range(14):
        s_ref.step(f, num_iterations=6)

    assert s_res._resident is not None, "affine kernel fell back"
    # the scene genuinely reached the floor in BOTH runs (the clamp
    # branch fired in the resident kernel too, not just the reference)
    assert float(m_ref.positions[:, 1].min()) < 0.06
    assert float(m_res.positions[:, 1].min()) < 0.06
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-5)
    np.testing.assert_allclose(m_res.velocities, m_ref.velocities,
                               atol=1e-4)


def test_affine_matches_step_loop(pipeline):
    """Contact-free scene: the affine-coordinate resident kernel must
    match the per-frame jitted step() exactly (same math, no clamp)."""
    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _solver(basis_dir, pos_path, "interpret", floor=False)
    assert s_res._resident_kind == "affine"
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=False)
    f = gravity_forces(m_ref)

    s_res.run_steps(f, 8, num_iterations=6)
    for _ in range(8):
        s_ref.step(f, num_iterations=6)

    assert s_res._resident is not None, "affine kernel fell back"
    assert s_res.frame == 8
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m_res.velocities, m_ref.velocities,
                               atol=1e-4)


def test_affine_rebase_crossing_matches(pipeline):
    """A run that crosses several rebase boundaries (rebase_every=4) must
    agree with the per-frame step loop — the re-anchored bases and reset
    coefficients represent the same state."""
    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _solver(basis_dir, pos_path, "interpret", floor=False,
                           rebase_every=4)
    assert s_res._resident_kind == "affine"
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=False)
    f = gravity_forces(m_ref)

    s_res.run_steps(f, 19, num_iterations=6)   # 4 rebases
    for _ in range(19):
        s_ref.step(f, num_iterations=6)

    assert s_res._resident is not None, "affine kernel fell back"
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-6)


def test_affine_animated_targets_match(pipeline):
    """Poke schedule through the affine kernel: the rb timeline applies
    per step and the run continues past the schedule end (clamped)."""
    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _solver(basis_dir, pos_path, "interpret", floor=False,
                           rebase_every=8)
    _add_poke(s_res, m_res)
    assert s_res._resident_kind == "affine"
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=False)
    _add_poke(s_ref, m_ref)
    f = gravity_forces(m_ref)

    for n in (12, 12):                   # 24 frames, 6 past schedule end
        s_res.run_steps(f, n, num_iterations=6)
    for _ in range(24):
        s_ref.step(f, num_iterations=6)

    assert s_res._resident is not None, "affine kernel fell back"
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-5)


def test_window_bypass_animated_matches_step_loop(pipeline):
    """Round-4 WINDOW BYPASS: when the animated rb window exceeds the
    VMEM allowance but tier 1 is the CHUNKED kernel (which streams rb
    rows from the HBM-resident schedule), run_steps must serve the whole
    call in one tier-1 dispatch instead of dropping to the per-step path
    — and still match per-frame step() exactly."""
    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _solver(basis_dir, pos_path, "interpret", floor=False,
                           rebase_every=8)
    _add_poke(s_res, m_res)
    assert s_res._resident_fast_kind == "chunked"
    # shrink the allowance so the 18-frame poke window overflows it
    itemsize = 8      # interpret mode keeps f64 state
    r = s_res.U.shape[1]
    s_res._rb_seq_limit = 4 * 3 * r * itemsize          # 4-step window
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=False)
    _add_poke(s_ref, m_ref)
    f = gravity_forces(m_ref)

    s_res.run_steps(f, 18, num_iterations=6)     # ONE bypassed dispatch
    for _ in range(18):
        s_ref.step(f, num_iterations=6)

    assert s_res._resident is not None
    assert s_res.frame == 18
    # tier 1 covered the entire window (contact-free, floor off)
    assert s_res._last_fast_steps == 18
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-5)


def test_window_bypass_bounded_contact_windows(pipeline):
    """WINDOW BYPASS with floor contact: the full-state contact tier
    still holds its rb window in VMEM, so its serve length is capped to
    the allowance and the remainder recurses — trajectory must match the
    per-frame step loop through the tier handoffs."""
    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _solver(basis_dir, pos_path, "interpret", floor=True,
                           rebase_every=4)
    _add_poke(s_res, m_res)
    assert s_res._resident_fast_kind == "chunked"
    itemsize = 8
    r = s_res.U.shape[1]
    s_res._rb_seq_limit = 4 * 3 * r * itemsize          # cap = 4 steps
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=True)
    _add_poke(s_ref, m_ref)
    for m in (m_res, m_ref):
        m.positions = m.positions.copy()
        m.velocities = m.velocities.copy()
        # graze the floor with downward momentum: the strong constraints
        # (wi=1e4/1e7) hold a resting cloth up, so push it into the floor
        # a few steps into the window
        m.positions[:, 1] -= 2.9
        m.velocities[:, 1] -= 0.5
    f = gravity_forces(m_ref)

    # spy on the contact tier: the bypass must serve it in capped windows
    run_fn, perm, iperm = s_res._resident
    contact_calls = []

    class Spy:
        windowed = staticmethod(
            lambda P, V, Fx, sched, frame, t_pad, n, ni:
            (contact_calls.append((n, t_pad)),
             run_fn.windowed(P, V, Fx, sched, frame, t_pad, n, ni))[1])

        def __call__(self, *a, **k):
            contact_calls.append(("plain",))
            return run_fn(*a, **k)

    s_res._resident = (Spy(), perm, iperm)
    s_res.run_steps(f, 14, num_iterations=6)
    for _ in range(14):
        s_ref.step(f, num_iterations=6)

    assert s_res.frame == 14
    # the contact tier really served bounded windows (<= 4-step cap)
    assert contact_calls, "contact tier never ran — scene stayed airborne"
    assert all(c[0] != "plain" and c[0] <= 4 for c in contact_calls), \
        contact_calls
    # the scene genuinely reached the floor in both runs
    assert float(m_ref.positions[:, 1].min()) < 0.01
    assert float(m_res.positions[:, 1].min()) < 0.01
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-5)
    np.testing.assert_allclose(m_res.velocities, m_ref.velocities,
                               atol=1e-4)


def test_recorded_run_steps_matches_step_loop(pipeline):
    """run_steps(record=True) captures the per-frame trajectory on device
    (one dispatch) and must equal the per-frame step() trajectory exactly,
    including animated targets and chunked calls with a pow2 buffer cap."""
    basis_dir, pos_path, _ = pipeline
    s_a, m_a = _solver(basis_dir, pos_path, "off")
    _add_poke(s_a, m_a)
    s_b, m_b = _solver(basis_dir, pos_path, "off")
    _add_poke(s_b, m_b)
    f = gravity_forces(m_a)

    ref_traj = []
    for _ in range(13):
        s_a.step(f, num_iterations=6)
        ref_traj.append(m_a.positions.copy())
    traj1 = s_b.run_steps(f, 6, num_iterations=6, record=True)
    traj2 = s_b.run_steps(f, 7, num_iterations=6, record=True)

    assert traj1.shape == (6, m_b.positions.shape[0], 3)
    assert traj2.shape == (7, m_b.positions.shape[0], 3)
    np.testing.assert_allclose(np.concatenate([traj1, traj2]),
                               np.array(ref_traj), atol=1e-8)
    np.testing.assert_allclose(m_b.positions, m_a.positions, atol=1e-8)
    assert s_b.frame == 13


def test_recorded_run_sets_floor_corrections(pipeline):
    """run_steps(record=True) must leave model.positions_corrections at
    the LAST step's raw-minus-clamped predictor, matching the per-frame
    convention (round-2 advisor finding: chunked record=True replays left
    the floor-correction state stale)."""
    basis_dir, pos_path, _ = pipeline
    s, m = _solver(basis_dir, pos_path, "off")
    f = gravity_forces(m) * 50.0                  # drive into the floor
    s.run_steps(f, 12, num_iterations=6, record=True)
    p0, v0 = m.positions.copy(), m.velocities.copy()
    s.run_steps(f, 1, num_iterations=6, record=True)

    dt = s.dt
    sn_y = p0[:, 1] + dt * v0[:, 1] + dt * dt * f[:, 1] / m.mass
    expected = np.minimum(sn_y - m.floor_height, 0.0)
    assert expected.min() < 0, "scene never reached the floor"
    np.testing.assert_allclose(m.positions_corrections[:, 1], expected,
                               atol=1e-8)
    assert np.all(m.positions_corrections[:, [0, 2]] == 0)


def test_oversized_schedule_host_window_fallback(pipeline):
    """Schedules past RB_SCHED_DEVICE_LIMIT are never uploaded whole: the
    per-call window is built on host and shipped with the call, matching
    the device-schedule path exactly."""
    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _solver(basis_dir, pos_path, "interpret", floor=False)
    _add_poke(s_res, m_res)
    s_res.RB_SCHED_DEVICE_LIMIT = 0          # force the host-window path
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=False)
    _add_poke(s_ref, m_ref)
    f = gravity_forces(m_ref)

    for n in (9, 9):
        s_res.run_steps(f, n, num_iterations=6)
    for _ in range(18):
        s_ref.step(f, num_iterations=6)

    assert s_res._resident is not None
    assert s_res._rb_sched is False          # device schedule was refused
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-5)


def test_affine_compile_failure_retries_standard_kernel(pipeline):
    """A (simulated) Mosaic rejection of the affine kernel must rebuild
    the STANDARD resident kernel and retry — not drop all the way to the
    per-step fused path."""
    import warnings

    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _solver(basis_dir, pos_path, "interpret", floor=True)
    assert s_res._resident_kind == "affine"
    _, perm, iperm = s_res._resident

    def boom(*a, **k):
        raise RuntimeError("simulated Mosaic failure")

    boom.windowed = boom
    s_res._resident = (boom, perm, iperm)
    # force tier 2: the contact-less early-exit tier would otherwise
    # serve the whole contact-free run without touching the broken kernel
    s_res._resident_fast = None

    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=True)
    f = gravity_forces(m_ref)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s_res.run_steps(f, 6, num_iterations=6)
    assert any("retrying with the standard" in str(x.message) for x in w)
    assert s_res._resident is not None
    assert s_res._resident_kind == "standard"
    for _ in range(6):
        s_ref.step(f, num_iterations=6)
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-6)


def test_resident_vmem_gate():
    """Oversized problems must fall back (estimate above budget)."""
    from animsnapbases_tpu.ops.pallas_resident import estimate_vmem_bytes

    gate = 48 * (1 << 20)
    # bunny bf16 (~11 MB big matrices) and bridge bf16 (~38 MB) both fit
    assert estimate_vmem_bytes(14290, 64, 200, 300, 80, 2, 4) < gate
    assert estimate_vmem_bytes(51368, 64, 400, 300, 80, 2, 4) < gate
    # a 200k-vertex f32 problem does not
    assert estimate_vmem_bytes(200_000, 64, 400, 300, 80, 4, 4) > gate


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_resident_fuzz_random_targets_and_chunks(pipeline, seed):
    """Seeded fuzz: a RANDOM frame-shift trajectory replayed through the
    resident kernel in RANDOM chunk splits must match per-frame step()."""
    basis_dir, pos_path, _ = pipeline
    rng = np.random.default_rng(seed)
    shift = rng.normal(scale=0.1, size=(int(rng.integers(6, 20)), 3))
    target = int(rng.integers(0, 20))
    rebase = int(rng.integers(3, 9))

    def build(mode, rebase_every=None):
        solver, model = _solver(basis_dir, pos_path, mode, floor=False,
                                rebase_every=rebase_every)
        model.add_positional_constraint(target, wi=1e6,
                                        motion_type="user_defined",
                                        frame_shift=shift.copy())
        solver.set_dirty()
        solver.prepare(solver.args)
        return solver, model

    s_res, m_res = build("interpret", rebase_every=rebase)
    s_ref, m_ref = build("off")
    f = gravity_forces(m_ref)

    total = 0
    while total < 24:
        n = min(int(rng.integers(1, 8)), 24 - total)
        s_res.run_steps(f, n, num_iterations=5)
        total += n
    for _ in range(24):
        s_ref.step(f, num_iterations=5)

    assert s_res._resident is not None
    assert s_res.frame == 24
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-5)


def test_lean_contact_variant_matches_step_loop(pipeline):
    """contact_mode=False (the large-model build: re-anchoring contact
    tail instead of the contact-mode machinery) must match the per-frame
    step exactly through floor contact and rebase crossings."""
    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _solver(basis_dir, pos_path, "interpret", floor=True,
                           rebase_every=4)
    s_res.resident_contact_mode = False
    s_res.set_dirty()
    s_res.prepare(s_res.args)
    assert s_res._resident is not None
    assert s_res._resident_state["contact_mode"] is False
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=True)

    for m in (m_res, m_ref):
        m.positions = m.positions.copy()
        m.positions[:, 1] -= 2.92            # hover just above the floor
    f = gravity_forces(m_ref) * 4.0
    s_res.run_steps(f, 14, num_iterations=6)
    for _ in range(14):
        s_ref.step(f, num_iterations=6)
    # the scene genuinely clamped (the lean contact tail actually ran)
    assert float(np.asarray(m_ref.positions)[:, 1].min()) < 0.06
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m_res.velocities, m_ref.velocities,
                               atol=1e-4)


def test_contact_mode_vertex_gate(pipeline):
    """The contact-mode machinery is gated on vertex count: models past
    CONTACT_MODE_MAX_VERTS build the lean variant automatically."""
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    basis_dir, pos_path, _ = pipeline
    s, _ = _solver(basis_dir, pos_path, "interpret")
    assert s._resident_state["contact_mode"] is True    # tiny cloth

    old = AnimSnapBasesSolver.CONTACT_MODE_MAX_VERTS
    try:
        AnimSnapBasesSolver.CONTACT_MODE_MAX_VERTS = 4  # force "too big"
        s2, _ = _solver(basis_dir, pos_path, "interpret")
        assert s2._resident_state["contact_mode"] is False
        # explicit override beats the gate
        s3, m3 = _solver(basis_dir, pos_path, "interpret")
        s3.resident_contact_mode = True
        s3.set_dirty()
        s3.prepare(s3.args)
        assert s3._resident_state["contact_mode"] is True
    finally:
        AnimSnapBasesSolver.CONTACT_MODE_MAX_VERTS = old


def test_early_exit_tier_mechanics(pipeline):
    """The tier-1 contact-less kernel serves contact-free runs whole and
    exits exactly at the first would-be clamped step on contacting ones
    (remainder finished by the contact-capable kernel via the host-side
    predictor check)."""
    basis_dir, pos_path, _ = pipeline
    s, m = _solver(basis_dir, pos_path, "interpret", floor=True)
    s.resident_contact_mode = False      # the lean+tier configuration
    s.set_dirty()
    s.prepare(s.args)
    assert s._resident_fast is not None

    calls = []
    real_fast = s._resident_fast

    def spy(*a, **k):
        out = real_fast(*a, **k)
        calls.append(int(np.asarray(out[2])[0, 0]))
        return out

    spy.windowed = real_fast.windowed
    s._resident_fast = spy

    # contact-free run: tier 1 serves everything, and the whole-window
    # proof (benches assert _last_fast_steps == chunk) is recorded
    f = gravity_forces(m)
    s.run_steps(f, 6, num_iterations=6)
    assert s.frame == 6 and calls == [6]
    assert s._last_fast_steps == 6

    # slam into the floor: tier 1 exits early, tier 2 finishes — the
    # proof must NOT certify this window
    s.run_steps(f * 50.0, 20, num_iterations=6)
    assert s.frame == 26
    assert calls[-1] < 20               # contact genuinely fired
    assert s._last_fast_steps != 20

    # exactness across the whole tiered sequence
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=True)
    for _ in range(6):
        s_ref.step(f, num_iterations=6)
    for _ in range(20):
        s_ref.step(f * 50.0, num_iterations=6)
    np.testing.assert_allclose(m.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m.velocities, m_ref.velocities, atol=1e-4)


def test_early_exit_zero_progress_falls_through(pipeline):
    """Tier 1 reporting ZERO completed steps (an f32 step-0 clamp the f64
    host predictor missed on a floor-grazing state) must fall through to
    the contact-capable kernel for the window — recursing would re-run
    the identical check + dispatch forever."""
    basis_dir, pos_path, _ = pipeline
    s, m = _solver(basis_dir, pos_path, "interpret", floor=True)
    s.resident_contact_mode = False      # lean + tier-1 configuration
    s.set_dirty()
    s.prepare(s.args)
    real_fast = s._resident_fast
    assert real_fast is not None

    calls = []

    def fake_zero(P, V, Fx, *a, **kw):
        calls.append(1)
        return P, V, np.asarray([[0]], dtype=np.int32)

    fake_zero.windowed = real_fast.windowed
    s._resident_fast = fake_zero

    f = gravity_forces(m)
    s.run_steps(f, 6, num_iterations=6)   # must terminate, no recursion
    assert calls == [1]                   # tier 1 tried exactly once
    assert s.frame == 6
    assert s._last_fast_steps is None     # window NOT certified

    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=True)
    for _ in range(6):
        s_ref.step(f, num_iterations=6)
    np.testing.assert_allclose(m.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m.velocities, m_ref.velocities, atol=1e-4)


def test_tier1_vmem_failure_downgrades_to_standard(pipeline):
    """A tier-1 VMEM compile failure marks the Mosaic register-spill
    regime (measured at a 100k-vertex cloth: the lean affine kernel runs
    15k steps/s vs the standard kernel's 39k there) — run_steps must
    swap the resident kernel to the STANDARD build, not just disable
    tier 1."""
    import warnings

    import numpy as np

    from test_sim_solver import gravity_forces

    basis_dir, pos_path, _ = pipeline
    solver, model = _solver(basis_dir, pos_path, "interpret")
    assert solver._resident_kind == "affine"
    # force the lean build's tier-1 dispatch path and make it raise a
    # VMEM-flavored error exactly where a real Mosaic OOM surfaces
    def boom(P, V, Fx, rb, n, it):
        raise RuntimeError("Ran out of memory in memory space vmem")

    solver._resident_fast = boom
    f = gravity_forces(model)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        solver.run_steps(f, 5, num_iterations=4)
    assert solver._resident_kind == "standard"
    assert solver._resident_fast is None
    assert solver._resident_state["use_affine"] is False
    # and the produced state matches an untouched solver's
    s_ref, m_ref = _solver(basis_dir, pos_path, "interpret")
    s_ref.run_steps(f, 5, num_iterations=4)
    np.testing.assert_allclose(model.positions, m_ref.positions,
                               atol=1e-5)


def _tier1_pair(solver, chunk_every=4):
    """Build the early-exit and CHUNKED tier-1 kernels from the same
    prepared resident state (the exact operands reduced.py would use)."""
    from animsnapbases_tpu.ops.pallas_resident import (
        build_resident_affine_chunked,
        build_resident_affine_exit,
    )

    st = solver._resident_state
    ops = st["ops"]
    common = (ops, ops["gather_slices"], ops["layout"], ops["G_allT"],
              ops["WT_all"], ops["inv3"], st["U_liftT"],
              st["ut_acT"], st["M_utac"], st["U_selT"], st["mass_inv"],
              solver.dt, solver.model.floor_height, st["n_sel"])
    kw = dict(rebase_every=chunk_every, interpret=True,
              eta=getattr(solver, "eta", 1.0))
    return (build_resident_affine_exit(*common, **kw),
            build_resident_affine_chunked(*common, **kw))


def _packed_state(solver, model, fext):
    st = solver._resident_state
    perm = st["perm"]
    P = np.ascontiguousarray(model.positions[perm].T)
    V = np.ascontiguousarray(model.velocities[perm].T)
    Fx = np.ascontiguousarray(np.asarray(fext)[perm].T)
    return P, V, Fx


def test_chunked_tier1_run_steps_matches_step_loop(pipeline):
    """The spill-regime configuration (chunked tier-1 + STANDARD contact
    tier, reduced.py builds it past CHUNKED_TIER1_MIN_VERTS) must match
    the per-frame step loop exactly through contact-free stepping, floor
    contact, and the tiered handoff."""
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    basis_dir, pos_path, _ = pipeline
    old = AnimSnapBasesSolver.CHUNKED_TIER1_MIN_VERTS
    AnimSnapBasesSolver.CHUNKED_TIER1_MIN_VERTS = 4   # force spill tier
    try:
        s, m = _solver(basis_dir, pos_path, "interpret", floor=True,
                       rebase_every=4)
    finally:
        AnimSnapBasesSolver.CHUNKED_TIER1_MIN_VERTS = old
    assert s._resident_kind == "standard"
    assert s._resident_fast is not None
    assert s._resident_state["use_affine"] is False
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=True)

    f = gravity_forces(m)
    # contact-free window: tier 1 serves everything and certifies it
    s.run_steps(f, 10, num_iterations=6)
    assert s._last_fast_steps == 10
    # slam into the floor: tier 1 exits, the standard kernel finishes
    s.run_steps(f * 50.0, 20, num_iterations=6)
    assert s.frame == 30
    assert s._last_fast_steps != 20
    for _ in range(10):
        s_ref.step(f, num_iterations=6)
    for _ in range(20):
        s_ref.step(f * 50.0, num_iterations=6)
    np.testing.assert_allclose(m.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m.velocities, m_ref.velocities, atol=1e-4)


def test_chunked_tier1_floor_off(pipeline):
    """Floor-off models build the chunked tier-1 with a sentinel floor:
    the kernel never exits and serves whole windows at the affine rate."""
    basis_dir, pos_path, _ = pipeline
    s, m = _solver(basis_dir, pos_path, "interpret", floor=False,
                   rebase_every=4)
    s.resident_chunked_tier1 = True
    s.set_dirty()
    s.prepare(s.args)
    assert s._resident_fast is not None
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=False)

    f = gravity_forces(m) * 8.0          # would cross the floor plane
    s.run_steps(f, 12, num_iterations=6)
    assert s._last_fast_steps == 12      # tier 1 served the whole window
    for _ in range(12):
        s_ref.step(f, num_iterations=6)
    np.testing.assert_allclose(m.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m.velocities, m_ref.velocities, atol=1e-4)


def test_chunked_tier1_vertex_gate(pipeline):
    """Default gating: tiny models keep the in-kernel early-exit tier-1;
    past CHUNKED_TIER1_MIN_VERTS the chunked build is selected."""
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    basis_dir, pos_path, _ = pipeline
    s, _ = _solver(basis_dir, pos_path, "interpret", floor=True)
    s.resident_contact_mode = False
    s.set_dirty()
    s.prepare(s.args)
    assert s._resident_kind == "affine"   # tiny cloth: in-kernel builds

    old = AnimSnapBasesSolver.CHUNKED_TIER1_MIN_VERTS
    try:
        AnimSnapBasesSolver.CHUNKED_TIER1_MIN_VERTS = 4
        s2, _ = _solver(basis_dir, pos_path, "interpret", floor=True)
        assert s2._resident_kind == "standard"
        assert s2._resident_fast is not None
    finally:
        AnimSnapBasesSolver.CHUNKED_TIER1_MIN_VERTS = old


def test_chunked_kernel_matches_exit_kernel_contact_free(pipeline):
    """The chunked tier-1 kernel (rebase in an outer XLA loop, only
    coefficient state in the Pallas kernel) must reproduce the in-kernel
    early-exit build bit-for-bit modulo f32 summation order: same state,
    same completed-step count, across rebase boundaries."""
    basis_dir, pos_path, _ = pipeline
    s, m = _solver(basis_dir, pos_path, "interpret", floor=True,
                   rebase_every=4)
    s.resident_contact_mode = False
    s.set_dirty()
    s.prepare(s.args)
    exit_run, chunk_run = _tier1_pair(s, chunk_every=4)

    f = gravity_forces(m)
    P, V, Fx = _packed_state(s, m, f)
    rb = np.zeros((1, 3, s.U.shape[1]))
    # 10 steps crosses two chunk/rebase boundaries (4, 8)
    Pe, Ve, ke = exit_run(P, V, Fx, rb, 10, 6)
    Pc, Vc, kc = chunk_run(P, V, Fx, rb, 10, 6)
    assert int(np.asarray(ke)[0, 0]) == 10
    assert int(np.asarray(kc)[0, 0]) == 10
    np.testing.assert_allclose(np.asarray(Pc), np.asarray(Pe), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Vc), np.asarray(Ve), atol=1e-4)


def test_chunked_kernel_early_exit_matches(pipeline):
    """On a contacting trajectory both tier-1 builds must stop at the
    SAME first would-be clamped step with identical committed state."""
    basis_dir, pos_path, _ = pipeline
    s, m = _solver(basis_dir, pos_path, "interpret", floor=True,
                   rebase_every=4)
    s.resident_contact_mode = False
    s.set_dirty()
    s.prepare(s.args)
    exit_run, chunk_run = _tier1_pair(s, chunk_every=4)

    m.positions = m.positions.copy()
    m.positions[:, 1] -= 2.9             # hover just above the floor
    f = gravity_forces(m) * 4.0
    P, V, Fx = _packed_state(s, m, f)
    rb = np.zeros((1, 3, s.U.shape[1]))
    Pe, Ve, ke = exit_run(P, V, Fx, rb, 30, 6)
    Pc, Vc, kc = chunk_run(P, V, Fx, rb, 30, 6)
    ke, kc = int(np.asarray(ke)[0, 0]), int(np.asarray(kc)[0, 0])
    assert 0 < ke < 30                   # the scene genuinely clamps
    assert kc == ke
    np.testing.assert_allclose(np.asarray(Pc), np.asarray(Pe), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Vc), np.asarray(Ve), atol=1e-4)


def test_chunked_kernel_windowed_matches(pipeline):
    """run.windowed (device-resident schedule sliced inside the jit) must
    agree between the two tier-1 builds on an animated trajectory."""
    basis_dir, pos_path, _ = pipeline
    s, m = _solver(basis_dir, pos_path, "interpret", floor=True,
                   rebase_every=4)
    s.resident_contact_mode = False
    s.set_dirty()
    s.prepare(s.args)
    exit_run, chunk_run = _tier1_pair(s, chunk_every=4)

    f = gravity_forces(m)
    P, V, Fx = _packed_state(s, m, f)
    r = s.U.shape[1]
    rng = np.random.default_rng(3)
    rb_full = rng.normal(scale=1e-3, size=(16, 3, r))
    Pe, Ve, ke = exit_run.windowed(P, V, Fx, rb_full, 2, 8, 7, 6)
    Pc, Vc, kc = chunk_run.windowed(P, V, Fx, rb_full, 2, 8, 7, 6)
    assert int(np.asarray(kc)[0, 0]) == int(np.asarray(ke)[0, 0]) == 7
    np.testing.assert_allclose(np.asarray(Pc), np.asarray(Pe), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Vc), np.asarray(Ve), atol=1e-4)


def test_chunked_shell_opts_bit_identical(pipeline):
    """Round-5 per-step-shell cuts (static-rb load hoist + sqrt-free
    floor bound) must be BIT-identical to the r04 shell: on static-force
    windows (hoist active), on near-floor trajectories (the bound trips,
    the exact check decides — so a last-ulp compare difference cannot
    move state), and on animated schedules (hoist inert, the per-step
    dynamic rb path still serves)."""
    from animsnapbases_tpu.ops.pallas_resident import (
        build_resident_affine_chunked,
    )

    basis_dir, pos_path, _ = pipeline
    s, m = _solver(basis_dir, pos_path, "interpret", floor=True,
                   rebase_every=4)
    s.resident_contact_mode = False
    s.set_dirty()
    s.prepare(s.args)
    st = s._resident_state
    ops = st["ops"]
    common = (ops, ops["gather_slices"], ops["layout"], ops["G_allT"],
              ops["WT_all"], ops["inv3"], st["U_liftT"],
              st["ut_acT"], st["M_utac"], st["U_selT"], st["mass_inv"],
              s.dt, s.model.floor_height, st["n_sel"])
    kw = dict(rebase_every=4, interpret=True,
              eta=getattr(s, "eta", 1.0))
    new = build_resident_affine_chunked(*common, **kw)
    old = build_resident_affine_chunked(*common, static_rb=False,
                                        sqrt_free_bound=False, **kw)

    f = gravity_forces(m)
    r = s.U.shape[1]
    rb1 = np.zeros((1, 3, r))
    # 1) static-force contact-free window across rebase boundaries
    P, V, Fx = _packed_state(s, m, f)
    Pn, Vn, kn = new(P, V, Fx, rb1, 10, 6)
    Po, Vo, ko = old(P, V, Fx, rb1, 10, 6)
    assert int(np.asarray(kn)[0, 0]) == int(np.asarray(ko)[0, 0]) == 10
    np.testing.assert_array_equal(np.asarray(Pn), np.asarray(Po))
    np.testing.assert_array_equal(np.asarray(Vn), np.asarray(Vo))
    # 2) near-floor: the bound trips, the exact check + early exit decide
    m.positions = m.positions.copy()
    m.positions[:, 1] -= 2.9
    P, V, Fx = _packed_state(s, m, f * 4.0)
    Pn, Vn, kn = new(P, V, Fx, rb1, 30, 6)
    Po, Vo, ko = old(P, V, Fx, rb1, 30, 6)
    kn, ko = int(np.asarray(kn)[0, 0]), int(np.asarray(ko)[0, 0])
    assert 0 < kn < 30 and kn == ko       # same first clamped step
    np.testing.assert_array_equal(np.asarray(Pn), np.asarray(Po))
    np.testing.assert_array_equal(np.asarray(Vn), np.asarray(Vo))
    # 3) animated schedule (t_len > 1): hoist inert, dynamic rb loads
    m.positions = m.positions.copy()
    m.positions[:, 1] += 2.9
    P, V, Fx = _packed_state(s, m, f)
    rng = np.random.default_rng(7)
    rb_full = rng.normal(scale=1e-3, size=(16, 3, r))
    Pn, Vn, kn = new.windowed(P, V, Fx, rb_full, 2, 8, 7, 6)
    Po, Vo, ko = old.windowed(P, V, Fx, rb_full, 2, 8, 7, 6)
    assert int(np.asarray(kn)[0, 0]) == int(np.asarray(ko)[0, 0]) == 7
    np.testing.assert_array_equal(np.asarray(Pn), np.asarray(Po))
    np.testing.assert_array_equal(np.asarray(Vn), np.asarray(Vo))


def test_beyond_gate_estimates_separate():
    """The chunked kernel's coefficient-only footprint is what admits
    beyond-gate models: at 250k verts / r=48 / bf16 matmuls the
    full-state estimate is far past the 72 MB gate while the chunked
    one fits comfortably."""
    from animsnapbases_tpu.ops.pallas_resident import (
        estimate_chunked_vmem_bytes,
        estimate_vmem_bytes,
    )

    full = estimate_vmem_bytes(250000, 48, 500, 1500, 2000, 2, 4)
    chunk = estimate_chunked_vmem_bytes(250000, 48, 500, 1500, 2000,
                                        2, 4)
    assert full > 72 * (1 << 20)
    assert chunk < 40 * (1 << 20)


def _chunked_only_solver(basis_dir, pos_path, monkeypatch, floor=True):
    """Force the BEYOND-GATE admission path on the tiny test cloth by
    making the full-state estimate exceed any limit — exactly what a
    250k-vertex model does — so _try_build_resident takes the
    chunked-only branch (run_fn=None, per-step contact tier)."""
    from animsnapbases_tpu.ops import pallas_resident

    monkeypatch.setattr(pallas_resident, "estimate_vmem_bytes",
                        lambda *a, **k: 1 << 60)
    s, m = _solver(basis_dir, pos_path, "interpret", floor=floor,
                   rebase_every=4)
    return s, m


def test_chunked_only_admission(pipeline, monkeypatch):
    """Beyond the gate the solver builds the chunked tier-1 with NO
    full-state contact kernel (run_fn None) and reports the kind."""
    basis_dir, pos_path, _ = pipeline
    s, _ = _chunked_only_solver(basis_dir, pos_path, monkeypatch)
    assert s._resident is not None
    run_fn, _, _ = s._resident
    assert run_fn is None
    assert s._resident_kind == "chunked-only"
    assert s._resident_fast is not None
    assert s._resident_state["use_affine"] is False


def test_chunked_only_disabled_by_flag(pipeline, monkeypatch):
    """resident_chunked_only=False keeps beyond-gate models on the
    per-step fused path (the pre-round-3 behavior)."""
    from animsnapbases_tpu.ops import pallas_resident

    basis_dir, pos_path, _ = pipeline
    monkeypatch.setattr(pallas_resident, "estimate_vmem_bytes",
                        lambda *a, **k: 1 << 60)
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    args = sim_args(
        constraint_projection_basis_type="deim_pod_vectorized",
        tri_strain_reduced=True, tri_strain_num_components=10,
        edge_spring_reduced=True, edge_spring_num_components=10,
        geom_interpolation_basis_dir=basis_dir,
        geom_interpolation_basis_file="basis.npz",
        position_reduced=True, position_num_components=14,
        position_basis_file=pos_path)
    solver = AnimSnapBasesSolver(args, pallas_mode="interpret")
    _, model = make_cloth_solver(rows=5, cols=5, wi=1e4, tilt=0.15)
    solver.set_model(model)
    solver.resident_chunked_only = False
    solver.prepare(args)
    assert solver._resident is None


def test_chunked_only_run_steps_matches_step_loop(pipeline, monkeypatch):
    """Beyond-gate stepping must match the per-frame step loop exactly:
    contact-free windows on tier 1, a floor slam handed to the per-step
    fused windows, and the hand-back to tier 1 once floor-clear."""
    basis_dir, pos_path, _ = pipeline
    s, m = _chunked_only_solver(basis_dir, pos_path, monkeypatch)
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=True)

    f = gravity_forces(m)
    # contact-free window: tier 1 serves everything and certifies it
    s.run_steps(f, 10, num_iterations=6)
    assert s._last_fast_steps == 10
    # slam into the floor: tier 1 exits, per-step windows finish
    s.run_steps(f * 50.0, 20, num_iterations=6)
    assert s.frame == 30
    assert s._last_fast_steps != 20
    for _ in range(10):
        s_ref.step(f, num_iterations=6)
    for _ in range(20):
        s_ref.step(f * 50.0, num_iterations=6)
    np.testing.assert_allclose(m.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m.velocities, m_ref.velocities, atol=1e-4)


def test_chunked_only_resting_regime(pipeline, monkeypatch):
    """A model RESTING on the floor (predictor clamped every window)
    must still make full progress through bounded per-step windows."""
    basis_dir, pos_path, _ = pipeline
    s, m = _chunked_only_solver(basis_dir, pos_path, monkeypatch)
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=True)

    f = gravity_forces(m) * 50.0
    # drive into the floor, then KEEP pressing: the whole second window
    # runs on the per-step contact tier
    s.run_steps(f, 30, num_iterations=6)
    s.run_steps(f, 17, num_iterations=6)
    assert s.frame == 47
    for _ in range(47):
        s_ref.step(f, num_iterations=6)
    # 2e-6: the bounded windows change jit boundaries (f32 summation
    # order) vs the per-frame loop — identical math, reordered
    np.testing.assert_allclose(m.positions, m_ref.positions, atol=2e-6)
    np.testing.assert_allclose(m.velocities, m_ref.velocities, atol=1e-4)


def test_chunked_only_floor_off(pipeline, monkeypatch):
    """Floor-off beyond-gate models run the chunked tier-1 with the
    sentinel floor: whole windows at the affine rate, no contact tier."""
    basis_dir, pos_path, _ = pipeline
    s, m = _chunked_only_solver(basis_dir, pos_path, monkeypatch,
                                floor=False)
    run_fn, _, _ = s._resident
    assert run_fn is None and s._resident_fast is not None
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=False)

    f = gravity_forces(m) * 8.0          # would cross the floor plane
    s.run_steps(f, 12, num_iterations=6)
    assert s._last_fast_steps == 12
    for _ in range(12):
        s_ref.step(f, num_iterations=6)
    np.testing.assert_allclose(m.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m.velocities, m_ref.velocities, atol=1e-4)


def test_chunked_only_tier1_failure_drops_to_per_step(pipeline,
                                                      monkeypatch):
    """If Mosaic rejects the chunked kernel at first dispatch, the
    beyond-gate solver must land on the per-step fused path and still
    produce exact results (there is no other kernel to fall back to)."""
    basis_dir, pos_path, _ = pipeline
    s, m = _chunked_only_solver(basis_dir, pos_path, monkeypatch)

    class _Boom:
        def __call__(self, *a, **k):
            raise RuntimeError("mosaic rejected (test)")

        def windowed(self, *a, **k):
            raise RuntimeError("mosaic rejected (test)")

    s._resident_fast = _Boom()
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=True)

    f = gravity_forces(m)
    with pytest.warns(UserWarning, match="disabling tier 1"):
        s.run_steps(f, 10, num_iterations=6)
    assert s._resident is None           # resident path fully retired
    s.run_steps(f, 5, num_iterations=6)
    for _ in range(15):
        s_ref.step(f, num_iterations=6)
    np.testing.assert_allclose(m.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m.velocities, m_ref.velocities, atol=1e-4)


def test_chunked_floor_bound_grazing_equivalence(pipeline):
    """The O(r) certified floor bound must be behavior-invisible: on a
    trajectory hovering JUST above the floor (the bound trips into the
    exact check every step, without clamping) and on a clamping one,
    bound-on and bound-off builds must agree step-for-step."""
    from animsnapbases_tpu.ops.pallas_resident import (
        build_resident_affine_chunked,
    )

    basis_dir, pos_path, _ = pipeline
    s, m = _solver(basis_dir, pos_path, "interpret", floor=True,
                   rebase_every=4)
    s.resident_contact_mode = False
    s.set_dirty()
    s.prepare(s.args)
    st = s._resident_state
    ops = st["ops"]
    common = (ops, ops["gather_slices"], ops["layout"], ops["G_allT"],
              ops["WT_all"], ops["inv3"], st["U_liftT"],
              st["ut_acT"], st["M_utac"], st["U_selT"], st["mass_inv"],
              s.dt, s.model.floor_height, st["n_sel"])
    kw = dict(rebase_every=4, interpret=True, eta=getattr(s, "eta", 1.0))
    run_on = build_resident_affine_chunked(*common,
                                           floor_bound_skip=True, **kw)
    run_off = build_resident_affine_chunked(*common,
                                            floor_bound_skip=False, **kw)

    rb = np.zeros((1, 3, s.U.shape[1]))
    for drop, scale in ((2.7, 0.5), (2.9, 4.0)):   # hover, then clamp
        m2 = m.positions.copy()
        m2[:, 1] -= drop
        mm = m.positions
        m.positions = m2
        f = gravity_forces(m) * scale
        P, V, Fx = _packed_state(s, m, f)
        m.positions = mm
        Pa, Va, ka = run_on(P, V, Fx, rb, 30, 6)
        Pb, Vb, kb = run_off(P, V, Fx, rb, 30, 6)
        assert int(np.asarray(ka)[0, 0]) == int(np.asarray(kb)[0, 0])
        np.testing.assert_array_equal(np.asarray(Pa), np.asarray(Pb))
        np.testing.assert_array_equal(np.asarray(Va), np.asarray(Vb))


def _chunked_build(s, floor_exact, rebase_every=4):
    from animsnapbases_tpu.ops.pallas_resident import (
        build_resident_affine_chunked,
    )

    st = s._resident_state
    ops = st["ops"]
    return build_resident_affine_chunked(
        ops, ops["gather_slices"], ops["layout"], ops["G_allT"],
        ops["WT_all"], ops["inv3"], st["U_liftT"],
        st["ut_acT"], st["M_utac"], st["U_selT"], st["mass_inv"],
        s.dt, s.model.floor_height, st["n_sel"],
        rebase_every=rebase_every, interpret=True,
        eta=getattr(s, "eta", 1.0), floor_bound_skip=True,
        floor_exact=floor_exact)


def test_chunked_fold_vc_matches_unfolded(pipeline):
    """The Vc-folded kernel (default) re-associates only the hoisted
    gathered-values product — its trajectory must match the unfolded
    build to f32 re-association tolerance across a rebase boundary, with
    identical committed step counts."""
    from animsnapbases_tpu.ops.pallas_resident import (
        build_resident_affine_chunked,
    )

    basis_dir, pos_path, _ = pipeline
    s, m = _solver(basis_dir, pos_path, "interpret", floor=True,
                   rebase_every=4)
    s.resident_contact_mode = False
    s.set_dirty()
    s.prepare(s.args)
    st = s._resident_state
    ops = st["ops"]
    common = (ops, ops["gather_slices"], ops["layout"], ops["G_allT"],
              ops["WT_all"], ops["inv3"], st["U_liftT"],
              st["ut_acT"], st["M_utac"], st["U_selT"], st["mass_inv"],
              s.dt, s.model.floor_height, st["n_sel"])
    kw = dict(rebase_every=4, interpret=True, eta=getattr(s, "eta", 1.0))
    run_fold = build_resident_affine_chunked(*common, fold_vc=True, **kw)
    run_plain = build_resident_affine_chunked(*common, fold_vc=False, **kw)

    f = gravity_forces(m)
    P, V, Fx = _packed_state(s, m, f)
    rb = np.zeros((1, 3, s.U.shape[1]))
    Pa, Va, ka = run_fold(P, V, Fx, rb, 10, 6)
    Pb, Vb, kb = run_plain(P, V, Fx, rb, 10, 6)
    assert int(np.asarray(ka)[0, 0]) == int(np.asarray(kb)[0, 0]) == 10
    scale = np.abs(np.asarray(Pb)).max()
    np.testing.assert_allclose(np.asarray(Pa), np.asarray(Pb),
                               atol=2e-5 * max(scale, 1.0))
    np.testing.assert_allclose(np.asarray(Va), np.asarray(Vb),
                               atol=2e-4 * max(scale, 1.0))


def test_chunked_floor_exact_free_matches_contact_free(pipeline):
    """floor_exact=False (no in-kernel exact fallback — the big (r, N)
    lift slice leaves the kernel entirely) must be bit-identical to the
    exact build on a floor-clear window: the certified bound clears
    every step, so neither kernel ever takes its fallback."""
    basis_dir, pos_path, _ = pipeline
    s, m = _solver(basis_dir, pos_path, "interpret", floor=True,
                   rebase_every=4)
    s.resident_contact_mode = False
    s.set_dirty()
    s.prepare(s.args)
    run_exact = _chunked_build(s, True)
    run_free = _chunked_build(s, False)

    f = gravity_forces(m)
    P, V, Fx = _packed_state(s, m, f)
    rb = np.zeros((1, 3, s.U.shape[1]))
    Pa, Va, ka = run_exact(P, V, Fx, rb, 10, 6)
    Pb, Vb, kb = run_free(P, V, Fx, rb, 10, 6)
    assert int(np.asarray(ka)[0, 0]) == int(np.asarray(kb)[0, 0]) == 10
    np.testing.assert_array_equal(np.asarray(Pa), np.asarray(Pb))
    np.testing.assert_array_equal(np.asarray(Va), np.asarray(Vb))


def test_chunked_floor_exact_free_exits_conservatively(pipeline):
    """Near the floor the exact-free kernel exits at or BEFORE the exact
    build's first clamped step (the interval bound is conservative), and
    its committed prefix matches the exact build run to the same step."""
    basis_dir, pos_path, _ = pipeline
    s, m = _solver(basis_dir, pos_path, "interpret", floor=True,
                   rebase_every=4)
    s.resident_contact_mode = False
    s.set_dirty()
    s.prepare(s.args)
    run_exact = _chunked_build(s, True)
    run_free = _chunked_build(s, False)

    m.positions = m.positions.copy()
    m.positions[:, 1] -= 2.9             # hover just above the floor
    f = gravity_forces(m) * 4.0
    P, V, Fx = _packed_state(s, m, f)
    rb = np.zeros((1, 3, s.U.shape[1]))
    Pe, Ve, ke = run_exact(P, V, Fx, rb, 30, 6)
    Pf, Vf, kf = run_free(P, V, Fx, rb, 30, 6)
    ke, kf = int(np.asarray(ke)[0, 0]), int(np.asarray(kf)[0, 0])
    assert 0 < ke < 30                   # the scene genuinely clamps
    assert 0 <= kf <= ke
    # committed prefix must be the exact trajectory up to kf
    Pe2, Ve2, ke2 = run_exact(P, V, Fx, rb, kf, 6)
    assert int(np.asarray(ke2)[0, 0]) == kf
    np.testing.assert_array_equal(np.asarray(Pf), np.asarray(Pe2))
    np.testing.assert_array_equal(np.asarray(Vf), np.asarray(Ve2))


def test_chunked_floor_exact_free_run_steps_matches(pipeline):
    """End-to-end: a solver FORCED exact-free (resident_floor_exact =
    False) must reproduce the per-frame step loop through contact-free
    stepping, a floor slam, and the tiered handoff — bound trips exit to
    a rebase/re-enter or to the contact tier, never skipping or doubling
    a step."""
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    basis_dir, pos_path, _ = pipeline
    old = AnimSnapBasesSolver.CHUNKED_TIER1_MIN_VERTS
    AnimSnapBasesSolver.CHUNKED_TIER1_MIN_VERTS = 4   # force spill tier
    try:
        s, m = _solver(basis_dir, pos_path, "interpret", floor=True,
                       rebase_every=4)
        s.resident_floor_exact = False
        s.set_dirty()
        s.prepare(s.args)
    finally:
        AnimSnapBasesSolver.CHUNKED_TIER1_MIN_VERTS = old
    assert s._resident_fast_kind == "chunked"
    s_ref, m_ref = _solver(basis_dir, pos_path, "off", floor=True)

    f = gravity_forces(m)
    s.run_steps(f, 10, num_iterations=6)
    assert s._last_fast_steps == 10      # floor-clear: no spurious exits
    s.run_steps(f * 50.0, 20, num_iterations=6)
    assert s.frame == 30
    for _ in range(10):
        s_ref.step(f, num_iterations=6)
    for _ in range(20):
        s_ref.step(f * 50.0, num_iterations=6)
    np.testing.assert_allclose(m.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m.velocities, m_ref.velocities, atol=1e-4)


def test_chunked_floor_exact_gate_and_admission():
    """The exact-free footprint has no (r*mm)*N term: a 2M-vertex model
    that the exact estimate rejects fits the 72 MB gate, and the solver
    auto-gates floor_exact by CHUNKED_FLOOR_EXACT_MAX_VERTS with the
    instance override and the bound-skip interlock respected."""
    from animsnapbases_tpu.ops.pallas_resident import (
        estimate_chunked_vmem_bytes,
    )
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    exact = estimate_chunked_vmem_bytes(2_000_000, 48, 500, 1500, 2000,
                                        2, 4)
    free = estimate_chunked_vmem_bytes(2_000_000, 48, 500, 1500, 2000,
                                       2, 4, floor_exact=False)
    gate = AnimSnapBasesSolver.RESIDENT_VMEM_LIMIT
    assert exact > gate
    assert free <= gate

    s = AnimSnapBasesSolver.__new__(AnimSnapBasesSolver)
    lim = AnimSnapBasesSolver.CHUNKED_FLOOR_EXACT_MAX_VERTS
    assert s._chunked_floor_exact(lim) is True
    assert s._chunked_floor_exact(lim + 1) is False
    s.resident_floor_exact = False
    assert s._chunked_floor_exact(100) is False
    s.resident_floor_bound_skip = False   # interlock: bound off => exact
    assert s._chunked_floor_exact(lim + 1) is True
