"""Ensemble stepping of the reduced solver over a sharded batch."""

import numpy as np
import jax
import pytest

from animsnapbases_tpu.parallel import build_device_mesh
from test_sim_reduced_position import _reduced_solver, pipeline  # noqa: F401
from test_sim_solver import gravity_forces


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_batched_reduced_matches_single(pipeline):
    basis_dir, pos_path, _ = pipeline
    solver, model = _reduced_solver(basis_dir, pos_path, with_position=True)
    mesh = build_device_mesh((8,), ("data",))
    step = solver.make_batched_step(mesh)

    B = 8
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    f = np.tile(gravity_forces(model), (B, 1, 1))
    p, v = step(pos, vel, f, num_iterations=6)
    p, v = step(p, v, f, num_iterations=6)

    # single-sim reference
    s2, m2 = _reduced_solver(basis_dir, pos_path, with_position=True)
    for _ in range(2):
        s2.step(gravity_forces(m2), num_iterations=6)
    out = np.asarray(p)
    for b in range(B):
        np.testing.assert_allclose(out[b], m2.positions, atol=1e-9)


def test_batched_reduced_per_call_targets(pipeline):
    """Animated positional targets pass through the batched step."""
    basis_dir, pos_path, _ = pipeline

    def build():
        solver, model = _reduced_solver(basis_dir, pos_path,
                                        with_position=True)
        shift = np.zeros((6, 3))
        shift[:, 2] = np.linspace(0.0, 0.3, 6)
        model.add_positional_constraint(7, wi=1e6,
                                        motion_type="user_defined",
                                        frame_shift=shift)
        solver.set_dirty()
        solver.prepare(solver.args)
        return solver, model

    s1, m1 = build()
    mesh = build_device_mesh((4,), ("data",))
    step = s1.make_batched_step(mesh)
    B = 4
    pos = np.tile(m1.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    f = np.tile(gravity_forces(m1), (B, 1, 1))
    for frame in range(3):
        pos, vel = step(pos, vel, f, num_iterations=4,
                        targets=m1.positional_targets(frame))

    s2, m2 = build()
    for _ in range(3):
        s2.step(gravity_forces(m2), num_iterations=4)
    out = np.asarray(pos)
    for b in range(B):
        np.testing.assert_allclose(out[b], m2.positions, atol=1e-9)


def test_batched_run_matches_per_step(pipeline):
    """make_batched_run (one dispatch for the whole batch x steps, with a
    shared animated target timeline) == looping make_batched_step."""
    basis_dir, pos_path, _ = pipeline
    solver, model = _reduced_solver(basis_dir, pos_path, with_position=True)
    shift = np.zeros((8, 3))
    shift[:, 2] = np.linspace(0.0, 0.25, 8)
    model.add_positional_constraint(7, wi=1e6, motion_type="user_defined",
                                    frame_shift=shift)
    solver.set_dirty()
    solver.prepare(solver.args)

    mesh = build_device_mesh((8,), ("data",))
    from animsnapbases_tpu.sim.solver import positional_targets_timeline

    tl, animated = positional_targets_timeline(model, 0, 6)
    assert animated

    B = 8
    pos = np.tile(model.positions, (B, 1, 1))
    vel = np.zeros_like(pos)
    f = np.tile(gravity_forces(model), (B, 1, 1))

    run = solver.make_batched_run(mesh)
    p1, v1 = run(pos, vel, f, 6, num_iterations=5, targets_seq=tl)

    step = solver.make_batched_step(mesh)
    p2, v2 = np.asarray(pos), np.asarray(vel)
    for t in range(6):
        p2, v2 = step(p2, v2, f, num_iterations=5,
                      targets=tl[min(t, len(tl) - 1)])

    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-9)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-8)


def test_batched_run_default_timeline_advances_animation(pipeline):
    """With targets_seq omitted, make_batched_run uses the model's own
    schedule from the current frame — animated user_defined shifts advance
    exactly as in run_steps (they must NOT freeze at the entry frame)."""
    basis_dir, pos_path, _ = pipeline
    solver, model = _reduced_solver(basis_dir, pos_path, with_position=True)
    shift = np.zeros((8, 3))
    shift[:, 2] = np.linspace(0.0, 0.25, 8)
    model.add_positional_constraint(7, wi=1e6, motion_type="user_defined",
                                    frame_shift=shift)
    solver.set_dirty()
    solver.prepare(solver.args)

    run = solver.make_batched_run()
    pos = model.positions[None].copy()
    vel = np.zeros_like(pos)
    f = gravity_forces(model)[None]
    p1, _ = run(pos, vel, f, 6, num_iterations=5)

    s2, m2 = _reduced_solver(basis_dir, pos_path, with_position=True)
    m2.add_positional_constraint(7, wi=1e6, motion_type="user_defined",
                                 frame_shift=shift)
    s2.set_dirty()
    s2.prepare(s2.args)
    s2.run_steps(gravity_forces(m2), 6, num_iterations=5)

    np.testing.assert_allclose(np.asarray(p1)[0], m2.positions, atol=1e-8)


def test_batched_run_refuses_self_collision(pipeline):
    basis_dir, pos_path, _ = pipeline
    solver, _ = _reduced_solver(basis_dir, pos_path, with_position=True)
    solver.enable_self_collision = True
    with pytest.raises(RuntimeError, match="self-collision"):
        solver.make_batched_run()


def test_batched_budget_fits_64_bunny_scale_sims():
    """The batched VMEM gate admits 64 bunny-scale sims in ONE kernel.

    Pins the gate math to what the chip actually compiles: with the
    affine base anchors living in the kernel output buffers (no b0/b1
    scratch) the bench bunny's resident state (n=14290, r=48, n_sel=153,
    g_total=167, m_total=66, bf16 matmuls, f32 state) budgets ~72 MB at
    nb=64 — under the 84 MB gate — measured live at 4.4M aggregate
    steps/s (BENCH_ensemble64_r03.json).  96 sims must still be rejected
    (over the 100 MB scoped-VMEM limit)."""
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    st = {"n": 14290, "r": 48, "n_sel": 153, "g_total": 167,
          "m_total": 66, "mm_dtype": np.dtype(np.float16),
          "np_dtype": np.dtype(np.float32), "use_affine": True,
          "contact_mode": False}
    gate = AnimSnapBasesSolver.BATCHED_VMEM_LIMIT
    b64 = AnimSnapBasesSolver.batched_resident_budget(st, 64, True)
    b96 = AnimSnapBasesSolver.batched_resident_budget(st, 96, True)
    assert b64 <= gate, f"64-sim budget {b64 / 2**20:.1f} MB over gate"
    assert b96 > gate, f"96-sim budget {b96 / 2**20:.1f} MB under gate"
    # the solo kernel's budget is far below the single-sim 48 MB gate
    b1 = AnimSnapBasesSolver.batched_resident_budget(st, 1, True)
    assert b1 <= 48 * (1 << 20)


def test_batched_step_advances_animation(pipeline):
    """make_batched_step with targets omitted must ADVANCE the model's
    animated schedule across calls (internal serving-frame counter, same
    contract as make_batched_run) — not replay the creation frame's
    target forever (round-3 review finding)."""
    basis_dir, pos_path, _ = pipeline
    solver, model = _reduced_solver(basis_dir, pos_path, with_position=True)
    shift = np.zeros((8, 3))
    shift[:, 2] = np.linspace(0.0, 0.25, 8)
    model.add_positional_constraint(7, wi=1e6, motion_type="user_defined",
                                    frame_shift=shift)
    solver.set_dirty()
    solver.prepare(solver.args)

    step = solver.make_batched_step()
    pos = model.positions[None].copy()
    vel = np.zeros_like(pos)
    f = gravity_forces(model)[None]
    for _ in range(5):
        pos, vel = step(pos, vel, f, num_iterations=5)

    s2, m2 = _reduced_solver(basis_dir, pos_path, with_position=True)
    m2.add_positional_constraint(7, wi=1e6, motion_type="user_defined",
                                 frame_shift=shift)
    s2.set_dirty()
    s2.prepare(s2.args)
    for _ in range(5):
        s2.step(gravity_forces(m2), num_iterations=5)

    np.testing.assert_allclose(np.asarray(pos)[0], m2.positions,
                               atol=1e-8)


def test_batched_run_fallback_tracks_rebuilds(pipeline):
    """A held make_batched_run runner must serve the REBUILT physics on
    the vmapped fallback path after set_dirty+prepare — a creation-time
    _run_jit capture mixed old and new matrices (round-3 review
    finding)."""
    basis_dir, pos_path, _ = pipeline
    solver, model = _reduced_solver(basis_dir, pos_path, with_position=True)
    run = solver.make_batched_run()
    # force the vmapped fallback (pretend no resident kernel)
    solver._resident = None
    solver._resident_state = None

    # schedule action: new positional constraint -> matrices rebuild
    model.add_positional_constraint(7, wi=1e6)
    solver.set_dirty()
    solver.prepare(solver.args)

    pos = model.positions[None].copy()
    vel = np.zeros_like(pos)
    f = gravity_forces(model)[None]
    p1, _ = run(pos, vel, f, 4, num_iterations=5)
    assert solver._last_batched_path == "vmapped-xla"

    s2, m2 = _reduced_solver(basis_dir, pos_path, with_position=True)
    m2.add_positional_constraint(7, wi=1e6)
    s2.set_dirty()
    s2.prepare(s2.args)
    s2.run_steps(gravity_forces(m2), 4, num_iterations=5)
    np.testing.assert_allclose(np.asarray(p1)[0], m2.positions,
                               atol=1e-8)


def test_set_model_resets_reduced_state(pipeline):
    """set_model must force the reduced groups and resident kernels to
    rebuild — they bake the OLD model's element indices and vertex
    permutation (round-3 review finding)."""
    basis_dir, pos_path, _ = pipeline
    solver, model = _reduced_solver(basis_dir, pos_path, with_position=True)
    assert solver.constraint_projection_ready
    solver.set_model(model)
    assert solver.constraint_projection_ready is False
    assert solver._reduced_groups == {}
    assert solver._run_jit is None
    # a fresh prepare restores a working solver
    solver.prepare(solver.args)
    solver.run_steps(gravity_forces(model), 3, num_iterations=4)
    assert np.isfinite(model.positions).all()
