"""Velocity damping (args.damping, eta = 1 - damping).

The damped predictor is ``s_n = q + dt*eta*v + dt^2 M^-1 f`` while the
stored velocity stays the raw ``(q_new - q)/dt`` — one convention shared
by the FOM solver, the reduced XLA step, and every resident kernel
(standard / affine / tier-1 exit / batched), so damped FOM recordings and
damped reduced replays remain parity-comparable.  ``damping=0`` must
reproduce the undamped (reference-exact) path bit-for-bit: the builders
fold ``eta == 1.0`` away at trace time.

Single-step oracle: because q depends on the state only through s_n, a
damped step from (p, v) equals an undamped step from (p, eta*v) in BOTH
positions and velocities — used below to pin the semantics without
duplicating the solve.
"""

import numpy as np
import pytest

from test_sim_reduced_position import pipeline  # noqa: F401
from test_sim_solver import gravity_forces, make_cloth_solver, sim_args

DAMPING = 0.07
ETA = 1.0 - DAMPING


def _fom(damping=0.0, **kw):
    solver, model = make_cloth_solver(rows=5, cols=5, wi=1e4, tilt=0.15)
    args = sim_args(damping=damping, **kw)
    solver.prepare(args)
    return solver, model, args


def _reduced(basis_dir, pos_path, pallas_mode, damping=0.0, floor=True,
             **extra):
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    args = sim_args(
        constraint_projection_basis_type="deim_pod_vectorized",
        tri_strain_reduced=True, tri_strain_num_components=10,
        edge_spring_reduced=True, edge_spring_num_components=10,
        geom_interpolation_basis_dir=basis_dir,
        geom_interpolation_basis_file="basis.npz",
        position_reduced=True, position_num_components=14,
        position_basis_file=pos_path, damping=damping)
    solver = AnimSnapBasesSolver(args, pallas_mode=pallas_mode)
    _, model = make_cloth_solver(rows=5, cols=5, wi=1e4, tilt=0.15)
    if not floor:
        model.floor_collision = False
    solver.set_model(model)
    for k, v in extra.items():
        setattr(solver, k, v)
    solver.prepare(args)
    return solver, model


def test_fom_single_step_oracle():
    """Damped step from (p, v) == undamped step from (p, eta*v)."""
    s_d, m_d, _ = _fom(damping=DAMPING)
    s_u, m_u, _ = _fom(damping=0.0)
    f = gravity_forces(m_d)
    # a non-trivial velocity state
    rng = np.random.default_rng(3)
    v0 = rng.normal(scale=0.4, size=m_d.positions.shape)
    m_d.velocities = v0.copy()
    m_u.velocities = ETA * v0

    s_d.step(f, num_iterations=5)
    s_u.step(f, num_iterations=5)
    np.testing.assert_allclose(m_d.positions, m_u.positions, atol=1e-9)
    np.testing.assert_allclose(m_d.velocities, m_u.velocities, atol=1e-7)


def test_fom_run_steps_matches_step_loop_damped():
    """solver.run_steps (scan path) applies the same damping as step()."""
    s_a, m_a, _ = _fom(damping=DAMPING)
    s_b, m_b, _ = _fom(damping=DAMPING)
    f = gravity_forces(m_a)
    s_a.run_steps(f, 7, num_iterations=5)
    for _ in range(7):
        s_b.step(f, num_iterations=5)
    np.testing.assert_allclose(m_a.positions, m_b.positions, atol=1e-6)
    np.testing.assert_allclose(m_a.velocities, m_b.velocities, atol=1e-4)


def test_damping_zero_is_default_path(pipeline):
    basis_dir, pos_path, _ = pipeline
    s0, m0 = _reduced(basis_dir, pos_path, "off", damping=0.0)
    s1, m1 = _reduced(basis_dir, pos_path, "off")
    assert s0.eta == 1.0
    f = gravity_forces(m0)
    s0.run_steps(f, 5, num_iterations=5)
    s1.run_steps(f, 5, num_iterations=5)
    np.testing.assert_array_equal(m0.positions, m1.positions)


def test_reduced_xla_step_oracle(pipeline):
    """The reduced per-step jitted path follows the same oracle."""
    basis_dir, pos_path, _ = pipeline
    s_d, m_d = _reduced(basis_dir, pos_path, "off", damping=DAMPING)
    s_u, m_u = _reduced(basis_dir, pos_path, "off", damping=0.0)
    f = gravity_forces(m_d)
    rng = np.random.default_rng(5)
    v0 = rng.normal(scale=0.4, size=m_d.positions.shape)
    m_d.velocities = v0.copy()
    m_u.velocities = ETA * v0
    s_d.step(f, num_iterations=5)
    s_u.step(f, num_iterations=5)
    np.testing.assert_allclose(m_d.positions, m_u.positions, atol=1e-6)
    np.testing.assert_allclose(m_d.velocities, m_u.velocities, atol=1e-4)


@pytest.mark.parametrize("contact_mode", [True, False])
def test_resident_kernels_damped_match_step_loop(pipeline, contact_mode):
    """Damped affine resident kernels (contact-mode AND lean+tier-1
    variants, small rebase to exercise the rebase recursions) match the
    damped per-step loop across a floor-contacting run."""
    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _reduced(basis_dir, pos_path, "interpret",
                            damping=DAMPING,
                            resident_contact_mode=contact_mode,
                            resident_rebase_every=4)
    assert s_res._resident is not None
    if not contact_mode:
        assert s_res._resident_fast is not None   # tier-1 built, damped
    s_ref, m_ref = _reduced(basis_dir, pos_path, "off", damping=DAMPING)
    f = gravity_forces(m_ref)

    # 30x (not 50x): a harder slam crushes triangles into the strain
    # projection's polar-decomposition DEGENERACY, where the step map is
    # genuinely discontinuous (two equally-valid projections) and a
    # 1e-10 rounding difference between the tier-1/contact-kernel path
    # and the per-step loop flips a 2e-3 divergence — verified by
    # perturbation analysis (both sides are valid PD steps; exact
    # equality through a knife edge is not a sound expectation).
    s_res.run_steps(f, 6, num_iterations=6)          # contact-free
    s_res.run_steps(f * 30.0, 14, num_iterations=6)  # slams into floor
    for _ in range(6):
        s_ref.step(f, num_iterations=6)
    for _ in range(14):
        s_ref.step(f * 30.0, num_iterations=6)

    assert s_res.frame == 20
    # the slam genuinely reached the floor in both runs
    assert float(m_ref.positions[:, 1].min()) < 0.1
    assert float(m_res.positions[:, 1].min()) < 0.1
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m_res.velocities, m_ref.velocities,
                               atol=1e-4)


def test_damping_no_floor(pipeline):
    """Floor-collision OFF: the damped resident kernel (built without the
    contact branch) matches the damped per-step loop."""
    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _reduced(basis_dir, pos_path, "interpret",
                            damping=DAMPING, floor=False)
    assert s_res._resident is not None
    s_ref, m_ref = _reduced(basis_dir, pos_path, "off", damping=DAMPING,
                            floor=False)
    f = gravity_forces(m_ref)
    s_res.run_steps(f, 8, num_iterations=6)
    for _ in range(8):
        s_ref.step(f, num_iterations=6)
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m_res.velocities, m_ref.velocities,
                               atol=1e-4)


def test_resident_standard_damped_match(pipeline):
    """The standard (non-affine) resident kernel damps identically."""
    from animsnapbases_tpu.ops.pallas_resident import (
        build_resident_multistep,
    )

    basis_dir, pos_path, _ = pipeline
    s_res, m_res = _reduced(basis_dir, pos_path, "interpret",
                            damping=DAMPING)
    st = s_res._resident_state
    ops = st["ops"]
    run = build_resident_multistep(
        ops, ops["gather_slices"], ops["layout"], ops["G_allT"],
        ops["WT_all"], ops["inv3"], st["U_liftT"],
        st["ut_acT"], st["mass_inv"], s_res.dt,
        m_res.floor_collision, m_res.floor_height, st["n_sel"],
        interpret=True, eta=s_res.eta)
    s_res._resident = (run, st["perm"], st["iperm"])
    s_res._resident_fast = None
    s_res._resident_kind = "standard"

    s_ref, m_ref = _reduced(basis_dir, pos_path, "off", damping=DAMPING)
    f = gravity_forces(m_ref)
    s_res.run_steps(f, 8, num_iterations=6)
    for _ in range(8):
        s_ref.step(f, num_iterations=6)
    np.testing.assert_allclose(m_res.positions, m_ref.positions, atol=1e-6)


def test_tp_reduced_step_damped(pipeline):
    """The tensor-parallel reduced step reads solver.eta: the sharded
    damped step matches the single-device damped per-step loop."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from animsnapbases_tpu.parallel import (
        build_device_mesh,
        make_tp_reduced_step,
    )

    basis_dir, pos_path, _ = pipeline
    s1, m1 = _reduced(basis_dir, pos_path, "off", damping=DAMPING)
    mesh = build_device_mesh((4,), ("model",))
    tp_step = make_tp_reduced_step(s1, mesh)

    s2, m2 = _reduced(basis_dir, pos_path, "off", damping=DAMPING)
    f = gravity_forces(m1)
    pos = m1.positions.copy()
    vel = np.zeros_like(pos)
    for _ in range(3):
        pos, vel = tp_step(pos, vel, f, num_iterations=6)
        s2.step(f, num_iterations=6)
    np.testing.assert_allclose(np.asarray(pos), m2.positions, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vel), m2.velocities, atol=1e-7)


def test_batched_serving_damped(pipeline):
    """make_batched_run under damping: every sim matches its own damped
    single-sim run."""
    basis_dir, pos_path, _ = pipeline
    s, m = _reduced(basis_dir, pos_path, "interpret", damping=DAMPING)
    f = gravity_forces(m)
    nb = 2
    P = np.stack([m.positions] * nb)
    V = np.stack([m.velocities * (1.0 + 0.3 * i) for i in range(nb)])
    F = np.stack([f] * nb)
    run = s.make_batched_run()
    P2, V2 = run(P, V, F, 6, num_iterations=6)
    P2, V2 = np.asarray(P2), np.asarray(V2)

    for i in range(nb):
        s_i, m_i = _reduced(basis_dir, pos_path, "off", damping=DAMPING)
        m_i.velocities = V[i].copy()
        for _ in range(6):
            s_i.step(f, num_iterations=6)
        np.testing.assert_allclose(P2[i], m_i.positions, atol=1e-5)
        np.testing.assert_allclose(V2[i], m_i.velocities, atol=1e-3)
