"""Differentiable reduced-PD (sim/diff.py): forward parity with the
production fast path, gradient correctness vs finite differences (weight
scales, forces), and a system-identification fit that recovers perturbed
per-group weights from a recorded trajectory."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animsnapbases_tpu.sim.diff import DiffReducedSim, fit_scales
from test_sim_reduced_position import pipeline, _reduced_solver  # noqa: F401
from test_sim_solver import gravity_forces


@pytest.fixture(scope="module")
def diff_setup(pipeline):  # noqa: F811
    basis_dir, pos_path, _ = pipeline
    solver, model = _reduced_solver(basis_dir, pos_path, with_position=True)
    sim = DiffReducedSim(solver)
    q0 = jnp.asarray(model.positions)
    v0 = jnp.asarray(model.velocities)
    fext = jnp.asarray(gravity_forces(model))
    targets = jnp.asarray(model.positional_targets(0))[None]  # (1, e, 3)
    return solver, model, sim, q0, v0, fext, targets


def test_scales_one_matches_solver(diff_setup):
    solver, model, sim, q0, v0, fext, targets = diff_setup
    q, v = q0, v0
    scales = sim.ones_scales()
    for _ in range(8):
        q, v = sim.step(q, v, fext, targets[0], scales, num_iterations=6)
    for _ in range(8):
        solver.step(np.asarray(fext), num_iterations=6)
    scale = np.abs(model.positions).max()
    err = np.abs(np.asarray(q) - model.positions).max() / scale
    assert err < 1e-8, f"diff step deviates from solver fast path: {err}"
    np.testing.assert_allclose(np.asarray(v), model.velocities,
                               atol=1e-6 * scale)


def test_grad_scales_matches_finite_differences(diff_setup):
    _, _, sim, q0, v0, fext, targets = diff_setup
    rollout = sim.make_rollout(num_steps=5, num_iterations=4)

    def loss(scales):
        q, _ = rollout(q0, v0, fext, targets, scales)
        return jnp.mean((q - q0) ** 2)

    s0 = sim.ones_scales()
    g = jax.grad(loss)(s0)
    assert np.isfinite(np.asarray(g)).all()
    # eps is LARGE on purpose: the sigma-clamp projections make the loss
    # piecewise-smooth at a fine scale (elements flickering across the
    # clamp boundary), so central differences are noise-dominated below
    # ~1e-5 while at 1e-4 they converge to the AD value (measured rel
    # 3e-4 here; 0.06 at eps=1e-5, 1.3 at 1e-7)
    eps = 1e-4
    for i in range(len(sim.group_names)):
        e = jnp.zeros_like(s0).at[i].set(eps)
        fd = (loss(s0 + e) - loss(s0 - e)) / (2 * eps)
        denom = max(abs(float(fd)), abs(float(g[i])), 1e-12)
        rel = abs(float(g[i]) - float(fd)) / denom
        assert rel < 5e-3, (
            f"scale-grad mismatch for {sim.group_names[i]}: "
            f"ad={float(g[i]):.6e} fd={float(fd):.6e}")


def test_grad_force_matches_finite_differences(diff_setup):
    _, _, sim, q0, v0, fext, targets = diff_setup
    rollout = sim.make_rollout(num_steps=5, num_iterations=4)
    scales = sim.ones_scales()

    def loss(c):
        q, _ = rollout(q0, v0, c * fext, targets, scales)
        return jnp.mean(q ** 2)

    g = float(jax.grad(loss)(jnp.asarray(1.0)))
    eps = 1e-4   # same clamp-flicker story as the scales test
    fd = float((loss(jnp.asarray(1.0 + eps)) - loss(jnp.asarray(1.0 - eps)))
               / (2 * eps))
    assert abs(g - fd) / max(abs(fd), 1e-12) < 1e-3


def test_checkpoint_matches_plain_backward(diff_setup):
    _, _, sim, q0, v0, fext, targets = diff_setup
    scales = sim.ones_scales()
    grads = []
    for checkpoint in (True, False):
        rollout = sim.make_rollout(num_steps=4, num_iterations=3,
                                   checkpoint=checkpoint)

        def loss(s):
            q, _ = rollout(q0, v0, fext, targets, s)
            return jnp.sum(q ** 2)

        grads.append(np.asarray(jax.grad(loss)(scales)))
    # rematerialization reassociates the forward recompute -> ~1e-7 rel
    np.testing.assert_allclose(grads[0], grads[1], rtol=1e-6)


def test_fit_recovers_perturbed_weights(diff_setup):
    """System identification: simulate a 'ground truth' with softened
    elastic weights, then recover the scales from the trajectory alone."""
    _, _, sim, q0, v0, fext, targets = diff_setup
    elastic = [i for i, n in enumerate(sim.group_names)
               if n != "positional"]
    true = np.ones(len(sim.group_names))
    true[elastic[0]] = 0.55
    if len(elastic) > 1:
        true[elastic[1]] = 1.6
    true_s = jnp.asarray(true)

    T = 12
    rollout = sim.make_rollout(T, num_iterations=4, save_trajectory=True)
    _, _, target_traj = rollout(q0, v0, fext, targets, true_s)

    fitted, history = fit_scales(
        sim, q0, v0, fext, targets, target_traj,
        num_iterations=4, steps=120, learning_rate=0.08)
    assert history[-1] < 1e-3 * history[0], (
        f"fit failed to converge: {history[0]:.3e} -> {history[-1]:.3e}")
    for i in elastic:
        rel = abs(float(fitted[i]) - true[i]) / true[i]
        assert rel < 0.15, (
            f"{sim.group_names[i]}: fitted {float(fitted[i]):.3f} "
            f"vs true {true[i]:.3f}")


def test_vmapped_rollout_over_scales(diff_setup):
    """Ensemble fitting falls out of purity: vmap the rollout over a
    batch of material-scale vectors (B candidate materials advanced in
    one batched dispatch) and the rows match solo rollouts."""
    _, _, sim, q0, v0, fext, targets = diff_setup
    rollout = sim.make_rollout(num_steps=4, num_iterations=3)
    batch = jnp.stack([sim.ones_scales(),
                       sim.ones_scales() * 0.7,
                       sim.ones_scales() * 1.3])
    qb, vb = jax.vmap(
        lambda s: rollout(q0, v0, fext, targets, s))(batch)
    assert qb.shape == (3,) + q0.shape
    for i in range(3):
        qi, vi = rollout(q0, v0, fext, targets, batch[i])
        np.testing.assert_allclose(np.asarray(qb[i]), np.asarray(qi),
                                   rtol=1e-10)
    # and grad composes with vmap (per-candidate gradients in one call)
    g = jax.vmap(jax.grad(
        lambda s: jnp.mean(rollout(q0, v0, fext, targets, s)[0] ** 2)))(
            batch)
    assert np.isfinite(np.asarray(g)).all()


def test_rejects_unreduced_models(pipeline):  # noqa: F811
    basis_dir, pos_path, _ = pipeline
    solver, _ = _reduced_solver(basis_dir, pos_path, with_position=False)
    with pytest.raises(ValueError):
        DiffReducedSim(solver)


# ---------------------------------------------------------------------------
# tet + bending kernels (jacobi_eigh3 / polar / star-stencil paths)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bar_diff(tmp_path_factory):
    from reduction_helpers import record_and_build_bases
    from test_pallas_all_groups import _make_bar_model, _reduced
    from test_sim_solver import sim_args

    tmp = tmp_path_factory.mktemp("bar_diff")
    basis_dir, pos_path, _ = record_and_build_bases(
        tmp, _make_bar_model, sim_args())
    solver, model = _reduced(
        _make_bar_model, basis_dir, pos_path, "off",
        ("tets_strain", "tets_deformation_gradient"), oversample=1.5)
    return solver, model


def test_grad_through_tet_kernels_at_rest(bar_diff):
    """The bar starts EXACTLY at rest (F = I per tet: a degenerate
    spectrum for the 3x3 Jacobi eigensolver) — the regime where naive AD
    through sqrt(0) NaNs the backward pass (ops/svd3.py
    ``_grad_safe_sqrt``)."""
    solver, model = bar_diff
    sim = DiffReducedSim(solver)
    q0 = jnp.asarray(model.positions)
    v0 = jnp.asarray(model.velocities)
    fext = jnp.zeros_like(q0).at[:, 1].set(-98.1)
    targets = jnp.zeros((1, 0, 3))
    rollout = sim.make_rollout(num_steps=3, num_iterations=4)
    scales = sim.ones_scales()

    def loss(c):
        q, _ = rollout(q0, v0, c * fext, targets, scales)
        return jnp.mean(q ** 2)

    g = float(jax.grad(loss)(jnp.asarray(1.0)))
    assert np.isfinite(g)
    eps = 1e-4
    fd = float((loss(jnp.asarray(1.0 + eps)) - loss(jnp.asarray(1.0 - eps)))
               / (2 * eps))
    assert abs(g - fd) / max(abs(fd), 1e-12) < 1e-3
    gs = jax.grad(lambda s: loss_scales(rollout, q0, v0, fext, targets, s))(
        scales)
    assert np.isfinite(np.asarray(gs)).all()


def loss_scales(rollout, q0, v0, fext, targets, s):
    q, _ = rollout(q0, v0, fext, targets, s)
    return jnp.mean(q ** 2)


@pytest.fixture(scope="module")
def bend_diff(tmp_path_factory):
    from reduction_helpers import record_and_build_bases
    from test_pallas_all_groups import _make_bend_cloth_model, _reduced
    from test_sim_solver import sim_args

    tmp = tmp_path_factory.mktemp("bend_diff")

    def make_pinned():
        model = _make_bend_cloth_model()
        model.add_positional_constraint(0, wi=1e5)
        model.add_positional_constraint(5, wi=1e5)
        return model

    basis_dir, pos_path, _ = record_and_build_bases(
        tmp, make_pinned, sim_args())
    solver, model = _reduced(
        make_pinned, basis_dir, pos_path, "off",
        ("verts_bending", "edge_spring", "tris_strain"))
    return solver, model


def test_grad_wrt_positional_targets(bend_diff):
    """Gradients flow through the positional-target branch (UtSt) and the
    bending/edge/tri kernels — inverse pin-placement / control."""
    solver, model = bend_diff
    sim = DiffReducedSim(solver)
    assert sim._has_targets and sim.n_targets == 2
    q0 = jnp.asarray(model.positions)
    v0 = jnp.asarray(model.velocities)
    fext = jnp.zeros_like(q0).at[:, 1].set(-98.1)
    t0 = jnp.asarray(model.positional_targets(0))[None]
    rollout = sim.make_rollout(num_steps=4, num_iterations=4)
    scales = sim.ones_scales()
    goal = q0 + 0.05

    def loss(targets_seq):
        q, _ = rollout(q0, v0, fext, targets_seq, scales)
        return jnp.mean((q - goal) ** 2)

    g = jax.grad(loss)(t0)
    assert g.shape == t0.shape
    assert np.isfinite(np.asarray(g)).all()
    # FD on one target coordinate.  Tolerance is loose: the bending
    # kernel's flip branches + sigma clamps make this loss piecewise-
    # smooth at a fine scale (central differences carry ~1e-3 relative
    # branch-flicker noise at any usable eps; the smooth-path tests
    # above pin AD = FD to 1e-4)
    eps = 1e-4
    e = jnp.zeros_like(t0).at[0, 0, 1].set(eps)
    fd = float((loss(t0 + e) - loss(t0 - e)) / (2 * eps))
    rel = abs(float(g[0, 0, 1]) - fd) / max(abs(fd), 1e-12)
    assert rel < 3e-2, f"target-grad mismatch: ad={float(g[0,0,1])} fd={fd}"
