"""Pallas fused-iteration kernel: validated against the XLA reduced path in
interpreter mode, plus the closed-form 2x2 SVD clamp against numpy."""

import numpy as np
import jax.numpy as jnp
import pytest

from animsnapbases_tpu.ops.strain2d import clamped_fhat_2x2
from test_sim_reduced_position import pipeline  # noqa: F401 (fixture)
from test_sim_solver import gravity_forces, make_cloth_solver, sim_args


@pytest.mark.parametrize("seed", range(4))
def test_clamped_fhat_matches_numpy_svd(seed):
    rng = np.random.default_rng(seed)
    F = rng.normal(size=(64, 2, 2))
    F[::3] = np.eye(2) + 1e-3 * rng.normal(size=(len(F[::3]), 2, 2))
    F[::7, :, 0] *= -1
    smin, smax = 0.6, 1.4
    f00, f01, f10, f11 = clamped_fhat_2x2(
        jnp.asarray(F[:, 0, 0]), jnp.asarray(F[:, 0, 1]),
        jnp.asarray(F[:, 1, 0]), jnp.asarray(F[:, 1, 1]), smin, smax)
    got = np.stack([np.stack([np.asarray(f00), np.asarray(f01)], -1),
                    np.stack([np.asarray(f10), np.asarray(f11)], -1)], 1)
    for i in range(len(F)):
        U, s, Vt = np.linalg.svd(F[i])
        ref = U @ np.diag(np.clip(s, smin, smax)) @ Vt
        np.testing.assert_allclose(got[i], ref, atol=1e-9)


def _solver(basis_dir, pos_path, pallas_mode):
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
    solver.set_model(model)
    solver.prepare(args)
    return solver, model


def test_pallas_interpret_matches_xla(pipeline):
    basis_dir, pos_path, _ = pipeline
    s_ref, m_ref = _solver(basis_dir, pos_path, "off")
    s_pal, m_pal = _solver(basis_dir, pos_path, "interpret")
    f = gravity_forces(m_ref)
    for _ in range(5):
        s_ref.step(f, num_iterations=6)
        s_pal.step(f, num_iterations=6)
    np.testing.assert_allclose(m_pal.positions, m_ref.positions, atol=1e-6)
    np.testing.assert_allclose(m_pal.velocities, m_ref.velocities, atol=1e-4)
