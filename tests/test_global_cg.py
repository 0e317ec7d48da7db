"""Device CG global solve (displacement form) vs the reference-equivalent
host sparse-LU path and the dense Cholesky path.

The CG sweep is the production full-order path above DENSE_LIMIT — it must
match the prefactored exact solves to tight tolerance (ref global solve:
Simulators.py:608-611, 726-736).
"""

import numpy as np

from animsnapbases_tpu.geometry.procedural import bar_model, cloth_model
from animsnapbases_tpu.sim.model import DeformableModel
from animsnapbases_tpu.sim.solver import Solver
from test_sim_solver import gravity_forces, sim_args


def _cloth(rows, cols):
    V, F = cloth_model(rows, cols)
    V = V.copy()
    V[:, 2] += 0.15 * V[:, 0]
    model = DeformableModel(V, F, masses=np.full(len(V), 10.0),
                            floor_collision=True, init_height_shift=3.0)
    model.add_tri_constrain_strain(0.95, 1.05, wi=1e4)
    model.add_edge_spring_constraint(wi=1e4)
    model.compute_cloth_corner_indices()
    model.fix_surface_side_vertices("left")
    return model


def _run(model, mode, steps=4, iters=10):
    solver = Solver(global_solve=mode)
    solver.set_model(model)
    solver.prepare(sim_args())
    fext = gravity_forces(model)
    for _ in range(steps):
        solver.step(fext, num_iterations=iters)
    return model.positions


def test_cg_matches_host_lu_midsize_cloth():
    """31x31 cloth (961 verts, 3N > DENSE_LIMIT): auto picks CG; it must
    match the host sparse LU trajectory."""
    m_cg, m_host = _cloth(31, 31), _cloth(31, 31)
    solver = Solver()
    solver.set_model(m_cg)
    solver.prepare(sim_args())
    assert solver._mode == "cg"        # auto routed above the dense limit
    p_cg = _run(_cloth(31, 31), "cg")
    p_host = _run(m_host, "host")
    np.testing.assert_allclose(p_cg, p_host, atol=5e-8)


def test_cg_matches_dense_small_cloth():
    p_cg = _run(_cloth(6, 6), "cg")
    p_dense = _run(_cloth(6, 6), "dense")
    np.testing.assert_allclose(p_cg, p_dense, atol=5e-9)


def test_full_solver_run_steps_matches_step():
    """Device-resident multi-step FOM (one dispatch) must match per-frame
    step() — including recording and an ANIMATED positional constraint
    (the (T, e, 3) target timeline)."""
    def build():
        m = _cloth(8, 8)
        shift = np.zeros((12, 3))
        shift[:, 2] = np.linspace(0.0, 0.5, 12)
        m.add_positional_constraint(10, wi=1e6, motion_type="user_defined",
                                    frame_shift=shift)
        return m

    m_a, m_b = build(), build()
    s_a = Solver(global_solve="cg")
    s_a.set_model(m_a)
    s_a.prepare(sim_args())
    s_a.set_store_p(True)
    s_b = Solver(global_solve="cg")
    s_b.set_model(m_b)
    s_b.prepare(sim_args())
    s_b.set_store_p(True)

    fext = gravity_forces(m_a)
    traj_a = []
    for _ in range(6):
        s_a.step(fext, num_iterations=5)
        traj_a.append(m_a.positions.copy())
    traj_b = s_b.run_steps(fext, 6, num_iterations=5, record=True)

    np.testing.assert_allclose(traj_b, np.array(traj_a), atol=1e-9)
    assert s_a.frame == s_b.frame == 6
    for name in s_a._recorded:
        for k in s_a._recorded[name]:
            np.testing.assert_allclose(s_b._recorded[name][k],
                                       s_a._recorded[name][k], atol=1e-9)


def test_cg_warm_start_converges_immediately():
    """The stopping rule is relative to the rhs (warm-start independent):
    re-solving from the previous solution must cost ~no iterations, not
    spin to max_iters chasing an unreachable reduction of an already-tiny
    initial residual."""
    import scipy.sparse

    from animsnapbases_tpu.ops.cg import make_pcg_solver

    rng = np.random.default_rng(0)
    n = 200
    A = scipy.sparse.random(n, n, density=0.05, random_state=1)
    A = (A @ A.T + 10 * scipy.sparse.eye(n)).tocoo()
    rhs = rng.normal(size=(n, 3))
    solve = make_pcg_solver(A.row, A.col, A.data, A.diagonal(), n,
                            tol=1e-10, max_iters=500)
    x, it_cold = solve(rhs)
    assert 0 < int(it_cold) < 500
    x2, it_warm = solve(rhs, x0=x)
    assert int(it_warm) <= 1
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-9)


def test_run_steps_multiple_lengths_and_corrections():
    """The non-recording run_steps path serves any num_steps from one
    compiled program and reports the final step's floor corrections."""
    m_a, m_b = _cloth(6, 6), _cloth(6, 6)
    m_a.positions[:, 1] -= 2.95      # graze the floor
    m_b.positions[:, 1] -= 2.95
    s_a = Solver(global_solve="cg")
    s_a.set_model(m_a)
    s_a.prepare(sim_args())
    s_b = Solver(global_solve="cg")
    s_b.set_model(m_b)
    s_b.prepare(sim_args())
    fext = gravity_forces(m_a)
    for n_steps in (3, 5, 2):
        s_a.run_steps(fext, n_steps, num_iterations=4)
    for _ in range(10):
        s_b.step(fext, num_iterations=4)
    np.testing.assert_allclose(m_a.positions, m_b.positions, atol=1e-8)
    np.testing.assert_allclose(s_a.model.positions_corrections,
                               s_b.model.positions_corrections, atol=1e-9)


def test_cg_matches_dense_tet_bar():
    def bar():
        V, T, F, _ = bar_model(4, 2, 2)
        model = DeformableModel(V, F, elements=T,
                                masses=np.full(len(V), 5.0),
                                floor_collision=False)
        model.add_tet_constrain_strain(0.95, 1.05, wi=1e4)
        model.fix_surface_side_vertices("left")
        return model

    p_cg = _run(bar(), "cg", steps=3)
    p_dense = _run(bar(), "dense", steps=3)
    np.testing.assert_allclose(p_cg, p_dense, atol=5e-9)
