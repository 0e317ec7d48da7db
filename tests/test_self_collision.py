"""Self-collision: device resolver equivalence with the host KD-tree pass,
solver integration of all three modes, and the characterization test for
the documented default-off deviation (the reference runs both host
resolvers unconditionally every step, Simulators.py:529-530/739-740)."""

import numpy as np
import jax.numpy as jnp
import pytest

from animsnapbases_tpu.geometry.procedural import cloth_model
from animsnapbases_tpu.sim import collisions
from animsnapbases_tpu.sim.collisions_device import (
    closest_point_on_triangle,
    resolve_self_collision_device,
)
from animsnapbases_tpu.sim.model import DeformableModel
from animsnapbases_tpu.sim.solver import Solver
from test_sim_solver import gravity_forces, sim_args


def _crumpled_cloth(scale=0.004, seed=0):
    """A cloth scaled so vertex spacing is ~4x min_dist, crumpled so some
    non-adjacent vertex/triangle pairs sit inside min_dist."""
    V, F = cloth_model(8, 8)
    rng = np.random.default_rng(seed)
    V = V * scale
    V = V + rng.normal(scale=0.3 * scale, size=V.shape)
    return V, F


def test_closest_point_matches_host():
    rng = np.random.default_rng(3)
    for _ in range(50):
        tri = rng.normal(size=(3, 3))
        p = rng.normal(size=3)
        d_host, c_host = collisions._point_triangle_closest(p, *tri)
        c_dev = np.asarray(closest_point_on_triangle(
            jnp.asarray(p), *map(jnp.asarray, tri)))
        np.testing.assert_allclose(c_dev, c_host, atol=1e-12)


def test_device_resolver_matches_host():
    V, F = _crumpled_cloth()
    out_host = collisions.resolve_self_collision_fast(V, F)
    assert np.abs(out_host - V).max() > 0      # contacts actually resolved
    out_dev = np.asarray(resolve_self_collision_device(
        jnp.asarray(V), jnp.asarray(F)))
    np.testing.assert_allclose(out_dev, out_host, atol=1e-12)


def _folded_cloth_model(mode):
    """Two cloth layers 0.5*min_dist apart, pressed together by gravity."""
    V, F = cloth_model(6, 12)
    V = V * 0.004
    # fold along y so rows 6..11 lie above rows 0..5
    y = V[:, 1]
    top = y > 5.5 * 0.004
    V2 = V.copy()
    V2[top, 1] = 11 * 0.004 - y[top]
    V2[top, 2] += 0.0006
    model = DeformableModel(V2, F, masses=np.full(len(V2), 10.0),
                            floor_collision=False)
    model.add_edge_spring_constraint(wi=1e4)
    solver = Solver()
    solver.enable_self_collision = mode
    solver.set_model(model)
    solver.prepare(sim_args())
    return solver, model


def _min_nonadjacent_distance(V, F):
    dmin = np.inf
    cent = V[F].mean(axis=1)
    for vi in range(len(V)):
        order = np.argsort(((cent - V[vi]) ** 2).sum(axis=1))[:5]
        for fi in order:
            if vi in F[fi]:
                continue
            d, _ = collisions._point_triangle_closest(V[vi], *V[F[fi]])
            dmin = min(dmin, d)
    return dmin


def test_self_collision_gate_characterization():
    """Characterizes the default-off deviation: on a self-contacting folded
    cloth the resolvers keep the layers separated; with the gate off the
    layers interpenetrate (squeeze below the host resolver's result)."""
    s_off, m_off = _folded_cloth_model(False)
    s_dev, m_dev = _folded_cloth_model("device")
    f = np.zeros_like(m_off.positions)
    f[:, 2] = -9.81 * 10.0 * 0.01     # squeeze the layers together
    for _ in range(10):
        s_off.step(f, num_iterations=4)
        s_dev.step(f, num_iterations=4)
    d_off = _min_nonadjacent_distance(m_off.positions, m_off.faces)
    d_dev = _min_nonadjacent_distance(m_dev.positions, m_dev.faces)
    assert d_dev > d_off, (d_dev, d_off)
    assert d_dev > 4e-4                 # resolver holds ~min_dist apart


def test_device_collision_blocked_matches_unblocked():
    """Beyond the pair budget the (n, m) candidate matrix is computed in
    row-blocked slabs (round-5: replaces the old hard ValueError gate) —
    the pass, the exact probe, and the cheap lower bound must all return
    IDENTICAL results blocked vs whole, since per-row top_k and min
    reductions are row-independent."""
    from animsnapbases_tpu.sim.collisions_device import (
        min_clearance_device,
        min_clearance_lower_bound_device,
    )

    V, F = _crumpled_cloth()
    q, f = jnp.asarray(V), jnp.asarray(F)
    m = int(f.shape[0])
    tiny = 16 * m                      # forces ~16-row slabs
    np.testing.assert_array_equal(
        np.asarray(resolve_self_collision_device(q, f)),
        np.asarray(resolve_self_collision_device(q, f, max_pairs=tiny)))
    np.testing.assert_array_equal(
        np.asarray(min_clearance_device(q, f)),
        np.asarray(min_clearance_device(q, f, max_pairs=tiny)))
    np.testing.assert_array_equal(
        np.asarray(min_clearance_lower_bound_device(q, f)),
        np.asarray(min_clearance_lower_bound_device(q, f,
                                                    max_pairs=tiny)))


def test_collide_cache_invalidated_on_set_model():
    """The faces-keyed jitted collision pass must not survive a model swap
    (stale faces silently push against the wrong triangles)."""
    s, m = _folded_cloth_model("device")
    f = np.zeros_like(m.positions)
    s.step(f, num_iterations=2)
    assert s._collide_jit is not None
    V2, F2 = cloth_model(4, 4)
    m2 = DeformableModel(V2 * 0.004, F2, masses=np.full(len(V2), 10.0),
                         floor_collision=False)
    m2.add_edge_spring_constraint(wi=1e4)
    s.set_model(m2)
    assert s._collide_jit is None
    s.prepare(sim_args())
    s.step(np.zeros_like(m2.positions), num_iterations=2)
    assert np.isfinite(m2.positions).all()


def test_host_mode_runs_both_reference_passes():
    s, m = _folded_cloth_model(True)
    f = np.zeros_like(m.positions)
    f[:, 2] = -9.81 * 10.0 * 0.01
    for _ in range(3):
        s.step(f, num_iterations=4)
    assert np.isfinite(m.positions).all()


def test_device_mode_run_steps_matches_step():
    s1, m1 = _folded_cloth_model("device")
    s2, m2 = _folded_cloth_model("device")
    f = np.zeros_like(m1.positions)
    f[:, 2] = -9.81 * 10.0 * 0.01
    for _ in range(6):
        s1.step(f, num_iterations=4)
    s2.run_steps(f, 6, num_iterations=4)
    np.testing.assert_allclose(m2.positions, m1.positions, atol=1e-9)


def _reduced_sc_builder(tmp_path, scale=0.004, mode="device",
                        resident_tier=None):
    from reduction_helpers import record_and_build_bases
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    def make_model():
        V, F = cloth_model(5, 5)
        V = V.copy() * scale
        V[:, 2] += 0.1 * V[:, 0]
        model = DeformableModel(V, F, masses=np.full(len(V), 10.0),
                                floor_collision=False)
        model.add_tri_constrain_strain(0.95, 1.05, wi=1e4)
        model.add_edge_spring_constraint(wi=1e4)
        return model

    basis_dir, pos_path, _ = record_and_build_bases(tmp_path, make_model,
                                                    sim_args())

    def build():
        args = sim_args(
            constraint_projection_basis_type="deim_pod_vectorized",
            tri_strain_reduced=True, tri_strain_num_components=8,
            edge_spring_reduced=True, edge_spring_num_components=8,
            geom_interpolation_basis_dir=basis_dir,
            geom_interpolation_basis_file="basis.npz",
            position_reduced=True, position_num_components=10,
            position_basis_file=pos_path)
        solver = AnimSnapBasesSolver(args, pallas_mode="interpret")
        model = make_model()
        solver.enable_self_collision = mode
        if resident_tier is not None:
            solver.self_collision_resident = resident_tier
        solver.set_model(model)
        solver.prepare(args)
        return solver, model

    return build


def test_reduced_device_collision_captured(tmp_path):
    """Reduced solver: 'device' mode is captured into the jitted step,
    the resident kernels build (the proximity-gated tier uses them),
    and run_steps matches step() — at 0.004 scale the clearance
    (~4x min_dist) certifies the window, the pass is identity, and the
    f64 interpret-mode resident kernel reproduces the per-step math."""
    import warnings

    build = _reduced_sc_builder(tmp_path)
    s1, m1 = build()
    assert s1._collision_mode == "device"
    assert getattr(s1, "_resident", None) is not None
    s2, m2 = build()
    f = np.zeros_like(m1.positions)
    f[:, 1] = -9.81 * 10.0 * 0.01
    for _ in range(5):
        s1.step(f, num_iterations=4)
    with warnings.catch_warnings():
        # the fused loop must trace and serve — a downgrade warning
        # here means the equivalence test covers the fallback, not the
        # shipping path (round-4 review finding: x64 dtype leak)
        warnings.simplefilter("error", UserWarning)
        s2.run_steps(f, 5, num_iterations=4)
    assert callable(s2._sc_fused)         # fused loop built, not poisoned
    np.testing.assert_allclose(m2.positions, m1.positions, atol=1e-9)
    assert np.isfinite(m1.positions).all()


def test_sc_resident_tier_disabled_restores_old_path(tmp_path):
    """self_collision_resident=False skips the resident build entirely
    and serves the exact per-step path (the pre-tier behavior)."""
    build = _reduced_sc_builder(tmp_path, resident_tier=False)
    s1, m1 = build()
    assert getattr(s1, "_resident", None) is None
    s2, m2 = build()
    f = np.zeros_like(m1.positions)
    f[:, 1] = -9.81 * 10.0 * 0.01
    for _ in range(5):
        s1.step(f, num_iterations=4)
    s2.run_steps(f, 5, num_iterations=4)
    np.testing.assert_allclose(m2.positions, m1.positions, atol=1e-9)


def test_sc_resident_tier_serves_clear_windows(tmp_path):
    """On a cloth whose clearance is ~1000x min_dist the proximity-gated
    tier must serve the WHOLE call on the resident kernels (certificate
    set) and match the per-step device-SC path, whose pass is identity
    throughout (tolerance covers resident-vs-step f32 ordering only)."""
    import warnings

    build = _reduced_sc_builder(tmp_path, scale=1.0)
    s1, m1 = build()
    assert getattr(s1, "_resident", None) is not None
    s2, m2 = build()
    f = np.zeros_like(m1.positions)
    f[:, 1] = -9.81 * 10.0 * 0.001
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        s1.run_steps(f, 12, num_iterations=4)
    assert callable(s1._sc_fused)         # fused loop served, no fallback
    assert s1._last_fast_steps == 12      # tier 1 covered every step
    for _ in range(12):
        s2.step(f, num_iterations=4)
    np.testing.assert_allclose(m1.positions, m2.positions, atol=1e-5)
    np.testing.assert_allclose(m1.velocities, m2.velocities, atol=1e-4)


def test_sc_resident_tier_hands_back_on_proximity(tmp_path):
    """A cloth whose vertex spacing starts UNDER min_dist is in the
    proximity regime from step 0: the first window must go to the
    per-step jit (pass fused, actively pushing), the whole-call tier-1
    certificate must stay unset, and the result must equal the exact
    per-step path bit-for-bit."""
    import warnings

    build = _reduced_sc_builder(tmp_path, scale=0.0008)
    s1, m1 = build()
    s2, m2 = build()
    f = np.zeros_like(m1.positions)
    f[:, 1] = -9.81 * 10.0 * 0.01
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        s1.run_steps(f, 8, num_iterations=4)
    assert callable(s1._sc_fused)         # fused loop traced (then stopped)
    assert s1._last_fast_steps is None    # tier 1 never certified
    for _ in range(8):
        s2.step(f, num_iterations=4)
    np.testing.assert_allclose(m1.positions, m2.positions, atol=1e-9)


def test_min_clearance_device_matches_host_probe():
    """The device clearance probe agrees with a host recomputation over
    the same k-nearest-centroid candidate set."""
    from animsnapbases_tpu.sim.collisions_device import (
        min_clearance_device,
    )

    V, F = _crumpled_cloth()
    d_dev = float(min_clearance_device(jnp.asarray(V), jnp.asarray(F)))
    d_host = _min_nonadjacent_distance(V, F)
    np.testing.assert_allclose(d_dev, d_host, rtol=1e-6)


def test_clearance_lower_bound_is_sound():
    """The cheap centroid-radius bound must never exceed the exact probe
    (bound <= probe is the soundness direction the fused serving loop
    relies on: a bound-admitted window is always probe-admissible), and
    must be tight enough to be positive on a clearly-separated cloth."""
    from animsnapbases_tpu.sim.collisions_device import (
        min_clearance_device,
        min_clearance_lower_bound_device,
    )

    rng = np.random.default_rng(7)
    for trial in range(5):
        V, F = _crumpled_cloth()
        V = V + 0.03 * rng.normal(size=V.shape)
        lb = float(min_clearance_lower_bound_device(jnp.asarray(V),
                                                    jnp.asarray(F)))
        exact = float(min_clearance_device(jnp.asarray(V),
                                           jnp.asarray(F)))
        assert lb <= exact + 1e-6, (trial, lb, exact)

    # flat well-separated cloth: the bound must still certify clearance
    from animsnapbases_tpu.geometry.procedural import cloth_model
    V, F = cloth_model(12, 12)
    lb = float(min_clearance_lower_bound_device(jnp.asarray(V),
                                                jnp.asarray(F)))
    assert lb > 0.0


def test_sc_budget_staleness_guard_every_window_matches(tmp_path):
    """self_collision_budget_windows=0 forces the exact probe at EVERY
    window (the staleness guard's strictest setting).  On a clear scene
    the exact probe and the budget-carry heuristic admit the same
    windows, so the trajectory must match the default bit-for-bit —
    and the guard path itself must trace (no downgrade warning)."""
    import warnings

    build = _reduced_sc_builder(tmp_path, scale=1.0)
    s1, m1 = build()
    s2, m2 = build()
    s2.self_collision_budget_windows = 0
    s2._sc_fused = None                   # rebuild with the new K
    f = np.zeros_like(m1.positions)
    f[:, 1] = -9.81 * 10.0 * 0.001
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        s1.run_steps(f, 12, num_iterations=4)
        s2.run_steps(f, 12, num_iterations=4)
    assert callable(s1._sc_fused) and callable(s2._sc_fused)
    assert s2._last_fast_steps == 12
    np.testing.assert_allclose(m1.positions, m2.positions, atol=0)


def test_sc_fused_failure_downgrades_to_host_windows(tmp_path):
    """A compile/dispatch failure in the fused probe+window loop must
    downgrade to the host-probed window path (and cache the failure so
    it is not rebuilt), not crash run_steps — Mosaic rejects on real TPU
    what interpret mode allows, and every other tier-1 call site already
    degrades (round-4 review finding)."""
    build = _reduced_sc_builder(tmp_path, scale=1.0)
    s1, m1 = build()
    assert getattr(s1, "_resident", None) is not None

    def boom(*a, **k):
        raise RuntimeError("synthetic Mosaic rejection")

    s1._sc_fused = boom                   # poison the cached fused loop
    s2, m2 = build()
    f = np.zeros_like(m1.positions)
    f[:, 1] = -9.81 * 10.0 * 0.001
    with pytest.warns(UserWarning, match="fused self-collision"):
        s1.run_steps(f, 12, num_iterations=4)
    assert s1._sc_fused is False          # failure cached, no rebuild
    assert s1._sc_fused_runner() is None
    for _ in range(12):
        s2.step(f, num_iterations=4)
    # host-window serving is the same math (clear windows skip the pass)
    np.testing.assert_allclose(m1.positions, m2.positions, atol=1e-5)
    assert np.isfinite(m1.positions).all()
