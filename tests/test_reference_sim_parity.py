"""Full-loop simulator parity: the reference ``Solver`` executed on CPU vs
ours, on an identical edge-spring cloth (predictor, floor clamp, assembly,
sparse-LU global solve, velocity update — Simulators.py:537-744).

Edge springs are the one constraint family where our math is intentionally
identical (the tri-strain operator carries a documented deliberate fix, so
full-sim parity is only claimed where the reference math is correct).

The reference's module-scope deps are satisfied minimally: ``igl.edges``
is injected as a real unique-edge function, ``trimesh.Trimesh`` as a thin
vertices/faces + cKDTree holder (enough for its self-collision pass, which
stays inactive on this well-separated cloth), and
``projective_dynamics/utils.py`` is loaded as the ``utils`` module it
expects when run from that directory.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_PD = "/root/reference/projective_dynamics"


class _TrimeshStub(types.ModuleType):
    class Trimesh:
        def __init__(self, vertices, faces, process=False):
            from scipy.spatial import cKDTree
            self.vertices = np.asarray(vertices)
            self.faces = np.asarray(faces)
            # reference behavior: mesh.kdtree is a VERTEX tree
            self.kdtree = cKDTree(self.vertices)
            self.triangles = self.vertices[self.faces]
            self.triangles_center = self.triangles.mean(axis=1)


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_sim():
    if not os.path.isdir(REF_PD):
        pytest.skip("reference checkout not mounted")
    from animsnapbases_tpu.geometry.mesh import unique_edges

    saved = dict(sys.modules)
    igl = types.ModuleType("igl")
    igl.edges = lambda F: unique_edges(np.asarray(F))
    igl.boundary_facets = igl.barycenter = igl.winding_number = None
    igl.copyleft = types.ModuleType("igl.copyleft")
    igl.copyleft.tetgen = None
    tm = _TrimeshStub("trimesh")
    tm.Trimesh = _TrimeshStub.Trimesh
    sys.modules.setdefault("igl", igl)
    sys.modules.setdefault("igl.copyleft", igl.copyleft)
    sys.modules["trimesh"] = tm
    sys.modules["utils"] = _load("utils", os.path.join(REF_PD, "utils.py"))
    try:
        cp = _load("ref_constraint_projections",
                   os.path.join(REF_PD, "Constraint_projections.py"))
        sim = _load("ref_simulators", os.path.join(REF_PD, "Simulators.py"))
        yield cp, sim
    finally:
        for name in list(sys.modules):
            if name not in saved:
                del sys.modules[name]
        sys.modules.update(saved)


def test_edge_spring_cloth_full_loop_matches_reference(ref_sim):
    cp, sim = ref_sim
    from animsnapbases_tpu.geometry.procedural import cloth_model
    from animsnapbases_tpu.config.sim_config import default_sim_args
    from animsnapbases_tpu.sim.model import DeformableModel
    from animsnapbases_tpu.sim.solver import Solver

    V, F = cloth_model(6, 6)
    wi = 1e5
    masses = np.full(len(V), 10.0)
    fixed = [0, 5]                       # two corners, same ids both sides
    fext = np.zeros((len(V), 3))
    fext[:, 1] = -9.81 * 10.0
    steps, iters = 12, 5

    # ---- reference run ----
    rmodel = cp.DeformableMesh(V.copy(), F.copy(), masses=masses.copy())
    rmodel.add_edge_spring_constrain(wi=wi)
    for i in fixed:
        rmodel.fix(i)
    rsolver = sim.Solver()
    rsolver.set_model(rmodel)
    rsolver.prepare(types.SimpleNamespace(dt=0.016))
    for _ in range(steps):
        rsolver.step(fext.copy(), num_iterations=iters)

    # ---- our run (matching the reference ctor's +2 height shift) ----
    model = DeformableModel(V.copy(), F.copy(), masses=masses.copy(),
                            floor_collision=True, init_height_shift=2.0)
    model.add_edge_spring_constraint(wi=wi)
    for i in fixed:
        model.fix(i)
    solver = Solver()
    solver.set_model(model)
    args = default_sim_args()
    args.dt = 0.016
    solver.prepare(args)
    for _ in range(steps):
        solver.step(fext.copy(), num_iterations=iters)

    scale = np.abs(rmodel.positions).max()
    # the reduced sim stayed bounded — the assertion below compares two
    # live trajectories, not two divergences
    assert scale < 10.0
    np.testing.assert_allclose(model.positions, rmodel.positions,
                               atol=1e-6 * scale)
    np.testing.assert_allclose(model.velocities, rmodel.velocities,
                               atol=1e-4)


def test_bending_components_match_reference_but_lhs_bug_is_fixed(ref_sim):
    """Bending parity holds at the component level (cotans, rest curvature,
    S^T columns, projections p) — but NOT for the full sim, deliberately:
    the reference's ``get_wi_SiT_AiT_Ai_Si`` computes ``K = S^T @ S`` with S
    of shape (N, 1), producing a 1x1 scalar whose triplet loop adds the
    whole bending stiffness to VERTEX 0's diagonal only
    (Constraint_projections.py:223-249).  We build the correct
    wi_eff * (S column)(S column)^T over the vertex star instead.
    """
    cp, sim = ref_sim
    import scipy.sparse

    from animsnapbases_tpu.geometry.procedural import cloth_model
    from animsnapbases_tpu.sim import projections
    from animsnapbases_tpu.sim.model import DeformableModel
    from animsnapbases_tpu.sim.solver import _device_group_data

    V, F = cloth_model(6, 6)
    V = V.copy()
    V[:, 2] += 0.15 * np.sin(3.0 * V[:, 0]) * np.cos(2.0 * V[:, 1])
    masses = np.full(len(V), 10.0)

    rmodel = cp.DeformableMesh(V.copy(), F.copy(), masses=masses.copy())
    rmodel.add_vertex_bending_constraint(wi=10.0)
    model = DeformableModel(V.copy(), F.copy(), masses=masses.copy(),
                            floor_collision=True, init_height_shift=2.0)
    model.add_vertex_bending_constraint(wi=10.0)
    g = model.groups["verts_bending"]

    assert len(rmodel.verts_bending_constraints) == g.num
    np.testing.assert_array_equal(rmodel.verts_bending_indicies,
                                  g.data["indices"])
    for i, c in enumerate(rmodel.verts_bending_constraints):
        np.testing.assert_allclose(
            np.sort(c.cotan_weights),
            np.sort(g.data["cotans"][i][g.data["mask"][i]]), atol=1e-12)
        np.testing.assert_allclose(c.rest_mean_curvature,
                                   g.data["rest_curvature"][i], atol=1e-12)

    # S^T assembly columns identical
    Sref = np.asarray(rmodel.verts_bending_assembly_ST.todense())
    Sours = scipy.sparse.coo_matrix(
        (g.st_vals, (g.st_rows, g.st_cols)), shape=Sref.shape).toarray()
    np.testing.assert_allclose(Sours, Sref, atol=1e-10)

    # projections identical
    rng = np.random.default_rng(0)
    q = model.positions + 0.01 * rng.normal(size=model.positions.shape)
    p_ours = np.asarray(projections.verts_bending_p(
        np.asarray(q), _device_group_data(g)))
    p_ref = np.stack([c.get_pi(q.flatten()).ravel()
                      for c in rmodel.verts_bending_constraints])
    np.testing.assert_allclose(p_ours, p_ref, atol=1e-12)

    # the reference LHS bug: every constraint touches only vertex 0
    trips = rmodel.verts_bending_constraints[0].get_wi_SiT_AiT_Ai_Si()
    assert sorted({t[0] // 3 for t in trips}) == [0]
    # ours touches the whole star of the constrained vertex
    ours_rows = set(g.lhs_rows // 3)
    star0 = {int(g.data["indices"][0])} | set(
        g.data["neighbors"][0][g.data["mask"][0]].tolist())
    assert star0 <= ours_rows


def test_tet_bar_full_loop_matches_reference(ref_sim):
    """Volumetric full-loop parity: tet strain + tet deformation gradient
    on the 5-tet-per-cell bar (Simulators/Constraint_projections tet math
    is consistent in the reference, unlike tri-strain/bending)."""
    cp, sim = ref_sim
    from animsnapbases_tpu.geometry.procedural import bar_model
    from animsnapbases_tpu.config.sim_config import default_sim_args
    from animsnapbases_tpu.sim.model import DeformableModel
    from animsnapbases_tpu.sim.solver import Solver

    V, T, F, _ = bar_model(3, 2, 2)
    masses = np.full(len(V), 10.0)
    fixed = [0, 1, 2]
    fext = np.zeros((len(V), 3))
    fext[:, 1] = -9.81 * 10.0
    steps, iters = 10, 5

    rmodel = cp.DeformableMesh(V.copy(), F.copy(), elements=T.copy(),
                               masses=masses.copy())
    rmodel.add_tet_constrain_strain(0.95, 1.05, wi=1e5)
    rmodel.add_tet_constrain_deformation_gradient(wi=1e5)
    for i in fixed:
        rmodel.fix(i)
    rsolver = sim.Solver()
    rsolver.set_model(rmodel)
    rsolver.prepare(types.SimpleNamespace(dt=0.016))
    for _ in range(steps):
        rsolver.step(fext.copy(), num_iterations=iters)

    model = DeformableModel(V.copy(), F.copy(), elements=T.copy(),
                            masses=masses.copy(), floor_collision=True,
                            init_height_shift=2.0)
    model.add_tet_constrain_strain(0.95, 1.05, wi=1e5)
    model.add_tet_constrain_deformation_gradient(wi=1e5)
    for i in fixed:
        model.fix(i)
    solver = Solver()
    solver.set_model(model)
    args = default_sim_args()
    args.dt = 0.016
    solver.prepare(args)
    for _ in range(steps):
        solver.step(fext.copy(), num_iterations=iters)

    scale = np.abs(rmodel.positions).max()
    np.testing.assert_allclose(model.positions, rmodel.positions,
                               atol=1e-5 * scale)


def test_tri_strain_rest_state_deviation_characterized(ref_sim):
    """Deviation #1 evidence: with the reference's tri-strain operator the
    REST state is not an equilibrium — a fully supported flat cloth under
    zero external force drifts; with ours it is an exact fixed point
    (README 'Deliberate deviations' #1, Constraint_projections.py:388-405
    vs sim/groups.py:build_tris_strain)."""
    cp, sim = ref_sim
    from animsnapbases_tpu.geometry.procedural import cloth_model
    from animsnapbases_tpu.config.sim_config import default_sim_args
    from animsnapbases_tpu.sim.model import DeformableModel
    from animsnapbases_tpu.sim.solver import Solver

    V, F = cloth_model(5, 5)
    masses = np.full(len(V), 10.0)
    zero_f = np.zeros((len(V), 3))
    wi = 1e4

    rmodel = cp.DeformableMesh(V.copy(), F.copy(), masses=masses.copy())
    rmodel.add_tri_constrain_strain(0.95, 1.05, wi=wi)
    rsolver = sim.Solver()
    rsolver.set_model(rmodel)
    rsolver.prepare(types.SimpleNamespace(dt=0.016))
    rest_ref = rmodel.positions.copy()
    for _ in range(10):
        rsolver.step(zero_f.copy(), num_iterations=5)
    ref_drift = np.abs(rmodel.positions - rest_ref).max()

    model = DeformableModel(V.copy(), F.copy(), masses=masses.copy(),
                            floor_collision=True, init_height_shift=2.0)
    model.add_tri_constrain_strain(0.95, 1.05, wi=wi)
    solver = Solver()
    solver.set_model(model)
    args = default_sim_args()
    args.dt = 0.016
    solver.prepare(args)
    rest_ours = model.positions.copy()
    for _ in range(10):
        solver.step(zero_f.copy(), num_iterations=5)
    our_drift = np.abs(model.positions - rest_ours).max()

    assert our_drift < 1e-8, f"our rest state drifted: {our_drift}"
    assert ref_drift > 100 * max(our_drift, 1e-12), (
        f"expected the reference operator to drift at rest "
        f"(ref {ref_drift}, ours {our_drift})")


def test_positional_constraint_full_loop_matches_reference(ref_sim):
    """Springs + a shift-click-style positional pin (fixed target) on a
    free vertex; full loop (PositionalConstraint,
    Constraint_projections.py:77-113)."""
    cp, sim = ref_sim
    from animsnapbases_tpu.geometry.procedural import cloth_model
    from animsnapbases_tpu.config.sim_config import default_sim_args
    from animsnapbases_tpu.sim.model import DeformableModel
    from animsnapbases_tpu.sim.solver import Solver

    V, F = cloth_model(5, 5)
    masses = np.full(len(V), 10.0)
    pinned = 12                         # interior vertex held in place
    fext = np.zeros((len(V), 3))
    fext[:, 1] = -9.81 * 10.0
    steps, iters = 10, 5

    rmodel = cp.DeformableMesh(V.copy(), F.copy(), masses=masses.copy())
    rmodel.add_edge_spring_constrain(wi=1e5)
    rmodel.add_positional_constraint(pinned, wi=1e9)
    rsolver = sim.Solver()
    rsolver.set_model(rmodel)
    rsolver.prepare(types.SimpleNamespace(dt=0.016))
    for _ in range(steps):
        rsolver.step(fext.copy(), num_iterations=iters)

    model = DeformableModel(V.copy(), F.copy(), masses=masses.copy(),
                            floor_collision=True, init_height_shift=2.0)
    model.add_edge_spring_constraint(wi=1e5)
    model.add_positional_constraint(pinned, wi=1e9)
    solver = Solver()
    solver.set_model(model)
    args = default_sim_args()
    args.dt = 0.016
    solver.prepare(args)
    for _ in range(steps):
        solver.step(fext.copy(), num_iterations=iters)

    scale = np.abs(rmodel.positions).max()
    np.testing.assert_allclose(model.positions, rmodel.positions,
                               atol=1e-6 * scale)
    # the pinned vertex stayed at its rest location in both
    np.testing.assert_allclose(model.positions[pinned],
                               rmodel.init_positions[pinned], atol=1e-4)


def test_reduced_solver_full_loop_matches_reference(ref_sim, tmp_path):
    """Full-loop parity of the REDUCED solvers: the reference's
    ``animSnapBasesSolver`` executed on CPU vs our ``AnimSnapBasesSolver``
    on the same cloth with the SAME pod_vectorized + row-DEIM basis .npz.

    This pins the north-star claim that precomposing the per-step chain
    ``rhs_d = (S^T V)_d @ lu_solve(AtA_d, (PtV^T)_d p_d)`` (ref
    Simulators.py:366-399) into one dense W matmul per dim is numerically
    identical (to f64 rounding + our documented 1e-12 Tikhonov floor)."""
    import contextlib
    import io

    cp, sim = ref_sim
    from animsnapbases_tpu.config.sim_config import default_sim_args
    from animsnapbases_tpu.geometry.procedural import cloth_model
    from animsnapbases_tpu.ops.podlinalg import snapshot_pod_host
    from animsnapbases_tpu.sim.model import DeformableModel
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver
    from animsnapbases_tpu.sim.solver import Solver

    V, F = cloth_model(6, 6)
    V = V.copy()
    V[:, 2] += 0.15 * V[:, 0]   # tilt out of plane: a flat cloth has all-
    # zero z projections, which makes the REFERENCE's per-dim AtA singular
    # (our solver floors the Tikhonov term; the reference NaNs — that
    # robustness fix is documented in prepare_reduced_group)
    wi = 1e4
    masses = np.full(len(V), 10.0)
    fixed = [0, 5]
    fext = np.zeros((len(V), 3))
    fext[:, 1] = -9.81 * 10.0
    # square DEIM (the reference has no oversampling) is only contractive
    # at low iteration counts; 3 iterations with a 12-mode basis keeps the
    # reduced iteration stable on both sides so rounding, not divergence,
    # bounds the comparison
    steps, iters, K, frames = 10, 3, 12, 16

    def build_model():
        m = DeformableModel(V.copy(), F.copy(), masses=masses.copy(),
                            floor_collision=True, init_height_shift=2.0)
        m.add_edge_spring_constraint(wi=wi)
        for i in fixed:
            m.fix(i)
        return m

    # ---- record edge-spring projections with OUR full solver ----------
    model0 = build_model()
    s0 = Solver()
    s0.set_model(model0)
    args0 = default_sim_args()
    args0.dt = 0.016
    s0.prepare(args0)
    record = str(tmp_path / "FOM")
    s0.store_assembly_matrices(record)
    s0.set_record_path(record)
    s0.set_store_p(True)
    s0.max_p_snapshots_num = frames - 1
    for _ in range(frames):
        s0.step(fext.copy(), num_iterations=iters)

    data = np.load(os.path.join(record, "edge_spring_p.npz"))
    X = np.stack([data[str(i)] for i in range(frames)])   # (F, e, 3)

    # ---- pod_vectorized + row DEIM (p = 1) basis npz ------------------
    U_modes, _, _ = snapshot_pod_host(X.reshape(frames, -1).T, n_modes=K)
    comps = np.ascontiguousarray(U_modes.T).reshape(K, -1, 3)
    bases = comps.swapaxes(0, 1)                          # (e, K, 3)
    Pt = []
    Vsel = None
    for k in range(K):
        vk = bases[:, k, :]
        if k == 0:
            r = vk
        else:
            c = np.empty(vk.shape)
            for i in range(3):
                sol = np.linalg.lstsq(Vsel[Pt, :, i], vk[Pt, i],
                                      rcond=None)[0]
                c[:, i] = Vsel[:, :, i] @ sol
            r = c - vk
        Pt.append(int(np.argmax((r ** 2).sum(axis=1))))
        Vsel = (vk[:, None, :] if Vsel is None
                else np.concatenate((Vsel, vk[:, None, :]), axis=1))
    Pt = np.array(Pt)
    gdir = tmp_path / "bases" / "edge_spring"
    gdir.mkdir(parents=True)
    np.savez(gdir / "basis.npz", components=comps, interpol_alphas=Pt,
             Pt=Pt, interpol_verts=np.array([]),
             interpol_alpha_ranges=np.arange(1, K + 1))

    args = default_sim_args()
    args.dt = 0.016
    args.constraint_projection_basis_type = "deim_pod_vectorized"
    args.edge_spring_reduced = True
    args.edge_spring_num_components = K
    args.geom_interpolation_basis_dir = str(tmp_path / "bases")
    args.geom_interpolation_basis_file = "basis.npz"

    # ---- reference reduced run ----------------------------------------
    rmodel = cp.DeformableMesh(V.copy(), F.copy(), masses=masses.copy())
    rmodel.add_edge_spring_constrain(wi=wi)
    for i in fixed:
        rmodel.fix(i)
    rsolver = sim.animSnapBasesSolver(args)
    rsolver.set_model(rmodel)
    with contextlib.redirect_stdout(io.StringIO()):
        rsolver.prepare(args)
        for _ in range(steps):
            rsolver.step(fext.copy(), num_iterations=iters)

    # ---- our reduced run ----------------------------------------------
    model = build_model()
    ours = AnimSnapBasesSolver(args, pallas_mode="off")
    ours.set_model(model)
    ours.prepare(args)
    for _ in range(steps):
        ours.step(fext.copy(), num_iterations=iters)

    scale = np.abs(rmodel.positions).max()
    # the reduced sim stayed bounded — the assertion below compares two
    # live trajectories, not two divergences
    assert scale < 10.0
    np.testing.assert_allclose(model.positions, rmodel.positions,
                               atol=1e-6 * scale)
    np.testing.assert_allclose(model.velocities, rmodel.velocities,
                               atol=1e-4)
