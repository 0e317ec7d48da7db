"""Auxiliary subsystems: viewers, interaction handlers, checkpoint/resume,
partitioning toolkit, winding number / tetrahedralization, profiling."""

import os

import numpy as np
import pytest

from animsnapbases_tpu.geometry.procedural import bar_surface_mesh, cloth_model
from test_sim_solver import gravity_forces, make_cloth_solver, sim_args


def test_viewers_render_pngs(tmp_path):
    from animsnapbases_tpu.analysis.viewer import (
        view_anim_file,
        view_components,
        view_interpolation_elements,
    )
    from animsnapbases_tpu.io.h5anim import (
        write_animation_h5,
        write_components_h5,
    )

    V, F = cloth_model(5, 5)
    anim = np.stack([V + 0.01 * i for i in range(6)])
    anim_path = str(tmp_path / "anim.h5")
    write_animation_h5(anim_path, anim, F)
    out = view_anim_file(anim_path, frames=[0, 3])
    assert len(out) == 2 and all(os.path.exists(p) for p in out)

    comps = np.stack([V + 0.1 * np.random.default_rng(i).normal(size=V.shape)
                      for i in range(2)])
    comp_path = str(tmp_path / "components.h5")
    write_components_h5(comp_path, V, F, comps)
    out = view_components(comp_path)
    assert len(out) == 2

    p = view_interpolation_elements(V, F, [0, 3, 7],
                                    str(tmp_path / "elements.png"))
    assert os.path.exists(p)


def test_interaction_pick_and_drag():
    from animsnapbases_tpu.sim.interaction import (
        MouseDownHandler,
        MouseMoveHandler,
        PhysicsParams,
        PickingState,
    )

    solver, model = make_cloth_solver(rows=4, cols=4)
    params = PhysicsParams()
    picking = PickingState()
    fext = np.zeros_like(model.positions)
    project = lambda pos: pos[:, :2]   # trivial ortho projection

    down = MouseDownHandler(model, solver, params, picking, project)
    move = MouseMoveHandler(model, picking, fext, params)

    # ctrl-click picks nearest vertex to (0, 0) in screen space
    v = down.handle_click(*model.positions[5, :2], ctrl=True)
    assert v == 5 and picking.is_picking
    assert move.handle_move(model.positions[5, 0] + 1.0,
                            model.positions[5, 1])
    assert fext[5, 0] > 0
    down.handle_release()
    assert not picking.is_picking

    # shift-click pins + adds positional constraint
    v = down.handle_click(*model.positions[7, :2], shift=True)
    assert model.is_fixed(7)
    assert model.has_group("positional")
    assert solver.dirty
    # second shift-click releases
    down.handle_click(*model.positions[7, :2], shift=True)
    assert not model.is_fixed(7)


def test_predraw_handler_steps():
    from animsnapbases_tpu.sim.interaction import PreDrawHandler

    solver, model = make_cloth_solver(rows=4, cols=4)
    args = sim_args()
    fext = np.zeros_like(model.positions)
    h = PreDrawHandler(lambda: True, args, solver, fext)
    h.set_animating(True)
    p0 = model.positions.copy()
    for _ in range(5):
        h.handle()
    assert solver.frame == 5
    assert not np.allclose(model.positions, p0)
    assert np.allclose(fext, 0)   # reset every frame


def test_checkpoint_resume(tmp_path):
    from animsnapbases_tpu.sim.checkpoint import load_sim_state, save_sim_state

    s1, m1 = make_cloth_solver(rows=4, cols=4)
    f = gravity_forces(m1)
    for _ in range(6):
        s1.step(f, num_iterations=4)
    ckpt = str(tmp_path / "state.npz")
    save_sim_state(ckpt, s1)
    for _ in range(4):
        s1.step(f, num_iterations=4)
    final = m1.positions.copy()

    s2, m2 = make_cloth_solver(rows=4, cols=4)
    load_sim_state(ckpt, s2)
    assert s2.frame == 6
    s2.prepare(sim_args())
    for _ in range(4):
        s2.step(f, num_iterations=4)
    np.testing.assert_allclose(m2.positions, final, atol=1e-9)


def test_partitioning_toolkit():
    from animsnapbases_tpu.geometry.partitioning import (
        fps_with_distance,
        geodesic_labels_surface_from_seeds,
        graph_distance,
        heat_distance_tet,
        surface_seeds_heat,
        tet_labels_from_vertex_labels,
        tet_seeds_heat,
    )
    from animsnapbases_tpu.geometry.mesh import unique_edges
    from animsnapbases_tpu.geometry.procedural import bar_model

    V, F = cloth_model(8, 8)
    seeds, dmin = surface_seeds_heat(V, F, 4)
    assert len(seeds) == 4 and len(set(seeds.tolist())) == 4
    labels, D = geodesic_labels_surface_from_seeds(V, F, seeds)
    assert labels.shape == (64,)
    assert D.shape == (64, 4)
    # each seed labels itself
    for j, s in enumerate(seeds):
        assert labels[s] == j

    # graph distance on a path of edges grows with index
    d = graph_distance(V, unique_edges(F), [0])
    assert d[0] == 0 and d[-1] > d[8]

    Vb, T, Fb, _ = bar_model(4, 2, 2)
    seeds_t, _ = tet_seeds_heat(Vb, T, 3)
    assert len(seeds_t) == 3
    d = heat_distance_tet(Vb, T, [0])
    assert d[0] == 0
    from animsnapbases_tpu.geometry.partitioning import (
        geodesic_labels_tet_from_seeds,
    )
    labels_t, Dt = geodesic_labels_tet_from_seeds(Vb, T, seeds_t)
    tet_lab = tet_labels_from_vertex_labels(T, labels_t)
    assert tet_lab.shape == (T.shape[0],)
    tet_lab2 = tet_labels_from_vertex_labels(T, labels_t, Dt, rule="mean")
    assert tet_lab2.shape == (T.shape[0],)


def test_winding_number_and_tetrahedralize():
    from animsnapbases_tpu.geometry.procedural import bar_model
    from animsnapbases_tpu.geometry.volume import (
        orient_faces_consistently,
        tetrahedralize,
        winding_number,
    )

    # consistently-oriented boundary from a tet mesh: |w| = 1 inside
    Vb, Tb, Fb, _ = bar_model(3, 3, 3)
    assert abs(abs(winding_number(Vb, Fb, [[1.0, 1, 1]])[0]) - 1.0) < 0.05
    assert abs(winding_number(Vb, Fb, [[5.0, 5, 5]])[0]) < 0.05

    # the procedural surface mesh has mixed orientation (like the
    # reference generator); reorientation recovers |w| = 1
    V, F = bar_surface_mesh(3, 3, 3)
    F2 = orient_faces_consistently(F)
    inside = np.array([[1.0, 1.0, 1.0]])
    outside = np.array([[5.0, 5.0, 5.0]])
    assert abs(abs(winding_number(V, F2, inside)[0]) - 1.0) < 0.1
    assert abs(winding_number(V, F2, outside)[0]) < 0.1

    TV, IT, Fb = tetrahedralize(V, F)
    assert IT.shape[0] > 0
    d = TV[IT]
    vol = np.abs(np.einsum(
        "ij,ij->i", np.cross(d[:, 1] - d[:, 0], d[:, 2] - d[:, 0]),
        d[:, 3] - d[:, 0])).sum() / 6.0
    # 2x2x2 cube volume = 8
    assert vol == pytest.approx(8.0, rel=0.05)


def test_profiling_wrappers(tmp_path):
    import jax.numpy as jnp

    from animsnapbases_tpu.utils.profiling import annotate, device_trace

    with device_trace(str(tmp_path / "trace"), enabled=True):
        with annotate("compute"):
            x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
            x.block_until_ready()
    assert os.path.exists(str(tmp_path / "trace"))
    with device_trace(str(tmp_path / "off"), enabled=False):
        pass


def test_steiner_refinement_improves_thin_bar_quality():
    """VERDICT r2 item 10: tetgen-style circumcenter insertion
    (steiner=True) must shrink the sliver tail on an irregular thin bar —
    the geometry class where the vertex-only Delaunay is weakest — while
    keeping every tet inside the surface."""
    from animsnapbases_tpu.geometry.procedural import bar_surface_mesh
    from animsnapbases_tpu.geometry.volume import (
        orient_faces_consistently,
        tet_quality,
        tetrahedralize,
        winding_number,
    )

    rng = np.random.default_rng(0)
    V, F = bar_surface_mesh(12, 2, 2)
    V = np.asarray(V, dtype=float) + 0.08 * rng.standard_normal(V.shape)
    TV0, IT0, _ = tetrahedralize(V, F)
    TV1, IT1, _ = tetrahedralize(V, F, steiner=True, min_quality=0.3)

    q0 = tet_quality(TV0, IT0)
    q1 = tet_quality(TV1, IT1)
    assert len(TV1) > len(TV0), "no Steiner points were inserted"
    # the sliver TAIL shrinks (mean is the wrong metric: refinement adds
    # many moderate-quality small tets)
    assert np.quantile(q1, 0.05) > np.quantile(q0, 0.05)
    assert (q1 < 0.1).mean() < (q0 < 0.1).mean()
    # surface vertices stay a prefix of TV (consumer contract)
    np.testing.assert_allclose(TV1[: len(V)], V)
    # every refined tet is still inside the surface (same orientation
    # convention the builder filters with)
    Fo = orient_faces_consistently(F)
    w = np.abs(winding_number(V, Fo, TV1[IT1].mean(axis=1)))
    assert (w > 0.5).all()


def test_rotating_capture_renders_all_angles(tmp_path):
    """Headless twin of the reference's rotating polyscope capture
    (nl_reduction_tests.py:244-341): one PNG per azimuth with selected
    elements + interpolation vertices drawn."""
    from animsnapbases_tpu.analysis.viewer import view_rotating_capture

    V, F = cloth_model(5, 5)
    out = view_rotating_capture(V, F, str(tmp_path / "rot"),
                                selected=[0, 2, 5], interpol_verts=[1, 9],
                                num_frames=4, prefix="rot")
    assert len(out) == 4
    assert all(os.path.exists(p) for p in out)
    assert sorted(os.path.basename(p) for p in out)[0] == "rot_000.png"


def test_element_selection_all_kinds(tmp_path):
    """Headless twin of visualize_tet_mesh_elements
    (nl_reduction_tests.py:344-477): verts/edges/tris/tets variants."""
    from animsnapbases_tpu.analysis.viewer import view_element_selection

    V, F = cloth_model(4, 4)
    for kind in ("verts", "edges", "tris"):
        p = view_element_selection(V, F, [0, 5], element_type=kind,
                                   out_path=str(tmp_path / f"{kind}.png"))
        assert os.path.exists(p)
    # tet variant on a minimal 2-tet mesh
    Vt = np.array([[0., 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                   [1, 1, 1]])
    T = np.array([[0, 1, 2, 3], [1, 2, 3, 4]])
    p = view_element_selection(Vt, None, [4], element_type="tets", tets=T,
                               out_path=str(tmp_path / "tets.png"))
    assert os.path.exists(p)
    with pytest.raises(ValueError, match="needs a tets"):
        view_element_selection(Vt, None, [0], element_type="tets")
