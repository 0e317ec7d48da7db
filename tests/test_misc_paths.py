"""Less-travelled configuration paths: 'average' rest shape, the per-slice
``pod`` basis through the pipeline, per-frame .bin nonlinear snapshots,
and solver-level oversampled DEIM."""

import os

import numpy as np
import pytest

from animsnapbases_tpu.geometry.procedural import cloth_model
from test_bases_constraints import make_cc, synthetic_p_tensor


def test_average_rest_shape_position(tmp_path):
    from animsnapbases_tpu.io.h5anim import write_animation_h5
    from animsnapbases_tpu.snapshots.position import PositionSnapshots

    verts, faces = cloth_model(4, 4)
    rng = np.random.default_rng(0)
    anim = np.stack([verts + 0.1 * rng.normal(size=verts.shape)
                     for _ in range(6)])
    path = str(tmp_path / "a.h5")
    write_animation_h5(path, anim, faces)
    snaps = PositionSnapshots(path, None, rest_shape="average",
                              standardize=True, mass_weight=False,
                              build_geodesics=False)
    np.testing.assert_allclose(snaps.mean, anim.mean(axis=0), atol=1e-5)
    # standardized tensor has ~zero mean
    assert abs(snaps.snapTensor.mean()) < 1e-6


def test_average_rest_shape_nonlinear(tmp_path):
    from animsnapbases_tpu.snapshots.nonlinear import NonlinearSnapshots

    nl = NonlinearSnapshots()
    nl.rest_shape = "average"
    nl.snapTensor = np.random.default_rng(1).normal(size=(5, 8, 3))
    mean_ref = nl.snapTensor.mean(axis=0)
    nl.standardize()
    np.testing.assert_allclose(nl.mean, mean_ref)


def test_pod_per_slice_pipeline(tmp_path):
    X = synthetic_p_tensor()
    cc = make_cc(tmp_path, X, basis_type="pod", K=6)
    cc.compute_pod()
    cc.deim()
    assert cc.comps.shape[0] == 6
    assert len(cc.geom_Pt) == 6
    rec = cc.geom_constructed(6, "train")
    assert np.isfinite(rec).all()


def test_nonlinear_bin_snapshot_reading(tmp_path):
    """Per-frame .bin snapshot files (the C++ interchange path)."""
    import struct

    from animsnapbases_tpu.snapshots.nonlinear import NonlinearSnapshots

    rng = np.random.default_rng(2)
    frames = rng.normal(size=(4, 6, 3))
    for i in range(4):
        with open(tmp_path / f"aux_{i}.bin", "wb") as f:
            f.write(struct.pack("<ii", 6, 3))
            f.write(np.asfortranarray(frames[i]).tobytes(order="F"))

    nl = NonlinearSnapshots()
    nl.snapshots_file = str(tmp_path / "aux_")
    nl.frs = 3
    nl.frame_increment = 1
    nl.train_test_jump = 1
    nl.constraintsSize = 2
    nl.read(file_type=".bin")
    assert nl.snapTensor.shape == (3, 6, 3)
    np.testing.assert_allclose(nl.snapTensor[0], frames[0], atol=1e-12)
    np.testing.assert_allclose(nl.test_snapTensor[0], frames[1], atol=1e-12)
    assert nl.num_constained_elements == 3


def test_solver_oversample_uses_more_points(tmp_path):
    """deim_oversample keeps N modes but more interpolation rows."""
    import scipy.sparse

    from animsnapbases_tpu.sim.groups import build_edge_spring
    from animsnapbases_tpu.sim.reduced import prepare_reduced_group
    from animsnapbases_tpu.geometry.mesh import unique_edges

    V, F = cloth_model(5, 5)
    g = build_edge_spring(unique_edges(F), 1.0, V)
    rng = np.random.default_rng(3)
    K = 12
    comps = rng.normal(size=(K, g.num, 3))
    npz = str(tmp_path / "b.npz")
    np.savez(npz, components=comps,
             interpol_alphas=np.arange(K),
             Pt=np.arange(K),
             interpol_verts=np.array([]),
             interpol_alpha_ranges=np.arange(1, K + 1))

    rg1, _, _ = prepare_reduced_group(g, "deim_pod_vectorized", 6, npz,
                                      len(V))
    rg2, _, _ = prepare_reduced_group(g, "deim_pod_vectorized", 6, npz,
                                      len(V), oversample=2.0)
    assert rg1.num_selected == 6
    assert rg2.num_selected == 12        # 2x rows for the same 6 modes
    assert rg2.W.shape == (3, len(V), 12)


def test_polyscope_binding_gated():
    """ps_viewer imports cleanly without polyscope and fails loudly on use."""
    from animsnapbases_tpu.analysis import ps_viewer

    if ps_viewer.HAVE_POLYSCOPE:
        pytest.skip("polyscope present; gating path not exercised")
    with pytest.raises(RuntimeError, match="polyscope"):
        ps_viewer.require_polyscope()
    with pytest.raises(RuntimeError):
        ps_viewer.PolyscopeViewer(session=None)


def test_live_basis_viewers_gated(tmp_path):
    """The live animation/component viewers (reference mayavi/traitsui
    equivalents, utils/process.py:253-375) load their h5 data without
    polyscope and fail loudly only at show() time."""
    import numpy as np

    from animsnapbases_tpu.analysis import ps_viewer
    from animsnapbases_tpu.geometry.procedural import cloth_model
    from animsnapbases_tpu.io.h5anim import (write_animation_h5,
                                             write_components_h5)

    V, F = cloth_model(4, 4)
    anim = np.stack([V + 0.01 * i for i in range(5)])
    anim_path = str(tmp_path / "anim.h5")
    write_animation_h5(anim_path, anim, F)
    comp_path = str(tmp_path / "comps.h5")
    comps = np.stack([V + 0.1 * (i + 1) for i in range(3)])
    write_components_h5(comp_path, V, F, comps)

    player = ps_viewer.AnimationPlayer(anim_path)
    assert player.verts.shape == (5, len(V), 3)
    viewer = ps_viewer.ComponentViewer(comp_path)
    assert viewer.comps.shape == (3, len(V), 3)
    np.testing.assert_allclose(
        ps_viewer.component_frame(V, viewer.comps[1], 2.0),
        V + 2 * (comps[1] - V), atol=1e-12)

    if ps_viewer.HAVE_POLYSCOPE:
        pytest.skip("polyscope present; gating path not exercised")
    with pytest.raises(RuntimeError, match="polyscope"):
        player.show()
    with pytest.raises(RuntimeError, match="polyscope"):
        ps_viewer.view_components_live(comp_path)


def test_decimate_to_face_ratio():
    from animsnapbases_tpu.geometry.mesh import (boundary_facets,
                                                 decimate_to_face_ratio)

    V, F = cloth_model(40, 40)
    v2, f2 = decimate_to_face_ratio(V, F, 0.25)
    assert 4 <= len(f2) <= 0.25 * len(F)
    assert len(f2) > 0.05 * len(F)          # not collapsed to nothing
    assert f2.min() >= 0 and f2.max() < len(v2)
    # representative verts stay inside the original bounding box
    assert (v2.min(0) >= V.min(0) - 1e-9).all()
    assert (v2.max(0) <= V.max(0) + 1e-9).all()
    # ratio above 1 is a no-op copy
    v3, f3 = decimate_to_face_ratio(V, F, 1.5)
    assert len(f3) == len(F)


def test_predraw_capture_hook(tmp_path):
    """Per-frame capture fires through the PreDrawHandler (ref per-frame
    polyscope screenshots, usr_interface.py:186-188)."""
    from animsnapbases_tpu.demos.interactive import InteractiveSession
    from animsnapbases_tpu.sim.interaction import (PreDrawHandler,
                                                   make_headless_capture)
    from test_demos_cli import small_args

    params, args = small_args(tmp_path, vert_bending_constraint=False)
    sess = InteractiveSession(args, params=params)
    cap_dir = str(tmp_path / "caps")
    handler = PreDrawHandler(lambda: True, args, sess.solver, sess.fext,
                             capture_fn=make_headless_capture(
                                 sess.model, cap_dir, every=2))
    handler.set_animating(True)
    for _ in range(4):
        handler.handle()
    pngs = sorted(os.listdir(cap_dir))
    assert len(pngs) == 2, pngs


def test_all_example_configs_parse(tmp_path):
    """Every shipped example config loads through the schema parser and
    derives its output-directory grammar (matches the reference's 14
    config/examples/*.json, config/config.py:187-577)."""
    import glob
    import json

    from animsnapbases_tpu.config.bases_config import BasesConfig

    paths = sorted(glob.glob("configs/examples/*.json"))
    assert len(paths) >= 14
    for path in paths:
        with open(path) as f:
            cfg = json.load(f)
        param = BasesConfig.from_dict(
            cfg, results_dir=str(tmp_path / os.path.basename(path)))
        if cfg.get("constraintProj_bases", {}).get(
                "computeState", {}).get("compute"):
            assert param.constProj_name
            assert param.constProj_p_size >= 1
            assert param.constProj_output_directory
        if cfg.get("vertexPos_bases", {}).get(
                "computeState", {}).get("compute"):
            assert param.vertPos_output_directory


def test_export_rotation_captures(tmp_path):
    """cli.export_rotation_captures renders one PNG per azimuth for the
    selected interpolation elements (ref main.py:233-243 ->
    nl_reduction_tests.py:244-341 rotating polyscope capture)."""
    from test_bases_constraints import make_cc, synthetic_p_tensor
    from animsnapbases_tpu.cli import export_rotation_captures
    from animsnapbases_tpu.geometry.procedural import cloth_model

    X = synthetic_p_tensor(e=9)
    cc = make_cc(tmp_path, X, basis_type="pod", K=6, interpolation="geom",
                 ele_per_vert=2)
    V, F = cloth_model(4, 4)      # 9 interior-ish tris not needed; any mesh
    cc.nonlinearSnapshots.verts = V
    cc.nonlinearSnapshots.tris = F[:9]
    cc.compute_pod()
    cc.geom_block_form_utilizing_differential_operator(
        error_in_pos_space=False)
    cc.param.visualize_geom_elements_at_K = 4
    out_dir = export_rotation_captures(cc.param, cc, num_frames=3)
    import glob
    pngs = sorted(glob.glob(os.path.join(out_dir, "*.png")))
    assert len(pngs) == 3
