"""Parity tests for constraint-projection basis algorithms vs numpy oracles
and internal consistency of the selection methods."""

import os

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse

import oracles
from animsnapbases_tpu.bases.constraints import (
    ConstraintComponents,
    _make_extract_blocks,
)
from animsnapbases_tpu.config.bases_config import BasesConfig
from animsnapbases_tpu.snapshots.nonlinear import NonlinearSnapshots


def synthetic_p_tensor(F=14, e=9, p=2, seed=0):
    """Smooth low-rank-ish constraint-projection snapshots (F, e*p, 3)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, F)
    modes = rng.normal(size=(4, e * p, 3))
    weights = np.stack([np.sin(2 * np.pi * (k + 1) * t + rng.uniform(0, 1))
                        for k in range(4)])
    X = np.einsum("kf,knd->fnd", weights.T[:, :4].T, modes)
    X += 0.01 * rng.normal(size=X.shape)
    return X


def make_cc(tmp_path, X, p=2, basis_type="pod_vectorized",
            interpolation="deim", K=8, tol=1e-20, ele_per_vert=100):
    """ConstraintComponents wired up programmatically with an St identity."""
    cfg = {
        "object": {"experiment_dir": str(tmp_path) + "/", "mesh": "m",
                   "volumetric": False, "experiment": "e",
                   "snap_format": ".off"},
        "vertexPos_bases": {"computeState": {"compute": False}},
        "constraintProj_bases": {
            "computeState": {"compute": True, "run_main": True,
                             "testingComputations": "_Release"},
            "constraintType": {"name": "tris_strain", "elements": "_tris",
                               "p_snaps_folder": "/x",
                               "assembly_file_name": "assembly_ST.npz",
                               "assembly_key": "tris_strain",
                               "snaps_pattern_full_p": "/t.npz",
                               "constrained_elements": "", "rowSize": p},
            "snapshots": {"numFrames": X.shape[0], "frame_increment": 1,
                          "preAlignement": "_noAlignement",
                          "reduced_snaps_available": False},
            "basis_type": basis_type, "interpolation_type": interpolation,
            "desired_num_components": K, "bases_res_tol": tol, "dim": 3,
            "max_element_per_geom_vert": ele_per_vert,
            "rest_shape": "first", "massWeighted": "_nonWeighted",
            "standarized": "_nonStandarized", "supported": "_Global",
            "orthogonalized": "_nonOrthogonalized",
            "store_sing_val": False, "store_to_files": False,
            "run_tests": False, "visualize_geom_elements": False,
            "visualize_elements_at_bases_num": 0},
    }
    param = BasesConfig.from_dict(cfg, results_dir=str(tmp_path / "results"))
    os.makedirs(param.constProj_output_directory, exist_ok=True)
    nl = NonlinearSnapshots(param)
    nl.config()
    nl.snapTensor = X.copy()
    nl.test_snapTensor = X.copy()
    nl.num_constained_elements = X.shape[1] // p
    nl.frs = X.shape[0]
    cc = ConstraintComponents(param, nl)
    cc.basesType = interpolation
    cc.support = "global"
    cc.St = scipy.sparse.identity(X.shape[1], format="csr")
    return cc


def test_pod_vectorized_matches_svd(tmp_path):
    X = synthetic_p_tensor()
    cc = make_cc(tmp_path, X, K=8)
    cc.compute_pod_vectorized()
    F = X.shape[0]
    U, s, Vt = np.linalg.svd(X.reshape(F, -1).T, full_matrices=False)
    ref = U.T.reshape(F, X.shape[1], 3)[:8]
    # columns defined up to sign
    for k in range(8):
        a, b = cc.comps[k].ravel(), ref[k].ravel()
        sign = np.sign(a @ b)
        np.testing.assert_allclose(a * sign, b, atol=1e-8)


def test_pod_per_slice(tmp_path):
    X = synthetic_p_tensor()
    cc = make_cc(tmp_path, X, K=6)
    cc.compute_pod()
    assert cc.comps.shape == (6, X.shape[1], 3)
    e, p = 9, 2
    # slice (p=0, d=0): U columns of the (e, F) matrix
    Xs = X.reshape(X.shape[0], e, p, 3)[:, :, 0, 0].T     # (e, F)
    U, s, _ = np.linalg.svd(Xs, full_matrices=False)
    got = cc.comps[:, :, 0].reshape(-1, e, p)[:, :, 0]    # (K, e)
    for k in range(4):
        sign = np.sign(got[k] @ U[:, k])
        np.testing.assert_allclose(sign * got[k], U[:, k], atol=1e-6)


def test_pca_blocks_matches_oracle(tmp_path):
    X = synthetic_p_tensor()
    p, e = 2, 9
    K = 4
    run = _make_extract_blocks(p, e, K)
    C, W, sig, rows, idxs, res, _ = run(jnp.asarray(X))
    C_ref, W_ref, idx_ref, rows_ref = oracles.greedy_pca_blocks(X, K, p)
    np.testing.assert_array_equal(np.asarray(idxs), idx_ref)
    np.testing.assert_array_equal(np.asarray(rows).reshape(-1), rows_ref)
    rec = np.einsum("fk,knd->fnd",
                    np.asarray(W).reshape(K * p, -1).T,
                    np.asarray(C).reshape(K * p, -1, 3))
    rec_ref = np.einsum("fk,knd->fnd", W_ref, C_ref)
    np.testing.assert_allclose(rec, rec_ref, atol=1e-8)


def test_compute_pca_blocks_end_to_end(tmp_path):
    X = synthetic_p_tensor()
    cc = make_cc(tmp_path, X, basis_type="pca_blocks", K=4)
    cc.compute_pca_blocks()
    assert cc.comps.shape == (8, 18, 3)
    assert cc.numComp == 4
    assert len(cc.largeDeforPoints) == 4
    assert len(cc.largeDeforBlocks) == 8


def test_deim_matches_oracle(tmp_path):
    X = synthetic_p_tensor()
    cc = make_cc(tmp_path, X, K=6)
    cc.compute_pod_vectorized()
    cc.deim()
    Pt_ref, alpha_ref = oracles.deim_rows(cc.comps.swapaxes(0, 1), 2)
    np.testing.assert_array_equal(cc.geom_Pt, Pt_ref)
    np.testing.assert_array_equal(cc.geom_alpha, alpha_ref)
    np.testing.assert_array_equal(cc.geom_alpha_ranges, np.arange(1, 7))


def test_deim_device_scan_matches_host(tmp_path):
    """The lax.scan device DEIM selects the exact rows the host f64 loop
    (and therefore the reference) selects."""
    X = synthetic_p_tensor(F=16, e=12, p=2, seed=3)
    cc = make_cc(tmp_path, X, K=8)
    cc.compute_pod_vectorized()
    cc.deim()
    host_pt = cc.geom_Pt.copy()
    host_alpha = cc.geom_alpha.copy()
    cc.deim(device=True)
    np.testing.assert_array_equal(cc.geom_Pt, host_pt)
    np.testing.assert_array_equal(cc.geom_alpha, host_alpha)
    np.testing.assert_array_equal(cc.geom_alpha_ranges, np.arange(1, 9))


def test_block_deim_device_scan_matches_host(tmp_path):
    X = synthetic_p_tensor(F=16, e=12, p=2, seed=5)
    cc = make_cc(tmp_path, X, basis_type="pca_blocks",
                 interpolation="deim_block", K=5)
    cc.compute_pca_blocks()
    cc.deim_blocksForm()
    host = (cc.geom_Pt.copy(), cc.geom_alpha.copy(),
            cc.geom_alpha_ranges.copy())
    cc.deim_blocksForm(device=True)
    np.testing.assert_array_equal(cc.geom_Pt, host[0])
    np.testing.assert_array_equal(cc.geom_alpha, host[1])
    np.testing.assert_array_equal(cc.geom_alpha_ranges, host[2])


def test_deim_blocks_selects_blocks(tmp_path):
    """Block-DEIM pairs with block-structured bases (pca_blocks), matching
    the reference's config pairing."""
    X = synthetic_p_tensor()
    cc = make_cc(tmp_path, X, basis_type="pca_blocks",
                 interpolation="deim_block_form", K=4)
    cc.compute_pca_blocks()
    cc.deim_blocksForm()
    # each step adds a whole p-block of rows
    assert len(cc.geom_Pt) == 4 * 2
    for k, alpha in enumerate(cc.geom_alpha):
        np.testing.assert_array_equal(cc.geom_Pt[2 * k:2 * k + 2],
                                      [2 * alpha, 2 * alpha + 1])


def test_geom_selection_block_mode(tmp_path):
    X = synthetic_p_tensor()
    cc = make_cc(tmp_path, X, basis_type="pca_blocks", interpolation="geom",
                 K=4)
    cc.compute_pca_blocks()
    cc.geom_block_form_utilizing_differential_operator(
        error_in_pos_space=False)
    assert len(cc.geom_alpha) == 4
    assert len(set(cc.geom_alpha.tolist())) == 4   # asserts uniqueness
    assert cc.geom_alpha_ranges.tolist() == [1, 2, 3, 4]


def test_geom_constructed_reconstruction_improves(tmp_path):
    X = synthetic_p_tensor()
    cc = make_cc(tmp_path, X, K=10)
    cc.compute_pod_vectorized()
    cc.deim()
    errs = []
    for r in (2, 6, 10):
        rec = cc.geom_constructed(r, "train")
        errs.append(cc.frobenius_error(X, rec))
    assert errs[0] >= errs[-1]
    # full rank reconstruction is near exact on a rank-4+noise tensor
    assert errs[-1] < 0.2 * np.linalg.norm(X)


def test_postprocess_orthogonalizes(tmp_path):
    X = synthetic_p_tensor()
    cc = make_cc(tmp_path, X, K=6)
    cc.param.constProj_orthogonal = True
    cc.compute_pod_vectorized()
    cc.post_process_components()
    for d in range(3):
        M = cc.comps[:, :, d]
        np.testing.assert_allclose(M @ M.T, np.eye(M.shape[0]), atol=1e-8)


def test_device_comps_cache_invalidated_on_recompute(tmp_path):
    """Recomputing a SAME-SHAPE basis must invalidate the device-resident
    comps copy (the shape-only staleness check in _device_comps cannot
    catch it) — the device DEIM has to select from the new basis."""
    X = synthetic_p_tensor(F=16, e=12, p=2, seed=3)
    cc = make_cc(tmp_path, X, K=8)
    cc.compute_pod_vectorized()
    cc.deim(device=True)              # populates + uses the device cache
    cc.compute_pod()                  # different basis, same (8, 24, 3)
    assert cc.comps.shape == (8, 24, 3)
    assert getattr(cc, "_comps_device", None) is None
    cc.deim()
    host = cc.geom_Pt.copy()
    cc.deim(device=True)              # must select from the NEW basis
    np.testing.assert_array_equal(cc.geom_Pt, host)


def test_deim_device_auto_default_policy():
    """Round-4 default: device scan at production budgets (K >= 64) or
    with a mesh; host loop for tiny budgets; explicit flag always wins."""
    import types

    from animsnapbases_tpu.bases.constraints import (
        DEIM_DEVICE_MIN_K,
        _deim_device_auto,
    )

    none_flag = types.SimpleNamespace(deim_device=None)
    assert _deim_device_auto(none_flag, None, DEIM_DEVICE_MIN_K) is True
    assert _deim_device_auto(none_flag, None, DEIM_DEVICE_MIN_K - 1) is False
    assert _deim_device_auto(none_flag, object(), 4) is True     # mesh
    # explicit config overrides both directions
    assert _deim_device_auto(types.SimpleNamespace(deim_device=False),
                             object(), 500) is False
    assert _deim_device_auto(types.SimpleNamespace(deim_device=True),
                             None, 2) is True
    # params without the key (programmatic SimpleNamespace callers) = auto
    assert _deim_device_auto(types.SimpleNamespace(), None, 200) is True


def test_deim_auto_device_picks_match_host_at_production_budget(
        tmp_path, monkeypatch):
    """E2E config-driven run at K >= DEIM_DEVICE_MIN_K: deim() with no
    flag must take the DEVICE path (round-4 default) and select exactly
    the host loop's rows (VERDICT r3 item 3 'Done' criterion)."""
    from animsnapbases_tpu.ops import deim_scan as DS

    X = synthetic_p_tensor(F=90, e=40, p=2, seed=11)
    cc = make_cc(tmp_path, X, K=64)
    assert cc.param.deim_device is None          # config default = auto
    cc.compute_pod_vectorized()
    assert cc.numComp == 64
    cc.deim(device=False)                        # host f64 reference
    host = (cc.geom_Pt.copy(), cc.geom_alpha.copy(),
            cc.geom_alpha_ranges.copy())

    calls = []
    real = DS.deim_rows_host_result

    def spy(*a, **k):
        calls.append(True)
        return real(*a, **k)

    monkeypatch.setattr(DS, "deim_rows_host_result", spy)
    cc.deim()                                    # product default
    assert calls, "auto default did not take the device scan at K=64"
    np.testing.assert_array_equal(cc.geom_Pt, host[0])
    np.testing.assert_array_equal(cc.geom_alpha, host[1])
    np.testing.assert_array_equal(cc.geom_alpha_ranges, host[2])


def test_deim_device_config_flag_routes_to_device(tmp_path, monkeypatch):
    """The `deim_device` config key (constraintProj_bases section) opts
    the PRODUCT pipeline into the device scan without a mesh — same
    picks, device path actually taken."""
    import animsnapbases_tpu.bases.constraints as C

    X = synthetic_p_tensor(F=16, e=12, p=2, seed=7)
    cc = make_cc(tmp_path, X, K=8)
    cc.compute_pod_vectorized()
    cc.deim()                              # host default
    host_pt = cc.geom_Pt.copy()

    calls = []
    from animsnapbases_tpu.ops import deim_scan as DS

    real = DS.deim_rows_host_result

    def spy(*a, **k):
        calls.append(k.get("mesh"))
        return real(*a, **k)

    monkeypatch.setattr(DS, "deim_rows_host_result", spy)
    cc.param.deim_device = True
    cc.deim()                              # flag routes to the device scan
    assert calls == [None]                 # device path, no mesh
    np.testing.assert_array_equal(cc.geom_Pt, host_pt)
