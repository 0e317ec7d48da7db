"""Parity tests: JAX position-bases pipeline vs the numpy oracle of the
reference math."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import oracles
from animsnapbases_tpu.bases import greedy, splocs
from animsnapbases_tpu.bases.pca import PositionComponents
from animsnapbases_tpu.config.bases_config import BasesConfig
from animsnapbases_tpu.geometry.procedural import cloth_model
from animsnapbases_tpu.io.h5anim import write_animation_h5


def synthetic_cloth_animation(rows=6, cols=6, frames=12, seed=0):
    """Smooth deterministic cloth animation: superposition of traveling
    bumps."""
    verts, faces = cloth_model(rows, cols)
    rng = np.random.default_rng(seed)
    amp = rng.normal(size=(3,))
    anim = np.empty((frames, len(verts), 3))
    for f in range(frames):
        t = f / frames
        z = (amp[0] * np.sin(2 * np.pi * (verts[:, 0] / rows + t))
             + amp[1] * np.cos(2 * np.pi * (verts[:, 1] / cols - 2 * t))
             + amp[2] * np.sin(2 * np.pi * (verts[:, 0] + verts[:, 1]) / 7 + t))
        anim[f] = verts
        anim[f, :, 2] = 0.3 * z
        anim[f, :, 0] += 0.05 * np.sin(2 * np.pi * t) * verts[:, 1]
        anim[f, :, 1] += (0.04 * np.cos(2 * np.pi * (t + verts[:, 0] / rows))
                          * (1 + 0.5 * verts[:, 1]))
    return anim, faces


def test_extract_global_matches_oracle():
    anim, _ = synthetic_cloth_animation()
    R0 = anim - anim.mean(axis=0, keepdims=True)
    K = 6
    C, W, sig, res, idxs, _ = greedy.extract_global(jnp.asarray(R0), K)
    C_ref, W_ref, sig_ref, res_ref, idx_ref = oracles.greedy_pca(R0, K)

    np.testing.assert_array_equal(np.asarray(idxs), idx_ref)
    np.testing.assert_allclose(np.asarray(sig), sig_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res), res_ref, rtol=1e-8, atol=1e-10)
    # rank-1 terms are sign-invariant; compare reconstructions
    rec = np.einsum("fk,knd->fnd", np.asarray(W), np.asarray(C))
    rec_ref = np.einsum("fk,knd->fnd", W_ref, C_ref)
    np.testing.assert_allclose(rec, rec_ref, atol=1e-8)


def test_local_support_matches_oracle():
    anim, faces = synthetic_cloth_animation()
    R0 = anim - anim.mean(axis=0, keepdims=True)
    from animsnapbases_tpu.geometry.geodesics import GeodesicDistance
    gd = GeodesicDistance(anim[0], faces)

    def support_fn(idx):
        phi = gd(idx)
        smap = (np.clip(phi, 0.1, 2.0) - 0.1) / (2.0 - 0.1)
        return 1.0 - smap

    K = 4
    C_ref, W_ref, *_ = oracles.greedy_pca(R0, K, support_fn=support_fn)

    # our pipeline path
    R = jnp.asarray(R0)
    C, W = [], []
    for k in range(K):
        idx = int(greedy.select_vertex(R))
        sigma0, wk = greedy.dominant_mode(R, idx)
        wk = greedy.signed_nonneg_weight(wk)
        s = support_fn(idx)
        ck, R = greedy.deflate(R, wk, jnp.asarray(s))
        C.append(np.asarray(ck))
        W.append(np.asarray(wk))
    C, W = np.array(C), np.array(W).T
    # signed_nonneg_weight makes signs deterministic -> exact comparison
    np.testing.assert_allclose(W, W_ref, atol=1e-8)
    np.testing.assert_allclose(C, C_ref, atol=1e-7)


def test_splocs_iteration_matches_oracle():
    anim, faces = synthetic_cloth_animation()
    X = anim - anim.mean(axis=0, keepdims=True)
    K = 4
    C0, W0, *_ = oracles.greedy_pca(X, K)
    rng = np.random.default_rng(1)
    Lambda = np.abs(rng.normal(size=(K, X.shape[1])))
    rho = 10.0

    C_ref, W_ref, energy_ref, e_rms_ref = oracles.splocs_iteration(
        X.copy(), C0.copy(), W0.copy(), Lambda, rho, num_admm=5)

    F = X.shape[0]
    Xflat = jnp.asarray(X.reshape(F, -1))
    C = jnp.asarray(C0)
    W = jnp.asarray(W0)
    Rflat = Xflat - W @ C.reshape(K, -1)
    Rflat, W = splocs.update_weights(Rflat, C.reshape(K, -1), W)
    U = jnp.zeros_like(C)
    C, U, Z = splocs.admm_update(C, U, W, Xflat, jnp.asarray(Lambda), rho, 5)
    C = Z
    _, _, e_rms, energy = splocs.splocs_energy(Xflat, W, C,
                                               jnp.asarray(Lambda))

    np.testing.assert_allclose(np.asarray(W), W_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(C), C_ref, atol=1e-7)
    np.testing.assert_allclose(float(energy), energy_ref, rtol=1e-8)
    np.testing.assert_allclose(float(e_rms), e_rms_ref, rtol=1e-8)


def _write_config_and_data(tmp_path, splocs_compute=False, num_frames=10):
    """Synthesize aligned train/test h5 + a config pointing at them."""
    anim, faces = synthetic_cloth_animation(frames=num_frames + 1)
    cfg = {
        "object": {
            "experiment_dir": str(tmp_path) + "/",
            "mesh": "minicloth",
            "volumetric": False,
            "experiment": "exp",
            "snap_format": ".off",
        },
        "vertexPos_bases": {
            "computeState": {"compute": True,
                             "testingComputations": "_Release"},
            "snapshots": {
                "numFrames": num_frames, "frame_increment": 1,
                "snaps_folder": "FOM", "anims_folder": "anims",
                "preAlignement": "_centered", "anim_folder_ready": False,
                "visualize_aligned_animations": False,
                "reduced_snaps_available": False,
            },
            "rest_shape": "first",
            "massWeighted": "_Volkwein",
            "standarized": "_Standarized",
            "orthogonalized": "_Orthogonalized",
            "support": {"min_dist": 0.1, "max_dist": 2.0},
            "pca": {"compute": True, "numComponents": 5,
                    "supported": "_Local", "store_sing_val": True},
            "splocs": {"compute": splocs_compute, "max_itrs": 2,
                       "admm_num_itrs": 3, "lambda": 2, "rho": 10.0},
            "store": True, "visualize": False, "run_tests": False,
        },
        "constraintProj_bases": {"computeState": {"compute": False,
                                                  "run_main": True}},
    }
    param = BasesConfig.from_dict(cfg, results_dir=str(tmp_path / "results"))
    param.ensure_dirs()
    train = os.path.join(param.aligned_snapshots_directory,
                         param.train_aligned_snapshots_animation_file)
    test = os.path.join(param.aligned_snapshots_directory,
                        param.test_aligned_snapshots_animation_file)
    write_animation_h5(train, anim[:num_frames], faces)
    write_animation_h5(test, anim[1:num_frames + 1], faces)
    return param


def test_position_components_end_to_end(tmp_path):
    param = _write_config_and_data(tmp_path)
    bases = PositionComponents(param)
    bases.compute_components_store_singvalues()
    assert bases.comps.shape == (5, 36, 3)
    assert bases.weigs.shape == (10, 5)

    # convergence test on the un-post-processed bases: errors decrease with k
    fro, max_err, rx, ry, rz = bases.test_convergence(1, 5, 2)
    assert fro[0] >= fro[-1]

    bases.post_process_components()
    # orthogonalized + mass-unweighted => U^T M U = I
    assert bases.is_utmu_orthogonal(atol=1e-8)
    assert bases.linear_independent

    # stored artifacts
    bases.store_components_to_files(1, 5, 1, ".bin")
    from animsnapbases_tpu.io.binfmt import read_components_bin
    path = os.path.join(param.vertPos_output_directory, "q_pos_F10K3.bin")
    assert os.path.exists(path)
    out = read_components_bin(path, K=3)
    np.testing.assert_allclose(out, bases.comps[:3], atol=1e-12)

    bases.store_animations(param.vertPos_output_directory)
    assert os.path.exists(os.path.join(param.vertPos_output_directory,
                                       "components.h5"))
    # singular values CSV written
    csvs = [f for f in os.listdir(param.vertPos_output_directory)
            if f.endswith(".csv")]
    assert csvs


def test_position_components_splocs(tmp_path):
    param = _write_config_and_data(tmp_path, splocs_compute=True)
    bases = PositionComponents(param)
    bases.compute_components_store_singvalues()
    assert bases.basesType == "SPLOCS"
    assert len(bases.splocs_history) == 2
    # energy decreases across outer iterations
    energies = [h[1] for h in bases.splocs_history]
    assert energies[-1] <= energies[0] * 1.001
