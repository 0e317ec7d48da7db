"""End-to-end position pipeline: sim exports pos_*.off -> CLI imports,
aligns, computes PCA bases, stores all artifacts (the round trip the
reference drives via main.py's position branch)."""

import os

import numpy as np
import pytest

from animsnapbases_tpu.cli import run_position_pipeline
from animsnapbases_tpu.config.bases_config import BasesConfig
from animsnapbases_tpu.demos.scenarios import build_scenario
from test_demos_cli import small_args


@pytest.fixture(scope="module")
def pos_snapshots(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pos_e2e")
    params, args = small_args(tmp, vert_bending_constraint=False)
    driver = build_scenario("cloth_snapshots", args, record_fom_info=True,
                            params=params, record_positions=True,
                            poking_frames_per_point=8,
                            rest_frames_per_point=4, number_pokes=2)
    driver.run()
    return tmp, args, driver


def test_position_pipeline_from_sim_export(pos_snapshots, tmp_path):
    tmp, args, driver = pos_snapshots

    cfg = {
        "object": {"experiment_dir": args.output_dir + "/",
                   "mesh": "cloth", "volumetric": False,
                   "experiment": "cloth_automated_snapshots",
                   "snap_format": ".off"},
        "vertexPos_bases": {
            "computeState": {"compute": True,
                             "testingComputations": "_Release"},
            "snapshots": {"numFrames": 12, "frame_increment": 2,
                          "snaps_folder": "FOM", "anims_folder": "anims",
                          "preAlignement": "_centered",
                          "anim_folder_ready": False,
                          "visualize_aligned_animations": False,
                          "reduced_snaps_available": False},
            "rest_shape": "first",
            "massWeighted": "_Volkwein",
            "standarized": "_Standarized",
            "orthogonalized": "_Orthogonalized",
            "support": {"min_dist": 0.1, "max_dist": 0.5},
            "pca": {"compute": True, "numComponents": 6,
                    "supported": "_Global", "store_sing_val": True},
            "splocs": {"compute": False, "max_itrs": 2, "admm_num_itrs": 2,
                       "lambda": 2, "rho": 10.0},
            "store": True, "visualize": False, "run_tests": True},
        "constraintProj_bases": {"computeState": {"compute": False,
                                                  "run_main": True}},
    }
    param = BasesConfig.from_dict(cfg, results_dir=str(tmp_path / "results"))
    bases = run_position_pipeline(param)

    assert bases.comps.shape[0] == 6
    out = param.vertPos_output_directory
    # aligned h5 pair produced
    assert os.path.exists(os.path.join(
        param.aligned_snapshots_directory,
        param.train_aligned_snapshots_animation_file))
    # components animation + per-k .bin + singular value CSV + figures
    assert os.path.exists(os.path.join(out, "components.h5"))
    bins = [f for f in os.listdir(out) if f.endswith(".bin")]
    assert len(bins) == 6
    csvs = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert csvs
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert pngs
    assert os.path.exists(os.path.join(out, "function_timings.txt"))

    # mass-orthogonality after Volkwein weighting + orthogonalization
    assert bases.is_utmu_orthogonal(atol=1e-7)

    # bases reconstruct the (preprocessed) snapshots reasonably at full rank
    rec = bases.reconstruct(6)
    # comps were post-processed; compare in sign-invariant subspace terms:
    # the reconstruction uses pre-postprocess weights, so just check shapes
    # and finiteness here (value parity is covered by oracle tests)
    assert np.isfinite(rec).all()
