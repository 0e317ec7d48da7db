"""On-mesh accuracy: frame-by-frame comparison of full-order vs reduced
simulation mesh sequences.

Headless equivalent of ``generate_figures/onMesh_accuracyMeasures.py:61-253``:
per-vertex relative L2 error and per-vertex-normal angle error, accumulated
over frames, written to CSV (heat-map rendering replaced by per-vertex error
arrays the caller can feed to any viewer)."""

from __future__ import annotations

import csv
import os

import numpy as np

from animsnapbases_tpu.geometry.mesh import vertex_normals
from animsnapbases_tpu.io.meshes import load_mesh_auto


def per_vertex_relative_l2(full: np.ndarray, reduced: np.ndarray):
    """(per-vertex error (N,), scalar mean) — ||q_r - q_f|| / scene scale."""
    diff = np.linalg.norm(reduced - full, axis=1)
    scale = max(np.abs(full).max(), 1e-30)
    return diff / scale, float(diff.mean() / scale)


def normal_angle_error(full: np.ndarray, reduced: np.ndarray,
                       faces: np.ndarray):
    """Per-vertex angle (radians) between full and reduced normals."""
    nf = vertex_normals(full, faces)
    nr = vertex_normals(reduced, faces)
    cos = np.clip((nf * nr).sum(axis=1), -1.0, 1.0)
    ang = np.arccos(cos)
    return ang, float(ang.mean())


def visualize_interpolation_elements_from_bin(mesh_path: str,
                                              geom_interpol_verts_file: str,
                                              geom_alpha_file: str,
                                              out_path: str,
                                              element_kind: str = "tris"):
    """Render the interpolation elements selected by the basis pipeline,
    loading the stored .bin vectors (headless equivalent of
    onMesh_accuracyMeasures.py:256-354)."""
    from animsnapbases_tpu.analysis.viewer import (
        view_interpolation_elements,
    )
    from animsnapbases_tpu.geometry.mesh import tet_edges, unique_edges
    from animsnapbases_tpu.io.binfmt import read_points_vector
    from animsnapbases_tpu.io.meshes import load_mesh_auto

    loaded = load_mesh_auto(mesh_path)
    if len(loaded) == 3:
        verts, tets, tris = loaded
    else:
        verts, tris = loaded
        tets = None
    alphas = read_points_vector(geom_alpha_file).astype(int)
    if element_kind == "tets" and tets is not None:
        elements = tets
    elif element_kind == "edges":
        elements = tet_edges(tets) if tets is not None else unique_edges(tris)
    else:
        elements = tris
    return view_interpolation_elements(verts, elements, alphas, out_path)


def compute_accuracy(full_pattern: str, reduced_pattern: str,
                     frames, faces: np.ndarray | None = None,
                     out_dir: str | None = None,
                     csv_name: str = "on_mesh_accuracy.csv"):
    """Compare sequences of mesh files frame-by-frame.

    ``full_pattern`` / ``reduced_pattern``: printf-style patterns with one
    integer slot (e.g. ``.../pos_%d.off``); ``frames``: iterable of frame
    indices.  Returns list of per-frame dicts and writes a CSV when
    ``out_dir`` is given."""
    rows = []
    for f_idx in frames:
        try:
            vf, tf = load_mesh_auto(full_pattern % f_idx)[:2]
            vr, _ = load_mesh_auto(reduced_pattern % f_idx)[:2]
        except FileNotFoundError:
            continue
        use_faces = faces if faces is not None else tf
        _, l2 = per_vertex_relative_l2(vf, vr)
        _, ang = normal_angle_error(vf, vr, use_faces)
        rows.append({"frame": f_idx, "rel_l2": l2, "normal_angle": ang})

    if out_dir and rows:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, csv_name), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["frame", "rel_l2",
                                              "normal_angle"])
            w.writeheader()
            w.writerows(rows)
    return rows
