"""Headless animation / component viewers.

The reference renders with mayavi/tvtk event loops (``utils/process.py:
253-375``) and polyscope windows.  This module provides the same entry
points rendering to image files via matplotlib (Agg), so they work on
display-less TPU hosts and in CI; each returns the written file paths.
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from mpl_toolkits.mplot3d.art3d import Poly3DCollection  # noqa: E402

from animsnapbases_tpu.io.h5anim import read_animation_h5, read_components_h5


def _render_mesh(ax, verts, tris, scalars=None, cmap="viridis",
                 vmin=None, vmax=None):
    polys = verts[np.asarray(tris)]
    if scalars is not None:
        face_vals = np.asarray(scalars)[np.asarray(tris)].mean(axis=1)
        norm = plt.Normalize(
            face_vals.min() if vmin is None else vmin,
            (face_vals.max() + 1e-12) if vmax is None else vmax)
        colors = plt.get_cmap(cmap)(norm(face_vals))
        pc = Poly3DCollection(polys, facecolors=colors, edgecolor="none")
    else:
        pc = Poly3DCollection(polys, facecolor=(0.55, 0.55, 0.85),
                              edgecolor=(0.3, 0.3, 0.3), linewidths=0.2)
    ax.add_collection3d(pc)
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    c = (lo + hi) / 2
    r = (hi - lo).max() / 2 + 1e-9
    ax.set_xlim(c[0] - r, c[0] + r)
    ax.set_ylim(c[1] - r, c[1] + r)
    ax.set_zlim(c[2] - r, c[2] + r)
    ax.set_axis_off()


def view_anim_file(h5_path: str, out_dir: str | None = None,
                   frames=None, prefix: str = "frame") -> list[str]:
    """Render animation frames to PNGs (equivalent of the mayavi animation
    window, ref utils/process.py:253-291)."""
    verts, tris, _ = read_animation_h5(h5_path)
    out_dir = out_dir or os.path.splitext(h5_path)[0] + "_frames"
    os.makedirs(out_dir, exist_ok=True)
    if frames is None:
        frames = range(0, len(verts), max(1, len(verts) // 8))
    written = []
    for f in frames:
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(111, projection="3d")
        _render_mesh(ax, verts[f], tris)
        path = os.path.join(out_dir, f"{prefix}_{f:04d}.png")
        fig.savefig(path, dpi=90)
        plt.close(fig)
        written.append(path)
    return written


def view_components(components_h5: str, out_dir: str | None = None,
                    components=None, activation: float = 1.0) -> list[str]:
    """Render each component as rest + activation * component with the
    displacement magnitude as color (equivalent of the traitsui SPLOC
    viewer, ref utils/process.py:293-375)."""
    rest, tris, comps, names = read_components_h5(components_h5)
    comps = comps - rest[None]   # stored as rest + component
    out_dir = out_dir or os.path.splitext(components_h5)[0] + "_components"
    os.makedirs(out_dir, exist_ok=True)
    if components is None:
        components = range(len(comps))
    written = []
    for i in components:
        c = comps[i]
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(111, projection="3d")
        magnitude = np.linalg.norm(c, axis=1)
        _render_mesh(ax, rest + activation * c, tris, scalars=magnitude,
                     cmap="coolwarm")
        ax.set_title(names[i] if i < len(names) else f"comp{i:03d}")
        path = os.path.join(out_dir, f"component_{i:03d}.png")
        fig.savefig(path, dpi=90)
        plt.close(fig)
        written.append(path)
    return written


def view_interpolation_elements(verts, elements, selected, out_path: str,
                                element_color=(0.5, 0.8, 0.5),
                                max_background_faces: int = 20_000) -> str:
    """Highlight selected constrained elements on the mesh (equivalent of
    the polyscope element visualizer, ref constraintsComponents.py:
    1052-1156).  Large background surfaces are thinned by vertex-clustering
    decimation for rendering speed (ref decimates with igl.decimate,
    nl_reduction_tests.py:375-382); selected elements always draw on the
    original mesh."""
    verts = np.asarray(verts)
    elements = np.asarray(elements)
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(111, projection="3d")
    if elements.shape[1] >= 3:
        tris = elements[:, :3]
        if len(tris) > max_background_faces:
            from animsnapbases_tpu.geometry.mesh import decimate_to_face_ratio
            bg_v, bg_f = decimate_to_face_ratio(
                verts, tris, max_background_faces / len(tris))
            _render_mesh(ax, bg_v, bg_f)
        else:
            _render_mesh(ax, verts, tris)
        sel = elements[np.asarray(selected, dtype=int)][:, :3]
        pc = Poly3DCollection(verts[sel], facecolors=[element_color],
                              edgecolor="k", linewidths=0.5)
        ax.add_collection3d(pc)
    else:  # edges
        for e in elements[np.asarray(selected, dtype=int)]:
            seg = verts[e]
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color=element_color,
                    lw=2)
    fig.savefig(out_path, dpi=90)
    plt.close(fig)
    return out_path
