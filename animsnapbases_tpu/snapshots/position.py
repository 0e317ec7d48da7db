"""Position snapshots: load aligned train/test animations, mass-weight,
standardize, and expose the geodesic-distance oracle for support maps.

Behavioral mirror of ``snapbases/posSnapshots.py:26-174``:
  - snapTensor (F, N, 3) = massL * verts  (if mass weighting)
  - masses from a little-endian .bin vector if present, else Voronoi lumping
    on the first frame, normalized  M <- M / sum(M) * 2
  - massL = sqrt(diag(M)) (Cholesky of a diagonal), invMassL = 1/massL
  - mean = first or average frame of the (weighted) tensor
  - standardize: subtract mean, scale by 1/std
  - geodesics are prepared on the *unweighted* rest shape
"""

from __future__ import annotations

import os

import numpy as np

from animsnapbases_tpu.geometry.geodesics import GeodesicDistance
from animsnapbases_tpu.geometry.mass import (
    vertex_masses_barycentric_tet,
    vertex_masses_voronoi,
)
from animsnapbases_tpu.io.binfmt import read_masses_bin
from animsnapbases_tpu.io.h5anim import read_animation_h5
from animsnapbases_tpu.io.meshes import load_medit_mesh


class PositionSnapshots:
    def __init__(self, train_h5: str, test_h5: str | None,
                 rest_shape: str = "first", masses_file: str = "",
                 tet_mesh_file: str = "", standardize: bool = True,
                 mass_weight: bool = True,
                 build_geodesics: bool = True):
        self.rest_shape = rest_shape
        self.masses_file = masses_file
        self.tet_mesh_file = tet_mesh_file

        self.verts, self.tris, _ = read_animation_h5(train_h5)
        if test_h5 is not None and os.path.exists(test_h5):
            self.test_verts, self.test_tris, _ = read_animation_h5(test_h5)
        else:
            self.test_verts, self.test_tris = None, None
        self.frs, self.nVerts, _ = self.verts.shape

        self.mean = None
        self.pre_scale_factor = 1.0
        self.mass = None
        self.massL = None
        self.invMassL = None
        self.compute_geodesic_distance = None

        self.snapTensor = self.verts.copy()

        if mass_weight:
            self._read_factorize_masses()
            assert self.snapTensor.shape[1] == self.massL.shape[0]
            self.snapTensor *= self.massL[:, None]

        if rest_shape == "first":
            self.mean = self.snapTensor[0].copy()
            rest_unweighted = self.verts[0]
        elif rest_shape == "average":
            self.mean = np.mean(self.snapTensor, axis=0)
            rest_unweighted = np.mean(self.verts, axis=0)
        else:
            raise ValueError(f"unknown rest shape: {rest_shape}")

        if build_geodesics:
            self.compute_geodesic_distance = GeodesicDistance(
                rest_unweighted, self.tris)

        if standardize:
            self._standardize()

    # ------------------------------------------------------------------
    def _read_factorize_masses(self, mass_on_tet_mesh: bool = False) -> None:
        if self.masses_file and os.path.exists(self.masses_file):
            masses = read_masses_bin(self.masses_file)
            assert masses.shape[0] == self.nVerts
        else:
            if mass_on_tet_mesh:
                _, tets, _ = load_medit_mesh(self.tet_mesh_file)
                masses = vertex_masses_barycentric_tet(self.verts[0], tets)
            else:
                masses = vertex_masses_voronoi(self.verts[0], self.tris)
            masses = masses / masses.sum() * 2.0
        self.mass = masses.copy()
        self.massL = np.sqrt(masses)
        self.invMassL = 1.0 / self.massL

    def _standardize(self) -> None:
        self.snapTensor -= self.mean[np.newaxis]
        self.pre_scale_factor = 1.0 / np.std(self.snapTensor)
        self.snapTensor *= self.pre_scale_factor
