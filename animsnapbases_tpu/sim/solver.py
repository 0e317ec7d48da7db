"""Full-order projective-dynamics solver.

Mirror of the reference ``Solver`` (``Simulators.py:537-744``): explicit
predictor, floor collision, ``num_iterations`` local-global sweeps with a
prefactored global solve, optional per-frame snapshot recording, optional
self-collision passes.

TPU design: the local stage (all constraint projections + S^T p assembly) is
one jitted function over struct-of-arrays groups.  The global solve is a
prefactored **dense Cholesky on device** when 3N is small enough to keep the
whole iteration loop on-chip, falling back to a host sparse LU (scipy) for
large meshes — the reduced solver is the production path there.
"""

from __future__ import annotations

import os

import numpy as np
import scipy.sparse
import scipy.sparse.linalg

import jax
import jax.numpy as jnp

from animsnapbases_tpu.sim import collisions, projections
from animsnapbases_tpu.sim.model import DeformableModel


def flatten(p: np.ndarray) -> np.ndarray:
    return p.reshape(-1)


def unflatten(q: np.ndarray) -> np.ndarray:
    return q.reshape(-1, 3)


def _device_group_data(g):
    """jnp copies of the arrays a projection kernel needs."""
    out = {}
    for k, v in g.data.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            out[k] = jnp.asarray(v)
        else:
            out[k] = v
    return out


def make_local_stage(model: DeformableModel):
    """Build the jitted local stage for the model's current group set:
    ``local(q, positional_targets) -> (b, {name: stacked_p})``."""
    n = model.n_verts
    static = []
    for name, g in model.groups.items():
        static.append((name, _device_group_data(g),
                       jnp.asarray(g.st_rows), jnp.asarray(g.st_cols),
                       jnp.asarray(g.st_vals)))

    @jax.jit
    def local(q, positional_targets):
        b = jnp.zeros((n, 3), dtype=q.dtype)
        stacked = {}
        for name, data, st_r, st_c, st_v in static:
            if name == "positional":
                p = projections.positional_p(positional_targets)
            else:
                p = projections.PROJECTION_KERNELS[name](q, data)
            stacked[name] = p
            b = b + projections.group_rhs(st_r, st_c, st_v, p, n)
        return b, stacked

    return local


def build_global_matrix(model: DeformableModel, dt: float):
    """(mass/dt^2) I + sum of group LHS triplets, as scipy CSC (3N, 3N)."""
    n = model.n_verts
    rows = [np.arange(3 * n)]
    cols = [np.arange(3 * n)]
    vals = [np.repeat(model.mass, 3) / (dt * dt)]
    for g in model.groups.values():
        rows.append(g.lhs_rows)
        cols.append(g.lhs_cols)
        vals.append(g.lhs_vals)
    return scipy.sparse.csc_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(3 * n, 3 * n))


class Solver:
    """Full-order PD solver with reference-compatible prepare/step API."""

    DENSE_LIMIT = 2400  # max 3N for the on-device dense Cholesky path

    def __init__(self):
        self.model: DeformableModel | None = None
        self.dirty = True
        self.dt = None
        self.frame = 0
        self._solve = None          # host LU backsolve (3N,) -> (3N,)
        self._chol = None           # device Cholesky factor
        self._local = None
        self._use_dense = False
        # recording
        self.store_stacked_projections = False
        self.record_path = ""
        self.max_p_snapshots_num = 200
        self._recorded: dict[str, dict[str, np.ndarray]] = {}
        # collision passes (host-side; the reference runs them every step)
        self.enable_self_collision = False

    # ------------------------------------------------------------------
    def set_model(self, model):
        self.model = model
        self.set_dirty()

    def set_dirty(self):
        self.dirty = True

    def set_clean(self):
        self.dirty = False

    def ready(self):
        return not self.dirty

    def set_record_path(self, path: str):
        self.record_path = path

    def set_store_p(self, value: bool):
        self.store_stacked_projections = value

    # ------------------------------------------------------------------
    def store_assembly_matrices(self, record_path: str):
        """assembly_ST.npz + verts_bending_constrained_indices.npz exports
        (ref Simulators.py:299-329)."""
        os.makedirs(record_path, exist_ok=True)
        matrices = self.model.assembly_matrices()
        if self.model.has_group("verts_bending"):
            np.savez(os.path.join(record_path,
                                  "verts_bending_constrained_indices.npz"),
                     indices=np.asarray(self.model.verts_bending_indices))
        np.savez(os.path.join(record_path, "assembly_ST.npz"), **matrices)

    def prepare(self, args, store_fom_info=False, record_path=None):
        if store_fom_info:
            assert record_path is not None
            self.store_assembly_matrices(record_path)
            self.record_path = record_path

        self.dt = args.dt
        self.max_p_snapshots_num = getattr(args, "max_p_snapshots_num",
                                           self.max_p_snapshots_num)
        A = build_global_matrix(self.model, self.dt)
        n3 = A.shape[0]
        self._use_dense = n3 <= self.DENSE_LIMIT
        if self._use_dense:
            dense = jnp.asarray(A.toarray())
            self._chol = jax.jit(jnp.linalg.cholesky)(dense)
            self._chol.block_until_ready()
            self._solve = None
        else:
            self._solve = scipy.sparse.linalg.factorized(A)
            self._chol = None
        self._local = make_local_stage(self.model)
        self.set_clean()

    # ------------------------------------------------------------------
    def step(self, fext, num_iterations=10):
        model = self.model
        dt = self.dt
        dt_inv = 1.0 / dt
        dt2 = dt * dt

        a = fext / model.mass[:, None]
        explicit = model.positions + dt * model.velocities + dt2 * a
        if model.floor_collision:
            explicit, corrections = collisions.resolve_floor_collision(
                explicit, model.floor_height)
            model.positions_corrections = corrections

        sn = explicit
        masses_term = (model.mass / dt2)[:, None] * sn     # (N, 3)
        targets = jnp.asarray(model.positional_targets(self.frame))

        q = jnp.asarray(sn)
        masses_term_j = jnp.asarray(masses_term)
        stacked = {}
        for _ in range(num_iterations):
            b, stacked = self._local(q, targets)
            b = b + masses_term_j
            if self._use_dense:
                q = jax.scipy.linalg.cho_solve(
                    (self._chol, True), b.reshape(-1)).reshape(-1, 3)
            else:
                q = jnp.asarray(
                    unflatten(self._solve(np.asarray(b).flatten())))

        if self.store_stacked_projections:
            self._record_frame(stacked)

        q_next = np.asarray(q)
        if self.enable_self_collision:
            q_next = collisions.resolve_self_collision_fast(q_next,
                                                            model.faces)
            q_next = collisions.resolve_triangle_self_collisions(q_next,
                                                                 model.faces)
        model.velocities = (q_next - model.positions) * dt_inv
        model.positions = q_next
        self.frame += 1

    # ------------------------------------------------------------------
    def _record_frame(self, stacked: dict):
        """Keep the last local iteration's stacked p per group under the
        frame key; flush each group to <name>_p.npz when the frame counter
        reaches max_p_snapshots_num (ref Simulators.py:342-364)."""
        for name, p in stacked.items():
            if name == "positional":
                continue
            self._recorded.setdefault(name, {})[str(self.frame)] = (
                np.asarray(p))
        if self.frame == self.max_p_snapshots_num and self.record_path:
            self.flush_recordings()

    def flush_recordings(self):
        """Write all recorded stacked projections to <name>_p.npz (also
        callable explicitly, e.g. when a run is truncated before the
        scheduled flush frame)."""
        if not self.record_path or not self._recorded:
            return
        os.makedirs(self.record_path, exist_ok=True)
        for name, frames in self._recorded.items():
            np.savez(os.path.join(self.record_path, name + "_p.npz"),
                     **frames)
