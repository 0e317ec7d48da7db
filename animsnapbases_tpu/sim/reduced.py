"""Reduced projective-dynamics solver (hyper-reduced constraint projections,
optional position-space reduction).

Mirror of the reference ``animSnapBasesSolver`` (``Simulators.py:28-534``)
with two TPU-first upgrades:

1. The per-group runtime chain
       rhs_d = (S^T V)_d  @ lu_solve(AtA_d, (PtV^T)_d @ p_d)
   is precomposed at prepare time into one dense matrix
       W_d = (S^T V)_d (AtA_d + la_d I)^{-1} (PtV^T)_d        (N, n_pt)
   so each local term is a single matmul per dim (MXU) instead of an LU
   backsolve (ref :366-399).  Numerically identical: the factors are fixed.

2. Position-space reduction (declared but unimplemented in the reference,
   :144-155) is implemented: the global matrix decouples per dim (every
   constraint couples equal dims only), so with per-dim position bases
   U_d (N, r) the global solve becomes three r x r Cholesky solves
       (U_d^T A_d U_d) z_d = U_d^T b_d,   q_d = U_d z_d
   and the whole step is dense linear algebra on device.

The full step (predictor, floor clamp, iteration loop, velocity update) is
one jitted function when the global solve lives on device.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import scipy.sparse
import scipy.sparse.linalg

import jax
import jax.numpy as jnp

from animsnapbases_tpu.sim import collisions, projections
from animsnapbases_tpu.sim.model import DeformableModel
from animsnapbases_tpu.sim.solver import (
    build_global_matrix,
    make_local_stage,
    unflatten,
)

GROUP_ARG_NAMES = {
    "verts_bending": ("vert_bending_reduced", "vert_bending_num_components"),
    "edge_spring": ("edge_spring_reduced", "edge_spring_num_components"),
    "tris_strain": ("tri_strain_reduced", "tri_strain_num_components"),
    "tets_strain": ("tet_strain_reduced", "tet_strain_num_components"),
    "tets_deformation_gradient": ("tet_deformation_reduced",
                                  "tet_deformation_num_components"),
}


def _subset_group_data(g, alphas: np.ndarray) -> dict:
    """Slice a group's SoA rest data down to the selected elements."""
    d = g.data
    name = g.name
    sub = {}
    if name == "verts_bending":
        for k in ("indices", "neighbors", "cotans", "mask", "rest_curvature",
                  "tri_normal", "dot_with_normal", "wi_eff"):
            sub[k] = d[k][alphas]
        sub["prevent_bending_flips"] = d.get("prevent_bending_flips", True)
    elif name == "edge_spring":
        sub["edges"] = d["edges"][alphas]
        sub["rest_length"] = d["rest_length"][alphas]
    elif name == "tris_strain":
        for k in ("faces", "P", "DmInv"):
            sub[k] = d[k][alphas]
        sub["sigma_min"], sub["sigma_max"] = d["sigma_min"], d["sigma_max"]
    elif name in ("tets_strain", "tets_deformation_gradient"):
        for k in ("elements", "DmInv"):
            sub[k] = d[k][alphas]
        if name == "tets_strain":
            sub["sigma_min"], sub["sigma_max"] = d["sigma_min"], d["sigma_max"]
    else:
        raise ValueError(f"cannot subset group {name}")
    return sub


class ReducedGroup:
    """Runtime data of one hyper-reduced constraint group."""

    def __init__(self, name, W, subset_data, row_select, p, num_selected):
        self.name = name
        self.W = W                    # (3, out_dim, n_pt) stacked per dim
        self.subset_data = subset_data
        self.row_select = row_select  # None (block form) or (m,) row gather
        self.p = p
        self.num_selected = num_selected

    def evaluate_p(self, q):
        """Stacked selected projections (n_pt, 3)."""
        out = projections.PROJECTION_KERNELS[self.name](q, self.subset_data)
        if self.row_select is not None:
            out = out[self.row_select]
        return out


def prepare_reduced_group(g, reduction_type: str, num_components: int,
                          npz_path: str, n_verts: int,
                          U: np.ndarray | None = None,
                          tikhonov: bool = True):
    """Load a basis .npz and build the precomposed rhs matrices.

    Returns (ReducedGroup, alphas, Pt) mirroring the reference's
    ``prepare_reduced_group`` (Simulators.py:157-220).
    """
    data = np.load(npz_path)
    row_dim = 1 if reduction_type in ("deim_pod", "deim_pod_vectorized") \
        else g.p
    Vj = data["components"].swapaxes(0, 1)[:, :num_components * row_dim, :]
    alpha_range = int(data["interpol_alpha_ranges"][num_components - 1])
    alphas = data["interpol_alphas"][:alpha_range].astype(np.int64)

    if reduction_type in ("deim_pod", "deim_pod_vectorized"):
        Pt = data["Pt"][:alpha_range].astype(np.int64)
    else:
        # block form: all row_dim rows of each selected element, interleaved
        Pt = (alphas[:, None] * row_dim
              + np.arange(row_dim)[None, :]).reshape(-1)

    ST = g.assembly_scipy(n_verts)                     # (N, e*p)
    proj = np.stack([ST @ Vj[:, :, d] for d in range(3)], axis=2)  # (N, m', 3)
    PtV = Vj[Pt]                                       # (n_pt, m', 3)
    AtA = np.einsum("nai,ami->nmi", PtV.swapaxes(0, 1), PtV)
    la = (1e-8 * np.trace(AtA) / AtA.shape[0]) if tikhonov else np.zeros(3)
    # robustness beyond the reference: a dim whose projections are all ~zero
    # (e.g. a perfectly flat cloth) has trace ~0 -> singular system; floor
    # the regularizer using the healthiest dim's scale
    la = la + 1e-12 * (np.max(np.trace(AtA)) / AtA.shape[0] + 1e-30)

    W = []
    for d in range(3):
        A_d = AtA[:, :, d] + la[d] * np.eye(AtA.shape[0])
        inv_pt = np.linalg.solve(A_d, PtV[:, :, d].T)   # (m', n_pt)
        base = proj[:, :, d] @ inv_pt                   # (N, n_pt)
        if U is not None:
            base = U[:, :, d].T @ base                  # (r, n_pt)
        W.append(base)
    W = np.stack(W, axis=0)

    if reduction_type in ("deim_pod", "deim_pod_vectorized"):
        # evaluate one row (Pt % p) of each selected element's projection
        subset = _subset_group_data(g, alphas)
        m = len(alphas)
        row_select = np.arange(m) * g.p + (Pt % g.p)
    else:
        subset = _subset_group_data(g, alphas)
        row_select = None
    return ReducedGroup(g.name, W, subset, row_select, g.p, len(alphas)), \
        alphas, Pt


class AnimSnapBasesSolver:
    """Reduced solver with reference-compatible construction from sim args."""

    DENSE_LIMIT = 2400

    def __init__(self, args):
        self.args = args
        self.model: DeformableModel | None = None
        self.dirty = True
        self.dt = None
        self.frame = 0

        self.reduced_position = getattr(args, "position_reduced", False)
        self.num_pos_modes = getattr(args, "position_num_components", -1)
        self.position_basis_file = getattr(args, "position_basis_file", "")
        self.U = None                                  # (N, r, 3)

        self.constraint_projection_reduction_type = (
            args.constraint_projection_basis_type)
        self.reduced_flags = {
            name: getattr(args, flag)
            for name, (flag, _) in GROUP_ARG_NAMES.items()}
        self.num_components = {
            name: getattr(args, num)
            for name, (_, num) in GROUP_ARG_NAMES.items()}
        self.has_reduced_constraint_projections = any(
            self.reduced_flags.values())
        self.constraint_projection_ready = False

        self.store_stacked_projections = False
        self.record_path = ""
        self.max_p_snapshots_num = getattr(args, "max_p_snapshots_num", 200)

        self._reduced_groups: dict[str, ReducedGroup] = {}
        self._local_full = None
        self._step_jit = None
        self._solve = None
        self._chols = None
        self._recorded: dict[str, dict[str, np.ndarray]] = {}
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

    def set_record_path(self, path):
        self.record_path = path

    def set_store_p(self, value):
        self.store_stacked_projections = value

    # ------------------------------------------------------------------
    # prepare
    # ------------------------------------------------------------------

    def _load_position_basis(self):
        comps = np.load(self.position_basis_file)
        if hasattr(comps, "files"):
            comps = comps["components"]
        r = self.num_pos_modes if self.num_pos_modes > 0 else comps.shape[0]
        self.U = comps[:r].transpose(1, 0, 2)           # (N, r, 3)

    def prepare_global_matrix(self, args):
        self.dt = args.dt
        A = build_global_matrix(self.model, self.dt)
        if self.reduced_position:
            self._load_position_basis()
            chols = []
            for d in range(3):
                A_d = A[d::3, d::3]
                Ud = self.U[:, :, d]
                Ar = Ud.T @ (A_d @ Ud)
                chols.append(np.linalg.cholesky(Ar))
            self._chols = jnp.asarray(np.stack(chols))   # (3, r, r)
            self._solve = None
            self._use_dense = True
        else:
            n3 = A.shape[0]
            self._use_dense = n3 <= self.DENSE_LIMIT
            if self._use_dense:
                self._chol_full = jnp.linalg.cholesky(jnp.asarray(A.toarray()))
            else:
                self._solve = scipy.sparse.linalg.factorized(A)

    def prepare_local_term(self, args):
        rtype = self.constraint_projection_reduction_type
        if rtype not in ("deim_pod", "deim_pod_vectorized", "deim_pca_blocks",
                         "geom_pca_blocks_withSt"):
            raise ValueError(
                "Unknown reduction type for constraint projections")
        base_dir = args.geom_interpolation_basis_dir
        fname = args.geom_interpolation_basis_file
        for name, g in self.model.groups.items():
            if name == "positional" or not self.reduced_flags.get(name):
                continue
            npz_path = os.path.join(base_dir, name, fname)
            rg, _, _ = prepare_reduced_group(
                g, rtype, self.num_components[name], npz_path,
                self.model.n_verts, U=self.U,
                tikhonov=(name != "verts_bending"))
            self._reduced_groups[name] = rg

    def prepare(self, args, store_fom_info=False, record_path=None):
        if store_fom_info:
            assert record_path is not None
            from animsnapbases_tpu.sim.solver import Solver
            Solver.store_assembly_matrices(self, record_path)
            self.record_path = record_path

        if self.dirty:
            self.prepare_global_matrix(args)
        if (self.has_reduced_constraint_projections
                and not self.constraint_projection_ready):
            self.prepare_local_term(args)
            self.constraint_projection_ready = True
        self._build_step()
        self.set_clean()

    # expose the Solver exporter on this class too
    store_assembly_matrices = None  # replaced below

    # ------------------------------------------------------------------
    # step construction
    # ------------------------------------------------------------------

    def _build_step(self):
        model = self.model
        n = model.n_verts
        mass = jnp.asarray(model.mass)
        dt = self.dt
        dt2 = dt * dt
        floor = model.floor_collision
        floor_h = model.floor_height

        # full (non-reduced) groups -> jitted local stage
        full_groups = {name: g for name, g in model.groups.items()
                       if name not in self._reduced_groups}
        full_model = _GroupView(model, full_groups)
        local_full = make_local_stage(full_model)

        reduced = []
        for name, rg in self._reduced_groups.items():
            dev_data = {k: (jnp.asarray(v) if isinstance(v, np.ndarray)
                            else v) for k, v in rg.subset_data.items()}
            W = jnp.asarray(rg.W)
            rs = (jnp.asarray(rg.row_select)
                  if rg.row_select is not None else None)
            reduced.append((name, dev_data, W, rs))

        U = jnp.asarray(self.U) if self.U is not None else None
        chols = self._chols
        use_dense = self._use_dense
        chol_full = getattr(self, "_chol_full", None)
        reduced_position = self.reduced_position

        def reduced_terms(q):
            """Hyper-reduced group contributions.  Without position reduction
            these are full-space (N, 3); with it they are already in reduced
            coordinates (r, 3) because W includes U^T."""
            terms = []
            for name, data, W, rs in reduced:
                p = projections.PROJECTION_KERNELS[name](q, data)
                if rs is not None:
                    p = p[rs]
                terms.append(jnp.stack([W[d] @ p[:, d] for d in range(3)],
                                       axis=1))
            return terms

        def local_terms(q, targets):
            """Full-space rhs for the non-position-reduced path."""
            b, stacked = local_full(q, targets)
            for term in reduced_terms(q):
                b = b + term
            return b, stacked

        if reduced_position:
            @partial(jax.jit, static_argnames=("num_iterations",))
            def step_fn(positions, velocities, fext, targets,
                        num_iterations=10):
                a = fext / mass[:, None]
                sn = positions + dt * velocities + dt2 * a
                if floor:
                    sn = sn.at[:, 1].set(jnp.maximum(sn[:, 1], floor_h))
                masses_term = (mass / dt2)[:, None] * sn

                def body(_, q):
                    b_full, _ = local_full(q, targets)
                    b_full = b_full + masses_term
                    r_terms = reduced_terms(q)
                    qd = []
                    for d in range(3):
                        rb = U[:, :, d].T @ b_full[:, d]
                        for term in r_terms:
                            rb = rb + term[:, d]
                        z = jax.scipy.linalg.cho_solve((chols[d], True), rb)
                        qd.append(U[:, :, d] @ z)
                    return jnp.stack(qd, axis=1)

                q = jax.lax.fori_loop(0, num_iterations, body, sn)
                v = (q - positions) / dt
                return q, v

            self._step_jit = step_fn
            self._local_terms = jax.jit(local_terms)
        else:
            if use_dense:
                @partial(jax.jit, static_argnames=("num_iterations",))
                def step_fn(positions, velocities, fext, targets,
                            num_iterations=10):
                    a = fext / mass[:, None]
                    sn = positions + dt * velocities + dt2 * a
                    if floor:
                        sn = sn.at[:, 1].set(jnp.maximum(sn[:, 1], floor_h))
                    masses_term = (mass / dt2)[:, None] * sn

                    def body(_, q):
                        b, _ = local_terms(q, targets)
                        b = b + masses_term
                        return jax.scipy.linalg.cho_solve(
                            (chol_full, True), b.reshape(-1)).reshape(-1, 3)

                    q = jax.lax.fori_loop(0, num_iterations, body, sn)
                    v = (q - positions) / dt
                    return q, v

                self._step_jit = step_fn
            else:
                self._step_jit = None
            self._local_terms = jax.jit(local_terms)

    # ------------------------------------------------------------------
    def step(self, fext, num_iterations=10):
        model = self.model
        dt = self.dt
        targets = jnp.asarray(model.positional_targets(self.frame))
        fext = jnp.asarray(fext)

        use_jit = self._step_jit is not None and (
            not self.store_stacked_projections or self.reduced_position)
        if use_jit:
            q, v = self._step_jit(jnp.asarray(model.positions),
                                  jnp.asarray(model.velocities), fext,
                                  targets, num_iterations=num_iterations)
            q_next = np.asarray(q)
            if self.enable_self_collision:
                q_next = collisions.resolve_self_collision_fast(
                    q_next, model.faces)
                q_next = collisions.resolve_triangle_self_collisions(
                    q_next, model.faces)
                model.velocities = (q_next - model.positions) / dt
            else:
                model.velocities = np.asarray(v)
            model.positions = q_next
            self.frame += 1
            return

        # host-solve / recording path
        dt2 = dt * dt
        a = np.asarray(fext) / model.mass[:, None]
        explicit = model.positions + dt * model.velocities + dt2 * a
        if model.floor_collision:
            explicit, corr = collisions.resolve_floor_collision(
                explicit, model.floor_height)
            model.positions_corrections = corr
        masses_term = jnp.asarray((model.mass / dt2)[:, None] * explicit)
        q = jnp.asarray(explicit)
        stacked = {}
        for _ in range(num_iterations):
            b, stacked = self._local_terms(q, targets)
            b = b + masses_term
            if self._use_dense and not self.reduced_position:
                q = jax.scipy.linalg.cho_solve(
                    (self._chol_full, True), b.reshape(-1)).reshape(-1, 3)
            else:
                q = jnp.asarray(unflatten(
                    self._solve(np.asarray(b).flatten())))

        if self.store_stacked_projections:
            self._record_frame(stacked)

        q_next = np.asarray(q)
        if self.enable_self_collision:
            q_next = collisions.resolve_self_collision_fast(q_next,
                                                            model.faces)
            q_next = collisions.resolve_triangle_self_collisions(
                q_next, model.faces)
        model.velocities = (q_next - model.positions) / dt
        model.positions = q_next
        self.frame += 1

    def _record_frame(self, stacked):
        for name, p in stacked.items():
            if name == "positional" or name.endswith("__reduced"):
                continue
            self._recorded.setdefault(name, {})[str(self.frame)] = (
                np.asarray(p))
        if self.frame == self.max_p_snapshots_num and self.record_path:
            os.makedirs(self.record_path, exist_ok=True)
            for name, frames in self._recorded.items():
                np.savez(os.path.join(self.record_path, name + "_p.npz"),
                         **frames)


class _GroupView:
    """Lightweight model facade exposing a subset of groups to
    make_local_stage."""

    def __init__(self, model, groups):
        self.groups = groups
        self.n_verts = model.n_verts


from animsnapbases_tpu.sim.solver import Solver as _Solver  # noqa: E402

AnimSnapBasesSolver.store_assembly_matrices = _Solver.store_assembly_matrices
