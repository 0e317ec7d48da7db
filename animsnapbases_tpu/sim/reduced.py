"""Reduced projective-dynamics solver (hyper-reduced constraint projections,
optional position-space reduction).

Mirror of the reference ``animSnapBasesSolver`` (``Simulators.py:28-534``)
with four TPU-first upgrades:

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
       (U_d^T A_d U_d) z_d = U_d^T b_d,   q_d = U_d z_d.
   When every constraint group is hyper-reduced, the local-global iteration
   runs entirely in reduced coordinates: positions are lifted only at the
   vertices touched by the selected elements (q_sel = U_sel z), and the full
   lift happens once per step.

3. ``run_steps(n)`` scans the whole step on device, so long simulations pay
   one dispatch instead of one per step — essential when the host-TPU link
   has latency (production serving, axon tunnels).

4. When every group is hyper-reduced (row or block form) and the VMEM
   budget fits, ``run_steps`` upgrades further to the resident multi-step Pallas
   kernel (:mod:`animsnapbases_tpu.ops.pallas_resident`): the whole
   ``steps x iterations`` loop in one kernel with the state and
   (optionally bf16) reduction matrices living in VMEM — 4-7x the
   per-step-kernel throughput at bunny scale.
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
    Solver as _FullSolver,
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

_VERTEX_KEYS = {
    "verts_bending": ("indices", "neighbors"),
    "edge_spring": ("edges",),
    "tris_strain": ("faces",),
    "tets_strain": ("elements",),
    "tets_deformation_gradient": ("elements",),
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


def prepare_reduced_group(g, reduction_type: str, num_components: int,
                          npz_path: str, n_verts: int,
                          U: np.ndarray | None = None,
                          tikhonov: bool = True,
                          oversample: float = 1.0):
    """Load a basis .npz and build the precomposed rhs matrices.

    Returns (ReducedGroup, alphas, Pt) mirroring the reference's
    ``prepare_reduced_group`` (Simulators.py:157-220).

    ``oversample`` > 1 keeps ``num_components`` basis modes but takes the
    interpolation rows selected for ``oversample * num_components`` modes —
    an overdetermined (least-squares) DEIM that keeps the hyper-reduced
    local-global iteration contractive at high iteration counts.
    """
    data = np.load(npz_path)
    row_dim = 1 if reduction_type in ("deim_pod", "deim_pod_vectorized") \
        else g.p
    Vj = data["components"].swapaxes(0, 1)[:, :num_components * row_dim, :]
    ranges = data["interpol_alpha_ranges"]
    range_idx = min(int(round(num_components * oversample)),
                    len(ranges)) - 1
    alpha_range = int(ranges[range_idx])
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

    subset = _subset_group_data(g, alphas)
    if reduction_type in ("deim_pod", "deim_pod_vectorized"):
        # evaluate one row (Pt % p) of each selected element's projection
        m = len(alphas)
        row_select = np.arange(m) * g.p + (Pt % g.p)
    else:
        row_select = None
    return ReducedGroup(g.name, W, subset, row_select, g.p, len(alphas)), \
        alphas, Pt


class _GroupView:
    """Lightweight model facade exposing a subset of groups to
    make_local_stage."""

    def __init__(self, model, groups):
        self.groups = groups
        self.n_verts = model.n_verts


class AnimSnapBasesSolver:
    """Reduced solver with reference-compatible construction from sim args."""

    DENSE_LIMIT = 2400
    # contact-MODE machinery allowed only below this vertex count: at the
    # 51k-vertex bridge its presence slows the contact-FREE affine loop
    # ~4x (27k vs 108k steps/s measured; the lean re-anchoring variant
    # restores full speed) while the 14k-vertex bunny is unaffected even
    # batched x8 — the cost scales with N, not with operand bytes
    CONTACT_MODE_MAX_VERTS = 32768
    # BATCHED resident kernels may fill more of the 100 MB scoped-VMEM
    # limit than the single-sim 48 MB gate allows: per-sim state is pure
    # (3nb, N) rows with no extra staging pressure, and a Mosaic failure
    # at the raised gate falls back to power-of-two slices automatically
    # (see _run_batched_resident), so the only cost of an optimistic gate
    # is one slow first chunk.  84 MB leaves ~16 MB for matmul staging
    # and the rb window.  Instance override: resident_batched_vmem_limit.
    # single-sim resident-kernel operand gate (override per instance
    # with resident_vmem_limit); raised from the original conservative
    # 48 MB after the affine base anchors moved into the output buffers
    # and ut_acT went to the (3, r, N) NT layout — a 317x317
    # (100k-vertex) cloth at r=48 budgets 71.5 MB (tiling-aware) and
    # runs at ~40k steps/s via the standard kernel (the affine builds
    # hit the Mosaic register-spill regime at that scale and the tier-1
    # VMEM failure auto-downgrades to standard, see run_steps)
    RESIDENT_VMEM_LIMIT = 72 * (1 << 20)
    BATCHED_VMEM_LIMIT = 84 * (1 << 20)
    # past this vertex count the IN-KERNEL affine builds hit the Mosaic
    # register-spill regime (100k-vertex cloth: the tier-1 early-exit
    # kernel spills 69.6 MB and OOMs; the lean contact build compiles but
    # steps SLOWER than the standard kernel, 15k vs 39k steps/s) — tier 1
    # switches to the CHUNKED affine kernel (rebase/materialize in an
    # outer XLA loop, only coefficient state + the y-row lift slice
    # in-kernel) with the STANDARD kernel as the contact tier.  Instance
    # override: resident_chunked_tier1 = True/False.
    CHUNKED_TIER1_MIN_VERTS = 64000

    # past this vertex count the chunked tier-1 drops its IN-KERNEL exact
    # floor fallback (floor_exact=False): the untaken exact branch's
    # textual use of the (r, N) lift slice inside the step loop taxes the
    # hot loop at scale (the same Mosaic staging effect that size-gates
    # the contact mode), and removing the operand makes the kernel's
    # VMEM footprint ~16*N instead of ~(r*mm+16)*N — admission grows
    # from ~450k to multi-million verts at r=48.  A bound trip then
    # EXITS the kernel; run_steps rebases (tightening the bound) and
    # re-enters, or falls through to a contact-capable window on a k=0
    # trip, so near-floor scenes pay extra exits but stay exact.
    # Instance override: resident_floor_exact = True/False.
    CHUNKED_FLOOR_EXACT_MAX_VERTS = 128000
    # headroom the FUSED sliced-serving search subtracts from the batched
    # gate: multiple kernel calls in one jit overlap the next group's
    # operand staging with the current group's execution (~14 MB measured
    # at bunny scale), so near-gate sub-batches can OOM scoped VMEM fused
    # even though they compile standalone.  8 MB (with the 112 MB scoped
    # ceiling) admits the 64-sim sub-batch fused — measured compiling
    # and serving 128 bunnies at 4.39M aggregate steps/s as [64x2]; a
    # fused OOM is caught by the skip-set retry anyway.
    FUSED_SLICE_VMEM_MARGIN = 8 * (1 << 20)

    def __init__(self, args, dtype=None, pallas_mode: str = "auto",
                 matmul_dtype=None):
        self.args = args
        self.dtype = dtype   # None: float64 under x64, else float32
        # "auto": fuse the iteration loop into one Pallas kernel when on TPU
        # and all reduced groups are fusible; "interpret": force the kernel
        # in interpreter mode (CPU testing); "off": always XLA
        self.pallas_mode = pallas_mode
        # storage dtype for the large per-step matrices (U lift, U^T A_c):
        # bfloat16 halves their HBM traffic — the dominant marginal cost at
        # bunny scale — while all accumulation stays f32.  None: same as
        # dtype.
        self.matmul_dtype = matmul_dtype
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
        self._step_jit = None
        self._run_jit = None
        self._local_terms = None
        self._solve = None
        self._recorded: dict[str, dict[str, np.ndarray]] = {}
        # False (default): off — documented deviation from the reference's
        # unconditional per-step host resolvers (Simulators.py:529-530);
        # True: host KD-tree passes; "device": jit-composable masked
        # O(n*k) pass fused into the step (captured at prepare time).
        self.enable_self_collision = False
        self._collision_mode = False
        self._collide_jit = None
        self._rb_sched = None
        self._record_scan = None
        self._resident_state = None
        self._resident_batched = {}
        self._batched_call_cache = {}
        self._resident_fast = None
        self._sc_fused = None
        self._resident_fast_kind = None

    # ------------------------------------------------------------------
    @staticmethod
    def _rb_allowance(kernel_budget: int) -> int:
        """Per-call rb-timeline VMEM allowance left over by a resident
        kernel whose operands budget ``kernel_budget`` bytes: whatever
        the scoped ceiling leaves free minus 8 MB staging headroom,
        capped at 32 MB.  Used with the SOLO budget for run_steps and
        the BATCHED budget for ensemble serving (a near-gate batch must
        not also admit a 32 MB window, round-3 review finding)."""
        from animsnapbases_tpu.ops.pallas_resident import (
            SCOPED_VMEM_LIMIT,
        )

        return min(32 * (1 << 20),
                   max(SCOPED_VMEM_LIMIT - 8 * (1 << 20) - kernel_budget,
                       1 << 20))

    def _ut_st_np(self):
        """U^T S^T per dim (3, r, e_pos) for the positional group, or
        None without one — computed ONCE per prepare (cached; cleared by
        set_dirty): both the resident prep and the jitted step need it,
        and the dense ST materialization is the expensive part."""
        cached = getattr(self, "_ut_st_cache", None)
        if cached is not None:
            return cached
        pos_group = self.model.groups.get("positional")
        if pos_group is None:
            return None
        ST = pos_group.assembly_scipy(self.model.n_verts)
        self._ut_st_cache = np.stack(
            [self.U[:, :, d].T @ ST.toarray() for d in range(3)])
        return self._ut_st_cache

    def _cast(self, x):
        if self.dtype is None:
            return jnp.asarray(x)
        if np.issubdtype(np.asarray(x).dtype, np.floating):
            return jnp.asarray(x, dtype=self.dtype)
        return jnp.asarray(x)

    def set_model(self, model):
        self.model = model
        self._collide_jit = None     # faces-keyed cache is now stale
        # reduced groups were built from the OLD model's elements/rest
        # data — force prepare() to rebuild them, and drop the resident
        # kernels (their operands bake the old model's permutation)
        self.constraint_projection_ready = False
        self._reduced_groups = {}
        self._resident = None
        self._resident_state = None
        self._resident_fast = None
        self._sc_fused = None
        self._resident_fast_kind = None
        self._resident_batched = {}
        self._run_jit = None
        self.set_dirty()

    def set_dirty(self):
        self.dirty = True
        self._ut_st_cache = None     # U/ST may change with the rebuild
        self._rb_sched = None        # positional schedule may have changed
        self._record_scan = None     # closes over the (re)built step core
        self._batched_call_cache = {}   # closes over perm of the old build
        self._sliced_bs_bad = set()  # bad sub-batches belonged to the old build

    def set_clean(self):
        self.dirty = False

    def ready(self):
        return not self.dirty

    def set_record_path(self, path):
        self.record_path = path

    def set_store_p(self, value):
        self.store_stacked_projections = value

    store_assembly_matrices = _FullSolver.store_assembly_matrices

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
        # velocity damping (default 0 = exact reference semantics): the
        # predictor uses s_n = q + dt*eta*v + dt^2 M^-1 f with
        # eta = 1 - damping; stored velocities stay (q_new - q)/dt.
        # Long-horizon serving NEEDS damping > 0: the hyper-reduction
        # approximation error acts as per-step noise forcing and pumps
        # the chaotic modes unboundedly over tens of thousands of steps
        # (observed: bunny/bridge scenes NaN past ~100k undamped steps).
        self.eta = 1.0 - float(getattr(args, "damping", 0.0) or 0.0)
        A = build_global_matrix(self.model, self.dt)
        if self.reduced_position:
            self._load_position_basis()
            # Displacement-form reduction: solve A u = c - A_c sn with
            # q = sn + U u.  Mathematically equivalent to projecting
            # A q = M/dt^2 sn + c, but the huge pinned-mass rhs terms cancel
            # analytically, which keeps the reduced rhs at elastic scale —
            # essential for float32 on TPU.  The r x r systems are solved by
            # a precomputed inverse (one small matmul on the MXU) instead of
            # a serial triangular solve.
            invs, ut_ac = [], []
            dt2_inv = 1.0 / (self.dt * self.dt)
            for d in range(3):
                A_d = A[d::3, d::3]
                Ud = self.U[:, :, d]
                Ar = Ud.T @ (A_d @ Ud)
                invs.append(np.linalg.inv(Ar))
                Ac_d = (A_d - scipy.sparse.diags(
                    self.model.mass * dt2_inv)).tocsr()
                ut_ac.append(np.asarray((Ac_d.T @ Ud).T))   # (r, N) dense
            self._inv_np = np.stack(invs)               # (3, r, r)
            self._ut_ac_np = np.stack(
                [np.asarray(m) for m in ut_ac])         # (3, r, N)
            self._use_dense = True
            self._solve = None
        else:
            n3 = A.shape[0]
            self._use_dense = n3 <= self.DENSE_LIMIT
            if self._use_dense:
                self._chol_full_np = np.linalg.cholesky(A.toarray())
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
                oversample=getattr(args, "deim_oversample", 1.0))
            self._reduced_groups[name] = rg

    def prepare(self, args, store_fom_info=False, record_path=None):
        if store_fom_info:
            assert record_path is not None
            self.store_assembly_matrices(record_path)
            self.record_path = record_path

        if self.dirty:
            self.prepare_global_matrix(args)
        if (self.has_reduced_constraint_projections
                and not self.constraint_projection_ready):
            self.prepare_local_term(args)
            self.constraint_projection_ready = True
        self._build_step()
        self.set_clean()

    # ------------------------------------------------------------------
    # step construction
    # ------------------------------------------------------------------

    def _remapped_subsets(self):
        """Union of vertices the reduced kernels touch + subset data with
        vertex indices remapped into the compact union ordering."""
        union = []
        for rg in self._reduced_groups.values():
            for key in _VERTEX_KEYS[rg.name]:
                union.append(np.asarray(rg.subset_data[key]).reshape(-1))
        union = np.unique(np.concatenate(union)) if union else np.empty(
            0, np.int64)
        lookup = np.zeros(self.model.n_verts, dtype=np.int64)
        lookup[union] = np.arange(len(union))
        remapped = {}
        for name, rg in self._reduced_groups.items():
            sub = dict(rg.subset_data)
            for key in _VERTEX_KEYS[name]:
                sub[key] = lookup[np.asarray(sub[key])]
            remapped[name] = sub
        return union, remapped

    def _try_build_pallas(self, union: np.ndarray, remapped: dict):
        """Build the fused Pallas iteration kernel when every reduced group
        is fusible (all five kinds, DEIM row form or block form).  Returns
        the runner or None (XLA fallback)."""
        if self.pallas_mode == "off" or len(union) == 0:
            return None
        import jax as _jax

        from animsnapbases_tpu.ops.pallas_reduced import (
            FUSIBLE_KINDS,
            build_fused_reduced_iterations,
            pack_edge_spring,
            pack_tets,
            pack_tris_strain,
            pack_verts_bending,
        )

        # the dtype jnp will actually materialize (x64 may be disabled)
        np_dtype = np.dtype(jnp.asarray(0.0, dtype=self.dtype).dtype)
        interpret = (self.pallas_mode == "interpret"
                     or _jax.default_backend() != "tpu")
        if self.pallas_mode == "auto" and _jax.default_backend() != "tpu":
            return None   # interpreter mode is for explicit testing only

        ident = np.arange(len(union))
        packed = []
        for name, rg in self._reduced_groups.items():
            sub = remapped[name]
            W = rg.W.astype(np_dtype)
            if name not in FUSIBLE_KINDS:
                return None
            # row form (rg.row_select set) and block form (None) both fuse
            if name == "tris_strain":
                packed.append(pack_tris_strain(sub, ident, W, rg.row_select,
                                               np_dtype))
            elif name == "edge_spring":
                packed.append(pack_edge_spring(sub, ident, W, np_dtype))
            elif name in ("tets_strain", "tets_deformation_gradient"):
                packed.append(pack_tets(name, sub, ident, W, rg.row_select,
                                        np_dtype))
            elif name == "verts_bending":
                packed.append(pack_verts_bending(sub, ident, W, np_dtype))
            else:
                return None
        U_selT = np.ascontiguousarray(
            self.U[union].transpose(2, 1, 0)).astype(np_dtype)  # (3, r, nsel)
        inv3 = self._inv_np.astype(np_dtype)
        # keep the packed operands for the resident multi-step kernel
        self._fused_pack = (packed, U_selT, inv3, np_dtype, interpret)
        return build_fused_reduced_iterations(packed, U_selT, inv3,
                                              interpret=interpret)

    def _try_build_resident(self, union: np.ndarray):
        """Whole-simulation-resident kernel: loops steps x iterations inside
        one pallas_call with the state and (optionally low-precision) big
        matrices in VMEM.  Vertices are permuted so the selected union is a
        prefix (static slice instead of gather).  Returns
        (run_fn, perm, iperm, fext_is_free) or None."""
        self._resident_state = None
        self._resident_batched = {}
        self._batched_call_cache = {}   # closures capture the old build
        self._resident_fast = None
        self._resident_fast_kind = None
        self._sc_fused = None           # captures the old tier-1 runner
        if getattr(self, "_fused_pack", None) is None:
            return None
        if (self._collision_mode == "device"
                and not getattr(self, "self_collision_resident", True)):
            # the collision pass cannot run in-kernel; with the
            # proximity-gated serving tier DISABLED the kernels would
            # never be used — skip their compile cost.  When the tier is
            # on (default), run_steps serves certified-clear windows on
            # them (_run_steps_self_collision) and this build pays off.
            return None
        from animsnapbases_tpu.ops.pallas_reduced import (
            prepare_fused_operands,
        )
        from animsnapbases_tpu.ops.pallas_resident import (
            build_resident_multistep,
            estimate_vmem_bytes,
        )

        packed, U_selT, inv3, np_dtype, interpret = self._fused_pack
        n = self.model.n_verts
        r = self.U.shape[1]
        n_sel = len(union)
        mm_dtype = (np.dtype(jnp.asarray(0.0, dtype=self.matmul_dtype).dtype)
                    if self.matmul_dtype is not None else np_dtype)

        ops = prepare_fused_operands(packed, U_selT, inv3)
        m_total = ops["WT_all"].shape[1]
        g_total = ops["G_allT"].shape[1]
        budget = estimate_vmem_bytes(n, r, n_sel, g_total, m_total,
                                     mm_dtype.itemsize, np_dtype.itemsize)
        # the affine kernel (the default) anchors its base IN the output
        # buffers (no b0/b1 scratch) but still pays ~2x (3, N)
        # materialization temporaries at rebases, plus M_utac (3, r, r)
        # and the plain U_selT (3, r, n_sel)
        affine_extra = (2 * 3 * n * np_dtype.itemsize
                        + 3 * r * (r + n_sel) * np_dtype.itemsize)
        limit = getattr(self, "resident_vmem_limit",
                        self.RESIDENT_VMEM_LIMIT)
        use_affine = budget + affine_extra <= limit
        if use_affine:
            budget += affine_extra
        # the gate leaves headroom under the kernel's 100 MB scoped-vmem
        # limit for matmul staging, double-buffered state, and a per-call
        # rb window (v5e: 128 MB/core); if Mosaic still can't fit it,
        # run_steps falls back at first call.
        chunked_only = getattr(self, "resident_chunked_only", None)
        if budget > limit:
            # BEYOND-GATE admission: the full-state resident kernels
            # can't fit, but the CHUNKED affine kernel carries only
            # coefficient state (its O(N) operands are the lift's
            # y-slice + one packed (3, N) y-rows array), so models far
            # past the gate — ~450k verts at r=48/bf16 — still step at
            # the affine rate.  Contact windows fall to the per-step
            # fused path (run_fn=None below); resting-on-floor regimes
            # are served in bounded per-step windows (see run_steps).
            from animsnapbases_tpu.ops.pallas_resident import (
                estimate_chunked_vmem_bytes,
            )

            chunked_budget = estimate_chunked_vmem_bytes(
                n, r, n_sel, g_total, m_total,
                mm_dtype.itemsize, np_dtype.itemsize,
                floor_exact=self._chunked_floor_exact(n))
            if chunked_only is False or chunked_budget > limit:
                return None
            chunked_only = True
            budget = chunked_budget
        if mm_dtype.itemsize == 8 and not interpret:
            return None          # no native f64 dots in Mosaic
        # per-call rb-timeline allowance: gate + window + staging stays
        # under the scoped-VMEM ceiling — lets animated schedules run
        # 16k-step chunks in one dispatch; shrinks for near-gate models
        self._rb_seq_limit = self._rb_allowance(budget)

        perm = np.concatenate([union,
                               np.setdiff1d(np.arange(n), union)])
        iperm = np.argsort(perm)
        U_perm = self.U[perm]                                # (N, r, 3)
        U_liftT = np.ascontiguousarray(
            U_perm.transpose(2, 1, 0)).astype(mm_dtype)      # (3, r, N)
        # (3, r, N) — N on the LANE axis: an (N, r) layout pads r up to
        # the 128-lane VMEM tile (2.7x waste at r=48, 16x at r=8); the
        # kernels contract it with the NT-form dot_general instead
        ut_acT = np.ascontiguousarray(
            self._ut_ac_np[:, :, perm]).astype(mm_dtype)
        mass_inv = (1.0 / self.model.mass[perm])[None, :].astype(np_dtype)

        uts = self._ut_st_np()
        self._resident_utst = (None if uts is None
                               else uts.astype(np_dtype))   # (3, r, e_pos)
        self._rb_sched = None

        M_utac = None
        if use_affine or chunked_only:
            M_utac = np.stack(
                [self._ut_ac_np[d] @ self.U[:, :, d]
                 for d in range(3)]).astype(np_dtype)      # (3, r, r)
        # everything a batched (nb > 1) rebuild needs — the big operands
        # are shared across the batch, so ensemble runners reuse them
        # the contact-MODE machinery is the 2.8x contact win on small
        # models but costs the contact-FREE loop ~4x past ~50k vertices
        # (see CONTACT_MODE_MAX_VERTS) — gate it on the vertex count
        # unless the caller overrides via solver.resident_contact_mode
        contact_mode = getattr(self, "resident_contact_mode", None)
        if contact_mode is None:
            contact_mode = n <= self.CONTACT_MODE_MAX_VERTS

        self._resident_state = {
            "ops": ops, "U_liftT": U_liftT, "ut_acT": ut_acT,
            "M_utac": M_utac, "U_selT": U_selT.astype(np_dtype),
            "mass_inv": mass_inv, "perm": perm, "iperm": iperm,
            "use_affine": use_affine, "interpret": interpret,
            "np_dtype": np_dtype, "mm_dtype": mm_dtype,
            "n": n, "r": r, "n_sel": n_sel,
            "g_total": g_total, "m_total": m_total,
            "contact_mode": contact_mode,
        }
        self._resident_batched = {}

        chunked_tier1 = getattr(self, "resident_chunked_tier1", None)
        if chunked_tier1 is None:
            # measured IN-PROCESS on the TPU at every scale, the chunked
            # tier-1 (coefficient-only Pallas body + O(r) floor bound)
            # beats the in-kernel alternatives for contact-free
            # stepping: 154k vs 147k steps/s at 14.4k verts (vs the
            # no-tier contact-mode loop), 140k vs 120k at 51.5k (vs the
            # lean exit kernel), 123k vs 41k at 100k, 89k vs 1.3k at
            # 250k — so it is tier 1 at ALL sizes; only the CONTACT
            # tier varies with scale below.
            chunked_tier1 = True
        if chunked_only or (use_affine and chunked_tier1):
            # TIER 1 = the CHUNKED affine kernel: an XLA while_loop
            # re-anchors every rebase_every steps and the Pallas kernel
            # steps pure coefficient state (its only O(N) operands are
            # the y-slice of the lift for the exact floor check and the
            # packed anchor y-rows/selected prefixes).  Floor-off
            # models pass a sentinel floor so the kernel never exits.
            from animsnapbases_tpu.ops.pallas_resident import (
                build_resident_affine,
                build_resident_affine_chunked,
            )

            floor_h = (self.model.floor_height
                       if self.model.floor_collision else -3.0e38)
            # larger chunks amortize the per-chunk O(N) overhead (the
            # rebase lift/project dots + per-pallas_call operand
            # staging), which DOMINATES at this scale once the O(r)
            # floor bound removes the per-step O(N) work — measured at
            # 250k verts: 55-62k steps/s at 256 vs 85-89k at 1024
            # (4096 plateaus); numerically the cadence only sets the
            # f32 coefficient-drift window, bounded and tiny either way
            self._resident_fast = build_resident_affine_chunked(
                ops, ops["gather_slices"], ops["layout"],
                ops["G_allT"], ops["WT_all"],
                ops["inv3"], U_liftT, ut_acT, M_utac,
                U_selT.astype(np_dtype), mass_inv, self.dt,
                floor_h, n_sel,
                rebase_every=self._chunked_rebase_every(n),
                interpret=interpret, eta=getattr(self, "eta", 1.0),
                floor_bound_skip=getattr(
                    self, "resident_floor_bound_skip", True),
                floor_exact=self._chunked_floor_exact(n),
                **getattr(self, "resident_chunked_opts", {}))
            self._resident_fast_kind = "chunked"
            self._resident_fallback = None
            if chunked_only:
                # BEYOND-GATE: no full-state resident kernel fits VMEM
                # — the contact tier is the per-step fused path
                # (run_steps serves bounded per-step windows when
                # run_fn is None)
                self._resident_state["use_affine"] = False
                self._resident_kind = "chunked-only"
                return None, perm, iperm
            if n >= self.CHUNKED_TIER1_MIN_VERTS:
                # SPILL REGIME (see CHUNKED_TIER1_MIN_VERTS): the
                # contact tier is the STANDARD kernel outright —
                # measured faster than the lean affine build here (39k
                # vs 15k steps/s at a 100k-vertex cloth) — and batched
                # rebuilds must use it too, not re-enter the spill
                # regime
                self._resident_state["use_affine"] = False
                run = build_resident_multistep(
                    ops, ops["gather_slices"], ops["layout"],
                    ops["G_allT"], ops["WT_all"],
                    ops["inv3"], U_liftT, ut_acT, mass_inv, self.dt,
                    self.model.floor_collision, self.model.floor_height,
                    n_sel, interpret=interpret,
                    eta=getattr(self, "eta", 1.0))
                self._resident_kind = "standard"
                return run, perm, iperm
            # small/mid models: the adaptive affine kernel stays the
            # contact tier (contact-mode <=32k verts serves contact-
            # dominated windows at ~126k steps/s; the lean build above
            # that), and batched/ensemble rebuilds keep the affine path
            run = build_resident_affine(
                ops, ops["gather_slices"], ops["layout"],
                ops["G_allT"], ops["WT_all"],
                ops["inv3"], U_liftT, ut_acT, M_utac,
                U_selT.astype(np_dtype), mass_inv, self.dt,
                self.model.floor_collision, self.model.floor_height,
                n_sel,
                rebase_every=getattr(self, "resident_rebase_every", 256),
                interpret=interpret, contact_mode=contact_mode,
                eta=getattr(self, "eta", 1.0))
            self._resident_kind = "affine"
            self._resident_fallback = lambda: build_resident_multistep(
                ops, ops["gather_slices"], ops["layout"],
                ops["G_allT"], ops["WT_all"],
                ops["inv3"], U_liftT, ut_acT, mass_inv, self.dt,
                self.model.floor_collision, self.model.floor_height,
                n_sel, interpret=interpret,
                eta=getattr(self, "eta", 1.0))
            return run, perm, iperm

        if use_affine:
            # default: the affine-coordinate kernel never touches the
            # full vertex space on contact-free steps and handles floor
            # contact exactly with a per-step adaptive branch
            from animsnapbases_tpu.ops.pallas_resident import (
                build_resident_affine,
            )

            run = build_resident_affine(
                ops, ops["gather_slices"], ops["layout"],
                ops["G_allT"], ops["WT_all"],
                ops["inv3"], U_liftT, ut_acT, M_utac,
                U_selT.astype(np_dtype), mass_inv, self.dt,
                self.model.floor_collision, self.model.floor_height,
                n_sel,
                rebase_every=getattr(self, "resident_rebase_every", 256),
                interpret=interpret, contact_mode=contact_mode,
                eta=getattr(self, "eta", 1.0))
            if self.model.floor_collision and not contact_mode:
                # TIER 1 for run_steps on LARGE models (the lean builds):
                # the contact-less early-exit kernel recovers the full
                # affine rate that any in-kernel contact branch taxes
                # away at this scale (bridge: ~300k vs 108k steps/s); a
                # would-be clamped step exits to the lean kernel above.
                # Small models skip it — their contact-mode kernel is
                # untaxed, so a tier split only adds dispatch overhead.
                from animsnapbases_tpu.ops.pallas_resident import (
                    build_resident_affine_exit,
                )

                self._resident_fast = build_resident_affine_exit(
                    ops, ops["gather_slices"], ops["layout"],
                    ops["G_allT"], ops["WT_all"],
                    ops["inv3"], U_liftT, ut_acT, M_utac,
                    U_selT.astype(np_dtype), mass_inv, self.dt,
                    self.model.floor_height, n_sel,
                    rebase_every=getattr(self, "resident_rebase_every",
                                         256),
                    interpret=interpret, eta=getattr(self, "eta", 1.0))
                self._resident_fast_kind = "exit"
            self._resident_kind = "affine"
            # if Mosaic rejects the affine kernel at first compile, the
            # standard resident kernel (35-75k steps/s) is still far
            # better than the per-step fused fallback (~2.7k)
            self._resident_fallback = lambda: build_resident_multistep(
                ops, ops["gather_slices"], ops["layout"],
                ops["G_allT"], ops["WT_all"],
                ops["inv3"], U_liftT, ut_acT, mass_inv, self.dt,
                self.model.floor_collision, self.model.floor_height,
                n_sel, interpret=interpret,
                eta=getattr(self, "eta", 1.0))
            return run, perm, iperm

        self._resident_fallback = None
        run = build_resident_multistep(
            ops, ops["gather_slices"], ops["layout"],
            ops["G_allT"], ops["WT_all"], ops["inv3"],
            U_liftT, ut_acT, mass_inv, self.dt,
            self.model.floor_collision, self.model.floor_height,
            n_sel, interpret=interpret, eta=getattr(self, "eta", 1.0))
        self._resident_kind = "standard"
        return run, perm, iperm

    @staticmethod
    def batched_resident_budget(st, nb: int, floor_collision: bool) -> int:
        """VMEM-byte estimate for an ``nb``-sim batched resident kernel
        built from resident state ``st`` — the number the batched gate
        compares against BATCHED_VMEM_LIMIT.  Kept as a pure function so
        the gate's capacity (e.g. 64 bunny-scale sims in one kernel) is
        pinned by unit tests."""
        from animsnapbases_tpu.ops.pallas_resident import (
            estimate_vmem_bytes,
        )

        budget = estimate_vmem_bytes(
            st["n"], st["r"], st["n_sel"], st["g_total"], st["m_total"],
            st["mm_dtype"].itemsize, st["np_dtype"].itemsize, nb=nb)
        if st["use_affine"]:
            # materialization temporaries, (3*nb, N) (the base anchors
            # live in the output buffers — no b0/b1 scratch), plus the
            # per-sim small temporaries (3nb, r)/(3nb, n_sel) and the
            # SHARED M_utac (3, r, r) + U_selT (3, r, n_sel) operands
            # (same term the solo gate charges)
            budget += (2 * 3 * nb * st["n"] * st["np_dtype"].itemsize
                       + 3 * nb * (st["r"] + st["n_sel"])
                       * st["np_dtype"].itemsize
                       + 3 * st["r"] * (st["r"] + st["n_sel"])
                       * st["np_dtype"].itemsize)
            if st["contact_mode"] and floor_collision:
                # contact-mode y scratch: Py/Vy (nb, N) + buPy/buVy
                budget += (2 * nb * (st["n"] + st["r"])
                           * st["np_dtype"].itemsize)
        return budget

    def _build_resident_batched(self, nb: int):
        """Resident runner serving ``nb`` independent sims of this prepared
        model in ONE kernel (dim-major (3*nb, N) state rows; the big bf16
        matrices are shared).  Cached per batch size; None when the state
        is unavailable or the per-sim VMEM cost doesn't fit."""
        st = getattr(self, "_resident_state", None)
        if st is None or nb < 1:
            return None
        if nb in self._resident_batched:
            return self._resident_batched[nb]
        if nb == 1 and getattr(self, "_resident", None) is not None:
            # the solo resident runner IS the nb=1 batched kernel (same
            # builder arguments, same dim-major (3, N) layout) — reuse it
            # instead of compiling a second, mathematically identical
            # Mosaic kernel (tens of seconds compile + tunnel-load first
            # dispatch)
            self._resident_batched[1] = self._resident[0]
            return self._resident[0]
        from animsnapbases_tpu.ops.pallas_resident import (
            build_resident_affine,
            build_resident_multistep,
        )

        budget = self.batched_resident_budget(
            st, nb, self.model.floor_collision)
        limit = getattr(self, "resident_batched_vmem_limit",
                        self.BATCHED_VMEM_LIMIT)
        if budget > limit:
            self._resident_batched[nb] = None
            return None
        ops = st["ops"]
        common = (ops, ops["gather_slices"], ops["layout"], ops["G_allT"],
                  ops["WT_all"], ops["inv3"],
                  st["U_liftT"], st["ut_acT"])
        if st["use_affine"]:
            run = build_resident_affine(
                *common, st["M_utac"], st["U_selT"], st["mass_inv"],
                self.dt, self.model.floor_collision,
                self.model.floor_height, st["n_sel"],
                rebase_every=getattr(self, "resident_rebase_every", 256),
                interpret=st["interpret"], nb=nb,
                contact_mode=st["contact_mode"],
                eta=getattr(self, "eta", 1.0))
        else:
            run = build_resident_multistep(
                *common, st["mass_inv"], self.dt,
                self.model.floor_collision, self.model.floor_height,
                st["n_sel"], interpret=st["interpret"], nb=nb,
                eta=getattr(self, "eta", 1.0))
        self._resident_batched[nb] = run
        return run

    @staticmethod
    def batched_chunked_budget(st, nb: int,
                               floor_exact: bool = True) -> int:
        """VMEM-byte estimate for an ``nb``-sim batched CHUNKED affine
        kernel built from resident state ``st`` (the coefficient-only
        Pallas body: its per-sim O(N) cost is ONE packed y-row block, so
        ensembles of models far past the full-state batched gate still
        fit — e.g. 8x a 250k-vertex cloth).  Pure function so capacity
        is pinned by unit tests."""
        from animsnapbases_tpu.ops.pallas_resident import (
            estimate_chunked_vmem_bytes,
        )

        return estimate_chunked_vmem_bytes(
            st["n"], st["r"], st["n_sel"], st["g_total"], st["m_total"],
            st["mm_dtype"].itemsize, st["np_dtype"].itemsize, nb=nb,
            floor_exact=floor_exact)

    def _chunked_floor_exact(self, n: int) -> bool:
        """Whether chunked builds keep the IN-KERNEL exact floor check
        (see CHUNKED_FLOOR_EXACT_MAX_VERTS).  Exact-free requires the
        certified O(r) bound, so disabling the bound forces exact."""
        fe = getattr(self, "resident_floor_exact", None)
        if fe is None:
            fe = n <= self.CHUNKED_FLOOR_EXACT_MAX_VERTS
        if not getattr(self, "resident_floor_bound_skip", True):
            fe = True
        return bool(fe)

    def _chunked_rebase_every(self, n: int) -> int:
        """Rebase cadence for chunked builds.  Past the large-N gate the
        per-chunk O(N) rebase (lift/project dots streaming the (3, r, N)
        matrices from HBM) is worth amortizing further: measured
        in-process at 250k verts, 4096 beats 1024 by ~3 % (116.8k ->
        120.4k steps/s) and 16384 gives it back (stale anchors loosen
        the floor bound's y-row intervals)."""
        every = getattr(self, "resident_rebase_every", None)
        if every:
            return int(every)
        return (4096 if n > self.CHUNKED_FLOOR_EXACT_MAX_VERTS
                else 1024)

    def _chunked_rb_chunk_bytes(self, nb: int, T_rb: int, r: int,
                                itemsize: int) -> int:
        """VMEM bytes a CHUNKED kernel stages for ONE chunk's rb rows,
        matching what build_resident_affine_chunked actually loads: the
        per-step rows are padded from 3nb to an 8-sublane-aligned stride,
        the r columns pad to the 128-lane tile, and the slice length is
        ``min(rebase_every, T)`` — the gate must count the padded/real
        cadence, not the unpadded 1024-row default (round-4 review
        finding: a 4096-cadence animated ensemble undercounted 4-10x and
        blew scoped VMEM at dispatch)."""
        n = self.model.n_verts
        S = min(self._chunked_rebase_every(n), max(1, int(T_rb)))
        stride = -(-3 * nb // 8) * 8
        lanes = -(-r // 128) * 128
        return S * stride * lanes * itemsize

    def _build_resident_batched_chunked(self, nb: int):
        """Batched CHUNKED affine runner: ``nb`` independent sims of this
        prepared model stepped as dim-major (3nb, N) COEFFICIENT state in
        one chunked kernel (rebase/materialize in the outer XLA
        while_loop, shared big matrices).  This is the ensemble path for
        models whose full-state batched kernel exceeds VMEM (spill
        regime / beyond the gate) — the alternative is the ~25x slower
        vmapped per-step loop.  Early-exit semantics are whole-batch:
        the kernel stops before the first step where ANY sim would clamp
        (the caller serves a bounded per-step window, then hands back).
        Cached per batch size; None when the footprint doesn't fit or
        the solver has no chunked tier."""
        st = getattr(self, "_resident_state", None)
        if (st is None or nb < 1
                or getattr(self, "_resident_fast", None) is None):
            return None
        key = ("chunked", nb)
        if key in self._resident_batched:
            return self._resident_batched[key]
        if nb == 1 and getattr(self, "_resident_fast_kind",
                               None) == "chunked":
            # the tier-1 chunked runner IS the nb=1 batched kernel
            # (identical builder arguments) — reuse it instead of
            # compiling a second, mathematically identical kernel.
            # Guarded on the recorded KIND: with resident_chunked_tier1
            # = False the tier-1 slot holds the affine-EXIT (full-state)
            # kernel, whose VMEM staging the chunked gates undercount
            self._resident_batched[key] = self._resident_fast
            return self._resident_fast
        limit = getattr(self, "resident_vmem_limit",
                        self.RESIDENT_VMEM_LIMIT)
        if self.batched_chunked_budget(
                st, nb,
                floor_exact=self._chunked_floor_exact(st["n"])) > limit:
            self._resident_batched[key] = None
            return None
        from animsnapbases_tpu.ops.pallas_resident import (
            build_resident_affine_chunked,
        )

        ops = st["ops"]
        floor_h = (self.model.floor_height
                   if self.model.floor_collision else -3.0e38)
        run = build_resident_affine_chunked(
            ops, ops["gather_slices"], ops["layout"], ops["G_allT"],
            ops["WT_all"], ops["inv3"], st["U_liftT"],
            st["ut_acT"], st["M_utac"], st["U_selT"], st["mass_inv"],
            self.dt, floor_h, st["n_sel"],
            rebase_every=self._chunked_rebase_every(st["n"]),
            interpret=st["interpret"], nb=nb,
            eta=getattr(self, "eta", 1.0),
            floor_bound_skip=getattr(
                self, "resident_floor_bound_skip", True),
            floor_exact=self._chunked_floor_exact(st["n"]),
            **getattr(self, "resident_chunked_opts", {}))
        self._resident_batched[key] = run
        return run

    def _build_step(self):
        model = self.model
        cast = self._cast
        n = model.n_verts
        mass = cast(model.mass)
        dt = self.dt
        dt2 = dt * dt
        dtv = dt * getattr(self, "eta", 1.0)   # damped predictor coeff
        floor = model.floor_collision
        floor_h = model.floor_height

        # capture the self-collision mode into the jitted step ("device"
        # fuses the masked O(n*k) pass; changing the flag afterwards needs
        # set_dirty + prepare)
        self._collision_mode = self.enable_self_collision
        if self._collision_mode == "device":
            from animsnapbases_tpu.sim.collisions_device import (
                resolve_self_collision_device,
            )

            faces_j = jnp.asarray(model.faces)

            def collide(q):
                return resolve_self_collision_device(q, faces_j)
        else:
            def collide(q):
                return q

        full_groups = {name: g for name, g in model.groups.items()
                       if name not in self._reduced_groups}
        only_positional_full = set(full_groups) <= {"positional"}
        local_full = make_local_stage(_GroupView(model, full_groups))

        reduced = []
        for name, rg in self._reduced_groups.items():
            dev = {k: (cast(v) if isinstance(v, np.ndarray)
                       and np.issubdtype(v.dtype, np.floating)
                       else (jnp.asarray(v) if isinstance(v, np.ndarray)
                             else v))
                   for k, v in rg.subset_data.items()}
            W = cast(rg.W)
            rs = (jnp.asarray(rg.row_select)
                  if rg.row_select is not None else None)
            reduced.append((name, dev, W, rs))

        U = cast(self.U) if self.U is not None else None
        inv3 = cast(self._inv_np) if self.reduced_position else None
        ut_ac = cast(self._ut_ac_np) if self.reduced_position else None
        if self.matmul_dtype is not None and self.reduced_position:
            # low-precision storage for the big per-step operands (halves
            # their HBM traffic); the einsums request full-precision
            # accumulation via preferred_element_type
            U_mm = jnp.asarray(self.U, dtype=self.matmul_dtype)
            ut_ac = jnp.asarray(self._ut_ac_np, dtype=self.matmul_dtype)
        else:
            U_mm = U
        chol_full = (cast(self._chol_full_np)
                     if getattr(self, "_chol_full_np", None) is not None
                     and not self.reduced_position else None)
        reduced_position = self.reduced_position

        def reduced_terms(q, dev_groups):
            terms = []
            for name, data, W, rs in dev_groups:
                p = projections.PROJECTION_KERNELS[name](q, data)
                if rs is not None:
                    p = p[rs]
                terms.append(jnp.einsum("dop,pd->od", W, p))
            return terms

        def local_terms(q, targets):
            """Full-space rhs (non-position-reduced path) + stacked p for
            recording."""
            b, stacked = local_full(q, targets)
            for term in reduced_terms(q, reduced):
                b = b + term
            return b, stacked

        self._local_terms = jax.jit(local_terms)

        if reduced_position and only_positional_full:
            # ---- fully reduced fast path ----
            union, remapped = self._remapped_subsets()
            U_sel = cast(self.U[union])                  # (n_sel, r, 3)
            reduced_sel = []
            for (name, _, W, rs), sub in zip(reduced,
                                             remapped.values()):
                dev = {k: (cast(v) if isinstance(v, np.ndarray)
                           and np.issubdtype(v.dtype, np.floating)
                           else (jnp.asarray(v) if isinstance(v, np.ndarray)
                                 else v))
                       for k, v in sub.items()}
                reduced_sel.append((name, dev, W, rs))
            union_j = jnp.asarray(union)

            UtSt = self._ut_st_np()       # (3, r, e_pos) or None
            UtSt_j = cast(UtSt) if UtSt is not None else None

            fused_run = self._try_build_pallas(union, remapped)
            self._resident = None
            if fused_run is not None:
                try:
                    self._resident = self._try_build_resident(union)
                except Exception:
                    self._resident = None

            def step_core(positions, velocities, fext, targets,
                          num_iterations):
                a = fext / mass[:, None]
                sn = positions + dtv * velocities + dt2 * a
                if floor:
                    sn = sn.at[:, 1].set(jnp.maximum(sn[:, 1], floor_h))
                # displacement form: rb_const = -U^T A_c sn (+ positional)
                rb_const = -jnp.einsum("drn,nd->rd", ut_ac,
                                       sn.astype(ut_ac.dtype),
                                       preferred_element_type=sn.dtype)
                if UtSt_j is not None:
                    rb_const = rb_const + jnp.stack(
                        [UtSt_j[d] @ targets[:, d] for d in range(3)], axis=1)

                sn_sel = sn[union_j]

                if fused_run is not None:
                    u3 = fused_run(sn_sel.T, rb_const.T, num_iterations)
                    u = u3.T                                      # (r, 3)
                else:
                    def body(_, carry):
                        q_sel, u = carry
                        terms = reduced_terms(q_sel, reduced_sel)
                        rb = rb_const
                        for t in terms:
                            rb = rb + t
                        u_new = jnp.einsum("drs,sd->rd", inv3, rb)  # (r, 3)
                        q_sel_new = sn_sel + jnp.einsum("nrd,rd->nd",
                                                        U_sel, u_new)
                        return q_sel_new, u_new

                    r = U.shape[1]
                    u0 = jnp.zeros((r, 3), dtype=sn.dtype)
                    _, u = jax.lax.fori_loop(0, num_iterations, body,
                                             (sn_sel, u0))
                q = sn + jnp.einsum("nrd,rd->nd", U_mm,
                                    u.astype(U_mm.dtype),
                                    preferred_element_type=sn.dtype)
                q = collide(q)
                v = (q - positions) / dt
                return q, v

        elif reduced_position:
            def step_core(positions, velocities, fext, targets,
                          num_iterations):
                a = fext / mass[:, None]
                sn = positions + dtv * velocities + dt2 * a
                if floor:
                    sn = sn.at[:, 1].set(jnp.maximum(sn[:, 1], floor_h))
                rb_base = -jnp.einsum("drn,nd->rd", ut_ac,
                                      sn.astype(ut_ac.dtype),
                                      preferred_element_type=sn.dtype)

                def body(_, q):
                    b_full, _ = local_full(q, targets)   # constraint terms
                    r_terms = reduced_terms(q, reduced)
                    rb = rb_base + jnp.einsum("nrd,nd->rd", U, b_full)
                    for term in r_terms:
                        rb = rb + term
                    u = jnp.einsum("drs,sd->rd", inv3, rb)
                    return sn + jnp.einsum("nrd,rd->nd", U, u)

                q = jax.lax.fori_loop(0, num_iterations, body, sn)
                q = collide(q)
                v = (q - positions) / dt
                return q, v

        elif self._use_dense:
            def step_core(positions, velocities, fext, targets,
                          num_iterations):
                a = fext / mass[:, None]
                sn = positions + dtv * velocities + dt2 * a
                if floor:
                    sn = sn.at[:, 1].set(jnp.maximum(sn[:, 1], floor_h))
                masses_term = (mass / dt2)[:, None] * sn

                def body(_, q):
                    b, _ = local_terms(q, targets)
                    b = b + masses_term
                    # deliberately cho_solve, NOT a precomputed inverse
                    # (the dev-notes small-system rule does not apply):
                    # A carries the 1e10 pinned masses, and at cond
                    # ~1e10 an explicit f32 inverse-multiply loses the
                    # small solution components that backward-stable
                    # triangular solves keep
                    return jax.scipy.linalg.cho_solve(
                        (chol_full, True), b.reshape(-1)).reshape(-1, 3)

                q = jax.lax.fori_loop(0, num_iterations, body, sn)
                q = collide(q)
                v = (q - positions) / dt
                return q, v
        else:
            step_core = None

        if step_core is not None:
            self._step_jit = jax.jit(step_core,
                                     static_argnames=("num_iterations",))

            @partial(jax.jit, static_argnames=("num_iterations",))
            def run_fn(positions, velocities, fext, targets_seq, num_steps,
                       num_iterations):
                # dynamic trip count: one compilation serves any num_steps.
                # targets_seq (T, e, 3) is a per-frame positional-target
                # timeline; T == 1 for static targets, and the index clamps
                # so a pow2-padded timeline reuses compilations.
                T = targets_seq.shape[0]

                def body(i, carry):
                    p, v = carry
                    t = jnp.minimum(i, T - 1)
                    return step_core(p, v, fext, targets_seq[t],
                                     num_iterations)

                p, v = jax.lax.fori_loop(0, num_steps, body,
                                         (positions, velocities))
                return p, v

            self._run_jit = run_fn
        else:
            self._step_jit = None
            self._run_jit = None

    # ------------------------------------------------------------------
    # stepping
    # ------------------------------------------------------------------

    def step(self, fext, num_iterations=10):
        model = self.model
        dt = self.dt
        targets = self._cast(model.positional_targets(self.frame))
        fext = self._cast(fext)

        # recording applies only to full (non-reduced) groups, as in the
        # reference; with everything reduced there is nothing to record and
        # the jitted path is always valid
        recordable = any(name not in self._reduced_groups
                         and name != "positional"
                         for name in model.groups)
        use_jit = self._step_jit is not None and (
            not self.store_stacked_projections or not recordable)
        if use_jit:
            if model.floor_collision:
                # the jit clamps the predictor in-graph; mirror the host
                # path's positions_corrections bookkeeping (solver.py
                # does the same) so consumers never read stale values
                a = np.asarray(fext, dtype=float) / model.mass[:, None]
                sn_raw = (model.positions
                          + dt * getattr(self, "eta", 1.0)
                          * model.velocities + dt * dt * a)
                _, corr = collisions.resolve_floor_collision(
                    sn_raw, model.floor_height)
                model.positions_corrections = corr
            q, v = self._step_jit(self._cast(model.positions),
                                  self._cast(model.velocities), fext,
                                  targets, num_iterations=num_iterations)
            if (self.enable_self_collision == "device"
                    and self._collision_mode != "device"):
                # flag flipped after prepare: apply the pass out-of-band
                q = self._collide_device(q)
                v = (q - self._cast(model.positions)) / dt
            q_next = np.asarray(q)
            if self.enable_self_collision is True:
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
        if self.reduced_position:
            # W matrices are Ut-composed under position reduction, so the
            # full-space host solve below cannot run
            raise RuntimeError(
                "recording full-group projections is not supported with "
                "position reduction while non-reduced constraint groups "
                "are present; disable recording or reduce every group")
        dt2 = dt * dt
        a = np.asarray(fext) / model.mass[:, None]
        explicit = (model.positions
                    + dt * getattr(self, "eta", 1.0) * model.velocities + dt2 * a)
        if model.floor_collision:
            explicit, corr = collisions.resolve_floor_collision(
                explicit, model.floor_height)
            model.positions_corrections = corr
        masses_term = self._cast((model.mass / dt2)[:, None] * explicit)
        q = self._cast(explicit)
        stacked = {}
        for _ in range(num_iterations):
            b, stacked = self._local_terms(q, targets)
            b = b + masses_term
            if self._use_dense and not self.reduced_position:
                chol = self._cast(self._chol_full_np)
                q = jax.scipy.linalg.cho_solve(
                    (chol, True), b.reshape(-1)).reshape(-1, 3)
            else:
                q = jnp.asarray(unflatten(
                    self._solve(np.asarray(b).flatten())))

        if self.store_stacked_projections:
            self._record_frame(stacked)

        if self.enable_self_collision == "device":
            q = self._collide_device(q)
        q_next = np.asarray(q)
        if self.enable_self_collision is True:
            q_next = collisions.resolve_self_collision_fast(q_next,
                                                            model.faces)
            q_next = collisions.resolve_triangle_self_collisions(
                q_next, model.faces)
        model.velocities = (q_next - model.positions) / dt
        model.positions = q_next
        self.frame += 1

    def _collide_device(self, q):
        if self._collide_jit is None:
            from animsnapbases_tpu.sim.collisions_device import (
                make_collide_jit,
            )

            self._collide_jit = make_collide_jit(self.model.faces)
        return self._collide_jit(self._cast(q))

    def make_batched_step(self, mesh=None, batch_axis: str = "data"):
        """Ensemble stepping: vmap the jitted step over a batch of
        (positions, velocities) states, optionally sharded over a mesh axis
        (production serving of many simultaneous reduced sims).

        Returns step(positions (B, N, 3), velocities, fext (B, N, 3),
        num_iterations) -> (positions', velocities')."""
        if self._step_jit is None:
            raise RuntimeError("batched stepping needs the jitted path "
                               "(dense/reduced global solve)")
        core = self._step_jit
        # advance the model's animated schedule across calls (internal
        # serving-frame counter, same contract as make_batched_run) —
        # a frozen capture would replay the creation frame's target
        # forever (the round-2 advisor finding on make_batched_run)
        serving_frame = [self.frame]

        spec = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = NamedSharding(mesh, P(batch_axis))

        @partial(jax.jit, static_argnames=("num_iterations",))
        def _step(positions, velocities, fext, targets,
                  num_iterations=10):
            if spec is not None:
                positions = jax.lax.with_sharding_constraint(positions, spec)
                velocities = jax.lax.with_sharding_constraint(velocities,
                                                              spec)
            return jax.vmap(
                lambda p, v, f: core(p, v, f, targets,
                                     num_iterations=num_iterations)
            )(positions, velocities, fext)

        def step(positions, velocities, fext, num_iterations=10,
                 targets=None):
            if targets is None:
                t = self._cast(
                    self.model.positional_targets(serving_frame[0]))
            else:
                t = self._cast(targets)
            out = _step(positions, velocities, fext, t,
                        num_iterations=num_iterations)
            serving_frame[0] += 1
            return out

        return step

    def make_batched_run(self, mesh=None, batch_axis: str = "data"):
        """Ensemble serving: advance a BATCH of independent sims
        ``num_steps`` steps in ONE dispatch, optionally sharded over a
        mesh axis.

        Single-chip batches route through the BATCHED RESIDENT Pallas
        kernel when the solver built one (the flagship path:
        dim-major (3B, N) state, shared bf16 matrices — per-step cost is
        nearly batch-independent, so aggregate throughput scales with B);
        otherwise the solver's dynamic-trip ``run_fn`` is vmapped over
        the batch.  Returns ``run(positions (B, N, 3), velocities,
        fext (B, N, 3), num_steps, num_iterations=10, targets_seq=None)
        -> (positions', velocities')``.

        ``targets_seq``: optional positional-target timeline — (T, e, 3)
        shared by all sims, or (B, T, e, 3) giving EACH sim its own
        schedule (independently-poked ensemble serving).  Timelines clamp
        at their last row and are pow2-padded so compilations are reused
        across lengths.  When omitted, the model's own schedule is used,
        advancing with an internal serving-frame counter across calls
        (starting at the solver's current frame) — consecutive chunks
        continue the animation exactly as :meth:`run_steps` does.
        """
        if self._run_jit is None:
            raise RuntimeError("batched stepping needs the jitted path "
                               "(dense/reduced global solve)")
        if self.enable_self_collision:
            # the host KD-tree resolvers (and an out-of-band device pass)
            # cannot run inside the batched device loop — failing loudly
            # beats silently serving interpenetrating trajectories
            raise RuntimeError("batched serving does not support "
                               "self-collision resolvers")
        serving_frame = [self.frame]

        spec = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = NamedSharding(mesh, P(batch_axis))

        # the vmapped fallback wrappers resolve self._run_jit at CALL
        # time (cached per underlying build): a creation-time capture
        # would keep serving the PRE-set_dirty physics on the fallback
        # path after a set_dirty+prepare rebuild, while the resident
        # path reads the rebuilt state — exactly the stale-prefactored-
        # matrix failure mode the scenario drivers guard against
        wrappers = {}

        def _vmapped(per_sim):
            run_jit = self._run_jit
            if run_jit is None:
                raise RuntimeError(
                    "batched serving needs the jitted path; call "
                    "prepare() after set_dirty()")
            fn = wrappers.get((run_jit, per_sim))
            if fn is not None:
                return fn
            if per_sim:
                @partial(jax.jit, static_argnames=("num_iterations",))
                def fn(positions, velocities, fext, targets_seq,
                       num_steps, num_iterations):
                    if spec is not None:
                        positions = jax.lax.with_sharding_constraint(
                            positions, spec)
                        velocities = jax.lax.with_sharding_constraint(
                            velocities, spec)
                    return jax.vmap(
                        lambda p, v, f, t: run_jit(
                            p, v, f, t, num_steps,
                            num_iterations=num_iterations)
                    )(positions, velocities, fext, targets_seq)
            else:
                @partial(jax.jit, static_argnames=("num_iterations",))
                def fn(positions, velocities, fext, targets_seq,
                       num_steps, num_iterations):
                    if spec is not None:
                        positions = jax.lax.with_sharding_constraint(
                            positions, spec)
                        velocities = jax.lax.with_sharding_constraint(
                            velocities, spec)
                    return jax.vmap(
                        lambda p, v, f: run_jit(
                            p, v, f, targets_seq, num_steps,
                            num_iterations=num_iterations)
                    )(positions, velocities, fext)
            wrappers[(run_jit, per_sim)] = fn
            return fn

        def run(positions, velocities, fext, num_steps, num_iterations=10,
                targets_seq=None):
            # caller errors must raise HERE, before the resident path —
            # a shape mismatch surfacing inside the kernel call would be
            # mistaken for a kernel failure and permanently poison the
            # batched kernel for this batch size
            if self.enable_self_collision:
                # re-checked per call: flipping the flag after creation
                # must not silently serve non-colliding trajectories
                raise RuntimeError("batched serving does not support "
                                   "self-collision resolvers")
            B = int(np.shape(positions)[0])
            if (int(np.shape(velocities)[0]) != B
                    or int(np.shape(fext)[0]) != B):
                raise ValueError(
                    f"batch mismatch: positions {B}, velocities "
                    f"{np.shape(velocities)[0]}, fext {np.shape(fext)[0]}")
            # vertex-axis mismatches must ALSO raise here: inside the
            # jitted pack the gather indices would silently CLAMP
            # (jax-under-jit semantics), stepping garbage state
            nv = self.model.n_verts
            for nm, arr in (("positions", positions),
                            ("velocities", velocities), ("fext", fext)):
                if tuple(np.shape(arr)[1:]) != (nv, 3):
                    raise ValueError(
                        f"{nm} must be (B, {nv}, 3) for this model; "
                        f"got {np.shape(arr)}")
            if targets_seq is None:
                tl, _ = self._targets_timeline_from(serving_frame[0],
                                                    num_steps)
                per_sim = False
            else:
                from animsnapbases_tpu.utils.padding import pow2_pad

                tl = np.asarray(targets_seq)
                per_sim = tl.ndim == 4
                if per_sim and tl.shape[0] != B:
                    raise ValueError(
                        f"per-sim targets_seq has batch {tl.shape[0]}, "
                        f"expected {B}")
                tl = pow2_pad(tl, axis=1 if per_sim else 0)
            out = None
            if mesh is None:
                out = self._run_batched_resident(
                    positions, velocities, fext, tl, per_sim, num_steps,
                    num_iterations)
            else:
                out = self._run_batched_resident_sharded(
                    mesh, batch_axis, positions, velocities, fext, tl,
                    per_sim, num_steps, num_iterations)
            if out is None:
                self._last_batched_path = "vmapped-xla"
                runner = _vmapped(per_sim)
                out = runner(self._cast(positions),
                             self._cast(velocities),
                             self._cast(fext), self._cast(tl), num_steps,
                             num_iterations=num_iterations)
            serving_frame[0] += num_steps
            return out

        return run

    def _run_batched_resident(self, positions, velocities, fext, tl,
                              per_sim, num_steps, num_iterations):
        """One-kernel ensemble chunk through the batched resident runner.
        ``tl`` is the positional-target timeline ((T, e, 3) shared or
        (B, T, e, 3) per-sim, already pow2-padded).  Returns
        (positions', velocities') as (B, N, 3) device arrays, or None
        when the batched kernel is unavailable (caller falls back to the
        vmapped XLA path)."""
        st = getattr(self, "_resident_state", None)
        if st is None or getattr(self, "_resident", None) is None:
            return None
        B = int(positions.shape[0])
        run_b = self._build_resident_batched(B)
        if run_b is None:
            # the whole batch exceeds the full-state VMEM gate.  LARGE
            # models (chunked tier regimes) go to the batched CHUNKED
            # kernel first: slicing them degenerates to sequential
            # nb=1 groups at the contact-tier rate (39k aggregate at a
            # 100k-vert cloth) or fails outright beyond the gate, while
            # the chunked kernel steps the whole ensemble's coefficient
            # state at the affine rate.  SMALL models keep the proven
            # fused-slice path first (flagship 4.4M steps/s at 64
            # bunnies), with chunked as the last pre-vmapped resort.
            big = (st["n"] >= self.CHUNKED_TIER1_MIN_VERTS
                   or getattr(self, "_resident_kind", "")
                   == "chunked-only")
            if big:
                out = self._run_batched_resident_chunked(
                    positions, velocities, fext, tl, per_sim, num_steps,
                    num_iterations)
                if out is not None:
                    return out
            out = self._run_batched_resident_sliced(
                positions, velocities, fext, tl, per_sim, num_steps,
                num_iterations)
            if out is None and not big:
                out = self._run_batched_resident_chunked(
                    positions, velocities, fext, tl, per_sim, num_steps,
                    num_iterations)
            return out
        r = st["r"]
        utst = self._resident_utst
        # per-sim schedules with NO positional group degenerate to the
        # shared zero timeline (same definition as the sharded/sliced
        # variants — keep all three in lockstep)
        shared_rb = not (per_sim and utst is not None)
        if utst is not None and tl.size:
            if per_sim:
                rb = np.einsum("dre,bted->btdr",
                               utst, np.asarray(tl, dtype=np.float64))
                rb = np.ascontiguousarray(
                    rb.transpose(1, 2, 0, 3))        # (T, 3, B, r)
                rb = rb.reshape(rb.shape[0], 3 * B, r)
            else:
                # shared timeline: upload ONE (T, 3, r) schedule; the
                # jitted call broadcasts it to the dim-major (T, 3B, r)
                # layout on device (no B-fold host repeat, no B-fold H2D)
                rb = np.einsum("dre,ted->tdr",
                               utst, np.asarray(tl, dtype=np.float64))
        else:
            rb = np.zeros((1, 3, r)) if shared_rb else np.zeros(
                (1, 3 * B, r))
        # gate on the EXPANDED size the kernel actually consumes —
        # counted at the DEVICE itemsize (rb is built f64 on host but
        # uploads through self._cast; gating on host bytes would halve
        # the admissible timeline for no reason)
        rb_dev_bytes = (rb.size * (B if shared_rb else 1)
                        * st["np_dtype"].itemsize)
        if rb_dev_bytes > self._rb_allowance(self.batched_resident_budget(
                st, B, self.model.floor_collision)):
            return None

        key = ("batched_call", B, shared_rb)
        cache = getattr(self, "_batched_call_cache", None)
        if cache is None:
            cache = self._batched_call_cache = {}
        call = cache.get(key)
        if call is None:
            perm_j = jnp.asarray(st["perm"])
            iperm_j = jnp.asarray(st["iperm"])
            n = st["n"]

            @partial(jax.jit, static_argnames=("num_iterations",))
            def call(pos, vel, fx, rb_dev, steps_arr, consts, arrays,
                     num_iterations):
                # pack (B, N, 3) -> dim-major (3B, N), run the kernel,
                # unpack — all in ONE jit (one dispatch per chunk); the
                # kernel operands ride as traced args, NOT closure
                # constants (keeps the HLO small, see run.operands)
                if shared_rb:
                    # (T, 3, r) -> dim-major (T, 3B, r) on device
                    T, _, rr = rb_dev.shape
                    rb_dev = jnp.broadcast_to(
                        rb_dev[:, :, None, :],
                        (T, 3, B, rr)).reshape(T, 3 * B, rr)

                def pack(x):
                    return x[:, perm_j, :].transpose(2, 0, 1).reshape(
                        3 * B, n)

                def unpack(y):
                    return y.reshape(3, B, n).transpose(1, 2, 0)[
                        :, iperm_j, :]

                Pf, Vf = run_b.body(pack(pos), pack(vel), pack(fx),
                                    rb_dev, steps_arr, consts, arrays,
                                    num_iterations)
                return unpack(Pf), unpack(Vf)

            cache[key] = call
        steps_arr = jnp.asarray([[num_steps]], dtype=jnp.int32)
        consts, arrays = run_b.operands
        try:
            self._last_batched_path = "batched-resident"
            return call(self._cast(positions), self._cast(velocities),
                        self._cast(fext), self._cast(rb), steps_arr,
                        consts, arrays, num_iterations=num_iterations)
        except Exception as e:
            import warnings

            warnings.warn("batched resident kernel failed; retrying in "
                          f"slices: {e}")
            self._resident_batched[B] = None
            cache.pop(key, None)
            # a Mosaic failure at the optimistic BATCHED_VMEM_LIMIT gate
            # lands here — serve THIS call in power-of-two slices too
            # (not just subsequent ones) before the vmapped last resort
            return self._run_batched_resident_sliced(
                positions, velocities, fext, tl, per_sim, num_steps,
                num_iterations)

    def _run_batched_resident_chunked(self, positions, velocities, fext,
                                      tl, per_sim, num_steps,
                                      num_iterations):
        """Ensemble serving through the batched CHUNKED affine kernel:
        the whole batch steps as dim-major coefficient state in ONE
        kernel at the affine rate (the big matrices shared, per-sim O(N)
        cost one packed y-row block).  Early exit is whole-batch — the
        kernel stops before the first step where ANY sim would clamp;
        committed steps stand, a bounded window runs on the vmapped
        per-step path, and stepping hands back to the kernel (mirroring
        the single-sim chunked-only tiering in :meth:`run_steps` — each
        loop turn makes >=1 step of progress, so no depth guard is
        needed).  Returns (P', V') as (B, N, 3) device arrays, or None
        when unavailable (caller falls back)."""
        st = getattr(self, "_resident_state", None)
        if st is None:
            return None
        B = int(positions.shape[0])
        run_c = self._build_resident_batched_chunked(B)
        if run_c is None:
            return None
        r = st["r"]
        utst = self._resident_utst
        shared_rb = not (per_sim and utst is not None)
        if utst is not None and tl.size:
            if per_sim:
                rb_full = np.einsum("dre,bted->btdr", utst,
                                    np.asarray(tl, dtype=np.float64))
                rb_full = np.ascontiguousarray(
                    rb_full.transpose(1, 2, 0, 3)).reshape(-1, 3 * B, r)
            else:
                rb_full = np.einsum("dre,ted->tdr", utst,
                                    np.asarray(tl, dtype=np.float64))
        else:
            rb_full = (np.zeros((1, 3, r)) if shared_rb
                       else np.zeros((1, 3 * B, r)))
        # VMEM gate: the chunked kernel stages only the CURRENT chunk's
        # rb rows (an in-loop dynamic_slice of <=rebase_every rows); the
        # full timeline stays in HBM — so the allowance compares the
        # CHUNK bytes, not the window bytes
        T_rb = rb_full.shape[0]
        chunk_bytes = self._chunked_rb_chunk_bytes(
            B, T_rb, r, st["np_dtype"].itemsize)
        if chunk_bytes > self._rb_allowance(
                self.batched_chunked_budget(
                    st, B, floor_exact=self._chunked_floor_exact(
                        st["n"]))):
            return None

        key = ("batched_chunked_call", B, shared_rb)
        cache = getattr(self, "_batched_call_cache", None)
        if cache is None:
            cache = self._batched_call_cache = {}
        call = cache.get(key)
        if call is None:
            perm_j = jnp.asarray(st["perm"])
            iperm_j = jnp.asarray(st["iperm"])
            n = st["n"]

            @partial(jax.jit, static_argnames=("num_iterations",))
            def call(pos, vel, fx, rb_dev, steps_arr, consts, arrays,
                     num_iterations):
                if shared_rb:
                    # (T, 3, r) -> dim-major (T, 3B, r) on device
                    T, _, rr = rb_dev.shape
                    rb_dev = jnp.broadcast_to(
                        rb_dev[:, :, None, :],
                        (T, 3, B, rr)).reshape(T, 3 * B, rr)

                def pack(x):
                    return x[:, perm_j, :].transpose(2, 0, 1).reshape(
                        3 * B, n)

                def unpack(y):
                    return y.reshape(3, B, n).transpose(1, 2, 0)[
                        :, iperm_j, :]

                Pf, Vf, k = run_c.body(pack(pos), pack(vel), pack(fx),
                                       rb_dev, steps_arr, consts,
                                       arrays, num_iterations)
                return unpack(Pf), unpack(Vf), k

            cache[key] = call
        consts, arrays = run_c.operands
        pos = self._cast(positions)
        vel = self._cast(velocities)
        fx = self._cast(fext)
        remaining = int(num_steps)
        t0 = 0
        windows = 0
        window = max(int(getattr(self, "resident_rebase_every",
                                 None) or 1024),
                     -(-int(num_steps) // 64))
        while remaining > 0:
            # resume mid-schedule: the kernel indexes its timeline from
            # row 0 with end-clamp, so re-slice at t0 with clamped
            # indices of FIXED length T_rb (rows past the end repeat the
            # last row = the same clamp; constant shape = one compile)
            idx = np.minimum(np.arange(t0, t0 + T_rb), T_rb - 1)
            steps_arr = jnp.asarray([[remaining]], dtype=jnp.int32)
            try:
                self._last_batched_path = "batched-chunked"
                Pf, Vf, k_arr = call(pos, vel, fx,
                                     self._cast(rb_full[idx]),
                                     steps_arr, consts, arrays,
                                     num_iterations=num_iterations)
                k = int(np.asarray(k_arr)[0, 0])
            except Exception as e:
                import warnings

                warnings.warn("batched chunked kernel failed; falling "
                              f"back: {e}")
                self._resident_batched[("chunked", B)] = None
                cache.pop(key, None)
                return None
            if k > 0:
                pos, vel = Pf, Vf
                t0 += k
                remaining -= k
            if remaining <= 0:
                break
            # whole-batch contact at schedule row t0: bounded per-step
            # window on the vmapped path, then hand back to the kernel
            w = min(remaining, window)
            pos, vel = self._run_batched_vmapped_window(
                pos, vel, fx, tl, per_sim, t0, w, window,
                num_iterations)
            t0 += w
            remaining -= w
            windows += 1
        self._last_batched_path = (
            "batched-chunked" if windows == 0
            else f"batched-chunked+perstep[{windows}w]")
        return pos, vel

    def _run_batched_vmapped_window(self, pos, vel, fx, tl, per_sim,
                                    t0, w, window, num_iterations):
        """Bounded contact window for the batched chunked path: vmap the
        per-step jitted run over the batch for ``w`` steps starting at
        schedule row ``t0``.  The timeline slice is always ``window``
        rows (clamped at the last entry — the kernels' end-clamp
        semantics), so every window reuses one compilation."""
        run_jit = self._run_jit
        if run_jit is None:
            raise RuntimeError("batched serving needs the jitted path; "
                               "call prepare() after set_dirty()")
        T_tl = int(tl.shape[1] if per_sim else tl.shape[0]) or 1
        idx = np.minimum(np.arange(t0, t0 + window), T_tl - 1)
        tl_win = tl[:, idx] if per_sim else tl[idx]
        cache = getattr(self, "_batched_call_cache", None)
        if cache is None:
            cache = self._batched_call_cache = {}
        key = ("vmapped_window", run_jit, per_sim)
        fn = cache.get(key)
        if fn is None:
            if per_sim:
                @partial(jax.jit, static_argnames=("num_iterations",))
                def fn(p, v, f, t, num_steps, num_iterations):
                    return jax.vmap(
                        lambda pp, vv, ff, tt: run_jit(
                            pp, vv, ff, tt, num_steps,
                            num_iterations=num_iterations)
                    )(p, v, f, t)
            else:
                @partial(jax.jit, static_argnames=("num_iterations",))
                def fn(p, v, f, t, num_steps, num_iterations):
                    return jax.vmap(
                        lambda pp, vv, ff: run_jit(
                            pp, vv, ff, t, num_steps,
                            num_iterations=num_iterations)
                    )(p, v, f)
            cache[key] = fn
        return fn(pos, vel, fx, self._cast(tl_win), w,
                  num_iterations=num_iterations)

    def _run_batched_resident_sharded(self, mesh, batch_axis, positions,
                                      velocities, fext, tl, per_sim,
                                      num_steps, num_iterations):
        """Multi-chip ensemble serving on the flagship path: shard the
        batch axis over ``mesh`` and run the BATCHED resident kernel on
        each device's LOCAL shard via ``shard_map`` — pure data-parallel
        serving (no cross-chip collectives in the hot loop; the shared
        bf16 matrices replicate once).  Shared timelines ride replicated
        as ONE (T, 3, r) schedule and broadcast to the local dim-major
        layout in-body; per-sim (B, T, 3, r) schedules shard with the
        batch.  Returns None when unavailable (no resident state, batch
        not divisible by the mesh axis, local batch over the VMEM gate,
        or a kernel failure) — the caller falls back to the vmapped XLA
        path."""
        st = getattr(self, "_resident_state", None)
        if st is None or getattr(self, "_resident", None) is None:
            return None
        n_dev = int(mesh.shape[batch_axis])
        B = int(positions.shape[0])
        if n_dev <= 0 or B % n_dev != 0:
            return None
        Bl = B // n_dev
        run_b = self._build_resident_batched(Bl)
        if run_b is None:
            # LARGE models (chunked tier regimes) go to the sharded
            # batched CHUNKED kernel first — the group recursion below
            # degenerates (or fails outright) for them exactly as the
            # single-chip sliced path does
            big = (st["n"] >= self.CHUNKED_TIER1_MIN_VERTS
                   or getattr(self, "_resident_kind", "")
                   == "chunked-only")
            if big:
                out = self._run_batched_resident_chunked_sharded(
                    mesh, batch_axis, positions, velocities, fext, tl,
                    per_sim, num_steps, num_iterations)
                if out is not None:
                    return out
            # per-device batch over the VMEM gate: serve the ensemble in
            # smaller mesh-sharded GROUPS (bl = largest power-of-two
            # per-device sub-batch that fits AND divides Bl; each group
            # is bl*n_dev sims through the recursion below) — flagship
            # rate in a few sequential sharded dispatches instead of the
            # ~25x slower vmapped path, mirroring the single-chip
            # _run_batched_resident_sliced fallback
            bl = 1 << (max(Bl - 1, 1).bit_length() - 1)  # largest pow2 < Bl
            while bl >= 1 and (Bl % bl != 0
                               or self._build_resident_batched(bl)
                               is None):
                bl //= 2
            if bl < 1:
                if big:
                    return None          # chunked already tried above
                return self._run_batched_resident_chunked_sharded(
                    mesh, batch_axis, positions, velocities, fext, tl,
                    per_sim, num_steps, num_iterations)
            Bg = bl * n_dev
            p_parts, v_parts = [], []
            for s in range(0, B, Bg):
                tl_g = tl[s:s + Bg] if per_sim else tl
                out = self._run_batched_resident_sharded(
                    mesh, batch_axis, positions[s:s + Bg],
                    velocities[s:s + Bg], fext[s:s + Bg], tl_g, per_sim,
                    num_steps, num_iterations)
                if out is None:
                    return None
                p_parts.append(out[0])
                v_parts.append(out[1])
            self._last_batched_path = (
                f"batched-resident-sharded-sliced[{n_dev}x{bl}"
                f"x{len(p_parts)}g]")
            return (jnp.concatenate(p_parts, axis=0),
                    jnp.concatenate(v_parts, axis=0))
        r = st["r"]
        utst = self._resident_utst
        shared_rb = not (per_sim and utst is not None)
        if utst is not None and tl.size:
            if per_sim:
                rb = np.einsum("dre,bted->btdr", utst,
                               np.asarray(tl, dtype=np.float64))
            else:
                rb = np.einsum("dre,ted->tdr", utst,
                               np.asarray(tl, dtype=np.float64))
        else:
            rb = np.zeros((1, 3, r))
        # gate on the per-DEVICE size the kernel actually consumes, at
        # the DEVICE itemsize (rb is f64 on host, f32 on device)
        rb_dev_bytes = (rb.size * Bl if shared_rb
                        else rb.size // n_dev) * st["np_dtype"].itemsize
        if rb_dev_bytes > self._rb_allowance(self.batched_resident_budget(
                st, Bl, self.model.floor_collision)):
            return None

        key = ("batched_call_sharded", B, n_dev, shared_rb, batch_axis,
               mesh)
        cache = getattr(self, "_batched_call_cache", None)
        if cache is None:
            cache = self._batched_call_cache = {}
        call = cache.get(key, "miss")
        if call is None:                 # poisoned by an earlier failure
            return None
        if call == "miss":
            try:
                from jax import shard_map
            except ImportError:
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            perm_j = jnp.asarray(st["perm"])
            iperm_j = jnp.asarray(st["iperm"])
            n = st["n"]
            ax = batch_axis
            rb_spec = P() if shared_rb else P(ax)

            @partial(jax.jit, static_argnames=("num_iterations",))
            def call(pos, vel, fx, rb_dev, steps_arr, consts, arrays,
                     num_iterations):
                def body(pos, vel, fx, rb_dev, steps_arr, consts,
                         arrays):
                    # local shard: pos/vel/fx (Bl, N, 3)
                    if shared_rb:
                        T, _, rr = rb_dev.shape
                        rb_l = jnp.broadcast_to(
                            rb_dev[:, :, None, :],
                            (T, 3, Bl, rr)).reshape(T, 3 * Bl, rr)
                    else:                # (Bl, T, 3, r) -> (T, 3Bl, r)
                        rb_l = rb_dev.transpose(1, 2, 0, 3).reshape(
                            rb_dev.shape[1], 3 * Bl, rb_dev.shape[-1])

                    def pack(x):
                        return x[:, perm_j, :].transpose(
                            2, 0, 1).reshape(3 * Bl, n)

                    def unpack(y):
                        return y.reshape(3, Bl, n).transpose(1, 2, 0)[
                            :, iperm_j, :]

                    Pf, Vf = run_b.body(pack(pos), pack(vel), pack(fx),
                                        rb_l, steps_arr, consts, arrays,
                                        num_iterations)
                    return unpack(Pf), unpack(Vf)

                # check_vma=False: the pallas_call inside the body can't
                # declare its varying-mesh-axes type, and the body is
                # purely local (no collectives) so the check adds nothing
                kw = dict(mesh=mesh,
                          in_specs=(P(ax), P(ax), P(ax), rb_spec, P(),
                                    P(), P()),
                          out_specs=(P(ax), P(ax)))
                try:
                    smap = shard_map(body, check_vma=False, **kw)
                except TypeError:   # older jax spells it check_rep
                    smap = shard_map(body, check_rep=False, **kw)
                return smap(pos, vel, fx, rb_dev, steps_arr, consts,
                            arrays)

            cache[key] = call
        steps_arr = jnp.asarray([[num_steps]], dtype=jnp.int32)
        consts, arrays = run_b.operands
        try:
            out = call(self._cast(positions), self._cast(velocities),
                       self._cast(fext), self._cast(rb), steps_arr,
                       consts, arrays, num_iterations=num_iterations)
            self._last_batched_path = (
                f"batched-resident-sharded[{n_dev}x{Bl}]")
            return out
        except Exception as e:
            import warnings

            warnings.warn("sharded batched resident kernel failed; "
                          f"falling back to the vmapped path: {e}")
            cache[key] = None
            return None

    def _run_batched_resident_chunked_sharded(self, mesh, batch_axis,
                                              positions, velocities,
                                              fext, tl, per_sim,
                                              num_steps, num_iterations):
        """Multi-chip ensemble serving of BIG models: shard the batch
        over ``mesh`` and run the batched CHUNKED kernel on each
        device's LOCAL shard via ``shard_map`` (pure data-parallel, the
        shared matrices replicate once).

        The chunked kernel's early exit is per-shard, so a contact on
        one device would desynchronize the ensemble.  The driver keeps
        lockstep with probe-and-retry: run all shards for the remaining
        budget and gather the per-shard completed counts k_i; if every
        shard served the SAME count, commit it; otherwise DISCARD the
        probe and re-run with the agreed budget min(k_i) — the chunked
        kernel is deterministic, so the shorter run is itself an exact
        serve (it is NOT required to match the discarded probe's
        prefix, which had different rebase boundaries).  Contact then
        falls to a bounded per-step vmapped window before handing back,
        exactly like the single-chip chunked driver; the retry cap only
        costs throughput, never correctness (the window guarantees
        progress).  Returns global (B, N, 3) arrays or None."""
        st = getattr(self, "_resident_state", None)
        if st is None:
            return None
        n_dev = int(mesh.shape[batch_axis])
        B = int(positions.shape[0])
        if n_dev <= 0 or B % n_dev != 0:
            return None
        Bl = B // n_dev
        run_c = self._build_resident_batched_chunked(Bl)
        if run_c is None:
            return None
        r = st["r"]
        utst = self._resident_utst
        shared_rb = not (per_sim and utst is not None)
        if utst is not None and tl.size:
            if per_sim:
                rb_full = np.einsum("dre,bted->btdr", utst,
                                    np.asarray(tl, dtype=np.float64))
            else:
                rb_full = np.einsum("dre,ted->tdr", utst,
                                    np.asarray(tl, dtype=np.float64))
        else:
            rb_full = (np.zeros((1, 3, r)) if shared_rb
                       else np.zeros((B, 1, 3, r)))
        # time-axis length: per-sim schedules are (B, T, 3, r), shared
        # ones (incl. the per_sim-requested-but-no-positional-group case,
        # where rb_full is the shared (1, 3, r) zeros) are (T, 3, r) —
        # branch on shared_rb, not per_sim, so the re-slice below never
        # indexes the dimension axis
        T_rb = rb_full.shape[0] if shared_rb else rb_full.shape[1]
        # per-DEVICE staged chunk bytes (see the single-chip variant)
        chunk_bytes = self._chunked_rb_chunk_bytes(
            Bl, T_rb, r, st["np_dtype"].itemsize)
        if chunk_bytes > self._rb_allowance(
                self.batched_chunked_budget(
                    st, Bl, floor_exact=self._chunked_floor_exact(
                        st["n"]))):
            return None

        key = ("batched_chunked_call_sharded", B, n_dev, shared_rb,
               batch_axis, mesh)
        cache = getattr(self, "_batched_call_cache", None)
        if cache is None:
            cache = self._batched_call_cache = {}
        call = cache.get(key)
        if call is None:
            try:
                from jax import shard_map
            except ImportError:
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            perm_j = jnp.asarray(st["perm"])
            iperm_j = jnp.asarray(st["iperm"])
            n = st["n"]
            ax = batch_axis
            rb_spec = P() if shared_rb else P(ax)

            @partial(jax.jit, static_argnames=("num_iterations",))
            def call(pos, vel, fx, rb_dev, steps_arr, consts, arrays,
                     num_iterations):
                def body(pos, vel, fx, rb_dev, steps_arr, consts,
                         arrays):
                    # local shard: pos/vel/fx (Bl, N, 3)
                    if shared_rb:
                        T, _, rr = rb_dev.shape
                        rb_l = jnp.broadcast_to(
                            rb_dev[:, :, None, :],
                            (T, 3, Bl, rr)).reshape(T, 3 * Bl, rr)
                    else:                # (Bl, T, 3, r) -> (T, 3Bl, r)
                        rb_l = rb_dev.transpose(1, 2, 0, 3).reshape(
                            rb_dev.shape[1], 3 * Bl, rb_dev.shape[-1])

                    def pack(x):
                        return x[:, perm_j, :].transpose(
                            2, 0, 1).reshape(3 * Bl, n)

                    def unpack(y):
                        return y.reshape(3, Bl, n).transpose(1, 2, 0)[
                            :, iperm_j, :]

                    Pf, Vf, k = run_c.body(
                        pack(pos), pack(vel), pack(fx), rb_l,
                        steps_arr, consts, arrays, num_iterations)
                    return unpack(Pf), unpack(Vf), k

                kw = dict(mesh=mesh,
                          in_specs=(P(ax), P(ax), P(ax), rb_spec, P(),
                                    P(), P()),
                          out_specs=(P(ax), P(ax), P(ax)))
                try:
                    smap = shard_map(body, check_vma=False, **kw)
                except TypeError:   # older jax spells it check_rep
                    smap = shard_map(body, check_rep=False, **kw)
                return smap(pos, vel, fx, rb_dev, steps_arr, consts,
                            arrays)

            cache[key] = call
        consts, arrays = run_c.operands
        pos = self._cast(positions)
        vel = self._cast(velocities)
        fx = self._cast(fext)
        remaining = int(num_steps)
        t0 = 0
        windows = 0
        window = max(int(getattr(self, "resident_rebase_every",
                                 None) or 1024),
                     -(-int(num_steps) // 64))
        # contact-heavy scenes: a shard clamping near step 1 would make
        # every full-budget probe discard an up-to-remaining-step run.
        # After a desync, start subsequent probes at the last agreed
        # count (never below the rebase cadence) and DOUBLE it on every
        # clean full-budget serve, so a recovered ensemble climbs back
        # to whole-call probes within a few turns.
        probe_cap = None
        cadence = self._chunked_rebase_every(st["n"])
        while remaining > 0:
            # resume at schedule row t0: clamped fixed-length re-slice
            # (same semantics/compile-stability as the local variant)
            idx = np.minimum(np.arange(t0, t0 + T_rb), T_rb - 1)
            rb_win = rb_full[idx] if shared_rb else rb_full[:, idx]
            rb_dev = self._cast(rb_win)
            budget = (remaining if probe_cap is None
                      else min(remaining, max(probe_cap, cadence)))
            for _ in range(4):            # probe + up to 3 re-probes
                steps_arr = jnp.asarray([[budget]], dtype=jnp.int32)
                try:
                    Pf, Vf, ks = call(pos, vel, fx, rb_dev, steps_arr,
                                      consts, arrays,
                                      num_iterations=num_iterations)
                    ks = np.asarray(ks).ravel()
                except Exception as e:
                    import warnings

                    warnings.warn("sharded batched chunked kernel "
                                  f"failed; falling back: {e}")
                    self._resident_batched[("chunked", Bl)] = None
                    cache.pop(key, None)
                    return None
                kmin = int(ks.min())
                if kmin > 0 and (ks == kmin).all():
                    # every shard served exactly kmin steps — an exact,
                    # committable serve (full budget or lockstep stop)
                    pos, vel = Pf, Vf
                    t0 += kmin
                    remaining -= kmin
                    if probe_cap is not None and kmin == budget:
                        probe_cap = budget * 2
                    break
                if kmin == 0:
                    break                 # step-0 contact: window below
                budget = kmin             # desynchronized: agree + retry
                probe_cap = kmin
            if remaining <= 0:
                break
            # contact (or retry cap): bounded per-step window, hand back
            w = min(remaining, window)
            pos, vel = self._run_batched_vmapped_window(
                pos, vel, fx, tl, per_sim, t0, w, window,
                num_iterations)
            t0 += w
            remaining -= w
            windows += 1
        self._last_batched_path = (
            f"batched-chunked-sharded[{n_dev}x{Bl}]" if windows == 0
            else f"batched-chunked-sharded[{n_dev}x{Bl}]"
                 f"+perstep[{windows}w]")
        return pos, vel

    def _run_batched_resident_sliced(self, positions, velocities, fext,
                                     tl, per_sim, num_steps,
                                     num_iterations):
        """Serve an over-VMEM-gate batch in resident-kernel-sized slices,
        all fused into ONE jit per chunk: the largest power-of-two
        sub-batch whose batched kernel fits runs each group as a separate
        pallas_call INSIDE the same jit (XLA dedupes the identical kernel
        bodies; slicing, final-group padding, and the output concatenate
        are in-jit too), so a chunk costs one host dispatch regardless of
        group count.  Slicing with per-group EAGER dispatches cost ~100 ms
        of tunnel latency per device op — 128 sims served at 2.98M
        aggregate steps/s where the fused form serves at the flagship
        rate.  Returns None when no sub-batch fits (caller falls back);
        a dispatch failure poisons the sub-batch size and retries with a
        smaller one."""
        st = getattr(self, "_resident_state", None)
        if st is None:
            return None
        B = int(positions.shape[0])
        # the fused context needs VMEM headroom beyond the standalone
        # batched gate: XLA overlaps the NEXT group's operand staging
        # (async copies of the shared matrices) with the current group's
        # kernel, so a sub-batch that compiles standalone can OOM scoped
        # VMEM here (measured: the 72 MB-estimate 64-sim kernel needed
        # 113.4 MB fused vs <100 MB standalone)
        limit = (getattr(self, "resident_batched_vmem_limit",
                         self.BATCHED_VMEM_LIMIT)
                 - self.FUSED_SLICE_VMEM_MARGIN)
        bad = getattr(self, "_sliced_bs_bad", None)
        if bad is None:
            bad = self._sliced_bs_bad = set()
        bs = 1 << (max(B - 1, 1).bit_length() - 1)   # largest pow2 < B
        while bs >= 1 and (
                bs in bad
                or self.batched_resident_budget(
                    st, bs, self.model.floor_collision) > limit
                or self._build_resident_batched(bs) is None):
            bs //= 2
        if bs < 1 or bs >= B:
            return None
        run_b = self._build_resident_batched(bs)
        G = -(-B // bs)
        Bp = G * bs
        pad = Bp - B
        r = st["r"]
        utst = self._resident_utst
        shared_rb = not (per_sim and utst is not None)
        if utst is not None and tl.size:
            if per_sim:
                tlp = (np.concatenate([tl, np.repeat(tl[-1:], pad,
                                                     axis=0)])
                       if pad else tl)
                rb = np.einsum("dre,bted->btdr", utst,
                               np.asarray(tlp, dtype=np.float64))
            else:
                rb = np.einsum("dre,ted->tdr", utst,
                               np.asarray(tl, dtype=np.float64))
        else:
            rb = np.zeros((1, 3, r))
        # gate on the per-GROUP expanded size, at the device itemsize
        rb_group_bytes = (rb.size * bs if shared_rb
                          else rb.size // G) * st["np_dtype"].itemsize
        if rb_group_bytes > self._rb_allowance(self.batched_resident_budget(
                st, bs, self.model.floor_collision)):
            return None

        key = ("batched_call_sliced", B, bs, shared_rb)
        cache = getattr(self, "_batched_call_cache", None)
        if cache is None:
            cache = self._batched_call_cache = {}
        call = cache.get(key)
        if call is None:
            perm_j = jnp.asarray(st["perm"])
            iperm_j = jnp.asarray(st["iperm"])
            n = st["n"]

            @partial(jax.jit, static_argnames=("num_iterations",))
            def call(pos, vel, fx, rb_dev, steps_arr, consts, arrays,
                     num_iterations):
                def padb(x):
                    if not pad:
                        return x
                    return jnp.concatenate(
                        [x, jnp.repeat(x[-1:], pad, axis=0)])

                pos, vel, fx = padb(pos), padb(vel), padb(fx)
                if shared_rb:
                    T, _, rr = rb_dev.shape
                    rb_g = jnp.broadcast_to(
                        rb_dev[:, :, None, :],
                        (T, 3, bs, rr)).reshape(T, 3 * bs, rr)
                p_parts, v_parts = [], []
                for g in range(G):
                    sl = slice(g * bs, (g + 1) * bs)

                    def pack(x):
                        return x[sl][:, perm_j, :].transpose(
                            2, 0, 1).reshape(3 * bs, n)

                    if not shared_rb:    # (Bp, T, 3, r) -> (T, 3bs, r)
                        rb_g = rb_dev[sl].transpose(1, 2, 0, 3).reshape(
                            rb_dev.shape[1], 3 * bs, rb_dev.shape[-1])
                    Pf, Vf = run_b.body(pack(pos), pack(vel), pack(fx),
                                        rb_g, steps_arr, consts, arrays,
                                        num_iterations)

                    def unpack(y):
                        return y.reshape(3, bs, n).transpose(1, 2, 0)[
                            :, iperm_j, :]

                    p_parts.append(unpack(Pf))
                    v_parts.append(unpack(Vf))
                return (jnp.concatenate(p_parts)[:B],
                        jnp.concatenate(v_parts)[:B])

            cache[key] = call
        steps_arr = jnp.asarray([[num_steps]], dtype=jnp.int32)
        consts, arrays = run_b.operands
        try:
            out = call(self._cast(positions), self._cast(velocities),
                       self._cast(fext), self._cast(rb), steps_arr,
                       consts, arrays, num_iterations=num_iterations)
        except Exception as e:
            import warnings

            warnings.warn("fused sliced serving failed for sub-batch "
                          f"{bs}; retrying smaller slices: {e}")
            # mark bs bad for the SLICED context only — the standalone
            # batched kernel at this size may still be fine (the fused
            # module carries extra staging pressure), so don't poison
            # _resident_batched[bs]
            bad.add(bs)
            cache.pop(key, None)
            return self._run_batched_resident_sliced(
                positions, velocities, fext, tl, per_sim, num_steps,
                num_iterations)
        self._last_batched_path = f"batched-resident-sliced[{bs}x{G}]"
        return out

    def _targets_timeline_from(self, start_frame, num_steps):
        from animsnapbases_tpu.sim.solver import positional_targets_timeline

        return positional_targets_timeline(self.model, start_frame,
                                           num_steps)

    def _targets_timeline(self, num_steps):
        """(T, e, 3) positional-target timeline for the next ``num_steps``
        frames — see :func:`solver.positional_targets_timeline`."""
        from animsnapbases_tpu.sim.solver import positional_targets_timeline

        return positional_targets_timeline(self.model, self.frame,
                                           num_steps)

    def _rb_window_host(self, start, length):
        """(length, 3, r) rb timeline rows for absolute frames
        [start, start+length), on host.

        ``rb[t, d] = (U^T S^T)_d @ targets(t)[:, d]`` decomposes into a
        static term plus, per ``user_defined`` constraint i, a rank-1 term
        ``shift_i[t, d] * utst[d, :, i]`` — built from the tiny (T_i, 3)
        shift arrays in O(length·r) per constraint, instead of a
        (T, e, 3) host einsum (which capped the animated poke path at
        ~9k steps/s over the tunnel)."""
        utst = self._resident_utst                       # (3, r, e_pos)
        model = self.model
        p0 = np.asarray(model.groups["positional"].data["p0"], dtype=float)
        rb_static = np.einsum("dre,ed->dr", utst, p0)    # (3, r)
        rb = np.repeat(rb_static[None], length, axis=0)  # (length, 3, r)
        t_idx = start + np.arange(length)
        for i, c in enumerate(model._positional):
            if (c["motion_type"] == "user_defined"
                    and c["frame_shift"] is not None):
                sh = np.asarray(c["frame_shift"], dtype=float)
                shf = sh[np.minimum(t_idx, len(sh) - 1)]  # (length, 3)
                rb += shf[:, :, None] * utst[None, :, :, i]
        return rb

    def _rb_schedule_length(self):
        return max((len(c["frame_shift"]) for c in self.model._positional
                    if c["motion_type"] == "user_defined"
                    and c["frame_shift"] is not None), default=0)

    def _run_steps_recorded(self, fext, num_steps, num_iterations):
        """One-dispatch stepping with an on-device (T, N, 3) trajectory
        buffer (pow2-capped so compilations are reused across lengths)."""
        model = self.model
        targets_tl, _ = self._targets_timeline(num_steps)
        t_cap = 1 << max(num_steps - 1, 0).bit_length()
        if getattr(self, "_record_scan", None) is None:
            core = self._step_jit
            dt = self.dt
            dt2 = dt * dt
            dtv = dt * getattr(self, "eta", 1.0)
            mass = self._cast(model.mass)
            floor = model.floor_collision
            floor_h = model.floor_height

            @partial(jax.jit, static_argnames=("num_iterations", "t_cap"))
            def run_rec(p, v, f, targets_seq, num_steps, num_iterations,
                        t_cap):
                T = targets_seq.shape[0]
                buf = jnp.zeros((t_cap,) + p.shape, dtype=p.dtype)
                corr0 = jnp.zeros_like(p)

                def body(i, carry):
                    p, v, buf, _ = carry
                    t = jnp.minimum(i, T - 1)
                    # last step's floor correction (raw - clamped
                    # predictor), same convention as step() /
                    # resolve_floor_collision
                    if floor:
                        sn_y = (p[:, 1] + dtv * v[:, 1]
                                + dt2 * f[:, 1] / mass)
                        corr = corr0.at[:, 1].set(
                            jnp.minimum(sn_y - floor_h, 0.0))
                    else:
                        corr = corr0
                    p2, v2 = core(p, v, f, targets_seq[t],
                                  num_iterations=num_iterations)
                    buf = jax.lax.dynamic_update_index_in_dim(buf, p2, i, 0)
                    return p2, v2, buf, corr

                p, v, buf, corr = jax.lax.fori_loop(
                    0, num_steps, body, (p, v, buf, corr0))
                return p, v, buf, corr

            self._record_scan = run_rec
        p, v, buf, corr = self._record_scan(
            self._cast(model.positions), self._cast(model.velocities),
            self._cast(fext), self._cast(targets_tl), num_steps,
            num_iterations=num_iterations, t_cap=t_cap)
        from animsnapbases_tpu.utils.transfer import to_host_chunked

        traj = np.asarray(to_host_chunked(buf[:num_steps]))
        model.positions = np.asarray(p, dtype=float)
        model.velocities = np.asarray(v, dtype=float)
        if model.floor_collision:
            model.positions_corrections = np.asarray(corr, dtype=float)
        self.frame += num_steps
        return traj

    # a per-call rb timeline larger than this skips the resident kernel
    # for that call (the kernel holds the window in VMEM: operand budget
    # <= 48 MB + window <= 32 MB + staging stays under the 100 MB scoped
    # limit)
    RESIDENT_RB_SEQ_LIMIT = 4 * (1 << 20)
    # full schedules larger than this stay on host (windows are built per
    # call and shipped with it) instead of being uploaded to HBM once.
    # 256 MB = ~900k frames at r=64 — a one-time multi-second upload,
    # cheaper than per-chunk window uploads for any schedule that long;
    # only unbounded scripted trajectories stay host-side.
    RB_SCHED_DEVICE_LIMIT = 256 * (1 << 20)

    def _self_collision_clearance(self) -> float:
        """Current min vertex-to-non-own-triangle distance over the
        device pass's own candidate set (one jitted dispatch)."""
        from animsnapbases_tpu.sim.collisions_device import (
            min_clearance_device,
        )

        faces = self.model.faces
        cached = getattr(self, "_clearance_jit", None)
        if cached is None or cached[0] is not faces:
            import jax

            faces_j = jnp.asarray(faces)
            fn = jax.jit(lambda q: min_clearance_device(q, faces_j))
            self._clearance_jit = cached = (faces, fn)
        return float(cached[1](self._cast(self.model.positions)))

    def _sc_fused_runner(self):
        """ONE-jit device loop for self-collision serving: clearance
        probe -> certified window on the tier-1 resident kernel ->
        re-probe, all inside a ``lax.while_loop`` (fusing through
        ``run.raw``) — per-window host round trips (~100 ms each over
        the tunnel) would otherwise dominate the certified windows.
        Returns ``fn(P, V, Fx, rb, total, num_iterations) -> (P', V',
        done)`` on packed (3, N) state, stopping at the first window the
        certificate can't admit (proximity) or the kernel exits early
        (floor contact); cached per prepare (``False`` = a previous
        dispatch Mosaic-failed; don't rebuild)."""
        cached = getattr(self, "_sc_fused", None)
        if cached is not None:
            return cached or None
        fast = getattr(self, "_resident_fast", None)
        res = getattr(self, "_resident", None)
        if fast is None or res is None:
            return None
        import jax

        from animsnapbases_tpu.sim.collisions_device import (
            min_clearance_device,
            min_clearance_lower_bound_device,
        )

        _, perm, iperm = res
        # P rows are PERMUTED vertex order: remap faces so the probe
        # gathers the right rows (distances are permutation-invariant)
        faces_j = jnp.asarray(iperm[np.asarray(self.model.faces)])
        min_dist = float(getattr(self, "self_collision_min_dist", 0.001))
        cap = float(getattr(self, "self_collision_window_cap", 4096))
        # staleness guard (r4 advisor finding): the carried budget
        # iterates the 2x-velocity-growth HEURISTIC — if it (rather than
        # the sound fresh lower bound) keeps admitting windows, a
        # heuristic violation could otherwise survive indefinitely.
        # Force the exact probe after K consecutive budget-admitted
        # windows so a miss is bounded to K windows.
        max_carry = int(getattr(self, "self_collision_budget_windows", 8))
        dt = self.dt

        def loop(P0, V0, Fx, rb, total, consts, arrays, num_iterations):
            dtype = P0.dtype

            def cond(c):
                _, _, done, stop, _, _ = c
                return jnp.logical_and(done < total,
                                       jnp.logical_not(stop))

            def body(c):
                P, V, done, _, budget, nb = c
                Pt = P.T.astype(jnp.float32)
                # clearance BUDGET carried across windows: the exact
                # top_k probe costs ~28 ms on an 80x80 cloth (it was
                # ~20% of sc serving when re-run every window), so each
                # window instead (a) decrements the budget by its own
                # kinematic consumption bound w*denom (the same 4x
                # safety the window length is solved from — budget-carry
                # is just that bound iterated), and (b) refreshes it
                # with the ~17x-cheaper centroid-radius lower bound
                # (sound: bound <= exact distance pair-wise).  The exact
                # probe runs when both leave the budget under one step —
                # and every `max_carry` consecutive budget-admitted
                # windows (see above) — and is then authoritative for
                # the stop (proximity) decision.
                bound = (min_clearance_lower_bound_device(Pt, faces_j)
                         - min_dist).astype(dtype)
                carried = budget
                budget = jnp.maximum(budget, bound)
                vmax = jnp.sqrt((V * V).sum(axis=0)).max()
                denom = 4.0 * dt * jnp.maximum(vmax, 1e-12)
                need_exact = jnp.logical_or(budget < denom,
                                            nb >= max_carry)
                clearance = jax.lax.cond(
                    need_exact,
                    lambda p: (min_clearance_device(p, faces_j)
                               - min_dist).astype(dtype),
                    lambda p: budget,
                    Pt)
                # count consecutive windows where the CARRIED term (the
                # heuristic) is what admitted, not the fresh sound bound
                by_carry = jnp.logical_and(jnp.logical_not(need_exact),
                                           carried > bound)
                nb = jnp.where(need_exact, 0,
                               jnp.where(by_carry, nb + 1, 0))
                w = jnp.floor(clearance / denom)
                w = jnp.clip(jnp.nan_to_num(w, nan=0.0), 0.0, cap)
                w = jnp.minimum(w.astype(jnp.int32),
                                (total - done).astype(jnp.int32))
                stop = w < 1
                steps_arr = jnp.maximum(w, 0).reshape(1, 1)
                # w=0 runs the kernel as an exact identity (k=0)
                P2, V2, k = fast.body(P, V, Fx, rb, steps_arr,
                                      consts, arrays, num_iterations)
                k = k[0, 0]
                budget = (clearance
                          - k.astype(dtype) * denom).astype(dtype)
                # an in-window early exit (floor contact) also hands
                # control back to the host tiers
                return (P2, V2, done + k,
                        jnp.logical_or(stop, k < w), budget, nb)

            P, V, done, _, _, _ = jax.lax.while_loop(
                cond, body,
                (P0, V0, jnp.zeros((), dtype=jnp.int32),
                 jnp.zeros((), dtype=bool),
                 jnp.zeros((), dtype=dtype),
                 jnp.zeros((), dtype=jnp.int32)))
            return P, V, done

        # the kernel's const operands (multi-MB (3, r, N) matrices) must
        # be TRACED args of this jit, not closure constants — baking
        # them in embeds them in the HLO (slow lowering, bloated
        # persistent-cache entries, cache key varies with values); see
        # the run.body/run.operands note in ops/pallas_resident.py
        jitted = jax.jit(loop, static_argnames=("num_iterations",))
        consts, arrays = fast.operands

        def call(P0, V0, Fx, rb, total, num_iterations):
            return jitted(P0, V0, Fx, rb, total, consts, arrays,
                          num_iterations=num_iterations)

        self._sc_fused = call
        return self._sc_fused

    def _run_steps_self_collision(self, fext, num_steps, num_iterations):
        """Proximity-gated RESIDENT serving under the device
        self-collision pass (ref Constraint_projections.py:1311-1419
        resolves per step on the host; the device pass fuses into the
        per-step jit, but both force the slow path for entire runs).

        The pass is the IDENTITY while every vertex stays >= min_dist
        from every non-own candidate triangle, so stretches certified
        clear can skip it and run the resident tiers untouched — the
        window length is chosen so the certificate plausibly holds
        throughout: with per-step displacement dt*||v_end|| (symplectic
        Euler: q_{n+1}-q_n = dt*v_{n+1}), a clearance c admits ~c /
        (4*dt*vmax) steps (2x for two approaching sides, 2x for
        velocity growth over the window).  This is a conservative
        HEURISTIC, not a proof — velocities can grow faster under
        strong forcing — so clearance is re-checked at every window
        boundary and windows are capped.  The fused loop carries a
        clearance BUDGET between windows (decremented by each window's
        own kinematic consumption bound, refreshed with the cheap
        centroid-radius lower bound) so the expensive exact top_k probe
        runs only when the budget is exhausted — ~28 ms per probe made
        per-window probing ~20% of sc serving.  Scenes that need the
        pass every step set ``self_collision_resident = False`` to
        restore
        the exact per-step serving.  Proximity regimes (clearance at or
        under min_dist) run the per-step jit (pass included) in bounded
        windows and hand back as soon as a probe says clear.

        Non-animated calls run probe+window fused ON DEVICE
        (:meth:`_sc_fused_runner`); animated schedules take the
        host-window path below (one nested ``run_steps`` per window)
        so the rb machinery stays in charge of frame advance."""
        model = self.model
        min_dist = float(getattr(self, "self_collision_min_dist", 0.001))
        cap = int(getattr(self, "self_collision_window_cap", 4096))
        contact_w = int(getattr(self, "self_collision_contact_window",
                                64))
        animated = any(
            c["motion_type"] == "user_defined"
            and c["frame_shift"] is not None
            and len(c["frame_shift"]) > self.frame
            for c in getattr(model, "_positional", []))
        fused = None if animated else self._sc_fused_runner()
        tier1 = 0
        remaining = num_steps
        self._in_sc_window = True
        try:
            while remaining > 0:
                if fused is not None:
                    _, perm, iperm = self._resident
                    r = self.U.shape[1]
                    if self._resident_utst is not None:
                        rb = np.einsum(
                            "dre,ted->tdr", self._resident_utst,
                            np.asarray(model.positional_targets(
                                self.frame))[None])
                    else:
                        rb = np.zeros((1, 3, r))
                    P = self._cast(np.ascontiguousarray(
                        model.positions[perm].T))
                    V = self._cast(np.ascontiguousarray(
                        model.velocities[perm].T))
                    Fx = self._cast(np.ascontiguousarray(
                        np.asarray(fext)[perm].T))
                    try:
                        Pf, Vf, done = fused(
                            P, V, Fx, self._cast(rb),
                            jnp.asarray(remaining, dtype=jnp.int32),
                            num_iterations=num_iterations)
                        done = int(done)
                    except Exception as e:
                        # a Mosaic compile rejection must downgrade like
                        # every other tier-1 call site, not crash the run
                        import warnings

                        warnings.warn(
                            "fused self-collision loop failed; serving "
                            f"via host-probed windows: {e}")
                        self._sc_fused = False   # don't rebuild/retry
                        fused = None
                        continue
                    model.positions = np.asarray(
                        Pf, dtype=float).T[iperm]
                    model.velocities = np.asarray(
                        Vf, dtype=float).T[iperm]
                    self.frame += done
                    tier1 += done
                    remaining -= done
                    if remaining <= 0:
                        break
                    # stopped: proximity regime (or a floor exit) —
                    # fall through to a bounded per-step window
                else:
                    clearance = (self._self_collision_clearance()
                                 - min_dist)
                    w = 0
                    if clearance > 0:
                        vmax = float(np.linalg.norm(model.velocities,
                                                    axis=1).max())
                        w = int(clearance
                                / (4.0 * self.dt * max(vmax, 1e-12)))
                    if w >= 1:
                        w = min(w, cap, remaining)
                        flag = self.enable_self_collision
                        self.enable_self_collision = False
                        try:
                            self.run_steps(fext, w, num_iterations)
                        finally:
                            self.enable_self_collision = flag
                        if self._last_fast_steps:
                            tier1 += self._last_fast_steps
                        remaining -= w
                        continue
                # proximity regime: the per-step jit (pass fused)
                # serves a bounded window, then re-probes
                w = min(contact_w, remaining)
                targets_tl, _ = self._targets_timeline(w)
                p, v = self._run_jit(
                    self._cast(model.positions),
                    self._cast(model.velocities), self._cast(fext),
                    self._cast(targets_tl), num_steps=w,
                    num_iterations=num_iterations)
                model.positions = np.asarray(p)
                model.velocities = np.asarray(v)
                self.frame += w
                remaining -= w
        finally:
            self._in_sc_window = False
        # whole-call certificate semantics match run_steps: set only
        # when tier 1 covered EVERY step of the call
        self._last_fast_steps = tier1 if tier1 == num_steps else None

    def run_steps(self, fext, num_steps, num_iterations=10, record=False):
        """Advance ``num_steps`` steps fully on device (single dispatch).
        Animated positional targets (``user_defined`` frame shifts, e.g.
        the poke scenarios, ref calbacks.py:824-839) are exact: the
        per-frame target timeline ships to the device with the call.

        With ``record=True``, the (num_steps, N, 3) per-frame position
        trajectory is captured ON DEVICE (pow2-capped ring buffer, so
        compilations are reused across chunk lengths) and returned —
        replays that export every frame (workflow steps 3-4) pay one
        dispatch + one pull instead of a host round trip per frame."""
        # whole-window contact proof (see the tier-1 block below): reset
        # at METHOD entry so a non-tier-1 path can never leave a stale
        # certificate from an earlier call
        self._last_fast_steps = None
        if self._run_jit is None or self.enable_self_collision is True or (
                self.enable_self_collision == "device"
                and self._collision_mode != "device"):
            # host resolvers (or an un-captured device pass) need the
            # per-step loop
            traj = []
            for _ in range(num_steps):
                self.step(fext, num_iterations)
                if record:
                    traj.append(self.model.positions.copy())
            return np.array(traj) if record else None
        if record:
            recordable = any(name not in self._reduced_groups
                             and name != "positional"
                             for name in self.model.groups)
            if self.store_stacked_projections and recordable:
                # p-snapshot recording of full groups runs through step()
                traj = []
                for _ in range(num_steps):
                    self.step(fext, num_iterations)
                    traj.append(self.model.positions.copy())
                return np.array(traj)
            return self._run_steps_recorded(fext, num_steps, num_iterations)
        model = self.model
        # animation horizon WITHOUT building the (T, e, 3) host timeline —
        # the resident path never needs it (it works from the device rb
        # schedule), and building 16k-frame windows per chunk would rival
        # the kernel time
        remaining = 0
        for c in getattr(model, "_positional", []):
            if (c["motion_type"] == "user_defined"
                    and c["frame_shift"] is not None):
                remaining = max(remaining,
                                len(c["frame_shift"]) - self.frame)
        animated = remaining > 0
        if (getattr(self, "_resident", None) is not None
                and self.enable_self_collision == "device"
                and self._collision_mode == "device"
                and getattr(self, "self_collision_resident", True)
                and not getattr(self, "_in_sc_window", False)):
            # proximity-gated resident serving under the device
            # self-collision pass (see _run_steps_self_collision)
            return self._run_steps_self_collision(fext, num_steps,
                                                  num_iterations)
        if (getattr(self, "_resident", None) is not None
                and not self.enable_self_collision):
            run_fn, perm, iperm = self._resident
            r = self.U.shape[1]
            call = None
            # contact-tier serve length + call: normally the whole window;
            # under the chunked-tier-1 WINDOW BYPASS below the full-state
            # contact kernel serves a bounded sub-window instead
            steps_c = num_steps
            call_c = None
            if self._resident_utst is not None and animated:
                t_eff = min(num_steps, remaining)
                t_pad = 1 << max(t_eff - 1, 0).bit_length()
                itemsize = 8 if self.dtype is None else np.dtype(
                    self.dtype).itemsize
                rb_bytes = t_pad * 3 * r * itemsize
                if self._rb_sched is None:
                    # upload the full schedule once IF it is reasonably
                    # sized; multi-million-frame schedules stay on host
                    # (windows built per call) — False marks "don't build"
                    total = self._rb_schedule_length()
                    if total * 3 * r * itemsize <= self.RB_SCHED_DEVICE_LIMIT:
                        self._rb_sched = self._cast(
                            self._rb_window_host(0, total))
                    else:
                        self._rb_sched = False
                if self._rb_sched is not False:
                    # device-resident schedule, window-sliced INSIDE the
                    # kernel's jit (one dispatch per chunk): no host
                    # einsum, no H2D transfer, no second dispatch for the
                    # slice.  pow2-padded window (index clamps in-kernel)
                    # so compilations are reused across run lengths.
                    sched, frame = self._rb_sched, self.frame

                    def call(P, V, Fx, runner):
                        return runner.windowed(P, V, Fx, sched, frame,
                                               t_pad, num_steps,
                                               num_iterations)

                    limit = getattr(self, "_rb_seq_limit",
                                    self.RESIDENT_RB_SEQ_LIMIT)
                    if (rb_bytes > limit
                            and getattr(self, "_resident_fast_kind",
                                        None) == "chunked"
                            and getattr(self, "_resident_fast",
                                        None) is not None):
                        # WINDOW BYPASS: the chunked tier-1 kernel streams
                        # its rb rows from the HBM-resident schedule (the
                        # outer XLA while_loop stages only rebase_every
                        # rows per inner pallas_call), so the VMEM-window
                        # gate below does not apply to it — serve the
                        # WHOLE animated call in ONE dispatch (this is
                        # what lets poke-style schedules run 128k+-step
                        # chunks at the flagship rate instead of being
                        # capped at ~32k by the window gate).  Only the
                        # full-state CONTACT tier still holds its window
                        # in VMEM: cap ITS serve length so that window
                        # fits, and recurse for the remainder.
                        cap = max(1, limit // (3 * r * itemsize))
                        cap = 1 << (cap.bit_length() - 1)   # floor pow2
                        steps_c = min(num_steps, cap)

                        def call_c(P, V, Fx, runner):
                            return runner.windowed(P, V, Fx, sched,
                                                   frame, cap, steps_c,
                                                   num_iterations)

                        rb_bytes = 0    # tier-1 takes the full window
                else:
                    # oversized schedule: per-call host window + upload
                    rb_dev = self._cast(
                        self._rb_window_host(self.frame, t_pad))

                    def call(P, V, Fx, runner):
                        return runner(P, V, Fx, rb_dev, num_steps,
                                      num_iterations)
            else:
                if self._resident_utst is not None:
                    # static targets: one (1, 3, r) host contraction
                    rb_seq = np.einsum(
                        "dre,ted->tdr", self._resident_utst,
                        np.asarray(model.positional_targets(
                            self.frame))[None])
                else:
                    rb_seq = np.zeros((1, 3, r))
                rb_bytes = rb_seq.nbytes
                rb_dev = self._cast(rb_seq)

                def call(P, V, Fx, runner):
                    return runner(P, V, Fx, rb_dev, num_steps,
                                  num_iterations)
            if rb_bytes <= getattr(self, "_rb_seq_limit",
                                   self.RESIDENT_RB_SEQ_LIMIT):
                P = self._cast(np.ascontiguousarray(
                    model.positions[perm].T))
                V = self._cast(np.ascontiguousarray(
                    model.velocities[perm].T))
                Fx = self._cast(np.ascontiguousarray(
                    np.asarray(fext)[perm].T))
                # TIER 1: the contact-LESS early-exit kernel — full
                # affine speed (no contact branches for Mosaic to tax);
                # stops exactly before a would-be clamped step and
                # reports the completed count.  An early exit is never
                # wasted (k completed steps commit), so the only skip
                # criterion is "step 0 would clamp" — a cheap host-side
                # predictor check on the current state.
                # whole-window contact proof: after a lean-build run_steps,
                # _last_fast_steps == num_steps proves the tier-1 kernel
                # (which checks the floor EVERY step and exits at the first
                # contact) completed the entire window contact-free —
                # benches use it to certify "contact-free throughput"
                # beyond an endpoint check.  None = tier-1 didn't cover
                # the whole call (contact-mode build, exit, or fallback);
                # reset at method entry above.
                fast = getattr(self, "_resident_fast", None)
                if fast is not None and model.floor_collision:
                    # (floor-off models run the chunked tier-1 with a
                    # sentinel floor — no step-0 check to mirror)
                    sn_y0 = (model.positions[:, 1]
                             + self.dt * getattr(self, "eta", 1.0)
                             * model.velocities[:, 1]
                             + self.dt * self.dt
                             * np.asarray(fext)[:, 1] / model.mass)
                    if float(sn_y0.min()) < model.floor_height:
                        fast = None        # would exit at step 0
                if fast is not None:
                    k = None
                    try:
                        Pf, Vf, k_arr = call(P, V, Fx, fast)
                        k = int(np.asarray(k_arr)[0, 0])
                    except Exception as e:
                        import warnings

                        warnings.warn("early-exit kernel failed; "
                                      f"disabling tier 1: {e}")
                        self._resident_fast = None
                        self._sc_fused = None
                        self._resident_fast_kind = None
                        if run_fn is None:
                            # chunked-only resident: tier 1 WAS the
                            # resident path — drop to the per-step
                            # fused kernel for good
                            self._resident = None
                            return self.run_steps(fext, num_steps,
                                                  num_iterations)
                        fallback = getattr(self, "_resident_fallback",
                                           None)
                        if (fallback is not None
                                and self._resident_kind == "affine"
                                and "vmem" in str(e).lower()):
                            # a tier-1 VMEM failure marks the Mosaic
                            # register-SPILL regime (the contact-less
                            # kernel spilled 69.6 MB at a 100k-vertex
                            # cloth), where the lean affine kernel is
                            # SLOWER than the standard build (15k vs
                            # 39k steps/s measured) — swap to standard
                            # outright instead of limping on affine
                            warnings.warn(
                                "tier-1 VMEM failure marks the spill "
                                "regime; switching the resident kernel "
                                "to the standard build")
                            self._resident = (fallback(), perm, iperm)
                            self._resident_kind = "standard"
                            self._resident_fallback = None
                            if self._resident_state is not None:
                                self._resident_state["use_affine"] = \
                                    False
                            self._resident_batched = {}
                            self._batched_call_cache = {}
                            self._sliced_bs_bad = set()
                            return self.run_steps(fext, num_steps,
                                                  num_iterations)
                    if k is not None:
                        model.positions = np.asarray(
                            Pf, dtype=float).T[iperm]
                        model.velocities = np.asarray(
                            Vf, dtype=float).T[iperm]
                        self.frame += k
                        if k == num_steps:
                            self._last_fast_steps = k
                            return
                        if k > 0:
                            # contact at step k: the recursion's
                            # predictor check routes the remainder to
                            # the contact-capable kernel
                            return self.run_steps(fext, num_steps - k,
                                                  num_iterations)
                        # k == 0: the kernel's f32 step-0 predictor
                        # clamped while the f64 host check said clear
                        # (floor-grazing state within f32 rounding) —
                        # recursing would re-run the identical check +
                        # dispatch forever; fall THROUGH to the
                        # contact-capable resident kernel below for
                        # this window (P/V/Fx still hold the committed
                        # state: zero steps ran).
                if run_fn is None:
                    # CHUNKED-ONLY resident (beyond-gate model): no
                    # full-state contact kernel fits VMEM, so contact
                    # regimes run on the per-step fused path in BOUNDED
                    # windows, handing back to tier 1 as soon as the
                    # host predictor says the next step is floor-clear.
                    # The depth guard caps pathological graze/contact
                    # alternation (each recursion makes >=1 window of
                    # progress, so the cap only costs throughput, never
                    # correctness).
                    window = max(
                        int(getattr(self, "resident_rebase_every", 256)),
                        -(-num_steps // 64))
                    depth = getattr(self, "_chunkonly_depth", 0)
                    remaining = num_steps
                    while remaining > 0:
                        w = min(remaining, window)
                        targets_tl, _ = self._targets_timeline(w)
                        p, v = self._run_jit(
                            self._cast(model.positions),
                            self._cast(model.velocities),
                            self._cast(fext), self._cast(targets_tl),
                            num_steps=w,
                            num_iterations=num_iterations)
                        model.positions = np.asarray(p)
                        model.velocities = np.asarray(v)
                        self.frame += w
                        remaining -= w
                        if (remaining <= 0 or depth >= 16
                                or self._resident_fast is None
                                or not model.floor_collision):
                            continue
                        sn_y0 = (model.positions[:, 1]
                                 + self.dt * getattr(self, "eta", 1.0)
                                 * model.velocities[:, 1]
                                 + self.dt * self.dt
                                 * np.asarray(fext)[:, 1] / model.mass)
                        if float(sn_y0.min()) >= model.floor_height:
                            # floor-clear again: back to the affine rate
                            self._chunkonly_depth = depth + 1
                            try:
                                return self.run_steps(fext, remaining,
                                                      num_iterations)
                            finally:
                                self._chunkonly_depth = depth
                    return
                try:
                    Pf, Vf = (call_c or call)(P, V, Fx, run_fn)
                except Exception as e:
                    import warnings
                    fallback = getattr(self, "_resident_fallback", None)
                    if (self._resident_kind == "affine"
                            and fallback is not None):
                        # Mosaic rejected the affine kernel: rebuild with
                        # the standard resident kernel and retry — still
                        # one-kernel stepping, just without the affine
                        # coordinates
                        warnings.warn(
                            "affine resident kernel failed to compile; "
                            f"retrying with the standard kernel: {e}")
                        self._resident = (fallback(), perm, iperm)
                        self._resident_kind = "standard"
                        self._resident_fallback = None
                        # keep the batched path consistent: rebuilds must
                        # use the standard kernel too, not re-fail affine
                        if self._resident_state is not None:
                            self._resident_state["use_affine"] = False
                        self._resident_batched = {}
                        self._batched_call_cache = {}
                        self._sliced_bs_bad = set()
                        # the tier-1 early-exit kernel shares the affine
                        # staging profile that just failed — drop it too
                        # rather than paying one more doomed compile
                        self._resident_fast = None
                        self._sc_fused = None
                        self._resident_fast_kind = None
                        return self.run_steps(fext, num_steps,
                                              num_iterations)
                    # standard kernel failed too (e.g. operands + staging
                    # exceed scoped VMEM): continue on the per-step fused
                    # kernel
                    warnings.warn("resident kernel failed to compile; "
                                  f"falling back to per-step path: {e}")
                    self._resident = None
                else:
                    model.positions = np.asarray(Pf, dtype=float).T[iperm]
                    model.velocities = np.asarray(Vf, dtype=float).T[iperm]
                    self.frame += steps_c
                    if steps_c < num_steps:
                        # window-bypass bounded contact serve: the
                        # remainder re-enters tier 1 (or another bounded
                        # contact window) through the recursion
                        return self.run_steps(fext, num_steps - steps_c,
                                              num_iterations)
                    return
        targets_tl, _ = self._targets_timeline(num_steps)
        p, v = self._run_jit(self._cast(model.positions),
                             self._cast(model.velocities), self._cast(fext),
                             self._cast(targets_tl), num_steps=num_steps,
                             num_iterations=num_iterations)
        model.positions = np.asarray(p)
        model.velocities = np.asarray(v)
        self.frame += num_steps

    def _record_frame(self, stacked):
        for name, p in stacked.items():
            if name == "positional":
                continue
            self._recorded.setdefault(name, {})[str(self.frame)] = (
                np.asarray(p))
        if self.frame == self.max_p_snapshots_num and self.record_path:
            self.flush_recordings()

    flush_recordings = _FullSolver.flush_recordings
