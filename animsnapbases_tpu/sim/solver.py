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


def group_dim_triplets(g):
    """One group's per-dim (N, N) LHS block as COO triplets.

    Every group's LHS couples equal dims only with per-dim-identical values
    (ref ``Simulators.py:559-613`` builds the same Kronecker-lifted pattern),
    so the d=0 entries fully describe the block.  Single source of that
    layout assumption — used by :func:`build_constraint_dim_coo` and the
    differentiable per-group operators (``sim/diff.py``)."""
    if g.lhs_rows is None or len(g.lhs_rows) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0)
    m = (g.lhs_rows % 3 == 0) & (g.lhs_cols % 3 == 0)
    return g.lhs_rows[m] // 3, g.lhs_cols[m] // 3, g.lhs_vals[m]


def build_constraint_dim_coo(model: DeformableModel):
    """COO triplets of the per-dim *constraint* block ``A_c`` (N, N):
    ``A_d = A_c + diag(mass/dt^2)`` for every dim d (see
    :func:`group_dim_triplets`)."""
    rows, cols, vals = [], [], []
    for g in model.groups.values():
        r, c, v = group_dim_triplets(g)
        if len(r):
            rows.append(r)
            cols.append(c)
            vals.append(v)
    if not rows:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0)
    return (np.concatenate(rows), np.concatenate(cols),
            np.concatenate(vals))


class Solver:
    """Full-order PD solver with reference-compatible prepare/step API.

    Global-solve modes (``global_solve``):

    * ``"auto"`` — dense device Cholesky when 3N <= DENSE_LIMIT, else the
      device CG sweep (``"cg"``).
    * ``"cg"`` — Jacobi-preconditioned CG in displacement form
      (:mod:`animsnapbases_tpu.ops.cg`), the whole ``num_iterations`` sweep
      in ONE jitted dispatch with warm-started solves.  Replaces the
      reference's host sparse LU (``Simulators.py:608-611``) above the dense
      limit, removing the per-iteration host round trip.
    * ``"host"`` — the reference-equivalent host sparse LU loop (kept for
      exact replay / debugging).
    """

    DENSE_LIMIT = 2400  # max 3N for the on-device dense Cholesky path
    CG_TOL = 1e-11      # relative preconditioned-residual tolerance
    CG_MAX_ITERS = 500

    def __init__(self, global_solve: str = "auto"):
        self.model: DeformableModel | None = None
        self.global_solve = global_solve
        self.dirty = True
        self.dt = None
        self.frame = 0
        self._solve = None          # host LU backsolve (3N,) -> (3N,)
        self._chol = None           # device Cholesky factor
        self._local = None
        self._sweep = None          # jitted whole-iteration sweep
        self._use_dense = False
        # recording
        self.store_stacked_projections = False
        self.record_path = ""
        self.max_p_snapshots_num = 200
        self._recorded: dict[str, dict[str, np.ndarray]] = {}
        # self-collision passes.  False (default): off — a DOCUMENTED
        # deviation from the reference, which runs both host resolvers
        # unconditionally every step (Simulators.py:739-740; see README
        # deviations).  True: the reference's host KD-tree passes.
        # "device": the jit-composable masked O(n*k) vertex-triangle pass
        # (sim/collisions_device.py) — stays on device, works with
        # run_steps.
        self.enable_self_collision = False
        self._collide_jit = None

    # ------------------------------------------------------------------
    def set_model(self, model):
        self.model = model
        self._collide_jit = None     # faces-keyed cache is now stale
        self._run_scan = None
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
        # velocity damping (default 0 = exact reference semantics):
        # s_n = q + dt*eta*v + dt^2 M^-1 f, stored v = (q_new - q)/dt —
        # the same convention as the reduced solver and every resident
        # kernel, so damped FOM recordings and damped reduced replays
        # stay parity-comparable.
        self.eta = 1.0 - float(getattr(args, "damping", 0.0) or 0.0)
        self.max_p_snapshots_num = getattr(args, "max_p_snapshots_num",
                                           self.max_p_snapshots_num)
        A = build_global_matrix(self.model, self.dt)
        n3 = A.shape[0]
        dt2 = self.dt * self.dt
        mode = self.global_solve
        if mode == "auto":
            mode = "dense" if n3 <= self.DENSE_LIMIT else "cg"
        self._mode = mode
        self._use_dense = mode == "dense"
        self._chol = None
        self._solve = None
        # the sweep takes every value that changes under fix/release
        # (masses -> factorization) as a traced ARGUMENT, so schedule
        # events that only change values reuse the compiled program
        # (closure constants are baked into the HLO and defeat the
        # persistent compilation cache)
        if mode == "dense":
            self._chol = jnp.asarray(np.linalg.cholesky(A.toarray()))
            self._sweep_args = (jnp.asarray(self.model.mass / dt2),
                                self._chol)
        elif mode == "cg":
            from animsnapbases_tpu.ops.cg import build_ell

            ac_rows, ac_cols, ac_vals = build_constraint_dim_coo(self.model)
            mass_diag = np.asarray(self.model.mass / dt2, dtype=float)
            diag = mass_diag.copy()
            on_diag = ac_rows == ac_cols
            np.add.at(diag, ac_rows[on_diag], ac_vals[on_diag])
            ell_cols, ell_vals = build_ell(ac_rows, ac_cols, ac_vals,
                                           self.model.n_verts,
                                           diag_add=mass_diag)
            self._sweep_args = (jnp.asarray(mass_diag),
                                jnp.asarray(ell_cols),
                                jnp.asarray(ell_vals),
                                jnp.asarray(1.0 / diag))
        elif mode == "host":
            self._solve = scipy.sparse.linalg.factorized(A)
        else:
            raise ValueError(f"unknown global_solve mode {mode!r}")
        # the local stage closes over the groups' rest data: rebuild (and
        # re-jit the sweep) only when the group structure itself changed
        local_key = tuple((name, id(g))
                          for name, g in self.model.groups.items())
        if getattr(self, "_local_key", None) != local_key:
            self._local = make_local_stage(self.model)
            self._local_key = local_key
            self._sweep_key = None
        self._build_sweep()
        self.set_clean()

    def _build_sweep(self):
        """Jit the whole local-global sweep — one device dispatch per step
        for both the dense-Cholesky and the CG global solve.

        The CG path solves in displacement form ``A_d u = c(q) - A_c s_n``,
        ``q = s_n + u``: the pinned-mass (1e10) rhs terms cancel
        analytically, so the solve runs at elastic scale (float32-safe) and
        ``u`` warm-starts the next iteration's CG.  Factorization values
        (Cholesky factor / ELL matrix / Jacobi diagonal / masses) are
        traced arguments — see prepare().
        """
        if self._mode == "host":
            self._sweep = None
            return
        key = (self._mode, self._local_key)
        if getattr(self, "_sweep_key", None) == key \
                and self._sweep is not None:
            return
        self._sweep_key = key
        local = self._local

        if self._mode == "dense":
            def prep(sn, mats):
                mass_dt2, chol = mats
                return mass_dt2[:, None] * sn

            def apply(c, sn, u_prev, ctx, mats):
                mass_dt2, chol = mats
                q = jax.scipy.linalg.cho_solve(
                    (chol, True), (c + ctx).reshape(-1)).reshape(-1, 3)
                return q, q - sn
        else:
            from animsnapbases_tpu.ops.cg import ell_matvec, pcg_solve

            cg_tol, cg_max = self.CG_TOL, self.CG_MAX_ITERS

            def prep(sn, mats):
                mass_dt2, ecols, evals, dinv = mats
                # -A_c s_n = -(A_d - mass/dt^2) s_n
                return mass_dt2[:, None] * sn - ell_matvec(ecols, evals, sn)

            def apply(c, sn, u_prev, ctx, mats):
                mass_dt2, ecols, evals, dinv = mats

                def matvec(x):
                    return ell_matvec(ecols, evals, x)

                u, _ = pcg_solve(matvec, dinv, c + ctx, u_prev,
                                 tol=cg_tol, max_iters=cg_max)
                return sn + u, u

        def sweep(sn, targets, num_iterations, *mats):
            ctx = prep(sn, mats)

            def it(q, u):
                c, stacked = local(q, targets)
                q, u = apply(c, sn, u, ctx, mats)
                return q, u, stacked

            q, u, stacked = it(sn, jnp.zeros_like(sn))

            def body(_, carry):
                q, u, _ = carry
                return it(q, u)

            q, u, stacked = jax.lax.fori_loop(1, num_iterations, body,
                                              (q, u, stacked))
            return q, stacked

        self._sweep_core = sweep
        self._sweep = jax.jit(sweep)
        self._run_scan = None

    # ------------------------------------------------------------------
    def step(self, fext, num_iterations=10):
        model = self.model
        dt = self.dt
        dt_inv = 1.0 / dt
        dt2 = dt * dt

        a = fext / model.mass[:, None]
        explicit = (model.positions
                    + dt * getattr(self, "eta", 1.0) * model.velocities
                    + dt2 * a)
        if model.floor_collision:
            explicit, corrections = collisions.resolve_floor_collision(
                explicit, model.floor_height)
            model.positions_corrections = corrections

        sn = explicit
        targets = jnp.asarray(model.positional_targets(self.frame))

        if self._sweep is not None:
            q, stacked = self._sweep(jnp.asarray(sn), targets,
                                     num_iterations, *self._sweep_args)
        else:
            # host sparse-LU loop (reference-equivalent replay path)
            masses_term_j = jnp.asarray(
                (model.mass / dt2)[:, None] * sn)
            q = jnp.asarray(sn)
            stacked = {}
            for _ in range(num_iterations):
                b, stacked = self._local(q, targets)
                b = b + masses_term_j
                q = jnp.asarray(
                    unflatten(self._solve(np.asarray(b).flatten())))

        if self.store_stacked_projections:
            self._record_frame(stacked)

        if self.enable_self_collision == "device":
            q = self._collide_device(q)
        q_next = np.asarray(q)
        if self.enable_self_collision is True:
            q_next = collisions.resolve_self_collision_fast(q_next,
                                                            model.faces)
            q_next = collisions.resolve_triangle_self_collisions(q_next,
                                                                 model.faces)
        model.velocities = (q_next - model.positions) * dt_inv
        model.positions = q_next
        self.frame += 1

    def _collide_device(self, q):
        if self._collide_jit is None:
            from animsnapbases_tpu.sim.collisions_device import (
                make_collide_jit,
            )

            self._collide_jit = make_collide_jit(self.model.faces)
        return self._collide_jit(q)

    # ------------------------------------------------------------------
    def run_steps(self, fext, num_steps, num_iterations=10, record=False):
        """Advance ``num_steps`` fully on device in ONE dispatch
        (``lax.scan`` over steps) — essential over a high-latency host-TPU
        link.  Positional targets are evaluated per frame on host and
        shipped as a (T, e, 3) timeline, so animated positional constraints
        are exact.

        With ``record=True``, every step's stacked projections (the last
        local iteration's, matching :meth:`step`) are fed through the usual
        recording dicts and the (T, N, 3) position trajectory is returned.
        """
        model = self.model
        if self._sweep is None or self.enable_self_collision is True:
            # host-LU replay or host self-collision resolvers: per-step loop
            traj = []
            for _ in range(num_steps):
                self.step(fext, num_iterations)
                if record:
                    traj.append(model.positions.copy())
            return np.array(traj) if record else None

        recording = record or self.store_stacked_projections
        collide = self.enable_self_collision == "device"
        eta = getattr(self, "eta", 1.0)
        key = (collide, recording, self._sweep_key, eta)
        if self._run_scan is None or getattr(self, "_run_scan_key",
                                             None) != key:
            self._run_scan_key = key
            sweep = self._sweep_core
            dt = self.dt
            dtv = dt * eta
            dt2 = dt * dt
            floor = model.floor_collision
            floor_h = model.floor_height
            if collide:
                from animsnapbases_tpu.sim.collisions_device import (
                    resolve_self_collision_device,
                )

                faces = jnp.asarray(model.faces)

            def one_step(pos, vel, a, targets, num_iterations, mats):
                sn_raw = pos + dtv * vel + dt2 * a
                if floor:
                    sn = sn_raw.at[:, 1].set(
                        jnp.maximum(sn_raw[:, 1], floor_h))
                else:
                    sn = sn_raw
                q, stacked = sweep(sn, targets, num_iterations, *mats)
                if collide:
                    q = resolve_self_collision_device(q, faces)
                # corrections convention matches step() /
                # resolve_floor_collision: -(clamped - raw)
                return q, (q - pos) / dt, sn_raw - sn, stacked

            if recording:
                # pow2-capped ring buffers + dynamic trip count: one
                # compile serves any num_steps up to the targets pad (the
                # old length-shaped scan paid one compile per distinct
                # schedule-gap length — expensive once the scenario driver
                # chunks between events)
                def run(positions, velocities, fext_j, targets_seq,
                        num_iterations, num_steps, mass, *mats):
                    a = fext_j / mass[:, None]
                    T = targets_seq.shape[0]          # pow2 >= num_steps
                    q0, v0, c0, stacked0 = one_step(
                        positions, velocities, a, targets_seq[0],
                        num_iterations, mats)
                    traj0 = jnp.zeros((T,) + positions.shape,
                                      positions.dtype).at[0].set(q0)
                    bufs0 = jax.tree.map(
                        lambda x: jnp.zeros((T,) + x.shape,
                                            x.dtype).at[0].set(x), stacked0)

                    def body(i, carry):
                        pos, vel, _, traj, bufs = carry
                        q, v, corr, stacked = one_step(
                            pos, vel, a, targets_seq[jnp.minimum(i, T - 1)],
                            num_iterations, mats)
                        traj = jax.lax.dynamic_update_index_in_dim(
                            traj, q, i, 0)
                        bufs = jax.tree.map(
                            lambda b, x: jax.lax.dynamic_update_index_in_dim(
                                b, x, i, 0), bufs, stacked)
                        return q, v, corr, traj, bufs

                    q, v, corr, traj, bufs = jax.lax.fori_loop(
                        1, num_steps, body, (q0, v0, c0, traj0, bufs0))
                    return q, v, traj, bufs, corr
            else:
                # no outputs: dynamic-trip-count fori_loop — one compile
                # serves any num_steps and nothing is stacked in HBM
                def run(positions, velocities, fext_j, targets_seq,
                        num_iterations, num_steps, mass, *mats):
                    a = fext_j / mass[:, None]
                    T = targets_seq.shape[0]
                    corr0 = jnp.zeros_like(positions)

                    def body(i, carry):
                        pos, vel, _ = carry
                        q, v, corr, _ = one_step(
                            pos, vel, a, targets_seq[jnp.minimum(i, T - 1)],
                            num_iterations, mats)
                        return q, v, corr

                    q, v, corr = jax.lax.fori_loop(
                        0, num_steps, body,
                        (positions, velocities, corr0))
                    return q, v, None, None, corr

            self._run_scan = jax.jit(run)

        mass_j = jnp.asarray(model.mass)
        if recording:
            # per-frame target rows, padded to pow2 so compilations are
            # reused across chunk lengths (the loop index clamps)
            t_cap = 1 << max(num_steps - 1, 0).bit_length()
            rows = [model.positional_targets(self.frame + t)
                    for t in range(num_steps)]
            rows += [rows[-1]] * (t_cap - num_steps)
            targets_tl = jnp.asarray(np.stack(rows))
            q, v, traj, stacked_seq, corr = self._run_scan(
                jnp.asarray(model.positions), jnp.asarray(model.velocities),
                jnp.asarray(fext), targets_tl, num_iterations, num_steps,
                mass_j, *self._sweep_args)
            traj = traj[:num_steps]          # slice BEFORE the host pull
        else:
            tl, _ = positional_targets_timeline(model, self.frame,
                                                num_steps)
            q, v, traj, stacked_seq, corr = self._run_scan(
                jnp.asarray(model.positions), jnp.asarray(model.velocities),
                jnp.asarray(fext), jnp.asarray(tl), num_iterations,
                num_steps, mass_j, *self._sweep_args)
        model.positions = np.asarray(q)
        model.velocities = np.asarray(v)
        if model.floor_collision:
            # same convention as resolve_floor_collision: raw - clamped
            model.positions_corrections = np.asarray(corr)
        if self.store_stacked_projections:
            stacked_np = {name: np.asarray(arr)
                          for name, arr in stacked_seq.items()}
            for t in range(num_steps):
                self._record_frame({name: arr[t]
                                    for name, arr in stacked_np.items()})
                self.frame += 1
        else:
            self.frame += num_steps
        return np.asarray(traj) if record else None

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


def positional_targets_timeline(model: DeformableModel, frame: int,
                                num_steps: int):
    """(T, e, 3) per-frame positional-target timeline starting at ``frame``.

    Frame shifts index by absolute frame and clamp at their last entry
    (ref Constraint_projections.py:77-113), so the timeline only covers
    the longest REMAINING shift — T == 1 when nothing is animated; animated
    timelines are padded to the next power of two (device loops clamp the
    index) so compilations are reused across run lengths.  Returns
    (timeline, animated).
    """
    remaining = 0
    for c in getattr(model, "_positional", []):
        if (c["motion_type"] == "user_defined"
                and c["frame_shift"] is not None):
            remaining = max(remaining, len(c["frame_shift"]) - frame)
    if remaining <= 0:
        return np.asarray(model.positional_targets(frame))[None], False
    t_eff = min(num_steps, remaining)
    # vectorized over frames: one fancy-index per animated constraint
    # instead of t_eff python-level positional_targets(frame+t) calls
    # (the host build would otherwise rival the device step time on
    # multi-thousand-step animated chunks)
    p0 = model.groups["positional"].data["p0"]
    tl = np.repeat(np.asarray(p0, dtype=float)[None], t_eff, axis=0)
    frames = frame + np.arange(t_eff)
    for i, c in enumerate(model._positional):
        if (c["motion_type"] == "user_defined"
                and c["frame_shift"] is not None):
            shift = c["frame_shift"]
            tl[:, i] += shift[np.minimum(frames, len(shift) - 1)]
    from animsnapbases_tpu.utils.padding import pow2_pad

    return pow2_pad(tl, axis=0), True


def make_device_global_solve(model: DeformableModel, dt: float,
                             cast=jnp.asarray, dense_limit: int | None = None,
                             cg_tol: float | None = None,
                             cg_max_iters: int | None = None):
    """Reusable device-side global solve for one PD local-global iteration.

    Returns ``(prep, apply)``:

    * ``prep(sn) -> ctx`` — once per step (masses term for the dense path,
      the displacement-form constant ``-A_c s_n`` for CG);
    * ``apply(c, sn, u_prev, ctx) -> (q, u)`` — once per iteration, where
      ``c`` is the summed constraint rhs ``sum S^T p`` and ``u_prev`` warm-
      starts the CG path (ignored by the dense path).

    Below ``dense_limit`` (3N) this is a prefactored dense Cholesky; above
    it a Jacobi-preconditioned CG in displacement form — no densification,
    so it composes with shard_map at bunny/bridge scale.
    """
    dense_limit = Solver.DENSE_LIMIT if dense_limit is None else dense_limit
    cg_tol = Solver.CG_TOL if cg_tol is None else cg_tol
    cg_max_iters = (Solver.CG_MAX_ITERS if cg_max_iters is None
                    else cg_max_iters)
    n = model.n_verts
    dt2 = dt * dt
    mass_dt2 = cast(model.mass / dt2)

    if 3 * n <= dense_limit:
        A = build_global_matrix(model, dt)
        chol = cast(np.linalg.cholesky(A.toarray()))

        def prep(sn):
            return mass_dt2[:, None] * sn

        def apply(c, sn, u_prev, ctx):
            q = jax.scipy.linalg.cho_solve(
                (chol, True), (c + ctx).reshape(-1)).reshape(-1, 3)
            return q, q - sn

        return prep, apply

    from animsnapbases_tpu.ops.cg import (
        build_ell,
        ell_matvec,
        make_pcg_solver,
    )

    ac_rows, ac_cols, ac_vals = build_constraint_dim_coo(model)
    mass_diag = np.asarray(model.mass / dt2, dtype=float)
    diag = mass_diag.copy()
    on_diag = ac_rows == ac_cols
    np.add.at(diag, ac_rows[on_diag], ac_vals[on_diag])
    # padded-ELL matvec (gather + batched dot, scatter-free) of the FULL
    # per-dim matrix A_d = A_c + diag(mass/dt^2)
    ell_cols, ell_vals = build_ell(ac_rows, ac_cols, ac_vals, n,
                                   diag_add=mass_diag)
    ecols = jnp.asarray(ell_cols)
    evals = cast(ell_vals)

    def matvec(x):
        return ell_matvec(ecols, evals, x)

    cg = make_pcg_solver(None, None, None, cast(diag), n, tol=cg_tol,
                         max_iters=cg_max_iters, matvec=matvec)

    def prep(sn):
        # -A_c s_n = -(A_d - mass/dt^2) s_n
        return mass_dt2[:, None] * sn - matvec(sn)

    def apply(c, sn, u_prev, ctx):
        u, _ = cg(c + ctx, u_prev)
        return sn + u, u

    return prep, apply
