"""Differentiable reduced-PD stepping and rollouts.

A capability BEYOND the reference (its host/CUDA local-global loop in
``Simulators.py:537-744`` has no gradient path at all): because the
TPU-native reduced step is a pure jitted function, ``jax.grad`` flows
through whole rollouts with respect to

* **per-group constraint-weight scales** (material identification /
  tuning — every group's S^T triplets and LHS triplets are LINEAR in its
  ``wi``, see ``sim/groups.py``, so a scalar multiplier per group scales
  the precomputed reduced operators exactly),
* **external forces, positional targets and the initial state**
  (force/trajectory optimization, inverse design, control).

The forward math mirrors the solver's fully-reduced displacement-form
fast path (``sim/reduced.py:_build_step``, behavior ref
``Simulators.py:537-744`` + ``:157-220``): ``q = s_n + U u`` with the
r x r per-dim systems

    Ar_d(s) = U_d^T (M/dt^2) U_d + sum_g s_g * U_d^T A_g,d U_d

solved per iteration.  Weight-dependent operators are rebuilt from the
per-group pieces ON DEVICE each step (a handful of (r, r) and (r, N)
scaled sums — cheap next to the iteration dots), and the linear solve
uses ``jnp.linalg.solve`` instead of the production path's precomputed
f64 inverse so gradients flow through the LHS as well.

All model-sized operands ride as TRACED jit arguments (the
``run.operands`` pattern from ``ops/pallas_resident.py`` — closure
constants would bake them into the HLO: slow lowering, bloated
persistent-cache entries, value-dependent cache keys; CLAUDE.md
lesson m).

Intended for OFFLINE fitting/design loops (typically CPU x64 or a single
chip), not the serving path: the self-collision pass is not applied, and
per-step ``jax.checkpoint`` keeps reverse-mode memory at O(T * state)
instead of O(T * state * iterations).

PRECISION CAVEAT (r4 advisor): ``jnp.linalg.solve`` on ``Ar`` runs in
the working dtype.  With pinned vertices ``Ar`` carries 1e10/dt^2 mass
terms (cond ~1e9-1e10) — exactly the regime the production path avoids
by inverting in host f64 (``sim/reduced.py`` prefactorization
rationale).  On CPU the default x64 keeps this accurate; under
``--tpu`` (f32) rollouts and gradients on models WITH mass pins may be
silently inaccurate — gradient parity is only verified on CPU x64.
Prefer CPU for fitting pinned models, or unpin before fitting on-device.
"""

from __future__ import annotations

import sys

import numpy as np
import scipy.sparse

import jax
import jax.numpy as jnp

from animsnapbases_tpu.sim import projections
from animsnapbases_tpu.sim.solver import group_dim_triplets

__all__ = ["DiffReducedSim", "fit_scales"]


def _group_dim_block(g, n: int) -> scipy.sparse.csr_matrix:
    """One group's per-dim (N, N) LHS block (see
    :func:`animsnapbases_tpu.sim.solver.group_dim_triplets` — the single
    source of the d=0 Kronecker-block layout assumption)."""
    rows, cols, vals = group_dim_triplets(g)
    return scipy.sparse.csr_matrix((vals, (rows, cols)), shape=(n, n))


class DiffReducedSim:
    """Pure-function view of a prepared :class:`AnimSnapBasesSolver`.

    Requires the solver's fully-reduced fast path (position reduction on
    and every non-positional group constraint-reduced).  The solver is
    only READ at construction; stepping never mutates it.

    ``scales`` is a (n_groups,) array of per-group weight multipliers
    aligned with :attr:`group_names`; ``scales = ones`` reproduces the
    solver's own dynamics (up to solve-vs-precomputed-inverse rounding).
    """

    def __init__(self, solver):
        if not getattr(solver, "reduced_position", False):
            raise ValueError("DiffReducedSim needs position reduction")
        if solver.U is None or getattr(solver, "_inv_np", None) is None:
            raise ValueError("solver must be prepared() first")
        model = solver.model
        full = [name for name in model.groups
                if name not in solver._reduced_groups]
        if set(full) - {"positional"}:
            raise ValueError(
                "DiffReducedSim needs the fully-reduced fast path; "
                f"non-reduced groups present: {sorted(set(full))}")

        cast = solver._cast
        self.dt = float(solver.dt)
        self.eta = float(getattr(solver, "eta", 1.0))
        self.floor = bool(model.floor_collision)
        self.floor_height = float(model.floor_height)
        self.n_verts = model.n_verts
        n, dt2 = model.n_verts, self.dt * self.dt

        U = np.asarray(solver.U)                       # (N, r, 3)
        self.r = U.shape[1]

        # --- per-group reduced LHS pieces (weight-linear) -------------
        self.group_names = list(model.groups)
        G_list, utac_list = [], []
        for name in self.group_names:
            A_g = _group_dim_block(model.groups[name], n)
            G_list.append(np.stack(
                [U[:, :, d].T @ (A_g @ U[:, :, d]) for d in range(3)]))
            utac_list.append(np.stack(
                [(A_g.T @ U[:, :, d]).T for d in range(3)]))

        # --- reduced-group rhs machinery (mirrors _build_step) --------
        union, remapped = solver._remapped_subsets()
        # static structure (group names, indices, non-array data) stays
        # in the closure; ARRAYS ride in the operand pytree below
        self._reduced_static = []
        red_arrays = []
        for name, rg in solver._reduced_groups.items():
            sub = remapped[name]
            arrs, static = {}, {}
            for k, v in sub.items():
                if isinstance(v, np.ndarray):
                    if np.issubdtype(v.dtype, np.floating):
                        arrs[k] = cast(v)
                    else:
                        arrs[k] = jnp.asarray(v)
                else:
                    static[k] = v
            self._reduced_static.append(
                (name, self.group_names.index(name), static,
                 rg.row_select is not None))
            red_arrays.append({
                "data": arrs,
                "W": cast(rg.W),
                "rs": (jnp.asarray(rg.row_select)
                       if rg.row_select is not None else jnp.zeros(0)),
            })

        uts = solver._ut_st_np()
        self._has_targets = uts is not None
        self._i_pos = (self.group_names.index("positional")
                       if "positional" in self.group_names else None)
        self.n_targets = (model.groups["positional"].num
                          if self._i_pos is not None else 0)

        # everything model-sized is a TRACED argument of the jitted step
        self._operands = {
            "U": cast(U),
            "U_sel": cast(U[union]),                  # (n_sel, r, 3)
            "union": jnp.asarray(union),
            "mass": cast(model.mass),
            "mass_r": cast(np.stack(
                [U[:, :, d].T @ ((model.mass / dt2)[:, None] * U[:, :, d])
                 for d in range(3)])),                # (3, r, r)
            "G": cast(np.stack(G_list)),              # (g, 3, r, r)
            "ut_ac": cast(np.stack(utac_list)),       # (g, 3, r, N)
            "UtSt": (cast(uts) if uts is not None
                     else jnp.zeros((3, self.r, 0))),
            "reduced": red_arrays,
        }
        self._step = jax.jit(self._step_impl,
                             static_argnames=("num_iterations",))

    # -- pure stepping -------------------------------------------------

    def _step_impl(self, ops, q, v, fext, targets, scales,
                   num_iterations=10):
        dt, dt2 = self.dt, self.dt * self.dt
        a = fext / ops["mass"][:, None]
        sn = q + (dt * self.eta) * v + dt2 * a
        if self.floor:
            sn = sn.at[:, 1].set(jnp.maximum(sn[:, 1], self.floor_height))

        # weight-dependent operators: scaled sums of the per-group pieces
        Ar = ops["mass_r"] + jnp.einsum("g,gdrs->drs", scales, ops["G"])
        ut_ac = jnp.einsum("g,gdrn->drn", scales, ops["ut_ac"])

        # displacement form (sim/reduced.py:prepare_global_matrix): the
        # huge pinned-mass predictor terms cancel analytically
        rb_const = -jnp.einsum("drn,nd->rd", ut_ac, sn)
        if self._has_targets:
            rb_const = rb_const + scales[self._i_pos] * jnp.stack(
                [ops["UtSt"][d] @ targets[:, d] for d in range(3)], axis=1)

        sn_sel = sn[ops["union"]]

        def body(carry, _):
            q_sel, _u = carry
            rb = rb_const
            for (name, gi, static, has_rs), grp in zip(
                    self._reduced_static, ops["reduced"]):
                data = {**static, **grp["data"]}
                p = projections.PROJECTION_KERNELS[name](q_sel, data)
                if has_rs:
                    p = p[grp["rs"]]
                rb = rb + scales[gi] * jnp.einsum("dop,pd->od",
                                                  grp["W"], p)
            # (3, r, r) x (3, r, 1) batched solve — differentiable in Ar
            u = jnp.linalg.solve(Ar, rb.T[:, :, None])[:, :, 0].T  # (r, 3)
            q_sel_new = sn_sel + jnp.einsum("nrd,rd->nd",
                                            ops["U_sel"], u)
            return (q_sel_new, u), None

        u0 = jnp.zeros((self.r, 3), dtype=sn.dtype)
        (_, u), _ = jax.lax.scan(body, (sn_sel, u0), None,
                                 length=num_iterations)
        q_new = sn + jnp.einsum("nrd,rd->nd", ops["U"], u)
        v_new = (q_new - q) / dt
        return q_new, v_new

    def step(self, q, v, fext, targets, scales, num_iterations=10):
        """One reduced-PD step as a pure function.

        All array arguments may be traced; gradients flow through every
        one of them (including ``scales``, via the on-device LHS solve).
        """
        return self._step(self._operands, q, v, fext, targets, scales,
                          num_iterations=num_iterations)

    def ones_scales(self):
        return jnp.ones(len(self.group_names),
                        dtype=self._operands["U"].dtype)

    # -- rollouts --------------------------------------------------------

    def make_rollout(self, num_steps: int, num_iterations: int = 10,
                     save_trajectory: bool = False,
                     checkpoint: bool = True):
        """Build ``rollout(q0, v0, fext, targets_seq, scales) -> (qT, vT[,
        traj])`` over ``num_steps`` via ``lax.scan``.

        ``targets_seq`` is a (T, e_pos, 3) per-frame positional-target
        timeline (T == 1 for static targets; the index clamps like
        ``run_steps``).  With ``checkpoint`` (default) each step is
        rematerialized in the backward pass, so reverse-mode memory is
        O(num_steps * state), independent of ``num_iterations``.
        """
        step = self._step_impl
        if checkpoint:
            step = jax.checkpoint(step, static_argnums=(6,))

        def rollout_impl(ops, q0, v0, fext, targets_seq, scales):
            T = targets_seq.shape[0]

            def body(carry, i):
                q, v = carry
                t = jnp.minimum(i, T - 1)
                q, v = step(ops, q, v, fext, targets_seq[t], scales,
                            num_iterations)
                return (q, v), (q if save_trajectory else None)

            (q, v), traj = jax.lax.scan(body, (q0, v0),
                                        jnp.arange(num_steps))
            if save_trajectory:
                return q, v, traj
            return q, v

        jitted = jax.jit(rollout_impl)

        def rollout(q0, v0, fext, targets_seq, scales):
            return jitted(self._operands, q0, v0, fext, targets_seq,
                          scales)

        return rollout


def fit_scales(sim: DiffReducedSim, q0, v0, fext, targets_seq,
               target_traj, scales0=None, num_steps: int | None = None,
               num_iterations: int = 10, steps: int = 100,
               learning_rate: float = 0.05, log_every: int = 0):
    """Recover per-group weight scales by gradient descent on a recorded
    trajectory (system identification; no reference equivalent).

    Optimizes ``log(scales)`` (positivity) with optax Adam against the
    mean-squared position error over ``target_traj`` (T', N, 3).
    Returns ``(scales, loss_history)`` — ``history[i]`` is the loss of
    the i-th iterate, and a final evaluation is appended so
    ``history[-1]`` is the loss OF the returned scales.
    """
    import optax

    num_steps = int(target_traj.shape[0] if num_steps is None
                    else num_steps)
    rollout = sim.make_rollout(num_steps, num_iterations,
                               save_trajectory=True)
    target = jnp.asarray(target_traj)
    dtype = sim._operands["U"].dtype
    if scales0 is None:
        scales0 = sim.ones_scales()
    log_s = jnp.log(jnp.asarray(scales0, dtype=dtype))

    def loss_fn(log_s):
        _, _, traj = rollout(q0, v0, fext, targets_seq, jnp.exp(log_s))
        return jnp.mean((traj - target) ** 2)

    opt = optax.adam(learning_rate)
    state = opt.init(log_s)
    value_and_grad = jax.value_and_grad(loss_fn)
    history = []
    for i in range(steps):
        loss, g = value_and_grad(log_s)
        history.append(float(loss))
        updates, state = opt.update(g, state)
        log_s = optax.apply_updates(log_s, updates)
        if log_every and i % log_every == 0:
            print(f"  fit step {i:4d}  loss {float(loss):.3e}  "
                  f"scales {np.exp(np.asarray(log_s)).round(4)}",
                  file=sys.stderr)
    history.append(float(loss_fn(log_s)))
    return jnp.exp(log_s), history
