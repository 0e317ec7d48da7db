"""Tensor-parallel reduced stepping: the hyper-reduced constraint work of a
prepared :class:`AnimSnapBasesSolver` sharded over a mesh axis.

The fully-reduced PD iteration has three cost centers:

1. per-selected-element constraint projections + the ``W_d @ p`` hyper-
   reduction matmuls (ref ``Simulators.py:366-399``) — sharded here on the
   selected-element axis; each shard holds its slice of every group's
   subset data and ``W`` columns and contributes a partial ``rb`` that is
   one ``psum`` (an (r, 3) all-reduce — rides ICI);
2. the displacement-form constant ``-U^T A_c s_n`` — a (3, r, N) x (N,)
   contraction sharded on the vertex axis (psum);
3. the final position lift ``q = s_n + U u`` — U rows sharded on the same
   vertex axis; the output positions come back vertex-sharded.

The r x r solve and the small selected-vertex update run replicated (they
are tiny).  Padding: selected elements are padded to a multiple of the axis
size by repeating element 0 with ZERO ``W`` columns (their projections are
computed but contribute nothing); vertex-axis operands are zero-padded.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from animsnapbases_tpu.sim import projections


def _pad_elem(x: np.ndarray, m_pad: int) -> np.ndarray:
    """Pad the element-leading axis by repeating row 0 (valid indices)."""
    pad = m_pad - x.shape[0]
    if pad == 0:
        return x
    return np.concatenate([x, np.repeat(x[:1], pad, axis=0)], axis=0)


def _pad_rows(x: np.ndarray, n_pad: int) -> np.ndarray:
    pad = n_pad - x.shape[0]
    if pad == 0:
        return x
    return np.concatenate(
        [x, np.zeros((pad,) + x.shape[1:], dtype=x.dtype)], axis=0)


def make_tp_reduced_step(solver, mesh: Mesh, elem_axis: str = "model"):
    """Build ``step(positions (N,3), velocities, fext) -> (q, v)`` with the
    prepared reduced solver's work sharded over ``mesh[elem_axis]``.

    Requires a fully-reduced prepare (position reduction + every constraint
    group hyper-reduced).  Positional-constraint targets default to the
    build-time frame's values; animated schedules pass per-call ``targets``.
    """
    model = solver.model
    if not solver.reduced_position or solver.U is None:
        raise ValueError("TP reduced stepping needs position reduction")
    if any(name != "positional" and name not in solver._reduced_groups
           for name in model.groups):
        raise ValueError("TP reduced stepping needs every constraint group "
                         "hyper-reduced")

    cast = solver._cast
    n = model.n_verts
    r = solver.U.shape[1]
    nsh = mesh.shape[elem_axis]
    dt = solver.dt
    # damped predictor coefficient (sim/solver.py convention; 1.0 when
    # the solver was prepared with damping=0)
    dtv = dt * getattr(solver, "eta", 1.0)
    dt2 = dt * dt
    floor = model.floor_collision
    floor_h = model.floor_height
    mass = cast(model.mass)

    union, remapped = solver._remapped_subsets()
    union_j = jnp.asarray(union)
    U_sel = cast(solver.U[union])                       # (n_sel, r, 3)
    inv3 = cast(solver._inv_np)                         # (3, r, r)

    n_pad = -(-n // nsh) * nsh
    U_pad = cast(_pad_rows(solver.U, n_pad))            # (n_pad, r, 3)
    utac_pad = cast(np.concatenate(
        [solver._ut_ac_np,
         np.zeros((3, r, n_pad - n))], axis=2))         # (3, r, n_pad)

    pos_g = model.groups.get("positional")
    if pos_g is not None:
        ST = pos_g.assembly_scipy(n)
        # precompose U^T S^T per dim: (3, r, e_pos) — the returned step
        # accepts per-call targets (animated schedules)
        utst = cast(np.stack([solver.U[:, :, d].T @ ST.toarray()
                              for d in range(3)]))
        targets0 = cast(np.asarray(
            model.positional_targets(solver.frame)))

        def rb_extra_of(targets):
            return jnp.einsum("dre,ed->rd", utst, targets)
    else:
        targets0 = jnp.zeros((0, 3))

        def rb_extra_of(targets):
            return jnp.zeros((r, 3))

    # ---- per-group sharded operands -----------------------------------
    metas = []            # (name, p, statics, row_form)
    group_arrays = []     # (arrays dict, W, rowmod-or-None)
    group_specs = []
    for name, rg in solver._reduced_groups.items():
        sub = remapped[name]
        m = rg.num_selected
        m_pad = -(-m // nsh) * nsh
        p = rg.p
        arrays, arr_specs, statics = {}, {}, {}
        for k, v in sub.items():
            va = np.asarray(v) if isinstance(v, np.ndarray) else v
            if isinstance(va, np.ndarray) and va.ndim >= 1 \
                    and va.shape[0] == m:
                arr = _pad_elem(va, m_pad)
                arrays[k] = (cast(arr) if np.issubdtype(arr.dtype,
                                                        np.floating)
                             else jnp.asarray(arr))
                arr_specs[k] = P(elem_axis)
            else:
                statics[k] = v
        out_dim = rg.W.shape[1]
        if rg.row_select is not None:
            # row-form: W column i belongs to selected element i
            rowmod = np.asarray(rg.row_select) - np.arange(m) * p
            rowmod = np.concatenate(
                [rowmod, np.zeros(m_pad - m, dtype=rowmod.dtype)])
            W = np.zeros((3, out_dim, m_pad), dtype=rg.W.dtype)
            W[:, :, :m] = rg.W
            group_arrays.append((arrays, cast(W), jnp.asarray(rowmod)))
            group_specs.append((arr_specs, P(None, None, elem_axis),
                                P(elem_axis)))
            metas.append((name, p, statics, True))
        else:
            # block-form: W columns come in whole p-blocks per element
            W4 = rg.W.reshape(3, out_dim, m, p)
            W4p = np.zeros((3, out_dim, m_pad, p), dtype=rg.W.dtype)
            W4p[:, :, :m, :] = W4
            group_arrays.append((arrays, cast(W4p), jnp.asarray(0)))
            group_specs.append((arr_specs,
                                P(None, None, elem_axis, None), P()))
            metas.append((name, p, statics, False))

    def fn(num_it, sn_l, U_l, utac_l, sn_sel, rb_x, U_sel_r, inv3_r,
           *per_group):
        rb_const = -jnp.einsum("drn,nd->rd", utac_l, sn_l)
        rb_const = jax.lax.psum(rb_const, elem_axis) + rb_x

        def body(_, carry):
            q_sel, u = carry
            partial = jnp.zeros_like(rb_const)
            for (name, p, statics, row_form), (arrays, W, rowmod) in zip(
                    metas, per_group):
                data = dict(arrays)
                data.update(statics)
                pk = projections.PROJECTION_KERNELS[name](q_sel, data)
                if row_form:
                    m_l = rowmod.shape[0]
                    pk = pk[jnp.arange(m_l) * p + rowmod]
                    Wl = W
                else:
                    Wl = W.reshape(W.shape[0], W.shape[1], -1)
                partial = partial + jnp.einsum("dop,pd->od", Wl, pk)
            rb = rb_const + jax.lax.psum(partial, elem_axis)
            u = jnp.einsum("drs,sd->rd", inv3_r, rb)
            q_sel = sn_sel + jnp.einsum("nrd,rd->nd", U_sel_r, u)
            return q_sel, u

        _, u = jax.lax.fori_loop(
            0, num_it, body, (sn_sel, jnp.zeros((r, 3), dtype=sn_sel.dtype)))
        q_l = sn_l + jnp.einsum("nrd,rd->nd", U_l, u)
        return q_l, u

    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(elem_axis), P(elem_axis),
                  P(None, None, elem_axis), P(), P(), P(), P())
        + tuple(group_specs),
        out_specs=(P(elem_axis), P()))

    @jax.jit
    def run(positions, velocities, fext, targets, num_iterations):
        a = fext / mass[:, None]
        sn = positions + dtv * velocities + dt2 * a
        if floor:
            sn = sn.at[:, 1].set(jnp.maximum(sn[:, 1], floor_h))
        sn_sel = sn[union_j]
        sn_pad = jnp.pad(sn, ((0, n_pad - n), (0, 0)))
        q_pad, _ = sharded(jnp.asarray(num_iterations), sn_pad, U_pad,
                           utac_pad, sn_sel, rb_extra_of(targets), U_sel,
                           inv3, *group_arrays)
        q = q_pad[:n]
        return q, (q - positions) / dt

    def step(positions, velocities, fext, num_iterations=10, targets=None):
        t = targets0 if targets is None else cast(targets)
        return run(cast(positions), cast(velocities), cast(fext), t,
                   num_iterations)

    return step
