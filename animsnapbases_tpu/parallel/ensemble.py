"""Sharded PD stepping over a jax.sharding.Mesh.

Two composable strategies:

* :func:`make_ensemble_step` — data parallelism over a batch of independent
  simulations: state arrays (B, N, 3) are sharded on the batch axis; the
  single-sim step is vmapped; XLA partitions everything with no collectives.

* :func:`make_element_sharded_step` — model parallelism inside one
  simulation: every constraint group's element axis is split across the mesh
  axis with ``shard_map``; each shard assembles its partial S^T p and the
  full rhs is one ``psum`` over ICI; the global solve runs replicated
  (dense Cholesky below the size limit, device CG in displacement form
  above it — no densified matrix, so bunny/bridge-scale models step under
  shard_map).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from animsnapbases_tpu.sim import projections


def mesh_from_shards(shards: int):
    """1-D ('model',) mesh over ``shards`` devices for sharded bases
    compute, or None (with a warning) when shards <= 1 or too few
    devices are visible — config-driven callers degrade to
    single-device."""
    shards = int(shards or 0)
    if shards <= 1:
        return None
    import jax

    if len(jax.devices()) < shards:
        import warnings

        warnings.warn(
            f"device_mesh_shards={shards} requested but only "
            f"{len(jax.devices())} devices are visible; bases compute "
            f"stays single-device")
        return None
    return build_device_mesh((shards,), ("model",))


def build_device_mesh(shape: tuple[int, ...], axis_names: tuple[str, ...],
                      devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    if len(devices) < n:
        raise ValueError(f"mesh {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev, axis_names)


def _single_sim_step_core(model, dt, dtype=None, eta=1.0):
    """Pure single-sim full-order step suitable for vmap/shard_map
    composition.  Dense Cholesky below the size limit, device CG above it
    (no densification — works at bunny/bridge scale).  ``eta`` = 1 −
    damping in the predictor (`sim/solver.py` convention)."""
    from animsnapbases_tpu.sim.solver import (
        make_device_global_solve,
        make_local_stage,
    )

    cast = (lambda x: jnp.asarray(x, dtype=dtype)) if dtype else jnp.asarray
    mass = cast(model.mass)
    dtv = dt * eta
    dt2 = dt * dt
    floor = model.floor_collision
    floor_h = model.floor_height
    prep, apply = make_device_global_solve(model, dt, cast)
    local = make_local_stage(model)
    targets0 = cast(model.positional_targets(0))

    def step_core(positions, velocities, fext, num_iterations=4):
        a = fext / mass[:, None]
        sn = positions + dtv * velocities + dt2 * a
        if floor:
            sn = sn.at[:, 1].set(jnp.maximum(sn[:, 1], floor_h))
        ctx = prep(sn)

        def body(_, carry):
            q, u = carry
            b, _ = local(q, targets0)
            return apply(b, sn, u, ctx)

        q, _ = jax.lax.fori_loop(0, num_iterations, body,
                                 (sn, jnp.zeros_like(sn)))
        return q, (q - positions) / dt

    return step_core


def make_ensemble_step(model, dt, mesh: Mesh, batch_axis: str = "data",
                       dtype=None, eta=1.0):
    """Batched step over B independent sims, sharded on ``batch_axis``.

    Returns (step(positions (B,N,3), velocities, fext) -> (pos', vel'),
    shard(x) placing a batch array with the right sharding).
    """
    core = _single_sim_step_core(model, dt, dtype, eta=eta)
    spec = NamedSharding(mesh, P(batch_axis))

    @jax.jit
    def step(positions, velocities, fext):
        positions = jax.lax.with_sharding_constraint(positions, spec)
        velocities = jax.lax.with_sharding_constraint(velocities, spec)
        q, v = jax.vmap(lambda p, vl, f: core(p, vl, f))(positions,
                                                         velocities, fext)
        return q, v

    def shard(x):
        return jax.device_put(jnp.asarray(x, dtype=dtype), spec)

    return step, shard


def _pad_to(x: np.ndarray, size: int, fill=0):
    pad = size - x.shape[0]
    if pad == 0:
        return x
    pad_block = np.full((pad,) + x.shape[1:], fill, dtype=x.dtype)
    return np.concatenate([x, pad_block], axis=0)


def make_element_sharded_step(model, dt, mesh: Mesh,
                              elem_axis: str = "model", dtype=None,
                              num_iterations: int = 4, eta=1.0):
    """One simulation with every constraint group's elements sharded over
    ``elem_axis``.  q is replicated; each shard computes its elements'
    projections and partial S^T p; the rhs is psum'ed; the dense solve runs
    replicated.

    Padding: element counts are padded to a multiple of the axis size with
    zero-weight dummy elements (their S^T triplets carry zero values, so
    they contribute nothing).
    """
    from animsnapbases_tpu.sim.solver import make_device_global_solve

    n_shards = mesh.shape[elem_axis]
    cast = (lambda x: jnp.asarray(x, dtype=dtype)) if dtype else jnp.asarray
    n = model.n_verts
    mass = cast(model.mass)
    dtv = dt * eta
    dt2 = dt * dt
    floor = model.floor_collision
    floor_h = model.floor_height
    # global solve: dense Cholesky below the limit, replicated device CG
    # above it (the projection fan-out is the sharded work; the solve is
    # small next to it at scale and needs full q anyway)
    prep, apply = make_device_global_solve(model, dt, cast)
    # positional constraints: S^T is tiny, kept replicated; the returned
    # step accepts per-call targets (animated schedules), defaulting to the
    # build-time frame's values
    pos_g = model.groups.get("positional")
    if pos_g is not None:
        ST_pos = pos_g.assembly_scipy(n)
        st_r = jnp.asarray(ST_pos.tocoo().row)
        st_c = jnp.asarray(ST_pos.tocoo().col)
        st_v = cast(ST_pos.tocoo().data)
        targets0 = cast(np.asarray(model.positional_targets(0)))

        def pos_term(targets):
            gath = st_v[:, None] * targets[st_c]
            return jax.ops.segment_sum(gath, st_r, num_segments=n)
    else:
        targets0 = None
        pos_term = None

    # build padded, shard-ready group arrays
    sharded_groups = []
    for name, g in model.groups.items():
        if name == "positional":
            continue
        e = g.num
        e_pad = ((e + n_shards - 1) // n_shards) * n_shards
        data = {}
        for k, v in g.data.items():
            if isinstance(v, np.ndarray) and v.shape[:1] == (e,):
                fill = 0
                data[k] = _pad_to(v, e_pad, fill)
            else:
                data[k] = v
        # rebuild COO of S^T in per-element dense form: (e, p, max_verts)
        # simpler: pad the COO by element id; S^T triplets are grouped by
        # element via st_cols // p
        elem_of_entry = g.st_cols // g.p
        rows, cols, vals = g.st_rows, g.st_cols, g.st_vals
        # entries per element are equal-count by construction; sort by elem
        order = np.argsort(elem_of_entry, kind="stable")
        per_elem = len(rows) // e
        rows = rows[order].reshape(e, per_elem)
        cols_local = (cols[order] % g.p).reshape(e, per_elem)
        vals_ = vals[order].reshape(e, per_elem)
        rows = _pad_to(rows, e_pad)
        cols_local = _pad_to(cols_local, e_pad)
        vals_ = _pad_to(vals_, e_pad)          # zero values on padding
        sharded_groups.append((name, g.p, e_pad, data, rows, cols_local,
                               vals_))

    # split each group's data into sharded arrays (element-leading axis) and
    # statics (scalars/flags/replicated arrays) closed over in the kernel
    group_meta = []          # (name, p, statics)
    group_arrays = []        # pytrees passed through shard_map
    group_specs = []
    for name, p, e_pad, data, rows, cols_local, vals_ in sharded_groups:
        arrays, specs, statics = {}, {}, {}
        for k, v in data.items():
            if isinstance(v, np.ndarray) and v.shape[:1] == (e_pad,):
                arrays[k] = (cast(v) if np.issubdtype(v.dtype, np.floating)
                             else jnp.asarray(v))
                specs[k] = P(elem_axis)
            else:
                statics[k] = v
        group_meta.append((name, p, statics))
        group_arrays.append((arrays, jnp.asarray(rows),
                             jnp.asarray(cols_local), cast(vals_)))
        group_specs.append((specs, P(elem_axis), P(elem_axis), P(elem_axis)))

    def partial_rhs(q, *per_group):
        """Runs per shard: local projections of this shard's elements +
        partial S^T p, then one psum over the element axis."""
        b = jnp.zeros((n, 3), dtype=q.dtype)
        for (name, p, statics), (arrays, rows, cols_local, vals_) in zip(
                group_meta, per_group):
            data = dict(arrays)
            data.update(statics)
            pk = projections.PROJECTION_KERNELS[name](q, data)  # (e_l*p, 3)
            e_l = rows.shape[0]
            # entry (i, j) of the S^T block uses row cols_local[i, j] of
            # element i's p projection rows
            p_rows = pk.reshape(e_l, p, 3)
            gathered = jnp.take_along_axis(
                p_rows, cols_local[:, :, None].astype(jnp.int32), axis=1)
            contrib = vals_[:, :, None] * gathered
            b = b + jax.ops.segment_sum(contrib.reshape(-1, 3),
                                        rows.reshape(-1), num_segments=n)
        return jax.lax.psum(b, elem_axis)

    sharded_rhs = shard_map(
        partial_rhs, mesh=mesh,
        in_specs=(P(),) + tuple(group_specs),
        out_specs=P())

    @jax.jit
    def _step(positions, velocities, fext, targets):
        a = fext / mass[:, None]
        sn = positions + dtv * velocities + dt2 * a
        if floor:
            sn = sn.at[:, 1].set(jnp.maximum(sn[:, 1], floor_h))
        ctx = prep(sn)
        b_pos = pos_term(targets) if pos_term is not None else None

        def body(_, carry):
            q, u = carry
            b = sharded_rhs(q, *group_arrays)
            if b_pos is not None:
                b = b + b_pos
            return apply(b, sn, u, ctx)

        q, _ = jax.lax.fori_loop(0, num_iterations, body,
                                 (sn, jnp.zeros_like(sn)))
        return q, (q - positions) / dt

    def step(positions, velocities, fext, targets=None):
        t = targets0 if targets is None else cast(targets)
        if t is None:
            t = jnp.zeros((0, 3))
        return _step(positions, velocities, fext, t)

    return step
