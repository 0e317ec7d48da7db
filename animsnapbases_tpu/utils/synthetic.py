"""Synthetic-basis reduced-solver builder for smokes / dryruns / demos.

Builds a fully-reduced :class:`AnimSnapBasesSolver` over ALL of a model's
constraint groups with random orthonormal bases written in the product
``.npz`` schema — self-contained (no recorded snapshots or basis
artifacts needed).  Used by the driver entry points
(``__graft_entry__``) and the real-TPU smoke battery
(``scripts/smoke_tpu.py``); the accuracy of the bases is irrelevant for
those purposes, only the code paths exercised.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np


def synthetic_reduced_solver(model, K: int = 6, r: int = 8,
                             extra_args: dict | None = None,
                             dtype=None, pallas_mode: str = "auto",
                             matmul_dtype=None):
    """Returns a prepared fully-reduced solver for ``model``.

    Every non-positional group gets a (K, e*p, 3) random basis with K
    random DEIM rows; the position basis is per-dim orthonormal (r
    modes).  ``extra_args`` overrides sim-arg fields after the reduction
    flags are set.
    """
    from animsnapbases_tpu.config.sim_config import default_sim_args
    from animsnapbases_tpu.sim.reduced import (
        AnimSnapBasesSolver,
        GROUP_ARG_NAMES,
    )

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp()
    basis_dir = os.path.join(tmp, "bases")
    args = default_sim_args()
    args.dt = 0.016
    args.constraint_projection_basis_type = "deim_pod_vectorized"
    for name, g in model.groups.items():
        if name == "positional":
            continue
        ep = g.num * g.p
        comps = rng.normal(size=(K, ep, 3)) / np.sqrt(ep)
        Pt = np.sort(rng.choice(ep, size=K, replace=False))
        gdir = os.path.join(basis_dir, name)
        os.makedirs(gdir, exist_ok=True)
        np.savez(os.path.join(gdir, "basis.npz"), components=comps,
                 interpol_alphas=Pt // g.p, Pt=Pt,
                 interpol_verts=np.array([]),
                 interpol_alpha_ranges=np.arange(1, K + 1))
        flag, num = GROUP_ARG_NAMES[name]
        setattr(args, flag, True)
        setattr(args, num, K)
    n = model.n_verts
    comps = np.empty((r, n, 3))
    for d in range(3):
        Q, _ = np.linalg.qr(rng.normal(size=(n, r)))
        comps[:, :, d] = Q.T
    pos_path = os.path.join(tmp, "pos_basis.npz")
    np.savez(pos_path, components=comps)
    args.geom_interpolation_basis_dir = basis_dir
    args.geom_interpolation_basis_file = "basis.npz"
    args.position_reduced = True
    args.position_num_components = r
    args.position_basis_file = pos_path
    for k, v in (extra_args or {}).items():
        setattr(args, k, v)

    solver = AnimSnapBasesSolver(args, dtype=dtype, pallas_mode=pallas_mode,
                                 matmul_dtype=matmul_dtype)
    solver.set_model(model)
    solver.prepare(args)
    return solver
