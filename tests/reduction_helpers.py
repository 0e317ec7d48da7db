"""Shared helpers: run a FOM recording and build POD+DEIM bases + a position
basis for arbitrary constraint-group sets (programmatic, no config files)."""

import os

import numpy as np

from animsnapbases_tpu.bases.position_reduction import (
    position_basis_from_trajectory,
    save_position_basis,
)
from animsnapbases_tpu.sim.solver import Solver


def pod_deim_basis(frames: np.ndarray, p: int, num_modes: int):
    """frames (F, e*p, 3) -> basis npz dict (pod_vectorized + row DEIM)."""
    import jax.numpy as jnp

    from animsnapbases_tpu.ops.podlinalg import snapshot_pod

    Fn = frames.shape[0]
    X = jnp.asarray(frames.reshape(Fn, -1).T)
    U, _, _ = snapshot_pod(X)
    comps = np.asarray(U).T.reshape(Fn, frames.shape[1], 3)[
        :min(num_modes, Fn)].copy()

    bases = comps.swapaxes(0, 1)
    Pt, alphas = [], []
    V = None
    for k in range(comps.shape[0]):
        vk = bases[:, k, :]
        if k == 0:
            r = vk
        else:
            c = np.empty_like(vk)
            for i in range(3):
                sol = np.linalg.lstsq(V[Pt, :, i], vk[Pt, i], rcond=None)[0]
                c[:, i] = V[:, :, i] @ sol
            r = c - vk
        idx = int(np.argmax((r ** 2).sum(axis=1)))
        Pt.append(idx)
        alphas.append(idx // p)
        V = (vk[:, None, :] if V is None
             else np.concatenate((V, vk[:, None, :]), axis=1))
    return {
        "components": comps,
        "interpol_alphas": np.array(alphas),
        "Pt": np.array(Pt),
        "interpol_verts": np.array([]),
        "interpol_alpha_ranges": np.arange(1, len(alphas) + 1),
    }


def record_and_build_bases(tmp, make_model_fn, sim_args, frames=24,
                           iters=6, num_modes=12, pos_modes=16):
    """Run FOM recording all active groups; build per-group POD+DEIM bases
    and a position basis.  Returns (basis_dir, pos_path, trajectory)."""
    model = make_model_fn()
    solver = Solver()
    solver.set_model(model)
    solver.prepare(sim_args)
    record = str(tmp / "FOM")
    solver.store_assembly_matrices(record)
    solver.set_record_path(record)
    solver.set_store_p(True)
    solver.max_p_snapshots_num = frames - 1

    fext = np.zeros_like(model.positions)
    fext[:, 1] = -9.81 * 10.0
    traj = []
    for _ in range(frames):
        solver.step(fext, num_iterations=iters)
        traj.append(model.positions.copy())
    traj = np.array(traj)

    basis_dir = str(tmp / "bases")
    for name, g in model.groups.items():
        if name == "positional":
            continue
        data = np.load(os.path.join(record, name + "_p.npz"))
        stacked = np.stack([data[str(i)] for i in range(frames - 1)])
        basis = pod_deim_basis(stacked, g.p, num_modes)
        gdir = os.path.join(basis_dir, name)
        os.makedirs(gdir, exist_ok=True)
        np.savez(os.path.join(gdir, "basis.npz"), **basis)

    pos_path = str(tmp / "pos_basis.npz")
    save_position_basis(pos_path,
                        position_basis_from_trajectory(traj, pos_modes))
    return basis_dir, pos_path, traj
