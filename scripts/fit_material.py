"""Material system-identification demo: recover per-group constraint
weights from a recorded trajectory by gradient descent THROUGH the
reduced simulator (``sim/diff.py``).

No reference equivalent exists — the reference's host/CUDA local-global
loop (``Simulators.py:537-744``) has no gradient path; here the whole
rollout is one differentiable ``lax.scan`` and ``jax.grad`` flows
through the per-iteration r x r solves into the per-group weight scales.

Protocol (a standard twin experiment): a pinned cloth is recorded full-
order and reduced through the PRODUCT bases pipeline (the same
``build_group_basis`` driver bench.py uses); the "measured" trajectory
is simulated with softened tri-strain / stiffened edge-spring weights;
the scales are then re-fitted from ones with Adam on the mean-squared
position error.  Real (recorded) bases matter: with random synthetic
bases the weight-response map of the hyper-reduced system is chaotic
and the fitting loss has no usable basin.

Prints ONE JSON line with true vs fitted scales and the loss drop.
Runs on CPU x64 by default (offline fitting; exact f64):
  python scripts/fit_material.py [--tpu] [--steps 150]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

DAMPING = 0.02      # keeps the under-iterated PD rollout contractive
FOM_FRAMES = 30
ITERS = 6


def make_model():
    from animsnapbases_tpu.geometry.procedural import cloth_model
    from animsnapbases_tpu.sim.model import DeformableModel

    V, F = cloth_model(8, 8)
    V = V.copy()
    V[:, 2] += 0.15 * np.sin(V[:, 0])          # break planar degeneracy
    model = DeformableModel(V, F, masses=np.full(len(V), 10.0),
                            floor_collision=False)
    model.add_edge_spring_constraint(wi=1e4)
    model.add_tri_constrain_strain(0.95, 1.05, wi=1e4)
    model.compute_cloth_corner_indices()
    model.fix_surface_side_vertices("left")    # mass pins (1e10)
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default backend instead of CPU x64 "
                         "(CAVEAT: f32 — the r x r solves carry 1e10 "
                         "pinned-mass terms, cond ~1e9-1e10; gradients "
                         "on pinned models may be inaccurate, parity is "
                         "only verified on CPU x64; see sim/diff.py)")
    ap.add_argument("--steps", type=int, default=150, help="Adam steps")
    ap.add_argument("--horizon", type=int, default=16,
                    help="fitted trajectory length (sim steps)")
    ap.add_argument("--lr", type=float, default=0.08)
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import bench  # build_group_basis: the product bases-pipeline driver
    from animsnapbases_tpu.bases.position_reduction import (
        position_basis_from_trajectory,
        save_position_basis,
    )
    from animsnapbases_tpu.config.sim_config import default_sim_args
    from animsnapbases_tpu.sim.diff import DiffReducedSim, fit_scales
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver
    from animsnapbases_tpu.sim.solver import Solver

    work = tempfile.mkdtemp(prefix="fit_material_")
    print(f"[fit] FOM recording + bases under {work}", file=sys.stderr)

    # 1. full-order recording (p snapshots + trajectory)
    model = make_model()
    solver = Solver()
    solver.set_model(model)
    fom_args = default_sim_args()
    fom_args.dt = 0.016
    fom_args.damping = DAMPING
    solver.prepare(fom_args)
    record = os.path.join(work, "FOM")
    solver.store_assembly_matrices(record)
    solver.set_record_path(record)
    solver.set_store_p(True)
    solver.max_p_snapshots_num = FOM_FRAMES - 1
    fext_np = np.zeros_like(model.positions)
    fext_np[:, 1] = -9.81 * 10.0
    traj = []
    for _ in range(FOM_FRAMES):
        solver.step(fext_np, num_iterations=ITERS)
        traj.append(model.positions.copy())
    traj = np.asarray(traj)

    # 2. product bases: pod_vectorized + row DEIM per group + position POD
    basis_dir = os.path.join(work, "bases")
    for gname in ("tris_strain", "edge_spring"):
        npz_path, _, _ = bench.build_group_basis(
            record, gname, model.groups[gname].p, num_modes=10,
            frames=FOM_FRAMES - 1, work_dir=os.path.join(work, "w"))
        gdir = os.path.join(basis_dir, gname)
        os.makedirs(gdir, exist_ok=True)
        shutil.copy(npz_path, os.path.join(gdir, "basis.npz"))
    pos_path = os.path.join(work, "pos_basis.npz")
    save_position_basis(pos_path, position_basis_from_trajectory(traj, 14))

    # 3. fully-reduced solver -> differentiable view
    red_args = default_sim_args()
    red_args.dt = 0.016
    red_args.damping = DAMPING
    red_args.constraint_projection_basis_type = "deim_pod_vectorized"
    red_args.tri_strain_reduced = True
    red_args.tri_strain_num_components = 10
    red_args.edge_spring_reduced = True
    red_args.edge_spring_num_components = 10
    red_args.geom_interpolation_basis_dir = basis_dir
    red_args.geom_interpolation_basis_file = "basis.npz"
    red_args.position_reduced = True
    red_args.position_num_components = 14
    red_args.position_basis_file = pos_path
    rsolver = AnimSnapBasesSolver(red_args, pallas_mode="off")
    rmodel = make_model()
    rsolver.set_model(rmodel)
    rsolver.prepare(red_args)
    sim = DiffReducedSim(rsolver)

    true = {"edge_spring": 1.6, "tris_strain": 0.55}
    true_s = np.array([true.get(n, 1.0) for n in sim.group_names])

    q0 = jnp.asarray(rmodel.positions)
    v0 = jnp.asarray(rmodel.velocities)
    fext = jnp.asarray(fext_np)
    targets = jnp.asarray(rmodel.positional_targets(0))[None]

    T = args.horizon
    rollout = sim.make_rollout(T, num_iterations=ITERS,
                               save_trajectory=True)
    _, _, target_traj = rollout(q0, v0, fext, targets,
                                jnp.asarray(true_s))

    t0 = time.perf_counter()
    fitted, history = fit_scales(
        sim, q0, v0, fext, targets, target_traj, num_iterations=ITERS,
        steps=args.steps, learning_rate=args.lr,
        log_every=max(1, args.steps // 10))
    wall = time.perf_counter() - t0

    fitted = np.asarray(fitted)
    err = {name: abs(float(fitted[i]) - true_s[i]) / true_s[i]
           for i, name in enumerate(sim.group_names)}
    print(json.dumps({
        "metric": "material_fit_max_rel_scale_error",
        "value": round(max(err.values()), 6),
        "unit": "relative",
        "vs_baseline": 1.0,
        "detail": {
            "groups": sim.group_names,
            "true_scales": [round(float(x), 4) for x in true_s],
            "fitted_scales": [round(float(x), 4) for x in fitted],
            "loss_first": history[0], "loss_last": history[-1],
            "adam_steps": args.steps, "horizon": T,
            "wallclock_s": round(wall, 2),
        },
    }))
    ok = max(err.values()) < 0.1 and history[-1] < 1e-3 * history[0]
    if not ok:
        print("FIT DID NOT CONVERGE", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
