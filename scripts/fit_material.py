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


def fit_bunny(args):
    """Material fit on the BENCH CACHE's real recorded bunny bases
    (VERDICT r4 #6): the flagship scene's FOM recording + product
    pod_vectorized/DEIM bases (bench.run_fom_and_bases), weights
    perturbed 2-5x, recovered by Adam through the differentiable
    rollout.  CPU x64 (the pinned 1e10 masses need f64 solves — see
    sim/diff.py precision caveat)."""
    import jax.numpy as jnp

    import bench
    from animsnapbases_tpu.config.sim_config import default_sim_args
    from animsnapbases_tpu.sim.diff import DiffReducedSim, fit_scales
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    meta = bench.run_fom_and_bases()      # cached artifacts (CPU-pinned)
    print(f"[fit] bunny bases from {meta['basis_dir']} "
          f"({meta['n_verts']} verts)", file=sys.stderr)

    V, F, _ = bench.load_mesh()
    model = bench.build_model(V, F)
    red_args = default_sim_args()
    red_args.dt = bench.DT
    # heavier damping than the bench's 2e-3 ring-down: the fitting loss
    # needs a contractive, non-chaotic weight-response (CLAUDE.md note)
    red_args.damping = DAMPING
    red_args.constraint_projection_basis_type = "deim_pod_vectorized"
    n_modes = min(30, bench.CONSTR_MODES)
    red_args.tri_strain_reduced = True
    red_args.tri_strain_num_components = n_modes
    red_args.edge_spring_reduced = True
    red_args.edge_spring_num_components = n_modes
    red_args.deim_oversample = 4.0 / 3.0
    red_args.geom_interpolation_basis_dir = meta["basis_dir"]
    red_args.geom_interpolation_basis_file = "basis.npz"
    red_args.position_reduced = True
    red_args.position_num_components = bench.POS_MODES
    red_args.position_basis_file = meta["pos_path"]
    solver = AnimSnapBasesSolver(red_args, pallas_mode="off")
    solver.set_model(model)
    solver.prepare(red_args)
    sim = DiffReducedSim(solver)

    # 2x perturbations in both directions: within the twin's basin of
    # attraction (measured — at 2.5-3x the weight-response turns
    # chaotic and Adam runs away from the truth; the same cliff
    # CLAUDE.md documents for synthetic bases)
    true = {"edge_spring": 2.0, "tris_strain": 0.5}
    true_s = np.array([true.get(n, 1.0) for n in sim.group_names])

    # gravity-loaded fall from rest: the elastic response (and so the
    # loss) is strongly weight-sensitive, unlike the tiny ring-down
    fext_np = bench.gravity(model)
    q0 = jnp.asarray(model.positions)
    v0 = jnp.zeros_like(q0)
    fext = jnp.asarray(fext_np)
    targets = jnp.asarray(model.positional_targets(0))[None]

    T = args.horizon
    rollout = sim.make_rollout(T, num_iterations=ITERS,
                               save_trajectory=True)
    _, _, target_traj = rollout(q0, v0, fext, targets,
                                jnp.asarray(true_s))
    assert np.isfinite(np.asarray(target_traj)).all()

    t0 = time.perf_counter()
    fitted, history = fit_scales(
        sim, q0, v0, fext, targets, target_traj, num_iterations=ITERS,
        steps=args.steps, learning_rate=args.lr,
        log_every=max(1, args.steps // 10))
    wall = time.perf_counter() - t0

    fitted = np.asarray(fitted)
    err = {name: abs(float(fitted[i]) - true_s[i]) / true_s[i]
           for i, name in enumerate(sim.group_names)}
    data = {
        "metric": "material_fit_max_rel_scale_error_bunny",
        "value": round(max(err.values()), 6),
        "unit": "relative",
        "vs_baseline": 1.0,
        "detail": {
            "mesh": meta["mesh"], "n_verts": meta["n_verts"],
            "bases": "bench-cache recorded (pod_vectorized + row DEIM, "
                     f"{n_modes} modes/group, r={bench.POS_MODES})",
            "groups": sim.group_names,
            "true_scales": [round(float(x), 4) for x in true_s],
            "fitted_scales": [round(float(x), 4) for x in fitted],
            "rel_err": {k: round(v, 6) for k, v in err.items()},
            "loss_first": history[0], "loss_last": history[-1],
            "adam_steps": args.steps, "horizon": T,
            "wallclock_s": round(wall, 2),
        },
    }
    ok = max(err.values()) < 0.1 and history[-1] < 1e-3 * history[0]
    return data, ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bunny", action="store_true",
                    help="fit on the bench cache's real recorded bunny "
                         "bases (builds the cache if missing, ~10 min)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default backend instead of CPU x64 "
                         "(CAVEAT: f32 — the r x r solves carry 1e10 "
                         "pinned-mass terms, cond ~1e9-1e10; gradients "
                         "on pinned models may be inaccurate, parity is "
                         "only verified on CPU x64; see sim/diff.py)")
    ap.add_argument("--steps", type=int, default=None, help="Adam steps")
    ap.add_argument("--horizon", type=int, default=None,
                    help="fitted trajectory length (sim steps)")
    ap.add_argument("--lr", type=float, default=None)
    args = ap.parse_args()
    # per-mode defaults (measured protocols; see fit_bunny docstring)
    defaults = ((250, 12, 0.05) if args.bunny else (150, 16, 0.08))
    args.steps = defaults[0] if args.steps is None else args.steps
    args.horizon = defaults[1] if args.horizon is None else args.horizon
    args.lr = defaults[2] if args.lr is None else args.lr

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    if args.bunny:
        data, ok = fit_bunny(args)
        print(json.dumps(data))
        if not ok:
            print("FIT DID NOT CONVERGE", file=sys.stderr)
            sys.exit(1)
        return
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
