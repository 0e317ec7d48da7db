"""Benchmark: reduced projective-dynamics throughput on the bunny mesh.

Pipeline (cached in bench_cache/ after the first run):
  1. load bunny.obj (reference data mount) or a bunny-scale procedural cloth
  2. full-order PD run recording constraint projections + trajectory
  3. pod_vectorized + DEIM constraint bases, POD position basis
  4. fully-reduced solver (position reduction + hyper-reduced groups),
     timed with the device-resident multi-step scan

Prints ONE JSON line:
  {"metric": "reduced_pd_steps_per_sec_bunny", "value": N,
   "unit": "steps/s", "vs_baseline": N / 10000}
(baseline: BASELINE.md target of 10k steps/s on one v5e chip)
"""

import json
import os
import sys
import time

import numpy as np

BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_cache")
BUNNY_PATH = "/root/reference/data/bunny.obj"
BASELINE_STEPS_PER_SEC = 10_000.0
METRIC = "reduced_pd_steps_per_sec_bunny"

FOM_FRAMES = 48
FOM_ITERS = 10
POS_MODES = 64
CONSTR_MODES = 40
WI = 1e4
DT = 0.016
HANG_SHIFT = 20.0  # contact-free hang height (overridable per scene)
# --- long-horizon scene design (round-3 rework) -----------------------
# The round-1/2 scene (sparse q0.99 pins, sustained gravity) is NOT
# viable over the 45k-step timing chunks: under-iterated PD is orders of
# magnitude too soft for sustained load (measured static droop >1000
# units at wi=1e4), so the body always ends on the floor, and the
# undamped hyper-reduced dynamics then pumps energy until NaN (round 2's
# headline unknowingly timed partially-NaN state, whose y-NaNs disabled
# the contact branch).  Per-step op count is value-independent (dense
# matmuls, fixed iteration count), so an honest contact-free throughput
# number needs exactly two certifiable properties over the timed window:
# finite state and a never-firing contact branch.  The scene that
# guarantees both: a BROAD pinned cap (PIN_QUANTILE), the FOM recording
# under full gravity as before (bases capture the fall/swing motion),
# and a TIMED phase that is a zero-external-force damped ring-down
# excited with a scaled FOM tail velocity — total drift is bounded by
# |v0|*dt/damping (~4 units against the 20-unit floor clearance), every
# trial resets to the same post-warmup state, and finiteness +
# floor-clearance of the exact timed window are asserted afterwards.
GRAVITY_SCALE = 1.0    # recording-phase gravity
DAMPING = 2e-3         # velocity damping (eta = 1 - DAMPING)
PIN_QUANTILE = 0.80    # pinned top cap (sparse pins leave the reduced
                       # system near-unstable; a broad cap is stiff)
EXCITE_SCALE = 0.1     # timed-phase v0 = scale * FOM tail velocity
# LEAN affine build (tier-1 early-exit kernel) for contact-free scenes:
# run_steps then reports _last_fast_steps == chunk, which PROVES the
# whole timed window was contact-free (the tier-1 kernel checks the
# floor every step and exits at the first contact) — a per-step
# certificate, not an endpoint check.  Measured within noise of the
# contact-mode build contact-free (145.0k vs 146.1k steps/s).
# bench_contact.py overrides to True (its scene needs contact mode).
RESIDENT_CONTACT_MODE = False


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_mesh():
    if os.path.exists(BUNNY_PATH):
        from animsnapbases_tpu.io.meshes import load_obj
        V, F = load_obj(BUNNY_PATH)
        name = os.path.splitext(os.path.basename(BUNNY_PATH))[0]
    else:
        from animsnapbases_tpu.geometry.procedural import cloth_model
        V, F = cloth_model(120, 120)
        V = V / 120.0
        V[:, 2] += 0.05 * V[:, 0]
        name = "bunny-scale-cloth"
    # normalize to unit-ish box
    V = V - V.mean(axis=0)
    V = V / np.abs(V).max()
    return V.astype(np.float64), F.astype(np.int64), name


def build_model(V, F):
    from animsnapbases_tpu.sim.model import DeformableModel

    # the body hangs from its pinned top cap high above the floor, which
    # stays ON (reference behavior): the resident kernel's per-step
    # contact check runs every step and must never fire in the timed
    # window (asserted in main()).  The shift is applied to the geometry
    # directly so the scene is identical with or without it.
    V = V.copy()
    V[:, 1] += HANG_SHIFT
    model = DeformableModel(V, F, masses=np.full(len(V), 10.0),
                            floor_collision=True, init_height_shift=0.0)
    model.add_tri_constrain_strain(0.95, 1.05, wi=WI)
    model.add_edge_spring_constraint(wi=WI)
    # pin the top cap so the body hangs (see PIN_QUANTILE note above)
    top = np.where(model.positions[:, 1]
                   > np.quantile(model.positions[:, 1], PIN_QUANTILE))[0]
    for vi in top:
        model.fix(vi)
    return model


def gravity(model):
    f = np.zeros_like(model.positions)
    f[:, 1] = -9.81 * 10.0 * GRAVITY_SCALE
    return f


def build_group_basis(record, gname, p, num_modes, frames, work_dir,
                      timings=None):
    """Drive the PRODUCT bases pipeline (NonlinearSnapshots +
    ConstraintComponents, pod_vectorized + row DEIM) on recorded
    <group>_p.npz snapshots.  Returns (basis_npz_path, nl, cc); fills
    ``timings`` (a dict) with per-stage wall-clock when given."""
    from animsnapbases_tpu.bases.constraints import ConstraintComponents
    from animsnapbases_tpu.config.bases_config import BasesConfig
    from animsnapbases_tpu.snapshots.nonlinear import NonlinearSnapshots

    elements = "_tris" if gname == "tris_strain" else "_edges"
    cfg = {
        "object": {"experiment_dir": work_dir + "/", "mesh": "bunny",
                   "volumetric": False, "experiment": "bench_" + gname,
                   "snap_format": ".off"},
        "vertexPos_bases": {"computeState": {"compute": False}},
        "constraintProj_bases": {
            "computeState": {"compute": True, "run_main": True,
                             "testingComputations": "_Release"},
            "constraintType": {"name": gname, "elements": elements,
                               "p_snaps_folder": "/x",
                               "assembly_file_name": "assembly_ST.npz",
                               "assembly_key": gname,
                               "snaps_pattern_full_p": "/t.npz",
                               "constrained_elements": "",
                               "rowSize": p},
            "snapshots": {"numFrames": frames, "frame_increment": 1,
                          "preAlignement": "_noAlignement",
                          "reduced_snaps_available": False},
            "basis_type": "pod_vectorized", "interpolation_type": "deim",
            "desired_num_components": num_modes, "bases_res_tol": 1e-20,
            "dim": 3, "max_element_per_geom_vert": 10,
            "rest_shape": "first", "massWeighted": "_nonWeighted",
            "standarized": "_nonStandarized", "supported": "_Global",
            "orthogonalized": "_nonOrthogonalized",
            "store_sing_val": False, "store_to_files": True,
            "run_tests": False, "visualize_geom_elements": False,
            "visualize_elements_at_bases_num": 0},
    }
    param = BasesConfig.from_dict(cfg, results_dir=os.path.join(work_dir,
                                                                "results"))
    param.constProj_input_snapshots_pattern = os.path.join(
        record, gname + "_p.npz")
    param.constProj_weightedSt = os.path.join(record, "assembly_ST.npz")
    param.ensure_dirs()

    t = timings if timings is not None else {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = t.get(name, 0.0) + time.perf_counter() - t0
        return out

    nl = NonlinearSnapshots(param)
    nl.config()
    timed("snapshots_prepare", nl.snapshots_prepare)
    cc = ConstraintComponents(param, nl)
    cc.config()
    timed("pod", cc.compute_components_store_singvalues)
    timed("post_process", cc.post_process_components)
    timed("deim", cc.deim)
    npz = timed("store", cc.store_components_n_interpol_points)
    return npz, nl, cc


def run_fom_and_bases():
    """Produce (and cache) all artifacts the reduced solver needs.

    The FOM ground truth is recorded with exact host f64 LU solves on the
    CPU: the recorded snapshots stay reproducible across rounds, and any
    f32 perturbation would diverge at the chaotic free-swinging vertices
    (Lyapunov growth), polluting the reduced-vs-FOM deviation stat.  The
    device-CG full-order path (the default above the dense limit) is
    benchmarked separately in scripts/bench_bases.py.

    The whole artifact build is pinned to the host CPU so the cached bases
    and DEIM selections are bit-reproducible across rounds (TPU f32 POD
    flips argmax picks, shifting the reduced operating point and the
    deviation stats).
    """
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        return _run_fom_and_bases_impl()


def run_fom_and_bases_contact():
    """Artifact build for the CONTACT-dominated scene (floor-resting
    bunny, scripts/bench_contact.py): same pipeline, opposite scene
    invariant — the recording must actually touch the floor."""
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        return _run_fom_and_bases_impl(expect_contact=True)


def _scene_key():
    """Scene fingerprint stored in ready.json: a cache built for a
    different scene (e.g. the round-1 floor-resting one) must NOT be
    silently reused — the reduced-vs-FOM deviation stat would compare
    mismatched configurations."""
    return {"hang": HANG_SHIFT, "floor": True, "wi": WI,
            "frames": FOM_FRAMES, "pos_modes": POS_MODES,
            "constr_modes": CONSTR_MODES, "dt": DT,
            "pin_q": PIN_QUANTILE, "damping": DAMPING,
            "g_scale": GRAVITY_SCALE, "v": 4}


def _run_fom_and_bases_impl(expect_contact=False):
    os.makedirs(BENCH_DIR, exist_ok=True)
    done_marker = os.path.join(BENCH_DIR, "ready.json")
    if os.path.exists(done_marker):
        try:
            with open(done_marker) as f:
                meta = json.load(f)
        except (json.JSONDecodeError, OSError):
            meta = {}
        if meta.get("scene") == _scene_key():
            return meta
        log("[bench] cached artifacts are from a different scene "
            f"({meta.get('scene')} != {_scene_key()}); rebuilding")

    from animsnapbases_tpu.bases.position_reduction import (
        position_basis_from_trajectory, save_position_basis)
    from animsnapbases_tpu.sim.solver import Solver

    V, F, name = load_mesh()
    log(f"[bench] mesh {name}: {len(V)} verts, {len(F)} tris")

    model = build_model(V, F)
    solver = Solver(global_solve="host")
    solver.set_model(model)

    t0 = time.perf_counter()
    from animsnapbases_tpu.config.sim_config import default_sim_args
    args = default_sim_args()
    args.dt = DT
    args.damping = DAMPING       # recording and replay damp identically
    solver.prepare(args)
    log(f"[bench] FOM prepare ({solver._mode} global solve) "
        f"{time.perf_counter() - t0:.1f}s")

    record = os.path.join(BENCH_DIR, "FOM")
    solver.store_assembly_matrices(record)
    solver.set_record_path(record)
    solver.set_store_p(True)
    solver.max_p_snapshots_num = FOM_FRAMES - 1

    t0 = time.perf_counter()
    traj = solver.run_steps(gravity(model), FOM_FRAMES,
                            num_iterations=FOM_ITERS, record=True)
    log(f"[bench] FOM {FOM_FRAMES} frames in {time.perf_counter() - t0:.1f}s")

    # constraint bases: pod_vectorized + row DEIM per group, through the
    # PRODUCT pipeline (NonlinearSnapshots -> ConstraintComponents), so the
    # benchmark exercises the code path users run
    basis_dir = os.path.join(BENCH_DIR, "bases")
    for gname in ("tris_strain", "edge_spring"):
        npz_path, nl, cc = build_group_basis(
            record, gname, model.groups[gname].p, CONSTR_MODES,
            frames=FOM_FRAMES - 1, work_dir=os.path.join(BENCH_DIR, "work"))
        gdir = os.path.join(basis_dir, gname)
        os.makedirs(gdir, exist_ok=True)
        import shutil
        shutil.copy(npz_path, os.path.join(gdir, "basis.npz"))
        log(f"[bench] {gname}: {cc.numComp} modes, "
            f"{len(cc.geom_alpha)} interpolation points")

    pos_basis = position_basis_from_trajectory(traj, POS_MODES)
    pos_path = os.path.join(BENCH_DIR, "pos_basis.npz")
    save_position_basis(pos_path, pos_basis)

    min_y = float(traj[:, :, 1].min())
    if expect_contact:
        # contact-scene invariant: the recording must press into the floor
        assert min_y <= 1e-6, \
            f"contact scene never reached the floor (min y={min_y})"
        log(f"[bench] contact scene: min y over recording = {min_y:.3f}")
    else:
        # contact-free invariant: the hanging bunny must never approach the
        # floor (y=0) — the affine kernel's contact branch then never fires
        # and the whole run stays in affine coordinates
        assert min_y > 0.5, \
            f"scene reached y={min_y}; raise init_height_shift"
        log(f"[bench] contact-free margin: min y over recording = "
            f"{min_y:.2f}")

    np.save(os.path.join(BENCH_DIR, "traj.npy"), traj)
    np.save(os.path.join(BENCH_DIR, "traj_tail.npy"), traj[-1])
    meta = {"mesh": name, "n_verts": int(len(V)),
            "basis_dir": basis_dir, "pos_path": pos_path,
            "record": record, "scene": _scene_key()}
    with open(done_marker, "w") as f:
        json.dump(meta, f)
    return meta


def ring_down_excitation(model, scale=None):
    """v0 for the certified zero-force ring-down timed phase: the FOM
    tail velocity field scaled by EXCITE_SCALE (see the scene-design note
    at the top), with pinned rows zeroed.  Shared by bench.py and the
    satellite benches so the certificate logic stays in one place."""
    traj = np.load(os.path.join(BENCH_DIR, "traj.npy"))
    v = (EXCITE_SCALE if scale is None else scale) * (
        (traj[-1] - traj[-2]) / DT)
    v[model.fixed_flags] = 0.0
    return v


def certify_floor_clear(positions, velocities=None):
    """Post-timing certificate: the timed window's end state is finite
    and floor-clear.  Accepts (N, 3) or batched (B, N, 3) positions;
    returns end_min_y.  Benches running the LEAN affine build can add the
    WHOLE-window proof via ``solver._last_fast_steps == chunk`` (the
    tier-1 kernel checks the floor every step and exits at the first
    contact)."""
    pos = np.asarray(positions)
    assert np.isfinite(pos).all(), "timed window left non-finite state"
    if velocities is not None:
        assert np.isfinite(np.asarray(velocities)).all()
    end_min_y = float(np.min(pos[..., 1]))
    assert end_min_y > 0.25 * HANG_SHIFT, \
        f"timed window approached the floor (min y={end_min_y:.2f})"
    return end_min_y


def build_reduced_solver(meta, dtype, pos_modes=None, constr_modes=None,
                         oversample=None):
    """Flagship reduced solver from the cached artifacts.  The optional
    overrides truncate the CACHED bases (columns of the stored POD /
    prefixes of the stored DEIM selection) — the accuracy-speed Pareto
    sweep (scripts/pareto.py) varies them without rebuilding artifacts;
    defaults reproduce the flagship configuration exactly."""
    from animsnapbases_tpu.config.sim_config import default_sim_args
    from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver

    V, F, _ = load_mesh()
    model = build_model(V, F)

    args = default_sim_args()
    args.dt = DT
    args.damping = DAMPING
    args.constraint_projection_basis_type = "deim_pod_vectorized"
    n_modes = (min(30, CONSTR_MODES) if constr_modes is None
               else constr_modes)
    args.tri_strain_reduced = True
    args.tri_strain_num_components = n_modes
    args.edge_spring_reduced = True
    args.edge_spring_num_components = n_modes
    # oversampled DEIM (4/3 x points) keeps the hyper-reduced local-global
    # iteration contractive at the full 10 iterations/step
    args.deim_oversample = (4.0 / 3.0 if oversample is None
                            else oversample)
    args.geom_interpolation_basis_dir = meta["basis_dir"]
    args.geom_interpolation_basis_file = "basis.npz"
    args.position_reduced = True
    args.position_num_components = (POS_MODES if pos_modes is None
                                    else pos_modes)
    args.position_basis_file = meta["pos_path"]

    import jax.numpy as _jnp
    solver = AnimSnapBasesSolver(
        args, dtype=dtype,
        matmul_dtype=_jnp.bfloat16 if dtype == _jnp.float32 else None)
    if RESIDENT_CONTACT_MODE is not None:
        solver.resident_contact_mode = RESIDENT_CONTACT_MODE
    solver.set_model(model)
    t0 = time.perf_counter()
    solver.prepare(args)
    log(f"[bench] reduced prepare {time.perf_counter() - t0:.1f}s")
    assert solver._run_jit is not None, "fully-reduced fast path not active"
    log(f"[bench] resident multi-step kernel: "
        f"{'ACTIVE (' + getattr(solver, '_resident_kind', '?') + ')' if getattr(solver, '_resident', None) else 'inactive'}")
    return solver, model


def aot_compile_probe(solver, model, num_iterations, num_steps=1):
    """Time the CLIENT-side lower+compile of the resident kernel (AOT, no
    dispatch).  The executable lands in the persistent compilation cache,
    so the first run_steps afterwards is a compile-cache HIT — its
    wall-clock then measures the server-side first-dispatch load (program
    upload + tunnel) alone.  ``num_steps`` is traced as a dynamic trip
    count, so it does not change the compiled program — it is accepted so
    callers (scripts/prewarm.py) can state the production chunk length.
    Returns seconds or None (no resident kernel)."""
    res = getattr(solver, "_resident", None)
    if res is None:
        return None
    run_fn, perm, _ = res
    r = solver.U.shape[1]
    P = solver._cast(np.ascontiguousarray(model.positions[perm].T))
    Z = solver._cast(np.zeros_like(model.positions).T)
    rb = solver._cast(np.zeros((1, 3, r)))
    t0 = time.perf_counter()
    try:
        run_fn.aot_compile(P, Z, Z, rb, num_steps, num_iterations)
        fast = getattr(solver, "_resident_fast", None)
        if fast is not None:       # tier-1 early-exit kernel (lean builds)
            fast.aot_compile(P, Z, Z, rb, num_steps, num_iterations)
    except Exception as e:
        log(f"[bench] AOT compile probe failed ({e}); cold start will "
            f"mix compile + dispatch")
        return None
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: later runs (and driver re-runs) skip the
    # multi-minute XLA/Mosaic compiles
    cache_dir = os.path.join(BENCH_DIR, "xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log(f"[bench] compilation cache unavailable: {e}")

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    dtype = jnp.float32 if on_tpu else None
    log(f"[bench] backend={backend} devices={jax.devices()}")

    meta = run_fom_and_bases()
    solver, model = build_reduced_solver(meta, dtype)
    f = gravity(model)

    # cold-start attribution (VERDICT r2 item 2): client compile is
    # AOT-timed separately, so the first dispatch below isolates the
    # server-side load (tunnel program upload; 1-7 min under load,
    # nothing client-side fixes it — CLAUDE.md)
    compile_s = aot_compile_probe(solver, model, FOM_ITERS)
    if compile_s is not None:
        log(f"[bench] client compile (AOT, incl. Mosaic) {compile_s:.1f}s")

    # cold-start control experiment (VERDICT r3 item 6): first-dispatch a
    # TRIVIAL same-shaped kernel in the same process BEFORE the resident
    # kernel's first dispatch.  Its wall-clock is the pure tunnel-load /
    # program-load floor; the resident kernel's first dispatch minus this
    # floor is the kernel-size-dependent share.
    trivial_dispatch_s = None
    try:
        import jax
        import jax.numpy as jnp

        x_probe = jnp.zeros((3, model.positions.shape[0]),
                            dtype=jnp.float32)
        triv = jax.jit(lambda a: a * 1.0000001 + 1.0)
        triv.lower(x_probe).compile()       # client compile, not timed
        t0 = time.perf_counter()
        jax.block_until_ready(triv(x_probe))
        trivial_dispatch_s = time.perf_counter() - t0
        log(f"[bench] first dispatch of a TRIVIAL same-shaped kernel "
            f"{trivial_dispatch_s:.1f}s (tunnel-load floor)")
    except Exception as e:                   # pragma: no cover
        log(f"[bench] trivial-dispatch probe failed: {e}")

    # correctness sanity: short reduced run stays finite and near the FOM
    P_entry = model.positions.copy()          # initial hang state
    t0 = time.perf_counter()
    solver.run_steps(f, FOM_FRAMES, num_iterations=FOM_ITERS)
    first_dispatch_s = time.perf_counter() - t0
    log(f"[bench] first run_steps (server load + exec) "
        f"{first_dispatch_s:.1f}s")
    tail = np.load(os.path.join(BENCH_DIR, "traj_tail.npy"))
    scale = np.abs(tail).max()
    d = np.abs(model.positions - tail) / scale
    log(f"[bench] reduced-vs-FOM after {FOM_FRAMES} steps: "
        f"mean {d.mean():.4f}  p99 {np.quantile(d, 0.99):.4f}  "
        f"max {d.max():.4f} (max is a few chaotic free-swinging verts)")
    assert np.isfinite(model.positions).all()

    # timed phase: zero-force damped ring-down (see the scene-design note
    # at the top).  Every trial resets to the same post-warmup state so
    # best-of-6 times the IDENTICAL verified window; afterwards the end
    # state of that window is asserted finite and floor-clear — the two
    # properties that make a contact-free throughput number honest.
    # chunk length: the ~50-80 ms tunnel dispatch is still ~20 % of a
    # 45k-step chunk at ~7 us/step — 180k steps amortizes it to ~2 %
    # (measured 124.5k -> 144.1k steps/s; the ring-down drift bound is
    # step-count-independent, so the certificate is unaffected).
    # BENCH_CHUNK / BENCH_TRIALS env overrides exist for the CPU e2e
    # test (tests/test_bench_e2e.py), not for production numbers.
    chunk = int(os.environ.get("BENCH_CHUNK", "0")) or (
        180000 if getattr(solver, "_resident_kind", "") == "affine"
        else 15000)
    n_trials = int(os.environ.get("BENCH_TRIALS", "6"))
    model.positions = P_entry.copy()
    model.velocities = ring_down_excitation(model)
    solver.frame = 0
    f0 = np.zeros_like(f)
    solver.run_steps(f0, 50, num_iterations=10)      # warmup
    P0 = model.positions.copy()
    V0 = model.velocities.copy()
    fr0 = solver.frame
    best = float("inf")
    window_proof = None      # per-step proof, only on tier-1 lean builds
    for _ in range(n_trials):
        model.positions = P0.copy()
        model.velocities = V0.copy()
        solver.frame = fr0
        t0 = time.perf_counter()
        solver.run_steps(f0, chunk, num_iterations=10)
        dt_wall = time.perf_counter() - t0
        best = min(best, dt_wall)
        if getattr(solver, "_resident_fast", None) is not None:
            ok = getattr(solver, "_last_fast_steps", None) == chunk
            window_proof = ok if window_proof is None else (window_proof
                                                            and ok)
    steps_per_sec = chunk / best
    log(f"[bench] {chunk} steps in {best:.3f}s -> "
        f"{steps_per_sec:,.0f} steps/s")
    # on the lean build the tier-1 kernel must have covered EVERY timed
    # step — otherwise some portion of the window ran contact handling
    # and the number is not a contact-free measurement
    assert window_proof is not False, \
        "tier-1 kernel exited early: the timed window touched the floor"
    if window_proof:
        log("[bench] whole-window contact-free PROOF: tier-1 kernel "
            "completed every timed step (floor checked per step)")

    # certify the timed window: finite and floor-clear at the end
    end_min_y = certify_floor_clear(model.positions, model.velocities)
    log(f"[bench] timed-window certificate: finite, min y "
        f"{end_min_y:.2f} (floor at 0, hang {HANG_SHIFT})")

    print(json.dumps({
        "metric": METRIC,
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
        "detail": {
            "client_compile_s": (round(compile_s, 1)
                                 if compile_s is not None else None),
            "first_dispatch_s": round(first_dispatch_s, 1),
            # tunnel-load floor (trivial same-shaped kernel, same
            # process): first_dispatch_s minus this is the
            # kernel-size-dependent share of cold start
            "first_dispatch_trivial_s": (
                round(trivial_dispatch_s, 1)
                if trivial_dispatch_s is not None else None),
            "resident_kind": getattr(solver, "_resident_kind", None),
            "end_min_y": round(end_min_y, 2),
            "window_contact_free_proof": window_proof,
            "damping": DAMPING,
            # chunk/trials appear here so a leaked BENCH_CHUNK/BENCH_TRIALS
            # override is visible in the artifact, not silent
            "chunk": chunk,
            "trials": n_trials,
        },
    }))


if __name__ == "__main__":
    main()
