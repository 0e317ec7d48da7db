"""Bases-compute wall-clock benchmark (BASELINE.md row 3).

Times the PRODUCT bases pipelines on the bunny FOM recordings:

* nonlinear: NonlinearSnapshots.snapshots_prepare +
  ConstraintComponents pod_vectorized + post_process + row DEIM
  (the stages the reference's own time_logs.txt rows cover);
* position: greedy deflation PCA (bases/greedy.extract_global — the
  PosComponents compute path) on the recorded trajectory;
* the device-CG full-order recording (Solver.run_steps) vs the host
  sparse-LU loop.

For an apples-to-apples baseline the REFERENCE'S OWN CODE is executed on
this machine's CPU on the same tensors (GUI imports stubbed, as in
tests/test_reference_parity.py) — the committed reference timings
(time_logs.txt) are from a tiny unspecified experiment and are reported
only for context.

Prints ONE JSON line:
  {"metric": "bases_compute_wallclock_bunny", "value": <ours, s>,
   "unit": "s", "vs_baseline": <reference_cpu_s / ours_s>}
(vs_baseline > 1 means faster than the reference on identical data.)
"""

import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"

import bench  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# reference execution harness (GUI imports stubbed; see
# tests/test_reference_parity.py for the test-side twin)
# ---------------------------------------------------------------------------

_STUBS = [
    "polyscope", "polyscope.imgui", "igl", "igl.copyleft", "trimesh",
    "mayavi", "mayavi.mlab", "mayavi.tools", "mayavi.tools.mlab_scene_model",
    "mayavi.core", "mayavi.core.ui", "mayavi.core.ui.mayavi_scene",
    "traits", "traits.api", "traitsui", "traitsui.api",
    "tvtk", "tvtk.api", "tvtk.pyface", "tvtk.pyface.scene_editor",
    "tvtk.common", "pyface", "pyface.timer", "pyface.timer.api",
]


class _Dummy:
    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return self

    def __mro_entries__(self, bases):
        return (object,)


class _Anything(types.ModuleType):
    def __getattr__(self, name):
        return [] if name == "__all__" else _Dummy()


import contextlib
import tempfile


@contextlib.contextmanager
def _quiet_reference():
    """Run reference code without polluting stdout (our artifact stream is
    the single JSON line) or the repo root (its @log_time decorator writes
    function_timings.txt in CWD)."""
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as tmp:
        os.chdir(tmp)
        try:
            with contextlib.redirect_stdout(sys.stderr):
                yield
        finally:
            os.chdir(cwd)


def load_reference_modules():
    for name in _STUBS:
        if name not in sys.modules:
            sys.modules[name] = _Anything(name)
    sys.path.insert(0, REF)
    pkg = types.ModuleType("utils")
    pkg.__path__ = [os.path.join(REF, "utils")]
    sys.modules.setdefault("utils", pkg)
    src = open(os.path.join(REF, "utils", "utils.py")).read()
    src = src.replace("\nrun_partitioning_example(k=20)", "\n")
    mod = types.ModuleType("utils.utils")
    mod.__file__ = os.path.join(REF, "utils", "utils.py")
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    sys.modules["utils.utils"] = mod
    import snapbases.constraintsComponents as ref_cc
    import snapbases.posComponents as ref_pc
    return ref_cc.constraintsComponents, ref_pc.posComponents


def time_reference_nonlinear(cc_cls, X, p, K):
    obj = cc_cls.__new__(cc_cls)
    obj.nonlinearSnapshots = types.SimpleNamespace(
        snapTensor=X.copy(), constraintsSize=p,
        num_constained_elements=X.shape[1] // p, dim=3)
    obj.param = types.SimpleNamespace(deim_desired_num_components=K)
    obj.geom_interpol_verts = []
    t0 = time.perf_counter()
    obj.compute_pod_for_vectorized_nonlinear_snapshots_tensor()
    t_pod = time.perf_counter() - t0
    t0 = time.perf_counter()
    obj.deim()
    t_deim = time.perf_counter() - t0
    return t_pod, t_deim


def time_reference_position_pca(pc_cls, traj, K):
    obj = pc_cls.__new__(pc_cls)
    obj.pos_snapshots = types.SimpleNamespace(
        snapTensor=traj.copy(), compute_geodesic_distance=None,
        nVerts=traj.shape[1], frs=traj.shape[0])
    obj.numComp = K
    obj.support = "global"
    obj.storeSingVal = False
    obj.basesType = "PCA"
    t0 = time.perf_counter()
    obj.extract_k_components(None)
    return time.perf_counter() - t0


SPLOCS_K = 20
# the reference's canonical iteration budget (config/config.json:46-47)
SPLOCS_ITERS = 20
SPLOCS_ADMM = 10


def _splocs_param():
    return types.SimpleNamespace(splocs_max_itrs=SPLOCS_ITERS,
                                 splocs_admm_num_itrs=SPLOCS_ADMM,
                                 splocs_lambda=2.0, splocs_rho=10.0)


def _splocs_snap_ns(traj, geod):
    return types.SimpleNamespace(snapTensor=traj.copy(),
                                 compute_geodesic_distance=geod,
                                 nVerts=traj.shape[1], frs=traj.shape[0])


def time_ours_splocs(traj, geod, C0, W0):
    from animsnapbases_tpu.bases.pca import PositionComponents

    obj = PositionComponents.__new__(PositionComponents)
    obj.pos_snapshots = _splocs_snap_ns(traj, geod)
    obj.numComp = SPLOCS_K
    obj.param = _splocs_param()
    obj.smooth_min_dist = 0.1
    obj.smooth_max_dist = 0.7
    obj.comps = C0.copy()
    obj.weigs = W0.copy()
    obj._support_cache = {}
    t0 = time.perf_counter()
    obj.splocs_glob_optimization(SPLOCS_ITERS, SPLOCS_ADMM)
    return time.perf_counter() - t0


def time_reference_splocs(pc_cls, traj, geod, C0, W0):
    obj = pc_cls.__new__(pc_cls)
    obj.pos_snapshots = _splocs_snap_ns(traj, geod)
    obj.numComp = SPLOCS_K
    obj.param = _splocs_param()
    obj.smooth_min_dist = 0.1
    obj.smooth_max_dist = 0.7
    obj.comps = C0.copy()
    obj.weigs = W0.copy()
    R0 = traj - np.tensordot(W0, C0, (1, 0))
    t0 = time.perf_counter()
    obj.splocs_glob_optimization(SPLOCS_ITERS, SPLOCS_ADMM, R0.copy(), geod)
    return time.perf_counter() - t0


FRAMES = 240          # > K_NL so a 200-mode POD exists (199 was the cap
                      # at the old 200-frame budget)
K_NL = 200            # BASELINE canonical: numComponents 200
K_POS = 200           # BASELINE canonical (config/config.json numComponents)
DEIM_KS = (100, 200)  # device-vs-host DEIM timed at both budgets
MEDIAN_RUNS = 5       # per-stage medians, VERDICT r2 item 4


def _median(xs):
    return float(np.median(np.asarray(list(xs), dtype=float)))


def record_canonical_fom():
    """240-frame bunny FOM recording (host f64 ground truth), cached."""
    cache = os.path.join(bench.BENCH_DIR, "bases200")
    marker = os.path.join(cache, "ready.json")
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                meta = json.load(fh)
        except (json.JSONDecodeError, OSError):
            meta = {}
        if (meta.get("scene") == bench._scene_key()
                and meta.get("frames") == FRAMES):
            return cache
        log(f"[bench-bases] cached FOM is from a different scene/budget "
            f"(or corrupt marker); rebuilding")
    import jax

    from animsnapbases_tpu.config.sim_config import default_sim_args
    from animsnapbases_tpu.sim.solver import Solver

    os.makedirs(cache, exist_ok=True)
    V, F, _ = bench.load_mesh()
    model = bench.build_model(V, F)
    solver = Solver(global_solve="host")
    solver.set_model(model)
    args = default_sim_args()
    args.dt = bench.DT
    with jax.default_device(jax.devices("cpu")[0]):
        solver.prepare(args)
        solver.store_assembly_matrices(cache)
        solver.set_record_path(cache)
        solver.set_store_p(True)
        solver.max_p_snapshots_num = FRAMES - 1
        t0 = time.perf_counter()
        traj = solver.run_steps(bench.gravity(model), FRAMES,
                                num_iterations=bench.FOM_ITERS, record=True)
    log(f"[bench-bases] recorded {FRAMES}-frame FOM in "
        f"{time.perf_counter() - t0:.1f}s")
    np.save(os.path.join(cache, "traj.npy"), traj)
    with open(marker, "w") as f:
        json.dump({"frames": FRAMES, "scene": bench._scene_key()}, f)
    return cache


def main():
    import jax

    cache_dir = os.path.join(bench.BENCH_DIR, "xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"[bench-bases] backend={jax.default_backend()}")

    record = record_canonical_fom()
    traj = np.load(os.path.join(record, "traj.npy"))

    # ---- OURS (TPU product pipeline) ----------------------------------
    # cold pass pays one-time XLA compiles (persistent-cached across
    # runs); MEDIAN_RUNS warm passes give per-stage medians (the shared
    # host CPU + tunnel made best-of-2 swing 1.6-3.6x across rounds)
    ours_nl_cold = None
    warm_stages = []
    for tag in ["cold"] + [f"warm{i}" for i in range(MEDIAN_RUNS)]:
        work = os.path.join(bench.BENCH_DIR, f"bases_bench_work_{tag}")
        timings = {}
        t0 = time.perf_counter()
        _, nl, cc = bench.build_group_basis(
            record, "tris_strain", 2, K_NL, frames=FRAMES - 1,
            work_dir=work, timings=timings)
        dt_nl = time.perf_counter() - t0
        if tag == "cold":
            ours_nl_cold = dt_nl
        else:
            warm_stages.append(timings)
    stages = {k: _median(t[k] for t in warm_stages) for k in warm_stages[0]}
    ours_nl = sum(stages.values())
    ours_nl_nostore = ours_nl - stages["store"]
    log(f"[bench-bases] ours nonlinear pipeline (prepare+POD+post+DEIM): "
        f"cold {ours_nl_cold:.2f}s, warm {ours_nl_nostore:.2f}s "
        f"(+{stages['store']:.2f}s store) "
        f"({cc.numComp} modes, {nl.snapTensor.shape} tensor); "
        f"stages {json.dumps({k: round(v, 2) for k, v in stages.items()})}")

    # device DEIM (lax.scan with incremental bordered inverse) vs the
    # host f64 loop, at BOTH canonical budgets (VERDICT r2 item 3).
    # Every pick must match the host loop's.  Since round 4 the DEVICE
    # scan IS the product default at these budgets (deim(device=None)
    # routes to it for K >= 64), so the headline "deim" stage below is
    # the device time; the host f64 loop stays a separate detail entry,
    # no min() mixing (round-2 advisor finding).
    deim_detail = {}
    picks_match = True
    device_wins = True
    k_restore = cc.numComp
    for Kd in DEIM_KS:
        cc.numComp = Kd
        host_t = []
        for _ in range(3):
            t0 = time.perf_counter()
            cc.deim(device=False)
            host_t.append(time.perf_counter() - t0)
        host_pt = cc.geom_Pt.copy()
        dev_t = []
        for i in range(4):
            t0 = time.perf_counter()
            cc.deim(device=True)
            dev_t.append(time.perf_counter() - t0)
        match = bool(np.array_equal(cc.geom_Pt, host_pt))
        picks_match = picks_match and match
        th, td = _median(host_t), _median(dev_t[1:])
        device_wins = device_wins and td < th
        deim_detail[f"deim_host_K{Kd}_s"] = round(th, 3)
        deim_detail[f"deim_device_K{Kd}_s"] = round(td, 3)
        deim_detail[f"deim_device_cold_K{Kd}_s"] = round(dev_t[0], 3)
        log(f"[bench-bases] DEIM K={Kd}: host {th:.3f}s, device {td:.3f}s"
            f" (cold {dev_t[0]:.2f}s); picks match host: {match}")
    cc.numComp = k_restore
    cc.deim()                 # restore the product-path state at K_NL
    if not device_wins:
        log("[bench-bases] WARNING: device DEIM did not beat the host "
            "loop at every budget")
    # headline "deim" stage = the product default at K_NL — since round 4
    # that is the DEVICE scan (VERDICT r3 item 3); stages holds ONLY
    # pipeline stages (their sum matches the pipeline wall-clock) —
    # per-budget host/device/cold timings ship under detail["deim_paths"]
    stages["deim"] = deim_detail[f"deim_device_K{K_NL}_s"]

    import jax.numpy as jnp

    from animsnapbases_tpu.bases import greedy
    from animsnapbases_tpu.utils.transfer import to_host_chunked

    times = []
    for _ in range(1 + MEDIAN_RUNS):
        t0 = time.perf_counter()
        Xd = jnp.asarray(traj)
        C, W, sig, res, idxs, _ = greedy.extract_global(Xd, K_POS)
        to_host_chunked(C)
        times.append(time.perf_counter() - t0)
    ours_pos_cold, ours_pos_warm = times[0], _median(times[1:])
    log(f"[bench-bases] ours position greedy PCA K={K_POS}: cold "
        f"{ours_pos_cold:.2f}s, warm {ours_pos_warm:.2f}s")

    # ---- REFERENCE (its own code, this CPU, same tensors) -------------
    ref_cc_cls, ref_pc_cls = load_reference_modules()
    X = nl.snapTensor.copy()
    with _quiet_reference():
        ref_pod, ref_deim = zip(*[
            time_reference_nonlinear(ref_cc_cls, X, 2, K_NL)
            for _ in range(2)])
        ref_pod, ref_deim = min(ref_pod), min(ref_deim)
    log(f"[bench-bases] reference pod_vectorized {ref_pod:.2f}s, "
        f"deim {ref_deim:.2f}s (CPU, same tensor, best of 2)")
    with _quiet_reference():
        ref_pos = min(time_reference_position_pca(ref_pc_cls, traj, K_POS)
                      for _ in range(2))
    log(f"[bench-bases] reference greedy PCA K={K_POS}: {ref_pos:.2f}s "
        f"(CPU, same trajectory, best of 2)")

    # ---- SPLOCS (BASELINE parity config 2: bunny PCA+SPLOCS) -----------
    from animsnapbases_tpu.geometry.geodesics import GeodesicDistance
    from animsnapbases_tpu.io.meshes import load_obj

    Vm, Fm, _ = bench.load_mesh()
    geod = GeodesicDistance(Vm, Fm)
    C0 = np.asarray(C)[:SPLOCS_K].copy()
    W0 = np.asarray(W)[:, :SPLOCS_K].copy()
    ours_splocs = min(time_ours_splocs(traj, geod, C0, W0)
                      for _ in range(2))
    with _quiet_reference():
        ref_splocs = time_reference_splocs(ref_pc_cls, traj, geod, C0, W0)
    log(f"[bench-bases] SPLOCS K={SPLOCS_K} x{SPLOCS_ITERS} iters: ours "
        f"{ours_splocs:.2f}s (best of 2), reference {ref_splocs:.2f}s "
        f"(CPU, same warm start + geodesic oracle)")

    # ---- FOM recording: device CG vs host LU --------------------------
    from animsnapbases_tpu.config.sim_config import default_sim_args
    from animsnapbases_tpu.sim.solver import Solver

    args = default_sim_args()
    args.dt = bench.DT

    def fom(mode, on_cpu):
        V, F, _ = bench.load_mesh()
        model = bench.build_model(V, F)
        s = Solver(global_solve=mode)
        s.set_model(model)
        if on_cpu:
            ctx = jax.default_device(jax.devices("cpu")[0])
        else:
            import contextlib
            ctx = contextlib.nullcontext()
        with ctx:
            s.prepare(args)
            s.run_steps(bench.gravity(model), 16,
                        num_iterations=bench.FOM_ITERS)   # warm/compile
            t0 = time.perf_counter()
            s.run_steps(bench.gravity(model), bench.FOM_FRAMES,
                        num_iterations=bench.FOM_ITERS)
            return time.perf_counter() - t0

    fom_host = fom("host", True)
    fom_cg = fom("cg", False)
    log(f"[bench-bases] FOM {bench.FOM_FRAMES} frames: host LU "
        f"{fom_host:.2f}s, device CG {fom_cg:.2f}s "
        f"({fom_host / fom_cg:.2f}x)")

    # ratio over the stages BOTH implementations execute (POD + DEIM +
    # greedy position PCA); snapshot IO/prepare and npz store are reported
    # in detail but not ratioed (the reference side is not instrumentable
    # equivalently)
    ours_total = (stages["pod"] + stages["deim"] + ours_pos_warm
                  + ours_splocs)
    ref_total = ref_pod + ref_deim + ref_pos + ref_splocs
    detail = {
        "ours_nonlinear_pipeline_s": round(ours_nl_nostore, 3),
        "ours_nonlinear_stage_s": {k: round(v, 3) for k, v in
                                   stages.items()},
        "ours_nonlinear_pipeline_cold_s": round(ours_nl_cold, 3),
        "ours_position_pca_cold_s": round(ours_pos_cold, 3),
        "ours_position_pca_warm_s": round(ours_pos_warm, 3),
        "reference_pod_vectorized_s": round(ref_pod, 3),
        "reference_deim_s": round(ref_deim, 3),
        "reference_position_pca_s": round(ref_pos, 3),
        "ours_splocs_s": round(ours_splocs, 3),
        "reference_splocs_s": round(ref_splocs, 3),
        "fom_recording_host_lu_s": round(fom_host, 2),
        "fom_recording_device_cg_s": round(fom_cg, 2),
        "reference_committed_time_logs_s": 0.0955,
        "device_deim_picks_match_host": picks_match,
        # per-budget host-vs-device DEIM timings (+ device cold compile),
        # substantiating "device beats host at K=100 AND K=200" in the
        # artifact itself, not just stderr logs
        "deim_paths": deim_detail,
        "device_deim_wins_all_budgets": device_wins,
        "nl_tensor_shape": list(nl.snapTensor.shape),
        "traj_shape": list(traj.shape),
        "k_nl": int(cc.numComp), "k_pos": int(K_POS),
    }
    log(f"[bench-bases] detail: {json.dumps(detail)}")
    print(json.dumps({
        "metric": "bases_compute_wallclock_bunny",
        "value": round(ours_total, 3),
        "unit": "s",
        "vs_baseline": round(ref_total / ours_total, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
