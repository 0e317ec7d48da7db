"""Secondary scaling benchmark: reduced PD on the 51k-vertex Pittsburgh
bridge mesh (the reference's large demo asset, ``data/
PittsburghBridgeIsotropic.obj`` — 51,368 verts / 102,191 tris).

Reuses the bunny pipeline from ``bench.py`` with the bridge mesh and its
own cache directory.  At this scale the resident multi-step kernel may not
fit the per-core VMEM budget; ``AnimSnapBasesSolver`` then falls back to
the per-step fused Pallas kernel automatically — this script reports which
path ran (stderr) plus the usual one-line JSON (stdout).

Run:  python scripts/bench_bridge.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench.BUNNY_PATH = "/root/reference/data/PittsburghBridgeIsotropic.obj"
# hang far above the floor: over the bench's 45k-step timing horizon the
# chaotic free-swinging verts wander several units (physically
# meaningless, see PERFORMANCE.md long-horizon note) — a 5.0 hang let
# them graze the floor mid-chunk, mixing contact handling into what is
# meant to be the contact-free throughput measurement
bench.HANG_SHIFT = 50.0
bench.BENCH_DIR = os.path.join(
    os.path.dirname(os.path.abspath(bench.__file__)), "bench_cache_bridge")
bench.METRIC = "reduced_pd_steps_per_sec_bridge"
bench.FOM_FRAMES = 32          # FOM pass is host-LU bound at 51k verts
bench.POS_MODES = 64
bench.CONSTR_MODES = 32

if not os.path.exists(bench.BUNNY_PATH):
    # zero-egress fallback: a bridge-scale procedural cloth
    bench.log = getattr(bench, "log")
    bench.log("[bench-bridge] reference bridge mesh unavailable; "
              "using 227x227 procedural cloth (51,529 verts)")

    def _load_mesh():
        import numpy as np
        from animsnapbases_tpu.geometry.procedural import cloth_model
        V, F = cloth_model(227, 227)
        V = V / 227.0
        V[:, 2] += 0.05 * V[:, 0]
        V = V - V.mean(axis=0)
        return (V / abs(V).max()).astype(np.float64), F.astype(np.int64), \
            "bridge-scale-cloth"

    bench.load_mesh = _load_mesh

if __name__ == "__main__":
    bench.main()
