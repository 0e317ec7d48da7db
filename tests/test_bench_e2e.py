"""End-to-end CPU drive of bench.py's full pipeline (the driver's
headline artifact): FOM record -> product bases -> reduced solver ->
certified ring-down timing -> one JSON line on stdout.

Runs main() itself (not a re-implementation) with tiny constants via
monkeypatching + the BENCH_CHUNK/BENCH_TRIALS env overrides, so scene
rework, cache-fingerprint, certificate, and JSON-schema regressions are
caught before the driver's real-TPU run at round end.
"""

import importlib
import io
import json
import sys

import numpy as np
import pytest


@pytest.fixture
def bench(tmp_path, monkeypatch):
    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("bench")

    monkeypatch.setattr(mod, "BENCH_DIR", str(tmp_path / "cache"))
    monkeypatch.setattr(mod, "FOM_FRAMES", 12)
    monkeypatch.setattr(mod, "POS_MODES", 10)
    monkeypatch.setattr(mod, "CONSTR_MODES", 6)
    monkeypatch.setenv("BENCH_CHUNK", "200")
    monkeypatch.setenv("BENCH_TRIALS", "2")

    def small_mesh():
        from animsnapbases_tpu.geometry.procedural import cloth_model

        V, F = cloth_model(9, 9)
        V = V / 9.0
        V[:, 2] += 0.05 * V[:, 0]
        V = V - V.mean(axis=0)
        return (V / np.abs(V).max()).astype(np.float64), \
            F.astype(np.int64), "tiny-cloth"

    monkeypatch.setattr(mod, "load_mesh", small_mesh)
    return mod


def test_bench_main_end_to_end(bench, capsys, monkeypatch):
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["metric"] == "reduced_pd_steps_per_sec_bunny"
    assert payload["unit"] == "steps/s"
    assert payload["value"] > 0
    # both fields are independently rounded (value to 0.1, vs_baseline to
    # 1e-3 = 10 steps/s), so compare with the rounding quantum, not rel
    assert payload["vs_baseline"] == pytest.approx(
        payload["value"] / 10_000.0, abs=5.1e-4)
    det = payload["detail"]
    assert det["damping"] == bench.DAMPING
    # the certificate value must be serialized and floor-clear
    assert det["end_min_y"] > 0.25 * bench.HANG_SHIFT

    # second run must reuse the cached artifacts (same scene fingerprint)
    meta1 = bench.run_fom_and_bases()
    meta2 = bench.run_fom_and_bases()
    assert meta1["scene"] == meta2["scene"] == bench._scene_key()

    # a scene change must invalidate the cache fingerprint
    monkeypatch.setattr(bench, "HANG_SHIFT", bench.HANG_SHIFT + 1.0)
    assert bench.run_fom_and_bases()["scene"] != meta1["scene"]


def test_aot_compile_probe_accepts_chunk_length():
    """scripts/prewarm.py passes num_steps=<production chunk> — the
    probe must accept it (round-4 review finding: the kwarg mismatch
    made the whole prewarm utility crash with TypeError)."""
    import inspect

    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("bench")
    sig = inspect.signature(mod.aot_compile_probe)
    assert "num_steps" in sig.parameters
    # and the probe still gates cleanly with no resident kernel
    class NoResident:
        _resident = None
    assert mod.aot_compile_probe(NoResident(), None, 10,
                                 num_steps=180000) is None
