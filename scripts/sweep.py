"""Parallel bases-compute sweep.

The reference sweep (``all_examples_bases_compute.sh``) runs 16 configs
sequentially in one process.  Here each config is an independent worker
process; on a multi-chip host each worker can be pinned to its own chip via
JAX_VISIBLE_DEVICES (the configs are embarrassingly parallel — SURVEY §5.8).

Usage:
    python scripts/sweep.py configs/examples/*.json [--jobs N] [--per-chip]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor


def run_config(cfg: str, device: int | None, repo_root: str) -> tuple[str, int]:
    env = dict(os.environ)
    if device is not None:
        env["JAX_VISIBLE_DEVICES"] = str(device)
    proc = subprocess.run(
        [sys.executable, "main.py", "--config_file", cfg],
        cwd=repo_root, env=env, capture_output=True, text=True)
    if proc.returncode != 0:
        sys.stderr.write(f"--- {cfg} FAILED ---\n{proc.stderr[-2000:]}\n")
    return cfg, proc.returncode


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="+")
    ap.add_argument("--jobs", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--per-chip", action="store_true",
                    help="pin worker i to TPU chip i % n_devices")
    args = ap.parse_args(argv)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_devices = 1
    if args.per_chip:
        import jax
        n_devices = len(jax.devices())

    results = []
    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        futures = []
        for i, cfg in enumerate(args.configs):
            dev = (i % n_devices) if args.per_chip else None
            futures.append(pool.submit(run_config, cfg, dev, repo_root))
        for fut in futures:
            results.append(fut.result())

    failed = [cfg for cfg, rc in results if rc != 0]
    print(f"sweep: {len(results) - len(failed)}/{len(results)} configs ok")
    if failed:
        print("failed:", *failed, sep="\n  ")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
