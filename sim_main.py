"""Simulation entry point (reference ``projective_dynamics/main.py``
equivalent).

Usage:
    python sim_main.py --example cloth_snapshots --record \
        --config configs/demos/testing.json
"""

from animsnapbases_tpu.sim_cli import cli

if __name__ == "__main__":
    cli()
