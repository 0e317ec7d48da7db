"""Scripted demo scenarios — the snapshot factories.

Headless equivalents of the reference's polyscope user callbacks
(``projective_dynamics/demos/calbacks.py``): deterministic frame-keyed
schedules (fix/release sides, timed pokes with moving positional
constraints) that run the simulator and record the snapshots the basis
pipelines consume.  Rendering is optional and decoupled.
"""

from animsnapbases_tpu.demos.scenarios import (
    ScenarioDriver,
    SCENARIOS,
    build_scenario,
)
from animsnapbases_tpu.demos.poke import (
    create_poke_z_motion_with_jumps,
    voronoi_seeds_and_partition,
)
