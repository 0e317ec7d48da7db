"""Multi-chip scaling via jax.sharding.

The reference has no distributed execution (SURVEY §2: joblib threads only).
The TPU-native scaling axes here are:

* **ensemble data-parallelism** — a batch of independent simulations
  (parameter sweeps, Monte-Carlo material sampling, the
  ``all_examples_bases_compute.sh`` style sweep) sharded across a mesh axis;
  zero collectives in the step.
* **element sharding (TP/SP analog)** — the constraint-element axis of the
  local stage split across a mesh axis with a psum of the assembled rhs,
  so one large simulation scales past a single chip's FLOPs/HBM.
* **tensor-parallel reduced stepping** — the production hyper-reduced
  solver's selected-element axis, displacement-form contraction, and
  position lift sharded over the mesh (``reduced_tp``).
* **sharded bases** — snapshot-POD Gram matmuls psum'd over the mesh
  (``ops.podlinalg.snapshot_pod_sharded``), used by the constraint- and
  position-basis pipelines.
"""

from animsnapbases_tpu.parallel.ensemble import (
    make_ensemble_step,
    make_element_sharded_step,
    build_device_mesh,
    mesh_from_shards,
)
from animsnapbases_tpu.parallel.reduced_tp import make_tp_reduced_step
