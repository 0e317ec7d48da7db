"""animsnapbases_tpu — a TPU-native framework for snapshot-based model reduction
of projective-dynamics deformable simulation.

Re-designed from scratch for JAX/XLA/Pallas on TPU, with the same capabilities
as the reference ShMonem/animSnapBases:

* snapshot ingestion & preprocessing (rigid alignment, mass weighting,
  standardization)  -> :mod:`animsnapbases_tpu.snapshots`
* position bases (greedy PCA / SPLOCS sparse-localized components)
  -> :mod:`animsnapbases_tpu.bases`
* constraint-projection bases (POD / blockwise PCA) + hyper-reduction
  interpolation points (DEIM / block-DEIM / geometric selection)
  -> :mod:`animsnapbases_tpu.bases`
* a full projective-dynamics simulator (6 constraint types, full-order and
  reduced solvers) as pure-functional jitted step functions
  -> :mod:`animsnapbases_tpu.sim`
* byte-exact interchange formats (.bin/.npy/.npz/.h5) shared with the
  reference ecosystem -> :mod:`animsnapbases_tpu.io`

Design stance (TPU-first, not a port):
  - struct-of-arrays constraint groups, batched projection kernels
    (vmapped closed-form 2x2/3x3 SVDs, Pallas for the hot path)
  - `lax.scan` greedy loops for basis extraction, static shapes throughout
  - prefactored dense solves on device; host sparse LU only for full-order
    parity replay at large N
  - scale-out via `jax.sharding.Mesh` + shard_map over batched linalg
"""

__version__ = "0.1.0"
