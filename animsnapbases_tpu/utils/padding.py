"""Shared padding policies.

Two padding rules are load-bearing invariants across the codebase and
must stay in sync everywhere they appear:

* :func:`pow2_pad` — timelines are padded to the next power of two by
  REPEATING THE LAST ENTRY, and device loops clamp their index, so one
  compilation serves every run length (the compilation-cache invariant
  of the resident kernels and batched serving).
* :func:`zero_pad_to_multiple` — arrays sharded over a mesh axis are
  ZERO-padded to a multiple of the axis size; zero rows never win the
  argmax of the greedy selections, so sharded and unsharded runs pick
  identically.
"""

from __future__ import annotations

import numpy as np


def pow2_pad(a, axis: int = 0):
    """Pad ``a`` along ``axis`` to the next power-of-two length by
    repeating the last slice (no-op when already a power of two).
    Works on numpy and jax arrays."""
    t = a.shape[axis]
    if t == 0:
        return a          # nothing to repeat; empty timelines pass through
    t_pad = 1 << max(t - 1, 0).bit_length()
    if t_pad <= t:
        return a
    if isinstance(a, np.ndarray):
        last = np.take(a, [-1], axis=axis)
        return np.concatenate(
            [a, np.repeat(last, t_pad - t, axis=axis)], axis=axis)
    import jax.numpy as jnp

    last = jnp.take(a, jnp.asarray([t - 1]), axis=axis)
    reps = [1] * a.ndim
    reps[axis] = t_pad - t
    return jnp.concatenate([a, jnp.tile(last, reps)], axis=axis)


def zero_pad_to_multiple(a, axis: int, multiple: int):
    """Zero-pad ``a`` along ``axis`` to a multiple of ``multiple``
    (no-op when already aligned).  Works on numpy and jax arrays."""
    pad = (-a.shape[axis]) % multiple
    if not pad:
        return a
    shape = list(a.shape)
    shape[axis] = pad
    if isinstance(a, np.ndarray):
        return np.concatenate(
            [a, np.zeros(shape, dtype=a.dtype)], axis=axis)
    import jax.numpy as jnp

    return jnp.concatenate(
        [a, jnp.zeros(shape, dtype=a.dtype)], axis=axis)
