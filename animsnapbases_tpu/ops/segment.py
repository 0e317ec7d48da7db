"""Segment-sum sparse application.

The PD assembly ``S^T p`` (sparse (N, e*p) times dense (e*p, 3)) and the
global-matrix matvec become gather + segment-sum on TPU — no sparse library
on device.  COO triplets are precomputed on host with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coo_matvec(rows: jnp.ndarray, cols: jnp.ndarray, vals: jnp.ndarray,
               x: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """y = A @ x for COO triplets of A (n_rows, n_cols), x (n_cols,)."""
    contrib = vals * x[cols]
    return jax.ops.segment_sum(contrib, rows, num_segments=n_rows)


def coo_matvec_cols(rows: jnp.ndarray, cols: jnp.ndarray, vals: jnp.ndarray,
                    X: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """Y = A @ X for COO A (n_rows, n_cols) and dense X (n_cols, d)."""
    contrib = vals[:, None] * X[cols]
    return jax.ops.segment_sum(contrib, rows, num_segments=n_rows)


def segment_sum_3d(values: jnp.ndarray, segment_ids: jnp.ndarray,
                   num_segments: int) -> jnp.ndarray:
    """Scatter-add rows of (M, 3) values into (num_segments, 3)."""
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)
