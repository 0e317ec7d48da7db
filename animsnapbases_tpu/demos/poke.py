"""Poke-trajectory generation and seed selection for the cloth snapshot
factory (behavior ref ``demos/calbacks.py:650-735``; independent
vectorized construction, pinned bit-exact by a parity test against the
reference recipe in ``tests/test_demos_cli.py``)."""

from __future__ import annotations

import numpy as np


def create_poke_z_motion_with_jumps(f_l: int, f_j: int, k: int,
                                    z_range: float = 1.0) -> np.ndarray:
    """z-motion repeating k times: 0 -> -z -> +z -> -z over f_l frames, then
    f_j paused frames.  Returns (k*(f_l+f_j), 3) with x = y = 0.

    Every cycle is identical, so ONE cycle is assembled from its four
    ramp segments (three open quarter-ramps plus a closed return ramp
    absorbing the ``f_l % 4`` remainder) and tiled k times — ``np.tile``
    replicates bitwise, so the output matches a per-cycle loop exactly."""
    q = f_l // 4
    z = float(z_range)
    ramps = ((0.0, -z, q, False),        # dip
             (-z, +z, q, False),         # swing up through rest
             (+z, -z, q, False),         # swing back down
             (-z, 0.0, f_l - 3 * q, True))   # settle to rest (closed)
    cycle = np.concatenate(
        [np.linspace(a, b, m, endpoint=closed)
         for a, b, m, closed in ramps] + [np.zeros(f_j)])
    z_all = np.tile(cycle, k)
    motion = np.zeros((z_all.size, 3))
    motion[:, 2] = z_all
    return motion


def voronoi_seeds_and_partition(V: np.ndarray, F: np.ndarray, k: int):
    """Center vertex + k farthest-point-sampled seeds on the 2D projection,
    with nearest-seed labels (ref :687-735, Euclidean approximation).

    Returns (seeds (k+1,), labels (n,))."""
    V2 = np.asarray(V)[:, :2]
    center_2d = V2.mean(axis=0)
    center_idx = int(np.argmin(np.linalg.norm(V2 - center_2d, axis=1)))

    seeds = [center_idx]
    for _ in range(k):
        d = np.min(np.linalg.norm(V2[:, None, :] - V2[None, seeds, :],
                                  axis=2), axis=1)
        d[seeds] = -1
        seeds.append(int(np.argmax(d)))
    seeds = np.array(seeds)

    dist_to_seeds = np.linalg.norm(V2[:, None, :] - V2[None, seeds, :],
                                   axis=2)
    labels = np.argmin(dist_to_seeds, axis=1)
    return seeds, labels
