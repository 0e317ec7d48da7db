"""Poke-trajectory generation and seed selection for the cloth snapshot
factory (ref ``demos/calbacks.py:650-735``)."""

from __future__ import annotations

import numpy as np


def create_poke_z_motion_with_jumps(f_l: int, f_j: int, k: int,
                                    z_range: float = 1.0) -> np.ndarray:
    """z-motion repeating k times: 0 -> -z -> +z -> -z over f_l frames, then
    f_j paused frames.  Returns (k*(f_l+f_j), 3) with x = y = 0."""
    pattern = []
    for _ in range(k):
        quarter = f_l // 4
        z = z_range
        z_values = np.concatenate([
            np.linspace(0, -z, quarter, endpoint=False),
            np.linspace(-z, +z, quarter, endpoint=False),
            np.linspace(+z, -z, quarter, endpoint=False),
            np.linspace(-z, 0, f_l - 3 * quarter),
        ])
        pattern.append(z_values)
        pattern.append(np.zeros(f_j))
    z_all = np.concatenate(pattern)
    motion = np.zeros((len(z_all), 3))
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
