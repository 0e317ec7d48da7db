"""Device-side (jit-composable) self-collision resolution.

The reference resolves self-collisions on the host every step with a
KD-tree (``Constraint_projections.py:1311-1378``); over a high-latency
host<->TPU link that costs a round trip per step and breaks the
device-resident paths.  This module is the masked O(n*k) equivalent: for
every vertex, the k nearest triangle centroids are found on device
(distance matrix + ``top_k`` — bounded by ``n * m`` memory, so gated to
cloth-scale meshes), each candidate triangle is tested with a branchless
closest-point-on-triangle, and all pushout corrections accumulate in
parallel — the same math as :func:`collisions.resolve_self_collision_fast`
(which accumulates into a copy, so parallel accumulation is behavior-
identical up to candidate ties).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def closest_point_on_triangle(p, a, b, c):
    """Branchless Ericson closest-point: p (3,), triangle (a, b, c) -> (3,).

    Same region logic as the host ``_point_triangle_closest``; divisions are
    guarded so unselected branches cannot inject NaNs.
    """
    def safe_div(num, den):
        return num / jnp.where(jnp.abs(den) > 1e-30, den, 1.0)

    ab = b - a
    ac = c - a
    ap = p - a
    d1 = ab @ ap
    d2 = ac @ ap
    bp = p - b
    d3 = ab @ bp
    d4 = ac @ bp
    cp = p - c
    d5 = ab @ cp
    d6 = ac @ cp
    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    p_ab = a + safe_div(d1, d1 - d3) * ab
    p_ac = a + safe_div(d2, d2 - d6) * ac
    p_bc = b + safe_div(d4 - d3, (d4 - d3) + (d5 - d6)) * (c - b)
    denom = safe_div(1.0, va + vb + vc)
    p_face = a + ab * (vb * denom) + ac * (vc * denom)

    r1 = (d1 <= 0) & (d2 <= 0)
    r2 = (d3 >= 0) & (d4 <= d3)
    r3 = (d6 >= 0) & (d5 <= d6)
    r4 = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    r5 = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    r6 = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    out = p_face
    out = jnp.where(r6, p_bc, out)
    out = jnp.where(r5, p_ac, out)
    out = jnp.where(r4, p_ab, out)
    out = jnp.where(r3, c, out)
    out = jnp.where(r2, b, out)
    out = jnp.where(r1, a, out)
    return out


# budget on the O(n*m) candidate-distance SLAB: above this the (n, m)
# matrix is computed in row blocks of <= MAX_PAIRS pairs each (exact —
# top_k and min-reductions are row-independent) instead of materialized
# whole, so production-scale meshes run on device with bounded
# temporaries instead of failing the old hard gate (round-5: the gate
# capped the device tier at ~12k verts on cloth-density meshes)
MAX_PAIRS = 150_000_000


def _block_rows(n: int, m: int, max_pairs: int) -> int:
    """Rows per slab so rows*m <= max_pairs (>=8, sublane-aligned)."""
    rows = max(8, int(max_pairs // max(m, 1)))
    rows = min(n, rows - rows % 8 if rows % 8 and rows > 8 else rows)
    return max(1, rows)


def _candidate_distances(q, faces, k: int, max_pairs: int, what: str):
    """Shared candidate pipeline: k-nearest-centroid triangles per vertex
    and the exact closest-point distances to them.

    Returns ``(delta (n, k, 3), d (n, k), own (n, k))``.  BOTH the
    pushout pass and the clearance probe MUST go through this helper:
    the resident serving tier's certificate ("the pass is the identity
    exactly when the probed clearance is >= min_dist") is sound only
    while the probe and the pass test the SAME candidate set with the
    same metric — tuning k, the centroid metric, or the pair budget in
    one without the other silently breaks certified windows."""
    n = q.shape[0]
    m = faces.shape[0]
    k = min(k, m)
    cent = q[faces].mean(axis=1)                            # (m, 3)
    cc = jnp.sum(cent * cent, axis=1)[None, :]              # (1, m)
    if n * m > max_pairs:
        # row-blocked candidate selection: identical per-row top_k (rows
        # are independent), but only a (rows, m) slab lives at a time —
        # this is what admits >=25k-vert meshes to the device tier
        rows = _block_rows(n, m, max_pairs)
        nblk = -(-n // rows)
        qp = jnp.pad(q, ((0, nblk * rows - n), (0, 0)))

        def block(qi):
            d2 = (jnp.sum(qi * qi, axis=1)[:, None] + cc
                  - 2.0 * qi @ cent.T)                      # (rows, m)
            return jax.lax.top_k(-d2, k)[1]

        idx = jax.lax.map(block, qp.reshape(nblk, rows, 3))
        idx = idx.reshape(-1, k)[:n]                        # (n, k)
    else:
        # squared centroid distances via the matmul identity
        # (MXU-friendly), one slab
        d2 = (jnp.sum(q * q, axis=1)[:, None] + cc
              - 2.0 * q @ cent.T)                           # (n, m)
        _, idx = jax.lax.top_k(-d2, k)                      # (n, k)

    cand = faces[idx]                                       # (n, k, 3)
    own = jnp.any(cand == jnp.arange(n)[:, None, None], axis=-1)  # (n, k)
    tri = q[cand]                                           # (n, k, 3, 3)

    closest = jax.vmap(jax.vmap(closest_point_on_triangle,
                                in_axes=(None, 0, 0, 0)),
                       in_axes=(0, 0, 0, 0))(
        q, tri[:, :, 0], tri[:, :, 1], tri[:, :, 2])        # (n, k, 3)
    delta = q[:, None, :] - closest
    d = jnp.linalg.norm(delta, axis=-1)                     # (n, k)
    return delta, d, own


def resolve_self_collision_device(q, faces, min_dist: float = 0.001,
                                  stiffness: float = 1.0, k: int = 5,
                                  max_pairs: int = MAX_PAIRS):
    """Vertex-vs-nearest-triangles pushout, fully on device.

    q (n, 3) float, faces (m, 3) int.  Returns corrected positions.
    """
    delta, d, own = _candidate_distances(q, faces, k, max_pairs,
                                         "self-collision")
    push = (~own) & (d > 1e-8) & (d < min_dist)
    corr = (stiffness * (min_dist - d) / jnp.maximum(d, 1e-12))[..., None] \
        * delta * push[..., None]
    return q + corr.sum(axis=1)


def min_clearance_lower_bound_device(q, faces,
                                     max_pairs: int = MAX_PAIRS):
    """CHEAP conservative clearance: ``min over non-own triangles of
    (|p - centroid| - R_tri)`` with R_tri the triangle's circumscribing
    centroid radius.

    Every point of a triangle lies within R of its centroid, so this is
    a LOWER bound on the exact point-triangle distance pair-wise, hence
    on :func:`min_clearance_device`'s probe over its k-nearest candidate
    subset — a window admitted from this bound is always admissible
    under the exact probe (soundness direction: bound <= probe).

    Cost: one (n, 3) x (3, m) matmul + elementwise min-reduction —
    measured ~17x cheaper than the exact probe on an 80x80 cloth (the
    exact probe's ``top_k`` over the (n, m) matrix costs ~28 ms on TPU;
    at ring-down velocities the serving tier re-probes every few
    thousand steps, which made the probe ~20%% of the whole sc serving
    cost).  The serving tier uses it first and falls back to the exact
    probe only when the bound can't admit a full window."""
    n = q.shape[0]
    m = faces.shape[0]
    cent = q[faces].mean(axis=1)                            # (m, 3)
    R = jnp.sqrt(((q[faces] - cent[:, None, :]) ** 2)
                 .sum(axis=-1)).max(axis=1)                 # (m,)
    cc = jnp.sum(cent * cent, axis=1)[None, :]
    if n * m > max_pairs:
        # row-blocked (exact: a global min of per-slab mins).  Padded
        # rows sit at 1e18 so their distances dominate every real one.
        rows = _block_rows(n, m, max_pairs)
        nblk = -(-n // rows)
        pad = nblk * rows - n
        qp = jnp.pad(q, ((0, pad), (0, 0)), constant_values=1e18)
        vi = jnp.arange(nblk * rows).reshape(nblk, rows)

        def block(args):
            qi, vii = args
            d2 = (jnp.sum(qi * qi, axis=1)[:, None] + cc
                  - 2.0 * qi @ cent.T)
            d = jnp.sqrt(jnp.maximum(d2, 0.0))
            own = (faces[None, :, :] == vii[:, None, None]).any(-1)
            return jnp.where(own, jnp.inf, d - R[None, :]).min()

        return jax.lax.map(block, (qp.reshape(nblk, rows, 3), vi)).min()
    d2 = (jnp.sum(q * q, axis=1)[:, None] + cc
          - 2.0 * q @ cent.T)                               # (n, m)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    own = (faces[None, :, :] == jnp.arange(n)[:, None, None]).any(-1)
    return jnp.where(own, jnp.inf, d - R[None, :]).min()


def min_clearance_device(q, faces, k: int = 5,
                         max_pairs: int = MAX_PAIRS):
    """Minimum vertex-to-nearest-non-own-triangle distance over the SAME
    candidate set the pushout pass tests (shared helper
    :func:`_candidate_distances` — the sharing IS the correctness
    argument).  The pass :func:`resolve_self_collision_device` is the
    IDENTITY exactly when this clearance is >= its ``min_dist`` — the
    proximity-gated resident serving tier (reduced.py
    ``_run_steps_self_collision``) uses that equivalence to certify
    windows where skipping the per-step pass changes nothing."""
    _, d, own = _candidate_distances(q, faces, k, max_pairs,
                                     "clearance probe")
    return jnp.where(own, jnp.inf, d).min()


def make_collide_jit(faces):
    """Jitted ``q -> resolved q`` closure over a FIXED face array.

    Solvers cache the result keyed on the faces object and must rebuild it
    when the model changes (stale faces silently push against the wrong
    triangles — XLA clamps out-of-range gathers instead of erroring)."""
    import jax

    faces_j = jnp.asarray(faces)
    return jax.jit(lambda q: resolve_self_collision_device(q, faces_j))
