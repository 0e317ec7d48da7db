"""Resident multi-step Pallas kernel: the entire reduced-PD simulation loop
on-chip.

The fused-iteration kernel (:mod:`animsnapbases_tpu.ops.pallas_reduced`)
left ~80 us/step of XLA work outside: predictor, floor clamp, the two
full-space matmuls (rb_const = -U^T A_c s_n and the lift q = s_n + U u), and
their kernel-launch overhead.  This kernel keeps EVERYTHING resident in
VMEM — state (3, N), the two big matrices (bf16 storage halves them to
~11 MB at bunny scale), and the iteration operands — and loops
``num_steps x num_iterations`` inside a single ``pallas_call``.

Prerequisite layout trick: vertices are PERMUTED so the selected-element
union forms a prefix of the vertex axis; the per-iteration "gather" of
s_n at selected vertices becomes a static column slice.  The solver applies
the permutation to all operands at prepare time and to the state at
entry/exit of ``run_steps``.

Supported exactly when the fused-iteration path is (all groups in DEIM row
form) and the VMEM budget fits; callers fall back to the two-level kernel
otherwise.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b, acc):
    return jnp.dot(a, b, preferred_element_type=acc)


def estimate_vmem_bytes(n_verts: int, r: int, n_sel: int, g_total: int,
                        m_total: int, mm_bytes: int, state_bytes: int) -> int:
    """Rough VMEM footprint of the resident kernel's operands."""
    big = 2 * 3 * n_verts * r * mm_bytes          # U lift + Ut A_c
    state = 4 * 3 * n_verts * state_bytes         # P, V, fext, sn
    small = (3 * r * n_sel + 3 * r * r + 3 * m_total * r
             + n_sel * g_total) * state_bytes
    return big + state + small + (1 << 20)


def build_resident_multistep(iteration_terms, gather_slices, layout,
                             G_allT: np.ndarray, WT_all: np.ndarray,
                             usel_inv: np.ndarray, inv3: np.ndarray,
                             U_liftT: np.ndarray, ut_acT: np.ndarray,
                             mass_inv: np.ndarray, dt: float,
                             floor: bool, floor_h: float,
                             n_sel: int,
                             interpret: bool = False):
    """Build run(P (3,N), V (3,N), fext (3,N), rb_seq (T,3,r), num_steps,
    num_iterations) -> (P', V').

    iteration_terms: operand dict from ``prepare_fused_operands``;
    U_liftT (3, r, N) and ut_acT (3, N, r) may be low-precision; rb_seq
    carries the per-STEP positional-target contribution (step i uses
    ``rb_seq[min(i, T-1)]`` — T == 1 for static targets, a pow2-padded
    timeline for animated ones, e.g. the poke scenarios)."""
    acc = jnp.float32 if U_liftT.dtype != np.float64 else jnp.float64
    r = inv3.shape[1]
    n = U_liftT.shape[2]
    dt2 = dt * dt

    flat_arrays = []
    for g in iteration_terms["flat_arrays"]:
        flat_arrays.append(jnp.asarray(g))
    term_dispatch = iteration_terms["dispatch"]

    const_inputs = [jnp.asarray(usel_inv), jnp.asarray(inv3),
                    jnp.asarray(WT_all), jnp.asarray(G_allT),
                    jnp.asarray(U_liftT), jnp.asarray(ut_acT),
                    jnp.asarray(mass_inv)]
    n_const = len(const_inputs) + len(flat_arrays)

    @partial(jax.jit, static_argnames=("num_iterations",))
    def _run(P0, V0, fext, rb_extra, steps_arr, consts, arrays,
             num_iterations):
        (usel_inv_a, inv3_a, WT_a, G_a, Ulift_a, utac_a, minv_a) = consts
        def kernel(*refs):
            (steps_ref, p_ref, v_ref, f_ref, rbex_ref, uselinv_ref, inv_ref,
             wt_ref, gall_ref, ulift_ref, utac_ref, minv_ref) = refs[:12]
            garrs = [ref[:] for ref in refs[12:12 + len(flat_arrays)]]
            out_p_ref, out_v_ref = refs[12 + len(flat_arrays):]

            # NOTE: the big (3, N, r)/(3, r, N) matrices stay as refs and
            # are sliced per dim — loading them wholesale would materialize
            # them on the kernel stack and blow the VMEM budget
            usel_inv = uselinv_ref[:]
            inv = inv_ref[:]
            WT = wt_ref[:]
            G_allT = gall_ref[:]
            m_inv = minv_ref[:]
            t_len = rbex_ref.shape[0]                  # (T, 3, r)
            # fext is constant across the whole call: fold dt^2 * f / m once
            fa = dt2 * f_ref[:] * m_inv
            mm_dtype = ulift_ref.dtype
            row_is_y = jax.lax.broadcasted_iota(jnp.int32, (3, n), 0) == 1

            def step(i, carry):
                P, V = carry
                # per-step positional-target term (animated schedules);
                # index clamps so pow2 padding reuses compilations.
                # Mosaic rejects dynamic_slice on VMEM values, but dynamic
                # ref loads with pl.ds on the leading axis lower fine.
                rb_extra = rbex_ref[pl.ds(jnp.minimum(i, t_len - 1), 1)][0]
                sn = P + dt * V + fa
                if floor:
                    sn = jnp.where(row_is_y & (sn < floor_h), floor_h, sn)
                # rb_const = -U^T A_c sn (+ positional extra)
                rb_const = rb_extra - jnp.concatenate(
                    [_dot(sn[d:d + 1].astype(mm_dtype), utac_ref[d], acc)
                     for d in range(3)], axis=0)             # (3, r)
                snT_sel = sn[:, :n_sel]

                def body(_, inner):
                    qT, _ = inner
                    Vall = _dot(qT, G_allT, acc)
                    p_parts = []
                    off = 0
                    for (kind, cnt, smin, smax, pflips, block), slices in \
                            zip(layout, gather_slices):
                        arrs = garrs[off:off + cnt]
                        off += cnt
                        gathered = [Vall[:, s:s + m] for s, m in slices]
                        p_parts.append(term_dispatch[kind](
                            gathered, arrs, smin, smax, pflips, block))
                    pT = (p_parts[0] if len(p_parts) == 1
                          else jnp.concatenate(p_parts, axis=1))
                    rb = rb_const + jnp.concatenate(
                        [_dot(pT[d:d + 1], WT[d], acc) for d in range(3)],
                        axis=0)
                    qT_new = snT_sel + jnp.concatenate(
                        [_dot(rb[d:d + 1], usel_inv[d], acc)
                         for d in range(3)], axis=0)
                    return qT_new, rb

                rb0 = jnp.zeros((3, r), dtype=sn.dtype)
                _, rb = jax.lax.fori_loop(0, num_iterations, body,
                                          (snT_sel, rb0))
                u = jnp.concatenate(
                    [_dot(rb[d:d + 1], inv[d], acc) for d in range(3)],
                    axis=0)                                   # (3, r)
                q = sn + jnp.concatenate(
                    [_dot(u[d:d + 1].astype(mm_dtype), ulift_ref[d], acc)
                     for d in range(3)], axis=0)              # (3, n)
                V_new = (q - P) / dt
                return q, V_new

            P_fin, V_fin = jax.lax.fori_loop(0, steps_ref[0, 0], step,
                                             (p_ref[:], v_ref[:]))
            out_p_ref[:] = P_fin
            out_v_ref[:] = V_fin

        out_shape = (jax.ShapeDtypeStruct((3, n), P0.dtype),
                     jax.ShapeDtypeStruct((3, n), P0.dtype))
        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                    * (4 + n_const))
        compiler_params = None
        if not interpret:
            # default scoped-vmem soft limit is 16 MB; the resident operands
            # plus matmul staging need a bit more headroom (v5e has 128 MB
            # per core; bridge-scale operands are ~41 MB)
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * (1 << 20))
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            compiler_params=compiler_params,
            interpret=interpret,
        )(steps_arr, P0, V0, fext, rb_extra, *consts, *arrays)

    def run(P0, V0, fext, rb_extra, num_steps, num_iterations):
        # operands passed as traced args (not closure constants): keeps the
        # HLO small and the persistent compilation cache effective
        steps_arr = jnp.asarray([[num_steps]], dtype=jnp.int32)
        return _run(P0, V0, fext, rb_extra, steps_arr,
                    tuple(const_inputs), tuple(flat_arrays),
                    num_iterations)

    return run
