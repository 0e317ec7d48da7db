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


# scoped-VMEM ceiling for the resident kernels (v5e: 128 MB/core;
# ~16 MB left for the runtime).  The former 100 MB ceiling left the
# last ~12 MB of the core unused and rejected the 100k-vertex affine
# kernel by 2.55 MB.
SCOPED_VMEM_LIMIT = 112 * (1 << 20)


def _dot(a, b, acc):
    return jnp.dot(a, b, preferred_element_type=acc)


def _dot_nt(x, wT, acc):
    """``x @ wT.T`` without materializing the transpose: contracts the
    MINOR dims of both operands (the MXU-native NT form).  Lets
    (r, N)-layout operands keep N on the lane axis — an (N, r) layout
    pads r up to the 128-lane VMEM tile (16x waste at r=8, 2.7x at
    r=48), which is what capped resident-kernel model sizes."""
    return jax.lax.dot_general(
        x, wT, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc)


def estimate_vmem_bytes(n_verts: int, r: int, n_sel: int, g_total: int,
                        m_total: int, mm_bytes: int, state_bytes: int,
                        nb: int = 1) -> int:
    """TILING-AWARE VMEM footprint of the resident kernel's operands
    (``nb`` batched sims share the big matrices; only per-sim state
    scales).

    VMEM arrays tile as (sublane, 128-lane) blocks — sublane count 8
    for 4-byte and 16 for 2-byte elements — so the MINOR dim pads to a
    multiple of 128 and the second-minor to the sublane count.  Layout
    therefore dominates the real footprint: an (N, r) array pads r up
    to 128 (16x waste at r=8), which is why the big matrices are stored
    (3, r, N) with N on the lane axis (see ``_dot_nt``)."""
    def pad(x, m):
        return -(-x // m) * m

    lane_n = pad(n_verts, 128)
    mm_sub = 8 if mm_bytes >= 4 else 16
    st_sub = 8 if state_bytes >= 4 else 16
    # U lift + Ut A_c, both (3, r, N): N on lanes, r on sublanes
    big = 2 * 3 * pad(r, mm_sub) * lane_n * mm_bytes
    # P, V, fext, sn — dim-major (3nb, N) state rows
    state = 4 * pad(3 * nb, st_sub) * lane_n * state_bytes
    small = (3 * pad(r, st_sub) * pad(n_sel, 128)      # U_selT
             + 3 * pad(r, st_sub) * pad(g_total, 128)  # C_allT
             + 3 * pad(r, st_sub) * pad(r, 128)        # inv3 / M_utac
             + 3 * pad(m_total, st_sub) * pad(r, 128)  # WT_all
             + pad(n_sel, st_sub) * pad(g_total, 128)  # G_allT
             ) * state_bytes
    # per-sim iteration temporaries (Vall, pT, qT)
    temps = (pad(3 * nb, st_sub)
             * (pad(g_total, 128) + pad(m_total, 128) + pad(n_sel, 128))
             * state_bytes)
    return big + state + small + temps + (1 << 20)


def estimate_chunked_vmem_bytes(n_verts: int, r: int, n_sel: int,
                                g_total: int, m_total: int,
                                mm_bytes: int, state_bytes: int,
                                nb: int = 1,
                                floor_exact: bool = True,
                                fold_vc: bool = True) -> int:
    """TILING-AWARE VMEM footprint of the CHUNKED affine kernel's
    operands (:func:`build_resident_affine_chunked`).

    The chunked kernel carries only coefficient state: of the big
    (3, r, N) matrices it sees just the y-slice of the lift (for the
    exact per-step floor check), plus (nb, N) y-rows of the anchors and
    three (3nb, n_sel) selected-prefix slices — so its footprint scales
    as ~(r*mm_bytes + 3*state_bytes)*N instead of the full-kernel
    ~(6*r*mm_bytes + 16*state_bytes)*N, which is what lets models far
    past the resident gate keep stepping at the affine rate."""
    def pad(x, m):
        return -(-x // m) * m

    lane_n = pad(n_verts, 128)
    mm_sub = 8 if mm_bytes >= 4 else 16
    st_sub = 8 if state_bytes >= 4 else 16
    # U_lift[y] (r, N): N on lanes — only staged when the kernel keeps
    # the in-kernel exact floor fallback; exact-free kernels receive an
    # (8, 128) dummy, making yrows the only O(N) operand
    big = (pad(r, mm_sub) * lane_n * mm_bytes if floor_exact
           else 8 * 128 * mm_bytes)
    # b0y/b1y/fay packed as ONE (3nb, N) operand — three separate
    # (nb, N) arrays each pad nb up to the 8-sublane tile (24 sublanes
    # of VMEM at nb=1 instead of 8).  Exact-free kernels receive only
    # the packed (6nb, 1) per-sim min/max (the XLA body reduces the
    # y-rows outside): NO O(N) operand at all — admission is then
    # HBM-bound (the lift matrices), not VMEM-bound
    yrows = (pad(3 * nb, st_sub) * lane_n * state_bytes if floor_exact
             else pad(6 * nb, st_sub) * 128 * state_bytes)
    # Vc-folded kernels (default) stage the G-composed prefix products
    # (g_total wide) and precomposed UG instead of the n_sel-wide
    # prefixes + U_selT, and G_allT leaves the kernel entirely
    sel_lanes = pad(g_total if fold_vc else n_sel, 128)
    small = (3 * pad(3 * nb, st_sub) * sel_lanes        # b0s/b1s/fas
             + 3 * pad(r, st_sub) * sel_lanes            # uselT / UG
             + 3 * pad(r, st_sub) * pad(g_total, 128)    # C_allT
             + 2 * 3 * pad(r, st_sub) * pad(r, 128)      # inv3 / M_utac
             + 3 * pad(m_total, st_sub) * pad(r, 128)    # WT_all
             + (0 if fold_vc
                else pad(n_sel, st_sub) * pad(g_total, 128))  # G_allT
             ) * state_bytes
    temps = (pad(3 * nb, st_sub)
             * (pad(g_total, 128) + pad(m_total, 128)
                + (0 if fold_vc else pad(n_sel, 128)))
             * state_bytes)
    return big + yrows + small + temps + (1 << 20)


def _make_iteration_loop(layout, gather_slices, term_dispatch, garrs,
                         WT, G_allT, C_all, r, acc, nb=1):
    """The hyper-reduced local-global iteration loop shared by the
    resident kernels: iterate(snT_sel (3nb, n_sel), rb_const (3nb, r),
    num_iterations) -> rb (3nb, r).  ``nb`` batched sims ride as
    dim-major row blocks (rows [d*nb:(d+1)*nb] = dim d of all sims).

    LATENCY-FOLDED loop (roofline, round 4): these kernels are
    issue-latency bound — the per-iteration chain of serially-dependent
    dots sets the step time, not FLOPs (measured 0.56 us/iteration,
    MXU utilization 0.16 %).  The loop carries ``rb`` and forms the
    gathered vertex values directly,
    ``Vall = (snT_sel + rb usel_inv) G_allT = Vc + rb C_all``, with
    ``Vc = snT_sel G_allT`` hoisted out of the loop and
    ``C_all = usel_inv G_allT`` precomposed on the host in f64
    (``prepare_fused_operands``) — TWO dependent dots per iteration
    (rb -> Vall -> pT -> rb) instead of three.  Numerically sound where
    a qT-space fold is not: rb_const and pT WT keep cancelling in
    r-space (the displacement form's f32-stability mechanism — folding
    usel_inv into WT instead measurably diverges under contact), and
    only the well-scaled gathered values are re-associated.  Iteration 1
    is bit-identical to the qT-carried form (rb0 = 0); FLOPs drop too
    (r*g_total < n_sel*g_total)."""
    def iterate(snT_sel, rb_const, num_iterations):
        return iterate.from_vc(_dot(snT_sel, G_allT, acc), rb_const,
                               num_iterations)

    def _from_vc(Vc, rb_const, num_iterations):
        """Entry for callers that already hold the hoisted
        ``Vc = snT_sel G_allT`` (the Vc-folded chunked kernel forms it
        straight from coefficient state via precomposed operands)."""

        def body(_, rb):
            Vall = Vc + jnp.concatenate(
                [_dot(rb[d * nb:(d + 1) * nb], C_all[d], acc)
                 for d in range(3)], axis=0)
            p_parts = []
            off = 0
            for (kind, cnt, smin, smax, pflips, block), slices in \
                    zip(layout, gather_slices):
                arrs = garrs[off:off + cnt]
                off += cnt
                gathered = [Vall[:, s:s + m] for s, m in slices]
                p_parts.append(term_dispatch[kind](
                    gathered, arrs, smin, smax, pflips, block, nb))
            pT = (p_parts[0] if len(p_parts) == 1
                  else jnp.concatenate(p_parts, axis=1))
            return rb_const + jnp.concatenate(
                [_dot(pT[d * nb:(d + 1) * nb], WT[d], acc)
                 for d in range(3)], axis=0)

        rb0 = jnp.zeros((3 * nb, r), dtype=Vc.dtype)
        return jax.lax.fori_loop(0, num_iterations, body, rb0)

    iterate.from_vc = _from_vc
    return iterate


def _make_affine_ctx(p_ref, v_ref, f_ref, minv_ref, ulift_ref, utac_ref,
                     mutac, uselT, inv, iterate,
                     b0_ref, b1_ref, bu0_ref, bu1_ref,
                     ap_ref, av_ref, wp_ref, wv_ref, stale_ref,
                     nb, r, n_sel, dt, dt2, eta, acc):
    """Shared trace-time helpers of the AFFINE-coordinate kernels (the
    contact-capable/lean build and the tier-1 early-exit build).

    These are plain Python closures over the same expressions each
    kernel previously inlined — tracing them produces identical jaxprs,
    so sharing cannot re-introduce the Mosaic staging tax that motivated
    keeping the kernels separate (only the traced branch structure
    matters); it removes the triplicated source that every affine-math
    change (damping, rebase, anchoring) had to be applied to in lockstep.
    """
    from types import SimpleNamespace

    mm_dtype = ulift_ref.dtype
    m_inv = minv_ref[:]
    fa = dt2 * f_ref[:] * m_inv                 # constant per call
    # base-coefficient selectors (identity rows over [b0, b1, fa]) built
    # in-kernel: pallas cannot capture host constants
    _col = jax.lax.broadcasted_iota(jnp.int32, (3 * nb, 3), 1)
    e0 = (_col == 0).astype(fa.dtype)
    e1 = (_col == 1).astype(fa.dtype)
    e2 = (_col == 2).astype(fa.dtype)
    zw = jnp.zeros((3 * nb, r), dtype=fa.dtype)
    fa_sel = fa[:, :n_sel]
    fa_y = fa[nb:2 * nb]
    bu_fa = jnp.concatenate(
        [_dot_nt(fa[d * nb:(d + 1) * nb].astype(mm_dtype),
                 utac_ref[d], acc)
         for d in range(3)], axis=0)            # (3nb, r)

    def _damp(v):
        return v if eta == 1.0 else eta * v

    def project_base(X):
        """(3nb, r) rows of X through U^T A_c (bf16-storage NT dots;
        utac is stored (3, r, N) so N rides the lane axis)."""
        return jnp.concatenate(
            [_dot_nt(X[d * nb:(d + 1) * nb].astype(mm_dtype),
                     utac_ref[d], acc)
             for d in range(3)], axis=0)

    def materialize(a, w):
        """(3nb, N) state from base coefficients + reduced coords."""
        out = (a[:, 0:1] * b0_ref[:] + a[:, 1:2] * b1_ref[:]
               + a[:, 2:3] * fa)
        return out + jnp.concatenate(
            [_dot(w[d * nb:(d + 1) * nb].astype(mm_dtype),
                  ulift_ref[d], acc)
             for d in range(3)], axis=0)

    def init_anchors():
        """Anchor the bases at the entry state; base projections (bu)
        are computed LAZILY (stale flag)."""
        b0_ref[:] = p_ref[:]
        b1_ref[:] = v_ref[:]
        ap_ref[:] = e0
        av_ref[:] = e1
        wp_ref[:] = zw
        wv_ref[:] = zw
        stale_ref[0, 0] = 1

    def refresh_bu():
        @pl.when(stale_ref[0, 0] == 1)
        def _():
            bu0_ref[:] = project_base(b0_ref[:])
            bu1_ref[:] = project_base(b1_ref[:])
            stale_ref[0, 0] = 0

    def predictor():
        """Read the coefficient state and form the damped predictor."""
        ap = ap_ref[:]
        av = av_ref[:]
        wp = wp_ref[:]
        wv = wv_ref[:]
        avd = _damp(av)
        asn = ap + dt * avd + e2
        wsn = wp + dt * _damp(wv)
        return ap, av, wp, wv, avd, asn, wsn

    def y_predictor(asn, wsn):
        """Materialize ONLY the y rows of the predictor (one
        (nb, r) x (r, N) dot) — the exact floor-contact check."""
        return (asn[nb:2 * nb, 0:1] * b0_ref[nb:2 * nb]
                + asn[nb:2 * nb, 1:2] * b1_ref[nb:2 * nb]
                + asn[nb:2 * nb, 2:3] * fa_y
                + _dot(wsn[nb:2 * nb].astype(mm_dtype),
                       ulift_ref[1], acc))

    def rebase():
        """Re-anchor the base pair at the CURRENT materialized state and
        reset the coefficients (affine mode)."""
        Pf = materialize(ap_ref[:], wp_ref[:])
        Vf = materialize(av_ref[:], wv_ref[:])
        b0_ref[:] = Pf
        b1_ref[:] = Vf
        ap_ref[:] = e0
        av_ref[:] = e1
        wp_ref[:] = zw
        wv_ref[:] = zw
        stale_ref[0, 0] = 1

    def free_step(asn, wsn, avd, wp, rb_ex, num_iterations):
        """One contact-free step entirely in affine coordinates."""
        refresh_bu()
        rb_lin = (asn[:, 0:1] * bu0_ref[:]
                  + asn[:, 1:2] * bu1_ref[:]
                  + asn[:, 2:3] * bu_fa
                  + jnp.concatenate(
                      [_dot(wsn[d * nb:(d + 1) * nb],
                            mutac[d], acc)
                       for d in range(3)], axis=0))
        rb_const = rb_ex - rb_lin
        snT_sel = (asn[:, 0:1] * b0_ref[:, :n_sel]
                   + asn[:, 1:2] * b1_ref[:, :n_sel]
                   + asn[:, 2:3] * fa_sel
                   + jnp.concatenate(
                       [_dot(wsn[d * nb:(d + 1) * nb],
                             uselT[d], acc)
                        for d in range(3)], axis=0))
        rb = iterate(snT_sel, rb_const, num_iterations)
        u = jnp.concatenate(
            [_dot(rb[d * nb:(d + 1) * nb], inv[d], acc)
             for d in range(3)], axis=0)
        wq = wsn + u
        # aq == asn and (aq - ap)/dt == eta*av + e2/dt exactly: update
        # coefficients without the cancellation-prone subtract
        ap_ref[:] = asn
        av_ref[:] = avd + e2 / dt
        wp_ref[:] = wq
        wv_ref[:] = (wq - wp) / dt

    return SimpleNamespace(
        fa=fa, e0=e0, e1=e1, e2=e2, zw=zw, fa_sel=fa_sel, fa_y=fa_y,
        bu_fa=bu_fa, damp=_damp, project_base=project_base,
        materialize=materialize, init_anchors=init_anchors,
        refresh_bu=refresh_bu, predictor=predictor,
        y_predictor=y_predictor, rebase=rebase, free_step=free_step)


def _make_runners(_body, const_inputs, flat_arrays):
    """Wrap a resident-kernel body into ``run`` (rb timeline passed with
    the call) and ``run.windowed`` (window sliced from a device-resident
    schedule INSIDE the same jit — a separate jit for the slice would
    cost a full host round trip per chunk on tunneled hosts)."""
    _run = partial(jax.jit, static_argnames=("num_iterations",))(_body)

    @partial(jax.jit, static_argnames=("num_iterations", "t_window"))
    def _run_windowed(P0, V0, fext, rb_full, start, steps_arr, consts,
                      arrays, num_iterations, t_window):
        idx = jnp.minimum(start + jnp.arange(t_window),
                          rb_full.shape[0] - 1)
        return _body(P0, V0, fext, rb_full[idx], steps_arr, consts,
                     arrays, num_iterations)

    def run(P0, V0, fext, rb_extra, num_steps, num_iterations):
        # operands passed as traced args (not closure constants): keeps the
        # HLO small and the persistent compilation cache effective
        steps_arr = jnp.asarray([[num_steps]], dtype=jnp.int32)
        return _run(P0, V0, fext, rb_extra, steps_arr,
                    tuple(const_inputs), tuple(flat_arrays),
                    num_iterations)

    def run_windowed(P0, V0, fext, rb_full, start, t_window, num_steps,
                     num_iterations):
        """One-dispatch animated stepping: slices the (T_total, 3, r)
        device-resident rb schedule at ``start`` (clamped) inside the same
        jit as the kernel."""
        steps_arr = jnp.asarray([[num_steps]], dtype=jnp.int32)
        return _run_windowed(P0, V0, fext, rb_full,
                             jnp.asarray(start, dtype=jnp.int32),
                             steps_arr, tuple(const_inputs),
                             tuple(flat_arrays), num_iterations,
                             t_window)

    def run_raw(P0, V0, fext, rb_extra, steps_arr, num_iterations):
        """Unjitted body with the consts pre-bound — for callers that fuse
        their own state packing/unpacking into ONE jit around the kernel
        (one dispatch per chunk matters on tunneled hosts)."""
        return _body(P0, V0, fext, rb_extra, steps_arr,
                     tuple(const_inputs), tuple(flat_arrays),
                     num_iterations)

    def aot_compile(P0, V0, fext, rb_extra, num_steps, num_iterations):
        """Client-side lower+compile of the kernel for these operand
        shapes, WITHOUT dispatching.  Writes the executable into the
        persistent compilation cache, so the later jitted call is a cache
        hit — letting benchmarks attribute cold-start time to client
        compile vs server-side first-dispatch load separately."""
        steps_arr = jnp.asarray([[num_steps]], dtype=jnp.int32)
        lowered = _run.lower(P0, V0, fext, rb_extra, steps_arr,
                             tuple(const_inputs), tuple(flat_arrays),
                             num_iterations=num_iterations)
        return lowered.compile()

    run.windowed = run_windowed
    run.raw = run_raw
    run.aot_compile = aot_compile
    # for callers that jit their own wrapper around the kernel: pass
    # `operands` as TRACED args of that jit (baking them in as closure
    # constants embeds the tens-of-MB matrices in the HLO — slow
    # lowering, bloated persistent-cache entries)
    run.body = _body
    run.operands = (tuple(const_inputs), tuple(flat_arrays))
    return run


def build_resident_multistep(iteration_terms, gather_slices, layout,
                             G_allT: np.ndarray, WT_all: np.ndarray,
                             inv3: np.ndarray,
                             U_liftT: np.ndarray, ut_acT: np.ndarray,
                             mass_inv: np.ndarray, dt: float,
                             floor: bool, floor_h: float,
                             n_sel: int,
                             interpret: bool = False, nb: int = 1,
                             eta: float = 1.0):
    """Build run(P (3nb,N), V (3nb,N), fext (3nb,N), rb_seq (T,3nb,r),
    num_steps, num_iterations) -> (P', V').

    ``eta`` = 1 - damping: the predictor uses the damped velocity
    ``s_n = q + dt*eta*v + dt^2 M^-1 f`` while the stored velocity stays
    the raw ``(q_new - q)/dt`` — identical semantics across every step
    path (default 1.0 reproduces the reference exactly).

    iteration_terms: operand dict from ``prepare_fused_operands``;
    U_liftT and ut_acT (both (3, r, N) — N on the lane axis; an
    (N, r) minor-dim layout pads r to the 128-lane VMEM tile) may
    be low-precision; rb_seq
    carries the per-STEP positional-target contribution (step i uses
    ``rb_seq[min(i, T-1)]`` — T == 1 for static targets, a pow2-padded
    timeline for animated ones, e.g. the poke scenarios).

    ``nb`` > 1 serves a BATCH of independent sims sharing the prepared
    model in one kernel: state rows are dim-major blocks (rows
    [d*nb:(d+1)*nb] = dim d of all sims), so every per-dim matvec
    becomes an (nb, ·) x (·, ·) matmul — near-free on the MXU, which is
    what converts this latency-bound kernel into ensemble throughput."""
    acc = jnp.float32 if U_liftT.dtype != np.float64 else jnp.float64
    r = inv3.shape[1]
    n = U_liftT.shape[2]
    dt2 = dt * dt
    dtv = dt * eta          # velocity-damped predictor coefficient

    flat_arrays = []
    for g in iteration_terms["flat_arrays"]:
        flat_arrays.append(jnp.asarray(g))
    term_dispatch = iteration_terms["dispatch"]

    # C_allT (latency-folded iterate; see _make_iteration_loop) replaces
    # usel_inv as the staged operand — the loop never lifts to qT
    const_inputs = [jnp.asarray(iteration_terms["C_allT"]),
                    jnp.asarray(inv3),
                    jnp.asarray(WT_all), jnp.asarray(G_allT),
                    jnp.asarray(U_liftT), jnp.asarray(ut_acT),
                    jnp.asarray(mass_inv)]
    n_const = len(const_inputs) + len(flat_arrays)

    def _body(P0, V0, fext, rb_extra, steps_arr, consts, arrays,
              num_iterations):
        (c_a, inv3_a, WT_a, G_a, Ulift_a, utac_a, minv_a) = consts
        def kernel(*refs):
            (steps_ref, p_ref, v_ref, f_ref, rbex_ref, c_ref, inv_ref,
             wt_ref, gall_ref, ulift_ref, utac_ref, minv_ref) = refs[:12]
            garrs = [ref[:] for ref in refs[12:12 + len(flat_arrays)]]
            out_p_ref, out_v_ref = refs[12 + len(flat_arrays):]

            # NOTE: the big (3, r, N) matrices stay as refs and
            # are sliced per dim — loading them wholesale would materialize
            # them on the kernel stack and blow the VMEM budget
            C_all = c_ref[:]
            inv = inv_ref[:]
            WT = wt_ref[:]
            G_allT = gall_ref[:]
            m_inv = minv_ref[:]
            t_len = rbex_ref.shape[0] // (3 * nb)   # rb as (3*nb*T, r):
            # 2D layout tiles densely and the per-step dynamic load is a
            # sublane-offset slice — a (T, 3, r) layout pads every (3, r)
            # step entry to an (8, 128) tile (5x VMEM, ~10 us/step loads)
            # fext is constant across the whole call: fold dt^2 * f / m once
            fa = dt2 * f_ref[:] * m_inv
            mm_dtype = ulift_ref.dtype
            if floor:
                # state-sized selector only traced when the clamp needs
                # it — dead (3nb, N) values add Mosaic staging pressure
                row_is_y = (jax.lax.broadcasted_iota(
                    jnp.int32, (3 * nb, n), 0) // nb) == 1
            iterate = _make_iteration_loop(layout, gather_slices,
                                           term_dispatch, garrs, WT,
                                           G_allT, C_all, r, acc, nb)

            def step(i, carry):
                P, V = carry
                # per-step positional-target term (animated schedules);
                # index clamps so pow2 padding reuses compilations.
                # Mosaic rejects dynamic_slice on VMEM values, but dynamic
                # ref loads with pl.ds on the leading axis lower fine.
                rb_extra = rbex_ref[
                    pl.ds(3 * nb * jnp.minimum(i, t_len - 1), 3 * nb)]
                sn = P + dtv * V + fa
                if floor:
                    sn = jnp.where(row_is_y & (sn < floor_h), floor_h, sn)
                # rb_const = -U^T A_c sn (+ positional extra); utac is
                # (3, r, N) — NT dot keeps N on the lane axis
                rb_const = rb_extra - jnp.concatenate(
                    [_dot_nt(sn[d * nb:(d + 1) * nb].astype(mm_dtype),
                             utac_ref[d], acc)
                     for d in range(3)], axis=0)             # (3nb, r)
                snT_sel = sn[:, :n_sel]
                rb = iterate(snT_sel, rb_const, num_iterations)
                u = jnp.concatenate(
                    [_dot(rb[d * nb:(d + 1) * nb], inv[d], acc)
                     for d in range(3)], axis=0)              # (3nb, r)
                q = sn + jnp.concatenate(
                    [_dot(u[d * nb:(d + 1) * nb].astype(mm_dtype),
                          ulift_ref[d], acc)
                     for d in range(3)], axis=0)              # (3nb, n)
                V_new = (q - P) / dt
                return q, V_new

            P_fin, V_fin = jax.lax.fori_loop(0, steps_ref[0, 0], step,
                                             (p_ref[:], v_ref[:]))
            out_p_ref[:] = P_fin
            out_v_ref[:] = V_fin

        out_shape = (jax.ShapeDtypeStruct((3 * nb, n), P0.dtype),
                     jax.ShapeDtypeStruct((3 * nb, n), P0.dtype))
        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                    * (4 + n_const))
        compiler_params = None
        if not interpret:
            # default scoped-vmem soft limit is 16 MB; the resident operands
            # plus matmul staging need a bit more headroom (v5e has 128 MB
            # per core; bridge-scale operands are ~41 MB)
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=SCOPED_VMEM_LIMIT)
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            compiler_params=compiler_params,
            interpret=interpret,
        )(steps_arr, P0, V0, fext,
          rb_extra.reshape(-1, rb_extra.shape[-1]), *consts, *arrays)

    return _make_runners(_body, const_inputs, flat_arrays)


def build_resident_affine(iteration_terms, gather_slices, layout,
                          G_allT: np.ndarray, WT_all: np.ndarray,
                          inv3: np.ndarray,
                          U_liftT: np.ndarray, ut_acT: np.ndarray,
                          M_utac: np.ndarray, U_selT: np.ndarray,
                          mass_inv: np.ndarray, dt: float,
                          floor: bool, floor_h: float,
                          n_sel: int, rebase_every: int = 256,
                          interpret: bool = False, nb: int = 1,
                          contact_mode: bool = True, eta: float = 1.0):
    """Affine-coordinate resident kernel: contact-free steps never touch
    the full vertex space.

    ``nb`` > 1 batches independent sims sharing the prepared model
    (dim-major row blocks, see :func:`build_resident_multistep`): the
    per-sim affine coefficients stack to (3nb, 3) and every per-dim
    contraction widens from one row to nb rows — per-step cost is nearly
    nb-independent, so aggregate ensemble throughput scales with the
    batch.  The floor-contact branch tests ALL sims' y rows at once; any
    contacting sim routes the whole batch through the exact full-space
    step (identical results — the clamp is an identity for airborne
    sims), so contact costs batch-wide what it cost solo.

    The PD recursion stays in the affine subspace
    ``span{P_entry, V_entry, fa} (+) range(U)`` as long as no full-space
    nonlinearity fires: positions/velocities are carried as (3, 3) base
    coefficients plus (3, r) reduced coordinates, so the per-step cost
    drops from two full (r x N) matvec pairs to a few r x r contractions —
    the (3, N) state is materialized once per call (and at periodic
    REBASES, see below), not once per step.

    Floor collision (the only full-space nonlinearity in a PD step) is
    handled EXACTLY with a two-mode state machine:

    * AFFINE mode (contact-free): each step materializes only the y rows
      of the predictor (one (nb, r) x (r, N) dot) and tests the clamp.
    * CONTACT mode (entered when any clamp fires): the floor only
      touches the y dimension, so x/z stay in affine coordinates while
      y is carried MATERIALIZED (Py/Vy (nb, N) scratch) together with
      incrementally-maintained projections buPy/buVy = U^T A_c-rows of
      Py/Vy.  A persistent-contact step then costs TWO big dots — the
      clamp-correction projection ``utac_y^T corr_y`` and the y-row lift
      ``u_y U_y`` — instead of the seven the old re-anchoring branch
      paid (full project_base + full lift + check), because the smooth
      part of ``U^T A_c sn`` comes from the recursions
      ``buPy' = buPy + dt buVy + bu_fa_y + pc + (M_utac u)_y``.
      The mode exits at the next periodic rebase (mixed-representation
      materialization), which also bounds the incremental-projection
      drift exactly like it bounds the affine coefficients.

    Contact-free stretches run at affine speed; contact-dominated
    stretches run at a bit under half affine speed (~2 of the ~5
    all-mode big dots per step are unavoidable in contact).

    ``contact_mode=False`` builds a LEANER kernel whose contact handling
    is a re-anchoring tail (exact standard full-space step on the
    materialized state, then re-anchor the affine base): measured on the
    51k-vertex bridge, the contact-mode machinery's presence slows the
    CONTACT-FREE loop ~4x (27k vs 108k steps/s — the cost scales with
    the vertex count, not operand bytes; the 14k-vertex bunny is
    unaffected even batched x8), so large models trade slower (rare)
    contact steps for full-speed free flight.  Both variants are exact.

    Exactness: identical math to :func:`build_resident_multistep` — the
    gravity/step recursions are linear and the nonlinear constraint
    projections only ever read the n_sel selected vertices, whose values
    are reconstructed exactly from the affine coordinates.

    Rebasing: the fa-coefficient of the velocity grows by 1/dt per step;
    left unchecked it reaches ~1e6 over long chunks and f32 cancellation
    eats the state.  Every ``rebase_every`` steps the kernel re-anchors
    the base pair (b0, b1) at the CURRENT materialized state and resets
    the coefficients — bounding all coefficients to O(rebase_every) — and
    re-projects the new bases through ut_acT (same bf16-storage rounding
    the standard kernel pays on every step's ``U^T A_c sn`` matvec).

    M_utac (3, r, r) = per-dim ``(U^T A_c) U`` (f32, host-precomputed);
    U_selT (3, r, n_sel) = plain selected-vertex basis rows (f32).

    ``eta`` = 1 - damping (see :func:`build_resident_multistep`): in
    affine coordinates ``asn = ap + dt*(eta*av) + e2`` so the velocity
    coefficient update becomes ``eta*av + e2/dt`` — the recursion stays
    exact for any eta.
    """
    acc = jnp.float32 if U_liftT.dtype != np.float64 else jnp.float64
    r = inv3.shape[1]
    n = U_liftT.shape[2]
    dt2 = dt * dt
    state_dtype = mass_inv.dtype

    def _damp(v):
        return v if eta == 1.0 else eta * v

    flat_arrays = [jnp.asarray(g) for g in iteration_terms["flat_arrays"]]
    term_dispatch = iteration_terms["dispatch"]

    const_inputs = [jnp.asarray(iteration_terms["C_allT"]),
                    jnp.asarray(inv3),
                    jnp.asarray(WT_all), jnp.asarray(G_allT),
                    jnp.asarray(U_liftT), jnp.asarray(ut_acT),
                    jnp.asarray(M_utac), jnp.asarray(U_selT),
                    jnp.asarray(mass_inv)]
    n_const = len(const_inputs) + len(flat_arrays)

    def _body(P0, V0, fext, rb_extra, steps_arr, consts, arrays,
              num_iterations):
        def kernel(*refs):
            (steps_ref, p_ref, v_ref, f_ref, rbex_ref, c_ref, inv_ref,
             wt_ref, gall_ref, ulift_ref, utac_ref, mutac_ref, uselt_ref,
             minv_ref) = refs[:14]
            garrs = [ref[:] for ref in refs[14:14 + len(flat_arrays)]]
            # the OUTPUT buffers double as the affine base anchors b0/b1:
            # the base is only read during the loop and the outputs are
            # only produced at the very end (as a materialization of the
            # final coefficients, staged through value temporaries), so
            # merging them saves two (3nb, N) VMEM buffers per kernel
            (out_p_ref, out_v_ref, bu0_ref, bu1_ref,
             ap_ref, av_ref, wp_ref, wv_ref, py_ref, vy_ref, bupy_ref,
             buvy_ref, stale_ref, mode_ref) = \
                refs[14 + len(flat_arrays):]
            b0_ref, b1_ref = out_p_ref, out_v_ref

            C_all = c_ref[:]
            inv = inv_ref[:]
            WT = wt_ref[:]
            G_allT = gall_ref[:]
            mutac = mutac_ref[:]
            uselT = uselt_ref[:]
            t_len = rbex_ref.shape[0] // (3 * nb)   # (3*nb*T, r) layout
            mm_dtype = ulift_ref.dtype
            iterate = _make_iteration_loop(layout, gather_slices,
                                           term_dispatch, garrs, WT,
                                           G_allT, C_all, r, acc, nb)
            ctx = _make_affine_ctx(p_ref, v_ref, f_ref, minv_ref,
                                   ulift_ref, utac_ref, mutac, uselT,
                                   inv, iterate, b0_ref, b1_ref,
                                   bu0_ref, bu1_ref, ap_ref, av_ref,
                                   wp_ref, wv_ref, stale_ref,
                                   nb, r, n_sel, dt, dt2, eta, acc)
            fa = ctx.fa
            e0, e1, e2, zw = ctx.e0, ctx.e1, ctx.e2, ctx.zw
            fa_sel, fa_y, bu_fa = ctx.fa_sel, ctx.fa_y, ctx.bu_fa
            _damp = ctx.damp
            materialize = ctx.materialize
            project_base = ctx.project_base
            _refresh_bu = ctx.refresh_bu
            if floor:
                row_is_y = (jax.lax.broadcasted_iota(
                    jnp.int32, (3 * nb, n), 0) // nb) == 1

            ctx.init_anchors()
            mode_ref[0, 0] = 0          # 0 = affine, 1 = contact-y
            if floor and contact_mode:
                bu_fa_y = bu_fa[nb:2 * nb]
                py_ref[:] = jnp.zeros((nb, n), dtype=fa.dtype)
                vy_ref[:] = jnp.zeros((nb, n), dtype=fa.dtype)
                bupy_ref[:] = jnp.zeros((nb, r), dtype=fa.dtype)
                buvy_ref[:] = jnp.zeros((nb, r), dtype=fa.dtype)

            def _y_rows(full, y_block):
                """Replace the y dim-block of a dim-major array."""
                return jnp.concatenate(
                    [full[0:nb], y_block, full[2 * nb:]], axis=0)

            def step(i, carry):
                do = jnp.logical_and(
                    i > 0,
                    jax.lax.rem(i, jnp.asarray(rebase_every,
                                               dtype=i.dtype)) == 0)

                @pl.when(do & (mode_ref[0, 0] == 0))
                def _rebase():
                    ctx.rebase()

                if floor and contact_mode:
                    # contact-mode rebase: mixed materialization (x/z
                    # affine, y from the materialized scratch) — also the
                    # EXIT back to affine mode, bounding the incremental
                    # buPy/buVy drift exactly like the coefficient drift
                    @pl.when(do & (mode_ref[0, 0] == 1))
                    def _rebase_contact():
                        Pf = _y_rows(materialize(ap_ref[:], wp_ref[:]),
                                     py_ref[:])
                        Vf = _y_rows(materialize(av_ref[:], wv_ref[:]),
                                     vy_ref[:])
                        b0_ref[:] = Pf
                        b1_ref[:] = Vf
                        ap_ref[:] = e0
                        av_ref[:] = e1
                        wp_ref[:] = zw
                        wv_ref[:] = zw
                        stale_ref[0, 0] = 1
                        mode_ref[0, 0] = 0

                mode = mode_ref[0, 0]
                ap, av, wp, wv, avd, asn, wsn = ctx.predictor()
                rb_ex = rbex_ref[
                    pl.ds(3 * nb * jnp.minimum(i, t_len - 1), 3 * nb)]

                def affine_step():
                    ctx.free_step(asn, wsn, avd, wp, rb_ex,
                                  num_iterations)

                if floor and contact_mode:
                    def contact_mode_step():
                        """One exact step in contact mode: x/z ride the
                        affine coefficients (whose y rows are unused);
                        y is materialized with incrementally-maintained
                        projections.  TWO big dots: pc and the y lift."""
                        _refresh_bu()
                        # the outer asn/wsn/avd are still exact here:
                        # neither the rebase blocks (they run before the
                        # outer reads) nor _enter_contact (it only writes
                        # py/vy/bupy/buvy + the mode flag) touch
                        # ap/av/wp/wv between those reads and this step
                        asn_, wsn_, avd_ = asn, wsn, avd
                        sn_y = py_ref[:] + dt * _damp(vy_ref[:]) + fa_y
                        sn_y_cl = jnp.maximum(sn_y, floor_h)
                        corr_y = sn_y_cl - sn_y
                        pc = _dot_nt(corr_y.astype(mm_dtype),
                                     utac_ref[1], acc)        # (nb, r)
                        # projection of the damped y predictor (buVy is
                        # the projection of Vy, so eta rides through)
                        bupsn = (bupy_ref[:] + dt * _damp(buvy_ref[:])
                                 + bu_fa_y)
                        rb_lin_a = (asn_[:, 0:1] * bu0_ref[:]
                                    + asn_[:, 1:2] * bu1_ref[:]
                                    + asn_[:, 2:3] * bu_fa
                                    + jnp.concatenate(
                                        [_dot(wsn_[d * nb:(d + 1) * nb],
                                              mutac[d], acc)
                                         for d in range(3)], axis=0))
                        rb_const = rb_ex - _y_rows(rb_lin_a, bupsn + pc)
                        snsel_a = (asn_[:, 0:1] * b0_ref[:, :n_sel]
                                   + asn_[:, 1:2] * b1_ref[:, :n_sel]
                                   + asn_[:, 2:3] * fa_sel
                                   + jnp.concatenate(
                                       [_dot(wsn_[d * nb:(d + 1) * nb],
                                             uselT[d], acc)
                                        for d in range(3)], axis=0))
                        snT_sel = _y_rows(snsel_a, sn_y_cl[:, :n_sel])
                        rb = iterate(snT_sel, rb_const, num_iterations)
                        u = jnp.concatenate(
                            [_dot(rb[d * nb:(d + 1) * nb], inv[d], acc)
                             for d in range(3)], axis=0)
                        # x/z: standard affine coefficient updates (the y
                        # rows of these arrays are dead in contact mode)
                        wq = wsn_ + u
                        wp_old = wp
                        ap_ref[:] = asn_
                        av_ref[:] = avd_ + e2 / dt
                        wp_ref[:] = wq
                        wv_ref[:] = (wq - wp_old) / dt
                        # y: materialized update + projection recursions
                        u_y = u[nb:2 * nb]
                        q_y = sn_y_cl + _dot(u_y.astype(mm_dtype),
                                             ulift_ref[1], acc)
                        vy_ref[:] = (q_y - py_ref[:]) / dt
                        py_ref[:] = q_y
                        bup_new = bupsn + pc + _dot(u_y, mutac[1], acc)
                        buvy_ref[:] = (bup_new - bupy_ref[:]) / dt
                        bupy_ref[:] = bup_new

                    @pl.when(mode == 0)
                    def _affine_mode():
                        # exact contact check on the y-row predictor
                        sn_y = ctx.y_predictor(asn, wsn)
                        clamped = jnp.any(sn_y < floor_h)

                        @pl.when(jnp.logical_not(clamped))
                        def _free():
                            affine_step()

                        @pl.when(clamped)
                        def _enter_contact():
                            # materialize the y state + its projections
                            # from the affine coordinates and flip the
                            # mode flag; the single contact-mode block
                            # below (re-read flag) runs THIS step too
                            _refresh_bu()
                            apy = ap[nb:2 * nb]
                            avy = av[nb:2 * nb]
                            wpy = wp[nb:2 * nb]
                            wvy = wv[nb:2 * nb]
                            py_ref[:] = (
                                apy[:, 0:1] * b0_ref[nb:2 * nb]
                                + apy[:, 1:2] * b1_ref[nb:2 * nb]
                                + apy[:, 2:3] * fa_y
                                + _dot(wpy.astype(mm_dtype),
                                       ulift_ref[1], acc))
                            vy_ref[:] = (
                                avy[:, 0:1] * b0_ref[nb:2 * nb]
                                + avy[:, 1:2] * b1_ref[nb:2 * nb]
                                + avy[:, 2:3] * fa_y
                                + _dot(wvy.astype(mm_dtype),
                                       ulift_ref[1], acc))
                            bupy_ref[:] = (
                                apy[:, 0:1] * bu0_ref[nb:2 * nb]
                                + apy[:, 1:2] * bu1_ref[nb:2 * nb]
                                + apy[:, 2:3] * bu_fa_y
                                + _dot(wpy, mutac[1], acc))
                            buvy_ref[:] = (
                                avy[:, 0:1] * bu0_ref[nb:2 * nb]
                                + avy[:, 1:2] * bu1_ref[nb:2 * nb]
                                + avy[:, 2:3] * bu_fa_y
                                + _dot(wvy, mutac[1], acc))
                            mode_ref[0, 0] = 1

                    # ONE inline serves both steady contact (mode was 1)
                    # and the entry step (the affine branch just flipped
                    # the flag): re-read the flag
                    @pl.when(mode_ref[0, 0] == 1)
                    def _contact():
                        contact_mode_step()
                elif floor:
                    # lean contact variant (contact_mode=False, large
                    # models): exact standard step on the materialized
                    # state, then re-anchor the affine base — no extra
                    # per-step state for Mosaic to keep resident
                    sn_y = ctx.y_predictor(asn, wsn)
                    clamped = jnp.any(sn_y < floor_h)

                    @pl.when(jnp.logical_not(clamped))
                    def _free():
                        affine_step()

                    # NOTE: deliberately NO anchored fast path here — a
                    # third iterate inline measurably taxes the UNTAKEN
                    # contact-free loop at large N (bridge: 108k -> 35k
                    # steps/s with it present), which is the regime this
                    # lean variant exists for.  Contact-dominated large
                    # models pay the two materialization dots per step.
                    @pl.when(clamped)
                    def _contact_reanchor():
                        P = materialize(ap, wp)
                        sn = materialize(asn, wsn)
                        sn = jnp.where(row_is_y & (sn < floor_h),
                                       floor_h, sn)
                        rb_const = rb_ex - project_base(sn)
                        rb = iterate(sn[:, :n_sel], rb_const,
                                     num_iterations)
                        u = jnp.concatenate(
                            [_dot(rb[d * nb:(d + 1) * nb], inv[d], acc)
                             for d in range(3)], axis=0)
                        q = sn + jnp.concatenate(
                            [_dot(u[d * nb:(d + 1) * nb].astype(mm_dtype),
                                  ulift_ref[d], acc)
                             for d in range(3)], axis=0)
                        b0_ref[:] = q
                        b1_ref[:] = (q - P) / dt
                        ap_ref[:] = e0
                        av_ref[:] = e1
                        wp_ref[:] = zw
                        wv_ref[:] = zw
                        stale_ref[0, 0] = 1
                else:
                    affine_step()
                return carry

            jax.lax.fori_loop(0, steps_ref[0, 0], step, 0)

            @pl.when(mode_ref[0, 0] == 0)
            def _out_affine():
                # both materializations read b0/b1 (= the out buffers):
                # compute BOTH values before either store
                Pf = materialize(ap_ref[:], wp_ref[:])
                Vf = materialize(av_ref[:], wv_ref[:])
                out_p_ref[:] = Pf
                out_v_ref[:] = Vf

            if floor and contact_mode:
                @pl.when(mode_ref[0, 0] == 1)
                def _out_contact():
                    Pf = _y_rows(
                        materialize(ap_ref[:], wp_ref[:]), py_ref[:])
                    Vf = _y_rows(
                        materialize(av_ref[:], wv_ref[:]), vy_ref[:])
                    out_p_ref[:] = Pf
                    out_v_ref[:] = Vf

        out_shape = (jax.ShapeDtypeStruct((3 * nb, n), P0.dtype),
                     jax.ShapeDtypeStruct((3 * nb, n), P0.dtype))
        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                    * (4 + n_const))
        compiler_params = None
        if not interpret:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=SCOPED_VMEM_LIMIT)
        sdt = jnp.dtype(state_dtype)
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.VMEM((3 * nb, r), sdt),      # bu0
                            pltpu.VMEM((3 * nb, r), sdt),      # bu1
                            pltpu.VMEM((3 * nb, 3), sdt),      # ap
                            pltpu.VMEM((3 * nb, 3), sdt),      # av
                            pltpu.VMEM((3 * nb, r), sdt),      # wp
                            pltpu.VMEM((3 * nb, r), sdt),      # wv
                # contact-mode y state (token-sized unless the
                            # machinery is built AND can fire)
                            pltpu.VMEM((nb, n) if floor and contact_mode
                                       else (1, 1), sdt),      # Py
                            pltpu.VMEM((nb, n) if floor and contact_mode
                                       else (1, 1), sdt),      # Vy
                            pltpu.VMEM((nb, r) if floor and contact_mode
                                       else (1, 1), sdt),      # buPy
                            pltpu.VMEM((nb, r) if floor and contact_mode
                                       else (1, 1), sdt),      # buVy
                            pltpu.SMEM((1, 1), jnp.int32),    # bu stale
                            pltpu.SMEM((1, 1), jnp.int32)],   # mode
            compiler_params=compiler_params,
            interpret=interpret,
        )(steps_arr, P0, V0, fext,
          rb_extra.reshape(-1, rb_extra.shape[-1]), *consts, *arrays)

    return _make_runners(_body, const_inputs, flat_arrays)


def build_resident_affine_exit(iteration_terms, gather_slices, layout,
                               G_allT: np.ndarray, WT_all: np.ndarray,
                               inv3: np.ndarray,
                               U_liftT: np.ndarray, ut_acT: np.ndarray,
                               M_utac: np.ndarray, U_selT: np.ndarray,
                               mass_inv: np.ndarray, dt: float,
                               floor_h: float, n_sel: int,
                               rebase_every: int = 256,
                               interpret: bool = False, nb: int = 1,
                               eta: float = 1.0):
    """TIER-1 affine kernel: pure contact-free stepping with EARLY EXIT.

    Carries no contact-handling code at all — each step checks the floor
    clamp exactly (the y-row predictor materialization) and, on the
    FIRST would-be contact, stops WITHOUT applying that step, returning
    the completed-step count alongside the state.  The caller finishes
    the chunk on a contact-capable kernel and may retry this one later.

    Why a separate kernel: the mere textual presence of contact-handling
    branches (however untaken) taxes Mosaic's contact-free loop at large
    N — measured on the 51k-vertex bridge: ~300k steps/s for this
    contact-less graph vs 108k for the lean variant vs 27k for the
    contact-mode build.  Stripping the handling into its own kernel
    recovers the full rate for the (dominant) contact-free regime while
    keeping floor contact exact through the two-tier dispatch.

    Returns run(P (3nb, N), V, fext, rb_seq, num_steps, num_iterations)
    -> (P', V', steps_done (1, 1) int32); state reflects exactly
    ``steps_done`` completed steps.  ``run.windowed`` as usual.
    """
    acc = jnp.float32 if U_liftT.dtype != np.float64 else jnp.float64
    r = inv3.shape[1]
    n = U_liftT.shape[2]
    dt2 = dt * dt
    state_dtype = mass_inv.dtype

    def _damp(v):
        return v if eta == 1.0 else eta * v

    flat_arrays = [jnp.asarray(g) for g in iteration_terms["flat_arrays"]]
    term_dispatch = iteration_terms["dispatch"]

    const_inputs = [jnp.asarray(iteration_terms["C_allT"]),
                    jnp.asarray(inv3),
                    jnp.asarray(WT_all), jnp.asarray(G_allT),
                    jnp.asarray(U_liftT), jnp.asarray(ut_acT),
                    jnp.asarray(M_utac), jnp.asarray(U_selT),
                    jnp.asarray(mass_inv)]
    n_const = len(const_inputs) + len(flat_arrays)

    def _body(P0, V0, fext, rb_extra, steps_arr, consts, arrays,
              num_iterations):
        def kernel(*refs):
            (steps_ref, p_ref, v_ref, f_ref, rbex_ref, c_ref, inv_ref,
             wt_ref, gall_ref, ulift_ref, utac_ref, mutac_ref, uselt_ref,
             minv_ref) = refs[:14]
            garrs = [ref[:] for ref in refs[14:14 + len(flat_arrays)]]
            (out_p_ref, out_v_ref, out_k_ref, bu0_ref,
             bu1_ref, ap_ref, av_ref, wp_ref, wv_ref, stale_ref,
             done_ref) = refs[14 + len(flat_arrays):]
            # as in the contact-capable kernel: the output buffers double
            # as the affine base anchors (base read during the loop,
            # outputs written only at the very end through temporaries)
            b0_ref, b1_ref = out_p_ref, out_v_ref

            C_all = c_ref[:]
            inv = inv_ref[:]
            WT = wt_ref[:]
            G_allT = gall_ref[:]
            mutac = mutac_ref[:]
            uselT = uselt_ref[:]
            t_len = rbex_ref.shape[0] // (3 * nb)
            iterate = _make_iteration_loop(layout, gather_slices,
                                           term_dispatch, garrs, WT,
                                           G_allT, C_all, r, acc, nb)
            ctx = _make_affine_ctx(p_ref, v_ref, f_ref, minv_ref,
                                   ulift_ref, utac_ref, mutac, uselT,
                                   inv, iterate, b0_ref, b1_ref,
                                   bu0_ref, bu1_ref, ap_ref, av_ref,
                                   wp_ref, wv_ref, stale_ref,
                                   nb, r, n_sel, dt, dt2, eta, acc)
            materialize = ctx.materialize

            ctx.init_anchors()
            done_ref[0, 0] = 0
            out_k_ref[0, 0] = 0

            def step(i, carry):
                # once a contact is detected the remaining trip counts
                # are near-free no-ops (fori_loop cannot break; the
                # guarded body costs one SMEM read + branch)
                @pl.when(done_ref[0, 0] == 0)
                def _active():
                    do = jnp.logical_and(
                        i > 0,
                        jax.lax.rem(i, jnp.asarray(rebase_every,
                                                   dtype=i.dtype)) == 0)

                    @pl.when(do)
                    def _rebase():
                        ctx.rebase()

                    _, _, wp, _, avd, asn, wsn = ctx.predictor()
                    rb_ex = rbex_ref[
                        pl.ds(3 * nb * jnp.minimum(i, t_len - 1), 3 * nb)]

                    # exact contact check on the y-row predictor
                    sn_y = ctx.y_predictor(asn, wsn)
                    clamped = jnp.any(sn_y < floor_h)

                    @pl.when(clamped)
                    def _exit():
                        # stop BEFORE applying the contacting step; the
                        # state stays at exactly out_k completed steps
                        done_ref[0, 0] = 1

                    @pl.when(jnp.logical_not(clamped))
                    def _free():
                        ctx.free_step(asn, wsn, avd, wp, rb_ex,
                                      num_iterations)
                        out_k_ref[0, 0] = out_k_ref[0, 0] + 1
                return carry

            jax.lax.fori_loop(0, steps_ref[0, 0], step, 0)
            # both materializations read b0/b1 (= the out buffers):
            # compute BOTH values before either store
            Pf = materialize(ap_ref[:], wp_ref[:])
            Vf = materialize(av_ref[:], wv_ref[:])
            out_p_ref[:] = Pf
            out_v_ref[:] = Vf

        out_shape = (jax.ShapeDtypeStruct((3 * nb, n), P0.dtype),
                     jax.ShapeDtypeStruct((3 * nb, n), P0.dtype),
                     jax.ShapeDtypeStruct((1, 1), jnp.int32))
        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                    * (4 + n_const))
        compiler_params = None
        if not interpret:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=SCOPED_VMEM_LIMIT)
        sdt = jnp.dtype(state_dtype)
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            scratch_shapes=[pltpu.VMEM((3 * nb, r), sdt),      # bu0
                            pltpu.VMEM((3 * nb, r), sdt),      # bu1
                            pltpu.VMEM((3 * nb, 3), sdt),      # ap
                            pltpu.VMEM((3 * nb, 3), sdt),      # av
                            pltpu.VMEM((3 * nb, r), sdt),      # wp
                            pltpu.VMEM((3 * nb, r), sdt),      # wv
                            pltpu.SMEM((1, 1), jnp.int32),    # bu stale
                            pltpu.SMEM((1, 1), jnp.int32)],   # done
            compiler_params=compiler_params,
            interpret=interpret,
        )(steps_arr, P0, V0, fext,
          rb_extra.reshape(-1, rb_extra.shape[-1]), *consts, *arrays)

    return _make_runners(_body, const_inputs, flat_arrays)


def build_resident_affine_chunked(iteration_terms, gather_slices, layout,
                                  G_allT: np.ndarray, WT_all: np.ndarray,
                                  inv3: np.ndarray,
                                  U_liftT: np.ndarray, ut_acT: np.ndarray,
                                  M_utac: np.ndarray, U_selT: np.ndarray,
                                  mass_inv: np.ndarray, dt: float,
                                  floor_h: float, n_sel: int,
                                  rebase_every: int = 256,
                                  interpret: bool = False, nb: int = 1,
                                  eta: float = 1.0,
                                  floor_bound_skip: bool = True,
                                  floor_exact: bool = True,
                                  fold_vc: bool = True,
                                  static_rb: bool = True,
                                  sqrt_free_bound: bool = True):
    """CHUNKED tier-1 affine kernel: rebase and materialization move OUT
    of the Pallas kernel into an XLA ``while_loop`` around it, so the
    kernel carries only COEFFICIENT state.

    Motivation (measured on a 100,489-vertex cloth): the in-kernel
    affine builds hit a Mosaic register-spill regime at ~100k vertices —
    the tier-1 kernel (:func:`build_resident_affine_exit`) spills
    69.6 MB and OOMs, and even the lean contact variant, which compiles,
    runs SLOWER than the standard kernel (15-27k vs 39k steps/s) because
    the rebase/materialize branches keep the full (3, r, N) matrices and
    (3, N) anchors textually live inside the step loop.  Splitting the
    loop removes all of that from Mosaic's sight:

    * The KERNEL steps up to ``rebase_every`` contact-free affine steps
      on (3nb, 3) base coefficients + (3nb, r) reduced coordinates.  Its
      only O(N) operands are the y-slice of the lift (r, N) — for the
      exact per-step floor check — ONE packed (3nb, N) array holding
      the anchor/force y-rows (packed so nb=1 pays one 8-sublane tile,
      not three), and the (3nb, n_sel) selected-prefix slices.  No
      rebase branch, no
      materialize, no (3, N) state: VMEM scales as ~(r*mm + 12)*N bytes
      instead of ~(6r*mm + 64)*N, admitting ~700k-vertex models at
      r=48/bf16.
    * The XLA loop body materializes the post-chunk state (two lift
      matmuls streaming U from HBM), re-anchors, and re-projects the new
      anchors through U^T A_c — exactly the in-kernel rebase, but as
      plain XLA dots every ``rebase_every`` steps (~0.4 us/step
      amortized at 100k vertices).

    Early exit semantics match :func:`build_resident_affine_exit`: the
    FIRST would-be clamped step stops the kernel without applying it;
    the XLA loop breaks, materializes the committed state, and run()
    returns (P', V', steps_done (1, 1) int32) — the caller finishes the
    window on a contact-capable kernel.

    Exactness: identical math to the in-kernel affine builds — the same
    coefficient recursions, the same rebase formula (at chunk
    boundaries, i.e. ``rebase_every`` semantics), the same bf16-storage
    rounding on the lift/projection dots.

    ``floor_bound_skip`` (default on): a certified interval bound makes
    the per-step floor check O(r) instead of O(r*N).  By Cauchy-Schwarz
    ``min_v sn_y[v] >= lb_aff - ||wsn_y|| * max_v ||U_y[:, v]||`` where
    ``lb_aff = sum_j (a_j>=0 ? a_j*min(x_j) : a_j*max(x_j))`` over the
    three packed y-rows (min/max taken once per chunk, the column-norm
    bound at trace time).  Steps whose bound clears the floor — every
    step of a floor-clear window — skip the (nb, r) x (r, N) lift dot
    and the O(N) reduction entirely, making per-step cost N-INDEPENDENT;
    the exact check runs only when the bound trips (slack absorbs the
    bf16/f32 rounding gap, so a bound-certified step can never disagree
    with the exact bf16 check).

    ``floor_exact=False`` (requires ``floor_bound_skip``) removes the
    in-kernel exact fallback entirely: a bound trip EXITS the kernel
    (like a contact) instead of materializing the y-rows in-kernel.
    This deletes the only textual use of the big (r, N) lift slice from
    the step loop — Mosaic staging pressure from untaken branches that
    reference large refs measurably taxes the hot loop at >=100k
    vertices (the same effect that size-gates the contact mode) — and,
    since round 5, the packed y-rows as well: the only thing the
    exact-free kernel needs from them is the per-sim min/max for the
    bound, which f32 computes exactly (order-independent), so the XLA
    body reduces the unpadded (3nb, N) array and ships a (6nb, 1)
    operand.  The exact-free kernel then has NO O(N) operand at all
    (admission is HBM-bound, not VMEM-bound): the (8, N)-padded VMEM
    staging of the y-rows (64 MB at 2M vertices, f32) was what pushed
    a 1,999,396-vertex cloth 10 MB past the scoped-VMEM ceiling even
    though the operand-only estimate passed the 72 MB gate.
    Semantics stay exact: the caller re-enters after a REBASE, whose
    fresh anchors make the first-step bound as tight as it can be
    (wsn=0); if even that trips (k=0), run_steps' existing fall-through
    serves the window on a contact-capable path.  Near-floor scenes pay
    extra exits, so large floor-clear serving gates this on, small or
    contact-grazing models keep the in-kernel exact check.

    ``fold_vc`` (default on): the per-step shell is also issue-latency
    bound, and its longest dependent chain was
    wsn -> snT_sel (3 dots + n_sel-wide coefficient combos) -> the
    hoisted ``Vc = snT_sel G_allT`` dot.  Distributing G_allT over the
    affine form gives ``Vc = a0 (b0s G) + a1 (b1s G) + a2 (fas G)
    + sum_d wsn_d (U_selT[d] G)``: the prefix products become per-chunk
    XLA dots in the while-loop body, ``UG = U_selT G`` is precomposed on
    the host in f64 (``prepare_fused_operands``), and the kernel forms
    Vc straight from the reduced coordinates — one fewer dependent dot
    stage and one fewer (3nb, n_sel) temp per step, with neither
    ``U_selT`` nor ``G_allT`` staged into the kernel at all.  Same
    re-association argument as the iteration fold: only well-scaled
    gathered vertex values are re-ordered (the r-space rb cancellation
    is untouched).

    Round-5 per-step-shell cuts (the roofline intercept decomposition,
    scripts/roofline_intercept.py — the shell costs as much as ~4
    iterations at the default 10):

    * ``static_rb`` (default on): when the rb schedule is a single
      static row (t_len == 1 — every constant-force scene: flagship,
      bridge, cloth, contact, ensembles), the per-step dynamic VMEM
      load ``rbex_ref[pl.ds(...)]`` is hoisted out of the step loop
      entirely; animated schedules (t_len > 1) keep the per-step load.
      Pure load hoist — bit-identical values.
    * ``sqrt_free_bound`` (default on): the O(r) floor bound compares
      squared magnitudes (``m*m < (1.25*umax)^2 * ||wsn_y||^2`` with an
      ``m < 0`` escape) instead of materializing ``||wsn_y||`` with a
      dependent ``sqrt``.  Algebraically the same test; f32 rounding at
      the compare differs in the last ulp, which only moves WHEN the
      exact check / rebase-exit runs (the 25 % slack term dwarfs it) —
      never the committed state on floor_exact builds.
    """
    assert floor_exact or floor_bound_skip, \
        "floor_exact=False requires the certified floor bound"
    acc = jnp.float32 if U_liftT.dtype != np.float64 else jnp.float64
    r = inv3.shape[1]
    n = U_liftT.shape[2]
    dt2 = dt * dt
    state_dtype = mass_inv.dtype
    # trace-time Cauchy-Schwarz constant for the floor bound: the
    # largest y-column norm of the lift (f32 math on the stored values)
    umax = float(np.linalg.norm(
        np.asarray(U_liftT[1], dtype=np.float32), axis=0).max())

    flat_arrays = [jnp.asarray(g) for g in iteration_terms["flat_arrays"]]
    term_dispatch = iteration_terms["dispatch"]

    if fold_vc:
        # precomposed U_selT @ G_allT (f64 on host; see docstring) —
        # replaces U_selT as the kernel's wsn -> gathered-values map.
        # Fallback for callers holding a pre-UG operand dict.
        UG = iteration_terms.get("UG_allT")
        if UG is None:
            g64 = np.asarray(G_allT, dtype=np.float64)
            UG = np.stack([
                np.asarray(U_selT[d], dtype=np.float64) @ g64
                for d in range(3)]).astype(np.asarray(U_selT).dtype)
        sel_map = UG
    else:
        sel_map = U_selT

    const_inputs = [jnp.asarray(iteration_terms["C_allT"]),
                    jnp.asarray(inv3),
                    jnp.asarray(WT_all), jnp.asarray(G_allT),
                    jnp.asarray(U_liftT), jnp.asarray(ut_acT),
                    jnp.asarray(M_utac), jnp.asarray(sel_map),
                    jnp.asarray(mass_inv)]

    # kernel inputs: SMEM scalars + the sliced operands (no (3, N) state,
    # no full lift/projection matrices; the Vc fold also drops G_allT
    # from the kernel — it survives only as an XLA-body operand)
    n_kernel_vmem = 9 + (5 if fold_vc else 6) + len(flat_arrays)

    def _make_chunk_kernel(num_iterations):
      def _chunk_kernel(*refs):
        # with fold_vc the b0s/b1s/fas slots carry the G-composed
        # (3nb, g_total) prefix products and uselt the precomposed UG —
        # the in-kernel expressions are IDENTICAL either way, only the
        # operand meaning (and the iterate entry point) changes
        nfix = 15 if fold_vc else 16
        (sc_ref, yrows_ref, b0s_ref, b1s_ref, fas_ref,
         bu0_ref, bu1_ref, bufa_ref, rbex_ref, ulifty_ref, mutac_ref,
         uselt_ref, c_ref, inv_ref, wt_ref) = refs[:15]
        gall_ref = None if fold_vc else refs[15]
        garrs = [ref[:] for ref in refs[nfix:nfix + len(flat_arrays)]]
        (ap_ref, av_ref, wp_ref, wv_ref, k_ref, cl_ref) = \
            refs[nfix + len(flat_arrays):]

        C_all_v = c_ref[:]
        inv = inv_ref[:]
        WT = wt_ref[:]
        G_allT_v = None if fold_vc else gall_ref[:]
        mutac = mutac_ref[:]
        uselT = uselt_ref[:]
        bu0 = bu0_ref[:]
        bu1 = bu1_ref[:]
        bu_fa = bufa_ref[:]
        yr = yrows_ref[:]
        if floor_bound_skip and not floor_exact:
            # exact-free kernels never materialize the y-rows: the only
            # reduction they need — per-sim min/max for the O(r) bound —
            # is exact (order-independent), so the XLA body computes it
            # on the unpadded (3nb, N) array and ships just the packed
            # (6nb, 1) result; the kernel then has NO O(N) operand at
            # all (the 2M-vertex cloth's (8, N)-padded staging of this
            # ref was what blew the scoped-VMEM ceiling)
            ymn = yr[:3 * nb]                           # (3nb, 1)
            ymx = yr[3 * nb:6 * nb]
            b0y = b1y = fay = None
        else:
            b0y = yr[:nb]
            b1y = yr[nb:2 * nb]
            fay = yr[2 * nb:3 * nb]
            if floor_bound_skip:
                # once per chunk: per-sim min/max of the packed y-rows
                # for the O(r) certified floor bound (see docstring)
                ymn = jnp.min(yr, axis=1, keepdims=True)    # (3nb, 1)
                ymx = jnp.max(yr, axis=1, keepdims=True)
        b0s = b0s_ref[:]
        b1s = b1s_ref[:]
        fas = fas_ref[:]
        # rb rows arrive padded to a sublane-tile-aligned per-step stride
        # (see _body): the per-step dynamic load below lands on 8-row
        # tile boundaries, which Mosaic serves far cheaper than the
        # 3nb-row layout's shifting sub-tile offsets (measured ~2 us/step
        # on the animated bunny schedule)
        stride = -(-3 * nb // 8) * 8
        t_len = rbex_ref.shape[0] // stride
        mm_dtype = ulifty_ref.dtype
        # static-force schedules (t_len == 1): ONE rb row serves every
        # step — load it here, outside the step loop, instead of a
        # per-step dynamic VMEM load (see docstring)
        rb_static = (rbex_ref[:][:3 * nb]
                     if static_rb and t_len == 1 else None)
        iterate = _make_iteration_loop(layout, gather_slices,
                                       term_dispatch, garrs, WT,
                                       G_allT_v, C_all_v, r, acc, nb)

        _col = jax.lax.broadcasted_iota(jnp.int32, (3 * nb, 3), 1)
        fdt = b0s.dtype
        e0 = (_col == 0).astype(fdt)
        e1 = (_col == 1).astype(fdt)
        e2 = (_col == 2).astype(fdt)

        # the tiny coefficient state lives IN the output buffers
        ap_ref[:] = e0
        av_ref[:] = e1
        wp_ref[:] = jnp.zeros((3 * nb, r), dtype=fdt)
        wv_ref[:] = jnp.zeros((3 * nb, r), dtype=fdt)
        k_ref[0, 0] = 0

        steps = sc_ref[0, 0]
        start = sc_ref[0, 1]

        def step(i, carry):
            @pl.when(k_ref[0, 0] == i)        # == "still active"
            def _active():
                ap = ap_ref[:]
                av = av_ref[:]
                wp = wp_ref[:]
                wv = wv_ref[:]
                avd = av if eta == 1.0 else eta * av
                wvd = wv if eta == 1.0 else eta * wv
                asn = ap + dt * avd + e2
                wsn = wp + dt * wvd
                asn_y = asn[nb:2 * nb]
                wsn_y = wsn[nb:2 * nb]
                if floor_bound_skip:
                    # O(r) certified bound; the exact O(r*N) check runs
                    # only when the bound can't clear the floor.  Slack
                    # (25 % of the lift bound + a relative epsilon)
                    # absorbs bf16 dot rounding so a certified-clear
                    # step can never disagree with the exact check.
                    a0 = asn_y[:, 0:1]
                    a1 = asn_y[:, 1:2]
                    a2 = asn_y[:, 2:3]
                    lb_aff = (
                        jnp.where(a0 >= 0, a0 * ymn[:nb],
                                  a0 * ymx[:nb])
                        + jnp.where(a1 >= 0, a1 * ymn[nb:2 * nb],
                                    a1 * ymx[nb:2 * nb])
                        + jnp.where(a2 >= 0, a2 * ymn[2 * nb:3 * nb],
                                    a2 * ymx[2 * nb:3 * nb]))
                    if sqrt_free_bound:
                        # lb_aff - 1.25*wn*umax - eps < floor_h, with
                        # wn = ||wsn_y||, tested on squared magnitudes
                        # (one fewer dependent VPU op per step)
                        wn2 = jnp.sum(wsn_y * wsn_y, axis=1,
                                      keepdims=True)
                        m = (lb_aff - floor_h
                             - 1e-6 * (1.0 + jnp.abs(lb_aff)))
                        c2 = (1.25 * umax) * (1.25 * umax)
                        maybe = jnp.any((m < 0) | (m * m < c2 * wn2))
                    else:
                        wn = jnp.sqrt(jnp.sum(wsn_y * wsn_y, axis=1,
                                              keepdims=True))
                        slack = (0.25 * wn * umax
                                 + 1e-6 * (1.0 + jnp.abs(lb_aff)))
                        lb = lb_aff - wn * umax - slack
                        maybe = jnp.any(lb < floor_h)
                    if floor_exact:
                        cl_ref[0] = 0

                        @pl.when(maybe)
                        def _exact():
                            sn_y = (a0 * b0y + a1 * b1y + a2 * fay
                                    + _dot(wsn_y.astype(mm_dtype),
                                           ulifty_ref[:], acc))
                            cl_ref[0] = jnp.any(
                                sn_y < floor_h).astype(jnp.int32)
                        clamped = cl_ref[0] == 1
                    else:
                        # no in-kernel exact fallback: treat a bound trip
                        # as an exit — the caller rebases (tightening the
                        # bound to its floor) and re-enters, or hands the
                        # step to a contact-capable path (see docstring)
                        clamped = maybe
                else:
                    sn_y = (asn_y[:, 0:1] * b0y + asn_y[:, 1:2] * b1y
                            + asn_y[:, 2:3] * fay
                            + _dot(wsn_y.astype(mm_dtype),
                                   ulifty_ref[:], acc))
                    clamped = jnp.any(sn_y < floor_h)

                @pl.when(jnp.logical_not(clamped))
                def _free():
                    rb_ex = (rb_static if rb_static is not None
                             else rbex_ref[pl.ds(
                                 stride * jnp.minimum(start + i,
                                                      t_len - 1),
                                 stride)][:3 * nb])
                    rb_lin = (asn[:, 0:1] * bu0 + asn[:, 1:2] * bu1
                              + asn[:, 2:3] * bu_fa
                              + jnp.concatenate(
                                  [_dot(wsn[d * nb:(d + 1) * nb],
                                        mutac[d], acc)
                                   for d in range(3)], axis=0))
                    rb_const = rb_ex - rb_lin
                    # fold_vc: this IS Vc (g_total-wide, via the
                    # G-composed operands); otherwise it is snT_sel
                    sn_or_vc = (asn[:, 0:1] * b0s + asn[:, 1:2] * b1s
                                + asn[:, 2:3] * fas
                                + jnp.concatenate(
                                    [_dot(wsn[d * nb:(d + 1) * nb],
                                          uselT[d], acc)
                                     for d in range(3)], axis=0))
                    rb = (iterate.from_vc if fold_vc else iterate)(
                        sn_or_vc, rb_const, num_iterations)
                    u = jnp.concatenate(
                        [_dot(rb[d * nb:(d + 1) * nb], inv[d], acc)
                         for d in range(3)], axis=0)
                    wq = wsn + u
                    ap_ref[:] = asn
                    av_ref[:] = avd + e2 / dt
                    wp_ref[:] = wq
                    wv_ref[:] = (wq - wp) / dt
                    k_ref[0, 0] = i + 1
            return carry

        jax.lax.fori_loop(0, steps, step, 0)
      return _chunk_kernel

    def _body(P0, V0, fext, rb_extra, steps_arr, consts, arrays,
              num_iterations):
        (c_a, inv3_a, WT_a, G_a, Ulift_a, utac_a, mutac_a,
         uselt_a, minv_a) = consts
        rb2d = rb_extra.reshape(-1, rb_extra.shape[-1])
        mm_dtype = Ulift_a.dtype
        fa = dt2 * fext * minv_a                       # (3nb, N)
        fay = fa[nb:2 * nb]
        fas = fa[:, :n_sel]
        if fold_vc:
            # G-composed prefix products (see docstring): fa's once per
            # call, the anchors' once per chunk (in body below)
            fas = _dot(fas, G_a, acc)
        # exact-free kernels never read the lift's y-slice: stage a tiny
        # dummy instead of the (r, N) operand (24 MB at 250k verts —
        # per-chunk VMEM staging AND the dominant admission term)
        ulift_y = (Ulift_a[1] if floor_exact
                   else jnp.zeros((8, 128), dtype=Ulift_a.dtype))

        def project(X):
            """(3nb, N) -> (3nb, r) through U^T A_c (NT dots)."""
            return jnp.concatenate(
                [_dot_nt(X[d * nb:(d + 1) * nb].astype(mm_dtype),
                         utac_a[d], acc)
                 for d in range(3)], axis=0)

        def lift(w):
            """(3nb, r) reduced coords -> (3nb, N)."""
            return jnp.concatenate(
                [_dot(w[d * nb:(d + 1) * nb].astype(mm_dtype),
                      Ulift_a[d], acc)
                 for d in range(3)], axis=0)

        bu_fa = project(fa)
        total = steps_arr[0, 0]

        compiler_params = None
        if not interpret:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=SCOPED_VMEM_LIMIT)

        call = pl.pallas_call(
            _make_chunk_kernel(num_iterations),
            out_shape=(jax.ShapeDtypeStruct((3 * nb, 3), P0.dtype),
                       jax.ShapeDtypeStruct((3 * nb, 3), P0.dtype),
                       jax.ShapeDtypeStruct((3 * nb, r), P0.dtype),
                       jax.ShapeDtypeStruct((3 * nb, r), P0.dtype),
                       jax.ShapeDtypeStruct((1, 1), jnp.int32)),
            in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                      + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                      * n_kernel_vmem),
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            # per-step clamp flag staging the two-phase floor check
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            compiler_params=compiler_params,
            interpret=interpret,
        )

        def cond(carry):
            P, V, done, contact = carry
            return jnp.logical_and(done < total,
                                   jnp.logical_not(contact))

        # animated schedules: stage only THIS chunk's rb rows into the
        # kernel (the full 16-32k-frame window as a per-call operand
        # would be re-staged into VMEM on EVERY while-loop chunk — tens
        # of MB x chunks; the exit kernel pays it once per dispatch).
        # The slice is offset-clamped so the kernel's min(start+i, S-1)
        # indexing reproduces the full-schedule clamp semantics exactly.
        t_total = rb2d.shape[0] // (3 * nb)
        S = min(rebase_every, t_total)

        # per-step rb rows are padded from 3nb to a sublane-tile-aligned
        # stride before entering the kernel (tile-aligned dynamic loads;
        # see the stride note in _make_chunk_kernel); padding the small
        # per-chunk slice costs one reshape+pad per while-loop turn
        stride = -(-3 * nb // 8) * 8

        def body(carry):
            P, V, done, _ = carry
            bu0 = project(P)
            bu1 = project(V)
            chunk = jnp.minimum(
                jnp.asarray(rebase_every, dtype=total.dtype),
                total - done)
            done32 = done.astype(jnp.int32)
            off = jnp.clip(done32, 0, t_total - S)
            rb_chunk = jax.lax.dynamic_slice(
                rb2d, (3 * nb * off, jnp.zeros((), dtype=off.dtype)),
                (3 * nb * S, rb2d.shape[1]))
            if stride != 3 * nb:
                rb_chunk = jnp.pad(
                    rb_chunk.reshape(S, 3 * nb, -1),
                    ((0, 0), (0, stride - 3 * nb), (0, 0))).reshape(
                        S * stride, -1)
            sc = jnp.concatenate(
                [chunk.reshape(1, 1).astype(jnp.int32),
                 (done32 - off).reshape(1, 1)], axis=1)
            yrows = jnp.concatenate(
                [P[nb:2 * nb], V[nb:2 * nb], fay], axis=0)
            if floor_bound_skip and not floor_exact:
                # exact-free mode: ship only the packed per-sim min/max
                # (see the kernel-side note) — f32 min/max is exact, so
                # this is bit-identical to the in-kernel reduction
                yrows = jnp.concatenate(
                    [jnp.min(yrows, axis=1, keepdims=True),
                     jnp.max(yrows, axis=1, keepdims=True)], axis=0)
            b0pre = P[:, :n_sel]
            b1pre = V[:, :n_sel]
            if fold_vc:
                b0pre = _dot(b0pre, G_a, acc)
                b1pre = _dot(b1pre, G_a, acc)
                ap, av, wp, wv, k = call(
                    sc, yrows, b0pre, b1pre, fas, bu0, bu1, bu_fa,
                    rb_chunk, ulift_y, mutac_a, uselt_a, c_a, inv3_a,
                    WT_a, *arrays)
            else:
                ap, av, wp, wv, k = call(
                    sc, yrows, b0pre, b1pre, fas, bu0, bu1, bu_fa,
                    rb_chunk, ulift_y, mutac_a, uselt_a, c_a, inv3_a,
                    WT_a, G_a, *arrays)
            k = k[0, 0]
            Pn = (ap[:, 0:1] * P + ap[:, 1:2] * V + ap[:, 2:3] * fa
                  + lift(wp))
            Vn = (av[:, 0:1] * P + av[:, 1:2] * V + av[:, 2:3] * fa
                  + lift(wv))
            return Pn, Vn, done + k, k < chunk

        P, V, done, _ = jax.lax.while_loop(
            cond, body,
            (P0, V0, jnp.zeros((), dtype=total.dtype),
             jnp.zeros((), dtype=bool)))
        return P, V, done.astype(jnp.int32).reshape(1, 1)

    return _make_runners(_body, const_inputs, flat_arrays)
