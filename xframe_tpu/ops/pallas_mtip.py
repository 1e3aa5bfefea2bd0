"""Fused MTIP-iteration epilogue kernels (Pallas TPU).

Second fusion round after ops.pallas_sht (see docs/performance.md): with the
SHT stages fused, the remaining HBM traffic of the traffic-bound MTIP
iteration is grid-sized intermediates between them — the projected intensity
I_new, the modulus-projected field ψ_p's round-trips, the ft-stabilization
density ρ_p and roundtrip rt, and the global-phase-anchor scale pass. These
kernels eliminate them:

  * `inverse_real_project`: the intensity synthesis (iSHT real) runs per
    q-block in VMEM and is immediately consumed by the amplitude projection
    ψ ← ψ·√(I_new/|ψ|²) (fxs_Projections.py:874-929) plus the reciprocal
    error partial sums. I_new never exists in HBM.
  * `synthesize_update`: ONE inverse-FT synthesis accumulates in VMEM; the
    epilogue applies the ft-stab correction (reconstruct.py:585-595), the
    global phase anchor (a *scalar* multiply: the whole reciprocal chain is
    linear, so the anchor collapses to one factor applied here), the real
    constraint (fxs_Projections.py:26-155), the HIO/ER/RAAR update
    (fxs_IO_methods.py:24-68), and emits the real error partials plus the
    NEXT iteration's phase-anchor statistics Σwρ², Σwρ — ρ_p, rt, and the
    anchored input never exist in HBM, and the separate anchor reduction
    pass disappears.

    The ft-stab roundtrip needs NO second synthesis: synthesis is linear and
    per-q, so ρ_p + (ρ_in − rt)·[q≠0] = synth(c_ρ − c_i)|_{row0←c_ρ[0]}
    + ρ_in·[q≠0] — the subtraction happens on the 8.6 MB coefficient arrays
    in XLA, and the kernel synthesizes the single combined coefficient set.

Kernels assume the FusedSHT was built with m_splits == 1 (the default; the
full-m tables fit comfortably under the raised VMEM cap), so tables are DMA'd
once per kernel launch (constant block index) and no cross-step accumulation
scratch is needed. Complex fields travel as float32 planes (axon cannot move
complex arrays). Tables/layouts come from an ops.pallas_sht.FusedSHT.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import os as _os

from xframe_tpu.ops.pallas_sht import _mm, _mmT, _bmm  # shared bf16-table knob


def _scatter_scalars(values):
    """Place scalar values at lane positions [0, k] of an (8, 128) tile."""
    ii = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    jj = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), jnp.float32)
    for k, v in enumerate(values):
        out = out + jnp.where((ii == 0) & (jj == k),
                              v.astype(jnp.float32), 0.0)
    return out


def _synth_complex(cre_ref, cim_ref, p, i_re, i_im, q_b, n_theta, n_phi, m_blk):
    """Full-m complex synthesis: coefficients → field planes."""
    c_re = cre_ref[:].transpose(1, 0, 2)            # (m_blk, q_b, l)
    c_im = cim_ref[:].transpose(1, 0, 2)
    fm_re = _bmm(c_re, p).transpose(1, 2, 0).reshape(q_b * n_theta, m_blk)
    fm_im = _bmm(c_im, p).transpose(1, 2, 0).reshape(q_b * n_theta, m_blk)
    f_re = (_mm(fm_re, i_re) - _mm(fm_im, i_im)).reshape(q_b, n_theta, n_phi)
    f_im = (_mm(fm_re, i_im) + _mm(fm_im, i_re)).reshape(q_b, n_theta, n_phi)
    return f_re, f_im


# --------------------------------------------------------------- K1h kernel
def hsyn_vmem_plan(n_theta, n_phi, l_max, n_m_pad, n_q, table_itemsize,
                   base_limit_bytes):
    """Pure sizing model for the Hankel-fused synthesis kernel →
    (q_block, limit_bytes); q_block == 0 means the kernel does not fit
    (production-scale coefficient arrays are too big to stay resident)
    and the caller must keep the split Hankel-einsum + synthesis path.

    The binding term is the FULL radial coefficient block (all n_q rows of
    both planes, double-buffered across the batch grid axis) that must stay
    resident so each q′-block's Hankel contraction can run in VMEM. Its
    lane padding is real: l = L+1 rounds up to 128 lanes, so the tutorial
    (n_q=128, m_pad=136, L=64) block costs 2·2·128·136·128·4 = 35.7 MB —
    fine under the 124 MiB cap — while production (n_q=256, m_pad=256,
    L=127) needs 268 MB and is structurally out."""
    from xframe_tpu.ops.pallas_sht import padded_vmem_bytes
    lane_l = -(-(l_max + 1) // 128) * 128
    c_res = 4 * n_q * n_m_pad * lane_l * 4
    tab = padded_vmem_bytes(n_m_pad, l_max + 1, n_theta,
                            itemsize=table_itemsize) \
        + 2 * padded_vmem_bytes(n_m_pad, n_phi, itemsize=table_itemsize)
    limit = max(int(base_limit_bytes), 124 * 1024 * 1024)
    # fixed fudge: fm temporaries/relayout scratch measured ≈ 20 MB at
    # tutorial scale (see docs/performance.md round-4 addendum)
    budget = int(limit * 0.95) - c_res - tab - 20 * 1024 * 1024
    lane_phi = -(-n_phi // 128) * 128
    lane_q = -(-n_q // 128) * 128
    per_q = (4 * (l_max + 1) * lane_q * 4    # w block (L+1, qb, n_q):
                                             #   n_q is the lane axis
             + 4 * n_theta * lane_phi * 4    # ψ out planes
             + 4 * n_m_pad * lane_l * 4      # cf out planes
             + 4 * n_theta * n_m_pad * 4)    # fm temporaries
    if budget <= 0:
        return 0, limit
    qb = min(32, budget // per_q)
    qb -= qb % 8                             # blocked sublane dim: 8-aligned
    while qb >= 8 and n_q % qb:
        qb -= 8                              # must divide n_q exactly
    return (int(qb) if qb >= 8 else 0), limit


def _hankel_synth_kernel(n_theta, n_phi, m_blk,
                         cre_ref, cim_ref, wre_ref, wim_ref,
                         p_ref, ire_ref, iim_ref,
                         fre_ref, fim_ref, cfre_ref, cfim_ref):
    """One q′-block of ψ = iSHT(H(c)) in a single VMEM pass, also emitting
    the Hankel coefficients cf = H(c) (the ft-stab combine still needs them,
    phasing._mtip_iteration_fused). Replaces the separate Hankel-forward
    XLA einsum launch + its coefficient round-trip: the full radial
    coefficient array (8.6 MB at tutorial scale) stays resident across the
    q′ grid axis, each block contracts its n_q×q_b weight slab on the MXU,
    and the synthesis consumes cf in place.

    Hankel weights are f32 planes always (data precision); only the
    synthesis tables follow the bf16 table knob."""
    # c enters (n_q, m, l); the Hankel contraction runs as leading-batch
    # per-l matmuls (Mosaic's supported dot_general form): w is host-stored
    # (l, q', k) so only c needs one in-kernel 3-D transpose
    c_re = cre_ref[0].transpose(2, 0, 1)    # (l, n_q, m)
    c_im = cim_ref[0].transpose(2, 0, 1)
    w_re = wre_ref[:]                       # (l, q_b, k)
    w_im = wim_ref[:]
    q_b = w_re.shape[1]
    # cf[l, q', m] = Σ_k w[l, q', k] · c[l, k, m]
    dims = (((2,), (1,)), ((0,), (0,)))

    def dg(a, b):
        return lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)

    cf_re = dg(w_re, c_re) - dg(w_im, c_im)     # (l, q_b, m)
    cf_im = dg(w_re, c_im) + dg(w_im, c_re)
    cfre_ref[0] = cf_re.transpose(1, 2, 0)      # (q_b, m, l)
    cfim_ref[0] = cf_im.transpose(1, 2, 0)
    cm_re = cf_re.transpose(2, 1, 0)            # (m, q_b, l)
    cm_im = cf_im.transpose(2, 1, 0)
    p = p_ref[:]                                # (m, l, θ)
    fm_re = _bmm(cm_re, p).transpose(1, 2, 0).reshape(q_b * n_theta, m_blk)
    fm_im = _bmm(cm_im, p).transpose(1, 2, 0).reshape(q_b * n_theta, m_blk)
    i_re = ire_ref[:]
    i_im = iim_ref[:]
    fre_ref[0] = (_mm(fm_re, i_re) - _mm(fm_im, i_im)).reshape(
        q_b, n_theta, n_phi)
    fim_ref[0] = (_mm(fm_re, i_im) + _mm(fm_im, i_re)).reshape(
        q_b, n_theta, n_phi)


# ---------------------------------------------------------------- K2 kernel
def _herm_in_kernel(cre_ref, cim_ref, ha_ref, hb_ref):
    """In-VMEM hermitianize: full-m coefficient planes → positive-m
    hermitianized planes as two tiny (m⁺_pad × m_pad) matmuls
    c_h = (c[m] + (−1)^m conj(c[−m]))/2 — replaces the separate XLA
    coefficient pass (−13.8 MB + 1 launch per iteration). Output layout
    (m⁺, q_b, l) — exactly what the downstream _bmm expects. Written as a
    q-batched _bmm with the tiny table broadcast over q: Mosaic rejects the
    equivalent unbatched dot_general (its (m, q·l) operand flatten is an
    unsupported shape cast)."""
    q_b = cre_ref.shape[0]
    A = jnp.broadcast_to(ha_ref[:][None], (q_b,) + ha_ref.shape)
    B = jnp.broadcast_to(hb_ref[:][None], (q_b,) + hb_ref.shape)
    c_re = _bmm(A, cre_ref[:]).transpose(1, 0, 2)
    c_im = _bmm(B, cim_ref[:]).transpose(1, 0, 2)
    return c_re, c_im


def _inv_real_project_kernel(n_theta, n_phi, m_blk, eps,
                             cre_ref, cim_ref, ha_ref, hb_ref,
                             p_ref, ire_ref, iim_ref,
                             pre_ref, pim_ref, w_ref,
                             ppre_ref, ppim_ref, part_ref):
    """Real intensity synthesis + amplitude projection against the ψ tile +
    per-q-block reciprocal-error partials (Σw|ψ−ψ_p|², Σw|ψ|²; w = the
    reciprocal-grid integration weights, reference fxs_IO_methods.py:97-128,
    or all-ones for the unweighted sums). Input coefficients are FULL-m
    planes; the positive-m hermitianize happens in VMEM."""
    q_b = cre_ref.shape[0]
    c_re, c_im = _herm_in_kernel(cre_ref, cim_ref, ha_ref, hb_ref)
    p = p_ref[:]
    fm_re = _bmm(c_re, p).transpose(1, 2, 0).reshape(q_b * n_theta, m_blk)
    fm_im = _bmm(c_im, p).transpose(1, 2, 0).reshape(q_b * n_theta, m_blk)
    I_new = (_mm(fm_re, ire_ref[:]) - _mm(fm_im, iim_ref[:])).reshape(
        q_b, n_theta, n_phi)
    pr = pre_ref[:]
    pi = pim_ref[:]
    inten = pr * pr + pi * pi
    valid = (inten > eps) & (I_new >= 0.0)
    ratio = jnp.where(valid, I_new / jnp.where(valid, inten, 1.0), 0.0)
    s = jnp.sqrt(ratio)
    ppr = pr * s
    ppi = pi * s
    ppre_ref[:] = ppr
    ppim_ref[:] = ppi
    dre = pr - ppr
    dim_ = pi - ppi
    # w ships as (q_b, 1, nθ) — rows out of the sublane dim so the block is
    # legal for ANY q_b (production VMEM plans pick q_b ∤ 8); reduce φ
    # (lanes) first, then weight the (q_b, nθ) partial
    w = w_ref[:][:, 0, :]
    num = jnp.sum(w * jnp.sum(dre * dre + dim_ * dim_, axis=2))
    den = jnp.sum(w * jnp.sum(inten, axis=2))
    part_ref[:] = _scatter_scalars([num, den])[None]


# --------------------------------------------------------------- K1⁺ kernel
def _synth_abs2_kernel(n_theta, n_phi, m_blk, mp_blk,
                       cre_ref, cim_ref, p_ref, ire_ref, iim_ref,
                       epre_ref, epim_ref, pwp_ref,
                       pre_ref, pim_ref, ocre_ref, ocim_ref):
    """Complex synthesis ψ = iSHT(cf) + analysis of |ψ|² in one VMEM pass:
    ψ is written out (K2 consumes it) but the intensity grid never exists,
    and ψ is never re-read for the abs2 analysis."""
    q_b = cre_ref.shape[0]
    p_re, p_im = _synth_complex(cre_ref, cim_ref, p_ref[:], ire_ref[:],
                                iim_ref[:], q_b, n_theta, n_phi, m_blk)
    pre_ref[:] = p_re
    pim_ref[:] = p_im
    a = (p_re * p_re + p_im * p_im).reshape(q_b * n_theta, n_phi)
    fm_re = _mmT(a, epre_ref[:])
    fm_im = _mmT(a, epim_ref[:])
    fm_re = fm_re.reshape(q_b, n_theta, mp_blk).transpose(2, 0, 1)
    fm_im = fm_im.reshape(q_b, n_theta, mp_blk).transpose(2, 0, 1)
    pw = pwp_ref[:]
    ocre_ref[:] = _bmm(fm_re, pw).transpose(1, 0, 2)
    ocim_ref[:] = _bmm(fm_im, pw).transpose(1, 0, 2)


# --------------------------------------------------------------- K2⁺ kernel
def _inv_real_project_fwd_kernel(n_theta, n_phi, mp_blk, m_blk, eps,
                                 cre_ref, cim_ref, ha_ref, hb_ref,
                                 pp_ref, ipre_ref, ipim_ref,
                                 pre_ref, pim_ref, w_ref, ere_ref, eim_ref,
                                 pw_ref, ocre_ref, ocim_ref, part_ref):
    """K2 + the analysis of ψ_p: the modulus-projected field is analysed to
    coefficients inside the same VMEM pass, so ψ_p never exists in HBM."""
    q_b = cre_ref.shape[0]
    c_re, c_im = _herm_in_kernel(cre_ref, cim_ref, ha_ref, hb_ref)
    p = pp_ref[:]
    fm_re = _bmm(c_re, p).transpose(1, 2, 0).reshape(q_b * n_theta, mp_blk)
    fm_im = _bmm(c_im, p).transpose(1, 2, 0).reshape(q_b * n_theta, mp_blk)
    I_new = (_mm(fm_re, ipre_ref[:]) - _mm(fm_im, ipim_ref[:])).reshape(
        q_b, n_theta, n_phi)
    pr = pre_ref[:]
    pi = pim_ref[:]
    inten = pr * pr + pi * pi
    valid = (inten > eps) & (I_new >= 0.0)
    ratio = jnp.where(valid, I_new / jnp.where(valid, inten, 1.0), 0.0)
    s = jnp.sqrt(ratio)
    ppr = pr * s
    ppi = pi * s
    dre = pr - ppr
    dim_ = pi - ppi
    w = w_ref[:][:, 0, :]                 # (q_b, 1, nθ) plane, see K2 kernel
    num = jnp.sum(w * jnp.sum(dre * dre + dim_ * dim_, axis=2))
    den = jnp.sum(w * jnp.sum(inten, axis=2))
    part_ref[:] = _scatter_scalars([num, den])[None]
    # forward analysis of ψ_p (full centered-m): φ-DFT + Legendre quadrature
    a_re = ppr.reshape(q_b * n_theta, n_phi)
    a_im = ppi.reshape(q_b * n_theta, n_phi)
    e_re = ere_ref[:]
    e_im = eim_ref[:]
    gm_re = _mmT(a_re, e_re) - _mmT(a_im, e_im)
    gm_im = _mmT(a_re, e_im) + _mmT(a_im, e_re)
    gm_re = gm_re.reshape(q_b, n_theta, m_blk).transpose(2, 0, 1)
    gm_im = gm_im.reshape(q_b, n_theta, m_blk).transpose(2, 0, 1)
    pw = pw_ref[:]
    ocre_ref[:] = _bmm(gm_re, pw).transpose(1, 0, 2)
    ocim_ref[:] = _bmm(gm_im, pw).transpose(1, 0, 2)


def k4_vmem_plan(n_theta, n_phi, p_t_shape, n_m_pad, table_itemsize,
                 base_limit_bytes, start_q_block, track_best):
    """Pure sizing model for the K4 epilogue kernel → (q_block, limit_bytes).

    Largest power-of-two q-block whose scoped-VMEM footprint fits the cap.
    Chip-calibrated on the v5e Mosaic allocator: scoped bytes ≈ tables +
    k·qb·nθ·nφ·4 with k ≈ 21 grid-plane equivalents (I/O blocks + double
    buffering + epilogue temporaries), +4 planes for the lazy-best variant
    (measured 97.7 MB vs 114.5 MB at qb=8, tutorial scale, 100 MB cap).
    bf16 tables force bf16 copies of grid-plane temporaries AND blow up
    register-allocator spill slots (measured 62.3 MiB of spills at qb=4,
    N_q=256/L=128: 130.24 MiB total with 27 MiB of resident tables → 33.0
    plane equivalents per q-block; +1 margin since spills are not under
    our control).

    The track_best variant runs under its own raised cap (124 MiB — the
    v5e has 128 MiB VMEM) so it can keep the full block: HALVING the block
    instead measured 38% slower end-to-end (0.0079 vs 0.0058 s/iter), far
    worse than the ~134 MB/iter of saved HBM traffic. Production-scale
    tables (>36 MB resident) raise the cap the same way — measured
    104.6 MB needed at N_q=256/L=128 even at q_block 1.
    """
    tables = (int(np.prod(p_t_shape)) * table_itemsize
              + 2 * n_m_pad * n_phi * table_itemsize)
    limit = int(base_limit_bytes)
    if track_best or tables > 36 * 1024 * 1024:
        limit = max(limit, 124 * 1024 * 1024)
    k = 25 if track_best else 21
    if table_itemsize == 2:
        k += 13
    plane = n_theta * n_phi * 4
    qb = int(start_q_block)
    while qb > 1 and tables + k * qb * plane > limit:
        qb //= 2
    return max(1, qb), limit


# ---------------------------------------------------------------- K4 kernel
def _synth_update_kernel(n_theta, n_phi, m_blk, q_b,
                         method, add_rin, flags, fix_phase, track_best,
                         w_plane,
                         *refs):
    """Inverse-FT synthesis + MTIP real-side epilogue for one q-block.

    d: combined coefficient planes (c_ρ − c_roundtrip with row 0 reset to
    c_ρ[0] under ft-stab, else plain c_ρ); add_rin: add ρ_in on rows q≠0
    (the ft-stab correction). flags: (apply_support, apply_tlow, apply_thigh,
    apply_limit_imag, apply_assert_real) — static bools baked per-compile.

    The support mask block is int8 (0/1): a quarter of the f32 plane's HBM
    traffic. w_plane: the reduction weights arrive as a (q_b, n_θ) f32 block
    (the φ-constant separable form × a radial initial support) instead of a
    full grid plane — together −100 MB/iteration at tutorial scale.

    track_best: the best-iterate tracking rides inside the kernel — ρ_in is
    LAST step's output whose error became known after its partials reduced,
    so best' = flag ? ρ_in : best uses planes already streaming through VMEM
    instead of a separate 3-grid-pass XLA select every iteration."""
    (apply_support, apply_tlow, apply_thigh, apply_limimag, assert_real,
     cons_support, cons_thresh, cons_limimag) = flags
    if track_best:
        (d_re, d_im, p_ref, ire_ref, iim_ref, rin_re, rin_im, sup_ref,
         w_ref, bre_ref, bim_ref, scal_ref,
         nre_ref, nim_ref, obre_ref, obim_ref, part_ref) = refs
    else:
        (d_re, d_im, p_ref, ire_ref, iim_ref, rin_re, rin_im, sup_ref,
         w_ref, scal_ref, nre_ref, nim_ref, part_ref) = refs
    i = pl.program_id(0)
    rp_re, rp_im = _synth_complex(d_re, d_im, p_ref[:], ire_ref[:],
                                  iim_ref[:], q_b, n_theta, n_phi, m_blk)
    scal = scal_ref[:][0]
    beta = scal[0, 0]
    c_re_s = scal[0, 1]
    c_im_s = scal[0, 2]
    t_low = scal[0, 3]
    t_high = scal[0, 4]
    lim_imag = scal[0, 5]
    rinr = rin_re[:]
    rini = rin_im[:]
    if track_best:
        # candidate is the RAW (un-anchored) ρ_in exactly as stored in HBM
        take = scal[0, 6] > 0.5
        obre_ref[:] = jnp.where(take, rinr, bre_ref[:])
        obim_ref[:] = jnp.where(take, rini, bim_ref[:])
    if add_rin:
        # ρ_p + (ρ_in − rt) on q≠0 rows = synth(d) + ρ_in·[q≠0]
        # (reconstruct.py:585-595; phasing.mtip_iteration). scal[0,7] is the
        # dynamic link_to_enforce_initial_support gate (1.0 when static)
        row = lax.broadcasted_iota(jnp.int32, (q_b, n_theta, n_phi), 0) \
            + i * q_b
        keep = (row != 0).astype(jnp.float32) * scal[0, 7]
        rp_re = rp_re + rinr * keep
        rp_im = rp_im + rini * keep
    if fix_phase:
        # the reciprocal chain is linear: anchoring ρ_in by the unit scalar c
        # commutes through FT/projection/iFT, so it is applied once here to
        # both ρ_p and ρ_in
        rp_re, rp_im = (rp_re * c_re_s - rp_im * c_im_s,
                        rp_re * c_im_s + rp_im * c_re_s)
        rinr, rini = (rinr * c_re_s - rini * c_im_s,
                      rinr * c_im_s + rini * c_re_s)
    # real constraint (projections.RealConstraint.__call__)
    outr, outi = rp_re, rp_im
    invalid = jnp.zeros((q_b, n_theta, n_phi), dtype=jnp.bool_)
    # cons_* gate which violation masks feed the HIO/RAAR region
    # (considered_projections, reference fxs_IO_methods.py:24-64)
    if apply_support:
        # int8 block → f32 before comparing (v5e Mosaic rejects i8 compares)
        m = sup_ref[:].astype(jnp.float32) < 0.5
        outr = jnp.where(m, 0.0, outr)
        outi = jnp.where(m, 0.0, outi)
        if cons_support:
            invalid = invalid | m
    if apply_tlow:
        m = outr < t_low
        outr = jnp.where(m, t_low, outr)
        if cons_thresh:
            invalid = invalid | m
    if apply_thigh:
        m = outr > t_high
        outr = jnp.where(m, t_high, outr)
        if cons_thresh:
            invalid = invalid | m
    if apply_limimag:
        m = jnp.abs(outi) >= lim_imag
        outi = jnp.where(m, 0.0, outi)
        if cons_limimag:
            invalid = invalid | m
    if assert_real:
        outi = jnp.zeros_like(outi)
    # real-error partials (fxs_IO_methods.py:97-129); the θ-weight plane
    # ships as (q_b, 1, nθ) so the block is legal for any q_b — reduce φ
    # (lanes) first, then weight the (q_b, nθ) partial
    if w_plane:
        wp = w_ref[:][:, 0, :]
        wsum = lambda x: jnp.sum(wp * jnp.sum(x, axis=2))
    else:
        w3 = w_ref[:]
        wsum = lambda x: jnp.sum(w3 * x)
    dre = rp_re - outr
    dim_ = rp_im - outi
    num = wsum(dre * dre + dim_ * dim_)
    den = wsum(rp_re * rp_re + rp_im * rp_im)
    if method == "HIO":
        newr = jnp.where(invalid, rinr - beta * (rp_re - outr), outr)
        newi = jnp.where(invalid, rini - beta * (rp_im - outi), outi)
    elif method == "RAAR":
        newr = jnp.where(invalid, beta * rinr + (1 - 2 * beta) * rp_re,
                         outr)
        newi = jnp.where(invalid, beta * rini + (1 - 2 * beta) * rp_im,
                         outi)
    else:  # ER
        newr, newi = outr, outi
    nre_ref[:] = newr
    nim_ref[:] = newi
    # next iteration's phase-anchor statistics: z = Σwρ², z2 = Σwρ
    zr = wsum(newr * newr - newi * newi)
    zi = wsum(2.0 * newr * newi)
    z2r = wsum(newr)
    z2i = wsum(newi)
    part_ref[:] = _scatter_scalars([num, den, zr, zi, z2r, z2i])[None]


class FusedIteration:
    """Wraps a FusedSHT's tables into the two MTIP epilogue kernels.

    Requires the FusedSHT to run with m_splits == 1 so the full-m tables are
    DMA'd once per launch and no cross-step accumulation is needed."""

    def __init__(self, fused_sht, q_block: int | None = None, w_rec=None,
                 hankel=None):
        """w_rec: optional (n_q, n_theta) reciprocal-grid integration-weight
        plane for the K2 error partials (reference integrates the reciprocal
        L2 metric, fxs_IO_methods.py:97-128); None → unweighted sums.
        hankel: optional ops.hankel.SphericalHankelTransform — enables the
        Hankel-fused synthesis kernel (K1h) when its VMEM plan fits."""
        if fused_sht.m_splits != 1:
            raise ValueError("FusedIteration requires FusedSHT(m_splits=1)")
        self.f = fused_sht
        self._w_rec = None if w_rec is None else np.ascontiguousarray(
            np.asarray(w_rec, dtype=np.float32))
        # the synthesize_update kernel holds ~10 grid-sized values per
        # q-block (epilogue temporaries + double-buffered in/out blocks):
        # at tutorial scale half the FusedSHT block fits the VMEM budget
        self.q_block = int(q_block) if q_block \
            else max(1, fused_sht.q_block // 2)
        self._params = fused_sht._params
        # positive-m real-synthesis tables for K2 (the projected intensity is
        # real, so I = Σ_{m≥0} w_m (fm_re·cos mφ − fm_im·sin mφ), w_0 = 1,
        # w_{m>0} = 2 — half the Legendre batch and DFT contraction of the
        # full-m real synthesis)
        f = fused_sht
        L = f.l_max
        phi = 2 * np.pi * np.arange(f.n_phi) / f.n_phi
        ms = np.arange(L + 1)
        wgt = np.where(ms == 0, 1.0, 2.0)[:, None]
        pad_p = f._mp_pad - (L + 1)
        tdt = f.table_dtype  # follow the FusedSHT table dtype (bf16 knob)
        Ip = np.exp(1j * np.outer(ms, phi))
        self._Ip_re = np.ascontiguousarray(np.pad(
            (wgt * Ip.real), ((0, pad_p), (0, 0))).astype(tdt))
        self._Ip_im = np.ascontiguousarray(np.pad(
            (wgt * Ip.imag), ((0, pad_p), (0, 0))).astype(tdt))
        self._Pp_t = np.ascontiguousarray(np.pad(
            np.asarray(f._P_t, dtype=np.float32)[L: L + L + 1],
            ((0, pad_p), (0, 0), (0, 0))).astype(tdt))
        # in-kernel hermitianize matrices (O2, round 4): c_h = Ha·c_re /
        # Hb·c_im with c_h[m] = (c[L+m] + (−1)^m conj(c[L−m]))/2 for m>0 and
        # c_h[0] = Re(c[L]) — replaces _herm_pos_planes' XLA pass
        Ha = np.zeros((f._mp_pad, f.n_m_pad), dtype=np.float32)
        Hb = np.zeros_like(Ha)
        Ha[0, L] = 1.0
        for j in range(1, L + 1):
            s = (-1.0) ** j
            Ha[j, L + j] += 0.5
            Ha[j, L - j] += 0.5 * s
            Hb[j, L + j] += 0.5
            Hb[j, L - j] -= 0.5 * s
        self._Ha = np.ascontiguousarray(Ha)
        self._Hb = np.ascontiguousarray(Hb)
        # K1h (round 4): Hankel-fused ψ synthesis — see hsyn_vmem_plan
        self._hsyn_qb = 0
        if hankel is not None:
            wf = np.asarray(hankel._wf)     # (k_sum, n_q, L+1) complex
            n_q = wf.shape[1]
            if hankel.skip_zero:            # trapz/Zernike drop the k=0 row
                wf = np.concatenate(
                    [np.zeros((1,) + wf.shape[1:], wf.dtype), wf], axis=0)
            if wf.shape[0] == n_q and wf.shape[2] == L + 1:
                qb, limit = hsyn_vmem_plan(
                    f.n_theta, f.n_phi, L, f.n_m_pad, n_q,
                    f.table_dtype.itemsize, self._base_limit())
                if _os.environ.get("XF_HSYN_QB"):
                    qb = int(_os.environ["XF_HSYN_QB"])
                    # the override is a tuning knob, not a validity escape:
                    # a non-divisor truncates grid=(B, n_q // qb) and leaves
                    # trailing q-rows unwritten (silent garbage)
                    if qb and (qb % 8 or n_q % qb):
                        raise ValueError(
                            f"XF_HSYN_QB={qb} invalid: must be 8-aligned "
                            f"and divide n_q={n_q}")
                if qb:
                    self._hsyn_qb = int(qb)
                    self._h_nq = int(n_q)
                    # stored (l, q', k): the kernel's contraction layout
                    wt = wf.transpose(2, 1, 0)
                    self._hw_re = np.ascontiguousarray(
                        wt.real.astype(np.float32))
                    self._hw_im = np.ascontiguousarray(
                        wt.imag.astype(np.float32))
                    self._hsyn_params = pltpu.CompilerParams(
                        vmem_limit_bytes=int(limit))

    # -------------------------------------------------------------- helpers
    def _update_q_block(self, track_best):
        """K4 q-block from the pure chip-calibrated model (k4_vmem_plan;
        unit-tested at tutorial AND production dims). Shape arithmetic, not
        .nbytes: under bound_tables f._P_t may be a TRACER."""
        f = self.f
        qb, _ = k4_vmem_plan(f.n_theta, f.n_phi, f._P_t.shape, f.n_m_pad,
                             f.table_dtype.itemsize, self._base_limit(),
                             self.q_block, track_best)
        return qb

    def _base_limit(self):
        return getattr(self._params, "vmem_limit_bytes", None) \
            or 100 * 1024 * 1024

    def _limit_for(self, track_best):
        f = self.f
        _, limit = k4_vmem_plan(f.n_theta, f.n_phi, f._P_t.shape, f.n_m_pad,
                                f.table_dtype.itemsize, self._base_limit(),
                                self.q_block, track_best)
        return limit

    def _params_for(self, track_best):
        limit = int(self._limit_for(track_best))
        base = getattr(self._params, "vmem_limit_bytes", None)
        if base is not None and limit <= base:
            return self._params
        return pltpu.CompilerParams(vmem_limit_bytes=limit)

    def _pad_rows_q(self, arrs, qb):
        rows = arrs[0].shape[0]
        if rows % qb:
            pad = qb - rows % qb
            arrs = tuple(jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) for a in arrs)
        return arrs, rows

    def _w_rec_rows(self, lead, rows, nt):
        """(rows, 1, n_theta) f32 weight plane for the K2 error partials: the
        reciprocal-grid weights broadcast over any leading batch axes, or
        all-ones when unweighted. Zero row padding (below) keeps padded rows
        out of the sums. The unit middle axis keeps the q rows OUT of the
        Mosaic sublane dim: a (q_b, 1, nθ) block's trailing dims are full,
        so any q_b (production plans pick q_b ∤ 8) is a legal block."""
        if self._w_rec is None:
            return jnp.ones((rows, 1, nt), jnp.float32)
        return jnp.broadcast_to(jnp.asarray(self._w_rec),
                                lead + (nt,)).reshape(rows, 1, nt)

    def _coeff_planes(self, c):
        """complex (..., n_m, L+1) → zero-padded f32 planes (rows, m_pad, L+1)."""
        f = self.f
        pad_m = f.n_m_pad - f.n_m
        cre = c.real.astype(jnp.float32)
        cim = c.imag.astype(jnp.float32)
        if pad_m:
            z = jnp.zeros(cre.shape[:-2] + (pad_m, cre.shape[-1]), cre.dtype)
            cre = jnp.concatenate([cre, z], axis=-2)
            cim = jnp.concatenate([cim, z], axis=-2)
        return cre, cim

    # ------------------------------------------------------------------ K1h
    def hankel_synthesize(self, c):
        """(c = analysis coefficients in r) → (ψ = iSHT(H(c)), cf = H(c))
        in ONE kernel launch: the Hankel-forward einsum launch and its
        coefficient round-trip disappear; cf is still emitted because the
        ft-stab combine consumes it (phasing._mtip_iteration_fused).
        Input c: (..., n_q, 2L+1, L+1) complex."""
        f = self.f
        L = f.l_max
        n_q = self._h_nq
        qb = self._hsyn_qb
        lead = c.shape[:-3]
        B = int(np.prod(lead)) if lead else 1
        nt, nph, mb = f.n_theta, f.n_phi, f.n_m_pad
        c_re, c_im = self._coeff_planes(c.reshape((B, n_q, f.n_m, L + 1)))
        kern = partial(_hankel_synth_kernel, nt, nph, mb)
        blk_c = pl.BlockSpec((1, n_q, mb, L + 1), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        blk_w = pl.BlockSpec((L + 1, qb, n_q), lambda b, i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        p_spec = pl.BlockSpec((mb, L + 1, nt), lambda b, i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        i_spec = pl.BlockSpec((mb, nph), lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM)
        blk_f = pl.BlockSpec((1, qb, nt, nph), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM)
        blk_cf = pl.BlockSpec((1, qb, mb, L + 1), lambda b, i: (b, i, 0, 0),
                              memory_space=pltpu.VMEM)
        f_re, f_im, cf_re, cf_im = pl.pallas_call(
            kern,
            grid=(B, n_q // qb),
            in_specs=[blk_c, blk_c, blk_w, blk_w, p_spec, i_spec, i_spec],
            out_specs=[blk_f, blk_f, blk_cf, blk_cf],
            out_shape=[
                jax.ShapeDtypeStruct((B, n_q, nt, nph), jnp.float32),
                jax.ShapeDtypeStruct((B, n_q, nt, nph), jnp.float32),
                jax.ShapeDtypeStruct((B, n_q, mb, L + 1), jnp.float32),
                jax.ShapeDtypeStruct((B, n_q, mb, L + 1), jnp.float32)],
            compiler_params=self._hsyn_params,
            interpret=f._interp(),
        )(c_re, c_im, jnp.asarray(self._hw_re), jnp.asarray(self._hw_im),
          jnp.asarray(f._P_t), jnp.asarray(f._I_re), jnp.asarray(f._I_im))
        cdt = f.sht.complex_dtype
        psi = lax.complex(f_re, f_im).astype(cdt).reshape(
            lead + (n_q, nt, nph))
        cf = lax.complex(cf_re[..., : f.n_m, :],
                         cf_im[..., : f.n_m, :]).astype(cdt).reshape(
            lead + (n_q, f.n_m, L + 1))
        return psi, cf

    # ------------------------------------------------------------------- K2
    def inverse_real_project(self, c, psi, eps=0.0):
        """(I_lm coefficients, ψ) → (ψ_p, Σ|ψ−ψ_p|², Σ|ψ|²).

        Equivalent to: I_new = sht.inverse_real(c);
        ψ_p = project_to_modified_intensity(ψ, |ψ|², I_new); plus the
        reciprocal-error partial sums — in one grid pass."""
        f = self.f
        lead = psi.shape[:-2]
        rows = int(np.prod(lead)) if lead else 1
        qb, nt, nph = self.q_block, f.n_theta, f.n_phi
        mb, L = f._mp_pad, f.l_max
        c_re, c_im = self._coeff_planes(c.reshape((rows, f.n_m, L + 1)))
        pr = psi.reshape((rows, nt, nph))
        p_re = pr.real.astype(jnp.float32)
        p_im = pr.imag.astype(jnp.float32)
        w_r = self._w_rec_rows(lead, rows, nt)
        (c_re, c_im, p_re, p_im, w_r), nrows = self._pad_rows_q(
            (c_re, c_im, p_re, p_im, w_r), qb)
        g = c_re.shape[0] // qb
        kern = partial(_inv_real_project_kernel, nt, nph, mb, float(eps))
        blk_cf = pl.BlockSpec((qb, f.n_m_pad, L + 1), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        h_spec = pl.BlockSpec((mb, f.n_m_pad), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        p_spec = pl.BlockSpec((mb, L + 1, nt), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        i_spec = pl.BlockSpec((mb, nph), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        blk_g = pl.BlockSpec((qb, nt, nph), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        blk_w = pl.BlockSpec((qb, 1, nt), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        part_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        pp_re, pp_im, parts = pl.pallas_call(
            kern,
            grid=(g,),
            in_specs=[blk_cf, blk_cf, h_spec, h_spec, p_spec, i_spec, i_spec,
                      blk_g, blk_g, blk_w],
            out_specs=[blk_g, blk_g, part_spec],
            out_shape=[jax.ShapeDtypeStruct((g * qb, nt, nph), jnp.float32),
                       jax.ShapeDtypeStruct((g * qb, nt, nph), jnp.float32),
                       jax.ShapeDtypeStruct((g, 8, 128), jnp.float32)],
            compiler_params=self._params,
            interpret=f._interp(),
        )(c_re, c_im, jnp.asarray(self._Ha), jnp.asarray(self._Hb),
          jnp.asarray(self._Pp_t),
          jnp.asarray(self._Ip_re), jnp.asarray(self._Ip_im), p_re, p_im,
          w_r)
        psi_p = lax.complex(pp_re[:nrows], pp_im[:nrows]).astype(
            f.sht.complex_dtype).reshape(lead + (nt, nph))
        num = jnp.sum(parts[:, 0, 0])
        den = jnp.sum(parts[:, 0, 1])
        return psi_p, num, den

    # ------------------------------------------------------------------ K1⁺
    def synthesize_abs2(self, cf):
        """coefficients → (ψ = iSHT(cf), I_lm of |ψ|²) in ONE grid pass:
        equivalent to (fused.inverse(cf), fused.forward_real_abs2(ψ)) but ψ
        is never re-read from HBM and the intensity never exists."""
        import numpy as _np
        f = self.f
        L = f.l_max
        lead = cf.shape[:-2]
        rows = int(np.prod(lead)) if lead else 1
        qb, nt, nph = self.q_block, f.n_theta, f.n_phi
        mb, mpb = f.n_m_pad, f._mp_pad
        cr = cf.reshape((rows, f.n_m, L + 1))
        c_re, c_im = self._coeff_planes(cr)
        (c_re, c_im), nrows = self._pad_rows_q((c_re, c_im), qb)
        g = c_re.shape[0] // qb
        kern = partial(_synth_abs2_kernel, nt, nph, mb, mpb)
        blk_c = pl.BlockSpec((qb, mb, L + 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        p_spec = pl.BlockSpec((mb, L + 1, nt), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        i_spec = pl.BlockSpec((mb, nph), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        ep_spec = pl.BlockSpec((mpb, nph), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        pwp_spec = pl.BlockSpec((mpb, nt, L + 1), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        blk_g = pl.BlockSpec((qb, nt, nph), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        blk_oc = pl.BlockSpec((qb, mpb, L + 1), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        p_re, p_im, oc_re, oc_im = pl.pallas_call(
            kern,
            grid=(g,),
            in_specs=[blk_c, blk_c, p_spec, i_spec, i_spec,
                      ep_spec, ep_spec, pwp_spec],
            out_specs=[blk_g, blk_g, blk_oc, blk_oc],
            out_shape=[jax.ShapeDtypeStruct((g * qb, nt, nph), jnp.float32),
                       jax.ShapeDtypeStruct((g * qb, nt, nph), jnp.float32),
                       jax.ShapeDtypeStruct((g * qb, mpb, L + 1), jnp.float32),
                       jax.ShapeDtypeStruct((g * qb, mpb, L + 1),
                                            jnp.float32)],
            compiler_params=self._params,
            interpret=f._interp(),
        )(c_re, c_im, jnp.asarray(f._P_t), jnp.asarray(f._I_re),
          jnp.asarray(f._I_im), jnp.asarray(f._Ep_re),
          jnp.asarray(f._Ep_im), jnp.asarray(f._PWp))
        psi = lax.complex(p_re[:nrows], p_im[:nrows]).astype(
            f.sht.complex_dtype).reshape(lead + (nt, nph))
        c_pos = lax.complex(oc_re[:nrows, : L + 1], oc_im[:nrows, : L + 1])
        signs = ((-1.0) ** _np.arange(1, L + 1))[::-1]
        c_neg = signs[:, None] * jnp.conj(c_pos[..., 1:, :])[..., ::-1, :]
        Ilm = jnp.concatenate([c_neg, c_pos], axis=-2).astype(
            f.sht.complex_dtype).reshape(lead + (f.n_m, L + 1))
        return psi, Ilm

    # ------------------------------------------------------------------ K2⁺
    def inverse_real_project_fwd(self, c, psi, eps=0.0):
        """(I_lm coefficients, ψ) → (analysis coefficients of ψ_p,
        Σ|ψ−ψ_p|², Σ|ψ|²): K2 + the forward analysis of the projected field
        fused, so ψ_p itself never exists in HBM (the caller feeds the
        coefficients straight into the inverse Hankel)."""
        f = self.f
        lead = psi.shape[:-2]
        rows = int(np.prod(lead)) if lead else 1
        qb, nt, nph = self.q_block, f.n_theta, f.n_phi
        mb, mpb, L = f.n_m_pad, f._mp_pad, f.l_max
        c_re, c_im = self._coeff_planes(c.reshape((rows, f.n_m, L + 1)))
        pr = psi.reshape((rows, nt, nph))
        p_re = pr.real.astype(jnp.float32)
        p_im = pr.imag.astype(jnp.float32)
        w_r = self._w_rec_rows(lead, rows, nt)
        (c_re, c_im, p_re, p_im, w_r), nrows = self._pad_rows_q(
            (c_re, c_im, p_re, p_im, w_r), qb)
        g = c_re.shape[0] // qb
        kern = partial(_inv_real_project_fwd_kernel, nt, nph, mpb, mb,
                       float(eps))
        blk_cf = pl.BlockSpec((qb, mb, L + 1), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        h_spec = pl.BlockSpec((mpb, mb), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        pp_spec = pl.BlockSpec((mpb, L + 1, nt), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
        ip_spec = pl.BlockSpec((mpb, nph), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        blk_g = pl.BlockSpec((qb, nt, nph), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        e_spec = pl.BlockSpec((mb, nph), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        pw_spec = pl.BlockSpec((mb, nt, L + 1), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
        blk_oc = pl.BlockSpec((qb, mb, L + 1), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        part_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        blk_w = pl.BlockSpec((qb, 1, nt), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        oc_re, oc_im, parts = pl.pallas_call(
            kern,
            grid=(g,),
            in_specs=[blk_cf, blk_cf, h_spec, h_spec, pp_spec, ip_spec,
                      ip_spec, blk_g, blk_g, blk_w, e_spec, e_spec, pw_spec],
            out_specs=[blk_oc, blk_oc, part_spec],
            out_shape=[jax.ShapeDtypeStruct((g * qb, mb, L + 1), jnp.float32),
                       jax.ShapeDtypeStruct((g * qb, mb, L + 1), jnp.float32),
                       jax.ShapeDtypeStruct((g, 8, 128), jnp.float32)],
            compiler_params=self._params,
            interpret=f._interp(),
        )(c_re, c_im, jnp.asarray(self._Ha), jnp.asarray(self._Hb),
          jnp.asarray(self._Pp_t),
          jnp.asarray(self._Ip_re), jnp.asarray(self._Ip_im), p_re, p_im,
          w_r, jnp.asarray(f._E_re), jnp.asarray(f._E_im),
          jnp.asarray(f._PW))
        c_out = lax.complex(oc_re[:nrows, : f.n_m],
                            oc_im[:nrows, : f.n_m]).astype(
            f.sht.complex_dtype).reshape(lead + (f.n_m, L + 1))
        num = jnp.sum(parts[:, 0, 0])
        den = jnp.sum(parts[:, 0, 1])
        return c_out, num, den

    # ------------------------------------------------------------------- K4
    def synthesize_update(self, d, rho_in, support_f32, w,
                          beta, c_phase, *, method: str, ft_stab: bool,
                          real_constraint, fix_phase: bool = True,
                          best_rho=None, best_flag=None, ft_gate=None):
        """ρ_new = update(real_constraint(iSHT(d) + ft_stab·ρ_in·[q≠0]))
        with the global-phase anchor scalar c_phase folded in; also returns
        (real-error numerator, denominator, z, z2) where z = Σwρ_new²,
        z2 = Σwρ_new are the NEXT iteration's anchor statistics.

        d: combined coefficient set — under ft-stab the caller passes
        (c_ρ − c_roundtrip) with row 0 reset to c_ρ[0], exploiting the
        linearity of the per-q synthesis; without ft-stab just c_ρ.
        support_f32: 0/1 mask (any numeric/bool dtype — it ships to the
        kernel as int8, ¼ of the f32 traffic); w: integration weights for
        the real-error + anchor reductions, EITHER grid-shaped OR the
        separable (n_q, n_θ) plane (φ-constant weights × radial initial
        support — the common case; saves the 67 MB grid read).

        With best_rho + best_flag (traced 0/1 scalar) given, the kernel also
        emits best' = flag ? ρ_in : best_rho (ρ_in is the previous iterate,
        whose error the caller compared against the running best) and the
        return grows to (ρ_new, best', num, den, z, z2) — saving the
        3-grid-pass XLA best-state select per iteration."""
        f = self.f
        rc = real_constraint
        track_best = best_rho is not None
        lead = rho_in.shape[:-2]
        rows = int(np.prod(lead)) if lead else 1
        qb = self._update_q_block(track_best)
        nt, nph = f.n_theta, f.n_phi
        mb, L = f.n_m_pad, f.l_max
        flags = (bool(rc.apply_support),
                 bool(rc.apply_value_threshold
                      and rc.threshold_low is not None),
                 bool(rc.apply_value_threshold
                      and rc.threshold_high is not None),
                 bool(rc.apply_limit_imag), bool(rc.apply_assert_real),
                 rc._considered("support"),
                 rc._considered("value_threshold"),
                 rc._considered("limit_imag"))
        cr = d.reshape((rows, f.n_m, L + 1))
        d_re, d_im = self._coeff_planes(cr)
        rin = rho_in.reshape((rows, nt, nph))
        rin_re = rin.real.astype(jnp.float32)
        rin_im = rin.imag.astype(jnp.float32)
        sup = support_f32.reshape((rows, nt, nph)).astype(jnp.int8)
        # a separable (n_q, n_theta) plane is always 2D and the full grid
        # always 3D — keying on shape[-1] == n_theta misfires on square
        # angular grids (n_phi == n_theta is legal whenever n_phi >= 2L+1)
        w_plane = w.ndim == 2
        if w_plane:
            w_r = jnp.broadcast_to(w.astype(jnp.float32),
                                   lead + (nt,)).reshape(rows, 1, nt)
        else:
            w_r = w.reshape((rows, nt, nph)).astype(jnp.float32)
        pads = [d_re, d_im, rin_re, rin_im, sup, w_r]
        if track_best:
            b = best_rho.reshape((rows, nt, nph))
            pads += [b.real.astype(jnp.float32), b.imag.astype(jnp.float32)]
        padded, nrows = self._pad_rows_q(tuple(pads), qb)
        d_re, d_im, rin_re, rin_im, sup, w_r = padded[:6]
        g = d_re.shape[0] // qb
        beta = jnp.asarray(beta, dtype=jnp.float32)
        cp = jnp.asarray(c_phase)
        scal_vals = [beta, cp.real.astype(jnp.float32),
                     cp.imag.astype(jnp.float32),
                     jnp.float32(rc.threshold_low
                                 if rc.threshold_low is not None else 0.0),
                     jnp.float32(rc.threshold_high
                                 if rc.threshold_high is not None else 0.0),
                     jnp.float32(rc.limit_imag),
                     # slot 6: best flag (0 when untracked); slot 7: the
                     # dynamic ft-stab gate scaling the ρ_in·[q≠0] add
                     # (link_to_enforce_initial_support; 1 = static ft_stab)
                     jnp.asarray(best_flag if best_flag is not None else 0.0,
                                 dtype=jnp.float32),
                     jnp.asarray(ft_gate if ft_gate is not None else 1.0,
                                 dtype=jnp.float32)]
        scal = _scatter_scalars(scal_vals)[None]                  # (1, 8, 128)
        kern = partial(_synth_update_kernel, nt, nph, mb, qb,
                       method, bool(ft_stab), flags, bool(fix_phase),
                       track_best, w_plane)
        blk_c = pl.BlockSpec((qb, mb, L + 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        p_spec = pl.BlockSpec((mb, L + 1, nt), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        i_spec = pl.BlockSpec((mb, nph), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        blk_g = pl.BlockSpec((qb, nt, nph), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        blk_w = pl.BlockSpec((qb, 1, nt), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM) if w_plane else blk_g
        scal_spec = pl.BlockSpec((1, 8, 128), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        part_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs = [blk_c, blk_c, p_spec, i_spec, i_spec,
                    blk_g, blk_g, blk_g, blk_w, scal_spec]
        out_specs = [blk_g, blk_g, part_spec]
        out_shape = [jax.ShapeDtypeStruct((g * qb, nt, nph), jnp.float32),
                     jax.ShapeDtypeStruct((g * qb, nt, nph), jnp.float32),
                     jax.ShapeDtypeStruct((g, 8, 128), jnp.float32)]
        inputs = [d_re, d_im, jnp.asarray(f._P_t), jnp.asarray(f._I_re),
                  jnp.asarray(f._I_im), rin_re, rin_im, sup, w_r, scal]
        if track_best:
            in_specs = in_specs[:-1] + [blk_g, blk_g, scal_spec]
            inputs = inputs[:-1] + [padded[6], padded[7], scal]
            out_specs = [blk_g, blk_g, blk_g, blk_g, part_spec]
            out_shape = out_shape[:2] * 2 + out_shape[2:]
        outs = pl.pallas_call(
            kern,
            grid=(g,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=self._params_for(track_best),
            interpret=f._interp(),
        )(*inputs)
        if track_best:
            n_re, n_im, b_re, b_im, parts = outs
        else:
            n_re, n_im, parts = outs
        rho_new = lax.complex(n_re[:nrows], n_im[:nrows]).astype(
            f.sht.complex_dtype).reshape(lead + (nt, nph))
        num = jnp.sum(parts[:, 0, 0])
        den = jnp.sum(parts[:, 0, 1])
        z = lax.complex(jnp.sum(parts[:, 0, 2]), jnp.sum(parts[:, 0, 3]))
        z2 = lax.complex(jnp.sum(parts[:, 0, 4]), jnp.sum(parts[:, 0, 5]))
        if track_best:
            best_new = lax.complex(b_re[:nrows], b_im[:nrows]).astype(
                f.sht.complex_dtype).reshape(lead + (nt, nph))
            return rho_new, best_new, num, den, z, z2
        return rho_new, num, den, z, z2
