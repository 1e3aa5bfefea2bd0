"""Pallas TPU kernels for the hottest compute ops.

`polar_unitary_pallas`: the quintic Newton–Schulz polar iteration (see
projections.polar_unitary_newton_schulz) as ONE kernel per matrix block —
the iterate stays resident in VMEM across all iterations instead of making
an HBM round-trip per scan step, and complex arithmetic is expressed as
float32 plane matmuls on the MXU (128×128 blocks tile exactly after the
MXU-alignment crop). Grid = one program per batched matrix.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CA, _CB, _CC = 3.4445, -4.7750, 2.0315


def _mm(a, b):
    """a @ b on the MXU with f32 accumulation."""
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _mm_ht(a, b):
    """aᵀ @ b (contraction over rows — no explicit transpose relayout)."""
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _chm(ar, ai, br, bi):
    """(a)† @ (b) for complex planes: conj-transpose contraction."""
    return (_mm_ht(ar, br) + _mm_ht(ai, bi),
            _mm_ht(ar, bi) - _mm_ht(ai, br))


def _cm(ar, ai, br, bi):
    return (_mm(ar, br) - _mm(ai, bi), _mm(ar, bi) + _mm(ai, br))


def _ns_polar_planes(Xr, Xi, iterations, schedule):
    """Normalize + Newton-Schulz polar iteration on complex f32 planes —
    the shared VMEM-resident core of the polar and fused-projection
    kernels. `schedule` (minimax per-step coefficients, ops.polar_schedule)
    is straight-line unrolled; the fixed iteration uses fori_loop (the
    mosaic lowering only accepts loops whose carry pattern-matches a fori
    index)."""
    mag = jnp.sqrt(Xr * Xr + Xi * Xi)
    norm = jnp.sqrt(jnp.max(jnp.sum(mag, axis=1))
                    * jnp.max(jnp.sum(mag, axis=0))) + 1e-12
    inv = 1.0 / norm
    Xr = Xr * inv
    Xi = Xi * inv

    def quintic(_, carry):
        xr, xi = carry
        ar, ai = _chm(xr, xi, xr, xi)             # X†X
        a2r, a2i = _cm(ar, ai, ar, ai)            # (X†X)²
        br = _CB * ar + _CC * a2r
        bi = _CB * ai + _CC * a2i
        yr, yi = _cm(xr, xi, br, bi)              # X·B
        return (_CA * xr + yr, _CA * xi + yi)

    def cubic(_, carry):
        xr, xi = carry
        ar, ai = _chm(xr, xi, xr, xi)
        yr, yi = _cm(xr, xi, ar, ai)
        return (1.5 * xr - 0.5 * yr, 1.5 * xi - 0.5 * yi)

    if schedule is not None:
        for a, b, c in schedule:
            ar, ai = _chm(Xr, Xi, Xr, Xi)
            a2r, a2i = _cm(ar, ai, ar, ai)
            br = b * ar + c * a2r
            bi = b * ai + c * a2i
            yr, yi = _cm(Xr, Xi, br, bi)
            Xr, Xi = a * Xr + yr, a * Xi + yi
    else:
        Xr, Xi = lax.fori_loop(0, iterations, quintic, (Xr, Xi))
        Xr, Xi = lax.fori_loop(0, 4, cubic, (Xr, Xi))
    return Xr, Xi


def _polar_kernel(iterations, schedule, mre_ref, mim_ref, wre_ref, wim_ref):
    Xr, Xi = _ns_polar_planes(mre_ref[0], mim_ref[0], iterations, schedule)
    wre_ref[0] = Xr
    wim_ref[0] = Xi


def polar_unitary_pallas(m_re, m_im, iterations=16, schedule=None,
                         interpret=False):
    """Unitary polar factors of a batch of complex matrices given as float32
    planes (G, n, n) → (W_re, W_im). VMEM-resident Newton–Schulz (quintic +
    cubic polish, or a minimax coefficient schedule), one grid program per
    matrix."""
    g, n, _ = m_re.shape
    kernel = partial(_polar_kernel, int(iterations),
                     tuple(map(tuple, schedule)) if schedule is not None
                     else None)
    spec = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((g, n, n), jnp.float32),
                   jax.ShapeDtypeStruct((g, n, n), jnp.float32)],
        interpret=interpret,
    )(m_re, m_im)
    return out


# ------------------------------------------------------- fused projection K5
def _project_kernel(iterations, schedule, h, l_lo, c, n_q,
                    pdr_ref, pdi_ref, itr_ref, iti_ref, vr_ref, vi_ref,
                    tk_ref, or_ref, oi_ref):
    """One grid program = one harmonic order l = l_lo + i of a tile bucket.

    Computes the ENTIRE data projection for the order in VMEM:
      B_l = PD_l @ I_l  →  M_l = B_l + rms·eye_complement  →
      W_l = polar(M_l)  →  out = take·(V_l@W_l) + (1−take)·I_l
    B, M and W never exist in HBM (the split path round-trips each), and
    the B-assembly / Newton-Schulz / V·W launches collapse into one.
    Zero padding beyond the true crop width c / radial count n_q is exact:
    pad rows of PD and V are zero, the eye complement is confined to
    jj < c, and the odd polar polynomial keeps zero singular values at
    zero — so pad lanes of the output stay identically zero."""
    i = pl.program_id(0)
    l = l_lo + i                                   # traced int32 scalar
    PDr, PDi = pdr_ref[0], pdi_ref[0]              # (c_pad, nq_pad)
    Itr, Iti = itr_ref[0], iti_ref[0]              # (nq_pad, c_pad)
    Br = _mm(PDr, Itr) - _mm(PDi, Iti)             # (c_pad, c_pad)
    Bi = _mm(PDr, Iti) + _mm(PDi, Itr)
    # rms singular-value scale of the valid block (pad contributes zero);
    # the jnp path divides by 2l+1 (projections.approximate_unknowns)
    sz = (2 * l + 1).astype(jnp.float32)
    rms = jnp.sqrt(jnp.sum(Br * Br + Bi * Bi) / sz) + 1e-20
    # complement identity: diagonal positions of the crop outside THIS l's
    # centered window [h−l, h+l] (crop center is index h), within jj < c
    cp = Br.shape[0]
    ii = lax.broadcasted_iota(jnp.int32, (cp, cp), 0)
    jj = lax.broadcasted_iota(jnp.int32, (cp, cp), 1)
    inside = (jj >= h - l) & (jj <= h + l)
    diag = (ii == jj) & (jj < c) & jnp.logical_not(inside)
    Mr = Br + jnp.where(diag, rms, 0.0)
    Xr, Xi = _ns_polar_planes(Mr, Bi, iterations, schedule)
    Vr, Vi = vr_ref[0], vi_ref[0]                  # (nq_pad, c_pad)
    pr = _mm(Vr, Xr) - _mm(Vi, Xi)
    pi = _mm(Vr, Xi) + _mm(Vi, Xr)
    t = tk_ref[0]                                  # (nq_pad, c_pad) 0/1
    or_ref[0] = t * pr + (1.0 - t) * Itr
    oi_ref[0] = t * pi + (1.0 - t) * Iti


def fused_projection_bucket(pd_re, pd_im, it_re, it_im, v_re, v_im, take,
                            *, l_lo, h, c, n_q, iterations=16, schedule=None,
                            interpret=False):
    """Fused data projection for one NS tile bucket.

    pd_*: (G, c_pad, nq_pad) f32 planes of PD_l[window, :] (zero-padded)
    it_*: (G, nq_pad, c_pad) f32 planes of I_l[:, window]
    v_*:  (G, nq_pad, c_pad) f32 planes of V_l[:, window]
    take: (G, nq_pad, c_pad) f32 0/1 selection (use_order & radial_mask,
          broadcast over m)
    → (out_re, out_im) (G, nq_pad, c_pad): the projected coefficients
    take·(V_l·polar(PD_l·I_l + rms·eyeᶜ)) + (1−take)·I_l."""
    g, cp, nqp = pd_re.shape
    kernel = partial(_project_kernel, int(iterations),
                     tuple(map(tuple, schedule)) if schedule is not None
                     else None, int(h), int(l_lo), int(c), int(n_q))
    sq = pl.BlockSpec((1, cp, nqp), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    sc = pl.BlockSpec((1, nqp, cp), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[sq, sq, sc, sc, sc, sc, sc],
        out_specs=[sc, sc],
        out_shape=[jax.ShapeDtypeStruct((g, nqp, cp), jnp.float32),
                   jax.ShapeDtypeStruct((g, nqp, cp), jnp.float32)],
        interpret=interpret,
    )(pd_re, pd_im, it_re, it_im, v_re, v_im, take)
    return out
