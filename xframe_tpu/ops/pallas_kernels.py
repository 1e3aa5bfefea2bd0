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


def _polar_kernel(iterations, schedule, mre_ref, mim_ref, wre_ref, wim_ref):
    Xr = mre_ref[0]
    Xi = mim_ref[0]
    mag = jnp.sqrt(Xr * Xr + Xi * Xi)
    norm = jnp.sqrt(jnp.max(jnp.sum(mag, axis=1))
                    * jnp.max(jnp.sum(mag, axis=0))) + 1e-12
    inv = 1.0 / norm
    Xr = Xr * inv
    Xi = Xi * inv

    def chm(ar, ai, br, bi):
        """(a)† @ (b) for complex planes: conj-transpose contraction."""
        return (_mm_ht(ar, br) + _mm_ht(ai, bi),
                _mm_ht(ar, bi) - _mm_ht(ai, br))

    def cm(ar, ai, br, bi):
        return (_mm(ar, br) - _mm(ai, bi), _mm(ar, bi) + _mm(ai, br))

    def quintic(_, carry):
        xr, xi = carry
        ar, ai = chm(xr, xi, xr, xi)              # X†X
        a2r, a2i = cm(ar, ai, ar, ai)             # (X†X)²
        br = _CB * ar + _CC * a2r
        bi = _CB * ai + _CC * a2i
        yr, yi = cm(xr, xi, br, bi)               # X·B
        return (_CA * xr + yr, _CA * xi + yi)

    def cubic(_, carry):
        xr, xi = carry
        ar, ai = chm(xr, xi, xr, xi)
        yr, yi = cm(xr, xi, ar, ai)
        return (1.5 * xr - 0.5 * yr, 1.5 * xi - 0.5 * yi)

    if schedule is not None:
        # minimax per-step coefficients (ops.polar_schedule): straight-line
        # unrolled — ~14 steps, the coefficients are compile-time floats
        for a, b, c in schedule:
            ar, ai = chm(Xr, Xi, Xr, Xi)
            a2r, a2i = cm(ar, ai, ar, ai)
            br = b * ar + c * a2r
            bi = b * ai + c * a2i
            yr, yi = cm(Xr, Xi, br, bi)
            Xr, Xi = a * Xr + yr, a * Xi + yi
    else:
        # fori_loop, not scan: the mosaic lowering only accepts loops whose
        # carry pattern-matches a fori index
        Xr, Xi = lax.fori_loop(0, iterations, quintic, (Xr, Xi))
        Xr, Xi = lax.fori_loop(0, 4, cubic, (Xr, Xi))
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
