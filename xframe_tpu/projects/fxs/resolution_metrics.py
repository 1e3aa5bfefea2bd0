"""Resolution metrics: PRTF, FSC/FRC (+ half-bit criterion), FQC.

Rebuilt from reference projects/fxs/projectLibrary/resolution_metrics.py:
  PRTF(q)  = |⟨ψ_i(q,Ω)⟩_i| / ⟨|ψ_i(q,Ω)|⟩_i, angularly averaged (Chapman
             definition; fxs variant uses the projected amplitudes, :58-101)
  FSC(q)   = ⟨ψ1 ψ2*⟩_Ω / √(⟨|ψ1|²⟩⟨|ψ2|²⟩)  (:9-55)
  half-bit = (0.2071 + 1.9102/√n) / (1.2071 + 0.9102/√n), n = shell samples
  FQC(q1,q2,n) = normalized CC harmonic coherence (:103-230)
"""
from __future__ import annotations

import numpy as np


def _angular_mean(x, theta_weights=None, axes=None):
    """Mean over the angular axes: (..., n_q, n_theta, n_phi) by default,
    (..., n_q, n_phi) with axes=(-1,) for polar data."""
    if axes is None:
        axes = (-2, -1)
    if theta_weights is None or axes == (-1,):
        return x.mean(axis=axes)
    w = np.asarray(theta_weights)
    return (x * w[:, None]).sum(axis=(-2, -1)) / (w.sum() * x.shape[-1])


def prtf(psis, theta_weights=None, axes=None):
    """PRTF(q) from a stack of aligned reciprocal amplitudes
    (n_signals, n_q, n_theta, n_phi), or (n_signals, n_q, n_phi) with
    axes=(-1,)."""
    psis = np.asarray(psis)
    num = np.abs(psis.mean(axis=0))
    den = np.abs(psis).mean(axis=0)
    ratio = np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)
    return _angular_mean(ratio, theta_weights, axes=axes)


def prtf_resolution(prtf_values, qs, criterion=1 / np.e):
    """First q where the PRTF falls below the criterion (∞-resolution if never)."""
    below = np.nonzero(np.asarray(prtf_values) < criterion)[0]
    if len(below) == 0:
        return float(qs[-1]), None
    q_c = float(qs[below[0]])
    return q_c, (2 * np.pi / q_c if q_c > 0 else None)


def fsc(psi1, psi2, theta_weights=None, axes=None):
    """Fourier shell/ring correlation over angular shells."""
    psi1, psi2 = np.asarray(psi1), np.asarray(psi2)
    num = _angular_mean(psi1 * np.conj(psi2), theta_weights, axes=axes)
    d1 = _angular_mean(np.abs(psi1) ** 2, theta_weights, axes=axes)
    d2 = _angular_mean(np.abs(psi2) ** 2, theta_weights, axes=axes)
    den = np.sqrt(d1 * d2)
    return np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)


def half_bit_threshold(n_shell_samples):
    """½-bit information criterion curve (van Heel & Schatz 2005)."""
    n = np.sqrt(np.maximum(np.asarray(n_shell_samples, dtype=float), 1.0))
    return (0.2071 + 1.9102 / n) / (1.2071 + 0.9102 / n)


def fqc(cc1, cc2):
    """Fourier quadrant correlation of two CC datasets' harmonic coefficients:
    FQC_n(q1,q2) = ⟨C1_n C2_n*⟩ / √(|C1_n|²|C2_n|²)."""
    c1 = np.fft.rfft(np.asarray(cc1), axis=-1)
    c2 = np.fft.rfft(np.asarray(cc2), axis=-1)
    den = np.abs(c1) * np.abs(c2)
    return np.where(den > 0, (c1 * np.conj(c2)).real / np.where(den > 0, den, 1.0), 0.0)
