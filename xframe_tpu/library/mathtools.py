"""Regularized linear solvers (reference mathLibrary.py:894-1024).

Tikhonov-regularized least squares in two flavors: normal-equations form for
arbitrary regularizers, and an SVD filter-factor form for the standard
(identity) regularizer — both host-side float64 setup-time tools.
"""
from __future__ import annotations

import numpy as np


def tikhonov_solve(A, b, lam, regularizer=None):
    """argmin ‖Ax − b‖² + λ‖Γx‖²  via (A†A + λΓ†Γ)x = A†b."""
    A = np.asarray(A)
    b = np.asarray(b)
    n = A.shape[1]
    G = np.eye(n) if regularizer is None else np.asarray(regularizer)
    lhs = A.conj().T @ A + lam * (G.conj().T @ G)
    rhs = A.conj().T @ b
    return np.linalg.solve(lhs, rhs)


def tikhonov_solve_svd(A, b, lam):
    """Identity-regularizer Tikhonov via SVD filter factors
    f_i = σ_i²/(σ_i² + λ): numerically stable for ill-conditioned A."""
    A = np.asarray(A)
    b = np.asarray(b)
    u, s, vh = np.linalg.svd(A, full_matrices=False)
    filt = s / (s ** 2 + lam)
    return vh.conj().T @ (filt * (u.conj().T @ b.reshape(u.shape[0], -1)).T).T \
        if b.ndim > 1 else vh.conj().T @ (filt * (u.conj().T @ b))


def back_substitution(U, b):
    """Solve Ux = b for upper-triangular U (reference :1499-1517)."""
    U = np.asarray(U)
    b = np.asarray(b, dtype=np.result_type(U, b))
    n = len(b)
    x = np.zeros_like(b)
    for i in range(n - 1, -1, -1):
        x[i] = (b[i] - U[i, i + 1:] @ x[i + 1:]) / U[i, i]
    return x


def ring_symmetry_score(r, weights, n_bins=64, r_max=None):
    """Azimuthal-symmetry figure of merit of a pattern around a candidate
    center: mean over radial rings of var(I)/mean(I)² (reference SPB
    expLibrary centering criterion). r/weights are flat per-pixel radius and
    intensity; pixels with r >= r_max are ignored. Degenerate candidates —
    no pixels inside r_max, or zero intensity everywhere — score +inf so a
    beam-center grid search can never prefer them over a real minimum."""
    r = np.asarray(r, dtype=np.float64).ravel()
    w = np.asarray(weights, dtype=np.float64).ravel()
    if r_max is None:
        r_max = float(r.max()) if r.size else 0.0
    if r_max <= 0:
        return np.inf
    inside = r < r_max
    if not inside.any():
        return np.inf
    idx = np.floor(r[inside] / r_max * n_bins).clip(0, n_bins - 1).astype(int)
    wi = w[inside]
    if not np.any(wi):
        return np.inf
    raw_counts = np.bincount(idx, minlength=n_bins)
    if (raw_counts > 0).sum() < n_bins // 2:
        # a candidate center whose rings are mostly empty (origin at the
        # detector edge) would trivially score ~0 — reject it instead
        return np.inf
    sums = np.bincount(idx, weights=wi, minlength=n_bins)
    sq = np.bincount(idx, weights=wi ** 2, minlength=n_bins)
    counts = np.maximum(raw_counts, 1)
    ring_mean = sums / counts
    ring_var = sq / counts - ring_mean ** 2
    return float(np.mean(ring_var / (np.abs(ring_mean) + 1e-30) ** 2))
