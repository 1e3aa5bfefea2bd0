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
