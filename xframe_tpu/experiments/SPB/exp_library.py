"""SPB experiment utilities: SAXS profiles, ROIs, beam-center refinement.

Rebuilt from the reference's expLibrary (experiments/SPB/expLibrary/: SAXS,
ROIs, centering — SURVEY.md §2.6): small host/device helpers operating on
multi-panel frames with lab-frame pixel geometry.
"""
from __future__ import annotations

import numpy as np


def radial_bins(pixel_grid_reciprocal, n_q=128, q_range=None):
    """Per-pixel radial bin index + bin centers from (…, 3) (q,θ,φ) pixels."""
    q = np.asarray(pixel_grid_reciprocal)[..., 0]
    flat = q.ravel()
    if q_range is None:
        q_range = (float(flat[flat > 0].min()), float(flat.max()))
    idx = np.floor((flat - q_range[0]) / (q_range[1] - q_range[0]) * n_q)
    idx = np.clip(idx, -1, n_q).astype(np.int64)
    idx[(idx < 0) | (idx >= n_q)] = n_q  # trash bin
    centers = np.linspace(q_range[0], q_range[1], n_q + 1)[:-1] \
        + (q_range[1] - q_range[0]) / (2 * n_q)
    return idx.reshape(q.shape), centers


def saxs_profile(frames, pixel_grid_reciprocal, n_q=128, q_range=None,
                 pixel_mask=None):
    """Azimuthally averaged intensity profile I(q) over a frame stack
    (reference expLibrary SAXS)."""
    idx, centers = radial_bins(pixel_grid_reciprocal, n_q, q_range)
    flat_idx = idx.ravel()
    frames = np.asarray(frames, dtype=np.float64)
    total = frames.sum(axis=0).ravel()
    if pixel_mask is not None:
        m = np.asarray(pixel_mask, dtype=bool).ravel()
        flat_idx = np.where(m, flat_idx, n_q)
    sums = np.bincount(flat_idx, weights=total, minlength=n_q + 1)[:n_q]
    counts = np.bincount(flat_idx, minlength=n_q + 1)[:n_q] * len(frames)
    return np.where(counts > 0, sums / np.maximum(counts, 1), 0.0), centers


def annulus_roi(pixel_grid_reciprocal, q_min, q_max):
    """Boolean pixel mask selecting q ∈ [q_min, q_max] (reference ROIs)."""
    q = np.asarray(pixel_grid_reciprocal)[..., 0]
    return (q >= q_min) & (q <= q_max)


def azimuthal_roi(pixel_grid_reciprocal, phi_min, phi_max):
    phi = np.mod(np.asarray(pixel_grid_reciprocal)[..., 2], 2 * np.pi)
    phi_min, phi_max = np.mod(phi_min, 2 * np.pi), np.mod(phi_max, 2 * np.pi)
    if phi_min <= phi_max:
        return (phi >= phi_min) & (phi <= phi_max)
    return (phi >= phi_min) | (phi <= phi_max)


def refine_beam_center(mean_frame, pixel_centers, search_radius=2.0e-3,
                       steps=9):
    """Grid-search the transverse beam offset that maximizes the azimuthal
    symmetry of the averaged pattern (reference expLibrary centering):
    minimizes the variance of I within radial rings. → (dx, dy) in meters."""
    mean_frame = np.asarray(mean_frame, dtype=np.float64).ravel()
    pos = np.asarray(pixel_centers)[..., :2].reshape(-1, 2)
    offsets = np.linspace(-search_radius, search_radius, steps)
    best = (np.inf, (0.0, 0.0))
    n_bins = 64
    for dx in offsets:
        for dy in offsets:
            r = np.linalg.norm(pos - np.array([dx, dy]), axis=1)
            idx = np.floor(r / r.max() * n_bins).clip(0, n_bins - 1).astype(int)
            sums = np.bincount(idx, weights=mean_frame, minlength=n_bins)
            sq = np.bincount(idx, weights=mean_frame ** 2, minlength=n_bins)
            counts = np.maximum(np.bincount(idx, minlength=n_bins), 1)
            ring_var = (sq / counts - (sums / counts) ** 2)
            ring_mean = np.abs(sums / counts) + 1e-30
            score = float(np.mean(ring_var / ring_mean ** 2))
            if score < best[0]:
                best = (score, (float(dx), float(dy)))
    return best[1]
