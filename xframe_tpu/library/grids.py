"""Grid utilities: construction, resampling, sampled functions.

Rebuilt from the reference gridLibrary (gridLibrary.py: GridFactory :914,
ReGrider.regrid :586, SampledFunction :752): grids are plain numpy arrays
with a trailing coordinate dimension; regridding is 1-D linear interpolation
along a chosen axis (complex-aware), which is all the pipeline needs (radial
resampling of projection data and densities).
"""
from __future__ import annotations

import numpy as np


def construct_grid(axes) -> np.ndarray:
    """Meshgrid of 1-D axes → (n_0, ..., n_k, k+1) coordinate array
    (reference GridFactory.construct_grid('uniform', axes))."""
    axes = [np.asarray(a, dtype=float) for a in axes]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack(mesh, axis=-1)


def uniform_grid(bounds, n_points, endpoint=True) -> np.ndarray:
    """1-D uniform axis (reference uniformGrid_func :1093)."""
    lo, hi = bounds
    return np.linspace(lo, hi, n_points, endpoint=endpoint)


def regrid(data, old_coords, new_coords, axis=0):
    """Linear resampling of `data` along `axis` from old to new coordinates
    (reference ReGrider.regrid, 'interpolation' mode). Complex-aware; values
    outside the old range are edge-extended (np.interp semantics)."""
    data = np.asarray(data)
    old = np.asarray(old_coords, dtype=float)
    new = np.asarray(new_coords, dtype=float)
    moved = np.moveaxis(data, axis, 0)
    flat = moved.reshape(len(old), -1)
    out = np.empty((len(new), flat.shape[1]), dtype=data.dtype)
    for j in range(flat.shape[1]):
        if np.iscomplexobj(data):
            out[:, j] = np.interp(new, old, flat[:, j].real) \
                + 1j * np.interp(new, old, flat[:, j].imag)
        else:
            out[:, j] = np.interp(new, old, flat[:, j])
    return np.moveaxis(out.reshape((len(new),) + moved.shape[1:]), 0, axis)


class SampledFunction:
    """Data + the grid it is sampled on (reference SampledFunction :752)."""

    def __init__(self, data, coords, axis=0):
        self.data = np.asarray(data)
        self.coords = np.asarray(coords, dtype=float)
        self.axis = int(axis)

    def regrid(self, new_coords):
        return SampledFunction(
            regrid(self.data, self.coords, new_coords, axis=self.axis),
            new_coords, axis=self.axis)

    def __call__(self, points):
        return regrid(self.data, self.coords, points, axis=self.axis)
