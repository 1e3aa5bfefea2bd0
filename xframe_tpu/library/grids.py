"""Grid utilities: construction, resampling, sampled functions.

Rebuilt from the reference gridLibrary (gridLibrary.py: GridFactory :914,
ReGrider.regrid :586, SampledFunction :752): grids are plain numpy arrays
with a trailing coordinate dimension; regridding is 1-D linear interpolation
along a chosen axis (complex-aware), which is all the pipeline needs (radial
resampling of projection data and densities).
"""
from __future__ import annotations

import numpy as np


def construct_grid(axes, grid_type="uniform") -> np.ndarray:
    """Coordinate grid with trailing coordinate tuple
    (reference GridFactory.construct_grid, gridLibrary.py:914-988).

    'uniform': meshgrid of 1-D axes → (n_0, ..., n_k, k+1).
    'uniform_dependent': axes[k] may instead be an array of shape
    (n_0, ..., n_{k-1}, n_k) supplying that dimension's values PER point of
    the previous dimensions (e.g. a per-radius angular sampling)."""
    if grid_type == "uniform":
        axes = [np.asarray(a, dtype=float) for a in axes]
        mesh = np.meshgrid(*axes, indexing="ij")
        return np.stack(mesh, axis=-1)
    if grid_type != "uniform_dependent":
        raise ValueError(f"unknown grid_type {grid_type!r}")
    first = np.asarray(axes[0], dtype=float)
    grid = first[:, None]
    shape = first.shape
    for ax in axes[1:]:
        ax = np.asarray(ax, dtype=float)
        if ax.ndim == 1:
            ax = np.broadcast_to(ax, shape + ax.shape)
        elif ax.shape[:-1] != shape:
            raise ValueError(
                f"dependent axis shape {ax.shape} does not extend previous "
                f"grid shape {shape}")
        n_k = ax.shape[-1]
        grid = np.repeat(grid[..., None, :], n_k, axis=-2)
        grid = np.concatenate([grid, ax[..., None]], axis=-1)
        shape = shape + (n_k,)
    return grid


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


def _to_cartesian(grid, coord):
    """Coordinate grid (..., dim) in `coord` system → cartesian."""
    from xframe_tpu.library.shapes import spherical_to_cartesian
    if coord == "cartesian":
        return np.asarray(grid, dtype=float)
    if coord in ("spherical", "polar"):
        # shapes.spherical_to_cartesian handles (r,θ,φ) and (r,φ) tails
        return spherical_to_cartesian(np.asarray(grid, dtype=float))
    raise ValueError(f"unknown coordinate system {coord!r}")


def regrid_nd(data, grid, coord, new_grid, new_coord, method="linear",
              fill_value=0.0, apply_over_axis=None):
    """General coordinate-aware resampling (reference ReGrider.regrid,
    gridLibrary.py:586-750): scatter-interpolate `data` sampled on `grid`
    (coordinate system `coord` ∈ cartesian|spherical|polar) onto `new_grid`
    in `new_coord`. Both grids carry the coordinate tuple in the trailing
    dimension; interpolation happens in the common cartesian frame with
    scipy.interpolate.griddata (host-side, setup-time — this is not a hot
    path). Complex data is interpolated per plane; `apply_over_axis` maps
    the regrid over a leading batch axis (reference options['apply_over_axis'])."""
    from scipy.interpolate import griddata
    data = np.asarray(data)
    if apply_over_axis is not None:
        moved = np.moveaxis(data, apply_over_axis, 0)
        out = np.stack([
            regrid_nd(d, grid, coord, new_grid, new_coord, method=method,
                      fill_value=fill_value) for d in moved])
        return np.moveaxis(out, 0, apply_over_axis)
    grid_c = _to_cartesian(grid, coord)
    new_c = _to_cartesian(new_grid, new_coord)
    dim = grid_c.shape[-1]
    pts = grid_c.reshape(-1, dim)
    new_pts = new_c.reshape(-1, dim)
    shape = new_c.shape[:-1]
    if np.iscomplexobj(data):
        re = griddata(pts, data.real.reshape(-1), new_pts, method=method,
                      fill_value=fill_value)
        im = griddata(pts, data.imag.reshape(-1), new_pts, method=method,
                      fill_value=fill_value)
        return (re + 1j * im).reshape(shape)
    return griddata(pts, data.reshape(-1), new_pts, method=method,
                    fill_value=fill_value).reshape(shape)


class SampledFunction:
    """Data + the grid it is sampled on (reference SampledFunction :752).

    1-D form (coords a 1-D axis): linear resampling along `axis`.
    N-D form (coords with a trailing coordinate tuple + coord_sys given):
    coordinate-aware regrid_nd onto any target grid/system."""

    def __init__(self, data, coords, axis=0, coord_sys=None):
        self.data = np.asarray(data)
        self.coords = np.asarray(coords, dtype=float)
        self.axis = int(axis)
        self.coord_sys = coord_sys

    def regrid(self, new_coords, new_coord_sys=None, **kw):
        if self.coord_sys is not None:
            out = regrid_nd(self.data, self.coords, self.coord_sys,
                            new_coords, new_coord_sys or self.coord_sys, **kw)
            return SampledFunction(out, new_coords, axis=self.axis,
                                   coord_sys=new_coord_sys or self.coord_sys)
        return SampledFunction(
            regrid(self.data, self.coords, new_coords, axis=self.axis),
            new_coords, axis=self.axis)

    def __call__(self, points):
        if self.coord_sys is not None:
            return regrid_nd(self.data, self.coords, self.coord_sys,
                             points, self.coord_sys)
        return regrid(self.data, self.coords, points, axis=self.axis)
