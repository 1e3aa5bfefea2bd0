"""Local-file experimental-density maps (VERDICT r4 #8): CCP4/MRC reader +
the reference's crs↔xyz nearest-neighbor sampling
(reference pdb_plugin.py:47-133), and simulate_ccd driven by a fixture map."""
import os

import numpy as np
import pytest

from xframe_tpu.library.pdb import (read_ccp4, write_ccp4, MapDensity,
                                    map_density, is_map_file)


def _ball_map(tmp_path, n=24, extent=40.0, mapcrs=(1, 2, 3),
              crs_start=None, origin=None, name="ball.ccp4"):
    """Gaussian ball density on an n³ crs grid spanning [-extent, extent]³ Å
    (cell = 2·extent per edge)."""
    cell = (2 * extent, 2 * extent, 2 * extent, 90.0, 90.0, 90.0)
    step = 2 * extent / n
    ax = -extent + step * np.arange(n)
    # density indexed [c, r, s]; axis of component i is mapcrs[i]-1
    axes_xyz = np.meshgrid(ax, ax, ax, indexing="ij")   # x, y, z for crs=xyz
    perm = np.asarray(mapcrs) - 1
    # crs component i counts along xyz axis perm[i]
    coords = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), axis=-1)
    # coords[..., j] currently varies along array axis j; build xyz value of
    # each crs triple: xyz[perm[i]] = ax[crs_i]
    xyz = np.zeros(coords.shape)
    for i in range(3):
        xyz[..., perm[i]] = coords[..., i]
    rho = np.exp(-(xyz ** 2).sum(-1) / (2 * (extent / 4) ** 2))
    path = str(tmp_path / name)
    write_ccp4(path, rho, cell, mapcrs=mapcrs,
               crs_start=crs_start or (-n // 2, -n // 2, -n // 2),
               origin=origin)
    return path, rho, ax, step


def test_roundtrip_identity_axes(tmp_path):
    path, rho, ax, step = _ball_map(tmp_path)
    assert is_map_file(path)
    m = read_ccp4(path)
    np.testing.assert_allclose(m.density, rho.astype(np.float32))
    # crs2xyz/xyz2crs inverse on every grid index
    idx = np.stack(np.meshgrid(*[np.arange(n) for n in m.n_crs],
                               indexing="ij"), -1).reshape(-1, 3)[::7]
    xyz = np.atleast_2d(m.crs2xyz(idx))
    back = np.atleast_2d(m.xyz2crs(xyz))
    np.testing.assert_array_equal(back, idx)
    # sampling at exact node positions returns the node values
    vals = m.sample_xyz(xyz.reshape(-1, 3))
    np.testing.assert_allclose(vals, rho.reshape(-1)[::7], rtol=1e-6)
    # out of bounds → fill value
    far = np.array([[1e4, 0, 0], [0, -1e4, 0]])
    np.testing.assert_array_equal(m.sample_xyz(far, fill_value=-7.0),
                                  [-7.0, -7.0])


def test_axis_permutation(tmp_path):
    """mapcrs=(2,1,3): columns count along y, rows along x — sampling at a
    cartesian point must hit the right density entry (the reference's
    map_to_xyz/map_to_crs bookkeeping, pdb_plugin.py:77-102)."""
    path, rho, ax, step = _ball_map(tmp_path, mapcrs=(2, 1, 3),
                                    name="perm.ccp4")
    m = read_ccp4(path)
    # put a marker at crs (3, 5, 7): its xyz is (ax[5], ax[3], ax[7])
    d = m.density.copy()
    d[3, 5, 7] = 123.0
    m2 = MapDensity(d, m.n_crs, m.crs_start, m.xyz_interval, m.cell,
                    m.map_to_crs)
    val = m2.sample_xyz(np.array([ax[5], ax[3], ax[7]]).reshape(1, 3))
    assert float(val[0]) == 123.0
    # index round-trip under permutation
    idx = np.stack(np.meshgrid(*[np.arange(n) for n in m.n_crs],
                               indexing="ij"), -1).reshape(-1, 3)[::11]
    back = np.atleast_2d(m.xyz2crs(np.atleast_2d(m.crs2xyz(idx))))
    np.testing.assert_array_equal(back, idx)


def test_non_orthogonal_cell(tmp_path):
    """γ=120° cell exercises the orthogonalization-matrix path
    (pdb_plugin.py:85-88,98-101)."""
    n = 16
    cell = (50.0, 50.0, 40.0, 90.0, 90.0, 120.0)
    rho = np.random.default_rng(0).random((n, n, n)).astype(np.float32)
    path = str(tmp_path / "tri.ccp4")
    write_ccp4(path, rho, cell, crs_start=(-8, -8, -8),
               xyz_interval=(n, n, n))
    m = read_ccp4(path)
    assert not m._orthogonal
    idx = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"),
                   -1).reshape(-1, 3)[::5]
    xyz = np.atleast_2d(m.crs2xyz(idx))
    back = np.atleast_2d(m.xyz2crs(xyz))
    np.testing.assert_array_equal(back, idx)
    vals = m.sample_xyz(xyz.reshape(-1, 3))
    np.testing.assert_allclose(vals, rho.reshape(-1)[::5], rtol=1e-6)


def test_mrc_origin_words(tmp_path):
    """MRC-2000 ORIGIN words override the crsStart origin convention."""
    path, rho, ax, step = _ball_map(tmp_path, origin=(-40.0, -40.0, -40.0),
                                    crs_start=(0, 0, 0), name="mrc.ccp4")
    m = read_ccp4(path)
    np.testing.assert_allclose(m.origin, [-40.0, -40.0, -40.0])
    vals = m.sample_xyz(np.atleast_2d(m.crs2xyz(
        np.array([[2, 3, 4]]))))
    np.testing.assert_allclose(vals, rho[2, 3, 4], rtol=1e-6)


def test_map_density_centering_and_dispatch(tmp_path):
    """map_density recenters on the density c.o.m.; the pdb:// protocol
    dispatches map files (reference database.py:197-199)."""
    path, rho, ax, step = _ball_map(tmp_path)
    grid = np.zeros((5, 1, 3))
    grid[:, 0, 0] = np.linspace(0, 30, 5)
    vals = map_density(path, grid)
    # the ball is centered; density decays monotonically along the ray
    assert vals[0, 0] > vals[-1, 0] > 0
    from xframe_tpu.io.database import DefaultDB
    db = DefaultDB.__new__(DefaultDB)
    m = db.load_direct(f"pdb://{path}")
    assert isinstance(m, MapDensity)
    rho_g = db.load_direct(f"pdb://{path}", grid_cartesian=grid)
    np.testing.assert_allclose(rho_g, vals)


def test_simulate_ccd_from_fixture_map(tmp_path, monkeypatch):
    """simulate_ccd with shapes.type 'pdb' + a CCP4 map_file produces a valid
    synthetic CCD (VERDICT r4 #8 'Done' criterion)."""
    import xframe_tpu as xf
    path, rho, ax, step = _ball_map(tmp_path, n=32, extent=60.0)
    home = tmp_path / "home"
    monkeypatch.setenv("XFRAME_TPU_HOME", str(home))
    xf.select_project("fxs", "simulate_ccd", overrides={
        "structure_name": "maptest",
        "dimensions": 3,
        "grid": {"n_radial_points": 32, "max_order": 8, "max_q": 0.5},
        "shapes": {"types": ["pdb"], "map_file": path},
        "cross_correlation": {"method": "back_substitution",
                              "xray_wavelength": 1.23984},
    })
    out = xf.run()
    cc = out["cross_correlation"]["I1I1"]
    assert np.isfinite(cc).all() and np.abs(cc).max() > 0
    assert (out["average_intensity"] >= 0).all()
    assert os.path.exists(os.path.join(
        str(home), "data", "fxs", "ccd", "maptest", "run_1", "ccd.h5"))
