"""2D pipeline integration: simulate_ccd → extract → reconstruct (polar)."""
import os

import numpy as np
import pytest

import xframe_tpu as xf


@pytest.fixture(scope="module")
def home(tmp_path_factory):
    path = tmp_path_factory.mktemp("xf_home_2d")
    old = os.environ.get("XFRAME_TPU_HOME")
    os.environ["XFRAME_TPU_HOME"] = str(path)
    yield str(path)
    if old is None:
        os.environ.pop("XFRAME_TPU_HOME", None)
    else:
        os.environ["XFRAME_TPU_HOME"] = old


def test_2d_pipeline(home):
    xf.select_project("fxs", "simulate_ccd", overrides={
        "structure_name": "pytest2d",
        "dimensions": 2,
        "grid": {"n_radial_points": 48, "max_order": 12, "max_q": 0.5,
                 "n_phi": 64},
        "shapes": {"types": ["sphere", "sphere"],
                   "centers": [[0, 0], [40, 1.0]],
                   "sizes": [22, 15], "densities": [1.0, 0.7],
                   "random_orientation": [False, False]},
        "cross_correlation": {"xray_wavelength": 1.23984},
    })
    ccd = xf.run()
    assert ccd["dimensions"] == 2
    assert ccd["cross_correlation"]["I1I1"].shape == (48, 48, 64)

    xf.select_project("fxs", "extract", overrides={
        "structure_name": "pytest2d", "dimensions": 2, "max_order": 12})
    inv = xf.run()
    bm = inv["deg_2_invariant"]["I1I1"]
    assert bm.shape == (13, 48, 48)
    proj = inv["data_projection_matrices"]["I1I1"]
    assert len(proj) == 13
    assert all(np.asarray(v).shape == (48, 1) for v in proj)

    xf.select_project("fxs", "reconstruct", overrides={
        "structure_name": "pytest2d",
        "dimensions": 2,
        "particle_radius": 60,
        "grid": {"n_radial_points": 32, "max_order": 10, "n_phi": 64},
        "multi_start": {"n_reconstructions": 2, "seed": 5},
        "main_loop": {"sub_loops": {
            "order": ["main"],
            "main": {"iterations": 2, "order": ["HIO", "SW", "ER"],
                     "methods": {"HIO": {"iterations": 15},
                                 "SW": {"iterations": 1},
                                 "ER": {"iterations": 10}}},
        }},
        "projections": {"real": {
            "shrink_wrap": {"sigmas": [False], "thresholds": [0.09]},
            "HIO": {"beta": [[0.5, 0.4, -1 / 50, 100]]},
        }},
    })
    res = xf.run()
    cfg = res["configuration"]
    assert cfg["dimensions"] == 2
    results = res["reconstruction_results"]
    assert len(results) == 2
    for key, r in results.items():
        assert r["real_density"].shape == (32, 64)
        err = np.asarray(r["error_dict"]["main"])
        assert np.isfinite(err).all()
    e0 = np.asarray(results["0"]["error_dict"]["main"])
    assert e0[-1] < e0[:5].mean()

    # 2D averaging: circular alignment + polar PRTF
    xf.select_project("fxs", "average", overrides={
        "structure_name": "pytest2d",
        "selection": {"error_limit": 10.0},
        "l2_error_limit": 10.0,
        "resolution_metrics": {"PRTF": True},
    })
    avg = xf.run()
    assert avg["average"]["real_density"].shape == (32, 64)
    assert len(avg["aligned"]) == 2
    prtf = avg["resolution_metrics"]["PRTF"]
    assert prtf.shape == (32,)
    assert np.isfinite(prtf).all() and (prtf <= 1 + 1e-6).all()
    angles = avg["rotation_metric"]["angles"]
    assert angles.shape == (2, 3)


def test_aligner2d_recovers_rotation():
    import jax.numpy as jnp
    from xframe_tpu.projects.fxs.demo import make_demo_problem_2d
    from xframe_tpu.projects.fxs.alignment import Aligner2D
    p = make_demo_problem_2d(24, 10, 64)
    aligner = Aligner2D(p.ft, p.integrator._w)
    rho = jnp.asarray(p.rho_true, dtype=jnp.complex64)
    k0 = 13
    alpha0 = 2 * np.pi * k0 / 64
    rho_rot = jnp.asarray(np.roll(p.rho_true, k0, axis=-1),
                          dtype=jnp.complex64)  # f(φ - α0) on the grid
    ref_coeff = aligner.coefficients(rho_rot)
    aligned, _, info = aligner.align(rho, ref_coeff)
    assert np.isclose(info["angles"][0], alpha0, atol=1e-6)
    assert np.abs(np.asarray(aligned) - np.asarray(rho_rot)).max() < 1e-3


def test_so2_gauge_pin():
    """With SO_freedom the pinned order's unknown is exactly 1 and phasing
    still converges."""
    import jax, jax.numpy as jnp
    from dataclasses import replace
    from xframe_tpu.projects.fxs.demo import make_demo_problem_2d
    from xframe_tpu.projects.fxs.phasing import MTIP, Segment
    p = make_demo_problem_2d(24, 10, 64)
    rc = replace(p.mtip.rc, so_pin_order=2)
    mtip = MTIP(p.ft, rc, p.mtip.real, p.mtip.sw, p.mtip._w_err,
                np.asarray(p.mtip.initial_support), harmonic=p.cht)
    rho0 = p.initial_density_batch(1, 1)[0]
    psi = p.ft.forward(rho0)
    Im = p.cht.forward((psi * psi.conj()).real)
    phases = np.asarray(rc.approximate_unknowns(Im))
    assert phases[2] == 1.0
    assert np.allclose(np.abs(phases[::2][1:]), 1.0, atol=1e-5)
    sched = [Segment("HIO", 10, betas=np.full(10, 0.5), ft_stab=True),
             Segment("ER", 5, betas=np.zeros(5))]
    state, errors = jax.jit(lambda r: mtip.run(r, sched))(rho0)
    e = np.asarray(errors)[:, 0]
    assert np.isfinite(e).all() and e[-1] < e[0]


def test_average_multiple_files(home):
    """Average across MULTIPLE reconstruction files (reference
    reconstruction_files list semantics)."""
    import xframe_tpu as xf
    # a second reconstruction run into the same structure
    xf.select_project("fxs", "reconstruct", overrides={
        "structure_name": "pytest2d",
        "dimensions": 2,
        "particle_radius": 60,
        "grid": {"n_radial_points": 32, "max_order": 10, "n_phi": 64},
        "multi_start": {"n_reconstructions": 2, "seed": 9},
        "main_loop": {"sub_loops": {
            "order": ["main"],
            "main": {"iterations": 1, "order": ["HIO", "SW", "ER"],
                     "methods": {"HIO": {"iterations": 10},
                                 "SW": {"iterations": 1},
                                 "ER": {"iterations": 5}}},
        }},
        "projections": {"real": {
            "shrink_wrap": {"sigmas": [False], "thresholds": [0.09]},
            "HIO": {"beta": [[0.5, 0.4, -1 / 50, 100]]},
        }},
    })
    xf.run()
    base = os.path.join(home, "data", "fxs", "reconstructions", "pytest2d")
    files = sorted(
        os.path.join(base, d, "data.h5") for d in os.listdir(base))
    assert len(files) >= 2
    xf.select_project("fxs", "average", overrides={
        "structure_name": "pytest2d",
        "reconstruction_files": files[:2],
        "selection": {"error_limit": 10.0},
        "l2_error_limit": 10.0,
    })
    avg = xf.run()
    assert len(avg["input"]) == 4  # 2 restarts from each of 2 files
    files_used = {m["file_index"] for m in avg["input_meta"].values()}
    assert files_used == {0, 1}


def test_reconstruct_chunked_restarts(home):
    """multi_start.batch_size: sequential chunks produce the full restart set
    (3 restarts in chunks of 2 — exercises the padded tail chunk)."""
    xf.select_project("fxs", "reconstruct", overrides={
        "structure_name": "pytest2d",
        "dimensions": 2,
        "particle_radius": 60,
        "grid": {"n_radial_points": 32, "max_order": 10, "n_phi": 64},
        "multi_start": {"n_reconstructions": 3, "seed": 5, "batch_size": 2},
        "main_loop": {"sub_loops": {
            "order": ["main"],
            "main": {"iterations": 1, "order": ["HIO", "SW"],
                     "methods": {"HIO": {"iterations": 6},
                                 "SW": {"iterations": 1}}},
        }},
        "projections": {"real": {
            "shrink_wrap": {"sigmas": [False], "thresholds": [0.09]},
            "HIO": {"beta": [[0.5, 0.4, -1 / 50, 100]]},
        }},
    })
    res = xf.run()
    results = res["reconstruction_results"]
    assert len(results) == 3
    densities = [np.asarray(r["real_density"]) for r in results.values()]
    for d in densities:
        assert d.shape == (32, 64) and np.isfinite(d).all()
    # chunks were seeded independently: restarts are not duplicates
    assert not np.allclose(densities[0], densities[2])


def test_extract_from_shapes_2d(home):
    """extraction_mode='shapes' in 2D: rank-1 B_m ground truth."""
    xf.select_project("fxs", "extract", overrides={
        "structure_name": "shapes2d",
        "dimensions": 2,
        "max_order": 10,
        "extraction_mode": "shapes",
        "shapes_source": {
            "grid": {"n_radial_points": 32, "max_q": 0.5, "n_phi": 64},
            "shapes": {"types": ["sphere", "sphere"],
                       "centers": [[0, 0], [30, 1.0]],
                       "sizes": [18, 12], "densities": [1.0, 0.7],
                       "random_orientation": [False, False]}},
    })
    inv = xf.run()
    bm = np.asarray(inv["deg_2_invariant"]["I1I1"])
    assert bm.shape == (11, 32, 32)
    assert np.abs(bm[1::2]).max() == 0  # Friedel
    proj = inv["data_projection_matrices"]["I1I1"]
    assert len(proj) == 11
    # rank-1 factors: B_m ≈ v v†
    v = np.asarray(proj[2])[:, 0]
    rel = np.linalg.norm(bm[2] - np.outer(v, v.conj())) / np.linalg.norm(bm[2])
    assert rel < 1e-3


def test_2d_shift_to_center(home):
    """output_density_modifiers.shift_to_center on the 2D path (the polar
    cartesian grids wired by _setup_2d): the saved density's center of mass
    must land near the origin (reference composes the shift for both dims,
    reconstruct.py:453-463)."""
    xf.select_project("fxs", "reconstruct", overrides={
        "structure_name": "pytest2d",
        "dimensions": 2,
        "particle_radius": 60,
        "grid": {"n_radial_points": 32, "max_order": 10, "n_phi": 64},
        "multi_start": {"n_reconstructions": 1, "seed": 11},
        "main_loop": {"sub_loops": {
            "order": ["main"],
            "main": {"iterations": 1, "order": ["HIO", "SW", "ER"],
                     "methods": {"HIO": {"iterations": 12},
                                 "SW": {"iterations": 1},
                                 "ER": {"iterations": 8}}},
        }},
        "projections": {"real": {
            "shrink_wrap": {"sigmas": [False], "thresholds": [0.09]},
            "HIO": {"beta": [[0.5, 0.4, -1 / 50, 100]]},
        }},
        "output_density_modifiers": {"shift_to_center": True},
    })
    res = xf.run()
    rho = np.abs(np.asarray(res["reconstruction_results"]["0"]
                            ["real_density"]))
    grid_r = np.asarray(res["configuration"]["internal_grid"]["real_grid"])
    phis = 2 * np.pi * np.arange(rho.shape[1]) / rho.shape[1]
    x = grid_r[:, None] * np.cos(phis)[None, :]
    y = grid_r[:, None] * np.sin(phis)[None, :]
    w = rho * grid_r[:, None]           # polar area element ∝ r
    com = np.array([(w * x).sum(), (w * y).sum()]) / w.sum()
    assert np.linalg.norm(com) < 0.1 * grid_r.max(), com
