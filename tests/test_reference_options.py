"""Reference option-parity tests for the round-3 additions:

* simulate_ccd `n_particles` (reference simulate_ccd.py:208-213)
* extract low-resolution intensity coefficients
  (reference extract.py calc_low_resolution_intensity_coefficients)
* reconstruct `density_guess: low_resolution_autocorrelation`
  (reference reconstruct.py:1175-1205)
* reconstruct `initial_support: auto_correlation`
  (reference fxs_Projections.py:141-146)
* `best_density_not_in_first_n_iterations` reset-to-best
  (reference reconstruct.py:945-951)
"""
import os

import numpy as np
import pytest

import xframe_tpu as xf


@pytest.fixture(scope="module")
def home(tmp_path_factory):
    path = tmp_path_factory.mktemp("xf_home_opts")
    old = os.environ.get("XFRAME_TPU_HOME")
    os.environ["XFRAME_TPU_HOME"] = str(path)
    yield str(path)
    if old is None:
        os.environ.pop("XFRAME_TPU_HOME", None)
    else:
        os.environ["XFRAME_TPU_HOME"] = old


N = 24
L = 8

SIM_BASE = {
    "dimensions": 3,
    "grid": {"n_radial_points": N, "max_order": L, "max_q": 0.5},
    "shapes": {"types": ["sphere"], "centers": [[0, 0, 0]], "sizes": [20],
               "densities": [1.0], "random_orientation": [False]},
    "cross_correlation": {"method": "back_substitution",
                          "xray_wavelength": 1.23984},
}


def _simulate(name, **extra):
    xf.select_project("fxs", "simulate_ccd",
                      overrides={**SIM_BASE, "structure_name": name, **extra})
    return xf.run()


@pytest.fixture(scope="module")
def ccd1(home):
    return _simulate("np1")


@pytest.fixture(scope="module")
def ccd3(home):
    return _simulate("np3", n_particles=3)


def test_simulate_n_particles_scaling(ccd1, ccd3):
    """B_l scales by N and B_0 by N²: the CC difference cc_N − N·cc_1 is the
    extra (N²−N)·B_0 term, whose P_0(cosΔ)=const Legendre kernel is
    Δ-INDEPENDENT; the average intensity scales by N."""
    cc1 = np.asarray(ccd1["cross_correlation"]["I1I1"])
    cc3 = np.asarray(ccd3["cross_correlation"]["I1I1"])
    a1 = np.asarray(ccd1["average_intensity"])
    a3 = np.asarray(ccd3["average_intensity"])
    assert np.allclose(a3, 3 * a1, rtol=1e-6)
    extra = cc3 - 3 * cc1
    # flat in Δ (l=0 only) and strictly positive on the diagonal
    spread = np.ptp(extra, axis=-1)
    scale = np.abs(cc3).max()
    assert spread.max() < 1e-5 * scale
    assert extra[np.arange(N), np.arange(N), 0].min() > 0


@pytest.fixture(scope="module")
def invariants_lowres(ccd1, home):
    xf.select_project("fxs", "extract", overrides={
        "structure_name": "np1",
        "dimensions": 3,
        "max_order": L,
        "low_resolution_intensity_approximation": {"max_order": 4},
    })
    return xf.run()


def test_extract_low_resolution_coefficients(invariants_lowres):
    lr = invariants_lowres["data_low_resolution_intensity_coefficients"]
    assert isinstance(lr, dict) and len(lr) == 5
    proj = invariants_lowres["data_projection_matrices"]["I1I1"]
    for l in range(5):
        v = np.asarray(lr[str(l)])
        assert v.shape == (N, min(2 * l + 1, N))
        assert np.allclose(v, np.asarray(proj[l]))


REC_LOOP = {"sub_loops": {
    "order": ["main"],
    "main": {"iterations": 1, "order": ["HIO", "SW", "ER"],
             "methods": {"HIO": {"iterations": 8},
                         "SW": {"iterations": 1},
                         "ER": {"iterations": 6}}},
}}


@pytest.fixture(scope="module")
def reconstructions_opts(invariants_lowres, home):
    xf.select_project("fxs", "reconstruct", overrides={
        "structure_name": "np1",
        "grid": {"n_radial_points": 16, "max_order": L},
        "multi_start": {"n_reconstructions": 2, "seed": 3},
        "density_guess": {"type": "low_resolution_autocorrelation"},
        "projections": {"real": {"projections": {"support": {
            "initial_support": {"type": "auto_correlation",
                                "auto_correlation": {"threshold": 0.01}},
        }}}},
        "main_loop": REC_LOOP,
    })
    return xf.run()


def test_reconstruct_lowres_guess_and_autocorr_support(reconstructions_opts):
    out = reconstructions_opts
    results = out["reconstruction_results"]
    assert len(results) == 2
    for res in results.values():
        errs = np.asarray(res["error_dict"]["main"])
        assert np.isfinite(errs).all()
        sup = np.asarray(res["initial_support"]) \
            if "initial_support" in res else None
    # the auto-correlation support must be a nontrivial subset of the grid
    sup = np.asarray(results["0"]["support_mask"])
    assert 0 < sup.sum() < sup.size


def test_average_option_tail(reconstructions_opts, home):
    """selection.error_metric / max_density_range, pointinvert_reference,
    use_masks + shifted_mask_threshold, average_normalization_min
    (reference average.py:154-160,198-204,546,632,711)."""
    xf.select_project("fxs", "average", overrides={
        "structure_name": "np1",
        "selection": {"error_metric": "main", "error_limit": 10.0,
                      "max_density_range": [0.0, False],
                      "n_reconstructions": "all"},
        "pointinvert_reference": True,
        "use_masks": True,
        "shifted_mask_threshold": 0.5,
        "average_normalization_min": 0.0,
        "l2_error_limit": 10.0,
    })
    out = xf.run()
    avg = out["average"]
    d = np.asarray(avg["real_density"])
    nd = np.asarray(avg["normalized_real_density"])
    assert np.isfinite(d).all() and np.isfinite(nd).all()
    # min-max normalization with the fixed d_min=0 floor: max(real) == 1
    assert np.isclose(nd.real.max(), 1.0, atol=1e-5)
    assert len(out["aligned"]) >= 1

    # a prohibitive lower density bound filters everything out
    xf.select_project("fxs", "average", overrides={
        "structure_name": "np1",
        "selection": {"max_density_range": [1e30, False]},
    })
    with pytest.raises(RuntimeError, match="selection filter"):
        xf.run()


def test_best_density_reset_markers_and_semantics():
    from xframe_tpu.projects.fxs.phasing import (build_schedule, Segment,
                                                 PhasingState)
    main_loop = {"order": ["main"], "main": {
        "iterations": 3,
        "best_density_not_in_first_n_iterations": 0,
        "order": ["HIO"], "methods": {"HIO": {"iterations": 2}}}}
    segs = build_schedule(main_loop, [[0.5, 0.5, -1.0, 10]], [False], [0.1],
                          {}, 1.0)
    methods = [s.method for s in segs]
    # reference convention (reconstruct.py:868 `range(1, max+1)`, :945
    # `best_iteration > n`): n = 0 means a best from ANY iteration triggers
    # the reset → SNAPSHOT before the first iteration, RESET at loop end
    assert methods == ["SNAPSHOT", "HIO", "HIO", "HIO", "RESET_TO_BEST"]
    # n = 1: bests from 1-based iteration 1 do NOT trigger; SNAPSHOT sits
    # after the first iteration's segments
    main_loop["main"]["best_density_not_in_first_n_iterations"] = 1
    segs = build_schedule(main_loop, [[0.5, 0.5, -1.0, 10]], [False], [0.1],
                          {}, 1.0)
    assert [s.method for s in segs] == \
        ["HIO", "SNAPSHOT", "HIO", "HIO", "RESET_TO_BEST"]
    # n >= iterations disables the feature entirely
    main_loop["main"]["best_density_not_in_first_n_iterations"] = 3
    segs = build_schedule(main_loop, [[0.5, 0.5, -1.0, 10]], [False], [0.1],
                          {}, 1.0)
    assert [s.method for s in segs] == ["HIO"] * 3

    # semantics on crafted states (no transforms needed)
    import types
    import jax.numpy as jnp
    from xframe_tpu.projects.fxs.phasing import MTIP
    mtip = MTIP.__new__(MTIP)  # only _snapshot/_reset_to_best are exercised
    rho = jnp.ones((4,), jnp.complex64)
    best = 2.0 * jnp.ones((4,), jnp.complex64)
    sup = jnp.array([True, True, False, False])
    bmask = jnp.array([False, True, True, False])
    late = PhasingState(rho, sup, best, bmask,
                        best_err=jnp.float32(0.1), last_err=jnp.float32(0.5),
                        err_snapshot=jnp.float32(0.4))
    out = mtip._reset_to_best(late)  # best improved after snapshot → reset
    assert np.allclose(np.asarray(out.rho), np.asarray(best))
    assert np.array_equal(np.asarray(out.support), np.asarray(bmask))
    assert out.err_snapshot is None
    early = late._replace(err_snapshot=jnp.float32(0.1))  # best ≤ snapshot
    out = mtip._reset_to_best(early)
    assert np.allclose(np.asarray(out.rho), np.asarray(rho))
    assert np.array_equal(np.asarray(out.support), np.asarray(sup))
    assert mtip._reset_to_best(late._replace(err_snapshot=None)) \
        .err_snapshot is None

    # end-to-end through run(): markers execute inside the jitted schedule
    from xframe_tpu.projects.fxs.demo import make_demo_problem
    import jax
    p = make_demo_problem(12, 6)
    sched = [Segment("HIO", 3, betas=np.full(3, 0.5), ft_stab=True),
             Segment("SNAPSHOT"),
             Segment("HIO", 3, betas=np.full(3, 0.5), ft_stab=True),
             Segment("RESET_TO_BEST")]
    rho0 = p.initial_density_batch(0, 1)
    state, errs = jax.jit(lambda r: p.mtip.run_batch(r, sched))(rho0)
    errs = np.asarray(errs)
    assert errs.shape == (1, 6, 2) and np.isfinite(errs).all()
    # errors keep improving in this demo → the reset selects the best iterate
    if errs[0, :, 0].argmin() >= 3:
        assert np.allclose(np.asarray(state.rho), np.asarray(state.best_rho))


def test_bl_eig_sort_mode_median_of_scaled_eigenvector():
    """sort_mode 1 ranks eigen-pairs by median(|sqrt(lam) v|): a spread-out
    eigenvector with a slightly smaller eigenvalue beats a delta-like
    eigenvector with the top eigenvalue (the degenerate-2D failure the
    reference option exists for, fxs_invariant_tools.py:1114-1141)."""
    from xframe_tpu.projects.fxs import invariants as itools
    n = 16
    v_spike = np.zeros(n); v_spike[0] = 1.0
    v_flat = np.ones(n) / np.sqrt(n)
    v_flat -= v_flat @ v_spike * v_spike
    v_flat /= np.linalg.norm(v_flat)
    B = (1.0 * np.outer(v_spike, v_spike)
         + 0.9 * np.outer(v_flat, v_flat)).astype(complex)
    vec0, eig0 = itools.deg2_invariant_to_projection_vectors_2d(B[None])
    vec1, eig1 = itools.deg2_invariant_to_projection_vectors_2d(
        B[None], sort_mode=1)
    assert np.isclose(eig0[0], 1.0)          # eigenvalue order: spike wins
    assert np.isclose(eig1[0], 0.9)          # median metric: flat mode wins
    corr = np.abs(vec1[0] @ v_flat) / np.linalg.norm(vec1[0])
    assert corr > 0.99
    # 3D path: the selected leading column changes the same way
    proj0, e3 = itools.deg2_invariant_to_projection_matrices(B[None])
    proj1, e3b = itools.deg2_invariant_to_projection_matrices(B[None],
                                                              sort_mode=1)
    assert np.isclose(e3[0][0], 1.0) and np.isclose(e3b[0][0], 0.9)


def test_simulate_oversampling_max_q(home):
    """grid.max_q False: q_max from oversampling x outermost shape extent
    via Q*R = c*N (reference simulate_ccd.py:109-123)."""
    out = _simulate("ovs", grid={"n_radial_points": N, "max_order": L,
                                 "max_q": False, "oversampling": 8})
    qs = np.asarray(out["radial_points"])
    from xframe_tpu.ops.hankel import reciprocity_relation
    # single sphere at r=0, size 20 -> max extent 20; rc = 2.0 default
    q_expect = reciprocity_relation(8 * 20.0, N, 2.0)
    # midpoint grid: qs = (arange(N)+0.5) * q_max / N
    assert np.isclose(qs[-1], (N - 0.5) * q_expect / N, rtol=1e-6)
    assert np.isfinite(out["cross_correlation"]["I1I1"]).all()


def test_simulate_2d_accepts_3d_default_centers():
    """dimensions: 2 with the shipped 3D default centers [[0,0,0]] (and any
    spherical (r,θ,φ) center) must take the polar (r,φ) reading instead of
    crashing on the coordinate-count mismatch; a genuinely wrong center
    length raises a clear error."""
    from xframe_tpu.projects.fxs.simulate_ccd import (
        build_density_from_shapes as _build_density)
    from xframe_tpu.library.shapes import polar_grid
    rng = np.random.default_rng(0)
    grid = polar_grid(np.linspace(1.0, 50.0, 16),
                      2 * np.pi * np.arange(24) / 24)
    d3 = _build_density(grid, {"types": ["sphere"], "centers": [[0, 0, 0]],
                               "sizes": [20], "densities": [1.0]}, rng)
    d2 = _build_density(grid, {"types": ["sphere"], "centers": [[0, 0]],
                               "sizes": [20], "densities": [1.0]}, rng)
    np.testing.assert_array_equal(d3, d2)
    assert d2.max() > 0
    with pytest.raises(ValueError, match="coordinates"):
        _build_density(grid, {"types": ["sphere"], "centers": [[0, 0, 0, 0]],
                              "sizes": [20], "densities": [1.0]}, rng)


def test_considered_projections_mask_selection():
    """considered_projections selects which constraint violations feed the
    HIO feedback region (reference fxs_IO_methods.py:24-64): with only
    'support' considered, a threshold-clipped (but in-support) point is NOT
    in the feedback mask."""
    import jax.numpy as jnp
    from xframe_tpu.projects.fxs.projections import RealConstraint
    rho = jnp.asarray([1.0 + 0j, -2.0 + 0j, 3.0 + 0j])
    sup = jnp.asarray([True, True, False])
    all_rc = RealConstraint(threshold_low=0.0, apply_limit_imag=False)
    out_a, inv_a = all_rc(rho, sup)
    assert np.array_equal(np.asarray(inv_a), [False, True, True])
    sup_rc = RealConstraint(threshold_low=0.0, apply_limit_imag=False,
                            considered_projections=("support",))
    out_s, inv_s = sup_rc(rho, sup)
    # identical projection output, different feedback mask
    assert np.allclose(np.asarray(out_a), np.asarray(out_s))
    assert np.array_equal(np.asarray(inv_s), [False, False, True])


def test_output_density_modifier_shift_to_center(invariants_lowres, home):
    """output_density_modifiers.shift_to_center centers every saved density
    (reference assemble_output_modifier, reconstruct.py:453-463)."""
    xf.select_project("fxs", "reconstruct", overrides={
        "structure_name": "np1",
        "grid": {"n_radial_points": 16, "max_order": L},
        "multi_start": {"n_reconstructions": 1, "seed": 5},
        "output_density_modifiers": {"shift_to_center": True},
        "main_loop": REC_LOOP,
    })
    out = xf.run()
    rho = np.asarray(out["reconstruction_results"]["0"]["real_density"])
    grid_r = np.asarray(out["configuration"]["internal_grid"]["real_grid"])
    thetas = np.asarray(out["configuration"]["internal_grid"]["thetas"])
    phis = np.asarray(out["configuration"]["internal_grid"]["phis"])
    # center of mass of |rho| in cartesian coords ~ 0 after the shift
    r = grid_r[:, None, None]
    st, ct = np.sin(thetas)[None, :, None], np.cos(thetas)[None, :, None]
    cp, sp = np.cos(phis)[None, None, :], np.sin(phis)[None, None, :]
    w = np.abs(rho)
    com = np.array([(w * r * st * cp).sum(), (w * r * st * sp).sum(),
                    (w * r * ct).sum()]) / max(w.sum(), 1e-30)
    assert np.linalg.norm(com) < 0.15 * grid_r[-1]


def test_average_alignment_max_iterations(reconstructions_opts, home):
    """max_iterations > 1 re-aligns rotated candidates; results stay finite
    and at least as good as a single pass (refinement only kept when the
    l2-to-reference improves)."""
    common = {"structure_name": "np1", "l2_error_limit": 10.0}
    xf.select_project("fxs", "average", overrides={
        **common, "max_iterations": 1})
    out1 = xf.run()
    xf.select_project("fxs", "average", overrides={
        **common, "max_iterations": 3, "alignment_error_limit": 1e-12})
    out3 = xf.run()
    l2_1 = np.asarray(out1["rotation_metric"]["l2_to_ref"])
    l2_3 = np.asarray(out3["rotation_metric"]["l2_to_ref"])
    assert np.isfinite(np.asarray(out3["average"]["real_density"])).all()
    assert len(out3["aligned"]) >= 1
    # refinement never worsens the kept l2 (per candidate, same ordering)
    for a, b in zip(l2_3, l2_1):
        assert a <= b + 1e-6


def test_radial_q_mask_variants():
    """reconstruct projections.reciprocal.q_mask parity with the reference
    ReciprocalProjection.generate_radial_mask (fxs_Projections.py:578-630):
    'none' still intersects with the data q-range; 'manual' supports nested
    region and order_dependent_line; 'from_projection_matrices' applies
    per-order data q-id limits."""
    from xframe_tpu.projects.fxs.reconstruct import ProjectWorker

    rm = ProjectWorker._radial_mask
    L = 6
    qs = np.linspace(0.0, 1.0, 21)           # internal grid
    qs_data = np.linspace(0.1, 0.8, 15)      # data grid (narrower)

    # type none, internal grid within the data span -> no mask (None)
    assert rm(None, {"q_mask": {"type": "none"}}, L, qs_data,
              qs_data=qs_data) is None

    # type none, internal grid wider than data -> data-range intersection
    m = rm(None, {"q_mask": {"type": "none"}}, L, qs, qs_data=qs_data)
    assert m.shape == (L + 1, len(qs))
    np.testing.assert_array_equal(m[0], (qs >= 0.1) & (qs <= 0.8))
    assert (m == m[0][None, :]).all()

    # manual / region (nested reference schema), half-open band [lo, hi)
    opt = {"q_mask": {"type": "manual",
                      "manual": {"type": "region", "region": [0.2, 0.6]}}}
    m = rm(None, opt, L, qs)
    np.testing.assert_array_equal(m[3], (qs >= 0.2) & (qs < 0.6))
    # legacy flat schema still accepted
    opt_flat = {"q_mask": {"type": "manual", "region": [0.2, 0.6]}}
    np.testing.assert_array_equal(rm(None, opt_flat, L, qs), m)
    # False bounds are open
    opt_lo = {"q_mask": {"type": "manual",
                         "manual": {"type": "region", "region": [False, 0.6]}}}
    np.testing.assert_array_equal(rm(None, opt_lo, L, qs)[0], qs < 0.6)

    # manual / order_dependent_line: q >= line(l) through the two points
    pts = [[0, 0.2], [6, 0.8]]
    opt = {"q_mask": {"type": "manual",
                      "manual": {"type": "order_dependent_line",
                                 "order_dependent_line": pts}}}
    m = rm(None, opt, L, qs)
    # reference formula (mathLibrary.distance_from_line_2d): keep -dist >= 0
    p1, p2 = np.asarray(pts, float)
    rot = np.array([[0, 1], [-1, 0]]) @ (p2 - p1)
    for l in range(L + 1):
        dist = (l - p1[0]) * rot[0] + (qs - p1[1]) * rot[1]
        np.testing.assert_array_equal(m[l], -dist >= 0,
                                      err_msg=f"order {l}")
    # sanity: far-from-boundary points follow q >= line(l)
    assert m[0][qs < 0.15].sum() == 0 and m[0][qs > 0.25].all()
    assert m[6][qs < 0.75].sum() == 0 and m[6][qs > 0.85].all()

    # from_projection_matrices: per-order strict (lo, hi) band in data q ids
    lims = np.array([[0, 15]] * (L + 1))
    lims[4] = [3, 10]
    lims[6] = [5, 5]   # empty -> fully masked order
    m = rm(None, {"q_mask": {"type": "from_projection_matrices"}}, L, qs,
           qs_data=qs_data, q_id_limits=lims)
    np.testing.assert_array_equal(
        m[4], (qs > qs_data[3]) & (qs < qs_data[9]))
    assert not m[6].any()
    # unlimited orders keep the data-range intersection only
    np.testing.assert_array_equal(
        m[0], (qs > qs_data[0]) & (qs < qs_data[14]))


def test_interp_radial_modes():
    """reconstruct regrid interpolation parity (reference ReGrider via
    projections.reciprocal.regrid.interpolation, fxs_Projections.py:639-676):
    nearest/linear/cubic with 0-fill outside the data q-range."""
    from xframe_tpu.projects.fxs.reconstruct import _interp_radial

    qs_d = np.linspace(0.1, 1.0, 10)
    y = (qs_d ** 2 + 1j * qs_d)[:, None] * np.array([[1.0, 2.0]])
    # identity on the same grid
    np.testing.assert_array_equal(_interp_radial(y, qs_d, qs_d, "cubic"), y)
    qs_n = np.array([0.0, 0.15, 0.55, 1.0, 1.2])
    for mode in ("nearest", "linear", "cubic"):
        out = _interp_radial(y, qs_d, qs_n, mode)
        assert out.shape == (5, 2)
        assert out[0, 0] == 0.0 and out[-1, 0] == 0.0, mode  # 0-fill outside
        np.testing.assert_allclose(out[3], y[-1], rtol=1e-12)  # exact at node
    # smooth data: cubic beats linear between nodes
    exact = 0.55 ** 2 + 0.55j
    err_cub = abs(_interp_radial(y, qs_d, qs_n, "cubic")[2, 0] - exact)
    err_lin = abs(_interp_radial(y, qs_d, qs_n, "linear")[2, 0] - exact)
    assert err_cub < err_lin
    # nearest picks the closest sample
    near = _interp_radial(y, qs_d, qs_n, "nearest")[1, 0]
    assert near == y[np.abs(qs_d - 0.15).argmin(), 0]


def test_allow_weight_calculation_and_saving_flags(home):
    """fourier_transform.allow_weight_calculation / allow_weight_saving
    (reference fourier_transforms.py:28-32): calculation disabled + no cache
    raises; saving disabled computes without writing the cache file."""
    from xframe_tpu.projects.fxs.reconstruct import load_cached_weights
    from xframe_tpu.settings import loader as settings_loader

    cache_dir = os.path.join(settings_loader.home_dir(), "cache")
    key = "hankel_3d_midpoint_N6_L2_rc2.h5"
    path = os.path.join(cache_dir, key)
    if os.path.exists(path):
        os.remove(path)
    with pytest.raises(FileNotFoundError):
        load_cached_weights(2, 6, 2.0, 3, "midpoint", allow_calculation=False)
    wd = load_cached_weights(2, 6, 2.0, 3, "midpoint", allow_saving=False)
    assert 6 in wd["weights"].shape and not os.path.exists(path)
    wd2 = load_cached_weights(2, 6, 2.0, 3, "midpoint")
    assert os.path.exists(path)
    np.testing.assert_allclose(wd2["weights"], wd["weights"])


def test_particle_estimate_in_gating():
    """number_of_particles.settings.estimate_in restricts the per-iteration
    estimation to the listed loop methods (reference reconstruct.py:560-690,
    default ['ER']): HIO iterations report n_hat = 0, ER iterations a real
    estimate."""
    import jax.numpy as jnp
    from xframe_tpu.ops.fourier import SphericalFourierTransform
    from xframe_tpu.library.shapes import spherical_grid, ball_density
    from xframe_tpu.projects.fxs.projections import (
        ReciprocalConstraint, RealConstraint, ShrinkWrap)
    from xframe_tpu.projects.fxs.phasing import MTIP
    from xframe_tpu.projects.fxs import invariants as itools

    N, L = 16, 4
    ft = SphericalFourierTransform(N, L, q_max=0.4, mode="midpoint",
                                   reciprocity_coefficient=2.0,
                                   real_dtype=jnp.float32)
    grid = spherical_grid(ft.rs, ft.sht.theta, ft.sht.phi)
    radius = ft.r_max / 2.5
    rho = ball_density(grid, radius / 2, center=(radius / 2, 1.2, 0.7))
    psi = ft.forward(jnp.asarray(rho, dtype=jnp.complex64))
    coeff = np.asarray(ft.sht.forward((psi * psi.conj()).real))
    bl = itools.harmonic_coeff_to_deg2_invariants_3d(coeff).real.astype(complex)
    bl[1::2] = 0
    proj, _ = itools.deg2_invariant_to_projection_matrices(bl)
    avg = np.sqrt(np.abs(np.diag(bl[0]).real) / (4 * np.pi))
    rc = ReciprocalConstraint.build(
        proj, ft.qs, L, average_intensity=avg, use_averaged_intensity=True,
        schmidt_scaling=False, pn_scan_space=(1.0, 9.0, 16), pn_project=False)
    support = np.asarray(grid[..., 0] < radius * 1.3)
    w = np.ones_like(rho) * support
    mtip = MTIP(ft, rc, RealConstraint(limit_imag=2.0), ShrinkWrap.build(ft.qs),
                w, support, pn_estimate_in=("ER",))
    assert mtip._pn_enabled
    rho0 = jnp.asarray(rho * support, dtype=jnp.complex64)
    _, _, _, n_hio, _ = mtip.mtip_iteration(rho0, jnp.asarray(support),
                                            0.5, "HIO", False)
    _, _, _, n_er, _ = mtip.mtip_iteration(rho0, jnp.asarray(support),
                                           0.0, "ER", False)
    assert float(n_hio) == 0.0
    assert float(n_er) >= 1.0  # scan space starts at N=1


def test_fix_orientation_rotation_phase_and_apply():
    """output_density_modifiers.fix_orientation parity: the gcd-chain
    residual-rotation phase (reference generate_remaining_SO_projection_2D,
    fxs_Projections.py:1023-1096) and the coefficient rotation
    c_m *= exp(i*m*phi0) (reconstruct.py:736-741)."""
    from xframe_tpu.projects.fxs.reconstruct import (
        so2_residual_rotation_phase, rotate_polar_density)

    M = 6
    qs = np.linspace(0.1, 1.0, 10)
    proj = [np.zeros(10) for _ in range(M + 1)]
    proj[4] = np.full(10, 5.0)   # strongest even order -> m1 = 4
    proj[6] = np.full(10, 2.0)   # next ranked order, gcd(4,6)=2 chain
    unknowns = np.ones(M + 1, dtype=complex)

    # phase of order 6 in [0, pi): floor(phase/pi) = 0 -> no rotation
    unknowns[6] = np.exp(2.0j)
    assert so2_residual_rotation_phase(unknowns, proj, qs) == 0.0
    # phase -2.0: floor(-2/pi) = -1 -> rotation = +pi/2 (coeff=1, gcd=2)
    unknowns[6] = np.exp(-2.0j)
    assert np.isclose(so2_residual_rotation_phase(unknowns, proj, qs),
                      np.pi / 2)

    # rotation application: grid-commensurate phi0 is an exact circular roll
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(3, 8)) + 1j * rng.normal(size=(3, 8))
    rot = rotate_polar_density(arr, 2 * np.pi * 3 / 8)
    np.testing.assert_allclose(rot, np.roll(arr, -3, axis=-1), atol=1e-12)


def test_average_manual_reference_and_load_routine(reconstructions_opts, home):
    """selection.method 'manual' + manual_specifier [file, id] names the
    alignment reference (reference get_reference_arg, average.py:701-708);
    load_routine dispatches the loader by name (average.py:103)."""
    # average loads the LATEST reconstruction run; other tests may have
    # created newer single-restart runs since the fixture ran, so refresh
    # a 2-restart run here (compile is cached — this is cheap)
    xf.select_project("fxs", "reconstruct", overrides={
        "structure_name": "np1",
        "grid": {"n_radial_points": 16, "max_order": L},
        "multi_start": {"n_reconstructions": 2, "seed": 3},
        "main_loop": REC_LOOP,
    })
    xf.run()
    xf.select_project("fxs", "average", overrides={
        "structure_name": "np1",
        "load_routine": "load_reconstructions",
        "selection": {"method": "manual", "manual_specifier": [0, 1],
                      "error_limit": 10.0},
        "l2_error_limit": 10.0,
    })
    out = xf.run()
    # the named reconstruction is the reference = first input_meta entry
    ref_meta = out["input_meta"]["0"]
    assert ref_meta["file_index"] == 0 and str(ref_meta["result_key"]) == "1"

    # nonexistent specifier -> explicit error
    xf.select_project("fxs", "average", overrides={
        "structure_name": "np1",
        "selection": {"method": "manual", "manual_specifier": [0, 99],
                      "error_limit": 10.0},
    })
    with pytest.raises(RuntimeError, match="manual_specifier"):
        xf.run()

    # unknown load_routine -> explicit error
    xf.select_project("fxs", "average", overrides={
        "structure_name": "np1", "load_routine": "not_a_loader"})
    with pytest.raises(AttributeError, match="load_routine"):
        xf.run()


def test_pixel_custom_cc_mask_matches_reference_recipe():
    """cc_mask type 'pixel_custom' parity with the reference algorithm
    (fxs_invariant_tools.py:140-171): mask the first/last n delta pixels
    (and around pi) only for q-pairs within the nq index band."""
    from xframe_tpu.projects.fxs import invariants as itools

    n_q, n_phi = 8, 20
    qs = np.linspace(0.1, 1.0, n_q)
    phis = 2 * np.pi * np.arange(n_phi) / n_phi
    for mask_at_pi, f_phi, f_q in [(True, 0.1, 0.25), (False, 0.15, 1.0),
                                   (True, 0.0, 0.5)]:
        got = itools.cc_mask(qs, phis, mask_type="pixel_custom",
                             mask_at_pi=mask_at_pi,
                             n_masked_pixels_phi=f_phi,
                             n_masked_pixels_q=f_q)
        # direct transcription of the reference recipe
        n = int(n_phi * f_phi)
        nq = int(n_q * f_q)
        pi_index = int(n_phi / 2)
        if mask_at_pi:
            ids = (list(range(n)) + list(range(pi_index - (n - 1),
                                               pi_index + (n - 1)))
                   + list(range(n_phi - n, n_phi)))
        else:
            ids = list(range(n)) + list(range(n_phi - n, n_phi))
        ref = np.full((n_q, n_q, n_phi), True)
        ref[..., ids] = False
        far = np.abs(np.arange(n_q)[:, None] - np.arange(n_q)[None, :]) > nq
        ref[far] = True
        np.testing.assert_array_equal(got, ref,
                                      err_msg=f"{mask_at_pi} {f_phi} {f_q}")
        if n > 0:
            assert not got[0, 0, 0]          # near-diagonal pair masked at 0
            assert got[0, -1 if nq < n_q - 1 else 0, 0] or nq >= n_q - 1


def test_bl_enforce_psd_per_dataset_override(ccd1, home, monkeypatch):
    """datasets.<name>.bl_enforce_psd overrides the global PSD flag
    (reference extract.py:417-430 + datasets schema)."""
    from xframe_tpu.projects.fxs import invariants as itools
    calls = []
    orig = itools.apply_psd_on_q_limits

    def spy(bl, qlim):
        calls.append(1)
        return orig(bl, qlim)

    monkeypatch.setattr(itools, "apply_psd_on_q_limits", spy)
    base = {"structure_name": "np1", "dimensions": 3, "max_order": L}
    xf.select_project("fxs", "extract", overrides={
        **base, "cross_correlation": {"datasets": {"I1I1": {
            "bl_enforce_psd": False}}}})
    xf.run()
    assert len(calls) == 0
    xf.select_project("fxs", "extract", overrides=base)
    xf.run()
    assert len(calls) == 1
    # the per-dataset default is null: the GLOBAL flag must be honored when
    # no per-dataset override is given (the old default of True shadowed it)
    xf.select_project("fxs", "extract", overrides={
        **base, "invariant_constraints": {"positive_semidefinite": {
            "apply": False}}})
    xf.run()
    assert len(calls) == 1  # no new PSD call


def test_extract_rejects_qrange_xcca_ccd(home, ccd1):
    """A qrange_xcca-restricted ccd (rectangular CC vs full radial_points,
    the reference file layout, correlate.py:290) must fail extraction with
    a descriptive error instead of a broadcast crash."""
    import copy
    from xframe_tpu.projects.fxs.extract import ProjectWorker
    ccd = copy.deepcopy(ccd1)
    ccd["cross_correlation"]["I1I1"] = \
        np.asarray(ccd["cross_correlation"]["I1I1"])[:3, :2]
    xf.select_project("fxs", "extract", overrides={
        "structure_name": "np1", "dimensions": 3, "max_order": L})
    w = ProjectWorker()
    with pytest.raises(ValueError, match="qrange_xcca"):
        w.extract(ccd, 3)


def test_projection_matrix_error_estimates(invariants_lowres):
    """Invariants file carries per-order relative factorization errors
    |B_l - V_l V_l^dag|/|B_l| (reference calc_projection_matrix_error_estimate,
    fxs_invariant_tools.py:1259-1268; stored at extract.py:447)."""
    est = invariants_lowres["data_projection_matrix_error_estimates"]["I1I1"]
    bl = np.asarray(invariants_lowres["deg_2_invariant"]["I1I1"])
    est = np.asarray(est)
    assert est.shape == bl.shape
    # nonzero entries carry a relative error; zero entries the -1 sentinel
    nz = bl != 0
    assert (est[~nz] == -1).all()
    assert (est[nz] >= 0).all()
    # rank-capped factorization is near-exact for low orders (full rank)
    assert est[0][nz[0]].max() < 1e-6
    # direct recomputation matches
    from xframe_tpu.projects.fxs import invariants as itools
    proj = invariants_lowres["data_projection_matrices"]["I1I1"]
    ref = itools.projection_matrix_error_estimate(bl, proj)
    np.testing.assert_allclose(est, ref)


def test_configurable_error_metrics(invariants_lowres, home):
    """main_loop.error.methods: reciprocal metrics (l2_projection_diff,
    deg2_invariant_l2_diff with order) are computed per iteration, and the
    main combiner (reference generate_main_error_routine,
    fxs_IO_methods.py:746-765) drives best-density tracking."""
    overrides = {
        "structure_name": "np1",
        "grid": {"n_radial_points": 16, "max_order": L},
        "multi_start": {"n_reconstructions": 1, "seed": 7},
        "main_loop": {
            **REC_LOOP,
            "error": {"methods": {
                "real": {"calculate": ["l2_projection_diff"],
                         "l2_projection_diff": {
                             "inside_initial_support": True}},
                "reciprocal": {"calculate": ["l2_projection_diff",
                                             "deg2_invariant_l2_diff"],
                               # the fixture is a centered sphere: only B_0
                               # is nonzero, so track order 0
                               "deg2_invariant_l2_diff": {"order": 0}},
                "main": {"metrics": {"real": ["l2_projection_diff"],
                                     "reciprocal": ["l2_projection_diff"]},
                         "type": "mean"},
            }},
        },
    }
    xf.select_project("fxs", "reconstruct", overrides=overrides)
    out = xf.run()
    ed = out["reconstruction_results"]["0"]["error_dict"]
    main = np.asarray(ed["main"])
    rec = np.asarray(ed["reciprocal"])
    real = np.asarray(ed["real_l2_projection_diff"])
    deg2 = np.asarray(ed["reciprocal_deg2_invariant_l2_diff"])
    assert np.isfinite(main).all() and np.isfinite(deg2).all()
    assert (deg2 >= 0).all()
    # main == mean(real l2, reciprocal l2) per the configured combiner
    np.testing.assert_allclose(main, (real + rec) / 2, rtol=2e-5, atol=1e-7)
    # the deg2 fidelity of a converging run improves overall
    assert deg2[-1] < deg2[0]

    # unknown metric name -> explicit setup error
    bad = dict(overrides)
    bad["main_loop"] = {**REC_LOOP, "error": {"methods": {
        "real": {"calculate": ["not_a_metric"]}}}}
    xf.select_project("fxs", "reconstruct", overrides=bad)
    with pytest.raises(ValueError, match="unknown error metric"):
        xf.run()


def test_per_method_ft_stab_in_schedule():
    """methods.<m>.ft_stab (reference reconstruct.py:836-850) is honored per
    method and wins over the loop-level ft_stabilization map."""
    from xframe_tpu.projects.fxs.phasing import build_schedule
    main_loop = {"order": ["main"], "main": {
        "iterations": 1, "order": ["HIO", "ER"],
        "methods": {"HIO": {"iterations": 2, "ft_stab": True},
                    "ER": {"iterations": 2}}}}
    segs = build_schedule(main_loop, [[0.5, 0.5, -1.0, 10]], [False], [0.1],
                          {"main": {"ER": True}}, 1.0)
    by_method = {s.method: s.ft_stab for s in segs}
    assert by_method["HIO"] is True    # per-method key
    assert by_method["ER"] is True     # loop-level map fallback
    # dynamic variant compiles to a gated ft_stab structure: ft_stab True
    # plus a link delay (>= 1) carried on the segment — the runtime 0/1
    # gate on the enforce history realizes reconstruct.py:836-850
    # (full behavior in tests/test_dynamic_ft_stab.py)
    main_loop["main"]["methods"]["HIO"]["ft_stab"] = \
        "link_to_enforce_initial_support"
    segs = build_schedule(main_loop, [[0.5, 0.5, -1.0, 10]], [False], [0.1],
                          {}, 1.0)
    hio = [s for s in segs if s.method == "HIO"]
    assert [s.ft_stab for s in hio] == [True]
    assert [s.ft_stab_link_delay for s in hio] == [1]
