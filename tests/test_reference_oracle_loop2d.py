"""STEP-LOCKED whole-loop 2D oracle (VERDICT r3 #2): run the reference's
ASSEMBLED MTIP recipe — its own RecipeFactory compiling its own reconstruct.py
sketches over its own operator objects (full constructors, not shims) — next
to xframe_tpu's composed iteration on identical inputs and schedule, and
assert per-iteration trajectory agreement (ρ, real/reciprocal errors).

The 2D path needs none of the reference's native deps (circular HT = numpy
FFT, CPU polar Hankel einsum), so the reference loop executes verbatim here:

  * sketches: HIO / ER ± ft_stab + MTIP_start (reconstruct.py:515-619)
  * operators: ReciprocalProjection / RealProjection / HIOProjection /
    error routines built through generate_error_routines — all REAL
    constructors, driven by a crafted settings.project tree
  * iteration loop: `process.run(*pair)` exactly as assemble_phasing_loop's
    inner loop does (reconstruct.py:922-936)

Both sides run in float64 (ours under jax.enable_x64), so any
disagreement is semantics, not precision. Skipped without /root/reference.
"""
import os
import sys
import types
import warnings

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "xframe")),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def refns(tmp_path_factory):
    home = tmp_path_factory.mktemp("ref_home_loop2d")
    old_home = os.environ.get("HOME")
    os.environ["HOME"] = str(home)
    sys.path.insert(0, REF)
    if "xframe._version" not in sys.modules:
        vm = types.ModuleType("xframe._version")
        vm.__version__ = "0.0.0"
        sys.modules["xframe._version"] = vm
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", SyntaxWarning)
            from xframe import settings as xsettings
            from xframe.settings.tools import DictNamespace as SDN
            from xframe.library.pythonLibrary import RecipeFactory
            from xframe.library.gridLibrary import GridFactory
            from xframe.projects.fxs.projectLibrary import (
                harmonic_transforms as rharm,
                hankel_transforms as rht,
                fourier_transforms as rft,
                fxs_Projections as fxsp,
                fxs_IO_methods as fio,
                misk as rmisk,
            )
    finally:
        if old_home is not None:
            os.environ["HOME"] = old_home
        sys.path.remove(REF)
    return types.SimpleNamespace(
        settings=xsettings, SDN=SDN, RecipeFactory=RecipeFactory,
        GridFactory=GridFactory, rharm=rharm, rht=rht, rft=rft, fxsp=fxsp,
        fio=fio, rmisk=rmisk)


# ------------------------------------------------------------- problem data
def _problem(n_q=16, M=8, rc=2.0, seed=5):
    """Shared float64 inputs: grids, rank-1 V_m data, initial guess."""
    from xframe_tpu.ops.hankel import radial_grids
    n_phi = 2 * M + 1              # the reference 2D angular rule (2M+1)
    q_max = 0.5
    rs, qs, r_max = radial_grids("midpoint", q_max, n_q, rc)
    phis = 2 * np.pi * np.arange(n_phi) / n_phi
    rng = np.random.default_rng(seed)
    R = r_max / 2.2
    rr, pp = np.meshgrid(rs, phis, indexing="ij")
    xx, yy = rr * np.cos(pp), rr * np.sin(pp)
    rho_true = (((xx - R / 2.4) ** 2 + (yy - 0.2 * R) ** 2 < (R / 2.6) ** 2)
                * 1.0
                + ((xx + R / 3) ** 2 + (yy + R / 3) ** 2 < (R / 3.2) ** 2)
                * 0.7)
    support = rr < R * 1.15
    rho0 = ((1.0 + 0.5 * rng.random((n_q, n_phi)))
            * np.exp(-(rr / (0.7 * R)) ** 2)).astype(complex)
    return types.SimpleNamespace(n_q=n_q, M=M, n_phi=n_phi, rc=rc,
                                 q_max=q_max, rs=rs, qs=qs, r_max=r_max,
                                 phis=phis, rho_true=rho_true,
                                 support=support, rho0=rho0, R=R)


def _build_reference(refns, p, beta=0.5, limit_imag=2.0):
    """The reference 2D MTIP machinery, assembled exactly as reconstruct.py
    does (sketch structure from reconstruct.py:515-619)."""
    M, n_q = p.M, p.n_q
    orders = np.arange(M + 1)
    settings = refns.settings
    old_project = settings.project
    old_cache_aware = settings.general.cache_aware
    settings.general.cache_aware = False     # plain (non-blocked) routines
    settings.project = refns.SDN.dict_to_dictnamespace({
        "particle_radius": p.R,
        "GPU": {"use": False, "error_squares": False},
        "fourier_transform": {"pos_orders": orders},
        "projections": {
            "reciprocal": {
                "used_order_ids": orders,
                "SO_freedom": {"use": False},
                "number_of_particles": {"initial": 1},
                "q_mask": {"type": "none"},
                "regrid": {"interpolation": "linear"},
                "use_averaged_intensity": True,
                "odd_orders_to_0": True,
            },
            "real": {
                "projections": {
                    "apply": ["support", "value_threshold", "limit_imag"],
                    "support": {
                        "initial_support": {"type": "max_radius",
                                            "max_radius": p.R * 1.15},
                        "enforce_initial_support": {
                            "apply": False, "if_error_bigger_than": np.inf},
                    },
                    "value_threshold": {"threshold": [0.0, False]},
                    "limit_imag": {"threshold": limit_imag},
                },
                "HIO": {"beta": [[beta, beta, -1 / 700, 1600]],
                        "considered_projections": ["all"]},
            },
        },
        "main_loop": {"error": {"methods": {
            "main": {"metrics": {"real": ["l2_projection_diff"],
                                 "reciprocal": []},
                     "type": "mean"},
            "real": {"calculate": ["l2_projection_diff"],
                     "l2_projection_diff": {"inside_initial_support": True}},
            "reciprocal": {"calculate": ["l2_projection_diff"]},
        }}},
    })
    try:
        cht = refns.rharm.HarmonicTransform(
            "complex", {"dimensions": 2, "max_order": M})
        ht = refns.rharm.HarmonicTransform(
            "real", {"dimensions": 2, "max_order": M})
        raw_w = refns.rht.calc_polar_mid_weights(orders, n_q, p.rc)
        weights_dict = {"weights": raw_w, "posHarmOrders": orders}
        ft, ift = refns.rft.generate_ft(
            p.r_max, weights_dict, cht, 2, pos_orders=orders,
            reciprocity_coefficient=p.rc, mode="midpoint")

        real_grid = refns.GridFactory.construct_grid("uniform",
                                                     [p.rs, p.phis])
        rec_grid = refns.GridFactory.construct_grid("uniform",
                                                    [p.qs, p.phis])
        grid_pair = types.SimpleNamespace(realGrid=real_grid,
                                          reciprocalGrid=rec_grid)

        # rank-1 data vectors from the true density THROUGH the reference FT
        psi_true = ft(p.rho_true.astype(complex))
        Im_true = np.fft.rfft((psi_true * psi_true.conj()).real,
                              axis=-1)[:, : M + 1] / p.n_phi
        V = np.ascontiguousarray(Im_true.T)               # (M+1, n_q)
        avg_int = Im_true[:, 0].real

        # data radial points get an epsilon offset: the reference's
        # no-regrid branch is dead code (UnboundLocalError on `low_res`,
        # fxs_Projections.py:676 — its real runs always regrid), so the
        # regrid path must run; linear interpolation from epsilon-shifted
        # nodes is identity to ~1e-12
        from xframe.library.gridLibrary import NestedArray, SampledFunction
        data_qs = np.asarray(p.qs).copy()
        data_qs[0] -= 1e-12          # widen both ends: the q-range mask then
        data_qs[-1] += 1e-12         # keeps every internal point
        q_na = NestedArray(data_qs[:, None], 1)
        avg_sf = SampledFunction(q_na, avg_int.copy(), coord_sys="cartesian")
        data = {"dimensions": 2, "xray_wavelength": 1.23,
                "average_intensity": avg_sf,
                "data_radial_points": data_qs,
                "data_angular_points": p.phis,
                "max_order": M,
                "data_projection_matrices": V.copy()}
        rp = refns.fxsp.ReciprocalProjection(rec_grid, data, M)
        real_obj = refns.fxsp.RealProjection(
            settings.project.projections.real.projections,
            {"integrated_intensity": rp.integrated_intensity,
             "real_grid": real_grid, "auto_correlation": False})
        hio = refns.fio.HIOProjection(
            beta, considered_projections=["all"])
        err_routines = refns.fio.generate_error_routines(
            settings.project.main_loop.error, grid_pair,
            deg2_invariants=rp.deg2_invariants,
            projection_matrices=rp.projection_matrices,
            used_orders=rp.used_orders, n_particles=rp.number_of_particles,
            invariant_mask=(rp.radial_mask[:, :, None]
                            * rp.radial_mask[:, None, :]),
            xray_wavelength=1.23, initial_mask=real_obj.initial_support)
        # Reference quirk, found BY this step-locked test: the reciprocal
        # l2 routine's default mask is the Python bool True, and
        # `square_diff[~mask] = 0` with ~True == -2 silently zeroes radial
        # row -2 of numerator AND denominator (fxs_IO_methods.py:114-120) —
        # a bool-indexing artifact, not intended masking. Parity is asserted
        # against the intended all-points metric by generating the same
        # reference routine with an explicit all-True ndarray mask.
        rec_core = refns.fio.generate_l2_rel_diff_error_routine(
            grid_pair, _type="reciprocal",
            mask=np.ones((n_q, p.n_phi), dtype=bool))

        def _rec3(values, projected_values, coeffs):
            return rec_core(values, projected_values)

        err_routines["reciprocal"] = [refns.fio.combine_error_routines(
            {"l2_projection_diff": _rec3}), 3]

        results = {"errors": {"real": {}, "reciprocal": {}},
                   "fxs_unknowns": None}
        error_dict = {"main": [], "real": results["errors"]["real"],
                      "reciprocal": results["errors"]["reciprocal"]}

        def save_number_of_particles():
            return None

        shape = (n_q, p.n_phi)
        ops = {
            "fourier_transform": ft,
            "inverse_fourier_transform": ift,
            "harmonic_transform": ht.forward,
            "inverse_harmonic_transform": ht.inverse,
            "mtip_projection": rp.mtip_projection,
            "approximate_unknowns": rp.approximate_unknowns,
            "project_to_modified_intensity": rp.project_to_modified_intensity,
            "save_number_of_particles": save_number_of_particles,
            "real_projection": real_obj.projection,
            "hybrid_input_output": hio.projection,
            "error_reduction": refns.fio.error_reduction,
            "square_grid": refns.rmisk.generate_square(
                shape, np.dtype(complex), cache_aware=False),
            "abs_value": refns.rmisk.generate_absolute_value(
                shape, np.dtype(complex), cache_aware=False),
            "copy": refns.rmisk.copy,
            "diff": refns.rmisk.diff,
            "add_above_zero_index": refns.rmisk.add_above_zero_index,
            "save_to_dict": refns.rmisk.save_to_dict,
        }
        factory = refns.RecipeFactory(ops)
        # [fn, n_args] specs only work through addOperators — the reference
        # constructor consumes the dict before creating the arity table
        # (pythonLibrary.py:577-581), as its own misk factory does
        factory.addOperators({
            "real_errors": [err_routines["real"][0], 2],
            "reciprocal_errors": [err_routines["reciprocal"][0], 3]})
        # assemble_error_saving_parts (reconstruct.py:500-513)
        for name in ("real", "reciprocal"):
            sketch = [name + "_errors",
                      [(0,), [("save_to_dict",
                               (results, ["errors", name],
                                "iterative_append"))]]]
            factory.addOperators({"calc_" + name + "_errors":
                                  factory.buildProcessFromSketch(sketch)})
        # MTIP_start (reconstruct.py:518-528)
        mtip_start = factory.buildProcessFromSketch([
            [(0, 0), ["copy", "square_grid"]],
            [(0, 1, 1), ["id", "harmonic_transform", "copy"]],
            [(0, 1, 1, 2), ["id", "id", "approximate_unknowns", "id"]],
            [(0, 1, 2, 3), [("id", ()), ("id", ()),
                            ("save_to_dict",
                             (results, "fxs_unknowns", "replace")), "id"]],
            [(0, 1, 2, 1, 3), ["id", "mtip_projection", "id", "id"]],
            [(0, 1, 2, 3), ["id", "inverse_harmonic_transform", "id", "id"]],
            [(0, 0, 3, 1, 2), ["id", "project_to_modified_intensity",
                               "save_number_of_particles", "id"]],
            [(0, 1, 2, 1), ["calc_reciprocal_errors", "id"]],
            [(1,), ["id"]],
        ])
        factory.addOperators({"MTIP_start": mtip_start})
        # HIO/ER ± ft_stab (reconstruct.py:565-595)
        io_names = {"HIO": "hybrid_input_output", "ER": "error_reduction"}
        procs = {}
        for name in ("HIO", "ER"):
            procs[name] = factory.buildProcessFromSketch([
                [(1, 1), ["fourier_transform", "id"]],
                [np.array([0, 0, 1], dtype=int), ["MTIP_start", "id"]],
                [np.array([0, 1, 0], dtype=int),
                 ["inverse_fourier_transform", "id", "id"]],
                [np.array([0, 0, 1, 2], dtype=int),
                 ["copy", "real_projection", "id", "id"]],
                [(0, 1, 2, 0, 1, 3), [io_names[name], "calc_real_errors",
                                      "id"]],
                [(2, 0), ["id", "id"]],
            ])
            procs[name + "_ft_stab"] = factory.buildProcessFromSketch([
                [(1, 1), ["fourier_transform", "id"]],
                [(0, 0, 0, 1), ["MTIP_start", "inverse_fourier_transform",
                                "id"]],
                [(0, 2, 1, 2, 0), ["inverse_fourier_transform", "diff",
                                   "id", "id"]],
                [(0, 1, 2, 3), ["add_above_zero_index", "id", "id"]],
                [(0, 0, 1, 2), ["copy", "real_projection", "id", "id"]],
                [(0, 1, 2, 0, 1, 3), [io_names[name], "calc_real_errors",
                                      "id"]],
                [(2, 0), ["id", "id"]],
            ])
        main_error = refns.fio.generate_main_error_routine(
            settings.project.main_loop.error.methods.main.metrics, "mean")
        return types.SimpleNamespace(
            procs=procs, ft=ft, error_dict=error_dict, results=results,
            main_error=main_error, rp=rp, V=V, avg_int=avg_int, hio=hio,
            real_obj=real_obj)
    finally:
        settings.project = old_project
        settings.general.cache_aware = old_cache_aware


def _run_reference(ref, rho0, schedule):
    """The reference inner loop (reconstruct.py:922-936): density pairs
    threaded through process.run; errors collected by the recipe itself."""
    pair = (ref.ft(rho0.copy()), rho0.copy())
    rhos, mains = [], []
    for method, n, ft_stab in schedule:
        proc = ref.procs[method + ("_ft_stab" if ft_stab else "")]
        for _ in range(n):
            pair = tuple(np.array(a) for a in proc.run(*pair))
            mains.append(ref.main_error(ref.error_dict))
            ref.error_dict["main"].append(mains[-1])
            rhos.append(pair[1].copy())
    rec = ref.error_dict["reciprocal"]["l2_projection_diff"]
    real = ref.error_dict["real"]["l2_projection_diff"]
    return np.stack(rhos), np.asarray(mains), np.asarray(real), \
        np.asarray(rec)


def _build_ours_f64(p, V, avg_int, limit_imag=2.0):
    import jax.numpy as jnp
    from xframe_tpu.ops.fourier import PolarFourierTransform
    from xframe_tpu.ops.integrate import PolarIntegrator
    from xframe_tpu.projects.fxs.projections import (
        ReciprocalConstraintPolar, RealConstraint, RealCircularHarmonics,
        ShrinkWrap)
    from xframe_tpu.projects.fxs.phasing import MTIP
    ft = PolarFourierTransform(p.n_q, p.M, p.n_phi, p.q_max, mode="midpoint",
                               reciprocity_coefficient=p.rc,
                               real_dtype=jnp.float64)
    cht = RealCircularHarmonics(p.n_phi, p.M)
    rc_obj = ReciprocalConstraintPolar.build(
        [V[m] for m in range(p.M + 1)], p.qs, p.M,
        use_averaged_intensity=True, average_intensity=avg_int,
        odd_orders_to_0=True, real_dtype=jnp.float64)
    real = RealConstraint(threshold_low=0.0, limit_imag=limit_imag)
    sw = ShrinkWrap.build(p.qs, grid_rank=2, real_dtype=jnp.float64)
    integ = PolarIntegrator(p.rs, p.n_phi, real_dtype=jnp.float64)
    w_err = np.asarray(integ._w) * p.support
    mtip = MTIP(ft, rc_obj, real, sw, w_err, p.support,
                real_dtype=jnp.float64, harmonic=cht,
                fix_global_phase=False)
    return mtip


@pytest.mark.parametrize("ft_stab", [False, True])
def test_step_locked_2d_loop_matches_reference(refns, ft_stab):
    """≥10 HIO+ER iterations: per-iteration ρ and (real, reciprocal) errors
    of our composed iteration match the reference's assembled recipe loop in
    float64. Schedule: 6 HIO + 6 ER (both ft-stab variants)."""
    import jax
    p = _problem()
    ref = _build_reference(refns, p)
    schedule = [("HIO", 6, ft_stab), ("ER", 6, ft_stab)]
    rhos_ref, main_ref, real_ref, rec_ref = _run_reference(
        ref, p.rho0, schedule)

    with jax.enable_x64(True):
        mtip = _build_ours_f64(p, ref.V, ref.avg_int)
        # data parity first: post-modify projection matrices must agree
        np.testing.assert_allclose(np.asarray(mtip.rc.V),
                                   ref.rp.projection_matrices, atol=1e-12)
        rho = jax.numpy.asarray(p.rho0, dtype=jax.numpy.complex128)
        support = jax.numpy.asarray(p.support)
        rhos, errs, errs_rec = [], [], []
        for method, n, stab in schedule:
            for _ in range(n):
                rho, err, err_rec, _, _ = mtip.mtip_iteration(
                    rho, support, 0.5, method, stab)
                rhos.append(np.asarray(rho))
                errs.append(float(err))
                errs_rec.append(float(err_rec))

    scale = np.abs(rhos_ref).max(axis=(1, 2))
    for i in range(len(errs)):
        d = np.abs(rhos[i] - rhos_ref[i]).max() / scale[i]
        assert d < 1e-8, f"iteration {i} ({ft_stab=}): rho diverged by {d}"
    np.testing.assert_allclose(errs, main_ref, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(errs, real_ref, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(errs_rec, rec_ref, rtol=1e-8, atol=1e-12)


def test_step_locked_2d_loop_link_ft_stab(refns):
    """Dynamic ft_stab (link_to_enforce_initial_support, reference
    reconstruct.py:836-850) step-locked against the reference's own decision
    rule: maintain the reference's enforce_initial_support_list, pick its
    HIO/HIO_ft_stab recipe per change_to_ft_stab, and assert our gated run
    follows the same per-iteration trajectory. The SW support update itself
    is oracle-tested elsewhere; here both sides consume OUR SW output,
    mirroring the reference loop's `real_pr.support = support` assignment."""
    import jax
    from xframe_tpu.projects.fxs.phasing import Segment
    p = _problem()
    ref = _build_reference(refns, p)
    delay = 1
    sigma = p.R / 2

    def our_schedule():
        return [
            Segment("HIO", 4, betas=np.full(4, 0.5), ft_stab=True,
                    ft_stab_link_delay=delay),
            Segment("SW", sigma=sigma, threshold=0.08),
            Segment("HIO", 4, betas=np.full(4, 0.5), ft_stab=True,
                    ft_stab_link_delay=delay),
            Segment("SW", sigma=sigma, threshold=0.08),
            Segment("ER", 4, betas=np.zeros(4), ft_stab=True,
                    ft_stab_link_delay=delay),
        ]

    with jax.enable_x64(True):
        # probe with limit=inf to place a limit BETWEEN the two pre-SW errors
        mtip = _build_ours_f64(p, ref.V, ref.avg_int)
        rho0 = jax.numpy.asarray(p.rho0, dtype=jax.numpy.complex128)
        _, errs_probe = mtip.run(rho0, our_schedule())
        errs_probe = np.asarray(errs_probe)
        pre_sw = sorted([errs_probe[3, 0], errs_probe[7, 0]])
        limit = float(np.sqrt(pre_sw[0] * pre_sw[1])) \
            if not np.isclose(pre_sw[0], pre_sw[1], rtol=1e-3) else np.inf

        mtip = _build_ours_f64(p, ref.V, ref.avg_int)
        mtip.enforce_limit = limit
        sched = our_schedule()
        mtip.register_schedule_dynamics(sched)
        state = mtip._init_enforce_hist(mtip.initial_state(rho0))
        our_mains, our_supports = [], []
        for seg in sched:
            state, errs = mtip.run_from(state, [seg])
            if seg.method == "SW":
                our_supports.append(np.asarray(state.support))
            else:
                our_mains.extend(np.asarray(errs)[:, 0].tolist())
        our_rho = np.asarray(state.rho)

    # ---- reference side: its own change_to_ft_stab rule drives recipe choice
    enforce_list = []
    supports = iter(our_supports)
    pair = (ref.ft(p.rho0.copy()), p.rho0.copy())
    mains = []
    used_variants = []
    for seg in our_schedule():
        if seg.method == "SW":
            enforce_list.append(bool(mains[-1] > limit))
            # the reference loop assigns real_pr.enforce_initial_support
            # BEFORE real_pr.support (reconstruct.py:879-882); its support
            # SETTER intersects with the initial mask when that flag is set
            # (fxs_Projections.py:52-58). Our injected support already
            # carries the intersection when enforcement fired, so the flag
            # must be False here — leaving the constructor default True
            # would intersect a non-enforced support too.
            ref.real_obj.enforce_initial_support = False
            ref.real_obj.support = next(supports).copy()
            continue
        ft_on = len(enforce_list) >= delay \
            and not any(enforce_list[-delay:])
        used_variants.append(ft_on)
        proc = ref.procs[seg.method + ("_ft_stab" if ft_on else "")]
        for _ in range(seg.n):
            pair = tuple(np.array(a) for a in proc.run(*pair))
            mains.append(ref.main_error(ref.error_dict))
            ref.error_dict["main"].append(mains[-1])

    # the rule must have actually flipped (else the case is vacuous)
    assert len(set(used_variants)) == 2 or limit == np.inf
    np.testing.assert_allclose(our_mains, mains, rtol=1e-8, atol=1e-12)
    d = np.abs(our_rho - pair[1]).max() / np.abs(pair[1]).max()
    assert d < 1e-8, f"final density diverged by {d}"


def test_step_locked_2d_scan_path_matches_manual(refns):
    """The lax.scan-composed run() follows the same trajectory as the manual
    per-iteration loop (same program the step-locked oracle validated)."""
    import jax
    p = _problem()
    ref = _build_reference(refns, p)
    with jax.enable_x64(True):
        from xframe_tpu.projects.fxs.phasing import Segment
        mtip = _build_ours_f64(p, ref.V, ref.avg_int)
        sched = [Segment("HIO", 6, betas=np.full(6, 0.5), ft_stab=True),
                 Segment("ER", 6, betas=np.zeros(6), ft_stab=True)]
        rho0 = jax.numpy.asarray(p.rho0, dtype=jax.numpy.complex128)
        state, errors = mtip.run(rho0, sched)
        errors = np.asarray(errors)
        rho = rho0
        support = jax.numpy.asarray(p.support)
        manual = []
        for method, n, stab in [("HIO", 6, True), ("ER", 6, True)]:
            for _ in range(n):
                rho, err, err_rec, _, _ = mtip.mtip_iteration(
                    rho, support, 0.5, method, stab)
                manual.append([float(err), float(err_rec)])
        np.testing.assert_allclose(errors, np.asarray(manual), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(state.rho), np.asarray(rho),
                                   rtol=0, atol=1e-12 * np.abs(
                                       np.asarray(rho)).max())
