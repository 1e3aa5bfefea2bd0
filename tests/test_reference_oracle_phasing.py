"""Executable parity evidence for the MTIP PHASING CORE: run the reference's
fxs_Projections / fxs_IO_methods machinery as an oracle next to xframe_tpu's
projections module on identical inputs.

Covered (reference file:line):
* HIO feedback incl. considered_projections mask assembly
  (fxs_IO_methods.py:24-64) and error_reduction (:67-68)
* RealProjection: support / value_threshold / limit_imag composition and the
  combined invalid mask (fxs_Projections.py:26-130,
  pythonLibrary.create_threshold_projection:1289-1320)
* approximate_unknowns 3D: per-l orthogonal-Procrustes SVD of (V_l† D²) I_l
  (fxs_Projections.py:752-790)
* mtip_projection 3D: V_l·U_l replacement on used orders / unmasked q, fixed
  l=0 data column, 1/√n_particles scaling (fxs_Projections.py:792-872)
* project_to_modified_intensity (fxs_Projections.py:874-929)
* fixed-volume shrink-wrap: golden-section threshold search (reference,
  fxs_Projections.py:260-291) vs the exact-quantile support — volume + IoU
  agreement

The per-l closures are exercised by constructing the reference classes via
``cls.__new__`` with exactly the attributes the generators close over — the
full constructors need the settings/database stack, the math does not.
Everything is skipped when /root/reference is absent.
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


@pytest.fixture(scope="session")
def ref(tmp_path_factory):
    """Import the reference phasing-core modules (version shimmed, HOME
    sandboxed — its startup creates ~/.xframe)."""
    home = tmp_path_factory.mktemp("ref_home")
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
            from xframe.projects.fxs.projectLibrary import (
                fxs_Projections as fxsp)
            from xframe.projects.fxs.projectLibrary import (
                fxs_IO_methods as fio)
            import xframe.library.mathLibrary as mlib
            from xframe.library.pythonLibrary import DictNamespace
    finally:
        if old_home is not None:
            os.environ["HOME"] = old_home
        sys.path.remove(REF)
    return types.SimpleNamespace(fxsp=fxsp, fio=fio, mlib=mlib,
                                 DictNamespace=DictNamespace)


def _pm_problem(n_q=16, l_max=6, seed=3):
    """Random projection matrices V_l (n_q, 2l+1) + intensity coefficient
    list I_l (n_q, 2l+1), well-conditioned for polar-factor comparison:
    I_l = V_l @ (random unitary) keeps PD@I = (V†D²V)·U away from rank
    deficiency."""
    rng = np.random.default_rng(seed)
    qs = np.linspace(0.1, 1.0, n_q)
    pms, ils = [], []
    for l in range(l_max + 1):
        k = 2 * l + 1
        v = rng.normal(size=(n_q, k)) + 1j * rng.normal(size=(n_q, k))
        a = rng.normal(size=(k, k)) + 1j * rng.normal(size=(k, k))
        u_true = np.linalg.qr(a)[0]
        pms.append(v)
        ils.append(v @ u_true + 0.05 * (rng.normal(size=(n_q, k))
                                        + 1j * rng.normal(size=(n_q, k))))
    return qs, pms, ils


def _ilm_dense(ils, n_q, l_max):
    """Pack the per-l list into xframe_tpu's centered dense layout
    (n_q, 2L+1, L+1)."""
    n_m = 2 * l_max + 1
    out = np.zeros((n_q, n_m, l_max + 1), dtype=complex)
    for l, il in enumerate(ils):
        out[:, l_max - l: l_max + l + 1, l] = il
    return out


# ------------------------------------------------------------- IO methods
def test_hio_feedback_matches_reference(ref):
    rng = np.random.default_rng(0)
    shape = (5, 6, 8)
    rho_in = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    rho_p = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    rho_proj = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    invalid = rng.random(shape) > 0.6
    beta = 0.43

    hio = ref.fio.HIOProjection(beta)
    expected = hio.projection(rho_p.copy(), (rho_proj.copy(),
                                             {"all": invalid}), rho_in.copy())

    from xframe_tpu.projects.fxs.projections import hio_update
    got = np.asarray(hio_update(rho_in, rho_p, rho_proj, invalid, beta))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)

    # considered_projections by name: feedback only on that constraint's mask
    sup_mask = rng.random(shape) > 0.5
    hio_sup = ref.fio.HIOProjection(beta, considered_projections=["support"])
    expected_sup = hio_sup.projection(
        rho_p.copy(), (rho_proj.copy(),
                       {"support": sup_mask, "all": invalid}), rho_in.copy())
    got_sup = np.asarray(hio_update(rho_in, rho_p, rho_proj, sup_mask, beta))
    np.testing.assert_allclose(got_sup, expected_sup, rtol=1e-6, atol=1e-6)

    # error_reduction keeps the projected density (fxs_IO_methods.py:67-68)
    from xframe_tpu.projects.fxs.projections import er_update
    np.testing.assert_allclose(
        np.asarray(er_update(rho_proj)),
        ref.fio.error_reduction(rho_p, (rho_proj, {}), rho_in))


# ---------------------------------------------------------- real projection
def _ref_real_projection(ref, support, opt_dict):
    """Reference RealProjection via __new__ + the attributes its generators
    close over (its __init__ needs the settings/grid stack)."""
    rp = ref.fxsp.RealProjection.__new__(ref.fxsp.RealProjection)
    rp.opt = ref.DictNamespace.dict_to_dictnamespace(opt_dict)
    rp._mask = [~support]
    return rp.assemble_projection()


def test_real_projection_matches_reference(ref):
    rng = np.random.default_rng(1)
    shape = (6, 5, 10)
    rho = rng.normal(size=shape) + 1j * 0.8 * rng.normal(size=shape)
    support = rng.random(shape) > 0.4
    limit = 0.9

    proj = _ref_real_projection(ref, support, {
        "apply": ["support", "value_threshold", "limit_imag"],
        "value_threshold": {"threshold": [0.0, False]},
        "limit_imag": {"threshold": limit},
    })
    expected, masks = proj(rho.copy())

    from xframe_tpu.projects.fxs.projections import RealConstraint
    rc = RealConstraint(threshold_low=0.0, threshold_high=None,
                        limit_imag=limit)
    got, got_invalid = rc(rho, support)
    np.testing.assert_allclose(np.asarray(got), expected,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_invalid), masks["all"])

    # named sub-masks match the per-constraint invalid regions
    rc_sup = RealConstraint(threshold_low=0.0, threshold_high=None,
                            limit_imag=limit,
                            considered_projections=("support",))
    _, inv_sup = rc_sup(rho, support)
    np.testing.assert_array_equal(np.asarray(inv_sup), masks["support"])


def test_real_projection_threshold_band_matches_reference(ref):
    rng = np.random.default_rng(2)
    shape = (4, 8)
    rho = rng.normal(size=shape) + 1j * 0.1 * rng.normal(size=shape)
    support = np.ones(shape, dtype=bool)
    lo, hi = -0.2, 0.7

    proj = _ref_real_projection(ref, support, {
        "apply": ["value_threshold"],
        "value_threshold": {"threshold": [lo, hi]},
    })
    expected, masks = proj(rho.copy())

    from xframe_tpu.projects.fxs.projections import RealConstraint
    rc = RealConstraint(apply_support=False, threshold_low=lo,
                        threshold_high=hi, apply_limit_imag=False)
    got, got_invalid = rc(rho, support)
    np.testing.assert_allclose(np.asarray(got), expected,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_invalid), masks["all"])


# ------------------------------------------------- reciprocal: Procrustes W
def _fake_recip(ref, qs, pms, used_orders):
    rp = ref.fxsp.ReciprocalProjection.__new__(ref.fxsp.ReciprocalProjection)
    rp.dimensions = 3
    rp.projection_matrices = pms
    rp.radial_points = qs
    rp.used_orders = used_orders
    rp.use_SO_freedom = False
    return rp


@pytest.mark.parametrize("used", ["all", "even_subset"])
def test_approximate_unknowns_3d_matches_reference(ref, used):
    l_max = 6
    qs, pms, ils = _pm_problem(l_max=l_max)
    if used == "all":
        used_orders = {l: l for l in range(l_max + 1)}
    else:
        used_orders = {l: l for l in range(0, l_max + 1, 2)}

    rp = _fake_recip(ref, qs, pms, used_orders)
    fn = rp.generate_approximate_unknowns()
    expected = fn(ils)   # tuple aligned with used_orders, each (2l+1, 2l+1)

    from xframe_tpu.projects.fxs.projections import ReciprocalConstraint
    rc = ReciprocalConstraint.build(
        pms, qs, l_max, used_order_ids=list(used_orders.values()),
        odd_orders_to_0=False, use_averaged_intensity=False,
        schmidt_scaling=False, procrustes_method="svd")
    W = np.asarray(rc.approximate_unknowns(_ilm_dense(ils, len(qs), l_max)))

    for (l, _), exp in zip(used_orders.items(), expected):
        block = W[l, l_max - l: l_max + l + 1, l_max - l: l_max + l + 1]
        np.testing.assert_allclose(block, exp, rtol=2e-3, atol=2e-3)


def test_approximate_unknowns_newton_schulz_matches_reference(ref):
    """The matmul-only polar iteration lands on the same per-l unitaries as
    the reference's SVD (it is the same polar factor)."""
    l_max = 4
    qs, pms, ils = _pm_problem(l_max=l_max, seed=7)
    used_orders = {l: l for l in range(l_max + 1)}
    rp = _fake_recip(ref, qs, pms, used_orders)
    expected = rp.generate_approximate_unknowns()(ils)

    from xframe_tpu.projects.fxs.projections import ReciprocalConstraint
    rc = ReciprocalConstraint.build(
        pms, qs, l_max, odd_orders_to_0=False, use_averaged_intensity=False,
        schmidt_scaling=False, procrustes_method="newton_schulz",
        ns_iterations=40)
    W = np.asarray(rc.approximate_unknowns(_ilm_dense(ils, len(qs), l_max)))
    for l, exp in zip(used_orders, expected):
        block = W[l, l_max - l: l_max + l + 1, l_max - l: l_max + l + 1]
        np.testing.assert_allclose(block, exp, rtol=5e-3, atol=5e-3)


# ------------------------------------------------- reciprocal: projection
def _ref_mtip_projection(ref, qs, pms, used_orders, radial_mask,
                         n_particles):
    rp = _fake_recip(ref, qs, pms, used_orders)
    rp.opt = {"use_averaged_intensity": False}
    rp.radial_mask = radial_mask
    rp.number_of_particles = [n_particles]
    base = rp.generate_coeff_projection_base()
    return rp.generate_coeff_projection(base)


@pytest.mark.parametrize("n_particles,partial_mask", [
    (1.0, True), (4.0, False), (4.0, True)])
def test_mtip_projection_3d_matches_reference(ref, n_particles, partial_mask):
    """V_l·U_l replacement on used orders/unmasked q + the fixed l=0 data
    column with 1/√n_particles — including the reference's division of the
    ENTIRE l=0 row (masked-out q keep the iterate's coefficients but are
    still rescaled, fxs_Projections.py:866-870)."""
    l_max = 5
    qs, pms, ils = _pm_problem(l_max=l_max, seed=11)
    n_q = len(qs)
    used_orders = {l: l for l in range(0, l_max + 1)}
    rng = np.random.default_rng(4)
    if partial_mask:
        radial_mask = rng.random((l_max + 1, n_q)) > 0.3
    else:
        radial_mask = np.ones((l_max + 1, n_q), dtype=bool)

    # random unknowns — the projection step is independent of how W was found
    unknowns = []
    for l in range(l_max + 1):
        k = 2 * l + 1
        a = rng.normal(size=(k, k)) + 1j * rng.normal(size=(k, k))
        unknowns.append(np.linalg.qr(a)[0])

    proj = _ref_mtip_projection(ref, qs, pms, used_orders, radial_mask,
                                n_particles)
    expected = proj([il.copy() for il in ils], unknowns)

    from xframe_tpu.projects.fxs.projections import ReciprocalConstraint
    rc = ReciprocalConstraint.build(
        pms, qs, l_max, odd_orders_to_0=False, use_averaged_intensity=False,
        schmidt_scaling=False, radial_mask=radial_mask,
        n_particles=n_particles)
    import jax.numpy as jnp
    n_m = 2 * l_max + 1
    W = np.zeros((l_max + 1, n_m, n_m), dtype=complex)
    for l, u in enumerate(unknowns):
        W[l, l_max - l: l_max + l + 1, l_max - l: l_max + l + 1] = u
    got = np.asarray(rc.project_coefficients(
        jnp.asarray(_ilm_dense(ils, n_q, l_max)), jnp.asarray(W)))

    for l in range(l_max + 1):
        block = got[:, l_max - l: l_max + l + 1, l]
        np.testing.assert_allclose(block, expected[l], rtol=2e-4, atol=2e-4,
                                   err_msg=f"order {l}")


def test_mtip_projection_unused_orders_keep_iterate(ref):
    """Orders outside used_orders pass the iterate's coefficients through."""
    l_max = 4
    qs, pms, ils = _pm_problem(l_max=l_max, seed=13)
    used_orders = {l: l for l in (0, 2)}
    radial_mask = np.ones((l_max + 1, len(qs)), dtype=bool)
    rng = np.random.default_rng(5)
    unknowns = {}
    for l in range(l_max + 1):
        k = 2 * l + 1
        a = rng.normal(size=(k, k)) + 1j * rng.normal(size=(k, k))
        unknowns[l] = np.linalg.qr(a)[0]

    proj = _ref_mtip_projection(ref, qs, pms, used_orders, radial_mask, 1.0)
    expected = proj([il.copy() for il in ils],
                    [unknowns[l] for l in range(l_max + 1)])

    from xframe_tpu.projects.fxs.projections import ReciprocalConstraint
    rc = ReciprocalConstraint.build(
        pms, qs, l_max, used_order_ids=[0, 2], odd_orders_to_0=False,
        use_averaged_intensity=False, schmidt_scaling=False)
    import jax.numpy as jnp
    n_m = 2 * l_max + 1
    W = np.zeros((l_max + 1, n_m, n_m), dtype=complex)
    for l, u in unknowns.items():
        W[l, l_max - l: l_max + l + 1, l_max - l: l_max + l + 1] = u
    got = np.asarray(rc.project_coefficients(
        jnp.asarray(_ilm_dense(ils, len(qs), l_max)), jnp.asarray(W)))
    for l in range(l_max + 1):
        block = got[:, l_max - l: l_max + l + 1, l]
        np.testing.assert_allclose(block, expected[l], rtol=2e-4, atol=2e-4,
                                   err_msg=f"order {l}")


def test_modify_projection_matrices_matches_reference(ref):
    """odd-orders-to-0, averaged-intensity l=0 substitution (×2√π), and the
    global ×2 Schmidt factor (fxs_Projections.py:679-714) against the V_pad
    assembly in ReciprocalConstraint.build."""
    l_max = 5
    qs, pms, _ = _pm_problem(l_max=l_max, seed=17)
    avg = np.abs(np.random.default_rng(6).normal(size=len(qs)))

    rp = _fake_recip(ref, qs, [p.copy() for p in pms],
                     {l: l for l in range(l_max + 1)})
    # the reference holds the averaged intensity as a SampledFunction whose
    # samples live in .data (fxs_Projections.py:684)
    rp.average_intensity = types.SimpleNamespace(data=avg)
    opt = ref.DictNamespace.dict_to_dictnamespace({
        "odd_orders_to_0": True, "use_averaged_intensity": True})
    expected = rp.modify_projection_matrices(opt)

    from xframe_tpu.projects.fxs.projections import ReciprocalConstraint
    rc = ReciprocalConstraint.build(
        pms, qs, l_max, odd_orders_to_0=True, use_averaged_intensity=True,
        average_intensity=avg, schmidt_scaling=True)
    V = np.asarray(rc.V_pad)
    for l in range(l_max + 1):
        block = V[l, :, l_max - l: l_max + l + 1]
        exp = expected[l]
        if l == 0:
            exp = exp.reshape(len(qs), 1)
        np.testing.assert_allclose(block, exp, rtol=2e-4, atol=1e-5,
                                   err_msg=f"order {l}")


# ------------------------------------------------------------ error metrics
class _FakeGrid:
    """Duck-typed NestedArray: [:] yields the coordinate array and n_shape
    the trailing coordinate dims (gridLibrary.py:540-541)."""

    def __init__(self, arr):
        self._a = np.asarray(arr)
        self.n_shape = (self._a.shape[-1],)

    def __getitem__(self, k):
        return self._a[k]


def test_l2_rel_diff_errors_match_reference(ref):
    """In-loop real/reciprocal relative-L2 metrics against the reference's
    generate_l2_rel_diff_error_routine (fxs_IO_methods.py:97-128): the real
    metric masked inside the initial support, the reciprocal metric
    integrated with the reciprocal-grid weights. (The reference's cache-aware
    default path spells _type='reziprocal' at :304 and silently integrates
    over the REAL grid — harmless because reciprocity-paired radial nodes
    make the two weight sets proportional, which this test also verifies.)"""
    import jax.numpy as jnp
    from xframe_tpu.projects.fxs.demo import make_demo_problem

    p = make_demo_problem(8, 4)
    mtip = p.mtip
    rg, qg = mtip.ft.grid_pair
    gp = types.SimpleNamespace(realGrid=_FakeGrid(rg),
                               reciprocalGrid=_FakeGrid(qg))
    rng = np.random.default_rng(21)
    shape = np.asarray(rg).shape[:-1]
    psi = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    psi_p = psi + 0.1 * (rng.normal(size=shape)
                         + 1j * rng.normal(size=shape))

    # mask must be a proper all-True ARRAY: the reference's default
    # mask=True (a Python bool) makes `square_diff[~mask] = 0` index row
    # ~True == -2, silently ZEROING radial shell q[-2] from both the
    # numerator and denominator of every unmasked metric — asserted below
    full = np.ones(shape, dtype=bool)
    rec_fn = ref.fio.generate_l2_rel_diff_error_routine(
        gp, _type="reciprocal", mask=full)
    got_rec = float(mtip._reciprocal_error(
        jnp.asarray(psi, jnp.complex64), jnp.asarray(psi_p, jnp.complex64)))
    np.testing.assert_allclose(got_rec, rec_fn(psi.copy(), psi_p.copy()),
                               rtol=2e-4)

    # the 'reziprocal' typo path = real-grid integrator: same ratio
    rec_fn_real_grid = ref.fio.generate_l2_rel_diff_error_routine(
        gp, _type="reziprocal", mask=full)
    np.testing.assert_allclose(rec_fn_real_grid(psi.copy(), psi_p.copy()),
                               rec_fn(psi.copy(), psi_p.copy()), rtol=1e-9)

    # documented reference bug: the DEFAULT mask=True path equals the
    # correct ratio computed with shell q[-2] removed
    rec_fn_default = ref.fio.generate_l2_rel_diff_error_routine(
        gp, _type="reciprocal")
    hole = full.copy()
    hole[-2] = False
    rec_fn_hole = ref.fio.generate_l2_rel_diff_error_routine(
        gp, _type="reciprocal", mask=hole)
    np.testing.assert_allclose(rec_fn_default(psi.copy(), psi_p.copy()),
                               rec_fn_hole(psi.copy(), psi_p.copy()),
                               rtol=1e-9)

    support = np.asarray(mtip.initial_support).astype(bool)
    real_fn = ref.fio.generate_l2_rel_diff_error_routine(
        gp, _type="real", mask=support)
    rho_p = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    rho_proj = np.where(support, rho_p, 0.0)
    got_real = float(mtip._real_error(
        jnp.asarray(rho_p, jnp.complex64), jnp.asarray(rho_proj,
                                                       jnp.complex64)))
    np.testing.assert_allclose(
        got_real, real_fn(rho_p.copy(), (rho_proj.copy(), {})), rtol=2e-4)


# ------------------------------------------------------ amplitude projection
def test_project_to_modified_intensity_matches_reference(ref):
    rng = np.random.default_rng(8)
    shape = (6, 4, 8)
    psi = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    square = np.abs(psi) ** 2
    new_i = rng.normal(size=shape) + 0j   # ~half negative → zeroed there

    rp = ref.fxsp.ReciprocalProjection.__new__(
        ref.fxsp.ReciprocalProjection)
    rp.grid = np.zeros(shape + (3,))
    fn = rp._generate_project_to_modified_intensity_default()
    expected = fn(psi.copy(), square.copy(), new_i.copy()).copy()

    from xframe_tpu.projects.fxs.projections import (
        project_to_modified_intensity)
    got = np.asarray(project_to_modified_intensity(psi, square, new_i))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------ centering operators
def test_center_of_mass_and_shift_operator_match_reference(ref):
    """calc_center (reference misk.py:295-312) and the reciprocal shift
    operator (generate_shift_by_operator, fxs_Projections.py:1419-1444,
    'negative_shift' = opposite_direction=True as used by the centering
    sketches) against the Aligner's center-of-mass + phase ramp.

    Documented deviation: the reference integrates the SIGNED real part
    (denominator ∫ρ.real can pass through zero mid-phasing); the rebuild
    weights by |ρ| — identical for the nonnegative densities centering is
    applied to, which is what this test uses."""
    import importlib
    import jax.numpy as jnp
    sys.path.insert(0, REF)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", SyntaxWarning)
            rmisk = importlib.import_module(
                "xframe.projects.fxs.projectLibrary.misk")
    finally:
        sys.path.remove(REF)

    from xframe_tpu.projects.fxs.demo import make_demo_problem
    from xframe_tpu.projects.fxs.alignment import Aligner
    p = make_demo_problem(10, 5)
    rg, qg = p.mtip.ft.grid_pair

    # nonnegative off-center blob (the post-projection centering input)
    from xframe_tpu.library.shapes import ball_density
    rho = ball_density(np.asarray(rg), 0.3 * float(p.mtip.ft.rs.max()),
                       center=np.array([0.25 * float(p.mtip.ft.rs.max()),
                                        1.2, 0.7]))
    ref_center_sph = rmisk.generate_calc_center(rg)(rho.astype(complex))

    from xframe_tpu.ops.integrate import SphericalIntegrator
    integ = SphericalIntegrator(np.asarray(p.mtip.ft.rs),
                                p.mtip.ft.sht.n_theta, p.mtip.ft.sht.n_phi)
    aligner = Aligner(p.mtip.ft, np.asarray(integ._w))
    _, com = aligner.center(jnp.asarray(rho, jnp.complex64))
    com = np.asarray(com, dtype=float)
    from xframe_tpu.library.shapes import spherical_to_cartesian
    np.testing.assert_allclose(com, spherical_to_cartesian(ref_center_sph),
                               rtol=2e-4, atol=1e-5)

    # phase plane: our exp(+i q·com) == the reference's negative_shift
    shift = ref.fxsp.generate_shift_by_operator(qg, opposite_direction=True)
    ones = np.ones(np.asarray(qg).shape[:-1], dtype=complex)
    expected_phase = shift(ones.copy(), ref_center_sph)
    q_cart = spherical_to_cartesian(np.asarray(qg))
    got_phase = np.exp(1j * np.einsum("...c,c->...", q_cart, com))
    np.testing.assert_allclose(got_phase, expected_phase, rtol=1e-4,
                               atol=1e-5)


# ------------------------------------------- average: V_l over input files
def test_averaged_projection_matrices_match_reference(ref, tmp_path):
    """Multi-file V̄_l = mean_f V_l^{(f)} / s_f² (reference average.py:90-100
    get_averaged_projection_matrices) against the average worker's
    per-file rescaled mean."""
    import importlib
    cwd = os.getcwd()
    sys.path.insert(0, REF)
    # average.py's import chain reaches shtns_plugin / soft_plugin, which
    # import the (uninstalled) native shtns / numba pysofft at module top —
    # attribute-fabricating stubs suffice, nothing calls into them during
    # import
    class _AnyModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return None

    if "pysofft" not in sys.modules:
        pk = _AnyModule("pysofft")
        pk.__path__ = []
        sys.modules["pysofft"] = pk
        for sub in ("make_wiegner", "wignerTransform", "wignerWeights",
                    "soft", "rotate"):
            m = _AnyModule(f"pysofft.{sub}")
            sys.modules[f"pysofft.{sub}"] = m
            setattr(pk, sub, m)
    if "shtns" not in sys.modules:
        sys.modules["shtns"] = types.ModuleType("shtns")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", SyntaxWarning)
            ravg = importlib.import_module("xframe.projects.fxs.average")
    finally:
        sys.path.remove(REF)
        os.chdir(cwd)   # reference average.py os.chdir()s at import (!)

    rng = np.random.default_rng(23)
    n_q, l_max, n_files = 7, 3, 3
    pms_per_file = [
        [rng.normal(size=(n_q, 2 * l + 1))
         + 1j * rng.normal(size=(n_q, 2 * l + 1))
         for l in range(l_max + 1)]
        for _ in range(n_files)]
    factors = rng.random(n_files) + 0.5

    expected = ravg.ProjectWorker.get_averaged_projection_matrices(
        None, [[m.copy() for m in f] for f in pms_per_file], factors)

    from xframe_tpu.projects.fxs.average import ProjectWorker as OurWorker
    all_meta = [{"file_index": f} for f in range(n_files)]
    got = OurWorker._averaged_projection_matrices(
        pms_per_file, used_meta=all_meta,
        scaling_factors=np.asarray(factors), all_meta=all_meta)
    assert len(got) == len(expected)
    for l, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_allclose(g, e, rtol=1e-12, err_msg=f"order {l}")


# ------------------------------------------------- fixed-volume shrink-wrap
def test_fixed_volume_shrink_wrap_agrees_with_reference(ref):
    """The reference finds the fixed-volume threshold by golden-section
    search over repeated mask integrations, with an inf-metric rejection of
    thresholds that change the volume by more than d_vol_thresh = 0.2 per
    event (fxs_Projections.py:270-283) — so a 0.4-target first event lands on
    0.8 × the initial volume, NOT the target. xframe_tpu realizes the same
    semantics as clip(target, (1±0.2)·current_volume) + exact weighted
    quantile. Assert both land on the same support per event: volumes within
    2%, overlap (IoU) > 0.95, over two consecutive SW events."""
    import jax.numpy as jnp
    from xframe_tpu.library.shapes import spherical_grid
    from xframe_tpu.ops.integrate import SphericalIntegrator
    from xframe_tpu.projects.fxs.projections import ShrinkWrap

    rng = np.random.default_rng(9)
    n_r, n_t, n_p = 24, 12, 24
    rs = np.linspace(0.05, 2.0, n_r)
    thetas = np.arccos(-np.polynomial.legendre.leggauss(n_t)[0])
    phis = 2 * np.pi * np.arange(n_p) / n_p
    real_grid = spherical_grid(rs, thetas, phis)
    qs = np.linspace(0.1, 3.0, n_r)
    recip_grid = spherical_grid(qs, thetas, phis)
    initial_support = real_grid[..., 0] < 1.6

    # smooth blob + noise as the "blurred |rho|" convolution input
    conv = (np.exp(-(real_grid[..., 0] / 0.8) ** 2)
            * (1.0 + 0.1 * rng.normal(size=real_grid.shape[:-1]))).astype(
        np.float64) + 0j

    frac = 0.4
    sw_ref = ref.fxsp.ShrinkWrapParts(
        real_grid, recip_grid, initial_support,
        options={"mode": "fixed_volume", "fixed_volume": {"volume": frac},
                 "thresholds": [0.1]})
    # The reference calls minimize_scalar(..., bounds=(0,1), method='golden')
    # (fxs_Projections.py:284) — scipy >= 1.11 REJECTS bounds with the golden
    # method, so the reference's fixed_volume mode crashes outright on a
    # current scipy. Emulate the old-scipy behavior it was written against
    # (bounds silently ignored for 'golden') to recover its search semantics.
    from scipy.optimize import minimize_scalar as _ms
    import unittest.mock as mock

    integ = SphericalIntegrator(rs, n_t, n_p, real_dtype=jnp.float64)
    w_full = np.broadcast_to(np.asarray(integ._w),
                             real_grid.shape[:-1]).copy()
    ours = ShrinkWrap.build(qs, grid_rank=3, mode="fixed_volume",
                            volume_fraction=frac, integration_weights=w_full,
                            initial_support=initial_support)
    vol0 = float((w_full * initial_support).sum())

    # The reference calls minimize_scalar(..., bounds=(0,1), method='golden')
    # (fxs_Projections.py:284) — scipy >= 1.11 REJECTS bounds with the golden
    # method, so the reference's fixed_volume mode crashes outright on a
    # current scipy. Emulate the old-scipy behavior it was written against
    # (bounds silently ignored for 'golden') to recover its search semantics.
    # First SW event, rate limit binding (target 0.4 < 0.8 of current):
    # both implementations must land on 0.8·vol0. (Beyond the first event
    # the reference's search degrades — golden-section cannot bracket across
    # the inf-metric plateau once old_volume has moved, and returns a
    # threshold keeping the FULL support; that is a search pathology, not a
    # semantic, so parity is asserted for the well-posed event only. Our
    # geometric convergence 0.8 → 0.64 → … → target over repeated events —
    # the documented intent of d_vol_thresh — is asserted in
    # tests/test_phasing.py::test_fixed_volume_shrink_wrap.)
    with mock.patch.object(
            ref.fxsp, "minimize_scalar",
            lambda f, bounds=None, method=None: _ms(f, method="golden")):
        mask_ref = sw_ref.get_new_mask(conv.copy())
    mask_ours = np.asarray(ours.new_support_fixed_volume(
        jnp.asarray(conv), current_support=jnp.asarray(initial_support)))
    vol_ref = float((w_full * mask_ref).sum())
    vol_ours = float((w_full * mask_ours).sum())
    assert abs(vol_ours - 0.8 * vol0) <= 0.02 * vol0, vol_ours / vol0
    assert abs(vol_ref - 0.8 * vol0) <= 0.02 * vol0, vol_ref / vol0
    iou = (mask_ref & mask_ours).sum() / max((mask_ref | mask_ours).sum(), 1)
    assert iou > 0.95, iou

    # without the rate limit the exact quantile hits the target in one event
    ours_nolim = ShrinkWrap.build(
        qs, grid_rank=3, mode="fixed_volume", volume_fraction=frac,
        integration_weights=w_full, initial_support=initial_support,
        max_volume_change=None)
    mask_nl = np.asarray(ours_nolim.new_support_fixed_volume(
        jnp.asarray(conv), current_support=jnp.asarray(initial_support)))
    assert abs(float((w_full * mask_nl).sum()) - frac * vol0) <= 0.02 * vol0
