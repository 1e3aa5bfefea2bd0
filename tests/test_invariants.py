"""Invariant-engine consistency tests (the numerical spec the reference lacks):

density → I_lm → B_l  →  CC  →  back-substitution/lstsq  →  B_l  (must agree)
B_l → V_l (eigen-factorization) → V_l V_l† = PSD(B_l)
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xframe_tpu.ops.fourier import SphericalFourierTransform
from xframe_tpu.library.shapes import spherical_grid, ball_density
from xframe_tpu.projects.fxs import invariants as itools


@pytest.fixture(scope="module", autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def bl_setup():
    N, L = 32, 16
    wavelength = 1.23984
    q_max = 0.4
    ft = SphericalFourierTransform(N, L, q_max=q_max, mode="midpoint",
                                   reciprocity_coefficient=2.0,
                                   real_dtype=jnp.float64)
    grid = spherical_grid(ft.rs, ft.sht.theta, ft.sht.phi)
    # two off-center balls -> nontrivial B_l with even and odd structure
    rho = ball_density(grid, ft.r_max / 6, center=(ft.r_max / 3, 1.0, 0.5)) \
        + ball_density(grid, ft.r_max / 8, center=(ft.r_max / 4, 2.0, 3.5))
    psi = ft.forward(jnp.asarray(rho, dtype=jnp.complex128))
    intensity = np.asarray(psi * psi.conj()).real
    coeff = np.asarray(ft.sht.forward(jnp.asarray(intensity, dtype=jnp.complex128)))
    bl = itools.harmonic_coeff_to_deg2_invariants_3d(coeff)
    return dict(ft=ft, bl=bl, wavelength=wavelength, L=L, N=N)


class TestBlCC:
    def test_bl_hermitian_psd_diag_real(self, bl_setup):
        bl = bl_setup["bl"]
        assert np.abs(bl - np.conj(np.swapaxes(bl, 1, 2))).max() < 1e-8 * np.abs(bl).max()
        # B_l should be PSD up to numerical noise
        lam = np.linalg.eigvalsh(bl[2])
        assert lam.min() > -1e-6 * np.abs(lam).max()

    def test_cc_roundtrip_back_substitution(self, bl_setup):
        bl, ft, wl, L = (bl_setup["bl"], bl_setup["ft"], bl_setup["wavelength"],
                         bl_setup["L"])
        cc = itools.deg2_invariant_to_cc_3d(bl, wl, ft.qs, n_phi=128)
        bl2 = itools.cc_to_deg2_invariant_3d(cc, wl, ft.qs, L,
                                             assume_zero_odd_orders=False)
        scale = np.abs(bl).max()
        assert np.abs(bl2 - bl).max() / scale < 1e-8

    def test_cc_roundtrip_even_orders(self, bl_setup):
        bl, ft, wl, L = (bl_setup["bl"], bl_setup["ft"], bl_setup["wavelength"],
                         bl_setup["L"])
        bl_even = bl.copy()
        bl_even[1::2] = 0
        cc = itools.deg2_invariant_to_cc_3d(bl_even, wl, ft.qs, n_phi=128)
        bl2 = itools.cc_to_deg2_invariant_3d(cc, wl, ft.qs, L,
                                             assume_zero_odd_orders=True)
        assert np.abs(bl2 - bl_even).max() / np.abs(bl_even).max() < 1e-8

    def test_lstsq_agrees_with_back_substitution(self, bl_setup):
        bl, ft, wl = bl_setup["bl"], bl_setup["ft"], bl_setup["wavelength"]
        L = 8  # keep lstsq cheap
        bl_small = bl[: L + 1]
        cc = itools.deg2_invariant_to_cc_3d(bl_small, wl, ft.qs, n_phi=64)
        b_bs = itools.cc_to_deg2_invariant_3d(cc, wl, ft.qs, L,
                                              assume_zero_odd_orders=False,
                                              mode="back_substitution")
        b_ls = itools.cc_to_deg2_invariant_3d(cc, wl, ft.qs, L,
                                              assume_zero_odd_orders=False,
                                              mode="lstsq")
        scale = np.abs(bl_small).max()
        assert np.abs(b_bs - b_ls).max() / scale < 1e-6


    def test_qqsym_and_psd_variants_agree_on_clean_data(self, bl_setup):
        """On noiseless symmetric PSD data the qqsym and psd back-substitution
        variants must reproduce the plain solve (they only differ on noisy
        data, where they regularize); on asymmetric noise qqsym must return
        a hermitian result."""
        bl, ft, wl = bl_setup["bl"], bl_setup["ft"], bl_setup["wavelength"]
        L = 8
        bl_s = bl[: L + 1].copy()
        bl_s[1::2] = 0
        # make strictly PSD (clip tiny negative numerical eigenvalues)
        bl_s = itools.nearest_positive_semidefinite_matrix(bl_s)
        cc = itools.deg2_invariant_to_cc_3d(bl_s, wl, ft.qs, n_phi=64)
        kw = dict(assume_zero_odd_orders=True)
        b_ref = itools.cc_to_deg2_invariant_3d(cc, wl, ft.qs, L,
                                               mode="back_substitution", **kw)
        scale = np.abs(bl_s).max()
        for mode in ["back_substitution_qqsym", "back_substitution_psd",
                     "back_substitution_memory_hungry"]:
            b = itools.cc_to_deg2_invariant_3d(cc, wl, ft.qs, L, mode=mode,
                                               **kw)
            assert np.abs(b - b_ref).max() / scale < 1e-6, mode

        # asymmetric noise: qqsym output is hermitian in (q1,q2), psd output
        # has no negative eigenvalues
        rng = np.random.default_rng(0)
        cc_n = cc + 0.01 * np.abs(cc).max() * rng.normal(size=cc.shape)
        b_q = itools.cc_to_deg2_invariant_3d(cc_n, wl, ft.qs, L,
                                             mode="back_substitution_qqsym",
                                             **kw)
        herm = np.abs(b_q - np.conj(np.swapaxes(b_q, 1, 2))).max()
        assert herm < 1e-10 * np.abs(b_q).max()
        b_p = itools.cc_to_deg2_invariant_3d(cc_n, wl, ft.qs, L,
                                             mode="back_substitution_psd",
                                             **kw)
        for l in [0, 2, 4]:
            lam = np.linalg.eigvalsh((b_p[l] + b_p[l].conj().T) / 2)
            assert lam.min() > -1e-8 * max(lam.max(), 1e-30), l

    def test_legendre_dlt_agrees_on_flat_ewald(self, bl_setup):
        """'legendre' mode assumes flat Ewald circles (θ=π/2); at tiny
        wavelength the Ewald curvature vanishes, so it must agree with
        back_substitution (reference fxs_invariant_tools.py:764-810)."""
        bl, ft = bl_setup["bl"], bl_setup["ft"]
        L = 12
        wl_flat = 1e-4  # arcsin(qλ/4π) ≈ 0 → θ ≈ π/2 on both circles
        bl_even = bl[: L + 1].copy()
        bl_even[1::2] = 0
        cc = itools.deg2_invariant_to_cc_3d(bl_even, wl_flat, ft.qs, n_phi=128)
        b_bs = itools.cc_to_deg2_invariant_3d(cc, wl_flat, ft.qs, L,
                                              assume_zero_odd_orders=True,
                                              mode="back_substitution")
        b_dlt = itools.cc_to_deg2_invariant_3d(cc, wl_flat, ft.qs, L,
                                               assume_zero_odd_orders=True,
                                               mode="legendre")
        scale = np.abs(bl_even).max()
        assert np.abs(b_dlt - b_bs).max() / scale < 1e-6
        assert np.abs(b_dlt - bl_even).max() / scale < 1e-6

    def test_legendre_dlt_exact_polynomial(self):
        """The two-matmul DLT is exact: a CC synthesized directly as
        Σ_l b_l P_l(cosΔ)/(4π) must come back to machine precision."""
        rng = np.random.default_rng(0)
        L, n_phi, n_q = 10, 64, 3
        b = np.zeros((L + 1, n_q, n_q))
        b[::2] = rng.normal(size=(L // 2 + 1, n_q, n_q))
        b = (b + np.swapaxes(b, 1, 2)) / 2
        phis = 2 * np.pi * np.arange(n_phi) / n_phi
        from xframe_tpu.library.legendre import legendre_poly_table
        P = legendre_poly_table(L, np.cos(phis))            # (n_phi, L+1)
        cc = np.einsum("lab,pl->abp", b, P) / (4 * np.pi)
        b2 = itools.cc_to_deg2_invariant_3d(cc, 1.0, np.linspace(0.1, 1, n_q),
                                            L, assume_zero_odd_orders=True,
                                            mode="legendre")
        assert np.abs(b2 - b).max() < 1e-10 * np.abs(b).max()


class TestProjectionMatrices:
    def test_factorization_recovers_psd_bl(self, bl_setup):
        bl = bl_setup["bl"]
        proj, eigs = itools.deg2_invariant_to_projection_matrices(bl)
        # Friedel's law: intensity of a real density is centrosymmetric → odd
        # B_l vanish; factorization checks only make sense on even orders.
        assert np.abs(bl[1::2]).max() < 1e-10 * np.abs(bl).max()
        for l in [0, 2, 6]:
            v = proj[l]
            assert v.shape == (bl.shape[1], min(bl.shape[1], 2 * l + 1))
            bl_psd = itools.nearest_positive_semidefinite_matrix(bl[l])
            assert np.abs(v @ v.conj().T - bl_psd).max() < 1e-6 * np.abs(bl[l]).max()

    def test_rank_cap(self, bl_setup):
        bl = bl_setup["bl"]
        proj, _ = itools.deg2_invariant_to_projection_matrices(bl)
        ranks = [np.linalg.matrix_rank(v, tol=1e-10 * np.abs(v).max())
                 if np.abs(v).max() > 0 else 0 for v in proj]
        for l, r in enumerate(ranks):
            assert r <= 2 * l + 1


class Test2D:
    def test_cc_roundtrip_2d(self):
        rng = np.random.default_rng(5)
        n_q, M = 16, 8
        Im = rng.normal(size=(n_q, M + 1)) + 1j * rng.normal(size=(n_q, M + 1))
        bm = itools.harmonic_coeff_to_deg2_invariants_2d(Im)
        cc = itools.deg2_invariant_to_cc_2d(bm, n_phi=64)
        # rfft-based roundtrip only sees the Hermitian part; compare via forward
        bm2 = itools.cc_to_deg2_invariant_2d(cc, M)
        # CC built from complex bm is complex; real-fft path recovers bm for
        # hermitian-symmetric CC. Use the real part consistency instead:
        cc2 = itools.deg2_invariant_to_cc_2d(bm2, n_phi=64)
        assert np.abs(cc2 - cc).max() < 1e-8 * np.abs(cc).max()


class TestCCMasks:
    def test_mask_shapes_and_coverage(self):
        import xframe_tpu.projects.fxs.invariants as itools
        qs = np.linspace(0.05, 0.5, 12)
        phis = 2 * np.pi * np.arange(32) / 32
        none = itools.cc_mask(qs, phis, "none")
        assert none.all() and none.shape == (12, 12, 32)
        arc = itools.cc_mask(qs, phis, "pixel_arc", xray_wavelength=1.23984,
                             pixel_size=100.0)
        assert arc.shape == (12, 12, 32)
        assert not arc.all()           # masks the Δ≈0 self-correlation band
        assert not arc[5, 5, 0]        # same point always masked
        flat = itools.cc_mask(qs, phis, "pixel_flat",
                              xray_wavelength=1.23984, pixel_size=100.0)
        assert not flat[5, 5, 0] and flat.any()
        don = itools.cc_mask(qs, phis, "donatelli", xray_wavelength=1.23984,
                             threshold=0.01)
        assert don.shape == (12, 12, 32) and don.any()

    def test_interpolate_masked_cc(self):
        import xframe_tpu.projects.fxs.invariants as itools
        n_phi = 16
        phis = 2 * np.pi * np.arange(n_phi) / n_phi
        cc = np.cos(phis)[None, None, :] * np.ones((3, 3, 1))
        mask = np.ones((3, 3, n_phi), dtype=bool)
        mask[1, 2, 3:6] = False
        mask[0, 0, 0] = False          # wrap-around case
        filled = itools.interpolate_masked_cc(np.where(mask, cc, 99.0), mask)
        assert np.abs(filled[1, 2] - np.cos(phis)).max() < 0.1
        assert np.abs(filled[0, 0, 0] - 1.0) < 0.1

    def test_pi_periodicity(self):
        import xframe_tpu.projects.fxs.invariants as itools
        n_phi = 8
        phis = 2 * np.pi * np.arange(n_phi) / n_phi
        even = np.cos(2 * phis)   # π-periodic
        odd = np.cos(phis)        # π-antiperiodic
        cc = (even + odd)[None, None, :]
        out = itools.enforce_pi_periodicity(cc)
        assert np.allclose(out[0, 0], even, atol=1e-12)

    def test_pi_periodicity_masked(self):
        """Masked variant: where only one of CC(Δ), CC(Δ+π) is valid the
        result is a copy of the valid sample (the reference's semantics);
        where both are valid it is their mean; the mask is or'd with its
        π-roll."""
        import xframe_tpu.projects.fxs.invariants as itools
        rng = np.random.default_rng(2)
        n_phi = 12
        cc = rng.normal(size=(2, 2, n_phi))
        mask = np.ones(cc.shape, dtype=bool)
        mask[..., : n_phi // 2] = False      # first half invalid everywhere
        out, out_mask = itools.enforce_pi_periodicity(cc, mask)
        good = cc[..., n_phi // 2:]
        assert np.allclose(out[..., n_phi // 2:], good)       # copy, no 1/2
        assert np.allclose(out[..., : n_phi // 2], good)      # filled from π
        assert out_mask.all()
        # both valid -> mean; disjoint garbage never leaks
        full, m2 = itools.enforce_pi_periodicity(cc, np.ones_like(mask))
        assert np.allclose(
            full, 0.5 * (cc + np.roll(cc, n_phi // 2, axis=-1)))
        assert m2.all()


class TestVectorizedHotSpots:
    """The vectorized extraction utilities must agree with serial
    per-(q1,q2) loop semantics (what the reference computes per fork
    worker) — VERDICT r2 item 6."""

    def test_interpolate_masked_cc_matches_loop(self):
        rng = np.random.default_rng(7)
        n_q, n_phi = 24, 40
        cc = rng.normal(size=(n_q, n_q, n_phi))
        mask = rng.random((n_q, n_q, n_phi)) > 0.3
        mask[3, 4] = False             # a row with no good samples
        vec = itools.interpolate_masked_cc(cc, mask)

        # serial reference semantics (np.interp on 3x periodic extension)
        loop = np.array(cc, copy=True)
        x = np.arange(n_phi)
        for i, j in np.argwhere(~mask.all(axis=-1)):
            good = mask[i, j]
            if not good.any():
                loop[i, j] = 0.0
                continue
            xg = x[good]
            xp = np.concatenate([xg - n_phi, xg, xg + n_phi])
            fp = np.tile(cc[i, j, good], 3)
            loop[i, j, ~good] = np.interp(x[~good], xp, fp)
        assert np.allclose(vec, loop, atol=1e-12)

    def test_interpolate_masked_cc_chunked(self):
        rng = np.random.default_rng(3)
        cc = rng.normal(size=(8, 8, 16))
        mask = rng.random((8, 8, 16)) > 0.4
        a = itools.interpolate_masked_cc(cc, mask)
        b = itools.interpolate_masked_cc(cc, mask, row_chunk=5)
        assert np.array_equal(a, b)

    def test_lstsq_normal_equations_match_serial_lstsq(self):
        rng = np.random.default_rng(11)
        n_q, n_phi, L = 10, 48, 8
        wavelength = 1.23984
        qs = np.linspace(0.05, 0.4, n_q)
        cc = rng.normal(size=(n_q, n_q, n_phi))
        vec = itools._cc_to_bl_lstsq(cc, wavelength, qs, L, True)
        chunked = itools._cc_to_bl_lstsq(cc, wavelength, qs, L, True,
                                         row_chunk=3)
        # serial per-pair np.linalg.lstsq (the old implementation)
        from xframe_tpu.library.legendre import legendre_poly_table
        from xframe_tpu.library.physics import ewald_sphere_theta_pi
        thetas = ewald_sphere_theta_pi(wavelength, qs)
        phis = 2 * np.pi * np.arange(n_phi) / n_phi
        orders = np.arange(0, L + 1, 2)
        ct, st = np.cos(thetas), np.sin(thetas)
        arg = (ct[:, None, None] * ct[None, :, None]
               + st[:, None, None] * st[None, :, None]
               * np.cos(phis)[None, None, :])
        F = legendre_poly_table(L, arg)[..., orders] / (4 * np.pi)
        ref = np.zeros((L + 1, n_q, n_q), dtype=complex)
        for i in range(n_q):
            for j in range(n_q):
                sol = np.linalg.lstsq(F[i, j], cc[i, j], rcond=None)[0]
                ref[orders, i, j] = sol
        scale = np.abs(ref).max()
        assert np.abs(vec - ref).max() < 1e-8 * scale
        assert np.abs(chunked - ref).max() < 1e-8 * scale

    def test_lstsq_vectorized_is_fast(self):
        """n_q=64 grid in well under a minute (the serial loop would make
        4096 lstsq calls); generous bound so CI noise can't flake it."""
        import time
        rng = np.random.default_rng(5)
        n_q, n_phi, L = 64, 64, 16
        qs = np.linspace(0.05, 0.4, n_q)
        cc = rng.normal(size=(n_q, n_q, n_phi))
        t0 = time.perf_counter()
        itools._cc_to_bl_lstsq(cc, 1.23984, qs, L, True)
        assert time.perf_counter() - t0 < 30.0
