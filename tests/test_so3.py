"""Wigner-d / SO(3) rotation & correlation tests."""
import numpy as np
import jax.numpy as jnp
from scipy.special import eval_legendre

from xframe_tpu.ops.so3 import (
    wigner_d_blocks, wigner_d_padded, wigner_D_single, rotate_coeff,
    SO3Correlator,
)
from xframe_tpu.ops.sht import SphericalHarmonicTransform


def test_wigner_d_analytic():
    betas = np.linspace(0.1, 3.0, 7)
    blocks = wigner_d_blocks(4, betas)
    # d^0 = 1
    assert np.allclose(blocks[0], 1.0)
    # d^1_{00} = cos β  (center of the 3x3 block)
    assert np.allclose(blocks[1][:, 1, 1], np.cos(betas), atol=1e-12)
    # d^l_{00} = P_l(cos β)
    for l in [2, 3, 4]:
        assert np.allclose(blocks[l][:, l, l], eval_legendre(l, np.cos(betas)),
                           atol=1e-12)
    # orthogonality: d dᵀ = I
    for l in [1, 2, 3, 4]:
        for b in range(len(betas)):
            d = blocks[l][b]
            assert np.allclose(d @ d.T, np.eye(2 * l + 1), atol=1e-12)


def test_rotation_roundtrip_and_unitarity():
    L = 6
    rng = np.random.default_rng(0)
    coeff = np.zeros((3, 2 * L + 1, L + 1), dtype=complex)
    for l in range(L + 1):
        s = slice(L - l, L + l + 1)
        coeff[:, s, l] = rng.normal(size=(3, 2 * l + 1)) \
            + 1j * rng.normal(size=(3, 2 * l + 1))
    a, b, g = 0.7, 1.1, -0.4
    D = wigner_D_single(L, a, b, g)
    rot = np.asarray(rotate_coeff(jnp.asarray(coeff), D))
    # norm preserved per l
    for l in range(L + 1):
        assert np.allclose(np.linalg.norm(rot[..., l]),
                           np.linalg.norm(coeff[..., l]), rtol=1e-5)
    # inverse rotation restores
    Dinv = wigner_D_single(L, -g, -b, -a)
    back = np.asarray(rotate_coeff(jnp.asarray(rot), Dinv))
    assert np.allclose(back, coeff, atol=1e-5)


def test_rotation_matches_grid_rotation():
    """Rotating coefficients must equal evaluating the rotated function:
    for f(x) = Y_lm-band-limited, (Λ(R)f)(x) = f(R⁻¹x)."""
    L = 8
    sht = SphericalHarmonicTransform(L)
    rng = np.random.default_rng(1)
    coeff = np.zeros((2 * L + 1, L + 1), dtype=complex)
    for l in range(L + 1):
        s = slice(L - l, L + l + 1)
        coeff[s, l] = rng.normal(size=2 * l + 1) + 1j * rng.normal(size=2 * l + 1)
    f = np.asarray(sht.inverse(jnp.asarray(coeff)))

    a, b, g = 0.9, 0.6, 1.8
    D = wigner_D_single(L, a, b, g)
    f_rot = np.asarray(sht.inverse(rotate_coeff(jnp.asarray(coeff), D)))

    # rotate grid points by R⁻¹ (zyz: R = Rz(a) Ry(b) Rz(g))
    def Rz(t):
        return np.array([[np.cos(t), -np.sin(t), 0],
                         [np.sin(t), np.cos(t), 0], [0, 0, 1]])

    def Ry(t):
        return np.array([[np.cos(t), 0, np.sin(t)], [0, 1, 0],
                         [-np.sin(t), 0, np.cos(t)]])

    R = Rz(a) @ Ry(b) @ Rz(g)
    T, P = np.meshgrid(sht.theta, sht.phi, indexing="ij")
    xyz = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                    np.cos(T)], axis=-1)
    xyz_inv = xyz @ R  # row vectors: (R⁻¹ x)ᵀ = xᵀ (R⁻¹)ᵀ = xᵀ R
    theta_i = np.arccos(np.clip(xyz_inv[..., 2], -1, 1))
    phi_i = np.mod(np.arctan2(xyz_inv[..., 1], xyz_inv[..., 0]), 2 * np.pi)
    # evaluate original band-limited f at rotated points via SHT synthesis
    from xframe_tpu.library.legendre import sph_legendre_table_full_m
    Pt = sph_legendre_table_full_m(L, np.cos(theta_i).ravel())  # (n_m, npts, L+1)
    ms = np.arange(-L, L + 1)
    e = np.exp(1j * ms[:, None] * phi_i.ravel()[None, :])
    f_ref = np.einsum("ml,mpl,mp->p", coeff, Pt, e).reshape(T.shape)
    assert np.allclose(f_rot, f_ref, atol=1e-4 * np.abs(f_ref).max())


def test_so3_correlation_recovers_rotation():
    L = 8
    rng = np.random.default_rng(2)
    coeff = np.zeros((2, 2 * L + 1, L + 1), dtype=complex)
    for l in range(L + 1):
        s = slice(L - l, L + l + 1)
        c = rng.normal(size=(2, 2 * l + 1)) + 1j * rng.normal(size=(2, 2 * l + 1))
        # hermitian-like decay to make a smooth signal
        coeff[:, s, l] = c / (1 + l)
    corr = SO3Correlator(L)
    a0, b0, g0 = corr.alphas[5], corr.betas[7], corr.gammas[11]
    D = wigner_D_single(L, a0, b0, g0)
    g_rot = np.asarray(rotate_coeff(jnp.asarray(coeff), D))

    C = np.asarray(corr.correlate(jnp.asarray(g_rot), jnp.asarray(coeff)))
    ia, ib, ig = np.unravel_index(np.argmax(C), C.shape)
    # the peak must identify the applied rotation (possibly with an
    # α↔γ/inverse convention — locked in here):
    a_hat, b_hat, g_hat = corr.alphas[ia], corr.betas[ib], corr.gammas[ig]
    D_hat = wigner_D_single(L, a_hat, b_hat, g_hat)
    aligned = np.asarray(rotate_coeff(jnp.asarray(coeff), D_hat))
    rel = np.linalg.norm(aligned - g_rot) / np.linalg.norm(g_rot)
    assert rel < 0.05, (rel, (a0, b0, g0), (a_hat, b_hat, g_hat))
