"""Tests for prephasing, cross-dataset unitary extraction, and
particle-number estimation."""
import numpy as np
import jax.numpy as jnp
import pytest

from xframe_tpu.ops.sht import SphericalHarmonicTransform
from xframe_tpu.projects.fxs import invariants as itools
from xframe_tpu.projects.fxs.demo import make_demo_problem
from xframe_tpu.library.hostio import to_host


@pytest.fixture(scope="module")
def problem():
    return make_demo_problem(24, 10)


def _negativity(proj, sht):
    V = itools.pad_projection_matrices(proj, sht.l_max,
                                       np.atleast_2d(proj[0]).shape[0])
    I = to_host(sht.inverse(jnp.asarray(V))).real
    return float(np.abs(I[I < 0]).sum() / np.abs(I).sum())


def test_in_loop_particle_estimate_matches_bruteforce():
    """ReciprocalConstraint.particle_number_estimate's one-histogram trick
    must reproduce the reference's explicit (K × grid) negative-fraction scan
    (fxs_Projections.py:1115-1196) exactly, including the projected output."""
    import jax
    from xframe_tpu.projects.fxs.projections import ReciprocalConstraint
    rng = np.random.default_rng(3)
    n_q, L = 12, 4
    qs = np.linspace(0.05, 0.5, n_q)
    avg = np.abs(rng.normal(2.0, 0.5, n_q))
    proj = [rng.normal(size=(n_q, min(2 * l + 1, n_q)))
            + 1j * rng.normal(size=(n_q, min(2 * l + 1, n_q)))
            for l in range(L + 1)]
    rc = ReciprocalConstraint.build(
        proj, qs, L, average_intensity=avg, schmidt_scaling=False,
        pn_scan_space=(1.0, 16.0, 48), pn_project=True)
    assert rc.pn_enabled
    I = rng.normal(0.3, 1.0, (n_q, 6, 10)).astype(np.float32)
    n_hat, I_out = jax.jit(rc.particle_number_estimate)(jnp.asarray(I))

    # brute force (reference semantics)
    a = avg[:, None, None] / 1.0  # pn_a = avg (I00·Y00 with I00 = avg·2√π)
    sq = np.linspace(1.0, 4.0, 48)
    s = 1.0 / sq - 1.0
    neg = np.array([(I + si * a < 0).mean() for si in s])
    grad = (neg[1:] - neg[:-1]) / (sq[1:] - sq[:-1])
    idx = int(np.argmax(grad))
    assert np.isclose(float(n_hat), sq[idx] ** 2, rtol=1e-5)
    expect = np.maximum(I + s[idx] * a, 0.0)
    assert np.allclose(np.asarray(I_out), expect, atol=1e-5)


def test_enforce_sht_constraint_reduces_negativity(problem):
    """Scramble each V_l by a random unitary (destroys intensity positivity —
    exactly the situation prephasing addresses), then check the constraint
    loop substantially reduces the negative intensity volume while staying in
    the V_l·U_l gauge orbit (B_l unchanged)."""
    sht = problem.ft.sht
    rng = np.random.default_rng(11)
    proj = []
    for l, v in enumerate(problem.projection_matrices):
        N = v.shape[1]
        U = np.linalg.qr(rng.normal(size=(N, N))
                         + 1j * rng.normal(size=(N, N)))[0]
        proj.append(v @ U)
    neg0 = _negativity(proj, sht)
    assert neg0 > 0.01  # scrambling produced real negativity
    out, converged = itools.enforce_sht_constraint(proj, sht, iterations=100)
    assert len(out) == len(proj)
    for l, v in enumerate(out):
        assert v.shape == proj[l].shape
        # gauge orbit preserved: B_l = V_l V_l† unchanged
        b_in = proj[l] @ proj[l].conj().T
        b_out = v @ v.conj().T
        assert np.abs(b_out - b_in).max() < 1e-3 * max(np.abs(b_in).max(), 1e-9)
    neg1 = _negativity(out, sht)
    assert neg1 < 0.5 * neg0, (neg0, neg1)


def test_unknown_unitary_transform_recovers_rotation():
    rng = np.random.default_rng(5)
    n_q = 20
    W_true, proj1, proj2, eig1, eig2, b21 = [], [], [], [], [], []
    L = 6
    for l in range(L + 1):
        N = min(2 * l + 1, n_q)
        # V with orthogonal columns: V†V = diag(e)
        A = rng.normal(size=(n_q, N)) + 1j * rng.normal(size=(n_q, N))
        Q, _ = np.linalg.qr(A)
        e = np.sort(rng.uniform(0.5, 2.0, N))[::-1]
        V1 = Q * np.sqrt(e)[None, :]
        A2 = rng.normal(size=(n_q, N)) + 1j * rng.normal(size=(n_q, N))
        Q2, _ = np.linalg.qr(A2)
        e2 = np.sort(rng.uniform(0.5, 2.0, N))[::-1]
        V2 = Q2 * np.sqrt(e2)[None, :]
        U = np.linalg.qr(rng.normal(size=(N, N))
                         + 1j * rng.normal(size=(N, N)))[0]
        W_true.append(U)
        proj1.append(V1)
        proj2.append(V2)
        eig1.append(e)
        eig2.append(e2)
        b21.append(V2 @ U @ V1.conj().T)
    b21 = np.asarray(b21)
    qs = np.linspace(0.1, 1.0, n_q)
    for method in ("procrustes", "direct"):
        W, errors = itools.calc_unknown_unitary_transform(
            proj1, eig1, proj2, eig2, b21, qs, method=method)
        for l in range(L + 1):
            recon = proj2[l] @ W[l] @ proj1[l].conj().T
            rel = np.abs(recon - b21[l]).max() / np.abs(b21[l]).max()
            assert rel < 1e-5, (method, l, rel)


def test_estimate_number_of_particles_scaling(problem):
    """The onset scale must grow as √n: n-particle data has B_0 → n²B_0 and
    B_{l>0} → nB_l (estimate ratios, not absolute calibration — the absolute
    onset carries a data-dependent gauge factor, as in the reference)."""
    bl = problem.bl
    estimates = {}
    for n in [1, 4, 9]:
        bl_n = bl.copy()
        bl_n[0] = n ** 2 * bl[0]
        bl_n[1:] = n * bl[1:]
        proj, eigs = itools.deg2_invariant_to_projection_matrices(bl_n)
        n_hat, grad, neg, scales = itools.estimate_number_of_particles(
            proj, problem.ft.sht, search_space=(0.25, 6.0, 256))
        assert np.isfinite(neg).all() and neg.max() > 0
        estimates[n] = n_hat
    assert abs(estimates[4] / estimates[1] - 4) < 0.5
    assert abs(estimates[9] / estimates[1] - 9) < 1.0
