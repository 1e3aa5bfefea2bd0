#!/usr/bin/env python
"""Fused-SHT accuracy vs harmonic order (VERDICT r3 #4).

Forward / inverse / round-trip relative L2 error of the f32 FusedSHT (and the
f32 jnp SHT, and bf16-table FusedSHT) against a float64 host (numpy)
reference at L in {16, 64, 127, 128} on the production angular grids.
Run on CPU (interpret-mode kernels execute the identical arithmetic graph to
the TPU lowering at f32; table contents are bit-identical).
"""
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from xframe_tpu.library.legendre import gauss_legendre, sph_legendre_table_full_m  # noqa: E402
from xframe_tpu.ops.sht import SphericalHarmonicTransform  # noqa: E402
from xframe_tpu.ops.pallas_sht import FusedSHT  # noqa: E402


class HostSHT64:
    """Float64 numpy reference with the exact layout/normalization of ops.sht."""

    def __init__(self, l_max, n_theta, n_phi):
        self.L, self.nt, self.nph = l_max, n_theta, n_phi
        x, w = gauss_legendre(n_theta)
        x, w = x[::-1].copy(), w[::-1].copy()
        P = sph_legendre_table_full_m(l_max, x).astype(np.float64)
        self.P = P
        self.PW = P * w[None, :, None]
        ls = np.arange(l_max + 1)[None, :]
        ms = np.arange(-l_max, l_max + 1)[:, None]
        self.mask = ls >= np.abs(ms)

    def forward(self, f):
        L = self.L
        fm = np.fft.fft(f, axis=-1)
        fm = np.concatenate([fm[..., -L:], fm[..., : L + 1]], axis=-1) \
            * (2 * np.pi / self.nph)
        return np.einsum("...tm,mtl->...ml", fm, self.PW)

    def inverse(self, c):
        L = self.L
        fm = np.einsum("...ml,mtl->...tm", c, self.P)
        pad = self.nph - (2 * L + 1)
        zeros = np.zeros(fm.shape[:-1] + (pad,), dtype=fm.dtype)
        full = np.concatenate([fm[..., L:], zeros, fm[..., :L]], axis=-1)
        return np.fft.ifft(full, axis=-1) * self.nph


def rel(a, b):
    return float(np.linalg.norm(np.ravel(a - b)) / np.linalg.norm(np.ravel(b)))


def measure(L, nt, nph, n_q=4, table_dtype=None, seed=0):
    ref = HostSHT64(L, nt, nph)
    rng = np.random.default_rng(seed)
    c0 = (rng.standard_normal((n_q, 2 * L + 1, L + 1))
          + 1j * rng.standard_normal((n_q, 2 * L + 1, L + 1))) * ref.mask
    f64 = ref.inverse(c0)                # band-limited field, float64
    c64 = ref.forward(f64)               # == c0 up to f64 quadrature error
    sanity = rel(c64, c0)

    sht = SphericalHarmonicTransform(L, n_theta=nt, n_phi=nph)
    fused = FusedSHT(sht, table_dtype=table_dtype)
    f32 = np.asarray(f64, dtype=np.complex64)
    c_f = np.asarray(jax.jit(fused.forward)(f32))
    f_i = np.asarray(jax.jit(fused.inverse)(c0.astype(np.complex64)))
    rt = np.asarray(jax.jit(lambda x: fused.forward(fused.inverse(x)))(
        c0.astype(np.complex64)))
    c_j = np.asarray(jax.jit(sht.forward)(f32))
    rt_j = np.asarray(jax.jit(lambda x: sht.forward(sht.inverse(x)))(
        c0.astype(np.complex64)))
    mask = ref.mask
    return {
        "sanity_f64": sanity,
        "fused_fwd": rel(c_f * mask, c0),
        "fused_inv": rel(f_i, f64),
        "fused_rt": rel(rt * mask, c0),
        "jnp_fwd": rel(c_j * mask, c0),
        "jnp_rt": rel(rt_j * mask, c0),
    }


if __name__ == "__main__":
    cases = [(16, 64, 128), (64, 256, 512), (127, 320, 640), (128, 320, 640)]
    if len(sys.argv) > 1:
        cases = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    for L, nt, nph in cases:
        r = measure(L, nt, nph)
        print(f"L={L:4d} grid {nt}x{nph} f32 :",
              " ".join(f"{k}={v:.3e}" for k, v in r.items()), flush=True)
        import ml_dtypes
        rb = measure(L, nt, nph, table_dtype=ml_dtypes.bfloat16)
        print(f"L={L:4d} grid {nt}x{nph} bf16:",
              " ".join(f"{k}={v:.3e}" for k, v in rb.items()
                       if k.startswith("fused")), flush=True)
