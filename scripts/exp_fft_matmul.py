#!/usr/bin/env python
"""EXPERIMENT: 2-stage Cooley-Tukey FFT via MXU matmuls vs jnp.fft.fft.

Motivation (docs/performance.md): the φ-axis FFT dominates the MTIP
iteration, and XLA's TPU FFT runs ~15× above its pure-traffic bound. The
round-1 dead end was the FULL N×N DFT matmul (512 MACs/element); this is
the factored variant (16+32 = 48 MACs/element, two einsum stages + twiddle).

Run on the real chip: PYTHONPATH=/root/repo python scripts/exp_fft_matmul.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

N1, N2 = 32, 16
N = N1 * N2


def make_tables(inverse=False):
    s = 1.0 if inverse else -1.0
    F1 = np.exp(s * 2j * np.pi * np.outer(np.arange(N1), np.arange(N1)) / N1)
    F2 = np.exp(s * 2j * np.pi * np.outer(np.arange(N2), np.arange(N2)) / N2)
    T = np.exp(s * 2j * np.pi * np.outer(np.arange(N1), np.arange(N2)) / N)
    return (F1.astype(np.complex64), F2.astype(np.complex64),
            T.astype(np.complex64))


F1, F2, T = make_tables()


def fft_matmul(x):
    """FFT over the last axis (length N = N1*N2) via two matmul stages.

    n = N2*n1 + n2, k = k1 + N1*k2:
      B[k1,n2] = Σ_{n1} A[n1,n2] W_{N1}^{n1 k1}
      X[k1,k2] = Σ_{n2} B[k1,n2] W_N^{n2 k1} W_{N2}^{n2 k2}
    """
    A = x.reshape(x.shape[:-1] + (N1, N2))
    B = jnp.einsum("...nm,nk->...km", A, jnp.asarray(F1))
    C = B * jnp.asarray(T)
    X = jnp.einsum("...km,mj->...kj", C, jnp.asarray(F2))
    # k = k1 + N1*k2 → (k2, k1) raveled
    return jnp.swapaxes(X, -1, -2).reshape(x.shape)


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    shape = (4, 128, 256, N)  # batch-4 tutorial grid
    # axon: complex arrays must be assembled INSIDE jit from f32 planes
    x_re = rng.normal(size=shape).astype(np.float32)
    x_im = rng.normal(size=shape).astype(np.float32)

    f_ref = jax.jit(lambda re, im: jnp.fft.fft(re + 1j * im, axis=-1))
    f_mm = jax.jit(lambda re, im: fft_matmul(re + 1j * im))

    # numerics: on-device relative error, f32 scalar readback
    err_fn = jax.jit(lambda re, im: (
        jnp.abs(fft_matmul(re + 1j * im)
                - jnp.fft.fft(re + 1j * im, axis=-1)).max()
        / jnp.abs(jnp.fft.fft(re + 1j * im, axis=-1)).max()))
    e = err_fn(x_re[:1, :4, :4], x_im[:1, :4, :4])
    print(f"relative error vs jnp.fft: {float(e):.2e}")

    # device-resident inputs: host arrays as call arguments would ship
    # ~1 GB over the tunnel per call and swamp the timing
    d_re, d_im = jax.device_put(x_re), jax.device_put(x_im)
    jax.block_until_ready((d_re, d_im))
    t_ref = timed(f_ref, d_re, d_im)
    t_mm = timed(f_mm, d_re, d_im)
    print(f"jnp.fft.fft : {t_ref*1e3:8.2f} ms")
    print(f"matmul FFT  : {t_mm*1e3:8.2f} ms   ({t_ref/t_mm:.2f}x)")


if __name__ == "__main__":
    main()
