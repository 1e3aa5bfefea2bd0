#!/usr/bin/env python
"""Component timing of the MTIP iteration at tutorial scale: isolates the
spherical FT, the intensity projection, and the Procrustes step to steer
kernel optimization. Run on the real TPU (solo)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from xframe_tpu.library.compile_cache import enable as enable_cache
from xframe_tpu.projects.fxs.demo import make_demo_problem

enable_cache()
from xframe_tpu.projects.fxs.phasing import Segment


def timed(fn, *args, n=20, warmup=True):
    if warmup:
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    B = 4
    p = make_demo_problem(128, 64, n_theta=256, n_phi=512,
                          procrustes_method="newton_schulz")
    ft, mtip = p.ft, p.mtip
    rho = p.initial_density_batch(0, B)

    fwd = jax.jit(jax.vmap(ft.forward))
    t_ft = timed(fwd, rho)
    psi = fwd(rho)

    sht_fwd = jax.jit(jax.vmap(lambda ps: ft.sht.forward_real(
        (ps * ps.conj()).real)))
    t_sht = timed(sht_fwd, psi)
    Ilm = sht_fwd(psi)

    proc = jax.jit(jax.vmap(mtip.rc.approximate_unknowns))
    t_proc = timed(proc, Ilm)

    proj = jax.jit(jax.vmap(lambda I: mtip.rc(I)))
    t_proj = timed(proj, Ilm)

    synth = jax.jit(jax.vmap(lambda c: ft.sht.inverse(c).real))
    t_synth = timed(synth, proj(Ilm))

    step = jax.jit(jax.vmap(lambda r: mtip.mtip_iteration(
        r, jnp.asarray(mtip.initial_support), jnp.float32(0.5), "HIO", True)[0]))
    t_full = timed(step, rho, n=10)

    print(f"batch={B} tutorial scale (128, 256x512), times per call:")
    print(f"  spherical FT (fwd)          : {t_ft*1e3:8.2f} ms")
    print(f"  intensity SHT (fwd_real)    : {t_sht*1e3:8.2f} ms")
    print(f"  procrustes (NS polar)       : {t_proc*1e3:8.2f} ms")
    print(f"  full data projection        : {t_proj*1e3:8.2f} ms")
    print(f"  intensity synthesis (iSHT)  : {t_synth*1e3:8.2f} ms")
    print(f"  FULL MTIP iteration         : {t_full*1e3:8.2f} ms"
          f"  ({t_full/B*1e3:.2f} ms/restart)")
    # rough decomposition: iteration ~ 3 FT-equivalents + projection chain
    print(f"  (3x FT + SHT pair + proj    : "
          f"{(3*t_ft + t_sht + t_synth + t_proj)*1e3:8.2f} ms expected)")




def ft_breakdown():
    import jax.numpy as jnp
    B = 4
    p = make_demo_problem(128, 64, n_theta=256, n_phi=512)
    ft = p.ft
    rho = p.initial_density_batch(0, B)

    sht_fwd = jax.jit(jax.vmap(ft.sht.forward))
    c = sht_fwd(rho)
    t_a = timed(sht_fwd, rho)
    hank = jax.jit(jax.vmap(ft.hankel.forward))
    t_h = timed(hank, c)
    sht_inv = jax.jit(jax.vmap(ft.sht.inverse))
    t_s = timed(sht_inv, c)
    fft_only = jax.jit(lambda x: jnp.fft.fft(x, axis=-1))
    t_f = timed(fft_only, rho)
    print(f"  SHT analysis (fold+einsums+fft): {t_a*1e3:8.2f} ms")
    print(f"  Hankel (batched per-l matmul)  : {t_h*1e3:8.2f} ms")
    print(f"  SHT synthesis (einsums+ifft)   : {t_s*1e3:8.2f} ms")
    print(f"  bare FFT over phi              : {t_f*1e3:8.2f} ms")


def fused_breakdown(nq=128, L=64, n_theta=256, n_phi=512):
    """Per-kernel attribution of the fully-fused pipeline (round 2b):
    times each Pallas kernel + the coefficient-space ops standalone,
    single restart (the chip saturates at batch 1). At production sizes the
    big tables are threaded into every sub-jit as ARGUMENTS (bound_tables) —
    embedded constants would exceed the tunnel's compile-payload limit."""
    p = make_demo_problem(nq, L, n_theta=n_theta, n_phi=n_phi,
                          procrustes_method="newton_schulz", fused_sht=True)
    ft, mtip = p.ft, p.mtip
    fused, fi = ft._fused, mtip._fi
    assert fi is not None
    tables = jax.device_put(mtip.arg_tables())
    jax.block_until_ready(tables)

    def tj(fn, n_args=1):
        """jit(fn) with the tables bound during tracing."""
        def wrapped(t, *args):
            with mtip.bound_tables(t):
                return fn(*args)
        j = jax.jit(wrapped)
        return lambda *args: j(tables, *args[:n_args])

    rho = p.initial_density_batch(0, 1, tables=tables)[0]

    fwd = tj(lambda r: fused.forward(r))
    c0 = fwd(rho)
    t_k1 = timed(fwd, rho)
    hank_f = tj(lambda c: ft.hankel.forward(c))
    cf = hank_f(c0)
    t_hf = timed(hank_f, c0)
    synth = tj(lambda c: fused.inverse(c))
    psi = synth(cf)
    t_k1i = timed(synth, cf)
    abs2 = tj(lambda ps: fused.forward_real_abs2(ps))
    Ilm = abs2(psi)
    t_abs2 = timed(abs2, psi)
    rc = tj(lambda I: mtip.rc(I))
    Ip = rc(Ilm)
    t_rc = timed(rc, Ilm)
    proc = tj(lambda I: mtip.rc.approximate_unknowns(I))
    t_proc = timed(proc, Ilm)
    k2 = tj(lambda a, b: fi.inverse_real_project(a, b), n_args=2)
    t_k2 = timed(k2, Ip, psi)
    hank_i = tj(lambda c: ft.hankel.inverse(c))
    t_hi = timed(hank_i, cf)
    sup = jax.jit(lambda: jnp.asarray(mtip.initial_support,
                                      dtype=jnp.float32))()
    # materialize the (possibly separable) error weights under jit — eager
    # broadcast ops are not reliable on the axon backend; pass the grid-sized
    # support/weights as ARGUMENTS (as constants they are 210 MB each at
    # production scale → HTTP 413)
    w = jax.jit(lambda s: jnp.broadcast_to(mtip._w_err, s.shape))(sup)
    k4 = tj(lambda dd, r, s, we: fi.synthesize_update(
        dd, r, s, we, jnp.float32(0.5),
        jnp.asarray(1.0 + 0.0j, dtype=mtip.cdtype),  # constant inside jit:
        method="HIO", ft_stab=True,                  # axon can't move complex
        real_constraint=mtip.real), n_args=4)
    d = hank_i(fwd(k2(Ip, psi)[0]))
    t_k4 = timed(k4, d, rho, sup, w)

    step = tj(lambda r: mtip.mtip_iteration(
        r, jnp.asarray(mtip.initial_support), jnp.float32(0.5), "HIO", True)[0])
    t_full = timed(step, rho, n=10)

    total = 2 * t_k1 + t_hf + t_k1i + t_abs2 + t_rc + t_k2 + 2 * t_hi + t_k4
    print(f"fused pipeline, 1 restart, nq={nq} L={L} grid "
          f"{n_theta}x{n_phi} — ms per call:")
    print(f"  procrustes alone (NS polar)      : {t_proc*1e3:8.2f}"
          "  (contained in data projection)")
    print(f"  K1 analysis (grid->coeff)        : {t_k1*1e3:8.2f}  (x2/iter)")
    print(f"  Hankel forward (coeff)           : {t_hf*1e3:8.2f}")
    print(f"  K1' synthesis psi (coeff->grid)  : {t_k1i*1e3:8.2f}")
    print(f"  abs2 analysis |psi|^2 (fused)    : {t_abs2*1e3:8.2f}")
    print(f"  data projection (Procrustes+V.W) : {t_rc*1e3:8.2f}")
    print(f"  K2 synth+amplitude projection    : {t_k2*1e3:8.2f}")
    print(f"  Hankel inverse (coeff)           : {t_hi*1e3:8.2f}  (x2/iter)")
    print(f"  K4 synth+constraint+update       : {t_k4*1e3:8.2f}")
    print(f"  sum of parts                     : {total*1e3:8.2f}")
    print(f"  FULL fused MTIP iteration        : {t_full*1e3:8.2f}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--ft", action="store_true")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--nq", type=int, default=128)
    ap.add_argument("--L", type=int, default=64)
    ap.add_argument("--ntheta", type=int, default=None)
    ap.add_argument("--nphi", type=int, default=None)
    a = ap.parse_args()
    n_theta = a.ntheta or (256 if a.L == 64 else -(-2 * (a.L + 1) // 64) * 64)
    n_phi = a.nphi or (512 if a.L == 64 else -(-4 * (a.L + 1) // 128) * 128)
    if a.ft:
        ft_breakdown()
    elif a.fused:
        fused_breakdown(a.nq, a.L, n_theta, n_phi)
    else:
        main()
