#!/usr/bin/env python
"""Per-kernel attribution of the fused MTIP iteration at PRODUCTION scale
(N_q=256, L=127, 320x640) on the real chip, hardened against the axon
tunnel's three measurement traps (docs/performance.md):

  * block_until_ready does NOT truly block — compute drains into the next
    readback, so per-dispatch wall times measure enqueue cost only;
  * repeated (program, inputs) pairs can be served from a result cache
    without re-execution;
  * readbacks carry a multi-second fixed cost in degraded-tunnel mode.

Protocol: every component is a SHAPE-PRESERVING chained composite run
inside ONE jit as lax.fori_loop(K) (so consecutive applications have
distinct inputs and there is nothing to result-cache), timed with a
to_host scalar readback INSIDE the timed region, at two trip counts
K_lo/K_hi — the slope (t_hi - t_lo)/(K_hi - K_lo) cancels dispatch +
readback fixed costs.

Usage: python scripts/profile_prod.py [--nq 256 --L 127] [--klo 20 --khi 120]
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nq", type=int, default=256)
    ap.add_argument("--L", type=int, default=127)
    ap.add_argument("--ntheta", type=int, default=320)
    ap.add_argument("--nphi", type=int, default=640)
    ap.add_argument("--klo", type=int, default=20)
    ap.add_argument("--khi", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0,
                    help="input-seed base; vary across invocations so the "
                         "tunnel result cache cannot serve stale results")
    ap.add_argument("--procrustes", default="newton_schulz_pallas")
    ap.add_argument("--only", default="",
                    help="substring filter: run only matching composites")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import jax.lax as lax
    from xframe_tpu.library.compile_cache import enable as enable_cache
    enable_cache()
    from xframe_tpu.library.hostio import to_host
    from xframe_tpu.projects.fxs.demo import make_demo_problem
    from xframe_tpu.ops.polar_schedule import DEFAULT_SCHEDULE

    t0 = time.perf_counter()
    p = make_demo_problem(args.nq, args.L, n_theta=args.ntheta,
                          n_phi=args.nphi,
                          procrustes_method=args.procrustes,
                          ns_schedule=DEFAULT_SCHEDULE,
                          fused_sht=True, cache_weights=True)
    mtip, ft = p.mtip, p.ft
    fused = ft._fused
    print(f"setup {time.perf_counter()-t0:.1f} s  "
          f"(fused q_block={fused.q_block})", flush=True)

    tables = jax.device_put(mtip.arg_tables())
    jax.block_until_ready(tables)

    def bind(fn):
        def wrapped(t, *xs):
            with mtip.bound_tables(t):
                return fn(*xs)
        return jax.jit(wrapped)

    # representative inputs, device-resident, seed-varied
    rho = p.initial_density_batch(args.seed + 17, 1, tables=tables)[0]
    (c0,) = bind(lambda r: (ft._analysis(r),))(tables, rho)
    (cf,) = bind(lambda c: (ft.hankel.forward(c),))(tables, c0)
    (psi,) = bind(lambda c: (ft._synthesis(c),))(tables, cf)
    (Ilm,) = bind(lambda ps: (ft.harmonic.forward_real_abs2(ps),))(
        tables, psi)
    jax.block_until_ready((rho, c0, cf, psi, Ilm))

    support = jnp.asarray(mtip.initial_support)
    sup_f = support.astype(jnp.float32)
    beta = jnp.float32(0.5)
    cphase = jnp.asarray(1.0 + 0.0j, dtype=mtip.cdtype)
    z = jnp.asarray(0.0 + 0.0j, dtype=mtip.cdtype)
    z2 = jnp.float32(0.0)

    def scalarize(x):
        """Small REAL readback handle from any composite state."""
        leaves = jax.tree_util.tree_leaves(x)
        return sum(jnp.sum(jnp.abs(l[(0,) * (l.ndim - 1)][:1]))
                   for l in leaves if l.ndim >= 1)

    def run_once(body, x0, K, scale):
        def wrapped(t, x, s):
            # in-jit input scaling: the axon backend cannot run eager ops,
            # and a distinct s defeats the tunnel's (program, input) result
            # cache between the warmup and timed calls
            x = jax.tree_util.tree_map(lambda a: a * s.astype(a.dtype), x)
            with mtip.bound_tables(t):
                out = lax.fori_loop(0, K, lambda i, v: body(v), x)
            return out, scalarize(out)
        f = jax.jit(wrapped)
        # compile + warm with a scaled input (distinct from the timed one)
        _, s = f(tables, x0, jnp.float32(scale))
        float(np.asarray(to_host(s)))
        t1 = time.perf_counter()
        _, s = f(tables, x0, jnp.float32(1.0))
        v = float(np.asarray(to_host(s)))
        return time.perf_counter() - t1, v

    results = []

    def rec(name, body, x0, per_app=1):
        if args.only and args.only not in name:
            return None
        t_lo, v1 = run_once(body, x0, args.klo, 1.0001)
        t_hi, v2 = run_once(body, x0, args.khi, 1.0002)
        dt = (t_hi - t_lo) / (args.khi - args.klo) / per_app
        results.append((name, dt))
        print(f"  {name:36s}: {dt*1e3:8.3f} ms   "
              f"(t{args.klo}={t_lo:.2f}s t{args.khi}={t_hi:.2f}s "
              f"w={v1:.3e}/{v2:.3e})", flush=True)
        return dt

    damp = 0.999

    # --- composites ---------------------------------------------------
    rec("K1+K1' pair (analysis+synthesis)",
        lambda r: ft._synthesis(ft._analysis(r)) * damp, rho)
    rec("Hankel fwd+inv pair",
        lambda c: ft.hankel.inverse(ft.hankel.forward(c)) * damp, c0)
    rec("rc data projection", lambda I: mtip.rc(I) * damp, Ilm)

    def k2_body(ps):
        I = ft.harmonic.forward_real_abs2(ps)
        c_p, rn, rd = mtip._fi.inverse_real_project_fwd(
            mtip.rc(I), ps)
        return ft._synthesis(c_p) * damp

    rec("abs2+rc+K2+ then K1' (composite)", k2_body, psi)

    def k4_body(r):
        outs = mtip._fi.synthesize_update(
            c0, r, sup_f, mtip._k4_weights(), beta, cphase,
            method="HIO", ft_stab=True, real_constraint=mtip.real,
            fix_phase=mtip.fix_global_phase)
        return outs[0] * damp

    rec("K4 synth+constraint+HIO", k4_body, rho)

    def full_body(r):
        rho_new, err, err_rec, z_n, z2_n = mtip._mtip_iteration_fused(
            r, sup_f, beta, "HIO", True, z, z2)
        return rho_new * damp

    t_full = rec("FULL fused iteration", full_body, rho)

    if args.only:
        return
    print("\nderived attribution (ms):")
    d = dict(results)
    pair = d["K1+K1' pair (analysis+synthesis)"]
    k2c = d["abs2+rc+K2+ then K1' (composite)"]
    han = d["Hankel fwd+inv pair"]
    rc_t = d["rc data projection"]
    k4 = d["K4 synth+constraint+HIO"]
    print(f"  K1-class launch (pair/2)      : {pair/2*1e3:7.3f}")
    print(f"  Hankel launch (pair/2)        : {han/2*1e3:7.3f}")
    print(f"  rc data projection (K5)       : {rc_t*1e3:7.3f}")
    print(f"  abs2+K2+ (k2c - rc - K1')     : "
          f"{(k2c - rc_t - pair/2)*1e3:7.3f}")
    print(f"  K4                            : {k4*1e3:7.3f}")
    expl = pair / 2 * 3 + han + rc_t + (k2c - rc_t - pair / 2) + k4
    print(f"  sum (K1,Hf,K1',abs2K2,rc,Hinv,K4): {expl*1e3:7.3f}")
    print(f"  FULL iteration                : {t_full*1e3:7.3f}")
    mem = jax.local_devices()[0].memory_stats() or {}
    print(f"peak device bytes: {mem.get('peak_bytes_in_use', 0)/1e9:.2f} GB")


if __name__ == "__main__":
    main()
