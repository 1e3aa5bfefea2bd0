#!/usr/bin/env python
"""Production-grid scale proof (VERDICT r2 item 3): run the fused MTIP
pipeline at N_q >= 256, L = 128 on the chip; record s/iteration and device
memory. Usage: python scripts/prod_scale.py [--nq 256 --L 128] [--iters 10]
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nq", type=int, default=256)
    ap.add_argument("--L", type=int, default=128)
    ap.add_argument("--ntheta", type=int, default=None)
    ap.add_argument("--nphi", type=int, default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--restarts", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0,
                    help="initial-density seed base; use a FRESH value per "
                         "measurement - the tunnel serves repeated "
                         "(program, inputs) pairs from a result cache "
                         "without re-executing")
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument("--procrustes", default="newton_schulz",
                    choices=["svd", "newton_schulz", "newton_schulz_pallas"],
                    help="polar-decomposition path; newton_schulz_pallas "
                         "enables the K5 fused data-projection kernel")
    ap.add_argument("--ns", default="minimax",
                    choices=["minimax", "fixed"],
                    help="Newton-Schulz coefficient schedule (minimax is "
                         "the shipped worker default: 14 steps vs 16+4)")
    ap.add_argument("--full", action="store_true",
                    help="run the full 600-iteration tutorial-shaped "
                         "schedule (5x(60 HIO + SW + 40 ER) + SW + 100 ER) "
                         "and report restarts/hour at production scale")
    args = ap.parse_args()

    import jax
    from xframe_tpu.library.compile_cache import enable as enable_cache
    enable_cache()
    from xframe_tpu.projects.fxs.demo import make_demo_problem
    from xframe_tpu.projects.fxs.phasing import Segment

    n_theta = args.ntheta or 2 * (args.L + 1)
    n_phi = args.nphi or 4 * (args.L + 1)
    # round to MXU-friendly sizes
    n_theta = -(-n_theta // 64) * 64
    n_phi = -(-n_phi // 128) * 128
    print(f"building problem nq={args.nq} L={args.L} grid "
          f"{n_theta}x{n_phi} ...", flush=True)
    t0 = time.perf_counter()
    ns_sched = None
    if args.ns == "minimax":
        from xframe_tpu.ops.polar_schedule import DEFAULT_SCHEDULE
        ns_sched = DEFAULT_SCHEDULE
    p = make_demo_problem(args.nq, args.L, n_theta=n_theta, n_phi=n_phi,
                          procrustes_method=args.procrustes,
                          ns_schedule=ns_sched,
                          fused_sht=not args.no_fused, cache_weights=True)
    fused = getattr(p.ft, "_fused", None)
    print(f"setup {time.perf_counter() - t0:.1f} s "
          f"(fused q_block={getattr(fused, 'q_block', None)})", flush=True)

    if args.full:
        schedule = []
        for _ in range(5):
            schedule += [
                Segment("HIO", 60, betas=np.full(60, 0.5), ft_stab=True),
                Segment("SW", sigma=p.mtip.sw.default_sigma, threshold=0.1),
                Segment("ER", 40, betas=np.zeros(40), ft_stab=True)]
        schedule += [Segment("SW", sigma=p.mtip.sw.default_sigma,
                             threshold=0.1),
                     Segment("ER", 100, betas=np.zeros(100), ft_stab=True)]
        args.iters = sum(s.n for s in schedule if s.method != "SW")
    else:
        schedule = [Segment("HIO", args.iters,
                            betas=np.full(args.iters, 0.5), ft_stab=True)]
    # production scale: tables enter as jit ARGUMENTS (embedded constants
    # exceed the tunnel's compile-payload limit — measured HTTP 413 at
    # N_q=256/L=128 with ~480 MB of constants)
    tables = p.mtip.arg_tables()
    tab_mb = sum(v.size * v.dtype.itemsize for v in tables.values()) / 1e6
    print(f"arg tables: {len(tables)} arrays, {tab_mb:.0f} MB", flush=True)
    # device-resident ONCE: numpy arguments would re-ship ~½ GB per call
    tables = jax.device_put(tables)
    jax.block_until_ready(tables)
    rho0s = p.initial_density_batch(args.seed, args.restarts,
                                   tables=tables)
    if args.full:
        # One mega-jit of the 11-segment schedule serializes a 2.65 GB
        # executable proto at this scale — over the tunnel's AOT limit.
        # Run shrink-wrap-bounded chunks instead: identical chunk
        # structures share one (small) compiled program.
        from xframe_tpu.parallel.mesh import CheckpointingRunner
        # pass the already device-resident tables: arg_tables=True would
        # device_put a second ~½ GB copy
        runner = CheckpointingRunner(p.mtip, schedule, arg_tables=tables)
        run = lambda t, r: runner(r, resume=False)  # noqa: E731
    else:
        run = jax.jit(lambda t, r: p.mtip.run_batch(r, schedule, tables=t))
    from xframe_tpu.library.hostio import to_host
    t0 = time.perf_counter()
    states, errors = run(tables, rho0s)
    jax.block_until_ready(errors)
    print(f"compile+first run {time.perf_counter() - t0:.1f} s", flush=True)
    # Timing protocol hardened against the tunnel's result cache (observed
    # serving anomalously fast results even for fresh seeds): run THREE
    # fresh-seed measurements and use best_err as an execution witness —
    # a repeated best_err means the run was served from cache, distinct
    # values prove genuine execution. Report the median of witnessed runs;
    # the readback is INSIDE the timed region so an async/cache-served
    # dispatch cannot return before its result exists on the host.
    seen = {float(b) for b in
            np.atleast_1d(np.asarray(to_host(states.best_err)))}
    runs = []
    for k in range(1, 4):
        rho0s = p.initial_density_batch(args.seed + k, args.restarts,
                                        tables=tables)
        jax.block_until_ready(rho0s)
        t0 = time.perf_counter()
        states, errors = run(tables, rho0s)
        best_k = np.atleast_1d(np.asarray(to_host(states.best_err)))
        jax.block_until_ready(errors)
        dt_k = time.perf_counter() - t0
        witnessed = not any(float(b) in seen for b in best_k)
        seen.update(float(b) for b in best_k)
        runs.append({"seconds": dt_k, "witnessed": witnessed,
                     "best_err": [float(b) for b in best_k]})
        print(f"run {k}: {dt_k:.3f} s witnessed={witnessed}", flush=True)
    good = [r["seconds"] for r in runs if r["witnessed"]] \
        or [r["seconds"] for r in runs]
    dt = float(np.median(good))
    sec_per_iter = dt / (args.iters * args.restarts)

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            mem = {"peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                   "bytes_in_use": stats.get("bytes_in_use")}
    except Exception:
        pass
    errs = np.asarray(to_host(errors))
    best = np.asarray(to_host(states.best_err))
    out = {
        "metric": "sec_per_mtip_iteration_production",
        "value": sec_per_iter,
        "unit": f"s/iteration/restart (N_q={args.nq}, L_max={args.L}, "
                f"{n_theta}x{n_phi} angular grid)",
        "restarts": args.restarts,
        "errors_finite": bool(np.isfinite(errs).all()),
        "best_err": [float(b) for b in np.atleast_1d(best)],
        "runs": runs,
        "memory": mem,
    }
    if args.full:
        out["full_schedule"] = {
            "iterations": args.iters,
            "seconds_per_restart": dt / args.restarts,
            "restarts_per_hour": args.restarts * 3600.0 / dt,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
