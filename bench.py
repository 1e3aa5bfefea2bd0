#!/usr/bin/env python
"""Headline benchmark: seconds per MTIP iteration at the reference tutorial
scale (n_radial_points=128, max_order=64, 256×512 angular grid — BASELINE.md).

Baseline: the reference's amortized 1.2 s/iteration per restart stream
(57 restarts, EPYC 7543 + 2× RTX A6000 OpenCL; docs/fxs.md:482-484).
Prints ONE JSON line.
"""
import json
import os
import time

import numpy as np

BASELINE_SEC_PER_ITER = 1.2


def _device_live():
    """Bounded TPU-tunnel liveness check.

    The axon tunnel can go down for hours; `jax.devices()` then blocks
    forever inside backend init, which would hang the driver's round-end
    bench run. Probe in a SUBPROCESS (so the hang is killable) with
    retries before committing this process to device init. Returns True
    when a probe ran a device matmul, False when every attempt timed out
    or failed. Knobs: XF_BENCH_PROBE_TIMEOUT (s/attempt, default 900),
    XF_BENCH_PROBE_ATTEMPTS (default 3, sleeping 60 s between), or skip
    entirely with XF_BENCH_NO_PROBE=1 (e.g. deliberate CPU runs).

    The per-attempt timeout is generous because the degraded-tunnel mode
    observed 2026-08-20 establishes the device->host channel only after
    ~4-12 MINUTES on the first readback of a process (subsequent readbacks
    are instant, compute is unaffected throughout) — a 120 s probe declares
    a usable-but-degraded tunnel dead and forfeits the whole bench run.
    A healthy tunnel still completes the probe in ~15 s.
    """
    if os.environ.get("XF_BENCH_NO_PROBE"):
        return True
    import subprocess
    import sys
    timeout = float(os.environ.get("XF_BENCH_PROBE_TIMEOUT", "900"))
    attempts = int(os.environ.get("XF_BENCH_PROBE_ATTEMPTS", "3"))
    # the probe must exercise BOTH directions: the tunnel has been observed
    # with a healthy compute path while device->host readback stalled for
    # >5 min even on scalars — a compute-only probe would pass and the
    # bench would then hang on its first readback
    code = ("import jax, jax.numpy as jnp; jax.devices(); "
            "x = jnp.ones((8, 8)); y = (x @ x).block_until_ready(); "
            "assert float(jax.device_get(y[0, 0])) == 8.0")
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < attempts:
            time.sleep(60)
    return False


def main():
    if not _device_live():
        print(json.dumps({
            "metric": "sec_per_mtip_iteration_tutorial", "value": None,
            "unit": "", "vs_baseline": None,
            "error": "TPU tunnel unreachable (liveness probe failed; "
                     "see _device_live in bench.py)"}))
        raise SystemExit(1)
    import jax
    import jax.numpy as jnp
    from xframe_tpu.library.compile_cache import enable as enable_cache
    enable_cache()  # single-core container: compiles dominate; persist them
    # round-4 defaults: replay-mode best tracking (anchors + on-demand
    # replay, no grid-sized best state in the scan) — measured 4.419 vs
    # 4.493 ms/iter eager on this window; override with XF_BEST_MODE=eager
    os.environ.setdefault("XF_BEST_MODE", "replay")
    # Establish the device->host channel BEFORE any timed region: in the
    # degraded-tunnel mode the first readback of a process can take minutes
    # (see _device_live) — pay it here, on 256 bytes, once.
    from xframe_tpu.library.hostio import to_host
    _warm = (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    np.asarray(to_host(_warm))
    from xframe_tpu.projects.fxs.demo import make_demo_problem
    from xframe_tpu.projects.fxs.phasing import Segment

    # fused path: batch 2 measures ~9% faster PER RESTART than batch 1
    # (a second restart fills kernel pipeline bubbles); the round-1 jnp
    # path preferred batch 1. 100 timed iterations amortize dispatch to the
    # steady state the full schedule sustains (measured sweep, /tmp-logged:
    # 20it b2 5.75 ms, 60it b2 4.79 ms, 100it b2 4.59 ms/iter/restart)
    n_restarts = int(os.environ.get("XF_BENCH_RESTARTS", "2"))
    n_iter = int(os.environ.get("XF_BENCH_ITERS", "100"))
    method = os.environ.get("XF_BENCH_PROCRUSTES", "newton_schulz")
    ns_iters = int(os.environ.get("XF_BENCH_NS_ITERS", "16"))
    # Newton-Schulz coefficient schedule: 'minimax' (the shipped reconstruct
    # default since round 5 — ops/polar_schedule.py, 14 interval-optimal
    # steps vs 16 quintic + 4 cubic fixed) or 'fixed'
    if os.environ.get("XF_BENCH_NS_SCHED", "minimax") == "minimax":
        from xframe_tpu.ops.polar_schedule import DEFAULT_SCHEDULE
        ns_sched = DEFAULT_SCHEDULE
    else:
        ns_sched = None
    mxu = jnp.bfloat16 if os.environ.get("XF_BENCH_SHT_BF16") else None
    fused = os.environ.get("XF_BENCH_FUSED_SHT", "1").lower() \
        not in ("0", "false")
    p = make_demo_problem(128, 64, n_theta=256, n_phi=512,
                          procrustes_method=method, ns_iterations=ns_iters,
                          ns_schedule=ns_sched, mxu_dtype=mxu,
                          fused_sht=fused)
    schedule = [Segment("HIO", n_iter, betas=np.full(n_iter, 0.5), ft_stab=True)]
    rho0s = p.initial_density_batch(0, n_restarts)
    run = jax.jit(lambda r: p.mtip.run_batch(r, schedule))

    if os.environ.get("XF_BENCH_SKIP_SHORT"):
        # sweep mode: only the full schedule below is measured (its first
        # call is its own compile+warmup) — saves one big tunnel compile
        # per restart-batch size
        out = {"metric": "full_schedule_only", "value": None,
               "unit": "", "vs_baseline": None, "restarts": n_restarts}
    else:
        states, errors = run(rho0s)  # compile + warmup
        jax.block_until_ready((states.rho, errors))
        rho0s_b2 = p.initial_density_batch(1, n_restarts)
        jax.block_until_ready(rho0s_b2)   # keep input prep out of the timing
        t0 = time.perf_counter()
        states, errors = run(rho0s_b2)
        jax.block_until_ready((states.rho, errors))
        dt = time.perf_counter() - t0

        sec_per_iter = dt / (n_iter * n_restarts)
        out = {
            "metric": "sec_per_mtip_iteration_tutorial",
            "value": sec_per_iter,
            "unit": "s/iteration/restart (N_q=128, L_max=64, 256x512 "
                    "angular grid)",
            "vs_baseline": BASELINE_SEC_PER_ITER / sec_per_iter,
            "restarts": n_restarts,
        }

    # Full tutorial schedule — DEFAULT ON since round 5 (VERDICT r4 #4: the
    # driver-captured artifact must record the schedule throughput, not just
    # the dispatch-floor micro window). Opt out with XF_BENCH_NO_FULL=1.
    if os.environ.get("XF_BENCH_FULL") or not os.environ.get("XF_BENCH_NO_FULL"):
        # full tutorial schedule incl. shrink-wrap: 5×(60 HIO + 1 SW + 40 ER)
        # + (1 SW + 100 ER) = 600 iterations (reference tutorial.yaml:1-69);
        # reference headline = 285 restarts/hour on EPYC + 2×A6000
        try:
            full = []
            for _ in range(5):
                full += [Segment("HIO", 60, betas=np.full(60, 0.5),
                                 ft_stab=True),
                         Segment("SW", sigma=p.mtip.sw.default_sigma,
                                 threshold=0.1),
                         Segment("ER", 40, betas=np.zeros(40), ft_stab=True)]
            full += [Segment("SW", sigma=p.mtip.sw.default_sigma,
                             threshold=0.1),
                     Segment("ER", 100, betas=np.zeros(100), ft_stab=True)]
            run_full = jax.jit(lambda r: p.mtip.run_batch(r, full))
            states_f, errs = run_full(rho0s)    # compile + warmup
            jax.block_until_ready((states_f.rho, errs))
            # time on DIFFERENT inputs: the axon tunnel can serve a repeated
            # (program, inputs) pair from cache without re-executing, which
            # once yielded a bogus 0.3 ms "measurement" of 600 iterations
            rho0s_b = p.initial_density_batch(1, n_restarts)
            jax.block_until_ready(rho0s_b)
            t0 = time.perf_counter()
            states_f, errs = run_full(rho0s_b)
            jax.block_until_ready((states_f.rho, errs))
            dt_full = time.perf_counter() - t0
            n_full = sum(s.n for s in full if s.method != "SW")
            rph = n_restarts * 3600.0 / dt_full
            out["full_schedule_restarts_per_hour"] = rph
            out["full_schedule"] = {
                "iterations": n_full,
                "restarts": n_restarts,
                "seconds": dt_full,
                "restarts_per_hour": rph,
                "vs_baseline_restarts_per_hour": rph / 285.0,
            }
        except Exception as e:  # keep the primary metric line alive
            out["full_schedule_error"] = f"{type(e).__name__}: {e}"[:300]

    # Production scale (N_q=256, L=127, 320×640) — DEFAULT ON since round 5:
    # the full tutorial-shaped 600-iteration schedule via the chunked runner
    # (one mega-jit serializes a >2.5 GB proto — over the tunnel AOT limit).
    # Tables enter jit as ARGUMENTS (embedded constants exceed the tunnel's
    # compile-payload limit — measured HTTP 413 at ~480 MB of constants).
    # Opt out with XF_BENCH_NO_PROD=1. L=127 keeps the fused kernels' l
    # contraction on the 128-lane MXU boundary (measured 1.31× vs L=128).
    if os.environ.get("XF_BENCH_PROD") or not os.environ.get("XF_BENCH_NO_PROD"):
        try:
            from xframe_tpu.parallel.mesh import CheckpointingRunner
            from xframe_tpu.library.hostio import to_host
            nq_p = 256
            L_p = int(os.environ.get("XF_BENCH_PROD_L", "127"))
            nth, nph = 320, 640
            pp = make_demo_problem(nq_p, L_p, n_theta=nth, n_phi=nph,
                                   procrustes_method=method,
                                   ns_schedule=ns_sched, fused_sht=True)
            tables = jax.device_put(pp.mtip.arg_tables())
            jax.block_until_ready(tables)
            sched_p = []
            for _ in range(5):
                sched_p += [
                    Segment("HIO", 60, betas=np.full(60, 0.5), ft_stab=True),
                    Segment("SW", sigma=pp.mtip.sw.default_sigma,
                            threshold=0.1),
                    Segment("ER", 40, betas=np.zeros(40), ft_stab=True)]
            sched_p += [Segment("SW", sigma=pp.mtip.sw.default_sigma,
                                threshold=0.1),
                        Segment("ER", 100, betas=np.zeros(100), ft_stab=True)]
            n_p = sum(s.n for s in sched_p if s.method != "SW")
            runner = CheckpointingRunner(pp.mtip, sched_p, arg_tables=tables)
            r0 = pp.initial_density_batch(0, 1, tables=tables)
            states_p, errs_p = runner(r0, resume=False)   # compile + warmup
            jax.block_until_ready(errs_p)
            seen = float(np.atleast_1d(np.asarray(
                to_host(states_p.best_err)))[0])
            r1 = pp.initial_density_batch(1, 1, tables=tables)
            jax.block_until_ready(r1)
            t0 = time.perf_counter()
            states_p, errs_p = runner(r1, resume=False)
            best_p = float(np.atleast_1d(np.asarray(
                to_host(states_p.best_err)))[0])
            jax.block_until_ready(errs_p)
            dt_p = time.perf_counter() - t0
            out["production_full_schedule_restarts_per_hour"] = 3600.0 / dt_p
            out["production"] = {
                "sec_per_iteration": dt_p / n_p,
                "seconds_per_restart": dt_p,
                "restarts_per_hour": 3600.0 / dt_p,
                "unit": f"s/iteration/restart (N_q={nq_p}, L_max={L_p}, "
                        f"{nth}x{nph} angular grid, full 600-iter schedule)",
                "best_err": best_p,
                "execution_witnessed": best_p != seen,
                "arg_table_mb": round(sum(
                    int(np.prod(v.shape)) * v.dtype.itemsize
                    for v in tables.values()) / 1e6),
            }
        except Exception as e:
            out["production_error"] = f"{type(e).__name__}: {e}"[:300]

    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except Exception:
        # one retry: the tunnel occasionally drops a single request
        # (spurious UNIMPLEMENTED) even when healthy
        import traceback
        traceback.print_exc()
        time.sleep(30)
        main()
