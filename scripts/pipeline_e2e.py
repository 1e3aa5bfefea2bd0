#!/usr/bin/env python
"""End-to-end tutorial pipeline timing through the real worker path.

Runs simulate_ccd -> extract -> reconstruct -> average with the shipped
tutorial settings in a fresh home, timing each stage (wall clock, including
any compilation not served by the persistent cache). Prints one JSON line
per stage plus a total.

Reference stage baselines (its docs): simulate_ccd 1-2 min, extract ~3 min,
reconstruct 12 min for 57 restarts on a 2-GPU node (285 restarts/hour),
average unpublished (`/root/reference/docs/fxs.md:131,213,329,482-484`).

Usage: python scripts/pipeline_e2e.py [--home /tmp/xf_e2e_home] [--restarts N]
"""
import argparse
import json
import os
import shutil
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--home", default="/tmp/xf_e2e_home")
    ap.add_argument("--restarts", type=int, default=0,
                    help="override multi_start.n_reconstructions (0 = keep "
                         "the tutorial default of 8)")
    ap.add_argument("--keep-home", action="store_true")
    args = ap.parse_args()

    if not args.keep_home and os.path.isdir(args.home):
        shutil.rmtree(args.home)
    os.makedirs(args.home, exist_ok=True)
    os.environ["XFRAME_TPU_HOME"] = args.home

    from xframe_tpu.library.compile_cache import enable as enable_cache
    enable_cache()
    import xframe_tpu as xf

    totals = {}
    t_all = time.perf_counter()

    def run_stage(worker, overrides=None):
        t0 = time.perf_counter()
        xf.select_project("fxs", worker, "tutorial", overrides=overrides or {})
        xf.run()
        dt = time.perf_counter() - t0
        totals[worker] = dt
        print(json.dumps({"stage": worker, "seconds": round(dt, 1)}),
              flush=True)

    run_stage("simulate_ccd")
    run_stage("extract")
    rec_over = {}
    if args.restarts:
        rec_over = {"multi_start": {"n_reconstructions": args.restarts}}
    run_stage("reconstruct", rec_over)
    run_stage("average")

    print(json.dumps({"stage": "TOTAL",
                      "seconds": round(time.perf_counter() - t_all, 1),
                      "per_stage": {k: round(v, 1) for k, v in totals.items()},
                      "home": args.home}), flush=True)


if __name__ == "__main__":
    main()
