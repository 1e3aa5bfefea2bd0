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

    # scientific fidelity (VERDICT r4 #2): align the averaged density to the
    # analytic ground truth of the archived simulate_ccd shape settings and
    # report the real-space correlation + the PRTF resolution
    t0 = time.perf_counter()
    import h5py
    import numpy as np
    from xframe_tpu.settings.loader import load_yaml, execute_commands
    from xframe_tpu.ops.fourier import SphericalFourierTransform
    from xframe_tpu.ops.integrate import SphericalIntegrator
    from xframe_tpu.projects.fxs.reconstruct import load_cached_weights
    from xframe_tpu.projects.fxs.fidelity import align_to_ground_truth
    base = os.path.join(args.home, "data", "fxs")
    shapes = execute_commands(load_yaml(os.path.join(
        base, "ccd", "tutorial", "run_1", "settings.yaml")))["shapes"]
    with h5py.File(os.path.join(base, "averages", "tutorial", "run_1",
                                "average_results.h5"), "r") as f:
        avg = f["average/real_density"][...]
        rs = f["grid/rs"][...]
        qs = f["grid/qs"][...]
        thetas = f["grid/thetas"][...]
        phis = f["grid/phis"][...]
        prtf_res = (float(np.asarray(
            f["resolution_metrics/PRTF_resolution_q"])[()])
            if "resolution_metrics/PRTF_resolution_q" in f else None)
    with h5py.File(os.path.join(base, "reconstructions", "tutorial", "run_1",
                                "data.h5"), "r") as f:
        rc = float(np.asarray(f["configuration/reciprocity_coefficient"])[()])
    L = (len(phis) - 1) // 2 if len(thetas) == 0 else \
        min((len(phis) - 1) // 2, len(thetas) - 1)
    # the reconstruct archive records max_order via the projection data; the
    # internal grid implies it through the anti-aliasing rule — recover it
    # from the settings instead
    rec_cfg = load_yaml(os.path.join(base, "reconstructions", "tutorial",
                                     "run_1", "settings.yaml"))
    L = int(rec_cfg.get("grid", {}).get("max_order", L))
    ft = SphericalFourierTransform(
        len(rs), L, q_max=float(qs.max() + qs[0]), mode="midpoint",
        reciprocity_coefficient=rc,
        weights_dict=load_cached_weights(L, len(rs), rc, 3, "midpoint"),
        n_theta=len(thetas), n_phi=len(phis))
    integ = SphericalIntegrator(rs, len(thetas), len(phis))
    corr, _, _ = align_to_ground_truth(avg, shapes, ft, integ.w_broadcast,
                                       dim=3)
    print(json.dumps({"stage": "fidelity",
                      "ground_truth_correlation": round(float(corr), 4),
                      "PRTF_resolution_q": prtf_res,
                      "seconds": round(time.perf_counter() - t0, 1)}),
          flush=True)

    print(json.dumps({"stage": "TOTAL",
                      "seconds": round(time.perf_counter() - t_all, 1),
                      "per_stage": {k: round(v, 1) for k, v in totals.items()},
                      "ground_truth_correlation": round(float(corr), 4),
                      "home": args.home}), flush=True)


if __name__ == "__main__":
    main()
