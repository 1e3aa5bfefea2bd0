#!/usr/bin/env python
"""Correlate-stage throughput benchmark at the reference's tutorial-1a
workload: 2000 frames of 512x512 float32 from .raw files, cartesian->polar
regrid (n_phi=1024, interpolation order matching the settings), per-frame
rfft CCF with mask correction, accumulation — end to end including file IO
(C++ prefetching reader).

Reference baseline: 60-120 minutes on a 2-4 core laptop
(/root/reference/docs/fxs.md:131, tutorial settings
correlate/tutorial.yaml: 512x512, max_n_patterns 2000, n_phi 1024).
vs_baseline uses the reference-favorable 60-minute end.

Usage: python scripts/correlate_bench.py [--frames 2000] [--size 512]
       [--batch 64] [--order 1] [--keep-frames]
"""
import argparse
import json
import os
import time

import numpy as np


def write_frames(folder, n, ny, nx, seed=0):
    os.makedirs(folder, exist_ok=True)
    paths = [os.path.join(folder, f"frame_{i:05d}.raw") for i in range(n)]
    if all(os.path.exists(p) and os.path.getsize(p) == ny * nx * 4
           for p in paths):
        return paths  # reuse between runs
    rng = np.random.default_rng(seed)
    base = rng.gamma(2.0, 50.0, size=(ny, nx)).astype(np.float32)
    for i, p in enumerate(paths):
        # per-frame fluctuation on a shared envelope: cheap to generate,
        # realistic dynamic range for threshold masks
        f = base * rng.uniform(0.5, 1.5)
        f.ravel()[rng.integers(0, ny * nx, 64)] = -1.0  # dead pixels
        f.tofile(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--order", type=int, default=1)
    ap.add_argument("--n-phi", type=int, default=1024)
    ap.add_argument("--folder", default="/tmp/xf_correlate_bench")
    args = ap.parse_args()

    from xframe_tpu.library.compile_cache import enable as enable_cache
    enable_cache()
    from xframe_tpu.projects.fxs.correlate import Correlator
    from xframe_tpu.native import PrefetchingFrameLoader

    ny = nx = args.size
    t0 = time.perf_counter()
    paths = write_frames(args.folder, args.frames, ny, nx)
    print(f"frames ready in {time.perf_counter() - t0:.1f} s", flush=True)

    # reference tutorial geometry (correlate/tutorial.yaml)
    corr = Correlator((ny, nx), (ny / 2 - 0.8, nx / 2 - 0.5), 200.0, 800.0,
                      1.23984, n_phi=args.n_phi,
                      interpolation_order=args.order,
                      mask_below=0.0, fc_n_max=70)

    def run_once():
        loader = PrefetchingFrameLoader(paths, (ny, nx), dtype=np.float32,
                                        batch_size=args.batch)
        t = time.perf_counter()
        out = corr.correlate_frames(iter(loader), batch_size=args.batch)
        _ = np.asarray(out["cross_correlation"])  # force readback
        return time.perf_counter() - t, out

    dt_warm, out = run_once()     # includes compile
    dt, out = run_once()          # steady state, fresh reader
    fps = args.frames / dt
    ref_fps = args.frames / 3600.0  # 2000 frames / 60 min (favorable end)
    print(json.dumps({
        "metric": "correlate_frames_per_second",
        "value": fps,
        "unit": f"frames/s ({args.frames} x {ny}x{nx} raw frames -> "
                f"({corr.n_q},{corr.n_q},{args.n_phi}) CCF, incl. file IO)",
        "seconds_total": dt,
        "seconds_with_compile": dt_warm,
        "num_images_good": int(out["num_images_good"]),
        "vs_baseline": fps / ref_fps,
    }))


if __name__ == "__main__":
    main()
