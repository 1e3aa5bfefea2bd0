#!/usr/bin/env python
"""FLOP / HBM-byte accounting for ONE fused ft-stab HIO MTIP iteration
(the bench.py workload) from the actual kernel shapes — VERDICT r2 item 4.

Every count below is derivable by arithmetic from the shapes printed in the
header; run with --sec-per-iter to convert into achieved TFLOP/s, GB/s and
MFU against the v5e peaks. Conventions:

  * a complex MAC = 8 flops; a real MAC = 2 flops; matmul(m,k,n) = 2mkn.
  * HBM bytes count every operand block a kernel reads/writes once per
    launch (constant-index table blocks are DMA'd once — m_splits == 1).
  * padded (MXU-aligned) shapes are used — that is the work the chip does.

Kernel inventory mirrors phasing.MTIP._mtip_iteration_fused (phasing.py:263)
+ the per-iteration best-state carry update of the segment scan.
"""
import argparse
import math


def fmt(x):
    for unit, s in (("G", 1e9), ("M", 1e6)):
        if abs(x) >= s:
            return f"{x / s:.2f} {unit}"
    return f"{x:.0f} "


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nq", type=int, default=128)
    ap.add_argument("--L", type=int, default=64)
    ap.add_argument("--ntheta", type=int, default=256)
    ap.add_argument("--nphi", type=int, default=512)
    ap.add_argument("--ns-iters", type=int, default=16)
    ap.add_argument("--sec-per-iter", type=float, default=None,
                    help="measured s/iteration/restart (bench.py) to convert "
                         "into achieved rates")
    ap.add_argument("--eager-best", action="store_true",
                    help="count the pre-r3 per-iteration XLA best-state "
                         "select instead of the in-K4 lazy tracking")
    ap.add_argument("--best", choices=["replay", "eager", "lazy"],
                    default="replay",
                    help="best-state strategy to count (round-4 default: "
                         "replay — anchors every --anchor-chunk iterations, "
                         "no per-iteration select)")
    ap.add_argument("--anchor-chunk", type=int, default=16)
    ap.add_argument("--r3", action="store_true",
                    help="count the ROUND-3 pipeline (separate K2 + psi_p "
                         "analysis, two Hankel inverses, XLA hermitianize, "
                         "f32 support/weight grids in K4)")
    ap.add_argument("--restarts", type=int, default=1,
                    help="restart batch the measurement was taken at")
    args = ap.parse_args()
    if args.eager_best:
        args.best = "eager"

    nq, L, nth, nph = args.nq, args.L, args.ntheta, args.nphi
    nm = 2 * L + 1                       # centered-m coefficient width
    nl = L + 1
    mb = -(-nm // 8) * 8                 # FusedSHT 8-aligned m pad (136)
    mpb = -(-nl // 8) * 8                # positive-m pad (72)
    R = nq * nth                         # grid rows entering the phi-DFT

    GP = nq * nth * nph * 4              # one f32 grid plane (67.1 MB)
    CPm = nq * mb * nl * 4               # one full-m f32 coeff plane
    CPp = nq * mpb * nl * 4              # one positive-m f32 coeff plane
    T_P = mb * nl * nth * 4              # Legendre synth table P_t
    T_I = 2 * mb * nph * 4               # DFT synth tables I_re/I_im
    T_E = 2 * mb * nph * 4               # DFT analysis tables E_re/E_im
    T_PW = mb * nth * nl * 4             # Legendre analysis table PW
    T_Pp = mpb * nl * nth * 4
    T_Ip = 2 * mpb * nph * 4
    T_PWp = mpb * nth * nl * 4
    W_H = nl * nq * nq * 8               # Hankel weights (complex64)

    # ---- per-kernel (flops, hbm_bytes) -----------------------------------
    def k1_analysis():
        flops = (4 * 2 * R * nph * mb            # complex phi-DFT (4 real mm)
                 + 2 * 2 * mb * nq * nth * nl)   # Legendre, 2 planes
        return flops, 2 * GP + T_E + T_PW + 2 * CPm

    def k1_synthesis():
        flops = (2 * 2 * mb * nq * nth * nl      # Legendre, 2 planes
                 + 4 * 2 * R * mb * nph)         # complex inverse DFT
        return flops, 2 * CPm + T_P + T_I + 2 * GP

    def hankel():
        return 8 * nl * nq * nq * nm, 2 * CPm + W_H + 2 * CPm

    rows = []

    def add(name, flops, byts):
        rows.append((name, flops, byts))

    add("K1 analysis rho -> c",       *k1_analysis())
    add("Hankel forward",             *hankel())
    add("K1' synthesis psi",          *k1_synthesis())
    add("abs2 analysis (fused |psi|^2 -> I_lm)",
        3 * R * nph + 2 * 2 * R * nph * mpb + 2 * 2 * mpb * nq * nth * nl,
        2 * GP + T_E + T_PWp + 2 * CPp)
    # data projection: B = PD @ I_l (batched), Newton-Schulz polar (quintic
    # ns_iters + 4 cubic polish), V.W replacement  (projections.py:27-64,
    # 160-236). l<=L-1 blocks run cropped to the 128-lane tile; the l=L
    # block is (nm, nm) padded to 2 lanes of 128 -> count 256.
    n_small, n_small_dim = L, 128
    n_last_dim = 256 if nm > 128 else 128
    per_iter_mm = 3                      # A=X^H X, A@A, X@B  (quintic)
    ns_flops = (args.ns_iters * per_iter_mm + 4 * 2) * 8 * (
        n_small * n_small_dim ** 3 + n_last_dim ** 3)
    bd_flops = 2 * 8 * nl * nm * nq * nm        # PD@I and V_pad@W
    add(f"data projection (NS{args.ns_iters} Procrustes + V.W)",
        ns_flops + bd_flops,
        2 * CPm * 3 + nl * nm * nm * 8 * 4)     # coeffs + W/M/V traffic
    herm_flops = 2 * 2 * mpb * mb * nq * nl     # in-kernel Ha/Hb matmuls
    k2_core_flops = (2 * 2 * mpb * nq * nth * nl
                     + 2 * 2 * R * mpb * nph + 10 * R * nph)
    if args.r3:
        add("hermitianize c (XLA, coeff-space)", 2 * nq * nm * nl,
            2 * CPm + 2 * CPp)
        add("K2 synth I_new + amplitude projection", k2_core_flops,
            2 * CPp + T_Pp + T_Ip + 2 * GP + 2 * GP)
        add("K1 analysis psi_p -> c",     *k1_analysis())
        add("Hankel inverse c_rho",       *hankel())
        add("Hankel inverse c_i (ft-stab)", *hankel())
        add("coeff combine d (XLA)", 2 * nq * nm * nl, 3 * 2 * CPm)
    else:
        # K2+ (round 4): in-kernel hermitianize, I_new synthesis, amplitude
        # projection, and psi_p's forward analysis in ONE pass — psi_p never
        # exists in HBM
        add("K2+ herm + synth + amp-proj + psi_p analysis",
            herm_flops + k2_core_flops
            + 4 * 2 * R * nph * mb + 2 * 2 * mb * nq * nth * nl,
            2 * CPm + T_Pp + T_Ip + 2 * GP + T_E + T_PW + 2 * CPm)
        add("coeff subtract e = c_p - cf (XLA, ft-stab)",
            2 * nq * nm * nl, 6 * CPm)
        hf, hb = hankel()
        add("Hankel inverse (ONE, on e) + row-0 fix",
            hf + 8 * nl * nq * nm, hb + 2 * CPm + CPm)
    k4_flops = 2 * 2 * mb * nq * nth * nl + 4 * 2 * R * mb * nph \
        + 20 * R * nph
    sup_bytes = GP if args.r3 else GP // 4      # int8 mask (O3)
    w_bytes = GP if args.r3 else nq * nth * 4   # separable plane (O3)
    k4_bytes = (2 * CPm + T_P + T_I + 2 * GP   # d, tables, rho_in
                + sup_bytes + w_bytes
                + 2 * GP)                       # rho_new out
    if args.best == "eager":
        add("K4 synthesis + constraint + HIO update", k4_flops, k4_bytes)
        add("best-state carry update (XLA select)", 0,
            3 * 2 * GP)                    # read rho_new + best, write best
    elif args.best == "lazy":
        # lazy best-state rides inside K4: +2 planes in (best), +2 out
        add("K4 synth + constraint + update + lazy best",
            k4_flops, k4_bytes + 4 * GP)
    else:
        add("K4 synthesis + constraint + HIO update", k4_flops, k4_bytes)
        # replay best: one conditional anchor select (rho + int8 sup) per
        # anchor chunk, amortized; the on-demand replay (<= chunk length,
        # usually 0) happens once per run, not per iteration
        K = args.anchor_chunk
        add(f"anchor update / {K} iters (amortized)", 0,
            (3 * 2 * GP + 3 * GP // 4) // K)

    tot_f = sum(f for _, f, _ in rows)
    tot_b = sum(b for _, _, b in rows)
    print(f"shapes: nq={nq} L={L} grid {nth}x{nph}  m_pad={mb} "
          f"mpos_pad={mpb}  grid plane {GP / 1e6:.1f} MB  "
          f"coeff plane {CPm / 1e6:.2f} MB")
    print(f"{'kernel':<46} {'GFLOP':>8} {'HBM MB':>8}")
    for name, f, b in rows:
        print(f"{name:<46} {f / 1e9:>8.2f} {b / 1e6:>8.1f}")
    print(f"{'TOTAL / iteration':<46} {tot_f / 1e9:>8.2f} {tot_b / 1e6:>8.1f}")

    if args.sec_per_iter:
        t = args.sec_per_iter
        bw = tot_b / t
        fl = tot_f / t
        print(f"\nmeasured {t * 1e3:.2f} ms/iteration/restart "
              f"(batch {args.restarts}):")
        print(f"  achieved {fl / 1e12:.1f} TFLOP/s "
              f"({100 * fl / 197e12:.1f}% of v5e bf16 peak 197 TFLOP/s)")
        print(f"  achieved {bw / 1e9:.0f} GB/s "
              f"({100 * bw / 819e9:.1f}% of v5e HBM peak 819 GB/s)")
        # which wall is closer?
        t_bw = tot_b / 819e9
        t_fl = tot_f / 197e12
        print(f"  roofline floors: bandwidth {t_bw * 1e3:.2f} ms, "
              f"bf16-compute {t_fl * 1e3:.2f} ms "
              f"-> {'bandwidth' if t_bw > t_fl else 'compute'}-limited "
              f"at {max(t_bw, t_fl) / t * 100:.0f}% of light speed")


if __name__ == "__main__":
    main()
