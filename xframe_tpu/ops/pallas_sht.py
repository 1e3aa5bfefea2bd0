"""Fused VMEM-resident spherical-harmonic transforms (Pallas TPU kernels).

Why: docs/performance.md — the MTIP iteration is traffic-bound, dominated by
the grid-sized HBM passes of the SHT stages (FFT + fold + Legendre einsums
each round-trip the 134 MB grid through HBM). These kernels read the grid
once per m-half per transform: a q-block of ρ(θ,φ) is DMA'd to VMEM, the
φ-DFT runs as an MXU matmul restricted to the 2L+1 needed m-bins (the
standalone DFT-by-matmul was a measured dead end in HBM, but inside VMEM its
traffic vanishes and 129 ≪ 512 bins make the FLOPs trivial), the Legendre
contraction follows as a per-m batched matmul against the quadrature table,
and only the (q, 2L+1, L+1) coefficients return to HBM.

The m axis is split across a second grid dimension so the Legendre tables
stay under the 16 MB VMEM budget at tutorial scale (the full-m table is
8.6 MB; one program would exceed scoped VMEM — measured OOM by 2.1 MB).
Forward m-halves write disjoint output columns; inverse m-halves accumulate
into the same output block (sequential innermost grid revisiting).

Layouts match ops.sht exactly: centered m (m = j − L ascending), orthonormal
Y_lm with Condon–Shortley, Gauss–Legendre θ grid, analysis normalization
(2π/n_φ)·Σ_φ and GL quadrature weights baked into the table.

Complex arithmetic is float32 planes throughout (axon cannot move complex
arrays; plane form also halves the matmul count vs complex promotion).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import os as _os

# XF_FUSED_MXU_BF16=1: store the DFT/Legendre TABLES as bfloat16 at the host
# and run the in-kernel matmuls on the MXU in bf16 with float32 accumulation
# (~4e-3 relative per transform). Host-side table conversion matters: an
# in-kernel astype of the 86.5 MB production Legendre table materialized a
# full bf16 copy in VMEM and OOM'd scoped memory — with bf16-resident tables
# the copy is a no-op and the table footprint HALVES. Read at import time so
# bench can A/B without code edits.
_MXU_BF16 = _os.environ.get("XF_FUSED_MXU_BF16", "0").lower() \
    not in ("0", "false", "")

# Round-5 in-kernel experiments (production scale is VMEM/DMA-shaped, not
# launch-bound — docs/performance.md round-5 section). Both default-off until
# the chip A/B decides:
#   XF_FUSED_MCHUNK=<mc>: loop the analysis/synthesis Legendre stage over
#     m-chunks of mc rows inside the kernel — shrinks the live fm
#     intermediates from full-m to chunk-m so the VMEM plan can lift q_block
#     (larger q_block = more MXU rows per per-m Legendre matmul).
#   XF_STACK_REIM=1: stack the re/im planes along the q axis for the
#     Legendre batched matmul — ONE bmm at M=2·q_b instead of two at q_b
#     (the per-m matmuls run at M=q_block≈6 of the MXU's 128 rows at
#     production scale; doubling M costs only a VMEM concat).
_MCHUNK = int(_os.environ.get("XF_FUSED_MCHUNK", "0") or 0)
_STACK_REIM = _os.environ.get("XF_STACK_REIM", "0").lower() \
    not in ("0", "false", "")


def padded_vmem_bytes(*shape, itemsize=4):
    """VMEM bytes of an array window incl. Mosaic tile padding: the minor
    dim rounds up to 128 lanes and the second-minor to the sublane count
    (8 for f32 tiles, 16 for bf16)."""
    lead = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    sub_n = 8 * 4 // itemsize
    sub = -(-shape[-2] // sub_n) * sub_n
    lane = -(-shape[-1] // 128) * 128
    return lead * sub * lane * itemsize


def fused_sht_vmem_plan(n_theta, n_phi, l_max, n_m, table_itemsize,
                        vmem_limit_bytes=100 * 1024 * 1024):
    """Pure sizing model for the fused-SHT kernels → (q_block, limit_bytes).

    Chip-calibrated (v5e Mosaic allocator):
      * f32 tutorial (256×512, L=64): q_block 16 fits under 100 MB, 32 OOMs.
      * f32 production (320×640, L=128): measured 102.5 MB at qb=3
        (4.88 MB/qb); the padded analysis table is 86.5 MB — 2× its nominal
        bytes (l=129 → 256 lanes) — so tables >36 MB raise the cap to
        124 MiB (physical VMEM is 128 MiB).
      * bf16 production: measured 125.48 MiB needed at qb=9 with 44.7 MB
        of resident tables → 8.98 MB/q-block ≈ 9 plane equivalents + 6
        out blocks (bf16 data-plane copies + fm temporaries).
    """
    m8 = -(-n_m // 8) * 8
    tab_fwd = padded_vmem_bytes(m8, n_theta, l_max + 1,
                                itemsize=table_itemsize) \
        + 2 * padded_vmem_bytes(m8, n_phi, itemsize=table_itemsize)
    tab_inv = padded_vmem_bytes(m8, l_max + 1, n_theta,
                                itemsize=table_itemsize) \
        + 2 * padded_vmem_bytes(m8, n_phi, itemsize=table_itemsize)
    tab = max(tab_fwd, tab_inv)
    if tab > 36 * 1024 * 1024:
        vmem_limit_bytes = max(vmem_limit_bytes, 124 * 1024 * 1024)
    plane = n_theta * n_phi * 4
    out_blk = padded_vmem_bytes(m8, l_max + 1)
    if (l_max + 1) % 128 == 0:
        # lane-ALIGNED l contraction (L = 127, 255, ...): no 2× lane padding
        # in the analysis table, so `tab` is small — but the register
        # allocator's spill slots become the binding term. Chip-measured at
        # L=127, 320×640, f32 under the 124 MiB cap: 149.6 MB needed at
        # qb=13, 126.2 MB at qb=8, fits at qb=6 → fixed ≈ tab + 40 MB,
        # slope ≈ 4.67 MB/q (spill-dominated). The aligned MXU work runs 1.31× faster than
        # L=128 on the same grid (0.0371 vs 0.0486 s/iter), so the smaller
        # q-block is well worth it.
        if table_itemsize == 2:
            # bf16 tables halve `tab` below the 36 MB raise threshold, but
            # the spill term still dominates: chip point at L=127, 320×640 —
            # qb=4 needs 101.08 MB (OOM over the 100 MB cap) → slope
            # ≈ 10 MB/q over fixed ≈ tab + 40 MB. Raise the cap as the f32
            # aligned case does (its bigger table crosses the threshold).
            vmem_limit_bytes = max(vmem_limit_bytes, 124 * 1024 * 1024)
            per_q = int(10.5 * 1024 * 1024)
        else:
            per_q = int(4.67 * 1024 * 1024)
        budget = int(vmem_limit_bytes * 0.95) - tab - 40 * 1024 * 1024
        return max(1, min(16, budget // per_q)), int(vmem_limit_bytes)
    per_q = 6 * plane + 4 * out_blk
    if table_itemsize == 2:
        per_q = 9 * plane + 6 * out_blk
    budget = int(vmem_limit_bytes * 0.95) - tab
    q_block = max(1, min(16, budget // per_q))
    return int(q_block), int(vmem_limit_bytes)


def _cast_operands(a, b):
    """Match the data operand to the table dtype: bf16 tables pull the data
    block down to bf16 (free for the table — it is already bf16); the legacy
    both-f32 path under the env knob converts both."""
    if b.dtype == jnp.bfloat16:
        return a.astype(jnp.bfloat16), b
    if _MXU_BF16:
        return a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    return a, b


def _mm(a, b):
    a, b = _cast_operands(a, b)
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _mmT(x, e):
    """Contract dim 1 of both operands (DFT with (m, φ)-stored tables)."""
    x, e = _cast_operands(x, e)
    return lax.dot_general(x, e, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _bmm(a, b):
    """Batched matmul: (g, m, k) @ (g, k, n) → (g, m, n)."""
    a, b = _cast_operands(a, b)
    return lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32)


# ------------------------------------------------------------------- analysis
def _legendre_fwd(fm_re, fm_im, pw, q_b, n_theta, mc):
    """Legendre quadrature for one m-chunk: (q_b·θ, mc) DFT planes →
    ((q_b, mc, l), (q_b, mc, l)). XF_STACK_REIM runs the per-m batched
    matmul once at M=2·q_b instead of twice at q_b."""
    t_re = fm_re.reshape(q_b, n_theta, mc).transpose(2, 0, 1)
    t_im = fm_im.reshape(q_b, n_theta, mc).transpose(2, 0, 1)
    if _STACK_REIM:
        t = jnp.concatenate([t_re, t_im], axis=1)    # (mc, 2q_b, θ)
        o = _bmm(t, pw)                              # (mc, 2q_b, l)
        return (o[:, :q_b].transpose(1, 0, 2),
                o[:, q_b:].transpose(1, 0, 2))
    return (_bmm(t_re, pw).transpose(1, 0, 2),
            _bmm(t_im, pw).transpose(1, 0, 2))


def _m_chunks(m_blk):
    mc = _MCHUNK if _MCHUNK > 0 and m_blk % _MCHUNK == 0 else m_blk
    return mc, m_blk // mc


def _fwd_kernel(n_theta, n_phi, m_blk,
                are_ref, aim_ref, ere_ref, eim_ref, pw_ref,
                cre_ref, cim_ref):
    """One (q-block, m-half): (q_b, θ, φ) → (q_b, m_blk, l) coefficients.

    1. φ-DFT restricted to this m-half's bins: (q_b·θ, φ)×(φ, m_blk) MXU
       matmuls per plane (E columns ordered m = −L..L, host-padded).
    2. Legendre quadrature: per-m batched matmul over θ against the
       quadrature table PW[m, θ, l] (optionally m-chunked / re-im-stacked,
       see the XF_FUSED_MCHUNK / XF_STACK_REIM notes above)."""
    q_b = are_ref.shape[0]
    a_re = are_ref[:].reshape(q_b * n_theta, n_phi)
    a_im = aim_ref[:].reshape(q_b * n_theta, n_phi)
    # E stored (m, φ): contract over φ (dim 1 of both operands) — m must sit
    # on the second-to-last axis for mosaic's blocked-dim alignment rules
    mc, n_c = _m_chunks(m_blk)
    for k in range(n_c):
        sl = slice(k * mc, (k + 1) * mc)
        e_re = ere_ref[sl, :]
        e_im = eim_ref[sl, :]
        fm_re = _mmT(a_re, e_re) - _mmT(a_im, e_im)    # (q_b·θ, mc)
        fm_im = _mmT(a_re, e_im) + _mmT(a_im, e_re)
        o_re, o_im = _legendre_fwd(fm_re, fm_im, pw_ref[sl], q_b,
                                   n_theta, mc)
        cre_ref[:, sl, :] = o_re                       # (q_b, mc, l)
        cim_ref[:, sl, :] = o_im


def _inv_kernel(n_theta, n_phi, m_blk,
                cre_ref, cim_ref, p_ref, ire_ref, iim_ref,
                fre_ref, fim_ref):
    """One (q-block, m-half): accumulate this m-half's synthesis into
    f(q_b, θ, φ).

    1. Legendre synthesis: fm[m, q, θ] = c[m, q, l] · P[m, l, θ].
    2. φ-synthesis DFT over this half's rows of I[m, φ] = e^{+imφ};
       m-halves sum into the output block (innermost-grid revisiting)."""
    j = pl.program_id(1)
    q_b = cre_ref.shape[0]
    mc, n_c = _m_chunks(m_blk)
    f_re = f_im = None
    for k in range(n_c):
        sl = slice(k * mc, (k + 1) * mc)
        p = p_ref[sl]                               # (mc, l, θ)
        if _STACK_REIM:
            c = jnp.concatenate(
                [cre_ref[:, sl, :].transpose(1, 0, 2),
                 cim_ref[:, sl, :].transpose(1, 0, 2)], axis=1)
            fm = _bmm(c, p)                         # (mc, 2q_b, θ)
            fm_re = fm[:, :q_b].transpose(1, 2, 0)  # (q_b, θ, mc)
            fm_im = fm[:, q_b:].transpose(1, 2, 0)
        else:
            c_re = cre_ref[:, sl, :].transpose(1, 0, 2)   # (mc, q_b, l)
            c_im = cim_ref[:, sl, :].transpose(1, 0, 2)
            fm_re = _bmm(c_re, p).transpose(1, 2, 0)      # (q_b, θ, mc)
            fm_im = _bmm(c_im, p).transpose(1, 2, 0)
        fm_re = fm_re.reshape(q_b * n_theta, mc)
        fm_im = fm_im.reshape(q_b * n_theta, mc)
        i_re = ire_ref[sl, :]
        i_im = iim_ref[sl, :]
        pf_re = _mm(fm_re, i_re) - _mm(fm_im, i_im)
        pf_im = _mm(fm_re, i_im) + _mm(fm_im, i_re)
        f_re = pf_re if f_re is None else f_re + pf_re
        f_im = pf_im if f_im is None else f_im + pf_im
    f_re = f_re.reshape(q_b, n_theta, n_phi)
    f_im = f_im.reshape(q_b, n_theta, n_phi)

    @pl.when(j == 0)
    def _():
        fre_ref[:] = f_re
        fim_ref[:] = f_im

    @pl.when(j > 0)
    def _():
        fre_ref[:] = fre_ref[:] + f_re
        fim_ref[:] = fim_ref[:] + f_im


class FusedSHT:
    """Drop-in fused forward/inverse for a SphericalHarmonicTransform.

    Wraps an ops.sht.SphericalHarmonicTransform's tables into Pallas kernels;
    `forward(f)`/`inverse(c)` keep the host-facing complex dtypes and the
    centered-m padded layout. Tables enter as jit ARGUMENTS (host numpy →
    traced), not embedded constants, so the compiled payload stays small on
    the axon tunnel."""

    def __init__(self, sht, q_block: int | None = None, m_splits: int = 1,
                 interpret: bool | None = None,
                 vmem_limit_bytes: int = 100 * 1024 * 1024,
                 table_dtype=None):
        self.sht = sht
        self.m_splits = int(m_splits)
        self.interpret = interpret
        if table_dtype is None:
            import ml_dtypes
            table_dtype = ml_dtypes.bfloat16 if _MXU_BF16 else np.float32
        self.table_dtype = np.dtype(table_dtype)
        _tsize = self.table_dtype.itemsize
        if q_block is None and _os.environ.get("XF_FUSED_QB"):
            q_block = int(_os.environ["XF_FUSED_QB"])
        # VMEM plan: q-block auto-sizing + scoped-VMEM cap from the pure,
        # chip-calibrated model (see fused_sht_vmem_plan for the measured
        # boundaries; unit-tested at tutorial AND production dims in
        # tests/test_transforms.py)
        auto_qb, vmem_limit_bytes = fused_sht_vmem_plan(
            sht.n_theta, sht.n_phi, sht.l_max, sht.n_m, _tsize,
            vmem_limit_bytes)
        if q_block is None:
            q_block = auto_qb
        self.q_block = int(q_block)
        # the mosaic default scoped-VMEM budget is 16 MB; the physical VMEM
        # on v5e is far larger — raise the cap so the full-m tables fit
        # (measured: full-m forward kernel needs ~18 MB at tutorial scale)
        self._params = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))
        L = sht.l_max
        n_phi, n_theta, n_m = sht.n_phi, sht.n_theta, sht.n_m
        # pad m so every split block is divisible by 8 (mosaic requires
        # blocked second-to-last dims to be 8-aligned); padded rows are zero
        # in every table so they produce/consume zero coefficients
        self.m_blk = -(-(-(-n_m // self.m_splits)) // 8) * 8
        if _tsize == 2 and self.m_splits > 1 and self.m_blk % 16:
            # bf16 tiles are (16, 128): a split m-block must be 16-aligned
            # (full-dim blocks, i.e. m_splits=1, are exempt)
            self.m_blk = -(-self.m_blk // 16) * 16
        self.n_m_pad = self.m_blk * self.m_splits
        pad_m = self.n_m_pad - n_m
        phi = 2 * np.pi * np.arange(n_phi) / n_phi
        ms = np.arange(-L, L + 1)
        # analysis DFT stored TRANSPOSED (m, φ): m on the second-to-last axis
        tdt = self.table_dtype
        Et = np.exp(-1j * np.outer(ms, phi)) * (2 * np.pi / n_phi)
        Et = np.pad(Et, ((0, pad_m), (0, 0)))
        self._E_re = np.ascontiguousarray(Et.real.astype(tdt))
        self._E_im = np.ascontiguousarray(Et.imag.astype(tdt))
        # synthesis DFT rows: f(φ) = Σ_m fm e^{+imφ} (padded rows multiply
        # zero coefficients — keep them zero for safety)
        I = np.exp(1j * np.outer(ms, phi))
        I = np.pad(I, ((0, pad_m), (0, 0)))
        self._I_re = np.ascontiguousarray(I.real.astype(tdt))
        self._I_im = np.ascontiguousarray(I.imag.astype(tdt))
        PW = np.pad(np.asarray(sht._PW, dtype=np.float32),
                    ((0, pad_m), (0, 0), (0, 0)))            # (m_pad, θ, l)
        P_t = np.pad(np.swapaxes(np.asarray(sht._P, dtype=np.float32), 1, 2),
                     ((0, pad_m), (0, 0), (0, 0)))           # (m_pad, l, θ)
        self._PW = np.ascontiguousarray(PW.astype(tdt))
        self._P_t = np.ascontiguousarray(P_t.astype(tdt))
        # positive-m tables (m = 0..L) for the real-field analysis
        self._mp_blk = -(-(-(-(L + 1) // self.m_splits)) // 8) * 8
        self._mp_pad = self._mp_blk * self.m_splits
        pad_p = self._mp_pad - (L + 1)
        Ep = np.exp(-1j * np.outer(np.arange(L + 1), phi)) * (2 * np.pi / n_phi)
        Ep = np.pad(Ep, ((0, pad_p), (0, 0)))
        self._Ep_re = np.ascontiguousarray(Ep.real.astype(tdt))
        self._Ep_im = np.ascontiguousarray(Ep.imag.astype(tdt))
        self._PWp = np.ascontiguousarray(np.pad(
            np.asarray(sht._PW[L:], dtype=np.float32),
            ((0, pad_p), (0, 0), (0, 0))).astype(tdt))
        self.n_theta, self.n_phi, self.n_m, self.l_max = (n_theta, n_phi,
                                                          n_m, L)

    def _interp(self):
        if self.interpret is not None:
            return self.interpret
        return jax.default_backend() == "cpu"

    def _pad_rows(self, *arrs):
        rows = arrs[0].shape[0]
        qb = self.q_block
        if rows % qb:
            pad = qb - rows % qb
            arrs = tuple(jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) for a in arrs)
        return arrs, rows

    # ------------------------------------------------------------- forward
    def _forward_planes(self, f_re, f_im):
        """(rows, θ, φ) f32 planes → (rows, m, l) f32 planes."""
        (f_re, f_im), rows = self._pad_rows(f_re, f_im)
        g = f_re.shape[0] // self.q_block
        qb, nt, nph = self.q_block, self.n_theta, self.n_phi
        mb, L = self.m_blk, self.l_max
        kern = partial(_fwd_kernel, nt, nph, mb)
        blk_in = pl.BlockSpec((qb, nt, nph), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        e_spec = pl.BlockSpec((mb, nph), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        pw_spec = pl.BlockSpec((mb, nt, L + 1), lambda i, j: (j, 0, 0),
                               memory_space=pltpu.VMEM)
        blk_out = pl.BlockSpec((qb, mb, L + 1), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
        c_re, c_im = pl.pallas_call(
            kern,
            grid=(g, self.m_splits),
            in_specs=[blk_in, blk_in, e_spec, e_spec, pw_spec],
            out_specs=[blk_out, blk_out],
            out_shape=[
                jax.ShapeDtypeStruct((g * qb, self.n_m_pad, L + 1),
                                     jnp.float32),
                jax.ShapeDtypeStruct((g * qb, self.n_m_pad, L + 1),
                                     jnp.float32)],
            compiler_params=self._params,
            interpret=self._interp(),
        )(f_re, f_im, jnp.asarray(self._E_re), jnp.asarray(self._E_im),
          jnp.asarray(self._PW))
        return c_re[:rows, : self.n_m], c_im[:rows, : self.n_m]

    def forward(self, f):
        """f(..., θ, φ) complex → coefficients (..., 2L+1, L+1)."""
        lead = f.shape[:-2]
        rows = int(np.prod(lead)) if lead else 1
        fr = f.reshape((rows, self.n_theta, self.n_phi))
        c_re, c_im = self._forward_planes(
            fr.real.astype(jnp.float32), fr.imag.astype(jnp.float32))
        c = lax.complex(c_re, c_im).astype(self.sht.complex_dtype)
        return c.reshape(lead + (self.n_m, self.l_max + 1))

    # ------------------------------------------------------------- inverse
    def _inverse_planes(self, c_re, c_im):
        pad_m = self.n_m_pad - self.n_m
        if pad_m:
            z = jnp.zeros(c_re.shape[:1] + (pad_m,) + c_re.shape[2:],
                          c_re.dtype)
            c_re = jnp.concatenate([c_re, z], axis=1)
            c_im = jnp.concatenate([c_im, z], axis=1)
        (c_re, c_im), rows = self._pad_rows(c_re, c_im)
        g = c_re.shape[0] // self.q_block
        qb, nt, nph = self.q_block, self.n_theta, self.n_phi
        mb, L = self.m_blk, self.l_max
        kern = partial(_inv_kernel, nt, nph, mb)
        blk_in = pl.BlockSpec((qb, mb, L + 1), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
        p_spec = pl.BlockSpec((mb, L + 1, nt), lambda i, j: (j, 0, 0),
                              memory_space=pltpu.VMEM)
        i_spec = pl.BlockSpec((mb, nph), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        # m is the INNERMOST grid dim: both m-halves revisit the same output
        # block and accumulate (sequential TPU grid guarantees ordering)
        blk_out = pl.BlockSpec((qb, nt, nph), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        f_re, f_im = pl.pallas_call(
            kern,
            grid=(g, self.m_splits),
            in_specs=[blk_in, blk_in, p_spec, i_spec, i_spec],
            out_specs=[blk_out, blk_out],
            out_shape=[jax.ShapeDtypeStruct((g * qb, nt, nph), jnp.float32),
                       jax.ShapeDtypeStruct((g * qb, nt, nph), jnp.float32)],
            compiler_params=self._params,
            interpret=self._interp(),
        )(c_re, c_im, jnp.asarray(self._P_t),
          jnp.asarray(self._I_re), jnp.asarray(self._I_im))
        return f_re[:rows], f_im[:rows]

    def inverse(self, c):
        lead = c.shape[:-2]
        rows = int(np.prod(lead)) if lead else 1
        cr = c.reshape((rows, self.n_m, self.l_max + 1))
        f_re, f_im = self._inverse_planes(
            cr.real.astype(jnp.float32), cr.imag.astype(jnp.float32))
        f = lax.complex(f_re, f_im).astype(self.sht.complex_dtype)
        return f.reshape(lead + (self.n_theta, self.n_phi))


# ------------------------------------------------------- real-field variants

    # ------------------------------------------ real-field fast paths
    def forward_real(self, f):
        """Real-field analysis matching sht.forward_real: kernel computes
        m ≥ 0 rows; hermitian symmetry c_{l,-m} = (−1)^m conj(c_{l,m}) fills
        the negative rows on the small coefficient array."""
        import numpy as _np
        L = self.l_max
        lead = f.shape[:-2]
        rows = int(np.prod(lead)) if lead else 1
        fr = f.reshape((rows, self.n_theta, self.n_phi)).astype(jnp.float32)
        (fr,), nrows = self._pad_rows(fr)
        g = fr.shape[0] // self.q_block
        qb, nt, nph = self.q_block, self.n_theta, self.n_phi
        kern = partial(_fwd_real_kernel, nt, nph, self._mp_blk)
        blk_in = pl.BlockSpec((qb, nt, nph), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        e_spec = pl.BlockSpec((self._mp_blk, nph), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        pw_spec = pl.BlockSpec((self._mp_blk, nt, L + 1),
                               lambda i, j: (j, 0, 0),
                               memory_space=pltpu.VMEM)
        blk_out = pl.BlockSpec((qb, self._mp_blk, L + 1),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
        c_re, c_im = pl.pallas_call(
            kern,
            grid=(g, self.m_splits),
            in_specs=[blk_in, e_spec, e_spec, pw_spec],
            out_specs=[blk_out, blk_out],
            out_shape=[
                jax.ShapeDtypeStruct((g * qb, self._mp_pad, L + 1),
                                     jnp.float32),
                jax.ShapeDtypeStruct((g * qb, self._mp_pad, L + 1),
                                     jnp.float32)],
            compiler_params=self._params,
            interpret=self._interp(),
        )(fr, jnp.asarray(self._Ep_re), jnp.asarray(self._Ep_im),
          jnp.asarray(self._PWp))
        c_pos = lax.complex(c_re[:nrows, : L + 1], c_im[:nrows, : L + 1])
        signs = ((-1.0) ** _np.arange(1, L + 1))[::-1]
        c_neg = signs[:, None] * jnp.conj(c_pos[..., 1:, :])[..., ::-1, :]
        c = jnp.concatenate([c_neg, c_pos], axis=-2)
        return c.astype(self.sht.complex_dtype).reshape(
            lead + (self.n_m, L + 1))

    def inverse_real(self, c):
        """Real part of the synthesis (matches sht.inverse_real output)."""
        lead = c.shape[:-2]
        rows = int(np.prod(lead)) if lead else 1
        cr = c.reshape((rows, self.n_m, self.l_max + 1))
        c_re = cr.real.astype(jnp.float32)
        c_im = cr.imag.astype(jnp.float32)
        pad_m = self.n_m_pad - self.n_m
        if pad_m:
            z = jnp.zeros(c_re.shape[:1] + (pad_m,) + c_re.shape[2:],
                          c_re.dtype)
            c_re = jnp.concatenate([c_re, z], axis=1)
            c_im = jnp.concatenate([c_im, z], axis=1)
        (c_re, c_im), nrows = self._pad_rows(c_re, c_im)
        g = c_re.shape[0] // self.q_block
        qb, nt, nph = self.q_block, self.n_theta, self.n_phi
        mb, L = self.m_blk, self.l_max
        blk_in = pl.BlockSpec((qb, mb, L + 1), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
        p_spec = pl.BlockSpec((mb, L + 1, nt), lambda i, j: (j, 0, 0),
                              memory_space=pltpu.VMEM)
        i_spec = pl.BlockSpec((mb, nph), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        blk_out = pl.BlockSpec((qb, nt, nph), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)

        def kern_acc(cre_ref, cim_ref, p_ref, ire_ref, iim_ref, f_ref):
            j = pl.program_id(1)
            q_b = cre_ref.shape[0]
            c_re_ = cre_ref[:].transpose(1, 0, 2)
            c_im_ = cim_ref[:].transpose(1, 0, 2)
            p = p_ref[:]
            fm_re = _bmm(c_re_, p).transpose(1, 2, 0).reshape(
                q_b * nt, mb)
            fm_im = _bmm(c_im_, p).transpose(1, 2, 0).reshape(
                q_b * nt, mb)
            f = (_mm(fm_re, ire_ref[:]) - _mm(fm_im, iim_ref[:])).reshape(
                q_b, nt, nph)

            @pl.when(j == 0)
            def _():
                f_ref[:] = f

            @pl.when(j > 0)
            def _():
                f_ref[:] = f_ref[:] + f

        f = pl.pallas_call(
            kern_acc,
            grid=(g, self.m_splits),
            in_specs=[blk_in, blk_in, p_spec, i_spec, i_spec],
            out_specs=blk_out,
            out_shape=jax.ShapeDtypeStruct((g * qb, nt, nph), jnp.float32),
            compiler_params=self._params,
            interpret=self._interp(),
        )(c_re, c_im, jnp.asarray(self._P_t),
          jnp.asarray(self._I_re), jnp.asarray(self._I_im))
        out = f[:nrows].astype(self.sht.real_dtype)
        return out.reshape(lead + (self.n_theta, self.n_phi))

    def forward_real_abs2(self, psi):
        """Analysis of the intensity |ψ|² straight from the complex field ψ:
        the squaring happens in VMEM inside the kernel, so the real intensity
        grid is never materialized in HBM. Output identical to
        forward_real((ψ·ψ̄).real)."""
        import numpy as _np
        L = self.l_max
        lead = psi.shape[:-2]
        rows = int(np.prod(lead)) if lead else 1
        pr = psi.reshape((rows, self.n_theta, self.n_phi))
        f_re = pr.real.astype(jnp.float32)
        f_im = pr.imag.astype(jnp.float32)
        (f_re, f_im), nrows = self._pad_rows(f_re, f_im)
        g = f_re.shape[0] // self.q_block
        qb, nt, nph = self.q_block, self.n_theta, self.n_phi
        kern = partial(_fwd_abs2_kernel, nt, nph, self._mp_blk)
        blk_in = pl.BlockSpec((qb, nt, nph), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        e_spec = pl.BlockSpec((self._mp_blk, nph), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        pw_spec = pl.BlockSpec((self._mp_blk, nt, L + 1),
                               lambda i, j: (j, 0, 0),
                               memory_space=pltpu.VMEM)
        blk_out = pl.BlockSpec((qb, self._mp_blk, L + 1),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
        c_re, c_im = pl.pallas_call(
            kern,
            grid=(g, self.m_splits),
            in_specs=[blk_in, blk_in, e_spec, e_spec, pw_spec],
            out_specs=[blk_out, blk_out],
            out_shape=[
                jax.ShapeDtypeStruct((g * qb, self._mp_pad, L + 1),
                                     jnp.float32),
                jax.ShapeDtypeStruct((g * qb, self._mp_pad, L + 1),
                                     jnp.float32)],
            compiler_params=self._params,
            interpret=self._interp(),
        )(f_re, f_im, jnp.asarray(self._Ep_re), jnp.asarray(self._Ep_im),
          jnp.asarray(self._PWp))
        c_pos = lax.complex(c_re[:nrows, : L + 1], c_im[:nrows, : L + 1])
        signs = ((-1.0) ** _np.arange(1, L + 1))[::-1]
        c_neg = signs[:, None] * jnp.conj(c_pos[..., 1:, :])[..., ::-1, :]
        c = jnp.concatenate([c_neg, c_pos], axis=-2)
        return c.astype(self.sht.complex_dtype).reshape(
            lead + (self.n_m, L + 1))

def _fwd_abs2_kernel(n_theta, n_phi, m_blk,
                     pre_ref, pim_ref, ere_ref, eim_ref, pw_ref,
                     cre_ref, cim_ref):
    """Analysis of |ψ|² computed in VMEM from the ψ planes: the intensity
    grid array never exists in HBM (one 67 MB write + one read per MTIP
    iteration eliminated — the iteration is traffic-bound,
    docs/performance.md)."""
    q_b = pre_ref.shape[0]
    pr = pre_ref[:].reshape(q_b * n_theta, n_phi)
    pi = pim_ref[:].reshape(q_b * n_theta, n_phi)
    a = pr * pr + pi * pi
    fm_re = _mmT(a, ere_ref[:])
    fm_im = _mmT(a, eim_ref[:])
    fm_re = fm_re.reshape(q_b, n_theta, m_blk).transpose(2, 0, 1)
    fm_im = fm_im.reshape(q_b, n_theta, m_blk).transpose(2, 0, 1)
    pw = pw_ref[:]
    cre_ref[:] = _bmm(fm_re, pw).transpose(1, 0, 2)
    cim_ref[:] = _bmm(fm_im, pw).transpose(1, 0, 2)


def _fwd_real_kernel(n_theta, n_phi, m_blk,
                     a_ref, ere_ref, eim_ref, pw_ref, cre_ref, cim_ref):
    """Real-input analysis for the non-negative m rows (hermitian symmetry
    fills m<0 outside): one real input plane halves the DFT matmuls."""
    q_b = a_ref.shape[0]
    a = a_ref[:].reshape(q_b * n_theta, n_phi)
    fm_re = _mmT(a, ere_ref[:])                     # (q_b·θ, m_blk)
    fm_im = _mmT(a, eim_ref[:])
    fm_re = fm_re.reshape(q_b, n_theta, m_blk).transpose(2, 0, 1)
    fm_im = fm_im.reshape(q_b, n_theta, m_blk).transpose(2, 0, 1)
    pw = pw_ref[:]
    cre_ref[:] = _bmm(fm_re, pw).transpose(1, 0, 2)
    cim_ref[:] = _bmm(fm_im, pw).transpose(1, 0, 2)


