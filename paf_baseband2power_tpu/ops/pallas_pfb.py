"""Fused Pallas PFB spectrometer: FIR + DFT + detect + integrate, one pass.

This is the TPU-native realization of the reference's planned cuFFT fine
channelizer (``/root/reference/makefile:27``, ``kernel.cuh:7``) at the
hardware's speed of light for the op chain. The XLA sliding-DFT
formulation (``ops/pfb.py``) materializes every stage — rows, FIR fold,
channelizer output, detect epilogue are ~40 GB of HBM traffic per 2.8 GB
block (~100 ms on v5e). Here one corner-turn relayout feeds one Pallas
kernel that streams the series once and keeps everything else in VMEM
(46 ms per block, 19x real time, measured r2):

* **Interleaved corner turn (XLA)**: series rows stay int16 with re/im
  interleaved on lanes — ``(S, nrow, 256) int16``, one row = one frame's
  128 complex samples for one of S = chunk*chan*pol = 672 series. This
  is the cheapest relayout XLA will produce from the wire layout
  (measured from the 2-D device block: interleaved-i16 45 ms vs 87 for
  int32-packed and 82 for f32 [re|im] rows — the variants that split or
  widen re/im pay an extra tiling pass). A VPU shuffle kernel pencils
  out no faster (stride-14 lane decimation costs ~14 select+rolls per
  output register). r3 probed consuming the WIRE layout directly in the
  kernel, which would delete the relayout pass entirely; every route is
  blocked at the Mosaic compiler level on this toolchain (measured):
  lane-split value reshape ``(tdf,3584)->(tdf,128,28)`` = "unsupported
  shape cast"; strided lane slice ``x[:, c::28]`` = vector
  extract_strided_slice verification error; int16->int32 pair bitcast =
  "changing bitwidths not supported". The ~45 ms corner turn therefore
  remains the measured floor for all fine-channel modes.
* **The matmul absorbs the de-interleave**: permuting the ROWS of the
  DFT operator (row 2j := DFT-re row j, row 2j+1 := DFT-im row j) makes
  the interleaved layout directly contractible — zero unpack ops; the
  FIR coefficient vectors are just lane-pair-repeated. One int16->f32
  convert is the only per-element prep.
* **FIR stencil carry**: windows straddle row tiles, so a VMEM scratch
  holds the previous tile's trailing ``ntap-1`` rows; the FIR fold is
  ``ntap`` shifted row-scaled adds (VPU).
* **DFT on the MXU, manual bf16x3**: one ``(R, 256) @ (256, 256)``
  real-pair matmul per tile. Mosaic's dot supports only DEFAULT (one
  bf16 pass, 8e-4 — too lossy) or HIGHEST (bf16x6, 2x the MACs needed),
  so the kernel splits operands hi/lo and takes three DEFAULT dots —
  exactly XLA's HIGH: measured 3.5e-6 max relative error vs the float64
  golden, and it halves MXU time vs HIGHEST (56 -> 46 ms/block).
* **Detect + integrate in VMEM**: ``|y|^2`` folds into an (8, 128)
  accumulator per series; output HBM traffic is 4 KB per series.
* **History in-kernel**: the overlap-save carry rows load into the
  stencil buffer at ``t == 0``, so the ``ntap-1`` boundary windows come
  from the same kernel — no separate boundary pass (the XLA path needs
  one). Without history those window rows are masked, matching the
  golden one-shot behavior.

Requires ``nfft == 128`` (windows tile frame rows exactly — the
production fine-channelizer configuration). Other sizes use
``ops/pfb.py``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import NCHAN_CHK, NPOL_SAMP, NSAMP_DF
from .pfb import (
    _SLIDE_LANES,
    history_as_complex,  # noqa: F401  (re-export: fused carries are rows-i16)
    pfb_sliding_fir_dft,
)

_L = _SLIDE_LANES


def _rows_i16(block: jax.Array) -> jax.Array:
    """6-D int16 block -> interleaved series rows ``(S, nrow, 256) int16``.

    Lane 2j is sample j's re, lane 2j+1 its im — the (128, 2) minor dims
    of the transpose collapsed, which XLA relays in one pass.
    """
    y = block.transpose(1, 3, 4, 0, 2, 5)       # (nchk,7,pol,ndf,128,2)
    s = y.shape
    return y.reshape(s[0] * s[1] * s[2], s[3], s[4] * s[5])


def _history_hrows(history: jax.Array, nseries: int, npol: int, ntap: int,
                   nfft: int) -> jax.Array:
    """Either carry format -> f32 ``(nseries, ntap-1, 2*nfft)`` kernel rows.

    The fused kernels RETURN the carry as raw int16 series rows
    ``(nseries, halo_ndf, 256)`` — a pure slice of their own input
    (measured: producing the canonical complex carry instead costs
    ~11 ms/block at nfft=1024 on v5e, a strided re/im split + re-
    interleave round trip that dwarfs the 16 MB it moves; the raw slice
    is free). They ACCEPT that form or the canonical complex carry
    (``pfb_history``) interchangeably — both reduce to the same
    interleaved f32 rows here.
    """
    if history.dtype == jnp.int16:
        return history.reshape(nseries, ntap - 1,
                               2 * nfft).astype(jnp.float32)
    nchk = nseries // (NCHAN_CHK * npol)
    h = history.reshape(nchk, NCHAN_CHK, npol, ntap - 1, nfft)
    hrows = jnp.stack([jnp.real(h), jnp.imag(h)], axis=-1)
    return hrows.reshape(nseries, ntap - 1, 2 * nfft)




def _interleaved_ops(nfft: int, ntap: int, window: str):
    """Row-permute the factored operators for interleaved-lane input."""
    cvecs, fmat = pfb_sliding_fir_dft(nfft, ntap, window)
    cv = np.repeat(cvecs[:, :_L], 2, axis=1)            # (ntap, 2L)
    fi = np.empty_like(fmat)
    fi[0::2] = fmat[:_L]                                # re rows
    fi[1::2] = fmat[_L:]                                # im rows
    return cv, fi


def _fused_kernel(ntap: int, has_history: bool):
    """Kernel body: convert -> FIR stencil fold -> bf16x3 DFT -> |y|^2."""

    def kernel(x_ref, fh_ref, fl_ref, h_ref, cv_ref, o_ref, buf):
        t = pl.program_id(1)
        R = x_ref.shape[1]

        @pl.when(t == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
            buf[0:ntap - 1] = h_ref[0, 0:ntap - 1]

        buf[ntap - 1:ntap - 1 + R] = x_ref[0].astype(jnp.float32)
        z = cv_ref[0:1] * buf[0:R]
        for k in range(1, ntap):
            z = z + cv_ref[k:k + 1] * buf[k:k + R]
        zhi = z.astype(jnp.bfloat16)
        zlo = (z - zhi.astype(jnp.float32)).astype(jnp.bfloat16)

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        y = dot(zhi, fh_ref[:]) + dot(zhi, fl_ref[:]) + dot(zlo, fh_ref[:])
        p = y * y
        pw = p[:, 0:_L] + p[:, _L:2 * _L]               # |y|^2, (R, 128)
        if not has_history:
            # one-shot: the first ntap-1 windows read zero history rows —
            # they do not exist in the golden model, mask them out
            row = jax.lax.broadcasted_iota(jnp.int32, pw.shape, 0)
            first = jnp.where(t == 0, ntap - 1, 0)
            pw = jnp.where(row >= first, pw, 0.0)
        acc = jnp.sum(pw.reshape(R // 8, 8, _L), axis=0)
        o_ref[0] += acc
        # carry this tile's trailing rows into the next tile's windows
        buf[0:ntap - 1] = buf[R:R + ntap - 1]

    return kernel


def _pick_row_tile(nrow: int) -> int:
    r = 1024
    while r > 8 and nrow % r:
        r //= 2
    if nrow % r:
        raise ValueError(f"nrow={nrow} must be a multiple of 8")
    return r


@functools.partial(jax.jit, static_argnames=("nfft", "ntap", "window",
                                             "mean", "shift",
                                             "return_history", "interpret"))
def pfb_power_fused(block: jax.Array, nfft: int = _L, ntap: int = 4,
                    window: str = "hamming", mean: bool = False,
                    shift: bool = True,
                    history: jax.Array | None = None,
                    return_history: bool = False,
                    interpret: bool = False):
    """Fused-kernel PFB spectrometer with the ``pfb.pfb_power`` contract.

    ``block``: canonical 6-D int16 block or the 2-D device layout.
    Output: ``(nchan * nfft,) float32`` power (+ the next block's
    overlap-save carry when ``return_history``).
    """
    if nfft != _L:
        raise ValueError(f"fused PFB requires nfft == {_L}")
    if not 2 <= ntap <= 8:
        raise ValueError("fused PFB supports 2 <= ntap <= 8")
    if block.ndim == 2:
        ndf, lanes = block.shape
        block = block.reshape(ndf, lanes // (NSAMP_DF * NCHAN_CHK *
                                             NPOL_SAMP * 2),
                              NSAMP_DF, NCHAN_CHK, NPOL_SAMP, 2)
    ndf, nchk = block.shape[0], block.shape[1]
    npol = block.shape[4]
    nseries = nchk * NCHAN_CHK * npol
    nrow = ndf                                  # 128 samples per frame row
    R = _pick_row_tile(nrow)

    rows = _rows_i16(block)
    cvecs, fmat = _interleaved_ops(nfft, ntap, window)
    f32 = jnp.asarray(fmat)
    fhi = f32.astype(jnp.bfloat16)
    flo = (f32 - fhi.astype(jnp.float32)).astype(jnp.bfloat16)

    if history is not None:
        hrows = _history_hrows(history, nseries, npol, ntap, nfft)
    else:
        hrows = jnp.zeros((nseries, ntap - 1, 2 * _L), jnp.float32)
    # pad carry rows to a full 8-sublane block
    hpad = jnp.pad(hrows, ((0, 0), (0, 8 - (ntap - 1)), (0, 0)))
    cvpad = jnp.asarray(np.pad(cvecs, ((0, 8 - ntap), (0, 0))))

    part = pl.pallas_call(
        _fused_kernel(ntap, history is not None),
        grid=(nseries, nrow // R),
        in_specs=[
            pl.BlockSpec((1, R, 2 * _L), lambda s, t: (s, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * _L, 2 * _L), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * _L, 2 * _L), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 2 * _L), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 2 * _L), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, _L), lambda s, t: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nseries, 8, _L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R + 8, 2 * _L), jnp.float32)],
        interpret=interpret,
    )(rows, fhi, flo, hpad, cvpad)

    power = part.sum(axis=1).reshape(nchk, NCHAN_CHK, npol, nfft).sum(axis=2)
    nwin = nrow - (ntap - 1) + (ntap - 1 if history is not None else 0)
    if mean:
        power = power / (npol * nwin)
    if shift:
        power = jnp.fft.fftshift(power, axes=-1)
    power = power.reshape(-1)
    if return_history:
        # raw rows-i16 carry: a pure slice of the kernel's own input (the
        # canonical complex form costs a strided split + re-interleave;
        # see _history_hrows). (ntap-1)*nfft is frame-aligned for every
        # supported nfft (multiples of NSAMP_DF).
        halo_ndf = (ntap - 1) * nfft // NSAMP_DF
        return power, rows[:, -halo_ndf:, :]
    return power


def make_streaming_pfb_fused(nfft: int = _L, ntap: int = 4, **kw):
    """``step(block, history) -> (power, new_history)`` on the fused path."""

    @jax.jit
    def step(block, history):
        return pfb_power_fused(block, nfft, ntap, history=history,
                               return_history=True, **kw)

    return step


# ==========================================================================
# Generalized fused spectrometer: nfft in {128, 256, 512, 1024}, waterfall
# (nout spectra per block), fine-channel Stokes — one kernel family.
# ==========================================================================
#
# The nfft=128 kernel above relies on windows tiling frame rows exactly.
# For larger nfft a window is N1 = nfft/128 consecutive frame rows — a free
# reshape of the same interleaved corner-turn — but a direct
# (2*nfft, 2*nfft) DFT operator is both VMEM-hostile (16.8 MB at
# nfft=1024 vs ~16 MB/core) and MXU-wasteful (O(nfft) MACs/sample).
# Instead the DFT is done Cooley-Tukey with the split n = 128*n1 + n2:
#
#     X[N1*k2 + k1] = sum_n2 ( A_k1[n2] * W_N^(n2*k1) ) * W_128^(n2*k2)
#     A_k1[n2]      = sum_n1 x_n1[n2] * W_N1^(n1*k1)
#
# * stage A is an N1-point DFT *across* the window's N1 contiguous
#   128-sample chunks — elementwise over n2, so it is pure lane-aligned
#   VPU work on the interleaved layout (complex scalar multiply = one
#   pair-swap roll + two scaled adds; W_N1 factors are compile-time
#   scalars, unrolled with exact-zero terms skipped);
# * the twiddle W_N^(n2*k1) folds into stage B's operator, giving N1
#   distinct (256, 256) real-pair matmuls — 2*nfft MACs per complex
#   sample for EVERY nfft, the same MXU cost/sample as the nfft=128
#   kernel, with operators totalling N1*256KB (2 MB at nfft=1024).
#
# ROOFLINE (r4, measured v5e): the binding resource is the MXU. Stage B
# costs 2*256*256 real MACs per window per pol in the [re|im] pair
# formulation (4 real mults per complex sample of the 128-point DFT),
# tripled by the bf16x3 split: at full geometry (5.5M windows/block)
# that is ~1.08e12 MACs = ~11 ms of v5e MXU time (98.5 T MACs/s) for
# EVERY nfft (the Cooley-Tukey factoring holds MACs/sample constant).
# Measured streaming: 13.5 ms at nfft=128 (~81% MXU util), ~22 ms at
# nfft=1024 (stage A's n1^2-term VPU unroll becomes the second
# resource). Attacks measured r4, all dead ends:
#   * 3-real-mult Karatsuba complex DFT (planar re/im halves, 3x
#     (128,128) dots = 25% fewer MACs): 13.3 ms at R=2048 vs 14.5
#     production same-day — the MAC cut is eaten by lower MXU efficiency
#     of K=128 dots and 3x the bf16 splits; would also force a planar
#     host corner-turn format (benchmarks/probe_karatsuba.py).
#   * Row-tile sweep R in {128..2048} (cap x2/x4/x8): all within ~4% of
#     the production cap, inside tunnel variance.
#   * Radix-2 DIF FFT for stage A (O(n1 log n1) butterflies vs the
#     direct n1^2-term sum, bit-reversal absorbed into the k1->operator
#     mapping): measured perf-neutral at nfft 256/512/1024 (18.1/19.6/
#     23.1 ms vs direct 18.7/18.5/23.1) — stage A's VPU work is not the
#     binding resource of the nfft>128 delta either; reverted to the
#     simpler direct form.
#   * Dropping the bf16x3 third dot: zlo@fh carries ~2^-9 of z — cutting
#     it reverts to the measured-too-lossy 8e-4 DEFAULT error class.
# The ~2.5 ms over the MXU floor at nfft=128 is the VPU/convert/FIR
# stage and DMA imperfection; closer approach needs fewer MACs, which
# needs int8 operands the int16 samples cannot express in one plane.
#
# nfft>128 DELTA, RESOLVED (r5, benchmarks/probe_wide_reshape.py): the
# 13.2 -> 23 ms gap at nfft=1024 decomposes by direct kernel ablation:
#   * in-VMEM narrow->wide window reshape (the stencil fill's
#     (R*n1,256)->(R,n1*256) regroup): ~2.5 ms. Isolated two ways: a
#     micro kernel (narrow reduce 4.0 ms vs widen-then-reduce 5.9 at
#     identical bytes) and a "planes" kernel variant consuming an
#     (nseries, n1, nrow, 256) HBM layout where chunks[m] is a direct
#     row slice (production 22.8 -> planes 20.3 ms).
#   * stage-A N1-point DFT: ~7.9 ms of VPU work (scaled-add terms
#     ~5.7, interleaved-roll/imag terms ~2.2). With stage A ablated to
#     a passthrough the planes kernel runs 12.4 ms = exactly the
#     nfft=128 level, so stage A + widening IS the whole delta.
#   * stage-A cost is NOT raw ALU volume: a radix-2^3 DIF on the
#     narrow planes chunks (~62 vector ops vs the direct form's ~136)
#     recovers only 1.3 ms (20.3 -> 19.0, golden-parity clean) —
#     vreg/scheduling-bound, consistent with the r4 wide-form radix-2
#     neutrality. R sweep flat (M-size of the dots irrelevant).
# Ceiling within this factorization: ~19 ms at nfft=1024 via a planes
# capture layout + fft8 stage A (-17%), at the cost of an nfft-coupled
# ring layout; eliminating stage A entirely requires growing the
# stage-B operator (2*L2 MACs/sample doubles the 11 ms MXU floor).
# Not shipped: the coupling isn't worth -17% on one mode; the probe
# harness records the recipe if a deployment wants it.
#
# Output lanes per window come out (k1, k2)-ordered; true fine channel
# k = N1*k2 + k1 is restored by a tiny (N1, 128) transpose in the XLA
# epilogue. Waterfall grouping rides the grid: output spectrum
# g = end_row // (nrow/nout), so out_specs map time tile t to group
# t // tpg and the accumulator is zeroed on each group's first tile
# (the same end-row convention as ops.pfb.pfb_spectra — two blocks with
# history reproduce the one-shot golden group by group). Stokes mode
# processes the two polarization series of a (chunk, channel) pair in one
# kernel instance (they are adjacent rows of the corner turn) and forms
# I/Q/U/V from the per-window channelizer outputs before the time fold.

import math

FUSED_NFFTS = (128, 256, 512, 1024)


def _spectra_ops(nfft: int, ntap: int, window: str):
    """FIR lane vectors + per-k1 twiddle-folded DFT operators.

    Returns ``(cvecs (ntap, 2*nfft), mats (N1, 256, 256)) float32`` for
    interleaved-lane input rows and ``[re(128) | im(128)]`` output columns.
    """
    from .pfb import pfb_coeffs

    n1 = nfft // _L
    c = pfb_coeffs(nfft, ntap, window, dtype=np.float64)   # (ntap, nfft)
    cv = np.repeat(c, 2, axis=1)                           # interleaved
    n2 = np.arange(_L)
    k2 = np.arange(_L)
    base = np.exp(-2j * np.pi * np.outer(n2, k2) / _L)     # (n2, k2)
    mats = np.zeros((n1, 2 * _L, 2 * _L), np.float64)
    for k1 in range(n1):
        tw = np.exp(-2j * np.pi * n2 * k1 / nfft)          # W_N^(n2*k1)
        m = tw[:, None] * base
        mats[k1, 0::2, :_L] = m.real
        mats[k1, 1::2, :_L] = -m.imag
        mats[k1, 0::2, _L:] = m.imag
        mats[k1, 1::2, _L:] = m.real
    return cv.astype(np.float32), mats.astype(np.float32)


def _spectra_kernel(ntap: int, n1: int, stokes: bool, has_history: bool,
                    tpg: int, R: int, ngrp: int = 1,
                    fold_rows: bool = False):
    """Kernel body: FIR stencil -> stage-A N1-DFT -> N1 MXU DFTs -> detect
    (power or Stokes) -> window-group accumulate. ``R``: windows per tile
    (the input tile is ``R*n1`` narrow 256-lane rows). ``ngrp``: whole
    output spectra per tile (> 1 when groups are smaller than an MXU-sized
    tile — the tile then stores ``ngrp`` group accumulators at once and
    ``tpg`` is 1). ``fold_rows`` (requires ``ngrp >= 8``): fully fold each
    group to ONE output row and store ``(ngrp, ns*nfft)`` — at thousands of
    spectra per block the 8-row partials otherwise rival the int16 input
    stream in HBM traffic."""
    npol = 2 if stokes else 1

    def kernel(x_ref, fh_ref, fl_ref, h_ref, cv_ref, o_ref, buf):
        t = pl.program_id(1)

        if not fold_rows:
            @pl.when(t % tpg == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        def pol_rows(ref, p):
            return ref[0, p] if stokes else ref[0]

        # channelize each polarization: y_pol[p][k1] = (R, 256) [re|im].
        # scratch is flat 2-D; polarization p's stencil rows live at
        # [p*(R+8), p*(R+8)+R+ntap-1)
        y_pol = []
        for p in range(npol):
            base = p * (R + 8)

            @pl.when(t == 0)
            def _(base=base, p=p):
                buf[base:base + ntap - 1] = pol_rows(h_ref, p)[0:ntap - 1]

            # HBM rows stay narrow (ndf, 256) — the only corner-turn layout
            # XLA produces without a catastrophic padded relayout (a wide
            # (nrow, 2*nfft) HBM array measured a 180 GB copy at full
            # geometry). The widening to N1-frame window rows is a free
            # in-VMEM value reshape here.
            xw = pol_rows(x_ref, p).astype(jnp.float32)
            buf[base + ntap - 1:base + ntap - 1 + R] = \
                xw.reshape(R, xw.shape[0] // R * xw.shape[1])
            z = cv_ref[0:1] * buf[base:base + R]
            for k in range(1, ntap):
                z = z + cv_ref[k:k + 1] * buf[base + k:base + k + R]
            if not has_history:
                # one-shot: windows ending before row ntap-1 don't exist
                row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
                first = jnp.where(t == 0, ntap - 1, 0)
                z = jnp.where(row >= first, z, 0.0)

            def bf3(a, k1):
                ahi = a.astype(jnp.bfloat16)
                alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
                return (dot(ahi, fh_ref[k1]) + dot(ahi, fl_ref[k1])
                        + dot(alo, fh_ref[k1]))

            if n1 == 1:
                y_pol.append([bf3(z, 0)])
                continue
            chunks = [z[:, 2 * _L * m:2 * _L * (m + 1)] for m in range(n1)]
            lane = jax.lax.broadcasted_iota(jnp.int32, chunks[0].shape, 1)
            even = (lane % 2) == 0
            alt = jnp.where(even, -1.0, 1.0)
            swaps = [alt * jnp.where(even, pltpu.roll(c, 2 * _L - 1, 1),
                                     pltpu.roll(c, 1, 1))
                     for c in chunks]
            ys = []
            for k1 in range(n1):
                acc = None
                for m in range(n1):
                    ang = -2.0 * math.pi * m * k1 / n1
                    wr, wi = math.cos(ang), math.sin(ang)
                    term = None
                    if abs(wr) > 1e-12:
                        term = chunks[m] if abs(wr - 1.0) < 1e-12 \
                            else wr * chunks[m]
                    if abs(wi) > 1e-12:
                        t2 = swaps[m] if abs(wi - 1.0) < 1e-12 \
                            else wi * swaps[m]
                        term = t2 if term is None else term + t2
                    acc = term if acc is None else acc + term
                ys.append(bf3(acc, k1))
            y_pol.append(ys)

        if fold_rows:
            def store(q, s, k1):
                full = jnp.sum(q.reshape(ngrp, R // ngrp, _L), axis=1)
                o_ref[0, :, pl.ds((s * n1 + k1) * _L, _L)] = full
        else:
            def store(q, s, k1):
                # (R, L) windows -> per-group (8, L) partials: rows fold
                # within each of the tile's ngrp whole groups
                part = jnp.sum(q.reshape(ngrp, R // (8 * ngrp), 8, _L),
                               axis=1)
                o_ref[0, :, 8 * s:8 * (s + 1), pl.ds(k1 * _L, _L)] += part

        for k1 in range(n1):
            if stokes:
                yx, yy = y_pol[0][k1], y_pol[1][k1]
                xr, xi = yx[:, 0:_L], yx[:, _L:2 * _L]
                yr, yi = yy[:, 0:_L], yy[:, _L:2 * _L]
                pxx = xr * xr + xi * xi
                pyy = yr * yr + yi * yi
                re = xr * yr + xi * yi                     # Re(x y*)
                im = xi * yr - xr * yi                     # Im(x y*)
                store(pxx + pyy, 0, k1)                    # I
                store(pxx - pyy, 1, k1)                    # Q
                store(2 * re, 2, k1)                       # U
                store(2 * im, 3, k1)                       # V
            else:
                y = y_pol[0][k1]
                p = y * y
                store(p[:, 0:_L] + p[:, _L:2 * _L], 0, k1)

        for p in range(npol):
            base = p * (R + 8)
            buf[base:base + ntap - 1] = buf[base + R:base + R + ntap - 1]

    return kernel


def _pick_spectra_tile(wpg: int, nout: int, nfft: int,
                       npol: int) -> tuple[int, int, int]:
    """Row tile for the spectra kernel: ``(R windows/tile, tiles/group,
    groups/tile)``.

    The cap budgets ~1 MB for the stencil scratch per pol — the kernel's
    live temporaries (z, the per-chunk stage-A views/swaps, bf16 splits,
    dot outputs) are all (R, lanes)-sized too and Mosaic stack-allocates
    them against the 16 MB scoped-vmem limit (R=4096 at nfft=128 measured
    21.8 MB on v5e — OOM; R<=1024 compiles with headroom). Large groups
    split into ``tpg`` tiles accumulating into one spectrum; groups
    smaller than the cap pack ``ngrp`` whole spectra per tile instead of
    shrinking R (R=16 tiles measured 4x slower — sub-MXU matmuls)."""
    cap = max(8, 2 ** 20 // (npol * nfft * 8))
    if wpg >= cap:
        r = 8
        while r * 2 <= cap and wpg % (r * 2) == 0:
            r *= 2
        return r, wpg // r, 1
    ngrp = 1
    while ngrp * 2 * wpg <= cap and nout % (ngrp * 2) == 0:
        ngrp *= 2
    return ngrp * wpg, 1, ngrp


@functools.partial(jax.jit, static_argnames=("nfft", "ntap", "window",
                                             "nout", "stokes", "mean",
                                             "shift", "return_history",
                                             "layout", "interpret"))
def pfb_spectra_fused(block: jax.Array, nfft: int = _L, ntap: int = 4,
                      window: str = "hamming", nout: int = 1,
                      stokes: bool = False, mean: bool = False,
                      shift: bool = True,
                      history: jax.Array | None = None,
                      return_history: bool = False,
                      layout: str = "wire",
                      interpret: bool = False):
    """Fused composed spectrometer with the ``pfb.pfb_spectra`` contract.

    ``block``: canonical 6-D int16 block or the 2-D device layout
    (``layout="wire"``, default), or a host-corner-turned series-row
    block — ``(nseries, ndf, 256)`` int16 — from the capture engine's
    ``device_layout`` mode (``layout="rows"``), which skips the ~45 ms
    on-device corner-turn relayout entirely. Put rows blocks on device
    3-D: a 2-D ``(nseries, ndf*256)`` flattening is accepted, but its
    device tiling differs, so the in-jit reshape materializes a full
    relayout copy (measured +8-9 ms/block at full geometry on v5e —
    exactly the gap between the r3 artifact's "isolated" and production
    rows numbers).
    Output: ``(nout, nchan*nfft)`` float32 waterfall, or with ``stokes``
    ``(nout, 4, nchan*nfft)`` I/Q/U/V (+ the overlap-save carry when
    ``return_history``). ``nout=1, stokes=False`` reproduces
    ``pfb_power_fused`` (kept: its single-operator body edges this one by
    a few percent at nfft=128).
    """
    if nfft not in FUSED_NFFTS:
        raise ValueError(f"fused spectra support nfft in {FUSED_NFFTS}")
    if not 2 <= ntap <= 8:
        raise ValueError("fused spectra support 2 <= ntap <= 8")
    if layout == "rows":
        if block.ndim == 2:
            s_rows, cols = block.shape
            if cols % (2 * _L):
                raise ValueError(
                    f"rows layout needs {2 * _L}-lane frame segments per "
                    f"series row, got {cols} columns — is this a wire-"
                    "order block passed as layout='rows'?")
            block = block.reshape(s_rows, cols // (2 * _L), 2 * _L)
        nseries_r, ndf, _ = block.shape
        if nseries_r % (NCHAN_CHK * NPOL_SAMP):
            raise ValueError(
                f"rows layout needs nseries divisible by "
                f"{NCHAN_CHK * NPOL_SAMP} (chan*pol per chunk), got "
                f"{nseries_r} — is this a wire-order block passed as "
                "layout='rows'?")
        nchk = nseries_r // (NCHAN_CHK * NPOL_SAMP)
        npol = NPOL_SAMP
    elif layout == "wire":
        if block.ndim == 2:
            ndf, lanes = block.shape
            block = block.reshape(ndf, lanes // (NSAMP_DF * NCHAN_CHK *
                                                 NPOL_SAMP * 2),
                                  NSAMP_DF, NCHAN_CHK, NPOL_SAMP, 2)
        ndf, nchk = block.shape[0], block.shape[1]
        npol = block.shape[4]
    else:
        raise ValueError(f"unknown layout '{layout}'")
    n1 = nfft // _L
    if ndf % n1:
        raise ValueError(f"ndf={ndf} must be a multiple of nfft/128={n1}")
    nrow = ndf // n1                        # window rows per series
    if nrow % nout:
        raise ValueError(f"nout={nout} must divide {nrow} window rows")
    wpg = nrow // nout
    if wpg % 8 or wpg < max(8, ntap - 1):
        raise ValueError(
            f"windows per spectrum {wpg} must be a multiple of 8 and "
            f">= ntap-1={ntap - 1}")
    if stokes and npol != 2:
        raise ValueError("Stokes needs 2 polarizations")
    nseries = nchk * NCHAN_CHK * npol
    R, tpg, ngrp = _pick_spectra_tile(wpg, nout, nfft, 2 if stokes else 1)

    # (S, ndf, 256) interleaved series rows: pre-turned by the host
    # (layout="rows") or corner-turned here by XLA
    rows = block if layout == "rows" else _rows_i16(block)
    cvecs, mats = _spectra_ops(nfft, ntap, window)
    f32 = jnp.asarray(mats)
    fhi = f32.astype(jnp.bfloat16)
    flo = (f32 - fhi.astype(jnp.float32)).astype(jnp.bfloat16)

    if history is not None:
        hrows = _history_hrows(history, nseries, npol, ntap, nfft)
    else:
        hrows = jnp.zeros((nseries, ntap - 1, 2 * nfft), jnp.float32)
    hpad = jnp.pad(hrows, ((0, 0), (0, 8 - (ntap - 1)), (0, 0)))
    cvpad = jnp.asarray(np.pad(cvecs, ((0, 8 - ntap), (0, 0))))

    ns = 4 if stokes else 1
    fold_rows = ngrp >= 8
    kernel = _spectra_kernel(ntap, n1, stokes, history is not None, tpg, R,
                             ngrp, fold_rows)
    if stokes:
        npair = nseries // 2
        grid = (npair, nrow // R)
        in_specs = [
            pl.BlockSpec((1, 2, R * n1, 2 * _L), lambda s, t: (s, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, 2 * _L, 2 * _L), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, 2 * _L, 2 * _L), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 8, 2 * nfft), lambda s, t: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 2 * nfft), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = (rows.reshape(npair, 2, ndf, 2 * _L), fhi, flo,
                    hpad.reshape(npair, 2, 8, 2 * nfft), cvpad)
        scratch = pltpu.VMEM((2 * (R + 8), 2 * nfft), jnp.float32)
        lead = npair
    else:
        grid = (nseries, nrow // R)
        in_specs = [
            pl.BlockSpec((1, R * n1, 2 * _L), lambda s, t: (s, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, 2 * _L, 2 * _L), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, 2 * _L, 2 * _L), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 2 * nfft), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 2 * nfft), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = (rows, fhi, flo, hpad, cvpad)
        scratch = pltpu.VMEM((R + 8, 2 * nfft), jnp.float32)
        lead = nseries

    if fold_rows:
        out_specs = pl.BlockSpec((1, ngrp, ns * nfft),
                                 lambda s, t: (s, t, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((lead, nout, ns * nfft),
                                         jnp.float32)
    else:
        out_specs = pl.BlockSpec((1, ngrp, 8 * ns, nfft),
                                 lambda s, t, tpg=tpg: (s, t // tpg, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((lead, nout, 8 * ns, nfft),
                                         jnp.float32)
    part = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[scratch],
        interpret=interpret,
    )(*operands)

    if fold_rows:
        q = part.reshape(lead, nout, ns, nfft)
    else:
        q = part.reshape(lead, nout, ns, 8, nfft).sum(axis=3)
    if n1 > 1:
        # lanes come out (k1, k2)-ordered; true fine channel k = N1*k2+k1
        q = q.reshape(lead, nout, ns, n1, _L).swapaxes(-1, -2)
        q = q.reshape(lead, nout, ns, nfft)
    if stokes:
        out = q.reshape(nchk, NCHAN_CHK, nout, 4, nfft)
        out = out.transpose(2, 3, 0, 1, 4)            # (nout,4,chk,chan,k)
    else:
        out = q.reshape(nchk, NCHAN_CHK, npol, nout, nfft).sum(axis=2)
        out = out.transpose(2, 0, 1, 3)               # (nout,chk,chan,k)
    if mean:
        nwin_g = jnp.full((nout,), float(wpg))
        if history is None:
            nwin_g = nwin_g.at[0].add(-(ntap - 1))
        # wpg >= 8 > ntap-1 is validated above, so this clamp is inert
        # here; kept identical to the XLA path's 0-window guard
        nwin_g = jnp.maximum(nwin_g, 1.0)
        denom = nwin_g * (1 if stokes else npol)
        shape = (nout,) + (1,) * (out.ndim - 1)
        out = out / denom.reshape(shape)
    if shift:
        out = jnp.fft.fftshift(out, axes=-1)
    out = out.reshape((nout, 4, -1) if stokes else (nout, -1))
    if return_history:
        # raw rows-i16 carry: a pure slice of the (possibly host-turned)
        # series rows already feeding the kernel. Producing the canonical
        # complex carry here measured +10.9 ms/block at nfft=1024 on v5e
        # (strided re/im split + re-interleave of a tiny 16 MB tail); the
        # slice is free and _history_hrows accepts both formats.
        halo_ndf = (ntap - 1) * nfft // NSAMP_DF
        return out, rows[:, -halo_ndf:, :]
    return out


def make_streaming_spectra_fused(nfft: int = _L, ntap: int = 4,
                                 nout: int = 1, stokes: bool = False, **kw):
    """``step(block, history) -> (spectra, new_history)``, fused path."""

    @jax.jit
    def step(block, history):
        return pfb_spectra_fused(block, nfft, ntap, nout=nout, stokes=stokes,
                                 history=history, return_history=True, **kw)

    return step
