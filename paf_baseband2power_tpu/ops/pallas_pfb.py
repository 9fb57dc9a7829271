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
  output register).
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
    _block_to_series,
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
        # complex (nchk, 7, npol, (ntap-1)*nfft) -> interleaved f32 rows
        h = history.reshape(nchk, NCHAN_CHK, npol, ntap - 1, nfft)
        hrows = jnp.stack([jnp.real(h), jnp.imag(h)], axis=-1)
        hrows = hrows.reshape(nseries, ntap - 1, 2 * _L)
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
        halo = (ntap - 1) * nfft
        halo_ndf = -(-halo // NSAMP_DF)
        v_tail = _block_to_series(block[-halo_ndf:])[..., -halo:]
        return power, v_tail
    return power


def make_streaming_pfb_fused(nfft: int = _L, ntap: int = 4, **kw):
    """``step(block, history) -> (power, new_history)`` on the fused path."""

    @jax.jit
    def step(block, history):
        return pfb_power_fused(block, nfft, ntap, history=history,
                               return_history=True, **kw)

    return step
