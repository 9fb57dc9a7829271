"""Polyphase filterbank channelizer + spectral power.

The reference links cuFFT and includes it from its (empty) kernels module
(``makefile:27``, ``kernel.cuh:7``) — a planned fine channelizer in front of
detection that never shipped. This module provides that capability
TPU-natively: a critically-sampled polyphase filterbank (windowed-sinc
prototype FIR folded to ``(ntap, nfft)`` + FFT, the standard radio-astronomy
F-engine structure) followed by |x|^2 detection and time integration.

Design notes:
  * The FIR fold is expressed as ``ntap`` shifted views multiplied by the
    per-tap coefficients and summed — XLA fuses this into a single pass; no
    gather is required because windows are critically sampled (stride nfft).
  * Block boundaries: an ``(ntap-1)*nfft``-sample history from the previous
    block is prepended (overlap-save). Streaming callers thread the history
    through; one-shot callers get zero history (identical to the golden
    model). Across time-sharded devices the history is exchanged over ICI
    with ``ppermute`` (see parallel/sharded.py).
  * Output ordering: coarse-channel-major, fine channels fft-shifted so
    frequency ascends within each coarse channel -> ``(nchan * nfft,)``.

Total output for full geometry: 336 * nfft fine channels per integration.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import NCHAN_CHK, NPOL_SAMP, NSAMP_DF


def pfb_coeffs(nfft: int, ntap: int = 4, window: str = "hamming",
               dtype=np.float32) -> np.ndarray:
    """Prototype low-pass FIR folded to ``(ntap, nfft)``.

    Windowed sinc with cutoff at the fine-channel width (the conventional
    PFB prototype). Normalized to unit DC gain per phase so a constant
    input maps to the k=0 fine channel with unchanged amplitude scale.
    """
    n = np.arange(ntap * nfft, dtype=np.float64)
    x = n / nfft - ntap / 2.0
    sinc = np.sinc(x)
    if window == "hamming":
        win = np.hamming(ntap * nfft)
    elif window == "hanning":
        win = np.hanning(ntap * nfft)
    elif window == "rect":
        win = np.ones(ntap * nfft)
    else:
        raise ValueError(f"unknown window '{window}'")
    h = (sinc * win).reshape(ntap, nfft)
    h /= h.sum(axis=0).mean()
    return h.astype(dtype)


# --------------------------------------------------------------------------
# Golden (NumPy, float64) reference
# --------------------------------------------------------------------------

def channelize_golden(x: np.ndarray, coeffs: np.ndarray) -> np.ndarray:
    """Brute-force PFB: x (..., nsamp) complex -> (..., nwin, nfft) complex."""
    ntap, nfft = coeffs.shape
    nsamp = x.shape[-1]
    nwin = nsamp // nfft - (ntap - 1)
    out_shape = x.shape[:-1] + (nwin, nfft)
    y = np.zeros(out_shape, dtype=np.complex128)
    xr = x.reshape(x.shape[:-1] + (nsamp // nfft, nfft))
    for m in range(nwin):
        z = np.zeros(x.shape[:-1] + (nfft,), dtype=np.complex128)
        for t in range(ntap):
            z = z + coeffs[t] * xr[..., m + t, :]
        y[..., m, :] = np.fft.fft(z, axis=-1)
    return y


def pfb_power_golden(block: np.ndarray, nfft: int, ntap: int = 4,
                     window: str = "hamming", mean: bool = False,
                     shift: bool = True) -> np.ndarray:
    """Golden PFB spectrometer on a canonical 6-D block.

    Returns float32 power of shape ``(nchk * NCHAN_CHK * nfft,)``.
    """
    ndf, nchk, nsamp_df, nchan_chk, npol, ndim = block.shape
    x = block.astype(np.float64)
    v = x[..., 0] + 1j * x[..., 1]                      # (ndf,nchk,ns,nk,np)
    # time series per (chunk, chan, pol): n = f*nsamp_df + s
    v = v.transpose(1, 3, 4, 0, 2).reshape(nchk, nchan_chk, npol,
                                           ndf * nsamp_df)
    coeffs = pfb_coeffs(nfft, ntap, window, dtype=np.float64)
    y = channelize_golden(v, coeffs)                    # (...,nwin,nfft)
    p = np.abs(y) ** 2
    power = p.sum(axis=(2, 3))                          # sum pol, windows
    if mean:
        power = power / (p.shape[2] * p.shape[3])
    if shift:
        power = np.fft.fftshift(power, axes=-1)
    return power.reshape(nchk * nchan_chk * nfft).astype(np.float32)


# --------------------------------------------------------------------------
# JAX implementation
# --------------------------------------------------------------------------

def _block_to_series(block: jax.Array) -> jax.Array:
    """6-D int16 block -> complex64 (nchk, nchan_chk, npol, nsamp)."""
    ndf, nchk, nsamp_df, nchan_chk, npol, _ = block.shape
    x = block.astype(jnp.float32)
    v = jax.lax.complex(x[..., 0], x[..., 1])
    return v.transpose(1, 3, 4, 0, 2).reshape(nchk, nchan_chk, npol,
                                              ndf * nsamp_df)


def channelize(x: jax.Array, coeffs: jax.Array) -> jax.Array:
    """PFB: x (..., nsamp) complex64 -> (..., nwin, nfft) complex64.

    FIR fold as ntap shifted strided views; FFT over the last axis.
    """
    ntap, nfft = coeffs.shape
    nsamp = x.shape[-1]
    nblk = nsamp // nfft
    nwin = nblk - (ntap - 1)
    xr = x.reshape(x.shape[:-1] + (nblk, nfft))
    z = jnp.zeros(x.shape[:-1] + (nwin, nfft), dtype=x.dtype)
    for t in range(ntap):
        z = z + coeffs[t] * jax.lax.slice_in_dim(xr, t, t + nwin, axis=-2)
    return jnp.fft.fft(z, axis=-1)


def _pfb_detect(v: jax.Array, coeffs: jax.Array, mean: bool) -> jax.Array:
    """Channelize + detect a complex series -> (nchk, nchan_chk, nfft)."""
    y = channelize(v, coeffs)
    p = y.real * y.real + y.imag * y.imag
    power = p.sum(axis=(2, 3))
    if mean:
        power = power / (p.shape[2] * p.shape[3])
    return power


@functools.partial(jax.jit,
                   static_argnames=("nfft", "ntap", "window", "mean", "shift",
                                    "chunk_groups", "return_history"))
def pfb_power(block: jax.Array, nfft: int, ntap: int = 4,
              window: str = "hamming", mean: bool = False,
              shift: bool = True,
              history: jax.Array | None = None,
              chunk_groups: int = 1,
              return_history: bool = False):
    """PFB spectrometer: 6-D int16 block -> (nchan * nfft,) float32 power.

    ``history``: optional ``(nchk, nchan_chk, npol, (ntap-1)*nfft)``
    complex64 carry from the previous block (overlap-save streaming). With
    history, all ``nsamp/nfft`` windows of this block are produced; without
    it the first ``ntap-1`` windows are simply absent (matching the golden
    model's one-shot behavior).

    ``chunk_groups``: channelize the chunk axis in this many sequential
    groups (``lax.map`` over contiguous slices of the transposed series).
    The full-geometry block needs ~13 GB of complex temporaries if
    channelized at once; 8-16 groups keeps the working set inside HBM. The
    unpack/transpose itself runs once over the whole block (it is the
    cheap, bandwidth-bound part).

    Jitted with its own call boundary on purpose: the boundary makes XLA
    materialize the transposed series once before the group loop — fully
    inlined, the unpack/transpose gets re-fused into (and recomputed by)
    every ``lax.map`` iteration, ~3x wall clock on full blocks. Callers may
    wrap ONE more jit around a composition including this (measured
    harmless); deeper nesting re-introduces relayout copies at each extra
    boundary.
    """
    nchk = block.shape[1]
    npol = block.shape[4]
    halo = (ntap - 1) * nfft
    coeffs = jnp.asarray(pfb_coeffs(nfft, ntap, window))
    v = _block_to_series(block)
    nwin_main = v.shape[-1] // nfft - (ntap - 1)

    if chunk_groups <= 1 or nchk % chunk_groups:
        power = _pfb_detect(v, coeffs, mean=False)
    else:
        g = nchk // chunk_groups

        def one(i):
            sub = jax.lax.dynamic_slice_in_dim(v, i * g, g, axis=0)
            return _pfb_detect(sub, coeffs, mean=False)

        power = jax.lax.map(one, jnp.arange(chunk_groups))
        power = power.reshape(nchk, NCHAN_CHK, nfft)

    nwin_total = nwin_main
    if history is not None:
        # Boundary windows: the ntap-1 windows straddling the block edge use
        # history + the block's leading samples. Computing them separately
        # (tiny) keeps the main pass on nfft-aligned windows — a full-series
        # concat costs ~3x wall clock and doubles peak HBM.
        boundary = jnp.concatenate([history, v[..., :halo]], axis=-1)
        power = power + _pfb_detect(boundary, coeffs, mean=False)
        nwin_total += ntap - 1

    if mean:
        power = power / (npol * nwin_total)
    if shift:
        power = jnp.fft.fftshift(power, axes=-1)
    power = power.reshape(-1)
    if return_history:
        # next block's overlap-save carry, from the series already built
        # (a separate pfb_history call would redo the full unpack/transpose)
        return power, v[..., -halo:]
    return power


def pfb_history(block: jax.Array, nfft: int, ntap: int = 4) -> jax.Array:
    """Trailing ``(ntap-1)*nfft`` samples of a block, as the next block's
    overlap-save carry."""
    v = _block_to_series(block)
    return v[..., -(ntap - 1) * nfft:]


def make_streaming_pfb(nfft: int, ntap: int = 4, chunk_groups: int = 1, **kw):
    """Return ``step(block, history) -> (power, new_history)`` for
    stateful streaming across blocks.

    ``block`` may be the canonical 6-D array or the production 2-D device
    layout ``(ndf, nchk*3584) int16`` — the reshape happens inside the one
    jitted program, where XLA folds it into the unpack/transpose instead of
    materializing a relayout copy at a call boundary.
    """

    @jax.jit
    def step(block, history):
        if block.ndim == 2:
            ndf, lanes = block.shape
            block = block.reshape(ndf, lanes // (NSAMP_DF * NCHAN_CHK *
                                                 NPOL_SAMP * 2),
                                  NSAMP_DF, NCHAN_CHK, NPOL_SAMP, 2)
        return pfb_power(block, nfft, ntap, history=history,
                         chunk_groups=chunk_groups, return_history=True,
                         **kw)

    return step
