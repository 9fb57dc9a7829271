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


@functools.partial(jax.jit,
                   static_argnames=("nfft", "ntap", "window", "mean", "shift"))
def pfb_power(block: jax.Array, nfft: int, ntap: int = 4,
              window: str = "hamming", mean: bool = False,
              shift: bool = True,
              history: jax.Array | None = None) -> jax.Array:
    """PFB spectrometer: 6-D int16 block -> (nchan * nfft,) float32 power.

    ``history``: optional ``(nchk, nchan_chk, npol, (ntap-1)*nfft)``
    complex64 carry from the previous block (overlap-save streaming). With
    history, all ``nsamp/nfft`` windows of this block are produced; without
    it the first ``ntap-1`` windows are simply absent (matching the golden
    model's one-shot behavior).
    """
    v = _block_to_series(block)
    if history is not None:
        v = jnp.concatenate([history, v], axis=-1)
    coeffs = jnp.asarray(pfb_coeffs(nfft, ntap, window))
    y = channelize(v, coeffs)
    p = y.real * y.real + y.imag * y.imag
    power = p.sum(axis=(2, 3))
    if mean:
        power = power / (p.shape[2] * p.shape[3])
    if shift:
        power = jnp.fft.fftshift(power, axes=-1)
    return power.reshape(-1)


def pfb_history(block: jax.Array, nfft: int, ntap: int = 4) -> jax.Array:
    """Trailing ``(ntap-1)*nfft`` samples of a block, as the next block's
    overlap-save carry."""
    v = _block_to_series(block)
    return v[..., -(ntap - 1) * nfft:]


def make_streaming_pfb(nfft: int, ntap: int = 4, **kw):
    """Return ``step(block, history) -> (power, new_history)`` for
    stateful streaming across blocks."""

    @jax.jit
    def step(block, history):
        power = pfb_power(block, nfft, ntap, history=history, **kw)
        return power, pfb_history(block, nfft, ntap)

    return step
