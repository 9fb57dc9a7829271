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


def pfb_spectra_golden(block: np.ndarray, nfft: int, ntap: int = 4,
                       window: str = "hamming", nout: int = 1,
                       stokes: bool = False, mean: bool = False,
                       shift: bool = True) -> np.ndarray:
    """Golden composed fine-channel detection: PFB x tscrunch x Stokes.

    The reference's planned channelizer (``/root/reference/kernel.cuh:4-7``,
    ``makefile:27`` cuFFT) composed with its "detect ... and average ... in
    time" contract (``paf_baseband2power.cu:20``) implies what F-engine
    backends actually ship: fine-channel spectra *with time resolution*
    (a waterfall) and fine-channel polarimetry. This is the float64 oracle
    for both, and for their composition.

    Window-group convention (streaming-consistent): window ``w`` ends in
    row-slot ``e = w + ntap - 1`` (rows are ``nfft``-sample blocks); its
    output spectrum is ``e // (nblk / nout)``. Boundary windows carried in
    from the previous block end in rows ``0..ntap-2`` and so land in
    spectrum 0 — a two-block stream with history reproduces the one-shot
    golden over the concatenated series exactly, group by group.

    Returns float32 ``(nout, nchan * nfft)`` or, with ``stokes``,
    ``(nout, 4, nchan * nfft)`` ordered I, Q, U, V.
    """
    ndf, nchk, nsamp_df, nchan_chk, npol, ndim = block.shape
    nsamp = ndf * nsamp_df
    nblk = nsamp // nfft
    if nblk % nout:
        raise ValueError(f"nout={nout} must divide {nblk} window slots")
    wpg = nblk // nout
    if wpg < max(ntap - 1, 1):
        raise ValueError(
            f"windows per spectrum {wpg} must be >= ntap-1={ntap - 1} "
            "(boundary windows may not straddle output spectra)")
    x = block.astype(np.float64)
    v = (x[..., 0] + 1j * x[..., 1]).transpose(1, 3, 4, 0, 2).reshape(
        nchk, nchan_chk, npol, nsamp)
    coeffs = pfb_coeffs(nfft, ntap, window, dtype=np.float64)
    y = channelize_golden(v, coeffs)        # (chk, chan, pol, nwin, nfft)
    nwin = y.shape[-2]
    if stokes:
        if npol != 2:
            raise ValueError("Stokes needs 2 polarizations")
        yx, yy = y[:, :, 0], y[:, :, 1]
        pxx = np.abs(yx) ** 2
        pyy = np.abs(yy) ** 2
        xy = yx * np.conj(yy)
        s = np.stack([pxx + pyy, pxx - pyy, 2 * xy.real, 2 * xy.imag],
                     axis=2)                # (chk, chan, 4, nwin, nfft)
    else:
        s = (np.abs(y) ** 2).sum(axis=2)[:, :, None]   # (.., 1, nwin, nfft)
    slots = np.zeros(s.shape[:3] + (nblk, nfft))
    slots[..., ntap - 1:ntap - 1 + nwin, :] = s
    g = slots.reshape(s.shape[:3] + (nout, wpg, nfft)).sum(axis=-2)
    if mean:
        nwin_g = np.full(nout, float(wpg))
        nwin_g[0] -= ntap - 1               # one-shot: no boundary windows
        # wpg == ntap-1 leaves spectrum 0 with zero windows one-shot (its
        # sum is exactly 0); clamp so mean mode yields 0, not 0/0 = NaN
        nwin_g = np.maximum(nwin_g, 1.0)
        denom = nwin_g * (1 if stokes else npol)
        g = g / denom[:, None]
    if shift:
        g = np.fft.fftshift(g, axes=-1)
    out = g.transpose(3, 2, 0, 1, 4).reshape(nout, s.shape[2],
                                             nchk * nchan_chk * nfft)
    out = out.astype(np.float32)
    return out if stokes else out[:, 0]


# --------------------------------------------------------------------------
# JAX implementation
# --------------------------------------------------------------------------

def pfb_matmul_weights(nfft: int, ntap: int = 4, window: str = "hamming",
                       dtype=np.float32) -> tuple[np.ndarray, np.ndarray]:
    """Combined FIR x DFT operator for the MXU channelizer path.

    ``W[t*nfft + n, k] = coeffs[t, n] * exp(-2j*pi*k*n/nfft)``, so that for a
    stacked window ``z[m, t*nfft+n] = x[(m+t)*nfft + n]`` the channelizer
    output is the single real-pair matmul ``y[m] = z[m] @ W`` — identical to
    FIR-fold + FFT, but expressed as an ``(ntap*nfft)``-deep contraction the
    MXU executes at full rate (a 32..128-point ``jnp.fft`` on TPU runs on
    the VPU an order of magnitude slower). Returns ``(W_re, W_im)``.
    """
    c = pfb_coeffs(nfft, ntap, window, dtype=np.float64)
    n = np.arange(nfft)
    ph = np.exp(-2j * np.pi * np.outer(n, n) / nfft)        # (n, k)
    w = (c[:, :, None] * ph[None, :, :]).reshape(ntap * nfft, nfft)
    return w.real.astype(dtype), w.imag.astype(dtype)


def _stack_windows(xr: jax.Array, ntap: int) -> jax.Array:
    """(..., nblk, nfft) -> (..., nwin, ntap*nfft) shifted-window stack."""
    nblk, nfft = xr.shape[-2:]
    nwin = nblk - (ntap - 1)
    parts = [jax.lax.slice_in_dim(xr, t, t + nwin, axis=-2)
             for t in range(ntap)]
    z = jnp.stack(parts, axis=-2)                           # (.,nwin,ntap,nfft)
    return z.reshape(z.shape[:-2] + (ntap * nfft,))


def channelize_matmul(x: jax.Array, w_re: jax.Array, w_im: jax.Array,
                      ) -> tuple[jax.Array, jax.Array]:
    """MXU PFB: x (..., nsamp) complex64 -> (y_re, y_im) (..., nwin, nfft).

    Numerically identical to ``channelize`` (same prototype FIR, same DFT)
    but maps onto four f32 matmuls instead of FFTs.
    """
    ntapnfft, nfft = w_re.shape
    ntap = ntapnfft // nfft
    nblk = x.shape[-1] // nfft
    xr = x.reshape(x.shape[:-1] + (nblk, nfft))
    z = _stack_windows(xr, ntap)
    zr, zi = jnp.real(z), jnp.imag(z)
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    y_re = mm(zr, w_re) - mm(zi, w_im)
    y_im = mm(zr, w_im) + mm(zi, w_re)
    return y_re, y_im


# matmul channelizer wins while ntap*nfft stays MXU-sized; beyond this the
# O(nfft) per-sample matmul work overtakes the FFT's O(log nfft).
_MATMUL_NFFT_MAX = 256


def resolve_method(nfft: int, method: str = "auto") -> str:
    """Resolve ``"auto"`` to the concrete channelizer method for ``nfft``."""
    if method == "auto":
        return "matmul" if nfft <= _MATMUL_NFFT_MAX else "fft"
    return method


def default_chunk_groups(nfft: int, nchk: int, method: str = "auto") -> int:
    """Chunk-group count that keeps the channelizer inside HBM.

    The lane-aligned sliding-DFT path (``128 % nfft == 0``) streams rows and
    fits full-geometry blocks whole — grouping would only add slice copies.
    The fft and stacked-matmul paths materialize ~13-22 GB of complex /
    window temporaries on a full block if channelized at once; splitting the
    48-chunk axis into 16 sequential groups bounds that under ~1.5 GB.
    """
    if resolve_method(nfft, method) == "matmul" and _SLIDE_LANES % nfft == 0:
        return 1
    for g in (16, 12, 8, 6, 4, 3, 2):
        if nchk % g == 0:
            return g
    return 1

_SLIDE_LANES = 128  # TPU vector lane width: rows of 128 complex samples

# bf16x3 f32 emulation on v5e. Measured on full-scale int16 inputs vs the
# float64 golden: HIGH 3e-6 max relative error at 0.6x the wall clock of
# HIGHEST (bf16x6, 2e-7); DEFAULT (single bf16 pass) is 8e-4 — too lossy
# for a spectrometer backend.
_SLIDE_PRECISION = jax.lax.Precision.HIGH


def pfb_sliding_mats(nfft: int, ntap: int = 4, window: str = "hamming",
                     ) -> np.ndarray:
    """Row-aligned sliding-DFT operator bank: ``(D, 256, 256) float32``.

    The lane-aligned form of the matmul channelizer. The complex series is
    viewed as rows of ``L=128`` samples (``2L`` interleaved re/im f32 lanes
    — exactly complex64's memory layout, so the input is a free bitcast).
    Window ``m = g*q + r`` (``g = L/nfft`` windows start in each row ``q``)
    spans rows ``q .. q+D-1``, so

        ``y[g*q + r, k] = sum_d (X[q+d] @ M[d])[lane]``,

    with output lanes ``[0,L) = y_re`` at ``r*nfft+k`` and ``[L,2L) = y_im``.
    ``M[d][2j+e, ...]`` carries the DFT phase times the FIR coefficient for
    input sample ``j`` of row ``q+d`` (``e``: re/im), or zero when that
    sample falls outside window ``m``. Everything stays 128-lane aligned:
    no padding blow-ups, one ``(nrow,256)@(256,256)`` matmul per ``d``
    (``D = 1 + ceil((ntap-1)*nfft/L)``), shifted row adds, and the whole
    FIR+DFT rides the MXU. Requires ``128 % nfft == 0``.
    """
    L = _SLIDE_LANES
    if L % nfft:
        raise ValueError(f"nfft={nfft} must divide {L}")
    w_re, w_im = pfb_matmul_weights(nfft, ntap, window, dtype=np.float64)
    w = w_re + 1j * w_im                                  # (ntap*nfft, nfft)
    g = L // nfft
    d_count = 1 + -(-((ntap - 1) * nfft) // L)
    # input rows are [re lanes | im lanes] blocks (NOT interleaved: a
    # trailing size-2 re/im axis bribes XLA into a T(2,128)-tiled relayout
    # copy with ~18x padding; two lane-aligned 128-blocks concat for free)
    mats = np.zeros((d_count, 2 * L, 2 * L), np.float64)
    for d in range(d_count):
        for r in range(g):
            col = np.arange(r * nfft, (r + 1) * nfft)
            for j in range(L):
                s = j + d * L - r * nfft                  # sample-in-window
                if 0 <= s < ntap * nfft:
                    mats[d, j, col] = w[s].real
                    mats[d, L + j, col] = -w[s].imag
                    mats[d, j, L + col] = w[s].imag
                    mats[d, L + j, L + col] = w[s].real
    return mats.astype(np.float32)


def pfb_sliding_fir_dft(nfft: int, ntap: int = 4, window: str = "hamming",
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Factored row-aligned PFB operators for ``nfft == 128``: the FIR as
    per-tap lane-coefficient vectors, the DFT as one real-pair matmul.

    ``pfb_sliding_mats`` bakes the FIR into the DFT operator, so the conv
    form spends ``ntap * nfft`` MACs per complex sample on the MXU. When
    windows tile rows exactly (``nfft == L``), the FIR is a plain
    elementwise fold across ``ntap`` shifted rows — VPU work — and only the
    ``nfft``-deep DFT contraction needs the MXU: 4x less matmul work at
    ntap=4. Returns ``(cvecs (ntap, 2L), fmat (2L, 2L)) float32`` with
    lanes in the ``[re(L) | im(L)]`` block layout of ``_block_to_rows``.
    """
    L = _SLIDE_LANES
    if nfft != L:
        raise ValueError(f"factored sliding form needs nfft == {L}")
    c = pfb_coeffs(nfft, ntap, window, dtype=np.float64)    # (ntap, nfft)
    cvecs = np.concatenate([c, c], axis=1)                  # re | im lanes
    n = np.arange(nfft)
    ph = np.exp(-2j * np.pi * np.outer(n, n) / nfft)        # (n, k)
    fmat = np.zeros((2 * L, 2 * L), np.float64)
    fmat[:L, :L] = ph.real
    fmat[L:, :L] = -ph.imag
    fmat[:L, L:] = ph.imag
    fmat[L:, L:] = ph.real
    return cvecs.astype(np.float32), fmat.astype(np.float32)


def _block_to_rows(block: jax.Array) -> jax.Array:
    """6-D int16 block -> f32 sliding rows ``(nchk, 7, npol, ndf, 256)``.

    One BMF frame carries exactly ``L=128`` consecutive time samples per
    (chunk, chan, pol), so the row form of the sliding DFT is a single
    transpose of the raw block — no complex64 intermediate (whose re/im
    extraction costs a padded relayout per touch) and no reshape tricks.
    Lanes are ``[re(128) | im(128)]`` blocks: one transpose bringing the
    re/im axis just above the sample axis, then a free reshape. (Slicing
    re/im apart and transposing each + concat computes the same thing 9x
    slower — XLA runs it as two strided relayouts plus a copy.)
    """
    x = block.astype(jnp.float32)
    y = x.transpose(1, 3, 4, 0, 5, 2)              # (nchk,7,pol,ndf,dim,128)
    return y.reshape(y.shape[:-2] + (2 * _SLIDE_LANES,))


def _pfb_detect_sliding(xrows: jax.Array, mats: jax.Array, nfft: int,
                        ntap: int, mean: bool,
                        fir_dft=None) -> jax.Array:
    """Sliding-DFT channelize + detect -> (nchk, nchan_chk, nfft).

    ``xrows``: f32 ``(nchk, nchan_chk, npol, nrow, 2L)`` from
    ``_block_to_rows``. The ``D`` shifted row-matmuls are expressed as one
    causal 1-D convolution (feature dim 2L -> 2L, kernel width D, zero
    future-padding), which XLA lowers to MXU matmuls that slide over rows
    in VMEM instead of materializing every shifted product.

    ``fir_dft`` (``nfft == L`` only): factored ``(cvecs, fmat)`` operators
    from ``pfb_sliding_fir_dft`` — the FIR fold runs as an elementwise sum
    of ``ntap`` shifted rows (VPU, fused by XLA) and the MXU does only the
    nfft-deep DFT matmul instead of the ntap*nfft-deep conv. Measured
    gain is small (108 -> 100 ms per full block on v5e): this XLA
    formulation is bound by its ~40 GB of materialized passes (rows, z,
    y, epilogue), not the MXU — that is what the fused Pallas kernel in
    ``ops/pallas_pfb.py`` removes.
    """
    L = _SLIDE_LANES
    nchk, nchan, npol, nrow, _ = xrows.shape
    g = L // nfft
    nwin = nrow * g - (ntap - 1)

    lhs = xrows.reshape(nchk * nchan * npol, nrow, 2 * L)
    if fir_dft is not None:
        cvecs, fmat = fir_dft
        # zero-pad the tail rows: the last ntap-1 windows read past the
        # series end, matching the conv path's future-padding + mask
        lhs_p = jnp.pad(lhs, ((0, 0), (0, ntap - 1), (0, 0)))
        z = cvecs[0] * lhs
        for t in range(1, ntap):
            z = z + cvecs[t] * jax.lax.slice_in_dim(
                lhs_p, t, t + nrow, axis=1)
        y = jnp.matmul(z, fmat, precision=_SLIDE_PRECISION)
    else:
        d_count = mats.shape[0]
        y = jax.lax.conv_general_dilated(
            lhs, mats,                                    # (D, 2L, 2L) = WIO
            window_strides=(1,), padding=[(0, d_count - 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=_SLIDE_PRECISION)
    p = y * y
    p = p[..., :L] + p[..., L:]                           # |y|^2, (.,nrow,L)
    # zero-padded tail rows produce the ntap-1 windows past the series end
    win_id = (jax.lax.broadcasted_iota(jnp.int32, (nrow, L), 0) * g
              + jax.lax.broadcasted_iota(jnp.int32, (nrow, L), 1) // nfft)
    p = p * (win_id < nwin).astype(p.dtype)
    power = p.sum(axis=1)                                 # window rows
    power = power.reshape(nchk, nchan, npol, g, nfft).sum(axis=(2, 3))
    if mean:
        power = power / (npol * nwin)
    return power

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


def _pfb_detect_matmul(v: jax.Array, w_re: jax.Array, w_im: jax.Array,
                       mean: bool) -> jax.Array:
    """MXU channelize + detect -> (nchk, nchan_chk, nfft)."""
    y_re, y_im = channelize_matmul(v, w_re, w_im)
    p = y_re * y_re + y_im * y_im
    power = p.sum(axis=(2, 3))
    if mean:
        power = power / (p.shape[2] * p.shape[3])
    return power


@functools.partial(jax.jit,
                   static_argnames=("nfft", "ntap", "window", "mean", "shift",
                                    "chunk_groups", "return_history",
                                    "method"))
def pfb_power(block: jax.Array, nfft: int, ntap: int = 4,
              window: str = "hamming", mean: bool = False,
              shift: bool = True,
              history: jax.Array | None = None,
              chunk_groups: int | None = None,
              return_history: bool = False,
              method: str = "auto"):
    """PFB spectrometer: 6-D int16 block -> (nchan * nfft,) float32 power.

    ``history``: optional ``(nchk, nchan_chk, npol, (ntap-1)*nfft)``
    complex64 carry from the previous block (overlap-save streaming). With
    history, all ``nsamp/nfft`` windows of this block are produced; without
    it the first ``ntap-1`` windows are simply absent (matching the golden
    model's one-shot behavior).

    ``chunk_groups``: channelize the chunk axis in this many sequential
    groups (``lax.map`` over contiguous slices). The FFT path needs ~13 GB
    of complex temporaries if channelized at once — 8-16 groups keeps it
    inside HBM. The sliding-matmul path fits whole-block; leave groups at 1
    there (each group costs a ~5.6 GB slice copy, ~40 ms/block). ``None``
    (default) picks per method via ``default_chunk_groups``.

    ``method``: ``"matmul"`` (FIR+DFT as MXU matmuls — the lane-aligned
    sliding form of ``pfb_sliding_mats`` when ``128 % nfft == 0``, else the
    stacked form of ``pfb_matmul_weights``), ``"fft"`` (``jnp.fft``), or
    ``"auto"`` — matmul while ``nfft`` is MXU-sized (<= 256), fft beyond.
    Identical PFB either way; at nfft=128 on v5e the sliding path streams
    full-geometry blocks at ~6.6 Gsamp/s vs ~2.3 for fft (small-radix FFTs
    run on the VPU; the MXU form is HBM-bandwidth-bound).

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
    if history is not None:
        history = history_as_complex(history, ntap, nfft, npol)
    if chunk_groups is None:
        chunk_groups = default_chunk_groups(nfft, nchk, method)
    method = resolve_method(nfft, method)
    boundary_detect = None
    if method == "matmul":
        w_re, w_im = (jnp.asarray(w)
                      for w in pfb_matmul_weights(nfft, ntap, window))
        stacked = functools.partial(_pfb_detect_matmul, w_re=w_re, w_im=w_im)
        if _SLIDE_LANES % nfft == 0:
            # lane-aligned main pass; the (tiny, 128-unaligned) boundary
            # windows go through the generic stacked form
            fir_dft = None
            if nfft == _SLIDE_LANES:
                cvecs, fmat = pfb_sliding_fir_dft(nfft, ntap, window)
                fir_dft = (jnp.asarray(cvecs), jnp.asarray(fmat))
                mats = jnp.zeros((0, 0, 0), jnp.float32)  # unused
            else:
                mats = jnp.asarray(pfb_sliding_mats(nfft, ntap, window))
            detect = functools.partial(_pfb_detect_sliding, mats=mats,
                                       nfft=nfft, ntap=ntap,
                                       fir_dft=fir_dft)
            boundary_detect = stacked
        else:
            detect = stacked
    elif method == "fft":
        coeffs = jnp.asarray(pfb_coeffs(nfft, ntap, window))
        detect = functools.partial(_pfb_detect, coeffs=coeffs)
    else:
        raise ValueError(f"unknown method '{method}'")
    sliding = boundary_detect is not None
    if sliding:
        # main pass on the row form (one transpose, no complex64); the tiny
        # boundary/history series are built from a few edge frames only
        data = _block_to_rows(block)
        halo_ndf = -(-halo // NSAMP_DF)
        v_lead = _block_to_series(block[:halo_ndf])[..., :halo]
        v_tail = _block_to_series(block[-halo_ndf:])[..., -halo:]
        nsamp = block.shape[0] * NSAMP_DF
    else:
        boundary_detect = detect
        data = v = _block_to_series(block)
        v_lead, v_tail = v[..., :halo], v[..., -halo:]
        nsamp = v.shape[-1]
    nwin_main = nsamp // nfft - (ntap - 1)

    if chunk_groups <= 1 or nchk % chunk_groups:
        power = detect(data, mean=False)
    else:
        g = nchk // chunk_groups

        def one(i):
            sub = jax.lax.dynamic_slice_in_dim(data, i * g, g, axis=0)
            return detect(sub, mean=False)

        power = jax.lax.map(one, jnp.arange(chunk_groups))
        power = power.reshape(nchk, NCHAN_CHK, nfft)

    nwin_total = nwin_main
    if history is not None:
        # Boundary windows: the ntap-1 windows straddling the block edge use
        # history + the block's leading samples. Computing them separately
        # (tiny) keeps the main pass on nfft-aligned windows — a full-series
        # concat costs ~3x wall clock and doubles peak HBM.
        boundary = jnp.concatenate([history, v_lead], axis=-1)
        power = power + boundary_detect(boundary, mean=False)
        nwin_total += ntap - 1

    if mean:
        power = power / (npol * nwin_total)
    if shift:
        power = jnp.fft.fftshift(power, axes=-1)
    power = power.reshape(-1)
    if return_history:
        # next block's overlap-save carry, from edge frames / the series
        # already built (a separate pfb_history call would redo the work)
        return power, v_tail
    return power


def pfb_history(block: jax.Array, nfft: int, ntap: int = 4) -> jax.Array:
    """Trailing ``(ntap-1)*nfft`` samples of a block, as the next block's
    overlap-save carry."""
    v = _block_to_series(block)
    return v[..., -(ntap - 1) * nfft:]


def history_as_complex(history: jax.Array, ntap: int, nfft: int,
                       npol: int = 2) -> jax.Array:
    """Normalize an overlap-save carry to the canonical complex format
    ``(nchk, nchan_chk, npol, (ntap-1)*nfft)`` (what ``pfb_history``
    returns).

    The fused Pallas kernels return their carry as raw int16 series rows
    ``(nseries, halo_ndf, 256)`` — a pure slice of their input (producing
    the complex form there measured ~11 ms/block at nfft=1024 on v5e).
    The XLA paths and any inspection/tooling use this converter; complex
    input passes through unchanged.
    """
    if jnp.iscomplexobj(history):
        return history
    nseries = history.shape[0]
    nchk = nseries // (NCHAN_CHK * npol)
    halo = (ntap - 1) * nfft
    t = history.astype(jnp.float32).reshape(nchk, NCHAN_CHK, npol, halo, 2)
    return jax.lax.complex(t[..., 0], t[..., 1])


def _spectra_detect(v: jax.Array, nfft: int, stokes: bool, method: str,
                    ops) -> jax.Array:
    """Channelize + per-window detect: complex series ``(gchk, nchan, npol,
    nsamp)`` -> ``(gchk, nchan, ns, nwin, nfft)`` (ns = 4 Stokes or 1)."""
    if method == "matmul":
        w_re, w_im = ops
        y_re, y_im = channelize_matmul(v, w_re, w_im)
    else:
        y = channelize(v, ops)
        y_re, y_im = jnp.real(y), jnp.imag(y)
    if stokes:
        xr, xi = y_re[:, :, 0], y_im[:, :, 0]
        yr, yi = y_re[:, :, 1], y_im[:, :, 1]
        pxx = xr * xr + xi * xi
        pyy = yr * yr + yi * yi
        re = xr * yr + xi * yi                       # Re(x y*)
        im = xi * yr - xr * yi                       # Im(x y*)
        return jnp.stack([pxx + pyy, pxx - pyy, 2 * re, 2 * im], axis=2)
    p = y_re * y_re + y_im * y_im
    return p.sum(axis=2)[:, :, None]


def _group_windows(s: jax.Array, nout: int, wpg: int, ntap: int,
                   nblk: int) -> jax.Array:
    """Window-group fold: ``(..., nwin, nfft) -> (..., nout, nfft)``.

    Window ``w`` lands in slot ``e = w + ntap - 1`` (its end row); slots
    fold into ``nout`` contiguous groups of ``wpg`` — a front zero-pad plus
    reshape-sum, no gathers (groups are contiguous in end-row order).
    """
    nwin = s.shape[-2]
    pad = [(0, 0)] * (s.ndim - 2) + [(ntap - 1, nblk - (ntap - 1) - nwin),
                                     (0, 0)]
    s = jnp.pad(s, pad)
    return s.reshape(s.shape[:-2] + (nout, wpg, s.shape[-1])).sum(axis=-2)


def spectra_chunk_groups(nchk: int) -> int:
    """Chunk-group count for the composed-spectra path (fft / stacked
    matmul channelizers both materialize per-window temporaries)."""
    for g in (16, 12, 8, 6, 4, 3, 2):
        if nchk % g == 0:
            return g
    return 1


@functools.partial(jax.jit,
                   static_argnames=("nfft", "ntap", "window", "nout",
                                    "stokes", "mean", "shift",
                                    "chunk_groups", "return_history",
                                    "method"))
def pfb_spectra(block: jax.Array, nfft: int, ntap: int = 4,
                window: str = "hamming", nout: int = 1,
                stokes: bool = False, mean: bool = False, shift: bool = True,
                history: jax.Array | None = None,
                chunk_groups: int | None = None,
                return_history: bool = False,
                method: str = "auto"):
    """Composed fine-channel detection (XLA): PFB x tscrunch x Stokes.

    The general-``nfft`` realization of ``pfb_spectra_golden``'s contract:
    ``(nout, nchan*nfft)`` waterfall spectra, or ``(nout, 4, nchan*nfft)``
    fine-channel Stokes. ``nout=1, stokes=False`` reduces to ``pfb_power``
    semantics (kept separate: that path has the tuned whole-block sliding
    formulation; this one needs per-window products before the time fold,
    so it channelizes via the stacked-matmul (nfft <= 256) or fft method
    with the chunk axis processed in sequential groups).

    ``history``: complex carry as in ``pfb_power``; the ``ntap-1`` boundary
    windows it enables land in output spectrum 0 (end-row convention — see
    the golden docstring). On TPU with ``nfft`` in the fused-kernel set,
    use ``ops.pallas_pfb.pfb_spectra_fused`` instead (the streaming factory
    dispatches automatically).
    """
    if block.ndim != 6:
        raise ValueError("pfb_spectra expects the canonical 6-D block")
    nchk = block.shape[1]
    npol = block.shape[4]
    nsamp = block.shape[0] * NSAMP_DF
    nblk = nsamp // nfft
    if nblk % nout:
        raise ValueError(f"nout={nout} must divide {nblk} window slots")
    wpg = nblk // nout
    if wpg < max(ntap - 1, 1):
        raise ValueError(
            f"windows per spectrum {wpg} must be >= ntap-1={ntap - 1}")
    if method == "auto":
        method = "matmul" if nfft <= _MATMUL_NFFT_MAX else "fft"
    if method == "matmul":
        ops = tuple(jnp.asarray(w)
                    for w in pfb_matmul_weights(nfft, ntap, window))
    elif method == "fft":
        ops = jnp.asarray(pfb_coeffs(nfft, ntap, window))
    else:
        raise ValueError(f"unknown method '{method}'")
    if chunk_groups is None:
        chunk_groups = spectra_chunk_groups(nchk)

    v = _block_to_series(block)
    halo = (ntap - 1) * nfft
    v_tail = v[..., -halo:]

    def detect_group(sub):
        s = _spectra_detect(sub, nfft, stokes, method, ops)
        return _group_windows(s, nout, wpg, ntap, nblk)

    if chunk_groups <= 1 or nchk % chunk_groups:
        g = detect_group(v)
    else:
        gsz = nchk // chunk_groups

        def one(i):
            sub = jax.lax.dynamic_slice_in_dim(v, i * gsz, gsz, axis=0)
            return detect_group(sub)

        g = jax.lax.map(one, jnp.arange(chunk_groups))
        g = g.reshape((nchk,) + g.shape[2:])

    if history is not None:
        history = history_as_complex(history, ntap, nfft, npol)
        boundary = jnp.concatenate([history, v[..., :halo]], axis=-1)
        s_b = _spectra_detect(boundary, nfft, stokes, method, ops)
        g = g.at[..., 0, :].add(s_b.sum(axis=-2))

    ns = g.shape[2]
    if mean:
        nwin_g = jnp.full((nout,), float(wpg))
        if history is None:
            nwin_g = nwin_g.at[0].add(-(ntap - 1))
        nwin_g = jnp.maximum(nwin_g, 1.0)   # 0-window group 0: 0, not NaN
        denom = nwin_g * (1 if stokes else npol)
        g = g / denom[:, None]
    if shift:
        g = jnp.fft.fftshift(g, axes=-1)
    out = g.transpose(3, 2, 0, 1, 4).reshape(nout, ns,
                                             nchk * NCHAN_CHK * nfft)
    if not stokes:
        out = out[:, 0]
    if return_history:
        return out, v_tail
    return out


def _reshape_6d(block):
    if block.ndim == 2:
        ndf, lanes = block.shape
        block = block.reshape(ndf, lanes // (NSAMP_DF * NCHAN_CHK *
                                             NPOL_SAMP * 2),
                              NSAMP_DF, NCHAN_CHK, NPOL_SAMP, 2)
    return block


def _fused_geometry_ok(ndf: int, nfft: int, ntap: int, nout: int) -> bool:
    """Whether this (static) block geometry satisfies the fused kernel's
    tiling constraints (ops/pallas_pfb.py); otherwise the streaming
    factories fall back to the XLA path for that shape."""
    if not 2 <= ntap <= 8:
        return False
    n1 = nfft // _SLIDE_LANES
    if n1 < 1 or ndf % n1:
        return False
    nrow = ndf // n1
    if nrow % nout:
        return False
    wpg = nrow // nout
    return wpg % 8 == 0 and wpg >= max(8, ntap - 1)


def make_streaming_spectra(nfft: int, ntap: int = 4, nout: int = 1,
                           stokes: bool = False, **kw):
    """Return ``step(block, history) -> (spectra, new_history)`` for the
    composed fine-channel modes; accepts 6-D or 2-D device blocks.

    On a TPU backend with ``method="auto"``, ``nfft`` in the fused-kernel
    set, and a block geometry meeting the fused tiling constraints the
    step runs ``ops.pallas_pfb.pfb_spectra_fused``; other shapes (and
    explicit ``method=``) use the XLA path — the choice is per traced
    shape, so one step object serves both.
    """
    method = kw.get("method", "auto")
    use_fused = method == "auto" and jax.default_backend() == "tpu"
    if use_fused:
        from .pallas_pfb import FUSED_NFFTS, pfb_spectra_fused

        use_fused = nfft in FUSED_NFFTS
        kw_fused = {k: v for k, v in kw.items()
                    if k not in ("method", "chunk_groups")}

    @jax.jit
    def step(block, history):
        block = _reshape_6d(block)
        if use_fused and _fused_geometry_ok(block.shape[0], nfft, ntap,
                                            nout):
            return pfb_spectra_fused(block, nfft, ntap, nout=nout,
                                     stokes=stokes, history=history,
                                     return_history=True, **kw_fused)
        return pfb_spectra(block, nfft, ntap, nout=nout, stokes=stokes,
                           history=history, return_history=True, **kw)

    return step


def make_streaming_pfb(nfft: int, ntap: int = 4,
                       chunk_groups: int | None = None, **kw):
    """Return ``step(block, history) -> (power, new_history)`` for
    stateful streaming across blocks.

    ``block`` may be the canonical 6-D array or the production 2-D device
    layout ``(ndf, nchk*3584) int16`` — the reshape happens inside the one
    jitted program, where XLA folds it into the unpack/transpose instead of
    materializing a relayout copy at a call boundary.

    On a TPU backend with ``method="auto"`` and a fused-compatible
    ``nfft``/geometry, the step runs the fused Pallas kernel
    (``ops.pallas_pfb``), which also absorbs the boundary windows
    in-kernel; incompatible shapes fall back per traced shape, and an
    explicit ``method=`` always gets the XLA formulation it names.
    """
    method = kw.get("method", "auto")
    use_fused = method == "auto" and jax.default_backend() == "tpu"
    if use_fused:
        from .pallas_pfb import (
            FUSED_NFFTS,
            pfb_power_fused,
            pfb_spectra_fused,
        )

        use_fused = nfft in FUSED_NFFTS
        kw2 = {k: v for k, v in kw.items() if k != "method"}

    @jax.jit
    def step(block, history):
        block = _reshape_6d(block)
        if use_fused and _fused_geometry_ok(block.shape[0], nfft, ntap, 1):
            if nfft == _SLIDE_LANES:
                return pfb_power_fused(block, nfft, ntap, history=history,
                                       return_history=True, **kw2)
            # generalized fused kernel (Cooley-Tukey N1 x 128); squeeze
            # the nout=1 spectra axis back to the pfb_power contract
            out, h = pfb_spectra_fused(block, nfft, ntap, history=history,
                                       return_history=True, **kw2)
            return out[0], h
        return pfb_power(block, nfft, ntap, history=history,
                         chunk_groups=chunk_groups, return_history=True,
                         **kw)

    return step
