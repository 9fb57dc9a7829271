"""JAX/XLA compute path: unpack int16 baseband -> detect |x|^2 -> integrate.

This is the TPU-native re-design of the reference's (unshipped) GPU stage
(contract: ``paf_baseband2power.cu:20-27`` usage, ``header_baseband2power.txt:
39-42`` output spec, ``README.md:2`` integration math). Instead of discrete
H2D-copy / unpack-kernel / detect-kernel / reduce-kernel launches, the whole
conversion is a single jitted expression: XLA fuses the int16->f32 convert,
square, and the first reduction stage into one pass over HBM, which is the
speed-of-light formulation for this bandwidth-bound op.

Numerical contract: accumulation is hierarchical in float32 — samples within
a frame first (<= 2^9 terms), then across frames (<= 2^13 terms) — keeping
round-off well inside the float32 parity bound vs the float64 golden model.

Input layouts accepted:
  * canonical block array  (ndf, nchk, NSAMP_DF, NCHAN_CHK, NPOL, NDIM) int16
  * raw ring-block bytes   (nbytes,) uint8  (zero-copy reinterpret on device)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import (
    DT_SIZE,
    NCHAN_CHK,
    NCHK_NIC,
    NDF_BLK,
    NDIM_POL,
    NPOL_SAMP,
    NSAMP_DF,
)


def unpack_voltage(block: jax.Array) -> jax.Array:
    """int16 I/Q block -> complex64 voltages of shape (ndf, nchk, nsamp,
    nchan_chk, npol).

    The complex view is only needed by the channelizer path; the direct
    power path never materializes it (|x|^2 needs no complex arithmetic).
    """
    x = block.astype(jnp.float32)
    return jax.lax.complex(x[..., 0], x[..., 1])


def bytes_to_block_device(raw: jax.Array, ndf: int = NDF_BLK,
                          nchk: int = NCHK_NIC) -> jax.Array:
    """Reinterpret raw ring-buffer bytes as the canonical int16 block.

    Little-endian byte pairing matches the wire format; pure bitcast, no
    data movement beyond the load itself.
    """
    pairs = raw.reshape(ndf, nchk, NSAMP_DF, NCHAN_CHK, NPOL_SAMP, NDIM_POL, 2)
    return jax.lax.bitcast_convert_type(pairs, jnp.int16)


def baseband2power(block: jax.Array, mean: bool = False) -> jax.Array:
    """Detect + integrate one block: -> float32 power per channel.

    Output shape ``(nchk * NCHAN_CHK,)`` (336 for full geometry), channel
    index = chunk * 7 + chan, matching the golden model and the reference's
    output header (NCHAN 336, NPOL 1, NDIM 1).

    Deliberately NOT jitted: this is a composable building block (used
    inside shard_map bodies and fused pipelines). A nested-jit call
    boundary forces the 6-D operand into its canonical tiled layout — a
    full-block relayout copy that triples wall clock. Callers jit the
    outermost composition.
    """
    ndf, nchk, nsamp, nchan_chk, npol, ndim = block.shape
    x = block.astype(jnp.float32)
    # Stage 1: everything inside a frame (nsamp*npol*ndim <= 512 terms).
    # XLA fuses convert+mul+reduce; layout keeps nchan_chk*... in lanes.
    partial = jnp.sum(x * x, axis=(2, 4, 5))          # (ndf, nchk, nchan_chk)
    # Stage 2: across frames (<= 8192 terms).
    power = jnp.sum(partial, axis=0)                   # (nchk, nchan_chk)
    if mean:
        power = power / (ndf * nsamp * npol)
    return power.reshape(nchk * nchan_chk)


@functools.partial(jax.jit, static_argnames=("ndf", "nchk", "mean"))
def baseband2power_bytes(raw: jax.Array, ndf: int = NDF_BLK,
                         nchk: int = NCHK_NIC, mean: bool = False) -> jax.Array:
    """Power integration straight from raw ring-block bytes (uint8)."""
    if raw.size != ndf * nchk * DT_SIZE:
        raise ValueError(
            f"raw block must be {ndf * nchk * DT_SIZE} bytes, got {raw.size}"
        )
    return baseband2power(bytes_to_block_device(raw, ndf, nchk), mean=mean)


@functools.partial(jax.jit, static_argnames=("mean",))
def baseband2power_2d(block2d: jax.Array, mean: bool = False) -> jax.Array:
    """XLA power path on the 2-D device layout ``(ndf, nchk*3584) int16``.

    The 2-D layout is the production on-device form (see pallas_power.py:
    a 6-D device array costs a full relayout copy in front of any kernel).
    The big reduce runs over the frame axis with 3584-wide lanes; the tiny
    lane fold (samples x pol x dim -> channel) happens on the reduced
    (lanes,) partial only.
    """
    ndf, lanes = block2d.shape
    if lanes % (DT_SIZE // 2):
        raise ValueError(f"lane dim {lanes} not a multiple of {DT_SIZE // 2}")
    nchk = lanes // (DT_SIZE // 2)
    x = block2d.astype(jnp.float32)
    partial = jnp.sum(x * x, axis=0)                  # (lanes,)
    power = (
        partial.reshape(nchk, NSAMP_DF, NCHAN_CHK, NPOL_SAMP * NDIM_POL)
        .sum(axis=(1, 3))
        .reshape(nchk * NCHAN_CHK)
    )
    if mean:
        power = power / (ndf * NSAMP_DF * NPOL_SAMP)
    return power


@functools.partial(jax.jit, static_argnames=("nout", "mean"))
def baseband2power_scrunch_2d(block2d: jax.Array, nout: int,
                              mean: bool = False) -> jax.Array:
    """Sub-block integration on the 2-D layout: ``(nout, nchan)`` float32.

    The frame axis splits into ``nout`` windows integrated independently
    (oracle: ``ops.golden.baseband2power_scrunch_golden``); still one fused
    pass over HBM — the reduce just keeps a window axis.
    """
    ndf, lanes = block2d.shape
    if ndf % nout:
        raise ValueError(f"nout={nout} must divide ndf={ndf}")
    if lanes % (DT_SIZE // 2):
        raise ValueError(f"lane dim {lanes} not a multiple of {DT_SIZE // 2}")
    nchk = lanes // (DT_SIZE // 2)
    ndf_w = ndf // nout
    x = block2d.reshape(nout, ndf_w, lanes).astype(jnp.float32)
    partial = jnp.sum(x * x, axis=1)                 # (nout, lanes)
    power = (
        partial.reshape(nout, nchk, NSAMP_DF, NCHAN_CHK,
                        NPOL_SAMP * NDIM_POL)
        .sum(axis=(2, 4))
        .reshape(nout, nchk * NCHAN_CHK)
    )
    if mean:
        power = power / (ndf_w * NSAMP_DF * NPOL_SAMP)
    return power


@functools.partial(jax.jit, static_argnames=("mean",))
def baseband2stokes_2d(block2d: jax.Array, mean: bool = False) -> jax.Array:
    """Full-Stokes detection on the 2-D device layout (capability
    extension; definitions in ``ops.golden.baseband2stokes_golden``).

    Same single pass over HBM as the power path — the extra Stokes
    parameters are elementwise products XLA fuses into the load. The big
    reduce runs over the frame axis on (lanes/4)-wide complex groups; the
    sample fold happens on the reduced partials only. Output ``(4, nchan)``
    float32, ordered I, Q, U, V; row 0 equals ``baseband2power_2d`` (sum
    mode).
    """
    ndf, lanes = block2d.shape
    if lanes % (DT_SIZE // 2):
        raise ValueError(f"lane dim {lanes} not a multiple of {DT_SIZE // 2}")
    nchk = lanes // (DT_SIZE // 2)
    # lanes order within a chunk: [nsamp, nchan, pol, dim]
    v = block2d.reshape(ndf, lanes // 4, 2, 2).astype(jnp.float32)
    xr, xi = v[..., 0, 0], v[..., 0, 1]
    yr, yi = v[..., 1, 0], v[..., 1, 1]
    xx = jnp.sum(xr * xr + xi * xi, axis=0)          # (groups,)
    yy = jnp.sum(yr * yr + yi * yi, axis=0)
    re = jnp.sum(xr * yr + xi * yi, axis=0)          # Re(x y*)
    im = jnp.sum(xi * yr - xr * yi, axis=0)          # Im(x y*)
    partial = jnp.stack([xx + yy, xx - yy, 2 * re, 2 * im])
    stokes = (
        partial.reshape(4, nchk, NSAMP_DF, NCHAN_CHK)
        .sum(axis=2)
        .reshape(4, nchk * NCHAN_CHK)
    )
    if mean:
        stokes = stokes / (ndf * NSAMP_DF)
    return stokes


@functools.partial(jax.jit, static_argnames=("nout", "mean"))
def baseband2stokes_scrunch_2d(block2d: jax.Array, nout: int,
                               mean: bool = False) -> jax.Array:
    """Composed Stokes x sub-block integration on the 2-D device layout:
    ``(nout, 4, nchan)`` float32 (oracle:
    ``ops.golden.baseband2stokes_scrunch_golden``).

    Same single fused HBM pass as ``baseband2stokes_2d`` — the reduce just
    keeps a window axis (the scrunch composition the reference's
    one-integration-per-block design precludes, README.md:2).
    """
    ndf, lanes = block2d.shape
    if ndf % nout:
        raise ValueError(f"nout={nout} must divide ndf={ndf}")
    if lanes % (DT_SIZE // 2):
        raise ValueError(f"lane dim {lanes} not a multiple of {DT_SIZE // 2}")
    nchk = lanes // (DT_SIZE // 2)
    ndf_w = ndf // nout
    v = block2d.reshape(nout, ndf_w, lanes // 4, 2, 2).astype(jnp.float32)
    xr, xi = v[..., 0, 0], v[..., 0, 1]
    yr, yi = v[..., 1, 0], v[..., 1, 1]
    xx = jnp.sum(xr * xr + xi * xi, axis=1)          # (nout, groups)
    yy = jnp.sum(yr * yr + yi * yi, axis=1)
    re = jnp.sum(xr * yr + xi * yi, axis=1)
    im = jnp.sum(xi * yr - xr * yi, axis=1)
    partial = jnp.stack([xx + yy, xx - yy, 2 * re, 2 * im], axis=1)
    stokes = (
        partial.reshape(nout, 4, nchk, NSAMP_DF, NCHAN_CHK)
        .sum(axis=3)
        .reshape(nout, 4, nchk * NCHAN_CHK)
    )
    if mean:
        stokes = stokes / (ndf_w * NSAMP_DF)
    return stokes


@functools.partial(jax.jit, static_argnames=("nout", "mean"))
def baseband2power_scrunch_rows(rows2d: jax.Array, nout: int = 1,
                                mean: bool = False) -> jax.Array:
    """Power integration of a host-corner-turned series-row block
    (the capture engine's ``device_layout`` mode): int16
    ``(nseries, ndf*256)`` with ``nseries = nchk*7*2`` -> ``(nout, nchan)``
    float32 (squeeze ``nout=1`` for the plain-power record).

    |x|^2 is layout-independent, so this is the same single fused HBM
    pass as the wire-layout path — only the tiny per-series fold differs.
    A 3-D ``(nseries, ndf, 256)`` rows block (the preferred device form —
    see ``pallas_pfb.pfb_spectra_fused``'s layout note) is accepted
    directly; the window split then only divides the frame axis, a
    layout-preserving reshape.
    """
    if rows2d.ndim == 3:
        nseries, ndf, l = rows2d.shape
        cols = ndf * l
        x = rows2d
    else:
        nseries, cols = rows2d.shape
        ndf = cols // (2 * NSAMP_DF)
        x = rows2d.reshape(nseries, ndf, 2 * NSAMP_DF)
    nchan = nseries // NPOL_SAMP
    if cols % (2 * NSAMP_DF) or ndf % nout:
        raise ValueError(
            f"nout={nout} must divide the {ndf} frames per block "
            "(windows align to whole frames, matching the wire path)")
    x = x.reshape(nseries, nout, ndf // nout, x.shape[-1]
                  ).astype(jnp.float32)
    partial = jnp.sum(x * x, axis=(2, 3))             # (nseries, nout)
    power = partial.reshape(nchan, NPOL_SAMP, nout).sum(axis=1)
    power = power.T                                   # (nout, nchan)
    if mean:
        power = power / (cols // nout // 2 * NPOL_SAMP)
    return power


def power_step(block: jax.Array) -> jax.Array:
    """The flagship single-chip forward step (jittable, donate-friendly)."""
    if block.ndim == 2:
        return baseband2power_2d(block)
    return baseband2power(block)
