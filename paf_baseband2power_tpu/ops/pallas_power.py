"""Pallas TPU kernel: fused unpack -> |x|^2 -> integrate.

This is the speed-of-light implementation of the reference's (unshipped)
compute stage (contract in ``paf_baseband2power.cu:20-27`` + ``README.md:2``).
Design notes, arrived at by measurement on v5e:

* **Device block layout is 2-D**: ``(ndf, nchk * 3584) int16``, where 3584 =
  128 samples x 7 channels x 2 pols x 2 dims — the frame payload unrolled
  into lanes. The byte order is identical to the canonical 6-D TFTFP block
  (it is a pure host-side ``reshape``), but keeping the *device* array 2-D
  is load-bearing: feeding a 6-D array (or reshaping on device) makes XLA
  materialize a full 2.8 GB tiled-relayout copy in front of the kernel,
  which caps throughput at ~70 GB/s. With the native 2-D layout the kernel
  streams at ~740 GB/s steady-state (~90% of v5e HBM peak; tile-shape
  sweeps from 0.3-8 MB tiles all land within noise of this — the kernel
  is HBM-bound, not schedule-bound).

* **Grid**: ``(lane_tiles, time_tiles)`` with time innermost. Each step DMAs
  a contiguous ``(tdf, lanes/nlt)`` int16 tile HBM->VMEM, converts to f32,
  squares, and accumulates into an ``(8, lanes/nlt)`` f32 VMEM accumulator
  (8 sublane rows keep the VPU fully occupied; rows hold time-mod-8
  partials). The accumulator is zeroed at the first time step and written
  back once per lane tile — output traffic is negligible.

* **Final fold** (tiny, left to XLA): sum the 8 rows, then regroup lanes
  ``(nchk, 128, 7, 4) -> sum(samples, pol x dim) -> (nchk, 7)`` giving the
  336-channel power vector, chunk-major — the reference's output channel
  order (``header_baseband2power.txt:42``).

Accumulation depth per output value is <= 8192/8 * 512 terms in f32 after
the in-kernel row split, matching the golden model within 1e-5 relative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import DT_SIZE, NCHAN_CHK, NCHK_NIC, NDF_BLK, NPOL_SAMP

LANES_PER_CHUNK = DT_SIZE // 2          # 3584 int16 lanes per chunk-frame
_FOLD = 4                               # pol x dim lanes folded per channel


def pack_block_2d(block6d):
    """Host-side: canonical 6-D block -> 2-D device layout (zero copy)."""
    ndf = block6d.shape[0]
    return block6d.reshape(ndf, -1)


def _power_kernel(x_ref, o_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    tdf = x_ref.shape[0]
    x = x_ref[:].astype(jnp.float32)
    sq = x * x
    if tdf > 8:
        sq = jnp.sum(sq.reshape(tdf // 8, 8, x.shape[1]), axis=0)
    o_ref[:] += sq


def _pick_tiles(ndf: int, lanes: int) -> tuple[int, int]:
    """Choose (time tile, lane tiles) fitting comfortably in VMEM."""
    tdf = 64
    while tdf > 8 and ndf % tdf:
        tdf //= 2
    if ndf % tdf:
        raise ValueError(f"ndf={ndf} must be a multiple of 8")
    # keep the in-tile around ~1-2 MB: tdf * (lanes/nlt) * 2 bytes
    nlt = 1
    while (
        tdf * (lanes // nlt) * 2 > 2 ** 21
        and lanes % (nlt * 2) == 0
        and (lanes // (nlt * 2)) % 128 == 0
    ):
        nlt *= 2
    return tdf, nlt


@functools.partial(jax.jit, static_argnames=("mean", "interpret"))
def baseband2power_pallas(block2d: jax.Array, mean: bool = False,
                          interpret: bool = False) -> jax.Array:
    """Power integration of a 2-D device block -> (nchan,) float32.

    ``block2d``: int16 ``(ndf, nchk * 3584)`` in wire byte order. Use
    ``pack_block_2d`` (host) to view a canonical 6-D block this way.
    """
    ndf, lanes = block2d.shape
    if lanes % LANES_PER_CHUNK:
        raise ValueError(f"lane dim {lanes} not a multiple of {LANES_PER_CHUNK}")
    nchk = lanes // LANES_PER_CHUNK
    tdf, nlt = _pick_tiles(ndf, lanes)
    lt = lanes // nlt

    part = pl.pallas_call(
        _power_kernel,
        grid=(nlt, ndf // tdf),
        in_specs=[
            pl.BlockSpec((tdf, lt), lambda l, t: (t, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, lt), lambda l, t: (0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, lanes), jnp.float32),
        interpret=interpret,
    )(block2d)

    power = (
        part.sum(axis=0)
        .reshape(nchk, 128, NCHAN_CHK, _FOLD)
        .sum(axis=(1, 3))
        .reshape(nchk * NCHAN_CHK)
    )
    if mean:
        power = power / (ndf * 128 * 2)
    return power


def baseband2power_pallas_bytes(raw: jax.Array, ndf: int = NDF_BLK,
                                nchk: int = NCHK_NIC, **kw) -> jax.Array:
    """Power from raw uint8 ring-block bytes (device-side bitcast)."""
    pairs = raw.reshape(ndf, nchk * LANES_PER_CHUNK, 2)
    block2d = jax.lax.bitcast_convert_type(pairs, jnp.int16)
    return baseband2power_pallas(block2d, **kw)


def _scrunch_fused_kernel(ndf_w: int):
    """Small-window scrunch tile: whole windows per tile, fully fused.

    Lane tiles are exactly one frequency chunk (3584 lanes), so the whole
    reduction finishes in-kernel and each tile stores its own block once —
    no read-modify-write, no zero-init, no big partial for XLA to re-read
    (the (nout, lanes) f32 partial is 704 MB at nout=1024 and its strided
    regroup alone cost ~5 ms, half the block time). Stages:

      1. window sums: contiguous ``ndf_w``-row sublane groups;
      2. pol/dim fold: two lane rolls sum each aligned 4-lane group;
      3. sample fold: a cyclic roll tree at stride 28 — the orbit of
         ``l + 28j (mod 3584)`` visits each of the 128 sample positions of
         lane ``l``'s (channel, pol) class exactly once, so after
         log2(128) doubling steps every lane holds its class's full sum;
      4. compact: channel c's total sits at lane 4c of the (now
         redundant) first 128 lanes; gather to lanes 0..6 and store
         ``(wpt, 128)``.

    Output HBM traffic is 128 f32 per window-chunk — negligible against
    the int16 stream (vs 25% extra for a (nout, lanes) partial store).
    """
    def kernel(x_ref, o_ref):
        tdf = x_ref.shape[0]
        lt = x_ref.shape[1]             # == LANES_PER_CHUNK
        x = x_ref[:].astype(jnp.float32)
        sq = x * x
        if ndf_w > 1:
            sq = jnp.sum(sq.reshape(tdf // ndf_w, ndf_w, lt), axis=1)
        v = sq + pltpu.roll(sq, lt - 1, 1)
        v = v + pltpu.roll(v, lt - 2, 1)
        d = _FOLD * NCHAN_CHK           # 28 lanes per sample
        while d < lt:
            v = v + pltpu.roll(v, lt - d, 1)
            d *= 2
        head = v[:, 0:128]
        out = head
        lane = jax.lax.broadcasted_iota(jnp.int32, head.shape, 1)
        for c in range(1, NCHAN_CHK):
            out = jnp.where(lane == c, pltpu.roll(head, 128 - 3 * c, 1),
                            out)
        o_ref[:] = out

    return kernel


def _make_scrunch_kernel(tiles_per_window: int, fold_rows: bool):
    """``fold_rows``: reduce each window to ONE sublane row in-kernel,
    packing 8 consecutive windows per (8, lt) output block (dynamic row
    store). Costs some VPU occupancy on the add but divides partial-output
    HBM traffic by 8 — the right trade once nout is large enough that the
    (nout*8, lanes) partial rivals the input stream."""
    tpw = tiles_per_window

    def kernel(x_ref, o_ref):
        t = pl.program_id(1)
        tdf = x_ref.shape[0]
        if fold_rows:
            @pl.when(t % (8 * tpw) == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)

            x = x_ref[:].astype(jnp.float32)
            row = (t // tpw) % 8
            s = jnp.sum(x * x, axis=0, keepdims=True)
            o_ref[pl.ds(row, 1), :] += s
        else:
            @pl.when(t % tpw == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)

            x = x_ref[:].astype(jnp.float32)
            sq = x * x
            if tdf > 8:
                sq = jnp.sum(sq.reshape(tdf // 8, 8, x.shape[1]), axis=0)
            if sq.shape[0] == o_ref.shape[0]:
                o_ref[:] += sq
            else:
                # sub-8-frame windows: accumulate into the leading rows;
                # the final fold ignores the zero tail
                o_ref[0:sq.shape[0], :] += sq

    return kernel


@functools.partial(jax.jit, static_argnames=("nout", "mean", "interpret"))
def baseband2power_scrunch_pallas(block2d: jax.Array, nout: int,
                                  mean: bool = False,
                                  interpret: bool = False) -> jax.Array:
    """Sub-block integration (``nout`` spectra per block) -> (nout, nchan).

    Same streaming structure as ``baseband2power_pallas``; the grid's time
    axis is split into ``nout`` windows, each owning its own (8, lanes)
    accumulator row-group in the output ref (zeroed when the window's
    first tile arrives). Extra output traffic is nout*32KB per lane tile —
    negligible until nout reaches thousands.
    """
    ndf, lanes = block2d.shape
    if ndf % nout:
        raise ValueError(f"nout={nout} must divide ndf={ndf}")
    if lanes % LANES_PER_CHUNK:
        raise ValueError(f"lane dim {lanes} not a multiple of {LANES_PER_CHUNK}")
    nchk = lanes // LANES_PER_CHUNK
    ndf_w = ndf // nout

    # Small windows: whole windows per tile, pure store — measured 2.4x
    # over the dynamic-row fold path at nout=1024 full geometry.
    wpt = 0
    if ndf_w <= 32:
        for cand in (32, 16, 8):
            if nout % cand == 0 and ndf_w * cand <= 256:
                wpt = cand
                break
    if wpt:
        tdf = wpt * ndf_w
        part = pl.pallas_call(
            _scrunch_fused_kernel(ndf_w),
            grid=(nchk, ndf // tdf),
            in_specs=[
                pl.BlockSpec((tdf, LANES_PER_CHUNK), lambda l, t: (t, l),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((wpt, 128), lambda l, t: (t, l),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nout, nchk * 128),
                                           jnp.float32),
            interpret=interpret,
        )(block2d)
        power = (part.reshape(nout, nchk, 128)[:, :, :NCHAN_CHK]
                 .reshape(nout, nchk * NCHAN_CHK))
        if mean:
            power = power / (ndf_w * 128 * 2)
        return power
    else:
        if ndf_w % 8 == 0:
            tdf, nlt = _pick_tiles(ndf_w, lanes)
        else:
            # tiny windows (< 8 frames) not divisible into store tiles:
            # one input tile per window
            tdf, nlt = ndf_w, 1
            while (
                tdf * (lanes // nlt) * 2 > 2 ** 21
                and lanes % (nlt * 2) == 0
                and (lanes // (nlt * 2)) % 128 == 0
            ):
                nlt *= 2
        lt = lanes // nlt
        tpw = ndf_w // tdf
        # fold when the (nout*8, lanes) partial would rival the input
        # stream (Mosaic wants 8-divisible output sublanes, so the fold
        # packs 8 windows per block and needs 8 | nout)
        fold_rows = nout >= 64 and nout % 8 == 0

        rows = 1 if fold_rows else 8
        tiles_per_block = tpw * (8 if fold_rows else 1)
        part = pl.pallas_call(
            _make_scrunch_kernel(tpw, fold_rows),
            grid=(nlt, ndf // tdf),
            in_specs=[
                pl.BlockSpec((tdf, lt), lambda l, t: (t, l),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (8, lt),
                lambda l, t, tpb=tiles_per_block: (t // tpb, l),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nout * rows, lanes),
                                           jnp.float32),
            interpret=interpret,
        )(block2d)

    power = (
        part.reshape(nout, rows, lanes).sum(axis=1)
        .reshape(nout, nchk, 128, NCHAN_CHK, _FOLD)
        .sum(axis=(2, 4))
        .reshape(nout, nchk * NCHAN_CHK)
    )
    if mean:
        power = power / (ndf_w * 128 * 2)
    return power


def _make_stokes_scrunch_kernel(tpw: int, wpb: int):
    """Stokes x sub-block integration tile (one frequency chunk wide).

    The four cross-product banks of ``_stokes_kernel``, each folded to ONE
    sublane row per window (``_make_scrunch_kernel`` fold pattern, two
    windows per (8, 128) output block) AND sample-folded in-kernel by the
    ``_scrunch_fused_kernel`` stride-28 roll-orbit — so output HBM traffic
    is 128 floats per (window, bank, chunk). The obvious alternative —
    store (nout*4, lanes) bank partials and fold in XLA — is 2.8 GB of
    partials at nout=1024 whose ``(..., 7, 4)`` epilogue reshape XLA lays
    out T(8,128)-padded at 90 GB (measured OOM).

    Unlike the power orbit, pol/dim components must stay distinct (the
    Stokes algebra selects them per bank), so the orbit starts at the full
    28-lane (chan x comp) class stride with no pre-fold: after the tree,
    lane ``l`` of the head 128 holds its ``(chan, comp) = (l//4, l%4)``
    class summed over all 128 sample positions.
    """

    def kernel(x_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t % (tpw * wpb) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        x = x_ref[:].astype(jnp.float32)
        lt = x.shape[1]                       # == LANES_PER_CHUNK
        r1 = pltpu.roll(x, lt - 1, 1)
        r2 = pltpu.roll(x, lt - 2, 1)
        r3 = pltpu.roll(x, lt - 3, 1)
        row = ((t // tpw) % wpb) * 4

        def fold(prod):
            v = jnp.sum(prod, axis=0, keepdims=True)     # (1, 3584)
            d = _FOLD * NCHAN_CHK                        # 28-lane classes
            while d < lt:
                v = v + pltpu.roll(v, lt - d, 1)
                d *= 2
            return v[:, 0:128]

        o_ref[pl.ds(row, 1), :] += fold(x * x)
        o_ref[pl.ds(row + 1, 1), :] += fold(x * r2)
        o_ref[pl.ds(row + 2, 1), :] += fold(x * r1)
        o_ref[pl.ds(row + 3, 1), :] += fold(x * r3)

    return kernel


@functools.partial(jax.jit, static_argnames=("nout", "mean", "interpret"))
def baseband2stokes_scrunch_pallas(block2d: jax.Array, nout: int,
                                   mean: bool = False,
                                   interpret: bool = False) -> jax.Array:
    """Composed Stokes x sub-block integration -> ``(nout, 4, nchan)``.

    Same lane-roll cross products as ``baseband2stokes_pallas``, same
    window structure as ``baseband2power_scrunch_pallas`` (oracle:
    ``ops.golden.baseband2stokes_scrunch_golden``). The XLA formulation
    (``ops.power.baseband2stokes_scrunch_2d``) is impractical at full
    geometry on v5e: its strided re/im extraction with a window axis
    neither compiles nor runs in bounded time. Measured (v5e, full
    geometry): nout=64 ~43 ms/block (~21x real time).
    """
    ndf, lanes = block2d.shape
    if ndf % nout:
        raise ValueError(f"nout={nout} must divide ndf={ndf}")
    if lanes % LANES_PER_CHUNK:
        raise ValueError(f"lane dim {lanes} not a multiple of {LANES_PER_CHUNK}")
    if nout % 2:
        raise ValueError(f"nout={nout} must be even (2 windows per "
                         "output block)")
    nchk = lanes // LANES_PER_CHUNK
    ndf_w = ndf // nout
    wpb = 2
    # time tile: a power-of-two slice of one window, <= 512 KB of int16
    # per chunk-wide tile (the four product banks live as (tdf, 3584) f32
    # temporaries against the 16 MB scoped-vmem budget)
    tdf = _pow2_tile(ndf_w, LANES_PER_CHUNK * 2)
    tpw = ndf_w // tdf

    part = pl.pallas_call(
        _make_stokes_scrunch_kernel(tpw, wpb),
        grid=(nchk, ndf // tdf),
        in_specs=[
            pl.BlockSpec((tdf, LANES_PER_CHUNK), lambda l, t: (t, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4 * wpb, 128),
            lambda l, t, tpb=tpw * wpb: (t // tpb, l),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nout * 4, nchk * 128), jnp.float32),
        interpret=interpret,
    )(block2d)

    # epilogue on (chan x comp) classes via strided lane slices — never
    # exposing a tiny (7, 4) minor-dim pair XLA would tile-pad
    g = part.reshape(nout, 4, nchk, 128)
    g0, g1, g2, g3 = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
    xx = g0[..., 0:28:4] + g0[..., 1:28:4]           # |x|^2 per chan
    yy = g0[..., 2:28:4] + g0[..., 3:28:4]           # |y|^2
    re = g1[..., 0:28:4] + g1[..., 1:28:4]           # Re(x y*)
    im = g2[..., 1:28:4] - g3[..., 0:28:4]           # Im(x y*)
    stokes = jnp.stack([xx + yy, xx - yy, 2 * re, 2 * im], axis=1)
    stokes = stokes.reshape(nout, 4, nchk * NCHAN_CHK)
    if mean:
        stokes = stokes / (ndf_w * 128)
    return stokes


def _as_rows3d(rows: jax.Array) -> jax.Array:
    """Normalize a series-row block to 3-D ``(nseries, ndf, 256)``.

    The 2-D flattening is accepted for compatibility but costs a full
    tiled-relayout copy on device (see ``pfb_spectra_fused``'s layout
    note); misaligned inputs get the informative wrong-layout error
    instead of an opaque reshape failure.
    """
    if rows.ndim == 2:
        nseries, cols = rows.shape
        if cols % 256:
            raise ValueError(
                f"series rows need 256-lane frame segments, got {cols} "
                "columns — is this a wire-order block passed as rows?")
        rows = rows.reshape(nseries, cols // 256, 256)
    if rows.shape[-1] != 256:
        raise ValueError(f"series rows need 256 lanes per frame, got "
                         f"{rows.shape[-1]}")
    return rows


def _pow2_tile(ndf_w: int, unit_bytes: int, budget: int = 2 ** 19) -> int:
    """Largest power-of-two frame tile dividing ``ndf_w`` within the VMEM
    budget (``unit_bytes`` per frame row). Power-of-two is load-bearing:
    a non-power-of-two whole-window tile (e.g. 24 or 550 sublanes) is
    exactly the shape class interpret mode accepts and the real Mosaic
    lowering rejects (the r3 finding this round's parity sweep exists
    for)."""
    tdf = 1 << (max(ndf_w, 1).bit_length() - 1)
    while tdf > 8 and (ndf_w % tdf or tdf * unit_bytes > budget):
        tdf //= 2
    if ndf_w % tdf:
        raise ValueError(f"window of {ndf_w} frames has no power-of-two "
                         "tile split")
    return tdf


def _make_stokes_rows_kernel(tpw: int, wpb: int):
    """Stokes (x tscrunch) on host-corner-turned series rows.

    The rows layout makes polarimetry nearly free: a (chunk, chan) pair's
    x and y series are adjacent rows with (re, im) interleaved on lanes,
    so ``sum(x*y)`` IS ``Re(x y*)`` summed, and ``Im`` needs only the
    pair-swap roll (``sum(alt * x * swap(y))``) — 2 rolls + 4 products
    per element vs the wire kernel's 3 cross-lane rolls + 4 products over
    4-lane groups. Four quantity rows per window, ``wpb`` windows per
    (8, lanes) output block (dynamic stores, ``_make_scrunch_kernel``
    pattern). Tiles are (1, 2, R, 256) native-layout frame rows — any
    wider row view forces a full device relayout of the input (measured:
    the r3 2048-lane view cost ~40 ms/block at full geometry, 6x the
    kernel itself).
    """

    def kernel(x_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t % (tpw * wpb) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        x = x_ref[0, 0].astype(jnp.float32)
        y = x_ref[0, 1].astype(jnp.float32)
        lt = x.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        even = (lane % 2) == 0
        alt = jnp.where(even, -1.0, 1.0)
        ysw = jnp.where(even, pltpu.roll(y, lt - 1, 1),
                        pltpu.roll(y, 1, 1))
        row = ((t // tpw) % wpb) * 4
        o_ref[pl.ds(row, 1), :] += jnp.sum(x * x, axis=0, keepdims=True)
        o_ref[pl.ds(row + 1, 1), :] += jnp.sum(y * y, axis=0,
                                               keepdims=True)
        o_ref[pl.ds(row + 2, 1), :] += jnp.sum(x * y, axis=0,
                                               keepdims=True)
        o_ref[pl.ds(row + 3, 1), :] += jnp.sum(alt * x * ysw, axis=0,
                                               keepdims=True)

    return kernel


def _make_stokes_rows_packed_kernel(ndf_w: int, wpt: int):
    """Small-window rows Stokes tile: ``wpt`` WHOLE windows per tile,
    pure store (no read-modify-write, no zero-init). At high nout the
    accumulating kernel degenerates to one grid step per (pair, window
    sub-tile) — 344k steps of 8 KB DMAs at nout=1024 measured 84.9 ms;
    packing 8 windows per (32, 256) output block cuts the grid 8x."""

    def kernel(x_ref, o_ref):
        x = x_ref[0, 0].astype(jnp.float32)     # (wpt*ndf_w, 256)
        y = x_ref[0, 1].astype(jnp.float32)
        lt = x.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        even = (lane % 2) == 0
        alt = jnp.where(even, -1.0, 1.0)
        ysw = jnp.where(even, pltpu.roll(y, lt - 1, 1),
                        pltpu.roll(y, 1, 1))

        def wfold(v):
            return jnp.sum(v.reshape(wpt, ndf_w, lt), axis=1)

        out = jnp.stack([wfold(x * x), wfold(y * y),
                         wfold(x * y), wfold(alt * x * ysw)], axis=1)
        o_ref[:] = out.reshape(4 * wpt, lt)     # rows (window, quantity)

    return kernel


@functools.partial(jax.jit, static_argnames=("nout", "mean", "interpret"))
def baseband2stokes_scrunch_rows_pallas(rows: jax.Array, nout: int = 1,
                                        mean: bool = False,
                                        interpret: bool = False
                                        ) -> jax.Array:
    """Stokes (x sub-block integration) from series-row blocks ->
    ``(nout, 4, nchan)`` float32 (oracle:
    ``ops.golden.baseband2stokes_scrunch_golden``; ``nout=1`` for plain
    Stokes). Input: int16 ``(nseries, ndf, 256)`` series rows as the
    capture engine's ``device_layout`` mode delivers (a 2-D
    ``(nseries, ndf*256)`` flattening is accepted, but costs a full
    tiled-relayout copy on device — put rows blocks 3-D; see
    ``pfb_spectra_fused``'s layout note).

    The tiles consume the natural (8, 128)-tiled rows layout directly:
    ``(1, 2, R, 256)`` blocks — one (chunk, channel) pair's x and y
    series, R frames at a time. The r3 formulation viewed 8 frames as one
    2048-lane row, which forced a device relayout of the whole 2.8 GB
    block in front of the kernel (the same trap the wire kernels dodge by
    staying 2-D) — with the native-view tiles the kernel streams at the
    input layout and the relayout disappears.
    """
    rows = _as_rows3d(rows)
    nseries, ndf, _lanes = rows.shape
    npair = nseries // 2
    if ndf % nout:
        raise ValueError(f"nout={nout} must divide {ndf} frames")
    wpb = 2 if nout % 2 == 0 and nout > 1 else 1
    ndf_w = ndf // nout

    # small windows: whole windows per tile (pure store) — see the packed
    # kernel's note; wpt even keeps output blocks 8-sublane aligned, and
    # the power-of-two ndf_w requirement keeps the input tile in the
    # shape class the real Mosaic lowering accepts (same rationale as
    # _pow2_tile — odd tiles pass interpret mode and fail on chip);
    # other window sizes take the general accumulating path below
    pow2_w = ndf_w & (ndf_w - 1) == 0
    wpt = next((w for w in (8, 4, 2)
                if pow2_w and nout % w == 0 and w * ndf_w <= 256), 0)
    if wpt:
        tile = wpt * ndf_w
        rows4 = rows.reshape(npair, 2, ndf, 256)
        part = pl.pallas_call(
            _make_stokes_rows_packed_kernel(ndf_w, wpt),
            grid=(npair, ndf // tile),
            in_specs=[
                pl.BlockSpec((1, 2, tile, 256), lambda p, t: (p, 0, t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (4 * wpt, 256),
                lambda p, t, npt=nout // wpt: (p * npt + t, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((npair * nout * 4, 256),
                                           jnp.float32),
            interpret=interpret,
        )(rows4)
        g = part.reshape(npair, nout, 4, 256).sum(axis=3)
        xx, yy = g[..., 0], g[..., 1]
        re, im = g[..., 2], g[..., 3]
        stokes = jnp.stack([xx + yy, xx - yy, 2 * re, 2 * im], axis=-1)
        stokes = stokes.transpose(1, 2, 0)
        if mean:
            stokes = stokes / (ndf_w * 128)
        return stokes
    # time tile: power-of-two frame rows, <= 256 KB int16 per pol slab
    # (f32 temporaries x/y/swap/products are (R, 256)-sized against the
    # 16 MB scoped-vmem budget)
    tdf = _pow2_tile(ndf_w, 256 * 2 * 2)
    tpw = ndf_w // tdf

    rows4 = rows.reshape(npair, 2, ndf, 256)    # leading split: no relayout
    # output blocks are always 8 sublanes (Mosaic tiling requirement):
    # wpb=2 packs two windows' 4 quantity rows; wpb=1 wastes rows 4..7
    bpp = nout // wpb                       # 8-row blocks per pair
    part = pl.pallas_call(
        _make_stokes_rows_kernel(tpw, wpb),
        grid=(npair, ndf // tdf),
        in_specs=[
            pl.BlockSpec((1, 2, tdf, 256), lambda p, t: (p, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, 256),
            lambda p, t, tpb=tpw * wpb: (p * bpp + t // tpb, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npair * bpp * 8, 256),
                                       jnp.float32),
        interpret=interpret,
    )(rows4)

    g = part.reshape(npair, bpp, 8, 256)
    g = (g.reshape(npair, nout, 4, 256) if wpb == 2
         else g[:, :, :4, :])
    g = g.sum(axis=3)                                   # lane fold
    xx, yy = g[..., 0], g[..., 1]
    re, im = g[..., 2], g[..., 3]
    stokes = jnp.stack([xx + yy, xx - yy, 2 * re, 2 * im], axis=-1)
    stokes = stokes.transpose(1, 2, 0)                  # (nout, 4, nchan)
    if mean:
        stokes = stokes / (ndf_w * 128)
    return stokes


def _stokes_kernel(x_ref, o_ref):
    """Fused full-Stokes detection tile.

    Cross-polarization products are computed lane-parallel via lane rolls:
    within every 4-lane group (xr, xi, yr, yi), roll(-2) aligns y under x
    and roll(-1)/roll(-3) align the mixed re/im partners. Useful lanes
    never cross a group boundary, so the rotate wraparound only lands in
    lanes the final fold discards. Four (8, lt) accumulators ride in one
    (32, lt) output ref — output traffic stays negligible vs the int16
    stream.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    tdf = x_ref.shape[0]
    x = x_ref[:].astype(jnp.float32)
    # roll requires non-negative shifts: shift lt-k == np.roll(x, -k)
    lt = x.shape[1]
    r1 = pltpu.roll(x, lt - 1, 1)
    r2 = pltpu.roll(x, lt - 2, 1)
    r3 = pltpu.roll(x, lt - 3, 1)

    def fold(v):
        if tdf > 8:
            v = jnp.sum(v.reshape(tdf // 8, 8, v.shape[1]), axis=0)
        return v

    o_ref[0:8, :] += fold(x * x)    # lanes 4k..4k+3: xr2, xi2, yr2, yi2
    o_ref[8:16, :] += fold(x * r2)  # lane 4k: xr*yr; 4k+1: xi*yi
    o_ref[16:24, :] += fold(x * r1)  # lane 4k+1: xi*yr
    o_ref[24:32, :] += fold(x * r3)  # lane 4k:   xr*yi


@functools.partial(jax.jit, static_argnames=("mean", "interpret"))
def baseband2stokes_pallas(block2d: jax.Array, mean: bool = False,
                           interpret: bool = False) -> jax.Array:
    """Full-Stokes detection of a 2-D device block -> (4, nchan) float32.

    Same streaming structure as ``baseband2power_pallas``; the XLA
    formulation of the cross products (``ops.power.baseband2stokes_2d``)
    costs a strided-relayout pass that caps it at ~45 GB/s on v5e, while
    this kernel keeps the int16 stream contiguous. Output rows I, Q, U, V
    (definitions: ``ops.golden.baseband2stokes_golden``).

    Unlike the power kernel this one is VPU-issue-bound, not HBM-bound:
    full Stokes needs ~11 vector ops per element (convert + 3 lane rolls +
    4 products + per-bank time folds) vs ~3 for power, and v5e measures
    ~380 GB/s vs the ~760 GB/s stream floor. Measured dead ends (r2,
    probe study): 3-bank merged products 364, larger time tiles (tdf
    128-256) 359-365, single-row in-kernel folds 339, MXU ones-dot time
    folds 253-350 (an M=1 matmul stalls the pipeline), int16-input rolls
    (Mosaic compile error). The op mix {rolls of lane distance 1,2,3 +
    >=3 products} is irreducible for this layout, so ~380 GB/s (~112x
    real time) is the kernel's speed of light on this generation.
    """
    ndf, lanes = block2d.shape
    if lanes % LANES_PER_CHUNK:
        raise ValueError(f"lane dim {lanes} not a multiple of {LANES_PER_CHUNK}")
    nchk = lanes // LANES_PER_CHUNK
    tdf, nlt = _pick_tiles(ndf, lanes)
    lt = lanes // nlt

    part = pl.pallas_call(
        _stokes_kernel,
        grid=(nlt, ndf // tdf),
        in_specs=[
            pl.BlockSpec((tdf, lt), lambda l, t: (t, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((32, lt), lambda l, t: (0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, lanes), jnp.float32),
        interpret=interpret,
    )(block2d)

    # tiny final fold in XLA: (4 accumulators, 8 rows, lanes) -> select the
    # useful lanes per group and integrate over samples
    g = part.reshape(4, 8, lanes).sum(axis=1)
    g = g.reshape(4, nchk, 128, NCHAN_CHK, _FOLD).sum(axis=2)  # (4,chk,7,4)
    xx = g[0, ..., 0] + g[0, ..., 1]
    yy = g[0, ..., 2] + g[0, ..., 3]
    re = g[1, ..., 0] + g[1, ..., 1]          # Re(x y*)
    im = g[2, ..., 1] - g[3, ..., 0]          # Im(x y*) = xi*yr - xr*yi
    stokes = jnp.stack([xx + yy, xx - yy, 2 * re, 2 * im])
    stokes = stokes.reshape(4, nchk * NCHAN_CHK)
    if mean:
        stokes = stokes / (ndf * 128)
    return stokes


def _rows_power_kernel(tpw: int, sg_n: int):
    def kernel(x_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t % tpw == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        x = x_ref[:].astype(jnp.float32)        # (sg_n series, R, 256)
        # output blocks stay 8 sublanes (Mosaic tiling); rows past sg_n
        # are dead when nseries isn't 8-divisible (nchk not 4k)
        o_ref[0:sg_n] += jnp.sum(x * x, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("nout", "mean", "interpret"))
def baseband2power_scrunch_rows_pallas(rows: jax.Array, nout: int = 1,
                                       mean: bool = False,
                                       interpret: bool = False
                                       ) -> jax.Array:
    """Power (x sub-block integration) from series-row blocks ->
    ``(nout, nchan)`` float32 (oracle:
    ``ops.golden.baseband2power_scrunch_golden``; squeeze ``nout=1`` for
    the plain-power record). Input: int16 ``(nseries, ndf, 256)`` rows as
    the capture engine's ``device_layout`` mode delivers (2-D flattening
    accepted with the usual relayout caveat).

    Same streaming structure as the wire power kernel — |x|^2 is
    layout-independent — with tiles of 8 series x R frames consuming the
    natural rows tiling, so device-layout captures get the same
    HBM-bound plain-power path as wire ones.
    """
    rows = _as_rows3d(rows)
    nseries, ndf, _lanes = rows.shape
    if ndf % nout:
        raise ValueError(f"nout={nout} must divide {ndf} frames")
    # series per tile: nseries = nchk*14, so 8 | nseries only when
    # 4 | nchk; fall back to the largest divisor (7 covers nchk 1, 2)
    sg_n = next(d for d in (8, 7, 4, 2, 1) if nseries % d == 0)
    ndf_w = ndf // nout
    tdf = _pow2_tile(ndf_w, sg_n * 256 * 2, budget=2 ** 21)
    tpw = ndf_w // tdf
    sg = nseries // sg_n

    part = pl.pallas_call(
        _rows_power_kernel(tpw, sg_n),
        grid=(sg, ndf // tdf),
        in_specs=[
            pl.BlockSpec((sg_n, tdf, 256), lambda s, t: (s, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, 256), lambda s, t, tpw=tpw: (s * nout + t // tpw, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sg * nout * 8, 256), jnp.float32),
        interpret=interpret,
    )(rows)

    g = part.reshape(sg, nout, 8, 256)[:, :, :sg_n].sum(axis=3)
    g = g.transpose(0, 2, 1).reshape(nseries, nout)    # (series, nout)
    power = g.reshape(nseries // NPOL_SAMP, NPOL_SAMP, nout).sum(axis=1)
    power = power.T                                    # (nout, nchan)
    if mean:
        power = power / (ndf_w * 128 * NPOL_SAMP)
    return power
