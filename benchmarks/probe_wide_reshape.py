"""Probe: is the in-VMEM narrow->wide window reshape the nfft>128 cost?

The fused spectrometer streams rows as narrow (R*n1, 256) tiles and
widens them to (R, n1*256) window rows inside the kernel
(``ops/pallas_pfb.py`` stencil fill, "free in-VMEM value reshape").
BENCH r4/r5 measure 13.2 ms/block at nfft=128 (n1=1, no widening) but
22-23 ms at nfft=1024 (n1=8) with no identified binding resource after
four r4 probes (Karatsuba, tile sweeps, stage-A FFT, third-dot drop all
dead ends). Remaining hypothesis (VERDICT r4 weak #3): the widening is
NOT free — regrouping sublanes into 8x-wider lane rows is a vector
relayout Mosaic must implement with cross-lane shuffles.

Two experiments, identical byte volume per variant:

1. MICRO: a kernel that loads (R*n1, 256) tiles and (a) reduces them
   narrow vs (b) widens to (R, n1*256) then reduces. The delta, scaled
   to a full block's 2.8 GB, is the reshape's isolated cost.
2. PLANES: a restructured channelizer tile — the same FIR/stage-A/MXU
   pipeline, but consuming a "planes" HBM layout (nseries, n1, nrow,
   256) where plane m holds narrow chunk m of every window. chunks[m]
   is then a direct row slice: NO widening anywhere. If this runs at
   ~the nfft=128 time, the reshape is the delta and the planes layout
   is the fix (the host corner turn can emit it at no extra cost).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_wide_reshape.py
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

L = 128


def _slope(run, n1: int, n2: int, repeats: int = 4) -> float:
    t1 = min(run(n1) for _ in range(repeats))
    t2 = min(run(n2) for _ in range(repeats))
    dt = (t2 - t1) / (n2 - n1)
    return t2 / n2 if dt <= 0 else dt


# ---------------------------------------------------------------------------
# 1. MICRO: narrow reduce vs widen-then-reduce
# ---------------------------------------------------------------------------

def micro(nseries: int, ndf: int, n1: int, R: int, widen: bool):
    def kernel(x_ref, o_ref):
        xw = x_ref[0].astype(jnp.float32)
        if widen:
            # the production widening, then fold the lane chunks back so
            # every wide lane is consumed (no dead-lane elimination)
            w = xw.reshape(R, n1 * 256)
            acc = w[:, 0:256]
            for m in range(1, n1):
                acc = acc + w[:, 256 * m:256 * (m + 1)]
            o_ref[0, 0, :] = jnp.sum(acc, axis=0)
        else:
            o_ref[0, 0, :] = jnp.sum(xw, axis=0)

    grid = (nseries, ndf // (R * n1))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, R * n1, 256), lambda s, t: (s, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 256), lambda s, t: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nseries, 1, 256), jnp.float32),
    )


# ---------------------------------------------------------------------------
# 2. PLANES: full channelizer tile, no widening
# ---------------------------------------------------------------------------

def planes_kernel(ntap: int, n1: int, R: int, nrow_tiles: int,
                  stage_a: str = "full"):
    """One-shot power spectrometer on the planes layout: FIR stencil per
    plane, stage-A N1-DFT across planes, N1 twiddle-folded MXU dots,
    detect, fold — the production pipeline minus the widening.

    ``stage_a``: cost-attribution ablations (results numerically WRONG
    except "full"): "none" feeds chunks[0] to every k1 dot (zero stage-A
    work, same MXU/epilogue volume); "noswap" keeps the n1^2 scaled-add
    sum but drops the imaginary/roll terms (isolates roll cost)."""

    def kernel(x_ref, fh_ref, fl_ref, cv_ref, o_ref, buf):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        # FIR per plane: z_m = sum_k cv[k, m] * plane_m[rows k..k+R)
        chunks = []
        for m in range(n1):
            base = m * (R + 8)

            @pl.when(t == 0)
            def _(base=base, m=m):
                buf[base:base + ntap - 1] = jnp.zeros((ntap - 1, 256),
                                                      jnp.float32)

            buf[base + ntap - 1:base + ntap - 1 + R] = \
                x_ref[0, m].astype(jnp.float32)
            z = cv_ref[0:1, 256 * m:256 * (m + 1)] * buf[base:base + R]
            for k in range(1, ntap):
                z = z + (cv_ref[k:k + 1, 256 * m:256 * (m + 1)]
                         * buf[base + k:base + k + R])
            row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
            first = jnp.where(t == 0, ntap - 1, 0)
            chunks.append(jnp.where(row >= first, z, 0.0))

        lane = jax.lax.broadcasted_iota(jnp.int32, chunks[0].shape, 1)
        even = (lane % 2) == 0
        alt = jnp.where(even, -1.0, 1.0)

        def icmul(c):
            """i * c on interleaved lanes (the production swap trick)."""
            return alt * jnp.where(even, pltpu.roll(c, 2 * L - 1, 1),
                                   pltpu.roll(c, 1, 1))

        if stage_a == "full":
            swaps = [icmul(c) for c in chunks]

        ffts = None
        if stage_a == "fft8" and n1 == 8:
            # radix-2^3 DIF on the NARROW chunks: ~60 vector ops vs the
            # direct form's 128 scaled-adds + 8 rolls. Outputs feed the
            # per-k1 operators directly (index map absorbs bit reversal).
            s = 1.0 / math.sqrt(2.0)
            t = [chunks[m] + chunks[m + 4] for m in range(4)]
            d = [chunks[m] - chunks[m + 4] for m in range(4)]
            u = [d[0],
                 s * (d[1] - icmul(d[1])),      # * (1-i)/sqrt(2)
                 -icmul(d[2]),                  # * -i
                 -s * (d[3] + icmul(d[3]))]     # * -(1+i)/sqrt(2)

            def dft4(x):
                p0, p1 = x[0] + x[2], x[1] + x[3]
                q0 = x[0] - x[2]
                q1 = -icmul(x[1] - x[3])        # * W_4^1 = -i
                return [p0 + p1, q0 + q1, p0 - p1, q0 - q1]  # k=0,1,2,3

            e4, o4 = dft4(t), dft4(u)
            ffts = [None] * 8
            for r in range(4):
                ffts[2 * r] = e4[r]
                ffts[2 * r + 1] = o4[r]

        def bf3(a, k1):
            ahi = a.astype(jnp.bfloat16)
            alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
            return (dot(ahi, fh_ref[k1]) + dot(ahi, fl_ref[k1])
                    + dot(alo, fh_ref[k1]))

        for k1 in range(n1):
            if stage_a == "none":
                acc = chunks[0]
            elif ffts is not None:
                acc = ffts[k1]
            else:
                acc = None
                for m in range(n1):
                    ang = -2.0 * math.pi * m * k1 / n1
                    wr, wi = math.cos(ang), math.sin(ang)
                    term = None
                    if abs(wr) > 1e-12:
                        term = chunks[m] if abs(wr - 1.0) < 1e-12 \
                            else wr * chunks[m]
                    if stage_a == "full" and abs(wi) > 1e-12:
                        t2 = swaps[m] if abs(wi - 1.0) < 1e-12 \
                            else wi * swaps[m]
                        term = t2 if term is None else term + t2
                    if term is not None:
                        acc = term if acc is None else acc + term
            y = bf3(acc, k1)
            p = y * y
            part = jnp.sum(p[:, 0:L].reshape(R // 8, 8, L), axis=0) \
                + jnp.sum(p[:, L:2 * L].reshape(R // 8, 8, L), axis=0)
            o_ref[0, :, pl.ds(k1 * L, L)] += part

        for m in range(n1):
            base = m * (R + 8)
            buf[base:base + ntap - 1] = buf[base + R:base + R + ntap - 1]

    return kernel


def planes_call(nseries: int, nrow: int, nfft: int, ntap: int, R: int,
                stage_a: str = "full"):
    n1 = nfft // L
    from paf_baseband2power_tpu.ops.pfb import pfb_coeffs

    c = pfb_coeffs(nfft, ntap, "hamming", dtype=np.float64)
    cv = np.repeat(c, 2, axis=1).astype(np.float32)        # (ntap, 2*nfft)
    from paf_baseband2power_tpu.ops.pallas_pfb import _spectra_ops

    _, mats = _spectra_ops(nfft, ntap, "hamming")
    f32 = jnp.asarray(mats)
    fhi = f32.astype(jnp.bfloat16)
    flo = (f32 - fhi.astype(jnp.float32)).astype(jnp.bfloat16)
    grid = (nseries, nrow // R)
    kernel = planes_kernel(ntap, n1, R, nrow // R, stage_a)

    def call(xp):
        part = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, n1, R, 256), lambda s, t: (s, 0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n1, 2 * L, 2 * L), lambda s, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n1, 2 * L, 2 * L), lambda s, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ntap, 2 * nfft), lambda s, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, nfft), lambda s, t: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nseries, 8, nfft), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n1 * (R + 8), 256), jnp.float32)],
        )(xp, fhi, flo, jnp.asarray(cv))
        return part.sum(axis=1)

    return jax.jit(call)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nfft", type=int, default=1024)
    ap.add_argument("--ndf", type=int, default=8192)
    ap.add_argument("--nchk", type=int, default=48)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    n1 = args.nfft // L
    nseries = args.nchk * 14
    nrow = args.ndf // n1
    report = {"nfft": args.nfft, "ndf": args.ndf, "nchk": args.nchk,
              "results": {}}

    key = jax.random.key(0)
    rows = jax.random.randint(key, (nseries, args.ndf, 256), -256, 256,
                              dtype=jnp.int16).block_until_ready()

    def time_step(step, x):
        np.asarray(step(x))

        def run(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = step(x)
            np.asarray(out)
            return time.perf_counter() - t0

        return _slope(run, max(2, args.iters // 3), args.iters)

    # 0. production baseline
    from paf_baseband2power_tpu.ops.pallas_pfb import pfb_spectra_fused

    base = jax.jit(lambda b: pfb_spectra_fused(b, args.nfft, 4,
                                               layout="rows"))
    report["results"]["production rows"] = round(
        time_step(base, rows) * 1e3, 2)

    # 1. micro: narrow vs widened reduce at the production tile shape
    R = max(8, 1024 // n1)  # windows/tile ~ the production VMEM cap
    for widen in (False, True):
        m = micro(nseries, args.ndf, n1, R, widen)
        label = f"micro {'widen' if widen else 'narrow'}"
        report["results"][label] = round(
            time_step(jax.jit(lambda x, m=m: m(x)), rows) * 1e3, 2)

    # 2. planes layout: pre-arranged on device (one-time cost, excluded —
    # the capture corner turn would emit this layout directly)
    xp = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(rows).reshape(nseries, nrow, n1, 256)
            .transpose(0, 2, 1, 3)))
    xp.block_until_ready()
    # R sweep: the wide formulation's VMEM scratch caps R at ~1024/n1;
    # planes scratch stays narrow, so R (the MXU dots' M dimension) can
    # grow — if bigger M recovers the delta, small-M MXU overhead is the
    # remaining binding resource
    for R_p, sa in ((R, "full"), (R, "fft8"), (R, "noswap"), (R, "none")):
        if nrow % R_p:
            continue
        label = f"planes R={R_p} stage_a={sa}"
        try:
            pstep = planes_call(nseries, nrow, args.nfft, 4, R_p, sa)
            report["results"][label] = round(time_step(pstep, xp) * 1e3, 2)
        except Exception as e:
            report["results"][label] = f"{type(e).__name__}: {str(e)[:120]}"
        print(json.dumps(report["results"]), flush=True)

    # numerical check vs the XLA golden at reduced geometry
    from paf_baseband2power_tpu.ops import pfb as _pfb
    from paf_baseband2power_tpu.ops.frame import block_to_rows, \
        synthetic_block

    blk = synthetic_block(rng=7, ndf=64, nchk=2)
    r_small = block_to_rows(blk)
    ns_s, nrow_s = 2 * 14, 64 // n1
    xs = jnp.asarray(np.ascontiguousarray(
        r_small.reshape(ns_s, nrow_s, n1, 256).transpose(0, 2, 1, 3)))
    want = _pfb.pfb_power_golden(blk, args.nfft, 4, shift=False)
    want2 = want.reshape(2 * 7, args.nfft)
    for sa in ("full", "fft8"):
        got = np.asarray(planes_call(ns_s, nrow_s, args.nfft, 4,
                                     max(8, nrow_s // 2), sa)(xs))
        # planes output is (nseries, nfft) per series incl. both pols,
        # (k1, k2)-ordered lanes; restore k = n1*k2 + k1, fold pols
        g = got.reshape(ns_s, n1, L).transpose(0, 2, 1).reshape(
            ns_s, args.nfft)
        g = g.reshape(2 * 7, 2, args.nfft).sum(axis=1)
        err = float(np.abs(g - want2).max() / np.abs(want2).max())
        report[f"parity_err_{sa}"] = err
        report[f"parity_ok_{sa}"] = err < 2e-5

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
