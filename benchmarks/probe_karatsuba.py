"""Probe: 3-real-mult (Karatsuba) complex DFT on planar re/im rows.

Roofline context (ops/pallas_pfb.py design notes): the fused nfft=128
spectrometer is MXU-bound — the interleaved [re|im] pair operator costs
4 real MACs per complex output (a (256,256) dot per window), tripled by
the bf16x3 split: ~1.08e12 MACs/block = ~11 ms of v5e MXU time. The
measured 13.5 ms streaming = ~81% MXU utilization, so meaningful gains
need FEWER MACs, not better scheduling.

Karatsuba needs A (re) and B (im) as separately addressable matrices:
    T  = (A+B) @ C
    RE = T - B @ (C+D)
    IM = T - A @ (C-D)
= 3 real (128,128) dots per window (3 MACs/complex) vs the pair
operator's 4 — a 25% MAC cut, possible only on a PLANAR row layout
(lanes 0..127 = re, 128..255 = im; contiguous half-row slices). The
interleaved layout cannot deinterleave in-kernel without either lane
shuffles that eat the win on the VPU or the dup-trick (which inflates
the dots to 2x128x128 each = 6 MACs/complex, worse than 4).

This probe measures the full fused pipeline (FIR stencil + Karatsuba
DFT + detect + integrate) on synthetic planar rows vs the production
interleaved kernel, at full geometry — the decision input for changing
the host corner turn to emit planar segments.
"""

import argparse
import functools
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--ndf", type=int, default=8192)
    ap.add_argument("--check", action="store_true",
                    help="verify numerics vs a numpy golden at tiny size")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from paf_baseband2power_tpu import constants as C
    from paf_baseband2power_tpu.ops.pfb import pfb_coeffs

    L = 128
    ntap = 4
    S = C.NCHK_NIC * 14

    def planar_ops(window="hamming"):
        c = pfb_coeffs(L, ntap, window, dtype=np.float64)   # (ntap, 128)
        cv = np.concatenate([c, c], axis=1)                 # planar repeat
        n = np.arange(L)
        k = np.arange(L)
        w = np.exp(-2j * np.pi * np.outer(n, k) / L)
        Cm, Dm = w.real, w.imag
        return (cv.astype(np.float32), Cm.astype(np.float32),
                (Cm + Dm).astype(np.float32), (Cm - Dm).astype(np.float32))

    def kar_kernel(R):
        def kernel(x_ref, c1_ref, c2_ref, c3_ref, cv_ref, o_ref, buf):
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)
                buf[0:ntap - 1] = jnp.zeros_like(buf[0:ntap - 1])

            buf[ntap - 1:ntap - 1 + R] = x_ref[0].astype(jnp.float32)
            z = cv_ref[0:1] * buf[0:R]
            for kk in range(1, ntap):
                z = z + cv_ref[kk:kk + 1] * buf[kk:kk + R]
            row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
            first = jnp.where(t == 0, ntap - 1, 0)
            z = jnp.where(row >= first, z, 0.0)

            a = z[:, 0:L]
            b = z[:, L:2 * L]
            ab = a + b

            def bf3(v, m_ref):
                vhi = v.astype(jnp.bfloat16)
                vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)
                mh = m_ref[0:L].astype(jnp.bfloat16)
                ml = (m_ref[0:L] - mh.astype(jnp.float32)
                      ).astype(jnp.bfloat16)
                d = functools.partial(jnp.dot,
                                      preferred_element_type=jnp.float32)
                return d(vhi, mh) + d(vhi, ml) + d(vlo, mh)

            T = bf3(ab, c1_ref)
            re = T - bf3(b, c2_ref)
            im = T - bf3(a, c3_ref)
            pw = re * re + im * im
            acc = jnp.sum(pw.reshape(R // 8, 8, L), axis=0)
            o_ref[0] += acc
            buf[0:ntap - 1] = buf[R:R + ntap - 1]

        return kernel

    def run_planar(rows, R=1024, interpret=False):
        ndf = rows.shape[1]
        cv, C1, C2, C3 = planar_ops()
        cvpad = jnp.asarray(np.pad(cv, ((0, 8 - ntap), (0, 0))))
        part = pl.pallas_call(
            kar_kernel(R),
            grid=(rows.shape[0], ndf // R),
            in_specs=[
                pl.BlockSpec((1, R, 2 * L), lambda s, t: (s, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, L), lambda s, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, L), lambda s, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, L), lambda s, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 2 * L), lambda s, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, L), lambda s, t: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows.shape[0], 8, L),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((R + 8, 2 * L), jnp.float32)],
            interpret=interpret,
        )(rows, jnp.asarray(C1), jnp.asarray(C2), jnp.asarray(C3), cvpad)
        return part.sum(axis=1)

    if args.check:
        Ssm, ndf = 4, 64
        rng = np.random.default_rng(0)
        rows = rng.integers(-256, 256, (Ssm, ndf, 256)).astype(np.int16)
        got = np.asarray(jax.jit(functools.partial(
            run_planar, R=ndf, interpret=True))(jnp.asarray(rows)))
        # numpy golden on the planar series
        v = rows[:, :, :L].reshape(Ssm, -1) + 1j * \
            rows[:, :, L:].reshape(Ssm, -1)
        c = pfb_coeffs(L, ntap, "hamming", dtype=np.float64)
        nwin = ndf - (ntap - 1)
        xr = v.reshape(Ssm, ndf, L)
        z = sum(c[t] * xr[:, t:t + nwin] for t in range(ntap))
        want = (np.abs(np.fft.fft(z, axis=-1)) ** 2).sum(axis=1)
        err = np.abs(got - want).max() / np.abs(want).max()
        print(json.dumps({"check_err": float(err)}))
        return

    key = jax.random.key(0)
    rows = jax.jit(lambda k: jax.random.randint(
        k, (S, args.ndf, 256), -256, 256, dtype=jnp.int16))(key)
    np.asarray(rows[0, 0, 0])

    results = {}
    for R in (1024, 2048):
        if args.ndf % R:
            continue
        f = jax.jit(functools.partial(run_planar, R=R))
        try:
            np.asarray(f(rows))
        except Exception as e:
            results[f"karatsuba R={R}"] = f"{type(e).__name__}"
            continue

        def run(n, f=f):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = f(rows)
            np.asarray(o)
            return time.perf_counter() - t0

        n1 = max(2, args.iters // 3)
        t1 = min(run(n1) for _ in range(3))
        t2 = min(run(3 * n1) for _ in range(3))
        dt = (t2 - t1) / (2 * n1)
        if dt <= 0:
            dt = t2 / (3 * n1)
        results[f"karatsuba R={R}"] = round(dt * 1e3, 2)

    # production interleaved kernel for the same-window comparison
    from paf_baseband2power_tpu.ops.pallas_pfb import pfb_spectra_fused

    def prod(b):
        return pfb_spectra_fused(b, 128, ntap, layout="rows")

    np.asarray(prod(rows))

    def runp(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = prod(rows)
        np.asarray(o)
        return time.perf_counter() - t0

    n1 = max(2, args.iters // 3)
    t1 = min(runp(n1) for _ in range(3))
    t2 = min(runp(3 * n1) for _ in range(3))
    dt = (t2 - t1) / (2 * n1)
    if dt <= 0:
        dt = t2 / (3 * n1)
    results["interleaved production"] = round(dt * 1e3, 2)
    print(json.dumps({"ndf": args.ndf, "ms": results}))


if __name__ == "__main__":
    main()
