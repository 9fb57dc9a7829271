"""Record PFB / composed-spectra TPU benchmark artifacts (round 3).

Measures the generalized fused Pallas spectrometer (ops/pallas_pfb.py)
across channelizer sizes and detection compositions at full geometry
(8192 x 48-chunk blocks, generated on device), steady-state two-point-slope
timing with min-of-N repeats (tunnel jitter rejection). Writes
benchmarks/PFB_r03.json and benchmarks/COMPOSE_r03.json.

Usage: python benchmarks/spectra_bench.py [--quick]
"""

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from paf_baseband2power_tpu import constants as C
from paf_baseband2power_tpu.ops.pallas_pfb import pfb_spectra_fused
from paf_baseband2power_tpu.ops.pfb import make_streaming_pfb

BASE = 796.4e6  # complex samples/s per node (BASELINE.md)


def make_block(ndf):
    key = jax.random.key(0)
    shape = (ndf, C.NCHK_NIC * 3584)
    return jax.jit(lambda k: jax.random.randint(
        k, shape, -256, 256, dtype=jnp.int16))(key)


def slope(step, block, n_small=2, n_big=8, reps=4):
    np.asarray(step(block))
    np.asarray(step(block))

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = step(block)
        np.asarray(o)
        return time.perf_counter() - t0

    t1 = min(run(n_small) for _ in range(reps))
    t2 = min(run(n_big) for _ in range(reps))
    dt = (t2 - t1) / (n_big - n_small)
    if dt <= 0:
        dt = t2 / n_big
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    ndf = 1024 if args.quick else C.NDF_BLK
    block = make_block(ndf)
    np.asarray(block[0, 0])
    stream_sec = ndf * C.TDF_SEC
    samples = ndf * C.NSAMP_DF * C.NCHAN * C.NPOL_SAMP
    out_dir = os.path.dirname(os.path.abspath(__file__))

    def row(dt, **kw):
        kw["block_ms"] = round(dt * 1e3, 2)
        kw["x_realtime"] = round(stream_sec / dt, 2)
        kw["samples_per_sec"] = round(samples / dt, 1)
        print(json.dumps(kw), flush=True)
        return kw

    # --- pure PFB across sizes (fused kernel) ------------------------------
    pfb_rows = []
    for nfft in (128, 256, 512, 1024):
        hist = {}

        def step(b, nfft=nfft, hist=hist):
            out = pfb_spectra_fused(b, nfft, 4, history=hist.get("h"),
                                    return_history=True)
            hist["h"] = out[1]
            return out[0]

        dt = slope(step, block)
        pfb_rows.append(row(
            dt, nfft=nfft,
            method="fused Pallas Cooley-Tukey spectrometer "
                   "(ops/pallas_pfb.py pfb_spectra_fused, streaming)"))
    # XLA comparison row at 1024 (the r2 frontier)
    hist = {}
    xla_step = make_streaming_pfb(1024, 4, method="fft")

    def step_x(b):
        out, hist["h"] = xla_step(b, hist.get("h"))
        return out

    dt = slope(step_x, block, n_small=2, n_big=4, reps=2)
    pfb_rows.append(row(dt, nfft=1024,
                        method="batched-FFT spectrometer (XLA, r2 path)"))

    with open(os.path.join(out_dir, "PFB_r03.json"), "w") as f:
        json.dump({
            "what": "PFB channelizer throughput on one TPU v5e chip, "
                    "full-geometry streaming blocks (the reference's "
                    "planned cuFFT stage, makefile:27 / kernel.cuh:7). "
                    "The fused kernel factors the DFT Cooley-Tukey "
                    "(N1-point lane-block DFT on VPU + N1 twiddle-folded "
                    "256x256 MXU operators), so per-sample MXU cost is "
                    "constant across nfft.",
            "measurements": pfb_rows,
            "baseline_samples_per_sec": BASE,
            "ndf": ndf,
            "date": "2026-08-21",
            "reproduce": ["python benchmarks/spectra_bench.py",
                          "python bench.py --pfb 1024 --iters 12"],
        }, f, indent=1)

    # --- composed detection modes ------------------------------------------
    comp_rows = []
    for nfft, nout, stokes in ((128, 64, False), (128, 1024, False),
                               (128, 1, True), (128, 64, True),
                               (1024, 64, False), (256, 8, True)):
        hist = {}

        def step(b, nfft=nfft, nout=nout, stokes=stokes, hist=hist):
            out = pfb_spectra_fused(b, nfft, 4, nout=nout, stokes=stokes,
                                    history=hist.get("h"),
                                    return_history=True)
            hist["h"] = out[1]
            return out[0]

        dt = slope(step, block)
        comp_rows.append(row(dt, nfft=nfft, nout=nout, stokes=stokes,
                             mode="pfb" + ("+stokes" if stokes else "")
                             + (f"+waterfall[{nout}]" if nout > 1 else "")))

    with open(os.path.join(out_dir, "COMPOSE_r03.json"), "w") as f:
        json.dump({
            "what": "Composed detection modes on one TPU v5e chip: "
                    "fine-channel waterfall (PFB x tscrunch) and "
                    "fine-channel polarimetry (PFB x Stokes), fused "
                    "kernel, full-geometry streaming blocks. Reference "
                    "contract: kernel.cuh:4-7 (planned channelizer) x "
                    "paf_baseband2power.cu:20 (detect-and-average).",
            "measurements": comp_rows,
            "baseline_samples_per_sec": BASE,
            "ndf": ndf,
            "date": "2026-08-21",
            "reproduce": ["python benchmarks/spectra_bench.py",
                          "python bench.py --pfb 128 --scrunch 64",
                          "python bench.py --pfb 128 --stokes"],
        }, f, indent=1)


if __name__ == "__main__":
    main()
