"""Benchmark: baseband->power throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: aggregate complex baseband samples/s through the full
unpack -> |x|^2 -> integrate conversion of real-geometry blocks
(8192 frames x 48 chunks x 336 channels x 2 pols = 704,643,072 complex
samples = 2.8 GB per block), steady-state streaming (chained dispatches,
one final fetch — matching the pipeline's overlap discipline).

Baseline: the reference pipeline's hard real-time requirement of
796.4 Msamp/s per node (BASELINE.md — the reference publishes no measured
figures, so real-time is the bar it must clear; vs_baseline = value /
796.4e6 = how many real-time BMF streams one chip sustains).

Blocks are generated directly on device in the production 2-D layout
(host->device of 2.8 GB through the tunnel would measure the link, not the
kernel; the streaming ingest path is benchmarked separately).
"""

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache (works with the axon backend): repeat runs of
# the same program shapes skip the 30-450 s remote compile server
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from paf_baseband2power_tpu import constants as C
from paf_baseband2power_tpu.ops.pallas_power import LANES_PER_CHUNK

BASELINE_SAMPLES_PER_SEC = 796.4e6  # 336 chan * 2 pol * 1.185185 Msamp/s


def make_block_2d(ndf: int, seed: int = 0) -> jax.Array:
    shape = (ndf, C.NCHK_NIC * LANES_PER_CHUNK)
    key = jax.random.key(seed)
    gen = jax.jit(
        lambda k: jax.random.randint(k, shape, -256, 256, dtype=jnp.int16)
    )
    return gen(key).block_until_ready()


def make_block_rows(ndf: int, seed: int = 0) -> jax.Array:
    """Series-row block as the capture engine's device-layout mode
    delivers it, in the 3-D device form the pipeline puts on device:
    (nchk*14 series, ndf frames, 256 lanes) int16."""
    shape = (C.NCHK_NIC * 14, ndf, 256)
    key = jax.random.key(seed)
    gen = jax.jit(
        lambda k: jax.random.randint(k, shape, -256, 256, dtype=jnp.int16)
    )
    return gen(key).block_until_ready()


def get_step(impl: str):
    if impl in ("auto", "pallas"):
        try:
            from paf_baseband2power_tpu.ops.pallas_power import (
                baseband2power_pallas,
            )
            return baseband2power_pallas, "pallas"
        except Exception:
            if impl == "pallas":
                raise
    from paf_baseband2power_tpu.ops.power import baseband2power_2d
    return baseband2power_2d, "xla"


def bench_h2d(ndf: int, iters: int) -> dict:
    """Measure device_put of a full host block (the reference's 2.8 GB
    H2D stage per integration, SURVEY.md section 3.2). The bar is the
    capture-side line rate: 3.19 GB/s sustained (capture.h:28,30)."""
    from paf_baseband2power_tpu import constants as C
    from paf_baseband2power_tpu.ops.pallas_power import LANES_PER_CHUNK

    shape = (ndf, C.NCHK_NIC * LANES_PER_CHUNK)
    host = np.random.default_rng(0).integers(
        -256, 256, size=shape, dtype=np.int16)
    nbytes = host.nbytes
    # warm the transfer path / allocator
    jax.device_put(host).block_until_ready()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.device_put(host).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {
        "metric": "H2D bytes/s (full 2-D block device_put)",
        "value": nbytes / dt,
        "unit": "bytes/s",
        "block_bytes": nbytes,
        "block_sec": dt,
        "vs_baseline": (nbytes / dt) / 3.19e9,
    }


def bench_e2e(ndf: int, iters: int, depth: int = 2) -> dict:
    """Pipelined end-to-end block loop: host source -> device_put ->
    power kernel -> fetch, `depth` blocks in flight (the PowerPipeline
    discipline). The bar is real time: one 0.884736 s integration per
    block (README.md:2); vs_baseline = stream-time / wall-time."""
    import collections

    from paf_baseband2power_tpu import constants as C
    from paf_baseband2power_tpu.ops.pallas_power import LANES_PER_CHUNK

    step, _ = get_step("auto")
    shape = (ndf, C.NCHK_NIC * LANES_PER_CHUNK)
    rng = np.random.default_rng(0)
    # a few distinct host blocks so neither transfers nor kernels can cache
    hosts = [rng.integers(-256, 256, size=shape, dtype=np.int16)
             for _ in range(min(3, iters))]
    np.asarray(step(jax.device_put(hosts[0])))  # compile + warm

    def run(n: int) -> float:
        inflight = collections.deque()
        t0 = time.perf_counter()
        for i in range(n):
            inflight.append(step(jax.device_put(hosts[i % len(hosts)])))
            if len(inflight) > depth:
                np.asarray(inflight.popleft())
        while inflight:
            np.asarray(inflight.popleft())
        return time.perf_counter() - t0

    n1 = max(2, iters // 3)
    n2 = 3 * n1
    t1 = min(run(n1) for _ in range(2))
    t2 = min(run(n2) for _ in range(2))
    dt = (t2 - t1) / (n2 - n1)
    stream_sec = ndf * C.TDF_SEC
    return {
        "metric": "end-to-end realtime multiple "
                  "(host->H2D->kernel->fetch, pipelined)",
        "value": stream_sec / dt,
        "unit": "x realtime",
        "block_sec": dt,
        "block_stream_sec": stream_sec,
        "depth": depth,
        "vs_baseline": stream_sec / dt,
    }


def _slope(run, n1: int, n2: int, repeats: int = 3) -> float:
    """Steady-state per-iteration time via a min-of-N two-point slope
    (clamped: tunnel jitter can push the raw slope negative)."""
    t1 = min(run(n1) for _ in range(repeats))
    t2 = min(run(n2) for _ in range(repeats))
    dt = (t2 - t1) / (n2 - n1)
    if dt <= 0:
        dt = t2 / n2
    return dt


def bench_matrix(ndf: int, iters: int) -> dict:
    """The capability matrix in one artifact: every detection-mode family
    at full geometry, measured with the same two-point-slope discipline.
    Headline stays the direct power path (continuity with r1-r3 BENCH
    artifacts); the ``matrix`` key carries the frontier modes the
    headline saturated on (VERDICT r3 item 8)."""
    from paf_baseband2power_tpu.ops.pallas_pfb import pfb_spectra_fused
    from paf_baseband2power_tpu.ops.pallas_power import (
        baseband2power_pallas,
        baseband2power_scrunch_pallas,
        baseband2stokes_pallas,
        baseband2stokes_scrunch_pallas,
        baseband2stokes_scrunch_rows_pallas,
    )

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        # matrix rows are Pallas kernels; off-TPU fall back to the XLA
        # direct path only (smoke mode — get_step('auto') would hand back
        # the Pallas kernel, which raises on a CPU backend)
        from paf_baseband2power_tpu.ops.power import baseband2power_2d

        block = make_block_2d(ndf)
        modes = [("power xla", baseband2power_2d, block, None)]
    else:
        block = make_block_2d(ndf)
        rows = make_block_rows(ndf)
        hist = {}

        def pfb_rows_step(nfft, stokes=False):
            def step(b, key=f"h{nfft}{stokes}"):
                out, hist[key] = pfb_spectra_fused(
                    b, nfft, 4, stokes=stokes, history=hist.get(key),
                    return_history=True, layout="rows")
                return out
            return step

        from paf_baseband2power_tpu.ops.pallas_power import (
            baseband2power_scrunch_rows_pallas,
        )

        modes = [
            ("power", baseband2power_pallas, block, None),
            ("power rows",
             lambda b: baseband2power_scrunch_rows_pallas(b, 1), rows,
             None),
            ("stokes", baseband2stokes_pallas, block, None),
            ("scrunch[64]",
             lambda b: baseband2power_scrunch_pallas(b, 64), block, None),
            ("stokes x scrunch[64]",
             lambda b: baseband2stokes_scrunch_pallas(b, 64), block, None),
            ("stokes rows",
             lambda b: baseband2stokes_scrunch_rows_pallas(b, 1), rows,
             None),
            # recommended-layout composed modes (README table rows: the
            # packed-window Stokes waterfall and the fused PFB x Stokes)
            ("stokes x scrunch[64] rows",
             lambda b: baseband2stokes_scrunch_rows_pallas(b, 64), rows,
             None),
            ("pfb 128 rows streaming", pfb_rows_step(128), rows, None),
            ("pfb 128 x stokes rows streaming",
             pfb_rows_step(128, stokes=True), rows, None),
            ("pfb 1024 rows streaming", pfb_rows_step(1024), rows, None),
        ]

    samples_per_block = ndf * C.NSAMP_DF * C.NCHAN * C.NPOL_SAMP
    stream_sec = ndf * C.TDF_SEC
    matrix = []
    headline = None
    for name, step, blk, _ in modes:
        np.asarray(step(blk))
        np.asarray(step(blk))  # PFB paths compile a 2nd (history) program

        def run(n, step=step, blk=blk):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = step(blk)
            np.asarray(out)
            return time.perf_counter() - t0

        n1 = max(2, iters // 6)
        dt = _slope(run, n1, 3 * n1)
        row = {
            "mode": name,
            "block_ms": round(dt * 1e3, 2),
            "x_realtime": round(stream_sec / dt, 1),
            "samples_per_sec": samples_per_block / dt,
        }
        matrix.append(row)
        if headline is None:
            headline = row
    return {
        "metric": "baseband samples/s/chip (unpack+detect+integrate, "
                  + ("pallas)" if on_tpu else "xla cpu-fallback)"),
        "value": headline["samples_per_sec"],
        "unit": "samples/s",
        "vs_baseline": headline["samples_per_sec"] / BASELINE_SAMPLES_PER_SEC,
        "matrix": matrix,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="auto", choices=["auto", "xla", "pallas"])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--matrix", action="store_true",
                    help="measure the full detection-mode matrix (power/"
                    "stokes/scrunch/pfb-rows) and fold it into the one "
                    "JSON line; this is the DEFAULT when no mode flag is "
                    "given on TPU")
    ap.add_argument("--single", action="store_true",
                    help="headline direct-power measurement only (the "
                    "r1-r3 default)")
    ap.add_argument("--quick", action="store_true",
                    help="reduced block for smoke testing")
    ap.add_argument("--pfb", type=int, default=0, metavar="NFFT",
                    help="benchmark the PFB channelizer path instead")
    ap.add_argument("--stokes", action="store_true",
                    help="benchmark the full-Stokes detection path instead")
    ap.add_argument("--scrunch", type=int, default=0, metavar="NOUT",
                    help="benchmark sub-block integration (NOUT spectra "
                    "per block) instead")
    ap.add_argument("--device-layout", action="store_true",
                    help="feed the PFB/compose path host-corner-turned "
                    "series rows (capture --device-layout blocks) instead "
                    "of wire-order blocks — measures the rows fast path "
                    "with no on-device corner turn")
    ap.add_argument("--h2d", action="store_true",
                    help="measure host->device transfer of a full block")
    ap.add_argument("--e2e", action="store_true",
                    help="measure the pipelined source->H2D->kernel->fetch "
                    "loop including transfers")
    args = ap.parse_args()

    if args.h2d or args.e2e:
        ndf = 256 if args.quick else C.NDF_BLK
        iters = max(3, args.iters // 3) if args.h2d else args.iters
        rep = bench_h2d(ndf, iters) if args.h2d else bench_e2e(ndf, args.iters)
        print(json.dumps(rep))
        return

    ndf = 256 if args.quick else C.NDF_BLK
    mode_flag = (args.pfb or args.stokes or args.scrunch
                 or args.device_layout or args.single
                 or args.impl != "auto"
                 or args.quick)  # --quick stays a fast single-mode smoke
    if args.matrix or not mode_flag:
        print(json.dumps(bench_matrix(ndf, args.iters)))
        return
    if args.pfb and args.device_layout:
        # rows fast path: blocks already host-corner-turned (the capture
        # engine's device-layout mode); any PFB composition, no on-device
        # corner turn
        from paf_baseband2power_tpu.ops.pallas_pfb import pfb_spectra_fused

        nout = args.scrunch or 1
        label = (f"pfb nfft={args.pfb} [device-layout rows]"
                 + (" x stokes" if args.stokes else "")
                 + (f" x nout={nout}" if nout > 1 else ""))
        history = {}

        def step(b):
            out, history["h"] = pfb_spectra_fused(
                b, args.pfb, 4, nout=nout, stokes=args.stokes,
                history=history.get("h"), return_history=True,
                layout="rows")
            return out
    elif args.pfb and (args.stokes or args.scrunch):
        # composed fine-channel modes ride the same streaming step
        from paf_baseband2power_tpu.ops.pfb import make_streaming_spectra

        nout = args.scrunch or 1
        pfb_step = make_streaming_spectra(args.pfb, 4, nout=nout,
                                          stokes=args.stokes)
        label = (f"pfb nfft={args.pfb}"
                 + (" x stokes" if args.stokes else "")
                 + (f" x nout={nout}" if nout > 1 else ""))
        history = {}

        def step(b):
            out, history["h"] = pfb_step(b, history.get("h"))
            return out
    elif args.stokes and args.scrunch:
        nout = args.scrunch
        if jax.default_backend() == "tpu":
            from paf_baseband2power_tpu.ops.pallas_power import (
                baseband2stokes_scrunch_pallas,
            )
            label = f"stokes x scrunch pallas nout={nout}"

            def step(b):
                return baseband2stokes_scrunch_pallas(b, nout)
        else:
            from paf_baseband2power_tpu.ops.power import (
                baseband2stokes_scrunch_2d,
            )
            label = f"stokes x scrunch xla nout={nout}"

            def step(b):
                return baseband2stokes_scrunch_2d(b, nout)
    elif args.stokes:
        if jax.default_backend() == "tpu":
            from paf_baseband2power_tpu.ops.pallas_power import (
                baseband2stokes_pallas as step,
            )
            label = "stokes pallas"
        else:
            from paf_baseband2power_tpu.ops.power import (
                baseband2stokes_2d as step,
            )
            label = "stokes xla"
    elif args.scrunch:
        nout = args.scrunch
        if jax.default_backend() == "tpu":
            from paf_baseband2power_tpu.ops.pallas_power import (
                baseband2power_scrunch_pallas,
            )
            label = f"scrunch pallas nout={nout}"

            def step(b):
                return baseband2power_scrunch_pallas(b, nout)
        else:
            from paf_baseband2power_tpu.ops.power import (
                baseband2power_scrunch_2d,
            )
            label = f"scrunch xla nout={nout}"

            def step(b):
                return baseband2power_scrunch_2d(b, nout)
    elif args.pfb:
        from paf_baseband2power_tpu.ops.pfb import make_streaming_pfb

        # chunk grouping auto-resolved: whole-block for the sliding-DFT
        # path (fits HBM; group slicing costs ~40 ms of copies per block),
        # 16 groups for the fft path (~13 GB of temporaries otherwise)
        pfb_step = make_streaming_pfb(args.pfb, 4)
        label = f"pfb nfft={args.pfb}"
        history = {}

        def step(b):
            out, history["h"] = pfb_step(b, history.get("h"))
            return out
    else:
        step, impl = get_step(args.impl)
        label = impl
    block = (make_block_rows(ndf) if args.pfb and args.device_layout
             else make_block_2d(ndf))
    samples_per_block = ndf * C.NSAMP_DF * C.NCHAN * C.NPOL_SAMP

    # Warmup / compile; np.asarray forces completion (block_until_ready is
    # unreliable under the axon tunnel). Two calls: the PFB path compiles
    # distinct no-history and with-history programs.
    np.asarray(step(block))
    np.asarray(step(block))

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = step(block)
        np.asarray(out)
        return time.perf_counter() - t0

    # Steady-state block time via a two-point slope: a chained dispatch run
    # carries a fixed ~30-45 ms pipeline-fill cost (queueing + the axon
    # tunnel round trip on the final fetch) that a single T/iters divide
    # books against the kernel. The production pipeline streams for hours,
    # so the honest per-block figure is d(time)/d(iters); min-of-3 at each
    # point rejects tunnel jitter.
    n1 = max(2, args.iters // 3)
    n2 = 3 * n1
    if args.quick or args.pfb:
        n1 = max(2, n1 // 4)
        n2 = 3 * n1
    t1 = min(run(n1) for _ in range(3))
    t2 = min(run(n2) for _ in range(3))
    dt = (t2 - t1) / (n2 - n1)
    if dt <= 0:
        # tunnel jitter swamped the slope (tiny --quick blocks run faster
        # than the fetch round-trip variance): fall back to the plain mean,
        # which merely over-books the fixed fill cost instead of going
        # negative
        dt = t2 / n2

    value = samples_per_block / dt
    print(json.dumps({
        "metric": f"baseband samples/s/chip (unpack+detect+integrate, {label})",
        "value": value,
        "unit": "samples/s",
        "vs_baseline": value / BASELINE_SAMPLES_PER_SEC,
    }))


if __name__ == "__main__":
    main()
