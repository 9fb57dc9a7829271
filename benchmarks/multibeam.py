"""Multibeam overlap benchmark: B beams through one SPMD step vs B x the
single-beam pipeline.

Checks the VERDICT round-1 criterion that the overlapped 2-D multibeam
runtime stays within ~20% of single-beam throughput x B on the virtual
mesh (per-beam data volume held constant).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/multibeam.py [--ndf 256] [--nchk 8] [--nblocks 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndf", type=int, default=256)
    ap.add_argument("--nchk", type=int, default=8)
    ap.add_argument("--nblocks", type=int, default=16)
    ap.add_argument("--nbeam", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, ".")
    from paf_baseband2power_tpu.parallel import mesh as M
    from paf_baseband2power_tpu.runtime import pipeline as RP
    from paf_baseband2power_tpu.runtime.multibeam import run_multibeam

    n = len(jax.devices())
    nbeam = args.nbeam
    n_time = max(1, n // (nbeam * 2))
    n_chunk = n // (nbeam * n_time)

    def sources(seed0):
        return [RP.SyntheticSource(args.nblocks, ndf=args.ndf,
                                   nchk=args.nchk, seed=seed0 + 100 * b)
                for b in range(nbeam)]

    # single-beam baseline: one PowerPipeline per beam, run serially
    pipe = RP.PowerPipeline(depth=4, fetch_every=4)
    pipe.warmup(args.ndf, args.nchk)
    t0 = time.perf_counter()
    for src in sources(0):
        pipe.run(src, RP.MemorySink())
    t_single = time.perf_counter() - t0

    # multibeam: one SPMD step over the (beam, time, chunk) mesh
    mesh = M.make_beam_mesh(nbeam, n_time, n_chunk)
    run_multibeam(sources(0), mesh,
                  [RP.MemorySink() for _ in range(nbeam)],
                  depth=4, fetch_every=4)  # warm the compile
    t0 = time.perf_counter()
    stats = run_multibeam(sources(0), mesh,
                          [RP.MemorySink() for _ in range(nbeam)],
                          depth=4, fetch_every=4)
    t_multi = time.perf_counter() - t0

    ratio = t_single / t_multi  # >1: multibeam beats serial per-beam
    print(json.dumps({
        "nbeam": nbeam, "mesh": dict(mesh.shape),
        "nblocks_per_beam": args.nblocks,
        "serial_per_beam_sec": t_single,
        "multibeam_sec": t_multi,
        "speedup_vs_serial": ratio,
        "within_20pct_of_serial": bool(ratio >= 0.8),
        "blocks": stats.nblocks,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
