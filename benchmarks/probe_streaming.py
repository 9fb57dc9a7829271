"""Probe: decompose the streaming-history overhead of the fused rows PFB.

DEVICE_LAYOUT_r03 + the r4 matrix both measure a large streaming penalty
over the isolated kernel (rows nfft=128: 15.3 -> 23.8 ms; nfft=1024:
23.2 -> 46.0 ms) although the carry is only (ntap-1)*nfft samples per
series. This script separates the candidate costs:

  A  one-shot kernel                      (the isolated 15.3 ms program)
  B  one-shot + return_history            (+ tail extraction epilogue)
  C  history input, fixed h               (+ carry ingestion prologue)
  D  history + return_history, fixed h    (both, no inter-call dependency)
  E  chained streaming (h from prev call) (the production/bench program)

Whichever step introduces the jump names the cause.
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nfft", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--ndf", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from paf_baseband2power_tpu import constants as C
    from paf_baseband2power_tpu.ops.pallas_pfb import pfb_spectra_fused

    nfft = args.nfft
    key = jax.random.key(0)
    rows = jax.jit(lambda k: jax.random.randint(
        k, (C.NCHK_NIC * 14, args.ndf, 256), -256, 256,
        dtype=jnp.int16))(key)
    rows.block_until_ready()

    def slope(step, n_base):
        def run(n):
            out = None
            t0 = time.perf_counter()
            for _ in range(n):
                out = step()
            np.asarray(out if not isinstance(out, tuple) else out[0])
            return time.perf_counter() - t0

        run(1)  # warm
        n1, n2 = n_base, 3 * n_base
        t1 = min(run(n1) for _ in range(3))
        t2 = min(run(n2) for _ in range(3))
        dt = (t2 - t1) / (n2 - n1)
        return dt if dt > 0 else t2 / n2

    results = {}

    def a_step():
        return pfb_spectra_fused(rows, nfft, 4, layout="rows")

    results["A one-shot"] = slope(a_step, args.iters)

    def b_step():
        return pfb_spectra_fused(rows, nfft, 4, layout="rows",
                                 return_history=True)

    results["B +return_history"] = slope(b_step, args.iters)

    _, h0 = pfb_spectra_fused(rows, nfft, 4, layout="rows",
                              return_history=True)
    h0.block_until_ready()

    def c_step():
        return pfb_spectra_fused(rows, nfft, 4, layout="rows", history=h0)

    results["C +history-in (fixed)"] = slope(c_step, args.iters)

    def d_step():
        return pfb_spectra_fused(rows, nfft, 4, layout="rows", history=h0,
                                 return_history=True)

    results["D both (fixed h)"] = slope(d_step, args.iters)

    state = {"h": h0}

    def e_step():
        out, state["h"] = pfb_spectra_fused(
            rows, nfft, 4, layout="rows", history=state["h"],
            return_history=True)
        return out

    results["E chained streaming"] = slope(e_step, args.iters)

    print(json.dumps({
        "nfft": nfft, "ndf": args.ndf,
        "ms": {k: round(v * 1e3, 2) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
