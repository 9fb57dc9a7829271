"""Full-geometry on-chip parity: flagship kernels at PRODUCTION shape.

The r4 sweep (``parity_tpu.py``) runs every kernel family at reduced
geometry (ndf=4096, nchk=2); but tile/grid selection branches on geometry
(``ops/pallas_power.py:70-85,244-248,570-572``, ``_pick_spectra_tile``),
so reduced shapes do not cover the production code paths by construction
(VERDICT r4 missing #3). This harness runs the flagship kernels at the
real block shape — ndf=8192 frames x nchk=48 chunks (2.8 GB, exactly one
0.884736 s integration, ``README.md:2`` / ``paf-baseband2power.conf:9``)
— against float64 goldens computed chunk-by-chunk on the host (a
monolithic float64 golden would be ~23 GB of temporaries; every
detection is frequency-chunk-independent, so per-chunk goldens
concatenated along the channel axis are exact).

Cases chosen to exercise every geometry-dependent tile-picker branch at
production shape: direct power/Stokes (wire + rows), the dynamic-row and
fused small-window scrunch paths, the packed-window rows Stokes
waterfall, and the fused fine-channel spectrometer at nfft=128/1024
(one-shot + streaming, x Stokes).

Writes ``benchmarks/PARITY_FULL_r05.json`` (checkpointed per case).
Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/parity_full.py
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import time

import numpy as np

from benchmarks.parity_tpu import BOUND_DIRECT, BOUND_PFB, _err, _to_rows


def _chunk_golden(fn, block: np.ndarray) -> np.ndarray:
    """Per-frequency-chunk float64 golden, concatenated on the channel
    (last) axis — exact for every chunk-independent detection."""
    return np.concatenate(
        [fn(block[:, c:c + 1]) for c in range(block.shape[1])], axis=-1)


def run_sweep(out_path: str, ndf: int = 8192, nchk: int = 48) -> dict:
    import jax
    import jax.numpy as jnp

    from paf_baseband2power_tpu.ops import pfb
    from paf_baseband2power_tpu.ops.frame import synthetic_block
    from paf_baseband2power_tpu.ops.golden import (
        baseband2power_golden,
        baseband2power_scrunch_golden,
        baseband2stokes_golden,
        baseband2stokes_scrunch_golden,
    )
    from paf_baseband2power_tpu.ops.pallas_pfb import (
        pfb_power_fused,
        pfb_spectra_fused,
    )
    from paf_baseband2power_tpu.ops.pallas_power import (
        baseband2power_pallas,
        baseband2power_scrunch_pallas,
        baseband2power_scrunch_rows_pallas,
        baseband2stokes_pallas,
        baseband2stokes_scrunch_rows_pallas,
    )

    report = {
        "what": "Full-geometry on-chip parity: flagship kernels at the "
                "production block shape (8192 x 48, 2.8 GB) vs chunked "
                "float64 goldens — every geometry-dependent tile-picker "
                "branch exercised at production shape (VERDICT r4 #3).",
        "metric": "max|got - want| / max|want| (peak-normalized)",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "ndf": ndf,
        "nchk": nchk,
        "date": time.strftime("%Y-%m-%d"),
        "cases": [],
        "ok": None,
    }

    def save():
        report["ok"] = all(c.get("ok") for c in report["cases"])
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=1)
        os.replace(tmp, out_path)

    def case(name: str, bound: float, fn, want_fn):
        row = {"mode": name, "bound": bound}
        t0 = time.perf_counter()
        try:
            got = np.asarray(fn())
            row["kernel_sec"] = round(time.perf_counter() - t0, 1)
            t1 = time.perf_counter()
            want = np.asarray(want_fn())
            row["golden_sec"] = round(time.perf_counter() - t1, 1)
            row["err"] = _err(got, want)
            row["ok"] = row["err"] <= bound
        except Exception as e:  # record, keep sweeping
            row["error"] = f"{type(e).__name__}: {e}"
            row["ok"] = False
        report["cases"].append(row)
        save()
        print(f"{'ok ' if row['ok'] else 'FAIL'} {name}: "
              f"{row.get('err', row.get('error'))}", flush=True)
        gc.collect()

    print("generating full-geometry blocks...", flush=True)
    b1 = synthetic_block(rng=2001, ndf=ndf, nchk=nchk)
    b2 = synthetic_block(rng=2002, ndf=ndf, nchk=nchk)

    # ---- wire-layout direct family (one device block at a time:
    # holding several 2.8 GB blocks distorts nothing for parity, but
    # stays inside HBM alongside the spectra outputs) ----------------------
    d1 = jnp.asarray(b1.reshape(ndf, -1))
    case("power wire", BOUND_DIRECT,
         lambda: baseband2power_pallas(d1),
         lambda: _chunk_golden(baseband2power_golden, b1))
    case("stokes wire", BOUND_DIRECT,
         lambda: baseband2stokes_pallas(d1),
         lambda: _chunk_golden(baseband2stokes_golden, b1))
    case("scrunch[64] wire (dynamic-row path)", BOUND_DIRECT,
         lambda: baseband2power_scrunch_pallas(d1, 64),
         lambda: _chunk_golden(
             lambda b: baseband2power_scrunch_golden(b, 64), b1))
    case("scrunch[256] wire (small-window fused path)", BOUND_DIRECT,
         lambda: baseband2power_scrunch_pallas(d1, 256),
         lambda: _chunk_golden(
             lambda b: baseband2power_scrunch_golden(b, 256), b1))

    # ---- rows-layout (recommended) direct family -------------------------
    del d1
    gc.collect()
    r1 = jnp.asarray(_to_rows(b1))
    case("power rows (nout=1)", BOUND_DIRECT,
         lambda: baseband2power_scrunch_rows_pallas(r1, 1)[0],
         lambda: _chunk_golden(baseband2power_golden, b1))
    case("stokes rows (nout=1)", BOUND_DIRECT,
         lambda: baseband2stokes_scrunch_rows_pallas(r1, 1)[0],
         lambda: _chunk_golden(baseband2stokes_golden, b1))
    case("stokes x scrunch[64] rows (packed windows)", BOUND_DIRECT,
         lambda: baseband2stokes_scrunch_rows_pallas(r1, 64),
         lambda: _chunk_golden(
             lambda b: baseband2stokes_scrunch_golden(b, 64), b1))

    # ---- fused fine-channel spectrometer, rows streaming -----------------
    r2 = jnp.asarray(_to_rows(b2))

    def g2(fn):
        """Golden over the concatenated 2-block stream, chunk by chunk."""
        return np.concatenate(
            [fn(np.concatenate([b1[:, c:c + 1], b2[:, c:c + 1]], axis=0))
             for c in range(nchk)], axis=-1)

    for nfft in (128, 1024):
        held = {}

        def oneshot(nfft=nfft, held=held):
            p1, held["h"] = pfb_spectra_fused(
                r1, nfft, 4, layout="rows", return_history=True)
            return p1

        def streamed(nfft=nfft, held=held):
            return pfb_spectra_fused(
                r2, nfft, 4, layout="rows", history=held["h"])

        want = {}

        def want_pair(nfft=nfft, want=want):
            if "w" not in want:
                want["w"] = g2(lambda b: pfb.pfb_spectra_golden(
                    b, nfft, 4, nout=2))
            return want["w"]

        case(f"pfb {nfft} rows one-shot", BOUND_PFB,
             oneshot, lambda want_pair=want_pair: want_pair()[:1])
        case(f"pfb {nfft} rows streaming", BOUND_PFB,
             streamed, lambda want_pair=want_pair: want_pair()[1:])
        want.clear()
        held.clear()

    # pfb x stokes rows streaming (the composed recommended mode)
    helds = {}

    def st_oneshot():
        p1, helds["h"] = pfb_spectra_fused(
            r1, 128, 4, stokes=True, layout="rows", return_history=True)
        return p1

    def st_streamed():
        return pfb_spectra_fused(
            r2, 128, 4, stokes=True, layout="rows", history=helds["h"])

    wants = {}

    def st_want():
        if "w" not in wants:
            wants["w"] = g2(lambda b: pfb.pfb_spectra_golden(
                b, 128, 4, nout=2, stokes=True))
        return wants["w"]

    case("pfb 128 x stokes rows one-shot", BOUND_PFB,
         st_oneshot, lambda: st_want()[:1])
    case("pfb 128 x stokes rows streaming", BOUND_PFB,
         st_streamed, lambda: st_want()[1:])

    # dedicated single-operator nfft=128 power kernel, wire layout (its
    # row-tile picker also branches on geometry)
    del r1, r2
    gc.collect()
    d1 = jnp.asarray(b1.reshape(ndf, -1))
    d2 = jnp.asarray(b2.reshape(ndf, -1))
    heldp = {}

    def pw_oneshot():
        p1, heldp["h"] = pfb_power_fused(d1, 128, 4, return_history=True)
        return p1

    def pw_streamed():
        return pfb_power_fused(d2, 128, 4, history=heldp["h"])

    wp = {}

    def pw_want():
        if "w" not in wp:
            wp["w"] = g2(lambda b: pfb.pfb_spectra_golden(b, 128, 4,
                                                          nout=2))
        return wp["w"]

    case("pfb_power_fused 128 wire one-shot", BOUND_PFB,
         pw_oneshot, lambda: pw_want()[0])
    case("pfb_power_fused 128 wire streaming", BOUND_PFB,
         pw_streamed, lambda: pw_want()[1])

    save()
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndf", type=int, default=8192)
    ap.add_argument("--nchk", type=int, default=48)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "PARITY_FULL_r05.json"))
    ap.add_argument("--allow-cpu", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if jax.default_backend() != "tpu" and not args.allow_cpu:
        raise SystemExit("full-geometry parity must run on the real TPU "
                         "(--allow-cpu to override)")
    report = run_sweep(args.out, args.ndf, args.nchk)
    bad = [c["mode"] for c in report["cases"] if not c["ok"]]
    print(json.dumps({"ok": report["ok"], "cases": len(report["cases"]),
                      "failed": bad}))


if __name__ == "__main__":
    main()
