"""On-chip numerical parity sweep: every kernel family on the REAL TPU.

CI runs the Pallas kernels in interpret mode, and interpret mode provably
diverges from the real Mosaic lowering (r3 found a 4-row block shape that
interpret accepted and the real lowering rejected). This harness is the
framework's equivalent of the reference's operational verification
(``/root/reference/capture.c:700-725`` — the only QA the reference had):
it runs EVERY kernel family x layout x streaming combination through the
real compiler on the real chip at reduced geometry and records the
per-mode error against the float64 golden models.

Error metric: ``max|got - want| / max|want|`` (peak-normalized max abs
error — Stokes U/V and spectra floors pass near zero, so per-element
relative error is undefined there). Stated bounds:

* direct detections (power / Stokes / tscrunch, f32 accumulation):
  1e-5 — pure f32 rounding over <= 2^20-sample sums;
* fused PFB spectrometers (bf16x3 MXU dots): 2e-5 — the bf16x3 split
  measured 3.5e-6 max relative error vs float64 (ops/pallas_pfb.py).

Writes one JSON artifact (default ``benchmarks/PARITY_TPU_r04.json``),
checkpointing after every case so a tunnel stall loses nothing. Each
case is also wrapped per-case: a failure records an ``error`` row
instead of killing the sweep.

Geometry: ``--ndf 4096 --nchk 2`` (default) is the smallest that admits
the full nout=64 cross at nfft=1024 (wpg = ndf/(8*64) must be a multiple
of 8). The kernels' program structure is identical to full geometry —
only grid sizes shrink.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

BOUND_DIRECT = 1e-5
BOUND_PFB = 2e-5


def _to_rows(block: np.ndarray) -> np.ndarray:
    """Host corner turn: canonical 6-D block -> (nseries, ndf, 256) rows
    (what ``capture --device-layout`` delivers, ORDER SERIES)."""
    ndf, nchk = block.shape[0], block.shape[1]
    return np.ascontiguousarray(
        block.transpose(1, 3, 4, 0, 2, 5).reshape(nchk * 14, ndf, 256))


def _err(got: np.ndarray, want: np.ndarray) -> float:
    peak = float(np.abs(want).max())
    if peak == 0.0:
        return float(np.abs(got).max())
    return float(np.abs(got.astype(np.float64)
                        - want.astype(np.float64)).max() / peak)


def run_sweep(ndf: int, nchk: int, out_path: str,
              nout_fine: int = 64) -> dict:
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
        FUSED_NFFTS,
        pfb_power_fused,
        pfb_spectra_fused,
    )
    from paf_baseband2power_tpu.ops.pallas_power import (
        baseband2power_pallas,
        baseband2power_scrunch_pallas,
        baseband2power_scrunch_rows_pallas,
        baseband2stokes_pallas,
        baseband2stokes_scrunch_pallas,
        baseband2stokes_scrunch_rows_pallas,
    )

    backend = jax.default_backend()
    report = {
        "what": "On-chip parity sweep: every Pallas kernel family x "
                "layout x streaming combination, REAL compiler + chip, "
                "vs the float64 golden models (interpret-mode CI "
                "provably diverges from the Mosaic lowering; this is "
                "the recorded operational verification).",
        "metric": "max|got - want| / max|want| (peak-normalized)",
        "backend": backend,
        "device": str(jax.devices()[0]),
        "ndf": ndf,
        "nchk": nchk,
        "date": time.strftime("%Y-%m-%d"),
        "cases": [],
        "ok": None,
    }

    b1 = synthetic_block(rng=1001, ndf=ndf, nchk=nchk)
    b2 = synthetic_block(rng=1002, ndf=ndf, nchk=nchk)
    both = np.concatenate([b1, b2], axis=0)
    d1 = jnp.asarray(b1.reshape(ndf, -1))
    d2 = jnp.asarray(b2.reshape(ndf, -1))
    r1 = jnp.asarray(_to_rows(b1))     # 3-D rows: the production form
    r2 = jnp.asarray(_to_rows(b2))

    def save():
        report["ok"] = all(c.get("ok") for c in report["cases"])
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=1)
        os.replace(tmp, out_path)

    def case(name: str, bound: float, fn, want, **meta):
        row = {"mode": name, "bound": bound, **meta}
        t0 = time.perf_counter()
        try:
            got = np.asarray(fn())
            row["err"] = _err(got, np.asarray(want))
            row["ok"] = row["err"] <= bound
            row["sec"] = round(time.perf_counter() - t0, 1)
        except Exception as e:  # record, keep sweeping
            row["error"] = f"{type(e).__name__}: {e}"
            row["ok"] = False
        report["cases"].append(row)
        save()
        print(f"{'ok ' if row['ok'] else 'FAIL'} {name}: "
              f"{row.get('err', row.get('error'))}", flush=True)

    # ---- direct detection family (wire 2-D device layout) ----------------
    case("power wire", BOUND_DIRECT,
         lambda: baseband2power_pallas(d1), baseband2power_golden(b1))
    case("stokes wire", BOUND_DIRECT,
         lambda: baseband2stokes_pallas(d1), baseband2stokes_golden(b1))
    case("scrunch[64] wire (dynamic-row path)", BOUND_DIRECT,
         lambda: baseband2power_scrunch_pallas(d1, 64),
         baseband2power_scrunch_golden(b1, 64))
    case("scrunch[512] wire (small-window fused path)", BOUND_DIRECT,
         lambda: baseband2power_scrunch_pallas(d1, 512),
         baseband2power_scrunch_golden(b1, 512))
    case("stokes x scrunch[64] wire", BOUND_DIRECT,
         lambda: baseband2stokes_scrunch_pallas(d1, 64),
         baseband2stokes_scrunch_golden(b1, 64))
    case("stokes rows (nout=1)", BOUND_DIRECT,
         lambda: baseband2stokes_scrunch_rows_pallas(r1, 1)[0],
         baseband2stokes_golden(b1))
    case("stokes x scrunch[64] rows", BOUND_DIRECT,
         lambda: baseband2stokes_scrunch_rows_pallas(r1, 64),
         baseband2stokes_scrunch_golden(b1, 64))
    case("power rows (nout=1)", BOUND_DIRECT,
         lambda: baseband2power_scrunch_rows_pallas(r1, 1)[0],
         baseband2power_golden(b1))
    case("power x scrunch[64] rows", BOUND_DIRECT,
         lambda: baseband2power_scrunch_rows_pallas(r1, 64),
         baseband2power_scrunch_golden(b1, 64))

    # ---- dedicated nfft=128 fused PFB (single-operator kernel) -----------
    g128 = pfb.pfb_spectra_golden(both, 128, 4, nout=2)

    def pfb128_pair():
        p1, h1 = pfb_power_fused(d1, 128, 4, return_history=True)
        p2 = pfb_power_fused(d2, 128, 4, history=h1)
        return p1, p2

    p128 = {}

    def pfb128_oneshot():
        p128["p1"], p128["p2"] = pfb128_pair()
        return p128["p1"]

    case("pfb_power_fused 128 wire one-shot", BOUND_PFB,
         pfb128_oneshot, g128[0])
    case("pfb_power_fused 128 wire streaming", BOUND_PFB,
         lambda: p128["p2"], g128[1])

    # ---- generalized fused spectrometer: the full cross ------------------
    goldens: dict = {}
    for nfft in FUSED_NFFTS:
        for nout in (1, nout_fine):
            for stokes in (False, True):
                key = (nfft, nout, stokes)
                want = pfb.pfb_spectra_golden(both, nfft, 4, nout=2 * nout,
                                              stokes=stokes)
                goldens[key] = want
                for layout in ("wire", "rows"):
                    x1 = r1 if layout == "rows" else d1
                    x2 = r2 if layout == "rows" else d2
                    held = {}

                    def oneshot(x1=x1, nfft=nfft, nout=nout, stokes=stokes,
                                layout=layout, held=held):
                        p1, h1 = pfb_spectra_fused(
                            x1, nfft, 4, nout=nout, stokes=stokes,
                            layout=layout, return_history=True)
                        held["h1"] = h1
                        return p1

                    def streamed(x2=x2, nfft=nfft, nout=nout, stokes=stokes,
                                 layout=layout, held=held):
                        return pfb_spectra_fused(
                            x2, nfft, 4, nout=nout, stokes=stokes,
                            layout=layout, history=held["h1"])

                    tag = (f"pfb {nfft}"
                           + (f" x waterfall[{nout}]" if nout > 1 else "")
                           + (" x stokes" if stokes else "")
                           + f" {layout}")
                    case(f"{tag} one-shot", BOUND_PFB, oneshot,
                         want[:nout], nfft=nfft, nout=nout, stokes=stokes,
                         layout=layout, streaming=False)
                    case(f"{tag} streaming", BOUND_PFB, streamed,
                         want[nout:], nfft=nfft, nout=nout, stokes=stokes,
                         layout=layout, streaming=True)
            del goldens[(nfft, nout, False)], goldens[(nfft, nout, True)]

    save()
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndf", type=int, default=4096)
    ap.add_argument("--nchk", type=int, default=2)
    ap.add_argument("--nout", type=int, default=64,
                    help="waterfall nout for the fine-channel cross")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "PARITY_TPU_r04.json"))
    ap.add_argument("--allow-cpu", action="store_true",
                    help="run anyway off-TPU (records backend; the "
                    "artifact only certifies the real lowering when "
                    "backend == tpu)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if jax.default_backend() != "tpu" and not args.allow_cpu:
        raise SystemExit("parity sweep must run on the real TPU "
                         "(--allow-cpu to override)")
    report = run_sweep(args.ndf, args.nchk, args.out, args.nout)
    bad = [c["mode"] for c in report["cases"] if not c["ok"]]
    print(json.dumps({"ok": report["ok"], "cases": len(report["cases"]),
                      "failed": bad}))


if __name__ == "__main__":
    main()
