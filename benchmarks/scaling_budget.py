"""Analytic weak-scaling budget: expected efficiency at 2-32 hosts.

Multi-chip hardware is unavailable in this environment (one v5e chip via
a tunnel), so the >=90% weak-scaling north star (BASELINE.json) cannot
be measured. This script derives it instead: for each deployment layout
it models the per-block communication cost against the 0.884736 s
real-time deadline (README.md:2) and the measured single-chip compute
times (BENCH_r05 matrix), over a parameter range of DCN/ICI bandwidths.

Model (standard alpha-beta): a psum of P bytes over N participants as a
ring allreduce costs  t = 2(N-1) * (alpha + (P/N)/B); a ppermute of P
bytes costs alpha + P/B. Efficiency = T1 / T_N with
T_N = t_compute + t_comm (compute never overlaps comm in the worst
case — the pipeline actually overlaps blocks, so this is a lower
bound). Weak scaling here means MORE HOSTS = MORE BEAMS (each host
captures its own NIC stream, the reference's deployment unit,
paf_capture.c:114-118); the beam axis is pure DP.

Structural validation: the exact programs this models are executed by
the 2-process CPU tests (tests/test_multihost.py — psum/ppermute/carry
across real OS-process boundaries) and the 8-device dryrun
(__graft_entry__.dryrun_multichip).

Writes benchmarks/SCALING_BUDGET.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os

# measured single-chip block times (ms), BENCH_r05 matrix (this round)
COMPUTE_MS = {
    "power rows (beam-DP)": 3.49,
    "stokes rows (beam-DP)": 5.06,
    "pfb1024 rows (beam-DP)": 23.01,
    "power wire (time-shard)": 3.73,
    "pfb1024 wire (time-shard)": 23.0,
    "spectra nout=64 stokes nfft=1024 (time-shard)": 26.5,
}

DEADLINE_S = 0.884736
NCHAN = 336
NPOL = 2

# communication payloads per block, per mode (bytes)


def payloads(nfft=1024, ntap=4, nout=64, stokes=True):
    halo = NCHAN * NPOL * (ntap - 1) * nfft * 8        # complex64 series
    return {
        # beam-DP rows: zero data-plane collectives; rank-0 gathers the
        # per-beam records (nchan*4 B/beam, rides the fetch batch)
        "power rows (beam-DP)": {"psum": 0, "ppermute": 0,
                                 "gather": NCHAN * 4},
        "stokes rows (beam-DP)": {"psum": 0, "ppermute": 0,
                                  "gather": 4 * NCHAN * 4},
        "pfb1024 rows (beam-DP)": {"psum": 0, "ppermute": 0,
                                   "gather": NCHAN * nfft * 4},
        # time-sharded wire: psum of partial integrations + (fine
        # channel) overlap-save halo ppermute + streaming-carry psum
        "power wire (time-shard)": {"psum": NCHAN * 4, "ppermute": 0,
                                    "gather": NCHAN * 4},
        "pfb1024 wire (time-shard)": {
            "psum": NCHAN * nfft * 4 + halo,   # spectra + carry broadcast
            "ppermute": halo,
            "gather": NCHAN * nfft * 4},
        "spectra nout=64 stokes nfft=1024 (time-shard)": {
            "psum": nout * 4 * NCHAN * nfft * 4 + halo,
            "ppermute": halo,
            "gather": nout * 4 * NCHAN * nfft * 4},
    }


def t_allreduce(p_bytes, n, alpha, bw):
    if p_bytes == 0 or n <= 1:
        return 0.0
    return 2 * (n - 1) * (alpha + (p_bytes / n) / bw)


def t_ppermute(p_bytes, n, alpha, bw):
    if p_bytes == 0 or n <= 1:
        return 0.0
    return alpha + p_bytes / bw


def efficiency(mode, n, alpha, bw):
    t1 = COMPUTE_MS[mode] / 1e3
    p = payloads()[mode]
    comm = (t_allreduce(p["psum"], n, alpha, bw)
            + t_ppermute(p["ppermute"], n, alpha, bw))
    # the tiny gather is batched (fetch_every=4+) and overlapped; count
    # it anyway at full cost
    comm += t_ppermute(p["gather"], n, alpha, bw)
    return t1 / (t1 + comm), (t1 + comm)


def main():
    # parameter ranges: DCN per-host ~ 12.5-25 GB/s (100-200 Gb/s NICs),
    # alpha ~ 25 us; ICI per-link ~ 45-100 GB/s, alpha ~ 1 us (v5e ICI;
    # scaling-book numbers)
    fabrics = {
        "DCN (12.5 GB/s, 25 us)": (25e-6, 12.5e9),
        "DCN (25 GB/s, 25 us)": (25e-6, 25e9),
        "ICI (45 GB/s, 1 us)": (1e-6, 45e9),
    }
    hosts = [2, 4, 8, 16, 32]
    report = {"deadline_s": DEADLINE_S, "model": "ring allreduce "
              "2(N-1)(a+P/N/B); ppermute a+P/B; eff = T1/(T1+Tcomm)",
              "compute_ms": COMPUTE_MS, "payload_bytes": payloads(),
              "rows": []}
    lines = ["| mode | fabric | " + " | ".join(f"N={n}" for n in hosts)
             + " | block/deadline @N=32 |",
             "|---|---|" + "---|" * (len(hosts) + 1)]
    for mode in COMPUTE_MS:
        for fname, (alpha, bw) in fabrics.items():
            if "beam-DP" in mode and "ICI" in fname:
                continue  # beam-DP is the cross-host layout
            effs = []
            for n in hosts:
                e, tn = efficiency(mode, n, alpha, bw)
                effs.append(e)
                report["rows"].append({
                    "mode": mode, "fabric": fname, "hosts": n,
                    "efficiency": round(e, 4),
                    "block_s": round(tn, 5),
                    "deadline_frac": round(tn / DEADLINE_S, 5)})
            _, t32 = efficiency(mode, 32, alpha, bw)
            lines.append(
                f"| {mode} | {fname} | "
                + " | ".join(f"{e * 100:.1f}%" for e in effs)
                + f" | {t32 / DEADLINE_S * 100:.2f}% |")
    out = os.path.join(os.path.dirname(__file__), "SCALING_BUDGET.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("\n".join(lines))


if __name__ == "__main__":
    main()
