"""Run the r4 live-topology soak matrix on the REAL TPU backend.

Executes paf_soak (C++ sendmmsg sender -> UDP capture -> shm ring ->
TPU compute -> sink, the reference's full program
``paf-baseband2power.py:117-127``) across the r4 matrix:

* continuity power runs (wire + device-layout) at the r3 geometries;
* the device-layout power run REPEATED to diagnose the r3 1.8% loss
  anomaly (SOAK_r03 run 2 vs 5: one device-layout run recorded loss
  where the wire twin recorded none — tunnel variance or placement
  cost?);
* the round's new capability: fine-channel modes (PFB x waterfall,
  PFB x Stokes) as the compute stage of the LIVE topology — the
  composed kernels had only ever run on pre-recorded/synthetic blocks.

Rates/widths are tunnel-sustainable (the axon link caps wire width at
1-2 chunks; the kernels themselves run 37-220x real time, BENCH/PFB_r04).
Writes benchmarks/SOAK_r04.json. Each soak is its own subprocess (clean
backend + ring); the JSON line on stdout is the report.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benchmarks", "SOAK_r04.json")

BASE_ARGS = ["--seconds", "8", "--ndf", "1024", "--nports", "1",
             "--nblk", "8", "--fetch-every", "8"]

RUNS = [
    # (label, extra args)
    ("power wire r3-continuity",
     ["--rate", "0.5", "--nchk", "2"]),
    ("power device-layout #1 (anomaly diagnosis)",
     ["--rate", "0.5", "--nchk", "2", "--device-layout"]),
    ("power device-layout #2",
     ["--rate", "0.5", "--nchk", "2", "--device-layout"]),
    ("power device-layout #3",
     ["--rate", "0.5", "--nchk", "2", "--device-layout"]),
    ("pfb128 x waterfall[64] device-layout (live fine channels)",
     ["--rate", "0.5", "--nchk", "2", "--device-layout",
      "--pfb", "128", "--nspectra", "64"]),
    ("pfb128 x stokes device-layout",
     ["--rate", "0.5", "--nchk", "2", "--device-layout",
      "--pfb", "128", "--stokes"]),
    ("pfb128 x waterfall[64] device-layout, TRUE 108us cadence",
     ["--rate", "1.0", "--nchk", "1", "--device-layout",
      "--pfb", "128", "--nspectra", "64"]),
]


def main():
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    env.pop("JAX_PLATFORMS", None)  # let the axon plugin select the TPU
    runs = []
    port = 29900
    for label, extra in RUNS:
        cmd = [sys.executable, "-m",
               "paf_baseband2power_tpu.cli.paf_soak",
               *BASE_ARGS, *extra, "--port-base", str(port),
               "-k", f"/tmp/soak_r04_{port}"]
        port += 10
        t0 = time.time()
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=900, cwd=REPO)
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            rep = json.loads(line)
        except json.JSONDecodeError:
            rep = {"error": (r.stdout + r.stderr)[-400:], "pass": False}
        rep["label"] = label
        rep["wall_sec"] = round(time.time() - t0, 1)
        runs.append(rep)
        print(json.dumps({k: rep.get(k) for k in
                          ("label", "mode", "loss", "blocks_computed",
                           "expected_blocks", "pass")}), flush=True)
        with open(OUT, "w") as f:
            json.dump(_artifact(runs), f, indent=1)
    bad = [r["label"] for r in runs if not r.get("pass")]
    print(json.dumps({"ok": not bad, "failed": bad}))


def _artifact(runs):
    dl = [r for r in runs
          if r.get("label", "").startswith("power device-layout")]
    losses = [r.get("loss") for r in dl if "loss" in r]
    return {
        "what": "Live topology soaks on the REAL TPU backend, r4: the "
                "r3 power runs for continuity PLUS the composed "
                "fine-channel modes (PFB x waterfall, PFB x Stokes) as "
                "the compute stage of the live capture->ring->TPU "
                "pipeline — the reference's full program "
                "(paf-baseband2power.py:117-127) with the planned "
                "channelizer (makefile:27) actually in the loop.",
        "environment": "Single v5e behind the axon tunnel; wire width "
                       "tunnel-bound (see SOAK_r03 environment note). "
                       "Rates/widths chosen tunnel-sustainable; the "
                       "kernels themselves run 37-220x real time.",
        "anomaly_diagnosis": {
            "question": "SOAK_r03 run 2 recorded 1.8% loss for "
                        "device-layout power where the wire twin (run 5) "
                        "recorded 0.0% — corner-turn placement cost or "
                        "tunnel variance?",
            "device_layout_losses_r4": losses,
        },
        "runs": runs,
        "date": time.strftime("%Y-%m-%d"),
        "reproduce": ["python benchmarks/soak_r04.py"],
    }


if __name__ == "__main__":
    main()
