"""Live-topology soak on the REAL TPU backend (artifact: SOAK_r03.json).

Runs the full program of the reference (sender -> UDP capture -> shm ring
-> TPU compute -> sink, paf-baseband2power.py:117-127) with the production
Pallas kernel on the actual chip. Opt-in via PAFB2P_TPU_SOAK=1: the remote
tunnel's compile server adds 30-450 s of (untimed) warmup and the
achievable wire rate is tunnel-bound, so this is a deliberate artifact
run, not a default CI test. The same topology runs at rate 1.0 on every
suite run under the CPU backend (tests/test_soak.py).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("PAFB2P_TPU_SOAK", "") != "1",
                    reason="opt-in TPU soak (set PAFB2P_TPU_SOAK=1; needs "
                           "the real TPU backend + minutes of remote "
                           "compile warmup)")
def test_soak_on_tpu_backend(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "paf_baseband2power_tpu.cli.paf_soak",
         "--seconds", "8", "--rate", "0.25", "--ndf", "1024", "--nchk", "2",
         "--nports", "1", "--nblk", "8", "--fetch-every", "8",
         "--port-base", "29760", "-k", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["backend"] == "tpu", report
    assert report["pass"], report
    assert report["loss"] <= 0.05
