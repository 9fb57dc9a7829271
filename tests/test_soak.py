"""Real-time soak test: full live topology at a sustained paced rate."""

import json
import subprocess
import sys
import os

ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_soak_sustained_rate(tmp_path):
    """3 s paced stream through capture -> ring -> compute: no loss, all
    blocks delivered on schedule."""
    r = subprocess.run(
        [sys.executable, "-m", "paf_baseband2power_tpu.cli.paf_soak",
         "--seconds", "3", "--rate", "0.05", "--port-base", "29500",
         "-k", str(tmp_path)],
        env=ENV, capture_output=True, text=True, timeout=180)
    assert r.returncode == 0, r.stdout + r.stderr
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["pass"]
    assert report["loss"] <= 0.05
    assert report["blocks_computed"] >= report["expected_blocks"] - 1
    # stream held its schedule within 10%
    assert report["stream_elapsed"] < 3.0 * 1.1
