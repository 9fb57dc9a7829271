"""CLI: rebuild the native library (the reference's ``rebuild.py``).

``python -m paf_baseband2power_tpu.cli.rebuild [--debug] [--tsan] [--asan]``
runs ``make clean`` + the requested build in ``native/``.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="pafb2p_rebuild")
    ap.add_argument("--debug", action="store_true",
                    help="build with -DPAFB2P_DEBUG -O0")
    ap.add_argument("--tsan", action="store_true")
    ap.add_argument("--asan", action="store_true")
    args = ap.parse_args(argv)

    subprocess.run(["make", "-C", NATIVE_DIR, "clean"], check=True)
    cmd = ["make", "-C", NATIVE_DIR]
    if args.debug:
        cmd.append("DEBUG=1")
    subprocess.run(cmd, check=True)
    if args.tsan:
        subprocess.run(["make", "-C", NATIVE_DIR, "tsan"], check=True)
    if args.asan:
        subprocess.run(["make", "-C", NATIVE_DIR, "asan"], check=True)
    print("native rebuild complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
