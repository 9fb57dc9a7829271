"""ThreadSanitizer pass over the native concurrent engine.

The host-code analogue of the reference's cuda-memcheck launcher hook
(paf-baseband2power.py:30,89-90): build the TSan-instrumented library and
replay the full capture loopback suite against it. The capture engine is a
from-scratch concurrent C++ design (atomics + shared_mutex rotation,
capture.h "Concurrency model"), so a clean TSan run is the key correctness
evidence the reference's racy-globals design never had.
"""

import glob
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "paf_baseband2power_tpu", "native")
TSAN_LIB = os.path.join(NATIVE, "libpafb2p.tsan.so")
TSAN_RT = "/lib/x86_64-linux-gnu/libtsan.so.2"


def _tsan_runtime():
    if os.path.exists(TSAN_RT):
        return TSAN_RT
    gcc = shutil.which("gcc")
    if gcc:
        p = subprocess.run([gcc, "-print-file-name=libtsan.so"],
                           capture_output=True, text=True)
        cand = p.stdout.strip()
        if cand and os.path.isabs(cand) and os.path.exists(cand):
            return cand
    return None


def _run_suite_under_sanitizer(tmp_path, make_target, lib, runtime,
                               opts_var, opts, marker):
    subprocess.run(["make", "-C", NATIVE, make_target], check=True,
                   capture_output=True)
    assert os.path.exists(lib)
    log_prefix = str(tmp_path / make_target)
    env = dict(
        os.environ,
        LD_PRELOAD=runtime,  # sanitizer runtimes cannot be dlopen'd
        PAFB2P_NATIVE_LIB=lib,
        PYTHONPATH=REPO,
        **{opts_var: f"{opts}:log_path={log_prefix}"},
    )
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         os.path.join(REPO, "tests", "test_capture.py"),
         os.path.join(REPO, "tests", "test_ringbuffer.py")],
        env=env, capture_output=True, text=True, timeout=600)
    reports = []
    for f in glob.glob(log_prefix + "*"):
        with open(f) as fh:
            reports.append(fh.read())
    assert r.returncode == 0, (
        f"suite under {make_target} failed (rc={r.returncode}):\n"
        f"{r.stdout[-3000:]}\n" + "\n".join(reports)[:5000])
    assert not any(marker in rep for rep in reports), (
        "\n".join(reports)[:5000])


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ compiler")
def test_capture_suite_under_tsan(tmp_path):
    rt = _tsan_runtime()
    if rt is None:
        pytest.skip("libtsan runtime not found")
    _run_suite_under_sanitizer(
        tmp_path, "tsan", TSAN_LIB, rt, "TSAN_OPTIONS", "exitcode=66",
        "WARNING: ThreadSanitizer")


def _asan_runtime():
    gcc = shutil.which("gcc")
    if gcc:
        p = subprocess.run([gcc, "-print-file-name=libasan.so"],
                           capture_output=True, text=True)
        cand = p.stdout.strip()
        if cand and os.path.isabs(cand) and os.path.exists(cand):
            return cand
    return None


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ compiler")
def test_capture_suite_under_asan(tmp_path):
    rt = _asan_runtime()
    if rt is None:
        pytest.skip("libasan runtime not found")
    # leak checking off: CPython itself intentionally leaks at interpreter
    # exit; we're auditing the native engine's memory errors, not Python's
    _run_suite_under_sanitizer(
        tmp_path, "asan", os.path.join(NATIVE, "libpafb2p.asan.so"), rt,
        "ASAN_OPTIONS", "detect_leaks=0:exitcode=66",
        "ERROR: AddressSanitizer")
