"""Debug/validation layer and profiling hook tests."""

import os

import numpy as np
import pytest

from paf_baseband2power_tpu.runtime import debug as D
from paf_baseband2power_tpu.runtime import pipeline as RP


def test_check_power_accepts_valid():
    D.check_power(np.array([0.0, 1.5, 2.0], np.float32))


def test_check_power_rejects_nan_and_negative():
    with pytest.raises(D.PowerCheckError, match="non-finite"):
        D.check_power(np.array([1.0, np.nan]), block_index=3)
    with pytest.raises(D.PowerCheckError, match="negative"):
        D.check_power(np.array([1.0, -2.0]), block_index=4)


def test_debug_mode_toggle():
    old = D.debug_enabled()
    try:
        D.set_debug(True)
        assert D.debug_enabled()
        D.set_debug(False)
        assert not D.debug_enabled()
    finally:
        D.set_debug(old)


def test_pipeline_debug_validation(tmp_path):
    """Debug mode validates every block and logs per-block summaries."""
    old = D.debug_enabled()
    try:
        D.set_debug(True)
        src = RP.SyntheticSource(2, ndf=16, nchk=2)
        pipe = RP.PowerPipeline(depth=1, log_dir=str(tmp_path))
        stats = pipe.run(src, RP.MemorySink())
        assert stats.nblocks == 2
        log_text = (tmp_path / "baseband2power.log").read_text()
        assert "block 0 ok" in log_text
    finally:
        D.set_debug(old)


def test_pipeline_debug_catches_bad_kernel(tmp_path):
    """A kernel producing NaN is surfaced as PowerCheckError."""
    import jax.numpy as jnp

    old = D.debug_enabled()
    try:
        D.set_debug(True)
        src = RP.SyntheticSource(1, ndf=16, nchk=2)
        pipe = RP.PowerPipeline(
            power_fn=lambda x: jnp.full(14, jnp.nan, jnp.float32), depth=1)
        with pytest.raises(D.PowerCheckError):
            pipe.run(src, RP.MemorySink())
    finally:
        D.set_debug(old)


def test_profile_trace_noop():
    with D.profile_trace(None):
        pass


def test_profile_trace_writes(tmp_path):
    import jax
    import jax.numpy as jnp

    with D.profile_trace(str(tmp_path / "prof")):
        jax.jit(lambda x: x + 1)(jnp.ones(8)).block_until_ready()
    # a trace directory with at least one event file appears
    found = list((tmp_path / "prof").rglob("*"))
    assert found
