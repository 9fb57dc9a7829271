"""Golden-model tests: the NumPy oracle must match a brute-force loop."""

import numpy as np
import pytest

from paf_baseband2power_tpu import constants as C
from paf_baseband2power_tpu.ops import frame as F
from paf_baseband2power_tpu.ops.golden import baseband2power_golden


def brute_force_power(block):
    """Slowest possible formulation: explicit per-channel loops."""
    ndf, nchk, nsamp, nchan_chk, npol, ndim = block.shape
    out = np.zeros(nchk * nchan_chk, dtype=np.float64)
    x = block.astype(np.float64)
    for c in range(nchk):
        for k in range(nchan_chk):
            out[c * nchan_chk + k] = np.sum(x[:, c, :, k, :, :] ** 2)
    return out.astype(np.float32)


def test_golden_matches_brute_force():
    block = F.synthetic_block(rng=7, ndf=16, nchk=4)
    got = baseband2power_golden(block)
    want = brute_force_power(block)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_golden_shape_and_dtype():
    block = F.synthetic_block(rng=0, ndf=4, nchk=C.NCHK_NIC)
    got = baseband2power_golden(block)
    assert got.shape == (C.NCHAN,)
    assert got.dtype == np.float32


def test_golden_known_value():
    """A block of all-ones voltages integrates to ndf*nsamp*npol*ndim."""
    block = np.ones((8, 2, C.NSAMP_DF, C.NCHAN_CHK, 2, 2), dtype=np.int16)
    got = baseband2power_golden(block)
    np.testing.assert_array_equal(got, np.full(14, 8 * 128 * 4, np.float32))


def test_golden_mean_mode():
    block = F.synthetic_block(rng=3, ndf=8, nchk=2)
    total = baseband2power_golden(block, mean=False)
    mean = baseband2power_golden(block, mean=True)
    np.testing.assert_allclose(mean * (8 * C.NSAMP_DF * 2), total, rtol=1e-6)


def test_golden_channel_ordering():
    """Energy injected in (chunk=2, chan=3) must land at index 2*7+3."""
    block = np.zeros((4, 5, C.NSAMP_DF, C.NCHAN_CHK, 2, 2), dtype=np.int16)
    block[:, 2, :, 3, :, :] = 10
    got = baseband2power_golden(block)
    hot = 2 * C.NCHAN_CHK + 3
    assert got[hot] > 0
    assert np.count_nonzero(got) == 1
