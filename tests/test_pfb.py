"""PFB channelizer tests: golden parity, tone localization, streaming."""

import numpy as np
import pytest

import jax.numpy as jnp

from paf_baseband2power_tpu import constants as C
from paf_baseband2power_tpu.ops import frame as F
from paf_baseband2power_tpu.ops import pfb

NDF, NCHK, NFFT, NTAP = 16, 2, 32, 4


def make_tone_block(ndf, nchk, k0=5, chunk=1, chan=3, amp=100.0):
    """Block with a complex tone at fine channel k0 of one coarse channel."""
    nsamp = ndf * C.NSAMP_DF
    n = np.arange(nsamp)
    tone = amp * np.exp(2j * np.pi * k0 * n / NFFT)
    block = np.zeros((ndf, nchk, C.NSAMP_DF, C.NCHAN_CHK, 2, 2), np.int16)
    series = tone.reshape(ndf, C.NSAMP_DF)
    for p in range(2):
        block[:, chunk, :, chan, p, 0] = np.round(series.real)
        block[:, chunk, :, chan, p, 1] = np.round(series.imag)
    return block


def test_coeffs_shape_and_dc_gain():
    h = pfb.pfb_coeffs(NFFT, NTAP)
    assert h.shape == (NTAP, NFFT)
    # unit average DC gain across phases
    np.testing.assert_allclose(h.sum(axis=0).mean(), 1.0, rtol=1e-6)
    with pytest.raises(ValueError):
        pfb.pfb_coeffs(NFFT, NTAP, window="bogus")


def test_pfb_power_matches_golden():
    block = F.synthetic_block(rng=17, ndf=NDF, nchk=NCHK)
    got = np.asarray(pfb.pfb_power(jnp.asarray(block), NFFT, NTAP))
    want = pfb.pfb_power_golden(block, NFFT, NTAP)
    assert got.shape == (NCHK * C.NCHAN_CHK * NFFT,)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_pfb_mean_and_noshift_match_golden():
    block = F.synthetic_block(rng=18, ndf=NDF, nchk=NCHK)
    got = np.asarray(pfb.pfb_power(jnp.asarray(block), NFFT, NTAP,
                                   mean=True, shift=False))
    want = pfb.pfb_power_golden(block, NFFT, NTAP, mean=True, shift=False)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_tone_lands_in_right_fine_channel():
    k0, chunk, chan = 5, 1, 3
    block = make_tone_block(NDF, NCHK, k0=k0, chunk=chunk, chan=chan)
    power = np.asarray(pfb.pfb_power(jnp.asarray(block), NFFT, NTAP))
    grid = power.reshape(NCHK, C.NCHAN_CHK, NFFT)
    # all energy in the driven coarse channel
    hot = grid[chunk, chan]
    others = grid.sum() - hot.sum()
    assert hot.sum() > 1e3
    assert others < 1e-6 * hot.sum()
    # fine-channel peak at fftshifted k0
    expect_idx = (k0 + NFFT // 2) % NFFT
    assert int(hot.argmax()) == expect_idx
    # selectivity: peak dominates
    assert hot[expect_idx] > 100 * np.median(hot + 1e-9)


def test_streaming_history_continuity():
    """Two blocks with history == one concatenated double block."""
    b1 = F.synthetic_block(rng=20, ndf=NDF, nchk=NCHK)
    b2 = F.synthetic_block(rng=21, ndf=NDF, nchk=NCHK)
    both = np.concatenate([b1, b2], axis=0)

    step = pfb.make_streaming_pfb(NFFT, NTAP)
    p1, h1 = step(jnp.asarray(b1), None)
    p2, _ = step(jnp.asarray(b2), h1)
    total_streamed = np.asarray(p1) + np.asarray(p2)

    want = pfb.pfb_power_golden(both, NFFT, NTAP)
    np.testing.assert_allclose(total_streamed, want, rtol=2e-4)


def test_history_shape():
    block = F.synthetic_block(rng=22, ndf=NDF, nchk=NCHK)
    h = np.asarray(pfb.pfb_history(jnp.asarray(block), NFFT, NTAP))
    assert h.shape == (NCHK, C.NCHAN_CHK, 2, (NTAP - 1) * NFFT)
    assert h.dtype == np.complex64


def test_single_tap_is_weighted_segment_fft():
    """ntap=1 PFB == FFT of prototype-weighted nfft segments."""
    block = F.synthetic_block(rng=23, ndf=8, nchk=1)
    got = np.asarray(pfb.pfb_power(jnp.asarray(block), NFFT, ntap=1,
                                   window="rect", shift=False))
    h = pfb.pfb_coeffs(NFFT, 1, "rect", dtype=np.float64)[0]
    v = block.astype(np.float64)
    series = (v[..., 0] + 1j * v[..., 1]).transpose(1, 3, 4, 0, 2).reshape(
        1, C.NCHAN_CHK, 2, -1)
    segs = series.reshape(1, C.NCHAN_CHK, 2, -1, NFFT) * h
    want = (np.abs(np.fft.fft(segs, axis=-1)) ** 2).sum(axis=(2, 3))
    np.testing.assert_allclose(got, want.reshape(-1), rtol=2e-4)


def test_chunk_grouped_matches_monolithic():
    """lax.map chunk grouping is numerically identical to one-shot."""
    block = F.synthetic_block(rng=25, ndf=NDF, nchk=8)
    mono = np.asarray(pfb.pfb_power(jnp.asarray(block), NFFT, NTAP))
    grouped = np.asarray(pfb.pfb_power(jnp.asarray(block), NFFT, NTAP,
                                       chunk_groups=4))
    np.testing.assert_allclose(grouped, mono, rtol=1e-6)
    # with history too
    h = pfb.pfb_history(jnp.asarray(block), NFFT, NTAP)
    mono_h = np.asarray(pfb.pfb_power(jnp.asarray(block), NFFT, NTAP,
                                      history=h))
    grp_h = np.asarray(pfb.pfb_power(jnp.asarray(block), NFFT, NTAP,
                                     history=h, chunk_groups=2))
    np.testing.assert_allclose(grp_h, mono_h, rtol=1e-6)
