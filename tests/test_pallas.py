"""Pallas kernel parity tests (interpret mode on the CPU backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from paf_baseband2power_tpu import constants as C
from paf_baseband2power_tpu.ops import frame as F
from paf_baseband2power_tpu.ops.golden import baseband2power_golden
from paf_baseband2power_tpu.ops import pallas_power as PP


@pytest.fixture(scope="module")
def block():
    return F.synthetic_block(rng=31, ndf=32, nchk=C.NCHK_NIC)


def test_pack_block_2d_is_view(block):
    b2 = PP.pack_block_2d(block)
    assert b2.shape == (32, C.NCHK_NIC * PP.LANES_PER_CHUNK)
    assert b2.base is block  # zero copy


def test_pallas_parity(block):
    b2 = jnp.asarray(PP.pack_block_2d(block))
    got = np.asarray(PP.baseband2power_pallas(b2, interpret=True))
    want = baseband2power_golden(block)
    assert got.shape == (C.NCHAN,)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pallas_mean(block):
    b2 = jnp.asarray(PP.pack_block_2d(block))
    got = np.asarray(PP.baseband2power_pallas(b2, mean=True, interpret=True))
    want = baseband2power_golden(block, mean=True)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pallas_from_bytes(block):
    raw = np.frombuffer(F.block_to_bytes(block), dtype=np.uint8)
    got = np.asarray(
        PP.baseband2power_pallas_bytes(
            jnp.asarray(raw), ndf=32, nchk=C.NCHK_NIC, interpret=True
        )
    )
    want = baseband2power_golden(block)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pallas_small_chunk_counts():
    """Reduced-geometry blocks (nchk not 48) still work."""
    block = F.synthetic_block(rng=5, ndf=16, nchk=4)
    b2 = jnp.asarray(PP.pack_block_2d(block))
    got = np.asarray(PP.baseband2power_pallas(b2, interpret=True))
    want = baseband2power_golden(block)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pallas_rejects_bad_shapes():
    with pytest.raises(ValueError):
        PP.baseband2power_pallas(jnp.zeros((12, PP.LANES_PER_CHUNK), jnp.int16),
                                 interpret=True)
    with pytest.raises(ValueError):
        PP.baseband2power_pallas(jnp.zeros((16, 100), jnp.int16),
                                 interpret=True)


def test_tile_picker_full_geometry():
    tdf, nlt = PP._pick_tiles(C.NDF_BLK, C.NCHK_NIC * PP.LANES_PER_CHUNK)
    assert C.NDF_BLK % tdf == 0
    lanes = C.NCHK_NIC * PP.LANES_PER_CHUNK
    assert lanes % nlt == 0 and (lanes // nlt) % 128 == 0
    assert tdf * (lanes // nlt) * 2 <= 2 ** 21  # in-tile fits budget
