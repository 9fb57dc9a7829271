"""Frame codec tests: bit-exact round trip against the reference header
semantics (hdr.c:10-28)."""

import numpy as np
import pytest

from paf_baseband2power_tpu import constants as C
from paf_baseband2power_tpu.ops import frame as F


def test_geometry_constants():
    assert C.NCHAN_CHK == 7
    assert C.NCHAN == 336
    assert C.BLOCK_NBYTES == 2_818_572_288
    assert C.NDF_BLK * C.NSAMP_DF == 1024 * 1024
    assert C.OUT_NBYTES == 1344


def test_header_roundtrip():
    hdr = F.FrameHeader(valid=1, idf=123456, sec=54, epoch=51, beam=7, freq=1340.0)
    buf = hdr.pack()
    assert len(buf) == C.HDR_SIZE
    out = F.FrameHeader.unpack(buf)
    assert out == hdr


def test_header_bit_layout():
    """Check the exact big-endian bit positions the reference decodes."""
    hdr = F.FrameHeader(valid=1, idf=0xDEADBEEF, sec=0x2BCDEF01, epoch=0x2A,
                        beam=0x1234, freq=0x0ABC)
    buf = hdr.pack()
    w = np.frombuffer(buf, dtype=">u8")
    assert int(w[0]) >> 63 == 1
    assert int(w[0]) & 0xFFFFFFFF == 0xDEADBEEF
    assert (int(w[0]) >> 32) & 0x3FFFFFFF == 0x2BCDEF01
    assert (int(w[1]) >> 26) & 0x3F == 0x2A
    assert (int(w[2]) >> 16) & 0xFFFF == 0x0ABC
    assert int(w[2]) & 0xFFFF == 0x1234


def test_header_fast_accessors():
    hdr = F.FrameHeader(valid=1, idf=999, sec=81, epoch=3)
    buf = hdr.pack()
    assert F.header_idf(buf) == 999
    assert F.header_sec(buf) == 81


def test_frame_roundtrip():
    rng = np.random.default_rng(42)
    payload = rng.integers(-100, 100, size=F.FRAME_PAYLOAD_SHAPE, dtype=np.int16)
    hdr = F.FrameHeader(valid=1, idf=5, sec=0, epoch=51, freq=1300.0)
    wire = F.build_frame(hdr, payload)
    assert len(wire) == C.DF_SIZE
    hdr2, payload2 = F.split_frame(wire)
    assert hdr2 == hdr
    np.testing.assert_array_equal(payload2, payload)


def test_frame_distance_same_period():
    ref = F.FrameHeader(idf=100, sec=27)
    assert F.frame_distance(F.FrameHeader(idf=150, sec=27), ref) == 50
    assert F.frame_distance(F.FrameHeader(idf=40, sec=27), ref) == -60


def test_frame_distance_across_period():
    """Frames in the next 27 s period must order after the current one
    (capture.c:562-568: dsec/TDF frames)."""
    ref = F.FrameHeader(idf=C.NDF_PRD - 10, sec=27)
    nxt = F.FrameHeader(idf=5, sec=54)
    assert F.frame_distance(nxt, ref) == 15


def test_advance_ref_wraparound():
    ref = F.FrameHeader(idf=C.NDF_PRD - 100, sec=54)
    out = F.advance_ref(ref, 8192)
    assert out.sec == 81
    assert out.idf == 8192 - 100
    # advancing by an exact period lands on the same idf, +27 s
    out2 = F.advance_ref(F.FrameHeader(idf=7, sec=0), C.NDF_PRD)
    assert (out2.idf, out2.sec) == (7, 27)


def test_block_bytes_roundtrip():
    block = F.synthetic_block(rng=1, ndf=4, nchk=3)
    raw = F.block_to_bytes(block)
    assert len(raw) == 4 * 3 * C.DT_SIZE
    back = F.bytes_to_block(raw, ndf=4, nchk=3)
    np.testing.assert_array_equal(back, block)


def test_synthetic_block_stats():
    block = F.synthetic_block(rng=0, ndf=8, nchk=2, scale=64.0)
    assert block.dtype == np.int16
    assert abs(float(block.mean())) < 2.0
    assert 50.0 < float(block.std()) < 80.0
