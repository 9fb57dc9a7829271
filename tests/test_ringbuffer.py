"""Native ring-buffer tests: protocol, zero-copy views, cross-process."""

import multiprocessing as mp
import os
import uuid

import numpy as np
import pytest

from paf_baseband2power_tpu.io import ringbuffer as rb
from paf_baseband2power_tpu.io.dada import DadaHeader, output_header


@pytest.fixture
def key():
    k = uuid.uuid4().hex[:8]
    yield k
    if rb.exists(k):
        rb.destroy(k)


def test_create_connect_destroy(key):
    rb.create(key, bufsz=1024, nbufs=4)
    assert rb.exists(key)
    with rb.RingBuffer(key) as ring:
        assert ring.bufsz == 1024
        assert ring.nbufs == 4
        assert ring.hdrsz == 4096
    rb.destroy(key)
    assert not rb.exists(key)


def test_create_duplicate_fails(key):
    rb.create(key, bufsz=64, nbufs=2)
    with pytest.raises(rb.RingBufferError):
        rb.create(key, bufsz=64, nbufs=2)


def test_connect_missing_fails():
    with pytest.raises(rb.RingBufferError):
        rb.RingBuffer("nonexistent-ring")


def test_header_channel(key):
    rb.create(key, bufsz=64, nbufs=2)
    with rb.RingBuffer(key) as w, rb.RingBuffer(key) as r:
        hdr = output_header(utc_start="2026-02-02-00:00:00")
        w.write_header(hdr)
        got = r.read_header(timeout_us=1000)
        assert got["UTC_START"] == "2026-02-02-00:00:00"


def test_header_read_timeout(key):
    rb.create(key, bufsz=64, nbufs=2)
    with rb.RingBuffer(key) as r:
        with pytest.raises(rb.RingBufferError):
            r.read_header(timeout_us=1000)


def test_block_protocol_roundtrip(key):
    rb.create(key, bufsz=256, nbufs=3)
    with rb.RingBuffer(key) as w, rb.RingBuffer(key) as r:
        w.lock_write()
        r.lock_read()
        for i in range(5):  # more blocks than nbufs: cursors advance
            view = w.open_block_write()
            view[:] = (np.arange(256) + i).astype(np.uint8)
            w.close_block_write()
            got = r.open_block_read()
            np.testing.assert_array_equal(
                got, (np.arange(256) + i).astype(np.uint8))
            r.close_block_read()
        w.set_eod()
        assert r.open_block_read() is None
        assert r.at_eod()


def test_partial_final_block(key):
    rb.create(key, bufsz=256, nbufs=2)
    with rb.RingBuffer(key) as w, rb.RingBuffer(key) as r:
        w.lock_write()
        r.lock_read()
        view = w.open_block_write()
        view[:100] = 7
        w.close_block_write(100)
        w.set_eod()
        got = r.open_block_read()
        assert got.shape == (100,)
        r.close_block_read()
        assert r.open_block_read() is None


def test_single_writer_lock(key):
    rb.create(key, bufsz=64, nbufs=2)
    with rb.RingBuffer(key) as a, rb.RingBuffer(key) as b:
        a.lock_write()
        with pytest.raises(rb.RingBufferError):
            b.lock_write()
        a.unlock_write()
        b.lock_write()  # now free


def test_writer_blocks_when_full(key):
    rb.create(key, bufsz=64, nbufs=2)
    with rb.RingBuffer(key) as w:
        w.lock_write()
        for _ in range(2):
            w.open_block_write()
            w.close_block_write()
        with pytest.raises(TimeoutError):
            w.open_block_write(timeout_us=10_000)


def test_unlock_write_implies_eod(key):
    """A writer exiting without EOD must still terminate readers
    (reference always EODs on exit paths, sync.c:184,196)."""
    rb.create(key, bufsz=64, nbufs=2)
    with rb.RingBuffer(key) as w, rb.RingBuffer(key) as r:
        w.lock_write()
        r.lock_read()
        w.open_block_write()
        w.close_block_write()
        w.unlock_write()
        assert r.open_block_read() is not None
        r.close_block_read()
        assert r.open_block_read() is None


def _writer_proc(key, nblocks):
    ring = rb.RingBuffer(key)
    ring.lock_write()
    ring.write_header(DadaHeader(TEST="1"))
    for i in range(nblocks):
        view = ring.open_block_write()
        view[:] = i % 251
        ring.close_block_write()
    ring.set_eod()
    ring.unlock_write()
    ring.disconnect()


def test_cross_process_stream(key):
    """Writer in a separate OS process, reader here (the real topology)."""
    rb.create(key, bufsz=4096, nbufs=3)
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_writer_proc, args=(key, 7))
    p.start()
    try:
        with rb.RingBuffer(key) as r:
            r.lock_read()
            assert r.read_header()["TEST"] == "1"
            seen = 0
            while True:
                view = r.open_block_read()
                if view is None:
                    break
                assert view[0] == seen % 251
                r.close_block_read()
                seen += 1
            assert seen == 7
            r.unlock_read()
    finally:
        p.join(timeout=30)
        assert p.exitcode == 0


def test_multi_reader_independent_cursors(key):
    """nreader=2 (dada_db -r 2): both readers see every block, each at its
    own pace; the writer recycles only past the slowest."""
    rb.create(key, bufsz=64, nbufs=2, nreader=2)
    with rb.RingBuffer(key) as w, rb.RingBuffer(key) as r1, \
            rb.RingBuffer(key) as r2:
        assert w.nreaders == 2
        w.lock_write()
        r1.lock_read()
        r2.lock_read()
        # fill the ring; a third block must wait for BOTH readers
        for i in range(2):
            view = w.open_block_write()
            view[:] = i + 1
            w.close_block_write()
        with pytest.raises(TimeoutError):
            w.open_block_write(timeout_us=10_000)
        # one reader releasing is not enough — the slowest holds the horizon
        r1.open_block_read()
        r1.close_block_read()
        with pytest.raises(TimeoutError):
            w.open_block_write(timeout_us=10_000)
        r2.open_block_read()
        r2.close_block_read()
        view = w.open_block_write()
        view[:] = 3
        w.close_block_write()
        w.set_eod()
        # both readers drain the remaining blocks independently
        for r, start in ((r1, 2), (r2, 2)):
            seen = []
            while True:
                v = r.open_block_read(timeout_us=1_000_000)
                if v is None:
                    break
                seen.append(int(v[0]))
                r.close_block_read()
            assert seen == [2, 3], seen
            assert r.at_eod()


def test_multi_reader_slots_exhausted(key):
    rb.create(key, bufsz=64, nbufs=2, nreader=2)
    with rb.RingBuffer(key) as a, rb.RingBuffer(key) as b, \
            rb.RingBuffer(key) as c:
        a.lock_read()
        b.lock_read()
        with pytest.raises(rb.RingBufferError):
            c.lock_read()
        b.unlock_read()
        c.lock_read()  # freed slot is reusable


def _multi_reader_proc(key, nblocks, out_q):
    ring = rb.RingBuffer(key)
    ring.lock_read()
    total = 0
    while True:
        view = ring.open_block_read()
        if view is None:
            break
        total += int(view[0])
        ring.close_block_read()
    ring.unlock_read()
    ring.disconnect()
    out_q.put(total)


def test_multi_reader_concurrent_processes(key):
    """Two reader processes consume one writer's stream concurrently."""
    rb.create(key, bufsz=4096, nbufs=3, nreader=2)
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    readers = [ctx.Process(target=_multi_reader_proc, args=(key, 9, q))
               for _ in range(2)]
    for p in readers:
        p.start()
    try:
        with rb.RingBuffer(key) as w:
            w.lock_write()
            for i in range(9):
                view = w.open_block_write()
                view[:] = i + 1
                w.close_block_write()
            w.set_eod()
            w.unlock_write()
        totals = [q.get(timeout=30) for _ in readers]
        assert totals == [sum(range(1, 10))] * 2
    finally:
        for p in readers:
            p.join(timeout=30)
            assert p.exitcode == 0


def test_observability_counters(key):
    rb.create(key, bufsz=64, nbufs=4)
    with rb.RingBuffer(key) as w, rb.RingBuffer(key) as r:
        w.lock_write()
        r.lock_read()
        for _ in range(3):
            w.open_block_write()
            w.close_block_write()
        assert w.blocks_written == 3
        assert w.blocks_full == 3
        r.open_block_read()
        r.close_block_read()
        assert r.blocks_read == 1
        assert r.blocks_full == 2


def test_lock_pages(key):
    """lock_pages mlocks the mapping per process (dada_db -l parity,
    paf-baseband2power.py:114); RLIMIT_MEMLOCK denial degrades to
    unlocked rather than failing."""
    rb.create(key, bufsz=4096, nbufs=2, lock_pages=True)
    with rb.RingBuffer(key) as ring:
        if not ring.pages_locked:
            pytest.skip("mlock denied by RLIMIT_MEMLOCK on this host")
        assert ring.pages_locked
    rb.destroy(key)
    # an unlocked ring reports False
    rb.create(key, bufsz=4096, nbufs=2)
    with rb.RingBuffer(key) as ring:
        assert not ring.pages_locked


# ---------------------------------------------------------------------------
# SOD (start-of-data) stream framing — reference: ipcbuf enable_sod /
# reader-waits-for-SOD (capture.c:622-639, diskdb.cu:36-67)
# ---------------------------------------------------------------------------

def test_sod_basic(key):
    """Pre-SOD blocks are transient: a SOD-waiting reader starts exactly
    at the marked observation boundary."""
    rb.create(key, bufsz=64, nbufs=8)
    with rb.RingBuffer(key) as w, rb.RingBuffer(key) as r:
        w.lock_write()
        r.lock_read()
        assert w.sod_block == -1
        for i in range(2):                       # transient junk
            view = w.open_block_write()
            view[:] = 200 + i
            w.close_block_write()
        w.set_sod()
        assert w.sod_block == 2
        for i in range(3):                       # the observation
            view = w.open_block_write()
            view[:] = i
            w.close_block_write()
        w.set_eod()
        assert r.wait_sod() == 2
        for i in range(3):
            view = r.open_block_read()
            assert view[0] == i
            r.close_block_read()
        assert r.open_block_read() is None


def test_sod_at_block_zero(key):
    """SOD before any block (the capture default): nothing skipped."""
    rb.create(key, bufsz=64, nbufs=2)
    with rb.RingBuffer(key) as w, rb.RingBuffer(key) as r:
        w.lock_write()
        r.lock_read()
        w.set_sod()
        view = w.open_block_write()
        view[:] = 42
        w.close_block_write()
        assert r.wait_sod() == 0
        assert r.open_block_read()[0] == 42


def test_wait_sod_enodata_and_timeout(key):
    rb.create(key, bufsz=64, nbufs=2)
    with rb.RingBuffer(key) as w, rb.RingBuffer(key) as r:
        r.lock_read()
        with pytest.raises(rb.RingBufferError):   # ETIMEDOUT
            r.wait_sod(timeout_us=20_000)
        w.lock_write()
        w.open_block_write()
        w.close_block_write()
        w.set_eod()
        with pytest.raises(rb.RingBufferError):   # ENODATA: ended, no SOD
            r.wait_sod(timeout_us=1_000_000)


def _sod_writer_proc(key, njunk, nobs):
    ring = rb.RingBuffer(key)
    ring.lock_write()
    for i in range(njunk):
        view = ring.open_block_write()
        view[:] = 100 + (i % 100)
        ring.close_block_write()
    ring.write_header(DadaHeader(UTC_START="2026-03-01-00:00:00"))
    ring.set_sod()
    for i in range(nobs):
        view = ring.open_block_write()
        view[:] = i
        ring.close_block_write()
    ring.set_eod()
    ring.unlock_write()
    ring.disconnect()


def test_wait_sod_never_stalls_writer(key):
    """More pre-SOD blocks than the ring holds: the SOD-waiting reader
    discards them as they arrive, so the writer never blocks — mid-stream
    attach works with arbitrary amounts of transient data."""
    rb.create(key, bufsz=64, nbufs=2)        # 6 junk blocks >> 2 slots
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_sod_writer_proc, args=(key, 6, 3))
    p.start()
    try:
        with rb.RingBuffer(key) as r:
            r.lock_read()
            sod = r.wait_sod()
            assert sod == 6
            seen = 0
            while True:
                view = r.open_block_read()
                if view is None:
                    break
                assert view[0] == seen
                r.close_block_read()
                seen += 1
            assert seen == 3
    finally:
        p.join(timeout=30)
        assert p.exitcode == 0


def test_mid_stream_attach_resume(key):
    """A reader joining a running ring starts at the SOD boundary with
    the right absolute time: UTC_START from the header plus the
    SOD-relative block offset (the operational behavior the reference
    gets from PSRDADA)."""
    from paf_baseband2power_tpu.io.ringbuffer import RingSource
    from paf_baseband2power_tpu import constants as C
    from paf_baseband2power_tpu.ops.time_utils import block_timestamp

    ndf, nchk = 4, 1
    bufsz = ndf * nchk * C.DT_SIZE
    rb.create(key, bufsz, nbufs=8)
    with rb.RingBuffer(key) as w:
        w.lock_write()
        for i in range(2):                        # pre-observation
            view = w.open_block_write()
            view[:] = 255
            w.close_block_write()
        from paf_baseband2power_tpu.io.dada import baseband_header

        w.write_header(baseband_header(
            utc_start="2026-03-01-00:00:00", picoseconds=0,
            nchan=nchk * C.NCHAN_CHK))
        w.set_sod()
        for i in range(2):                        # the observation
            view = w.open_block_write()
            view.view("<i2")[:] = i + 1
            w.close_block_write()
        w.set_eod()

        src = RingSource(key, ndf=ndf, nchk=nchk, wait_sod=True)
        assert src.start_block == 2
        blocks = list(src)
        assert len(blocks) == 2
        assert blocks[0].flat[0] == 1 and blocks[1].flat[0] == 2
        # absolute timestamps are SOD-relative: block i of the
        # observation is UTC_START + i * ndf * TDF_SEC
        block_ps = int(round(ndf * C.TDF_SEC * 1e12))
        utc, ps = block_timestamp(src.header["UTC_START"],
                                  int(src.header.get("PICOSECONDS", 0)),
                                  1, block_ps)
        assert utc == "2026-03-01-00:00:00"
        assert ps == block_ps


def test_late_reader_gets_fresh_slot(key):
    """A second reader attaching AFTER the first has finished and
    released its slot must claim the never-used slot (cursor 0), not
    inherit the finished one's end-of-stream cursor — otherwise the
    dual-reader launcher topology silently loses the whole stream for
    whichever reader attaches late."""
    rb.create(key, bufsz=64, nbufs=4, nreader=2)
    with rb.RingBuffer(key) as w:
        w.lock_write()
        for i in range(2):
            view = w.open_block_write()
            view[:] = i
            w.close_block_write()
        w.set_eod()
        # reader 1 consumes everything and detaches
        with rb.RingBuffer(key) as r1:
            r1.lock_read()
            while (v := r1.open_block_read()) is not None:
                r1.close_block_read()
            r1.unlock_read()
        # reader 2 attaches late: must see the full stream
        with rb.RingBuffer(key) as r2:
            r2.lock_read()
            seen = 0
            while (v := r2.open_block_read()) is not None:
                assert v[0] == seen
                r2.close_block_read()
                seen += 1
            assert seen == 2
            r2.unlock_read()
        # a RECONNECTING reader (both slots now released) resumes a
        # predecessor's cursor instead of rereading from zero
        with rb.RingBuffer(key) as r3:
            r3.lock_read()
            assert r3.open_block_read() is None   # resumed at EOD
            assert r3.at_eod()
