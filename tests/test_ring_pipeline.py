"""End-to-end ring-mode pipeline tests: the full 3-process topology."""

import os
import subprocess
import sys
import uuid

import numpy as np
import pytest

from paf_baseband2power_tpu import constants as C
from paf_baseband2power_tpu.io import ringbuffer as rb
from paf_baseband2power_tpu.io.dada import DadaFileReader
from paf_baseband2power_tpu.ops import frame as F
from paf_baseband2power_tpu.ops.golden import baseband2power_golden

NDF, NCHK = 32, 8
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_cli(module, *args, **kw):
    kw.setdefault("timeout", 180)
    return subprocess.run(
        [sys.executable, "-m", f"paf_baseband2power_tpu.cli.{module}", *args],
        env=ENV, capture_output=True, text=True, **kw)


@pytest.fixture
def keys():
    k_in, k_out = uuid.uuid4().hex[:8], uuid.uuid4().hex[:8]
    yield k_in, k_out
    for k in (k_in, k_out):
        if rb.exists(k):
            rb.destroy(k)


def test_diskdb_to_ring(tmp_path, keys):
    """paf_diskdb replays a recorded file into a ring, block for block."""
    key, _ = keys
    bb = str(tmp_path / "bb.dada")
    r = run_cli("paf_gen", "-o", bb, "-n", "2", "--ndf", str(NDF),
                "--nchk", str(NCHK), "--seed", "3")
    assert r.returncode == 0, r.stderr
    rb.create(key, NDF * NCHK * C.DT_SIZE, 4)

    r = run_cli("paf_diskdb", "-a", key, "-c", bb, "-b", str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "replayed 2 blocks" in r.stdout

    with rb.RingBuffer(key) as ring:
        ring.lock_read()
        assert ring.read_header().get_int("NBIT") == 16
        for i in range(2):
            view = ring.open_block_read()
            want = F.synthetic_block(rng=3 + i, ndf=NDF, nchk=NCHK)
            np.testing.assert_array_equal(
                view.view("<i2"), want.reshape(-1))
            ring.close_block_read()
        assert ring.open_block_read() is None


def test_full_ring_pipeline_via_launcher(tmp_path, keys):
    """launcher: gen -> diskdb -> baseband2power -> dbdisk over rings,
    three OS processes, parity against the golden model."""
    key_in, key_out = keys
    conf = tmp_path / "pipeline.conf"
    conf.write_text(
        f"[BasicConf]\nNCHK_NIC: {NCHK}\n"
        f"[DiskdbConf]\nNDF: {NDF}\nNBLK: 3\nKEY: {key_in}\n"
        f"[Baseband2powerConf]\nKEY: {key_out}\nNCHAN: {NCHK * 7}\nNBLK: 2\n"
    )
    r = run_cli("launcher", "-c", str(conf), "-a", "synthetic:3",
                "-b", str(tmp_path), "-o", "power.dada")
    assert r.returncode == 0, r.stderr + r.stdout

    out = tmp_path / "power.dada"
    assert out.exists()
    with DadaFileReader(str(out)) as reader:
        assert reader.header.get_int("NCHAN") == NCHK * 7
        recs = list(reader.blocks(NCHK * 7 * 4))
    assert len(recs) == 3
    for i, rec in enumerate(recs):
        want = baseband2power_golden(
            F.synthetic_block(rng=i, ndf=NDF, nchk=NCHK))
        np.testing.assert_allclose(np.frombuffer(rec, "<f4"), want, rtol=1e-5)
    # rings torn down afterwards
    assert not rb.exists(key_in)
    assert not rb.exists(key_out)
    # .key files for operator parity
    assert (tmp_path / "diskdb.key").read_text().startswith("DADA INFO:")


def test_ring_size_mismatch_rejected(tmp_path, keys):
    """Attach-time size validation, like capture.c:600-612."""
    key, _ = keys
    rb.create(key, 12345, 2)
    from paf_baseband2power_tpu.io.ringbuffer import RingSource
    with pytest.raises(rb.RingBufferError):
        RingSource(key, ndf=NDF, nchk=NCHK)


def test_diskdb_skip_blocks_resume(tmp_path, keys):
    """--skip-blocks: replay resumes mid-file with OBS_OFFSET set."""
    key, _ = keys
    bb = str(tmp_path / "bb.dada")
    run_cli("paf_gen", "-o", bb, "-n", "3", "--ndf", str(NDF),
            "--nchk", str(NCHK), "--seed", "50")
    rb.create(key, NDF * NCHK * C.DT_SIZE, 4)
    r = run_cli("paf_diskdb", "-a", key, "-c", bb, "--skip-blocks", "2")
    assert r.returncode == 0, r.stderr
    assert "replayed 1 blocks" in r.stdout
    with rb.RingBuffer(key) as ring:
        ring.lock_read()
        hdr = ring.read_header()
        assert hdr.get_int("OBS_OFFSET") == 2 * NDF * NCHK * C.DT_SIZE
        view = ring.open_block_read()
        want = F.synthetic_block(rng=52, ndf=NDF, nchk=NCHK)
        np.testing.assert_array_equal(view.view("<i2"), want.reshape(-1))
        ring.close_block_read()


def test_composed_ring_pipeline_via_launcher(tmp_path, keys):
    """launcher forwards the composed detection flags and sizes the output
    ring for the bigger records: PFB x Stokes x 2-spectra waterfall over
    the full 3-process topology."""
    from paf_baseband2power_tpu.ops.pfb import pfb_spectra_golden

    key_in, key_out = keys
    nfft, nout = 16, 2
    conf = tmp_path / "pipeline.conf"
    conf.write_text(
        f"[BasicConf]\nNCHK_NIC: {NCHK}\n"
        f"[DiskdbConf]\nNDF: {NDF}\nNBLK: 3\nKEY: {key_in}\n"
        f"[Baseband2powerConf]\nKEY: {key_out}\nNCHAN: {NCHK * 7}\nNBLK: 2\n"
    )
    r = run_cli("launcher", "-c", str(conf), "-a", "synthetic:2",
                "-b", str(tmp_path), "-o", "spec.dada",
                "--pfb", str(nfft), "--stokes", "--nspectra", str(nout))
    assert r.returncode == 0, r.stderr + r.stdout

    rec_floats = nout * 4 * NCHK * 7 * nfft
    with DadaFileReader(str(tmp_path / "spec.dada")) as reader:
        assert reader.header["STOKES"] == "IQUV"
        recs = list(reader.blocks(rec_floats * 4))
    assert len(recs) == 2
    block0 = F.synthetic_block(rng=0, ndf=NDF, nchk=NCHK)
    want = pfb_spectra_golden(block0, nfft, 4, nout=nout, stokes=True)
    got = np.frombuffer(recs[0], "<f4").reshape(want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-4,
                               atol=1e-5 * np.abs(want).max())

def test_sod_cli_pipeline(tmp_path, keys):
    """Cross-process SOD: one writer (the capture pattern) commits
    pre-observation transient blocks, marks SOD, then streams the
    observation; paf_dbdisk --wait-sod attaches mid-stream and spills
    exactly the observation."""
    import threading
    import time

    key, _ = keys
    bufsz = NDF * NCHK * C.DT_SIZE
    rb.create(key, bufsz, 8)
    blocks = [F.synthetic_block(rng=11 + i, ndf=NDF, nchk=NCHK)
              for i in range(2)]
    junk_done = threading.Event()

    def writer():
        from paf_baseband2power_tpu.io.dada import baseband_header

        with rb.RingBuffer(key) as w:
            w.lock_write()
            for _ in range(2):                    # alignment transient
                view = w.open_block_write()
                view[:] = 0xEE
                w.close_block_write()
            junk_done.set()
            time.sleep(0.3)                       # reader attaches here
            w.write_header(baseband_header(nchan=NCHK * C.NCHAN_CHK))
            w.set_sod()
            for b in blocks:
                view = w.open_block_write()
                view[:] = np.frombuffer(b.tobytes(), np.uint8)
                w.close_block_write()
            w.set_eod()
            w.unlock_write()

    t = threading.Thread(target=writer)
    t.start()
    try:
        junk_done.wait(timeout=30)
        r = run_cli("paf_dbdisk", "-k", key, "-D", str(tmp_path),
                    "-o", "obs.dada", "-W", "--wait-sod")
    finally:
        t.join(timeout=60)
    assert r.returncode == 0, r.stderr
    assert "wrote 2 blocks" in r.stdout

    reader = DadaFileReader(str(tmp_path / "obs.dada"))
    recs = list(reader.blocks(bufsz))
    reader.close()
    assert len(recs) == 2
    for i, raw in enumerate(recs):
        np.testing.assert_array_equal(
            np.frombuffer(raw, "<i2"), blocks[i].reshape(-1))


def test_diskdb_marks_sod(tmp_path, keys):
    """paf_diskdb -e 1 marks SOD at its first replayed block; -e 0
    replays without a mark (transient data, paf_diskdb.cu -e parity)."""
    key, _ = keys
    bb = str(tmp_path / "bb.dada")
    r = run_cli("paf_gen", "-o", bb, "-n", "1", "--ndf", str(NDF),
                "--nchk", str(NCHK), "--seed", "5")
    assert r.returncode == 0, r.stderr
    rb.create(key, NDF * NCHK * C.DT_SIZE, 4)
    r = run_cli("paf_diskdb", "-a", key, "-c", bb, "-b", str(tmp_path),
                "-e", "0")
    assert r.returncode == 0, r.stderr
    with rb.RingBuffer(key) as ring:
        assert ring.sod_block == -1
    rb.destroy(key)
    rb.create(key, NDF * NCHK * C.DT_SIZE, 4)
    r = run_cli("paf_diskdb", "-a", key, "-c", bb, "-b", str(tmp_path))
    assert r.returncode == 0, r.stderr
    with rb.RingBuffer(key) as ring:
        assert ring.sod_block == 0


def test_launcher_raw_spill_topology(tmp_path, keys):
    """4-process topology: diskdb -> baseband ring (NREADER=2) with
    compute AND a raw-baseband spill reading concurrently -> power ring
    -> disk. The raw spill must reproduce the input bytes exactly."""
    k_in, k_out = keys
    cfgp = tmp_path / "pipe.conf"
    # uppercase keys: load_config is case-preserving like the reference
    # dialect (a stock ConfigParser WRITER lowercases keys silently)
    cfgp.write_text(
        f"[BasicConf]\nNCHK_NIC: {NCHK}\n"
        f"[DiskdbConf]\nNDF: {NDF}\nNBLK: 4\nKEY: {k_in}\n"
        f"[Baseband2powerConf]\nKEY: {k_out}\nNCHAN: {NCHK * 7}\n"
    )

    r = run_cli("launcher", "-c", str(cfgp), "-a", "synthetic:2",
                "-b", str(tmp_path), "-o", "power.dada",
                "--raw-spill", "raw.dada")
    assert r.returncode == 0, r.stdout + r.stderr

    # power output matches the golden per block
    reader = DadaFileReader(str(tmp_path / "power.dada"))
    recs = [np.frombuffer(b, "<f4") for b in reader.blocks(NCHK * 7 * 4)]
    reader.close()
    assert len(recs) == 2
    for i, rec in enumerate(recs):
        want = baseband2power_golden(
            F.synthetic_block(rng=i, ndf=NDF, nchk=NCHK))
        np.testing.assert_allclose(rec, want, rtol=1e-5)

    # the raw spill is byte-identical to the generated baseband
    raw = DadaFileReader(str(tmp_path / "raw.dada"))
    blocks = list(raw.blocks(NDF * NCHK * C.DT_SIZE))
    raw.close()
    assert len(blocks) == 2
    for i, b in enumerate(blocks):
        want = F.synthetic_block(rng=i, ndf=NDF, nchk=NCHK)
        np.testing.assert_array_equal(np.frombuffer(b, "<i2"),
                                      want.reshape(-1))


def test_paf_db_sod_and_status(tmp_path, keys):
    """Operational SOD control: a capture started with -b 0 (no mark) can
    be started later by `paf_db --sod`; --status reports cursors."""
    import json as _json

    key, _ = keys
    r = run_cli("paf_db", "-k", key, "-b", "256", "-n", "4")
    assert r.returncode == 0, r.stderr
    r = run_cli("paf_db", "-k", key, "--status")
    st = _json.loads(r.stdout.strip().splitlines()[-1])
    assert st["sod_block"] == -1 and st["blocks_written"] == 0
    with rb.RingBuffer(key) as w:
        w.lock_write()
        w.open_block_write()
        w.close_block_write()
        r = run_cli("paf_db", "-k", key, "--sod")
        st = _json.loads(r.stdout.strip().splitlines()[-1])
        assert st["sod_block"] == 1   # marks at the current cursor
        w.unlock_write()
