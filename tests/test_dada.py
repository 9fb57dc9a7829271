"""DADA header/file codec tests."""

import numpy as np
import pytest

from paf_baseband2power_tpu import constants as C
from paf_baseband2power_tpu.io import dada as D


def test_header_roundtrip():
    hdr = D.output_header(utc_start="2026-01-01-00:00:00", picoseconds=42,
                          freq=1340.5)
    raw = hdr.serialize()
    assert len(raw) == C.DADA_HDR_SIZE
    back = D.DadaHeader.parse(raw)
    assert back["UTC_START"] == "2026-01-01-00:00:00"
    assert back.get_int("PICOSECONDS") == 42
    assert back.get_float("FREQ") == 1340.5


def test_output_header_reference_fields():
    """Static fields must match the reference output spec
    (header_baseband2power.txt:31-44)."""
    hdr = D.output_header()
    assert hdr["TELESCOPE"] == "Effelsberg"
    assert hdr["INSTRUMENT"] == "PAF-BMF"
    assert hdr["RECEIVER"] == "PAF"
    assert hdr.get_int("NBIT") == 32
    assert hdr.get_int("NDIM") == 1
    assert hdr.get_int("NPOL") == 1
    assert hdr.get_int("NCHAN") == 336
    # TSAMP is the 0.884736 s integration in us (template typo corrected)
    assert hdr.get_float("TSAMP") == pytest.approx(884736.0)
    assert hdr.get_float("BYTES_PER_SECOND") == pytest.approx(1344 / 0.884736)


def test_header_typed_accessor_unset():
    hdr = D.DadaHeader(FOO="unset")
    assert hdr.get_int("FOO", 7) == 7
    with pytest.raises(KeyError):
        hdr.get_int("FOO")


def test_header_parse_comments_and_padding():
    raw = b"HEADER DADA # comment\nNCHAN  336\n# full comment line\n\x00junk"
    hdr = D.DadaHeader.parse(raw)
    assert hdr["HEADER"] == "DADA"
    assert hdr.get_int("NCHAN") == 336
    assert "junk" not in hdr


def test_header_overflow():
    hdr = D.DadaHeader({f"K{i}": "v" * 50 for i in range(100)})
    with pytest.raises(ValueError):
        hdr.serialize()


def test_file_roundtrip(tmp_path):
    path = str(tmp_path / "t.dada")
    hdr = D.output_header(utc_start="2026-01-01-00:00:00")
    payload = np.arange(336 * 3, dtype="<f4")
    with D.DadaFileWriter(path, hdr) as w:
        w.write(payload)
    with D.DadaFileReader(path) as r:
        assert r.header["UTC_START"] == "2026-01-01-00:00:00"
        blocks = list(r.blocks(336 * 4))
        assert len(blocks) == 3
        np.testing.assert_array_equal(
            np.frombuffer(b"".join(blocks), "<f4"), payload
        )


def test_file_reader_drops_partial_block(tmp_path):
    """Whole-block reads only, like diskdb.cu:103-121."""
    path = str(tmp_path / "t.dada")
    with D.DadaFileWriter(path, D.output_header()) as w:
        w.write(b"x" * 1000)
    with D.DadaFileReader(path) as r:
        assert list(r.blocks(600)) == [b"x" * 600]
    with D.DadaFileReader(path) as r:
        got = list(r.blocks(600, allow_partial=True))
        assert [len(b) for b in got] == [600, 400]


def test_truncated_header(tmp_path):
    path = str(tmp_path / "bad.dada")
    with open(path, "wb") as f:
        f.write(b"HEADER DADA\n")
    with pytest.raises(ValueError):
        D.DadaFileReader(path)
