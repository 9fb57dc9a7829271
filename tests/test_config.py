"""INI config parity tests."""

from paf_baseband2power_tpu import constants as C
from paf_baseband2power_tpu.config import load_config


def test_defaults_match_reference():
    conf = load_config()
    assert conf.basic.nsamp_df == 128
    assert conf.basic.nchk_nic == 48
    assert conf.diskdb.ndf == 8192
    assert conf.diskdb.nblk == 8
    assert conf.diskdb.key == "dada"
    assert conf.baseband2power.key == "adad"
    assert conf.baseband2power.nchan == 336
    assert conf.baseband2power.nbyte == 4
    assert conf.baseband2power.nblk == 4


def test_launcher_buffer_math():
    """Block sizes computed like paf-baseband2power.py:67,79."""
    conf = load_config()
    assert conf.diskdb_rbufsz == 2_818_572_288
    assert conf.baseband2power_rbufsz == 1344


def test_reference_format_ini(tmp_path):
    """A conf file in the reference's exact INI dialect parses."""
    p = tmp_path / "test.conf"
    p.write_text(
        "[BasicConf]\n"
        "NSAMP_DF:                       128\n"
        "NCHK_NIC:                       4\n"
        "\n"
        "[DiskdbConf]\n"
        "# comment about NDF\n"
        "NDF:      \t     \t     \t 64\n"
        "NBLK:   \t    \t    \t 8         \n"
        "KEY:\t\t\t\t dada\n"
        "HFNAME:\t\t\t\t header.txt\n"
        "\n"
        "[Baseband2powerConf]\n"
        "KEY:\t\t\t\tadad\n"
        "NCHAN:\t\t\t\t28\n"
    )
    conf = load_config(str(p))
    assert conf.basic.nchk_nic == 4
    assert conf.diskdb.ndf == 64
    assert conf.diskdb.hfname == "header.txt"
    assert conf.baseband2power.nchan == 28
    assert conf.diskdb_rbufsz == 64 * 4 * C.DT_SIZE
