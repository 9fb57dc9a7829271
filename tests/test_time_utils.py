"""Start-time math tests (capture.c:791-843 semantics, exact-integer ps)."""

import datetime

from paf_baseband2power_tpu import constants as C
from paf_baseband2power_tpu.ops import time_utils as T


def test_epoch_to_mjd_known_points():
    # epoch 0 = 2000-01-01 -> MJD 51544
    assert T.epoch_to_mjd(0) == 51544.0
    # epoch 1 = 2000-07-01 -> 51544 + 182 (leap year)
    assert T.epoch_to_mjd(1) == 51544.0 + 182
    # epoch 36 = 2018-01-01 -> MJD 58119
    assert T.epoch_to_mjd(36) == 58119.0


def test_start_time_zero_offsets():
    utc, ps = T.start_time(epoch=0, sec=0, idf=0)
    assert utc == "2000-01-01-00:00:00"
    assert ps == 0


def test_start_time_frame_offset_exact_ps():
    # one frame is exactly 108 us = 108_000_000 ps
    utc, ps = T.start_time(epoch=0, sec=0, idf=1)
    assert utc == "2000-01-01-00:00:00"
    assert ps == 108_000_000
    # 9260 frames exceed one second: 9260*1.08e-4 = 1.00008 s
    utc, ps = T.start_time(epoch=0, sec=0, idf=9260)
    assert utc == "2000-01-01-00:00:01"
    assert ps == 80_000_000


def test_start_time_full_period():
    # a whole 27 s period of frames == 27 s exactly
    utc, ps = T.start_time(epoch=0, sec=0, idf=C.NDF_PRD)
    assert utc == "2000-01-01-00:00:27"
    assert ps == 0


def test_start_time_epoch_table_override(tmp_path):
    ef = tmp_path / "epoch.dat"
    ef.write_text("# comment line\n51544 51544.0 2000-01-01\n")
    table = T.load_epoch_table(str(ef))
    utc, ps = T.start_time(epoch=51544, sec=10, idf=0, epoch_table=table)
    assert utc == "2000-01-01-00:00:10"
    assert ps == 0


def test_block_timestamp_progression():
    block_ps = int(C.TINT * 10**12)  # 884_736_000_000
    utc0, ps0 = "2020-06-01-12:00:00", 0
    utc1, ps1 = T.block_timestamp(utc0, ps0, 1, block_ps)
    assert utc1 == "2020-06-01-12:00:00"
    assert ps1 == block_ps
    utc2, ps2 = T.block_timestamp(utc0, ps0, 2, block_ps)
    assert utc2 == "2020-06-01-12:00:01"
    assert ps2 == 2 * block_ps - 10**12
