"""Multi-host glue tests (single- and two-process CPU)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from paf_baseband2power_tpu.parallel import distributed as DD
from paf_baseband2power_tpu.parallel import mesh as M


def test_init_single_process_noop():
    DD.init_distributed()  # no env -> no-op
    assert jax.process_count() == 1


def test_global_mesh_local():
    mesh = DD.global_mesh(n_beam=1)
    assert mesh.devices.size == 8
    # chunk axis never exceeds local devices
    assert mesh.shape[M.CHUNK_AXIS] <= jax.local_device_count()
    m2 = DD.global_mesh(n_beam=2, n_chunk=2)
    assert m2.shape == {"beam": 2, "time": 2, "chunk": 2}


def test_process_block_slice_single():
    mesh = DD.global_mesh(n_beam=2, n_chunk=2)
    (b0, b1), (f0, f1) = DD.process_block_slice(mesh, nbeam_total=4,
                                                ndf_total=64)
    # single process owns everything
    assert (b0, b1) == (0, 4)
    assert (f0, f1) == (0, 64)
