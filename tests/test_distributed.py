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


class _FakeDev:
    def __init__(self, process_index):
        self.process_index = process_index


class _FakeMesh:
    """Just enough mesh surface for process_block_slice."""

    def __init__(self, proc_grid):
        # proc_grid: (n_beam, n_time) array of owning process indices
        self.devices = np.empty(proc_grid.shape, dtype=object)
        for idx, p in np.ndenumerate(proc_grid):
            self.devices[idx] = _FakeDev(int(p))
        self.shape = {M.BEAM_AXIS: proc_grid.shape[0],
                      M.TIME_AXIS: proc_grid.shape[1]}


def test_process_block_slice_rejects_non_contiguous():
    # process 0 owns time columns 0 and 2 of 4 — min..max would silently
    # claim column 1 (owned by process 1); must raise instead
    grid = np.array([[0, 1, 0, 1]])
    with pytest.raises(ValueError, match="non-contiguous time"):
        DD.process_block_slice(_FakeMesh(grid), nbeam_total=1, ndf_total=64)
    # scattered beams likewise
    grid_b = np.array([[0], [1], [0], [1]])
    with pytest.raises(ValueError, match="non-contiguous beam"):
        DD.process_block_slice(_FakeMesh(grid_b), nbeam_total=4,
                               ndf_total=64)
    # L-shaped ownership: contiguous coordinate sets that do not tile the
    # rectangle
    grid_l = np.array([[0, 0], [0, 1]])
    with pytest.raises(ValueError, match="rectangle"):
        DD.process_block_slice(_FakeMesh(grid_l), nbeam_total=2,
                               ndf_total=64)
    # a dense rectangle still resolves
    grid_ok = np.array([[0, 0], [1, 1]])
    (b0, b1), (f0, f1) = DD.process_block_slice(_FakeMesh(grid_ok),
                                                nbeam_total=2, ndf_total=8)
    assert (b0, b1) == (0, 1) and (f0, f1) == (0, 8)
