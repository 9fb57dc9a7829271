"""Multi-beam streaming: several capture streams through one mesh program.

The reference serves multiple beams by running disconnected per-beam
pipelines. Here B beam streams are batched into one SPMD step over a
``(beam, time, chunk)`` mesh: beams shard data-parallel, each block's
partial integrations psum over the time axis, and every beam's spectrum
lands in its own sink. One program, one dispatch per block row — the
batching the MXU/VPU wants, impossible in the process-per-beam design.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import constants as C
from ..parallel.mesh import BEAM_AXIS, CHUNK_AXIS, TIME_AXIS
from ..parallel.sharded import make_multibeam_power_step
from .log import open_log
from .pipeline import PipelineStats


def run_multibeam(sources, mesh, sinks, mean: bool = False,
                  log_dir: str | None = None) -> PipelineStats:
    """Drive B per-beam block sources through one sharded step.

    ``sources``: per-beam iterables of 2-D int16 blocks ``(ndf, lanes)``.
    ``sinks``: per-beam objects with ``write(power)``/``close()``.
    Streams until the shortest source is exhausted.
    """
    nbeam = len(sources)
    if nbeam != mesh.shape[BEAM_AXIS]:
        raise ValueError(
            f"{nbeam} sources != mesh beam axis {mesh.shape[BEAM_AXIS]}")
    if len(sinks) != nbeam:
        raise ValueError("one sink per beam required")
    log = open_log("multibeam", log_dir)
    step = make_multibeam_power_step(mesh, mean=mean)
    sharding = NamedSharding(mesh, P(BEAM_AXIS, TIME_AXIS, CHUNK_AXIS))

    stats = PipelineStats()
    t0 = time.perf_counter()
    try:
        for rows in zip(*sources):
            ndf = rows[0].shape[0]
            nchk = rows[0].shape[1] // (C.DT_SIZE // 2)
            if not stats.ndf:
                stats.ndf = ndf
            stacked = np.stack(rows).reshape(
                nbeam, ndf, nchk, C.NSAMP_DF, C.NCHAN_CHK, C.NPOL_SAMP,
                C.NDIM_POL)
            x = jax.device_put(jnp.asarray(stacked), sharding)
            out = np.asarray(step(x))
            for b, sink in enumerate(sinks):
                sink.write(out[b])
            stats.nblocks += 1
            stats.nbytes_in += stacked.nbytes
            stats.nbytes_out += out.nbytes
        stats.elapsed = time.perf_counter() - t0
    finally:
        for sink in sinks:
            sink.close()
    log.info("multibeam done: %d beams x %d blocks, %.3f s",
             nbeam, stats.nblocks, stats.elapsed)
    return stats
