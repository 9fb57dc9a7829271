"""shard_map pipelines: multi-device baseband->power.

Communication design (contrast with the reference's PSRDADA shm fabric,
SURVEY.md section 2 last row): the only cross-device exchange the direct
power path needs is a ``psum`` of partial integrations over the ``time``
axis — 336 float32 per block, riding ICI. The ``chunk`` (frequency) axis is
embarrassingly parallel, exactly like the reference's per-NIC chunk
partitioning (``capture.c:570-584``), so it needs no collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.power import baseband2power
from .mesh import CHUNK_AXIS, TIME_AXIS


def block_sharding(mesh) -> NamedSharding:
    """Sharding for a canonical block: frames over ``time``, chunks over
    ``chunk``."""
    return NamedSharding(mesh, P(TIME_AXIS, CHUNK_AXIS))


def power_sharding(mesh) -> NamedSharding:
    """Sharding for the output power vector: channels follow chunks."""
    return NamedSharding(mesh, P(CHUNK_AXIS))


def make_sharded_power_step(mesh, mean: bool = False):
    """Build the jitted multi-device power step.

    Input: canonical int16 block sharded ``P(time, chunk)``. Each device
    integrates its local (ndf_local, nchk_local) sub-block, then partials
    are ``psum``-ed over the time axis. Output: float32 power of shape
    ``(nchk * 7,)`` sharded over ``chunk``.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(TIME_AXIS, CHUNK_AXIS),
        out_specs=P(CHUNK_AXIS),
    )
    def step(block):
        local = baseband2power(block, mean=False)
        total = jax.lax.psum(local, TIME_AXIS)
        if mean:
            ndf = block.shape[0] * jax.lax.psum(1, TIME_AXIS)
            total = total / (ndf * block.shape[2] * block.shape[4])
        return total

    return jax.jit(step)


def shard_block(block, mesh):
    """Place a host block onto the mesh with the canonical sharding."""
    return jax.device_put(block, block_sharding(mesh))
