"""Test configuration: force a virtual 8-device CPU mesh.

Real TPU hardware is single-chip here (reached through the axon tunnel, which
also force-selects the axon backend via jax.config — plain JAX_PLATFORMS env
overrides are ignored). Tests must run on a local 8-device CPU mesh, so we
set the host-device-count XLA flag before any backend initialization and pin
the platform through jax.config, which wins over the plugin's selection.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
