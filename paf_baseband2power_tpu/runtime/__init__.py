"""Runtime package: streaming executors, logging, debug/validation.

Also hosts :func:`apply_platform_env`, the platform-selection shim every
CLI entry point calls before first JAX backend use.
"""

import os


def apply_platform_env() -> None:
    """Honor ``JAX_PLATFORMS`` through ``jax.config``.

    Device plugins that force-select themselves (e.g. a tunnelled TPU
    backend) ignore the plain environment variable; setting the platform
    through ``jax.config`` wins over the plugin's choice. No-op when the
    variable is unset or a backend is already initialized.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already initialized; too late to switch
