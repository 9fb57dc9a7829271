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
    import jax

    # persistent compile cache (works with the axon backend): repeat runs
    # of unchanged program shapes skip the 30-450 s remote compile server
    # — load-bearing for real-time soaks, where a cold warmup can exceed
    # the capture timeout. PAFB2P_NO_COMPILE_CACHE opts out; an explicit
    # JAX_COMPILATION_CACHE_DIR wins untouched. Checkout runs share the
    # repo-root .jax_cache (gitignored); installed (site-packages)
    # deployments fall back to a user cache dir rather than attempting
    # to write into the install prefix.
    if (not os.environ.get("PAFB2P_NO_COMPILE_CACHE")
            and not os.environ.get("JAX_COMPILATION_CACHE_DIR")):
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache = (os.path.join(repo, ".jax_cache")
                 if os.access(repo, os.W_OK) and "site-packages" not in repo
                 else os.path.join(
                     os.path.expanduser("~"), ".cache", "pafb2p_jax"))
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already initialized; too late to switch
