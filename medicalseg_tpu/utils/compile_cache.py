# Copyright 2026. Apache License 2.0.
"""Persistent XLA compile cache helper.

VNet-sized programs take minutes to compile on the remote TPU compile
helper; every CLI enables the on-disk cache so re-runs (train -> val ->
export -> deploy over the same shapes) reuse executables.
"""

import os


def enable_compile_cache(cache_dir=None):
    import jax

    # Backend override for every CLI: JAX_PLATFORMS is ignored when a
    # TPU plugin force-appends itself to jax_platforms, so honor an
    # explicit MEDSEG_PLATFORM (e.g. "cpu" to run a CLI off-TPU while
    # the chip is busy or unreachable).
    platform = os.environ.get("MEDSEG_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass

    if cache_dir is None:
        cache_dir = os.environ.get(
            "MEDSEG_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".medicalseg_tpu",
                         "jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return cache_dir
