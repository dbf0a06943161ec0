# Copyright 2026. Apache License 2.0.
"""Persistent XLA compile cache helper.

VNet-sized programs take minutes to compile on the remote TPU compile
helper; every CLI enables the on-disk cache so re-runs (train -> val ->
export -> deploy over the same shapes) reuse executables.
"""

import os


def enable_compile_cache(cache_dir=None):
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "MEDSEG_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".medicalseg_tpu",
                         "jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return cache_dir
