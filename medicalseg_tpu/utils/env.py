# Copyright 2026. Apache License 2.0.
"""Framework home dirs + system environment collection.

Replaces the reference's seg_env (~/.paddleseg dirs, medicalseg/utils/env_util/
seg_env.py:28-56) and sys_env CUDA probing (sys_env.py:26-121) with TPU/JAX
equivalents rooted at ``~/.medicalseg_tpu``.
"""

import glob
import os
import platform
import subprocess
import sys


def _get_user_home():
    return os.path.expanduser("~")


def _get_seg_home():
    if "SEG_HOME" in os.environ:
        home_path = os.environ["SEG_HOME"]
        if os.path.exists(home_path):
            if os.path.isdir(home_path):
                return home_path
    return os.path.join(_get_user_home(), ".medicalseg_tpu")


def _get_sub_home(directory):
    home = os.path.join(_get_seg_home(), directory)
    os.makedirs(home, exist_ok=True)
    return home


USER_HOME = _get_user_home()
SEG_HOME = _get_seg_home()
DATA_HOME = _get_sub_home("dataset")
TMP_HOME = _get_sub_home("tmp")
PRETRAINED_MODEL_HOME = _get_sub_home("pretrained_model")


def get_sys_env():
    """Collect platform/accelerator/library info (reference sys_env.py:26-121,
    re-targeted from CUDA/cuDNN probing to the JAX/TPU stack)."""
    env_info = {}
    env_info["platform"] = platform.platform()
    env_info["Python"] = sys.version.replace("\n", "")

    try:
        import jax
        env_info["jax"] = jax.__version__
        try:
            devices = jax.devices()
            env_info["device_count"] = len(devices)
            env_info["devices"] = ", ".join(str(d) for d in devices)
            env_info["TPUs used"] = any(d.platform == "tpu" for d in devices)
            env_info["backend"] = devices[0].platform if devices else "none"
        except Exception as e:  # device probe can fail on misconfigured hosts
            env_info["devices"] = "unavailable ({})".format(e)
            env_info["TPUs used"] = False
            env_info["backend"] = "cpu"
    except ImportError:
        env_info["jax"] = "not installed"
        env_info["TPUs used"] = False
        env_info["backend"] = "none"

    try:
        import flax
        env_info["flax"] = flax.__version__
    except ImportError:
        pass
    try:
        import optax
        env_info["optax"] = optax.__version__
    except ImportError:
        pass
    import numpy as np
    env_info["numpy"] = np.__version__

    try:
        gcc = subprocess.check_output(["gcc", "--version"],
                                      stderr=subprocess.DEVNULL)
        gcc = gcc.decode().split("\n")[0]
        env_info["GCC"] = gcc
    except Exception:
        pass

    return env_info
