# Copyright 2026. Apache License 2.0.
"""Elementwise intensity kernels (HU windowing, normalization, label remap).

TPU-native (jax.numpy) replacements for the reference's NumPy/CuPy switch
(tools/preprocess_utils/values.py:37-87): pure elementwise ops that XLA
fuses into single VPU passes; they run on TPU in the streaming
preprocessing pipeline and on CPU identically.
"""

import jax
import jax.numpy as jnp


@jax.jit
def hu_norm(image, hu_min=-1200.0, hu_max=600.0, hu_nan=-2000.0):
    """CT Hounsfield-unit windowing to [0, 255] (values.py:67-87 parity).

    NaNs are replaced with ``hu_nan``, intensities clipped to
    [hu_min, hu_max], scaled to [0, 1] then multiplied by 255.
    """
    image = jnp.asarray(image, jnp.float32)
    image = jnp.nan_to_num(image, nan=hu_nan)
    image = (image - hu_min) / (hu_max - hu_min)
    image = jnp.clip(image, 0.0, 1.0)
    return (image * 255.0).astype(jnp.float32)


@jax.jit
def min_max_norm(image):
    """Min-max normalize to [0, 1] over the whole volume."""
    image = jnp.asarray(image, jnp.float32)
    lo = jnp.min(image)
    hi = jnp.max(image)
    return jnp.clip((image - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)


@jax.jit
def fixed_norm(image, min_val, max_val):
    """Normalize with fixed bounds, clip to [0, 1] (values.py:54-64)."""
    image = jnp.asarray(image, jnp.float32)
    return jnp.clip((image - min_val) / jnp.maximum(max_val - min_val,
                                                    1e-12), 0.0, 1.0)


def normalize(image, min_val=None, max_val=None):
    """Dispatch between fixed-bounds and min-max normalization."""
    if min_val is None or max_val is None:
        return min_max_norm(image)
    return fixed_norm(image, float(min_val), float(max_val))


def label_remap(label, map_dict):
    """Dict-driven label id rewrite (values.py:37-51).

    Implemented as a dense lookup table + gather so it lowers to one
    take op instead of len(map_dict) wheres.
    """
    label = jnp.asarray(label)
    max_id = int(max(max(map_dict.keys()), int(jnp.max(label)))) \
        if map_dict else int(jnp.max(label))
    lut = jnp.arange(max_id + 1, dtype=label.dtype)
    for src, dst in map_dict.items():
        lut = lut.at[int(src)].set(dst)
    return jnp.take(lut, jnp.clip(label, 0, max_id).astype(jnp.int32))


@jax.jit
def scale_by_max(image):
    """Per-volume divide-by-max used at the end of Compose
    (reference transform.py:67-69): leaves all-nonpositive volumes as-is."""
    image = jnp.asarray(image, jnp.float32)
    mx = jnp.max(image)
    return jnp.where(mx > 0, image / mx, image)
