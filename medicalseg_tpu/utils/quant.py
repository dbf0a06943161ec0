# Copyright 2026. Apache License 2.0.
"""Weight-only int8 quantization for deployment serving.

Parity target: the reference Predictor's TensorRT precision ladder
(fp32 / fp16 / int8, reference deploy/python/infer.py:286-321). The
TPU-native analog of TRT int8 is weight-only quantization: conv kernels
are stored as int8 with per-output-channel float32 scales (symmetric
absmax), shipped to the device in that form (4x fewer weight bytes than
f32), and dequantized to the compute dtype inside the jitted forward —
XLA fuses the dequant into the first use, so the weights live in HBM as
int8 for the whole serving session.

Only "heavy" tensors are quantized (ndim >= 2 and size >= min_size):
conv/deconv kernels. Biases, PReLU alphas, and BatchNorm scale/shift/
running stats are 1-D, tiny, and precision-critical — they stay f32.

The quantized tree keeps the original nesting; each quantized leaf
becomes a ``{"__quant__": int8[..., Co], "scale": f32[Co]}`` subdict,
so flax serialization round-trips it unchanged.
"""

import numpy as np

QUANT_KEY = "__quant__"


def _is_quant_leaf(node):
    return isinstance(node, dict) and QUANT_KEY in node


def quantize_array(w):
    """Symmetric absmax int8 quantization per output channel (last
    axis). Returns ``{"__quant__": int8, "scale": f32}``."""
    import jax.numpy as jnp

    w = np.asarray(w, np.float32)
    red = tuple(range(w.ndim - 1))  # all axes but Co
    absmax = np.maximum(np.abs(w).max(axis=red), 1e-12)
    scale = (absmax / 127.0).astype(np.float32)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return {QUANT_KEY: jnp.asarray(q), "scale": jnp.asarray(scale)}


def dequantize_array(node, dtype=None):
    q, scale = node[QUANT_KEY], node["scale"]
    w = q.astype(scale.dtype) * scale
    return w.astype(dtype) if dtype is not None else w


def quantize_tree(tree, min_size=1024):
    """Recursively quantize every float leaf with ndim >= 2 and
    ``size >= min_size`` in a nested-dict pytree (flax variables)."""
    if isinstance(tree, dict):
        return {k: quantize_tree(v, min_size) for k, v in tree.items()}
    arr = np.asarray(tree)
    if (arr.ndim >= 2 and arr.size >= min_size
            and np.issubdtype(arr.dtype, np.floating)):
        return quantize_array(arr)
    return tree


def dequantize_tree(tree, dtype=None):
    """Inverse of :func:`quantize_tree`; runs under jit (the dequant
    multiplies fuse into each weight's first use)."""
    if _is_quant_leaf(tree):
        return dequantize_array(tree, dtype)
    if isinstance(tree, dict):
        return {k: dequantize_tree(v, dtype) for k, v in tree.items()}
    return tree
