# Copyright 2026. Apache License 2.0.
"""Whole-volume inference with reverse transforms.

Parity target: reference medicalseg/core/infer.py:20-97 — scan the
transform list for Resize3D records, run the model, resize the logits
back to the original (d, h, w) and argmax. The resize is the framework's
separable MXU kernel (ops.resize3d) instead of F.interpolate.

Beyond-reference: :func:`sliding_window_inference` (the reference leaves
aug/sliding inference as a todo, infer.py:97) lives in
:mod:`medicalseg_tpu.core.sliding_window`.
"""

import collections.abc
import functools

import jax
import jax.numpy as jnp

from ..ops import resize3d


def get_reverse_list(ori_shape, transforms):
    """List of ('resize', (d, h, w)) records (reference infer.py:20-40)."""
    reverse_list = []
    d, h, w = ori_shape[0], ori_shape[1], ori_shape[2]
    for op in transforms:
        if op.__class__.__name__ in ["Resize3D"]:
            reverse_list.append(("resize", (d, h, w)))
            size = op.size if isinstance(op.size, tuple) else (op.size,) * 3
            d, h, w = size[0], size[1], size[2]
    return reverse_list


def reverse_transform(logit, ori_shape, transforms, order=1):
    """Recover logits to the origin shape (reference infer.py:43-59).

    logit: [N, D, H, W, C]. Applies the recorded resizes in reverse.
    """
    reverse_list = get_reverse_list(ori_shape, transforms)
    for item in reverse_list[::-1]:
        if item[0] == "resize":
            size = tuple(int(v) for v in item[1])
            logit = jax.vmap(
                functools.partial(resize3d, size=size, order=order))(logit)
        else:
            raise Exception(
                "Unexpected info '{}' in im_info".format(item[0]))
    return logit


def inference(apply_fn, variables, im, ori_shape=None, transforms=None):
    """Run the model and reverse-resize to the original shape.

    Args:
        apply_fn: model.apply.
        variables: {'params', 'batch_stats'}.
        im: [N, D, H, W, C] input batch.
        ori_shape: original (d, h, w) or None.
        transforms: transform list used at load time.

    Returns:
        (pred [N, D, H, W] int32, logit [N, D, H, W, C]) — the reference
        returns (pred, logit) in NCDHW (infer.py:92-94); ours are NDHWC.
    """
    logits = apply_fn(variables, im, train=False)
    if not isinstance(logits, collections.abc.Sequence):
        raise TypeError(
            "The type of logits must be one of collections.abc.Sequence, "
            "e.g. list, tuple. But received {}".format(type(logits)))
    logit = logits[0]

    if ori_shape is not None and tuple(ori_shape) != logit.shape[1:4]:
        logit = reverse_transform(logit, ori_shape, transforms or [],
                                  order=1)
    pred = jnp.argmax(logit, axis=-1).astype(jnp.int32)
    return pred, logit
