# Copyright 2026. Apache License 2.0.
"""Cross-entropy loss with dynamic class weights.

Parity target: reference medicalseg/models/losses/cross_entropy_loss.py:
23-87 — when ``weight`` is None, per-step inverse-frequency weights are
derived from the softmax statistics (loss_utils.class_weights); the loss
is the weight-normalized mean of per-voxel NLL with ignore_index masking
(paddle F.cross_entropy(weight=..., ignore_index=...) semantics).
"""

import jax
import jax.numpy as jnp

from ...cvlibs import manager
from .loss_utils import class_weights, fused_masks


@manager.LOSSES.add_component
class CrossEntropyLoss:
    """CE over NDHWC logits and integer NDHW labels.

    Args:
        weight: per-class weights (list/array) or None for dynamic
            inverse-frequency weights recomputed every step.
        ignore_index: voxels with this label don't contribute.
    """

    def __init__(self, weight=None, ignore_index=255, data_format="NDHWC"):
        self.ignore_index = ignore_index
        self.EPS = 1e-8
        self.weight = None if weight is None else jnp.asarray(
            weight, jnp.float32)

    def __call__(self, logits, labels):
        labels = labels.astype(jnp.int32)
        if logits.ndim == 4:
            logits = logits[None]
        num_classes = logits.shape[-1]

        weight = self.weight
        if weight is None:
            # dynamic inverse-frequency weights (reference :68-69)
            weight = class_weights(logits)
        if weight.shape[0] != num_classes:
            raise ValueError(
                "The number of weights = {} must be the same as the number "
                "of classes = {}.".format(weight.shape[0], num_classes))

        log_probs = jax.nn.log_softmax(logits, axis=-1)
        # per-class masked sums instead of take_along_axis/take: TPU
        # gathers over 128^3 voxel grids ran ~112 ms/step (profiled);
        # the static class loop fuses into one elementwise pass and has
        # a clean elementwise backward. Ignored labels match no class,
        # so both nll and w stay zero there.
        valid = (labels != self.ignore_index).astype(jnp.float32)
        if fused_masks():
            # identical math, one vectorized compare over the class
            # axis (the one-hot lives only inside the fusion; labels ==
            # ignore_index match no class so nll/w stay 0 there)
            iota = jnp.arange(num_classes, dtype=labels.dtype)
            oh = (labels[..., None] == iota).astype(jnp.float32)
            nll = -jnp.sum(log_probs.astype(jnp.float32) * oh, axis=-1)
            w = jnp.sum(weight.astype(jnp.float32) * oh, axis=-1)
        else:
            nll = jnp.zeros(labels.shape, jnp.float32)
            w = jnp.zeros(labels.shape, jnp.float32)
            for c in range(num_classes):
                m = (labels == c).astype(jnp.float32)
                nll = nll - log_probs[..., c].astype(jnp.float32) * m
                w = w + weight[c].astype(jnp.float32) * m
        w = w * valid
        # paddle weighted-mean semantics: sum(w * nll) / sum(w)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), self.EPS)
