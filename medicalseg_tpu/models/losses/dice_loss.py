# Copyright 2026. Apache License 2.0.
"""V-Net squared-denominator Dice loss.

Parity target: reference medicalseg/models/losses/dice_loss.py:23-102 —
sigmoid (default) or softmax normalization, one-hot labels, per-channel
dice ``2*(p.t) / (p^2 + t^2)`` flattened over C x (N*D*H*W), returning
``(1 - mean_dice, per_channel_dice)``. The per-channel dice doubles as
the train/eval mDice metric (SURVEY §2.3). All-jnp so it runs inside the
jitted train step; the caller materializes per_channel_dice on host only
at log points.
"""

import jax
import jax.numpy as jnp

from ...cvlibs import manager
from .loss_utils import flatten, fused_masks


@manager.LOSSES.add_component
class DiceLoss:
    """Dice loss over NDHWC logits and integer NDHW labels.

    Args:
        sigmoid_norm: True -> sigmoid normalization (reference default);
            False -> softmax over the class axis.
        weight: optional per-class weights multiplied into the intersects.
    """

    def __init__(self, sigmoid_norm=True, weight=None, ignore_index=255):
        self.weight = None if weight is None else jnp.asarray(
            weight, jnp.float32)
        self.eps = 1e-5
        self.sigmoid_norm = bool(sigmoid_norm)
        # Voxels labelled ignore_index are masked out of all three dice
        # sums (intersect, sum(p^2), label count). NOTE: the reference
        # accepts ignore_index but never masks (reference dice_loss.py:
        # 86-102 — ignored voxels still contribute to sum(p^2)); we
        # implement the masking the parameter promises.
        self.ignore_index = ignore_index

    def compute_per_channel_dice(self, probs, target, epsilon=1e-6,
                                 weight=None):
        """probs/target: (N, D, H, W, C) float. Returns per-channel dice [C].

        Kept for API parity with the reference (dice_loss.py:45-74); the
        main path uses the one-hot-free reduction in __call__ which is
        mathematically identical.
        """
        if probs.shape != target.shape:
            raise ValueError(
                "'input' and 'target' must have the same shape but input "
                "is {} and target is {}".format(probs.shape, target.shape))
        probs = flatten(probs)  # (C, N*D*H*W)
        target = flatten(target).astype(jnp.float32)
        intersect = jnp.sum(probs * target, axis=-1)
        if weight is not None:
            intersect = weight * intersect
        denominator = jnp.sum(probs * probs, axis=-1) + \
            jnp.sum(target * target, axis=-1)
        return 2 * (intersect / jnp.clip(denominator, min=epsilon))

    def __call__(self, logits, labels):
        """logits: [N, D, H, W, C] float; labels: [N, D, H, W] int.

        Returns (loss, per_channel_dice[C]) — the tuple contract consumed
        by MixedLoss / loss_computation (reference dice_loss.py:95-102).

        TPU note: the reference materializes a one-hot (N,C,spatial)
        tensor; on TPU a trailing C=3..20 axis lane-pads to 128 (up to
        ~40x HBM blow-up at 128^3). The sums below are the same numbers
        computed with per-class boolean masks — no one-hot, no transpose:
          intersect_c = sum(p_c * [label==c])
          denom_c     = sum(p_c^2) + count(label==c)  (one-hot t => t^2=t)
        """
        if not jnp.issubdtype(labels.dtype, jnp.integer):
            raise TypeError(
                "The label should be int but got {}".format(labels.dtype))
        if logits.ndim == 4:
            logits = logits[None]
        num_classes = logits.shape[-1]
        if self.sigmoid_norm:
            probs = jax.nn.sigmoid(logits)
        else:
            probs = jax.nn.softmax(logits, axis=-1)

        labels = labels.astype(jnp.int32)
        valid = (labels != self.ignore_index).astype(jnp.float32)
        if fused_masks():
            # identical math with the per-class masks as one
            # iota-compare inside the reduce fusion (see
            # loss_utils.fused_masks)
            iota = jnp.arange(num_classes, dtype=labels.dtype)
            ohv = (labels[..., None] == iota).astype(
                jnp.float32) * valid[..., None]
            pv = probs.astype(jnp.float32) * valid[..., None]
            axes = tuple(range(labels.ndim))
            intersect = jnp.sum(pv * ohv, axis=axes)
            denominator = jnp.sum(pv * pv, axis=axes) + jnp.sum(
                ohv, axis=axes)
        else:
            intersects = []
            denoms = []
            for c in range(num_classes):
                p_c = probs[..., c].astype(jnp.float32) * valid
                mask_c = (labels == c).astype(jnp.float32) * valid
                intersects.append(jnp.sum(p_c * mask_c))
                denoms.append(jnp.sum(p_c * p_c) + jnp.sum(mask_c))
            intersect = jnp.stack(intersects)
            denominator = jnp.stack(denoms)
        if self.weight is not None:
            intersect = self.weight * intersect
        per_channel_dice = 2 * (intersect /
                                jnp.clip(denominator, min=1e-6))
        loss = 1.0 - jnp.mean(per_channel_dice)
        return loss, per_channel_dice
