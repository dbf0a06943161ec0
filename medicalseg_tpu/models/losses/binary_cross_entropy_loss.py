# Copyright 2026. Apache License 2.0.
"""BCE-with-logits loss with dynamic pos/neg rebalancing.

Parity target: reference medicalseg/models/losses/
binary_cross_entropy_loss.py:22-174 — ``weight='dynamic'`` computes
per-voxel pos/neg weights from the batch label balance,
``pos_weight='dynamic'`` a scalar positive-class weight, with
ignore_index masking and one-hot expansion of sparse labels. Registered
but unused by the shipped configs (SURVEY §2.3).
"""

import jax
import jax.numpy as jnp

from ...cvlibs import manager


@manager.LOSSES.add_component
class BCELoss:
    """Binary cross-entropy with logits over NDHWC tensors.

    Args:
        weight: None | 'dynamic' | array broadcastable to the loss.
        pos_weight: None | 'dynamic' | float.
        ignore_index: label value excluded from the loss.
        edge_label: flag consumed by loss_computation (edge supervision).
    """

    def __init__(self, weight=None, pos_weight=None, ignore_index=255,
                 edge_label=False):
        self.weight = weight
        self.pos_weight = pos_weight
        self.ignore_index = ignore_index
        self.edge_label = edge_label
        self.EPS = 1e-10

        if isinstance(weight, str) and weight != "dynamic":
            raise ValueError(
                "if type of `weight` is str, it should equal to 'dynamic', "
                "but it is {}".format(weight))
        if isinstance(pos_weight, str) and pos_weight != "dynamic":
            raise ValueError(
                "if type of `pos_weight` is str, it should equal to "
                "'dynamic', but it is {}".format(pos_weight))

    def __call__(self, logits, labels):
        """logits: [N,D,H,W,C]; labels: [N,D,H,W] int (one-hot expanded)
        or [N,D,H,W,C] float in [0,1]."""
        num_classes = logits.shape[-1]
        if labels.ndim == logits.ndim - 1:
            mask = (labels != self.ignore_index)
            labels_f = jax.nn.one_hot(
                jnp.clip(labels, 0, num_classes - 1), num_classes,
                dtype=jnp.float32)
            mask = jnp.broadcast_to(mask[..., None], labels_f.shape)
        else:
            mask = (labels != self.ignore_index)
            labels_f = labels.astype(jnp.float32)
        mask = mask.astype(jnp.float32)

        if isinstance(self.weight, str):  # 'dynamic'
            pos_num = jnp.sum((labels_f == 1).astype(jnp.float32))
            neg_num = jnp.sum((labels_f == 0).astype(jnp.float32))
            sum_num = pos_num + neg_num
            weight_pos = 2 * neg_num / (sum_num + self.EPS)
            weight_neg = 2 * pos_num / (sum_num + self.EPS)
            weight = weight_pos * labels_f + weight_neg * (1 - labels_f)
        elif self.weight is not None:
            weight = jnp.asarray(self.weight, jnp.float32)
        else:
            weight = None

        if isinstance(self.pos_weight, str):  # 'dynamic'
            pos_num = jnp.sum((labels_f == 1).astype(jnp.float32))
            neg_num = jnp.sum((labels_f == 0).astype(jnp.float32))
            sum_num = pos_num + neg_num
            pos_weight = 2 * neg_num / (sum_num + self.EPS)
        elif self.pos_weight is not None:
            pos_weight = jnp.float32(self.pos_weight)
        else:
            pos_weight = None

        # numerically-stable BCE with logits:
        # max(x,0) - x*t + log(1+exp(-|x|)), with optional pos_weight on
        # the positive term (paddle binary_cross_entropy_with_logits).
        x, t = logits.astype(jnp.float32), jax.lax.stop_gradient(labels_f)
        log_sig = jax.nn.log_sigmoid(x)
        log_one_minus = jax.nn.log_sigmoid(-x)
        if pos_weight is not None:
            loss = -(pos_weight * t * log_sig + (1 - t) * log_one_minus)
        else:
            loss = -(t * log_sig + (1 - t) * log_one_minus)
        if weight is not None:
            loss = loss * weight
        loss = loss * mask
        return jnp.mean(loss) / (jnp.mean(mask) + self.EPS)
