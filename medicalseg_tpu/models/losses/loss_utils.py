# Copyright 2026. Apache License 2.0.
"""Loss helpers (reference: medicalseg/models/losses/loss_utils.py:18-40).

The framework is channels-last (NDHWC), so "flatten channel-first" is a
single reshape+transpose; all math matches the reference's NCDHW
formulation numerically.
"""

import os

import jax
import jax.numpy as jnp


def fused_masks():
    """True -> CE/Dice build the per-class masks as a single
    iota-compare one-hot INSIDE the reduce fusion (one vectorized
    compare over the class axis) instead of a Python loop of C scalar
    compares. Both formulations are mathematically identical (the
    one-hot is never materialized to HBM — it exists only inside XLA's
    fusion); the loop variant was the round-2 answer to the TPU
    lane-padding trap, the fused variant A/Bs against it at the 20-class
    spine head shape (tools/tpu_probe.py loss). Env-switchable so the
    probe can flip it without an edit; read at TRACE time only.
    """
    return os.environ.get("MEDSEG_LOSS_FUSED", "0") == "1"


def flatten(tensor):
    """(N, ..., C) -> (C, N*...) channel-major flatten
    (reference loss_utils.py:18-28 transposes NCDHW -> C, N*D*H*W)."""
    c = tensor.shape[-1]
    return tensor.reshape(-1, c).T


def class_weights(logits):
    """Inverse-frequency class weights from softmax statistics with
    stop_gradient (reference loss_utils.py:31-40). logits: (N,...,C).

    Computed as per-class sums over the trailing axis (no channel-major
    transpose — TPU-layout friendly): nominator = V - sum(p_c),
    denominator = sum(p_c).
    """
    probs = jax.nn.softmax(logits, axis=-1)
    total = jnp.float32(probs.size // probs.shape[-1])
    sums = jnp.sum(probs.astype(jnp.float32),
                   axis=tuple(range(probs.ndim - 1)))
    return jax.lax.stop_gradient((total - sums) / sums)
