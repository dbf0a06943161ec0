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
    """True (default) -> CE/Dice build the per-class masks as a single
    iota-compare one-hot INSIDE the reduce fusion (one vectorized
    compare over the class axis) instead of a Python loop of C scalar
    compares. Both formulations are mathematically identical (the
    one-hot is never materialized to HBM — it exists only inside XLA's
    fusion; parity test: tests/test_losses.py::
    test_fused_masks_matches_loop_values_and_grads). The loop variant
    was the round-2 answer to the TPU lane-padding trap; the round-5
    A/B on the REAL flagship step (tools/tpu_probe.py spine_profile,
    v5e) measured fused at wall 1135 ms vs 1195 ms — the
    elementwise/reduce row dropped 148 -> 82 ms/step — so fused is now
    the default. MEDSEG_LOSS_FUSED=0 restores the loop; read at TRACE
    time only.
    """
    return os.environ.get("MEDSEG_LOSS_FUSED", "1") == "1"


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
