# Copyright 2026. Apache License 2.0.
"""Train state + the single jitted train/eval step.

The reference's per-step Python loop (forward / loss / backward /
optimizer.step / lr.step, core/train.py:120-151) collapses into ONE
compiled function: ``train_step(state, images, labels, key)`` built once
and reused for the whole run. On-device augmentation (when enabled) is
fused into the same executable, so a training iteration is a single
device program: aug -> fwd -> bwd -> optimizer -> BN-stat update.

Under a batch-sharded jit over the mesh (parallel/mesh.py), the global
mean in the loss makes gradient psums implicit, and BatchNorm batch
statistics are global (SyncBatchNorm parity, reference config.py:322).
"""

from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..utils.loss_utils import loss_computation


class TrainState(struct.PyTreeNode):
    """Carries params, BN stats, optimizer state and the step counter."""
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    @classmethod
    def create(cls, model, tx, sample_input, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # jit the init: eager initialization compiles every op separately
        # (one executable per conv), which is pathologically slow on CPU
        # and wasteful on TPU; one compiled program initializes in seconds.
        init = jax.jit(lambda k, x: model.init(k, x, train=False))
        variables = init(rng, sample_input)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            apply_fn=model.apply,
            tx=tx)


def make_train_step(losses: dict, augment_fn: Optional[Callable] = None,
                    checkpoint_policy: Optional[str] = None):
    """Build the jitted train step.

    Args:
        losses: {'types': [...], 'coef': [...]} loss config (static).
        augment_fn: optional (images, labels, key) -> (images NDHWC,
            labels) device augmentation fused into the step.
        checkpoint_policy: 'full' to rematerialize the forward pass
            (jax.checkpoint) trading FLOPs for HBM on large volumes.

    Returns step(state, images, labels, key) -> (state, metrics) where
    metrics = {'loss', 'loss_list', 'per_channel_dice'} (device arrays;
    fetch at log points only).
    """

    def step(state, images, labels, key):
        # widen wire dtypes on device: loaders may ship bf16 images /
        # uint8 labels (4-8x fewer bytes through a slow host link);
        # training math is f32/int32 regardless.
        images = images.astype(jnp.float32)
        labels = labels.astype(jnp.int32)
        aug_key, drop_key = jax.random.split(
            jax.random.fold_in(key, state.step))
        if augment_fn is not None:
            images, labels = augment_fn(images, labels, aug_key)

        def loss_fn(params):
            def fwd(variables, x, dropout_key):
                return state.apply_fn(
                    variables, x, train=True,
                    rngs={"dropout": dropout_key},
                    mutable=["batch_stats"])
            if checkpoint_policy == "full":
                # rematerialize the forward pass: trade FLOPs for HBM on
                # large volumes (SURVEY §7 / task brief: jax.checkpoint)
                fwd = jax.checkpoint(fwd)
            logits_list, new_model_state = fwd(
                {"params": params, "batch_stats": state.batch_stats},
                images, drop_key)
            loss_list, per_channel_dice = loss_computation(
                logits_list, labels, losses)
            total = sum(loss_list)
            return total, (loss_list, per_channel_dice, new_model_state)

        (total, (loss_list, pcd, new_model_state)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_model_state["batch_stats"])
        metrics = {
            "loss": total,
            "loss_list": jnp.stack([jnp.asarray(l) for l in loss_list]),
            "per_channel_dice": pcd if pcd is not None
            else jnp.zeros((1,)),
        }
        return new_state, metrics

    return step


def make_multi_step(losses: dict, n_steps: int,
                    augment_fn: Optional[Callable] = None,
                    checkpoint_policy: Optional[str] = None):
    """A train step that advances ``n_steps`` iterations per dispatch.

    ``lax.scan`` over a [n_steps, N, ...] super-batch: one host->device
    round trip per n_steps, amortizing dispatch/tunnel latency (useful
    when the host is far from the chips). Returns stacked per-step
    metrics.
    """
    step = make_train_step(losses, augment_fn=augment_fn,
                           checkpoint_policy=checkpoint_policy)

    def multi(state, images, labels, key):
        def body(carry, xs):
            st = carry
            im, lab = xs
            st, metrics = step(st, im, lab, key)
            return st, metrics

        state, metrics = jax.lax.scan(body, state, (images, labels))
        return state, metrics

    return multi


def make_cached_train_step(losses: dict, n_steps: int = 1,
                           augment_fn: Optional[Callable] = None,
                           checkpoint_policy: Optional[str] = None,
                           batch_sharding=None):
    """Train step over a DEVICE-RESIDENT dataset cache.

    Small medical datasets (the reference repeats the train list x10
    because epochs are short, dataset.py:110-111) fit whole in HBM:
    20 lung CT volumes at 128^3 bf16 are ~126 MB. Shipping the cache
    once and indexing it on device removes the per-step host->device
    batch transfer entirely — each dispatch carries only a [B] (or
    [n_steps, B]) int32 index vector.

    Returns step(state, cache_images, cache_labels, idx, key). The
    cache arrays are arguments (not closure constants) so they live in
    HBM once and are passed by reference every call. With ``n_steps >
    1`` the step scans over idx rows — multi-step dispatch with a
    ~100-byte upload per n optimizer updates.
    """
    base = make_train_step(losses, augment_fn=augment_fn,
                           checkpoint_policy=checkpoint_policy)

    def gather_step(state, cache_images, cache_labels, idx, key):
        images = jnp.take(cache_images, idx, axis=0)
        labels = jnp.take(cache_labels, idx, axis=0)
        if batch_sharding is not None:
            images = jax.lax.with_sharding_constraint(images,
                                                      batch_sharding)
            labels = jax.lax.with_sharding_constraint(labels,
                                                      batch_sharding)
        return base(state, images, labels, key)

    if n_steps <= 1:
        return gather_step

    def multi(state, cache_images, cache_labels, idx, key):
        def body(st, ix):
            return gather_step(st, cache_images, cache_labels, ix, key)

        return jax.lax.scan(body, state, idx)

    return multi


def make_eval_step(losses: dict):
    """Jitted eval forward: returns (logits_list, loss_list, pcd)."""

    def step(state, images, labels):
        images = images.astype(jnp.float32)
        labels = labels.astype(jnp.int32)
        logits_list = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        loss_list, per_channel_dice = loss_computation(
            logits_list, labels,
            {"types": [losses["types"][0]], "coef": [losses["coef"][0]]})
        return logits_list, loss_list, per_channel_dice

    return step
