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


def make_eval_step(losses: dict):
    """Jitted eval forward: returns (logits_list, loss_list, pcd)."""

    def step(state, images, labels):
        logits_list = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        loss_list, per_channel_dice = loss_computation(
            logits_list, labels,
            {"types": [losses["types"][0]], "coef": [losses["coef"][0]]})
        return logits_list, loss_list, per_channel_dice

    return step
