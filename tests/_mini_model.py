"""A tiny VNet-contract model for loop-machinery tests.

Compiling the full VNet on the 1-core CPU test box costs minutes per
variant; tests that exercise the *runtime* (loader, train loop,
checkpointing, sharding) use this 2-stage encoder-decoder instead. It
honors the model contract: NDHWC input, ``train`` flag, BatchNorm
batch_stats collection, dropout rng, returns ``[logits]``.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class MiniSegNet(nn.Module):
    num_classes: int = 3
    in_channels: int = 1
    features: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        h = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                    dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32)(h)
        h = nn.relu(h.astype(self.dtype))
        d = nn.Conv(self.features * 2, (2, 2, 2), strides=(2, 2, 2),
                    padding="VALID", dtype=self.dtype)(h)
        d = nn.Dropout(0.1, broadcast_dims=(1, 2, 3),
                       deterministic=not train)(d)
        u = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2),
                             padding="VALID", dtype=self.dtype)(d)
        u = jnp.concatenate([u, h], axis=-1)
        out = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype)(u)
        return [out.astype(jnp.float32)]
