# Copyright 2026. Apache License 2.0.
"""V-Net with deep supervision.

TPU-native counterpart of the reference VNetDeepSup
(medicalseg/models/vnet_deepsup.py:178-281): the VNet trunk plus three
auxiliary 3^3-conv heads on the decoder stages, each trilinearly
upsampled (half-pixel convention, matching paddle F.interpolate
align_corners=False) to the input size. Returns ``[out, d1, d2, d3]``
matched by a 4-way loss ``coef`` in the config
(configs/mri_spine_seg/vnetdeepsup_mri_spine_seg_512_512_12_15k.yml).
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..cvlibs import manager
from .layers import ConvBNAct
from .vnet import (DownTransition, InputTransition, OutputTransition,
                   UpTransition)


def _upsample_trilinear(x, size_dhw):
    """Half-pixel trilinear upsample of an NDHWC batch (paddle
    F.interpolate(mode='trilinear') parity)."""
    n, _, _, _, c = x.shape
    out_shape = (n,) + tuple(size_dhw) + (c,)
    return jax.image.resize(x, out_shape, method="trilinear")


@manager.MODELS.add_component
class VNetDeepSup(nn.Module):
    """Deep-supervision V-Net (reference vnet_deepsup.py:178-281)."""
    elu: bool = False
    in_channels: int = 1
    num_classes: int = 4
    pretrained: Any = None
    kernel_size: Sequence[Tuple[int, int, int]] = (
        (2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2))
    stride_size: Sequence[Tuple[int, int, int]] = (
        (2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2))
    dtype: Any = jnp.float32
    head_conv: str = "default"  # 'pallas' also switches the stem
    mid_conv: str = "default"

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        size = x.shape[1:4]
        ks, ss = self.kernel_size, self.stride_size
        mc = self.mid_conv
        stem = "pallas" if self.head_conv == "pallas" else "default"

        def head(features, h):
            return nn.Conv(self.num_classes, (3, 3, 3), padding="SAME",
                           dtype=self.dtype,
                           kernel_init=nn.initializers.he_normal())(h)

        out16 = InputTransition(self.in_channels, self.elu,
                                self.dtype, 16, stem)(x, train)
        out32 = DownTransition(16, 1, self.elu, False, ss[0], ks[0],
                               self.dtype, mc)(out16, train)
        out64 = DownTransition(32, 2, self.elu, False, ss[1], ks[1],
                               self.dtype, mc)(out32, train)
        out128 = DownTransition(64, 3, self.elu, True, ss[2], ks[2],
                                self.dtype, mc)(out64, train)
        out256 = DownTransition(128, 2, self.elu, True, ss[3], ks[3],
                                self.dtype, mc)(out128, train)

        out = UpTransition(256, 256, 2, self.elu, True, True, ss[3], ks[3],
                           self.dtype, mc)(out256, out128, train)
        d1 = _upsample_trilinear(head(256, out).astype(jnp.float32), size)
        out = UpTransition(256, 128, 2, self.elu, True, True, ss[2], ks[2],
                           self.dtype, mc)(out, out64, train)
        d2 = _upsample_trilinear(head(128, out).astype(jnp.float32), size)
        out = UpTransition(128, 64, 1, self.elu, False, False, ss[1], ks[1],
                           self.dtype, mc)(out, out32, train)
        d3 = _upsample_trilinear(head(64, out).astype(jnp.float32), size)
        out = UpTransition(64, 32, 1, self.elu, False, False, ss[0], ks[0],
                           self.dtype, mc)(out, out16, train)
        out = OutputTransition(self.num_classes, self.elu,
                               self.dtype, self.head_conv)(out, train)
        return [out.astype(jnp.float32), d1, d2, d3]

    def test(self):
        """Self-test (reference vnet_deepsup.py:283-296)."""
        import numpy as np

        import jax
        np.random.seed(1)
        a = np.random.rand(1, 32, 32, 32, self.in_channels).astype(
            np.float32)
        variables = jax.jit(
            lambda k, x: self.init(k, x, train=False))(
            jax.random.PRNGKey(0), a)
        outs = jax.jit(lambda v, x: self.apply(v, x, train=False))(
            variables, a)
        assert len(outs) == 4
        assert outs[0].shape == (1, 32, 32, 32, self.num_classes)
        print("VnetDeepSup test is complete")
