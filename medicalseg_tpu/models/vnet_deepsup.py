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
                   UpTransition, boundary_layouts)


def _upsample_trilinear(x, size_dhw):
    """Half-pixel trilinear upsample of an NDHWC batch (paddle
    F.interpolate(mode='trilinear') parity — reference
    vnet_deepsup.py:266-277), as three per-axis MXU matmuls
    (ops.resize.upsample_trilinear_batch; parity-tested against
    jax.image.resize in tests/test_resize.py)."""
    from ..ops.resize import upsample_trilinear_batch
    return upsample_trilinear_batch(x, tuple(size_dhw))


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
    updown_conv: str = "s2d"  # see vnet.VNet.updown_conv
    remat: bool = False  # per-block rematerialization (HBM <-> FLOPs)
    layout_policy: str = "auto"  # 'auto' | 'all_kl' — see vnet.VNet
    head_1x1: str = "kl"  # see vnet.OutputTransition.head_1x1

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        size = x.shape[1:4]
        ks, ss = self.kernel_size, self.stride_size
        mc = self.mid_conv
        stem = "pallas" if self.head_conv == "pallas" else "default"

        if self.remat:
            # checkpoint each transition (see vnet.py): the backward
            # recomputes one block at a time, bounding live activations
            # by the largest stage — required to fit large anisotropic
            # volumes (512x512x12 batch>=2) in v5e HBM.
            Input = nn.remat(InputTransition, static_argnums=(2,))
            Down = nn.remat(DownTransition, static_argnums=(2,))
            Up = nn.remat(UpTransition, static_argnums=(3,))
            Output = nn.remat(OutputTransition, static_argnums=(2,))
        else:
            Input, Down, Up, Output = (InputTransition, DownTransition,
                                       UpTransition, OutputTransition)

        from ..ops import pallas_conv5 as pc
        klb = boundary_layouts(x.shape, ks, ss,
                               stem == "pallas" and mc == "pallas",
                               all_kl=(self.layout_policy == "all_kl" and
                                       self.updown_conv == "s2d"))
        kl_ud = self.layout_policy == "all_kl"

        def head(h, kl, name):
            # aux 3^3 conv head; runs in the compute dtype — the
            # upsampled full-resolution aux logits in f32 cost ~1 GB
            # each at the spine geometry (bf16 halves it), and the
            # loss upcasts per-class sums to f32 anyway.
            if kl:
                h = pc.from_kl(h)
            return nn.Conv(self.num_classes, (3, 3, 3), padding="SAME",
                           dtype=self.dtype,
                           kernel_init=nn.initializers.he_normal(),
                           name=name)(h)

        # explicit names keep the parameter tree identical with or
        # without the lifted remat wrapper (checkpoint compatibility)
        out16 = Input(self.in_channels, self.elu, self.dtype, 16, stem,
                      out_kl=klb[0],
                      name="InputTransition_0")(x, train)
        out32 = Down(16, 1, self.elu, False, ss[0], ks[0],
                     self.dtype, mc, in_kl=klb[0], out_kl=klb[1],
                     updown_impl=self.updown_conv, kl_updown=kl_ud,
                     name="DownTransition_0")(out16, train)
        out64 = Down(32, 2, self.elu, False, ss[1], ks[1],
                     self.dtype, mc, in_kl=klb[1], out_kl=klb[2],
                     updown_impl=self.updown_conv, kl_updown=kl_ud,
                     name="DownTransition_1")(out32, train)
        out128 = Down(64, 3, self.elu, True, ss[2], ks[2],
                      self.dtype, mc, in_kl=klb[2], out_kl=klb[3],
                      updown_impl=self.updown_conv, kl_updown=kl_ud,
                     name="DownTransition_2")(out64, train)
        out256 = Down(128, 2, self.elu, True, ss[3], ks[3],
                      self.dtype, mc, in_kl=klb[3], out_kl=klb[4],
                      updown_impl=self.updown_conv, kl_updown=kl_ud,
                     name="DownTransition_3")(out128, train)

        out = Up(256, 256, 2, self.elu, True, True, ss[3], ks[3],
                 self.dtype, mc, in_kl=klb[4], skip_kl=klb[3],
                 out_kl=klb[3],
                 updown_impl=self.updown_conv, kl_updown=kl_ud,
                 name="UpTransition_0")(out256, out128, train)
        d1 = _upsample_trilinear(head(out, klb[3], "Conv_0"), size)
        out = Up(256, 128, 2, self.elu, True, True, ss[2], ks[2],
                 self.dtype, mc, in_kl=klb[3], skip_kl=klb[2],
                 out_kl=klb[2],
                 updown_impl=self.updown_conv, kl_updown=kl_ud,
                 name="UpTransition_1")(out, out64, train)
        d2 = _upsample_trilinear(head(out, klb[2], "Conv_1"), size)
        out = Up(128, 64, 1, self.elu, False, False, ss[1], ks[1],
                 self.dtype, mc, in_kl=klb[2], skip_kl=klb[1],
                 out_kl=klb[1],
                 updown_impl=self.updown_conv, kl_updown=kl_ud,
                 name="UpTransition_2")(out, out32, train)
        d3 = _upsample_trilinear(head(out, klb[1], "Conv_2"), size)
        out = Up(64, 32, 1, self.elu, False, False, ss[0], ks[0],
                 self.dtype, mc, in_kl=klb[1], skip_kl=klb[0],
                 out_kl=klb[0],
                 updown_impl=self.updown_conv, kl_updown=kl_ud,
                 name="UpTransition_3")(out, out16, train)
        out = Output(self.num_classes, self.elu, self.dtype,
                     self.head_conv, in_kl=klb[0],
                     head_1x1=self.head_1x1,
                     name="OutputTransition_0")(out, train)
        return [out.astype(jnp.float32), d1.astype(jnp.float32),
                d2.astype(jnp.float32), d3.astype(jnp.float32)]

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
