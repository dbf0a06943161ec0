# Copyright 2026. Apache License 2.0.
"""V-Net: 3-D encoder-decoder for volumetric segmentation.

TPU-native re-design of the reference VNet (medicalseg/models/vnet.py:
178-267, itself after https://arxiv.org/abs/1606.04797): same topology —
InputTransition (in->16 + tiled-input residual), four channel-doubling
DownTransitions (16->32->64->128->256) with residual nConv stacks, four
UpTransitions (transposed-conv upsample + skip concat + residual), and an
OutputTransition head — but as channels-last Flax modules compiled by XLA
for the MXU, with per-stage anisotropic ``kernel_size``/``stride_size``
(e.g. [2,2,4]/[2,2,1] for 512x512x12 spine MRI, reference
configs/mri_spine_seg/vnet_mri_spine_seg_512_512_12_15k.yml:8-9).

Contract (matching reference vnet.py:256-267): ``apply`` takes a
[N, D, H, W, C_in] batch and returns a list ``[logits]`` with logits
[N, D, H, W, num_classes].
"""

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..cvlibs import manager
from .layers import (Activation, BatchNorm3D, ChannelDropout, ConvBNAct,
                     NConvs)


def boundary_layouts(x_shape, ks, ss, pallas, all_kl=False):
    """Per-stage transition-boundary layout: True = the Pallas kernel
    layout [N, D, C, H, W], False = NDHWC.

    Shallow stages at VOLUME scale (wide W, narrow C) can pay ~10x HBM
    padding as NDHWC on TPU (XLA lane-pads the tiny minor C to 128 on
    remat pivots / transposes) — at the 512-wide spine geometry that is
    an OOM (18.7 GB / 15.75 GB), and the KL boundary with the wide W
    extent on lanes is what makes it fit. At cube-128 scale, however,
    XLA already picks good layouts and the boundary conversions ADD
    ~5 big padded transposes per train step (measured: 5.99 -> 3.72
    patches/s at 128^3 b2 when stage-0 was KL), so the boundary stays
    NDHWC below W=256. W follows the Down path's VALID strided-conv
    arithmetic. Returns flags for the five encoder levels [out16,
    out32, out64, out128, out256]; decoder levels reuse their skip
    level's flag."""
    if not pallas:
        return [False] * 5
    if all_kl:
        # layout_policy='all_kl': every stage boundary stays in the
        # kernel layout; the transitions' KL s2d matmuls (ops/updown.py
        # *_kl) make the whole trunk flip-free, so the W >= 256 gate
        # below (which exists to avoid boundary transposes in the
        # NDHWC-train regime) does not apply.
        return [True] * 5
    w = x_shape[3]
    flags = [w >= 256 and w % 128 == 0]
    for i in range(4):
        w = (w - ks[i][2]) // ss[i][2] + 1
        flags.append(w >= 256 and w % 128 == 0)
    return flags


def _kl_block(w, train, in_kl=False, out_kl=False):
    """Whether a block should run its inner conv/BN/act chain in the
    Pallas kernel layout [N, D, C, H, W]. KL chains win at eval (the
    fused-epilogue kernels remove the BN/PReLU elementwise round trips
    — serving measured 13.3 -> 16.3 vol/s at 128^3) and at volume
    scale (W >= 256: NDHWC C-minor lane padding is an OOM at the
    512-wide spine geometry), and are mandatory when the block's
    boundary tensors are already KL. At cube-128 TRAIN they lose: the
    block entry/exit transposes materialize ~5 stage-0-size
    lane-padded tensors per step (measured 5.99 -> 3.72 patches/s
    b2 128^3), so training below W=256 keeps the round-2 per-conv
    NDHWC wrappers."""
    return (not train) or in_kl or out_kl or w >= 256


class InputTransition(nn.Module):
    """1->16 channels, 5^3 conv + input-tiling residual
    (reference vnet.py:57-79).

    ``out_kl=True`` returns the Pallas kernel layout [N, D, C, H, W]
    instead of NDHWC — chosen per stage by the VNet trunk so the big
    shallow-stage tensors (remat pivots, skip connections) live with
    the wide W extent on lanes instead of a tiny lane-padded C (XLA
    pads C=16 to 128: 10.7x HBM at the 512x512x12 spine geometry)."""
    in_channels: int = 1
    elu: bool = False
    dtype: Any = jnp.float32
    num_features: int = 16
    stem_conv: str = "default"  # 'default' | 'pallas'
    out_kl: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ..ops import pallas_conv5 as pc

        repeat = self.num_features // self.in_channels
        if (self.stem_conv == "pallas" and self.in_channels == 1 and
                pc.stem_eligible(x.shape, 1, self.num_features,
                                 dtype=self.dtype) and
                _kl_block(x.shape[3], train, out_kl=self.out_kl)):
            # whole block in the Pallas kernel layout: conv + BN + tiled
            # residual + PReLU without NDHWC layout round trips (the
            # entry transpose moves a size-1 axis — a free reshape).
            from .layers import PallasConv5KL
            xk = pc.to_kl(x)
            conv = PallasConv5KL(self.num_features, kind="stem",
                                 dtype=self.dtype, name="Conv_0")
            bn = BatchNorm3D(dtype=self.dtype, channel_axis=2,
                             name="BatchNorm3D_0")
            if not train:
                # eval: fold the BN affine into the stem kernel's
                # epilogue (alpha=1 — the PReLU here comes after the
                # input-tiling residual, so it stays separate)
                dummy = jnp.zeros((1, 1, self.num_features, 1, 1),
                                  self.dtype)
                inv, shift = bn(dummy, train=False, affine_only=True)
                out = conv(xk, epilogue=(inv, shift,
                                         jnp.ones_like(inv)))
            else:
                out = bn(conv(xk), train)
            x_tile = jnp.tile(xk, (1, 1, repeat, 1, 1)).astype(
                self.dtype)
            out = Activation(elu=self.elu, dtype=self.dtype,
                             channel_axis=2)(out + x_tile)
            return (pc.pin_kl(out) if self.out_kl else
                    pc.from_kl(out))
        if self.stem_conv == "pallas" and self.in_channels == 1:
            from .layers import PallasConv5
            out = PallasConv5(self.num_features, kind="stem",
                              dtype=self.dtype, name="Conv_0")(x)
        else:
            out = nn.Conv(self.num_features, (5, 5, 5), padding="SAME",
                          dtype=self.dtype,
                          kernel_init=nn.initializers.he_normal())(x)
        out = BatchNorm3D(dtype=self.dtype)(out, train)
        x_tile = jnp.tile(x, (1, 1, 1, 1, repeat)).astype(self.dtype)
        out = Activation(elu=self.elu, dtype=self.dtype)(out + x_tile)
        return pc.pin_kl(pc.to_kl(out)) if self.out_kl else out


class DownTransition(nn.Module):
    """Strided conv doubling channels + residual nConv stack
    (reference vnet.py:82-113)."""
    in_channels: int
    n_convs: int
    elu: bool = False
    dropout: bool = False
    down_stride: Tuple[int, int, int] = (2, 2, 2)
    down_kernel: Tuple[int, int, int] = (2, 2, 2)
    dtype: Any = jnp.float32
    conv_impl: str = "default"
    in_kl: bool = False   # x arrives in the Pallas kernel layout
    out_kl: bool = False  # return the kernel layout
    updown_impl: str = "default"  # 's2d': window==stride conv as one
    # space-to-depth MXU matmul (ops/updown.py); param-tree identical
    kl_updown: bool = False  # run the s2d matmul in the kernel layout
    # when the boundary is KL (layout_policy='all_kl'); opt-in so the
    # measured legacy paths stay byte-identical

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ..ops import pallas_conv5 as pc
        from ..ops.updown import supports_s2d
        out_channels = 2 * self.in_channels
        if (self.kl_updown and self.in_kl and
                self.updown_impl == "s2d" and
                supports_s2d(self.down_kernel, self.down_stride)):
            return self._kl_transition(x, out_channels, train)
        if self.in_kl:
            x = pc.from_kl(x)
        if (self.updown_impl == "s2d" and
                supports_s2d(self.down_kernel, self.down_stride)):
            from ..ops.updown import S2DConv
            down = S2DConv(out_channels, tuple(self.down_kernel),
                           strides=tuple(self.down_stride),
                           dtype=self.dtype, name="Conv_0")(x)
        else:
            down = nn.Conv(out_channels, tuple(self.down_kernel),
                           strides=tuple(self.down_stride),
                           padding="VALID", dtype=self.dtype,
                           kernel_init=nn.initializers.he_normal())(x)
        down = BatchNorm3D(dtype=self.dtype)(down, train)
        down = Activation(elu=self.elu, dtype=self.dtype)(down)
        out = down
        if self.dropout:
            out = ChannelDropout()(out, deterministic=not train)
        if self.conv_impl == "pallas":
            if (pc.head_eligible(out.shape, out_channels, out_channels,
                                 dtype=out.dtype) and
                    _kl_block(out.shape[3], train, self.in_kl,
                              self.out_kl)):
                # residual nConv stack in the Pallas kernel layout: one
                # transpose in/out per transition instead of layout
                # copies at every conv / BN boundary.
                outk = NConvs(out_channels, self.n_convs, elu=self.elu,
                              dtype=self.dtype, conv_impl="pallas",
                              layout="kl")(pc.to_kl(out), train)
                outk = outk + pc.to_kl(down)
                outk = Activation(elu=self.elu, dtype=self.dtype,
                                  channel_axis=2)(outk)
                return (pc.pin_kl(outk) if self.out_kl else
                        pc.from_kl(outk))
        out = NConvs(out_channels, self.n_convs, elu=self.elu,
                     dtype=self.dtype,
                     conv_impl=self.conv_impl)(out, train)
        out = out + down
        out = Activation(elu=self.elu, dtype=self.dtype)(out)
        return pc.pin_kl(pc.to_kl(out)) if self.out_kl else out

    def _kl_transition(self, x, out_channels, train):
        """Fully kernel-layout transition: the s2d down matmul, BN,
        activation, dropout, and nConv stack all consume/produce
        [N, D, C, H, W] — no NDHWC round trip at the block boundary
        (the round-3 profile measured ~16 ms per boundary transpose at
        cube-scale stage 0). Explicit submodule names keep the param
        tree identical to the NDHWC branch."""
        from ..ops import pallas_conv5 as pc
        from ..ops.updown import S2DConv
        down = S2DConv(out_channels, tuple(self.down_kernel),
                       strides=tuple(self.down_stride), dtype=self.dtype,
                       layout="kl", name="Conv_0")(x)
        down = BatchNorm3D(dtype=self.dtype, channel_axis=2,
                           name="BatchNorm3D_0")(down, train)
        down = Activation(elu=self.elu, dtype=self.dtype,
                          channel_axis=2, name="Activation_0")(down)
        out = down
        if self.dropout:
            out = ChannelDropout(channel_axis=2, name="ChannelDropout_0")(
                out, deterministic=not train)
        x_shape = pc._kl_to_x_shape(out.shape)
        if (self.conv_impl == "pallas" and
                pc.head_eligible(x_shape, out_channels, out_channels,
                                 dtype=out.dtype)):
            outk = NConvs(out_channels, self.n_convs, elu=self.elu,
                          dtype=self.dtype, conv_impl="pallas",
                          layout="kl", name="NConvs_0")(out, train)
            outk = outk + down
            outk = Activation(elu=self.elu, dtype=self.dtype,
                              channel_axis=2, name="Activation_1")(outk)
            return pc.pin_kl(outk) if self.out_kl else pc.from_kl(outk)
        # stack ineligible for the Pallas/KL form at this traced shape:
        # finish in NDHWC (correctness fallback; tiny test geometries)
        outn = NConvs(out_channels, self.n_convs, elu=self.elu,
                      dtype=self.dtype, conv_impl=self.conv_impl,
                      name="NConvs_0")(pc.from_kl(out), train)
        outn = outn + pc.from_kl(down)
        outn = Activation(elu=self.elu, dtype=self.dtype,
                          name="Activation_1")(outn)
        return pc.pin_kl(pc.to_kl(outn)) if self.out_kl else outn


class UpTransition(nn.Module):
    """Transposed-conv upsample + skip concat + residual nConv stack
    (reference vnet.py:116-156)."""
    in_channels: int
    out_channels: int
    n_convs: int
    elu: bool = False
    dropout: bool = False
    dropout2: bool = False
    up_stride: Tuple[int, int, int] = (2, 2, 2)
    up_kernel: Tuple[int, int, int] = (2, 2, 2)
    dtype: Any = jnp.float32
    conv_impl: str = "default"
    in_kl: bool = False    # x arrives in the kernel layout
    skip_kl: bool = False  # skipx arrives in the kernel layout
    out_kl: bool = False   # return the kernel layout
    updown_impl: str = "default"  # 's2d': window==stride transposed
    # conv as one MXU matmul + depth-to-space (ops/updown.py)
    kl_updown: bool = False  # see DownTransition.kl_updown

    @nn.compact
    def __call__(self, x, skipx, train: bool = True):
        from ..ops import pallas_conv5 as pc
        from ..ops.updown import supports_s2d
        if (self.kl_updown and self.in_kl and
                self.updown_impl == "s2d" and
                supports_s2d(self.up_kernel, self.up_stride) and
                (tuple(self.up_kernel) == tuple(self.up_stride) or
                 self.up_stride[0] == 1) and
                min(x.shape[1], x.shape[3], x.shape[4]) >= 1):
            return self._kl_transition(x, skipx, train)
        out = pc.from_kl(x) if self.in_kl else x
        if self.dropout:
            out = ChannelDropout()(out, deterministic=not train)
        skip = skipx
        if self.dropout2:
            skip = ChannelDropout(
                channel_axis=2 if self.skip_kl else -1)(
                skip, deterministic=not train)
        # VALID conv_transpose: out = (in-1)*stride + kernel, matching
        # paddle Conv3DTranspose shape math (SURVEY §7 hard parts).
        from ..ops.updown import supports_s2d
        if (self.updown_impl == "s2d" and
                supports_s2d(self.up_kernel, self.up_stride) and
                (tuple(self.up_kernel) == tuple(self.up_stride) or
                 self.up_stride[0] == 1) and
                min(out.shape[1:4]) >= 1):
            # degenerate (zero-extent) bottlenecks fall through to
            # nn.ConvTranspose: flax's VALID shape math emits extent 1
            # from a 0-extent input, which tiny test geometries rely
            # on; d2s keeps the exact in*k extent. Param trees match,
            # so the switch is checkpoint-safe.
            from ..ops.updown import D2SConvTranspose
            out = D2SConvTranspose(self.out_channels // 2,
                                   tuple(self.up_kernel),
                                   strides=tuple(self.up_stride),
                                   dtype=self.dtype,
                                   name="ConvTranspose_0")(out)
        else:
            out = nn.ConvTranspose(
                self.out_channels // 2, tuple(self.up_kernel),
                strides=tuple(self.up_stride),
                padding="VALID", dtype=self.dtype,
                kernel_init=nn.initializers.he_normal())(out)
        out = BatchNorm3D(dtype=self.dtype)(out, train)
        out = Activation(elu=self.elu, dtype=self.dtype)(out)
        cat_shape = out.shape[:4] + (self.out_channels,)
        if (self.conv_impl == "pallas" and
                pc.head_eligible(cat_shape, self.out_channels,
                                 self.out_channels, dtype=out.dtype) and
                _kl_block(cat_shape[3], train,
                          self.in_kl or self.skip_kl, self.out_kl)):
            # concat + residual nConv stack in the kernel layout; a
            # kernel-layout skip concatenates directly on the channel
            # axis (no transpose of the big skip tensor).
            skipk = (skip if self.skip_kl else
                     pc.to_kl(skip)).astype(self.dtype)
            xcatk = jnp.concatenate([pc.pin_kl(pc.to_kl(out)),
                                     skipk], axis=2)
            outk = NConvs(self.out_channels, self.n_convs,
                          elu=self.elu, dtype=self.dtype,
                          conv_impl="pallas",
                          layout="kl")(xcatk, train)
            outk = outk + xcatk
            outk = Activation(elu=self.elu, dtype=self.dtype,
                              channel_axis=2)(outk)
            return (pc.pin_kl(outk) if self.out_kl else
                    pc.from_kl(outk))
        skip_n = pc.from_kl(skip) if self.skip_kl else skip
        xcat = jnp.concatenate([out, skip_n.astype(self.dtype)], axis=-1)
        out = NConvs(self.out_channels, self.n_convs, elu=self.elu,
                     dtype=self.dtype,
                     conv_impl=self.conv_impl)(xcat, train)
        out = out + xcat
        out = Activation(elu=self.elu, dtype=self.dtype)(out)
        return pc.pin_kl(pc.to_kl(out)) if self.out_kl else out

    def _kl_transition(self, x, skipx, train):
        """Fully kernel-layout transition: dropout, the d2s up matmul,
        BN, activation, skip concat, and nConv stack all on
        [N, D, C, H, W] tensors — no NDHWC round trip. Explicit names
        keep the param tree identical to the NDHWC branch."""
        from ..ops import pallas_conv5 as pc
        from ..ops.updown import D2SConvTranspose
        out = x
        if self.dropout:
            out = ChannelDropout(channel_axis=2, name="ChannelDropout_0")(
                out, deterministic=not train)
        skip = skipx
        if self.dropout2:
            skip = ChannelDropout(
                channel_axis=2 if self.skip_kl else -1,
                name="ChannelDropout_1")(skip, deterministic=not train)
        out = D2SConvTranspose(self.out_channels // 2,
                               tuple(self.up_kernel),
                               strides=tuple(self.up_stride),
                               dtype=self.dtype, layout="kl",
                               name="ConvTranspose_0")(out)
        out = BatchNorm3D(dtype=self.dtype, channel_axis=2,
                          name="BatchNorm3D_0")(out, train)
        out = Activation(elu=self.elu, dtype=self.dtype, channel_axis=2,
                         name="Activation_0")(out)
        skipk = (skip if self.skip_kl else pc.to_kl(skip)).astype(
            self.dtype)
        xcatk = jnp.concatenate([pc.pin_kl(out), skipk], axis=2)
        cat_shape = pc._kl_to_x_shape(xcatk.shape)
        if (self.conv_impl == "pallas" and
                pc.head_eligible(cat_shape, self.out_channels,
                                 self.out_channels, dtype=out.dtype)):
            outk = NConvs(self.out_channels, self.n_convs, elu=self.elu,
                          dtype=self.dtype, conv_impl="pallas",
                          layout="kl", name="NConvs_0")(xcatk, train)
            outk = outk + xcatk
            outk = Activation(elu=self.elu, dtype=self.dtype,
                              channel_axis=2, name="Activation_1")(outk)
            return (pc.pin_kl(outk) if self.out_kl else
                    pc.from_kl(outk))
        # stack ineligible at this traced shape: finish in NDHWC
        xcat = pc.from_kl(xcatk)
        outn = NConvs(self.out_channels, self.n_convs, elu=self.elu,
                      dtype=self.dtype, conv_impl=self.conv_impl,
                      name="NConvs_0")(xcat, train)
        outn = outn + xcat
        outn = Activation(elu=self.elu, dtype=self.dtype,
                          name="Activation_1")(outn)
        return pc.pin_kl(pc.to_kl(outn)) if self.out_kl else outn


class OutputTransition(nn.Module):
    """5^3 conv -> BN -> act -> 1^3 conv to num_classes
    (reference vnet.py:159-175).

    head_conv: 'default' | 'narrow' | 'lane_pad' — how the expensive
    narrow-output 5^3 conv is computed (see layers.ConvBNAct /
    ops.narrow_conv).
    """
    num_classes: int
    elu: bool = False
    dtype: Any = jnp.float32
    head_conv: str = "default"
    in_kl: bool = False  # x arrives in the kernel layout
    head_1x1: str = "kl"  # 'kl' (Conv1x1KL contraction) | 'conv' (stock
    # nn.Conv 1^3) when head_conv='pallas' — A/B switch for the serving
    # regression adjudication (VERDICT r4 #4); same params either way

    @nn.compact
    def __call__(self, x, train: bool = True):
        # NOTE (profiled on v5e): this 5^3 conv down to num_classes is the
        # single most expensive op of the network (~47 ms, >50% of fwd) —
        # C_out=3 keeps it off the MXU. head_conv='narrow' reassociates
        # it as (kh,kw,c)-row matmuls + shifted accumulations
        # (ops/narrow_conv.py); 'lane_pad' zero-pads onto the MXU.
        from ..ops import pallas_conv5 as pc
        lane_pad = {"default": False, "lane_pad": True,
                    "narrow": "narrow", "pallas": "pallas"}[self.head_conv]
        x_shape = pc._kl_to_x_shape(x.shape) if self.in_kl else x.shape
        use_kl = False
        if self.head_conv == "pallas":
            use_kl = (pc.head_eligible(x_shape, x_shape[-1],
                                       self.num_classes, dtype=x.dtype)
                      and _kl_block(x_shape[3], train, self.in_kl))
        if use_kl:
            xk = x if self.in_kl else pc.to_kl(x)
            pre = ConvBNAct(self.num_classes, (5, 5, 5), elu=self.elu,
                            dtype=self.dtype, lane_pad="pallas",
                            layout="kl")(xk, train)
            pre_layout = "kl"
        else:
            xn = pc.from_kl(x) if self.in_kl else x
            pre = ConvBNAct(self.num_classes, (5, 5, 5), elu=self.elu,
                            dtype=self.dtype, lane_pad=lane_pad)(xn,
                                                                 train)
            pre_layout = "ndhwc"
        if self.head_conv == "pallas" and self.head_1x1 == "kl":
            # 1^3 conv as a KL-flat contraction: the stock conv's
            # C=num_classes-minor operands lane-pad 128/C (see
            # layers.Conv1x1KL). Same params ('Conv_0'), same math.
            from .layers import Conv1x1KL
            out = Conv1x1KL(self.num_classes, dtype=self.dtype,
                            layout=pre_layout, name="Conv_0")(pre)
        else:
            if pre_layout == "kl":
                pre = pc.from_kl(pre)
            out = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                          kernel_init=nn.initializers.he_normal(),
                          name="Conv_0")(pre)
        return out


@manager.MODELS.add_component
class VNet(nn.Module):
    """V-Net (reference medicalseg/models/vnet.py:178-267).

    Args mirror the reference YAML surface: ``elu``, ``in_channels``,
    ``num_classes``, per-stage ``kernel_size``/``stride_size`` 4-tuples,
    ``pretrained`` (checkpoint path/URL consumed by the config layer).
    ``dtype`` selects the activation compute dtype (bf16 on TPU).
    """
    elu: bool = False
    in_channels: int = 1
    num_classes: int = 4
    pretrained: Any = None
    kernel_size: Sequence[Tuple[int, int, int]] = (
        (2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2))
    stride_size: Sequence[Tuple[int, int, int]] = (
        (2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2))
    dtype: Any = jnp.float32
    remat: bool = False  # per-block rematerialization (HBM <-> FLOPs)
    head_conv: str = "default"  # 'default'|'narrow'|'lane_pad'|'pallas'
    # — 'pallas' also switches the InputTransition stem to the Pallas
    # kernel (see OutputTransition / layers.PallasConv5)
    mid_conv: str = "default"  # 'default' | 'pallas' — conv impl of the
    # residual NConv stacks (Pallas MXU kernels where the traced shape
    # is eligible, XLA otherwise; see layers.NConvs)
    updown_conv: str = "s2d"  # 's2d' (default) | 'default' — stages
    # whose window == stride run the down/up-sampling convs as single
    # MXU matmuls (space-to-depth, ops/updown.py; measured 348->340 ms
    # b2 128^3 train step); others keep the XLA conv. Param trees are
    # identical, so checkpoints interchange freely.
    dropout: bool = True  # False disables the mid-stage ChannelDropouts
    # (the reference's torch-alignment harness runs with dropout off,
    # reference vnet.py:285-404)
    layout_policy: str = "auto"  # 'auto' | 'all_kl' — 'all_kl' keeps
    # every stage boundary in the Pallas kernel layout [N, D, C, H, W]
    # (train AND eval), with the transitions' KL s2d matmuls making the
    # trunk layout-flip-free; needs head_conv=mid_conv='pallas' and
    # updown_conv='s2d'. 'auto' keeps the measured round-3 gating
    # (NDHWC training below W=256, KL at eval/volume scale).
    head_1x1: str = "kl"  # see OutputTransition.head_1x1

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        ks, ss = self.kernel_size, self.stride_size
        if self.remat:
            # checkpoint each transition: the backward recomputes one
            # block at a time, bounding the live activation set by the
            # largest single stage instead of the whole network.
            Input = nn.remat(InputTransition, static_argnums=(2,))
            Down = nn.remat(DownTransition, static_argnums=(2,))
            Up = nn.remat(UpTransition, static_argnums=(3,))
            Output = nn.remat(OutputTransition, static_argnums=(2,))
        else:
            Input, Down, Up, Output = (InputTransition, DownTransition,
                                       UpTransition, OutputTransition)
        # explicit names keep the parameter tree identical whether or not
        # the lifted remat wrapper is applied (checkpoint compatibility)
        stem = "pallas" if self.head_conv == "pallas" else "default"
        mc = self.mid_conv
        klb = boundary_layouts(x.shape, ks, ss,
                               stem == "pallas" and mc == "pallas",
                               all_kl=(self.layout_policy == "all_kl" and
                                       self.updown_conv == "s2d"))
        kl_ud = self.layout_policy == "all_kl"
        out16 = Input(self.in_channels, self.elu, self.dtype, 16, stem,
                      out_kl=klb[0],
                      name="InputTransition_0")(x, train)
        out32 = Down(16, 1, self.elu, False, ss[0], ks[0], self.dtype,
                     mc, in_kl=klb[0], out_kl=klb[1], updown_impl=self.updown_conv, kl_updown=kl_ud,
                     name="DownTransition_0")(out16, train)
        out64 = Down(32, 2, self.elu, False, ss[1], ks[1], self.dtype,
                     mc, in_kl=klb[1], out_kl=klb[2], updown_impl=self.updown_conv, kl_updown=kl_ud,
                     name="DownTransition_1")(out32, train)
        do = self.dropout
        out128 = Down(64, 3, self.elu, do, ss[2], ks[2], self.dtype,
                      mc, in_kl=klb[2], out_kl=klb[3], updown_impl=self.updown_conv, kl_updown=kl_ud,
                      name="DownTransition_2")(out64, train)
        out256 = Down(128, 2, self.elu, do, ss[3], ks[3], self.dtype,
                      mc, in_kl=klb[3], out_kl=klb[4], updown_impl=self.updown_conv, kl_updown=kl_ud,
                      name="DownTransition_3")(out128, train)
        out = Up(256, 256, 2, self.elu, do, do, ss[3], ks[3],
                 self.dtype, mc, in_kl=klb[4], skip_kl=klb[3],
                 out_kl=klb[3], updown_impl=self.updown_conv,
                 kl_updown=kl_ud, name="UpTransition_0")(out256, out128, train)
        out = Up(256, 128, 2, self.elu, do, do, ss[2], ks[2],
                 self.dtype, mc, in_kl=klb[3], skip_kl=klb[2],
                 out_kl=klb[2], updown_impl=self.updown_conv,
                 kl_updown=kl_ud, name="UpTransition_1")(out, out64, train)
        out = Up(128, 64, 1, self.elu, False, False, ss[1], ks[1],
                 self.dtype, mc, in_kl=klb[2], skip_kl=klb[1],
                 out_kl=klb[1], updown_impl=self.updown_conv,
                 kl_updown=kl_ud, name="UpTransition_2")(out, out32, train)
        out = Up(64, 32, 1, self.elu, False, False, ss[0], ks[0],
                 self.dtype, mc, in_kl=klb[1], skip_kl=klb[0],
                 out_kl=klb[0], updown_impl=self.updown_conv,
                 kl_updown=kl_ud, name="UpTransition_3")(out, out16, train)
        out = Output(self.num_classes, self.elu, self.dtype,
                     self.head_conv, in_kl=klb[0],
                     head_1x1=self.head_1x1,
                     name="OutputTransition_0")(out, train)
        return [out.astype(jnp.float32)]

    def test(self):
        """Self-test: seeded 32^3 forward + shape assert (reference
        vnet.py:269-282)."""
        import numpy as np

        import jax
        np.random.seed(1)
        a = np.random.rand(1, 32, 32, 32, self.in_channels).astype(
            np.float32)
        variables = jax.jit(
            lambda k, x: self.init(k, x, train=False))(
            jax.random.PRNGKey(0), a)
        out = jax.jit(lambda v, x: self.apply(v, x, train=False))(
            variables, a)[0]
        print("out", float(out.mean()), float(a.mean()))
        assert out.shape == (1, 32, 32, 32, self.num_classes)
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(
            variables["params"]))
        print("params: {:.2f}M".format(n_params / 1e6))
        print("Vnet test is complete")
