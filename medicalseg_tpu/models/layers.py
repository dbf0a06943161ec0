# Copyright 2026. Apache License 2.0.
"""Shared building blocks for the 3-D segmentation models.

Channels-last (NDHWC) Flax modules — the TPU-native layout: XLA maps
5-D convs in NDHWC straight onto the MXU without layout transposes,
unlike the reference's NCDHW Paddle modules (medicalseg/models/vnet.py).

Mixed precision: ``dtype`` is the compute/activation dtype (bfloat16 by
default on TPU), parameters and BatchNorm statistics stay float32.
"""

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Per-channel PReLU (paddle nn.PReLU(num_parameters=C) parity,
    reference vnet.py:35: learnable alpha per channel, init 0.25).

    ``channel_axis=-1`` for NDHWC; 2 for the Pallas kernel layout
    [N, D, C, H, W] (ops/pallas_conv5.to_kl). Param shape is (C,)
    either way — checkpoints are layout-independent."""
    init_value: float = 0.25
    dtype: Any = jnp.float32
    channel_axis: int = -1

    @nn.compact
    def __call__(self, x, alpha_only: bool = False):
        alpha = self.param(
            "alpha", lambda key, shape: jnp.full(shape, self.init_value,
                                                 jnp.float32),
            (x.shape[self.channel_axis],))
        if alpha_only:
            # the raw f32 [C] vector, for fusion into a conv epilogue
            # (x is a shape-only dummy in this mode)
            return alpha
        alpha = alpha.astype(self.dtype)
        if self.channel_axis % x.ndim != x.ndim - 1:
            bshape = [1] * x.ndim
            bshape[self.channel_axis] = alpha.shape[0]
            alpha = alpha.reshape(bshape)
        return jnp.where(x >= 0, x, alpha * x)


class Activation(nn.Module):
    """ELU-vs-PReLU switch used throughout VNet (reference vnet.py:35)."""
    elu: bool = False
    dtype: Any = jnp.float32
    channel_axis: int = -1

    @nn.compact
    def __call__(self, x, alpha_only: bool = False):
        if self.elu:
            assert not alpha_only  # elu has no conv-epilogue form
            return nn.elu(x)
        return PReLU(dtype=self.dtype, channel_axis=self.channel_axis)(
            x, alpha_only=alpha_only)


class BatchNorm3D(nn.Module):
    """BatchNorm with f32 statistics and compute-dtype normalization.

    flax's nn.BatchNorm(dtype=f32) upcasts the whole activation to f32
    for the normalize — at 128^3 volumes that doubles the elementwise
    HBM traffic of every layer. Here the reductions (mean/var, running
    stats) are f32 for numerical fidelity, but the normalize itself is a
    fused scale-and-shift in the compute dtype (bf16 on TPU).

    Under a batch-sharded jit the means are *global* (XLA inserts the
    cross-chip reductions), giving SyncBatchNorm semantics (reference
    config.py:322-323) without a dedicated layer.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    channel_axis: int = -1  # -1 NDHWC; 2 for the Pallas kernel layout

    @nn.compact
    def __call__(self, x, train: bool = True,
                 affine_only: bool = False):
        cax = self.channel_axis % x.ndim
        features = x.shape[cax]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)

        if affine_only:
            # inference normalize folded to (inv, shift) f32 [C] for
            # fusion into a conv epilogue (x is a shape-only dummy);
            # train-mode stats need the conv output first, so fusion
            # is eval-only by construction
            assert not train
            inv_v = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            return inv_v, bias - ra_mean.value * inv_v

        if train:
            xf = x.astype(jnp.float32)
            if cax != x.ndim - 1:
                # kernel layout [N, D, C, H, W]: reduce the minor
                # (H, W) dims first — a single reduce keeping only the
                # interior C axis makes XLA relayout the operand
                # C-minor (tiny-C lane padding, gigabytes at volume
                # scale); a lanes/sublanes partial reduce keeps the
                # native layout.
                minor = tuple(range(cax + 1, x.ndim))
                rest = tuple(range(cax))
                mean = jnp.mean(jnp.mean(xf, axis=minor), axis=rest)
                var = (jnp.mean(jnp.mean(jnp.square(xf), axis=minor),
                                axis=rest) - jnp.square(mean))
            else:
                axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(xf, axis=axes)
                var = (jnp.mean(jnp.square(xf), axis=axes) -
                       jnp.square(mean))
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        shift = bias - mean * inv
        if cax != x.ndim - 1:
            bshape = [1] * x.ndim
            bshape[cax] = features
            inv = inv.reshape(bshape)
            shift = shift.reshape(bshape)
        # one fused multiply-add in the compute dtype
        return (x.astype(self.dtype) * inv.astype(self.dtype) +
                shift.astype(self.dtype))


class LanePaddedConv(nn.Module):
    """Conv3D whose *compute* pads C_out up to an MXU-friendly width.

    Narrow-output convs (e.g. the segmentation head's 5^3 conv to
    num_classes=3) fall off the MXU on TPU and run as ~50 ms VPU loops
    (profiled: >50% of the whole VNet forward). Zero-padding the kernel's
    output channels to ``pad_to`` inside the graph makes XLA lower it as
    a dense MXU conv, and the extra channels are sliced away — the
    parameters, their gradients (sliced outputs contribute nothing), and
    the numerics are identical to a plain nn.Conv. Param names match
    nn.Conv (kernel/bias) for checkpoint compatibility.
    """
    features: int
    kernel_size: Tuple[int, int, int] = (5, 5, 5)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = "SAME"
    pad_to: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_features, self.features)
        kernel = self.param("kernel", nn.initializers.he_normal(), kshape,
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        pad = max(self.pad_to, self.features) - self.features
        k = jnp.pad(kernel.astype(self.dtype),
                    [(0, 0)] * 4 + [(0, pad)])
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, tuple(self.strides), self.padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        out = out[..., :self.features]
        return out + bias.astype(self.dtype)


class PallasConv5(nn.Module):
    """5^3 SAME conv through the Pallas MXU kernels (ops/pallas_conv5).

    Falls back to the stock XLA conv when the traced shape is not
    eligible (W not lane-aligned, channels too wide, ...), so it is
    always safe to enable. Param names match nn.Conv (kernel/bias) for
    checkpoint compatibility. ``kind`` selects the head (general C_in,
    narrow C_out) or stem (C_in=1) kernel. The custom VJP runs the
    Pallas dgrad/wgrad kernels (bf16 MXU matmuls) with a per-piece
    XLA-VJP fallback for ineligible shapes — training numerics match
    the default path to bf16-matmul tolerance (tests compare at
    atol 5e-3), not bit-exactly.
    """
    features: int
    kind: str = "head"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops import pallas_conv5 as pc

        ci = x.shape[-1]
        kern = self.param("kernel", nn.initializers.he_normal(),
                          (5, 5, 5, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        kern = kern.astype(self.dtype)
        eligible = (pc.stem_eligible if self.kind == "stem" else
                    pc.head_eligible)(x.shape, ci, self.features,
                                      dtype=x.dtype)
        # Mosaic compile on TPU, interpreter everywhere else (CPU tests)
        interpret = jax.default_backend() != "tpu"
        if eligible:
            return pc.conv5(x, kern, bias, self.kind, interpret)
        if self.kind == "head" and pc.wide_eligible(
                x.shape, ci, self.features, dtype=x.dtype):
            # deep 256-channel stacks: co-chunked head-kernel calls
            return pc.conv5_wide(x, kern, bias, interpret)
        return pc._conv5_xla(x, kern, bias.astype(self.dtype))


class PallasConv5KL(nn.Module):
    """5^3 SAME conv in the Pallas kernel layout [N, D, C, H, W]
    (ops/pallas_conv5.conv5_kl): no NDHWC<->kernel-layout copies around
    the custom call, so consecutive convs + BN + PReLU chain without
    the ~2.2 ms/tensor layout flips the round-3 train profile found at
    every Pallas conv boundary. Param names/shapes match nn.Conv
    (kernel [5,5,5,Ci,Co], bias [Co]) for checkpoint compatibility.
    Falls back to an XLA conv (same layout) for ineligible shapes."""
    features: int
    kind: str = "head"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xk, epilogue=None):
        """``epilogue=(inv, shift, alpha)`` (each f32 [Co]) fuses the
        BN affine + PReLU into the kernel's output path — inference
        only (the fused op has no VJP; callers gate on train)."""
        from ..ops import pallas_conv5 as pc

        ci = xk.shape[2]
        kern = self.param("kernel", nn.initializers.he_normal(),
                          (5, 5, 5, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        xk = xk.astype(self.dtype)
        kern = kern.astype(self.dtype)
        eligible = (pc.stem_eligible_kl if self.kind == "stem" else
                    pc.head_eligible_kl)(xk.shape, ci, self.features,
                                         dtype=xk.dtype)
        if not eligible:
            out = pc._conv5_xla_kl(xk, kern, bias.astype(self.dtype))
            return (out if epilogue is None else
                    pc.ep_apply_kl(out, epilogue))
        interpret = jax.default_backend() != "tpu"
        if epilogue is not None:
            return pc.conv5_kl_fused(xk, kern, bias, epilogue,
                                     self.kind, interpret)
        return pc.conv5_kl(xk, kern, bias, self.kind, interpret)


class Conv1x1KL(nn.Module):
    """1^3 conv as a kernel-layout-flat contraction.

    nn.Conv's 1^3 convolution on an NDHWC tensor with C=num_classes
    makes XLA lay the operands out channels-minor — lane-padded
    128/C (42x for 3 classes; ~12 ms/step of convolution fusions +
    copies at 128^3 b2, measured round 4). Contracting on the flat
    kernel layout [N, D, C, H*W] keeps the wide spatial extent on
    lanes. Param names/shapes match nn.Conv (kernel [1,1,1,Ci,Co],
    bias [Co]) so checkpoints interchange; numerics are the same
    contraction.
    """
    features: int
    dtype: Any = jnp.float32
    layout: str = "ndhwc"  # input layout: 'ndhwc' | 'kl'; returns NDHWC

    @nn.compact
    def __call__(self, x):
        from ..ops import pallas_conv5 as pc

        ci = x.shape[2] if self.layout == "kl" else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (1, 1, 1, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        xk = x if self.layout == "kl" else pc.to_kl(x)
        n, d, c, h, w = xk.shape
        f = xk.astype(self.dtype).reshape(n, d, c, h * w)
        w2 = kernel[0, 0, 0].astype(self.dtype)  # [Ci, Co]
        # [Co, Ci] x [N, D, Ci, F] -> [Co, N, D, F]: both sides keep
        # the flat spatial axis minor (no lane-padded layout exists)
        out = jax.lax.dot_general(
            w2.T, f, dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + bias.reshape(-1, 1, 1, 1)
        out = jnp.transpose(out, (1, 2, 0, 3)).astype(self.dtype)
        return pc.from_kl(out.reshape(n, d, self.features, h, w))


class ConvBNAct(nn.Module):
    """Conv3D + BatchNorm + activation (reference LUConv, vnet.py:32-43).

    ``lane_pad`` switches the conv implementation for narrow-output
    heads: True -> LanePaddedConv (MXU zero-pad), 'narrow' -> the
    reassociated XLA matmul form, 'pallas' -> the Pallas MXU kernel.
    ``layout='kl'`` (with lane_pad='pallas') runs the whole block in
    the Pallas kernel layout [N, D, C, H, W] — input and output are
    kernel-layout tensors; param tree is identical to the NDHWC block.
    """
    features: int
    kernel_size: Tuple[int, int, int] = (5, 5, 5)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = "SAME"
    elu: bool = False
    dtype: Any = jnp.float32
    lane_pad: Any = False  # False | True (MXU pad) | 'narrow' | 'pallas'
    layout: str = "ndhwc"  # 'ndhwc' | 'kl' (kernel layout, pallas only)

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.layout == "kl":
            assert self.lane_pad == "pallas"
            conv = PallasConv5KL(self.features, kind="head",
                                 dtype=self.dtype, name="Conv_0")
            bn = BatchNorm3D(dtype=self.dtype, channel_axis=2,
                             name="BatchNorm3D_0")
            act = Activation(elu=self.elu, dtype=self.dtype,
                             channel_axis=2, name="Activation_0")
            if not train and not self.elu:
                # eval: fold BN (running stats) + PReLU into the conv
                # kernel's epilogue — no separate elementwise HBM
                # round trips. Param tree is identical to the unfused
                # path (the modules still own their params).
                dummy = jnp.zeros((1, 1, self.features, 1, 1),
                                  self.dtype)
                inv, shift = bn(dummy, train=False, affine_only=True)
                alpha = act(dummy, alpha_only=True)
                return conv(x, epilogue=(inv, shift, alpha))
            x = conv(x)
            x = bn(x, train)
            return act(x)
        if (self.lane_pad == "pallas" and
                tuple(self.kernel_size) == (5, 5, 5) and
                tuple(self.strides) == (1, 1, 1) and
                self.padding == "SAME"):
            # PallasConv5 routes per traced shape: direct kernel,
            # co-chunked wide kernel, or the XLA conv fallback
            x = PallasConv5(self.features, kind="head", dtype=self.dtype,
                            name="Conv_0")(x)
        elif self.lane_pad == "narrow" and self.features < 16:
            from ..ops.narrow_conv import narrow_conv3d_same

            # named child scope with nn.Conv-compatible params
            class _NarrowConv(nn.Module):
                features: int
                kernel_size: Tuple[int, int, int]
                dtype: Any

                @nn.compact
                def __call__(inner, h):
                    kern = inner.param(
                        "kernel", nn.initializers.he_normal(),
                        tuple(inner.kernel_size) + (h.shape[-1],
                                                    inner.features),
                        jnp.float32)
                    b = inner.param("bias", nn.initializers.zeros,
                                    (inner.features,), jnp.float32)
                    return narrow_conv3d_same(
                        h, kern, b, compute_dtype=inner.dtype)

            x = _NarrowConv(self.features, self.kernel_size,
                            self.dtype, name="Conv_0")(x)
        elif self.lane_pad and self.features < 16:
            x = LanePaddedConv(self.features, self.kernel_size,
                               strides=self.strides, padding=self.padding,
                               dtype=self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(self.features, self.kernel_size,
                        strides=self.strides,
                        padding=self.padding, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal())(x)
        x = BatchNorm3D(dtype=self.dtype)(x, train)
        return Activation(elu=self.elu, dtype=self.dtype)(x)


class NConvs(nn.Module):
    """``depth`` stacked 5x5x5 ConvBNAct blocks at constant width
    (reference _make_nConv, vnet.py:46-54). ``conv_impl='pallas'``
    routes every eligible conv through the Pallas MXU kernels;
    ``layout='kl'`` additionally keeps the whole stack in the Pallas
    kernel layout (caller passes/receives [N, D, C, H, W])."""
    features: int
    depth: int
    elu: bool = False
    dtype: Any = jnp.float32
    conv_impl: str = "default"
    layout: str = "ndhwc"

    @nn.compact
    def __call__(self, x, train: bool = True):
        lane_pad = "pallas" if self.conv_impl == "pallas" else False
        for _ in range(self.depth):
            x = ConvBNAct(self.features, elu=self.elu,
                          dtype=self.dtype, lane_pad=lane_pad,
                          layout=self.layout)(x, train)
        return x


class ChannelDropout(nn.Module):
    """Dropout3D parity: zeroes whole channels (paddle nn.Dropout3D,
    reference vnet.py:103). Mask broadcasts over D,H,W —
    ``channel_axis=2`` selects the kernel layout's axes (1, 3, 4)."""
    rate: float = 0.5
    channel_axis: int = -1

    @nn.compact
    def __call__(self, x, deterministic: bool):
        cax = self.channel_axis % x.ndim
        bdims = tuple(a for a in range(1, x.ndim) if a != cax)
        return nn.Dropout(rate=self.rate, broadcast_dims=bdims,
                          deterministic=deterministic)(x)
