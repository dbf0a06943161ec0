# Copyright 2026. Apache License 2.0.
"""Space-to-depth reformulation of the V-Net up/down-sampling convs.

The reference's transitions (medicalseg/models/vnet.py:82-113, 116-156)
use kernel_size == stride VALID convolutions — non-overlapping patches.
On TPU those are *exactly* a reshape + one MXU matmul:

* down (stride-s conv):  gather each s_d x s_h x s_w patch onto the
  contraction axis -> [M, prod(s)*Ci] @ [prod(s)*Ci, Co].  The taps
  multiply the contraction depth (e.g. Ci=16, 2^3 patch -> K=128, one
  full MXU pass), where the stock XLA conv contracts over the raw
  lane-starved Ci per tap.
* up (stride-s transposed conv): [M, Ci] @ [Ci, prod(s)*Co] followed by
  a depth-to-space reshape.  lax.conv_transpose with kernel == stride
  places exactly one tap on every output voxel, so the matmul is exact,
  not an approximation.

Both carry the stock VJP (reshape + matmul gradients are themselves
reshape + matmul — the wgrad contracts over the huge M axis on the
MXU). Numerics match nn.Conv / nn.ConvTranspose bit-for-bit in f32
(same contraction order up to matmul tiling; tests pin this).
"""

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["conv_s2d", "conv_transpose_d2s", "S2DConv", "D2SConvTranspose"]


def conv_s2d(x, kernel, bias=None):
    """VALID conv with window == stride as space-to-depth + matmul.

    x: [N, D, H, W, Ci]; kernel: [kd, kh, kw, Ci, Co] (nn.Conv layout).
    Equivalent to lax.conv_general_dilated(strides=(kd,kh,kw), VALID).
    """
    kd, kh, kw, ci, co = kernel.shape
    n, d, h, w, c = x.shape
    assert c == ci, (x.shape, kernel.shape)
    do, ho, wo = d // kd, h // kh, w // kw
    # VALID drops the ragged tail
    x = x[:, :do * kd, :ho * kh, :wo * kw]
    xp = x.reshape(n, do, kd, ho, kh, wo, kw, ci)
    xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # [N,Do,Ho,Wo,kd,kh,kw,Ci]
    xp = xp.reshape(n, do, ho, wo, kd * kh * kw * ci)
    out = xp @ kernel.reshape(kd * kh * kw * ci, co)
    if bias is not None:
        out = out + bias
    return out


def conv_transpose_d2s(x, kernel, bias=None):
    """VALID transposed conv with window == stride as matmul +
    depth-to-space.

    x: [N, D, H, W, Ci]; kernel: [kd, kh, kw, Ci, Co] (nn.ConvTranspose
    layout, transpose_kernel=False). Equivalent to
    lax.conv_transpose(strides=(kd,kh,kw), 'VALID'): output voxel
    (d*kd+i, h*kh+j, w*kw+l) receives x[d,h,w] . kernel[-1-i,-1-j,-1-l]
    (conv_transpose correlates with the spatially mirrored window).
    """
    kd, kh, kw, ci, co = kernel.shape
    n, d, h, w, c = x.shape
    assert c == ci, (x.shape, kernel.shape)
    kernel = kernel[::-1, ::-1, ::-1]
    kmat = kernel.transpose(3, 0, 1, 2, 4).reshape(ci, kd * kh * kw * co)
    out = x.reshape(-1, ci) @ kmat
    out = out.reshape(n, d, h, w, kd, kh, kw, co)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # interleave taps
    out = out.reshape(n, d * kd, h * kh, w * kw, co)
    if bias is not None:
        out = out + bias
    return out


class S2DConv(nn.Module):
    """Drop-in for ``nn.Conv(features, k, strides=k, padding='VALID')``
    when kernel_size == strides. Param tree (kernel [*k, Ci, Co] +
    bias [Co]) matches nn.Conv — checkpoints interchange freely."""
    features: int
    kernel_size: Tuple[int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kshape = tuple(self.kernel_size) + (x.shape[-1], self.features)
        kernel = self.param("kernel", nn.initializers.he_normal(), kshape,
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return conv_s2d(x.astype(self.dtype), kernel.astype(self.dtype),
                        bias.astype(self.dtype))


class D2SConvTranspose(nn.Module):
    """Drop-in for ``nn.ConvTranspose(features, k, strides=k,
    padding='VALID')`` when kernel_size == strides; params match
    nn.ConvTranspose (kernel [*k, Ci, Co], bias [Co])."""
    features: int
    kernel_size: Tuple[int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kshape = tuple(self.kernel_size) + (x.shape[-1], self.features)
        kernel = self.param("kernel", nn.initializers.he_normal(), kshape,
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return conv_transpose_d2s(x.astype(self.dtype),
                                  kernel.astype(self.dtype),
                                  bias.astype(self.dtype))
