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

__all__ = ["conv_s2d", "conv_transpose_d2s", "conv_s2d_z",
           "conv_transpose_d2s_z", "supports_s2d", "S2DConv",
           "D2SConvTranspose"]


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


def supports_s2d(kernel, stride):
    """Shapes the matmul reformulations cover: spatial (h, w) windows
    must be non-overlapping (k == s); the z axis may overlap (any kz
    for the down conv; kz >= sz == 1 for the transposed conv, the
    anisotropic V-Net spine stages, e.g. kernel (4,2,2) stride
    (1,2,2))."""
    k, s = tuple(kernel), tuple(stride)
    return k[1:] == s[1:]


def conv_s2d_z(x, kernel, z_stride, bias=None):
    """VALID conv with overlapping z window (kz != sz allowed) and
    non-overlapping (h, w) windows, as space-to-depth + kz accumulated
    MXU matmuls (one per z tap, contraction depth kh*kw*Ci each).

    Equivalent to lax.conv_general_dilated(strides=(sz,kh,kw), VALID).
    The reference's anisotropic spine stages use kernel [4,2,2] /
    stride [1,2,2] (reference configs/mri_spine_seg/*_15k.yml:8-9);
    the stock XLA conv runs them lane-starved at C=16.
    """
    kd, kh, kw, ci, co = kernel.shape
    n, d, h, w, c = x.shape
    assert c == ci, (x.shape, kernel.shape)
    sz = int(z_stride)
    do = (d - kd) // sz + 1
    ho, wo = h // kh, w // kw
    x = x[:, :, :ho * kh, :wo * kw]
    xp = x.reshape(n, d, ho, kh, wo, kw, ci)
    xp = xp.transpose(0, 1, 2, 4, 3, 5, 6)  # [N,D,Ho,Wo,kh,kw,Ci]
    xp = xp.reshape(n, d, ho, wo, kh * kw * ci)
    kmat = kernel.reshape(kd, kh * kw * ci, co)
    out = None
    for t in range(kd):
        slab = xp[:, t:t + (do - 1) * sz + 1:sz]
        part = slab @ kmat[t]
        out = part if out is None else out + part
    if bias is not None:
        out = out + bias
    return out


def conv_transpose_d2s_z(x, kernel, bias=None):
    """VALID transposed conv with overlapping z window (kz >= 1,
    z stride 1) and non-overlapping (h, w) windows: one MXU matmul to
    kz * kh * kw * Co lanes, depth-to-space on (h, w), shifted adds
    over the kz overlapping z taps. Output z extent is d - 1 + kz
    (lax.conv_transpose VALID shape math).
    """
    kd, kh, kw, ci, co = kernel.shape
    n, d, h, w, c = x.shape
    assert c == ci, (x.shape, kernel.shape)
    kernel = kernel[::-1, ::-1, ::-1]
    kmat = kernel.transpose(3, 0, 1, 2, 4).reshape(ci, kd * kh * kw * co)
    out = x.reshape(-1, ci) @ kmat
    out = out.reshape(n, d, h, w, kd, kh, kw, co)
    out = out.transpose(0, 4, 1, 2, 5, 3, 6, 7)  # [N,kd,D,H,kh,W,kw,Co]
    out = out.reshape(n, kd, d, h * kh, w * kw, co)
    do = d - 1 + kd
    acc = jnp.zeros((n, do, h * kh, w * kw, co), out.dtype)
    for i in range(kd):
        acc = acc.at[:, i:i + d].add(out[:, i])
    if bias is not None:
        acc = acc + bias
    return acc


class S2DConv(nn.Module):
    """Drop-in for ``nn.Conv(features, k, strides=s, padding='VALID')``
    when supports_s2d(k, s) (k == s, or z overlapping with any sz).
    Param tree (kernel [*k, Ci, Co] + bias [Co]) matches nn.Conv —
    checkpoints interchange freely."""
    features: int
    kernel_size: Tuple[int, int, int]
    dtype: Any = jnp.float32
    strides: Any = None  # None -> kernel_size (non-overlapping)

    @nn.compact
    def __call__(self, x):
        kshape = tuple(self.kernel_size) + (x.shape[-1], self.features)
        kernel = self.param("kernel", nn.initializers.he_normal(), kshape,
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        strides = (tuple(self.strides) if self.strides is not None
                   else tuple(self.kernel_size))
        if strides == tuple(self.kernel_size):
            return conv_s2d(x.astype(self.dtype),
                            kernel.astype(self.dtype),
                            bias.astype(self.dtype))
        return conv_s2d_z(x.astype(self.dtype), kernel.astype(self.dtype),
                          strides[0], bias.astype(self.dtype))


class D2SConvTranspose(nn.Module):
    """Drop-in for ``nn.ConvTranspose(features, k, strides=s,
    padding='VALID')`` when k == s, or when the z window overlaps with
    stride 1 (anisotropic spine stages); params match nn.ConvTranspose
    (kernel [*k, Ci, Co], bias [Co])."""
    features: int
    kernel_size: Tuple[int, int, int]
    dtype: Any = jnp.float32
    strides: Any = None  # None -> kernel_size (non-overlapping)

    @nn.compact
    def __call__(self, x):
        kshape = tuple(self.kernel_size) + (x.shape[-1], self.features)
        kernel = self.param("kernel", nn.initializers.he_normal(), kshape,
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        strides = (tuple(self.strides) if self.strides is not None
                   else tuple(self.kernel_size))
        if strides == tuple(self.kernel_size):
            return conv_transpose_d2s(x.astype(self.dtype),
                                      kernel.astype(self.dtype),
                                      bias.astype(self.dtype))
        assert strides[0] == 1, (self.kernel_size, strides)
        return conv_transpose_d2s_z(x.astype(self.dtype),
                                    kernel.astype(self.dtype),
                                    bias.astype(self.dtype))
