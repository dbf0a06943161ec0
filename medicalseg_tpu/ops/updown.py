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
           "conv_transpose_d2s_z", "conv_s2d_kl",
           "conv_transpose_d2s_kl", "conv_s2d_z_kl",
           "conv_transpose_d2s_z_kl", "supports_s2d", "S2DConv",
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
    """Shapes the s2d matmul form is USED for: fully non-overlapping
    windows (k == s), where the gather/interleave is a pure reshape +
    one MXU matmul (measured 348 -> 340 ms b2 128^3 train).

    The overlapping-z variants (conv_s2d_z / conv_transpose_d2s_z, any
    kz with k[1:] == s[1:]) remain implemented and tested, but the
    round-5 spine A/B removed them from the default route: their tap
    interleave materializes co-minor (lane-padded 8x at C=16)
    intermediates that XLA's own conv/conv_transpose emitters avoid —
    PROBE_UPDOWN default 1226 ms vs s2d 1261 ms per flagship step, with
    the copy/layout row 187 vs 271 ms."""
    k, s = tuple(kernel), tuple(stride)
    return k == s


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


# ----------------------------------------------------------------------
# Kernel-layout [N, D, C, H, W] variants: the all-KL VNet trunk feeds
# the transitions kernel-layout tensors directly (models/vnet.py
# layout_policy='all_kl'), so the up/down matmuls must not round-trip
# through NDHWC — the round-3 profile measured ~16 ms per boundary
# transpose at stage-0 cube scale. The contraction flattens
# (kd, kh, kw, ci) in the same order as the NDHWC path, so numerics
# match it exactly; the channel-interior output order is expressed to
# XLA as einsum output permutations, which fold into the dot's output
# layout instead of materializing copies.
# ----------------------------------------------------------------------
def conv_s2d_kl(xk, kernel, bias=None):
    """conv_s2d on a kernel-layout tensor: [N, D, Ci, H, W] ->
    [N, D/kd, Co, H/kh, W/kw]."""
    kd, kh, kw, ci, co = kernel.shape
    n, d, c, h, w = xk.shape
    assert c == ci, (xk.shape, kernel.shape)
    do, ho, wo = d // kd, h // kh, w // kw
    xp = xk[:, :do * kd, :, :ho * kh, :wo * kw]
    xp = xp.reshape(n, do, kd, ci, ho, kh, wo, kw)
    # contraction axes ordered (kd, kh, kw, ci) to match conv_s2d
    out = jnp.einsum("napcbqdr,pqrco->naobd",
                     xp, kernel)
    if bias is not None:
        out = out + bias.reshape(1, 1, co, 1, 1)
    return out


def conv_transpose_d2s_kl(xk, kernel, bias=None):
    """conv_transpose_d2s on a kernel-layout tensor: [N, D, Ci, H, W]
    -> [N, D*kd, Co, H*kh, W*kw]."""
    kd, kh, kw, ci, co = kernel.shape
    n, d, c, h, w = xk.shape
    assert c == ci, (xk.shape, kernel.shape)
    kernel = kernel[::-1, ::-1, ::-1]
    out = jnp.einsum("ndchw,ijlco->ndiohjwl", xk, kernel)
    out = out.reshape(n, d * kd, co, h * kh, w * kw)
    if bias is not None:
        out = out + bias.reshape(1, 1, co, 1, 1)
    return out


def conv_s2d_z_kl(xk, kernel, z_stride, bias=None):
    """conv_s2d_z on a kernel-layout tensor (overlapping z window,
    non-overlapping h/w windows): [N, D, Ci, H, W] ->
    [N, (D-kd)//sz+1, Co, H/kh, W/kw]."""
    kd, kh, kw, ci, co = kernel.shape
    n, d, c, h, w = xk.shape
    assert c == ci, (xk.shape, kernel.shape)
    sz = int(z_stride)
    do = (d - kd) // sz + 1
    ho, wo = h // kh, w // kw
    xp = xk[:, :, :, :ho * kh, :wo * kw]
    xp = xp.reshape(n, d, ci, ho, kh, wo, kw)
    out = None
    for t in range(kd):
        slab = xp[:, t:t + (do - 1) * sz + 1:sz]
        part = jnp.einsum("nacbqdr,qrco->naobd", slab, kernel[t])
        out = part if out is None else out + part
    if bias is not None:
        out = out + bias.reshape(1, 1, co, 1, 1)
    return out


def conv_transpose_d2s_z_kl(xk, kernel, bias=None):
    """conv_transpose_d2s_z on a kernel-layout tensor (overlapping z
    window, z stride 1): [N, D, Ci, H, W] ->
    [N, D-1+kd, Co, H*kh, W*kw]."""
    kd, kh, kw, ci, co = kernel.shape
    n, d, c, h, w = xk.shape
    assert c == ci, (xk.shape, kernel.shape)
    kernel = kernel[::-1, ::-1, ::-1]
    out = jnp.einsum("ndchw,ijlco->nidohjwl", xk, kernel)
    out = out.reshape(n, kd, d, co, h * kh, w * kw)
    do = d - 1 + kd
    acc = jnp.zeros((n, do, co, h * kh, w * kw), out.dtype)
    for i in range(kd):
        acc = acc.at[:, i:i + d].add(out[:, i])
    if bias is not None:
        acc = acc + bias.reshape(1, 1, co, 1, 1)
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
    layout: str = "ndhwc"  # 'ndhwc' | 'kl' ([N, D, C, H, W] in/out)

    @nn.compact
    def __call__(self, x):
        cin = x.shape[2] if self.layout == "kl" else x.shape[-1]
        kshape = tuple(self.kernel_size) + (cin, self.features)
        kernel = self.param("kernel", nn.initializers.he_normal(), kshape,
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        strides = (tuple(self.strides) if self.strides is not None
                   else tuple(self.kernel_size))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if self.layout == "kl":
            if strides == tuple(self.kernel_size):
                return conv_s2d_kl(x, kernel, bias)
            return conv_s2d_z_kl(x, kernel, strides[0], bias)
        if strides == tuple(self.kernel_size):
            return conv_s2d(x, kernel, bias)
        return conv_s2d_z(x, kernel, strides[0], bias)


class D2SConvTranspose(nn.Module):
    """Drop-in for ``nn.ConvTranspose(features, k, strides=s,
    padding='VALID')`` when k == s, or when the z window overlaps with
    stride 1 (anisotropic spine stages); params match nn.ConvTranspose
    (kernel [*k, Ci, Co], bias [Co])."""
    features: int
    kernel_size: Tuple[int, int, int]
    dtype: Any = jnp.float32
    strides: Any = None  # None -> kernel_size (non-overlapping)
    layout: str = "ndhwc"  # 'ndhwc' | 'kl' ([N, D, C, H, W] in/out)

    @nn.compact
    def __call__(self, x):
        cin = x.shape[2] if self.layout == "kl" else x.shape[-1]
        kshape = tuple(self.kernel_size) + (cin, self.features)
        kernel = self.param("kernel", nn.initializers.he_normal(), kshape,
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        strides = (tuple(self.strides) if self.strides is not None
                   else tuple(self.kernel_size))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if self.layout == "kl":
            if strides == tuple(self.kernel_size):
                return conv_transpose_d2s_kl(x, kernel, bias)
            assert strides[0] == 1, (self.kernel_size, strides)
            return conv_transpose_d2s_z_kl(x, kernel, bias)
        if strides == tuple(self.kernel_size):
            return conv_transpose_d2s(x, kernel, bias)
        assert strides[0] == 1, (self.kernel_size, strides)
        return conv_transpose_d2s_z(x, kernel, bias)
