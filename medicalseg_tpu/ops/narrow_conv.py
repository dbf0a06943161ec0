# Copyright 2026. Apache License 2.0.
"""MXU-friendly narrow-output 3-D convolution.

The segmentation head's 5^3 conv down to num_classes (C_out=3) is the
single hottest op of the VNet forward on TPU (profiled: ~47 ms of an
~85 ms forward): with only 3 output channels it can't fill the MXU's
128-wide output tile and XLA lowers it to a VPU loop; zero-padding
C_out to 128 just moves the waste onto the MXU (measured: no faster).

This reformulation reassociates the convolution so the MXU's M dimension
is filled by (kh, kw, c_out) TRIPLES instead of c_out alone:

  partial[kd][(kh,kw,c), d, h', w'] = sum_ci W[kd,kh,kw,ci,c] * x[ci,d,h',w']

— one [25*C_out, C_in] x [C_in, voxels] matmul per kd plane (5 total),
followed by 125 statically-shifted slice-adds that place each
(kd,kh,kw) partial onto the output window:

  out[c,d,h,w] += partial[kd][(kh,kw,c), d+kd, h+kh, w+kw]

The matmuls fill the MXU (M=25*C_out~75, N=millions of voxels); the
accumulation is pure HBM-bound VPU adds. Numerics: identical sums,
reassociated; accumulation in f32.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def narrow_conv3d_same(x, kernel, bias=None, compute_dtype=jnp.bfloat16):
    """SAME, stride-1 3-D conv optimized for tiny C_out.

    Args:
        x: [N, D, H, W, C_in].
        kernel: [kd, kh, kw, C_in, C_out] (odd spatial dims).
        bias: optional [C_out].
        compute_dtype: matmul dtype (accumulation f32).

    Returns [N, D, H, W, C_out] in compute_dtype.
    """
    n, d, h, w, cin = x.shape
    kd, kh, kw, _, cout = kernel.shape
    pd, ph, pw = kd // 2, kh // 2, kw // 2

    xp = jnp.pad(x, ((0, 0), (pd, pd), (ph, ph), (pw, pw), (0, 0)))
    dp, hp, wp = d + 2 * pd, h + 2 * ph, w + 2 * pw

    # [kd, (kh*kw*cout), cin]
    wmat = jnp.transpose(kernel, (0, 1, 2, 4, 3)).reshape(
        kd, kh * kw * cout, cin).astype(compute_dtype)
    xp_c_major = jnp.moveaxis(xp, -1, 1).astype(compute_dtype)
    # flatten voxels: [N, cin, dp*hp*wp]
    xflat = xp_c_major.reshape(n, cin, dp * hp * wp)

    out = jnp.zeros((n, cout, d, h, w), jnp.float32)
    for ikd in range(kd):
        # [N, kh*kw*cout, dp*hp*wp] — one MXU matmul per kd plane
        partial = jnp.einsum("tc,ncm->ntm", wmat[ikd], xflat,
                             preferred_element_type=jnp.float32)
        partial = partial.reshape(n, kh, kw, cout, dp, hp, wp)
        for ikh in range(kh):
            for ikw in range(kw):
                out = out + jax.lax.slice(
                    partial,
                    (0, ikh, ikw, 0, ikd, ikh, ikw),
                    (n, ikh + 1, ikw + 1, cout, ikd + d, ikh + h,
                     ikw + w)).reshape(n, cout, d, h, w)
    out = jnp.moveaxis(out, 1, -1)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(compute_dtype)
