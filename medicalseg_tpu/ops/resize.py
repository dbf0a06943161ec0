# Copyright 2026. Apache License 2.0.
"""3-D resize (zoom) kernels — the single most-reused op in the framework.

The reference funnels *all* resampling through ``scipy.ndimage.zoom``
(offline spacing resample tools/preprocess_utils/geometry.py:31-69,
Resize3D / RandomResizedCrop3D medicalseg/transforms/functional.py:25-58,
eval reverse-transform medicalseg/core/infer.py:43-59). On TPU we
re-architect it as *separable per-axis interpolation expressed as three
small matmuls* — each axis contraction is an (out, in) weight matrix
applied with ``jnp.einsum``, which XLA tiles onto the MXU instead of
emitting millions of scalar gathers.

Coordinate convention matches scipy's default ``grid_mode=False``:
``src = i * (in - 1) / (out - 1)`` (endpoints aligned), so results agree
with the reference's zoom to within float tolerance for order=1 and
exactly for order=0. Verified against scipy oracles in
tests/test_resize.py.

Two families:
  * :func:`resize3d` — static output shape, static input shape.
  * :func:`crop_resize3d` — fused crop + resize where the crop offsets and
    sizes are *traced* scalars: the interpolation matrices are built
    dynamically (one-hot scatter) so random-crop augmentation never
    triggers an XLA recompile. This replaces the host-side
    RandomResizedCrop3D hot path (reference transform.py:206-339).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

# interp matmuls are tiny; run them in full f32 on the MXU for scipy parity
_P = jax.lax.Precision.HIGHEST


def _scale(in_size, out_size):
    """scipy grid_mode=False zoom coordinate scale (endpoint-aligned)."""
    if out_size == 1:
        return 0.0
    return (in_size - 1) / (out_size - 1)


def _linear_matrix(in_size, out_size, dtype=jnp.float32):
    """Static (out, in) order-1 interpolation matrix (host-built, tiny)."""
    coords = np.arange(out_size) * _scale(in_size, out_size)
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, max(in_size - 2, 0))
    frac = coords - lo
    w = np.zeros((out_size, in_size), dtype=np.float32)
    w[np.arange(out_size), lo] = 1.0 - frac
    w[np.arange(out_size), np.minimum(lo + 1, in_size - 1)] += frac
    return jnp.asarray(w, dtype=dtype)


def _linear_matrix_halfpixel(in_size, out_size, dtype=jnp.float32):
    """Static (out, in) order-1 matrix with HALF-PIXEL coordinates
    (``src = (i + 0.5) * in / out - 0.5``, edges clamped) — the paddle
    ``F.interpolate(align_corners=False)`` / ``jax.image.resize``
    convention, as opposed to :func:`_linear_matrix`'s endpoint-aligned
    scipy zoom convention."""
    coords = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    coords = np.clip(coords, 0.0, in_size - 1)
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, max(in_size - 2, 0))
    frac = coords - lo
    w = np.zeros((out_size, in_size), dtype=np.float32)
    w[np.arange(out_size), lo] = 1.0 - frac
    w[np.arange(out_size), np.minimum(lo + 1, in_size - 1)] += frac
    return jnp.asarray(w, dtype=dtype)


@functools.partial(jax.jit, static_argnames=("size",))
def upsample_trilinear_batch(x, size):
    """Half-pixel trilinear resize of an NDHWC batch via three MXU
    matmuls (jax.image.resize(method='trilinear') parity).

    Built for the deep-supervision aux heads (models/vnet_deepsup.py),
    which upsample (N, d, h, w, C) logits to the full volume every step:
    the per-axis contractions ride the MXU in the compute dtype instead
    of jax.image.resize's gather/weights lowering.

    UPSAMPLE (or identity) only: jax.image.resize anti-aliases when
    minifying (kernel widens by 1/scale), which a fixed 2-tap matrix
    does not reproduce.
    """
    size = tuple(int(s) for s in size)
    n, d, h, w, c = x.shape
    if (d, h, w) == size:
        return x
    if any(o < i for o, i in zip(size, (d, h, w))):
        raise ValueError(
            "upsample_trilinear_batch only upsamples; got {} -> {} "
            "(downscale needs jax.image.resize's anti-aliasing)".format(
                (d, h, w), size))
    dt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    out = x.astype(dt)
    if d != size[0]:
        wd = _linear_matrix_halfpixel(d, size[0], dt)
        out = jnp.einsum("ad,ndhwc->nahwc", wd, out)
    if h != size[1]:
        wh = _linear_matrix_halfpixel(h, size[1], dt)
        out = jnp.einsum("bh,ndhwc->ndbwc", wh, out)
    if w != size[2]:
        ww = _linear_matrix_halfpixel(w, size[2], dt)
        out = jnp.einsum("xw,ndhwc->ndhxc", ww, out)
    return out.astype(x.dtype)


def _nearest_indices(in_size, out_size):
    """Static nearest-neighbour source indices (scipy order=0 parity:
    spline order 0 rounds half-up)."""
    coords = np.arange(out_size) * _scale(in_size, out_size)
    idx = np.floor(coords + 0.5).astype(np.int64)
    return jnp.asarray(np.clip(idx, 0, in_size - 1))


@functools.partial(jax.jit, static_argnames=("size", "order"))
def resize3d(vol, size, order=1):
    """Resize a volume to ``size`` (d, h, w) with endpoint-aligned zoom.

    Args:
        vol: [D, H, W] or [D, H, W, C] array (any float/int dtype).
        size: target (d, h, w) — static.
        order: 1 (trilinear, via three MXU matmuls) or 0 (nearest, via
            three axis gathers — used for label volumes).

    Returns:
        resized array with vol.dtype preserved.
    """
    size = tuple(int(s) for s in size)
    in_dhw = vol.shape[:3]
    if in_dhw == size:
        return vol
    if order == 0:
        out = vol
        for axis in range(3):
            idx = _nearest_indices(in_dhw[axis], size[axis])
            out = jnp.take(out, idx, axis=axis)
        return out
    orig_dtype = vol.dtype
    x = vol.astype(jnp.float32)
    wd = _linear_matrix(in_dhw[0], size[0])
    wh = _linear_matrix(in_dhw[1], size[1])
    ww = _linear_matrix(in_dhw[2], size[2])
    if x.ndim == 3:
        out = jnp.einsum("ad,dhw->ahw", wd, x, precision=_P)
        out = jnp.einsum("bh,ahw->abw", wh, out, precision=_P)
        out = jnp.einsum("cw,abw->abc", ww, out, precision=_P)
    elif x.ndim == 4:
        out = jnp.einsum("ad,dhwc->ahwc", wd, x, precision=_P)
        out = jnp.einsum("bh,ahwc->abwc", wh, out, precision=_P)
        out = jnp.einsum("xw,abwc->abxc", ww, out, precision=_P)
    else:
        raise ValueError("resize3d expects 3-D or 4-D input, got shape {}".
                         format(vol.shape))
    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.rint(out)
    return out.astype(orig_dtype)


def resize3d_batch(vol, size, order=1):
    """Batched resize for [N, D, H, W, C] arrays (vmap over N)."""
    return jax.vmap(lambda v: resize3d(v, size=size, order=order))(vol)


def _dynamic_linear_matrix(in_size, start, crop, out_size, dtype):
    """(out, in) linear interp matrix for a *dynamic* crop window.

    ``start`` (crop offset) and ``crop`` (crop length) are traced int
    scalars; ``in_size``/``out_size`` are static. Row i interpolates the
    source coordinate ``start + i * (crop - 1) / (out - 1)``, built as two
    one-hot scatters — shapes stay static, so no recompilation across
    random crops.
    """
    i = jnp.arange(out_size, dtype=jnp.float32)
    denom = jnp.maximum(out_size - 1, 1).astype(jnp.float32)
    scale = (crop.astype(jnp.float32) - 1.0) / denom
    coords = start.astype(jnp.float32) + i * scale
    hi_limit = (start + crop - 1).astype(jnp.float32)
    coords = jnp.clip(coords, 0.0, jnp.minimum(hi_limit, in_size - 1))
    lo = jnp.floor(coords)
    frac = coords - lo
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, in_size - 1)
    hi_i = jnp.clip(lo_i + 1, 0, in_size - 1)
    cols = jnp.arange(in_size, dtype=jnp.int32)
    w_lo = (cols[None, :] == lo_i[:, None]).astype(dtype) * \
        (1.0 - frac)[:, None].astype(dtype)
    w_hi = (cols[None, :] == hi_i[:, None]).astype(dtype) * \
        frac[:, None].astype(dtype)
    return w_lo + w_hi


def _dynamic_nearest_indices(in_size, start, crop, out_size):
    i = jnp.arange(out_size, dtype=jnp.float32)
    denom = jnp.maximum(out_size - 1, 1).astype(jnp.float32)
    scale = (crop.astype(jnp.float32) - 1.0) / denom
    coords = start.astype(jnp.float32) + i * scale
    idx = jnp.floor(coords + 0.5).astype(jnp.int32)
    return jnp.clip(idx, 0, in_size - 1)


def crop_resize3d(vol, start, crop, size, order=1):
    """Fused crop + resize with traced crop geometry (no recompiles).

    Equivalent to ``resize3d(vol[start:start+crop], size, order)`` but
    ``start``/``crop`` may be traced scalars (jnp int32 arrays of shape
    [3]). The interpolation runs over the *full* input extent with
    dynamically-built weight matrices, trading a modest amount of extra
    FLOPs (on already-tiny matrices) for a single compiled executable
    across all random crops — the TPU-native replacement for the
    reference's scipy crop+zoom (transform.py:325-339).

    Args:
        vol: [D, H, W] or [D, H, W, C].
        start: int32[3] crop offsets (traced ok).
        crop: int32[3] crop lengths (traced ok).
        size: static output (d, h, w).
        order: 1 trilinear or 0 nearest.
    """
    size = tuple(int(s) for s in size)
    start = jnp.asarray(start, dtype=jnp.int32)
    crop = jnp.asarray(crop, dtype=jnp.int32)
    in_dhw = vol.shape[:3]

    if order == 0:
        out = vol
        for axis in range(3):
            idx = _dynamic_nearest_indices(in_dhw[axis], start[axis],
                                           crop[axis], size[axis])
            out = jnp.take(out, idx, axis=axis)
        return out

    orig_dtype = vol.dtype
    x = vol.astype(jnp.float32)
    wd = _dynamic_linear_matrix(in_dhw[0], start[0], crop[0], size[0],
                                jnp.float32)
    wh = _dynamic_linear_matrix(in_dhw[1], start[1], crop[1], size[1],
                                jnp.float32)
    ww = _dynamic_linear_matrix(in_dhw[2], start[2], crop[2], size[2],
                                jnp.float32)
    if x.ndim == 3:
        out = jnp.einsum("ad,dhw->ahw", wd, x, precision=_P)
        out = jnp.einsum("bh,ahw->abw", wh, out, precision=_P)
        out = jnp.einsum("cw,abw->abc", ww, out, precision=_P)
    elif x.ndim == 4:
        out = jnp.einsum("ad,dhwc->ahwc", wd, x, precision=_P)
        out = jnp.einsum("bh,ahwc->abwc", wh, out, precision=_P)
        out = jnp.einsum("xw,abwc->abxc", ww, out, precision=_P)
    else:
        raise ValueError("crop_resize3d expects 3-D or 4-D input, got {}".
                         format(vol.shape))
    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.rint(out)
    return out.astype(orig_dtype)


def resize_to_spacing(vol, spacing, new_spacing=None, new_shape=None,
                      order=1):
    """Spacing-aware resample (reference geometry.py:31-69 semantics:
    spacing / new_spacing / new_shape are all in the volume's own axis
    order). Either ``new_spacing`` (target mm per voxel) or ``new_shape``
    must be given. Returns (resampled, real_new_spacing).
    """
    in_dhw = np.asarray(vol.shape[:3], dtype=np.float64)
    spacing = None if spacing is None else np.asarray(
        spacing, dtype=np.float64)
    if spacing is not None and spacing.size == 4:
        spacing = spacing[1:]
    if new_shape is None:
        if new_spacing is None:
            raise ValueError("Give either new_spacing or new_shape")
        new_spacing = np.asarray(new_spacing, dtype=np.float64)[:3]
        new_shape = np.round(in_dhw * spacing[:3] / new_spacing)
    else:
        new_shape = np.asarray(new_shape, dtype=np.float64)
        if spacing is not None:
            new_spacing = tuple((in_dhw / new_shape) * spacing[:3])
        else:
            new_spacing = None
    out = resize3d(vol, tuple(int(s) for s in new_shape), order=order)
    return out, new_spacing
