# Copyright 2026. Apache License 2.0.
"""Spatial kernels: flip / crop / planar rotation.

TPU-native replacements for the reference's scipy-backed spatial ops
(medicalseg/transforms/functional.py:61-100). Rotation is an affine warp
through ``jax.scipy.ndimage.map_coordinates`` matching
``scipy.ndimage.rotate(reshape=False)`` conventions; flips with traced
booleans use index-select so a single executable covers all augmentation
draws.
"""

import functools

import jax
import jax.numpy as jnp


def flip3d(vol, axis):
    """Static-axis flip (reference functional.py:80-88)."""
    return jnp.flip(vol, axis=axis)


@jax.jit
def random_flip3d(vol, flip_mask):
    """Flip along each of the three leading axes where ``flip_mask`` is
    true. flip_mask: bool[3], traced — one executable for all 8 variants.
    """
    out = vol
    for axis in range(3):
        flipped = jnp.flip(out, axis=axis)
        out = jnp.where(flip_mask[axis], flipped, out)
    return out


def crop3d(vol, i, j, k, d, h, w):
    """Static crop (reference functional.py:61-77)."""
    return vol[i:i + d, j:j + h, k:k + w]


def _rotation_coords(shape, r_plane, angle_deg):
    """Input-space sample coordinates reproducing scipy.ndimage.rotate.

    scipy builds a 2-D rotation in the plane ``axes=(a, b)`` with
    ``matrix = [[cos, sin], [-sin, cos]]`` and
    ``offset = center - matrix @ center`` (rotate -> affine_transform), so
    input_coord = matrix @ output_coord + offset. ``angle_deg`` may be a
    traced scalar.
    """
    a, b = sorted(r_plane)
    rad = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(rad), jnp.sin(rad)

    coords = []
    for axis in range(len(shape)):
        size = shape[axis]
        view = [1] * len(shape)
        view[axis] = size
        coords.append(jnp.arange(size, dtype=jnp.float32).reshape(view))

    ca = (shape[a] - 1) / 2.0
    cb = (shape[b] - 1) / 2.0
    xa = coords[a] - ca
    xb = coords[b] - cb
    new_a = c * xa + s * xb + ca
    new_b = -s * xa + c * xb + cb

    full = []
    target_shape = shape
    for axis in range(len(shape)):
        if axis == a:
            full.append(jnp.broadcast_to(new_a, target_shape))
        elif axis == b:
            full.append(jnp.broadcast_to(new_b, target_shape))
        else:
            full.append(jnp.broadcast_to(coords[axis], target_shape))
    return full


@functools.partial(jax.jit, static_argnames=("r_plane", "order", "cval"))
def rotate3d(vol, angle, r_plane=(0, 1), order=1, cval=0.0):
    """Rotate ``vol`` by ``angle`` degrees in plane ``r_plane``.

    Matches ``scipy.ndimage.rotate(img, angle, axes=r_plane, order=order,
    reshape=False, cval=cval)`` (reference functional.py:91-100).
    ``angle`` may be traced — random-rotation augmentation reuses one
    compiled executable.

    Supports 3-D volumes and 4-D (trailing channel) arrays.
    """
    r_plane = tuple(int(x) for x in r_plane)
    if vol.ndim == 4:
        return jax.vmap(
            lambda ch: rotate3d(ch, angle, r_plane=r_plane, order=order,
                                cval=cval),
            in_axes=3, out_axes=3)(vol)
    coords = _rotation_coords(vol.shape, r_plane, angle)
    # scipy's mode='constant' is strict: an output point whose *unrounded*
    # coordinate leaves [0, size-1] gets cval outright, for order 0 and 1
    # alike (no edge/cval blending; verified against the scipy oracle).
    # jax's map_coordinates blends, so mask explicitly. The epsilon band
    # absorbs f32-vs-f64 coordinate noise at exact right angles.
    a, b = sorted(r_plane)
    eps = max(1e-4, 1e-6 * max(vol.shape[a], vol.shape[b]))
    valid = ((coords[a] >= -eps) & (coords[a] <= vol.shape[a] - 1 + eps) &
             (coords[b] >= -eps) & (coords[b] <= vol.shape[b] - 1 + eps))
    coords[a] = jnp.clip(coords[a], 0.0, vol.shape[a] - 1)
    coords[b] = jnp.clip(coords[b], 0.0, vol.shape[b] - 1)
    out = jax.scipy.ndimage.map_coordinates(
        vol.astype(jnp.float32), coords, order=order, mode="constant",
        cval=cval)
    out = jnp.where(valid, out, cval)
    if jnp.issubdtype(vol.dtype, jnp.integer):
        out = jnp.rint(out)
    return out.astype(vol.dtype)
