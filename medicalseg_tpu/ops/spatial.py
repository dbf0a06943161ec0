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


def _shear_pass(arr, coef, ax, bx, order, cb):
    """1-D resample along ``ax`` at src = x + coef * (idx_bx - cb).

    The two-tap interpolation is expressed as a banded-matrix batched
    matmul (built from iota comparisons — no gather): TPU runs it on
    the MXU, where the equivalent ``map_coordinates`` per-voxel gather
    costs ~150 ms per tap at 512^2x12 (measured: the rotation gathers
    were 6.9 s of an 8.2 s spine train step)."""
    v = jnp.moveaxis(arr, (bx, ax), (-2, -1))
    lead = v.shape[:-2]
    B, A = v.shape[-2], v.shape[-1]
    v2 = v.reshape((-1, B, A))
    xo = jnp.arange(A, dtype=jnp.float32)
    # chunk the [B, A, A] band tensor to ~64 MB
    chunk = max(1, min(B, (1 << 24) // max(1, A * A)))
    while B % chunk:
        chunk -= 1
    outs = []
    for b0 in range(0, B, chunk):
        bs = jnp.arange(b0, b0 + chunk, dtype=jnp.float32)
        src = xo[None, :] + coef * (bs[:, None] - cb)     # [CB, X]
        diff = src[:, :, None] - xo[None, None, :]        # [CB, X, A]
        if order == 0:
            m = ((diff > -0.5) & (diff <= 0.5)).astype(jnp.float32)
        else:
            m = jnp.maximum(0.0, 1.0 - jnp.abs(diff))
        outs.append(jnp.einsum("rba,bxa->rbx", v2[:, b0:b0 + chunk], m))
    out = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    out = out.reshape(lead + (B, A))
    return jnp.moveaxis(out, (-2, -1), (bx, ax))


@functools.partial(jax.jit, static_argnames=("r_plane", "order", "cval"))
def rotate3d_shear(vol, angle, r_plane=(0, 1), order=1, cval=0.0):
    """Gather-free planar rotation: three shear passes on the MXU.

    The scipy rotation matrix [[c, s], [-s, c]] factors into
    Sx(tan(t/2)) . Sy(-sin t) . Sx(tan(t/2)) (valid for |angle| < 90;
    use for augmentation ranges <= 45 deg), each a 1-D banded-matmul
    resample (:func:`_shear_pass`). Boundary semantics match scipy's
    strict ``mode='constant'`` exactly (same `_rotation_coords` valid
    mask); interior values differ from direct bilinear only by the
    extra 1-D interpolation smoothing of the shear decomposition —
    fine for augmentation, ~200x faster than the gather path on TPU.
    ``angle`` may be traced.

    Supports 3-D volumes and 4-D (trailing channel) arrays.
    """
    r_plane = tuple(int(x) for x in r_plane)
    a, b = sorted(r_plane)
    rad = jnp.deg2rad(angle)
    al = jnp.tan(rad / 2.0)
    be = -jnp.sin(rad)
    # the intermediate shear canvases extend past the original frame
    # (content that leaves during pass 1 re-enters by pass 3): run the
    # passes on a padded canvas and crop back. pad >= (sqrt(2)-1)/2 of
    # the plane diagonal covers any |angle| <= 45.
    sa, sb = vol.shape[a], vol.shape[b]
    pad = int(0.21 * (sa + sb) / 2) + 2
    widths = [(0, 0)] * vol.ndim
    widths[a] = (pad, pad)
    widths[b] = (pad, pad)
    ca = (sa - 1) / 2.0 + pad
    cb = (sb - 1) / 2.0 + pad
    out = jnp.pad(vol.astype(jnp.float32), widths)
    out = _shear_pass(out, al, a, b, order, cb)
    out = _shear_pass(out, be, b, a, order, ca)
    out = _shear_pass(out, al, a, b, order, cb)
    sl = [slice(None)] * vol.ndim
    sl[a] = slice(pad, pad + sa)
    sl[b] = slice(pad, pad + sb)
    out = out[tuple(sl)]

    sshape = vol.shape[:3]
    coords = _rotation_coords(sshape, (a, b), angle)
    eps = max(1e-4, 1e-6 * max(sshape[a], sshape[b]))
    valid = ((coords[a] >= -eps) & (coords[a] <= sshape[a] - 1 + eps) &
             (coords[b] >= -eps) & (coords[b] <= sshape[b] - 1 + eps))
    if vol.ndim == 4:
        valid = valid[..., None]
    out = jnp.where(valid, out, cval)
    if jnp.issubdtype(vol.dtype, jnp.integer):
        out = jnp.rint(out)
    return out.astype(vol.dtype)


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
