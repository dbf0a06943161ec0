# Copyright 2026. Apache License 2.0.
"""On-device batched augmentation — the TPU training hot path.

The reference augments per-sample on host CPU workers (scipy zoom/rotate
inside paddle DataLoader workers, SURVEY §3.1), which starves an
accelerator at 3-D volume sizes. Here the loader only stacks raw phase0
volumes; augmentation runs *on device inside one jitted function* with
per-example PRNG keys:

  * RandomResizedCrop3D -> fused dynamic crop+resize (ops.crop_resize3d,
    one executable for every random crop geometry), including the
    pre_crop / nonzero_mask modes (reference transform.py:279-323);
  * RandomRotation3D    -> affine warp, lax.switch over the three planes;
  * RandomFlip3D        -> traced-boolean index flips;
  * Resize3D            -> static separable resize;

followed by Compose's channel-add + divide-by-max tail
(reference transform.py:62-69). Sampling distributions replicate the
reference's host logic (transform.py:242-277 rejection sampling included).
"""

import functools

import jax
import jax.numpy as jnp

from .. import ops
from . import transform as T


def supports(transforms):
    """True when every transform in the list has a device implementation."""
    return all(isinstance(t, (T.RandomResizedCrop3D, T.RandomRotation3D,
                              T.RandomFlip3D, T.Resize3D))
               for t in transforms)


def _sample_crop_params(key, in_shape, scale, ratio):
    """jax version of RandomResizedCrop3D.get_params (reference
    transform.py:242-277): 10 vectorized rejection attempts, center-cube
    fallback. ``in_shape`` may be a static tuple or a traced int32[3]
    (the pre_crop path feeds the sampled pre-crop extent through).
    Returns (start[3] int32, crop[3] int32)."""
    kd, kv, ka, kp, ko = jax.random.split(key, 5)
    n_att = 10
    in_shape_f = jnp.asarray(in_shape, jnp.float32)
    volume = jnp.prod(in_shape_f)
    tv = jax.random.uniform(kv, (n_att,), minval=scale[0],
                            maxval=scale[1]) * volume
    ar = jax.random.uniform(ka, (n_att,), minval=ratio[0], maxval=ratio[1])
    d = jnp.round((tv * ar) ** (1 / 3))
    h = jnp.round((tv / ar) ** (1 / 3))
    w = jnp.full((n_att,), in_shape_f[2])
    dhw = jnp.stack([d, h, w], axis=1)  # (n_att, 3)

    # with p=0.5, a random permutation of (d, h, w)
    do_perm = jax.random.bernoulli(kp, 0.5, (n_att,))
    perms = jax.vmap(lambda k: jax.random.permutation(k, 3))(
        jax.random.split(kd, n_att))
    identity = jnp.broadcast_to(jnp.arange(3), (n_att, 3))
    order = jnp.where(do_perm[:, None], perms, identity)
    dhw = jnp.take_along_axis(dhw, order, axis=1).astype(jnp.int32)

    valid = jnp.all(dhw <= jnp.asarray(in_shape, jnp.int32)[None, :],
                    axis=1) & jnp.all(dhw >= 1, axis=1)
    first = jnp.argmax(valid)  # first valid attempt
    any_valid = jnp.any(valid)

    chosen = dhw[first]
    # random offsets in [0, shape - crop]
    max_off = jnp.asarray(in_shape, jnp.int32) - chosen
    u = jax.random.uniform(ko, (3,))
    start = jnp.floor(u * (max_off + 1).astype(jnp.float32)).astype(
        jnp.int32)

    # fallback: central cube with side = min(shape)
    side = jnp.min(jnp.asarray(in_shape, jnp.int32))
    fb_crop = jnp.full((3,), side, jnp.int32)
    fb_start = (jnp.asarray(in_shape, jnp.int32) - side) // 2

    crop = jnp.where(any_valid, chosen, fb_crop)
    start = jnp.where(any_valid, start, fb_start)
    return start, crop


def _nonzero_bbox(label):
    """(start[3], extent[3]) of the label-nonzero bounding box.

    Matches the host pre_crop_util bbox (reference transform.py:297-306),
    except an all-zero label falls back to the full extent instead of
    crashing (the reference raises on np.min of an empty index list).
    """
    nz = label != 0
    any_voxels = jnp.any(nz)
    starts, extents = [], []
    for ax in range(3):
        other = tuple(a for a in range(3) if a != ax)
        line = jnp.any(nz, axis=other)
        n = line.shape[0]
        idx = jnp.arange(n)
        lo = jnp.min(jnp.where(line, idx, n))
        hi = jnp.max(jnp.where(line, idx, -1)) + 1
        lo = jnp.where(any_voxels, lo, 0).astype(jnp.int32)
        hi = jnp.where(any_voxels, hi, n).astype(jnp.int32)
        starts.append(lo)
        extents.append(hi - lo)
    return jnp.stack(starts), jnp.stack(extents)


def _sample_pre_crop(t, key, img_shape, label):
    """Device port of pre_crop_util (reference transform.py:279-323):
    sample a near-target-size window, optionally confined to the
    label-nonzero bbox. Returns (start[3], crop[3]) int32 (traced)."""
    ku, ko = jax.random.split(key)
    target = jnp.asarray(t.size, jnp.float32)
    crop_size = jnp.round(
        jax.random.uniform(ku, (3,), minval=t.scale[0],
                           maxval=t.scale[1]) * target).astype(jnp.int32)
    if t.nonzero_mask:
        base, extent = _nonzero_bbox(label)
    else:
        base = jnp.zeros((3,), jnp.int32)
        extent = jnp.asarray(img_shape, jnp.int32)
    crop = jnp.minimum(extent, crop_size)
    u = jax.random.uniform(ko, (3,))
    offset = jnp.floor(u * (extent - crop + 1).astype(jnp.float32)).astype(
        jnp.int32)
    return base + offset, crop


def _apply_crop(t, key, img, label):
    if t.pre_crop:
        # two-stage crop composed into ONE fused crop+resize: the random
        # scale/aspect window is sampled inside the pre-crop extent, then
        # offset back into full-volume coordinates.
        kp, kc = jax.random.split(key)
        pre_start, pre_crop = _sample_pre_crop(t, kp, img.shape[:3], label)
        start, crop = _sample_crop_params(kc, pre_crop, t.scale, t.ratio)
        start = pre_start + start
    else:
        start, crop = _sample_crop_params(key, img.shape[:3], t.scale,
                                          t.ratio)
    img = ops.crop_resize3d(img, start, crop, t.size,
                            order=t.interpolation)
    if label is not None:
        label = ops.crop_resize3d(label, start, crop, t.size, order=0)
    return img, label


def _apply_rotation(t, key, img, label):
    ka, kp = jax.random.split(key)
    angle = jax.random.uniform(ka, (), minval=t.degrees[0],
                               maxval=t.degrees[1])
    planes = [tuple(p) for p in t.rotate_planes]
    idx = jax.random.randint(kp, (), 0, len(planes))
    # |angle| <= 45: three-shear banded-matmul rotation (MXU, no
    # gathers — map_coordinates' per-voxel gathers measured 6.9 s of
    # an 8.2 s spine train step). Wider ranges keep the exact path.
    shear = max(abs(t.degrees[0]), abs(t.degrees[1])) <= 45
    rot = ops.rotate3d_shear if shear else ops.rotate3d

    def branch(plane):
        def fn(args):
            im, lab = args
            im = rot(im, angle, r_plane=plane, order=1)
            if lab is not None:
                # reference rotates labels with the default order=1 too
                # (transform.py:163-165); int dtype rounds after warp.
                lab = rot(lab, angle, r_plane=plane, order=1)
            return im, lab
        return fn

    img, label = jax.lax.switch(idx, [branch(p) for p in planes],
                                (img, label))
    return img, label


def _apply_flip(t, key, img, label):
    kp, ka = jax.random.split(key)
    do_flip = jax.random.bernoulli(kp, t.prob)
    axis_choices = jnp.asarray(t.flip_axis if isinstance(
        t.flip_axis, (list, tuple)) else [t.flip_axis], jnp.int32)
    axis = axis_choices[jax.random.randint(ka, (), 0, len(axis_choices))]
    mask = (jnp.arange(3) == axis) & do_flip
    img = ops.random_flip3d(img, mask)
    if label is not None:
        label = ops.random_flip3d(label, mask)
    return img, label


def _apply_resize(t, img, label):
    size = t.size if isinstance(t.size, tuple) else (t.size,) * 3
    img = ops.resize3d(img, size, order=t.order)
    if label is not None:
        label = ops.resize3d(label, size, order=0)
    return img, label


class DeviceAugmentor:
    """Jitted batched augmentation built from a transform list.

    Call with ([N, D, H, W] images, [N, D, H, W] int labels, PRNG key);
    returns ([N, d, h, w, 1] float32 in [0, 1], [N, d, h, w] int32) —
    the Compose contract (channel axis + divide-by-max) in NDHWC.
    """

    def __init__(self, transforms):
        if not supports(transforms):
            raise ValueError(
                "DeviceAugmentor only supports RandomResizedCrop3D/"
                "RandomRotation3D/RandomFlip3D/Resize3D, got {}".format(
                    [type(t).__name__ for t in transforms]))
        self.transforms = list(transforms)
        self._jitted = jax.jit(self._augment_batch)

    def _augment_one(self, img, label, key):
        keys = jax.random.split(key, max(len(self.transforms), 1))
        for t, k in zip(self.transforms, keys):
            if isinstance(t, T.RandomResizedCrop3D):
                img, label = _apply_crop(t, k, img, label)
            elif isinstance(t, T.RandomRotation3D):
                img, label = _apply_rotation(t, k, img, label)
            elif isinstance(t, T.RandomFlip3D):
                img, label = _apply_flip(t, k, img, label)
            elif isinstance(t, T.Resize3D):
                img, label = _apply_resize(t, img, label)
        img = ops.scale_by_max(img.astype(jnp.float32))
        return img[..., None], label

    def _augment_batch(self, images, labels, key):
        n = images.shape[0]
        keys = jax.random.split(key, n)
        img, lab = jax.vmap(self._augment_one)(
            images, labels.astype(jnp.int32), keys)
        return img, lab

    def __call__(self, images, labels, key):
        return self._jitted(images, labels, key)
