# Copyright 2026. Apache License 2.0.
"""Config-driven data transforms.

API-parity layer for reference medicalseg/transforms/transform.py:27-396:
``Compose`` threads (im, label) through the op list, adds the channel
axis and divides by the per-volume max; the random 3-D augmentations
reproduce the reference's sampling logic exactly. These host
implementations are the fallback/eval path — training batches use the
on-device augmentor (:mod:`.device`) that consumes the same transform
objects' parameters.
"""

import collections
import numbers
import random

import numpy as np

from ..cvlibs import manager
from . import functional as F


@manager.TRANSFORMS.add_component
class Compose:
    """Apply a transform list to (im, label) (reference transform.py:27-71).

    Accepts paths (.npy) or arrays; returns (im[1, D, H, W] float, label).
    """

    def __init__(self, transforms):
        if not isinstance(transforms, list):
            raise TypeError("The transforms must be a list!")
        self.transforms = transforms

    def __call__(self, im, label=None):
        if isinstance(im, str):
            im = np.load(im)
        if isinstance(label, str):
            label = np.load(label)
        if im is None:
            raise ValueError("Can't read The image file {}!".format(im))

        for op in self.transforms:
            outputs = op(im, label)
            im = outputs[0]
            if len(outputs) == 2:
                label = outputs[1]
        im = np.expand_dims(im, axis=0)
        if im.max() > 0:
            im = im / im.max()
        return (im, label)


@manager.TRANSFORMS.add_component
class Resize3D:
    """Resize to int (short side) or (d, h, w); label order=0
    (reference transform.py:74-109)."""

    def __init__(self, size, order=1):
        if isinstance(size, int):
            self.size = size
        elif isinstance(size, collections.abc.Iterable) and len(size) == 3:
            self.size = tuple(size)
        else:
            raise ValueError("Unknown inputs for size: {}".format(size))
        self.order = order

    def __call__(self, img, label=None):
        img = F.resize_3d(img, self.size, self.order)
        if label is not None:
            label = F.resize_3d(label, self.size, 0)
        return img, label


@manager.TRANSFORMS.add_component
class RandomRotation3D:
    """Uniform angle in +-degrees, random plane from rotate_planes
    (reference transform.py:112-166)."""

    def __init__(self, degrees, rotate_planes=None):
        if isinstance(degrees, numbers.Number):
            if degrees < 0:
                raise ValueError(
                    "If degrees is a single number, it must be positive.")
            self.degrees = (-degrees, degrees)
        else:
            if len(degrees) != 2:
                raise ValueError(
                    "If degrees is a sequence, it must be of len 2.")
            self.degrees = tuple(degrees)
        self.rotate_planes = rotate_planes or [[0, 1], [0, 2], [1, 2]]

    def get_params(self, degrees):
        angle = random.uniform(degrees[0], degrees[1])
        r_plane = self.rotate_planes[random.randint(
            0, len(self.rotate_planes) - 1)]
        return angle, r_plane

    def __call__(self, img, label=None):
        angle, r_plane = self.get_params(self.degrees)
        img = F.rotate_3d(img, r_plane, angle)
        if label is not None:
            # reference rotates labels with the default order=1 as well
            # (transform.py:163-165); int dtype rounds after the warp
            label = F.rotate_3d(label, r_plane, angle)
        return img, label


@manager.TRANSFORMS.add_component
class RandomFlip3D:
    """Probability-gated flip along a random axis
    (reference transform.py:169-203)."""

    def __init__(self, prob=0.5, flip_axis=None):
        self.prob = prob
        self.flip_axis = flip_axis if flip_axis is not None else [0, 1, 2]

    def __call__(self, img, label=None):
        if isinstance(self.flip_axis, (tuple, list)):
            flip_axis = self.flip_axis[random.randint(
                0, len(self.flip_axis) - 1)]
        else:
            flip_axis = self.flip_axis
        if random.random() < self.prob:
            img = F.flip_3d(img, axis=flip_axis)
            if label is not None:
                label = F.flip_3d(label, axis=flip_axis)
        return img, label


@manager.TRANSFORMS.add_component
class RandomResizedCrop3D:
    """Random scale/aspect 3-D crop then resize to ``size``
    (reference transform.py:206-339), including the ``pre_crop`` /
    ``nonzero_mask`` sliding-window-style modes.
    """

    def __init__(self, size, scale=(0.8, 1.2), ratio=(3. / 4., 4. / 3.),
                 interpolation=1, pre_crop=False, nonzero_mask=False):
        if isinstance(size, (tuple, list)):
            assert len(size) == 3, (
                "Size must contain THREE number when it is a tuple or "
                "list, got {}.".format(len(size)))
            self.size = tuple(size)
        elif isinstance(size, int):
            self.size = (size, size, size)
        else:
            raise TypeError(
                "Size must be a list or tuple or int, got {}.".format(
                    type(size)))
        self.interpolation = interpolation
        self.scale = scale
        self.ratio = ratio
        self.pre_crop = pre_crop
        self.nonzero_mask = nonzero_mask

    def get_params(self, img, scale, ratio):
        """10-attempt rejection sampling + center-cube fallback
        (reference transform.py:242-277)."""
        params_ret = collections.namedtuple(
            "params_ret", ["i", "j", "k", "d", "h", "w"])
        for _ in range(10):
            volume = img.shape[0] * img.shape[1] * img.shape[2]
            target_volume = random.uniform(*scale) * volume
            aspect_ratio = random.uniform(*ratio)

            d = int(round((target_volume * aspect_ratio) ** (1 / 3)))
            h = int(round((target_volume / aspect_ratio) ** (1 / 3)))
            w = img.shape[2]

            if random.random() < 0.5:
                d, h, w = random.sample([d, h, w], k=3)

            if w <= img.shape[2] and h <= img.shape[1] and \
                    d <= img.shape[0]:
                i = random.randint(0, img.shape[0] - d)
                j = random.randint(0, img.shape[1] - h)
                k = random.randint(0, img.shape[2] - w)
                return params_ret(i, j, k, d, h, w)

        # Fallback: central cube of the short side
        w = min(img.shape[0], img.shape[1], img.shape[2])
        i = (img.shape[0] - w) // 2
        j = (img.shape[1] - w) // 2
        k = (img.shape[2] - w) // 2
        return params_ret(i, j, k, w, w, w)

    def pre_crop_util(self, img, label=None):
        """Optional near-target-size pre-crop, optionally restricted to
        the label-nonzero bbox (reference transform.py:279-323)."""
        if not self.pre_crop:
            return img, label
        crop_size = (np.random.uniform(
            low=self.scale[0], high=self.scale[1], size=3) *
            self.size).round().astype("int")

        if self.nonzero_mask:
            mask_voxel_coords = np.where(label != 0)
            minz = int(np.min(mask_voxel_coords[0]))
            maxz = int(np.max(mask_voxel_coords[0])) + 1
            miny = int(np.min(mask_voxel_coords[1]))
            maxy = int(np.max(mask_voxel_coords[1])) + 1
            minx = int(np.min(mask_voxel_coords[2]))
            maxx = int(np.max(mask_voxel_coords[2])) + 1
            masked_shape = np.array(
                [maxz - minz, maxy - miny, maxx - minx])
            crop_z, crop_y, crop_x = np.minimum(masked_shape, crop_size)
            z_start = np.random.randint(
                masked_shape[0] - crop_z + 1) + minz
            y_start = np.random.randint(
                masked_shape[1] - crop_y + 1) + miny
            x_start = np.random.randint(
                masked_shape[2] - crop_x + 1) + minx
        else:
            crop_z, crop_y, crop_x = np.minimum(img.shape[:3], crop_size)
            z_start = np.random.randint(img.shape[0] - crop_z + 1)
            y_start = np.random.randint(img.shape[1] - crop_y + 1)
            x_start = np.random.randint(img.shape[2] - crop_x + 1)

        img = img[z_start:z_start + crop_z, y_start:y_start + crop_y,
                  x_start:x_start + crop_x]
        if label is not None:
            label = label[z_start:z_start + crop_z,
                          y_start:y_start + crop_y,
                          x_start:x_start + crop_x]
        return img, label

    def __call__(self, img, label=None):
        img, label = self.pre_crop_util(img, label)
        i, j, k, d, h, w = self.get_params(img, self.scale, self.ratio)
        img = F.resized_crop_3d(img, i, j, k, d, h, w, self.size,
                                self.interpolation)
        if label is not None:
            label = F.resized_crop_3d(label, i, j, k, d, h, w, self.size, 0)
        return img, label


@manager.TRANSFORMS.add_component
class BinaryMaskToConnectComponent:
    """Binary mask -> components labeled 1..k by decreasing volume
    (reference transform.py:342-368)."""

    def __init__(self, minimum_volume=0):
        self.minimum_volume = minimum_volume

    def __call__(self, pred, label=None):
        pred = F.extract_connect_compoent(pred, self.minimum_volume)
        if label is not None:
            label = F.extract_connect_compoent(label, self.minimum_volume)
        return pred, label


@manager.TRANSFORMS.add_component
class TopkLargestConnectComponent:
    """Keep the k largest components (reference transform.py:371-396)."""

    def __init__(self, k=1):
        self.k = k

    def __call__(self, pred, label=None):
        pred = F.extract_connect_compoent(pred)
        pred[pred > self.k] = 0
        return pred, label
