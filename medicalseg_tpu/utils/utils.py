# Copyright 2026. Apache License 2.0.
"""General utilities: file discovery, array saving, seeding.

Counterpart of the reference's medicalseg/utils/utils.py grab bag
(get_image_list :142-202, save_array :205-256).
"""

import os
import random

import numpy as np

from .. import io as medio
from . import logger

MEDICAL_SUFFIXES = ("nii.gz", "nii", "dcm", "mhd", "mha", "raw", "npy",
                    "nrrd")


def strtobool(v):
    """argparse-friendly bool: the reference's ``type=bool`` flags parse
    '--flag False' as True (any non-empty string is truthy — its
    val.py:57 wart); this accepts yes/no/true/false/1/0 properly."""
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("y", "yes", "t", "true", "on", "1"):
        return True
    if s in ("n", "no", "f", "false", "off", "0"):
        return False
    import argparse
    raise argparse.ArgumentTypeError(
        "expected a boolean, got {!r}".format(v))


def seed_all(seed=None):
    """Seed python/numpy RNGs and return a jax PRNG key (reference
    train.py:120-123 seeds paddle/np/random)."""
    import jax
    if seed is None:
        return None
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def get_image_list(image_path, valid_suffix=None, filter_key=None):
    """Recursively discover medical image files.

    Mirrors reference utils.py:142-202: ``valid_suffix`` whitelists file
    suffixes (default: all known medical suffixes); ``filter_key`` is a
    dict of {keyword: bool} — a file is kept only if, for every keyword,
    (keyword in basename) == bool.

    Returns a sorted list of file paths (and DICOM directories).
    """
    if valid_suffix is None:
        valid_suffix = MEDICAL_SUFFIXES

    def keep(fname):
        if not any(fname.lower().endswith(s.lower()) for s in valid_suffix):
            return False
        if filter_key is not None:
            for key, val in filter_key.items():
                if (key in fname) != val:
                    return False
        return True

    image_list = []
    if os.path.isfile(image_path):
        if keep(os.path.basename(image_path)):
            image_list.append(image_path)
        else:
            raise FileNotFoundError(
                "{} is not a file with valid suffix {} and filter {}".format(
                    image_path, valid_suffix, filter_key))
    elif os.path.isdir(image_path):
        for root, dirs, fnames in os.walk(image_path):
            for fname in fnames:
                if keep(fname):
                    image_list.append(os.path.join(root, fname))
    else:
        raise FileNotFoundError(
            "`image_path` is not found: {}".format(image_path))

    if len(image_list) == 0:
        raise RuntimeError("There are no images in {}".format(image_path))
    return sorted(image_list)


def save_array(save_path, save_content, form, image_infor):
    """Save a dict of arrays as .npy and/or .nii.gz with original geometry.

    Matches the reference's eval artifact dump (utils.py:205-256 /
    core/val.py:138-154): ``save_content`` maps name -> array (z,y,x),
    ``form`` is an iterable subset of {"npy", "nii.gz"}, ``image_infor``
    holds spacing_resample/origin/direction_resample (xyz) from
    dataset.json.

    Returns the save path.
    """
    if not isinstance(save_content, dict):
        raise TypeError("save_content should be dict, got {}".format(
            type(save_content)))
    os.makedirs(save_path, exist_ok=True)

    for name, content in save_content.items():
        content = np.asarray(content)
        content = np.squeeze(content)
        if "npy" in form:
            np.save(os.path.join(save_path, name + ".npy"), content)
        if "nii.gz" in form or "nii" in form:
            suffix = "nii.gz" if "nii.gz" in form else "nii"
            spacing = image_infor.get(
                "spacing_resample", image_infor.get("spacing", (1, 1, 1)))
            direction = image_infor.get(
                "direction_resample",
                image_infor.get("direction", (1, 0, 0, 0, 1, 0, 0, 0, 1)))
            origin = image_infor.get("origin", (0, 0, 0))
            direction = np.asarray(direction, dtype=np.float64).reshape(-1)
            if direction.size != 9:
                direction = np.eye(3).reshape(-1)
            medio.write_image(
                os.path.join(save_path, "{}.{}".format(name, suffix)),
                content.astype(np.float32)
                if content.dtype == np.float64 else content,
                spacing=tuple(np.asarray(spacing, dtype=np.float64)[:3]),
                origin=tuple(np.asarray(origin, dtype=np.float64)[:3]),
                direction=tuple(direction))
    logger.info("Saved arrays {} to {}".format(
        list(save_content.keys()), save_path))
    return save_path
