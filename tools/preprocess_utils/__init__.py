# Copyright 2026. Apache License 2.0.
"""Preprocessing kernels with a device/CPU backend switch.

Parity target: reference tools/preprocess_utils/__init__.py:1-17 + the
values/geometry modules — a process-global config loaded from
``tools/preprocess_globals.yml`` choosing NumPy vs CuPy. Here the switch
chooses the TPU (jax, :mod:`medicalseg_tpu.ops`) vs host (numpy/scipy)
backend; the jax path streams volumes through fused XLA kernels.

Note: the reference's ``HUNorm`` import bug (prepare_msd.py:64 vs
values.py:67) is fixed by exporting both spellings.
"""

import os

import numpy as np
import yaml

_cfg_path = os.path.join(os.path.dirname(__file__), "..",
                         "preprocess_globals.yml")
global_var = {"use_device": True}
if os.path.exists(_cfg_path):
    with open(_cfg_path) as f:
        loaded = yaml.safe_load(f) or {}
    # accept the reference key 'use_gpu' as an alias for 'use_device'
    if "use_gpu" in loaded:
        global_var["use_device"] = bool(loaded["use_gpu"])
    if "use_device" in loaded:
        global_var["use_device"] = bool(loaded["use_device"])


def use_device():
    return global_var["use_device"]


def set_use_device(flag):
    global_var["use_device"] = bool(flag)


# ---------------------------------------------------------------------------
# value ops (reference values.py:37-87)
# ---------------------------------------------------------------------------

def HUnorm(image, HU_min=-1200, HU_max=600, HU_nan=-2000, multiply_255=True):
    """CT Hounsfield windowing to [0, 255] (or [0, 1])."""
    if use_device():
        from medicalseg_tpu import ops
        out = np.asarray(ops.hu_norm(image, float(HU_min), float(HU_max),
                                     float(HU_nan)))
        return out if multiply_255 else out / 255.0
    image = np.nan_to_num(np.asarray(image, np.float32), nan=HU_nan)
    image = (image - HU_min) / float(HU_max - HU_min)
    np.clip(image, 0.0, 1.0, out=image)
    return image * 255.0 if multiply_255 else image


HUNorm = HUnorm  # reference-bug-compatible alias (prepare_msd.py:64)


def normalize(image, min_val=None, max_val=None):
    """Min-max normalize with optional fixed bounds (values.py:54-64)."""
    if use_device():
        from medicalseg_tpu import ops
        return np.asarray(ops.normalize(image, min_val, max_val))
    image = np.asarray(image, np.float32)
    lo = np.min(image) if min_val is None else min_val
    hi = np.max(image) if max_val is None else max_val
    return np.clip((image - lo) / max(hi - lo, 1e-12), 0.0, 1.0)


def label_remap(label, map_dict=None):
    """Dict-driven label id rewrite (values.py:37-51)."""
    if map_dict is None:
        return np.asarray(label)
    if use_device():
        from medicalseg_tpu import ops
        return np.asarray(ops.label_remap(label, map_dict))
    label = np.asarray(label).copy()
    out = label.copy()
    for src, dst in map_dict.items():
        out[label == src] = dst
    return out


# ---------------------------------------------------------------------------
# geometry ops (reference geometry.py:31-69)
# ---------------------------------------------------------------------------

def resample(image, spacing=None, new_spacing=(1.0, 1.0, 1.0),
             new_shape=None, order=1):
    """Spacing- or shape-driven zoom (reference geometry.py:31-69:
    spacing / new_spacing / new_shape in the volume's own axis order;
    4-D spacings trimmed). Returns (resampled, new_spacing)."""
    if use_device():
        from medicalseg_tpu.ops import resize_to_spacing
        out, real_spacing = resize_to_spacing(
            np.asarray(image), spacing, new_spacing=new_spacing,
            new_shape=new_shape, order=order)
        return np.asarray(out), real_spacing
    import scipy.ndimage
    image = np.asarray(image)
    in_dhw = np.asarray(image.shape[:3], np.float64)
    if spacing is not None:
        spacing = np.asarray(spacing, np.float64)
        if spacing.size == 4:
            spacing = spacing[1:]
    if new_shape is None:
        new_shape = np.round(
            in_dhw * spacing[:3] / np.asarray(new_spacing, np.float64))
    else:
        new_shape = np.asarray(new_shape, np.float64)
        new_spacing = tuple((in_dhw / new_shape) * spacing[:3]) \
            if spacing is not None else None
    out = scipy.ndimage.zoom(image, new_shape / in_dhw, mode="nearest",
                             order=order)
    return out, new_spacing


# ---------------------------------------------------------------------------
# io helpers (reference load_image.py:32-71) — via medicalseg_tpu.io
# ---------------------------------------------------------------------------

def load_series(directory):
    from medicalseg_tpu.io import dicom
    return dicom.read_series(directory)


def add_qform_sform(path):
    """The reference repairs broken nibabel qform/sform headers
    (load_image.py:58-71); our reader falls back to pixdim spacing when
    both codes are 0, so no in-place repair is needed."""
    return path


from .dataset_json import parse_msd_basic_info  # noqa: E402,F401
from .uncompress import uncompressor  # noqa: E402,F401
