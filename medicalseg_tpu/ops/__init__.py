# Copyright 2026. Apache License 2.0.
"""TPU compute kernels: resize/zoom, intensity, spatial warp, windowed
inference. These are the device-side replacements for the reference's
scipy / CuPy / Paddle-functional compute (SURVEY §2.4-2.5)."""

from .intensity import (fixed_norm, hu_norm, label_remap, min_max_norm,
                        normalize, scale_by_max)
from .pallas_kernels import hu_norm_resize
from .resize import (crop_resize3d, resize3d, resize3d_batch,
                     resize_to_spacing)
from .spatial import (crop3d, flip3d, random_flip3d, rotate3d,
                      rotate3d_shear)

__all__ = [
    "hu_norm", "min_max_norm", "fixed_norm", "normalize", "label_remap",
    "scale_by_max", "resize3d", "resize3d_batch", "crop_resize3d",
    "resize_to_spacing", "flip3d", "random_flip3d", "crop3d", "rotate3d",
    "rotate3d_shear",
    "hu_norm_resize",
]
