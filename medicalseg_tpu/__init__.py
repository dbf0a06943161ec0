# Copyright 2026. Apache License 2.0.
"""medicalseg_tpu — a TPU-native volumetric medical-image segmentation
framework (JAX/XLA/pjit), providing the full capability surface of
PaddleCV-SIG/MedicalSeg: offline preprocessing, config-driven training
with on-device 3-D augmentation, evaluation with per-class Dice, export,
and batch-serving deployment.
"""

__version__ = "0.1.0"

from . import cvlibs, datasets, models, ops, parallel, transforms, utils

__all__ = ["cvlibs", "models", "datasets", "transforms", "ops", "parallel",
           "utils", "__version__"]
