# Copyright 2026. Apache License 2.0.
from .losses import BCELoss, CrossEntropyLoss, DiceLoss, MixedLoss
from .vnet import VNet
from .vnet_deepsup import VNetDeepSup

__all__ = ["VNet", "VNetDeepSup", "DiceLoss", "CrossEntropyLoss",
           "BCELoss", "MixedLoss"]
