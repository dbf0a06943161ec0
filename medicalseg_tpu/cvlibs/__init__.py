# Copyright 2026. Apache License 2.0.
from . import manager
from .config import Config

__all__ = ["manager", "Config"]
