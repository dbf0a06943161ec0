# Copyright 2026. Apache License 2.0.
from . import logger, metric, train_profiler, visualize
from .checkpoint import (load_checkpoint, load_entire_model,
                         load_pretrained_model, resume, save_checkpoint,
                         save_checkpoint_async, worker_init_fn)
from .compile_cache import enable_compile_cache
from .config_check import config_check
from .download import download_file_and_uncompress
from .env import (DATA_HOME, PRETRAINED_MODEL_HOME, SEG_HOME, TMP_HOME,
                  get_sys_env)
from .loss_utils import loss_computation
from .metric import (accuracy, auc_roc, calculate_area, dice, kappa,
                     mean_iou)
from .progbar import Progbar
from .timer import TimeAverager, calculate_eta
from .utils import get_image_list, save_array, seed_all, strtobool

__all__ = [
    "logger", "metric", "train_profiler", "visualize",
    "TimeAverager", "calculate_eta", "Progbar", "get_sys_env",
    "DATA_HOME", "TMP_HOME", "PRETRAINED_MODEL_HOME", "SEG_HOME",
    "save_checkpoint", "save_checkpoint_async", "load_checkpoint", "load_pretrained_model",
    "load_entire_model", "resume", "worker_init_fn", "config_check",
    "download_file_and_uncompress", "loss_computation", "calculate_area",
    "mean_iou", "dice", "accuracy", "kappa", "auc_roc", "get_image_list",
    "save_array", "seed_all", "strtobool", "enable_compile_cache",
]
