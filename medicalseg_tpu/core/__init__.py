# Copyright 2026. Apache License 2.0.
from . import infer
from .loader import EvalLoader, TrainLoader
from .state import TrainState, make_eval_step, make_train_step
from .train import train
from .val import evaluate

__all__ = ["train", "evaluate", "infer", "TrainState", "make_train_step",
           "make_eval_step", "TrainLoader", "EvalLoader"]
