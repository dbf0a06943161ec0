# Copyright 2026. Apache License 2.0.
"""YAML config system.

Parity target: reference medicalseg/cvlibs/config.py:29-429. Keeps the
exact YAML schema — recursive ``_base_:`` inheritance with deep merge and
``_inherited_: False`` opt-out, CLI overrides for lr/batch_size/iters,
reflective component instantiation from ``type:`` keys through the five
registries, loss types x coef broadcast with ignore_index stitching,
num_classes inference from datasets, ``data_root`` joining, export config
and to_static flags — while the *builders* produce TPU-native objects:

  * ``.model``      -> a Flax module (functional; params live in a
                       TrainState). SyncBatchNorm conversion is
                       unnecessary: batch stats are computed globally
                       under the sharded jit (SURVEY §2.8).
  * ``.lr_scheduler`` -> an optax schedule (step -> lr).
  * ``.optimizer``  -> an optax GradientTransformation (paired with the
                       schedule; paddle-style coupled L2 weight decay).
  * ``.loss``       -> {'types': [loss callables], 'coef': [...]} usable
                       inside the jitted step.
"""

import codecs
import os
import warnings
from typing import Any, Dict

import yaml

import optax

from ..utils import logger
from . import manager


class Config:
    """See module docstring. ``Config(path, learning_rate, batch_size,
    iters)`` mirrors reference config.py:71-92."""

    def __init__(self,
                 path: str,
                 learning_rate: float = None,
                 batch_size: int = None,
                 iters: int = None):
        if not path:
            raise ValueError("Please specify the configuration file path.")
        if not os.path.exists(path):
            raise FileNotFoundError("File {} does not exist".format(path))

        self._model = None
        self._losses = None
        self._train_dataset = None
        self._val_dataset = None
        if path.endswith("yml") or path.endswith("yaml"):
            self.dic = self._parse_from_yaml(path)
        else:
            raise RuntimeError("Config file should in yaml format!")

        self.update(
            learning_rate=learning_rate, batch_size=batch_size, iters=iters)

    # ------------------------------------------------------------------
    # YAML parsing (reference config.py:94-126)
    # ------------------------------------------------------------------
    def _update_dic(self, dic, base_dic):
        """Deep-merge ``dic`` onto ``base_dic``; ``_inherited_: False``
        cuts inheritance."""
        base_dic = base_dic.copy()
        dic = dic.copy()

        if dic.get("_inherited_", True) is False:
            dic.pop("_inherited_")
            return dic

        for key, val in dic.items():
            if isinstance(val, dict) and key in base_dic and isinstance(
                    base_dic[key], dict):
                base_dic[key] = self._update_dic(val, base_dic[key])
            else:
                base_dic[key] = val
        return base_dic

    def _parse_from_yaml(self, path: str):
        with codecs.open(path, "r", "utf-8") as file:
            dic = yaml.load(file, Loader=yaml.FullLoader)

        if "_base_" in dic:
            cfg_dir = os.path.dirname(path)
            base_path = dic.pop("_base_")
            base_path = os.path.join(cfg_dir, base_path)
            base_dic = self._parse_from_yaml(base_path)
            dic = self._update_dic(dic, base_dic)
        return dic

    def update(self, learning_rate=None, batch_size=None, iters=None):
        """CLI overrides (reference config.py:128-143)."""
        if learning_rate:
            if "lr_scheduler" in self.dic:
                self.dic["lr_scheduler"]["learning_rate"] = learning_rate
            else:
                self.dic.setdefault("learning_rate",
                                    {})["value"] = learning_rate
        if batch_size:
            self.dic["batch_size"] = batch_size
        if iters:
            self.dic["iters"] = iters

    @property
    def batch_size(self) -> int:
        return self.dic.get("batch_size", 1)

    @property
    def iters(self) -> int:
        iters = self.dic.get("iters")
        if not iters:
            raise RuntimeError(
                "No iters specified in the configuration file.")
        return iters

    # ------------------------------------------------------------------
    # LR schedule (reference config.py:156-201) -> optax schedules
    # ------------------------------------------------------------------
    @property
    def lr_scheduler(self):
        """optax schedule from the ``lr_scheduler`` block."""
        if "lr_scheduler" not in self.dic:
            raise RuntimeError(
                "No `lr_scheduler` specified in the configuration file.")
        params = self.dic.get("lr_scheduler").copy()
        lr_type = params.pop("type")
        return self._build_schedule(lr_type, params)

    def _build_schedule(self, lr_type, params):
        if lr_type == "PolynomialDecay":
            params.setdefault("decay_steps", self.iters)
            params.setdefault("end_lr", 0)
            params.setdefault("power", 0.9)
            return optax.polynomial_schedule(
                init_value=params["learning_rate"],
                end_value=params["end_lr"],
                power=params["power"],
                transition_steps=params["decay_steps"])
        if lr_type == "PiecewiseDecay":
            boundaries = params["boundaries"]
            values = params["values"]

            def piecewise(step):
                import jax.numpy as jnp
                idx = sum(jnp.asarray(step) >= jnp.asarray(b)
                          for b in boundaries)
                return jnp.asarray(values)[idx]

            return piecewise
        if lr_type == "StepDecay":
            lr = params["learning_rate"]
            step_size = params["step_size"]
            gamma = params.get("gamma", 0.1)

            def stepdecay(step):
                return lr * (gamma ** (step // step_size))

            return stepdecay
        if lr_type == "CosineAnnealingDecay":
            return optax.cosine_decay_schedule(
                init_value=params["learning_rate"],
                decay_steps=params.get("T_max", self.iters),
                alpha=params.get("eta_min", 0.0) /
                max(params["learning_rate"], 1e-12))
        raise RuntimeError("Unknown lr_scheduler type {}.".format(lr_type))

    @property
    def learning_rate(self):
        """Legacy ``learning_rate`` block (reference config.py:171-201)."""
        logger.warning(
            "`learning_rate` in configuration file will be deprecated, "
            "please use `lr_scheduler` instead.")
        _learning_rate = self.dic.get("learning_rate", {})
        if isinstance(_learning_rate, float):
            return lambda step: _learning_rate

        _learning_rate = self.dic.get("learning_rate", {}).get("value")
        if not _learning_rate:
            raise RuntimeError(
                "No learning rate specified in the configuration file.")
        args = self.decay_args
        decay_type = args.pop("type")
        if decay_type == "poly":
            return optax.polynomial_schedule(
                init_value=_learning_rate,
                end_value=args.get("end_lr", 0),
                power=args.get("power", 0.9),
                transition_steps=args.get("decay_steps", self.iters))
        if decay_type == "piecewise":
            return self._build_schedule(
                "PiecewiseDecay",
                {"boundaries": args["boundaries"],
                 "values": _learning_rate})
        if decay_type == "stepdecay":
            return self._build_schedule(
                "StepDecay", {"learning_rate": _learning_rate, **args})
        raise RuntimeError("Only poly and piecewise decay support.")

    @property
    def decay_args(self) -> dict:
        args = self.dic.get("learning_rate", {}).get(
            "decay", {"type": "poly", "power": 0.9}).copy()
        if args["type"] == "poly":
            args.setdefault("decay_steps", self.iters)
            args.setdefault("end_lr", 0)
        return args

    # ------------------------------------------------------------------
    # Optimizer (reference config.py:203-232) -> optax
    # ------------------------------------------------------------------
    @property
    def optimizer_args(self) -> dict:
        args = self.dic.get("optimizer", {}).copy()
        if args.get("type") == "sgd":
            args.setdefault("momentum", 0.9)
        return args

    @property
    def optimizer(self):
        """optax GradientTransformation implementing the configured
        optimizer with paddle-style coupled L2 ``weight_decay``.
        The LR schedule is baked in (use ``.lr_scheduler`` to log lr)."""
        if "lr_scheduler" in self.dic:
            lr = self.lr_scheduler
        else:
            lr = self.learning_rate
        args = self.optimizer_args
        optimizer_type = args.pop("type")
        weight_decay = args.pop("weight_decay", 0.0)

        txs = []
        if weight_decay:
            txs.append(optax.add_decayed_weights(weight_decay))
        if optimizer_type == "sgd":
            txs.append(optax.sgd(lr, momentum=args.get("momentum", 0.9),
                                 nesterov=args.get("use_nesterov", False)))
        elif optimizer_type == "adam":
            txs.append(optax.adam(
                lr, b1=args.get("beta1", 0.9), b2=args.get("beta2", 0.999),
                eps=args.get("epsilon", 1e-8)))
        elif optimizer_type in ("adamw", "AdamW"):
            # decoupled decay: drop the coupled term, use optax.adamw
            txs = [optax.adamw(
                lr, b1=args.get("beta1", 0.9), b2=args.get("beta2", 0.999),
                eps=args.get("epsilon", 1e-8),
                weight_decay=weight_decay)]
        elif optimizer_type in ("momentum", "Momentum"):
            txs.append(optax.sgd(lr, momentum=args.get("momentum", 0.9),
                                 nesterov=args.get("use_nesterov", False)))
        elif optimizer_type in ("rmsprop", "RMSProp"):
            txs.append(optax.rmsprop(
                lr, decay=args.get("rho", 0.95),
                eps=args.get("epsilon", 1e-6),
                momentum=args.get("momentum", 0.0)))
        else:
            raise RuntimeError(
                "Unknown optimizer type {}.".format(optimizer_type))
        return optax.chain(*txs) if len(txs) > 1 else txs[0]

    # ------------------------------------------------------------------
    # Loss (reference config.py:246-296)
    # ------------------------------------------------------------------
    @property
    def loss(self) -> dict:
        if self._losses is None:
            self._losses = self._prepare_loss("loss")
        return self._losses

    def _prepare_loss(self, loss_name):
        args = self.dic.get(loss_name, {}).copy()
        if "types" in args and "coef" in args:
            len_types = len(args["types"])
            len_coef = len(args["coef"])
            if len_types != len_coef:
                if len_types == 1:
                    args["types"] = args["types"] * len_coef
                else:
                    raise ValueError(
                        "The length of types should equal to coef or equal "
                        "to 1 in loss config, but they are {} and {}."
                        .format(len_types, len_coef))
        else:
            raise ValueError(
                'Loss config should contain keys of "types" and "coef"')

        losses = dict()
        for key, val in args.items():
            if key == "types":
                losses["types"] = []
                train_ds = self.train_dataset \
                    if self.train_dataset_config else None
                ds_ignore = getattr(train_ds, "ignore_index", 255)
                for item in args["types"]:
                    item = dict(item)
                    if item["type"] != "MixedLoss":
                        if "ignore_index" in item:
                            assert item["ignore_index"] == ds_ignore, \
                                "If ignore_index of loss is set, it must " \
                                "equal the train_dataset ignore_index."
                        item["ignore_index"] = ds_ignore
                    losses["types"].append(self._load_object(item))
            else:
                losses[key] = val
        if len(losses["coef"]) != len(losses["types"]):
            raise RuntimeError(
                "The length of coef should equal to types in loss config: "
                "{} != {}.".format(
                    len(losses["coef"]), len(losses["types"])))
        return losses

    # ------------------------------------------------------------------
    # Model (reference config.py:298-325)
    # ------------------------------------------------------------------
    @property
    def model(self):
        """The Flax module. num_classes is inferred from the datasets when
        absent (reference :301-318). No SyncBN conversion: BN statistics
        are global batch means under the sharded jit already."""
        model_cfg = self.dic.get("model", {}).copy()
        if not model_cfg:
            raise RuntimeError(
                "No model specified in the configuration file.")
        if "num_classes" not in model_cfg:
            num_classes = None
            if self.train_dataset_config:
                ds = self.train_dataset
                if hasattr(type(ds), "NUM_CLASSES"):
                    num_classes = type(ds).NUM_CLASSES
                elif hasattr(ds, "num_classes"):
                    num_classes = ds.num_classes
            elif self.val_dataset_config:
                ds = self.val_dataset
                if hasattr(type(ds), "NUM_CLASSES"):
                    num_classes = type(ds).NUM_CLASSES
                elif hasattr(ds, "num_classes"):
                    num_classes = ds.num_classes
            if num_classes is not None:
                model_cfg["num_classes"] = num_classes

        # Flax dataclass fields want tuples for nested sequences
        for key in ("kernel_size", "stride_size"):
            if key in model_cfg and isinstance(model_cfg[key], list):
                model_cfg[key] = tuple(
                    tuple(v) if isinstance(v, (list, tuple)) else v
                    for v in model_cfg[key])
        if "dtype" in model_cfg and isinstance(model_cfg["dtype"], str):
            import jax.numpy as jnp
            model_cfg["dtype"] = {
                "float32": jnp.float32, "bfloat16": jnp.bfloat16,
                "bf16": jnp.bfloat16, "fp32": jnp.float32,
            }[model_cfg["dtype"]]

        if self._model is None:
            self._model = self._load_object(model_cfg)
        return self._model

    # ------------------------------------------------------------------
    # Datasets (reference config.py:327-381)
    # ------------------------------------------------------------------
    @property
    def train_dataset_config(self) -> Dict:
        trainset_config = self.dic.get("train_dataset", {}).copy()
        if trainset_config:
            trainset_config["dataset_root"] = self._join_root(
                trainset_config.get("dataset_root"))
            trainset_config["result_dir"] = self._join_root(
                trainset_config.get("result_dir"))
        return trainset_config

    @property
    def val_dataset_config(self) -> Dict:
        valset_config = self.dic.get("val_dataset", {}).copy()
        if valset_config:
            valset_config["dataset_root"] = self._join_root(
                valset_config.get("dataset_root"))
            valset_config["result_dir"] = self._join_root(
                valset_config.get("result_dir"))
        return valset_config

    def _join_root(self, path):
        if path is None:
            return None
        return os.path.join(self.dic.get("data_root", ""), path)

    @property
    def train_dataset_class(self):
        return self._load_component(self.train_dataset_config["type"])

    @property
    def val_dataset_class(self):
        return self._load_component(self.val_dataset_config["type"])

    @property
    def train_dataset(self):
        if self._train_dataset is None:
            cfg = self.train_dataset_config
            if not cfg:
                return None
            self._train_dataset = self._load_object(cfg)
        return self._train_dataset

    @property
    def val_dataset(self):
        if self._val_dataset is None:
            cfg = self.val_dataset_config
            if not cfg:
                return None
            self._val_dataset = self._load_object(cfg)
        return self._val_dataset

    # ------------------------------------------------------------------
    # Reflective loading (reference config.py:371-403)
    # ------------------------------------------------------------------
    def _load_component(self, com_name: str) -> Any:
        com_list = [
            manager.MODELS, manager.BACKBONES, manager.DATASETS,
            manager.TRANSFORMS, manager.LOSSES
        ]
        for com in com_list:
            if com_name in com.components_dict:
                return com[com_name]
        raise RuntimeError(
            "The specified component was not found {}.".format(com_name))

    def _load_object(self, cfg: dict) -> Any:
        cfg = cfg.copy()
        if "type" not in cfg:
            raise RuntimeError("No object information in {}.".format(cfg))
        component = self._load_component(cfg.pop("type"))
        params = {}
        for key, val in cfg.items():
            if self._is_meta_type(val):
                params[key] = self._load_object(val)
            elif isinstance(val, list):
                params[key] = [
                    self._load_object(item)
                    if self._is_meta_type(item) else item for item in val
                ]
            else:
                params[key] = val
        return component(**params)

    @property
    def export_config(self) -> Dict:
        return self.dic.get("export", {})

    @property
    def to_static_training(self) -> bool:
        """Kept for CLI surface parity; jit compilation is always on in
        this framework (reference config.py:409-412)."""
        return self.dic.get("to_static_training", False)

    def _is_meta_type(self, item: Any) -> bool:
        return isinstance(item, dict) and "type" in item

    def __str__(self) -> str:
        return yaml.dump(self.dic)

    def data_root_path_warning(self):
        if "data_root" not in self.dic:
            raise RuntimeError(
                "The dataroot need to be set in the config file")
        data_root = self.dic["data_root"]
        absolute_data_dir = os.path.join(os.getcwd(), data_root)
        if data_root == "data/":
            warnings.warn(
                "Warning: The data dir now is {}, you should change the "
                "data_root in the global.yml if this directory didn't "
                "have enough space".format(absolute_data_dir))
