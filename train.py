# Copyright 2026. Apache License 2.0.
"""Training CLI.

Parity target: reference train.py:26-189 — same argparse surface
(--config/--iters/--batch_size/--learning_rate/--save_interval/
--resume_model/--save_dir/--keep_checkpoint_max/--num_workers/
--do_eval/--log_iters/--use_vdl/--profiler_options/--data_format/--seed)
driving Config -> datasets/model/optimizer/loss -> core.train.
"""

import argparse
import os
import random

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="Model training")
    parser.add_argument(
        "--config", dest="cfg", help="The config file.", default=None,
        type=str)
    parser.add_argument(
        "--iters", dest="iters", help="iters for training", type=int,
        default=None)
    parser.add_argument(
        "--batch_size", dest="batch_size",
        help="Mini batch size of one gpu or cpu", type=int, default=None)
    parser.add_argument(
        "--learning_rate", dest="learning_rate",
        help="Learning rate", type=float, default=None)
    parser.add_argument(
        "--save_interval", dest="save_interval",
        help="How many iters to save a model snapshot once during training.",
        type=int, default=1000)
    parser.add_argument(
        "--resume_model", dest="resume_model",
        help="The path of resume model", type=str, default=None)
    parser.add_argument(
        "--save_dir", dest="save_dir",
        help="The directory for saving the model snapshot", type=str,
        default="./output")
    parser.add_argument(
        "--keep_checkpoint_max", dest="keep_checkpoint_max",
        help="Maximum number of checkpoints to save", type=int, default=5)
    parser.add_argument(
        "--num_workers", dest="num_workers",
        help="Num workers for data loader", type=int, default=0)
    parser.add_argument(
        "--do_eval", dest="do_eval",
        help="Eval while training", action="store_true")
    parser.add_argument(
        "--log_iters", dest="log_iters",
        help="Display logging information at every log_iters", type=int,
        default=10)
    parser.add_argument(
        "--use_vdl", dest="use_vdl",
        help="Whether to record the data to TensorBoard during training",
        action="store_true")
    parser.add_argument(
        "--profiler_options", type=str, default=None,
        help="The option of train profiler e.g. "
             '"batch_range=[50,60];profile_path=model.profile"')
    parser.add_argument(
        "--data_format", dest="data_format",
        help="Data format that will be used when model is trained. "
             "NDHWC is the TPU-native layout and the only one used here; "
             "the flag is kept for CLI parity.",
        type=str, default="NDHWC")
    parser.add_argument(
        "--seed", dest="seed", help="Set the random seed during training.",
        default=None, type=int)
    parser.add_argument(
        "--space", dest="space",
        help="Spatial-partition axis size of the device mesh "
             "(1 = pure data parallel).", type=int, default=1)
    parser.add_argument(
        "--loader_mode", dest="loader_mode",
        help="Data pipeline mode: auto | device | device_cache | host. "
             "device_cache stages the whole (deduped) dataset in device "
             "HBM and ships only index vectors per step.", type=str,
        default="auto")
    parser.add_argument(
        "--wire_dtype", dest="wire_dtype",
        help="Host->device wire format for training batches: bfloat16 "
             "(images bf16 + labels uint8, 4-8x fewer bytes) or "
             "float32.", type=str, default="bfloat16",
        choices=["bfloat16", "float32"])
    parser.add_argument(
        "--steps_per_dispatch", dest="steps_per_dispatch",
        help="Train steps fused into one device program (lax.scan); "
             "amortizes host dispatch latency. Must divide log_iters "
             "and save_interval.", type=int, default=1)
    return parser.parse_args()


def main(args):
    from medicalseg_tpu.cvlibs import Config
    from medicalseg_tpu.core import train
    from medicalseg_tpu.utils import (config_check, get_sys_env, logger,
                                      seed_all)

    from medicalseg_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    if args.seed is not None:
        seed_all(args.seed)
        logger.info("Set seed to {}".format(args.seed))

    env_info = get_sys_env()
    info = ["{}: {}".format(k, v) for k, v in env_info.items()]
    info = "\n".join(["", format("Environment Information", "-^48s")] +
                     info + ["-" * 48])
    logger.info(info)

    if not args.cfg:
        raise RuntimeError("No configuration file specified.")

    cfg = Config(
        args.cfg,
        learning_rate=args.learning_rate,
        iters=args.iters,
        batch_size=args.batch_size)
    cfg.data_root_path_warning()

    train_dataset = cfg.train_dataset
    if train_dataset is None:
        raise ValueError(
            "The training dataset is not specified in the configuration "
            "file.")
    elif len(train_dataset) == 0:
        raise ValueError(
            "The length of train_dataset is 0. Please check if your "
            "dataset is valid")
    val_dataset = cfg.val_dataset if args.do_eval else None
    losses = cfg.loss

    msg = "\n---------------Config Information---------------\n"
    msg += str(cfg)
    msg += "------------------------------------------------"
    logger.info(msg)

    config_check(cfg, train_dataset=train_dataset, val_dataset=val_dataset)

    train(
        cfg.model,
        train_dataset,
        val_dataset=val_dataset,
        optimizer=cfg.optimizer,
        lr_scheduler=cfg.lr_scheduler,
        save_dir=args.save_dir,
        iters=cfg.iters,
        batch_size=cfg.batch_size,
        resume_model=args.resume_model,
        save_interval=args.save_interval,
        log_iters=args.log_iters,
        num_workers=args.num_workers,
        use_vdl=args.use_vdl,
        losses=losses,
        keep_checkpoint_max=args.keep_checkpoint_max,
        profiler_options=args.profiler_options,
        to_static_training=cfg.to_static_training,
        seed=args.seed if args.seed is not None else 0,
        space=args.space,
        data_loader_mode=args.loader_mode,
        steps_per_dispatch=args.steps_per_dispatch,
        wire_dtype=args.wire_dtype)


if __name__ == "__main__":
    main(parse_args())
