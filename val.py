# Copyright 2026. Apache License 2.0.
"""Evaluation CLI.

Parity target: reference val.py:25-121 — loads config + trained weights
(--model_path), optional AUC-ROC, writes eval artifacts to --save_dir.
"""

import argparse
import os


def parse_args():
    from medicalseg_tpu.utils import strtobool
    parser = argparse.ArgumentParser(description="Model evaluation")
    parser.add_argument(
        "--config", dest="cfg", help="The config file.", default=None,
        type=str)
    parser.add_argument(
        "--model_path", dest="model_path",
        help="The path of model for evaluation", type=str, default=None)
    parser.add_argument(
        "--save_dir", dest="save_dir",
        help="The directory for saving the evaluated results", type=str,
        default="./output/result")
    parser.add_argument(
        "--num_workers", dest="num_workers",
        help="Num workers for data loader", type=int, default=0)
    parser.add_argument(
        "--use_vdl", dest="use_vdl",
        help="Whether to record the result to TensorBoard during evaluation",
        action="store_true")
    parser.add_argument(
        "--auc_roc", dest="auc_roc", help="Whether to use auc_roc metric",
        type=strtobool, default=False)
    parser.add_argument(
        "--sw_num", dest="sw_num",
        help="sliding window number: run sliding-window whole-volume "
             "inference with this many windows per axis (None disables).",
        type=int, default=None)
    parser.add_argument(
        "--weights_precision", dest="weights_precision",
        choices=["fp32", "bf16", "int8"], default="fp32",
        help="int8: round-trip the conv kernels through the deploy "
             "Predictor's weight-only int8 quantization "
             "(utils/quant.py) before evaluating — measures the "
             "accuracy cost of the int8 serving mode on this dataset. "
             "bf16: round-trip ALL params through bfloat16 (the deploy "
             "bf16 serving mode's weight rounding).")
    return parser.parse_args()


def main(args):
    import jax

    from medicalseg_tpu.core import evaluate
    from medicalseg_tpu.core.state import TrainState
    from medicalseg_tpu.cvlibs import Config
    from medicalseg_tpu.utils import (config_check, get_sys_env,
                                      load_entire_model, logger)

    from medicalseg_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    env_info = get_sys_env()
    info = ["{}: {}".format(k, v) for k, v in env_info.items()]
    info = "\n".join(["", format("Environment Information", "-^48s")] +
                     info + ["-" * 48])
    logger.info(info)

    if not args.cfg:
        raise RuntimeError("No configuration file specified.")

    cfg = Config(args.cfg)
    val_dataset = cfg.val_dataset
    if val_dataset is None:
        raise RuntimeError(
            "The verification dataset is not specified in the "
            "configuration file.")
    elif len(val_dataset) == 0:
        raise ValueError(
            "The length of val_dataset is 0. Please check if your dataset "
            "is valid")

    losses = cfg.loss
    msg = "\n---------------Config Information---------------\n"
    msg += str(cfg)
    msg += "------------------------------------------------"
    logger.info(msg)

    config_check(cfg, val_dataset=val_dataset)

    model = cfg.model
    im0, _, _ = val_dataset[0]
    import numpy as np
    import jax.numpy as jnp
    sample = jnp.asarray(
        np.moveaxis(np.asarray(im0, np.float32), 0, -1)[None])
    state = TrainState.create(model, cfg.optimizer, sample)
    if args.model_path:
        variables = load_entire_model(
            jax.device_get(state.variables), args.model_path)
        state = state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", state.batch_stats))
        logger.info("Loaded trained params of model successfully")

    if args.weights_precision == "int8":
        # same transform the deploy Predictor's int8 mode applies
        # (deploy/python/infer.py), evaluated through the standard eval
        # stack: quantize symmetric-absmax per output channel, then
        # dequantize — the mDice delta vs fp32 is the serving mode's
        # accuracy cost.
        from medicalseg_tpu.utils.quant import (dequantize_tree,
                                                quantize_tree)
        state = state.replace(params=dequantize_tree(
            quantize_tree(jax.device_get(state.params))))
        logger.info("Quantized conv kernels to int8 (weight-only) and "
                    "dequantized for evaluation")
    elif args.weights_precision == "bf16":
        import jax.numpy as jnp
        state = state.replace(params=jax.tree.map(
            lambda x: x.astype(jnp.bfloat16).astype(x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            state.params))
        logger.info("Rounded params through bfloat16 for evaluation")

    log_writer = None
    if args.use_vdl:
        from tensorboardX import SummaryWriter
        log_writer = SummaryWriter(args.save_dir)

    from medicalseg_tpu.parallel import mesh as mesh_lib
    evaluate(
        state,
        val_dataset,
        losses,
        num_workers=args.num_workers,
        print_detail=True,
        auc_roc=args.auc_roc,
        writer=log_writer,
        save_dir=args.save_dir,
        sw_num=args.sw_num,
        mesh=mesh_lib.build_mesh())


if __name__ == "__main__":
    main(parse_args())
