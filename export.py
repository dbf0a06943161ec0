# Copyright 2026. Apache License 2.0.
"""Export CLI: AOT-compile the model for deployment.

Parity target: reference export.py:25-143 — wraps the net with an
argmax/softmax post-processor per the config's ``export`` block, captures
a static graph, and writes ``deploy.yaml`` naming the transforms + model
+ params for the deploy runner.

TPU-native export: the forward fn is serialized as StableHLO via
``jax.export`` (the portable XLA exchange format, replacing
paddle.jit.to_static's program + .pdiparams), alongside the msgpack
variables so the deploy runner can either (a) execute the StableHLO
artifact directly, or (b) rebuild the Flax module and re-jit (allows a
different device count / shape bucketing at serve time).
"""

import argparse
import os

import yaml


def parse_args():
    parser = argparse.ArgumentParser(description="Model export.")
    parser.add_argument(
        "--config", dest="cfg", help="The config file.", default=None,
        type=str, required=True)
    parser.add_argument(
        "--save_dir", dest="save_dir",
        help="The directory for saving the exported model", type=str,
        default="./output/export")
    parser.add_argument(
        "--model_path", dest="model_path",
        help="The path of model for export", type=str, default=None)
    parser.add_argument(
        "--without_argmax", dest="without_argmax",
        help="Do not add the argmax operation at the end of the network",
        action="store_true")
    parser.add_argument(
        "--with_softmax", dest="with_softmax",
        help="Add the softmax operation at the end of the network",
        action="store_true")
    parser.add_argument(
        "--input_shape", nargs="+",
        help="Export the model with fixed input shape, e.g. 1 1 128 128 "
             "128 (NCDHW order for reference-CLI parity).",
        type=int, default=None)
    parser.add_argument(
        "--shape_buckets", nargs="+", type=int, default=None,
        help="Additional D H W triples (e.g. 128 128 128 192 192 96) to "
             "export alongside --input_shape. The deploy runner routes "
             "each input volume to the smallest fitting bucket "
             "(zero-padded, output cropped back) — the XLA-native "
             "equivalent of the reference's TRT auto-tuned dynamic "
             "shapes (deploy/python/infer.py:178-224).")
    return parser.parse_args()


def main(args):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from medicalseg_tpu.core.state import TrainState
    from medicalseg_tpu.cvlibs import Config
    from medicalseg_tpu.utils import load_entire_model, logger

    from medicalseg_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    os.environ.setdefault("MEDICALSEG_EXPORT_STAGE", "True")

    cfg = Config(args.cfg)
    model = cfg.model

    if args.input_shape is None:
        shape = [1, 1, 128, 128, 128]
    else:
        shape = list(args.input_shape)
    # CLI takes NCDHW (reference parity); runtime is NDHWC
    n, c, d, h, w = shape
    sample = jnp.zeros((n, d, h, w, c), jnp.float32)

    import optax
    state = TrainState.create(model, optax.sgd(1e-3), sample)
    variables = jax.device_get(state.variables)
    if args.model_path is not None:
        variables = load_entire_model(variables, args.model_path)
        logger.info("Loaded trained params of model successfully.")

    # SavedSegmentationNet equivalent (reference export.py:67-93)
    def forward(variables, x):
        logits = model.apply(variables, x, train=False)[0]
        if args.with_softmax:
            logits = jax.nn.softmax(logits, axis=-1)
        if not args.without_argmax:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return logits

    os.makedirs(args.save_dir, exist_ok=True)

    # 1) weights
    from medicalseg_tpu.utils import save_checkpoint
    save_checkpoint(args.save_dir, variables)

    # 2) StableHLO artifact(s) — one per shape bucket
    jitted = jax.jit(forward)

    def export_one(sample_in, fname):
        try:
            from jax import export as jax_export
            # Pallas kernels (head_conv/mid_conv='pallas') serialize as
            # Mosaic custom calls; allowlist them for the safety check
            # (the artifact stays portable across same-generation TPU
            # runtimes).
            checks = [jax_export.DisabledSafetyCheck.custom_call(t)
                      for t in ("tpu_custom_call", "mosaic_cpu")]
            exported = jax_export.export(
                jitted, disabled_checks=checks)(variables, sample_in)
            blob = exported.serialize()
            with open(os.path.join(args.save_dir, fname), "wb") as f:
                f.write(blob)
            logger.info("Serialized StableHLO {} ({} bytes)".format(
                fname, len(blob)))
            return True
        except Exception as e:  # pragma: no cover - export API drift
            logger.warning(
                "StableHLO export failed ({}); deploy will rebuild the "
                "module from config.".format(e))
            return False

    export_one(sample, "model.stablehlo")

    # shape buckets: the XLA-native answer to TRT auto-tuned dynamic
    # shapes (reference deploy/python/infer.py:178-224) — serve-time
    # inputs route to the smallest bucket that fits (pad + crop back)
    buckets = []
    bucket_models = {}
    if args.shape_buckets:
        if len(args.shape_buckets) % 3:
            raise ValueError("--shape_buckets wants D H W triples")
        flat = args.shape_buckets
        buckets = [tuple(flat[i:i + 3]) for i in range(0, len(flat), 3)]
        for bd, bh, bw in buckets:
            fname = "model_{}x{}x{}.stablehlo".format(bd, bh, bw)
            bsample = jnp.zeros((n, bd, bh, bw, c), jnp.float32)
            if export_one(bsample, fname):
                bucket_models["{}x{}x{}".format(bd, bh, bw)] = fname

    # 3) deploy manifest (reference export.py:126-136)
    val_cfg = cfg.dic.get("val_dataset", {})
    transforms = val_cfg.get("transforms", [])
    deploy_info = {
        "Deploy": {
            "model": "model.stablehlo",
            "params": "model.msgpack",
            "transforms": transforms,
            "input_shape_ndhwc": list(sample.shape),
            "shape_buckets": [list(b) for b in buckets],
            "bucket_models": bucket_models,
            "output_op": ("softmax" if args.with_softmax else
                          "argmax" if not args.without_argmax else
                          "none"),
            "model_config": cfg.dic.get("model", {}),
        }
    }
    with open(os.path.join(args.save_dir, "deploy.yaml"), "w") as f:
        yaml.dump(deploy_info, f)

    logger.info("Model is saved in {}.".format(args.save_dir))


if __name__ == "__main__":
    main(parse_args())
