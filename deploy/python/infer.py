# Copyright 2026. Apache License 2.0.
"""Deployment inference runner.

Parity target: reference deploy/python/infer.py:145-429 — DeployConfig
parses the exported deploy.yaml (model/params + transforms rebuilt from
the TRANSFORMS registry); Predictor runs a batch loop with optional
AutoLog-style stage timing (preprocess / inference / postprocess),
re-runs HUnorm+resample on raw NIfTI inputs, argmax postprocess, and
saves .npy results.

TPU-native replacement for the Paddle Inference C++ session: the
exported StableHLO artifact is deserialized and executed directly (or
the Flax module is rebuilt from the manifest and jitted), with bf16
compute taking the role of TensorRT fp16 and batch serving across a
data-parallel mesh taking the role of multi-stream TRT.
"""

import argparse
import codecs
import os
import sys
import time

import numpy as np
import yaml

# allow `python deploy/python/infer.py` from anywhere
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.realpath(__file__)), "..", ".."))


def parse_args():
    from medicalseg_tpu.utils import strtobool
    parser = argparse.ArgumentParser(description="Model deploy inference")
    parser.add_argument(
        "--config", help="The deploy config file (deploy.yaml) path.",
        type=str, required=True)
    parser.add_argument(
        "--image_path", help="The image or directory of images to infer.",
        type=str, required=True)
    parser.add_argument(
        "--batch_size", type=int, default=1, help="Mini batch size.")
    parser.add_argument(
        "--save_dir", type=str, default="./output/deploy",
        help="Directory for the predictions.")
    parser.add_argument(
        "--device", type=str, default="tpu", choices=["tpu", "cpu"],
        help="Inference device.")
    parser.add_argument(
        "--precision", type=str, default="fp32",
        choices=["fp32", "bf16", "int8"],
        help="Compute precision: bf16 = TPU-native half precision "
             "(the TRT-fp16 analog); int8 = weight-only int8 "
             "quantization with per-channel scales, dequantized to "
             "bf16 inside the jitted forward (the TRT-int8 analog, "
             "reference infer.py:286-321).")
    parser.add_argument(
        "--enable_auto_tune", type=strtobool, default=False,
        help="Kept for CLI parity: XLA autotunes during the first "
             "compile, no offline shape collection needed.")
    parser.add_argument(
        "--benchmark", type=strtobool, default=False,
        help="Log preprocess/inference/postprocess stage timings.")
    parser.add_argument(
        "--with_argmax", dest="with_argmax", action="store_true",
        help="Perform argmax postprocess if the exported net didn't.")
    parser.add_argument(
        "--use_swl", type=strtobool, default=False,
        help="Use sliding-window whole-volume inference.")
    return parser.parse_args()


class DeployConfig:
    """deploy.yaml parser (reference infer.py:145-175)."""

    def __init__(self, path):
        with codecs.open(path, "r", "utf-8") as f:
            self.dic = yaml.load(f, Loader=yaml.FullLoader)
        self._dir = os.path.dirname(path)

    @property
    def transforms(self):
        from medicalseg_tpu.cvlibs import manager
        ops = []
        for t in self.dic["Deploy"].get("transforms", []) or []:
            t = dict(t)
            kind = t.pop("type")
            ops.append(manager.TRANSFORMS[kind](**t))
        return ops

    @property
    def model_file(self):
        return os.path.join(self._dir, self.dic["Deploy"]["model"])

    @property
    def params_file(self):
        return os.path.join(self._dir, self.dic["Deploy"]["params"])

    @property
    def model_config(self):
        return self.dic["Deploy"].get("model_config", {})

    @property
    def output_op(self):
        return self.dic["Deploy"].get("output_op", "argmax")

    @property
    def input_shape(self):
        return tuple(self.dic["Deploy"].get(
            "input_shape_ndhwc", (1, 128, 128, 128, 1)))

    @property
    def shape_buckets(self):
        """(d, h, w) bucket shapes for variable-size routing (the
        XLA-native version of the reference's TRT auto-tuned dynamic
        shapes, its infer.py:178-224)."""
        return [tuple(b) for b in
                self.dic["Deploy"].get("shape_buckets", []) or []]

    def bucket_model_file(self, key):
        m = self.dic["Deploy"].get("bucket_models", {}) or {}
        return os.path.join(self._dir, m[key]) if key in m else None


class TimeLogger:
    """AutoLog-equivalent stage timer (reference infer.py:246-263)."""

    def __init__(self):
        self.stages = {"preprocess": [], "inference": [], "postprocess": []}

    def record(self, stage, dt):
        self.stages[stage].append(dt)

    def report(self):
        from medicalseg_tpu.utils import logger
        for stage, times in self.stages.items():
            if times:
                logger.info(
                    "[BENCH] {}: mean {:.2f} ms over {} calls".format(
                        stage, 1000 * np.mean(times), len(times)))


class Predictor:
    """Executes the exported model over a list of volumes
    (reference infer.py:227-429)."""

    def __init__(self, args):
        import jax

        self.args = args
        self.cfg = DeployConfig(args.config)
        self.timer = TimeLogger()

        self._exported = None
        self._variables = None
        self._apply = None

        # int8 dequantizes weights inside the forward, so it needs the
        # rebuilt module (the serialized StableHLO's signature takes
        # full-precision parameter operands)
        if os.path.exists(self.cfg.model_file) \
                and args.precision != "int8":
            try:
                from jax import export as jax_export
                with open(self.cfg.model_file, "rb") as f:
                    self._exported = jax_export.deserialize(f.read())
                # jit-wrap once: Exported.call retraces per invocation
                self._exported_call = jax.jit(self._exported.call)
            except Exception:
                self._exported = None
        if self._exported is None:
            self._build_from_config()
        # params are needed for the StableHLO call too
        if self._variables is None:
            self._load_variables()
        if args.precision == "int8":
            # weight-only quantization at load time (TRT builds its int8
            # engine from the fp32 weights the same way); the int8
            # tensors are what gets pinned in HBM below
            from medicalseg_tpu.utils import quant
            self._variables = quant.quantize_tree(
                jax.device_get(self._variables))
        # pin weights in HBM once — otherwise every call re-uploads the
        # full parameter set from host numpy
        self._variables = jax.device_put(self._variables)

    def _build_from_config(self):
        import jax
        import jax.numpy as jnp
        from medicalseg_tpu.cvlibs import manager
        import medicalseg_tpu.models  # noqa: F401 (register models)

        model_cfg = dict(self.cfg.model_config)
        kind = model_cfg.pop("type")
        model_cfg.pop("pretrained", None)
        for key in ("kernel_size", "stride_size"):
            if key in model_cfg and isinstance(model_cfg[key], list):
                model_cfg[key] = tuple(
                    tuple(v) if isinstance(v, (list, tuple)) else v
                    for v in model_cfg[key])
        if self.args.precision in ("bf16", "int8"):
            model_cfg["dtype"] = jnp.bfloat16
        model = manager.MODELS[kind](**model_cfg)
        output_op = self.cfg.output_op
        dequant = None
        if self.args.precision == "int8":
            from medicalseg_tpu.utils import quant
            dequant = quant.dequantize_tree

        def forward(variables, x):
            if dequant is not None:
                variables = dequant(variables)
            logits = model.apply(variables, x, train=False)[0]
            if output_op == "softmax":
                return jax.nn.softmax(logits, axis=-1)
            if output_op == "argmax":
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return logits

        self._apply = jax.jit(forward)
        self._model = model

    def _load_variables(self):
        import jax
        import jax.numpy as jnp
        from flax import serialization

        with open(self.cfg.params_file, "rb") as f:
            blob = f.read()
        if self._apply is not None:
            # template from a fresh init
            shape = self.cfg.input_shape
            sample = jnp.zeros(shape, jnp.float32)
            variables = jax.jit(
                lambda k, x: self._model.init(k, x, train=False))(
                jax.random.PRNGKey(0), sample)
            self._variables = serialization.from_bytes(
                jax.device_get(variables), blob)
        else:
            self._variables = serialization.msgpack_restore(blob)

    # ------------------------------------------------------------------
    # shape-bucket routing (reference TRT dynamic shapes equivalent)
    # ------------------------------------------------------------------
    def _bucket_for(self, dhw):
        """Smallest exported bucket every dim of ``dhw`` fits into, or
        None (caller falls back to resize-to-export-shape)."""
        fits = [b for b in self.cfg.shape_buckets
                if all(b[i] >= dhw[i] for i in range(3))]
        if not fits:
            return None
        return min(fits, key=lambda b: b[0] * b[1] * b[2])

    def _bucket_call(self, bucket):
        """Executor for one bucket shape: its serialized StableHLO when
        shipped, else the rebuilt module (jit caches per shape)."""
        import jax

        key = "{}x{}x{}".format(*bucket)
        if key in getattr(self, "_bucket_calls", {}):
            return self._bucket_calls[key]
        if not hasattr(self, "_bucket_calls"):
            self._bucket_calls = {}
        call, fixed_n = None, None
        path = None if self.args.precision == "int8" \
            else self.cfg.bucket_model_file(key)
        if path and os.path.exists(path):
            try:
                from jax import export as jax_export
                with open(path, "rb") as f:
                    exported = jax_export.deserialize(f.read())
                # serialized artifacts carry a FIXED batch dim
                fixed_n = int(exported.in_avals[-1].shape[0])
                call = jax.jit(exported.call)
            except Exception:
                call, fixed_n = None, None
        if call is None:
            if self._apply is None:
                self._build_from_config()
            call = self._apply  # rebuilt module: jit caches any batch
        self._bucket_calls[key] = (call, fixed_n)
        return call, fixed_n

    def _run_bucketed(self, pend, results):
        """Zero-pad a same-bucket group to the bucket shape, run it as
        one batch, crop each output back to its native extent."""
        bucket = pend[0][2]
        vols = []
        for _, vol, _ in pend:
            dhw = vol.shape[1:4]
            pad = [(0, 0)] + [(0, bucket[i] - dhw[i]) for i in range(3)] \
                + [(0, 0)]
            vols.append(np.pad(vol, pad))
        batch = np.concatenate(vols)
        call, fixed_n = self._bucket_call(bucket)
        t0 = time.time()
        if fixed_n and fixed_n != batch.shape[0]:
            outs = []
            for s in range(0, batch.shape[0], fixed_n):
                blk = batch[s:s + fixed_n]
                if blk.shape[0] < fixed_n:  # pad the tail dispatch
                    blk = np.concatenate(
                        [blk, np.repeat(blk[-1:],
                                        fixed_n - blk.shape[0], 0)])
                outs.append(np.asarray(call(self._variables,
                                            blk))[:blk.shape[0]])
            out = np.concatenate(outs)[:batch.shape[0]]
        else:
            out = np.asarray(call(self._variables, batch))
        self.timer.record("inference", time.time() - t0)
        t0 = time.time()
        for j, (path, vol, _) in enumerate(pend):
            d, h, w = vol.shape[1:4]
            res = out[j][:d, :h, :w]
            if self.args.with_argmax and res.ndim == 4:
                res = res.argmax(axis=-1)
            name = os.path.splitext(os.path.basename(path))[0]
            save_path = os.path.join(self.args.save_dir, name + ".npy")
            np.save(save_path, res)
            results.append(save_path)
        self.timer.record("postprocess", time.time() - t0)
        pend.clear()

    def _predict_sliding(self, vols):
        """Whole-volume sliding-window inference with Gaussian overlap
        blending (--use_swl): volumes keep their native resolution and
        the exported ROI slides over them. A same-shape group of volumes
        shares ONE window scan so the MXU batch stays full across volume
        boundaries (core/sliding_window.py, batched variant)."""
        import jax
        import jax.numpy as jnp
        from medicalseg_tpu.core.sliding_window import (
            sliding_window_inference_batched)

        if self._apply is None:
            self._build_from_config()
        roi = tuple(self.cfg.input_shape[1:4])
        num_classes = int(self.cfg.model_config.get("num_classes", 2))
        volumes = jnp.stack([jnp.asarray(v) for v in vols])[..., None]
        # build the (dequant-aware) apply wrapper ONCE: apply_fn is a
        # static jit argname inside the window scan, and functions hash
        # by identity — a fresh closure per flush would retrace (and,
        # through the slow axon remote compiler, recompile) the whole
        # sliding-window program for every batch
        if not hasattr(self, "_swl_apply"):
            if self.args.precision == "int8":
                from medicalseg_tpu.utils import quant
                model = self._model

                def _swl_apply(variables, *a, **kw):
                    return model.apply(
                        quant.dequantize_tree(variables), *a, **kw)

                self._swl_apply = _swl_apply
            else:
                self._swl_apply = self._model.apply
        logits = sliding_window_inference_batched(
            self._swl_apply, self._variables, volumes,
            roi, num_classes=num_classes)
        if self.cfg.output_op == "softmax":
            return np.asarray(jax.nn.softmax(logits, axis=-1))
        if self.cfg.output_op == "argmax":
            return np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
        return np.asarray(logits)

    def _preprocess(self, path):
        """npy passes through transforms; raw medical formats get the
        HUnorm + resample treatment (reference infer.py:378-416)."""
        from medicalseg_tpu import io as medio
        from medicalseg_tpu import ops

        if path.endswith(".npy"):
            vol = np.load(path)
        elif self.args.use_swl:
            # sliding-window mode keeps the native resolution
            data, meta = medio.read_image(path)
            vol = np.asarray(ops.hu_norm(data.astype(np.float32)))
        else:
            data, meta = medio.read_image(path)
            data = np.asarray(ops.hu_norm(data.astype(np.float32)))
            target = self.cfg.input_shape[1:4]
            data = np.asarray(ops.resize3d(data, tuple(target), order=1))
            vol = data.astype(np.float32)

        for op in self.cfg.transforms:
            vol = op(vol)[0]
        vol = np.asarray(vol, np.float32)
        if vol.max() > 0:
            vol = vol / vol.max()
        return vol[None, ..., None]  # [1, D, H, W, 1]

    def run(self, imgs):
        import jax

        if not isinstance(imgs, (list, tuple)):
            imgs = [imgs]
        os.makedirs(self.args.save_dir, exist_ok=True)
        results = []
        self._warmed = getattr(self, "_warmed", False)

        if self.args.use_swl:
            # sliding-window serving (native resolution): consecutive
            # same-shape volumes are grouped up to batch_size and their
            # windows stream through one jitted scan together
            pend = []  # (path, vol) with a common shape

            def _flush():
                if not pend:
                    return
                t0 = time.time()
                out = self._predict_sliding([v for _, v in pend])
                self.timer.record("inference", time.time() - t0)
                t0 = time.time()
                for j, (path, _) in enumerate(pend):
                    name = os.path.splitext(os.path.basename(path))[0]
                    save_path = os.path.join(self.args.save_dir,
                                             name + ".npy")
                    np.save(save_path, out[j])
                    results.append(save_path)
                self.timer.record("postprocess", time.time() - t0)
                pend.clear()

            for path in imgs:
                t0 = time.time()
                vol = self._preprocess(path)[0, ..., 0]
                self.timer.record("preprocess", time.time() - t0)
                if pend and vol.shape != pend[0][1].shape:
                    _flush()
                pend.append((path, vol))
                if len(pend) >= max(1, self.args.batch_size):
                    _flush()
            _flush()
            if self.args.benchmark:
                self.timer.report()
            return results
        if self.cfg.shape_buckets:
            # variable-size serving: route each volume to the smallest
            # exported bucket it fits (pad + crop), batching contiguous
            # same-bucket volumes
            from medicalseg_tpu import ops
            pend = []  # (path, vol, bucket)
            for path in imgs:
                t0 = time.time()
                vol = self._preprocess(path)
                bucket = self._bucket_for(vol.shape[1:4])
                if bucket is None:  # larger than every bucket: resample
                    bucket = max(self.cfg.shape_buckets,
                                 key=lambda b: b[0] * b[1] * b[2])
                    vol = np.asarray(ops.resize3d(
                        vol[0, ..., 0], bucket, order=1),
                        np.float32)[None, ..., None]
                self.timer.record("preprocess", time.time() - t0)
                if pend and bucket != pend[0][2]:
                    self._run_bucketed(pend, results)
                pend.append((path, vol, bucket))
                if len(pend) >= max(1, self.args.batch_size):
                    self._run_bucketed(pend, results)
            if pend:
                self._run_bucketed(pend, results)
            if self.args.benchmark:
                self.timer.report()
            return results

        for i in range(0, len(imgs), self.args.batch_size):
            chunk = imgs[i:i + self.args.batch_size]
            t0 = time.time()
            batch = np.concatenate([self._preprocess(p) for p in chunk])
            self.timer.record("preprocess", time.time() - t0)

            if not self._warmed:
                # warm-up executes the compile outside the timed path
                if self._exported is not None:
                    np.asarray(self._exported_call(self._variables,
                                                   batch))
                else:
                    np.asarray(self._apply(self._variables, batch))
                self._warmed = True

            t0 = time.time()
            if self._exported is not None:
                out = self._exported_call(self._variables, batch)
            else:
                out = self._apply(self._variables, batch)
            # fetch-fence: on remote TPU terminals block_until_ready can
            # return early; np.asarray forces completion
            out = np.asarray(out)
            self.timer.record("inference", time.time() - t0)

            t0 = time.time()
            if self.args.with_argmax and out.ndim == 5:
                out = out.argmax(axis=-1)
            for j, path in enumerate(chunk):
                name = os.path.splitext(os.path.basename(path))[0]
                save_path = os.path.join(self.args.save_dir,
                                         name + ".npy")
                np.save(save_path, out[j])
                results.append(save_path)
            self.timer.record("postprocess", time.time() - t0)
        if self.args.benchmark:
            self.timer.report()
        return results


def main(args):
    from medicalseg_tpu.utils import get_image_list, logger
    from medicalseg_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    imgs = get_image_list(args.image_path)
    predictor = Predictor(args)
    outputs = predictor.run(imgs)
    logger.info("Saved {} predictions to {}".format(
        len(outputs), args.save_dir))


if __name__ == "__main__":
    main(parse_args())
