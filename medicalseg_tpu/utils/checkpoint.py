# Copyright 2026. Apache License 2.0.
"""Checkpoint save / load / resume.

TPU-native counterpart of the reference's checkpoint utilities
(medicalseg/utils/utils.py:40-135): ``iter_N/`` directories containing
model weights and optimizer state, per-key shape-checked pretrained
loading (with URL download), and resume that parses the iteration from
the directory name. Serialization uses flax msgpack instead of
``paddle.save``; the pytrees are host numpy arrays.
"""

import os

import numpy as np

import jax
from flax import serialization
from flax import traverse_util

from . import logger
from .env import PRETRAINED_MODEL_HOME

MODEL_FILE = "model.msgpack"
OPT_FILE = "opt.msgpack"

_async_executor = None


def _get_executor():
    global _async_executor
    if _async_executor is None:
        from concurrent.futures import ThreadPoolExecutor
        _async_executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt")
    return _async_executor


def wait_pending_checkpoints():
    """Block until all queued async checkpoint writes/evictions finish."""
    if _async_executor is not None:
        _get_executor().submit(lambda: None).result()


def save_checkpoint_async(save_dir, variables, opt_state=None, step=None):
    """Non-blocking checkpoint write (orbax-style async, SURVEY §5):
    the pytree is snapshotted to host synchronously (cheap device->host
    copy), serialization + disk IO happen on a background thread.
    Returns a Future."""
    host_vars = _to_host(variables)
    host_opt = None if opt_state is None else _to_host(opt_state)
    return _get_executor().submit(
        save_checkpoint, save_dir, host_vars, host_opt, step)


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(save_dir, variables, opt_state=None, step=None):
    """Write ``model.msgpack`` (+ ``opt.msgpack``) under ``save_dir``.

    ``variables`` is the model variable pytree ({'params': ..,
    'batch_stats': ..}); ``opt_state`` the optax state. Mirrors reference
    core/train.py:230-238 (paddle.save of .pdparams/.pdopt).
    """
    os.makedirs(save_dir, exist_ok=True)
    _atomic_write(os.path.join(save_dir, MODEL_FILE),
                  serialization.to_bytes(_to_host(variables)))
    if opt_state is not None:
        payload = {"opt_state": _to_host(opt_state),
                   "step": np.asarray(step if step is not None else 0)}
        _atomic_write(os.path.join(save_dir, OPT_FILE),
                      serialization.to_bytes(payload))


def _atomic_write(path, data):
    """Write-to-tmp + rename so a SIGTERM mid-save (e.g. a wall-bounded
    flagship run) can never leave a truncated msgpack behind; a file is
    either absent or complete. OPT_FILE is written last, so its presence
    marks a resumable checkpoint (see is_valid_checkpoint)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def is_valid_checkpoint(path, require_opt=True):
    """True when ``path`` holds a complete, resumable checkpoint dir."""
    if not os.path.isdir(path):
        return False
    if not os.path.exists(os.path.join(path, MODEL_FILE)):
        return False
    if require_opt and not os.path.exists(os.path.join(path, OPT_FILE)):
        return False
    return True


def load_checkpoint(path, variables_template, opt_state_template=None):
    """Load a checkpoint dir (or model file) into the given templates.

    Returns (variables, opt_state, step); opt_state/step are None when not
    requested or not present.
    """
    model_path = path
    if os.path.isdir(path):
        model_path = os.path.join(path, MODEL_FILE)
    if not os.path.exists(model_path):
        raise ValueError(
            "The model file is not found: {}".format(model_path))
    with open(model_path, "rb") as f:
        variables = serialization.from_bytes(variables_template, f.read())

    opt_state, step = None, None
    if opt_state_template is not None:
        opt_path = os.path.join(os.path.dirname(model_path), OPT_FILE)
        if os.path.exists(opt_path):
            with open(opt_path, "rb") as f:
                payload = serialization.from_bytes(
                    {"opt_state": opt_state_template,
                     "step": np.asarray(0)}, f.read())
            opt_state = payload["opt_state"]
            step = int(payload["step"])
    return variables, opt_state, step


def load_pretrained_model(variables, pretrained_model):
    """Per-key, shape-checked weight loading (reference utils.py:76-112).

    Keys present in the checkpoint but shape-mismatched (or missing) are
    skipped with a warning; returns the updated variables and the number
    of matched keys.
    """
    if pretrained_model is None:
        return variables, 0
    if _is_url(pretrained_model):
        pretrained_model = download_pretrained_model(pretrained_model)
    if os.path.isdir(pretrained_model):
        pretrained_model = os.path.join(pretrained_model, MODEL_FILE)
    if not os.path.exists(pretrained_model):
        raise ValueError("The pretrained model directory is not found: {}".
                         format(pretrained_model))

    with open(pretrained_model, "rb") as f:
        loaded = serialization.msgpack_restore(f.read())

    flat_tpl = traverse_util.flatten_dict(
        serialization.to_state_dict(variables))
    flat_new = traverse_util.flatten_dict(loaded)

    num_loaded = 0
    out = dict(flat_tpl)
    for key, value in flat_tpl.items():
        if key not in flat_new:
            logger.warning("{} is not in pretrained model".format(
                "/".join(key)))
            continue
        new_value = np.asarray(flat_new[key])
        if tuple(new_value.shape) != tuple(np.shape(value)):
            logger.warning(
                "[SKIP] Shape of params {} doesn't match.(Pretrained: {}, "
                "Actual: {})".format("/".join(key), new_value.shape,
                                     np.shape(value)))
            continue
        out[key] = new_value
        num_loaded += 1

    logger.info("There are {}/{} variables loaded into the model.".format(
        num_loaded, len(flat_tpl)))
    restored = traverse_util.unflatten_dict(out)
    return serialization.from_state_dict(variables, restored), num_loaded


def load_entire_model(variables, pretrained):
    """Strict-intent loading used by val/export (reference utils.py:40-47):
    warns when keys mismatch, but loads what matches."""
    if pretrained is not None:
        variables, _ = load_pretrained_model(variables, pretrained)
    else:
        logger.warning("Not all pretrained params of {} are loaded, "
                       "training from scratch or a pretrained backbone.")
    return variables


def resume(variables, opt_state, resume_model):
    """Restore model+optimizer from ``.../iter_N`` and return N
    (reference utils.py:115-135)."""
    if resume_model is None:
        return variables, opt_state, 0
    logger.info("Resume model from {}".format(resume_model))
    if not os.path.exists(resume_model):
        raise ValueError(
            "Directory of the model needed to resume is not Found: {}".
            format(resume_model))
    variables, new_opt_state, step = load_checkpoint(
        resume_model, variables, opt_state)
    if new_opt_state is not None:
        opt_state = new_opt_state
    if step is None:
        step = _parse_iter(resume_model)
    return variables, opt_state, step


def _parse_iter(path):
    base = os.path.basename(os.path.normpath(path))
    if "_" in base:
        tail = base.split("_")[-1]
        if tail.isdigit():
            return int(tail)
    return 0


def _is_url(path):
    return isinstance(path, str) and (path.startswith("http://") or
                                      path.startswith("https://"))


def download_pretrained_model(url):
    """Download a pretrained checkpoint into PRETRAINED_MODEL_HOME with a
    file lock against concurrent processes (reference utils.py:48-73)."""
    import hashlib
    import filelock
    from .download import download_file_and_uncompress

    savename = hashlib.md5(url.encode()).hexdigest()[:16]
    savedir = os.path.join(PRETRAINED_MODEL_HOME, savename)
    os.makedirs(savedir, exist_ok=True)
    with filelock.FileLock(os.path.join(savedir, ".lock")):
        target = os.path.join(savedir, MODEL_FILE)
        if not os.path.exists(target):
            download_file_and_uncompress(
                url, savepath=savedir, extrapath=savedir,
                extraname=MODEL_FILE)
    return target


def worker_init_fn(worker_id):
    """Reseed numpy per data-loader worker (reference utils.py:138-139)."""
    import random
    np.random.seed(random.randint(0, 100000))
