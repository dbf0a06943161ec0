# Copyright 2026. Apache License 2.0.
"""Evaluation loop.

Parity target: reference medicalseg/core/val.py:29-187 — batch-size-1
loader over the val set, per-volume inference with reverse-resize to the
original shape, loss + per-channel dice using only the first loss type,
optional AUC-ROC accumulation, first-5 artifact dump (npy + nii.gz with
dataset.json geometry), progbar, and a result dict {'mdice', ['auc_roc']}
with the per-class dice vector logged.

The per-volume forward+loss is one jitted function reused across
volumes (shapes are constant across a phase0 val set).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..utils import (Progbar, TimeAverager, logger, metric, save_array)
from ..utils.loss_utils import loss_computation
from . import infer
from .loader import EvalLoader


def evaluate(state,
             eval_dataset,
             losses,
             num_workers=0,
             print_detail=True,
             auc_roc=False,
             writer=None,
             save_dir=None,
             sw_num=None):
    """Evaluate ``state`` (core.state.TrainState) on ``eval_dataset``.

    Returns {"mdice": float, ["auc_roc": float]}.
    """
    new_loss = {"types": [losses["types"][0]], "coef": [losses["coef"][0]]}

    loader = EvalLoader(eval_dataset)
    total_iters = len(loader)

    dataset_json_dict = None
    if getattr(eval_dataset, "dataset_json_path", "") and os.path.exists(
            eval_dataset.dataset_json_path):
        with open(eval_dataset.dataset_json_path, "r",
                  encoding="utf-8") as f:
            dataset_json_dict = json.load(f)

    if print_detail:
        logger.info(
            "Start evaluating (total_samples: {}, total_iters: {})...".
            format(len(eval_dataset), total_iters))
    progbar_val = Progbar(target=total_iters, verbose=1)
    reader_cost_averager = TimeAverager()
    batch_cost_averager = TimeAverager()
    batch_start = time.time()

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def _eval_volume_impl(variables, im, label):
        if sw_num:
            # sliding-window whole-volume inference with overlap blending
            # (beyond-reference; core/sliding_window.py)
            from .sliding_window import sliding_window_inference
            dhw = im.shape[1:4]
            roi = tuple(max(1, s // int(sw_num)) for s in dhw)
            logit = sliding_window_inference(
                state.apply_fn, variables, im[0], roi,
                num_classes=eval_dataset.num_classes)[None]
            if tuple(label.shape[-3:]) != logit.shape[1:4]:
                logit = infer.reverse_transform(
                    logit, label.shape[-3:],
                    eval_dataset.transforms.transforms)
            pred = jnp.argmax(logit, axis=-1).astype(jnp.int32)
        else:
            pred, logit = infer.inference(
                state.apply_fn, variables, im,
                ori_shape=label.shape[-3:],
                transforms=eval_dataset.transforms.transforms)
        loss_list, per_channel_dice = loss_computation(
            [logit], label, new_loss)
        return pred, logit, sum(loss_list), per_channel_dice

    # cache the jitted per-volume program on the dataset so repeated
    # in-training evals don't re-trace (shapes are constant per dataset).
    # The cached apply_fn is held strongly and compared by identity — an
    # id()-keyed cache could stale-hit after GC reuses the address.
    cache_key = "_jitted_eval_sw{}".format(sw_num)
    cached = getattr(eval_dataset, cache_key, None)
    if cached is None or cached[0] is not state.apply_fn:
        cached = (state.apply_fn, jax.jit(_eval_volume_impl))
        setattr(eval_dataset, cache_key, cached)
    _eval_volume = cached[1]

    mdice = 0.0
    channel_dice_array = np.array([])
    loss_all = 0.0
    logits_all, label_all = None, None

    for it, (im, label, idx) in enumerate(loader):
        reader_cost_averager.record(time.time() - batch_start)

        pred, logit, loss, per_channel_dice = _eval_volume(
            variables, im, label)
        per_channel_dice = np.asarray(per_channel_dice)

        if auc_roc:
            probs = np.asarray(jax.nn.softmax(logit, axis=-1))
            probs = np.moveaxis(probs, -1, 1)  # N, C, D, H, W
            if logits_all is None:
                logits_all, label_all = probs, np.asarray(label)
            else:
                logits_all = np.concatenate([logits_all, probs])
                label_all = np.concatenate([label_all, np.asarray(label)])

        loss_all += float(loss)
        mdice += float(np.mean(per_channel_dice))
        if channel_dice_array.size == 0:
            channel_dice_array = per_channel_dice
        else:
            channel_dice_array = channel_dice_array + per_channel_dice

        if it < 5 and save_dir is not None:
            image_infor = {"spacing": (1, 1, 1), "origin": (0, 0, 0),
                           "direction": tuple(np.eye(3).reshape(-1))}
            if dataset_json_dict is not None:
                name = eval_dataset.file_list[idx][0].split("/")[-1].split(
                    ".")[0]
                image_json = dataset_json_dict.get("training", {}).get(
                    name, {})
                image_infor = {
                    "spacing": image_json.get("spacing_resample",
                                              (1, 1, 1)),
                    "direction": image_json.get(
                        "direction", tuple(np.eye(3).reshape(-1))),
                    "origin": image_json.get("origin", (0, 0, 0)),
                }
            save_array(
                save_path=os.path.join(save_dir, str(it)),
                save_content={
                    "pred": np.asarray(pred),
                    "label": np.asarray(label),
                    "img": np.asarray(im)[..., 0],
                },
                form=("npy", "nii.gz"),
                image_infor=image_infor)

        batch_cost_averager.record(
            time.time() - batch_start, num_samples=label.shape[0])
        if print_detail and jax.process_index() == 0:
            progbar_val.update(it + 1, [
                ("batch_cost", batch_cost_averager.get_average()),
                ("reader cost", reader_cost_averager.get_average())])
        reader_cost_averager.reset()
        batch_cost_averager.reset()
        batch_start = time.time()

    mdice /= total_iters
    channel_dice_array = channel_dice_array / total_iters
    loss_all /= total_iters

    result_dict = {"mdice": mdice}
    auc_infor = ""
    if auc_roc:
        auc_value = metric.auc_roc(logits_all, label_all[:, None],
                                   num_classes=eval_dataset.num_classes)
        auc_infor = " Auc_roc: {:.4f}".format(auc_value)
        result_dict["auc_roc"] = auc_value

    if print_detail:
        infor = "[EVAL] #Images: {}, Dice: {:.4f}, Loss: {:6f}".format(
            len(eval_dataset), mdice, loss_all)
        logger.info(infor + auc_infor)
        logger.info("[EVAL] Class dice: \n" + str(
            np.round(channel_dice_array, 4)))

    if writer is not None:
        writer.add_scalar("Evaluate/Dice", mdice, int(state.step))
    return result_dict
