# Copyright 2026. Apache License 2.0.
"""Evaluation loop.

Parity target: reference medicalseg/core/val.py:29-187 — batch-size-1
loader over the val set, per-volume inference with reverse-resize to the
original shape, loss + per-channel dice using only the first loss type,
optional AUC-ROC accumulation, first-5 artifact dump (npy + nii.gz with
dataset.json geometry), progbar, and a result dict {'mdice', ['auc_roc']}
with the per-class dice vector logged.

Sharded evaluation (round 2): volumes are distributed two ways, matching
the reference's DistributedBatchSampler sharding (val.py:65-71) —
  * across *devices*: with a mesh, ``data``-axis-many volumes ride the
    model's batch axis in one dispatch, sharded over the mesh, so
    in-train eval on an N-chip slice runs ~N volumes at a time;
  * across *processes*: each host evaluates a contiguous shard of the
    val set (parallel.mesh.process_shard) and the dice/loss sums are
    combined with a cross-process allgather.
Artifact writes are gated to process 0.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..parallel import mesh as mesh_lib
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
             sw_num=None,
             mesh=None):
    """Evaluate ``state`` (core.state.TrainState) on ``eval_dataset``.

    Returns {"mdice": float, ["auc_roc": float]}.
    """
    new_loss = {"types": [losses["types"][0]], "coef": [losses["coef"][0]]}
    is_primary = jax.process_index() == 0

    # ---- volume distribution -------------------------------------------
    # across processes (multi-host): contiguous index shards; AUC-ROC
    # needs every logit on one host, so it forces the unsharded path.
    shard_procs = jax.process_count() > 1 and not auc_roc
    if shard_procs:
        lo, hi = mesh_lib.process_shard(len(eval_dataset))
    else:
        lo, hi = 0, len(eval_dataset)
    loader = EvalLoader(eval_dataset, start=lo, stop=hi)
    local_iters = len(loader)
    total_iters = len(eval_dataset)

    # across devices (single process): stack `group` volumes per dispatch
    # with the batch axis sharded over the mesh's data axis AND (when
    # space > 1) the volume's H axis sharded over 'space' — whole-volume
    # inference beyond single-chip HBM (XLA inserts conv halo exchanges).
    # The sliding-window path shards the same way: each device runs the
    # full window scan for its own volume(s) of the group (r2 #8a — an
    # 8-chip slice no longer idles 7 chips under --sw_num).
    group = 1
    use_mesh = (mesh is not None and
                (int(mesh.shape["data"]) > 1 or
                 int(mesh.shape["space"]) > 1))
    if sw_num and mesh is not None and int(mesh.shape["space"]) > 1:
        # windows are HBM-sized by construction; H-sharding the roi
        # would shrink below the conv receptive field — keep sw_num on
        # the data axis only
        use_mesh = int(mesh.shape["data"]) > 1
    if use_mesh:
        # always the full data-axis size — short sets pad the dispatch
        # (the batch axis must stay divisible by the mesh axis)
        group = int(mesh.shape["data"])

    dataset_json_dict = None
    if getattr(eval_dataset, "dataset_json_path", "") and os.path.exists(
            eval_dataset.dataset_json_path):
        with open(eval_dataset.dataset_json_path, "r",
                  encoding="utf-8") as f:
            dataset_json_dict = json.load(f)

    if print_detail:
        logger.info(
            "Start evaluating (total_samples: {}, total_iters: {}, "
            "volumes/dispatch: {})...".format(
                len(eval_dataset), total_iters, group))
    progbar_val = Progbar(target=local_iters, verbose=1)
    reader_cost_averager = TimeAverager()
    batch_cost_averager = TimeAverager()
    batch_start = time.time()

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def _eval_group(variables, ims, labels):
        """[group, ...] stacked volumes, evaluated in one batched call.

        The group rides the model's *native* batch axis instead of
        ``jax.vmap`` over a per-volume closure: the Pallas conv custom
        calls have a ``custom_partitioning`` batch-sharding rule but no
        vmap batching rule, so vmapping the model raises
        NotImplementedError — and the batch axis is exactly what the
        mesh's ``data`` axis shards anyway. Only the per-volume loss
        reduction is vmapped (plain jnp ops).
        """
        ori_shape = labels.shape[1:]
        if sw_num:
            # sliding-window whole-volume inference with overlap
            # blending (beyond-reference; core/sliding_window.py) —
            # windows from all volumes of the group stream through one
            # scan, keeping the MXU batch full.
            from .sliding_window import sliding_window_inference_batched
            dhw = ims.shape[1:4]
            roi = tuple(max(1, s // int(sw_num)) for s in dhw)
            logit = sliding_window_inference_batched(
                state.apply_fn, variables, ims, roi,
                num_classes=eval_dataset.num_classes)
            if tuple(ori_shape) != logit.shape[1:4]:
                logit = infer.reverse_transform(
                    logit, ori_shape, eval_dataset.transforms.transforms)
            pred = jnp.argmax(logit, axis=-1).astype(jnp.int32)
        else:
            pred, logit = infer.inference(
                state.apply_fn, variables, ims,
                ori_shape=ori_shape,
                transforms=eval_dataset.transforms.transforms)

        def _loss_one(logit_j, label_j):
            loss_list, pcd = loss_computation(
                [logit_j[None]], label_j[None], new_loss)
            return sum(loss_list), pcd

        losses_v, pcds = jax.vmap(_loss_one)(logit, labels)
        # per-volume argmax (hard) per-class areas for the clinical-
        # convention dice 2I/(P+L) (reference metric.py:138-163). The
        # soft per-channel dice above is the parity headline but can
        # report ~0 for classes the model segments correctly with
        # negative absolute logits (sigmoid soft dice is not shift-
        # invariant); dual-reporting both makes the metric honest.
        areas = jax.vmap(lambda p, l: jnp.stack(metric.calculate_area(
            p, l, eval_dataset.num_classes,
            eval_dataset.ignore_index)))(pred, labels)
        return pred, logit, losses_v, pcds, areas

    # cache the jitted per-volume program on the dataset so repeated
    # in-training evals don't re-trace (shapes are constant per dataset).
    # The cached apply_fn is held strongly and compared by identity — an
    # id()-keyed cache could stale-hit after GC reuses the address.
    cache_key = "_jitted_eval_sw{}_g{}".format(sw_num, group)
    cached = getattr(eval_dataset, cache_key, None)
    if cached is None or cached[0] is not state.apply_fn:
        if use_mesh:
            # sw mode: volumes stay whole per device (data axis only)
            sp_ax = None if sw_num else 2
            img_sh = mesh_lib.batch_sharding(mesh, sp_ax)
            lab_sh = mesh_lib.label_sharding(mesh, sp_ax)
            repl = mesh_lib.replicated(mesh)
            fn = jax.jit(_eval_group, in_shardings=(repl, img_sh, lab_sh))
            cached = (state.apply_fn, fn, img_sh, lab_sh)
        else:
            cached = (state.apply_fn, jax.jit(_eval_group), None, None)
        setattr(eval_dataset, cache_key, cached)
    _eval_fn, img_sh, lab_sh = cached[1], cached[2], cached[3]

    mdice_sum = 0.0
    channel_sum = None
    loss_sum = 0.0
    area_sum = np.zeros((3, eval_dataset.num_classes), np.float64)
    logits_all, label_all = None, None

    volume_iter = iter(loader)
    done = 0
    while done < local_iters:
        chunk = []
        for _ in range(min(group, local_iters - done)):
            chunk.append(next(volume_iter))
        k = len(chunk)
        reader_cost_averager.record(time.time() - batch_start)

        ims = np.concatenate([c[0] for c in chunk], axis=0)
        labs = np.concatenate([c[1] for c in chunk], axis=0)
        if k < group:  # pad the tail dispatch; padded results dropped
            ims = np.concatenate(
                [ims, np.repeat(ims[-1:], group - k, axis=0)], axis=0)
            labs = np.concatenate(
                [labs, np.repeat(labs[-1:], group - k, axis=0)], axis=0)
        if img_sh is not None:
            ims = jax.device_put(ims, img_sh)
            labs = jax.device_put(labs, lab_sh)

        preds, logits, losses_v, pcds, areas_v = jax.device_get(
            _eval_fn(variables, ims, labs))

        for j in range(k):
            per_channel_dice = np.asarray(pcds[j])
            if auc_roc:
                probs = np.asarray(
                    jax.nn.softmax(jnp.asarray(logits[j][None]), axis=-1))
                probs = np.moveaxis(probs, -1, 1)  # N, C, D, H, W
                lab_j = np.asarray(chunk[j][1])
                if logits_all is None:
                    logits_all, label_all = probs, lab_j
                else:
                    logits_all = np.concatenate([logits_all, probs])
                    label_all = np.concatenate([label_all, lab_j])

            loss_sum += float(losses_v[j])
            mdice_sum += float(np.mean(per_channel_dice))
            area_sum += np.asarray(areas_v[j], np.float64)
            if channel_sum is None:
                channel_sum = per_channel_dice.copy()
            else:
                channel_sum = channel_sum + per_channel_dice

            if done + j < 5 and save_dir is not None and is_primary:
                idx = chunk[j][2]
                image_infor = {"spacing": (1, 1, 1), "origin": (0, 0, 0),
                               "direction": tuple(np.eye(3).reshape(-1))}
                if dataset_json_dict is not None:
                    name = eval_dataset.file_list[idx][0].split(
                        "/")[-1].split(".")[0]
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
                    save_path=os.path.join(save_dir, str(done + j)),
                    save_content={
                        "pred": np.asarray(preds[j]),
                        "label": np.asarray(chunk[j][1][0]),
                        "img": np.asarray(chunk[j][0][0, ..., 0]),
                    },
                    form=("npy", "nii.gz"),
                    image_infor=image_infor)

        done += k
        batch_cost_averager.record(time.time() - batch_start,
                                   num_samples=k)
        if print_detail and is_primary:
            progbar_val.update(done, [
                ("batch_cost", batch_cost_averager.get_average()),
                ("reader cost", reader_cost_averager.get_average())])
        reader_cost_averager.reset()
        batch_cost_averager.reset()
        batch_start = time.time()

    # ---- aggregate ------------------------------------------------------
    count = float(local_iters)
    if channel_sum is None:
        channel_sum = np.zeros((1,), np.float64)
    if shard_procs:
        # combine per-process partial sums (reference aggregates over the
        # sampler shards implicitly by running one loader per rank)
        from jax.experimental import multihost_utils
        nch = channel_sum.shape[0]
        vec = np.concatenate([[mdice_sum, loss_sum, count], channel_sum,
                              area_sum.reshape(-1)]).astype(np.float64)
        vec = np.asarray(multihost_utils.process_allgather(vec)).sum(0)
        mdice_sum, loss_sum, count = vec[0], vec[1], vec[2]
        channel_sum = vec[3:3 + nch]
        area_sum = vec[3 + nch:].reshape(3, -1)

    mdice = mdice_sum / max(count, 1.0)
    channel_dice_array = channel_sum / max(count, 1.0)
    loss_all = loss_sum / max(count, 1.0)
    # dataset-level hard dice: 2*sum(I)/(sum(P)+sum(L)) per class over
    # every evaluated voxel (reference metric.py:138-163 convention;
    # zero-union classes score 0, matching the reference)
    hard_class_dice, mdice_hard = metric.dice(
        area_sum[0], area_sum[1], area_sum[2])

    result_dict = {"mdice": mdice, "mdice_hard": mdice_hard}
    auc_infor = ""
    if auc_roc:
        auc_value = metric.auc_roc(logits_all, label_all[:, None],
                                   num_classes=eval_dataset.num_classes)
        auc_infor = " Auc_roc: {:.4f}".format(auc_value)
        result_dict["auc_roc"] = auc_value

    if print_detail:
        infor = ("[EVAL] #Images: {}, Dice: {:.4f}, Dice(argmax): {:.4f}, "
                 "Loss: {:6f}").format(
                     len(eval_dataset), mdice, mdice_hard, loss_all)
        logger.info(infor + auc_infor)
        logger.info("[EVAL] Class dice: \n" + str(
            np.round(channel_dice_array, 4)))
        logger.info("[EVAL] Class dice (argmax): \n" + str(
            np.round(hard_class_dice, 4)))

    if writer is not None:
        writer.add_scalar("Evaluate/Dice", mdice, int(state.step))
        writer.add_scalar("Evaluate/Dice_hard", mdice_hard,
                          int(state.step))
    return result_dict
