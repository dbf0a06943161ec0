# Copyright 2026. Apache License 2.0.
"""Segmentation metrics.

TPU-native counterpart of the reference metric module
(medicalseg/utils/metric.py:21-210). ``calculate_area`` is the jit-friendly
device-side primitive (one-hot reductions instead of a Python loop over
classes); the aggregations (mIoU / dice / accuracy / kappa) operate on the
resulting per-class area vectors host-side, and ``auc_roc`` delegates to
sklearn when available.

Note (parity): as in the reference, the train/eval "mDice" headline number
comes from DiceLoss's per-channel dice, not from this module (SURVEY §2.7).
"""

import numpy as np

import jax.numpy as jnp


def calculate_area(pred, label, num_classes, ignore_index=255):
    """Per-class intersect / pred / label voxel counts.

    Replaces the reference's per-class Python loop (metric.py:48-55) with a
    single one-hot matmul-free reduction that XLA fuses on TPU.

    Args:
        pred: int array of predicted class ids, any shape (a singleton
            channel axis of 4-D/5-D inputs is squeezed, reference :35-38).
        label: int array, same shape as pred.
        num_classes: number of classes C.
        ignore_index: voxels with this label value are excluded.

    Returns:
        (intersect_area, pred_area, label_area): int32 arrays of shape [C].
    """
    pred = jnp.asarray(pred)
    label = jnp.asarray(label)
    if pred.ndim == 4 and pred.shape[1] == 1:
        pred = jnp.squeeze(pred, axis=1)
    if label.ndim == 4 and label.shape[1] == 1:
        label = jnp.squeeze(label, axis=1)
    if pred.shape != label.shape:
        raise ValueError(
            "Shape of `pred` and `label` should be equal, "
            "but there are {} and {}.".format(pred.shape, label.shape))

    pred = pred.reshape(-1).astype(jnp.int32)
    label = label.reshape(-1).astype(jnp.int32)
    mask = label != ignore_index

    # per-class masked sums (a (V, C) one-hot would lane-pad C to 128 on
    # TPU — the per-class form keeps everything in flat V-major layouts)
    pred_area, label_area, intersect_area = [], [], []
    for c in range(num_classes):
        pred_c = (pred == c) & mask
        label_c = label == c
        pred_area.append(jnp.sum(pred_c.astype(jnp.int32)))
        label_area.append(jnp.sum(label_c.astype(jnp.int32)))
        intersect_area.append(jnp.sum((pred_c & label_c).astype(
            jnp.int32)))
    return (jnp.stack(intersect_area), jnp.stack(pred_area),
            jnp.stack(label_area))


def mean_iou(intersect_area, pred_area, label_area):
    """Per-class IoU and mean IoU (reference metric.py:110-135)."""
    intersect_area = np.asarray(intersect_area)
    pred_area = np.asarray(pred_area)
    label_area = np.asarray(label_area)
    union = pred_area + label_area - intersect_area
    class_iou = np.where(union == 0, 0.0,
                         intersect_area / np.maximum(union, 1))
    return class_iou, float(np.mean(class_iou))


def dice(intersect_area, pred_area, label_area):
    """Per-class dice 2I/(P+L) and mean dice (reference metric.py:138-163)."""
    intersect_area = np.asarray(intersect_area)
    pred_area = np.asarray(pred_area)
    label_area = np.asarray(label_area)
    union = pred_area + label_area
    class_dice = np.where(union == 0, 0.0,
                          2 * intersect_area / np.maximum(union, 1))
    return class_dice, float(np.mean(class_dice))


def accuracy(intersect_area, pred_area):
    """Per-class accuracy and overall accuracy (reference metric.py:166-188)."""
    intersect_area = np.asarray(intersect_area)
    pred_area = np.asarray(pred_area)
    class_acc = np.where(pred_area == 0, 0.0,
                         intersect_area / np.maximum(pred_area, 1))
    macc = float(np.sum(intersect_area) / max(1, np.sum(pred_area)))
    return class_acc, macc


def kappa(intersect_area, pred_area, label_area):
    """Cohen's kappa coefficient (reference metric.py:191-210)."""
    intersect_area = np.asarray(intersect_area).astype(np.float64)
    pred_area = np.asarray(pred_area).astype(np.float64)
    label_area = np.asarray(label_area).astype(np.float64)
    total_area = np.sum(label_area)
    po = np.sum(intersect_area) / total_area
    pe = np.sum(pred_area * label_area) / (total_area * total_area)
    return float((po - pe) / (1 - pe))


def auc_roc(logits, label, num_classes, ignore_index=None):
    """Area under the ROC curve over flattened voxels.

    Mirrors reference metric.py:64-107 (sklearn one-vs-rest for multi-class).
    Accepts (N, C, *spatial) logits and (N, 1, *spatial) labels.
    """
    try:
        from sklearn import metrics as skmetrics
    except ImportError as e:  # pragma: no cover - sklearn is optional
        raise RuntimeError("auc_roc requires scikit-learn") from e

    logits = np.asarray(logits)
    label = np.asarray(label)
    if ignore_index is not None or len(np.unique(label)) > num_classes:
        raise RuntimeError("labels with ignore_index is not supported yet.")

    n, c = logits.shape[0], logits.shape[1]
    logits = np.moveaxis(logits, 1, -1).reshape(-1, c)
    label = label.reshape(-1)
    if logits.shape[0] != label.shape[0]:
        raise ValueError("length of `logit` and `label` should be equal, "
                         "but they are {} and {}.".format(
                             logits.shape[0], label.shape[0]))
    if num_classes == 2:
        return skmetrics.roc_auc_score(label, logits[:, 1])
    return skmetrics.roc_auc_score(label, logits, multi_class="ovr")
