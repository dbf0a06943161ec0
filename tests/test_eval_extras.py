"""Eval extras: AUC-ROC accumulation and sliding-window eval path."""
import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def val_dataset(tmp_path_factory):
    from tools.generate_synthetic_dataset import generate
    from medicalseg_tpu.datasets import MedicalDataset
    root = tmp_path_factory.mktemp("data")
    phase0 = generate(str(root), num_volumes=4, size=16, seed=0,
                      num_classes=2)
    # rewrite labels as binary for auc_roc (it rejects >num_classes ids)
    for f in os.listdir(osp.join(phase0, "labels")):
        p = osp.join(phase0, "labels", f)
        lab = np.load(p)
        np.save(p, (lab > 0).astype(np.int32))
    return MedicalDataset(
        dataset_root=phase0, result_dir=phase0, transforms=[],
        num_classes=2, mode="val")


@pytest.fixture(scope="module")
def state():
    import jax
    import jax.numpy as jnp
    import optax
    from medicalseg_tpu.core.state import TrainState
    from medicalseg_tpu.models import VNet
    model = VNet(in_channels=1, num_classes=2)
    sample = jnp.zeros((1, 16, 16, 16, 1))
    return TrainState.create(model, optax.sgd(1e-3), sample,
                             jax.random.PRNGKey(0))


def _losses():
    from medicalseg_tpu.models.losses import (CrossEntropyLoss, DiceLoss,
                                              MixedLoss)
    return {"types": [MixedLoss([CrossEntropyLoss(), DiceLoss()],
                                [1.0, 1.0])], "coef": [1]}


def test_evaluate_auc_roc(val_dataset, state, tmp_path):
    from medicalseg_tpu.core import evaluate
    result = evaluate(state, val_dataset, _losses(), auc_roc=True,
                      save_dir=str(tmp_path))
    assert "auc_roc" in result
    assert 0.0 <= result["auc_roc"] <= 1.0


def test_evaluate_sliding_window(val_dataset, state, tmp_path):
    from medicalseg_tpu.core import evaluate
    result = evaluate(state, val_dataset, _losses(), sw_num=2,
                      save_dir=str(tmp_path))
    assert "mdice" in result
