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


@pytest.mark.slow
def test_evaluate_device_sharded_matches_serial(val_dataset, state,
                                                tmp_path):
    """Round 2 (VERDICT #5): eval with volumes sharded over the mesh's
    data axis must reproduce the serial result, including a padded tail
    dispatch (4 volumes, group 3)."""
    import jax
    from tools.generate_synthetic_dataset import generate
    from medicalseg_tpu.datasets import MedicalDataset
    from medicalseg_tpu.core import evaluate
    from medicalseg_tpu.parallel import mesh as mesh_lib

    phase0 = generate(str(tmp_path / "data"), num_volumes=8, size=16,
                      seed=1, num_classes=2, val_frac=0.5)
    big_val = MedicalDataset(dataset_root=phase0, result_dir=phase0,
                             transforms=[], num_classes=2, mode="val")
    assert len(big_val) == 4

    serial = evaluate(state, big_val, _losses(),
                      save_dir=str(tmp_path / "serial"))
    mesh = mesh_lib.build_mesh(data=3, space=1,
                               devices=jax.devices()[:3])
    sharded = evaluate(state, big_val, _losses(), mesh=mesh,
                       save_dir=str(tmp_path / "sharded"))
    np.testing.assert_allclose(sharded["mdice"], serial["mdice"],
                               rtol=1e-5)
    # artifact dump still works (first volumes, process 0)
    assert os.path.exists(str(tmp_path / "sharded" / "0" / "pred.npy"))
    p_serial = np.load(str(tmp_path / "serial" / "1" / "pred.npy"))
    p_shard = np.load(str(tmp_path / "sharded" / "1" / "pred.npy"))
    np.testing.assert_array_equal(p_serial, p_shard)


@pytest.mark.slow
def test_evaluate_sliding_window_sharded_matches_serial(val_dataset,
                                                       state, tmp_path):
    """r2 #8a: --sw_num eval shards volume groups over the mesh's data
    axis (each device scans windows for its own volume) and must match
    the single-device sliding-window result."""
    import jax
    from medicalseg_tpu.core import evaluate
    from medicalseg_tpu.parallel import mesh as mesh_lib

    serial = evaluate(state, val_dataset, _losses(), sw_num=2,
                      save_dir=str(tmp_path / "serial"))
    mesh = mesh_lib.build_mesh(data=2, space=1,
                               devices=jax.devices()[:2])
    sharded = evaluate(state, val_dataset, _losses(), sw_num=2,
                       mesh=mesh, save_dir=str(tmp_path / "sharded"))
    np.testing.assert_allclose(sharded["mdice"], serial["mdice"],
                               rtol=1e-5)


def test_evaluate_never_vmaps_model(val_dataset, tmp_path):
    """Regression: models containing ``custom_partitioning`` ops (the
    Pallas convs) have no vmap batching rule — evaluating one crashed
    with NotImplementedError mid-training on TPU. The eval group must
    ride the model's native batch axis instead of a vmap."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    from medicalseg_tpu.core import evaluate
    from medicalseg_tpu.core.state import TrainState

    cp_ident = custom_partitioning(lambda x: x)

    def _infer(mesh, arg_infos, result_infos):
        return NamedSharding(mesh, PartitionSpec())

    def _part(mesh, arg_infos, result_infos):
        repl = NamedSharding(mesh, PartitionSpec())
        return mesh, (lambda x: x), repl, (repl,)

    cp_ident.def_partition(infer_sharding_from_operands=_infer,
                           partition=_part,
                           sharding_rule="n d h w c -> n d h w c")

    class CPModel(nn.Module):
        num_classes: int = 2

        @nn.compact
        def __call__(self, x, train=True):
            h = nn.Conv(self.num_classes, (3, 3, 3), padding="SAME")(x)
            return [cp_ident(h)]

    with pytest.raises(Exception):
        jax.vmap(lambda x: cp_ident(x)[0])(jnp.zeros((1, 2, 2, 2, 2, 1)))

    state = TrainState.create(CPModel(), optax.sgd(1e-3),
                              jnp.zeros((1, 16, 16, 16, 1)),
                              jax.random.PRNGKey(0))
    result = evaluate(state, val_dataset, _losses(),
                      save_dir=str(tmp_path / "cp"))
    assert np.isfinite(result["mdice"])


def test_evaluate_reports_hard_dice(val_dataset, tmp_path):
    """The soft (sigmoid) per-channel dice can report ~0 for classes the
    model segments correctly with negative absolute logits (seen on the
    spine flagship: classes with 0.97+ argmax dice printed as 0.005).
    evaluate() must dual-report the argmax dice 2I/(P+L) so the metric
    can't hide a correct segmentation."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from medicalseg_tpu.core import evaluate
    from medicalseg_tpu.core.state import TrainState

    class Oracle(nn.Module):
        """Predicts the label perfectly by argmax, but with logits so
        negative that sigmoid soft dice is ~0 for the winning class."""
        num_classes: int = 2

        @nn.compact
        def __call__(self, x, train=True):
            self.param("w", nn.initializers.zeros, (1,))
            # the synthetic label is (img > 0.5) after the per-volume max
            # normalization upstream; recover it from the input intensity
            fg = (x[..., 0] > 0.5).astype(jnp.float32)
            logit = jnp.stack([-20.0 + 10.0 * (1 - fg),
                               -20.0 + 10.0 * fg], axis=-1)
            return [logit]

    state = TrainState.create(Oracle(), optax.sgd(1e-3),
                              jnp.zeros((1, 16, 16, 16, 1)),
                              jax.random.PRNGKey(0))
    result = evaluate(state, val_dataset, _losses(),
                      save_dir=str(tmp_path / "hd"))
    assert "mdice_hard" in result
    # soft dice sees sigmoid(-10) ~ 5e-5 everywhere -> ~0 regardless of
    # whether the argmax segmentation is right
    assert result["mdice"] < 0.1

    # recompute the dataset-level argmax dice from the saved artifacts
    # (all 4 val volumes dump under save_dir) and check the wiring
    inter = np.zeros(2)
    parea = np.zeros(2)
    larea = np.zeros(2)
    for j in range(len(val_dataset)):
        pred = np.load(str(tmp_path / "hd" / str(j) / "pred.npy"))
        lab = np.load(str(tmp_path / "hd" / str(j) / "label.npy"))
        for c in range(2):
            p, t = pred == c, lab == c
            inter[c] += (p & t).sum()
            parea[c] += p.sum()
            larea[c] += t.sum()
    union = parea + larea
    expect = np.where(union == 0, 0.0, 2 * inter / np.maximum(union, 1))
    np.testing.assert_allclose(result["mdice_hard"], expect.mean(),
                               rtol=1e-6)


def test_eval_loader_range(tmp_path):
    from tools.generate_synthetic_dataset import generate
    from medicalseg_tpu.datasets import MedicalDataset
    from medicalseg_tpu.core.loader import EvalLoader
    phase0 = generate(str(tmp_path / "d"), num_volumes=8, size=8, seed=2,
                      val_frac=0.5)
    ds = MedicalDataset(dataset_root=phase0, result_dir=phase0,
                        transforms=[], num_classes=2, mode="val")
    full = EvalLoader(ds)
    part = EvalLoader(ds, start=1, stop=3)
    assert len(full) == 4 and len(part) == 2
    idxs = [idx for _, _, idx in part]
    assert idxs == [1, 2]
