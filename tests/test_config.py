"""Config system tests: _base_ inheritance, CLI overrides, component
building, loss broadcast, num_classes inference."""
import os

import numpy as np
import pytest

from medicalseg_tpu.cvlibs import Config


@pytest.fixture()
def cfg_dir(tmp_path):
    base = tmp_path / "_base_"
    base.mkdir()
    (base / "global.yml").write_text("data_root: data/\nfoo:\n  a: 1\n  b: 2\n")
    (tmp_path / "child.yml").write_text(
        "_base_: '_base_/global.yml'\n"
        "batch_size: 4\niters: 100\n"
        "foo:\n  b: 3\n  c: 4\n"
        "lr_scheduler:\n  type: PolynomialDecay\n  learning_rate: 0.01\n"
        "optimizer:\n  type: sgd\n  weight_decay: 1.0e-4\n"
        "loss:\n  types:\n    - type: DiceLoss\n  coef: [1, 1]\n"
        "model:\n  type: VNet\n  num_classes: 2\n")
    (tmp_path / "nobase.yml").write_text(
        "_base_: '_base_/global.yml'\n_inherited_: False\niters: 5\n")
    return tmp_path


def test_base_merge_and_overrides(cfg_dir):
    cfg = Config(str(cfg_dir / "child.yml"))
    assert cfg.dic["data_root"] == "data/"
    assert cfg.dic["foo"] == {"a": 1, "b": 3, "c": 4}
    assert cfg.batch_size == 4
    assert cfg.iters == 100

    cfg2 = Config(str(cfg_dir / "child.yml"), learning_rate=0.5,
                  batch_size=8, iters=42)
    assert cfg2.batch_size == 8
    assert cfg2.iters == 42
    assert cfg2.dic["lr_scheduler"]["learning_rate"] == 0.5


def test_inherited_false_cuts_base(cfg_dir):
    cfg = Config(str(cfg_dir / "nobase.yml"))
    assert "data_root" not in cfg.dic
    assert cfg.iters == 5


def test_lr_schedule_and_optimizer(cfg_dir):
    cfg = Config(str(cfg_dir / "child.yml"))
    sched = cfg.lr_scheduler
    # PolynomialDecay defaults: decay_steps=iters, end_lr 0, power 0.9
    assert float(sched(0)) == pytest.approx(0.01)
    assert float(sched(100)) == pytest.approx(0.0)
    assert float(sched(50)) < 0.01
    tx = cfg.optimizer
    assert hasattr(tx, "init") and hasattr(tx, "update")


def test_loss_broadcast_single_type(cfg_dir):
    cfg = Config(str(cfg_dir / "child.yml"))
    losses = cfg.loss
    # 1 type x coef [1, 1] broadcasts to 2 types (reference
    # config.py:262-271)
    assert len(losses["types"]) == 2
    assert len(losses["coef"]) == 2


def test_model_building(cfg_dir):
    cfg = Config(str(cfg_dir / "child.yml"))
    model = cfg.model
    from medicalseg_tpu.models import VNet
    assert isinstance(model, VNet)
    assert model.num_classes == 2


def test_real_config_files():
    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = Config(os.path.join(
        root, "configs/lung_coronavirus/"
        "vnet_lung_coronavirus_128_128_128_15k.yml"))
    assert cfg.batch_size == 6
    assert cfg.iters == 15000
    assert cfg.dic["model"]["type"] == "VNet"
    sched = cfg.lr_scheduler
    assert float(sched(0)) == pytest.approx(1e-3)

    cfg2 = Config(os.path.join(
        root, "configs/mri_spine_seg/"
        "vnet_mri_spine_seg_512_512_12_15k.yml"))
    model = cfg2.model
    assert model.kernel_size[0] == (2, 2, 4)
    assert model.stride_size[0] == (2, 2, 1)
