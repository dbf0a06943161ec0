"""Coverage for multi-step scan trainer, reverse transforms, and the
deploy raw-medical-input preprocessing path."""
import argparse
import os
import os.path as osp
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def test_multi_step_scan_equals_sequential():
    import optax
    from medicalseg_tpu.core.state import (TrainState, make_multi_step,
                                           make_train_step)
    from medicalseg_tpu.models.losses import DiceLoss
    from tests._mini_model import MiniSegNet

    model = MiniSegNet(num_classes=2)
    losses = {"types": [DiceLoss()], "coef": [1.0]}
    tx = optax.sgd(1e-2, momentum=0.9)
    rng = np.random.RandomState(0)
    n_steps, batch = 3, 2
    images = rng.rand(n_steps, batch, 8, 8, 8, 1).astype(np.float32)
    labels = rng.randint(0, 2, (n_steps, batch, 8, 8, 8)).astype(np.int32)
    key = jax.random.PRNGKey(7)

    s0 = TrainState.create(model, tx, jnp.asarray(images[0]),
                           jax.random.PRNGKey(0))
    # sequential
    step = jax.jit(make_train_step(losses))
    s_seq = s0
    for i in range(n_steps):
        s_seq, m = step(s_seq, jnp.asarray(images[i]),
                        jnp.asarray(labels[i]), key)
    # scanned
    multi = jax.jit(make_multi_step(losses, n_steps))
    s_scan, metrics = multi(s0, jnp.asarray(images), jnp.asarray(labels),
                            key)
    assert metrics["loss"].shape == (n_steps,)
    for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                    jax.tree_util.tree_leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_reverse_transform_roundtrip():
    from medicalseg_tpu.core.infer import (get_reverse_list,
                                           reverse_transform)
    from medicalseg_tpu.transforms import Resize3D

    transforms = [Resize3D((8, 8, 8))]
    rl = get_reverse_list((12, 14, 16), transforms)
    assert rl == [("resize", (12, 14, 16))]

    logit = jnp.asarray(
        np.random.RandomState(0).rand(1, 8, 8, 8, 2).astype(np.float32))
    out = reverse_transform(logit, (12, 14, 16), transforms)
    assert out.shape == (1, 12, 14, 16, 2)


@pytest.mark.slow
def test_predictor_raw_nifti_input(tmp_path):
    """Raw .nii.gz served straight: HU-norm + resample on device
    (reference deploy/python/infer.py:378-416)."""
    import yaml
    from medicalseg_tpu.io import nifti

    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "deploy",
                                "python"))
    import importlib
    infer_cli = importlib.import_module("infer")

    # deploy manifest with a MiniSegNet-style VNet? use VNet tiny input
    cfg_dir = tmp_path / "export"
    cfg_dir.mkdir()
    model_cfg = {"type": "VNet", "in_channels": 1, "num_classes": 2}
    with open(cfg_dir / "deploy.yaml", "w") as f:
        yaml.dump({"Deploy": {
            "model": "model.stablehlo", "params": "model.msgpack",
            "transforms": [], "input_shape_ndhwc": [1, 8, 8, 8, 1],
            "output_op": "argmax", "model_config": model_cfg}}, f)
    # weights from a fresh init
    from medicalseg_tpu.models import VNet
    from medicalseg_tpu.utils import save_checkpoint
    model = VNet(in_channels=1, num_classes=2)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)))
    save_checkpoint(str(cfg_dir), jax.device_get(variables))

    raw = np.random.RandomState(0).uniform(
        -1200, 600, (10, 12, 14)).astype(np.float32)
    nifti.write(str(tmp_path / "scan.nii.gz"), raw)

    args = argparse.Namespace(
        config=str(cfg_dir / "deploy.yaml"),
        image_path=str(tmp_path / "scan.nii.gz"), batch_size=1,
        save_dir=str(tmp_path / "preds"), device="cpu",
        precision="fp32", enable_auto_tune=False, benchmark=False,
        with_argmax=False, use_swl=False)
    predictor = infer_cli.Predictor(args)
    outs = predictor.run([str(tmp_path / "scan.nii.gz")])
    pred = np.load(outs[0])
    assert pred.shape == (8, 8, 8)
    assert pred.dtype == np.int32


def test_predictor_sliding_window_mode(tmp_path):
    """--use_swl: native-resolution serving via sliding windows."""
    import yaml
    from medicalseg_tpu.io import nifti
    from medicalseg_tpu.models import VNet
    from medicalseg_tpu.utils import save_checkpoint

    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "deploy",
                                "python"))
    import importlib
    infer_cli = importlib.import_module("infer")

    cfg_dir = tmp_path / "export"
    cfg_dir.mkdir()
    model_cfg = {"type": "VNet", "in_channels": 1, "num_classes": 2}
    with open(cfg_dir / "deploy.yaml", "w") as f:
        yaml.dump({"Deploy": {
            "model": "missing.stablehlo", "params": "model.msgpack",
            "transforms": [], "input_shape_ndhwc": [1, 8, 8, 8, 1],
            "output_op": "argmax", "model_config": model_cfg}}, f)
    model = VNet(in_channels=1, num_classes=2)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)))
    save_checkpoint(str(cfg_dir), jax.device_get(variables))

    raw = np.random.RandomState(1).uniform(
        -1200, 600, (12, 14, 10)).astype(np.float32)
    nifti.write(str(tmp_path / "scan.nii.gz"), raw)

    args = argparse.Namespace(
        config=str(cfg_dir / "deploy.yaml"),
        image_path=str(tmp_path / "scan.nii.gz"), batch_size=1,
        save_dir=str(tmp_path / "preds"), device="cpu",
        precision="fp32", enable_auto_tune=False, benchmark=False,
        with_argmax=False, use_swl=True)
    predictor = infer_cli.Predictor(args)
    outs = predictor.run([str(tmp_path / "scan.nii.gz")])
    pred = np.load(outs[0])
    # native resolution preserved (not resized to the export ROI)
    assert pred.shape == (12, 14, 10)
    assert set(np.unique(pred)) <= {0, 1}


def test_narrow_conv_matches_lax():
    """ops.narrow_conv reassociation is numerically equivalent."""
    from jax import lax
    from medicalseg_tpu.ops.narrow_conv import narrow_conv3d_same
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 6, 7, 8, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 3).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    ours = narrow_conv3d_same(x, k, b, compute_dtype=jnp.float32)
    ref = lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-5)


def test_vnet_head_conv_variants_agree():
    from medicalseg_tpu.models import VNet
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 8, 8, 8, 1).astype(np.float32))
    m0 = VNet(in_channels=1, num_classes=2)
    v = jax.jit(lambda k, a: m0.init(k, a, train=False))(
        jax.random.PRNGKey(0), x)
    outs = {}
    for variant in ("default", "narrow", "lane_pad"):
        m = VNet(in_channels=1, num_classes=2, head_conv=variant)
        outs[variant] = np.asarray(jax.jit(
            lambda v_, a: m.apply(v_, a, train=False))(v, x)[0])
    np.testing.assert_allclose(outs["narrow"], outs["default"], atol=1e-4)
    np.testing.assert_allclose(outs["lane_pad"], outs["default"],
                               atol=1e-4)
