"""Export -> deploy round trip: StableHLO serialization + Predictor."""
import argparse
import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    import yaml
    tmp = tmp_path_factory.mktemp("export")
    cfg_path = str(tmp / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.dump({
            "data_root": "data/",
            "iters": 10,
            "model": {"type": "VNet", "in_channels": 1, "num_classes": 2},
            "val_dataset": {"type": "MedicalDataset", "transforms": []},
        }, f)

    import export as export_cli
    args = argparse.Namespace(
        cfg=cfg_path, save_dir=str(tmp / "out"), model_path=None,
        without_argmax=False, with_softmax=False,
        input_shape=[1, 1, 16, 16, 16],
        shape_buckets=[16, 16, 16, 32, 32, 32])
    export_cli.main(args)
    return str(tmp / "out")


def test_export_artifacts(exported):
    assert os.path.exists(osp.join(exported, "deploy.yaml"))
    assert os.path.exists(osp.join(exported, "model.msgpack"))
    # StableHLO export should have succeeded on this jax version
    assert os.path.exists(osp.join(exported, "model.stablehlo"))


def test_predictor_runs(exported, tmp_path):
    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "deploy",
                                "python"))
    import importlib
    infer_cli = importlib.import_module("infer")

    vol = np.random.RandomState(0).rand(16, 16, 16).astype(np.float32)
    img_path = str(tmp_path / "v.npy")
    np.save(img_path, vol)

    args = argparse.Namespace(
        config=osp.join(exported, "deploy.yaml"),
        image_path=img_path, batch_size=1,
        save_dir=str(tmp_path / "preds"), device="cpu",
        precision="fp32", enable_auto_tune=False, benchmark=True,
        with_argmax=False, use_swl=False)
    predictor = infer_cli.Predictor(args)
    outputs = predictor.run([img_path])
    assert len(outputs) == 1
    pred = np.load(outputs[0])
    assert pred.shape == (16, 16, 16)  # argmax'd at export time
    assert pred.dtype == np.int32
    assert set(np.unique(pred)) <= {0, 1}


def test_quantize_roundtrip():
    """Weight-only int8: per-channel symmetric absmax keeps relative
    error within the 8-bit budget and skips small/1-D leaves."""
    from medicalseg_tpu.utils import quant

    rng = np.random.RandomState(0)
    tree = {
        "params": {
            "Conv_0": {"kernel": rng.randn(5, 5, 5, 4, 8).astype(
                np.float32) * np.logspace(-2, 0, 8, dtype=np.float32),
                "bias": rng.randn(8).astype(np.float32)},
        },
        "batch_stats": {"BatchNorm_0": {"mean": rng.randn(8).astype(
            np.float32)}},
    }
    q = quant.quantize_tree(tree, min_size=64)
    # kernel quantized, 1-D leaves untouched
    assert quant.QUANT_KEY in q["params"]["Conv_0"]["kernel"]
    assert q["params"]["Conv_0"]["kernel"][quant.QUANT_KEY].dtype == \
        np.int8
    np.testing.assert_array_equal(q["params"]["Conv_0"]["bias"],
                                  tree["params"]["Conv_0"]["bias"])
    d = quant.dequantize_tree(q)
    w, wq = tree["params"]["Conv_0"]["kernel"], np.asarray(
        d["params"]["Conv_0"]["kernel"])
    # symmetric absmax int8: error <= scale/2 = absmax/254 per channel
    absmax = np.abs(w).max(axis=(0, 1, 2, 3))
    assert (np.abs(w - wq) <= absmax / 254 + 1e-7).all()


@pytest.mark.slow
def test_predictor_int8(exported, tmp_path):
    """--precision int8 serves from weight-quantized parameters and
    agrees with the fp32 path on nearly every voxel (the TRT-int8
    analog, reference deploy/python/infer.py:286-321)."""
    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "deploy",
                                "python"))
    import importlib
    infer_cli = importlib.import_module("infer")

    vol = np.random.RandomState(2).rand(16, 16, 16).astype(np.float32)
    img_path = str(tmp_path / "v.npy")
    np.save(img_path, vol)

    outs = {}
    for precision in ("fp32", "int8"):
        args = argparse.Namespace(
            config=osp.join(exported, "deploy.yaml"),
            image_path=img_path, batch_size=1,
            save_dir=str(tmp_path / ("preds_" + precision)),
            device="cpu", precision=precision, enable_auto_tune=False,
            benchmark=False, with_argmax=False, use_swl=False)
        predictor = infer_cli.Predictor(args)
        if precision == "int8":
            from medicalseg_tpu.utils import quant
            kernels = [k for k in _iter_leaf_dicts(predictor._variables)
                       if quant.QUANT_KEY in k]
            assert kernels, "int8 predictor holds no quantized weights"
        outs[precision] = np.load(predictor.run([img_path])[0])
    assert outs["int8"].shape == outs["fp32"].shape
    agreement = (outs["int8"] == outs["fp32"]).mean()
    assert agreement >= 0.9, agreement

    # sliding-window serving with int8: the dequant-aware apply wrapper
    # must be built once and reused (a fresh closure per flush would
    # retrace the whole window-scan program per batch)
    args = argparse.Namespace(
        config=osp.join(exported, "deploy.yaml"), image_path=img_path,
        batch_size=1, save_dir=str(tmp_path / "preds_swl"),
        device="cpu", precision="int8", enable_auto_tune=False,
        benchmark=False, with_argmax=True, use_swl=True)
    predictor = infer_cli.Predictor(args)
    out1 = predictor.run([img_path])
    fn1 = predictor._swl_apply
    out2 = predictor.run([img_path])
    assert predictor._swl_apply is fn1
    assert np.load(out1[0]).shape == np.load(out2[0]).shape


def _iter_leaf_dicts(tree):
    if isinstance(tree, dict):
        yield tree
        for v in tree.values():
            yield from _iter_leaf_dicts(v)


@pytest.mark.slow
def test_predictor_shape_buckets(exported, tmp_path):
    """Variable-size volumes route to the smallest fitting bucket
    (reference TRT auto-tuned dynamic shapes, infer.py:178-224): a 16^3
    input uses the 16-bucket; a 24^3 input pads into the 32-bucket and
    the prediction is cropped back to 24^3."""
    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "deploy",
                                "python"))
    import importlib
    import yaml
    infer_cli = importlib.import_module("infer")

    with open(osp.join(exported, "deploy.yaml")) as f:
        dic = yaml.safe_load(f)
    assert dic["Deploy"]["shape_buckets"] == [[16, 16, 16], [32, 32, 32]]
    assert osp.exists(osp.join(exported, "model_16x16x16.stablehlo"))
    assert osp.exists(osp.join(exported, "model_32x32x32.stablehlo"))

    rng = np.random.RandomState(1)
    paths = []
    for i, size in enumerate((16, 24)):
        p = str(tmp_path / "v{}.npy".format(i))
        np.save(p, rng.rand(size, size, size).astype(np.float32))
        paths.append(p)

    args = argparse.Namespace(
        config=osp.join(exported, "deploy.yaml"),
        image_path=str(tmp_path), batch_size=1,
        save_dir=str(tmp_path / "preds"), device="cpu",
        precision="fp32", enable_auto_tune=False, benchmark=False,
        with_argmax=False, use_swl=False)
    outputs = infer_cli.Predictor(args).run(paths)
    assert len(outputs) == 2
    assert np.load(outputs[0]).shape == (16, 16, 16)
    p24 = np.load(outputs[1])
    assert p24.shape == (24, 24, 24)  # cropped back from the 32-bucket
    assert p24.dtype == np.int32
