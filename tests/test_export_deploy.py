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
