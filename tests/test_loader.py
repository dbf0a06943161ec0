"""TrainLoader / EvalLoader / native loader tests."""
import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from tools.generate_synthetic_dataset import generate
    from medicalseg_tpu.datasets import MedicalDataset
    from medicalseg_tpu.transforms import RandomFlip3D
    root = tmp_path_factory.mktemp("data")
    phase0 = generate(str(root), num_volumes=5, size=8, seed=0)
    return MedicalDataset(
        dataset_root=phase0, result_dir=phase0,
        transforms=[RandomFlip3D()], num_classes=3, mode="train",
        repeat_train=3)


def test_device_mode_batches(dataset):
    from medicalseg_tpu.core.loader import TrainLoader
    loader = TrainLoader(dataset, batch_size=2, num_workers=1, seed=0,
                         mode="device")
    try:
        images, labels = next(loader)
        assert images.shape == (2, 8, 8, 8)
        assert images.dtype == np.float32
        assert labels.shape == (2, 8, 8, 8)
        assert labels.dtype == np.int32
        # native path should be active (toolchain present in image)
        assert loader._native_img is not None
        # several batches work and reshuffle across epochs
        for _ in range(8):
            next(loader)
    finally:
        loader.stop()


def test_host_mode_batches(dataset):
    from medicalseg_tpu.core.loader import TrainLoader
    loader = TrainLoader(dataset, batch_size=2, num_workers=1, seed=0,
                         mode="host")
    try:
        images, labels = next(loader)
        assert images.shape == (2, 8, 8, 8, 1)
        assert images.dtype == np.float32
        assert float(images.max()) <= 1.0 + 1e-6  # Compose divide-by-max
    finally:
        loader.stop()


def test_eval_loader(dataset):
    from medicalseg_tpu.core.loader import EvalLoader
    from medicalseg_tpu.datasets import MedicalDataset
    val = MedicalDataset(
        dataset_root=dataset.dataset_root,
        result_dir=dataset.result_dir, transforms=[], num_classes=3,
        mode="val")
    loader = EvalLoader(val)
    items = list(loader)
    assert len(items) == len(val)
    im, label, idx = items[0]
    assert im.shape == (1, 8, 8, 8, 1)
    assert label.shape == (1, 8, 8, 8)


def test_auto_mode_selects_device(dataset):
    from medicalseg_tpu.core.loader import TrainLoader
    # small dataset, device-supported transforms -> whole-dataset HBM
    # cache (index-only dispatches)
    loader = TrainLoader(dataset, batch_size=1, num_workers=1, mode="auto")
    try:
        assert loader.mode == "device_cache"
    finally:
        loader.stop()
    # too big for HBM -> streaming device mode
    loader = TrainLoader(dataset, batch_size=1, num_workers=1, mode="auto",
                         device_cache_bytes=0)
    try:
        assert loader.mode == "device"
    finally:
        loader.stop()
