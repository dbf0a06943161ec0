"""Fixed-seed oracle for the host transform pipeline.

The augmentation DISTRIBUTION is part of the reproduction contract: the
reference draws from python `random` / `np.random` in a specific order
(medicalseg/transforms/transform.py:112-339), and training recipes were
tuned under that stream. These hashes pin the exact draw sequence and
the resulting arrays, so the transform implementation can be
restructured freely without silently changing the sampled geometry.

Values were captured from the round-2 implementation whose sampling was
verified line-by-line against the reference.
"""
import hashlib
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from medicalseg_tpu.transforms.transform import (  # noqa: E402
    BinaryMaskToConnectComponent, Compose, RandomFlip3D, RandomResizedCrop3D,
    RandomRotation3D, Resize3D, TopkLargestConnectComponent)


def _h(a):
    return hashlib.md5(np.ascontiguousarray(a).tobytes()).hexdigest()[:16]


def _data():
    img = (np.random.RandomState(3).rand(20, 24, 16) * 255).astype(
        np.float32)
    lab = (np.random.RandomState(4).rand(20, 24, 16) > 0.7).astype(
        np.int32) * 2
    return img, lab


def test_crop_param_draw_sequence():
    img, _ = _data()
    random.seed(123)
    np.random.seed(123)
    t = RandomResizedCrop3D(size=12, scale=(0.8, 1.2))
    p = t.get_params(img, t.scale, t.ratio)
    assert list(p) == [0, 1, 0, 19, 20, 16]


def test_crop_apply():
    img, lab = _data()
    random.seed(7)
    np.random.seed(7)
    t = RandomResizedCrop3D(size=12, scale=(0.8, 1.2))
    im, lb = t(img, lab)
    assert im.shape == (12, 12, 12) and lb.shape == (12, 12, 12)
    assert _h(im) == "663d37a7c14d6563"
    assert _h(lb) == "52044e0e49b04e0c"


def test_pre_crop_nonzero_mask():
    img, lab = _data()
    random.seed(11)
    np.random.seed(11)
    t = RandomResizedCrop3D(size=8, scale=(0.9, 1.1), pre_crop=True,
                            nonzero_mask=True)
    im, lb = t(img, lab)
    assert _h(im) == "81acb9f1717c0b1e"
    assert _h(lb) == "a9e50002b5cc7e91"


def test_rotation_draw_and_apply():
    img, lab = _data()
    random.seed(5)
    np.random.seed(5)
    r = RandomRotation3D(degrees=30)
    angle, plane = r.get_params(r.degrees)
    assert abs(angle - 7.374101693382116) < 1e-12
    assert list(plane) == [1, 2]
    random.seed(5)
    np.random.seed(5)
    im, lb = r(img, lab)
    assert _h(im) == "e21a3077245ba588"
    assert _h(lb) == "c7d104a45617e9b8"


def test_flip_draw_and_apply():
    img, lab = _data()
    random.seed(9)
    np.random.seed(9)
    im, lb = RandomFlip3D()(img, lab)
    assert _h(im) == "076a52af4a54d66e"
    assert _h(lb) == "45e963374a47bcad"


def test_resize_fixed():
    img, lab = _data()
    im, lb = Resize3D((10, 12, 8))(img, lab)
    assert _h(im) == "ac263f7bfb39b8d7"
    assert _h(lb) == "d9bed08fbfcb68aa"


def test_compose_pipeline():
    img, lab = _data()
    random.seed(21)
    np.random.seed(21)
    c = Compose([RandomResizedCrop3D(size=12), RandomFlip3D()])
    im, lb = c(img.copy(), lab.copy())
    assert im.shape == (1, 12, 12, 12)
    assert _h(im) == "5da76eb3ad937812"
    assert _h(lb) == "e2907e13b153d276"


def test_connected_components():
    pred = np.zeros((12, 12, 12), np.uint8)
    pred[1:3, 1:3, 1:3] = 1
    pred[6:11, 6:11, 6:11] = 1
    cc, _ = BinaryMaskToConnectComponent()(pred.copy())
    assert int(cc.max()) == 2
    assert _h(cc) == "2dcb22ecbd15a81e"
    tk, _ = TopkLargestConnectComponent(k=1)(pred.copy())
    assert int(tk.max()) == 1
    assert _h(tk) == "eb95ee01eb762157"
