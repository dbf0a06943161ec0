"""Offline preprocessing pipeline tests: Prep over synthetic NIfTI raw
data -> dataset.json -> npy phase0 -> list files (SURVEY §2.5)."""
import json
import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from medicalseg_tpu.io import nifti  # noqa: E402


@pytest.fixture()
def raw_dataset(tmp_path):
    """A fake raw dataset: 4 nii.gz images + labels."""
    root = tmp_path / "ds"
    img_dir = root / "raw" / "imgs"
    lab_dir = root / "raw" / "labs"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        img = (rng.rand(10, 12, 14) * 1800 - 1200).astype(np.float32)
        lab = rng.randint(0, 3, (10, 12, 14)).astype(np.int32)
        nifti.write(str(img_dir / "case_{:02d}.nii.gz".format(i)), img,
                    spacing=(1.0, 1.0, 2.0))
        nifti.write(str(lab_dir / "case_{:02d}.nii.gz".format(i)), lab,
                    spacing=(1.0, 1.0, 2.0))
    return str(root)


def test_prep_pipeline(raw_dataset):
    import functools
    from tools.prepare import Prep
    from tools.preprocess_utils import HUnorm, resample

    prep = Prep(
        dataset_root=raw_dataset,
        raw_dataset_dir="raw",
        images_dir="imgs",
        labels_dir="labs",
        phase_dir="phase0",
        urls=None,
        valid_suffix=("nii.gz",),
        filter_key=(None, None))
    assert len(prep.image_files) == 4
    assert len(prep.label_files) == 4

    json_path = prep.generate_dataset_json(
        modalities=("CT",),
        labels={0: "bg", 1: "a", 2: "b"},
        dataset_name="fake")
    with open(json_path) as f:
        dataset_json = json.load(f)
    assert dataset_json["numTraining"] == 4
    rec = dataset_json["training"]["case_00"]
    assert rec["shape"] == [10, 12, 14]
    np.testing.assert_allclose(rec["spacing"], (1.0, 1.0, 2.0))

    def wp(func, **kw):
        p = functools.partial(func, **kw)
        functools.update_wrapper(p, func)
        return p

    prep.load_save(preprocess={
        "images": [HUnorm, wp(resample, new_shape=[8, 8, 8], order=1)],
        "labels": [wp(resample, new_shape=[8, 8, 8], order=0)],
    })

    img_npys = sorted(os.listdir(prep.image_path))
    lab_npys = sorted(os.listdir(prep.label_path))
    assert len(img_npys) == 4 and len(lab_npys) == 4
    img = np.load(osp.join(prep.image_path, img_npys[0]))
    lab = np.load(osp.join(prep.label_path, lab_npys[0]))
    assert img.shape == (8, 8, 8) and img.dtype == np.float32
    assert lab.shape == (8, 8, 8) and lab.dtype == np.int32
    assert img.min() >= 0 and img.max() <= 255
    assert set(np.unique(lab)) <= {0, 1, 2}

    # spacing_resample recorded back into dataset.json
    with open(json_path) as f:
        dataset_json = json.load(f)
    assert "spacing_resample" in dataset_json["training"]["case_00"]

    # list files: 80/20 split
    prep.split_files_txt(osp.join(prep.phase_path, "train_list.txt"),
                         img_npys, lab_npys)
    prep.split_files_txt(osp.join(prep.phase_path, "val_list.txt"),
                         img_npys, lab_npys)
    train_lines = open(osp.join(
        prep.phase_path, "train_list.txt")).read().strip().split("\n")
    val_lines = open(osp.join(
        prep.phase_path, "val_list.txt")).read().strip().split("\n")
    assert len(train_lines) == 3 and len(val_lines) == 1
    assert train_lines[0].startswith("images/") and \
        "labels/" in train_lines[0]


def test_reorient_to_lps():
    from tools.prepare import reorient_to_lps
    rng = np.random.RandomState(1)
    vol = rng.rand(4, 5, 6).astype(np.float32)
    # flipped x axis direction
    meta = {"direction": (-1, 0, 0, 0, 1, 0, 0, 0, 1),
            "spacing": (1.0, 2.0, 3.0)}
    out, new_meta = reorient_to_lps(vol, meta)
    np.testing.assert_allclose(out, vol[:, :, ::-1])
    np.testing.assert_allclose(
        np.asarray(new_meta["direction"]).reshape(3, 3), np.eye(3))
    # identity direction is a no-op
    out2, _ = reorient_to_lps(vol, {"direction": tuple(np.eye(3).flatten()),
                                    "spacing": (1, 1, 1)})
    np.testing.assert_allclose(out2, vol)


def test_label_remap_and_normalize_cpu_fallback():
    from tools import preprocess_utils as pu
    old = pu.use_device()
    try:
        pu.set_use_device(False)
        lab = np.array([0, 1, 5, 20])
        out = pu.label_remap(lab, {5: 2, 20: 3})
        np.testing.assert_array_equal(out, [0, 1, 2, 3])
        img = np.array([0.0, 1325.0, 2650.0])
        np.testing.assert_allclose(
            pu.normalize(img, 0, 2650), [0.0, 0.5, 1.0])
        hu = pu.HUnorm(np.array([-1200.0, 600.0]))
        np.testing.assert_allclose(hu, [0.0, 255.0])
        # HUNorm alias (fixes reference prepare_msd.py:64 bug)
        assert pu.HUNorm is pu.HUnorm
    finally:
        pu.set_use_device(old)
