"""Utils substrate tests: metrics, timer, checkpointing, save_array,
get_image_list, profiler options."""
import os
import time

import numpy as np
import pytest

from medicalseg_tpu.utils import (TimeAverager, calculate_area,
                                  calculate_eta, dice, kappa,
                                  load_pretrained_model, mean_iou,
                                  accuracy, save_array, save_checkpoint,
                                  load_checkpoint, resume, get_image_list)


def test_calculate_area_and_metrics():
    pred = np.array([[0, 1], [2, 1]])
    label = np.array([[0, 1], [1, 255]])
    intersect, parea, larea = calculate_area(pred, label, num_classes=3,
                                             ignore_index=255)
    np.testing.assert_array_equal(np.asarray(intersect), [1, 1, 0])
    np.testing.assert_array_equal(np.asarray(parea), [1, 1, 1])
    np.testing.assert_array_equal(np.asarray(larea), [1, 2, 0])

    class_iou, miou = mean_iou(intersect, parea, larea)
    np.testing.assert_allclose(class_iou, [1.0, 0.5, 0.0])
    class_dice, mdice = dice(intersect, parea, larea)
    np.testing.assert_allclose(class_dice, [1.0, 2 / 3, 0.0])
    class_acc, macc = accuracy(intersect, parea)
    np.testing.assert_allclose(class_acc, [1.0, 1.0, 0.0])


def test_kappa_perfect():
    intersect = np.array([10, 20])
    area = np.array([10, 20])
    assert kappa(intersect, area, area) == pytest.approx(1.0)


def test_timer():
    t = TimeAverager()
    t.record(0.5, num_samples=2)
    t.record(1.5, num_samples=2)
    assert t.get_average() == pytest.approx(1.0)
    assert t.get_ips_average() == pytest.approx(2.0)
    assert calculate_eta(10, 6) == "00:01:00"
    assert calculate_eta(-5, 6) == "00:00:00"


def test_checkpoint_roundtrip(tmp_path):
    variables = {"params": {"w": np.arange(6, dtype=np.float32).reshape(
        2, 3)}, "batch_stats": {"mean": np.zeros(3, np.float32)}}
    opt_state = {"momentum": np.ones(3, np.float32)}
    d = str(tmp_path / "iter_7")
    save_checkpoint(d, variables, opt_state, step=7)

    tpl = {"params": {"w": np.zeros((2, 3), np.float32)},
           "batch_stats": {"mean": np.ones(3, np.float32)}}
    opt_tpl = {"momentum": np.zeros(3, np.float32)}
    got, got_opt, step = load_checkpoint(d, tpl, opt_tpl)
    np.testing.assert_array_equal(got["params"]["w"],
                                  variables["params"]["w"])
    np.testing.assert_array_equal(got_opt["momentum"],
                                  opt_state["momentum"])
    assert step == 7

    # resume parses state correctly
    got2, opt2, it = resume(tpl, opt_tpl, d)
    assert it == 7

    # per-key shape-checked pretrained loading skips mismatches
    tpl_bad = {"params": {"w": np.zeros((4, 3), np.float32)},
               "batch_stats": {"mean": np.ones(3, np.float32)}}
    loaded, n = load_pretrained_model(tpl_bad, d)
    assert n == 1  # only batch_stats/mean matches
    np.testing.assert_array_equal(loaded["params"]["w"],
                                  tpl_bad["params"]["w"])


def test_save_array(tmp_path):
    content = {"pred": np.random.RandomState(0).randint(
        0, 3, (1, 4, 4, 4))}
    save_array(str(tmp_path), content, form=("npy", "nii.gz"),
               image_infor={"spacing_resample": (1, 1, 2),
                            "origin": (0, 0, 0),
                            "direction": tuple(np.eye(3).flatten())})
    assert os.path.exists(str(tmp_path / "pred.npy"))
    assert os.path.exists(str(tmp_path / "pred.nii.gz"))
    from medicalseg_tpu.io import nifti
    data, meta = nifti.read(str(tmp_path / "pred.nii.gz"))
    np.testing.assert_array_equal(data, np.squeeze(content["pred"]))


def test_get_image_list(tmp_path):
    (tmp_path / "a.nii.gz").write_bytes(b"x")
    (tmp_path / "b_segmentation.nii.gz").write_bytes(b"x")
    (tmp_path / "c.txt").write_bytes(b"x")
    all_files = get_image_list(str(tmp_path))
    assert len(all_files) == 2
    imgs = get_image_list(str(tmp_path), ("nii.gz",),
                          {"segmentation": False})
    labs = get_image_list(str(tmp_path), ("nii.gz",),
                          {"segmentation": True})
    assert len(imgs) == 1 and "a.nii" in imgs[0]
    assert len(labs) == 1 and "segmentation" in labs[0]


def test_profiler_options():
    from medicalseg_tpu.utils.train_profiler import ProfilerOptions
    opts = ProfilerOptions(
        "batch_range=[50,60];profile_path=/tmp/p;exit_on_finished=false;"
        "tracer_option=OpDetail")
    assert opts["batch_range"] == [50, 60]
    assert opts["profile_path"] == "/tmp/p"
    assert opts["exit_on_finished"] is False
    with pytest.raises(ValueError):
        opts["nope"]


def test_visualize():
    from medicalseg_tpu.utils.visualize import (get_color_map_list,
                                                get_pseudo_color_map,
                                                visualize)
    cm = get_color_map_list(3)
    assert len(cm) == 9
    pred = np.array([[0, 1], [2, 0]])
    rgb = get_pseudo_color_map(pred)
    assert rgb.shape == (2, 2, 3)
    img = np.random.RandomState(0).rand(2, 2)
    out = visualize(img, pred)
    assert out.shape == (2, 2, 3) and out.dtype == np.uint8
