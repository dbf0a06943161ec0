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


def test_checkpoint_atomic_and_validity(tmp_path):
    """Saves never leave partial msgpack files; is_valid_checkpoint
    rejects a dir that a mid-save SIGTERM left without opt.msgpack
    (ADVICE r3: run-spine-flagship.sh resume crash)."""
    from medicalseg_tpu.utils.checkpoint import is_valid_checkpoint

    variables = {"params": {"w": np.zeros((2, 2), np.float32)}}
    opt_state = {"m": np.zeros(2, np.float32)}
    d = str(tmp_path / "iter_3")
    save_checkpoint(d, variables, opt_state, step=3)
    assert is_valid_checkpoint(d)
    assert not any(f.endswith(".tmp") for f in os.listdir(d))

    # Simulate interruption between the two file writes.
    os.remove(os.path.join(d, "opt.msgpack"))
    assert not is_valid_checkpoint(d)
    assert is_valid_checkpoint(d, require_opt=False)
    assert not is_valid_checkpoint(str(tmp_path / "iter_9"))


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


def test_progbar_running_means(capsys):
    from medicalseg_tpu.utils import Progbar
    bar = Progbar(target=4, verbose=1, interval=0.0,
                  stateful_metrics=["lr"])
    bar.update(1, [("loss", 2.0), ("lr", 0.1)])
    bar.update(2, [("loss", 4.0), ("lr", 0.2)])
    # running mean of loss = 3.0; lr reported verbatim (stateful)
    assert bar._metrics["loss"].value == pytest.approx(3.0)
    assert bar._metrics["lr"] == 0.2
    bar.update(4, [("loss", 3.0)], finalize=True)
    out = capsys.readouterr().out
    assert "4/4" in out and "loss" in out and out.endswith("\n")


def test_progbar_unknown_target(capsys):
    from medicalseg_tpu.utils import Progbar
    bar = Progbar(target=None, verbose=1, interval=0.0)
    bar.update(3, [("d", 0.5)])
    assert "Unknown" in capsys.readouterr().out


def test_download_file_and_uncompress_local_zip(tmp_path):
    import zipfile
    from medicalseg_tpu.utils.download import download_file_and_uncompress
    src = tmp_path / "payload"
    src.mkdir()
    (src / "f.txt").write_text("hello")
    archive = tmp_path / "payload.zip"
    with zipfile.ZipFile(archive, "w") as z:
        z.write(src / "f.txt", "payload/f.txt")

    url = "file://" + str(archive)
    save = tmp_path / "dl"
    extra = tmp_path / "data"
    out = download_file_and_uncompress(url, savepath=str(save),
                                       extrapath=str(extra),
                                       print_progress=False)
    assert out == str(extra / "payload")
    assert (extra / "payload" / "f.txt").read_text() == "hello"
    # second call resumes (no re-download even if archive is deleted)
    (save / "payload.zip").unlink()
    out2 = download_file_and_uncompress(url, savepath=str(save),
                                        extrapath=str(extra),
                                        print_progress=False)
    assert out2 == out


def test_download_extraname_plain_file(tmp_path):
    from medicalseg_tpu.utils.download import download_file_and_uncompress
    blob = tmp_path / "weights.msgpack"
    blob.write_bytes(b"\x00\x01")
    out = download_file_and_uncompress(
        "file://" + str(blob), savepath=str(tmp_path / "s"),
        extrapath=str(tmp_path / "e"), extraname="model",
        print_progress=False)
    assert out == str(tmp_path / "e" / "model")
    assert (tmp_path / "e" / "model" / "weights.msgpack").exists()
