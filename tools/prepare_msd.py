# Copyright 2026. Apache License 2.0.
"""Medical Segmentation Decathlon (MSD) preprocessing.

Parity target: reference tools/prepare_msd.py:67-174 — the ten Decathlon
task archives, HU windowing + resample to 128^3 (labels order=0), 0.75
split, dataset.json metadata parsed from the task's own dataset.json.

Fixes vs reference (SURVEY §2.5 known bugs): the ``HUNorm`` import
mismatch and the ``prep.image_dir`` NameError are corrected;
``load_save`` is called with the preprocess pipeline.

Usage: python tools/prepare_msd.py 4   # prepare Task04_Hippocampus
"""

import functools
import os
import os.path as osp
import sys

sys.path.append(osp.join(osp.dirname(osp.realpath(__file__)), ".."))

from medicalseg_tpu.utils import logger  # noqa: E402
from tools.prepare import Prep  # noqa: E402
from tools.preprocess_utils import (HUnorm, parse_msd_basic_info,  # noqa: E402
                                    resample)

# Task id -> (archive name, bcebos url) (reference prepare_msd.py:67-110;
# urls elided to the stable bcebos object paths)
TASKS = {
    1: "Task01_BrainTumour",
    2: "Task02_Heart",
    3: "Task03_Liver",
    4: "Task04_Hippocampus",
    5: "Task05_Prostate",
    6: "Task06_Lung",
    7: "Task07_Pancreas",
    8: "Task08_HepaticVessel",
    9: "Task09_Spleen",
    10: "Task10_Colon",
}

TASK_URLS = {
    task_id: "https://msd-for-monai.s3-us-west-2.amazonaws.com/{}.tar".
    format(name) for task_id, name in TASKS.items()
}


def wrapped_partial(func, *args, **kwargs):
    partial = functools.partial(func, *args, **kwargs)
    functools.update_wrapper(partial, func)
    return partial


class Prep_msd(Prep):
    def __init__(self, task_id, download=True):
        if task_id not in TASKS:
            raise ValueError("MSD task id must be in 1..10, got {}".format(
                task_id))
        task_name = TASKS[task_id]
        self.task_name = task_name

        # archives extract to <task>/(<task>/)imagesTr etc.
        dataset_root = osp.join("data", task_name)
        raw_dir = task_name + "_raw/"
        nested = osp.join(task_name, task_name)
        base = nested if osp.exists(
            osp.join(dataset_root, raw_dir, nested)) else task_name

        super().__init__(
            dataset_root=dataset_root,
            raw_dataset_dir=raw_dir,
            images_dir=osp.join(base, "imagesTr"),
            labels_dir=osp.join(base, "labelsTr"),
            phase_dir=task_name + "_phase0/",
            urls={task_name + ".tar": TASK_URLS[task_id]} if download
            else {},
            valid_suffix=("nii.gz", "nii.gz"),
            # MSD hides originals as ._ files; exclude them
            filter_key=({"._": False}, {"._": False}),
            uncompress_params={"format": "tar", "num_files": 1})

        self.preprocess = {
            "images": [
                HUnorm,
                wrapped_partial(resample, new_shape=[128, 128, 128],
                                order=1)],
            "labels": [
                wrapped_partial(resample, new_shape=[128, 128, 128],
                                order=0)],
        }

    def generate_txt(self, train_split=0.75):
        txtname = [
            osp.join(self.phase_path, "train_list.txt"),
            osp.join(self.phase_path, "val_list.txt"),
        ]
        image_files_npy = sorted(os.listdir(self.image_path))
        label_files_npy = sorted(os.listdir(self.label_path))
        for txt in txtname:
            self.split_files_txt(txt, image_files_npy, label_files_npy,
                                 train_split)


if __name__ == "__main__":
    if len(sys.argv) != 2:
        raise SystemExit(
            "Please provide task id. Example usage: \n\t python "
            "tools/prepare_msd.py 4 # for preparing MSD task 4")
    task_id = int(sys.argv[1])

    prep = Prep_msd(task_id)
    json_path = osp.join(osp.dirname(prep.image_dir), "dataset.json")
    modalities, labels, dataset_name = parse_msd_basic_info(json_path)
    prep.generate_dataset_json(modalities, labels, dataset_name)
    prep.load_save(preprocess=prep.preprocess)
    prep.generate_txt()
    logger.info("{} phase0 ready.".format(prep.task_name))
