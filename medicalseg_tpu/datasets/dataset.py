# Copyright 2026. Apache License 2.0.
"""MedicalDataset: file-list dataset over preprocessed .npy volumes.

Parity target: reference medicalseg/datasets/dataset.py:29-125 — reads
``{train,val,test}_list.txt`` ("imgrel labelrel" pairs), auto-downloads
when dataset_root is None, repeats the train list x10 to amortize epoch
restarts, and applies Compose transforms in __getitem__ returning
(im, label, img_path).

TPU addition: ``raw_item`` exposes the untransformed volume pair so the
training loop can batch raw volumes and run augmentation on device
(:mod:`medicalseg_tpu.transforms.device`).
"""

import os

import numpy as np

from ..cvlibs import manager
from ..transforms import Compose
from ..utils import env as seg_env
from ..utils.download import download_file_and_uncompress


@manager.DATASETS.add_component
class MedicalDataset:
    """
    Args:
        dataset_root: directory holding the phase0 npy data + list files.
        result_dir: directory for next-phase results.
        transforms: list of transform objects (wrapped in Compose).
        num_classes: number of classes.
        mode: 'train' | 'val' | 'test'.
        ignore_index: label value ignored by losses.
        data_URL: auto-download source when dataset_root is None.
        dataset_json_path: nnU-Net-style geometry metadata (for eval
            artifact saving, reference core/val.py:73-74).
        repeat_train: train list repetition factor (reference x10,
            dataset.py:110-111).
    """

    def __init__(self,
                 dataset_root,
                 result_dir,
                 transforms,
                 num_classes,
                 mode="train",
                 ignore_index=255,
                 data_URL="",
                 dataset_json_path="",
                 repeat_train=10):
        self.dataset_root = dataset_root
        self.result_dir = result_dir
        self.raw_transforms = transforms
        self.transforms = Compose(transforms)
        self.file_list = list()
        self.mode = mode.lower()
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.dataset_json_path = dataset_json_path

        if self.dataset_root is None:
            self.dataset_root = download_file_and_uncompress(
                url=data_URL,
                savepath=seg_env.DATA_HOME,
                extrapath=seg_env.DATA_HOME)
        elif not os.path.exists(self.dataset_root):
            raise ValueError(
                "The `dataset_root` don't exist please specify the correct "
                "path to data.")

        if self.mode == "train":
            file_path = os.path.join(self.dataset_root, "train_list.txt")
        elif self.mode == "val":
            file_path = os.path.join(self.dataset_root, "val_list.txt")
        elif self.mode == "test":
            file_path = os.path.join(self.dataset_root, "test_list.txt")
        else:
            raise ValueError(
                "`mode` should be 'train', 'val' or 'test', but got {}."
                .format(mode))

        with open(file_path, "r") as f:
            for line in f:
                items = line.strip().split()
                if len(items) != 2:
                    raise Exception(
                        "File list format incorrect! It should be"
                        " image_name label_name\\n")
                image_path = os.path.join(self.dataset_root, items[0])
                grt_path = os.path.join(self.dataset_root, items[1])
                self.file_list.append([image_path, grt_path])

        if self.mode == "train":
            self.file_list = self.file_list * repeat_train

    def __getitem__(self, idx):
        image_path, label_path = self.file_list[idx]
        im, label = self.transforms(im=image_path, label=label_path)
        return im, label, self.file_list[idx][0]

    def raw_item(self, idx):
        """Untransformed (image, label) numpy pair for the on-device
        augmentation path."""
        image_path, label_path = self.file_list[idx]
        return np.load(image_path), np.load(label_path)

    def save_transformed(self):
        """Save the preprocessed images to the result_dir (kept for API
        parity; reference dataset.py:120-122 is also a stub)."""
        pass

    def __len__(self):
        return len(self.file_list)
