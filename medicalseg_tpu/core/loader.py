# Copyright 2026. Apache License 2.0.
"""Host data pipeline feeding the device.

Replaces paddle.io.DataLoader + DistributedBatchSampler (reference
core/train.py:87-95) with an iteration-oriented, prefetching loader:

  * ``device`` mode (default when every transform has a device
    implementation): workers only mmap/stack raw phase0 .npy volumes —
    augmentation runs fused in the jitted train step on TPU. An optional
    RAM cache keeps the (small) phase0 datasets resident, making the
    reader cost ~a memcpy.
  * ``host`` mode (fallback): the reference behavior — Compose runs
    per-sample in a thread pool.

Sharding across hosts is by file-list partition (parallel.mesh.
process_shard); device-level batch sharding happens when the batch is
placed onto the mesh.
"""

import queue
import threading

import numpy as np

from ..transforms import device_supports
from ..utils import logger


class TrainLoader:
    """Infinite shuffled batch iterator over a MedicalDataset.

    Yields (images, labels) numpy arrays:
      * device mode: images [N, D, H, W] float32 raw, labels [N, D, H, W]
      * host mode: images [N, D, H, W, 1] float32 transformed, labels int
    """

    def __init__(self, dataset, batch_size, shuffle=True, num_workers=2,
                 seed=0, mode="auto", cache=True, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.rng = np.random.RandomState(seed)
        self.cache = {} if cache else None

        if mode == "auto":
            mode = "device" if device_supports(
                getattr(dataset, "raw_transforms", None) or []) else "host"
        self.mode = mode
        logger.info("TrainLoader mode: {} (batch_size={})".format(
            self.mode, batch_size))

        # native C++ threaded reader (native/medloader.cpp) for the raw
        # volume path; falls back to numpy when the toolchain is absent
        self._native_img = None
        self._native_lab = None
        self._native_map = None
        if self.mode == "device":
            try:
                from ..data_native import NativeVolumeLoader
                # dedupe paths (the train list is repeated x10, reference
                # dataset.py:110-111) so the native LRU cache holds each
                # volume once
                uniq = sorted({tuple(p) for p in dataset.file_list})
                self._native_map = {
                    pair: i for i, pair in enumerate(uniq)}
                self._native_img = NativeVolumeLoader(
                    [p[0] for p in uniq], threads=num_workers)
                self._native_lab = NativeVolumeLoader(
                    [p[1] for p in uniq], threads=num_workers)
            except Exception as e:
                logger.warning("native loader disabled: {}".format(e))

        self._indices = None
        self._pos = 0
        self._queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    def _next_indices(self):
        # per-host file-list shard (replaces DistributedBatchSampler's
        # per-rank sharding, reference core/train.py:87-88); device-level
        # batch sharding happens when the batch lands on the mesh
        from ..parallel.mesh import process_shard
        lo, hi = process_shard(len(self.dataset))
        n = max(1, hi - lo)
        out = []
        while len(out) < self.batch_size:
            if self._indices is None or self._pos >= len(self._indices):
                self._indices = lo + np.arange(n)
                if self.shuffle:
                    self.rng.shuffle(self._indices)
                self._pos = 0
            take = min(self.batch_size - len(out),
                       len(self._indices) - self._pos)
            out.extend(self._indices[self._pos:self._pos + take])
            self._pos += take
        return np.asarray(out)

    def _load_raw(self, idx):
        if self.cache is not None:
            path = self.dataset.file_list[idx][0]
            if path not in self.cache:
                self.cache[path] = self.dataset.raw_item(idx)
            return self.cache[path]
        return self.dataset.raw_item(idx)

    def _make_batch(self):
        idxs = self._next_indices()
        if self.mode == "device":
            if self._native_img is not None:
                uidx = [self._native_map[tuple(self.dataset.file_list[i])]
                        for i in idxs]
                images = self._native_img.load_batch(uidx, np.float32)
                labels = self._native_lab.load_batch(uidx, np.int32)
                return images, labels
            pairs = [self._load_raw(i) for i in idxs]
            images = np.stack([np.asarray(p[0], np.float32)
                               for p in pairs])
            labels = np.stack([np.asarray(p[1], np.int32) for p in pairs])
            return images, labels
        ims, labs = [], []
        for i in idxs:
            im, lab, _ = self.dataset[int(i)]
            # Compose gives [1, D, H, W]; NDHWC wants [D, H, W, 1]
            ims.append(np.moveaxis(np.asarray(im, np.float32), 0, -1))
            labs.append(np.asarray(lab, np.int32))
        return np.stack(ims), np.stack(labs)

    def _producer(self):
        while not self._stop.is_set():
            try:
                batch = self._make_batch()
            except Exception as e:  # surface loader errors to consumer
                self._queue.put(e)
                return
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if isinstance(item, Exception):
            raise item
        return item

    def stop(self):
        self._stop.set()

    @property
    def iters_per_epoch(self):
        return max(1, len(self.dataset) // self.batch_size)


class EvalLoader:
    """Sequential batch-size-1 loader over the val set (reference
    core/val.py:65-71). Yields (image NDHWC [1,D,H,W,1], label [1,D,H,W],
    index). ``start``/``stop`` select a per-process shard of the index
    range (reference DistributedBatchSampler, val.py:65-71)."""

    def __init__(self, dataset, start=0, stop=None):
        self.dataset = dataset
        self.start = int(start)
        self.stop = len(dataset) if stop is None else int(stop)

    def __len__(self):
        return max(self.stop - self.start, 0)

    def __iter__(self):
        for idx in range(self.start, self.stop):
            im, label, _ = self.dataset[idx]
            im = np.moveaxis(np.asarray(im, np.float32), 0, -1)[None]
            label = np.asarray(label, np.int32)[None]
            yield im, label, idx
