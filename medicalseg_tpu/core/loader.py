# Copyright 2026. Apache License 2.0.
"""Host data pipeline feeding the device.

Replaces paddle.io.DataLoader + DistributedBatchSampler (reference
core/train.py:87-95) with an iteration-oriented, prefetching loader:

  * ``device`` mode (default when every transform has a device
    implementation): workers only mmap/stack raw phase0 .npy volumes —
    augmentation runs fused in the jitted train step on TPU. A
    byte-bounded LRU RAM cache keeps hot volumes resident.
  * ``device_cache`` mode: the whole (deduped) dataset is staged into
    device HBM once (see :class:`DeviceCache`); the loader then yields
    only [B] int32 index batches and each train dispatch gathers its
    batch on device — zero per-step host->device volume traffic.
  * ``host`` mode (fallback): the reference behavior — Compose runs
    per-sample across ``num_workers`` threads.

Wire format: ``wire_dtype='bfloat16'`` ships images as bf16 and labels
as uint8 (when the class count fits), 4-8x fewer bytes than f32/int32 —
decisive when the host link is slow (measured 32 MB/s through the axon
tunnel). The jitted train step widens back to f32/int32 on device
(core/state.py), so training math is unchanged up to the bf16 rounding
of inputs the model would cast anyway.

Sharding across hosts is by file-list partition (parallel.mesh.
process_shard); device-level batch sharding happens when the batch is
placed onto the mesh.
"""

import queue
import threading
from collections import OrderedDict

import numpy as np

from ..transforms import device_supports
from ..utils import logger


def _wire_image_dtype(wire_dtype):
    if wire_dtype in ("bfloat16", "bf16"):
        import ml_dtypes
        return ml_dtypes.bfloat16
    return np.float32


def _wire_label_dtype(dataset, wire_dtype):
    if wire_dtype in ("bfloat16", "bf16"):
        n = getattr(dataset, "num_classes", None)
        ignore = getattr(dataset, "ignore_index", 255)
        if n is not None and n <= 255 and (ignore is None or ignore <= 255):
            return np.uint8
    return np.int32


class _LRUBytes:
    """Byte-bounded LRU cache of decoded volumes (host RAM).

    Real CT sets run 200+ MB/volume; an unbounded dict would OOM the
    host over a long run (round-2 finding)."""

    def __init__(self, cap_bytes):
        self.cap = int(cap_bytes)
        self.bytes = 0
        self.data = OrderedDict()

    def get(self, key):
        if key in self.data:
            self.data.move_to_end(key)
            return self.data[key]
        return None

    def put(self, key, value):
        if key in self.data:
            self.data.move_to_end(key)
            return
        size = sum(np.asarray(v).nbytes for v in value)
        self.data[key] = value
        self.bytes += size
        while self.bytes > self.cap and len(self.data) > 1:
            _, old = self.data.popitem(last=False)
            self.bytes -= sum(np.asarray(v).nbytes for v in old)


class TrainLoader:
    """Infinite shuffled batch iterator over a MedicalDataset.

    Yields (images, labels) numpy arrays:
      * device mode: images [N, D, H, W] wire-typed raw, labels
        [N, D, H, W] wire-typed int
      * device_cache mode: int32 index vectors [N] into
        :attr:`unique_pairs` (stage the volumes with
        :meth:`build_device_cache`)
      * host mode: images [N, D, H, W, 1] float32 transformed, labels int
    """

    def __init__(self, dataset, batch_size, shuffle=True, num_workers=2,
                 seed=0, mode="auto", cache=True, prefetch=2,
                 wire_dtype="float32", cache_bytes=8 << 30,
                 device_cache_bytes=1 << 30):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.rng = np.random.RandomState(seed)
        self.cache = _LRUBytes(cache_bytes) if cache else None
        self.wire_dtype = wire_dtype
        self._img_dtype = _wire_image_dtype(wire_dtype)
        self._lab_dtype = _wire_label_dtype(dataset, wire_dtype)

        if mode == "auto":
            if device_supports(getattr(dataset, "raw_transforms", None)
                               or []):
                mode = "device"
                if self._cacheable_bytes(dataset) <= device_cache_bytes:
                    # small datasets (the usual medical case: tens of
                    # volumes) live whole in HBM — per-step ingest
                    # becomes a [B] int32 upload
                    mode = "device_cache"
            else:
                mode = "host"
        if mode == "device_cache" and not device_supports(
                getattr(dataset, "raw_transforms", None) or []):
            raise ValueError("device_cache requires device-supported "
                             "transforms")
        self.mode = mode
        logger.info("TrainLoader mode: {} (batch_size={}, wire={})".format(
            self.mode, batch_size, wire_dtype))

        # dedupe paths (the train list is repeated x10, reference
        # dataset.py:110-111) so caches hold each volume once
        self.unique_pairs = sorted({tuple(p) for p in dataset.file_list})
        self._pair_index = {pair: i
                            for i, pair in enumerate(self.unique_pairs)}

        # native C++ threaded reader (native/medloader.cpp) for the raw
        # volume path; falls back to numpy when the toolchain is absent
        self._native_img = None
        self._native_lab = None
        if self.mode in ("device", "device_cache"):
            try:
                from ..data_native import NativeVolumeLoader
                self._native_img = NativeVolumeLoader(
                    [p[0] for p in self.unique_pairs], threads=num_workers)
                self._native_lab = NativeVolumeLoader(
                    [p[1] for p in self.unique_pairs], threads=num_workers)
            except Exception as e:
                logger.warning("native loader disabled: {}".format(e))

        self._host_pool = None
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

    def _cacheable_bytes(self, dataset):
        """Wire bytes of the deduped dataset if every volume shares one
        shape (mmap header reads only); 'infinite' otherwise."""
        pairs = sorted({tuple(p) for p in dataset.file_list})
        if not pairs:
            return 1 << 62
        try:
            shape = None
            for img_path, _ in pairs:
                s = np.load(img_path, mmap_mode="r").shape
                if shape is None:
                    shape = s
                elif s != shape:
                    return 1 << 62
        except Exception:
            return 1 << 62
        per = int(np.prod(shape)) * (
            np.dtype(self._img_dtype).itemsize +
            np.dtype(self._lab_dtype).itemsize)
        return per * len(pairs)

    def _load_raw(self, idx):
        if self.cache is not None:
            path = self.dataset.file_list[idx][0]
            hit = self.cache.get(path)
            if hit is None:
                hit = self.dataset.raw_item(idx)
                self.cache.put(path, hit)
            return hit
        return self.dataset.raw_item(idx)

    def _unique_idx(self, idxs):
        return [self._pair_index[tuple(self.dataset.file_list[i])]
                for i in idxs]

    def _make_batch(self):
        idxs = self._next_indices()
        if self.mode == "device_cache":
            return np.asarray(self._unique_idx(idxs), np.int32)
        if self.mode == "device":
            if self._native_img is not None:
                uidx = self._unique_idx(idxs)
                images = self._native_img.load_batch(uidx, np.float32)
                labels = self._native_lab.load_batch(
                    uidx, np.uint8 if self._lab_dtype == np.uint8
                    else np.int32)
                if images.dtype != self._img_dtype:
                    images = images.astype(self._img_dtype)
                return images, labels
            pairs = [self._load_raw(i) for i in idxs]
            images = np.stack([np.asarray(p[0], np.float32)
                               for p in pairs]).astype(self._img_dtype)
            labels = np.stack([np.asarray(p[1], self._lab_dtype)
                               for p in pairs])
            return images, labels
        # host mode: run Compose across a thread pool (reference
        # DataLoader num_workers semantics, core/train.py:87-95)
        if self._host_pool is None and self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor
            self._host_pool = ThreadPoolExecutor(self.num_workers)

        def one(i):
            im, lab, _ = self.dataset[int(i)]
            # Compose gives [1, D, H, W]; NDHWC wants [D, H, W, 1]
            return (np.moveaxis(np.asarray(im, np.float32), 0, -1),
                    np.asarray(lab, np.int32))

        if self._host_pool is not None:
            items = list(self._host_pool.map(one, idxs))
        else:
            items = [one(i) for i in idxs]
        ims = np.stack([it[0] for it in items]).astype(self._img_dtype)
        labs = np.stack([it[1] for it in items])
        return ims, labs

    def build_device_cache(self, sharding=None):
        """Stage every unique volume into device HBM (device_cache mode).

        Returns (images [V, D, H, W] wire-dtype, labels [V, D, H, W])
        jax arrays, replicated (or placed per ``sharding``).
        """
        import jax
        V = len(self.unique_pairs)
        shape = None
        imgs, labs = [], []
        for i in range(V):
            if self._native_img is not None:
                img = self._native_img.load_f32(i)
                lab = (self._native_lab.load_u8(i)
                       if self._lab_dtype == np.uint8
                       else self._native_lab.load_i32(i))
            else:
                img = np.load(self.unique_pairs[i][0]).astype(np.float32)
                lab = np.load(self.unique_pairs[i][1]).astype(
                    self._lab_dtype)
            if shape is None:
                shape = img.shape
            elif img.shape != shape:
                raise ValueError(
                    "device_cache requires uniform volume shapes; got {} "
                    "vs {}".format(img.shape, shape))
            imgs.append(img.astype(self._img_dtype))
            labs.append(lab)
        images = np.stack(imgs)
        labels = np.stack(labs)
        logger.info(
            "device cache: {} volumes, images {} {} + labels {} {} = "
            "{:.0f} MB HBM".format(
                V, images.shape, images.dtype, labels.shape, labels.dtype,
                (images.nbytes + labels.nbytes) / 1e6))
        return (jax.device_put(images, sharding),
                jax.device_put(labels, sharding))

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
        if self._host_pool is not None:
            self._host_pool.shutdown(wait=False)

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
