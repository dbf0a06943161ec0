# Copyright 2026. Apache License 2.0.
"""Headline benchmark — run on real TPU hardware by the driver.

Measures, on one chip:
  1. END-TO-END CT pipeline throughput FROM DISK (the headline): .npy
     volume read by the native C++ loader -> host->device copy ->
     HUnorm -> resample to 128^3 -> VNet bf16 forward -> argmax
     (volumes/sec). The reference's GPU (CuPy) preprocessing alone does
     20 scans in 31.4 s = 0.637 vol/s (BASELINE.md; README.md:55-58) —
     that's the vs_baseline denominator, and our number additionally
     includes ingest + inference.
  2. the same pipeline from raw .nii.gz (gzip decode on host) — the
     cold-ingest variant.
  3. the device-resident compute-only number (sub-metric, what round 1
     reported as the headline).
  4. training throughput: fused augment+fwd+bwd+opt step on 128^3
     patches (patches/sec/chip), single-step and multi-step
     (--steps_per_dispatch amortization) variants.

Prints ONE JSON line with the headline metric + sub-metrics.
"""

import json
import os
import tempfile
import time

import numpy as np


def _sync(x):
    """Force execution to completion by fetching one element.

    On the axon TPU terminal, jax.block_until_ready returns before the
    enqueued programs actually run; a host fetch of (any part of) the
    final output is the reliable fence (device programs execute FIFO, so
    syncing the last result syncs everything before it).
    """
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf).ravel()[0]


def bench_pipeline(n_volumes=20, raw_shape=(200, 512, 512), iters=3,
                   size=128, precision="bf16", layout_policy="auto",
                   head_1x1="kl"):
    """Device-resident raw->pred pipeline. precision='int8' serves from
    weight-only int8 parameters (utils/quant.py): 4x fewer weight bytes
    in HBM, dequant fused into the forward — the deploy Predictor's
    --precision int8 path."""
    import jax
    import jax.numpy as jnp

    from medicalseg_tpu import ops
    from medicalseg_tpu.core.state import TrainState
    from medicalseg_tpu.models import VNet
    import optax

    conv = "pallas" if jax.default_backend() == "tpu" else "default"
    model = VNet(in_channels=1, num_classes=3, dtype=jnp.bfloat16,
                 head_conv=conv, mid_conv=conv,
                 layout_policy=layout_policy, head_1x1=head_1x1)
    sample = jnp.zeros((1, size, size, size, 1), jnp.float32)
    state = TrainState.create(model, optax.sgd(1e-3), sample,
                              jax.random.PRNGKey(0))
    variables = state.variables
    dequant = None
    if precision == "int8":
        from medicalseg_tpu.utils import quant
        variables = jax.device_put(
            quant.quantize_tree(jax.device_get(variables)))
        dequant = quant.dequantize_tree

    @jax.jit
    def pipeline(variables, raw):
        if dequant is not None:
            variables = dequant(variables)
        # fused pallas HU-window + D-resize, then H/W einsums
        vol = ops.hu_norm_resize(raw, (size, size, size))
        vol = vol / jnp.maximum(jnp.max(vol), 1e-6)
        logits = model.apply(variables, vol[None, ..., None],
                             train=False)[0]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    rng = np.random.RandomState(0)
    raws = [jnp.asarray(rng.uniform(-1200, 600, raw_shape).astype(
        np.float32)) for _ in range(4)]

    # warmup/compile
    _sync(pipeline(variables, raws[0]))

    best = 0.0
    for _ in range(iters):
        t0 = time.time()
        for i in range(n_volumes):
            out = pipeline(variables, raws[i % len(raws)])
        _sync(out)
        dt = time.time() - t0
        best = max(best, n_volumes / dt)
    return best


def _make_pipeline_fn(size=128):
    """(variables, jitted raw->pred fn) for the HUnorm+resample+VNet
    pipeline at `size`^3 (64 on the CPU smoke path)."""
    import jax
    import jax.numpy as jnp
    import optax

    from medicalseg_tpu import ops
    from medicalseg_tpu.core.state import TrainState
    from medicalseg_tpu.models import VNet

    conv = "pallas" if jax.default_backend() == "tpu" else "default"
    model = VNet(in_channels=1, num_classes=3, dtype=jnp.bfloat16,
                 head_conv=conv, mid_conv=conv)
    sample = jnp.zeros((1, size, size, size, 1), jnp.float32)
    state = TrainState.create(model, optax.sgd(1e-3), sample,
                              jax.random.PRNGKey(0))

    @jax.jit
    def pipeline(variables, raw):
        vol = ops.hu_norm_resize(raw, (size, size, size))
        vol = vol / jnp.maximum(jnp.max(vol), 1e-6)
        logits = model.apply(variables, vol[None, ..., None],
                             train=False)[0]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return state.variables, pipeline


def _make_preprocessed_pipeline_fn(size=128):
    """(variables, jitted fn) over an ALREADY HU+resampled [size^3]
    volume (any float dtype): /max normalize + VNet bf16 + argmax.

    Pairs with the native C++ fused HU-window+resize
    (data_native.load_hu_resize): the host ships a target-shaped bf16
    tensor — 4.2 MB instead of a 210 MB raw scan — through the ~32 MB/s
    tunnel, and the device finishes the pipeline."""
    import jax
    import jax.numpy as jnp
    import optax

    from medicalseg_tpu.core.state import TrainState
    from medicalseg_tpu.models import VNet

    conv = "pallas" if jax.default_backend() == "tpu" else "default"
    model = VNet(in_channels=1, num_classes=3, dtype=jnp.bfloat16,
                 head_conv=conv, mid_conv=conv)
    sample = jnp.zeros((1, size, size, size, 1), jnp.float32)
    state = TrainState.create(model, optax.sgd(1e-3), sample,
                              jax.random.PRNGKey(0))

    @jax.jit
    def pipeline(variables, vol):
        vol = vol.astype(jnp.float32)
        vol = vol / jnp.maximum(jnp.max(vol), 1e-6)
        logits = model.apply(variables, vol[None, ..., None],
                             train=False)[0]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return state.variables, pipeline


def _ct_phantom(raw_shape, seed):
    """Realistic int16 CT phantom: air background, body ellipsoid of
    soft tissue with smooth internal structure, a bone-ish shell, and
    correlated noise. Its .nii.gz compresses ~2.4:1 like real chest CT;
    the previous uniform-noise volume was near-incompressible (1.25:1),
    which both misrepresents scanner output and maximizes the
    single-core inflate cost the niigz lane measures."""
    d, h, w = raw_shape
    rng = np.random.RandomState(seed)
    yy, xx = np.ogrid[:h, :w]
    r = np.sqrt(((yy - h / 2) / (0.42 * h)) ** 2 +
                ((xx - w / 2) / (0.35 * w)) ** 2)
    body = (r < 1.0)[None]
    vol = np.full(raw_shape, -1000.0, np.float32)
    coarse = rng.standard_normal(
        (max(d // 4, 1), max(h // 8, 1), max(w // 8, 1))).astype(
            np.float32)
    smooth = np.kron(coarse, np.ones((4, 8, 8), np.float32))[:d, :h, :w]
    vol += body * (1040.0 + 120.0 * smooth)
    vol += ((r > 0.92) & (r < 1.0))[None] * 700.0
    vol += rng.standard_normal(raw_shape).astype(np.float32) * 12.0 * \
        (body * 0.8 + 0.2)
    return np.clip(vol, -1024, 3071).astype(np.int16)


def _write_bench_volumes(tmpdir, n, raw_shape, niigz):
    """Synthesize raw CT volumes on disk: .npy always (f32, the phase-N
    interchange format), .nii.gz as int16 HU phantoms (what CT scanners
    emit — see _ct_phantom)."""
    from medicalseg_tpu.io import nifti
    rng = np.random.RandomState(0)
    npy_paths, nii_paths = [], []
    for i in range(n):
        vol = rng.uniform(-1200, 600, raw_shape).astype(np.float32)
        p = os.path.join(tmpdir, "vol{}.npy".format(i))
        np.save(p, vol)
        npy_paths.append(p)
        if niigz and i < 2:  # 2 distinct phantoms; compressing 105 MB
            pn = os.path.join(tmpdir, "vol{}.nii.gz".format(i))  # costs
            nifti.write(pn, _ct_phantom(raw_shape, i))  # ~20 s each
            nii_paths.append(pn)
    return npy_paths, nii_paths


def bench_pipeline_disk(n_volumes=20, raw_shape=(200, 512, 512),
                        n_files=4, niigz_volumes=4, size=128):
    """End-to-end volumes/sec from DISK: file read + fused native
    HU+resize on host + bf16 wire + device /max+VNet+argmax, with a
    two-stage prefetcher overlapping host prep, tunnel transfer and
    device compute. Returns (npy_vps, niigz_vps, breakdown dict).

    n_files distinct volumes cycled n_volumes times (the OS page cache
    keeps them warm after the first epoch — representative of real
    multi-epoch training ingest).
    """
    import jax

    from medicalseg_tpu.core.prefetch import DevicePrefetcher

    variables, pipeline = _make_preprocessed_pipeline_fn(size=size)
    tsize = (size, size, size)
    breakdown = {}

    with tempfile.TemporaryDirectory() as tmpdir:
        npy_paths, nii_paths = _write_bench_volumes(
            tmpdir, n_files, raw_shape, niigz=niigz_volumes > 0)

        # --- .npy via the native C++ loader ---------------------------
        from medicalseg_tpu.data_native import (NativeVolumeLoader,
                                                hu_resize_array)
        loader = NativeVolumeLoader(npy_paths, threads=2)
        # warmup: compile + touch every file once
        for i in range(n_files):
            vol = loader.load_hu_resize(i, tsize, out_dtype="bfloat16")
            out = pipeline(variables, jax.device_put(vol))
        _sync(out)

        # host-prep sub-timing (cache warm): fused read+HU+resize
        t0 = time.time()
        for i in range(n_files):
            loader.load_hu_resize(i, tsize, out_dtype="bfloat16")
        breakdown["host_prep_ms"] = round(
            (time.time() - t0) / n_files * 1e3, 1)
        breakdown["wire_mb"] = round(size ** 3 * 2 / 1e6, 2)

        def produce():
            for i in range(n_volumes):
                yield loader.load_hu_resize(i % n_files, tsize,
                                            out_dtype="bfloat16")

        pf = DevicePrefetcher(produce(), depth=2)
        t0 = time.time()
        for vol in pf:
            out = pipeline(variables, vol)
        _sync(out)
        npy_vps = n_volumes / (time.time() - t0)

        # --- raw .nii.gz (int16 HU; native libdeflate inflate + fused
        # HU+resize in ONE C++ call, no Python-side intermediate;
        # falls back to the pure reader when ineligible) --------------
        niigz_vps = 0.0
        if nii_paths:
            from medicalseg_tpu.io import nifti

            def decode_nii(path):
                try:
                    from medicalseg_tpu.data_native import \
                        load_nii_hu_resize
                    return load_nii_hu_resize(path, tsize,
                                              out_dtype="bfloat16")
                except RuntimeError:
                    raw = nifti.read(path)[0]
                    return hu_resize_array(np.ascontiguousarray(raw),
                                           tsize, out_dtype="bfloat16")

            warm = decode_nii(nii_paths[0])  # page cache + lib init
            t0 = time.time()
            warm = decode_nii(nii_paths[0])
            prep_s = time.time() - t0
            breakdown["nii_host_prep_ms"] = round(prep_s * 1e3, 1)
            # Single-core inflate ceiling: decode emits the raw voxel
            # bytes; DEFLATE is sequential, so output_bytes/prep_time
            # bounds vol/s on a 1-core host no matter the overlap.
            # nii_inflate_bound_vps publishes that ceiling directly so
            # the "a worker pool scales it with cores" claim is
            # mechanically checkable on any host (VERDICT r4 #6).
            raw_mb = 2 * np.prod(raw_shape) / 1e6  # int16 payload
            breakdown["nii_gz_mb"] = round(
                os.path.getsize(nii_paths[0]) / 1e6, 1)
            breakdown["nii_inflate_out_mbps"] = round(
                float(raw_mb / prep_s), 1)
            breakdown["nii_inflate_bound_vps"] = round(
                float(1.0 / prep_s), 3)
            _sync(pipeline(variables, jax.device_put(warm)))

            def run_lane(workers):
                pf = DevicePrefetcher(
                    (nii_paths[i % len(nii_paths)]
                     for i in range(niigz_volumes)),
                    depth=2, map_fn=decode_nii, workers=workers)
                t0 = time.time()
                out = None
                for vol in pf:
                    out = pipeline(variables, vol)
                _sync(out)
                return niigz_volumes / (time.time() - t0)

            # worker-pool scaling micro-test: on a multi-core host
            # workers=2 should approach 2x the 1-worker lane (DEFLATE
            # parallelism across files); on this 1-core box the ratio
            # documents overlap-not-contention (~1x, not <1x).
            vps_w1 = run_lane(1)
            niigz_vps = run_lane(2)
            breakdown["nii_workers2_speedup"] = round(
                niigz_vps / max(vps_w1, 1e-9), 2)
    return npy_vps, niigz_vps, breakdown


def bench_sliding_window(n_vols=4, vol_shape=(128, 256, 256),
                         roi=(128, 128, 128), iters=3, window_batch=4):
    """Sliding-window serving: per-volume vs cross-volume-batched.

    Cross-volume batching is where batch serving architecturally
    belongs on this model (whole-volume batch-4 measured SLOWER than
    batch-1 twice — at 128^3 one volume already fills the MXU and
    batching only adds HBM pressure): the batched stream mixes windows
    from all volumes through one scan, so ragged tails don't idle the
    window batch. Returns (pervol_vps, stream_vps)."""
    import jax
    import jax.numpy as jnp
    import optax

    from medicalseg_tpu.core.sliding_window import (
        sliding_window_inference, sliding_window_inference_batched)
    from medicalseg_tpu.core.state import TrainState
    from medicalseg_tpu.models import VNet

    conv = "pallas" if jax.default_backend() == "tpu" else "default"
    model = VNet(in_channels=1, num_classes=3, dtype=jnp.bfloat16,
                 head_conv=conv, mid_conv=conv)
    sample = jnp.zeros((window_batch,) + tuple(roi) + (1,), jnp.float32)
    state = TrainState.create(model, optax.sgd(1e-3), sample,
                              jax.random.PRNGKey(0))
    variables = state.variables

    def apply_fn(variables, x, train=False):
        return model.apply(variables, x, train=train)

    rng = np.random.RandomState(0)
    vols = jnp.asarray(rng.rand(n_vols, *vol_shape, 1).astype(
        np.float32))

    # Both paths return the SERVING contract — per-volume argmax
    # segmentations as uint8 — so the host fetch is identical
    # (4x128x256x256 u8 = 33 MB). Fetching raw fp32 logits instead
    # skews this comparison 4:1 against the stream on a tunneled TPU:
    # the stream returns all N volumes' logits (400 MB) where the
    # per-volume loop fetched one (100 MB) — measured 2026-08-19, the
    # stream's DEVICE time is 1.32x FASTER (2.36 vs 3.13 s / 4 vols).
    def run_pervol():
        outs = [jnp.argmax(sliding_window_inference(
            apply_fn, variables, vols[i], roi, 3,
            window_batch=window_batch), -1).astype(jnp.uint8)
            for i in range(n_vols)]
        return jnp.stack(outs)

    def run_stream():
        return jnp.argmax(sliding_window_inference_batched(
            apply_fn, variables, vols, roi, 3,
            window_batch=window_batch), -1).astype(jnp.uint8)

    _sync(run_pervol())  # compile
    t0 = time.time()
    for _ in range(iters):
        out = run_pervol()
    _sync(out)
    pervol = n_vols * iters / (time.time() - t0)

    _sync(run_stream())  # compile
    t0 = time.time()
    for _ in range(iters):
        out = run_stream()
    _sync(out)
    stream = n_vols * iters / (time.time() - t0)
    return pervol, stream


def bench_pipeline_batched(batch=4, n_volumes=20,
                           raw_shape=(200, 512, 512), iters=3):
    """Device-resident serving with `batch` volumes per forward.

    Prep runs as `batch` separate b1 dispatches (async-enqueued
    back-to-back; dispatch overhead is ~2-8 ms, measured in the round-3
    dispatch probe) feeding one batched forward. Both round-2 attempts
    at a fused program regressed: vmapped prep materialized `batch`
    windowed full-volume intermediates at once, and a lax.scan prep
    (round 3) kept an 800 MB stacked operand resident and still ran
    9.5 < 13.3 vps. Separate prep dispatches keep peak memory at one
    raw volume and overlap with the previous forward."""
    import jax
    import jax.numpy as jnp

    from medicalseg_tpu import ops
    from medicalseg_tpu.core.state import TrainState
    from medicalseg_tpu.models import VNet
    import optax

    conv = "pallas" if jax.default_backend() == "tpu" else "default"
    model = VNet(in_channels=1, num_classes=3, dtype=jnp.bfloat16,
                 head_conv=conv, mid_conv=conv)
    sample = jnp.zeros((batch, 128, 128, 128, 1), jnp.float32)
    state = TrainState.create(model, optax.sgd(1e-3), sample,
                              jax.random.PRNGKey(0))
    variables = state.variables

    @jax.jit
    def prep(raw):
        vol = ops.hu_norm_resize(raw, (128, 128, 128))
        return vol / jnp.maximum(jnp.max(vol), 1e-6)

    @jax.jit
    def forward(variables, *vols):
        x = jnp.stack(vols)[..., None]
        logits = model.apply(variables, x, train=False)[0]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    rng = np.random.RandomState(0)
    raws = [jnp.asarray(rng.uniform(-1200, 600, raw_shape)
                        .astype(np.float32)) for _ in range(batch)]
    _sync(forward(variables, *[prep(r) for r in raws]))

    n_calls = max(1, n_volumes // batch)
    best = 0.0
    for _ in range(iters):
        t0 = time.time()
        for _ in range(n_calls):
            out = forward(variables, *[prep(r) for r in raws])
        _sync(out)
        best = max(best, n_calls * batch / (time.time() - t0))
    return best


def bench_train(batch=1, iters=10, remat=True, steps_per_dispatch=1,
                size=128, layout_policy="auto"):
    import jax
    import jax.numpy as jnp
    import optax

    from medicalseg_tpu.core.state import TrainState, make_train_step
    from medicalseg_tpu.models import VNet
    from medicalseg_tpu.models.losses import (CrossEntropyLoss, DiceLoss,
                                              MixedLoss)
    from medicalseg_tpu.transforms import (DeviceAugmentor, RandomFlip3D,
                                           RandomResizedCrop3D)

    conv = "pallas" if jax.default_backend() == "tpu" else "default"
    model = VNet(in_channels=1, num_classes=3, dtype=jnp.bfloat16,
                 remat=remat, head_conv=conv, mid_conv=conv,
                 layout_policy=layout_policy)
    losses = {"types": [MixedLoss([CrossEntropyLoss(), DiceLoss()],
                                  [1.0, 1.0])], "coef": [1]}
    schedule = optax.polynomial_schedule(1e-3, 0.0, 0.9, 15000)
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(schedule, momentum=0.9))

    aug = DeviceAugmentor([
        RandomResizedCrop3D(size=size, scale=(0.8, 1.2)),
        RandomFlip3D()])
    n = max(1, int(steps_per_dispatch))
    if n > 1:
        from medicalseg_tpu.core.state import make_multi_step
        step = jax.jit(make_multi_step(losses, n,
                                       augment_fn=aug._augment_batch),
                       donate_argnums=(0,))
    else:
        step = jax.jit(
            make_train_step(losses, augment_fn=aug._augment_batch),
            donate_argnums=(0,))

    sample = jnp.zeros((batch, size, size, size, 1), jnp.float32)
    state = TrainState.create(model, tx, sample, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    lead = (n, batch) if n > 1 else (batch,)
    images = jnp.asarray(rng.rand(*lead, size, size, size).astype(
        np.float32) * 255)
    labels = jnp.asarray(rng.randint(
        0, 3, lead + (size, size, size)).astype(np.int32))
    key = jax.random.PRNGKey(1)

    state, m = step(state, images, labels, key)  # compile
    _sync(m["loss"])

    t0 = time.time()
    for _ in range(iters):
        state, m = step(state, images, labels, key)
    _sync(m["loss"])
    dt = time.time() - t0
    return n * batch * iters / dt


def main():
    """Stage-incremental benchmark runner.

    The driver gives bench.py a fixed time budget and records the LAST
    parseable JSON line; round 4's single end-of-run print meant one
    slow stage (a cold 5-15 min remote train compile) erased every
    already-measured metric (BENCH_r04 rc=124, parsed=null). So:
      * stages run headline-first (disk e2e -> train -> serving extras),
      * the full (partial) JSON line is re-printed after EVERY completed
        stage, so a timeout only costs the stages that didn't run.
    """
    import os

    import jax

    # persistent compile cache (VNet programs take minutes to compile
    # via the remote helper) + MEDSEG_PLATFORM backend override
    from medicalseg_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

    backend = jax.devices()[0].platform
    small = backend == "cpu"
    raw_shape = (64, 128, 128) if small else (200, 512, 512)
    size = 64 if small else 128  # 128^3 VNet is too slow for 1 CPU core

    import sys

    def _note(msg):
        print("# bench: " + msg, file=sys.stderr, flush=True)

    ref_gpu_preprocess_vps = 20 / 31.4  # BASELINE.md GPU path
    result = {
        "metric": "CT disk->preprocess->VNet-infer e2e throughput "
                  "(128^3), 1 chip",
        "value": 0.0,
        "unit": "volumes/sec/chip",
        "vs_baseline": 0.0,
        "backend": backend,
        "stages_done": [],
    }

    def _emit(stage):
        result["stages_done"] = result["stages_done"] + [stage]
        print(json.dumps(result), flush=True)

    def _stage(name, fn):
        """Run one stage; failures/timeouts cost only this stage."""
        _note(name)
        try:
            fn()
        except Exception as e:
            print("# {} failed: {}".format(name, e), file=sys.stderr,
                  flush=True)
        _emit(name)

    # --- stage 1: THE headline (disk e2e) + niigz lane ----------------
    def s_disk():
        disk_vps, niigz_vps, breakdown = bench_pipeline_disk(
            n_volumes=4 if small else 20, raw_shape=raw_shape,
            n_files=2 if small else 4, niigz_volumes=2 if small else 4,
            size=size)
        _note("breakdown: {}".format(breakdown))
        result["value"] = round(disk_vps, 3)
        result["vs_baseline"] = round(
            disk_vps / ref_gpu_preprocess_vps, 2)
        result["niigz_e2e_vps"] = round(niigz_vps, 3)
        for k in ("host_prep_ms", "nii_host_prep_ms",
                  "nii_inflate_out_mbps", "nii_inflate_bound_vps",
                  "nii_workers2_speedup"):
            result[k] = breakdown.get(k, 0.0)
        result["wire_mb_per_volume"] = breakdown.get("wire_mb", 0.0)

    _stage("disk pipeline ({} backend, size {})".format(backend, size),
           s_disk)

    # --- stage 2: train throughput (the other headline) ---------------
    def s_train():
        result["train_patches_per_sec_per_chip"] = round(bench_train(
            batch=1 if small else 2, iters=2 if small else 10,
            size=size), 3)

    _stage("train step", s_train)

    # --- stage 3: device-resident serving (3-rep median published;
    # VERDICT r4 #4: adjudicate run variance, don't shrug it) ----------
    def s_device():
        reps = 1 if small else 3
        vals = sorted(
            bench_pipeline(n_volumes=4 if small else 20,
                           raw_shape=raw_shape, iters=1 if small else 2,
                           size=size)
            for _ in range(reps))
        result["device_resident_vps"] = round(vals[reps // 2], 3)
        result["device_resident_vps_reps"] = [round(v, 3) for v in vals]

    _stage("device-resident pipeline", s_device)

    if not small:
        def s_int8():
            result["device_resident_int8_vps"] = round(bench_pipeline(
                n_volumes=20, raw_shape=raw_shape, iters=3, size=size,
                precision="int8"), 3)

        _stage("int8 pipeline", s_int8)

        # where batching WINS on this model: the sliding-window stream
        # (whole-volume batch-4 loses to batch-1 — one 128^3 volume
        # already fills the MXU; see bench_sliding_window docstring)
        def s_swl():
            pervol, stream = bench_sliding_window()
            result["swl_pervol_vps"] = round(pervol, 3)
            result["swl_stream_vps"] = round(stream, 3)

        _stage("sliding-window serving (per-volume vs cross-volume)",
               s_swl)

        def s_batched():
            result["device_resident_batched_vps"] = round(
                bench_pipeline_batched(batch=4, n_volumes=20,
                                       raw_shape=raw_shape, iters=3), 3)

        _stage("batched pipeline", s_batched)

        def s_multistep():
            result["train_pps_multistep"] = round(bench_train(
                batch=2, iters=4, steps_per_dispatch=8, size=size), 3)

        _stage("multi-step train", s_multistep)


if __name__ == "__main__":
    main()
