# Copyright 2026. Apache License 2.0.
"""Headline benchmark — run on real TPU hardware by the driver.

Measures, on one chip:
  1. end-to-end CT pipeline throughput: raw HU volume -> HUnorm ->
     resample to 128^3 -> VNet forward -> argmax (volumes/sec). The
     reference's GPU (CuPy) preprocessing alone does 20 scans in 31.4 s
     = 0.637 vol/s (BASELINE.md; README.md:55-58) — that's the
     vs_baseline denominator, and our number additionally includes
     inference.
  2. training throughput: fused augment+fwd+bwd+opt step on 128^3
     patches (patches/sec/chip).

Prints ONE JSON line with the headline metric + sub-metrics.
"""

import json
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


def bench_pipeline(n_volumes=20, raw_shape=(200, 512, 512), iters=3):
    import jax
    import jax.numpy as jnp

    from medicalseg_tpu import ops
    from medicalseg_tpu.core.state import TrainState
    from medicalseg_tpu.models import VNet
    import optax

    model = VNet(in_channels=1, num_classes=3, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, 128, 128, 128, 1), jnp.float32)
    state = TrainState.create(model, optax.sgd(1e-3), sample,
                              jax.random.PRNGKey(0))
    variables = state.variables

    @jax.jit
    def pipeline(variables, raw):
        # fused pallas HU-window + D-resize, then H/W einsums
        vol = ops.hu_norm_resize(raw, (128, 128, 128))
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


def bench_train(batch=1, iters=10, remat=True):
    import jax
    import jax.numpy as jnp
    import optax

    from medicalseg_tpu.core.state import TrainState, make_train_step
    from medicalseg_tpu.models import VNet
    from medicalseg_tpu.models.losses import (CrossEntropyLoss, DiceLoss,
                                              MixedLoss)
    from medicalseg_tpu.transforms import (DeviceAugmentor, RandomFlip3D,
                                           RandomResizedCrop3D)

    model = VNet(in_channels=1, num_classes=3, dtype=jnp.bfloat16,
                 remat=remat)
    losses = {"types": [MixedLoss([CrossEntropyLoss(), DiceLoss()],
                                  [1.0, 1.0])], "coef": [1]}
    schedule = optax.polynomial_schedule(1e-3, 0.0, 0.9, 15000)
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(schedule, momentum=0.9))

    aug = DeviceAugmentor([
        RandomResizedCrop3D(size=128, scale=(0.8, 1.2)),
        RandomFlip3D()])
    step = jax.jit(
        make_train_step(losses, augment_fn=aug._augment_batch),
        donate_argnums=(0,))

    sample = jnp.zeros((batch, 128, 128, 128, 1), jnp.float32)
    state = TrainState.create(model, tx, sample, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, 128, 128, 128).astype(
        np.float32) * 255)
    labels = jnp.asarray(rng.randint(0, 3, (batch, 128, 128, 128)).astype(
        np.int32))
    key = jax.random.PRNGKey(1)

    state, m = step(state, images, labels, key)  # compile
    _sync(m["loss"])

    t0 = time.time()
    for _ in range(iters):
        state, m = step(state, images, labels, key)
    _sync(m["loss"])
    dt = time.time() - t0
    return batch * iters / dt


def main():
    import os

    import jax

    # persistent compile cache: VNet programs take minutes to compile via
    # the remote helper; repeated bench runs should reuse them
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    backend = jax.devices()[0].platform
    small = backend == "cpu"

    vols_per_sec = bench_pipeline(
        n_volumes=4 if small else 20,
        raw_shape=(64, 128, 128) if small else (200, 512, 512),
        iters=1 if small else 3)
    try:
        train_pps = bench_train(batch=1 if small else 2,
                                iters=2 if small else 10)
    except Exception as e:
        print("# train bench failed: {}".format(e))
        train_pps = 0.0

    ref_gpu_preprocess_vps = 20 / 31.4  # BASELINE.md GPU path
    result = {
        "metric": "CT preprocess+VNet-infer throughput (128^3), 1 chip",
        "value": round(vols_per_sec, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vols_per_sec / ref_gpu_preprocess_vps, 2),
        "train_patches_per_sec_per_chip": round(train_pps, 3),
        "backend": backend,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
