# Copyright 2026. Apache License 2.0.
"""One-off TPU measurement probes (host->device bandwidth, train-step
profile, Pallas conv5 kernels). Run manually on the TPU box:

    python tools/tpu_probe.py h2d | train_profile | pallas | all

Findings feed documentation/benchmarks.md; bench.py carries the
reproducible numbers.
"""
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf).ravel()[0]


def probe_h2d():
    """Tunnel host->device throughput: f32 vs int16, serial vs batched."""
    import jax
    import jax.numpy as jnp

    shape = (200, 512, 512)
    rng = np.random.RandomState(0)
    f32s = [rng.uniform(-1200, 600, shape).astype(np.float32)
            for _ in range(3)]
    i16s = [a.astype(np.int16) for a in f32s]

    for name, arrs in (("f32 210MB", f32s), ("int16 105MB", i16s)):
        # warmup one
        _sync(jax.device_put(arrs[0]))
        t0 = time.time()
        for a in arrs:
            x = jax.device_put(a)
        _sync(x)
        dt = (time.time() - t0) / len(arrs)
        mb = arrs[0].nbytes / 1e6
        print("h2d {}: {:.2f} s/vol = {:.0f} MB/s".format(
            name, dt, mb / dt))

    # concurrency: enqueue 3 puts before fencing
    t0 = time.time()
    xs = [jax.device_put(a) for a in f32s]
    for x in xs:
        _sync(x)
    dt = time.time() - t0
    print("h2d f32 x3 concurrent: {:.2f} s total = {:.0f} MB/s agg".format(
        dt, 3 * f32s[0].nbytes / 1e6 / dt))


def _trace_top_ops(fn, args, steps=3, outdir="/tmp/fwd_trace", top=30):
    """jax.profiler trace of fn(*args); print the top device ops."""
    import glob
    import jax

    _sync(fn(*args))
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            o = fn(*args)
        _sync(o)
    traces = sorted(glob.glob(outdir + "/**/*.trace.json.gz",
                              recursive=True))
    if not traces:
        print("no trace written")
        return
    with gzip.open(traces[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    totals = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            totals[name] = totals.get(name, 0) + e["dur"]
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print("{:>12.2f} ms  {}".format(dur / 1e3 / steps, name[:110]))


def probe_model_fwd_trace(head="pallas", mid="default"):
    """Device-op profile of the in-model forward with the Pallas convs —
    finds integration overheads the isolated kernel probe can't see."""
    import jax
    import jax.numpy as jnp

    from medicalseg_tpu.models import VNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 128, 128, 128, 1).astype(np.float32))
    model = VNet(in_channels=1, num_classes=3, dtype=jnp.bfloat16,
                 head_conv=head, mid_conv=mid)
    v = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), x)
    f = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
    _trace_top_ops(f, (v, x))


def probe_train_profile(steps=3):
    """jax.profiler trace of the (cached) 128^3 train step; prints the
    top device ops from the trace."""
    import glob
    import jax
    import jax.numpy as jnp
    import optax

    from medicalseg_tpu.core.state import TrainState, make_train_step
    from medicalseg_tpu.models import VNet
    from medicalseg_tpu.models.losses import (CrossEntropyLoss, DiceLoss,
                                              MixedLoss)
    from medicalseg_tpu.transforms import (DeviceAugmentor, RandomFlip3D,
                                           RandomResizedCrop3D)

    batch = 2
    variant = os.environ.get("PROBE_CONV", "pallas")
    updown = os.environ.get("PROBE_UPDOWN", "s2d")  # the model default
    layout = os.environ.get("PROBE_LAYOUT", "auto")
    model = VNet(in_channels=1, num_classes=3, dtype=jnp.bfloat16,
                 remat=True, head_conv=variant, mid_conv=variant,
                 updown_conv=updown, layout_policy=layout)
    losses = {"types": [MixedLoss([CrossEntropyLoss(), DiceLoss()],
                                  [1.0, 1.0])], "coef": [1]}
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(optax.polynomial_schedule(1e-3, 0, 0.9,
                                                         15000),
                               momentum=0.9))
    aug = DeviceAugmentor([RandomResizedCrop3D(size=128, scale=(0.8, 1.2)),
                           RandomFlip3D()])
    step = jax.jit(make_train_step(losses, augment_fn=aug._augment_batch),
                   donate_argnums=(0,))
    state = TrainState.create(
        model, tx, jnp.zeros((batch, 128, 128, 128, 1)),
        jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, 128, 128, 128).astype(np.float32))
    labels = jnp.asarray(
        rng.randint(0, 3, (batch, 128, 128, 128)).astype(np.int32))
    key = jax.random.PRNGKey(1)

    state, m = step(state, images, labels, key)
    _sync(m["loss"])
    t0 = time.time()
    for _ in range(3):
        state, m = step(state, images, labels, key)
    _sync(m["loss"])
    print("train step wall: {:.0f} ms".format((time.time() - t0) / 3 * 1e3))

    outdir = "/tmp/train_trace"
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state, m = step(state, images, labels, key)
        _sync(m["loss"])

    traces = sorted(glob.glob(
        outdir + "/**/*.trace.json.gz", recursive=True))
    if not traces:
        print("no trace written"); return
    with gzip.open(traces[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    totals = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            # keep device-side XLA ops only (heuristic: fusion/conv/copy)
            totals[name] = totals.get(name, 0) + e["dur"]
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:40]
    for name, dur in top:
        print("{:>12.2f} ms  {}".format(dur / 1e3 / steps, name[:110]))


def _device_busy(outdir, steps):
    """Parse the latest trace in outdir: per-track busy totals keyed by
    the trace's process/thread names, separating device lanes from host
    threads (the old name-keyed aggregation double-counted host rows and
    hid the true device busy time)."""
    import glob

    traces = sorted(glob.glob(outdir + "/**/*.trace.json.gz",
                              recursive=True))
    if not traces:
        print("no trace written")
        return
    with gzip.open(traces[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pnames[e["pid"]] = e["args"].get("name", "?")
            elif e.get("name") == "thread_name":
                tnames[(e["pid"], e.get("tid"))] = \
                    e["args"].get("name", "?")
    busy, span = {}, {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            key = (e["pid"], e.get("tid"))
            busy[key] = busy.get(key, 0) + e["dur"]
            t0, t1 = e["ts"], e["ts"] + e["dur"]
            lo, hi = span.get(key, (t0, t1))
            span[key] = (min(lo, t0), max(hi, t1))
    rows = []
    for key, b in busy.items():
        pid, tid = key
        label = "{} / {}".format(pnames.get(pid, pid),
                                 tnames.get(key, tid))
        lo, hi = span[key]
        rows.append((b, hi - lo, label))
    for b, s, label in sorted(rows, reverse=True)[:14]:
        print("  track busy {:>9.2f} ms  span {:>9.2f} ms  /step "
              "busy {:>8.2f} ms  {}".format(
                  b / 1e3, s / 1e3, b / 1e3 / steps, label[:80]))


def probe_dispatch():
    """Settle the wall-vs-device question: single-step and 8-step train
    programs, wall per dispatch with async enqueue, plus per-track
    device busy time from the profiler."""
    import jax
    import jax.numpy as jnp
    import optax

    from medicalseg_tpu.core.state import (TrainState, make_multi_step,
                                           make_train_step)
    from medicalseg_tpu.models import VNet
    from medicalseg_tpu.models.losses import (CrossEntropyLoss, DiceLoss,
                                              MixedLoss)
    from medicalseg_tpu.transforms import (DeviceAugmentor, RandomFlip3D,
                                           RandomResizedCrop3D)

    batch = 2
    model = VNet(in_channels=1, num_classes=3, dtype=jnp.bfloat16,
                 remat=True, head_conv="pallas", mid_conv="pallas")
    losses = {"types": [MixedLoss([CrossEntropyLoss(), DiceLoss()],
                                  [1.0, 1.0])], "coef": [1]}
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(optax.polynomial_schedule(1e-3, 0, 0.9,
                                                         15000),
                               momentum=0.9))
    aug = DeviceAugmentor([RandomResizedCrop3D(size=128, scale=(0.8, 1.2)),
                           RandomFlip3D()])
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)

    # --- single step -------------------------------------------------
    step = jax.jit(make_train_step(losses, augment_fn=aug._augment_batch),
                   donate_argnums=(0,))
    state = TrainState.create(
        model, tx, jnp.zeros((batch, 128, 128, 128, 1)),
        jax.random.PRNGKey(0))
    images = jnp.asarray(rng.rand(batch, 128, 128, 128).astype(np.float32))
    labels = jnp.asarray(
        rng.randint(0, 3, (batch, 128, 128, 128)).astype(np.int32))
    state, m = step(state, images, labels, key)
    _sync(m["loss"])

    # sync every call (includes full dispatch+result latency) ...
    t0 = time.time()
    for _ in range(5):
        state, m = step(state, images, labels, key)
        _sync(m["loss"])
    print("single-step, sync each: {:.0f} ms/step".format(
        (time.time() - t0) / 5 * 1e3))
    # ... vs 10 async enqueues, one fence (device FIFO back-to-back)
    t0 = time.time()
    for _ in range(10):
        state, m = step(state, images, labels, key)
    _sync(m["loss"])
    print("single-step, async x10: {:.0f} ms/step".format(
        (time.time() - t0) / 10 * 1e3))

    steps = 3
    outdir = "/tmp/dispatch_trace_single"
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state, m = step(state, images, labels, key)
        _sync(m["loss"])
    print("single-step trace ({} steps):".format(steps))
    _device_busy(outdir, steps)

    # --- 8-step dispatch --------------------------------------------
    n = 8
    mstep = jax.jit(make_multi_step(losses, n,
                                    augment_fn=aug._augment_batch),
                    donate_argnums=(0,))
    state2 = TrainState.create(
        model, tx, jnp.zeros((batch, 128, 128, 128, 1)),
        jax.random.PRNGKey(0))
    imgs = jnp.asarray(rng.rand(n, batch, 128, 128, 128)
                       .astype(np.float32))
    lbls = jnp.asarray(
        rng.randint(0, 3, (n, batch, 128, 128, 128)).astype(np.int32))
    state2, m2 = mstep(state2, imgs, lbls, key)
    _sync(m2["loss"])
    t0 = time.time()
    for _ in range(3):
        state2, m2 = mstep(state2, imgs, lbls, key)
    _sync(m2["loss"])
    dt = (time.time() - t0) / 3
    print("8-step dispatch: {:.0f} ms = {:.0f} ms/step".format(
        dt * 1e3, dt / n * 1e3))
    outdir = "/tmp/dispatch_trace_multi"
    with jax.profiler.trace(outdir):
        state2, m2 = mstep(state2, imgs, lbls, key)
        _sync(m2["loss"])
    print("8-step trace (1 dispatch = 8 steps):")
    _device_busy(outdir, n)


def probe_serving(batch=4, n_volumes=20, iters=3):
    """Why is batched serving slower than unbatched? Compare:
    A. one program: lax.scan per-volume prep + batched forward
       (bench_pipeline_batched's current shape)
    B. per-volume prep dispatches (pipelined) + one batched forward
    C. unbatched: per-volume prep+fwd dispatches (the 13.3 vps baseline)
    and trace A to see where its device time goes."""
    import jax
    import jax.numpy as jnp
    import optax

    from medicalseg_tpu import ops
    from medicalseg_tpu.core.state import TrainState
    from medicalseg_tpu.models import VNet

    size, raw_shape = 128, (200, 512, 512)
    conv = "pallas"
    model = VNet(in_channels=1, num_classes=3, dtype=jnp.bfloat16,
                 head_conv=conv, mid_conv=conv)
    state = TrainState.create(
        model, optax.sgd(1e-3),
        jnp.zeros((batch, size, size, size, 1), jnp.float32),
        jax.random.PRNGKey(0))
    variables = state.variables

    def prep_one(raw):
        vol = ops.hu_norm_resize(raw, (size, size, size))
        return vol / jnp.maximum(jnp.max(vol), 1e-6)

    @jax.jit
    def fwd_batched(variables, vols):
        logits = model.apply(variables, vols[..., None], train=False)[0]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    @jax.jit
    def scan_prep_fwd(variables, raws):
        _, vols = jax.lax.scan(lambda _, r: (None, prep_one(r)),
                               None, raws)
        return fwd_batched.__wrapped__(variables, vols)

    prep_j = jax.jit(prep_one)

    @jax.jit
    def prep_fwd_one(variables, raw):
        logits = model.apply(variables, prep_one(raw)[None, ..., None],
                             train=False)[0]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    rng = np.random.RandomState(0)
    raws_l = [jnp.asarray(rng.uniform(-1200, 600, raw_shape)
                          .astype(np.float32)) for _ in range(batch)]
    raws_s = jnp.stack(raws_l)

    # warmup
    _sync(scan_prep_fwd(variables, raws_s))
    _sync(fwd_batched(variables, jnp.stack([prep_j(r) for r in raws_l])))
    _sync(prep_fwd_one(variables, raws_l[0]))

    n_calls = max(1, n_volumes // batch)
    for name, run in (
            ("A scan-prep+fwd one program",
             lambda: [scan_prep_fwd(variables, raws_s)
                      for _ in range(n_calls)][-1]),
            ("B per-vol prep dispatches + batched fwd",
             lambda: [fwd_batched(variables, jnp.stack(
                 [prep_j(r) for r in raws_l]))
                 for _ in range(n_calls)][-1]),
            ("C unbatched prep+fwd per volume",
             lambda: [prep_fwd_one(variables, r)
                      for _ in range(n_calls) for r in raws_l][-1])):
        best = 0.0
        for _ in range(iters):
            t0 = time.time()
            out = run()
            _sync(out)
            best = max(best, n_calls * batch / (time.time() - t0))
        print("{}: {:.2f} vol/s".format(name, best))

    outdir = "/tmp/serving_trace_scan"
    with jax.profiler.trace(outdir):
        o = scan_prep_fwd(variables, raws_s)
        _sync(o)
    print("A trace (1 dispatch = {} volumes):".format(batch))
    _device_busy(outdir, batch)
    outdir = "/tmp/serving_trace_unb"
    with jax.profiler.trace(outdir):
        for r in raws_l:
            o = prep_fwd_one(variables, r)
        _sync(o)
    print("C trace ({} volumes):".format(batch))
    _device_busy(outdir, batch)


def probe_pallas(iters=20):
    """Real-TPU numerics + timing of the conv5 Pallas kernels at VNet's
    hot shapes, against the XLA conv they replace."""
    import jax
    import jax.numpy as jnp

    from medicalseg_tpu.ops import pallas_conv5 as pc

    rng = np.random.RandomState(0)

    def run(tag, n, d, h, w, ci, co, kind, dtype=np.float32):
        x = jnp.asarray(rng.randn(n, d, h, w, ci).astype(np.float32),
                        dtype=dtype)
        k = jnp.asarray((rng.randn(5, 5, 5, ci, co) /
                         np.sqrt(125 * ci)).astype(np.float32),
                        dtype=dtype)
        b = jnp.asarray(rng.randn(co).astype(np.float32), dtype=dtype)

        f_pal = jax.jit(lambda x, k, b: pc.conv5(x, k, b, kind, False))
        f_xla = jax.jit(pc._conv5_xla)

        got = f_pal(x, k, b)
        ref = f_xla(x, k, b)
        err = float((jnp.max(jnp.abs(got.astype(jnp.float32) -
                                     ref.astype(jnp.float32))) /
                     jnp.maximum(jnp.max(jnp.abs(
                         ref.astype(jnp.float32))), 1e-6)))
        outs = []
        for name, f in (("pallas", f_pal), ("xla", f_xla)):
            _sync(f(x, k, b))
            t0 = time.time()
            for _ in range(iters):
                o = f(x, k, b)
            _sync(o)
            outs.append((time.time() - t0) / iters * 1e3)
        print("{}: pallas {:.2f} ms vs xla {:.2f} ms ({:.1f}x), "
              "rel err {:.2e}".format(tag, outs[0], outs[1],
                                      outs[1] / outs[0], err))

    import jax.numpy as jnp
    run("head 128^3 ci32->co3 bf16", 1, 128, 128, 128, 32, 3, "head",
        jnp.bfloat16)
    run("stem 128^3 ci1->co16 bf16", 1, 128, 128, 128, 1, 16, "stem",
        jnp.bfloat16)


def probe_pallas_amortized(reps=8, iters=5):
    """Per-dispatch tunnel overhead dominates single-op timings (an XLA
    stem conv 'measures' 291 ms here vs 20 ms in-model), so run `reps`
    convs on DISTINCT inputs inside ONE program and difference against
    a single-conv program: per-conv = (t_reps - t_one) / (reps - 1)."""
    import jax
    import jax.numpy as jnp

    from medicalseg_tpu.ops import pallas_conv5 as pc

    rng = np.random.RandomState(0)

    def run(tag, d, h, w, ci, co, kind):
        xs = jnp.asarray(rng.randn(reps, 1, d, h, w, ci).astype(
            np.float32), dtype=jnp.bfloat16)
        k = jnp.asarray((rng.randn(5, 5, 5, ci, co) /
                         np.sqrt(125 * ci)).astype(np.float32),
                        dtype=jnp.bfloat16)
        b = jnp.zeros((co,), jnp.bfloat16)

        def make(f, r):
            return jax.jit(lambda xs, k, b: jnp.stack(
                [f(xs[i], k, b).astype(jnp.float32).mean()
                 for i in range(r)]))

        for name, f in (("pallas",
                         lambda x, k, b: pc.conv5(x, k, b, kind, False)),
                        ("xla", pc._conv5_xla)):
            f_many = make(f, reps)
            f_one = make(f, 1)
            _sync(f_many(xs, k, b)); _sync(f_one(xs, k, b))
            ts = []
            for fn in (f_many, f_one):
                t0 = time.time()
                for _ in range(iters):
                    o = fn(xs, k, b)
                _sync(o)
                ts.append((time.time() - t0) / iters)
            per = (ts[0] - ts[1]) / (reps - 1) * 1e3
            print("{} {}: {:.2f} ms/conv (reps {:.1f} ms, one {:.1f} ms)"
                  .format(tag, name, per, ts[0] * 1e3, ts[1] * 1e3))

    run("head ci32->co3", 128, 128, 128, 32, 3, "head")
    run("stem ci1->co16", 128, 128, 128, 1, 16, "stem")
    run("mid ci32->co16", 128, 128, 128, 32, 16, "head")


def probe_model_fwd(iters=10):
    """In-model forward wall time: head_conv default vs pallas (both
    carry the same dispatch overhead, so the delta is the kernel win)."""
    import jax
    import jax.numpy as jnp

    from medicalseg_tpu.models import VNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 128, 128, 128, 1).astype(np.float32))
    for head, mid, updown in (("default", "default", "default"),
                              ("pallas", "default", "default"),
                              ("pallas", "pallas", "default"),
                              ("pallas", "pallas", "s2d"),
                              ("default", "default", "s2d")):
        model = VNet(in_channels=1, num_classes=3, dtype=jnp.bfloat16,
                     head_conv=head, mid_conv=mid, updown_conv=updown)
        v = jax.jit(lambda k, x: model.init(k, x, train=False))(
            jax.random.PRNGKey(0), x)
        f = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
        _sync(f(v, x))
        t0 = time.time()
        for _ in range(iters):
            o = f(v, x)
        _sync(o)
        print("VNet fwd 128^3 b1 bf16 head={} mid={} updown={}: "
              "{:.1f} ms wall".format(
                  head, mid, updown, (time.time() - t0) / iters * 1e3))


def probe_spine_profile(steps=3):
    """Trace the FLAGSHIP spine train step (VNetDeepSup, b3 12x512x512,
    20 classes, rot30+flip device augmentation — the exact
    vnetdeepsup_synspine_15k.yml step) and print per-category device
    totals. VERDICT r3 weak #3: ~950 ms of the 1.34 s step is
    non-network; this names it."""
    import glob
    import jax
    import jax.numpy as jnp
    import optax

    from medicalseg_tpu.core.state import TrainState, make_train_step
    from medicalseg_tpu.models import VNetDeepSup
    from medicalseg_tpu.models.losses import (CrossEntropyLoss, DiceLoss,
                                              MixedLoss)
    from medicalseg_tpu.transforms import (DeviceAugmentor, RandomFlip3D,
                                           RandomRotation3D)

    batch = 3
    shape = (12, 512, 512)
    n_cls = 20
    layout = os.environ.get("PROBE_LAYOUT", "auto")
    updown = os.environ.get("PROBE_UPDOWN", "s2d")
    n_heads = 4
    cls = VNetDeepSup
    if os.environ.get("PROBE_MODEL") == "vnet":
        # attribution variant: same trunk/geometry, no deep-sup heads/
        # upsamples and a 1-way loss — the delta names the aux-head cost
        from medicalseg_tpu.models import VNet as cls
        n_heads = 1
    model = cls(
        in_channels=1, num_classes=n_cls, dtype=jnp.bfloat16, remat=True,
        head_conv="pallas", mid_conv="pallas",
        layout_policy=layout, updown_conv=updown,
        kernel_size=((4, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2)),
        stride_size=((1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)))
    mixed = lambda: MixedLoss([CrossEntropyLoss(), DiceLoss()], [1.0, 1.0])
    losses = {"types": [mixed() for _ in range(n_heads)],
              "coef": [1.0] if n_heads == 1 else [0.25] * n_heads}
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(optax.polynomial_schedule(1e-2, 0, 0.9,
                                                         15000),
                               momentum=0.9))
    aug_list = os.environ.get("PROBE_SPINE_AUG", "rot,flip").split(",")
    ts = []
    if "rot" in aug_list:
        ts.append(RandomRotation3D(degrees=30))
    if "flip" in aug_list:
        ts.append(RandomFlip3D())
    aug = DeviceAugmentor(ts)._augment_batch if ts else None
    step = jax.jit(make_train_step(losses, augment_fn=aug),
                   donate_argnums=(0,))
    state = TrainState.create(
        model, tx, jnp.zeros((batch,) + shape + (1,)),
        jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    images = rng.rand(batch, *shape).astype(np.float32)
    if aug is None:
        # no device augmentor => the loader ships NDHWC (the augmentor
        # is what adds the channel dim on the raw wire format)
        images = images[..., None]
    images = jnp.asarray(images)
    labels = jnp.asarray(
        rng.randint(0, n_cls, (batch,) + shape).astype(np.int32))
    key = jax.random.PRNGKey(1)

    if os.environ.get("PROBE_DUMP_HLO"):
        txt = step.lower(state, images, labels, key).compile().as_text()
        with open(os.environ["PROBE_DUMP_HLO"], "w") as f:
            f.write(txt)
        print("wrote compiled HLO to", os.environ["PROBE_DUMP_HLO"])

    state, m = step(state, images, labels, key)
    _sync(m["loss"])
    t0 = time.time()
    for _ in range(3):
        state, m = step(state, images, labels, key)
    _sync(m["loss"])
    print("spine train step wall: {:.0f} ms (aug={})".format(
        (time.time() - t0) / 3 * 1e3, aug_list))

    outdir = "/tmp/spine_trace"
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state, m = step(state, images, labels, key)
        _sync(m["loss"])
    _print_categorized(outdir, steps)


def _print_categorized(outdir, steps, top=25):
    """Device 'XLA Ops' track events grouped by trace_ops.categorize."""
    import glob
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from trace_ops import categorize

    traces = sorted(glob.glob(outdir + "/**/*.trace.json.gz",
                              recursive=True))
    if not traces:
        print("no trace written")
        return
    with gzip.open(traces[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pnames[e["pid"]] = e["args"].get("name", "?")
            elif e.get("name") == "thread_name":
                tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "?")
    cats, ops = {}, {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        tname = tnames.get((e["pid"], e.get("tid")), "")
        if "XLA Ops" not in tname:
            continue
        name = e.get("name", "?")
        hcat = (e.get("args") or {}).get("hlo_category", "")
        c = categorize(name, hcat)
        cats[c] = cats.get(c, 0) + e["dur"]
        ops[(name, c)] = ops.get((name, c), 0) + e["dur"]
    print("-- per-category device ms/step --")
    for c, d in sorted(cats.items(), key=lambda kv: -kv[1]):
        print("{:>10.2f} ms  {}".format(d / 1e3 / steps, c))
    print("-- top ops --")
    for (name, c), d in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
        print("{:>10.2f} ms  [{}] {}".format(d / 1e3 / steps, c,
                                             name[:90]))


def probe_loss(iters=5):
    """Time grad(CE+Dice) at the spine deep-sup head shape for the
    current per-class-loop formulation vs a fused iota-compare
    variant (one-hot built INSIDE the reduce fusion, never
    materialized). Decides VERDICT-r5 loss-row work: jvp reduce_sum
    was 36 ms/step + bwd broadcast 20 ms in the spine profile."""
    import jax
    import jax.numpy as jnp

    from medicalseg_tpu.models.losses import (CrossEntropyLoss, DiceLoss,
                                              MixedLoss)

    n_cls = 20
    # 256^2 slices: 4x smaller than the flagship head (the full-size
    # current-formulation grad took > 40 min of remote compile);
    # the A/B is relative, absolute ms scale by ~4x
    shape = (3, 12, 256, 256)
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(*shape, n_cls).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, n_cls, shape).astype(np.int32))

    mixed = MixedLoss([CrossEntropyLoss(), DiceLoss()], [1.0, 1.0])

    def cur(lg, lb):
        loss_list, _ = mixed(lg, lb)
        return sum(loss_list)

    def fused(lg, lb):
        iota = jnp.arange(n_cls, dtype=jnp.int32)
        oh = (lb[..., None] == iota).astype(jnp.float32)
        # CE with dynamic inverse-frequency weights (loss_utils
        # semantics): weight_c from softmax stats
        lp = jax.nn.log_softmax(lg, axis=-1)
        probs = jnp.exp(lp)
        total = jnp.float32(probs.size // n_cls)
        sums = jnp.sum(probs, axis=(0, 1, 2, 3))
        weight = jax.lax.stop_gradient((total - sums) / sums)
        nll = -jnp.sum(lp * oh, axis=-1)
        w = jnp.sum(weight * oh, axis=-1)
        ce = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)
        # dice (sigmoid norm)
        pv = jax.nn.sigmoid(lg)
        inter = jnp.sum(pv * oh, axis=(0, 1, 2, 3))
        den = jnp.sum(pv * pv, axis=(0, 1, 2, 3)) + jnp.sum(
            oh, axis=(0, 1, 2, 3))
        dice = 1.0 - jnp.mean(2 * inter / jnp.clip(den, min=1e-6))
        return ce + dice

    for name, f in (("current", cur), ("fused", fused)):
        g = jax.jit(jax.grad(f))
        _sync(g(logits, labels))
        t0 = time.time()
        for _ in range(iters):
            o = g(logits, labels)
        _sync(o)
        print("loss grad {}: {:.1f} ms".format(
            name, (time.time() - t0) / iters * 1e3))


def probe_head1x1(reps=3):
    """VERDICT r4 #4: A/B the Conv1x1KL head at eval on the
    device-resident serving contract (bench_pipeline, argmax out),
    3-rep medians per arm. If 'kl' costs serving throughput it gets
    gated to train; 'conv' is the stock nn.Conv 1^3."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    for mode in ("kl", "conv"):
        vals = sorted(bench.bench_pipeline(iters=1, head_1x1=mode)
                      for _ in range(reps))
        print("head_1x1={}: median {:.2f} vol/s, reps {}".format(
            mode, vals[reps // 2], [round(v, 2) for v in vals]))


def main():
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.devices()[0].platform)
    if which in ("h2d", "all"):
        probe_h2d()
    if which in ("pallas", "all"):
        probe_pallas()
    if which in ("pallas_amortized", "all"):
        probe_pallas_amortized()
    if which in ("model_fwd", "all"):
        probe_model_fwd()
    if which == "model_fwd_trace":
        probe_model_fwd_trace()
    if which == "dispatch":
        probe_dispatch()
    if which == "serving":
        probe_serving()
    if which in ("train_profile", "all"):
        probe_train_profile()
    if which == "spine_profile":
        probe_spine_profile()
    if which == "head1x1":
        probe_head1x1()
    if which == "loss":
        probe_loss()


if __name__ == "__main__":
    main()
