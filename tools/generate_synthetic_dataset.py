# Copyright 2026. Apache License 2.0.
"""Generate a synthetic phase0 dataset for smoke tests / CPU runs.

Creates N volumes of nested spheres (3 classes: background / outer shell
/ core) in the same layout the Prep tools emit (SURVEY §2.5): ``images/``
+ ``labels/`` .npy files, ``train_list.txt`` / ``val_list.txt``, and a
dataset.json with per-file geometry — so the full train/val/export stack
runs end-to-end without downloading real data.
"""

import argparse
import json
import os

import numpy as np


def make_volume(rng, size=32, num_classes=3):
    """A noisy volume with a random bright sphere (class 1) and a denser
    core (class 2)."""
    coords = np.stack(np.meshgrid(*([np.arange(size)] * 3),
                                  indexing="ij")).astype(np.float32)
    center = rng.uniform(size * 0.3, size * 0.7, size=3)
    radius = rng.uniform(size * 0.15, size * 0.3)
    dist = np.sqrt(((coords - center[:, None, None, None]) ** 2).sum(0))

    label = np.zeros((size,) * 3, np.int32)
    label[dist < radius] = 1
    label[dist < radius * 0.5] = 2

    img = rng.normal(0.2, 0.05, (size,) * 3).astype(np.float32)
    img[label == 1] += 0.4
    img[label == 2] += 0.4
    img = np.clip(img, 0, 1) * 255.0
    return img.astype(np.float32), label


def make_volume_lesions(rng, size=128, num_classes=3):
    """A structured CT-like volume for convergence studies: a smooth
    background intensity field with 2-5 ellipsoidal 'lesions' (class 1)
    each holding a denser core (class 2), deliberate intensity overlap
    between classes, and per-volume gain/offset jitter — learnable with
    context, not trivially thresholdable voxel-wise."""
    coords = np.stack(np.meshgrid(*([np.arange(size)] * 3),
                                  indexing="ij")).astype(np.float32)
    # smooth low-frequency background (lung-parenchyma-ish gradients)
    f = [rng.uniform(0.5, 1.5) * 2 * np.pi / size for _ in range(3)]
    ph = rng.uniform(0, 2 * np.pi, 3)
    bg = (0.25 + 0.05 * np.sin(coords[0] * f[0] + ph[0]) *
          np.cos(coords[1] * f[1] + ph[1]) +
          0.04 * np.sin(coords[2] * f[2] + ph[2]))

    label = np.zeros((size,) * 3, np.int32)
    img = bg.astype(np.float32)
    for _ in range(rng.randint(2, 6)):
        center = rng.uniform(size * 0.15, size * 0.85, size=3)
        radii = rng.uniform(size * 0.06, size * 0.16, size=3)
        d = np.sqrt((((coords - center[:, None, None, None]) /
                      radii[:, None, None, None]) ** 2).sum(0))
        lesion = d < 1.0
        core = d < rng.uniform(0.35, 0.55)
        label[lesion] = 1
        label[core] = 2
        # overlapping intensity bumps: lesion +0.18..0.3, core +0.1 more
        img = img + lesion * rng.uniform(0.18, 0.30)
        img = img + core * rng.uniform(0.05, 0.15)
    img = img + rng.normal(0.0, 0.06, (size,) * 3)
    gain, off = rng.uniform(0.9, 1.1), rng.uniform(-0.03, 0.03)
    img = np.clip(img * gain + off, 0, 1) * 255.0
    return img.astype(np.float32), label


def make_volume_spine(rng, size=None, num_classes=20):
    """A spine-MRI-like volume at the MRISpineSeg geometry
    (512 x 512 x 12, 20 classes — reference configs/mri_spine_seg/
    vnetdeepsup_mri_spine_seg_512_512_12_15k.yml). Class map mirrors
    the real MRSpineSeg labels: **class 1 = sacrum** — a wedge unlike
    any vertebra (narrow and posteriorly offset at the L5 junction,
    widening toward the caudal tip), the unique caudal anchor the net
    counts levels from. (Real sacra are widest at the junction; what
    matters for the benchmark is that the anchor's shape is unique and
    caudal, which this is — the trained net's level-error histogram is
    centered at 0, confirming the cue is used.)
    Classes 2-10 = 9 vertebral bodies caudal->cranial with a
    caudal->cranial size gradient (~3.5%/level, lumbar bodies are
    larger than thoracic), classes 11-19 = intervertebral discs
    (11 = the sacrum/L5 junction). Identity is anchored + ordinal:
    the sacrum's unique shape plus the size gradient give local cues
    for counting levels — the same cues that make the real task
    learnable (a first cut with 10 interchangeable vertebrae and no
    anchor plateaued at val mDice 0.085: the net segmented the column,
    binary dice 0.89, but could not assign level identity).
    Extent is near-constant across the 12 sagittal slices w/ jitter.
    """
    H, W, D = 512, 512, 12
    yy = np.arange(H, dtype=np.float32)
    xx = np.arange(W, dtype=np.float32)

    # smooth tissue background + slow illumination gradient
    img = rng.normal(0.25, 0.04, (H, W, D)).astype(np.float32)
    img += (0.05 * np.sin(yy / H * np.pi * rng.uniform(0.5, 1.5))
            )[:, None, None]

    # spinal curve: x-center as a gentle sinusoid of y (lordosis-ish)
    x0 = rng.uniform(220, 290)
    amp = rng.uniform(15, 45)
    phase = rng.uniform(0, 2 * np.pi)
    curve = x0 + amp * np.sin(yy / H * 2.2 * np.pi + phase)

    label = np.zeros((H, W, D), np.int32)
    vert_h0 = rng.uniform(27, 33)
    disc_h = rng.uniform(7, 10)
    half_w0 = rng.uniform(24, 32)
    y = H - rng.uniform(30, 70)  # caudal-most extent (sacrum tip)

    # ---- sacrum (class 1): narrow + posteriorly offset at the top
    # (L5 junction), widening toward the caudal tip
    sac_h = rng.uniform(55, 70)
    y_top = y - sac_h
    frac = np.clip((yy - y_top) / sac_h, 0.0, 1.0)  # 0 at top, 1 at tip
    drift = rng.uniform(18, 32)
    sac_hw = half_w0 * (0.35 + 1.0 * frac)
    for d in range(D):
        jx = rng.uniform(-2, 2)
        xc = curve + (1.0 - frac) * drift + jx
        xs = np.abs(xx[None, :] - xc[:, None]) < sac_hw[:, None]
        keep = ((yy >= y_top) & (yy < y))[:, None] & xs
        label[:, :, d][keep] = 1
        img[:, :, d][keep] = rng.uniform(0.48, 0.58)
    y = y_top

    # ---- 9 x (disc, vertebra) caudal -> cranial with size gradient
    for k in range(9):
        hw = half_w0 * (1.0 - 0.03 * k)
        # disc below vertebra k (class 11+k; 11 = sacrum/L5 junction):
        # thinner, brighter (T2-bright nucleus)
        yd_top = y - disc_h
        for d in range(D):
            xs = np.abs(xx[None, :] - curve[:, None]) < hw * 0.9
            keep = ((yy >= yd_top) & (yy < y))[:, None] & xs
            label[:, :, d][keep] = 11 + k
            img[:, :, d][keep] = rng.uniform(0.78, 0.9)
        y = yd_top
        # vertebral body (class 2+k): rounded rect, marrow-bright
        vh = vert_h0 * (1.0 - 0.035 * k)
        y_top = y - vh
        ys = (yy >= y_top) & (yy < y)
        for d in range(D):
            jx = rng.uniform(-2, 2)
            xs = np.abs(xx[None, :] - (curve[:, None] + jx)) < hw
            # shrink at the block's vertical edges (rounded corners)
            edge = np.minimum(yy - y_top, y - yy) / vh
            keep = ys[:, None] & xs & (edge[:, None] > 0.06)
            label[:, :, d][keep] = 2 + k
            img[:, :, d][keep] = rng.uniform(0.55, 0.7)
        y = y_top

    # spinal canal stripe behind the column (dark), unlabeled
    for d in range(D):
        xs = (xx[None, :] - (curve[:, None] + half_w0 + 8) > 0) & \
             (xx[None, :] - (curve[:, None] + half_w0 + 8) < 12)
        img[:, :, d][xs] *= 0.5

    img += rng.normal(0.0, 0.05, (H, W, D)).astype(np.float32)
    gain, off = rng.uniform(0.9, 1.1), rng.uniform(-0.03, 0.03)
    img = np.clip(img * gain + off, 0, 1) * 255.0
    # TPU-first layout: slices-major (12, 512, 512) puts the 512 extent
    # on the minor (lane) axis — the reference's (512, 512, 12) order
    # (its prepare_mri_spine_seg resample target) leaves 12 on the lanes
    # and starves the MXU. Model kernels/strides transpose to match
    # (configs/synthetic/vnetdeepsup_synspine_3k.yml).
    img = np.ascontiguousarray(np.moveaxis(img, -1, 0))
    label = np.ascontiguousarray(np.moveaxis(label, -1, 0))
    return img.astype(np.float32), label


def generate(root, num_volumes=8, size=32, num_classes=3, seed=0,
             val_frac=0.25, style="spheres", name="synthetic"):
    rng = np.random.RandomState(seed)
    phase0 = os.path.join(root, name, name + "_phase0")
    os.makedirs(os.path.join(phase0, "images"), exist_ok=True)
    os.makedirs(os.path.join(phase0, "labels"), exist_ok=True)

    maker = {"lesions": make_volume_lesions,
             "spine": make_volume_spine}.get(style, make_volume)
    if style == "spine":
        num_classes = 20
    entries = []
    json_training = {}
    for i in range(num_volumes):
        img, lab = maker(rng, size, num_classes)
        if style == "spine":
            # every class must have support in every volume so no val
            # dice row can be a zero-support artifact (VERDICT r4 #5);
            # the anatomy generator draws all 19 structures by
            # construction — this guards regressions in it
            counts = np.bincount(lab.reshape(-1), minlength=num_classes)
            assert (counts > 0).all(), \
                "spine volume {} lost classes {}".format(
                    i, np.where(counts == 0)[0].tolist())
        img_rel = "images/vol_{:03d}.npy".format(i)
        lab_rel = "labels/vol_{:03d}.npy".format(i)
        np.save(os.path.join(phase0, img_rel), img)
        # labels fit uint8 for any dataset here (< 256 classes); keeps
        # the on-disk footprint 4x smaller than int32
        np.save(os.path.join(phase0, lab_rel), lab.astype(np.uint8))
        entries.append("{} {}".format(img_rel, lab_rel))
        json_training["vol_{:03d}".format(i)] = {
            "spacing_resample": [1.0, 1.0, 1.0],
            "origin": [0.0, 0.0, 0.0],
            "direction": [1, 0, 0, 0, 1, 0, 0, 0, 1],
            "dim": 3,
            "shape": list(img.shape),
        }

    n_val = max(1, int(num_volumes * val_frac))
    with open(os.path.join(phase0, "train_list.txt"), "w") as f:
        f.write("\n".join(entries[:-n_val]) + "\n")
    with open(os.path.join(phase0, "val_list.txt"), "w") as f:
        f.write("\n".join(entries[-n_val:]) + "\n")

    raw_dir = os.path.join(root, name, name + "_raw")
    os.makedirs(raw_dir, exist_ok=True)
    with open(os.path.join(raw_dir, "dataset.json"), "w") as f:
        json.dump({"name": name, "training": json_training,
                   "labels": {str(i): str(i) for i in range(num_classes)}},
                  f, indent=2)
    return phase0


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="data")
    parser.add_argument("--num_volumes", type=int, default=8)
    parser.add_argument("--size", type=int, default=32)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--style", default="spheres",
                        choices=["spheres", "lesions", "spine"])
    parser.add_argument("--name", default="synthetic")
    parser.add_argument("--val_frac", type=float, default=0.25)
    args = parser.parse_args()
    path = generate(args.root, args.num_volumes, args.size, seed=args.seed,
                    val_frac=args.val_frac, style=args.style,
                    name=args.name)
    print("Synthetic dataset written to", path)
