# Copyright 2026. Apache License 2.0.
"""Sliding-window whole-volume inference with overlap blending.

Beyond-reference capability (the reference leaves aug/sliding-window
inference as a todo, medicalseg/core/infer.py:97; BASELINE.json names it
the north star). TPU-first design:

  * the window grid is computed from static shapes, so the whole
    gather -> batched-conv -> blend -> scatter-add loop is ONE jitted
    program per volume shape;
  * windows are processed in fixed-size batches via ``lax.scan`` —
    compile once, stream any number of windows through the MXU;
  * overlap blending uses a (precomputed, constant-folded) Gaussian or
    constant importance map, accumulated with dynamic_update_slice
    read-modify-write inside the scan.
"""

import functools
import math
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def compute_window_starts(in_size: int, roi: int, overlap: float):
    """Window start offsets covering [0, in_size) with >= overlap
    fraction of roi between neighbours; final window clamped flush."""
    if roi >= in_size:
        return [0]
    stride = max(1, int(roi * (1.0 - overlap)))
    starts = list(range(0, in_size - roi + 1, stride))
    if starts[-1] != in_size - roi:
        starts.append(in_size - roi)
    return starts


def gaussian_importance(roi_dhw, sigma_scale=0.125, dtype=jnp.float32):
    """nnU-Net-style Gaussian blend map peaking at the window center."""
    grids = []
    for s in roi_dhw:
        x = np.arange(s, dtype=np.float64)
        center = (s - 1) / 2.0
        sigma = max(s * sigma_scale, 1e-3)
        grids.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    m = grids[0][:, None, None] * grids[1][None, :, None] * \
        grids[2][None, None, :]
    m = m / m.max()
    m = np.maximum(m, m[m > 0].min())  # avoid zero weights at corners
    return jnp.asarray(m, dtype)


@functools.partial(
    jax.jit,
    static_argnames=("apply_fn", "roi_size", "overlap", "window_batch",
                     "blend", "num_classes"))
def sliding_window_inference(apply_fn, variables, volume, roi_size,
                             num_classes, overlap=0.25, window_batch=4,
                             blend="gaussian"):
    """Whole-volume logits by tiled window inference.

    Args:
        apply_fn: model.apply (called with train=False).
        variables: model variables.
        volume: [D, H, W, C] input volume.
        roi_size: static (d, h, w) window size.
        num_classes: output channels.
        overlap: fractional overlap between windows.
        window_batch: windows per forward pass (pads the last batch).
        blend: 'gaussian' | 'constant'.

    Returns:
        [D, H, W, num_classes] float32 blended logits.
    """
    d, h, w = volume.shape[:3]
    roi = tuple(int(r) for r in roi_size)
    pad = [max(roi[i] - volume.shape[i], 0) for i in range(3)]
    if any(pad):
        volume = jnp.pad(volume, [(0, pad[0]), (0, pad[1]), (0, pad[2]),
                                  (0, 0)])
    pd, ph, pw = volume.shape[:3]

    starts = [jnp.asarray(s, jnp.int32) for s in (
        compute_window_starts(pd, roi[0], overlap),
        compute_window_starts(ph, roi[1], overlap),
        compute_window_starts(pw, roi[2], overlap))]
    grid = jnp.stack(jnp.meshgrid(*starts, indexing="ij"),
                     axis=-1).reshape(-1, 3)
    n_windows = grid.shape[0]

    nb = -(-n_windows // window_batch)  # ceil
    padded = nb * window_batch
    grid = jnp.concatenate(
        [grid, jnp.tile(grid[-1:], (padded - n_windows, 1))])
    # mask so duplicate padding windows don't double-count
    wmask = (jnp.arange(padded) < n_windows).astype(jnp.float32)
    grid_batches = grid.reshape(nb, window_batch, 3)
    mask_batches = wmask.reshape(nb, window_batch)

    if blend == "gaussian":
        importance = gaussian_importance(roi)
    else:
        importance = jnp.ones(roi, jnp.float32)
    importance = importance[..., None]  # [d, h, w, 1]

    acc = jnp.zeros((pd, ph, pw, num_classes), jnp.float32)
    weight = jnp.zeros((pd, ph, pw, 1), jnp.float32)

    def extract(start):
        return jax.lax.dynamic_slice(
            volume, (start[0], start[1], start[2], 0),
            roi + (volume.shape[3],))

    def body(carry, inp):
        acc, weight = carry
        starts_b, mask_b = inp
        windows = jax.vmap(extract)(starts_b)  # [B, d, h, w, C]
        logits = apply_fn(variables, windows, train=False)[0]
        logits = logits.astype(jnp.float32) * importance[None] * \
            mask_b[:, None, None, None, None]

        def scatter_one(i, carry):
            acc, weight = carry
            s = starts_b[i]
            cur = jax.lax.dynamic_slice(
                acc, (s[0], s[1], s[2], 0), roi + (num_classes,))
            acc = jax.lax.dynamic_update_slice(
                acc, cur + logits[i], (s[0], s[1], s[2], 0))
            curw = jax.lax.dynamic_slice(
                weight, (s[0], s[1], s[2], 0), roi + (1,))
            weight = jax.lax.dynamic_update_slice(
                weight, curw + importance * mask_b[i],
                (s[0], s[1], s[2], 0))
            return acc, weight

        acc, weight = jax.lax.fori_loop(0, window_batch, scatter_one,
                                        (acc, weight))
        return (acc, weight), None

    (acc, weight), _ = jax.lax.scan(body, (acc, weight),
                                    (grid_batches, mask_batches))
    out = acc / jnp.maximum(weight, 1e-8)
    return out[:d, :h, :w]


@functools.partial(
    jax.jit,
    static_argnames=("apply_fn", "roi_size", "overlap", "window_batch",
                     "blend", "num_classes"))
def sliding_window_inference_batched(apply_fn, variables, volumes,
                                     roi_size, num_classes, overlap=0.25,
                                     window_batch=4, blend="gaussian"):
    """Sliding-window inference over a BATCH of same-shape volumes.

    Windows from *all* volumes stream through one ``lax.scan`` — each
    forward pass mixes windows across volumes, so serving N volumes
    keeps the MXU batch full even when one volume has few windows
    (round 2, VERDICT #6; the per-volume variant pads its tail batch
    with masked duplicates instead).

    Args:
        volumes: [N, D, H, W, C].
    Returns:
        [N, D, H, W, num_classes] float32 blended logits.
    """
    n, d, h, w = volumes.shape[:4]
    roi = tuple(int(r) for r in roi_size)
    pad = [max(roi[i] - volumes.shape[1 + i], 0) for i in range(3)]
    if any(pad):
        volumes = jnp.pad(volumes, [(0, 0), (0, pad[0]), (0, pad[1]),
                                    (0, pad[2]), (0, 0)])
    pd, ph, pw = volumes.shape[1:4]

    starts = [
        compute_window_starts(pd, roi[0], overlap),
        compute_window_starts(ph, roi[1], overlap),
        compute_window_starts(pw, roi[2], overlap)]
    per_vol = np.stack(np.meshgrid(*starts, indexing="ij"),
                       axis=-1).reshape(-1, 3)
    # (volume_idx, d0, h0, w0) over every volume's windows
    grid = np.concatenate(
        [np.concatenate([np.full((len(per_vol), 1), v), per_vol], axis=1)
         for v in range(n)]).astype(np.int32)
    n_windows = grid.shape[0]

    nb = -(-n_windows // window_batch)
    padded = nb * window_batch
    grid = np.concatenate(
        [grid, np.tile(grid[-1:], (padded - n_windows, 1))])
    wmask = (np.arange(padded) < n_windows).astype(np.float32)
    grid_batches = jnp.asarray(grid.reshape(nb, window_batch, 4))
    mask_batches = jnp.asarray(wmask.reshape(nb, window_batch))

    if blend == "gaussian":
        importance = gaussian_importance(roi)
    else:
        importance = jnp.ones(roi, jnp.float32)
    importance = importance[..., None]

    acc = jnp.zeros((n, pd, ph, pw, num_classes), jnp.float32)
    weight = jnp.zeros((n, pd, ph, pw, 1), jnp.float32)

    def extract(s):
        return jax.lax.dynamic_slice(
            volumes, (s[0], s[1], s[2], s[3], 0),
            (1,) + roi + (volumes.shape[4],))[0]

    def body(carry, inp):
        acc, weight = carry
        starts_b, mask_b = inp
        windows = jax.vmap(extract)(starts_b)
        logits = apply_fn(variables, windows, train=False)[0]
        logits = logits.astype(jnp.float32) * importance[None] * \
            mask_b[:, None, None, None, None]

        def scatter_one(i, carry):
            acc, weight = carry
            s = starts_b[i]
            loc = (s[0], s[1], s[2], s[3], 0)
            cur = jax.lax.dynamic_slice(
                acc, loc, (1,) + roi + (num_classes,))
            acc = jax.lax.dynamic_update_slice(acc, cur + logits[i][None],
                                               loc)
            curw = jax.lax.dynamic_slice(weight, loc, (1,) + roi + (1,))
            weight = jax.lax.dynamic_update_slice(
                weight, curw + (importance * mask_b[i])[None], loc)
            return acc, weight

        acc, weight = jax.lax.fori_loop(0, window_batch, scatter_one,
                                        (acc, weight))
        return (acc, weight), None

    (acc, weight), _ = jax.lax.scan(body, (acc, weight),
                                    (grid_batches, mask_batches))
    out = acc / jnp.maximum(weight, 1e-8)
    return out[:, :d, :h, :w]
