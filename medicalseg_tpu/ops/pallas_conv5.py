# Copyright 2026. Apache License 2.0.
"""Pallas TPU kernels for the narrow-channel 5^3 convolutions.

Why: VNet's hottest ops are the 5^3 convs whose channel counts are far
below the TPU's 128-wide lanes — the OutputTransition head (C_in=32 ->
C_out=num_classes~3, reference vnet.py:159-175) and the InputTransition
stem (C_in=1 -> 16, reference vnet.py:57-79). XLA lowers these to VPU
loops (47 ms resp. 20 ms of an ~85 ms forward at 128^3, round-1
profile); both XLA-level reformulations tried in round 1 (lane padding,
reassociated matmuls) lost to HBM traffic. These kernels keep every
partial in VMEM and put the work on the MXU:

* ``conv5_head`` (general C_in, tiny C_out) — factored formulation:
  unroll the W-axis taps into the contraction, so each spatial tile does
  ONE (V, 5*Ci) @ (5*Ci, 25*Co) matmul producing per-(kd,kh)-tap
  partials, then accumulates the 25 partials with static (kd, kh) tile
  shifts — all VMEM-resident. MXU work per voxel: 5Ci x 25Co (vs the
  im2col alternative's 125Ci x 128-padded-Co).
* ``conv5_stem`` (C_in=1) — full-tap im2col: build (V, 125) rows with
  static shifted slices, one (V, 125) @ (125, Co) matmul. No halo
  recompute (all taps live in the contraction).

Both are exposed through :func:`conv5` with a custom VJP whose backward
is the XLA conv's VJP (identical numerics to autodiff of the stock
conv), so the kernels drop into training unchanged.

Layout: NDHWC, SAME padding, stride 1, kernel 5^3 — exactly the shapes
VNet uses. Anything else falls back to XLA (`_conv5_xla`).
"""

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 5  # kernel edge
P = K // 2  # halo


# ----------------------------------------------------------------------
# reference XLA path (fallback + backward)
# ----------------------------------------------------------------------
def _conv5_xla(x, w, b):
    """Stock XLA NDHWC 5^3 SAME conv (the semantics both kernels match)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + b.astype(out.dtype)


# ----------------------------------------------------------------------
# tile selection
# ----------------------------------------------------------------------
def _pick_tiles(d, h, w, ci, bytes_budget=10 * 1024 * 1024):
    """(Dt, Ht) spatial tile so the slab + unrolled rows + partials fit
    VMEM. Returns None if no admissible tile exists."""
    for dt, ht in ((8, 16), (8, 8), (4, 8), (4, 4), (2, 4), (2, 2),
                   (1, 2), (1, 1)):
        if d % dt or h % ht:
            continue
        slab = (dt + 4) * (ht + 4) * (w + 4) * max(ci, 8) * 2  # bf16
        rows = (dt + 4) * (ht + 4) * w * 5 * ci * 2            # bf16
        part = (dt + 4) * (ht + 4) * w * 128 * 4               # f32 (padded)
        if slab + rows + part <= bytes_budget:
            return dt, ht
    return None


def head_eligible(x_shape: Tuple[int, ...], ci: int, co: int) -> bool:
    d, h, w = x_shape[1:4]
    return (co <= 8 and ci <= 64 and w % 128 == 0 and
            _pick_tiles(d, h, w, ci) is not None)


def stem_eligible(x_shape: Tuple[int, ...], ci: int, co: int) -> bool:
    d, h, w = x_shape[1:4]
    return (ci == 1 and co <= 128 and w % 128 == 0 and
            _pick_tiles(d, h, w, 8) is not None)


# ----------------------------------------------------------------------
# head kernel: general C_in, tiny C_out
# ----------------------------------------------------------------------
def _head_kernel(xp_ref, wmed_ref, b_ref, out_ref, slab, acc,
                 *, dt, ht, w, ci, co):
    """One (n, d-tile, h-tile) program.

    xp_ref: HBM [N, D+4, H+4, W+4, Ci] (padded input)
    wmed_ref: VMEM [5*Ci, 25*Co] (kw,ci -> (kd,kh),co rearranged weights)
    b_ref: VMEM [Co]
    out_ref: VMEM block [1, Dt, Ht, W, Co]
    slab: VMEM scratch [Dt+4, Ht+4, W+4, Ci]
    acc: VMEM scratch f32 [Dt+4, Ht+4, W, 25*Co] (tap partials)
    """
    n = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)

    def run(sem):
        copy = pltpu.make_async_copy(
            xp_ref.at[n, pl.ds(di * dt, dt + 4), pl.ds(hi * ht, ht + 4)],
            slab, sem)
        copy.start()
        copy.wait()

    pl.run_scoped(run, pltpu.SemaphoreType.DMA(()))

    # W-axis unroll: rows[..., kw*Ci:(kw+1)*Ci] = slab[:, :, kw:kw+W, :]
    rows = jnp.concatenate(
        [slab[:, :, kw:kw + w, :] for kw in range(K)],
        axis=-1).astype(jnp.bfloat16)  # [Dt+4, Ht+4, W, 5*Ci]

    # one MXU matmul per tile: every (kd, kh) tap's partial at once
    acc[:] = jax.lax.dot_general(
        rows.reshape(-1, K * ci), wmed_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(dt + 4, ht + 4, w, 25 * co)

    # accumulate the 25 tap partials with static tile shifts
    out = jnp.zeros((dt, ht, w, co), jnp.float32)
    for kd in range(K):
        for kh in range(K):
            t = kd * K + kh
            out = out + acc[kd:kd + dt, kh:kh + ht, :,
                            t * co:(t + 1) * co]
    out_ref[0] = (out + b_ref[:].astype(jnp.float32)).astype(
        out_ref.dtype)


def _conv5_head_pallas(x, w, b, *, interpret=False):
    n, d, h, ww, ci = x.shape
    co = w.shape[-1]
    tiles = _pick_tiles(d, h, ww, ci)
    dt, ht = tiles
    xp = jnp.pad(x, ((0, 0), (P, P), (P, P), (P, P), (0, 0)))

    # rearrange (kd,kh,kw,ci,co) -> [kw*ci, (kd*5+kh)*co]
    wmed = jnp.transpose(w, (2, 3, 0, 1, 4)).reshape(K * ci, 25 * co)

    grid = (n, d // dt, h // ht)
    kernel = functools.partial(_head_kernel, dt=dt, ht=ht, w=ww, ci=ci,
                               co=co)
    flops = 2 * n * d * h * ww * (K * ci) * (25 * co) * (
        (dt + 4) * (ht + 4)) // (dt * ht)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, dt, ht, ww, co),
            lambda ni, di, hi: (ni, di, hi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d, h, ww, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((dt + 4, ht + 4, ww + 4, ci), x.dtype),
            pltpu.VMEM((dt + 4, ht + 4, ww, 25 * co), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=xp.size * xp.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, wmed, b)


# ----------------------------------------------------------------------
# stem kernel: C_in = 1
# ----------------------------------------------------------------------
def _stem_kernel(xp_ref, wflat_ref, b_ref, out_ref, slab,
                 *, dt, ht, w, co):
    """xp_ref: HBM [N, D+4, H+4, W+4]; wflat: VMEM [125, Co]."""
    n = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)

    def run(sem):
        copy = pltpu.make_async_copy(
            xp_ref.at[n, pl.ds(di * dt, dt + 4), pl.ds(hi * ht, ht + 4)],
            slab, sem)
        copy.start()
        copy.wait()

    pl.run_scoped(run, pltpu.SemaphoreType.DMA(()))

    # full-tap im2col: rows[..., kd*25+kh*5+kw] = shifted slab
    cols = []
    for kd in range(K):
        for kh in range(K):
            for kw in range(K):
                cols.append(slab[kd:kd + dt, kh:kh + ht, kw:kw + w])
    rows = jnp.stack(cols, axis=-1).astype(jnp.bfloat16)  # [Dt,Ht,W,125]

    out = jax.lax.dot_general(
        rows.reshape(-1, K ** 3), wflat_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(dt, ht, w, -1)
    out_ref[0] = (out + b_ref[:].astype(jnp.float32)).astype(
        out_ref.dtype)


def _conv5_stem_pallas(x, w, b, *, interpret=False):
    n, d, h, ww, ci = x.shape
    assert ci == 1
    co = w.shape[-1]
    dt, ht = _pick_tiles(d, h, ww, 8)
    xp = jnp.pad(x[..., 0], ((0, 0), (P, P), (P, P), (P, P)))
    wflat = w.reshape(K ** 3, co)  # (kd,kh,kw,1,co) row-major == loop order

    grid = (n, d // dt, h // ht)
    kernel = functools.partial(_stem_kernel, dt=dt, ht=ht, w=ww, co=co)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, dt, ht, ww, co),
            lambda ni, di, hi: (ni, di, hi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d, h, ww, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((dt + 4, ht + 4, ww + 4), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * h * ww * (K ** 3) * co,
            bytes_accessed=xp.size * xp.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, wflat, b)


# ----------------------------------------------------------------------
# public op with XLA-vjp backward
# ----------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv5(x, w, b, kind="head", interpret=False):
    """5^3 SAME conv via the Pallas kernels.

    Args:
        x: [N, D, H, W, Ci]; w: [5, 5, 5, Ci, Co]; b: [Co].
        kind: 'head' (factored) or 'stem' (C_in=1 im2col).
    """
    if kind == "stem":
        return _conv5_stem_pallas(x, w, b, interpret=interpret)
    return _conv5_head_pallas(x, w, b, interpret=interpret)


def _conv5_fwd(x, w, b, kind, interpret):
    return conv5(x, w, b, kind, interpret), (x, w, b)


def _conv5_bwd(kind, interpret, res, g):
    # the backward is the stock conv's VJP — bit-compatible with training
    # through the XLA path (the Pallas forward matches it numerically)
    x, w, b = res
    _, vjp = jax.vjp(_conv5_xla, x, w, b)
    return vjp(g)


conv5.defvjp(_conv5_fwd, _conv5_bwd)
