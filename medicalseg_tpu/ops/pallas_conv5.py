# Copyright 2026. Apache License 2.0.
"""Pallas TPU kernels for the narrow-channel 5^3 convolutions.

Why: VNet's hottest ops are the 5^3 convs whose channel counts are far
below the TPU's 128-wide lanes — the OutputTransition head (C_in=32 ->
C_out=num_classes~3, reference vnet.py:159-175) and the InputTransition
stem (C_in=1 -> 16, reference vnet.py:57-79). XLA lowers these to VPU
loops (47 ms resp. 20 ms of an ~85 ms forward at 128^3, round-1
profile); both XLA-level reformulations tried in round 1 (lane padding,
reassociated matmuls) lost to HBM traffic.

Kernel design (third iteration — see hardware findings below): voxels on
the 128-wide lanes, channels on sublanes, and ALL 125 taps folded into a
single MXU contraction per (n, d, h-chunk) program:

* Host-side prep reshapes the NDHWC input to
  ``[N, D+4, Ci', 128 + (H+4)*W + 128]`` — spatial (h, w) flattened onto
  the minor (lane) axis with one zero margin tile on each side. Every
  manual HBM->VMEM DMA then slices only untiled dims (N, D) and
  128-aligned lane ranges, satisfying Mosaic's tiling rules.
* The matmul is ``[(kh, kw, co), (kd, ci)] @ [(kd, ci), voxel]`` — the
  RHS is the DMA'd slab itself (a free reshape), M carries the 25
  in-plane taps, K carries the 5 depth taps x channels. Same FLOPs as
  the direct conv per output row-block, but fewer MXU passes than a
  kw-in-K layout and zero VPU tap-matrix construction.
* The (kh, kw) tap partials land in distinct accumulator rows and are
  folded by static lane-offset slices (offset kh*W + kw + 126) with the
  SAME-padding mask applied per kw at fold time. The accumulator is
  f32, where Mosaic's lane rotates are supported.
* The stem (C_in=1) pre-shifts BOTH its kd and kw taps into input
  channels host-side (25 shifted copies of the single-channel volume,
  zero-padded SAME) and reuses the same kernel with KD=1 and a
  mask-free kh-only fold.

Hardware findings that shaped this (probed on v5e via the remote
compiler):
* Mosaic rejects HBM->VMEM DMA slices whose minor dim is not 128-lane
  aligned ("Slice shape along dimension 4 must be aligned to tiling
  (128)") — a channels-minor slab layout is unusable for C=32.
* ``pltpu.roll`` lowers to ``tpu.dynamic_rotate``: unimplemented for
  bf16 ("Rotate with non-32-bit data"), shift must be >= 0, and an
  ``s % lc`` rotate of ~8700 lanes measured 6-100x slower than the
  kernel math — so this design needs no vector rotates at all on the
  low-precision side.

Both kernels are exposed through :func:`conv5` with a custom VJP whose
backward is the XLA conv's VJP (identical numerics to autodiff of the
stock conv), so they drop into training unchanged.

Layout: NDHWC, SAME padding, stride 1, kernel 5^3 — exactly the shapes
VNet uses. Anything else falls back to XLA (`_conv5_xla`).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 5  # kernel edge
P = K // 2  # halo
MARGIN = 128  # zero lane-tile on each side of the flattened spatial axis


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
# tile selection / eligibility
# ----------------------------------------------------------------------
def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _sublane(dtype) -> int:
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def _co_chunk(co_p, fold_kw):
    """Rows per output-channel chunk: wide heads fold 8 channels at a
    time so the f32 accumulator stays VMEM-sized."""
    return co_p if (not fold_kw or co_p <= 16) else 8


def _pick_hc(h, w, ci_p, co_p, kd_n, itemsize, fold_kw,
             budget=11 * 1024 * 1024, align=True):
    """Largest h-chunk whose slab + accumulator fit VMEM. Both the DMA
    offset (hc*w) and the slab extent must be lane-tile multiples, so
    W only needs to divide into 128 with the 4-row halo: W % 32 == 0.
    (``align=False`` in interpreter mode, where tiny test shapes run.)"""
    cc = _co_chunk(co_p, fold_kw)
    m = (K * K if fold_kw else K) * cc
    # the weight block lives in VMEM for the whole grid — negligible at
    # C<=64 (<=1 MB) but 4.1 MB at Ci=Co=128, so it must be budgeted
    lhs = (K * K if fold_kw else K) * co_p * kd_n * ci_p * itemsize
    for hc in (64, 32, 16, 8, 4, 2, 1):
        if h % hc or (align and (hc * w) % 128):
            continue
        lc = (hc + 4) * w + 2 * MARGIN
        slab = 2 * kd_n * ci_p * lc * itemsize  # double-buffered
        acc = m * lc * 4
        res = co_p * hc * w * 4
        out = co_p * hc * w * itemsize * 2  # double-buffered out block
        if lhs + slab + acc + res + out <= budget:
            return hc
    return None


def _head_ok(x_shape, ci, co, dtype, co_cap):
    # Ci caps: 5*128 = 640 contraction tiles the MXU's K axis exactly;
    # beyond 128 the VMEM budget (which accounts for the weight block
    # and the Ci-proportional slab) is what gates — e.g. Ci=256 fits
    # only with co chunked to <= 64 (see conv5_wide).
    d, h, w = x_shape[1:4]
    ci_p = _round_up(ci, _sublane(dtype))
    co_p = _round_up(co, 8)
    return (co <= co_cap and ci <= 256 and w % 32 == 0 and
            _pick_hc(h, w, ci_p, co_p, K, jnp.dtype(dtype).itemsize,
                     True) is not None)


def head_eligible(x_shape: Tuple[int, ...], ci: int, co: int,
                  dtype=jnp.float32) -> bool:
    return _head_ok(x_shape, ci, co, dtype, 128)


def _wide_chunk(x_shape, ci, co, dtype):
    """Largest co chunk size a wide conv (Ci or Co beyond the direct
    kernel's budget) can run the head kernel with, or None."""
    for cg in (128, 64, 32):
        if co % cg == 0 and _head_ok(x_shape, ci, cg, dtype, cg):
            return cg
    return None


def wide_eligible(x_shape, ci, co, dtype=jnp.float32):
    """Co-chunked eligibility for the deep V-Net stacks (Ci or Co in
    (128, 256]) that the single-call VMEM budget rejects — e.g. the
    256-channel UpTransition_0 stack at the spine geometry (2 x 41
    ms/step as XLA convs, round-5 trace)."""
    if head_eligible(x_shape, ci, co, dtype):
        return False  # the direct kernel handles it
    if ci > 256 or co > 256:
        return False
    return _wide_chunk(x_shape, ci, co, dtype) is not None


def stem_eligible(x_shape: Tuple[int, ...], ci: int, co: int,
                  dtype=jnp.float32) -> bool:
    d, h, w = x_shape[1:4]
    ci_p = _round_up(K * K, _sublane(dtype))
    co_p = _round_up(co, 8)
    return (ci == 1 and co <= 24 and w % 32 == 0 and
            _pick_hc(h, w, ci_p, co_p, 1, jnp.dtype(dtype).itemsize,
                     False) is not None)


def _kl_to_x_shape(xk_shape):
    """Kernel-layout [N, D, C, H, W] -> the NDHWC shape the eligibility
    helpers reason about."""
    n, d, c, h, w = xk_shape
    return (n, d, h, w, c)


def head_eligible_kl(xk_shape, ci, co, dtype=jnp.float32):
    return head_eligible(_kl_to_x_shape(xk_shape), ci, co, dtype)


def stem_eligible_kl(xk_shape, ci, co, dtype=jnp.float32):
    return stem_eligible(_kl_to_x_shape(xk_shape), ci, co, dtype)


# ----------------------------------------------------------------------
# the unified kernel
# ----------------------------------------------------------------------
def _conv5_kernel(xt_ref, lhs_ref, b_ref, *rest,
                  kd_n, ci_p, co_p, hc, w, lc, fold_kw, fuse_ep=False):
    """One (n, d, h-chunk) program.

    xt_ref: HBM [N, D', Ci', M + (H+4)*W + M]  (D' = D+4 for the head,
        D for the stem whose kd/kw taps live in the channels)
    lhs_ref: VMEM [(25 if fold_kw else 5)*Co', KD*Ci']
    b_ref: VMEM [Co', 1]
    out_ref: VMEM block [1, 1, Co', hc*W]
    slab: VMEM scratch [2, KD, Ci', lc], double-buffered across grid
        steps (scratch persists between programs): program p waits on
        the slab its predecessor prefetched into slot p%2 and starts
        the DMA for p+1 into the other slot before computing. Slab
        column c holds flattened spatial position (hi*hc*W + c -
        MARGIN) of the (H+4)-padded volume, so output voxel q sits at
        column q + MARGIN.
    fuse_ep: inference-mode epilogue — ep_ref (VMEM [3*Co', 1] f32)
        holds the folded BatchNorm affine (inv = scale*rsqrt(var+eps)
        rows [0, Co'), shift = bias_bn - mean*inv rows [Co', 2Co')) and
        the PReLU alpha (rows [2Co', 3Co'); alpha=1 when only BN is
        fused). Applying them here, while the f32 result block is
        still in VMEM, removes the separate BN + PReLU elementwise
        HBM round trips between consecutive convs.
    """
    if fuse_ep:
        ep_ref, out_ref, slab, sem = rest
    else:
        out_ref, slab, sem = rest
    n = pl.program_id(0)
    d = pl.program_id(1)
    hi = pl.program_id(2)
    d_n = pl.num_programs(1)
    hi_n = pl.num_programs(2)
    pid = (n * d_n + d) * hi_n + hi
    slot = jax.lax.rem(pid, 2)

    def dma(p, s):
        n_ = p // (d_n * hi_n)
        d_ = jax.lax.rem(p // hi_n, d_n)
        hi_ = jax.lax.rem(p, hi_n)
        return pltpu.make_async_copy(
            xt_ref.at[n_, pl.ds(d_, kd_n), :, pl.ds(hi_ * hc * w, lc)],
            slab.at[s], sem.at[s])

    @pl.when(pid == 0)
    def _():
        dma(pid, slot).start()

    @pl.when(pid + 1 < pl.num_programs(0) * d_n * hi_n)
    def _():
        dma(pid + 1, 1 - slot).start()

    dma(pid, slot).wait()

    rhs = slab[slot].reshape(kd_n * ci_p, lc)
    cc = _co_chunk(co_p, fold_kw)
    m_rows = (K * K if fold_kw else K) * cc
    qw = (jax.lax.broadcasted_iota(jnp.int32, (cc, hc * w), 1) % w
          if fold_kw else None)

    # wide heads fold 8 output channels per matmul so the f32
    # accumulator stays small; lhs rows are chunk-major (c, kh, kw, cc)
    for c in range(co_p // cc):
        # the RHS is the slab itself: rows (kd, ci), columns voxels
        acc = jax.lax.dot_general(
            lhs_ref[c * m_rows:(c + 1) * m_rows, :], rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [(kh[,kw],cc), lc]

        # fold tap partials: output voxel q (row qh, col qw of the
        # chunk) takes tap (kh, kw) from acc row-block (kh, kw) at
        # column q + MARGIN + kh*W + (kw - 2); the slice crosses an
        # image-row boundary exactly where the SAME mask zeroes the
        # tap. All slices are on the f32 accumulator (32-bit lane
        # rotates are supported; bf16 ones are not).
        res = jnp.zeros((cc, hc * w), jnp.float32)
        if fold_kw:
            for kh in range(K):
                for kw in range(K):
                    m0 = (kh * K + kw) * cc
                    off = kh * w + kw + MARGIN - P
                    sl = acc[m0:m0 + cc, off:off + hc * w]
                    if kw != P:
                        mask = jnp.logical_and(qw >= P - kw,
                                               qw < w + P - kw)
                        sl = jnp.where(mask, sl, 0.0)
                    res = res + sl
        else:
            for kh in range(K):
                off = kh * w + MARGIN
                res = res + acc[kh * cc:(kh + 1) * cc,
                                off:off + hc * w]
        res = res + b_ref[c * cc:(c + 1) * cc].astype(jnp.float32)
        if fuse_ep:
            inv = ep_ref[c * cc:(c + 1) * cc]
            shift = ep_ref[co_p + c * cc:co_p + (c + 1) * cc]
            alpha = ep_ref[2 * co_p + c * cc:2 * co_p + (c + 1) * cc]
            res = res * inv + shift
            res = jnp.where(res >= 0, res, res * alpha)
        out_ref[0, 0, c * cc:(c + 1) * cc, :] = res.astype(
            out_ref.dtype)


def _run_conv5(xt, lhs, bias, *, n, d_out, h, w, kd_n, ci_p, co_p,
               dtype, fold_kw, interpret, ep=None):
    hc = _pick_hc(h, w, ci_p, co_p, kd_n, jnp.dtype(dtype).itemsize,
                  fold_kw, align=not interpret)
    lc = (hc + 4) * w + 2 * MARGIN
    grid = (n, d_out, h // hc)
    kernel = functools.partial(
        _conv5_kernel, kd_n=kd_n, ci_p=ci_p, co_p=co_p, hc=hc, w=w,
        lc=lc, fold_kw=fold_kw, fuse_ep=ep is not None)
    m = (K * K if fold_kw else K) * co_p
    flops = 2 * m * (kd_n * ci_p) * lc * n * d_out * (h // hc)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # xt stays in HBM
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [xt, lhs, bias]
    if ep is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(ep)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, co_p, hc * w),
            lambda ni, di, hi: (ni, di, 0, hi),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d_out, co_p, h * w), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, kd_n, ci_p, lc), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xt.size * xt.dtype.itemsize * kd_n,
            transcendentals=0),
        interpret=interpret,
    )(*args)


def _finish(out, n, d, h, w, co):
    # [N, D, Co', H*W] -> NDHWC
    out = out.reshape(n, d, -1, h, w)
    return jnp.transpose(out, (0, 1, 3, 4, 2))[..., :co]


def _pad_flat(xt):
    return jnp.pad(xt, ((0, 0),) * (xt.ndim - 1) + ((MARGIN, MARGIN),))


# ----------------------------------------------------------------------
# kernel layout ("kl"): [N, D, C, H, W] — the layout the kernels natively
# read and write (channels on sublanes, W on lanes). Chaining convs /
# BN / activations in this layout avoids the NDHWC<->kernel layout copy
# XLA inserts around every custom call (~2.2 ms per 128^3 b2 tensor,
# ~108 ms/step of copies+pads in the round-3 train profile).
# ----------------------------------------------------------------------
def to_kl(x):
    """NDHWC -> kernel layout [N, D, C, H, W] (one transpose)."""
    return jnp.transpose(x, (0, 1, 4, 2, 3))


def from_kl(xk):
    """Kernel layout [N, D, C, H, W] -> NDHWC (one transpose)."""
    return jnp.transpose(xk, (0, 1, 3, 4, 2))


# ----------------------------------------------------------------------
# head: general C_in, small C_out
# ----------------------------------------------------------------------
def _pack_ep(ep, co, co_p):
    """(inv, shift, alpha) [Co] f32 -> the kernel's [3*Co', 1] layout.
    Padded channels get inv=0/shift=0/alpha=1 (they are sliced away)."""
    inv, shift, alpha = (jnp.asarray(v, jnp.float32) for v in ep)
    pad = co_p - co
    return jnp.concatenate([
        jnp.pad(inv, (0, pad)), jnp.pad(shift, (0, pad)),
        jnp.pad(alpha, (0, pad), constant_values=1.0)]).reshape(
            3 * co_p, 1)


def ep_apply_kl(yk, ep):
    """Reference epilogue on a kernel-layout tensor (the XLA fallback
    for ineligible shapes; numerics match the in-kernel f32 epilogue).
    ``ep`` = (inv, shift, alpha), each [C] f32."""
    inv, shift, alpha = (jnp.asarray(v, jnp.float32).reshape(
        1, 1, -1, 1, 1) for v in ep)
    f = yk.astype(jnp.float32) * inv + shift
    f = jnp.where(f >= 0, f, f * alpha)
    return f.astype(yk.dtype)


def _conv5_head_kl(xk, w, b, *, interpret=False, ep=None):
    """Head conv in kernel layout: [N, D, Ci, H, W] -> [N, D, Co, H, W].

    No transposes — the halo/margin pads and the flat reshape are the
    only XLA glue, so consecutive convs (and the BN/PReLU between them)
    chain without layout copies. ``ep`` (inference only) fuses the
    BN affine + PReLU into the kernel's output path."""
    n, d, ci, h, ww = xk.shape
    co = w.shape[-1]
    dt = xk.dtype
    ci_p = _round_up(ci, _sublane(dt))
    co_p = _round_up(co, 8)

    # [N, D, Ci, H, W] -> [N, D+4, Ci', M + (H+4)*W + M]
    xt = jnp.pad(xk, ((0, 0), (P, P), (0, ci_p - ci), (P, P), (0, 0)))
    xt = _pad_flat(xt.reshape(n, d + 2 * P, ci_p, (h + 2 * P) * ww))

    # weights: [5,5,5,Ci,Co] -> rows (chunk, kh, kw, cc), cols (kd, ci)
    wt = jnp.transpose(w, (1, 2, 4, 0, 3))  # [kh, kw, co, kd, ci]
    wt = jnp.pad(wt, ((0, 0), (0, 0), (0, co_p - co), (0, 0),
                      (0, ci_p - ci)))
    cc = _co_chunk(co_p, True)
    wt = wt.reshape(K, K, co_p // cc, cc, K, ci_p)
    wt = jnp.transpose(wt, (2, 0, 1, 3, 4, 5))
    lhs = wt.reshape(K * K * co_p, K * ci_p).astype(dt)
    bias = jnp.pad(b, (0, co_p - co)).astype(jnp.float32).reshape(co_p, 1)

    out = _run_conv5(xt, lhs, bias, n=n, d_out=d, h=h, w=ww, kd_n=K,
                     ci_p=ci_p, co_p=co_p, dtype=dt, fold_kw=True,
                     interpret=interpret,
                     ep=None if ep is None else _pack_ep(ep, co, co_p))
    return out.reshape(n, d, co_p, h, ww)[:, :, :co]


def _conv5_head_pallas(x, w, b, *, interpret=False):
    return from_kl(_conv5_head_kl(to_kl(x), w, b, interpret=interpret))


# ----------------------------------------------------------------------
# stem: C_in = 1 — kd AND kw taps folded into pre-shifted channels
# ----------------------------------------------------------------------
def _conv5_stem_kl(xk, w, b, *, interpret=False, ep=None):
    """Stem conv: [N, D, 1, H, W] -> [N, D, Co, H, W]. The input layout
    is immaterial (the 25 shifted copies are built from the squeezed
    volume either way), so this is also the NDHWC path's workhorse."""
    n, d, ci, h, ww = xk.shape
    assert ci == 1
    co = w.shape[-1]
    dt = xk.dtype
    ci_p = _round_up(K * K, _sublane(dt))
    co_p = _round_up(co, 8)

    # channel (kd*5 + kw) of xt holds x shifted by (kd-2, kw-2) along
    # (D, W), zero-padded SAME: the kernel contracts channels exactly
    # like the head contracts (kd, ci) and needs no fold-time masks.
    xp = jnp.pad(xk[:, :, 0], ((0, 0), (P, P), (P, P), (P, P)))
    chans = [xp[:, kd:kd + d, :, kw:kw + ww]
             for kd in range(K) for kw in range(K)]
    chans += [jnp.zeros_like(chans[0])] * (ci_p - K * K)
    xt = jnp.stack(chans, axis=2)  # [N, D, Ci', H+4, W]
    xt = _pad_flat(xt.reshape(n, d, ci_p, (h + 2 * P) * ww))

    # weights: [5,5,5,1,Co] -> rows (kh, co), cols (kd*5 + kw)
    wt = jnp.transpose(w[..., 0, :], (1, 3, 0, 2))  # [kh, co, kd, kw]
    wt = wt.reshape(K, co, K * K)
    wt = jnp.pad(wt, ((0, 0), (0, co_p - co), (0, ci_p - K * K)))
    lhs = wt.reshape(K * co_p, ci_p).astype(dt)
    bias = jnp.pad(b, (0, co_p - co)).astype(jnp.float32).reshape(co_p, 1)

    out = _run_conv5(xt, lhs, bias, n=n, d_out=d, h=h, w=ww, kd_n=1,
                     ci_p=ci_p, co_p=co_p, dtype=dt, fold_kw=False,
                     interpret=interpret,
                     ep=None if ep is None else _pack_ep(ep, co, co_p))
    return out.reshape(n, d, co_p, h, ww)[:, :, :co]


def _conv5_stem_pallas(x, w, b, *, interpret=False):
    return from_kl(_conv5_stem_kl(to_kl(x), w, b, interpret=interpret))


# ----------------------------------------------------------------------
# weight-gradient kernel
# ----------------------------------------------------------------------
def _wgrad_kernel(xt_ref, ge_ref, out_ref, slab, gbuf, sems,
                  *, kd_n, ci_p, mg, grp, hc, w, lc):
    """Accumulates dw[(x-tap, ci), (g-tap, co)] over all voxels.

    xt_ref: the forward's input layout [N, D', Ci', M + (H+4)*W + M]
    ge_ref: HBM [N, D, Mg, M + (H+4)*W + M] — the incoming gradient
        pre-shifted per g-tap host-side ((kh, kw, co) rows for the head,
        (kh, co) for the stem), on the same padded flat grid as x.
    out_ref: VMEM [KD*Ci', Mg] f32, revisited by every program (constant
        index map) and accumulated in place.
    grp: rows per kh group in ge (K*co for the head, co for the stem).

    Each program owns output rows [hi*hc, hi*hc + hc); a tap-kh row of
    ge inside this window can belong to a neighbouring chunk, so the
    per-kh lane mask keeps only g rows rw - kh in [0, hc) (rw = local
    padded row of the lane).
    """
    n = pl.program_id(0)
    d = pl.program_id(1)
    hi = pl.program_id(2)

    cx = pltpu.make_async_copy(
        xt_ref.at[n, pl.ds(d, kd_n), :, pl.ds(hi * hc * w, lc)],
        slab, sems.at[0])
    cg = pltpu.make_async_copy(
        ge_ref.at[n, d, :, pl.ds(hi * hc * w, lc)], gbuf, sems.at[1])
    cx.start()
    cg.start()
    cx.wait()
    cg.wait()

    # local padded row of each lane (front margin lanes -> rw = -1)
    rw = (jax.lax.broadcasted_iota(jnp.int32, (mg, lc), 1) - MARGIN) // w
    kh_of_row = (jax.lax.broadcasted_iota(jnp.int32, (mg, lc), 0)
                 // grp)
    mask = jnp.logical_and(rw >= kh_of_row, rw < kh_of_row + hc)
    gm = jnp.where(mask, gbuf[:], 0).astype(gbuf.dtype)

    partial = jax.lax.dot_general(
        slab[:].reshape(kd_n * ci_p, lc), gm,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [KD*Ci', Mg]

    first = jnp.logical_and(
        jnp.logical_and(n == 0, d == 0), hi == 0)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] + partial


def _pick_hc_wgrad(h, w, ci_p, mg, kd_n, itemsize,
                   budget=11 * 1024 * 1024, align=True, mid=False,
                   ck=False):
    for hc in (64, 32, 16, 8, 4, 2, 1):
        if h % hc or (align and (hc * w) % 128):
            continue
        lc = (hc + 4) * w + 2 * MARGIN
        slab = kd_n * ci_p * lc * itemsize
        gbuf = mg * max(lc, hc * w) * itemsize
        if ck:
            # compact-g: one small g slab DMA + the f32 expansion
            # pieces + the converted gm (no host-side ge)
            gbuf = (mg // (K * K) * (lc + 4 * w + 2 * MARGIN) *
                    (itemsize + 4) + mg * lc * (4 + itemsize))
        a_all = (K * kd_n * ci_p * hc * w * itemsize) if mid else 0
        out = (K if mid else 1) * kd_n * ci_p * mg * 4
        if slab + gbuf + a_all + out + mg * lc * itemsize <= budget:
            return hc
    return None


def _wgrad_kernel_ck(xt_ref, gf_ref, out_ref, slab, gslab, sems,
                     *, kd_n, ci_p, co_g, hc, w, lc, fold_kw):
    """Std (head/stem) wgrad with IN-KERNEL g expansion.

    gf_ref holds the COMPACT g on a (H+8)-row flat grid with 2-tile
    lane margins: [N, D, co_g, 256 + (H+8)*W + 256] (rows [4, 4+H) are
    g, zeros around). The (kh[, kw])-shifted row blocks the host built
    via :func:`_expand_g_head` / :func:`_expand_g_stem` (692 MB at
    128^3 b2 for the 3-class head — a 10.9 ms concatenate per step)
    are shifted lane-slices of this one slab: piece (kh, kw) column q
    reads gslab at q + (4-kh)*W + (P-kw) + 128, masked to the rows
    this program owns (kh <= rw < kh+hc, the same ownership mask the
    host-expanded kernel applies) and to in-row kw sources. Pieces are
    f32 (unaligned lane slices are 32-bit-only on TPU) at a co_g=8k
    row granularity, concatenated aligned, then converted once for the
    MXU.
    """
    n = pl.program_id(0)
    d = pl.program_id(1)
    hi = pl.program_id(2)

    cx = pltpu.make_async_copy(
        xt_ref.at[n, pl.ds(d, kd_n), :, pl.ds(hi * hc * w, lc)],
        slab, sems.at[0])
    cg = pltpu.make_async_copy(
        gf_ref.at[n, d, :, pl.ds(hi * hc * w,
                                 lc + 4 * w + 2 * MARGIN)],
        gslab, sems.at[1])
    cx.start()
    cg.start()
    cx.wait()
    cg.wait()

    g32 = gslab[:].astype(jnp.float32)
    qq = jax.lax.broadcasted_iota(jnp.int32, (co_g, lc), 1) - MARGIN
    rw = qq // w   # local padded row of each lane (front margin -> -1)
    cw = qq % w    # column within the image row
    pieces = []
    kws = range(K) if fold_kw else (P,)
    for kh in range(K):
        own = jnp.logical_and(rw >= kh, rw < kh + hc)
        for kw in kws:
            off = (4 - kh) * w + (P - kw) + MARGIN
            sl = g32[:, off:off + lc]
            m = own
            if kw != P:
                m = jnp.logical_and(m, jnp.logical_and(
                    cw + (P - kw) >= 0, cw + (P - kw) < w))
            pieces.append(jnp.where(m, sl, 0.0))
    gm = jnp.concatenate(pieces, axis=0).astype(
        slab.dtype)  # [(kh[, kw], co_g), lc]

    partial = jax.lax.dot_general(
        slab[:].reshape(kd_n * ci_p, lc), gm,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [KD*Ci', Mg]

    first = jnp.logical_and(
        jnp.logical_and(n == 0, d == 0), hi == 0)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] + partial


def _expand_g_head(gk, co, mg, dt):
    """ge rows (kh, kw, co): g (kernel layout [N, D, co, H, W]) shifted
    by (+kh rows, +(kw-2) cols) on the (H+4)-padded flat grid, zeros
    outside — the kw SAME mask is realized by the zero padding.

    Built as a concat of 4-D [N, D, co, flat] pieces: every
    intermediate keeps the (wide) W/flat extent minor. A 6-D stack with
    co at an interior axis looks equivalent but XLA's layout assignment
    can put the tiny co dim on lanes — measured as a 10.7x-padded
    15.1 GB allocation at the spine geometry (and 42x for co=3)."""
    n, d, _, h, w = gk.shape
    gp = jnp.pad(gk, ((0, 0), (0, 0), (0, 0), (0, 0), (P, P)))
    flat = (h + 2 * P) * w
    pieces = []
    for kh in range(K):
        for kw in range(K):
            c = gp[:, :, :, :, 2 * P - kw:2 * P - kw + w]
            c = jnp.pad(c, ((0, 0), (0, 0), (0, 0), (kh, 2 * P - kh),
                            (0, 0)))
            pieces.append(c.reshape(n, d, co, flat))
    if mg > K * K * co:
        pieces.append(jnp.zeros((n, d, mg - K * K * co, flat),
                                gk.dtype))
    return _pad_flat(jnp.concatenate(pieces, axis=2)).astype(dt)


def _expand_g_stem(gk, co, mg, dt):
    """ge rows (kh, co): kw lives in the x channels for the stem.
    gk is kernel layout [N, D, co, H, W]. Same 4-D-pieces structure as
    :func:`_expand_g_head` (layout-trap avoidance)."""
    n, d, _, h, w = gk.shape
    flat = (h + 2 * P) * w
    pieces = [jnp.pad(gk, ((0, 0), (0, 0), (0, 0), (kh, 2 * P - kh),
                           (0, 0))).reshape(n, d, co, flat)
              for kh in range(K)]
    if mg > K * co:
        pieces.append(jnp.zeros((n, d, mg - K * co, flat), gk.dtype))
    return _pad_flat(jnp.concatenate(pieces, axis=2)).astype(dt)


def _wgrad_mid_kernel(xt_ref, ge_ref, out_ref, slab, gbuf, sems,
                      *, kd_n, ci_p, mg, hc, w, lc):
    """Square-conv weight gradient (e.g. the decoder's 32->32 conv,
    whose XLA wgrad ran 102 ms/step on the VPU).

    ge_ref: HBM [N, D, (kw, co), H*W] — g pre-shifted by (kw-2) along W
        host-side (5x expansion instead of the head path's 25x, which
        would not fit HBM for co=32). kh taps come from ALIGNED lane
        slices of the x slab at offsets MARGIN + kh*W, so no in-kernel
        masks or rotates are needed; each program's window sums exactly
        its own g rows. For W < 128, rows are padded host-side to a
        128-lane stride: the padded ge columns are zero, so they add
        nothing to dw and the slab's kh offsets stay aligned.
    out_ref: VMEM [5(kh), KD*Ci', (kw, co)] f32, accumulated in place.
    """
    n = pl.program_id(0)
    d = pl.program_id(1)
    hi = pl.program_id(2)

    cx = pltpu.make_async_copy(
        xt_ref.at[n, pl.ds(d, kd_n), :, pl.ds(hi * hc * w, lc)],
        slab, sems.at[0])
    cg = pltpu.make_async_copy(
        ge_ref.at[n, d, :, pl.ds(hi * hc * w, hc * w)], gbuf,
        sems.at[1])
    cx.start()
    cg.start()
    cx.wait()
    cg.wait()

    first = jnp.logical_and(
        jnp.logical_and(n == 0, d == 0), hi == 0)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # one matmul for all 5 kh taps: stacking the aligned slab slices
    # into [(kh, kd, ci), hc*W] costs a VMEM copy but drops the MXU
    # pass count from 5*ceil(Kx/128)*ceil(Mg/128) to
    # ceil(5*Kx/128)*ceil(Mg/128) (20 -> 14 for the 32->32 conv)
    a_all = jnp.concatenate(
        [slab[:, :, MARGIN + kh * w:MARGIN + kh * w + hc * w]
         .reshape(kd_n * ci_p, hc * w) for kh in range(K)], axis=0)
    partial = jax.lax.dot_general(
        a_all, gbuf[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [(kh, kd, ci), Mg]
    out_ref[:] = out_ref[:] + partial.reshape(K, kd_n * ci_p, mg)


def _wgrad_mid_kernel_ck(xt_ref, gf_ref, out_ref, slab, gslab, sems,
                         *, kd_n, ci_p, co, hc, w, ww, lc):
    """Mid wgrad with IN-KERNEL g expansion.

    gf_ref holds the COMPACT kernel-layout g
    [N, D, co, M + H*W + M] — the 5 kw-shifted row blocks that
    :func:`_expand_g_kw` materialized in HBM (1.34 GB for the 32->32
    conv at 128^3 b2; the single largest materialization of the cube
    train step) are built here in VMEM from one compact slab instead.
    The kw shifts are unaligned lane slices, taken on an f32 copy of
    the slab (bf16 lane shifts are unsupported on TPU — same
    f32-slicing design as the forward kernel's tap fold), with the
    SAME-edge zero mask applied per kw; row-pad columns (W < 128
    geometries) are zero in gf already, so they add nothing to dw.
    Numerics are identical to the host-expanded path: the same values
    enter the same matmul.
    """
    n = pl.program_id(0)
    d = pl.program_id(1)
    hi = pl.program_id(2)

    cx = pltpu.make_async_copy(
        xt_ref.at[n, pl.ds(d, kd_n), :, pl.ds(hi * hc * w, lc)],
        slab, sems.at[0])
    cg = pltpu.make_async_copy(
        gf_ref.at[n, d, :, pl.ds(hi * hc * w, hc * w + 2 * MARGIN)],
        gslab, sems.at[1])
    cx.start()
    cg.start()
    cx.wait()
    cg.wait()

    g32 = gslab[:].astype(jnp.float32)
    qw = jax.lax.broadcasted_iota(jnp.int32, (co, hc * w), 1) % w
    pieces = []
    for kw in range(K):
        # ge row block kw at column q equals g[q + P - kw] of the same
        # row, zero where the source column leaves [0, ww)
        off = MARGIN + P - kw
        sl = g32[:, off:off + hc * w]
        if kw != P:
            mask = jnp.logical_and(qw + (P - kw) >= 0,
                                   qw + (P - kw) < ww)
            sl = jnp.where(mask, sl, 0.0)
        pieces.append(sl.astype(slab.dtype))
    gm = jnp.concatenate(pieces, axis=0)  # [(kw, co), hc*W]

    first = jnp.logical_and(
        jnp.logical_and(n == 0, d == 0), hi == 0)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a_all = jnp.concatenate(
        [slab[:, :, MARGIN + kh * w:MARGIN + kh * w + hc * w]
         .reshape(kd_n * ci_p, hc * w) for kh in range(K)], axis=0)
    partial = jax.lax.dot_general(
        a_all, gm,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [(kh, kd, ci), (kw, co)]
    out_ref[:] = out_ref[:] + partial.reshape(K, kd_n * ci_p, K * co)


def _expand_g_kw(gk, co, ws, dt):
    """[N, D, (kw, co), H*ws]: g (kernel layout [N, D, co, H, W])
    shifted by (kw-2) along W, zeros at the W edges (the SAME mask),
    each image row padded to the ws lane stride. Built as a concat of
    4-D [N, D, co, H*ws] pieces — see :func:`_expand_g_head` for the
    6-D-stack layout trap this avoids."""
    n, d, _, h, w = gk.shape
    gp = jnp.pad(gk, ((0, 0), (0, 0), (0, 0), (0, 0), (P, P)))
    pieces = []
    for kw in range(K):
        c = gp[:, :, :, :, 2 * P - kw:2 * P - kw + w]
        c = jnp.pad(c, ((0, 0),) * 4 + ((0, ws - w),))
        pieces.append(c.reshape(n, d, co, h * ws))
    return jnp.concatenate(pieces, axis=2).astype(dt)


def _wgrad_mid_ok(x_shape, ci, co, dtype):
    d, h, w = x_shape[1:4]
    ws = max(w, 128)
    ci_p = _round_up(ci, _sublane(dtype))
    return (ci <= 64 and co <= 64 and w % 32 == 0 and ws % w == 0 and
            _pick_hc_wgrad(h, ws, ci_p, _round_up(K * co, 8), K,
                           jnp.dtype(dtype).itemsize, mid=True)
            is not None)


def _conv5_wgrad_mid_kl(xk, gk, *, interpret=False):
    """Mid wgrad in kernel layout: xk [N,D,Ci,H,W], gk [N,D,Co,H,W]."""
    n, d, ci, h, ww = xk.shape
    co = gk.shape[2]
    dt = xk.dtype
    ci_p = _round_up(ci, _sublane(dt))
    # mg rows must be a sublane-tile multiple or Mosaic rejects the ge
    # DMA ("Slice shape along dimension 2 must be aligned to tiling
    # (8)") — K*co is only aligned by luck for co in {16, 32, 64}; the
    # 20-class spine head (K*co = 100) needs the explicit pad.
    mg = _round_up(K * co, 8)
    ws = max(ww, 128) if not interpret else ww  # pad rows to lane stride

    xt = jnp.pad(xk, ((0, 0), (P, P), (0, ci_p - ci), (P, P),
                      (0, ws - ww)))
    xt = _pad_flat(xt.reshape(n, d + 2 * P, ci_p, (h + 2 * P) * ws))

    hc = _pick_hc_wgrad(h, ws, ci_p, mg, K, jnp.dtype(dt).itemsize,
                        align=not interpret, mid=True)
    lc = (hc + 4) * ws + 2 * MARGIN
    # compact-g path: the kernel builds the kw-shifted ge rows in VMEM
    # (no 5x HBM expansion). Needs the tap row stride co to be a
    # sublane-tile multiple so the concatenated row blocks stay
    # aligned — true for every NConv-stack conv (co in {16, 32, 64});
    # odd heads (e.g. the 20-class spine head) keep the host expansion.
    compact = (mg == K * co and co % _sublane(dt) == 0)
    if compact:
        gf = _pad_flat(jnp.pad(
            gk, ((0, 0),) * 4 + ((0, ws - ww),)).reshape(
                n, d, co, h * ws)).astype(dt)
        kernel = functools.partial(
            _wgrad_mid_kernel_ck, kd_n=K, ci_p=ci_p, co=co, hc=hc,
            w=ws, ww=ww, lc=lc)
        gspec = pltpu.VMEM((co, hc * ws + 2 * MARGIN), dt)
        g_arg = gf
    else:
        ge = _expand_g_kw(gk, co, ws, dt)
        if mg > K * co:
            ge = jnp.pad(ge, ((0, 0), (0, 0), (0, mg - K * co),
                              (0, 0)))
        kernel = functools.partial(
            _wgrad_mid_kernel, kd_n=K, ci_p=ci_p, mg=mg, hc=hc, w=ws,
            lc=lc)
        gspec = pltpu.VMEM((mg, hc * ws), dt)
        g_arg = ge
    out = pl.pallas_call(
        kernel,
        grid=(n, d, h // hc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (K, K * ci_p, mg), lambda ni, di, hi: (0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, K * ci_p, mg), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K, ci_p, lc), dt),
            gspec,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * K * ci_p * K * mg * hc * ws * n * d * (h // hc),
            bytes_accessed=(xt.size + g_arg.size) *
            jnp.dtype(dt).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xt, g_arg)

    # [kh, kd, ci_p, (kw, co)] -> [kd, kh, kw, ci, co]
    dw = out[:, :, :K * co].reshape(K, K, ci_p, K, co)[:, :, :ci]
    return jnp.transpose(dw, (1, 0, 3, 2, 4))


def _conv5_wgrad_mid_pallas(x, g, *, interpret=False):
    return _conv5_wgrad_mid_kl(to_kl(x), to_kl(g), interpret=interpret)


def _conv5_wgrad_kl(xk, gk, kind, *, interpret=False):
    """Std wgrad in kernel layout: xk [N,D,Ci,H,W], gk [N,D,Co,H,W].

    The g expansion happens IN-KERNEL (:func:`_wgrad_kernel_ck`) from
    a compact (H+8)-grid g tensor — the host-side 5x/25x shifted-copy
    materializations are gone. Rows per tap are co_g = round_up(co, 8)
    (f32 piece granularity); for the narrow heads this widens the
    matmul's Mg (80 -> 200 for co=3) but removes a 692 MB HBM
    round-trip per step at 128^3 b2.
    """
    n, d, ci, h, ww = xk.shape
    co = gk.shape[2]
    dt = xk.dtype
    co_g = _round_up(co, 8)
    if kind == "stem":
        ci_p = _round_up(K * K, _sublane(dt))
        kd_n, fold_kw = 1, False
        mg = K * co_g
        xp = jnp.pad(xk[:, :, 0], ((0, 0), (P, P), (P, P), (P, P)))
        chans = [xp[:, kd:kd + d, :, kw:kw + ww]
                 for kd in range(K) for kw in range(K)]
        chans += [jnp.zeros_like(chans[0])] * (ci_p - K * K)
        xt = _pad_flat(jnp.stack(chans, axis=2).reshape(
            n, d, ci_p, (h + 2 * P) * ww))
    else:
        ci_p = _round_up(ci, _sublane(dt))
        kd_n, fold_kw = K, True
        mg = K * K * co_g
        xt = jnp.pad(xk, ((0, 0), (P, P), (0, ci_p - ci), (P, P),
                          (0, 0)))
        xt = _pad_flat(xt.reshape(n, d + 2 * P, ci_p,
                                  (h + 2 * P) * ww))
    # compact g: rows [4, 4+H) of an (H+8)-row flat grid, 2-tile lane
    # margins so every shifted in-kernel read stays in bounds
    gf = jnp.pad(gk, ((0, 0), (0, 0), (0, co_g - co), (2 * P, 2 * P),
                      (0, 0))).reshape(n, d, co_g, (h + 4 * P) * ww)
    gf = jnp.pad(gf, ((0, 0),) * 3 + ((2 * MARGIN, 2 * MARGIN),)
                 ).astype(dt)

    hc = _pick_hc_wgrad(h, ww, ci_p, mg, kd_n,
                        jnp.dtype(dt).itemsize, align=not interpret,
                        ck=True)
    if hc is None:
        return _conv5_wgrad_kl_hostexp(xk, gk, kind,
                                       interpret=interpret)
    lc = (hc + 4) * ww + 2 * MARGIN
    kernel = functools.partial(
        _wgrad_kernel_ck, kd_n=kd_n, ci_p=ci_p, co_g=co_g, hc=hc,
        w=ww, lc=lc, fold_kw=fold_kw)
    out = pl.pallas_call(
        kernel,
        grid=(n, d, h // hc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (kd_n * ci_p, mg), lambda ni, di, hi: (0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kd_n * ci_p, mg), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kd_n, ci_p, lc), dt),
            pltpu.VMEM((co_g, lc + 4 * ww + 2 * MARGIN), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * kd_n * ci_p * mg * lc * n * d * (h // hc),
            bytes_accessed=(xt.size + gf.size) * jnp.dtype(dt).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xt, gf)

    if kind == "stem":
        # rows (kd, kw), cols (kh, co_g) -> [kd, kh, kw, 1, co]
        dw = out[:K * K].reshape(K, K, K, co_g)[..., :co]
        dw = jnp.transpose(dw, (0, 2, 1, 3))[:, :, :, None, :]
    else:
        # rows (kd, ci), cols (kh, kw, co_g) -> [kd, kh, kw, ci, co]
        dw = out.reshape(K, ci_p, K, K, co_g)[:, :ci, :, :, :co]
        dw = jnp.transpose(dw, (0, 2, 3, 1, 4))
    return dw


def _conv5_wgrad_kl_hostexp(xk, gk, kind, *, interpret=False):
    """Fallback std wgrad with the host-side g expansion (used when
    the compact kernel's VMEM budget doesn't fit a geometry)."""
    n, d, ci, h, ww = xk.shape
    co = gk.shape[2]
    dt = xk.dtype
    if kind == "stem":
        ci_p = _round_up(K * K, _sublane(dt))
        kd_n, grp = 1, co
        mg = _round_up(K * co, _sublane(dt))
        xp = jnp.pad(xk[:, :, 0], ((0, 0), (P, P), (P, P), (P, P)))
        chans = [xp[:, kd:kd + d, :, kw:kw + ww]
                 for kd in range(K) for kw in range(K)]
        chans += [jnp.zeros_like(chans[0])] * (ci_p - K * K)
        xt = _pad_flat(jnp.stack(chans, axis=2).reshape(
            n, d, ci_p, (h + 2 * P) * ww))
        ge = _expand_g_stem(gk, co, mg, dt)
    else:
        ci_p = _round_up(ci, _sublane(dt))
        kd_n, grp = K, K * co
        mg = _round_up(K * K * co, _sublane(dt))
        xt = jnp.pad(xk, ((0, 0), (P, P), (0, ci_p - ci), (P, P),
                          (0, 0)))
        xt = _pad_flat(xt.reshape(n, d + 2 * P, ci_p,
                                  (h + 2 * P) * ww))
        ge = _expand_g_head(gk, co, mg, dt)

    hc = _pick_hc_wgrad(h, ww, ci_p, mg, kd_n,
                        jnp.dtype(dt).itemsize, align=not interpret)
    lc = (hc + 4) * ww + 2 * MARGIN
    kernel = functools.partial(
        _wgrad_kernel, kd_n=kd_n, ci_p=ci_p, mg=mg, grp=grp, hc=hc,
        w=ww, lc=lc)
    out = pl.pallas_call(
        kernel,
        grid=(n, d, h // hc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (kd_n * ci_p, mg), lambda ni, di, hi: (0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kd_n * ci_p, mg), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kd_n, ci_p, lc), dt),
            pltpu.VMEM((mg, lc), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * kd_n * ci_p * mg * lc * n * d * (h // hc),
            bytes_accessed=(xt.size + ge.size) * jnp.dtype(dt).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xt, ge)

    if kind == "stem":
        # rows (kd, kw), cols (kh, co) -> [kd, kh, kw, 1, co]
        dw = out[:K * K, :K * co].reshape(K, K, K, co)
        dw = jnp.transpose(dw, (0, 2, 1, 3))[:, :, :, None, :]
    else:
        # rows (kd, ci), cols (kh, kw, co) -> [kd, kh, kw, ci, co]
        dw = out[:, :K * K * co].reshape(K, ci_p, K, K, co)[:, :ci]
        dw = jnp.transpose(dw, (0, 2, 3, 1, 4))
    return dw


def _conv5_wgrad_pallas(x, g, kind, *, interpret=False):
    return _conv5_wgrad_kl(to_kl(x), to_kl(g), kind, interpret=interpret)


# ----------------------------------------------------------------------
# SPMD partitioning: shard the kernels over the batch ('data') axis and
# the volume H ('space') axis under pjit
# ----------------------------------------------------------------------
from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec  # noqa: E402


def _x_axes(arg_info):
    """(batch_axis, h_axis) mesh-axis names of an [N, D, H, W, C] (or
    [N, D, H, W] cotangent) operand's sharding; None = unsharded."""
    s = getattr(arg_info, "sharding", None)
    if not isinstance(s, NamedSharding):
        return None, None
    spec = tuple(s.spec) + (None,) * (5 - len(s.spec))
    return spec[0], spec[2]


def _halo_h(x, hax, size):
    """Exchange a P-row H halo with mesh neighbours along ``hax``.

    Each shard receives its predecessor's last P rows on top and its
    successor's first P rows below; edge shards receive ppermute's
    zero fill — exactly the SAME-conv zero padding of the global
    volume. Runs over ICI inside the partitioned computation."""
    top = jax.lax.ppermute(x[:, :, -P:], hax,
                           [(i, i + 1) for i in range(size - 1)])
    bot = jax.lax.ppermute(x[:, :, :P], hax,
                           [(i + 1, i) for i in range(size - 1)])
    return jnp.concatenate([top, x, bot], axis=2)


@functools.lru_cache(maxsize=None)
def _cp_batchmap(kind, interpret):
    """Mesh-partitioned kernel entry: without this, the SPMD
    partitioner treats the Pallas custom call as unshardable and
    REPLICATES it (all-gathering the global batch onto every device —
    verified on an 8-device mesh). The batch axis maps across shards
    directly; an H-sharded ('space') operand is handled with a P-row
    halo exchange before the local kernel, whose halo output rows are
    then sliced off — the manual version of the halo passes XLA inserts
    for its own convs. Weights stay replicated."""
    impl = {"head": _conv5_head_pallas,
            "stem": _conv5_stem_pallas}[kind]
    ok = {"head": head_eligible, "stem": stem_eligible}[kind]

    def call(x, w, b):
        return impl(x, w, b, interpret=interpret)

    fn = custom_partitioning(call)

    def infer(mesh, arg_infos, result_infos):
        batch, hax = _x_axes(arg_infos[0])
        return NamedSharding(mesh, PartitionSpec(batch, None, hax))

    def part(mesh, arg_infos, result_infos):
        batch, hax = _x_axes(arg_infos[0])
        repl = NamedSharding(mesh, PartitionSpec())
        if hax is not None and arg_infos[0].shape[2] % int(
                mesh.shape[hax]) != 0:
            hax = None  # uneven H shards pad — halo math would be
            # wrong; request H-replication (a gather) instead
        x_sh = NamedSharding(mesh, PartitionSpec(batch, None, hax))
        out_sh = NamedSharding(mesh, PartitionSpec(batch, None, hax))
        if hax is None:
            return mesh, call, out_sh, (x_sh, repl, repl)

        size = int(mesh.shape[hax])

        def lower(x, w, b):
            xe = _halo_h(x, hax, size)
            # the halo'd local shape may miss the kernel's h-chunk /
            # lane alignment — per-shard XLA conv keeps the spatial
            # sharding (and its numerics) either way
            if ok(xe.shape, xe.shape[-1], w.shape[-1], dtype=xe.dtype):
                y = call(xe, w, b)
            else:
                y = _conv5_xla(xe, w, b)
            return y[:, :, P:-P]

        return mesh, lower, out_sh, (x_sh, repl, repl)

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule="n d h w i, a b c i o, o -> n d h w o")
    return fn


@functools.lru_cache(maxsize=None)
def _cp_wgrad(which, kind, interpret):
    """Mesh-partitioned weight gradient: per-shard partial dw summed
    with a psum over the batch (and, when the H axis is sharded, space)
    mesh axes. H sharding uses the same halo exchange as the forward on
    x, with the cotangent zero-padded so halo output positions
    contribute nothing."""
    if which == "mid":
        def impl(x, g):
            return _conv5_wgrad_mid_pallas(x, g, interpret=interpret)
    else:
        def impl(x, g):
            return _conv5_wgrad_pallas(x, g, kind, interpret=interpret)

    fn = custom_partitioning(impl)

    def infer(mesh, arg_infos, result_infos):
        return NamedSharding(mesh, PartitionSpec())

    def part(mesh, arg_infos, result_infos):
        batch, hax = _x_axes(arg_infos[0])
        if hax is not None and arg_infos[0].shape[2] % int(
                mesh.shape[hax]) != 0:
            hax = None
        x_sh = NamedSharding(mesh, PartitionSpec(batch, None, hax))
        repl = NamedSharding(mesh, PartitionSpec())
        axes = tuple(a for a in (batch, hax) if a is not None)

        def lower(x, g):
            if hax is not None:
                size = int(mesh.shape[hax])
                x = _halo_h(x, hax, size)
                g = jnp.pad(g, ((0, 0), (0, 0), (P, P), (0, 0), (0, 0)))
            ci, co = x.shape[-1], g.shape[-1]
            wgrad_ok = (_head_ok(x.shape, ci, co, x.dtype, 16)
                        if kind == "head"
                        else stem_eligible(x.shape, ci, co, x.dtype))
            if which == "mid":
                wgrad_ok = _wgrad_mid_ok(x.shape, ci, co, x.dtype)
            if wgrad_ok:
                dw = impl(x, g)
            else:
                # dw of a conv is linear in w: build the vjp at zeros
                zw = jnp.zeros((K, K, K, ci, co), x.dtype)
                zb = jnp.zeros((co,), x.dtype)
                dw = jax.vjp(
                    lambda w_: _conv5_xla(x, w_, zb), zw)[1](g)[0]
            if axes:
                dw = jax.lax.psum(dw, axes)
            return dw

        return mesh, lower, repl, (x_sh, x_sh)

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule="n d h w i, n d h w o -> a b c i o")
    return fn


# ----------------------------------------------------------------------
# SPMD partitioning for the kernel-layout ops ([N, D, C, H, W]:
# batch at axis 0, the shardable spatial H axis at axis 3)
# ----------------------------------------------------------------------
def _xk_axes(arg_info):
    """(batch_axis, h_axis) mesh-axis names of a kernel-layout
    [N, D, C, H, W] operand's sharding; None = unsharded."""
    s = getattr(arg_info, "sharding", None)
    if not isinstance(s, NamedSharding):
        return None, None
    spec = tuple(s.spec) + (None,) * (5 - len(s.spec))
    return spec[0], spec[3]


def _halo_h_kl(x, hax, size):
    """P-row halo exchange along the kernel-layout H axis (axis 3)."""
    top = jax.lax.ppermute(x[:, :, :, -P:], hax,
                           [(i, i + 1) for i in range(size - 1)])
    bot = jax.lax.ppermute(x[:, :, :, :P], hax,
                           [(i + 1, i) for i in range(size - 1)])
    return jnp.concatenate([top, x, bot], axis=3)


def _conv5_xla_kl(xk, w, b):
    """XLA fallback in kernel layout (NCDHW-ish dimension numbers:
    channels at index 2)."""
    out = jax.lax.conv_general_dilated(
        xk, w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDCHW", "DHWIO", "NDCHW"))
    return out + b.astype(out.dtype).reshape(-1, 1, 1)


@functools.lru_cache(maxsize=None)
def _cp_batchmap_kl(kind, interpret):
    """Kernel-layout twin of :func:`_cp_batchmap`: batch maps across
    shards, an H-sharded (axis 3) operand gets the P-row halo
    exchange + slice; weights stay replicated."""
    impl = {"head": _conv5_head_kl, "stem": _conv5_stem_kl}[kind]
    ok = {"head": head_eligible_kl, "stem": stem_eligible_kl}[kind]

    def call(xk, w, b):
        return impl(xk, w, b, interpret=interpret)

    fn = custom_partitioning(call)

    def infer(mesh, arg_infos, result_infos):
        batch, hax = _xk_axes(arg_infos[0])
        return NamedSharding(mesh, PartitionSpec(batch, None, None, hax))

    def part(mesh, arg_infos, result_infos):
        batch, hax = _xk_axes(arg_infos[0])
        repl = NamedSharding(mesh, PartitionSpec())
        if hax is not None and arg_infos[0].shape[3] % int(
                mesh.shape[hax]) != 0:
            hax = None  # uneven H shards pad — replicate H instead
        x_sh = NamedSharding(mesh, PartitionSpec(batch, None, None, hax))
        out_sh = NamedSharding(mesh, PartitionSpec(batch, None, None,
                                                   hax))
        if hax is None:
            return mesh, call, out_sh, (x_sh, repl, repl)

        size = int(mesh.shape[hax])

        def lower(xk, w, b):
            xe = _halo_h_kl(xk, hax, size)
            if ok(xe.shape, xe.shape[2], w.shape[-1], dtype=xe.dtype):
                y = call(xe, w, b)
            else:
                y = _conv5_xla_kl(xe, w, b)
            return y[:, :, :, P:-P]

        return mesh, lower, out_sh, (x_sh, repl, repl)

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule="n d i h w, a b c i o, o -> n d o h w")
    return fn


@functools.lru_cache(maxsize=None)
def _cp_batchmap_kl_fused(kind, interpret):
    """Fused-epilogue twin of :func:`_cp_batchmap_kl` (inference only):
    three extra replicated [Co] f32 operands — the BatchNorm affine
    (inv, shift) and PReLU alpha — applied in the kernel's output path.
    No VJP: training-mode BN needs the conv output's batch statistics
    before it can normalize, so fusion is eval/serving-only by
    construction."""
    impl = {"head": _conv5_head_kl, "stem": _conv5_stem_kl}[kind]
    ok = {"head": head_eligible_kl, "stem": stem_eligible_kl}[kind]

    def call(xk, w, b, inv, shift, alpha):
        return impl(xk, w, b, interpret=interpret,
                    ep=(inv, shift, alpha))

    fn = custom_partitioning(call)

    def infer(mesh, arg_infos, result_infos):
        batch, hax = _xk_axes(arg_infos[0])
        return NamedSharding(mesh, PartitionSpec(batch, None, None, hax))

    def part(mesh, arg_infos, result_infos):
        batch, hax = _xk_axes(arg_infos[0])
        repl = NamedSharding(mesh, PartitionSpec())
        if hax is not None and arg_infos[0].shape[3] % int(
                mesh.shape[hax]) != 0:
            hax = None
        x_sh = NamedSharding(mesh, PartitionSpec(batch, None, None, hax))
        out_sh = NamedSharding(mesh, PartitionSpec(batch, None, None,
                                                   hax))
        if hax is None:
            return mesh, call, out_sh, (x_sh,) + (repl,) * 5

        size = int(mesh.shape[hax])

        def lower(xk, w, b, inv, shift, alpha):
            xe = _halo_h_kl(xk, hax, size)
            if ok(xe.shape, xe.shape[2], w.shape[-1], dtype=xe.dtype):
                y = call(xe, w, b, inv, shift, alpha)
            else:
                y = ep_apply_kl(_conv5_xla_kl(xe, w, b),
                                (inv, shift, alpha))
            return y[:, :, :, P:-P]

        return mesh, lower, out_sh, (x_sh,) + (repl,) * 5

    fn.def_partition(
        infer_sharding_from_operands=infer, partition=part,
        sharding_rule="n d i h w, a b c i o, o, o, o, o -> n d o h w")
    return fn


def conv5_kl_fused(xk, w, b, ep, kind="head", interpret=False):
    """5^3 SAME conv in kernel layout with the BN affine + PReLU fused
    into the kernel's output path (inference only — no VJP; the caller
    routes train-mode through :func:`conv5_kl` + separate BN/act).
    ``ep`` = (inv, shift, alpha), each [Co] f32."""
    inv, shift, alpha = ep
    return _cp_batchmap_kl_fused(kind, interpret)(xk, w, b, inv, shift,
                                                  alpha)


@functools.lru_cache(maxsize=None)
def _cp_wgrad_kl(which, kind, interpret):
    """Kernel-layout twin of :func:`_cp_wgrad`: per-shard partial dw
    psum'd over the batch (and H) mesh axes."""
    if which == "mid":
        def impl(xk, gk):
            return _conv5_wgrad_mid_kl(xk, gk, interpret=interpret)
    else:
        def impl(xk, gk):
            return _conv5_wgrad_kl(xk, gk, kind, interpret=interpret)

    fn = custom_partitioning(impl)

    def infer(mesh, arg_infos, result_infos):
        return NamedSharding(mesh, PartitionSpec())

    def part(mesh, arg_infos, result_infos):
        batch, hax = _xk_axes(arg_infos[0])
        if hax is not None and arg_infos[0].shape[3] % int(
                mesh.shape[hax]) != 0:
            hax = None
        x_sh = NamedSharding(mesh, PartitionSpec(batch, None, None, hax))
        repl = NamedSharding(mesh, PartitionSpec())
        axes = tuple(a for a in (batch, hax) if a is not None)

        def lower(xk, gk):
            if hax is not None:
                size = int(mesh.shape[hax])
                xk = _halo_h_kl(xk, hax, size)
                gk = jnp.pad(gk, ((0, 0), (0, 0), (0, 0), (P, P),
                                  (0, 0)))
            ci, co = xk.shape[2], gk.shape[2]
            xs = _kl_to_x_shape(xk.shape)
            wgrad_ok = (_head_ok(xs, ci, co, xk.dtype, 16)
                        if kind == "head"
                        else stem_eligible(xs, ci, co, xk.dtype))
            if which == "mid":
                wgrad_ok = _wgrad_mid_ok(xs, ci, co, xk.dtype)
            if wgrad_ok:
                dw = impl(xk, gk)
            else:
                zw = jnp.zeros((K, K, K, ci, co), xk.dtype)
                zb = jnp.zeros((co,), xk.dtype)
                dw = jax.vjp(
                    lambda w_: _conv5_xla_kl(xk, w_, zb), zw)[1](gk)[0]
            if axes:
                dw = jax.lax.psum(dw, axes)
            return dw

        return mesh, lower, repl, (x_sh, x_sh)

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule="n d i h w, n d o h w -> a b c i o")
    return fn


# ----------------------------------------------------------------------
# public kernel-layout op with Pallas backward
# ----------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv5_kl(xk, w, b, kind="head", interpret=False):
    """5^3 SAME conv in kernel layout.

    Args:
        xk: [N, D, Ci, H, W]; w: [5, 5, 5, Ci, Co]; b: [Co].
        kind: 'head' (general Ci, small Co) or 'stem' (C_in=1).
    Returns [N, D, Co, H, W]. Semantics identical to :func:`conv5` on
    the transposed operand, without the NDHWC layout round trip.
    """
    return _cp_batchmap_kl(kind, interpret)(xk, w, b)


def _conv5_kl_fwd(xk, w, b, kind, interpret):
    return conv5_kl(xk, w, b, kind, interpret), (xk, w, b)


def _conv5_kl_bwd(kind, interpret, res, gk):
    xk, w, b = res
    ci, co = xk.shape[2], gk.shape[2]
    dt = xk.dtype
    gs = _kl_to_x_shape(gk.shape)
    xs = _kl_to_x_shape(xk.shape)
    # dx is a 5^3 SAME conv of g (Ci=co -> Co=ci)
    if _head_ok(gs, co, ci, dt, 128):
        wflip = jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))
        dx = _cp_batchmap_kl("head", interpret)(
            gk, wflip, jnp.zeros((ci,), dt)).astype(xk.dtype)
    else:
        dx = jax.vjp(lambda x_: _conv5_xla_kl(x_, w, b), xk)[1](gk)[0]
    # dw: the lane-contraction kernel; Mg = 25*co rows must stay modest
    wgrad_ok = (_head_ok(xs, ci, co, dt, 16) if kind == "head"
                else stem_eligible(xs, ci, co, dt))
    if wgrad_ok:
        dw = _cp_wgrad_kl("std", kind, interpret)(xk, gk).astype(w.dtype)
    elif kind == "head" and _wgrad_mid_ok(xs, ci, co, dt):
        dw = _cp_wgrad_kl("mid", kind, interpret)(xk, gk).astype(w.dtype)
    else:
        dw = jax.vjp(lambda w_: _conv5_xla_kl(xk, w_, b), w)[1](gk)[0]
    # reduce the minor (H, W) dims first: a single reduce keeping only
    # the C axis makes XLA relayout the whole cotangent C-minor (tiny-C
    # lane padding — 3 GB for the spine stem), while a lanes/sublanes
    # partial reduce keeps gk's native layout.
    db = jnp.sum(jnp.sum(gk.astype(jnp.float32), axis=(3, 4)),
                 axis=(0, 1)).astype(b.dtype)
    return (dx, dw, db)


conv5_kl.defvjp(_conv5_kl_fwd, _conv5_kl_bwd)


# ----------------------------------------------------------------------
# layout pin: force physical row-major materialization of a
# kernel-layout tensor
# ----------------------------------------------------------------------
def _pin_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def _pin_call(xk, interpret=False):
    n, d, c, h, w = xk.shape
    hb = h
    while hb > 1 and h % hb == 0 and (
            hb * w * jnp.dtype(xk.dtype).itemsize > 4 * 1024 * 1024):
        hb //= 2
    if h % hb:
        hb = 1
    return pl.pallas_call(
        _pin_kernel,
        grid=(n, d, c, h // hb),
        in_specs=[pl.BlockSpec((1, 1, 1, hb, w),
                               lambda i, j, k, l: (i, j, k, l, 0))],
        out_specs=pl.BlockSpec((1, 1, 1, hb, w),
                               lambda i, j, k, l: (i, j, k, l, 0)),
        out_shape=jax.ShapeDtypeStruct(xk.shape, xk.dtype),
        interpret=interpret,
    )(xk)


@functools.lru_cache(maxsize=None)
def _cp_pin(interpret):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def call(xk):
        return _pin_call(xk, interpret=interpret)

    fn = custom_partitioning(call)

    def _sh(mesh, arg_infos):
        s = getattr(arg_infos[0], "sharding", None)
        if isinstance(s, NamedSharding):
            return s
        return NamedSharding(mesh, PartitionSpec())

    def infer(mesh, arg_infos, result_infos):
        return _sh(mesh, arg_infos)

    def part(mesh, arg_infos, result_infos):
        s = _sh(mesh, arg_infos)
        return mesh, call, s, (s,)

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule="n d c h w -> n d c h w")
    return fn


@jax.custom_vjp
def _pin(xk):
    return _cp_pin(jax.default_backend() != "tpu")(xk)


def _pin_fwd(xk):
    return _pin(xk), None


def _pin_bwd(_, g):
    # pin the cotangent too: it feeds the wgrad g-expansions, which
    # also materialize at volume scale
    return (_pin(g),)


_pin.defvjp(_pin_fwd, _pin_bwd)


def pin_kl(xk):
    """Identity that forces a kernel-layout tensor to materialize in
    the Pallas kernels' row-major layout (W on lanes, H on sublanes).

    Without it, XLA's layout assignment can "solve" the NDHWC<->KL
    transposes by keeping tensors physically channels-minor, whose
    tiled form lane-pads a narrow C up to 10.7x — measured as multiple
    3-15 GB HLO-temp allocations (remat pivots, conv prep pads) at the
    512x512x12 spine geometry. The Mosaic custom call's operand/result
    layout constraints are the one reliable lever over interior
    layouts. No-op off TPU."""
    if jax.default_backend() != "tpu":
        return xk
    return _pin(xk)


# ----------------------------------------------------------------------
# public op with Pallas backward (XLA-vjp fallback)
# ----------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv5(x, w, b, kind="head", interpret=False):
    """5^3 SAME conv via the Pallas kernels.

    Args:
        x: [N, D, H, W, Ci]; w: [5, 5, 5, Ci, Co]; b: [Co].
        kind: 'head' (general Ci, small Co) or 'stem' (C_in=1).
    """
    return _cp_batchmap(kind, interpret)(x, w, b)


def _conv5_fwd(x, w, b, kind, interpret):
    return conv5(x, w, b, kind, interpret), (x, w, b)


def _conv5_bwd(kind, interpret, res, g):
    """dgrad = the head kernel with flipped/transposed weights; wgrad =
    the lane-contraction kernel; each piece independently falls back to
    the stock conv's VJP when ineligible."""
    x, w, b = res
    ci, co = x.shape[-1], g.shape[-1]
    dt = x.dtype
    # dx is a 5^3 SAME conv of g (Ci=co -> Co=ci)
    if _head_ok(g.shape, co, ci, dt, 128):
        wflip = jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))
        dx = _cp_batchmap("head", interpret)(
            g, wflip, jnp.zeros((ci,), dt)).astype(x.dtype)
    else:
        dx = jax.vjp(lambda x_: _conv5_xla(x_, w, b), x)[1](g)[0]
    # dw: the lane-contraction kernel; Mg = 25*co rows must stay modest
    wgrad_ok = (_head_ok(x.shape, ci, co, dt, 16) if kind == "head"
                else stem_eligible(x.shape, ci, co, dt))
    if wgrad_ok:
        dw = _cp_wgrad("std", kind, interpret)(x, g).astype(w.dtype)
    elif kind == "head" and _wgrad_mid_ok(x.shape, ci, co, dt):
        dw = _cp_wgrad("mid", kind, interpret)(x, g).astype(w.dtype)
    else:
        dw = jax.vjp(lambda w_: _conv5_xla(x, w_, b), w)[1](g)[0]
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2, 3)).astype(
        b.dtype)
    return (dx, dw, db)


conv5.defvjp(_conv5_fwd, _conv5_bwd)


# ----------------------------------------------------------------------
# wide stacks (Ci or Co in (128, 256]): co-chunked head-kernel calls
# ----------------------------------------------------------------------
def _conv5_any(x, w, b, interpret):
    """Route a 5^3 SAME head conv to the direct kernel, the co-chunked
    wide form, or the XLA conv — whichever the traced shape admits.
    Used for both the wide forward and its dgrad (whose Ci/Co swap can
    change which route is available)."""
    ci, co = x.shape[-1], w.shape[-1]
    if head_eligible(x.shape, ci, co, x.dtype):
        return _cp_batchmap("head", interpret)(x, w, b)
    cg = _wide_chunk(x.shape, ci, co, x.dtype)
    if cg is not None:
        outs = [_cp_batchmap("head", interpret)(x, w[..., i:i + cg],
                                                b[i:i + cg])
                for i in range(0, co, cg)]
        return jnp.concatenate(outs, axis=-1)
    return _conv5_xla(x, w, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv5_wide(x, w, b, interpret=False):
    """5^3 SAME conv for wide stacks: the head kernel applied per co
    chunk (the chunk size the VMEM budget admits at this Ci), outputs
    concatenated on the channel axis. dgrad routes back through the
    same chunked kernel (Ci/Co swap keeps it <= 256); wgrad uses the
    XLA conv VJP (the compact wgrad kernel's [5*Ci', Mg] f32
    accumulator does not fit VMEM beyond C=64)."""
    return _conv5_any(x, w, b, interpret)


def _conv5_wide_fwd(x, w, b, interpret):
    return conv5_wide(x, w, b, interpret), (x, w, b)


def _conv5_wide_bwd(interpret, res, g):
    x, w, b = res
    ci = x.shape[-1]
    dt = x.dtype
    wflip = jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))
    dx = _conv5_any(g, wflip, jnp.zeros((ci,), dt), interpret).astype(dt)
    dw = jax.vjp(lambda w_: _conv5_xla(x, w_, b), w)[1](g)[0]
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2, 3)).astype(
        b.dtype)
    return (dx, dw, db)


conv5_wide.defvjp(_conv5_wide_fwd, _conv5_wide_bwd)
