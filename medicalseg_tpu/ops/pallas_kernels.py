# Copyright 2026. Apache License 2.0.
"""Pallas TPU kernels for the preprocessing hot path.

The CT ingest pipeline is HBM-bandwidth-bound: a raw scan (e.g.
200x512x512 f32 = 200 MB) must be HU-windowed (elementwise, VPU) and
resampled (separable matmuls, MXU). Running them as separate XLA ops
costs an extra full-volume HBM round trip for the windowed intermediate.
:func:`hu_norm_resize_d` fuses the two for the leading (D) axis: each
grid step streams a (D, tile) strip into VMEM, applies the HU window on
the VPU, and immediately contracts it with the (out_d, D) interpolation
matrix on the MXU — the windowed volume never touches HBM. The remaining
H/W axis contractions run as stock XLA einsums on the already-reduced
volume (usually ~4-16x smaller).

Falls back to the unfused jnp path off-TPU (or set
MEDSEG_DISABLE_PALLAS=1).
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from .intensity import hu_norm
from .resize import _linear_matrix, resize3d

try:  # pallas is TPU-only at runtime; import lazily/optionally
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _interpret_mode():
    """CPU interpreter execution for tests (MEDSEG_PALLAS_INTERPRET=1)."""
    return bool(os.environ.get("MEDSEG_PALLAS_INTERPRET"))


def _pallas_enabled():
    if os.environ.get("MEDSEG_DISABLE_PALLAS"):
        return False
    if not _HAS_PALLAS:
        return False
    if _interpret_mode():
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _hu_resize_kernel(w_ref, vol_ref, out_ref, *, hu_min, hu_max, hu_nan):
    """One grid step: out[:, tile] = W @ hu_window(vol[:, tile]).

    w_ref:   (OUT_D, D)  interpolation matrix (VMEM, whole)
    vol_ref: (D, TILE)   input strip (VMEM)
    out_ref: (OUT_D, TILE)
    """
    x = vol_ref[:]
    # HU windowing on the VPU (values.py:67-87 semantics)
    x = jnp.where(jnp.isnan(x), hu_nan, x)
    x = (x - hu_min) / (hu_max - hu_min)
    x = jnp.clip(x, 0.0, 1.0) * 255.0
    out_ref[:] = jnp.dot(w_ref[:], x, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("out_d", "tile"))
def _hu_norm_resize_d_pallas(vol, out_d, tile=2048):
    d, h, w = vol.shape
    hw = h * w
    flat = vol.reshape(d, hw)
    hw_pad = _round_up(hw, tile)
    if hw_pad != hw:
        flat = jnp.pad(flat, ((0, 0), (0, hw_pad - hw)))
    wmat = _linear_matrix(d, out_d)  # (out_d, d)

    grid = (hw_pad // tile,)
    out = pl.pallas_call(
        functools.partial(_hu_resize_kernel, hu_min=-1200.0, hu_max=600.0,
                          hu_nan=-2000.0),
        grid=grid,
        in_specs=[
            pl.BlockSpec((out_d, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_d, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_d, hw_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * out_d * d * hw_pad,
            bytes_accessed=(d * hw_pad + out_d * hw_pad + out_d * d) * 4,
            transcendentals=0),
        interpret=_interpret_mode(),
    )(wmat, flat.astype(jnp.float32))
    return out[:, :hw].reshape(out_d, h, w)


def hu_norm_resize(vol, size, hu_min=-1200.0, hu_max=600.0,
                   hu_nan=-2000.0):
    """Fused HU windowing + trilinear resize to ``size`` (d, h, w).

    Numerically identical to ``resize3d(hu_norm(vol), size)`` (same
    endpoint-aligned interpolation); the D-axis pass is a Pallas kernel
    on TPU, the H/W passes stock einsums on the reduced volume.
    """
    size = tuple(int(s) for s in size)
    if _pallas_enabled() and vol.ndim == 3:
        reduced = _hu_norm_resize_d_pallas(jnp.asarray(vol, jnp.float32),
                                           size[0])
        # remaining H/W contractions on the already out_d-sized volume
        return resize3d(reduced, size, order=1)
    return resize3d(hu_norm(vol, hu_min, hu_max, hu_nan), size, order=1)
