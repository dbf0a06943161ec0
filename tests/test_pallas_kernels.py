"""Pallas fused preprocess kernel tests (interpreter mode on CPU)."""
import os

import numpy as np
import pytest

import jax.numpy as jnp


def test_fused_hu_resize_matches_composition(monkeypatch):
    monkeypatch.setenv("MEDSEG_PALLAS_INTERPRET", "1")
    from medicalseg_tpu.ops import hu_norm, resize3d
    from medicalseg_tpu.ops.pallas_kernels import (_pallas_enabled,
                                                   hu_norm_resize)
    rng = np.random.RandomState(0)
    raw = rng.uniform(-2000, 1000, (24, 16, 16)).astype(np.float32)
    raw[0, 0, 0] = np.nan

    fused = np.asarray(hu_norm_resize(jnp.asarray(raw), (12, 8, 8)))
    ref = np.asarray(resize3d(hu_norm(jnp.asarray(raw)), (12, 8, 8),
                              order=1))
    assert _pallas_enabled()
    np.testing.assert_allclose(fused, ref, atol=1e-3)


def test_fallback_path_without_pallas(monkeypatch):
    monkeypatch.setenv("MEDSEG_DISABLE_PALLAS", "1")
    from medicalseg_tpu.ops import hu_norm, resize3d
    from medicalseg_tpu.ops.pallas_kernels import hu_norm_resize
    rng = np.random.RandomState(1)
    raw = rng.uniform(-2000, 1000, (10, 8, 8)).astype(np.float32)
    fused = np.asarray(hu_norm_resize(jnp.asarray(raw), (5, 4, 4)))
    ref = np.asarray(resize3d(hu_norm(jnp.asarray(raw)), (5, 4, 4),
                              order=1))
    np.testing.assert_allclose(fused, ref, atol=1e-4)
