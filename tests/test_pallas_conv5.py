"""Pallas 5^3 conv kernels vs the XLA conv oracle (interpret mode on
CPU; the real Mosaic path runs on TPU in bench.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalseg_tpu.ops import pallas_conv5 as pc


def _data(n, d, h, w, ci, co, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d, h, w, ci).astype(np.float32)
    k = (rng.randn(5, 5, 5, ci, co) / np.sqrt(125 * ci)).astype(
        np.float32)
    b = rng.randn(co).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(k), jnp.asarray(b)


def test_head_kernel_matches_xla():
    x, k, b = _data(2, 8, 8, 16, ci=8, co=3)
    ref = pc._conv5_xla(x, k, b)
    got = pc.conv5(x, k, b, "head", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)  # bf16 matmul


def test_head_kernel_odd_tile_shapes():
    # d=4, h=2 forces the smaller tile candidates
    x, k, b = _data(1, 4, 2, 8, ci=4, co=2, seed=1)
    ref = pc._conv5_xla(x, k, b)
    got = pc.conv5(x, k, b, "head", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_stem_kernel_matches_xla():
    x, k, b = _data(2, 8, 8, 16, ci=1, co=16, seed=2)
    ref = pc._conv5_xla(x, k, b)
    got = pc.conv5(x, k, b, "stem", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_conv5_gradients_match_xla():
    """The custom VJP routes backward through the XLA conv — grads must
    equal autodiff of the stock conv exactly."""
    x, k, b = _data(1, 4, 4, 8, ci=2, co=2, seed=3)

    def loss_pallas(x, k, b):
        return jnp.sum(pc.conv5(x, k, b, "head", True) ** 2)

    def loss_xla(x, k, b):
        return jnp.sum(pc._conv5_xla(x, k, b) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, k, b)
    for a, c in zip(gp, gx):
        # fwd differs by bf16 rounding inside sum-of-squares -> loose
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=5e-2, rtol=5e-2)


def test_eligibility():
    assert pc.head_eligible((1, 128, 128, 128, 32), 32, 3)
    assert not pc.head_eligible((1, 128, 128, 100, 32), 32, 3)  # W%128
    assert not pc.head_eligible((1, 128, 128, 128, 32), 32, 64)  # big Co
    assert pc.stem_eligible((1, 128, 128, 128, 1), 1, 16)
    assert not pc.stem_eligible((1, 128, 128, 128, 4), 4, 16)
