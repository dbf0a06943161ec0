"""Sliding-window whole-volume inference tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalseg_tpu.core.sliding_window import (compute_window_starts,
                                                gaussian_importance,
                                                sliding_window_inference)


def test_window_starts():
    assert compute_window_starts(16, 16, 0.25) == [0]
    assert compute_window_starts(8, 16, 0.25) == [0]
    starts = compute_window_starts(32, 16, 0.5)
    assert starts[0] == 0 and starts[-1] == 16
    # full coverage
    covered = set()
    for s in starts:
        covered.update(range(s, s + 16))
    assert covered == set(range(32))


def test_gaussian_importance():
    m = np.asarray(gaussian_importance((8, 8, 8)))
    assert m.max() == pytest.approx(1.0)
    assert m[4, 4, 4] >= m[0, 0, 0]
    assert np.all(m > 0)


def test_sliding_window_matches_full_on_linear_model():
    """With a voxel-wise (1^3 conv) model, tiled inference must equal the
    full-volume forward exactly, regardless of blending."""
    from flax import linen as nn

    class PointwiseNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return [nn.Conv(3, (1, 1, 1))(x)]

    model = PointwiseNet()
    vol = jnp.asarray(
        np.random.RandomState(0).rand(20, 20, 20, 1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), vol[None], train=False)

    full = model.apply(variables, vol[None], train=False)[0][0]
    tiled = sliding_window_inference(
        model.apply, variables, vol, (8, 8, 8), num_classes=3,
        overlap=0.5, window_batch=3)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               atol=1e-4)


def test_sliding_window_pads_small_volumes():
    from flax import linen as nn

    class PointwiseNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return [nn.Conv(2, (1, 1, 1))(x)]

    model = PointwiseNet()
    vol = jnp.asarray(
        np.random.RandomState(1).rand(5, 6, 7, 1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), vol[None], train=False)
    out = sliding_window_inference(
        model.apply, variables, vol, (8, 8, 8), num_classes=2)
    assert out.shape == (5, 6, 7, 2)


def test_batched_sliding_window_matches_per_volume():
    """Multi-volume serving (VERDICT #6): the batched scan must
    reproduce the per-volume results exactly."""
    from flax import linen as nn
    from medicalseg_tpu.core.sliding_window import (
        sliding_window_inference_batched)

    class PointwiseNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return [nn.Conv(3, (1, 1, 1))(x)]

    model = PointwiseNet()
    rng = np.random.RandomState(2)
    vols = jnp.asarray(rng.rand(3, 12, 12, 12, 1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), vols[:1], train=False)

    batched = sliding_window_inference_batched(
        model.apply, variables, vols, (8, 8, 8), num_classes=3,
        overlap=0.5, window_batch=4)
    assert batched.shape == (3, 12, 12, 12, 3)
    for i in range(3):
        single = sliding_window_inference(
            model.apply, variables, vols[i], (8, 8, 8), num_classes=3,
            overlap=0.5, window_batch=4)
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single), atol=1e-5)
