"""scipy-oracle tests for the 3-D resize kernels (SURVEY §7 hard part #1:
trilinear/nearest zoom parity with scipy.ndimage.zoom)."""
import numpy as np
import pytest
import scipy.ndimage

import jax.numpy as jnp

from medicalseg_tpu.ops import (crop_resize3d, resize3d, resize_to_spacing)


def _scipy_zoom_to(img, size, order):
    factor = np.array(size) / np.array(img.shape[:3])
    if img.ndim == 4:
        factor = np.concatenate([factor, [1.0]])
    return scipy.ndimage.zoom(img, factor, mode="nearest", order=order)


@pytest.mark.parametrize("in_shape,out_shape", [
    ((16, 16, 16), (8, 8, 8)),
    ((9, 11, 13), (16, 16, 16)),
    ((32, 32, 8), (16, 16, 16)),
    ((7, 7, 7), (7, 7, 7)),
    ((5, 6, 7), (1, 6, 14)),
])
def test_trilinear_matches_scipy(in_shape, out_shape):
    rng = np.random.RandomState(0)
    img = rng.rand(*in_shape).astype(np.float32)
    ours = np.asarray(resize3d(jnp.asarray(img), out_shape, order=1))
    ref = _scipy_zoom_to(img, out_shape, order=1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("in_shape,out_shape", [
    ((16, 16, 16), (8, 8, 8)),
    ((9, 11, 13), (16, 16, 16)),
    ((12, 12, 12), (5, 7, 9)),
])
def test_nearest_matches_scipy(in_shape, out_shape):
    rng = np.random.RandomState(1)
    lab = rng.randint(0, 5, size=in_shape).astype(np.int32)
    ours = np.asarray(resize3d(jnp.asarray(lab), out_shape, order=0))
    ref = _scipy_zoom_to(lab, out_shape, order=0)
    assert ours.shape == ref.shape
    # scipy order=0 uses spline "nearest" with half-up rounding; exact match
    np.testing.assert_array_equal(ours, ref)


def test_channel_last_4d():
    rng = np.random.RandomState(2)
    img = rng.rand(8, 8, 8, 3).astype(np.float32)
    ours = np.asarray(resize3d(jnp.asarray(img), (12, 12, 12), order=1))
    ref = _scipy_zoom_to(img, (12, 12, 12), order=1)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_crop_resize_matches_static_path():
    rng = np.random.RandomState(3)
    img = rng.rand(20, 22, 24).astype(np.float32)
    start = np.array([2, 3, 4], np.int32)
    crop = np.array([10, 12, 14], np.int32)
    out_size = (8, 8, 8)
    fused = np.asarray(crop_resize3d(jnp.asarray(img), start, crop,
                                     out_size, order=1))
    cropped = img[2:12, 3:15, 4:18]
    ref = np.asarray(resize3d(jnp.asarray(cropped), out_size, order=1))
    np.testing.assert_allclose(fused, ref, atol=2e-5)
    # and against scipy directly
    scipy_ref = _scipy_zoom_to(cropped, out_size, order=1)
    np.testing.assert_allclose(fused, scipy_ref, atol=2e-5)


def test_crop_resize_nearest_matches_static_path():
    rng = np.random.RandomState(4)
    lab = rng.randint(0, 7, size=(20, 20, 20)).astype(np.int32)
    start = np.array([1, 2, 3], np.int32)
    crop = np.array([15, 14, 13], np.int32)
    out_size = (10, 10, 10)
    fused = np.asarray(crop_resize3d(jnp.asarray(lab), start, crop,
                                     out_size, order=0))
    ref = _scipy_zoom_to(lab[1:16, 2:16, 3:16], out_size, order=0)
    np.testing.assert_array_equal(fused, ref)


def test_resize_to_spacing():
    rng = np.random.RandomState(5)
    img = rng.rand(20, 30, 30).astype(np.float32)
    out, new_spacing = resize_to_spacing(
        jnp.asarray(img), spacing=(1.0, 1.0, 2.5), new_spacing=(2.0, 2.0,
                                                                5.0))
    assert out.shape == (10, 15, 15)
    np.testing.assert_allclose(new_spacing, (2.0, 2.0, 5.0))

    out2, sp2 = resize_to_spacing(
        jnp.asarray(img), spacing=(1.0, 1.0, 2.5), new_shape=(16, 16, 16))
    assert out2.shape == (16, 16, 16)


@pytest.mark.parametrize("in_shape,out_dhw", [
    ((2, 6, 8, 8, 5), (12, 32, 32)),
    ((1, 3, 16, 16, 20), (12, 64, 64)),
    ((1, 4, 4, 4, 3), (4, 4, 4)),      # identity
    ((1, 3, 8, 8, 4), (12, 8, 8)),     # z-only (spine head geometry)
])
def test_upsample_trilinear_matches_jax_image(in_shape, out_dhw):
    """Half-pixel matmul resize (deep-sup aux-head upsample path,
    models/vnet_deepsup.py) must match jax.image.resize trilinear
    (paddle F.interpolate align_corners=False parity, reference
    vnet_deepsup.py:266-277)."""
    import jax

    from medicalseg_tpu.ops.resize import upsample_trilinear_batch

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(*in_shape).astype(np.float32))
    ref = jax.image.resize(
        x, (in_shape[0],) + out_dhw + (in_shape[-1],), method="trilinear")
    got = upsample_trilinear_batch(x, out_dhw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6)


def test_upsample_trilinear_rejects_downscale():
    from medicalseg_tpu.ops.resize import upsample_trilinear_batch
    with pytest.raises(ValueError):
        upsample_trilinear_batch(jnp.zeros((1, 8, 8, 8, 2)), (4, 8, 8))
