"""scipy-oracle tests for rotation / flip / intensity kernels."""
import numpy as np
import pytest
import scipy.ndimage

import jax.numpy as jnp

from medicalseg_tpu.ops import (hu_norm, label_remap, min_max_norm,
                                normalize, random_flip3d, rotate3d,
                                scale_by_max)


@pytest.mark.parametrize("r_plane", [(0, 1), (0, 2), (1, 2)])
@pytest.mark.parametrize("angle", [-37.5, 15.0, 90.0])
def test_rotate3d_matches_scipy(r_plane, angle):
    rng = np.random.RandomState(0)
    img = rng.rand(12, 13, 14).astype(np.float32)
    ours = np.asarray(rotate3d(jnp.asarray(img), angle, r_plane=r_plane,
                               order=1))
    ref = scipy.ndimage.rotate(img, angle=angle, axes=r_plane, order=1,
                               reshape=False, cval=0.0)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize("r_plane", [(0, 1), (1, 2)])
@pytest.mark.parametrize("angle", [-29.5, 17.0, 44.0])
def test_rotate3d_shear_close_to_scipy(r_plane, angle):
    """The 3-shear MXU rotation (augmentation fast path) tracks scipy
    bilinear closely in the interior; only a few-pixel band at the
    valid-mask border may blend with the pass-intermediate zero fill."""
    from medicalseg_tpu.ops import rotate3d_shear
    rng = np.random.RandomState(0)
    img = scipy.ndimage.gaussian_filter(
        rng.rand(8, 40, 40).astype(np.float32), (0, 2, 2))
    ours = np.asarray(rotate3d_shear(jnp.asarray(img), angle,
                                     r_plane=r_plane, order=1))
    ref = scipy.ndimage.rotate(img, angle=angle, axes=r_plane, order=1,
                               reshape=False, cval=0.0)
    assert np.abs(ours - ref).mean() < 1.2e-2
    # strict cval mask agrees away from the 1-px coordinate-noise band
    interior = scipy.ndimage.binary_erosion(ref != 0.0, np.ones((1, 3, 3)))
    assert np.abs((ours - ref)[interior]).max() < 0.3
    # zero rotation is exact
    same = np.asarray(rotate3d_shear(jnp.asarray(img), 0.0,
                                     r_plane=r_plane, order=1))
    np.testing.assert_allclose(same, img, atol=1e-5)


def test_rotate3d_shear_labels_stay_valid():
    from medicalseg_tpu.ops import rotate3d_shear
    rng = np.random.RandomState(1)
    lab = rng.randint(0, 20, (8, 32, 32)).astype(np.int32)
    out = np.asarray(rotate3d_shear(jnp.asarray(lab), 25.0,
                                    r_plane=(1, 2), order=1))
    assert out.min() >= 0 and out.max() < 20


def test_rotate3d_nearest_labels():
    rng = np.random.RandomState(1)
    lab = rng.randint(0, 4, (10, 10, 10)).astype(np.int32)
    ours = np.asarray(rotate3d(jnp.asarray(lab), 30.0, r_plane=(0, 1),
                               order=0))
    ref = scipy.ndimage.rotate(lab, angle=30.0, axes=(0, 1), order=0,
                               reshape=False, cval=0)
    assert (ours == ref).mean() > 0.99  # rounding ties may differ rarely


def test_random_flip3d():
    rng = np.random.RandomState(2)
    img = rng.rand(4, 5, 6).astype(np.float32)
    out = np.asarray(random_flip3d(jnp.asarray(img),
                                   jnp.array([True, False, True])))
    np.testing.assert_allclose(out, img[::-1, :, ::-1])
    out2 = np.asarray(random_flip3d(jnp.asarray(img),
                                    jnp.array([False, False, False])))
    np.testing.assert_allclose(out2, img)


def test_hu_norm():
    img = np.array([[-3000.0, -1200.0], [600.0, 2000.0]], np.float32)
    img = np.stack([img, np.full_like(img, np.nan)])
    out = np.asarray(hu_norm(jnp.asarray(img)))
    assert out[0, 0, 0] == 0.0  # below window
    assert out[0, 1, 0] == 255.0  # above window clips to max
    assert np.all(out[1] == 0.0)  # nan -> hu_nan -> clipped to 0
    assert out.min() >= 0 and out.max() <= 255


def test_normalize():
    img = np.array([0.0, 5.0, 10.0], np.float32)
    np.testing.assert_allclose(np.asarray(min_max_norm(img)),
                               [0.0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(normalize(img, 0, 20)),
                               [0.0, 0.25, 0.5])


def test_label_remap():
    lab = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    out = np.asarray(label_remap(jnp.asarray(lab), {1: 0, 3: 1, 5: 2}))
    np.testing.assert_array_equal(out, [[0, 0, 2], [1, 4, 2]])


def test_scale_by_max():
    img = np.array([1.0, 2.0, 4.0], np.float32)
    np.testing.assert_allclose(np.asarray(scale_by_max(img)),
                               [0.25, 0.5, 1.0])
    neg = np.array([-1.0, -2.0], np.float32)
    np.testing.assert_allclose(np.asarray(scale_by_max(neg)), neg)
