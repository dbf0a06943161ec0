"""On-device augmentation pipeline tests: distribution sanity, shape
contracts, and no-recompile behavior across random draws."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalseg_tpu.transforms import (DeviceAugmentor, RandomFlip3D,
                                       RandomResizedCrop3D,
                                       RandomRotation3D, Resize3D,
                                       device_supports)


def test_supports():
    assert device_supports([RandomFlip3D(), Resize3D(8)])
    from medicalseg_tpu.transforms import BinaryMaskToConnectComponent
    assert not device_supports([BinaryMaskToConnectComponent()])


def test_shapes_and_normalization():
    aug = DeviceAugmentor([
        RandomResizedCrop3D(size=8, scale=(0.8, 1.2)),
        RandomRotation3D(degrees=30),
        RandomFlip3D(),
    ])
    rng = np.random.RandomState(0)
    imgs = (rng.rand(4, 12, 12, 12) * 255).astype(np.float32)
    labs = rng.randint(0, 3, (4, 12, 12, 12)).astype(np.int32)
    out_img, out_lab = aug(jnp.asarray(imgs), jnp.asarray(labs),
                           jax.random.PRNGKey(0))
    assert out_img.shape == (4, 8, 8, 8, 1)
    assert out_lab.shape == (4, 8, 8, 8)
    assert out_lab.dtype == jnp.int32
    # Compose tail: divide-by-max -> [0, 1]
    assert float(out_img.max()) <= 1.0 + 1e-6
    assert float(out_img.min()) >= -1e-6


def test_flip_only_preserves_content():
    aug = DeviceAugmentor([RandomFlip3D(prob=1.0, flip_axis=[0])])
    img = np.arange(8, dtype=np.float32).reshape(2, 2, 2)[None]
    lab = np.arange(8, dtype=np.int32).reshape(2, 2, 2)[None]
    out_img, out_lab = aug(jnp.asarray(img), jnp.asarray(lab),
                           jax.random.PRNGKey(0))
    # flip along axis 0 always
    np.testing.assert_array_equal(np.asarray(out_lab)[0],
                                  lab[0][::-1, :, :])
    np.testing.assert_allclose(np.asarray(out_img)[0, ..., 0],
                               img[0][::-1] / img.max())


def test_no_recompile_across_draws():
    aug = DeviceAugmentor([RandomResizedCrop3D(size=8, scale=(0.6, 1.0))])
    rng = np.random.RandomState(1)
    imgs = rng.rand(2, 16, 16, 16).astype(np.float32)
    labs = rng.randint(0, 2, (2, 16, 16, 16)).astype(np.int32)
    with jax.checking_leaks():
        pass
    # count compiles via the jitted fn's cache
    out1 = aug(jnp.asarray(imgs), jnp.asarray(labs), jax.random.PRNGKey(0))
    size1 = aug._jitted._cache_size()
    for seed in range(1, 5):
        aug(jnp.asarray(imgs), jnp.asarray(labs),
            jax.random.PRNGKey(seed))
    assert aug._jitted._cache_size() == size1  # one executable for all


def test_crop_distribution_varies():
    aug = DeviceAugmentor([RandomResizedCrop3D(size=8, scale=(0.5, 1.0))])
    img = np.arange(16 ** 3, dtype=np.float32).reshape(1, 16, 16, 16)
    lab = np.zeros((1, 16, 16, 16), np.int32)
    outs = [np.asarray(aug(jnp.asarray(img), jnp.asarray(lab),
                           jax.random.PRNGKey(s))[0]) for s in range(4)]
    # different seeds produce different crops
    assert not all(np.allclose(outs[0], o) for o in outs[1:])


def test_pre_crop_nonzero_mask_confines_to_bbox():
    """Device pre_crop + nonzero_mask (round 2): sampled content must come
    from inside the label-nonzero bounding box (reference transform.py:
    279-323 semantics)."""
    img = np.full((1, 16, 16, 16), -1.0, np.float32)
    lab = np.zeros((1, 16, 16, 16), np.int32)
    # nonzero bbox = [4:12, 4:12, 4:12]; mark its img region positive
    img[:, 4:12, 4:12, 4:12] = np.abs(
        np.random.RandomState(0).rand(8, 8, 8)) + 1.0
    lab[:, 4:12, 4:12, 4:12] = 1
    aug = DeviceAugmentor([
        RandomResizedCrop3D(size=6, scale=(0.9, 1.0), pre_crop=True,
                            nonzero_mask=True)])
    for seed in range(4):
        out_img, out_lab = aug(jnp.asarray(img), jnp.asarray(lab),
                               jax.random.PRNGKey(seed))
        # all sampled voxels originate inside the bbox (positive values;
        # trilinear resize of positive values stays positive)
        assert float(out_img.min()) > 0.0
        assert int(out_lab.min()) == 1
        assert out_img.shape == (1, 6, 6, 6, 1)


def test_pre_crop_without_mask_shapes_and_variety():
    aug = DeviceAugmentor([
        RandomResizedCrop3D(size=6, scale=(0.8, 1.2), pre_crop=True)])
    rng = np.random.RandomState(3)
    img = rng.rand(2, 16, 16, 16).astype(np.float32)
    lab = rng.randint(0, 2, (2, 16, 16, 16)).astype(np.int32)
    outs = [np.asarray(aug(jnp.asarray(img), jnp.asarray(lab),
                           jax.random.PRNGKey(s))[0]) for s in range(3)]
    assert outs[0].shape == (2, 6, 6, 6, 1)
    assert not all(np.allclose(outs[0], o) for o in outs[1:])


def test_pre_crop_all_zero_label_falls_back_to_full_extent():
    """All-zero label + nonzero_mask: device path must not produce NaNs
    (the reference host path crashes here; we fall back to full extent)."""
    img = np.random.RandomState(4).rand(1, 12, 12, 12).astype(np.float32)
    lab = np.zeros((1, 12, 12, 12), np.int32)
    aug = DeviceAugmentor([
        RandomResizedCrop3D(size=6, scale=(0.9, 1.1), pre_crop=True,
                            nonzero_mask=True)])
    out_img, out_lab = aug(jnp.asarray(img), jnp.asarray(lab),
                           jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out_img)).all()
    assert out_img.shape == (1, 6, 6, 6, 1)
