"""Model shape/structure tests (reference VNet.test() analogue,
vnet.py:269-282, plus anisotropic stride/kernel shape math)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalseg_tpu.models import VNet, VNetDeepSup


def _init_and_apply(model, x):
    # jit both: eager init/apply compiles every op separately (minutes on
    # CPU); one whole-graph compile is seconds.
    variables = jax.jit(
        lambda k, x: model.init(k, x, train=False))(jax.random.PRNGKey(0),
                                                    x)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    return variables, out


def test_vnet_isotropic_shape():
    model = VNet(in_channels=1, num_classes=3)
    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    variables, out = _init_and_apply(model, x)
    assert isinstance(out, list) and len(out) == 1
    assert out[0].shape == (1, 32, 32, 32, 3)
    assert "batch_stats" in variables


def test_vnet_anisotropic_shape():
    # MRI spine config: kernel [[2,2,4],[2,2,2],[2,2,2],[2,2,2]],
    # stride [[2,2,1],[2,2,1],[2,2,2],[2,2,2]] on 512x512x12 volumes
    # (configs/mri_spine_seg/vnet_mri_spine_seg_512_512_12_15k.yml:8-9).
    # Scaled-down spatially (64x64) to keep the test fast; D=12 exact.
    model = VNet(
        in_channels=1, num_classes=20,
        kernel_size=((2, 2, 4), (2, 2, 2), (2, 2, 2), (2, 2, 2)),
        stride_size=((2, 2, 1), (2, 2, 1), (2, 2, 2), (2, 2, 2)))
    # layout: H, W spatial, D=12 on the last spatial axis like reference
    x = jnp.zeros((1, 64, 64, 12, 1), jnp.float32)
    _, out = _init_and_apply(model, x)
    assert out[0].shape == (1, 64, 64, 12, 20)


def test_vnet_deepsup_heads():
    model = VNetDeepSup(in_channels=1, num_classes=3)
    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    _, out = _init_and_apply(model, x)
    assert len(out) == 4
    for o in out:
        assert o.shape == (1, 32, 32, 32, 3)


@pytest.mark.slow
def test_vnet_train_mode_mutates_batch_stats():
    model = VNet(in_channels=1, num_classes=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16, 1))
    variables = jax.jit(
        lambda k, x: model.init(k, x, train=False))(jax.random.PRNGKey(0),
                                                    x)
    out, mutated = jax.jit(
        lambda v, x, k: model.apply(v, x, train=True,
                                    rngs={"dropout": k},
                                    mutable=["batch_stats"]))(
        variables, x, jax.random.PRNGKey(2))
    assert "batch_stats" in mutated
    # running stats must have moved away from init
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_vnet_bf16_compute():
    model = VNet(in_channels=1, num_classes=2, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    variables, out = _init_and_apply(model, x)
    assert out[0].dtype == jnp.float32  # logits are upcast at the head
    # params stay f32
    p = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in p)
