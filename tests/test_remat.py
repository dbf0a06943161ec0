"""Per-block rematerialization must not change the numerics."""
import pytest
import numpy as np

import jax
import jax.numpy as jnp

from medicalseg_tpu.models import VNet


@pytest.mark.slow
def test_remat_grads_match():
    import optax
    from medicalseg_tpu.core.state import TrainState, make_train_step
    from medicalseg_tpu.models.losses import DiceLoss

    losses = {"types": [DiceLoss()], "coef": [1.0]}
    tx = optax.sgd(1e-2)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 8, 8, 8, 1).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 2, (1, 8, 8, 8)).astype(np.int32))

    results = {}
    for remat in (False, True):
        model = VNet(in_channels=1, num_classes=2, remat=remat)
        state = TrainState.create(model, tx, images,
                                  jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(losses))
        state, metrics = step(state, images, labels,
                              jax.random.PRNGKey(1))
        results[remat] = (jax.device_get(state.params),
                          float(metrics["loss"]))

    assert abs(results[False][1] - results[True][1]) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(results[False][0]),
                    jax.tree_util.tree_leaves(results[True][0])):
        np.testing.assert_allclose(a, b, atol=1e-5)
