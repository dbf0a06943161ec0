"""Spatial partitioning correctness: convolutions over a volume sharded
on the H axis must equal the unsharded result (XLA inserts the halo
exchanges) — the volumetric analogue of context parallelism (SURVEY §5).
"""
import numpy as np

import jax
import jax.numpy as jnp

from medicalseg_tpu.parallel import mesh as mesh_lib
from tests._mini_model import MiniSegNet


def test_spatial_sharded_forward_matches():
    model = MiniSegNet(num_classes=2)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 8, 16, 8, 1).astype(np.float32)
    variables = jax.jit(
        lambda k, v: model.init(k, v, train=False))(jax.random.PRNGKey(0),
                                                    jnp.asarray(x))

    ref = jax.jit(lambda v, a: model.apply(v, a, train=False))(
        variables, jnp.asarray(x))[0]

    mesh = mesh_lib.build_mesh(data=2, space=2,
                               devices=jax.devices()[:4])
    fwd = jax.jit(lambda v, a: model.apply(v, a, train=False),
                  in_shardings=(mesh_lib.replicated(mesh),
                                mesh_lib.batch_sharding(mesh)))
    with mesh:
        xs = jax.device_put(x, mesh_lib.batch_sharding(mesh))
        out = fwd(variables, xs)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_spatial_sharded_train_step_runs():
    import optax
    from medicalseg_tpu.core.state import TrainState, make_train_step
    from medicalseg_tpu.models.losses import DiceLoss

    model = MiniSegNet(num_classes=2)
    losses = {"types": [DiceLoss()], "coef": [1.0]}
    tx = optax.sgd(1e-2)
    mesh = mesh_lib.build_mesh(data=2, space=2,
                               devices=jax.devices()[:4])
    rng = np.random.RandomState(1)
    images = rng.rand(2, 8, 16, 8, 1).astype(np.float32)
    labels = rng.randint(0, 2, (2, 8, 16, 8)).astype(np.int32)
    state = TrainState.create(model, tx, jnp.asarray(images),
                              jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(losses),
                   in_shardings=(mesh_lib.replicated(mesh),
                                 mesh_lib.batch_sharding(mesh),
                                 mesh_lib.label_sharding(mesh), None))
    with mesh:
        im, lab = mesh_lib.shard_batch(mesh, images, labels)
        state, metrics = step(state, im, lab, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
