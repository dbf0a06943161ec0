"""Spatial partitioning correctness: convolutions over a volume sharded
on the H axis must equal the unsharded result (XLA inserts the halo
exchanges) — the volumetric analogue of context parallelism (SURVEY §5).
"""
import pytest
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


@pytest.mark.slow
def test_space_sharded_whole_volume_eval_matches_single_device():
    """VERDICT #6/weak-8: whole-volume eval through core.evaluate with a
    space=2 mesh (H axis sharded, XLA halo exchanges) must match the
    unsharded result."""
    import os
    import tempfile

    import optax

    from tools.generate_synthetic_dataset import generate
    from medicalseg_tpu.core import evaluate
    from medicalseg_tpu.core.state import TrainState
    from medicalseg_tpu.datasets import MedicalDataset
    from medicalseg_tpu.models import VNet
    from medicalseg_tpu.models.losses import DiceLoss
    from medicalseg_tpu.parallel import mesh as mesh_lib

    with tempfile.TemporaryDirectory() as root:
        phase0 = generate(root, num_volumes=4, size=16, seed=3,
                          val_frac=0.5)
        ds = MedicalDataset(dataset_root=phase0, result_dir=phase0,
                            transforms=[], num_classes=2, mode="val")
        state = TrainState.create(
            VNet(in_channels=1, num_classes=2), optax.sgd(1e-3),
            jnp.zeros((1, 16, 16, 16, 1)), jax.random.PRNGKey(0))
        losses = {"types": [DiceLoss()], "coef": [1]}

        serial = evaluate(state, ds, losses,
                          save_dir=os.path.join(root, "serial"))
        mesh = mesh_lib.build_mesh(data=2, space=2,
                                   devices=jax.devices()[:4])
        sharded = evaluate(state, ds, losses, mesh=mesh,
                           save_dir=os.path.join(root, "sharded"))
        np.testing.assert_allclose(sharded["mdice"], serial["mdice"],
                                   rtol=1e-4)
        a = np.load(os.path.join(root, "serial", "0", "pred.npy"))
        b = np.load(os.path.join(root, "sharded", "0", "pred.npy"))
        np.testing.assert_array_equal(a, b)
