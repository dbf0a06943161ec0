# Copyright 2026. Apache License 2.0.
"""Device mesh & sharding — the TPU-native replacement for fleet/NCCL.

The reference scales with paddle.distributed.fleet collective DP (NCCL
allreduce of grads + SyncBatchNorm + DistributedBatchSampler, SURVEY
§2.8). Here parallelism is declarative: a ``jax.sharding.Mesh`` with
named axes

  * ``data``  — batch (data parallel); gradients and BatchNorm batch
    statistics become *global* reductions automatically because the loss
    / BN means are computed over the globally-sharded batch axis inside
    one jit — XLA inserts the psum/pmean collectives over ICI.
  * ``space`` — spatial partitioning of the volume's H axis (the
    volumetric analogue of sequence/context parallelism): XLA's SPMD
    partitioner inserts halo exchanges for the 5^3 convolutions, letting
    whole-volume inference/training exceed single-chip HBM.

No hand-written collectives are needed for the capability surface; the
mesh module is the single place topology is decided.
"""

from typing import Optional

import numpy as np

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(data: Optional[int] = None, space: int = 1,
               devices=None) -> Mesh:
    """Create a ("data", "space") mesh.

    Args:
        data: size of the data axis; default = n_devices // space.
        space: size of the spatial axis (1 = pure DP).
        devices: optional explicit device list.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        if n % space != 0:
            raise ValueError(
                "device count {} not divisible by space={}".format(n, space))
        data = n // space
    if data * space != n:
        raise ValueError(
            "data({}) x space({}) != device count {}".format(data, space, n))
    dev_array = mesh_utils.create_device_mesh((data, space),
                                              devices=devices)
    return Mesh(dev_array, ("data", "space"))


def batch_spec(mesh: Mesh, spatial_axis: Optional[int] = 2) -> P:
    """PartitionSpec for an [N, D, H, W, (C)] batch: N over 'data', and
    (when the mesh has a nontrivial 'space' axis) the H axis over
    'space'."""
    if mesh.shape["space"] > 1 and spatial_axis is not None:
        parts = [None] * 5
        parts[0] = "data"
        parts[spatial_axis] = "space"
        return P(*parts)
    return P("data")


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = 2):
    return NamedSharding(mesh, batch_spec(mesh, spatial_axis))


def label_sharding(mesh: Mesh, spatial_axis: Optional[int] = 2):
    """[N, D, H, W] integer labels: same layout, no channel axis."""
    if mesh.shape["space"] > 1 and spatial_axis is not None:
        parts = [None] * 4
        parts[0] = "data"
        parts[spatial_axis] = "space"
        return NamedSharding(mesh, P(*parts))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def stacked_sharding(mesh: Mesh, sharding: NamedSharding):
    """``sharding`` with an extra leading unsharded axis — the layout of
    the [n_steps, ...] super-batches fed to the multi-step scan
    (core/state.make_multi_step)."""
    return NamedSharding(mesh, P(None, *sharding.spec))


def shard_batch(mesh: Mesh, images, labels, spatial_axis: Optional[int] = 2):
    """Place a host batch onto the mesh with batch(+spatial) sharding."""
    img_sh = batch_sharding(mesh, spatial_axis if np.ndim(images) == 5
                            else None)
    if np.ndim(images) == 4:
        img_sh = label_sharding(mesh, spatial_axis)
    images = jax.device_put(images, img_sh)
    labels = jax.device_put(labels, label_sharding(mesh, spatial_axis))
    return images, labels


def process_shard(num_items: int):
    """Per-host slice of a dataset index range (replaces
    DistributedBatchSampler's per-rank sharding at the host level;
    device-level sharding is handled by the mesh)."""
    pid, nproc = jax.process_index(), jax.process_count()
    per = int(np.ceil(num_items / nproc))
    start = pid * per
    return start, min(start + per, num_items)
