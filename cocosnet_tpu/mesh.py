"""Device mesh and sharding helpers.

The reference's only parallelism is single-process DataParallel over GPUs
with synchronized BatchNorm callbacks (trainers/pix2pix_trainer.py:23-26;
SURVEY §2.10). TPU-native replacement: a 1-D `data` mesh axis; the batch is
sharded over it, parameters are replicated, and XLA inserts the gradient
all-reduce and the (global) batch-stat reductions automatically when the
train step is jitted with these shardings. A `model` axis is reserved so
tensor-parallel sharding can be layered in without API changes.

Multi-host: call jax.distributed.initialize() before create_mesh() — the
mesh then spans all processes over DCN and the same code runs unchanged.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = 0, model: int = 1,
                devices=None) -> Mesh:
    """data=0 -> use all visible devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if data == 0:
        data = len(devices) // model
    devices = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(devices, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch dict with the batch dim sharded over `data`."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
