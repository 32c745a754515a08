"""Mesh construction and sharding helpers.

The framework's parallelism model (SURVEY §2.4): the reference only uses data
parallelism (4-GPU DDP); here DP is a batch-axis sharding over a 1-D 'data'
mesh. The design leaves room for more axes (the natural extra shards for
FeatureNeRF are the reference-view axis and the hw token grid — both fully
data-parallel with a single softmax psum over views), but DP already covers
reference parity.

Multi-host: call jax.distributed.initialize() before make_mesh(); device
order follows jax.devices() so the data axis rides ICI within a slice.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array leaf of a batch pytree with its leading axis sharded
    over the mesh (replaces the DDP per-rank dataloader split)."""
    sh = batch_sharding(mesh, axis)

    def put(x):
        if x is None:
            return None
        x = jax.numpy.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate params/opt-state across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(jax.numpy.asarray(x), sh), tree)
