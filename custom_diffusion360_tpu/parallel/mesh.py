"""Mesh construction and sharding helpers.

The framework's parallelism model (SURVEY §2.4): the reference only uses data
parallelism (4-GPU DDP); here DP is a batch-axis sharding over a 1-D 'data'
mesh. The design leaves room for more axes (the natural extra shards for
FeatureNeRF are the reference-view axis and the hw token grid — both fully
data-parallel with a single softmax psum over views), but DP already covers
reference parity.

Multi-host: init_distributed() (jax.distributed.initialize) before
make_mesh(); device order follows jax.devices() so the data axis rides ICI
within a slice. Under multiple processes shard_batch/replicate assemble
global arrays from per-process data (each process feeds its local batch
rows — the DDP per-rank loader split, main.py:901-919), and is_main_process
gates checkpoint/metric/image writes (the reference's @rank_zero_only).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (NCCL init equivalent, main.py:901-919). With no
    arguments JAX auto-detects from the TPU environment metadata."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def is_main_process() -> bool:
    """rank-zero gate for writes (reference @rank_zero_only, main.py:407)."""
    return jax.process_index() == 0


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
    over the mesh (replaces the DDP per-rank dataloader split).

    Single-process: device_put of the full batch. Multi-process: each process
    passes its LOCAL batch rows (global batch = local rows concatenated in
    process order) and a global array is assembled without cross-host copies.
    """
    sh = batch_sharding(mesh, axis)
    multi = jax.process_count() > 1

    def put(x):
        if x is None:
            return None
        if multi:
            x = np.asarray(x)
            if x.ndim == 0:
                return jax.make_array_from_process_local_data(
                    replicated_sharding(mesh), x
                )
            return jax.make_array_from_process_local_data(sh, x)
        x = jax.numpy.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate params/opt-state across the mesh (every process must hold
    identical values — guaranteed by deterministic init / checkpoint load)."""
    sh = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(jax.numpy.asarray(x), sh), tree)
