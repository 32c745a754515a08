"""Tensor parallelism: 2-D (data x model) mesh via GSPMD param shardings.

Beyond-reference capability (the reference is DP-only, SURVEY §2.4): the
transformer projections — where the 1024^2 sampling step's FLOPs live —
shard Megatron-style over a "model" mesh axis purely through
jax.sharding annotations on the weight pytree. XLA's SPMD partitioner
inserts the collectives (an all-reduce after each row-parallel to_out/ff-out
matmul); the model code is unchanged.

Column-parallel (output axis over "model"): attention to_q/to_k/to_v (and
the inference-fused to_qkv/to_kv) and the GEGLU ff "proj". Row-parallel
(input axis over "model"): attention to_out and ff "out". Everything else
(convs, norms, embeddings, NeRF MLPs) replicates — they are a small
fraction of step FLOPs and the NeRF path prefers the batch/view sharding.

Dims that do not divide the model-axis size fall back to replicated, so the
same spec builder works for any config. Compose with DP by sharding the
batch over "data" (parallel.shard_batch) as usual.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL = {"to_q", "to_k", "to_v", "to_qkv", "to_kv"}  # + ff "proj"
_ROW = {"to_out"}  # + ff "out"


def make_mesh_2d(n_data: int, n_model: int,
                 axes=("data", "model")) -> Mesh:
    devices = jax.devices()[: n_data * n_model]
    assert len(devices) == n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(jax.devices())}"
    )
    return Mesh(np.asarray(devices).reshape(n_data, n_model), axes)


def _names(path):
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(f"[{k.idx}]")
    return out


def tp_param_specs(params, n_model: int, axis: str = "model"):
    """PartitionSpec pytree for the param tree (use with NamedSharding /
    jax.device_put). Leaves whose sharded dim is not divisible by
    ``n_model`` stay replicated."""

    def spec(path, leaf):
        names = _names(path)
        if not hasattr(leaf, "ndim") or leaf.ndim == 0 or len(names) < 2:
            return P()
        name, last = names[-2], names[-1]
        parent = names[-3] if len(names) >= 3 else ""
        col = name in _COL or (name == "proj" and parent == "ff")
        row = name in _ROW or (name == "out" and parent == "ff")
        if last == "w" and leaf.ndim == 2:
            if col and leaf.shape[1] % n_model == 0:
                return P(None, axis)
            if row and leaf.shape[0] % n_model == 0:
                return P(axis, None)
        if last == "b" and leaf.ndim == 1 and col and (
            leaf.shape[0] % n_model == 0
        ):
            return P(axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params, mesh: Mesh, specs=None,
                    axis: str = "model"):
    """Place a param pytree on the 2-D mesh with TP shardings (model
    weights split over ``axis``, everything else replicated across the
    whole mesh)."""
    if specs is None:
        specs = tp_param_specs(params, mesh.shape[axis], axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(
            jax.numpy.asarray(x), NamedSharding(mesh, s)
        ),
        params,
        specs,
    )
