"""Device-mesh parallelism: sharding layout + collectives.

Replaces the reference's Lightning DDPStrategy over NCCL (main.py:901-919)
with a single jitted SPMD program over a jax.sharding.Mesh: params are
replicated, the batch is sharded over the 'data' axis, and XLA inserts the
gradient all-reduce over ICI.
"""
from .mesh import (
    init_distributed,
    is_main_process,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
from .tp import (
    make_mesh_2d,
    shard_params_tp,
    tp_param_specs,
)
