"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL process groups
(`/root/reference/ddp.py:884-891`) and `nn.DataParallel`
(`/root/reference/trainer.py:41-44`): one global ``jax.sharding.Mesh`` with a
``data`` axis (batch sharding — the DDP capability) and a ``model`` axis
(embedding-table row sharding — a new capability, SURVEY.md §2.7). Gradient
all-reduce and table all-gathers are XLA-inserted collectives over ICI; the
reference's explicit ``dist.barrier()`` calls disappear into SPMD program order.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "batch_sharding", "table_sharding", "shard_params"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = 1, model: int = 1, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * model
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis (per-host batch shards — the
    TPU analogue of DistributedSampler sharding, /root/reference/model/ddp_sage.py:319-362)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def table_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Row-shard an embedding table / feature matrix over the model axis."""
    return NamedSharding(mesh, P(MODEL_AXIS, *([None] * (ndim - 1))))


def shard_params(params, mesh: Mesh, min_rows: int = 1024):
    """Place a parameter pytree on the mesh: 2D arrays with a large leading axis
    divisible by the model-axis size are row-sharded; everything else replicated.
    """
    model_size = mesh.shape[MODEL_AXIS]

    def place(x):
        if (
            hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[0] >= min_rows
            and x.shape[0] % model_size == 0
        ):
            return jax.device_put(x, table_sharding(mesh, x.ndim))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, params)
