"""Row-sharded embedding lookup under shard_map.

The (n+m) x d embedding tables dominate memory at production scale (SURVEY.md
§2.7 row: tensor parallelism is a NEW capability — the reference replicates all
tables per GPU under DDP). Here tables are row-sharded over the mesh ``model``
axis and lookups run as: each shard gathers the ids it owns (masked), then one
``psum`` over the model axis assembles full rows. XLA turns that into a
reduce-scatter-free single collective on ICI; the backward pass transposes to a
local scatter-add of the psum'd cotangent into owned rows only — so neither
direction materializes the full table on any chip.

``ids`` may additionally be sharded over the ``data`` axis (per-chip batch
shards); the lookup is then fully distributed in both axes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["sharded_embedding_lookup"]


def sharded_embedding_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh,
    ids_data_sharded: bool = True,
):
    """table: [V, d] row-sharded over MODEL_AXIS (V divisible by its size).
    ids: int array, optionally sharded over DATA_AXIS on axis 0.
    Returns gathered rows with ids' shape + (d,)."""
    model_size = mesh.shape[MODEL_AXIS]
    rows_per_shard = table.shape[0] // model_size

    def body(local_table, ids):
        shard = jax.lax.axis_index(MODEL_AXIS)
        local = ids - shard * rows_per_shard
        owned = (local >= 0) & (local < rows_per_shard)
        vals = local_table[jnp.clip(local, 0, rows_per_shard - 1)]
        vals = jnp.where(owned[..., None], vals, 0.0)
        return jax.lax.psum(vals, MODEL_AXIS)

    ids_spec = P(DATA_AXIS) if ids_data_sharded else P()
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), ids_spec),
        out_specs=ids_spec,
    )(table, ids)
