"""Segment aggregation ops — the TPU-native slot of torch-scatter.

Reference usages being replaced (SURVEY.md §2.6):
- `scatter(..., reduce="mean")` SAGE aggregation (`/root/reference/model/graphsage.py:320`),
- `scatter_max` recency gating (`/root/reference/model/sasgnn.py:357`),
- `torch.sparse.mm` LightGCN propagation (`/root/reference/model/MF.py:200-204`).

All call sites in this framework pass **destination-sorted** edge arrays (see
`data/graph.py`), so `indices_are_sorted=True` lets XLA lower to an efficient
blocked reduction instead of a general scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.graph import COOEdges

__all__ = ["segment_sum", "segment_mean", "segment_max", "spmm", "gather_segment_mean"]


def segment_sum(data, segment_ids, num_segments, sorted_ids=True):
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )


def segment_mean(data, segment_ids, num_segments, sorted_ids=True):
    s = segment_sum(data, segment_ids, num_segments, sorted_ids)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments, sorted_ids)
    return s / jnp.maximum(cnt, 1.0)[..., None] if s.ndim > 1 else s / jnp.maximum(cnt, 1.0)


def segment_max(data, segment_ids, num_segments, sorted_ids=True):
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )


def spmm(edges: COOEdges, x: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """y[dst] += w * x[src] over a destination-sorted weighted edge list.

    Replaces cuSPARSE `torch.sparse.mm(A_hat, x)`
    (`/root/reference/model/MF.py:200-204`). The gather feeds the MXU-friendly
    dense x; the reduction is a sorted segment_sum.
    """
    msg = x[edges.src] * edges.weight[:, None].astype(x.dtype)
    return segment_sum(msg, edges.dst, num_nodes, sorted_ids=True)


def gather_segment_mean(
    x: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    num_segments: int,
    sorted_ids: bool = True,
) -> jnp.ndarray:
    """mean_{e: dst(e)=v} x[src(e)] — the SAGE mean-aggregator
    (`/root/reference/model/graphsage.py:311-324`) as one fused gather+reduce."""
    msg = x[src]
    return segment_mean(msg, dst, num_segments, sorted_ids=sorted_ids)
