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

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "spmm",
    "gather_segment_mean",
    "segment_softmax_aggregate",
    "segment_mh_attention",
]


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


def segment_softmax_aggregate(
    csr, scores_src, scores_dst, values, num_dst, activation="leaky_relu"
):
    """Exact full-graph attention aggregation over CSR edges:
    out[v] = sum_{u in N(v)} softmax_u(act(s_src[u] + s_dst[v])) * values[u].

    Two-pass segment softmax (max, then exp-sum) — the TPU-native form of PyG's
    GATConv message passing used by `--conv gat` (`/root/reference/model/gnn.py:185-232`).
    """
    from .csr_search import csr_row_ids

    rows = csr_row_ids(csr)
    e = scores_src[csr.indices] + scores_dst[rows]
    if activation == "leaky_relu":
        e = jax.nn.leaky_relu(e, 0.2)
    e_max = jax.ops.segment_max(e, rows, num_segments=num_dst, indices_are_sorted=True)
    e_max = jnp.where(jnp.isfinite(e_max), e_max, 0.0)
    w = jnp.exp(e - e_max[rows])
    denom = segment_sum(w, rows, num_dst)
    alpha = w / jnp.maximum(denom[rows], 1e-12)
    return segment_sum(values[csr.indices] * alpha[:, None], rows, num_dst)


def segment_mh_attention(lp, x_self, other_x, csr, n_heads):
    """Exact full-graph multi-head dot-product attention (TransformerConv,
    `/root/reference/model/tgrec.py:161-171`) via per-head segment softmax."""
    from .csr_search import csr_row_ids

    d = x_self.shape[-1]
    dh = d // n_heads
    num_dst = x_self.shape[0]
    rows = csr_row_ids(csr)
    q = (x_self @ lp["wq"]).reshape(num_dst, n_heads, dh)
    k = (other_x @ lp["wk"]).reshape(other_x.shape[0], n_heads, dh)
    v = (other_x @ lp["wv"]).reshape(other_x.shape[0], n_heads, dh)
    e = jnp.sum(q[rows] * k[csr.indices], axis=-1) / jnp.sqrt(dh)  # [E, H]
    e_max = jax.ops.segment_max(e, rows, num_segments=num_dst, indices_are_sorted=True)
    e_max = jnp.where(jnp.isfinite(e_max), e_max, 0.0)
    w = jnp.exp(e - e_max[rows])
    denom = segment_sum(w, rows, num_dst)
    alpha = w / jnp.maximum(denom[rows], 1e-12)  # [E, H]
    out = segment_sum(v[csr.indices] * alpha[..., None], rows, num_dst)  # [N, H, dh]
    return out.reshape(num_dst, d)


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
