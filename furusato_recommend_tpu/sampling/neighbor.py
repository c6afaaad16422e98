"""On-device fanout neighbor sampling (static shapes).

Replaces both the reference's custom CPU sampler (`uniform_neighbors`,
`/root/reference/neighbor_sampling.py:14-119`: with-replacement
``np.random.choice(allPos[n], num_neighbors)`` per node, flat array + offsets,
parallelized over 16 processes) and the PyG C++ `NeighborSampler` used in every
SAGE-family ``OneEpoch`` (`/root/reference/model/graphsage.py:342-365`).

TPU design: with-replacement fanout from a row-sorted CSR is one vectorized
modulo-gather: r ~ U[0, deg), neighbor = indices[start + r]. Shapes are fully
static ([B, F], [B, F, F], ...); zero-degree nodes yield a per-node invalid mask
(their aggregation contributes 0, matching PyG's empty-neighborhood behavior).

Sampling returns the flat CSR *positions* of the sampled edges too, so models
can gather aligned per-edge features (timestamps for the temporal models,
relation labels for RSAGE).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..data.graph import CSR

__all__ = ["SampledNeighbors", "sample_neighbors", "sample_tree"]


class SampledNeighbors(NamedTuple):
    ids: jnp.ndarray  # [..., F] int32 neighbor node ids
    edge_pos: jnp.ndarray  # [..., F] int32 position in csr.indices (for edge feats)
    has_neighbors: jnp.ndarray  # [...] bool — False for zero-degree nodes


def sample_neighbors(key: jax.Array, csr: CSR, nodes: jnp.ndarray, fanout: int) -> SampledNeighbors:
    nnz = csr.indices.shape[0]
    # flat gathers: multi-dim-shaped scalar gathers lower ~6x worse on TPU
    # (ops/csr_search.py lower_bound; PERF.md "sampler probes")
    nodes_f = nodes.ravel()
    start = csr.indptr[nodes_f]
    deg = csr.indptr[nodes_f + 1] - start
    r = jax.random.randint(key, (nodes_f.shape[0], fanout), 0, 1 << 30)
    r = r % jnp.maximum(deg, 1)[:, None]
    pos = jnp.clip(start[:, None] + r, 0, max(nnz - 1, 0))
    ids = csr.indices[pos.ravel()].reshape(nodes.shape + (fanout,))
    return SampledNeighbors(
        ids=ids,
        edge_pos=pos.astype(jnp.int32).reshape(nodes.shape + (fanout,)),
        has_neighbors=(deg > 0).reshape(nodes.shape),
    )


def sample_tree(
    key: jax.Array, csr: CSR, seeds: jnp.ndarray, fanout: int, num_layers: int
) -> List[SampledNeighbors]:
    """k-hop fanout tree: level l has shape seeds.shape + (F,)*l.

    Returns a list of num_layers SampledNeighbors; level l's ids are the
    sampled neighbors of level l-1's nodes (level 0 = seeds themselves is not
    included — callers already have it).
    """
    out: List[SampledNeighbors] = []
    frontier = seeds
    for l in range(num_layers):
        key, k = jax.random.split(key)
        s = sample_neighbors(k, csr, frontier, fanout)
        out.append(s)
        frontier = s.ids
    return out
