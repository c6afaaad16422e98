"""Static-shape graph representations for TPU.

The reference keeps the interaction graph as ragged Python structures — a
list-of-arrays ``allPos`` (`/root/reference/dataloader.py:129`), COO arrays, and a
scipy CSR normalized adjacency cached to disk
(`/root/reference/dataloader.py:195-258`). Ragged data cannot be traced by XLA, so
here everything is re-designed as **static-shape padded/sorted arrays**:

- ``CSR``: ``indptr`` + flat ``indices`` with **indices sorted within each row**.
  Sorted rows turn membership tests (the reference's ``negitem in posForUser``
  rejection loop, `/root/reference/negative_sample.py:121-126`) into fixed-depth
  vectorized binary searches on device.
- ``COOEdges``: edge list **sorted by destination**, so that graph propagation is a
  ``segment_sum`` with ``indices_are_sorted=True`` — the TPU-efficient replacement
  for cuSPARSE SpMM (`/root/reference/model/MF.py:200-204`) and torch-scatter
  aggregation (`/root/reference/model/graphsage.py:320`).

Host-side construction is numpy; the ``device()`` methods return jnp pytrees.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import TYPE_CHECKING, Optional

import jax
import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:
    from ..ops.cuckoo import CuckooSet
    from ..ops.padded_adj import PaddedAdjPair

__all__ = ["CSR", "COOEdges", "BipartiteGraph", "build_bipartite_graph", "build_relational_graph"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CSR:
    """Compressed sparse rows with row-sorted indices.

    indptr:  [num_rows + 1] int32
    indices: [nnz] int32 — sorted ascending within each row
    """

    indptr: jnp.ndarray
    indices: jnp.ndarray

    @property
    def num_rows(self) -> int:
        return self.indptr.shape[0] - 1

    @property
    def nnz(self) -> int:
        return self.indices.shape[0]

    def degrees(self) -> jnp.ndarray:
        return self.indptr[1:] - self.indptr[:-1]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class COOEdges:
    """Destination-sorted weighted edge list over a single node id space.

    src, dst: [E] int32, sorted by dst ascending.
    weight:   [E] float32 (e.g. symmetric normalization 1/sqrt(d_src * d_dst)).
    """

    src: jnp.ndarray
    dst: jnp.ndarray
    weight: jnp.ndarray

    @property
    def num_edges(self) -> int:
        return self.src.shape[0]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BipartiteGraph:
    """The full device-resident training graph.

    Joint node space convention (same as the reference's PyG models,
    `/root/reference/model/lgcn.py:53-61`): users are ``[0, n_users)``, items are
    ``[n_users, n_users + m_items)``.
    """

    n_users: int = dataclasses.field(metadata=dict(static=True))
    m_items: int = dataclasses.field(metadata=dict(static=True))

    # user -> item adjacency (item ids in [0, m_items)), and its transpose
    user_pos: CSR
    item_pos: CSR

    # test interactions as user -> item CSR (ragged testDict made static;
    # reference: `/root/reference/dataloader.py:260-272` __build_test)
    test_pos: CSR

    # symmetric-normalized bidirectional edges over the joint node space,
    # destination-sorted (replaces s_pre_adj_mat.npz,
    # `/root/reference/dataloader.py:195-258`)
    norm_edges: COOEdges

    # degree-bucketed padded adjacencies (scatter-free SpMM; ops/padded_adj.py):
    # norm_padded — A_hat over the joint space (symmetric, self-transpose);
    # user_agg / item_agg — 1/deg mean aggregation per direction (+ transposes)
    norm_padded: Optional["PaddedAdjPair"] = None
    user_agg: Optional["PaddedAdjPair"] = None
    item_agg: Optional["PaddedAdjPair"] = None

    # permutation taking per-edge arrays from user_pos CSR order to item_pos CSR
    # order (for edge features: timestamps, relation labels)
    item_edge_perm: Optional[jnp.ndarray] = None

    # MESSAGE-PASSING edge set when it differs from the train interactions:
    # RSAGE concatenates purchase + favorite + review edges for propagation
    # (`/root/reference/model/rsage.py:168-207`) while BPR positives and eval
    # masking stay purchase-only. None -> propagation uses user_pos/item_pos.
    msg_user_pos: Optional[CSR] = None
    msg_item_pos: Optional[CSR] = None
    msg_item_edge_perm: Optional[jnp.ndarray] = None

    # cuckoo membership set over the train (user, item) pairs: the sampler's
    # negative-rejection test in 2 independent gathers instead of a
    # log2(max_degree)-deep dependent binary-search chain (ops/cuckoo.py)
    pos_hash: Optional["CuckooSet"] = None

    # [nnz] user id of each user_pos CSR entry: the weighted edge sampler's
    # edge->user recovery as ONE flat gather instead of a log2(nnz)-deep
    # dependent searchsorted chain per draw (sampling/bpr.py edge_alias path)
    user_pos_row: Optional[jnp.ndarray] = None

    #: static max row lengths — tight bounds for binary-search depth and eval
    #: padding (0 = unknown; consumers fall back to conservative defaults)
    max_user_degree: int = dataclasses.field(metadata=dict(static=True), default=0)
    max_test_degree: int = dataclasses.field(metadata=dict(static=True), default=0)

    # -- propagation accessors: message CSRs when present, train CSRs otherwise --
    @property
    def prop_user_pos(self) -> CSR:
        return self.msg_user_pos if self.msg_user_pos is not None else self.user_pos

    @property
    def prop_item_pos(self) -> CSR:
        return self.msg_item_pos if self.msg_item_pos is not None else self.item_pos

    @property
    def prop_item_edge_perm(self) -> Optional[jnp.ndarray]:
        return (
            self.msg_item_edge_perm
            if self.msg_item_edge_perm is not None
            else self.item_edge_perm
        )

    @property
    def num_nodes(self) -> int:
        return self.n_users + self.m_items

    @property
    def train_size(self) -> int:
        return self.user_pos.nnz

    def user_degrees(self) -> jnp.ndarray:
        return self.user_pos.degrees()

    def item_degrees(self) -> jnp.ndarray:
        return self.item_pos.degrees()


def _csr_from_coo(rows: np.ndarray, cols: np.ndarray, num_rows: int) -> tuple[np.ndarray, np.ndarray]:
    """Build (indptr, row-sorted indices) from COO pairs. Duplicates are kept."""
    order = np.lexsort((cols, rows))
    rows_s = rows[order]
    cols_s = cols[order].astype(np.int32)
    counts = np.bincount(rows_s, minlength=num_rows)
    indptr = np.zeros(num_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=indptr[1:])
    return indptr, cols_s


def build_bipartite_graph(
    train_user: np.ndarray,
    train_item: np.ndarray,
    test_user: np.ndarray,
    test_item: np.ndarray,
    n_users: int,
    m_items: int,
    padded: bool = True,
    hub_count: int = 1024,
    dst_hub_count: int = 1024,
    hub_mem_budget: int = 512 * 1024 * 1024,
    extra_edges=None,  # [(u_arr, i_arr), ...] additional relation edge sets
) -> BipartiteGraph:
    """Construct the device graph from COO interaction arrays.

    Computes the symmetric normalization D^-1/2 (A) D^-1/2 over the (n+m)^2
    bipartite block matrix exactly like `Loader.getSparseGraph`
    (`/root/reference/dataloader.py:219-237`), but emits destination-sorted COO
    instead of a scipy CSR, and never materializes the dense degree matrix.
    """
    train_user = np.asarray(train_user, dtype=np.int64)
    train_item = np.asarray(train_item, dtype=np.int64)
    test_user = np.asarray(test_user, dtype=np.int64)
    test_item = np.asarray(test_item, dtype=np.int64)

    up_indptr, up_indices = _csr_from_coo(train_user, train_item, n_users)
    ip_indptr, ip_indices = _csr_from_coo(train_item, train_user, m_items)
    tp_indptr, tp_indices = _csr_from_coo(test_user, test_item, n_users)

    # edge-feature permutation: user-order -> item-order
    order_u = np.lexsort((train_item, train_user))
    order_i = np.lexsort((train_user, train_item))
    inv_order_u = np.empty(len(order_u), np.int64)
    inv_order_u[order_u] = np.arange(len(order_u))
    item_edge_perm = inv_order_u[order_i].astype(np.int32)

    # joint-space bidirectional edges
    src = np.concatenate([train_user, train_item + n_users]).astype(np.int64)
    dst = np.concatenate([train_item + n_users, train_user]).astype(np.int64)
    deg = np.bincount(
        np.concatenate([train_user, train_item + n_users]), minlength=n_users + m_items
    ).astype(np.float64)
    d_inv_sqrt = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1.0)), 0.0)
    weight = (d_inv_sqrt[src] * d_inv_sqrt[dst]).astype(np.float32)

    order = np.argsort(dst, kind="stable")
    src, dst, weight = src[order], dst[order], weight[order]

    # message-passing edge set: train edges plus any extra relation edge sets
    # (RSAGE purchase+favorite+review, /root/reference/model/rsage.py:168-207)
    msg_user = train_user
    msg_item = train_item
    msg_user_pos = msg_item_pos = None
    msg_item_edge_perm = None
    if extra_edges:
        msg_user = np.concatenate(
            [train_user] + [np.asarray(u, dtype=np.int64) for u, _ in extra_edges]
        )
        msg_item = np.concatenate(
            [train_item] + [np.asarray(i, dtype=np.int64) for _, i in extra_edges]
        )
        mu_indptr, mu_indices = _csr_from_coo(msg_user, msg_item, n_users)
        mi_indptr, mi_indices = _csr_from_coo(msg_item, msg_user, m_items)
        m_order_u = np.lexsort((msg_item, msg_user))
        m_order_i = np.lexsort((msg_user, msg_item))
        m_inv_u = np.empty(len(m_order_u), np.int64)
        m_inv_u[m_order_u] = np.arange(len(m_order_u))
        msg_item_edge_perm = m_inv_u[m_order_i].astype(np.int32)
        msg_user_pos = CSR(jnp.asarray(mu_indptr), jnp.asarray(mu_indices))
        msg_item_pos = CSR(jnp.asarray(mi_indptr), jnp.asarray(mi_indices))

    norm_padded = user_agg = item_agg = None
    if padded:
        from ..ops.padded_adj import PaddedAdjPair, build_padded_adj, build_padded_pair

        # hub_count: Zipf hub sources go through a dense bf16 MXU block instead
        # of random gathers (ops/padded_adj.py; measured 1.66x on fwd+bwd).
        # dst_hub_count: hot destinations' whole rows ride the MXU too
        # (measured ladder in PERF.md "dst-hub").
        n_nodes = n_users + m_items
        sym = build_padded_adj(
            src, dst, weight, n_nodes,
            hub_count=hub_count, dst_hub_count=dst_hub_count, num_src=n_nodes,
            hub_mem_budget=hub_mem_budget,
        )
        norm_padded = PaddedAdjPair(fwd=sym, bwd=sym)  # symmetric: A^T = A
        # mean aggregation runs over the MESSAGE edges (== train edges unless
        # extra relation edge sets are present)
        deg_u = np.maximum(np.bincount(msg_user, minlength=n_users), 1)
        deg_i = np.maximum(np.bincount(msg_item, minlength=m_items), 1)
        w_mean_u = (1.0 / deg_u[msg_user]).astype(np.float32)
        user_agg = build_padded_pair(
            msg_item, msg_user, w_mean_u, n_users, m_items,
            hub_count=hub_count, dst_hub_count=dst_hub_count,
            hub_mem_budget=hub_mem_budget,
        )
        w_mean_i = (1.0 / deg_i[msg_item]).astype(np.float32)
        item_agg = build_padded_pair(
            msg_user, msg_item, w_mean_i, m_items, n_users,
            hub_count=hub_count, dst_hub_count=dst_hub_count,
            hub_mem_budget=hub_mem_budget,
        )

    from ..ops.cuckoo import build_cuckoo_set

    dev = jnp.asarray
    return BipartiteGraph(
        n_users=int(n_users),
        m_items=int(m_items),
        user_pos=CSR(dev(up_indptr), dev(up_indices)),
        item_pos=CSR(dev(ip_indptr), dev(ip_indices)),
        test_pos=CSR(dev(tp_indptr), dev(tp_indices)),
        norm_edges=COOEdges(
            dev(src.astype(np.int32)), dev(dst.astype(np.int32)), dev(weight)
        ),
        norm_padded=norm_padded,
        user_agg=user_agg,
        item_agg=item_agg,
        item_edge_perm=dev(item_edge_perm),
        msg_user_pos=msg_user_pos,
        msg_item_pos=msg_item_pos,
        msg_item_edge_perm=None if msg_item_edge_perm is None else dev(msg_item_edge_perm),
        pos_hash=build_cuckoo_set(train_user, train_item),
        user_pos_row=dev(
            np.repeat(
                np.arange(n_users, dtype=np.int32), up_indptr[1:] - up_indptr[:-1]
            )
        ),
        max_user_degree=int((up_indptr[1:] - up_indptr[:-1]).max(initial=0)),
        max_test_degree=int((tp_indptr[1:] - tp_indptr[:-1]).max(initial=0)),
    )


def build_relational_graph(dataset, relation_edges):
    """(graph, edge_label) for multi-relational models: message CSRs over
    purchase + extra relation edges; labels 0 = purchase, k = k-th extra set
    (`/root/reference/model/rsage.py:204-207`), in msg user-CSR edge order —
    the alignment `FeatureStore.edge_label` consumers expect."""
    graph = build_bipartite_graph(
        dataset.train_user,
        dataset.train_item,
        dataset.test_user,
        dataset.test_item,
        dataset.n_users,
        dataset.m_items,
        extra_edges=relation_edges,
    )
    msg_user = np.concatenate(
        [dataset.train_user] + [np.asarray(u, dtype=np.int64) for u, _ in relation_edges]
    )
    msg_item = np.concatenate(
        [dataset.train_item] + [np.asarray(i, dtype=np.int64) for _, i in relation_edges]
    )
    labels = np.concatenate(
        [np.zeros(len(dataset.train_user), np.int32)]
        + [
            np.full(len(u), k + 1, np.int32)
            for k, (u, _) in enumerate(relation_edges)
        ]
    )
    order = np.lexsort((msg_item, msg_user))  # same sort as _csr_from_coo
    return graph, jnp.asarray(labels[order])
