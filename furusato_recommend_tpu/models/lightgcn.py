"""LightGCN family: lgn / radj / rgcn / lgcnssm capabilities in one model.

Reference variants covered (SURVEY.md §2.3):
- `LightGCN` spmm flavor (`/root/reference/model/MF.py:115-286`) and PyG flavor
  (`/root/reference/model/lgcn.py:44-151`): layerwise propagation over the
  symmetric-normalized bipartite adjacency, mean over layer outputs.
- `rAdjGCN` (`/root/reference/model/radj.py:47-154`): asymmetric normalization
  deg(src)^-r * deg(dst)^-(1-r), selected here with ``norm="asym"`` + config.r.
- `RGCN` (`/root/reference/model/rgcn.py:45-178`): a hand-rolled scatter clone of
  LightGCN — numerically identical to lgn here, kept as a registry alias.
- `LightGCNSSM` (`/root/reference/model/lgcnssm.py:44-153`): LightGCN with a
  sampled-softmax-style loss; exposed via ``loss_mode="softmax"``.
- sparse edge dropout (`__dropout_x`, `/root/reference/model/MF.py:158-167`).

TPU design: propagation is ``spmm`` = gather + destination-sorted segment_sum
over the joint (n+m) node space; the `A_split` row-fold machinery of the
reference (a GPU-memory workaround) is subsumed by sharding the edge list over
the mesh instead.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.graph import BipartiteGraph, COOEdges
from ..ops.padded_adj import padded_spmm
from ..ops.segment import spmm
from .base import PairwiseModel, Params, bpr_loss_from_scores, l2_ego

__all__ = ["LightGCN"]


class LightGCN(PairwiseModel):
    name = "lgn"

    def __init__(
        self,
        config: Config,
        graph: BipartiteGraph,
        norm: str = "sym",
        loss_mode: str = "bpr",
        pretrained=None,
    ):
        super().__init__(config, graph)
        self.dim = config.latent_dim
        self.n_layers = config.n_layers
        self.norm = norm
        self.loss_mode = loss_mode
        self.pretrained = pretrained  # --pretrain (/root/reference/model/MF.py:136-151)

    def _init(self, key: jax.Array) -> Params:
        if self.pretrained is not None:
            u, i = self.pretrained
            return {
                "user_emb": jnp.asarray(u, jnp.float32),
                "item_emb": jnp.asarray(i, jnp.float32),
            }
        ku, ki = jax.random.split(key)
        # normal(std=0.1) matching the reference's trained-from-scratch branch
        # (`/root/reference/model/MF.py:131-135`)
        return {
            "user_emb": 0.1 * jax.random.normal(ku, (self.n_users, self.dim), jnp.float32),
            "item_emb": 0.1 * jax.random.normal(ki, (self.m_items, self.dim), jnp.float32),
        }

    # -- propagation --
    def _edges(self, graph: BipartiteGraph) -> COOEdges:
        e = graph.norm_edges
        if self.norm == "sym":
            return e
        # asymmetric r-normalization (rAdjConv, /root/reference/model/radj.py:12-44):
        # w = deg(src)^-r * deg(dst)^-(1-r). norm_edges stores d_src^-1/2 d_dst^-1/2
        # so recompute from degrees.
        deg_u = graph.user_degrees()
        deg_i = graph.item_degrees()
        deg = jnp.concatenate([deg_u, deg_i]).astype(jnp.float32)
        deg = jnp.maximum(deg, 1.0)
        r = self.config.r
        w = deg[e.src] ** (-r) * deg[e.dst] ** (-(1.0 - r))
        zero = (graph.user_degrees()[jnp.clip(e.src, 0, graph.n_users - 1)] == 0) & (
            e.src < graph.n_users
        )
        del zero  # zero-degree nodes already emit no edges
        return COOEdges(e.src, e.dst, w)

    def _dropout_edges(self, edges: COOEdges, key: jax.Array) -> COOEdges:
        """Sparse dropout on A-hat (`/root/reference/model/MF.py:158-167`):
        keep each edge with prob keep_prob, scale weights by 1/keep_prob."""
        keep = self.config.keep_prob
        mask = jax.random.bernoulli(key, keep, (edges.num_edges,))
        w = jnp.where(mask, edges.weight / keep, 0.0)
        return COOEdges(edges.src, edges.dst, w)

    def propagate(self, params: Params, graph: BipartiteGraph, key=None):
        # fast path: scatter-free padded SpMM with transpose-VJP (sym norm, no
        # per-step edge dropout; see ops/padded_adj.py microbench numbers)
        use_padded = (
            graph.norm_padded is not None
            and self.norm == "sym"
            and not (self.config.dropout and key is not None)
        )
        if use_padded:
            step = lambda h: padded_spmm(graph.norm_padded, h, self.compute_dtype)
        else:
            edges = self._edges(graph)
            if self.config.dropout and key is not None:
                edges = self._dropout_edges(edges, key)
            step = lambda h: spmm(edges, h, graph.num_nodes)
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        acc = x
        h = x
        for _ in range(self.n_layers):
            h = step(h)
            acc = acc + h
        out = acc / (self.n_layers + 1)
        return out[: self.n_users], out[self.n_users :]

    # -- loss --
    def loss(self, params, graph, batch, key):
        user_emb, item_emb = self.propagate(params, graph, key)
        u = user_emb[batch.user]
        p = item_emb[batch.pos]
        n = item_emb[batch.neg]
        # ego-embedding regularization uses the *pre-propagation* tables
        # (`/root/reference/model/MF.py:239-249` getEmbedding -> ego embs)
        u0 = params["user_emb"][batch.user]
        p0 = params["item_emb"][batch.pos]
        n0 = params["item_emb"][batch.neg]
        reg = l2_ego(u0, p0, n0, batch.valid)
        if self.loss_mode == "softmax":
            # LightGCNSSM-style: -log softmax(pos | {pos, neg}) over the pair
            # (`/root/reference/model/lgcnssm.py:98-119` placeholder formalized)
            pos_s = jnp.sum(u * p, axis=-1)
            neg_s = jnp.sum(u * n, axis=-1)
            logits = jnp.stack([pos_s, neg_s], axis=-1)
            per = -jax.nn.log_softmax(logits, axis=-1)[:, 0]
            w = batch.valid.astype(per.dtype)
            main = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
        else:
            main = self.main_loss(u, p, n, batch.valid)
        total = main + self.config.decay * reg
        return total, {"bpr": main, "reg": reg}
