"""ASAGE — attribute-node SAGE (`/root/reference/model/asage.py:33-596`).

Auxiliary user-attribute and item-attribute bipartite graphs (reference loads
``user_attribute.pt`` / ``product_attribute.pt`` COO pairs,
`/root/reference/model/asage.py:55-79`); learned attribute embedding tables
(`:121-122`); joint loss = BPR(user, item) + 0.1 * BPR(attribute-view
embeddings), with regularization excluding the attr tables (`loss`,
`/root/reference/model/asage.py:440-477`). The commented-out InfoNCE/SSL variant
in the reference is exposed here as ``ssl_weight`` (0 disables, matching the
reference's shipped behavior).

The attribute views are encoded with the same conv layers as the main graph
(the reference reuses ``self.w_linears`` for both paths).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.features import FeatureStore
from ..data.graph import BipartiteGraph, CSR
from ..sampling.bpr import BPRBatch
from ..sampling.neighbor import sample_neighbors
from .base import Params, bpr_loss_from_scores
from .sage import DROPOUT_RATE, SAGE, _xavier

__all__ = ["ASAGE", "attributes_from_categorical"]


def _csr_pair(rows: np.ndarray, cols: np.ndarray, n_rows: int, n_cols: int) -> Tuple[CSR, CSR]:
    def mk(r, c, n):
        order = np.lexsort((c, r))
        r_s, c_s = r[order], c[order].astype(np.int32)
        indptr = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(np.bincount(r_s, minlength=n), out=indptr[1:])
        return CSR(jnp.asarray(indptr), jnp.asarray(c_s))

    return mk(rows, cols, n_rows), mk(cols, rows, n_cols)


def attributes_from_categorical(features: FeatureStore):
    """Derive (entity, attribute) COO pairs from the categorical feature
    matrices — the in-framework equivalent of the reference's precomputed
    attribute tensors."""
    out = {}
    for side, feats, vocab in (
        ("user", features.user, features.user_cat_vocab),
        ("item", features.item, features.item_cat_vocab),
    ):
        cat = np.asarray(feats.categorical)
        n, f = cat.shape
        rows = np.repeat(np.arange(n), f)
        cols = cat.reshape(-1)
        out[side] = (rows, cols, n, int(vocab))
    return out


class ASAGE(SAGE):
    name = "asage"

    def __init__(
        self,
        config: Config,
        graph: BipartiteGraph,
        features: FeatureStore,
        user_attr=None,  # (rows, cols, n_entities, n_attrs) COO; default: from categorical
        item_attr=None,
        attr_loss_weight: float = 0.1,  # /root/reference/model/asage.py:476
        ssl_weight: float = 0.0,
    ):
        super().__init__(config, graph, features, conv="sage_cat")
        attrs = (
            attributes_from_categorical(features)
            if (user_attr is None or item_attr is None)
            else None
        )
        ua = user_attr if user_attr is not None else attrs["user"]
        ia = item_attr if item_attr is not None else attrs["item"]
        self.n_user_attrs = ua[3]
        self.n_item_attrs = ia[3]
        self.user_attr_fwd, self.user_attr_bwd = _csr_pair(ua[0], ua[1], ua[2], ua[3])
        self.item_attr_fwd, self.item_attr_bwd = _csr_pair(ia[0], ia[1], ia[2], ia[3])
        self.attr_loss_weight = attr_loss_weight
        self.ssl_weight = ssl_weight

    def data_to_bind(self):
        attrs = (self.user_attr_fwd, self.user_attr_bwd, self.item_attr_fwd, self.item_attr_bwd)
        return (super().data_to_bind(), attrs)

    import contextlib as _contextlib

    @_contextlib.contextmanager
    def bind(self, data):
        base, attrs = data
        old = (self.user_attr_fwd, self.user_attr_bwd, self.item_attr_fwd, self.item_attr_bwd)
        self.user_attr_fwd, self.user_attr_bwd, self.item_attr_fwd, self.item_attr_bwd = attrs
        try:
            with super().bind(base):
                yield
        finally:
            (self.user_attr_fwd, self.user_attr_bwd,
             self.item_attr_fwd, self.item_attr_bwd) = old

    def _init(self, key: jax.Array) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        p = super()._init(k1)
        p["user_attr_emb"] = _xavier(k2, (self.n_user_attrs, self.node_dim))
        p["item_attr_emb"] = _xavier(k3, (self.n_item_attrs, self.node_dim))
        return p

    def _encode_attr_tree(self, params, seeds, side: str, key, train: bool):
        """Fanout-tree encoding over the entity<->attribute bipartite graph,
        alternating entity / attribute levels; reuses the main conv layers."""
        L, F = self.n_layers, self.fanout
        fwd = self.user_attr_fwd if side == "user" else self.item_attr_fwd
        bwd = self.user_attr_bwd if side == "user" else self.item_attr_bwd
        attr_emb = params[f"{side}_attr_emb"]

        levels = [seeds]
        valids = [None]
        for l in range(L):
            key, k = jax.random.split(key)
            csr = fwd if l % 2 == 0 else bwd
            s = sample_neighbors(k, csr, levels[-1], F)
            levels.append(s.ids)
            valids.append(s.has_neighbors)
        xs = []
        for l, lvl in enumerate(levels):
            if l % 2 == 0:
                xs.append(self._initial_side_emb(params, lvl, side))
            else:
                xs.append(attr_emb[lvl])
        for i in range(L):
            key, kd = jax.random.split(key)
            new_xs = []
            for lvl in range(L - i):
                target, nbrs = xs[lvl], xs[lvl + 1]
                if train and DROPOUT_RATE > 0:
                    kd, kdd = jax.random.split(kd)
                    keep = jax.random.bernoulli(kdd, 1.0 - DROPOUT_RATE, nbrs.shape)
                    nbrs = jnp.where(keep, nbrs / (1.0 - DROPOUT_RATE), 0.0)
                aggr = jnp.mean(nbrs, axis=-2)
                aggr = jnp.where(valids[lvl + 1][..., None], aggr, 0.0)
                h = self.conv.sampled(params["layers"][i], target, aggr, {"neighbors": nbrs})
                if i != L - 1:
                    h = jax.nn.relu(h)
                new_xs.append(h)
            xs = new_xs
        return xs[0]

    def loss(self, params, graph, batch: BPRBatch, key, tables=None):
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        u = self.encode_seeds(params, graph, batch.user, "user", k1, train=True, tables=tables)
        p = self.encode_seeds(params, graph, batch.pos, "item", k2, train=True, tables=tables)
        n = self.encode_seeds(params, graph, batch.neg, "item", k3, train=True, tables=tables)
        ua = self._encode_attr_tree(params, batch.user, "user", k4, train=True)
        pa = self._encode_attr_tree(params, batch.pos, "item", k5, train=True)
        na = self._encode_attr_tree(params, batch.neg, "item", k6, train=True)

        bpr = bpr_loss_from_scores(
            jnp.sum(u * p, axis=-1), jnp.sum(u * n, axis=-1), batch.valid
        )
        attr_bpr = bpr_loss_from_scores(
            jnp.sum(ua * pa, axis=-1), jnp.sum(ua * na, axis=-1), batch.valid
        )
        # whole-parameter L2 excluding attr tables (asage.py:448-451).
        # Deviation (fixed reference defect): the reference accumulates
        # ``all_param += all_param + v.norm(2)`` — each parameter's norm is
        # weighted 2^(k-1) by ITERATION ORDER (and it sums norms, not squared
        # norms). We use the standard 0.5*sum(sq) the rest of the family uses;
        # the exclusion rule ('attr_emb' params skipped) is kept.
        reg = 0.0
        for k_name, v in params.items():
            if "attr_emb" in k_name:
                continue
            for leaf in jax.tree_util.tree_leaves(v):
                if jnp.issubdtype(leaf.dtype, jnp.floating):
                    reg = reg + 0.5 * jnp.sum(jnp.square(leaf))
        reg = reg / jnp.maximum(jnp.sum(batch.valid), 1.0)

        total = bpr + self.attr_loss_weight * attr_bpr + self.config.decay * reg
        aux = {"bpr": bpr, "attr_bpr": attr_bpr, "reg": reg}
        if self.ssl_weight > 0:
            # InfoNCE between main and attribute views (the commented-out SSL
            # variant, asage.py:455-472)
            un = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-8)
            uan = ua / (jnp.linalg.norm(ua, axis=-1, keepdims=True) + 1e-8)
            pn = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-8)
            pan = pa / (jnp.linalg.norm(pa, axis=-1, keepdims=True) + 1e-8)
            temp = 0.1
            pos_u = jnp.sum(un * uan, axis=-1)
            pos_i = jnp.sum(pn * pan, axis=-1)
            logits_u = un @ uan.T - pos_u[:, None]
            logits_i = pn @ pan.T - pos_i[:, None]
            infonce = jnp.mean(
                jax.scipy.special.logsumexp(logits_u / temp, axis=1)
                + jax.scipy.special.logsumexp(logits_i / temp, axis=1)
            )
            total = total + self.ssl_weight * infonce
            aux["infonce"] = infonce
        return total, aux
