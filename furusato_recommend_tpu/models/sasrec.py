"""SASRec sequence model (`/root/reference/model/sasrec.py:55-500`).

Capability parity:
- item representations from the TextSAGE feature machinery (feature-gated
  initial embeddings; the user tower never sees user features — the user
  representation is a function of the interaction sequence only),
- pre-norm causal multi-head self-attention blocks with residuals + single-
  linear FFN (`oneblock`, `/root/reference/model/sasrec.py:385-397`),
- user repr = mean over valid sequence positions (`forward_user`,
  `/root/reference/model/sasrec.py:399-413`),
- item scoring tower: (L-1) relu linears + final proj (`forward_item`,
  `/root/reference/model/sasrec.py:415-421`),
- regularization over embedding parameters only
  (`/root/reference/model/sasrec.py:428-432` filters 'emb' in name).

TPU notes: max_len 50 attention is a trivially small MXU workload; the whole
batch runs as one [B, 50, d] attention. Full-user propagation for eval is
chunked with lax.map to bound the [n_users, 50, d] activation memory.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.features import FeatureStore
from ..data.graph import BipartiteGraph
from ..data.sequence import UserSequences
from ..sampling.bpr import BPRBatch
from .base import Params, bpr_loss_from_scores
from .sage import SAGE, _xavier

__all__ = ["SASRec"]

N_HEADS = 8  # /root/reference/model/sasrec.py (MultiheadAttention(latent_dim, 8))
DROPOUT = 0.2


class SASRec(SAGE):
    name = "sasrec"

    def __init__(
        self,
        config: Config,
        graph: BipartiteGraph,
        features: FeatureStore,
        sequences: UserSequences,
    ):
        super().__init__(config, graph, features, conv="sage_cat")
        self.sequences = sequences

    def data_to_bind(self):
        return (super().data_to_bind(), self.sequences)

    import contextlib as _contextlib

    @_contextlib.contextmanager
    def bind(self, data):
        base, seqs = data
        old = self.sequences
        self.sequences = seqs
        try:
            with super().bind(base):
                yield
        finally:
            self.sequences = old

    def _init(self, key: jax.Array) -> Params:
        k_base, k_rest = jax.random.split(key)
        p = super()._init(k_base)  # feature encoders (+ unused conv layers, like
        # the reference's leftover w_linears/v_linears)
        keys = iter(jax.random.split(k_rest, 8 * self.n_layers + 8))
        d = self.dim
        p["blocks"] = []
        for _ in range(self.n_layers):
            p["blocks"].append(
                {
                    "wq": _xavier(next(keys), (d, d)),
                    "wk": _xavier(next(keys), (d, d)),
                    "wv": _xavier(next(keys), (d, d)),
                    "wo": _xavier(next(keys), (d, d)),
                    "ln1_scale": jnp.ones((d,)),
                    "ln1_bias": jnp.zeros((d,)),
                    "ffn_w": _xavier(next(keys), (d, d)),
                    "ffn_b": jnp.zeros((d,)),
                    "ln2_scale": jnp.ones((d,)),
                    "ln2_bias": jnp.zeros((d,)),
                }
            )
        p["item_tower"] = []
        for _ in range(max(self.n_layers - 1, 0)):
            p["item_tower"].append(
                {"w": _xavier(next(keys), (d, d)), "b": jnp.zeros((d,))}
            )
        p["item_last_w"] = _xavier(next(keys), (d, d))
        p["item_last_b"] = jnp.zeros((d,))
        return p

    # -- blocks --
    @staticmethod
    def _layer_norm(x, scale, bias):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5) * scale + bias

    def _block(self, bp, x, causal_mask, key, train):
        # pre-norm MHA + residual + relu; pre-norm FFN + residual
        # (oneblock, /root/reference/model/sasrec.py:385-397)
        d = x.shape[-1]
        dh = d // N_HEADS
        init_x = x
        h = self._layer_norm(x, bp["ln1_scale"], bp["ln1_bias"])
        q = (h @ bp["wq"]).reshape(h.shape[:-1] + (N_HEADS, dh))
        k = (h @ bp["wk"]).reshape(h.shape[:-1] + (N_HEADS, dh))
        v = (h @ bp["wv"]).reshape(h.shape[:-1] + (N_HEADS, dh))
        e = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(dh)
        e = jnp.where(causal_mask[None, None], e, -jnp.inf)
        a = jax.nn.softmax(e, axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", a, v).reshape(h.shape)
        out = out @ bp["wo"]
        if train:
            key, kd = jax.random.split(key)
            keep = jax.random.bernoulli(kd, 1.0 - DROPOUT, out.shape)
            out = jnp.where(keep, out / (1.0 - DROPOUT), 0.0)
        x = jax.nn.relu(init_x + out)
        init_x = x
        h = self._layer_norm(x, bp["ln2_scale"], bp["ln2_bias"])
        h = h @ bp["ffn_w"] + bp["ffn_b"]
        if train:
            key, kd = jax.random.split(key)
            keep = jax.random.bernoulli(kd, 1.0 - DROPOUT, h.shape)
            h = jnp.where(keep, h / (1.0 - DROPOUT), 0.0)
        return init_x + h

    def forward_user(self, params, item_emb, users, key=None, train=False):
        """[B] user ids -> [B, d]: causal attention over their item sequences,
        mean over valid positions."""
        seq = self.sequences.items[users]  # [B, T]
        lengths = self.sequences.lengths[users]  # [B]
        T = self.sequences.max_len
        x = item_emb[seq]  # [B, T, d]
        valid = jnp.arange(T)[None, :] < lengths[:, None]
        x = jnp.where(valid[..., None], x, 0.0)
        causal = jnp.tril(jnp.ones((T, T), bool))
        if key is None:
            key = jax.random.PRNGKey(0)
        for bp in params["blocks"]:
            key, k = jax.random.split(key)
            x = self._block(bp, x, causal, k, train)
        m = valid[..., None].astype(x.dtype)
        return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)

    def forward_item(self, params, x):
        for tp in params["item_tower"]:
            x = jax.nn.relu(x @ tp["w"] + tp["b"])
        return x @ params["item_last_w"] + params["item_last_b"]

    # -- eval path --
    def propagate(self, params: Params, graph: BipartiteGraph, key=None):
        item_initial = self._initial_side_emb(params, jnp.arange(self.m_items), "item")
        item_emb = self.forward_item(params, item_initial)
        chunk = 1024
        n = self.n_users
        n_pad = -(-n // chunk) * chunk
        users = jnp.arange(n_pad, dtype=jnp.int32) % n
        user_emb = jax.lax.map(
            lambda u: self.forward_user(params, item_initial, u, train=False),
            users.reshape(-1, chunk),
        ).reshape(n_pad, -1)[:n]
        return user_emb, item_emb

    # -- training --
    def loss(self, params, graph, batch: BPRBatch, key):
        k1, _ = jax.random.split(key)
        item_initial = self._initial_side_emb(params, jnp.arange(self.m_items), "item")
        u = self.forward_user(params, item_initial, batch.user, key=k1, train=True)
        p = self.forward_item(params, item_initial[batch.pos])
        n = self.forward_item(params, item_initial[batch.neg])
        bpr = self.main_loss(u, p, n, batch.valid)
        # embedding-params-only L2 (/root/reference/model/sasrec.py:428-432)
        reg = 0.0
        for k_name, v in params.items():
            if "emb" in k_name and hasattr(v, "ndim"):
                reg = reg + 0.5 * jnp.sum(jnp.square(v))
        reg = reg / jnp.maximum(jnp.sum(batch.valid), 1.0)
        total = bpr + self.config.decay * reg
        return total, {"bpr": bpr, "reg": reg}
