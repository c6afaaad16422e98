"""Matrix factorization (BPR-MF).

Capability parity with `MF` (`/root/reference/model/MF.py:35-112`): two embedding
tables initialized N(0,1), inner-product scoring with sigmoid on the full-catalog
path, BPR softplus loss with ego-embedding L2.

TPU notes: the tables are the only parameters; under the mesh they are row-sharded
on the ``model`` axis (see train/sharding.py), and the full-catalog score matmul
rides the MXU directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.graph import BipartiteGraph
from .base import PairwiseModel, Params

__all__ = ["MF"]


class MF(PairwiseModel):
    name = "mf"
    score_sigmoid = True

    def __init__(self, config: Config, graph: BipartiteGraph, pretrained=None):
        super().__init__(config, graph)
        self.dim = config.latent_dim
        #: optional (user_emb, item_emb) numpy arrays — the `--pretrain` path
        #: (/root/reference/model/MF.py:136-151 copies npy embeddings in)
        self.pretrained = pretrained

    def _init(self, key: jax.Array) -> Params:
        if self.pretrained is not None:
            u, i = self.pretrained
            return {
                "user_emb": jnp.asarray(u, jnp.float32),
                "item_emb": jnp.asarray(i, jnp.float32),
            }
        ku, ki = jax.random.split(key)
        # N(0,1) init, matching torch.nn.Embedding's default used by the
        # reference ("using Normal distribution N(0,1) initialization for PureMF")
        return {
            "user_emb": jax.random.normal(ku, (self.n_users, self.dim), jnp.float32),
            "item_emb": jax.random.normal(ki, (self.m_items, self.dim), jnp.float32),
        }

    def propagate(self, params: Params, graph: BipartiteGraph, key=None):
        return params["user_emb"], params["item_emb"]
