"""Model interface: the formalization of the reference's informal contract.

Every reference model exposes ``__init__(config, dataset)`` / ``OneEpoch`` /
``getUsersRating`` / ``bpr_loss`` / ``stageOne`` (SURVEY.md §2.3,
`/root/reference/model/MF.py:35-112`). The TPU framework factors that into pure
functions over explicit pytrees so the whole epoch can live inside one jitted
program:

- ``init(key) -> params``                      (parameter pytree)
- ``propagate(params, graph, key) -> (U, I)``  (full-graph user/item embeddings —
  the reference's full-graph inference path, used for full-catalog eval)
- ``loss(params, graph, batch, key) -> (scalar, aux)``  (training path; SAGE-family
  models may use sampled subgraphs here — the train/infer asymmetry of the
  reference is preserved deliberately, SURVEY.md §7.3)

The optimizer lives in the Trainer (optax), not the model — unlike the reference
where each model owns an ``optim.Adam`` (`/root/reference/model/graphsage.py:113`).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.graph import BipartiteGraph
from ..sampling.bpr import BPRBatch

Params = Dict[str, Any]

__all__ = ["PairwiseModel", "bpr_loss_from_scores", "l2_ego", "l2_params"]


def bpr_loss_from_scores(pos_scores, neg_scores, valid) -> jnp.ndarray:
    """mean softplus(neg - pos) over valid rows — the exact BPR form every
    reference model uses (`/root/reference/model/MF.py:62-70`)."""
    per = jax.nn.softplus(neg_scores - pos_scores)
    w = valid.astype(per.dtype)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def infonce_in_batch(u_emb, p_emb, valid, temperature: float) -> jnp.ndarray:
    """In-batch sampled-softmax: every other row's positive serves as a
    negative — -log softmax(u_i . p_i / tau | {u_i . p_j}_j). TPU-native
    alternative objective (north-star: in-batch + sampled-softmax negatives);
    the [B, B] logits ride the MXU, no explicit negative sampling needed."""
    logits = (u_emb @ p_emb.T) / temperature  # [B, B]
    mask = valid.astype(logits.dtype)
    logits = logits + jnp.log(jnp.maximum(mask, 1e-30))[None, :]  # drop invalid cols
    per = -jax.nn.log_softmax(logits, axis=1)
    diag = jnp.diagonal(per)
    return jnp.sum(diag * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def l2_ego(u_emb, p_emb, n_emb, valid) -> jnp.ndarray:
    """(1/2)(|u|^2+|p|^2+|n|^2)/B — ego-embedding regularization of the MF /
    LightGCN family (`/root/reference/model/MF.py:71-78`)."""
    w = valid.astype(u_emb.dtype)[:, None]
    sq = (
        jnp.sum((u_emb * w) * u_emb)
        + jnp.sum((p_emb * w) * p_emb)
        + jnp.sum((n_emb * w) * n_emb)
    )
    return 0.5 * sq / jnp.maximum(jnp.sum(w), 1.0)


def l2_params(params: Params) -> jnp.ndarray:
    """Whole-parameter-norm regularization of the SAGE family
    (`/root/reference/model/graphsage.py:326-337`)."""
    leaves = jax.tree_util.tree_leaves(params)
    return 0.5 * sum(jnp.sum(jnp.square(p)) for p in leaves if jnp.issubdtype(p.dtype, jnp.floating))


class PairwiseModel:
    """Base class. Subclasses must set ``self.config`` and implement ``init``,
    ``propagate``; the default ``loss`` trains on propagated embeddings (the
    no-sampling / full-graph shape, cf. NSSAGE `/root/reference/model/nssage.py:353-379`).

    Large device data a model holds on ``self`` (feature stores, text
    adjacencies, sequences) must flow through jit boundaries as ARGUMENTS, not
    closures — closed-over arrays are baked into the compiled program as
    constants, bloating executables and overflowing remote-compile payloads at
    production scale. Models expose that data via ``data_to_bind()`` and the
    trainer/evaluator re-attach it inside the traced function with ``bind()``
    so attribute reads during tracing see tracers."""

    def data_to_bind(self):
        """Pytree of device arrays held on self that jitted callers must pass
        through as arguments (None if the model holds none)."""
        return None

    import contextlib as _contextlib

    @_contextlib.contextmanager
    def bind(self, data):
        """Temporarily attach ``data`` (as produced by data_to_bind, possibly
        tracers) during tracing. Default: no-op."""
        yield

    #: apply sigmoid to full-catalog scores (MF parity,
    #: `/root/reference/model/MF.py:56-60`; monotonic, so top-K invariant)
    score_sigmoid: bool = False

    def __init__(self, config: Config, graph: BipartiteGraph):
        self.config = config
        self.n_users = graph.n_users
        self.m_items = graph.m_items

    @property
    def compute_dtype(self):
        """Matmul/SpMM compute precision (config.compute_dtype; bf16 rides the
        MXU at full rate, f32 accumulation everywhere)."""
        return jnp.dtype(self.config.compute_dtype)

    # -- to implement --
    def _init(self, key: jax.Array) -> Params:
        raise NotImplementedError

    def init(self, key: jax.Array) -> Params:
        """Parameter pytree in ``config.param_dtype`` (float32 default;
        bfloat16 halves table HBM at some optimizer-precision cost)."""
        params = self._init(key)
        dt = jnp.dtype(self.config.param_dtype)
        if dt == jnp.float32:
            return params
        return jax.tree_util.tree_map(
            lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )

    def propagate(
        self, params: Params, graph: BipartiteGraph, key: jax.Array | None = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    # -- defaults --
    def main_loss(self, u, p, n, valid) -> jnp.ndarray:
        """BPR (reference objective) or in-batch InfoNCE per config.loss_fn."""
        if self.config.loss_fn == "infonce":
            return infonce_in_batch(u, p, valid, self.config.infonce_temperature)
        pos_s = jnp.sum(u * p, axis=-1)
        neg_s = jnp.sum(u * n, axis=-1)
        return bpr_loss_from_scores(pos_s, neg_s, valid)

    def loss(
        self, params: Params, graph: BipartiteGraph, batch: BPRBatch, key: jax.Array
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        user_emb, item_emb = self.propagate(params, graph, key)
        u = user_emb[batch.user]
        p = item_emb[batch.pos]
        n = item_emb[batch.neg]
        bpr = self.main_loss(u, p, n, batch.valid)
        reg = self.reg_loss(params, u, p, n, batch.valid)
        total = bpr + self.config.decay * reg
        return total, {"bpr": bpr, "reg": reg}

    def reg_loss(self, params, u_emb, p_emb, n_emb, valid) -> jnp.ndarray:
        return l2_ego(u_emb, p_emb, n_emb, valid)

    def score_users(
        self,
        params: Params,
        graph: BipartiteGraph,
        users: jnp.ndarray,
        key: jax.Array | None = None,
    ) -> jnp.ndarray:
        """Full-catalog scores [B, M] (reference getUsersRating)."""
        user_emb, item_emb = self.propagate(params, graph, key)
        s = user_emb[users] @ item_emb.T
        return jax.nn.sigmoid(s) if self.score_sigmoid else s
