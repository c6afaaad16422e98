"""TPU re-ranker — the LightGBM LambdaRank replacement (SURVEY.md §2.6, §2.8).

The reference trains ``lgb.LGBMRanker(n_estimators=1000)`` with per-user query
groups (`/root/reference/train_lgbm.py:176-188`) over the make_X features. A
gradient-boosted tree library has no TPU story, so the re-ranker is re-designed
as a **feature-cross MLP trained with a LambdaRank pairwise objective**:

- categorical id columns -> shared embedding table (ids are globally offset per
  column by the preprocessing encoders, like the reference artifacts),
- numeric columns -> linear projection,
- 2-layer relu MLP -> scalar score,
- loss over padded per-user candidate groups: for every (i, j) with
  label_i > label_j, logistic(s_j - s_i), optionally weighted by |delta-NDCG|
  of swapping i and j at the current ranks (``objective="lambdarank"``).

Training runs as one jitted lax.scan over user-group minibatches.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.features import FeatureStore
from .features import RankFeatureSpec, make_X_ids, rank_feature_spec

__all__ = ["NeuralRanker", "RankGroups"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RankGroups:
    """Padded per-user candidate groups."""

    users: jnp.ndarray  # [G] int32
    items: jnp.ndarray  # [G, C] int32 candidate ids
    labels: jnp.ndarray  # [G, C] float32 (1 = relevant)
    mask: jnp.ndarray  # [G, C] bool
    # optional per-candidate retriever-signal columns (reciprocal rank +
    # membership per retriever, pipeline.retriever_rank_aux). Deviation from
    # the reference make_X (train_lgbm.py:46-63 is static-profile only): with
    # static features alone a ranker cannot dominate the graph retriever it
    # re-orders (measured: rank20k rerank 0.199 vs textsage-alone 0.211);
    # retriever-rank columns restore the ">= best retriever" guarantee.
    aux: jnp.ndarray = None  # [G, C, A] float32 or None


def _xavier(key, shape):
    a = jnp.sqrt(6.0 / (shape[0] + shape[-1]))
    return jax.random.uniform(key, shape, jnp.float32, -a, a)


class NeuralRanker:
    def __init__(
        self,
        features: FeatureStore,
        emb_dim: int = 16,
        hidden: Tuple[int, int] = (256, 128),
        objective: str = "lambdarank",  # or "pairwise"
        ndcg_at: int = 10,
        interaction_dim: int = 16,
        aux_dim: int = 0,
    ):
        self.features = features
        self.spec: RankFeatureSpec = rank_feature_spec(features)
        self.emb_dim = emb_dim
        self.hidden = hidden
        self.objective = objective
        self.ndcg_at = ndcg_at
        # number of per-candidate aux columns (RankGroups.aux); 0 = the
        # reference's static-profile make_X exactly
        self.aux_dim = aux_dim
        # bilinear user x item interaction head: score += <P_u f_u, P_i f_i>.
        # A concat-MLP cannot represent the multiplicative user-item affinity
        # that ranking candidates requires (measured: rerank trails the best
        # retriever without it, benchmarks/rank20k.py); a GBDT approximates it
        # through axis-aligned splits, this head models it directly. Inputs are
        # still exactly the make_X columns. 0 disables (pure-MLP ablation).
        self.interaction_dim = interaction_dim
        s = self.spec
        self.in_dim = (
            (s.n_item_cat + s.n_user_cat) * emb_dim
            + s.n_user_num + s.n_item_num + aux_dim
        )
        self.user_in = s.n_user_cat * emb_dim + s.n_user_num
        self.item_in = s.n_item_cat * emb_dim + s.n_item_num

    def init(self, key: jax.Array) -> Dict:
        ks = jax.random.split(key, 6)
        h1, h2 = self.hidden
        p = {
            "cat_emb": 0.05 * jax.random.normal(ks[0], (self.spec.cat_vocab, self.emb_dim)),
            "w1": _xavier(ks[1], (self.in_dim, h1)),
            "b1": jnp.zeros((h1,)),
            "w2": _xavier(ks[2], (h1, h2)),
            "b2": jnp.zeros((h2,)),
            "w3": _xavier(ks[3], (h2, 1)),
            "b3": jnp.zeros((1,)),
        }
        if self.interaction_dim:
            p["pu"] = _xavier(ks[4], (self.user_in, self.interaction_dim))
            p["pi"] = _xavier(ks[5], (self.item_in, self.interaction_dim))
        return p

    def score(self, params, users: jnp.ndarray, items: jnp.ndarray, aux=None) -> jnp.ndarray:
        """Scores for (user, item) pairs of any shared shape [...]; ``aux``
        ([..., aux_dim] f32 retriever-signal columns) is required iff the
        ranker was built with aux_dim > 0."""
        cat, num = make_X_ids(self.features, users, items)
        s = self.spec
        ce = params["cat_emb"][jnp.clip(cat, 0, s.cat_vocab - 1)]
        parts = [ce.reshape(ce.shape[:-2] + (-1,)), num]
        if self.aux_dim:
            if aux is None:
                raise ValueError("ranker built with aux_dim > 0 needs aux columns")
            # aux joins the MLP input only; the bilinear head splits pure
            # per-side columns below, so num stays side-separable
            parts.append(aux)
        x = jnp.concatenate(parts, axis=-1)
        h = jax.nn.relu(x @ params["w1"] + params["b1"])
        h = jax.nn.relu(h @ params["w2"] + params["b2"])
        out = (h @ params["w3"] + params["b3"])[..., 0]
        if self.interaction_dim:
            # make_X column order: cat = [item_cat, user_cat], num = [user_num,
            # item_num] (rank/features.py) — split per side for the bilinear head
            item_vec = jnp.concatenate(
                [ce[..., : s.n_item_cat, :].reshape(ce.shape[:-2] + (-1,)),
                 num[..., s.n_user_num :]], axis=-1)
            user_vec = jnp.concatenate(
                [ce[..., s.n_item_cat :, :].reshape(ce.shape[:-2] + (-1,)),
                 num[..., : s.n_user_num]], axis=-1)
            out = out + jnp.sum(
                (user_vec @ params["pu"]) * (item_vec @ params["pi"]), axis=-1
            )
        return out

    # -- loss --
    def group_loss(self, params, groups: RankGroups) -> jnp.ndarray:
        s = self.score(params, groups.users[:, None], groups.items,
                       aux=groups.aux)  # [G, C]
        s = jnp.where(groups.mask, s, -1e9)
        lab = groups.labels * groups.mask
        # pair matrix: i relevant over j
        pref = (lab[:, :, None] > lab[:, None, :]) & (
            groups.mask[:, :, None] & groups.mask[:, None, :]
        )
        diff = s[:, :, None] - s[:, None, :]
        per_pair = jax.nn.softplus(-diff)  # -log sigma(s_i - s_j)
        if self.objective == "lambdarank":
            # |delta NDCG| of swapping i, j at current ranks
            ranks = jnp.argsort(jnp.argsort(-s, axis=1), axis=1)  # 0-based
            disc = 1.0 / jnp.log2(2.0 + ranks)  # [G, C]
            disc = jnp.where(ranks < self.ndcg_at, disc, 0.0)
            gain = 2.0**lab - 1.0
            delta = jnp.abs(
                (gain[:, :, None] - gain[:, None, :])
                * (disc[:, :, None] - disc[:, None, :])
            )
            per_pair = per_pair * delta
        tot = jnp.sum(per_pair * pref)
        return tot / jnp.maximum(jnp.sum(pref), 1.0)

    # -- training --
    def fit(
        self,
        groups: RankGroups,
        epochs: int = 30,
        batch_groups: int = 256,
        lr: float = 1e-3,
        seed: int = 0,
        verbose: bool = False,
    ) -> Dict:
        params = self.init(jax.random.PRNGKey(seed))
        opt = optax.adam(lr)
        opt_state = opt.init(params)
        G = groups.users.shape[0]
        nb = max(G // batch_groups, 1)
        gsize = nb * batch_groups

        def step(carry, idx):
            params, opt_state = carry
            batch = jax.tree_util.tree_map(lambda a: a[idx], groups)
            loss, grads = jax.value_and_grad(self.group_loss)(params, batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        @jax.jit
        def epoch(params, opt_state, key):
            perm = jax.random.permutation(key, G)
            idx = jnp.resize(perm, (gsize,)).reshape(nb, batch_groups)
            (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), idx)
            return params, opt_state, jnp.mean(losses)

        key = jax.random.PRNGKey(seed + 1)
        for e in range(epochs):
            key, k = jax.random.split(key)
            params, opt_state, loss = epoch(params, opt_state, k)
            if verbose:
                print(f"[ranker] epoch {e} loss {float(loss):.5f}")
        return params

    def rank(self, params, users: jnp.ndarray, cand_items: jnp.ndarray, k: int = 10,
             mask=None, chunk: int = 2048, aux=None):
        """Per-user re-rank: [U], [U, C] -> top-k item ids [U, k]
        (eval_lgbm.py:67-117 protocol: predict, sort, take 10).

        mask: optional [U, C] bool; False slots rank last and return id -1,
        so padded candidate rows cannot be double-counted.

        chunk: user-tile size. The cat-embedding gather's [U, C, F, emb] temp
        pads ~14x on TPU ((F, emb) = (9, 16) -> (16, 128) lanes), so ranking
        every user in one program OOMs at 20k x 100+ candidates; tiling bounds
        the temp at ~chunk/U of that. Tiles stay one compiled shape (the last
        one is padded), and a single-tile call is unchanged."""
        U = users.shape[0]
        if U <= chunk:
            return self._rank_tile(params, users, cand_items, k, mask, aux)
        outs = []
        for lo in range(0, U, chunk):
            hi = min(lo + chunk, U)
            pad = chunk - (hi - lo)
            u = jnp.pad(users[lo:hi], (0, pad))
            c = jnp.pad(cand_items[lo:hi], ((0, pad), (0, 0)))
            m = None if mask is None else jnp.pad(mask[lo:hi], ((0, pad), (0, 0)))
            a = None if aux is None else jnp.pad(
                aux[lo:hi], ((0, pad), (0, 0), (0, 0))
            )
            outs.append(self._rank_tile(params, u, c, k, m, a)[: hi - lo])
        return jnp.concatenate(outs, axis=0)

    def _rank_tile(self, params, users, cand_items, k, mask, aux=None):
        s = self.score(params, users[:, None], cand_items, aux=aux)
        if mask is not None:
            s = jnp.where(mask, s, -jnp.inf)
        order = jnp.argsort(-s, axis=1)[:, :k]
        ids = jnp.take_along_axis(cand_items, order, axis=1)
        if mask is not None:
            ok = jnp.take_along_axis(mask, order, axis=1)
            ids = jnp.where(ok, ids, -1)
        return ids
