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
        self.in_dim = (s.n_item_cat + s.n_user_cat) * emb_dim + s.n_user_num + s.n_item_num
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
        if self.aux_dim:
            # direct linear head for the retriever-signal columns: the
            # fallback "follow the retriever order" must be first-order
            # learnable. Routed through the MLP instead, the rr signal gets
            # entangled with static-profile features and the learned ranker
            # measured BELOW both the parity ranker and the retriever
            # (rank20k chip runs: 0.191/0.172 vs parity 0.199).
            p["wa"] = jnp.zeros((self.aux_dim,))
        return p

    def score(self, params, users: jnp.ndarray, items: jnp.ndarray, aux=None) -> jnp.ndarray:
        """Scores for (user, item) pairs of any shared shape [...]; ``aux``
        ([..., aux_dim] f32 retriever-signal columns) is required iff the
        ranker was built with aux_dim > 0."""
        cat, num = make_X_ids(self.features, users, items)
        s = self.spec
        ce = params["cat_emb"][jnp.clip(cat, 0, s.cat_vocab - 1)]
        x = jnp.concatenate([ce.reshape(ce.shape[:-2] + (-1,)), num], axis=-1)
        h = jax.nn.relu(x @ params["w1"] + params["b1"])
        h = jax.nn.relu(h @ params["w2"] + params["b2"])
        out = (h @ params["w3"] + params["b3"])[..., 0]
        if self.aux_dim:
            if aux is None:
                raise ValueError("ranker built with aux_dim > 0 needs aux columns")
            out = out + aux @ params["wa"]
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
        aux_warm_epochs: int = 0,
    ) -> Dict:
        """aux_warm_epochs: with aux columns, first fit the linear retriever-
        signal head ALONE (every other parameter's update masked to zero) for
        this many epochs, then train jointly. Without the warm phase the MLP
        races ahead on the static features and converges with wa near its
        zero init (measured wa ~0.2-0.3 on the rank20k chip run — the blend
        never recovers the retriever's own ordering, AUC 0.76 signal unused);
        the warm phase starts joint training from the retriever-following
        prior the aux columns exist to provide."""
        params = self.init(jax.random.PRNGKey(seed))
        opt = optax.adam(lr)
        G = groups.users.shape[0]
        nb = max(G // batch_groups, 1)
        gsize = nb * batch_groups

        def make_epoch(o):
            def step(carry, idx):
                params, opt_state = carry
                batch = jax.tree_util.tree_map(lambda a: a[idx], groups)
                loss, grads = jax.value_and_grad(self.group_loss)(params, batch)
                updates, opt_state = o.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            @jax.jit
            def epoch(params, opt_state, key):
                perm = jax.random.permutation(key, G)
                idx = jnp.resize(perm, (gsize,)).reshape(nb, batch_groups)
                (params, opt_state), losses = jax.lax.scan(
                    step, (params, opt_state), idx
                )
                return params, opt_state, jnp.mean(losses)

            return epoch

        key = jax.random.PRNGKey(seed + 1)
        if aux_warm_epochs and self.aux_dim:
            # NOT optax.masked: masked leaves unmasked grads through as raw
            # (unnegated) updates — gradient ascent on the frozen MLP
            warm = optax.multi_transform(
                {"wa": optax.adam(100 * lr), "frozen": optax.set_to_zero()},
                {k: ("wa" if k == "wa" else "frozen") for k in params},
            )
            warm_epoch = make_epoch(warm)
            warm_state = warm.init(params)
            for e in range(aux_warm_epochs):
                key, k = jax.random.split(key)
                params, warm_state, loss = warm_epoch(params, warm_state, k)
                if verbose:
                    print(f"[ranker] warm {e} loss {float(loss):.5f}")

        epoch = make_epoch(opt)
        opt_state = opt.init(params)
        for e in range(epochs):
            key, k = jax.random.split(key)
            params, opt_state, loss = epoch(params, opt_state, k)
            if verbose:
                print(f"[ranker] epoch {e} loss {float(loss):.5f}")
        return params

    def calibrate(
        self,
        params: Dict,
        groups_val: RankGroups,
        k: int = 10,
        betas=(0.0, 0.01, 0.03, 0.1, 0.3, 1.0),
        gammas=(0.0, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0),
    ) -> Dict:
        """Post-hoc blend calibration on a held-out validation slice
        (aux rankers only): choose (beta, gamma) maximizing val recall@k for

            score = beta * static(u, i) + gamma * <aux, wa_learned>

        and return params expressing that blend (w3/b3/pu scaled by beta, wa
        by gamma) — rank()/rerank_eval need no changes. Joint LambdaRank
        training reliably over-weights the static MLP relative to the
        retriever-signal head (measured on the rank20k chip record: learned
        blends 0.166-0.191 vs 0.199 parity vs 0.211 best retriever, while the
        aux columns alone reproduce the retriever exactly); fixing the
        trade-off on held-out data instead of train loss is the standard
        stacked-ensemble practice (the reference's GBDT gets the analogous
        effect from early stopping on its eval set, train_lgbm.py:176-188)."""
        if not self.aux_dim:
            raise ValueError("calibrate() requires an aux ranker")
        static_p = dict(params)
        static_p["wa"] = jnp.zeros_like(params["wa"])
        zero_aux = jnp.zeros(groups_val.items.shape + (self.aux_dim,), jnp.float32)
        s_static = np.asarray(
            self.score(static_p, groups_val.users[:, None], groups_val.items,
                       aux=zero_aux)
        )
        s_aux = np.asarray(groups_val.aux) @ np.asarray(params["wa"])
        lab = np.asarray(groups_val.labels) * np.asarray(groups_val.mask)
        msk = np.asarray(groups_val.mask)
        gt_lens = np.maximum(lab.sum(axis=1), 1.0)
        best, best_r = (1.0, 1.0), -1.0
        for beta in betas:
            for gamma in gammas:
                if beta == 0.0 and gamma == 0.0:
                    continue
                s = np.where(msk, beta * s_static + gamma * s_aux, -np.inf)
                top = np.argsort(-s, axis=1)[:, :k]
                hits = np.take_along_axis(lab, top, axis=1).sum(axis=1)
                r = float(np.mean(hits / gt_lens))
                if r > best_r:
                    best, best_r = (beta, gamma), r
        beta, gamma = best
        out = dict(params)
        out["w3"] = params["w3"] * beta
        out["b3"] = params["b3"] * beta
        if self.interaction_dim:
            out["pu"] = params["pu"] * beta
        out["wa"] = params["wa"] * gamma
        out["_calibration"] = jnp.asarray([beta, gamma, best_r])
        return out

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
