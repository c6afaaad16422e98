"""Batched full-catalog evaluation: score -> mask train positives -> top-K -> metrics.

The TPU re-design of `Trainer.test` (`/root/reference/trainer.py:115-187`):

- full-catalog scoring is a [B, d] x [d, M] MXU matmul per user tile,
- train-positive masking replaces the reference's per-user Python
  ``exclude_index`` list building (`/root/reference/trainer.py:131-137`) with a
  padded scatter of -2^10 (same sentinel, `/root/reference/trainer.py:137`),
- ``jax.lax.top_k`` replaces torch.topk,
- metric sums are computed on device (see eval/metrics.py) instead of a
  multiprocessing.Pool, and the whole loop over user tiles is a single
  ``lax.scan`` — one XLA program per eval.

Protocol parity: metrics are divided by the total number of test users; coverage
is corpus-level; the eval order (propagate once, then tile users) matches the
reference's `--inference all` mode.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.dataset import Dataset
from ..data.graph import BipartiteGraph
from ..eval.metrics import batch_auc_sum, batch_metric_sums
from ..models.base import PairwiseModel, Params
from ..ops.chunked_topk import CHUNKED_TOPK_MIN_M, chunked_top_k
from ..ops.csr_search import csr_gather_padded

__all__ = ["EvalData", "build_eval_data", "Evaluator"]

MASK_SENTINEL = -(1 << 10)  # same sentinel as /root/reference/trainer.py:137
COLD_START_UID = 10000  # reference cold-user boundary (/root/reference/dataloader.py:107)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EvalData:
    """Static-shape eval inputs, built host-side once per dataset."""

    users: jnp.ndarray  # [nb, B] int32 padded test users
    valid: jnp.ndarray  # [nb, B] bool
    item_categories: Optional[jnp.ndarray]  # [M, C] int32, -1 padded
    item_popularity: Optional[jnp.ndarray]  # [M] float32 occurrences / n_users


def build_eval_data(
    dataset: Dataset,
    batch_size: int,
    item_categories: Optional[np.ndarray] = None,
    max_batches: Optional[int] = None,
) -> EvalData:
    test_users = np.unique(dataset.test_user).astype(np.int32)
    if max_batches is not None:
        # DDP eval truncation capability (TEST_COUNT, /root/reference/ddp.py:826-847)
        test_users = test_users[: max_batches * batch_size]
    n = len(test_users)
    nb = max(1, -(-n // batch_size))
    pad = nb * batch_size - n
    users = np.concatenate([test_users, np.zeros(pad, dtype=np.int32)])
    valid = np.concatenate([np.ones(n, dtype=bool), np.zeros(pad, dtype=bool)])
    pop = dataset.item_occurrence().astype(np.float32) / dataset.n_users
    return EvalData(
        users=jnp.asarray(users.reshape(nb, batch_size)),
        valid=jnp.asarray(valid.reshape(nb, batch_size)),
        item_categories=None
        if item_categories is None
        else jnp.asarray(item_categories, dtype=jnp.int32),
        item_popularity=jnp.asarray(pop),
    )


class Evaluator:
    """Jit-compiled full-catalog evaluator bound to (model, graph shapes)."""

    def __init__(
        self,
        model: PairwiseModel,
        graph: BipartiteGraph,
        config: Config,
        max_train_degree: int,
        mesh=None,
    ):
        self.model = model
        self.config = config
        self.topks = tuple(config.topks)
        self.kmax = max(self.topks)
        self.max_train_degree = int(max_train_degree)
        self.graph = graph
        # multi-chip: route scoring through the item-sharded distributed top-K
        # merge (eval/sharded.py) instead of a single-device [B, M] buffer
        self.mesh = mesh
        if mesh is not None and config.compute_auc:
            raise ValueError("compute_auc needs full [B, M] scores; unsupported under a mesh")
        if mesh is not None and config.inference == "sample":
            from ..core.mesh import DATA_AXIS

            data_size = mesh.shape[DATA_AXIS]
            if config.sample_infer_chunk % data_size:
                raise ValueError(
                    f"--inference sample under a mesh needs sample_infer_chunk "
                    f"({config.sample_infer_chunk}) divisible by the mesh data "
                    f"axis ({data_size})"
                )
        # graph + model-held data are jit ARGUMENTS (not closure constants —
        # see PairwiseModel.data_to_bind)
        self._run = jax.jit(self._evaluate)

    def _score_tile(self, user_emb, item_emb, graph, users):
        s = (user_emb[users] @ item_emb.T).astype(jnp.float32)
        if self.model.score_sigmoid:
            s = jax.nn.sigmoid(s)
        # mask train positives to the reference sentinel
        pos, mask = csr_gather_padded(graph.user_pos, users, self.max_train_degree)
        b = jnp.arange(users.shape[0])[:, None]
        cols = jnp.where(mask, pos, graph.m_items)  # out-of-range -> dropped
        s = s.at[b, cols].set(MASK_SENTINEL, mode="drop")
        return s

    def _evaluate(self, graph: BipartiteGraph, params: Params, data: EvalData, bound):
        with self.model.bind(bound):
            return self._evaluate_inner(graph, params, data)

    def _evaluate_inner(self, graph: BipartiteGraph, params: Params, data: EvalData):
        if self.config.inference == "sample" and hasattr(self.model, "propagate_sampled"):
            # `--inference sample`: sampled-subgraph encoding instead of exact
            # full-graph means (/root/reference/model/graphsage.py:401-477);
            # under a mesh the chunked encoding is data-axis sharded (no silent
            # replication — models/sage.py propagate_sampled)
            user_emb, item_emb = self.model.propagate_sampled(
                params, graph, jax.random.PRNGKey(self.config.seed), mesh=self.mesh
            )
        else:
            user_emb, item_emb = self.model.propagate(params, graph, None)
        m = graph.m_items
        cold_enabled = self.config.cold_start

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..core.mesh import MODEL_AXIS

            # pin the catalog rows to the model axis once, outside the scan,
            # so every tile's shard_map reuses the same layout
            item_emb = jax.lax.with_sharding_constraint(
                item_emb, NamedSharding(self.mesh, P(MODEL_AXIS, None))
            )

        def step(carry, inp):
            sums, cold_sums, cov = carry
            users, valid = inp
            if self.mesh is not None:
                from ..eval.sharded import sharded_masked_topk

                scores = None
                pos, mask = csr_gather_padded(graph.user_pos, users, self.max_train_degree)
                _, topk = sharded_masked_topk(
                    user_emb[users],
                    item_emb,
                    pos,
                    mask,
                    self.kmax,
                    self.mesh,
                    sigmoid=self.model.score_sigmoid,
                    m_valid=m,
                )
            else:
                scores = self._score_tile(user_emb, item_emb, graph, users)
                if m >= CHUNKED_TOPK_MIN_M:
                    # huge catalogs: lax.top_k's sort temps (~6x the [B, M]
                    # tile) OOM a 16G chip at M=300k, B=1024 — sequential
                    # per-segment top-k + merge (ops/chunked_topk.py)
                    _, topk = chunked_top_k(scores, self.kmax)
                else:
                    _, topk = jax.lax.top_k(scores, self.kmax)
            batch_sums = batch_metric_sums(
                topk,
                users,
                valid,
                graph.test_pos,
                self.topks,
                data.item_categories,
                data.item_popularity,
                n_users_norm=float(graph.n_users),
                max_test_degree=graph.max_test_degree or None,
            )
            if self.config.compute_auc:
                batch_sums["auc"] = jnp.broadcast_to(
                    batch_auc_sum(scores, users, valid, graph.test_pos, float(MASK_SENTINEL)),
                    (len(self.topks),),
                )
            sums = jax.tree_util.tree_map(jnp.add, sums, batch_sums)
            if cold_enabled:
                cold_valid = valid & (users < COLD_START_UID)
                cb = batch_metric_sums(
                    topk,
                    users,
                    cold_valid,
                    graph.test_pos,
                    self.topks,
                    data.item_categories,
                    data.item_popularity,
                    n_users_norm=float(graph.n_users),
                    max_test_degree=graph.max_test_degree or None,
                )
                if self.config.compute_auc:
                    cb["auc"] = jnp.broadcast_to(
                        batch_auc_sum(
                            scores, users, cold_valid, graph.test_pos, float(MASK_SENTINEL)
                        ),
                        (len(self.topks),),
                    )
                cold_sums = jax.tree_util.tree_map(jnp.add, cold_sums, cb)
            # corpus-level coverage accumulates on device (a [nk, M] hit-bitmap
            # scatter) so evals don't have to fetch the full top-k id buffer —
            # an 8 MB host transfer per eval at the flagship shape
            for i, k in enumerate(self.topks):
                ids = jnp.where(valid[:, None], topk[:, :k], m)  # pad rows -> dropped
                cov = cov.at[i, ids.ravel()].set(True, mode="drop")
            return (sums, cold_sums, cov), topk

        nk = len(self.topks)
        zero_sums = {
            "recall": jnp.zeros(nk),
            "precision": jnp.zeros(nk),
            "hr": jnp.zeros(nk),
            "ndcg": jnp.zeros(nk),
            "mrr": jnp.zeros(nk),
            "count": jnp.zeros(()),
        }
        if data.item_categories is not None:
            zero_sums["diversity"] = jnp.zeros(nk)
        if data.item_popularity is not None:
            zero_sums["novelty"] = jnp.zeros(nk)
        if self.config.compute_auc:
            zero_sums["auc"] = jnp.zeros(nk)
        cov0 = jnp.zeros((nk, m), bool)
        (sums, cold_sums, cov), topks = jax.lax.scan(
            step, (zero_sums, zero_sums, cov0), (data.users, data.valid)
        )
        return sums, cold_sums, jnp.sum(cov, axis=1), topks

    def __call__(
        self,
        params: Params,
        data: EvalData,
        bound=None,
        pmi: Optional[np.ndarray] = None,
        with_topk: bool = True,
    ) -> Tuple[Dict[str, np.ndarray], Optional[np.ndarray]]:
        """Returns (results, topk_ids [n_valid_test_users, Kmax] or None).

        results keys: {metric}@{k} floats + 'coverage@{k}' + (cold_* if enabled).
        bound: pre-placed model-held device data (Trainer passes its replicated
        copy under a mesh); default re-reads model.data_to_bind().
        pmi: optional [M, M] PMI matrix — enables the REAL unexpectedness
        (mean PMI between each user's train positives and recommendations,
        the computation `/root/reference/metric.py:127-140` stubs out);
        without it the reference's stub value is reproduced.
        with_topk: False skips fetching the per-user top-k id buffer to the
        host (metrics incl. coverage are device-side sums) — the Trainer's eval
        cadence uses this; result dumps / the rank tier need the ids.
        """
        if bound is None:
            bound = self.model.data_to_bind()
        sums, cold_sums, cov_counts, topks = self._run(self.graph, params, data, bound)
        sums = jax.device_get(sums)
        n = float(sums.pop("count"))
        results: Dict[str, float] = {}
        for name, vals in sums.items():
            for i, k in enumerate(self.topks):
                results[f"{name}@{k}"] = float(vals[i]) / max(n, 1.0)
        # corpus-level coverage — unique recommended items, counted on device
        cov_counts = jax.device_get(cov_counts)
        for i, k in enumerate(self.topks):
            results[f"coverage@{k}"] = float(cov_counts[i]) / self.model.m_items
        shown = None
        if with_topk or pmi is not None:
            topks_np = np.asarray(jax.device_get(topks)).reshape(-1, self.kmax)
            valid_np = np.asarray(jax.device_get(data.valid)).reshape(-1)
            users_np = np.asarray(jax.device_get(data.users)).reshape(-1)[valid_np]
            shown = topks_np[valid_np]
        if pmi is not None:
            from .metrics import unexpectedness_from_pmi

            for k in self.topks:
                results[f"unexpectedness@{k}"] = unexpectedness_from_pmi(
                    self.graph, users_np, shown[:, :k], pmi
                )
        else:
            # reference parity: Unexpectedness stubbed to 1 then divided by
            # #users (/root/reference/metric.py:127-128, trainer.py:176-177)
            for k in self.topks:
                results[f"unexpectedness@{k}"] = 1.0 / max(n, 1.0)
        if self.config.cold_start:
            cold_sums = jax.device_get(cold_sums)
            cn = float(cold_sums.pop("count"))
            for name, vals in cold_sums.items():
                for i, k in enumerate(self.topks):
                    results[f"cold_{name}@{k}"] = float(vals[i]) / max(cn, 1.0)
        return results, shown
