"""Two-stage retrieval -> re-rank pipeline (SURVEY.md §3.4).

Reference flow: `test.py:23-41` dumps each retriever's per-user top-50
(`Trainer.get_topk_list`, `/root/reference/trainer.py:83-113`);
`train_lgbm.py:66-191` labels the candidate union (0 unless a held-out hit,
plus true train interactions as label 1) and fits a grouped LambdaRanker;
`eval_lgbm.py:47-117` dedups the candidate union, predicts, and takes each
user's top-10.

Here: candidate dump is a jitted masked-top-k over the retriever's propagated
embeddings; the labeled group construction is host-side numpy; the ranker is
rank/ranker.py's NeuralRanker.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import Dataset
from ..data.graph import BipartiteGraph
from ..models.base import PairwiseModel, Params
from ..ops.csr_search import csr_gather_padded
from .ranker import RankGroups

__all__ = ["dump_candidates", "build_rank_groups", "rerank_eval"]

MASK_SENTINEL = -(1 << 10)


def dump_candidates(
    model: PairwiseModel,
    params: Params,
    graph: BipartiteGraph,
    k: int = 50,
    batch: int = 1024,
    max_train_degree: Optional[int] = None,
) -> np.ndarray:
    """Per-user top-k candidates [n_users, k] with train positives masked
    (get_topk_list, /root/reference/trainer.py:83-113; k=50 in test.py:23-41)."""
    if max_train_degree is None:
        max_train_degree = int(np.max(np.asarray(graph.user_degrees())))
    user_emb, item_emb = jax.jit(lambda p: model.propagate(p, graph))(params)

    @jax.jit
    def topk_tile(users):
        s = (user_emb[users] @ item_emb.T).astype(jnp.float32)
        pos, mask = csr_gather_padded(graph.user_pos, users, max_train_degree)
        cols = jnp.where(mask, pos, graph.m_items)
        s = s.at[jnp.arange(users.shape[0])[:, None], cols].set(MASK_SENTINEL, mode="drop")
        _, ids = jax.lax.top_k(s, k)
        return ids

    n = graph.n_users
    out = np.empty((n, k), np.int32)
    for lo in range(0, n, batch):
        hi = min(lo + batch, n)
        users = jnp.arange(lo, lo + batch, dtype=jnp.int32) % n
        out[lo:hi] = np.asarray(topk_tile(users))[: hi - lo]
    return out


def build_rank_groups(
    dataset: Dataset,
    candidates: Sequence[np.ndarray],  # one [n_users, k] per retriever
    holdout: Dict[int, np.ndarray],  # user -> held-out positive items (labels 1)
    include_train_positives: bool = True,
    max_candidates: int = 160,
) -> RankGroups:
    """Labeled per-user groups from the candidate union
    (train_lgbm.py:102-130): candidates get label 0 unless they hit the
    held-out set; true train interactions are added with label 1."""
    ap = dataset.all_pos()
    n = dataset.n_users
    users, items, labels, mask = [], [], [], []
    C = max_candidates
    for u in range(n):
        cand: List[int] = []
        seen = set()
        for c in candidates:
            for it in c[u]:
                it = int(it)
                if it not in seen:
                    seen.add(it)
                    cand.append(it)
        hold = set(int(x) for x in holdout.get(u, ()))
        lab = [1.0 if it in hold else 0.0 for it in cand]
        if include_train_positives:
            for it in ap[u]:
                it = int(it)
                if it not in seen:
                    seen.add(it)
                    cand.append(it)
                    lab.append(1.0)
        if not cand or not any(lab):
            continue  # groups without any relevant item carry no pairwise signal
        cand, lab = cand[:C], lab[:C]
        pad = C - len(cand)
        users.append(u)
        items.append(cand + [0] * pad)
        labels.append(lab + [0.0] * pad)
        mask.append([True] * len(cand) + [False] * pad)
    return RankGroups(
        users=jnp.asarray(users, jnp.int32),
        items=jnp.asarray(items, jnp.int32),
        labels=jnp.asarray(labels, jnp.float32),
        mask=jnp.asarray(mask),
    )


def rerank_eval(
    ranker,
    params,
    dataset: Dataset,
    candidates: Sequence[np.ndarray],
    eval_dict: Dict[int, np.ndarray],
    k: int = 10,
    max_candidates: int = 160,
) -> Dict[str, float]:
    """End-to-end second-stage eval: union candidates -> rank -> top-k recall
    (eval_lgbm.py:67-117 protocol)."""
    n = dataset.n_users
    users = sorted(eval_dict.keys())
    C = max_candidates
    cand_mat = np.zeros((len(users), C), np.int32)
    for row, u in enumerate(users):
        cand: List[int] = []
        seen = set()
        for c in candidates:
            for it in c[u]:
                it = int(it)
                if it not in seen:
                    seen.add(it)
                    cand.append(it)
        cand = cand[:C]
        cand_mat[row, : len(cand)] = cand
        if len(cand) < C:  # pad by repeating the first candidate
            cand_mat[row, len(cand) :] = cand[0] if cand else 0
    top = np.asarray(
        ranker.rank(params, jnp.asarray(users, jnp.int32), jnp.asarray(cand_mat), k=k)
    )
    recall = hits = 0.0
    for row, u in enumerate(users):
        gt = set(int(x) for x in eval_dict[u])
        got = len(gt & set(top[row].tolist()))
        recall += got / max(len(gt), 1)
        hits += 1.0 if got else 0.0
    return {
        f"rerank_recall@{k}": recall / len(users),
        f"rerank_hr@{k}": hits / len(users),
    }
