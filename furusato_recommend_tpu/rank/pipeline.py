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


def _dedup_rows(cand: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Per-row first-occurrence dedup mask, fully vectorized: a stable argsort
    groups equal values, duplicates after the first are invalidated; invalid
    slots are forced unique so they never collide with real entries."""
    n, w = cand.shape
    keyed = np.where(valid, cand, cand.max(initial=0) + 1 + np.arange(w)[None, :])
    order = np.argsort(keyed, axis=1, kind="stable")
    svals = np.take_along_axis(keyed, order, axis=1)
    dup_sorted = np.zeros_like(svals, dtype=bool)
    dup_sorted[:, 1:] = svals[:, 1:] == svals[:, :-1]
    dup = np.empty_like(dup_sorted)
    np.put_along_axis(dup, order, dup_sorted, axis=1)
    return valid & ~dup


def _compact_rows(keep: np.ndarray, *arrays, width: int):
    """Move kept entries to the front of each row (order-preserving), truncate
    to ``width``. Returns (mask, compacted arrays...). Arrays may carry
    trailing feature dims (e.g. [n, W, A] aux columns)."""
    order = np.argsort(~keep, axis=1, kind="stable")[:, :width]
    kept = np.take_along_axis(keep, order, axis=1)
    outs = [
        np.take_along_axis(a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1)
        for a in arrays
    ]
    return kept, outs


def retriever_rank_aux(
    candidates: Sequence[np.ndarray],  # one [n_users, k] dump per retriever
    cand: np.ndarray,  # [n, W] int64 item ids to featurize
    m_items: int,
) -> np.ndarray:
    """Per-candidate retriever-signal columns [n, W, 2 * n_retrievers]:
    for each retriever, (reciprocal rank 1/(1+pos) in its top-k dump, 0 if
    absent) and a membership indicator.

    Deviation from the reference: train_lgbm.py's make_X (lines 46-63) is
    static user/item profiles only, so its ranker cannot represent the
    retrievers' collaborative knowledge and is not guaranteed to match the
    best retriever it re-orders. These columns are computable from the
    candidate dumps alone (no extra model evaluation) and give the ranker a
    fallback ordering; with them rerank >= best-retriever holds on the
    committed rank20k record."""
    n, W = cand.shape
    q = np.arange(n, dtype=np.int64)[:, None] * m_items + cand  # [n, W]
    cols = []
    for L in candidates:
        L = np.asarray(L, np.int64)
        k = L.shape[1]
        keys = (np.arange(n, dtype=np.int64)[:, None] * m_items + L).ravel()
        ranks = np.tile(np.arange(k, dtype=np.int64), n)
        sidx = np.argsort(keys, kind="stable")
        skeys, sranks = keys[sidx], ranks[sidx]
        pos = np.searchsorted(skeys, q.ravel())
        pos = np.minimum(pos, len(skeys) - 1)
        hit = skeys[pos] == q.ravel()
        rr = np.where(hit, 1.0 / (1.0 + sranks[pos]), 0.0).astype(np.float32)
        cols.append(rr.reshape(n, W))
        cols.append(hit.reshape(n, W).astype(np.float32))
    return np.stack(cols, axis=-1)


def build_rank_groups(
    dataset: Dataset,
    candidates: Sequence[np.ndarray],  # one [n_users, k] per retriever
    holdout,  # {user: held-out items} dict OR (users[np], items[np]) edge arrays
    include_train_positives: bool = True,
    max_candidates: int = 160,
    with_retriever_aux: bool = False,
) -> RankGroups:
    """Labeled per-user groups from the candidate union
    (train_lgbm.py:102-130): candidates get label 0 unless they hit the
    held-out set; true train interactions are added with label 1.

    Vectorized numpy end to end (no per-user Python loops — the reference-scale
    10^5-10^6 users made the loop version quadratic pain, round-1 verdict #9)."""
    n, m = dataset.n_users, dataset.m_items
    C = max_candidates
    cand = np.concatenate([np.asarray(c, np.int64) for c in candidates], axis=1)
    valid = np.ones_like(cand, dtype=bool)

    if include_train_positives:
        # padded per-user train positives appended after the candidate union
        deg = np.bincount(dataset.train_user, minlength=n)
        D = int(deg.max(initial=0))
        pos_pad = np.zeros((n, D), np.int64)
        pos_valid = np.arange(D)[None, :] < deg[:, None]
        order = np.argsort(dataset.train_user, kind="stable")
        cols = (np.arange(len(order)) - np.repeat(np.cumsum(deg) - deg, deg)).astype(int)
        pos_pad[dataset.train_user[order], cols] = dataset.train_item[order]
        cand = np.concatenate([cand, pos_pad], axis=1)
        valid = np.concatenate([valid, pos_valid], axis=1)

    keep = _dedup_rows(cand, valid)

    # labels: holdout membership for the candidate part (flat (u, item) keys),
    # 1.0 for the appended train positives
    k_cand = sum(c.shape[1] for c in candidates)
    labels = np.zeros_like(cand, dtype=np.float32)
    if isinstance(holdout, dict):
        hold_keys = (
            np.sort(
                np.concatenate(
                    [np.int64(u) * m + np.asarray(v, np.int64) for u, v in holdout.items()]
                )
            )
            if holdout
            else None
        )
    else:  # (users, items) flat edge arrays — no per-user structure needed
        hu, hi = holdout
        hold_keys = (
            np.sort(np.asarray(hu, np.int64) * m + np.asarray(hi, np.int64))
            if len(hu)
            else None
        )
    if hold_keys is not None:
        cand_keys = np.arange(n, dtype=np.int64)[:, None] * m + cand[:, :k_cand]
        labels[:, :k_cand] = np.isin(cand_keys, hold_keys, assume_unique=False)
    if include_train_positives:
        labels[:, k_cand:] = 1.0

    arrays = [cand, labels]
    if with_retriever_aux:
        arrays.append(retriever_rank_aux(candidates, cand, m))
    kept, outs = _compact_rows(keep, *arrays, width=C)
    items, labels = outs[0], outs[1]
    labels = np.where(kept, labels, 0.0)
    # groups without any relevant item carry no pairwise signal
    rows = (labels.sum(axis=1) > 0) & kept.any(axis=1)
    return RankGroups(
        users=jnp.asarray(np.nonzero(rows)[0], jnp.int32),
        items=jnp.asarray(np.where(kept, items, 0)[rows], jnp.int32),
        labels=jnp.asarray(labels[rows], jnp.float32),
        mask=jnp.asarray(kept[rows]),
        aux=jnp.asarray(outs[2][rows], jnp.float32) if with_retriever_aux else None,
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
    (eval_lgbm.py:67-117 protocol). Vectorized; padded candidate slots are
    masked out of the ranking instead of repeating candidate 0 (the round-1
    double-counting fix)."""
    m = dataset.m_items
    users = np.asarray(sorted(eval_dict.keys()), np.int64)
    C = max_candidates
    cand = np.concatenate([np.asarray(c, np.int64)[users] for c in candidates], axis=1)
    keep = _dedup_rows(cand, np.ones_like(cand, dtype=bool))
    aux_kw = {}
    if getattr(ranker, "aux_dim", 0):
        # retriever-signal columns for the eval-user rows (dump rows are
        # per-ALL-user; index them the same way cand was built)
        full = retriever_rank_aux(
            [np.asarray(c, np.int64)[users] for c in candidates], cand, m
        )
        kept, (cand_mat, aux_mat) = _compact_rows(keep, cand, full, width=C)
        aux_kw["aux"] = jnp.asarray(aux_mat, jnp.float32)
    else:
        kept, (cand_mat,) = _compact_rows(keep, cand, width=C)
    top = np.asarray(
        ranker.rank(
            params,
            jnp.asarray(users, jnp.int32),
            jnp.asarray(np.where(kept, cand_mat, 0), jnp.int32),
            k=k,
            mask=jnp.asarray(kept),
            **aux_kw,
        )
    )  # [U, k]; -1 where fewer than k valid candidates
    gt_lens = np.asarray([len(eval_dict[int(u)]) for u in users], np.float64)
    gt_keys = np.sort(
        np.concatenate(
            [np.int64(u) * m + np.asarray(eval_dict[int(u)], np.int64) for u in users]
        )
    )
    top_keys = np.where(top >= 0, users[:, None] * m + top, -1)
    hit = np.isin(top_keys, gt_keys) & (top >= 0)
    got = hit.sum(axis=1)
    # binary-gain ndcg@k, same formula as eval/metrics.py (reference
    # metric.py NDCGatK_r): DCG over hit ranks / ideal DCG for gt_len items
    disc = 1.0 / np.log2(2.0 + np.arange(k))
    # rank() returns min(C, k) columns when fewer candidates than k exist
    dcg = (hit * disc[None, : hit.shape[1]]).sum(axis=1)
    idcg = np.cumsum(disc)[np.maximum(np.minimum(gt_lens.astype(int), k), 1) - 1]
    return {
        f"rerank_recall@{k}": float(np.mean(got / np.maximum(gt_lens, 1.0))),
        f"rerank_ndcg@{k}": float(np.mean(dcg / np.maximum(idcg, 1e-9))),
        f"rerank_hr@{k}": float(np.mean(got > 0)),
    }
