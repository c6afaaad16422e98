"""Ranking + beyond-accuracy metrics, vectorized on device.

Replaces the reference's per-user Python loops and `multiprocessing.Pool(4)` metric
workers (`/root/reference/trainer.py:155-161`, `/root/reference/metric.py`) with
batched jnp code. Formula parity (verified against the reference implementations in
tests/test_metrics.py):

- Recall/Precision/HR@K: `/root/reference/metric.py:60-72` — per-batch *sums*;
  the Trainer divides by the number of test users.
- NDCG@K (binary relevance): `/root/reference/metric.py:84-103`.
- MRR@K: `/root/reference/metric.py:74-82` (note the reference scores positions
  with log2(1/rank) rather than 1/rank; reproduced as-is).
- Diversity@K: mean pairwise Jaccard *distance* of product-category sets within
  each top-K (`/root/reference/metric.py:105-115`).
- Novelty@K: -log2 popularity, normalized by -log2(1/n_users)
  (`/root/reference/metric.py:117-125`).
- Coverage@K: fraction of catalog recommended (`/root/reference/metric.py:142-147`)
  — corpus-level, accumulated across batches via a scatter into an item-hit vector.
- Unexpectedness: the reference stubs this to ``return 1``
  (`/root/reference/metric.py:127-140`); the stub value is reproduced by default
  and the real PMI computation ships as ``unexpectedness_from_pmi`` (wired behind
  ``Evaluator(...)(..., pmi=...)``) with ``pmi_from_cooccurrence`` to build the
  matrix from train interactions.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..data.graph import CSR
from ..ops.csr_search import csr_contains

__all__ = [
    "batch_metric_sums",
    "batch_auc_sum",
    "pmi_from_cooccurrence",
    "unexpectedness_from_pmi",
]


def _hit_matrix(
    test_pos: CSR, users: jnp.ndarray, topk_ids: jnp.ndarray, max_test_degree=None
) -> jnp.ndarray:
    """r[b, k] = 1 if topk_ids[b, k] is a test positive of users[b]
    (the vectorized `getLabel`, `/root/reference/metric.py:50-58`)."""
    return csr_contains(
        test_pos, users[:, None], topk_ids, max_row_len=max_test_degree
    ).astype(jnp.float32)


def batch_metric_sums(
    topk_ids: jnp.ndarray,  # [B, Kmax] int
    users: jnp.ndarray,  # [B] int
    valid: jnp.ndarray,  # [B] bool (padding rows excluded)
    test_pos: CSR,
    topks: Sequence[int],
    item_categories: Optional[jnp.ndarray] = None,  # [M, C] int, -1 padded
    item_popularity: Optional[jnp.ndarray] = None,  # [M] float, occurrences/n_users
    n_users_norm: Optional[float] = None,
    max_test_degree: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-batch metric *sums* over users, one entry per k in topks.

    Returns dict of [len(topks)] arrays plus 'count' (valid user count).
    """
    r = _hit_matrix(test_pos, users, topk_ids, max_test_degree)  # [B, Kmax]
    w = valid.astype(jnp.float32)
    r = r * w[:, None]
    test_deg = (test_pos.indptr[users + 1] - test_pos.indptr[users]).astype(jnp.float32)

    out: Dict[str, jnp.ndarray] = {}
    recalls, precisions, hrs, ndcgs, mrrs, divs, novs = [], [], [], [], [], [], []
    for k in topks:
        rk = r[:, :k]
        right = jnp.sum(rk, axis=1)
        recalls.append(jnp.sum(right / (test_deg + 1e-6) * w))
        precisions.append(jnp.sum(right) / k)
        hrs.append(jnp.sum((right >= 1).astype(jnp.float32) * w))
        # NDCG (binary relevance, reference formula)
        discounts = 1.0 / jnp.log2(jnp.arange(2, k + 2, dtype=jnp.float32))
        dcg = jnp.sum(rk * discounts[None, :], axis=1)
        ideal_len = jnp.minimum(test_deg, float(k))
        cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(discounts)])
        idcg = cum[jnp.clip(ideal_len.astype(jnp.int32), 0, k)]
        idcg = jnp.where(idcg == 0.0, 1.0, idcg)
        ndcgs.append(jnp.sum(dcg / idcg * w))
        # MRR: standard reciprocal rank of the first hit. (The reference's
        # MRRatK_r divides by log2(1/rank), which is 0 at rank 1 — it is dead
        # code there, never registered in the metric list; we ship the correct
        # formula instead. Deviation documented per SURVEY.md §2.4.)
        first_hit = jnp.argmax(rk, axis=1)
        has_hit = jnp.any(rk > 0, axis=1)
        rr = jnp.where(has_hit, 1.0 / (first_hit + 1.0), 0.0)
        mrrs.append(jnp.sum(rr * w))
        # Diversity
        if item_categories is not None:
            divs.append(_diversity_sum(topk_ids[:, :k], item_categories, w))
        # Novelty
        if item_popularity is not None and n_users_norm is not None:
            pop = jnp.maximum(item_popularity[topk_ids[:, :k]], 1e-12)
            per_user = jnp.sum(-jnp.log2(pop), axis=1) / k
            novs.append(jnp.sum(per_user * w) / (-jnp.log2(1.0 / n_users_norm)))

    out["recall"] = jnp.stack(recalls)
    out["precision"] = jnp.stack(precisions)
    out["hr"] = jnp.stack(hrs)
    out["ndcg"] = jnp.stack(ndcgs)
    out["mrr"] = jnp.stack(mrrs)
    if divs:
        out["diversity"] = jnp.stack(divs)
    if novs:
        out["novelty"] = jnp.stack(novs)
    out["count"] = jnp.sum(w)
    return out


def _diversity_sum(topk: jnp.ndarray, cats: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Sum over users of mean pairwise Jaccard distance between the category sets
    of recommended items (`Diversity`, `/root/reference/metric.py:105-115`).

    cats: [M, C] category ids per item, padded with -1; ids assumed unique per row.
    """
    k = topk.shape[1]
    c = cats[topk]  # [B, k, C]
    present = c >= 0
    sizes = jnp.sum(present, axis=-1).astype(jnp.float32)  # [B, k]
    # pairwise intersection counts: match of non-pad ids between item i and j
    eq = (c[:, :, None, :, None] == c[:, None, :, None, :]) & (
        present[:, :, None, :, None] & present[:, None, :, None, :]
    )  # [B, k, k, C, C]
    inter = jnp.sum(eq, axis=(-1, -2)).astype(jnp.float32)  # [B, k, k]
    union = sizes[:, :, None] + sizes[:, None, :] - inter
    dist = 1.0 - inter / (union + 1e-6)
    iu = jnp.triu_indices(k, 1)
    pair_sum = jnp.sum(dist[:, iu[0], iu[1]], axis=1)  # [B]
    denom = k * (k - 1) // 2
    return jnp.sum(pair_sum / denom * w)


def batch_auc_sum(
    scores: jnp.ndarray,  # [B, M] full-catalog scores, train positives masked to sentinel
    users: jnp.ndarray,
    valid: jnp.ndarray,
    test_pos: CSR,
    mask_sentinel: float,
) -> jnp.ndarray:
    """Sum of per-user AUC over valid users (reference `AUC`,
    /root/reference/metric.py:149-158: roc_auc over non-masked items with test
    items as positives). Rank-sum formulation, fully vectorized:
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg), where R_pos is the sum
    of 1-based ranks of positives by ascending score among unmasked items."""
    B, M = scores.shape
    is_pos = csr_contains(test_pos, users[:, None], jnp.arange(M)[None, :])
    unmasked = scores > mask_sentinel + 1.0
    order = jnp.argsort(scores, axis=1)  # ascending
    pos_sorted = jnp.take_along_axis(is_pos & unmasked, order, axis=1)
    un_sorted = jnp.take_along_axis(unmasked, order, axis=1)
    # rank among unmasked items = cumulative count of unmasked up to position
    ranks = jnp.cumsum(un_sorted.astype(jnp.float32), axis=1)
    r_pos = jnp.sum(jnp.where(pos_sorted, ranks, 0.0), axis=1)
    n_pos = jnp.sum(pos_sorted, axis=1).astype(jnp.float32)
    n_all = jnp.sum(un_sorted, axis=1).astype(jnp.float32)
    n_neg = n_all - n_pos
    auc = (r_pos - n_pos * (n_pos + 1) / 2) / jnp.maximum(n_pos * n_neg, 1.0)
    ok = valid & (n_pos > 0) & (n_neg > 0)
    return jnp.sum(jnp.where(ok, auc, 0.0))


def pmi_from_cooccurrence(train_user: np.ndarray, train_item: np.ndarray, m_items: int) -> np.ndarray:
    """[M, M] pointwise mutual information between items from train
    co-occurrence within users: pmi(i, j) = log(p(i, j) / (p(i) p(j))) over the
    per-user item baskets (the matrix the reference's dead Unexpectedness code
    expects as ``pmi``, `/root/reference/metric.py:127-140`). Host-side numpy;
    O(M^2) memory — intended for offline analysis, not the training loop."""
    import scipy.sparse as sp

    n_users = int(train_user.max()) + 1 if len(train_user) else 1
    B = sp.csr_matrix(
        (np.ones(len(train_user), np.float64), (train_user, train_item)),
        shape=(n_users, m_items),
    )
    B.data[:] = 1.0  # binary baskets
    co = np.asarray((B.T @ B).todense())  # [M, M] co-occurrence counts
    p_i = np.maximum(co.diagonal(), 1e-12) / n_users
    p_ij = co / n_users
    with np.errstate(divide="ignore"):
        pmi = np.log(np.maximum(p_ij, 1e-12) / (p_i[:, None] * p_i[None, :]))
    pmi[p_ij == 0] = 0.0
    return pmi.astype(np.float32)


def unexpectedness_from_pmi(
    graph, users: np.ndarray, topk: np.ndarray, pmi: np.ndarray
) -> float:
    """Mean over users of the mean PMI between the user's train positives and
    their recommendations (the real computation behind the reference's stub,
    `/root/reference/metric.py:129-140`: cartesian(history, recs) -> mean pmi).
    Lower = recommendations less co-occurring with history = more unexpected."""
    indptr = np.asarray(graph.user_pos.indptr)
    indices = np.asarray(graph.user_pos.indices)
    total = 0.0
    cnt = 0
    for row, u in enumerate(users):
        hist = indices[indptr[u] : indptr[u + 1]]
        if len(hist) == 0:
            continue
        total += float(np.mean(pmi[np.ix_(hist, topk[row])]))
        cnt += 1
    return total / max(cnt, 1)
