"""Qualitative result dump: per-user prediction CSVs with human-readable names.

Reference (`Trainer.save_result`, `/root/reference/trainer.py:189-216`;
`/root/reference/ddp.py:117-153`; `ddp_inference.py:48-85`): for each test user,
a row with customer id, train-item names/ids, predicted top-K names/ids, and
ground-truth names/ids, written to ``data/result/{model}/...csv`` — used for
qualitative inspection of recommendations.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd

from ..data.dataset import Dataset

__all__ = ["save_result", "save_user_result"]


def _join(names: Sequence) -> str:
    """CSV stringify (reference utils.join_list, /root/reference/utils.py:54)."""
    return ",".join(str(n) for n in names)


def save_result(
    path,
    dataset: Dataset,
    topk_ids: np.ndarray,  # [n_test_users, K] aligned with sorted test users
    product_names: Optional[np.ndarray] = None,  # [m_items] str
    customer_ids: Optional[np.ndarray] = None,  # [n_users] raw ids
    k: int = 10,
) -> pd.DataFrame:
    """Writes the per-user qualitative CSV; returns the dataframe."""
    names = (
        np.asarray(product_names)
        if product_names is not None
        else np.asarray([f"item_{i}" for i in range(dataset.m_items)])
    )
    cust = (
        np.asarray(customer_ids)
        if customer_ids is not None
        else np.arange(dataset.n_users)
    )
    ap = dataset.all_pos()
    td = dataset.test_dict()
    users = sorted(td.keys())
    rows = []
    for row_i, u in enumerate(users):
        pred = topk_ids[row_i][:k]
        rows.append(
            {
                "customer_id": cust[u],
                "train_ids": _join(ap[u]),
                "train_names": _join(names[ap[u]]),
                "predict_ids": _join(pred),
                "predict_names": _join(names[pred]),
                "gt_ids": _join(td[u]),
                "gt_names": _join(names[td[u]]),
            }
        )
    df = pd.DataFrame(rows)
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(p, index=False)
    return df


def save_user_result(
    path,
    dataset: Dataset,
    users: np.ndarray,  # explicit user batch (production-inference targeting)
    topk_ids: np.ndarray,  # [len(users), >=k]
    product_names: Optional[np.ndarray] = None,
    customer_ids: Optional[np.ndarray] = None,
    k: int = 10,
) -> pd.DataFrame:
    """Per-user CSV for an EXPLICIT user batch — the ddp_inference dump
    (`/root/reference/ddp_inference.py:48-85`): every user in the batch gets a
    row (ground truth may be empty), unlike save_result which covers test users.
    """
    names = (
        np.asarray(product_names)
        if product_names is not None
        else np.asarray([f"item_{i}" for i in range(dataset.m_items)])
    )
    cust = (
        np.asarray(customer_ids)
        if customer_ids is not None
        else np.arange(dataset.n_users)
    )
    ap = dataset.all_pos()
    td = dataset.test_dict()
    rows = []
    for row_i, u in enumerate(np.asarray(users)):
        u = int(u)
        pred = np.asarray(topk_ids[row_i][:k])
        gt = td.get(u, np.empty(0, dtype=np.int64))
        rows.append(
            {
                "customer_id": cust[u],
                "train_ids": _join(ap[u]),
                "train_names": _join(names[ap[u]]),
                "predict_ids": _join(pred),
                "predict_names": _join(names[pred]),
                "gt_ids": _join(gt),
                "gt_names": _join(names[gt]),
            }
        )
    df = pd.DataFrame(rows)
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(p, index=False)
    return df
