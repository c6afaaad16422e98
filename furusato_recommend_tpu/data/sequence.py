"""Per-user item sequences for the SASRec sequence tier.

The reference loads precomputed ``train_items_sequence.pkl`` +
``train_sequence_length.pt`` (`/root/reference/model/sasrec.py:205-208`) and
truncates to the last <=50 items per user (`/root/reference/model/sasrec.py:44-48`
SequenceDataset). Here sequences are built directly from the interaction arrays
(order = appearance order in the training data, or timestamp order when
edge times are available) as one padded [n_users, max_len] device array.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .dataset import Dataset

__all__ = ["UserSequences", "build_sequences", "load_sequence_artifacts"]

MAX_SEQ_LEN = 50  # /root/reference/model/sasrec.py:46-48


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class UserSequences:
    items: jnp.ndarray  # [n_users, max_len] int32, 0-padded (last items kept)
    lengths: jnp.ndarray  # [n_users] int32, clamped to max_len
    max_len: int = field(metadata=dict(static=True), default=MAX_SEQ_LEN)


def build_sequences(
    dataset: Dataset,
    max_len: int = MAX_SEQ_LEN,
    timestamps: Optional[np.ndarray] = None,
) -> UserSequences:
    u = np.asarray(dataset.train_user)
    i = np.asarray(dataset.train_item)
    if timestamps is not None:
        order = np.lexsort((np.asarray(timestamps), u))
    else:
        order = np.argsort(u, kind="stable")  # stable keeps appearance order
    u_s, i_s = u[order], i[order]
    bounds = np.searchsorted(u_s, np.arange(dataset.n_users + 1))
    out = np.zeros((dataset.n_users, max_len), np.int32)
    lengths = np.zeros(dataset.n_users, np.int32)
    for uu in range(dataset.n_users):
        row = i_s[bounds[uu] : bounds[uu + 1]][-max_len:]
        out[uu, : len(row)] = row
        lengths[uu] = len(row)
    return UserSequences(
        items=jnp.asarray(out), lengths=jnp.asarray(lengths), max_len=max_len
    )


def load_sequence_artifacts(
    data_path: str,
    suffix: str = "",
    n_users: Optional[int] = None,
    max_len: int = MAX_SEQ_LEN,
) -> UserSequences:
    """Load the reference's precomputed SASRec sequence artifacts —
    ``{data_path}/train_items_sequence{suffix}.pkl`` (per-user item sequences)
    + ``{data_path}/train_sequence_length{suffix}.pt`` (torch length tensor,
    `/root/reference/model/sasrec.py:205-208`) — into the padded static-shape
    ``UserSequences``. Truncation matches the reference's ``SequenceDataset``
    exactly: keep each sequence's LAST ``min(max_len, len)`` items and clamp
    lengths at ``max_len`` (`/root/reference/model/sasrec.py:44-48`).

    ``train_items`` may be a list indexed by user or a {user: seq} dict; users
    beyond its length (or absent keys) get empty sequences."""
    import pickle
    from pathlib import Path

    base = Path(data_path)
    with open(base / f"train_items_sequence{suffix}.pkl", "rb") as f:
        train_items = pickle.load(f)

    lengths_path = base / f"train_sequence_length{suffix}.pt"
    if lengths_path.exists():
        import torch

        lengths_raw = np.asarray(torch.load(lengths_path, map_location="cpu"))
    else:
        lengths_raw = None  # derive from the sequences themselves

    if isinstance(train_items, dict):
        n = (max(train_items) + 1) if train_items else 0
        seqs = [np.asarray(train_items.get(u, ()), np.int64) for u in range(n)]
    else:
        seqs = [np.asarray(s, np.int64) for s in train_items]
    if n_users is None:
        n_users = len(seqs)

    out = np.zeros((n_users, max_len), np.int32)
    lengths = np.zeros(n_users, np.int32)
    for u in range(min(n_users, len(seqs))):
        row = seqs[u][-max_len:]
        out[u, : len(row)] = row
        lengths[u] = len(row)
    if lengths_raw is not None:
        # the artifact's own lengths win where present (clamped like the
        # reference's `length[length>=50] = 50`), padded users stay 0
        k = min(n_users, len(lengths_raw))
        lengths[:k] = np.minimum(lengths_raw[:k], max_len).astype(np.int32)
    return UserSequences(
        items=jnp.asarray(out), lengths=jnp.asarray(lengths), max_len=max_len
    )
