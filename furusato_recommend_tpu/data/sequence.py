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

__all__ = ["UserSequences", "build_sequences"]

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
