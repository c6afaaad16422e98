"""Production inference tier — the `ddp_inference.py` flow, TPU-native.

Reference (`/root/reference/ddp_inference.py:48-181`): load a trained
checkpoint, run full-graph inference where the propagation uses the
**inference edge set** (train+test interactions when ``suffix=='all'``,
`/root/reference/ddp.py:62-75`) while masking only the *train* positives,
then dump targeted per-user CSVs (batch indices 1000/5000/8500 at batch 1000)
with train / predicted / ground-truth names+ids.

Here: one jitted propagate over ``dataset.inference_graph``, one jitted
masked-score+top-K per user tile (same -2^10 sentinel), CSVs via
``eval.results.save_user_result``.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.dataset import Dataset
from ..models.base import PairwiseModel, Params
from ..ops.csr_search import csr_gather_padded
from .results import save_user_result

__all__ = ["production_inference"]

MASK_SENTINEL = -(1 << 10)  # /root/reference/ddp_inference.py:163


def production_inference(
    model: PairwiseModel,
    params: Params,
    dataset: Dataset,
    config: Config,
    out_dir,
    user_batch_size: int = 1000,  # USER_BATCH_SIZE, ddp_inference.py:114
    target_batches: Sequence[int] = (0,),  # reference ran (1000, 5000, 8500)
    k: Optional[int] = None,
    product_names: Optional[np.ndarray] = None,
    customer_ids: Optional[np.ndarray] = None,
) -> List[Path]:
    """Returns the list of CSV paths written (one per in-range target batch)."""
    g_train = dataset.graph  # masking source: TRAIN positives only
    g_inf = dataset.inference_graph  # propagation source: inference edges
    kmax = int(k if k is not None else config.max_topk)
    max_deg = g_train.max_user_degree or 1
    bound = model.data_to_bind()

    @jax.jit
    def _propagate(params, g, bound):
        with model.bind(bound):
            return model.propagate(params, g, None)

    @jax.jit
    def _masked_topk(users, user_emb, item_emb, g_mask):
        s = (user_emb[users] @ item_emb.T).astype(jnp.float32)
        if model.score_sigmoid:
            s = jax.nn.sigmoid(s)
        pos, mask = csr_gather_padded(g_mask.user_pos, users, max_deg)
        b = jnp.arange(users.shape[0])[:, None]
        cols = jnp.where(mask, pos, g_mask.m_items)
        s = s.at[b, cols].set(MASK_SENTINEL, mode="drop")
        _, ids = jax.lax.top_k(s, kmax)
        return ids

    user_emb, item_emb = _propagate(params, g_inf, bound)

    out_dir = Path(out_dir)
    paths: List[Path] = []
    for bi in target_batches:
        lo = bi * user_batch_size
        if lo >= dataset.n_users:
            print(f"[infer] batch {bi} out of range (n_users={dataset.n_users}); skipped")
            continue
        hi = min(lo + user_batch_size, dataset.n_users)
        users = np.arange(lo, hi, dtype=np.int32)
        pad = user_batch_size - len(users)
        users_dev = jnp.asarray(np.concatenate([users, np.zeros(pad, np.int32)]))
        ids = np.asarray(_masked_topk(users_dev, user_emb, item_emb, g_train))[: len(users)]
        # path scheme mirrors ddp_inference.py:81-83
        p = out_dir / (
            f"{config.model}_{config.latent_dim}_{config.n_layers}_{bi}_inference.csv"
        )
        save_user_result(
            p,
            dataset,
            users,
            ids,
            product_names=product_names,
            customer_ids=customer_ids,
            k=kmax,
        )
        paths.append(p)
        print(f"[infer] wrote {p} ({len(users)} users)")
    return paths
