"""Second-stage ranking feature assembly — the `make_X` contract.

Reference (`make_X`, `/root/reference/train_lgbm.py:46-64`): per (user, item)
candidate row, concatenate
``[item_categorical, user_categorical, user_numeric[:500], item_numeric[:500]]``
with the categorical columns first (LightGBM treated them as categorical
features by index, `/root/reference/train_lgbm.py:176-188`).

The TPU ranker consumes the same assembly: categorical id columns are embedded,
numeric columns are projected; column order and the :500 numeric cap are kept.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

from ..data.features import FeatureStore

__all__ = ["RankFeatureSpec", "make_X_ids", "rank_feature_spec"]

NUMERIC_CAP = 500  # user_num_feature[:, :500] (/root/reference/train_lgbm.py:60-61)


@dataclass(frozen=True)
class RankFeatureSpec:
    n_item_cat: int
    n_user_cat: int
    n_user_num: int
    n_item_num: int
    cat_vocab: int  # shared embedding-table size covering both sides' ids


def rank_feature_spec(features: FeatureStore) -> RankFeatureSpec:
    return RankFeatureSpec(
        n_item_cat=features.item.categorical.shape[1],
        n_user_cat=features.user.categorical.shape[1],
        n_user_num=min(features.user.numeric.shape[1], NUMERIC_CAP),
        n_item_num=min(features.item.numeric.shape[1], NUMERIC_CAP),
        cat_vocab=max(features.user_cat_vocab, features.item_cat_vocab),
    )


def make_X_ids(
    features: FeatureStore, users: jnp.ndarray, items: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble ranking inputs for (user, item) pairs of any shared shape [...]:

    Returns (cat_ids [..., n_item_cat + n_user_cat] int32,
             numeric [..., n_user_num + n_item_num] float32),
    column order matching the reference make_X.
    """
    users, items = jnp.broadcast_arrays(jnp.asarray(users), jnp.asarray(items))
    item_cat = features.item.categorical[items]
    user_cat = features.user.categorical[users]
    user_num = features.user.numeric[users][..., :NUMERIC_CAP]
    item_num = features.item.numeric[items][..., :NUMERIC_CAP]
    cat = jnp.concatenate([item_cat, user_cat], axis=-1)
    num = jnp.concatenate([user_num, item_num], axis=-1)
    return cat, num
