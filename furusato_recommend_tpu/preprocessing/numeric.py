"""Numeric (cross-purchase counter) features with incremental increment/update.

Reference (`/root/reference/preprocessing/customer/customer_numeric_feature.py:10-66`,
`product_numeric_feature.py`): a ``FeatureCounter`` accumulates, per entity, how
many of each class of the *other* side it interacted with (e.g. per customer,
counts over product prefectures). Output is the row-normalized dense matrix (the
reference emits float16). Incremental protocol: ``initialize(transactions)`` then
``update_counter(new_transactions)``; ``update_info`` extends entity counts.

The counter here is vectorized (np.add.at over (entity, class) pairs) instead of
a per-row Python dict loop."""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd
import scipy.sparse as sp

__all__ = ["FeatureCounter", "CustomerNumericFeature", "ProductNumericFeature"]


class FeatureCounter:
    def __init__(self, n_entity: int, col_name: str, col: pd.Series):
        self._counter_name = col_name
        self._counter_height = n_entity
        self._col = col.values
        self._classes = [c for c in pd.unique(col) if not pd.isna(c)]
        self._classname_to_id = {v: i for i, v in enumerate(self._classes)}
        self._counter_width = len(self._classes)
        self._counts = sp.dok_matrix((1, 1))  # replaced by _coo accumulation
        self._rows: List[int] = []
        self._cols: List[int] = []

    def update(self, new_n_entity: int, new_col: pd.Series) -> None:
        """Extend entity count / class source column (reference `update`)."""
        self._counter_height = new_n_entity
        self._col = np.concatenate([self._col, new_col.values])

    def increment_many(self, source_ids: np.ndarray, target_ids: np.ndarray) -> None:
        source_ids = np.asarray(source_ids, np.int64)
        target_ids = np.asarray(target_ids, np.int64)
        ok = (source_ids < self._counter_height) & (target_ids < len(self._col))
        s, t = source_ids[ok], target_ids[ok]
        vals = pd.Series(self._col[t])
        cls = vals.map(self._classname_to_id)
        has = cls.notna().values
        self._rows.extend(s[has].tolist())
        self._cols.extend(cls.values[has].astype(np.int64).tolist())

    def increment(self, source_id: int, target_id: int) -> None:
        self.increment_many(np.asarray([source_id]), np.asarray([target_id]))

    def get_result_numpy(self) -> np.ndarray:
        """Row-normalized dense counts (reference get_result_numpy,
        customer_numeric_feature.py:56-66)."""
        mat = sp.csr_matrix(
            (np.ones(len(self._rows)), (self._rows, self._cols)),
            shape=(self._counter_height, self._counter_width),
        )
        row_sum = np.asarray(mat.sum(axis=1)).ravel()
        inv = 1.0 / (row_sum + 1e-6)
        normed = sp.diags(inv) @ mat
        return np.asarray(normed.todense())


class _NumericFeature:
    def __init__(self, n_entity: int, other_unique_df: pd.DataFrame, col_names: List[str],
                 src_key: str, dst_key: str):
        self._n_entity = n_entity
        self._col_names = col_names
        self._src_key = src_key
        self._dst_key = dst_key
        self._feature_counters: Dict[str, FeatureCounter] = {
            c: FeatureCounter(n_entity, c, other_unique_df[c]) for c in col_names
        }

    def increment(self, transaction_data: pd.DataFrame) -> None:
        s = transaction_data[self._src_key].values
        t = transaction_data[self._dst_key].values
        for c in self._col_names:
            self._feature_counters[c].increment_many(s, t)

    def initialize(self, transaction_data_orig: pd.DataFrame) -> None:
        self.increment(transaction_data_orig)

    def update_counter(self, transaction_data_new: pd.DataFrame) -> None:
        self.increment(transaction_data_new)

    def update_info(self, new_n_entity: int, new_other_unique_df: pd.DataFrame) -> None:
        for c in self._col_names:
            self._feature_counters[c].update(new_n_entity, new_other_unique_df[c])

    def get_feature(self) -> np.ndarray:
        return np.concatenate(
            [fc.get_result_numpy().astype(np.float16) for fc in self._feature_counters.values()],
            axis=1,
        )


class CustomerNumericFeature(_NumericFeature):
    """Per customer: counts over product attribute classes."""

    def __init__(self, n_customer: int, product_unique_df: pd.DataFrame, col_names: List[str]):
        super().__init__(n_customer, product_unique_df, col_names,
                         src_key="cf_customer", dst_key="cf_product")


class ProductNumericFeature(_NumericFeature):
    """Per product: counts over customer attribute classes."""

    def __init__(self, n_product: int, customer_unique_df: pd.DataFrame, col_names: List[str]):
        super().__init__(n_product, customer_unique_df, col_names,
                         src_key="cf_product", dst_key="cf_customer")
