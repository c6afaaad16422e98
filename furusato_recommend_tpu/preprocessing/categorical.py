"""Categorical feature encoding with global 0-indexed offsets + incremental update.

Reference (`/root/reference/preprocessing/product/product_categorical_feature.py:5-65`,
`customer_categorical_feature.py:5-72`): per column, an OrdinalEncoder whose
NaN/unknown values map to ``max_class + 1``; columns are packed into one matrix
with cumulative offsets so every id lives in a single global vocabulary (this is
exactly the layout the TextSAGE categorical embedding-bag consumes). Update pads
new entity rows and re-encodes only the new rows with the frozen encoders.

`category_encoders` is replaced by a small OrdinalEncoder with identical
semantics (1-based codes, NaN/unseen -> NaN at transform, then max+1)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd

__all__ = ["OrdinalEncoder", "CategoricalFeature", "ProductCategoricalFeature", "CustomerCategoricalFeature"]


class OrdinalEncoder:
    """1-based ordinal codes; unseen/NaN -> NaN (category_encoders'
    handle_missing='return_nan', handle_unknown='return_nan' behavior)."""

    def __init__(self):
        self.mapping: Dict = {}

    def fit_transform(self, col: pd.Series) -> np.ndarray:
        classes = [c for c in pd.unique(col) if not pd.isna(c)]
        self.mapping = {c: i + 1 for i, c in enumerate(classes)}
        return self.transform(col)

    def transform(self, col: pd.Series) -> np.ndarray:
        return np.asarray(
            [self.mapping.get(v, np.nan) if not pd.isna(v) else np.nan for v in col],
            dtype=np.float64,
        )


class CategoricalFeature:
    """Shared implementation for both sides."""

    def __init__(self, unique_df: pd.DataFrame, category_columns: List[str], id_col: str):
        self._category_columns = category_columns
        self._id_col = id_col
        self._label_encoders: Dict[str, OrdinalEncoder] = {}
        self._max_features: Dict[str, int] = {}
        self._unique_df = unique_df
        self._categorical_features: Optional[np.ndarray] = None
        self.initialize(unique_df)

    def initialize(self, unique_df: pd.DataFrame) -> None:
        feats = []
        offset = 0
        for col in self._category_columns:
            assert col in unique_df.columns, f"{col} not in df"
            enc = OrdinalEncoder()
            f = enc.fit_transform(unique_df[col])
            max_f = int(np.nanmax(f)) + 1 if np.isfinite(np.nanmax(f)) else 1
            f = np.nan_to_num(f, nan=max_f)
            f += offset
            self._max_features[col] = max_f
            self._label_encoders[col] = enc
            feats.append(f[:, None])
            offset += max_f + 1  # +1: the nan class occupies max_f within the block
        self._categorical_features = np.concatenate(feats, axis=1).astype(np.int64)

    def update(self, new_unique_df: pd.DataFrame) -> None:
        feats = self._categorical_features
        size = int(new_unique_df[self._id_col].max()) + 1
        if size > feats.shape[0]:
            feats = np.pad(feats, ((0, size - feats.shape[0]), (0, 0)))
        idx = new_unique_df[self._id_col].values
        offset = 0
        for i, col in enumerate(self._category_columns):
            enc = self._label_encoders[col]
            f = enc.transform(new_unique_df[col])
            max_f = self._max_features[col]
            f = np.nan_to_num(f, nan=max_f)
            feats[idx, i] = (f + offset).astype(np.int64)
            offset += max_f + 1
        self._unique_df = pd.concat([self._unique_df, new_unique_df], axis=0)
        self._categorical_features = feats

    def get_feature(self) -> np.ndarray:
        return self._categorical_features

    @property
    def vocab_size(self) -> int:
        return int(self._categorical_features.max()) + 1


class ProductCategoricalFeature(CategoricalFeature):
    def __init__(
        self,
        product_unique_df: pd.DataFrame,
        category_columns=("head_office_pref", "head_office_addr01"),
    ):
        super().__init__(product_unique_df, list(category_columns), id_col="cf_product")


class CustomerCategoricalFeature(CategoricalFeature):
    def __init__(
        self,
        customer_unique_df: pd.DataFrame,
        category_columns=("sex", "pref", "age"),
    ):
        super().__init__(customer_unique_df, list(category_columns), id_col="cf_customer")
