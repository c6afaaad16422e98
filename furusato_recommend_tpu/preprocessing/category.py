"""Category encoding + product x category membership.

Reference (`/root/reference/preprocessing/product/product_category_info.py:1-103`):
`CategoryInfo` ordinal-encodes category_id with NaN/unseen -> max class;
`ProductCategoryInfo` builds a product x category COO membership matrix dedup'd
through per-product sets. Feeds the Diversity metric's category sets
(`/root/reference/metric.py:105-115`)."""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional

import numpy as np
import pandas as pd
import scipy.sparse as sp

from .categorical import OrdinalEncoder

__all__ = ["CategoryInfo", "ProductCategoryInfo", "padded_categories"]


class CategoryInfo:
    def __init__(self, product_category_df: pd.DataFrame):
        self._encoder = OrdinalEncoder()
        self._max_category_num = 0
        self.initialize(product_category_df)

    @property
    def product_category_df(self) -> pd.DataFrame:
        return self._category_df

    def initialize(self, category_df: pd.DataFrame) -> None:
        category_df = category_df.copy()
        label = self._encoder.fit_transform(category_df["category_id"])
        max_num = int(np.nanmax(label)) + 1 if len(label) else 1
        label = np.nan_to_num(label, nan=max_num)
        category_df["category_id"] = label
        self._category_df = category_df
        self._new_category_df = category_df
        self._max_category_num = max_num

    def update(self, new_category_df: pd.DataFrame) -> None:
        new_category_df = new_category_df.copy()
        label = self._encoder.transform(new_category_df["category_id"])
        label = np.nan_to_num(label, nan=self._max_category_num)
        new_category_df["category_id"] = label
        self._category_df = pd.concat([self._category_df, new_category_df])
        self._new_category_df = new_category_df

    @property
    def n_categories(self) -> int:
        return self._max_category_num + 1


class ProductCategoryInfo:
    """product x category COO membership, dedup'd via per-product sets."""

    def __init__(self, product_category_df: pd.DataFrame, n_product: int, n_category: int):
        self._sets: Dict[int, set] = defaultdict(set)
        self._n_product = n_product
        self._n_category = n_category
        self.update(product_category_df)

    def update(self, product_category_df: pd.DataFrame, productid_converter: Optional[Dict] = None) -> None:
        key = "product_id" if productid_converter is not None else "cf_product"
        for pid, cid in zip(product_category_df[key], product_category_df["category_id"]):
            if pd.isna(pid) or pd.isna(cid):
                continue
            if productid_converter is not None:
                if pid not in productid_converter:
                    continue
                pid = productid_converter[pid]
            self._sets[int(pid)].add(int(cid))

    def grow(self, n_product: int, n_category: int) -> None:
        self._n_product = max(self._n_product, n_product)
        self._n_category = max(self._n_category, n_category)

    @property
    def coo(self) -> sp.coo_matrix:
        rows, cols = [], []
        for p, cats in self._sets.items():
            for c in cats:
                rows.append(p)
                cols.append(c)
        return sp.coo_matrix(
            (np.ones(len(rows)), (rows, cols)), shape=(self._n_product, self._n_category)
        )

    def category_sets(self) -> Dict[int, set]:
        return dict(self._sets)


def padded_categories(info: ProductCategoryInfo, pad_to: Optional[int] = None) -> np.ndarray:
    """[n_product, C] int32, -1 padded — the device layout the Diversity metric
    consumes (eval/metrics.py)."""
    sets = info.category_sets()
    width = pad_to or max((len(s) for s in sets.values()), default=1)
    out = np.full((info._n_product, width), -1, dtype=np.int32)
    for p, cats in sets.items():
        row = sorted(cats)[:width]
        out[p, : len(row)] = row
    return out
