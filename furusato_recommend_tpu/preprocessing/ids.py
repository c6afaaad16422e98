"""Entity-ID management with the initialize/update incremental protocol.

Reference components (SURVEY.md §2.5):
- `ProductIDInfo` (`/root/reference/preprocessing/product/product_id_info.py`):
  dedups raw product ids into experiment ids (``cf_product``) — same name ->
  same id; same parent_id -> same id; otherwise a NEW id unless the
  Levenshtein ratio with the *previous row's* name is >= 0.9 AND the price
  differs by <= 1000 yen (the reference's sequential-dedup rule,
  `:157-193`). Levenshtein runs in the C++ kernel (preprocessing/native.py).
- `CustomerIDInfo` (`/root/reference/preprocessing/customer/customer_id_info.py`):
  serial customer -> cf_customer mapping; birth-date -> age transform.
- `TransactionInfo` (`/root/reference/preprocessing/transaction/__init__.py`):
  append-only transaction store.
"""

from __future__ import annotations

import datetime
from typing import Dict, Optional, Union

import numpy as np
import pandas as pd

from .native import lev_ratio

__all__ = ["ProductIDInfo", "CustomerIDInfo", "TransactionInfo", "birth_year", "TimeProcessing"]


class ProductIDInfo:
    """Product-ID -> experiment-ID (cf_product) dedup with incremental update."""

    def __init__(self, product_basic_info_df: pd.DataFrame):
        self._basic_info_df: Optional[pd.DataFrame] = None
        self._productname_remap: Dict[str, int] = {}
        self._parentid_remap: Dict = {}
        self._remapped_ids: np.ndarray = np.empty(0, np.int64)
        self._new_basic_info_df: Optional[pd.DataFrame] = None
        self._new_remapped_ids: np.ndarray = np.empty(0, np.int64)
        self._previous_max_id = 0
        self.initialize(product_basic_info_df)

    # -- properties (reference API surface) --
    @property
    def n_product(self) -> int:
        return int(self._remapped_ids.max()) + 1

    @property
    def basic_info(self) -> pd.DataFrame:
        return self._basic_info_df

    @property
    def max_remapped_id(self) -> int:
        return 0 if len(self._remapped_ids) == 0 else int(self._remapped_ids.max())

    @property
    def experiment_df(self) -> pd.DataFrame:
        df = self._basic_info_df.copy()
        assert len(df) == len(self._remapped_ids)
        df.loc[:, "cf_product"] = self._remapped_ids
        df = df.drop_duplicates(subset="cf_product", keep="last").set_index(
            "cf_product", drop=False
        )
        return df

    @property
    def productid_converter(self) -> Dict:
        assert len(self._remapped_ids) == len(self._basic_info_df)
        return dict(zip(self._basic_info_df["product_id"], self._remapped_ids))

    def convert_product_id(self, product_id) -> Optional[int]:
        return self.productid_converter.get(product_id)

    def convert_df(self, df: Union[pd.DataFrame, pd.Series]) -> Union[pd.DataFrame, pd.Series]:
        conv = self.productid_converter
        df["cf_product"] = df["product_id"].map(conv)
        return df

    def get_new_experiment_df(self, unseen: bool = False) -> pd.DataFrame:
        experiment_df = self.experiment_df
        new_unique = np.unique(self._new_remapped_ids)
        out = experiment_df.loc[new_unique, :]
        if unseen:
            return out[out["cf_product"] > self._previous_max_id]
        return out

    # -- core --
    def initialize(self, basic_info: pd.DataFrame) -> None:
        assert self.max_remapped_id == 0
        remapped, self._productname_remap, self._parentid_remap = self._assign_ids(
            basic_info, self._productname_remap, self._parentid_remap, 0
        )
        self._basic_info_df = basic_info
        self._remapped_ids = remapped
        self._new_basic_info_df = basic_info
        self._new_remapped_ids = remapped

    def update(self, new_product_info_df: pd.DataFrame) -> None:
        assert len(self._remapped_ids) > 0
        max_id = self.max_remapped_id
        new_ids, self._productname_remap, self._parentid_remap = self._assign_ids(
            new_product_info_df, self._productname_remap, self._parentid_remap, max_id
        )
        self._previous_max_id = max_id
        self._basic_info_df = pd.concat([self._basic_info_df, new_product_info_df])
        self._remapped_ids = np.concatenate([self._remapped_ids, new_ids])
        self._new_basic_info_df = new_product_info_df
        self._new_remapped_ids = new_ids

    @staticmethod
    def _assign_ids(df: pd.DataFrame, name_remap: Dict, parent_remap: Dict, max_id: int):
        """Sequential dedup (reference convert_productid_to_experiment_id,
        product_id_info.py:157-193): each row joins an existing id via
        name/parent match, else opens a new id when Levenshtein(prev_name, name)
        < 0.9 OR |price diff| > 1000.

        Deviation (defect fix, documented per SURVEY.md §2.5): the reference
        assigns the *first row of every batch* the current max id
        unconditionally (remapped_ids[0] = max_remapped_id), silently merging
        an arbitrary new product into the last id of the previous batch. Here
        the first row goes through the same name/parent lookup; an unseen
        first row opens a fresh id."""
        names = df["name"].values
        prices = df["minimum_donation_price"].values
        parents = df["parent_product_id"].values
        n = len(names)
        ids = np.zeros(n, dtype=np.int64)
        if n == 0:
            return ids, name_remap, parent_remap
        fresh_table = not name_remap and not parent_remap

        def assign(i, prev_name, prev_price):
            nonlocal max_id
            name, price, ppi = names[i], prices[i], parents[i]
            if name in name_remap:
                return name_remap[name]
            similar = (
                prev_name is not None
                and lev_ratio(str(prev_name), str(name)) >= 0.9
                and abs(prev_price - price) <= 1000
            )
            if isinstance(ppi, float) and not pd.isna(ppi):
                if ppi in parent_remap:
                    return parent_remap[ppi]
                if not similar:
                    max_id += 1
                parent_remap[ppi] = max_id
                return max_id
            if not similar:
                max_id += 1
            name_remap[name] = max_id
            return max_id

        if fresh_table:
            # initialize(): first row anchors id 0 (reference behavior)
            ids[0] = max_id
            name_remap[names[0]] = max_id
            if isinstance(parents[0], float) and not pd.isna(parents[0]):
                parent_remap[parents[0]] = max_id
        else:
            ids[0] = assign(0, None, None)
        for i in range(1, n):
            ids[i] = assign(i, names[i - 1], prices[i - 1])
        return ids, name_remap, parent_remap


def birth_year(birth) -> Optional[int]:
    """'%m/%d/%Y %H:%M:%S AM/PM' -> year (customer_id_info.py:5-12)."""
    if pd.isna(birth):
        return None
    if "AM" in birth:
        return datetime.datetime.strptime(birth, "%m/%d/%Y %H:%M:%S AM").year
    if "PM" in birth:
        return datetime.datetime.strptime(birth, "%m/%d/%Y %H:%M:%S PM").year
    return None


class TimeProcessing:
    """birth date -> age in [0, 100] (customer_id_info.py:38-48)."""

    def __init__(self, customer_df: pd.DataFrame):
        self._customer_df = customer_df

    def transform(self) -> pd.DataFrame:
        df = self._customer_df
        df["birth_year"] = df["birth_year"].apply(birth_year)
        df["age"] = (2023 - df["birth_year"]).clip(0, 100)
        return df


class CustomerIDInfo:
    """Serial customer -> cf_customer mapping (1:1, append-only)."""

    def __init__(self, customer_basic_info_df: pd.DataFrame):
        self._customer_ids = customer_basic_info_df["customer_id"]

    def update(self, new_customer_basic_info_df: pd.DataFrame) -> None:
        self._customer_ids = pd.concat(
            [self._customer_ids, new_customer_basic_info_df["customer_id"]]
        )

    @property
    def n_customer(self) -> int:
        return len(self._customer_ids)

    def convert_df(self, customer_df: pd.DataFrame) -> pd.DataFrame:
        customer_df["cf_customer"] = np.arange(len(customer_df))
        return customer_df


class TransactionInfo:
    """Append-only transaction store (transaction/__init__.py:3-17)."""

    def __init__(self, transaction_df: pd.DataFrame):
        self._transaction_df = transaction_df

    def update(self, new_transaction_df: pd.DataFrame) -> None:
        self._transaction_df = pd.concat([self._transaction_df, new_transaction_df])

    @property
    def n_transaction(self) -> int:
        return len(self._transaction_df)

    @property
    def df(self) -> pd.DataFrame:
        return self._transaction_df
