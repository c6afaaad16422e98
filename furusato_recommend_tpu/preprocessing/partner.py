"""PartnerMerge: left-join partner (municipality office) prefecture/address
onto products (`/root/reference/preprocessing/utils/partner_merge.py:2-8`)."""

from __future__ import annotations

import pandas as pd

__all__ = ["PartnerMerge"]


class PartnerMerge:
    def __init__(self, partner_df: pd.DataFrame):
        self._partner_df = partner_df

    def transform(self, product_unique_df: pd.DataFrame) -> pd.DataFrame:
        return pd.merge(
            product_unique_df,
            self._partner_df[["partner_id", "head_office_pref", "head_office_addr01"]],
            on="partner_id",
            how="left",
        )
