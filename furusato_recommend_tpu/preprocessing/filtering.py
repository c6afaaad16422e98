"""Interaction filtering + RecBole export (host-side; SURVEY.md §2.5 last row).

The reference documents two dataset-preparation capabilities only in its
README (`/root/reference/README.md:3-13`): k-core interaction filtering
(``five_core`` / ``ten_core`` snippets) and conversion of its dataframes to
RecBole's atomic-file format (``conversion_tools/run.py --convert_inter
--convert_user --convert_item``).  This module is their equivalent.

Parity notes:

- ``five_core``/``ten_core`` reproduce the snippets exactly: ONE pass that
  keeps items with >= k interactions, then users with >= k interactions over
  the item-filtered frame.  A single pass can leave entities below k after the
  other side shrinks; the reference accepts that, so the default does too.
  ``k_core(..., iterate=True)`` is the fixpoint extension (flagged Deviation:
  strictly enforces the k-core; opt-in only).
- RecBole atomic files are tab-separated with ``name:type`` headers
  (token / float / token_seq), one file per table: ``{name}.inter``,
  ``{name}.user``, ``{name}.item``.  The reference shells out to RecBole's
  own ``conversion_tools``; we write the files directly so the capability has
  no external dependency.
"""

from __future__ import annotations

import os
from typing import Mapping, Optional, Sequence

import numpy as np
import pandas as pd

ITEM_COL = "remap_id"
USER_COL = "customer_id"


def _keep_by_count(df: pd.DataFrame, col: str, k: int) -> pd.DataFrame:
    counts = df[col].value_counts()
    return df[df[col].isin(counts[counts >= k].index)]


def k_core(
    df: pd.DataFrame,
    k: int,
    *,
    item_col: str = ITEM_COL,
    user_col: str = USER_COL,
    iterate: bool = False,
) -> pd.DataFrame:
    """k-core filter over an interaction frame.

    Default is the reference's single pass (items then users,
    `/root/reference/README.md:3-13`).  ``iterate=True`` repeats until no row
    is dropped, which guarantees every surviving user AND item has >= k
    interactions (Deviation: extension beyond the reference snippet).
    """
    if k <= 1:
        return df
    while True:
        n = len(df)
        df = _keep_by_count(df, item_col, k)
        df = _keep_by_count(df, user_col, k)
        if not iterate or len(df) == n:
            return df


def five_core(df: pd.DataFrame) -> pd.DataFrame:
    """`/root/reference/README.md:3-6` verbatim semantics."""
    return k_core(df, 5)


def ten_core(df: pd.DataFrame) -> pd.DataFrame:
    """`/root/reference/README.md:8-11` verbatim semantics."""
    return k_core(df, 10)


# --------------------------------------------------------------------------
# RecBole atomic-file export
# --------------------------------------------------------------------------

_RECBOLE_RENAME_INTER = {USER_COL: "user_id", ITEM_COL: "item_id"}


def _recbole_type(series: pd.Series) -> str:
    if pd.api.types.is_float_dtype(series):
        return "float"
    if pd.api.types.is_integer_dtype(series):
        # Integer columns default to token (RecBole treats ids as tokens).
        # Numeric int measurements (timestamps, ratings) need an explicit
        # ``types={'col': 'float'}`` override to be usable numerically.
        return "token"
    if series.map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any():
        return "token_seq"
    return "token"


def _write_atomic(
    df: pd.DataFrame,
    path: str,
    types: Optional[Mapping[str, str]] = None,
) -> None:
    types = dict(types or {})
    cols = list(df.columns)
    header = "\t".join(f"{c}:{types.get(c) or _recbole_type(df[c])}" for c in cols)
    out = df.copy()
    for c in cols:
        if (types.get(c) or _recbole_type(df[c])) == "token_seq":
            out[c] = out[c].map(
                lambda v: " ".join(str(x) for x in v)
                if isinstance(v, (list, tuple, np.ndarray))
                else str(v)
            )
    with open(path, "w", encoding="utf-8") as f:
        f.write(header + "\n")
        out.to_csv(f, sep="\t", header=False, index=False)


def write_recbole(
    out_dir: str,
    name: str,
    interactions: pd.DataFrame,
    users: Optional[pd.DataFrame] = None,
    items: Optional[pd.DataFrame] = None,
    *,
    item_col: str = ITEM_COL,
    user_col: str = USER_COL,
    extra_inter_cols: Sequence[str] = (),
    types: Optional[Mapping[str, str]] = None,
) -> dict:
    """Write RecBole atomic files: ``{name}.inter`` (+ optional .user/.item).

    Equivalent of the reference's `conversion_tools/run.py` invocation
    (`/root/reference/README.md:13`): ``--convert_inter`` always, and
    ``--convert_user`` / ``--convert_item`` when the side tables are given.
    Returns {suffix: path} for the files written.
    """
    os.makedirs(out_dir, exist_ok=True)
    written = {}

    inter = interactions[[user_col, item_col, *extra_inter_cols]].rename(
        columns={user_col: "user_id", item_col: "item_id"}
    )
    inter_types = {"user_id": "token", "item_id": "token"}
    inter_types.update(_table_types(types, "inter"))
    path = os.path.join(out_dir, f"{name}.inter")
    _write_atomic(inter, path, inter_types)
    written["inter"] = path

    if users is not None:
        udf = users.rename(columns={user_col: "user_id"})
        if "user_id" not in udf.columns:
            raise ValueError(f"users frame needs a '{user_col}' or 'user_id' column")
        upath = os.path.join(out_dir, f"{name}.user")
        _write_atomic(udf, upath, {"user_id": "token", **_table_types(types, "user")})
        written["user"] = upath

    if items is not None:
        idf = items.rename(columns={item_col: "item_id"})
        if "item_id" not in idf.columns:
            raise ValueError(f"items frame needs a '{item_col}' or 'item_id' column")
        ipath = os.path.join(out_dir, f"{name}.item")
        _write_atomic(idf, ipath, {"item_id": "token", **_table_types(types, "item")})
        written["item"] = ipath

    return written


def _table_types(types: Optional[Mapping[str, str]], table: str) -> dict:
    """Resolve a types mapping for one table. Keys may be plain column names
    (apply to every table) or namespaced ``"table.col"`` (apply only to that
    table — lets e.g. 'timestamp' be float in .inter but token in .user)."""
    out = {}
    for k, v in (types or {}).items():
        tbl, _, col = k.partition(".")
        if col:
            if tbl == table:
                out[col] = v
        else:
            out[k] = v
    return out


def read_recbole(path: str) -> pd.DataFrame:
    """Read back one atomic file (header types stripped into ``df.attrs``).

    Empty token_seq fields (e.g. an entity whose tag list was ``[]``) are
    written as empty fields, which pd.read_csv reads as NaN — normalize those
    back to the empty string so the roundtrip is lossless for sequences."""
    df = pd.read_csv(path, sep="\t")
    types = {}
    renames = {}
    for col in df.columns:
        base, _, typ = col.partition(":")
        renames[col] = base
        types[base] = typ or "token"
    df = df.rename(columns=renames)
    for col, typ in types.items():
        if typ == "token_seq":
            df[col] = df[col].fillna("")
    df.attrs["recbole_types"] = types
    return df
