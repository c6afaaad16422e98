"""Artifact writer: preprocessing outputs -> the on-disk feature set the model
layer loads (`data/features.py:load_reference_features` path scheme, matching
the reference's artifact names, `/root/reference/model/textsage.py:86-220`)."""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

__all__ = ["write_artifacts"]


def write_artifacts(
    base_path,
    suffix: str = "",
    *,
    user_categorical=None,  # [n_users, Fc] int
    item_categorical=None,
    user_numeric=None,  # [n_users, Fn] float
    item_numeric=None,
    user_word2vec=None,  # [n_users, 300]
    item_word2vec=None,
    item_sentence=None,  # [m_items, 768]
    user_text_vecs=None,  # dict field -> scipy csr (name/main_comment/main_list_comment)
    item_text_vecs=None,
    item_review_vec=None,  # scipy csr
    product_categories=None,  # [m_items, C] padded category ids (Diversity metric)
    user_bert=None,  # [n_users, Db] DeBERTa embeddings ('b' flag, mrec.py:154-157)
    item_bert=None,
    buy_timestamp=None,  # (n_users x m_items) scipy sparse OR [E] raw-order array
    user_attribute=None,  # [2, nnz] (user, attribute) COO (asage.py:55-79)
    item_attribute=None,
    favorite_edges=None,  # (u_arr, i_arr) favorite_train csv (rsage.py:168-187)
    review_edges=None,
) -> None:
    base = Path(base_path)
    cb = base / "cb" / suffix if suffix else base / "cb"
    tx = base / "text" / suffix if suffix else base / "text"
    cb.mkdir(parents=True, exist_ok=True)
    tx.mkdir(parents=True, exist_ok=True)

    def save_np(d, name, arr):
        if arr is not None:
            np.save(d / f"{name}{suffix}.npy", np.asarray(arr))

    def save_pkl(d, name, obj):
        if obj is not None:
            with open(d / f"{name}{suffix}.pkl", "wb") as f:
                pickle.dump(obj, f)

    save_np(cb, "customer_feature_pad", user_categorical)
    save_np(cb, "product_feature_pad", item_categorical)
    save_np(cb, "user_numeric_feature", user_numeric)
    save_np(cb, "product_numeric_feature", item_numeric)
    save_np(cb, "product_sentence_emb", item_sentence)
    save_np(tx, "user_text_emb", user_word2vec)
    save_np(tx, "product_text_emb", item_word2vec)
    if user_text_vecs:
        for field, mat in user_text_vecs.items():
            save_pkl(tx, f"user_{field}_count", mat)
    if item_text_vecs:
        for field, mat in item_text_vecs.items():
            save_pkl(tx, f"product_{field}_count", mat)
    save_pkl(tx, "product_review", item_review_vec)
    if product_categories is not None:
        save_np(cb, "product_categories", product_categories)

    # -- round-2 artifact set: bert / edge timestamps / attributes / relations --
    def save_pt(d, name, arr):
        if arr is not None:
            import torch

            d.mkdir(parents=True, exist_ok=True)
            torch.save(torch.as_tensor(np.asarray(arr)), d / f"{name}{suffix}.pt")

    save_pt(tx, "customer_deberta_feature", user_bert)
    save_pt(tx, "product_deberta_feature", item_bert)
    if buy_timestamp is not None:
        cf = base / "cf"
        cf.mkdir(parents=True, exist_ok=True)
        with open(cf / f"buy_timestamp{suffix}.pkl", "wb") as f:
            pickle.dump(buy_timestamp, f)
    save_pt(base / "attribute", "user_attribute", user_attribute)
    save_pt(base / "attribute", "product_attribute", item_attribute)
    for name, edges in (("favorite_train", favorite_edges), ("review_train", review_edges)):
        if edges is not None:
            import pandas as pd

            u, i = edges
            pd.DataFrame({"cf_customer": np.asarray(u), "cf_product": np.asarray(i)}).to_csv(
                base / f"{name}{suffix}.csv", index=False
            )
