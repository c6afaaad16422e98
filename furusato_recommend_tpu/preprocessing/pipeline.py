"""One-command preprocessing orchestrator: raw dataframes -> training-ready
artifact directory.

The reference ships this flow only as the executable spec
`/root/reference/preprocessing_main.py:12-126`: product-ID dedup ->
category/partner merges -> categorical/numeric/text features -> one
incremental ``update()`` round -> (externally) artifact files. Here the same
flow is a callable pipeline (``run_preprocessing``) exposed as
``python -m furusato_recommend_tpu.tools preprocess``; it ends at
``write_artifacts`` plus the ``cf/train.txt``/``cf/test.txt`` adjacency lists,
so its output directory trains directly (tests/test_full_chain.py chains
preprocess -> train -> rank -> infer end to end).

The incremental scenario is first-class: ``incremental_frac > 0`` holds out
that fraction of every input frame and pushes it through each component's
``update()`` after initialization — the reference's OFFSET slicing pattern
(`preprocessing_main.py:17-20,86-104`).

Deviations (documented):
- user-side text vectors (``user_{field}_count``) are the row-normalized sums
  of each user's purchased products' TF-IDF rows — the reference precomputes
  equivalent aggregated artifacts offline (its loaders at
  `/root/reference/ddp_cstr.py:292-298` read them; no in-repo producer exists).
- word2vec ('w') and DeBERTa ('b') artifacts need external pretrained models
  (gensim / HuggingFace) and are not produced here; train with feature flags
  drawn from n/c/t/s/r, or drop pretrained ``.npy`` files in place.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import scipy.sparse as sp

from .artifacts import write_artifacts
from .categorical import CustomerCategoricalFeature, ProductCategoricalFeature
from .category import CategoryInfo, ProductCategoryInfo, padded_categories
from .ids import CustomerIDInfo, ProductIDInfo, TimeProcessing, TransactionInfo
from .numeric import CustomerNumericFeature, ProductNumericFeature
from .partner import PartnerMerge
from .text import ProductReviewFeature, ProductTextFeature

__all__ = ["run_preprocessing"]


def _split(df: Optional[pd.DataFrame], frac: float):
    """orig/new slicing (reference OFFSET pattern, preprocessing_main.py:17-20)."""
    if df is None:
        return None, None
    if frac <= 0 or len(df) < 2:
        return df, None
    cut = max(1, int(len(df) * (1.0 - frac)))
    return df.iloc[:cut], df.iloc[cut:] if cut < len(df) else None


def _user_text_vecs(item_vecs, tx_user, tx_item, n_users):
    """Per-user aggregated text vectors: row-normalized sum of purchased
    products' TF-IDF rows (see module docstring deviation note)."""
    E = len(tx_user)
    inter = sp.csr_matrix(
        (np.ones(E), (np.asarray(tx_user), np.asarray(tx_item))),
        shape=(n_users, item_vecs["name"].shape[0]),
    )
    deg = np.asarray(inter.sum(axis=1)).ravel()
    norm = sp.diags(1.0 / np.maximum(deg, 1.0))
    return {f: (norm @ inter @ v).tocsr() for f, v in item_vecs.items()}


def run_preprocessing(
    products: pd.DataFrame,
    customers: pd.DataFrame,
    transactions: pd.DataFrame,
    out_dir: str,
    *,
    product_category: Optional[pd.DataFrame] = None,
    partner: Optional[pd.DataFrame] = None,
    reviews: Optional[pd.DataFrame] = None,
    suffix: str = "",
    incremental_frac: float = 0.0,
    test_holdout: int = 1,
    product_cat_cols=("head_office_pref", "head_office_addr01"),
    customer_cat_cols=("sex", "pref", "age"),
    customer_numeric_cols=("head_office_pref", "head_office_addr01"),
    product_numeric_cols=("pref",),
) -> dict:
    """Execute the full preprocessing flow; returns a summary dict.

    products: raw product frame (product_id, name, minimum_donation_price,
        parent_product_id, partner_id, ... — `preprocessing_main.py:17`)
    customers: raw customer frame (customer_id + categorical cols; a
        ``birth_year`` column is converted to ``age`` like the reference's
        TimeProcessing, customer_id_info.py:38-48)
    transactions: interaction frame; either already-converted ``cf_customer``/
        ``cf_product`` columns or raw ``customer_id``/``product_id`` (converted
        through the ID maps built here)
    product_category: optional (product_id, category_id) frame
    partner: optional partner frame left-joined for office prefecture/address
    reviews: optional (product_id or cf_product, recommend_level, comment)
    incremental_frac: fraction of every input pushed through ``update()`` after
        initialization (0 = single initialize pass)
    test_holdout: last-k interactions per user written to ``cf/test{sfx}.txt``
    """
    # --- 1. product IDs: dedup + incremental update (preprocessing_main.py:22-27,71-77)
    prod_orig, prod_new = _split(products, incremental_frac)
    pid = ProductIDInfo(prod_orig)
    if prod_new is not None:
        pid.update(prod_new)
    experiment_df = pid.experiment_df

    # --- 2. partner merge (preprocessing_main.py:64-67)
    if partner is not None:
        experiment_df = PartnerMerge(partner).transform(experiment_df)
        experiment_df.index = pid.experiment_df.index

    n_product = pid.n_product
    # experiment_df rows indexed by cf_product; reindex into a dense [n_product]
    # frame so feature rows align with ids even if dedup left gaps
    dense_products = experiment_df.reindex(np.arange(n_product))
    dense_products["cf_product"] = np.arange(n_product)

    # --- 3. customers: IDs + age transform (preprocessing_main.py:98-112)
    cust_orig, cust_new = _split(customers, incremental_frac)
    cid = CustomerIDInfo(cust_orig)
    if cust_new is not None:
        cid.update(cust_new)
    customer_df = pd.concat([cust_orig] + ([cust_new] if cust_new is not None else []))
    customer_df = cid.convert_df(customer_df.reset_index(drop=True))
    if "birth_year" in customer_df.columns and "age" not in customer_df.columns:
        customer_df = TimeProcessing(customer_df).transform()
    n_customer = cid.n_customer

    # --- 4. transactions -> cf ids (TransactionInfo, preprocessing_main.py:86-91)
    tx = transactions.copy()
    if "cf_product" not in tx.columns:
        conv = pid.productid_converter
        tx["cf_product"] = tx["product_id"].map(conv)
    if "cf_customer" not in tx.columns:
        cmap = dict(zip(customer_df["customer_id"], customer_df["cf_customer"]))
        tx["cf_customer"] = tx["customer_id"].map(cmap)
    tx = tx.dropna(subset=["cf_customer", "cf_product"])
    tx["cf_customer"] = tx["cf_customer"].astype(np.int64)
    tx["cf_product"] = tx["cf_product"].astype(np.int64)
    tx_orig, tx_new = _split(tx, incremental_frac)
    tinfo = TransactionInfo(tx_orig)
    if tx_new is not None:
        tinfo.update(tx_new)

    # --- 5. categorical features, both sides (preprocessing_main.py:69-70,106-112)
    prod_cat_cols = [c for c in product_cat_cols if c in dense_products.columns]
    pc = ProductCategoricalFeature(dense_products, prod_cat_cols) if prod_cat_cols else None
    cust_cat_cols = [c for c in customer_cat_cols if c in customer_df.columns]
    cc = CustomerCategoricalFeature(customer_df, cust_cat_cols) if cust_cat_cols else None

    # --- 6. numeric cross-purchase counters (preprocessing_main.py:116-126)
    cn_cols = [c for c in customer_numeric_cols if c in dense_products.columns]
    cnum = CustomerNumericFeature(n_customer, dense_products, cn_cols) if cn_cols else None
    pn_cols = [c for c in product_numeric_cols if c in customer_df.columns]
    pnum = ProductNumericFeature(n_product, customer_df, pn_cols) if pn_cols else None
    for f in (cnum, pnum):
        if f is None:
            continue
        f.initialize(tx_orig)
        if tx_new is not None:
            f.update_counter(tx_new)

    # --- 7. text features + incremental update (preprocessing_main.py:53-58)
    text_source = dense_products.copy()
    for c in ProductTextFeature.TEXT_COLS:
        if c not in text_source.columns:
            text_source[c] = ""
    cut = n_product if prod_new is None else pid._previous_max_id + 1
    tf = ProductTextFeature(text_source.iloc[:cut])
    if cut < n_product:
        tf.update(text_source.iloc[cut:])
    item_vecs = {
        "name": tf.name_vec,
        "main_comment": tf.main_comment_vec,
        "main_list_comment": tf.main_list_comment_vec,
    }
    user_vecs = _user_text_vecs(
        item_vecs, tinfo.df["cf_customer"].values, tinfo.df["cf_product"].values, n_customer
    )

    # --- 8. reviews (preprocessing_main.py:43-50)
    review_vec = None
    if reviews is not None:
        rdf = reviews.copy()
        if "cf_product" not in rdf.columns:
            rdf["cf_product"] = rdf["product_id"].map(pid.productid_converter)
        r_orig, r_new = _split(rdf, incremental_frac)
        rf = ProductReviewFeature(dense_products, r_orig, tf.tfidf_vectorizer)
        rf.update_info(n_product)
        if r_new is not None:
            rf.update_feature(r_new)
        review_vec = rf.get_tfidf_vec()

    # --- 9. category membership (preprocessing_main.py:30-40,59-62)
    prod_categories = None
    if product_category is not None:
        cat_orig, cat_new = _split(product_category, incremental_frac)
        cat_orig = pid.convert_df(cat_orig.copy())
        ci = CategoryInfo(cat_orig)
        if cat_new is not None:
            ci.update(pid.convert_df(cat_new.copy()))
        pci = ProductCategoryInfo(
            ci.product_category_df, n_product=n_product, n_category=ci.n_categories
        )
        prod_categories = padded_categories(pci)

    # --- 10. write the artifact directory the trainer loads
    write_artifacts(
        out_dir,
        suffix=suffix,
        user_categorical=None if cc is None else cc.get_feature(),
        item_categorical=None if pc is None else pc.get_feature(),
        user_numeric=None if cnum is None else cnum.get_feature(),
        item_numeric=None if pnum is None else pnum.get_feature(),
        item_sentence=tf.sentence_embedding,
        user_text_vecs=user_vecs,
        item_text_vecs=item_vecs,
        item_review_vec=review_vec,
        product_categories=prod_categories,
    )

    # --- 11. interaction splits: last-k per user -> test (cf/{train,test}.txt)
    from pathlib import Path

    cf_dir = Path(out_dir) / "cf" / suffix if suffix else Path(out_dir) / "cf"
    cf_dir.mkdir(parents=True, exist_ok=True)
    u = tinfo.df["cf_customer"].values
    i = tinfo.df["cf_product"].values
    order = np.argsort(u, kind="stable")
    u_s, i_s = u[order], i[order]
    bounds = np.searchsorted(u_s, np.arange(n_customer + 1))
    with open(cf_dir / f"train{suffix}.txt", "w") as ftr, open(
        cf_dir / f"test{suffix}.txt", "w"
    ) as fte:
        for uu in range(n_customer):
            row = i_s[bounds[uu] : bounds[uu + 1]]
            if len(row) == 0:
                continue
            k = min(test_holdout, max(len(row) - 1, 0))
            tr_items = row[: len(row) - k] if k else row
            te_items = row[len(row) - k :] if k else row[:0]
            if len(tr_items):
                ftr.write(f"{uu} " + " ".join(map(str, tr_items)) + "\n")
            if len(te_items):
                fte.write(f"{uu} " + " ".join(map(str, te_items)) + "\n")

    return {
        "out_dir": str(out_dir),
        "n_product": n_product,
        "n_customer": n_customer,
        "n_transaction": tinfo.n_transaction,
        "incremental_updates": int(incremental_frac > 0),
        "item_categorical_shape": None if pc is None else list(pc.get_feature().shape),
        "user_categorical_shape": None if cc is None else list(cc.get_feature().shape),
        "text_vocab": int(item_vecs["name"].shape[1]),
        "has_reviews": review_vec is not None,
        "has_categories": prod_categories is not None,
    }
