"""Incremental preprocessing pipeline tests — the pytest formalization of the
reference's executable spec `preprocessing_main.py:12-126` (which used inline
asserts on post-update counts)."""

import numpy as np
import pandas as pd
import pytest

from furusato_recommend_tpu.preprocessing import (
    CategoryInfo,
    CustomerCategoricalFeature,
    CustomerIDInfo,
    CustomerNumericFeature,
    PartnerMerge,
    ProductCategoryInfo,
    ProductIDInfo,
    ProductReviewFeature,
    ProductTextFeature,
    TransactionInfo,
    padded_categories,
    write_artifacts,
)
from furusato_recommend_tpu.preprocessing.categorical import ProductCategoricalFeature
from furusato_recommend_tpu.preprocessing.native import lev_ratio


@pytest.fixture()
def product_df():
    return pd.DataFrame(
        {
            "product_id": [100, 101, 102, 103, 104],
            "name": ["Wagyu beef set", "Wagyu beef set", "Melon 2pc", "Melon 2pcs", "Rice 10kg"],
            "minimum_donation_price": [10000, 10000, 8000, 8200, 12000],
            "parent_product_id": [np.nan, np.nan, np.nan, np.nan, np.nan],
            "partner_id": [1, 1, 2, 2, 3],
        }
    )


def test_product_id_dedup(product_df):
    info = ProductIDInfo(product_df)
    ids = info._remapped_ids
    # identical names dedup to one id
    assert ids[0] == ids[1]
    # near-identical name (ratio >= 0.9) with price within 1000 -> same id
    assert lev_ratio("Melon 2pc", "Melon 2pcs") >= 0.9
    assert ids[2] == ids[3]
    # distinct product -> new id
    assert ids[4] != ids[3]
    conv = info.productid_converter
    assert conv[100] == conv[101]
    assert info.convert_product_id(999) is None


def test_product_id_update(product_df):
    info = ProductIDInfo(product_df)
    n0 = info.n_product
    new = pd.DataFrame(
        {
            "product_id": [200, 201],
            "name": ["Wagyu beef set", "Apple juice 1L"],
            "minimum_donation_price": [10000, 5000],
            "parent_product_id": [np.nan, np.nan],
            "partner_id": [1, 4],
        }
    )
    info.update(new)
    # known name reuses its id; new product opens exactly one new id
    assert info.productid_converter[200] == info.productid_converter[100]
    assert info.n_product == n0 + 1
    unseen = info.get_new_experiment_df(unseen=True)
    assert len(unseen) == 1
    assert unseen.iloc[0]["name"] == "Apple juice 1L"


def test_customer_id_and_transactions():
    cdf = pd.DataFrame({"customer_id": ["a", "b", "c"]})
    info = CustomerIDInfo(cdf)
    assert info.n_customer == 3
    info.update(pd.DataFrame({"customer_id": ["d"]}))
    assert info.n_customer == 4
    t = TransactionInfo(pd.DataFrame({"cf_customer": [0], "cf_product": [1]}))
    t.update(pd.DataFrame({"cf_customer": [1, 2], "cf_product": [0, 1]}))
    assert t.n_transaction == 3


def test_categorical_feature_offsets_and_update():
    df = pd.DataFrame(
        {
            "cf_product": [0, 1, 2],
            "head_office_pref": ["hokkaido", "aomori", "hokkaido"],
            "head_office_addr01": ["x", None, "y"],
        }
    )
    f = ProductCategoricalFeature(df)
    feats = f.get_feature()
    assert feats.shape == (3, 2)
    # column blocks are disjoint (global 0-indexed vocabulary)
    assert set(feats[:, 0]).isdisjoint(set(feats[:, 1]))
    # NaN got its own class
    assert feats[1, 1] != feats[0, 1]
    # incremental update: unseen class maps to the per-column nan/new slot
    new = pd.DataFrame(
        {"cf_product": [3], "head_office_pref": ["okinawa"], "head_office_addr01": ["x"]}
    )
    f.update(new)
    feats2 = f.get_feature()
    assert feats2.shape == (4, 2)
    assert feats2[3, 1] == feats[0, 1]  # seen class same code


def test_numeric_counter():
    products = pd.DataFrame({"cf_product": [0, 1, 2], "pref": ["h", "a", "h"]})
    f = CustomerNumericFeature(3, products, ["pref"])
    tx = pd.DataFrame({"cf_customer": [0, 0, 1], "cf_product": [0, 2, 1]})
    f.initialize(tx)
    feat = f.get_feature()
    assert feat.shape == (3, 2)
    # customer 0 bought two 'h' products -> normalized row ~ [1, 0]
    np.testing.assert_allclose(np.asarray(feat[0], np.float64), [1.0, 0.0], atol=1e-2)
    # incremental
    f.update_counter(pd.DataFrame({"cf_customer": [0], "cf_product": [1]}))
    feat2 = f.get_feature()
    assert feat2[0, 1] > 0


def test_text_feature_and_incremental_update():
    df = pd.DataFrame(
        {
            "name": ["北海道産いくら醤油漬け", "山形県産さくらんぼ"],
            "main_comment": ["新鮮ないくらです", "甘いさくらんぼ"],
            "main_list_comment": ["おすすめ", "人気"],
        }
    )
    tf = ProductTextFeature(df)
    assert tf.name_vec.shape[0] == 2
    assert tf.sentence_embedding.shape == (2, 768)
    tf.update(
        pd.DataFrame(
            {"name": ["宮崎牛すき焼き"], "main_comment": ["柔らかい"], "main_list_comment": [""]}
        )
    )
    assert tf.name_vec.shape[0] == 3
    assert tf.sentence_embedding.shape[0] == 3


def test_review_feature():
    products = pd.DataFrame({"cf_product": [0, 1]})
    reviews = pd.DataFrame(
        {
            "cf_product": [0, 0, 1],
            "recommend_level": [5, 4, 3],
            "comment": ["とても美味しいいくら", "美味しい", "普通です"],
        }
    )
    df = pd.DataFrame(
        {"name": ["いくら", "melon"], "main_comment": ["", ""], "main_list_comment": ["", ""]}
    )
    tf = ProductTextFeature(df)
    rf = ProductReviewFeature(products, reviews, tf.tfidf_vectorizer)
    assert rf.review_cnt.tolist() == [2, 1]
    np.testing.assert_allclose(rf.review_rate_mean, [4.5, 3.0])
    vec = rf.get_tfidf_vec()
    assert vec.shape[0] == 2
    assert set(np.unique(vec.data)) <= {1.0}  # thresholded binary
    rf.update_feature(
        pd.DataFrame({"cf_product": [1], "recommend_level": [5], "comment": ["最高"]})
    )
    assert rf.review_cnt.tolist() == [2, 2]


def test_category_info_and_padded():
    cat_df = pd.DataFrame({"cf_product": [0, 0, 1], "category_id": ["meat", "seafood", "meat"]})
    ci = CategoryInfo(cat_df)
    enc_df = ci.product_category_df
    pci = ProductCategoryInfo(enc_df, n_product=2, n_category=ci.n_categories)
    coo = pci.coo
    assert coo.shape[0] == 2
    assert coo.sum() == 3
    # duplicates dedup'd
    pci.update(enc_df)
    assert pci.coo.sum() == 3
    padded = padded_categories(pci)
    assert padded.shape[0] == 2
    assert (padded[0] >= 0).sum() == 2


def test_partner_merge(product_df):
    partner = pd.DataFrame(
        {"partner_id": [1, 2, 3], "head_office_pref": ["h", "a", "o"], "head_office_addr01": ["x", "y", "z"]}
    )
    out = PartnerMerge(partner).transform(product_df)
    assert "head_office_pref" in out.columns
    assert out.iloc[0]["head_office_pref"] == "h"


def test_write_artifacts_roundtrip(tmp_path, product_df):
    """Pipeline outputs written to disk load back through the model layer's
    artifact loader — closing the preprocessing -> training loop."""
    import scipy.sparse as sp

    from furusato_recommend_tpu.config import Config
    from furusato_recommend_tpu.data.features import load_reference_features

    rng = np.random.default_rng(0)
    NU, MI = 10, 8
    vecs = {
        f: sp.random(MI, 40, density=0.2, format="csr", random_state=1)
        for f in ["name", "main_comment", "main_list_comment"]
    }
    uvecs = {
        f: sp.random(NU, 40, density=0.2, format="csr", random_state=2)
        for f in ["name", "main_comment", "main_list_comment"]
    }
    write_artifacts(
        tmp_path,
        user_categorical=rng.integers(0, 5, (NU, 3)),
        item_categorical=rng.integers(0, 7, (MI, 4)),
        user_numeric=rng.random((NU, 6)).astype(np.float32),
        item_numeric=rng.random((MI, 5)).astype(np.float32),
        user_word2vec=rng.random((NU, 300)).astype(np.float32),
        item_word2vec=rng.random((MI, 300)).astype(np.float32),
        item_sentence=rng.random((MI, 768)).astype(np.float32),
        user_text_vecs=uvecs,
        item_text_vecs=vecs,
        item_review_vec=vecs["name"],
    )
    cfg = Config(user_feature="nctw", item_feature="nctwsr")
    fs = load_reference_features(cfg, str(tmp_path))
    assert fs.user.numeric.shape == (NU, 6)
    assert fs.item.text.shape[0] == MI
    assert fs.item.text.shape[1] == 4  # 3 fields + review
    assert fs.item.sentence.shape == (MI, 768)
