"""ONE full-chain integration test (round-2 verdict next #4): raw dataframes
-> tools preprocess -> CLI train (textsage) -> dump-candidates -> train-ranker
-> rerank-eval -> infer -> recommend, every stage consuming the previous
stage's REAL on-disk output — no hand-built intermediates.

Reference flow being reproduced end to end:
`preprocessing_main.py:12-126` -> `main.py` -> `test.py` -> `train_lgbm.py` ->
`eval_lgbm.py` -> `ddp_inference.py`.
"""

import json

import numpy as np
import pandas as pd
import pytest

from furusato_recommend_tpu.tools import main as tools_main


def _raw_frames(seed=0, n_products=60, n_customers=40, n_tx=800):
    rng = np.random.default_rng(seed)
    nouns = ["wagyu", "melon", "rice", "salmon", "uni", "apple", "sake", "miso"]
    prefs = ["hokkaido", "aomori", "miyazaki", "yamagata"]
    products = pd.DataFrame(
        {
            "product_id": 100 + np.arange(n_products),
            "name": [
                f"{nouns[i % len(nouns)]} set {i}" for i in range(n_products)
            ],
            "minimum_donation_price": rng.integers(5, 20, n_products) * 1000,
            "parent_product_id": [np.nan] * n_products,
            "partner_id": rng.integers(1, 5, n_products),
            "main_comment": [
                f"delicious {nouns[i % len(nouns)]} from japan" for i in range(n_products)
            ],
            "main_list_comment": [
                f"popular {nouns[(i + 3) % len(nouns)]}" for i in range(n_products)
            ],
            "pref": [prefs[i % len(prefs)] for i in range(n_products)],
        }
    )
    customers = pd.DataFrame(
        {
            "customer_id": [f"c{i}" for i in range(n_customers)],
            "sex": rng.choice(["m", "f"], n_customers),
            "pref": rng.choice(prefs, n_customers),
            "age": rng.integers(20, 70, n_customers),
        }
    )
    # popularity-skewed transactions; every customer buys >= 4 distinct products
    tx_c, tx_p = [], []
    for c in range(n_customers):
        k = int(rng.integers(4, 12))
        items = rng.choice(n_products, size=k, replace=False, p=None)
        tx_c.extend([f"c{c}"] * k)
        tx_p.extend((100 + items).tolist())
    transactions = pd.DataFrame({"customer_id": tx_c, "product_id": tx_p})
    partner = pd.DataFrame(
        {
            "partner_id": [1, 2, 3, 4],
            "head_office_pref": prefs,
            "head_office_addr01": ["a", "b", "c", "d"],
        }
    )
    category = pd.DataFrame(
        {
            "product_id": 100 + np.arange(n_products),
            "category_id": [nouns[i % len(nouns)] for i in range(n_products)],
        }
    )
    reviews = pd.DataFrame(
        {
            "product_id": 100 + rng.integers(0, n_products, 50),
            "recommend_level": rng.integers(1, 6, 50),
            "comment": ["very good wagyu taste"] * 50,
        }
    )
    return products, customers, transactions, partner, category, reviews


def test_full_chain(tmp_path, capsys):
    products, customers, transactions, partner, category, reviews = _raw_frames()
    raw = tmp_path / "raw"
    raw.mkdir()
    products.to_pickle(raw / "products.pkl")
    customers.to_csv(raw / "customers.csv", index=False)
    transactions.to_csv(raw / "transactions.csv", index=False)
    partner.to_csv(raw / "partner.csv", index=False)
    category.to_csv(raw / "category.csv", index=False)
    reviews.to_csv(raw / "reviews.csv", index=False)
    data = tmp_path / "data"

    # ---- stage 1: preprocess (incremental round included) ----
    tools_main([
        "preprocess",
        "--products", str(raw / "products.pkl"),
        "--customers", str(raw / "customers.csv"),
        "--transactions", str(raw / "transactions.csv"),
        "--partner", str(raw / "partner.csv"),
        "--product_category", str(raw / "category.csv"),
        "--reviews", str(raw / "reviews.csv"),
        "--out", str(data),
        "--incremental_frac", "0.1",
        "--test_holdout", "2",
    ])
    summary = json.loads(capsys.readouterr().out)
    assert summary["incremental_updates"] == 1
    assert (data / "cf" / "train.txt").exists()
    assert (data / "cf" / "test.txt").exists()
    assert (data / "cb" / "product_feature_pad.npy").exists()
    assert (data / "text" / "product_name_count.pkl").exists()

    # ---- stage 2: train the flagship model on the preprocessed directory ----
    from furusato_recommend_tpu.cli import main as cli_main

    ckpt_dir = tmp_path / "ckpt"
    cli_main([
        "--model", "textsage",
        "--recdim", "16",
        "--layer", "2",
        "--num_neighbors", "3",
        "--bpr_batch", "128",
        "--lr", "0.01",
        "--epochs", "2",
        "--test_span", "2",
        "--topks", "[5,10]",
        "--user_feature", "nct",
        "--item_feature", "nctsr",
        "--data_path", str(data),
        "--path", str(ckpt_dir),
    ])
    ckpts = list((ckpt_dir / "textsage").glob("*.ckpt"))
    assert ckpts, "training left no checkpoint"
    ckpt = str(ckpts[0])

    # ---- stage 3: dump candidates from the trained checkpoint ----
    cand_path = tmp_path / "cands.npy"
    tools_main([
        "dump-candidates", "--ckpt", ckpt, "--k", "20",
        "--out", str(cand_path), "--data_path", str(data),
    ])
    capsys.readouterr()
    cands = np.load(cand_path)
    assert cands.shape[1] == 20

    # ---- stage 4: train the second-stage ranker on those candidates ----
    ranker_path = tmp_path / "ranker.ckpt"
    tools_main([
        "train-ranker", "--candidates", str(cand_path),
        "--data_path", str(data), "--lgbm_ratio", "0.2",
        "--epochs", "4", "--out", str(ranker_path),
    ])
    capsys.readouterr()
    assert ranker_path.exists()

    # ---- stage 5: rerank-eval consumes candidates + ranker ----
    tools_main([
        "rerank-eval", "--candidates", str(cand_path),
        "--ranker", str(ranker_path), "--data_path", str(data), "--k", "5",
    ])
    out = capsys.readouterr().out
    rr = json.loads(out)
    assert "rerank_recall@5" in rr and 0.0 <= rr["rerank_recall@5"] <= 1.0

    # ---- stage 6: production inference CSVs from the checkpoint ----
    infer_dir = tmp_path / "result"
    tools_main([
        "infer", "--ckpt", ckpt, "--data_path", str(data),
        "--out_dir", str(infer_dir), "--user_batch", "16",
        "--target_batches", "0", "--k", "5",
    ])
    capsys.readouterr()
    csvs = list(infer_dir.rglob("*.csv"))
    assert csvs, "infer wrote no CSV"

    # ---- stage 7: online-serving one-shot over the same checkpoint ----
    tools_main([
        "recommend", "--ckpt", ckpt, "--users", "0,3", "--k", "5",
        "--data_path", str(data),
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {r["user"] for r in lines} == {0, 3}
    assert all(len(r["items"]) == 5 for r in lines)
