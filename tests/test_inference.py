"""Production inference tier tests (ddp_inference.py equivalent, VERDICT #3):
inference edge set propagation != train-graph propagation, targeted CSV dumps,
and the tools.py `infer` subcommand end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from furusato_recommend_tpu.config import Config
from furusato_recommend_tpu.data import load_text_dataset, synthetic_dataset
from furusato_recommend_tpu.data.dataset import Dataset
from furusato_recommend_tpu.eval.inference import production_inference
from furusato_recommend_tpu.models.registry import build_model


def _ds_with_inference():
    base = synthetic_dataset(n_users=80, m_items=120, avg_degree=8, seed=3)
    return Dataset.from_interactions(
        base.train_user,
        base.train_item,
        base.test_user,
        base.test_item,
        n_users=base.n_users,
        m_items=base.m_items,
        inference_user=np.concatenate([base.train_user, base.test_user]),
        inference_item=np.concatenate([base.train_item, base.test_item]),
    )


def test_inference_graph_differs_from_train_graph():
    ds = _ds_with_inference()
    cfg = Config(model="lgn", latent_dim=16)
    model = build_model("lgn", cfg, ds.graph)
    params = model.init(jax.random.PRNGKey(0))
    u_tr, i_tr = model.propagate(params, ds.graph)
    u_inf, i_inf = model.propagate(params, ds.inference_graph)
    # the test edges change the propagation structure
    assert not np.allclose(np.asarray(u_tr), np.asarray(u_inf), atol=1e-5)
    assert not np.allclose(np.asarray(i_tr), np.asarray(i_inf), atol=1e-5)


def test_inference_graph_defaults_to_train_graph():
    ds = synthetic_dataset(n_users=40, m_items=60, avg_degree=6, seed=0)
    assert not ds.has_inference_edges
    assert ds.inference_graph is ds.graph


def test_production_inference_csv(tmp_path):
    ds = _ds_with_inference()
    cfg = Config(model="lgn", latent_dim=16, topks=(5, 10))
    model = build_model("lgn", cfg, ds.graph)
    params = model.init(jax.random.PRNGKey(1))
    paths = production_inference(
        model,
        params,
        ds,
        cfg,
        out_dir=tmp_path,
        user_batch_size=32,
        target_batches=(0, 1, 99),  # 99 out of range -> skipped
        k=10,
    )
    assert len(paths) == 2
    df = pd.read_csv(paths[0])
    assert len(df) == 32
    assert list(df.columns) == [
        "customer_id", "train_ids", "train_names", "predict_ids",
        "predict_names", "gt_ids", "gt_names",
    ]
    ap = ds.all_pos()
    td = ds.test_dict()
    for _, row in df.iterrows():
        u = int(row["customer_id"])
        preds = [int(x) for x in str(row["predict_ids"]).split(",")]
        assert len(preds) == 10
        # train positives masked out (reference masks allPos ONLY, not test)
        assert not set(preds) & set(ap[u].tolist())
        gts = [] if pd.isna(row["gt_ids"]) else [int(x) for x in str(row["gt_ids"]).split(",")]
        assert gts == list(td.get(u, []))


def test_suffix_all_builds_inference_edges(tmp_path):
    cf = tmp_path / "cf" / "all"
    cf.mkdir(parents=True)
    rng = np.random.default_rng(0)
    with open(cf / "trainall.txt", "w") as ftr, open(cf / "testall.txt", "w") as fte:
        for u in range(20):
            items = rng.choice(30, size=6, replace=False)
            ftr.write(f"{u} " + " ".join(map(str, items[:4])) + "\n")
            fte.write(f"{u} " + " ".join(map(str, items[4:])) + "\n")
    cfg = Config(suffix="all", data_path=str(tmp_path))
    ds = load_text_dataset(cfg)
    assert ds.has_inference_edges
    assert len(ds.inference_user) == len(ds.train_user) + len(ds.test_user)


def test_tools_infer_subcommand(tmp_path):
    """Full flow: train briefly -> checkpoint -> tools.py infer -> CSV."""
    from furusato_recommend_tpu.core.checkpoint import save_checkpoint
    from furusato_recommend_tpu.tools import main as tools_main

    cf = tmp_path / "cf" / "all"
    cf.mkdir(parents=True)
    rng = np.random.default_rng(1)
    with open(cf / "trainall.txt", "w") as ftr, open(cf / "testall.txt", "w") as fte:
        for u in range(24):
            items = rng.choice(40, size=6, replace=False)
            ftr.write(f"{u} " + " ".join(map(str, items[:4])) + "\n")
            fte.write(f"{u} " + " ".join(map(str, items[4:])) + "\n")
    cfg = Config(model="mf", latent_dim=8, suffix="all", data_path=str(tmp_path))
    ds = load_text_dataset(cfg)
    model = build_model("mf", cfg, ds.graph)
    params = model.init(jax.random.PRNGKey(0))
    ckpt = tmp_path / "mf.ckpt"
    save_checkpoint(ckpt, {"params": params}, cfg)
    tools_main(
        [
            "infer",
            "--ckpt", str(ckpt),
            "--data_path", str(tmp_path),
            "--out_dir", str(tmp_path / "result"),
            "--user_batch", "16",
            "--target_batches", "0,1",
            "--k", "5",
        ]
    )
    out = sorted((tmp_path / "result").glob("*.csv"))
    assert len(out) == 2
    df = pd.read_csv(out[0])
    assert len(df) == 16 and "predict_ids" in df.columns
