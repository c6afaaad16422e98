"""Out-of-core numeric features (the `dask` variant, data/ooc.py): streamed
projection/gradient correctness and end-to-end training with epoch-delayed
numeric-linear updates (`/root/reference/model/textsage_dask.py:117-119,300-334`)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from furusato_recommend_tpu.config import Config
from furusato_recommend_tpu.data import synthetic_dataset
from furusato_recommend_tpu.data.features import synthetic_features
from furusato_recommend_tpu.data.ooc import (
    MemmapNumeric,
    stream_project,
    stream_project_grad,
)
from furusato_recommend_tpu.models.registry import build_model
from furusato_recommend_tpu.train.trainer import Trainer


def test_stream_project_matches_dense(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1000, 17)).astype(np.float32)
    mm = MemmapNumeric.write(str(tmp_path / "num.npy"), x)
    assert mm.shape == (1000, 17)
    w = jnp.asarray(rng.standard_normal((17, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    y = stream_project(mm, w, b, chunk=128)  # uneven last chunk on purpose
    np.testing.assert_allclose(
        np.asarray(y), x @ np.asarray(w) + np.asarray(b), rtol=1e-5, atol=1e-5
    )


def test_stream_project_grad_matches_dense(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((500, 11)).astype(np.float32)
    g = rng.standard_normal((500, 6)).astype(np.float32)
    mm = MemmapNumeric.write(str(tmp_path / "num.npy"), x)
    gw, gb = stream_project_grad(mm, jnp.asarray(g), chunk=96)
    np.testing.assert_allclose(np.asarray(gw), x.T @ g, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), g.sum(0), rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def ooc_setup():
    ds = synthetic_dataset(n_users=100, m_items=140, avg_degree=8, seed=7)
    cfg = Config(
        model="dask",
        latent_dim=16,
        bpr_batch_size=128,
        num_neighbors=3,
        n_layers=2,
        user_feature="nc",
        item_feature="nc",
        eval_user_batch=64,
        topks=(5, 10),
        lr=0.05,
    )
    feats = synthetic_features(ds, cfg, seed=1)
    return ds, cfg, feats


def _to_ooc(feats, tmp_path):
    mm_u = MemmapNumeric.write(str(tmp_path / "u.npy"), np.asarray(feats.user.numeric))
    mm_i = MemmapNumeric.write(str(tmp_path / "i.npy"), np.asarray(feats.item.numeric))
    stripped = dataclasses.replace(
        feats,
        user=dataclasses.replace(feats.user, numeric=None),
        item=dataclasses.replace(feats.item, numeric=None),
    )
    return stripped, {"user": mm_u, "item": mm_i}


def test_ooc_initial_tables_match_incore(ooc_setup, tmp_path):
    """With identical params, the OOC model's initial tables equal the in-core
    textsage's (the streamed projection is exact, not an approximation)."""
    ds, cfg, feats = ooc_setup
    stripped, ooc = _to_ooc(feats, tmp_path)
    m_in = build_model("textsage", cfg, ds.graph, features=feats)
    m_ooc = build_model("dask", cfg, ds.graph, features=stripped, ooc_numeric=ooc)
    import jax

    params = m_in.init(jax.random.PRNGKey(3))
    m_ooc.refresh_ooc_proj(params)
    tu_in, ti_in = m_in.initial_tables(params)
    tu_o, ti_o = m_ooc.initial_tables(params)
    np.testing.assert_allclose(np.asarray(tu_in), np.asarray(tu_o), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ti_in), np.asarray(ti_o), rtol=2e-5, atol=2e-5)


def test_dask_trains_and_updates_numeric_linears(ooc_setup, tmp_path):
    ds, cfg, feats = ooc_setup
    stripped, ooc = _to_ooc(feats, tmp_path)
    model = build_model("dask", cfg, ds.graph, features=stripped, ooc_numeric=ooc)
    tr = Trainer(cfg, ds, model)
    params, opt_state = tr.init_state()
    w0 = np.asarray(params["user_numeric_w"]).copy()
    r0 = tr.test(params)
    losses = []
    for _ in range(15):
        params, opt_state, loss = tr.train_one_epoch(params, opt_state)
        losses.append(loss)
    r1 = tr.test(params)
    assert losses[-1] < losses[0]
    assert r1["recall@10"] > r0["recall@10"]
    # the epoch-delayed streamed X^T@G update actually moved the OOC linears
    assert np.abs(np.asarray(params["user_numeric_w"]) - w0).max() > 1e-6


def test_ooc_rejects_train_emb(ooc_setup, tmp_path):
    ds, cfg, feats = ooc_setup
    stripped, ooc = _to_ooc(feats, tmp_path)
    model = build_model("dask", cfg.replace(train_emb=True), ds.graph,
                        features=stripped, ooc_numeric=ooc)
    with pytest.raises(ValueError, match="train_emb"):
        Trainer(cfg.replace(train_emb=True), ds, model)
