"""relin_every correctness tests.

The claim in config.relin_every's docstring — R=1 re-linearization is
MATHEMATICALLY the fresh-per-step feature gradient (chain rule: d/dp
loss(p, tables(p)) = partial_p loss + tables_vjp_at_p(partial_tables loss)) —
must hold exactly: one epoch with relin_every=1 equals one epoch with
train_emb=True (per-step feature assembly) to float tolerance.
"""

import jax
import numpy as np
import pytest

from furusato_recommend_tpu.config import Config
from furusato_recommend_tpu.data import synthetic_dataset
from furusato_recommend_tpu.data.features import synthetic_features
from furusato_recommend_tpu.models.registry import build_model
from furusato_recommend_tpu.train.trainer import Trainer


def _fixture():
    ds = synthetic_dataset(n_users=96, m_items=128, avg_degree=8, seed=2)
    cfg = Config(
        model="textsage", latent_dim=8, bpr_batch_size=64, lr=0.01,
        num_neighbors=3, n_layers=2, user_feature="nwt", item_feature="nwt",
        eval_user_batch=64, topks=(10,), decay=1e-6, donate_params=False,
    )
    feats = synthetic_features(ds, cfg, seed=1)
    return ds, cfg, feats


def _run_epochs(ds, cfg, feats, epochs=2):
    model = build_model("textsage", cfg, ds.graph, features=feats)
    tr = Trainer(cfg, ds, model)
    params, opt = tr.init_state()
    for _ in range(epochs):
        params, opt, loss = tr.train_one_epoch(params, opt)
    return params, float(loss)


def test_relin1_equals_train_emb():
    """relin_every=1 (cached tables, fresh vjp per step) == train_emb=True
    (per-tree-node feature assembly): identical math, different mechanism."""
    ds, cfg, feats = _fixture()
    p1, l1 = _run_epochs(ds, cfg.replace(relin_every=1), feats)
    p2, l2 = _run_epochs(ds, cfg.replace(train_emb=True), feats)
    assert abs(l1 - l2) < 1e-4, (l1, l2)
    leaves1, treedef = jax.tree_util.tree_flatten(p1)
    leaves2 = treedef.flatten_up_to(p2)
    for i, (a, b) in enumerate(zip(leaves1, leaves2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5,
            err_msg=str(treedef),
        )


def test_relin0_differs_from_relin1():
    """R=0 (epoch-start linearization) is a genuinely different trajectory —
    guards against the cadence silently not being applied."""
    ds, cfg, feats = _fixture()
    p1, _ = _run_epochs(ds, cfg.replace(relin_every=1), feats, epochs=3)
    p0, _ = _run_epochs(ds, cfg.replace(relin_every=0), feats, epochs=3)
    diffs = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p0)
        )
    ]
    assert max(diffs) > 1e-5, diffs


def test_relin_rounding_and_validation():
    ds, cfg, feats = _fixture()
    model = build_model("textsage", cfg, ds.graph, features=feats)
    # num_batches rounds up to a multiple of R
    tr = Trainer(cfg.replace(relin_every=7), ds, model)
    assert tr.num_batches % 7 == 0
    with pytest.raises(ValueError, match="relin_every"):
        Trainer(cfg.replace(relin_every=-1), ds, model)


def test_relin_with_feature_update_every():
    """fue super-steps re-linearize at their boundary; the combination runs
    and produces finite losses/params."""
    ds, cfg, feats = _fixture()
    p, loss = _run_epochs(
        ds, cfg.replace(relin_every=1, feature_update_every=2), feats
    )
    assert np.isfinite(loss)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree_util.tree_leaves(p))
