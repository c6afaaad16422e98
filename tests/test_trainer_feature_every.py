"""--feature_update_every: super-step feature updates (opt-in trajectory
deviation; config.feature_update_every docstring). Pins:

1. the param partition behind the masked optimizers — with decay=0, direct
   grads vanish exactly on SAGE.initial_param_keys() and the table-cotangent
   VJP is nonzero only there;
2. the T>1 epoch program trains (loss falls, BOTH param groups move), rounds
   the epoch to whole super-steps, and checkpoints round-trip through the
   two-optimizer state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from furusato_recommend_tpu.config import Config
from furusato_recommend_tpu.data import synthetic_dataset
from furusato_recommend_tpu.data.features import synthetic_features
from furusato_recommend_tpu.models.registry import build_model
from furusato_recommend_tpu.sampling.bpr import sample_bpr
from furusato_recommend_tpu.train.trainer import Trainer


def _cfg(**kw):
    base = dict(
        model="textsage",
        latent_dim=8,
        n_layers=2,
        num_neighbors=3,
        bpr_batch_size=64,
        lr=5e-2,
        epochs=3,
        test_span=10,
        topks=(5,),
        eval_user_batch=32,
        user_feature="nt",
        item_feature="ntw",
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    ds = synthetic_dataset(n_users=150, m_items=90, avg_degree=8, seed=0)
    feats = synthetic_features(ds, cfg, seed=0)
    return cfg, ds, feats


def test_feature_param_partition(setup):
    cfg, ds, feats = setup
    cfg0 = cfg.replace(decay=0.0)
    m = build_model("textsage", cfg0, ds.graph, features=feats)
    params = m.init(jax.random.PRNGKey(0))
    batch = sample_bpr(jax.random.PRNGKey(1), ds.graph, 64, neg_candidates=4)
    feat_keys = m.initial_param_keys()
    assert "word_emb" in feat_keys and "user_proj_w" in feat_keys
    assert "layers" not in feat_keys

    tables0, tables_vjp = jax.vjp(m.initial_tables, params)
    (loss, _), (g_p, g_t) = jax.value_and_grad(
        lambda p, t: m.loss(p, ds.graph, batch, jax.random.PRNGKey(2), tables=t),
        argnums=(0, 1),
        has_aux=True,
    )(params, tables0)
    (g_feat,) = tables_vjp(g_t)
    for k in params:
        direct = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g_p[k])))
        via_tables = float(
            sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g_feat[k]))
        )
        if k in feat_keys:
            assert direct == 0.0, f"{k}: direct grad leaked (decay=0)"
            assert via_tables > 0.0, f"{k}: no table-cotangent grad"
        else:
            assert via_tables == 0.0, f"{k}: table grad on a non-feature param"


def test_super_step_epoch_trains(setup):
    cfg, ds, feats = setup
    cfg2 = cfg.replace(feature_update_every=4, lr=1e-2)
    m = build_model("textsage", cfg2, ds.graph, features=feats)
    tr = Trainer(cfg2, ds, m)
    assert tr.num_batches % 4 == 0  # rounds up to whole super-steps
    params, opt_state = tr.init_state()
    w0 = np.asarray(params["word_emb"])
    l0 = None
    for _ in range(4):
        params, opt_state, loss = tr.train_one_epoch(params, opt_state)
        l0 = loss if l0 is None else l0
    assert loss < l0
    assert np.abs(np.asarray(params["word_emb"]) - w0).max() > 0  # feature moved
    res = tr.test(params)
    assert np.isfinite(res["recall@5"])


def test_super_step_checkpoint_roundtrip(setup, tmp_path):
    cfg, ds, feats = setup
    cfg2 = cfg.replace(feature_update_every=2, path=str(tmp_path))
    m = build_model("textsage", cfg2, ds.graph, features=feats)
    tr = Trainer(cfg2, ds, m)
    params, opt_state = tr.init_state()
    params, opt_state, _ = tr.train_one_epoch(params, opt_state)
    tr.save(params, opt_state)
    tr2 = Trainer(cfg2, ds, m)
    p2, o2 = tr2.restore()
    np.testing.assert_allclose(
        np.asarray(p2["word_emb"]), np.asarray(params["word_emb"]), rtol=1e-6
    )
    # resumed state steps fine
    p3, o3, loss = tr2.train_one_epoch(p2, o2)
    assert np.isfinite(loss)


def test_t1_unaffected(setup):
    """feature_update_every=1 is exactly the pre-existing single-opt path."""
    cfg, ds, feats = setup
    m = build_model("textsage", cfg, ds.graph, features=feats)
    tr = Trainer(cfg, ds, m)
    assert not hasattr(tr, "opt_feat")
    params, opt_state = tr.init_state()
    _, _, loss = tr.train_one_epoch(params, opt_state)
    assert np.isfinite(loss)
