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
    """fue=2 super-step semantics vs a HAND-STEPPED oracle (round-4 verdict #7
    — a wrong super-step boundary re-linearization must fail, not just be
    finite). The oracle replays the documented contract step by step in eager
    mode: per super-step, linearize the all-entity tables once at the top;
    inner steps adam-update only the non-feature params (accumulating the
    table cotangent and the direct grads); at the boundary run the feature-VJP
    on the step-MEAN cotangent + the mean direct feature grads through the
    feature params' own adam."""
    import optax

    ds, cfg, feats = _fixture()
    T = 2
    cfgT = cfg.replace(relin_every=1, feature_update_every=T)

    # real path: one epoch through the compiled program
    model = build_model("textsage", cfgT, ds.graph, features=feats)
    tr = Trainer(cfgT, ds, model)
    params0, opt0 = tr.init_state()
    p_real, _, loss_real = tr.train_one_epoch(params0, opt0)

    # oracle: identical key stream, identical batches, hand-stepped
    model2 = build_model("textsage", cfgT, ds.graph, features=feats)
    tr2 = Trainer(cfgT, ds, model2)
    params, _ = tr2.init_state()
    params = dict(params)
    tr2._key, k = jax.random.split(tr2._key)
    batches = tr2._sample_epoch(k, tr2.graph, (tr2.edge_alias, tr2.neg_alias))
    _, k_steps = jax.random.split(k)
    step_keys = jax.random.split(k_steps, tr2.num_batches)
    assert tr2.num_batches % T == 0

    feat_keys = model2.initial_param_keys()

    def split_p(p):
        return (
            {k_: v for k_, v in p.items() if k_ not in feat_keys},
            {k_: v for k_, v in p.items() if k_ in feat_keys},
        )

    opt_d, opt_f = optax.adam(cfgT.lr), optax.adam(cfgT.lr)
    d0, f0 = split_p(params)
    od, of = opt_d.init(d0), opt_f.init(f0)
    graph = tr2.graph
    losses = []
    with model2.bind(tr2._bound):
        for s in range(tr2.num_batches // T):
            tables0, tables_vjp = jax.vjp(model2.initial_tables, params)
            acc_t = jax.tree_util.tree_map(np.zeros_like, tables0)
            acc_p = jax.tree_util.tree_map(np.zeros_like, params)
            for t in range(T):
                i = s * T + t
                batch = jax.tree_util.tree_map(lambda x: x[i], batches)
                (loss, _aux), (g_p, g_t) = jax.value_and_grad(
                    lambda p, tb: model2.loss(p, graph, batch, step_keys[i], tables=tb),
                    argnums=(0, 1),
                    has_aux=True,
                )(params, tables0)
                losses.append(float(loss))
                acc_t = jax.tree_util.tree_map(lambda a, b: a + b, acc_t, g_t)
                acc_p = jax.tree_util.tree_map(lambda a, b: a + b, acc_p, g_p)
                dp, fp = split_p(params)
                gd = {k_: g_p[k_] for k_ in dp}
                upd, od = opt_d.update(gd, od, dp)
                dp = optax.apply_updates(dp, upd)
                params = {**dp, **fp}
            (g_feat,) = tables_vjp(jax.tree_util.tree_map(lambda x: x / T, acc_t))
            dp, fp = split_p(params)
            gf = {
                k_: jax.tree_util.tree_map(
                    lambda a, b: a + b / T, g_feat[k_], acc_p[k_]
                )
                for k_ in fp
            }
            upd, of = opt_f.update(gf, of, fp)
            fp = optax.apply_updates(fp, upd)
            params = {**dp, **fp}

    assert abs(float(np.mean(losses)) - loss_real) < 1e-4, (np.mean(losses), loss_real)
    leaves_r, treedef = jax.tree_util.tree_flatten(dict(p_real))
    leaves_o = treedef.flatten_up_to(params)
    for a, b in zip(leaves_r, leaves_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5, err_msg=str(treedef)
        )
