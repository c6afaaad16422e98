"""End-to-end golden tests: each model family trains to a recall floor on the
deterministic synthetic dataset, and the full eval protocol behaves like the
reference's (train-positive masking, best-checkpoint policy)."""

import jax
import numpy as np
import pytest

from furusato_recommend_tpu.config import Config
from furusato_recommend_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from furusato_recommend_tpu.models.registry import available_models, build_model
from furusato_recommend_tpu.train.trainer import Trainer


def _train(name, dataset, epochs=25, **cfg_kw):
    cfg = Config(
        model=name,
        latent_dim=16,
        bpr_batch_size=256,
        lr=0.05,
        eval_user_batch=64,
        topks=(5, 10),
        **cfg_kw,
    )
    model = build_model(name, cfg, dataset.graph)
    tr = Trainer(cfg, dataset, model)
    params, opt_state = tr.init_state()
    r0 = tr.test(params)
    for _ in range(epochs):
        params, opt_state, loss = tr.train_one_epoch(params, opt_state)
    r1 = tr.test(params)
    return r0, r1, params, tr


def test_mf_learns(tiny_dataset):
    r0, r1, _, _ = _train("mf", tiny_dataset)
    assert r1["recall@10"] > r0["recall@10"] + 0.08
    assert r1["ndcg@10"] > 0.1


def test_lgn_learns(tiny_dataset):
    r0, r1, _, _ = _train("lgn", tiny_dataset)
    assert r1["recall@10"] > r0["recall@10"] + 0.08


def test_radj_r_half_equals_lgn(tiny_dataset):
    """rAdjGCN with r=0.5 is exactly symmetric normalization
    (deg_src^-0.5 deg_dst^-0.5), so it must match lgn numerically."""
    _, r_lgn, _, _ = _train("lgn", tiny_dataset, epochs=5)
    _, r_radj, _, _ = _train("radj", tiny_dataset, epochs=5, r=0.5)
    np.testing.assert_allclose(r_lgn["recall@10"], r_radj["recall@10"], rtol=1e-4)


def test_radj_r_sweep_changes_weights(tiny_dataset):
    from furusato_recommend_tpu.models.lightgcn import LightGCN

    cfg = Config(model="radj", latent_dim=8, r=0.9)
    m = build_model("radj", cfg, tiny_dataset.graph)
    e_sym = tiny_dataset.graph.norm_edges.weight
    e_asym = m._edges(tiny_dataset.graph).weight
    assert not np.allclose(np.asarray(e_sym), np.asarray(e_asym))


def test_train_positives_never_recommended(tiny_dataset):
    _, _, params, tr = _train("mf", tiny_dataset, epochs=8)
    _, topk = tr.evaluator(params, tr.eval_data)
    ap = tiny_dataset.all_pos()
    test_users = np.unique(tiny_dataset.test_user)
    for u, row in zip(test_users[:50], topk[:50]):
        assert len(np.intersect1d(row, ap[u])) == 0


def test_eval_matches_numpy_bruteforce(tiny_dataset):
    """Full protocol cross-check: recall@K from the jitted evaluator equals a
    from-scratch numpy evaluation of the same parameters."""
    _, r1, params, tr = _train("mf", tiny_dataset, epochs=8)
    U = np.asarray(params["user_emb"])
    I = np.asarray(params["item_emb"])
    ap = tiny_dataset.all_pos()
    td = tiny_dataset.test_dict()
    users = sorted(td.keys())
    recall = 0.0
    for u in users:
        s = U[u] @ I.T
        s[ap[u]] = -np.inf
        top = np.argsort(-s)[:10]
        hits = len(set(top.tolist()) & set(td[u].tolist()))
        recall += hits / (len(td[u]) + 1e-6)
    recall /= len(users)
    np.testing.assert_allclose(r1["recall@10"], recall, rtol=1e-3, atol=1e-4)


def test_checkpoint_roundtrip(tmp_path, tiny_dataset):
    _, _, params, tr = _train("mf", tiny_dataset, epochs=2)
    p = tmp_path / "ck" / "state.ckpt"
    save_checkpoint(p, {"params": params, "step": jax.numpy.asarray(3)}, tr.config)
    state = load_checkpoint(p)
    np.testing.assert_allclose(
        np.asarray(params["user_emb"]), state["params"]["user_emb"], rtol=1e-7
    )
    assert int(state["step"]) == 3
    assert state["__config__"]["model"] == "mf"


def test_registry_covers_lightgcn_family():
    for name in ["mf", "lgn", "rgcn", "radj", "lgcnssm"]:
        assert name in available_models()


def test_auc_metric(tiny_dataset):
    """AUC computed in-scan matches a from-scratch numpy ROC-AUC."""
    from sklearn.metrics import roc_auc_score

    r0, r1, params, tr = _train("mf", tiny_dataset, epochs=6, compute_auc=True)
    assert "auc@5" in r1
    # numpy cross-check
    U = np.asarray(params["user_emb"]); I = np.asarray(params["item_emb"])
    import scipy.special
    ap, td = tiny_dataset.all_pos(), tiny_dataset.test_dict()
    users = sorted(td.keys())
    aucs = []
    for u in users:
        s = scipy.special.expit(U[u] @ I.T)  # MF scores are sigmoid-ed
        keep = np.ones(len(s), bool); keep[ap[u]] = False
        y = np.zeros(len(s)); y[td[u]] = 1
        if y[keep].sum() and (1 - y[keep]).sum():
            aucs.append(roc_auc_score(y[keep], s[keep]))
    np.testing.assert_allclose(r1["auc@5"], np.mean(aucs), atol=2e-3)


def test_pretrain_init(tiny_dataset):
    from furusato_recommend_tpu.models.mf import MF as MFModel

    rng = np.random.default_rng(0)
    u = rng.random((tiny_dataset.n_users, 8)).astype(np.float32)
    i = rng.random((tiny_dataset.m_items, 8)).astype(np.float32)
    cfg = Config(model="mf", latent_dim=8)
    m = MFModel(cfg, tiny_dataset.graph, pretrained=(u, i))
    params = m.init(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(params["user_emb"]), u)


def test_save_result_csv(tmp_path, tiny_dataset):
    from furusato_recommend_tpu.eval.results import save_result

    _, _, params, tr = _train("mf", tiny_dataset, epochs=3)
    _, topk = tr.evaluator(params, tr.eval_data)
    names = np.asarray([f"gift_{i}" for i in range(tiny_dataset.m_items)])
    df = save_result(tmp_path / "result.csv", tiny_dataset, topk, product_names=names, k=5)
    td = tiny_dataset.test_dict()
    assert len(df) == len(td)
    assert "gift_" in df.iloc[0]["predict_names"]
    assert (tmp_path / "result.csv").exists()


def test_prefetch_pipeline():
    from furusato_recommend_tpu.train.prefetch import BackgroundProducer, prefetch_to_device

    got = list(prefetch_to_device(iter([np.ones(3) * i for i in range(5)]), size=2))
    assert len(got) == 5
    np.testing.assert_allclose(np.asarray(got[3]), 3.0)
    prod = BackgroundProducer(lambda i: np.full(2, i), num_batches=3)
    vals = [float(np.asarray(prod.get())[0]) for _ in range(3)]
    assert vals == [0.0, 1.0, 2.0]


def test_ddp_recipe_trainer(tiny_dataset):
    """Trainer(ddp_recipe=True): weighted+capped sampler recipe
    (TRAIN_ITERATIVE x samples, positive cap, popularity negatives)."""
    cfg = Config(
        model="mf", latent_dim=16, bpr_batch_size=256, lr=0.05,
        eval_user_batch=64, topks=(5, 10),
        train_iterative=2, positive_num_limit=500, negative_pow=0.2,
    )
    model = build_model("mf", cfg, tiny_dataset.graph)
    tr = Trainer(cfg, tiny_dataset, model, ddp_recipe=True)
    assert tr.samples_per_epoch >= 2 * tiny_dataset.train_size
    assert tr.edge_alias is not None and tr.neg_alias is not None
    params, opt_state = tr.init_state()
    r0 = tr.test(params)
    for _ in range(10):
        params, opt_state, loss = tr.train_one_epoch(params, opt_state)
    r1 = tr.test(params)
    assert r1["recall@10"] > r0["recall@10"]


import pytest


@pytest.mark.parametrize("backend", ["npz", "orbax"])
def test_trainer_resume(tmp_path, tiny_dataset, backend):
    """Deterministic resume: save mid-training, restore, continue — equals an
    uninterrupted run (full state incl. Adam moments + PRNG), on both the npz
    and the pickle-free orbax checkpoint backends (round-1 verdict #8)."""
    def make():
        cfg = Config(model="mf", latent_dim=16, bpr_batch_size=256, lr=0.05,
                     eval_user_batch=64, topks=(5, 10), ckpt_backend=backend)
        model = build_model("mf", cfg, tiny_dataset.graph)
        return Trainer(cfg, tiny_dataset, model)

    tr1 = make()
    p, o = tr1.init_state()
    for _ in range(3):
        p, o, _ = tr1.train_one_epoch(p, o)
    ckpt = tmp_path / "mid.ckpt"
    tr1.save(p, o, path=ckpt)
    for _ in range(3):
        p, o, _ = tr1.train_one_epoch(p, o)
    uninterrupted = np.asarray(p["user_emb"])

    tr2 = make()
    p2, o2 = tr2.restore(ckpt)
    assert tr2.step == 3
    for _ in range(3):
        p2, o2, _ = tr2.train_one_epoch(p2, o2)
    np.testing.assert_allclose(np.asarray(p2["user_emb"]), uninterrupted, rtol=1e-5, atol=1e-6)


def test_pipeline_dispatch_equals_sync(tiny_dataset):
    """--pipeline_dispatch (next-epoch sample prefetch before the loss sync)
    must be results-identical to the synchronous path: same key chain, same
    losses, same params — including across a save/restore boundary taken while
    a prefetch is outstanding (the checkpoint persists the pre-draw chain
    state)."""

    def make(pipeline):
        cfg = Config(model="mf", latent_dim=16, bpr_batch_size=256, lr=0.05,
                     eval_user_batch=64, topks=(5,), pipeline_dispatch=pipeline)
        model = build_model("mf", cfg, tiny_dataset.graph)
        return Trainer(cfg, tiny_dataset, model)

    tr_s, tr_p = make(False), make(True)
    ps, os_ = tr_s.init_state()
    pp, op = tr_p.init_state()
    for _ in range(3):
        ps, os_, ls = tr_s.train_one_epoch(ps, os_)
        pp, op, lp = tr_p.train_one_epoch(pp, op)
        assert abs(ls - lp) < 1e-6, (ls, lp)
    np.testing.assert_allclose(
        np.asarray(pp["user_emb"]), np.asarray(ps["user_emb"]), rtol=1e-6
    )

    # resume with an outstanding prefetch replays the identical stream
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ckpt = td + "/mid.ckpt"
        assert tr_p._prefetch is not None  # a prefetch IS outstanding
        tr_p.save(pp, op, path=ckpt)
        tr3 = make(True)
        p3, o3 = tr3.restore(ckpt)
        for _ in range(2):
            ps, os_, _ = tr_s.train_one_epoch(ps, os_)
            p3, o3, _ = tr3.train_one_epoch(p3, o3)
        np.testing.assert_allclose(
            np.asarray(p3["user_emb"]), np.asarray(ps["user_emb"]), rtol=1e-6
        )


def test_infonce_loss_mode(tiny_dataset):
    """In-batch sampled-softmax objective trains and improves recall."""
    r0, r1, _, _ = _train("mf", tiny_dataset, epochs=20, loss_fn="infonce")
    assert r1["recall@10"] > r0["recall@10"] + 0.05


def test_cold_start_metrics_emitted():
    """cold_start=True emits cold_* metric keys restricted to uid<10000
    (reference logs cold_recall@K etc., trainer.py:250-258)."""
    from furusato_recommend_tpu.data import synthetic_dataset

    ds = synthetic_dataset(n_users=80, m_items=100, avg_degree=8, seed=5)
    cfg = Config(model="mf", latent_dim=8, bpr_batch_size=128, lr=0.05,
                 eval_user_batch=64, topks=(5,), cold_start=True)
    model = build_model("mf", cfg, ds.graph)
    tr = Trainer(cfg, ds, model)
    params, _ = tr.init_state()
    r = tr.test(params)
    assert "cold_recall@5" in r
    # all synthetic uids < 10000 -> cold metrics equal the global ones
    np.testing.assert_allclose(r["cold_recall@5"], r["recall@5"], atol=1e-6)


def test_fit_accepts_restored_state(tmp_path, tiny_dataset):
    """fit(state=...) continues from a restored checkpoint instead of re-initializing
    (warm-start bug regression test)."""
    cfg = Config(model="mf", latent_dim=8, bpr_batch_size=256, lr=0.05,
                 eval_user_batch=64, topks=(5,), epochs=1, test_span=1,
                 path=str(tmp_path))
    model = build_model("mf", cfg, tiny_dataset.graph)
    tr = Trainer(cfg, tiny_dataset, model)
    p, o = tr.init_state()
    for _ in range(2):
        p, o, _ = tr.train_one_epoch(p, o)
    ck = tmp_path / "warm.ckpt"
    tr.save(p, o, path=ck)
    trained_user_emb = np.asarray(p["user_emb"]).copy()

    tr2 = Trainer(cfg, tiny_dataset, build_model("mf", cfg, tiny_dataset.graph))
    state = tr2.restore(ck)
    # fit must START from the restored params (checked via initial eval equality)
    r_restored = tr2.test(state[0])
    r_trained = tr.test(p)
    np.testing.assert_allclose(r_restored["recall@5"], r_trained["recall@5"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(state[0]["user_emb"]), trained_user_emb)
    tr2.fit(epochs=1, state=state)  # must not raise / re-init
