"""Two-stage ranking tests: candidate dump, make_X contract, ranker learns,
end-to-end rerank beats random ordering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from furusato_recommend_tpu.config import Config
from furusato_recommend_tpu.data import synthetic_dataset
from furusato_recommend_tpu.data.features import synthetic_features
from furusato_recommend_tpu.models.registry import build_model
from furusato_recommend_tpu.rank.features import make_X_ids, rank_feature_spec
from furusato_recommend_tpu.rank.pipeline import build_rank_groups, dump_candidates, rerank_eval
from furusato_recommend_tpu.rank.ranker import NeuralRanker
from furusato_recommend_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def rank_setup():
    ds = synthetic_dataset(n_users=100, m_items=120, avg_degree=10, seed=3)
    cfg = Config(model="mf", latent_dim=16, bpr_batch_size=256, lr=0.05, topks=(10,), eval_user_batch=64)
    model = build_model("mf", cfg, ds.graph)
    tr = Trainer(cfg, ds, model)
    params, opt_state = tr.init_state()
    for _ in range(10):
        params, opt_state, _ = tr.train_one_epoch(params, opt_state)
    feats = synthetic_features(ds, cfg, seed=2)
    return ds, cfg, model, params, feats


def test_candidate_dump(rank_setup):
    ds, cfg, model, params, feats = rank_setup
    cands = dump_candidates(model, params, ds.graph, k=20, batch=64)
    assert cands.shape == (100, 20)
    ap = ds.all_pos()
    for u in range(0, 100, 11):
        # train positives masked out of candidates
        assert len(np.intersect1d(cands[u], ap[u])) == 0
        # candidates unique per user
        assert len(set(cands[u].tolist())) == 20


def test_make_X_contract(rank_setup):
    ds, cfg, model, params, feats = rank_setup
    spec = rank_feature_spec(feats)
    cat, num = make_X_ids(feats, jnp.asarray([3, 4]), jnp.asarray([7, 9]))
    assert cat.shape == (2, spec.n_item_cat + spec.n_user_cat)
    assert num.shape == (2, spec.n_user_num + spec.n_item_num)
    # column order: item cat first (reference make_X)
    np.testing.assert_array_equal(
        np.asarray(cat[0, : spec.n_item_cat]), np.asarray(feats.item.categorical[7])
    )
    np.testing.assert_array_equal(
        np.asarray(num[0, : spec.n_user_num]),
        np.asarray(feats.user.numeric[3][: spec.n_user_num]),
    )


def test_ranker_learns_and_improves(rank_setup):
    ds, cfg, model, params, feats = rank_setup
    cands = dump_candidates(model, params, ds.graph, k=20, batch=64)
    td = ds.test_dict()
    groups = build_rank_groups(ds, [cands], holdout=td, max_candidates=64)
    ranker = NeuralRanker(feats, emb_dim=8, hidden=(64, 32))
    p0 = ranker.init(jax.random.PRNGKey(0))
    l0 = float(ranker.group_loss(p0, groups))
    p1 = ranker.fit(groups, epochs=25, batch_groups=64, lr=3e-3, seed=0)
    l1 = float(ranker.group_loss(p1, groups))
    assert l1 < l0 * 0.9, (l0, l1)
    # reranking with the trained model beats the untrained one on the holdout
    r_trained = rerank_eval(ranker, p1, ds, [cands], td, k=10, max_candidates=64)
    r_init = rerank_eval(ranker, p0, ds, [cands], td, k=10, max_candidates=64)
    assert r_trained["rerank_recall@10"] >= r_init["rerank_recall@10"]


def test_rank_groups_labels(rank_setup):
    ds, cfg, model, params, feats = rank_setup
    cands = dump_candidates(model, params, ds.graph, k=10, batch=64)
    td = ds.test_dict()
    groups = build_rank_groups(ds, [cands], holdout=td, max_candidates=64)
    lab = np.asarray(groups.labels)
    mask = np.asarray(groups.mask)
    users = np.asarray(groups.users)
    items = np.asarray(groups.items)
    ap = ds.all_pos()
    # every group has at least one relevant and one masked-valid candidate
    assert ((lab * mask).sum(1) >= 1).all()
    # spot-check: train positives carry label 1
    g0 = 0
    u = users[g0]
    for c in range(mask[g0].sum()):
        if items[g0, c] in ap[u]:
            assert lab[g0, c] == 1.0


def test_rank_groups_edge_array_holdout_matches_dict(rank_setup):
    """The flat (users, items) holdout form (what cmd_train_ranker now builds
    with one setdiff over COO keys — no per-user loop) must produce identical
    groups to the per-user dict form."""
    ds, cfg, model, params, feats = rank_setup
    cands = dump_candidates(model, params, ds.graph, k=10, batch=64)
    td = ds.test_dict()
    hu = np.concatenate([np.full(len(v), u, np.int64) for u, v in td.items()])
    hi = np.concatenate([np.asarray(v, np.int64) for v in td.values()])
    g_dict = build_rank_groups(ds, [cands], holdout=td, max_candidates=64)
    g_arr = build_rank_groups(ds, [cands], holdout=(hu, hi), max_candidates=64)
    np.testing.assert_array_equal(np.asarray(g_dict.users), np.asarray(g_arr.users))
    np.testing.assert_array_equal(np.asarray(g_dict.items), np.asarray(g_arr.items))
    np.testing.assert_array_equal(np.asarray(g_dict.labels), np.asarray(g_arr.labels))
    np.testing.assert_array_equal(np.asarray(g_dict.mask), np.asarray(g_arr.mask))


def test_rerank_no_candidate_double_count():
    """Round-1 defect: users with fewer candidates than max_candidates had the
    pad filled by repeating candidate 0, which could double-count it in top-k.
    Padded slots must now be masked out (id -1)."""
    import jax

    ds = synthetic_dataset(n_users=30, m_items=50, avg_degree=6, seed=4)
    cfg = Config(model="mf", latent_dim=8, user_feature="nc", item_feature="nc")
    feats = synthetic_features(ds, cfg, seed=2)
    ranker = NeuralRanker(feats)
    params = ranker.init(jax.random.PRNGKey(0))
    # 3 candidates per user but max_candidates=8: 5 padded slots per row
    rng = np.random.default_rng(0)
    cands = [rng.integers(0, 50, (30, 3)).astype(np.int32)]
    eval_dict = {u: np.asarray([int(cands[0][u][0])]) for u in range(30)}
    res = rerank_eval(ranker, params, ds, cands, eval_dict, k=5, max_candidates=8)
    # every user's single gt is candidate 0 -> with <=3 real candidates and
    # k=5, the gt is always within the ranked real candidates
    assert res["rerank_recall@5"] == 1.0
    assert res["rerank_hr@5"] == 1.0


def test_retriever_rank_aux_columns():
    """rr/membership columns match a direct per-row lookup."""
    from furusato_recommend_tpu.rank.pipeline import retriever_rank_aux

    rng = np.random.default_rng(0)
    L1 = np.stack([rng.choice(50, 8, replace=False) for _ in range(20)])
    L2 = np.stack([rng.choice(50, 8, replace=False) for _ in range(20)])
    cand = rng.integers(0, 50, (20, 12)).astype(np.int64)
    aux = retriever_rank_aux([L1, L2], cand, m_items=50)
    assert aux.shape == (20, 12, 4)
    for r in range(20):
        for c in range(12):
            for j, L in enumerate((L1, L2)):
                where = np.nonzero(L[r] == cand[r, c])[0]
                rr = 1.0 / (1.0 + where[0]) if len(where) else 0.0
                assert aux[r, c, 2 * j] == np.float32(rr)
                assert aux[r, c, 2 * j + 1] == float(len(where) > 0)


def test_ranker_aux_variant_trains_and_ranks(rank_setup):
    """aux_dim ranker: groups carry retriever-signal columns end to end
    (fit + rerank_eval), and with rr columns available the ranker's ordering
    at least matches the first retriever's own top-k ordering quality."""
    ds, cfg, model, params, feats = rank_setup
    cands = dump_candidates(model, params, ds.graph, k=20, batch=64)
    held = ds.test_dict()
    groups = build_rank_groups(ds, [cands], holdout=held,
                               with_retriever_aux=True)
    assert groups.aux is not None and groups.aux.shape[-1] == 2
    ranker = NeuralRanker(feats, aux_dim=2)
    rparams = ranker.fit(groups, epochs=30, batch_groups=32, lr=1e-3, seed=0)
    res = rerank_eval(ranker, rparams, ds, [cands], held, k=10)
    # retriever-alone top-10 recall under the identical candidate protocol
    users = np.asarray(sorted(held.keys()))
    hit = 0.0
    for u in users:
        hit += len(np.intersect1d(cands[u, :10], held[int(u)])) / max(
            len(held[int(u)]), 1
        )
    alone = hit / len(users)
    assert res["rerank_recall@10"] >= alone * 0.9, (res, alone)
