"""Golden-parity tests for metrics against independent numpy implementations of
the reference formulas (/root/reference/metric.py — recall/precision/hr:60-72,
ndcg:84-103, mrr:74-82, diversity:105-115, novelty:117-125, coverage:142-147)."""

import jax.numpy as jnp
import numpy as np

from furusato_recommend_tpu.data.graph import CSR
from furusato_recommend_tpu.eval.metrics import batch_metric_sums


def _np_reference(topk, gt_lists, topks, cats=None, pop=None, n_users=None):
    """Independent numpy implementation of the reference metric sums."""
    B, Kmax = topk.shape
    r = np.zeros((B, Kmax))
    for b in range(B):
        r[b] = [1.0 if t in gt_lists[b] else 0.0 for t in topk[b]]
    out = {}
    for k in topks:
        rk = r[:, :k]
        right = rk.sum(1)
        recall_n = np.array([len(g) for g in gt_lists])
        out[f"recall@{k}"] = np.sum(right / (recall_n + 1e-6))
        out[f"precision@{k}"] = right.sum() / k
        out[f"hr@{k}"] = np.sum(right >= 1)
        disc = 1.0 / np.log2(np.arange(2, k + 2))
        dcg = (rk * disc).sum(1)
        idcg = np.array([disc[: min(k, len(g))].sum() for g in gt_lists])
        idcg[idcg == 0] = 1.0
        out[f"ndcg@{k}"] = np.sum(dcg / idcg)
        mrr = 0.0
        for b in range(B):
            hits = np.nonzero(rk[b])[0]
            mrr += 1.0 / (hits[0] + 1) if len(hits) else 0.0
        out[f"mrr@{k}"] = mrr
        if cats is not None:
            div = 0.0
            for b in range(B):
                for i in range(k):
                    for j in range(i + 1, k):
                        a = set(int(c) for c in cats[topk[b, i]] if c >= 0)
                        bb = set(int(c) for c in cats[topk[b, j]] if c >= 0)
                        div += 1 - len(a & bb) / (len(a | bb) + 1e-6)
            out[f"diversity@{k}"] = div / (k * (k - 1) // 2)
        if pop is not None:
            nov = 0.0
            for b in range(B):
                nov += np.sum(-np.log2(np.maximum(pop[topk[b, :k]], 1e-12))) / k
            out[f"novelty@{k}"] = nov / (-np.log2(1.0 / n_users))
    return out


def _csr_from_lists(lists, n_rows):
    indptr = [0]
    indices = []
    for row in lists:
        indices.extend(sorted(row))
        indptr.append(len(indices))
    while len(indptr) < n_rows + 1:
        indptr.append(len(indices))
    return CSR(jnp.asarray(indptr, jnp.int32), jnp.asarray(indices, jnp.int32))


def test_metric_parity_random():
    rng = np.random.default_rng(11)
    B, M, Kmax = 16, 60, 10
    topks = (5, 10)
    gt = [sorted(rng.choice(M, size=rng.integers(1, 8), replace=False).tolist()) for _ in range(B)]
    topk = np.stack([rng.choice(M, size=Kmax, replace=False) for _ in range(B)])
    cats = np.full((M, 3), -1, dtype=np.int32)
    for i in range(M):
        k = rng.integers(1, 3)
        cats[i, :k] = rng.choice(9, size=k, replace=False)
    pop = rng.random(M).astype(np.float32) * 0.5 + 1e-3

    test_csr = _csr_from_lists(gt, B)
    got = batch_metric_sums(
        jnp.asarray(topk),
        jnp.arange(B),
        jnp.ones(B, bool),
        test_csr,
        topks,
        item_categories=jnp.asarray(cats),
        item_popularity=jnp.asarray(pop),
        n_users_norm=500.0,
    )
    expect = _np_reference(topk, gt, topks, cats, pop, 500)
    for i, k in enumerate(topks):
        for name in ["recall", "precision", "hr", "ndcg", "mrr", "diversity", "novelty"]:
            np.testing.assert_allclose(
                float(got[name][i]), expect[f"{name}@{k}"], rtol=2e-4, atol=1e-5,
                err_msg=f"{name}@{k}",
            )
    assert float(got["count"]) == B


def test_metric_padding_rows_excluded():
    rng = np.random.default_rng(12)
    B, M, Kmax = 8, 40, 5
    gt = [[0, 1]] * B
    topk = np.stack([rng.choice(M, size=Kmax, replace=False) for _ in range(B)])
    valid = np.array([True] * 4 + [False] * 4)
    csr = _csr_from_lists(gt, B)
    got = batch_metric_sums(jnp.asarray(topk), jnp.arange(B), jnp.asarray(valid), csr, (5,))
    got_valid_only = batch_metric_sums(
        jnp.asarray(topk[:4]), jnp.arange(4), jnp.ones(4, bool), csr, (5,)
    )
    np.testing.assert_allclose(float(got["recall"][0]), float(got_valid_only["recall"][0]), rtol=1e-6)
    assert float(got["count"]) == 4


def test_pmi_unexpectedness():
    """Real PMI unexpectedness (the computation the reference stubs,
    metric.py:127-140): recommending items that co-occur with the user's
    history scores higher mean PMI than recommending never-co-occurring items."""
    import numpy as np

    from furusato_recommend_tpu.data import synthetic_dataset
    from furusato_recommend_tpu.eval.metrics import (
        pmi_from_cooccurrence,
        unexpectedness_from_pmi,
    )

    ds = synthetic_dataset(n_users=60, m_items=40, avg_degree=8, seed=2)
    pmi = pmi_from_cooccurrence(ds.train_user, ds.train_item, ds.m_items)
    assert pmi.shape == (40, 40)
    g = ds.graph
    users = np.arange(20)
    ap = ds.all_pos()
    # expected recs: each user's own history (max co-occurrence)
    co_rec = np.stack([np.resize(ap[u], 5) for u in users])
    rng = np.random.default_rng(0)
    rand_rec = rng.integers(0, 40, (20, 5))
    u_co = unexpectedness_from_pmi(g, users, co_rec, pmi)
    u_rand = unexpectedness_from_pmi(g, users, rand_rec, pmi)
    assert np.isfinite(u_co) and np.isfinite(u_rand)
    assert u_co > u_rand  # own-history recs co-occur maximally


def test_evaluator_pmi_hook():
    """Evaluator(..., pmi=...) replaces the parity stub with the real metric."""
    import jax
    import numpy as np

    from furusato_recommend_tpu.config import Config
    from furusato_recommend_tpu.data import synthetic_dataset
    from furusato_recommend_tpu.eval.evaluate import Evaluator, build_eval_data
    from furusato_recommend_tpu.eval.metrics import pmi_from_cooccurrence
    from furusato_recommend_tpu.models.registry import build_model

    ds = synthetic_dataset(n_users=48, m_items=64, avg_degree=6, seed=1)
    cfg = Config(model="mf", latent_dim=8, eval_user_batch=16, topks=(5, 10))
    model = build_model("mf", cfg, ds.graph)
    params = model.init(jax.random.PRNGKey(0))
    ev = Evaluator(model, ds.graph, cfg, max_train_degree=ds.graph.max_user_degree)
    data = build_eval_data(ds, 16)
    pmi = pmi_from_cooccurrence(ds.train_user, ds.train_item, ds.m_items)
    res_stub, _ = ev(params, data)
    res_pmi, _ = ev(params, data, pmi=pmi)
    n = len(np.unique(ds.test_user))
    assert abs(res_stub["unexpectedness@5"] - 1.0 / n) < 1e-9
    assert res_pmi["unexpectedness@5"] != res_stub["unexpectedness@5"]
    assert np.isfinite(res_pmi["unexpectedness@10"])


def test_evaluator_device_coverage_and_topk_opt_out():
    """coverage@k from the device-side hit bitmap == host np.unique count of
    the returned ids; with_topk=False skips the id fetch but changes nothing
    else (the Trainer's eval-cadence shape)."""
    import jax
    import numpy as np

    from furusato_recommend_tpu.config import Config
    from furusato_recommend_tpu.data import synthetic_dataset
    from furusato_recommend_tpu.eval.evaluate import Evaluator, build_eval_data
    from furusato_recommend_tpu.models.registry import build_model

    ds = synthetic_dataset(n_users=48, m_items=64, avg_degree=6, seed=3)
    cfg = Config(model="mf", latent_dim=8, eval_user_batch=16, topks=(5, 10))
    model = build_model("mf", cfg, ds.graph)
    params = model.init(jax.random.PRNGKey(0))
    ev = Evaluator(model, ds.graph, cfg, max_train_degree=ds.graph.max_user_degree)
    data = build_eval_data(ds, 16)
    res, shown = ev(params, data)
    for k in (5, 10):
        assert res[f"coverage@{k}"] == len(np.unique(shown[:, :k])) / ds.m_items
    res2, shown2 = ev(params, data, with_topk=False)
    assert shown2 is None
    assert res2 == res
