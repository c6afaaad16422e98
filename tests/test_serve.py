"""Online serving tier (serve.Recommender): correctness vs the Evaluator's
full-catalog ranking, train-positive exclusion, inference-edge propagation,
refresh, and the from_checkpoint path."""

import numpy as np
import pytest

import jax

from furusato_recommend_tpu.config import Config
from furusato_recommend_tpu.data import synthetic_dataset
from furusato_recommend_tpu.models.registry import build_model
from furusato_recommend_tpu.serve import Recommender


@pytest.fixture(scope="module")
def env():
    cfg = Config(model="lgn", latent_dim=16, n_layers=2, topks=(5, 10), eval_user_batch=16)
    ds = synthetic_dataset(n_users=64, m_items=48, avg_degree=6, seed=4)
    model = build_model("lgn", cfg, ds.graph)
    params = model.init(jax.random.PRNGKey(0))
    return cfg, ds, model, params


def test_matches_evaluator_ranking(env):
    cfg, ds, model, params = env
    from furusato_recommend_tpu.eval.evaluate import Evaluator, build_eval_data

    rec = Recommender(model, ds, cfg, params, use_inference_edges=False)
    ev = Evaluator(model, ds.graph, cfg, max_train_degree=ds.graph.max_user_degree)
    data = build_eval_data(ds, 16)
    _, shown = ev(params, data)
    users = np.unique(ds.test_user)
    ids, scores = rec.recommend(users, k=10)
    np.testing.assert_array_equal(ids, shown[:, :10])
    assert np.all(np.diff(scores, axis=1) <= 1e-6)  # sorted scores


def test_train_positive_exclusion(env):
    cfg, ds, model, params = env
    rec = Recommender(model, ds, cfg, params, use_inference_edges=False)
    ap = ds.all_pos()
    ids, _ = rec.recommend([3], k=20)
    assert not set(ids[0].tolist()) & set(ap[3].tolist())
    rec_incl = Recommender(
        model, ds, cfg, params, use_inference_edges=False, exclude_train=False
    )
    ids2, _ = rec_incl.recommend([3], k=48)
    assert set(ap[3].tolist()) <= set(ids2[0].tolist())


def test_request_padding_shapes(env):
    cfg, ds, model, params = env
    rec = Recommender(model, ds, cfg, params)
    for n in (1, 3, 8, 11):
        ids, scores = rec.recommend(list(range(n)), k=7)
        assert ids.shape == (n, 7) and scores.shape == (n, 7)
    # scalar request
    ids, _ = rec.recommend(5, k=3)
    assert ids.shape == (1, 3)


def test_inference_edges_change_propagation(env):
    import dataclasses

    cfg, base, model, params = env
    ds = dataclasses.replace(
        base,
        inference_user=np.concatenate([base.train_user, base.test_user]),
        inference_item=np.concatenate([base.train_item, base.test_item]),
    )
    assert ds.has_inference_edges
    a = Recommender(model, ds, cfg, params, use_inference_edges=False)
    b = Recommender(model, ds, cfg, params, use_inference_edges=True)
    assert np.abs(np.asarray(a._user_emb) - np.asarray(b._user_emb)).max() > 0


def test_refresh_tracks_params(env):
    cfg, ds, model, params = env
    rec = Recommender(model, ds, cfg, params, use_inference_edges=False)
    before = np.asarray(rec._user_emb).copy()
    p2 = jax.tree_util.tree_map(lambda x: x * 1.5, params)
    rec.refresh(p2)
    assert np.abs(np.asarray(rec._user_emb) - before).max() > 0


def test_from_checkpoint(tmp_path, env):
    cfg, ds, model, params = env
    # write a dataset + checkpoint the loader path understands
    data = tmp_path / "data"
    (data / "cf").mkdir(parents=True)
    ap, td = ds.all_pos(), ds.test_dict()
    with open(data / "cf" / "train.txt", "w") as f, open(data / "cf" / "test.txt", "w") as g:
        for u in range(ds.n_users):
            if len(ap[u]):
                f.write(f"{u} " + " ".join(map(str, ap[u])) + "\n")
            if len(td.get(u, [])):
                g.write(f"{u} " + " ".join(map(str, td[u])) + "\n")
    from furusato_recommend_tpu.core.checkpoint import save_checkpoint

    cfg2 = cfg.replace(data_path=str(data), path=str(tmp_path))
    ck = tmp_path / "m.ckpt"
    save_checkpoint(ck, {"params": params}, cfg2)
    rec = Recommender.from_checkpoint(str(ck))
    ids, _ = rec.recommend([0, 1], k=5)
    assert ids.shape == (2, 5)


def test_http_server_endpoints(env):
    """The stdlib HTTP front end: healthz, GET/POST recommend, validation, and
    checkpoint hot-reload — all against an ephemeral in-process server."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from furusato_recommend_tpu.serve import make_server

    cfg, ds, model, params = env
    rec = Recommender(model, ds, cfg, params, use_inference_edges=False)
    srv = make_server(rec, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        h = json.load(urllib.request.urlopen(f"{base}/healthz"))
        assert h["ok"] and h["n_users"] == 64 and h["model"] == "lgn"

        one = json.load(urllib.request.urlopen(f"{base}/recommend?user=3&k=5"))
        assert one["user"] == 3 and len(one["items"]) == 5
        want_ids, _ = rec.recommend([3], k=5)
        assert one["items"] == want_ids[0].tolist()

        req = urllib.request.Request(
            f"{base}/recommend",
            data=json.dumps({"users": [1, 7], "k": 4}).encode(),
            method="POST",
        )
        batch = json.load(urllib.request.urlopen(req))
        assert [r["user"] for r in batch] == [1, 7]
        assert all(len(r["items"]) == 4 for r in batch)

        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{base}/recommend?user=9999")
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{base}/nope")
        assert e.value.code == 404
    finally:
        srv.shutdown()


def test_http_reload(env, tmp_path):
    import json
    import threading
    import urllib.request

    from furusato_recommend_tpu.core.checkpoint import save_checkpoint
    from furusato_recommend_tpu.serve import make_server

    cfg, ds, model, params = env
    rec = Recommender(model, ds, cfg, params, use_inference_edges=False)
    before = rec.recommend([5], k=5)[0]
    # a different-parameter checkpoint changes the recommendations
    params2 = model.init(jax.random.PRNGKey(9))
    ck = tmp_path / "new.ckpt"
    save_checkpoint(ck, {"params": params2}, cfg)
    srv = make_server(rec, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reload",
            data=json.dumps({"ckpt": str(ck)}).encode(),
            method="POST",
        )
        assert json.load(urllib.request.urlopen(req))["ok"]
        after = rec.recommend([5], k=5)[0]
        assert not np.array_equal(before, after)
    finally:
        srv.shutdown()
