"""SAGE/TextSAGE family tests: feature gating, both forward paths, all variants
compile, flagship learns on the synthetic dataset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from furusato_recommend_tpu.config import Config
from furusato_recommend_tpu.data import synthetic_dataset
from furusato_recommend_tpu.data.features import synthetic_features
from furusato_recommend_tpu.models.registry import available_models, build_model
from furusato_recommend_tpu.sampling.bpr import sample_bpr
from furusato_recommend_tpu.sampling.neighbor import sample_neighbors
from furusato_recommend_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def sage_ds():
    return synthetic_dataset(n_users=100, m_items=140, avg_degree=8, seed=7)


def _cfg(**kw):
    base = dict(
        model="textsage",
        latent_dim=16,
        bpr_batch_size=128,
        num_neighbors=3,
        n_layers=2,
        user_feature="nw",
        item_feature="nw",
        eval_user_batch=64,
        topks=(5, 10),
        lr=0.01,
    )
    base.update(kw)
    return Config(**base)


def test_neighbor_sampler_correctness(sage_ds):
    g = sage_ds.graph
    nodes = jnp.asarray([0, 5, 17, 42])
    s = sample_neighbors(jax.random.PRNGKey(0), g.user_pos, nodes, fanout=6)
    ap = sage_ds.all_pos()
    ids = np.asarray(s.ids)
    for i, u in enumerate([0, 5, 17, 42]):
        for nbr in ids[i]:
            assert nbr in ap[u]
    # edge_pos points back at the sampled neighbor
    pos = np.asarray(s.edge_pos)
    indices = np.asarray(g.user_pos.indices)
    np.testing.assert_array_equal(indices[pos], ids)


def test_all_feature_flags(sage_ds):
    cfg = _cfg(user_feature="nctwb", item_feature="nctwsrb", factorization=True)
    fs = synthetic_features(sage_ds, cfg, seed=1)
    m = build_model("textsage", cfg, sage_ds.graph, features=fs)
    params = m.init(jax.random.PRNGKey(0))
    U, I = m.propagate(params, sage_ds.graph)
    assert U.shape == (100, 16) and I.shape == (140, 16)
    assert np.isfinite(np.asarray(U)).all()


def test_cold_start_zeroing(sage_ds):
    cfg = _cfg(cold_start=True)
    fs = synthetic_features(sage_ds, cfg, seed=1)
    m = build_model("textsage", cfg, sage_ds.graph, features=fs)
    params = m.init(jax.random.PRNGKey(0))
    emb = m._initial_side_emb(params, jnp.arange(100), "user")
    # all synthetic uids < 10000 -> all zeroed
    np.testing.assert_allclose(np.asarray(emb), 0.0)


def test_padded_vs_segment_propagate(sage_ds):
    """Full-graph propagation must be identical with and without the padded
    fast path."""
    from furusato_recommend_tpu.data.graph import build_bipartite_graph

    cfg = _cfg()
    fs = synthetic_features(sage_ds, cfg, seed=1)
    g_pad = sage_ds.graph
    g_seg = build_bipartite_graph(
        sage_ds.train_user, sage_ds.train_item, sage_ds.test_user, sage_ds.test_item,
        sage_ds.n_users, sage_ds.m_items, padded=False,
    )
    m = build_model("textsage", cfg, g_pad, features=fs)
    params = m.init(jax.random.PRNGKey(0))
    U1, I1 = m.propagate(params, g_pad)
    U2, I2 = m.propagate(params, g_seg)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U2), atol=2e-2, rtol=2e-2)


def test_variants_compile(sage_ds):
    names = [
        "textsage_id", "fastsage", "lightsage", "pinsage", "mrec", "nssage",
        "tgrec", "tgrec2",
    ]
    b = sample_bpr(jax.random.PRNGKey(1), sage_ds.graph, 64)
    for name in names:
        cfg = _cfg(model=name, bpr_batch_size=64)
        fs = synthetic_features(sage_ds, cfg, seed=1)
        m = build_model(name, cfg, sage_ds.graph, features=fs)
        params = m.init(jax.random.PRNGKey(0))
        loss, _ = m.loss(params, sage_ds.graph, b, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss)), name


def test_gnn_conv_plugins(sage_ds):
    b = sample_bpr(jax.random.PRNGKey(1), sage_ds.graph, 64)
    for conv in ["gcn", "gat", "transformer", "ggnn"]:
        cfg = _cfg(model="gnn", conv=conv, bpr_batch_size=64)
        fs = synthetic_features(sage_ds, cfg, seed=1)
        m = build_model("gnn", cfg, sage_ds.graph, features=fs)
        params = m.init(jax.random.PRNGKey(0))
        U, I = m.propagate(params, sage_ds.graph)
        loss, _ = m.loss(params, sage_ds.graph, b, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss)), conv
        assert np.isfinite(np.asarray(U)).all(), conv


def test_textsage_learns(sage_ds):
    cfg = _cfg(lr=0.03)
    fs = synthetic_features(sage_ds, cfg, seed=1)
    m = build_model("textsage", cfg, sage_ds.graph, features=fs)
    tr = Trainer(cfg, sage_ds, m)
    params, opt_state = tr.init_state()
    r0 = tr.test(params)
    losses = []
    for _ in range(15):
        params, opt_state, loss = tr.train_one_epoch(params, opt_state)
        losses.append(loss)
    r1 = tr.test(params)
    assert losses[-1] < losses[0] * 0.8
    assert r1["recall@10"] > r0["recall@10"]


def test_registry_covers_sage_family():
    expected = {
        "textsage", "textsage_id", "sage", "fsage", "fastsage", "lightsage",
        "pinsage", "mrec", "nssage", "tgrec", "tgrec2", "gnn", "dask",
    }
    assert expected.issubset(set(available_models()))


def test_edge_feature_models(sage_ds):
    """rsage (relational), tgsrec (temporal), sasgnn (recency): both paths finite."""
    from furusato_recommend_tpu.data.features import synthetic_features as sf

    b = sample_bpr(jax.random.PRNGKey(1), sage_ds.graph, 64)
    for name, mr in [("tgsrec", "add"), ("sasgnn", "add"), ("rsage", "add"),
                     ("rsage", "sum"), ("rsage", "prod")]:
        cfg = _cfg(model=name, bpr_batch_size=64, multi_relational=mr)
        fs = sf(sage_ds, cfg, seed=1, with_edge_time=True, with_edge_label=True)
        m = build_model(name, cfg, sage_ds.graph, features=fs)
        params = m.init(jax.random.PRNGKey(0))
        U, I = m.propagate(params, sage_ds.graph)
        loss, _ = m.loss(params, sage_ds.graph, b, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss)), (name, mr)
        assert np.isfinite(np.asarray(U)).all(), (name, mr)


def test_sasrec(sage_ds):
    from furusato_recommend_tpu.data.sequence import build_sequences

    cfg = _cfg(model="sasrec", bpr_batch_size=64)
    fs = synthetic_features(sage_ds, cfg, seed=1)
    seqs = build_sequences(sage_ds)
    # sequences contain only the user's train items, in order, <= 50
    ap = sage_ds.all_pos()
    items = np.asarray(seqs.items)
    lens = np.asarray(seqs.lengths)
    for u in range(0, 100, 13):
        assert lens[u] == min(len(ap[u]), 50)
        assert set(items[u, : lens[u]].tolist()) <= set(ap[u].tolist())
    m = build_model("sasrec", cfg, sage_ds.graph, features=fs, sequences=seqs)
    params = m.init(jax.random.PRNGKey(0))
    U, I = m.propagate(params, sage_ds.graph)
    assert U.shape == (100, 16)
    b = sample_bpr(jax.random.PRNGKey(1), sage_ds.graph, 64)
    loss, _ = m.loss(params, sage_ds.graph, b, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    # causal masking: user repr must not depend on positions >= length
    seq2 = np.asarray(seqs.items).copy()
    u0 = int(np.argmax(lens < 40))
    seq2[u0, lens[u0]:] = 7  # garbage beyond the valid length
    from furusato_recommend_tpu.data.sequence import UserSequences
    seqs2 = UserSequences(items=jnp.asarray(seq2), lengths=seqs.lengths, max_len=seqs.max_len)
    m2 = build_model("sasrec", cfg, sage_ds.graph, features=fs, sequences=seqs2)
    item_initial = m._initial_side_emb(params, jnp.arange(140), "item")
    e1 = m.forward_user(params, item_initial, jnp.asarray([u0]))
    e2 = m2.forward_user(params, item_initial, jnp.asarray([u0]))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_asage(sage_ds):
    cfg = _cfg(model="asage", bpr_batch_size=64, user_feature="ncw", item_feature="ncw")
    fs = synthetic_features(sage_ds, cfg, seed=1)
    m = build_model("asage", cfg, sage_ds.graph, features=fs)
    params = m.init(jax.random.PRNGKey(0))
    assert "user_attr_emb" in params and "item_attr_emb" in params
    b = sample_bpr(jax.random.PRNGKey(1), sage_ds.graph, 64)
    loss, aux = m.loss(params, sage_ds.graph, b, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert "attr_bpr" in aux
    # attr tables get gradient through the auxiliary loss
    g = jax.grad(lambda p: m.loss(p, sage_ds.graph, b, jax.random.PRNGKey(2))[0])(params)
    assert float(jnp.linalg.norm(g["user_attr_emb"])) > 0
    # loss composition oracle (asage.py:440-477): total = bpr + 0.1*attr_bpr
    # + decay*reg, reg independently recomputed EXCLUDING the attr tables
    reg = sum(
        0.5 * float(np.sum(np.asarray(leaf) ** 2))
        for k_name, v in params.items()
        if "attr_emb" not in k_name
        for leaf in jax.tree_util.tree_leaves(v)
    ) / float(jnp.sum(b.valid))
    np.testing.assert_allclose(float(aux["reg"]), reg, rtol=1e-5)
    want = float(aux["bpr"]) + 0.1 * float(aux["attr_bpr"]) + cfg.decay * reg
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_full_registry_covers_reference_model_zoo():
    """Every key in the reference MODELS dict (/root/reference/main.py:32-56)
    resolves here."""
    reference_keys = {
        "mf", "lgn", "radj", "rgcn", "sage", "textsage", "textsage_id", "dask",
        "fastsage", "lightsage", "pinsage", "fsage", "rsage", "gnn", "tgrec",
        "tgrec2", "tgsrec", "sasgnn", "sasrec", "asage", "mrec", "nssage",
    }
    assert reference_keys.issubset(set(available_models()))


def test_inference_sample_mode(sage_ds):
    """--inference sample: evaluator uses the sampled-subgraph encoder."""
    from furusato_recommend_tpu.eval.evaluate import Evaluator, build_eval_data

    cfg = _cfg(inference="sample")
    fs = synthetic_features(sage_ds, cfg, seed=1)
    m = build_model("textsage", cfg, sage_ds.graph, features=fs)
    params = m.init(jax.random.PRNGKey(0))
    U, I = m.propagate_sampled(params, sage_ds.graph, jax.random.PRNGKey(1))
    assert U.shape == (100, 16) and np.isfinite(np.asarray(U)).all()
    ev = Evaluator(m, sage_ds.graph, cfg, max_train_degree=32)
    data = build_eval_data(sage_ds, 64)
    results, _ = ev(params, data)
    assert 0.0 <= results["recall@10"] <= 1.0


def test_initial_all_matches_per_ids(sage_ds):
    """_initial_all (padded-SpMM text bags) must equal _initial_side_emb on
    every entity (both paths must stay in sync)."""
    cfg = _cfg(user_feature="nctw", item_feature="nctwsr", factorization=True)
    fs = synthetic_features(sage_ds, cfg, seed=1)
    m = build_model("textsage", cfg, sage_ds.graph, features=fs)
    params = m.init(jax.random.PRNGKey(0))
    for side, n in (("user", 100), ("item", 140)):
        a = np.asarray(m._initial_all(params, side))
        b = np.asarray(m._initial_side_emb(params, jnp.arange(n), side))
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-3)  # bf16 spmm path


def test_asage_infonce_ssl(sage_ds):
    """ASAGE's optional InfoNCE SSL term (the reference's commented-out variant)."""
    from furusato_recommend_tpu.models.asage import ASAGE

    cfg = _cfg(user_feature="ncw", item_feature="ncw", bpr_batch_size=64)
    fs = synthetic_features(sage_ds, cfg, seed=1)
    m = ASAGE(cfg, sage_ds.graph, fs, ssl_weight=0.1)
    params = m.init(jax.random.PRNGKey(0))
    b = sample_bpr(jax.random.PRNGKey(1), sage_ds.graph, 64)
    loss, aux = m.loss(params, sage_ds.graph, b, jax.random.PRNGKey(2))
    assert "infonce" in aux and np.isfinite(float(loss))


def test_metric_logger_jsonl(tmp_path):
    import json as _json

    from furusato_recommend_tpu.obs.log import MetricLogger

    p = tmp_path / "m.jsonl"
    lg = MetricLogger(jsonl_path=p, quiet=True)
    lg.log({"loss": 1.5, "recall@10": 0.2}, step=3)
    lg.close()
    row = _json.loads(p.read_text().strip())
    assert row["loss"] == 1.5 and row["step"] == 3 and "ts" in row


def test_train_emb_cached_epoch(sage_ds):
    """train_emb=False (reference default): initial tables computed once per
    epoch, feature grads via the frozen epoch-start vjp — the feature params
    (word_emb) must still receive updates, and the model must still learn."""
    cfg = _cfg(train_emb=False, epochs=4, test_span=10, user_feature="nwt", item_feature="nwt")
    fs = synthetic_features(sage_ds, cfg, seed=3)
    model = build_model("textsage", cfg, sage_ds.graph, features=fs)
    tr = Trainer(cfg, sage_ds, model)
    params, opt_state = tr.init_state()
    w0 = np.asarray(params["word_emb"]).copy()
    losses = []
    for _ in range(4):
        params, opt_state, loss = tr.train_one_epoch(params, opt_state)
        losses.append(loss)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # frozen-linearization gradients DO flow into the feature tables
    assert not np.allclose(np.asarray(params["word_emb"]), w0)


def test_train_emb_fresh_close_to_cached(sage_ds):
    """Within one epoch the cached (train_emb=False) and fresh (True) programs
    start from the same params and should end statistically close — the cache
    only freezes the initial-table linearization at epoch start."""
    losses = {}
    for flag in (False, True):
        cfg = _cfg(train_emb=flag, epochs=2)
        fs = synthetic_features(sage_ds, cfg, seed=3)
        model = build_model("textsage", cfg, sage_ds.graph, features=fs)
        tr = Trainer(cfg, sage_ds, model)
        params, opt_state = tr.init_state()
        for _ in range(2):
            params, opt_state, loss = tr.train_one_epoch(params, opt_state)
        losses[flag] = loss
    assert abs(losses[True] - losses[False]) < 0.25, losses
