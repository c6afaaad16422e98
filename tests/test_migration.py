"""Migration-surface round-trip tests (round-2 verdict next #3): the
reference's actual on-disk artifacts — the five `Datas` pickles, the SASRec
sequence artifacts, and the precomputed --sample_pow distributions — load
directly, no hand conversion."""

import pickle

import numpy as np
import pandas as pd
import pytest

from furusato_recommend_tpu.config import Config
from furusato_recommend_tpu.data import synthetic_dataset
from furusato_recommend_tpu.data.dataset import Dataset


def _write_datas_pickles(tmp_path, suffix, n_users=12, m_items=20, seed=0):
    """Lay out the exact files `Datas` reads (/root/reference/ddp.py:40-75)."""
    rng = np.random.default_rng(seed)
    sub = tmp_path / suffix if suffix else tmp_path
    sub.mkdir(exist_ok=True)
    cb = tmp_path / "cb" / suffix if suffix else tmp_path / "cb"
    cb.mkdir(parents=True, exist_ok=True)

    def _edges(n):
        return (rng.integers(0, n_users, n), rng.integers(0, m_items, n))

    tr = _edges(60)
    te = _edges(20)
    pd.DataFrame({"cf_customer": tr[0], "cf_product": tr[1]}).to_pickle(
        sub / f"train{suffix}.pkl"
    )
    pd.DataFrame({"cf_customer": te[0], "cf_product": te[1]}).to_pickle(
        sub / f"test{suffix}.pkl"
    )
    pd.DataFrame({"cf_customer": np.arange(n_users), "age": 30}).to_pickle(
        cb / f"customer_cb{suffix}.pkl"
    )
    pd.DataFrame({"cf_product": np.arange(m_items), "price": 1000}).to_pickle(
        cb / f"product_cb{suffix}.pkl"
    )
    inf = None
    if suffix == "all":
        inf = (np.concatenate([tr[0], te[0]]), np.concatenate([tr[1], te[1]]))
        pd.DataFrame({"cf_customer": inf[0], "cf_product": inf[1]}).to_pickle(
            sub / f"inference{suffix}.pkl"
        )
    return tr, te, inf


def test_from_reference_pickles_plain_suffix(tmp_path):
    tr, te, _ = _write_datas_pickles(tmp_path, suffix="22_1_10")
    ds = Dataset.from_reference_pickles(str(tmp_path), suffix="22_1_10")
    assert (ds.n_users, ds.m_items) == (12, 20)  # from the entity frames
    np.testing.assert_array_equal(ds.train_user, tr[0])
    np.testing.assert_array_equal(ds.train_item, tr[1])
    np.testing.assert_array_equal(ds.test_user, te[0])
    assert not ds.has_inference_edges  # non-'all' suffix -> train edges
    # graph builds and is usable
    assert ds.graph.n_users == 12


def test_from_reference_pickles_all_suffix_inference_set(tmp_path):
    tr, te, inf = _write_datas_pickles(tmp_path, suffix="all")
    ds = Dataset.from_reference_pickles(str(tmp_path), suffix="all")
    assert ds.has_inference_edges
    np.testing.assert_array_equal(ds.inference_user, inf[0])
    np.testing.assert_array_equal(ds.inference_item, inf[1])
    # inference graph propagates over train+test (ddp.py:62-68 semantics)
    assert ds.inference_graph.user_pos.indices.shape[0] >= ds.graph.user_pos.indices.shape[0]


def test_from_reference_pickles_missing_entity_frames_warns(tmp_path):
    tr, te, _ = _write_datas_pickles(tmp_path, suffix="")
    import shutil

    shutil.rmtree(tmp_path / "cb")
    with pytest.warns(UserWarning, match="entity frames"):
        ds = Dataset.from_reference_pickles(str(tmp_path), suffix="")
    assert ds.n_users == int(max(tr[0].max(), te[0].max())) + 1


def test_load_sequence_artifacts_matches_reference_truncation(tmp_path):
    """Reference semantics (/root/reference/model/sasrec.py:44-48,205-208):
    keep each user's LAST min(50, len) items; lengths clamp at 50."""
    import torch

    from furusato_recommend_tpu.data.sequence import load_sequence_artifacts

    seqs = [
        list(range(3)),               # short
        list(range(100, 160)),        # longer than max_len
        [],                           # empty
        [7, 7, 9],
    ]
    with open(tmp_path / "train_items_sequence.pkl", "wb") as f:
        pickle.dump(seqs, f)
    torch.save(torch.tensor([3, 60, 0, 3]), tmp_path / "train_sequence_length.pt")

    us = load_sequence_artifacts(str(tmp_path), n_users=5, max_len=50)
    items = np.asarray(us.items)
    lengths = np.asarray(us.lengths)
    assert items.shape == (5, 50)
    np.testing.assert_array_equal(lengths, [3, 50, 0, 3, 0])
    np.testing.assert_array_equal(items[0, :3], [0, 1, 2])
    np.testing.assert_array_equal(items[1], np.arange(110, 160))  # last 50
    assert items[2].sum() == 0
    assert items[4].sum() == 0  # padded user beyond the artifact


def test_load_sequence_artifacts_dict_form(tmp_path):
    from furusato_recommend_tpu.data.sequence import load_sequence_artifacts

    with open(tmp_path / "train_items_sequence.pkl", "wb") as f:
        pickle.dump({0: [1, 2], 2: [5]}, f)
    us = load_sequence_artifacts(str(tmp_path), n_users=3, max_len=10)
    np.testing.assert_array_equal(np.asarray(us.lengths), [2, 0, 1])
    np.testing.assert_array_equal(np.asarray(us.items)[2, :1], [5])


def _per_user_probs(ds, pow_):
    """Reference-shaped sample_prob object: per-user probability arrays over
    allPos order (what sample_prob_*.pkl holds, negative_sample.py:55-57)."""
    pop = ds.item_occurrence().astype(np.float64)
    ap = ds.all_pos()
    out = []
    for u in range(ds.n_users):
        if len(ap[u]) == 0:
            out.append(np.empty(0))
            continue
        w = np.maximum(pop[ap[u]], 1.0) ** pow_
        out.append(w / w.sum())
    return out


def test_sample_prob_edge_weights_roundtrip():
    from furusato_recommend_tpu.sampling.weights import (
        popularity_positive_edge_weights,
        sample_prob_edge_weights,
    )

    ds = synthetic_dataset(n_users=40, m_items=30, avg_degree=6, seed=3)
    probs = _per_user_probs(ds, 0.5)
    w = sample_prob_edge_weights(ds, probs)
    # the same tilt computed from degrees, up to per-user normalization: both
    # must induce identical per-user conditional distributions in CSR order
    w_deg = popularity_positive_edge_weights(ds, 0.5)
    order = np.lexsort((ds.train_item, ds.train_user))
    u_csr = ds.train_user[order]
    for u in range(ds.n_users):
        m = u_csr == u
        if not m.any():
            continue
        a, b = w[m], w_deg[m]
        np.testing.assert_allclose(a / a.sum(), b / b.sum(), rtol=1e-12)


def test_sample_prob_edge_weights_length_mismatch():
    from furusato_recommend_tpu.sampling.weights import sample_prob_edge_weights

    ds = synthetic_dataset(n_users=10, m_items=15, avg_degree=5, seed=4)
    probs = _per_user_probs(ds, 0.5)
    probs[3] = probs[3][:-1]  # corrupt one row
    with pytest.raises(ValueError, match="user 3"):
        sample_prob_edge_weights(ds, probs)


def test_trainer_uses_on_disk_sample_prob(tmp_path):
    """Trainer --sample_pow prefers the reference's sample_prob_{02}.pkl when
    present (negative_sample.py:24-38 file-selection rule)."""
    from furusato_recommend_tpu.models.registry import build_model
    from furusato_recommend_tpu.sampling.weights import (
        edge_alias_from_weights,
        sample_prob_edge_weights,
    )
    from furusato_recommend_tpu.train.trainer import Trainer

    ds = synthetic_dataset(n_users=40, m_items=30, avg_degree=6, seed=5)
    # an on-disk distribution DIFFERENT from the degree-computed tilt, so the
    # test can tell which one the Trainer used: inverse popularity
    pop = ds.item_occurrence().astype(np.float64)
    ap = ds.all_pos()
    probs = []
    for u in range(ds.n_users):
        w = 1.0 / np.maximum(pop[ap[u]], 1.0) if len(ap[u]) else np.empty(0)
        probs.append(w / w.sum() if len(w) else w)
    (tmp_path / "sample_prob").mkdir()
    with open(tmp_path / "sample_prob" / "sample_prob_02.pkl", "wb") as f:
        pickle.dump(probs, f)

    cfg = Config(model="mf", latent_dim=8, bpr_batch_size=64,
                 sample_pow=0.2, data_path=str(tmp_path))
    model = build_model("mf", cfg, ds.graph)
    tr = Trainer(cfg, ds, model)
    want = edge_alias_from_weights(sample_prob_edge_weights(ds, probs))
    np.testing.assert_allclose(
        np.asarray(tr.edge_alias.prob), np.asarray(want.prob), rtol=1e-6
    )

    # without the file: degree-computed fallback
    cfg2 = cfg.replace(data_path=str(tmp_path / "nope"))
    tr2 = Trainer(cfg2, ds, build_model("mf", cfg2, ds.graph))
    assert not np.allclose(np.asarray(tr2.edge_alias.prob), np.asarray(want.prob))
