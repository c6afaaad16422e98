"""Quality parity vs a torch reference-equivalent (BASELINE.md target #1):
same dataset, same split, same hyperparameters — Recall@10 must match within
run-to-run variance.

The torch models here are clean-room reimplementations of the reference's math
(MF: embedding tables + BPR softplus + ego-L2, /root/reference/model/MF.py:35-112;
LightGCN: sym-normalized propagation + layer mean, /root/reference/model/MF.py:178-217)
running the reference's training procedure (CPU rejection sampling, minibatch
Adam steps)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from furusato_recommend_tpu.config import Config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402
from furusato_recommend_tpu.preprocessing.native import bpr_sample_cpu  # noqa: E402
from furusato_recommend_tpu.train.trainer import Trainer  # noqa: E402


def _torch_recall(ds, model_name, epochs, dim, lr, seed=0):
    torch.manual_seed(seed)
    n, m = ds.n_users, ds.m_items
    user_emb = torch.nn.Embedding(n, dim)
    item_emb = torch.nn.Embedding(m, dim)
    # match each model's init: MF uses torch Embedding's default N(0,1)
    # (reference MF.py), LightGCN uses normal(std=0.1) (reference MF.py:131-135)
    std = 1.0 if model_name == "mf" else 0.1
    torch.nn.init.normal_(user_emb.weight, std=std)
    torch.nn.init.normal_(item_emb.weight, std=std)
    opt = torch.optim.Adam(list(user_emb.parameters()) + list(item_emb.parameters()), lr=lr)

    g = ds.graph
    indptr = np.asarray(g.user_pos.indptr, np.int64)
    indices = np.asarray(g.user_pos.indices, np.int64)

    if model_name == "lgn":
        src = np.asarray(g.norm_edges.src)
        dst = np.asarray(g.norm_edges.dst)
        w = np.asarray(g.norm_edges.weight)
        A = torch.sparse_coo_tensor(
            torch.tensor(np.stack([dst, src])), torch.tensor(w), (n + m, n + m)
        ).coalesce()

    def embeddings():
        if model_name == "mf":
            return user_emb.weight, item_emb.weight
        x = torch.cat([user_emb.weight, item_emb.weight], 0)
        acc, h = x, x
        for _ in range(2):
            h = torch.sparse.mm(A, h)
            acc = acc + h
        out = acc / 3
        return out[:n], out[n:]

    bs = 256
    for ep in range(epochs):
        u, p, ng = bpr_sample_cpu(indptr, indices, n, m, ds.train_size, seed=seed * 1000 + ep)
        for lo in range(0, len(u), bs):
            uu = torch.tensor(u[lo : lo + bs])
            pp = torch.tensor(p[lo : lo + bs])
            nn_ = torch.tensor(ng[lo : lo + bs])
            U, I = embeddings()
            ue, pe, ne = U[uu], I[pp], I[nn_]
            loss = torch.nn.functional.softplus(
                (ue * ne).sum(1) - (ue * pe).sum(1)
            ).mean()
            u0, p0, n0 = user_emb(uu), item_emb(pp), item_emb(nn_)
            reg = 0.5 * (u0.norm() ** 2 + p0.norm() ** 2 + n0.norm() ** 2) / len(uu)
            loss = loss + 1e-7 * reg
            opt.zero_grad()
            loss.backward()
            opt.step()

    # eval: full scores, mask train positives, recall@10
    with torch.no_grad():
        U, I = embeddings()
        scores = (U @ I.T).numpy()
    ap, td = ds.all_pos(), ds.test_dict()
    recall = 0.0
    users = sorted(td.keys())
    for uu in users:
        s = scores[uu].copy()
        s[ap[uu]] = -np.inf
        top = np.argpartition(-s, 10)[:10]
        recall += len(set(top.tolist()) & set(td[uu].tolist())) / len(td[uu])
    return recall / len(users)


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
