"""Headline benchmark: end-to-end BPR training throughput (samples/s) on TPU.

Covers the reference's instrumented bottleneck — BPR triplet sampling + training
step (`/root/reference/negative_sample.py:104-133` timed sample_time1/2) — as one
number: triplets trained per second, including on-device sampling, forward,
backward, and the optimizer update, for LightGCN on a realistic synthetic graph.

vs_baseline: the reference's own algorithm measured end-to-end on the best
non-TPU hardware in this container — a torch-CPU reference-equivalent LightGCN
(serial Python rejection sampler feeding sparse-spmm propagation + Adam steps,
the exact structure of `/root/reference/negative_sample.py:98-134` +
`/root/reference/model/MF.py:178-217`), same graph, same dims, same batch size.
The reference's GPUs are not available here; throughput baselines are measured,
not inherited (BASELINE.md).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time
import warnings

import numpy as np

warnings.filterwarnings("ignore")  # stdout must stay exactly one JSON line


def reference_equivalent_throughput(dataset, dim=64, n_layers=2, batch=8192, n_batches=4, seed=0):
    """Reference-equivalent LightGCN BPR training on torch CPU: per-draw Python
    rejection sampling + full-graph sparse propagation per step + Adam."""
    import torch

    rng = np.random.default_rng(seed)
    all_pos = dataset.all_pos()
    pos_sets = [set(a.tolist()) for a in all_pos]
    n, m = dataset.n_users, dataset.m_items

    # normalized adjacency as torch sparse COO over the joint space
    g = dataset.graph
    src = np.asarray(g.norm_edges.src)
    dst = np.asarray(g.norm_edges.dst)
    w = np.asarray(g.norm_edges.weight)
    A = torch.sparse_coo_tensor(
        torch.tensor(np.stack([dst, src])), torch.tensor(w), (n + m, n + m)
    ).coalesce()
    emb = torch.nn.Embedding(n + m, dim)
    opt = torch.optim.Adam(emb.parameters(), lr=1e-3)

    def sample(k):
        out = np.empty((k, 3), np.int64)
        i = 0
        while i < k:
            u = int(rng.integers(0, n))
            row = all_pos[u]
            if len(row) == 0:
                continue
            p = int(row[rng.integers(0, len(row))])
            while True:
                neg = int(rng.integers(0, m))
                if neg not in pos_sets[u]:
                    break
            out[i] = (u, p, neg)
            i += 1
        return out

    t0 = time.perf_counter()
    for _ in range(n_batches):
        s = torch.tensor(sample(batch))
        x = emb.weight
        acc = x
        h = x
        for _ in range(n_layers):
            h = torch.sparse.mm(A, h)
            acc = acc + h
        out = acc / (n_layers + 1)
        u_e, p_e, n_e = out[s[:, 0]], out[n + s[:, 1]], out[n + s[:, 2]]
        loss = torch.nn.functional.softplus(
            (u_e * n_e).sum(1) - (u_e * p_e).sum(1)
        ).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return n_batches * batch / dt


def main():
    import jax

    from furusato_recommend_tpu.config import Config
    from furusato_recommend_tpu.data import synthetic_dataset
    from furusato_recommend_tpu.models.registry import build_model
    from furusato_recommend_tpu.train.trainer import Trainer

    cfg = Config(
        model="lgn",
        latent_dim=64,
        n_layers=2,
        bpr_batch_size=8192,
        lr=1e-3,
        eval_user_batch=1024,
        topks=(10, 20),
    )
    ds = synthetic_dataset(n_users=50_000, m_items=20_000, avg_degree=30, seed=0)
    model = build_model(cfg.model, cfg, ds.graph)
    tr = Trainer(cfg, ds, model)
    params, opt_state = tr.init_state()

    # compile + warmup
    params, opt_state, _ = tr.train_one_epoch(params, opt_state)
    jax.block_until_ready(params)

    n_epochs = 3
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        params, opt_state, loss = tr.train_one_epoch(params, opt_state)
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    tpu_sps = n_epochs * tr.samples_per_epoch / dt

    ref_sps = reference_equivalent_throughput(ds)

    print(
        json.dumps(
            {
                "metric": "bpr_train_samples_per_sec",
                "value": round(tpu_sps, 1),
                "unit": "samples/s/chip (lgn d=64 L=2, sample+fwd+bwd+update)",
                "vs_baseline": round(tpu_sps / ref_sps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
