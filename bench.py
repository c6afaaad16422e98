"""Headline benchmark: end-to-end BPR training throughput (samples/s) on TPU.

Covers the reference's instrumented bottleneck — BPR triplet sampling + training
step (`/root/reference/negative_sample.py:104-133` timed sample_time1/2) — as one
number: triplets trained per second, including on-device sampling, forward,
backward, and the optimizer update, for LightGCN on a realistic synthetic graph.

vs_baseline: the reference's serial CPU sampler is its pipeline's bottleneck (it
is a per-draw Python loop; the repo parallelizes it over only 4 processes —
`/root/reference/negative_sample.py:74-96`). We measure a faithful
reference-equivalent sampler (Python rejection loop over ragged allPos) on this
machine, scale by 4 (their process count), and report tpu_samples_per_s over that
— i.e. how many times faster the full TPU training loop is than the reference's
*sampling alone*.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def reference_equivalent_sampler_throughput(dataset, n_draws=20000, seed=0):
    """Per-draw Python rejection sampling over ragged allPos — the reference
    algorithm (uniform user, uniform positive, rejection-sampled negative)."""
    rng = np.random.default_rng(seed)
    all_pos = dataset.all_pos()
    pos_sets = [set(a.tolist()) for a in all_pos]
    m = dataset.m_items
    n = dataset.n_users
    t0 = time.perf_counter()
    out = []
    users = rng.integers(0, n, n_draws)
    for u in users:
        row = all_pos[u]
        if len(row) == 0:
            continue
        p = row[rng.integers(0, len(row))]
        while True:
            neg = int(rng.integers(0, m))
            if neg not in pos_sets[u]:
                break
        out.append((u, p, neg))
    dt = time.perf_counter() - t0
    return len(out) / dt


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

    ref_sps = reference_equivalent_sampler_throughput(ds) * 4  # their 4 workers

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
