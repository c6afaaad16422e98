"""Quick mid-scale probe: does the flagship's feature machinery LEARN from
informative features (round-4 verdict #1)?

Trains TextSAGE (n/w/t, no free id embeddings — reference flagship form,
`/root/reference/model/textsage.py:291-352`) on the 2048x1024 structured
dataset twice — once with noise features (synthetic_features) and once with
latent-derived features (informative_synthetic_features) — and prints both
against the popularity baseline. CPU, ~2 min. The full-scale version is
benchmarks/anchor20k.py --features informative.

Usage: python benchmarks/feature_signal_probe.py [--epochs 10]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def popularity_recall(ds, k=10):
    """recall@k of ranking by global train-interaction count, excluding each
    user's train items (the baseline every eval masks the same way)."""
    counts = np.bincount(ds.train_item, minlength=ds.m_items)
    order = np.argsort(-counts)
    test_pos, train_pos = {}, {}
    for u, i in zip(ds.test_user, ds.test_item):
        test_pos.setdefault(int(u), set()).add(int(i))
    for u, i in zip(ds.train_user, ds.train_item):
        train_pos.setdefault(int(u), set()).add(int(i))
    rec = []
    for u, pos in test_pos.items():
        seen = train_pos.get(u, set())
        top = [i for i in order if i not in seen][:k]
        rec.append(len(set(top) & pos) / len(pos))
    return float(np.mean(rec))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from furusato_recommend_tpu.config import Config
    from furusato_recommend_tpu.data.dataset import synthetic_structured_dataset
    from furusato_recommend_tpu.data.features import (
        informative_synthetic_features,
        synthetic_features,
    )
    from furusato_recommend_tpu.models.registry import build_model
    from furusato_recommend_tpu.train.trainer import Trainer

    ds = synthetic_structured_dataset(
        n_users=2048, m_items=1024, avg_degree=12, seed=11, rank=8, signal=3.5
    )
    cfg = Config(
        model="textsage", latent_dim=16, bpr_batch_size=256, lr=0.01,
        num_neighbors=3, n_layers=2, user_feature="nwt", item_feature="nwt",
        eval_user_batch=256, topks=(10,), decay=1e-6, seed=args.seed,
    )

    def run(feats, label):
        model = build_model("textsage", cfg, ds.graph, features=feats)
        tr = Trainer(cfg, ds, model)
        params, opt_state = tr.init_state(seed=args.seed)
        t0 = time.time()
        for ep in range(args.epochs):
            params, opt_state, loss = tr.train_one_epoch(params, opt_state)
        r = tr.test(params)["recall@10"]
        print(f"{label:12s} recall@10={r:.4f} loss={loss:.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)
        return r

    pop = popularity_recall(ds)
    print(f"{'popularity':12s} recall@10={pop:.4f}", flush=True)
    noise = run(synthetic_features(ds, cfg, seed=4), "noise")
    inf = run(
        informative_synthetic_features(ds, cfg, dataset_seed=11, rank=8, seed=4),
        "informative",
    )
    print(f"ordering: informative {inf:.4f} > noise {noise:.4f}? "
          f"{inf > noise}; > popularity {pop:.4f}? {inf > pop}", flush=True)


if __name__ == "__main__":
    main()
