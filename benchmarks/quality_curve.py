"""Flagship-scale quality curves on the real chip (round-2 verdict next #1).

Runs the versioned flagship recipe — TextSAGE n/w/t, d=32, L=2, fanout 5,
B=5000, ddp_recipe weighted+capped sampling (the reference's DDP flagship,
/root/reference/ddp.py:771-786,804-880) — at the 100k users x 30k items bench
shape on a STRUCTURED synthetic dataset (synthetic_structured_dataset:
ground-truth low-rank latents + popularity + Gumbel top-k, so recall has
collaborative headroom and lever ablations are visible) and records
recall@10/20 + ndcg@10/20 per eval. One JSON line per eval; curves land in
benchmarks/results/quality_{tag}.jsonl and are transcribed into PERF.md.

Ablation flags quantify each parity-risky perf lever at this scale:

  --exact_membership    fixed-depth binary-search membership instead of the
                        cuckoo set (removes cuckoo false-positive rejections)
  --neg_candidates K    bounded-K rejection width (prod K=4; K=16 ~ exact)
  --f32_exact           hub-dense bf16 MXU splits OFF (interaction graph AND
                        text bags) + compute_dtype=float32: the pure-f32
                        padded-SpMM numerics baseline
  --feature_update_every T   super-step feature updates (prod opt-in T=8)

Usage (real chip, from the repo root):
  python benchmarks/quality_curve.py --tag prod --epochs 30 --test_span 3
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from furusato_recommend_tpu.config import ddp_flagship_config  # noqa: E402
from furusato_recommend_tpu.data.dataset import (  # noqa: E402
    Dataset,
    synthetic_structured_dataset,
)
from furusato_recommend_tpu.data.features import synthetic_features  # noqa: E402
from furusato_recommend_tpu.data.graph import build_bipartite_graph  # noqa: E402
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402
from furusato_recommend_tpu.train.trainer import Trainer  # noqa: E402

N_USERS, M_ITEMS, SEED = 100_000, 30_000, 0
CACHE = f"/tmp/quality_ds_{N_USERS}x{M_ITEMS}_s{SEED}.npz"


def load_dataset() -> Dataset:
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return Dataset(
            n_users=N_USERS, m_items=M_ITEMS,
            train_user=z["tu"], train_item=z["ti"],
            test_user=z["eu"], test_item=z["ei"],
        )
    t0 = time.time()
    ds = synthetic_structured_dataset(
        n_users=N_USERS, m_items=M_ITEMS, avg_degree=8, seed=SEED,
        rank=16, signal=3.0, popularity_alpha=0.8,
    )
    np.savez(CACHE, tu=ds.train_user, ti=ds.train_item,
             eu=ds.test_user, ei=ds.test_item)
    print(json.dumps({"gen_s": round(time.time() - t0, 1)}), flush=True)
    return ds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--test_span", type=int, default=3)
    ap.add_argument("--seed", type=int, default=2020)
    ap.add_argument("--exact_membership", action="store_true")
    ap.add_argument("--neg_candidates", type=int, default=4)
    ap.add_argument("--f32_exact", action="store_true")
    ap.add_argument("--feature_update_every", type=int, default=1)
    ap.add_argument("--relin_every", type=int, default=1,
                    help="initial-table re-linearization cadence (0 = the "
                         "round-2 epoch-start linearization, measured unstable)")
    ap.add_argument("--compile_cache", type=str, default="",
                    help="persistent XLA cache dir (seed sweeps share compiles)")
    args = ap.parse_args()

    cfg = ddp_flagship_config().replace(
        eval_user_batch=2048, topks=(10, 20), seed=args.seed,
        neg_candidates=args.neg_candidates,
        feature_update_every=args.feature_update_every,
        relin_every=args.relin_every,
        test_span=args.test_span, epochs=args.epochs,
        compile_cache=args.compile_cache,
    )
    ds = load_dataset()

    if args.f32_exact:
        from furusato_recommend_tpu.models.sage import SAGE

        SAGE.TEXT_HUB_WORDS = 0
        cfg = cfg.replace(compute_dtype="float32")
        ds._graph = build_bipartite_graph(
            ds.train_user, ds.train_item, ds.test_user, ds.test_item,
            ds.n_users, ds.m_items, hub_count=0, dst_hub_count=0,
        )
    if args.exact_membership:
        ds._graph = dataclasses.replace(ds.graph, pos_hash=None)

    feats = synthetic_features(ds, cfg, seed=0)
    model = build_model("textsage", cfg, ds.graph, features=feats)
    tr = Trainer(cfg, ds, model, ddp_recipe=True)

    out_dir = os.path.join(os.path.dirname(__file__), "results")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"quality_{args.tag}.jsonl")
    f = open(out_path, "w")

    def record(epoch, params, loss=None, dt=None):
        r = tr.test(params)
        row = {
            "tag": args.tag, "epoch": epoch,
            "recall@10": round(r["recall@10"], 5),
            "recall@20": round(r["recall@20"], 5),
            "ndcg@10": round(r["ndcg@10"], 5),
            "ndcg@20": round(r["ndcg@20"], 5),
        }
        if loss is not None:
            row["loss"] = round(loss, 4)
        if dt is not None:
            row["epoch_s"] = round(dt, 2)
        print(json.dumps(row), flush=True)
        f.write(json.dumps(row) + "\n")
        f.flush()
        return r

    meta = {
        "tag": args.tag, "train_edges": ds.train_size,
        "samples_per_epoch": tr.samples_per_epoch,
        "exact_membership": args.exact_membership,
        "neg_candidates": args.neg_candidates, "f32_exact": args.f32_exact,
        "feature_update_every": args.feature_update_every,
        "relin_every": args.relin_every, "seed": args.seed,
    }
    print(json.dumps(meta), flush=True)
    f.write(json.dumps(meta) + "\n")

    params, opt_state = tr.init_state()
    record(0, params)
    loss = None
    for ep in range(1, args.epochs + 1):
        t0 = time.time()
        params, opt_state, loss = tr.train_one_epoch(params, opt_state)
        dt = time.time() - t0
        if ep % args.test_span == 0 or ep == args.epochs:
            record(ep, params, loss=loss, dt=dt)
    f.close()
    print(json.dumps({"done": args.tag, "out": out_path}), flush=True)


if __name__ == "__main__":
    main()
