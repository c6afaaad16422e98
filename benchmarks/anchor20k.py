"""Flagship-scale torch-oracle quality anchor: 20k users x 10k items (round-4
verdict #1 — the production quality claim anchored to a reference-equivalent
run at 100x the mid-scale parity shape).

Both sides train on the IDENTICAL dataset (cached npz) and synthetic feature
artifacts (deterministic seed), under the reference DDP flagship recipe
(`/root/reference/ddp.py:771-786`): TextSAGE n/w/t, d=32, L=2, fanout 5,
B=5000, lr=1e-3, decay=1e-6, weighted+capped sampling (POSITIVE_NUM_LIMIT
3000, NEGATIVE_POW 0.2), TRAIN_ITERATIVE 3x samples/epoch.

- ``--side torch``: the clean-room torch oracle (tests/torch_oracle.py) on
  host CPU — hours; run in background, forces jax to CPU so it never touches
  the TPU tunnel while TPU jobs run.
- ``--side tpu``: our Trainer (ddp_recipe=True) on the real chip.

``--model lgn`` runs the cheap companion anchor (uniform BPR, bs=2048,
lr=0.01, d=32) on both sides.

Curves land in benchmarks/results/anchor20k_{model}_{side}_s{seed}.jsonl and
are transcribed into PERF.md ("flagship-scale torch anchor").

Usage (repo root):
  python benchmarks/anchor20k.py --side torch --model textsage --seed 0
  python benchmarks/anchor20k.py --side tpu   --model textsage --seed 0
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

N_USERS, M_ITEMS, DSEED = 20_000, 10_000, 0
CACHE = f"/tmp/anchor_ds_{N_USERS}x{M_ITEMS}_s{DSEED}.npz"


def load_dataset():
    from furusato_recommend_tpu.data.dataset import (
        Dataset,
        synthetic_structured_dataset,
    )

    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return Dataset(
            n_users=N_USERS, m_items=M_ITEMS,
            train_user=z["tu"], train_item=z["ti"],
            test_user=z["eu"], test_item=z["ei"],
        )
    ds = synthetic_structured_dataset(
        n_users=N_USERS, m_items=M_ITEMS, avg_degree=8, seed=DSEED,
        rank=16, signal=3.0, popularity_alpha=0.8,
    )
    np.savez(CACHE, tu=ds.train_user, ti=ds.train_item,
             eu=ds.test_user, ei=ds.test_item)
    return ds


def make_features(ds, cfg, kind: str):
    """Feature artifacts for the textsage anchor: 'noise' (i.i.d. — the
    round-4 anchors) or 'informative' (latent-derived; same shapes/seed so the
    comparison is a pure feature ablation)."""
    if kind == "informative":
        from furusato_recommend_tpu.data.features import (
            informative_synthetic_features,
        )

        return informative_synthetic_features(
            ds, cfg, dataset_seed=DSEED, rank=16, seed=0
        )
    from furusato_recommend_tpu.data.features import synthetic_features

    return synthetic_features(ds, cfg, seed=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", required=True, choices=["torch", "tpu"])
    ap.add_argument("--model", default="textsage",
                    choices=["textsage", "lgn", "sasrec"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--eval_every", type=int, default=3)
    ap.add_argument("--accum_chunk", type=int, default=1250)
    ap.add_argument("--neg_candidates", type=int, default=4,
                    help="tpu side: bounded rejection width (16 ~ exact)")
    ap.add_argument("--exact_membership", action="store_true",
                    help="tpu side: binary-search membership instead of cuckoo")
    ap.add_argument("--tag", default="",
                    help="output filename suffix for lever runs")
    ap.add_argument("--dropout", type=float, default=0.0,
                    help="torch side: message dropout (0.2 = the reference's "
                         "exact recipe, ddp.py:195,544)")
    ap.add_argument("--features", default="noise", choices=["noise", "informative"],
                    help="textsage feature artifacts: noise (i.i.d., the "
                         "round-4 anchors) or informative (latent-derived, "
                         "round-5: the feature-signal quality anchor; output "
                         "tagged _inf)")
    args = ap.parse_args()
    if args.features == "informative" and not args.tag:
        args.tag = "inf"

    if args.side == "torch":
        # never touch the TPU tunnel from the background oracle job
        import jax

        jax.config.update("jax_platforms", "cpu")

    from furusato_recommend_tpu.config import Config, ddp_flagship_config

    ds = load_dataset()
    out_dir = os.path.join(os.path.dirname(__file__), "results")
    os.makedirs(out_dir, exist_ok=True)
    sfx = f"_{args.tag}" if args.tag else ""
    out_path = os.path.join(
        out_dir, f"anchor20k_{args.model}_{args.side}{sfx}_s{args.seed}.jsonl"
    )
    f = open(out_path, "w")
    t_start = time.time()

    def emit(row):
        row = {"model": args.model, "side": args.side, "seed": args.seed, **row}
        print(json.dumps(row), flush=True)
        f.write(json.dumps(row) + "\n")
        f.flush()

    cache = "/tmp/anchor20k_xla_cache" if args.side == "tpu" else ""
    if args.model == "textsage":
        cfg = ddp_flagship_config().replace(
            eval_user_batch=2048, topks=(10, 20), seed=args.seed,
            epochs=args.epochs, test_span=args.eval_every, compile_cache=cache,
            neg_candidates=args.neg_candidates,
        )
    elif args.model == "sasrec":
        # reference defaults: recdim 64, layer 2, len-50 sequences, lr 1e-3
        # (`/root/reference/parse.py` + `model/sasrec.py:55-500`)
        cfg = Config(
            model="sasrec", latent_dim=64, bpr_batch_size=2048, lr=1e-3,
            decay=1e-6, user_feature="nwt", item_feature="nwt",
            eval_user_batch=2048, topks=(10, 20), seed=args.seed,
            epochs=args.epochs, test_span=args.eval_every, compile_cache=cache,
        )
    else:
        cfg = Config(
            model="lgn", latent_dim=32, bpr_batch_size=2048, lr=0.01,
            decay=1e-7, eval_user_batch=2048, topks=(10, 20), seed=args.seed,
            epochs=args.epochs, test_span=args.eval_every, compile_cache=cache,
        )

    # samples/epoch exactly as the Trainer computes it (trainer.py: ceil to
    # whole batches of train_iterative x train_size)
    mult = cfg.train_iterative if args.model == "textsage" else 1
    total = max(ds.train_size * mult, cfg.bpr_batch_size)
    num_batches = -(-total // cfg.bpr_batch_size)
    spe = num_batches * cfg.bpr_batch_size
    emit({
        "meta": True, "train_edges": ds.train_size, "samples_per_epoch": spe,
        "epochs": args.epochs, "recipe": "ddp_flagship" if mult > 1 else "uniform",
    })

    if args.side == "torch":
        from torch_oracle import DDPSamplerNp, np_feats, run_mf_lgn, run_textsage

        def record(ep, metrics, loss):
            emit({
                "epoch": ep, "loss": round(loss, 4),
                "elapsed_s": round(time.time() - t_start, 1),
                **{k: round(v, 5) for k, v in metrics.items()},
            })

        if args.model == "lgn":
            run_mf_lgn(
                ds, "lgn", epochs=args.epochs, dim=cfg.latent_dim, lr=cfg.lr,
                seed=args.seed, decay=cfg.decay, bs=cfg.bpr_batch_size,
                ks=tuple(cfg.topks), eval_every=args.eval_every, record=record,
            )
        elif args.model == "sasrec":
            from torch_oracle import np_feats as _npf
            from torch_oracle import run_sasrec

            from furusato_recommend_tpu.data.sequence import build_sequences

            feats = make_features(ds, cfg, args.features)
            seqs = build_sequences(ds)
            run_sasrec(
                ds, _npf(feats.item), feats.text_vocab,
                np.asarray(seqs.items), np.asarray(seqs.lengths),
                epochs=args.epochs, dim=cfg.latent_dim, lr=cfg.lr,
                seed=args.seed, decay=cfg.decay, bs=cfg.bpr_batch_size,
                L=cfg.n_layers, ks=tuple(cfg.topks),
                eval_every=args.eval_every, record=record,
            )
        else:
            feats = make_features(ds, cfg, args.features)
            fu, fi = np_feats(feats.user), np_feats(feats.item)
            sampler = DDPSamplerNp(
                ds, spe, cfg.positive_num_limit, cfg.negative_pow
            )
            run_textsage(
                ds, fu, fi, feats.text_vocab, epochs=args.epochs,
                dim=cfg.latent_dim, lr=cfg.lr, seed=args.seed, decay=cfg.decay,
                bs=cfg.bpr_batch_size, F=cfg.num_neighbors, L=cfg.n_layers,
                sampler=sampler, ks=tuple(cfg.topks),
                eval_every=args.eval_every, record=record,
                accum_chunk=args.accum_chunk, dropout=args.dropout,
            )
    else:
        from furusato_recommend_tpu.models.registry import build_model
        from furusato_recommend_tpu.train.trainer import Trainer

        if args.exact_membership:
            import dataclasses

            ds._graph = dataclasses.replace(ds.graph, pos_hash=None)
        if args.model == "textsage":
            feats = make_features(ds, cfg, args.features)
            model = build_model(args.model, cfg, ds.graph, features=feats)
        elif args.model == "sasrec":
            from furusato_recommend_tpu.data.sequence import build_sequences

            feats = make_features(ds, cfg, args.features)
            model = build_model(
                args.model, cfg, ds.graph, features=feats,
                sequences=build_sequences(ds),
            )
        else:
            model = build_model(args.model, cfg, ds.graph)
        tr = Trainer(cfg, ds, model, ddp_recipe=(args.model == "textsage"))
        assert tr.samples_per_epoch == spe, (tr.samples_per_epoch, spe)
        params, opt_state = tr.init_state(seed=args.seed)
        loss = None
        for ep in range(1, args.epochs + 1):
            t0 = time.time()
            params, opt_state, loss = tr.train_one_epoch(params, opt_state)
            dt = time.time() - t0
            if ep % args.eval_every == 0 or ep == args.epochs:
                r = tr.test(params)
                emit({
                    "epoch": ep, "loss": round(loss, 4), "epoch_s": round(dt, 2),
                    "elapsed_s": round(time.time() - t_start, 1),
                    **{k: round(v, 5) for k, v in r.items()
                       if k.startswith(("recall", "ndcg"))},
                })
    f.close()
    print(json.dumps({"done": out_path, "total_s": round(time.time() - t_start, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
