"""10x-scale headline validation on chip (round-4 verdict #5).

The headline bench graph is fixed at 50k users / 1.5M edges; the hub-split
design's memory scaling (dense [num_dst, H] + [H, num_src] bf16 blocks,
ops/padded_adj.py) and the compile-payload ceiling have never been exercised
at a 10x graph on a real chip. Two measurements:

- ``--part lgn``: LightGCN BPR training at 500k users x 200k items x 15.7M
  edges (10x the headline graph in every axis that matters), d=64 L=2
  batch 8192 — the exact bench.py recipe. Records host graph-build wall,
  first-epoch wall (compile + run, with --compile_cache), steady-state
  samples/s over 3 epochs, one full 500k-user eval wall, and HBM
  bytes-in-use/peak after each stage.
- ``--part flagship``: the TextSAGE flagship recipe's eval at M = 300k items
  (100k users, nwt features) — the [B, M] scoring tile at 2048 x 300k is
  2.4 GB f32; this validates the single-chip eval path at a catalog 15x the
  anchor's. Trains one ddp-recipe epoch first so the eval runs on real
  parameters and the training path is exercised at this shape too.

Both parts use vectorized generators (the package's synthetic_dataset /
synthetic_features draw per-user in Python — fine at 50k, hours at 500k);
degree law and Zipf popularity match synthetic_dataset's
(popularity_alpha 1.2, k_u ~ Uniform[5, 2*avg_degree)).

Results -> benchmarks/results/scale500k.jsonl, transcribed into PERF.md.
Usage (repo root, real chip): python benchmarks/scale500k.py --part lgn
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def zipf_bipartite(n_users, m_items, avg_degree, seed=0, popularity_alpha=1.2):
    from furusato_recommend_tpu.data.dataset import synthetic_zipf_dataset

    return synthetic_zipf_dataset(
        n_users, m_items, avg_degree, seed=seed,
        popularity_alpha=popularity_alpha,
    )


def lean_nwt_features(n_users, m_items, seed=0, text_vocab=500, text_width=12):
    """Vectorized FeatureStore carrying only the flagship's nwt modalities
    (numeric / word2vec / text); repeats inside a text bag are allowed — they
    are weight-noise, irrelevant for a throughput/eval-shape measurement."""
    import jax.numpy as jnp

    from furusato_recommend_tpu.data.features import (
        TEXT_FIELDS,
        WORD2VEC_DIM,
        FeatureStore,
        SideFeatures,
    )

    rng = np.random.default_rng(seed)

    def side(n, fn):
        toks = rng.integers(0, text_vocab, (n, TEXT_FIELDS, text_width))
        lens = rng.integers(1, text_width, (n, TEXT_FIELDS, 1))
        text = np.where(np.arange(text_width)[None, None, :] < lens, toks, -1)
        return SideFeatures(
            numeric=jnp.asarray(rng.random((n, fn)).astype(np.float32)),
            word2vec=jnp.asarray(
                (rng.standard_normal((n, WORD2VEC_DIM)) * 0.1).astype(np.float32)
            ),
            text=jnp.asarray(text.astype(np.int32)),
        )

    return FeatureStore(
        user=side(n_users, 24), item=side(m_items, 16), text_vocab=text_vocab
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", required=True, choices=["lgn", "flagship"])
    ap.add_argument("--cpu", action="store_true", help="tiny CPU smoke shapes")
    ap.add_argument("--n_users", type=int, default=0,
                    help="override the lgn part's user count (m_items scales "
                         "proportionally) — used to bisect the 500k worker "
                         "crash to a scale cliff")
    ap.add_argument("--layers", type=int, default=2,
                    help="lgn part propagation depth (1 halves the live "
                         "[padded_slots, d] SpMM gather temps - the cliff "
                         "mechanism probe)")
    ap.add_argument("--batch", type=int, default=8192,
                    help="lgn part BPR batch size (bigger batches amortize "
                         "the per-step full-graph propagate at big graphs)")
    ap.add_argument("--hub_budget_mb", type=int, default=512,
                    help="per-dense-block hub memory budget (MB); the default "
                         "512 puts ~4 GiB of bf16 hub blocks on HBM at 350k+ "
                         "nodes (8 near-cap blocks across the 3 padded "
                         "structures)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from furusato_recommend_tpu.config import Config, ddp_flagship_config
    from furusato_recommend_tpu.models.registry import build_model
    from furusato_recommend_tpu.obs.profiler import device_memory_stats
    from furusato_recommend_tpu.train.trainer import Trainer

    out_path = os.path.join(os.path.dirname(__file__), "results",
                            f"scale500k{'_cpu' if args.cpu else ''}.jsonl")
    f = open(out_path, "a")

    def emit(**row):
        row = {"part": args.part, **row}
        print(json.dumps(row), flush=True)
        f.write(json.dumps(row) + "\n")
        f.flush()

    def mem(tag):
        s = device_memory_stats()
        if s:
            emit(stage=f"hbm_{tag}",
                 **{k: round(v, 1) for k, v in s.items()})

    t0 = time.time()
    if args.part == "lgn":
        n, m, deg = (5000, 2000, 30) if args.cpu else (500_000, 200_000, 30)
        if args.n_users:
            n, m = args.n_users, max(args.n_users * 2 // 5, 1000)
        ds = zipf_bipartite(n, m, deg, seed=0)
        if args.hub_budget_mb != 512:
            from furusato_recommend_tpu.data.graph import build_bipartite_graph

            ds._graph = build_bipartite_graph(
                ds.train_user, ds.train_item, ds.test_user, ds.test_item,
                n, m, hub_mem_budget=args.hub_budget_mb * 1024 * 1024,
            )
        gen_s = time.time() - t0
        cfg = Config(
            model="lgn", latent_dim=64, n_layers=args.layers,
            bpr_batch_size=args.batch,
            lr=1e-3, eval_user_batch=1024, topks=(10, 20),
            compile_cache="" if args.cpu else "/tmp/scale500k_xla_cache",
        )
        t1 = time.time()
        model = build_model("lgn", cfg, ds.graph)  # forces padded-adj build
        build_s = time.time() - t1
        emit(stage="graph", n_users=n, m_items=m, train_edges=ds.train_size,
             test_edges=len(ds.test_user), gen_s=round(gen_s, 1),
             graph_build_s=round(build_s, 1))
        tr = Trainer(cfg, ds, model)
        params, opt_state = tr.init_state()
        mem("init")
        t1 = time.time()
        params, opt_state, loss = tr.train_one_epoch(params, opt_state)
        first_s = time.time() - t1
        emit(stage="first_epoch", wall_s=round(first_s, 1),
             samples_per_epoch=tr.samples_per_epoch, loss=round(float(loss), 4))
        mem("train")
        t1 = time.time()
        n_ep = 3
        for _ in range(n_ep):
            params, opt_state, loss = tr.train_one_epoch(params, opt_state)
        # loss fetch above already forced the queue drain each epoch
        dt = time.time() - t1
        emit(stage="steady", epochs=n_ep, wall_s=round(dt, 1),
             samples_per_s=round(n_ep * tr.samples_per_epoch / dt, 1))
        t1 = time.time()
        r = tr.test(params)
        emit(stage="eval", wall_s=round(time.time() - t1, 1),
             test_users=len(set(ds.test_user.tolist())),
             **{k: round(v, 5) for k, v in r.items()
                if k.startswith(("recall", "ndcg"))})
        mem("eval")
    else:
        n, m, deg = (2000, 3000, 8) if args.cpu else (100_000, 300_000, 8)
        ds = zipf_bipartite(n, m, deg, seed=0, popularity_alpha=0.8)
        gen_s = time.time() - t0
        # eval_user_batch 1024 at M=300k: plain lax.top_k's sort temps (~6x
        # the [B, M] f32 score block) crashed the 16G worker at this batch
        # (recorded in the jsonl); the evaluator now auto-routes M >= 128k
        # catalogs through the sequential chunked top-k (ops/chunked_topk.py)
        cfg = ddp_flagship_config().replace(
            eval_user_batch=1024, topks=(10, 20), epochs=2,
            compile_cache="" if args.cpu else "/tmp/scale500k_xla_cache",
        )
        feats = lean_nwt_features(n, m, seed=0)
        t1 = time.time()
        model = build_model("textsage", cfg, ds.graph, features=feats)
        build_s = time.time() - t1
        emit(stage="graph", n_users=n, m_items=m, train_edges=ds.train_size,
             gen_s=round(gen_s, 1), graph_build_s=round(build_s, 1))
        tr = Trainer(cfg, ds, model, ddp_recipe=True)
        params, opt_state = tr.init_state()
        mem("init")
        t1 = time.time()
        params, opt_state, loss = tr.train_one_epoch(
            params, opt_state, prefetch_next=True
        )
        emit(stage="first_epoch", wall_s=round(time.time() - t1, 1),
             samples_per_epoch=tr.samples_per_epoch, loss=round(float(loss), 4))
        t1 = time.time()
        params, opt_state, loss = tr.train_one_epoch(
            params, opt_state, prefetch_next=False
        )
        dt = time.time() - t1
        emit(stage="steady", wall_s=round(dt, 1),
             samples_per_s=round(tr.samples_per_epoch / dt, 1))
        mem("train")
        t1 = time.time()
        r = tr.test(params)
        emit(stage="eval_300k_items", wall_s=round(time.time() - t1, 1),
             eval_user_batch=cfg.eval_user_batch,
             **{k: round(v, 5) for k, v in r.items()
                if k.startswith(("recall", "ndcg"))})
        mem("eval")
    emit(done=True, total_s=round(time.time() - t0, 1))
    f.close()


if __name__ == "__main__":
    main()
