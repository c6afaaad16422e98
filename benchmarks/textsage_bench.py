"""Versioned flagship bench: TextSAGE DDP-recipe training throughput on the
real chip (the PERF.md production-scale shakeout, now reproducible —
round-1 verdict weak #6 asked for a versioned bench line).

100k users x 30k items, ~700k train edges, B=5000, weighted+capped sampling
(TRAIN_ITERATIVE=3 -> ~2.1M samples/epoch), n/w/t features, d=32, L=2,
fanout 5 — the reference's DDP flagship recipe (/root/reference/ddp.py:771-786).

Prints one JSON line per measurement; run from the repo root:
    python benchmarks/textsage_bench.py [--train_emb] [--feature_update_every N]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from furusato_recommend_tpu.config import ddp_flagship_config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.data.features import synthetic_features  # noqa: E402
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402
from furusato_recommend_tpu.train.trainer import Trainer  # noqa: E402


def _sampled_with_bind(model, params, graph, bound, key):
    with model.bind(bound):
        return model.propagate_sampled(params, graph, key)


def main(train_emb: bool, feat_every: int = 1):
    cfg = ddp_flagship_config().replace(
        train_emb=train_emb, eval_user_batch=2048, topks=(10, 20),
        feature_update_every=feat_every,
    )
    t0 = time.time()
    ds = synthetic_dataset(n_users=100_000, m_items=30_000, avg_degree=8, seed=0)
    feats = synthetic_features(ds, cfg, seed=0)
    model = build_model("textsage", cfg, ds.graph, features=feats)
    tr = Trainer(cfg, ds, model, ddp_recipe=True)
    print(
        json.dumps(
            {
                "bench": "setup",
                "train_edges": ds.train_size,
                "samples_per_epoch": tr.samples_per_epoch,
                "build_s": round(time.time() - t0, 1),
                "train_emb": train_emb,
            }
        ),
        flush=True,
    )
    params, opt_state = tr.init_state()
    # epoch 0 includes compile
    t0 = time.time()
    params, opt_state, loss0 = tr.train_one_epoch(params, opt_state)
    compile_s = time.time() - t0
    times = []
    losses = [loss0]
    for _ in range(3):
        t0 = time.time()
        params, opt_state, loss = tr.train_one_epoch(params, opt_state)
        times.append(time.time() - t0)
        losses.append(loss)
    dt = float(np.mean(times))
    t0 = time.time()
    tr.test(params)
    eval_warm = None
    t0 = time.time()
    tr.test(params)
    eval_warm = time.time() - t0

    # `--inference sample` at scale (verdict weak #9: never measured at scale):
    # sampled-subgraph encoding of every entity, chunked by sample_infer_chunk
    import jax.numpy as jnp

    samp = jax.jit(
        lambda p, g, b, k: _sampled_with_bind(model, p, g, b, k)
    )
    bound = model.data_to_bind()
    k0 = jax.random.PRNGKey(0)
    ue, ie = samp(params, ds.graph, bound, k0)
    ue.block_until_ready()
    t0 = time.time()
    ue, ie = samp(params, ds.graph, bound, jax.random.PRNGKey(1))
    float(jnp.sum(ue[:1, :1]))  # force (block_until_ready lies over the tunnel)
    sample_infer_s = time.time() - t0
    print(
        json.dumps(
            {
                "bench": "sample_inference",
                "entities": ds.n_users + ds.m_items,
                "chunk": cfg.sample_infer_chunk,
                "total_s": round(sample_infer_s, 2),
                "entities_per_sec": round((ds.n_users + ds.m_items) / sample_infer_s, 1),
            }
        ),
        flush=True,
    )
    print(
        json.dumps(
            {
                "bench": "textsage_flagship",
                "train_emb": train_emb,
                "feature_update_every": feat_every,
                "epoch_s": round(dt, 2),
                "samples_per_sec": round(tr.samples_per_epoch / dt, 1),
                "compile_epoch_s": round(compile_s, 1),
                "loss_first": round(float(losses[0]), 4),
                "loss_last": round(float(losses[-1]), 4),
                "eval_warm_s": round(eval_warm, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    fe = 1
    if "--feature_update_every" in sys.argv:
        fe = int(sys.argv[sys.argv.index("--feature_update_every") + 1])
    main("--train_emb" in sys.argv, fe)
