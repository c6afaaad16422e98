"""Full-catalog eval scan decomposition (dev probe).

eval_probe measured the flagship eval at 3.55 s DEVICE time (100k users x 30k
items, B=1024 tiles) — ~20x its traffic/FLOP model (~0.2 s). Which stage?
Variants run the same lax.scan over user tiles with stages removed:

  full          score -> mask -> topk -> metric sums (the Evaluator shape)
  no_div        without diversity (no item_categories)
  topk_only     score -> mask -> topk, sums replaced by topk-id sum
  score_only    score matmul only (running max, no topk)
  no_mask       full without the train-positive mask scatter
  b4096         full at eval_user_batch=4096
  bf16          topk_only with bf16 scoring

Run from the repo root: python benchmarks/eval_probe2.py [variant ...]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from furusato_recommend_tpu.config import ddp_flagship_config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.eval.evaluate import MASK_SENTINEL, build_eval_data  # noqa: E402
from furusato_recommend_tpu.eval.metrics import batch_metric_sums  # noqa: E402
from furusato_recommend_tpu.ops.csr_search import csr_gather_padded  # noqa: E402

from spmm_bench import log, timeit  # noqa: E402


def main():
    cfg = ddp_flagship_config().replace(topks=(10, 20))
    ds = synthetic_dataset(n_users=100_000, m_items=30_000, avg_degree=8, seed=0)
    graph = ds.graph
    m = graph.m_items
    d = 32
    rng = np.random.default_rng(0)
    cats = jnp.asarray(rng.integers(0, 50, (m, 4)).astype(np.int32))
    max_deg = int(np.max(np.bincount(ds.train_user, minlength=ds.n_users)))

    user_emb = jnp.asarray(rng.standard_normal((ds.n_users, d)).astype(np.float32))
    item_emb = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))

    def make(variant, B):
        data = build_eval_data(ds, B, item_categories=None if variant == "no_div" else np.asarray(cats))
        topks = (10, 20)
        kmax = 20

        def run(user_emb, item_emb, graph, data):
            def step(carry, inp):
                users, valid = inp
                ue = user_emb[users]
                if variant == "bf16":
                    s = (ue.astype(jnp.bfloat16) @ item_emb.T.astype(jnp.bfloat16)).astype(jnp.float32)
                else:
                    s = ue @ item_emb.T
                if variant == "score_only":
                    return carry + jnp.sum(jnp.max(s, axis=1)), jnp.zeros((), jnp.int32)
                if variant != "no_mask":
                    pos, mask = csr_gather_padded(graph.user_pos, users, max_deg)
                    b = jnp.arange(users.shape[0])[:, None]
                    cols = jnp.where(mask, pos, m)
                    s = s.at[b, cols].set(MASK_SENTINEL, mode="drop")
                scores, topk = jax.lax.top_k(s, kmax)
                if variant in ("topk_only", "bf16"):
                    return carry + jnp.sum(topk).astype(jnp.float32), jnp.zeros((), jnp.int32)
                sums = batch_metric_sums(
                    topk, users, valid, graph.test_pos, topks,
                    None if variant == "no_div" else cats,
                    data.item_popularity,
                    n_users_norm=float(graph.n_users),
                    max_test_degree=graph.max_test_degree or None,
                )
                return carry + sums["recall"][0] + sums["ndcg"][1], jnp.zeros((), jnp.int32)

            tot, _ = jax.lax.scan(step, jnp.zeros(()), (data.users, data.valid))
            return tot

        return jax.jit(run), data

    which = sys.argv[1:] or [
        "full", "no_div", "topk_only", "score_only", "no_mask", "b4096", "bf16"
    ]
    for variant in which:
        B = 4096 if variant == "b4096" else 1024
        v = "full" if variant == "b4096" else variant
        fn, data = make(v, B)
        dt = timeit(
            fn,
            lambda i: (user_emb * (1.0 + i * 1e-6), item_emb, graph, data),
            iters=3,
        )
        log(bench="eval_scan", variant=variant, B=B, total_s=round(dt, 3),
            users_per_s=int(100_000 / dt))


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", flush=True)
    main()
